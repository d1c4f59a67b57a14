package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Ordered event funnel: for each user, the earliest time each step of a
  * fixed step sequence was reached, where step k+1 must happen STRICTLY
  * after the reached time of step k (the standard product-analytics funnel
  * on an event log; the reference's read surface is exactly this kind of
  * event-log SQL — README.md:236-247 of the reference shows users querying
  * the history table by topic and time).
  *
  * Scale shape: one staged conditional aggregation per step, every join and
  * groupBy keyed on `user_id` —
  *  - each step's event scan carries a pushed `event_type` equality filter
  *    (row-group pruning at the parquet reader, confirmed in PushedFilters);
  *  - step frames are user-cardinality (one row per user that reached the
  *    step), monotonically shrinking down the funnel — the join input is
  *    never events x events;
  *  - because every stage hashes on the same key, consecutive stages reuse
  *    the same partitioning (no re-exchange between the step join and its
  *    following aggregation at scale).
  * A collect_list-per-user single pass would bound state by the noisiest
  * user's event count; the staged form keeps per-task state at one
  * timestamp per user regardless of skew.
  */
object Funnel {

  /** The funnel steps, in order. Shared with [[funnelSql]]. */
  val Steps: Seq[String] = Seq("signup", "view", "purchase")

  /** Conversion deadline of the windowed variant: step k must land within
    * this many hours of step k-1's reached time (the product-analytics
    * "conversion window" — without one, any eventual occurrence converts
    * and a month-long event log funnels everyone).
    */
  val ConversionHours = 24

  private def stepCol(i: Int): String = s"${Steps(i)}_ts"

  /** Driver query over the events table. */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    of(Tables.events(spark, dir)).orderBy(col("user_id"))

  /** Driver query: the same funnel under the [[ConversionHours]] deadline. */
  def funnelWindowed(spark: SparkSession, dir: String): DataFrame =
    ofWindowed(Tables.events(spark, dir)).orderBy(col("user_id"))

  /** The funnel over any (user_id, ts, event_type) frame. */
  def of(events: DataFrame): DataFrame = staged(events, withinHours = None)

  /** The funnel with a per-step conversion deadline. */
  def ofWindowed(events: DataFrame,
      withinHours: Int = ConversionHours): DataFrame =
    staged(events, Some(withinHours))

  private def staged(events: DataFrame, withinHours: Option[Int]): DataFrame = {
    val ev = events.select(col("user_id"), col("ts"), col("event_type"))

    // Step 0: earliest occurrence per user.
    val s0 = ev.filter(col("event_type") === Steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as(stepCol(0)))

    // Step k: earliest occurrence strictly after the user's step k-1 time
    // (and within the deadline, when one is set — timestamp + INTERVAL is
    // exact integer micros on both engines).
    val reached = Steps.indices.tail.foldLeft(Vector(s0)) { (acc, i) =>
      val prev = acc.last
      val deadline: Column = withinHours
        .map(h => col("ts") <= col(stepCol(i - 1)) + expr(s"INTERVAL $h HOURS"))
        .getOrElse(lit(true))
      val next = ev.filter(col("event_type") === Steps(i))
        .join(prev.select(col("user_id"), col(stepCol(i - 1))), Seq("user_id"))
        .where(col("ts") > col(stepCol(i - 1)) && deadline)
        .groupBy(col("user_id")).agg(min(col("ts")).as(stepCol(i)))
      acc :+ next
    }

    val depth: Column = Steps.indices.tail
      .map(i => when(col(stepCol(i)).isNotNull, 1).otherwise(0): Column)
      .foldLeft(lit(1): Column)(_ + _)

    reached.tail.foldLeft(reached.head)((l, r) => l.join(r, Seq("user_id"), "left"))
      .select(col("user_id") +: Steps.indices.map(i => col(stepCol(i))) :+
        depth.cast("int").as("depth"): _*)
  }

  /** The aggregate funnel report — the deliverable a product team reads:
    * per step, how many users reached it and the step-over-step
    * conversion in ppm. The per-user funnel stage IS [[of]] verbatim
    * (the composite discipline), so the report cannot disagree with the
    * per-user table; the tail is ONE single-row aggregate (count of
    * non-null step times) unpivoted by a generator. Step labels carry
    * their ordinal so the report orders by funnel position.
    *
    * Integer ppm division (`div`/`//`, non-negative) with a zero-base
    * guard so the report is total even on an empty corpus.
    */
  def report(events: DataFrame): DataFrame = {
    val aggs = Steps.indices.map(i => count(col(stepCol(i))).as(s"n$i"))
    val one = of(events).agg(aggs.head, aggs.tail: _*)
    val rows = Steps.indices.map { i =>
      val conv = if (i == 0) "1000000L"
      else s"CASE WHEN n${i - 1} = 0 THEN 0L ELSE n$i * 1000000 div n${i - 1} END"
      s"'${i + 1}_${Steps(i)}', n$i, $conv"
    }.mkString(", ")
    one.selectExpr(s"stack(${Steps.length}, $rows) AS " +
        "(step, n_users, conv_from_prev_ppm)")
      .orderBy(col("step"))
  }

  /** Driver query: the aggregate funnel report over the events table. */
  def reportEvents(spark: SparkSession, dir: String): DataFrame =
    report(Tables.events(spark, dir))

  /** DuckDB mirror — same steps, same strict-after semantics. */
  val funnelSql: String = buildSql(withinHours = None)

  /** DuckDB mirror of the [[ConversionHours]]-deadline variant. */
  val funnelWindowedSql: String = buildSql(Some(ConversionHours))

  private def buildSql(withinHours: Option[Int]): String = {
    val s0 =
      s"""s0 AS (SELECT user_id, min(ts) AS ${stepCol(0)} FROM events
         |  WHERE event_type = '${Steps.head}' GROUP BY user_id)""".stripMargin
    val rest = Steps.indices.tail.map { i =>
      val deadline = withinHours.map(h =>
        s"\n|    AND e.ts <= s${i - 1}.${stepCol(i - 1)} + INTERVAL $h HOUR"
          .stripMargin).getOrElse("")
      s"""s$i AS (SELECT e.user_id, min(e.ts) AS ${stepCol(i)} FROM events e
         |  JOIN s${i - 1} ON e.user_id = s${i - 1}.user_id
         |  WHERE e.event_type = '${Steps(i)}' AND e.ts > s${i - 1}.${stepCol(i - 1)}$deadline
         |  GROUP BY e.user_id)""".stripMargin
    }
    val depth = Steps.indices.tail
      .map(i => s"CASE WHEN s$i.${stepCol(i)} IS NULL THEN 0 ELSE 1 END")
      .mkString("1 + ", " + ", "")
    val joins = Steps.indices.tail
      .map(i => s"LEFT JOIN s$i ON s0.user_id = s$i.user_id").mkString("\n")
    s"""WITH ${(s0 +: rest).mkString(",\n")}
       |SELECT s0.user_id, ${Steps.indices.map(i => s"${stepCol(i)}").mkString(", ")},
       |  CAST($depth AS INT) AS depth
       |FROM s0
       |$joins
       |ORDER BY s0.user_id""".stripMargin
  }

  /** DuckDB mirror of [[report]] — the certified per-user funnel SQL
    * embedded verbatim, then the same single-row unpivoted tail.
    */
  val reportSql: String = {
    val counts = Steps.indices
      .map(i => s"count(${stepCol(i)}) AS n$i").mkString(", ")
    val branches = Steps.indices.map { i =>
      val conv = if (i == 0) "CAST(1000000 AS BIGINT)"
      else s"CASE WHEN n${i - 1} = 0 THEN 0 ELSE n$i * 1000000 // n${i - 1} END"
      s"""SELECT '${i + 1}_${Steps(i)}' AS step, n$i AS n_users,
         |  $conv AS conv_from_prev_ppm FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH f AS (SELECT * FROM ($funnelSql)),
       |a AS (SELECT $counts FROM f)
       |$branches
       |ORDER BY step""".stripMargin
  }
}
