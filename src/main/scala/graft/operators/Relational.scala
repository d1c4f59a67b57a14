package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Classic relational coverage over the TPC-H-ish driver tables: scans with
  * pushed filters, hash/broadcast joins (inner/semi/anti), partial-aggregated
  * groupBys, windows, rollup, set ops, top-k.
  *
  * Plan-shape notes (verified with .explain("formatted")):
  *  - filters and projections sit in the parquet scan (PushedFilters/ReadSchema);
  *  - dimension joins (region/nation/customer/supplier/part) are broadcast —
  *    the lineitem/orders fact side never shuffles for them;
  *  - aggregations are partial (map-side combine) before the one hash shuffle;
  *  - every query ends in a deterministic ORDER BY so results are stable and
  *    oracle-comparable (floats that came through arithmetic are rounded, and
  *    ranking uses the rounded value plus a unique tiebreaker).
  */
object Relational {

  /** TPC-H Q1 shape: pricing summary with multi-aggregate groupBy. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6 shape: selective scan + single aggregate. The three predicates
    * are all pushed to the parquet reader.
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  val forecastRevenueSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q3 shape: 3-way join + agg + top-k (broadcast customer dim). */
  def topOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val topOrdersSql: String =
    """SELECT o_orderkey, o_orderdate,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: 6-way join through region->nation->customer->orders->
    * lineitem->supplier with the "local supplier" nation equality.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val localSupplierVolumeSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Left-semi join: orders having at least one heavy lineitem (EXISTS). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(spark, dir).filter(col("l_quantity") > 49)
    Tables.orders(spark, dir)
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val semiJoinSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
      |ORDER BY o_orderkey""".stripMargin

  /** Probe-key discipline for the relational fixtures — the
    * [[Dedup.probeId]] rationale applied to customer/user keys: an additive
    * offset aliases real keys once the real key space reaches the offset
    * spacing, so every probe key rides this guard, which enforces
    * `0 <= key < Dedup.ProbeIdSpace` AT ROW TIME (a violating table fails
    * loudly instead of silently cross-linking probe families). The guard is
    * a codegen'd branch over the probe SUBSET only; on any conforming table
    * it is behaviorally invisible, so the guard-free oracle mirrors stay
    * bit-identical.
    */
  private def probeKey(c: Column, offset: Long): Column =
    when(c >= 0 && c < Dedup.ProbeIdSpace, c + offset)
      .otherwise(raise_error(concat(
        lit(s"probe-key offset $offset aliases real key "),
        c.cast("string"))).cast("long"))

  /** Left-anti join: customers with no orders (NOT EXISTS). The raw fixture
    * is VACUOUS here — every driver customer has at least one order at the
    * gate scales, so an unaugmented green row is an empty==empty match that
    * certifies nothing (the round-19 verdict finding). Probe families (the
    * [[Dedup.normProbeAugmented]] discipline): every 500th customer gains
    * an ORDERLESS relocated twin (offset 1e6 — the row the anti-join must
    * KEEP) and a twin WITH a matching probe order (offset 2e6 — the row it
    * must EXCLUDE), so the gate row asserts both regimes at every scale.
    * Probe keys ride [[probeKey]]; only the join key is unioned on the
    * orders side, so column pruning reaches the fact scan unchanged.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val seed = cust.filter(col("c_custkey") % 500 === 7)
    def probeCust(off: Long) = seed.select(
      probeKey(col("c_custkey"), off).as("c_custkey"),
      concat(lit("Probe#"), probeKey(col("c_custkey"), off).cast("string"))
        .as("c_name"))
    val ordKeys = Tables.orders(spark, dir).select(col("o_custkey"))
      .unionAll(seed.select(probeKey(col("c_custkey"), 2000000L).as("o_custkey")))
    cust.unionAll(probeCust(1000000L)).unionAll(probeCust(2000000L))
      .join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val antiJoinSql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_name FROM customer
      |  UNION ALL
      |  SELECT c_custkey + 1000000,
      |         concat('Probe#', CAST(c_custkey + 1000000 AS VARCHAR))
      |  FROM customer WHERE c_custkey % 500 = 7
      |  UNION ALL
      |  SELECT c_custkey + 2000000,
      |         concat('Probe#', CAST(c_custkey + 2000000 AS VARCHAR))
      |  FROM customer WHERE c_custkey % 500 = 7),
      |ords AS (
      |  SELECT o_custkey FROM orders
      |  UNION ALL
      |  SELECT c_custkey + 2000000 AS o_custkey
      |  FROM customer WHERE c_custkey % 500 = 7)
      |SELECT c_custkey, c_name FROM cust
      |WHERE NOT EXISTS (SELECT 1 FROM ords WHERE ords.o_custkey = cust.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Window: top-3 orders per customer by price (row_number, tiebreak key). */
  def windowTop3(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val windowTop3Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Cumulative window: running spend per user over event time. */
  /** Event-time RANGE-frame window — the frame class [[runningUserSpend]]'s
    * ROWS frame cannot express: each event's trailing-hour activity (count
    * and spend of the SAME user's events within the preceding 3600 s,
    * peers-at-the-same-second included, as RANGE semantics require). Epoch
    * seconds are floor-truncated identically on both engines so frame
    * membership is exact. One shuffle on user_id; the frame scan is
    * partition-local and order-bounded.
    */
  def trailingHourActivity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-3600L, 0L)
    Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .withColumn("epoch_s", unix_timestamp(col("ts")))
      // the frame sum folds CENTS (floor(value*100) longs), not doubles: a
      // RANGE frame ordered by epoch_s leaves the accumulation order among
      // same-second peers unpinned on both engines, and a float fold's
      // result depends on that order — integer sums cannot (the
      // runningUserSpend / kmeansStep exactness rule); display divides the
      // identical long back on both sides
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .select(col("user_id"), col("event_id"), col("epoch_s"),
        count(lit(1)).over(w).as("n_trailing_1h"),
        (sum(col("cents")).over(w).cast("double") / 100.0).as("spend_trailing_1h"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val trailingHourActivitySql: String =
    """SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |  CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
      |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0
      |    AS spend_trailing_1h
      |FROM events WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  def runningUserSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(sum(col("value")).over(w), 2).as("running_value"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val runningUserSpendSql: String =
    """SELECT user_id, event_id, ts,
      |  round(sum(value) OVER w, 2) AS running_value,
      |  CAST(count(*) OVER w AS BIGINT) AS running_n
      |FROM events WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** Rollup over status x priority with grand total (grouping sets). */
  def statusRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  val statusRollupSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Full cube over (event_type, user cohort): all four grouping sets in one
    * pass — Spark expands grouping sets into a single Expand + hash aggregate
    * (rows x sets map-side, still one shuffle), the shape that matters when
    * the cube feeds a 100 TB rollup dashboard.
    */
  /** Explicit GROUPING SETS — the general multi-granularity form that
    * [[cubeEvents]]/[[statusRollup]] specialize: three report granularities
    * (per event type, per cohort, grand total) in ONE pass over the data,
    * skipping the (type x cohort) cross products a CUBE would also compute.
    * At scale that is the point of grouping sets: each input row expands to
    * exactly |sets| aggregation keys (here 3) instead of 2^dims, and the
    * single shuffle carries the partially-aggregated expansion. Expressed
    * through the SQL surface (`spark.sql` over a registered view — the
    * Dataset API deliberately exposes only the cube/rollup shorthands).
    */
  def groupingSetsReport(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("cohort", (col("user_id") % 10).cast("int"))
      .createOrReplaceTempView("events_gsets")
    spark.sql(
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(CAST(cohort AS STRING), 'ALL') AS cohort,
        |       count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events_gsets
        |GROUP BY GROUPING SETS ((event_type), (cohort), ())
        |ORDER BY event_type, cohort""".stripMargin)
  }

  val groupingSetsReportSql: String =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |       coalesce(CAST(cohort AS VARCHAR), 'ALL') AS cohort,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 2) AS total_value
      |FROM (SELECT event_type, CAST(user_id % 10 AS INT) AS cohort, value FROM events)
      |GROUP BY GROUPING SETS ((event_type), (cohort), ())
      |ORDER BY event_type, cohort""".stripMargin

  def cubeEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("cohort", (col("user_id") % 10).cast("int"))
      .cube(col("event_type"), col("cohort"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("cohort").cast("string"), lit("ALL")).as("cohort"),
        col("n"), col("total_value"))
      .orderBy(col("event_type"), col("cohort"))

  val cubeEventsSql: String =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |       coalesce(CAST(cohort AS VARCHAR), 'ALL') AS cohort,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 2) AS total_value
      |FROM (SELECT event_type, CAST(user_id % 10 AS INT) AS cohort, value FROM events)
      |GROUP BY CUBE (event_type, cohort)
      |ORDER BY event_type, cohort""".stripMargin

  /** Set ops: users who clicked AND purchased but never hit an error. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    // the raw fixture is VACUOUS: every driver user who clicks and
    // purchases also errors at every scale, so INTERSECT-EXCEPT returns 0
    // rows and the green gate row certifies nothing (the round-19 verdict
    // finding). Probe user families (one per regime, each derived from the
    // real distinct-user seed so they exist at all scales): 1e6 =
    // click+purchase, never errs — the KEPT survivor; 2e6 = click+purchase+
    // error — excluded by the EXCEPT; 3e6 = click only — excluded by the
    // INTERSECT. Probe keys ride [[probeKey]]'s row-time ceiling guard.
    val ev = Tables.events(spark, dir).select(col("user_id"), col("event_type"))
    // cached: six probe branches read the seed — one distinct, not six
    // (measured 25 exchanges uncached; the oracle's CTE evaluates once)
    val seed = Caching.cached(ev.select(col("user_id")).distinct()
      .filter(col("user_id") % 100 === 3))
    def fam(off: Long, types: Seq[String]) = types.map(t =>
      seed.select(probeKey(col("user_id"), off).as("user_id"),
        lit(t).as("event_type"))).reduce(_.unionAll(_))
    val aug = ev
      .unionAll(fam(1000000L, Seq("click", "purchase")))
      .unionAll(fam(2000000L, Seq("click", "purchase", "error")))
      .unionAll(fam(3000000L, Seq("click")))
    def users(t: String) = aug.filter(col("event_type") === t).select(col("user_id")).distinct()
    users("click").intersect(users("purchase")).except(users("error"))
      .orderBy(col("user_id"))
  }

  val setOpsSql: String =
    """WITH seed AS (SELECT DISTINCT user_id FROM events WHERE user_id % 100 = 3),
      |ev AS (
      |  SELECT user_id, event_type FROM events
      |  UNION ALL SELECT user_id + 1000000, 'click' FROM seed
      |  UNION ALL SELECT user_id + 1000000, 'purchase' FROM seed
      |  UNION ALL SELECT user_id + 2000000, 'click' FROM seed
      |  UNION ALL SELECT user_id + 2000000, 'purchase' FROM seed
      |  UNION ALL SELECT user_id + 2000000, 'error' FROM seed
      |  UNION ALL SELECT user_id + 3000000, 'click' FROM seed)
      |(SELECT DISTINCT user_id FROM ev WHERE event_type = 'click'
      | INTERSECT
      | SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase')
      |EXCEPT
      |SELECT DISTINCT user_id FROM ev WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  /** Distinct aggregation per group. */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"))

  val distinctUsersSql: String =
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Global top-k with deterministic tiebreak. */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val topKOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Pivot: per-user-cohort event counts fanned into one column per event
    * type. The value list is EXPLICIT (Spark's values-less pivot runs a
    * driver-side distinct scan first — an extra corpus pass, and the result
    * schema would depend on the data); with explicit values the pivot plans
    * as one map-side-combined conditional aggregation, no extra scan.
    */
  val PivotEventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("cohort", (col("user_id") % 10).cast("int"))
      .groupBy(col("cohort"))
      .pivot("event_type", PivotEventTypes)
      .agg(count(lit(1)))
      .na.fill(0, PivotEventTypes)
      .orderBy(col("cohort"))

  val pivotEventsSql: String = {
    val cols = PivotEventTypes.map(t =>
      s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS $t").mkString(",\n  ")
    s"""SELECT CAST(user_id % 10 AS INT) AS cohort,
       |  $cols
       |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin
  }

  /** The inverse reshape (§2.5 completion): melt the pivoted cohort x
    * event-type matrix back to long form with the native `unpivot`
    * operator (plans as a single Expand — |value columns| output rows per
    * input row, no shuffle beyond the pivot's own aggregation). Zero
    * cells survive the round trip, so the output is the DENSE long form —
    * the oracle mirrors that with a cohort x type scaffold left-joined to
    * the sparse counts.
    */
  def unpivotEvents(spark: SparkSession, dir: String): DataFrame =
    pivotEvents(spark, dir)
      .unpivot(Array(col("cohort")), PivotEventTypes.map(col).toArray,
        "event_type", "n")
      .orderBy(col("cohort"), col("event_type"))

  val unpivotEventsSql: String = {
    val types = PivotEventTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH c AS (SELECT DISTINCT CAST(user_id % 10 AS INT) AS cohort FROM events),
       |t AS (SELECT unnest([$types]) AS event_type),
       |n AS (SELECT CAST(user_id % 10 AS INT) AS cohort, event_type,
       |        count(*) AS n
       |      FROM events GROUP BY 1, 2)
       |SELECT c.cohort, t.event_type, CAST(COALESCE(n.n, 0) AS BIGINT) AS n
       |FROM c CROSS JOIN t
       |LEFT JOIN n ON n.cohort = c.cohort AND n.event_type = t.event_type
       |ORDER BY c.cohort, t.event_type""".stripMargin
  }

  /** Time bucketing: monthly event rollup (date_trunc + agg). */
  def monthlyEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("month", col("ts")).cast("timestamp_ntz").as("month"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("month"), col("event_type"))

  val monthlyEventsSql: String =
    """SELECT date_trunc('month', ts) AS month, event_type,
      |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY month, event_type""".stripMargin

  /** Weekday × hour activity heatmap — the load-profile read behind
    * capacity planning and anomaly baselining: event volume and value
    * mass on the 7×24 grid. Day-of-week comes from pure epoch-micro
    * integer arithmetic (`(days + 4) % 7`, 0 = Sunday — 1970-01-01 was a
    * Thursday), never an engine's locale-dependent dow function, so both
    * engines compute the identical bucket; value mass is the per-element
    * IEEE micro floor summed as integers (order-immune). ONE map-side-
    * combined shuffle to at most 168 rows.
    */
  def hourHeatmap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .select(expr("((us div 86400000000) + 4) % 7").as("dow"),
        expr("(us div 3600000000) % 24").as("hour"),
        floor(col("value") * lit(1e6)).cast("long").as("vm"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("vm")).as("sum_value_micro"))
      .orderBy(col("dow"), col("hour"))

  val hourHeatmapSql: String =
    """WITH b AS (
      |  SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
      |    (epoch_us(ts) // 3600000000) % 24 AS hour,
      |    CAST(floor(value * 1000000) AS BIGINT) AS vm
      |  FROM events)
      |SELECT dow, hour, count(*) AS n_events,
      |  CAST(sum(vm) AS BIGINT) AS sum_value_micro
      |FROM b GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin

  /** Cohort retention matrix: users grouped by their first-activity day,
    * counted per days-since-cohort age — the classic product-analytics
    * read over an event stream (daily grain because the driver events span
    * one month; a longer-horizon deployment passes a coarser truncation).
    * ONE user-keyed shuffle builds both the cohort day and the distinct
    * active-day set (`collect_set` is bounded by the calendar horizon, not
    * by data volume — a user active every day for 10 years holds 3 653
    * entries); the explode fans back out to (cohort, age) pairs for a
    * final aggregation whose key space is days², so the second shuffle is
    * trivially small at any data scale. Ages are exact integer day
    * differences of day-truncated stamps on both engines — no
    * interval/float date math to diverge.
    */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("timestamp_ntz").as("d"))
    e.groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort_day"), collect_set(col("d")).as("days"))
      .select(col("cohort_day"), explode(col("days")).as("d"))
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).as("age_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("age_days"))
  }

  val retentionCohortSql: String =
    """WITH pd AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
      |cohort AS (
      |  SELECT user_id, min(d) AS cohort_day FROM pd GROUP BY 1)
      |SELECT c.cohort_day,
      |  CAST(date_diff('day', c.cohort_day, p.d) AS INT) AS age_days,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM pd p JOIN cohort c USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_day, age_days""".stripMargin

  /** Exact interpolated percentiles per group (`percentile` — the sort-based
    * exact form; `approx_percentile`'s sketch would not be oracle-matchable).
    * DuckDB's quantile_cont uses the same linear interpolation; round(6)
    * absorbs the last-ulp arithmetic difference.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy(col("event_type"))

  val percentilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.9), 6) AS p90,
      |  round(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Robust per-group outlier profile: median, MAD (median absolute
    * deviation), and the count of values beyond the classic 3×MAD fence —
    * the standard data-quality screen that, unlike mean/stddev fences, a
    * few extreme rows cannot drag.
    *
    * Exactness discipline: values scale to integer cents first, so every
    * median/MAD is a half-integer both engines represent exactly (integer
    * medians interpolate to .5 at worst, deviations are half-integers, the
    * MAD interpolates to .25 at worst — all exact in doubles), and the
    * 3×MAD comparison can never flip on a ulp. Group medians are the EXACT
    * sort-based percentile (like [[percentiles]]); the bounded-state scale
    * path for percentile-ish reads is q_approx_quantiles — this operator is
    * the exact twin with per-group-sized state, keyed on the small
    * event_type dimension. The two percentile passes and the fence count
    * are all keyed aggregations on event_type; the median/MAD side tables
    * are group-cardinality-sized and broadcast back to the fact scan.
    */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.5)").as("med_cents"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("cents") - col("med_cents")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5)").as("mad_cents"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(min(col("med_cents")).as("med_cents"),
        min(col("mad_cents")).as("mad_cents"),
        count(lit(1)).as("n"),
        sum(when(col("adev") > lit(3) * col("mad_cents"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("event_type"))
  }

  val anomalyMadSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |med AS (
      |  SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
      |  FROM e GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, e.cents, med.med_cents,
      |         abs(e.cents - med.med_cents) AS adev
      |  FROM e JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type,
      |  min(d.med_cents) AS med_cents,
      |  min(m.mad_cents) AS mad_cents,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN d.adev > 3 * m.mad_cents THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** NTILE bucketing: per-event-type quartile assignment with per-bucket
    * totals — the "value distribution by quartile" report. The window
    * orders by (value, event_id): a total order, so bucket boundaries are
    * pinned and cannot reorder between engines (both use the same NTILE
    * rule — earlier buckets absorb the remainder). One window shuffle
    * keyed by event_type, then a map-side-combined rollup on
    * (event_type, quartile) — 4 rows per group key at any scale.
    */
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"),
        ntile(4).over(w).as("quartile"))
      .groupBy(col("event_type"), col("quartile"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"), col("quartile"))
  }

  val ntileQuartilesSql: String =
    """WITH q AS (
      |  SELECT event_type, value,
      |         ntile(4) OVER (PARTITION BY event_type
      |                        ORDER BY value, event_id) AS quartile
      |  FROM events)
      |SELECT event_type, quartile, CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 2) AS total_value
      |FROM q GROUP BY 1, 2 ORDER BY event_type, quartile""".stripMargin

  /** Full-outer reconciliation: year-over-year customer order activity —
    * customers active in 1995 or 1996, with per-year counts/totals and
    * zero-fill for the year they were absent. Both inputs are map-side-
    * combined aggregations on the SAME key (`o_custkey`), so the full-outer
    * join runs as a sort-merge on an exchange both sides already need — a
    * fact-to-fact reconciliation with exactly one shuffle per side and no
    * broadcast assumption (at 100 TB neither year's aggregate is small).
    * Spark's using-column full outer coalesces the join key natively.
    */
  def outerJoinYears(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def yearAgg(y: Int) =
      o.filter(col("o_orderdate") >= lit(s"$y-01-01") &&
          col("o_orderdate") < lit(s"${y + 1}-01-01"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as(s"n_$y"), round(sum(col("o_totalprice")), 2).as(s"total_$y"))
    yearAgg(1995).join(yearAgg(1996), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_1995"), lit(0L)).as("n_1995"),
        coalesce(col("total_1995"), lit(0.0)).as("total_1995"),
        coalesce(col("n_1996"), lit(0L)).as("n_1996"),
        coalesce(col("total_1996"), lit(0.0)).as("total_1996"))
      .orderBy(col("o_custkey"))
  }

  val outerJoinYearsSql: String = {
    def yearCte(name: String, y: Int) =
      s"""$name AS (SELECT o_custkey, count(*) AS n_$y,
         |  round(sum(o_totalprice), 2) AS total_$y
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '$y-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '${y + 1}-01-01 00:00:00'
         |  GROUP BY o_custkey)""".stripMargin
    s"""WITH ${yearCte("y95", 1995)},
       |${yearCte("y96", 1996)}
       |SELECT coalesce(y95.o_custkey, y96.o_custkey) AS o_custkey,
       |  CAST(coalesce(n_1995, 0) AS BIGINT) AS n_1995,
       |  CAST(coalesce(total_1995, 0.0) AS DOUBLE) AS total_1995,
       |  CAST(coalesce(n_1996, 0) AS BIGINT) AS n_1996,
       |  CAST(coalesce(total_1996, 0.0) AS DOUBLE) AS total_1996
       |FROM y95 FULL OUTER JOIN y96 ON y95.o_custkey = y96.o_custkey
       |ORDER BY o_custkey""".stripMargin
  }

  /** Session windows: per-user activity sessions split at >= 30-minute gaps
    * (`session_window` — the merging event-time window; an event at exactly
    * session_end starts a NEW session, windows are end-exclusive). The oracle
    * re-derives the same sessions with the standard lag + cumulative-sum
    * session-id idiom, so the merge semantics are cross-checked against an
    * independent formulation. One shuffle on (user, session) — Spark plans
    * session merging partition-locally after the user hash exchange.
    */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  val sessionWindowsSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Distribution ranks per user within an event type — the §2.5 window
    * functions NTILE doesn't cover: percent_rank (relative standing),
    * cume_dist (fraction at-or-above), nth_value (the podium cutoff,
    * running frame). Spend totals are cent-scaled longs (the exactness
    * rule); the ratios are exact small-integer divisions, identical
    * doubles in both engines, rounded for the projection only. The window
    * orders on (total DESC, user_id) — a total order, so no tie can
    * reorder ranks across engines.
    */
  def valueRanks(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("total_cents"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("total_cents").desc, col("user_id"))
    totals.select(col("event_type"), col("user_id"), col("total_cents"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        nth_value(col("total_cents"), 3).over(w).as("third_cents"))
      .orderBy(col("event_type"), col("user_id"))
  }

  val valueRanksSql: String =
    """WITH totals AS (
      |  SELECT event_type, user_id,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |  FROM events WHERE user_id IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT event_type, user_id, total_cents,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  nth_value(total_cents, 3) OVER w AS third_cents
      |FROM totals
      |WINDOW w AS (PARTITION BY event_type ORDER BY total_cents DESC, user_id)
      |ORDER BY event_type, user_id""".stripMargin
}
