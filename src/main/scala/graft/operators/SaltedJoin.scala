package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Salted equi-join for skewed keys.
  *
  * A shuffle join routes every row of a key to one task, so one hot key
  * (the null-ish default, the boilerplate document, the firehose topic)
  * serializes its whole row set through a single straggler. The standard
  * remedies in preference order: broadcast the small side (no shuffle at
  * all), let AQE's skew-join split oversized sort-merge partitions at
  * runtime, and — when skew is known and extreme, or the hot side must
  * hash-join — salt explicitly:
  *
  *  - the skewed (fact) side gets a DETERMINISTIC salt in [0, salts) —
  *    content-hashed, so replays and retries salt identically;
  *  - the other (dim) side is replicated `salts` times;
  *  - the join key becomes (key, salt): each hot key fans out over `salts`
  *    tasks, at the cost of |dim| x salts shuffle volume.
  *
  * Multiplicities are preserved exactly (each fact row meets each matching
  * dim row exactly once — under its own salt), so the result is
  * bag-identical to the unsalted join; SaltedJoinSpec asserts that and the
  * hot key actually spreading across partitions.
  */
object SaltedJoin {

  def inner(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Driver query: orders x customer through the salted join, rolled up per
    * market segment. The dim side carries a shuffle-hash hint so the salted
    * SHUFFLE actually executes (at test scale Spark would otherwise broadcast
    * the replicated dim and the salt would never reach a shuffle key — the
    * very situation salting exists for is the one where neither side
    * broadcasts). The oracle is the plain unsalted join: green certifies the
    * salt fan-out preserved multiplicities exactly.
    */
  def orderVolumeBySegment(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val fact = Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      .hint("shuffle_hash")
    inner(fact, dim, "o_custkey", salts)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spend"))
      .orderBy(col("c_mktsegment"))
  }

  val orderVolumeBySegmentSql: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_spend
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin
}
