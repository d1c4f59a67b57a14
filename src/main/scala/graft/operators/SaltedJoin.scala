package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    hashed from `saltOn` (a caller-supplied per-row disambiguator: a
  *    message id, an order key, a source ordinal), so replays and retries
  *    salt identically;
  *  - the other (dim) side is replicated `salts` times;
  *  - the join key becomes (key, salt): each hot key fans out over `salts`
  *    tasks, at the cost of |dim| x salts shuffle volume.
  *
  * PASS A UNIQUE-ISH `saltOn` WHEN THE SOURCE HAS ONE (mqtt tables:
  * `msg_id`; orders: `o_orderkey`). The no-`saltOn` fallback hashes the
  * row's CONTENT (all fact columns), which has a documented hole: a hot key
  * whose rows are byte-identical (the boilerplate-doc / firehose-topic case
  * this operator exists for) hashes every copy to ONE salt value and still
  * serializes through a single task — no fan-out at all. SaltedJoinSpec
  * pins both behaviors: identical hot rows DO fan out under a `saltOn`
  * ordinal, and provably do NOT under the content-hash fallback.
  *
  * (Why not `rand()` or a partition-local counter: a nondeterministic salt
  * breaks task-retry idempotence — a retried map task would re-salt its rows
  * differently and the retried shuffle blocks would disagree with the
  * committed ones.)
  *
  * Multiplicities are preserved exactly (each fact row meets each matching
  * dim row exactly once — under its own salt), so the result is
  * bag-identical to the unsalted join; SaltedJoinSpec asserts that and the
  * hot key actually spreading across partitions.
  */
object SaltedJoin {

  def inner(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltOn: Seq[Column] = Nil): DataFrame = {
    require(salts > 0)
    val basis = if (saltOn.nonEmpty) saltOn
      else fact.columns.toIndexedSeq.map(col)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(basis: _*)), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Driver query: orders x customer through the salted join, rolled up per
    * market segment. The salt disambiguator is `o_orderkey` (unique per fact
    * row — closes the identical-row hole: even byte-identical order rows of
    * one hot customer would fan out), carried through the join and dropped
    * before the rollup. The dim side carries a shuffle-hash hint so the
    * salted SHUFFLE actually executes (at test scale Spark would otherwise
    * broadcast the replicated dim and the salt would never reach a shuffle
    * key — the very situation salting exists for is the one where neither
    * side broadcasts). The oracle is the plain unsalted join: green
    * certifies the salt fan-out preserved multiplicities exactly.
    */
  def orderVolumeBySegment(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val fact = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      .hint("shuffle_hash")
    inner(fact, dim, "o_custkey", salts, saltOn = Seq(col("o_orderkey")))
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
