package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bloom-filtered semi-join — Spark's runtime-filter idea made an explicit,
  * plan-visible operator.
  *
  * A semi-join of a huge fact table against a filtered dimension normally
  * shuffles (or at least scans and feeds the join with) EVERY fact row, even
  * though most will not survive. The bloom pattern builds a fixed-size bitmap
  * over the dim key set, broadcasts it (8 KiB here, independent of dim
  * cardinality), and drops non-matching fact rows BEFORE the join — at
  * 100 TB that's the difference between shuffling the whole fact table and
  * shuffling only the ~matching slice. False positives (~1% at these
  * parameters) cost only wasted join work; the exact semi-join behind the
  * filter restores precise semantics, so the result is row-identical to the
  * plain semi-join and the DuckDB oracle checks it as such.
  *
  * Construction is all built-in codegen'd expressions (xxhash64 positions,
  * explode -> bit_or words, map_from_entries bitmap): the bitmap build is a
  * distributed aggregation that only ever materializes <= Bits/64 words, and
  * the probe is a broadcast of ONE bitmap row (the same counted single-row
  * BroadcastNestedLoopJoin exemption as text_tfidf's corpus-N join).
  */
object BloomJoin {

  /** Bitmap width in bits (64 Ki = 8 KiB) and probe count. With ~6k dim keys
    * this sits near the k=3 optimum; sized up, the bitmap stays a broadcast
    * payload orders of magnitude under any dimension table.
    */
  val Bits: Int = 1 << 16
  val Probes: Int = 3

  /** Probe `probe`'s bit position for a key — seeded xxhash64, so the k
    * probes are independent and both build and probe sides derive positions
    * from the identical deterministic expression.
    */
  private def bitPos(key: Column, probe: Int): Column =
    pmod(xxhash64(key, lit(probe)), lit(Bits.toLong)).cast("int")

  /** The dim key set's bloom bitmap as a single-row frame holding
    * map<word_idx, 64-bit word>: positions explode out of the keys, OR into
    * words distributed (map-side combined bit_or), and only the <= Bits/64
    * final words gather into the map.
    */
  def bitmap(dim: DataFrame, dimKey: String): DataFrame =
    dim.select(explode(array((0 until Probes).map(i => bitPos(col(dimKey), i)): _*)).as("pos"))
      .select(expr("CAST(pos div 64 AS INT)").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), pos % 64)").as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("word"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("word")))).as("__bloom"))

  /** Fact rows whose `factKey` has a match in `dim(dimKey)`: bloom pre-filter
    * (broadcast bitmap, codegen'd bit tests) followed by the exact semi-join
    * that removes the false positives. Output is bag-identical to the plain
    * semi-join; the filter exists to cut the fact volume reaching the join.
    */
  def semi(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame = {
    val posCols = (0 until Probes).map(i => s"__p$i" -> bitPos(col(factKey), i))
    val probed = fact.crossJoin(broadcast(bitmap(dim, dimKey)))
      .withColumns(posCols.toMap)
    val pass = (0 until Probes).map { i =>
      expr(s"(coalesce(element_at(__bloom, CAST(__p$i div 64 AS INT)), CAST(0 AS BIGINT))" +
        s" & shiftleft(CAST(1 AS BIGINT), __p$i % 64)) != 0")
    }.reduce(_ && _)
    probed.filter(pass)
      .drop("__bloom" +: posCols.map(_._1): _*)
      .join(dim.select(col(dimKey)).distinct(), col(factKey) === col(dimKey), "left_semi")
  }

  /** Driver query: lineitems belonging to urgent orders, pre-filtered by the
    * bloom bitmap of the urgent order-key set, aggregated per return flag.
    * The oracle is the plain IN-subquery semi-join — green means the bloom
    * path changed nothing but the work.
    */
  def urgentLineitems(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    semi(Tables.lineitem(spark, dir).select("l_orderkey", "l_returnflag", "l_quantity"),
      urgent, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  val urgentLineitemsSql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
      |  sum(l_quantity) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
}
