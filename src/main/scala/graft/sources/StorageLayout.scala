package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-layout writers — the storage half of the 100 TB design: what a
  * shuffle costs at query time can often be paid ONCE at write time.
  *
  *  - Bucketed tables: rows are hash-clustered into a fixed number of
  *    buckets by join key at write time; two tables bucketed the same way
  *    join with NO exchange on either side — the repeated-join shuffle
  *    (the dominant cost of a fact-to-fact join at scale) disappears from
  *    every downstream query. [[graft.StorageLayoutSpec]] asserts the
  *    exchange-free plan.
  *  - Partitioned tables: low-cardinality columns become directory keys, so
  *    a filter on them prunes whole directories at planning time — the scan
  *    reads files proportional to the predicate's selectivity, not the
  *    table size. The spec asserts the pruned scan via PartitionFilters.
  *
  * Thin by design: the value is the declared, tested layout contract (and
  * the plan shapes it buys), not wrapper logic.
  */
object StorageLayout {

  /** Write `df` as a bucketed+sorted datasource table. `buckets` should
    * match across tables that join on `key`, and approximate
    * cluster-parallelism at deployment scale.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Write `df` hive-style partitioned by `cols` (low-cardinality keys
    * first; never a high-cardinality id — millions of directories is its
    * own scale pathology).
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Morton (Z-order) interleave of the low `bits` bits of two non-negative
    * integer dimensions — bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Pure codegen'd bit arithmetic (2 x bits shift/mask terms).
    * Inputs are widened to long BEFORE shifting: for IntegerType columns,
    * bit 15 of `b` would otherwise land on the int sign bit (position 31)
    * and every such z-value would go negative, destroying the clustering.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Write `df` Z-order-clustered on two integer dimensions: range-partition
    * and sort by the interleaved z-value, so each output file covers a
    * small HYPER-RECTANGLE of (a, b) space instead of a slab of one
    * dimension. A box predicate on BOTH dims then overlaps few files'
    * min/max envelopes — the property linear sorting cannot give: sorting
    * by `a` alone leaves every file spanning the full `b` range, so a
    * `b` predicate prunes nothing. This is what parquet row-group/file
    * skipping consumes at 100 TB; [[graft.StorageLayoutSpec]] measures the
    * envelope-overlap counts of both layouts on a box predicate.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      files: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(a), col(b), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
