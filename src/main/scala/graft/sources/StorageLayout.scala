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

  /** Morton (Z-order) interleave of the low `bits` bits of n non-negative
    * integer dimensions, round-robin: bit i of dimension j lands at
    * position i*n + j. Pure codegen'd bit arithmetic (n x bits shift/mask
    * terms). Inputs are widened to long BEFORE shifting: for IntegerType
    * columns a high source bit would otherwise land on the int sign bit
    * and every such z-value would go negative, destroying the clustering.
    * n*bits must fit the 63 value bits of a long — at 3+ dims shrink
    * `bits` accordingly (real layout keys — tenant, day, bucketed id —
    * rarely need more than ~20 bits each).
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 2, s"zValue needs >= 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"zValue: $n dims x $bits bits = ${n * bits} interleaved bits; must be in [n, 63]")
    val longs = dims.map(_.cast("long"))
    (for { i <- 0 until bits; j <- 0 until n } yield
      shiftleft(shiftright(longs(j), i).bitwiseAND(1L), i * n + j)
    ).reduce(_ + _)
  }

  /** Two-dimension form (bit i of `a` at position 2i, of `b` at 2i+1 —
    * the round-robin layout at n=2).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValue(Seq(a, b), bits)

  /** Write `df` Z-order-clustered on n integer dimensions: range-partition
    * and sort by the interleaved z-value, so each output file covers a
    * small HYPER-RECTANGLE of dimension space instead of a slab of one
    * dimension. A box predicate on the dims then overlaps few files'
    * min/max envelopes — the property linear sorting cannot give: sorting
    * by `a` alone leaves every file spanning the full range of the other
    * dims, so their predicates prune nothing. This is what parquet
    * row-group/file skipping consumes at 100 TB; [[graft.StorageLayoutSpec]]
    * measures the envelope-overlap counts of 2- and 3-dim layouts against
    * linear baselines on box predicates.
    */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
      files: Int, bits: Int): Unit =
    df.withColumn("__z", zValue(dims.map(col), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      files: Int, bits: Int = 16): Unit =
    writeZOrdered(df, path, Seq(a, b), files, bits)
}
