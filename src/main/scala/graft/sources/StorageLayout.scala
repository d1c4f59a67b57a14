package graft.sources

import org.apache.spark.sql.DataFrame

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
}
