package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.graft.InternalBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Gap-free, contiguous 1..N id assignment in a given total order.
  *
  * The reference forces contiguous ids with a before-insert trigger
  * `SET NEW.id = (SELECT MAX(id)+1 FROM mqtt)` (/root/reference/mysql.sql:67-74),
  * and its history ids are ascending autoincrements whose order users rely on
  * (/root/reference/README.md:251). `monotonically_increasing_id()` is NOT a
  * valid substitute (non-contiguous), and a global `row_number()` window forces
  * everything through a single partition — fine for a dimension-sized frame,
  * fatal for a 100 TB fact table.
  *
  * This helper instead does the scalable three-step:
  *   1. range-repartition + sort on the order keys (one shuffle, all partitions
  *      globally ordered end-to-end),
  *   2. per-partition `zipWithIndex` (no data movement),
  *   3. add the per-partition offsets (computed from partition sizes on the
  *      driver — one Long per partition, not per row).
  *
  * zipWithIndex inherently needs two passes (a partition-size count job, then
  * the real pass), so the sorted frame is cached once in Tungsten row format
  * — the expensive upstream (per-topic window pipelines) runs exactly once.
  * The cache is a plain RDD persist, so Spark's ContextCleaner unpersists it
  * automatically once the result frame is unreferenced. Staying on
  * `InternalRow` end-to-end (InternalBridge) means no Row conversion exits
  * codegen around the RDD stage.
  *
  * The order keys MUST form a total order (include a unique tiebreaker);
  * otherwise rows equal under the ordering may land on either side of a range
  * boundary and the assignment is nondeterministic.
  */
object ContiguousId {

  def assign(df: DataFrame, idCol: String, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    // copy: scan/codegen output rows are reused buffers; the cache keeps them
    val base = InternalBridge.toInternalRdd(sorted)
      .map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val indexed = base.zipWithIndex().mapPartitions { it =>
      it.map { case (row, i) => new JoinedRow(row, InternalRow(i + 1L)): InternalRow }
    }
    InternalBridge.internalCreateDataFrame(spark, indexed, schema)
  }
}
