package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * The order keys MUST form a total order (include a unique tiebreaker);
  * otherwise rows equal under the ordering may land on either side of a range
  * boundary and the assignment is nondeterministic.
  */
object ContiguousId {

  def assign(df: DataFrame, idCol: String, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted =
      if (df.rdd.getNumPartitions <= 1) df.sortWithinPartitions(order: _*)
      else df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }
}
