package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's unified Column API hides the catalyst Expression constructor
  * behind `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils).
  * This bridge lives inside the org.apache.spark.sql package tree to expose
  * the two conversions graft's custom expressions need — the same technique
  * every Catalyst-extension library uses.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** InternalRow-level plumbing for operators that genuinely need an RDD stage
  * (today: [[graft.operators.ContiguousId]]'s zipWithIndex). Staying on
  * `InternalRow` (`queryExecution.toRdd` / `internalCreateDataFrame`) instead
  * of `df.rdd` / `createDataFrame(Row)` avoids the full
  * InternalRow->Row->InternalRow round-trip per row that exits and re-enters
  * Tungsten format around the RDD stage.
  */
object InternalBridge {
  import org.apache.spark.rdd.RDD
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.StructType
  import org.apache.spark.sql.{DataFrame, Row, SparkSession}

  /** The physical-plan output RDD, in Tungsten row format. Rows may be reused
    * buffers — callers must `.copy()` before buffering or caching them.
    */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].queryExecution.toRdd

  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
