package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Dense-vector math over `array<float>` embedding columns, built from Spark's
  * codegen'd higher-order functions (no UDFs, no serialization boundary).
  *
  * Determinism contract: every fold is a LEFT fold in array order, so the
  * result is bit-identical to the DuckDB oracle's `list_reduce` over the same
  * values — float32 -> float64 widening is exact and IEEE addition order is
  * pinned. See [[VectorSql]] for the mirrored SQL generators.
  */
object VectorFunctions {

  /** Elementwise products, left-folded in array order — a codegen'd native
    * expression ([[DotProduct]]); identical arithmetic to the higher-order
    * `aggregate(zip_with(...))` form it replaces.
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Squared L2 distance, left-folded in array order ([[SquaredDistance]]). */
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity; 0.0 for zero vectors (instead of NaN) so ordering
    * stays total.
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }
}

/** DuckDB-SQL mirrors of [[VectorFunctions]] — same op, same fold order. */
object VectorSql {
  /** products via index transform, then sequential left-fold add. */
  def dot(a: String, b: String): String =
    s"list_reduce(list_transform(range(len($a)), i -> " +
      s"CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)), (x, y) -> x + y)"

  def norm(a: String): String = s"sqrt(${dot(a, a)})"

  /** Mirror of [[VectorFunctions.sqDist]]: per-index squared diffs, then a
    * sequential left-fold add — same doubles, same order.
    */
  def sqDist(a: String, b: String): String =
    s"list_reduce(list_transform(range(len($a)), i -> " +
      s"(CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE)) * " +
      s"(CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE))), (x, y) -> x + y)"

  def cosine(a: String, b: String): String =
    s"(CASE WHEN ${norm(a)} * ${norm(b)} = 0 THEN 0.0 " +
      s"ELSE ${dot(a, b)} / (${norm(a)} * ${norm(b)}) END)"
}
