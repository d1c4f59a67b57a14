package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_positions(text)` — one-pass tokenizing GENERATOR: emits one
  * (pos, token) row per whitespace token, straight off the UTF8 input
  * without materializing the intermediate token array the composable
  * `posexplode(split(trim(text), " +"))` builds per row. This is the
  * UDTF third of the engine's native extension surface (scalar
  * Expressions + the KmvSketch aggregate being the other two): it plans
  * as a Generate over the scan — the same whole-stage-friendly shape as
  * the built-in explode, with per-row work instead of per-row allocation
  * + copy.
  *
  * Tokenization is [[SpaceTokens]] (space-only trim), the repo-wide rule
  * that keeps every engine-side tokenizer bit-identical to the oracle's
  * `string_split_regex(trim(text), ' +')`.
  */
case class TokenPositions(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("token", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_positions requires a STRING input, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = SpaceTokens(v.asInstanceOf[UTF8String].toString)
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < toks.length
        override def next(): InternalRow = {
          val row = InternalRow(i, UTF8String.fromString(toks(i)))
          i += 1
          row
        }
      }
    }
  }

  override def prettyName: String = "token_positions"

  override protected def withNewChildInternal(newChild: Expression): TokenPositions =
    copy(child = newChild)
}

object TokenPositions {
  /** Column-API form: `df.select(col("doc_id"), TokenPositions.of(col("text")))`
    * expands to (doc_id, pos, token) rows.
    */
  def of(text: Column): Column =
    ColumnBridge.column(TokenPositions(ColumnBridge.expression(text)))
}
