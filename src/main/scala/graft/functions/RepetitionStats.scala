package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Token/bigram repetition statistics of a text in ONE pass:
  * (n_tokens, n_distinct_tokens, max_bigram_count) where max_bigram_count is
  * the multiplicity of the most frequent word bigram.
  *
  * Numerically identical to the composable form (sorted bigram array +
  * run-length `aggregate` fold + `array_distinct` — the spelling the DuckDB
  * oracle keeps, [[graft.operators.TextAnalysisSql.repetitionSql]]), but the
  * fold's struct accumulator is interpreted per element and projection
  * collapse re-inlines the whole fold into every referencing column
  * (measured: 23 s for the sf0.1 documents table; sub-second with this) —
  * the ShingleHash60 story again, see that scaladoc.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("max_bigram_count", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val toks = SpaceTokens(input.toString)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) { distinct.add(toks(i)); i += 1 }
    var maxBigram = 0L
    if (toks.length >= 2) {
      val counts = new java.util.HashMap[String, java.lang.Long]()
      var j = 0
      while (j < toks.length - 1) {
        val bg = toks(j) + " " + toks(j + 1)
        val c = counts.merge(bg, 1L, (a, b) => a + b)
        if (c > maxBigram) maxBigram = c
        j += 1
      }
    }
    InternalRow(toks.length.toLong, distinct.size.toLong, maxBigram)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  def apply(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))
}
