package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All language-ID statistics of a text in ONE pass: the per-language
  * marker-hit scores, the best score, the best-vs-second-best margin, and
  * the fixed-priority argmax label ([[TextFunctions.langMarkers]] order,
  * `und` when no marker hits).
  *
  * Numerically identical to the composed built-in spelling the DuckDB
  * oracle keeps ([[TextSql.langScores]] / [[TextSql.langPredict]]): each
  * score is the count of non-overlapping left-to-right occurrences of the
  * language's markers in the space-padded text — exactly the
  * `(length(x) - length(replace(x, m, ''))) / length(m)` arithmetic — and
  * the label is the first language (marker-table order) whose score
  * equals the maximum, when any marker hit at all. Occurrence counting is
  * byte-level over the UTF-8 input, which equals codepoint-level counting
  * because UTF-8 is self-synchronizing (a marker's lead byte can never
  * match inside another codepoint's continuation bytes).
  *
  * Why a native expression: the composed spelling re-expands the 15
  * marker-count `replace` chains under every consumer — `greatest`, the
  * total, and each branch of the argmax CASE — so the clean-chain gate
  * (langPredict == lang AND quality >= min) generated Java methods past
  * Janino's 64 KB limit wherever it met a hash aggregate
  * (`hashAgg_doAggregate` InternalCompilerException, 25 occurrences in
  * the round-15 suite log) and the engine's most-reused predicate
  * silently ran INTERPRETED. This expression compiles to one static call
  * and one pass over the bytes (the composed form also re-scans and
  * re-allocates the text once per marker per consumer).
  * CodegenCompileSpec pins the fix: the gate queries execute with
  * `spark.sql.codegen.fallback=false`, so a Janino regression fails the
  * suite instead of falling back.
  */
case class LangStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LangStats.schema

  override def prettyName: String = "lang_stats"

  protected override def nullSafeEval(input: Any): Any =
    LangStats.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langStats", LangStats, LangStats.getClass.getName)
    defineCodeGen(ctx, ev, c => s"(InternalRow) $ref.eval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangStats {

  /** Languages in priority order; ties in the argmax go to the earliest. */
  val langs: Array[String] = TextFunctions.langMarkers.map(_._1).toArray

  val schema: StructType = StructType(
    langs.map(l => StructField(s"score_$l", IntegerType, nullable = false)) ++
      Seq(
        StructField("best", IntegerType, nullable = false),
        StructField("margin", IntegerType, nullable = false),
        StructField("pred", StringType, nullable = false)))

  /** Marker byte sequences per language, padded-text convention ("
    * the " style word markers match against ' ' + text + ' ').
    */
  private val markerBytes: Array[Array[Array[Byte]]] =
    TextFunctions.langMarkers.map { case (_, ms) =>
      ms.map(_.getBytes(StandardCharsets.UTF_8)).toArray
    }.toArray

  private val predLabels: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")

  /** Non-overlapping left-to-right occurrences of `pat` in `hay` (byte
    * domain) — the `replace`-arithmetic count both engines compute.
    */
  private def countOccurrences(hay: Array[Byte], pat: Array[Byte]): Int = {
    val n = hay.length - pat.length
    var count = 0
    var i = 0
    while (i <= n) {
      var j = 0
      while (j < pat.length && hay(i + j) == pat(j)) j += 1
      if (j == pat.length) { count += 1; i += pat.length }
      else i += 1
    }
    count
  }

  def eval(s: UTF8String): InternalRow = {
    val tb = s.getBytes
    val padded = new Array[Byte](tb.length + 2)
    padded(0) = ' '
    System.arraycopy(tb, 0, padded, 1, tb.length)
    padded(padded.length - 1) = ' '
    val scores = new Array[Int](langs.length)
    var total = 0
    var l = 0
    while (l < langs.length) {
      val ms = markerBytes(l)
      var m = 0
      var sc = 0
      while (m < ms.length) { sc += countOccurrences(padded, ms(m)); m += 1 }
      scores(l) = sc
      total += sc
      l += 1
    }
    // fixed-priority argmax: strict > keeps the FIRST maximum
    var bestIdx = 0
    l = 1
    while (l < langs.length) {
      if (scores(l) > scores(bestIdx)) bestIdx = l
      l += 1
    }
    val best = scores(bestIdx)
    var second = 0
    l = 0
    while (l < langs.length) {
      if (l != bestIdx && scores(l) > second) second = scores(l)
      l += 1
    }
    val pred = if (total > 0) predLabels(bestIdx) else und
    val margin = if (total > 0) best - second else 0
    val values = new Array[Any](langs.length + 3)
    l = 0
    while (l < langs.length) { values(l) = scores(l); l += 1 }
    values(langs.length) = best
    values(langs.length + 1) = margin
    values(langs.length + 2) = pred
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }

  def apply(text: Column): Column =
    ColumnBridge.column(LangStats(ColumnBridge.expression(text)))
}
