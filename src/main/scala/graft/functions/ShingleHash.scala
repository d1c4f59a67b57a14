package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct word-n-gram shingles of a text, each as the first 60 bits of its
  * md5 — in ONE pass over the string.
  *
  * Numerically identical to the composable form
  * `array_distinct(transform(sequence(...), i -> concat(element_at(split(trim(t), " +"), ...))))`
  * piped through `conv(substr(md5(s),1,15),16,10)` — the DuckDB oracle keeps
  * that spelling ([[TextSql.shingles]] + [[TextSql.hash60]]). The expression
  * form exists because the composed expression tree re-inlines the regex
  * tokenization into every `element_at` after projection collapse: O(tokens x n)
  * regex splits PER DOCUMENT (measured: 14 s to build a 260k-row inverted
  * index at sf0.1; sub-second with this). At 100 TB the difference is the
  * whole job.
  *
  * The MinHash x-values are the first 32 bits of the same md5 — exactly
  * `hash60 >>> 28` — so one array serves the Jaccard index, sizes, and
  * signature generation.
  */
case class ShingleHash60(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"shingle_hash60_$n"

  override def nullSafeEval(input: Any): Any = {
    val toks = SpaceTokens(input.toString)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val md = ShingleHash60.digest.get()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      md.reset()
      val h = md.digest(sb.toString.getBytes("UTF-8"))
      // first 15 hex chars == top 60 bits of the first 8 bytes
      val top64 =
        ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
          ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
          ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
      seen.add(top64 >>> 4)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash60 {
  private val digest = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash60(ColumnBridge.expression(text), n))
}
