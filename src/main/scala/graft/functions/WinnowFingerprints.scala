package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * scheme): the sorted distinct minima of every `w`-window over the ORDERED
  * sequence of word-`n`-gram 60-bit md5 hashes — in one pass over the
  * string.
  *
  * Winnowing's guarantee: any shared substring of at least `w + n - 1`
  * words between two documents yields at least one SHARED fingerprint, at
  * ~2/(w+1) the storage of the full shingle set — the standard
  * position-robust fingerprint for plagiarism/overlap detection at corpus
  * scale, where the full hash sequence is too big to index.
  *
  * Numerically identical to the composed spelling the DuckDB oracle keeps
  * (`list_sort(list_distinct(list_transform(range(len(H)-w+1), i ->
  * list_min(H[i+1:i+w]))))` over `H = list_transform(shingles, hash60)`);
  * the native form exists for the same reason as [[ShingleHash60]]: the
  * composed tree re-inlines tokenization per element after projection
  * collapse. Degenerate cases, mirrored exactly: no shingles -> empty;
  * fewer than `w` shingles -> the single global minimum.
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"winnow_fingerprints_${n}_$w"

  override def nullSafeEval(input: Any): Any = {
    val toks = SpaceTokens(input.toString)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val md = WinnowFingerprints.digest.get()
    val sb = new java.lang.StringBuilder()
    val nGrams = toks.length - n + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      md.reset()
      val h = md.digest(sb.toString.getBytes("UTF-8"))
      val top64 =
        ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
          ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
          ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
      hashes(i) = top64 >>> 4
      i += 1
    }
    val seen = new java.util.TreeSet[java.lang.Long]()
    if (nGrams < w) {
      var min = hashes(0)
      var j = 1
      while (j < nGrams) { if (hashes(j) < min) min = hashes(j); j += 1 }
      seen.add(min)
    } else {
      var start = 0
      while (start <= nGrams - w) {
        var min = hashes(start)
        var j = start + 1
        while (j < start + w) { if (hashes(j) < min) min = hashes(j); j += 1 }
        seen.add(min)
        start += 1
      }
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

object WinnowFingerprints {
  private val digest = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  def apply(text: Column, n: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), n, w))
}
