package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5 as a non-negative int64 — the engine's shared
  * token/content hash — in ONE digest pass.
  *
  * Numerically identical to the composed built-in form
  * `conv(substring(md5(cast(s AS BINARY)), 1, 15), 16, 10)` (which the
  * DuckDB oracle keeps, [[TextSql.hash60]]): 15 hex chars are exactly the
  * top 60 bits of the digest. The composed form materializes a 32-char hex
  * string, a substring copy, and a radix parse PER VALUE; this expression
  * digests the UTF8 bytes straight to a long. It runs per TOKEN in simhash
  * (docs x tokens rows), where those three allocations are the hot loop.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  protected override def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hash60", Hash60, Hash60.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$ref.hash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60 {
  private val digest =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val h = md.digest(s.getBytes)
    val top64 =
      ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
        ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
        ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    top64 >>> 4
  }

  def apply(s: Column): Column =
    ColumnBridge.column(Hash60(ColumnBridge.expression(s.cast("string"))))
}
