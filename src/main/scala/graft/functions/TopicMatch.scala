package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** MQTT topic-filter matching (`+` = exactly one level, `#` = any suffix),
  * the broker-side subscription filter of the reference
  * (/root/reference/mqtt2sql.py:753-760; patterns like `topic2/+/sub/#` in
  * mqtt2sql.conf:33).
  *
  * Implemented as a native Catalyst expression rather than a Scala UDF so the
  * filter stays inside whole-stage codegen: for a literal pattern (the common
  * case — subscriptions are configuration) the MQTT filter is compiled to a
  * `java.util.regex.Pattern` ONCE and referenced from generated code; a UDF
  * would box every row and break the codegen span.
  *
  * Spec (OASIS MQTT 3.1.1 §4.7): levels split on '/'; `+` matches exactly one
  * level; `#` must be the last level and matches the remaining levels
  * (including zero, i.e. `a/#` matches `a`).
  */
case class MqttTopicMatches(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "mqtt_topic_matches"

  @transient private lazy val staticPattern: Option[Pattern] = right match {
    case e if e.foldable =>
      Option(e.eval(null)).map(p => MqttTopicMatches.compile(p.toString))
    case _ => None
  }

  override def nullSafeEval(topic: Any, pattern: Any): Any = {
    val p = staticPattern.getOrElse(MqttTopicMatches.compile(pattern.toString))
    p.matcher(topic.toString).matches()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    staticPattern match {
      case Some(p) =>
        // literal filter: compile once, reference from generated code
        val patternRef = ctx.addReferenceObj("mqttPattern", p, classOf[Pattern].getName)
        nullSafeCodeGen(ctx, ev, (topic, _) =>
          s"${ev.value} = $patternRef.matcher($topic.toString()).matches();")
      case None =>
        val cls = MqttTopicMatches.getClass.getName.stripSuffix("$")
        nullSafeCodeGen(ctx, ev, (topic, pattern) =>
          s"${ev.value} = $cls.matches($topic.toString(), $pattern.toString());")
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MqttTopicMatches {
  /** MQTT filter -> anchored regex: `+` -> `[^/]+`, trailing `/#` -> `(/.*)?`,
    * bare `#` -> `.*`, everything else quoted literally.
    */
  def compile(filter: String): Pattern = {
    val levels = filter.split("/", -1)
    val hasHash = levels.nonEmpty && levels.last == "#"
    val body = (if (hasHash) levels.dropRight(1) else levels)
      .map { case "+" => "[^/]+"; case lit => Pattern.quote(lit) }
      .mkString("/")
    val re =
      if (hasHash && body.isEmpty) ".*"        // bare "#": everything
      else if (hasHash) body + "(/.*)?"        // "a/#" matches "a" AND "a/b/c"
      else body
    Pattern.compile("^" + re + "$")
  }

  /** Entry point referenced from generated code for non-literal patterns. */
  def matches(topic: String, filter: String): Boolean =
    compile(filter).matcher(topic).matches()

  /** Column-level API: `topic matches filter` as a codegen'd predicate. */
  def apply(topic: Column, filter: String): Column = {
    import org.apache.spark.sql.functions.lit
    ColumnBridge.column(MqttTopicMatches(
      ColumnBridge.expression(topic), ColumnBridge.expression(lit(filter))))
  }
}
