package graft.operators

import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Decorrelation pins for [[Subqueries]]: the plan-level claim is that the
  * correlated scalar subqueries do NOT survive optimization as per-row
  * subquery execution — Catalyst rewrites them to one aggregate + join —
  * and the EXISTS/NOT EXISTS pair plans as semi/anti joins. Result-level,
  * the SQL spelling must equal an independently hand-written
  * aggregate-then-join DataFrame spelling.
  */
class SubqueriesSpec extends SparkSpec {

  private def subqueryCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect { case s: SubqueryExpression => s })
    }.flatten.size

  test("the Q17-shaped scalar subqueries decorrelate to aggregate + join") {
    val df = Subqueries.correlatedScalar(spark, sf0001)
    assert(subqueryCount(df) == 0,
      "correlated scalar subqueries survived optimization (per-row execution)")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"decorrelated plan contains a scale-killer join:\n$plan")
  }

  test("the correlated scalar result equals the hand-written aggregate + join") {
    val dir = sf0001
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"))
    val pk = graft.sources.Tables.part(spark, dir)
      .filter(col("p_brand") === Subqueries.Brand)
      .select(col("p_partkey").as("l_partkey"))
    val perPart = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("s"))
    val expected = li.join(broadcast(pk), Seq("l_partkey"))
      .join(perPart, Seq("l_partkey"))
      .filter(col("qty") * 5 * col("cnt") < col("s"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(count(lit(1)).as("n_below"), sum(col("qty")).as("sum_qty"))
      .orderBy("partkey")
      .collect().toSeq
    val got = Subqueries.correlatedScalar(spark, dir).collect().toSeq
    assert(got.nonEmpty, "Q17 query matched nothing — vacuous")
    assert(got == expected)
  }

  test("EXISTS / NOT EXISTS plan as semi and anti equi-joins") {
    val df = Subqueries.existsPair(spark, sf0001)
    assert(subqueryCount(df) == 0, "predicate subqueries survived optimization")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val rows = df.collect()
    assert(rows.nonEmpty, "EXISTS pair matched nothing — vacuous")
  }

  test("IN / NOT IN plan as semi and null-aware anti hash joins") {
    val df = Subqueries.inPair(spark, sf0001)
    assert(subqueryCount(df) == 0, "predicate subqueries survived optimization")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in:\n$plan")
    // the null-aware NOT IN must stay a HASH join — a nested-loop here is
    // the scale failure mode the operator scaladoc warns about
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"NOT IN degraded to a nested-loop join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty, "IN pair matched nothing — vacuous")
  }
}
