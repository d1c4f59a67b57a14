package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single most recent
  * right row of the same key with `rightTs <= leftTs` (ties at equal
  * timestamps include the right row — "at or before").
  *
  * Spark has no as-of join operator; the naive encoding
  * `left.join(right, key && leftTs >= rightTs)` is a range theta-join that
  * Catalyst executes as a nested loop and then still needs a per-left-row
  * max — quadratic per key, the classic scale-killer. The scalable
  * re-expression used here (the standard union-merge form):
  *
  *   1. tag both sides and union them into one frame (no join at all),
  *   2. one window `partitionBy(key).orderBy(ts, side)` carries the last
  *      non-null right payload forward (`last(_, ignoreNulls)` over an
  *      unbounded-preceding frame — rank-based, codegen'd),
  *   3. keep the left rows.
  *
  * Cost: ONE hash shuffle of |left| + |right| rows on the key and a
  * partition-local sort — at 100 TB this is the same shape as any keyed
  * window, with no pair explosion. Right rows sort before left rows at equal
  * timestamps (side 0 < 1), giving inclusive at-or-before semantics, exactly
  * DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts` — which is
  * what the oracle uses, so the semantics are cross-checked engine-to-engine.
  *
  * Contract: the right side must be unique per (key, rightTs) — pre-aggregate
  * it otherwise (the order of equal-timestamp right rows inside the window is
  * not defined). Right payload columns that are genuinely NULL are carried
  * over by the previous non-null value (the standard last-ignoreNulls
  * limitation); left rows with no prior right row get NULLs (left-join
  * semantics).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => key.contains(c) || c == leftTs).toSeq
    val rightPayload = right.columns.filterNot(c => key.contains(c) || c == rightTs).toSeq
    val shared = leftPayload.intersect(rightPayload :+ rightTs) ++
      rightPayload.intersect(leftPayload :+ leftTs)
    require(shared.isEmpty,
      s"asOf: payload column names must be disjoint across sides " +
        s"(rename before joining): ${shared.distinct.mkString(", ")}")
    val lSel = key.map(col) ++
      Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
      leftPayload.map(col) ++
      Seq(lit(null).cast(right.schema(rightTs).dataType).as(rightTs)) ++
      rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val rSel = key.map(col) ++
      Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
      leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      Seq(col(rightTs)) ++
      rightPayload.map(col)
    val unioned = left.select(lSel: _*).unionAll(right.select(rSel: _*))
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same window spec for every carried column -> Catalyst plans ONE Window
    // node (one shuffle + one sort total)
    val carried = (rightTs +: rightPayload).foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(key.map(col) ++ Seq(col("__ts").as(leftTs)) ++ leftPayload.map(col) ++
        (rightTs +: rightPayload).map(col): _*)
  }
}
