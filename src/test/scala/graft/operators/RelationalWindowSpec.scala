package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RANGE-frame semantics pinned: peers at the same ordering value are all
  * in each other's frame (unlike ROWS), and the 3600 s trailing boundary is
  * inclusive — the exact properties the oracle compare depends on.
  */
class RelationalWindowSpec extends SparkSpec {
  import spark.implicits._

  test("RANGE frame includes peers and the inclusive trailing boundary") {
    val rows = Seq(
      (1L, 10L, 0L, 1.0),     // epoch 0
      (1L, 11L, 0L, 2.0),     // peer of 10 — same second
      (1L, 12L, 3600L, 4.0),  // exactly 3600 s later: 0-second rows IN frame
      (1L, 13L, 3601L, 8.0))  // 3601: the epoch-0 rows age out
      .toDF("user_id", "event_id", "epoch_s", "value")
    val w = Window.partitionBy($"user_id").orderBy($"epoch_s").rangeBetween(-3600L, 0L)
    val got = rows.select($"event_id", count(lit(1)).over(w).as("n"),
        sum($"value").over(w).as("s"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (10L, 2L, 3.0),  // peers: both epoch-0 rows see each other
      (11L, 2L, 3.0),
      (12L, 3L, 7.0),  // inclusive boundary: 3600-0 <= 3600
      (13L, 2L, 12.0)))// 0-epoch rows out; 3600 still in (3601-3600 <= 3600)
  }
}
