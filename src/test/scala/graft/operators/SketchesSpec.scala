package graft.operators

import graft.SparkSpec

/** Linear-counting distinct sketch: accuracy, determinism, saturation. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (String, Long)*) = rows.toDF("grp", "v")

  test("estimate lands within a few percent of the true cardinality at low load") {
    val rows = for (g <- Seq("a", "b"); v <- 0L until 120L) yield (g, v * 7 + g.hashCode)
    val got = Sketches.approxDistinct(frame(rows: _*), "v", "grp")
      .select($"grp", $"est_distinct").as[(String, Double)].collect().toMap
    // n/m ~ 0.12 -> standard error ~1%; allow 10%
    assert(math.abs(got("a") - 120.0) / 120.0 < 0.10, got)
    assert(math.abs(got("b") - 120.0) / 120.0 < 0.10, got)
  }

  test("duplicates do not move the sketch: multiplicity-insensitive like countDistinct") {
    val once = (0L until 200L).map(v => ("g", v))
    val tripled = once ++ once ++ once
    val a = Sketches.approxDistinct(frame(once: _*), "v", "grp")
      .select($"n_buckets_hit").as[Long].head()
    val b = Sketches.approxDistinct(frame(tripled: _*), "v", "grp")
      .select($"n_buckets_hit").as[Long].head()
    assert(a == b)
  }

  test("a saturated sketch reports null, not a fabricated estimate") {
    // more values than buckets with distinct hashes should eventually hit
    // every bucket; 60k >> m*ln(m) coupon-collector bound for m=1024
    val rows = (0L until 60000L).map(v => ("g", v))
    val got = Sketches.approxDistinct(frame(rows: _*), "v", "grp")
      .select($"n_buckets_hit", $"est_distinct".isNull).as[(Long, Boolean)].head()
    assert(got._1 == Sketches.LinearCountBuckets)
    assert(got._2)
  }

  test("histogram quantiles land within one bin width of the exact percentile") {
    // values 0.0, 0.1, ..., 99.9 in one group: exact p50 = 49.95
    val rows = (0 until 1000).map(i => ("g", i / 10.0))
    val got = Sketches.approxQuantiles(rows.toDF("grp", "v"), "v", "grp")
      .select($"p50_est", $"p90_est", $"p99_est").as[(Double, Double, Double)].head()
    assert(math.abs(got._1 - 49.95) <= Sketches.QuantileBinWidth, got)
    assert(math.abs(got._2 - 89.95) <= Sketches.QuantileBinWidth, got)
    assert(math.abs(got._3 - 98.95) <= Sketches.QuantileBinWidth, got)
  }

  test("quantile sketch groups are independent and n_rows is the group size") {
    val rows = (0 until 100).map(i => ("a", i.toDouble)) ++
      (0 until 10).map(i => ("b", 1000.0 + i))
    val byGrp = Sketches.approxQuantiles(rows.toDF("grp", "v"), "v", "grp")
      .select($"grp", $"n_rows", $"p50_est").as[(String, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byGrp("a")._1 == 100L && byGrp("b")._1 == 10L)
    // group b's small values sit far from group a's: no cross-group bleed
    assert(byGrp("b")._2 >= 1000.0, byGrp)
  }

  test("quantile shuffle is bin-sized: partial aggregation on (group, bin) before exchange") {
    val plan = Sketches.approxQuantiles(Seq(("g", 1.0)).toDF("grp", "v"), "v", "grp")
      .queryExecution.executedPlan.toString
    val firstAgg = plan.linesIterator.toSeq.reverse
      .find(l => l.contains("HashAggregate") && l.contains("__bin"))
    assert(firstAgg.isDefined, plan)
  }

  test("shuffle carries buckets, not values: the aggregate keys are (group, bucket)") {
    val plan = Sketches.approxDistinct(frame(("g", 1L)), "v", "grp")
      .queryExecution.executedPlan.toString
    // partial aggregation on the bucket happens before any exchange
    val firstAgg = plan.linesIterator.toSeq.reverse
      .find(l => l.contains("HashAggregate") && l.contains("__bucket"))
    assert(firstAgg.isDefined, plan)
  }
}
