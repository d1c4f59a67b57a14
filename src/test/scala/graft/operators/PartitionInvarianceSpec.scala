package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Partition-count invariance for the round-10 operators: on a cluster the
  * same query runs at 32 or 3200 shuffle partitions depending on deployment,
  * and repartitioning the INPUT reshuffles which rows co-reside — results
  * must be bit-identical regardless (deterministic aggregation buffers,
  * total tie-break orders, no partial-order leakage). This is the cheap
  * local proxy for the 1000-executor property.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private def collectAt(parts: Int)(build: => DataFrame): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      build.collect().map(_.toString).toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def invariant(name: String)(build: Int => DataFrame): Unit = {
    val at1 = collectAt(1)(build(1))
    val at7 = collectAt(7)(build(7))
    assert(at1.nonEmpty, s"$name returned nothing — vacuous")
    assert(at1 == at7, s"$name differs between 1 and 7 shuffle partitions")
  }

  test("pipeline_clean_corpus is partition-invariant (min_by dedup, ordered output)") {
    invariant("pipeline_clean_corpus") { parts =>
      CleanCorpus.clean(
        graft.sources.Tables.documents(spark, sf0001).repartition(math.max(parts, 2)))
    }
  }

  test("ann_pq is partition-invariant (integer ADC totals, total rank order)") {
    invariant("ann_pq") { parts =>
      ProductQuantization.adcTopK(
        graft.sources.Tables.embeddings(spark, sf0001).repartition(math.max(parts, 2)))
    }
  }

  test("q_heavy_hitters is partition-invariant (count agg + total tie-break)") {
    invariant("q_heavy_hitters") { parts =>
      HeavyHitters.topKeys(
        graft.sources.Tables.orders(spark, sf0001).select("o_custkey")
          .repartition(math.max(parts, 2)), "o_custkey", 10)
    }
  }

  test("dedup_winnow is partition-invariant (fingerprint agg)") {
    invariant("dedup_winnow") { parts =>
      Winnow.sharedPassages(
        graft.sources.Tables.documents(spark, sf0001).repartition(math.max(parts, 2)))
        .orderBy(org.apache.spark.sql.functions.col("fp"))
    }
  }

  test("q_trailing_window is partition-invariant (RANGE frame over shuffled input)") {
    invariant("q_trailing_window") { parts =>
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        Relational.trailingHourActivity(spark, sf0001)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("ann_ivf_pq_res is partition-invariant (residual codes, per-list LUTs)") {
    invariant("ann_ivf_pq_res") { parts =>
      ProductQuantization.ivfPqResidualTopK(
        graft.sources.Tables.embeddings(spark, sf0001).repartition(math.max(parts, 2)))
    }
  }
}
