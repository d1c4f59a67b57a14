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

/** Input-LAYOUT invariance for the round-14 composites: the manifest /
  * sample / permutation claims are content-addressed ("deterministic for
  * the same corpus"), but the driver certifies them only on its fixed
  * parquet layout. These re-run each composite on a repartitioned AND
  * key-clustered (co-residence-scrambled) input at a different shuffle
  * partition count, and assert byte-identical output — the claim's actual
  * content: at 1000 executors the input layout is whatever the upstream
  * job left behind.
  */
class LayoutInvarianceSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  /** Three adversarial relayouts of the same rows: round-robin, clustered
    * by a content key, and single-partition.
    */
  private def layouts = {
    val d = docs
    Seq(d.repartition(7), d.repartition(5, col("text")), d.coalesce(1))
  }

  private def assertInvariant(name: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    val base = build(docs).collect().map(_.toString).toSeq
    assert(base.nonEmpty, s"$name returned nothing — vacuous")
    layouts.zipWithIndex.foreach { case (in, i) =>
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", if (i == 1) "3" else prev)
        val got = build(in).collect().map(_.toString).toSeq
        assert(got == base, s"$name output depends on input layout (layout $i)")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("pipeline_assemble emits a byte-identical manifest on any input layout") {
    assertInvariant("pipeline_assemble")(Assemble.assemble)
  }

  test("pipeline_global_shuffle assigns identical positions on any input layout") {
    assertInvariant("pipeline_global_shuffle") { d =>
      GlobalShuffle.shuffled(d.select(col("doc_id"))).orderBy(col("pos"))
    }
  }

  test("pipeline_weighted_sample picks identical winners on any input layout") {
    assertInvariant("pipeline_weighted_sample")(d => WeightedSample.sample(d))
  }


  test("pipeline_curate emits a byte-identical kept set on any input layout") {
    assertInvariant("pipeline_curate")(d =>
      Curate.curate(d).orderBy(org.apache.spark.sql.functions.col("doc_id")))
  }

  test("pipeline_temperature_sample keeps identical docs on any input layout") {
    assertInvariant("pipeline_temperature_sample")(d =>
      Mixture.temperatureRebalance(d))
  }

  test("pipeline_quality_filter keeps identical docs on any input layout") {
    assertInvariant("pipeline_quality_filter") { d =>
      QualityFilter.filter(d).orderBy(org.apache.spark.sql.functions.col("doc_id"))
    }
  }

  test("pipeline_stratified_split assigns identically on any input layout") {
    assertInvariant("pipeline_stratified_split") { d =>
      StratifiedSplit.split(d).orderBy(org.apache.spark.sql.functions.col("doc_id"))
    }
  }

  test("pipeline_budget_sample keeps identical docs on any input layout") {
    assertInvariant("pipeline_budget_sample") { d =>
      BudgetSample.sample(d).orderBy(org.apache.spark.sql.functions.col("doc_id"))
    }
  }

  test("pipeline_curriculum assigns identical positions on any input layout") {
    assertInvariant("pipeline_curriculum")(d =>
      Curriculum.schedule(d).orderBy(col("pos")))
  }

  test("pipeline_shard_manifest packs identically on any input layout") {
    assertInvariant("pipeline_shard_manifest")(ShardManifest.manifest)
  }

  test("pipeline_interleave schedules identically on any input layout") {
    assertInvariant("pipeline_interleave")(Interleave.order)
  }

  test("pipeline_oversample replicates identically on any input layout") {
    assertInvariant("pipeline_oversample")(Oversample.manifest)
  }
}
