package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows share one hot key; dim is key -> attribute
  private def fact = (1 to 20000).map { i =>
    (if (i % 10 == 0) s"k${i % 50}" else "hot", i.toLong)
  }.toDF("k", "v")
  // the worst case the operator's scaladoc names: every hot row is
  // BYTE-IDENTICAL (same key, same payload), plus a unique ordinal column
  // a real source would carry (msg_id / o_orderkey)
  private def factIdentical = (1 to 20000).map { i =>
    (if (i % 10 == 0) s"k${i % 50}" else "hot",
      if (i % 10 == 0) i.toLong else 0L, i.toLong)
  }.toDF("k", "v", "ordinal")
  private def dim = (("hot" +: (0 until 50).map(i => s"k$i")))
    .map(k => (k, s"attr_$k")).toDF("k", "attr")

  test("salted join is bag-identical to the plain join") {
    val plain = fact.join(dim, Seq("k"), "inner")
      .select($"k", $"v", $"attr").collect().map(_.toSeq).sortBy(_.toString)
    val salted = SaltedJoin.inner(fact, dim, "k", salts = 8)
      .select($"k", $"v", $"attr").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length && salted.sameElements(plain))
  }

  test("the hot key spreads across tasks instead of one straggler partition") {
    // AQE's small-data coalescing would fold everything into one partition
    // at test scale and mask the comparison; at real scale the hot partition
    // is precisely the one AQE cannot coalesce away
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      // force the shuffle join (a broadcast would hide the skew entirely)
      val plainParts = fact.join(dim.hint("merge"), Seq("k"), "inner")
        .filter($"k" === "hot").select(spark_partition_id()).distinct().count()
      val saltedParts = SaltedJoin.inner(fact, dim.hint("merge"), "k", salts = 8)
        .filter($"k" === "hot").select(spark_partition_id()).distinct().count()
      assert(plainParts == 1L) // the problem: one task owns the hot key
      assert(saltedParts > 1L) // the fix: fan-out over salts
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("byte-identical hot rows fan out under a saltOn ordinal, and provably do NOT under the content-hash fallback") {
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      def hotParts(f: org.apache.spark.sql.DataFrame,
          saltOn: Seq[org.apache.spark.sql.Column]): Long =
        SaltedJoin.inner(f, dim.hint("merge"), "k", salts = 8, saltOn)
          .filter($"k" === "hot").select(spark_partition_id()).distinct().count()
      // without a disambiguator, every BYTE-IDENTICAL hot row (ordinal
      // projected away — the source that doesn't carry one) content-hashes
      // to ONE salt — the documented limitation: still a single straggler
      assert(hotParts(factIdentical.drop("ordinal"), Nil) == 1L,
        "content-hash fallback unexpectedly spread identical rows")
      // with the source ordinal mixed in, the same rows fan out
      assert(hotParts(factIdentical, Seq($"ordinal")) > 1L,
        "saltOn ordinal failed to fan out identical hot rows")
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("AQE splits the skewed partition at runtime — the first-line remedy the scaladoc defers to") {
    // the scaladoc's remedy order is broadcast > AQE skew-join > explicit
    // salt; this pins that the middle option actually engages on our skew
    // shape, so the explicit salt stays reserved for the cases AQE can't
    // reach (hash-join-required pipelines, known-extreme keys)
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // pad the payload so the hot partition clears the (lowered) byte bar
      val padded = fact.withColumn("pad", concat_ws("", typedLit(Seq.fill(8)("x"))))
      val joined = padded.join(dim.hint("merge"), Seq("k"), "inner")
      // execute through THIS Dataset's QueryExecution (collect does; count/
      // foreach/write spawn their own): AQE only finalizes — and marks
      // skew — on the executed instance, not on a fresh plan
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the skew join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltOn salting preserves multiplicities of identical rows exactly") {
    val plain = factIdentical.join(dim, Seq("k"), "inner")
      .groupBy($"k", $"v").agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SaltedJoin.inner(factIdentical, dim, "k", salts = 8,
        saltOn = Seq($"ordinal"))
      .groupBy($"k", $"v").agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length && salted.sameElements(plain))
  }
}
