package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows share one hot key; dim is key -> attribute
  private def fact = (1 to 20000).map { i =>
    (if (i % 10 == 0) s"k${i % 50}" else "hot", i.toLong)
  }.toDF("k", "v")
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
}
