package graft.operators

import graft.SparkSpec

/** Curriculum-schedule semantics: band boundaries, the open-ended last
  * band, contiguous positions, and band monotonicity along the schedule.
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, n: Int): (Long, String) =
    (id, (1 to n).map(i => s"w$i").mkString(" "))

  test("band boundaries: 63 -> band 0, 64 -> band 1, >=448 caps at 7") {
    val docs = Seq(doc(1, 63), doc(2, 64), doc(3, 448), doc(4, 1000))
      .toDF("doc_id", "text")
    val got = Curriculum.schedule(docs)
      .select($"doc_id", $"band").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 7L, 4L -> 7L))
  }

  test("positions are contiguous 1..N and bands never decrease along them") {
    val sched = Curriculum.scheduleDocuments(spark, sf0001)
      .select($"pos", $"band").as[(Long, Long)].collect().sortBy(_._1)
    assert(sched.nonEmpty)
    assert(sched.map(_._1).toSeq == (1L to sched.length.toLong))
    assert(sched.map(_._2).toSeq == sched.map(_._2).sorted.toSeq)
    // non-vacuous: the corpus spans more than one band
    assert(sched.map(_._2).distinct.length > 1)
  }
}
