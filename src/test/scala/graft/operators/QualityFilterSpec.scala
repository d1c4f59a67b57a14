package graft.operators

import graft.SparkSpec

/** The histogram-cutoff construction must equal the plain windowed
  * row_number spelling (which the oracle certifies on the corpus) — pinned
  * here against a driver-side reimplementation on corpora designed to hit
  * the boundary-tie branch hard.
  */
class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side model: row_number over (q desc, doc_id) per source. */
  private def model(rows: Seq[(Long, String, Double)]): Set[Long] =
    rows.groupBy(_._2).flatMap { case (_, docs) =>
      val admit = (docs.size * QualityFilter.KeepPct / 100).toInt
      docs.sortBy(d => (-d._3, d._1)).take(admit).map(_._1)
    }.toSet

  private def run(rows: Seq[(Long, String, Double)]): Set[Long] = {
    // feed pre-scored rows through the same construction by mapping the
    // quality expression over a synthetic text honoring only doc identity:
    // instead, exercise filter()'s internals via a frame with the scored
    // shape — the corpus path is certified by the driver oracle
    val df = rows.toDF("doc_id", "source", "q")
    QualityFilter.filterScored(df).select("doc_id").as[Long].collect().toSet
  }

  test("boundary ties are admitted by lowest doc_id, exactly filling the quota") {
    // one source, 10 docs, ALL the same quality: admit 3 => doc_ids 0,1,2
    val flat = (0L until 10L).map(d => (d, "s", 0.5))
    assert(run(flat) == Set(0L, 1L, 2L))
    // two tie groups straddling the cutoff: 4 at 0.9, 6 at 0.4, admit 3
    val straddle = (0L until 4L).map(d => (d, "s", 0.9)) ++
      (4L until 10L).map(d => (d, "s", 0.4))
    assert(run(straddle) == Set(0L, 1L, 2L))
  }

  test("random scored corpora agree with the model (12 seeded cases)") {
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 120L).map { d =>
        (d, s"src${rnd.nextInt(4)}", (rnd.nextInt(7) + 1) / 10.0)
      }
      assert(run(rows) == model(rows), s"seed $seed diverged")
    }
  }

  test("tiny sources below the quota floor keep nothing") {
    val rows = Seq((1L, "tiny", 0.9), (2L, "tiny", 0.8), (3L, "tiny", 0.7))
    assert(run(rows) == Set.empty[Long]) // 3 * 30 div 100 = 0
  }
}
