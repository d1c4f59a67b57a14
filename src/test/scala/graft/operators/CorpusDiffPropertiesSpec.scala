package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Seeded-random model check for the snapshot diff: an INDEPENDENT
  * plain-Scala map diff run against random snapshot pairs with nulls,
  * overlaps, and disjoint ids — the CleanCorpusPropertiesSpec pattern.
  * Any divergence in presence detection or the null-safe hash compare
  * fails on inputs nobody hand-picked.
  */
class CorpusDiffPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** The definition, straight off the spec: presence first, then content. */
  private def model(old: Map[Long, Option[String]],
      neu: Map[Long, Option[String]]): Map[Long, String] =
    (old.keySet ++ neu.keySet).map { id =>
      id -> ((old.get(id), neu.get(id)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) => if (a == b) "unchanged" else "changed"
        case (None, None) => sys.error("unreachable")
      })
    }.toMap

  private def snapshot(rnd: Random, ids: Seq[Long]): Map[Long, Option[String]] =
    ids.map { id =>
      id -> (if (rnd.nextInt(10) == 0) None // null text
             else Some(s"t${rnd.nextInt(4)}")) // tiny domain: changes likely
    }.toMap

  test("random snapshot pairs agree with the model (20 seeded cases)") {
    (1 to 20).foreach { seed =>
      val rnd = new Random(seed)
      val universe = 0L until (5 + rnd.nextInt(40)).toLong
      val oldIds = universe.filter(_ => rnd.nextInt(4) > 0)
      val newIds = universe.filter(_ => rnd.nextInt(4) > 0)
      val old = snapshot(rnd, oldIds)
      val neu = snapshot(rnd, newIds)
      val got = CorpusDiff.diff(
        old.toSeq.map { case (id, t) => (id, t.orNull) }.toDF("doc_id", "text"),
        neu.toSeq.map { case (id, t) => (id, t.orNull) }.toDF("doc_id", "text"))
        .as[(Long, String)].collect().toMap
      assert(got == model(old, neu), s"seed=$seed")
    }
  }
}
