package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tree-rollup invariants on the driver corpus: per-level conservation,
  * prefix parentage, and leaf agreement with the flat topic domain.
  */
class TopicTreeSpec extends SparkSpec {

  private lazy val tree = MqttQueries.topicTree(spark, sf0001).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  private lazy val msgs = MqttQueries.messages(spark, sf0001)
    .select(col("topic")).collect().map(_.getString(0))

  test("every level conserves the message total") {
    val total = msgs.length.toLong
    tree.groupBy(_._1).foreach { case (level, rows) =>
      assert(rows.map(_._3).sum == total, s"level $level lost messages")
    }
  }

  test("the root holds every topic; leaves are 1:1 with distinct topics") {
    val distinctTopics = msgs.distinct.length.toLong
    val root = tree.filter(_._1 == 1L)
    assert(root.length == 1 && root.head._2 == "tele" &&
      root.head._4 == distinctTopics)
    val leaves = tree.filter(_._1 == 3L)
    assert(leaves.length == distinctTopics.toInt)
    assert(leaves.forall(_._4 == 1L))
  }

  test("every non-root prefix extends a prefix one level up") {
    val byLevel = tree.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (2L to 3L).foreach { level =>
      byLevel(level).foreach { p =>
        val parent = p.substring(0, p.lastIndexOf('/'))
        assert(byLevel(level - 1).contains(parent), s"orphan prefix $p")
      }
    }
  }
}
