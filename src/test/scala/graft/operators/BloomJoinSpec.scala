package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 5000L).map(i => (i, s"row_$i")).toDF("fk", "payload")
  // dim keeps every 7th key, plus keys the fact side doesn't have at all
  private def dim = ((1L to 5000L).filter(_ % 7 == 0) ++ (9001L to 9100L))
    .map(k => (k, s"attr_$k")).toDF("dk", "attr")

  test("bloom semi-join is row-identical to the plain semi-join") {
    val plain = fact.join(dim, $"fk" === $"dk", "left_semi")
      .collect().map(_.toSeq).sortBy(_.toString)
    val bloomed = BloomJoin.semi(fact, dim, "fk", "dk")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(bloomed.length == plain.length && bloomed.sameElements(plain))
  }

  test("no false negatives by construction: every dim key passes its own filter") {
    // probe the dim keys through the bitmap built FROM them; the exact
    // verify join is an equality self-join here, so any row loss would mean
    // the build and probe sides disagreed on a bit position
    val out = BloomJoin.semi(dim.select($"dk".as("fk")), dim, "fk", "dk").count()
    assert(out == dim.count())
  }

  test("the bitmap is one row of bounded size, never dim-proportional") {
    val rows = BloomJoin.bitmap(dim, "dk").collect()
    assert(rows.length == 1)
    val words = rows(0).getMap[Int, Long](0)
    assert(words.size <= BloomJoin.Bits / 64)
    // and it genuinely filters: a disjoint probe set should mostly miss
    val miss = (100001L to 101000L).map(k => Tuple1(k)).toDF("fk")
    val passed = BloomJoin.semi(miss, dim, "fk", "dk").count()
    assert(passed == 0) // exact verify kills the ~1% bloom false positives
  }
}
