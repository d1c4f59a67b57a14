package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** TopKAgg's exactness claim, property-tested against an independent
  * model (distinct-pairs sort-take, written from the definition): bounded
  * merge-of-top-k must equal top-k of the union under ANY partitioning of
  * the input and ANY merge order — the property that makes the aggregate's
  * answer independent of cluster layout. Small value/id domains force the
  * tie and duplicate-pair cases the unit specs pin individually.
  */
object TopKAggProperties extends Properties("TopKAgg") {

  private val pairsGen: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      v <- Gen.choose(-5L, 5L) // small domain: ties guaranteed
      id <- Gen.choose(0L, 20L) // small domain: duplicate pairs likely
    } yield (v, id))

  private val kGen: Gen[Int] = Gen.choose(1, 7)

  /** The definition: distinct pairs, rank order (value DESC, id ASC), k. */
  private def model(pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    pairs.distinct.sortBy { case (v, id) => (-v, id) }.take(k)

  private def drain(b: TopKBuffer): Seq[(Long, Long)] =
    b.set.descendingIterator().asScala.map(p => (p(0), p(1))).toSeq

  /** Fold `pairs` through per-segment buffers split at `cuts`, then merge
    * the segment buffers left-to-right — the partial/final aggregation
    * shape with an arbitrary partitioning.
    */
  private def viaBuffers(pairs: Seq[(Long, Long)], k: Int,
      nSegs: Int): Seq[(Long, Long)] = {
    val segs =
      if (pairs.isEmpty) Seq(Seq.empty)
      else pairs.grouped(math.max(1, (pairs.size + nSegs - 1) / nSegs)).toSeq
    val bufs = segs.map { seg =>
      val b = new TopKBuffer(k)
      seg.foreach { case (v, id) => b.add(v, id) }
      b
    }
    val acc = new TopKBuffer(k)
    bufs.foreach(acc.mergeIn)
    drain(acc)
  }

  property("bounded merge equals sort-take under any partitioning") =
    forAll(pairsGen, kGen, Gen.choose(1, 6)) { (pairs, k, nSegs) =>
      viaBuffers(pairs, k, nSegs) == model(pairs, k)
    }

  property("merge order does not matter") =
    forAll(pairsGen, pairsGen, kGen) { (a, b, k) =>
      val left = { val x = new TopKBuffer(k); a.foreach(p => x.add(p._1, p._2)); x }
      val right = { val x = new TopKBuffer(k); b.foreach(p => x.add(p._1, p._2)); x }
      val lr = { val acc = new TopKBuffer(k); acc.mergeIn(left); acc.mergeIn(right); drain(acc) }
      val left2 = { val x = new TopKBuffer(k); a.foreach(p => x.add(p._1, p._2)); x }
      val right2 = { val x = new TopKBuffer(k); b.foreach(p => x.add(p._1, p._2)); x }
      val rl = { val acc = new TopKBuffer(k); acc.mergeIn(right2); acc.mergeIn(left2); drain(acc) }
      lr == rl && lr == model(a ++ b, k)
    }

  property("serialize round-trips the buffer") =
    forAll(pairsGen, kGen) { (pairs, k) =>
      val agg = TopKAgg(Literal(0L), Literal(0L), k)
      val b = new TopKBuffer(k)
      pairs.foreach { case (v, id) => b.add(v, id) }
      drain(agg.deserialize(agg.serialize(b))) == drain(b)
    }
}
