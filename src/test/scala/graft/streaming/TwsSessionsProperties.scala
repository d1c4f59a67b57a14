package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** TwsSessions.merge's exactness claims, property-tested against an
  * independent model (sort-points-and-split-at-gap, written from the
  * definition): the incremental fold must equal the whole-input
  * sessionization under ANY batching of the events and ANY within-batch
  * order — the unit-level form of the incremental-equals-batch certificate
  * the oracle proves end-to-end. A small time domain forces the exact-gap
  * boundary and duplicate-timestamp cases.
  */
object TwsSessionsProperties extends Properties("TwsSessions.merge") {

  private val gap = 10L

  private val eventsGen: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 120L))

  /** The definition: sort all points; a strictly-less-than-gap successor
    * joins the open run, otherwise a new run starts. One session per run:
    * (min, max, count).
    */
  private def model(events: Seq[Long]): Seq[OpenSession] = {
    if (events.isEmpty) return Seq.empty
    val sorted = events.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    var start = sorted.head; var last = sorted.head; var n = 1L
    sorted.tail.foreach { t =>
      if (t < last + gap) { last = t; n += 1 }
      else { out += OpenSession(start, last, n); start = t; last = t; n = 1 }
    }
    out += OpenSession(start, last, n)
    out.toSeq
  }

  property("single merge equals the model") = forAll(eventsGen) { events =>
    TwsSessions.merge(Nil, events, gap) == model(events)
  }

  property("batch-split invariance: folding any batching through state " +
      "equals one merge of everything") =
    forAll(eventsGen, Gen.choose(1, 6)) { (events, nBatches) =>
      val batches =
        if (events.isEmpty) Seq(Seq.empty[Long])
        else events.grouped(math.max(1, events.length / nBatches)).toSeq
      val folded = batches.foldLeft(Seq.empty[OpenSession])(
        (st, b) => TwsSessions.merge(st, b, gap))
      folded == TwsSessions.merge(Nil, events, gap)
    }

  property("within-batch order insensitivity") =
    forAll(eventsGen, Gen.long) { (events, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(events)
      TwsSessions.merge(Nil, shuffled, gap) ==
        TwsSessions.merge(Nil, events, gap)
    }

  property("events conserve: session counts sum to the input size") =
    forAll(eventsGen) { events =>
      TwsSessions.merge(Nil, events, gap).map(_.n).sum == events.length.toLong
    }
}
