package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextSql => TS}
import graft.sources.Tables

/** Near-dup DELTA screen against a FROZEN MinHash band index — the recrawl
  * operation [[CorpusDiff.deltaDedup]]'s exact-hash membership join cannot
  * cover: a lightly-edited re-publication (mirror with a new banner,
  * syndicated copy with an inserted byline) hashes differently, so it slips
  * the exact delta screen, and catching it previously meant re-running
  * `dedup_minhash_lsh` over old ∪ new from scratch. This operator applies
  * the r18 incremental-index discipline (`emb_pq_codes_delta`: freeze the
  * artifact from the OLD snapshot, probe only the delta) to the minhash
  * band index:
  *
  *  1. FREEZE: the old snapshot's (doc_id, band_key) rows — the
  *     [[Dedup.minhashLsh]] banding spelling VERBATIM (same signatures,
  *     same band keys, same [[Dedup.MaxBucket]] skew cap, observed never
  *     silent) — persisted once per snapshot. The cap is an INDEX property
  *     (old-side bucket counts at freeze time), which is what makes every
  *     probe independent of every other probe — and therefore streamable
  *     ([[graft.streaming.StreamingDedupDelta]]).
  *  2. PROBE: delta documents compute their own band keys (one narrow
  *     projection) and equi-join the frozen index on band key. Per-probe
  *     candidates are bounded by Bands x MaxBucket regardless of corpus
  *     size; the old corpus never reshuffles.
  *  3. VERIFY: the certified exact-Jaccard stage ([[Dedup.jaccardOf]]) over
  *     the two cached shingle-set frames, threshold and rounding identical
  *     to `dedup_minhash_lsh`.
  *
  * Scale shape at 100 TB: the frozen index is band-key-bucketed on disk
  * (the [[graft.sources.StorageLayout]] layout a monthly recrawl would
  * maintain), the delta is ~1% of the corpus, so the monthly screen costs
  * O(delta x bands) join rows instead of the O(old + delta) full rebuild —
  * the same argument as the exact-hash delta screen, extended to near-dups.
  *
  * Equivalence contract (pinned in DedupDeltaSpec): on any corpus where no
  * band bucket crosses the cap, the probe screen emits EXACTLY the
  * old-vs-delta pairs of the full old ∪ delta `dedup_minhash_lsh` rebuild
  * (delta-delta pairs are the ordinary intra-snapshot screen's job, not the
  * delta screen's). Where a bucket DOES cross the cap the two can differ
  * only in that bucket — and its members are near-certain duplicate
  * clusters the exact/fingerprint screens own (the [[Dedup.minhashLsh]]
  * cap rationale); the freeze-time cap is certified at its exact edge in
  * the spec.
  */
object DedupDelta {

  /** Probe-family residues over [[CorpusDiff.MirrorMod]] (= 29): mirrors
    * (exact old content under NEGATED ids — the moved-URL case, jaccard
    * 1.0), token-edited twins (one token prepended, jaccard n/(n+1) — the
    * near-dup-ONLY regime the screen exists for, ids at the fuzzy family's
    * +2e6 offset through [[Dedup.probeId]]), and old-twin docs (byte-exact
    * copies INSIDE the old snapshot at +[[OldTwinOffset]], so the old
    * corpus has multi-doc clusters for `dedup_clusters_delta` to extend).
    */
  val MirrorResidue = 2L
  val TokenEditResidue = 5L
  val OldTwinResidue = 8L
  val TokenEditOffset: Long = DedupAttribution.TokenEditProbeOffset
  val OldTwinOffset = 5000000L

  /** The previous snapshot the index freezes from: [[CorpusDiff]]'s carve
    * plus byte-exact twins of the [[OldTwinResidue]] family — the twins
    * give the OLD pair graph real clusters, so the incremental keep-list
    * query is non-vacuous (and give mirror probes a multi-doc cluster to
    * attach to).
    */
  def oldAugmented(docs: DataFrame): DataFrame = {
    val base = CorpusDiff.oldSnapshot(docs)
    base.unionAll(base.filter(col("doc_id") % CorpusDiff.MirrorMod === OldTwinResidue)
      .select(Dedup.probeId(OldTwinOffset).as("doc_id"), col("text")))
  }

  /** The recrawl delta: the certified diff's added/changed documents (new
    * text), plus the probe families that make both verdict regimes
    * non-vacuous — raw corpus texts are unique, so without probes the
    * screen's oracle row could be a vacuous empty==empty.
    */
  def deltaDocs(docs: DataFrame): DataFrame = {
    val ob = CorpusDiff.oldSnapshot(docs)
    val ns = CorpusDiff.newSnapshot(docs)
    val deltaBase = CorpusDiff.diff(ob, ns)
      .filter(col("status").isin("added", "changed"))
      .select(col("doc_id"))
      .join(ns, Seq("doc_id"))
      .select(col("doc_id"), col("text"))
    deltaBase
      .unionAll(ob.filter(col("doc_id") % CorpusDiff.MirrorMod === MirrorResidue)
        .select((-col("doc_id")).as("doc_id"), col("text")))
      .unionAll(ob.filter(col("doc_id") % CorpusDiff.MirrorMod === TokenEditResidue)
        .select(Dedup.probeId(TokenEditOffset).as("doc_id"),
          concat(lit("zz "), col("text")).as("text")))
  }

  /** The frozen band index: (old_id, bk) rows, freeze-time bucket cap —
    * the artifact a deployment persists per snapshot. Exposed so the
    * streaming twin probes the IDENTICAL frame.
    */
  private[graft] def frozenIndex(oldSets: DataFrame,
      maxBucket: Int): DataFrame =
    Dedup.capGroups(
      Dedup.minhashSignatures(oldSets)
        .select(col("doc_id").as("old_id"),
          explode(Dedup.bandKeys(col("mh"))).as("bk")),
      "bk", maxBucket, "minhash_delta_caps", "dropped_band_rows")

  /** (doc_id, old_id, jaccard) for every delta document near-duplicating an
    * old document. Both set frames must be materialization-backed (the
    * [[Dedup.minhashSignatures]] contract).
    */
  def probePairs(oldSets: DataFrame, deltaSets: DataFrame,
      threshold: Double = 0.5,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    val frozen = frozenIndex(oldSets, maxBucket)
    val probes = Dedup.minhashSignatures(deltaSets)
      .select(col("doc_id"), explode(Dedup.bandKeys(col("mh"))).as("bk"))
    // self-exclusion: a CHANGED document's new text probing the index meets
    // its own superseded version (same doc_id) — "this doc changed" is the
    // diff's verdict already, not a near-dup finding
    val cand = probes.join(frozen, Seq("bk"))
      .filter(col("doc_id") =!= col("old_id"))
      .select(col("doc_id"), col("old_id")).distinct()
    cand
      .join(deltaSets.select(col("doc_id"), col("sh").as("__sha")), Seq("doc_id"))
      .join(oldSets.select(col("doc_id").as("old_id"), col("sh").as("__shb")),
        Seq("old_id"))
      .withColumn("common", size(array_intersect(col("__sha"), col("__shb"))))
      .withColumn("jaccard", Dedup.jaccardOf(col("__sha"), col("__shb"), col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("old_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Driver query: the delta screen over the carved snapshots. */
  def minhashDeltaDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val oldSets = Caching.cached(Dedup.hashedShingleSets(oldAugmented(docs)))
    val deltaSets = Caching.cached(Dedup.hashedShingleSets(deltaDocs(docs)))
    probePairs(oldSets, deltaSets).orderBy(col("doc_id"), col("old_id"))
  }

  /** Doubled-text probe family for the SIMHASH delta screen
    * ([[simhashDeltaDocuments]]): `text || ' ' || text` doubles every term
    * frequency, so every signature bit's majority margin exactly doubles
    * and NO sign flips — hamming to the source document is provably 0
    * (pinned in spec) while the byte content, the exact hash, and the
    * shingle set all differ. This is the signature property the simhash
    * screen certifies that the exact and minhash screens cannot: term-bag
    * similarity independent of arrangement or repetition. Residue and
    * id offset disjoint from every other probe family.
    */
  val DoubledResidue = 11L
  val DoubledTextOffset = 7000000L

  /** Simhash probe set: the SAME recrawl delta the minhash screen probes
    * ([[deltaDocs]] — mirrors and token-edit twins included), plus the
    * simhash-specific doubled-text family.
    */
  def simhashDeltaDocs(docs: DataFrame): DataFrame =
    deltaDocs(docs)
      .unionAll(CorpusDiff.oldSnapshot(docs)
        .filter(col("doc_id") % CorpusDiff.MirrorMod === DoubledResidue)
        .select(Dedup.probeId(DoubledTextOffset).as("doc_id"),
          concat(col("text"), lit(" "), col("text")).as("text")))

  /** Driver query: the near-dup delta screen on the SIMHASH index — the
    * [[minhashDeltaDocuments]] discipline applied to the second near-dup
    * family, completing the delta matrix (exact, minhash, semantic and
    * simhash screens all have frozen-index delta forms). The old
    * snapshot's banded 60-bit fingerprints ([[Dedup.simhashBanded]], the
    * intra-snapshot spelling verbatim) freeze with the bucket cap applied
    * at INDEX time; delta documents band their own signatures and
    * equi-join the frozen index (candidates bounded by bands x cap per
    * probe, the old corpus never reshuffles); hamming verification is one
    * xor + bit_count per surviving pair. Emits (doc_id, old_id, hamming)
    * for every delta document within [[Dedup.MaxHamming]] of an old one.
    */
  def simhashDeltaDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    simhashProbePairs(oldAugmented(docs), simhashDeltaDocs(docs))
      .orderBy(col("doc_id"), col("old_id"))
  }

  /** The frozen simhash artifact: banded old signatures with the bucket
    * cap applied at freeze time — exposed so the streaming twin probes
    * the IDENTICAL frame ([[graft.streaming.StreamingSimhashDelta]]).
    */
  private[graft] def simhashFrozenIndex(oldDocs: DataFrame,
      maxBucket: Int = Dedup.MaxBucket): DataFrame =
    Dedup.capGroups(
      Dedup.simhashBanded(Dedup.simhash(oldDocs))
        .select(col("doc_id").as("old_id"), col("simhash").as("old_sig"),
          col("bk")),
      "bk", maxBucket, "simhash_delta_caps", "dropped_band_rows")

  /** (doc_id, old_id, hamming) for every probe document within
    * `maxHamming` of an old document — the frozen-simhash-index probe,
    * exposed as a seam so the spec pins probe ≡ rebuild directly.
    */
  def simhashProbePairs(oldDocs: DataFrame, probeDocs: DataFrame,
      maxHamming: Int = Dedup.MaxHamming,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    val frozen = simhashFrozenIndex(oldDocs, maxBucket)
    Dedup.simhashBanded(Dedup.simhash(probeDocs))
      .join(frozen, Seq("bk"))
      // a CHANGED doc's new signature meets its own superseded version —
      // the diff already owns that verdict (the minhash-delta rationale)
      .filter(col("doc_id") =!= col("old_id"))
      .select(col("doc_id"), col("old_id"),
        bit_count(col("simhash").bitwiseXOR(col("old_sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Driver query: the near-dup delta screen on the WINNOW passage index —
    * the delta form of `dedup_winnow`: which delta documents SHARE A
    * PASSAGE (>= w+k-1 = 6 words, the winnowing guarantee, unaligned
    * overlaps included) with an old document. The syndication/quote-farm
    * recrawl case: a delta doc that embeds a paragraph of old content
    * hashes, minhashes and simhashes differently when the surrounding
    * text is new — the passage index is the screen that still fires.
    * Emits (doc_id, old_id, n_shared) — the shared-fingerprint count, the
    * overlap-mass signal a triage queue sorts on.
    */
  def winnowDeltaDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    winnowProbePairs(oldAugmented(docs), deltaDocs(docs))
      .orderBy(col("doc_id"), col("old_id"))
  }

  /** The frozen winnow artifact: (old_id, fp) fingerprint postings with
    * the per-fingerprint cap applied at freeze time (a ubiquitous
    * boilerplate passage collapses to one fp and would be quadratic under
    * the probe join — dropped with an observed count, never silently).
    */
  private[graft] def winnowFrozenIndex(oldDocs: DataFrame,
      maxBucket: Int = Dedup.MaxBucket): DataFrame =
    Dedup.capGroups(
      oldDocs.select(col("doc_id").as("old_id"),
        explode(graft.functions.WinnowFingerprints(col("text"),
          Winnow.ShingleK, Winnow.WindowW)).as("fp")),
      "fp", maxBucket, "winnow_delta_caps", "dropped_fp_rows")

  /** (doc_id, old_id, n_shared) for every probe document sharing >= 1
    * winnow fingerprint with an old document. Candidates are bounded by
    * fps-per-probe x freeze-time cap; the pair aggregation keys on the
    * (probe, old) pair with map-side combine — no pair list materializes
    * before the shuffle.
    */
  def winnowProbePairs(oldDocs: DataFrame, probeDocs: DataFrame,
      maxBucket: Int = Dedup.MaxBucket): DataFrame =
    probeDocs.select(col("doc_id"),
        explode(graft.functions.WinnowFingerprints(col("text"),
          Winnow.ShingleK, Winnow.WindowW)).as("fp"))
      .join(winnowFrozenIndex(oldDocs, maxBucket), Seq("fp"))
      // a CHANGED doc shares most passages with its own superseded
      // version — the diff owns that verdict (the delta-screen rationale)
      .filter(col("doc_id") =!= col("old_id"))
      .groupBy(col("doc_id"), col("old_id"))
      .agg(count(lit(1)).as("n_shared"))

  /** Driver query: incremental keep-list maintenance — the OLD snapshot's
    * cluster labels (components over the certified intra-old minhash
    * screen, which the old-twin probes make non-trivial) UNIONED with the
    * delta screen's new pairs, relabeled WITHOUT recomputing old-old pairs
    * — [[DedupClusters.incremental]]. The oracle recomputes components over
    * (old pairs ∪ delta pairs) from scratch, so the driver gate itself
    * certifies incremental ≡ rebuild on real data; the spec pins it on
    * adversarial graphs (merges, chains, singletons).
    */
  def clustersDeltaDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val oldSets = Caching.cached(Dedup.hashedShingleSets(oldAugmented(docs)))
    // intra-old pairs: the dedup_minhash_lsh spelling over the SAME cached
    // sets the frozen index reads (one corpus pass, two consumers)
    val oldPairs = Dedup.pairJaccard(
        Dedup.minhashCandidatePairs(oldSets, Dedup.MaxBucket,
          "clusters_delta_old_caps"), oldSets)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val oldLabels = DedupClusters.components(oldPairs)
    val deltaSets = Caching.cached(Dedup.hashedShingleSets(deltaDocs(docs)))
    val deltaPairs = probePairs(oldSets, deltaSets)
      .select(col("doc_id").as("doc_a"), col("old_id").as("doc_b"))
    DedupClusters.incremental(oldLabels, deltaPairs).orderBy(col("doc_id"))
  }
}

/** DuckDB oracle for [[DedupDelta]] — same carve, same probe families, same
  * signature/band/cap constants (via [[DedupSql]]'s shared spellings), same
  * jaccard arithmetic; string shingles stand in for the 60-bit hashes (the
  * certified equivalence of every shingle-family oracle).
  */
object DedupDeltaSql {
  import CorpusDiff.{AddedMod, RemovedMod, ChangedMod, MirrorMod}
  import Dedup.{ShingleN, MaxBucket}
  import DedupDelta._

  /** One signatures→bands chain under a CTE-name prefix, so the old and
    * delta chains coexist in one WITH clause (the shared
    * [[DedupSql.lshCandCtes]] has fixed names and can appear only once).
    */
  private def chainCtes(p: String, src: String, n: Int): String =
    s"""${p}_toks AS (
       |  SELECT doc_id, ${TS.tokens("text")} AS __t FROM $src
       |  WHERE ${TS.nTokens("text")} >= $n),
       |${p}_sets AS (
       |  SELECT doc_id, list_distinct(${TS.shingles("text", n)}) AS sh
       |  FROM ${p}_toks),
       |${p}_hashed AS (SELECT doc_id, sh,
       |  list_transform(sh, s -> ${TS.hash32("s")}) AS hs FROM ${p}_sets),
       |${p}_mh AS (SELECT doc_id, sh, ${DedupSql.minhashExprs} AS mh
       |  FROM ${p}_hashed),
       |${p}_banded AS (SELECT doc_id, unnest(${DedupSql.bandKeyExpr}) AS bk
       |  FROM ${p}_mh)""".stripMargin

  /** Fixture CTEs (old_base / old_docs / new_docs / delta_docs): the
    * snapshot carve + probe families — ONE spelling shared by the minhash
    * and simhash delta oracles.
    */
  private[operators] def fixtureCtes: String =
    s"""old_base AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % $ChangedMod = 0 THEN text || ' [stale]'
       |         ELSE text END AS text
       |  FROM documents WHERE doc_id % $AddedMod <> 0),
       |old_docs AS (
       |  SELECT doc_id, text FROM old_base
       |  UNION ALL
       |  SELECT doc_id + $OldTwinOffset, text FROM old_base
       |  WHERE doc_id % $MirrorMod = $OldTwinResidue),
       |new_docs AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % $RemovedMod <> 1),
       |delta_docs AS (
       |  SELECT n.doc_id, n.text
       |  FROM new_docs n LEFT JOIN old_base o ON n.doc_id = o.doc_id
       |  WHERE o.doc_id IS NULL OR md5(o.text) <> md5(n.text)
       |  UNION ALL
       |  SELECT -doc_id, text FROM old_base
       |  WHERE doc_id % $MirrorMod = $MirrorResidue
       |  UNION ALL
       |  SELECT doc_id + $TokenEditOffset, 'zz ' || text FROM old_base
       |  WHERE doc_id % $MirrorMod = $TokenEditResidue)""".stripMargin

  /** Fixture + frozen-index + probe + verify CTEs, ending at `dpairs`
    * (unthresholded delta-vs-old jaccard pairs) — shared by the screen
    * oracle and the incremental-clusters oracle.
    */
  private def deltaScreenCtes(n: Int = ShingleN,
      maxBucket: Int = MaxBucket): String =
    s"""$fixtureCtes,
       |${minhashScreenCtes("delta_docs", n, maxBucket)}""".stripMargin

  /** The minhash delta-screen CTE chain over probe relation `src`, ending
    * at `dpairs` (unthresholded delta-vs-old jaccard) — shared with the
    * cascade-attribution oracle ([[DeltaAttributionSql]]).
    */
  private[operators] def minhashScreenCtes(src: String, n: Int = ShingleN,
      maxBucket: Int = MaxBucket): String =
    s"""${chainCtes("o", "old_docs", n)},
       |${chainCtes("d", src, n)},
       |o_frozen AS (
       |  SELECT doc_id, bk FROM (
       |    SELECT doc_id, bk, count(*) OVER (PARTITION BY bk) AS bsz
       |    FROM o_banded)
       |  WHERE bsz <= $maxBucket),
       |d_cand AS (
       |  SELECT DISTINCT d.doc_id, o.doc_id AS old_id
       |  FROM d_banded d JOIN o_frozen o ON d.bk = o.bk
       |    AND d.doc_id <> o.doc_id),
       |o_inv AS (SELECT doc_id, unnest(sh) AS s FROM o_sets),
       |d_inv AS (SELECT doc_id, unnest(sh) AS s FROM d_sets),
       |o_sizes AS (SELECT doc_id, len(sh) AS sz FROM o_sets),
       |d_sizes AS (SELECT doc_id, len(sh) AS sz FROM d_sets),
       |d_common AS (
       |  SELECT c.doc_id, c.old_id, count(*) AS common
       |  FROM d_cand c
       |  JOIN d_inv a ON c.doc_id = a.doc_id
       |  JOIN o_inv b ON c.old_id = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2),
       |dpairs AS (
       |  SELECT c.doc_id, c.old_id,
       |    CAST(c.common AS DOUBLE) /
       |      CAST(sa.sz + sb.sz - c.common AS DOUBLE) AS jaccard
       |  FROM d_common c
       |  JOIN d_sizes sa ON c.doc_id = sa.doc_id
       |  JOIN o_sizes sb ON c.old_id = sb.doc_id)""".stripMargin

  /** Mirror of [[DedupDelta.simhashDeltaDocuments]] — same carve, same
    * probe families plus the doubled-text family, same signature/band/cap
    * spellings via [[DedupSql.simhashChain]]/[[DedupSql.simhashBandExpr]].
    */
  def simhashDeltaDocumentsSql(maxHamming: Int = Dedup.MaxHamming,
      maxBucket: Int = MaxBucket): String =
    s"""WITH $fixtureCtes,
       |sd_docs AS (
       |  SELECT doc_id, text FROM delta_docs
       |  UNION ALL
       |  SELECT doc_id + $DoubledTextOffset, text || ' ' || text FROM old_base
       |  WHERE doc_id % $MirrorMod = $DoubledResidue),
       |${simhashScreenCtes("sd_docs", maxBucket)}
       |SELECT doc_id, old_id, hamming FROM sd_pairs
       |WHERE hamming <= $maxHamming
       |ORDER BY doc_id, old_id""".stripMargin

  /** The simhash delta-screen CTE chain over probe relation `src`, ending
    * at `sd_pairs` (unthresholded hamming) — shared with the
    * cascade-attribution oracle ([[DeltaAttributionSql]]).
    */
  private[operators] def simhashScreenCtes(src: String,
      maxBucket: Int = MaxBucket): String =
    s"""${DedupSql.simhashChain("os_", "old_docs")},
       |${DedupSql.simhashChain("ds_", src)},
       |os_banded AS (
       |  SELECT doc_id, simhash, ${DedupSql.simhashBandExpr} AS bk
       |  FROM os_sigs),
       |ds_banded AS (
       |  SELECT doc_id, simhash, ${DedupSql.simhashBandExpr} AS bk
       |  FROM ds_sigs),
       |os_frozen AS (
       |  SELECT doc_id, simhash, bk FROM (
       |    SELECT doc_id, simhash, bk, count(*) OVER (PARTITION BY bk) AS bsz
       |    FROM os_banded)
       |  WHERE bsz <= $maxBucket),
       |sd_pairs AS (
       |  SELECT DISTINCT d.doc_id, o.doc_id AS old_id,
       |         bit_count(xor(d.simhash, o.simhash)) AS hamming
       |  FROM ds_banded d JOIN os_frozen o ON d.bk = o.bk
       |    AND d.doc_id <> o.doc_id)""".stripMargin

  /** Mirror of [[DedupDelta.winnowDeltaDocuments]] — same carve, same
    * fingerprint spelling via [[Winnow.winnowFpChainSql]], same
    * freeze-time cap semantics.
    */
  def winnowDeltaDocumentsSql(maxBucket: Int = MaxBucket): String =
    s"""WITH $fixtureCtes,
       |${winnowScreenCtes("delta_docs", maxBucket)}
       |SELECT d.doc_id, o.old_id, CAST(count(*) AS BIGINT) AS n_shared
       |FROM dw_x d JOIN ow_frozen o USING (fp)
       |WHERE d.doc_id <> o.old_id
       |GROUP BY 1, 2
       |ORDER BY doc_id, old_id""".stripMargin

  /** The winnow delta-screen CTE chain over probe relation `src`, ending
    * at `dw_x` / `ow_frozen` — shared with the cascade-attribution oracle
    * ([[DeltaAttributionSql]]).
    */
  private[operators] def winnowScreenCtes(src: String,
      maxBucket: Int = MaxBucket): String =
    s"""${Winnow.winnowFpChainSql("ow_", "old_docs")},
       |${Winnow.winnowFpChainSql("dw_", src)},
       |ow_x AS (SELECT doc_id AS old_id, unnest(fps) AS fp FROM ow_f),
       |dw_x AS (SELECT doc_id, unnest(fps) AS fp FROM dw_f),
       |ow_frozen AS (
       |  SELECT old_id, fp FROM (
       |    SELECT old_id, fp, count(*) OVER (PARTITION BY fp) AS bsz
       |    FROM ow_x)
       |  WHERE bsz <= $maxBucket)""".stripMargin

  def minhashDeltaDocumentsSql(threshold: Double = 0.5, n: Int = ShingleN,
      maxBucket: Int = MaxBucket): String =
    s"""WITH ${deltaScreenCtes(n, maxBucket)}
       |SELECT doc_id, old_id, round(jaccard, 6) AS jaccard
       |FROM dpairs WHERE jaccard >= $threshold
       |ORDER BY doc_id, old_id""".stripMargin

  /** Pairs CTE chain for [[DedupClustersSql.componentsSql]]: the intra-old
    * screen (the `dedup_minhash_lsh` oracle spelling over `old_docs`,
    * candidates from the SAME frozen/bounded index) unioned with the delta
    * screen's pairs. The oracle labels this union FROM SCRATCH while the
    * Spark side relabels incrementally from the old labels — the gate
    * itself is the incremental ≡ rebuild certificate.
    */
  def clustersDeltaPairsCte(threshold: Double = 0.5, n: Int = ShingleN,
      maxBucket: Int = MaxBucket): String =
    s"""${deltaScreenCtes(n, maxBucket)},
       |o_cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM o_frozen a JOIN o_frozen b ON a.bk = b.bk
       |    AND a.doc_id < b.doc_id),
       |o_common AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS common
       |  FROM o_cand c
       |  JOIN o_inv a ON c.doc_a = a.doc_id
       |  JOIN o_inv b ON c.doc_b = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2),
       |o_pairs AS (
       |  SELECT c.doc_a, c.doc_b
       |  FROM o_common c
       |  JOIN o_sizes sa ON c.doc_a = sa.doc_id
       |  JOIN o_sizes sb ON c.doc_b = sb.doc_id
       |  WHERE CAST(c.common AS DOUBLE) /
       |    CAST(sa.sz + sb.sz - c.common AS DOUBLE) >= $threshold),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM o_pairs
       |  UNION ALL
       |  SELECT doc_id AS doc_a, old_id AS doc_b FROM dpairs
       |  WHERE jaccard >= $threshold)""".stripMargin

  def clustersDeltaDocumentsSql: String =
    DedupClustersSql.componentsSql(clustersDeltaPairsCte())
}
