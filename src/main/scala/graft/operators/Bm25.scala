package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Lexical retrieval serve over the corpus posting index: BM25 top-k
  * (Lucene-style "more-like-this") and hybrid lexical+vector fusion via
  * reciprocal-rank fusion — the two retrieval shapes a RAG/training-data
  * pipeline runs beside the embedding ANN families ([[Similarity]]).
  *
  * Design, Spark-first:
  *  - The corpus explodes ONCE into the (doc_id, term, tf) posting frame —
  *    the same inverted-index discipline as [[TextAnalysis.tfidfTopTerms]];
  *    document frequency, document length, and the corpus-level (N,
  *    total_len) statistics all derive from that already-aggregated frame,
  *    so no second explode and no extra corpus scan. At 100 TB the posting
  *    frame IS the persisted index artifact (term-bucketed on disk, the
  *    [[graft.sources.StorageLayout]] layout); the in-query build prices
  *    index construction the way `ann_ivf_pq_rerank` prices codebook
  *    training — build and serve in one certified query.
  *  - Query-term selection is Lucene MoreLikeThis: each query document
  *    keeps only its [[QueryTerms]] most distinctive terms by the CERTIFIED
  *    tf-idf spelling ([[TextAnalysis.tfidfTopTerms]]'s smoothed idf,
  *    rounded before ranking so near-tie float ordering cannot diverge) —
  *    the knob that bounds serve cost to nq x QueryTerms posting lists
  *    instead of nq full documents. The selected terms (with their df,
  *    already joined) are a <= nq x QueryTerms row frame, broadcast into
  *    the posting join: the corpus index never reshuffles, candidates are
  *    posting-union-sized, never corpus x nq.
  *  - Scoring is integral end-to-end past one double expression: each
  *    (query, term, doc) BM25 contribution — idf = ln(1 + (N - df + 0.5) /
  *    (df + 0.5)), tf saturation k1 = 1.2 / length normalization b = 0.75,
  *    avgdl spelled as the exact integer ratio len x N / total_len — is
  *    floored to BIGINT micro-nats ([[BigramSurprisal]]'s discipline: the
  *    1-ulp ln residual is the accepted trade), so the per-candidate sum is
  *    an INTEGER sum — associative, order-independent, identical in both
  *    engines regardless of partial-aggregation order.
  *  - The per-query top-k is a windowed row_number over
  *    (score_unats desc, doc_id) — a total order, ties cannot reorder
  *    across engines. Self-matches are excluded, mirroring
  *    [[Similarity.bruteForceTopK]], so the two serve families' lists fuse
  *    1:1 in [[hybridRrf]].
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Query documents: doc_id < QueryCount — the same ids (and the same
    * entities: the driver's documents and embeddings tables share the
    * 0..N-1 id space) as the ANN families' vec_id < 8 query set, so hybrid
    * fusion is a per-id join, not an alignment guess.
    */
  val QueryCount = 8L

  /** Distinctive terms kept per query document (the MoreLikeThis serve-cost
    * bound). 16 terms over the synthetic vocabulary keeps every query's
    * candidate set well-populated at all test scales while bounding the
    * posting join; at 100 TB this is the knob that decides how many posting
    * lists a query fans out to.
    */
  val QueryTerms = 16

  val TopK = 5

  /** The standard RRF constant (Cormack et al. 2009). */
  val RrfK = 60

  /** Per-system candidate-list depth fused by [[hybridRrf]] — deeper than
    * the served top-k so a document ranked 12th by both systems can outrank
    * one ranked 3rd by a single system (the case fusion exists for).
    */
  val FusionDepth = 20

  /** The (doc_id, term, tf) posting frame — the ONE corpus explode, term
    * frequencies combined map-side before the (doc_id, term) shuffle.
    * Empty-string tokens (blank documents) are dropped, matching
    * [[TextAnalysis.vocabTopK]]; corpus statistics below therefore count
    * exactly the documents that can match at all.
    */
  private[graft] def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** MoreLikeThis term selection over the posting frame: the certified
    * tfidf spelling (smoothed idf, ROUNDED before ranking) over the query
    * docs only; df rides along so the probe frame carries everything
    * term-level. Returns (query_id, term, df) — <= nq x [[QueryTerms]]
    * rows, the "query plan" a serving tier computes before touching the
    * index (the seam [[graft.streaming.StreamingBm25]] stages).
    */
  private[graft] def queryTerms(tf: DataFrame, nFrame: DataFrame): DataFrame = {
    // df only for the query docs' own terms: one broadcast semi-restriction
    // of the posting frame instead of a full-vocabulary aggregation — df
    // VALUES are identical (each term's count still ranges over the whole
    // corpus), the work is query-sized, not vocabulary-sized
    val qtf = tf.filter(col("doc_id") < QueryCount)
    queryTermsFrom(qtf,
      restrictedDf(tf, qtf.select(col("term")).distinct()), nFrame)
  }

  /** df(term) restricted to `termSet` — the query-sized posting-stat read
    * (broadcast semi-restriction, never a vocabulary-sized aggregation).
    * Shared by the full build and the delta refresh so the df spelling
    * cannot drift between them.
    */
  private[graft] def restrictedDf(tf: DataFrame, termSet: DataFrame): DataFrame =
    tf.join(broadcast(termSet), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** The MoreLikeThis selection tail from pre-built inputs — the ONE
    * selection spelling, shared by [[queryTerms]] (full-index df) and
    * [[bm25DeltaTopK]] (frozen df + delta increments): identical rounded
    * sel_score, identical (sel_score desc, term) tie order.
    */
  private[graft] def queryTermsFrom(qtf: DataFrame, dfFrame: DataFrame,
      nFrame: DataFrame): DataFrame = {
    val selW = Window.partitionBy(col("doc_id"))
      .orderBy(col("sel_score").desc, col("term"))
    qtf
      .join(dfFrame, Seq("term"))
      .crossJoin(broadcast(nFrame))
      .withColumn("sel_score",
        round(col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      .withColumn("__r", row_number().over(selW))
      .filter(col("__r") <= QueryTerms)
      .select(col("doc_id").as("query_id"), col("term"), col("df"))
  }

  /** The per-(query, term, doc) BM25 contribution in floored micro-nats —
    * ONE spelling over input columns (tf, df, len, n, total_len), shared
    * by the batch serve and the streaming twin.
    */
  private[graft] def contribUnats: Column = {
    val idf = log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val sat = col("tf") * (K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0) - B + lit(B) * col("len") * col("n") / col("total_len")))
    floor(idf * sat * 1e6)
  }

  /** The serve tail: self-exclusion, per-query top-k over the INTEGER
    * score (total order, ties on doc_id), final projection — shared by
    * batch and streaming forms so the contract cannot drift. `scored`
    * carries (query_id, doc_id, score_unats, n_terms).
    */
  private[graft] def rankTail(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_unats").desc, col("doc_id"))
    scored
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("n_terms"), col("score_unats"))
  }

  /** Top-k BM25 retrieval for the [[QueryCount]] query documents.
    * Returns (query_id, rank, doc_id, n_terms, score_unats) — the score in
    * floored micro-nats, n_terms the matched-term count (the WAND-style
    * candidate-quality signal).
    */
  def bm25TopK(docs: DataFrame, k: Int = TopK): DataFrame = {
    // one cached pass over the corpus feeds df / doclen / stats / probe —
    // plan reuse for the in-query build; a deployment reads the persisted
    // term-bucketed posting index instead
    val tf = Caching.cached(postings(docs))
    val doclen = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
    val stats = doclen.agg(count(lit(1)).as("n"), sum(col("len")).as("total_len"))
    val qterms = queryTerms(tf, stats.select(col("n")))
    serve(tf, doclen, stats, qterms, k)
  }

  /** The posting-probe serve stage from index artifacts — the ONE serve
    * spelling shared by the full build and the delta refresh: candidates
    * are posting-union-sized (broadcast query-term probe); doclen joins on
    * doc_id AFTER the candidate filter, so only matched docs pay it.
    */
  private[graft] def serve(tf: DataFrame, doclen: DataFrame, stats: DataFrame,
      qterms: DataFrame, k: Int): DataFrame =
    rankTail(
      tf.join(broadcast(qterms), Seq("term"))
        .join(doclen, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("contrib", contribUnats)
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("contrib")).as("score_unats"), count(lit(1)).as("n_terms")),
      k)

  /** Incremental posting-index maintenance — the frozen-index delta
    * discipline (the r18/r19 matrix: lsh_buckets / ivf_assign / pq_codes /
    * minhash / simhash / winnow / codebook / kNN-graph deltas) applied to
    * the ONE index family that lacked it: a recrawl invalidates postings,
    * doclen, df, N and total_len, and before this operator refreshing the
    * lexical index meant a full rebuild of [[postings]].
    *
    * The OLD snapshot's artifacts FREEZE (the caches stand in for the
    * persisted term-bucketed posting index + per-doc lengths + single-row
    * stats a deployment reads): the delta documents pay only THEIR OWN
    * explode. The refreshed index is a pure integer merge —
    *  - postings: frozen ∪ delta rows (doc spaces disjoint — no combine),
    *  - doclen: frozen per-doc rows ∪ delta per-doc rows,
    *  - stats: n_old + n_delta, total_len_old + total_len_delta,
    *  - df(term): df_old + df_delta, read query-sized on BOTH sides
    *    ([[restrictedDf]] — at scale the frozen df is a persisted per-term
    *    stat and the probe reads only the query terms' rows).
    * Integer merges are associative, so refresh ≡ rebuild EXACTLY: every
    * selection score, BM25 micro-nat contribution and rank is identical to
    * [[bm25TopK]] over old ∪ delta — the driver oracle is therefore the
    * full-rebuild spelling VERBATIM ([[Bm25Sql.bm25DocumentsSql]]), making
    * the gate itself the equivalence certificate; Bm25DeltaSpec pins
    * score-level equality and the displacement case adversarially.
    *
    * Scale shape: the old corpus never re-explodes, re-aggregates or
    * reshuffles — the refresh pays O(delta) index work plus the same
    * query-sized serve probe as the full build.
    */
  def bm25DeltaTopK(oldDocs: DataFrame, deltaDocs: DataFrame,
      k: Int = TopK): DataFrame = {
    val tfDelta = Caching.cached(postings(deltaDocs))
    mergeServe(Caching.cached(postings(oldDocs)), tfDelta,
      tfDelta.groupBy(col("doc_id")).agg(sum(col("tf")).as("len")), k)
  }

  /** The refresh-and-serve stage from a frozen old posting frame and the
    * delta's (postings, doclen) increments — the ONE merge spelling,
    * shared by [[bm25DeltaTopK]] and the streaming maintenance twin
    * ([[graft.streaming.StreamingBm25Delta]], whose increments arrive as
    * micro-batches) so the integer-merge arithmetic cannot drift.
    */
  private[graft] def mergeServe(tfOld: DataFrame, tfDelta: DataFrame,
      doclenDelta: DataFrame, k: Int): DataFrame = {
    val doclenOld = Caching.cached(
      tfOld.groupBy(col("doc_id")).agg(sum(col("tf")).as("len")))
    val statsOld = doclenOld
      .agg(count(lit(1)).as("n_old"), sum(col("len")).as("tl_old"))
    val statsDelta = doclenDelta
      .agg(count(lit(1)).as("n_delta"), sum(col("len")).as("tl_delta"))
    val stats = statsOld.crossJoin(statsDelta)
      .select((col("n_old") + col("n_delta")).as("n"),
        (col("tl_old") + col("tl_delta")).as("total_len"))
    val doclen = doclenOld.unionAll(doclenDelta)
    val tfMerged = tfOld.unionAll(tfDelta)
    // query docs may live in either snapshot side, so the query-tf read and
    // the df refresh both span the merge: df = frozen df + delta increments
    val qtf = tfMerged.filter(col("doc_id") < QueryCount)
    val qtermSet = qtf.select(col("term")).distinct()
    val dfFrame = restrictedDf(tfOld, qtermSet)
      .unionAll(restrictedDf(tfDelta, qtermSet))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val qterms = queryTermsFrom(qtf, dfFrame, stats.select(col("n")))
    serve(tfMerged, doclen, stats, qterms, k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical list and
    * the exact-cosine vector list ([[Similarity.bruteForceTopK]] — the
    * certified exact baseline, so the fusion itself is exactly testable;
    * swapping in an ANN family is a one-line substitution at deploy time).
    *
    * rrf(d) = Σ_systems 1e6 div (60 + rank_d) — ranks are integers, the
    * division is INTEGRAL, so fusion is exact in both engines by
    * construction: zero float risk. A document absent from one system's
    * top-[[FusionDepth]] contributes 0 from that system (rank reported as 0
    * — "not retrieved" — keeping the output columns non-null so the two
    * engines' null handling never meets the comparator).
    *
    * Scale shape: both inputs are nq x depth rows — fusion costs nothing at
    * any corpus size; the expense lives in the two (independently certified
    * and independently scalable) retrieval legs.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame,
      k: Int = TopK, depth: Int = FusionDepth): DataFrame = {
    val lex = bm25TopK(docs, depth)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val vec = Similarity.bruteForceTopK(emb, QueryCount, depth)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    rrfFuse(lex, vec, k)
  }

  /** The fusion tail from pre-built rank lists — the ONE RRF spelling,
    * shared by [[hybridRrf]], the recall instrument ([[hybridRecallCurve]],
    * which fuses the same lists at sweep depths) and the streaming serve
    * twin, so the fused arithmetic cannot drift. `lex` carries (query_id,
    * doc_id, lex_rank), `vec` (query_id, doc_id, vec_rank).
    */
  private[graft] def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("lex_rank", coalesce(col("lex_rank"), lit(0L)))
      .withColumn("vec_rank", coalesce(col("vec_rank"), lit(0L)))
      .withColumn("rrf_ppm",
        when(col("lex_rank") > 0, expr(s"1000000L div (${RrfK}L + lex_rank)"))
          .otherwise(0L) +
        when(col("vec_rank") > 0, expr(s"1000000L div (${RrfK}L + vec_rank)"))
          .otherwise(0L))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("lex_rank"), col("vec_rank"), col("rrf_ppm"))
  }

  /** The fusion-depth sweep points; the deepest is [[FusionDepth]] — the
    * shipped serve knob, so the curve's tail IS the shipped operator
    * (the `ann_rerank_depth_curve` discipline: sweep first, pin the tail).
    */
  val FusionDepthPoints: Seq[Int] = Seq(5, 10, FusionDepth)

  /** Fusion-quality instrument for [[hybridRrf]] — the knob curve behind
    * FusionDepth = [[FusionDepth]] / RrfK = [[RrfK]], the one serve knob
    * pair shipped in r19 without a measured curve (the r18
    * `ann_rerank_batch` lesson: unmeasured knobs hide recall cliffs).
    * Per sweep depth, ONE row of integral counts over the two depth-20
    * rank lists (computed once; the sweep is depth-exploded and fused in
    * ONE windowed pass whose arithmetic is [[rrfFuse]]'s line-for-line —
    * restricting a depth-20 list to rank ≤ 20 is the identity, so the
    * tail row's fused set IS the shipped `ann_hybrid_rrf` list, pinned
    * row-for-row in HybridRecallSpec and by the driver oracle):
    *  - CONSENSUS recall: relevant(q) = docs in BOTH systems' top-20 (the
    *    best label-free relevance proxy — lexically and semantically
    *    close). hyb/lex/vec_cons_hits count how many consensus docs each
    *    top-k list retains. The case fusion exists for: a doc ranked ~12th
    *    by both systems fuses above any single-system head, so the hybrid
    *    retains consensus docs the legs' own top-k miss. HONEST-ZERO note:
    *    on this synthetic corpus the consensus set THINS with scale (7
    *    docs at sf0.01, 0 at sf0.1 — token ids and embedding directions
    *    are drawn independently, the distance-concentration finding's
    *    lexical sibling); the instrument reports the emptiness rather than
    *    hiding it, and the leg-retention metrics below stay non-vacuous at
    *    every scale. On a real corpus the consensus column is the one to
    *    watch.
    *  - LEG RETENTION: how much of each leg's own top-k head survives
    *    fusion (hyb_lex/vec_hits over n_lex/vec_head). The non-collapse
    *    certificate: RRF's integral arithmetic guarantees both legs' ranks
    *    1..2 outrank any single rank ≥ 3, so retention ≥ 2/k per leg at
    *    every depth — a fusion that collapses onto one leg fails the
    *    pinned floor.
    * Scale shape: both legs are nq x depth rows — every fusion, join and
    * count here is corpus-size-free; the expense lives in the two
    * independently certified retrieval legs, computed ONCE and cached.
    */
  def hybridRecallCurve(docs: DataFrame, emb: DataFrame,
      k: Int = TopK): DataFrame = {
    val lexDeep = bm25TopK(docs, FusionDepth)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val vecDeep = Similarity.bruteForceTopK(emb, QueryCount, FusionDepth)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    // the (query, doc) universe with both ranks attached (0 = absent) —
    // every metric below is a conditional count over this one frame
    val uni = Caching.cached(
      lexDeep.join(vecDeep, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
          coalesce(col("vec_rank"), lit(0L)).as("vec_rank")))
    // ONE pass over depth x universe instead of one fusion DAG per depth
    // (r21: the three per-depth rrfFuse/join/agg chains cost three windows,
    // three joins and three aggregations over the same cached rows — the
    // sweep is depth-exploded and fused under a (depth, query) window
    // instead; arithmetic is rrfFuse's line-for-line, and the row-for-row
    // equality with the shipped serve stays pinned by HybridRecallSpec and
    // the driver oracle). Restricting a depth-20 rank to <= depth then
    // treating 0 as absent reproduces each per-depth filtered fusion
    // exactly: a row joins the per-depth fused frame iff either effective
    // rank is positive, and present rows' rrf_ppm/tie order is unchanged.
    val uniD = uni.select(col("query_id"), col("doc_id"),
      col("lex_rank"), col("vec_rank"),
      explode(array(FusionDepthPoints.map(d => lit(d.toLong)): _*)).as("depth"))
    val w = Window.partitionBy(col("depth"), col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
    val hybSet = uniD
      .withColumn("lr", when(col("lex_rank") >= 1 &&
        col("lex_rank") <= col("depth"), col("lex_rank")).otherwise(lit(0L)))
      .withColumn("vr", when(col("vec_rank") >= 1 &&
        col("vec_rank") <= col("depth"), col("vec_rank")).otherwise(lit(0L)))
      .filter(col("lr") > 0 || col("vr") > 0)
      .withColumn("rrf_ppm",
        when(col("lr") > 0, expr(s"1000000L div (${RrfK}L + lr)"))
          .otherwise(0L) +
        when(col("vr") > 0, expr(s"1000000L div (${RrfK}L + vr)"))
          .otherwise(0L))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("depth"), col("query_id"), col("doc_id"), lit(1L).as("in_hyb"))
    val cons = col("lex_rank") > 0 && col("vec_rank") > 0
    // intentional degenerate-input divergence (ADVICE r21): on an EMPTY
    // universe groupBy(depth) returns zero rows where the pre-r21
    // per-depth global aggregates returned one zero-count row per
    // FusionDepthPoint; no consumer or oracle input exercises an empty
    // corpus, and zero-rows is the truthful shape for "nothing retrieved"
    uniD.join(hybSet, Seq("depth", "query_id", "doc_id"), "left")
      .withColumn("in_hyb", coalesce(col("in_hyb"), lit(0L)))
      .groupBy(col("depth"))
      .agg(
        count(when(cons, 1)).as("n_consensus"),
        count(when(cons && col("in_hyb") === 1, 1)).as("hyb_cons_hits"),
        count(when(cons && col("lex_rank") <= k, 1)).as("lex_cons_hits"),
        count(when(cons && col("vec_rank") <= k, 1)).as("vec_cons_hits"),
        count(when(col("lex_rank") > 0 && col("lex_rank") <= k, 1))
          .as("n_lex_head"),
        count(when(col("lex_rank") > 0 && col("lex_rank") <= k
          && col("in_hyb") === 1, 1)).as("hyb_lex_hits"),
        count(when(col("vec_rank") > 0 && col("vec_rank") <= k, 1))
          .as("n_vec_head"),
        count(when(col("vec_rank") > 0 && col("vec_rank") <= k
          && col("in_hyb") === 1, 1)).as("hyb_vec_hits"))
      // greatest(.., 1): the divisor guards are symmetric in both engines
      // (Spark non-ANSI div yields null on 0, DuckDB // raises)
      .withColumn("hyb_cons_recall_ppm",
        expr("(hyb_cons_hits * 1000000) div greatest(n_consensus, 1)"))
      .withColumn("lex_cons_recall_ppm",
        expr("(lex_cons_hits * 1000000) div greatest(n_consensus, 1)"))
      .withColumn("vec_cons_recall_ppm",
        expr("(vec_cons_hits * 1000000) div greatest(n_consensus, 1)"))
      .withColumn("hyb_lex_recall_ppm",
        expr("(hyb_lex_hits * 1000000) div greatest(n_lex_head, 1)"))
      .withColumn("hyb_vec_recall_ppm",
        expr("(hyb_vec_hits * 1000000) div greatest(n_vec_head, 1)"))
      .select(col("depth"), col("n_consensus"),
        col("hyb_cons_hits"), col("hyb_cons_recall_ppm"),
        col("lex_cons_hits"), col("lex_cons_recall_ppm"),
        col("vec_cons_hits"), col("vec_cons_recall_ppm"),
        col("n_lex_head"), col("hyb_lex_hits"), col("hyb_lex_recall_ppm"),
        col("n_vec_head"), col("hyb_vec_hits"), col("hyb_vec_recall_ppm"))
      .orderBy(col("depth"))
  }

  /** Driver query: BM25 top-k over the documents table. */
  def bm25Documents(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(spark, dir))
      .orderBy(col("query_id"), col("rank"))

  /** Driver query: the incremental refresh over the snapshot carve — old
    * corpus = the non-added residues, delta = the added ones
    * ([[CorpusDiff.AddedMod]], the recrawl discipline — the
    * [[KnnGraph.deltaGraphEmbeddings]] carve verbatim), so old ∪ delta is
    * exactly the full table and the oracle is the rebuild spelling.
    */
  def bm25DeltaDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    bm25DeltaTopK(docs.filter(col("doc_id") % CorpusDiff.AddedMod =!= 0),
      docs.filter(col("doc_id") % CorpusDiff.AddedMod === 0))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Driver query: hybrid RRF over documents + embeddings. */
  def hybridDocuments(spark: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.documents(spark, dir), Tables.embeddings(spark, dir))
      .orderBy(col("query_id"), col("rank"))

  /** Driver query: the fusion-depth recall curve over documents +
    * embeddings.
    */
  def hybridRecallDocuments(spark: SparkSession, dir: String): DataFrame =
    hybridRecallCurve(Tables.documents(spark, dir), Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[Bm25]] — same tokenizer, same constants, same
  * paren-for-paren double expression inside the floor, same integral sums
  * and integral RRF division.
  */
object Bm25Sql {
  import Bm25._

  /** CTE chain ending in `bm_ranked(query_id, rank, doc_id, n_terms,
    * score_unats)` — shared by the standalone query and the hybrid oracle.
    */
  private def bm25Ctes: String =
    s"""bm_tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(${TS.tokens("text")}) AS term FROM documents)
       |  WHERE length(term) > 0 GROUP BY 1, 2),
       |bm_len AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len
       |  FROM bm_tf GROUP BY 1),
       |bm_df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM bm_tf GROUP BY 1),
       |bm_stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(len) AS BIGINT) AS total_len FROM bm_len),
       |bm_qsel AS (
       |  SELECT doc_id AS query_id, term, df, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY
       |      round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6) DESC, term
       |  ) AS __r
       |  FROM bm_tf JOIN bm_df USING (term), bm_stats
       |  WHERE doc_id < $QueryCount),
       |bm_qterms AS (SELECT query_id, term, df FROM bm_qsel
       |  WHERE __r <= $QueryTerms),
       |bm_scored AS (
       |  SELECT q.query_id, t.doc_id,
       |    CAST(sum(CAST(floor(
       |      ln(1.0 + (s.n - q.df + 0.5) / (q.df + 0.5)) *
       |      (t.tf * (${K1} + 1.0) /
       |        (t.tf + ${K1} * (1.0 - ${B} + ${B} * l.len * s.n / s.total_len)))
       |      * 1e6) AS BIGINT)) AS BIGINT) AS score_unats,
       |    CAST(count(*) AS BIGINT) AS n_terms
       |  FROM bm_tf t
       |  JOIN bm_qterms q USING (term)
       |  JOIN bm_len l ON t.doc_id = l.doc_id, bm_stats s
       |  WHERE t.doc_id <> q.query_id
       |  GROUP BY 1, 2),
       |bm_ranked AS (
       |  SELECT query_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score_unats DESC, doc_id) AS rank,
       |    doc_id, n_terms, score_unats
       |  FROM bm_scored)""".stripMargin

  def bm25DocumentsSql(k: Int = TopK): String =
    s"""WITH $bm25Ctes
       |SELECT query_id, rank, doc_id, n_terms, score_unats
       |FROM bm_ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Mirror of [[Bm25.hybridRecallCurve]]: the same two depth-20 rank
    * lists, the same per-depth restricted RRF fusion (integral `//`), the
    * same conditional counts over the one full-outer universe, the same
    * greatest(.., 1) divisor guards.
    */
  def hybridRecallCurveSql(k: Int = TopK): String = {
    import graft.functions.{VectorSql => VS}
    val depths = FusionDepthPoints
    def hybCte(d: Int): String =
      s"""hyb_$d AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY rrf_ppm DESC, doc_id) AS r
         |    FROM (
         |      SELECT query_id, doc_id,
         |        (CASE WHEN lex_rank BETWEEN 1 AND $d
         |              THEN 1000000 // ($RrfK + lex_rank) ELSE 0 END
         |         + CASE WHEN vec_rank BETWEEN 1 AND $d
         |              THEN 1000000 // ($RrfK + vec_rank) ELSE 0 END) AS rrf_ppm
         |      FROM uni
         |      WHERE lex_rank BETWEEN 1 AND $d OR vec_rank BETWEEN 1 AND $d))
         |  WHERE r <= $k)""".stripMargin
    def rowCte(d: Int): String =
      s"""row_$d AS (
         |  SELECT CAST($d AS BIGINT) AS depth,
         |    count(*) FILTER (WHERE lex_rank > 0 AND vec_rank > 0) AS n_consensus,
         |    count(*) FILTER (WHERE lex_rank > 0 AND vec_rank > 0 AND in_hyb) AS hyb_cons_hits,
         |    count(*) FILTER (WHERE lex_rank > 0 AND vec_rank > 0 AND lex_rank <= $k) AS lex_cons_hits,
         |    count(*) FILTER (WHERE lex_rank > 0 AND vec_rank > 0 AND vec_rank <= $k) AS vec_cons_hits,
         |    count(*) FILTER (WHERE lex_rank > 0 AND lex_rank <= $k) AS n_lex_head,
         |    count(*) FILTER (WHERE lex_rank > 0 AND lex_rank <= $k AND in_hyb) AS hyb_lex_hits,
         |    count(*) FILTER (WHERE vec_rank > 0 AND vec_rank <= $k) AS n_vec_head,
         |    count(*) FILTER (WHERE vec_rank > 0 AND vec_rank <= $k AND in_hyb) AS hyb_vec_hits
         |  FROM (SELECT u.*, h.doc_id IS NOT NULL AS in_hyb
         |        FROM uni u LEFT JOIN hyb_$d h USING (query_id, doc_id)))""".stripMargin
    s"""WITH $bm25Ctes,
       |lexd AS (SELECT query_id, doc_id, rank AS lex_rank
       |  FROM bm_ranked WHERE rank <= $FusionDepth),
       |vq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |  WHERE vec_id < $QueryCount),
       |vscored AS (
       |  SELECT vq.query_id, c.vec_id AS doc_id,
       |    ${VS.cosine("vq.qv", "c.embedding")} AS cos
       |  FROM embeddings c JOIN vq ON vq.query_id <> c.vec_id),
       |vecd AS (
       |  SELECT query_id, doc_id, vec_rank FROM (
       |    SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos DESC, doc_id) AS vec_rank
       |    FROM vscored)
       |  WHERE vec_rank <= $FusionDepth),
       |uni AS (
       |  SELECT query_id, doc_id,
       |    CAST(coalesce(lex_rank, 0) AS BIGINT) AS lex_rank,
       |    CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank
       |  FROM lexd FULL OUTER JOIN vecd USING (query_id, doc_id)),
       |${depths.map(hybCte).mkString(",\n")},
       |${depths.map(rowCte).mkString(",\n")}
       |SELECT depth, n_consensus,
       |  hyb_cons_hits, (hyb_cons_hits * 1000000) // greatest(n_consensus, 1) AS hyb_cons_recall_ppm,
       |  lex_cons_hits, (lex_cons_hits * 1000000) // greatest(n_consensus, 1) AS lex_cons_recall_ppm,
       |  vec_cons_hits, (vec_cons_hits * 1000000) // greatest(n_consensus, 1) AS vec_cons_recall_ppm,
       |  n_lex_head, hyb_lex_hits, (hyb_lex_hits * 1000000) // greatest(n_lex_head, 1) AS hyb_lex_recall_ppm,
       |  n_vec_head, hyb_vec_hits, (hyb_vec_hits * 1000000) // greatest(n_vec_head, 1) AS hyb_vec_recall_ppm
       |FROM (${depths.map(d => s"SELECT * FROM row_$d").mkString("\n  UNION ALL\n  ")})
       |ORDER BY depth""".stripMargin
  }

  def hybridDocumentsSql(k: Int = TopK, depth: Int = FusionDepth): String = {
    import graft.functions.{VectorSql => VS}
    s"""WITH $bm25Ctes,
       |lex AS (SELECT query_id, doc_id, rank AS lex_rank
       |  FROM bm_ranked WHERE rank <= $depth),
       |vq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |  WHERE vec_id < $QueryCount),
       |vscored AS (
       |  SELECT vq.query_id, c.vec_id AS doc_id,
       |    ${VS.cosine("vq.qv", "c.embedding")} AS cos
       |  FROM embeddings c JOIN vq ON vq.query_id <> c.vec_id),
       |vec AS (
       |  SELECT query_id, doc_id, vec_rank FROM (
       |    SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos DESC, doc_id) AS vec_rank
       |    FROM vscored)
       |  WHERE vec_rank <= $depth),
       |fused AS (
       |  SELECT query_id, doc_id,
       |    CAST(coalesce(lex_rank, 0) AS BIGINT) AS lex_rank,
       |    CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank
       |  FROM lex FULL OUTER JOIN vec USING (query_id, doc_id)),
       |rrf AS (
       |  SELECT query_id, doc_id, lex_rank, vec_rank,
       |    (CASE WHEN lex_rank > 0 THEN 1000000 // ($RrfK + lex_rank) ELSE 0 END
       |     + CASE WHEN vec_rank > 0 THEN 1000000 // ($RrfK + vec_rank) ELSE 0 END
       |    ) AS rrf_ppm
       |  FROM fused)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |  lex_rank, vec_rank, CAST(rrf_ppm AS BIGINT) AS rrf_ppm
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf_ppm DESC, doc_id) AS rank
       |  FROM rrf)
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }
}
