package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Caching}
import graft.sources.Tables

/** Streaming twin of [[Bm25.bm25TopK]] — the serve-on-ingest shape for the
  * lexical family: QUERIES arrive as file micro-batches and probe the
  * FROZEN posting index as a stateless stream-static join, with the
  * per-(query, doc) score accumulating as an update-mode aggregation. The
  * first streaming SERVE twin in the suite (the ANN twins stream index
  * maintenance; this streams retrieval).
  *
  * What arrives: the query PLANS — (query_id, term, df, n, total_len) rows
  * from [[Bm25.queryTerms]], the <= nq x QueryTerms projection a serving
  * tier computes per query against the frozen corpus statistics before
  * touching the index (the staging discipline of the minhash delta twin,
  * which stages parse-time shingle sets + signatures: arrivals carry what
  * the ingest/serving pipeline computes locally). The corpus-level (n,
  * total_len) constants ride on each row, so the per-batch plan needs no
  * stream-static cross join.
  *
  * Per-batch plan: arriving plan rows equi-join the cached posting frame on
  * term (at deployment scale the index is term-bucketed on disk — the
  * lookup is shuffle-free; the cache stands in for it), join doclen on the
  * matched docs only, fold the ONE shared contribution spelling
  * ([[Bm25.contribUnats]]) and accumulate sum/count per (query_id, doc_id)
  * — contributions are nonnegative integers, so the update-mode emissions
  * are MONOTONE and the readback folds them with max (the
  * [[StreamingBudgetSample]] discipline, batch-order-independent). The
  * serve tail over the folded scores is [[Bm25.rankTail]] verbatim — one
  * spelling, no drift. SAME oracle as `text_bm25_topk`.
  *
  * State: one (sum, count) per live (query, candidate doc) — bounded by
  * the in-flight query set's candidate union, independent of corpus size
  * once a query's emissions are retired (at deployment a TTL evicts served
  * queries; the test harness serves one bounded query set).
  */
object StreamingBm25 {

  def bm25FromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3, k: Int = Bm25.TopK): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // the frozen index artifacts (cached statics — a streaming query
    // re-executes un-cached static subtrees every micro-batch; the caches
    // stand in for the persisted on-disk index a deployment reads)
    val tf = Caching.cached(Bm25.postings(docs))
    val doclen = Caching.cached(
      tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len")))
    val stats = doclen.agg(count(lit(1)).as("n"), sum(col("len")).as("total_len"))
    // the staged query plans: selection spelling verbatim, corpus stats
    // attached per row (parse-stage enrichment)
    val staged = Bm25.queryTerms(tf, stats.select(col("n")))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("term"), col("df"), col("n"), col("total_len"))
    // the index read: a term-bucketed on-disk index serves a query by
    // reading ONLY the buckets its terms name (partition pruning) — the
    // stand-in here is the posting frame restricted to the in-flight query
    // set's terms, cached once and broadcast into every micro-batch (the
    // selected terms are top-IDF, i.e. LOW-df, so the probed posting mass
    // is small by construction — the same property that makes the
    // MoreLikeThis bound a serve-cost bound). At test scale this is cost-
    // neutral (profiled: the twin's cost is staging + first-batch codegen/
    // state init, ~0.7 s/batch steady after); it is the 100 TB shape — a
    // full-posting-frame join per micro-batch would be wrong at scale
    // whether or not sf0.1 can see it.
    val tfProbe = Caching.cached(
      tf.join(broadcast(staged.select(col("term")).distinct()), Seq("term")))
    // doclen restricted to the candidate doc set BEFORE broadcasting — the
    // docs a batch can match are exactly tfProbe's (the posting-union
    // bound), so the semi-restriction is behaviorally invisible but keeps
    // the per-batch broadcast CANDIDATE-sized, not corpus-sized (a one-row-
    // per-document frame must never ship into every micro-batch at 100 TB)
    val doclenProbe = Caching.cached(
      doclen.join(tfProbe.select(col("doc_id")).distinct(), Seq("doc_id")))
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, staged, chunks, statePartitions = 4,
      prefix = "bm25_file", outputMode = "update", col("query_id"))(
      stream => stream
        .join(broadcast(tfProbe), Seq("term"))
        .join(broadcast(doclenProbe), Seq("doc_id"))
        .withColumn("contrib", Bm25.contribUnats)
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("contrib")).as("score_unats"),
          count(lit(1)).as("n_terms")))
    val folded = emissions.groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("score_unats")).as("score_unats"),
        max(col("n_terms")).as("n_terms"))
    Bm25.rankTail(folded, k).orderBy(col("query_id"), col("rank"))
  }
}
