package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextSql => TS}

/** Benchmark decontamination — the training-pipeline step that finds corpus
  * documents overlapping an evaluation suite, so they can be dropped before
  * training: a corpus document is contaminated when it shares at least one
  * word n-gram shingle with a benchmark document.
  *
  * Scale shape (100 TB corpus vs a benchmark suite of at most ~10^5 docs):
  * the BENCHMARK posting list is the broadcast side, so the corpus side is
  * scan -> per-row shingle hashing -> broadcast hash join -> partial-agg
  * groupBy on doc_id. The corpus never shuffles its postings; the only
  * shuffle is the per-document hit aggregation (doc_id keys, map-side
  * combined). Shingles are the shared 60-bit md5 hashes
  * ([[Dedup.hashedShingleSets]]) — 8-byte join keys, string-collision odds
  * negligible (same argument as the n-gram Jaccard operator).
  */
object Decontaminate {

  /** Name of the observe() metric counting (corpus_doc, bench_doc, shingle)
    * join hits suppressed by the self-match guard — read it via
    * QueryExecutionListener / [[graft.streaming.LogSink]] like the dedup
    * skew-cap drop counts.
    */
  val SelfMatchMetric = "decontaminate_guard"

  /** (doc_id, n_bench_docs, n_hit_shingles) for every corpus document
    * sharing >= 1 shingle with a benchmark document. Corpus documents that
    * ARE benchmark documents (same doc_id) don't self-contaminate —
    * callers whose suite has its OWN id space (the normal case) must keep
    * it disjoint from corpus ids, or an id collision suppresses a genuine
    * hit. The guard cannot key on provenance (the inputs are two arbitrary
    * frames), so suppression is made VISIBLE instead of silent: the count
    * of guarded-out join hits surfaces as the [[SelfMatchMetric]] observe()
    * metric — zero whenever the id spaces are disjoint, so any non-zero
    * value under a suite that claims its own id space is the collision
    * alarm. (AQE caveat: when the join output is EMPTY — a fully clean
    * corpus, or every hit guarded out — AQE's empty-relation propagation
    * can drop the metric node from the final plan and no metric is
    * delivered; any contamination at all keeps the stage, and with it the
    * metric, alive.)
    */
  def contaminated(docs: DataFrame, bench: DataFrame,
      n: Int = Dedup.ShingleN): DataFrame = {
    val corpusInv = Dedup.hashedShingleSets(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val benchInv = Dedup.hashedShingleSets(bench, n)
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("s"))
    corpusInv.join(broadcast(benchInv), Seq("s"))
      .observe(SelfMatchMetric,
        // coalesce: sum over an EMPTY join (a fully clean corpus) is null,
        // and the documented listener pattern reads getLong
        coalesce(sum(when(col("doc_id") === col("bench_id"), 1L).otherwise(0L)),
          lit(0L)).as("self_matches_dropped"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id")
      .agg(countDistinct("bench_id").as("n_bench_docs"),
        countDistinct("s").as("n_hit_shingles"))
  }

  /** Deterministic synthetic benchmark suite for the driver check: exact
    * copies of every doc_id % 100 == [[ProbeResidue]] document under
    * NEGATIVE ids (-(doc_id + 1)). A copy shares every shingle with its
    * source, so the check is structurally non-vacuous (the oracle cannot
    * detect a uselessly-empty result otherwise — the dedup_embedding
    * lesson), and negative ids can never collide with the non-negative
    * corpus id space at ANY corpus size (a fixed additive shift silently
    * collides once the corpus outgrows it, falsely suppressing hits via
    * the self-match guard).
    */
  val ProbeResidue = 7

  def probeBenchmarks(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 100 === ProbeResidue)
      .select((-(col("doc_id") + 1)).as("doc_id"), col("text"))

  /** The benchmark-side view of the SAME contamination join: per
    * benchmark item, how many corpus documents it leaks into and through
    * how many distinct shingles — the "which eval rows are compromised"
    * table an eval owner reads (an item leaked into thousands of training
    * documents is dead regardless of decontamination, because paraphrases
    * the shingle screen misses are near-certain). Identical join and
    * guard; only the aggregation key flips to bench_id.
    */
  def benchReport(docs: DataFrame, bench: DataFrame,
      n: Int = Dedup.ShingleN): DataFrame = {
    val corpusInv = Dedup.hashedShingleSets(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val benchInv = Dedup.hashedShingleSets(bench, n)
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("s"))
    corpusInv.join(broadcast(benchInv), Seq("s"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("bench_id")
      .agg(countDistinct("doc_id").as("n_corpus_docs"),
        countDistinct("s").as("n_hit_shingles"))
      .orderBy(col("bench_id"))
  }
}

/** DuckDB oracle for [[Decontaminate]] over the probe benchmark suite.
  * Shingles stay STRINGS here (the Spark side joins on their 60-bit hashes;
  * distinct counts agree absent collisions — the jaccard-oracle argument).
  */
object DecontaminateSql {

  def contaminatedSql(n: Int = Dedup.ShingleN): String =
    s"""WITH bench AS (
       |  SELECT -(doc_id + 1) AS doc_id, text
       |  FROM documents WHERE doc_id % 100 = ${Decontaminate.ProbeResidue}),
       |ct AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM documents
       |       WHERE ${TS.nTokens("text")} >= $n),
       |cinv AS (
       |  SELECT doc_id, unnest(list_distinct(${TS.shingles("text", n)})) AS s
       |  FROM ct),
       |bt AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM bench
       |       WHERE ${TS.nTokens("text")} >= $n),
       |binv AS (
       |  SELECT doc_id AS bench_id,
       |         unnest(list_distinct(${TS.shingles("text", n)})) AS s
       |  FROM bt)
       |SELECT c.doc_id,
       |       count(DISTINCT b.bench_id) AS n_bench_docs,
       |       count(DISTINCT c.s) AS n_hit_shingles
       |FROM cinv c JOIN binv b ON c.s = b.s AND c.doc_id <> b.bench_id
       |GROUP BY c.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Mirror of [[Decontaminate.benchReport]] — the same join CTEs with the
    * aggregation keyed on bench_id.
    */
  def benchReportSql(n: Int = Dedup.ShingleN): String =
    s"""WITH bench AS (
       |  SELECT -(doc_id + 1) AS doc_id, text
       |  FROM documents WHERE doc_id % 100 = ${Decontaminate.ProbeResidue}),
       |ct AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM documents
       |       WHERE ${TS.nTokens("text")} >= $n),
       |cinv AS (
       |  SELECT doc_id, unnest(list_distinct(${TS.shingles("text", n)})) AS s
       |  FROM ct),
       |bt AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM bench
       |       WHERE ${TS.nTokens("text")} >= $n),
       |binv AS (
       |  SELECT doc_id AS bench_id,
       |         unnest(list_distinct(${TS.shingles("text", n)})) AS s
       |  FROM bt)
       |SELECT b.bench_id,
       |       count(DISTINCT c.doc_id) AS n_corpus_docs,
       |       count(DISTINCT c.s) AS n_hit_shingles
       |FROM cinv c JOIN binv b ON c.s = b.s AND c.doc_id <> b.bench_id
       |GROUP BY b.bench_id
       |ORDER BY bench_id""".stripMargin
}
