package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}

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
  /** Fuzzy (fractional-overlap) decontamination — the paraphrase-aware form
    * [[contaminated]] cannot be: flagging on >= 1 shared shingle treats a
    * lightly-paraphrased benchmark item (most shingles still present, a few
    * edited away) identically to a one-idiom coincidence, so an eval owner
    * cannot RANK leakage severity. This form scores each benchmark item by
    * CONTAINMENT — the fraction of the item's shingles present in a single
    * corpus document, the asymmetric [[Dedup.ngramContainment]] denominator
    * choice (the BENCH side, because a short eval item embedded in a long
    * training document is full leakage regardless of the document's size) —
    * and reports, per item, the worst-offender containment and how many
    * corpus documents exceed the [[FlagPpm]] leak threshold.
    *
    * Arithmetic is integer ppm end-to-end (`common * 1e6 div bench_sz`, the
    * Oversample rule), so both engines band identically; `band` is the ppm
    * decile (0..10 — 10 is byte-exact shingle containment 1.0). Items whose
    * shingles hit NOTHING in the corpus surface as band-0 rows (left join
    * from the bench side): "this item is clean" is a verdict, not an
    * absence.
    *
    * Scale shape: identical to [[contaminated]] — the benchmark inverted
    * index is the broadcast side, the corpus never shuffles its postings,
    * and the per-(item, doc) hit counts aggregate map-side on 16-byte keys.
    * The per-item fold is |bench|-sized.
    */
  val FlagPpm = 500000L

  def fuzzyContaminated(docs: DataFrame, bench: DataFrame,
      n: Int = Dedup.ShingleN): DataFrame = {
    val benchSets = Dedup.hashedShingleSets(bench, n)
      .select(col("doc_id").as("bench_id"), col("sh"))
    val corpusInv = Dedup.hashedShingleSets(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val benchInv = benchSets
      .select(col("bench_id"), explode(col("sh")).as("s"))
    val ppm = corpusInv.join(broadcast(benchInv), Seq("s"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("bench_id"), col("doc_id"))
      .agg(count(lit(1)).as("common"))
      .join(broadcast(benchSets.select(col("bench_id"),
        size(col("sh")).cast("long").as("bench_sz"))), Seq("bench_id"))
      .withColumn("ppm", expr("(common * 1000000) div bench_sz"))
    val perItem = ppm.groupBy(col("bench_id"))
      .agg(max(col("ppm")).as("max_containment_ppm"),
        sum(when(col("ppm") >= FlagPpm, 1L).otherwise(0L)).as("n_flagged_docs"))
    benchSets.select(col("bench_id"))
      .join(perItem, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("max_containment_ppm"), lit(0L)).as("max_containment_ppm"),
        expr("coalesce(max_containment_ppm, 0) div 100000").as("band"),
        coalesce(col("n_flagged_docs"), lit(0L)).as("n_flagged_docs"))
      .orderBy(col("bench_id"))
  }

  /** Probe benchmark suite for the FUZZY form — four leakage regimes so
    * every band class is non-vacuous at any scale (ids negative, disjoint
    * from the corpus id space at any corpus size; family spacing rides
    * [[Dedup.probeId]]'s guarded offsets):
    *
    *  - byte-exact copies (band 10): the [[probeBenchmarks]] residue.
    *  - paraphrase stand-ins (high fractional band): one token prepended —
    *    every original shingle survives, exactly the zz-window shingles are
    *    novel.
    *  - partial leaks (mid band): the document's leading tokens followed by
    *    item-unique junk — roughly half the item's shingles hit.
    *  - clean items (band 0): fully synthetic text sharing no shingle with
    *    any document.
    */
  def fuzzyProbeBenchmarks(docs: DataFrame): DataFrame = {
    import Dedup.ProbeIdSpace
    val exact = probeBenchmarks(docs)
    val para = docs.filter(col("doc_id") % 100 === 23)
      .select((-(Dedup.probeId(ProbeIdSpace) + 1)).as("doc_id"),
        concat(lit("zz "), col("text")).as("text"))
    val partial = docs.filter(col("doc_id") % 100 === 41 &&
        TF.nTokens(col("text")) >= 16)
      .select((-(Dedup.probeId(2 * ProbeIdSpace) + 1)).as("doc_id"),
        concat(
          concat_ws(" ", slice(TF.tokens(col("text")), 1, 8)),
          lit(" "),
          concat_ws(" ", (1 to 8).map(i =>
            concat(lit(s"uq$i"), col("doc_id").cast("string"))): _*))
          .as("text"))
    val clean = docs.filter(col("doc_id") % 100 === 59)
      .select((-(Dedup.probeId(3 * ProbeIdSpace) + 1)).as("doc_id"),
        concat_ws(" ", (1 to 4).map(i =>
          concat(lit(s"cl$i"), col("doc_id").cast("string"))): _*).as("text"))
    exact.unionAll(para).unionAll(partial).unionAll(clean)
  }

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

  /** Mirror of [[Decontaminate.fuzzyContaminated]] over
    * [[Decontaminate.fuzzyProbeBenchmarks]] — same four probe families, same
    * integer-ppm containment arithmetic, same band deciles, same
    * clean-items-as-band-0 left join.
    */
  def fuzzyContaminatedSql(n: Int = Dedup.ShingleN): String = {
    val junk = (1 to 8).map(i => s"' uq$i' || doc_id::VARCHAR").mkString(" || ")
    val cleanText = (1 to 4).map(i => s"'cl$i' || doc_id::VARCHAR")
      .mkString(" || ' ' || ")
    s"""WITH bench AS (
       |  SELECT -(doc_id + 1) AS doc_id, text
       |  FROM documents WHERE doc_id % 100 = ${Decontaminate.ProbeResidue}
       |  UNION ALL
       |  SELECT -(doc_id + 1000001), 'zz ' || text
       |  FROM documents WHERE doc_id % 100 = 23
       |  UNION ALL
       |  SELECT -(doc_id + 2000001),
       |    array_to_string((${TS.tokens("text")})[1:8], ' ') || $junk
       |  FROM documents WHERE doc_id % 100 = 41 AND ${TS.nTokens("text")} >= 16
       |  UNION ALL
       |  SELECT -(doc_id + 3000001), $cleanText
       |  FROM documents WHERE doc_id % 100 = 59),
       |bt AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM bench
       |       WHERE ${TS.nTokens("text")} >= $n),
       |bsets AS (
       |  SELECT doc_id AS bench_id, list_distinct(${TS.shingles("text", n)}) AS sh
       |  FROM bt),
       |binv AS (SELECT bench_id, unnest(sh) AS s FROM bsets),
       |ct AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM documents
       |       WHERE ${TS.nTokens("text")} >= $n),
       |cinv AS (
       |  SELECT doc_id, unnest(list_distinct(${TS.shingles("text", n)})) AS s
       |  FROM ct),
       |hits AS (
       |  SELECT b.bench_id, c.doc_id, count(*) AS common
       |  FROM cinv c JOIN binv b ON c.s = b.s AND c.doc_id <> b.bench_id
       |  GROUP BY 1, 2),
       |ppm AS (
       |  SELECT h.bench_id AS bid, (h.common * 1000000) // len(bs.sh) AS ppm
       |  FROM hits h JOIN bsets bs ON h.bench_id = bs.bench_id),
       |per AS (
       |  SELECT bid AS bench_id, max(ppm) AS max_containment_ppm,
       |    count(*) FILTER (WHERE ppm >= ${Decontaminate.FlagPpm}) AS n_flagged_docs
       |  FROM ppm GROUP BY 1)
       |SELECT b.bench_id,
       |  coalesce(p.max_containment_ppm, 0) AS max_containment_ppm,
       |  coalesce(p.max_containment_ppm, 0) // 100000 AS band,
       |  coalesce(p.n_flagged_docs, 0) AS n_flagged_docs
       |FROM bsets b LEFT JOIN per p ON b.bench_id = p.bench_id
       |ORDER BY 1""".stripMargin
  }

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
