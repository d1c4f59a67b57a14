package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}

/** Per-document text analysis: token counting, language-ID, quality scoring,
  * content fingerprinting. All narrow (per-row) transformations — they
  * pipeline with the parquet scan in one whole-stage-codegen span, shuffle
  * nothing, and scale embarrassingly. Formulas are mirrored in [[TextAnalysisSql]].
  */
object TextAnalysis {

  /** Long-form positional tokenization via the native
    * [[graft.functions.TokenPositions]] GENERATOR (the UDTF surface): one
    * (doc_id, pos, token) row per whitespace token, planned as a Generate
    * straight over the pruned 2-column scan — no intermediate token-array
    * allocation per row.
    */
  def tokenPositions(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TokenPositions.of(col("text")))

  /** Default certification phrase — three corpus-vocabulary words whose
    * exact sequence occurs (but is not ubiquitous) at every test scale. */
  val PhraseTerms: Seq[String] = Seq("group", "slow", "spark")

  /** Exact phrase search as a POSTING-LIST join, not a substring scan.
    *
    * One pass over the corpus generates (doc_id, pos, token) rows
    * ([[tokenPositions]]) and keeps only the phrase's terms — the filter
    * runs inside the Generate stage, so the surviving postings are
    * term-selectivity-sized, a tiny fraction of the token stream. Each
    * term's postings are then normalized to the would-be phrase START
    * (`pos - term_index`) and intersected with equi-joins on
    * (doc_id, start): every join shares one partitioning, so the first
    * exchange is reused across all k-1 joins, and each join is 1:1 (a
    * position holds one token). This is the shape a prebuilt positional
    * inverted index serves at 100 TB — cost scales with posting-list
    * length, never corpus length; a `text LIKE '%...%'` scan rereads
    * every byte of every document.
    *
    * Terms must be distinct (a repeated term would need occurrence
    * multiplicity bookkeeping the 1:1 join elides). Output: one row per
    * matching document with its match count and first match position —
    * overlapping matches each count ("a a a" contains "a a" twice).
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String] = PhraseTerms): DataFrame = {
    require(phrase.length >= 2, s"phraseSearch needs >= 2 terms, got $phrase")
    require(phrase.distinct.length == phrase.length,
      s"phraseSearch terms must be distinct, got $phrase")
    val postings = tokenPositions(docs).filter(col("token").isInCollection(phrase))
    val starts = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("token") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
    starts.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min("start").as("first_pos"))
      .orderBy("doc_id")
  }

  /** Token statistics: whitespace tokens, word-regex tokens, punctuation, and
    * a BPE-ish upper bound (word chars / 4 + punctuation — the usual "~4 chars
    * per subword token" estimator).
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val nWord = regexp_count(col("text"), lit("\\w+"))
    val nPunct = regexp_count(col("text"), lit("[^\\w\\s]"))
    val nWordChars = length(regexp_replace(col("text"), "[^\\w]", ""))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      TF.nTokens(col("text")).as("n_ws_tokens"),
      nWord.as("n_word_tokens"),
      nPunct.as("n_punct"),
      (ceil(nWordChars / lit(4.0)) + nPunct).cast("long").as("n_bpe_est"))
  }

  /** Deterministic marker-n-gram language ID with per-language scores.
    * The [[graft.functions.LangStats]] struct is evaluated ONCE behind an
    * alias and the output columns extract its fields (the [[repetition]]
    * pattern) — one pass over the text per row.
    */
  def langId(docs: DataFrame): DataFrame = {
    val withS = docs.select(col("doc_id"), col("lang").as("lang_labeled"),
      TF.langStats(col("text")).as("ls"))
    val scoreCols = graft.functions.LangStats.langs.toSeq
      .map(l => col(s"ls.score_$l").as(s"score_$l"))
    withS.select(
      (col("doc_id") +: col("lang_labeled") +:
        col("ls.pred").as("lang_pred") +: scoreCols): _*)
  }

  /** The three quality factors of a text column (length, stopword density,
    * alpha ratio), unrounded — shared by [[quality]] and the composite
    * [[CleanCorpus]] pipeline so both gate on the identical expression.
    */
  private[operators] def qualityFactors(text: Column): (Column, Column, Column) = {
    val nTok = TF.nTokens(text).cast("double")
    val padded = concat(lit(" "), text, lit(" "))
    val stopHits = Seq(" the ", " a ", " and ", " of ", " to ")
      .map(m => TF.markerCount(padded, m)).reduce(_ + _).cast("double")
    val alphaChars = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    val lenFactor = least(nTok / 64.0, lit(1.0))
    val stopFactor = least(stopHits / greatest(nTok, lit(1.0)) * 10.0, lit(1.0))
    val alphaFactor = alphaChars / greatest(length(text).cast("double"), lit(1.0))
    (lenFactor, stopFactor, alphaFactor)
  }

  /** Weighted quality score in [0,1], rounded to 6 places. */
  private[operators] def qualityScore(text: Column): Column = {
    val (lenF, stopF, alphaF) = qualityFactors(text)
    round(lenF * 0.4 + stopF * 0.3 + alphaF * 0.3, 6)
  }

  /** Quality score in [0,1]: length factor, stopword-density factor, and
    * alpha-ratio factor — the usual cheap heuristics, deterministic and
    * oracle-mirrored. Weights sum to 1.
    */
  def quality(docs: DataFrame): DataFrame = {
    val (lenFactor, stopFactor, alphaFactor) = qualityFactors(col("text"))
    docs.select(
      col("doc_id"),
      round(lenFactor, 6).as("len_factor"),
      round(stopFactor, 6).as("stop_factor"),
      round(alphaFactor, 6).as("alpha_factor"),
      round(lenFactor * 0.4 + stopFactor * 0.3 + alphaFactor * 0.3, 6).as("quality"))
  }

  /** Deterministic content-addressed train/valid/test split (80/10/10): the
    * assignment is a pure function of doc_id via the shared 60-bit md5 hash,
    * so it is reproducible across runs, engines, and cluster sizes — the
    * property a training-data pipeline needs so that re-ingesting a corpus
    * never migrates documents between splits. Narrow, shuffle-free,
    * codegen'd.
    */
  /** 80/10/10 split label as a pure function of doc_id — shared with
    * [[CleanCorpus]] so the pipeline's assignment is the standalone one.
    */
  private[operators] def splitAssign(docId: Column): Column = {
    val bucket = TF.hash60(docId.cast("string")) % 100
    when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
  }

  def split(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      splitAssign(col("doc_id")).as("split"))

  /** Content fingerprints: exact hash + order-insensitive token-set hash. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(trim(col("text")).cast("binary")).as("content_hash"),
      TF.fingerprint(col("text")).as("token_set_hash"))

  /** Repetition signals — the Gopher/MassiveText-style rules that catch
    * degenerate boilerplate and looping generations: distinct-token ratio
    * and the most-frequent word-bigram's share of all bigrams.
    *
    * Scale shape: token multiplicity is counted INSIDE each row by the
    * one-pass native [[graft.functions.RepetitionStats]] expression, never
    * via explode + groupBy — exploding would shuffle every token of the
    * corpus to count something that is a per-document property. Narrow,
    * shuffle-free, pipelined with the scan.
    */
  def repetition(docs: DataFrame): DataFrame = {
    // The struct is evaluated ONCE per row behind an alias, with the five
    // derived columns extracting fields from the alias in a second
    // projection. Writing `st.getField(...)` five times in one select would
    // instantiate five copies of the (interpreted) tokenize-and-count pass
    // per row; the aliased form relies on CollapseProject's non-cheap
    // duplication guard (SPARK-36718) to keep the two projections stacked —
    // asserted by the single-occurrence plan check in TextRepetitionSpec.
    val withR = docs.select(col("doc_id"),
      graft.functions.RepetitionStats(col("text")).as("r"))
    val nTok = col("r.n_tokens")
    val maxBg = col("r.max_bigram_count")
    withR.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      round(col("r.n_distinct_tokens").cast("double") / nTok.cast("double"), 6)
        .as("distinct_ratio"),
      maxBg.as("max_bigram_count"),
      round(when(nTok >= 2, maxBg.cast("double") / (nTok - 1).cast("double"))
        .otherwise(0.0), 6).as("top_bigram_frac"))
  }

  /** Conservative email pattern shared by the Spark and DuckDB sides —
    * deliberately restricted to constructs with identical semantics in Java
    * regex and RE2 (character classes, +, bounded repetition; no
    * backreferences, no lookaround).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII scrubbing (email redaction): per-document redaction count and the
    * md5 of the redacted text (hash, not body — keeps the driver compare
    * narrow). Narrow per-row regex work, shuffle-free, pipelined with the
    * scan — the shape of every scrubbing pass over a 100 TB corpus.
    */
  def redactEmails(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      md5(regexp_replace(col("text"), EmailRe, "[EMAIL]").cast("binary"))
        .as("redacted_hash"))

  /** Probe augmentation for the driver check: residue docs get a
    * deterministic email appended, so the redaction row is structurally
    * non-vacuous (the synthetic corpus contains no natural emails).
    */
  val RedactProbeResidue = 13

  def redactProbeAugmented(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(col("doc_id") % 100 === RedactProbeResidue,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com")))
        .otherwise(col("text")))

  /** Per-language sampling rates in basis points of 10000 — the
    * rebalance-by-language step of corpus assembly (upsample scarce
    * languages, downsample the dominant one). Languages not listed keep
    * [[DefaultSampleBp]].
    */
  val SampleRatesBp: Seq[(String, Int)] =
    Seq("en" -> 10000, "de" -> 5000, "fr" -> 5000, "es" -> 2500, "zh" -> 2500)
  val DefaultSampleBp = 1000

  /** Salt distinguishing the sampling hash from the split hash — the sample
    * must be independent of train/valid/test assignment.
    */
  val SampleSalt = "sample:"

  /** Deterministic stratified (per-language) sampling: keep a document iff
    * its content-addressed bucket falls under its language's rate. Like
    * [[split]], the decision is a pure function of doc_id — reproducible
    * across runs, engines, and cluster sizes, and stable under corpus
    * growth (a document's verdict never changes when neighbors arrive).
    * Narrow, shuffle-free, codegen'd — a filter that pipelines with the
    * scan at any scale.
    */
  def sampleStratified(docs: DataFrame): DataFrame = {
    val bucket = TF.hash60(concat(lit(SampleSalt), col("doc_id").cast("string"))) % 10000
    val rate = SampleRatesBp.foldRight(lit(DefaultSampleBp)) { case ((l, bp), rest) =>
      when(col("lang") === l, bp).otherwise(rest)
    }
    docs.select(col("doc_id"), col("lang"), bucket.as("sample_bucket"))
      .filter(col("sample_bucket") < rate)
  }

  /** Tokens per packed training sequence and the shard fan-out for
    * [[packSequences]]. 512 is sized to the synthetic docs (~60-120 tokens);
    * a real pipeline passes its context length.
    */
  val PackBudget = 512L
  val PackShards = 8
  val PackSalt = "pack:"

  /** Deterministic concat-and-chunk sequence packing: documents are dealt
    * into [[PackShards]] content-addressed shards, concatenated in doc_id
    * order within each shard, and the token stream is cut every
    * `budget` tokens; each document reports the chunk its first token lands
    * in and its offset inside that chunk (documents may straddle a cut —
    * the standard concat-then-chunk training layout).
    *
    * Scale shape: ONE shuffle (hash-partition by shard) and a per-shard
    * running sum — the window never sees more than corpus/shards rows, and
    * shard count is the parallelism dial (a real cluster raises it so each
    * shard's window state fits one task). All integer arithmetic — exact
    * under any engine.
    */
  def packSequences(docs: DataFrame, budget: Long = PackBudget,
      shards: Int = PackShards): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs.select(col("doc_id"),
        (TF.hash60(concat(lit(PackSalt), col("doc_id").cast("string")))
          % shards).as("shard"),
        TF.nTokens(col("text")).cast("long").as("n_tokens"))
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        // integral `div`, not `/` (long / long is a DOUBLE division in
        // Spark — lossy past 2^53, and the oracle's // is integral)
        expr(s"start div ${budget}L").as("chunk_id"),
        (col("start") % budget).as("chunk_offset"))
  }

  /** Per-document top-k terms by TF-IDF (smoothed idf = ln((N+1)/(df+1))+1).
    *
    * The inherently-shuffling text operator, shaped for scale: term
    * frequencies aggregate map-side before the (doc_id, term) shuffle; the
    * document-frequency table derives from the ALREADY AGGREGATED tf frame
    * (one row per (doc, term)), so the corpus explodes once and df costs one
    * vocabulary-sized aggregation — no second explode, no extra distinct
    * shuffle. The corpus cardinality N joins in as a broadcast single-row
    * aggregate, keeping construction lazy (no driver-side action); the
    * tf x idf join is a plain equi-join on term that AQE can re-plan
    * (vocabulary tables are often broadcastable after aggregation, but that
    * is a runtime size call, not a structural one — no forced broadcast
    * here); the per-doc top-k is a windowed row_number over
    * (score desc, term) — a total order, so ties cannot make the result
    * nondeterministic.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val nDf = docs.select(countDistinct(col("doc_id")).as("n"))
    val tokens = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
    val tf = tokens.groupBy("doc_id", "term").agg(count("*").as("tf"))
    val df = tf.groupBy("term").agg(count("*").as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDf))
      .withColumn("score",
        round(col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
  }

  /** Corpus vocabulary head: the top-k tokens by total term frequency, with
    * document frequency — the first pass of any tokenizer/vocab build over a
    * training corpus.
    *
    * Scale shape: the explode is corpus-sized but feeds a partially-
    * aggregated groupBy — each mapper emits at most its distinct-token
    * count (vocabulary-sized, not token-count-sized) into the one shuffle.
    * `countDistinct(doc_id)` plans as a two-phase distinct aggregate on
    * (token, doc_id), also map-side-combined. The final top-k is a
    * TakeOrderedAndProject over vocabulary-sized data with a total order
    * (tf desc, token) so ties cannot reorder across engines.
    */
  val VocabTopK = 50

  def vocabTopK(docs: DataFrame, k: Int = VocabTopK): DataFrame =
    docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)

  /** Corpus token accounting by (lang, split) — the report every training
    * run starts with: how many documents and tokens each language
    * contributes to each split, for mixture-weight and budget planning.
    * Reuses [[splitAssign]] so the accounting matches the actual split
    * assignment. All-integer, one map-side-combined shuffle over a
    * langs×3 key space — trivially small at any corpus size.
    */
  def tokenBudget(docs: DataFrame): DataFrame =
    docs.select(col("lang"), splitAssign(col("doc_id")).as("split"),
        TF.nTokens(col("text")).cast("long").as("n_tokens"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"), col("split"))

  private val AsciiLower = "abcdefghijklmnopqrstuvwxyz"

  /** Canonical text normalization — the dedup/matching preprocessor every
    * corpus pipeline runs before hashing: ASCII case-fold (explicit
    * `translate` A-Z→a-z, NOT locale/Unicode lowercasing, so both engines
    * fold the identical 26 letters), non-[a-z0-9 ] codepoints to spaces,
    * whitespace collapsed, trimmed. Emits the canonical form's hash plus
    * its length/token count (post-scrub the text is pure ASCII, so
    * UTF-16-code-unit vs codepoint length cannot diverge). Narrow,
    * shuffle-free, codegen'd — pipelines with the scan at any scale.
    */
  /** The canonical collapsed form of `text` — ONE spelling shared by
    * [[normalize]] and [[normHashCol]].
    */
  private def collapsedCol: Column = {
    val lowered = translate(col("text"), AsciiLower.toUpperCase, AsciiLower)
    trim(regexp_replace(regexp_replace(lowered, "[^a-z0-9 ]", " "), " +", " "))
  }

  /** Column form of [[normalize]]'s norm_hash — for callers (the dedup
    * cascade attribution) that fold it into a wider single-pass
    * projection instead of a standalone frame.
    */
  private[graft] def normHashCol: Column = md5(collapsedCol.cast("binary"))

  def normalize(docs: DataFrame): DataFrame = {
    val collapsed = collapsedCol
    docs.select(col("doc_id"),
      md5(collapsed.cast("binary")).as("norm_hash"),
      length(collapsed).as("n_chars_norm"),
      TF.nTokens(collapsed).as("n_tokens_norm"))
  }

  /** A word bigram is "common" when it appears in at least this many
    * documents; [[bigramNovelty]]'s boilerplate signal counts, per document,
    * the ppm share of its distinct bigrams that are corpus-common.
    */
  val BigramCommonDf = 3

  /** Corpus-bigram novelty — the cheap LM-free boilerplate detector: a
    * document whose bigrams are mostly corpus-common is template/boilerplate
    * text; one whose bigrams are mostly unique is novel prose. All-integer
    * scoring (ppm via integral division) so both engines agree exactly.
    *
    * Scale shape: the inverted-index pattern (like [[tfidfTopTerms]]),
    * never all-pairs — per-doc DISTINCT bigrams explode once into 8-byte
    * hash keys; document frequency is ONE map-side-combined aggregation of
    * that posting list; the df table joins back to the postings on the same
    * bigram-hash key (AQE broadcasts it when the vocabulary head is small
    * enough, a runtime size call); the per-doc rollup re-keys by doc_id.
    * State never exceeds vocabulary + postings — the same asymptotics as
    * any distributed TF-IDF/vocab build.
    */
  def bigramNovelty(docs: DataFrame, minDf: Int = BigramCommonDf): DataFrame = {
    // one-pass native shingle hashing (the ShingleHash60 rule — the
    // composed transform/md5 spelling re-inlines tokenization after
    // projection collapse), and the postings feed BOTH the df aggregation
    // and the rejoin, so cache the materialized (doc_id, bh) pairs (the
    // ngramJaccard sets rule). Composed + uncached this benched 13.5 s at
    // sf0.1; native + cached it is ~1 s.
    val bg = Caching.cached(docs
      .select(col("doc_id"),
        explode(graft.functions.ShingleHash60(col("text"), 2)).as("bh")))
    val dfc = bg.groupBy(col("bh")).agg(count(lit(1)).as("df"))
    val scored = bg.join(dfc, Seq("bh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_common"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(expr("n_common * 1000000L div n_bigrams"), lit(0L))
          .as("common_ppm"))
  }
}

/** DuckDB oracle SQL for [[TextAnalysis] ]— same formulas. */
object TextAnalysisSql {

  /** Mirror of [[TextAnalysis.tokenPositions]]: unnest with a 1-based
    * lambda index (the documented DuckDB convention) shifted to the
    * generator's 0-based positions.
    */
  val tokenPositionsSql: String =
    s"""SELECT doc_id, CAST(s['i'] AS INT) AS pos, s['t'] AS token
       |FROM (SELECT doc_id,
       |        unnest(list_transform(${TS.tokens("text")},
       |          (x, i) -> {'i': i - 1, 't': x})) AS s
       |      FROM documents)
       |ORDER BY doc_id, pos""".stripMargin

  /** Mirror of [[TextAnalysis.phraseSearch]]: the same posting-list
    * intersection over the unnest-with-index token form.
    */
  def phraseSearchSql(phrase: Seq[String] = TextAnalysis.PhraseTerms): String = {
    val tok =
      s"""tok AS (
         |  SELECT doc_id, CAST(s['i'] AS INT) AS pos, s['t'] AS token
         |  FROM (SELECT doc_id,
         |          unnest(list_transform(${TS.tokens("text")},
         |            (x, i) -> {'i': i - 1, 't': x})) AS s
         |        FROM documents))""".stripMargin
    val branches = phrase.zipWithIndex.map { case (t, i) =>
      s"t$i AS (SELECT doc_id, pos - $i AS start FROM tok WHERE token = '$t')"
    }
    val joins = (1 until phrase.length)
      .map(i => s"JOIN t$i USING (doc_id, start)").mkString(" ")
    s"""WITH $tok,
       |${branches.mkString(",\n")}
       |SELECT t0.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       |       min(t0.start) AS first_pos
       |FROM t0 $joins
       |GROUP BY t0.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  val tokenStatsSql: String =
    s"""SELECT doc_id,
       |  length(text) AS n_chars,
       |  ${TS.nTokens("text")} AS n_ws_tokens,
       |  len(regexp_extract_all(text, '\\w+')) AS n_word_tokens,
       |  len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
       |  CAST(ceil(length(regexp_replace(text, '[^\\w]', '', 'g')) / 4.0)
       |       + len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_bpe_est
       |FROM documents ORDER BY doc_id""".stripMargin

  val vocabTopKSql: String =
    s"""SELECT token, CAST(count(*) AS BIGINT) AS tf,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |FROM (SELECT doc_id, unnest(${TS.tokens("text")}) AS token FROM documents)
       |WHERE token <> ''
       |GROUP BY token ORDER BY tf DESC, token LIMIT ${TextAnalysis.VocabTopK}""".stripMargin

  /** Mirror of [[TextAnalysis.splitAssign]]. */
  private[operators] def splitAssignSql(docId: String): String =
    s"""CASE WHEN ${TS.hash60(s"CAST($docId AS VARCHAR)")} % 100 < 80 THEN 'train'
       |     WHEN ${TS.hash60(s"CAST($docId AS VARCHAR)")} % 100 < 90 THEN 'valid'
       |     ELSE 'test' END""".stripMargin

  val splitSql: String =
    s"""SELECT doc_id, lang,
       |  ${splitAssignSql("doc_id")} AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  val langIdSql: String = {
    val scores = TS.langScores("text")
      .map { case (l, s) => s"$s AS score_$l" }.mkString(",\n  ")
    s"""SELECT doc_id, lang AS lang_labeled,
       |  ${TS.langPredict("text")} AS lang_pred,
       |  $scores
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** The three factor expressions over a SQL text expr — the mirror of
    * [[TextAnalysis.qualityFactors]], shared with [[CleanCorpusSql]].
    */
  private[operators] def qualityFactorsSql(text: String): (String, String, String) = {
    val nTok = s"CAST(${TS.nTokens(text)} AS DOUBLE)"
    val stopHits = Seq(" the ", " a ", " and ", " of ", " to ")
      .map(m => TS.markerCount(s"(' ' || $text || ' ')", m))
      .mkString("CAST((", " + ", ") AS DOUBLE)")
    val alpha = s"CAST(length(regexp_replace($text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
    val lenF = s"least($nTok / 64.0, 1.0)"
    val stopF = s"least($stopHits / greatest($nTok, 1.0) * 10.0, 1.0)"
    val alphaF = s"$alpha / greatest(CAST(length($text) AS DOUBLE), 1.0)"
    (lenF, stopF, alphaF)
  }

  /** Mirror of [[TextAnalysis.qualityScore]]. */
  private[operators] def qualityScoreSql(text: String): String = {
    val (lenF, stopF, alphaF) = qualityFactorsSql(text)
    s"round($lenF * 0.4 + $stopF * 0.3 + $alphaF * 0.3, 6)"
  }

  val qualitySql: String = {
    val (lenF, stopF, alphaF) = qualityFactorsSql("text")
    s"""SELECT doc_id,
       |  round($lenF, 6) AS len_factor,
       |  round($stopF, 6) AS stop_factor,
       |  round($alphaF, 6) AS alpha_factor,
       |  round($lenF * 0.4 + $stopF * 0.3 + $alphaF * 0.3, 6) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val fingerprintsSql: String =
    s"""SELECT doc_id, md5(trim(text)) AS content_hash,
       |       ${TS.fingerprint("text")} AS token_set_hash
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Mirror of [[TextAnalysis.repetition]]: the mode-bigram count is
    * re-derived as max(per-distinct-bigram filter length) — an independent
    * formulation of the same multiplicity the Spark side gets from its
    * sorted run-length fold.
    */
  val repetitionSql: String =
    s"""WITH t AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM documents),
       |bg AS (
       |  SELECT doc_id, __t,
       |    CASE WHEN len(__t) >= 2
       |      THEN list_max(list_transform(list_distinct(${TS.shingles("text", 2)}),
       |             b -> len(list_filter(${TS.shingles("text", 2)}, x -> x = b))))
       |      ELSE 0 END AS max_bigram_count
       |  FROM t)
       |SELECT doc_id,
       |  len(__t) AS n_tokens,
       |  round(CAST(len(list_distinct(__t)) AS DOUBLE) / len(__t), 6) AS distinct_ratio,
       |  CAST(max_bigram_count AS BIGINT) AS max_bigram_count,
       |  CASE WHEN len(__t) >= 2
       |    THEN round(CAST(max_bigram_count AS DOUBLE) / (len(__t) - 1), 6)
       |    ELSE 0.0 END AS top_bigram_frac
       |FROM bg ORDER BY doc_id""".stripMargin

  /** Mirror of [[TextAnalysis.redactEmails]] over the probe-augmented
    * corpus ([[TextAnalysis.redactProbeAugmented]]).
    */
  val redactEmailsSql: String = {
    // DuckDB single-quoted strings keep backslashes literal — embed as-is
    val re = TextAnalysis.EmailRe
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 100 = ${TextAnalysis.RedactProbeResidue}
       |      THEN text || ' contact user' || doc_id || '@example.com'
       |      ELSE text END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$re')) AS n_emails,
       |  md5(regexp_replace(text, '$re', '[EMAIL]', 'g')) AS redacted_hash
       |FROM aug ORDER BY doc_id""".stripMargin
  }

  /** Mirror of [[TextAnalysis.sampleStratified]] — same salt, same rates. */
  val sampleStratifiedSql: String = {
    val rate = TextAnalysis.SampleRatesBp
      .map { case (l, bp) => s"WHEN lang = '$l' THEN $bp" }
      .mkString("CASE ", " ", s" ELSE ${TextAnalysis.DefaultSampleBp} END")
    val bucket =
      s"${TS.hash60(s"('${TextAnalysis.SampleSalt}' || CAST(doc_id AS VARCHAR))")} % 10000"
    s"""SELECT doc_id, lang, $bucket AS sample_bucket
       |FROM documents
       |WHERE $bucket < ($rate)
       |ORDER BY doc_id""".stripMargin
  }

  /** Mirror of [[TextAnalysis.packSequences]] — same salt, shards, budget;
    * integral arithmetic end-to-end on both sides.
    */
  val packSequencesSql: String = {
    val b = TextAnalysis.PackBudget
    s"""WITH sharded AS (
       |  SELECT doc_id,
       |    ${TS.hash60(s"('${TextAnalysis.PackSalt}' || CAST(doc_id AS VARCHAR))")}
       |      % ${TextAnalysis.PackShards} AS shard,
       |    CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens
       |  FROM documents),
       |cum AS (
       |  -- DuckDB sum() is HUGEINT; pin BIGINT so // stays integral
       |  SELECT *, CAST(sum(n_tokens) OVER (
       |      PARTITION BY shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start
       |  FROM sharded)
       |SELECT doc_id, shard, n_tokens,
       |       start // $b AS chunk_id, start % $b AS chunk_offset
       |FROM cum ORDER BY doc_id""".stripMargin
  }

  /** Mirror of [[TextAnalysis.tfidfTopTerms]]. Ranks on the ROUNDED score on
    * both sides, so near-tie float ordering can never diverge between
    * engines.
    */
  def tfidfTopTermsSql(k: Int = 3): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${TS.tokens("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS score
       |  FROM tf JOIN df USING (term), n),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, rank, term, tf, df, score
       |FROM ranked WHERE rank <= $k
       |ORDER BY doc_id, rank""".stripMargin

  /** Mirror of [[TextAnalysis.tokenBudget]] — same split assignment. */
  val tokenBudgetSql: String =
    s"""SELECT lang, ${splitAssignSql("doc_id")} AS split,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(${TS.nTokens("text")}) AS BIGINT) AS total_tokens
       |FROM documents GROUP BY 1, 2
       |ORDER BY lang, split""".stripMargin

  /** Mirror of [[TextAnalysis.normalize]] — same explicit A-Z translate
    * (DuckDB regexp_replace needs the 'g' flag Spark implies).
    */
  val normalizeSql: String = {
    val collapsed = "trim(regexp_replace(regexp_replace(" +
      "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')," +
      " '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    s"""SELECT doc_id,
       |  md5($collapsed) AS norm_hash,
       |  CAST(length($collapsed) AS INT) AS n_chars_norm,
       |  CAST(${TS.nTokens(collapsed)} AS INT) AS n_tokens_norm
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Mirror of [[TextAnalysis.bigramNovelty]] — same hash, same df
    * threshold, same integral ppm.
    */
  def bigramNoveltySql(minDf: Int = TextAnalysis.BigramCommonDf): String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${TS.tokens("text")} AS __t FROM documents
       |  WHERE ${TS.nTokens("text")} >= 2),
       |bg AS (
       |  SELECT doc_id, ${TS.hash60("bigram")} AS bh FROM (
       |    SELECT doc_id, unnest(list_distinct(${TS.shingles("text", 2)})) AS bigram
       |    FROM toks)),
       |dfc AS (SELECT bh, count(*) AS df FROM bg GROUP BY 1),
       |scored AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(CASE WHEN df >= $minDf THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_common
       |  FROM bg JOIN dfc USING (bh) GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(s.n_bigrams, 0) AS n_bigrams,
       |  coalesce(s.n_common, 0) AS n_common,
       |  CAST(coalesce(s.n_common * 1000000 // s.n_bigrams, 0) AS BIGINT)
       |    AS common_ppm
       |FROM documents d LEFT JOIN scored s USING (doc_id)
       |ORDER BY doc_id""".stripMargin
}
