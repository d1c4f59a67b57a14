package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** The APPLY side of byte-pair encoding — the step [[BpePairs]] trains:
  * take the corpus's top merge candidates (in merge-priority order) and
  * greedily apply them to segment every word, exactly how a trained
  * tokenizer encodes text. Two certified views:
  *
  *  - `text_bpe_encode`: the segmentation of the most frequent words —
  *    (word, cnt, encoded, n_tokens), `encoded` being the space-separated
  *    symbol sequence after all merges.
  *  - `text_bpe_fertility`: the per-source tokens-per-character rate the
  *    encoder induces — THE pretraining-mix health metric (a source whose
  *    fertility is high tokenizes badly and silently eats budget).
  *
  * Merge application is greedy left-to-right, in merge-priority order,
  * over SELF-DELIMITING symbols: every symbol is wrapped as
  * `chr(31) sym chr(30)`, and merge `ab` rewrites the exact symbol pair
  * `⟨a⟩⟨b⟩ → ⟨ab⟩`. The start+end markers are what make plain `replace`
  * correct BPE: a bare space separator would let a merge match the TAIL
  * of a longer symbol (after merging `xx`, the string `xx y` still
  * contains `x y` — a later `xy` merge would corrupt it), while the
  * wrapped form cannot match anything but a whole symbol, and
  * consecutive occurrences (`⟨a⟩⟨a⟩⟨a⟩⟨a⟩`) still merge pairwise
  * left-to-right because no delimiter is shared between matches. Both
  * engines' `replace` scans left-to-right over non-overlapping matches,
  * so the fold is deterministic and identical cross-engine. (Tokens may
  * not contain the two control markers — vacuous for any text corpus.)
  *
  * Scale shape: everything after the one corpus-sized token pass runs on
  * VOCABULARY-sized tables (the [[BpePairs]] discipline) — word counts are
  * map-side combined, the merge list collapses to ONE broadcast row (the
  * counted single-row combine exemption), and the per-word fold costs
  * O(merges × word length) on distinct words only. Fertility folds
  * per-(source, word) occurrence counts (vocab × |sources| rows) against
  * the encoded vocab by hash join — the corpus is never touched twice.
  *
  * Exactness: strings and integer counts end-to-end; the fertility rate is
  * integer ppm (`div` on non-negatives).
  */
object BpeEncode {

  /** Merges applied (top of [[BpePairs.mergeCandidates]]'s total order). */
  val MergeK = 12

  /** Words reported by the segmentation view. */
  val EncTop = 50

  /** Per-(source, word) occurrence counts — the ONE corpus-sized pass. */
  private def sourceWordCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TF.tokens(col("text"))).as("__raw"))
      .select(col("source"), lower(col("__raw")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("occ"))

  /** The merge list as one broadcast row: merges in (freq DESC, pair ASC)
    * priority order, built from the vocab-sized pair table.
    */
  private def mergesRow(wc: DataFrame): DataFrame = {
    val pairs = wc.filter(length(col("word")) >= 2)
      .select(col("cnt"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"),
        col("word"))
      .select(expr("substring(word, i, 2)").as("pair"), col("cnt"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(MergeK)
    pairs.agg(
      expr("transform(sort_array(collect_list(struct(-freq AS nf, pair)))," +
        " x -> x.pair)").as("merges"))
  }

  /** `word` wrapped into self-delimiting single-char symbols
    * (`chr(31) c chr(30)` each), then folded through `merges`; the result
    * still carries the markers ([[presentCol]]/[[nTokensCol]] project them
    * away).
    */
  private def encodedCol: Column =
    expr("aggregate(merges, " +
      "regexp_replace(word, '(.)', concat(chr(31), '$1', chr(30))), " +
      "(acc, m) -> replace(acc, " +
      "concat(chr(31), substring(m, 1, 1), chr(30), " +
      "       chr(31), substring(m, 2, 1), chr(30)), " +
      "concat(chr(31), m, chr(30))))")

  /** The marked fold result as a space-joined human-readable segmentation. */
  private def presentCol: Column =
    expr("replace(replace(replace(__enc, concat(chr(30), chr(31)), ' '), " +
      "chr(31), ''), chr(30), '')")

  /** Symbol count = count of end markers in the fold result. */
  private def nTokensCol: Column =
    expr("CAST(length(__enc) - length(replace(__enc, chr(30), '')) AS BIGINT)")

  /** The encoded vocabulary: (word, cnt, encoded, n_tokens). */
  private[operators] def encodedVocab(docs: DataFrame): DataFrame = {
    val wc = sourceWordCounts(docs)
      .groupBy(col("word")).agg(sum(col("occ")).as("cnt"))
    wc.join(broadcast(mergesRow(wc)))
      .select(col("word"), col("cnt"), encodedCol.as("__enc"))
      .select(col("word"), col("cnt"), presentCol.as("encoded"),
        nTokensCol.as("n_tokens"))
  }

  /** Driver query: segmentation of the [[EncTop]] most frequent words. */
  def encodeDocuments(spark: SparkSession, dir: String): DataFrame =
    encodedVocab(Tables.documents(spark, dir))
      .orderBy(col("cnt").desc, col("word"))
      .limit(EncTop)

  /** Driver query: per-source encoder fertility —
    * (source, words, chars, bpe_tokens, fertility_ppm) where
    * fertility_ppm = tokens per character × 1e6.
    */
  def fertilityDocuments(spark: SparkSession, dir: String): DataFrame =
    fertility(Tables.documents(spark, dir))

  private[operators] def fertility(docs: DataFrame): DataFrame = {
    val sw = sourceWordCounts(docs)
    val wc = sw.groupBy(col("word")).agg(sum(col("occ")).as("cnt"))
    val enc = wc.join(broadcast(mergesRow(wc)))
      .select(col("word"), encodedCol.as("__enc"))
      .select(col("word"), nTokensCol.as("n_tokens"))
    sw.join(enc, Seq("word"))
      .groupBy(col("source"))
      .agg(sum(col("occ")).as("words"),
        sum(col("occ") * length(col("word"))).as("chars"),
        sum(col("occ") * col("n_tokens")).as("bpe_tokens"))
      .select(col("source"), col("words"), col("chars"), col("bpe_tokens"),
        expr("(bpe_tokens * 1000000) div chars").as("fertility_ppm"))
      .orderBy(col("source"))
  }
}

/** DuckDB oracles for [[BpeEncode]] — same tokenization, same merge order,
  * same left-to-right replace fold ([[https://duckdb.org list_reduce]] has
  * no init value, so the spaced word is prepended as the fold seed).
  */
object BpeEncodeSql {
  import BpeEncode._

  /** Shared CTE prefix: per-(source, word) counts, vocab counts, the
    * priority-ordered merge list, and the encoded vocabulary.
    */
  private val encodedVocabCtes: String =
    s"""sw AS (
       |  SELECT source, lower(t) AS word, count(*) AS occ FROM (
       |    SELECT source, unnest(${TS.tokens("text")}) AS t FROM documents)
       |  WHERE t <> '' GROUP BY 1, 2),
       |wc AS (SELECT word, CAST(sum(occ) AS BIGINT) AS cnt FROM sw GROUP BY 1),
       |pairs AS (
       |  SELECT substring(word, CAST(i AS INT), 2) AS pair, cnt
       |  FROM (SELECT word, cnt, unnest(range(1, length(word))) AS i
       |        FROM wc WHERE length(word) >= 2)),
       |cand AS (
       |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS freq
       |  FROM pairs GROUP BY 1
       |  ORDER BY freq DESC, pair LIMIT $MergeK),
       |m AS (SELECT list(pair ORDER BY freq DESC, pair) AS merges FROM cand),
       |enc AS (
       |  SELECT word, cnt,
       |    list_reduce(
       |      list_prepend(
       |        regexp_replace(word, '(.)', chr(31) || '\\1' || chr(30), 'g'),
       |        merges),
       |      (acc, mg) -> replace(acc,
       |        chr(31) || substring(mg, 1, 1) || chr(30) ||
       |        chr(31) || substring(mg, 2, 1) || chr(30),
       |        chr(31) || mg || chr(30))) AS raw
       |  FROM wc CROSS JOIN m)""".stripMargin

  val encodeDocumentsSql: String =
    s"""WITH $encodedVocabCtes
       |SELECT word, cnt,
       |  replace(replace(replace(raw, chr(30) || chr(31), ' '),
       |          chr(31), ''), chr(30), '') AS encoded,
       |  CAST(length(raw) - length(replace(raw, chr(30), '')) AS BIGINT)
       |    AS n_tokens
       |FROM enc ORDER BY cnt DESC, word LIMIT $EncTop""".stripMargin

  val fertilityDocumentsSql: String =
    s"""WITH $encodedVocabCtes,
       |nt AS (
       |  SELECT word,
       |    CAST(length(raw) - length(replace(raw, chr(30), '')) AS BIGINT)
       |      AS n_tokens
       |  FROM enc)
       |SELECT sw.source,
       |  CAST(sum(occ) AS BIGINT) AS words,
       |  CAST(sum(occ * length(sw.word)) AS BIGINT) AS chars,
       |  CAST(sum(occ * n_tokens) AS BIGINT) AS bpe_tokens,
       |  (CAST(sum(occ * n_tokens) AS BIGINT) * 1000000)
       |    // CAST(sum(occ * length(sw.word)) AS BIGINT) AS fertility_ppm
       |FROM sw JOIN nt ON sw.word = nt.word
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
