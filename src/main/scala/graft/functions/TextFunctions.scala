package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data-pipeline operators
  * (tokenize, shingle, fingerprint, language-ID, quality scoring), all from
  * Spark built-ins so they stay codegen'd / whole-stage-compiled.
  *
  * Each helper has a DuckDB-SQL mirror in [[TextSql]] generated from the SAME
  * constants, so Spark result and oracle can never drift.
  */
object TextFunctions {

  /** Whitespace tokens of the trimmed text (empty-safe, multi-space-safe). */
  def tokens(text: Column): Column = split(trim(text), " +")

  def nTokens(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles (space-joined); callers must filter docs with fewer
    * than n tokens (Spark's `sequence` would otherwise run backwards).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", (1 to n).map(k => element_at(toks, i + lit(k))): _*))
  }

  /** First 8 hex chars of md5 as a positive int64 in [0, 2^32) — the shared
    * token/shingle hash both engines can compute exactly.
    */
  def hash32(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")

  /** First 15 hex chars of md5 -> 60-bit non-negative int64 (SimHash basis).
    * Native one-pass digest expression; bit-identical to the composed
    * `conv(substring(md5(...)))` spelling the oracle keeps (see [[Hash60]]).
    */
  def hash60(s: Column): Column = Hash60(s)

  /** Content-defined fingerprint: md5 of the sorted distinct token set
    * (the classic "key collision" fingerprint — token-order- and
    * duplicate-insensitive).
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " ").cast("binary"))

  /** Occurrences of literal `marker` via replace-length arithmetic — exact,
    * regex-free, and identical across engines.
    */
  def markerCount(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) / marker.length).cast("int")

  /** Language-ID marker sets: function-word hits per language. Deterministic
    * n-gram-heuristic language ID (see langScores / langPredict).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "es" -> Seq(" el ", " y ", " los "),
    "zh" -> Seq("的", "是", "了"))

  /** All language-ID statistics in ONE pass — scores per language, best,
    * best-vs-second margin, and the argmax label — as a struct column (see
    * [[LangStats]]). Consumers that need several fields should alias this
    * once and extract, the [[RepetitionStats]] pattern.
    */
  def langStats(text: Column): Column = LangStats(text)

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, _) =>
      lang -> LangStats(text).getField(s"score_$lang")
    }

  /** argmax over langScores with fixed priority order (first max wins);
    * "und" (undetermined) when no marker hits at all. One compact native
    * expression — the composed `when`-chain spelling (still what the
    * DuckDB oracle runs, [[TextSql.langPredict]]) re-expanded the 15
    * marker counts per CASE branch and pushed generated methods past
    * Janino's limit inside hash aggregates (see [[LangStats]]).
    */
  def langPredict(text: Column): Column = LangStats(text).getField("pred")
}

/** DuckDB mirrors of [[TextFunctions]] — same formulas, same constants. */
object TextSql {
  def tokens(text: String): String = s"string_split_regex(trim($text), ' +')"

  def nTokens(text: String): String = s"len(${tokens(text)})"

  def shingles(text: String, n: Int): String = {
    val concat = (1 to n).map(k => s"__t[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(len(__t) - ${n - 1}), i -> $concat)"
  }

  def hash32(s: String): String = s"('0x' || substr(md5($s), 1, 8))::BIGINT"

  def hash60(s: String): String = s"('0x' || substr(md5($s), 1, 15))::BIGINT"

  def fingerprint(text: String): String =
    s"md5(array_to_string(list_sort(list_distinct(${tokens(text)})), ' '))"

  def markerCount(text: String, marker: String): String = {
    val esc = marker.replace("'", "''")
    s"CAST((length($text) - length(replace($text, '$esc', ''))) / ${marker.length} AS INT)"
  }

  def langScores(text: String): Seq[(String, String)] = {
    val padded = s"(' ' || $text || ' ')"
    TextFunctions.langMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => markerCount(padded, m)).mkString("(", " + ", ")")
    }
  }

  def langPredict(text: String): String = {
    val scores = langScores(text)
    val total = scores.map(_._2).mkString(" + ")
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores
      .map { case (lang, s) => s"WHEN ($total) > 0 AND $s = $best THEN '$lang'" }
      .mkString(" ")
    s"(CASE $cases ELSE 'und' END)"
  }
}
