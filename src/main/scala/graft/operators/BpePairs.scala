package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** One BPE training step over the corpus: the adjacent character-pair
  * frequencies that drive byte-pair-encoding vocabulary construction, and
  * the top merge candidates by corpus frequency — the primitive a
  * tokenizer-training pipeline iterates ("count pairs, merge the argmax,
  * repeat"). One step is the certifiable unit; the loop is driver-side
  * composition, exactly like [[Similarity]]'s single Lloyd step.
  *
  * Scale shape — pair work runs on the DISTINCT-WORD table, never the
  * corpus: the corpus-sized pass is one map-side-combined word count
  * (tokens → word frequencies, the text_vocab shuffle); pair explosion
  * (positions × 2-char substrings) and the weighted pair aggregation are
  * vocabulary-sized. A 100 TB corpus has a ~10^7-word vocabulary — the
  * pair stage costs the same whether the corpus is 1 GB or 100 TB. The
  * top-[[TopPairs]] fold is a TakeOrdered under the (freq DESC, pair ASC)
  * total order — no global sort.
  *
  * Exactness: counts are integers; pairs are raw 2-char substrings on both
  * engines.
  */
object BpePairs {

  /** Merge candidates reported. */
  val TopPairs = 20

  /** (pair, freq): the top adjacent-pair merge candidates. */
  def mergeCandidates(docs: DataFrame, k: Int = TopPairs): DataFrame = {
    val words = docs
      .select(explode(TF.tokens(col("text"))).as("__raw"))
      .select(lower(col("__raw")).as("word"))
      .filter(length(col("word")) > 0)
    val wc = words.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val pairs = wc.filter(length(col("word")) >= 2)
      .select(col("cnt"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"),
        col("word"))
      .select(expr("substring(word, i, 2)").as("pair"), col("cnt"))
    pairs.groupBy(col("pair")).agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(k)
  }

  /** Driver query: the corpus's top BPE merge candidates. */
  def mergeCandidatesDocuments(spark: SparkSession, dir: String): DataFrame =
    mergeCandidates(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[BpePairs]] — same tokenization, same 1-based pair
  * positions, same (freq DESC, pair ASC) total order.
  */
object BpePairsSql {

  def mergeCandidatesDocumentsSql(k: Int = BpePairs.TopPairs): String =
    s"""WITH words AS (
       |  SELECT lower(t) AS word FROM (
       |    SELECT unnest(${TS.tokens("text")}) AS t FROM documents)
       |  WHERE t <> ''),
       |wc AS (SELECT word, count(*) AS cnt FROM words GROUP BY 1),
       |pairs AS (
       |  SELECT substring(word, CAST(i AS INT), 2) AS pair, cnt
       |  FROM (SELECT word, cnt, unnest(range(1, length(word))) AS i
       |        FROM wc WHERE length(word) >= 2))
       |SELECT pair, CAST(sum(cnt) AS BIGINT) AS freq
       |FROM pairs GROUP BY 1
       |ORDER BY freq DESC, pair LIMIT $k""".stripMargin
}
