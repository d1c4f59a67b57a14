package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Stage-attributed dedup report — which SCREEN catches each duplicate:
  * every document flagged by any of the cascade's three certified stages
  * (byte-exact content hash, canonical-form normalized hash, MinHash+LSH
  * near-dup), with per-stage flags and the first stage that would have
  * removed it under the cascade's priority (exact → normalized →
  * near-dup). This is the overlap table a pipeline owner reads before
  * choosing which screens to run at 100 TB — a near-dup pass is ~100×
  * the cost of the hash passes, and this report shows exactly how much
  * of its catch the cheaper screens already cover (the probes make each
  * regime non-vacuous: exact copies are caught by ALL three screens;
  * shouted twins ONLY by the normalized screen — shingles are
  * case-sensitive, so an uppercased twin shares zero shingles with its
  * original and the near-dup screen cannot see it; token-edited pairs
  * ONLY by the near-dup screen).
  *
  * Each stage is the certified operator's spelling VERBATIM:
  * [[Dedup.contentHash]] (`dedup_exact`), the normalized hash grouping
  * of [[Dedup.normalizedDups]] (`dedup_normalized`), and
  * [[Dedup.minhashLsh]] (`dedup_minhash_lsh`) — the r16 instrument
  * discipline. A document is a stage's duplicate iff the stage would
  * remove it: hash stages keep the min doc_id per group; the near-dup
  * stage flags every doc that appears as the larger side (`doc_b`) of a
  * verified pair (the greedy keep-smallest rule — conservative on
  * chains, deterministic, and identical in both engines).
  *
  * Scale shape: two (32-byte key, min-id) map-side-combined shuffles +
  * one join back per hash stage; the near-dup stage is the capped LSH
  * machinery with its pair set collapsing to a distinct id list before
  * the flag join. The corpus is cached once (three stage scans + the
  * flag joins read it).
  *
  * Probe fixture: [[Dedup.normProbeAugmented]]'s shouted twins
  * (+1,000,000; doc_id % 250 == 7), token-edited twins at
  * +[[TokenEditProbeOffset]] (doc_id % 250 == 13, a 'zz ' token
  * prepended — [[Dedup.fuzzyProbeAugmented]]'s +2e6 family's spelling),
  * and byte-exact copies at +[[ExactProbeOffset]] (doc_id % 250 == 3) —
  * offsets follow the per-family probe-id convention (1e6 normalized,
  * 2e6 fuzzy/token-edit, 3e6 containment, 4e6 exact), each applied
  * through [[Dedup.probeId]], which ENFORCES doc_id < 1e6 at row time so
  * a corpus that outgrows the offset spacing fails loudly instead of
  * silently aliasing probe families onto real documents.
  */
object DedupAttribution {

  val ExactProbeOffset = 4000000L
  val TokenEditProbeOffset = 2000000L

  /** [[Dedup.normProbeAugmented]] plus token-edited twins plus byte-exact
    * copies — every cascade stage (and every first_stage regime) provably
    * catches something at every test scale.
    */
  def probeAugmented(docs: DataFrame): DataFrame =
    Dedup.normProbeAugmented(docs)
      .unionAll(docs.filter(col("doc_id") % 250 === 13)
        .select(Dedup.probeId(TokenEditProbeOffset).as("doc_id"),
          concat(lit("zz "), col("text")).as("text")))
      .unionAll(docs.filter(col("doc_id") % 250 === 3)
        .select(Dedup.probeId(ExactProbeOffset).as("doc_id"), col("text")))

  /** (doc_id, exact_dup, norm_dup, near_dup, first_stage) for every doc
    * any stage catches, ordered by doc_id; flags are 0/1 BIGINTs.
    */
  def attribution(docs0: DataFrame): DataFrame = {
    val docs = Caching.cached(probeAugmented(docs0)
      .select(col("doc_id"), col("text")))
    // the ONE (doc_id, content_hash, norm_hash) projection both hash
    // stages read — one pass over the corpus, cached, so the md5s and the
    // normalize chain run once per doc instead of once per dupFlag
    // consumer (each stage reads its keys twice: the keep-min aggregation
    // and the join back)
    val keys = Caching.cached(docs.select(col("doc_id"),
      Dedup.contentHash(col("text")).as("__ck"),
      TextAnalysis.normHashCol.as("__nk")))
    // Both keep-min flags in ONE pass over the cached keys: each stage is
    // a keep-min WINDOW over its hash (the oracle's spelling — one
    // key-partitioned exchange per stage), and the two flags ride the
    // same rows, so the old per-stage frames' doc_id join-back disappears
    // with them (plan index: 14 -> 11 exchanges, 7 -> 4 SMJ vs the
    // groupBy + join-back form). Dup groups are small, so the per-key
    // windows carry no skew a 100 TB run would feel.
    def dupFlag(key: Column, flag: String): Column =
      when(col("doc_id") =!= min(col("doc_id"))
        .over(Window.partitionBy(key)), 1L).otherwise(0L).as(flag)
    val exNm = keys.select(col("doc_id"),
      dupFlag(col("__ck"), "exact_dup"),
      dupFlag(col("__nk"), "norm_dup"))
    val nearIds = Dedup.minhashLsh(docs)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("near_dup", lit(1L))
    exNm
      .join(nearIds, Seq("doc_id"), "left")
      .select(col("doc_id"), col("exact_dup"), col("norm_dup"),
        coalesce(col("near_dup"), lit(0L)).as("near_dup"))
      .filter(col("exact_dup") + col("norm_dup") + col("near_dup") > 0)
      .withColumn("first_stage",
        when(col("exact_dup") === 1L, "exact")
          .when(col("norm_dup") === 1L, "normalized")
          .otherwise("near_dup"))
      .orderBy(col("doc_id"))
  }

  /** Driver query: the cascade attribution of the documents corpus. */
  def attributionDocuments(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[DedupAttribution]] — the same three certified
  * stage spellings over the same augmented corpus, the same greedy
  * doc_b rule and stage priority.
  */
object DedupAttributionSql {

  val attributionDocumentsSql: String = {
    val collapsed = "trim(regexp_replace(regexp_replace(" +
      "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')," +
      " '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    s"""WITH aug AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |    translate(text, 'abcdefghijklmnopqrstuvwxyz',
       |      'ABCDEFGHIJKLMNOPQRSTUVWXYZ') || ' !!!'
       |  FROM documents WHERE doc_id % 250 = 7
       |  UNION ALL
       |  SELECT doc_id + ${DedupAttribution.TokenEditProbeOffset}, 'zz ' || text
       |  FROM documents WHERE doc_id % 250 = 13
       |  UNION ALL
       |  SELECT doc_id + ${DedupAttribution.ExactProbeOffset}, text
       |  FROM documents WHERE doc_id % 250 = 3),
       |ex0 AS (SELECT doc_id, md5(trim(text)) AS k FROM aug),
       |ex AS (
       |  SELECT doc_id, CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY k)
       |    THEN 1 ELSE 0 END AS exact_dup
       |  FROM ex0),
       |nm0 AS (SELECT doc_id, md5($collapsed) AS k FROM aug),
       |nm AS (
       |  SELECT doc_id, CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY k)
       |    THEN 1 ELSE 0 END AS norm_dup
       |  FROM nm0),
       |near AS (
       |  SELECT DISTINCT doc_b AS doc_id
       |  FROM (${DedupSql.minhashLshSql(src = "aug")}) p)
       |SELECT ex.doc_id,
       |  CAST(ex.exact_dup AS BIGINT) AS exact_dup,
       |  CAST(nm.norm_dup AS BIGINT) AS norm_dup,
       |  CAST(CASE WHEN near.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS near_dup,
       |  CASE WHEN ex.exact_dup = 1 THEN 'exact'
       |       WHEN nm.norm_dup = 1 THEN 'normalized'
       |       ELSE 'near_dup' END AS first_stage
       |FROM ex
       |JOIN nm ON ex.doc_id = nm.doc_id
       |LEFT JOIN near ON ex.doc_id = near.doc_id
       |WHERE ex.exact_dup = 1 OR nm.norm_dup = 1 OR near.doc_id IS NOT NULL
       |ORDER BY ex.doc_id""".stripMargin
  }
}
