package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Deterministic global shuffle of a training corpus: the "shuffle once
  * before training" step every large-scale LLM data pipeline ends with.
  * Orders the corpus by a salted content-independent hash of the document
  * id — a reproducible pseudo-random permutation with NO RNG state (the
  * same content-addressed-coin discipline as [[Mixture]]) — and assigns
  * each document its contiguous 1..N training position plus a hash-derived
  * shard for the downstream sharded writer.
  *
  * Scale shape: ONE range shuffle. `orderBy(hash)` alone would still need
  * a global sort, and a `row_number()` window over it would force every
  * row through a single partition — the [[ContiguousId]] scaladoc's
  * pathology. Instead the hash order feeds ContiguousId's three-step
  * (range-repartition + per-partition zipWithIndex + driver-side offsets:
  * one Long per partition crosses the driver, never rows), so position
  * assignment scales exactly like the engine's history-id assignment. The
  * shard column is a pure projection (hash mod shards) — the sharded
  * writer downstream is `partitionBy(shard)` with no extra exchange
  * because shard is a function of the range key already in hand.
  *
  * Determinism: (hv, doc_id) is a TOTAL order (doc_id breaks hash
  * collisions), so the permutation is unique and the oracle reproduces it
  * byte-for-byte — certifying the entire permutation, not a sample.
  */
object GlobalShuffle {

  /** Shards for the downstream writer: 16 is a stand-in for the real
    * deployment's file-count target; the certified property (shard =
    * hash mod shards, consistent with the position order) is shard-count
    * independent.
    */
  val NumShards = 16L

  val ShuffleSalt = "shuf:"

  // shared with ShardManifest (the budget-sharder packs in THIS
  // permutation order — one spelling of the training order)
  private[graft] def hashOf(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TF.hash60(concat(lit(ShuffleSalt), docId.cast("string")))

  /** (doc_id, shard, pos): the permutation over any frame with a doc_id. */
  def shuffled(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), hashOf(col("doc_id")).as("__hv"))
    ContiguousId.assign(hashed, "pos", Seq(col("__hv"), col("doc_id")))
      .select(col("doc_id"), (col("__hv") % NumShards).as("shard"), col("pos"))
  }

  /** Driver query: the training-order permutation of the documents table. */
  def shuffledDocuments(spark: SparkSession, dir: String): DataFrame =
    shuffled(Tables.documents(spark, dir)).orderBy(col("pos"))

  /** Epochs emitted by the multi-epoch form. */
  val NumEpochs = 3

  /** Per-epoch salt prefix — the epoch index INSIDE the salt gives each
    * epoch an independent permutation from the same content-addressed
    * coin family (multi-epoch training wants a different order each pass,
    * reproducibly).
    */
  val EpochSaltPrefix = "shuf:e"

  /** (epoch, doc_id, shard, pos): [[NumEpochs]] independent permutations
    * of the same corpus, each with contiguous per-epoch positions 1..N.
    *
    * Scale shape: STILL one range shuffle for all epochs — rows explode
    * ×epochs (narrow), the range order (epoch, hv, doc_id) makes epochs
    * contiguous, and the per-epoch position is the global contiguous id
    * minus (epoch-1)·N, with N a broadcast single-row count (the
    * text_tfidf shape). E range-shuffles of N rows would do the same
    * work in E exchanges.
    */
  def epochShuffled(docs: DataFrame, epochs: Int = NumEpochs): DataFrame = {
    val ids = docs.select(col("doc_id"))
    val n = ids.agg(count(lit(1)).as("__n"))
    val exploded = ids.join(broadcast(n))
      .select(col("doc_id"), col("__n"),
        explode(sequence(lit(1), lit(epochs))).as("epoch"))
      .withColumn("__hv", TF.hash60(concat(lit(EpochSaltPrefix),
        col("epoch").cast("string"), lit(":"), col("doc_id").cast("string"))))
    ContiguousId.assign(exploded, "gpos",
        Seq(col("epoch"), col("__hv"), col("doc_id")))
      .select(col("epoch").cast("int").as("epoch"), col("doc_id"),
        (col("__hv") % NumShards).as("shard"),
        (col("gpos") - (col("epoch") - 1).cast("long") * col("__n")).as("pos"))
  }

  /** Driver query: the multi-epoch training orders of the documents table. */
  def epochShuffledDocuments(spark: SparkSession, dir: String): DataFrame =
    epochShuffled(Tables.documents(spark, dir)).orderBy(col("epoch"), col("pos"))
}

/** DuckDB oracle for [[GlobalShuffle]] — same salt, same shard modulus,
  * same (hash, doc_id) total order.
  */
object GlobalShuffleSql {

  val shuffledDocumentsSql: String = {
    val hv = TS.hash60(s"('${GlobalShuffle.ShuffleSalt}' || CAST(doc_id AS VARCHAR))")
    s"""WITH h AS (SELECT doc_id, $hv AS hv FROM documents)
       |SELECT doc_id, hv % ${GlobalShuffle.NumShards} AS shard,
       |       row_number() OVER (ORDER BY hv, doc_id) AS pos
       |FROM h ORDER BY pos""".stripMargin
  }

  /** Mirror of [[GlobalShuffle.epochShuffled]] — same per-epoch salt, same
    * shard modulus, same (hv, doc_id) total order per epoch.
    */
  val epochShuffledDocumentsSql: String = {
    val hv = TS.hash60(s"('${GlobalShuffle.EpochSaltPrefix}' || " +
      "CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))")
    s"""WITH e AS (SELECT unnest(range(1, ${GlobalShuffle.NumEpochs + 1})) AS epoch),
       |h AS (SELECT epoch, doc_id, $hv AS hv FROM documents CROSS JOIN e)
       |SELECT CAST(epoch AS INT) AS epoch, doc_id,
       |       hv % ${GlobalShuffle.NumShards} AS shard,
       |       row_number() OVER (PARTITION BY epoch ORDER BY hv, doc_id) AS pos
       |FROM h ORDER BY epoch, pos""".stripMargin
  }
}
