package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary` columns with
  * typed metadata, plus decode / feature-extraction / frame-sampling plumbing.
  *
  * The real decode step (image/audio codecs) is STUBBED — the container has no
  * media libraries — with a clearly-marked deterministic fake. Everything
  * around it is real Spark plumbing: schema, batched per-partition execution,
  * column pruning (binary column only touched by the stages that need it).
  *
  * This mirrors the reference's own stance on payloads: the MQTT `value` is an
  * opaque LONGBLOB the engine stores and moves but never interprets
  * (/root/reference/mqtt2sql.py:586 — payload hexed straight into the BLOB).
  */
object Multimodal {

  /** Documents reframed as media rows: opaque binary payload + typed metadata.
    * media_type is a deterministic stand-in label (doc_id % 3).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(
        typedLit(Seq("image/png", "audio/wav", "video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("byte_len"),
        md5(encode(col("text"), "UTF-8")).as("content_md5")).as("meta"))

  /** Flat, oracle-comparable projection of [[asMedia]] plus fake decoded
    * dimensions derived deterministically from the payload size.
    */
  def metadata(docs: DataFrame): DataFrame =
    asMedia(docs).select(
      col("doc_id"),
      col("media_type"),
      col("meta.byte_len").as("byte_len"),
      col("meta.content_md5").as("content_md5"),
      (col("meta.byte_len") % 640 + 16).as("fake_width"),
      (col("meta.byte_len") % 480 + 16).as("fake_height"))

  /** Frame sampling: one row per sampled frame with a per-frame content hash.
    * Narrow explode — frames of one media row never leave its partition.
    */
  def frameSample(docs: DataFrame): DataFrame =
    asMedia(docs)
      .withColumn("n_frames", col("meta.byte_len") % 8 + 1)
      .select(col("doc_id"), col("media_type"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("media_type"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * 1000).cast("long").as("frame_ts_ms"))

  /** Audio chunking plumbing: the audio-typed media rows reframed as PCM
    * streams (a deterministic fake sample count — 4 samples per payload
    * byte at a 16 kHz nominal rate; a real pipeline reads the WAV header)
    * and cut into fixed windows with 50% hop — the standard layout feeding
    * ASR/audio-embedding models. ALL-integer boundary math (ceil by
    * add-divide, integral ms), so the entire output is oracle-checked —
    * plumbing included, like the resize stub. Narrow explode: a stream's
    * chunks never leave its partition; the chunk count is
    * samples/hop-proportional, the exact fan-out a real splitter has.
    */
  def audioChunks(docs: DataFrame, rate: Int = 16000, window: Int = 16000,
      hop: Int = 8000): DataFrame = {
    val media = asMedia(docs)
      .filter(col("media_type") === "audio/wav")
      .withColumn("n_samples", (col("meta.byte_len") * 4).cast("long"))
      .withColumn("n_chunks",
        expr(s"(greatest(n_samples - ${window}L, 0L) + ${hop - 1}L) div ${hop}L")
          + lit(1L))
    media
      .select(col("doc_id"), col("n_samples"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * hop).as("start_sample"),
        least(col("chunk_idx") * hop + window, col("n_samples")).as("end_sample"),
        expr(s"chunk_idx * ${hop}L * 1000L div ${rate}L").as("start_ms"))
  }

  /** Output schema of the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Batched per-partition decode — the Scala analog of `mapInPandas`: rows
    * are pulled in batches of `batchSize` so a real codec could amortize
    * library/model setup per batch instead of per row.
    *
    * STUB: the "decode" is a deterministic fake (dimensions and an 8-float
    * feature vector derived from payload bytes). Swap `decodeBatch` for a real
    * codec; the plumbing (schema, batching, partition-locality) is the real
    * contract.
    */
  def decodeStub(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media")).rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch => decodeBatch(batch) }
    }
    spark.createDataFrame(out, decodedSchema)
  }

  /** Output schema of the resize stage. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("out_width", IntegerType, nullable = false),
    StructField("out_height", IntegerType, nullable = false)))

  /** Batched per-partition resize — same plumbing contract as [[decodeStub]]
    * (a real implementation swaps `resizeBatch` for an image library), but
    * the stub's aspect-preserving fit-into-(maxW x maxH) arithmetic is ALL
    * integer (micro-scaled), so unlike the decode features the ENTIRE
    * output is oracle-checkable: the driver certifies the batching plumbing
    * end-to-end, not just its shape.
    */
  def resizeStub(media: DataFrame, maxW: Int = 224, maxH: Int = 224,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media")).rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch => resizeBatch(batch, maxW, maxH) }
    }
    spark.createDataFrame(out, resizedSchema)
  }

  private def resizeBatch(batch: Seq[Row], maxW: Int, maxH: Int): Seq[Row] =
    batch.map { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val w = bytes.length % 640 + 16
      val h = bytes.length % 480 + 16
      // aspect-preserving fit, micro-scaled integer math (never upscale)
      val scale = math.min(1000000L,
        math.min(maxW.toLong * 1000000L / w, maxH.toLong * 1000000L / h))
      Row(id, w, h, (w * scale / 1000000L).toInt, (h * scale / 1000000L).toInt)
    }

  /** Fake feature extraction with a FULL oracle: an 8-dim embedding where
    * dim i hashes the i-th character chunk of the text (boundaries by exact
    * integer division) — the deterministic stand-in for a per-chunk model
    * embedding, emitted in long form (doc, dim, feat) so the oracle compares
    * rows, not arrays. Narrow: explode + codegen'd hash, no shuffle.
    */
  def embedStub(docs: DataFrame, dims: Int = 8): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(dims - 1))).as("dim"))
      .withColumn("__lo", expr(s"(dim * length(text)) div $dims"))
      .withColumn("__len", expr(s"((dim + 1) * length(text)) div $dims - __lo"))
      .select(col("doc_id"), col("dim").cast("int").as("dim"),
        pmod(TF.hash32(expr("substring(text, CAST(__lo + 1 AS INT), CAST(__len AS INT))")),
          lit(256L)).as("feat"))
  }

  /** The stubbed batch decode: one call per batch, like a vectorized UDF. */
  private def decodeBatch(batch: Seq[Row]): Seq[Row] =
    batch.map { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val w = bytes.length % 640 + 16
      val h = bytes.length % 480 + 16
      // deterministic fake features: mean byte value per 1/8th chunk
      val features = (0 until 8).map { i =>
        val lo = i * bytes.length / 8
        val hi = math.max(lo + 1, (i + 1) * bytes.length / 8)
        val slice = bytes.slice(lo, hi)
        if (slice.isEmpty) 0f else slice.map(_ & 0xff).sum.toFloat / slice.length
      }.toArray
      Row(id, w, h, features)
    }
}

/** DuckDB oracle SQL for the expression-level multimodal queries. */
object MultimodalSql {

  val metadataSql: String =
    """SELECT doc_id,
      |  ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |  octet_length(encode(text)) AS byte_len,
      |  md5(text) AS content_md5,
      |  octet_length(encode(text)) % 640 + 16 AS fake_width,
      |  octet_length(encode(text)) % 480 + 16 AS fake_height
      |FROM documents ORDER BY doc_id""".stripMargin

  val frameSampleSql: String =
    """WITH f AS (SELECT doc_id,
      |  ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |  octet_length(encode(text)) % 8 + 1 AS n_frames
      |FROM documents)
      |SELECT doc_id, media_type, unnest(generate_series(0, n_frames - 1)) AS frame_idx,
      |       unnest(generate_series(0, n_frames - 1)) * 1000 AS frame_ts_ms
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Full oracle for [[Multimodal.audioChunks]] — same constants, same
    * integral boundary math (`doc_id % 3 = 1` selects the audio/wav rows).
    */
  def audioChunksSql(rate: Int = 16000, window: Int = 16000,
      hop: Int = 8000): String =
    s"""WITH media AS (
       |  SELECT doc_id,
       |    CAST(octet_length(encode(text)) * 4 AS BIGINT) AS n_samples
       |  FROM documents WHERE doc_id % 3 = 1),
       |chunked AS (
       |  SELECT doc_id, n_samples,
       |    unnest(range(((greatest(n_samples - $window, 0) + ${hop - 1}) // $hop) + 1))
       |      AS chunk_idx
       |  FROM media)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |       CAST(chunk_idx * $hop AS BIGINT) AS start_sample,
       |       CAST(least(chunk_idx * $hop + $window, n_samples) AS BIGINT)
       |         AS end_sample,
       |       CAST(chunk_idx * $hop * 1000 // $rate AS BIGINT) AS start_ms
       |FROM chunked ORDER BY doc_id, chunk_idx""".stripMargin

  /** Partial oracle for the decode stub: the deterministic fake dimensions are
    * a pure function of payload byte length, so (doc_id, width, height) is
    * SQL-expressible; only the `features` array (per-chunk byte means) stays
    * outside the oracle and is dropped from the driver-checked projection.
    */
  val decodeStubSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) % 640 + 16 AS width,
      |  octet_length(encode(text)) % 480 + 16 AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Full oracle for [[Multimodal.resizeStub]] — the same micro-scaled
    * integer fit arithmetic.
    */
  def resizeStubSql(maxW: Int = 224, maxH: Int = 224): String =
    s"""WITH d AS (SELECT doc_id,
       |  CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
       |  CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height
       |FROM documents)
       |SELECT doc_id, width, height,
       |  CAST(width * least(1000000, ($maxW * 1000000) // width,
       |       ($maxH * 1000000) // height) // 1000000 AS INT) AS out_width,
       |  CAST(height * least(1000000, ($maxW * 1000000) // width,
       |       ($maxH * 1000000) // height) // 1000000 AS INT) AS out_height
       |FROM d ORDER BY doc_id""".stripMargin

  /** Full oracle for [[Multimodal.embedStub]] — same chunk boundaries
    * (exact integer division), same hash32 % 256 per chunk.
    */
  def embedStubSql(dims: Int = 8): String = {
    import graft.functions.{TextSql => TS}
    val chunk = s"substring(text, CAST((dim * length(text)) // $dims + 1 AS INT), " +
      s"CAST(((dim + 1) * length(text)) // $dims - (dim * length(text)) // $dims AS INT))"
    s"""SELECT doc_id, CAST(dim AS INT) AS dim,
       |  ${TS.hash32(chunk)} % 256 AS feat
       |FROM documents, (SELECT unnest(range($dims)) AS dim)
       |ORDER BY doc_id, dim""".stripMargin
  }
}
