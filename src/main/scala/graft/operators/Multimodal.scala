package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary` columns with
  * typed metadata, plus decode / feature-extraction / frame-sampling plumbing.
  *
  * The codec/model calls themselves are deterministic byte-arithmetic
  * stand-ins — the container has no media libraries; each operator's scaladoc
  * marks the exact swap point — but EVERYTHING the operators emit is
  * integer-exact and fully oracle-certified, and everything around them is
  * real Spark plumbing: schema, batched per-partition execution, column
  * pruning (binary column only touched by the stages that need it).
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

  /** Output schema of the decode stage: long-form, one row per (media row,
    * feature chunk) so EVERY emitted value is hash-comparable row-wise.
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("chunk", IntegerType, nullable = false),
    StructField("feat_milli", LongType, nullable = false)))

  /** Number of feature chunks the decode emits per media row. */
  val DecodeChunks = 8

  /** Batched per-partition decode — the Scala analog of `mapInPandas`: rows
    * are pulled in batches of `batchSize` so a real codec could amortize
    * library/model setup per batch instead of per row.
    *
    * The codec itself is a deterministic byte-arithmetic stand-in (no media
    * libraries in this container — swap `decodeBatch` for a real one), but
    * unlike the former `decodeStub` its ENTIRE output is integer-exact and
    * oracle-certified: dimensions from the payload byte length, and per-chunk
    * features as the milli-scaled mean byte value over exact-division chunk
    * boundaries (`[i·len/8, (i+1)·len/8)`, the same boundary model as
    * [[embed]]). All math is integral — byte sums, `sum*1000 div len` — so no
    * float crosses the engine boundary.
    */
  def decode(media: DataFrame, batchSize: Int = 64): DataFrame = {
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

  /** Batched per-partition resize — same plumbing contract as [[decode]]
    * (a real implementation swaps `resizeBatch` for an image library); the
    * aspect-preserving fit-into-(maxW x maxH) arithmetic is ALL integer
    * (micro-scaled), so the ENTIRE output is oracle-checked: the driver
    * certifies the batching plumbing end-to-end, not just its shape.
    */
  def resize(media: DataFrame, maxW: Int = 224, maxH: Int = 224,
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

  /** Per-chunk feature extraction, fully oracle-certified: an 8-dim
    * embedding where dim i hashes the i-th character chunk of the text
    * (boundaries by exact integer division) — the deterministic stand-in
    * for a per-chunk model embedding (swap the hash for a model call),
    * emitted in long form (doc, dim, feat) so the oracle compares rows,
    * not arrays. Narrow: explode + codegen'd hash, no shuffle.
    */
  def embed(docs: DataFrame, dims: Int = 8): DataFrame = {
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

  /** The batch decode: one call per batch, like a vectorized UDF. ALL
    * integer: per-chunk byte sums over exact-division boundaries, milli-mean
    * by integer division (operands non-negative, so truncation ≡ floor ≡ the
    * oracle's BIGINT `//`). Empty chunks (payload shorter than
    * [[DecodeChunks]] bytes) emit 0.
    */
  private def decodeBatch(batch: Seq[Row]): Seq[Row] =
    batch.flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val len = bytes.length
      val w = len % 640 + 16
      val h = len % 480 + 16
      (0 until DecodeChunks).map { i =>
        val lo = i * len / DecodeChunks
        val hi = (i + 1) * len / DecodeChunks
        var sum = 0L
        var p = lo
        while (p < hi) { sum += (bytes(p) & 0xff); p += 1 }
        val feat = if (hi > lo) sum * 1000L / (hi - lo) else 0L
        Row(id, w, h, i, feat)
      }
    }

  /** Byte-exact media dedup — the blob-store pass of a multimodal
    * pipeline: two media rows are duplicates iff their PAYLOAD BYTES are
    * identical ([[asMedia]]'s content_md5, computed over the binary
    * column), regardless of container metadata or media_type (a mirrored
    * file re-uploaded under a different extension is still the same
    * asset, which is why the key is the bytes hash alone). Keep-min rule
    * and window spelling shared with [[DedupAttribution]]; probe fixture
    * is the byte-exact +[[DedupAttribution.ExactProbeOffset]] family
    * (doc_id % 250 == 3), so duplicate groups exist at every test scale.
    *
    * Scale shape: ONE hash-keyed window over (doc_id, md5, byte_len)
    * rows — media bytes are touched only by the md5 projection and never
    * shuffle; at 100 TB of blobs the exchange carries 48-byte rows.
    */
  def mediaDedupExact(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val aug = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 250 === 3)
        .select((col("doc_id") + DedupAttribution.ExactProbeOffset)
          .as("doc_id"), col("text")))
    val media = asMedia(aug).select(col("doc_id"),
      col("meta.content_md5").as("__h"), col("meta.byte_len").as("byte_len"))
    media
      .select(col("doc_id"),
        min(col("doc_id")).over(Window.partitionBy(col("__h")))
          .as("keeper_id"),
        col("byte_len").cast("long").as("byte_len"))
      .filter(col("doc_id") =!= col("keeper_id"))
      .orderBy(col("doc_id"))
  }
}

/** DuckDB oracle SQL for the expression-level multimodal queries. */
object MultimodalSql {
  import Multimodal.DecodeChunks

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

  /** FULL oracle for [[Multimodal.decode]] — dimensions AND every per-chunk
    * milli-mean feature. Expressed in character space (per-position `ascii`
    * sums), which is byte-identical on this corpus: `MultimodalSpec` asserts
    * the documents are pure ASCII at gate scales, so char positions ≡ UTF-8
    * byte positions and `ascii(c)` ≡ the byte value the Spark side sums.
    * The chunk of position p inverts the exact-division boundaries
    * algebraically: p ∈ [⌊i·len/8⌋, ⌊(i+1)·len/8⌋) ⟺ i = ⌈(p+1)·8/len⌉-1.
    * A chunk spine LEFT JOIN keeps empty chunks (len < 8) at feat 0, the
    * Spark side's guard.
    */
  val decodeSql: String =
    s"""WITH d AS (SELECT doc_id, text,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS len FROM documents),
       |pos AS (SELECT doc_id, text, len,
       |  CAST(unnest(range(len)) AS BIGINT) AS p FROM d),
       |sums AS (
       |  SELECT doc_id,
       |    CAST(((p + 1) * $DecodeChunks + len - 1) // len - 1 AS INT) AS chunk,
       |    CAST(sum(ascii(substring(text, CAST(p AS INT) + 1, 1))) AS BIGINT) AS s,
       |    count(*) AS n
       |  FROM pos GROUP BY 1, 2),
       |spine AS (SELECT doc_id, len,
       |  CAST(unnest(range($DecodeChunks)) AS INT) AS chunk FROM d)
       |SELECT sp.doc_id,
       |  CAST(sp.len % 640 + 16 AS INT) AS width,
       |  CAST(sp.len % 480 + 16 AS INT) AS height,
       |  sp.chunk,
       |  CAST(coalesce(s.s * 1000 // s.n, 0) AS BIGINT) AS feat_milli
       |FROM spine sp LEFT JOIN sums s USING (doc_id, chunk)
       |ORDER BY doc_id, chunk""".stripMargin

  /** Full oracle for [[Multimodal.resize]] — the same micro-scaled
    * integer fit arithmetic.
    */
  def resizeSql(maxW: Int = 224, maxH: Int = 224): String =
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

  /** Full oracle for [[Multimodal.embed]] — same chunk boundaries
    * (exact integer division), same hash32 % 256 per chunk.
    */
  def embedSql(dims: Int = 8): String = {
    import graft.functions.{TextSql => TS}
    val chunk = s"substring(text, CAST((dim * length(text)) // $dims + 1 AS INT), " +
      s"CAST(((dim + 1) * length(text)) // $dims - (dim * length(text)) // $dims AS INT))"
    s"""SELECT doc_id, CAST(dim AS INT) AS dim,
       |  ${TS.hash32(chunk)} % 256 AS feat
       |FROM documents, (SELECT unnest(range($dims)) AS dim)
       |ORDER BY doc_id, dim""".stripMargin
  }

  /** Mirror of [[Multimodal.mediaDedupExact]] — same probe family, same
    * bytes hash (DuckDB md5 hashes the string's UTF-8 bytes, exactly the
    * payload [[Multimodal.asMedia]] encodes), same keep-min window.
    */
  /** Oracle for the streaming media-dedup twin: the distinct payload-hash
    * key set of the same probe-augmented corpus (survivor identity is the
    * key set — the StreamingDedup certification convention).
    */
  val mediaKeySetSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${DedupAttribution.ExactProbeOffset}, text
       |  FROM documents WHERE doc_id % 250 = 3)
       |SELECT DISTINCT md5(text) AS media_md5 FROM aug
       |ORDER BY media_md5""".stripMargin

  val mediaDedupExactSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${DedupAttribution.ExactProbeOffset}, text
       |  FROM documents WHERE doc_id % 250 = 3),
       |m AS (
       |  SELECT doc_id, md5(text) AS h,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
       |  FROM aug),
       |k AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS keeper_id,
       |    byte_len
       |  FROM m)
       |SELECT doc_id, keeper_id, byte_len
       |FROM k WHERE doc_id <> keeper_id
       |ORDER BY doc_id""".stripMargin
}
