package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the incremental twin of
  * [[graft.operators.Dedup.exact]] for ingest-time pipelines: a document
  * whose content hash was already seen within the watermark horizon is
  * dropped at arrival, so downstream (feature extraction, training shards)
  * never processes the duplicate at all.
  *
  * State design: `dropDuplicatesWithinWatermark` keys state by the 128-bit
  * content hash only (never the document body), and the watermark EVICTS
  * each key once it ages out — state is O(distinct docs per horizon), not
  * O(stream). That bounded-state trade is the streaming-correct one: exact
  * global dedup over an unbounded stream would need unbounded state, so the
  * guarantee is scoped to the horizon and the batch operators (exact /
  * MinHash / SimHash) remain the full-corpus pass.
  */
object StreamingDedup {

  /** Distinct-within-horizon documents of a stream with event-time column
    * `ts` and text column `text`.
    */
  def dedupped(docs: DataFrame, horizon: String): DataFrame =
    docs
      .withColumn("content_hash", md5(trim(col("text")).cast("binary")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
