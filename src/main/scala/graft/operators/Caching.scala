package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.InternalBridge
import org.apache.spark.storage.StorageLevel

/** Plan-reuse caching that does not pin session memory.
  *
  * `Dataset.persist` registers the plan in the session CacheManager, which
  * holds the blocks for the SESSION lifetime unless explicitly unpersisted —
  * a library operator that persists internally therefore leaks its cache to
  * every later query (observed in round 2 as "Asked to cache already cached
  * data" / "Block rdd_97_0 already exists" bench warnings).
  *
  * This helper instead persists the physical plan's RDD directly (Tungsten
  * `InternalRow`s, same storage bytes) and rebuilds a DataFrame over it: the
  * cache is owned by the RDD object, so Spark's ContextCleaner unpersists it
  * automatically once the result frame is garbage-collected — the same
  * pattern [[ContiguousId]] uses for its zipWithIndex input. Rows are copied
  * because scan/codegen output rows are reused buffers.
  */
object Caching {

  def cached(df: DataFrame): DataFrame = cachedWithHandle(df)._1

  /** Like [[cached]] but also returns the persisted RDD so callers that
    * supersede caches in a loop (e.g. [[DedupClusters]]'s label rounds) can
    * unpersist eagerly instead of waiting for GC.
    *
    * Caveat: materializing through the RDD boundary bypasses Dataset
    * actions, so `observe()` metrics in the UPSTREAM plan are not delivered
    * to QueryExecutionListeners for this materialization — run the observed
    * query standalone when its metrics are needed (the driver-contract
    * queries do).
    */
  def cachedWithHandle(df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
    val rdd = InternalBridge.toInternalRdd(df)
      .map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    (InternalBridge.internalCreateDataFrame(df.sparkSession, rdd, df.schema), rdd)
  }
}
