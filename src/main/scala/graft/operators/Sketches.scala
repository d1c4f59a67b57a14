package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Sketch-based approximate aggregation — the cardinality shape a 100 TB
  * engine needs when exact distinct counts are too expensive: a distinct
  * count over N rows costs a shuffle of N keys, while a fixed-width sketch
  * costs a shuffle of at most `m` buckets per group, with map-side partial
  * merge, no matter how large N grows.
  *
  * The sketch here is linear (probabilistic) counting [Whang et al. 1990]:
  * hash every value into one of `m` buckets, count the buckets hit, estimate
  * n ~= -m * ln(1 - hits/m). Unlike HyperLogLog's leading-zero registers,
  * the bucket math is pure integer arithmetic on the shared 60-bit md5 hash
  * — bit-identical in any engine, so the driver oracle can verify the SKETCH
  * itself, not just a tolerance band (ln/round parity across Spark and
  * DuckDB is already load-bearing in the TF-IDF oracle).
  */
object Sketches {

  /** Bucket count: 1024 keeps the load factor low at test scale (n/m ~ 0.15,
    * standard error ~1%); a power of two so hits/m is exact in binary and
    * the ln argument cannot differ between engines.
    */
  val LinearCountBuckets = 1024L

  val LinearCountSalt = "lc:"

  /** Per-group approximate distinct count of `valueCol`:
    * (groupCols*, n_buckets_hit, est_distinct).
    *
    * Scale shape: the inner aggregation on (group, bucket) combines
    * map-side, so each mapper emits at most groups x m rows regardless of
    * input size; the outer per-group count is over at most m rows per
    * group. Two narrow shuffles of sketch-sized data — never a shuffle of
    * the raw value domain (the exact-countDistinct cost this replaces).
    */
  /** The shared value -> bucket map (salted 60-bit md5, mod m). */
  def bucketOf(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TF.hash60(concat(lit(LinearCountSalt), value.cast("string"))) % LinearCountBuckets

  /** n ~= -m * ln(1 - hits/m); null when the sketch is saturated (hits = m
    * would take ln(0) — surfaced as undefined rather than an arbitrary
    * number). Shared by the batch operator and the streaming twin so the
    * two can never disagree on the formula.
    *
    * Parity note: `round(ln(x), 6)` carries the known residual 1-ulp
    * cross-engine risk at a 6th-decimal half-way point (the TF-IDF oracle
    * ships the same shape and has stayed green at every sf). The argument
    * domain here is just the m+1 possible hit counts, and the SKETCH itself
    * is certified exactly through the integer `n_buckets_hit` — a spurious
    * est_distinct mismatch would implicate only this derived column.
    */
  def estimate(hits: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val m = LinearCountBuckets
    when(hits < m, round(log(lit(1.0) - hits / m.toDouble) * lit(-m.toDouble), 6))
  }

  def approxDistinct(df: DataFrame, valueCol: String, groupCols: String*): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ bucketOf(col(valueCol)).as("__bucket"): _*)
      .groupBy(g: _*).agg(countDistinct(col("__bucket")).as("n_buckets_hit"))
      .withColumn("est_distinct", estimate(col("n_buckets_hit")))
  }

  /** Driver query: approximate distinct users per event type. */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    approxDistinct(Tables.events(spark, dir), "user_id", "event_type")
      .orderBy(col("event_type"))

  /** Histogram quantile-sketch bin width. 0.25 over the events value domain
    * (~[0, 330]) gives ~1.3k bins — the estimate error is bounded by one bin
    * width, and the bin id is exact integer arithmetic both engines share.
    */
  val QuantileBinWidth = 0.25

  val QuantileQs: Seq[(String, Double)] =
    Seq("p50_est" -> 0.5, "p90_est" -> 0.9, "p99_est" -> 0.99)

  /** Per-group approximate quantiles from a fixed-width histogram: bin every
    * value, cumulative-count the bins, report each quantile as the upper
    * edge of the first bin whose cumulative count reaches q x total (error
    * <= one bin width, one-sided).
    *
    * This is the quantile shape that survives 100 TB where the exact
    * `percentile` (q_percentiles) cannot: exact percentiles sort every value
    * of the group; the histogram shuffles at most (groups x bins) partially-
    * aggregated rows — input-size-independent, like the linear-counting
    * sketch above. The window pass runs on bins-per-group rows, not data.
    * Unlike `approx_percentile`'s KLL sketch, the histogram is deterministic
    * and engine-portable, so the driver oracle verifies the sketch itself.
    */
  def approxQuantiles(df: DataFrame, valueCol: String, groupCols: String*): DataFrame = {
    val g = groupCols.map(col)
    val binned = df
      .select(g :+ floor(col(valueCol) / QuantileBinWidth).as("__bin"): _*)
      .groupBy(g :+ col("__bin"): _*).agg(count(lit(1)).as("__n"))
    quantilesFromBins(binned, groupCols: _*)
  }

  /** The quantile-extraction tail over an already-binned histogram
    * (groupCols..., __bin, __n) — shared with the streaming twin
    * ([[graft.streaming.StreamingQuantiles]]), whose state IS this
    * histogram maintained incrementally. Runs on bins-per-group rows only.
    */
  def quantilesFromBins(binned: DataFrame, groupCols: String*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val cum = binned
      .withColumn("__cum", sum(col("__n")).over(wCum))
      .withColumn("__total", sum(col("__n")).over(wAll))
    val qAggs = QuantileQs.map { case (name, q) =>
      round((min(when(col("__cum").cast("double") >= col("__total").cast("double") * q,
        col("__bin"))) + 1).cast("double") * QuantileBinWidth, 6).as(name)
    }
    cum.groupBy(g: _*)
      .agg(min(col("__total")).as("n_rows"), qAggs: _*)
  }

  /** Driver query: approximate value quantiles per event type. */
  def approxQuantilesByType(spark: SparkSession, dir: String): DataFrame =
    approxQuantiles(Tables.events(spark, dir), "value", "event_type")
      .orderBy(col("event_type"))

  /** KMV sketch size: 64 keeps per-group state at <= 512 bytes while giving
    * ~13% standard error (1/sqrt(k-2)) at ANY cardinality — the driver
    * corpus crosses the k threshold between sf0.001 (15 users/type: exact
    * regime) and sf0.01+ (150+: estimation regime), so both branches are
    * gate-certified.
    */
  val KmvK = 64

  val KmvSalt = "kmv:"

  /** The shared value -> 60-bit hash map of the KMV sketch (salted so its
    * hash stream is independent of the linear-counting sketch's).
    */
  def kmvHashOf(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TF.hash60(concat(lit(KmvSalt), value.cast("string")))

  /** Cardinality estimate from the sketch surface: exact below capacity;
    * (k-1) * 2^60 / kth at capacity (the k-th smallest of n uniform draws
    * on [0, 2^60) sits near k/n of the range). 63 * 2^60 is exactly
    * representable in a double, so both engines fold the numerator to the
    * same constant and the single division is IEEE-identical; the round-6
    * display residual risk is the documented [[estimate]] one, and the
    * SKETCH itself is certified exactly through (n_kept, kth_hash).
    */
  /** The estimate WITHOUT the display rounding — the shared arithmetic:
    * exact count below saturation, (k-1)·2^60/kth above it. Consumed by
    * [[kmvEstimate]] (rounds the saturated branch for the projection) and
    * [[kmvOverlapOf]] (folds the raw value into the intersection product),
    * so the two operators' recipes cannot drift.
    */
  private[graft] def kmvEstimateRaw(nKept: org.apache.spark.sql.Column,
      kth: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(nKept < KmvK, nKept.cast("double"))
      .otherwise(lit((KmvK - 1).toDouble) * lit(1152921504606846976.0) /
        kth.cast("double"))

  def kmvEstimate(nKept: org.apache.spark.sql.Column,
      kth: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(nKept < KmvK, kmvEstimateRaw(nKept, kth))
      .otherwise(round(kmvEstimateRaw(nKept, kth), 6))

  /** Per-group KMV approximate distinct count of `valueCol`:
    * (groupCols*, n_kept, kth_hash, est_distinct).
    *
    * Scale shape: ONE aggregation whose buffer is <= k longs per group —
    * partials combine map-side (bounded set-union), so each mapper emits at
    * most groups x (4 + 8k) bytes regardless of input size, and unlike
    * [[approxDistinct]] the accuracy does not degrade as the true
    * cardinality approaches a fixed bucket count.
    */
  def kmvDistinct(df: DataFrame, valueCol: String, groupCols: String*): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ kmvHashOf(col(valueCol)).as("__hv"): _*)
      .groupBy(g: _*)
      .agg(graft.functions.KmvSketch.agg(col("__hv"), KmvK).as("__kmv"))
      .select(g :+ col("__kmv.n_kept").as("n_kept") :+
        col("__kmv.kth_hash").as("kth_hash"): _*)
      .withColumn("est_distinct", kmvEstimate(col("n_kept"), col("kth_hash")))
  }

  /** Driver query: KMV distinct users per event type. */
  def kmvDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    kmvDistinct(Tables.events(spark, dir), "user_id", "event_type")
      .orderBy(col("event_type"))

  // --- HyperLogLog [Flajolet et al. 2007] ---
  // The third point of the cardinality-sketch family: linear counting
  // saturates near its bucket count, KMV keeps k raw hash values; HLL
  // stores only max-leading-zero REGISTERS — m bytes of state for relative
  // error 1.04/sqrt(m) at ANY cardinality, the industry-standard shape.

  /** m = 64 registers (p = 6 bucket bits): ~13% standard error, 64 bytes of
    * state per group. The remaining 54 hash bits feed the rank.
    */
  val HllBuckets = 64

  val HllRemBits = 54

  val HllSalt = "hll:"

  /** alpha_m * m^2 * 2^55 — the numerator of the raw estimate, folded to
    * ONE double literal shared with the oracle via toString round-trip
    * (exact on both engines), so the only float op on the raw path is a
    * single IEEE division by sum_pow.
    */
  val HllNumerator: Double =
    0.7213 / (1.0 + 1.079 / HllBuckets) * HllBuckets * HllBuckets *
      9007199254740992.0 * 4.0 // 2^53 * 4 = 2^55, kept factored exactly

  /** Per-group HLL registers from a value column: (groupCols*, __bucket,
    * __rho) where rho = leading-zero count of the 54 remaining hash bits,
    * + 1 (in [1, 55]; the all-zero remainder takes 55). `length(bin(x))`
    * is the shared integer log2 both engines evaluate identically — no
    * float anywhere in the register math.
    */
  def hllObservations(df: DataFrame, valueCol: String,
      groupCols: String*): DataFrame = {
    val g = groupCols.map(col)
    val hv = TF.hash60(concat(lit(HllSalt), col(valueCol).cast("string")))
    val rem = hv.bitwiseAND(lit((1L << HllRemBits) - 1))
    df.select(g :+ shiftright(hv, HllRemBits).cast("int").as("__bucket") :+
      when(rem === 0, HllRemBits + 1)
        .otherwise(lit(HllRemBits + 1) - length(bin(rem)))
        .cast("int").as("__rho"): _*)
      .filter(col("__bucket").isNotNull)
  }

  /** The estimate tail over maxed registers (groupCols..., __bucket, __M)
    * — shared with the streaming twin, which maintains the register max
    * incrementally. All certification-bearing columns are exact integers:
    * sum_pow = sum(2^(55 - M_j)) with empty registers contributing 2^55
    * (<= 2^61 total — exact in a long), n_zero_buckets the empty count.
    * The derived est_distinct applies the standard small-range linear-
    * counting correction below 2.5m when empty registers remain.
    */
  def hllFromRegisters(regs: DataFrame, groupCols: String*): DataFrame = {
    val g = groupCols.map(col)
    val m = HllBuckets
    val grouped = regs.groupBy(g: _*).agg(
      count(lit(1)).as("__present"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${HllRemBits + 1} - __M AS INT))"))
        .as("__sum_present"))
    val zeros = (lit(m) - col("__present")).cast("int")
    val sumPow = col("__sum_present") +
      (lit(m.toLong) - col("__present")) * lit(1L << (HllRemBits + 1))
    val raw = lit(HllNumerator) / sumPow.cast("double")
    grouped
      .withColumn("n_zero_buckets", zeros)
      .withColumn("sum_pow", sumPow.cast("long"))
      .withColumn("est_distinct", round(
        when(raw <= lit(2.5 * m) && col("n_zero_buckets") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero_buckets")))
          .otherwise(raw), 6))
      .drop("__present", "__sum_present")
  }

  /** Per-group HLL approximate distinct count of `valueCol`:
    * (groupCols*, n_zero_buckets, sum_pow, est_distinct).
    *
    * Scale shape: identical to [[approxDistinct]]'s two narrow shuffles —
    * the (group, bucket) max combines map-side, so each mapper emits at
    * most groups x m register rows regardless of input size, and the
    * outer fold runs on <= m rows per group.
    */
  def hllDistinct(df: DataFrame, valueCol: String, groupCols: String*): DataFrame = {
    val g = groupCols.map(col)
    val regs = hllObservations(df, valueCol, groupCols: _*)
      .groupBy(g :+ col("__bucket"): _*).agg(max(col("__rho")).as("__M"))
    hllFromRegisters(regs, groupCols: _*)
  }

  /** Driver query: HLL distinct users per event type. */
  def hllDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    hllDistinct(Tables.events(spark, dir), "user_id", "event_type")
      .orderBy(col("event_type"))

  /** Pairwise set-overlap estimation from bottom-k sketches — the
    * theta-sketch workhorse: estimate the Jaccard similarity and
    * intersection cardinality of every pair of per-group key SETS from
    * their bottom-k hash samples alone. The KMV identity: the bottom-k of
    * the UNION is a uniform sample of the union, so the fraction of it
    * present in both sets estimates Jaccard, and intersection ~= J x |A∪B|
    * with |A∪B| from the union's k-th minimum ([[kmvEstimate]]'s formula,
    * same constants/salt as `q_kmv_distinct`).
    *
    * Scale shape: everything runs on KEY-CARDINALITY rows — distinct
    * (group, hash) pairs (one map-side-combined dedup over data, the only
    * data-sized step), then group-pair expansion over the TINY group
    * domain and per-pair ranking of at most |A∪B| hashes. At deployment
    * scale the per-group bottom-k sets come straight out of the KMV UDAF
    * state (O(k) per group); this spelling IS the oracle-exact contract
    * for the pairwise math on top.
    *
    * Below saturation (union < k) the sample is the whole union and both
    * jaccard and intersection are EXACT — the branch both engines mirror,
    * like [[kmvEstimate]]'s own.
    */
  /** The pairwise machinery over a prepared distinct (event_type, hv)
    * frame — shared by the driver query and the spec's synthetic sets.
    */
  private[graft] def kmvOverlapOf(hashes0: DataFrame): DataFrame = {
    val k = KmvK
    // the distinct (group, hash) frame is the only data-sized stage and has
    // THREE consumers (the group domain and both pair sides) — uncached,
    // each replayed the corpus dedup (observed: 19 exchanges in the plan)
    val hashes = Caching.cached(hashes0)
    val types = hashes.select(col("event_type")).distinct()
    // the pair domain is |groups|^2 — tiny by design, but it sits behind
    // the cache's RDD scan where Spark has no size statistics, so the
    // broadcast hints on both pair joins are explicit
    val pairs = types.select(col("event_type").as("type_a"))
      .join(broadcast(types.select(col("event_type").as("type_b"))),
        col("type_a") < col("type_b"))
    val sideA = hashes.join(broadcast(pairs), col("event_type") === col("type_a"))
      .select(col("type_a"), col("type_b"), col("hv"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val sideB = hashes.join(broadcast(pairs), col("event_type") === col("type_b"))
      .select(col("type_a"), col("type_b"), col("hv"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val unioned = sideA.unionAll(sideB)
      .groupBy(col("type_a"), col("type_b"), col("hv"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("type_a"), col("type_b")).orderBy(col("hv"))
    val ranked = unioned.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    val agg = ranked.groupBy(col("type_a"), col("type_b")).agg(
      count(lit(1)).as("n_kept"),
      max(col("hv")).as("theta"),
      sum((col("in_a") * col("in_b")).cast("long")).as("n_common"))
    val jRaw = col("n_common").cast("double") / col("n_kept").cast("double")
    val unionRaw = kmvEstimateRaw(col("n_kept"), col("theta"))
    agg.select(col("type_a"), col("type_b"), col("n_kept"), col("theta"),
        col("n_common"),
        round(jRaw, 6).as("est_jaccard"),
        round(jRaw * unionRaw, 6).as("est_intersection"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Driver query: overlap estimates for every event-type pair's user set.
    * The raw corpus is degenerate for this purpose — every type sees every
    * user, so all pairs report jaccard 1.0 — so two DERIVED groups with
    * arithmetic partial overlap (`__even`: user_id % 2 = 0, `__third`:
    * user_id % 3 = 0, intersection = the %6 users) are unioned in, making
    * the fractional-overlap branch non-vacuous at every scale (the
    * [[Dedup.probeAugmented]] discipline).
    */
  def kmvOverlapByType(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"))
    // two consumers (the even and third carves) of one distinct shuffle
    val derived = Caching.cached(users.select(col("user_id")).distinct())
    val even = derived.filter(col("user_id") % 2 === 0)
      .select(lit("__even").as("event_type"), col("user_id"))
    val third = derived.filter(col("user_id") % 3 === 0)
      .select(lit("__third").as("event_type"), col("user_id"))
    kmvOverlapOf(users.unionAll(even).unionAll(third)
      .select(col("event_type"), kmvHashOf(col("user_id")).as("hv"))
      .distinct())
  }

  /** Register-table MERGE — the property that makes HLL the at-scale
    * distinct sketch: per-shard/per-group register tables union by plain
    * bucket-max into the sketch of the union, with no re-scan of data. A
    * 1000-executor ingest maintains per-partition registers and merges
    * m-row tables at the end; this query certifies that path end-to-end by
    * building PER-GROUP registers first and collapsing them (two
    * register-table-sized steps), against an oracle that sketches the
    * union DIRECTLY — equality IS the mergeability proof, value-exact
    * through the integer (n_zero_buckets, sum_pow) core.
    */
  def hllMergedDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val perGroup = hllObservations(
      Tables.events(spark, dir), "user_id", "event_type")
      .groupBy(col("event_type"), col("__bucket")).agg(max(col("__rho")).as("__M"))
    val merged = perGroup.groupBy(col("__bucket")).agg(max(col("__M")).as("__M"))
    hllFromRegisters(merged)
  }

  // --------------------------------------------------------------------
  // Count-Min sketch [Cormode & Muthukrishnan 2005] — the FREQUENCY
  // complement to the cardinality sketches above: estimate per-key counts
  // from a fixed depth x width counter grid instead of one counter per
  // distinct key. The reference's per-topic row counts
  // (/root/reference/mqtt2sql.py:333-344 keeps exact per-key state) are
  // keyspace-bounded; at 100 TB the key universe itself overwhelms memory
  // and the CMS grid is the standard bounded-state answer: state is
  // depth x width Longs REGARDLESS of cardinality, updates are pure
  // increments (commutative, partial-aggregatable), and every estimate is
  // a provable OVERcount (min over depth rows of colliding-key sums).
  // --------------------------------------------------------------------

  /** Independent hash rows: 4 is the standard error-probability knob
    * (P[overcount > eps*N] <= e^-depth per row independence).
    */
  val CmsDepth = 4

  /** Counters per row. DELIBERATELY small (64) relative to the sketched
    * key domain so collisions — the thing the min-over-rows estimate
    * exists to absorb — actually occur at every certification scale and
    * the oracle certifies real overcounts, not a vacuous est == exact.
    */
  val CmsWidth = 64L

  val CmsSalt = "cms:"

  /** Probe set bound: estimates are reported for keys of users 0..7. */
  val CmsProbeMaxUser = 8L

  /** The sketched key: compound (user_id, event_type) — high enough
    * cardinality that the grid saturates as sf grows (distinct pairs scale
    * with the corpus; the grid never does).
    */
  private def cmsKeyOf(userId: org.apache.spark.sql.Column,
      eventType: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(userId.cast("string"), lit(":"), eventType)

  /** Row-d bucket of a key: salted 60-bit md5 (non-negative), mod width.
    * The depth index is IN the salt, so the rows are independent hashes of
    * the same key — shared with the oracle via the same string recipe.
    */
  private def cmsBucketOf(d: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TF.hash60(concat(lit(CmsSalt), d.cast("string"), lit(":"), key)) % CmsWidth

  /** (d, bucket) hit per input row per depth row — the sketch's input
    * relation. The depth explode multiplies rows by CmsDepth, but the
    * aggregation on (d, bucket) map-side-combines each mapper's output to
    * at most depth x width partials, so the shuffle is grid-sized, not
    * data-sized.
    */
  private[graft] def cmsEntries(keyed: DataFrame): DataFrame =
    keyed
      .select(explode(array((0 until CmsDepth).map(lit(_)): _*)).as("d"),
        col("__cms_key"))
      .select(col("d"), cmsBucketOf(col("d"), col("__cms_key")).as("bucket"))

  /** Rows of any (user_id, event_type) frame carrying the compound key
    * (nulls dropped — no key).
    */
  private[graft] def cmsKeyed(df: DataFrame): DataFrame =
    df.filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"),
        cmsKeyOf(col("user_id"), col("event_type")).as("__cms_key"))

  private[graft] def cmsKeyedEvents(spark: SparkSession, dir: String): DataFrame =
    cmsKeyed(Tables.events(spark, dir))

  /** The counter grid: count per (d, bucket) — at most depth x width rows. */
  private[graft] def cmsSketch(keyed: DataFrame): DataFrame =
    cmsEntries(keyed).groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Estimation tail shared by the batch operator and the streaming twins:
    * probe keys re-hash through the same depth rows, join the grid (a
    * broadcast — the grid is at most depth x width rows by construction),
    * and take the min counter. `est_count >= exact_count` holds by
    * construction; `overcount` materializes the collision error so the
    * oracle certifies the sketch's defining inequality, value-exactly.
    */
  private[graft] def cmsEstimate(sketch: DataFrame, probes: DataFrame): DataFrame =
    probes
      .select(col("user_id"), col("event_type"), col("exact_count"),
        explode(array((0 until CmsDepth).map(lit(_)): _*)).as("d"))
      .withColumn("bucket",
        cmsBucketOf(col("d"), cmsKeyOf(col("user_id"), col("event_type"))))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(col("user_id"), col("event_type"), col("exact_count"))
      .agg(min(col("cnt")).as("est_count"))
      .select(col("user_id"), col("event_type"), col("exact_count"),
        col("est_count"), (col("est_count") - col("exact_count")).as("overcount"))
      .orderBy(col("user_id"), col("event_type"))

  /** Driver query: CMS-estimated vs exact (user, event_type) frequencies
    * for the probe keys. Scale shape: ONE grid-sized aggregation over the
    * data (map-side combined to depth x width partials per task) + one
    * PUSHED-DOWN probe aggregation (`user_id < 8` reaches the scan); the
    * estimate join broadcasts the KB-sized grid. Nothing downstream of the
    * scans is data-sized.
    */
  /** Exact counts for the probe keys — a PUSHED-DOWN aggregation (the
    * `user_id < bound` predicate reaches the scan). Shared by the batch
    * operator and the streaming twins' estimation tails.
    */
  private[graft] def cmsProbes(keyed: DataFrame,
      probeMaxUser: Long = CmsProbeMaxUser): DataFrame =
    keyed.filter(col("user_id") < probeMaxUser)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("exact_count"))

  /** CMS inner-product JOIN-SIZE estimation [Cormode & Muthukrishnan 2005,
    * §4.2] — the cost-based-optimizer primitive: |R ⋈ S| on a key equals
    * the inner product of the two frequency vectors, and the min over
    * depth rows of the grids' per-row inner products is a provable
    * OVERestimate of it. Two grid-sized sketches replace any look at the
    * join itself: at 100 TB the optimizer reads 2 x depth x width counters
    * where the true answer costs the very shuffle it is trying to size.
    *
    * The certified query reports est vs the true join size (one exact
    * pushed-down-count equi-join at certification scale) so the oracle
    * certifies the defining inequality value-exactly, like [[cmsCounts]].
    */
  def cmsJoinSize(left: DataFrame, right: DataFrame): DataFrame = {
    val lg = cmsSketch(left).withColumnRenamed("cnt", "lcnt")
    val rg = cmsSketch(right).withColumnRenamed("cnt", "rcnt")
    // grids are <= depth x width rows: the join and the fold are
    // constant-size work regardless of input
    val est = lg.join(rg, Seq("d", "bucket"))
      .groupBy(col("d"))
      .agg(sum(col("lcnt") * col("rcnt")).as("row_est"))
      .agg(min(col("row_est")).as("est_join_size"))
    val truth = left.select(col("__cms_key").as("k"))
      .join(right.select(col("__cms_key").as("k")), "k")
      .agg(count(lit(1)).as("true_join_size"))
    est.crossJoin(truth)
      .select(col("est_join_size"), col("true_join_size"),
        (col("est_join_size") - col("true_join_size")).as("overcount"))
  }

  /** Driver query: estimated vs true size of the events-history self-join
    * on the compound (user, event_type) key across the time-split halves —
    * a realistic "how big is this join" question (early events x late
    * events per key) whose two sides have genuinely different frequency
    * vectors. The split is on event_id parity: deterministic, mirrored.
    */
  def cmsJoinSizeEvents(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        cmsKeyOf(col("user_id"), col("event_type")).as("__cms_key"))
    cmsJoinSize(base.filter(col("event_id") % 2 === 0),
      base.filter(col("event_id") % 2 =!= 0))
  }

  def cmsCounts(df: DataFrame, probeMaxUser: Long = CmsProbeMaxUser): DataFrame = {
    val keyed = cmsKeyed(df)
    cmsEstimate(cmsSketch(keyed), cmsProbes(keyed, probeMaxUser))
  }

  def cmsUserTypeCounts(spark: SparkSession, dir: String): DataFrame =
    cmsCounts(Tables.events(spark, dir))
}

/** DuckDB oracle for [[Sketches]] — same salt, same bucket count, same
  * estimate formula.
  */
object SketchesSql {

  val approxDistinctUsersSql: String = {
    val m = Sketches.LinearCountBuckets
    val bucket =
      s"${TS.hash60(s"('${Sketches.LinearCountSalt}' || CAST(user_id AS VARCHAR))")} % $m"
    s"""WITH b AS (SELECT event_type, $bucket AS bucket FROM events),
       |h AS (SELECT event_type, count(DISTINCT bucket) AS n_buckets_hit
       |      FROM b GROUP BY 1)
       |SELECT event_type, n_buckets_hit,
       |  CASE WHEN n_buckets_hit < $m
       |    THEN round(-$m * ln(1.0 - n_buckets_hit / $m.0), 6)
       |  END AS est_distinct
       |FROM h ORDER BY event_type""".stripMargin
  }

  /** KMV oracle: DISTINCT salted hashes ranked per group; the bottom-k set
    * a correct sketch must hold is exactly `rn <= k`, so `n_kept` is its
    * size and `kth_hash` the rank-k value. Same salt, same k, same
    * estimate arithmetic as [[Sketches.kmvEstimate]].
    */
  val kmvDistinctUsersSql: String = {
    val k = Sketches.KmvK
    val hv = TS.hash60(s"('${Sketches.KmvSalt}' || CAST(user_id AS VARCHAR))")
    s"""WITH h AS (SELECT DISTINCT event_type, $hv AS hv
       |           FROM events WHERE user_id IS NOT NULL),
       |r AS (SELECT event_type, hv,
       |        row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
       |      FROM h),
       |s AS (SELECT event_type,
       |        CAST(count(*) FILTER (WHERE rn <= $k) AS INT) AS n_kept,
       |        max(CASE WHEN rn = $k THEN hv END) AS kth_hash
       |      FROM r GROUP BY event_type)
       |SELECT event_type, n_kept, kth_hash,
       |  CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
       |    ELSE round(${(k - 1).toDouble} * 1152921504606846976.0 /
       |           CAST(kth_hash AS DOUBLE), 6)
       |  END AS est_distinct
       |FROM s ORDER BY event_type""".stripMargin
  }

  /** HLL oracle: same salted hash, same integer register math (bucket =
    * top 6 bits, rho via `length(bin(rem))`), same folded numerator
    * literal and correction branch as [[Sketches.hllFromRegisters]].
    */
  val hllDistinctUsersSql: String = {
    val m = Sketches.HllBuckets
    val remBits = Sketches.HllRemBits
    val mask = (1L << remBits) - 1
    val pow55 = 1L << (remBits + 1)
    val hv = TS.hash60(s"('${Sketches.HllSalt}' || CAST(user_id AS VARCHAR))")
    s"""WITH h AS (SELECT event_type, $hv AS hv
       |           FROM events WHERE user_id IS NOT NULL),
       |b AS (SELECT event_type, hv >> $remBits AS bucket,
       |        CASE WHEN (hv & $mask) = 0 THEN ${remBits + 1}
       |          ELSE ${remBits + 1} - length(bin(hv & $mask)) END AS rho
       |      FROM h),
       |r AS (SELECT event_type, bucket, max(rho) AS M FROM b GROUP BY 1, 2),
       |s AS (SELECT event_type,
       |        CAST($m - count(*) AS INT) AS n_zero_buckets,
       |        CAST(sum(CAST(1 AS BIGINT) << (${remBits + 1} - M)) +
       |             ($m - count(*)) * CAST($pow55 AS BIGINT) AS BIGINT) AS sum_pow
       |      FROM r GROUP BY 1),
       |e AS (SELECT event_type, n_zero_buckets, sum_pow,
       |        ${Sketches.HllNumerator} / CAST(sum_pow AS DOUBLE) AS raw
       |      FROM s)
       |SELECT event_type, n_zero_buckets, sum_pow,
       |  round(CASE WHEN raw <= ${2.5 * m} AND n_zero_buckets > 0
       |    THEN $m.0 * ln($m.0 / n_zero_buckets) ELSE raw END, 6) AS est_distinct
       |FROM e ORDER BY event_type""".stripMargin
  }

  /** Overlap oracle: same distinct-hash construction, same union ranking,
    * same exact-below-saturation branch and estimate arithmetic.
    */
  val kmvOverlapByTypeSql: String = {
    val k = Sketches.KmvK
    val hv = TS.hash60(s"('${Sketches.KmvSalt}' || CAST(user_id AS VARCHAR))")
    s"""WITH keyed AS (
       |  SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL
       |  UNION ALL
       |  SELECT '__even', user_id FROM
       |    (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
       |  WHERE user_id % 2 = 0
       |  UNION ALL
       |  SELECT '__third', user_id FROM
       |    (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
       |  WHERE user_id % 3 = 0),
       |hashes AS (
       |  SELECT DISTINCT event_type, $hv AS hv FROM keyed),
       |types AS (SELECT DISTINCT event_type FROM hashes),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b
       |  FROM types a JOIN types b ON a.event_type < b.event_type),
       |unioned AS (
       |  SELECT type_a, type_b, hv,
       |    max(in_a) AS in_a, max(in_b) AS in_b
       |  FROM (
       |    SELECT p.type_a, p.type_b, h.hv, 1 AS in_a, 0 AS in_b
       |    FROM pairs p JOIN hashes h ON h.event_type = p.type_a
       |    UNION ALL
       |    SELECT p.type_a, p.type_b, h.hv, 0 AS in_a, 1 AS in_b
       |    FROM pairs p JOIN hashes h ON h.event_type = p.type_b)
       |  GROUP BY 1, 2, 3),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY type_a, type_b
       |    ORDER BY hv) AS rn
       |  FROM unioned),
       |agg AS (
       |  SELECT type_a, type_b, count(*) AS n_kept, max(hv) AS theta,
       |    CAST(sum(in_a * in_b) AS BIGINT) AS n_common
       |  FROM ranked WHERE rn <= $k GROUP BY 1, 2)
       |SELECT type_a, type_b, n_kept, theta, n_common,
       |  round(CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE), 6)
       |    AS est_jaccard,
       |  round(CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE) *
       |    (CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
       |      ELSE ${(k - 1).toDouble} * 1152921504606846976.0 /
       |        CAST(theta AS DOUBLE) END), 6) AS est_intersection
       |FROM agg ORDER BY type_a, type_b""".stripMargin
  }

  /** Mergeability oracle: the sketch of the UNION, built directly — the
    * merged per-group registers must equal it exactly (bucket-max is
    * associative), so the comparison certifies the merge path.
    */
  val hllMergedDistinctUsersSql: String = {
    val m = Sketches.HllBuckets
    val remBits = Sketches.HllRemBits
    val mask = (1L << remBits) - 1
    val pow55 = 1L << (remBits + 1)
    val hv = TS.hash60(s"('${Sketches.HllSalt}' || CAST(user_id AS VARCHAR))")
    s"""WITH h AS (SELECT $hv AS hv FROM events WHERE user_id IS NOT NULL),
       |b AS (SELECT hv >> $remBits AS bucket,
       |        CASE WHEN (hv & $mask) = 0 THEN ${remBits + 1}
       |          ELSE ${remBits + 1} - length(bin(hv & $mask)) END AS rho
       |      FROM h),
       |r AS (SELECT bucket, max(rho) AS M FROM b GROUP BY 1),
       |s AS (SELECT CAST($m - count(*) AS INT) AS n_zero_buckets,
       |        CAST(sum(CAST(1 AS BIGINT) << (${remBits + 1} - M)) +
       |             ($m - count(*)) * CAST($pow55 AS BIGINT) AS BIGINT) AS sum_pow
       |      FROM r),
       |e AS (SELECT n_zero_buckets, sum_pow,
       |        ${Sketches.HllNumerator} / CAST(sum_pow AS DOUBLE) AS raw
       |      FROM s)
       |SELECT n_zero_buckets, sum_pow,
       |  round(CASE WHEN raw <= ${2.5 * m} AND n_zero_buckets > 0
       |    THEN $m.0 * ln($m.0 / n_zero_buckets) ELSE raw END, 6) AS est_distinct
       |FROM e""".stripMargin
  }

  /** Join-size oracle: same parity split, same grids, same min-over-rows
    * inner product, and the exact join count — the defining overestimate
    * inequality certified value-exactly.
    */
  val cmsJoinSizeEventsSql: String = {
    val w = Sketches.CmsWidth
    val ds = (0 until Sketches.CmsDepth).mkString("[", ",", "]")
    val bucket =
      s"${TS.hash60(s"('${Sketches.CmsSalt}' || CAST(d AS VARCHAR) || ':' || k)")} % $w"
    s"""WITH keyed AS (
       |  SELECT event_id,
       |    CAST(user_id AS VARCHAR) || ':' || event_type AS k
       |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |ds AS (SELECT unnest($ds) AS d),
       |lg AS (
       |  SELECT d, $bucket AS bucket, count(*) AS lcnt
       |  FROM keyed CROSS JOIN ds WHERE event_id % 2 = 0 GROUP BY 1, 2),
       |rg AS (
       |  SELECT d, $bucket AS bucket, count(*) AS rcnt
       |  FROM keyed CROSS JOIN ds WHERE event_id % 2 <> 0 GROUP BY 1, 2),
       |est AS (
       |  SELECT min(row_est) AS est_join_size FROM (
       |    SELECT l.d, CAST(sum(l.lcnt * r.rcnt) AS BIGINT) AS row_est
       |    FROM lg l JOIN rg r ON l.d = r.d AND l.bucket = r.bucket
       |    GROUP BY 1)),
       |truth AS (
       |  SELECT count(*) AS true_join_size
       |  FROM (SELECT k FROM keyed WHERE event_id % 2 = 0) a
       |  JOIN (SELECT k FROM keyed WHERE event_id % 2 <> 0) b ON a.k = b.k)
       |SELECT est_join_size, true_join_size,
       |  est_join_size - true_join_size AS overcount
       |FROM est, truth""".stripMargin
  }

  /** CMS oracle: same compound key, same depth-salted bucket recipe, same
    * min-over-rows estimate — the grid is rebuilt value-exactly in SQL, so
    * the driver hash certifies the OVERCOUNTS themselves, not a tolerance.
    */
  val cmsUserTypeCountsSql: String = {
    val w = Sketches.CmsWidth
    val ds = (0 until Sketches.CmsDepth).mkString("[", ",", "]")
    def bucket(kExpr: String) =
      s"${TS.hash60(s"('${Sketches.CmsSalt}' || CAST(d AS VARCHAR) || ':' || $kExpr)")} % $w"
    s"""WITH keyed AS (
       |  SELECT user_id, event_type,
       |    CAST(user_id AS VARCHAR) || ':' || event_type AS k
       |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |ds AS (SELECT unnest($ds) AS d),
       |sketch AS (
       |  SELECT d, ${bucket("k")} AS bucket, count(*) AS cnt
       |  FROM keyed CROSS JOIN ds GROUP BY 1, 2),
       |probes AS (
       |  SELECT user_id, event_type, k, count(*) AS exact_count
       |  FROM keyed WHERE user_id < ${Sketches.CmsProbeMaxUser}
       |  GROUP BY 1, 2, 3),
       |est AS (
       |  SELECT p.user_id, p.event_type, p.exact_count, min(s.cnt) AS est_count
       |  FROM (SELECT user_id, event_type, exact_count, d,
       |          ${bucket("k")} AS bucket
       |        FROM probes CROSS JOIN ds) p
       |  JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
       |  GROUP BY 1, 2, 3)
       |SELECT user_id, event_type, exact_count, est_count,
       |  est_count - exact_count AS overcount
       |FROM est ORDER BY user_id, event_type""".stripMargin
  }

  val approxQuantilesByTypeSql: String = {
    val w = Sketches.QuantileBinWidth
    val qCols = Sketches.QuantileQs.map { case (name, q) =>
      s"""round(CAST(min(CASE WHEN CAST(cum AS DOUBLE) >= CAST(total AS DOUBLE) * $q
         |    THEN bin END) + 1 AS DOUBLE) * $w, 6) AS $name""".stripMargin
    }.mkString(",\n  ")
    s"""WITH binned AS (
       |  SELECT event_type, CAST(floor(value / $w) AS BIGINT) AS bin, count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, bin,
       |    sum(n) OVER (PARTITION BY event_type ORDER BY bin
       |                 ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(n) OVER (PARTITION BY event_type) AS total
       |  FROM binned)
       |SELECT event_type, CAST(min(total) AS BIGINT) AS n_rows,
       |  $qCols
       |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin
  }
}
