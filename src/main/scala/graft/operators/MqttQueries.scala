package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MqttTopicMatches
import graft.sources.Tables

/** Driver-verifiable query forms of the MQTT parity pipeline: every operator
  * of SURVEY.md §2 bound to the deterministic message replay frame, each with
  * a DuckDB oracle that re-derives the same semantics in ANSI SQL
  * (window lag for trigger CDC, row_number for upsert/id assignment, a plain
  * join for the view).
  */
object MqttQueries {

  /** Exact-membership exclude list (reference: `message.topic in exclude`,
    * mqtt2sql.py:782-783 — NOT wildcard matching). "tele/error" is a
    * deliberate wildcard-looking near-miss that must NOT drop anything.
    */
  val ExcludeTopics: Seq[String] = Seq("tele/error/13", "tele/error/7", "tele/error")

  /** The shared oracle CTE: message frame + exclusion, mirroring
    * [[Tables.messages]] + [[MqttPipeline.excludeTopics]].
    */
  private val msgsCte: String = {
    val excl = ExcludeTopics.map(t => s"'$t'").mkString(", ")
    s"""msgs AS (
       |  SELECT * FROM (${Tables.messagesSql}) raw
       |  WHERE topic NOT IN ($excl))""".stripMargin
  }

  /** The excluded replay frame every parity query (batch and streaming)
    * starts from: [[Tables.messages]] + [[MqttPipeline.excludeTopics]].
    */
  def replayMessages(spark: SparkSession, dir: String): DataFrame =
    MqttPipeline.excludeTopics(Tables.messages(spark, dir), ExcludeTopics)

  private def msgs(spark: SparkSession, dir: String): DataFrame =
    replayMessages(spark, dir)

  // ---- messages (S1 scan shape + F2 exclude + F6 hex + F7 event time) -----

  def messages(spark: SparkSession, dir: String): DataFrame =
    msgs(spark, dir)
      .select(col("msg_id"), col("ts"), col("topic"),
        hex(col("value")).as("value_hex"), col("qos"), col("retain"))
      .orderBy(col("msg_id"))

  val messagesSql: String =
    s"""WITH $msgsCte
       |SELECT msg_id, ts, topic, hex(value) AS value_hex, qos, retain
       |FROM msgs ORDER BY msg_id""".stripMargin

  // ---- state table (A1 contiguous ids + A2 last-value-per-key upsert) ------

  def state(spark: SparkSession, dir: String): DataFrame =
    MqttPipeline.stateTable(msgs(spark, dir))
      .select(col("id"), col("ts"), col("topic"),
        hex(col("value")).as("value_hex"), col("qos"), col("retain"))
      .orderBy(col("id"))

  private val stateCte: String =
    """latest AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY topic ORDER BY ts DESC, msg_id DESC) AS rn,
      |    min(msg_id) OVER (PARTITION BY topic) AS first_arrival
      |  FROM msgs),
      |state AS (
      |  SELECT row_number() OVER (ORDER BY first_arrival) AS id,
      |         ts, topic, value, qos, retain
      |  FROM latest WHERE rn = 1)""".stripMargin

  val stateSql: String =
    s"""WITH $msgsCte,
       |$stateCte
       |SELECT id, ts, topic, hex(value) AS value_hex, qos, retain
       |FROM state ORDER BY id""".stripMargin

  // ---- history (F3/F4 trigger CDC, default flags enable=1, diffonly=1) ----

  /** Shared tail of the history queries, batch AND streaming: contiguous id
    * assignment over the kept rows in arrival order, topicid resolved via
    * the broadcast state dimension, hex projection, id order. Keeping this
    * in ONE place is what makes the incremental-equals-batch check honest —
    * the two paths can only differ in how `kept` was produced.
    */
  def finishHistory(kept: DataFrame, m: DataFrame): DataFrame = {
    val h = ContiguousId.assign(kept, "id", Seq(col("ts"), col("msg_id")))
    val dim = MqttPipeline.stateTable(m).select(col("id").as("topicid"), col("topic"))
    h.join(broadcast(dim), Seq("topic"))
      .select(col("id"), col("ts"), col("topicid"), hex(col("value")).as("value_hex"))
      .orderBy(col("id"))
  }

  def history(spark: SparkSession, dir: String): DataFrame = {
    val m = msgs(spark, dir)
    finishHistory(MqttPipeline.historyKept(m), m)
  }

  /** CDC kept-rows CTE: lag() is the batch form of "trigger compares NEW
    * payload against the stored previous one" (mysql.sql:86-91).
    */
  private val historyCte: String =
    """lagged AS (
      |  SELECT *, lag(value) OVER (PARTITION BY topic ORDER BY ts, msg_id) AS prev_value
      |  FROM msgs),
      |kept AS (
      |  SELECT ts, topic, value, msg_id,
      |         row_number() OVER (ORDER BY ts, msg_id) AS id
      |  FROM lagged
      |  WHERE prev_value IS NULL OR prev_value <> value)""".stripMargin

  val historySql: String =
    s"""WITH $msgsCte,
       |$stateCte,
       |$historyCte
       |SELECT k.id, k.ts, s.id AS topicid, hex(k.value) AS value_hex
       |FROM kept k JOIN state s ON k.topic = s.topic
       |ORDER BY k.id""".stripMargin

  /** Per-topic change CADENCE from the CDC history — the sensor-health
    * dashboard over the reference's own data model: how often each topic's
    * value actually changes, its observed span, and the mean dwell between
    * changes (span div (n-1), exact integer ms). The kept-row set is
    * [[MqttPipeline.historyKept]] itself, so the cadence cannot disagree
    * with the certified history table. Scale: the CDC window partitions by
    * topic (high-cardinality telemetry key); the stats fold is one
    * map-side-combined aggregation to |topics| rows.
    */
  def historyStats(spark: SparkSession, dir: String): DataFrame = {
    val kept = MqttPipeline.historyKept(msgs(spark, dir))
      .select(col("topic"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    kept.groupBy(col("topic"))
      .agg(count(lit(1)).as("n_changes"),
        min(col("us")).as("__f"), max(col("us")).as("__l"))
      .select(col("topic"), col("n_changes"),
        expr("(__l - __f) div 1000").as("span_ms"),
        expr("CASE WHEN n_changes > 1 THEN ((__l - __f) div 1000) div (n_changes - 1) ELSE 0 END")
          .as("mean_interval_ms"))
      .orderBy(col("topic"))
  }

  val historyStatsSql: String =
    s"""WITH $msgsCte,
       |$historyCte,
       |stats AS (
       |  SELECT topic, CAST(count(*) AS BIGINT) AS n_changes,
       |    min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
       |  FROM kept GROUP BY 1)
       |SELECT topic, n_changes,
       |  (l - f) // 1000 AS span_ms,
       |  CASE WHEN n_changes > 1 THEN ((l - f) // 1000) // (n_changes - 1)
       |       ELSE 0 END AS mean_interval_ms
       |FROM stats ORDER BY topic""".stripMargin

  /** Topic-TREE rollup — the broker-operator's `$SYS`-style hierarchy
    * view over the reference's slash-separated topic space: for every
    * prefix at every level (`tele`, `tele/<type>`, the full leaf), the
    * message volume, the distinct leaf topics underneath, and the last
    * arrival. The wildcard filter ([[graft.functions.TopicMatch]]) answers
    * "which messages match `tele/+/3`"; this answers "what does the tree
    * look like" — the two sides of topic-space observability.
    *
    * Scale shape: one prefix explode bounded by topic DEPTH (a small
    * constant — 3 here, rarely >8 in real brokers), then ONE
    * map-side-combined aggregation to the prefix domain (|topics| × depth
    * rows at most). The distinct-topic count rides the same aggregate via
    * Expand. No joins.
    *
    * Exactness: string prefixes and integer counts; arrival micros via
    * the pinned-UTC `unix_micros` ≡ DuckDB `epoch_us` identity.
    */
  // ---- stale-topic staleness histogram ------------------------------------

  /** Inactivity histogram — how long since each topic last reported,
    * relative to the replay's newest message, in second decades: the
    * "dead sensor" dashboard (the monitoring view behind MQTT last-will
    * hygiene). One map-side-combined fold to the topic domain, the
    * corpus max as a single-row broadcast back (counted BNLJ), then a
    * ~log10(span) fold. Ages are exact epoch-micro diffs `div` 1e6; the
    * decade is the string-length integer log10.
    */
  def staleTopics(spark: SparkSession, dir: String): DataFrame = {
    val last = msgs(spark, dir)
      .select(col("topic"), unix_micros(col("ts").cast("timestamp")).as("us"))
      .groupBy(col("topic")).agg(max(col("us")).as("last_us"))
    val newest = last.agg(max(col("last_us")).as("__newest"))
    last.join(broadcast(newest))
      .select(expr("(__newest - last_us) div 1000000").as("age_s"))
      .select((length(col("age_s").cast("string")) - 1).cast("long")
        .as("age_decade"), col("age_s"))
      .groupBy(col("age_decade"))
      .agg(count(lit(1)).as("n_topics"), min(col("age_s")).as("min_age_s"),
        max(col("age_s")).as("max_age_s"))
      .orderBy(col("age_decade"))
  }

  val staleTopicsSql: String =
    s"""WITH $msgsCte,
       |last AS (
       |  SELECT topic, max(epoch_us(ts)) AS last_us FROM msgs GROUP BY 1),
       |newest AS (SELECT max(last_us) AS newest FROM last),
       |ages AS (
       |  SELECT (newest - last_us) // 1000000 AS age_s FROM last, newest)
       |SELECT CAST(length(CAST(age_s AS VARCHAR)) - 1 AS BIGINT)
       |    AS age_decade,
       |  count(*) AS n_topics, min(age_s) AS min_age_s,
       |  max(age_s) AS max_age_s
       |FROM ages
       |GROUP BY 1 ORDER BY age_decade""".stripMargin

  def topicTree(spark: SparkSession, dir: String): DataFrame = {
    val withParts = msgs(spark, dir).select(col("topic"),
      unix_micros(col("ts").cast("timestamp")).as("us"),
      split(col("topic"), "/").as("__parts"))
    withParts
      .select(col("topic"), col("us"), col("__parts"),
        explode(sequence(lit(1), size(col("__parts")))).as("level"))
      .select(col("topic"), col("us"), col("level").cast("long").as("level"),
        expr("array_join(slice(__parts, 1, level), '/')").as("prefix"))
      .groupBy(col("level"), col("prefix"))
      .agg(count(lit(1)).as("n_msgs"),
        countDistinct(col("topic")).as("n_topics"),
        max(col("us")).as("last_us"))
      .orderBy(col("level"), col("prefix"))
  }

  val topicTreeSql: String =
    s"""WITH $msgsCte,
       |parts AS (
       |  SELECT topic, epoch_us(ts) AS us, string_split(topic, '/') AS p
       |  FROM msgs),
       |pref AS (
       |  SELECT topic, us, level, array_to_string(p[1:level], '/') AS prefix
       |  FROM (SELECT *, unnest(range(1, len(p) + 1)) AS level FROM parts))
       |SELECT level, prefix, count(*) AS n_msgs,
       |  count(DISTINCT topic) AS n_topics, max(us) AS last_us
       |FROM pref
       |GROUP BY 1, 2
       |ORDER BY level, prefix""".stripMargin

  // ---- history view (J1 inner join + F5 projection) ------------------------

  def historyView(spark: SparkSession, dir: String): DataFrame = {
    val m = msgs(spark, dir)
    MqttPipeline.historyView(MqttPipeline.history(m), MqttPipeline.stateTable(m))
      .select(col("id"), col("ts"), col("ts_last"), col("topic"),
        hex(col("value")).as("value_hex"))
      .orderBy(col("id"))
  }

  val historyViewSql: String =
    s"""WITH $msgsCte,
       |$stateCte,
       |$historyCte
       |SELECT k.id, k.ts, s.ts AS ts_last, k.topic, hex(k.value) AS value_hex
       |FROM kept k JOIN state s ON k.topic = s.topic
       |ORDER BY k.id""".stripMargin

  // ---- per-topic control-flag matrix (F3 enable x F4 diffonly) -------------

  /** Deterministic per-topic flags covering all 4 (enable, diffonly) combos:
    * derived from the numeric last level of the topic path.
    */
  private def topicFlags(m: DataFrame): DataFrame = {
    val u = element_at(split(col("topic"), "/"), 3).cast("int")
    m.select(col("topic")).distinct()
      .select(col("topic"), (u % 2).as("history_enable"), (floor(u / 2) % 2).cast("int").as("history_diffonly"))
  }

  def historyFlags(spark: SparkSession, dir: String): DataFrame = {
    val m = msgs(spark, dir)
    MqttPipeline.history(m, Some(topicFlags(m)))
      .select(col("id"), col("ts"), col("topic"), hex(col("value")).as("value_hex"))
      .orderBy(col("id"))
  }

  val historyFlagsSql: String =
    s"""WITH $msgsCte,
       |flagged AS (
       |  SELECT *,
       |    CAST(split_part(topic, '/', 3) AS INT) % 2 AS history_enable,
       |    (CAST(split_part(topic, '/', 3) AS INT) // 2) % 2 AS history_diffonly,
       |    lag(value) OVER (PARTITION BY topic ORDER BY ts, msg_id) AS prev_value
       |  FROM msgs),
       |kept AS (
       |  SELECT ts, topic, value, msg_id,
       |         row_number() OVER (ORDER BY ts, msg_id) AS id
       |  FROM flagged
       |  WHERE history_enable = 1
       |    AND (history_diffonly = 0 OR prev_value IS NULL OR prev_value <> value))
       |SELECT id, ts, topic, hex(value) AS value_hex FROM kept ORDER BY id""".stripMargin

  // ---- topic wildcard filter (F1, custom Catalyst expression) --------------

  val Patterns: Seq[String] = Seq("tele/+/7", "tele/error/#")

  def topicFilter(spark: SparkSession, dir: String): DataFrame = {
    val cond = Patterns
      .map(p => MqttTopicMatches(col("topic"), p))
      .reduce(_ || _)
    msgs(spark, dir)
      .filter(cond)
      .select(col("msg_id"), col("topic"))
      .orderBy(col("msg_id"))
  }

  val topicFilterSql: String =
    s"""WITH $msgsCte
       |SELECT msg_id, topic FROM msgs
       |WHERE regexp_full_match(topic, 'tele/[^/]+/7')
       |   OR regexp_full_match(topic, 'tele/error(/.*)?')
       |ORDER BY msg_id""".stripMargin

  // ---- as-of join (extension: the time-series op Spark lacks) --------------

  /** For every message, the most recent history CHANGE of its topic at or
    * before the message's timestamp — the canonical "state as of event time"
    * read over the CDC log, via the single-shuffle union-merge
    * [[AsOfJoin.asOf]]. The oracle uses DuckDB's native `ASOF LEFT JOIN`, so
    * the operator's semantics are certified against an independent
    * implementation, not just our own batch twin.
    */
  def asofChange(spark: SparkSession, dir: String): DataFrame = {
    val m = msgs(spark, dir)
    val changes = MqttPipeline.history(m)
    // right side unique per (topic, ts): multiple changes inside one
    // second-granularity tick collapse to the latest (max id), the row a
    // reader at that instant would see
    val rights = changes.groupBy(col("topic"), col("ts").as("change_ts"))
      .agg(max(col("id")).as("change_id"),
        hex(max_by(col("value"), col("id"))).as("change_value_hex"))
    val left = m.select(col("msg_id"), col("ts"), col("topic"))
    AsOfJoin.asOf(left, rights, Seq("topic"), "ts", "change_ts")
      .select(col("msg_id"), col("ts"), col("topic"),
        col("change_ts"), col("change_id"), col("change_value_hex"))
      .orderBy(col("msg_id"))
  }

  val asofChangeSql: String =
    s"""WITH $msgsCte,
       |$historyCte,
       |rights AS (
       |  SELECT topic, ts AS change_ts, max(id) AS change_id,
       |         hex(arg_max(value, id)) AS change_value_hex
       |  FROM kept GROUP BY 1, 2)
       |SELECT m.msg_id, m.ts, m.topic, r.change_ts, r.change_id, r.change_value_hex
       |FROM msgs m ASOF LEFT JOIN rights r
       |  ON m.topic = r.topic AND m.ts >= r.change_ts
       |ORDER BY m.msg_id""".stripMargin

  // ---- SCD-2 intervalization of the CDC log (extension) --------------------

  /** The history log reshaped as slowly-changing-dimension type-2 intervals:
    * each change row becomes `[valid_from, valid_to)` with `valid_to` = the
    * topic's NEXT change (null while current) — the standard "as-of readable"
    * derivation warehouses build over exactly this current-table + history-
    * table CDC shape (the reference's `mqtt`/`mqtt_history` pair,
    * mysql.sql:42-64). One window shuffle partitioned by topicid; at scale
    * the lead() is per-key and never global — the only global order is the
    * final display sort.
    */
  def historyScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("topicid")).orderBy(col("ts"), col("id"))
    history(spark, dir)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("id"), col("topicid"), col("ts").as("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, 1).otherwise(0).as("is_current"),
        col("value_hex"))
      .orderBy(col("id"))
  }

  val historyScd2Sql: String =
    s"""WITH $msgsCte,
       |$stateCte,
       |$historyCte,
       |hist AS (
       |  SELECT k.id, k.ts, s.id AS topicid, hex(k.value) AS value_hex
       |  FROM kept k JOIN state s ON k.topic = s.topic),
       |scd AS (
       |  SELECT id, topicid, ts AS valid_from,
       |         lead(ts) OVER (PARTITION BY topicid ORDER BY ts, id) AS valid_to,
       |         value_hex
       |  FROM hist)
       |SELECT id, topicid, valid_from, valid_to,
       |       CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current,
       |       value_hex
       |FROM scd ORDER BY id""".stripMargin

  // ---- tumbling-window aggregation (extension: ST2 event-time windows) -----

  /** Per-topic, per-hour tumbling-window message stats — the batch form of
    * the watermarked streaming aggregation ([[graft.streaming.WindowedStats]]
    * runs the identical plan under readStream; WindowedStatsSpec asserts the
    * equivalence). Epoch-aligned 1-hour `window()` buckets equal
    * `date_trunc('hour', ts)`, which is what the oracle uses.
    */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame =
    WindowedAgg.hourlyStats(msgs(spark, dir))
      .orderBy(col("win_start"), col("topic"))

  val windowedCountsSql: String =
    s"""WITH $msgsCte
       |SELECT date_trunc('hour', ts) AS win_start, topic,
       |       count(*) AS n_msgs,
       |       CAST(sum(octet_length(value)) AS BIGINT) AS total_bytes
       |FROM msgs GROUP BY 1, 2
       |ORDER BY win_start, topic""".stripMargin

  // ---- read-side idioms: localtime conversion + JSON payload typing --------

  /** README.md:243's documented read idiom (`DATETIME(ts,'localtime')`):
    * UTC storage, wall-clock display conversion.
    */
  def localtime(spark: SparkSession, dir: String): DataFrame =
    msgs(spark, dir)
      .select(col("msg_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_utc"),
        date_format(from_utc_timestamp(col("ts"), "+01:00"),
          "yyyy-MM-dd HH:mm:ss").as("ts_plus1"))
      .orderBy(col("msg_id"))

  val localtimeSql: String =
    s"""WITH $msgsCte
       |SELECT msg_id,
       |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_utc,
       |  strftime(ts + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_plus1
       |FROM msgs ORDER BY msg_id""".stripMargin

  /** The payload stays an opaque BLOB in the engine (reference stance);
    * typing it (JSON field extraction, numeric cast) is a read-side concern —
    * here is that read path.
    */
  def payloadJson(spark: SparkSession, dir: String): DataFrame =
    msgs(spark, dir)
      .select(col("msg_id"), col("topic"),
        get_json_object(col("value").cast("string"), "$.k").cast("int").as("payload_k"))
      .orderBy(col("msg_id"))

  val payloadJsonSql: String =
    s"""WITH $msgsCte
       |SELECT msg_id, topic,
       |  CAST(json_extract_string(decode(value), '$$.k') AS INT) AS payload_k
       |FROM msgs ORDER BY msg_id""".stripMargin
}
