package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.streaming.{SessionEvent, Sessionize, StreamingEtl}

/** Streaming-surface queries. q32–q59 run the shared transforms in their
  * batch-equivalent form (StreamingSpec drives the same code through
  * readStream/memory-sink); q79/q80 run the REAL streaming path —
  * readStream → watermark → append-mode parquet sink — to completion
  * inside the correctness gate, with oracles that model append-mode
  * emission (watermark cutoffs, event-time timeouts) exactly.
  */
object StreamQueries {

  /** Tumbling 6-hour windows per event type (epoch-aligned, like Spark's
    * window()).
    */
  def q32EventWindows(spark: SparkSession, dir: String): DataFrame =
    StreamingEtl.eventWindowAgg(Tables.events(spark, dir))
      .orderBy("window_start_epoch", "event_type")

  val q32Oracle: String =
    """SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600 AS BIGINT)
      |         AS window_start_epoch,
      |       event_type, count(*) AS n_events,
      |       round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY window_start_epoch, event_type
      |ORDER BY window_start_epoch, event_type""".stripMargin

  /** Sliding 6h/3h windows per event type — every event lands in exactly
    * two windows; the oracle fans rows out to both aligned starts.
    */
  def q46SlidingWindows(spark: SparkSession, dir: String): DataFrame =
    StreamingEtl.eventSlidingWindowAgg(Tables.events(spark, dir))
      .orderBy("window_start_epoch", "event_type")

  val q46Oracle: String =
    """WITH w AS (
      |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 10800) * 10800 AS BIGINT)
      |           AS w1,
      |         event_type, value
      |  FROM events
      |),
      |x AS (
      |  SELECT unnest([w1, w1 - 10800]) AS window_start_epoch,
      |         event_type, value
      |  FROM w
      |)
      |SELECT window_start_epoch, event_type, count(*) AS n_events,
      |       round(sum(value), 2) AS sum_value
      |FROM x
      |GROUP BY window_start_epoch, event_type
      |ORDER BY window_start_epoch, event_type""".stripMargin

  /** Gap-based sessions (30 min) per user: the batch window-function
    * implementation; the flatMapGroupsWithState streaming twin is
    * equivalence-tested in StreamingSpec.
    */
  def q33Sessions(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessionSummaries(
        Tables.events(spark, dir).select("user_id", "ts", "event_id"),
        gapMinutes = 30)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        sum("n_events").as("n_total"))
      .orderBy("user_id")

  val q33Oracle: String =
    """WITH lagged AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(CAST(ts AS TIMESTAMP))
      |                   - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |sess AS (
      |  SELECT user_id,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM lagged
      |),
      |per_session AS (
      |  SELECT user_id, session_id, count(*) AS n_events
      |  FROM sess GROUP BY user_id, session_id
      |)
      |SELECT user_id, count(*) AS n_sessions,
      |       max(n_events) AS max_session_events,
      |       CAST(sum(n_events) AS BIGINT) AS n_total
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** F11 on live data: shred the events' JSON `props` payload and
    * aggregate an extracted field per event type.
    */
  def q36JsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        max("k").as("max_k"),
        count(when(col("k").isNull, 1)).as("n_null_k"))
      .orderBy("event_type")

  val q36Oracle: String =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
      |         AS sum_k,
      |       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
      |       count(*) FILTER (json_extract_string(props, '$.k') IS NULL)
      |         AS n_null_k
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Window frame spec (rowsBetween): per-user running event-value total
    * — the cumulative-aggregate shape the reference never needed but an
    * engine must have.
    */
  def q37RunningTotal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("user_id") % 25 === 0)
      .select(
        col("user_id"), col("event_id"),
        round(sum("value").over(w), 2).as("running_value"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy("user_id", "event_id")
  }

  val q37Oracle: String =
    """SELECT user_id, event_id,
      |       round(sum(value) OVER w, 2) AS running_value,
      |       count(*) OVER w AS running_n
      |FROM events
      |WHERE user_id % 25 = 0
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** HLL sketch distinct counts. The estimate itself is engine-specific,
    * so the hashed output carries the exact count plus a boolean bound
    * check (|approx-exact|/exact within 3x the requested 2% rsd) that the
    * oracle asserts as `true` — a drifting estimator flips the row red.
    * The raw estimate's error is additionally property-tested in
    * PipelineSpec.
    */
  def q38ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("n_users_exact"),
        count(lit(1)).as("n_events"))
      .withColumn("approx_within_3rse",
        abs(col("approx_users") - col("n_users_exact")).cast("double") /
          col("n_users_exact") <= 0.06)
      .drop("approx_users")
      .orderBy("event_type")

  val q38Oracle: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users_exact,
      |       count(*) AS n_events, true AS approx_within_3rse
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q59: Count-Min sketch heavy hitters ----------------------------

  private val CmsDepth = 4
  private val CmsWidth = 64

  /** Heavy hitters cross-checked against a distributed Count-Min sketch
    * ([[graft.functions.CountMinAgg]]): the 10 most frequent users with
    * their exact counts and the sketch's point estimates. The oracle
    * rebuilds the identical d x w counter matrix in SQL (same
    * md5-bucketing) and takes the same min-of-rows estimate — every
    * counter cell the estimate touches is value-checked across engines.
    * The sketch itself is ONE constant-size map-side-combinable
    * aggregation over the events scan; only 10 driver-side probes follow.
    */
  def q59CmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{CountMinSketch, VectorFunctions}
    val ev = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val sketch = ev
      .agg(VectorFunctions.countMinMd5(
        col("user_id").cast("string"), CmsDepth, CmsWidth).as("sk"))
      .head().getSeq[Long](0).toArray
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    import spark.implicits._
    top.toSeq.map { case (u, n) =>
        (u, n, CountMinSketch.estimate(sketch, CmsDepth, CmsWidth, u.toString))
      }
      .toDF("user_id", "exact_n", "cms_est")
      .orderBy(col("exact_n").desc, col("user_id"))
  }

  val q59Oracle: String =
    s"""WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
       |rows AS (SELECT r FROM (VALUES (0), (1), (2), (3)) t(r)),
       |counters AS (
       |  SELECT r,
       |         ('0x' || substr(md5(r || '|' || CAST(user_id AS VARCHAR)),
       |                         1, 8))::BIGINT % $CmsWidth AS b,
       |         count(*) AS c
       |  FROM ev, rows GROUP BY r, b
       |),
       |top10 AS (
       |  SELECT user_id, count(*) AS exact_n FROM ev GROUP BY user_id
       |  ORDER BY exact_n DESC, user_id LIMIT 10
       |)
       |SELECT t.user_id, t.exact_n, min(k.c) AS cms_est
       |FROM top10 t
       |JOIN rows r2 ON true
       |JOIN counters k
       |  ON k.r = r2.r
       | AND k.b = ('0x' || substr(md5(r2.r || '|' ||
       |              CAST(t.user_id AS VARCHAR)), 1, 8))::BIGINT % $CmsWidth
       |GROUP BY t.user_id, t.exact_n
       |ORDER BY exact_n DESC, user_id""".stripMargin

  // ---- q79/q80: the LIVE streaming path inside the correctness gate ---

  /** Drains an append-mode streaming frame through a real parquet file
    * sink (checkpointed, AvailableNow) and reads the sink back — the
    * production shape, not a memory-sink shortcut. AvailableNow runs the
    * trailing no-data micro-batch, so the final watermark closes every
    * window/timeout it has passed before the query terminates.
    */
  private def drainToParquet(
      spark: SparkSession, streaming: DataFrame, tag: String,
      inputBytes: Long): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-$tag-").toString
    // state partitions derived from the lifecycle's source volume
    // (r16, guide §2: AQE cannot coalesce stateful streaming exchanges
    // and the count freezes into the checkpoint — the session's
    // 32-partition batch default cost ~4x the lifecycle wall time in
    // per-partition state-store commits at sf0.1; see StreamTuning)
    val q = graft.streaming.StreamTuning
      .withStatePartitions(spark, inputBytes) {
        streaming.writeStream
          .outputMode("append")
          .format("parquet").option("path", s"$tmp/out")
          .option("checkpointLocation", s"$tmp/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
      }
    q.awaitTermination()
    spark.read.parquet(s"$tmp/out")
  }

  /** Source volume of the events-table lifecycles (the file
    * `eventsStream` reads), for the state-partition derivation.
    */
  private def eventsBytes(spark: SparkSession, dir: String): Long =
    graft.streaming.StreamTuning.inputBytes(spark, s"$dir/events.parquet")

  /** q32's tumbling windows through the REAL streaming path: readStream →
    * withWatermark → window agg → append-mode file sink. Unlike q32 (the
    * batch-equivalent form), the emitted set here is watermark-governed:
    * exactly the windows whose end the final watermark
    * (max event time − 10 min, millisecond-floored like Spark's
    * EventTimeStats) has passed. Deterministic for fixed input, so it is
    * oracle-able — the oracle recomputes the watermark cutoff in SQL.
    */
  def q79StreamingWindowsLive(spark: SparkSession, dir: String): DataFrame =
    drainToParquet(spark,
        StreamingEtl.eventWindowAgg(StreamingEtl.eventsStream(spark, dir)),
        "q79", eventsBytes(spark, dir))
      .orderBy("window_start_epoch", "event_type")

  val q79Oracle: String =
    """WITH mx AS (
      |  SELECT epoch_us(CAST(max(ts) AS TIMESTAMP)) // 1000 - 600000 AS wm_ms
      |  FROM events
      |),
      |w AS (
      |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600 AS BIGINT)
      |           AS window_start_epoch,
      |         event_type, value
      |  FROM events
      |)
      |SELECT window_start_epoch, event_type, count(*) AS n_events,
      |       round(sum(value), 2) AS sum_value
      |FROM w, mx
      |WHERE (window_start_epoch + 21600) * 1000 <= wm_ms
      |GROUP BY window_start_epoch, event_type
      |ORDER BY window_start_epoch, event_type""".stripMargin

  /** Gap-sessionization through the REAL streaming path:
    * flatMapGroupsWithState with multi-session state and event-time
    * timeouts, drained via the file sink. Exact watermark semantics
    * (round 12): a session is emitted iff the final watermark (max
    * event time − 30 min, ms-floored) strictly passes its µs-exact
    * close (`end_us + gap_us < wm_ms * 1000`) — sessions the watermark
    * has not sealed stay in state regardless of later same-user
    * sessions. Epoch-micros BIGINT projection keeps the oracle
    * exact-integer (q71 lesson).
    */
  def q80StreamingSessionsLive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = StreamingEtl.eventsStream(spark, dir)
      .select("user_id", "ts", "event_id").as[SessionEvent]
    drainToParquet(spark,
        Sessionize.sessionizeStream(spark, ev, gapMinutes = 30)
          .select(col("user_id"),
            unix_micros(col("session_start")).as("session_start_us"),
            unix_micros(col("session_end")).as("session_end_us"),
            col("n_events")),
        "q80", eventsBytes(spark, dir))
      .orderBy("user_id", "session_start_us")
  }

  val q80Oracle: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
      |),
      |lagged AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |sess AS (
      |  SELECT user_id, ts,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM lagged
      |),
      |per_session AS (
      |  SELECT user_id, session_id,
      |         epoch_us(min(ts)) AS session_start_us,
      |         epoch_us(max(ts)) AS session_end_us,
      |         count(*) AS n_events
      |  FROM sess GROUP BY user_id, session_id
      |),
      |mx AS (
      |  SELECT epoch_us(CAST(max(ts) AS TIMESTAMP)) // 1000 - 1800000 AS wm_ms
      |  FROM events
      |)
      |SELECT user_id, session_start_us, session_end_us, n_events
      |FROM per_session, mx
      |WHERE session_end_us + 1800000000 < wm_ms * 1000
      |ORDER BY user_id, session_start_us""".stripMargin

  /** The stream-stream interval join through the REAL streaming path
    * (readStream both sides → watermarks → time-bounded inner join →
    * append-mode file sink). Inner stream-stream joins emit on match —
    * nothing is withheld for the watermark — so the emitted set equals
    * the batch band join exactly and the oracle is plain SQL over
    * events: click→purchase attribution pairs within one hour.
    */
  def q96StreamingIntervalJoinLive(
      spark: SparkSession, dir: String): DataFrame = {
    def typed(t: String) = StreamingEtl.eventsStream(spark, dir)
      .filter(col("event_type") === t)
      .select("user_id", "ts", "event_id")
    drainToParquet(spark,
        StreamingEtl.intervalJoinStream(
            typed("click"), typed("purchase"),
            Seq("user_id"), "ts", "ts", maxGapSeconds = 3600)
          .select(col("user_id"),
            col("l_event_id"), col("r_event_id"),
            (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
              .as("gap_us")),
        "q96", eventsBytes(spark, dir))
      .orderBy("user_id", "l_event_id", "r_event_id")
  }

  val q96Oracle: String =
    """SELECT a.user_id, a.event_id AS l_event_id, b.event_id AS r_event_id,
      |       epoch_us(CAST(b.ts AS TIMESTAMP))
      |         - epoch_us(CAST(a.ts AS TIMESTAMP)) AS gap_us
      |FROM events a
      |JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_type = 'click' AND b.event_type = 'purchase'
      | AND epoch_us(CAST(b.ts AS TIMESTAMP))
      |       - epoch_us(CAST(a.ts AS TIMESTAMP)) BETWEEN 0 AND 3600000000
      |ORDER BY a.user_id, l_event_id, r_event_id""".stripMargin

  /** The stream-stream LEFT OUTER interval join live: matched pairs emit
    * on match (q96's set exactly), and every unmatched click emits
    * null-extended once the final watermark passes the end of its match
    * window — the state-eviction deadline doubling as the null-emission
    * schedule, which is THE semantic that distinguishes a streaming
    * outer join from its batch twin. Deterministic for fixed input
    * under AvailableNow (the trailing no-data batch advances the final
    * watermark), so the oracle can model the cutoff: a click with no
    * purchase within the hour is emitted iff `click_ts + 1h` is behind
    * the final GLOBAL watermark — the MIN over both inputs' (max event
    * time − 10 min, ms-floored); the lagging stream governs eviction,
    * which is exactly the multi-watermark semantics worth pinning.
    */
  def q106StreamingLeftJoinLive(
      spark: SparkSession, dir: String): DataFrame = {
    def typed(t: String) = StreamingEtl.eventsStream(spark, dir)
      .filter(col("event_type") === t)
      .select("user_id", "ts", "event_id")
    drainToParquet(spark,
        StreamingEtl.intervalJoinStream(
            typed("click"), typed("purchase"),
            Seq("user_id"), "ts", "ts", maxGapSeconds = 3600,
            joinType = "left_outer")
          .select(col("user_id"),
            col("l_event_id"), col("r_event_id"),
            (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
              .as("gap_us")),
        "q106", eventsBytes(spark, dir))
      .orderBy("user_id", "l_event_id", "r_event_id")
  }

  val q106Oracle: String =
    """WITH c AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click'
      |),
      |p AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'purchase'
      |),
      |m AS (
      |  SELECT c.user_id, c.event_id AS l_event_id, p.event_id AS r_event_id,
      |         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |  FROM c JOIN p
      |    ON c.user_id = p.user_id
      |   AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 3600000000
      |),
      |wm AS (
      |  SELECT least((SELECT epoch_us(max(ts)) // 1000 FROM c),
      |               (SELECT epoch_us(max(ts)) // 1000 FROM p))
      |           - 600000 AS wm_ms
      |)
      |SELECT user_id, l_event_id, r_event_id, gap_us FROM m
      |UNION ALL
      |SELECT c.user_id, c.event_id AS l_event_id,
      |       NULL AS r_event_id, NULL AS gap_us
      |FROM c, wm
      |WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.l_event_id = c.event_id)
      |  AND epoch_us(c.ts) // 1000 + 3600000 < wm.wm_ms
      |ORDER BY user_id, l_event_id, r_event_id""".stripMargin

  /** Watermarked streaming dedup through the REAL path: the events table
    * delivered TWICE (a union of two file-source streams over the same
    * file — duplicate redelivery at ingest), deduped on the event id
    * within the watermark horizon, drained through the append-mode file
    * sink. `dropDuplicatesWithinWatermark` keeps the first arrival and
    * bounds state by the watermark, so the emitted set is exactly the
    * distinct events — the oracle is a plain scan.
    */
  def q97StreamingDedupLive(spark: SparkSession, dir: String): DataFrame = {
    def once = StreamingEtl.eventsStream(spark, dir)
      .select("event_id", "user_id", "ts", "event_type")
    drainToParquet(spark,
        once.union(once)
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("event_type")),
        "q97", eventsBytes(spark, dir))
      .orderBy("event_id")
  }

  val q97Oracle: String =
    """SELECT event_id, user_id,
      |       epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Gap sessions through Spark's BUILT-IN `session_window` aggregation
    * on the live streaming path — the declarative twin of q80's
    * flatMapGroupsWithState sessionizer (same 30-minute gap, different
    * machinery: MergingSessions eviction instead of hand-rolled
    * event-time timeouts). Builtin semantics the oracle models exactly:
    * a session window is [first_ts, last_ts + gap); a new event MERGES
    * into a session iff its time is strictly before the session end
    * (diff >= gap starts a new session — note q33's batch sessionizer
    * uses diff > gap, a deliberate boundary difference pinned here);
    * append mode emits a session once the final watermark
    * (max event time − 10 min, ms-floored) reaches its window end.
    */
  def q102SessionWindowLive(spark: SparkSession, dir: String): DataFrame =
    drainToParquet(spark,
        StreamingEtl.eventsStream(spark, dir)
          .withWatermark("ts", "10 minutes")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start_us"),
            unix_micros(col("session_window.end")).as("session_end_us"),
            col("n_events")),
        "q102", eventsBytes(spark, dir))
      .orderBy("user_id", "session_start_us")

  val q102Oracle: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |),
      |lagged AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |),
      |sess AS (
      |  SELECT user_id, ts,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM lagged
      |),
      |per_session AS (
      |  SELECT user_id, session_id,
      |         epoch_us(min(ts)) AS session_start_us,
      |         epoch_us(max(ts)) + 1800000000 AS session_end_us,
      |         count(*) AS n_events
      |  FROM sess GROUP BY user_id, session_id
      |),
      |mx AS (
      |  SELECT epoch_us(CAST(max(ts) AS TIMESTAMP)) // 1000 - 600000 AS wm_ms
      |  FROM events
      |)
      |SELECT user_id, session_start_us, session_end_us, n_events
      |FROM per_session, mx
      |WHERE session_end_us // 1000 <= wm_ms
      |ORDER BY user_id, session_start_us""".stripMargin

  // ---- q117: exact heavy hitters (Misra–Gries candidates + confirm) ---

  /** Shared skew derivation: 70% of users collapse onto 3 hot keys, the
    * rest stay singleton — the hot-key shape salting/heavy-hitter
    * machinery exists for. Identical SQL text in both engines.
    */
  val hhKeysSql: String =
    """hh AS (
      |  SELECT CASE WHEN user_id % 10 < 7 THEN 'hot' || (user_id % 3)
      |              ELSE 'cold' || user_id END AS k
      |  FROM events WHERE user_id IS NOT NULL
      |)""".stripMargin

  /** Exact heavy hitters over the skewed key ([[graft.pipeline.HeavyHitters]]):
    * Misra–Gries candidate scan (constant-size mergeable buffers, input
    * never shuffled) + exact confirm of the ≤ k candidates. The oracle
    * is the DEFINITION — a full GROUP BY with HAVING n*k > N — so a
    * summary that dropped a true heavy hitter, a merge that inflated a
    * count past the threshold, or a confirm pass that kept a borderline
    * item all diverge.
    */
  def q117HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.events(spark, dir).createOrReplaceTempView("events")
    val keys = spark.sql(s"WITH $hhKeysSql SELECT k FROM hh")
    graft.pipeline.HeavyHitters.exact(keys, col("k"), k = 20)
  }

  val q117Oracle: String =
    s"""WITH $hhKeysSql,
       |n AS (SELECT count(*) AS c FROM hh)
       |SELECT k AS item, count(*) AS n_exact
       |FROM hh, n GROUP BY k, n.c
       |HAVING count(*) * 20 > c
       |ORDER BY n_exact DESC, item""".stripMargin

  // ---- q119: distribution drift (PSI) between corpus halves ----------

  /** Population Stability Index ([[graft.pipeline.Drift]]) between the
    * first and second half of January's events, on a numeric feature
    * (`value`, 10 fixed bins over [0,500)) and a categorical one
    * (`event_type`). Per-bin terms are value-checked — the oracle
    * replays the Laplace-smoothed share arithmetic bin by bin, so a
    * wrong total, a dropped empty bin, or a smoothing drift all flip
    * rows; the PSI itself is the sum of `psi_term`.
    */
  def q119DistributionDrift(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Drift
    val ev = graft.Tables.events(spark, dir)
    val mid = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val a = ev.filter(col("ts") < lit(mid))
    val b = ev.filter(col("ts") >= lit(mid))
    Drift.psiTerms(a, b, Drift.numericBin(col("value"), 0.0, 500.0, 10),
        "value")
      .unionByName(Drift.psiTerms(a, b,
        coalesce(col("event_type"), lit("(null)")), "event_type"))
      .orderBy("feature", "bin")
  }

  val q119Oracle: String =
    """WITH a AS (
      |  SELECT * FROM events
      |  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
      |),
      |b AS (
      |  SELECT * FROM events
      |  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
      |),
      |va AS (
      |  SELECT least(9, greatest(0, CAST(floor((value - 0.0) / (500.0 - 0.0)
      |           * 10) AS BIGINT))) AS bin, count(*) AS n_a
      |  FROM a GROUP BY 1
      |),
      |vb AS (
      |  SELECT least(9, greatest(0, CAST(floor((value - 0.0) / (500.0 - 0.0)
      |           * 10) AS BIGINT))) AS bin, count(*) AS n_b
      |  FROM b GROUP BY 1
      |),
      |vj AS (
      |  SELECT bin, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
      |  FROM va FULL JOIN vb USING (bin)
      |),
      |vt AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS nb FROM vj),
      |v AS (
      |  SELECT 'value' AS feature, CAST(bin AS VARCHAR) AS bin, n_a, n_b,
      |         round(((n_a + 0.5) / (ta + 0.5 * nb) -
      |                (n_b + 0.5) / (tb + 0.5 * nb)) *
      |               ln(((n_a + 0.5) / (ta + 0.5 * nb)) /
      |                  ((n_b + 0.5) / (tb + 0.5 * nb))), 6) AS psi_term
      |  FROM vj, vt
      |),
      |ea AS (
      |  SELECT coalesce(event_type, '(null)') AS bin, count(*) AS n_a
      |  FROM a GROUP BY 1
      |),
      |eb AS (
      |  SELECT coalesce(event_type, '(null)') AS bin, count(*) AS n_b
      |  FROM b GROUP BY 1
      |),
      |ej AS (
      |  SELECT bin, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
      |  FROM ea FULL JOIN eb USING (bin)
      |),
      |et AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS nb FROM ej),
      |e AS (
      |  SELECT 'event_type' AS feature, bin, n_a, n_b,
      |         round(((n_a + 0.5) / (ta + 0.5 * nb) -
      |                (n_b + 0.5) / (tb + 0.5 * nb)) *
      |               ln(((n_a + 0.5) / (ta + 0.5 * nb)) /
      |                  ((n_b + 0.5) / (tb + 0.5 * nb))), 6) AS psi_term
      |  FROM ej, et
      |)
      |SELECT feature, bin, CAST(n_a AS BIGINT) AS n_a,
      |       CAST(n_b AS BIGINT) AS n_b, psi_term
      |FROM (SELECT * FROM v UNION ALL SELECT * FROM e)
      |ORDER BY feature, bin""".stripMargin

  // ---- q124: ordered conversion funnel over sessions ------------------

  /** Conversion-funnel analysis on first-occurrence ordering: per
    * session (the q33 gap sessionization reused via
    * [[Sessionize.assignSessions]]), the funnel counts sessions whose
    * first view precedes their first click precedes their first
    * purchase — the product-analytics query every event warehouse
    * serves. One sessionization window + one combinable min-per-stage
    * aggregation; nothing joins or re-scans.
    */
  def q124SessionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select("user_id", "ts", "event_id", "event_type")
    val s = Sessionize.assignSessions(ev, gapMinutes = 30)
    def firstOf(t: String) =
      min(when(col("event_type") === t, unix_micros(col("ts"))))
    val stages = s.groupBy("user_id", "session_id")
      .agg(firstOf("view").as("t_view"), firstOf("click").as("t_click"),
        firstOf("purchase").as("t_purchase"))
    val s1 = col("t_view").isNotNull
    val s2 = s1 && col("t_click").isNotNull && col("t_view") <= col("t_click")
    val s3 = s2 && col("t_purchase").isNotNull &&
      col("t_click") <= col("t_purchase")
    stages.agg(
      count(lit(1)).as("n_sessions"),
      sum(when(s1, 1L).otherwise(0L)).as("n_view"),
      sum(when(s2, 1L).otherwise(0L)).as("n_view_click"),
      sum(when(s3, 1L).otherwise(0L)).as("n_full_funnel"))
  }

  val q124Oracle: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
      |  FROM events WHERE user_id IS NOT NULL
      |),
      |lagged AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
      |                      > 1800000000
      |                 THEN 1 ELSE 0 END AS is_new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |sess AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS session_id
      |  FROM lagged
      |),
      |stages AS (
      |  SELECT user_id, session_id,
      |         min(CASE WHEN event_type = 'view'
      |                  THEN epoch_us(ts) END) AS t_view,
      |         min(CASE WHEN event_type = 'click'
      |                  THEN epoch_us(ts) END) AS t_click,
      |         min(CASE WHEN event_type = 'purchase'
      |                  THEN epoch_us(ts) END) AS t_purchase
      |  FROM sess GROUP BY user_id, session_id
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
      |       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_view,
      |       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
      |                      AND t_view <= t_click THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_view_click,
      |       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
      |                      AND t_view <= t_click AND t_purchase IS NOT NULL
      |                      AND t_click <= t_purchase THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_full_funnel
      |FROM stages""".stripMargin

  // ---- q125: weekly retention cohorts ---------------------------------

  /** Cohort retention: users bucket by first-activity week, activity
    * counts per (cohort, week offset) — the warehouse retention matrix.
    * One min-per-user aggregate (broadcast back onto the scan) + one
    * distinct count per cell; week arithmetic in exact integer epoch
    * microseconds from a fixed origin.
    */
  def q125RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val originUs = 1704067200000000L // 2024-01-01 00:00:00 UTC
    val weekUs = 604800000000L
    val ev = graft.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"),
        floor((unix_micros(col("ts")) - originUs) / weekUs).as("week"))
    val firstWeek = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.join(broadcast(firstWeek), Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  val q125Oracle: String =
    """WITH e AS (
      |  SELECT user_id,
      |         (epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000)
      |           // 604800000000 AS week
      |  FROM events WHERE user_id IS NOT NULL
      |),
      |fw AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
      |SELECT fw.cohort_week, e.week - fw.cohort_week AS week_offset,
      |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
      |FROM e JOIN fw USING (user_id)
      |GROUP BY fw.cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin

  // ---- q132: windowed anomaly z-scores --------------------------------

  /** Volume-anomaly detection — the monitoring query behind "alert when
    * a source's event rate deviates": 6-hour tumbling counts per
    * event_type, z-scored against that type's own window population.
    * Mean and variance come from EXACT integer sums
    * (Σn, Σn², window count), divided in one fixed expression — not
    * `stddev_pop` — so the arithmetic replays bit-for-bit across
    * engines. Two combinable aggregations (windows, then per-type
    * moments broadcast back); no shuffle carries more than the window
    * table.
    */
  def q132AnomalyWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .filter(col("event_type").isNotNull)
    val win = ev
      .groupBy(
        (floor(unix_micros(col("ts")) / 21600000000L) * 21600L)
          .as("window_start_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val moments = win.groupBy("event_type")
      .agg(sum("n").as("s1"), sum(col("n") * col("n")).as("s2"),
        count(lit(1)).as("k"))
    val mean = col("s1").cast("double") / col("k")
    val variance = col("s2").cast("double") / col("k") - mean * mean
    win.join(broadcast(moments), Seq("event_type"))
      .withColumn("z",
        round((col("n").cast("double") - mean) / sqrt(variance), 4))
      .filter(abs(col("z")) > lit(1.5))
      .select(col("event_type"), col("window_start_epoch"), col("n"),
        col("z"))
      .orderBy("event_type", "window_start_epoch")
  }

  val q132Oracle: String =
    """WITH w AS (
      |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600
      |           AS window_start_epoch,
      |         event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM events WHERE event_type IS NOT NULL
      |  GROUP BY 1, 2
      |),
      |m AS (
      |  SELECT event_type, sum(n) AS s1, sum(n * n) AS s2,
      |         count(*) AS k
      |  FROM w GROUP BY event_type
      |)
      |SELECT w.event_type, w.window_start_epoch, w.n,
      |       round((CAST(w.n AS DOUBLE) - CAST(s1 AS DOUBLE) / k) /
      |             sqrt(CAST(s2 AS DOUBLE) / k -
      |                  (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k)),
      |             4) AS z
      |FROM w JOIN m USING (event_type)
      |WHERE abs((CAST(w.n AS DOUBLE) - CAST(s1 AS DOUBLE) / k) /
      |          sqrt(CAST(s2 AS DOUBLE) / k -
      |               (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k)))
      |      > 1.5
      |ORDER BY event_type, window_start_epoch""".stripMargin

  /** Checkpoint-RESTART dedup cycle under the driver's correctness gate:
    * three separate streaming runs share one checkpoint — initial
    * delivery, a full REDELIVERY (the at-least-once failure mode: every
    * row suppressed, the in-watermark-horizon ones specifically by the
    * RESTORED `dropDuplicatesWithinWatermark` state, the older ones by
    * the restored watermark's late-row filter), then genuinely fresh
    * events (time-shifted past the restored watermark — all pass). The
    * oracle is pure distinct algebra: n, n, 2n, n. A state-restore bug
    * (duplicates leak on redelivery) or a watermark-restore bug (fresh
    * rows dropped as late) breaks a phase count. Complements the
    * StreamingSpec restart tests by running under CORRECTNESS_r{N}.
    */
  def q141StreamingRestartDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q141-").toString
    val (in, out, ckpt) = (s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
    val ev = Tables.events(spark, dir)
      .select("event_id", "user_id", "ts", "event_type")
    val n = ev.count()
    val schema = ev.schema
    def runPhase(): Long = {
      // state partitions from the per-phase source volume (phase 1
      // pins the count into the checkpoint; restarts keep it)
      val q = graft.streaming.StreamTuning.withStatePartitions(
        spark, graft.streaming.StreamTuning.inputBytes(spark, in)) {
        spark.readStream.schema(schema).parquet(in)
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.outputMode("append")
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
      }
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    ev.coalesce(1).write.mode("append").parquet(in)
    val n1 = runPhase()
    ev.coalesce(1).write.mode("append").parquet(in) // full redelivery
    val n2 = runPhase()
    val span = ev
      .agg(max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
      .head().getLong(0)
    ev.withColumn("event_id", col("event_id") + 1000000000L)
      .withColumn("ts",
        timestamp_micros(unix_micros(col("ts")) + span + 3600000000L))
      .coalesce(1).write.mode("append").parquet(in)
    val n3 = runPhase()
    Seq(
      ("1_initial", n1),
      ("2_redelivered", n2),
      ("3_fresh", n3),
      ("4_suppressed", 3 * n - n3))
      .toDF("phase", "n_rows")
      .orderBy("phase")
  }

  val q141Oracle: String =
    """WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
      |SELECT '1_initial' AS phase, n AS n_rows FROM c
      |UNION ALL SELECT '2_redelivered', n FROM c
      |UNION ALL SELECT '3_fresh', 2 * n FROM c
      |UNION ALL SELECT '4_suppressed', n FROM c
      |ORDER BY phase""".stripMargin

  /** Checkpoint-RESTART of the builtin `session_window` aggregation under
    * the driver's correctness gate: two AvailableNow runs share one
    * checkpoint — the first delivers events up to the time-range midpoint
    * and emits every session the phase-1 watermark closes; the second
    * delivers the rest, and the RESTORED MergingSessions state must merge
    * a restart-straddling session's phase-2 events into its open phase-1
    * session exactly as a single run would. Closed-form oracle:
    *
    *   - phase 1 count = sessions over the first half with
    *     end ≤ wm1 (max half-1 ts − 10 min, ms-floored);
    *   - phase 2 count = sessions over ALL events with end ≤ wm2, minus
    *     phase 1 (sound because an emitted session can never grow: its
    *     end ≤ wm1 < every phase-2 timestamp);
    *   - merged-across-restart count = emitted sessions whose first event
    *     is in half 1 (start ≤ cut) and last event in half 2
    *     (end − gap > cut) — derivable from the streaming output alone,
    *     and a state-restore bug (open sessions lost, or re-opened as
    *     fresh) breaks it before it breaks the totals.
    */
  def q148SessionRestartLive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q148-").toString
    val (in, out, ckpt) = (s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
    val ev = Tables.events(spark, dir).select("user_id", "ts")
    // cut at the lower-median STRADDLE POINT — the first timestamp of a
    // same-user consecutive pair closer than the session gap: splitting
    // there guarantees at least one session arrives half per phase, so
    // the merged-across-restart row pins the restored MergingSessions
    // state doing real work (a range-midpoint cut lands in a session gap
    // and phase 2 would exercise only fresh sessions). Falls back to the
    // median event time if the data has no intra-session pairs at all.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val cand = ev
      .withColumn("u", unix_micros(col("ts")))
      .withColumn("nu", unix_micros(lead(col("ts"), 1).over(w)))
      .filter(col("nu").isNotNull &&
        (col("nu") - col("u")).between(1L, 1799999999L))
      .select("u")
    val nc = cand.count()
    val cut =
      if (nc > 0)
        cand.orderBy("u").limit(((nc + 1) / 2).toInt)
          .agg(max("u")).head().getLong(0)
      else {
        val nEv = ev.count()
        ev.select(unix_micros(col("ts")).as("u"))
          .orderBy("u").limit(((nEv + 1) / 2).toInt)
          .agg(max("u")).head().getLong(0)
      }
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("session_start_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("session_end_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_events",
        org.apache.spark.sql.types.LongType)))
    def runPhase(): DataFrame = {
      // state partitions from the per-phase source volume (phase 1
      // pins the count into the checkpoint; restarts keep it)
      val q = graft.streaming.StreamTuning.withStatePartitions(
        spark, graft.streaming.StreamTuning.inputBytes(spark, in)) {
        spark.readStream.schema(ev.schema).parquet(in)
          .withWatermark("ts", "10 minutes")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start_us"),
            unix_micros(col("session_window.end")).as("session_end_us"),
            col("n_events"))
          .writeStream.outputMode("append")
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
      }
      q.awaitTermination()
      spark.read.schema(outSchema).parquet(out)
    }
    ev.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.mode("append").parquet(in)
    val n1 = runPhase().count()
    ev.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.mode("append").parquet(in)
    val cumulative = runPhase().cache()
    try {
      val n2 = cumulative.count() - n1
      val merged = cumulative
        .filter(col("session_start_us") <= cut &&
          col("session_end_us") - 1800000000L > cut)
        .count()
      Seq(
        ("1_phase1", n1),
        ("2_phase2", n2),
        ("3_merged_across_restart", merged))
        .toDF("phase", "n_rows")
        .orderBy("phase")
    } finally cumulative.unpersist()
  }

  /** Eviction boundary is µs-exact: Spark emits a session iff
    * `end_us <= watermarkMs * 1000` (WatermarkSupport keeps the
    * watermark in ms and scales up), so the oracle must compare
    * `en <= wm * 1000` — NOT `en // 1000 <= wm`, which would also count
    * sessions whose end carries sub-ms microseconds in
    * `(wm*1000, wm*1000+999]` that Spark never emits.
    */
  val q148Oracle: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |),
      |pairs AS (
      |  SELECT epoch_us(ts) AS u,
      |         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS nu
      |  FROM e
      |),
      |cand AS (
      |  SELECT u FROM pairs
      |  WHERE nu IS NOT NULL AND nu - u BETWEEN 1 AND 1799999999
      |),
      |b AS (
      |  SELECT CASE WHEN (SELECT count(*) FROM cand) > 0 THEN
      |    (SELECT max(u) FROM (
      |       SELECT u FROM cand ORDER BY u
      |       LIMIT (SELECT (count(*) + 1) // 2 FROM cand)))
      |  ELSE
      |    (SELECT max(u) FROM (
      |       SELECT epoch_us(ts) AS u FROM e ORDER BY u
      |       LIMIT (SELECT (count(*) + 1) // 2 FROM e)))
      |  END AS cut
      |),
      |lag_all AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |),
      |sess_all AS (
      |  SELECT user_id, ts,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM lag_all
      |),
      |ps_all AS (
      |  SELECT user_id, sid, epoch_us(min(ts)) AS s,
      |         epoch_us(max(ts)) + 1800000000 AS en
      |  FROM sess_all GROUP BY user_id, sid
      |),
      |wm2 AS (SELECT epoch_us(max(ts)) // 1000 - 600000 AS wm FROM e),
      |h1 AS (SELECT user_id, ts FROM e, b WHERE epoch_us(ts) <= cut),
      |lag_h1 AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM h1
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |),
      |sess_h1 AS (
      |  SELECT user_id, ts,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM lag_h1
      |),
      |ps_h1 AS (
      |  SELECT user_id, sid, epoch_us(max(ts)) + 1800000000 AS en
      |  FROM sess_h1 GROUP BY user_id, sid
      |),
      |wm1 AS (SELECT epoch_us(max(ts)) // 1000 - 600000 AS wm FROM h1),
      |n1 AS (SELECT CAST(count(*) AS BIGINT) AS c
      |       FROM ps_h1, wm1 WHERE en <= wm * 1000),
      |n_all AS (SELECT CAST(count(*) AS BIGINT) AS c
      |          FROM ps_all, wm2 WHERE en <= wm * 1000),
      |nm AS (SELECT CAST(count(*) AS BIGINT) AS c
      |       FROM ps_all, wm2, b
      |       WHERE en <= wm * 1000 AND s <= cut AND en - 1800000000 > cut)
      |SELECT '1_phase1' AS phase, c AS n_rows FROM n1
      |UNION ALL
      |SELECT '2_phase2', (SELECT c FROM n_all) - (SELECT c FROM n1)
      |UNION ALL
      |SELECT '3_merged_across_restart', c FROM nm
      |ORDER BY phase""".stripMargin

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q148_session_restart_live" -> (q148SessionRestartLive _),
    "q141_streaming_restart_dedup" -> (q141StreamingRestartDedup _),
    "q132_anomaly_windows" -> (q132AnomalyWindows _),
    "q124_session_funnel" -> (q124SessionFunnel _),
    "q125_retention_cohorts" -> (q125RetentionCohorts _),
    "q119_distribution_drift" -> (q119DistributionDrift _),
    "q117_heavy_hitters" -> (q117HeavyHitters _),
    "q32_event_windows" -> (q32EventWindows _),
    "q33_sessionize" -> (q33Sessions _),
    "q36_json_props" -> (q36JsonProps _),
    "q37_running_total" -> (q37RunningTotal _),
    "q38_approx_distinct" -> (q38ApproxDistinct _),
    "q46_sliding_windows" -> (q46SlidingWindows _),
    "q59_cms_heavy_hitters" -> (q59CmsHeavyHitters _),
    "q79_streaming_windows_live" -> (q79StreamingWindowsLive _),
    "q80_streaming_sessions_live" -> (q80StreamingSessionsLive _),
    "q96_streaming_interval_join_live" -> (q96StreamingIntervalJoinLive _),
    "q106_streaming_left_join_live" -> (q106StreamingLeftJoinLive _),
    "q97_streaming_dedup_live" -> (q97StreamingDedupLive _),
    "q102_session_window_live" -> (q102SessionWindowLive _)
  )

  def oracles: Map[String, String] = Map(
    "q148_session_restart_live" -> q148Oracle,
    "q141_streaming_restart_dedup" -> q141Oracle,
    "q132_anomaly_windows" -> q132Oracle,
    "q124_session_funnel" -> q124Oracle,
    "q125_retention_cohorts" -> q125Oracle,
    "q119_distribution_drift" -> q119Oracle,
    "q117_heavy_hitters" -> q117Oracle,
    "q32_event_windows" -> q32Oracle,
    "q33_sessionize" -> q33Oracle,
    "q36_json_props" -> q36Oracle,
    "q37_running_total" -> q37Oracle,
    "q38_approx_distinct" -> q38Oracle,
    "q46_sliding_windows" -> q46Oracle,
    "q59_cms_heavy_hitters" -> q59Oracle,
    "q79_streaming_windows_live" -> q79Oracle,
    "q80_streaming_sessions_live" -> q80Oracle,
    "q96_streaming_interval_join_live" -> q96Oracle,
    "q106_streaming_left_join_live" -> q106Oracle,
    "q97_streaming_dedup_live" -> q97Oracle,
    "q102_session_window_live" -> q102Oracle
  )
}
