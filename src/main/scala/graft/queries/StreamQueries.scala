package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{Sessionize, StreamingEtl}

/** Streaming-surface queries run in their batch-equivalent form (the
  * transforms are shared between modes; StreamingSpec drives the same
  * code through readStream/memory-sink). Oracles mirror the window and
  * session arithmetic.
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
      |       max(n_events) AS max_session_events, sum(n_events) AS n_total
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_event_windows" -> (q32EventWindows _),
    "q33_sessionize" -> (q33Sessions _)
  )

  def oracles: Map[String, String] = Map(
    "q32_event_windows" -> q32Oracle,
    "q33_sessionize" -> q33Oracle
  )
}
