package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)
final case class SessionSummary(
    user_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long)
private final case class SessionState(
    start: Timestamp, last: Timestamp, n: Long)

/** Gap-based sessionization — the canonical custom-state streaming
  * operator (windows/sessions are ABSENT in the reference; this is part
  * of the engine's streaming extension surface).
  *
  * Two implementations with identical semantics:
  *  - [[assignSessions]]: batch, pure window functions (lag + running sum
  *    of session-breaks) — one shuffle on user_id, linear in events;
  *  - [[sessionizeStream]]: streaming, `flatMapGroupsWithState` with
  *    event-time timeout — state per live user only, emitted when the gap
  *    (watermark) closes the session.
  */
object Sessionize {

  /** Batch: tag each event with a per-user session_id (1-based).
    * Gap arithmetic in microseconds (second-truncation would disagree
    * with an exact oracle at the boundary).
    */
  def assignSessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val um = unix_micros(col("ts"))
    val gap = um - lag(um, 1).over(byUser)
    events
      .withColumn("is_new",
        when(gap.isNull || gap > gapMinutes * 60000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("is_new")
  }

  /** Batch: one row per (user, session) with bounds and size. */
  def sessionSummaries(events: DataFrame, gapMinutes: Int): DataFrame =
    assignSessions(events, gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"))

  /** Microsecond-exact epoch of a Timestamp (getTime alone truncates to
    * millis, which would diverge from the batch/window-function twin).
    */
  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming: emit a SessionSummary when a user's gap times out.
    *
    * Out-of-order contract (matches `session_window`'s shape as far as
    * single-session state allows): events older than the WATERMARK are
    * dropped (`flatMapGroupsWithState` does not filter late input
    * itself); an in-watermark event landing inside the open session's
    * `[start − gap, last + gap]` interval MERGES, extending `start`
    * downward exactly as the batch twin's sorted pass would — not just
    * `last` upward; an in-watermark event older than `start − gap` forms
    * its own earlier session. Residual approximation vs the batch twin
    * (documented, watermark-bounded): a non-latest session is emitted as
    * soon as a later disjoint session exists, so an even-later-arriving
    * in-watermark event that would have joined it in batch starts a new
    * session instead of merging — full fidelity needs multi-session
    * state (Spark's MergingSessions); the engine's oracle-gated
    * session_window paths provide that, this operator trades it for
    * O(1) per-user state.
    */
  def sessionizeStream(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapMinutes: Int): Dataset[SessionSummary] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(user, s.start, s.last, s.n))
          } else {
            val wmUs = state.getCurrentWatermarkMs * 1000L
            val sorted = rows.filter(e => micros(e.ts) >= wmUs)
              .toSeq.sortBy(e => (micros(e.ts), e.event_id))
            // batch-local interval merge, seeded from the open session:
            // ascending order means each event either merges into an
            // existing interval (possibly bridging two) or opens a new
            // one; everything but the latest interval closes
            var sessions = state.getOption.toList
            sorted.foreach { e =>
              val eUs = micros(e.ts)
              val (touch, rest) = sessions.partition(s =>
                eUs >= micros(s.start) - gapUs && eUs <= micros(s.last) + gapUs)
              val merged =
                if (touch.isEmpty) SessionState(e.ts, e.ts, 1)
                else SessionState(
                  touch.minBy(s => micros(s.start)).start match {
                    case st if micros(st) <= eUs => st
                    case _ => e.ts
                  },
                  touch.maxBy(s => micros(s.last)).last match {
                    case la if micros(la) >= eUs => la
                    case _ => e.ts
                  },
                  touch.map(_.n).sum + 1)
              sessions = (merged :: rest).sortBy(s => micros(s.start))
            }
            val (closed, open) = sessions match {
              case Nil => (Nil, None)
              case ss => (ss.init, Some(ss.last))
            }
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(math.max(
                  s.last.getTime + gapMinutes * 60000L,
                  state.getCurrentWatermarkMs + 1L))
              case None => if (state.exists) state.remove()
            }
            closed.iterator.map(s => SessionSummary(user, s.start, s.last, s.n))
          }
      }
  }
}
