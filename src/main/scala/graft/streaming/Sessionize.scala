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
private final case class OpenSessions(sessions: Seq[SessionState])

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

  /** High-water-mark accumulator (merge/add = max) — task retries can
    * only re-observe a value, never inflate it.
    */
  final class MaxAccumulator
      extends org.apache.spark.util.AccumulatorV2[Long, Long] {
    private var _v = 0L
    override def isZero: Boolean = _v == 0L
    override def copy(): MaxAccumulator = {
      val c = new MaxAccumulator; c._v = _v; c
    }
    override def reset(): Unit = _v = 0L
    override def add(v: Long): Unit = _v = math.max(_v, v)
    override def merge(
        other: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
      _v = math.max(_v, other.value)
    override def value: Long = _v
  }

  /** Idempotent per-key open-session census. `add((key, n))` SETS the
    * key's open count — a task retry or speculative duplicate re-applies
    * the same value instead of inflating a delta, which makes the census
    * exact accounting, not trend observability. A count of 0 is a
    * tombstone: task partials keep it explicitly (it must survive into
    * the driver merge to clear the key there); the driver map drops the
    * entry on merge, so long-run driver memory is O(keys with open
    * sessions) — the same order as the operator's own state.
    */
  final class OpenCensusAccumulator extends
      org.apache.spark.util.AccumulatorV2[(Long, Long), Map[Long, Long]] {
    private val m = scala.collection.mutable.HashMap.empty[Long, Long]
    override def isZero: Boolean = m.isEmpty
    override def copy(): OpenCensusAccumulator = {
      val c = new OpenCensusAccumulator; c.m ++= m; c
    }
    override def reset(): Unit = m.clear()
    override def add(kv: (Long, Long)): Unit = m(kv._1) = kv._2
    override def merge(other: org.apache.spark.util.AccumulatorV2[
        (Long, Long), Map[Long, Long]]): Unit =
      other.value.foreach {
        case (k, 0L) => m.remove(k)
        case (k, v) => m(k) = v
      }
    override def value: Map[Long, Long] = m.toMap
  }

  /** Open-session state observability for [[sessionizeStream]]. The
    * exact multi-session state is a per-key OPEN-session list; under a
    * stalled watermark that list grows with the number of disjoint
    * in-flight sessions — correct (exactness requires it) but invisible
    * until it is an OOM. Two gauges make the growth observable, both
    * retry-proof:
    *
    *  - `maxOpenPerKey`: high-water mark of any one key's open-session
    *    list (a max accumulator);
    *  - `openSessions`: EXACT net open sessions across all keys — every
    *    state transition stamps its key's absolute open count into the
    *    [[OpenCensusAccumulator]] (idempotent set, not a signed delta),
    *    so the value is a per-batch-end census the trend line can alert
    *    on directly.
    *
    * Read the values between micro-batches (driver-side); alert when
    * either keeps rising across batches — that is a stalled watermark or
    * a key whose events never pause for a full gap.
    */
  final class SessionizeMetrics(spark: SparkSession) extends Serializable {
    val openCensus = new OpenCensusAccumulator
    spark.sparkContext.register(openCensus, "sessionize.openCensus")
    val maxOpenPerKey = new MaxAccumulator
    spark.sparkContext.register(maxOpenPerKey, "sessionize.maxOpenPerKey")
    /** Exact net open sessions across all keys, as of each key's latest
      * completed state transition.
      */
    def openSessions: Long = openCensus.value.values.sum
  }

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

  /** Streaming: emit a SessionSummary when the WATERMARK closes it —
    * exact multi-session state (the MergingSessions semantics).
    *
    * Out-of-order contract, now exact within the watermark: events older
    * than the watermark are dropped (`flatMapGroupsWithState` does not
    * filter late input itself); every OPEN session stays in the per-key
    * state list, so an in-watermark event merges into whichever
    * session's `[start − gap, last + gap]` interval it lands in —
    * extending `start` downward or `last` upward, BRIDGING two sessions
    * it touches on both sides, or opening a fresh (possibly earlier)
    * session of its own. A session is emitted only once no in-watermark
    * event can still reach it: `end_us + gap_us < wm_ms * 1000`
    * (µs-exact — admissible events satisfy `ts_us >= wm_ms * 1000`, so
    * the strict inequality is the precise can-never-grow test; the q148
    * session_window lesson says ms-floored comparisons admit sub-ms
    * events the state would still accept). State per key is the OPEN
    * sessions only — bounded by the key's in-flight burst, evicted
    * against the watermark via event-time timeouts armed at the earliest
    * open session's close.
    */
  def sessionizeStream(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapMinutes: Int,
      metrics: Option[SessionizeMetrics] = None): Dataset[SessionSummary] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    // emit everything the watermark has sealed; keep + re-arm the rest.
    // The census stamp is the key's ABSOLUTE open count after this
    // transition — idempotent under task retries (see
    // OpenCensusAccumulator), zero acting as the key's tombstone.
    def evict(user: Long, all: Seq[SessionState], wmUs: Long,
        state: GroupState[OpenSessions])
        : Iterator[SessionSummary] = {
      val (closed, open) = all.partition(s => micros(s.last) + gapUs < wmUs)
      metrics.foreach { m =>
        m.openCensus.add(user -> open.size.toLong)
        m.maxOpenPerKey.add(open.size.toLong)
      }
      if (open.nonEmpty) {
        state.update(OpenSessions(open.sortBy(s => micros(s.start))))
        // earliest close, ms-floored: <= the exact close, so the timeout
        // fires no later than the eviction becomes due; the max() keeps
        // Spark's timeout>watermark requirement on the sub-ms edge
        val nextClose = open
          .map(s => s.last.getTime + gapMinutes * 60000L).min
        state.setTimeoutTimestamp(
          math.max(nextClose, state.getCurrentWatermarkMs + 1L))
      } else if (state.exists) state.remove()
      closed.sortBy(s => (micros(s.start), micros(s.last))).iterator
        .map(s => SessionSummary(user, s.start, s.last, s.n))
    }
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent],
            state: GroupState[OpenSessions]) =>
          val wmUs = state.getCurrentWatermarkMs * 1000L
          if (state.hasTimedOut)
            evict(user, state.getOption.map(_.sessions).getOrElse(Nil),
              wmUs, state)
          else {
            val sorted = rows.filter(e => micros(e.ts) >= wmUs)
              .toSeq.sortBy(e => (micros(e.ts), e.event_id))
            // interval merge over ALL open sessions: each event merges
            // into every session it touches (bridging when it touches
            // two) or opens a new one
            var sessions =
              state.getOption.map(_.sessions.toList).getOrElse(Nil)
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
            evict(user, sessions, wmUs, state)
          }
      }
  }
}
