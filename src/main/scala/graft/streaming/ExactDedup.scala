package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.Schemas

/** First-occurrence emission per key: a [[StatefulProcessor]] holding one
  * TTL'd boolean per key. Emits the key's first row ever seen (within the
  * TTL horizon) and swallows every later duplicate — the
  * `transformWithState` spelling of the store's `ignore_dup_key` dedup.
  *
  * Where [[StreamingEtl.dedupStream]] bounds state implicitly through the
  * event-time watermark, this processor manages the lifecycle explicitly:
  * RocksDB-backed `ValueState` with a processing-time TTL, so the state
  * footprint is (keys seen within TTL) regardless of event-time skew —
  * the right tool when sources replay history whose event times are far
  * behind the watermark (a full re-extract after watermark-table loss
  * would be silently deduplicated here, but dropped as "late" by the
  * watermarked form). A key re-emits after its TTL lapses; the
  * consolidated store's key-based append makes that replay a no-op, the
  * same two-layer argument the batch triangle makes.
  */
class FirstSeenProcessor(ttl: Option[Duration])
    extends StatefulProcessor[String, Row, Row] {

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Boolean](
      "seen", Encoders.scalaBoolean,
      ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  override def handleInputRows(
      key: String, rows: Iterator[Row],
      timerValues: TimerValues): Iterator[Row] =
    if (!rows.hasNext || seen.exists()) Iterator.empty
    else {
      seen.update(true)
      Iterator.single(rows.next())
    }
}

object ExactDedup {

  /** Streaming dedup on arbitrary key columns via `transformWithState`.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    *
    * `ttl = Some(horizon)` bounds state for continuously-running
    * queries; pass `None` for bounded (`Trigger.AvailableNow`) runs —
    * with a TTL configured, processing-time expiry keeps scheduling
    * maintenance micro-batches and an AvailableNow drain never settles
    * (observed: thousands of empty batches).
    */
  def dedupStreamExact(
      incoming: DataFrame,
      keyCols: Seq[String] = Schemas.dedupKey,
      ttl: Option[Duration] = Some(Duration.ofHours(24))): DataFrame = {
    val schema = incoming.schema
    val idx = keyCols.map(schema.fieldIndex)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(schema)
    incoming
      .groupByKey((r: Row) =>
        idx.map(i => String.valueOf(r.get(i))).mkString("|"))(Encoders.STRING)
      .transformWithState(
        new FirstSeenProcessor(ttl),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
      .toDF()
  }
}
