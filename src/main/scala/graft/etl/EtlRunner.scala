package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.max

import graft.store.{ConsolidatedStore, WatermarkStore}

/** One ETL cycle result for one source server. */
final case class SourceBatchResult(
    server: String,
    extracted: Long,
    appended: Long,
    newWatermark: Option[Timestamp],
    error: Option[String]
)

/** The reference's driver loop (`Invoke-SQLBackupHistoryETL.ps1:31-73`)
  * with its exactly-once triangle (SURVEY §7 hard-part 7):
  *
  *  1. 5-minute watermark rewind on extract (ps:20) — catches late rows;
  *  2. idempotent dedup append (sql:33) — makes the overlap harmless;
  *  3. watermark advanced to the batch max(backup_finish_date) only
  *     AFTER a successful load (ps:44-67), never on an empty batch.
  *
  * Failure semantics preserved (SURVEY §2.9): extract failure skips that
  * server and continues; load/watermark failure aborts the run.
  *
  * The reference iterates servers strictly sequentially; each server's
  * pipeline is already fully distributed here, and independent servers
  * can safely run from concurrent driver threads because appends target
  * the same idempotent store.
  */
object EtlRunner {

  val DefaultWatermark: Timestamp = Timestamp.valueOf("1900-01-01 00:00:00")

  def runOnce(
      spark: SparkSession,
      sources: Map[String, MsdbSources],
      consolidatedPath: String,
      watermarkPath: String): Seq[SourceBatchResult] = {
    val watermarks = WatermarkStore.read(spark, watermarkPath)
    sources.toSeq.sortBy(_._1).map { case (server, src) =>
      val wm = watermarks.getOrElse(server, DefaultWatermark)
      // extract failure (e.g. unreadable source) skips this server only
      val extracted =
        try Some(ExtractTransform.extract(src, ExtractTransform.rewind(wm)).cache())
        catch { case _: Exception => None }
      extracted match {
        case None =>
          SourceBatchResult(server, 0, 0, None, Some("extract failed"))
        case Some(batch) =>
          try {
            val n = batch.count()
            if (n == 0) {
              // empty batch: do not advance the watermark (ps:69-71)
              SourceBatchResult(server, 0, 0, None, None)
            } else {
              val newWm = batch.agg(max("backup_finish_date")).head().getTimestamp(0)
              // load, then advance — order matters (ps:52-65); any failure
              // here aborts the whole run (Add-BackupHistoryToTarget.ps1:104-113)
              val appended = ConsolidatedStore.append(spark, consolidatedPath, batch)
              WatermarkStore.advance(spark, watermarkPath, server, newWm)
              SourceBatchResult(server, n, appended, Some(newWm), None)
            }
          } finally batch.unpersist()
      }
    }
  }
}
