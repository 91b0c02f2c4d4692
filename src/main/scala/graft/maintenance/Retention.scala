package graft.maintenance

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retention cleanup (`Utility.CleanupSQLBackupHistoryConsolidated`,
  * reference sql:398-424): cutoff = the newest `backup_start_date` older
  * than `now - retentionDays`; rows strictly below the cutoff are
  * removed (the cutoff row itself survives, matching the reference's
  * `delete ... where backup_start_date < @CleanupToDate`).
  *
  * The reference loop-deletes 500 rows at a time purely to limit lock
  * pressure (sql:410-421); with immutable files the Spark shape is a
  * filter-and-rewrite, so batching is a non-goal (SURVEY §4).
  */
object Retention {

  /** Compute the cutoff (None = nothing old enough to clean). */
  def cleanupCutoff(df: DataFrame, retentionDays: Int, now: Timestamp): Option[Timestamp] = {
    val threshold = new Timestamp(now.getTime - retentionDays * 86400000L)
    Option(
      df.filter(col("backup_start_date") < lit(threshold))
        .agg(max("backup_start_date")).head().getTimestamp(0))
  }

  /** Rows surviving cleanup. */
  def retained(df: DataFrame, retentionDays: Int, now: Timestamp): DataFrame =
    cleanupCutoff(df, retentionDays, now) match {
      case None => df
      case Some(cutoff) => df.filter(col("backup_start_date") >= lit(cutoff))
    }
}
