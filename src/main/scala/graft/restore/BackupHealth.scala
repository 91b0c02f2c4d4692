package graft.restore

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fleet backup-health / RPO report — the operational dashboard the
  * reference's consolidated table exists to serve (its README sells
  * "restore scripts at your fingertips"; the question BEFORE any restore
  * is "which databases could I even restore, and how much would I
  * lose?"). Per (database, server): backup counts by type over
  * restorable devices (2=disk, 9=URL — sql:568), last finish time per
  * type, the point-in-time coverage bound (latest log if it extends
  * past the latest full, else the full itself), the RPO in minutes
  * against a deterministic fleet anchor (the newest finish anywhere —
  * wall-clock-free, so the report is replayable), and a health verdict.
  *
  * Scale shape: one combinable aggregation over one scan — every metric
  * is a conditional max/count, so the report is map-side-combinable and
  * the shuffle carries (db, server) groups only.
  */
object BackupHealth {

  def report(bh: DataFrame, rpoThresholdMinutes: Long = 1440L): DataFrame = {
    // max() over an empty frame yields one NULL row — an empty fleet
    // must produce an empty report, not an NPE on the anchor read
    val anchorUs = Option(bh
      .agg(max(unix_micros(col("backup_finish_date")))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val finishUs = unix_micros(col("backup_finish_date"))
    def ofType(t: String, c: org.apache.spark.sql.Column) =
      when(col("BackupType") === t, c)
    val g = bh
      .filter(col("device_type").isin(graft.model.DeviceTypes.Restorable: _*))
      .groupBy("database_name", "server_name")
      .agg(
        sum(when(col("BackupType") === "Full", 1L).otherwise(0L)).as("n_full"),
        sum(when(col("BackupType") === "Diff", 1L).otherwise(0L)).as("n_diff"),
        sum(when(col("BackupType") === "Log", 1L).otherwise(0L)).as("n_log"),
        max(ofType("Full", finishUs)).as("last_full_us"),
        max(ofType("Diff", finishUs)).as("last_diff_us"),
        max(ofType("Log", finishUs)).as("last_log_us"),
        max(finishUs).as("last_any_us"))
    g.select(
      col("database_name"), col("server_name"),
      col("n_full"), col("n_diff"), col("n_log"),
      col("last_full_us"), col("last_diff_us"), col("last_log_us"),
      floor((lit(anchorUs) - col("last_any_us")) / 60000000L)
        .as("rpo_minutes"),
      greatest(coalesce(col("last_log_us"), col("last_full_us")),
        col("last_full_us")).as("pit_cover_us"),
      (col("n_full") > 0 &&
        floor((lit(anchorUs) - col("last_any_us")) / 60000000L)
          <= rpoThresholdMinutes).as("healthy"))
  }
}
