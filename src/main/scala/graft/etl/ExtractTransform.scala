package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.BackupTypes

/** The reference's per-server extract query
  * (`Get-BackupHistoryToETL.ps1:22-75`) as one declarative DataFrame
  * transform: 5-way join + decorrelated JSON file-list aggregation +
  * watermark filter + type decode.
  *
  * Catalyst handles the physical side: the watermark filter and column
  * pruning push into the source scans (JDBC or parquet), the tiny
  * dimension sides (databases / replica states / AGs) broadcast, and the
  * only shuffles are the `backupfile` groupBy and — if the optimizer
  * declines to broadcast — the media-family join.
  *
  * The reference's OUTER APPLY + FOR JSON PATH (ps:65-70) has no Catalyst
  * surface; it decorrelates to groupBy(backup_set_id) + to_json + left
  * join (SURVEY §2.3 J5). FOR JSON's insertion order is nondeterministic
  * — we sort file entries by (file_number, logical_name) (SURVEY §4).
  */
object ExtractTransform {

  /** -5 minutes: the reference's late-row lookback
    * (`Get-BackupHistoryToETL.ps1:19-20`).
    */
  val LookbackMillis: Long = 5L * 60 * 1000

  def rewind(wm: Timestamp): Timestamp = new Timestamp(wm.getTime - LookbackMillis)

  /** Per-file JSON object matching the reference's FOR JSON PATH
    * projection shape (ps:65-70): string fields quoted, file_number
    * numeric, keys in projection order.
    */
  private val fileStruct: Column = struct(
    col("logical_name"), col("physical_drive"), col("physical_name"),
    col("file_type"), col("file_number"))

  /** Aggregate a backup set's surviving files (state <> 8, ps:68) into one
    * JSON array string, deterministic order.
    */
  def fileInfoJson(backupfile: DataFrame): DataFrame =
    backupfile
      .filter(col("state") =!= 8)
      .withColumn("__obj", to_json(fileStruct))
      .groupBy("backup_set_id")
      .agg(concat(
        lit("["),
        array_join(
          transform(
            array_sort(collect_list(struct(
              col("file_number").as("k1"), col("logical_name").as("k2"),
              col("__obj").as("v")))),
            x => x.getField("v")),
          ","),
        lit("]")).as("DBFileInformation"))

  /** Full extract: rows finishing at/after `sinceInclusive` (caller
    * applies the 5-minute rewind — see [[rewind]] and EtlRunner), shaped
    * to the consolidated schema minus LogID.
    *
    * @param sortOutput the reference query's ORDER BY backup_finish_date
    *   (ps:74). Presentation only — the ETL loop consumes the batch as a
    *   set (dedup append + max watermark), so [[EtlRunner]] passes false
    *   and skips the global range shuffle; q14, whose oracle states the
    *   ORDER BY, keeps it.
    */
  def extract(src: MsdbSources, sinceInclusive: Timestamp,
      sortOutput: Boolean = true): DataFrame = {
    val localReplicas = src.replicaStates
      .filter(col("is_local") === 1)
      .select("database_id", "group_id")
    val filtered = src.backupset
      .filter(col("backup_finish_date") >= lit(sinceInclusive))
      // database/diff/log only: msdb also records file/filegroup/partial
      // backups (type F/G/P/Q), which the reference's D/I/L decode
      // (ps:31-33) maps to NULL — its NOT-NULL target column then fails
      // the load row-by-row. Restore planning never consumes them, and
      // our consolidated schema declares BackupType non-nullable (a
      // schema lie would be a wrong-results hazard for pruned reads), so
      // they are excluded at the source — the predicate pushes into the
      // remote SELECT alongside the watermark bound
      .filter(col("type").isin("D", "I", "L"))
    // restrict the file-list aggregation to sets in the watermark window
    // BEFORE the groupBy: the left join below could never match the other
    // sets anyway (semantics identical), but Catalyst cannot infer a
    // join-based restriction through an aggregate — without the semi-join
    // a 3-row trickle window still paid a groupBy over the entire
    // backupfile table, the extract's biggest shuffle at steady state
    val files = fileInfoJson(
      src.backupfile.join(
        filtered.select("backup_set_id"), Seq("backup_set_id"), "left_semi"))
    val joined = filtered
      .join(src.backupmediafamily, Seq("media_set_id"))
      .join(broadcast(src.databases), col("database_name") === col("name"), "left")
      .join(broadcast(localReplicas), Seq("database_id"), "left")
      .join(broadcast(src.availabilityGroups), Seq("group_id"), "left")
      .join(files, Seq("backup_set_id"), "left")
    val projected = joined.select(
      col("database_name"),
      when(col("type") === "D", BackupTypes.Full)
        .when(col("type") === "I", BackupTypes.Diff)
        .when(col("type") === "L", BackupTypes.Log)
        .as("BackupType"),
      col("physical_device_name"),
      col("backup_start_date"),
      col("backup_finish_date"),
      col("server_name"),
      col("ag_name"),
      col("recovery_model"),
      col("first_lsn"),
      col("last_lsn"),
      floor(col("backup_size") / 1048576).cast("int").as("UncompressedSizeMB"),
      floor(col("compressed_backup_size") / 1048576).cast("int")
        .as("CompressedSizeMB"),
      col("is_copy_only"),
      col("encryptor_type"),
      col("key_algorithm"),
      col("device_type"),
      col("position"),
      col("DBFileInformation")
    )
    if (sortOutput) projected.orderBy(col("backup_finish_date")) else projected
  }
}
