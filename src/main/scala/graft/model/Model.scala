package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * Mirrors the reference's two persistent tables and its JSON nested
  * structure (reference: `SQLObjects/SQLObjectsToCreateOnTarget.sql:7-51`,
  * `Functions/Get-BackupHistoryToETL.ps1:65-70`), re-expressed as Spark
  * case classes + explicit `StructType`s.
  */

/** One row of the consolidated backup-history fact table
  * (reference sql:7-28). LSNs are `BigDecimal` — the reference declares
  * `numeric(25,0)` (sql:18-19) and every restore-chain comparison is an
  * order comparison on this column, so `DecimalType(25,0)` end-to-end.
  */
final case class BackupHistoryRecord(
    LogID: Long,
    database_name: String,
    BackupType: String,
    physical_device_name: Option[String],
    backup_start_date: Timestamp,
    backup_finish_date: Timestamp,
    server_name: Option[String],
    ag_name: Option[String],
    recovery_model: Option[String],
    first_lsn: BigDecimal,
    last_lsn: BigDecimal,
    UncompressedSizeMB: Option[Int],
    CompressedSizeMB: Option[Int],
    is_copy_only: Option[Boolean],
    encryptor_type: Option[String],
    key_algorithm: Option[String],
    device_type: Option[Int],
    position: Option[Int],
    DBFileInformation: Option[String]
)

/** Per-source watermark row (reference sql:42-51). */
final case class SourceServerWatermark(
    ServerName: String,
    LastETLDatetime: Timestamp
)

/** One element of the `DBFileInformation` JSON array; schema fixed by the
  * reference's `for json path` projection (ps:Get-BackupHistoryToETL.ps1:65-70)
  * and `openjson ... with (...)` consumer (sql:739-744). All strings, per
  * the consumer.
  */
final case class DbFileInfo(
    logical_name: String,
    physical_drive: String,
    physical_name: String,
    file_type: String, // 'D' data | 'L' log (sql:749-756)
    file_number: String
)

/** One step of a generated restore plan (mirrors `#AllBackupsToRestore`,
  * reference sql:514-531). `from_clause` is the multi-device FROM list
  * (one line per stripe); `physical_devices` is the plain comma-joined
  * device csv (`@ConcatenatedPhysicalDevice`, reference sql:786-787 —
  * the reference's string_agg order is undefined, we sort by device
  * name); `stop_at`, when set, is the STOPAT literal the command carries
  * (last two log restores, reference sql:1262-1273).
  */
final case class RestoreStep(
    RestoreID: Long,
    database_name: String,
    BackupType: String,
    backup_start_date: Timestamp,
    first_lsn: BigDecimal,
    last_lsn: BigDecimal,
    from_clause: String,
    physical_devices: String,
    stop_at: Option[String],
    RestoreCommand: String
)

object BackupTypes {
  /** msdb `type` code decode (ps:Get-BackupHistoryToETL.ps1:31-33). */
  val Full = "Full"
  val Diff = "Diff"
  val Log = "Log"
}

object DeviceTypes {
  /** 2 = disk, 9 = URL (reference sql:568, 776-778). */
  val Disk = 2
  val Url = 9
  /** Restorable device types (reference sql:568, 625). */
  val Restorable: Seq[Int] = Seq(Disk, Url)
}

object Schemas {

  val lsnType: DecimalType = DecimalType(25, 0)

  /** `Utility.SQLBackupHistoryConsolidated` (reference sql:7-28). */
  val consolidated: StructType = StructType(Seq(
    StructField("LogID", LongType, nullable = false),
    StructField("database_name", StringType, nullable = false),
    StructField("BackupType", StringType, nullable = false),
    StructField("physical_device_name", StringType, nullable = true),
    StructField("backup_start_date", TimestampType, nullable = false),
    StructField("backup_finish_date", TimestampType, nullable = false),
    StructField("server_name", StringType, nullable = true),
    StructField("ag_name", StringType, nullable = true),
    StructField("recovery_model", StringType, nullable = true),
    StructField("first_lsn", lsnType, nullable = false),
    StructField("last_lsn", lsnType, nullable = false),
    StructField("UncompressedSizeMB", IntegerType, nullable = true),
    StructField("CompressedSizeMB", IntegerType, nullable = true),
    StructField("is_copy_only", BooleanType, nullable = true),
    StructField("encryptor_type", StringType, nullable = true),
    StructField("key_algorithm", StringType, nullable = true),
    StructField("device_type", IntegerType, nullable = true),
    StructField("position", IntegerType, nullable = true),
    StructField("DBFileInformation", StringType, nullable = true)
  ))

  /** `Utility.SQLBackupHistorySourceServers` (reference sql:42-51). */
  val sourceServers: StructType = StructType(Seq(
    StructField("ServerName", StringType, nullable = false),
    StructField("LastETLDatetime", TimestampType, nullable = false)
  ))

  /** Element schema of the `DBFileInformation` JSON array (sql:739-744). */
  val dbFileInfoElement: StructType = StructType(Seq(
    StructField("logical_name", StringType),
    StructField("physical_drive", StringType),
    StructField("physical_name", StringType),
    StructField("file_type", StringType),
    StructField("file_number", StringType)
  ))

  val dbFileInfoArray: ArrayType = ArrayType(dbFileInfoElement)

  /** Dedup key of the consolidated table's unique `ignore_dup_key` index
    * (reference sql:33) — the idempotence contract of the whole ETL.
    */
  val dedupKey: Seq[String] =
    Seq("last_lsn", "first_lsn", "database_name", "physical_device_name")
}
