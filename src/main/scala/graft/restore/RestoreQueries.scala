package graft.restore

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{BackupTypes, DeviceTypes}

/** The reference's restore-chain query surface
  * (`GetLatestFullBackupFromSQLBackupHistoryConsolidated`,
  * `GetLastDiffBackupFromSQLBackupHistoryConsolidated`,
  * `GetRemainingLogBackupsFromSQLBackupHistoryConsolidated`,
  * reference sql:103-396) as pure DataFrame functions over the canonical
  * consolidated schema (FIXTURES.md §1).
  *
  * Two shapes per query:
  *  - *vectorized* (`...PerKey`): windows partitioned by
  *    `(database_name, key)` — the scale path; one shuffle on the group
  *    key, no driver round-trips, works for every database at once.
  *  - *scalar* (`...For`): the reference's per-(db, key) proc semantics
  *    including the server→AG fallback (sql:145-170) — filters to a tiny
  *    slice first, so the unpartitioned window is safe.
  */
object RestoreQueries {

  private val restorableDevice: Column =
    col("device_type").isin(DeviceTypes.Restorable.map(Integer.valueOf): _*)

  private def notCopyOnly: Column = !coalesce(col("is_copy_only"), lit(false))

  /** W1+W3 idiom (reference sql:138, 562, 619, 862, 918): keep ALL stripes
    * of the newest backup set — dense_rank (not row_number) over
    * `last_lsn` desc so LSN ties (= stripes of one striped set) survive.
    */
  def rankOneStripes(df: DataFrame, partitionCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("last_lsn").desc)
    df.withColumn("__rk", dense_rank().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Newest restorable full per (database, key) — all stripes
    * (reference sql:103-183 vectorized; filters sql:140-142, 564-568).
    *
    * @param keyCol "server_name" or "ag_name" (the two covering-index
    *               access paths, reference sql:35-37)
    * @param asOf   optional point-in-time bound (`backup_start_date <=`)
    */
  def latestFullBackupsPerKey(
      bh: DataFrame,
      keyCol: String,
      asOf: Option[Column] = None): DataFrame = {
    val base = bh
      .filter(col("BackupType") === BackupTypes.Full)
      .filter(restorableDevice)
      .filter(col(keyCol).isNotNull)
    val bounded = asOf.fold(base)(t => base.filter(col("backup_start_date") <= t))
    rankOneStripes(bounded, Seq("database_name", keyCol))
  }

  /** All log backups past each (database, key)'s base full, restore
    * order (reference sql:188-268 vectorized). The per-group max-LSN
    * aggregate is tiny (|db × key|) → broadcast to the log scan, so the
    * big side never shuffles.
    *
    * The log chain must roll forward from the full that will actually be
    * RESTORED, so the base must agree with [[latestFullBackupsPerKey]]'s
    * pick: pass that frame's `(database_name, keyCol, last_lsn)` as
    * `baseLsns` when composing (mirrors the reference scalar's explicit
    * `@LastLSN` parameter, sql:200). The default derivation applies the
    * same restorable-device filter the full picker does — a newer full
    * on a non-restorable device (tape/VDI) must not truncate the chain
    * below the full a restore can actually start from.
    *
    * @param baseLsns optional per-group base `(database_name, keyCol,
    *                 full_lsn)` — typically the chosen full's last_lsn
    */
  def remainingLogBackupsPerKey(bh: DataFrame, keyCol: String,
      baseLsns: Option[DataFrame] = None): DataFrame = {
    val fullLsn = baseLsns.getOrElse(bh
      .filter(col("BackupType") === BackupTypes.Full)
      .filter(restorableDevice)
      .filter(col(keyCol).isNotNull)
      .groupBy("database_name", keyCol)
      .agg(max("last_lsn").as("full_lsn")))
    bh.filter(col("BackupType") === BackupTypes.Log)
      .join(broadcast(fullLsn), Seq("database_name", keyCol))
      .filter(col("last_lsn") > col("full_lsn"))
  }

  /** Newest valid differential per (database, key) given per-group base
    * LSNs (reference sql:271-396 vectorized). Implements the blocking-full
    * truncation (sql:346-369): a diff taken after a newer *non-copy-only*
    * full belongs to that full, not ours — drop every candidate at/after
    * the earliest such full.
    *
    * @param baseLsns per-group base: (database_name, keyCol, base_lsn) —
    *                 typically the chosen full's last_lsn
    */
  def lastDiffBackupsPerKey(
      bh: DataFrame,
      keyCol: String,
      baseLsns: DataFrame): DataFrame = {
    val groupKeys = Seq("database_name", keyCol)
    val candidates = bh
      .filter(col("BackupType").isin(BackupTypes.Diff, BackupTypes.Full))
      .join(broadcast(baseLsns), groupKeys)
      .filter(col("last_lsn") > col("base_lsn"))
    val blocking = candidates
      .filter(col("BackupType") === BackupTypes.Full && notCopyOnly)
      .groupBy(groupKeys.map(col): _*)
      .agg(min("last_lsn").as("block_lsn"))
    val kept = candidates
      .join(broadcast(blocking), groupKeys, "left")
      .filter(col("block_lsn").isNull || col("last_lsn") < col("block_lsn"))
    rankOneStripes(
      kept.filter(col("BackupType") === BackupTypes.Diff), groupKeys)
      .drop("base_lsn", "block_lsn")
  }

  /** Reference's server→AG fallback combinator (sql:145-170): run the
    * query keyed by `server_name = key`; zero rows → retry keyed by
    * `ag_name = key`. Driver-side emptiness probe on an already-tiny
    * filtered slice.
    */
  def withServerAgFallback(bh: DataFrame, databaseName: String, key: String)(
      query: (DataFrame, String) => DataFrame): DataFrame = {
    val forDb = bh.filter(col("database_name") === databaseName)
    val byServer = query(forDb.filter(col("server_name") === key), "server_name")
    if (byServer.isEmpty) query(forDb.filter(col("ag_name") === key), "ag_name")
    else byServer
  }

  /** Scalar `GetLatestFullBackup...` (reference sql:103-183). */
  def latestFullBackupFor(
      bh: DataFrame,
      databaseName: String,
      key: String,
      asOf: Option[Column] = None): DataFrame =
    withServerAgFallback(bh, databaseName, key) { (slice, _) =>
      val base = slice
        .filter(col("BackupType") === BackupTypes.Full)
        .filter(restorableDevice)
      val bounded = asOf.fold(base)(t => base.filter(col("backup_start_date") <= t))
      rankOneStripes(bounded, Seq("database_name"))
    }

  /** Scalar `GetRemainingLogBackups...` (reference sql:188-268). */
  def remainingLogBackupsFor(
      bh: DataFrame,
      databaseName: String,
      key: String,
      lastLsn: BigDecimal): DataFrame =
    withServerAgFallback(bh, databaseName, key) { (slice, _) =>
      slice
        .filter(col("BackupType") === BackupTypes.Log)
        .filter(col("last_lsn") > lit(lastLsn.bigDecimal))
        .orderBy(col("last_lsn"))
    }

  /** Scalar `GetLastDiffBackup...` (reference sql:271-396) including the
    * blocking-full truncation (sql:346-369).
    */
  def lastDiffBackupFor(
      bh: DataFrame,
      databaseName: String,
      key: String,
      lastLsn: BigDecimal): DataFrame =
    withServerAgFallback(bh, databaseName, key) { (slice, _) =>
      val candidates = slice
        .filter(col("BackupType").isin(BackupTypes.Diff, BackupTypes.Full))
        .filter(col("last_lsn") > lit(lastLsn.bigDecimal))
      val blockingLsn = candidates
        .filter(col("BackupType") === BackupTypes.Full && notCopyOnly)
        .agg(min("last_lsn"))
        .head.getDecimal(0)
      val kept =
        if (blockingLsn == null) candidates
        else candidates.filter(col("last_lsn") < lit(blockingLsn))
      rankOneStripes(
        kept.filter(col("BackupType") === BackupTypes.Diff),
        Seq("database_name"))
    }

  /** Striped-log collapse (reference sql:1044-1128): canonicalize each
    * striped log set to `min(LogID)` over its LSN pair (W2, sql:1049),
    * then aggregate the stripes' device clauses into one multi-device
    * FROM list. The reference's `string_agg` feeds insertion order —
    * nondeterministic — so we sort by device name (SURVEY §4).
    * Newlines: reference emits `char(13)` (CR); we emit LF.
    */
  def collapseLogStripes(logs: DataFrame): DataFrame = {
    val w = Window.partitionBy("database_name", "first_lsn", "last_lsn")
    val deviceClause = concat(
      when(col("device_type") === DeviceTypes.Url, lit("URL = N'"))
        .otherwise(lit("DISK = N'")),
      col("physical_device_name"), lit("'"))
    logs
      .withColumn("canonical_id", min("LogID").over(w))
      .withColumn("__clause", deviceClause)
      .groupBy("database_name", "canonical_id", "first_lsn", "last_lsn")
      .agg(
        count(lit(1)).as("stripe_count"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              col("physical_device_name").as("k"), col("__clause").as("v")))),
            x => x.getField("v")),
          ",\n").as("from_clause"),
        max("position").as("position"),
        max("backup_start_date").as("backup_start_date"),
        // @ConcatenatedPhysicalDevice analog (reference sql:786-787)
        array_join(array_sort(collect_list(col("physical_device_name"))), ", ")
          .as("physical_devices"))
  }
}
