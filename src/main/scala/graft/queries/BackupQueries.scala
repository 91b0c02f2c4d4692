package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.BackupHistoryDerivation.{canonicalFrame, lowercase, oracle}
import graft.restore.RestoreQueries

/** Oracle-checked queries over the derived backup-history relation,
  * exercising the reference's restore-chain surface (SURVEY §2.2-§2.7:
  * W1/W2/W3 windows, P4-P8 predicates, A5 ordered string-agg, J-joins,
  * O-orders). Spark side runs the real library code
  * ([[graft.restore.RestoreQueries]]); the DuckDB side re-derives the
  * same relation from the shared SQL text and mirrors the semantics.
  */
object BackupQueries {

  private val fullCols = Seq(
    "database_name", "server_name", "log_id", "physical_device_name",
    "first_lsn", "last_lsn", "backup_start_date", "device_type", "position")

  /** LSNs stay DECIMAL(25,0) inside the library (reference sql:17-18
    * NUMERIC(25,0)); final oracle-facing projections canonicalize them to
    * BIGINT so both engines serialize identically (the driver's hasher
    * renders decimals differently per engine; test LSNs fit in 63 bits).
    */
  private def lsnAsLong(df: DataFrame): DataFrame =
    df.withColumn("first_lsn", col("first_lsn").cast("bigint"))
      .withColumn("last_lsn", col("last_lsn").cast("bigint"))

  /** W1: newest full per (db, server), all stripes (dense_rank ties). */
  def q10LatestFull(spark: SparkSession, dir: String): DataFrame = {
    val bh = canonicalFrame(spark, dir)
    lsnAsLong(lowercase(RestoreQueries.latestFullBackupsPerKey(bh, "server_name"))
      .select(fullCols.map(col): _*))
      .orderBy(col("database_name"), col("server_name"), col("physical_device_name"))
  }

  val q10Oracle: String = oracle(
    """, ranked AS (
      |  SELECT database_name, server_name, log_id, physical_device_name,
      |         first_lsn, last_lsn, backup_start_date, device_type, position,
      |         dense_rank() OVER (PARTITION BY database_name, server_name
      |                            ORDER BY last_lsn DESC) AS rk
      |  FROM backup_history
      |  WHERE backup_type = 'Full' AND device_type IN (2, 9)
      |        AND server_name IS NOT NULL
      |)
      |SELECT database_name, server_name, log_id, physical_device_name,
      |       CAST(first_lsn AS BIGINT) AS first_lsn,
      |       CAST(last_lsn AS BIGINT) AS last_lsn,
      |       backup_start_date, device_type, position
      |FROM ranked WHERE rk = 1
      |ORDER BY database_name, server_name, physical_device_name""".stripMargin)

  /** P5+O2: every log past each (db, server)'s newest full, restore order. */
  def q11RemainingLogs(spark: SparkSession, dir: String): DataFrame = {
    val bh = canonicalFrame(spark, dir)
    lsnAsLong(lowercase(RestoreQueries.remainingLogBackupsPerKey(bh, "server_name"))
      .select(
        col("database_name"), col("server_name"), col("log_id"),
        col("physical_device_name"), col("first_lsn"), col("last_lsn")))
      .orderBy(
        col("database_name"), col("server_name"), col("last_lsn"), col("log_id"))
  }

  val q11Oracle: String = oracle(
    """, full_lsn AS (
      |  SELECT database_name, server_name, max(last_lsn) AS full_lsn
      |  FROM backup_history
      |  WHERE backup_type = 'Full' AND device_type IN (2, 9)
      |        AND server_name IS NOT NULL
      |  GROUP BY database_name, server_name
      |)
      |SELECT b.database_name, b.server_name, b.log_id,
      |       b.physical_device_name,
      |       CAST(b.first_lsn AS BIGINT) AS first_lsn,
      |       CAST(b.last_lsn AS BIGINT) AS last_lsn
      |FROM backup_history b
      |JOIN full_lsn f
      |  ON b.database_name = f.database_name AND b.server_name = f.server_name
      |WHERE b.backup_type = 'Log' AND b.last_lsn > f.full_lsn
      |ORDER BY b.database_name, b.server_name, b.last_lsn, b.log_id""".stripMargin)

  /** P8+U2: newest valid diff per (db, server) against the EARLIEST
    * non-copy-only full, exercising the blocking-full truncation
    * (a later real full invalidates older diffs).
    */
  def q12LastDiff(spark: SparkSession, dir: String): DataFrame = {
    val bh = canonicalFrame(spark, dir)
    val base = bh
      .filter(col("BackupType") === "Full")
      .filter(!coalesce(col("is_copy_only"), lit(false)))
      .filter(col("server_name").isNotNull)
      .groupBy("database_name", "server_name")
      .agg(min("last_lsn").as("base_lsn"))
    lsnAsLong(lowercase(RestoreQueries.lastDiffBackupsPerKey(bh, "server_name", base))
      .select(
        col("database_name"), col("server_name"), col("log_id"),
        col("physical_device_name"), col("first_lsn"), col("last_lsn")))
      .orderBy(col("database_name"), col("server_name"), col("physical_device_name"))
  }

  val q12Oracle: String = oracle(
    """, base AS (
      |  SELECT database_name, server_name, min(last_lsn) AS base_lsn
      |  FROM backup_history
      |  WHERE backup_type = 'Full' AND NOT coalesce(is_copy_only, false)
      |        AND server_name IS NOT NULL
      |  GROUP BY database_name, server_name
      |),
      |cand AS (
      |  SELECT b.*, f.base_lsn
      |  FROM backup_history b
      |  JOIN base f
      |    ON b.database_name = f.database_name AND b.server_name = f.server_name
      |  WHERE b.backup_type IN ('Diff', 'Full') AND b.last_lsn > f.base_lsn
      |),
      |blocking AS (
      |  SELECT database_name, server_name, min(last_lsn) AS block_lsn
      |  FROM cand
      |  WHERE backup_type = 'Full' AND NOT coalesce(is_copy_only, false)
      |  GROUP BY database_name, server_name
      |),
      |kept AS (
      |  SELECT c.* FROM cand c
      |  LEFT JOIN blocking k
      |    ON c.database_name = k.database_name AND c.server_name = k.server_name
      |  WHERE k.block_lsn IS NULL OR c.last_lsn < k.block_lsn
      |),
      |ranked AS (
      |  SELECT *, dense_rank() OVER (PARTITION BY database_name, server_name
      |                               ORDER BY last_lsn DESC) AS rk
      |  FROM kept WHERE backup_type = 'Diff'
      |)
      |SELECT database_name, server_name, log_id, physical_device_name,
      |       CAST(first_lsn AS BIGINT) AS first_lsn,
      |       CAST(last_lsn AS BIGINT) AS last_lsn
      |FROM ranked WHERE rk = 1
      |ORDER BY database_name, server_name, physical_device_name""".stripMargin)

  /** W2+A5: striped-log canonicalization + ordered multi-device FROM
    * clause aggregation.
    */
  def q13StripedLogCollapse(spark: SparkSession, dir: String): DataFrame = {
    val bh = canonicalFrame(spark, dir)
    lsnAsLong(RestoreQueries.collapseLogStripes(bh.filter(col("BackupType") === "Log"))
      .select(
        col("database_name"), col("canonical_id"), col("first_lsn"),
        col("last_lsn"), col("stripe_count"), col("from_clause")))
      .orderBy(col("database_name"), col("canonical_id"))
  }

  val q13Oracle: String = oracle(
    """, logs AS (
      |  SELECT *, min(log_id) OVER (PARTITION BY database_name, first_lsn, last_lsn)
      |           AS canonical_id
      |  FROM backup_history WHERE backup_type = 'Log'
      |)
      |SELECT database_name, canonical_id,
      |       CAST(first_lsn AS BIGINT) AS first_lsn,
      |       CAST(last_lsn AS BIGINT) AS last_lsn,
      |       count(*) AS stripe_count,
      |       string_agg(
      |         CASE WHEN device_type = 9 THEN 'URL = N''' ELSE 'DISK = N''' END
      |           || physical_device_name || '''',
      |         ',' || chr(10) ORDER BY physical_device_name) AS from_clause
      |FROM logs
      |GROUP BY database_name, canonical_id, first_lsn, last_lsn
      |ORDER BY database_name, canonical_id""".stripMargin)


  /** Fleet backup-health / RPO report ([[graft.restore.BackupHealth]]):
    * per-(db, server) counts by type, last finish per type, RPO minutes
    * against the deterministic fleet anchor, point-in-time coverage
    * bound, and the health verdict (has a full AND inside the RPO
    * budget — 3 days here so the fixture splits). Null-server rows drop
    * with their group; the oracle replays every conditional max and the
    * exact minute floor.
    */
  def q138BackupHealth(spark: SparkSession, dir: String): DataFrame =
    graft.restore.BackupHealth
      .report(canonicalFrame(spark, dir), rpoThresholdMinutes = 4320L)
      .filter(col("server_name").isNotNull)
      .orderBy("database_name", "server_name")

  val q138Oracle: String = oracle(
    """, anchor AS (
      |  SELECT max(epoch_us(backup_finish_date)) AS a FROM backup_history
      |),
      |r AS (
      |  SELECT database_name, server_name,
      |         CAST(sum(CASE WHEN backup_type = 'Full' THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_full,
      |         CAST(sum(CASE WHEN backup_type = 'Diff' THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_diff,
      |         CAST(sum(CASE WHEN backup_type = 'Log' THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_log,
      |         max(CASE WHEN backup_type = 'Full'
      |                  THEN epoch_us(backup_finish_date) END) AS last_full_us,
      |         max(CASE WHEN backup_type = 'Diff'
      |                  THEN epoch_us(backup_finish_date) END) AS last_diff_us,
      |         max(CASE WHEN backup_type = 'Log'
      |                  THEN epoch_us(backup_finish_date) END) AS last_log_us,
      |         max(epoch_us(backup_finish_date)) AS last_any_us
      |  FROM backup_history
      |  WHERE device_type IN (2, 9) AND server_name IS NOT NULL
      |  GROUP BY database_name, server_name
      |)
      |SELECT database_name, server_name, n_full, n_diff, n_log,
      |       last_full_us, last_diff_us, last_log_us,
      |       CAST(floor((anchor.a - last_any_us) / 60000000.0) AS BIGINT)
      |         AS rpo_minutes,
      |       greatest(coalesce(last_log_us, last_full_us), last_full_us)
      |         AS pit_cover_us,
      |       n_full > 0 AND
      |         floor((anchor.a - last_any_us) / 60000000.0) <= 4320
      |         AS healthy
      |FROM r, anchor
      |ORDER BY database_name, server_name""".stripMargin)

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_backup_health" -> (q138BackupHealth _),
    "q10_latest_full" -> (q10LatestFull _),
    "q11_remaining_logs" -> (q11RemainingLogs _),
    "q12_last_diff" -> (q12LastDiff _),
    "q13_striped_log_collapse" -> (q13StripedLogCollapse _)
  )

  def oracles: Map[String, String] = Map(
    "q138_backup_health" -> q138Oracle,
    "q10_latest_full" -> q10Oracle,
    "q11_remaining_logs" -> q11Oracle,
    "q12_last_diff" -> q12Oracle,
    "q13_striped_log_collapse" -> q13Oracle
  )
}
