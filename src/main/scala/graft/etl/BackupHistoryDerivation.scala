package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StringType

/** Deterministic derivation of a backup-history relation from the driver's
  * `events` test table.
  *
  * The reference's domain tables (`Utility.SQLBackupHistoryConsolidated`,
  * reference sql:7-28) don't exist in the driver's test data, so every
  * oracle-checked backup query derives the same relation — from the same
  * SQL text — in both engines: Spark executes [[withClauses]] via
  * `spark.sql`, and the DuckDB oracle embeds it in a WITH prefix. The text
  * is dialect-neutral (floor-division, `||` concat, ANSI CASE) so the two
  * engines produce byte-identical relations.
  *
  * Shape: every 3 consecutive event_ids form one backup set (sharing
  * first/last LSN and start date = min ts of the set); `set_id % 3` picks
  * 1-3 stripes per set; `set_id % 7` deals type Full/Diff/Log; `% 13`
  * makes some fulls copy-only; `% 4` sends some sets to URL devices.
  */
object BackupHistoryDerivation {

  /** WITH-clause body defining `backup_history`; shared verbatim between
    * Spark and the DuckDB oracle. References table/view `events`.
    */
  val withClauses: String =
    """bh_base AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |         CAST(floor(event_id / 3.0) AS BIGINT) AS set_id,
      |         event_id % 3 AS stripe_id
      |  FROM events
      |),
      |bh_sets AS (
      |  SELECT *, min(ts) OVER (PARTITION BY set_id) AS set_ts FROM bh_base
      |),
      |backup_history AS (
      |  SELECT
      |    event_id                                   AS log_id,
      |    'db' || (set_id % 5)                       AS database_name,
      |    CASE WHEN set_id % 7 = 0 THEN 'Full'
      |         WHEN set_id % 7 = 3 THEN 'Diff'
      |         ELSE 'Log' END                        AS backup_type,
      |    CASE WHEN set_id % 4 = 0
      |         THEN 'https://bk.example.com/db' || (set_id % 5) || '/s' || set_id || '_' || stripe_id || '.bak'
      |         ELSE 'X:/bk/db' || (set_id % 5) || '/s' || set_id || '_' || stripe_id || '.bak'
      |    END                                        AS physical_device_name,
      |    set_ts                                     AS backup_start_date,
      |    set_ts                                     AS backup_finish_date,
      |    'srv' || ((set_id % 5) % 3)                AS server_name,
      |    CASE WHEN (set_id % 5) % 2 = 0
      |         THEN 'ag' || (set_id % 5) END         AS ag_name,
      |    'FULL'                                     AS recovery_model,
      |    CAST(set_id * 1000 AS DECIMAL(25,0))       AS first_lsn,
      |    CAST(set_id * 1000 + 999 AS DECIMAL(25,0)) AS last_lsn,
      |    CAST(floor(value * 100) AS INT)            AS uncompressed_size_mb,
      |    CAST(floor(value * 37) AS INT)             AS compressed_size_mb,
      |    (set_id % 13 = 0)                          AS is_copy_only,
      |    CASE WHEN set_id % 4 = 0 THEN 9 ELSE 2 END AS device_type,
      |    CAST(set_id % 16 + 1 AS INT)               AS position,
      |    '[{"logical_name":"db' || (set_id % 5) || '_data","physical_drive":"X:","physical_name":"X:/data/db' || (set_id % 5) || '.mdf","file_type":"D","file_number":"1"},{"logical_name":"db' || (set_id % 5) || '_log","physical_drive":"L:","physical_name":"L:/log/db' || (set_id % 5) || '.ldf","file_type":"L","file_number":"2"}]'
      |                                               AS db_file_information
      |  FROM bh_sets
      |  WHERE stripe_id <= set_id % 3
      |)""".stripMargin

  /** Wrap an oracle SELECT body with the shared derivation prefix. */
  def oracle(body: String): String = s"WITH $withClauses\n$body"

  /** Spark-side derived relation, lowercase column names (oracle parity).
    * `CAST(ts AS TIMESTAMP)` in the shared text is a no-op here (Tables
    * .events already normalized to microseconds) and truncates DuckDB's
    * TIMESTAMP_NS to the same microsecond value there.
    *
    * Memoized + cached per (session, dir): the derivation (a window over
    * the events scan) is shared test scaffolding for a dozen queries —
    * without the cache every planner phase re-derives it and benchmarks
    * measure scaffolding instead of the operator under test.
    */
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def frame(spark: SparkSession, sfDir: String): DataFrame =
    memo.getOrElseUpdate((spark, sfDir), {
      graft.Tables.events(spark, sfDir).createOrReplaceTempView("events")
      spark.sql(s"WITH $withClauses SELECT * FROM backup_history").cache()
    })

  /** Bench-only: drop the memoized derivation so a caller that just
    * cleared the session cache can rebuild a live entry instead of
    * holding a reference whose cache backing is gone.
    */
  private[graft] def reset(spark: SparkSession, sfDir: String): Unit =
    memo.remove((spark, sfDir)).foreach(_.unpersist(blocking = true))

  /** derived lowercase name → canonical consolidated-schema name
    * (FIXTURES.md §1); columns absent from the derivation are added as
    * NULL so library code sees the full 19-column schema.
    */
  private val renames: Seq[(String, String)] = Seq(
    "log_id" -> "LogID",
    "backup_type" -> "BackupType",
    "uncompressed_size_mb" -> "UncompressedSizeMB",
    "compressed_size_mb" -> "CompressedSizeMB",
    "db_file_information" -> "DBFileInformation"
  )

  /** Rename the derived relation to the canonical consolidated schema the
    * library operates on.
    */
  def canonical(derived: DataFrame): DataFrame = {
    val renamed = renames.foldLeft(derived) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    renamed
      .withColumn("encryptor_type", lit(null).cast(StringType))
      .withColumn("key_algorithm", lit(null).cast(StringType))
  }

  /** Canonical-named frame in one step. */
  def canonicalFrame(spark: SparkSession, sfDir: String): DataFrame =
    canonical(frame(spark, sfDir))

  /** canonical name → derived lowercase name, for projecting library
    * output back to oracle-comparable lowercase columns.
    */
  def lowercase(df: DataFrame): DataFrame =
    renames.foldLeft(df) { case (acc, (lower, canon)) =>
      if (acc.columns.contains(canon)) acc.withColumnRenamed(canon, lower) else acc
    }
}
