package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.BackupHistoryDerivation.{canonicalFrame, oracle}
import graft.script.{RestoreScriptGenerator, RestoreScriptOptions}

/** The full point-in-time restore planner end-to-end (SURVEY §3.2) on the
  * derived backup history: q18 checks the chain structure (which backup
  * sets, in which order, with which multi-device FROM clauses and STOPAT
  * flags) against a DuckDB oracle that re-implements the planner in SQL;
  * q19 exposes the rendered commands (rows-only check — command text is
  * engine-defined).
  */
object ScriptQueries {

  private val T = Timestamp.valueOf("2024-01-20 00:00:00")
  private val opts = RestoreScriptOptions(
    sourceDb = "db0", sourceServer = Some("srv0"), restoreToTime = Some(T))

  def q18RestoreChain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val plan = RestoreScriptGenerator.generate(spark, canonicalFrame(spark, dir), opts)
    plan.steps
      .map(s => (s.RestoreID, s.BackupType, s.first_lsn, s.last_lsn,
        s.from_clause, s.stop_at.isDefined))
      .toDF("restore_id", "backup_type", "first_lsn", "last_lsn",
        "from_clause", "stopat")
      .withColumn("first_lsn", col("first_lsn").cast("bigint"))
      .withColumn("last_lsn", col("last_lsn").cast("bigint"))
      .orderBy("restore_id")
  }

  val q18Oracle: String = oracle(
    """, bh AS (
      |  SELECT * FROM backup_history
      |  WHERE database_name = 'db0' AND server_name = 'srv0'
      |),
      |full_ranked AS (
      |  SELECT *, dense_rank() OVER (ORDER BY last_lsn DESC) AS rk FROM bh
      |  WHERE backup_type = 'Full' AND device_type IN (2, 9)
      |    AND backup_start_date <= TIMESTAMP '2024-01-20 00:00:00'
      |),
      |chosen_full AS (SELECT * FROM full_ranked WHERE rk = 1),
      |full_info AS (
      |  SELECT max(last_lsn) AS lsn, bool_or(is_copy_only) AS co FROM chosen_full
      |),
      |diff_ranked AS (
      |  SELECT b.*, dense_rank() OVER (ORDER BY b.last_lsn DESC) AS rk
      |  FROM bh b, full_info f
      |  WHERE b.backup_type = 'Diff' AND b.last_lsn > f.lsn
      |    AND b.backup_start_date <= TIMESTAMP '2024-01-20 00:00:00'
      |    AND NOT f.co
      |),
      |chosen_diff AS (SELECT * FROM diff_ranked WHERE rk = 1),
      |base_lsn AS (
      |  SELECT coalesce((SELECT max(last_lsn) FROM chosen_diff),
      |                  (SELECT max(lsn) FROM full_info)) AS lsn
      |),
      |logs_in AS (
      |  SELECT b.* FROM bh b, base_lsn
      |  WHERE b.backup_type = 'Log' AND b.last_lsn > base_lsn.lsn
      |    AND b.backup_start_date <= TIMESTAMP '2024-01-20 00:00:00'
      |),
      |log_after AS (
      |  SELECT b.* FROM bh b, base_lsn
      |  WHERE b.backup_type = 'Log' AND b.last_lsn > base_lsn.lsn
      |    AND b.backup_start_date > TIMESTAMP '2024-01-20 00:00:00'
      |  ORDER BY b.backup_start_date, b.last_lsn, b.log_id
      |  LIMIT 1
      |),
      |log_union AS (SELECT * FROM logs_in UNION SELECT * FROM log_after),
      |log_sets AS (
      |  SELECT first_lsn, last_lsn,
      |         string_agg(
      |           CASE WHEN device_type = 9 THEN 'URL = N''' ELSE 'DISK = N''' END
      |             || physical_device_name || '''',
      |           ',' || chr(10) ORDER BY physical_device_name) AS from_clause
      |  FROM log_union GROUP BY first_lsn, last_lsn
      |),
      |log_steps AS (
      |  SELECT row_number() OVER (ORDER BY last_lsn) AS log_seq,
      |         count(*) OVER () AS n_logs,
      |         first_lsn, last_lsn, from_clause
      |  FROM log_sets
      |),
      |has_diff AS (SELECT count(*) AS n FROM chosen_diff),
      |stripe_agg_full AS (
      |  SELECT CAST(1 AS BIGINT) AS restore_id, 'Full' AS backup_type,
      |         CAST(min(first_lsn) AS BIGINT) AS first_lsn,
      |         CAST(max(last_lsn) AS BIGINT) AS last_lsn,
      |         string_agg(
      |           CASE WHEN device_type = 9 THEN 'URL = N''' ELSE 'DISK = N''' END
      |             || physical_device_name || '''',
      |           ',' || chr(10) ORDER BY physical_device_name) AS from_clause,
      |         false AS stopat
      |  FROM chosen_full
      |),
      |stripe_agg_diff AS (
      |  SELECT CAST(2 AS BIGINT) AS restore_id, 'Diff' AS backup_type,
      |         CAST(min(first_lsn) AS BIGINT) AS first_lsn,
      |         CAST(max(last_lsn) AS BIGINT) AS last_lsn,
      |         string_agg(
      |           CASE WHEN device_type = 9 THEN 'URL = N''' ELSE 'DISK = N''' END
      |             || physical_device_name || '''',
      |           ',' || chr(10) ORDER BY physical_device_name) AS from_clause,
      |         false AS stopat
      |  FROM chosen_diff HAVING count(*) > 0
      |)
      |SELECT * FROM stripe_agg_full
      |UNION ALL SELECT * FROM stripe_agg_diff
      |UNION ALL
      |SELECT CAST(log_seq + 1 + (SELECT CASE WHEN n > 0 THEN 1 ELSE 0 END
      |                           FROM has_diff) AS BIGINT) AS restore_id,
      |       'Log' AS backup_type,
      |       CAST(first_lsn AS BIGINT) AS first_lsn,
      |       CAST(last_lsn AS BIGINT) AS last_lsn, from_clause,
      |       log_seq >= n_logs - 1 AS stopat
      |FROM log_steps
      |ORDER BY restore_id""".stripMargin)

  /** Rendered restore commands incl. MOVE relocation and STOPAT —
    * rows-only check (no oracle: text format is engine-defined).
    */
  def q19RestoreScript(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val plan = RestoreScriptGenerator.generate(
      spark, canonicalFrame(spark, dir),
      opts.copy(
        destinationDb = Some("db0_restored"),
        restoreDataPath = Some("Y:/newdata"),
        fileNamePrefix = Some("restored_")))
    plan.steps
      .map(s => (s.RestoreID, s.BackupType, s.RestoreCommand))
      .toDF("restore_id", "backup_type", "restore_command")
      .orderBy("restore_id")
  }

  /** S9: the `@Help = 1` constant parameter relation (reference
    * sql:449-480).
    */
  def q34Help(spark: SparkSession, dir: String): DataFrame =
    RestoreScriptGenerator.help(spark).orderBy("parameter")

  val q34Oracle: String = {
    val rows = RestoreScriptGenerator.helpRows
      .map { case (p, d) => s"('$p', '$d')" }.mkString(",\n  ")
    s"""SELECT * FROM (VALUES
       |  $rows
       |) AS t(parameter, description)
       |ORDER BY parameter""".stripMargin
  }

  /** Fleet-wide restore chains for every (db, server) in one distributed
    * pass (rows-only; per-pair equivalence with the scalar planner is
    * asserted in FleetPlannerSpec).
    */
  def q39FleetPlan(spark: SparkSession, dir: String): DataFrame =
    graft.script.FleetRestorePlanner
      .planAll(canonicalFrame(spark, dir), "server_name", T)
      .select(
        col("database_name"), col("key"), col("restore_id"),
        col("backup_type"), col("first_lsn").cast("bigint").as("first_lsn"),
        col("last_lsn").cast("bigint").as("last_lsn"),
        col("from_clause"), col("stopat"))
      .orderBy("database_name", "key", "restore_id")

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_restore_chain" -> (q18RestoreChain _),
    "q19_restore_script" -> (q19RestoreScript _),
    "q34_help_relation" -> (q34Help _),
    "q39_fleet_restore_plan" -> (q39FleetPlan _)
  )

  def oracles: Map[String, String] = Map(
    "q18_restore_chain" -> q18Oracle,
    "q34_help_relation" -> q34Oracle
  )
}
