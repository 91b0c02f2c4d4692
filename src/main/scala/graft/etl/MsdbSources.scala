package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The six source relations the reference's extract reads from each SQL
  * Server (`Get-BackupHistoryToETL.ps1:51-70`): `msdb.dbo.backupset`,
  * `msdb.dbo.backupmediafamily`, `msdb.dbo.backupfile`, `sys.databases`,
  * `sys.dm_hadr_database_replica_states`, `sys.availability_groups`.
  *
  * Our engine treats them as input DataFrames — JDBC reads in production,
  * parquet fixtures in tests (SURVEY §1.1).
  */
final case class MsdbSources(
    backupset: DataFrame,
    backupmediafamily: DataFrame,
    backupfile: DataFrame,
    databases: DataFrame,
    replicaStates: DataFrame,
    availabilityGroups: DataFrame
)

/** Deterministic derivation of msdb-shaped source relations from the
  * driver's `orders`/`lineitem` tables, shared verbatim with the DuckDB
  * oracle (same pattern as [[BackupHistoryDerivation]]): each order is a
  * backup set; its lineitems fan out to 1-3 media stripes (J1) and up to
  * 4 database files (J5); customers key databases, replicas and AGs.
  */
object MsdbDerivation {

  val withClauses: String =
    """msdb_backupset AS (
      |  SELECT o_orderkey AS backup_set_id,
      |         o_orderkey AS media_set_id,
      |         'db' || (o_custkey % 50) AS database_name,
      |         CASE WHEN o_orderkey % 7 = 0 THEN 'D'
      |              WHEN o_orderkey % 7 = 3 THEN 'I'
      |              ELSE 'L' END AS type,
      |         CAST(o_orderdate AS TIMESTAMP) AS backup_start_date,
      |         CAST(o_orderdate AS TIMESTAMP) + INTERVAL 5 MINUTE AS backup_finish_date,
      |         'srv' || (o_custkey % 7) AS server_name,
      |         CASE WHEN o_custkey % 3 = 0 THEN 'FULL'
      |              WHEN o_custkey % 3 = 1 THEN 'SIMPLE'
      |              ELSE 'BULK_LOGGED' END AS recovery_model,
      |         CAST(o_orderkey * 1000 AS DECIMAL(25,0)) AS first_lsn,
      |         CAST(o_orderkey * 1000 + 999 AS DECIMAL(25,0)) AS last_lsn,
      |         CAST(floor(o_totalprice) AS BIGINT) * 1048576 AS backup_size,
      |         CAST(floor(o_totalprice / 2) AS BIGINT) * 1048576 AS compressed_backup_size,
      |         (o_orderkey % 11 = 0) AS is_copy_only,
      |         CASE WHEN o_orderkey % 13 = 0 THEN 'CERTIFICATE' END AS encryptor_type,
      |         CASE WHEN o_orderkey % 13 = 0 THEN 'aes_256' END AS key_algorithm,
      |         CAST(o_orderkey % 16 + 1 AS INT) AS position
      |  FROM orders
      |),
      |msdb_backupmediafamily AS (
      |  SELECT l_orderkey AS media_set_id,
      |         (CASE WHEN l_orderkey % 4 = 0 THEN 'https://bk.example.com/o'
      |               ELSE 'X:/bk/o' END)
      |           || l_orderkey || '_' || l_linenumber || '.bak' AS physical_device_name,
      |         CAST(CASE WHEN l_orderkey % 4 = 0 THEN 9 ELSE 2 END AS INT) AS device_type
      |  FROM lineitem
      |  WHERE l_linenumber <= 1 + (l_orderkey % 3)
      |),
      |msdb_backupfile AS (
      |  SELECT l_orderkey AS backup_set_id,
      |         'file' || l_linenumber AS logical_name,
      |         'X:' AS physical_drive,
      |         'X:/data/f' || l_orderkey || '_' || l_linenumber || '.ndf' AS physical_name,
      |         CASE WHEN l_linenumber % 3 = 0 THEN 'L' ELSE 'D' END AS file_type,
      |         CAST(l_linenumber AS INT) AS file_number,
      |         CAST(CASE WHEN l_linenumber = 4 THEN 8 ELSE 0 END AS INT) AS state
      |  FROM lineitem
      |  WHERE l_linenumber <= 4
      |),
      |msdb_databases AS (
      |  SELECT DISTINCT 'db' || (o_custkey % 50) AS name,
      |         CAST(o_custkey % 50 AS INT) AS database_id
      |  FROM orders
      |),
      |msdb_replica_states AS (
      |  SELECT database_id, CAST(1 AS INT) AS is_local,
      |         CAST(database_id % 5 AS INT) AS group_id
      |  FROM msdb_databases WHERE database_id % 2 = 0
      |),
      |msdb_ags AS (
      |  SELECT DISTINCT group_id, 'ag' || group_id AS ag_name
      |  FROM msdb_replica_states
      |)""".stripMargin

  def oracle(body: String): String = s"WITH $withClauses\n$body"

  /** Spark-side msdb-shaped sources for one simulated server. */
  def sources(spark: SparkSession, sfDir: String): MsdbSources = {
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    graft.Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    def rel(name: String): DataFrame =
      spark.sql(s"WITH $withClauses SELECT * FROM $name")
    MsdbSources(
      backupset = rel("msdb_backupset"),
      backupmediafamily = rel("msdb_backupmediafamily"),
      backupfile = rel("msdb_backupfile"),
      databases = rel("msdb_databases"),
      replicaStates = rel("msdb_replica_states"),
      availabilityGroups = rel("msdb_ags")
    )
  }
}
