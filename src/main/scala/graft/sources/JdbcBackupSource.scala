package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.MsdbSources

/** Authentication modes of the reference's connection builders:
  * integrated security (`Add-BackupHistoryToTarget.ps1:43-52`), SQL
  * credential (:54-64), and AAD access token
  * (`New-AzureSQLDbConnectionWithCert.ps1:35-61`). In Spark these are
  * just JDBC connection properties — no engine work.
  */
sealed trait SqlServerAuth {
  def properties: Map[String, String]
}
final case class IntegratedAuth() extends SqlServerAuth {
  def properties: Map[String, String] = Map("integratedSecurity" -> "true")
}
final case class CredentialAuth(user: String, password: String) extends SqlServerAuth {
  def properties: Map[String, String] = Map("user" -> user, "password" -> password)
}
final case class AccessTokenAuth(token: String) extends SqlServerAuth {
  def properties: Map[String, String] = Map("accessToken" -> token)
}

/** AAD service-principal auth WITHOUT out-of-band token plumbing: the
  * reference's cert-based flow
  * (`New-AzureSQLDbConnectionWithCert.ps1:35-61`) acquires a token from a
  * local certificate and hands it to the connection; the MS JDBC driver
  * performs that same exchange itself when given
  * `authentication=ActiveDirectoryServicePrincipalCertificate` plus the
  * principal's client id and certificate location (public driver surface,
  * mssql-jdbc ≥ 12.2), so no token ever crosses the app.
  * `certPassword`/`certKey` are optional (PFX password / separate key
  * file); a secret-based principal uses [[ServicePrincipalSecretAuth]].
  *
  * Password-property caveat (wire-untestable in this sandbox): the
  * driver documents `clientKeyPassword` as the PRIVATE-KEY password,
  * while some driver versions read a PFX container password from the
  * plain `password` property instead. For a PFX/PKCS#12 `certPath` we
  * therefore emit `certPassword` under BOTH properties — the driver
  * ignores whichever it doesn't use for this authentication mode — so a
  * PFX-with-password deployment works regardless of which reading the
  * installed driver implements. PEM-style paths keep the documented
  * `clientKeyPassword`-only mapping.
  */
final case class ServicePrincipalCertAuth(
    clientId: String,
    certPath: String,
    certPassword: Option[String] = None,
    certKey: Option[String] = None) extends SqlServerAuth {
  private def isPfx: Boolean = {
    val p = certPath.toLowerCase
    p.endsWith(".pfx") || p.endsWith(".p12")
  }
  def properties: Map[String, String] =
    Map(
      "authentication" -> "ActiveDirectoryServicePrincipalCertificate",
      "user" -> clientId,
      "clientCertificate" -> certPath
    ) ++ certPassword.map("clientKeyPassword" -> _) ++
      (if (isPfx) certPassword.map("password" -> _) else None) ++
      certKey.map("clientKey" -> _)
}

/** AAD service principal with a client secret
  * (`authentication=ActiveDirectoryServicePrincipal`, the driver's
  * secret-based twin of the cert flow).
  */
final case class ServicePrincipalSecretAuth(
    clientId: String, clientSecret: String) extends SqlServerAuth {
  def properties: Map[String, String] = Map(
    "authentication" -> "ActiveDirectoryServicePrincipal",
    "user" -> clientId,
    "password" -> clientSecret)
}

/** One source SQL Server to ETL (reference control-table row + connection
  * parameters).
  */
final case class SourceServer(
    host: String,
    port: Int = 1433,
    database: String = "msdb",
    auth: SqlServerAuth = IntegratedAuth(),
    fetchSize: Int = 10000
)

/** JDBC reader for the six msdb/sys relations the extract consumes
  * (`Get-BackupHistoryToETL.ps1:51-70`). Each relation is exposed as a
  * plain DataFrame: Catalyst pushes the watermark predicate and column
  * pruning into the generated `SELECT ... WHERE ...` on the remote
  * server, which is exactly the sargable shape the reference's embedded
  * T-SQL had.
  *
  * Untestable over the wire here (zero egress); option construction is
  * unit-tested, and the relation topology is covered by the
  * parquet-fixture path (MsdbSources + ExtractTransform).
  */
object JdbcBackupSource {

  def jdbcUrl(s: SourceServer): String =
    s"jdbc:sqlserver://${s.host}:${s.port};databaseName=${s.database};encrypt=true"

  def readerOptions(s: SourceServer, relation: String): Map[String, String] =
    Map(
      "url" -> jdbcUrl(s),
      "dbtable" -> relation,
      "fetchsize" -> s.fetchSize.toString
    ) ++ s.auth.properties

  def relation(spark: SparkSession, s: SourceServer, name: String,
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .options(readerOptions(s, name) ++ extraOptions).load()

  /** Watermark-range partitioning for the `backupset` relation — the one
    * extract input whose row count scales with history depth. A first
    * ETL against a year of msdb backlog through one connection funnels
    * the whole backlog through one task; with bounds it becomes
    * `numPartitions` concurrent range-sliced SELECTs
    * (`backup_finish_date >= bᵢ AND < bᵢ₊₁`), each still carrying the
    * pushed watermark filter. Spark's JDBC partitioner CLAMPS, not
    * filters: rows below `lower` land in the first slice (with NULLs)
    * and rows at/above `upper` in the last, so the union is always
    * exactly the unpartitioned result — bounds only shape parallelism,
    * never correctness. Natural bounds: the server's current watermark
    * and now.
    */
  final case class ExtractPartitioning(
      lower: java.sql.Timestamp,
      upper: java.sql.Timestamp,
      numPartitions: Int,
      column: String = "backup_finish_date") {
    require(numPartitions > 0, "numPartitions must be positive")
    require(lower.before(upper), "lower bound must precede upper bound")
  }

  def partitionedReaderOptions(s: SourceServer, relation: String,
      p: ExtractPartitioning): Map[String, String] =
    readerOptions(s, relation) ++ Map(
      "partitionColumn" -> p.column,
      "lowerBound" -> p.lower.toString,
      "upperBound" -> p.upper.toString,
      "numPartitions" -> p.numPartitions.toString)

  def relationPartitioned(spark: SparkSession, s: SourceServer,
      name: String, p: ExtractPartitioning,
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .options(partitionedReaderOptions(s, name, p) ++ extraOptions).load()

  /** Derive [[ExtractPartitioning]] from the effective watermark window
    * — the production policy [[graft.etl.EtlRunner.runOnceJdbc]] applies
    * per server per run, because the window where partitioning matters
    * most (a first ETL against years of backlog, DefaultWatermark 1900)
    * is exactly the one where nobody passes manual bounds.
    *
    *   - trickle window (≤ `minWindowMs`, the steady-state cron cadence):
    *     `None` — one connection; slicing minutes of rows buys nothing
    *     and costs N-1 connection opens per cycle;
    *   - wider: `min(maxSlices, ceil(window / sliceWidthMs))` range
    *     slices. The cap bounds concurrent connections PER SERVER — a
    *     500-server fleet at maxSlices=8 is ≤4000 remote SELECTs, each
    *     still carrying the pushed watermark bound.
    *
    * Clamp semantics (see [[ExtractPartitioning]]) make the bounds
    * correctness-free: any rewind overlap below `since` lands in slice 0,
    * rows landing after `now` in the last slice.
    */
  def autoPartitioning(since: java.sql.Timestamp, now: java.sql.Timestamp,
      maxSlices: Int = 8,
      sliceWidthMs: Long = 24L * 3600 * 1000,
      minWindowMs: Long = 48L * 3600 * 1000): Option[ExtractPartitioning] = {
    val window = now.getTime - since.getTime
    if (window <= minWindowMs || maxSlices <= 1) None
    else {
      val n = math.min(maxSlices.toLong,
        (window + sliceWidthMs - 1) / sliceWidthMs).toInt
      if (n <= 1) None else Some(ExtractPartitioning(since, now, n))
    }
  }

  /** Relation names the six extract inputs read from — overridable so a
    * non-SQL-Server stand-in (the Derby live gate) can drive the REAL
    * `sources`/`runOnceJdbc` path with only names and URL swapped.
    */
  final case class RelationNames(
      backupset: String = "msdb.dbo.backupset",
      backupmediafamily: String = "msdb.dbo.backupmediafamily",
      backupfile: String = "msdb.dbo.backupfile",
      databases: String = "sys.databases",
      replicaStates: String = "sys.dm_hadr_database_replica_states",
      availabilityGroups: String = "sys.availability_groups")

  /** The six extract inputs over JDBC (S1/S1a; the DMV-snapshot temp
    * tables of the reference collapse into plain single reads per batch).
    *
    * @param backupsetPartitioning optional watermark-range partitioning
    *   of the `backupset` read (see [[ExtractPartitioning]]); the five
    *   dimension-shaped relations stay single-connection reads — their
    *   cardinality is servers × databases, not history depth.
    * @param extraOptions reader options merged LAST (e.g. a URL override
    *   for an embedded stand-in database in tests).
    */
  def sources(spark: SparkSession, s: SourceServer,
      backupsetPartitioning: Option[ExtractPartitioning] = None,
      relations: RelationNames = RelationNames(),
      extraOptions: Map[String, String] = Map.empty): MsdbSources =
    MsdbSources(
      backupset = backupsetPartitioning match {
        case Some(p) =>
          relationPartitioned(spark, s, relations.backupset, p, extraOptions)
        case None => relation(spark, s, relations.backupset, extraOptions)
      },
      backupmediafamily =
        relation(spark, s, relations.backupmediafamily, extraOptions),
      backupfile = relation(spark, s, relations.backupfile, extraOptions),
      databases = relation(spark, s, relations.databases, extraOptions),
      replicaStates = relation(spark, s, relations.replicaStates, extraOptions),
      availabilityGroups =
        relation(spark, s, relations.availabilityGroups, extraOptions)
    )

  /** Append-mode JDBC writer options for the consolidated sink — the
    * set-based replacement for the reference's row-per-round-trip insert
    * loop (`Add-BackupHistoryToTarget.ps1:69-98`).
    */
  def writerOptions(s: SourceServer, table: String,
      batchSize: Int = 10000): Map[String, String] =
    Map(
      "url" -> jdbcUrl(s),
      "dbtable" -> table,
      "batchsize" -> batchSize.toString
    ) ++ s.auth.properties
}
