package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** The JDBC connector surface is untestable over the wire here (zero
  * egress); these pin the option construction the three auth branches of
  * the reference produce.
  */
class JdbcSourceSpec extends AnyFunSuite {

  test("reader options per auth mode") {
    val base = SourceServer("sql01.example.com")
    val integ = JdbcBackupSource.readerOptions(base, "msdb.dbo.backupset")
    assert(integ("url") ==
      "jdbc:sqlserver://sql01.example.com:1433;databaseName=msdb;encrypt=true")
    assert(integ("integratedSecurity") == "true")
    assert(integ("dbtable") == "msdb.dbo.backupset")

    val cred = JdbcBackupSource.readerOptions(
      base.copy(auth = CredentialAuth("etl_user", "s3cret")), "sys.databases")
    assert(cred("user") == "etl_user" && cred("password") == "s3cret")
    assert(!cred.contains("integratedSecurity"))

    val tok = JdbcBackupSource.readerOptions(
      base.copy(auth = AccessTokenAuth("eyJ0...")), "sys.databases")
    assert(tok("accessToken") == "eyJ0...")

    // service principal + certificate: the driver does the token
    // exchange itself — no accessToken property, no out-of-band token
    val spc = JdbcBackupSource.readerOptions(
      base.copy(auth = ServicePrincipalCertAuth(
        "11111111-2222-3333-4444-555555555555", "/etc/certs/etl.pfx",
        certPassword = Some("pfxpass"))), "sys.databases")
    assert(spc("authentication") == "ActiveDirectoryServicePrincipalCertificate")
    assert(spc("user") == "11111111-2222-3333-4444-555555555555")
    assert(spc("clientCertificate") == "/etc/certs/etl.pfx")
    assert(spc("clientKeyPassword") == "pfxpass")
    // PFX container path: the password rides BOTH properties because
    // driver versions disagree on which one carries a PFX password
    assert(spc("password") == "pfxpass")
    assert(!spc.contains("accessToken") && !spc.contains("clientKey"))

    // PEM-style path: documented clientKeyPassword-only mapping
    val pem = JdbcBackupSource.readerOptions(
      base.copy(auth = ServicePrincipalCertAuth(
        "app-id", "/etc/certs/etl.pem", certPassword = Some("keypass"),
        certKey = Some("/etc/certs/etl.key"))), "sys.databases")
    assert(pem("clientKeyPassword") == "keypass")
    assert(!pem.contains("password"))
    assert(pem("clientKey") == "/etc/certs/etl.key")

    val sps = JdbcBackupSource.readerOptions(
      base.copy(auth = ServicePrincipalSecretAuth("app-id", "app-secret")),
      "sys.databases")
    assert(sps("authentication") == "ActiveDirectoryServicePrincipal")
    assert(sps("user") == "app-id" && sps("password") == "app-secret")
  }

  test("writer options batch the set-based append") {
    val w = JdbcBackupSource.writerOptions(
      SourceServer("central.example.com", database = "DBA"),
      "Utility.SQLBackupHistoryConsolidated", batchSize = 5000)
    assert(w("batchsize") == "5000")
    assert(w("url").contains("databaseName=DBA"))
    assert(w("dbtable") == "Utility.SQLBackupHistoryConsolidated")
  }

  test("autoPartitioning policy boundaries: trickle = one connection, " +
      "backlog slices by day, cap clamps") {
    // pins the POLICY runOnceJdbc derives per server per run (the Derby
    // live gate proves N>1 slices ≡ a single read; THIS pins the window
    // → slice-count mapping, so a regression to None on a backlog window
    // cannot silently restore the one-connection-per-server funnel)
    import JdbcBackupSource.{ExtractPartitioning, autoPartitioning}
    val now = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def since(hours: Long) =
      new java.sql.Timestamp(now.getTime - hours * 3600L * 1000L)
    // steady-state cron trickle (2 h): slicing buys nothing, costs N-1
    // connection opens per cycle per server
    assert(autoPartitioning(since(2), now).isEmpty)
    // the 48 h threshold itself is still trickle (window <= min is one
    // connection; strictly wider slices)
    assert(autoPartitioning(since(48), now).isEmpty)
    assert(autoPartitioning(since(49), now) ==
      Some(ExtractPartitioning(since(49), now, 3)),
      "just past the threshold: ceil(49h / 24h) = 3 day-slices")
    // 3-day backlog → 3 slices (one per 24 h of window)
    assert(autoPartitioning(since(72), now) ==
      Some(ExtractPartitioning(since(72), now, 3)))
    // 10-day backlog → clamped at the 8-connection per-server cap
    assert(autoPartitioning(since(240), now) ==
      Some(ExtractPartitioning(since(240), now, 8)))
    // first ETL against DefaultWatermark (1900): the century-wide window
    // where partitioning matters most — capped, never None
    val default = graft.etl.EtlRunner.DefaultWatermark
    assert(autoPartitioning(default, now) ==
      Some(ExtractPartitioning(default, now, 8)))
    // explicit single-connection override disables slicing entirely
    assert(autoPartitioning(since(240), now, maxSlices = 1).isEmpty)
  }
}
