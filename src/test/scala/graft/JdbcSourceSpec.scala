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
}
