package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** Live end-to-end JDBC coverage: the sandbox has no SQL Server (zero
  * egress), but Derby ships in Spark's jars, so the actual
  * `spark.read/write.format("jdbc")` path — connection open, batched
  * append, generated SELECT with pushdown — runs for real against an
  * in-JVM embedded database. Only the URL is swapped (Derby instead of
  * sqlserver); everything else (option maps, fetchsize/batchsize,
  * dbtable routing) is the production plumbing from [[JdbcBackupSource]].
  */
class JdbcLiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val srv = SourceServer("unreachable.example.com")

  test("writer append + reader load round-trip through embedded Derby") {
    import spark.implicits._
    val rows = Seq(
      (1L, "db1", "Full", 1000L),
      (2L, "db1", "Log", 1500L),
      (3L, "db2", "Full", 900L))
      .toDF("log_id", "database_name", "backup_type", "last_lsn")

    // Derby maps StringType to CLOB by default, which rejects pushed-down
    // string comparisons — pin VARCHAR like a production DDL would
    val wOpts = JdbcBackupSource
      .writerOptions(srv, "BACKUP_ROWS", batchSize = 500) +
      ("url" -> url) +
      ("createTableColumnTypes" ->
        "database_name VARCHAR(128), backup_type VARCHAR(32)")
    // overwrite creates the table; the follow-up append exercises the
    // batched set-based insert the reference's row-loop was replaced by
    rows.write.format("jdbc").options(wOpts).mode("overwrite").save()
    Seq((4L, "db2", "Log", 1200L))
      .toDF("log_id", "database_name", "backup_type", "last_lsn")
      .write.format("jdbc").options(wOpts).mode("append").save()

    val rOpts = JdbcBackupSource
      .readerOptions(srv, "BACKUP_ROWS") + ("url" -> url)
    val back = spark.read.format("jdbc").options(rOpts).load()
    assert(back.count() == 4)

    // predicate + projection push into the generated remote SELECT
    val pushed = back
      .filter($"database_name" === "db1")
      .select($"log_id".cast("long").as("log_id"))
      .as[Long].collect().sorted
    assert(pushed.toSeq == Seq(1L, 2L))
  }
}
