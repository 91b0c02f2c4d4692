package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.script.{RestoreScriptGenerator, RestoreScriptOptions}

/** Golden tests for the point-in-time restore planner (reference
  * sql:427-1312): phase composition, copy-only diff skip, striped FROM
  * clauses, MOVE relocation, overlap log, STOPAT on the last two logs.
  */
class RestoreScriptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fileInfoJson =
    """[{"logical_name":"db_data","physical_drive":"X:","physical_name":"X:\\data\\db.mdf","file_type":"D","file_number":"1"},""" +
      """{"logical_name":"db_log","physical_drive":"L:","physical_name":"L:\\log\\db.ldf","file_type":"L","file_number":"2"}]"""

  /** (LogID, type, device, start, first, last, copyOnly, devType, fileInfo) */
  private def bh(rows: Seq[(Long, String, String, String, Long, Long, Boolean, Int, String)]): DataFrame =
    rows.toDF("LogID", "BackupType", "physical_device_name", "start_s",
        "first_l", "last_l", "is_copy_only", "device_type", "DBFileInformation")
      .withColumn("database_name", org.apache.spark.sql.functions.lit("DBAdmin"))
      .withColumn("server_name", org.apache.spark.sql.functions.lit("srvA"))
      .withColumn("ag_name", org.apache.spark.sql.functions.lit("agA"))
      .withColumn("backup_start_date", col("start_s").cast("timestamp"))
      .withColumn("backup_finish_date", col("start_s").cast("timestamp"))
      .withColumn("first_lsn", col("first_l").cast("decimal(25,0)"))
      .withColumn("last_lsn", col("last_l").cast("decimal(25,0)"))
      .withColumn("position", org.apache.spark.sql.functions.lit(1))
      .drop("start_s", "first_l", "last_l")

  private val timeline = bh(Seq(
    (1L, "Full", "X:/bk/full_a1.bak", "2024-01-01 01:00:00", 1000L, 2000L, false, 2, fileInfoJson),
    (2L, "Full", "X:/bk/full_a2.bak", "2024-01-01 01:00:00", 1000L, 2000L, false, 2, fileInfoJson),
    (3L, "Diff", "X:/bk/diff_1.bak", "2024-01-01 03:00:00", 1000L, 3000L, false, 2, null),
    (4L, "Log", "X:/bk/log_1a.trn", "2024-01-01 04:00:00", 3000L, 3500L, false, 2, null),
    (5L, "Log", "X:/bk/log_1b.trn", "2024-01-01 04:00:00", 3000L, 3500L, false, 2, null),
    (6L, "Log", "https://bk.example.com/log_2.trn", "2024-01-01 05:00:00", 3500L, 4000L, false, 9, null),
    // first log AFTER the restore time — overlap capture
    (7L, "Log", "X:/bk/log_3.trn", "2024-01-01 07:00:00", 4000L, 4500L, false, 2, null),
    // far-future log that must NOT be included
    (8L, "Log", "X:/bk/log_4.trn", "2024-01-01 09:00:00", 4500L, 5000L, false, 2, null)
  ))

  private val T = Timestamp.valueOf("2024-01-01 06:00:00")

  test("full plan: FULL + DIFF + logs with overlap log and STOPAT on last two") {
    val plan = RestoreScriptGenerator.generate(spark, timeline,
      RestoreScriptOptions(sourceDb = "DBAdmin", sourceServer = Some("srvA"),
        restoreToTime = Some(T)))
    val types = plan.steps.map(s => (s.RestoreID, s.BackupType))
    assert(types == Seq(
      (1L, "Full"), (2L, "Diff"), (3L, "Log"), (4L, "Log"), (5L, "Log")))
    // striped full: both stripes in one FROM, device-name order
    assert(plan.steps.head.from_clause ==
      "DISK = N'X:/bk/full_a1.bak',\nDISK = N'X:/bk/full_a2.bak'")
    // log chain: striped set collapsed, URL log, then the overlap log
    assert(plan.steps(2).from_clause ==
      "DISK = N'X:/bk/log_1a.trn',\nDISK = N'X:/bk/log_1b.trn'")
    assert(plan.steps(3).from_clause == "URL = N'https://bk.example.com/log_2.trn'")
    assert(plan.steps(4).from_clause == "DISK = N'X:/bk/log_3.trn'")
    // last two logs carry STOPAT
    val stopAts = plan.steps.filter(_.BackupType == "Log").map(_.stop_at.isDefined)
    assert(stopAts.takeRight(2).forall(identity))
    assert(plan.steps.count(_.stop_at.isDefined) == math.min(2,
      plan.steps.count(_.BackupType == "Log")))
    assert(plan.script.contains("STOPAT = '2024-01-01 06:00:00'"))
  }

  test("log chain includes exactly the in-range sets plus one overlap log") {
    val plan = RestoreScriptGenerator.generate(spark, timeline,
      RestoreScriptOptions(sourceDb = "DBAdmin", sourceServer = Some("srvA"),
        restoreToTime = Some(T)))
    val logs = plan.steps.filter(_.BackupType == "Log")
    // base = diff lsn 3000 → in range: set(3000-3500 striped), set(3500-4000);
    // overlap: log_3 (07:00); log_4 excluded
    assert(logs.map(_.last_lsn.toBigInt.toLong) == Seq(3500L, 4000L, 4500L))
  }

  test("copy-only full skips the diff phase") {
    val co = bh(Seq(
      (1L, "Full", "X:/bk/co.bak", "2024-01-01 01:00:00", 1000L, 2000L, true, 2, null),
      (2L, "Diff", "X:/bk/diff.bak", "2024-01-01 03:00:00", 1000L, 3000L, false, 2, null),
      (3L, "Log", "X:/bk/log.trn", "2024-01-01 04:00:00", 2000L, 3500L, false, 2, null)
    ))
    val plan = RestoreScriptGenerator.generate(spark, co,
      RestoreScriptOptions(sourceDb = "DBAdmin", sourceServer = Some("srvA"),
        restoreToTime = Some(T)))
    assert(plan.steps.map(_.BackupType) == Seq("Full", "Log"))
    assert(plan.steps(1).RestoreID == 2L)
  }

  test("MOVE clause relocates data and log files with prefix") {
    val plan = RestoreScriptGenerator.generate(spark, timeline,
      RestoreScriptOptions(sourceDb = "DBAdmin", sourceServer = Some("srvA"),
        restoreToTime = Some(T),
        restoreDataPath = Some("Y:/newdata"),
        fileNamePrefix = Some("restored_")))
    val cmd = plan.steps.head.RestoreCommand
    assert(cmd.contains("MOVE N'db_data' TO N'Y:/newdata/restored_db.mdf'"))
    // log file falls back to its original directory (no restoreLogPath)
    assert(cmd.contains("MOVE N'db_log' TO N'L:\\log\\restored_db.ldf'"))
  }

  test("no file info falls back to a commented example MOVE") {
    val plain = bh(Seq(
      (1L, "Full", "X:/bk/f.bak", "2024-01-01 01:00:00", 1000L, 2000L, false, 2, null)))
    val plan = RestoreScriptGenerator.generate(spark, plain,
      RestoreScriptOptions(sourceDb = "DBAdmin", sourceServer = Some("srvA"),
        restoreToTime = Some(T)))
    assert(plan.steps.head.RestoreCommand.contains("-- MOVE N'<logical_data_file>'"))
  }

  test("AG key routes through ag_name; validation rejects bad options") {
    val plan = RestoreScriptGenerator.generate(spark, timeline,
      RestoreScriptOptions(sourceDb = "DBAdmin", sourceAgName = Some("agA"),
        restoreToTime = Some(T)))
    assert(plan.steps.nonEmpty)
    intercept[IllegalArgumentException] {
      RestoreScriptGenerator.generate(spark, timeline,
        RestoreScriptOptions(sourceDb = "DBAdmin"))
    }
    intercept[IllegalArgumentException] {
      RestoreScriptGenerator.generate(spark, timeline,
        RestoreScriptOptions(sourceDb = "DBAdmin",
          sourceServer = Some("s"), sourceAgName = Some("a")))
    }
    intercept[IllegalStateException] {
      RestoreScriptGenerator.generate(spark, timeline,
        RestoreScriptOptions(sourceDb = "NoSuchDb", sourceServer = Some("srvA")))
    }
  }

  test("path helpers split and normalize both separators") {
    assert(RestoreScriptGenerator.splitPath("X:\\data\\db.mdf") == ("X:\\data\\", "db.mdf"))
    assert(RestoreScriptGenerator.splitPath("X:/data/db.mdf") == ("X:/data/", "db.mdf"))
    assert(RestoreScriptGenerator.normalizeDir("Y:/p") == "Y:/p/")
    assert(RestoreScriptGenerator.normalizeDir("Y:\\p") == "Y:\\p\\")
    assert(RestoreScriptGenerator.normalizeDir("Y:/p/") == "Y:/p/")
  }
}
