package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{ConsolidatedStore, StoreDelete, StoreLog}

/** File-level guarantees of the copy-on-write DELETE
  * ([[graft.store.StoreDelete]]) and the change feed
  * ([[graft.store.StoreLog.changes]]) that the q115/q116 value oracles
  * cannot see.
  */
class DeleteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-del").toString + "/t"

  private def bh = graft.etl.BackupHistoryDerivation
    .canonicalFrame(spark, TestSpark.sf).drop("LogID")

  private def dataFiles(path: String): Set[String] =
    new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

  test("all-matching files are dropped whole, not rewritten") {
    val path = tmp()
    val t0 = Timestamp.valueOf("2024-01-10 00:00:00")
    ConsolidatedStore.append(spark, path,
      bh.filter(col("backup_start_date") < lit(t0)))
    ConsolidatedStore.append(spark, path,
      bh.filter(col("backup_start_date") >= lit(t0)))
    val before = dataFiles(path)
    assert(before.size == 2)
    // everything below Jan 10 goes: file 1 matches entirely → dropped;
    // file 2 holds no matching row → untouched. No rewrite anywhere.
    val stats = StoreDelete.delete(spark, path,
      col("backup_start_date") < lit(t0))
    assert(stats.filesDropped == 1 && stats.filesRewritten == 0, s"$stats")
    assert(stats.deleted ==
      bh.filter(col("backup_start_date") < lit(t0)).count())
    val after = dataFiles(path)
    assert(after.subsetOf(before) && after.size == 1,
      s"untouched file must survive by identity: before=$before after=$after")
    assert(ConsolidatedStore.read(spark, path).count() ==
      bh.filter(col("backup_start_date") >= lit(t0)).count())
  }

  test("boundary file is rewritten; pre-delete snapshot still complete") {
    val path = tmp()
    ConsolidatedStore.append(spark, path, bh)
    val total = bh.count()
    val vBefore = StoreLog.currentVersion(spark, path)
    val stats = StoreDelete.purgeExpired(spark, path, retentionDays = 45,
      now = Timestamp.valueOf("2024-03-01 00:00:00"))
    assert(stats.deleted > 0 && stats.filesRewritten >= 1)
    assert(ConsolidatedStore.read(spark, path).count() == total - stats.deleted)
    assert(StoreLog.snapshot(spark, path, vBefore).count() == total,
      "pre-delete snapshot must still read every archived row")
  }

  test("NULL predicate keeps the row (SQL DELETE WHERE semantics)") {
    val path = tmp()
    ConsolidatedStore.append(spark, path, bh)
    val total = bh.count()
    // ag_name is null for odd databases — predicate is null there
    val stats = StoreDelete.delete(spark, path, col("ag_name") < "ag_zzz")
    val kept = ConsolidatedStore.read(spark, path)
    assert(stats.deleted == bh.filter(col("ag_name").isNotNull).count())
    assert(kept.count() == total - stats.deleted)
    assert(kept.filter(col("ag_name").isNotNull).count() == 0)
  }

  test("no matching rows: delete is a no-op, no commit written") {
    val path = tmp()
    ConsolidatedStore.append(spark, path, bh)
    val v = StoreLog.currentVersion(spark, path)
    val stats = StoreDelete.delete(spark, path, col("database_name") === "nope")
    assert(stats == StoreDelete.DeleteStats(0L, 0L, 0L))
    assert(StoreLog.currentVersion(spark, path) == v)
  }

  test("change feed of an append span reads only the appended rows") {
    val path = tmp()
    ConsolidatedStore.append(spark, path, bh.filter(col("database_name") < "db2"))
    ConsolidatedStore.append(spark, path, bh.filter(col("database_name") >= "db2"))
    val ch = StoreLog.changes(spark, path, 1, 2)
    assert(ch.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
    assert(ch.count() == bh.filter(col("database_name") >= "db2").count())
    // v1's untouched file must not be scanned at all: every file backing
    // the change-feed frame belongs to the v2 commit's adds
    val v2Adds = StoreLog.readCommits(spark, path).find(_.version == 2).get.adds.toSet
    val scanned = ch.inputFiles.toSeq
    assert(scanned.nonEmpty &&
      scanned.forall(f => v2Adds.exists(a => f.endsWith(a))),
      s"change feed scanned beyond the span's delta files: $scanned")
  }
}
