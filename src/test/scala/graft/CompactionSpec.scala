package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.maintenance.Compaction
import graft.store.ConsolidatedStore

/** Compaction rewrites the consolidated store into few sorted files
  * without changing its contents.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("compaction shrinks file count, preserves content, keeps queries working") {
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact").toString + "/store"

    // simulate incremental cadence: one append per database slice, each
    // leaving its own file set behind
    val dbs = bh.select("database_name").distinct()
      .collect().map(_.getString(0)).sorted
    dbs.foreach { db =>
      ConsolidatedStore.append(spark, dir,
        bh.filter(col("database_name") === db).drop("LogID"))
    }
    val before = Compaction.dataFileCount(spark, dir)
    val content = spark.read.parquet(dir).cache()
    val nRows = content.count()

    val after = Compaction.compact(spark, dir, maxRecordsPerFile = 1000000L)
    assert(after < before, s"expected fewer files, got $before -> $after")
    assert(after == Compaction.dataFileCount(spark, dir))

    val compacted = spark.read.parquet(dir)
    assert(compacted.count() === nRows)
    assert(compacted.exceptAll(content).isEmpty &&
      content.exceptAll(compacted).isEmpty)
    // the store still serves a restore query after the swap
    val latest = graft.restore.RestoreQueries
      .latestFullBackupsPerKey(compacted, "server_name")
    assert(latest.count() > 0)
    content.unpersist()
  }
}
