package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{ConsolidatedStore, StoreLog, StoreMerge}

/** File-level guarantees of the copy-on-write MERGE
  * ([[graft.store.StoreMerge]]) that the q114 value oracle cannot see:
  * which files get rewritten, what pre-merge snapshots still read, and
  * the NULLs-are-equal key semantics.
  */
class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-merge").toString + "/t"

  private def bh = graft.etl.BackupHistoryDerivation
    .canonicalFrame(spark, TestSpark.sf).drop("LogID")

  private def dataFiles(path: String): Set[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSet

  test("merge rewrites only files containing matched keys") {
    val path = tmp()
    // two appends, disjoint key spaces → two files with disjoint zone maps
    ConsolidatedStore.append(spark, path, bh.filter(col("database_name") < "db2"))
    ConsolidatedStore.append(spark, path, bh.filter(col("database_name") >= "db2"))
    val before = dataFiles(path)
    assert(before.size == 2)
    val upd = bh.filter(col("database_name") === "db4" && col("BackupType") === "Log")
      .withColumn("CompressedSizeMB", col("CompressedSizeMB") + 7)
    val nUpd = upd.count()
    val stats = StoreMerge.merge(spark, path, upd)
    assert(stats == StoreMerge.MergeStats(nUpd, 0L, 1L),
      s"expected $nUpd updates in 1 rewritten file, got $stats")
    val after = dataFiles(path)
    // the db<2 file survived untouched; the db>=2 file was replaced
    assert((before & after).size == 1, s"before=$before after=$after")
    // values took, ids stable, nothing duplicated
    val stored = ConsolidatedStore.read(spark, path)
    assert(stored.count() == bh.count())
    assert(stored.select("LogID").distinct().count() == bh.count())
    val updatedComp = stored
      .filter(col("database_name") === "db4" && col("BackupType") === "Log")
      .agg(sum(col("CompressedSizeMB"))).head().getLong(0)
    val origComp = bh
      .filter(col("database_name") === "db4" && col("BackupType") === "Log")
      .agg(sum(col("CompressedSizeMB"))).head().getLong(0)
    assert(updatedComp == origComp + 7 * nUpd)
  }

  test("pre-merge snapshot still reads the original values (time travel)") {
    val path = tmp()
    ConsolidatedStore.append(spark, path, bh)
    val vBefore = StoreLog.currentVersion(spark, path)
    val upd = bh.filter(col("database_name") === "db1")
      .withColumn("CompressedSizeMB", lit(0))
    StoreMerge.merge(spark, path, upd)
    val old = StoreLog.snapshot(spark, path, vBefore)
      .filter(col("database_name") === "db1")
      .agg(sum(col("CompressedSizeMB"))).head().getLong(0)
    val orig = bh.filter(col("database_name") === "db1")
      .agg(sum(col("CompressedSizeMB"))).head().getLong(0)
    assert(old == orig, "pre-merge snapshot must show pre-merge values")
    val now = ConsolidatedStore.read(spark, path)
      .filter(col("database_name") === "db1")
      .agg(sum(col("CompressedSizeMB"))).head().getLong(0)
    assert(now == 0L)
  }

  test("NULL-device keys match null-safely: merge updates, never duplicates") {
    val path = tmp()
    val withNullDev = bh.withColumn("physical_device_name",
      when(col("database_name") === "db3", lit(null).cast("string"))
        .otherwise(col("physical_device_name")))
      .dropDuplicates(ConsolidatedStore.dedupKey)
    val total = withNullDev.count()
    ConsolidatedStore.append(spark, path, withNullDev)
    val upd = withNullDev.filter(col("database_name") === "db3")
      .withColumn("CompressedSizeMB", col("CompressedSizeMB") + 1)
    val stats = StoreMerge.merge(spark, path, upd)
    assert(stats.updated == upd.count() && stats.inserted == 0L,
      s"null-keyed rows must MATCH, not insert: $stats")
    assert(ConsolidatedStore.read(spark, path).count() == total)
  }

  test("txn token makes a redelivered batch a no-op (exactly-once apply)") {
    val path = tmp()
    ConsolidatedStore.append(spark, path, bh)
    val upd = bh.filter(col("database_name") === "db1")
      .withColumn("CompressedSizeMB", col("CompressedSizeMB") + 1000)
    val s1 = StoreMerge.merge(spark, path, upd, txnId = Some("app:1"))
    assert(s1.updated > 0)
    val afterFirst = ConsolidatedStore.read(spark, path)
      .agg(sum(col("CompressedSizeMB"))).head().getLong(0)
    // redelivery under the SAME token — even with different values —
    // must not apply
    val s2 = StoreMerge.merge(spark, path,
      upd.withColumn("CompressedSizeMB", col("CompressedSizeMB") + 9999),
      txnId = Some("app:1"))
    assert(s2 == StoreMerge.MergeStats(0L, 0L, 0L), s"redelivered: $s2")
    assert(ConsolidatedStore.read(spark, path)
      .agg(sum(col("CompressedSizeMB"))).head().getLong(0) == afterFirst)
    // a NEW token applies normally
    val s3 = StoreMerge.merge(spark, path, upd, txnId = Some("app:2"))
    assert(s3.updated > 0)
  }

  test("mixed batch: inserts number past the table max; update ids stable") {
    val path = tmp()
    ConsolidatedStore.append(spark, path, bh)
    val maxBefore = ConsolidatedStore.read(spark, path)
      .agg(max("LogID")).head().getLong(0)
    // materialize pre-merge rows — the lazy frame's files get archived
    import spark.implicits._
    val idsBefore = ConsolidatedStore.read(spark, path)
      .filter(col("database_name") === "db0")
      .select(col("LogID"), col("last_lsn").cast("long"))
      .as[(Long, Long)].collect().toSeq.toDF("LogID", "lsn_was")
    val updates = bh.filter(col("database_name") === "db0")
      .withColumn("UncompressedSizeMB", col("UncompressedSizeMB") + 5)
    val inserts = bh.filter(col("database_name") === "db0").limit(10)
      .withColumn("physical_device_name",
        concat(col("physical_device_name"), lit("_copy")))
    StoreMerge.merge(spark, path, updates.unionByName(inserts))
    val stored = ConsolidatedStore.read(spark, path)
    val newIds = stored.filter(col("LogID") > maxBefore)
    assert(newIds.count() == 10, "10 fresh rows past the old max id")
    // the updated rows kept their (LogID, last_lsn) association
    val joined = stored.alias("now")
      .join(idsBefore.alias("was"), Seq("LogID"))
      .filter(col("now.last_lsn").cast("long") =!= col("was.lsn_was"))
    assert(joined.count() == 0, "update must not renumber rows")
  }
}
