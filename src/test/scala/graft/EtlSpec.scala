package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{EtlRunner, MsdbDerivation}
import graft.maintenance.Retention
import graft.store.{ConsolidatedStore, WatermarkStore}

/** End-to-end tests of the ETL exactly-once triangle: 5-minute rewind +
  * dedup key + advance-after-load (SURVEY §7 hard-part 7).
  */
class EtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-etl").toString + "/t"

  test("idempotent append: overlapping batches never duplicate rows") {
    val path = tmp()
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID").cache()
    val total = bh.count()
    val first = bh.limit(200)
    val n1 = ConsolidatedStore.append(spark, path, first)
    // second batch overlaps the first fully and adds the rest
    val n2 = ConsolidatedStore.append(spark, path, bh)
    val stored = spark.read.parquet(path)
    assert(n1 == 200 && n1 + n2 == total)
    assert(stored.count() == total)
    assert(stored.select("LogID").distinct().count() == total, "LogIDs unique")
    assert(stored.agg(max("LogID")).head().getLong(0) == total, "ids contiguous")
    bh.unpersist()
  }

  test("append writes one compact file per small batch, not one per core") {
    val path = tmp()
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID")
    ConsolidatedStore.append(spark, path, bh)
    // the batch is far below the ~250k rows/file target, so the range
    // partitioning must collapse to a single output file — 32 near-empty
    // parquet files per trickle append would shard the store and pay 32
    // writers' worth of column buffers
    val files = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 data file for a small batch, got $files")
  }

  test("bootstrap-sized batches fan out parallel writers; trickle stays one file") {
    def mk(n: Long) = spark.range(n).select(
      org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2024-01-01 00:00:00"))
        .as("backup_finish_date"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("db"), col("id") % 5)
        .as("database_name"),
      col("id").cast("decimal(25,0)").as("last_lsn"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("/dev/"), col("id"))
        .as("physical_device_name"))
    // a first-ETL-shaped batch (>= BootstrapSplitRows) must not funnel
    // through ONE parquet writer — that single task was 2.3 s of q64's
    // 8.3 s serial floor. ceil(70000/32768) = 3 parallel writers.
    val big = ConsolidatedStore.withLogIdsFrom(0L, mk(70000L), 70000L)
    assert(big.rdd.getNumPartitions == 3,
      s"bootstrap batch writers: ${big.rdd.getNumPartitions}")
    assert(big.agg(max("LogID"), countDistinct("LogID")).head() match {
      case r => r.getLong(0) == 70000L && r.getLong(1) == 70000L
    }, "ids stay contiguous and unique across the fan-out")
    // trickle: one compact file, as before
    val small = ConsolidatedStore.withLogIdsFrom(0L, mk(1000L), 1000L)
    assert(small.rdd.getNumPartitions == 1,
      s"trickle batch writers: ${small.rdd.getNumPartitions}")
  }

  test("LogID assignment is distributed and follows the deterministic order") {
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID")
    val empty = ConsolidatedStore.read(spark, tmp()) // base = 0
    val assigned = ConsolidatedStore.withLogIds(empty, bh)
    // a backfill-sized batch must not funnel through one reducer (the
    // old global row_number window did) — range partitions stay parallel
    assert(assigned.rdd.getNumPartitions > 1,
      s"single-partition id assignment (${assigned.rdd.getNumPartitions})")
    val rows = assigned.select("LogID", "backup_finish_date").orderBy("LogID")
      .as[(Long, Timestamp)].collect()
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq, "contiguous from 1")
    assert(rows.sliding(2).forall(p => !p(1)._2.before(p(0)._2)),
      "id order follows the (finish_date, ...) sort order")
  }

  test("partitioned layout: append by database_name prunes per-db scans") {
    val path = tmp()
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID")
    val n = ConsolidatedStore.append(spark, path, bh,
      partitionBy = Seq("database_name"))
    assert(n > 0)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("database_name=")).map(_.getName).sorted
    assert(dirs.length == 5, s"got ${dirs.toSeq}")
    val one = spark.read.parquet(path).filter(col("database_name") === "db1")
    // partition pruning: only db1's directory is scanned
    assert(one.count() ==
      spark.read.parquet(s"$path/database_name=db1").count())
  }

  test("append lays files out sorted on (db, last_lsn) for row-group stats") {
    val path = tmp()
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID")
    ConsolidatedStore.append(spark, path, bh)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    // rows inside one file must be (db, lsn)-sorted: that ordering is
    // what gives parquet min/max stats their pruning power on P5 scans
    val rows = spark.read.parquet(files.head.getPath)
      .select("database_name", "last_lsn")
      .as[(String, BigDecimal)].collect().toSeq
    assert(rows == rows.sortBy(r => (r._1, r._2)), "file not locally sorted")
  }

  test("append prunes the anti-join to files overlapping the batch's key ranges") {
    import graft.store.StoreMeta
    val path = tmp()
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID").cache()
    // three appends of disjoint last_lsn tertiles → three files with
    // disjoint zone maps on the leading dedup-key column
    val cuts = bh.stat.approxQuantile("last_lsn", Array(0.34, 0.67), 0.001)
    val t1 = bh.filter(col("last_lsn") < cuts(0))
    val t2 = bh.filter(col("last_lsn") >= cuts(0) && col("last_lsn") < cuts(1))
    val t3 = bh.filter(col("last_lsn") >= cuts(1))
    Seq(t1, t2, t3).foreach(t => ConsolidatedStore.append(spark, path, t))
    val loaded = StoreMeta.load(spark, path).get
    assert(loaded.files.size == 3 && !loaded.dirty)

    // a batch drawn from the middle tertile must consult ONLY its file:
    // this is the O(batch + overlap) contract — a trickle append onto a
    // many-file store reads just the files sharing its LSN window
    val envelopes = ConsolidatedStore.batchEnvelopes(
      t2.dropDuplicates(ConsolidatedStore.dedupKey))
    val overlapping = loaded.files
      .filter(f => envelopes.exists(b => StoreMeta.overlaps(f, b)))
    assert(overlapping.size == 1,
      s"expected 1 overlapping file, got ${overlapping.map(_.file)}")

    // and the pruned anti-join still upholds the dedup contract
    assert(ConsolidatedStore.append(spark, path, t2) == 0)
    val total = bh.count()
    assert(spark.read.parquet(path).count() == total)
    assert(spark.read.parquet(path).select("LogID").distinct().count() == total)
    bh.unpersist()
  }

  private def segmentFiles(path: String): Seq[java.io.File] = {
    val d = new java.io.File(s"$path/${graft.store.StoreMeta.dirName}")
    if (!d.exists()) Nil
    else d.listFiles().toSeq
      .filter(f => (f.getName.endsWith(".json") || f.getName.endsWith(".parquet")) &&
        !f.getName.startsWith("_"))
  }

  /** Stats rows in one sidecar segment (JSON lines driver-side). */
  private def segmentRows(s: java.io.File): Long =
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(s.toPath)).asScala
      .count(_.trim.nonEmpty)

  test("sidecar log: clean appends write one O(batch) delta segment; fold compacts") {
    import graft.store.StoreMeta
    val path = tmp()
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID").cache()
    val cuts = bh.stat.approxQuantile("last_lsn", Array(0.34, 0.67), 0.001)
    val t1 = bh.filter(col("last_lsn") < cuts(0))
    val t2 = bh.filter(col("last_lsn") >= cuts(0) && col("last_lsn") < cuts(1))
    val t3 = bh.filter(col("last_lsn") >= cuts(1))
    // each clean append adds exactly ONE sidecar segment describing only
    // its own new files — O(batch) sidecar bytes, never a manifest rewrite
    ConsolidatedStore.append(spark, path, t1)
    assert(segmentFiles(path).size == 1)
    ConsolidatedStore.append(spark, path, t2)
    assert(segmentFiles(path).size == 2)
    ConsolidatedStore.append(spark, path, t3)
    val segs = segmentFiles(path)
    assert(segs.size == 3, s"expected 3 delta segments, got ${segs.size}")
    // proportionality: every segment holds stats for 1 file (its batch
    // wrote 1 data file), not the whole store
    segs.foreach { s =>
      assert(segmentRows(s) == 1, s"segment ${s.getName} not batch-sized")
    }
    val loaded = StoreMeta.load(spark, path).get
    assert(loaded.files.size == 3 && !loaded.dirty && loaded.segments == 3)

    // fold: an append pushing the log past foldEvery rewrites it as one
    // segment covering every file, and nothing is lost
    val path2 = tmp()
    ConsolidatedStore.append(spark, path2, t1)
    ConsolidatedStore.append(spark, path2, t2, foldEvery = 1)
    assert(segmentFiles(path2).size == 1, "fold collapses the segment log")
    val folded = StoreMeta.load(spark, path2).get
    assert(folded.files.size == 2 && !folded.dirty)
    assert(ConsolidatedStore.append(spark, path2, t2) == 0, "fold kept the stats")
    bh.unpersist()
  }

  test("partitioned store: pruned append reads only the touched database dirs") {
    import graft.store.StoreMeta
    val path = tmp()
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID").cache()
    val total = bh.count()
    val part = Seq("database_name")
    val n1 = ConsolidatedStore.append(spark, path, bh, partitionBy = part)
    assert(n1 == total)
    // hive layout is sidecar-first-class now: root-relative paths under
    // database_name= dirs, key columns reconstructed via basePath
    val loaded = StoreMeta.load(spark, path).get
    assert(loaded.files.nonEmpty && !loaded.dirty)
    assert(loaded.files.forall(_.file.startsWith("database_name=")),
      s"expected partition-relative paths, got ${loaded.files.map(_.file)}")
    assert(loaded.files.forall(f => f.dbMin == f.dbMax),
      "partition dirs must yield single-db zone maps")

    // per-database envelopes: a batch touching the two lexicographic
    // extremes must consult only THEIR files, not every db between — a
    // single global (dbMin, dbMax) envelope would span all five
    val dbs = bh.select("database_name").distinct()
      .collect().map(_.getString(0)).sorted
    val distant = bh.filter(
      col("database_name").isin(dbs.head, dbs.last))
    val envelopes = ConsolidatedStore.batchEnvelopes(
      distant.dropDuplicates(ConsolidatedStore.dedupKey))
    assert(envelopes.size == 2)
    val overlapping = loaded.files
      .filter(f => envelopes.exists(b => StoreMeta.overlaps(f, b)))
    val touched = overlapping.map(_.file.split("/").head).distinct.sorted
    assert(touched == Seq(s"database_name=${dbs.head}", s"database_name=${dbs.last}"),
      s"pruning touched $touched")

    // the pruned partitioned append upholds the dedup contract end-to-end
    assert(ConsolidatedStore.append(spark, path, distant, partitionBy = part) == 0)
    assert(spark.read.parquet(path).count() == total)
    assert(spark.read.parquet(path).select("LogID").distinct().count() == total)
    bh.unpersist()
  }

  test("NULL-device rows dedup across overlapping appends (NULLs-are-equal index)") {
    val path = tmp()
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID")
    // physical_device_name is nullable in the reference DDL (sql:12); a
    // SQL Server unique index compares NULLs as EQUAL, so ignore_dup_key
    // drops a re-extracted NULL-device row. Null one db's devices out.
    val withNulls = bh.withColumn("physical_device_name",
      when(col("database_name") === "db1", lit(null).cast("string"))
        .otherwise(col("physical_device_name")))
    val n1 = ConsolidatedStore.append(spark, path, withNulls)
    assert(n1 > 0)
    // full overlapping re-delivery: plain-equality anti-joins would let
    // every NULL-device row through again; null-safe keys drop them all
    val n2 = ConsolidatedStore.append(spark, path, withNulls)
    assert(n2 == 0, s"NULL-device rows duplicated on re-append ($n2)")
    val stored = spark.read.parquet(path)
    assert(stored.count() == n1)
    // no two stored rows share a (null-safe) dedup key
    val dupKeys = stored.groupBy(ConsolidatedStore.dedupKey.map(col): _*)
      .count().filter(col("count") > 1).count()
    assert(dupKeys == 0)
  }

  test("sidecar survives compaction re-seeded; losing it self-heals on append") {
    import graft.store.StoreMeta
    val path = tmp()
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID").cache()
    val total = bh.count()
    ConsolidatedStore.append(spark, path, bh.limit(150))
    ConsolidatedStore.append(spark, path, bh)
    // compaction rewrites the directory and re-seeds the sidecar for the
    // new file set, so the next append pays no heal scan
    graft.maintenance.Compaction.compact(spark, path)
    val metaDir = new java.io.File(s"$path/${StoreMeta.dirName}")
    assert(metaDir.exists(), "compaction re-seeds the sidecar")
    assert(!StoreMeta.load(spark, path).get.dirty, "re-seeded sidecar consistent")
    // a deleted sidecar (operator error, foreign writer) degrades to one
    // rebuild scan, never to wrong answers: the next append heals it and
    // still dedups against the recovered LogID base
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    rm(metaDir)
    assert(!metaDir.exists())
    assert(ConsolidatedStore.append(spark, path, bh) == 0)
    assert(metaDir.exists(), "append rebuilt the sidecar")
    val stored = spark.read.parquet(path)
    assert(stored.count() == total)
    assert(stored.agg(max("LogID")).head().getLong(0) == total,
      "LogID base recovered from healed sidecar")
    bh.unpersist()
  }

  test("etl run: first pass loads, second pass is a no-op that keeps watermarks") {
    val cons = tmp(); val wms = tmp()
    val sources = Map("srcA" -> MsdbDerivation.sources(spark, TestSpark.sf))
    val r1 = EtlRunner.runOnce(spark, sources, cons, wms)
    assert(r1.head.error.isEmpty)
    // the synthetic lineitem carries duplicate (orderkey, linenumber) pairs
    // → duplicate dedup keys in the batch; ignore_dup_key semantics drop them
    val distinctKeys = graft.etl.ExtractTransform
      .extract(sources("srcA"), EtlRunner.DefaultWatermark)
      .dropDuplicates(ConsolidatedStore.dedupKey).count()
    assert(r1.head.extracted > 0 && r1.head.appended == distinctKeys)
    val wmAfter1 = WatermarkStore.read(spark, wms)("srcA")
    assert(wmAfter1 == r1.head.newWatermark.get)

    val count1 = spark.read.parquet(cons).count()
    val r2 = EtlRunner.runOnce(spark, sources, cons, wms)
    // re-extract sees only the 5-minute overlap window; dedup drops it all
    assert(r2.head.appended == 0)
    assert(spark.read.parquet(cons).count() == count1)
    // watermark unchanged in value (re-advanced to the same batch max)
    val wmAfter2 = WatermarkStore.read(spark, wms)("srcA")
    assert(wmAfter2 == wmAfter1)
  }

  test("runOnce(maintenance) folds accumulated small trickle files; " +
      "default leaves layout alone and content identical") {
    import graft.maintenance.StoreMaintenance
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID")
    val ordered = bh.orderBy("backup_finish_date", "database_name",
      "last_lsn", "physical_device_name")
    def parquetFiles(p: String): Int = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    // two identically pre-seeded stores: 5 small trickle files each
    val cM = tmp(); val wM = tmp() // maintained
    val cN = tmp(); val wN = tmp() // control (default: no maintenance)
    Seq(cM, cN).foreach { c =>
      (1 to 5).foreach { i =>
        ConsolidatedStore.append(spark, c,
          ordered.limit(8 * i).except(ordered.limit(8 * (i - 1))))
      }
      assert(parquetFiles(c) == 5)
    }
    val src = MsdbDerivation.sources(spark, TestSpark.sf)
    val policy = Some(StoreMaintenance.Policy(
      smallFileBytes = 64L << 20, maxSmallFiles = 4))
    val rM = EtlRunner.runOnce(spark, Map("srv" -> src), cM, wM,
      maintenance = policy)
    val rN = EtlRunner.runOnce(spark, Map("srv" -> src), cN, wN)
    assert(rM.head.error.isEmpty && rN.head.error.isEmpty)
    assert(rM.head.appended > 0, "fixture sanity: the cycle lands rows")
    assert(rM.head.appended == rN.head.appended)
    // maintained store folded its small files; control kept 5 + 1
    assert(parquetFiles(cN) == 6, s"control files: ${parquetFiles(cN)}")
    assert(parquetFiles(cM) == 1, s"maintained files: ${parquetFiles(cM)}")
    // content identical (same append sequence → same LogIDs, same rows).
    // exceptAll aligns POSITIONALLY and the optimize rewrites files in
    // canonical-schema column order, so project both to one column list
    val cols = ConsolidatedStore.read(spark, cN).columns.toSeq
    val a = ConsolidatedStore.read(spark, cM).select(cols.map(col): _*)
    val b = ConsolidatedStore.read(spark, cN).select(cols.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "maintenance must be content-neutral")
    // and the maintained store still serves idempotent appends
    assert(ConsolidatedStore.append(spark, cM, ordered.limit(8)) == 0)
  }

  test("duplicate deliveries share ONE extract pass (memoized per source+watermark)") {
    // two server names resolving to the SAME MsdbSources instance at the
    // same watermark — the q64 shape. The runner must extract + dedup +
    // checkpoint once and share the batch; a per-row accumulator on the
    // backupset scan counts actual source passes.
    val acc = spark.sparkContext.longAccumulator("backupset-scan-rows")
    val base = MsdbDerivation.sources(spark, TestSpark.sf)
    val counted = udf { (_: Long) => acc.add(1L); true }
    val src = base.copy(
      backupset = base.backupset.filter(counted(col("backup_set_id"))))
    // calibrate: one solo run = however many passes one extract costs
    val (c1, w1) = (tmp(), tmp())
    val solo = EtlRunner.runOnce(spark, Map("solo" -> src), c1, w1)
    assert(solo.head.error.isEmpty)
    val onePass = acc.value.longValue
    assert(onePass > 0)
    // fresh store/watermarks, two aliases of the same instance
    val (c2, w2) = (tmp(), tmp())
    val res = EtlRunner.runOnce(
      spark, Map("srvA" -> src, "srvB" -> src), c2, w2, parallelism = 2)
    // bounds, not exact equality: predicate evaluation counts are
    // plan-dependent (pushdown, row-group skipping, task retries can
    // shift them by a few rows across Spark versions) — what the test
    // pins is SHARING: the aliased pair costs about one calibrated pass
    // and strictly less than two. Slack is 10%, not 20%: memo sharing is
    // all-or-nothing per (instance, watermark), so a real regression
    // re-reads a WHOLE relation (+100% on this accumulator), while the
    // legitimate drift the slack absorbs is a few duplicated predicate
    // evaluations — a wide band was masking nothing but risk
    val aliasedCost = acc.value.longValue - onePass
    assert(aliasedCost <= onePass + onePass / 10 && aliasedCost < 2 * onePass,
      s"two aliased deliveries must cost ~ONE extract pass ($onePass rows), " +
        s"saw $aliasedCost")
    val afterAliased = acc.value.longValue
    // both report the shared batch; the first load owns every key
    val k = graft.etl.ExtractTransform
      .extract(base, EtlRunner.DefaultWatermark)
      .dropDuplicates(ConsolidatedStore.dedupKey).count()
    assert(res.map(_.extracted).distinct.size == 1)
    assert(res.map(_.appended).sum == k)
    assert(spark.read.parquet(c2).count() == k)
    val wmv = WatermarkStore.read(spark, w2)
    assert(wmv("srvA") == wmv("srvB"))
    // DISTINCT instances over the same data never share (reference
    // identity is the memo key — the real fleet path stays isolated)
    val other = base.copy(
      backupset = base.backupset.filter(counted(col("backup_set_id"))))
    val (c3, w3) = (tmp(), tmp())
    EtlRunner.runOnce(
      spark, Map("srvA" -> src, "srvB" -> other), c3, w3, parallelism = 2)
    // same bounds discipline: ~TWO passes (one each), clearly more than
    // one (no sharing across distinct instances)
    val distinctCost = acc.value.longValue - afterAliased
    assert(distinctCost > onePass + onePass / 2 &&
        distinctCost <= 2 * onePass + onePass / 10,
      "distinct source instances must each pay their own extract pass " +
        s"(calibrated $onePass rows/pass, saw $distinctCost)")
  }

  test("a failed extract is memoized: every sharer skips, the run continues") {
    val cons = tmp(); val wms = tmp()
    val good = MsdbDerivation.sources(spark, TestSpark.sf)
    val broken = good.copy(
      backupset = good.backupset.withColumn("server_name",
        org.apache.spark.sql.functions.expr(
          "CASE WHEN backup_set_id >= 0 THEN raise_error('simulated extract failure') END")))
    // the broken instance delivered under TWO aliases shares one memoized
    // Left: both sharers must skip identically (the second must not hang
    // on, rethrow through, or half-load a batch), and the run continues
    val results = EtlRunner.runOnce(
      spark, Map("dupA" -> broken, "dupB" -> broken, "good" -> good),
      cons, wms, parallelism = 3)
    val byServer = results.map(r => r.server -> r).toMap
    assert(byServer("dupA").error.exists(_.startsWith("extract failed")))
    assert(byServer("dupB").error.exists(_.startsWith("extract failed")))
    assert(byServer("dupA").error == byServer("dupB").error,
      "sharers of one memoized failure must report the same error")
    assert(byServer("good").error.isEmpty && byServer("good").appended > 0)
    assert(WatermarkStore.read(spark, wms).keySet == Set("good"))
  }

  test("Checkpoints.release frees the checkpoint's storage blocks by id") {
    val df = spark.range(100).toDF("v").localCheckpoint()
    val rddId = df.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId),
      "a localCheckpoint must hold storage blocks until released")
    graft.util.Checkpoints.release(df)
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId),
      "release must drop the checkpoint's blocks eagerly (LogicalRDD " +
        "match regressed — blocks now wait for ContextCleaner)")
  }

  test("multi-source run: failing extract skips that server only") {
    val cons = tmp(); val wms = tmp()
    val good = MsdbDerivation.sources(spark, TestSpark.sf)
    // fails when the extract materializes, like a source dropping mid-read
    val broken = good.copy(
      backupset = good.backupset.withColumn("server_name",
        org.apache.spark.sql.functions.expr(
          "CASE WHEN backup_set_id >= 0 THEN raise_error('simulated extract failure') END")))
    val results = EtlRunner.runOnce(
      spark, Map("good" -> good, "bad" -> broken), cons, wms, parallelism = 2)
    val byServer = results.map(r => r.server -> r).toMap
    assert(byServer("bad").error.exists(_.startsWith("extract failed")))
    assert(byServer("bad").newWatermark.isEmpty)
    assert(byServer("good").error.isEmpty && byServer("good").appended > 0)
    // only the good server's watermark exists
    assert(WatermarkStore.read(spark, wms).keySet == Set("good"))
  }

  test("runOnceDeferred: a source whose CONSTRUCTION fails is skipped " +
      "like a failed extract (JDBC schema resolution connects)") {
    val cons = tmp(); val wms = tmp()
    val good = MsdbDerivation.sources(spark, TestSpark.sf)
    val results = EtlRunner.runOnceDeferred(
      spark,
      Map[String, () => graft.etl.MsdbSources](
        "good" -> (() => good),
        "unreachable" -> (() => throw new java.sql.SQLException(
          "connection refused"))),
      cons, wms, parallelism = 2)
    val byServer = results.map(r => r.server -> r).toMap
    assert(byServer("unreachable").error.exists(_.startsWith("extract failed")))
    assert(byServer("good").error.isEmpty && byServer("good").appended > 0)
    assert(WatermarkStore.read(spark, wms).keySet == Set("good"))
  }

  test("retention: cutoff row survives, strictly-older rows are removed") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00"),
      (2L, "2024-01-02 00:00:00"),
      (3L, "2024-01-20 00:00:00")
    ).toDF("LogID", "s")
      .withColumn("backup_start_date", col("s").cast("timestamp")).drop("s")
    val kept = Retention
      .retained(df, retentionDays = 10, now = Timestamp.valueOf("2024-01-20 00:00:00"))
      .select("LogID").as[Long].collect().sorted
    // threshold = Jan 10; cutoff = newest start before it = Jan 2 → Jan 1 goes
    assert(kept.toSeq == Seq(2L, 3L))
    // nothing old enough → keep everything
    val all = Retention
      .retained(df, retentionDays = 30, now = Timestamp.valueOf("2024-01-20 00:00:00"))
      .count()
    assert(all == 3)
  }

  test("concurrent loads: two servers' appends interleave through the commit protocol") {
    val tmp0 = tmp()
    val (store, wmPath) = (s"$tmp0/cons", s"$tmp0/wm")
    val src = MsdbDerivation.sources(spark, TestSpark.sf)
    val servers = Map("srvA" -> src, "srvB" -> src)
    val res = EtlRunner.runOnce(spark, servers, store, wmPath,
      parallelism = 2, concurrentLoads = true)
    // both servers extracted the full history; whoever commits first owns
    // the shared keys — the SPLIT is schedule-dependent, the set is not
    val k = graft.etl.ExtractTransform
      .extract(src, EtlRunner.DefaultWatermark)
      .dropDuplicates(ConsolidatedStore.dedupKey).count()
    assert(res.map(_.appended).sum == k,
      s"appended split ${res.map(r => r.server -> r.appended)} must sum to $k")
    val stored = spark.read.parquet(store)
    assert(stored.count() == k)
    assert(stored.select("LogID").distinct().count() == k, "LogIDs unique")
    // both watermarks advanced to the batch max
    val wms = WatermarkStore.read(spark, wmPath)
    assert(wms.contains("srvA") && wms.contains("srvB") && wms("srvA") == wms("srvB"))
    // a second concurrent run is a no-op that keeps the store clean
    val res2 = EtlRunner.runOnce(spark, servers, store, wmPath,
      parallelism = 2, concurrentLoads = true)
    assert(res2.forall(_.appended == 0))
    assert(spark.read.parquet(store).count() == k)
    assert(graft.store.StoreRepair.repair(spark, store).clean)
  }

  test("concurrent load path reuses the prepared batch: no second dedup shuffle") {
    // the extract pass already grouped the batch by the dedup key; the
    // fleet-concurrent load must consume that PreparedBatch (envelopes
    // included) instead of re-running dropDuplicates per append attempt.
    // Gate: during a concurrent run, NO executed plan may contain a
    // logical Deduplicate node (the fused extract is a groupBy, the
    // prepared append takes the batch as-is).
    val tmp0 = tmp()
    val (store, wmPath) = (s"$tmp0/cons", s"$tmp0/wm")
    val src = MsdbDerivation.sources(spark, TestSpark.sf)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.analyzed.foreach {
          case d: org.apache.spark.sql.catalyst.plans.logical.Deduplicate =>
            seen.add(d.keys.map(_.name).sorted.mkString(","))
          case _ => ()
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val res = EtlRunner.runOnce(spark, Map("srvA" -> src, "srvB" -> src),
        store, wmPath, parallelism = 2, concurrentLoads = true)
      assert(res.map(_.appended).sum > 0)
      // the listener bus is async but FIFO per listener: run a sentinel
      // query that DOES dropDuplicates and wait for it — once it shows,
      // every event from the run above has been delivered
      spark.range(3).toDF("sentinel_id").dropDuplicates("sentinel_id").count()
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      while (!seen.contains("sentinel_id") && System.nanoTime < deadline)
        Thread.sleep(20L)
      assert(seen.contains("sentinel_id"), "listener bus did not drain")
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    val offenders = seen.asScala.filterNot(_ == "sentinel_id").toSeq
    assert(offenders.isEmpty,
      s"concurrent load re-ran dropDuplicates on keys: $offenders")
  }

  test("concurrent loads: one server's load failure is reported, not amplified") {
    val tmp0 = tmp()
    val (store, wmPath) = (s"$tmp0/cons", s"$tmp0/wm")
    // an unlogged non-empty store makes appendConcurrent's bootstrap
    // refuse — a LOAD-phase failure (the extract succeeds). Overlapped
    // loads must surface it per-server instead of rethrowing through
    // Await and aborting the siblings mid-flight.
    graft.etl.BackupHistoryDerivation.canonicalFrame(spark, TestSpark.sf)
      .drop("LogID").limit(5).write.parquet(store)
    val src = MsdbDerivation.sources(spark, TestSpark.sf)
    val servers = Map("srvA" -> src, "srvB" -> src)
    val res = EtlRunner.runOnce(spark, servers, store, wmPath,
      parallelism = 2, concurrentLoads = true) // must NOT throw
    assert(res.size == 2)
    assert(res.forall(_.error.exists(_.startsWith("load failed"))),
      res.mkString("; "))
    // watermarks were not advanced — the next run re-extracts the batch
    assert(WatermarkStore.read(spark, wmPath).isEmpty)
  }

  test("watermark store roundtrip") {
    val path = tmp()
    val t1 = Timestamp.valueOf("2024-01-01 10:00:00")
    val t2 = Timestamp.valueOf("2024-02-01 10:00:00")
    WatermarkStore.write(spark, path, Map("a" -> t1, "b" -> t1))
    WatermarkStore.advance(spark, path, "a", t2)
    val wm = WatermarkStore.read(spark, path)
    assert(wm == Map("a" -> t2, "b" -> t1))
  }
}
