package graft.maintenance

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for the consolidated store. Incremental
  * ETL appends one file set per (source, batch); at streaming cadence a
  * year of appends is hundreds of thousands of KB-sized files, and scan
  * cost becomes file-listing + footer-reading, not IO. Compaction
  * rewrites the table into range-partitioned files sorted on
  * `(database_name, last_lsn)` — the restore access path — so parquet
  * min/max row-group stats line up with the per-database predicates every
  * restore query pushes down (the same layout
  * `ConsolidatedStore.append` targets for a single batch, reasserted
  * table-wide).
  *
  * The rewrite stages into a sibling directory and swaps via two
  * filesystem renames, keeping a readable table throughout (modulo the
  * instant between renames — callers schedule compaction like the
  * reference schedules its retention delete, off the ingest path). On
  * object stores without atomic rename the staging dir still bounds the
  * exposure to the swap instant rather than the whole rewrite.
  */
object Compaction {

  /** @return number of data files after compaction. */
  def compact(
      spark: SparkSession, path: String,
      maxRecordsPerFile: Long = 5000000L): Long =
    rewrite(spark, path, maxRecordsPerFile)(
      _.repartitionByRange(col("database_name"), col("last_lsn"))
        .sortWithinPartitions("database_name", "last_lsn"))

  /** Z-order compaction: cluster on the Morton interleave of a hashed
    * `database_name` bin and a range-scaled `backup_finish_date` bin
    * ([[ZOrder]]) so BOTH the per-database restore paths and fleet-wide
    * time-range scans (retention cutoffs, point-in-time planning) prune
    * files — one physical order serving the reference's two leading index
    * columns (sql:34-36) at once. Use instead of [[compact]] when the
    * store is queried on both axes; same staging-rename swap and sidecar
    * re-seed.
    *
    * @return number of data files after the rewrite.
    */
  def zorderCompact(
      spark: SparkSession, path: String,
      maxRecordsPerFile: Long = 5000000L): Long = {
    import org.apache.spark.sql.functions.{max, min, unix_micros}
    if (graft.store.StoreMeta.listDataFiles(spark, path)
        .getOrElse(Nil).isEmpty) return 0L // empty store: no-op (see rewrite)
    val bounds = spark.read.parquet(path)
      .agg(min(unix_micros(col("backup_finish_date"))),
        max(unix_micros(col("backup_finish_date")))).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 0L) else (bounds.getLong(0), bounds.getLong(1))
    rewrite(spark, path, maxRecordsPerFile) { df =>
      val z = ZOrder.mortonCode(
        ZOrder.hashBin16(col("database_name")),
        ZOrder.rangeBin16(unix_micros(col("backup_finish_date")), lo, hi))
      df.withColumn("__z", z)
        .repartitionByRange(col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    }
  }

  /** Staged rewrite: apply `layout`, write to a sibling dir, swap via two
    * renames, re-seed the zone-map sidecar.
    */
  private def rewrite(
      spark: SparkSession, path: String, maxRecordsPerFile: Long)(
      layout: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Long = {
    // a fully-deleted store has nothing to lay out (and no schema to
    // infer from the directory) — compaction is a no-op, not a crash
    if (graft.store.StoreMeta.listDataFiles(spark, path)
        .getOrElse(Nil).isEmpty) return 0L
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(path + "__compacting")
    val bak = new Path(path + "__precompact")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(bak)) fs.delete(bak, true)

    layout(spark.read.parquet(path))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(tmp.toString)

    require(fs.rename(dst, bak), s"compaction swap failed: $dst -> $bak")
    require(fs.rename(tmp, dst), s"compaction swap failed: $tmp -> $dst")
    // Time travel: if the store carried a commit log, carry it (and the
    // accumulated history) into the rewritten root, archive the replaced
    // data files under the new commit's history dir instead of deleting
    // them, and record the rewrite as one adds/removes commit. Stores
    // without a log keep the old delete-the-backup behavior.
    val logInBak = new Path(bak, graft.store.StoreLog.dirName)
    if (fs.exists(logInBak)) {
      require(fs.rename(logInBak, new Path(dst, graft.store.StoreLog.dirName)),
        s"compaction log carry failed: $logInBak")
      val histInBak = new Path(bak, graft.store.StoreLog.historyDirName)
      if (fs.exists(histInBak))
        require(
          fs.rename(histInBak, new Path(dst, graft.store.StoreLog.historyDirName)),
          s"compaction history carry failed: $histInBak")
      val oldFiles = graft.store.StoreMeta
        .listDataFiles(spark, bak.toString).getOrElse(Nil)
      val newFiles = graft.store.StoreMeta
        .listDataFiles(spark, path).getOrElse(Nil)
      val v = graft.store.StoreLog.currentVersion(spark, path) + 1
      graft.store.StoreLog.archive(spark, path, v,
        oldFiles.map(fl => (new Path(bak, fl), fl)))
      graft.store.StoreLog.commit(spark, path, "compact",
        adds = newFiles, removes = oldFiles)
    }
    fs.delete(bak, true)
    // re-seed the store's zone-map sidecar for the files just written:
    // the swap dropped the old one (it described pre-compaction files),
    // and without this the NEXT append pays a full heal scan. One extra
    // pass over data that is already hot from the rewrite. listDataFiles
    // walks hive-partitioned (`name=`) layouts too; note the rewrite
    // itself writes a FLAT layout — a hive store comes out flat (with the
    // partition column folded back into the data), content preserved.
    graft.store.StoreMeta.listDataFiles(spark, path).foreach { files =>
      graft.store.StoreMeta.save(
        spark, path, graft.store.StoreMeta.scanStats(spark, path, files))
    }
    dataFileCount(spark, path)
  }

  /** Incremental small-file OPTIMIZE: bin-pack only files smaller than
    * `minBytes` into consolidated rewrites, leaving every
    * already-large-enough file untouched BY IDENTITY. [[compact]] and
    * [[zorderCompact]] rewrite the whole table (right after a backfill,
    * or to re-cluster); this is the steady-state maintenance shape
    * between them — a store receiving trickle appends accumulates one
    * small file per batch, and folding them costs O(small files), not
    * O(table). Replaced originals archive under the commit's history dir
    * ([[graft.store.StoreLog]]) so pre-optimize snapshots stay readable;
    * the zone-map sidecar keeps the untouched files' stats and rescans
    * only the new files.
    *
    * @return (filesRewritten, filesAfter)
    */
  def optimizeSmall(
      spark: SparkSession, path: String, minBytes: Long,
      maxRecordsPerFile: Long = 5000000L): (Long, Long) = {
    import graft.store.{StoreLog, StoreMeta}
    val rootFs = new Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val all = StoreMeta.listDataFiles(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"optimize needs a graft-managed layout: $path"))
    val small = all.filter { f =>
      rootFs.getFileStatus(new Path(s"$path/$f")).getLen < minBytes
    }.sorted
    if (small.size < 2) return (0L, dataFileCount(spark, path))

    val before = all.toSet
    // bin-pack: one output file per minBytes of input (the whole point —
    // without an explicit target the range partitioning would re-shard
    // the handful of rows across the session's shuffle partitions)
    val totalBytes = small.map(f =>
      rootFs.getFileStatus(new Path(s"$path/$f")).getLen).sum
    val target = math.max(1L,
      (totalBytes + minBytes - 1) / minBytes).toInt
    spark.read
      .option("basePath", path)
      .schema(graft.model.Schemas.consolidated)
      .parquet(small.map(f => s"$path/$f"): _*)
      .repartitionByRange(target, col("database_name"), col("last_lsn"))
      .sortWithinPartitions("database_name", "last_lsn")
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
    val newFiles = StoreMeta.listDataFiles(spark, path)
      .getOrElse(Nil).filterNot(before)

    val first = StoreLog.currentVersion(spark, path) == 0
    if (first) small.foreach(f => rootFs.delete(new Path(s"$path/$f"), false))
    else {
      val v = StoreLog.currentVersion(spark, path) + 1
      StoreLog.archive(spark, path, v,
        small.map(f => (new Path(s"$path/$f"), f)))
    }
    StoreLog.commit(spark, path, "optimize",
      adds = if (first) StoreMeta.listDataFiles(spark, path).getOrElse(Nil)
             else newFiles,
      removes = if (first) Nil else small)

    // fold the sidecar: load() reconciles against the post-optimize
    // listing — untouched files keep their recorded stats, the new files
    // heal via one O(new) scan, the removed entries drop
    StoreMeta.load(spark, path)
      .foreach(l => StoreMeta.save(spark, path, l.files))
    (small.size.toLong, dataFileCount(spark, path))
  }

  /** Parquet data-file count of a table directory (recursive, skips
    * _SUCCESS and hidden files) — the health metric compaction drives
    * down.
    */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // manual recursion so hidden/metadata DIRECTORIES (_graft_meta, the
    // _graft_history archive) are skipped whole — fs.listFiles(p, true)
    // would descend into them and count archived data files as live
    def walk(dir: Path): Long = {
      var n = 0L
      fs.listStatus(dir).foreach { e =>
        val name = e.getPath.getName
        if (!name.startsWith(".") && !name.startsWith("_")) {
          if (e.isDirectory) n += walk(e.getPath)
          else if (name.endsWith(".parquet")) n += 1
        }
      }
      n
    }
    if (fs.exists(p)) walk(p) else 0L
  }
}
