package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Copy-on-write predicate DELETE from the consolidated store — the
  * physical form of the reference's retention proc
  * (`Utility.CleanupSQLBackupHistoryConsolidated`, sql:398-424), which
  * loop-deletes `where backup_start_date < @CleanupToDate` 500 rows at a
  * time. On immutable parquet the delete is file-level:
  *
  *   1. ONE column-pruned pass computes, per file, (matching, total) row
  *      counts — the scan reads only the predicate's columns.
  *   2. Files where every row matches are DROPPED whole — no rewrite, no
  *      data movement. Under a time-ordered ingest (or after
  *      [[graft.maintenance.Compaction.zorderCompact]]) this is the
  *      common case for retention: old files age out entirely, so a
  *      100 TB purge moves only the boundary files' bytes.
  *   3. Files with a partial match are rewritten without their matching
  *      rows (survivor copy-on-write, same shape as [[StoreMerge]]).
  *
  * Dropped and rewritten originals are archived under the commit's
  * history dir, so pre-delete snapshots stay readable and
  * [[StoreLog.changes]] can report the deleted rows. Rows where the
  * predicate is NULL are kept (SQL `DELETE WHERE` semantics: only
  * predicate-TRUE rows go).
  */
object StoreDelete {

  final case class DeleteStats(
    deleted: Long, filesDropped: Long, filesRewritten: Long)

  /** Delete rows matching `predicate`. `partitionBy`/`sortWithin` must
    * match the store's appends (same contract as
    * [[ConsolidatedStore.append]]).
    */
  def delete(spark: SparkSession, path: String, predicate: Column,
      partitionBy: Seq[String] = Nil,
      sortWithin: Seq[String] = Seq("database_name", "last_lsn")): DeleteStats = {
    val loaded = StoreMeta.load(spark, path).getOrElse(throw
      new IllegalArgumentException(
        s"delete needs a graft-managed layout (foreign subdirs found): $path"))
    if (loaded.files.isEmpty) return DeleteStats(0L, 0L, 0L)
    val rootQ = StoreMeta.qualifiedPath(spark, path)
    val hit = coalesce(predicate, lit(false))

    val perFile = spark.read
      .option("basePath", path).schema(Schemas.consolidated)
      .parquet(loaded.files.map(f => s"$path/${f.file}"): _*)
      .groupBy(input_file_name().as("__file"))
      .agg(count(lit(1)).as("n"),
        sum(when(hit, 1L).otherwise(0L)).as("n_del"))
      .collect().toSeq
      .map(r => (StoreMeta.relativize(rootQ, r.getString(0)),
        r.getLong(1), r.getLong(2)))

    val deleted = perFile.map(_._3).sum
    if (deleted == 0L) return DeleteStats(0L, 0L, 0L)
    val dropped = perFile.collect { case (f, n, d) if d == n => f }.sorted
    val partial = perFile.collect { case (f, n, d) if d > 0 && d < n => f }.sorted

    val before = loaded.files.map(_.file).toSet
    if (partial.nonEmpty) {
      val survivors = spark.read
        .option("basePath", path).schema(Schemas.consolidated)
        .parquet(partial.map(f => s"$path/$f"): _*)
        .filter(!hit)
      val laidOut =
        if (sortWithin.isEmpty) survivors
        else survivors.sortWithinPartitions(sortWithin.map(col): _*)
      val writer = laidOut.write.mode(SaveMode.Append)
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
       else writer).parquet(path)
    }
    val after = StoreMeta.listDataFiles(spark, path).getOrElse(Nil)
    val newFiles = after.filterNot(before)

    val removed = dropped ++ partial
    val first = StoreLog.currentVersion(spark, path) == 0
    if (first) {
      val fs = rootQ.getFileSystem(spark.sessionState.newHadoopConf())
      removed.foreach(f => fs.delete(new Path(s"$path/$f"), false))
    } else {
      val v = StoreLog.currentVersion(spark, path) + 1
      StoreLog.archive(spark, path, v,
        removed.map(f => (new Path(s"$path/$f"), f)))
    }
    StoreLog.commit(spark, path, "delete",
      adds = if (first) StoreMeta.listDataFiles(spark, path).getOrElse(Nil)
             else newFiles,
      removes = if (first) Nil else removed)

    val removedSet = removed.toSet
    StoreMeta.save(spark, path,
      loaded.files.filterNot(f => removedSet(f.file)) ++
        StoreMeta.scanStats(spark, path, newFiles))
    DeleteStats(deleted, dropped.size.toLong, partial.size.toLong)
  }

  /** The reference retention proc against the store: compute the cutoff
    * (newest start date older than `now - retentionDays` — the cutoff
    * row itself survives, sql:404-408) from a column-pruned scan, then
    * [[delete]] everything strictly below it.
    */
  def purgeExpired(spark: SparkSession, path: String, retentionDays: Int,
      now: java.sql.Timestamp,
      partitionBy: Seq[String] = Nil): DeleteStats = {
    val cutoff = graft.maintenance.Retention.cleanupCutoff(
      ConsolidatedStore.read(spark, path).select("backup_start_date"),
      retentionDays, now)
    cutoff match {
      case None => DeleteStats(0L, 0L, 0L)
      case Some(c) =>
        delete(spark, path, col("backup_start_date") < lit(c), partitionBy)
    }
  }
}
