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

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  final case class DeleteStats(
    deleted: Long, filesDropped: Long, filesRewritten: Long)

  /** Delete rows matching `predicate`. `partitionBy`/`sortWithin` must
    * match the store's appends (same contract as
    * [[ConsolidatedStore.append]]).
    *
    * @param fileVerdict optional sidecar-stats pre-classification of each
    *   file against the predicate: `Some(true)` = EVERY row matches
    *   (drop whole — no data scan, row count comes from parquet footers),
    *   `Some(false)` = NO row matches (untouched — no scan at all),
    *   `None` = unknown (pay the column-pruned counting scan). The
    *   caller owns soundness: a wrong verdict deletes or keeps wrong
    *   rows. [[purgeExpired]] derives it from the sidecar's
    *   backup_start_date envelopes, which is what turns a 100 TB
    *   retention purge into a metadata operation on all but the one
    *   boundary file.
    */
  def delete(spark: SparkSession, path: String, predicate: Column,
      partitionBy: Seq[String] = Nil,
      sortWithin: Seq[String] = Seq("database_name", "last_lsn"),
      fileVerdict: FileStats => Option[Boolean] = _ => None): DeleteStats = {
    val loaded0 = StoreMeta.load(spark, path).getOrElse(throw
      new IllegalArgumentException(
        s"delete needs a graft-managed layout (foreign subdirs found): $path"))
    // wait out a racing replacer's archive→commit window before trusting
    // the loaded stats (the append-side awaitCommittedCoverage rule): a
    // committed-live file that is off disk mid-swap would otherwise be
    // silently EXCLUDED from the candidate set, and if an unrelated
    // append bumps the version this delete's commit rebases disjointly —
    // predicate-matching rows in that file durably survive a
    // "successful" delete with no error anywhere
    val loaded = ConsolidatedStore.awaitCommittedCoverage(spark, path, loaded0)
    // delete the COMMITTED live set only (same rule as
    // Compaction.rewriteCow): the sidecar load heals in every file the
    // directory lists — including a concurrent appender's
    // published-but-unclaimed batch. Absorbing such a file into this
    // delete's removes would archive rows whose commit hasn't landed
    // (silently lost once it does) and breaks the disjointness that
    // lets racing appends rebase this commit. Unlogged stores have no
    // committed set — their single-writer bootstrap contract applies.
    val candidates = StoreLog.committedLiveSet(spark, path) match {
      case Some(live) => loaded.files.filter(f => live(f.file))
      case None => loaded.files
    }
    if (candidates.isEmpty) return DeleteStats(0L, 0L, 0L)
    val rootQ = StoreMeta.qualifiedPath(spark, path)
    val hit = coalesce(predicate, lit(false))

    // sidecar-healed files carry fresh stats, so verdicts are current
    val verdicts = candidates.map(f => f.file -> fileVerdict(f))
    val wholeFiles = verdicts.collect { case (f, Some(true)) => f }.sorted
    val unknown = verdicts.collect { case (f, None) => f }

    val perFile =
      if (unknown.isEmpty) Nil
      else spark.read
        .option("basePath", path).schema(Schemas.consolidated)
        .parquet(unknown.map(f => s"$path/$f"): _*)
        .groupBy(input_file_name().as("__file"))
        .agg(count(lit(1)).as("n"),
          sum(when(hit, 1L).otherwise(0L)).as("n_del"))
        .collect().toSeq
        .map(r => (StoreMeta.relativize(rootQ, r.getString(0)),
          r.getLong(1), r.getLong(2)))

    // all-match files: row count from parquet footers only (count(*)
    // aggregate pushdown — no column data is read)
    val wholeRows =
      if (wholeFiles.isEmpty) 0L
      else spark.read
        .option("basePath", path).schema(Schemas.consolidated)
        .parquet(wholeFiles.map(f => s"$path/$f"): _*)
        .count()

    val deleted = perFile.map(_._3).sum + wholeRows
    if (deleted == 0L) return DeleteStats(0L, 0L, 0L)
    val dropped =
      (wholeFiles ++ perFile.collect { case (f, n, d) if d == n => f }).sorted
    val partial = perFile.collect { case (f, n, d) if d > 0 && d < n => f }.sorted

    // stage (executes the survivor rewrite while the originals are
    // readable), archive the removed originals, THEN promote — readers
    // never see a surviving row's original and rewrite together. Adds
    // are the exact survivor files this delete created, never a
    // directory-listing diff that could absorb a concurrent appender's
    // in-flight files into this commit.
    val staged: Option[(String, Seq[String])] =
      if (partial.isEmpty) None
      else {
        val survivors = spark.read
          .option("basePath", path).schema(Schemas.consolidated)
          .parquet(partial.map(f => s"$path/$f"): _*)
          .filter(!hit)
        val laidOut =
          if (sortWithin.isEmpty) survivors
          else survivors.sortWithinPartitions(sortWithin.map(col): _*)
        Some(Staging.stage(spark, path, laidOut, partitionBy))
      }
    val newFiles = staged.map(_._2).getOrElse(Nil)

    val removed = dropped ++ partial
    // belt-and-braces: nothing to remove and nothing staged must not
    // claim an archive home or write an empty replacing commit (an
    // empty-removes commit is never vacuumed and every repair re-walks
    // its history dir)
    if (removed.isEmpty && staged.isEmpty)
      return DeleteStats(deleted, 0L, 0L)
    // a pre-log store BASELINES first (v1 = every live file), then takes
    // the logged path like everyone else: the old logless branch deleted
    // un-archived originals after the promote, and a crash inside that
    // window left durable duplicate survivor rows that no repair could
    // reconcile (currentVersion == 0 has no baseline to roll back to —
    // and a rerun would rewrite the partial file AGAIN, compounding)
    if (StoreLog.currentVersion(spark, path) == 0)
      StoreLog.commit(spark, path, "baseline",
        adds = StoreMeta.listDataFiles(spark, path).getOrElse(Nil),
        removes = Nil)
    val v = StoreLog.currentVersion(spark, path) + 1
    StoreLog.archive(spark, path, v,
      removed.map(f => (new Path(s"$path/$f"), f)))
    staged.foreach { case (d, fl) => Staging.promote(spark, path, d, fl) }
    // optimistic claim (see StoreLog.commitReplacing): disjoint racers
    // rebase, overlapping rewrites roll back and abort
    StoreLog.commitReplacing(spark, path, "delete",
      adds = newFiles, removes = removed, archivedAt = v)

    // post-commit sidecar fold: a pure cache — never fail a delete
    // whose commit already landed
    try {
      val removedSet = removed.toSet
      StoreMeta.save(spark, path,
        loaded.files.filterNot(f => removedSet(f.file)) ++
          StoreMeta.scanStats(spark, path, newFiles))
    } catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"post-commit sidecar fold failed on $path " +
          "(cache only — next load() heals): " + e)
    }
    DeleteStats(deleted, dropped.size.toLong, partial.size.toLong)
  }

  /** The reference retention proc against the store: compute the cutoff
    * (newest start date older than `now - retentionDays` — the cutoff
    * row itself survives, sql:404-408), then [[delete]] everything
    * strictly below it.
    *
    * Both phases run off the sidecar's backup_start_date envelopes when
    * available:
    *
    *   - the CUTOFF (max start date below the threshold) folds the
    *     per-file maxima that sit entirely below the threshold on the
    *     driver and scans only the files whose envelope STRADDLES it —
    *     under a time-correlated layout that is one boundary file;
    *   - the DELETE classifies each file by envelope: entirely below the
    *     cutoff → dropped whole (footer-count only), entirely at/above →
    *     untouched (no scan), straddling → counting scan + survivor
    *     rewrite. Sound because `backup_start_date` is non-null in the
    *     consolidated schema, so min/max cover every row.
    *
    * Stores without a usable sidecar (foreign layouts) fall back to the
    * full column-pruned scan for the cutoff and per-file counting for
    * the delete.
    */
  def purgeExpired(spark: SparkSession, path: String, retentionDays: Int,
      now: java.sql.Timestamp,
      partitionBy: Seq[String] = Nil): DeleteStats = {
    val loaded = StoreMeta.load(spark, path)
    val threshold = new java.sql.Timestamp(
      now.getTime - retentionDays * 86400000L)
    val thresholdUs = StoreMeta.micros(threshold)

    val cutoffUs: Option[Long] = loaded match {
      case Some(l) if l.files.nonEmpty && l.files.forall(_.startMaxUs != null) =>
        val belowMeta = l.files
          .filter(f => f.startMaxUs < thresholdUs && f.startMaxUs != Long.MinValue)
          .map(_.startMaxUs.longValue)
        val straddling = l.files
          .filter(f => f.startMinUs < thresholdUs && f.startMaxUs >= thresholdUs)
        val scanned: Option[Long] =
          if (straddling.isEmpty) None
          else Option(spark.read
            .option("basePath", path).schema(Schemas.consolidated)
            .parquet(straddling.map(f => s"$path/${f.file}"): _*)
            .filter(col("backup_start_date") < lit(threshold))
            .agg(max(unix_micros(col("backup_start_date")))).head().get(0))
            .map(_.asInstanceOf[Long])
        (belowMeta ++ scanned).reduceOption(_ max _)
      case _ =>
        graft.maintenance.Retention.cleanupCutoff(
          ConsolidatedStore.read(spark, path).select("backup_start_date"),
          retentionDays, now).map(StoreMeta.micros)
    }

    cutoffUs match {
      case None => DeleteStats(0L, 0L, 0L)
      case Some(cUs) =>
        val c = new java.sql.Timestamp(Math.floorDiv(cUs, 1000L))
        c.setNanos((Math.floorMod(cUs, 1000000L) * 1000L).toInt)
        delete(spark, path, col("backup_start_date") < lit(c), partitionBy,
          fileVerdict = f =>
            if (f.startMinUs == null || f.startMaxUs == null) None
            else if (f.startMaxUs < cUs) Some(true) // every row expired
            else if (f.startMinUs >= cUs) Some(false) // every row survives
            else None)
    }
  }
}
