package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Crash recovery for the copy-on-write operations
  * ([[StoreMerge]], [[StoreDelete]], [[graft.maintenance.Compaction]]).
  *
  * Their swap sequence is: (1) write replacement files, (2) archive the
  * replaced originals into the next commit's history dir, (3) write the
  * commit, (4) update the sidecar. A crash inside that window leaves the
  * directory inconsistent with the last commit, and — because
  * current-state reads are plain directory scans — the inconsistency is
  * DURABLE, not transient:
  *
  *   - crash after (1): listing readers see every matched key twice
  *     (original + replacement), and [[StoreMeta.load]] heals the
  *     replacements into the sidecar as if they were committed;
  *   - crash after (2): the originals sit in a history dir whose version
  *     was never committed — the table silently lost rows the log still
  *     considers live.
  *
  * [[repair]] reconciles the directory against the last commit, exactly
  * the "reconcile adds/removes on open" recovery a transaction log
  * enables. It rolls BACKWARD (the unfinished operation is discarded;
  * its writer reruns it — every CoW op here is either idempotent or
  * replay-guarded by its txn token):
  *
  *   1. restore files from history dirs of versions NEWER than the last
  *      commit back into the root (undoes an unfinished archive),
  *   2. delete data files absent from the log's live set (undoes an
  *      unfinished replacement write — and, for a crashed plain append,
  *      drops the uncommitted batch, which the ETL watermark contract
  *      re-extracts),
  *   3. rewrite the sidecar from the surviving live files' recorded
  *      stats, rescanning only files the sidecar doesn't know.
  *
  * O(history-dirs + |live set| + orphans) driver-side metadata work plus
  * a stats rescan of at most the orphan-healed files — never a table
  * scan. Run it on open when a previous writer may have died; a clean
  * store is a no-op. Stores without a commit log have no reconciliation
  * baseline and are returned untouched.
  */
object StoreRepair {

  final case class RepairStats(restored: Long, orphansDropped: Long) {
    def clean: Boolean = restored == 0L && orphansDropped == 0L
  }

  def repair(spark: SparkSession, root: String): RepairStats = {
    val current = StoreLog.currentVersion(spark, root)
    if (current == 0) return RepairStats(0L, 0L) // no log — no baseline
    val rootQ = StoreMeta.qualifiedPath(spark, root)
    val fs = rootQ.getFileSystem(spark.sessionState.newHadoopConf())

    // 1. unfinished archive: history dirs beyond the last commit hold
    // files the log still lists as live — move them back
    var restored = 0L
    val histDir = new Path(s"$root/${StoreLog.historyDirName}")
    if (fs.exists(histDir)) {
      fs.listStatus(histDir).foreach { e =>
        val n = e.getPath.getName
        if (n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
          n.drop(1).toInt > current) {
          val it = fs.listFiles(e.getPath, true)
          while (it.hasNext) {
            val f = it.next()
            if (f.isFile) {
              val rel = StoreMeta.relativize(
                fs.makeQualified(e.getPath), f.getPath.toString)
              val dst = new Path(s"$root/$rel")
              fs.mkdirs(dst.getParent)
              require(fs.rename(f.getPath, dst),
                s"repair: restore failed ${f.getPath} -> $dst")
              restored += 1L
            }
          }
          fs.delete(e.getPath, true)
        }
      }
    }

    // 2. live set per the log; anything else on disk is an uncommitted
    // replacement/append — drop it
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    StoreLog.readCommits(spark, root).foreach { c =>
      live ++= c.adds; live --= c.removes
    }
    val onDisk = StoreMeta.listDataFiles(spark, root).getOrElse(Nil)
    val orphans = onDisk.filterNot(live)
    orphans.foreach(f => fs.delete(new Path(s"$root/$f"), false))

    // 3. sidecar: keep recorded stats for surviving live files, rescan
    // only files the sidecar never saw (e.g. restored before any load)
    if (restored > 0L || orphans.nonEmpty) {
      val known = StoreMeta.load(spark, root)
        .map(_.files).getOrElse(Nil).filter(f => live(f.file))
      val missing = live.toSeq.filterNot(known.map(_.file).toSet)
      StoreMeta.save(spark, root,
        known ++ StoreMeta.scanStats(spark, root, missing))
    }
    RepairStats(restored, orphans.size.toLong)
  }
}
