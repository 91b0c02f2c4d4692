package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staged publication of new data files into a store root.
  *
  * Every writer that creates files for a commit (concurrent appends,
  * merge/delete survivor rewrites, small-file optimize, CoW compaction)
  * writes them under `<root>/_graft_staging/<uuid>` — invisible to
  * table scans and to [[StoreMeta.listDataFiles]] — then moves them
  * into the root by rename. The mover therefore knows the EXACT set of
  * file names it created: commits record that set, never a
  * before/after directory-listing diff, so a concurrent writer's
  * in-flight files (published to the root but not yet committed) can
  * never be absorbed into another writer's commit. A crash leaves
  * either an inert staging dir (dropped wholesale by
  * [[StoreRepair.repair]]) or uncommitted root files (reconciled as
  * orphans against the log).
  */
private[graft] object Staging {

  val dirName = "_graft_staging"

  /** Write `df`'s parquet through a fresh staging dir and move the data
    * files into `root`, preserving relative (partition) paths. Returns
    * the root-relative paths of exactly the files this writer created.
    */
  def publish(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Seq[String] = {
    val (stageDir, mine) = stage(spark, root, df, partitionBy, maxRecordsPerFile)
    promote(spark, root, stageDir, mine)
  }

  /** Phase 1 of [[publish]]: EXECUTE the write into a fresh staging dir
    * (invisible to scans) and return `(stagingDir, relativeFiles)`.
    * Splitting the phases lets a file-REPLACING op (merge, delete,
    * compaction) archive the originals it read BETWEEN the write (whose
    * input scan still needs those originals in place — DataFrames read
    * lazily, at write time) and [[promote]] — so plain directory readers
    * never see original + replacement rows together. The inconsistent
    * window shrinks to the archive/promote rename loops (metadata ops),
    * with no duplicate-row phase at all.
    */
  def stage(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): (String, Seq[String]) = {
    val stageDir = s"$root/$dirName/${java.util.UUID.randomUUID()}"
    val writer = df.write
    if (maxRecordsPerFile > 0L)
      writer.option("maxRecordsPerFile", maxRecordsPerFile)
    // a failed staged write (e.g. a racing CoW commit archived an input
    // file mid-job — the optimistic appender redoes such attempts)
    // must not leave a partial staging dir for repair to reconcile
    try (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
         else writer).parquet(stageDir)
    catch { case e: Throwable => abandon(spark, stageDir); throw e }
    (stageDir, StoreMeta.listDataFiles(spark, stageDir).getOrElse(Nil))
  }

  /** Phase 2 of [[publish]]: move the staged files into the root. */
  def promote(spark: SparkSession, root: String, stageDir: String,
      files: Seq[String]): Seq[String] = {
    val rootQ = StoreMeta.qualifiedPath(spark, root)
    val fs = rootQ.getFileSystem(spark.sessionState.newHadoopConf())
    files.foreach { f =>
      val dst = new Path(s"$root/$f")
      fs.mkdirs(dst.getParent)
      require(fs.rename(new Path(s"$stageDir/$f"), dst),
        s"staged publish: move failed $stageDir/$f")
    }
    fs.delete(new Path(stageDir), true)
    files
  }

  /** Drop a staged-but-never-promoted dir wholesale (e.g. a fused
    * trickle append whose write observed zero fresh rows).
    */
  def abandon(spark: SparkSession, stageDir: String): Unit = {
    val p = new Path(stageDir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    ()
  }

  /** Un-publish files this writer moved into the root (lost a version
    * race, or an abort path) — exact names only, never a listing.
    */
  def retract(spark: SparkSession, root: String, files: Seq[String]): Unit = {
    val rootQ = StoreMeta.qualifiedPath(spark, root)
    val fs = rootQ.getFileSystem(spark.sessionState.newHadoopConf())
    files.foreach(f => fs.delete(new Path(s"$root/$f"), false))
  }
}
