package graft.store

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

import graft.model.{Schemas, SourceServerWatermark}

/** The reference's control table `Utility.SQLBackupHistorySourceServers`
  * (sql:42-51): one `(ServerName, LastETLDatetime)` row per source.
  *
  * The reference advances a server's watermark with a point UPDATE
  * (`Update-LastETLDateTimeForServer.ps1:33-53`) — atomic per row. A
  * whole-file rewrite is NOT: two fleet drivers interleaving
  * read-modify-write on the same table lose updates. Instead of a lock
  * or a version claim, [[advance]] exploits the watermark's algebra:
  * the ETL contract only ever moves a server's watermark FORWARD (batch
  * max, advanced after a successful load), so the table is a per-server
  * max-merge CRDT. An advance appends one tiny single-row delta file
  * (unique name, staged then renamed — no shared `_temporary` dir to
  * race on) and [[read]] folds all segments with `max` per server.
  * Concurrent advancers from different JVMs both land; max wins;
  * nothing is lost, with no coordination at all.
  *
  * A delta log needs folding: past [[FoldThreshold]] segments,
  * [[advance]] folds a CAPTURED list of segment files into one
  * max-merged segment and deletes exactly those files — a racer's
  * concurrently-appended delta is not captured and survives; two racing
  * folds both publish (overlapping) folded segments and tolerate each
  * other's deletes, still correct under max-merge. A reader racing a
  * fold's deletes retries on vanished files and sees the folded segment
  * on the fresh listing.
  *
  * [[write]] remains the single-writer full overwrite — initialization
  * and explicit resets (deliberately REWINDING a watermark to force a
  * re-extract), which max-merge by design cannot express.
  */
object WatermarkStore {

  /** Fold the delta segments when an advance observes more than this
    * many files — keeps [[read]] a driver-trivial scan while amortizing
    * the fold to one in `FoldThreshold` advances.
    */
  val FoldThreshold = 64

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def segmentFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val f = fs(spark, p)
    if (!f.exists(p)) return Nil
    f.listStatus(p).toSeq
      .collect {
        case e if e.isFile && e.getPath.getName.endsWith(".parquet") &&
          !e.getPath.getName.startsWith("_") &&
          !e.getPath.getName.startsWith(".") => e.getPath.getName
      }
  }

  def read(spark: SparkSession, path: String): Map[String, Timestamp] =
    readHooked(spark, path)(_ => ())

  /** [[read]] with a test seam: `afterListing(files)` runs between the
    * segment listing and the parquet read — exactly the window a racing
    * fold's deletes land in. The concurrency spec deletes a listed
    * segment there to drive the vanished-file retry deterministically.
    *
    * Two retry triggers, both from folds racing the read:
    *
    *   - a captured segment vanished between listing and read — the
    *     fresh listing carries its folded replacement;
    *   - the listing CHANGED between the pre-read and post-read scans. A
    *     directory scan is not an atomic snapshot: a fold publishing its
    *     folded segment and deleting the captured originals DURING the
    *     scan can make the scan miss BOTH (an entry added or removed
    *     mid-scan may or may not be seen), silently dropping a server's
    *     latest value with no exception to catch. A listing that is
    *     bytewise stable across the read has no such window: any file
    *     deleted before/during the first scan had its superseding folded
    *     segment published earlier still, so it existed for the whole of
    *     the second scan and would show as a difference.
    *
    * After the retry budget (constant folding — only sustainable by a
    * pathological test), the last successful read is returned: a
    * stale-but-valid CRDT state (every value was genuinely issued;
    * max-merge makes acting on staleness safe — the ETL rewind window
    * and idempotent dedup absorb it). A quiescent read is exact.
    */
  private[graft] def readHooked(spark: SparkSession, path: String)(
      afterListing: Seq[String] => Unit): Map[String, Timestamp] = {
    var attempt = 0
    var lastGood: Map[String, Timestamp] = null
    while (attempt < 16) {
      val files = segmentFiles(spark, path)
      if (files.isEmpty) return Map.empty
      afterListing(files)
      try {
        val m = spark.read
          .schema(Schemas.sourceServers)
          .parquet(files.map(f => s"$path/$f"): _*)
          .groupBy("ServerName")
          .agg(org.apache.spark.sql.functions.max("LastETLDatetime")
            .as("LastETLDatetime"))
          .collect()
          .map(r => r.getString(0) -> r.getTimestamp(1)).toMap
        if (segmentFiles(spark, path).toSet == files.toSet) return m
        lastGood = m
      } catch {
        case e: Exception if StoreLog.fileVanished(e) => ()
      }
      attempt += 1
    }
    if (lastGood != null) lastGood
    else throw new IllegalStateException(
      s"watermark read on $path could not complete under constant folding")
  }

  /** Full overwrite — initialization and explicit watermark RESETS.
    * Single-writer by contract (a reset is an operator action, not a
    * fleet-concurrent one).
    */
  def write(spark: SparkSession, path: String, wm: Map[String, Timestamp]): Unit = {
    val rows = wm.toSeq.sortBy(_._1).map { case (s, t) => Row(s, t) }
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), Schemas.sourceServers)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Advance one server's watermark (write-after-load ordering is the
    * caller's job — `Invoke-SQLBackupHistoryETL.ps1:52-65`). Safe under
    * concurrent advancers across processes: append + max-merge, no
    * read-modify-write anywhere.
    */
  def advance(spark: SparkSession, path: String, server: String,
      newWatermark: Timestamp): Unit =
    advance(spark, path, server, newWatermark, FoldThreshold)

  /** [[advance]] with an explicit fold threshold — the concurrency spec
    * lowers it so folds race advances (and each other) every few calls.
    */
  private[graft] def advance(spark: SparkSession, path: String,
      server: String, newWatermark: Timestamp, foldThreshold: Int): Unit = {
    appendSegment(spark, path, Map(server -> newWatermark))
    val files = segmentFiles(spark, path)
    if (files.size > foldThreshold) fold(spark, path, files)
  }

  /** Stage one max-merged segment and rename it into the table dir
    * under a unique name — every advance writes through its OWN staging
    * dir, so concurrent Spark jobs never share a `_temporary` dir.
    */
  private def appendSegment(spark: SparkSession, path: String,
      wm: Map[String, Timestamp]): Unit = {
    val id = java.util.UUID.randomUUID().toString
    val stage = s"$path/_wm_staging/$id"
    write(spark, stage, wm)
    val f = fs(spark, new Path(path))
    val part = f.listStatus(new Path(stage))
      .map(_.getPath).find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(
        s"watermark segment write produced no parquet under $stage"))
    require(f.rename(part, new Path(s"$path/delta-$id.parquet")),
      s"watermark segment publish failed: $part")
    f.delete(new Path(s"$path/_wm_staging/$id"), true)
  }

  /** Fold exactly `captured` into one segment, then delete them. A
    * racer's uncaptured delta survives; a racing fold's already-deleted
    * file is tolerated (delete-if-present).
    */
  private def fold(spark: SparkSession, path: String,
      captured: Seq[String]): Unit = {
    val folded =
      try {
        spark.read
          .schema(Schemas.sourceServers)
          .parquet(captured.map(f => s"$path/$f"): _*)
          .groupBy("ServerName")
          .agg(org.apache.spark.sql.functions.max("LastETLDatetime")
            .as("LastETLDatetime"))
          .collect()
          .map(r => r.getString(0) -> r.getTimestamp(1)).toMap
      } catch {
        // a racing fold already consumed part of our captured set — its
        // folded segment carries those rows; skip this fold
        case e: Exception if StoreLog.fileVanished(e) => return
      }
    appendSegment(spark, path, folded)
    val f = fs(spark, new Path(path))
    captured.foreach(c => f.delete(new Path(s"$path/$c"), false))
  }

  def toDf(spark: SparkSession, wm: Map[String, Timestamp]): DataFrame = {
    import spark.implicits._
    wm.toSeq.sortBy(_._1)
      .map { case (s, t) => SourceServerWatermark(s, t) }.toDF()
  }
}
