package graft.store

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * max-merge CRDT. An advance appends one tiny delta segment (unique
  * name, staged then renamed) and [[read]] folds all segments with
  * `max` per server. Concurrent advancers from different JVMs both
  * land; max wins; nothing is lost, with no coordination at all.
  *
  * Segments are JSON-lines files written and read DRIVER-side (the
  * whole table is metadata — one row per source server — and must never
  * schedule a cluster job; an advance is two filesystem calls). Legacy
  * Spark-written parquet segments still read and fold away.
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

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Reader-contention health counters, cumulative per JVM. A retry or
    * fallback is SOUND (the CRDT absorbs staleness) but should never be
    * invisible: a pathological fold-storm shows up here long before it
    * shows up as latency. [[graft.etl.EtlRunner]] snapshots the counters
    * around its control-table read and stamps the delta on every
    * per-server result.
    */
  final case class ReadHealth(
      unstableRetries: Long, staleFallbacks: Long, bestEffortReads: Long) {
    def -(o: ReadHealth): ReadHealth = ReadHealth(
      unstableRetries - o.unstableRetries,
      staleFallbacks - o.staleFallbacks,
      bestEffortReads - o.bestEffortReads)
    def total: Long = unstableRetries + staleFallbacks + bestEffortReads
  }

  object ReadStats {
    import java.util.concurrent.atomic.AtomicLong
    private[WatermarkStore] val unstableRetries = new AtomicLong
    private[WatermarkStore] val staleFallbacks = new AtomicLong
    private[WatermarkStore] val bestEffortReads = new AtomicLong
    def snapshot: ReadHealth = ReadHealth(
      unstableRetries.get, staleFallbacks.get, bestEffortReads.get)
  }

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def segmentFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val f = fs(spark, p)
    if (!f.exists(p)) return Nil
    f.listStatus(p).toSeq
      .collect {
        case e if e.isFile &&
          (e.getPath.getName.endsWith(".json") ||
            e.getPath.getName.endsWith(".parquet")) &&
          !e.getPath.getName.startsWith("_") &&
          !e.getPath.getName.startsWith(".") => e.getPath.getName
      }
  }

  /** Max-merge the given segment files: JSON segments read driver-side,
    * legacy parquet segments through one Spark read. Throws the
    * underlying vanished-file error if a racing fold deleted one —
    * callers retry or skip.
    */
  private def readSegments(spark: SparkSession, path: String,
      files: Seq[String]): Map[String, Timestamp] = {
    val (jsonSegs, pqSegs) = files.partition(_.endsWith(".json"))
    val fromJson: Seq[(String, Long)] = jsonSegs.flatMap { s =>
      StoreMeta.readSegmentLines(spark, new Path(s"$path/$s")).map(parseLine)
    }
    val fromPq: Seq[(String, Long)] =
      if (pqSegs.isEmpty) Nil
      else spark.read
        .schema(Schemas.sourceServers)
        .parquet(pqSegs.map(f => s"$path/$f"): _*)
        .collect().toSeq
        .map(r => r.getString(0) -> StoreMeta.micros(r.getTimestamp(1)))
    (fromJson ++ fromPq)
      .groupBy(_._1)
      .map { case (s, xs) => s -> tsFromMicros(xs.map(_._2).max) }
  }

  private def parseLine(line: String): (String, Long) = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val jv = JsonMethods.parse(line)
    val server = (jv \ "server") match {
      case JString(s) => s
      case other => throw new IllegalStateException(
        s"watermark segment line missing server: $line")
    }
    val us = (jv \ "ts_us") match {
      case JInt(n) => n.longValue
      case JLong(n) => n
      case _ => throw new IllegalStateException(
        s"watermark segment line missing ts_us: $line")
    }
    server -> us
  }

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def read(spark: SparkSession, path: String): Map[String, Timestamp] =
    readHooked(spark, path)(_ => ())

  /** [[read]] returning the health of THIS call alongside the state —
    * the exact per-read attribution a runner stamps on its results.
    * The JVM-global [[ReadStats]] counters still accumulate (fleet-wide
    * observability), but a caller using this return value never counts
    * a concurrent sibling run's retries as its own.
    */
  def readWithHealth(
      spark: SparkSession, path: String): (Map[String, Timestamp], ReadHealth) =
    readHookedWithHealth(spark, path)(_ => ())

  /** [[read]] with a test seam: `afterListing(files)` runs between the
    * segment listing and the segment read — exactly the window a racing
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
      afterListing: Seq[String] => Unit): Map[String, Timestamp] =
    readHookedWithHealth(spark, path)(afterListing)._1

  private[graft] def readHookedWithHealth(spark: SparkSession, path: String)(
      afterListing: Seq[String] => Unit)
      : (Map[String, Timestamp], ReadHealth) = {
    // per-call health, accumulated locally and MIRRORED into the
    // JVM-global counters: the return value attributes exactly this
    // read's contention (no sibling-run bleed), the globals keep the
    // cumulative fleet view
    var retries = 0L
    var stale = 0L
    var bestEffort = 0L
    def health = ReadHealth(retries, stale, bestEffort)
    var attempt = 0
    var lastGood: Map[String, Timestamp] = null
    while (attempt < 16) {
      val files = segmentFiles(spark, path)
      if (files.isEmpty) return (Map.empty, health)
      afterListing(files)
      try {
        val m = readSegments(spark, path, files)
        if (segmentFiles(spark, path).toSet == files.toSet) return (m, health)
        lastGood = m
      } catch {
        case e: Exception if StoreLog.fileVanished(e) => ()
      }
      ReadStats.unstableRetries.incrementAndGet()
      retries += 1
      attempt += 1
      // folds are ms-scale; a brief exponential backoff lets the racing
      // fold finish instead of chasing its deletes listing-for-listing
      Thread.sleep(math.min(1L << math.min(attempt, 5), 20L))
    }
    if (lastGood != null) {
      // stale-but-valid CRDT state: every value was genuinely issued,
      // max-merge makes acting on it safe (the ETL rewind window +
      // idempotent dedup absorb the staleness) — but never silently
      ReadStats.staleFallbacks.incrementAndGet()
      stale += 1
      log.warn(s"watermark read on $path exhausted its listing-stability " +
        "budget (16 attempts); returning the last fully-read state " +
        "(stale-but-valid under max-merge). Constant folding on this " +
        "table is pathological - check advance fan-out.")
      (lastGood, health)
    } else {
      // no attempt ever completed a full read: merge the segments that
      // DO read on a fresh listing, skipping vanished files. Still sound
      // - every surviving value was issued; a skipped file's rows either
      // survive in the fold that replaced it (visible on this listing)
      // or resurface next read - and strictly better than failing the
      // run over reader-side contention on a healthy table.
      ReadStats.bestEffortReads.incrementAndGet()
      bestEffort += 1
      log.warn(s"watermark read on $path never completed a full segment " +
        "read under constant folding; best-effort max-merge of readable " +
        "segments (stale-but-valid under max-merge)")
      def pass(): Map[String, Timestamp] =
        segmentFiles(spark, path)
          .flatMap { f =>
            try readSegments(spark, path, Seq(f)).toSeq
            catch { case e: Exception if StoreLog.fileVanished(e) => Nil }
          }
          .groupBy(_._1)
          .map { case (s, xs) => s -> xs.map(_._2).reduce((a, b) =>
            if (a.compareTo(b) >= 0) a else b) }
      // TWO passes, max-merged: one pass can lose a server ENTIRELY when
      // its only readable segment vanishes between the listing and the
      // per-file read — a silent reset to the default watermark (sound
      // under idempotent dedup, but a full re-extract). Replacements are
      // published before deletes, so the second fresh listing carries the
      // folded segment for anything the first pass lost. A server seen by
      // only one pass is ESCALATED by name: that is the signature of a
      // vanish inside a single pass, not steady-state folding.
      val first = pass()
      val second = pass()
      val merged = (first.toSeq ++ second.toSeq)
        .groupBy(_._1)
        .map { case (s, xs) => s -> xs.map(_._2).reduce((a, b) =>
          if (a.compareTo(b) >= 0) a else b) }
      val lopsided = (first.keySet union second.keySet) diff
        (first.keySet intersect second.keySet)
      if (lopsided.nonEmpty)
        log.warn(s"watermark best-effort read on $path saw servers in only " +
          s"one of two passes: ${lopsided.toSeq.sorted.mkString(", ")} — " +
          "a third concurrent pass may still be missing a server (its " +
          "next advance or read self-heals under max-merge)")
      (merged, health)
    }
  }

  /** Full overwrite — initialization and explicit watermark RESETS.
    * Single-writer by contract (a reset is an operator action, not a
    * fleet-concurrent one).
    */
  def write(spark: SparkSession, path: String, wm: Map[String, Timestamp]): Unit = {
    val p = new Path(path)
    val f = fs(spark, p)
    if (f.exists(p)) f.delete(p, true)
    appendSegment(spark, path, wm)
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

  /** Write one max-merged segment driver-side through a per-writer
    * staging name and rename it into the table dir — unique names, so
    * concurrent advancers share nothing; rename makes a segment visible
    * atomically complete.
    */
  private def appendSegment(spark: SparkSession, path: String,
      wm: Map[String, Timestamp]): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val bytes = wm.toSeq.sortBy(_._1).map { case (s, t) =>
      JsonMethods.compact(JsonMethods.render(
        ("server" -> s) ~ ("ts_us" -> StoreMeta.micros(t))))
    }.mkString("\n").getBytes(StandardCharsets.UTF_8)
    val id = java.util.UUID.randomUUID().toString
    val f = fs(spark, new Path(path))
    val stagingDir = new Path(s"$path/_wm_staging")
    f.mkdirs(stagingDir)
    val tmp = new Path(stagingDir, id)
    val out = f.create(tmp, false)
    try out.write(bytes) finally out.close()
    require(f.rename(tmp, new Path(s"$path/delta-$id.json")),
      s"watermark segment publish failed: $tmp")
  }

  /** Fold exactly `captured` into one segment, then delete them. A
    * racer's uncaptured delta survives; a racing fold's already-deleted
    * file is tolerated (delete-if-present).
    */
  private def fold(spark: SparkSession, path: String,
      captured: Seq[String]): Unit = {
    val folded =
      try readSegments(spark, path, captured)
      catch {
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
