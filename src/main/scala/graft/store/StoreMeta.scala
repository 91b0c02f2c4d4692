package graft.store

import java.math.{BigDecimal => JBigDecimal}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas

/** Zone-map statistics of one consolidated-store data file: running max
  * LogID plus min/max of the four dedup-key columns (reference sql:33).
  *
  * `devMin`/`devMax` are null iff every `physical_device_name` in the
  * file is null — such a file holds no joinable dedup keys at all (SQL
  * equality never matches null), so it prunes unconditionally.
  */
final case class FileStats(
    file: String, // path relative to the store root
    logIdMax: Long,
    lastLsnMin: JBigDecimal,
    lastLsnMax: JBigDecimal,
    firstLsnMin: JBigDecimal,
    firstLsnMax: JBigDecimal,
    dbMin: String,
    dbMax: String,
    devMin: String,
    devMax: String)

/** Min/max of the dedup-key columns over one incoming (deduped) batch.
  * Mins/maxes ignore nulls, so `devMin == null` means every batch device
  * name is null.
  */
final case class KeyRanges(
    lastLsnMin: JBigDecimal,
    lastLsnMax: JBigDecimal,
    firstLsnMin: JBigDecimal,
    firstLsnMax: JBigDecimal,
    dbMin: String,
    dbMax: String,
    devMin: String,
    devMax: String)

/** Store-metadata sidecar: the Spark analog of the reference's unique
  * index on `(last_lsn, first_lsn, database_name, physical_device_name)`
  * (sql:33) actually being an *index*. Without it every idempotent
  * append pays a full scan of the consolidated table twice — once for
  * `max(LogID)` and once for the anti-join's key side — which is
  * O(table) per trickle batch and the one shape that cannot survive a
  * 100 TB store.
  *
  * The sidecar lives at `<root>/_graft_meta` (underscore-prefixed, so
  * table scans never see it) and is a pure CACHE, never a correctness
  * dependency: [[load]] reconciles it against the directory listing on
  * every append — entries for vanished files (compaction, manual
  * cleanup) are dropped, files missing from the sidecar (first run,
  * post-compaction, a crashed sidecar write) are scanned once and folded
  * back in. A deleted or corrupt sidecar degrades to one rebuild scan,
  * not to wrong answers.
  */
object StoreMeta {

  val dirName = "_graft_meta"

  private val metaSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("logid_max", LongType, nullable = false),
    StructField("last_lsn_min", Schemas.lsnType, nullable = true),
    StructField("last_lsn_max", Schemas.lsnType, nullable = true),
    StructField("first_lsn_min", Schemas.lsnType, nullable = true),
    StructField("first_lsn_max", Schemas.lsnType, nullable = true),
    StructField("db_min", StringType, nullable = true),
    StructField("db_max", StringType, nullable = true),
    StructField("dev_min", StringType, nullable = true),
    StructField("dev_max", StringType, nullable = true)))

  /** Result of [[load]]: reconciled per-file stats plus whether the
    * sidecar on disk is stale (caller should re-save even if the append
    * itself writes nothing).
    */
  final case class Loaded(files: Seq[FileStats], dirty: Boolean) {
    def maxLogId: Long = files.foldLeft(0L)((m, f) => math.max(m, f.logIdMax))
  }

  /** Data-file names (relative) of an UNPARTITIONED store directory.
    * Returns None when the layout has subdirectories (hive-partitioned
    * stores carry key columns in directory names, which per-file reads
    * cannot reconstruct) — callers fall back to the full-scan path.
    */
  def listDataFiles(spark: SparkSession, root: String): Option[Seq[String]] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Some(Nil)
    val entries = fs.listStatus(p)
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < entries.length) {
      val e = entries(i)
      val n = e.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (e.isDirectory) return None // partitioned / foreign layout
        if (n.endsWith(".parquet")) names += n
      }
      i += 1
    }
    Some(names.toSeq)
  }

  /** Read the sidecar and reconcile it with the actual file listing.
    * None = unsupported layout (fall back to full scans).
    */
  def load(spark: SparkSession, root: String): Option[Loaded] =
    listDataFiles(spark, root).map { actual =>
      val actualSet = actual.toSet
      val recorded =
        try {
          val mp = s"$root/$dirName"
          if (StorePath.exists(spark, mp))
            spark.read.schema(metaSchema).parquet(mp).collect().toSeq
              .map(fromRow)
          else Nil
        } catch { case _: Exception => Nil } // corrupt sidecar = absent
      val kept = recorded.filter(f => actualSet.contains(f.file))
      val unknown = actualSet -- kept.map(_.file)
      val healed =
        if (unknown.isEmpty) kept
        else kept ++ scanStats(spark, root, unknown.toSeq.sorted)
      Loaded(healed, dirty = kept.size != recorded.size || unknown.nonEmpty)
    }

  /** Compute [[FileStats]] for specific data files by scanning just
    * them — the heal path (and the stats pass over freshly written
    * batch files, which is O(batch)).
    */
  def scanStats(
      spark: SparkSession, root: String, files: Seq[String]): Seq[FileStats] = {
    if (files.isEmpty) return Nil
    spark.read.schema(Schemas.consolidated)
      .parquet(files.map(f => s"$root/$f"): _*)
      .groupBy(input_file_name().as("__file"))
      .agg(
        max("LogID").as("logid_max"),
        min("last_lsn").as("last_lsn_min"), max("last_lsn").as("last_lsn_max"),
        min("first_lsn").as("first_lsn_min"), max("first_lsn").as("first_lsn_max"),
        min("database_name").as("db_min"), max("database_name").as("db_max"),
        min("physical_device_name").as("dev_min"),
        max("physical_device_name").as("dev_max"))
      .collect().toSeq
      .map { r =>
        FileStats(
          new Path(r.getString(0)).getName,
          r.getLong(1),
          r.getDecimal(2), r.getDecimal(3), r.getDecimal(4), r.getDecimal(5),
          r.getString(6), r.getString(7),
          if (r.isNullAt(8)) null else r.getString(8),
          if (r.isNullAt(9)) null else r.getString(9))
      }
  }

  def save(spark: SparkSession, root: String, files: Seq[FileStats]): Unit = {
    val rows = new java.util.ArrayList[Row](files.size)
    files.foreach { f =>
      rows.add(Row(
        f.file, f.logIdMax,
        f.lastLsnMin, f.lastLsnMax, f.firstLsnMin, f.firstLsnMax,
        f.dbMin, f.dbMax, f.devMin, f.devMax))
    }
    spark.createDataFrame(rows, metaSchema)
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$root/$dirName")
  }

  /** Files whose key ranges can contain a key from the batch — the
    * anti-join's existing side. Unknown (null) lsn/db stats are
    * conservative (overlap); an all-null device range on either side
    * prunes, because null device names never participate in a key match.
    */
  def overlapping(files: Seq[FileStats], b: KeyRanges): Seq[FileStats] =
    files.filter { f =>
      decOverlap(f.lastLsnMin, f.lastLsnMax, b.lastLsnMin, b.lastLsnMax) &&
        decOverlap(f.firstLsnMin, f.firstLsnMax, b.firstLsnMin, b.firstLsnMax) &&
        strOverlap(f.dbMin, f.dbMax, b.dbMin, b.dbMax) &&
        devOverlap(f.devMin, f.devMax, b.devMin, b.devMax)
    }

  private def fromRow(r: Row): FileStats = FileStats(
    r.getString(0), r.getLong(1),
    r.getDecimal(2), r.getDecimal(3), r.getDecimal(4), r.getDecimal(5),
    if (r.isNullAt(6)) null else r.getString(6),
    if (r.isNullAt(7)) null else r.getString(7),
    if (r.isNullAt(8)) null else r.getString(8),
    if (r.isNullAt(9)) null else r.getString(9))

  private def decOverlap(
      fMin: JBigDecimal, fMax: JBigDecimal,
      bMin: JBigDecimal, bMax: JBigDecimal): Boolean =
    fMin == null || fMax == null || bMin == null || bMax == null ||
      !(fMax.compareTo(bMin) < 0 || fMin.compareTo(bMax) > 0)

  private def strOverlap(
      fMin: String, fMax: String, bMin: String, bMax: String): Boolean =
    fMin == null || fMax == null || bMin == null || bMax == null ||
      !(cmpUtf8(fMax, bMin) < 0 || cmpUtf8(fMin, bMax) > 0)

  private def devOverlap(
      fMin: String, fMax: String, bMin: String, bMax: String): Boolean =
    if (fMin == null || fMax == null) false // file has only null devices
    else if (bMin == null || bMax == null) false // batch has only null devices
    else !(cmpUtf8(fMax, bMin) < 0 || cmpUtf8(fMin, bMax) > 0)

  /** UTF-8 byte-order comparison — matches Spark's binary string
    * ordering (which parquet min/max stats and `min`/`max` aggregates
    * use); `String.compareTo` compares UTF-16 code units and disagrees
    * for supplementary characters, which would mis-prune.
    */
  private def cmpUtf8(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }
}
