package graft.store

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Persistence for the consolidated backup-history table
  * (`Utility.SQLBackupHistoryConsolidated`, reference sql:7-39), on
  * immutable parquet instead of a mutable heap.
  *
  * The reference's write-side contract is its unique index
  * `(last_lsn, first_lsn, database_name, physical_device_name)` with
  * `ignore_dup_key = on` (sql:33): duplicate rows re-extracted by the
  * overlapping watermark window are silently dropped, making the
  * at-least-once extract idempotent. Here that is an explicit
  * dedup + left-anti join before every append ([[mergeNew]]).
  *
  * NULL semantics: `physical_device_name` is nullable (sql:12), and a
  * SQL Server unique index treats NULLs as EQUAL — a re-extracted row
  * with a null device and matching other keys is dropped by
  * `ignore_dup_key`. The anti-join therefore uses null-safe equality
  * (`<=>`) on every key column; plain equality would let such a row
  * append twice across overlapping watermark windows.
  *
  * Scale notes: the anti-join only needs the 4 key columns of the
  * existing table (column-pruned scan), and the incoming batch is tiny
  * next to the table — Catalyst/AQE turns it into a broadcast of the
  * batch keys, so the big side never shuffles. LogID assignment windows
  * over the *batch*, not the table.
  */
object ConsolidatedStore {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  val dedupKey: Seq[String] = Schemas.dedupKey

  /** Null-safe equi-join condition on the dedup key between two aliased
    * sides — `<=>` keeps the join hashable (EqualNullSafe is a
    * supported equi-join key) while matching the unique index's
    * NULLs-are-equal comparison.
    */
  private def keyCondition(left: String, right: String): Column =
    dedupKey.map(k => col(s"$left.$k") <=> col(s"$right.$k")).reduce(_ && _)

  /** Batch-internal dedup + drop rows already present (sql:33 semantics,
    * including NULLs-are-equal: `dropDuplicates` already groups nulls
    * together, and the anti-join matches via `<=>`).
    */
  def mergeNew(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val existingKeys = existing.select(dedupKey.map(col): _*).alias("ex")
    incoming
      .dropDuplicates(dedupKey)
      .alias("in")
      .join(existingKeys, keyCondition("in", "ex"), "left_anti")
  }

  /** Identity-column emulation (reference sql:9; SURVEY §7 hard-part 3):
    * continue LogIDs from the existing max, numbering the deduped batch
    * in a deterministic order. Only stability/uniqueness matter — the one
    * consumer is the striped-log canonicalization (W2, sql:1049), which
    * needs a stable min per (first_lsn, last_lsn).
    *
    * Scale note: a `row_number() OVER (ORDER BY ...)` would funnel the
    * whole batch through one reducer — fine for steady incremental loads,
    * a bottleneck on a backfill where the batch is the entire history.
    * Instead: range-repartition + sort by the id order (parallel), then
    * per-partition offsets via `zipWithIndex` (one extra count job, no
    * single-partition exchange). Ids are contiguous from `base + 1`.
    */
  def withLogIds(existing: DataFrame, freshBatch: DataFrame,
      batchRows: Long = -1L): DataFrame = {
    val maxRow = existing.agg(max("LogID")).head()
    val base = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    withLogIdsFrom(base, freshBatch, batchRows)
  }

  /** [[withLogIds]] with a known id base — the sidecar-metadata append
    * path reads the base from [[StoreMeta]] instead of aggregating over
    * the whole table.
    */
  /** Batch-size regime boundary: batches at/above this row count are
    * backfill/bootstrap-shaped (a first ETL, an outage catch-up) and fan
    * out into parallel writers; below it the append is a steady trickle
    * whose whole batch belongs in one compact file.
    */
  private[graft] val BootstrapSplitRows = 65536L

  /** Rows per file for fanned-out bootstrap batches — small enough that
    * a 171k-row first-ETL writes 6-way parallel, large enough that row
    * groups stay scan-efficient until compaction folds them.
    */
  private[graft] val BootstrapFileRows = 32768L

  def withLogIdsFrom(base: Long, freshBatch: DataFrame,
      batchRows: Long = -1L): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = freshBatch.sparkSession
    val orderCols = Seq(
      col("backup_finish_date"), col("database_name"), col("last_lsn"),
      col("physical_device_name"))
    // partition count follows the batch, not the session default: each
    // range partition becomes one output file, and a steady incremental
    // batch shredded into 32 near-empty files costs twice — 32 parquet
    // writers' worth of column buffers now (driver-sized batches do not
    // amortize them) and a shard-per-append store for every later scan.
    // Two regimes:
    //   - trickle (< BootstrapSplitRows): one compact file;
    //   - bootstrap/backfill-sized: fan out at ~BootstrapFileRows rows
    //     per file, capped at the session parallelism. The old single
    //     ~250k-rows/file policy funneled a 171k-row first-ETL batch
    //     through ONE parquet writer — 2.3 s of q64's 8.3 s serial floor
    //     was that single task; writers parallelize near-linearly and
    //     compaction re-binds the file count later.
    val n =
      if (batchRows < 0) spark.sessionState.conf.numShufflePartitions
      else if (batchRows < BootstrapSplitRows) 1
      else math.max(1L, math.min(
        spark.sessionState.conf.numShufflePartitions.toLong,
        (batchRows + BootstrapFileRows - 1) / BootstrapFileRows)).toInt
    val sorted = freshBatch
      .repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = StructType(
      StructField("LogID", LongType, nullable = false) +: sorted.schema.fields)
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((base + i + 1) +: r.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), Schemas.consolidated)
    if (!StorePath.exists(spark, path)) return empty
    // a fully-deleted store still holds its metadata dirs (_graft_meta,
    // _graft_log) — zero data files means the empty frame, not a parquet
    // schema-inference failure. Short-circuit probe: O(1), not a listing.
    if (!StoreMeta.hasAnyDataFile(spark, path)) empty
    else spark.read.parquet(path)
  }

  /** Idempotent append: dedup against the table, assign LogIDs, append.
    * Returns the number of rows actually written.
    *
    * @param partitionBy optional physical layout columns — the Spark
    *   analog of the reference's covering indexes (sql:35-39): partition
    *   by `database_name` keeps every restore query's scan pruned to one
    *   directory, which is the access path all of them share. Date-based
    *   partitioning additionally serves the retention job. Must be the
    *   same on every append to a given path. Hive-partitioned layouts
    *   use the same sidecar-pruned O(batch + overlap) path as flat ones
    *   (the sidecar records root-relative paths and reads them back with
    *   `basePath`); only foreign/non-hive layouts fall back to the full
    *   scan.
    * @param sortWithin columns to sort by inside each written file
    *   (default `(database_name, last_lsn)` — the second half of the
    *   covering-index analogy): parquet row-group min/max stats on the
    *   sort keys let every LSN range predicate (P5, the hottest restore
    *   filter) skip row groups, not just directories. A local sort only —
    *   no extra shuffle on the write path.
    * @param foldEvery sidecar segment-count threshold past which the
    *   append folds the segment log into one rewrite (see
    *   [[StoreMeta.SegmentFoldThreshold]]).
    */
  def append(spark: SparkSession, path: String, incoming: DataFrame,
      partitionBy: Seq[String] = Nil,
      sortWithin: Seq[String] = Seq("database_name", "last_lsn"),
      foldEvery: Int = StoreMeta.SegmentFoldThreshold): Long = {
    StoreMeta.load(spark, path) match {
      case Some(loaded) =>
        appendPruned(spark, path, incoming, partitionBy, sortWithin,
          awaitCommittedCoverage(spark, path, loaded), foldEvery)
      case None => appendFullScan(spark, path, incoming, partitionBy, sortWithin)
    }
  }

  /** A batch's store-independent append preamble, computed once and
    * reusable across appends of the SAME batch to any store state: the
    * key-deduped rows (checkpointed — the dedup shuffle never re-runs)
    * and their per-database envelopes. The duplicate-delivery shape:
    * one extract delivered under several server names, or a batch
    * retried after a failed load, pays this once.
    */
  private[graft] final case class PreparedBatch(
      deduped: DataFrame, envelopes: Seq[KeyRanges])

  /** [[append]] on a prepared batch — skips the per-call dedup shuffle
    * and envelope collect. The caller owns `deduped`'s cache/checkpoint
    * lifecycle ([[graft.util.Checkpoints.release]] when done).
    */
  private[graft] def appendPrepared(spark: SparkSession, path: String,
      prep: PreparedBatch,
      partitionBy: Seq[String] = Nil,
      sortWithin: Seq[String] = Seq("database_name", "last_lsn"),
      foldEvery: Int = StoreMeta.SegmentFoldThreshold): Long = {
    StoreMeta.load(spark, path) match {
      case Some(loaded) =>
        appendPrunedPrepared(spark, path, prep.deduped, prep.envelopes,
          partitionBy, sortWithin,
          awaitCommittedCoverage(spark, path, loaded), foldEvery)
      case None =>
        appendFullScanPrepared(spark, path, prep.deduped, partitionBy,
          sortWithin)
    }
  }

  /** Wait out a racing CoW replacer's archive→promote→commit window
    * before an append trusts its loaded stats. [[StoreMeta.load]] heals
    * everything the DIRECTORY holds, so a committed-live file absent
    * from the healed stats is physically missing from the root — a
    * replacer has archived it and not yet committed (its swap is
    * mid-flight). Proceeding on such stats is silent corruption, not a
    * crash: the dedup anti-join sees no overlapping files and the LogID
    * base folds over an empty set, so duplicate keys and colliding ids
    * would be committed with no error. The window is driver-side
    * metadata renames (milliseconds); a state that persists past the
    * wait is a dead replacer — fail loudly and point at repair.
    */
  private[store] def awaitCommittedCoverage(spark: SparkSession, path: String,
      loaded0: StoreMeta.Loaded): StoreMeta.Loaded = {
    var loaded = loaded0
    var polls = 0
    while ({
      val live = StoreLog.committedLiveSet(spark, path)
      val have = loaded.files.map(_.file).toSet
      live.exists(l => !l.subsetOf(have))
    }) {
      polls += 1
      if (polls > 150)
        throw new StoreLog.ConcurrentCommitException(
          s"append on $path: committed-live files are missing from the " +
            "directory and no replacing commit landed — a copy-on-write " +
            "writer died mid-swap; run StoreRepair.repair")
      Thread.sleep(20L)
      loaded = StoreMeta.load(spark, path).getOrElse(loaded)
    }
    loaded
  }

  /** Per-`database_name` key envelopes of a deduped batch — driver-small
    * (one row per database present in the batch). Package-visible for
    * the pruning specs.
    */
  private[graft] def batchEnvelopes(deduped: DataFrame): Seq[KeyRanges] =
    deduped.groupBy("database_name")
      .agg(
        min("last_lsn"), max("last_lsn"),
        min("first_lsn"), max("first_lsn"),
        min("physical_device_name"), max("physical_device_name"),
        sum(when(col("physical_device_name").isNull, 1L).otherwise(0L)),
        sort_array(collect_set(when(col("physical_device_name").isNotNull,
          xxhash64(col("physical_device_name"))))),
        count(lit(1)))
      .collect().toSeq
      .map { r =>
        val db = r.getString(0)
        val hashes = r.getSeq[Long](8)
        KeyRanges(
          r.getDecimal(1), r.getDecimal(2), r.getDecimal(3), r.getDecimal(4),
          db, db,
          if (r.isNullAt(5)) null else r.getString(5),
          if (r.isNullAt(6)) null else r.getString(6),
          r.getLong(7),
          devHashes =
            if (hashes.size > StoreMeta.DevHashSetCap) null else hashes,
          rows = r.getLong(9))
      }

  /** Zone-map/file-stat aggregates observed DURING a fused staged write
    * (one `CollectMetrics` node, exactly-once per action) — the names
    * match [[observedStats]], which turns the metric row into the
    * [[FileStats]] the stats rescan used to produce.
    */
  private def appendObservation(laidOut: DataFrame)
      : (org.apache.spark.sql.Observation, DataFrame) = {
    val dev = col("physical_device_name")
    val obs = org.apache.spark.sql.Observation()
    val observed = laidOut.observe(obs,
      count(lit(1)).as("n"),
      max("LogID").as("logid_max"),
      min("last_lsn").as("last_lsn_min"),
      max("last_lsn").as("last_lsn_max"),
      min("first_lsn").as("first_lsn_min"),
      max("first_lsn").as("first_lsn_max"),
      min("database_name").as("db_min"),
      max("database_name").as("db_max"),
      min(dev).as("dev_min"), max(dev).as("dev_max"),
      sum(when(dev.isNull, 1L).otherwise(0L)).as("dev_nulls"),
      sort_array(collect_set(when(dev.isNotNull, xxhash64(dev))))
        .as("dev_hashes"),
      min(unix_micros(col("backup_start_date"))).as("start_min"),
      max(unix_micros(col("backup_start_date"))).as("start_max"))
    (obs, observed)
  }

  /** [[FileStats]] of a single-file fused write from its observed
    * metrics — field-for-field what [[StoreMeta.scanStats]] reads back
    * from the parquet footers (same aggregates, same DevHashSetCap
    * overflow-to-null).
    */
  private def observedStats(
      m: Map[String, Any], file: String): FileStats = {
    val hashes = m("dev_hashes").asInstanceOf[Seq[Long]]
    FileStats(
      file,
      m("logid_max").asInstanceOf[Long],
      m("last_lsn_min").asInstanceOf[java.math.BigDecimal],
      m("last_lsn_max").asInstanceOf[java.math.BigDecimal],
      m("first_lsn_min").asInstanceOf[java.math.BigDecimal],
      m("first_lsn_max").asInstanceOf[java.math.BigDecimal],
      m("db_min").asInstanceOf[String],
      m("db_max").asInstanceOf[String],
      m("dev_min").asInstanceOf[String],
      m("dev_max").asInstanceOf[String],
      m("dev_nulls").asInstanceOf[Long],
      devHashes =
        if (hashes.size > StoreMeta.DevHashSetCap) null else hashes,
      startMinUs = m("start_min").asInstanceOf[Long],
      startMaxUs = m("start_max").asInstanceOf[Long])
  }

  /** Zone-map-pruned read: open ONLY the files whose sidecar envelope
    * can hold a row satisfying `bounds`, then apply the exact row-level
    * residual — semantically identical to `read(...).filter(residual)`,
    * physically the reference's covering-index access path (sql:35-39):
    * a restore-chain lookup for one database on a 100 TB store opens the
    * handful of files whose (database_name, last_lsn) envelope
    * intersects the predicate instead of scanning every file's footer.
    * Falls back to a plain filtered scan for foreign layouts or stores
    * without a sidecar. The sidecar stays a pure cache: [[StoreMeta.load]]
    * reconciles it against the directory first, so a stale or missing
    * sidecar degrades to one heal scan, never to wrong answers.
    *
    * Schema note: a BOUNDED read projects the full consolidated schema
    * (null-filling optional columns a writer omitted), while the
    * unconstrained fallback returns [[read]]'s inferred schema — the
    * row SET is identical either way.
    */
  def readWhere(spark: SparkSession, path: String,
      bounds: StoreMeta.ReadBounds): DataFrame = {
    val residual = StoreMeta.residual(bounds)
    if (bounds.unconstrained) return read(spark, path)
    StoreMeta.load(spark, path) match {
      case None => read(spark, path).filter(residual)
      case Some(loaded) =>
        // reads never write: a dirty sidecar heals on the next append
        val files = loaded.files.filter(f => StoreMeta.mayContain(f, bounds))
        if (files.isEmpty)
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            Schemas.consolidated)
        else spark.read
          .option("basePath", path).schema(Schemas.consolidated)
          .parquet(files.map(f => s"$path/${f.file}"): _*)
          .filter(residual)
    }
  }

  /** Device point lookup ("which backups landed on this device" — the
    * fleet-ops question behind the reference's media-recovery paths):
    * reads ONLY files whose sidecar device-hash set contains the probe
    * (exact xxhash64 membership; files without a recorded set fall back
    * to their min/max range, pre-migration rows stay conservative).
    * A null probe matches files holding null-device rows, consistent
    * with the NULLs-are-equal key semantics.
    */
  def readForDevice(spark: SparkSession, path: String,
      device: String): DataFrame = {
    val probe = col("physical_device_name") <=>
      (if (device == null) lit(null).cast("string") else lit(device))
    StoreMeta.load(spark, path) match {
      case None => read(spark, path).filter(probe)
      case Some(loaded) =>
        val h =
          if (device == null) 0L
          else spark.range(1).select(xxhash64(lit(device))).head().getLong(0)
        val files = loaded.files.filter { f =>
          if (device == null) f.devNullCount != 0
          else if (f.devHashes != null) f.devHashes.contains(h)
          else f.devMin == null || f.devMax == null ||
            (StoreMeta.cmpUtf8(f.devMin, device) <= 0 &&
              StoreMeta.cmpUtf8(device, f.devMax) <= 0) ||
            f.devNullCount < 0 // pre-migration row: consult
        }
        if (files.isEmpty)
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            Schemas.consolidated)
        else spark.read
          .option("basePath", path).schema(Schemas.consolidated)
          .parquet(files.map(f => s"$path/${f.file}"): _*)
          .filter(probe)
    }
  }

  /** O(batch + overlap) append: the anti-join's existing side is pruned
    * by [[StoreMeta]]'s per-file zone maps to files whose dedup-key
    * ranges can intersect the batch's per-database envelopes, and the
    * LogID base comes from the sidecar instead of a whole-table
    * aggregate. A trickle append onto a huge store touches only the few
    * files sharing its (database, LSN) windows — the reference's unique
    * index (sql:33) behaving like an index. Sidecar maintenance is one
    * O(batch) delta segment per clean append; a full fold only on drift
    * or past the segment threshold.
    *
    * Appends to one store are assumed serialized (as in [[graft.etl.EtlRunner]],
    * which serializes its load phase) — same contract the read-modify-
    * append full-scan path already had.
    */
  private[graft] def appendPruned(
      spark: SparkSession, path: String, incoming: DataFrame,
      partitionBy: Seq[String], sortWithin: Seq[String],
      loaded: StoreMeta.Loaded, foldEvery: Int): Long = {
    val deduped = incoming.dropDuplicates(dedupKey).cache()
    try
      appendPrunedPrepared(spark, path, deduped, batchEnvelopes(deduped),
        partitionBy, sortWithin, loaded, foldEvery)
    finally deduped.unpersist()
  }

  /** [[appendPruned]] on a batch whose dedup + envelopes were computed
    * by the caller — the duplicate-delivery fast path: both are
    * store-independent, so a batch delivered under several server names
    * (or retried) pays the dedup shuffle and the envelope collect ONCE
    * and every append reuses them. The caller owns `deduped`'s
    * cache/checkpoint lifecycle.
    */
  private[graft] def appendPrunedPrepared(
      spark: SparkSession, path: String, deduped: DataFrame,
      envelopes: Seq[KeyRanges],
      partitionBy: Seq[String], sortWithin: Seq[String],
      loaded: StoreMeta.Loaded, foldEvery: Int): Long = {
    def foldIfDirty(): Unit = {
      if (loaded.dirty) StoreMeta.save(spark, path, loaded.files)
    }
    {
      if (envelopes.isEmpty) { foldIfDirty(); return 0L }
      val overlapping = loaded.files
        .filter(f => envelopes.exists(b => StoreMeta.overlaps(f, b)))
      def antiJoined(): DataFrame = {
        val existingKeys = spark.read
          .option("basePath", path)
          .schema(Schemas.consolidated)
          .parquet(overlapping.map(f => s"$path/${f.file}"): _*)
          .select(dedupKey.map(col): _*)
          .alias("ex")
        deduped.alias("in")
          .join(existingKeys, keyCondition("in", "ex"), "left_anti")
      }
      // fused single-action trickle append (r16): the deduped batch row
      // count (an UPPER bound on the post-anti-join fresh rows — dedup
      // and anti-join only shrink) rides the envelope collect, and when
      // it sits under the bootstrap boundary the write regime is
      // decided without knowing n exactly — both bounds land in the
      // one-compact-file regime. The fresh count and the new file's
      // zone-map stats are then observed DURING the staged write
      // (CollectMetrics — exactly-once per action), so a trickle append
      // runs ONE batch-touching Spark action (the write) instead of
      // three (count, write, stats rescan): measured ~2x fewer jobs per
      // trickle cycle on the q155/q64 lifecycles. Hive layouts keep the
      // scan path (a task writes one file per partition VALUE there, so
      // per-file stats need the rescan), and bootstrap-sized batches
      // keep the exact count (the fan-out file count ⌈n/32768⌉ is
      // spec-pinned on n, not on the upper bound).
      val est =
        if (envelopes.exists(_.rows < 0L)) -1L else envelopes.map(_.rows).sum
      if (partitionBy.isEmpty && est >= 0L && est < BootstrapSplitRows) {
        val fresh = if (overlapping.isEmpty) deduped else antiJoined()
        val assigned = withLogIdsFrom(loaded.maxLogId, fresh, batchRows = est)
        val laidOut =
          if (sortWithin.isEmpty) assigned
          else assigned.sortWithinPartitions(sortWithin.map(col): _*)
        val (obs, observed) = appendObservation(laidOut)
        val before = loaded.files.map(_.file).toSet
        val (stageDir, mine) = Staging.stage(spark, path, observed, Nil)
        val m = obs.get
        val n = m("n").asInstanceOf[Long]
        if (n == 0L) {
          // nothing fresh: drop the zero-row staged file wholesale —
          // observable state identical to the counted path's early exit
          Staging.abandon(spark, stageDir)
          foldIfDirty()
          return 0L
        }
        val newFiles = Staging.promote(spark, path, stageDir, mine)
        StoreLog.commitAppend(spark, path, newFiles,
          before.toSeq.sorted ++ newFiles)
        try {
          val newStats =
            if (newFiles.size == 1) Seq(observedStats(m, newFiles.head))
            else StoreMeta.scanStats(spark, path, newFiles)
          if (loaded.dirty || loaded.segments + 1 > foldEvery)
            StoreMeta.save(spark, path, loaded.files ++ newStats)
          else StoreMeta.saveDelta(spark, path, newStats)
        } catch {
          case scala.util.control.NonFatal(e) =>
            log.warn(s"post-commit sidecar update failed on $path " +
              "(cache only — next load() heals): " + e)
        }
        return n
      }
      // no overlapping files → every deduped row is fresh; reuse the
      // already-cached batch instead of stacking a second cache on it
      val fresh =
        if (overlapping.isEmpty) deduped
        else antiJoined().cache()
      try {
        val n = fresh.count()
        if (n > 0) {
          val before = loaded.files.map(_.file).toSet
          val assigned = withLogIdsFrom(loaded.maxLogId, fresh, batchRows = n)
          val laidOut =
            if (sortWithin.isEmpty) assigned
            else assigned.sortWithinPartitions(sortWithin.map(col): _*)
          // staged publish for EXACT ownership of the new file names — a
          // before/after listing diff would absorb a concurrent CoW
          // maintenance commit's just-promoted files into THIS commit's
          // adds, and the maintenance writer's abort path would then
          // delete files this commit lists as live (phantom adds)
          val newFiles = Staging.publish(spark, path, laidOut, partitionBy)
          // one O(batch) commit record enables snapshot reads (StoreLog);
          // a pre-log store baselines itself on this first commit. The
          // commit lands BEFORE the sidecar write: the sidecar is a pure
          // cache, so a failure past this point degrades to a warning +
          // one heal scan on the next load(), never a thrown append
          // whose data already landed
          StoreLog.commitAppend(spark, path, newFiles,
            before.toSeq.sorted ++ newFiles)
          try {
            val newStats = StoreMeta.scanStats(spark, path, newFiles)
            if (loaded.dirty || loaded.segments + 1 > foldEvery)
              StoreMeta.save(spark, path, loaded.files ++ newStats)
            else StoreMeta.saveDelta(spark, path, newStats)
          } catch {
            case scala.util.control.NonFatal(e) =>
              log.warn(s"post-commit sidecar update failed on $path " +
                "(cache only — next load() heals): " + e)
          }
        } else foldIfDirty()
        n
      } finally if (fresh ne deduped) fresh.unpersist()
    }
  }

  /** Multi-writer idempotent append under OPTIMISTIC CONCURRENCY — the
    * entry point for two simultaneous appenders sharing one store (the
    * serialized-writer [[append]] stays the ETL runner's path).
    *
    * Protocol, per attempt:
    *
    *   1. read the COMMITTED state: live files from the log replay at
    *      the observed version v0 (a racing writer's uncommitted files
    *      are invisible — dedup and LogID assignment never consume
    *      phantoms), stats from the sidecar;
    *   2. anti-join the batch against the envelope-overlapping live
    *      files, assign LogIDs from the committed max;
    *   3. write the batch files into a `_graft_staging/<uuid>` dir
    *      (invisible to scans), move them into the root — exact
    *      ownership of the new file names, no listing diffs;
    *   4. claim version v0+1 via [[StoreLog.tryCommit]]'s atomic
    *      create-no-overwrite. Win → one sidecar delta segment, done.
    *      Loss → delete own files and REDO from step 1 against the new
    *      state (appends are commutative but not blind: the redo re-runs
    *      the dedup and re-bases the LogIDs, which is what keeps "no
    *      lost rows + unique LogIDs" under interleaving; O(batch) per
    *      retry).
    *
    * Readers that list the directory can observe a writer's files during
    * its step-3→4 window — the same window the serialized path has; a
    * crash there leaves uncommitted orphans that [[StoreRepair.repair]]
    * reconciles. Bootstrap (very first commit) of a store that already
    * holds UNLOGGED data is single-writer: take one serialized [[append]]
    * first; concurrent bootstrap of an EMPTY store is safe (the v1 claim
    * is the arbiter).
    */
  def appendConcurrent(spark: SparkSession, path: String, incoming: DataFrame,
      sortWithin: Seq[String] = Seq("database_name", "last_lsn"),
      maxAttempts: Int = 8,
      partitionBy: Seq[String] = Nil): Long =
    appendConcurrentHooked(spark, path, incoming, sortWithin, maxAttempts,
      partitionBy)((_, _) => ())

  /** [[appendConcurrent]] with a test seam: `beforeCommit(attempt, v0)`
    * runs after the batch files are published but before the version
    * claim — exactly the window a racing writer can win in. The
    * concurrency spec injects a competing commit there to drive the
    * redo path deterministically.
    */
  private[graft] def appendConcurrentHooked(
      spark: SparkSession, path: String, incoming: DataFrame,
      sortWithin: Seq[String], maxAttempts: Int,
      partitionBy: Seq[String] = Nil,
      onAttempt: Int => Unit = _ => ())(
      beforeCommit: (Int, Int) => Unit): Long = {
    val deduped = incoming.dropDuplicates(dedupKey).cache()
    try appendConcurrentLoop(spark, path,
      PreparedBatch(deduped, batchEnvelopes(deduped)),
      sortWithin, maxAttempts, partitionBy, onAttempt)(beforeCommit)
    finally deduped.unpersist()
  }

  /** [[appendConcurrent]] on a prepared batch: the dedup shuffle and
    * envelope collect were already paid ONCE for this batch (see
    * [[PreparedBatch]]) and are store-independent, so every optimistic
    * attempt here reuses them — a lost version race re-runs only the
    * anti-join against the winner's overlap set, never the preamble.
    * The fleet-concurrent ETL load path hands the extract-fused batch
    * straight through. Caller owns `deduped`'s cache/checkpoint
    * lifecycle.
    */
  private[graft] def appendConcurrentPrepared(
      spark: SparkSession, path: String, prep: PreparedBatch,
      sortWithin: Seq[String] = Seq("database_name", "last_lsn"),
      maxAttempts: Int = 8,
      partitionBy: Seq[String] = Nil,
      onAttempt: Int => Unit = _ => ()): Long =
    appendConcurrentLoop(spark, path, prep, sortWithin, maxAttempts,
      partitionBy, onAttempt)((_, _) => ())

  /** The optimistic claim loop shared by [[appendConcurrentHooked]] and
    * [[appendConcurrentPrepared]] — everything from version read to
    * commit, on a batch whose preamble is already paid.
    */
  private def appendConcurrentLoop(
      spark: SparkSession, path: String, prep: PreparedBatch,
      sortWithin: Seq[String], maxAttempts: Int,
      partitionBy: Seq[String],
      onAttempt: Int => Unit)(
      beforeCommit: (Int, Int) => Unit): Long = {
    val deduped = prep.deduped
    val envelopes = prep.envelopes
    if (envelopes.isEmpty) return 0L
    locally {
      var attempt = 0
      while (true) {
        attempt += 1
        if (attempt > maxAttempts)
          throw new StoreLog.ConcurrentCommitException(
            s"append on $path lost $maxAttempts version races; reduce " +
              "writer contention or raise maxAttempts")
        // attempt accounting fires at the LOOP TOP: attempts that abort
        // before publish (fileVanished redo, empty-fresh early return)
        // never reach the beforeCommit seam, so counting there
        // undercounts redone work under CoW interference
        onAttempt(attempt)
        var v0 = StoreLog.currentVersion(spark, path)
        if (v0 == 0) {
          // files present at version 0 are EITHER a truly unlogged store
          // (single-writer bootstrap required — committing would orphan
          // the pre-existing data) OR a concurrent bootstrapper inside
          // its publish→claim window. Distinguish by waiting: a live
          // racer claims v1 within its one small commit write; a store
          // whose files persist unclaimed is genuinely unlogged.
          var polls = 0
          while (v0 == 0 && polls < 100 &&
              StoreMeta.listDataFiles(spark, path).getOrElse(Nil).nonEmpty) {
            Thread.sleep(20L)
            v0 = StoreLog.currentVersion(spark, path)
            polls += 1
          }
          require(v0 > 0 ||
            StoreMeta.listDataFiles(spark, path).getOrElse(Nil).isEmpty,
            s"appendConcurrent bootstrap on unlogged non-empty store $path: " +
              "take one serialized append first to baseline the log " +
              "(or run StoreRepair.repair if a bootstrapping writer died)")
        }
        // checkpoint-accelerated replay: O(CheckpointEvery) commit reads
        val live = StoreLog.liveSetAtVersion(spark, path, v0).toSet
        try {
          val loadedOpt = StoreMeta.load(spark, path)
          val liveStats = loadedOpt
            .map(_.files.filter(f => live(f.file))).getOrElse(Nil)
          // a committed-live file missing from the healed stats is
          // missing from the DIRECTORY: a racing replacer's swap is
          // mid-flight (archived, not yet committed). Reading around it
          // would silently skip dedup against those files and fold the
          // LogID base over an incomplete set — redo once the racer's
          // commit lands (same signal as fileVanished, caught earlier)
          if (liveStats.size < live.size) {
            Thread.sleep(100L)
            throw new java.io.FileNotFoundException(
              "committed-live files not on disk — replacer swap in flight")
          }
          val overlapping = liveStats
            .filter(f => envelopes.exists(b => StoreMeta.overlaps(f, b)))
          val base = liveStats.foldLeft(0L)((m, f) => math.max(m, f.logIdMax))
          def antiJoined(): DataFrame = deduped.alias("in")
            .join(spark.read
              .option("basePath", path).schema(Schemas.consolidated)
              .parquet(overlapping.map(f => s"$path/${f.file}"): _*)
              .select(dedupKey.map(col): _*).alias("ex"),
              keyCondition("in", "ex"), "left_anti")
          // fused single-action attempt for flat trickle-regime batches,
          // mirroring the serialized path: the fresh count and the new
          // file's stats are observed during the staged write, so a
          // clean attempt runs ONE batch action instead of three (count,
          // publish, stats rescan) — and a lost-claim redo re-pays one
          // action, not three
          val est =
            if (envelopes.exists(_.rows < 0L)) -1L
            else envelopes.map(_.rows).sum
          if (partitionBy.isEmpty && est >= 0L && est < BootstrapSplitRows) {
            val fresh = if (overlapping.isEmpty) deduped else antiJoined()
            val assigned = withLogIdsFrom(base, fresh, batchRows = est)
            val laidOut =
              if (sortWithin.isEmpty) assigned
              else assigned.sortWithinPartitions(sortWithin.map(col): _*)
            val (obs, observed) = appendObservation(laidOut)
            val (stageDir, mine) = Staging.stage(spark, path, observed, Nil)
            val m = obs.get
            val n = m("n").asInstanceOf[Long]
            if (n == 0L) { Staging.abandon(spark, stageDir); return 0L }
            Staging.promote(spark, path, stageDir, mine)
            beforeCommit(attempt, v0)
            if (StoreLog.tryCommit(spark, path, v0 + 1, "append",
                adds = mine, removes = Nil)) {
              try {
                val newStats =
                  if (mine.size == 1) Seq(observedStats(m, mine.head))
                  else StoreMeta.scanStats(spark, path, mine)
                val segs = loadedOpt.map(_.segments).getOrElse(0)
                if (segs + 1 > StoreMeta.SegmentFoldThreshold)
                  StoreMeta.save(spark, path, liveStats ++ newStats)
                else StoreMeta.saveDelta(spark, path, newStats)
              } catch {
                case scala.util.control.NonFatal(e) =>
                  log.warn(s"post-commit sidecar update failed on $path " +
                    "(cache only — next load() heals): " + e)
              }
              return n
            }
            Staging.retract(spark, path, mine)
          } else {
          val fresh =
            if (overlapping.isEmpty) deduped
            else antiJoined().cache()
          try {
            val n = fresh.count()
            if (n == 0L) return 0L
            val assigned = withLogIdsFrom(base, fresh, batchRows = n)
            val laidOut =
              if (sortWithin.isEmpty) assigned
              else assigned.sortWithinPartitions(sortWithin.map(col): _*)
            // hive layouts stage with the same partition dirs; the staged
            // relative paths (key=value/part-*.parquet) move home verbatim
            val mine = Staging.publish(spark, path, laidOut, partitionBy)
            beforeCommit(attempt, v0)
            if (StoreLog.tryCommit(spark, path, v0 + 1, "append",
                adds = mine, removes = Nil)) {
              // sidecar maintenance mirrors the serialized path: one
              // O(batch) delta segment normally, a full fold past the
              // segment threshold (unbounded concurrent-only trickle
              // appends must not regrow the O(store) segment read this
              // design removed). The commit already landed, and the
              // sidecar is a pure cache — so NOTHING here may fail the
              // append: a racing compaction archiving our just-committed
              // files mid-scan, or any sidecar write error, degrades to
              // a warning and one heal rescan on the next load().
              try {
                val newStats = StoreMeta.scanStats(spark, path, mine)
                val segs = loadedOpt.map(_.segments).getOrElse(0)
                if (segs + 1 > StoreMeta.SegmentFoldThreshold)
                  StoreMeta.save(spark, path, liveStats ++ newStats)
                else StoreMeta.saveDelta(spark, path, newStats)
              } catch {
                case scala.util.control.NonFatal(e) =>
                  log.warn(s"post-commit sidecar update failed on $path " +
                    "(cache only — next load() heals): " + e)
              }
              return n
            }
            // lost the claim: un-publish our files and redo against the
            // winner's state (they may hold our keys or our LogID range)
            Staging.retract(spark, path, mine)
          } finally if (fresh ne deduped) fresh.unpersist()
          }
        } catch {
          // a racing CoW maintenance commit (merge/delete/compaction)
          // archived a file between our log replay and the read — the
          // state this attempt was based on no longer exists physically.
          // Not a failure: redo against the racer's committed state,
          // exactly as a lost version claim does.
          case e: Exception if StoreLog.fileVanished(e) => ()
        }
      }
      0L // unreachable
    }
  }

  /** The pre-sidecar shape — whole-table key scan + whole-table max —
    * kept for foreign (non-hive) layouts where per-file zone maps cannot
    * be reconstructed.
    */
  private[graft] def appendFullScan(
      spark: SparkSession, path: String, incoming: DataFrame,
      partitionBy: Seq[String], sortWithin: Seq[String]): Long =
    appendFullScanImpl(spark, path, incoming.dropDuplicates(dedupKey),
      partitionBy, sortWithin)

  /** [[appendFullScan]] on an already key-deduped batch (see
    * [[prepare]]) — the bootstrap append of a duplicate-delivery run.
    */
  private[graft] def appendFullScanPrepared(
      spark: SparkSession, path: String, deduped: DataFrame,
      partitionBy: Seq[String], sortWithin: Seq[String]): Long =
    appendFullScanImpl(spark, path, deduped, partitionBy, sortWithin)

  private def appendFullScanImpl(
      spark: SparkSession, path: String, deduped: DataFrame,
      partitionBy: Seq[String], sortWithin: Seq[String]): Long = {
    val existing = read(spark, path)
    val existingKeys = existing.select(dedupKey.map(col): _*).alias("ex")
    val fresh = deduped.alias("in")
      .join(existingKeys, keyCondition("in", "ex"), "left_anti")
      .cache()
    try {
      val n = fresh.count()
      if (n > 0) {
        val assigned = withLogIds(existing, fresh, batchRows = n)
        val laidOut =
          if (sortWithin.isEmpty) assigned
          else assigned.sortWithinPartitions(sortWithin.map(col): _*)
        val writer = laidOut.write.mode(SaveMode.Append)
        (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
          .parquet(path)
      }
      n
    } finally fresh.unpersist()
  }
}
