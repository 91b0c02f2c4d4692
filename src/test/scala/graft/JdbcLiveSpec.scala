package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** Live end-to-end JDBC coverage: the sandbox has no SQL Server (zero
  * egress), but Derby ships in Spark's jars, so the actual
  * `spark.read/write.format("jdbc")` path — connection open, batched
  * append, generated SELECT with pushdown — runs for real against an
  * in-JVM embedded database. Only the URL is swapped (Derby instead of
  * sqlserver); everything else (option maps, fetchsize/batchsize,
  * dbtable routing) is the production plumbing from [[JdbcBackupSource]].
  */
class JdbcLiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val srv = SourceServer("unreachable.example.com")

  test("writer append + reader load round-trip through embedded Derby") {
    import spark.implicits._
    val rows = Seq(
      (1L, "db1", "Full", 1000L),
      (2L, "db1", "Log", 1500L),
      (3L, "db2", "Full", 900L))
      .toDF("log_id", "database_name", "backup_type", "last_lsn")

    // Derby maps StringType to CLOB by default, which rejects pushed-down
    // string comparisons — pin VARCHAR like a production DDL would
    val wOpts = JdbcBackupSource
      .writerOptions(srv, "BACKUP_ROWS", batchSize = 500) +
      ("url" -> url) +
      ("createTableColumnTypes" ->
        "database_name VARCHAR(128), backup_type VARCHAR(32)")
    // overwrite creates the table; the follow-up append exercises the
    // batched set-based insert the reference's row-loop was replaced by
    rows.write.format("jdbc").options(wOpts).mode("overwrite").save()
    Seq((4L, "db2", "Log", 1200L))
      .toDF("log_id", "database_name", "backup_type", "last_lsn")
      .write.format("jdbc").options(wOpts).mode("append").save()

    val rOpts = JdbcBackupSource
      .readerOptions(srv, "BACKUP_ROWS") + ("url" -> url)
    val back = spark.read.format("jdbc").options(rOpts).load()
    assert(back.count() == 4)

    // predicate + projection push into the generated remote SELECT
    val pushed = back
      .filter($"database_name" === "db1")
      .select($"log_id".cast("long").as("log_id"))
      .as[Long].collect().sorted
    assert(pushed.toSeq == Seq(1L, 2L))
  }

  /** PushedFilters of every JDBC scan in a plan (untruncated, straight
    * from the scan node's metadata — the plan's simpleString clips the
    * list at 100 chars).
    */
  private def jdbcPushedFilters(
      df: org.apache.spark.sql.DataFrame): Seq[String] =
    // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
    // root whose children are resolved lazily, so collect() sees no scans
    df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.scan.description()
    }

  test("extract over JDBC sources pushes the watermark bound into the remote SELECT") {
    import org.apache.spark.sql.functions.col
    val mem = graft.etl.MsdbDerivation.sources(spark, TestSpark.sf)
    // ship the msdb fixture into Derby through the production writer
    // plumbing, pinning VARCHAR for every string column a filter or join
    // touches (Derby's default CLOB mapping rejects comparisons)
    def ship(df: org.apache.spark.sql.DataFrame, table: String,
        varchars: String): org.apache.spark.sql.DataFrame = {
      val w = JdbcBackupSource.writerOptions(srv, table, batchSize = 500) +
        ("url" -> url) ++
        (if (varchars.isEmpty) Map.empty[String, String]
         else Map("createTableColumnTypes" -> varchars))
      df.write.format("jdbc").options(w).mode("overwrite").save()
      spark.read.format("jdbc")
        .options(JdbcBackupSource.readerOptions(srv, table) + ("url" -> url))
        .load()
    }
    val src = graft.etl.MsdbSources(
      // encryptor_type/key_algorithm stay CLOB: they are nullable, and
      // Derby rejects Spark's setNull(CLOB) into a VARCHAR column — they
      // are only projected, never compared, so CLOB is harmless
      backupset = ship(mem.backupset, "MSDB_BACKUPSET",
        "database_name VARCHAR(128), type VARCHAR(8), " +
          "server_name VARCHAR(64), recovery_model VARCHAR(32)"),
      backupmediafamily = ship(mem.backupmediafamily, "MSDB_MEDIAFAMILY",
        "physical_device_name VARCHAR(256)"),
      backupfile = ship(mem.backupfile, "MSDB_BACKUPFILE",
        "logical_name VARCHAR(64), physical_drive VARCHAR(8), " +
          "physical_name VARCHAR(256), file_type VARCHAR(8)"),
      databases = ship(mem.databases, "MSDB_DATABASES", "name VARCHAR(128)"),
      replicaStates = ship(mem.replicaStates, "MSDB_REPLICAS", ""),
      availabilityGroups = ship(mem.availabilityGroups, "MSDB_AGS",
        "ag_name VARCHAR(64)"))

    val since = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    val out = graft.etl.ExtractTransform.extract(src, since, sortOutput = false)

    // the watermark bound must reach the remote scan: without it a
    // trickle extract reads every row the server ever logged (P3's
    // 100 TB shape). Both backupset scans (main join + the file-list
    // semi-join restriction) carry it.
    val filters = jdbcPushedFilters(out).filter(_.contains("backup_finish_date"))
    assert(filters.nonEmpty, s"no backupset scan pushed filters: $filters")
    assert(filters.forall(_.contains("GreaterThanOrEqual(backup_finish_date")),
      s"watermark bound not pushed: $filters")

    // results over JDBC sources ≡ the same extract over in-memory frames
    val expected = graft.etl.ExtractTransform
      .extract(mem, since, sortOutput = false)
    assert(out.count() == expected.count())
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty,
      "JDBC-sourced extract must match the in-memory extract row-for-row")

    // the restore surface's sargable LSN range (P5, DecimalType(25,0))
    // pushes as a remote decimal comparison too
    val lsnScan = src.backupset
      .filter(col("last_lsn") > new java.math.BigDecimal(5000000) &&
        col("last_lsn") <= new java.math.BigDecimal(900000000))
    val lsnFilters = jdbcPushedFilters(lsnScan)
    assert(lsnFilters.exists(f => f.contains("GreaterThan(last_lsn") &&
      f.contains("LessThanOrEqual(last_lsn")),
      s"decimal LSN range not pushed: $lsnFilters")
    assert(lsnScan.count() ==
      mem.backupset.filter(col("last_lsn") > new java.math.BigDecimal(5000000) &&
        col("last_lsn") <= new java.math.BigDecimal(900000000)).count())
  }

  test("runOnceJdbc auto-partitions the backupset read: N>1 slices for a " +
      "backlog window, single connection for the trickle") {
    import org.apache.spark.sql.functions.col
    val mem = graft.etl.MsdbDerivation.sources(spark, TestSpark.sf)
    def ship(df: org.apache.spark.sql.DataFrame, table: String,
        varchars: String): Unit = {
      val w = JdbcBackupSource.writerOptions(srv, table, batchSize = 500) +
        ("url" -> url) ++
        (if (varchars.isEmpty) Map.empty[String, String]
         else Map("createTableColumnTypes" -> varchars))
      df.write.format("jdbc").options(w).mode("overwrite").save()
    }
    ship(mem.backupset, "RUNJ_BACKUPSET",
      "database_name VARCHAR(128), type VARCHAR(8), " +
        "server_name VARCHAR(64), recovery_model VARCHAR(32)")
    ship(mem.backupmediafamily, "RUNJ_MEDIAFAMILY",
      "physical_device_name VARCHAR(256)")
    ship(mem.backupfile, "RUNJ_BACKUPFILE",
      "logical_name VARCHAR(64), physical_drive VARCHAR(8), " +
        "physical_name VARCHAR(256), file_type VARCHAR(8)")
    ship(mem.databases, "RUNJ_DATABASES", "name VARCHAR(128)")
    ship(mem.replicaStates, "RUNJ_REPLICAS", "")
    ship(mem.availabilityGroups, "RUNJ_AGS", "ag_name VARCHAR(64)")
    val rel = JdbcBackupSource.RelationNames(
      backupset = "RUNJ_BACKUPSET", backupmediafamily = "RUNJ_MEDIAFAMILY",
      backupfile = "RUNJ_BACKUPFILE", databases = "RUNJ_DATABASES",
      replicaStates = "RUNJ_REPLICAS", availabilityGroups = "RUNJ_AGS")
    val extra = Map("url" -> url)

    val dataMax = mem.backupset
      .agg(org.apache.spark.sql.functions.max("backup_finish_date"))
      .head().getTimestamp(0)
    val fixedNow = new java.sql.Timestamp(dataMax.getTime + 86400000L)

    // the production policy on the first-ETL window (watermark = 1900):
    // wide → maxSlices range slices, physically N>1 remote SELECTs
    val sinceWide = graft.etl.ExtractTransform
      .rewind(graft.etl.EtlRunner.DefaultWatermark)
    val pWide = JdbcBackupSource.autoPartitioning(sinceWide, fixedNow, 4)
    assert(pWide.exists(_.numPartitions == 4), s"wide window must slice: $pWide")
    val wideSrc = JdbcBackupSource.sources(spark, srv, pWide, rel, extra)
    assert(wideSrc.backupset.rdd.getNumPartitions == 4,
      "backlog-window backupset read must be 4 physical JDBC slices")

    // end-to-end: the fleet entry point, no caller-computed bounds
    val tmpDir = java.nio.file.Files
      .createTempDirectory("runoncejdbc").toString
    val (cons, wms) = (s"$tmpDir/cons", s"$tmpDir/wm")
    val r1 = graft.etl.EtlRunner.runOnceJdbc(spark,
      Map("srv1" -> srv), cons, wms, maxSlices = 4, now = () => fixedNow,
      relations = rel, extraOptions = extra)
    assert(r1.head.error.isEmpty, r1.head.toString)
    val expected = graft.etl.ExtractTransform
      .extract(mem, sinceWide, sortOutput = false)
      .dropDuplicates(graft.store.ConsolidatedStore.dedupKey).count()
    assert(r1.head.appended == expected,
      s"auto-partitioned fleet run appended ${r1.head.appended}, " +
        s"in-memory extract says $expected")

    // steady-state: the advanced watermark makes the next window a
    // trickle → the policy returns None (one connection), and the run
    // is an idempotent no-op
    val wm1 = r1.head.newWatermark.get
    val now2 = new java.sql.Timestamp(wm1.getTime + 3600000L)
    assert(JdbcBackupSource.autoPartitioning(
      graft.etl.ExtractTransform.rewind(wm1), now2, 4).isEmpty,
      "trickle window must stay a single-connection read")
    val r2 = graft.etl.EtlRunner.runOnceJdbc(spark,
      Map("srv1" -> srv), cons, wms, maxSlices = 4, now = () => now2,
      relations = rel, extraOptions = extra)
    assert(r2.head.error.isEmpty && r2.head.appended == 0, r2.head.toString)
  }

  test("watermark-range partitioned backupset read: N range slices, identical result") {
    import org.apache.spark.sql.functions.col
    val mem = graft.etl.MsdbDerivation.sources(spark, TestSpark.sf)
    val wOpts = JdbcBackupSource
      .writerOptions(srv, "MSDB_BACKUPSET_P", batchSize = 500) +
      ("url" -> url) +
      ("createTableColumnTypes" ->
        ("database_name VARCHAR(128), type VARCHAR(8), " +
          "server_name VARCHAR(64), recovery_model VARCHAR(32)"))
    mem.backupset.write.format("jdbc").options(wOpts).mode("overwrite").save()

    val Array(lo, hi) = mem.backupset
      .agg(org.apache.spark.sql.functions.min("backup_finish_date"),
        org.apache.spark.sql.functions.max("backup_finish_date"))
      .head() match { case r => Array(r.getTimestamp(0), r.getTimestamp(1)) }
    // bounds tighter than the data on purpose: the clamping contract
    // (rows below lower → first slice, at/above upper → last) is part of
    // what "identical result" asserts
    val p = JdbcBackupSource.ExtractPartitioning(
      lower = new java.sql.Timestamp(lo.getTime + 86400000L),
      upper = new java.sql.Timestamp(hi.getTime - 86400000L),
      numPartitions = 4)
    val opts = JdbcBackupSource
      .partitionedReaderOptions(srv, "MSDB_BACKUPSET_P", p) + ("url" -> url)
    val part = spark.read.format("jdbc").options(opts).load()

    // physically N>1 input slices, each a range-bounded remote SELECT
    assert(part.rdd.getNumPartitions == 4,
      s"expected 4 JDBC slices, got ${part.rdd.getNumPartitions}")
    val single = spark.read.format("jdbc")
      .options(JdbcBackupSource.readerOptions(srv, "MSDB_BACKUPSET_P") +
        ("url" -> url)).load()
    assert(part.count() == single.count(),
      "partitioned union must equal the single-connection read")
    assert(part.exceptAll(single).isEmpty && single.exceptAll(part).isEmpty,
      "row-for-row identical across partitioned and single reads")

    // every slice holds rows (bounds inside the data range → real range
    // slicing, not one hot slice + empties)
    val perSlice = part
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .groupBy("pid").count().collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(perSlice.keySet == Set(0, 1, 2, 3), s"slices seen: $perSlice")
    assert(perSlice.values.forall(_ > 0L), s"empty slice: $perSlice")

    // the watermark pushdown gate holds per-slice too
    val filtered = part.filter(col("backup_finish_date") >=
      java.sql.Timestamp.valueOf("1995-06-01 00:00:00"))
    val pf = jdbcPushedFilters(filtered)
    assert(pf.exists(_.contains("GreaterThanOrEqual(backup_finish_date")),
      s"watermark bound not pushed on partitioned read: $pf")
  }
}
