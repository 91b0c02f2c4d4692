package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{SessionEvent, Sessionize, StreamingEtl}

/** Drives the streaming flavor end-to-end through readStream → memory
  * sink and checks it agrees with the batch implementation of the same
  * transform (streaming/batch unification is the contract).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("eventsStream decodes ts like the batch loader (no null-decode)") {
    // A streaming schema that disagrees with the file's physical type
    // null-decodes ts; the watermark then drops every row downstream with
    // no error anywhere. Pin the source itself: same schema as the batch
    // loader, zero null timestamps, same row count.
    val q = StreamingEtl.eventsStream(spark, TestSpark.sf)
      .writeStream.outputMode("append")
      .format("memory").queryName("evsrc_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("evsrc_out")
    val batch = Tables.events(spark, TestSpark.sf)
    assert(streamed.schema === batch.schema)
    assert(streamed.filter(col("ts").isNull).count() === 0L)
    assert(streamed.count() === batch.count())
  }

  test("streaming window agg equals the batch run") {
    val stream = StreamingEtl.eventWindowAgg(
      StreamingEtl.eventsStream(spark, TestSpark.sf))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_out")
      .select("window_start_epoch", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = StreamingEtl.eventWindowAgg(Tables.events(spark, TestSpark.sf))
      .as[(Long, String, Long, Double)].collect().toSet
    // append mode holds back windows the final watermark never passed —
    // streamed results must be a nonempty subset that agrees exactly
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"streaming-only rows: ${(streamed -- batch).take(3)}")
    val open = batch -- streamed
    // only the trailing window(s) may be withheld
    val maxClosed = streamed.map(_._1).max
    assert(open.forall(_._1 >= maxClosed), "only trailing windows withheld")
  }

  test("streaming sliding-window agg equals the batch run") {
    val stream = StreamingEtl.eventSlidingWindowAgg(
      StreamingEtl.eventsStream(spark, TestSpark.sf))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("slide_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("slide_out")
      .select("window_start_epoch", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = StreamingEtl
      .eventSlidingWindowAgg(Tables.events(spark, TestSpark.sf))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"streaming-only rows: ${(streamed -- batch).take(3)}")
    val open = batch -- streamed
    // sliding windows stay open for `length` past their start — the last
    // length/slide window generations may be withheld
    val maxClosed = streamed.map(_._1).max
    assert(open.forall(_._1 >= maxClosed), "only trailing windows withheld")
  }

  test("streaming dedup drops duplicate keys inside the watermark window") {
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).limit(60)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // write the batch twice → duplicate rows on the dedup key
    bh.write.mode("append").parquet(dir)
    bh.write.mode("append").parquet(dir)
    val incoming = spark.readStream
      .schema(bh.schema).parquet(dir)
    val q = StreamingEtl.dedupStream(incoming)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val n = spark.table("dedup_out").count()
    val expected = bh.dropDuplicates(graft.model.Schemas.dedupKey).count()
    assert(n == expected, s"streamed $n vs unique $expected")
  }

  test("streaming ETL sink: store contents equal the batch path, watermark advanced") {
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).limit(80).cache()
    val root = java.nio.file.Files.createTempDirectory("graft-setl").toString
    // source dir with the batch written twice (duplicate keys on arrival)
    bh.drop("LogID").write.mode("append").parquet(root + "/in")
    bh.drop("LogID").write.mode("append").parquet(root + "/in")
    val incoming = spark.readStream
      .schema(bh.drop("LogID").schema).parquet(root + "/in")
    val q = StreamingEtl.runStream(spark, incoming, "srvS",
      root + "/cons", root + "/wm", root + "/ckpt")
    q.processAllAvailable(); q.stop()

    val stored = spark.read.parquet(root + "/cons")
    val expected = bh.dropDuplicates(graft.model.Schemas.dedupKey)
    assert(stored.count() == expected.count(),
      s"stored ${stored.count()} vs expected ${expected.count()}")
    assert(stored.select("LogID").distinct().count() == stored.count())
    val wm = graft.store.WatermarkStore.read(spark, root + "/wm")
    val batchMax = expected.agg(max("backup_finish_date")).head().getTimestamp(0)
    assert(wm.get("srvS").contains(batchMax), s"watermark $wm vs $batchMax")
    bh.unpersist()
  }

  test("streaming ETL sink with maintenance folds per-trigger small files; " +
      "content equals the unmaintained stream") {
    import graft.maintenance.StoreMaintenance
    val bh = graft.etl.BackupHistoryDerivation
      .canonicalFrame(spark, TestSpark.sf).drop("LogID").limit(120).cache()
    val root = java.nio.file.Files.createTempDirectory("graft-smaint").toString
    // 6 date-ordered slices, one file each, mtimes ascending — with
    // maxFilesPerTrigger=1 the file source replays them oldest-first, so
    // event time advances monotonically and the stream's watermark never
    // drops a slice as late
    val sliced = bh.withColumn("_s", org.apache.spark.sql.functions.ntile(6)
      .over(org.apache.spark.sql.expressions.Window.orderBy(
        "backup_finish_date", "database_name", "last_lsn",
        "physical_device_name")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    (1 to 6).foreach { i =>
      val stage = java.nio.file.Files
        .createTempDirectory("graft-smaint-stage").toString
      sliced.filter(col("_s") === i).drop("_s")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(f"$root/in/s$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    def run(tag: String,
        policy: Option[StoreMaintenance.Policy]): (Long, Long) = {
      val incoming = spark.readStream.schema(bh.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      val q = StreamingEtl.runStream(spark, incoming, "srvM",
        s"$root/cons$tag", s"$root/wm$tag", s"$root/ckpt$tag",
        maintenance = policy)
      q.processAllAvailable(); q.stop()
      val files = new java.io.File(s"$root/cons$tag").listFiles()
        .count(_.getName.endsWith(".parquet"))
      (spark.read.parquet(s"$root/cons$tag").count(), files.toLong)
    }
    val (nCtl, filesCtl) = run("N", None)
    val (nM, filesM) = run("M", Some(StoreMaintenance.Policy(
      smallFileBytes = 64L << 20, maxSmallFiles = 3)))
    assert(filesCtl == 6L, s"control: one file per trigger, got $filesCtl")
    assert(filesM < filesCtl && filesM <= 3L,
      s"maintained stream must fold per-trigger files, got $filesM")
    val expected = bh.dropDuplicates(graft.model.Schemas.dedupKey).count()
    assert(nCtl == expected && nM == expected,
      s"content: ctl=$nCtl maintained=$nM expected=$expected")
    bh.unpersist()
  }

  test("stateful sessionization agrees with the batch window-function version") {
    val events = Tables.events(spark, TestSpark.sf)
      .select("user_id", "ts", "event_id")
      .filter(col("user_id") % 10 === 0)
    val batch = Sessionize.sessionSummaries(events, gapMinutes = 30)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet

    // one file → one micro-batch: the state machine assumes event-time
    // order across batches (multi-file arrival order is file-random)
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString + "/data"
    events.coalesce(1).write.parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
      .as[SessionEvent]
    val q = Sessionize.sessionizeStream(spark, stream, gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sess_out")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    // exact watermark semantics: the emitted set is EXACTLY the batch
    // sessions the final watermark sealed (end_us + gap_us < wm_ms*1000);
    // unsealed sessions stay in state regardless of later sessions
    assert(streamed.nonEmpty)
    def us(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val wmMs = events.agg(max("ts")).head().getTimestamp(0).getTime - 1800000L
    val expectedClosed = batch.filter { case (_, _, end, _) =>
      us(end) + 1800000000L < wmMs * 1000L }
    assert(streamed == expectedClosed,
      s"streaming-only: ${(streamed -- expectedClosed).take(3)}; " +
        s"missing: ${(expectedClosed -- streamed).take(3)}")
  }

  test("sessionize stream: cross-batch out-of-order events extend the " +
      "session start; watermark-late events drop") {
    val root = java.nio.file.Files.createTempDirectory("graft-sess-ooo").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def ev(id: Long, hhmm: String): (Long, java.sql.Timestamp, Long) =
      (1L, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), id)
    import spark.implicits._
    def writePhase(rows: (Long, java.sql.Timestamp, Long)*): Unit =
      rows.toSeq.toDF("user_id", "ts", "event_id")
        .coalesce(1).write.mode("append").parquet(in)
    def runPhase(): Unit = {
      val stream = spark.readStream
        .schema(Seq(ev(0L, "00:00")).toDF("user_id", "ts", "event_id").schema)
        .parquet(in).as[SessionEvent]
      val q = Sessionize.sessionizeStream(spark, stream, gapMinutes = 30)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
    }
    // phase 1: one event at 12:00 → state [12:00, 12:00], watermark 11:30
    writePhase(ev(1, "12:00"))
    runPhase()
    // phase 2, out of order: 11:00 is LATE (< watermark 11:30 — dropped,
    // session_window semantics); 11:50 is in-watermark and inside
    // [start−gap, last+gap] — merges, extending the start DOWNWARD
    writePhase(ev(2, "11:00"), ev(3, "11:50"))
    runPhase()
    // phase 3: a distant event closes the session via the watermark
    writePhase(ev(4, "14:00"))
    runPhase()
    val got = spark.read.parquet(out)
      .select("session_start", "session_end", "n_events")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    val t = (s: String) => java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    assert(got.contains((t("11:50"), t("12:00"), 2L)),
      s"expected start-extended merged session, got $got")
    assert(!got.exists(_._1 == t("11:00")), s"late event leaked: $got")
  }

  test("sessionize stream metrics: open-session gauges track state growth " +
      "and shrink on eviction") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sess-metrics").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def ev(id: Long, hhmm: String): (Long, java.sql.Timestamp, Long) =
      (1L, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), id)
    import spark.implicits._
    val metrics = new Sessionize.SessionizeMetrics(spark)
    def writePhase(rows: (Long, java.sql.Timestamp, Long)*): Unit =
      rows.toSeq.toDF("user_id", "ts", "event_id")
        .coalesce(1).write.mode("append").parquet(in)
    def runPhase(): Unit = {
      val stream = spark.readStream
        .schema(Seq(ev(0L, "00:00")).toDF("user_id", "ts", "event_id").schema)
        .parquet(in).as[SessionEvent]
      val q = Sessionize
        .sessionizeStream(spark, stream, gapMinutes = 30, Some(metrics))
        .map { summary =>
          // forced first-attempt failure in the STATEFUL stage's task
          // pipeline (the map is fused downstream of
          // flatMapGroupsWithState): the task retries and the census
          // must come out exact, not delta-inflated
          if (StreamingSpec.failOnce.get &&
              org.apache.spark.TaskContext.get.attemptNumber() == 0 &&
              StreamingSpec.failOnce.compareAndSet(true, false))
            throw new RuntimeException(
              "forced task failure (census retry-semantics test)")
          summary
        }
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
    }
    // phase 1: two disjoint sessions for ONE user (12:00, 13:00 — a
    // 30-minute gap apart); the watermark (12:30) seals neither
    writePhase(ev(1, "12:00"), ev(2, "13:00"))
    runPhase()
    assert(metrics.openSessions == 2L,
      s"two open sessions expected, census = ${metrics.openSessions}")
    assert(metrics.maxOpenPerKey.value == 2L,
      s"per-key high-water 2 expected, got ${metrics.maxOpenPerKey.value}")
    // phase 2: 16:00 opens a THIRD before the watermark moves (the
    // stalled-watermark growth shape the gauges exist to surface), then
    // the advanced watermark (15:30) seals the first two. A FORCED task
    // retry (downstream throw on attempt 0) must not disturb the census:
    // the stamps are idempotent per-key sets, not signed deltas.
    StreamingSpec.failOnce.set(true)
    writePhase(ev(3, "16:00"))
    runPhase()
    assert(!StreamingSpec.failOnce.get, "the forced failure must have fired")
    assert(metrics.openSessions == 1L,
      s"eviction must shrink the census to 1, got ${metrics.openSessions}")
    assert(metrics.maxOpenPerKey.value == 3L,
      s"high-water must capture the 3-open burst, got " +
        s"${metrics.maxOpenPerKey.value}")
    val got = spark.read.parquet(out)
      .select("session_start", "n_events").as[(java.sql.Timestamp, Long)]
      .collect().toSet
    val t = (s: String) => java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    assert(got == Set((t("12:00"), 1L), (t("13:00"), 1L)),
      s"sealed sessions wrong: $got")
  }

  test("sessionize stream: two simultaneously open sessions merge when a " +
      "cross-batch event bridges them") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sess-multi").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def ev(id: Long, hhmm: String): (Long, java.sql.Timestamp, Long) =
      (1L, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), id)
    import spark.implicits._
    def writePhase(rows: (Long, java.sql.Timestamp, Long)*): Unit =
      rows.toSeq.toDF("user_id", "ts", "event_id")
        .coalesce(1).write.mode("append").parquet(in)
    def runPhase(): Unit = {
      val stream = spark.readStream
        .schema(Seq(ev(0L, "00:00")).toDF("user_id", "ts", "event_id").schema)
        .parquet(in).as[SessionEvent]
      val q = Sessionize.sessionizeStream(spark, stream, gapMinutes = 30)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
    }
    def emitted(): Set[(java.sql.Timestamp, java.sql.Timestamp, Long)] =
      spark.read.parquet(out)
        .select("session_start", "session_end", "n_events")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect().toSet
    val t = (s: String) => java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    // phase 1: 12:00 and 12:50 are disjoint (gap 30) → TWO open sessions
    // per key; watermark 12:20. The single-open-session state would have
    // emitted [12:00] here — exact semantics must hold it open.
    writePhase(ev(1, "12:00"), ev(2, "12:50"))
    runPhase()
    assert(emitted().isEmpty,
      s"no session is watermark-sealed yet, got ${emitted()}")
    // phase 2: 12:25 (>= wm 12:20) touches BOTH open sessions
    // (12:00+30 >= 12:25 >= 12:50-30) → bridges them into one
    writePhase(ev(3, "12:25"))
    runPhase()
    assert(emitted().isEmpty, s"merged session still open: ${emitted()}")
    // phase 3: 14:00 advances the watermark to 13:30 → the bridged
    // session [12:00, 12:50] (closes 13:20) is sealed and emitted as ONE
    // 3-event session; [14:00] stays open
    writePhase(ev(4, "14:00"))
    runPhase()
    assert(emitted() == Set((t("12:00"), t("12:50"), 3L)),
      s"expected the bridged 3-event session alone, got ${emitted()}")
  }

  test("transformWithState exact dedup emits each key once across batches") {
    val events = Tables.events(spark, TestSpark.sf)
      .select("event_id", "user_id", "event_type")
      .filter(col("event_id") % 7 === 0)
    // plant duplicates: the same rows written twice -> two input files,
    // duplicates arriving both within and across micro-batches
    val dir = java.nio.file.Files
      .createTempDirectory("graft-exactdedup").toString + "/data"
    events.coalesce(1).write.parquet(dir)
    events.coalesce(1).write.mode("append").parquet(dir)

    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      // no AvailableNow: transformWithState keeps scheduling
      // processing-time batches, so an AvailableNow drain never settles
      // (observed: thousands of empty micro-batches). Default trigger +
      // poll-until-expected + stop matches how a continuous query runs.
      val q = streaming.ExactDedup
        .dedupStreamExact(stream, keyCols = Seq("event_id"), ttl = None)
        .writeStream.outputMode("append")
        .format("memory").queryName("exact_dedup_out")
        .start()
      val expected = events.select("event_id").as[Long].collect().sorted
      val deadline = System.currentTimeMillis + 180000
      while (System.currentTimeMillis < deadline &&
        spark.table("exact_dedup_out").count() < expected.length)
        Thread.sleep(500)
      // one extra settle round so a duplicate emission (the bug this
      // guards against) would land before we assert exact equality
      Thread.sleep(2000)
      q.stop()
      val streamed = spark.table("exact_dedup_out")
        .select("event_id").as[Long].collect().sorted
      assert(streamed.length === expected.length, "each key exactly once")
      assert(streamed.toSeq === expected.toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }

  test("exact-dedup state survives a query RESTART from its checkpoint") {
    val events = Tables.events(spark, TestSpark.sf)
      .filter(col("user_id").isNotNull)
      .select("event_id", "user_id", "event_type")
      .filter(col("event_id") % 11 === 0)
    val all = events.select("event_id").as[Long].collect().sorted
    val half = all(all.length / 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val (in, out, ckpt) = (s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def runUntil(expected: Long): Unit = {
      val stream = spark.readStream.schema(events.schema).parquet(in)
      val q = streaming.ExactDedup
        .dedupStreamExact(stream, keyCols = Seq("event_id"), ttl = None)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      // poll-then-stop, NOT processAllAvailable: transformWithState
      // keeps scheduling maintenance micro-batches, so a full drain
      // never settles (same contract as the in-suite exact-dedup test).
      // stop() may abort an in-flight batch and log recovered task
      // errors — harmless; the restart below recovers from the
      // checkpoint, which is the property under test.
      val deadline = System.currentTimeMillis + 180000
      def n(): Long =
        try spark.read.parquet(out).count() catch { case _: Exception => 0L }
      while (System.currentTimeMillis < deadline && n() < expected)
        Thread.sleep(500)
      Thread.sleep(2000) // settle: a duplicate emission would land here
      q.stop()
    }
    try {
      events.filter(col("event_id") <= half)
        .coalesce(1).write.parquet(in)
      runUntil(all.count(_ <= half).toLong)
      // phase 2: FULL set redelivered (overlap must stay deduped by the
      // RESTORED state) plus the genuinely new second half
      events.coalesce(1).write.mode("append").parquet(in)
      runUntil(all.length.toLong)
      val got = spark.read.parquet(out)
        .select("event_id").as[Long].collect().sorted
      assert(got.toSeq == all.toSeq,
        s"state restore failed: got ${got.length} rows for ${all.length} keys")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }

  test("stream-stream LEFT OUTER join state survives a RESTART from its checkpoint") {
    // the subtlest state in the repo: buffered unmatched left rows whose
    // null emission is SCHEDULED by watermark eviction. Across a
    // checkpoint restart, the restored state must (a) match a purchase
    // that arrives after the restart against a click buffered before it,
    // (b) null-emit clicks whose window expires after the restart, and
    // (c) never duplicate or drop either kind.
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssj-restart").toString
    val (inL, inR, out, ckpt) = (s"$tmp/l", s"$tmp/r", s"$tmp/out", s"$tmp/ckpt")
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def rows(path: String, rs: (Long, java.sql.Timestamp, Long)*): Unit =
      rs.toSeq.toDF("user_id", "ts", "event_id")
        .coalesce(1).write.mode("append").parquet(path)
    // phase 1 input: cI/pI match immediately; c1, c2, cA stay buffered
    // (global watermark 10:20 < every open window end)
    rows(inL, (6L, ts("10:00"), 600L), (1L, ts("10:00"), 100L),
      (2L, ts("10:05"), 200L), (4L, ts("10:30"), 400L))
    rows(inR, (6L, ts("10:10"), 610L), (5L, ts("10:30"), 510L))
    def schema = spark.read.parquet(inL).schema
    def runPhase(): Unit = {
      def side(p: String) = spark.readStream.schema(schema).parquet(p)
      val joined = streaming.StreamingEtl.intervalJoinStream(
        side(inL), side(inR), Seq("user_id"), "ts", "ts",
        maxGapSeconds = 3600, joinType = "left_outer")
      val q = joined
        .select(col("user_id"), col("l_event_id"), col("r_event_id"))
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runPhase()
    val phase1 = spark.read.parquet(out)
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(phase1 == Set((6L, 600L, Some(610L))),
      s"phase 1 must emit only the matched pair: $phase1")
    // phase 2: p1 matches the RESTORED c1; cZ/pZ push the global
    // watermark to 13:50, expiring c2 (end 11:05) and cA (end 11:30)
    rows(inL, (7L, ts("14:00"), 700L))
    rows(inR, (1L, ts("10:40"), 110L), (8L, ts("14:00"), 810L))
    runPhase()
    val got = spark.read.parquet(out)
      .as[(Long, Long, Option[Long])].collect().toSeq
    val expected = Set(
      (6L, 600L, Some(610L)), // phase-1 match
      (1L, 100L, Some(110L)), // cross-restart match from restored state
      (2L, 200L, None), // null emission scheduled by post-restart eviction
      (4L, 400L, None))
    assert(got.size == got.toSet.size, s"duplicated emissions: $got")
    assert(got.toSet == expected,
      s"extra=${got.toSet -- expected} missing=${expected -- got.toSet}")
    // cZ (u7, end 15:00) is beyond the final watermark: still withheld
    assert(!got.exists(_._1 == 7L))
  }

  test("session_window MergingSessions state survives a RESTART from its checkpoint") {
    // the adversarial case: a pre-restart event and a post-restart event
    // must fuse into ONE session iff the late event lands strictly
    // inside the restored session's window end (builtin semantics:
    // window = [first_ts, last_ts + gap); merge iff ts < end)
    val tmp = java.nio.file.Files.createTempDirectory("graft-sw-restart").toString
    val (in, out, ckpt) = (s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def rows(rs: (Long, java.sql.Timestamp)*): Unit =
      rs.toSeq.toDF("user_id", "ts")
        .coalesce(1).write.mode("append").parquet(in)
    // phase 1: u1 opens [10:00, 10:50) (two events, 20 min apart — one
    // merged session); u2 opens [10:00, 10:30); u9's 10:30 drives the
    // watermark to 10:20 — every open end is beyond it, so NOTHING emits
    rows((1L, ts("10:00")), (1L, ts("10:20")), (2L, ts("10:00")),
      (9L, ts("10:30")))
    def schema = spark.read.parquet(in).schema
    def runPhase(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .withWatermark("ts", "10 minutes")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"), col("n"))
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runPhase()
    def read() = spark.read.parquet(out)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(read().isEmpty, s"phase 1 must withhold every open session: ${read()}")
    // phase 2: u1's 10:45 is STRICTLY inside its restored end (10:50) →
    // merges, extending to [10:00, 11:15); u2's 10:35 is AT/after its
    // end (10:30) → a NEW session [10:35, 11:05); u9's 13:00 drives the
    // final watermark to 12:50, closing everything that ends before it
    rows((1L, ts("10:45")), (2L, ts("10:35")), (9L, ts("13:00")))
    runPhase()
    def us(hhmm: String) = ts(hhmm).getTime * 1000L
    val expected = Set(
      (1L, us("10:00"), us("11:15"), 3L), // fused ACROSS the restart
      (2L, us("10:00"), us("10:30"), 1L), // pre-restart session, intact
      (2L, us("10:35"), us("11:05"), 1L), // at-the-boundary: NOT fused
      (9L, us("10:30"), us("11:00"), 1L))
    val got = read()
    // u9's 13:00 session (end 13:30) is beyond the final watermark
    assert(got == expected,
      s"extra=${got -- expected} missing=${expected -- got}")
  }

  test("q79 live windows: emitted set is exactly the watermark-closed windows") {
    val streamed = graft.queries.StreamQueries
      .q79StreamingWindowsLive(spark, TestSpark.sf)
      .as[(Long, String, Long, Double)].collect().toSet
    val ev = Tables.events(spark, TestSpark.sf)
    // Spark's watermark is ms-floored max event time minus the delay
    val wmMs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000 - 600000
    val expected = StreamingEtl.eventWindowAgg(ev)
      .filter((col("window_start_epoch") + 21600) * 1000 <= wmMs)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === expected,
      s"stream-only: ${(streamed -- expected).take(3)}, " +
        s"missing: ${(expected -- streamed).take(3)}")
  }

  test("q80 live sessions: non-final sessions plus timed-out finals, exactly") {
    val streamed = graft.queries.StreamQueries
      .q80StreamingSessionsLive(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    val events = Tables.events(spark, TestSpark.sf)
      .select("user_id", "ts", "event_id")
    val wmMs = Tables.events(spark, TestSpark.sf)
      .agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000 - 1800000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("session_end").desc)
    val expected = Sessionize.sessionSummaries(events, gapMinutes = 30)
      .withColumn("rn", row_number().over(w))
      // closed in-batch by a later event, or timed out by the final watermark
      .filter(col("rn") > 1 ||
        expr("unix_micros(session_end) div 1000") + 1800000 < wmMs)
      .select(col("user_id"),
        unix_micros(col("session_start")), unix_micros(col("session_end")),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === expected,
      s"stream-only: ${(streamed -- expected).take(3)}, " +
        s"missing: ${(expected -- streamed).take(3)}")
  }

  test("stream-static broadcast join: streamed contamination matches batch") {
    import graft.pipeline.{Decontaminate, TextAnalysis}
    // static side: the q63 benchmark excerpts' distinct 8-grams
    val docsBatch = Tables.documents(spark, TestSpark.sf)
    val benchGrams = docsBatch
      .filter(col("doc_id") % 53 === 0)
      .select(explode(array_distinct(Decontaminate.ngrams(
        slice(TextAnalysis.tokens(col("text")), 3, 16), 8))).as("gram"))
      .distinct()

    def matches(docs: org.apache.spark.sql.DataFrame) = docs
      .select(col("doc_id"),
        explode(array_distinct(
          Decontaminate.ngrams(TextAnalysis.tokens(col("text")), 8)))
          .as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .select("doc_id", "gram")

    // stream the documents table through the same enrichment join — the
    // static side stays a broadcast, so the stream never shuffles
    val streamed = spark.readStream.schema(docsBatch.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(TestSpark.sf)
    val q = matches(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ss_join_out")
      .as[(Long, String)].collect().toSet
    val want = matches(docsBatch).as[(Long, String)].collect().toSet
    assert(got.nonEmpty && got === want,
      s"stream-only: ${(got -- want).take(3)}, missing: ${(want -- got).take(3)}")
  }

  test("bloom prefilter decontaminates an in-flight stream like the batch") {
    import graft.pipeline.{Decontaminate, TextAnalysis}
    import graft.functions.VectorFunctions
    val docsBatch = Tables.documents(spark, TestSpark.sf)
    val benchGrams = docsBatch
      .filter(col("doc_id") % 31 === 0)
      .select(explode(array_distinct(Decontaminate.ngrams(
        slice(TextAnalysis.tokens(col("text")), 3, 16), 6))).as("gram"))
      .distinct()
    val nBench = benchGrams.count()
    val bloom = benchGrams
      .agg(VectorFunctions.bloomAgg(col("gram"), nBench, 0.01))
      .head().getAs[Array[Byte]](0)

    // the serialized bloom is a plain literal predicate, so the SAME
    // ingest-time thinning works on a stream: candidate grams survive,
    // everything else is dropped in the scan stage with no state
    def grams(docs: org.apache.spark.sql.DataFrame) = docs
      .select(col("doc_id"),
        explode(array_distinct(
          Decontaminate.ngrams(TextAnalysis.tokens(col("text")), 6)))
          .as("gram"))
      .filter(VectorFunctions.bloomContains(lit(bloom), col("gram")))

    val streamed = spark.readStream.schema(docsBatch.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(TestSpark.sf)
    val q = grams(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("bloom_stream_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("bloom_stream_out")
      .as[(Long, String)].collect().toSet
    val want = grams(docsBatch).as[(Long, String)].collect().toSet
    assert(got.nonEmpty && got === want)
    // and the bloom admitted every true match (no false negatives)
    val exact = docsBatch
      .select(col("doc_id"),
        explode(array_distinct(
          Decontaminate.ngrams(TextAnalysis.tokens(col("text")), 6)))
          .as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .select("doc_id", "gram").as[(Long, String)].collect().toSet
    assert(exact.subsetOf(got))
  }

  test("stream-stream interval join equals the batch band join") {
    def typed(t: String) = StreamingEtl.eventsStream(spark, TestSpark.sf)
      .filter(col("event_type") === t)
      .select("user_id", "ts", "event_id")
    val q = StreamingEtl.intervalJoinStream(
        typed("click"), typed("purchase"),
        Seq("user_id"), "ts", "ts", maxGapSeconds = 3600)
      .writeStream.outputMode("append")
      .format("memory").queryName("ij_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ij_out")
      .select("user_id", "l_event_id", "r_event_id")
      .as[(Long, Long, Long)].collect().toSet

    def batchTyped(t: String) = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === t)
      .select("user_id", "ts", "event_id")
    val batch = graft.operators.BandJoin.bandJoin(
        batchTyped("click"), batchTyped("purchase"),
        Seq("user_id"), "ts", "ts", maxGapSeconds = 3600)
      .select("user_id", "l_event_id", "r_event_id")
      .as[(Long, Long, Long)].collect().toSet
    // inner stream-stream joins emit on match — no withheld rows, so the
    // two spellings must agree exactly
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      s"stream-only: ${(streamed -- batch).take(3)}, " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  test("window agg across time-ordered micro-batches equals the one-batch run") {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    import org.apache.spark.sql.expressions.Window
    // three time-CONTIGUOUS slices (ntile over the ts ordering): batch
    // N+1 never carries data older than batch N's watermark, so nothing
    // is dropped as late and the final emitted set must match a single
    // batch — THE invariant of cross-micro-batch watermark advancement
    val ev = Tables.events(spark, TestSpark.sf)
      .select("ts", "event_type", "value")
      .withColumn("slice", ntile(3).over(Window.orderBy("ts")))
    val dir = JFiles.createTempDirectory("graft-mb").toString
    val streamDir = s"$dir/stream"
    JFiles.createDirectories(Paths.get(streamDir))
    for (i <- 1 to 3) {
      val tmp = s"$dir/s$i"
      ev.filter(col("slice") === i).drop("slice")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      // b1 < b2 < b3: path order = time order for the file source
      JFiles.move(part, Paths.get(s"$streamDir/b$i.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val schema = spark.read.parquet(streamDir).schema
    def drain(multiBatch: Boolean): (Set[(Long, String, Long)], Int) = {
      val reader = spark.readStream.schema(schema)
      val src = (if (multiBatch) reader.option("maxFilesPerTrigger", "1")
                 else reader).parquet(streamDir)
      val name = s"mb_out_$multiBatch"
      val q = StreamingEtl.eventWindowAgg(src)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      (spark.table(name).select("window_start_epoch", "event_type", "n_events")
        .as[(Long, String, Long)].collect().toSet, batches)
    }
    val (multi, nBatches) = drain(multiBatch = true)
    val (single, _) = drain(multiBatch = false)
    assert(nBatches === 3, s"expected 3 data micro-batches, got $nBatches")
    assert(multi.nonEmpty && multi === single,
      s"multi-only: ${(multi -- single).take(3)}, " +
        s"single-only: ${(single -- multi).take(3)}")
  }

  test("left-outer interval join: inner pairs plus watermark-expired unmatched") {
    def typed(t: String) = StreamingEtl.eventsStream(spark, TestSpark.sf)
      .filter(col("event_type") === t)
      .select("user_id", "ts", "event_id")
    val q = StreamingEtl.intervalJoinStream(
        typed("click"), typed("purchase"),
        Seq("user_id"), "ts", "ts", maxGapSeconds = 3600,
        joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("loj_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("loj_out")
      .select("user_id", "l_event_id", "r_event_id")
      .as[(Long, Long, Option[Long])].collect()
    val matched = out.collect { case (u, l, Some(r)) => (u, l, r) }.toSet
    val nulls = out.collect { case (_, l, None) => l }.toSet

    def batchTyped(t: String) = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === t)
      .select("user_id", "ts", "event_id")
    val batch = graft.operators.BandJoin.bandJoin(
        batchTyped("click"), batchTyped("purchase"),
        Seq("user_id"), "ts", "ts", maxGapSeconds = 3600)
      .select("user_id", "l_event_id", "r_event_id")
      .as[(Long, Long, Long)].collect().toSet
    // the matched half IS the inner join
    assert(matched === batch)
    // null-extended rows: only truly unmatched clicks, each at most once,
    // and every unmatched click old enough to be past the final
    // watermark's eviction deadline is present
    val matchedIds = batch.map(_._2)
    assert(nulls.intersect(matchedIds).isEmpty, "null row for a matched click")
    assert(out.collect { case (_, l, None) => l }.length === nulls.size,
      "duplicate null emissions")
    val clicks = batchTyped("click")
      .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      .as[(Long, Long)].collect()
    // the query has ONE global watermark: the min over both inputs'
    // (max event time − delay), ms-floored — the lagging side governs
    val wmMs = Seq("click", "purchase").map(t =>
      batchTyped(t).agg(max(unix_millis(col("ts")))).as[Long].head()).min -
      600000L
    val mustEmit = clicks.collect {
      case (id, ts) if !matchedIds.contains(id) && ts + 3600000L < wmMs => id
    }.toSet
    assert(mustEmit.subsetOf(nulls),
      s"missing null rows for expired clicks: ${(mustEmit -- nulls).take(5)}")
    assert(nulls.nonEmpty)
  }

  test("open-session census accumulator: re-applied partials do not inflate") {
    val acc = new Sessionize.OpenCensusAccumulator
    val partial = new Sessionize.OpenCensusAccumulator
    partial.add(1L -> 2L) // key 1: two open sessions
    partial.add(2L -> 1L)
    partial.add(3L -> 0L) // key 3: tombstone (state removed)
    acc.merge(partial)
    acc.merge(partial) // a double-counted successful attempt (stage
                       // retry / speculation) re-applies the same stamps
    assert(acc.value == Map(1L -> 2L, 2L -> 1L),
      s"census must be idempotent under re-merge, got ${acc.value}")
    assert(acc.value.values.sum == 3L)
    // a later transition's stamp REPLACES, and a tombstone clears
    val next = new Sessionize.OpenCensusAccumulator
    next.add(1L -> 1L)
    next.add(2L -> 0L)
    acc.merge(next)
    assert(acc.value == Map(1L -> 1L), s"got ${acc.value}")
  }

  test("open-session census under speculative execution: duplicate " +
      "attempts of one partition merge in any interleaving, tombstones too") {
    // speculation runs TWO attempts of the same partition to completion;
    // both produce their own task-local partial with IDENTICAL stamps
    // (same state transitions), and the driver may merge them in any
    // order relative to other partitions' partials. The census must come
    // out the same as a single-attempt run for every interleaving —
    // including the tombstone (key -> 0) path, which must clear the key
    // no matter how many duplicate attempts replay it.
    def attemptP0() = { // partition 0's work: key 1 evicts to 0, key 2 opens 3
      val a = new Sessionize.OpenCensusAccumulator
      a.add(1L -> 0L)
      a.add(2L -> 3L)
      a
    }
    def attemptP1() = { // partition 1's work: key 7 opens 1
      val a = new Sessionize.OpenCensusAccumulator
      a.add(7L -> 1L)
      a
    }
    val expected = Map(2L -> 3L, 7L -> 1L)
    // all interleavings of {P0 attempt, P0 speculative duplicate, P1}
    val partials: Seq[() => Sessionize.OpenCensusAccumulator] =
      Seq(attemptP0 _, attemptP0 _, attemptP1 _)
    partials.permutations.foreach { order =>
      val driver = new Sessionize.OpenCensusAccumulator
      driver.add(1L -> 2L) // pre-batch state: key 1 had 2 open sessions
      order.foreach(mk => driver.merge(mk()))
      assert(driver.value == expected,
        s"interleaving broke the census: got ${driver.value}")
    }
  }
}

/** Cross-task signal for the forced-retry census test (same JVM in
  * local mode).
  */
object StreamingSpec {
  val failOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
}
