package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.concurrent.atomic.AtomicBoolean

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.store.WatermarkStore

/** The watermark control table's max-merge CRDT under the load it was
  * rewritten for: interleaved cross-thread advancers, folds racing
  * advances and each other (FoldThreshold lowered to 2), and a reader
  * caught between a fold's listing and its deletes. The invariant at
  * every point: `read` ≡ per-server max of the advances issued so far —
  * never a lost update, never a regression, never a value nobody issued.
  */
class WatermarkConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-wm").toString + "/t"

  private def ts(ms: Long) = new Timestamp(ms)

  test("interleaved advancers with racing folds never lose a per-server max") {
    val path = tmp()
    val servers = (0 until 6).map(i => s"srv$i")
    val nThreads = 3
    val perThread = 15
    val base = 1700000000000L

    // every issue is recorded BEFORE its advance, so any value a reader
    // can observe is already in this map; merge keeps the running max
    val issuedMax = new ConcurrentHashMap[String, java.lang.Long]()
    def record(s: String, t: Long): Unit =
      issuedMax.merge(s, java.lang.Long.valueOf(t),
        (a, b) => java.lang.Long.valueOf(math.max(a, b)))

    val writersDone = new AtomicBoolean(false)
    val violations = new ConcurrentLinkedQueue[String]()

    // polling reader: observations must be (a) never above the recorded
    // issue max (no conjured values), (b) monotone per server (max-merge
    // can only grow), (c) never throw — a racing fold's deletes must be
    // absorbed by the vanished-file retry
    val reader = Future {
      var last = Map.empty[String, Long]
      var polls = 0
      while (!writersDone.get()) {
        val m = WatermarkStore.read(spark, path)
          .map { case (s, t) => s -> t.getTime }
        m.foreach { case (s, t) =>
          val cap = Option(issuedMax.get(s)).map(_.longValue)
          if (!cap.exists(_ >= t))
            violations.add(s"observed $s=$t above issued max $cap")
          last.get(s).foreach { prev =>
            if (t < prev) violations.add(s"$s regressed $prev -> $t")
          }
        }
        last = last ++ m
        polls += 1
      }
      polls
    }

    val writers = (0 until nThreads).map { w =>
      Future {
        val rnd = new scala.util.Random(42 + w)
        (0 until perThread).foreach { _ =>
          // overlapping ownership: every thread advances every server
          val s = servers(rnd.nextInt(servers.size))
          val t = base + rnd.nextInt(100000) * 1000L
          record(s, t)
          WatermarkStore.advance(spark, path, s, ts(t), foldThreshold = 2)
        }
      }
    }
    writers.foreach(Await.result(_, 5.minutes))
    writersDone.set(true)
    val polls = Await.result(reader, 5.minutes)
    assert(polls > 0, "the reader must actually have raced the writers")
    assert(violations.isEmpty, violations.asScala.mkString("; "))

    // quiescent read ≡ per-server max of ALL issued advances: no lost
    // update across any interleaving of advances and folds
    val finalRead = WatermarkStore.read(spark, path)
      .map { case (s, t) => s -> t.getTime }
    val expected = issuedMax.asScala.map { case (s, t) => s -> t.longValue }.toMap
    assert(finalRead == expected,
      s"lost/spurious watermarks: got $finalRead expected $expected")

    // the fold path ran and kept the segment log bounded: threshold 2
    // with 45 advances must not leave anywhere near 45 delta files
    val segs = new java.io.File(path).listFiles.count(f =>
      f.isFile && (f.getName.endsWith(".json") || f.getName.endsWith(".parquet")) &&
        !f.getName.startsWith("_"))
    assert(segs <= 16,
      s"fold must bound the log under concurrent advances, got $segs segments")
  }

  test("reader caught between a fold's publish and deletes retries onto the fresh listing") {
    val path = tmp()
    WatermarkStore.advance(spark, path, "a", ts(1000L))
    WatermarkStore.advance(spark, path, "b", ts(2000L))
    WatermarkStore.advance(spark, path, "a", ts(3000L))
    var listings = 0
    val m = WatermarkStore.readHooked(spark, path) { files =>
      listings += 1
      if (listings == 1) {
        // simulate the racing fold exactly: its max-merged replacement
        // segments land first, then the captured originals are deleted —
        // the reader's first attempt holds a listing of only-deleted files
        WatermarkStore.advance(spark, path, "a", ts(3000L))
        WatermarkStore.advance(spark, path, "b", ts(2000L))
        files.foreach(f => Files.delete(Paths.get(path, f)))
      }
    }
    assert(listings >= 2, "the vanished-file retry must have re-listed")
    assert(m == Map("a" -> ts(3000L), "b" -> ts(2000L)),
      s"retry must land on the folded state, got $m")
  }

  test("a fold-storm that keeps the listing unstable is COUNTED and falls " +
    "back to the last fully-read state instead of failing") {
    val path = tmp()
    WatermarkStore.advance(spark, path, "a", ts(1000L))
    val before = WatermarkStore.ReadStats.snapshot
    var n = 0
    // every listing is followed by a fresh advance, so the post-read
    // stability check never passes — but every read itself succeeds:
    // the budget must exhaust into the stale-but-valid fallback
    val m = WatermarkStore.readHooked(spark, path) { _ =>
      n += 1
      WatermarkStore.advance(spark, path, "a", ts(1000L + n * 1000L))
    }
    val d = WatermarkStore.ReadStats.snapshot - before
    assert(d.unstableRetries == 16, s"every attempt counted: $d")
    assert(d.staleFallbacks == 1 && d.bestEffortReads == 0, s"$d")
    // stale-but-valid: some issued value for a, never a conjured one
    val got = m("a").getTime
    assert(got >= 1000L && got <= 1000L + n * 1000L && got % 1000 == 0,
      s"fallback must return an issued value, got $got")
  }

  test("constant fold deletes that fail every full read end in a counted " +
    "best-effort merge of the readable segments") {
    val path = tmp()
    WatermarkStore.advance(spark, path, "a", ts(5000L))
    val before = WatermarkStore.ReadStats.snapshot
    val m = WatermarkStore.readHooked(spark, path) { files =>
      // the racing fold's shape every attempt: replacement published
      // first, then every file this reader just listed is deleted — so
      // every readSegments sees a vanished file and no attempt completes
      WatermarkStore.advance(spark, path, "a", ts(5000L))
      files.foreach(f => Files.delete(Paths.get(path, f)))
    }
    val d = WatermarkStore.ReadStats.snapshot - before
    assert(d.bestEffortReads == 1 && d.staleFallbacks == 0,
      s"expected exactly one best-effort read: $d")
    assert(d.unstableRetries == 16, s"every attempt counted: $d")
    assert(m == Map("a" -> ts(5000L)),
      s"best-effort merge must surface the issued value, got $m")
  }

  test("per-read health is scoped to the call: a quiescent reader sees " +
    "zero retries while a sibling read thrashes the global counters") {
    val thrashed = tmp()
    val quiet = tmp()
    WatermarkStore.advance(spark, thrashed, "a", ts(1000L))
    WatermarkStore.advance(spark, quiet, "q", ts(9000L))
    // sibling thread: the fold-storm shape — every listing is followed
    // by a fresh advance, so its read burns the full retry budget and
    // bumps the JVM-global ReadStats the whole time
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val storm = pool.submit(new java.util.concurrent.Callable[
        (Map[String, java.sql.Timestamp], WatermarkStore.ReadHealth)] {
      def call() = {
        var n = 0
        WatermarkStore.readHookedWithHealth(spark, thrashed) { _ =>
          n += 1
          WatermarkStore.advance(spark, thrashed, "a", ts(1000L + n * 1000L))
        }
      }
    })
    // quiescent reads DURING the storm: per-call health must stay zero
    // even though the globals are moving underneath
    val quietHealths = (1 to 5).map { _ =>
      val (m, h) = WatermarkStore.readWithHealth(spark, quiet)
      assert(m == Map("q" -> ts(9000L)))
      h
    }
    val (_, stormHealth) = storm.get()
    pool.shutdown()
    assert(quietHealths.forall(_.total == 0L),
      s"sibling contention bled into quiescent reads: $quietHealths")
    assert(stormHealth.unstableRetries == 16 &&
      stormHealth.staleFallbacks == 1 && stormHealth.bestEffortReads == 0,
      s"the thrashed read must own exactly its budget: $stormHealth")
  }
}
