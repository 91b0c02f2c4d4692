package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{EtlRunner, ExtractTransform, MsdbDerivation}
import graft.store.{ConsolidatedStore, Staging, StoreLog, StoreMeta}

/** Step budget for one q64-shaped first append (the r1_srvA 4 s phase):
  * times each internal stage of [[ConsolidatedStore.appendPruned]]'s
  * bootstrap path — dedup, envelopes, LogID assignment, publish write,
  * commit, stat scan — so optimization lands on the stage that owns the
  * seconds. Run: `SPARK_GRAFT_SF_DIR=... runMain graft.AppendPhaseProbe`.
  */
object AppendPhaseProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = MsdbDerivation.sources(spark, sfDir)
    val batch = ExtractTransform
      .extract(src, ExtractTransform.rewind(EtlRunner.DefaultWatermark),
        sortOutput = false)
      .localCheckpoint()
    val nBatch = batch.count()

    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      r
    }

    (0 until reps).foreach { _ =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-appd").toString
      val path = s"$tmp/consolidated"

      val deduped = time("dedup_cache_envelopes") {
        val d = batch.dropDuplicates(ConsolidatedStore.dedupKey).cache()
        ConsolidatedStore.batchEnvelopes(d)
        d
      }
      val n = time("fresh_count")(deduped.count())
      val assigned = time("with_log_ids") {
        val a = ConsolidatedStore.withLogIdsFrom(0L, deduped, batchRows = n)
        a
      }
      val laidOut = assigned.sortWithinPartitions(
        col("database_name"), col("last_lsn"))
      val newFiles = time("publish_write")(
        Staging.publish(spark, path, laidOut, Nil))
      time("commit") {
        StoreLog.commitAppend(spark, path, newFiles, newFiles)
      }
      time("scan_stats") {
        val stats = StoreMeta.scanStats(spark, path, newFiles)
        StoreMeta.save(spark, path, stats)
      }
      deduped.unpersist()

      // the whole call, same fixture, for cross-checking the sum
      val tmp2 = java.nio.file.Files.createTempDirectory("graft-appd").toString
      time("append_whole")(
        ConsolidatedStore.append(spark, s"$tmp2/consolidated", batch))
      // duplicate-delivery append (everything already present)
      time("append_dup")(
        ConsolidatedStore.append(spark, s"$tmp2/consolidated", batch))
    }

    val phases = best.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"probe":"append_phase","n_batch":$nBatch,""" +
      s""""phases":{$phases}}""")
    spark.stop()
  }
}
