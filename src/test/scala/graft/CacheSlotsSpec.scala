package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The one-generation cache registry's invariant under concurrency:
  * however rotations interleave, at most ONE generation per key ends up
  * cached — a stranded CacheManager entry (cached but no longer
  * reachable from the registry) is the leak the class exists to bound.
  */
class CacheSlotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("concurrent rotations of one key never strand a cached generation") {
    import spark.implicits._
    // distinct plans (different literals) so CacheManager cannot dedup
    // them into one entry and mask a strand
    val frames = (0 until 8).map(i =>
      Seq(i).toDF("v").select(col("v"), lit(s"gen_$i").as("tag")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = frames.map(f => pool.submit(new Runnable {
        def run(): Unit = {
          graft.util.CacheSlots.rotateOne("spec.concurrent", f)
          f.count() // materialize whichever entries survive mid-race
        }
      }))
      tasks.foreach(_.get())
    } finally pool.shutdown()
    val cached = frames.filter(_.storageLevel != StorageLevel.NONE)
    assert(cached.size <= 1,
      s"${cached.size} generations cached — rotation interleaved")
    // drop the survivor so the spec leaves no cache behind
    frames.foreach(_.unpersist(false))
  }
}
