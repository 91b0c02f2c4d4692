package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scale-adaptive partition sizing for STATEFUL streaming lifecycles.
  *
  * AQE never coalesces a micro-batch's stateful exchanges (adaptive
  * execution is disabled for streaming plans), and the state-partition
  * count FREEZES into the checkpoint at the first batch — so the
  * session's batch-oriented `spark.sql.shuffle.partitions` silently
  * becomes the query's permanent state layout. Every state partition
  * costs a state-store instance per stateful operator per micro-batch
  * (open + commit + delta file), which is pure fixed overhead when the
  * per-trigger volume is small and a genuine parallelism need when it
  * is large. Production streaming jobs therefore size it deliberately;
  * this helper derives the number AQE's coalescing would pick for the
  * equivalent batch shape — ceil(input bytes /
  * `spark.sql.adaptive.advisoryPartitionSizeInBytes`), floor 1 — from
  * the lifecycle's source volume. No upper cap: 100 TB of input
  * derives ~1.6M partitions at the 64 MB default advisory, and a
  * deployment that wants fewer raises the advisory or sets the
  * explicit override `spark.graft.streaming.statePartitions`.
  */
object StreamTuning {

  /** Explicit per-deployment override for [[statePartitions]]. */
  val PartitionsConf = "spark.graft.streaming.statePartitions"

  /** Total on-disk bytes under `paths` (files or directories). */
  def inputBytes(spark: SparkSession, paths: String*): Long = {
    val conf = spark.sessionState.newHadoopConf()
    paths.map { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
    }.sum
  }

  /** Derived state-partition count for a lifecycle reading
    * `inputBytes` — override conf wins, else advisory-sized, floor 1.
    */
  def statePartitions(spark: SparkSession, inputBytes: Long): Int =
    spark.conf.getOption(PartitionsConf).map(_.toInt).getOrElse {
      val advisory = spark.conf
        .get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
      val bytes = org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(advisory)
      math.max(1L, (inputBytes + bytes - 1) / bytes)
        .min(Int.MaxValue.toLong).toInt
    }

  /** Run `body` (which must START its streaming queries synchronously —
    * `StreamExecution` clones the session, capturing conf, inside
    * `start()`) with `spark.sql.shuffle.partitions` set to the derived
    * state-partition count, restoring the session value after. Batch
    * queries are untouched: only query STARTS inside `body` capture the
    * override, and a checkpoint-restarted query keeps the count its
    * checkpoint recorded regardless.
    */
  def withStatePartitions[A](spark: SparkSession, inputBytes: Long)(
      body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, statePartitions(spark, inputBytes).toString)
    try body finally spark.conf.set(key, prev)
  }
}
