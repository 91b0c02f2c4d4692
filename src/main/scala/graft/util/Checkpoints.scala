package graft.util

import org.apache.spark.sql.DataFrame
import org.slf4j.LoggerFactory

/** Eager release of a `localCheckpoint()`'d DataFrame's storage blocks.
  *
  * A checkpointed frame's blocks live until the ContextCleaner notices
  * the RDD reference is gone (GC timing) — a long-lived driver looping
  * over batches or plans accumulates blocks between collections. Callers
  * that know their consuming action has run can free the blocks NOW.
  *
  * Best-effort by design: the analyzed plan of a checkpointed frame is
  * `LogicalRDD` today; a Spark upgrade changing that shape silently
  * reverts to ContextCleaner timing — the debug log below is what makes
  * such a regression observable instead of silent.
  */
object Checkpoints {

  private lazy val log = LoggerFactory.getLogger(getClass)

  def release(df: DataFrame): Unit =
    try {
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case other =>
          log.debug("release: expected LogicalRDD, saw {} — blocks left to " +
            "ContextCleaner", other.getClass.getName)
      }
    } catch {
      case t: Throwable =>
        log.debug("release: unpersist failed — blocks left to ContextCleaner", t)
    }
}
