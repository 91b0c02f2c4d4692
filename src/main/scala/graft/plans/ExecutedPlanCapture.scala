package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.util.QueryExecutionListener

/** Captures the physical plan of the most recent Dataset action on a
  * session, AS EXECUTED — i.e. the [[QueryExecution]] the action itself
  * drove, whose `AdaptiveSparkPlanExec` is finalized (codegen collapsed,
  * stages materialized) by the time the listener fires.
  *
  * Why this exists: `df.count()` plans its OWN QueryExecution (a count
  * aggregate over the logical plan), so after the action the frame's
  * `df.queryExecution.executedPlan` is an AdaptiveSparkPlanExec that
  * never ran — `CollapseCodegenStages` never touched it, and a codegen
  * audit over it counts every codegen-capable operator as interpreted
  * (bogus values, blind to real `CodegenFallback` regressions). The only
  * honest plan to audit is the one the listener hands back.
  *
  * The listener bus is asynchronous: `onSuccess` fires after the action
  * returns, in submission order within the execution-listener queue.
  * [[awaitLastSince]] therefore waits for (a) at least one event past the
  * caller's [[mark]] and (b) a quiet period, so trailing events from
  * actions nested inside the measured body (store writes, inner counts)
  * settle before the LAST plan — the outermost timed action's — is read.
  */
final class ExecutedPlanCapture extends QueryExecutionListener {
  private val events = new AtomicLong(0L)
  @volatile private var lastPlan: SparkPlan = _

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    lastPlan = qe.executedPlan
    events.incrementAndGet()
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = {
    events.incrementAndGet()
  }

  /** Event counter snapshot; pass to [[awaitLastSince]] after the action. */
  def mark(): Long = events.get()

  /** Await the bus draining past `since`, then return the last captured
    * executed plan, or None if no event lands within `timeoutMs`.
    */
  def awaitLastSince(since: Long, timeoutMs: Long = 5000L,
                     quietMs: Long = 150L): Option[SparkPlan] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (events.get() <= since && System.nanoTime() < deadline)
      Thread.sleep(10)
    if (events.get() <= since) return None
    // quiesce: nested actions' events trail the outer action's return
    var stableAt = events.get()
    var stableSince = System.nanoTime()
    while (System.nanoTime() - stableSince < quietMs * 1000000L &&
      System.nanoTime() < deadline) {
      Thread.sleep(10)
      val e = events.get()
      if (e != stableAt) { stableAt = e; stableSince = System.nanoTime() }
    }
    Option(lastPlan)
  }
}

object ExecutedPlanCapture {
  /** Register a fresh capture on the session's execution-listener bus. */
  def install(spark: SparkSession): ExecutedPlanCapture = {
    val c = new ExecutedPlanCapture
    spark.listenerManager.register(c)
    c
  }
}
