package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Executed-plan codegen audit: counts physical operators that COULD
  * participate in whole-stage codegen but are running interpreted —
  * i.e. `CodegenSupport` nodes not fused under any
  * [[WholeStageCodegenExec]] span.
  *
  * This is the canary the stage-count drift check is blind to: an
  * expression regressing to `CodegenFallback` (the round-13 q91 lesson)
  * changes NO stage boundaries — the shuffle shape is identical — but
  * kicks its Project/Filter out of the codegen span, which this count
  * sees as +1. Recorded per query in bench.json next to `stages`.
  */
object PlanAudit {

  /** Interpreted-but-codegen-capable operator count over the FINAL
    * executed plan (AQE-resolved). Run only on a frame whose OWN
    * QueryExecution drove an action (e.g. `toRdd`-based): an action like
    * `df.count()` plans a separate QueryExecution, leaving THIS frame's
    * AdaptiveSparkPlanExec unfinalized — `CollapseCodegenStages` never
    * ran on it, so counting it would flag every operator as interpreted.
    * Prefer auditing the plan captured by [[ExecutedPlanCapture]].
    */
  def interpretedNodes(df: DataFrame): Long =
    interpretedNodes(df.queryExecution.executedPlan)

  /** -1 when the plan contains an unfinalized AdaptiveSparkPlanExec —
    * a count over it would be meaningless (see above), and -1 is the
    * bench's existing "no reading" sentinel.
    */
  def interpretedNodes(plan: SparkPlan): Long =
    try walk(plan, inside = false)
    catch { case Unfinalized => -1L }

  private object Unfinalized
    extends RuntimeException("unfinalized AQE plan")
      with scala.util.control.NoStackTrace

  private def walk(p: SparkPlan, inside: Boolean): Long = p match {
    case w: WholeStageCodegenExec => walk(w.child, inside = true)
    // an InputAdapter is the fusion boundary: its subtree feeds the span
    // through row iteration, so nodes below it are NOT codegen'd by the
    // enclosing span (they may carry their own spans)
    case i: InputAdapter => walk(i.child, inside = false)
    case a: AdaptiveSparkPlanExec =>
      if (!a.isFinalPlan) throw Unfinalized
      walk(a.executedPlan, inside = false)
    case q: QueryStageExec => walk(q.plan, inside = false)
    // a reused exchange's subtree was already audited where it was built
    case _: ReusedExchangeExec => 0L
    case other =>
      val capable = other match {
        case c: org.apache.spark.sql.execution.CodegenSupport =>
          scala.util.Try(c.supportCodegen).getOrElse(true)
        case _ => false
      }
      (if (capable && !inside) 1L else 0L) +
        other.children.map(walk(_, inside)).sum
  }
}
