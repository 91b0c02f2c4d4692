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
    * executed plan (AQE-resolved). Run only after an action has executed
    * the frame — before that, AQE subtrees are unresolved placeholders.
    */
  def interpretedNodes(df: DataFrame): Long =
    interpretedNodes(df.queryExecution.executedPlan)

  def interpretedNodes(plan: SparkPlan): Long = walk(plan, inside = false)

  private def walk(p: SparkPlan, inside: Boolean): Long = p match {
    case w: WholeStageCodegenExec => walk(w.child, inside = true)
    // an InputAdapter is the fusion boundary: its subtree feeds the span
    // through row iteration, so nodes below it are NOT codegen'd by the
    // enclosing span (they may carry their own spans)
    case i: InputAdapter => walk(i.child, inside = false)
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan, inside = false)
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
