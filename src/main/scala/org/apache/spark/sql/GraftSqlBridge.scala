package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` classic Dataset factory, so
  * library code can hand a CUSTOM LogicalPlan (e.g.
  * `graft.plans.AsOfJoinNode`) to the session and get a DataFrame back —
  * the documented pattern for whole-operator engine extensions (a
  * logical node + planner strategy + physical exec need an entry point;
  * Spark's own connectors use the same factory). This is the only
  * member of the project living under the `org.apache.spark.sql`
  * namespace, and it forwards without adding behavior.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
