package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into `private[sql]` plan re-execution: lets the
  * round-boundary audit (graft.RoundBoundarySpec) re-run a query from a
  * TRANSFORMED analyzed plan — the audited plan is the real one, not a
  * hand-copied twin that could drift from the registry. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
