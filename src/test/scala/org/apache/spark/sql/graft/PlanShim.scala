package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into `private[sql]` plan construction: turn a
  * LogicalPlan fragment (e.g. the CHILD of a Window operator lifted
  * out of a catalog query's analyzed plan) back into a runnable
  * DataFrame, so plan audits can MEASURE properties of intermediate
  * frames — partition-key occupancy, row counts — rather than only
  * inspect them statically. */
object PlanShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
