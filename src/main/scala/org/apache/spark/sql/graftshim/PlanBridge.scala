package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge (`Dataset.ofRows` is
  * `private[sql]`; same seam rationale as [[ColumnBridge]]). Needed
  * by custom whole-operator nodes (e.g. graft.plans.AsofJoin): a
  * library-defined LogicalPlan has no public constructor path into a
  * DataFrame. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
