package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Narrow accessor for `private[sql]` Spark internals the graft planner
  * needs: building a DataFrame from a catalyst LogicalPlan (used by
  * [[graft.plans.RangeJoinRule]] to run its plan-time boundary-sampling
  * job). Lives under org.apache.spark.sql so the package-private API is
  * visible; keep this file to the minimum surface.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
