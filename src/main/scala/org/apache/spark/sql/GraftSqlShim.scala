package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway this engine needs: turning a
  * hand-built [[LogicalPlan]] (graft's custom operators, e.g.
  * [[graft.plans.AsOfJoinPlan]]) back into a public [[DataFrame]] so
  * it flows through the normal analyzer → optimizer → planner
  * pipeline. This is the standard extension-library pattern (every
  * Spark connector/extension that introduces a logical operator ships
  * an `org.apache.spark.sql`-package shim exactly like this); nothing
  * else in the codebase reaches into Spark internals' package-private
  * surface.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
