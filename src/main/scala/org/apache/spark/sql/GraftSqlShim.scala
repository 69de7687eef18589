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

  /** Register a session-scoped SQL function backed by a Catalyst
    * expression builder — the seam that exposes graft's codegen'd
    * scalar kernels to `spark.sql(...)` / [[graft.sql.QueryGate]]
    * users (the reference's only user-facing query surface is SQL, so
    * its users compose functions in queries, not in a host language).
    * Temp-function registration is the same mechanism
    * `spark.udf.register` uses underneath, minus the UDF wrapper: the
    * function stays a native expression, inside whole-stage codegen.
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
