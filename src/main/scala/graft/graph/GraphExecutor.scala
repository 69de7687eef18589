package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.SafeEval

/** Dataflow DAG executor — the Spark-native restatement of the
  * reference's `GraphExecutor` (`core/framework/graph/executor.py:
  * 257-1475`). Where the reference interprets one in-memory payload
  * per step, this executor routes entire DataFrames: every node is a
  * `DataFrame => DataFrame` transform, every edge routes *rows* by its
  * condition, so one graph execution processes arbitrarily many
  * records in parallel — the 100 TB restatement of "agent runs".
  *
  * Semantics carried over:
  *  - priority-desc, first-match-wins serial routing
  *    (`edge.py:491-494`, `executor.py:1617-1683`): encoded as an
  *    ordered when-ladder per row, so later predicates are not
  *    "evaluated" for a row once one matches — same short-circuit
  *    contract, vectorized.
  *  - parallel fan-out: ALL matching edges fire (`executor.py:
  *    1686-1732`) when `parallelFanOut = true`.
  *  - fan-in convergence: union of branch inputs (`executor.py:
  *    1734-1766`).
  *  - `input_mapping` projection/rename, empty map = pass-through
  *    (`edge.py:94-97, 276-303`).
  *  - ON_SUCCESS / ON_FAILURE route on a boolean `success` column
  *    (`edge.py:132-139`); CONDITIONAL compiles its safe_eval
  *    expression with eval-failure→false (`edge.py:200-204`).
  *  - visit limits (`node.py:216-224`) and max-steps (`edge.py:429`)
  *    bound cyclic graphs; driver-side iteration with lineage
  *    truncation via localCheckpoint every few steps.
  */
object GraphExecutor {

  /** A node implementation registry — the NodeProtocol analog
    * (`node.py:607-664`): named, validated before run
    * (`executor.py:234-255`).
    */
  type Registry = Map[String, DataFrame => DataFrame]

  final case class GraphResult(
      terminalOutputs: Map[String, DataFrame],
      path: Seq[String], // node visit order (`executor.py:39-72` result path)
      steps: Int)

  final case class GraphError(msg: String) extends RuntimeException(msg)

  private def edgePredicate(e: EdgeSpec, df: DataFrame): Column = e.conditionType match {
    case "always" => lit(true)
    case "on_success" =>
      if (df.columns.contains("success")) coalesce(col("success"), lit(false)) else lit(true)
    case "on_failure" =>
      if (df.columns.contains("success")) !coalesce(col("success"), lit(true)) else lit(false)
    case "conditional" =>
      SafeEval.predicate(e.condition.getOrElse("False"), df.schema)
    case other => throw GraphError(s"unknown condition type '$other'")
  }

  private def applyMapping(df: DataFrame, mapping: Map[String, String]): DataFrame =
    if (mapping.isEmpty) df // pass-through SELECT * (`edge.py:296`)
    else df.select(mapping.toSeq.sortBy(_._1).map { case (tgt, src) =>
      col(src).as(tgt)
    }: _*)

  /** Run `spec` over `input`, looking node transforms up in
    * `registry` (nodes without an entry are identity — pure routing
    * nodes). Returns terminal outputs keyed by node id.
    */
  def run(spec: GraphSpec, input: DataFrame, registry: Registry,
      parallelFanOut: Boolean = true, checkpointEvery: Int = 8): GraphResult = {
    spec.validate().left.foreach(errs => throw GraphError(errs.mkString("; ")))
    registry.keys.filterNot(k => spec.nodes.exists(_.id == k) || k == "*").foreach { k =>
      throw GraphError(s"registry entry '$k' is not a node of the graph")
    }

    val spark = input.sparkSession
    // pending work: (nodeId, dataframe waiting to enter it)
    var pending = Map(spec.entryNode -> Seq(input))
    var terminal = Map.empty[String, Seq[DataFrame]]
    val visits = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val path = Seq.newBuilder[String]
    var steps = 0

    while (pending.nonEmpty && steps < spec.maxSteps) {
      steps += 1
      // deterministic scheduling: lowest node id first
      val (nodeId, inputs) = pending.minBy(_._1)
      pending -= nodeId
      val node = spec.nodes.find(_.id == nodeId)
        .getOrElse(throw GraphError(s"node '$nodeId' undefined"))

      visits(nodeId) += 1
      if (node.maxVisits > 0 && visits(nodeId) > node.maxVisits) {
        // visit cap exceeded: skip execution, drop the work
        // (`executor.py:615-641` skips the node and moves on)
      } else {
        path += nodeId
        // fan-in convergence: union all waiting branch inputs
        val merged = inputs.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
        val fn = registry.getOrElse(nodeId, registry.getOrElse("*", identity[DataFrame] _))
        val outRaw = fn(merged)
        val out = if (steps % checkpointEvery == 0) outRaw.localCheckpoint() else outRaw

        if (spec.terminalNodes.contains(nodeId)) {
          terminal += nodeId -> (terminal.getOrElse(nodeId, Nil) :+ out)
        } else {
          val edges = spec.outgoing(nodeId)
          if (edges.nonEmpty) {
            val routed: Seq[(EdgeSpec, DataFrame)] =
              if (parallelFanOut) {
                // every matching edge fires (`executor.py:1686-1732`)
                edges.map(e => e -> out.filter(edgePredicate(e, out)))
              } else {
                // serial first-match-wins: tag each row with the
                // first (highest-priority) matching edge index
                val ladder = edges.zipWithIndex.reverse.foldLeft(lit(-1)) {
                  case (acc, (e, i)) => when(edgePredicate(e, out), lit(i)).otherwise(acc)
                }
                val tagged = out.withColumn("__route", ladder)
                edges.zipWithIndex.map { case (e, i) =>
                  e -> tagged.filter(col("__route") === i).drop("__route")
                }
              }
            routed.foreach { case (e, df) =>
              val mapped = applyMapping(df, e.inputMapping)
              pending += e.target -> (pending.getOrElse(e.target, Nil) :+ mapped)
            }
          }
        }
      }
    }
    if (pending.nonEmpty)
      throw GraphError(s"max_steps=${spec.maxSteps} exceeded with pending nodes ${pending.keys.mkString(",")}")

    GraphResult(terminal.view.mapValues(
      _.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))).toMap,
      path.result(), steps)
  }
}
