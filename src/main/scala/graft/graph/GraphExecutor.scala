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

  /** Lifecycle event hook — the executor publishes node/graph
    * lifecycle events exactly like the reference's bus emission
    * (`executor.py` event emission per step, `event_bus.py:308-855`).
    * Wire it to [[graft.streaming.EventBus.publish]] to observe runs.
    */
  type EventHook = (String, String) => Unit // (event_type, node_id)

  final case class GraphResult(
      terminalOutputs: Map[String, DataFrame],
      path: Seq[String], // node visit order (`executor.py:39-72` result path)
      steps: Int,
      pausedAt: Option[String] = None, // ST6: pause at node boundary
      failedNodes: Seq[String] = Nil) // degraded success (`executor.py:63-71`)

  final case class GraphError(msg: String) extends RuntimeException(msg)

  private def edgePredicate(e: EdgeSpec, df: DataFrame): Column = e.conditionType match {
    case "always" => lit(true)
    case "on_success" =>
      if (df.columns.contains("success")) coalesce(col("success"), lit(false)) else lit(true)
    case "on_failure" =>
      if (df.columns.contains("success")) !coalesce(col("success"), lit(true)) else lit(false)
    case "conditional" =>
      // filter-context compilation: pushdown-friendly, null ≡ false
      // under both Filter semantics and the serial when-ladder
      SafeEval.filterCondition(e.condition.getOrElse("False"), df.schema)
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
    *
    * `pauseBefore` (ST6, `executor.py:563-607`): when the scheduler
    * reaches a listed node, execution state (pending inputs, visit
    * counts, path) is persisted to `checkpointDir` and the result
    * comes back with `pausedAt` set; [[resume]] continues it — the
    * HITL pause/resume protocol at the node boundary.
    */
  def run(spec: GraphSpec, input: DataFrame, registry: Registry,
      parallelFanOut: Boolean = true, checkpointEvery: Int = 8,
      pauseBefore: Set[String] = Set.empty,
      checkpointDir: Option[String] = None,
      onEvent: EventHook = (_, _) => (),
      eagerNodeActions: Boolean = false,
      durableCheckpointEvery: Int = 0,
      asyncCheckpointSave: Boolean = false): GraphResult = {
    spec.validate().left.foreach(errs => throw GraphError(errs.mkString("; ")))
    registry.keys.filterNot(k => spec.nodes.exists(_.id == k) || k == "*").foreach { k =>
      throw GraphError(s"registry entry '$k' is not a node of the graph")
    }
    loop(spec, Map(spec.entryNode -> Seq(input)), Map.empty, Nil, 0,
      registry, parallelFanOut, checkpointEvery, pauseBefore, checkpointDir,
      onEvent, eagerNodeActions = eagerNodeActions,
      durableCheckpointEvery = durableCheckpointEvery,
      asyncCheckpointSave = asyncCheckpointSave)
  }

  /** Resume a paused run from `checkpointDir`
    * (ST5, `checkpoint.py:14-177` restore-memory-and-path).
    */
  def resume(spec: GraphSpec, spark: org.apache.spark.sql.SparkSession,
      checkpointDir: String, registry: Registry,
      parallelFanOut: Boolean = true, checkpointEvery: Int = 8): GraphResult = {
    val metaJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$checkpointDir/meta.json")), "UTF-8")
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val meta = org.json4s.jackson.JsonMethods.parse(metaJson)
    val pendingKeys = (meta \ "pending").extract[Map[String, Int]]
    val terminalKeys = (meta \ "terminal").extractOrElse[Map[String, Int]](Map.empty)
    val visits = (meta \ "visits").extract[Map[String, Int]]
    val path = (meta \ "path").extract[Seq[String]]
    val steps = (meta \ "steps").extract[Int]
    val pending = pendingKeys.map { case (node, n) =>
      node -> (0 until n).map(i =>
        spark.read.parquet(s"$checkpointDir/pending/$node/$i")).toSeq
    }
    val terminal = terminalKeys.map { case (node, n) =>
      node -> (0 until n).map(i =>
        spark.read.parquet(s"$checkpointDir/terminal/$node/$i")).toSeq
    }
    loop(spec, pending, visits, path, steps, registry, parallelFanOut,
      checkpointEvery, Set.empty, None, (_, _) => (), terminal0 = terminal)
  }

  private def savePause(dir: String, pending: Map[String, Seq[DataFrame]],
      terminal: Map[String, Seq[DataFrame]], visits: Map[String, Int],
      path: Seq[String], steps: Int): Unit = {
    pending.foreach { case (node, dfs) =>
      dfs.zipWithIndex.foreach { case (df, i) =>
        df.write.mode("overwrite").parquet(s"$dir/pending/$node/$i")
      }
    }
    terminal.foreach { case (node, dfs) =>
      dfs.zipWithIndex.foreach { case (df, i) =>
        df.write.mode("overwrite").parquet(s"$dir/terminal/$node/$i")
      }
    }
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val meta = org.json4s.jackson.Serialization.write(Map(
      "pending" -> pending.view.mapValues(_.size).toMap,
      "terminal" -> terminal.view.mapValues(_.size).toMap,
      "visits" -> visits,
      "path" -> path,
      "steps" -> steps))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/meta.json"),
      meta.getBytes("UTF-8"))
    ()
  }

  private def loop(spec: GraphSpec, pending0: Map[String, Seq[DataFrame]],
      visits0: Map[String, Int], path0: Seq[String], steps0: Int,
      registry: Registry, parallelFanOut: Boolean, checkpointEvery: Int,
      pauseBefore: Set[String], checkpointDir: Option[String],
      onEvent: EventHook,
      terminal0: Map[String, Seq[DataFrame]] = Map.empty,
      eagerNodeActions: Boolean = false,
      durableCheckpointEvery: Int = 0,
      asyncCheckpointSave: Boolean = false): GraphResult = {
    // periodic durable saves (`executor.py:560-607` async-or-blocking
    // checkpoint option): at most one save in flight; the next save —
    // and loop completion — awaits the previous, so a slow save can
    // never pile up or outlive the run
    var inFlightSave: Option[java.util.concurrent.Future[_]] = None
    val saveExec =
      if (durableCheckpointEvery > 0 && asyncCheckpointSave)
        Some(java.util.concurrent.Executors.newSingleThreadExecutor(r => {
          val t = new Thread(r, "graft-graph-checkpoint"); t.setDaemon(true); t
        }))
      else None
    def awaitSave(): Unit = { inFlightSave.foreach(_.get()); inFlightSave = None }
    def durableSave(pending: Map[String, Seq[DataFrame]],
        terminal: Map[String, Seq[DataFrame]], visits: Map[String, Int],
        path: Seq[String], steps: Int): Unit = {
      val dir = checkpointDir.getOrElse(
        throw GraphError("durableCheckpointEvery requires a checkpointDir"))
      onEvent("checkpoint_saved", "")
      saveExec match {
        case Some(ex) =>
          awaitSave() // one at a time
          inFlightSave = Some(ex.submit(new Runnable {
            def run(): Unit = savePause(dir, pending, terminal, visits, path, steps)
          }))
        case None => savePause(dir, pending, terminal, visits, path, steps)
      }
    }
    var pending = pending0
    var terminal = terminal0
    val visits = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    visits0.foreach { case (k, v) => visits(k) = v }
    val path = Seq.newBuilder[String]
    path ++= path0
    val failedNodes = scala.collection.mutable.LinkedHashSet.empty[String]
    var steps = steps0

    while (pending.nonEmpty && steps < spec.maxSteps) {
      if (pauseBefore.nonEmpty && pending.keys.exists(pauseBefore.contains)) {
        val dir = checkpointDir.getOrElse(
          throw GraphError("pauseBefore requires a checkpointDir"))
        // an in-flight async durable save writes the same checkpoint
        // dir — let it finish before the pause snapshot overwrites it
        awaitSave()
        saveExec.foreach(_.shutdown())
        savePause(dir, pending, terminal, visits.toMap, path.result(), steps)
        return GraphResult(
          terminal.view.mapValues(
            _.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))).toMap,
          path.result(), steps,
          pausedAt = Some(pending.keys.filter(pauseBefore.contains).min))
      }
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
        onEvent("node_started", nodeId)
        // fan-in convergence: union all waiting branch inputs
        val merged = inputs.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
        val fn = registry.getOrElse(nodeId, registry.getOrElse("*", identity[DataFrame] _))
        // per-node retries (`edge.py:430` max_retries_per_node=3,
        // `node.py:213`); exhausted → failure policy (`executor.py:
        // 1768-1991` ParallelExecutionConfig: fail_all | continue_others)
        // NOTE: without eagerNodeActions, fn only *constructs* the
        // plan, so only analysis-time errors are retryable; with it,
        // each node materializes (localCheckpoint) inside the retry
        // scope so runtime failures hit the retry/failure policy too
        var outRaw: DataFrame = null
        var attempt = 0
        var failed: Option[Throwable] = None
        while (outRaw == null && failed.isEmpty) {
          try {
            val df = fn(merged)
            outRaw = if (eagerNodeActions) df.localCheckpoint(true) else df
          }
          catch {
            case e: Throwable =>
              attempt += 1
              if (attempt > spec.maxRetriesPerNode) {
                onEvent("node_failed", nodeId)
                failed = Some(e)
              } else onEvent("node_retry", nodeId)
          }
        }
        failed.foreach { e =>
          if (spec.failurePolicy == "fail_all") throw GraphError(
            s"node '$nodeId' failed after ${spec.maxRetriesPerNode} retries: ${e.getMessage}")
          else failedNodes += nodeId // continue_others: drop this branch
        }
        if (failed.isEmpty) {
        onEvent("node_completed", nodeId)
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
      if (durableCheckpointEvery > 0 && steps % durableCheckpointEvery == 0)
        durableSave(pending, terminal, visits.toMap, path.result(), steps)
    }
    awaitSave()
    saveExec.foreach(_.shutdown())
    if (pending.nonEmpty)
      throw GraphError(s"max_steps=${spec.maxSteps} exceeded with pending nodes ${pending.keys.mkString(",")}")

    onEvent("graph_completed", "")
    GraphResult(terminal.view.mapValues(
      _.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))).toMap,
      path.result(), steps, failedNodes = failedNodes.toSeq)
  }
}
