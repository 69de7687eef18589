package graft.graph

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Declarative dataflow-graph spec — the Spark restatement of the
  * reference's `GraphSpec` (`core/framework/graph/edge.py:345-461`):
  * nodes + edges with conditional expression routing, projection /
  * renaming between nodes (`input_mapping`, `edge.py:94-97`), priority
  * ordering (`edge.py:100`), entry and terminal nodes.
  *
  * Condition types mirror `edge.py:39-46`: ON_SUCCESS / ON_FAILURE /
  * ALWAYS / CONDITIONAL (safe_eval expression over the row).
  */
final case class NodeSpec(
    id: String,
    kind: String = "transform",
    maxVisits: Int = 0) // 0 = unlimited (`node.py:216-224`)

final case class EdgeSpec(
    source: String,
    target: String,
    conditionType: String = "always", // on_success | on_failure | always | conditional
    condition: Option[String] = None, // safe_eval expr for `conditional`
    inputMapping: Map[String, String] = Map.empty, // target_key -> source_key
    priority: Int = 0)

final case class GraphSpec(
    nodes: Seq[NodeSpec],
    edges: Seq[EdgeSpec],
    entryNode: String,
    terminalNodes: Seq[String],
    maxSteps: Int = 100, // `edge.py:429`
    maxRetriesPerNode: Int = 3, // `edge.py:430`, `node.py:213`
    failurePolicy: String = "fail_all") { // fail_all | continue_others (`executor.py:87-100`)

  /** Validation parity with `GraphSpec.validate` (`edge.py:568-692`):
    * entry/terminal existence, edge referential integrity, reachability
    * of every node from the entry.
    */
  def validate(): Either[Seq[String], GraphSpec] = {
    val ids = nodes.map(_.id).toSet
    val errors = Seq.newBuilder[String]
    if (!ids.contains(entryNode)) errors += s"entry node '$entryNode' not defined"
    terminalNodes.filterNot(ids.contains)
      .foreach(t => errors += s"terminal node '$t' not defined")
    edges.filterNot(e => ids.contains(e.source))
      .foreach(e => errors += s"edge source '${e.source}' not defined")
    edges.filterNot(e => ids.contains(e.target))
      .foreach(e => errors += s"edge target '${e.target}' not defined")
    edges.filter(e => e.conditionType == "conditional" && e.condition.isEmpty)
      .foreach(e => errors += s"conditional edge ${e.source}->${e.target} lacks a condition")
    if (nodes.map(_.id).distinct.size != nodes.size) errors += "duplicate node ids"

    // reachability from entry (`edge.py:636-657`)
    val adj = edges.groupBy(_.source).view.mapValues(_.map(_.target)).toMap
    val seen = scala.collection.mutable.Set(entryNode)
    var frontier = Seq(entryNode)
    while (frontier.nonEmpty)
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil)).filterNot(seen)
        .distinct.tapEach(seen += _)
    (ids -- seen).toSeq.sorted.foreach(n => errors += s"node '$n' unreachable from entry")

    val errs = errors.result()
    if (errs.isEmpty) Right(this) else Left(errs)
  }

  /** Fan-in nodes: targets reached by more than one edge
    * (`edge.py:519-534`).
    */
  def fanInNodes: Set[String] =
    edges.groupBy(_.target).collect { case (t, es) if es.size > 1 => t }.toSet

  def outgoing(node: String): Seq[EdgeSpec] =
    edges.filter(_.source == node).sortBy(-_.priority) // priority desc, `edge.py:491-494`
}

object GraphSpec {

  /** Parse the reference's agent-graph JSON shape (subset):
    * `{"nodes": [{"id": …}], "edges": [{"source": …, "target": …,
    * "condition_type": …, "condition": …, "input_mapping": {…},
    * "priority": …}], "entry_node": …, "terminal_nodes": […]}`.
    */
  def fromJson(json: String): GraphSpec = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val nodes = (j \ "nodes").children.map { n =>
      NodeSpec(
        id = (n \ "id").extract[String],
        kind = (n \ "kind").extractOrElse[String]("transform"),
        maxVisits = (n \ "max_visits").extractOrElse[Int](0))
    }
    val edges = (j \ "edges").children.map { e =>
      EdgeSpec(
        source = (e \ "source").extract[String],
        target = (e \ "target").extract[String],
        conditionType = (e \ "condition_type").extractOrElse[String]("always"),
        condition = (e \ "condition").extractOpt[String],
        inputMapping = (e \ "input_mapping").extractOrElse[Map[String, String]](Map.empty),
        priority = (e \ "priority").extractOrElse[Int](0))
    }
    GraphSpec(
      nodes = nodes,
      edges = edges,
      entryNode = (j \ "entry_node").extract[String],
      terminalNodes = (j \ "terminal_nodes").children.map(_.extract[String]),
      maxSteps = (j \ "max_steps").extractOrElse[Int](100),
      maxRetriesPerNode = (j \ "max_retries_per_node").extractOrElse[Int](3),
      failurePolicy = (j \ "failure_policy").extractOrElse[String]("fail_all"))
  }
}
