package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.{EdgeSpec, GraphExecutor, GraphSpec, NodeSpec}

class GraphExecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = graft.core.Engine.table(spark, sfDir, "events")

  test("linear pipeline matches direct dataframe program") {
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("a_filter"), NodeSpec("b_agg"), NodeSpec("c_out")),
      edges = Seq(EdgeSpec("a_filter", "b_agg"), EdgeSpec("b_agg", "c_out")),
      entryNode = "a_filter", terminalNodes = Seq("c_out"))
    val registry: GraphExecutor.Registry = Map(
      "a_filter" -> ((df: DataFrame) => df.filter(col("value") > 100)),
      "b_agg" -> ((df: DataFrame) => df.groupBy("event_type").agg(count(lit(1)).as("n"))))
    val result = GraphExecutor.run(spec, events, registry)
    val got = result.terminalOutputs("c_out").orderBy("event_type").collect()
    val want = events.filter(col("value") > 100)
      .groupBy("event_type").agg(count(lit(1)).as("n")).orderBy("event_type").collect()
    assert(got.sameElements(want))
    assert(result.path == Seq("a_filter", "b_agg", "c_out"))
  }

  test("conditional edges route rows by safe_eval predicates; rows partition cleanly") {
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("src"), NodeSpec("hot"), NodeSpec("cold")),
      edges = Seq(
        EdgeSpec("src", "hot", "conditional", Some("value > 100 and event_type != 'error'")),
        EdgeSpec("src", "cold", "conditional", Some("not (value > 100 and event_type != 'error')"))),
      entryNode = "src", terminalNodes = Seq("hot", "cold"))
    val result = GraphExecutor.run(spec, events, Map.empty)
    val hot = result.terminalOutputs("hot").count()
    val cold = result.terminalOutputs("cold").count()
    assert(hot > 0 && cold > 0)
    assert(hot + cold == events.count())
  }

  test("serial first-match-wins routing sends each row down exactly one edge") {
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("src"), NodeSpec("big"), NodeSpec("rest")),
      edges = Seq(
        EdgeSpec("src", "big", "conditional", Some("value > 50"), priority = 10),
        EdgeSpec("src", "rest", "always", priority = 0)),
      entryNode = "src", terminalNodes = Seq("big", "rest"))
    val result = GraphExecutor.run(spec, events, Map.empty, parallelFanOut = false)
    val big = result.terminalOutputs("big").count()
    val rest = result.terminalOutputs("rest").count()
    assert(big == events.filter(col("value") > 50).count())
    assert(big + rest == events.count()) // disjoint despite 'always' edge
  }

  test("fan-out duplicates flow, fan-in unions branches") {
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("src"), NodeSpec("b1"), NodeSpec("b2"), NodeSpec("sink")),
      edges = Seq(
        EdgeSpec("src", "b1"), EdgeSpec("src", "b2"),
        EdgeSpec("b1", "sink"), EdgeSpec("b2", "sink")),
      entryNode = "src", terminalNodes = Seq("sink"))
    assert(spec.fanInNodes == Set("sink"))
    val tiny = events.limit(10)
    val registry: GraphExecutor.Registry = Map(
      "b1" -> ((df: DataFrame) => df.withColumn("branch", lit("b1"))),
      "b2" -> ((df: DataFrame) => df.withColumn("branch", lit("b2"))))
    val result = GraphExecutor.run(spec, tiny, registry)
    val sink = result.terminalOutputs("sink")
    assert(sink.count() == 20)
    assert(sink.select("branch").distinct().count() == 2)
  }

  test("input_mapping projects and renames (`edge.py:94-97`)") {
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("src"), NodeSpec("out")),
      edges = Seq(EdgeSpec("src", "out",
        inputMapping = Map("id" -> "event_id", "kind" -> "event_type"))),
      entryNode = "src", terminalNodes = Seq("out"))
    val result = GraphExecutor.run(spec, events.limit(5), Map.empty)
    assert(result.terminalOutputs("out").columns.sorted.toSeq == Seq("id", "kind"))
  }

  test("cyclic graph bounded by max visits") {
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("grow", maxVisits = 3), NodeSpec("done")),
      edges = Seq(
        EdgeSpec("grow", "grow", "conditional", Some("n < 100"), priority = 10),
        EdgeSpec("grow", "done", "conditional", Some("n >= 100"))),
      entryNode = "grow", terminalNodes = Seq("done"), maxSteps = 10)
    val registry: GraphExecutor.Registry = Map(
      "grow" -> ((df: DataFrame) => df.withColumn("n", col("n") * 10)))
    val result = GraphExecutor.run(spec, Seq(1L).toDF("n"), registry)
    assert(result.terminalOutputs("done").head().getLong(0) == 100L)
  }

  test("node retries recover transient failures (`node.py:213`, 3 retries)") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("flaky"), NodeSpec("out")),
      edges = Seq(EdgeSpec("flaky", "out")),
      entryNode = "flaky", terminalNodes = Seq("out"))
    val registry: GraphExecutor.Registry = Map(
      "flaky" -> ((df: DataFrame) => {
        if (attempts.incrementAndGet() <= 2) throw new RuntimeException("transient")
        df
      }))
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    val result = GraphExecutor.run(spec, Seq(1).toDF("x"), registry,
      onEvent = (t, _) => events.synchronized { events += t; () })
    assert(result.terminalOutputs("out").count() == 1)
    assert(result.failedNodes.isEmpty)
    assert(events.count(_ == "node_retry") == 2)
  }

  test("failure policy: fail_all throws, continue_others degrades (`executor.py:87-100`)") {
    def specWith(policy: String) = GraphSpec(
      nodes = Seq(NodeSpec("src"), NodeSpec("dead"), NodeSpec("alive"), NodeSpec("sink")),
      edges = Seq(EdgeSpec("src", "dead"), EdgeSpec("src", "alive"),
        EdgeSpec("dead", "sink"), EdgeSpec("alive", "sink")),
      entryNode = "src", terminalNodes = Seq("sink"),
      maxRetriesPerNode = 1, failurePolicy = policy)
    val registry: GraphExecutor.Registry = Map(
      "dead" -> ((_: DataFrame) => throw new RuntimeException("permanently broken")),
      "alive" -> ((df: DataFrame) => df.withColumn("branch", lit("alive"))))
    intercept[GraphExecutor.GraphError] {
      GraphExecutor.run(specWith("fail_all"), events.limit(5), registry)
    }
    val degraded = GraphExecutor.run(specWith("continue_others"), events.limit(5), registry)
    assert(degraded.failedNodes == Seq("dead"))
    assert(degraded.terminalOutputs("sink").count() == 5) // alive branch delivered
  }

  test("eager node actions bring runtime failures under the retry/failure policy") {
    // rlike with a broken regex only fails at execution time; without
    // eagerNodeActions it would escape continue_others entirely
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("src"), NodeSpec("dead"), NodeSpec("alive"), NodeSpec("sink")),
      edges = Seq(EdgeSpec("src", "dead"), EdgeSpec("src", "alive"),
        EdgeSpec("dead", "sink"), EdgeSpec("alive", "sink")),
      entryNode = "src", terminalNodes = Seq("sink"),
      maxRetriesPerNode = 1, failurePolicy = "continue_others")
    val registry: GraphExecutor.Registry = Map(
      "dead" -> ((df: DataFrame) =>
        df.withColumn("x", element_at(split(col("event_type"), ","), 99))),
      "alive" -> ((df: DataFrame) => df.withColumn("branch", lit("alive"))))
    val degraded = GraphExecutor.run(spec, events.limit(5), registry,
      eagerNodeActions = true)
    assert(degraded.failedNodes == Seq("dead"))
    assert(degraded.terminalOutputs("sink").count() == 5)
  }

  test("validation catches unreachable nodes, bad refs, missing conditions") {
    val bad = GraphSpec(
      nodes = Seq(NodeSpec("a"), NodeSpec("island")),
      edges = Seq(EdgeSpec("a", "ghost"), EdgeSpec("a", "a", "conditional", None)),
      entryNode = "a", terminalNodes = Seq("nope"))
    val errs = bad.validate().left.getOrElse(Nil)
    assert(errs.exists(_.contains("terminal node 'nope'")))
    assert(errs.exists(_.contains("edge target 'ghost'")))
    assert(errs.exists(_.contains("unreachable")))
    assert(errs.exists(_.contains("lacks a condition")))
  }

  test("graph json parsing (agent.json shape)") {
    val json =
      """{"nodes": [{"id": "a"}, {"id": "b", "max_visits": 2}],
        | "edges": [{"source": "a", "target": "b",
        |   "condition_type": "conditional", "condition": "x > 1",
        |   "input_mapping": {"y": "x"}, "priority": 5}],
        | "entry_node": "a", "terminal_nodes": ["b"], "max_steps": 50}""".stripMargin
    val spec = GraphSpec.fromJson(json)
    assert(spec.nodes.map(_.id) == Seq("a", "b"))
    assert(spec.nodes(1).maxVisits == 2)
    assert(spec.edges.head.condition.contains("x > 1"))
    assert(spec.edges.head.inputMapping == Map("y" -> "x"))
    assert(spec.maxSteps == 50)
    assert(spec.validate().isRight)
    val result = GraphExecutor.run(spec, Seq(0L, 1L, 2L).toDF("x"), Map.empty)
    assert(result.terminalOutputs("b").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L))
  }
}
