package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Catalog
import graft.graph.{EdgeSpec, GraphExecutor, GraphSpec, NodeSpec}
import graft.operators.{Aggregators, Analytics}
import graft.streaming.EntryPoints

class RuntimeSpec extends SparkSpec {
  import spark.implicits._
  private implicit val ec: ExecutionContext = ExecutionContext.global

  test("catalog: external tables + describe_dataset parity") {
    Catalog.registerExternal(spark, "cat_lineitem", s"$sfDir/lineitem.parquet")
    val desc = Catalog.describeDatabase(spark)
    val li = desc.filter(col("table_name") === "cat_lineitem").head()
    val fields = li.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("schema")
    assert(fields.exists(f => f.getString(0) == "l_orderkey" && f.getString(1) == "bigint"))
    val info = Catalog.tableInfo(spark, "cat_lineitem").head()
    assert(info.getAs[Long]("total_rows") == 6000L)
  }

  test("doom-loop detection: identical fingerprint sequences, key order ignored (`event_loop_node.py:1884-1928`)") {
    // turns 1-3 repeat the same call sequence (args key order varies);
    // turn 4 differs
    val calls = Seq(
      ("s", 1, 0, "search", """{"q": "x", "k": 5}"""),
      ("s", 1, 1, "fetch", """{"url": "a"}"""),
      ("s", 2, 0, "search", """{"k": 5, "q": "x"}"""), // same args, keys reordered
      ("s", 2, 1, "fetch", """{"url": "a"}"""),
      ("s", 3, 0, "search", """{"q": "x", "k": 5}"""),
      ("s", 3, 1, "fetch", """{"url": "a"}"""),
      ("s", 4, 0, "search", """{"q": "different"}""")
    ).toDF("session", "turn", "call_idx", "tool", "args")
    val flags = Analytics.doomLoopFlags(calls, "session", "turn", "call_idx", "tool", "args")
      .collect().map(r => r.getInt(1) -> r.getBoolean(3)).toMap
    assert(flags == Map(1 -> false, 2 -> false, 3 -> true, 4 -> false))
  }

  test("canonical json: sorted keys, nested, invalid → null (`json.dumps(sort_keys=True)` parity)") {
    val df = Seq(
      """{"q": "x", "k": 5}""",
      """{"b": [{"z": 1, "a": 2}], "a": null}""",
      "not json").toDF("j")
    val got = df.select(
      graft.functions.CatalystExpressions.canonicalJson(col("j")).as("c"))
      .collect().map(_.getString(0))
    assert(got(0) == """{"k":5,"q":"x"}""")
    assert(got(1) == """{"a":null,"b":[{"a":2,"z":1}]}""")
    assert(got(2) == null)
  }

  test("typed Aggregator: weighted progress with zero-guard (`outcome_aggregator.py:246-295`)") {
    val ds = Seq((2.0, 0.5), (1.0, 1.0), (1.0, 0.0)).toDS() // (weight, progress)
    val got = ds.select(Aggregators.weightedProgress.toColumn).head()
    assert(math.abs(got - 0.5) < 1e-9) // (1.0 + 1.0 + 0) / 4
    val empty = Seq.empty[(Double, Double)].toDS()
    assert(empty.select(Aggregators.weightedProgress.toColumn).head() == 0.0) // max(1,0) guard
  }

  test("xor set fingerprint is order-insensitive and mergeable") {
    val a = Seq(1L, 2L, 3L).toDS().select(Aggregators.xorFingerprint.toColumn).head()
    val b = Seq(3L, 1L, 2L).toDS().select(Aggregators.xorFingerprint.toColumn).head()
    val c = Seq(1L, 2L).toDS().select(Aggregators.xorFingerprint.toColumn).head()
    assert(a == b && a != c)
  }

  test("execution stream: admission cap bounds concurrency (`edge.py:338-340`)") {
    val runtime = new EntryPoints.EntryPointRuntime()
    try {
      val stream = runtime.register(
        EntryPoints.EntryPointSpec("ingest", maxConcurrent = 2),
        (df: DataFrame) => { Thread.sleep(150); df.filter(col("value") > 50) })
      val events = graft.core.Engine.table(spark, sfDir, "events").limit(100)
      val futures = (1 to 6).map(_ => runtime.trigger("ingest", events))
      val results = Await.result(Future.sequence(futures), 60.seconds)
      assert(results.forall(_.success))
      assert(stream.peakConcurrency <= 2)
      assert(stream.recentResults.size == 6)
    } finally runtime.shutdown()
  }

  test("timer entry point fires on interval (`agent_runtime.py:382-516`)") {
    val runtime = new EntryPoints.EntryPointRuntime()
    try {
      val stream = runtime.register(
        EntryPoints.EntryPointSpec("tick", triggerType = "timer", intervalMs = 100),
        (df: DataFrame) => df)
      runtime.startTimer("tick", () => Seq(1).toDF("x"), fireNow = true)
      // poll: under full-suite load the scheduler can be starved well
      // past the nominal 100ms interval
      val deadline = System.currentTimeMillis() + 30000
      while (stream.recentResults.size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(stream.recentResults.size >= 2)
    } finally runtime.shutdown()
  }

  test("checkpoint index: filter_by_type/node, latest clean (`checkpoint.py:163-177`)") {
    import graft.graph.Checkpoints
    val dir = java.nio.file.Files.createTempDirectory("graft-ckidx").toString
    val idx = new Checkpoints.CheckpointIndex(spark, dir)
    idx.record(Checkpoints.CheckpointMeta("c1", "node_start", "a", 1, clean = true, 100L, s"$dir/c1"))
    idx.record(Checkpoints.CheckpointMeta("c2", "pause", "b", 2, clean = false, 200L, s"$dir/c2"))
    idx.record(Checkpoints.CheckpointMeta("c3", "node_start", "b", 3, clean = true, 300L, s"$dir/c3"))
    assert(idx.filterByType("pause").count() == 1)
    assert(idx.filterByNode("b").count() == 2)
    assert(idx.latestClean().contains("c3"))
  }

  test("graph executor emits lifecycle events to the bus hook (`executor.py` emission)") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("a"), NodeSpec("b")),
      edges = Seq(EdgeSpec("a", "b")),
      entryNode = "a", terminalNodes = Seq("b"))
    GraphExecutor.run(spec, Seq(1).toDF("x"), Map.empty,
      onEvent = (t, n) => seen.synchronized { seen += ((t, n)); () })
    assert(seen.toSeq == Seq(
      ("node_started", "a"), ("node_completed", "a"),
      ("node_started", "b"), ("node_completed", "b"),
      ("graph_completed", "")))
  }

  test("cron expressions: parse, match, next-fire (`agent_runtime.py:382-516`)") {
    import graft.streaming.Cron
    import java.time.{ZonedDateTime, ZoneOffset}
    val every15 = Cron.parse("*/15 * * * *")
    assert(every15.minute == Set(0, 15, 30, 45))
    val t = ZonedDateTime.of(2026, 8, 12, 9, 7, 30, 0, ZoneOffset.UTC)
    assert(every15.nextAfter(t).getMinute == 15)
    val weekdays9 = Cron.parse("30 9 * * 1-5")
    // 2026-08-15 is a Saturday; next 09:30 weekday fire is Monday the 17th
    val sat = ZonedDateTime.of(2026, 8, 15, 0, 0, 0, 0, ZoneOffset.UTC)
    val next = weekdays9.nextAfter(sat)
    assert(next.getDayOfMonth == 17 && next.getHour == 9 && next.getMinute == 30)
    val ranges = Cron.parse("0,30 8-10 1 1 *")
    assert(ranges.hour == Set(8, 9, 10) && ranges.minute == Set(0, 30))
    assert(ranges.dayOfMonth == Set(1) && ranges.month == Set(1))
    intercept[IllegalArgumentException] { Cron.parse("99 * * * *") }
    intercept[IllegalArgumentException] { Cron.parse("* * *") }
  }

  test("applyChanges: upserts win by version, tombstones delete (MERGE shape)") {
    import graft.operators.Guards
    val base = Seq(("k1", "old", 1L), ("k2", "keep", 1L), ("k3", "gone", 1L))
      .toDF("key", "value", "version")
    val changes = Seq(
      ("k1", "new", 2L, false), // update
      ("k3", null.asInstanceOf[String], 2L, true), // delete
      ("k4", "ins", 2L, false)) // insert
      .toDF("key", "value", "version", "is_deleted")
    val out = Guards.applyChanges(base, changes, Seq("key"), "version",
      deletedCol = Some("is_deleted"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("k1" -> "new", "k2" -> "keep", "k4" -> "ins"))
  }

  test("state as-of reads return the last write at or before the version") {
    import graft.operators.Guards
    val writes = Seq(
      ("k1", "v1", 10L), ("k1", "v2", 20L), ("k1", "v3", 30L),
      ("k2", "w1", 25L)).toDF("key", "value", "version")
    val at20 = Guards.stateAsOf(writes, Seq("key"), "version", 20L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(at20 == Map("k1" -> "v2")) // k2's first write is after 20
    val at30 = Guards.stateAsOf(writes, Seq("key"), "version", 30L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(at30 == Map("k1" -> "v3", "k2" -> "w1"))
  }

  test("webhook server triggers entry-point executions over HTTP (S13)") {
    import graft.streaming.{EntryPoints, WebhookServer}
    val runtime = new EntryPoints.EntryPointRuntime()
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    runtime.register(EntryPoints.EntryPointSpec("ingest"),
      (df: DataFrame) => {
        df.collect().foreach(r => received.add(r.mkString(",")))
        df
      })
    val server = new WebhookServer(spark, runtime)
    val port = server.start()
    try {
      def post(path: String, body: String): Int = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        conn.getResponseCode
      }
      assert(post("/hooks/ingest", """{"order_id": 42, "source": "webhook"}""") == 202)
      assert(post("/hooks/nonexistent", "{}") == 404)
      val deadline = System.currentTimeMillis() + 30000
      while (received.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(received.size == 1 && received.peek().contains("42"))
      assert(server.acceptedCount == 1)
      // GET rejected
      val conn = new java.net.URL(s"http://127.0.0.1:$port/hooks/ingest")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 405)
    } finally { server.stop(); runtime.shutdown() }
  }

  test("webhook HMAC auth: signed entry points reject unsigned callers (S13)") {
    import graft.streaming.{EntryPoints, WebhookServer}
    val runtime = new EntryPoints.EntryPointRuntime()
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    runtime.register(EntryPoints.EntryPointSpec("secure"),
      (df: DataFrame) => { hits.incrementAndGet(); df })
    runtime.register(EntryPoints.EntryPointSpec("open"),
      (df: DataFrame) => df)
    val server = new WebhookServer(spark, runtime,
      secrets = Map("secure" -> "hunter2"))
    val port = server.start()
    try {
      def post(path: String, body: String, sig: Option[String]): Int = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        sig.foreach(s => conn.setRequestProperty("X-Hub-Signature-256", s))
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        conn.getResponseCode
      }
      val body = """{"k": 1}"""
      // unsigned, malformed-header, and wrong-secret callers all get 401
      assert(post("/hooks/secure", body, None) == 401)
      assert(post("/hooks/secure", body, Some("nonsense")) == 401)
      assert(post("/hooks/secure", body,
        Some("sha256=" + WebhookServer.hmacSha256Hex("wrong", body.getBytes("UTF-8")))) == 401)
      // a signature of DIFFERENT body bytes is rejected too
      assert(post("/hooks/secure", body,
        Some("sha256=" + WebhookServer.hmacSha256Hex("hunter2", "{}".getBytes("UTF-8")))) == 401)
      assert(hits.get() == 0) // nothing reached the runtime
      // the legitimate signature is accepted
      assert(post("/hooks/secure", body,
        Some("sha256=" + WebhookServer.hmacSha256Hex("hunter2", body.getBytes("UTF-8")))) == 202)
      // secretless entry points stay open
      assert(post("/hooks/open", body, None) == 202)
    } finally { server.stop(); runtime.shutdown() }
  }

  test("executor lifecycle events flow through the event bus (integration)") {
    import graft.streaming.{AgentEvent, EventBus, Subscription}
    val bus = new EventBus(spark)
    try {
      bus.subscribe("failures", Subscription(eventTypes = Set("node_failed")))
      bus.subscribe("lifecycle", Subscription(eventTypes = Set("node_started", "node_completed")))
      val spec = GraphSpec(
        nodes = Seq(NodeSpec("ok"), NodeSpec("boom"), NodeSpec("sink")),
        edges = Seq(EdgeSpec("ok", "boom"), EdgeSpec("boom", "sink")),
        entryNode = "ok", terminalNodes = Seq("sink"),
        maxRetriesPerNode = 0, failurePolicy = "continue_others")
      val registry: GraphExecutor.Registry = Map(
        "boom" -> ((_: DataFrame) => throw new RuntimeException("kaput")))
      GraphExecutor.run(spec, Seq(1).toDF("x"), registry,
        onEvent = (t, n) => bus.publish(AgentEvent(t, "run1", n)))
      bus.flush()
      val failures = bus.received("failures").collect()
      assert(failures.length == 1 && failures.head.getAs[String]("node_id") == "boom")
      val lifecycle = bus.received("lifecycle")
        .collect().map(r => (r.getAs[String]("event_type"), r.getAs[String]("node_id")))
      assert(lifecycle.contains(("node_started", "ok")))
      assert(lifecycle.contains(("node_completed", "ok")))
      assert(!lifecycle.contains(("node_completed", "boom")))
    } finally bus.stop()
  }

  test("graph pause + resume round-trip preserves pre-pause terminal outputs (ST5/ST6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // a fans out to an early terminal t1 AND to b; pause lands before b,
    // after t1 has already produced output — resume must not lose t1
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("a"), NodeSpec("t1"), NodeSpec("b"), NodeSpec("c")),
      edges = Seq(EdgeSpec("a", "t1"), EdgeSpec("a", "b"), EdgeSpec("b", "c")),
      entryNode = "a", terminalNodes = Seq("t1", "c"))
    val registry: GraphExecutor.Registry = Map(
      "a" -> ((df: DataFrame) => df.withColumn("a_done", lit(true))),
      "b" -> ((df: DataFrame) => df.withColumn("b_done", lit(true))))
    val input = Seq(1L, 2L, 3L).toDF("x")
    val paused = GraphExecutor.run(spec, input, registry,
      pauseBefore = Set("b"), checkpointDir = Some(dir))
    assert(paused.pausedAt.contains("b"))
    val resumed = GraphExecutor.resume(spec, spark, dir, registry)
    assert(resumed.pausedAt.isEmpty)
    assert(resumed.terminalOutputs("t1").count() == 3) // pre-pause terminal survived
    val out = resumed.terminalOutputs("c")
    assert(out.count() == 3)
    assert(out.columns.toSet == Set("x", "a_done", "b_done"))
  }

  test("periodic durable checkpoints, blocking and async (`executor.py:560-607`)") {
    for (async <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory("graft-durable").toString
      val spec = GraphSpec(
        nodes = Seq(NodeSpec("a"), NodeSpec("b"), NodeSpec("c"), NodeSpec("d")),
        edges = Seq(EdgeSpec("a", "b"), EdgeSpec("b", "c"), EdgeSpec("c", "d")),
        entryNode = "a", terminalNodes = Seq("d"))
      val registry: GraphExecutor.Registry = Map(
        "b" -> ((df: DataFrame) => df.withColumn("b_done", lit(true))),
        "c" -> ((df: DataFrame) => df.withColumn("c_done", lit(true))))
      var saves = 0
      val done = GraphExecutor.run(spec, Seq(1L, 2L).toDF("x"), registry,
        checkpointDir = Some(dir), durableCheckpointEvery = 2,
        asyncCheckpointSave = async,
        onEvent = (t, _) => if (t == "checkpoint_saved") saves += 1)
      assert(done.pausedAt.isEmpty && done.terminalOutputs("d").count() == 2)
      assert(saves == 2, s"expected saves at steps 2 and 4, got $saves") // 4 steps, every 2
      // the snapshot on disk is resumable mid-run: the last save (after
      // step 4, terminal reached) resumes to the identical result
      val resumed = GraphExecutor.resume(spec, spark, dir, registry)
      assert(resumed.terminalOutputs("d").count() == 2)
      assert(resumed.terminalOutputs("d").columns.toSet == Set("x", "b_done", "c_done"))
    }
  }

  test("typed HITL protocol: request emitted at pause, response gates resume (`hitl.py:13-223`)") {
    import graft.graph.Hitl
    val dir = java.nio.file.Files.createTempDirectory("graft-hitl").toString
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("ingest"), NodeSpec("review"), NodeSpec("publish")),
      edges = Seq(EdgeSpec("ingest", "review"), EdgeSpec("review", "publish")),
      entryNode = "ingest", terminalNodes = Seq("publish"))
    // the review node routes on the human's selection + approval
    val registry: GraphExecutor.Registry = Map(
      "review" -> ((df: DataFrame) =>
        df.filter(col("hitl_approve") === "yes")
          .withColumn("tier", col("hitl_tier"))))

    val request = Hitl.createRequest(
      objective = "publish the ingested batch?",
      questions = Seq(
        Hitl.HitlQuestion("approve", "Approve this batch?", inputType = "approval"),
        Hitl.HitlQuestion("tier", "Which tier?", inputType = "selection",
          options = Seq("gold", "silver"))),
      nodeId = "review")

    val paused = Hitl.pauseWithRequest(spec, Seq(1L, 2L).toDF("x"), registry, dir, request)
    assert(paused.pausedAt.contains("review"))
    // the request is persisted and queryable as rows
    assert(Hitl.readRequest(dir).contains(request))
    val rows = Hitl.requestRows(spark, request)
    assert(rows.count() == 2)
    val selRow = rows.filter(col("input_type") === "selection").head()
    assert(selRow.getSeq[String](selRow.fieldIndex("options")) == Seq("gold", "silver"))

    // invalid responses are rejected: bad selection, missing required
    val badSel = Hitl.HitlResponse(request.requestId,
      Map("approve" -> "yes", "tier" -> "bronze"))
    assert(Hitl.validate(request, badSel).exists(_.contains("bronze")))
    intercept[GraphExecutor.GraphError] {
      Hitl.resumeWithResponse(spec, spark, dir, registry, badSel)
    }
    val missing = Hitl.HitlResponse(request.requestId, Map("approve" -> "yes"))
    assert(Hitl.validate(request, missing).exists(_.contains("tier")))

    // a valid response resumes; answers surface as hitl_* columns
    val ok = Hitl.HitlResponse(request.requestId,
      Map("approve" -> "yes", "tier" -> "gold"))
    val resumed = Hitl.resumeWithResponse(spec, spark, dir, registry, ok)
    assert(resumed.pausedAt.isEmpty)
    val out = resumed.terminalOutputs("publish")
    assert(out.count() == 2)
    assert(out.select("tier").distinct().head().getString(0) == "gold")
    assert(Hitl.readResponse(dir).contains(ok))
  }

  test("conversation segment store: parts, cursor, compaction (`conversation_store.py:27-110`)") {
    import graft.io.ConversationStore
    val base = java.nio.file.Files.createTempDirectory("graft-conv").toString + "/conv1"
    val store = new ConversationStore(spark, base)
    assert(store.readParts().isEmpty && store.partSeqs.isEmpty)

    // five appended parts, ~100 tokens each
    (0L to 4L).foreach { s =>
      store.writePart(s, Seq((s"msg$s", 100L)).toDF("content", "tokens"))
    }
    assert(store.partSeqs == Seq(0L, 1L, 2L, 3L, 4L))
    val all = store.readParts().get
    assert(all.count() == 5)
    assert(all.columns.contains("seq")) // partition column surfaces

    // cursor read is partition-pruned: only newer part dirs are scanned
    val fromCursor = store.readParts(fromSeq = 3L).get
    assert(fromCursor.count() == 2)
    val plan = fromCursor.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(seq") || plan.contains("(seq"),
      s"expected partition filters in:\n$plan")

    // meta + cursor docs round-trip
    store.writeMeta(Map("graph_id" -> "g1"))
    store.writeCursor(Map("watermark_seq" -> "2"))
    assert(store.readMeta.contains(Map("graph_id" -> "g1")))
    assert(store.readCursor.contains(Map("watermark_seq" -> "2")))

    // explicit compaction drops old partitions, keeps the rest readable
    assert(store.deletePartsBefore(2L) == 2)
    assert(store.partSeqs == Seq(2L, 3L, 4L))
    assert(store.readParts().get.count() == 3)

    // budget compaction keeps the newest parts within the token budget
    val (dropped, watermark) = store.compactToBudget("tokens", budget = 250L)
    assert(dropped == 1 && watermark == 3L) // parts 3,4 = 200 <= 250; part 2 dropped
    assert(store.partSeqs == Seq(3L, 4L))
    assert(store.readCursor.contains(Map("watermark_seq" -> "3")))

    store.destroy()
    assert(store.readParts().isEmpty)
  }

  test("HITL format_for_display renders all request sections (`hitl.py:222-255`)") {
    import graft.graph.Hitl
    val req = Hitl.HitlRequest(
      objective = "ship it?",
      instructions = "answer carefully",
      questions = Seq(
        Hitl.HitlQuestion("q1", "Approve?", inputType = "approval", helpText = "yes/no/modify"),
        Hitl.HitlQuestion("q2", "Tier?", inputType = "selection", options = Seq("gold", "silver"))),
      missingInfo = Seq("budget"),
      examples = Seq("yes, gold"))
    val s = Hitl.formatForDisplay(req)
    assert(s.contains("📋 Objective: ship it?"))
    assert(s.contains("📍 Current State: Awaiting clarification"))
    assert(s.contains("1. Approve?") && s.contains("💡 yes/no/modify"))
    assert(s.contains("2. Tier?") && s.contains("Options: gold, silver"))
    assert(s.contains("📝 Missing Information:") && s.contains("  • budget"))
    assert(s.contains("📚 Examples:") && s.contains("  • yes, gold"))
  }

  test("HITL parse_response: client-extracted JSON answers with raw-input fallback") {
    import graft.graph.Hitl
    import graft.llm.SemanticOps
    val request = Hitl.createRequest("objective",
      Seq(Hitl.HitlQuestion("q1", "First?"), Hitl.HitlQuestion("q2", "Second?")),
      nodeId = "n")
    // no client: raw input answers the first question (`hitl.py:167-172`)
    val noClient = Hitl.parseResponse("just do it", request)
    assert(noClient.answers == Map("q1" -> "just do it"))
    // a client that extracts structured answers
    val parsed = Hitl.parseResponse("yes, and silver", request,
      Some(SemanticOps.DeterministicStub(_ => """{"q1": "yes", "q2": "silver"}""")))
    assert(parsed.answers == Map("q1" -> "yes", "q2" -> "silver"))
    // a client that returns garbage falls back
    val garbage = Hitl.parseResponse("hmm", request,
      Some(SemanticOps.DeterministicStub(_ => "no json here")))
    assert(garbage.answers == Map("q1" -> "hmm"))
  }
}
