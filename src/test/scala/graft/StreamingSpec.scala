package graft

import org.apache.spark.sql.functions._
import graft.streaming.{AgentEvent, EventBus, StreamOps, Subscription}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("event bus: filtered pub/sub delivers only matching events") {
    val bus = new EventBus(spark)
    try {
      bus.subscribe("errors_s1", Subscription(
        eventTypes = Set("node_failed"), streamId = Some("s1")))
      bus.publish(
        AgentEvent("node_started", "s1", "n1"),
        AgentEvent("node_failed", "s1", "n1"),
        AgentEvent("node_failed", "s2", "n2"), // wrong stream
        AgentEvent("node_completed", "s1", "n1"))
      bus.flush()
      val got = bus.received("errors_s1").collect()
      assert(got.length == 1)
      assert(got.head.getAs[String]("event_type") == "node_failed")
      assert(got.head.getAs[String]("stream_id") == "s1")
    } finally bus.stop()
  }

  test("event bus: history is newest-first and bounded") {
    val bus = new EventBus(spark)
    try {
      bus.subscribe("all", Subscription())
      bus.publish((1 to 30).map(i => AgentEvent(s"e$i", "s")): _*)
      bus.flush()
      val hist = bus.history("all", n = 10).collect()
      assert(hist.length == 10)
      assert(hist.head.getAs[String]("event_type") == "e30")
    } finally bus.stop()
  }

  test("event bus: bus-level recent history without explicit subscription") {
    val bus = new EventBus(spark)
    try {
      bus.publish(AgentEvent("a", "s"), AgentEvent("b", "s"))
      val recent = bus.recentEvents(10).collect()
      assert(recent.length == 2)
      assert(recent.head.getAs[String]("event_type") == "b") // newest first
    } finally bus.stop()
  }

  test("event bus: retention evicts at ingest, store never exceeds maxHistory") {
    val bus = new EventBus(spark, maxHistory = 25)
    try {
      bus.subscribe("all", Subscription())
      // publish in several micro-batches, well past the cap
      (1 to 4).foreach { wave =>
        bus.publish(((wave - 1) * 20 + 1 to wave * 20).map(i => AgentEvent(s"e$i", "s")): _*)
        bus.flush()
      }
      val kept = bus.received("all").collect()
      assert(kept.length == 25, s"store must hold exactly maxHistory, got ${kept.length}")
      // the newest 25 survive, the oldest 55 were evicted
      val types = kept.map(_.getAs[String]("event_type")).toSet
      assert(types == (56 to 80).map(i => s"e$i").toSet)
    } finally bus.stop()
  }

  test("event bus: single burst batch far larger than retention is bounded before collect") {
    // One publish + one flush = ONE micro-batch of 500 events against a
    // 10-row retention: the sink must keep only the newest 10 and must
    // bound the batch Spark-side (sort desc + limit) rather than pull
    // all 500 into the driver first.
    val bus = new EventBus(spark, maxHistory = 10)
    try {
      bus.subscribe("burst", Subscription())
      bus.publish((1 to 500).map(i => AgentEvent(s"e$i", "s")): _*)
      bus.flush()
      val kept = bus.received("burst").collect()
      assert(kept.length == 10, s"store must hold exactly maxHistory, got ${kept.length}")
      assert(kept.map(_.getAs[String]("event_type")).toSet ==
        (491 to 500).map(i => s"e$i").toSet)
      // order inside the buffer stays oldest→newest (append semantics)
      assert(kept.head.getAs[String]("event_type") == "e491")
      assert(kept.last.getAs[String]("event_type") == "e500")
    } finally bus.stop()
  }

  test("entry point driven by a real file streaming source (ST1)") {
    import graft.streaming.EntryPoints
    import org.apache.spark.sql.types._
    import scala.concurrent.ExecutionContext
    implicit val ec: ExecutionContext = ExecutionContext.global
    val dir = java.nio.file.Files.createTempDirectory("graft-filesrc").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", StringType)))
    val rt = new EntryPoints.EntryPointRuntime()
    try {
      rt.register(EntryPoints.EntryPointSpec("ingest", maxConcurrent = 2),
        df => df.filter(col("id") > 0))
      def drop(name: String, rows: Seq[String]): Unit = {
        val p = java.nio.file.Paths.get(dir, name)
        java.nio.file.Files.write(p, rows.mkString("\n").getBytes)
        ()
      }
      drop("a.json", Seq("""{"id": 1, "payload": "x"}""", """{"id": 2, "payload": "y"}"""))
      val q = rt.startStream("ingest",
        EntryPoints.fileSource(spark, dir, schema, maxFilesPerTrigger = 1))
      try {
        q.processAllAvailable()
        // the async execution may still be inside the admission gate
        val deadline = System.currentTimeMillis() + 10000
        def results = rt.stream("ingest").recentResults
        while (results.size < 1 && System.currentTimeMillis() < deadline) Thread.sleep(20)
        assert(results.size == 1 && results.head.success && results.head.rowCount == 2)
        // a second file landing later becomes a second execution
        drop("b.json", Seq("""{"id": -5, "payload": "skip"}""", """{"id": 7, "payload": "z"}"""))
        q.processAllAvailable()
        while (results.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
        assert(results.size == 2)
        assert(results.map(_.rowCount).sorted == Seq(1L, 2L))
      } finally q.stop()
    } finally rt.shutdown()
  }

  test("limitWithFlag reports truncation (O5, `bigquery_tool.py:226-233`)") {
    val events = graft.core.Engine.table(spark, sfDir, "events")
    val cut = graft.sql.TableSql.limitWithFlag(events, 10)
    assert(cut.truncated && cut.rows.count() == 10)
    val whole = graft.sql.TableSql.limitWithFlag(events.limit(5), 10)
    assert(!whole.truncated && whole.rows.count() == 5)
  }

  test("event bus: waitFor returns first match, times out cleanly") {
    val bus = new EventBus(spark)
    try {
      bus.publish(AgentEvent("boot", "s1"), AgentEvent("ready", "s1"))
      val hit = bus.waitFor(Subscription(eventTypes = Set("ready")), timeoutMs = 10000)
      assert(hit.exists(_.event_type == "ready"))
      val miss = bus.waitFor(Subscription(eventTypes = Set("never")), timeoutMs = 300)
      assert(miss.isEmpty)
    } finally bus.stop()
  }

  test("file-stream windowed aggregation matches batch result") {
    // file-source streaming needs a directory of files
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.read.parquet(dir.toString)
    val q = StreamOps.runFileStream(spark, dir.toString, raw.schema, "win_sink")
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_sink")
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
      val batch = StreamOps.windowedCounts(
        graft.core.Engine.table(spark, sfDir, "events"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
    } finally q.stop()
  }

  test("ts normalization covers both physical forms: epoch-nanos long and TIMESTAMP_NTZ") {
    // the driver's testdata has shipped `ts` two ways over time:
    // epoch-nanos int64 (legacy, read with nanosAsLong) and
    // timestamp[us] without the UTC flag (read as TIMESTAMP_NTZ).
    // Streaming withWatermark rejects both raw forms — normalizeTs
    // must turn each into TimestampType with identical values.
    val base = java.time.Instant.parse("2024-03-01T10:15:00Z")
    val instants = Seq(0L, 600L, 3600L, 7200L).map(s => base.plusSeconds(s))

    def stream(dir: java.nio.file.Path, sink: String): Unit = {
      val raw = spark.read.parquet(dir.toString)
      val q = StreamOps.runFileStream(spark, dir.toString, raw.schema, sink)
      try {
        q.processAllAvailable()
        val got = spark.table(sink)
          .select(col("window.start").cast("long").as("ws"), col("n"))
          .as[(Long, Long)].collect().toMap
        // events at 10:15/10:25/11:15/12:15 → windows 10:00 (2), 11:00 (1), 12:00 (1)
        val tenOClock = base.minusSeconds(900).getEpochSecond
        assert(got == Map(
          tenOClock -> 2L, (tenOClock + 3600) -> 1L, (tenOClock + 7200) -> 1L))
      } finally q.stop()
    }

    val nanosDir = java.nio.file.Files.createTempDirectory("graft-ts-nanos")
    instants.map(i => (i.getEpochSecond * 1000000000L, "e", 1.0))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(nanosDir.toString)
    assert(spark.read.parquet(nanosDir.toString).schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    stream(nanosDir, "ts_sink_nanos")

    val ntzDir = java.nio.file.Files.createTempDirectory("graft-ts-ntz")
    instants.map(i => (java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC), "e", 1.0))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(ntzDir.toString)
    assert(spark.read.parquet(ntzDir.toString).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    stream(ntzDir, "ts_sink_ntz")
  }

  test("incremental run metrics update across micro-batches (A8, `run.py:45-66`)") {
    val bus = new EventBus(spark)
    try {
      val agg = StreamOps.incrementalRunMetrics(
        bus.events.toDF(), "stream_id", col("event_type") === "ok", "ts")
      val q = agg.writeStream.format("memory").queryName("run_metrics")
        .outputMode("complete").start()
      bus.publish(AgentEvent("ok", "r1"), AgentEvent("fail", "r1"))
      q.processAllAvailable()
      val first = spark.table("run_metrics").filter(col("stream_id") === "r1").head()
      assert(first.getAs[Long]("n_total") == 2 && first.getAs[Long]("n_success") == 1)
      bus.publish(AgentEvent("ok", "r1")) // incremental update, state carried
      q.processAllAvailable()
      val second = spark.table("run_metrics").filter(col("stream_id") === "r1").head()
      assert(second.getAs[Long]("n_total") == 3 && second.getAs[Long]("n_success") == 2)
      q.stop()
    } finally bus.stop()
  }

  test("csv_sql / parquet_sql surface: data view + gate (`csv_tool.py:274-386`)") {
    val p = java.nio.file.Files.createTempDirectory("graft-sql").toString + "/t.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "category,price\na,10\nb,20\na,30\n")
    val out = graft.sql.TableSql.csvSql(spark, p,
      "SELECT category, count(*) AS n, avg(price) AS avg_price FROM data GROUP BY category ORDER BY category")
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("a", 2L, 20.0), ("b", 1L, 20.0)))
    intercept[graft.sql.QueryGate.RejectedQuery] {
      graft.sql.TableSql.csvSql(spark, p, "DROP TABLE data")
    }
  }

  test("streaming stall detector: state carries the window across micro-batches (W1)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, String)](spark)
    val q = StreamOps.streamingStallDetector(input.toDS(), threshold = 3)
      .writeStream.format("memory").queryName("stall_sink")
      .outputMode("append").start()
    try {
      input.addData(("u1", "same"), ("u1", "same"))
      q.processAllAvailable()
      assert(spark.table("stall_sink").count() == 0) // only 2 so far
      input.addData(("u1", "same"), ("u2", "x")) // 3rd identical arrives in a later batch
      q.processAllAvailable()
      val stalls = spark.table("stall_sink").collect()
      assert(stalls.length == 1)
      assert(stalls.head.getAs[String]("key") == "u1")
      input.addData(("u1", "different"), ("u1", "same"))
      q.processAllAvailable()
      assert(spark.table("stall_sink").count() == 1) // run broken, no new stall
    } finally q.stop()
  }

  test("streaming dedup: duplicates dropped across micro-batches via keyed state") {
    val bus = new EventBus(spark)
    try {
      val dedup = StreamOps.streamingDedup(bus.events.toDF(), Seq("event_type", "node_id"))
      val q = dedup.writeStream.format("memory").queryName("dedup_sink")
        .outputMode("append").start()
      bus.publish(AgentEvent("click", "s", "n1"), AgentEvent("click", "s", "n1"))
      q.processAllAvailable()
      bus.publish(AgentEvent("click", "s2", "n1"), AgentEvent("view", "s", "n2"))
      q.processAllAvailable() // click/n1 is a dup from batch 1 — state remembers
      val got = spark.table("dedup_sink")
        .select(col("event_type"), col("node_id")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(got.length == 2)
      assert(got.toSet == Set(("click", "n1"), ("view", "n2")))
      q.stop()
    } finally bus.stop()
  }

  test("streaming frequent items: MG summary merges across micro-batches, state bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String](spark)
    val freq = graft.streaming.StreamOps.streamingFrequentItems(
      input.toDF().toDF("item"), "item", capacity = 32)
    val q = freq.writeStream.format("memory").queryName("mg_sink")
      .outputMode("complete").start()
    input.addData(Seq.fill(30)("a") ++ Seq.fill(10)("b"))
    q.processAllAvailable()
    input.addData(Seq.fill(20)("a") ++ Seq.fill(5)("c"))
    q.processAllAvailable()
    val got = spark.table("mg_sink").selectExpr("explode(mg)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // capacity 32 > 3 distinct → exact counts across both batches
    assert(got == Map("a" -> 50L, "b" -> 10L, "c" -> 5L), s"got $got")
    q.stop()
  }

  test("streaming anomaly flags: window state spans micro-batches, matches batch form") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Long, Double)](spark)
    val q = StreamOps.streamingAnomalyFlags(input.toDS(), window = 4, z = 2.0)
      .writeStream.format("memory").queryName("anom_sink")
      .outputMode("append").start()
    try {
      // cold start: 3 values — even an extreme one is not flagged
      input.addData(("u1", 0L, 10.0), ("u1", 1L, 10.5), ("u1", 2L, 500.0))
      q.processAllAvailable()
      assert(spark.table("anom_sink").count() == 0, "cold start must not flag")
      // 4th fills the window; the spike at seq 4 is judged against
      // {10, 10.5, 500, 10} — state that spans both micro-batches
      input.addData(("u1", 3L, 10.0), ("u1", 4L, 2000.0), ("u2", 0L, 9.9))
      q.processAllAvailable()
      val hits = spark.table("anom_sink").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Long]("seq")))
      assert(hits.toSeq == Seq(("u1", 4L)), s"got ${hits.toSeq}")
      // batch parity on the same ordered input
      val batch = graft.operators.Analytics.anomalyFlags(
        Seq(("u1", 0L, 10.0), ("u1", 1L, 10.5), ("u1", 2L, 500.0),
          ("u1", 3L, 10.0), ("u1", 4L, 2000.0), ("u2", 0L, 9.9))
          .toDF("key", "seq", "value"),
        Seq("key"), "seq", "value", window = 4, z = 2.0)
        .filter(col("anomaly"))
        .select(col("key"), col("seq"), col("zscore")).collect()
      assert(batch.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("u1", 4L)))
      val streamZ = spark.table("anom_sink").collect().head.getAs[Double]("zscore")
      assert(streamZ == batch.head.getDouble(2),
        "stream and batch must agree on the rounded zscore bit-for-bit")
    } finally q.stop()
  }

  test("streaming distinct estimate: the emitted sketch equals the batch KMV of all input") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String](spark)
    val q = StreamOps.streamingDistinctEstimate(
        input.toDF().toDF("item"), "item", k = 64)
      .writeStream.format("memory").queryName("kmv_sink")
      .outputMode("complete").start()
    try {
      input.addData((1 to 30).map(i => s"u$i"): _*)
      q.processAllAvailable()
      input.addData((21 to 50).map(i => s"u$i"): _*) // 20 overlap
      q.processAllAvailable()
      val sketch = spark.table("kmv_sink").head().getSeq[Long](0)
      val batch = (1 to 50).map(i => s"u$i").toDF("item")
        .select(graft.operators.TextOps.portableHash(col("item"), "kmv").as("h"))
        .as[Long].select(graft.operators.Aggregators.kmv(64).toColumn).head()
      assert(sketch == batch.toSeq,
        "stream-folded sketch must equal the batch sketch of the union")
      assert(sketch.length == 50, "below k: the sketch IS the distinct set")
    } finally q.stop()
  }

  test("streaming quantile sketch: below capacity the fold IS the sorted input") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[Double](spark)
    val q = StreamOps.streamingQuantileSketch(
        input.toDF().toDF("v"), "v", k = 256)
      .writeStream.format("memory").queryName("kll_sink")
      .outputMode("complete").start()
    try {
      val rnd = new scala.util.Random(3)
      val b1 = Array.fill(100)(rnd.nextDouble() * 50)
      val b2 = Array.fill(100)(rnd.nextDouble() * 50)
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
      val sketch = spark.table("kll_sink").head()
        .getSeq[scala.collection.Seq[Double]](0)
        .map(_.toArray).toArray
      val all = (b1 ++ b2).sorted
      assert(sketch.map(_.length).sum == 200,
        "below capacity nothing compacts across micro-batches")
      assert(sketch(0).toSeq == all.toSeq, "level 0 IS the sorted input")
      for (qq <- Seq(0.25, 0.5, 0.75)) {
        val exact = all(math.max(1, math.ceil(qq * 200).toInt) - 1)
        assert(graft.operators.Aggregators.kllQuantile(sketch, qq) == exact,
          s"q=$qq must be exact below capacity")
      }
    } finally q.stop()
  }

  test("streaming image-ingest dedup: batch-vs-store pairs, store grows per generation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    def noise(i: Int)(x: Int, y: Int): Int =
      gray((((x / 4) * 73856093) ^ ((y / 4) * 19349663) ^ ((i + 1) * 83492791)) & 0xff)
    val store = java.nio.file.Files.createTempDirectory("graft-imgstore").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-imgckpt").toString
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = StreamOps.streamingImageDedupIngest(
      input.toDF().toDF("img_id", "content"), "img_id", "content", store, ckpt)
    try {
      // batch 0: two unrelated images
      input.addData((1L, M.renderPng(32, 32, noise(1))),
        (2L, M.renderPng(32, 32, noise(2))))
      q.processAllAvailable()
      // batch 1: a resize twin of image 1 + a fresh image + an
      // in-batch twin pair (4, 5)
      input.addData(
        (3L, M.renderPng(64, 64, (x, y) => noise(1)(x / 2, y / 2))),
        (4L, M.renderPng(32, 32, noise(7))),
        (5L, M.renderPng(64, 64, (x, y) => noise(7)(x / 2, y / 2))))
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$store/pairs").drop("batch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 3L), (4L, 5L)),
        s"batch-vs-store and batch-vs-batch twins only: $pairs")
      val sigs = spark.read.parquet(s"$store/sigs")
      assert(sigs.count() == 5, "every decodable image's signature is stored")
      assert(sigs.select("batch").distinct().count() == 2,
        "one generation dir per micro-batch")
    } finally q.stop()
  }

  test("streaming art-link ingest: audio joins the image it shares art with, batch by batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val logo = M.renderPng(32, 16, (x, _) => if (x < 16) gray(25) else gray(230))
    val other = M.renderPng(32, 16, (x, _) => if (x % 4 == 0) gray(230) else gray(25))
    val store = java.nio.file.Files.createTempDirectory("graft-artstore").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-artckpt").toString
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = StreamOps.streamingArtLinkIngest(
      input.toDF().toDF("asset_id", "content"), "asset_id", "content",
      store, ckpt)
    try {
      // batch 0: the crawled artwork + an unrelated image
      input.addData((1L, logo), (2L, other))
      q.processAllAvailable()
      // batch 1: an MP3 and an MKA both carrying the logo as art —
      // they link to the stored image AND to each other
      input.addData(
        (3L, M.syntheticId3(4, "T", "A", "B",
          apic = Some(("image/png", logo))) ++
          M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
        (4L, M.syntheticWebm("audio", channels = 2, sampleRate = 48000,
          durationMs = 100L, codec = "A_OPUS", docType = "matroska",
          attachedArt = Some(("image/png", logo)))))
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$store/pairs").drop("batch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 3L), (1L, 4L), (3L, 4L)),
        s"art must link audio to the image and to each other: $pairs")
      // the store is stamped with the composed kernel's identity
      val meta = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(store, "store_meta.json")), "UTF-8")
      assert(meta.contains(M.MediaLinkHashSignatureName))
    } finally q.stop()
  }

  test("streaming signature-ingest dedup: the generic loop runs the audio modality") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val M = graft.operators.Multimodal
    def amSquare(n: Int, gain: Int): Array[Short] =
      Array.tabulate[Short](n) { i =>
        val a = (100 + i) * gain
        (if (i % 2 == 0) a else -a).toShort
      }
    val store = java.nio.file.Files.createTempDirectory("graft-audstore").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-audckpt").toString
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = StreamOps.streamingSignatureDedupIngest(
      input.toDF().toDF("clip_id", "content"), "clip_id", "content",
      M.audioHash64Col, M.AudioHashSignatureName, store, ckpt)
    try {
      val rnd = new scala.util.Random(13)
      val noise = Array.fill[Short](900)((rnd.nextInt(4000) - 2000).toShort)
      input.addData((1L, M.renderWav(8000, 1, amSquare(900, 1))),
        (2L, M.renderWav(8000, 1, noise)))
      q.processAllAvailable()
      // batch 1: a gain twin of clip 1 (Hamming 0) + junk (sig null,
      // dropped, never stored)
      input.addData((3L, M.renderWav(8000, 1, amSquare(900, 3))),
        (4L, "junk".getBytes("UTF-8")))
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$store/pairs").drop("batch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 3L)), s"gain twin across batches only: $pairs")
      assert(spark.read.parquet(s"$store/sigs").count() == 3,
        "non-decodable rows never enter the store")
      // the store is stamped with the kernel version at creation
      val meta = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(store, "store_meta.json")), "UTF-8")
      assert(meta.contains(s""""signature":"${M.AudioHashSignatureName}""""),
        s"store must be stamped with the kernel version: $meta")
    } finally q.stop()

    // a later ingest running a DIFFERENT kernel version must refuse the
    // store — joining new signatures against an incompatible persisted
    // framing silently misses duplicates, the exact failure versioning
    // exists to prevent
    val input2 = MemoryStream[(Long, Array[Byte])](spark)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-audckpt2").toString
    val q2 = StreamOps.streamingSignatureDedupIngest(
      input2.toDF().toDF("clip_id", "content"), "clip_id", "content",
      M.audioHash64Col, "audiohash64/99", store, ckpt2)
    try {
      input2.addData((9L, M.renderWav(8000, 1, amSquare(900, 1))))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(err.getMessage.contains("audiohash64/2") ||
        Option(err.getCause).exists(_.getMessage.contains("audiohash64/2")),
        s"refusal must name the stamped kernel: ${err.getMessage}")
    } finally q2.stop()
  }

  test("streaming signature-ingest dedup: EXACT video fingerprints, 0-bit gate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val M = graft.operators.Multimodal
    def sample(i: Int): Array[Byte] =
      Array.tabulate[Byte](50 + i)(j => ((i * 19 + j * 5 + 2) & 0xff).toByte)
    val samples = (0 until 4).map(sample)
    val other = (0 until 4).map(i => sample(i + 9))
    val store = java.nio.file.Files.createTempDirectory("graft-vidstore").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vidckpt").toString
    val input = MemoryStream[(Long, Array[Byte])](spark)
    // maxHamming 0 / bands 1: the banded join degenerates to plain
    // equality on the whole fingerprint — exact dedup through the SAME
    // ingest loop the perceptual modalities ride
    val q = StreamOps.streamingSignatureDedupIngest(
      input.toDF().toDF("video_id", "content"), "video_id", "content",
      M.videoFingerprint64Col, M.VideoFingerprintSignatureName, store, ckpt,
      maxHamming = 0, bands = 1)
    try {
      input.addData(
        (1L, M.syntheticMjpegMp4(samples, codec = "avc1")),
        (2L, M.syntheticMjpegMp4(other, codec = "avc1")))
      q.processAllAvailable()
      // batch 1: a re-mux of video 1 (chunk layout + timescale differ,
      // sample bytes identical) + junk (null fingerprint, dropped)
      input.addData(
        (3L, M.syntheticMjpegMp4(samples, codec = "avc1", timescale = 600,
          samplesPerChunk = 3)),
        (4L, "junk".getBytes("UTF-8")))
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$store/pairs").drop("batch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 3L)), s"re-mux twin across batches only: $pairs")
      assert(spark.read.parquet(s"$store/sigs").count() == 3,
        "junk never enters the store")
      val meta = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(store, "store_meta.json")), "UTF-8")
      assert(meta.contains(s""""signature":"${M.VideoFingerprintSignatureName}""""))
    } finally q.stop()
  }

  test("streaming media card: generation partials re-sum to the batch card exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val M = graft.operators.Multimodal
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val png = M.renderPng(20, 10, (_, _) => gray(100))
    val wav = M.renderWav(8000, 1,
      Array.tabulate[Short](800)(i => if (i % 2 == 0) 9000 else -9000))
    val mp4 = M.syntheticMjpegMp4(
      Seq(M.renderJpeg(16, 8, (_, _) => gray(99))), syncEvery = 1)
    val junk = "nope".getBytes("UTF-8")
    val store = java.nio.file.Files.createTempDirectory("graft-mcstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mcsckpt").toString
    val input = MemoryStream[(String, Array[Byte])](spark)
    val q = StreamOps.streamingMediaCardIngest(
      input.toDF().toDF("source", "content"), "content", "source",
      store, ckpt)
    val all =
      try {
        input.addData(("s1", png), ("s1", wav), ("s2", junk))
        q.processAllAvailable()
        input.addData(("s2", mp4), ("s1", png), ("s2", wav))
        q.processAllAvailable()
        Seq(("s1", png), ("s1", wav), ("s2", junk),
          ("s2", mp4), ("s1", png), ("s2", wav))
      } finally q.stop()
    // one generation dir per micro-batch, O(groups) rows each
    val partials = spark.read.parquet(s"$store/partials")
    assert(partials.select("batch").distinct().count() == 2)
    def cardMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[java.lang.Double]("value"))).toMap
    val streamCard = cardMap(StreamOps.streamingMediaCard(spark, store, "source"))
    val batchCard = cardMap(M.mediaCard(
      all.toDF("source", "content"), "content", "source"))
    assert(streamCard == batchCard,
      s"stream must equal batch on every (group, metric) incl. nulls")
  }

  test("media-card store compaction: card unchanged, generations fold, crash leftovers never double-count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val M = graft.operators.Multimodal
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val png = M.renderPng(20, 10, (_, _) => gray(100))
    val wav = M.renderWav(8000, 1,
      Array.tabulate[Short](800)(i => if (i % 2 == 0) 9000 else -9000))
    val junk = "nope".getBytes("UTF-8")
    val store = java.nio.file.Files.createTempDirectory("graft-mccomp").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mccompck").toString
    val input = MemoryStream[(String, Array[Byte])](spark)
    val q = StreamOps.streamingMediaCardIngest(
      input.toDF().toDF("source", "content"), "content", "source",
      store, ckpt)
    try {
      input.addData(("s1", png), ("s2", junk))
      q.processAllAvailable()
      input.addData(("s1", wav), ("s2", png))
      q.processAllAvailable()
      input.addData(("s2", wav), ("s1", png))
      q.processAllAvailable()
    } finally q.stop()
    def cardMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[java.lang.Double]("value"))).toMap
    def genDirs() = new java.io.File(s"$store/partials").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName).sorted
    val before = cardMap(StreamOps.streamingMediaCard(spark, store, "source"))
    assert(genDirs().length == 3)
    // fold: all but the NEWEST generation (replay safety) compact
    val folded = StreamOps.compactMediaCardStore(spark, store)
    assert(folded == 2, s"batches 0 and 1 fold, 2 stays: $folded")
    assert(genDirs().toSeq == Seq("batch=2"), s"${genDirs().toSeq}")
    assert(cardMap(StreamOps.streamingMediaCard(spark, store, "source")) == before,
      "card identical after compaction")
    // idempotent: nothing left to fold
    assert(StreamOps.compactMediaCardStore(spark, store) == 0)
    assert(cardMap(StreamOps.streamingMediaCard(spark, store, "source")) == before)
    // crash-after-flip simulation: a folded generation dir left behind
    // (GC interrupted) is filtered by the covered watermark — the
    // reader NEVER double-counts it, and re-running compaction GCs it
    M.mediaCardSignals(Seq(("s1", png)).toDF("source", "content"),
      "content", "source").write.parquet(s"$store/partials/batch=1")
    assert(cardMap(StreamOps.streamingMediaCard(spark, store, "source")) == before,
      "covered leftovers are invisible to readers")
    assert(StreamOps.compactMediaCardStore(spark, store) == 0)
    assert(genDirs().toSeq == Seq("batch=2"), "re-run finishes the GC")
    assert(cardMap(StreamOps.streamingMediaCard(spark, store, "source")) == before)
    // a NEW generation beyond the watermark still counts
    M.mediaCardSignals(Seq(("s3", wav)).toDF("source", "content"),
      "content", "source").write.parquet(s"$store/partials/batch=3")
    val after = cardMap(StreamOps.streamingMediaCard(spark, store, "source"))
    assert(after(("s3", "pct_audio")) == Some(1.0))
    assert(after(("s1", "pct_image")) == before(("s1", "pct_image")))
  }

  test("signature-store compaction: generations fold, old dups still found, crash resume completes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val M = graft.operators.Multimodal
    def gray(v: Int) = (v << 16) | (v << 8) | v
    def stripes(x: Int, y: Int) = if (x % 8 >= 4) gray(230) else gray(20)
    def blocks(x: Int, y: Int) = if ((x / 16 + y / 16) % 2 == 0) gray(240) else gray(10)
    val pA = M.renderPng(64, 64, stripes)
    val pB = M.renderPng(64, 64, blocks)
    val pC = M.renderPng(64, 64, (x, _) => gray((x * 4) % 256))
    val store = java.nio.file.Files.createTempDirectory("graft-sigcomp").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sigcompck").toString
    val input = MemoryStream[(Long, Array[Byte])](spark)
    def ingest() = StreamOps.streamingImageDedupIngest(
      input.toDF().toDF("img_id", "content"), "img_id", "content", store, ckpt)
    val q = ingest()
    try {
      input.addData((1L, pA)); q.processAllAvailable()
      input.addData((2L, pB)); q.processAllAvailable()
      input.addData((3L, pC)); q.processAllAvailable()
    } finally q.stop()
    def sigDirs() = new java.io.File(s"$store/sigs").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(sigDirs() == Seq("batch=0", "batch=1", "batch=2"))
    // maintenance window: fold batches 0+1 into batch=0; newest stays
    assert(StreamOps.compactSignatureStore(spark, store) == 2)
    assert(sigDirs() == Seq("batch=0", "batch=2"))
    assert(spark.read.parquet(s"$store/sigs").count() == 3,
      "all three signatures survive the fold")
    // idempotent: one candidate left is not worth folding
    assert(StreamOps.compactSignatureStore(spark, store) == 0)
    // the ingest RESUMES on the same checkpoint and still finds a
    // duplicate whose signature lives only in the compacted generation
    val q2 = ingest()
    try {
      input.addData((4L, pA)) // same pixels as batch-0's image 1
      q2.processAllAvailable()
    } finally q2.stop()
    val pairs = spark.read.parquet(s"$store/pairs").drop("batch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 4L)), s"compacted signatures must still pair: $pairs")
    // crash-resume: simulate an interrupted swap — the merged staging
    // dir exists, the target generation is gone; a re-run finishes the
    // swap before considering new work
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$store/sigs/batch=0"),
      new org.apache.hadoop.fs.Path(s"$store/.compact_sigs_0_1")))
    // the re-run FIRST completes the swap (batch=0 restored), THEN
    // folds the now-eligible [0, 2] pair into batch=0
    assert(StreamOps.compactSignatureStore(spark, store) == 2)
    assert(sigDirs() == Seq("batch=0", "batch=3"), s"${sigDirs()}")
    assert(spark.read.parquet(s"$store/sigs").count() == 4)
    // stale staging (target still present) is discarded, not re-applied
    spark.read.parquet(s"$store/sigs/batch=0")
      .write.parquet(s"$store/.compact_sigs_0_1")
    assert(StreamOps.compactSignatureStore(spark, store) == 0)
    assert(!new java.io.File(s"$store/.compact_sigs_0_1").exists(),
      "stale staging dir removed")
    assert(spark.read.parquet(s"$store/sigs").count() == 4,
      "no double-fold from the stale staging")
  }

  test("signature store predating versioning (no meta) is refused") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val M = graft.operators.Multimodal
    val store = java.nio.file.Files.createTempDirectory("graft-oldstore").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-oldckpt").toString
    // a pre-versioning store: sigs/ exists, no store_meta.json
    Seq((1L, 42L)).toDF("id", "sh")
      .write.parquet(s"$store/sigs/batch=0")
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = StreamOps.streamingImageDedupIngest(
      input.toDF().toDF("img_id", "content"), "img_id", "content", store, ckpt)
    try {
      input.addData((2L, M.renderPng(8, 8, (_, _) => 0x808080)))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def mentions(m: String) = m != null && m.contains("predates store versioning")
      assert(mentions(err.getMessage) ||
        Option(err.getCause).exists(c => mentions(c.getMessage)),
        s"unversioned store must be refused: ${err.getMessage}")
    } finally q.stop()
  }

  test("streaming funnel: advances emit once, chain state spans batches, order rule holds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Long, String)](spark)
    val q = StreamOps.streamingFunnel(input.toDS(),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode("append").start()
    try {
      // u1 views then clicks; u2's click arrives BEFORE any view
      input.addData(("u1", 10L, "view"), ("u1", 20L, "click"),
        ("u2", 10L, "click"))
      q.processAllAvailable()
      def got() = spark.table("funnel_sink").collect()
        .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
      assert(got() == Seq(("u1", 1), ("u1", 2)))
      // next batch: u1 purchases (advance to 3 — state remembered);
      // u2 views at t=30 but their first click (t=10) precedes it:
      // first-touch chain stays broken at stage 2, as in the batch form
      input.addData(("u1", 30L, "purchase"), ("u2", 30L, "view"),
        ("u2", 40L, "noise"))
      q.processAllAvailable()
      assert(got() == Seq(("u1", 1), ("u1", 2), ("u1", 3), ("u2", 1)))
      // re-delivering u1's purchase emits nothing new
      input.addData(("u1", 50L, "purchase"))
      q.processAllAvailable()
      assert(got().length == 4)
      // batch parity on the same (ordered) input: only u1 reaches 3
      val batch = graft.operators.Analytics.funnel(
        Seq(("u1", 10L, "view"), ("u1", 20L, "click"), ("u2", 10L, "click"),
          ("u1", 30L, "purchase"), ("u2", 30L, "view"), ("u2", 40L, "noise"),
          ("u1", 50L, "purchase"))
          .toDF("user_id", "ts", "event_type")
          .withColumn("ts", col("ts").cast("timestamp")),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      assert(batch == Map(1 -> 2L, 2 -> 1L, 3 -> 1L),
        s"batch membership must match the stream's final depths: $batch")
    } finally q.stop()
  }

  test("map-only curation ops run unchanged on a stream: PII redaction == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    val rows = Seq(
      (1L, "mail a.b@x.io from 10.0.0.1"),
      (2L, "call +1-555-1234 now"),
      (3L, "no pii here"))
    val streamed = graft.operators.Curation.piiRedact(
      input.toDF().toDF("doc_id", "text"), "text")
    val q = streamed.writeStream.format("memory").queryName("pii_sink")
      .outputMode("append").start()
    input.addData(rows.take(2))
    q.processAllAvailable()
    input.addData(rows.drop(2))
    q.processAllAvailable()
    val got = spark.table("pii_sink")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
      .collect().map(_.toString).sorted.toSeq
    import spark.implicits._
    val batch = graft.operators.Curation.piiRedact(
        rows.toDF("doc_id", "text"), "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
      .collect().map(_.toString).sorted.toSeq
    assert(got === batch)
    q.stop()
  }

  test("map-only curation ops on a stream: C4 line filter + mojibake repair == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    val good = "This sentence has plenty of honest words in it."
    val rows = Seq(
      (1L, s"$good\n$good\n$good\ncafÃ© corner"),
      (2L, s"short.\n$good"),
      (3L, s"$good\nvar x = { broken }"))
    def shape(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.c4LineFilter(
          df.withColumn("text",
            graft.functions.CatalystExpressions.fixMojibake(col("text"))),
          "text")
        .select("doc_id", "clean_text", "n_kept", "pass_c4_page")
    val q = shape(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("c4_sink")
      .outputMode("append").start()
    input.addData(rows.take(2))
    q.processAllAvailable()
    input.addData(rows.drop(2))
    q.processAllAvailable()
    import spark.implicits._
    val got = spark.table("c4_sink").collect().map(_.toString).sorted.toSeq
    val batch = shape(rows.toDF("doc_id", "text"))
      .collect().map(_.toString).sorted.toSeq
    assert(got === batch)
    q.stop()
  }

  test("pre-fitted LM perplexity and DSIR scoring run unchanged on a stream") {
    // both scorers are pure map-side projections once fitted (the
    // model rides in the expression), so the SAME call scores a batch
    // frame or a stream — the batch-fit/stream-score split CCNet-style
    // pipelines use in production
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val ref = Seq((1L, "the cat sat on the mat"), (2L, "the dog ran"))
      .toDF("doc_id", "text")
    val lm = graft.operators.Curation.fitBigramLm(ref, "text")
    val dsir = graft.operators.Curation.fitDsir(ref.limit(1), ref, "text",
      numBuckets = 64)
    val rows = Seq((10L, "the cat sat"), (11L, "zz qq yy"), (12L, "the dog ran fast"))
    val input = MemoryStream[(Long, String)](spark)
    val src = input.toDF().toDF("doc_id", "text")
    val q1 = graft.operators.Curation.perplexity(src, "doc_id", "text", lm)
      .writeStream.format("memory").queryName("ppl_sink")
      .outputMode("append").start()
    val q2 = graft.operators.Curation.dsirScore(src, "doc_id", "text", dsir)
      .writeStream.format("memory").queryName("dsir_sink")
      .outputMode("append").start()
    input.addData(rows.take(2))
    q1.processAllAvailable(); q2.processAllAvailable()
    input.addData(rows.drop(2))
    q1.processAllAvailable(); q2.processAllAvailable()
    val batchDf = rows.toDF("doc_id", "text")
    val pplBatch = graft.operators.Curation.perplexity(batchDf, "doc_id", "text", lm)
      .collect().map(_.toString).sorted.toSeq
    val pplStream = spark.table("ppl_sink").collect().map(_.toString).sorted.toSeq
    assert(pplStream === pplBatch && pplStream.nonEmpty)
    val dsirBatch = graft.operators.Curation.dsirScore(batchDf, "doc_id", "text", dsir)
      .collect().map(_.toString).sorted.toSeq
    val dsirStream = spark.table("dsir_sink").collect().map(_.toString).sorted.toSeq
    assert(dsirStream === dsirBatch && dsirStream.nonEmpty)
    q1.stop(); q2.stop()
  }

  test("streaming export filter == batch export filter with the same fitted rates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "web" else "code",
        s"document number $i with enough tokens to pass the minimum length gate"))
    val rates = Map("web" -> 0.5, "code" -> 0.25)
    val input = MemoryStream[(Long, String, String)](spark)
    val streamed = graft.operators.Curation.exportFilterWithRates(
      input.toDF().toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", rates)
    val q = streamed.writeStream.format("memory").queryName("export_sink")
      .outputMode("append").start()
    input.addData(rows.take(120))
    q.processAllAvailable()
    input.addData(rows.drop(120)) // append: earlier selections must not flip
    q.processAllAvailable()
    val got = spark.table("export_sink").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    import spark.implicits._
    val batch = graft.operators.Curation.exportFilterWithRates(
        rows.toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === batch)
    assert(got.nonEmpty && got.size < rows.size)
    q.stop()
  }

  test("streaming near-dup: LSH state finds pairs across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val aDup = a.replace("today", "tonight") // high-Jaccard near-dup
    val other = "completely unrelated text about database query planning internals"
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.streamingNearDuplicates(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", minJaccard = 0.5)
      .writeStream.format("memory").queryName("neardup_sink")
      .outputMode("append").start()
    try {
      input.addData((1L, a), (2L, other))
      q.processAllAvailable()
      assert(spark.table("neardup_sink").count() == 0) // nothing similar yet
      // the near-dup arrives in a LATER micro-batch: bucket state from
      // batch 1 is what makes the pair findable at all
      input.addData((3L, aDup))
      q.processAllAvailable()
      val pairs = spark.table("neardup_sink")
        .select(col("id_a"), col("id_b")).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.toSeq == Seq((1L, 3L)))
      // batch twin agrees on the pair set (same banding definition)
      val batchPairs = graft.operators.Dedup.minhashNearDuplicates(
          Seq((1L, a), (2L, other), (3L, aDup)).toDF("doc_id", "text"),
          "doc_id", "text", minJaccard = 0.5)
        .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(batchPairs.toSeq.sorted == pairs.toSeq.sorted)
    } finally q.stop()
  }

  test("streaming as-of: events join the latest state at or before their time, across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamOps.{AsOfEvent, AsOfMatch}
    val input = MemoryStream[AsOfEvent](spark)
    val q = StreamOps.streamingAsOf(input.toDS())
      .writeStream.format("memory").queryName("asof_sink")
      .outputMode("append").start()
    try {
      // batch 1: state@5=1.0, event@3 (before any state), event@5
      // (inclusive), event@9
      input.addData(
        AsOfEvent("k", 5L, isState = true, 1.0),
        AsOfEvent("k", 3L, isState = false, 30.0),
        AsOfEvent("k", 5L, isState = false, 50.0),
        AsOfEvent("k", 9L, isState = false, 90.0))
      q.processAllAvailable()
      // batch 2: within a micro-batch rows process in TIME order, so
      // event@12 sees state@10 even though state@10 "arrives" with it;
      // the retained batch-1 state would have answered had the batch
      // held only the event. event@8 demonstrates the processing-time
      // relaxation: it is older than the retained state, so it joins
      // the state the stream currently holds from batch 1 (time 5).
      input.addData(
        AsOfEvent("k", 12L, isState = false, 120.0),
        AsOfEvent("k", 8L, isState = false, 80.0),
        AsOfEvent("k", 10L, isState = true, 2.0))
      q.processAllAvailable()
      input.addData(AsOfEvent("k", 15L, isState = false, 150.0))
      q.processAllAvailable()
      val rows = spark.table("asof_sink").as[AsOfMatch].collect()
        .map(m => m.time -> (m.state_time, m.state_value)).toMap
      assert(rows(3L) == (None, None)) // no state yet at time 3
      assert(rows(5L) == (Some(5L), Some(1.0))) // inclusive backward
      assert(rows(9L) == (Some(5L), Some(1.0)))
      assert(rows(8L) == (Some(5L), Some(1.0))) // pre-state event: batch-1 state
      assert(rows(12L) == (Some(10L), Some(2.0))) // same-batch state, time order
      assert(rows(15L) == (Some(10L), Some(2.0))) // newer state retained
      // batch twin agrees on every event: same data through the batch
      // as-of exec gives identical matches
      val lhs = Seq(("k", 3L, 30.0), ("k", 5L, 50.0), ("k", 8L, 80.0),
        ("k", 9L, 90.0), ("k", 12L, 120.0), ("k", 15L, 150.0))
        .toDF("key", "time", "value")
      val rhs = Seq(("k", 5L, 1.0), ("k", 10L, 2.0)).toDF("rkey", "state_time", "state_value")
      val batch = graft.plans.AsOf.join(lhs, rhs, "time", "state_time",
          Seq("key"), Seq("rkey"), joinType = "left")
        .collect().map(r => r.getLong(1) ->
          (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
      Seq(3L, 5L, 8L, 9L, 12L, 15L).foreach(t => assert(batch(t) == rows(t),
        s"stream and batch as-of disagree at time $t"))
    } finally q.stop()
  }

  test("keyed running state accumulates per key (mapGroupsWithState shape)") {
    val ds = Seq(("u1", 1.0), ("u1", 2.0), ("u2", 5.0)).toDS()
    val out = StreamOps.runningKeyedState(ds).collect().map(k => k.key -> (k.n, k.sum)).toMap
    assert(out("u1") == (2L, 3.0))
    assert(out("u2") == (1L, 5.0))
  }

  test("hierarchical state resolution: execution < stream < global (`shared_state.py:152-182`)") {
    val state = Seq(
      ("global", "", "", "model", "gpt-global"),
      ("stream", "s1", "", "model", "model-stream"),
      ("execution", "s1", "e1", "model", "model-exec"),
      ("global", "", "", "budget", "100"),
      ("stream", "s1", "", "retries", "3")
    ).toDF("scope", "stream_id", "execution_id", "key", "value")
    val resolved = StreamOps.resolveState(state, "s1", "e1")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(resolved("model") == "model-exec") // narrowest wins
    assert(resolved("budget") == "100") // falls through to global
    assert(resolved("retries") == "3") // stream level
    val other = StreamOps.resolveState(state, "s2", "e9")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(other("model") == "gpt-global") // other stream: global only
  }

  test("spillover pointer pattern (`event_loop_node.py:1943-2040`)") {
    val df = Seq("short", "x" * 5000).toDF("result")
    val out = StreamOps.spillover(df, "result", maxChars = 3000).collect()
    val small = out.find(_.getAs[String]("result") == "short").get
    val big = out.find(_.getAs[Boolean]("spilled")).get
    assert(!small.getAs[Boolean]("spilled") && small.getAs[String]("pointer") == null)
    assert(big.getAs[String]("preview").endsWith("…[spilled]"))
    assert(big.getAs[String]("pointer").length == 64) // sha256 pointer
  }

  test("tiered compaction keeps the newest rows within token budget (`event_loop_node.py:2041-2157`)") {
    // session s: 10 rows x 100 tokens = 1000 total; budget 500 => usage 2.0 => keep 1
    val rows = (1 to 10).map(i => ("s", i, 100L)) ++ (1 to 3).map(i => ("t", i, 100L))
    val df = rows.toDF("session", "seq", "tokens")
    val plan = StreamOps.compactionPlan(df, "session", "seq", "tokens", budget = 500L)
    val keptS = plan.filter(col("session") === "s" && col("keep")).collect()
    assert(keptS.length == 1 && keptS.head.getAs[Int]("seq") == 10) // newest only
    // session t: 300 tokens, usage 0.6 < 0.8 => keep everything
    assert(plan.filter(col("session") === "t" && col("keep")).count() == 3)
  }
}
