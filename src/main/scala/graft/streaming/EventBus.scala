package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Typed event + filtered pub/sub on Structured Streaming — parity
  * with the reference's event bus
  * (`core/framework/runtime/event_bus.py`).
  *
  * `AgentEvent` mirrors `event_bus.py:90-114` (type, stream_id,
  * node_id, execution_id, data, timestamp, correlation_id, graph_id;
  * `data` serialized as a string map per `to_dict`,
  * `event_bus.py:103-114`).
  */
final case class AgentEvent(
    event_type: String,
    stream_id: String,
    node_id: String = "",
    execution_id: String = "",
    data: Map[String, String] = Map.empty,
    ts: Timestamp = new Timestamp(0L),
    correlation_id: String = "",
    graph_id: String = "")

/** Conjunctive equality subscription filter
  * (`event_bus.py:122-131, 265-287`): type ∈ set plus optional
  * stream/node/execution/graph equality.
  */
final case class Subscription(
    eventTypes: Set[String] = Set.empty,
    streamId: Option[String] = None,
    nodeId: Option[String] = None,
    executionId: Option[String] = None,
    graphId: Option[String] = None) {

  def predicate: Column = {
    val conds = Seq(
      if (eventTypes.nonEmpty) Some(col("event_type").isin(eventTypes.toSeq: _*)) else None,
      streamId.map(col("stream_id") === _),
      nodeId.map(col("node_id") === _),
      executionId.map(col("execution_id") === _),
      graphId.map(col("graph_id") === _)).flatten
    if (conds.isEmpty) lit(true) else conds.reduce(_ && _)
  }
}

/** In-process bus for tests and single-driver pipelines; the same
  * subscription/query code runs unchanged against a Kafka/file source
  * at scale (swap `events` for `spark.readStream.format(...)`).
  *
  * Publisher side = MemoryStream; each subscription = one streaming
  * query over the shared stream (`event_bus.py:165-182` handler
  * fan-out), delivered via `foreachBatch` into a bounded ring buffer.
  * Retention is enforced at INGEST, like the reference's 1000-event
  * cap (`event_bus.py:249-252`): a subscriber's store never holds more
  * than `maxHistory` events, so a long-lived bus cannot grow driver
  * memory without bound (a memory-format sink would).
  */
final class EventBus(spark: SparkSession, maxHistory: Int = 1000) {
  import spark.implicits._

  private val stream = MemoryStream[AgentEvent](spark)
  private var queries = Map.empty[String, StreamingQuery]
  private val stores =
    new java.util.concurrent.ConcurrentHashMap[String, scala.collection.mutable.ArrayDeque[AgentEvent]]()
  private var seq = 0L

  /** The full typed event stream. */
  def events: Dataset[AgentEvent] = stream.toDS()

  /** Publish events (auto-stamps ts if unset — arrival order is the
    * reference's ordering, ST3: no event-time watermarks).
    */
  def publish(evs: AgentEvent*): Unit = synchronized {
    val stamped = evs.map { e =>
      seq += 1
      if (e.ts.getTime == 0L) e.copy(ts = new Timestamp(seq)) else e
    }
    stream.addData(stamped)
  }

  /** Subscribe: a filtered streaming query whose sink is a bounded
    * ring buffer (oldest events evicted beyond `maxHistory`).
    */
  def subscribe(subscriberName: String, sub: Subscription): StreamingQuery = synchronized {
    val buf = scala.collection.mutable.ArrayDeque.empty[AgentEvent]
    stores.put(subscriberName, buf)
    val q = events.toDF().filter(sub.predicate).as[AgentEvent]
      .writeStream
      .foreachBatch { (batch: Dataset[AgentEvent], _: Long) =>
        // Bound what enters the driver BEFORE collecting: a single
        // burst batch larger than maxHistory would otherwise have to
        // fit in driver heap only to be immediately evicted. A batch
        // over the limit fully replaces the ring buffer, so keeping
        // just its newest `maxHistory` rows (ts is the bus's arrival
        // ordering) is semantics-preserving.
        val n = batch.count()
        val rows =
          if (n <= maxHistory) batch.collect()
          else batch.sort(desc("ts")).limit(maxHistory).collect().reverse
        buf.synchronized {
          buf.appendAll(rows)
          while (buf.length > maxHistory) { buf.removeHead(); () }
        }
        ()
      }
      .queryName(subscriberName)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    queries += subscriberName -> q
    q
  }

  /** Deliver everything published so far to all subscribers. */
  def flush(): Unit = queries.values.foreach(_.processAllAvailable())

  /** What `subscriberName` currently retains (≤ `maxHistory` rows). */
  def received(subscriberName: String): DataFrame = {
    val buf = stores.get(subscriberName)
    require(buf != null, s"unknown subscriber '$subscriberName'")
    val snapshot = buf.synchronized { buf.toSeq }
    spark.createDataset(snapshot).toDF()
  }

  /** Bounded recent history, newest first — retention parity
    * (`event_bus.py:249-252, 857-887`, max 1000).
    */
  def history(subscriberName: String, n: Int = 100): DataFrame =
    received(subscriberName).orderBy(desc("ts")).limit(math.min(n, maxHistory))

  /** Bus-level bounded history (the reference's bus keeps the last
    * 1000 events regardless of subscriptions, `event_bus.py:249-252`):
    * an unfiltered subscription materialized lazily on first use.
    */
  def recentEvents(n: Int = 100): DataFrame = {
    synchronized {
      if (!queries.contains("__bus_history")) subscribe("__bus_history", Subscription())
    }
    flush()
    history("__bus_history", n)
  }

  /** Await the first event matching `sub` — `wait_for` parity
    * (`event_bus.py:902-…`). Returns None on timeout.
    */
  def waitFor(sub: Subscription, timeoutMs: Long = 5000): Option[AgentEvent] = {
    val name = s"waitfor_${System.nanoTime()}"
    val q = subscribe(name, sub)
    val deadline = System.currentTimeMillis() + timeoutMs
    try {
      var hit: Option[AgentEvent] = None
      while (hit.isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        val rows = received(name).orderBy(asc("ts")).limit(1).as[AgentEvent].collect()
        hit = rows.headOption
        if (hit.isEmpty) Thread.sleep(10)
      }
      hit
    } finally {
      q.stop()
      synchronized { queries -= name }
      stores.remove(name) // the temp subscription's ring buffer must not outlive it
      ()
    }
  }

  def stop(): Unit = synchronized {
    queries.values.foreach(_.stop())
    queries = Map.empty
    stores.clear()
  }
}
