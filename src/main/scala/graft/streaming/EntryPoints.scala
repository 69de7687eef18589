package graft.streaming

import java.util.concurrent.{ConcurrentLinkedDeque, Executors, ScheduledExecutorService, Semaphore, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.sql.DataFrame

/** Entry-point execution streams — parity with the reference's
  * multi-entry-point runtime (`core/framework/graph/edge.py:306-342`
  * `AsyncEntryPointSpec`, `core/framework/runtime/execution_stream.py`,
  * `agent_runtime.py:382-516` timer loops).
  *
  * Semantics preserved: per-entry-point admission under
  * `maxConcurrent` (default 10, `edge.py:338-340`), ring-buffered
  * recent results (`execution_stream.py:248-268`), trigger types
  * manual / timer / event (`edge.py:327-341`; webhook is just an
  * external caller of [[EntryPointRuntime.trigger]]).
  *
  * Scale note: each execution is a full Spark job over a DataFrame —
  * the runtime throttles job *submissions*; Spark's scheduler
  * parallelizes within each job. Timer triggers are the batch analog
  * of `Trigger.ProcessingTime`.
  */
object EntryPoints {

  final case class EntryPointSpec(
      id: String,
      maxConcurrent: Int = 10, // `edge.py:338-340`
      triggerType: String = "manual", // manual | timer | event | webhook
      intervalMs: Long = 0, // for timer
      resultBuffer: Int = 100)

  final case class ExecutionResult(
      entryPointId: String,
      executionId: Long,
      success: Boolean,
      rowCount: Long,
      error: Option[String])

  final class ExecutionStream(val spec: EntryPointSpec,
      body: DataFrame => DataFrame)(implicit ec: ExecutionContext) {
    private val admission = new Semaphore(spec.maxConcurrent)
    private val executionSeq = new AtomicInteger(0)
    private val inFlight = new AtomicInteger(0)
    @volatile private var peak = 0
    @volatile private var closed = false
    private val results = new ConcurrentLinkedDeque[ExecutionResult]()
    private val pending = new java.util.concurrent.LinkedBlockingQueue[
      (Long, DataFrame, scala.concurrent.Promise[ExecutionResult])]()

    // Single dispatcher thread parks in `admission.acquire()` so the
    // shared ExecutionContext only ever holds RUNNING executions
    // (≤ maxConcurrent): with the old acquire-inside-Future shape, a
    // queue deeper than the EC's thread pool parked every EC thread in
    // acquire and completed executions could never release — livelock.
    private val dispatcher = new Thread(() => {
      while (!closed) {
        val item = pending.poll(100, TimeUnit.MILLISECONDS)
        if (item != null) {
          val (id, input, promise) = item
          admission.acquire()
          if (closed) {
            // closed while parked in acquire: fail rather than run
            admission.release()
            promise.tryFailure(new IllegalStateException(
              s"entry point '${spec.id}' closed before execution $id was admitted"))
            ()
          } else {
            val fut = Future {
              val now = inFlight.incrementAndGet()
              peak = math.max(peak, now)
              try {
                val r =
                  try {
                    val out = body(input)
                    ExecutionResult(spec.id, id, success = true, out.count(), None)
                  } catch {
                    case e: Exception =>
                      ExecutionResult(spec.id, id, success = false, 0, Some(e.getMessage))
                  }
                results.addFirst(r)
                while (results.size() > spec.resultBuffer) results.pollLast()
                r
              } finally {
                inFlight.decrementAndGet()
                admission.release()
              }
            }
            promise.completeWith(fut)
            ()
          }
        }
      }
      drainPending() // closed: fail whatever is still queued
    }, s"graft-entrypoint-${spec.id}-dispatcher")
    dispatcher.setDaemon(true)
    dispatcher.start()

    private def drainPending(): Unit = {
      var item = pending.poll()
      while (item != null) {
        item._3.tryFailure(new IllegalStateException(
          s"entry point '${spec.id}' closed before execution ${item._1} was admitted"))
        item = pending.poll()
      }
    }

    /** Enqueue one execution; runs once admission under
      * `maxConcurrent` allows (`execution_stream.py:323-389`). Never
      * blocks the caller. After [[close]] the returned future fails
      * immediately.
      */
    def execute(input: DataFrame): Future[ExecutionResult] = {
      val id = executionSeq.incrementAndGet().toLong
      val promise = scala.concurrent.Promise[ExecutionResult]()
      if (closed) promise.tryFailure(new IllegalStateException(
        s"entry point '${spec.id}' is closed"))
      else {
        pending.put((id, input, promise))
        if (closed) drainPending() // raced close(): don't strand the item
      }
      promise.future
    }

    /** Stop the dispatcher: queued-but-unadmitted executions FAIL
      * (their futures complete with an error — nobody hangs); running
      * ones finish.
      */
    def close(): Unit = {
      closed = true
      drainPending()
    }

    def recentResults: Seq[ExecutionResult] = {
      val it = results.iterator()
      val out = Seq.newBuilder[ExecutionResult]
      while (it.hasNext) out += it.next()
      out.result()
    }

    def peakConcurrency: Int = peak
  }

  /** Runtime over many entry points: registration, manual/webhook
    * trigger, interval timers, event-bus-driven triggers
    * (`agent_runtime.py:247-516`).
    */
  final class EntryPointRuntime(implicit ec: ExecutionContext) {
    private var streams = Map.empty[String, ExecutionStream]
    private val scheduler: ScheduledExecutorService =
      Executors.newScheduledThreadPool(2, r => {
        val t = new Thread(r, "graft-entrypoint-timer"); t.setDaemon(true); t
      })

    def register(spec: EntryPointSpec, body: DataFrame => DataFrame): ExecutionStream =
      synchronized {
        val s = new ExecutionStream(spec, body)
        streams += spec.id -> s
        s
      }

    /** Manual/webhook trigger (`agent_runtime.py:557-616`). */
    def trigger(entryPointId: String, input: DataFrame): Future[ExecutionResult] =
      streams.getOrElse(entryPointId,
        throw new IllegalArgumentException(s"unknown entry point '$entryPointId'"))
        .execute(input)

    /** Start an interval timer for a timer-typed entry point
      * (`agent_runtime.py:382-516`); `fireNow` mirrors the immediate
      * first fire option.
      */
    def startTimer(entryPointId: String, input: () => DataFrame,
        fireNow: Boolean = false): Unit = {
      val s = streams(entryPointId)
      require(s.spec.triggerType == "timer" && s.spec.intervalMs > 0,
        s"'$entryPointId' is not a timer entry point")
      val initial = if (fireNow) 0L else s.spec.intervalMs
      scheduler.scheduleAtFixedRate(
        () => { s.execute(input()); () },
        initial, s.spec.intervalMs, TimeUnit.MILLISECONDS)
      ()
    }

    /** Cron-expression trigger (`agent_runtime.py:382-516` cron loops):
      * fires the entry point at each matching minute.
      */
    def startCron(entryPointId: String, cronExpr: String,
        input: () => DataFrame): Unit = {
      val s = streams(entryPointId)
      val sched = Cron.parse(cronExpr)
      def scheduleNext(): Unit = {
        val now = java.time.ZonedDateTime.now()
        val delayMs = java.time.Duration.between(now, sched.nextAfter(now)).toMillis
        scheduler.schedule(new Runnable {
          def run(): Unit = { s.execute(input()); scheduleNext() }
        }, delayMs, TimeUnit.MILLISECONDS)
        ()
      }
      scheduleNext()
    }

    /** Drive an entry point from a real external streaming source
      * (ST1, `execution_stream.py:63-233` parity): every micro-batch
      * of `source` — any `readStream`-based DataFrame (file drop
      * directory, Kafka, rate source) — becomes one admitted
      * execution. Rate limiting comes from the source options
      * (`maxFilesPerTrigger` / `maxOffsetsPerTrigger`) on top of the
      * entry point's own `maxConcurrent` admission.
      */
    def startStream(entryPointId: String, source: DataFrame):
        org.apache.spark.sql.streaming.StreamingQuery = {
      val s = streams.getOrElse(entryPointId,
        throw new IllegalArgumentException(s"unknown entry point '$entryPointId'"))
      source.writeStream
        .queryName(s"graft-entrypoint-$entryPointId")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (!batch.isEmpty) { s.execute(batch.localCheckpoint(true)); () }
        }
        .start()
    }

    def stream(id: String): ExecutionStream = streams(id)

    def shutdown(): Unit = {
      scheduler.shutdownNow()
      synchronized { streams.values.foreach(_.close()) }
      ()
    }
  }

  /** A file-drop streaming source: new files matching `glob` landing
    * in `dir` arrive as micro-batches, at most `maxFilesPerTrigger`
    * files per batch — the rate-limited external source the runtime's
    * webhook/timer entry points pair with (the directory is the
    * at-scale handoff: producers write, the stream picks up).
    */
  def fileSource(spark: org.apache.spark.sql.SparkSession,
      dir: String, schema: org.apache.spark.sql.types.StructType,
      format: String = "json", maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .format(format)
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
}
