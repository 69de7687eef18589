package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantic (LLM-backed) operators — the Spark restatement of the
  * reference's event-loop node / LLM judge / output cleaner
  * (`core/framework/graph/event_loop_node.py:160-1020`,
  * `conversation_judge.py`, `output_cleaner.py`).
  *
  * Execution model: per-partition batched calls through a pluggable
  * [[ModelClient]] — the `mapPartitions` micro-batching the survey
  * plans for LLM UDFs (SURVEY §4 custom-work item 3). Batch size
  * mirrors `max_tool_calls_per_turn`-style concurrency caps
  * (`LoopConfig:71`); retries/backoff mirror ST12
  * (`event_loop_node.py:1832-1881`: 3 retries, base 2.0, 60 s cap).
  * Tests run the [[DeterministicStub]]; production swaps in a real
  * client — the operator code does not change.
  */
object SemanticOps {

  /** Batched completion client. A factory (`() => ModelClient`) is
    * what ships to executors, so connections are created per
    * partition, never serialized.
    */
  trait ModelClient extends Serializable {
    def complete(prompts: Seq[String]): Seq[String]
  }

  /** Deterministic stub: pure function of the prompt (tests + offline
    * runs). `fn` defaults to a stable hash-tagged echo.
    */
  final case class DeterministicStub(
      fn: String => String = p => s"stub:${p.hashCode}") extends ModelClient {
    override def complete(prompts: Seq[String]): Seq[String] = prompts.map(fn)
  }

  /** Retry with exponential backoff — ST12 parity
    * (`event_loop_node.py:94-97`: 3 retries, base 2.0, cap 60 s).
    */
  final case class RetryingClient(inner: ModelClient, maxRetries: Int = 3,
      backoffBaseMs: Long = 2000, backoffCapMs: Long = 60000) extends ModelClient {
    override def complete(prompts: Seq[String]): Seq[String] = {
      var attempt = 0
      while (true) {
        try return inner.complete(prompts)
        catch {
          // a permanently-classified failure (4xx, malformed response)
          // stays failed — retrying an invalid request burns quota
          // (the reference only backoff-retries its rate-limit class)
          case e: PermanentModelError => throw e
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
            val wait = math.min(backoffCapMs,
              (backoffBaseMs * math.pow(2.0, (attempt - 1).toDouble)).toLong)
            Thread.sleep(wait)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Batched embedding client — the transport seam for the
    * embedding-consuming operators ([[graft.operators.Similarity]],
    * SemDeDup, [[graft.operators.Curation.quantizedKnn]]): production
    * is [[HttpModelClient.embed]] (OpenAI-compatible `/embeddings`);
    * tests and offline runs use a deterministic stub (e.g.
    * [[graft.operators.Multimodal]]'s rolling-hash pseudo-embedding).
    * Same factory-per-partition discipline as [[ModelClient]].
    */
  trait EmbeddingClient extends Serializable {
    /** One vector per input text, in input order. */
    def embed(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Retry with exponential backoff for the embedding surface — same
    * classification contract as [[RetryingClient]].
    */
  final case class RetryingEmbeddingClient(inner: EmbeddingClient,
      maxRetries: Int = 3, backoffBaseMs: Long = 2000,
      backoffCapMs: Long = 60000) extends EmbeddingClient {
    override def embed(texts: Seq[String]): Seq[Array[Float]] = {
      var attempt = 0
      while (true) {
        try return inner.embed(texts)
        catch {
          case e: PermanentModelError => throw e
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
            val wait = math.min(backoffCapMs,
              (backoffBaseMs * math.pow(2.0, (attempt - 1).toDouble)).toLong)
            Thread.sleep(wait)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Vision-inference client — the transport seam for image →
    * labels/OCR/caption extraction (the production path behind
    * [[graft.operators.Multimodal]]'s deterministic feature stub).
    * Production is [[HttpModelClient.analyzeImages]] (OpenAI-compatible
    * chat with base64 `image_url` content parts); tests use a stub.
    * Same factory-per-partition discipline as [[ModelClient]].
    */
  trait VisionClient extends Serializable {
    /** One response per (bytes, mimeType) image, in input order, for a
      * shared instruction prompt.
      */
    def analyzeImages(prompt: String, images: Seq[(Array[Byte], String)]): Seq[String]
  }

  /** Retry with exponential backoff for the vision surface — same
    * classification contract as [[RetryingClient]].
    */
  final case class RetryingVisionClient(inner: VisionClient,
      maxRetries: Int = 3, backoffBaseMs: Long = 2000,
      backoffCapMs: Long = 60000) extends VisionClient {
    override def analyzeImages(prompt: String,
        images: Seq[(Array[Byte], String)]): Seq[String] = {
      var attempt = 0
      while (true) {
        try return inner.analyzeImages(prompt, images)
        catch {
          case e: PermanentModelError => throw e
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
            val wait = math.min(backoffCapMs,
              (backoffBaseMs * math.pow(2.0, (attempt - 1).toDouble)).toLong)
            Thread.sleep(wait)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Cross-encoder rerank client — the transport seam for the
    * second-stage ranker behind first-stage retrieval
    * ([[graft.operators.TextOps]]'s BM25 / RRF / ANN candidates):
    * production is [[HttpModelClient.rerank]] (Cohere-style public
    * `POST /rerank`); tests use a stub. Same factory-per-partition
    * discipline as [[ModelClient]].
    */
  trait RerankClient extends Serializable {
    /** One relevance score per document, in input order, for `query`. */
    def rerank(query: String, docs: Seq[String]): Seq[Double]
  }

  /** Retry with exponential backoff for the rerank surface — same
    * classification contract as [[RetryingClient]].
    */
  final case class RetryingRerankClient(inner: RerankClient,
      maxRetries: Int = 3, backoffBaseMs: Long = 2000,
      backoffCapMs: Long = 60000) extends RerankClient {
    override def rerank(query: String, docs: Seq[String]): Seq[Double] = {
      var attempt = 0
      while (true) {
        try return inner.rerank(query, docs)
        catch {
          case e: PermanentModelError => throw e
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
            val wait = math.min(backoffCapMs,
              (backoffBaseMs * math.pow(2.0, (attempt - 1).toDouble)).toLong)
            Thread.sleep(wait)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Attach a cross-encoder relevance score to per-query candidate
    * rows — the production second stage of the retrieval stack (BM25 /
    * RRF / ANN produce top-k candidates; the reranker re-scores each
    * (query, doc) pair). One `rerank` call covers one query's
    * candidate list, chunked at `maxDocsPerCall` (provider caps).
    *
    * Scale: candidates hash-shuffle on the query column (ONE
    * exchange) so each query's list is co-located and contiguous, then
    * scoring is per-partition batched calls — one client per
    * partition, never serialized. Per-task memory holds one candidate
    * LIST (top-k-bounded by the first stage, never the corpus).
    */
  def rerankColumn(df: DataFrame, queryCol: String, textCol: String,
      outputCol: String, clientFactory: () => RerankClient,
      maxDocsPerCall: Int = 100): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField(outputCol, DoubleType, nullable = false))
    val qIdx = inSchema.fieldIndex(queryCol)
    val tIdx = inSchema.fieldIndex(textCol)
    val grouped = df.repartition(col(queryCol))
      .sortWithinPartitions(col(queryCol))
    val rdd = grouped.rdd.mapPartitions { it =>
      val client = clientFactory()
      new Iterator[Seq[Row]] {
        private val buf = it.buffered
        override def hasNext: Boolean = buf.hasNext
        override def next(): Seq[Row] = {
          // one run = one query's contiguous candidate rows
          val q = buf.head.get(qIdx)
          val run = scala.collection.mutable.ArrayBuffer[Row]()
          while (buf.hasNext && buf.head.get(qIdx) == q) run += buf.next()
          val query = String.valueOf(q)
          val scores = run.grouped(math.max(1, maxDocsPerCall)).flatMap { chunk =>
            val s = client.rerank(query,
              chunk.map(r => String.valueOf(r.get(tIdx))).toSeq)
            require(s.size == chunk.size,
              s"rerank client returned ${s.size} scores for ${chunk.size} docs")
            s
          }
          run.zip(scores.toSeq).map { case (row, s) =>
            Row.fromSeq(row.toSeq :+ s)
          }.toSeq
        }
      }.flatten
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Attach a real embedding column: batch-call the client per
    * partition (one client per partition, like [[semanticMap]]) and
    * add `outputCol` as `array<float>` — the production feed for the
    * ANN / SemDeDup / quantized-KNN stack, which is otherwise driven
    * by precomputed or stubbed embeddings.
    */
  def embedColumn(df: DataFrame, textCol: String, outputCol: String,
      clientFactory: () => EmbeddingClient, batchSize: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField(outputCol, ArrayType(FloatType, containsNull = false)))
    val idx = inSchema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { it =>
      val client = clientFactory()
      it.grouped(batchSize).flatMap { batch =>
        val vecs = client.embed(batch.map(r => String.valueOf(r.get(idx))))
        require(vecs.size == batch.size,
          s"embedding client returned ${vecs.size} vectors for ${batch.size} texts")
        batch.zip(vecs).map { case (row, v) => Row.fromSeq(row.toSeq :+ v.toSeq) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Flaky test double: fails the first `failures` calls. */
  final class FlakyClient(inner: ModelClient, failures: Int) extends ModelClient {
    private val remaining = new java.util.concurrent.atomic.AtomicInteger(failures)
    override def complete(prompts: Seq[String]): Seq[String] = {
      if (remaining.getAndDecrement() > 0)
        throw new RuntimeException("transient upstream error")
      inner.complete(prompts)
    }
  }

  /** Core semantic map: render a prompt per row from `promptCols`,
    * batch-call the client per partition, attach the response as
    * `outputCol`. One client per partition, `batchSize` prompts per
    * call.
    */
  def semanticMap(df: DataFrame, promptTemplate: String, promptCols: Seq[String],
      outputCol: String, clientFactory: () => ModelClient,
      batchSize: Int = 10): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(outputCol, StringType))
    val idxs = promptCols.map(inSchema.fieldIndex)
    val rdd = df.rdd.mapPartitions { it =>
      val client = clientFactory()
      it.grouped(batchSize).flatMap { batch =>
        val prompts = batch.map { row =>
          idxs.zip(promptCols).foldLeft(promptTemplate) { case (acc, (i, name)) =>
            acc.replace(s"{$name}", String.valueOf(row.get(i)))
          }
        }
        val responses = client.complete(prompts)
        require(responses.size == batch.size,
          s"model client returned ${responses.size} responses for ${batch.size} prompts")
        batch.zip(responses).map { case (row, resp) => Row.fromSeq(row.toSeq :+ resp) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** LLM judge (`conversation_judge.py`, `testing/llm_judge.py:16-105`):
    * evaluates `textCol` against `criteria`, yielding boolean `verdict`
    * + `reason`. Expected client response shape: "PASS|FAIL: reason".
    * Unparseable → verdict=false with the raw response as reason
    * (fail-closed).
    */
  def llmJudge(df: DataFrame, criteria: String, textCol: String,
      clientFactory: () => ModelClient, batchSize: Int = 10): DataFrame = {
    val judged = semanticMap(df,
      s"Judge the following against the criteria.\nCriteria: $criteria\nText: {$textCol}\nAnswer PASS or FAIL with a reason.",
      Seq(textCol), "__judge_raw", clientFactory, batchSize)
    judged
      .withColumn("verdict", upper(col("__judge_raw")).startsWith("PASS"))
      .withColumn("reason", regexp_replace(col("__judge_raw"), "^(?i)(PASS|FAIL)[:\\s]*", ""))
      .drop("__judge_raw")
  }

  /** Semantic filter — LLM_DECIDE edge routing (P4, `edge.py:144-156,
    * 206-274`): keep rows the judge passes; on judge error the
    * reference falls back to the `success` column (`edge.py:152-156`),
    * mirrored here via fallbackCol when verdict is null.
    */
  def semanticFilter(df: DataFrame, criteria: String, textCol: String,
      clientFactory: () => ModelClient, fallbackCol: Option[String] = None): DataFrame = {
    val judged = llmJudge(df, criteria, textCol, clientFactory)
    val keep = fallbackCol match {
      case Some(f) => coalesce(col("verdict"), col(f), lit(false))
      case None => coalesce(col("verdict"), lit(false))
    }
    judged.filter(keep).drop("verdict", "reason")
  }

  /** Output cleaner (`output_cleaner.py`, call site
    * `executor.py:1630-1668`): validate → clean → revalidate. Rows
    * whose `jsonCol` parses against `target` pass through; failures go
    * to the client for repair and are re-parsed; still-broken rows
    * keep a null struct plus the raw value in `<outputCol>_raw`.
    */
  def outputCleaner(df: DataFrame, jsonCol: String, target: StructType,
      outputCol: String, clientFactory: () => ModelClient): DataFrame = {
    // PERMISSIVE from_json yields an all-null row (not a null struct)
    // for malformed input — failure means null struct OR no field set
    val allFieldsNull = target.fields
      .map(f => col(outputCol).getField(f.name).isNull)
      .reduce(_ && _)
    val parseFailed = col(outputCol).isNull || allFieldsNull
    val parsed = df.withColumn(outputCol, from_json(col(jsonCol), target))
    val ok = parsed.filter(!parseFailed)
      .withColumn(s"${outputCol}_raw", lit(null).cast(StringType))
    val broken = parsed.filter(parseFailed).drop(outputCol)
    val repaired = semanticMap(broken,
      s"Repair this into JSON matching the schema ${target.simpleString}: {$jsonCol}",
      Seq(jsonCol), "__repaired", clientFactory)
      .withColumn(outputCol, from_json(col("__repaired"), target))
      .withColumn(s"${outputCol}_raw",
        when(parseFailed, col(jsonCol)).otherwise(lit(null).cast(StringType)))
      .drop("__repaired")
    ok.unionByName(repaired)
  }

  /** A repair stub that extracts the first {...} block — the shape of
    * the reference's find-JSON-in-text hardening
    * (`core/tests/test_find_json_hardened.py`).
    */
  val JsonExtractStub: ModelClient = DeterministicStub { p =>
    val start = p.indexOf('{', p.indexOf(": ") + 1)
    val s = p.substring(math.max(start, 0))
    val open = s.indexOf('{')
    if (open < 0) "{}"
    else {
      var depth = 0
      var end = -1
      var i = open
      while (i < s.length && end < 0) {
        s(i) match {
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      if (end < 0) "{}" else s.substring(open, end + 1)
    }
  }
}
