package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** Real HTTP transport behind [[SemanticOps.ModelClient]]: an
  * OpenAI-compatible `/chat/completions` client on the JDK's
  * `java.net.http` (no deps) — the production half the
  * [[SemanticOps.DeterministicStub]] stands in for during tests.
  *
  * Mirrors the reference client's behavioral surface
  * (`core/framework/llm/litellm.py:382-455`):
  * - **Retry classification**: 429 and 5xx raise [[RetryableModelError]]
  *   (transient — [[SemanticOps.RetryingClient]] backs off and
  *   retries), other 4xx raise [[PermanentModelError]] (a bad request
  *   stays bad; retrying burns quota). Connection-level IO errors are
  *   retryable.
  * - **Usage accounting**: prompt/completion token counts from each
  *   response accumulate in [[usage]] (the reference's
  *   `input_tokens`/`output_tokens` bookkeeping).
  * - **JSON mode** via prompt engineering (`json_mode` appends the
  *   "respond with a valid JSON object" system instruction — the
  *   cross-provider trick the reference uses).
  * - **Streaming** (`stream = true`): SSE `/chat/completions` with
  *   `"stream": true`, accumulating `choices[0].delta.content` chunks
  *   until `data: [DONE]` (the reference's streaming path,
  *   `litellm.py:852-…`). The whole-request `requestTimeout` is
  *   replaced by a per-chunk deadline (`chunkTimeout`): a long
  *   generation survives as long as tokens keep arriving, while a
  *   stalled stream fails fast. A disconnect or stall mid-stream is
  *   classified retryable (the request is re-sent from scratch —
  *   deltas are never spliced across attempts).
  *
  * One instance per partition (built by the `() => ModelClient`
  * factory), so the underlying connection pool is never serialized.
  * Prompts in a batch are sent as individual requests — provider
  * batch endpoints differ; per-request keeps the client universal.
  */
final class HttpModelClient(
    endpoint: String,
    model: String,
    apiKey: Option[String] = None,
    maxTokens: Int = 1024,
    jsonMode: Boolean = false,
    requestTimeout: Duration = Duration.ofSeconds(120),
    stream: Boolean = false,
    chunkTimeout: Duration = Duration.ofSeconds(30),
    embedBatchSize: Int = 64)
  extends SemanticOps.ModelClient with SemanticOps.EmbeddingClient
  with SemanticOps.VisionClient with SemanticOps.RerankClient {

  @transient private lazy val http =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10))
      // gateways routinely 301/308 (http->https, path canonicalization);
      // JDK default is NEVER, which would misclassify them as permanent
      // 'request rejected' failures
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
  @transient private lazy val mapper = new ObjectMapper()

  private val promptTokens = new java.util.concurrent.atomic.AtomicLong(0)
  private val completionTokens = new java.util.concurrent.atomic.AtomicLong(0)

  /** (prompt tokens, completion tokens) consumed so far by this instance. */
  def usage: (Long, Long) = (promptTokens.get(), completionTokens.get())

  override def complete(prompts: Seq[String]): Seq[String] =
    prompts.map(completeOne)

  private def completeOne(prompt: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("max_tokens", maxTokens)
    if (stream) root.put("stream", true)
    val messages = root.putArray("messages")
    if (jsonMode) {
      val sys = messages.addObject()
      sys.put("role", "system")
      sys.put("content", "Please respond with a valid JSON object.")
    }
    val user = messages.addObject()
    user.put("role", "user")
    user.put("content", prompt)

    val reqBuilder = HttpRequest.newBuilder()
      .uri(URI.create(s"${endpoint.stripSuffix("/")}/chat/completions"))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root)))
    apiKey.foreach(k => reqBuilder.header("Authorization", s"Bearer $k"))
    val request = reqBuilder.build()

    if (stream) completeStreaming(request)
    else {
      val resp =
        try http.send(request, HttpResponse.BodyHandlers.ofString())
        catch {
          case e: java.io.IOException =>
            throw RetryableModelError(s"connection error: ${e.getMessage}", e)
        }
      resp.statusCode() match {
        case 200 => parseContent(resp.body())
        case s => classifyFailure(s, resp.body())
      }
    }
  }

  private def classifyFailure(status: Int, body: String): Nothing = status match {
    case 429 =>
      throw RetryableModelError(s"rate limited (429): ${body.take(200)}")
    case s if s >= 500 =>
      throw RetryableModelError(s"server error ($s): ${body.take(200)}")
    case s =>
      throw PermanentModelError(s"request rejected ($s): ${body.take(200)}")
  }

  /** SSE read loop. A dedicated reader thread feeds lines into a
    * bounded queue; the caller polls with the per-chunk deadline, so a
    * stalled upstream can't hang the partition thread past
    * `chunkTimeout` (the JDK client's request timeout only covers
    * time-to-response, not body reads). Stall, mid-stream disconnect,
    * and mid-stream IO errors all classify retryable — the retry
    * re-sends the whole request; partial deltas are discarded.
    */
  private def completeStreaming(request: HttpRequest): String = {
    import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}
    val resp =
      try http.send(request, HttpResponse.BodyHandlers.ofInputStream())
      catch {
        case e: java.io.IOException =>
          throw RetryableModelError(s"connection error: ${e.getMessage}", e)
      }
    val body = resp.body()
    if (resp.statusCode() != 200) {
      val errBody =
        try new String(body.readNBytes(4096), "UTF-8")
        catch { case _: java.io.IOException => "" }
        finally body.close()
      classifyFailure(resp.statusCode(), errBody)
    }

    // Option[Either[Throwable, String]]: Some(Right(line)) | Some(Left(err)) | None = EOF
    val lines = new ArrayBlockingQueue[AnyRef](256)
    val reader = new Thread(() => {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(body, "UTF-8"))
      try {
        var line = in.readLine()
        while (line != null) {
          lines.put(Right(line))
          line = in.readLine()
        }
        lines.put(None)
      } catch {
        case e: Throwable => lines.put(Left(e))
      } finally in.close()
    }, "graft-sse-reader")
    reader.setDaemon(true)
    reader.start()

    val content = new StringBuilder
    var sawDone = false
    try {
      while (!sawDone) {
        lines.poll(chunkTimeout.toMillis, TimeUnit.MILLISECONDS) match {
          case null =>
            throw RetryableModelError(
              s"stream stalled: no chunk within ${chunkTimeout.toMillis} ms")
          case None =>
            // EOF before [DONE]: the server hung up mid-generation
            throw RetryableModelError(
              "stream disconnected before [DONE]" +
                (if (content.nonEmpty) s" (after ${content.length} chars)" else ""))
          case Left(e: Throwable) =>
            throw RetryableModelError(s"stream read error: ${e.getMessage}", e)
          case Right(line: String) =>
            val trimmed = line.trim
            if (trimmed.startsWith("data:")) {
              val payload = trimmed.stripPrefix("data:").trim
              if (payload == "[DONE]") sawDone = true
              else if (payload.nonEmpty) {
                val node =
                  try mapper.readTree(payload)
                  catch {
                    case e: Exception =>
                      throw PermanentModelError(s"unparseable SSE chunk: ${e.getMessage}")
                  }
                val usageNode = node.path("usage")
                promptTokens.addAndGet(usageNode.path("prompt_tokens").asLong(0))
                completionTokens.addAndGet(usageNode.path("completion_tokens").asLong(0))
                val delta = node.path("choices").path(0).path("delta").path("content")
                if (!delta.isMissingNode && !delta.isNull) content.append(delta.asText())
              }
            } // non-data lines (comments, event:, blank keep-alives) are skipped
          case other =>
            throw new IllegalStateException(s"unexpected queue element: $other")
        }
      }
    } finally body.close()
    content.toString()
  }

  /** OpenAI-compatible vision inference (matching the reference's
    * provider-delegating vision capability,
    * `tools/src/aden_tools/tools/vision_tool/vision_tool.py:372-428`):
    * `POST /chat/completions` whose user message carries a `text`
    * content part (the instruction prompt) plus an `image_url` part
    * with a base64 data URL — the cross-provider chat-with-image
    * shape. One request per image (content understanding is
    * per-asset; provider multi-image semantics differ), same retry
    * classification and usage accounting as the text surface. The
    * response content is returned verbatim — labels/OCR/caption
    * parsing belongs to the caller's prompt contract.
    */
  override def analyzeImages(prompt: String,
      images: Seq[(Array[Byte], String)]): Seq[String] =
    images.map { case (bytes, mime) => analyzeOne(prompt, bytes, mime) }

  private def analyzeOne(prompt: String, bytes: Array[Byte], mime: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("max_tokens", maxTokens)
    val messages = root.putArray("messages")
    val user = messages.addObject()
    user.put("role", "user")
    val parts = user.putArray("content")
    val text = parts.addObject()
    text.put("type", "text")
    text.put("text", prompt)
    val img = parts.addObject()
    img.put("type", "image_url")
    img.putObject("image_url").put("url",
      s"data:$mime;base64,${java.util.Base64.getEncoder.encodeToString(bytes)}")
    val reqBuilder = HttpRequest.newBuilder()
      .uri(URI.create(s"${endpoint.stripSuffix("/")}/chat/completions"))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root)))
    apiKey.foreach(k => reqBuilder.header("Authorization", s"Bearer $k"))
    val resp =
      try http.send(reqBuilder.build(), HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw RetryableModelError(s"connection error: ${e.getMessage}", e)
      }
    resp.statusCode() match {
      case 200 => parseContent(resp.body())
      case s => classifyFailure(s, resp.body())
    }
  }

  /** OpenAI-compatible `POST /embeddings`: one request per
    * `embedBatchSize` texts (provider input caps make the split the
    * client's job), vectors returned in input order (the response's
    * `data[].index` is authoritative — providers may reorder), with
    * the same retry classification and usage accounting as the chat
    * surface.
    */
  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.grouped(math.max(1, embedBatchSize)).flatMap(embedBatch).toSeq

  private def embedBatch(batch: Seq[String]): Seq[Array[Float]] = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val input = root.putArray("input")
    batch.foreach(input.add)
    val reqBuilder = HttpRequest.newBuilder()
      .uri(URI.create(s"${endpoint.stripSuffix("/")}/embeddings"))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root)))
    apiKey.foreach(k => reqBuilder.header("Authorization", s"Bearer $k"))
    val resp =
      try http.send(reqBuilder.build(), HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw RetryableModelError(s"connection error: ${e.getMessage}", e)
      }
    resp.statusCode() match {
      case 200 => parseEmbeddings(resp.body(), batch.size)
      case s => classifyFailure(s, resp.body())
    }
  }

  private def parseEmbeddings(body: String, expected: Int): Seq[Array[Float]] = {
    val node =
      try mapper.readTree(body)
      catch {
        case e: Exception =>
          throw PermanentModelError(s"unparseable response body: ${e.getMessage}")
      }
    val usageNode = node.path("usage")
    promptTokens.addAndGet(usageNode.path("prompt_tokens").asLong(0))
    val data = node.path("data")
    if (!data.isArray || data.size() != expected)
      throw PermanentModelError(
        s"embeddings response has ${data.size()} data entries for $expected inputs: ${body.take(200)}")
    val out = new Array[Array[Float]](expected)
    data.forEach { entry =>
      val i = entry.path("index").asInt(-1)
      if (i < 0 || i >= expected || out(i) != null)
        throw PermanentModelError(s"bad embeddings data index $i: ${body.take(200)}")
      val emb = entry.path("embedding")
      if (!emb.isArray)
        throw PermanentModelError(s"data[$i].embedding is not an array: ${body.take(200)}")
      val v = new Array[Float](emb.size())
      var j = 0
      while (j < v.length) { v(j) = emb.get(j).floatValue(); j += 1 }
      out(i) = v
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Cohere-style public `POST /rerank` (the cross-encoder
    * second-stage ranker): `{model, query, documents, top_n}` with
    * `top_n = documents.size` so every input is scored. Scores return
    * in INPUT order — the response's `results[].index` is
    * authoritative (providers sort by relevance). Usage accounting
    * accepts both the OpenAI-ish `usage.prompt_tokens` and Cohere's
    * `meta.billed_units.input_tokens`; retry classification is the
    * chat surface's.
    */
  override def rerank(query: String, docs: Seq[String]): Seq[Double] = {
    if (docs.isEmpty) return Seq.empty
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("query", query)
    val documents = root.putArray("documents")
    docs.foreach(documents.add)
    root.put("top_n", docs.size)
    val reqBuilder = HttpRequest.newBuilder()
      .uri(URI.create(s"${endpoint.stripSuffix("/")}/rerank"))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(root)))
    apiKey.foreach(k => reqBuilder.header("Authorization", s"Bearer $k"))
    val resp =
      try http.send(reqBuilder.build(), HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw RetryableModelError(s"connection error: ${e.getMessage}", e)
      }
    resp.statusCode() match {
      case 200 => parseRerank(resp.body(), docs.size)
      case s => classifyFailure(s, resp.body())
    }
  }

  private def parseRerank(body: String, expected: Int): Seq[Double] = {
    val node =
      try mapper.readTree(body)
      catch {
        case e: Exception =>
          throw PermanentModelError(s"unparseable response body: ${e.getMessage}")
      }
    promptTokens.addAndGet(math.max(
      node.path("usage").path("prompt_tokens").asLong(0),
      node.path("meta").path("billed_units").path("input_tokens").asLong(0)))
    val results = node.path("results")
    if (!results.isArray || results.size() != expected)
      throw PermanentModelError(
        s"rerank response has ${results.size()} results for $expected documents: ${body.take(200)}")
    val out = new Array[java.lang.Double](expected)
    results.forEach { entry =>
      val i = entry.path("index").asInt(-1)
      if (i < 0 || i >= expected || out(i) != null)
        throw PermanentModelError(s"bad rerank result index $i: ${body.take(200)}")
      val s = entry.path("relevance_score")
      if (!s.isNumber)
        throw PermanentModelError(
          s"results[$i].relevance_score is not a number: ${body.take(200)}")
      out(i) = s.doubleValue()
    }
    out.map(_.doubleValue()).toSeq
  }

  private def parseContent(body: String): String = {
    val node =
      try mapper.readTree(body)
      catch {
        case e: Exception =>
          throw PermanentModelError(s"unparseable response body: ${e.getMessage}")
      }
    val usageNode = node.path("usage")
    promptTokens.addAndGet(usageNode.path("prompt_tokens").asLong(0))
    completionTokens.addAndGet(usageNode.path("completion_tokens").asLong(0))
    val content = node.path("choices").path(0).path("message").path("content")
    if (content.isMissingNode || content.isNull)
      throw PermanentModelError(s"response has no choices[0].message.content: ${body.take(200)}")
    content.asText()
  }
}

/** Transient failure — safe and expected to retry (429 / 5xx / IO). */
final case class RetryableModelError(message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)

/** Permanent failure — retrying an invalid request burns quota (4xx,
  * malformed response).
  */
final case class PermanentModelError(message: String)
  extends RuntimeException(message)
