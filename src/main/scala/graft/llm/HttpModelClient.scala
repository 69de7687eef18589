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
    requestTimeout: Duration = Duration.ofSeconds(120)) extends SemanticOps.ModelClient {

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

    val resp =
      try http.send(reqBuilder.build(), HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw RetryableModelError(s"connection error: ${e.getMessage}", e)
      }

    resp.statusCode() match {
      case 200 => parseContent(resp.body())
      case 429 =>
        throw RetryableModelError(s"rate limited (429): ${resp.body().take(200)}")
      case s if s >= 500 =>
        throw RetryableModelError(s"server error ($s): ${resp.body().take(200)}")
      case s =>
        throw PermanentModelError(s"request rejected ($s): ${resp.body().take(200)}")
    }
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
