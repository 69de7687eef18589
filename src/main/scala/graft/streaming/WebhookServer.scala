package graft.streaming

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Webhook trigger surface — parity with the reference's webhook
  * server (`core/framework/runtime/webhook_server`, tested in
  * `runtime/tests/test_webhook_server.py`): an HTTP endpoint per
  * entry point; a POST body becomes the execution input.
  *
  * Built on the JDK's HttpServer (no deps). POST /hooks/<entryPoint>
  * with a JSON object body → one execution on that entry point's
  * stream (admission-capped like every trigger); responds 202 with the
  * execution id, 404 for unknown entry points, 405 for non-POST.
  *
  * Entry points with a configured secret require a GitHub-style
  * `X-Hub-Signature-256: sha256=<hex hmac-sha256 of the raw body>`
  * header (reference: `webhook_server` route.secret verification,
  * X-Hub-Signature-256); bad or missing signatures get 401 before the
  * payload is parsed or the runtime touched. Comparison is
  * constant-time. Entry points without a secret stay open.
  */
final class WebhookServer(spark: SparkSession, runtime: EntryPoints.EntryPointRuntime,
    port: Int = 0, secrets: Map[String, String] = Map.empty) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  @volatile private var accepted = 0L

  server.createContext("/hooks/", (exchange: HttpExchange) => {
    try {
      val path = exchange.getRequestURI.getPath.stripPrefix("/hooks/")
      // the path is attacker-controlled — escape it before it lands in
      // a JSON response body (response-injection hardening)
      val safePath = jsonEscape(path)
      if (exchange.getRequestMethod != "POST") respond(exchange, 405, """{"error":"POST only"}""")
      else {
        val rawBody = exchange.getRequestBody.readAllBytes()
        if (!signatureOk(path, rawBody, exchange))
          respond(exchange, 401, """{"error":"invalid or missing signature"}""")
        else {
        val body = new String(rawBody, java.nio.charset.StandardCharsets.UTF_8)
        try {
          val input = jsonToDf(body)
          runtime.trigger(path, input) // async; admission happens in the stream
          accepted += 1
          respond(exchange, 202, s"""{"status":"accepted","entry_point":"$safePath"}""")
        } catch {
          case _: IllegalArgumentException =>
            respond(exchange, 404, s"""{"error":"unknown entry point '$safePath'"}""")
          case e: Exception =>
            respond(exchange, 400, s"""{"error":"bad payload"}""")
        }
        }
      }
    } finally exchange.close()
  })

  /** True when `path` has no configured secret, or the request carries
    * a valid `X-Hub-Signature-256: sha256=<hex>` HMAC of the raw body.
    */
  private def signatureOk(path: String, rawBody: Array[Byte],
      exchange: HttpExchange): Boolean = secrets.get(path) match {
    case None => true
    case Some(secret) =>
      val header = Option(exchange.getRequestHeaders.getFirst("X-Hub-Signature-256"))
        .getOrElse("")
      if (!header.startsWith("sha256=")) false
      else {
        val expected = WebhookServer.hmacSha256Hex(secret, rawBody)
        java.security.MessageDigest.isEqual(
          header.stripPrefix("sha256=").toLowerCase.getBytes,
          expected.getBytes)
      }
  }

  /** One-row DataFrame from a flat JSON object (the webhook payload
    * shape); values surface as strings — type discipline is the
    * receiving node's job, like every external input.
    */
  private def jsonToDf(json: String): DataFrame = {
    import spark.implicits._
    val ds = spark.createDataset(Seq(if (json.trim.isEmpty) "{}" else json))
    val df = spark.read.json(ds)
    if (df.columns.isEmpty) Seq(1).toDF("__empty_payload") else df
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  def start(): Int = { server.start(); server.getAddress.getPort }
  def acceptedCount: Long = accepted
  def stop(): Unit = server.stop(0)
}

object WebhookServer {
  /** Hex HMAC-SHA256 of `body` under `secret` — what a legitimate
    * caller puts after `sha256=` in X-Hub-Signature-256.
    */
  def hmacSha256Hex(secret: String, body: Array[Byte]): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      secret.getBytes(java.nio.charset.StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(body).map(b => f"$b%02x").mkString
  }
}
