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
  */
final class WebhookServer(spark: SparkSession, runtime: EntryPoints.EntryPointRuntime,
    port: Int = 0) {

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
        val body = new String(exchange.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
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
    } finally exchange.close()
  })

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
