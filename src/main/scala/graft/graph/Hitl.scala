package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed HITL (human-in-the-loop) pause/resume protocol — parity with
  * the reference's standardized HITL module
  * (`core/framework/graph/hitl.py:13-223`): a pause node produces a
  * typed [[HitlRequest]] (questions of type free_text / structured /
  * selection / approval / multi_field), the executor persists state
  * and surfaces the request; the human's [[HitlResponse]] is validated
  * and merged into the resumed node's context.
  *
  * Spark restatement: the request also materializes as a DataFrame
  * (one row per question — the queryable "what is this run waiting
  * on" surface across thousands of paused runs), and the response's
  * answers are injected into the paused node's input as `hitl_<id>`
  * columns, which is the engine-side analog of
  * `hitl.py`'s "merges into context".
  */
object Hitl {

  /** `hitl.py:24-40` (`HITLQuestion`). */
  final case class HitlQuestion(
      id: String,
      question: String,
      inputType: String = "free_text",
      options: Seq[String] = Nil, // for selection
      fields: Map[String, String] = Map.empty, // for structured
      required: Boolean = true,
      helpText: String = "")

  /** `hitl.py:43-68` (`HITLRequest`). */
  final case class HitlRequest(
      objective: String,
      currentState: String = "Awaiting clarification",
      questions: Seq[HitlQuestion] = Nil,
      missingInfo: Seq[String] = Nil,
      instructions: String = "",
      examples: Seq[String] = Nil,
      requestId: String = "",
      nodeId: String = "")

  /** `hitl.py:92-110` (`HITLResponse`). */
  final case class HitlResponse(
      requestId: String,
      answers: Map[String, String] = Map.empty,
      rawInput: String = "",
      responseTimeMs: Long = 0)

  val InputTypes: Set[String] =
    Set("free_text", "structured", "selection", "approval", "multi_field")

  /** `HITLProtocol.create_request` (`hitl.py:132-146`), including its
    * request-id convention.
    */
  def createRequest(objective: String, questions: Seq[HitlQuestion],
      missingInfo: Seq[String] = Nil, nodeId: String = ""): HitlRequest = {
    questions.foreach(q => require(InputTypes.contains(q.inputType),
      s"unknown input type '${q.inputType}' on question '${q.id}'"))
    HitlRequest(
      objective = objective,
      questions = questions,
      missingInfo = missingInfo,
      requestId = s"${nodeId}_${math.abs(objective.hashCode) % 10000}",
      nodeId = nodeId)
  }

  /** `HITLProtocol.parse_response` (`hitl.py:148-222`): with a model
    * client, ask it to extract per-question answers as JSON (the
    * reference's Haiku-parse step — tests plug
    * [[graft.llm.SemanticOps.DeterministicStub]]); without one — or if
    * the extraction comes back unusable — fall back to treating the
    * raw input as the first question's answer (`hitl.py:167-172`).
    */
  def parseResponse(rawInput: String, request: HitlRequest,
      client: Option[graft.llm.SemanticOps.ModelClient] = None): HitlResponse = {
    val base = HitlResponse(requestId = request.requestId, rawInput = rawInput)
    if (request.questions.isEmpty) base
    else {
      val fallback = base.copy(answers = Map(request.questions.head.id -> rawInput))
      client match {
        case None => fallback
        case Some(c) =>
          val qs = request.questions.zipWithIndex
            .map { case (q, i) => s"${i + 1}. ${q.question} (id: ${q.id})" }
            .mkString("\n")
          val prompt =
            s"""Parse the user's response and extract answers for each question.
               |Questions asked:
               |$qs
               |User's response:
               |$rawInput
               |Output JSON with question IDs as keys.""".stripMargin
          try {
            val raw = c.complete(Seq(prompt)).head
            val m = java.util.regex.Pattern.compile("\\{[^{}]*\\}", java.util.regex.Pattern.DOTALL)
              .matcher(raw)
            if (!m.find()) fallback
            else {
              implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
              val parsed = org.json4s.jackson.JsonMethods.parse(m.group())
                .extract[Map[String, String]]
              if (parsed.isEmpty) fallback else base.copy(answers = parsed)
            }
          } catch { case _: Exception => fallback }
      }
    }
  }

  /** Typed validation the reference leaves to the pause node: required
    * questions answered; selection answers drawn from the options;
    * approval answers in yes/no/modify. Empty = valid.
    */
  def validate(request: HitlRequest, response: HitlResponse): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (response.requestId != request.requestId)
      errs += s"response is for '${response.requestId}', request is '${request.requestId}'"
    request.questions.foreach { q =>
      response.answers.get(q.id) match {
        case None | Some("") =>
          if (q.required) errs += s"required question '${q.id}' unanswered"
        case Some(a) => q.inputType match {
          case "selection" =>
            if (!q.options.contains(a))
              errs += s"'${q.id}': '$a' is not one of ${q.options.mkString("[", ", ", "]")}"
          case "approval" =>
            if (!Set("yes", "no", "modify").contains(a.toLowerCase))
              errs += s"'${q.id}': approval must be yes/no/modify, got '$a'"
          case _ => ()
        }
      }
    }
    errs.result()
  }

  /** User-facing rendering of a request
    * (`HITLProtocol.format_for_display`, `hitl.py:222-255`): objective,
    * state, instructions, numbered questions with help/options,
    * missing info and examples.
    */
  def formatForDisplay(request: HitlRequest): String = {
    val parts = Seq.newBuilder[String]
    if (request.objective.nonEmpty) parts += s"📋 Objective: ${request.objective}"
    if (request.currentState.nonEmpty) parts += s"📍 Current State: ${request.currentState}"
    if (request.instructions.nonEmpty) parts += s"\n${request.instructions}"
    if (request.questions.nonEmpty) {
      parts += s"\n❓ Questions (${request.questions.size}):"
      request.questions.zipWithIndex.foreach { case (q, i) =>
        parts += s"${i + 1}. ${q.question}"
        if (q.helpText.nonEmpty) parts += s"   💡 ${q.helpText}"
        if (q.options.nonEmpty) parts += s"   Options: ${q.options.mkString(", ")}"
      }
    }
    if (request.missingInfo.nonEmpty) {
      parts += "\n📝 Missing Information:"
      request.missingInfo.foreach(info => parts += s"  • $info")
    }
    if (request.examples.nonEmpty) {
      parts += "\n📚 Examples:"
      request.examples.foreach(ex => parts += s"  • $ex")
    }
    parts.result().mkString("\n")
  }

  /** The request as rows — one per question, with the request context
    * denormalized on. Across many paused runs this is the operational
    * table: "every question every paused run is waiting on".
    */
  def requestRows(spark: SparkSession, request: HitlRequest): DataFrame = {
    import spark.implicits._
    request.questions.map(q => (request.requestId, request.nodeId,
        request.objective, request.currentState, q.id, q.question,
        q.inputType, q.options, q.required, q.helpText))
      .toDF("request_id", "node_id", "objective", "current_state",
        "question_id", "question", "input_type", "options", "required", "help_text")
  }

  private implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats

  def writeRequest(checkpointDir: String, request: HitlRequest): Unit = {
    val json = org.json4s.jackson.Serialization.writePretty(request)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$checkpointDir/hitl_request.json"), json.getBytes("UTF-8"))
    ()
  }

  def readRequest(checkpointDir: String): Option[HitlRequest] = {
    val p = java.nio.file.Paths.get(s"$checkpointDir/hitl_request.json")
    if (!java.nio.file.Files.exists(p)) None
    else Some(org.json4s.jackson.JsonMethods
      .parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      .extract[HitlRequest])
  }

  def writeResponse(checkpointDir: String, response: HitlResponse): Unit = {
    val json = org.json4s.jackson.Serialization.writePretty(response)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$checkpointDir/hitl_response.json"), json.getBytes("UTF-8"))
    ()
  }

  def readResponse(checkpointDir: String): Option[HitlResponse] = {
    val p = java.nio.file.Paths.get(s"$checkpointDir/hitl_response.json")
    if (!java.nio.file.Files.exists(p)) None
    else Some(org.json4s.jackson.JsonMethods
      .parse(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      .extract[HitlResponse])
  }

  /** Run until `request.nodeId`, persist execution state AND the typed
    * request (steps 1-2 of the protocol, `hitl.py:123-128`).
    */
  def pauseWithRequest(spec: GraphSpec, input: DataFrame,
      registry: GraphExecutor.Registry, checkpointDir: String,
      request: HitlRequest): GraphExecutor.GraphResult = {
    require(request.nodeId.nonEmpty, "request.nodeId must name the pause node")
    val r = GraphExecutor.run(spec, input, registry,
      pauseBefore = Set(request.nodeId), checkpointDir = Some(checkpointDir))
    if (r.pausedAt.contains(request.nodeId)) writeRequest(checkpointDir, request)
    r
  }

  /** Steps 3-4 of the protocol: validate the human's response against
    * the persisted request, record it, and resume — the paused node's
    * transform sees every answer as a `hitl_<questionId>` column on
    * its input (context merge, `hitl.py:128`).
    */
  def resumeWithResponse(spec: GraphSpec, spark: SparkSession,
      checkpointDir: String, registry: GraphExecutor.Registry,
      response: HitlResponse): GraphExecutor.GraphResult = {
    val request = readRequest(checkpointDir).getOrElse(
      throw GraphExecutor.GraphError(s"no HITL request at $checkpointDir"))
    val errs = validate(request, response)
    if (errs.nonEmpty)
      throw GraphExecutor.GraphError(s"invalid HITL response: ${errs.mkString("; ")}")
    writeResponse(checkpointDir, response)
    def inject(df: DataFrame): DataFrame =
      response.answers.toSeq.sortBy(_._1).foldLeft(df) {
        case (d, (qid, answer)) => d.withColumn(s"hitl_$qid", lit(answer))
      }
    val node = request.nodeId
    // resolve like the executor does — node entry, then the "*"
    // wildcard — so installing the injection never shadows a catch-all
    // transform
    val augmented: GraphExecutor.Registry =
      registry.get(node).orElse(registry.get("*")) match {
        case Some(fn) => registry.updated(node, (df: DataFrame) => fn(inject(df)))
        case None => registry.updated(node, (df: DataFrame) => inject(df))
      }
    GraphExecutor.resume(spec, spark, checkpointDir, augmented)
  }
}
