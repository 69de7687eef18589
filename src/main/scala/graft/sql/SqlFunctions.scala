package graft.sql

import org.apache.spark.sql.{Column, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.bridge.{catalystOf, columnOf}
import graft.functions.{CatalystExpressions => CE, TextFunctions => TF}

/** SQL bindings for the engine's scalar kernels.
  *
  * The reference's ONLY user-facing query surface is SQL
  * (`csv_tool.py:274-386`, `excel_tool.py:474-655`): its users compose
  * DuckDB functions inside SELECTs. This registers graft's pure scalar
  * kernels — URL canonicalization, text quality/sentiment/language
  * scoring, token estimation, fingerprints — as session temp functions
  * so a [[QueryGate.sql]] user writes `SELECT quality_score(text) …`
  * the same way. Every binding is the SAME codegen'd Catalyst
  * expression the Scala API uses (no UDF wrapper, no codegen
  * fallback), so a SQL-authored pipeline keeps the Scala pipeline's
  * plan shape at 100 TB.
  *
  * Registration is session-scoped and idempotent
  * (`createOrReplaceTempFunction`); call [[register]] once per session
  * (e.g. right after building it).
  */
object SqlFunctions {

  /** name → unary column builder; the single source of truth for what
    * gets registered (QueryGateSpec walks this list).
    */
  val Bindings: Seq[(String, Column => Column)] = Seq(
    // URL curation (UrlOps kernels)
    "canonical_url" -> (CE.canonicalUrl(_)),
    "url_domain" -> (CE.urlDomain(_)),
    // normalization + fingerprints (dedup kernels)
    "nfc_normalize" -> (CE.normalizeNfc(_)),
    "fix_mojibake" -> (CE.fixMojibake(_)),
    "simhash64" -> (c => CE.simhash64(CE.tokenHashes(c))),
    "dhash64" -> (graft.operators.Multimodal.dhash64Col(_)),
    "audiohash64" -> (graft.operators.Multimodal.audioHash64Col(_)),
    "textiness" -> (graft.operators.Multimodal.textinessCol(_)),
    "canonical_json" -> (CE.canonicalJson(_)),
    "deflate_ratio" -> (CE.deflateRatio(_)),
    // text analysis (TextFunctions kernels)
    "graft_tokenize" -> (TF.tokens(_)),
    "token_count" -> (TF.tokenCount(_)),
    "estimate_tokens" -> (TF.estimateTokens(_)),
    "sentiment_score" -> (TF.sentimentScore(_)),
    "quality_score" -> (TF.qualityScore(_)),
    "lang_id" -> (TF.langIdHeuristic(_)))

  private def unary(name: String, fn: Column => Column): Seq[Expression] => Expression = {
    case Seq(e) => catalystOf(fn(columnOf(e)))
    case es => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${es.length}")
  }

  /** The FunctionRegistry-shaped builders — what [[register]] and
    * [[graft.plans.GraftExtensions]]'s `injectFunction` both consume.
    */
  def builders: Seq[(String, Seq[Expression] => Expression)] =
    Bindings.map { case (name, fn) => name -> unary(name, fn) }

  // Sessions already registered: weak keys so a dropped session never
  // leaks through this guard. Registering is cheap but NOT silent —
  // re-registration logs a "replaced a temporary function" warning per
  // binding, which pollutes stdout-parsed channels (Bench's JSON line)
  // when callers register per query construction.
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register every binding on the session — once; repeat calls on the
    * same session are no-ops. The session is marked AFTER the loop
    * completes (under the map's lock), so a mid-registration failure
    * or a concurrent first call can never strand the session with a
    * partial binding set that later calls refuse to repair.
    */
  def register(spark: SparkSession): Unit = registered.synchronized {
    if (!registered.containsKey(spark)) {
      builders.foreach { case (name, b) =>
        GraftSqlShim.registerFunction(spark, name, b)
      }
      registered.put(spark, java.lang.Boolean.TRUE)
    }
  }
}
