package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan}

/** SELECT-only SQL gate.
  *
  * The reference gates its SQL tools with a substring keyword denylist
  * (`csv_tool.py:333-352`, `excel_tool.py:542-561`) and, for BigQuery,
  * strips comments first (`bigquery_tool.py:43-58`). Substring matching
  * is both too strict (rejects `SELECT 'DROPPED'`) and too weak
  * (multi-statement tricks). We instead parse with Catalyst and walk
  * the logical plan: any DDL/DML node anywhere in the tree (including
  * inside CTEs/subqueries) is rejected. Comment stripping comes free
  * from the parser.
  */
object QueryGate {

  final case class RejectedQuery(reason: String)
    extends IllegalArgumentException(s"only SELECT queries are allowed: $reason")

  private val deniedNamePattern =
    ".*(Create|Drop|Alter|Insert|Delete|Update|Merge|Truncate|SetCommand|Refresh|Cache|Analyze).*".r

  /** Validate that `sql` parses to a pure query plan. Returns the
    * parsed plan on success, the rejection reason on failure.
    */
  def validate(spark: SparkSession, sql: String): Either[String, LogicalPlan] = {
    val parsed =
      try Right(spark.sessionState.sqlParser.parsePlan(sql))
      catch { case e: Exception => Left(s"parse error: ${e.getMessage}") }
    parsed.flatMap { plan =>
      val offending = plan.collectFirst {
        case c: Command => c.nodeName
        case i: InsertIntoStatement => i.nodeName
        case n if deniedNamePattern.matches(n.getClass.getSimpleName) =>
          n.getClass.getSimpleName
      }
      offending.toLeft(plan).left.map(n => s"statement contains non-SELECT node $n")
    }
  }

  /** Gate + execute. Throws [[RejectedQuery]] on anything non-SELECT. */
  def sql(spark: SparkSession, query: String): DataFrame =
    validate(spark, query) match {
      case Right(_)     => spark.sql(query)
      case Left(reason) => throw RejectedQuery(reason)
    }
}
