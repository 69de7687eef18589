package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Run/log analytics operators — the Spark-native restatement of the
  * reference's BuilderQuery / OutcomeAggregator / runtime-logs surface
  * (`core/framework/builder/query.py:222-282`,
  * `core/framework/runtime/outcome_aggregator.py:225-295`,
  * `tools/src/aden_tools/tools/runtime_logs_tool/runtime_logs_tool.py`).
  *
  * Every operator is a single declarative plan: partial (map-side)
  * aggregation, broadcast of small sides, and top-k as
  * TakeOrderedAndProject all come from Catalyst, so each one scales to
  * 100 TB without code changes.
  */
object Analytics {

  /** Success rate per group — `len(completed)/len(runs)`
    * (`query.py:241-243`), as one hash aggregate.
    */
  def successRate(df: DataFrame, isSuccess: Column, groupCols: Seq[String],
      scale: Int = 4): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_total"),
        round(avg(when(isSuccess, 1.0).otherwise(0.0)), scale).as("success_rate"))

  /** Top-k most common failures (`query.py:246-253`): count by error
    * key, sort desc, take k. Catalyst plans the limit as
    * TakeOrderedAndProject — only k rows per partition ever move.
    */
  def topFailures(df: DataFrame, isFailure: Column, errorKey: Column, k: Int = 5): DataFrame =
    df.filter(isFailure)
      .groupBy(errorKey.as("error_key"))
      .agg(count(lit(1)).as("n_failures"))
      .orderBy(desc("n_failures"), asc("error_key"))
      .limit(k)

  /** Problematic-node ranking (`query.py:256-270`): per-key totals and
    * failure counts → failure rate, threshold filter, rank desc.
    */
  def failureRanking(df: DataFrame, keyCol: String, isFailure: Column,
      threshold: Double = 0.1, scale: Int = 4): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(isFailure, 1L).otherwise(0L)).as("n_failed"))
      .withColumn("failure_rate",
        round(col("n_failed").cast("double") / col("n_total"), scale))
      .filter(col("failure_rate") > threshold)
      .orderBy(desc("failure_rate"), asc(keyCol))

  /** Weighted progress (`outcome_aggregator.py:246-270`):
    * Σ wᵢ·pᵢ / Σ wᵢ with the reference's `max(1, …)` zero-guard
    * (`outcome_aggregator.py:283-295`). Pure column math — no UDAF.
    */
  def weightedProgress(df: DataFrame, weight: Column, progress: Column,
      groupCols: Seq[String], scale: Int = 4): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(round(
        sum(weight * progress) / greatest(sum(weight), lit(1.0)), scale)
        .as("weighted_progress"))

  /** Outcome metrics with count-distinct (`outcome_aggregator.py:283-295`).
    * `exact = false` switches to HyperLogLog (`approx_count_distinct`) —
    * the only version that should run at 100 TB.
    */
  def distinctMetrics(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val aggs = cols.map { c =>
      (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
        .as(s"n_distinct_$c")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Weighted risk scoring + letter grade (`risk_scorer.py:25-120`):
    * per-check points via a `when` ladder, weighted category sum,
    * grade buckets A–F — all column arithmetic.
    */
  def gradeLadder(score: Column): Column =
    when(score >= 90, "A").when(score >= 80, "B").when(score >= 70, "C")
      .when(score >= 60, "D").otherwise("F")

  /** One scoring check: when `predicate` holds, `points` accrue to
    * `category` (`risk_scorer.py:25-120` — e.g. SSL checks worth
    * 25/30/10/20/15 points).
    */
  final case class RiskCheck(category: String, predicate: Column, points: Double)

  /** Full weighted risk score (`risk_scorer.py:25-120, 181-…`):
    * per-category points (capped at 100), weighted by the category
    * weight table, plus the A–F grade. Pure column arithmetic — one
    * projection, no UDF, no shuffle.
    */
  def riskScore(df: DataFrame, checks: Seq[RiskCheck],
      categoryWeights: Map[String, Double],
      scoreCol: String = "risk_score", gradeCol: String = "risk_grade"): DataFrame = {
    val byCategory = checks.groupBy(_.category)
    val overall = categoryWeights.toSeq.sortBy(_._1).map { case (cat, w) =>
      val pts = byCategory.getOrElse(cat, Nil)
        .map(c => when(c.predicate, c.points).otherwise(0.0))
        .reduceOption(_ + _).getOrElse(lit(0.0))
      least(pts, lit(100.0)) * w
    }.reduce(_ + _)
    df.withColumn(scoreCol, round(overall, 2))
      .withColumn(gradeCol, gradeLadder(col(scoreCol)))
  }

  /** Histogram (`query.py:439-468`): counts by key. */
  def histogram(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(keyCols.map(col): _*)

  /** Top-n rows per group via `row_number` — the reference's
    * recent-history tails (`runtime_logs_tool.py:135-138`,
    * `shared_state.py:341-343`) generalized. Shuffles once on the
    * partition keys; no global sort.
    */
  def topNPerGroup(df: DataFrame, partitionCols: Seq[String],
      orderBy: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n).drop("rn")
  }

  /** Trailing-window stall detector (`event_loop_node.py:1823-1829`):
    * true when the last `threshold` consecutive values in arrival order
    * are identical and non-empty. Lag-based, one shuffle on the key.
    */
  def stallFlag(valueCol: Column, orderCols: Seq[Column], partitionCols: Seq[Column],
      threshold: Int = 3): Column = {
    require(threshold >= 2, s"stall threshold must be >= 2, got $threshold")
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val allSame = (1 until threshold)
      .map(i => lag(valueCol, i).over(w) === valueCol)
      .reduce(_ && _)
    coalesce(allSame && length(valueCol) > 0, lit(false))
  }

  /** Tool doom-loop detector (W2, `event_loop_node.py:1884-1928`):
    * flags a turn when the last `threshold` consecutive turn
    * fingerprints are identical. A turn fingerprint is the
    * order-sensitive hash of its (tool, canonical-json-args) call
    * sequence (`:1895-1899`) — canonical JSON via the custom
    * expression so key order never breaks equality.
    *
    * Input: one row per tool call with (session, turn, callIdx, tool,
    * argsJson). Output: per (session, turn) with `doom_loop` flag.
    */
  def doomLoopFlags(calls: DataFrame, sessionCol: String, turnCol: String,
      callIdxCol: String, toolCol: String, argsJsonCol: String,
      threshold: Int = 3): DataFrame = {
    require(threshold >= 2, s"doom-loop threshold must be >= 2, got $threshold")
    val fp = calls
      .withColumn("__canon",
        concat_ws("|", col(toolCol),
          coalesce(graft.functions.CatalystExpressions.canonicalJson(col(argsJsonCol)),
            col(argsJsonCol))))
      .groupBy(col(sessionCol), col(turnCol))
      .agg(xxhash64(concat_ws(";",
        array_sort(collect_list(struct(col(callIdxCol), col("__canon"))))
          .getField("__canon"))).as("turn_fp"))
    val w = Window.partitionBy(col(sessionCol)).orderBy(col(turnCol))
    val same = (1 until threshold)
      .map(i => lag(col("turn_fp"), i).over(w) === col("turn_fp"))
      .reduce(_ && _)
    fp.withColumn("doom_loop", coalesce(same, lit(false)))
  }
}
