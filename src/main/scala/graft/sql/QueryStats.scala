package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Query cost accounting — the engine-side analog of the BigQuery
  * tool's byte/row accounting (`bigquery_tool.py:149-275`: `max_rows`
  * cap + truncation flag, `total_bytes_processed`, dry-run estimates),
  * mapped onto Spark's native plan statistics and scan metrics (S6).
  */
object QueryStats {

  final case class Stats(
      rows: DataFrame, // ≤ maxRows
      truncated: Boolean, // `bigquery_tool.py:226-233`
      rowCount: Long,
      scannedBytes: Long, // post-pruning bytes the file scans picked up
      scannedFiles: Long)

  /** Dry-run estimate (`bigquery_tool.py` dry_run): bytes the file
    * scans would read, by listing files through each scan's partition
    * filters — so partition pruning is reflected — without running any
    * job. (Path-based reads prune at physical planning, so logical
    * leaf statistics would NOT show it.)
    */
  def dryRunBytes(df: DataFrame): Long =
    df.queryExecution.sparkPlan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        val staticPartFilters = s.partitionFilters.filterNot(
          _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]))
        s.relation.location.listFiles(staticPartFilters, s.dataFilters)
          .flatMap(_.files).map(_.getLen).sum
    }.sum

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Execute with a `max_rows` cap and return the result plus the
    * accounting: truncation flag (one row of lookahead, not a second
    * count), row count, and actual scan-side bytes/files — which
    * reflect partition pruning and pushdown, exactly the number a
    * 100 TB operator needs to see to know a query is NOT reading the
    * whole table.
    */
  def run(df: DataFrame, maxRows: Int): Stats = {
    val spark = df.sparkSession
    val probe = df.limit(maxRows + 1)
    val got = probe.collect()
    val truncated = got.length > maxRows
    val kept = got.take(maxRows).toSeq
    val scans = finalPlan(probe.queryExecution.executedPlan).collectWithSubqueries {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        (s.metrics.get("filesSize").map(_.value).getOrElse(0L),
          s.metrics.get("numFiles").map(_.value).getOrElse(0L))
    }
    Stats(
      rows = spark.createDataFrame(
        spark.sparkContext.parallelize(kept, math.max(1, kept.size / 10000)), df.schema),
      truncated = truncated,
      rowCount = kept.size.toLong,
      scannedBytes = scans.map(_._1).sum,
      scannedFiles = scans.map(_._2).sum)
  }
}
