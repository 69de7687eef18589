package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's table-SQL tools restated: load file → register view
  * `data` → SELECT-only gate → run (`csv_tool.py:274-386` csv_sql,
  * `excel_tool.py:474-655` excel_sql — the excel form lives in
  * [[graft.io.ExcelSource.excelSql]]).
  */
object TableSql {

  /** `csv_sql` parity: the csv becomes view `data`
    * (`csv_tool.py:358`), the query is gated to SELECT-only, schema
    * comes from DuckDB-style inference (`read_csv_auto` analog:
    * `inferSchema`).
    */
  def csvSql(spark: SparkSession, path: String, query: String,
      inferSchema: Boolean = true): DataFrame = {
    graft.io.CsvSource.read(spark, path, inferSchema).createOrReplaceTempView("data")
    QueryGate.sql(spark, query)
  }

  /** Same surface over parquet (the engine-native format). */
  def parquetSql(spark: SparkSession, path: String, query: String): DataFrame = {
    spark.read.parquet(path).createOrReplaceTempView("data")
    QueryGate.sql(spark, query)
  }

  /** JSONL logs as a SQL surface (`runtime_logs_tool` + gate). */
  def jsonlSql(spark: SparkSession, pathGlob: String, query: String): DataFrame = {
    graft.io.LogSource.readJsonl(spark, pathGlob).createOrReplaceTempView("data")
    QueryGate.sql(spark, query)
  }

  /** `max_rows` truncation with flag (O5, `bigquery_tool.py:226-233`):
    * up to `maxRows` rows plus whether the result was cut. One extra
    * row of lookahead instead of a second full count.
    */
  final case class TruncatedResult(rows: org.apache.spark.sql.DataFrame, truncated: Boolean)

  def limitWithFlag(df: org.apache.spark.sql.DataFrame, maxRows: Int): TruncatedResult = {
    val probe = df.limit(maxRows + 1)
    val truncated = probe.count() > maxRows
    TruncatedResult(probe.limit(maxRows), truncated)
  }
}
