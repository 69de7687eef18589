package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** CSV source/sink surface — parity with the reference's csv tool
  * (`tools/src/aden_tools/tools/csv_tool/csv_tool.py`).
  *
  * Two read modes, mirroring the reference's dual semantics (§2.1 S1 +
  * SURVEY §7.4 risk 5): raw (`csv.DictReader` — every column a string,
  * `csv_tool.py:50`) and inferred (`read_csv_auto`, `csv_tool.py:358`).
  *
  * Pagination contract (`csv_tool.py:15-88`): rows come back in file
  * order with `offset`/`limit`, plus a separate `total_rows` count.
  * File order is preserved per split and splits are ordered, so
  * zip-with-index pagination is deterministic and distributed (no
  * driver collect) — at 100 TB the offset lookup is a narrow pass.
  */
object CsvSource {

  final case class CsvPage(rows: DataFrame, totalRows: Long, columns: Seq[String])

  def read(spark: SparkSession, path: String, inferSchema: Boolean = false): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  /** Offset/limit page in stable file order + total count
    * (`csv_tool.py:15-88`: offset skip, limit take, second-pass total).
    */
  def readPage(spark: SparkSession, path: String, offset: Long, limit: Int,
      inferSchema: Boolean = false): CsvPage = {
    val df = read(spark, path, inferSchema)
    val indexed = df.rdd.zipWithIndex() // file order: splits are ordered, rows within split too
    val page = indexed
      .filter { case (_, i) => i >= offset && i < offset + limit }
      .map(_._1)
    CsvPage(spark.createDataFrame(page, df.schema), df.count(), df.columns.toSeq)
  }

  /** Write with declared column order; row fields outside `columns` are
    * dropped (`csv_tool.py:91-145` drops undeclared row keys).
    */
  def write(df: DataFrame, path: String, columns: Seq[String]): Unit =
    df.select(columns.map(col): _*)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Append conforming to the existing header (`csv_tool.py:148-212`):
    * extra columns dropped, missing columns null. Each part file keeps
    * its own header line (Spark's multi-file reader skips the first
    * line of every file when header=true).
    */
  def append(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val existing = read(spark, path).columns.toSeq
    val conformed = df.select(existing.map { c =>
      if (df.columns.contains(c)) col(c) else lit(null).cast("string").as(c)
    }: _*)
    conformed.write.mode("append").option("header", "true").csv(path)
  }

  final case class CsvInfo(columns: Seq[String], totalRows: Long, fileSizeBytes: Long)

  /** Metadata-only scan (`csv_tool.py:215-271`). */
  def info(spark: SparkSession, path: String): CsvInfo = {
    val df = read(spark, path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(new java.io.File(path).toURI.toString),
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val size =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getLen).sum
      else fs.getFileStatus(p).getLen
    CsvInfo(df.columns.toSeq, df.count(), size)
  }
}
