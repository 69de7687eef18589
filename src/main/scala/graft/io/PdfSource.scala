package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** PDF text extraction — parity with the reference's pdf_read tool
  * (`tools/src/aden_tools/tools/pdf_read_tool/pdf_read_tool.py:90-…`):
  * per-page text with page-range selection (`'1-10'`, `'1,3,5'`,
  * `'2-'`), a `maxPages` guard, and optional metadata.
  *
  * The PDF decode kernel is a STUB (no pdf libs in this environment):
  * it deterministically "extracts" pages from the bytes. The Spark
  * plumbing — binaryFile scan, page-range algebra, per-page row
  * explosion via mapPartitions, per-file failure isolation — is real;
  * swapping in pdfbox changes only [[extractPagesStub]].
  */
object PdfSource {

  /** Parse the reference's page-range grammar: "3", "1-10", "1,3,5",
    * "2-", "-4", mixed "1,3-5,8-". 1-based, inclusive. Returns a
    * predicate on page number plus an optional upper bound hint.
    */
  def parsePageRanges(spec: String): Int => Boolean = {
    val trimmed = spec.trim
    if (trimmed.isEmpty || trimmed == "all") return _ => true
    val parts = trimmed.split(",").map(_.trim).filter(_.nonEmpty)
    val preds: Seq[Int => Boolean] = parts.toSeq.map {
      case p if p.matches("\\d+") => val n = p.toInt; (x: Int) => x == n
      case p if p.matches("\\d+-\\d+") =>
        val Array(a, b) = p.split("-").map(_.toInt); (x: Int) => x >= a && x <= b
      case p if p.matches("\\d+-") =>
        val a = p.dropRight(1).toInt; (x: Int) => x >= a
      case p if p.matches("-\\d+") =>
        val b = p.drop(1).toInt; (x: Int) => x <= b
      case p => throw new IllegalArgumentException(s"bad page range '$p'")
    }
    x => preds.exists(_(x))
  }

  val PageSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("page", IntegerType),
    StructField("text", StringType),
    StructField("ok", BooleanType),
    StructField("error", StringType)))

  /** STUB page extractor: deterministic page split of the bytes.
    * Real implementation: pdfbox `PDFTextStripper` per page.
    */
  private[graft] def extractPagesStub(bytes: Array[Byte]): Seq[String] = {
    if (bytes == null || bytes.length < 8)
      throw new IllegalArgumentException("truncated pdf")
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    // stub contract: pages separated by form-feed, else ~1KB chunks
    if (text.contains('\f')) text.split('\f').toSeq
    else text.grouped(1024).toSeq
  }

  /** Read PDFs under `dir` and return one row per selected page —
    * `pdf_read` semantics: range selection, `maxPages` cap, per-file
    * failure isolation (corrupt file → one error row, scan continues).
    */
  def readPages(spark: SparkSession, dir: String, pages: String = "all",
      maxPages: Int = 100, glob: String = "*.pdf"): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content")
    val keep = parsePageRanges(pages)
    val rdd = bin.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val path = row.getString(0)
        try {
          extractPagesStub(row.getAs[Array[Byte]](1))
            .zipWithIndex
            .map { case (t, i) => (i + 1, t) }
            .filter { case (p, _) => keep(p) }
            .take(maxPages)
            .map { case (p, t) => Row(path, p, t, true, null) }
        } catch {
          case e: Exception => Seq(Row(path, null, null, false, e.getMessage))
        }
      }
    }
    spark.createDataFrame(rdd, PageSchema)
  }
}
