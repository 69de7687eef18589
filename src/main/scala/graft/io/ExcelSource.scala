package graft.io

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Excel (.xlsx) source/sink — parity with the reference's excel tool
  * (`tools/src/aden_tools/tools/excel_tool/excel_tool.py`), implemented
  * on the JDK's zip + XML (xlsx is a zip of XML parts), no external
  * deps.
  *
  * Reference semantics preserved:
  *  - every sheet becomes a queryable table; sheet names sanitized
  *    (spaces→`_`, `excel_tool.py:602-603`); the target sheet is also
  *    aliased as view `data` (`excel_tool.py:580-617`).
  *  - header from row 1; a missing header cell is named `Column_{i+1}`
  *    (`excel_tool.py:588-591`).
  *  - all values surface as strings (datetime→ISO/`str` coercion,
  *    `excel_tool.py:792-801`); type inference is the SQL engine's job.
  *
  * Scale note: xlsx is a driver-side format by construction (a zip
  * that must be centrally inflated, practically ≤100 MB). The parse
  * happens once on the driver and the rows are then distributed; bulk
  * data belongs in parquet/csv sources.
  */
object ExcelSource {

  // ------------------------------------------------------------ read

  private def readZip(path: String): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new FileInputStream(path))
    val out = mutable.Map.empty[String, Array[Byte]]
    try {
      var e: ZipEntry = zis.getNextEntry
      while (e != null) {
        val buf = new ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = zis.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = zis.read(chunk) }
        out(e.getName) = buf.toByteArray
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toMap
  }

  private def parseXml(bytes: Array[Byte]) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
  }

  private def elems(doc: org.w3c.dom.Document, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = doc.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  private def namesFrom(parts: Map[String, Array[Byte]]): Seq[String] =
    elems(parseXml(parts("xl/workbook.xml")), "sheet").map(_.getAttribute("name"))

  // ------------------------------------------------- date-serial cells

  /** Built-in number-format ids Excel renders as dates/times
    * (ECMA-376 §18.8.30).
    */
  private val BuiltinDateFormats: Set[Int] = ((14 to 22) ++ (27 to 36) ++ (45 to 47)).toSet

  /** A custom format code is a date format if, outside quoted literals
    * and `[...]` sections, it uses date/time tokens — the same
    * heuristic openpyxl applies to foreign workbooks.
    */
  private def isDateCode(code: String): Boolean = {
    val stripped = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "")
    stripped.exists(c => "ymdhsYMDHS".indexOf(c.toInt) >= 0)
  }

  /** Style indexes (the `s` attribute on cells) whose number format is
    * a date/time format, from `xl/styles.xml`. Real Excel/openpyxl
    * workbooks store dates as numeric serials + a date style — without
    * this mapping they'd surface as raw serial numbers.
    */
  private def dateStyles(parts: Map[String, Array[Byte]]): Set[Int] =
    parts.get("xl/styles.xml").map { bytes =>
      val doc = parseXml(bytes)
      val customDateIds = elems(doc, "numFmt")
        .filter(e => isDateCode(e.getAttribute("formatCode")))
        .map(_.getAttribute("numFmtId").toInt)
        .toSet
      val cellXfs = elems(doc, "cellXfs").headOption
        .map { xfs =>
          val nl = xfs.getElementsByTagName("xf")
          (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
        }
        .getOrElse(Seq.empty)
      cellXfs.zipWithIndex.collect {
        case (xf, i) if {
          val id = Option(xf.getAttribute("numFmtId")).filter(_.nonEmpty).map(_.toInt).getOrElse(0)
          BuiltinDateFormats.contains(id) || customDateIds.contains(id)
        } => i
      }.toSet
    }.getOrElse(Set.empty)

  /** Excel date serial → ISO string, matching what the reference sees
    * from openpyxl's datetime coercion (`excel_tool.py:792-801`): date
    * for whole serials, datetime otherwise, time-of-day for serials
    * < 1. In the default 1900 system the epoch juggling covers the
    * fictitious 1900-02-29 (serial 60); Mac-origin workbooks declare
    * `date1904` in workbookPr and count from 1904-01-01 (no leap bug).
    */
  private[graft] def serialToIso(serial: Double, date1904: Boolean = false): String = {
    val days = math.floor(serial).toLong
    var secs = math.round((serial - days) * 86400.0)
    if (serial < 1.0) java.time.LocalTime.ofSecondOfDay(math.min(secs, 86399L))
      .format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))
    else {
      val epoch =
        if (date1904) java.time.LocalDate.of(1904, 1, 1)
        else if (days < 60) java.time.LocalDate.of(1899, 12, 31)
        else java.time.LocalDate.of(1899, 12, 30)
      var date = epoch.plusDays(days)
      if (secs >= 86400L) { date = date.plusDays(1); secs -= 86400L }
      if (secs == 0L) date.toString
      else s"$date ${java.time.LocalTime.ofSecondOfDay(secs)
        .format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))}"
    }
  }

  /** Sheet names in workbook order (`excel_sheet_list`,
    * `excel_tool.py:420-472`).
    */
  def sheetNames(path: String): Seq[String] = namesFrom(readZip(path))

  private def columnIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /** Raw cell grid of one sheet, all values as strings. */
  def readSheetRows(path: String, sheet: String): Seq[Seq[String]] =
    rowsFrom(readZip(path), sheet)

  private def rowsFrom(parts: Map[String, Array[Byte]], sheet: String): Seq[Seq[String]] = {
    val wb = parseXml(parts("xl/workbook.xml"))
    val sheetsMeta = elems(wb, "sheet")
    val idx = sheetsMeta.indexWhere(_.getAttribute("name") == sheet)
    require(idx >= 0, s"sheet '$sheet' not found; have ${sheetsMeta.map(_.getAttribute("name"))}")
    val rid = sheetsMeta(idx).getAttribute("r:id")
    // resolve r:id -> worksheet part via the rels table
    val rels = parseXml(parts("xl/_rels/workbook.xml.rels"))
    val target = elems(rels, "Relationship")
      .find(_.getAttribute("Id") == rid)
      .map(_.getAttribute("Target"))
      .getOrElse(s"worksheets/sheet${idx + 1}.xml")
    val sheetPart = if (target.startsWith("/")) target.drop(1) else s"xl/$target"

    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml").map { ss =>
      elems(parseXml(ss), "si").map { si =>
        val ts = si.getElementsByTagName("t")
        (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
      }.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

    val doc = parseXml(parts(sheetPart))
    val dates = dateStyles(parts)
    // Mac-origin workbooks count serials from 1904-01-01
    val date1904 = elems(wb, "workbookPr").headOption
      .map(_.getAttribute("date1904"))
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
    elems(doc, "row").map { row =>
      val cells = row.getElementsByTagName("c")
      val byIdx = (0 until cells.getLength).map { i =>
        val c = cells.item(i).asInstanceOf[org.w3c.dom.Element]
        val ref = c.getAttribute("r")
        val t = c.getAttribute("t")
        val v = {
          val vs = c.getElementsByTagName("v")
          val is = c.getElementsByTagName("is")
          if (t == "inlineStr" && is.getLength > 0) is.item(0).getTextContent
          else if (vs.getLength > 0) {
            val raw = vs.item(0).getTextContent
            if (t == "s") shared(raw.toInt)
            else if (t == "b") (raw == "1").toString
            else if ((t.isEmpty || t == "n") && c.getAttribute("s").nonEmpty &&
                dates.contains(c.getAttribute("s").toInt) && raw.nonEmpty)
              serialToIso(raw.toDouble, date1904)
            else raw
          } else ""
        }
        columnIndex(ref) -> v
      }.toMap
      val width = if (byIdx.isEmpty) 0 else byIdx.keys.max + 1
      (0 until width).map(i => byIdx.getOrElse(i, ""))
    }
  }

  /** One sheet as a DataFrame: row 1 = header, missing header cells
    * named `Column_{i+1}` (`excel_tool.py:588-591`), all strings.
    */
  def readSheet(spark: SparkSession, path: String, sheet: String): DataFrame =
    sheetDf(spark, readZip(path), sheet)

  private def sheetDf(spark: SparkSession, parts: Map[String, Array[Byte]],
      sheet: String): DataFrame = {
    val rows = rowsFrom(parts, sheet)
    require(rows.nonEmpty, s"sheet '$sheet' is empty")
    val width = rows.map(_.size).max
    val header = rows.head.padTo(width, "").zipWithIndex.map {
      case (h, i) => if (h.trim.isEmpty) s"Column_${i + 1}" else h.trim
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = rows.tail.map(r => Row.fromSeq(r.padTo(width, "").take(width)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema)
  }

  /** Sheet-name sanitization (`excel_tool.py:602-603`). */
  def sanitizeName(sheet: String): String = sheet.replaceAll("\\s+", "_")

  /** Register every sheet as a temp view (sanitized name); the target
    * sheet additionally as view `data` (`excel_tool.py:580-617`).
    */
  def registerWorkbook(spark: SparkSession, path: String,
      targetSheet: Option[String] = None): Seq[String] = {
    // inflate + parse the zip once for the whole workbook
    val parts = readZip(path)
    val names = namesFrom(parts)
    val dfs = names.map(s => s -> sheetDf(spark, parts, s)).toMap
    dfs.foreach { case (s, df) => df.createOrReplaceTempView(sanitizeName(s)) }
    targetSheet.orElse(names.headOption).foreach { s =>
      dfs(s).createOrReplaceTempView("data")
    }
    names
  }

  /** `excel_sql` parity: register the workbook, gate to SELECT-only,
    * run (`excel_tool.py:474-655`). Multi-sheet joins just work — each
    * sheet is a view.
    */
  def excelSql(spark: SparkSession, path: String, query: String,
      targetSheet: Option[String] = None): DataFrame = {
    registerWorkbook(spark, path, targetSheet)
    graft.sql.QueryGate.sql(spark, query)
  }

  /** `excel_append` parity (`excel_tool.py:231-331`): append rows
    * conforming to the sheet's existing header (extra columns dropped,
    * missing columns empty), rewrite the workbook.
    */
  def append(spark: SparkSession, df: DataFrame, path: String, sheet: String): Unit = {
    val existing = readSheet(spark, path, sheet)
    val conformed = df.select(existing.columns.map { c =>
      if (df.columns.contains(c)) col(c).cast(StringType).as(c)
      else lit("").as(c)
    }.toIndexedSeq: _*)
    write(existing.unionByName(conformed), path, sheet)
  }

  final case class SheetInfo(sheet: String, columns: Seq[String],
      totalRows: Long, fileSizeBytes: Long)

  /** `excel_info` parity (`excel_tool.py:333-418`): header, data row
    * count, file size.
    */
  def info(spark: SparkSession, path: String, sheet: String): SheetInfo = {
    val df = readSheet(spark, path, sheet)
    SheetInfo(sheet, df.columns.toSeq, df.count(), new java.io.File(path).length())
  }

  /** `excel_search` match types (`excel_tool.py:705-756`): contains /
    * exact / starts_with / ends_with, case-insensitive by default.
    */
  def search(df: DataFrame, column: String, term: String,
      matchType: String = "contains", caseSensitive: Boolean = false): DataFrame = {
    val c0 = col(column)
    val (c, t) = if (caseSensitive) (c0, lit(term)) else (lower(c0), lit(term.toLowerCase))
    df.filter(matchType match {
      case "contains" => c.contains(t)
      case "exact" => c === t
      case "starts_with" => c.startsWith(t)
      case "ends_with" => c.endsWith(t)
      case other => throw new IllegalArgumentException(s"bad match_type '$other'")
    })
  }

  // ----------------------------------------------------------- write

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Hard cap on rows [[write]] will collect to the driver. xlsx is a
    * small-file interchange format — past this size the caller wants a
    * distributed sink (parquet/csv), and a clear error beats a silent
    * driver OOM. (The spreadsheet format itself tops out at ~1M rows.)
    */
  val WriteMaxRows: Int = 100000

  /** Minimal xlsx writer (`excel_write`, `excel_tool.py:148-229`):
    * one sheet, header row + string cells (inline strings). Collects to
    * the driver — xlsx is a small-file interchange format; this is the
    * export path, not a data sink (parquet/csv are). Refuses frames
    * over [[WriteMaxRows]] with an explicit error instead of OOMing
    * the driver.
    */
  def write(df: DataFrame, path: String, sheet: String = "Sheet1"): Unit = {
    val header = df.columns.toSeq
    // limit+1 bounds the probe itself: the full count is never needed
    val probe = df.limit(WriteMaxRows + 1).collect()
    require(probe.length <= WriteMaxRows,
      s"excel write collects to the driver and caps at $WriteMaxRows rows; " +
        s"this frame has more — write parquet/csv instead")
    val rows = probe.map(_.toSeq.map(v => if (v == null) "" else v.toString))
    val allRows = header +: rows.toSeq

    val sheetXml = {
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      allRows.zipWithIndex.foreach { case (r, i) =>
        sb ++= s"""<row r="${i + 1}">"""
        r.zipWithIndex.foreach { case (v, j) =>
          val colRef = {
            var n = j + 1; val s = new StringBuilder
            while (n > 0) { val rem = (n - 1) % 26; s.insert(0, ('A' + rem).toChar); n = (n - 1) / 26 }
            s.toString
          }
          sb ++= s"""<c r="$colRef${i + 1}" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
        }
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      sb.toString
    }
    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${xmlEscape(sheet)}" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val relsXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbookXml)
      put("xl/_rels/workbook.xml.rels", relsXml)
      put("xl/worksheets/sheet1.xml", sheetXml)
    } finally zos.close()
  }
}
