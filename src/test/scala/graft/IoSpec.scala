package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.io.{CsvSource, ExcelSource, LogSource}

class IoSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-io").toString

  // ------------------------------------------------------------- csv

  test("csv read raw (all strings) vs inferred, FIXTURES.md basic.csv") {
    val p = s"$tmp/basic.csv"
    Files.writeString(Paths.get(p), "name,age,city\nAlice,30,NYC\nBob,25,LA\nCharlie,35,Chicago\n")
    val raw = CsvSource.read(spark, p)
    assert(raw.schema.fields.forall(_.dataType.typeName == "string"))
    val inferred = CsvSource.read(spark, p, inferSchema = true)
    assert(inferred.schema("age").dataType.typeName == "integer")
    assert(raw.count() == 3)
  }

  test("csv pagination: offset/limit in file order + total (`csv_tool.py:15-88`)") {
    val p = s"$tmp/large.csv"
    val body = (1 to 100).map(i => s"$i,val_$i").mkString("\n")
    Files.writeString(Paths.get(p), s"id,value\n$body\n")
    val page = CsvSource.readPage(spark, p, offset = 10, limit = 5)
    assert(page.totalRows == 100)
    assert(page.columns == Seq("id", "value"))
    assert(page.rows.collect().map(_.getString(0)).toSeq == Seq("11", "12", "13", "14", "15"))
  }

  test("csv write drops undeclared columns; append conforms to header") {
    val p = s"$tmp/out_csv"
    val df = Seq(("a", 1, "x"), ("b", 2, "y")).toDF("name", "age", "extra")
    CsvSource.write(df, p, Seq("name", "age"))
    val back = CsvSource.read(spark, p)
    assert(back.columns.toSeq == Seq("name", "age"))
    CsvSource.append(spark, Seq(("c", "9", "z")).toDF("name", "age", "junk"), p)
    assert(CsvSource.read(spark, p).count() == 3)
    val info = CsvSource.info(spark, p)
    assert(info.totalRows == 3 && info.fileSizeBytes > 0)
  }

  // ----------------------------------------------------------- jsonl

  test("jsonl read skips corrupt lines (`runtime_logs_tool.py:25-46`)") {
    val p = s"$tmp/details.jsonl"
    Files.writeString(Paths.get(p),
      """{"node_id": "a", "status": "completed", "started_at": "2024-01-01T00:00:00"}
        |not json at all {{{
        |{"node_id": "b", "status": "failed", "started_at": "2024-01-02T00:00:00"}
        |""".stripMargin)
    val df = LogSource.readJsonl(spark, p)
    assert(df.count() == 2)
    val logs = LogSource.queryLogs(spark, p, statusFilter = Some("failed"))
    assert(logs.count() == 1 && logs.head().getAs[String]("node_id") == "b")
  }

  test("grep search returns matching lines with file attribution") {
    val p = s"$tmp/code.txt"
    Files.writeString(Paths.get(p), "def foo():\n  return 1\ndef bar():\n  return 2\n")
    val hits = LogSource.grepSearch(spark, p, "def \\w+")
    assert(hits.count() == 2)
    assert(hits.head().getAs[String]("file").endsWith("code.txt"))
  }

  test("blob load_data: O(1) byte-offset page with UTF-8 boundary trim (`data_tools.py:68-170`)") {
    val p = s"$tmp/blob.txt"
    LogSource.saveData(p, "héllo wörld, ünïcode tëxt here")
    val full = LogSource.loadData(p)
    assert(full == "héllo wörld, ünïcode tëxt here")
    // é is 2 bytes (0xC3 0xA9); offset 2 lands mid-sequence → trimmed cleanly
    val page = LogSource.loadData(p, offsetBytes = 2, limitBytes = 9)
    assert(!page.contains("�") && page.nonEmpty)
    assert(LogSource.loadData(p, offsetBytes = 10000) == "")
  }

  // ----------------------------------------------------------- excel

  test("xlsx round-trip: write, sheet list, read, header semantics") {
    val p = s"$tmp/book.xlsx"
    val df = Seq((1, "widget", 9.99), (2, "gizmo", 19.5)).toDF("id", "name", "price")
    ExcelSource.write(df, p, sheet = "Q1 Report")
    assert(ExcelSource.sheetNames(p) == Seq("Q1 Report"))
    val back = ExcelSource.readSheet(spark, p, "Q1 Report")
    assert(back.columns.toSeq == Seq("id", "name", "price"))
    assert(back.count() == 2)
    assert(back.filter(col("name") === "widget").head().getString(2) == "9.99")
    // the driver-collect surface is capped with an explicit error
    // (never a silent OOM); a range frame drives the real constant
    val big = spark.range(ExcelSource.WriteMaxRows + 1L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      ExcelSource.write(big, s"$tmp/too-big.xlsx")
    }
    assert(e.getMessage.contains("caps at"))
  }

  test("foreign xlsx: shared strings, rich text, date serials, styles (`excel_tool.py:575-617`)") {
    // produced by scripts/make_xlsx_fixture.py in the shape real
    // Excel/openpyxl emits — NOT by ExcelSource.write
    val p = getClass.getResource("/fixtures/foreign.xlsx").getPath
    assert(ExcelSource.sheetNames(p) == Seq("Report Data", "Notes"))
    val df = ExcelSource.readSheet(spark, p, "Report Data")
    assert(df.columns.toSeq == Seq("name", "joined", "last_seen", "score", "active", "note"))
    val rows = df.collect().map(r => r.toSeq.map(_.asInstanceOf[String])).sortBy(_.head)
    assert(rows.length == 3)
    val alice = rows(0)
    // date serial 45321 under builtin format 14 -> ISO date
    assert(alice == Seq("Alice", "2024-01-30", "2024-01-30 12:00:00", "3.14", "true", "Hello World"))
    val bob = rows(1)
    // 25569 = unix epoch day; 0.75 under a time format -> time of day;
    // style 165 has an 'm' only inside quotes -> NOT a date; whitespace
    // in the shared string is preserved
    assert(bob == Seq("Bob", "1970-01-01", "18:00:00", "42", "false", "  padded  "))
    val carol = rows(2)
    // sparse row: only A and D cells exist in the XML
    assert(carol == Seq("Carol", "", "", "7", "", ""))
    // multi-sheet join against the second sheet still works
    val joined = ExcelSource.excelSql(spark, p,
      """SELECT d.name, d.score, n.region FROM data d JOIN Notes n ON d.name = n.name""",
      targetSheet = Some("Report Data"))
    assert(joined.count() == 2)
    assert(joined.filter(col("name") === "Bob").head().getString(2) == "APAC")
  }

  test("date serials: 1900 leap quirk and the 1904 (Mac) system") {
    // 1900 system: serial 59 = 1900-02-28, 61 = 1900-03-01 (serial 60
    // is the fictitious Feb 29); 1904 system counts from 1904-01-01
    assert(ExcelSource.serialToIso(59) == "1900-02-28")
    assert(ExcelSource.serialToIso(61) == "1900-03-01")
    assert(ExcelSource.serialToIso(25569) == "1970-01-01")
    // serials < 1 are time-of-day in either system (time-format cells)
    assert(ExcelSource.serialToIso(0.75, date1904 = true) == "18:00:00")
    assert(ExcelSource.serialToIso(30000, date1904 = true) == "1986-02-19")
    assert(ExcelSource.serialToIso(1.5, date1904 = true) == "1904-01-02 12:00:00")
  }

  test("excel_sql: sheets as tables, `data` alias, multi-sheet join (`excel_tool.py:505-508`)") {
    val sales = s"$tmp/sales.xlsx"
    val products = s"$tmp/products.xlsx"
    ExcelSource.write(Seq((1, 101, "2.5"), (2, 102, "1.0"), (3, 101, "4.0"))
      .toDF("sale_id", "product_id", "amount"), sales, "Sales")
    ExcelSource.write(Seq((101, "widget", "9.99"), (102, "gizmo", "19.5"))
      .toDF("id", "name", "price"), products, "Products")
    ExcelSource.registerWorkbook(spark, products)
    // register the target workbook last so `data` aliases its Sales sheet
    ExcelSource.registerWorkbook(spark, sales, Some("Sales"))
    val joined2 = graft.sql.QueryGate.sql(spark,
      """SELECT p.name, count(*) AS n FROM data s JOIN Products p
        |ON s.product_id = p.id GROUP BY p.name ORDER BY p.name""".stripMargin)
    val rows = joined2.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("gizmo", 1L), ("widget", 2L)))
  }

  test("excel append conforms to header; info reports shape (`excel_tool.py:231-418`)") {
    val p = s"$tmp/appendable.xlsx"
    ExcelSource.write(Seq((1, "a"), (2, "b")).toDF("id", "name"), p, "Data")
    ExcelSource.append(spark, Seq(("3", "c", "junk")).toDF("id", "name", "extra"), p, "Data")
    val back = ExcelSource.readSheet(spark, p, "Data")
    assert(back.count() == 3)
    assert(back.columns.toSeq == Seq("id", "name"))
    val info = ExcelSource.info(spark, p, "Data")
    assert(info.totalRows == 3 && info.columns == Seq("id", "name") && info.fileSizeBytes > 0)
  }

  test("edit_data replaces literal occurrences and reports count (`data_tools.py:313`)") {
    val p = s"$tmp/editable.txt"
    LogSource.saveData(p, "foo bar foo baz")
    assert(LogSource.editData(p, "foo", "qux") == 2)
    assert(LogSource.loadData(p) == "qux bar qux baz")
    assert(LogSource.editData(p, "missing", "x") == 0)
  }

  test("excel search match types (`excel_tool.py:705-756`)") {
    val df = Seq("Apple Pie", "apple sauce", "Banana").toDF("item")
    assert(ExcelSource.search(df, "item", "apple").count() == 2) // CI contains
    assert(ExcelSource.search(df, "item", "apple", "contains", caseSensitive = true).count() == 1)
    assert(ExcelSource.search(df, "item", "banana", "exact").count() == 1)
    assert(ExcelSource.search(df, "item", "apple", "starts_with").count() == 2)
    assert(ExcelSource.search(df, "item", "pie", "ends_with").count() == 1)
  }

  test("sheet name sanitization (`excel_tool.py:602-603`)") {
    assert(ExcelSource.sanitizeName("Q1 Report") == "Q1_Report")
  }
}
