package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.{Connector, PdfSource}

class ConnectorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))
  private val rows = (1L to 25L).map(i => Row(i, s"item_$i"))

  test("connector read walks cursor pages into a DataFrame") {
    val df = Connector.read(spark, Connector.InMemoryTransport(rows),
      "items", schema, pageSize = 10)
    assert(df.count() == 25)
    assert(df.agg(sum(col("id"))).head().getLong(0) == (1L to 25L).sum)
  }

  test("connector read spills pages to parquet, bounding driver memory") {
    // 5000 rows with a 200-row spill threshold: the driver buffer can
    // never exceed ~one threshold's worth of rows; the result must be
    // complete and correct regardless of how many parts were flushed
    val big = (1L to 5000L).map(i => Row(i, s"item_$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft-spill").toString
    val df = Connector.read(spark, Connector.InMemoryTransport(big),
      "items", schema, pageSize = 100, ratePerSecond = 1e9,
      spillEveryRows = 200, spillDir = Some(dir))
    assert(df.count() == 5000)
    assert(df.agg(sum(col("id"))).head().getLong(0) == (1L to 5000L).sum)
    // spilling really happened: multiple parquet parts on disk (in a
    // per-read unique subdirectory, so shared spillDirs never mix reads)
    val readDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("read-"))
    assert(readDirs.length == 1, s"one unique subdir per read, saw ${readDirs.toSeq}")
    val parts = readDirs.head.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts >= 25, s"expected >=25 flushed parts, saw $parts")
    // and the result reads from the spill dir, not driver memory
    assert(df.inputFiles.forall(_.contains(dir)))
  }

  test("connector write sinks batches with retry on transient failure (ST12)") {
    Connector.InMemoryTransport.written.clear()
    Connector.InMemoryTransport.failNextWrites = 2
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val accepted = Connector.writeSink(df.coalesce(1),
      () => Connector.InMemoryTransport(Nil), "out", batchSize = 10)
    assert(accepted == 25)
    assert(Connector.InMemoryTransport.written.get("out").size() == 25)
  }

  test("connector write surfaces permanent failure after retries") {
    Connector.InMemoryTransport.written.clear()
    Connector.InMemoryTransport.failNextWrites = 99
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.take(5), 1), schema)
    intercept[org.apache.spark.SparkException] {
      Connector.writeSink(df, () => Connector.InMemoryTransport(Nil), "out",
        maxRetries = 2, backoffBaseMs = 1)
    }
    Connector.InMemoryTransport.failNextWrites = 0
  }

  test("pdf page-range grammar (`pdf_read_tool.py`)") {
    val r1 = PdfSource.parsePageRanges("1-3")
    assert(r1(1) && r1(3) && !r1(4))
    val r2 = PdfSource.parsePageRanges("1,3,5")
    assert(r2(1) && !r2(2) && r2(5))
    val r3 = PdfSource.parsePageRanges("4-")
    assert(!r3(3) && r3(4) && r3(99))
    val r4 = PdfSource.parsePageRanges("-2")
    assert(r4(1) && r4(2) && !r4(3))
    val r5 = PdfSource.parsePageRanges("1,3-4,8-")
    assert(r5(1) && !r5(2) && r5(3) && r5(4) && !r5(5) && r5(9))
    intercept[IllegalArgumentException] { PdfSource.parsePageRanges("x-y") }
  }

  test("pdf kernel: real PDFs — plain and FlateDecode streams, text operators") {
    val dir = new java.io.File(getClass.getResource("/fixtures/plain.pdf").getPath).getParent
    val df = PdfSource.readPages(spark, dir, glob = "*.pdf")
    val byFile = df.filter(col("ok")).collect()
      .groupBy(r => new java.io.File(r.getString(0).stripPrefix("file:")).getName)
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toSeq).toMap
    val plain = byFile("plain.pdf")
    assert(plain.size == 2)
    // Tj + T* newline + TJ array with kerning numbers and escaped parens
    assert(plain(0) == "Hello, first page!\nKerned text (grouped)")
    // octal escape \051 = ')', literal <hex> inside a string stays
    // text, and a real hex string decodes
    assert(plain(1) == "Second page\nline with ) octal and <68657821> followsworld")
    assert(byFile("flate.pdf") == Seq("Compressed stream says hi"))
    // PDF 1.5 layout — xref STREAM (PNG predictor 12) + page dicts in
    // a compressed /ObjStm — must extract the IDENTICAL text. The
    // fixture stores content streams in reverse byte order, so correct
    // page order here proves the page-tree walk (not the linear
    // stream scan) produced it.
    assert(byFile("xrefstream.pdf") == plain,
      "xref-stream layout must extract identical text in page-tree order")
    // LZWDecode, long enough that the 9->10-bit code-width change ran
    assert(byFile("lzw.pdf").size == 1 &&
      byFile("lzw.pdf").head.startsWith("LZW compressed page: token000") &&
      byFile("lzw.pdf").head.endsWith("token059"))
    // filter CHAIN applied in array order: ASCII85 first, then LZW
    assert(byFile("a85lzw.pdf") == Seq("chained filters decoded fine"))
    // CID font: 2-byte hex codes through the /ToUnicode CMap —
    // bfchar, bfrange with offset, bfrange with array, multi-unit dst
    assert(byFile("cid.pdf") == Seq("Hello fi"))
    // standard-handler RC4-128 encryption, empty user password: the
    // owner-locked-but-readable document decrypts and extracts
    assert(byFile("encrypted.pdf") == Seq("Owner-locked but readable"))
    // TWO fonts mapping the same code differently: per-font Tf-tracked
    // decoding gets "AZ"; a union CMap would garble one of them
    assert(byFile("cid2.pdf") == Seq("AZ"))
    // AES-256 (V5): empty-user-password files open without a password
    assert(byFile("aes256.pdf") == Seq("AES-256 secured but readable"))
    assert(byFile("aes256_r5.pdf") == Seq("AES-256 R5 legacy revision"))
    // password-to-open files surface as error rows on this no-password
    // read — never garbage
    assert(!byFile.contains("aes256_userpw.pdf") && !byFile.contains("rc4_userpw.pdf"))
  }

  test("pdf crypt: AES-256 (R6) and non-empty user passwords, fixture cross-validation") {
    // fixtures from scripts/make_pdf_fixture.py, whose crypto is an
    // INDEPENDENT implementation (hashlib + python-cryptography) of
    // ISO 32000-2 7.6.4 — reader and writer cross-validate
    val dir = new java.io.File(getClass.getResource("/fixtures/plain.pdf").getPath).getParent
    def texts(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.filter(col("ok")).collect().map(_.getString(2)).toSeq
    // R6 with the correct user password
    assert(texts(PdfSource.readPages(spark, dir, glob = "aes256_userpw.pdf",
      password = "s3cret-user")) == Seq("AES-256 password-locked text"))
    // R6 empty-user-password file ALSO opens via the owner password
    // (algorithm 12: /OE unwraps the same file key)
    assert(texts(PdfSource.readPages(spark, dir, glob = "aes256.pdf",
      password = "fixture-owner-256")) == Seq("AES-256 secured but readable"))
    // legacy RC4 (V2/R3) with a user password
    assert(texts(PdfSource.readPages(spark, dir, glob = "rc4_userpw.pdf",
      password = "legacy-pw")) == Seq("Legacy password-locked text"))
    // wrong password fails closed: one error row, no text
    val wrong = PdfSource.readPages(spark, dir, glob = "aes256_userpw.pdf",
      password = "not-the-password").collect()
    assert(wrong.length == 1 && !wrong.head.getAs[Boolean]("ok"))
    val wrongLegacy = PdfSource.readPages(spark, dir, glob = "rc4_userpw.pdf",
      password = "nope").collect()
    assert(wrongLegacy.length == 1 && !wrongLegacy.head.getAs[Boolean]("ok"))
  }

  test("pdf crypt: AES-128 object decryption and wrong-password refusal") {
    import graft.io.PdfCrypt
    // AES path: encrypt with javax.crypto the way a V4/AESV2 writer
    // would (per-object key + sAlT, IV-prefixed CBC), decrypt via the
    // kernel's Decryptor
    val fileKey = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    val plaintext = "BT (aes secret) Tj ET".getBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(fileKey)
    md.update(Array[Byte](9, 0, 0, 0, 0)) // obj 9 gen 0, little-endian
    md.update("sAlT".getBytes)
    val objKey = md.digest() // 16+5 caps at 16
    val iv = Array.tabulate[Byte](16)(_.toByte)
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    val stored = iv ++ cipher.doFinal(plaintext)
    val d = PdfCrypt.Decryptor(fileKey, aes = true)
    assert(d.decrypt(9, 0, stored).map(new String(_)) == Some(new String(plaintext)))
    // tampered ciphertext / wrong object number fails closed
    assert(d.decrypt(10, 0, stored).isEmpty) // wrong key -> bad padding
    // encrypted.pdf with a NON-empty user password requirement would
    // refuse: corrupt /U so the empty-password check fails
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/encrypted.pdf").getPath))
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val broken = raw.replaceFirst("/U <..", "/U <ff")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfSource.extractPdfPages(broken).isEmpty,
      "an undecryptable file must yield no pages, never garbage")
  }

  test("pdf kernel: ToUnicode CMap also applies on the linear-scan fallback") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/fixtures/cid.pdf").getPath))
    // break the xref so the linear scan handles the file
    val broken = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("startxref", "startxrfX").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfSource.extractPdfPages(broken) == Seq("Hello fi"))
  }

  test("pdf lzw/ascii85/asciihex decoders: unit round-trips and hostile input") {
    // ASCIIHex: whitespace ignored, odd nibble count pads with 0
    assert(PdfSource.asciiHexDecode("48 65 6C6C6F>".getBytes).map(new String(_))
      == Some("Hello"))
    assert(PdfSource.asciiHexDecode("486>".getBytes).map(_.toSeq)
      == Some(Array[Byte](0x48, 0x60).toSeq))
    assert(PdfSource.asciiHexDecode("zz>".getBytes).isEmpty) // non-hex chars
    // ASCII85: 'z' shorthand for four zero bytes; out-of-range rejected
    assert(PdfSource.ascii85Decode("z~>".getBytes).map(_.toSeq)
      == Some(Array[Byte](0, 0, 0, 0).toSeq))
    assert(PdfSource.ascii85Decode(Array[Byte](-1, -1)).isEmpty)
    // LZW: an out-of-table code classifies as not-LZW instead of
    // throwing (first 9-bit code of 0xFFFF is 511 > table size 258)
    assert(PdfSource.lzwDecode(Array[Byte](-1, -1, -1, -1)).isEmpty)
  }

  test("jdbc sql source: gated SELECT with max_rows + truncation parity") {
    // in-JVM Derby as the "remote" warehouse
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE metrics (id INT PRIMARY KEY, val DOUBLE)")
      (1 to 25).foreach(i => st.executeUpdate(s"INSERT INTO metrics VALUES ($i, ${i * 1.5})"))
      st.close()

      // capped read: 10 rows back + the truncation flag, like the
      // reference's max_rows path
      val capped = graft.io.Connector.sqlSource(spark, url,
        "SELECT id, val FROM metrics ORDER BY id", maxRows = 10)
      assert(capped.truncated && capped.rowCount == 10L)
      assert(capped.rows.collect().map(_.getInt(0)).toSet == (1 to 10).toSet)

      // uncapped (cap above result size): full rows, no flag
      val full = graft.io.Connector.sqlSource(spark, url,
        "SELECT id FROM metrics", maxRows = 100)
      assert(!full.truncated && full.rowCount == 25L)

      // the hard ceiling clamps oversized caps (reference hard cutoff)
      assert(graft.io.Connector.HardSqlMaxRows == 10000)
      val clamped = graft.io.Connector.sqlSource(spark, url,
        "SELECT id FROM metrics", maxRows = 1000000)
      assert(!clamped.truncated && clamped.rowCount == 25L)

      // warehouse-side pushdown stays SELECT-only: DML is rejected
      // BEFORE any connection is attempted
      intercept[graft.sql.QueryGate.RejectedQuery] {
        graft.io.Connector.sqlSource(spark, url, "DELETE FROM metrics")
      }
      intercept[graft.sql.QueryGate.RejectedQuery] {
        graft.io.Connector.sqlSource(spark, url,
          "WITH x AS (SELECT 1 AS a) INSERT INTO metrics SELECT a, 0 FROM x")
      }

      // partitioned extract: range splits fan the read across tasks
      val split = graft.io.Connector.sqlSource(spark, url,
        "SELECT id, val FROM metrics",
        maxRows = 100,
        partitioning = Some(graft.io.Connector.SqlPartitioning("id", 1L, 26L, 3)))
      assert(!split.truncated && split.rowCount == 25L)

      // remote catalog describe (`describe_dataset` parity): tables
      // then per-column schemas through JDBC metadata
      val st2 = conn.createStatement()
      st2.executeUpdate("CREATE TABLE events2 (ts BIGINT, kind VARCHAR(20) NOT NULL)")
      st2.close()
      val tables = graft.io.Connector.listRemoteTables(spark, url,
        schemaPattern = Some("APP")).collect()
      assert(tables.map(_.getString(1)).toSet == Set("METRICS", "EVENTS2"))
      assert(tables.forall(_.getString(2) == "TABLE"))
      val cols = graft.io.Connector.describeRemote(spark, url,
        schemaPattern = Some("APP"), tablePattern = "EVENTS2").collect()
      assert(cols.map(r => (r.getString(2), r.getString(3), r.getBoolean(4))).toSet ==
        Set(("TS", "BIGINT", true), ("KIND", "VARCHAR", false)))
      assert(cols.map(_.getInt(5)).sorted.toSeq == Seq(1, 2))
      // schema scoping: a non-existent schema lists nothing
      assert(graft.io.Connector.describeRemote(spark, url,
        schemaPattern = Some("NOPE")).count() == 0)
    } finally conn.close()
  }

  test("pdf read: per-page rows, range selection, corrupt-file isolation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pdf")
    java.nio.file.Files.write(dir.resolve("doc1.pdf"),
      "page one\fpage two\fpage three".getBytes)
    java.nio.file.Files.write(dir.resolve("doc2.pdf"), "x".getBytes) // truncated
    val df = PdfSource.readPages(spark, dir.toString, pages = "2-")
    val ok = df.filter(col("ok")).collect()
    assert(ok.map(r => (r.getInt(1), r.getString(2))).toSet ==
      Set((2, "page two"), (3, "page three")))
    val bad = df.filter(!col("ok")).collect()
    assert(bad.length == 1 && bad.head.getString(0).endsWith("doc2.pdf"))
  }
}
