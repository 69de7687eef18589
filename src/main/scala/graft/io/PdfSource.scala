package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** PDF text extraction — parity with the reference's pdf_read tool
  * (`tools/src/aden_tools/tools/pdf_read_tool/pdf_read_tool.py:90-…`):
  * per-page text with page-range selection (`'1-10'`, `'1,3,5'`,
  * `'2-'`), a `maxPages` guard, and optional metadata.
  *
  * The decode kernel is REAL for the common case (pure JDK, no deps):
  * classic-xref PDFs with plain or FlateDecode content streams and
  * Tj/TJ/'/" text operators ([[extractPdfPages]]). Exotic shapes
  * (encryption, object streams, CID fonts) surface as error rows —
  * swapping in pdfbox for those changes only the kernel. Non-PDF
  * bytes take a deterministic stub split so synthetic corpora keep
  * working. The Spark plumbing — binaryFile scan, page-range algebra,
  * per-page row explosion via mapPartitions, per-file failure
  * isolation — is shared by all paths.
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

  /** Page extractor. Real PDFs (`%PDF-` magic) go through the minimal
    * pure-JDK kernel ([[extractPdfPages]]); anything else falls back
    * to the deterministic stub split (form-feed pages / 1KB chunks) so
    * synthetic test corpora keep working.
    */
  private[graft] def extractPagesStub(bytes: Array[Byte]): Seq[String] = {
    if (bytes == null || bytes.length < 8)
      throw new IllegalArgumentException("truncated pdf")
    if (bytes.length >= 5 && new String(bytes, 0, 5,
        java.nio.charset.StandardCharsets.ISO_8859_1) == "%PDF-") {
      val pages = extractPdfPages(bytes)
      if (pages.nonEmpty) return pages
      throw new IllegalArgumentException("pdf has no extractable text streams")
    }
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    // stub contract: pages separated by form-feed, else ~1KB chunks
    if (text.contains('\f')) text.split('\f').toSeq
    else text.grouped(1024).toSeq
  }

  /** Minimal REAL PDF text kernel, pure JDK: handles the common shape
    * generators emit — classic cross-reference files whose page
    * content streams are plain or FlateDecode-compressed
    * (`java.util.zip.Inflater`), text drawn with Tj / TJ / ' / "
    * between BT..ET. Each text-bearing content stream becomes one
    * page, in byte order. Out of scope (documented): encryption,
    * object streams, multi-stream pages, CID/Type0 font decoding —
    * the reference reaches those through pypdf
    * (`pdf_read_tool.py:90-…`); here they surface as the
    * no-extractable-text error row.
    */
  private[graft] def extractPdfPages(bytes: Array[Byte]): Seq[String] = {
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val pages = Seq.newBuilder[String]
    var from = 0
    var found = true
    while (found) {
      val s = raw.indexOf("stream", from)
      if (s < 0) found = false
      else if ((s >= 3 && raw.regionMatches(s - 3, "end", 0, 3)) ||
          { val c = if (s + 6 < raw.length) raw.charAt(s + 6) else ' '
            c != '\r' && c != '\n' }) {
        // not a stream keyword: part of "endstream", or the word
        // "stream" inside text — the real keyword is followed by EOL
        from = s + "stream".length
      } else {
        // dictionary immediately before the stream keyword decides the
        // filter; scan backwards balancing << >> so a nested dict
        // (/DecodeParms << ... >>) doesn't hide the outer /Filter
        val dictStart = outerDictStart(raw, s)
        val dict = raw.substring(math.max(0, dictStart), s)
        var dataStart = s + "stream".length
        if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
        // /Length gives the exact boundary (binary data may contain the
        // literal bytes "endstream"); indirect lengths (`N 0 R`) fall
        // back to the scan
        val lenMatch = """/Length\s+(\d+)(?!\s+\d+\s+R)""".r.findFirstMatchIn(dict)
        val e = lenMatch.map(m => dataStart + m.group(1).toInt)
          .filter(end => end <= raw.length &&
            raw.indexOf("endstream", end) >= 0 && raw.indexOf("endstream", end) - end < 4)
          .getOrElse(raw.indexOf("endstream", s))
        if (e < 0) found = false
        else {
          // per-stream isolation: one unparseable stream (XMP metadata,
          // image data) must not poison the file's real page streams
          try {
            val data = java.util.Arrays.copyOfRange(bytes, dataStart, e)
            val content: Option[String] =
              if (dict.contains("/FlateDecode")) inflate(data)
                .map(b => new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))
              else Some(new String(data, java.nio.charset.StandardCharsets.ISO_8859_1))
            // only streams with a BT text block are page content —
            // XMP/image streams must not become phantom pages
            content.filter(_.contains("BT")).map(contentText)
              .filter(_.nonEmpty).foreach { t => pages += t; () }
          } catch { case _: Exception => () }
          // resume after the endstream keyword that closes this stream
          val endKw = raw.indexOf("endstream", e)
          from = if (endKw >= 0) endKw + "endstream".length else raw.length
        }
      }
    }
    pages.result()
  }

  /** Start of the OUTERMOST `<<` of the dictionary that precedes
    * position `s`, found by scanning backwards with `>>`/`<<`
    * balancing (nested dicts like /DecodeParms close before the outer
    * one opens, seen from the right).
    */
  private def outerDictStart(raw: String, s: Int): Int = {
    var i = s - 1
    var depth = 0
    while (i > 0) {
      if (raw.charAt(i) == '>' && raw.charAt(i - 1) == '>') { depth += 1; i -= 2 }
      else if (raw.charAt(i) == '<' && raw.charAt(i - 1) == '<') {
        if (depth == 0) return i - 1
        depth -= 1; i -= 2
      }
      else i -= 1
    }
    0
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stuck (dictionary needed etc.)
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
    finally inf.end() // native zlib memory — never left to the finalizer
  }

  /** Text of one content stream: string literals `(..)` (with PDF
    * escapes incl. octal) and hex strings `<..>` drawn by Tj / ' / "
    * or inside a TJ array; T* and the quote operators emit newlines.
    */
  private[graft] def contentText(content: String): String = {
    val out = new StringBuilder
    var i = 0
    var inArray = false
    val pendingArray = new StringBuilder
    def parseLiteral(start: Int): (String, Int) = {
      val sb = new StringBuilder
      var depth = 1
      var j = start + 1
      while (j < content.length && depth > 0) {
        content.charAt(j) match {
          case '\\' if j + 1 < content.length =>
            content.charAt(j + 1) match {
              case 'n' => sb.append('\n'); j += 2
              case 'r' => sb.append('\r'); j += 2
              case 't' => sb.append('\t'); j += 2
              case 'b' => sb.append('\b'); j += 2
              case 'f' => sb.append('\f'); j += 2
              case '\r' => // backslash-EOL = line continuation, both dropped
                j += (if (j + 2 < content.length && content.charAt(j + 2) == '\n') 3 else 2)
              case '\n' => j += 2
              case d if d >= '0' && d <= '7' =>
                val oct = content.substring(j + 1, math.min(j + 4, content.length))
                  .takeWhile(c => c >= '0' && c <= '7').take(3)
                sb.append(Integer.parseInt(oct, 8).toChar); j += 1 + oct.length
              case other => sb.append(other); j += 2
            }
          case '(' => depth += 1; sb.append('('); j += 1
          case ')' => depth -= 1; if (depth > 0) sb.append(')'); j += 1
          case c => sb.append(c); j += 1
        }
      }
      (sb.toString, j)
    }
    def parseHex(start: Int): (String, Int) = {
      val end = content.indexOf('>', start + 1)
      if (end < 0) ("", content.length)
      else {
        val hex = content.substring(start + 1, end).filterNot(_.isWhitespace)
        val padded = if (hex.length % 2 == 1) hex + "0" else hex
        val sb = new StringBuilder
        padded.grouped(2).foreach(h => sb.append(Integer.parseInt(h, 16).toChar))
        (sb.toString, end + 1)
      }
    }
    def nextOperator(start: Int): String = {
      var j = start
      while (j < content.length &&
        !content.charAt(j).isLetter && content.charAt(j) != '\'' &&
        content.charAt(j) != '"' && content.charAt(j) != '[') j += 1
      val sb = new StringBuilder
      var k = j
      while (k < content.length && (content.charAt(k).isLetter ||
        content.charAt(k) == '\'' || content.charAt(k) == '*' ||
        content.charAt(k) == '"')) { sb.append(content.charAt(k)); k += 1 }
      sb.toString
    }
    while (i < content.length) {
      content.charAt(i) match {
        case '(' =>
          val (str, next) = parseLiteral(i)
          if (inArray) pendingArray.append(str)
          else nextOperator(next) match {
            case "Tj" => out.append(str)
            case "'" => out.append('\n').append(str)
            case "\"" => out.append('\n').append(str)
            case _ => ()
          }
          i = next
        case '<' if i + 1 < content.length && content.charAt(i + 1) != '<' =>
          val (str, next) = parseHex(i)
          if (inArray) pendingArray.append(str)
          else if (nextOperator(next) == "Tj") out.append(str)
          i = next
        case '[' => inArray = true; pendingArray.clear(); i += 1
        case ']' =>
          inArray = false
          if (nextOperator(i + 1) == "TJ") out.append(pendingArray)
          pendingArray.clear()
          i += 1
        case 'T' if i + 1 < content.length && content.charAt(i + 1) == '*' =>
          out.append('\n'); i += 2
        case _ => i += 1
      }
    }
    out.toString.trim
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
