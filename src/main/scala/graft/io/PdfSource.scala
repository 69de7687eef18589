package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** PDF text extraction — parity with the reference's pdf_read tool
  * (`tools/src/aden_tools/tools/pdf_read_tool/pdf_read_tool.py:90-…`):
  * per-page text with page-range selection (`'1-10'`, `'1,3,5'`,
  * `'2-'`), a `maxPages` guard, and optional metadata.
  *
  * The decode kernel is REAL and broad (pure JDK, no deps): classic
  * xref tables AND cross-reference streams / object streams (ObjStm),
  * Flate/LZW/ASCIIHex/ASCII85 filter chains, Tj/TJ/'/" text operators,
  * ToUnicode CMaps including CID two-byte codes, and RC4 / AES-128 /
  * AES-256 (R5–R6, SHA-2 derivation) encryption with empty or
  * caller-supplied user (and V5 owner) passwords ([[extractPdfPages]],
  * [[PdfCrypt]]). A wrong password or unsupported scheme surfaces as
  * an error row, never garbage.
  * Non-PDF bytes take a deterministic stub split so synthetic corpora
  * keep working. The Spark plumbing — binaryFile scan, page-range
  * algebra, per-page row explosion via mapPartitions, per-file failure
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
  private[graft] def extractPagesStub(bytes: Array[Byte],
      password: String = ""): Seq[String] = {
    if (bytes == null || bytes.length < 8)
      throw new IllegalArgumentException("truncated pdf")
    if (bytes.length >= 5 && new String(bytes, 0, 5,
        java.nio.charset.StandardCharsets.ISO_8859_1) == "%PDF-") {
      val pages = extractPdfPages(bytes, password)
      if (pages.nonEmpty) return pages
      throw new IllegalArgumentException("pdf has no extractable text streams")
    }
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    // stub contract: pages separated by form-feed, else ~1KB chunks
    if (text.contains('\f')) text.split('\f').toSeq
    else text.grouped(1024).toSeq
  }

  /** REAL PDF text kernel, pure JDK. Primary path: parse the
    * cross-reference (classic tables AND PDF 1.5+ cross-reference
    * streams with PNG predictors — the shape every modern generator
    * emits), resolve objects (including type-2 entries living inside
    * FlateDecode `/ObjStm` object streams), walk Catalog → /Pages →
    * /Kids in tree order, and decode each page's /Contents (single or
    * array) — so pages come back in DOCUMENT order with multi-stream
    * pages joined, not in byte order. Any parse failure falls back to
    * the byte-order linear stream scan ([[linearScanPages]]).
    * Encrypted files decrypt via [[PdfCrypt]] (standard handler:
    * RC4, AES-128, and AES-256 R5–R6; empty or supplied passwords);
    * CID/Type0 text goes through the /ToUnicode CMap. Out of scope
    * (documented): embedded-CMap-only fonts — those surface as the
    * no-extractable-text error row (the reference reaches them
    * through pypdf, `pdf_read_tool.py:90-…`).
    */
  private[graft] def extractPdfPages(bytes: Array[Byte],
      password: String = ""): Seq[String] = {
    val viaXref =
      try extractPagesViaXref(bytes, password)
      catch { case _: Exception => None }
    viaXref match {
      case Some(ps) if ps.exists(_.nonEmpty) => ps
      case _ => linearScanPages(bytes, password)
    }
  }

  // ----------------------------------------------------- xref machinery

  /** An xref entry: where object N lives. */
  private sealed trait XrefEntry
  private final case class AtOffset(offset: Int) extends XrefEntry
  private final case class InObjStm(streamObj: Int, idx: Int) extends XrefEntry

  /** Substring of the balanced `<< … >>` dictionary starting at the
    * first `<<` at/after `from`. (String/hex literals inside dicts
    * containing unbalanced `<<`/`>>` are out of scope — content this
    * kernel reads puts those only in content streams.)
    */
  private def balancedDict(raw: String, from: Int): String = {
    val start = raw.indexOf("<<", from)
    if (start < 0) return ""
    var i = start
    var depth = 0
    while (i + 1 < raw.length) {
      if (raw.charAt(i) == '<' && raw.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (raw.charAt(i) == '>' && raw.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return raw.substring(start, i)
      }
      else i += 1
    }
    ""
  }

  private val RefPattern = """/%s\s+(\d+)\s+\d+\s+R"""
  private def objRef(dict: String, key: String): Option[Int] =
    RefPattern.format(key).r.findFirstMatchIn(dict).map(_.group(1).toInt)
  private def intKey(dict: String, key: String): Option[Int] =
    s"""/$key\\s+(\\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
  private def intArray(dict: String, key: String): Option[Seq[Int]] =
    s"""/$key\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(dict)
      .map(_.group(1).trim.split("\\s+").filter(_.nonEmpty).map(_.toInt).toSeq)

  /** Reverse a PNG row predictor (Predictor ≥ 10; bpp = 1 as xref
    * streams use): each encoded row = 1 filter-type byte + `columns`
    * bytes. Predictor < 10 (None/TIFF) returns the data unchanged —
    * TIFF prediction does not occur in xref streams in practice.
    */
  private[graft] def unpredict(data: Array[Byte], predictor: Int, columns: Int): Array[Byte] = {
    if (predictor < 10) return data
    val rowLen = columns + 1
    val rows = data.length / rowLen
    val out = new Array[Byte](rows * columns)
    var prev = new Array[Byte](columns)
    var r = 0
    while (r < rows) {
      val ft = data(r * rowLen) & 0xff
      val row = java.util.Arrays.copyOfRange(data, r * rowLen + 1, r * rowLen + rowLen)
      var i = 0
      while (i < columns) {
        val left = if (i > 0) row(i - 1) & 0xff else 0
        val up = prev(i) & 0xff
        val upLeft = if (i > 0) prev(i - 1) & 0xff else 0
        val add = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => // Paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
          case _ => 0
        }
        row(i) = ((row(i) & 0xff) + add).toByte
        i += 1
      }
      System.arraycopy(row, 0, out, r * columns, columns)
      prev = row
      r += 1
    }
    out
  }

  /** Raw (still encoded) stream data range following the dict whose
    * `stream` keyword starts at/after `from`; uses the direct /Length
    * when present and sane, else scans for `endstream`.
    */
  private def streamDataRange(raw: String, dict: String, from: Int): Option[(Int, Int)] = {
    val s = raw.indexOf("stream", from)
    if (s < 0) return None
    var dataStart = s + "stream".length
    if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
    if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
    val lenMatch = """/Length\s+(\d+)(?!\s+\d+\s+R)""".r.findFirstMatchIn(dict)
    val end = lenMatch.map(m => dataStart + m.group(1).toInt)
      .filter(e => e <= raw.length && raw.indexOf("endstream", e) >= 0 &&
        raw.indexOf("endstream", e) - e < 4)
      .orElse(Option(raw.indexOf("endstream", dataStart)).filter(_ >= 0))
    end.map(e => (dataStart, e))
  }

  /** Decode one stream's bytes per its dict: FlateDecode + optional
    * PNG predictor (`/DecodeParms << /Predictor P /Columns C >>`).
    */
  private def decodeStream(bytes: Array[Byte], raw: String, dict: String,
      from: Int,
      pre: Array[Byte] => Option[Array[Byte]] = Some(_)): Option[Array[Byte]] =
    streamDataRange(raw, dict, from).flatMap { case (a, b) =>
      decodeRange(bytes, dict, a, b, pre)
    }

  /** Decode the already-located `[a, b)` stream bytes per `dict` —
    * the shared back half of [[decodeStream]] and the linear scan.
    * Applies the full `/Filter` CHAIN in order (a name or an array —
    * `[/ASCII85Decode /FlateDecode]` is a legal and common pairing):
    * Flate, LZW, ASCIIHex, ASCII85. A chain containing a filter this
    * kernel can't decode (DCTDecode image data, crypt filters) yields
    * None rather than garbage bytes.
    */
  private def decodeRange(bytes: Array[Byte], dict: String, a: Int,
      b: Int,
      pre: Array[Byte] => Option[Array[Byte]] = Some(_)): Option[Array[Byte]] = {
    // `pre` runs before the filter chain — decryption applies to the
    // stored bytes, then filters decode the plaintext
    val plain = pre(java.util.Arrays.copyOfRange(bytes, a, b))
      .flatMap(data => filterChain(dict).foldLeft(Option(data)) { (acc, f) =>
        acc.flatMap { d =>
          f match {
            case "FlateDecode" | "Fl" => inflate(d)
            case "LZWDecode" | "LZW" =>
              lzwDecode(d, intKey(dict, "EarlyChange").getOrElse(1))
            case "ASCIIHexDecode" | "AHx" => asciiHexDecode(d)
            case "ASCII85Decode" | "A85" => ascii85Decode(d)
            case _ => None
          }
        }
      })
    plain.map { p =>
      (intKey(dict, "Predictor"), intKey(dict, "Columns")) match {
        case (Some(pred), Some(cols)) if pred >= 10 => unpredict(p, pred, cols)
        case _ => p
      }
    }
  }

  /** The `/Filter` value as an in-order name list (empty = raw). */
  private def filterChain(dict: String): Seq[String] =
    """(?s)/Filter\s*(\[[^\]]*\]|/\w+)""".r.findFirstMatchIn(dict) match {
      case None => Seq.empty
      case Some(m) => """/(\w+)""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
    }

  /** PDF LZWDecode (spec 7.4.4, the TIFF variant): 9→12-bit codes,
    * 256 = table clear, 257 = EOD, code width grows `earlyChange`
    * entries before the table fills a width.
    */
  private[graft] def lzwDecode(data: Array[Byte],
      earlyChange: Int = 1): Option[Array[Byte]] = try {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
    val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def resetTable(): Unit = {
      table.clear()
      var i = 0
      while (i < 256) { table += Array(i.toByte); i += 1 }
      table += null // 256 = clear marker
      table += null // 257 = EOD marker
    }
    resetTable()
    var width = 9
    var prev: Array[Byte] = null
    var acc = 0L
    var accBits = 0
    var i = 0
    var done = false
    while (!done) {
      while (accBits < width && i < data.length) {
        acc = (acc << 8) | (data(i) & 0xffL); accBits += 8; i += 1
      }
      if (accBits < width) done = true // truncated stream: keep what we have
      else {
        val code = ((acc >>> (accBits - width)) & ((1L << width) - 1)).toInt
        accBits -= width
        if (code == 256) { resetTable(); width = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < table.length && table(code) != null) table(code)
            else if (code == table.length && prev != null) prev :+ prev(0) // KwKwK
            else return None // invalid code: not LZW data
          out.write(entry)
          if (prev != null) table += (prev :+ entry(0))
          prev = entry
          if (table.length + earlyChange >= (1 << width) && width < 12) width += 1
        }
      }
    }
    Some(out.toByteArray)
  } catch { case _: Exception => None }

  private[graft] def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val s = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
    val end = s.indexOf('>')
    val hex = (if (end >= 0) s.substring(0, end) else s).filterNot(_.isWhitespace)
    if (!hex.forall(c => Character.digit(c, 16) >= 0)) return None
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    Some(padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
  }

  private[graft] def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = try {
    val s0 = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1).trim
    val s1 = if (s0.startsWith("<~")) s0.substring(2) else s0
    val end = s1.indexOf("~>")
    val body = (if (end >= 0) s1.substring(0, end) else s1).filterNot(_.isWhitespace)
    val out = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    while (i < body.length) {
      if (body.charAt(i) == 'z') { out.write(Array[Byte](0, 0, 0, 0)); i += 1 }
      else {
        val n = math.min(5, body.length - i)
        if (n < 2) return None // a final group of 1 char is illegal
        var v = 0L
        var j = 0
        while (j < n) {
          val c = body.charAt(i + j)
          if (c < '!' || c > 'u') return None
          v = v * 85 + (c - '!')
          j += 1
        }
        while (j < 5) { v = v * 85 + 84; j += 1 } // pad with 'u'
        out.write(((v >> 24) & 0xff).toInt)
        if (n > 2) out.write(((v >> 16) & 0xff).toInt)
        if (n > 3) out.write(((v >> 8) & 0xff).toInt)
        if (n > 4) out.write((v & 0xff).toInt)
        i += n
      }
    }
    Some(out.toByteArray)
  } catch { case _: Exception => None }

  /** Parse the full cross-reference reachable from `startxref`
    * (classic tables and xref streams, following /Prev chains;
    * first-seen entry wins, as newer sections shadow older ones) and
    * extract page texts in page-tree order. None = structure this
    * kernel can't resolve (caller falls back to the linear scan).
    */
  private[graft] def extractPagesViaXref(bytes: Array[Byte],
      password: String = ""): Option[Seq[String]] = {
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = raw.lastIndexOf("startxref")
    if (sx < 0) return None
    val startOff = """\d+""".r.findFirstIn(raw.substring(sx + 9)).map(_.toInt).getOrElse(-1)
    if (startOff < 0 || startOff >= raw.length) return None

    val entries = scala.collection.mutable.Map.empty[Int, XrefEntry]
    var rootRef: Option[Int] = None
    var encryptRef: Option[Int] = None
    var trailerId: Option[Array[Byte]] = None

    def addEntry(num: Int, e: XrefEntry): Unit =
      if (!entries.contains(num)) { entries(num) = e; () }

    // /Root, /Encrypt and /ID come from TRAILER dicts only (newest
    // section wins) — a whole-file grep would false-positive on
    // content that merely mentions the keys
    def captureTrailerKeys(dict: String): Unit = {
      if (rootRef.isEmpty) rootRef = objRef(dict, "Root")
      if (encryptRef.isEmpty) encryptRef = objRef(dict, "Encrypt")
      if (trailerId.isEmpty)
        trailerId = """/ID\s*\[\s*<([0-9A-Fa-f]+)>""".r.findFirstMatchIn(dict)
          .map(m => m.group(1).grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray)
    }

    // parse one xref section at `at`; returns the /Prev offset if any
    def parseSection(at: Int): Option[Int] = {
      var i = at
      while (i < raw.length && raw.charAt(i).isWhitespace) i += 1
      if (raw.regionMatches(i, "xref", 0, 4)) {
        // classic table: subsections of "start count" + 20-byte rows
        i += 4
        var parsing = true
        while (parsing) {
          while (i < raw.length && raw.charAt(i).isWhitespace) i += 1
          val m = """^(\d+)\s+(\d+)""".r.findFirstMatchIn(raw.substring(i, math.min(i + 40, raw.length)))
          m match {
            case Some(sub) =>
              val first = sub.group(1).toInt
              val count = sub.group(2).toInt
              i += sub.end
              while (i < raw.length && raw.charAt(i).isWhitespace) i += 1
              var k = 0
              while (k < count) {
                val row = raw.substring(i, math.min(i + 20, raw.length))
                if (row.length >= 18 && row.charAt(17) == 'n')
                  addEntry(first + k, AtOffset(row.substring(0, 10).toInt))
                i += 20
                k += 1
              }
            case None => parsing = false
          }
        }
        val t = raw.indexOf("trailer", i)
        if (t < 0) return None
        val dict = balancedDict(raw, t)
        captureTrailerKeys(dict)
        intKey(dict, "Prev")
      } else {
        // xref STREAM: "N G obj << /Type /XRef /W [...] ... >> stream"
        val dict = balancedDict(raw, i)
        if (!dict.contains("/XRef")) return None
        val w = intArray(dict, "W").getOrElse(return None)
        if (w.isEmpty) return None
        val size = intKey(dict, "Size").getOrElse(return None)
        val index = intArray(dict, "Index").getOrElse(Seq(0, size))
        val data = decodeStream(bytes, raw, dict, raw.indexOf(dict, i) + dict.length)
          .getOrElse(return None)
        val rowLen = w.sum
        var pos = 0
        index.grouped(2).foreach {
          case Seq(first, count) =>
            var k = 0
            while (k < count && pos + rowLen <= data.length) {
              // big-endian fields; a zero-width type field defaults to 1
              var off = pos
              def field(width: Int): Long = {
                var v = 0L
                var j = 0
                while (j < width) { v = (v << 8) | (data(off + j) & 0xffL); j += 1 }
                off += width
                v
              }
              val t = if (w(0) == 0) 1L else field(w(0))
              val f2 = if (w.length > 1) field(w(1)) else 0L
              val f3 = if (w.length > 2) field(w(2)) else 0L
              t match {
                case 1L => addEntry(first + k, AtOffset(f2.toInt))
                case 2L => addEntry(first + k, InObjStm(f2.toInt, f3.toInt))
                case _ => () // type 0 = free
              }
              pos += rowLen
              k += 1
            }
          case _ => ()
        }
        captureTrailerKeys(dict)
        intKey(dict, "Prev")
      }
    }

    var cursor = Option(startOff)
    val seen = scala.collection.mutable.Set.empty[Int]
    while (cursor.exists(c => !seen.contains(c))) {
      val c = cursor.get
      seen += c
      cursor = parseSection(c)
    }

    // --- encryption -------------------------------------------------
    // the /Encrypt dict is resolved from its direct offset only (the
    // spec keeps it out of object streams), so no circular dependency
    // with the stream decoder below
    def directDict(num: Int): Option[String] = entries.get(num) match {
      case Some(AtOffset(off)) if off >= 0 && off < raw.length =>
        val objKw = raw.indexOf("obj", off)
        if (objKw < 0) None else Some(balancedDict(raw, objKw))
      case _ =>
        ("""(?m)^""" + num + """\s+\d+\s+obj""").r.findFirstMatchIn(raw)
          .map(m => balancedDict(raw, m.end))
    }
    val decryptor: Option[PdfCrypt.Decryptor] =
      encryptRef match {
        case None => None
        case Some(num) =>
          directDict(num)
            .flatMap(d => PdfCrypt.fromDict(d,
              trailerId.getOrElse(Array.emptyByteArray), password)) match {
            case None => return None // encrypted, unsupported: no garbage out
            case some => some
          }
      }

    // --- object resolution ------------------------------------------
    val objCache = scala.collection.mutable.Map.empty[Int, String]
    // ObjStm payloads are decoded once and cached: object resolution
    // hits the same stream once per CONTAINED object, and the
    // ToUnicode scan below reads them all again
    val stmCache = scala.collection.mutable.Map.empty[Int, Option[Array[Byte]]]
    // body text of object `num`: its dict (and trailing body) without
    // stream data; resolves type-2 entries through their object stream
    def objString(num: Int, depth: Int = 0): Option[String] = {
      if (depth > 8) return None // cyclic/malicious nesting guard
      objCache.get(num).orElse {
        val resolved = entries.get(num).flatMap {
          case AtOffset(off) if off >= 0 && off < raw.length =>
            val objKw = raw.indexOf("obj", off)
            if (objKw < 0) None
            else {
              val end = raw.indexOf("endobj", objKw)
              val streamKw = raw.indexOf("stream", objKw)
              val bodyEnd =
                if (end < 0) raw.length
                else if (streamKw >= 0 && streamKw < end) streamKw
                else end
              Some(raw.substring(objKw + 3, bodyEnd))
            }
          case InObjStm(stmNum, idx) =>
            for {
              stmDict <- objString(stmNum, depth + 1)
              first <- intKey(stmDict, "First")
              n <- intKey(stmDict, "N")
              data <- decodeObjStm(stmNum, depth)
              if idx < n
            } yield {
              val header = new String(data, 0, math.min(first, data.length),
                java.nio.charset.StandardCharsets.ISO_8859_1)
              val pairs = header.trim.split("\\s+").filter(_.nonEmpty).map(_.toInt)
              val offInStm = first + pairs(idx * 2 + 1)
              val next =
                if (idx + 1 < n && pairs.length > idx * 2 + 3) first + pairs(idx * 2 + 3)
                else data.length
              new String(data, offInStm, math.min(next, data.length) - offInStm,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            }
          case _ => None
        }
        resolved.foreach(objCache(num) = _)
        resolved
      }
    }
    // decoded payload of stream object `num` (decrypted first when the
    // file is encrypted — except xref streams, which never are)
    def streamBytes(num: Int, depth: Int = 0): Option[Array[Byte]] =
      entries.get(num).flatMap {
        case AtOffset(off) if off >= 0 && off < raw.length =>
          for {
            dict <- objString(num, depth + 1)
            data <- {
              val pre: Array[Byte] => Option[Array[Byte]] = decryptor match {
                case Some(d) if !dict.contains("/XRef") =>
                  val gen = """\d+\s+(\d+)\s+obj""".r
                    .findFirstMatchIn(raw.substring(off, math.min(off + 32, raw.length)))
                    .map(_.group(1).toInt).getOrElse(0)
                  d.decrypt(num, gen, _)
                case _ => Some(_)
              }
              decodeStream(bytes, raw, dict, off, pre)
            }
          } yield data
        case _ => None // streams cannot live inside object streams
      }
    def decodeObjStm(num: Int, depth: Int): Option[Array[Byte]] =
      stmCache.getOrElseUpdate(num, streamBytes(num, depth))

    // --- page tree walk ---------------------------------------------
    val root = rootRef.flatMap(objString(_)).getOrElse(return None)
    val pagesTop = objRef(root, "Pages").getOrElse(return None)
    val pageObjs = Seq.newBuilder[String]
    val visited = scala.collection.mutable.Set.empty[Int]
    def walk(num: Int): Unit = {
      if (visited.contains(num)) return
      visited += num
      objString(num).foreach { d =>
        val kids = s"""/Kids\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(d).map(_.group(1))
        kids match {
          case Some(arr) =>
            """(\d+)\s+\d+\s+R""".r.findAllMatchIn(arr).foreach(m => walk(m.group(1).toInt))
          case None if d.contains("/Page") => pageObjs += d; ()
          case None => ()
        }
      }
    }
    walk(pagesTop)

    // union ToUnicode map: font dicts referencing a CMap live in the
    // raw body (classic layout) or inside object streams (1.5 layout);
    // scan both. Union-of-all-fonts is a deliberate simplification —
    // per-Tf tracking would need font state in contentText; CID
    // producers in practice emit one text font per doc.
    val toUniPat = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
    val objStmTexts = entries.values.collect { case InObjStm(s, _) => s }.toSeq.distinct
      .flatMap(decodeObjStm(_, 0))
      .map(new String(_, java.nio.charset.StandardCharsets.ISO_8859_1))
    val cmapNums = (objStmTexts :+ raw)
      .flatMap(t => toUniPat.findAllMatchIn(t).map(_.group(1).toInt)).distinct
    val cmaps = cmapNums.flatMap(streamBytes(_))
      .map(b => parseToUnicodeCMap(new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)))
      .filter(!_.isEmpty)
    val cmap = cmaps.headOption.map(h =>
      ToUnicodeCMap(h.codeBytes, cmaps.flatMap(_.map).toMap)).getOrElse(EmptyCMap)

    // per-page font-name → CMap resolution (resources and /Font as
    // inline dicts or refs); pages inheriting resources from an
    // ancestor /Pages node fall back to the union map
    def fontCMaps(pd: String): Map[String, ToUnicodeCMap] = {
      def subDict(owner: String, key: String): Option[String] = {
        val at = owner.indexOf(s"/$key")
        if (at < 0) None
        else {
          val rest = owner.substring(at + key.length + 1)
          if (rest.dropWhile(_.isWhitespace).startsWith("<<"))
            Some(balancedDict(owner, at))
          else objRef(owner, key).flatMap(objString(_))
        }
      }
      (for {
        res <- subDict(pd, "Resources")
        fontDict <- subDict(res, "Font")
      } yield {
        """/([\w.-]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(fontDict).flatMap { m =>
          objString(m.group(2).toInt)
            .flatMap(fd => objRef(fd, "ToUnicode"))
            .flatMap(streamBytes(_))
            .map(b => m.group(1) -> parseToUnicodeCMap(
              new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)))
        }.toMap.filter(!_._2.isEmpty)
      }).getOrElse(Map.empty)
    }

    val pages = pageObjs.result().map { pd =>
      // /Contents: one ref or an array of refs (joined in order)
      val refs: Seq[Int] =
        s"""/Contents\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(pd)
          .map(m => """(\d+)\s+\d+\s+R""".r.findAllMatchIn(m.group(1))
            .map(_.group(1).toInt).toSeq)
          .orElse(objRef(pd, "Contents").map(Seq(_)))
          .getOrElse(Seq.empty)
      val fonts = fontCMaps(pd)
      refs.flatMap(streamBytes(_))
        .map(b => contentTextWithFonts(
          new String(b, java.nio.charset.StandardCharsets.ISO_8859_1), fonts, cmap))
        .filter(_.nonEmpty)
        .mkString("\n")
    }
    if (pages.isEmpty) None else Some(pages)
  }

  /** The byte-order fallback: scan for `stream` keywords and treat
    * every text-bearing (BT) stream as a page — works on classic
    * single-generation files and anything whose xref is broken.
    */
  private[graft] def linearScanPages(bytes: Array[Byte],
      password: String = ""): Seq[String] = {
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    // encryption detection is limited to TRAILER dicts (all of them —
    // incremental updates append several), not a whole-file grep that
    // content mentioning "/Encrypt" could false-positive
    val trailerDicts = Iterator.iterate(raw.indexOf("trailer"))(t =>
        raw.indexOf("trailer", t + 1)).takeWhile(_ >= 0).take(16)
      .map(t => balancedDict(raw, t)).toSeq
    val decryptor: Option[PdfCrypt.Decryptor] =
      trailerDicts.flatMap(d => """/Encrypt\s+(\d+)\s+\d+\s+R""".r
          .findFirstMatchIn(d).map(m => (m.group(1).toInt, d))).headOption match {
        case None => None
        case Some((num, trailer)) =>
          val fileId = """/ID\s*\[\s*<([0-9A-Fa-f]+)>""".r.findFirstMatchIn(trailer)
            .map(m => m.group(1).grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray)
            .getOrElse(Array.emptyByteArray)
          ("""(?m)^""" + num + """\s+\d+\s+obj""").r.findFirstMatchIn(raw)
            .map(om => balancedDict(raw, om.end))
            .flatMap(d => PdfCrypt.fromDict(d, fileId, password)) match {
            case None => return Seq.empty // encrypted, unsupported
            case some => some
          }
      }
    // per-stream decryption: the object header right before the dict
    // names the (num, gen) the object key derives from
    def preFor(dictStart: Int): Array[Byte] => Option[Array[Byte]] =
      decryptor match {
        case None => Some(_)
        case Some(d) =>
          // window is generous (4 KB) so a long gap between "N G obj"
          // and "<<" can't truncate the object number at the boundary;
          // the $ anchor still requires the header to END at the dict
          """(\d+)\s+(\d+)\s+obj\s*(<<)?\s*$""".r
            .findFirstMatchIn(raw.substring(math.max(0, dictStart - 4096), dictStart + 2)) match {
            case Some(h) => d.decrypt(h.group(1).toInt, h.group(2).toInt, _)
            case None => _ => None // encrypted but unattributable: skip
          }
      }
    val cmap = linearScanCMap(bytes, raw, preFor)
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
        // boundary + decode logic shared with the xref path — the
        // direct-/Length vs endstream-scan subtleties live in ONE place
        streamDataRange(raw, dict, s) match {
          case None => found = false
          case Some((a, e)) =>
            // per-stream isolation: one unparseable stream (XMP
            // metadata, image data) must not poison the file's real
            // page streams
            try {
              val content = decodeRange(bytes, dict, a, e, preFor(dictStart))
                .map(p => new String(p, java.nio.charset.StandardCharsets.ISO_8859_1))
              // only streams with a BT text block are page content —
              // XMP/image streams must not become phantom pages
              content.filter(_.contains("BT")).map(contentText(_, cmap))
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

  /** Union ToUnicode map for the linear-scan path: resolve every
    * `/ToUnicode N 0 R` in the raw bytes to its `N 0 obj` stream and
    * parse. Same union-of-fonts simplification as the xref path.
    */
  private def linearScanCMap(bytes: Array[Byte], raw: String,
      preFor: Int => Array[Byte] => Option[Array[Byte]] = _ => Some(_)): ToUnicodeCMap = {
    val cmaps = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(raw)
      .map(_.group(1).toInt).toSeq.distinct.flatMap { num =>
        ("""(?m)^""" + num + """\s+\d+\s+obj""").r.findFirstMatchIn(raw).flatMap { om =>
          val dictAt = raw.indexOf("<<", om.end)
          if (dictAt < 0) None
          else {
            val dict = balancedDict(raw, dictAt)
            streamDataRange(raw, dict, dictAt + dict.length)
              .flatMap { case (a, b) => decodeRange(bytes, dict, a, b, preFor(dictAt)) }
              .map(p => parseToUnicodeCMap(
                new String(p, java.nio.charset.StandardCharsets.ISO_8859_1)))
          }
        }
      }.filter(!_.isEmpty)
    cmaps.headOption.map(h => ToUnicodeCMap(h.codeBytes, cmaps.flatMap(_.map).toMap))
      .getOrElse(EmptyCMap)
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

  /** A parsed /ToUnicode character map: `codeBytes` is the source code
    * width from `begincodespacerange` (2 for CID fonts), `map` takes a
    * source code to its UTF-16-decoded replacement text.
    */
  private[graft] final case class ToUnicodeCMap(codeBytes: Int, map: Map[Int, String]) {
    def isEmpty: Boolean = map.isEmpty
  }
  private[graft] val EmptyCMap = ToUnicodeCMap(2, Map.empty)

  /** Parse a /ToUnicode CMap stream (`beginbfchar`/`beginbfrange`
    * sections — PDF 9.10.3): the font-code → Unicode mapping CID fonts
    * need for text extraction (the reference gets this from pypdf).
    * Destination hex is UTF-16BE and may be multi-code-unit
    * (ligatures map to several chars).
    */
  private[graft] def parseToUnicodeCMap(cmap: String): ToUnicodeCMap = {
    def utf16(hex: String): String = {
      val padded = if (hex.length % 4 == 0) hex else ("0" * (4 - hex.length % 4)) + hex
      padded.grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString
    }
    val m = Map.newBuilder[Int, String]
    val pair = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
    """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(cmap).foreach { blk =>
      pair.findAllMatchIn(blk.group(1)).foreach { p =>
        m += Integer.parseInt(p.group(1), 16) -> utf16(p.group(2))
      }
    }
    val range3 = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
    val rangeArr = """(?s)<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]""".r
    """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(cmap).foreach { blk =>
      val body = blk.group(1)
      rangeArr.findAllMatchIn(body).foreach { r =>
        val lo = Integer.parseInt(r.group(1), 16)
        val dsts = """<([0-9A-Fa-f]+)>""".r.findAllMatchIn(r.group(3)).map(_.group(1)).toSeq
        dsts.zipWithIndex.foreach { case (d, i) => m += (lo + i) -> utf16(d) }
      }
      // strip array forms so the 3-hex regex can't misread their parts
      val scalarBody = rangeArr.replaceAllIn(body, " ")
      range3.findAllMatchIn(scalarBody).foreach { r =>
        val lo = Integer.parseInt(r.group(1), 16)
        val hi = Integer.parseInt(r.group(2), 16)
        val dstHex = r.group(3)
        // the increment applies to the LAST UTF-16 code unit (spec rule)
        val prefix =
          if (dstHex.length > 4) utf16(dstHex.substring(0, dstHex.length - 4)) else ""
        val lastUnit = Integer.parseInt(dstHex.takeRight(math.min(4, dstHex.length)), 16)
        var c = lo
        while (c <= hi && c - lo <= 65535) {
          m += c -> (prefix + ((lastUnit + (c - lo)) & 0xffff).toChar)
          c += 1
        }
      }
    }
    val codeBytes =
      """(?s)begincodespacerange\s*<([0-9A-Fa-f]+)>""".r.findFirstMatchIn(cmap)
        .map(m => math.max(1, m.group(1).length / 2)).getOrElse(2)
    ToUnicodeCMap(codeBytes, m.result())
  }

  /** [[contentText]] with per-font ToUnicode maps: the stream is
    * segmented at `Tf` font-selection operators and each segment
    * decodes through ITS font's CMap (two subset fonts routinely map
    * the same code to different glyphs — a union map would silently
    * garble one of them). Fonts absent from `fonts` fall back to the
    * union `default`.
    */
  private[graft] def contentTextWithFonts(content: String,
      fonts: Map[String, ToUnicodeCMap], default: ToUnicodeCMap): String = {
    val tfs = """/([\w.-]+)\s+[-\d.]+\s+Tf""".r.findAllMatchIn(content).toSeq
    if (fonts.isEmpty || tfs.isEmpty) return contentText(content, default)
    val segments = Seq.newBuilder[(Int, Int, ToUnicodeCMap)]
    var cur = default
    var pos = 0
    tfs.foreach { m =>
      segments += ((pos, m.end, cur))
      cur = fonts.getOrElse(m.group(1), default)
      pos = m.end
    }
    segments += ((pos, content.length, cur))
    segments.result()
      .map { case (a, b, cm) => contentText(content.substring(a, b), cm) }
      .filter(_.nonEmpty).mkString
  }

  /** Text of one content stream: string literals `(..)` (with PDF
    * escapes incl. octal) and hex strings `<..>` drawn by Tj / ' / "
    * or inside a TJ array; T* and the quote operators emit newlines.
    * With a non-empty `cmap`, hex strings decode as fixed-width font
    * codes through the ToUnicode map (unmapped codes fall back to the
    * raw code point) — the CID-font path.
    */
  private[graft] def contentText(content: String,
      cmap: ToUnicodeCMap = EmptyCMap): String = {
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
        if (cmap.isEmpty)
          padded.grouped(2).foreach(h => sb.append(Integer.parseInt(h, 16).toChar))
        else
          // fixed-width font codes through the ToUnicode map; an
          // unmapped code falls back to its raw code point
          padded.grouped(cmap.codeBytes * 2).foreach { h =>
            val code = Integer.parseInt(h, 16)
            sb.append(cmap.map.getOrElse(code, code.toChar.toString))
          }
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
      maxPages: Int = 100, glob: String = "*.pdf",
      password: String = ""): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select("path", "content")
    val keep = parsePageRanges(pages)
    val rdd = bin.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val path = row.getString(0)
        try {
          extractPagesStub(row.getAs[Array[Byte]](1), password)
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
