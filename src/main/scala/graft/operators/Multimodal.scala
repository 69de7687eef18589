package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column operators — image/audio/video as opaque `binary`
  * columns with typed metadata (the beyond-reference mandate; the
  * reference's vision surface is `vision_tool.py:372-428`, provider
  * calls over base64 images).
  *
  * Design for 100 TB: media rides as binary columns next to its
  * metadata (one row per asset; parquet stores binary pages
  * compressed), decode/feature-extract runs as `mapPartitions` with
  * explicit batch shape — the Scala analog of `mapInPandas` — so a
  * real decoder (JNI/FFI or an inference runtime) amortizes model and
  * buffer setup per batch, not per row. Header metadata (PNG/JPEG/
  * WAV/MP4) and PNG/JPEG pixel decode ([[imageStats]], ImageIO) are
  * REAL; only the learned-embedding half of feature extraction is a
  * deterministic stub (no inference runtime in this environment) —
  * swapping it for a real model changes one function.
  */
object Multimodal {

  // ImageIO's default stream cache is FILE-backed: every
  // ImageIO.read(InputStream) / write(_, _, OutputStream) creates,
  // fills and deletes a temp file on disk PER IMAGE. All callers here
  // hold the full bytes in memory already, so the disk hop is pure
  // per-row syscall overhead (measured: the dominant cost of the
  // image-corpus gate queries). Memory-cached streams produce
  // byte-identical encodes/decodes — this is an I/O-path switch, not
  // a codec change. Set once on classload (executors load this class
  // before any kernel call; local mode shares the JVM).
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata produced by decode: image fields (width/height),
    * audio/video fields (sample_rate/duration_ms), shared channel
    * count and format tag. Fields outside a format's modality are
    * null (an image has no duration; audio has no width). `ok=false`
    * rows carry the failure reason (corrupt media must degrade
    * per-row, never fail the scan — DROPMALFORMED discipline for
    * media).
    */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("ok", BooleanType, nullable = false),
    StructField("error", StringType)))

  /** Row constructor in [[DecodedSchema]] order with the modality
    * fields defaulted — every kernel fills only what its format has.
    */
  private def meta(width: Integer = null, height: Integer = null,
      channels: Integer = null, format: String = null,
      sampleRate: Integer = null, durationMs: java.lang.Long = null,
      ok: Boolean = true, error: String = null): Row =
    Row(width, height, channels, format, sampleRate, durationMs, ok, error)

  /** Read a directory of media files as (path, length, content) —
    * Spark's binaryFile source; partition-parallel, content pruned
    * unless projected.
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"), col("content"))

  // ---------------------------------------------------------- decode

  /** Decode kernel: REAL pure-JDK header parses for PNG (IHDR), JPEG
    * (SOF marker walk), WAV (RIFF chunk walk) and MP4 (ISO-BMFF box
    * walk) — dimensions, channel counts, sample rates and durations
    * are the actual file metadata; malformed files of a recognized
    * format degrade to per-row error rows. Other formats keep the
    * deterministic length-derived stub (full pixel/sample decode needs
    * codec libs this environment lacks); swapping in a real codec (FFI
    * to libjpeg/ffmpeg) still changes only this function — bytes in,
    * metadata Row out, total.
    */
  private[graft] def decodeStub(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty)
      return meta(ok = false, error = "empty content")
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte)
      return decodeJpeg(bytes)
    if (bytes.length >= 8 && bytes(0) == 0x89.toByte && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G')
      return decodePng(bytes)
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      return decodeWav(bytes)
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P')
      return webpInfo(bytes) match {
        case Some((w, h, ch, variant)) =>
          meta(width = w, height = h, channels = ch, format = s"webp-$variant")
        case None => meta(format = "webp", ok = false,
          error = "unrecognized WEBP payload chunk")
      }
    if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p')
      return avifInfo(bytes) match {
        // AVIF/HEIC are ISO-BMFF too — the brand decides image vs movie
        case Some((w, h, ch)) =>
          meta(width = w, height = h, channels = ch,
            format = heifBrand(bytes).getOrElse("heif"))
        case None => decodeMp4(bytes)
      }
    if (isTiffMagic(bytes)) return decodeTiff(bytes)
    if ((bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0x0A) ||
        (bytes.length >= 12 && bytes(0) == 0 && bytes(3) == 0x0C &&
          bytes(4) == 'J' && bytes(5) == 'X' && bytes(6) == 'L'))
      return jxlInfo(bytes) match {
        case Some((w, h)) => meta(width = w, height = h, channels = 3,
          format = "jxl")
        case None => meta(format = "jxl", ok = false,
          error = "unparseable JXL SizeHeader")
      }
    if (bytes.length >= 8 && bytes(0) == 0x1A.toByte &&
        bytes(1) == 0x45.toByte && bytes(2) == 0xDF.toByte &&
        bytes(3) == 0xA3.toByte)
      return webmInfo(bytes) match {
        // audio facts only on audio-PRIMARY files (a movie's channels
        // column means pixel channels everywhere else in this schema)
        case Some(w) if w.kind == "audio" =>
          meta(channels = w.channels, format = w.docType,
            sampleRate = w.sampleRate, durationMs = w.durationMs)
        case Some(w) =>
          meta(width = w.width, height = w.height,
            format = w.docType, durationMs = w.durationMs)
        case None => meta(format = "matroska", ok = false,
          error = "no video/audio track in EBML stream")
      }
    val width = 64 + bytes.length % 1024
    // long arithmetic: length * 31 overflows Int beyond ~69 MB assets
    val height = 64 + (bytes.length.toLong * 31 % 1024).toInt
    Row(width, height, 3, "raw", null, null, true, null)
  }

  /** TIFF magic: `II*\0` (little-endian) or `MM\0*` (big-endian). */
  @inline private[graft] def isTiffMagic(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  /** TIFF header facts from IFD0 — width (tag 0x0100), height
    * (0x0101), channels (SamplesPerPixel 0x0115, spec default 1) in
    * the declared byte order, SHORT or LONG typed (both appear in the
    * wild; values are left-justified in the 4-byte slot). Header walk
    * only — pixel decode rides [[decodePixels]]' ImageIO path.
    */
  private[graft] def decodeTiff(b: Array[Byte]): Row = {
    val little = b(0) == 'I'
    def u16(o: Int): Int =
      if (o < 0 || o + 2 > b.length) -1
      else if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < 0 || o + 4 > b.length) -1L
      else if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val ifdOff = u32(4)
    if (ifdOff < 0 || ifdOff > b.length - 2)
      return meta(format = "tiff", ok = false, error = "truncated IFD0 offset")
    val ifd = ifdOff.toInt
    val nEntries = u16(ifd)
    if (nEntries <= 0)
      return meta(format = "tiff", ok = false, error = "empty or truncated IFD0")
    var w = -1L
    var h = -1L
    var spp = 1L // SamplesPerPixel defaults to 1 per the spec
    var k = 0
    while (k < nEntries) {
      val e = ifd + 2 + 12 * k
      val tag = u16(e)
      if (tag == 0x0100 || tag == 0x0101 || tag == 0x0115) {
        val typ = u16(e + 2)
        val v =
          if (typ == 3) u16(e + 8).toLong // SHORT, left-justified
          else if (typ == 4) u32(e + 8) // LONG
          else -1L
        if (tag == 0x0100) w = v
        else if (tag == 0x0101) h = v
        else spp = v
      }
      k += 1
    }
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
      meta(format = "tiff", ok = false, error = s"bad dimensions ${w}x$h")
    else meta(width = w.toInt, height = h.toInt,
      channels = if (spp >= 1 && spp <= 16) spp.toInt else 1, format = "tiff")
  }

  /** Minimal-but-valid uncompressed RGB TIFF (little-endian, one
    * strip, 8 bits/sample) from a per-pixel color function — the
    * hand-rolled twin of `renderImage("tiff", ...)` for cases ImageIO
    * can't write: `gps = true` plants the GPS Info IFD pointer (tag
    * 0x8825) in IFD0, the PII-flag fixture no encoder emits.
    */
  private[graft] def syntheticTiff(w: Int, h: Int, rgb: (Int, Int) => Int,
      gps: Boolean = false, description: String = null): Array[Byte] = {
    val nPix = w * h * 3
    val desc: Array[Byte] =
      if (description == null) Array.emptyByteArray
      else description.getBytes(java.nio.charset.StandardCharsets.UTF_8) :+ 0.toByte
    require(desc.isEmpty || desc.length > 4,
      "fixture descriptions are out-of-line: > 4 bytes with the NUL")
    val nTags = 8 + (if (gps) 1 else 0) + (if (desc.nonEmpty) 1 else 0)
    // layout: header(8) | IFD0 | [empty GPS IFD] | [description] | strip
    val ifdBytes = 2 + 12 * nTags + 4
    val gpsIfdOff = 8 + ifdBytes
    val descOff = gpsIfdOff + (if (gps) 6 else 0)
    val stripOff = descOff + desc.length
    val bb = java.nio.ByteBuffer.allocate(stripOff + nPix)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    bb.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(id.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3) bb.putShort(value.toShort).putShort(0)
      else bb.putInt(value)
    }
    tag(0x0100, 3, 1, w) // ImageWidth
    tag(0x0101, 3, 1, h) // ImageLength
    // BitsPerSample with count 1 means "8 bits for every sample" to
    // mainstream decoders incl. ImageIO (count 3 would force an
    // offset-valued entry); RowsPerStrip absent = one strip, per spec
    tag(0x0102, 3, 1, 8) // BitsPerSample
    tag(0x0103, 3, 1, 1) // Compression: none
    tag(0x0106, 3, 1, 2) // Photometric: RGB
    // ascending tag order, as the spec demands of strict readers
    if (desc.nonEmpty) tag(0x010E, 2, desc.length, descOff) // ImageDescription
    tag(0x0111, 4, 1, stripOff) // StripOffsets
    tag(0x0115, 3, 1, 3) // SamplesPerPixel
    tag(0x0117, 4, 1, nPix) // StripByteCounts
    if (gps) tag(0x8825, 4, 1, gpsIfdOff)
    bb.putInt(0) // next-IFD pointer: none
    if (gps) bb.putShort(0).putInt(0) // empty GPS IFD (0 entries, no next)
    bb.put(desc)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = rgb(x, y)
        bb.put(((c >> 16) & 0xff).toByte).put(((c >> 8) & 0xff).toByte)
          .put((c & 0xff).toByte)
        x += 1
      }
      y += 1
    }
    bb.array()
  }

  /** ICO (favicon) directory walk — the LARGEST entry's facts:
    * (count, width, height, payload offset, payload size). Directory
    * dims of 0 mean 256 per the format. Favicons are among the most
    * numerous image assets of a web crawl; a corpus card must not
    * read them as undecodable. None for non-ICO bytes or a directory
    * whose entries run off the file.
    */
  private def icoBest(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (b == null || b.length < 22 ||
      !(b(0) == 0 && b(1) == 0 && b(2) == 1 && b(3) == 0)) return None
    @inline def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    val count = (b(4) & 0xff) | ((b(5) & 0xff) << 8)
    if (count < 1 || count > 1024 || 6 + 16 * count > b.length) return None
    var bestA = -1L
    var bw = 0
    var bh = 0
    var boff = 0
    var bsize = 0
    var k = 0
    while (k < count) {
      val e = 6 + 16 * k
      val w = if ((b(e) & 0xff) == 0) 256 else b(e) & 0xff
      val h = if ((b(e + 1) & 0xff) == 0) 256 else b(e + 1) & 0xff
      val size = le32(e + 8)
      val off = le32(e + 12)
      // every entry must land inside the file — hostile offsets end it
      if (size <= 0 || off < 6 + 16 * count || off + size > b.length) return None
      if (w.toLong * h > bestA) {
        bestA = w.toLong * h; bw = w; bh = h
        boff = off.toInt; bsize = size.toInt
      }
      k += 1
    }
    Some((count, bw, bh, boff, bsize))
  }

  /** ICO header facts: (entry count, largest width, largest height). */
  private[graft] def icoInfo(b: Array[Byte]): Option[(Int, Int, Int)] =
    icoBest(b).map { case (n, w, h, _, _) => (n, w, h) }

  /** The largest ICO entry's payload when it is an embedded PNG
    * (the Vista-era convention for the big sizes); DIB-payload
    * entries stay header-facts-only.
    */
  private[graft] def icoPngPayload(b: Array[Byte]): Option[Array[Byte]] =
    icoBest(b).collect {
      case (_, _, _, off, size)
        if size >= 8 && b(off) == 0x89.toByte && b(off + 1) == 'P' &&
          b(off + 2) == 'N' && b(off + 3) == 'G' =>
        java.util.Arrays.copyOfRange(b, off, off + size)
    }

  /** Minimal ICO wrapping rendered PNG payloads — entry dims read
    * from each PNG's IHDR (256 stored as 0 per the format).
    */
  private[graft] def syntheticIco(pngs: Seq[Array[Byte]]): Array[Byte] = {
    require(pngs.nonEmpty && pngs.forall(_.length >= 24), "png payloads")
    val out = new java.io.ByteArrayOutputStream()
    def le16(n: Int): Unit = { out.write(n & 0xff); out.write((n >> 8) & 0xff) }
    def le32(n: Int): Unit = { le16(n & 0xffff); le16((n >> 16) & 0xffff) }
    le16(0); le16(1); le16(pngs.length)
    var off = 6 + 16 * pngs.length
    pngs.foreach { png =>
      @inline def be32(o: Int): Int =
        ((png(o) & 0xff) << 24) | ((png(o + 1) & 0xff) << 16) |
          ((png(o + 2) & 0xff) << 8) | (png(o + 3) & 0xff)
      val w = be32(16)
      val h = be32(20)
      require(w <= 256 && h <= 256, "icon entries cap at 256")
      out.write(if (w == 256) 0 else w); out.write(if (h == 256) 0 else h)
      out.write(0); out.write(0) // colors, reserved
      le16(1); le16(32) // planes, bpp
      le32(png.length); le32(off)
      off += png.length
    }
    pngs.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  /** SVG dimensions from the root tag's attributes — `width`/`height`
    * in CSS pixels (unitless or `px`; other units and percentages
    * report nothing), `viewBox` fallback. A bounded scan of the
    * leading 4 KiB (no XML parser: hostile documents can't recurse or
    * expand entities), accepting only whitespace / XML decl /
    * comments / DOCTYPE before the root `<svg` — an HTML page with an
    * inline svg is NOT an svg asset. The web's vector-image format:
    * a crawl's logos and icons must classify as images with real
    * dimensions, not ride the raw stub.
    */
  private[graft] def svgInfo(b: Array[Byte]): Option[(Int, Int)] = try {
    if (b == null || b.length < 5) return None
    val head = new String(b, 0, math.min(b.length, 4096),
      java.nio.charset.StandardCharsets.UTF_8)
    val at = head.indexOf("<svg")
    if (at < 0) return None
    val prefix = head.substring(0, at)
      .replaceAll("(?s)<\\?.*?\\?>|<!--.*?-->|<!DOCTYPE[^>]*>", "").trim
    if (prefix.nonEmpty && prefix != "\uFEFF") return None
    val gt = head.indexOf('>', at)
    val tag = if (gt < 0) head.substring(at) else head.substring(at, gt)
    def attr(p: java.util.regex.Pattern): String = {
      val m = p.matcher(tag)
      if (m.find()) m.group(1).trim else null
    }
    def px(v: String): Int = {
      if (v == null) return -1
      val s = (if (v.endsWith("px")) v.dropRight(2) else v).trim
      try {
        val d = s.toDouble
        if (d > 0 && d < 1e7) math.round(d).toInt else -1
      } catch { case _: NumberFormatException => -1 }
    }
    var w = px(attr(SvgWidthPat))
    var h = px(attr(SvgHeightPat))
    if (w <= 0 || h <= 0) {
      val vb = attr(SvgViewBoxPat)
      if (vb != null) {
        val parts = vb.split("[ ,]+")
        if (parts.length == 4) {
          val vw = px(parts(2))
          val vh = px(parts(3))
          if (vw > 0 && vh > 0) { w = vw; h = vh }
        }
      }
    }
    if (w > 0 && h > 0) Some((w, h)) else None
  } catch { case _: Throwable => None } // per-row isolation

  // compiled ONCE: svgInfo runs from classifyModality/sniffMime on
  // every unrecognized blob in a corpus scan — a per-call
  // Pattern.compile would be per-row cost. The negative lookbehind
  // keeps `stroke-width` from matching `width`.
  private def svgAttrPat(name: String): java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      "(?<![-\\w])" + name + "\\s*=\\s*[\"']([^\"']+)[\"']")
  private val SvgWidthPat = svgAttrPat("width")
  private val SvgHeightPat = svgAttrPat("height")
  private val SvgViewBoxPat = svgAttrPat("viewBox")

  /** PNG IHDR parse: width/height big-endian at offsets 16/20,
    * channels from the color type at 25 (grayscale 1, truecolor 3,
    * palette 1, gray+alpha 2, RGBA 4).
    */
  private[graft] def decodePng(b: Array[Byte]): Row = {
    if (b.length < 26) return meta(format = "png", ok = false, error = "truncated png header")
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return meta(format = "png", ok = false, error = "missing IHDR chunk")
    def be32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val w = be32(16)
    val h = be32(20)
    val channels = (b(25) & 0xff) match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case other => return meta(format = "png", ok = false, error = s"bad color type $other")
    }
    if (w <= 0 || h <= 0) meta(format = "png", ok = false, error = s"bad dimensions ${w}x$h")
    else meta(width = w, height = h, channels = channels, format = "png")
  }

  /** JPEG SOF parse: walk marker segments from SOI to the first frame
    * header (SOF0-15 minus DHT/JPG/DAC), read height/width/components.
    */
  private[graft] def decodeJpeg(b: Array[Byte]): Row = {
    var i = 2 // past SOI
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xFF)
        return meta(format = "jpeg", ok = false, error = f"bad marker byte at $i")
      val mk = b(i + 1) & 0xff
      if (mk == 0xFF) i += 1 // fill byte
      else if (mk == 0x01 || (mk >= 0xD0 && mk <= 0xD9)) i += 2 // standalone
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (mk >= 0xC0 && mk <= 0xCF && mk != 0xC4 && mk != 0xC8 && mk != 0xCC) {
          if (i + 9 >= b.length)
            return meta(format = "jpeg", ok = false, error = "truncated SOF segment")
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          val channels = b(i + 9) & 0xff
          return if (w <= 0 || h <= 0)
            meta(format = "jpeg", ok = false, error = s"bad dimensions ${w}x$h")
          else meta(width = w, height = h, channels = channels, format = "jpeg")
        }
        if (len < 2) return meta(format = "jpeg", ok = false, error = "bad segment length")
        i += 2 + len
      }
    }
    meta(format = "jpeg", ok = false, error = "no SOF marker found")
  }

  /** WAV RIFF chunk walk: `fmt ` yields channels + sample rate +
    * byte rate, `data` yields payload size; duration follows as
    * dataSize / byteRate.
    */
  private[graft] def decodeWav(b: Array[Byte]): Row = {
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var channels: Integer = null
    var sampleRate: Integer = null
    var byteRate = 0L
    var dataSize = -1L
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(i + 4)
      if (id == "fmt " && i + 16 + 8 <= b.length) {
        channels = le16(i + 10)
        sampleRate = le32(i + 12).toInt
        byteRate = le32(i + 16)
      } else if (id == "data") dataSize = size
      // chunks are word-aligned: odd sizes carry a pad byte; a hostile
      // size that would wrap the cursor ends the walk instead of
      // looping forever
      if (size > Int.MaxValue - i - 9) i = b.length
      else i += 8 + size.toInt + (size.toInt & 1)
    }
    if (channels == null)
      meta(format = "wav", ok = false, error = "missing fmt chunk")
    else if (dataSize < 0)
      meta(format = "wav", channels = channels, sampleRate = sampleRate,
        ok = false, error = "missing data chunk")
    else {
      val durMs: java.lang.Long =
        if (byteRate > 0) dataSize * 1000L / byteRate else null
      meta(channels = channels, format = "wav", sampleRate = sampleRate,
        durationMs = durMs)
    }
  }

  /** MP4 / ISO-BMFF box walk: top-level to `moov`, then `mvhd`
    * (timescale + duration, v0/v1 layouts) and the first `trak`'s
    * `tkhd` (16.16 fixed-point width/height).
    */
  private[graft] def decodeMp4(b: Array[Byte]): Row = {
    def be32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def boxId(o: Int): String = new String(b, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // all child boxes with `id` within [from, until), in order
    def findBoxes(id: String, from: Int, until: Int): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      var i = from
      while (i + 8 <= until) {
        val size = be32(i)
        // size < 8 is malformed (size=1 64-bit boxes unsupported); a
        // size that would wrap the cursor is hostile — stop either way
        if (size < 8 || size > Int.MaxValue - i) return out.result()
        if (boxId(i) == id) out += ((i, math.min(until, i + size.toInt)))
        i += size.toInt
      }
      out.result()
    }
    def findBox(id: String, from: Int, until: Int): Option[(Int, Int)] =
      findBoxes(id, from, until).headOption
    findBox("moov", 0, b.length) match {
      case None => meta(format = "mp4", ok = false, error = "no moov box")
      case Some((moov, moovEnd)) =>
        var durMs: java.lang.Long = null
        findBox("mvhd", moov + 8, moovEnd).foreach { case (mvhd, _) =>
          val version = b(mvhd + 8) & 0xff
          val (timescale, duration) =
            if (version == 1) (be32(mvhd + 28), be64(mvhd + 32))
            else (be32(mvhd + 20), be32(mvhd + 24))
          // all-ones duration is the spec's "unknown" sentinel
          // (fragmented/live-muxed) — keep durMs null, don't divide
          if (timescale > 0 && duration != 0xFFFFFFFFL && duration != -1L)
            durMs = duration * 1000L / timescale
        }
        var w: Integer = null
        var h: Integer = null
        // audio traks carry zero dims and commonly precede the video
        // trak — keep walking until one has real dimensions
        findBoxes("trak", moov + 8, moovEnd).foreach { case (trak, trakEnd) =>
          if (w == null) findBox("tkhd", trak + 8, trakEnd).foreach { case (tkhd, _) =>
            val version = b(tkhd + 8) & 0xff
            // after version+flags: creation, modification, track_ID,
            // reserved, duration (4-byte fields in v0; times+duration
            // widen to 8 in v1)
            val base =
              if (version == 1) tkhd + 12 + (8 + 8 + 4 + 4 + 8)
              else tkhd + 12 + (4 + 4 + 4 + 4 + 4)
            // skip reserved(8) + layer/altgroup/volume/reserved(8) + matrix(36)
            val dims = base + 16 + 36
            if (dims + 8 <= b.length) {
              val wf = be32(dims) >> 16   // 16.16 fixed point
              val hf = be32(dims + 4) >> 16
              if (wf > 0 && hf > 0) { w = wf.toInt; h = hf.toInt }
            }
          }
        }
        if (durMs == null && w == null)
          meta(format = "mp4", ok = false, error = "no mvhd/tkhd metadata")
        else meta(width = w, height = h, format = "mp4", durationMs = durMs)
    }
  }

  /** Parsed Matroska/WebM header facts — the EBML sibling of
    * [[decodeMp4]] for the container half the web's `<video>` tags
    * actually serve (and the mkv archives crawls mirror): `kind` is
    * the PRIMARY modality (`video` when any video track exists, else
    * `audio`), dims from the first video `TrackEntry`'s PixelWidth/
    * PixelHeight, duration from `Info`'s float Duration ×
    * TimecodeScale (ns, default 1e6), codec from CodecID, audio
    * channels + SamplingFrequency for audio-only files, `docType`
    * from the EBML header (`webm` / `matroska`), and `cuePoints` =
    * the `Cues` seek-table entry count (the keyframe-index size — 0
    * when the file carries no Cues, e.g. live-muxed streams).
    */
  final case class WebmInfo(docType: String, kind: String, width: Integer,
      height: Integer, durationMs: java.lang.Long, codec: String,
      channels: Integer, sampleRate: Integer, cuePoints: Int,
      subtitleTracks: Int = 0)

  /** EBML walk for [[WebmInfo]] — VINT ids/sizes (1-4 / 1-8 bytes),
    * unknown-size elements (all value bits set — the live-muxed
    * Segment convention) clamp to the parent, truncated containers
    * clamp while truncated leaves stop the sibling walk, and the
    * recursion is depth-capped and exception-guarded like the BMFF
    * walkers. None for non-EBML bytes or a file declaring no
    * video/audio track.
    */
  private[graft] def webmInfo(b: Array[Byte]): Option[WebmInfo] = try {
    if (b == null || b.length < 8 ||
      !(b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
        b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)) return None
    @inline def vintLen(o: Int): Int = {
      if (o >= b.length) return -1
      val b0 = b(o) & 0xff
      if (b0 == 0) -1 else Integer.numberOfLeadingZeros(b0) - 23
    }
    def readId(o: Int): Long = { // id keeps its marker bit
      val n = vintLen(o)
      if (n < 1 || n > 4 || o + n > b.length) return -1L
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    def readSize(o: Int): (Long, Int) = { // (-1, n) = unknown size
      val n = vintLen(o)
      if (n < 1 || n > 8 || o + n > b.length) return (-2L, 0)
      var v = (b(o) & 0xff & (0xff >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      (if (v == (1L << (7 * n)) - 1) -1L else v, n)
    }
    @inline def uintOf(from: Int, until: Int): Long = {
      var v = 0L
      var i = from
      while (i < until) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      v
    }
    def floatOf(from: Int, until: Int): Double = (until - from) match {
      case 4 => java.lang.Float.intBitsToFloat(uintOf(from, until).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uintOf(from, until))
      case _ => Double.NaN
    }
    var docType: String = null
    var timecodeScale = 1000000L // ns per tick, spec default
    var durationTicks = Double.NaN
    var kind: String = null
    var width: Integer = null
    var height: Integer = null
    var codec: String = null
    var channels: Integer = null
    var rate: Integer = null
    var cuePoints = 0
    var subtitleTracks = 0
    // per-TrackEntry scratch, committed when the entry closes —
    // TrackType may precede or follow the Video/Audio sub-elements
    var tType = -1
    var tNum = -1L
    var tCodec: String = null
    var tW = -1
    var tH = -1
    var tCh = -1
    var tRate = -1.0
    // subtitle counting follows webmTextTracks' registration rule —
    // first declaration per positive TrackNumber — so a hostile
    // redeclared/numberless TrackEntry can't make detection and
    // extraction disagree
    val seenSubs = scala.collection.mutable.Set.empty[Long]
    // track scratch fills ONLY inside a TrackEntry: a raw 0xD7/0x83
    // leaf planted at Segment/Cluster level must not leak into the
    // next entry (and all three EBML walkers share this rule, so
    // detection and extraction see the same tracks)
    var inTrack = false
    def finishTrack(): Unit = {
      if (tType == 1 && kind != "video") { // first video track wins
        kind = "video"
        codec = tCodec
        if (tW > 0) width = tW
        if (tH > 0) height = tH
      } else if (tType == 2 && kind == null) { // first audio, no video yet
        kind = "audio"
        codec = tCodec
        if (tCh > 0) channels = tCh
        if (tRate > 0) rate = Integer.valueOf(math.round(tRate).toInt)
      }
      if (tType == 0x11 && tNum > 0 && !seenSubs.contains(tNum)) {
        seenSubs += tNum
        subtitleTracks += 1 // subtitle track (text or image codec)
      }
      tType = -1; tNum = -1L; tCodec = null
      tW = -1; tH = -1; tCh = -1; tRate = -1.0
    }
    def walk(start: Int, end: Int, inCues: Boolean, depth: Int): Unit = {
      if (depth > 16) return
      var off = start
      while (off < end) {
        val id = readId(off)
        if (id < 0) return
        val idLen = vintLen(off)
        val (size, szLen) = readSize(off + idLen)
        if (szLen == 0) return
        val body = off + idLen + szLen
        val isContainer = id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1549A966L | 0x1654AE6BL |
               0xAEL | 0xE0L | 0xE1L | 0x1C53BB6BL => true
          case _ => false
        }
        // containers clamp to the parent (truncated uploads keep their
        // intact prefix; unknown size = extends to parent end, the
        // live-muxed Segment convention); truncated LEAVES end the walk
        val bodyEnd =
          if (size < 0) { if (isContainer) end else return }
          else if (size > end - body) { if (isContainer) end else return }
          else body + size.toInt
        id match {
          case 0xBBL if inCues => cuePoints += 1 // CuePoint: count only
          case _ if isContainer =>
            if (id == 0xAEL) inTrack = true
            walk(body, bodyEnd, inCues = id == 0x1C53BB6BL, depth + 1)
            if (id == 0xAEL) { finishTrack(); inTrack = false }
          case 0x4282L => // DocType
            docType = new String(b, body, bodyEnd - body, "ISO-8859-1")
          case 0x2AD7B1L =>
            val v = uintOf(body, bodyEnd)
            if (v > 0) timecodeScale = v
          case 0x4489L => durationTicks = floatOf(body, bodyEnd)
          case 0x83L if inTrack => tType = uintOf(body, bodyEnd).toInt
          case 0xD7L if inTrack => tNum = uintOf(body, bodyEnd)
          case 0x86L if inTrack =>
            tCodec = new String(b, body, bodyEnd - body, "ISO-8859-1")
          case 0xB0L if inTrack => tW = uintOf(body, bodyEnd).toInt
          case 0xBAL if inTrack => tH = uintOf(body, bodyEnd).toInt
          case 0x9FL if inTrack => tCh = uintOf(body, bodyEnd).toInt
          case 0xB5L if inTrack => tRate = floatOf(body, bodyEnd)
          case _ => () // leaf we don't need (Cluster, SeekHead, ...)
        }
        off = bodyEnd
      }
    }
    walk(0, b.length, inCues = false, 0)
    if (kind == null) None
    else {
      val durMs: java.lang.Long =
        if (durationTicks.isNaN || durationTicks < 0) null
        else java.lang.Long.valueOf(
          math.round(durationTicks * timecodeScale / 1e6))
      Some(WebmInfo(if (docType == null) "matroska" else docType, kind,
        width, height, durMs, codec, channels, rate, cuePoints,
        subtitleTracks))
    }
  } catch { case _: Throwable => None }

  /** Muxed subtitle cues from a Matroska/WebM file —
    * (docType, declaredLang, cues): the extraction half of the
    * container story ([[subtitleTrackCount]] detects; this reads the
    * text). One EBML pass: `Tracks` yields the S_TEXT track numbers
    * and their `Language` elements, then each `Cluster`'s `Timecode`
    * anchors its `BlockGroup`s — a subtitle cue is a `Block` on a
    * subtitle track (UTF-8 payload, no lacing) with its
    * `BlockDuration`; `SimpleBlock`s on subtitle tracks are accepted
    * too (zero duration when none is declared). Times =
    * (cluster + relative) ticks × TimecodeScale, reported in ms.
    * Cues come from ONE track — the first declared subtitle track
    * that carries any (the [[mp4TextTracks]] selection rule) — and
    * `declaredLang` is THAT track's `Language` (absent = `eng`, the
    * Matroska spec default), so a multi-language mux can never stamp
    * one track's cues with another's declaration. Depth-capped,
    * cue-capped (100k), exception-guarded like [[webmInfo]]. None
    * for non-EBML bytes or no subtitle cue.
    */
  private[graft] def webmSubtitleCues(b: Array[Byte]): Option[(String, String, Seq[SubCue])] =
    webmTextTracks(b) match {
      case None => None
      case Some((docType, tracks)) =>
        // first track with TEXT cues — textTracksOfRow's single-track
        // rule verbatim: S_TEXT tracks (null label) and webvtt tracks
        // both qualify, PGS null-text intervals don't
        tracks.find(t => t._3.nonEmpty && t._3.head.text != null).map {
          case (_, lang, cues) => (docType, lang, cues)
        }
    }

  /** EVERY subtitle track of a Matroska/WebM file, in declaration
    * order — (docType, per-track (codecLabel, declaredLang, cues)):
    * the multi-language surface behind [[webmSubtitleCues]] (which
    * picks the first TEXT track with cues) and
    * [[subtitleCuesByTrack]] (which keeps them all — a
    * dubbed/fansubbed mux carries parallel text in several
    * languages, and a pair-mining pipeline wants each under its own
    * declaration). `codecLabel` is null for `S_TEXT` tracks (the
    * caller labels them with the DocType) and the lowercased codec
    * suffix otherwise (`S_HDMV/PGS` → `pgs`, `S_VOBSUB` →
    * `vobsub`) — EVERY TrackType-0x11 track registers, matching
    * [[webmInfo]]'s `subtitleTracks` count, so detection and
    * extraction can never disagree about a Blu-ray-remux MKV whose
    * subs are bitmaps. Cues per codec family:
    *
    *  - `S_TEXT` (and codec-less): UTF-8 block payloads, as ever;
    *  - `S_TEXT/WEBVTT` (labelled `webvtt`): the WebM-project block
    *    layout — identifier line, settings line, then the cue
    *    payload — with the sidecar VTT rules applied (voice-span
    *    speaker captured, markup stripped);
    *  - `S_HDMV/PGS`: cue INTERVALS with null text, from the PGS
    *    composition state machine — a Presentation Composition
    *    Segment (type 0x16) with composition objects opens a display
    *    at its block time, one with zero objects clears it (the
    *    bitmap payload itself is image data for the OCR seam, not
    *    text); a display still open at stream end emits zero-length;
    *  - anything else (`S_VOBSUB`, …): declaration-only — the track
    *    row exists with its language and zero cues, distinguishing
    *    "image subs we don't decode" from "no subs".
    *
    * One EBML pass.
    */
  /** THE Matroska subtitle-codec classifier — one rule shared by
    * every walker (`webmTextTracks`, `webmPgsBitmaps`) so the
    * pgs/webvtt/text/other split can never drift between the
    * interval, bitmap and cap-counting surfaces: null for `S_TEXT`
    * families (plain text, labelled by DocType downstream),
    * `"webvtt"` for `S_TEXT/WEBVTT`, the lowercased suffix after the
    * last slash otherwise (`S_HDMV/PGS` → `pgs`, `S_VOBSUB` →
    * `vobsub`, `S_KATE` → `kate`).
    */
  private def webmSubCodecLabel(c: String): String =
    if (c == "S_TEXT/WEBVTT") "webvtt"
    else if (c == null || c.startsWith("S_TEXT")) null
    else {
      val base = if (c.startsWith("S_")) c.substring(2) else c
      val slash = base.lastIndexOf('/')
      (if (slash >= 0) base.substring(slash + 1) else base)
        .toLowerCase(java.util.Locale.ROOT)
    }

  private[graft] def webmTextTracks(b: Array[Byte]): Option[(String, Seq[(String, String, Seq[SubCue])])] = try {
    if (b == null || b.length < 8 ||
      !(b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
        b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)) return None
    @inline def vintLen(o: Int): Int = {
      if (o >= b.length) return -1
      val b0 = b(o) & 0xff
      if (b0 == 0) -1 else Integer.numberOfLeadingZeros(b0) - 23
    }
    def readId(o: Int): Long = {
      val n = vintLen(o)
      if (n < 1 || n > 4 || o + n > b.length) return -1L
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    def readSize(o: Int): (Long, Int) = {
      val n = vintLen(o)
      if (n < 1 || n > 8 || o + n > b.length) return (-2L, 0)
      var v = (b(o) & 0xff & (0xff >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      (if (v == (1L << (7 * n)) - 1) -1L else v, n)
    }
    @inline def uintOf(from: Int, until: Int): Long = {
      var v = 0L
      var i = from
      while (i < until) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      v
    }
    var docType: String = null
    var scaleNs = 1000000L
    var clusterTc = 0L
    // subtitle tracks in declaration order, with their declared
    // Language (absent = eng, the Matroska spec default) and codec
    // label (null = S_TEXT)
    val subTrackOrder = scala.collection.mutable.ArrayBuffer.empty[Long]
    val subTrackLang = scala.collection.mutable.Map.empty[Long, String]
    val subTrackCodec = scala.collection.mutable.Map.empty[Long, String]
    val subTracks = scala.collection.mutable.Set.empty[Long]
    // per-TrackEntry scratch — fills ONLY inside a TrackEntry (the
    // webmInfo rule: a raw 0xD7 leaf planted in a Cluster must not
    // leak into the next entry's registration)
    var inTrack = false
    var tNum = -1L
    var tType = -1
    var tCodec: String = null
    var tLang: String = null
    // per-BlockGroup scratch
    var bgTrack = -1L
    var bgStart = Long.MinValue
    var bgText: String = null
    var bgDurTicks = 0L
    // open PGS display per track: start tick, or MinValue when clear
    val pgsOpen = scala.collection.mutable.Map.empty[Long, Long]
    // (start ms, end ms, text) per subtitle track
    val cuesByTrack = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Long, String)]]
    var nCues = 0
    @inline def msOf(tick: Long): Long = tick * scaleNs / 1000000L
    def addCue(track: Long, stMs: Long, enMs: Long, text: String): Unit = {
      cuesByTrack.getOrElseUpdate(track,
        scala.collection.mutable.ArrayBuffer.empty) += ((stMs, enMs, text))
      nCues += 1
    }
    def parseBlock(from: Int, until: Int): Option[(Long, Long, String)] = {
      val tn = vintLen(from)
      if (tn < 1 || tn > 8 || from + tn + 3 > until) return None
      var track = (b(from) & 0xff & (0xff >>> tn)).toLong
      var i = 1
      while (i < tn) { track = (track << 8) | (b(from + i) & 0xffL); i += 1 }
      val cdc = subTrackCodec.getOrElse(track, null)
      if (!subTracks.contains(track) || (cdc != null && cdc != "webvtt"))
        return None // non-text tracks take the raw-payload path
      val rel = ((b(from + tn) & 0xff) << 8 | (b(from + tn + 1) & 0xff)).toShort.toLong
      val flags = b(from + tn + 2) & 0xff
      if ((flags & 0x06) != 0) return None // laced: not a subtitle shape
      val raw = new String(b, from + tn + 3, until - from - tn - 3,
        java.nio.charset.StandardCharsets.UTF_8)
      // WebVTT-in-WebM block layout (WebM project spec): cue
      // identifier line, cue settings line — either possibly empty —
      // then the cue payload; markup stays here, the per-track
      // assembly strips it and captures the voice-span speaker
      val text =
        if (cdc == "webvtt") {
          val lines = raw.split("\n", -1)
          (if (lines.length >= 3) lines.drop(2).mkString("\n")
          else lines.last).trim
        } else raw.trim
      if (text.isEmpty) None else Some((track, clusterTc + rel, text))
    }
    // a PGS block: the first Presentation Composition Segment's
    // object count drives the display state machine — objects > 0
    // opens (re-opens) a display at this block's time, zero clears it
    def pgsBlock(from: Int, until: Int): Unit = {
      val tn = vintLen(from)
      if (tn < 1 || tn > 8 || from + tn + 3 > until) return
      var track = (b(from) & 0xff & (0xff >>> tn)).toLong
      var i = 1
      while (i < tn) { track = (track << 8) | (b(from + i) & 0xffL); i += 1 }
      if (!subTracks.contains(track) || subTrackCodec(track) != "pgs") return
      val rel = ((b(from + tn) & 0xff) << 8 | (b(from + tn + 1) & 0xff)).toShort.toLong
      if ((b(from + tn + 2) & 0x06) != 0) return
      val tick = clusterTc + rel
      // segments: type(1) size(2 BE) payload — first PCS (0x16) wins
      var p = from + tn + 3
      var done = false
      while (!done && p + 3 <= until) {
        val typ = b(p) & 0xff
        val len = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
        val pay = p + 3
        if (pay + len > until) done = true
        else {
          if (typ == 0x16 && len >= 11) {
            val nObjs = b(pay + 10) & 0xff
            val open = pgsOpen.getOrElse(track, Long.MinValue)
            if (open != Long.MinValue)
              addCue(track, msOf(open), msOf(tick), null)
            pgsOpen(track) = if (nObjs > 0) tick else Long.MinValue
            done = true
          }
          p = pay + len
        }
      }
    }
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16 || nCues >= 100000) return
      var off = start
      while (off < end && nCues < 100000) {
        val id = readId(off)
        if (id < 0) return
        val idLen = vintLen(off)
        val (size, szLen) = readSize(off + idLen)
        if (szLen == 0) return
        val body = off + idLen + szLen
        val isContainer = id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1549A966L | 0x1654AE6BL |
               0xAEL | 0x1F43B675L | 0xA0L => true
          case _ => false
        }
        val bodyEnd =
          if (size < 0) { if (isContainer) end else return }
          else if (size > end - body) { if (isContainer) end else return }
          else body + size.toInt
        id match {
          case _ if isContainer =>
            if (id == 0xA0L) {
              bgTrack = -1L; bgStart = Long.MinValue; bgText = null
              bgDurTicks = 0L
            }
            if (id == 0xAEL) inTrack = true
            walk(body, bodyEnd, depth + 1)
            if (id == 0xAEL) { // TrackEntry closes
              // a hostile file redeclaring a TrackNumber must not
              // register the same cue buffer under two track indices;
              // EVERY TrackType-0x11 track registers (text codecs
              // carry cues, PGS carries intervals, the rest are
              // declaration-only) so the count matches webmInfo's
              if (tType == 0x11 && tNum > 0 && !subTracks.contains(tNum)) {
                subTracks += tNum
                subTrackOrder += tNum
                subTrackLang(tNum) = if (tLang != null) tLang else "eng"
                subTrackCodec(tNum) = webmSubCodecLabel(tCodec)
              }
              tNum = -1L; tType = -1; tCodec = null; tLang = null
              inTrack = false
            } else if (id == 0xA0L && bgText != null) { // BlockGroup closes
              val st = bgStart * scaleNs / 1000000L
              addCue(bgTrack, st, st + bgDurTicks * scaleNs / 1000000L, bgText)
            }
          case 0x4282L =>
            docType = new String(b, body, bodyEnd - body, "ISO-8859-1")
          case 0x2AD7B1L =>
            val v = uintOf(body, bodyEnd)
            if (v > 0) scaleNs = v
          case 0xD7L if inTrack => tNum = uintOf(body, bodyEnd)
          case 0x83L if inTrack => tType = uintOf(body, bodyEnd).toInt
          case 0x86L if inTrack =>
            tCodec = new String(b, body, bodyEnd - body, "ISO-8859-1")
          case 0x22B59CL if inTrack =>
            tLang = new String(b, body, bodyEnd - body, "ISO-8859-1")
          case 0xE7L => clusterTc = uintOf(body, bodyEnd)
          case 0xA1L => // Block inside a BlockGroup
            parseBlock(body, bodyEnd).foreach { case (track, tick, text) =>
              bgTrack = track; bgStart = tick; bgText = text
            }
            pgsBlock(body, bodyEnd) // PGS state machine, either carrier
          case 0x9BL => bgDurTicks = uintOf(body, bodyEnd)
          case 0xA3L => // SimpleBlock: no duration element
            parseBlock(body, bodyEnd).foreach { case (track, tick, text) =>
              val st = tick * scaleNs / 1000000L
              addCue(track, st, st, text)
            }
            pgsBlock(body, bodyEnd)
          case _ => ()
        }
        off = bodyEnd
      }
    }
    walk(0, b.length, 0)
    // a display still open at stream end (real streams always clear;
    // truncated uploads may not): zero-length, not lost
    pgsOpen.foreach { case (track, open) =>
      if (open != Long.MinValue && nCues < 100000)
        addCue(track, msOf(open), msOf(open), null)
    }
    if (subTrackOrder.isEmpty) None
    else {
      val perTrack = subTrackOrder.toSeq.map { track =>
        val cdc = subTrackCodec.getOrElse(track, null)
        val got = cuesByTrack.getOrElse(track,
          scala.collection.mutable.ArrayBuffer.empty).zipWithIndex.map {
          case ((st, en, text), k) =>
            if (cdc == "webvtt" && text != null) {
              // the sidecar VTT rule applied to the muxed carrier:
              // voice-span speaker from the first payload line, then
              // the markup strip
              val nl = text.indexOf('\n')
              val speaker = voiceSpanName(
                (if (nl >= 0) text.substring(0, nl) else text).trim)
              SubCue(k + 1, st, en, stripVttMarkup(text).trim, speaker)
            } else SubCue(k + 1, st, en, text)
        }.toSeq
        (cdc, subTrackLang.getOrElse(track, "eng"), got)
      }
      Some(((if (docType == null) "matroska" else docType), perTrack))
    }
  } catch { case _: Throwable => None } // per-row isolation

  /** PGS run-length decode → palette indices, row-major w×h (public
    * segment layout, the one every Blu-ray authoring/decode stack
    * implements): a non-zero byte is one pixel of that entry; 0x00
    * escapes — 0x00 0x00 ends the line, low bits of the flag byte
    * select short/long zero runs (00/01) and short/long colored runs
    * (10/11). Out-of-bounds writes clip (hostile lengths can't
    * overrun), truncated data leaves the remainder transparent.
    */
  private[graft] def decodePgsRle(d: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var i = 0
    var x = 0
    var y = 0
    while (i < d.length && y < h) {
      val c = d(i) & 0xff
      i += 1
      if (c != 0) {
        if (x < w) out(y * w + x) = c.toByte
        x += 1
      } else if (i < d.length) {
        val f = d(i) & 0xff
        i += 1
        if (f == 0) { y += 1; x = 0 }
        else {
          var len = 0
          var col = 0
          (f >> 6) match {
            case 0 => len = f & 0x3f
            case 1 => if (i < d.length) {
              len = ((f & 0x3f) << 8) | (d(i) & 0xff); i += 1
            }
            case 2 => if (i < d.length) {
              len = f & 0x3f; col = d(i) & 0xff; i += 1
            }
            case _ => if (i + 1 < d.length) {
              len = ((f & 0x3f) << 8) | (d(i) & 0xff)
              col = d(i + 1) & 0xff; i += 2
            }
          }
          var k = 0
          while (k < len && x < w) {
            if (y < h) out(y * w + x) = col.toByte
            x += 1; k += 1
          }
          x += math.max(0, len - k) // clip, but keep the cursor honest
        }
      }
    }
    out
  }

  /** Decoded PGS bitmap cues from a Matroska/WebM file — the OCR/
    * vision seam for image subtitles: one row per display interval of
    * every `S_HDMV/PGS` track, `(track_idx, cue_idx, start_ms,
    * end_ms, width, height, png)`. `track_idx`/`cue_idx` are THE SAME
    * ordinals [[webmTextTracks]] gives the track's null-text
    * intervals (same registration walk, same PCS open/clear state
    * machine), so a bitmap row joins its interval row exactly; a
    * display whose object never arrived (interval before the first
    * ODS of a truncated stream) skips its row but keeps its ordinal.
    * The full display-set state machine: PDS palettes (BT.709
    * full-range YCrCb, alpha composited onto black — subtitle plates
    * render for a recognizer, not a compositor), ODS objects with
    * continuation-fragment stitching, PCS composition referencing
    * object 0's palette. Pixels re-encode as PNG so the existing
    * image stack ([[imageStats]], [[dhash64]], [[annotateImages]])
    * consumes them unchanged. Caps: 2M pixels per object, 4 MiB of
    * RLE, 100k cues — the walker discipline. None for non-EBML bytes
    * or no PGS track.
    */
  private[graft] def webmPgsBitmaps(
      b: Array[Byte]): Option[Seq[(Int, Int, Long, Long, Int, Int, Array[Byte])]] = try {
    if (b == null || b.length < 8 ||
      !(b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
        b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)) return None
    @inline def vintLen(o: Int): Int = {
      if (o >= b.length) return -1
      val b0 = b(o) & 0xff
      if (b0 == 0) -1 else Integer.numberOfLeadingZeros(b0) - 23
    }
    def readId(o: Int): Long = {
      val n = vintLen(o)
      if (n < 1 || n > 4 || o + n > b.length) return -1L
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    def readSize(o: Int): (Long, Int) = {
      val n = vintLen(o)
      if (n < 1 || n > 8 || o + n > b.length) return (-2L, 0)
      var v = (b(o) & 0xff & (0xff >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      (if (v == (1L << (7 * n)) - 1) -1L else v, n)
    }
    @inline def uintOf(from: Int, until: Int): Long = {
      var v = 0L
      var i = from
      while (i < until) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      v
    }
    var scaleNs = 1000000L
    var clusterTc = 0L
    // the SAME registration walk as webmTextTracks, so track_idx
    // ordinals agree between the interval and bitmap surfaces
    val subTrackOrder = scala.collection.mutable.ArrayBuffer.empty[Long]
    val subTracks = scala.collection.mutable.Set.empty[Long]
    val pgsTracks = scala.collection.mutable.Set.empty[Long]
    // text tracks count toward the SHARED 100k cue cap exactly as in
    // webmTextTracks, so both walkers truncate at the same stream
    // point and the documented ordinal join survives a mixed
    // text+PGS file that reaches the cap
    val textTracks = scala.collection.mutable.Set.empty[Long]
    val vttTracks = scala.collection.mutable.Set.empty[Long]
    // track scratch fills ONLY inside a TrackEntry — the shared
    // walker rule (see webmInfo)
    var inTrack = false
    var tNum = -1L
    var tType = -1
    var tCodec: String = null
    // display-set state per PGS track
    val palettes = scala.collection.mutable
      .Map.empty[(Long, Int), Map[Int, (Int, Int, Int, Int)]]
    val objects = scala.collection.mutable
      .Map.empty[(Long, Int), (Int, Int, java.io.ByteArrayOutputStream)]
    // open display: start tick, object id, palette id
    val pgsOpen = scala.collection.mutable.Map.empty[Long, (Long, Int, Int)]
    val cueIdx = scala.collection.mutable.Map.empty[Long, Int]
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Int, Long, Long, Int, Int, Array[Byte])]
    var nCues = 0
    @inline def msOf(tick: Long): Long = tick * scaleNs / 1000000L
    @inline def clamp(v: Double): Int =
      math.max(0, math.min(255, math.round(v).toInt))
    def emit(track: Long, stTick: Long, enTick: Long, objId: Int,
        palId: Int): Unit = {
      val k = cueIdx.getOrElse(track, 0) + 1
      cueIdx(track) = k
      nCues += 1
      objects.get((track, objId)).foreach { case (w, h, buf) =>
        if (w > 0 && h > 0 && w.toLong * h <= 2000000L) {
          val px = decodePgsRle(buf.toByteArray, w, h)
          val pal = palettes.getOrElse((track, palId), Map.empty)
          val lut = Array.tabulate(256) { idx =>
            pal.get(idx).map { case (yv, cr, cb, a) =>
              // BT.709 full-range; composite onto black (×a/255)
              val r = clamp(yv + 1.5748 * (cr - 128)) * a / 255
              val g = clamp(yv - 0.1873 * (cb - 128) -
                0.4681 * (cr - 128)) * a / 255
              val bl = clamp(yv + 1.8556 * (cb - 128)) * a / 255
              (r << 16) | (g << 8) | bl
            }.getOrElse(0) // unmapped entries are transparent
          }
          val png = renderPng(w, h, (x, y) => lut(px(y * w + x) & 0xff))
          out += ((track, k, msOf(stTick), msOf(enTick), w, h, png))
        }
      }
    }
    def pgsBlock(from: Int, until: Int): Unit = {
      val tn = vintLen(from)
      if (tn < 1 || tn > 8 || from + tn + 3 > until) return
      var track = (b(from) & 0xff & (0xff >>> tn)).toLong
      var i = 1
      while (i < tn) { track = (track << 8) | (b(from + i) & 0xffL); i += 1 }
      if (!pgsTracks.contains(track)) return
      val rel = ((b(from + tn) & 0xff) << 8 | (b(from + tn + 1) & 0xff)).toShort.toLong
      if ((b(from + tn + 2) & 0x06) != 0) return
      val tick = clusterTc + rel
      var p = from + tn + 3
      // the interval surface honors only the FIRST PCS per block —
      // same here, or ordinals drift on a hostile two-PCS block
      var pcsDone = false
      while (p + 3 <= until) {
        val typ = b(p) & 0xff
        val len = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
        val pay = p + 3
        if (pay + len > until) return
        typ match {
          case 0x14 if len >= 2 => // PDS: id, version, then 5-byte entries
            val palId = b(pay) & 0xff
            var e = pay + 2
            var m = palettes.getOrElse((track, palId),
              Map.empty[Int, (Int, Int, Int, Int)])
            while (e + 5 <= pay + len) {
              m += ((b(e) & 0xff) -> ((b(e + 1) & 0xff, b(e + 2) & 0xff,
                b(e + 3) & 0xff, b(e + 4) & 0xff)))
              e += 5
            }
            palettes((track, palId)) = m
          case 0x15 if len >= 4 => // ODS: id(2) ver(1) seq(1) ...
            val objId = ((b(pay) & 0xff) << 8) | (b(pay + 1) & 0xff)
            val seqFlag = b(pay + 3) & 0xff
            if ((seqFlag & 0x80) != 0 && len >= 11) { // first fragment
              val w = ((b(pay + 7) & 0xff) << 8) | (b(pay + 8) & 0xff)
              val h = ((b(pay + 9) & 0xff) << 8) | (b(pay + 10) & 0xff)
              val buf = new java.io.ByteArrayOutputStream()
              buf.write(b, pay + 11, len - 11)
              objects((track, objId)) = (w, h, buf)
            } else objects.get((track, objId)).foreach { case (_, _, buf) =>
              if (buf.size + len <= 4 * 1024 * 1024)
                buf.write(b, pay + 4, len - 4) // continuation fragment
            }
          case 0x16 if len >= 11 && !pcsDone => // PCS: open/clear
            pcsDone = true
            val palId = b(pay + 9) & 0xff
            val nObjs = b(pay + 10) & 0xff
            pgsOpen.get(track).foreach { case (st, obj, pal) =>
              if (nCues < 100000) emit(track, st, tick, obj, pal)
            }
            if (nObjs > 0) {
              // a malformed PCS that declares objects but truncates
              // the object list still OPENS (the interval surface
              // opens on the count alone — ordinals must agree)
              val objId =
                if (len >= 13)
                  ((b(pay + 11) & 0xff) << 8) | (b(pay + 12) & 0xff)
                else 0
              pgsOpen(track) = (tick, objId, palId)
            } else pgsOpen.remove(track)
          case _ => ()
        }
        p = pay + len
      }
    }
    // would webmTextTracks emit a text cue for this block? — the
    // SAME predicate (registered text track, unlaced, non-empty
    // payload with the webvtt line-drop), so the shared counter
    // advances at identical stream points in both walkers
    def textCueAt(from: Int, until: Int): Boolean = {
      val tn = vintLen(from)
      if (tn < 1 || tn > 8 || from + tn + 3 > until) return false
      var track = (b(from) & 0xff & (0xff >>> tn)).toLong
      var i = 1
      while (i < tn) { track = (track << 8) | (b(from + i) & 0xffL); i += 1 }
      if (!textTracks.contains(track)) return false
      if ((b(from + tn + 2) & 0x06) != 0) return false
      val raw = new String(b, from + tn + 3, until - from - tn - 3,
        java.nio.charset.StandardCharsets.UTF_8)
      val text =
        if (vttTracks.contains(track)) {
          val lines = raw.split("\n", -1)
          (if (lines.length >= 3) lines.drop(2).mkString("\n")
          else lines.last).trim
        } else raw.trim
      text.nonEmpty
    }
    var bgTextPending = false
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16 || nCues >= 100000) return
      var off = start
      while (off < end && nCues < 100000) {
        val id = readId(off)
        if (id < 0) return
        val idLen = vintLen(off)
        val (size, szLen) = readSize(off + idLen)
        if (szLen == 0) return
        val body = off + idLen + szLen
        val isContainer = id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1549A966L | 0x1654AE6BL |
               0xAEL | 0x1F43B675L | 0xA0L => true
          case _ => false
        }
        val bodyEnd =
          if (size < 0) { if (isContainer) end else return }
          else if (size > end - body) { if (isContainer) end else return }
          else body + size.toInt
        id match {
          case _ if isContainer =>
            if (id == 0xA0L) bgTextPending = false
            if (id == 0xAEL) inTrack = true
            walk(body, bodyEnd, depth + 1)
            if (id == 0xAEL) {
              if (tType == 0x11 && tNum > 0 && !subTracks.contains(tNum)) {
                subTracks += tNum
                subTrackOrder += tNum
                // the SHARED classifier, so pgs/webvtt/text can never
                // diverge from webmTextTracks' view of the same file
                webmSubCodecLabel(tCodec) match {
                  case "pgs" => pgsTracks += tNum
                  case "webvtt" => textTracks += tNum; vttTracks += tNum
                  case null => textTracks += tNum
                  case _ => () // declaration-only in both walkers
                }
              }
              tNum = -1L; tType = -1; tCodec = null
              inTrack = false
            } else if (id == 0xA0L && bgTextPending) {
              nCues += 1 // the BlockGroup cue webmTextTracks counts
              bgTextPending = false
            }
          case 0x2AD7B1L =>
            val v = uintOf(body, bodyEnd)
            if (v > 0) scaleNs = v
          case 0xD7L if inTrack => tNum = uintOf(body, bodyEnd)
          case 0x83L if inTrack => tType = uintOf(body, bodyEnd).toInt
          case 0x86L if inTrack =>
            tCodec = new String(b, body, bodyEnd - body, "ISO-8859-1")
          case 0xE7L => clusterTc = uintOf(body, bodyEnd)
          case 0xA1L =>
            pgsBlock(body, bodyEnd)
            if (textCueAt(body, bodyEnd)) bgTextPending = true
          case 0xA3L =>
            pgsBlock(body, bodyEnd)
            if (textCueAt(body, bodyEnd)) nCues += 1
          case _ => ()
        }
        off = bodyEnd
      }
    }
    walk(0, b.length, 0)
    // open at stream end: zero-length, like the interval surface
    pgsOpen.foreach { case (track, (st, obj, pal)) =>
      if (nCues < 100000) emit(track, st, st, obj, pal)
    }
    if (out.isEmpty) None
    else {
      val trackPos = subTrackOrder.zipWithIndex
        .map { case (t, i) => t -> (i + 1) }.toMap
      Some(out.toSeq.map { case (track, k, st, en, w, h, png) =>
        (trackPos(track), k, st, en, w, h, png)
      })
    }
  } catch { case _: Throwable => None } // per-row isolation

  /** Image-subtitle bitmaps as a DataFrame — the multimodal column
    * feeding OCR/vision models: one row per decodable PGS display of
    * every input asset, `(id, track_idx, cue_idx, start_ms, end_ms,
    * width, height, bitmap)` where `bitmap` is a PNG the existing
    * image stack decodes ([[imageStats]] for plate statistics,
    * [[dhash64]] for near-dup plates, [[annotateImages]] as the OCR
    * transport). track_idx/cue_idx join [[subtitleCuesByTrack]]'s
    * null-text interval rows exactly. Map-only, per-row-isolated,
    * same caps as the walkers.
    */
  def imageSubtitleBitmaps(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idField = inSchema(inSchema.fieldIndex(idCol))
    val outSchema = StructType(Seq(idField,
      StructField("track_idx", IntegerType),
      StructField("cue_idx", IntegerType),
      StructField("start_ms", LongType),
      StructField("end_ms", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bitmap", BinaryType)))
    val idIdx = inSchema.fieldIndex(idCol)
    val contentIdx = inSchema.fieldIndex(contentCol)
    val isBinary = inSchema(contentIdx).dataType == BinaryType
    val rdd = df.rdd.flatMap { row =>
      val bytes =
        if (isBinary && !row.isNullAt(contentIdx))
          row.getAs[Array[Byte]](contentIdx)
        else null
      webmPgsBitmaps(bytes).getOrElse(Nil).map {
        case (trk, k, st, en, w, h, png) =>
          Row(row.get(idIdx), trk, k, st, en, w, h, png)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Attached cover art from a Matroska/WebM file — the `Attachments`
    * element (`AttachedFile`: FileMimeType + FileData) the MKA
    * convention stores album art in: the first attachment with an
    * `image/`-prefixed MIME type wins. Same EBML reading and
    * depth-cap discipline as [[webmInfo]].
    */
  private[graft] def webmAttachedPicture(b: Array[Byte]): Option[(String, Array[Byte])] = try {
    if (b == null || b.length < 8 ||
      !(b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
        b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)) return None
    @inline def vintLen(o: Int): Int = {
      if (o >= b.length) return -1
      val b0 = b(o) & 0xff
      if (b0 == 0) -1 else Integer.numberOfLeadingZeros(b0) - 23
    }
    def readId(o: Int): Long = {
      val n = vintLen(o)
      if (n < 1 || n > 4 || o + n > b.length) return -1L
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    def readSize(o: Int): (Long, Int) = {
      val n = vintLen(o)
      if (n < 1 || n > 8 || o + n > b.length) return (-2L, 0)
      var v = (b(o) & 0xff & (0xff >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      (if (v == (1L << (7 * n)) - 1) -1L else v, n)
    }
    // per-AttachedFile scratch, committed when the element closes
    var fMime: String = null
    var fFrom = -1
    var fUntil = -1
    var mime: String = null
    var art: Array[Byte] = null
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16 || art != null) return
      var off = start
      while (off < end && art == null) {
        val id = readId(off)
        if (id < 0) return
        val idLen = vintLen(off)
        val (size, szLen) = readSize(off + idLen)
        if (szLen == 0) return
        val body = off + idLen + szLen
        val isContainer = id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1941A469L | 0x61A7L => true
          case _ => false
        }
        val bodyEnd =
          if (size < 0) { if (isContainer) end else return }
          else if (size > end - body) { if (isContainer) end else return }
          else body + size.toInt
        id match {
          case _ if isContainer =>
            if (id == 0x61A7L) { fMime = null; fFrom = -1; fUntil = -1 }
            walk(body, bodyEnd, depth + 1)
            if (id == 0x61A7L && art == null && fMime != null &&
              fMime.startsWith("image/") && fFrom >= 0) {
              mime = fMime
              art = java.util.Arrays.copyOfRange(b, fFrom, fUntil)
            }
          case 0x4660L => // FileMimeType
            fMime = new String(b, body, bodyEnd - body, "ISO-8859-1")
          case 0x465CL => // FileData
            fFrom = body; fUntil = bodyEnd
          case _ => ()
        }
        off = bodyEnd
      }
    }
    walk(0, b.length, 0)
    if (art == null) None else Some((mime, art))
  } catch { case _: Throwable => None } // per-row isolation

  /** Every trak's `hdlr` handler type in an ISO-BMFF movie —
    * `vide`/`soun` plus the subtitle carriers (`sbtl` QuickTime/MOV
    * tx3g, `subt` ISO 14496-30, `text` QuickTime text). Depth-capped
    * walk like its BMFF siblings.
    */
  private[graft] def mp4TrackHandlers(b: Array[Byte]): Seq[String] = try {
    if (b == null || b.length < 16 ||
      !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return Nil
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    @inline def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    val out = Seq.newBuilder[String]
    def walk(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 16) return
      var off = start
      while (off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = new String(b, off.toInt + 4, 4, "ISO-8859-1")
        var body = off + 8
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) return
        id match {
          case "moov" | "trak" | "mdia" => walk(body, boxEnd, depth + 1)
          case "hdlr" if body + 12 <= boxEnd =>
            out += new String(b, body.toInt + 8, 4, "ISO-8859-1")
          case _ => ()
        }
        off = boxEnd
      }
    }
    walk(0L, b.length.toLong, 0)
    out.result()
  } catch { case _: Throwable => Nil }

  /** Container-DECLARED subtitle track count — the detection half of
    * the video-text surface ([[subtitleCues]] parses the sidecar
    * files; this flags muxed-in text): ISO-BMFF `hdlr` types
    * `sbtl`/`subt`/`text` EXCLUDING tracks another trak references
    * as its chapter list via `tref/chap` (QuickTime chapters are
    * segmentation, not dialog — [[mediaChapters]]' surface; the
    * roles come from the SAME [[mp4TextTracks]] walk the extraction
    * uses, so detection and extraction can't disagree), Matroska
    * TrackType 0x11. Null for non-container bytes (callers treat
    * null as unknown, 0 as "declares none"). The BMFF count ceils at
    * 64 declared text tracks — the walk's hostile-file bound; real
    * movies carry a handful.
    */
  def subtitleTrackCount(b: Array[Byte]): Integer = try {
    if (b == null || b.length < 16) return null
    if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') {
      val (tracks, chapRefs) = mp4TextTracks(b, decodeCues = false)
      return Integer.valueOf(tracks.count(t => !chapRefs.contains(t.id)))
    }
    if (b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
      b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)
      return webmInfo(b).map(i => Integer.valueOf(i.subtitleTracks)).orNull
    null
  } catch { case _: Throwable => null }

  /** DECLARED language of the muxed text stream — the metadata the
    * container itself asserts, before any detection runs over the cue
    * text (a pairing pipeline filters on both: declared-vs-detected
    * disagreement is itself a quality signal). Sources:
    *
    *  - ISO-BMFF: the subtitle trak's `mdhd` language code (3×5-bit
    *    packed ISO-639-2/T); 0 = unset → None;
    *  - Matroska/WebM: the subtitle TrackEntry's `Language` element
    *    (0x22B59C); ABSENT means `eng` per the Matroska spec default;
    *  - ID3: the SYLT frame's 3-char language field.
    *
    * None for sidecar text files (SRT/VTT/ASS/LRC carry no reliable
    * language declaration) and non-container bytes. Public for the
    * generated-code static call.
    */
  def declaredTextLang(b: Array[Byte]): String = try {
    if (b == null || b.length < 10) return null
    // ID3-led audio: the SYLT language field
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      var lang: String = null
      id3FrameWalk(b) { (id, frame, from, until) =>
        if (lang == null && (id == "SYLT" || id == "SLT") && until - from >= 6)
          lang = new String(frame, from + 1, 3, "ISO-8859-1")
      }
      return lang
    }
    // ISO-BMFF: the first SUBTITLE trak's mdhd language — a text
    // track the movie marks as its chapter list (tref/chap) is
    // segmentation, not the dialog stream, and must not supply the
    // declared language; the roles come from the SAME
    // [[mp4TextTracks]] walk the extraction uses
    if (b.length >= 16 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
      b(7) == 'p') {
      val (tracks, chapRefs) = mp4TextTracks(b, decodeCues = false)
      return tracks.find(t => !chapRefs.contains(t.id) && t.lang != null)
        .map(_.lang).orNull
    }
    // Matroska/WebM: subtitle TrackEntry's Language element
    if (b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
      b(2) == 0xDF.toByte && b(3) == 0xA3.toByte) {
      @inline def vintLen(o: Int): Int = {
        if (o >= b.length) return -1
        val b0 = b(o) & 0xff
        if (b0 == 0) -1 else Integer.numberOfLeadingZeros(b0) - 23
      }
      def readId(o: Int): Long = {
        val n = vintLen(o)
        if (n < 1 || n > 4 || o + n > b.length) return -1L
        var v = 0L
        var i = 0
        while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
        v
      }
      def readSize(o: Int): (Long, Int) = {
        val n = vintLen(o)
        if (n < 1 || n > 8 || o + n > b.length) return (-2L, 0)
        var v = (b(o) & 0xff & (0xff >>> n)).toLong
        var i = 1
        while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
        (if (v == (1L << (7 * n)) - 1) -1L else v, n)
      }
      var tType = -1
      var tLang: String = null
      var found: String = null
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 16) return
        var off = start
        while (found == null && off < end) {
          val id = readId(off)
          if (id < 0) return
          val idLen = vintLen(off)
          val (size, szLen) = readSize(off + idLen)
          if (szLen == 0) return
          val body = off + idLen + szLen
          val isContainer = id match {
            case 0x1A45DFA3L | 0x18538067L | 0x1654AE6BL | 0xAEL => true
            case _ => false
          }
          val bodyEnd =
            if (size < 0) { if (isContainer) end else return }
            else if (size > end - body) { if (isContainer) end else return }
            else body + size.toInt
          id match {
            case _ if isContainer =>
              walk(body, bodyEnd, depth + 1)
              if (id == 0xAEL) { // TrackEntry closes
                if (found == null && tType == 0x11)
                  found = if (tLang != null) tLang else "eng" // spec default
                tType = -1; tLang = null
              }
            case 0x83L =>
              var v = 0L
              var i = body
              while (i < bodyEnd) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
              tType = v.toInt
            case 0x22B59CL =>
              tLang = new String(b, body, bodyEnd - body, "ISO-8859-1")
            case _ => ()
          }
          off = bodyEnd
        }
      }
      walk(0, b.length, 0)
      return found
    }
    null
  } catch { case _: Throwable => null } // per-row isolation

  /** [[declaredTextLang]] as a Column — codegen'd like
    * [[subtitleTrackCountCol]].
    */
  def declaredTextLangCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(DeclaredTextLang(expressionOf(content)))
  }

  case class DeclaredTextLang(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val s = declaredTextLang(v.asInstanceOf[Array[Byte]])
      if (s == null) null
      else org.apache.spark.unsafe.types.UTF8String.fromString(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val raw = ctx.freshName("dlang")
      ev.copy(code = code"""
        ${c.code}
        String $raw = ${c.isNull} ? null :
          graft.operators.Multimodal.declaredTextLang(${c.value});
        final boolean ${ev.isNull} = $raw == null;
        final org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          ${ev.isNull} ? null :
          org.apache.spark.unsafe.types.UTF8String.fromString($raw);""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): DeclaredTextLang = copy(c)
  }

  /** [[subtitleTrackCount]] as a Column — codegen'd like
    * [[scrubGpsCol]], so the flag is a map-only projection.
    */
  def subtitleTrackCountCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(SubtitleTrackCount(expressionOf(content)))
  }

  case class SubtitleTrackCount(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val r = subtitleTrackCount(v.asInstanceOf[Array[Byte]])
      if (r == null) null else r.intValue
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("subTrk")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Integer $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.subtitleTrackCount(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final int ${ev.value} = ${ev.isNull} ? 0 : $boxed.intValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): SubtitleTrackCount = copy(c)
  }

  /** Splice a minimal subtitle trak (`mdia/hdlr` type `sbtl`) into an
    * existing ISO-BMFF movie's `moov` — the fixture real muxers emit
    * alongside tx3g sample tables ([[syntheticM4aTagged]]'s splice
    * discipline).
    */
  private[graft] def withMp4SubtitleTrack(mp4: Array[Byte]): Array[Byte] = {
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(id.getBytes("ISO-8859-1")).put(payload)
      out.array()
    }
    val hdlr = new Array[Byte](8) ++ "sbtl".getBytes("ISO-8859-1") ++
      new Array[Byte](12)
    val trak = box("trak", box("mdia", box("hdlr", hdlr)))
    val ftypLen = java.nio.ByteBuffer.wrap(mp4, 0, 4).getInt
    require(new String(mp4, ftypLen + 4, 4, "ISO-8859-1") == "moov" &&
      java.nio.ByteBuffer.wrap(mp4, ftypLen, 4).getInt == mp4.length - ftypLen,
      "ftyp ++ moov synthetics only")
    val moovPayload = java.util.Arrays.copyOfRange(mp4, ftypLen + 8, mp4.length)
    java.util.Arrays.copyOfRange(mp4, 0, ftypLen) ++
      box("moov", moovPayload ++ trak)
  }

  /** Minimal-but-valid Matroska/WebM from the given facts — EBML
    * header (DocType) + Segment(Info(TimecodeScale, float Duration),
    * Tracks(TrackEntry...), Cues(CuePoint...)): every value
    * [[webmInfo]] reports is a closed form of the arguments
    * ([[syntheticMjpegMp4]] discipline). `kind` `"video"` writes a
    * video track (+ an audio track after it, proving primary-modality
    * selection); `"audio"` writes the audio track alone.
    */
  private[graft] def syntheticWebm(kind: String, width: Int = 0,
      height: Int = 0, channels: Int = 0, sampleRate: Int = 0,
      durationMs: Long = -1L, codec: String = "V_VP9",
      cuePoints: Int = 0, docType: String = "webm",
      tags: Option[(String, String, String)] = None,
      subtitleTracks: Int = 0,
      subCues: Seq[(Long, Long, String)] = Nil,
      attachedArt: Option[(String, Array[Byte])] = None,
      subLang: Option[String] = None,
      chapters: Seq[(Long, Long, String)] = Nil,
      subLang2: Option[String] = None,
      subCues2: Seq[(Long, Long, String)] = Nil,
      // image-subtitle tracks after the text ones: (codec id,
      // language, display intervals) — S_HDMV/PGS intervals mux as
      // PCS open/clear display sets; other codecs declare only
      imageSubs: Seq[(String, String, Seq[(Long, Long)])] = Nil,
      // imageSubs index -> (w, h, palette-index fn): PGS display sets
      // gain WDS+PDS+ODS so the open carries a REAL bitmap — palette
      // entry k is full-range gray Y=k (Cr=Cb=128) opaque, so the
      // decoded pixel is exactly gray(index)
      pgsObjects: Map[Int, (Int, Int, (Int, Int) => Int)] = Map.empty): Array[Byte] = {
    require(subCues.isEmpty || subtitleTracks > 0,
      "muxed cues ride the first subtitle track")
    require(subCues2.isEmpty || subtitleTracks > 1,
      "second-track cues need a second subtitle track")
    def vintSize(n: Long): Array[Byte] = { // 4-byte size VINT
      require(n >= 0 && n < (1L << 28), s"fixture size too large: $n")
      Array((0x10 | (n >> 24)).toByte, ((n >> 16) & 0xff).toByte,
        ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
    }
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte)
    }
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ vintSize(payload.length.toLong) ++ payload
    def uintEl(id: Long, v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      el(id, Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte))
    }
    def strEl(id: Long, s: String): Array[Byte] =
      el(id, s.getBytes("ISO-8859-1"))
    val ebml = el(0x1A45DFA3L, strEl(0x4282L, docType))
    val scale = 1000000L
    val info = el(0x1549A966L, uintEl(0x2AD7B1L, scale) ++
      (if (durationMs < 0) Array.emptyByteArray
       else el(0x4489L, { // 8-byte float, ticks of 1 ms at this scale
         val bb = java.nio.ByteBuffer.allocate(8)
         bb.putDouble(durationMs.toDouble)
         bb.array()
       })))
    val videoTrack = el(0xAEL,
      uintEl(0xD7L, 1) ++ // TrackNumber
        uintEl(0x83L, 1) ++ strEl(0x86L, codec) ++
        el(0xE0L, uintEl(0xB0L, width.toLong) ++ uintEl(0xBAL, height.toLong)))
    val audioTrack = el(0xAEL,
      uintEl(0xD7L, 2) ++
        uintEl(0x83L, 2) ++
        strEl(0x86L, if (kind == "audio") codec else "A_OPUS") ++
        el(0xE1L, el(0xB5L, {
          val bb = java.nio.ByteBuffer.allocate(4)
          bb.putFloat(if (kind == "audio") sampleRate.toFloat else 48000f)
          bb.array()
        }) ++ uintEl(0x9FL, if (kind == "audio") channels.toLong else 2L)))
    val subTracks = (0 until subtitleTracks).toArray.flatMap { i =>
      val lang = if (i == 1) subLang2 else if (i == 0) subLang else None
      el(0xAEL, uintEl(0xD7L, 3L + i) ++ uintEl(0x83L, 0x11L) ++
        strEl(0x86L, "S_TEXT/UTF8") ++
        lang.map(strEl(0x22B59CL, _)).getOrElse(Array.emptyByteArray))
    }
    val imageSubTracks = imageSubs.zipWithIndex.toArray.flatMap {
      case ((cdc, lang, _), i) =>
        el(0xAEL, uintEl(0xD7L, 3L + subtitleTracks + i) ++
          uintEl(0x83L, 0x11L) ++ strEl(0x86L, cdc) ++
          strEl(0x22B59CL, lang))
    }
    val tracks = el(0x1654AE6BL,
      (if (kind == "video") videoTrack ++ audioTrack else audioTrack) ++
        subTracks ++ imageSubTracks)
    val cues =
      if (cuePoints <= 0) Array.emptyByteArray
      else el(0x1C53BB6BL, (0 until cuePoints).toArray.flatMap(i =>
        el(0xBBL, uintEl(0xB3L, i.toLong * 1000)))) // CueTime payload
    def simpleTag(name: String, value: String): Array[Byte] =
      el(0x67C8L, el(0x45A3L, name.getBytes("UTF-8")) ++
        el(0x4487L, value.getBytes("UTF-8")))
    val tagsEl = tags.map { case (t, a, al) =>
      el(0x1254C367L, el(0x7373L,
        simpleTag("TITLE", t) ++ simpleTag("ARTIST", a) ++
          simpleTag("ALBUM", al)))
    }.getOrElse(Array.emptyByteArray)
    // muxed text: one Cluster at timecode 0, a BlockGroup per cue on
    // the first subtitle track (number 3) — and the second (4) for
    // the multi-language fixtures — 1 ms ticks (default scale)
    def cueBlocks(track: Int, cs: Seq[(Long, Long, String)]): Array[Byte] =
      cs.toArray.flatMap { case (startMs, endMs, text) =>
        require(startMs >= 0 && startMs <= 32767 && endMs >= startMs,
          "fixture cue times fit the i16 relative timecode")
        val block = Array((0x80 | track).toByte, // 1-byte VINT
          ((startMs >> 8) & 0xff).toByte, (startMs & 0xff).toByte,
          0.toByte) ++ text.getBytes("UTF-8")
        el(0xA0L, el(0xA1L, block) ++ uintEl(0x9BL, endMs - startMs))
      }
    // PGS display sets as SimpleBlocks: a PCS with one composition
    // object at the interval start, a zero-object PCS at its end
    // (each followed by an END segment, the real stream shape)
    def pgsBlocks(track: Int, ivs: Seq[(Long, Long)],
        bmp: Option[(Int, Int, (Int, Int) => Int)]): Array[Byte] = {
      def seg(typ: Int, payload: Array[Byte]): Array[Byte] =
        Array(typ.toByte, ((payload.length >> 8) & 0xff).toByte,
          (payload.length & 0xff).toByte) ++ payload
      def pcs(nObjs: Int): Array[Byte] = {
        // width, height, frame_rate, comp_number, state (0x80 =
        // epoch start), palette_update, palette_id, n_objects
        val head = Array[Byte](0, 8, 0, 8, 0x10, 0, 1, 0x80.toByte, 0, 0,
          nObjs.toByte)
        val obj = Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)
        seg(0x16, head ++ Array.fill(nObjs)(obj).flatten)
      }
      // the bitmap half of a display set (real stream order:
      // PCS, WDS, PDS, ODS, END): one window, the identity-gray
      // palette over the indices the bitmap uses, object 0 RLE'd
      val bitmapSegs: Array[Byte] = bmp match {
        case None => Array.emptyByteArray
        case Some((w, h, f)) =>
          val wds = seg(0x17, Array[Byte](1, 0, 0, 0, 0, 0,
            ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
            ((h >> 8) & 0xff).toByte, (h & 0xff).toByte))
          val used = (for (y <- 0 until h; x <- 0 until w)
            yield f(x, y) & 0xff).toSet.filter(_ != 0)
          val pds = seg(0x14, Array[Byte](0, 0) ++ used.toSeq.sorted
            .flatMap(k => Seq(k.toByte, k.toByte, 128.toByte,
              128.toByte, 255.toByte)).toArray)
          val rle = new java.io.ByteArrayOutputStream()
          for (y <- 0 until h) {
            var x = 0
            while (x < w) {
              val c = f(x, y) & 0xff
              var run = 1
              while (x + run < w && (f(x + run, y) & 0xff) == c) run += 1
              if (c == 0) {
                if (run < 64) { rle.write(0); rle.write(run) }
                else { rle.write(0); rle.write(0x40 | (run >> 8))
                  rle.write(run & 0xff) }
              } else if (run <= 2) (0 until run).foreach(_ => rle.write(c))
              else if (run < 64) { rle.write(0); rle.write(0x80 | run)
                rle.write(c) }
              else { rle.write(0); rle.write(0xC0 | (run >> 8))
                rle.write(run & 0xff); rle.write(c) }
              x += run
            }
            rle.write(0); rle.write(0) // end of line
          }
          val rleBytes = rle.toByteArray
          val odsLen = rleBytes.length + 4
          val ods = seg(0x15, Array[Byte](0, 0, 0, 0xC0.toByte,
            ((odsLen >> 16) & 0xff).toByte, ((odsLen >> 8) & 0xff).toByte,
            (odsLen & 0xff).toByte,
            ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
            ((h >> 8) & 0xff).toByte, (h & 0xff).toByte) ++ rleBytes)
          wds ++ pds ++ ods
      }
      def sblock(tMs: Long, nObjs: Int): Array[Byte] = {
        require(tMs >= 0 && tMs <= 32767,
          "fixture PGS times fit the i16 relative timecode")
        el(0xA3L, Array((0x80 | track).toByte, ((tMs >> 8) & 0xff).toByte,
          (tMs & 0xff).toByte, 0.toByte) ++ pcs(nObjs) ++
          (if (nObjs > 0) bitmapSegs else Array.emptyByteArray) ++
          seg(0x80, Array.emptyByteArray))
      }
      // en > st writes open + clear; en <= st writes the open ONLY —
      // the display-left-open truncated-stream shape
      ivs.toArray.flatMap { case (st, en) =>
        if (en > st) sblock(st, 1) ++ sblock(en, 0) else sblock(st, 1)
      }
    }
    val imageBlocks = imageSubs.zipWithIndex.toArray.flatMap {
      case ((cdc, _, ivs), i) =>
        if (cdc == "S_HDMV/PGS")
          pgsBlocks(3 + subtitleTracks + i, ivs, pgsObjects.get(i))
        else Array.emptyByteArray
    }
    val cluster =
      if (subCues.isEmpty && subCues2.isEmpty && imageBlocks.isEmpty)
        Array.emptyByteArray
      else el(0x1F43B675L, uintEl(0xE7L, 0L) ++
        cueBlocks(3, subCues) ++ cueBlocks(4, subCues2) ++ imageBlocks)
    // MKA album-art convention: an Attachments/AttachedFile element
    val attachEl = attachedArt.map { case (m, data) =>
      el(0x1941A469L, el(0x61A7L,
        el(0x466EL, "cover".getBytes("UTF-8")) ++ // FileName
          el(0x4660L, m.getBytes("ISO-8859-1")) ++
          el(0x465CL, data) ++
          el(0x46AEL, Array[Byte](1)))) // FileUID
    }.getOrElse(Array.emptyByteArray)
    // Chapters/EditionEntry/ChapterAtom: ns times + ChapterDisplay
    val chaptersEl =
      if (chapters.isEmpty) Array.emptyByteArray
      else el(0x1043A770L, el(0x45B9L, chapters.toArray.flatMap {
        case (stMs, enMs, title) =>
          el(0xB6L, uintEl(0x91L, stMs * 1000000L) ++
            uintEl(0x92L, enMs * 1000000L) ++
            el(0x80L, el(0x85L, title.getBytes("UTF-8"))))
      }))
    ebml ++ el(0x18538067L, info ++ tracks ++ cues ++ tagsEl ++
      chaptersEl ++ attachEl ++ cluster)
  }

  /** WebP header facts — (width, height, channels, variant) from the
    * first payload chunk of a RIFF `WEBP` container, the dominant
    * crawled-image format the JDK cannot decode:
    *
    *  - `VP8 ` (lossy): keyframe sync code `9D 01 2A` at payload+3,
    *    then 14-bit little-endian width/height (RFC 6386 §9.1);
    *    channels 3 (YUV, no alpha in the base stream);
    *  - `VP8L` (lossless): `2F` signature, then an LSB-first
    *    bitstream of 14-bit width−1, 14-bit height−1, 1 alpha bit
    *    (the WebP lossless bitstream spec §3);
    *  - `VP8X` (extended): flags byte (bit 4 = alpha), then 24-bit
    *    little-endian canvas width−1 / height−1 (RFC 9649 §2.5.2).
    *
    * Header facts only — no pixel decode (a VP8 entropy decoder is a
    * codec, not a header walk) — which is exactly what card
    * classification and dimension gates need: a WebP asset reads as
    * an IMAGE with real dimensions instead of falling to
    * `pct_undecodable` and blinding the card to the format the crawl
    * mostly delivers. None for non-WebP bytes or a payload that fails
    * its own sync/signature check; callers degrade per-row. Pixel
    * operators (dHash near-dup, textiness) remain null for WebP —
    * the documented gap a VP8L decoder would close.
    */
  private[graft] def webpInfo(b: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (b == null || b.length < 21 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      !(b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return None
    @inline def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    @inline def le24(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
    val p = 20 // first chunk payload (fourcc at 12, size at 16)
    new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII) match {
      case "VP8 " =>
        if (b.length < p + 10 || (b(p + 3) & 0xff) != 0x9D ||
          (b(p + 4) & 0xff) != 0x01 || (b(p + 5) & 0xff) != 0x2A) None
        else Some((le16(p + 6) & 0x3fff, le16(p + 8) & 0x3fff, 3, "vp8"))
      case "VP8L" =>
        if (b.length < p + 5 || (b(p) & 0xff) != 0x2F) None
        else {
          val w = 1 + ((b(p + 1) & 0xff) | ((b(p + 2) & 0x3f) << 8))
          val h = 1 + (((b(p + 2) & 0xff) >> 6) | ((b(p + 3) & 0xff) << 2) |
            ((b(p + 4) & 0x0f) << 10))
          val alpha = ((b(p + 4) >> 4) & 1) == 1
          Some((w, h, if (alpha) 4 else 3, "vp8l"))
        }
      case "VP8X" =>
        if (b.length < p + 10) None
        else {
          val alpha = ((b(p) >> 4) & 1) == 1
          Some((1 + le24(p + 4), 1 + le24(p + 7), if (alpha) 4 else 3, "vp8x"))
        }
      case _ => None
    }
  }

  /** HEIF still-image header facts — the q44/q162 header-walk
    * discipline for the formats modern crawls deliver in volume: an
    * AVIF (`ftyp avif|avis`) or HEIC (`heic|heix|hevc|hevx`, the
    * iPhone default) or generic HEIF (`mif1|msf1`) is an ISO-BMFF
    * whose `meta/iprp/ipco` property container carries the image
    * spatial extents (`ispe`: width and height u32) and per-channel
    * bit depth (`pixi`: channel count). Header facts only — AV1/HEVC
    * intra decoders are out of pure-JDK scope like lossy VP8 (SURVEY
    * §3); the card must still classify these rows as images with
    * real dimensions instead of undecodable. Returns (width, height,
    * channels); channels defaults to 3 when `pixi` is absent. The
    * format family comes from [[heifBrand]].
    */
  private[graft] def avifInfo(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (heifBrand(b).isEmpty) return None
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    @inline def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    @inline def fourcc(o: Int): String = new String(b, o, 4, "ISO-8859-1")
    var w = -1L
    var h = -1L
    var channels = 3
    // depth-capped: a crafted file nesting thousands of 8-byte
    // container boxes must exhaust the CAP, not the task stack
    def walk(start: Long, end: Long, depth: Int = 0): Unit = {
      if (depth > 16) return
      var off = start
      while (off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = fourcc(off.toInt + 4)
        var body = off + 8
        // size==1: ISO-BMFF 64-bit largesize at off+8 (mp4VideoTrack's rule)
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) return
        id match {
          case "meta" => walk(body + 4, boxEnd, depth + 1) // FULL box: skip ver/flags
          case "iprp" | "ipco" => walk(body, boxEnd, depth + 1)
          case "ispe" if body + 12 <= boxEnd =>
            w = u32(body.toInt + 4) // after the fullbox ver/flags
            h = u32(body.toInt + 8)
          case "pixi" if body + 5 <= boxEnd =>
            channels = b(body.toInt + 4) & 0xff
          case _ => ()
        }
        off = boxEnd
      }
    }
    walk(0L, b.length.toLong)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some((w.toInt, h.toInt, channels))
  }

  /** Animated-GIF structural facts — (frames, durationMs, loops):
    * frame count from the image descriptors, duration from the
    * Graphic Control Extension delays (centiseconds → ms), loop
    * count from the NETSCAPE2.0 application extension (0 = infinite;
    * null when absent — single-play). The walk is STRUCTURAL (block
    * lengths only, no LZW decode), so it is O(bytes) with zero
    * allocation — the card-scan discipline. A GIF is still an IMAGE
    * (decodePixels yields its first frame); this kernel is what
    * tells a 500-frame meme apart from a photo. Truncated files
    * report their intact frame prefix. None for non-GIF bytes.
    */
  final case class GifAnim(frames: Int, durationMs: Long, loops: Integer)

  private[graft] def gifAnimationInfo(b: Array[Byte]): Option[GifAnim] = try {
    if (b == null || b.length < 14 ||
      !(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')) return None
    @inline def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    var i = 6
    val packed = b(i + 4) & 0xff
    i += 7 // logical screen descriptor
    if ((packed & 0x80) != 0) i += 3 << ((packed & 7) + 1) // global table
    var frames = 0
    var durationCs = 0L
    var loops: Integer = null
    def skipSubBlocks(): Boolean = { // false on truncation
      while (i < b.length && b(i) != 0) i += 1 + (b(i) & 0xff)
      if (i >= b.length) false else { i += 1; true }
    }
    var done = false
    while (!done && i < b.length) {
      (b(i) & 0xff) match {
        case 0x2C => // image descriptor
          if (i + 10 > b.length) done = true
          else {
            val p = b(i + 9) & 0xff
            i += 10
            if ((p & 0x80) != 0) i += 3 << ((p & 7) + 1) // local table
            i += 1 // LZW minimum code size
            if (skipSubBlocks()) frames += 1 else done = true
          }
        case 0x21 => // extension block
          if (i + 2 > b.length) done = true
          else {
            val label = b(i + 1) & 0xff
            i += 2
            if (label == 0xF9 && i + 5 <= b.length && (b(i) & 0xff) == 4)
              durationCs += u16(i + 2)
            if (label == 0xFF && i + 16 <= b.length && (b(i) & 0xff) == 11 &&
              new String(b, i + 1, 11, "ISO-8859-1") == "NETSCAPE2.0" &&
              (b(i + 12) & 0xff) == 3 && b(i + 13) == 1)
              loops = Integer.valueOf(u16(i + 14))
            if (!skipSubBlocks()) done = true
          }
        case 0x3B => done = true // trailer
        case _ => done = true // unknown block: structure lost, stop clean
      }
    }
    if (frames == 0) None else Some(GifAnim(frames, durationCs * 10L, loops))
  } catch { case _: Throwable => None }

  /** Minimal VALID animated GIF — n 1×1 frames around the canonical
    * smallest LZW payload (`02 02 44 01 00` = clear, pixel 0, EOI),
    * per-frame GCE delays in centiseconds, optional NETSCAPE2.0 loop
    * extension. ImageIO decodes the first frame, so the image stack
    * still works on the fixture.
    */
  private[graft] def syntheticGif(delaysCs: Seq[Int],
      loops: Option[Int] = None): Array[Byte] = {
    require(delaysCs.nonEmpty, "at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ISO-8859-1"))
    out.write(Array[Byte](1, 0, 1, 0, 0x80.toByte, 0, 0)) // 1x1, GCT(2)
    out.write(Array[Byte](0, 0, 0, -1, -1, -1)) // black, white
    loops.foreach { n =>
      out.write(Array[Byte](0x21, 0xFF.toByte, 11))
      out.write("NETSCAPE2.0".getBytes("ISO-8859-1"))
      out.write(Array[Byte](3, 1, (n & 0xff).toByte, ((n >> 8) & 0xff).toByte, 0))
    }
    delaysCs.foreach { d =>
      out.write(Array[Byte](0x21, 0xF9.toByte, 4, 0,
        (d & 0xff).toByte, ((d >> 8) & 0xff).toByte, 0, 0))
      out.write(Array[Byte](0x2C, 0, 0, 0, 0, 1, 0, 1, 0, 0)) // descriptor
      out.write(Array[Byte](2, 2, 0x44, 1, 0)) // canonical LZW payload
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** JPEG XL image dimensions — the SizeHeader of a naked codestream
    * (`FF 0A`, ISO/IEC 18181-1: LSB-first bits, shared div8 flag,
    * 9/13/18/30-bit size selector, the 7-entry aspect-ratio table)
    * or the same codestream inside the ISO-BMFF container's `jxlc`
    * box (18181-2). Header facts only — a modular/VarDCT decoder is
    * far out of pure-JDK scope — but the card must classify the
    * newest crawled-image format as an image with real dimensions.
    */
  private[graft] def jxlInfo(b: Array[Byte]): Option[(Int, Int)] = try {
    if (b == null || b.length < 4) return None
    if (b(0) == 0xFF.toByte && b(1) == 0x0A)
      return jxlCodestreamDims(b, 0, b.length)
    // container: the 12-byte JXL signature box, then BMFF boxes
    if (b.length >= 20 && b(0) == 0 && b(1) == 0 && b(2) == 0 &&
      b(3) == 0x0C && b(4) == 'J' && b(5) == 'X' && b(6) == 'L' &&
      b(7) == ' ' && (b(8) & 0xff) == 0x0D && (b(9) & 0xff) == 0x0A &&
      (b(10) & 0xff) == 0x87 && (b(11) & 0xff) == 0x0A) {
      @inline def u32(o: Int): Long =
        ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
          ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      var i = 12
      while (i + 8 <= b.length) {
        val size = u32(i)
        val id = new String(b, i + 4, 4, "ISO-8859-1")
        val boxEnd = if (size == 0) b.length.toLong else i + size
        if (boxEnd < i + 8 || boxEnd > b.length) return None
        if (id == "jxlc") return jxlCodestreamDims(b, i + 8, boxEnd.toInt)
        i = boxEnd.toInt
      }
      return None
    }
    None
  } catch { case _: Throwable => None }

  private def jxlCodestreamDims(b: Array[Byte], off: Int,
      end: Int): Option[(Int, Int)] = {
    if (off + 2 > end || b(off) != 0xFF.toByte || b(off + 1) != 0x0A)
      return None
    var pos = 0 // bit cursor after the signature, LSB-first
    var ok = true
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val at = off + 2 + (pos >> 3)
        if (at >= end) { ok = false; return 0 }
        v |= ((b(at) >> (pos & 7)) & 1) << i
        pos += 1
        i += 1
      }
      v
    }
    val selBits = Array(9, 13, 18, 30)
    def coded(div8: Boolean): Int =
      if (div8) (u(5) + 1) * 8
      else u(selBits(u(2))) + 1
    val div8 = u(1) == 1
    val ysize = coded(div8)
    val ratio = u(3)
    // the spec's aspect table: xsize = ysize * num / den
    val ratios = Array((0, 0), (1, 1), (12, 10), (4, 3), (3, 2),
      (16, 9), (5, 4), (2, 1))
    val xsize =
      if (ratio == 0) coded(div8)
      else {
        val (num, den) = ratios(ratio)
        (ysize.toLong * num / den).toInt
      }
    if (!ok || xsize <= 0 || ysize <= 0 || xsize > (1 << 30) ||
      ysize > (1 << 30)) None
    else Some((xsize, ysize))
  }

  /** Minimal JPEG XL header bytes from the given dims — the
    * SizeHeader only (enough for [[jxlInfo]]; nothing downstream
    * decodes JXL pixels). `div8`/`ratio` pick the coding paths;
    * `container = true` wraps the codestream in the 18181-2 BMFF
    * layout (signature + ftyp + jxlc).
    */
  private[graft] def syntheticJxl(w: Int, h: Int, div8: Boolean = false,
      ratio: Int = 0, container: Boolean = false,
      gps: Boolean = false): Array[Byte] = {
    require(!gps || container, "only the container form carries EXIF")
    val bits = new java.util.BitSet()
    var n = 0
    def put(value: Int, nbits: Int): Unit = {
      var i = 0
      while (i < nbits) {
        if (((value >> i) & 1) == 1) bits.set(n)
        n += 1
        i += 1
      }
    }
    def putCoded(v: Int): Unit =
      if (div8) { require(v % 8 == 0 && v <= 256); put(v / 8 - 1, 5) }
      else { put(3, 2); put(v - 1, 30) } // 30-bit selector
    put(if (div8) 1 else 0, 1)
    putCoded(h)
    put(ratio, 3)
    if (ratio == 0) putCoded(w)
    val nBytes = (n + 7) / 8
    val body = new Array[Byte](2 + nBytes)
    body(0) = 0xFF.toByte
    body(1) = 0x0A
    var i = 0
    while (i < n) {
      if (bits.get(i)) body(2 + (i >> 3)) = (body(2 + (i >> 3)) |
        (1 << (i & 7))).toByte
      i += 1
    }
    if (!container) body
    else {
      def box(id: String, payload: Array[Byte]): Array[Byte] = {
        val out = java.nio.ByteBuffer.allocate(8 + payload.length)
        out.putInt(8 + payload.length).put(id.getBytes("ISO-8859-1"))
          .put(payload)
        out.array()
      }
      val exif =
        if (!gps) Array.emptyByteArray
        else {
          // raw Exif box: u32 tiff offset + a minimal LE TIFF whose
          // IFD0 carries the GPS pointer (the HEIF ExifDataBlock shape)
          val tiff = java.nio.ByteBuffer.allocate(8 + 2 + 12 + 4 + 6)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
          tiff.putShort(1)
          tiff.putShort(0x8825.toShort).putShort(4).putInt(1)
            .putInt(8 + 2 + 12 + 4)
          tiff.putInt(0)
          tiff.putShort(0).putInt(0)
          box("Exif", Array[Byte](0, 0, 0, 0) ++ tiff.array())
        }
      Array[Byte](0, 0, 0, 0x0C, 'J', 'X', 'L', ' ',
        0x0D, 0x0A, 0x87.toByte, 0x0A) ++
        box("ftyp", "jxl ".getBytes("ISO-8859-1") ++ new Array[Byte](4) ++
          "jxl ".getBytes("ISO-8859-1")) ++
        exif ++ box("jxlc", body)
    }
  }

  /** HEIF still-image brand families — every ftyp brand that marks
    * an ISO-BMFF file as a STILL IMAGE rather than a movie: the
    * AV1-coded `avif`/`avis`, the HEVC-coded `heic`/`heix`/`hevc`/
    * `hevx` (the iPhone default), and the generic MIAF/HEIF bases
    * `mif1`/`msf1`. Maps brand → reported format name.
    */
  private val HeifImageBrands: Map[String, String] = Map(
    "avif" -> "avif", "avis" -> "avif",
    "heic" -> "heic", "heix" -> "heic",
    "hevc" -> "heic", "hevx" -> "heic",
    "mif1" -> "heif", "msf1" -> "heif")

  /** The format family of a HEIF still image (`avif` / `heic` /
    * `heif`), or None for non-BMFF bytes and movies. Major brand
    * wins; compatible brands are scanned in declaration order —
    * specific codecs beat the generic `mif1`/`heif` bases when both
    * appear (the common `ftyp mif1 [.., avif]` layout).
    */
  private[graft] def heifBrand(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 16 ||
      !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    @inline def fourcc(o: Int): String = new String(b, o, 4, "ISO-8859-1")
    val ftypEnd = math.min(u32(0), b.length.toLong).toInt
    val brands = fourcc(8) +:
      (16 until (ftypEnd - 3) by 4).map(fourcc)
    val hits = brands.flatMap(HeifImageBrands.get)
    // a specific codec family beats the generic heif base
    hits.find(_ != "heif").orElse(hits.headOption)
  }

  /** ISO-BMFF with any HEIF still-image brand? */
  private[graft] def isHeifMagic(b: Array[Byte]): Boolean =
    heifBrand(b).isDefined

  /** Resolve an AVIF's EXIF item payload byte range through the HEIF
    * item indirection — the piece that makes the GPS PII flag work
    * for the fastest-growing crawled image format: `meta/iinf/infe`
    * names an item of type `Exif`, `meta/iloc` maps that item id to
    * file extents (offset/length/base-offset sizes 0/4/8 per spec,
    * iloc versions 0-2, construction methods 0 = absolute file
    * offset and 1 = relative to the `meta/idat` box payload — the
    * iOS/encoder layout). Returns the FIRST extent packed as
    * (start << 32 | end) in ABSOLUTE file offsets, -1 when the file
    * declares no EXIF item at all, or -2 when an EXIF item IS
    * declared but cannot be resolved (construction method 2, a
    * method-1 extent without/past its `idat`, an out-of-range
    * mapping, a truncated table). The -1/-2 split matters because
    * this feeds a PRIVACY flag: "no item" is honestly location-free
    * (false), "item we could not read" must surface as unknown
    * (null), never false — a release gate has to fail closed. The
    * payload then leads with the HEIF ExifDataBlock's u32
    * `exif_tiff_header_offset` ([[exifGpsPresent]] consumes it).
    * Depth-capped and exception-guarded like its sibling walkers.
    */
  private[graft] def avifExifRegion(b: Array[Byte]): Long = {
    var exifId = -1L
    try {
    if (b == null || b.length < 16 ||
      !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return -1L
    @inline def u16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    @inline def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    var ilocBody = -1
    var ilocEnd = -1
    var idatBody = -1
    var idatEnd = -1
    def walk(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 16) return
      var off = start
      while (off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = new String(b, off.toInt + 4, 4, "ISO-8859-1")
        var body = off + 8
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) return
        val p = body.toInt
        id match {
          case "meta" => walk(body + 4, boxEnd, depth + 1) // FULL box
          case "iinf" if p + 4 <= boxEnd =>
            // fullbox; entry count u16 (v0) / u32 (v1+), then infe children
            val ver = b(p) & 0xff
            val kids = if (ver == 0) p + 6 else p + 8
            if (kids <= boxEnd) walk(kids, boxEnd, depth + 1)
          case "infe" if p + 4 <= boxEnd =>
            val ver = b(p) & 0xff
            // v2: u16 id at +4, u16 protection, 4cc type at +8;
            // v3+: u32 id at +4, u16 protection, 4cc type at +10
            if (ver == 2 && p + 12 <= boxEnd &&
              new String(b, p + 8, 4, "ISO-8859-1") == "Exif")
              exifId = u16(p + 4).toLong
            else if (ver >= 3 && p + 14 <= boxEnd &&
              new String(b, p + 10, 4, "ISO-8859-1") == "Exif")
              exifId = u32(p + 4)
          case "iloc" => ilocBody = p; ilocEnd = boxEnd.toInt
          case "idat" => idatBody = p; idatEnd = boxEnd.toInt
          case _ => ()
        }
        off = boxEnd
      }
    }
    walk(0L, b.length.toLong, 0)
    if (exifId < 0) return -1L
    if (ilocBody < 0) return -2L // declared item with no location table
    // parse iloc for the Exif item's first extent; from here on every
    // failure is "item exists but unreadable" → -2, never -1
    var q = ilocBody
    if (q + 8 > ilocEnd) return -2L
    val ver = b(q) & 0xff
    q += 4
    val offSize = (b(q) >> 4) & 0xf
    val lenSize = b(q) & 0xf
    val baseSize = (b(q + 1) >> 4) & 0xf
    val idxSize = if (ver == 1 || ver == 2) b(q + 1) & 0xf else 0
    q += 2
    if (offSize > 8 || lenSize > 8 || baseSize > 8 || idxSize > 8) return -2L
    val count =
      if (ver < 2) { val c = u16(q); q += 2; c }
      else { val c = u32(q); q += 4; if (c > 0xffff) return -2L else c.toInt }
    // a HEIF still holds a handful of items; a crafted count must be
    // bounded CPU, not billions of cheap loop iterations
    if (count > 4096) return -2L
    def readN(o: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    var i = 0
    while (i < count) {
      if (q + (if (ver < 2) 2 else 4) > ilocEnd) return -2L
      val itemId = if (ver < 2) { val v = u16(q); q += 2; v.toLong }
        else { val v = u32(q); q += 4; v }
      var method = 0
      if (ver == 1 || ver == 2) {
        if (q + 2 > ilocEnd) return -2L
        method = u16(q) & 0xf; q += 2
      }
      if (q + 2 + baseSize + 2 > ilocEnd) return -2L
      q += 2 // data_reference_index
      val base = readN(q, baseSize); q += baseSize
      val extents = u16(q); q += 2
      if (extents > 4096) return -2L // same bounded-CPU rule per item
      var e = 0
      while (e < extents) {
        if (q + idxSize + offSize + lenSize > ilocEnd) return -2L
        q += idxSize
        val eo = readN(q, offSize); q += offSize
        val el = readN(q, lenSize); q += lenSize
        if (itemId == exifId && e == 0) {
          if (method == 0) {
            val s = base + eo
            if (s >= 0 && el > 0 && s + el <= b.length)
              return (s << 32) | (s + el)
          } else if (method == 1 && idatBody >= 0) {
            // idat-relative: extents address the meta/idat payload
            val s = idatBody + base + eo
            if (s >= idatBody && el > 0 && s + el <= idatEnd)
              return (s << 32) | (s + el)
          }
          // method 2 (item_offset indirection), a method-1 extent
          // without/past its idat, or an out-of-range mapping
          return -2L
        }
        e += 1
      }
      i += 1
    }
    -2L // declared item never appeared in the location table
    } catch { case _: Throwable => if (exifId >= 0) -2L else -1L }
  }

  /** Minimal AVIF header fixture ([[syntheticWebp]] discipline):
    * `ftyp(avif)` + `meta(hdlr pict, iprp(ipco(ispe, pixi)))` — every
    * value [[avifInfo]] reports is a closed form of the arguments.
    * `gps = true` adds the full HEIF EXIF indirection: an `iinf/infe`
    * Exif item, an `iloc` (v0, 4-byte offsets/lengths) mapping it to
    * an `mdat` extent holding an ExifDataBlock (u32 tiff offset 0 +
    * a bare little-endian TIFF whose IFD0 carries tag 0x8825).
    * `idatExif = true` switches the layout to iloc v1 construction
    * method 1 with the ExifDataBlock inside `meta/idat` — the
    * idat-relative shape some iOS/encoder pipelines emit.
    */
  private[graft] def syntheticAvif(w: Int, h: Int,
      channels: Int = 3, gps: Boolean = false,
      brand: String = "avif", idatExif: Boolean = false): Array[Byte] = {
    require(brand.length == 4, s"brand must be a FourCC: $brand")
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(id.getBytes("ISO-8859-1")).put(payload)
      out.array()
    }
    val ftyp = box("ftyp", brand.getBytes("ISO-8859-1") ++
      new Array[Byte](4) ++ "mif1".getBytes("ISO-8859-1"))
    val ispe = box("ispe", java.nio.ByteBuffer.allocate(12)
      .putInt(0).putInt(w).putInt(h).array())
    val pixi = box("pixi", Array[Byte](0, 0, 0, 0, channels.toByte) ++
      Array.fill[Byte](channels)(8))
    val hdlr = box("hdlr", new Array[Byte](8) ++
      "pict".getBytes("ISO-8859-1") ++ new Array[Byte](12))
    val baseMeta = new Array[Byte](4) ++ hdlr ++
      box("iprp", box("ipco", ispe ++ pixi))
    if (!gps) return ftyp ++ box("meta", baseMeta)
    // ExifDataBlock: u32 exif_tiff_header_offset (0) + minimal TIFF
    // (IFD0 with the GPS Info IFD pointer and an empty GPS IFD)
    val tiff = java.nio.ByteBuffer.allocate(8 + 2 + 12 + 4 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    tiff.putShort(1) // one IFD0 entry
    tiff.putShort(0x8825.toShort).putShort(4).putInt(1).putInt(8 + 2 + 12 + 4)
    tiff.putInt(0) // next-IFD pointer
    tiff.putShort(0).putInt(0) // empty GPS IFD
    val exifPayload = Array[Byte](0, 0, 0, 0) ++ tiff.array()
    val infe = box("infe", java.nio.ByteBuffer.allocate(4 + 2 + 2 + 4 + 5)
      .putInt(2 << 24) // fullbox version 2
      .putShort(1).putShort(0) // item_ID 1, protection 0
      .put("Exif".getBytes("ISO-8859-1"))
      .put("Exif".getBytes("ISO-8859-1")).put(0.toByte) // item_name
      .array())
    val iinf = box("iinf",
      Array[Byte](0, 0, 0, 0, 0, 1) ++ infe) // v0, u16 count = 1
    if (idatExif) {
      // iloc v1, construction method 1: the extent offset addresses
      // the meta/idat payload, not the file
      val iloc = box("iloc", java.nio.ByteBuffer.allocate(4 + 2 + 2 + 8 + 8)
        .putInt(1 << 24) // fullbox v1
        .put(0x44.toByte).put(0.toByte) // offset/length size 4, base 0
        .putShort(1) // item count
        .putShort(1) // item_ID 1
        .putShort(1) // construction_method 1 (idat)
        .putShort(0) // data_reference_index 0
        .putShort(1) // extent count
        .putInt(0).putInt(exifPayload.length) // idat-relative extent
        .array())
      return ftyp ++ box("meta",
        baseMeta ++ iinf ++ iloc ++ box("idat", exifPayload))
    }
    def metaWith(exifOffset: Int): Array[Byte] = {
      val iloc = box("iloc", java.nio.ByteBuffer.allocate(4 + 2 + 2 + 6 + 8)
        .putInt(0) // fullbox v0
        .put(0x44.toByte).put(0.toByte) // offset/length size 4, base 0
        .putShort(1) // item count
        .putShort(1).putShort(0) // item_ID 1, data_reference_index 0
        .putShort(1) // extent count
        .putInt(exifOffset).putInt(exifPayload.length)
        .array())
      box("meta", baseMeta ++ iinf ++ iloc)
    }
    // the extent offset is absolute: sized by a first pass, then real
    val metaLen = metaWith(0).length
    val exifOffset = ftyp.length + metaLen + 8 // into mdat's body
    ftyp ++ metaWith(exifOffset) ++ box("mdat", exifPayload)
  }

  /** A REAL lossless WebP from a per-pixel two-tone choice — the
    * in-query encoder for exact-oracle gates over the [[Vp8l]] decode
    * path (the [[renderPng]] discipline, VP8L edition): each channel
    * has at most two values, so every prefix code is the spec's
    * SIMPLE form (one or two 8-bit symbols; two-symbol codes cost one
    * bit per pixel, one-symbol codes cost zero) and the stream needs
    * no transform, cache or LZ77 — decoded pixels are exactly
    * `if (pick(x, y)) argbB else argbA`. Cross-validated against the
    * python-encoded fixtures through the same decoder (Vp8lSpec).
    */
  private[graft] def syntheticVp8lTwoTone(w: Int, h: Int,
      pick: (Int, Int) => Boolean, argbA: Int, argbB: Int): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384, s"dims ${w}x$h")
    val bits = new java.util.BitSet()
    var n = 0
    def put(value: Int, nbits: Int): Unit = {
      var i = 0
      while (i < nbits) { if (((value >> i) & 1) == 1) bits.set(n); n += 1; i += 1 }
    }
    put(0x2f, 8)
    put(w - 1, 14)
    put(h - 1, 14)
    val alphaUsed = (argbA >>> 24) != 0xff || (argbB >>> 24) != 0xff
    put(if (alphaUsed) 1 else 0, 1)
    put(0, 3) // version
    put(0, 1) // no transforms
    put(0, 1) // no color cache
    put(0, 1) // no meta prefix partition
    // channel codes in stream order G, R, B, A + a dummy distance code
    val chans = Array(
      ((argbA >>> 8) & 0xff, (argbB >>> 8) & 0xff),
      ((argbA >>> 16) & 0xff, (argbB >>> 16) & 0xff),
      (argbA & 0xff, argbB & 0xff),
      ((argbA >>> 24) & 0xff, (argbB >>> 24) & 0xff),
      (0, 0))
    // per channel: (code bit for A's value, code bit for B's, 2-symbol?)
    val twoSym = chans.map { case (va, vb) =>
      put(1, 1) // simple code
      if (va == vb) {
        put(0, 1); put(1, 1); put(va, 8) // one 8-bit symbol, zero-bit code
        false
      } else {
        put(1, 1); put(1, 1) // two symbols, 8-bit first
        put(math.min(va, vb), 8)
        put(math.max(va, vb), 8)
        true // canonical: smaller symbol = code 0
      }
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val b = pick(x, y)
        var c = 0
        while (c < 4) {
          if (twoSym(c)) {
            val (va, vb) = chans(c)
            val v = if (b) vb else va
            put(if (v == math.max(va, vb)) 1 else 0, 1)
          }
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val payload = java.util.Arrays.copyOf(bits.toByteArray, (n + 7) / 8)
    val chunk = java.nio.ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("VP8L".getBytes("ISO-8859-1")).putInt(payload.length).put(payload)
    val body = "WEBP".getBytes("ISO-8859-1") ++ chunk.array()
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ISO-8859-1")).putInt(body.length).put(body)
    out.array()
  }

  /** Minimal header-facts WebP fixtures ([[syntheticPng]] discipline):
    * RIFF `WEBP` around one `VP8 `/`VP8L`/`VP8X` chunk whose header
    * fields encode the given facts — every value [[webpInfo]] reports
    * is a closed form of the arguments. `extraChunks` appends raw
    * (fourcc, payload) chunks after the image chunk (EXIF tests).
    */
  private[graft] def syntheticWebp(variant: String, w: Int, h: Int,
      alpha: Boolean = false,
      extraChunks: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc.getBytes("ISO-8859-1")).putInt(payload.length).put(payload)
      bb.array()
    }
    val img = variant match {
      case "vp8" =>
        require(!alpha, "the base VP8 stream carries no alpha")
        val bb = java.nio.ByteBuffer.allocate(10)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(new Array[Byte](3)) // frame tag: keyframe, version 0
        bb.put(0x9D.toByte).put(0x01.toByte).put(0x2A.toByte)
        bb.putShort((w & 0x3fff).toShort).putShort((h & 0x3fff).toShort)
        chunk("VP8 ", bb.array())
      case "vp8l" =>
        val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
          ((if (alpha) 1L else 0L) << 28)
        val payload = Array.tabulate[Byte](5)(i =>
          if (i == 0) 0x2F.toByte else ((bits >> (8 * (i - 1))) & 0xff).toByte)
        chunk("VP8L", payload)
      case "vp8x" =>
        val p = new Array[Byte](10)
        if (alpha) p(0) = 0x10.toByte
        def le24(v: Int, o: Int): Unit = {
          p(o) = (v & 0xff).toByte
          p(o + 1) = ((v >> 8) & 0xff).toByte
          p(o + 2) = ((v >> 16) & 0xff).toByte
        }
        le24(w - 1, 4); le24(h - 1, 7)
        chunk("VP8X", p)
      case other => throw new IllegalArgumentException(s"variant: $other")
    }
    val body = img ++ extraChunks.flatMap { case (f, pl) => chunk(f, pl) }
    val out = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ISO-8859-1")).putInt(4 + body.length)
      .put("WEBP".getBytes("ISO-8859-1")).put(body)
    out.array()
  }

  /** Minimal valid-for-header-parsing PNG/JPEG bytes with known
    * dimensions — deterministic fixtures for oracle-checked decode
    * tests (q44) and specs.
    */
  private[graft] def syntheticPng(w: Int, h: Int, colorType: Int = 2): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13 + 4)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes)
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC not validated by the header parse
    out.array()
  }

  private[graft] def syntheticJpeg(w: Int, h: Int, channels: Int = 3): Array[Byte] = {
    val segLen = 8 + 3 * channels
    val out = java.nio.ByteBuffer.allocate(2 + 2 + segLen + 2)
    out.put(0xFF.toByte).put(0xD8.toByte) // SOI
    out.put(0xFF.toByte).put(0xC0.toByte) // SOF0
    out.putShort(segLen.toShort).put(8.toByte)
    out.putShort(h.toShort).putShort(w.toShort).put(channels.toByte)
    (0 until channels).foreach { c =>
      out.put((c + 1).toByte).put(0x11.toByte).put(0.toByte)
    }
    out.put(0xFF.toByte).put(0xD9.toByte) // EOI
    out.array()
  }

  /** PCM WAV header + silent payload sized for `millis` of audio. */
  private[graft] def syntheticWav(sampleRate: Int, channels: Int,
      millis: Int, bitsPerSample: Int = 16): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val dataSize = (byteRate.toLong * millis / 1000L).toInt
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort) // PCM
      .putInt(sampleRate).putInt(byteRate)
      .putShort((channels * bitsPerSample / 8).toShort).putShort(bitsPerSample.toShort)
    out.put("data".getBytes).putInt(dataSize)
    out.array()
  }

  /** PCM WAV with EXPLICIT sample payload (flat, channel-interleaved)
    * — the audio twin of [[renderPng]]: real decodable bytes whose
    * stats are closed forms of the sample function, for specs and
    * gate queries.
    */
  private[graft] def renderWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val byteRate = sampleRate * channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort) // PCM
      .putInt(sampleRate).putInt(byteRate)
      .putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes).putInt(dataSize)
    var i = 0
    // while, not foreach: Function1 isn't specialized on Short, so a
    // foreach would box every sample of every rendered corpus row
    while (i < samples.length) { out.putShort(samples(i)); i += 1 }
    out.array()
  }

  /** Minimal ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0)). */
  private[graft] def syntheticMp4(w: Int, h: Int, durationMs: Long,
      timescale: Int = 1000): Array[Byte] = {
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(id.getBytes).put(payload)
      out.array()
    }
    val mvhd = {
      val p = java.nio.ByteBuffer.allocate(100)
      p.putInt(0) // version 0 + flags
      p.putInt(0).putInt(0) // creation, modification
      p.putInt(timescale).putInt((durationMs * timescale / 1000L).toInt)
      p.array() // rate/volume/matrix/next-track left zero
    }
    val tkhd = {
      val p = java.nio.ByteBuffer.allocate(84)
      p.putInt(0) // version 0 + flags
      p.putInt(0).putInt(0).putInt(1).putInt(0) // times, track 1, reserved
      p.putInt((durationMs * timescale / 1000L).toInt) // now at offset 24
      p.position(24 + 16 + 36) // reserved(8)+layer/alt/vol/res(8)+matrix(36)
      p.putInt(w << 16).putInt(h << 16) // 16.16 fixed at offset 76
      p.array()
    }
    val ftyp = box("ftyp", "isom\u0000\u0000\u0002\u0000isomiso2".getBytes("ISO-8859-1"))
    val moov = box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    ftyp ++ moov
  }

  // ----------------------------------------------------------- pixels

  /** Full raster decode for PNG/JPEG via pure-JDK ImageIO — the REAL
    * pixel path (no stub): returns None for non-image formats, for
    * header-only synthetics with no pixel data, and for corrupt
    * rasters, so callers fall back per-row instead of failing the
    * scan.
    */
  private[graft] def decodePixels(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.length < 8) return None
    val isPng = bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
    val isJpeg = bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte
    // GIF and BMP are pure-JDK ImageIO formats too (GIF decodes its
    // FIRST frame) — crawled image corpora are full of both, and
    // magic-gating them as "undecodable" starved every pixel operator
    val isGif = bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8'
    val isBmp = bytes(0) == 'B' && bytes(1) == 'M'
    // the JDK has shipped a TIFF plugin since 9 — same pure-JDK story
    val isTiff = isTiffMagic(bytes)
    // WebP: the JDK has no plugin, but LOSSLESS payloads are integer
    // entropy coding + transforms — [[Vp8l]] decodes them exactly, so
    // the whole pixel stack works on the lossless subset; lossy VP8
    // stays header-facts-only (callers fall through to [[webpInfo]])
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P')
      return Vp8l.decode(bytes).map { case (w, h, alpha, argb) =>
        val img = new java.awt.image.BufferedImage(w, h,
          if (alpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
          else java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, w, h, argb, 0, w)
        img
      }
    // ICO: decode the largest entry's embedded PNG (one bounded hop —
    // the payload is magic-checked PNG, so this cannot re-enter here)
    if (bytes(0) == 0 && bytes(1) == 0 && bytes(2) == 1 && bytes(3) == 0)
      return icoPngPayload(bytes).flatMap(decodePixels)
    if (!isPng && !isJpeg && !isGif && !isBmp && !isTiff) return None
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      .map(img =>
        if (isJpeg) applyExifOrientation(img, exifOrientation(bytes)) else img)
    catch { case _: Throwable => None }
  }

  /** EXIF orientation (TIFF tag 0x0112) from the JPEG's APP1 segment —
    * 1 ("normal") when absent or unparseable. ImageIO returns the
    * STORED raster; a rotated camera JPEG carries the display
    * transform only here, so width/height (and any pixel stat that
    * isn't rotation-invariant) are wrong without it. Segment walk as
    * in [[decodeJpeg]]; inside APP1, a minimal TIFF IFD scan in the
    * declared byte order (`II`/`MM`). (Reference behavior: its vision
    * provider auto-orients server-side, `vision_tool.py:372-428`.)
    */
  private[graft] def exifOrientation(b: Array[Byte]): Int = {
    val r = exifApp1Region(b)
    if (r < 0) 1
    else tiffOrientation(b, (r >>> 32).toInt, (r & 0xffffffffL).toInt)
  }

  /** Locate the EXIF TIFF region inside a JPEG's APP1 segment:
    * packed (start << 32 | end), or -1 when absent. Shared by the
    * orientation read and the GPS PII flag.
    */
  private def exifApp1Region(b: Array[Byte]): Long = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xFF) return -1L
      val mk = b(i + 1) & 0xff
      if (mk == 0xFF) i += 1
      else if (mk == 0x01 || (mk >= 0xD0 && mk <= 0xD9)) i += 2
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || mk == 0xDA) return -1L // SOS: entropy-coded data follows
        if (mk == 0xE1 && i + 10 <= b.length &&
            b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
            b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
          return ((i + 10).toLong << 32) | math.min(b.length, i + 2 + len).toLong
        i += 2 + len
      }
    }
    -1L
  }

  /** EXIF GPS flag — true when the JPEG's IFD0 carries the GPS Info
    * IFD pointer (TIFF tag 0x8825): the standard "this photo embeds a
    * capture location" PII signal an image-corpus release gate needs
    * (the pixel-side sibling of the text PII scrubbers in
    * [[Curation]]). Detection only — the SCRUB path already exists:
    * [[resizeImages]] re-encodes to PNG, which carries no EXIF at
    * all. Covers every format that CAN embed EXIF: JPEG (APP1
    * segment), WebP (the RIFF `EXIF` chunk an extended VP8X file
    * may carry — same TIFF block, optional `Exif\0\0` prefix
    * tolerated), TIFF (its own IFD0), AVIF (EXIF behind the HEIF
    * `iinf`/`iloc` item indirection, [[avifExifRegion]]), and PNG
    * (the `eXIf` chunk of the 2017 PNG extension — a raw TIFF block;
    * pre-extension PNGs simply have no such chunk and report false).
    * Null for other bytes (GIF/BMP cannot carry EXIF GPS — callers
    * may treat null-with-decodable as false); false for a carrier
    * without the tag. Public for the generated-code static call.
    */
  def exifGpsPresent(bytes: Array[Byte]): java.lang.Boolean = {
    if (bytes == null || bytes.length < 12) return null
    exifTiffRegion(bytes) match {
      case -2L => null // cannot carry EXIF, or declared-but-unreadable
      case -1L => java.lang.Boolean.FALSE // carrier without the block
      case r => java.lang.Boolean.valueOf(
        tiffHasTag(bytes, (r >>> 32).toInt, (r & 0xffffffffL).toInt, 0x8825))
    }
  }

  /** The EXIF TIFF block of ANY carrier format, packed
    * (start << 32 | end): JPEG APP1, WebP `EXIF` chunk, TIFF itself,
    * HEIF item indirection, PNG `eXIf` chunk. -1 = the format can
    * carry EXIF but this file doesn't; -2 = unknown — either the
    * format cannot carry EXIF at all (GIF/BMP/unknown bytes) or the
    * file DECLARES an EXIF block this walk cannot resolve (a HEIF
    * iloc we cannot follow, a malformed ExifDataBlock). Both -2
    * cases must surface as null, never false: the flag feeds a
    * privacy gate that has to fail closed. The single locate shared
    * by the GPS flag and the GPS scrub so they can never disagree on
    * where the block lives.
    */
  private def exifTiffRegion(bytes: Array[Byte]): Long = {
    if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
      bytes(10) == 'B' && bytes(11) == 'P') return webpExifRegion(bytes)
    if (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') return pngExifChunkRegion(bytes)
    // a TIFF file IS a TIFF block: scan its own IFD0 (cameras and DNG
    // workflows plant the GPS pointer exactly here)
    if (isTiffMagic(bytes)) return (0L << 32) | bytes.length.toLong
    if (isHeifMagic(bytes)) {
      val r = avifExifRegion(bytes)
      if (r == -1L) return -1L // no EXIF item declared: location-free
      // declared-but-unresolvable must read as UNKNOWN, never false —
      // asserting "no GPS" about bytes we could not read would make
      // the privacy gate fail open for this carrier
      if (r < 0) return -2L
      val p0 = (r >>> 32).toInt
      val end = (r & 0xffffffffL).toInt
      if (end - p0 < 4) return -2L
      // HEIF ExifDataBlock: u32 offset to the TIFF header within the
      // payload; tolerate a leading `Exif\0\0` like the WebP chunk
      val hdrOff = ((bytes(p0) & 0xffL) << 24) | ((bytes(p0 + 1) & 0xffL) << 16) |
        ((bytes(p0 + 2) & 0xffL) << 8) | (bytes(p0 + 3) & 0xffL)
      if (hdrOff < 0 || p0 + 4 + hdrOff >= end) return -2L
      var t = p0 + 4 + hdrOff.toInt
      if (end - t >= 6 && bytes(t) == 'E' && bytes(t + 1) == 'x' &&
        bytes(t + 2) == 'i' && bytes(t + 3) == 'f' && bytes(t + 4) == 0 &&
        bytes(t + 5) == 0) t += 6
      return (t.toLong << 32) | end.toLong
    }
    // JXL container: a raw `Exif` box (18181-2 §metadata) shaped like
    // the HEIF ExifDataBlock — u32 tiff offset, then the TIFF block
    if (bytes.length >= 20 && bytes(0) == 0 && bytes(3) == 0x0C &&
      bytes(4) == 'J' && bytes(5) == 'X' && bytes(6) == 'L' &&
      bytes(7) == ' ') {
      @inline def u32(o: Int): Long =
        ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      var i = 12
      while (i + 8 <= bytes.length) {
        val size = u32(i)
        val id = new String(bytes, i + 4, 4, "ISO-8859-1")
        val boxEnd = if (size == 0) bytes.length.toLong else i + size
        if (boxEnd < i + 8 || boxEnd > bytes.length) return -1L
        if (id == "Exif" && boxEnd - i >= 12 + 4) {
          val p0 = i + 8
          val hdrOff = u32(p0)
          if (hdrOff < 0 || p0 + 4 + hdrOff >= boxEnd) return -1L
          var t = (p0 + 4 + hdrOff).toInt
          if (boxEnd - t >= 6 && bytes(t) == 'E' && bytes(t + 1) == 'x' &&
            bytes(t + 2) == 'i' && bytes(t + 3) == 'f' &&
            bytes(t + 4) == 0 && bytes(t + 5) == 0) t += 6
          return (t.toLong << 32) | boxEnd
        }
        i = boxEnd.toInt
      }
      return -1L
    }
    // a naked JXL codestream has no metadata container at all
    if (bytes(0) == 0xFF.toByte && bytes(1) == 0x0A) return -2L
    if (!(bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte)) return -2L
    val r = exifApp1Region(bytes)
    if (r < 0) -1L else r
  }

  /** Surgical GPS removal — the scrub half of the [[exifGpsPresent]]
    * release gate, for when a pipeline must keep the ORIGINAL bytes
    * (codec, quality, every other metadata field, perceptual and
    * exact signatures) and remove only the capture location — unlike
    * [[resizeImages]]' re-encode scrub, which loses the original
    * encode entirely. In-place byte surgery on a copy, length
    * unchanged: the IFD0 GPS-pointer entry is rewritten to a benign
    * unknown LONG tag (0x8826, count 1, value 0 — tag order stays
    * ascending, so strict readers keep working), the GPS IFD's
    * out-of-line values (the RATIONAL lat/long arrays) are zeroed,
    * then the GPS IFD table itself. Works on every carrier the flag
    * reads — JPEG APP1, WebP `EXIF` chunk, TIFF, HEIF item, PNG
    * `eXIf` chunk (whose CRC is recomputed). Bytes without a GPS
    * tag return UNCHANGED (same reference — a scrub pass over a
    * clean corpus allocates nothing). Public for the generated-code
    * static call.
    */
  def scrubGps(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 12 ||
      exifGpsPresent(bytes) != java.lang.Boolean.TRUE) return bytes
    try {
      val out = java.util.Arrays.copyOf(bytes, bytes.length)
      val r = exifTiffRegion(out)
      if (r < 0) return bytes // defensive: flag said TRUE
      val tiff = (r >>> 32).toInt
      val end = (r & 0xffffffffL).toInt
      if (!zeroGpsIfd(out, tiff, end)) return bytes
      // PNG: the eXIf chunk carries a CRC over type+data — recompute
      if (out(0) == 0x89.toByte && out(1) == 'P' && out(2) == 'N' &&
        out(3) == 'G') {
        val crc = new java.util.zip.CRC32()
        crc.update(out, tiff - 4, 4 + (end - tiff))
        val v = crc.getValue.toInt
        out(end) = ((v >> 24) & 0xff).toByte
        out(end + 1) = ((v >> 16) & 0xff).toByte
        out(end + 2) = ((v >> 8) & 0xff).toByte
        out(end + 3) = (v & 0xff).toByte
      }
      out
    } catch { case _: Throwable => bytes } // per-row isolation
  }

  /** [[scrubGps]] as a Column — codegen'd like [[dhash64Col]], so the
    * release-gate scrub is a map-only projection
    * (`df.withColumn("content", scrubGpsCol(col("content")))`) with
    * no UDF boundary: zero shuffles, zero allocation on clean rows.
    */
  def scrubGpsCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(ScrubGps(expressionOf(content)))
  }

  case class ScrubGps(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(v: Any): Any =
      scrubGps(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.operators.Multimodal.scrubGps($c)")
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): ScrubGps = copy(c)
  }

  /** Video GPS flag — an ISO-BMFF movie's capture location lives in
    * `moov/udta` as the QuickTime `©xyz` atom (an ISO 6709
    * "+lat+lon/" string behind a 2-byte size + 2-byte language
    * preamble) or the 3GPP `loci` box; iPhone videos write exactly
    * this. TRUE when either atom exists, FALSE for a BMFF movie
    * without one, null for non-BMFF bytes and for HEIF still images
    * (those are [[exifGpsPresent]]'s job). Depth-capped walk like
    * its siblings; public for the generated-code static call.
    */
  def videoGpsPresent(bytes: Array[Byte]): java.lang.Boolean = {
    val r = videoGpsRegions(bytes)
    if (r == null) null
    else java.lang.Boolean.valueOf(r.exists { case (from, until) =>
      // an all-zero payload is a scrubbed/empty location (zero-length
      // string behind a zero preamble), not a present one
      var i = from
      while (i < until && bytes(i) == 0) i += 1
      i < until
    })
  }

  /** The payload byte ranges of every location-carrying atom under
    * `moov/udta` — null for non-movie bytes, empty for a clean
    * movie. Shared by the flag and the scrub.
    */
  private def videoGpsRegions(b: Array[Byte]): Seq[(Int, Int)] = try {
    if (b == null || b.length < 16 ||
      !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') ||
      isHeifMagic(b)) return null
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    @inline def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    val out = Seq.newBuilder[(Int, Int)]
    def walk(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 16) return
      var off = start
      while (off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = new String(b, off.toInt + 4, 4, "ISO-8859-1")
        var body = off + 8
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) return
        id match {
          case "moov" | "udta" | "trak" => walk(body, boxEnd, depth + 1)
          case "©xyz" | "loci" => out += ((body.toInt, boxEnd.toInt))
          case _ => ()
        }
        off = boxEnd
      }
    }
    walk(0L, b.length.toLong, 0)
    out.result()
  } catch { case _: Throwable => null }

  /** Surgical video-GPS removal — [[scrubGps]]'s movie twin: zero
    * the `©xyz`/`loci` payload bytes in place on a copy (box sizes
    * unchanged, every other byte identical — the same keep-the-
    * original-encode rationale). A zeroed `©xyz` reads as a
    * zero-length location string, which location parsers treat as
    * absent. Bytes without a location return the same reference.
    * Public for the generated-code static call.
    */
  def scrubVideoGps(bytes: Array[Byte]): Array[Byte] = {
    val regions = videoGpsRegions(bytes)
    if (regions == null || regions.isEmpty) return bytes
    val out = java.util.Arrays.copyOf(bytes, bytes.length)
    regions.foreach { case (from, until) =>
      java.util.Arrays.fill(out, from, until, 0.toByte)
    }
    out
  }

  /** [[videoGpsPresent]] as a Column — codegen'd like
    * [[dhash64Col]]; null for non-movie bytes.
    */
  def videoGpsPresentCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(VideoGpsPresent(expressionOf(content)))
  }

  case class VideoGpsPresent(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val f = videoGpsPresent(v.asInstanceOf[Array[Byte]])
      if (f == null) null else f.booleanValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("vgps")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Boolean $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.videoGpsPresent(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final boolean ${ev.value} = ${ev.isNull} ? false : $boxed.booleanValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): VideoGpsPresent = copy(c)
  }

  /** [[scrubVideoGps]] as a Column — codegen'd like [[scrubGpsCol]]. */
  def scrubVideoGpsCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(ScrubVideoGps(expressionOf(content)))
  }

  case class ScrubVideoGps(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(v: Any): Any =
      scrubVideoGps(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.operators.Multimodal.scrubVideoGps($c)")
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): ScrubVideoGps = copy(c)
  }

  /** Splice a Nero `chpl` chapter box (`moov/udta/chpl`) into an
    * existing `ftyp ++ ... ++ moov` fixture — [[mp4WithGps]]'s
    * chapters twin: fullbox + u32 reserved + u8 count, entries of
    * u64 start in 100 ns units + pascal-string UTF-8 title.
    */
  private[graft] def mp4WithChpl(mp4: Array[Byte],
      chapters: Seq[(Long, String)]): Array[Byte] = {
    require(chapters.nonEmpty && chapters.size < 256, "u8 chapter count")
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(id.getBytes("ISO-8859-1")).put(payload)
      out.array()
    }
    val body = new java.io.ByteArrayOutputStream()
    body.write(Array[Byte](1, 0, 0, 0), 0, 4) // fullbox version 1
    body.write(new Array[Byte](4), 0, 4) // reserved
    body.write(chapters.size)
    chapters.foreach { case (ms, title) =>
      val t100ns = ms * 10000L
      val bb = java.nio.ByteBuffer.allocate(8).putLong(t100ns).array()
      body.write(bb, 0, 8)
      val tb = title.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(tb.length < 256, "pascal-string title")
      body.write(tb.length)
      body.write(tb, 0, tb.length)
    }
    val udta = box("udta", box("chpl", body.toByteArray))
    @inline def u32(o: Int): Int = java.nio.ByteBuffer.wrap(mp4, o, 4).getInt
    var off = 0
    var moovAt = -1
    while (moovAt < 0 && off + 8 <= mp4.length) {
      if (new String(mp4, off + 4, 4, "ISO-8859-1") == "moov") moovAt = off
      else off += u32(off)
    }
    require(moovAt >= 0, "fixture mp4 must carry a moov box")
    val moovEnd = moovAt + u32(moovAt)
    val moovPayload = java.util.Arrays.copyOfRange(mp4, moovAt + 8, moovEnd)
    java.util.Arrays.copyOfRange(mp4, 0, moovAt) ++
      box("moov", moovPayload ++ udta) ++
      java.util.Arrays.copyOfRange(mp4, moovEnd, mp4.length)
  }

  /** `udta(©xyz)` bytes to splice into a [[syntheticMjpegMp4]] /
    * [[syntheticM4a]] moov — the video-GPS fixture builder.
    */
  private[graft] def mp4WithGps(mp4: Array[Byte],
      iso6709: String = "+37.7749-122.4194/"): Array[Byte] = {
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(id.getBytes("ISO-8859-1")).put(payload)
      out.array()
    }
    val s = iso6709.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val xyz = box("©xyz", java.nio.ByteBuffer.allocate(4 + s.length)
      .putShort(s.length.toShort).putShort(0x15c7) // lang: und
      .put(s).array())
    val udta = box("udta", xyz)
    // splice udta into the trailing moov: rebuild it with the same
    // payload plus the metadata ([[syntheticM4aTagged]] discipline)
    @inline def u32(o: Int): Int = java.nio.ByteBuffer.wrap(mp4, o, 4).getInt
    var off = 0
    var moovAt = -1
    while (moovAt < 0 && off + 8 <= mp4.length) {
      if (new String(mp4, off + 4, 4, "ISO-8859-1") == "moov") moovAt = off
      else off += u32(off)
    }
    require(moovAt >= 0, "fixture mp4 must carry a moov box")
    val moovEnd = moovAt + u32(moovAt)
    val moovPayload = java.util.Arrays.copyOfRange(mp4, moovAt + 8, moovEnd)
    java.util.Arrays.copyOfRange(mp4, 0, moovAt) ++
      box("moov", moovPayload ++ udta) ++
      java.util.Arrays.copyOfRange(mp4, moovEnd, mp4.length)
  }

  /** Animated-WebP facts — [[gifAnimationInfo]]'s RIFF twin:
    * (frames, durationMs, loops) from the `ANMF` frame chunks (24-bit
    * millisecond durations at payload offset 12) and the `ANIM`
    * chunk's u16 loop count (0 = infinite). None for non-WebP bytes
    * or a still WebP (no VP8X animation flag / no ANMF chunks).
    */
  private[graft] def webpAnimationInfo(b: Array[Byte]): Option[GifAnim] = try {
    if (b == null || b.length < 21 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      !(b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return None
    @inline def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    @inline def le24(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
    @inline def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    var frames = 0
    var durationMs = 0L
    var loops: Integer = null
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "ISO-8859-1")
      val size = le32(i + 4)
      if (size < 0 || size > Int.MaxValue - i - 9) return None // hostile
      val body = i + 8
      id match {
        case "ANIM" if body + 6 <= b.length =>
          loops = Integer.valueOf(le16(body + 4)) // after 4B background
        case "ANMF" if body + 16 <= b.length =>
          frames += 1
          durationMs += le24(body + 12)
        case _ => ()
      }
      i = body + size.toInt + (size.toInt & 1) // word alignment
    }
    if (frames == 0) None else Some(GifAnim(frames, durationMs, loops))
  } catch { case _: Throwable => None }

  /** Minimal animated WebP: VP8X (animation flag) + ANIM + one ANMF
    * per delay, each wrapping the canonical two-tone VP8L payload —
    * valid structure, deterministic bytes.
    */
  private[graft] def syntheticAnimatedWebp(delaysMs: Seq[Int],
      loops: Int = 0): Array[Byte] = {
    require(delaysMs.nonEmpty, "at least one frame")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("ISO-8859-1")).putInt(body.length).put(body)
      out.array()
    }
    def le24(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte)
    val vp8x = chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++ // animation
      le24(15) ++ le24(15)) // canvas 16x16 (minus-one fields)
    val anim = chunk("ANIM", Array[Byte](0, 0, 0, 0) ++
      Array((loops & 0xff).toByte, ((loops >> 8) & 0xff).toByte))
    // the frame payload: a real VP8L stream (bitstream-valid frames)
    val vp8l = {
      val whole = syntheticVp8lTwoTone(16, 16, (x, _) => x % 2 == 0,
        0xff000000, 0xffffffff)
      // strip its RIFF wrapper down to the VP8L chunk
      java.util.Arrays.copyOfRange(whole, 12, whole.length)
    }
    val anmfs = delaysMs.toArray.flatMap { d =>
      chunk("ANMF", le24(0) ++ le24(0) ++ le24(15) ++ le24(15) ++
        le24(d) ++ Array[Byte](0) ++ vp8l)
    }
    val riffBody = "WEBP".getBytes("ISO-8859-1") ++ vp8x ++ anim ++ anmfs
    val bb = java.nio.ByteBuffer.allocate(8 + riffBody.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(riffBody.length)
      .put(riffBody)
    bb.array()
  }

  /** Animation facts for ANY animated image container — GIF or
    * animated WebP, one dispatch ([[gifAnimationInfo]] /
    * [[webpAnimationInfo]]). None for stills of other formats.
    */
  /** APNG animation facts — the `acTL` chunk (frame count, play
    * count: 0 = loop forever, reported as 0) and the `fcTL` frames'
    * delay fractions summed in ms (delay_den 0 means 100 per the
    * spec; per-frame integer division so fixture closed forms hold).
    * A plain PNG has no `acTL` and reports None — exactly the GIF
    * still/animated split. ImageIO ignores the animation chunks, so
    * [[decodePixels]] still yields the default image.
    */
  private[graft] def pngAnimationInfo(b: Array[Byte]): Option[GifAnim] = try {
    if (b == null || b.length < 20 ||
      !(b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'))
      return None
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    @inline def u16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    var frames = -1
    var plays: Integer = null
    var durationMs = 0L
    var i = 8
    var done = false
    while (!done && i + 12 <= b.length) {
      val len = u32(i)
      if (len < 0 || len > b.length - i - 12) done = true
      else {
        val typ = new String(b, i + 4, 4, "ISO-8859-1")
        val from = i + 8
        typ match {
          case "acTL" if len >= 8 =>
            frames = u32(from).toInt
            plays = Integer.valueOf(u32(from + 4).toInt)
          case "fcTL" if len >= 26 =>
            val num = u16(from + 20)
            val den0 = u16(from + 22)
            val den = if (den0 == 0) 100 else den0
            durationMs += num.toLong * 1000L / den
          case "IEND" => done = true
          case _ => ()
        }
        i += 12 + len.toInt
      }
    }
    if (frames <= 0) None else Some(GifAnim(frames, durationMs, plays))
  } catch { case _: Throwable => None }

  /** Splice APNG animation chunks (acTL + one fcTL per delay) after
    * IHDR — CRC'd like [[pngWithText]]; ImageIO still decodes the
    * raster through them.
    */
  private[graft] def pngWithAnimation(png: Array[Byte],
      delays: Seq[(Int, Int)], plays: Int): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("ISO-8859-1")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val actl = chunk("acTL", java.nio.ByteBuffer.allocate(8)
      .putInt(delays.length).putInt(plays).array())
    val fctls = delays.zipWithIndex.toArray.flatMap { case ((num, den), k) =>
      val bb = java.nio.ByteBuffer.allocate(26)
      bb.putInt(k).putInt(1).putInt(1).putInt(0).putInt(0)
        .putShort(num.toShort).putShort(den.toShort)
        .put(0.toByte).put(0.toByte)
      chunk("fcTL", bb.array())
    }
    val at = 8 + 25
    java.util.Arrays.copyOfRange(png, 0, at) ++ actl ++ fctls ++
      java.util.Arrays.copyOfRange(png, at, png.length)
  }

  /** One animation surface over the three containers the web serves
    * loops in: GIF, animated WebP, APNG.
    */
  private[graft] def animationInfo(b: Array[Byte]): Option[GifAnim] =
    gifAnimationInfo(b).orElse(webpAnimationInfo(b))
      .orElse(pngAnimationInfo(b))

  /** TIFF value-type byte widths (BYTE..DOUBLE), 0 = unknown. */
  private val TiffTypeBytes =
    Array(0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8)

  /** In-place GPS surgery on the TIFF block at [tiff, end): zero the
    * GPS IFD's out-of-line values, the IFD table, and neutralize the
    * IFD0 pointer entry. False when no GPS entry is found.
    */
  private def zeroGpsIfd(b: Array[Byte], tiff: Int, end: Int): Boolean = {
    if (tiff + 8 > end) return false
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return false
    def u16(o: Int): Int =
      if (o < tiff || o + 2 > end) -1
      else if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < tiff || o + 4 > end) -1L
      else if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def putU16(o: Int, v: Int): Unit =
      if (little) { b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte }
      else { b(o) = ((v >> 8) & 0xff).toByte; b(o + 1) = (v & 0xff).toByte }
    def zero(from: Int, until: Int): Unit = {
      val f = math.max(from, tiff)
      val u = math.min(until, end)
      if (f < u) java.util.Arrays.fill(b, f, u, 0.toByte)
    }
    if (u16(tiff + 2) != 42) return false
    val ifdOff = u32(tiff + 4)
    if (ifdOff < 0) return false
    val ifd = tiff + ifdOff.toInt
    val nEntries = u16(ifd)
    if (nEntries < 0) return false
    var k = 0
    while (k < nEntries) {
      val e = ifd + 2 + 12 * k
      // the WHOLE 12-byte entry must sit inside the region before any
      // in-place write — a truncated entry is left alone (fail-safe:
      // unchanged bytes, never a write past the EXIF block)
      if (u16(e) == 0x8825 && e + 12 <= end) {
        val gpsOff = u32(e + 8)
        if (gpsOff > 0) {
          val g = tiff + gpsOff.toInt
          val gn = u16(g)
          if (gn >= 0) {
            // zero out-of-line values first (RATIONAL lat/long live
            // outside the table), then the table itself
            var j = 0
            while (j < gn) {
              val ge = g + 2 + 12 * j
              val typ = u16(ge + 2)
              val cnt = u32(ge + 4)
              if (typ >= 1 && typ < TiffTypeBytes.length && cnt >= 0) {
                val byteLen = TiffTypeBytes(typ).toLong * cnt
                if (byteLen > 4) {
                  val off = u32(ge + 8)
                  // long-guard BEFORE the toInt: a hostile offset or
                  // count must not wrap into zeroing unrelated bytes
                  if (off > 0 && off + byteLen <= (end - tiff).toLong)
                    zero(tiff + off.toInt, tiff + (off + byteLen).toInt)
                }
              }
              j += 1
            }
            zero(g, g + 2 + 12 * gn + 4)
          }
        }
        // neutralize the pointer entry: a benign unknown LONG tag,
        // count 1, value 0 — entry order stays ascending
        putU16(e, 0x8826)
        putU16(e + 2, 4)
        zero(e + 4, e + 12)
        if (little) b(e + 4) = 1 else b(e + 7) = 1 // count = 1
        return true
      }
      k += 1
    }
    false
  }

  /** The `eXIf` chunk's data region of a PNG, packed
    * (start << 32 | end); -1 when absent.
    */
  private def pngExifChunkRegion(bytes: Array[Byte]): Long = {
    @inline def u32be(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    var i = 8
    while (i + 8 <= bytes.length) {
      val len = u32be(i)
      if (len < 0 || i + 8 + len > bytes.length) return -1L // truncated
      val typ = new String(bytes, i + 4, 4, "ISO-8859-1")
      if (typ == "eXIf") return ((i + 8).toLong << 32) | (i + 8 + len)
      if (typ == "IEND") return -1L
      i += 12 + len.toInt // header + data + crc
    }
    -1L
  }

  /** The TIFF block inside a WebP's RIFF `EXIF` chunk, packed
    * (start << 32 | end), or -1 when absent. The optional
    * `Exif\0\0` prefix some writers emit is skipped like APP1's.
    */
  private def webpExifRegion(b: Array[Byte]): Long = {
    @inline def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(i + 4)
      if (b(i) == 'E' && b(i + 1) == 'X' && b(i + 2) == 'I' && b(i + 3) == 'F') {
        val p0 = i + 8
        val end = math.min(b.length.toLong, p0 + size).toInt
        // some writers prefix the TIFF block with "Exif\0\0" like APP1
        val t = if (end - p0 >= 6 && b(p0) == 'E' && b(p0 + 1) == 'x' &&
          b(p0 + 2) == 'i' && b(p0 + 3) == 'f' && b(p0 + 4) == 0 &&
          b(p0 + 5) == 0) p0 + 6 else p0
        return (t.toLong << 32) | end.toLong
      }
      if (size < 0 || size > Int.MaxValue - i - 9) return -1L
      i += 8 + size.toInt + (size.toInt & 1) // RIFF word alignment
    }
    -1L
  }

  /** GPS flag for a WebP container: walk the RIFF chunks for `EXIF`
    * and scan its TIFF block for tag 0x8825 like the JPEG path.
    */
  private def webpGpsPresent(b: Array[Byte]): java.lang.Boolean = {
    val r = webpExifRegion(b)
    if (r < 0) java.lang.Boolean.FALSE
    else java.lang.Boolean.valueOf(
      tiffHasTag(b, (r >>> 32).toInt, (r & 0xffffffffL).toInt, 0x8825))
  }

  /** Scan IFD0 of the TIFF region for `tag` (any type/count). */
  private def tiffHasTag(b: Array[Byte], tiff: Int, end: Int,
      tag: Int): Boolean = {
    if (tiff + 8 > end) return false
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return false
    def u16(o: Int): Int =
      if (o < tiff || o + 2 > end) -1
      else if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < tiff || o + 4 > end) -1L
      else if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u16(tiff + 2) != 42) return false
    val ifdOff = u32(tiff + 4)
    if (ifdOff < 0) return false
    val ifd = tiff + ifdOff.toInt
    val nEntries = u16(ifd)
    if (nEntries < 0) return false
    var k = 0
    while (k < nEntries) {
      if (u16(ifd + 2 + 12 * k) == tag) return true
      k += 1
    }
    false
  }

  private def tiffOrientation(b: Array[Byte], tiff: Int, end: Int): Int = {
    if (tiff + 8 > end) return 1
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return 1
    def u16(o: Int): Int =
      if (o < tiff || o + 2 > end) -1
      else if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < tiff || o + 4 > end) -1L
      else if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u16(tiff + 2) != 42) return 1
    val ifdOff = u32(tiff + 4)
    if (ifdOff < 0) return 1
    val ifd = tiff + ifdOff.toInt
    val nEntries = u16(ifd)
    if (nEntries < 0) return 1
    var k = 0
    while (k < nEntries) {
      val e = ifd + 2 + 12 * k
      // SHORT values (type 3, count 1) live left-justified in the
      // 4-byte value slot, read in the declared byte order
      if (u16(e) == 0x0112 && u16(e + 2) == 3 && u32(e + 4) == 1L) {
        val v = u16(e + 8)
        return if (v >= 1 && v <= 8) v else 1
      }
      k += 1
    }
    1
  }

  /** Declared image text — the caption/description/comment an image
    * SAYS it has. Null fields when absent; `text_format` names the
    * container. The curation surface image-text pair mining needs:
    * alt-text-grade captions ride EXIF ImageDescription, PNG
    * tEXt/iTXt, JPEG COM and GIF comment blocks — [[AudioTagsSchema]]'s
    * image twin.
    */
  val ImageTextSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("comment", StringType),
    StructField("text_format", StringType)))

  /** ASCII (type 2) tag value from a TIFF block's IFD0 — inline when
    * the NUL-included count fits the 4-byte value slot, else via the
    * tiff-relative offset, per the TIFF spec. Decoded as UTF-8 (ASCII
    * by spec, but cameras and exporters write UTF-8 in practice),
    * trimmed at the first NUL; null when absent, structurally
    * invalid, or empty.
    */
  private def tiffAsciiTag(b: Array[Byte], tiff: Int, end: Int,
      tag: Int): String = {
    if (tiff + 8 > end) return null
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return null
    def u16(o: Int): Int =
      if (o < tiff || o + 2 > end) -1
      else if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < tiff || o + 4 > end) -1L
      else if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u16(tiff + 2) != 42) return null
    val ifdOff = u32(tiff + 4)
    if (ifdOff < 0) return null
    val ifd = tiff + ifdOff.toInt
    val nEntries = u16(ifd)
    if (nEntries < 0) return null
    var k = 0
    while (k < nEntries) {
      val e = ifd + 2 + 12 * k
      if (u16(e) == tag && u16(e + 2) == 2) {
        val count = u32(e + 4)
        if (count <= 0 || count > end - tiff) return null
        val from =
          if (count <= 4) e + 8
          else {
            val o = u32(e + 8)
            if (o < 0) return null
            tiff + o.toInt
          }
        if (from < tiff || count > end - from) return null
        val raw = new String(b, from, count.toInt,
          java.nio.charset.StandardCharsets.UTF_8)
        val nul = raw.indexOf(0.toChar)
        val t = if (nul >= 0) raw.substring(0, nul) else raw
        return if (t.isEmpty) null else t
      }
      k += 1
    }
    null
  }

  /** Camera provenance declared in the EXIF block of ANY carrier
    * [[exifTiffRegion]] locates: IFD0 Make (0x010F) / Model (0x0110)
    * and the capture time — DateTimeOriginal (0x9003) from the Exif
    * sub-IFD (LONG pointer 0x8769), falling back to IFD0's DateTime
    * (0x0132) — as the spec's `YYYY:MM:DD HH:MM:SS` string (EXIF
    * carries no timezone; parsing it to a timestamp is caller
    * policy). The burst-dedup / group-by-camera signal of a photo
    * corpus. None when no EXIF or none of the three fields.
    */
  private[graft] def imageProvenance(b: Array[Byte]): Option[(String, String, String)] = try {
    if (b == null || b.length < 12) return None
    val r = exifTiffRegion(b)
    if (r < 0) return None
    val tiff = (r >>> 32).toInt
    val end = (r & 0xffffffffL).toInt
    if (tiff + 8 > end) return None
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return None
    def u16(o: Int): Int =
      if (o < tiff || o + 2 > end) -1
      else if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < tiff || o + 4 > end) -1L
      else if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u16(tiff + 2) != 42) return None
    val ifd0Off = u32(tiff + 4)
    if (ifd0Off < 0) return None
    val ifd0 = tiff + ifd0Off.toInt
    def asciiIn(ifd: Int, tag: Int): String = {
      val n = u16(ifd)
      if (n < 0) return null
      var k = 0
      while (k < n) {
        val e = ifd + 2 + 12 * k
        if (u16(e) == tag && u16(e + 2) == 2) {
          val count = u32(e + 4)
          if (count <= 0 || count > end - tiff) return null
          val from =
            if (count <= 4) e + 8
            else {
              val o = u32(e + 8)
              if (o < 0) return null
              tiff + o.toInt
            }
          if (from < tiff || count > end - from) return null
          val raw = new String(b, from, count.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          val nul = raw.indexOf(0.toChar)
          val t = if (nul >= 0) raw.substring(0, nul) else raw
          return if (t.isEmpty) null else t
        }
        k += 1
      }
      null
    }
    def longIn(ifd: Int, tag: Int): Long = {
      val n = u16(ifd)
      if (n < 0) return -1L
      var k = 0
      while (k < n) {
        val e = ifd + 2 + 12 * k
        if (u16(e) == tag && (u16(e + 2) == 4 || u16(e + 2) == 3) &&
          u32(e + 4) == 1L)
          return if (u16(e + 2) == 4) u32(e + 8) else u16(e + 8).toLong
        k += 1
      }
      -1L
    }
    val make = asciiIn(ifd0, 0x010F)
    val model = asciiIn(ifd0, 0x0110)
    val exifIfdOff = longIn(ifd0, 0x8769)
    val dto =
      if (exifIfdOff > 0 && tiff + exifIfdOff < end)
        asciiIn(tiff + exifIfdOff.toInt, 0x9003)
      else null
    val captured = if (dto != null) dto else asciiIn(ifd0, 0x0132)
    if (make == null && model == null && captured == null) None
    else Some((make, model, captured))
  } catch { case _: Throwable => None } // per-row isolation

  /** [[ImageTextSchema]]'s provenance sibling. */
  val ImageProvenanceSchema: StructType = StructType(Seq(
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("captured_at", StringType)))

  /** Append a `prov` struct ([[ImageProvenanceSchema]]) per row —
    * [[imageTags]]' discipline: map-only, all-null struct for rows
    * without EXIF provenance. Grouping a photo corpus by
    * (make, model) or bucketing captured_at finds device bursts —
    * the near-dup candidate generator a crawl's camera uploads need.
    */
  def imageProvenanceTags(df: DataFrame, contentCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("prov", ImageProvenanceSchema))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          val prov = imageProvenance(bytes) match {
            case Some((mk, md, at)) => Row(mk, md, at)
            case None => Row(null, null, null)
          }
          Row.fromSeq(row.toSeq :+ prov)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Insert a JPEG APP1 EXIF segment carrying camera provenance:
    * IFD0 Make/Model (ASCII, out-of-line) and an Exif sub-IFD
    * (pointer 0x8769) with DateTimeOriginal — the big-endian layout
    * of q161's `withExif` discipline. Fixture strings must be > 3
    * chars (out-of-line only).
    */
  private[graft] def jpegWithExifProvenance(jpeg: Array[Byte], make: String,
      model: String, capturedAt: String): Array[Byte] = {
    val mk = make.getBytes(java.nio.charset.StandardCharsets.UTF_8) :+ 0.toByte
    val md = model.getBytes(java.nio.charset.StandardCharsets.UTF_8) :+ 0.toByte
    val at = capturedAt.getBytes(java.nio.charset.StandardCharsets.UTF_8) :+ 0.toByte
    require(mk.length > 4 && md.length > 4 && at.length > 4,
      "out-of-line fixture values only")
    val ifd0Bytes = 2 + 12 * 3 + 4
    val makeOff = 8 + ifd0Bytes
    val modelOff = makeOff + mk.length
    val exifIfdOff = modelOff + md.length
    val dtoOff = exifIfdOff + 2 + 12 + 4
    val bb = java.nio.ByteBuffer.allocate(dtoOff + at.length)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    bb.putShort(3) // ascending tag order: Make, Model, ExifIFD pointer
    bb.putShort(0x010F.toShort).putShort(2).putInt(mk.length).putInt(makeOff)
    bb.putShort(0x0110.toShort).putShort(2).putInt(md.length).putInt(modelOff)
    bb.putShort(0x8769.toShort).putShort(4).putInt(1).putInt(exifIfdOff)
    bb.putInt(0) // next-IFD pointer
    bb.put(mk).put(md)
    bb.putShort(1) // the Exif sub-IFD: DateTimeOriginal only
    bb.putShort(0x9003.toShort).putShort(2).putInt(at.length).putInt(dtoOff)
    bb.putInt(0)
    bb.put(at)
    val payload = "Exif".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++ bb.array()
    val app1 = Array(0xFF.toByte, 0xE1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** The EXIF IFD1 thumbnail — the JPEG preview cameras embed next
    * to the main image (tags 0x0201 JPEGInterchangeFormat +
    * 0x0202 ...Length in the IFD chained after IFD0): a forensic
    * dedup signal, because photo editors routinely re-encode the
    * main image while COPYING the original EXIF block — the edited
    * upload and the original share thumbnail bytes long after their
    * pixels diverge. Works on every carrier [[exifTiffRegion]]
    * reads (JPEG APP1, TIFF, WebP, PNG eXIf, HEIF items, JXL).
    * None when no IFD1 or no thumbnail tags. Public for the
    * generated-code static call.
    */
  def exifThumbnail(b: Array[Byte]): Array[Byte] = try {
    if (b == null || b.length < 12) return null
    val r = exifTiffRegion(b)
    if (r < 0) return null
    val tiff = (r >>> 32).toInt
    val end = (r & 0xffffffffL).toInt
    if (tiff + 8 > end) return null
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return null
    def u16(o: Int): Int =
      if (o < tiff || o + 2 > end) -1
      else if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < tiff || o + 4 > end) -1L
      else if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (u16(tiff + 2) != 42) return null
    val ifd0Off = u32(tiff + 4)
    if (ifd0Off < 0) return null
    val ifd0 = tiff + ifd0Off.toInt
    val n0 = u16(ifd0)
    if (n0 < 0 || n0 > 4096) return null
    val nextOff = u32(ifd0 + 2 + 12 * n0)
    if (nextOff <= 0) return null // no IFD1: no thumbnail
    val ifd1 = tiff + nextOff.toInt
    val n1 = u16(ifd1)
    if (n1 < 0 || n1 > 4096) return null
    var thumbOff = -1L
    var thumbLen = -1L
    var k = 0
    while (k < n1) {
      val e = ifd1 + 2 + 12 * k
      val tag = u16(e)
      // honor the entry TYPE: some camera/editor stacks write these
      // as SHORT, whose 2-byte value sits at the START of the value
      // field — a raw u32 read would misread it (<< 16 in big-endian)
      val typ = u16(e + 2)
      def value(): Long =
        if (typ == 3) u16(e + 8).toLong else u32(e + 8)
      if (tag == 0x0201) thumbOff = value()
      else if (tag == 0x0202) thumbLen = value()
      k += 1
    }
    if (thumbOff <= 0 || thumbLen <= 0) return null
    val s = tiff + thumbOff
    if (s + thumbLen > end) return null
    java.util.Arrays.copyOfRange(b, s.toInt, (s + thumbLen).toInt)
  } catch { case _: Throwable => null } // per-row isolation

  /** Append a `thumb` binary column ([[exifThumbnail]] per row) —
    * [[embeddedArt]]'s photo-forensics sibling: map-only, null for
    * rows without an IFD1 thumbnail; the bytes are an ordinary JPEG,
    * so the exact-fingerprint and dHash machinery compose directly
    * ("the edit kept the original's EXIF" linking signal).
    */
  def exifThumbnails(df: DataFrame, contentCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("thumb", BinaryType))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          Row.fromSeq(row.toSeq :+ exifThumbnail(bytes))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Splice an EXIF APP1 with an IFD1 thumbnail into a JPEG — the
    * [[jpegWithExifProvenance]] discipline for [[exifThumbnail]]
    * fixtures: IFD0 (zero entries) chains to an IFD1 whose
    * 0x0201/0x0202 tags frame the given thumbnail bytes.
    */
  private[graft] def jpegWithThumbnail(jpeg: Array[Byte],
      thumb: Array[Byte]): Array[Byte] = {
    val payload = "Exif".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++
      tiffWithThumbnail(thumb)
    val app1 = Array(0xFF.toByte, 0xE1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** The raw TIFF block [[jpegWithThumbnail]] wraps in APP1: an empty
    * IFD0 chaining to an IFD1 whose 0x0201/0x0202 tags frame the
    * thumbnail — reusable as a PNG `eXIf` payload
    * ([[pngWithExifTiff]]), since [[exifThumbnail]] reads the TIFF
    * region through the carrier-generic [[exifTiffRegion]].
    */
  private[graft] def tiffWithThumbnail(thumb: Array[Byte]): Array[Byte] = {
    val ifd1Off = 8 + 2 + 4 // empty IFD0 (count + next ptr)
    val thumbOff = ifd1Off + 2 + 12 * 2 + 4
    val bb = java.nio.ByteBuffer.allocate(thumbOff + thumb.length)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    bb.putShort(0).putInt(ifd1Off) // IFD0: no entries, chain to IFD1
    bb.putShort(2)
    bb.putShort(0x0201.toShort).putShort(4).putInt(1).putInt(thumbOff)
    bb.putShort(0x0202.toShort).putShort(4).putInt(1).putInt(thumb.length)
    bb.putInt(0) // IFD1 next pointer
    bb.put(thumb)
    bb.array()
  }

  /** First JPEG `COM` (0xFFFE) comment segment as UTF-8 text — the
    * marker walk of [[exifApp1Region]]; null when none appears before
    * entropy-coded data.
    */
  private def jpegComment(b: Array[Byte]): String = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xFF) return null
      val mk = b(i + 1) & 0xff
      if (mk == 0xFF) i += 1
      else if (mk == 0x01 || (mk >= 0xD0 && mk <= 0xD9)) i += 2
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || mk == 0xDA) return null // SOS
        if (mk == 0xFE && len > 2 && i + 2 + len <= b.length) {
          val raw = new String(b, i + 4, len - 2,
            java.nio.charset.StandardCharsets.UTF_8)
          val nul = raw.indexOf(0.toChar)
          val t = if (nul >= 0) raw.substring(0, nul) else raw
          return if (t.isEmpty) null else t
        }
        i += 2 + len
      }
    }
    null
  }

  /** First GIF Comment Extension (0x21 0xFE) as UTF-8 text —
    * [[gifAnimationInfo]]'s block walk, concatenating the comment's
    * sub-blocks (capped at 64 KiB — a hostile chain can't buffer
    * unbounded text); null when none.
    */
  private def gifComment(b: Array[Byte]): String = {
    if (b == null || b.length < 14 ||
      !(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')) return null
    var i = 6
    val packed = b(i + 4) & 0xff
    i += 7 // logical screen descriptor
    if ((packed & 0x80) != 0) i += 3 << ((packed & 7) + 1) // global table
    val out = new java.io.ByteArrayOutputStream()
    def subBlocks(collect: Boolean): Boolean = { // false on truncation
      while (i < b.length && b(i) != 0) {
        val n = b(i) & 0xff
        if (collect && out.size < 65536 && i + 1 + n <= b.length)
          out.write(b, i + 1, n)
        i += 1 + n
      }
      if (i >= b.length) false else { i += 1; true }
    }
    var done = false
    var found = false
    while (!done && !found && i < b.length) {
      (b(i) & 0xff) match {
        case 0x2C => // image descriptor
          if (i + 10 > b.length) done = true
          else {
            val p = b(i + 9) & 0xff
            i += 10
            if ((p & 0x80) != 0) i += 3 << ((p & 7) + 1) // local table
            i += 1 // LZW minimum code size
            if (!subBlocks(collect = false)) done = true
          }
        case 0x21 => // extension block
          if (i + 2 > b.length) done = true
          else {
            val isCom = (b(i + 1) & 0xff) == 0xFE
            i += 2
            if (!subBlocks(collect = isCom)) done = true
            else if (isCom && out.size > 0) found = true
          }
        case _ => done = true // trailer / unknown: structure ends
      }
    }
    if (!found) null
    else {
      val t = new String(out.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8)
      if (t.isEmpty) null else t
    }
  }

  /** PNG textual chunks — `tEXt` (latin-1) and uncompressed `iTXt`
    * (UTF-8), delivered as (keyword, value) pairs in file order.
    * Compressed variants (`zTXt`, iTXt flag 1) are skipped, and every
    * chunk length is bounds-checked so a hostile length ends the walk.
    */
  private def pngTextInto(b: Array[Byte])(set: (String, String) => Unit): Unit = {
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    var i = 8
    var done = false
    while (!done && i + 12 <= b.length) {
      val len = u32(i)
      if (len < 0 || len > b.length - i - 12) done = true
      else {
        val typ = new String(b, i + 4, 4, "ISO-8859-1")
        val from = i + 8
        val until = from + len.toInt
        typ match {
          case "tEXt" =>
            var z = from
            while (z < until && b(z) != 0) z += 1
            if (z > from && z < until)
              set(new String(b, from, z - from, "ISO-8859-1"),
                new String(b, z + 1, until - z - 1, "ISO-8859-1"))
          case "iTXt" =>
            var z = from
            while (z < until && b(z) != 0) z += 1
            // keyword NUL flag method language NUL translated NUL text
            if (z > from && z + 3 < until && b(z + 1) == 0) { // uncompressed only
              val kw = new String(b, from, z - from, "ISO-8859-1")
              var p = z + 3
              var nuls = 0
              while (p < until && nuls < 2) {
                if (b(p) == 0) nuls += 1
                p += 1
              }
              if (nuls == 2)
                set(kw, new String(b, p, until - p,
                  java.nio.charset.StandardCharsets.UTF_8))
            }
          case "IEND" => done = true
          case _ => ()
        }
        i = until + 4
      }
    }
  }

  /** The XMP packet of a JPEG — the APP1 segment whose payload leads
    * with the `http://ns.adobe.com/xap/1.0/` namespace NUL-terminated
    * string (Adobe XMP spec part 3). Capped at 1 MiB; null when none.
    */
  private def jpegXmpPacket(b: Array[Byte]): String = {
    val ns = "http://ns.adobe.com/xap/1.0/"
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xFF) return null
      val mk = b(i + 1) & 0xff
      if (mk == 0xFF) i += 1
      else if (mk == 0x01 || (mk >= 0xD0 && mk <= 0xD9)) i += 2
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || mk == 0xDA) return null // SOS
        if (mk == 0xE1 && i + 2 + len <= b.length &&
          len >= 2 + ns.length + 1 &&
          new String(b, i + 4, ns.length, "ISO-8859-1") == ns &&
          b(i + 4 + ns.length) == 0) {
          val from = i + 4 + ns.length + 1
          val n = math.min(i + 2 + len - from, 1 << 20)
          return new String(b, from, n, java.nio.charset.StandardCharsets.UTF_8)
        }
        i += 2 + len
      }
    }
    null
  }

  /** One property's x-default text from an XMP packet — finds the
    * property name, then the first `<rdf:li` item's element text
    * (the rdf:Alt form dc:title/dc:description use), entity-unescaped.
    * A bounded string scan, not an XML parser: hostile packets can't
    * recurse or expand entities; malformed ones return null.
    */
  private[graft] def xmpProperty(xml: String, prop: String): String = {
    if (xml == null) return null
    val at = xml.indexOf("<" + prop)
    if (at < 0) return null
    val endScope = xml.indexOf("</" + prop, at)
    val scopeEnd = if (endScope < 0) math.min(xml.length, at + 65536) else endScope
    val li = xml.indexOf("<rdf:li", at)
    if (li < 0 || li >= scopeEnd) return null
    val gt = xml.indexOf('>', li)
    if (gt < 0 || gt >= scopeEnd) return null
    val lt = xml.indexOf('<', gt + 1)
    if (lt < 0 || lt > scopeEnd) return null
    val raw = xml.substring(gt + 1, lt)
    val t = xmlUnescape(raw).trim
    if (t.isEmpty) null else t
  }

  /** Decode the five predefined XML entities (+ the numeric
    * apostrophe) — `&amp;` LAST so `&amp;lt;` round-trips as the
    * literal text `&lt;`. Shared by the XMP reader and the TTML
    * paragraph text (both sidecar and muxed `stpp`).
    */
  private def xmlUnescape(raw: String): String =
    raw.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&#39;", "'").replace("&amp;", "&")

  /** Declared image text for one asset ([[ImageTextSchema]]'s
    * fields): PNG `tEXt`/`iTXt` Title/Description/Comment keywords
    * (case-sensitive per the PNG spec's registered keywords, first
    * occurrence wins), a JPEG's first `COM` segment, a GIF's comment
    * extension, the EXIF ImageDescription tag (0x010E) for EVERY
    * carrier [[exifTiffRegion]] locates (JPEG APP1, WebP `EXIF`,
    * TIFF itself, HEIF item, PNG `eXIf`), and — the Adobe-ecosystem
    * caption carrier — XMP `dc:title`/`dc:description` from a JPEG
    * APP1 XMP packet or a PNG `XML:com.adobe.xmp` iTXt chunk.
    * Precedence per field: container-native text, then EXIF, then
    * XMP. None when the bytes aren't an image container or carry no
    * text at all.
    */
  private[graft] def imageTextFacts(b: Array[Byte]): Option[(String, String, String, String)] = try {
    if (b == null || b.length < 12) return None
    var title: String = null
    var description: String = null
    var comment: String = null
    var xmp: String = null
    val isPng = b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    val isJpeg = b(0) == 0xFF.toByte && b(1) == 0xD8.toByte
    val isGif = b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
    val isWebp = b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'
    val fmt =
      if (isPng) "png"
      else if (isJpeg) "jpeg"
      else if (isGif) "gif"
      else if (isTiffMagic(b)) "tiff"
      else if (isWebp) "webp"
      else if (isHeifMagic(b)) "heif"
      else return None
    if (isPng) pngTextInto(b) { (kw, v) =>
      if (v.nonEmpty) kw match {
        case "Title" if title == null => title = v
        case "Description" if description == null => description = v
        case "Comment" if comment == null => comment = v
        case "XML:com.adobe.xmp" if xmp == null => xmp = v
        case _ => ()
      }
    }
    else if (isJpeg) { comment = jpegComment(b); xmp = jpegXmpPacket(b) }
    else if (isGif) comment = gifComment(b)
    if (description == null) {
      val r = exifTiffRegion(b)
      if (r >= 0)
        description =
          tiffAsciiTag(b, (r >>> 32).toInt, (r & 0xffffffffL).toInt, 0x010E)
    }
    if (title == null) title = xmpProperty(xmp, "dc:title")
    if (description == null) description = xmpProperty(xmp, "dc:description")
    if (title == null && description == null && comment == null) None
    else Some((title, description, comment, fmt))
  } catch { case _: Throwable => None } // per-row isolation

  /** Append an `itext` struct ([[ImageTextSchema]]) per row — the
    * declared text of each image: [[audioTags]]' batching/isolation
    * discipline, all-null struct for untexted or non-image rows.
    * Map-only; at corpus scale the description column feeds straight
    * into the TEXT pipeline (language-ID, quality gates, dedup) to
    * mine image-caption training pairs from a crawl.
    */
  def imageTags(df: DataFrame, contentCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("itext", ImageTextSchema))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          val itext = imageTextFacts(bytes) match {
            case Some((t, d, c, fmt)) => Row(t, d, c, fmt)
            case None => Row(null, null, null, null)
          }
          Row.fromSeq(row.toSeq :+ itext)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** One parsed subtitle cue ([[subtitleCues]]). */
  /** One timed text cue. `speaker` is the WebVTT voice-span name
    * (`<v Ayana>…` — the de-facto speaker-attribution standard a
    * diarization/dialog-pair pipeline keys on), null everywhere the
    * format carries none; [[formatVtt]] re-emits it so the VTT round
    * trip preserves attribution.
    */
  final case class SubCue(idx: Int, startMs: Long, endMs: Long,
      text: String, speaker: String = null)

  // compiled once — these run per text-candidate row in a corpus
  // scan (the AssStampPat/TtmlParaPat idiom)
  private val SubStampPat = java.util.regex.Pattern.compile(
    "(?:(\\d+):)?(\\d{1,2}):(\\d{1,2})[.,](\\d{1,3})")

  /** A matched [[SubStampPat]] → ms (hours optional; the fraction
    * scales by its LENGTH: 1 digit = tenths, 2 = hundredths,
    * 3 = ms) — the ONE stamp conversion for SRT/VTT/SBV.
    */
  private def stampMs(m: java.util.regex.Matcher): Long = {
    val h = if (m.group(1) == null) 0L else m.group(1).toLong
    val frac = m.group(4)
    val mmm = frac.toLong * (frac.length match {
      case 1 => 100L
      case 2 => 10L
      case _ => 1L
    })
    ((h * 60 + m.group(2).toLong) * 60 + m.group(3).toLong) * 1000 + mmm
  }
  private val VttMpegTsPat = java.util.regex.Pattern.compile(
    "MPEGTS:(\\d+)")
  private val VttLocalPat = java.util.regex.Pattern.compile(
    "LOCAL:([0-9:.,]+)")
  // minutes up to 4 digits: formatLrc writes whole minutes, and a
  // 17-hour audiobook is [1000:00.000]+ — the round trip must hold
  private val LrcTagPat = java.util.regex.Pattern.compile(
    "\\G\\[(\\d{1,4}):(\\d{1,2})(?:[.:](\\d{1,3}))?\\]")

  /** Parse an SRT or WebVTT subtitle file into timed cues — the
    * video-text pairing surface: a crawl's .srt/.vtt sidecars are the
    * transcripts that turn videos into (clip, text) training pairs.
    * Format detected by the `WEBVTT` header, else SRT by the `-->`
    * arrow. Timestamps `HH:MM:SS,mmm` (SRT) or `[HH:]MM:SS.mmm`
    * (WebVTT) — either separator tolerated in both; cue settings
    * after the end stamp ignored; NOTE/STYLE blocks and bare index
    * lines skipped (no arrow); multi-line cue text joined with
    * newlines; `<i>`/`<c.x>`-style markup stripped; cue count capped
    * at 100k per file. None for text with no parseable cue.
    */
  private[graft] def parseSubtitles(s: String): Option[(String, Seq[SubCue])] = try {
    if (s == null || s.isEmpty) return None
    val t0 = if (s.charAt(0) == '﻿') s.substring(1) else s
    val t = t0.replace("\r\n", "\n").replace('\r', '\n')
    val isVtt = t.startsWith("WEBVTT")
    if (!isVtt && !t.contains("-->")) return None
    val lines = t.split('\n')
    val stamp = SubStampPat
    def ms(m: java.util.regex.Matcher): Long = stampMs(m)
    def stripMarkup(x: String): String = stripVttMarkup(x)
    // HLS segment VTT: the header's X-TIMESTAMP-MAP anchors LOCAL cue
    // time to the MPEG-TS 90 kHz clock — cue times shift by the
    // difference (the sidecar twin of the MP4 elst offset). The line
    // lives in the header block, before the first cue arrow.
    var tsOffsetMs = 0L
    if (isVtt) {
      var h = 0
      while (h < lines.length && lines(h).indexOf("-->") < 0) {
        val ln = lines(h)
        if (ln.startsWith("X-TIMESTAMP-MAP=")) {
          val mt = VttMpegTsPat.matcher(ln)
          val ml = VttLocalPat.matcher(ln)
          if (mt.find() && ml.find()) {
            val lm = stamp.matcher(ml.group(1))
            if (lm.find()) tsOffsetMs = mt.group(1).toLong / 90L - ms(lm)
          }
          h = lines.length
        } else h += 1
      }
    }
    val cues = Seq.newBuilder[SubCue]
    var i = 0
    var idx = 0
    while (i < lines.length && idx < 100000) {
      val ln = lines(i)
      val arrow = ln.indexOf("-->")
      if (arrow >= 0) {
        val m1 = stamp.matcher(ln.substring(0, arrow))
        val m2 = stamp.matcher(ln.substring(arrow + 3))
        if (m1.find() && m2.find()) {
          val st = ms(m1) + tsOffsetMs
          val en = ms(m2) + tsOffsetMs
          val sb = new java.lang.StringBuilder
          i += 1
          // the VTT voice span on the cue's FIRST line names the
          // speaker — captured BEFORE the markup strip erases it
          val speaker =
            if (isVtt && i < lines.length) voiceSpanName(lines(i)) else null
          while (i < lines.length && lines(i).trim.nonEmpty) {
            if (sb.length > 0) sb.append('\n')
            sb.append(lines(i))
            i += 1
          }
          val text = stripMarkup(sb.toString).trim
          if (st >= 0 && en >= st && text.nonEmpty) {
            idx += 1
            cues += SubCue(idx, st, en, text, speaker)
          }
        } else i += 1
      } else i += 1
    }
    val got = cues.result()
    if (got.isEmpty) None else Some(((if (isVtt) "vtt" else "srt"), got))
  } catch { case _: Throwable => None } // per-row isolation

  /** Remove `<...>` spans (voice, class, timestamp, formatting tags)
    * from a VTT/SRT cue payload — ONE stripper shared by the sidecar
    * parser and the muxed wvtt sample decoder, so the two carriers
    * can never disagree on extracted text.
    */
  private def stripVttMarkup(x: String): String = {
    val sb = new java.lang.StringBuilder(x.length)
    var i = 0
    var in = false
    while (i < x.length) {
      val c = x.charAt(i)
      if (c == '<') in = true
      else if (c == '>' && in) in = false
      else if (!in) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** The speaker of a WebVTT voice span OPENING a cue line —
    * `<v Ayana>` / `<v.loud Ayana>` (classes ride the tag name;
    * everything after the first space up to `>` is the name). Null
    * for any other shape.
    */
  private def voiceSpanName(line: String): String = {
    if (line == null || line.length < 5 || !line.startsWith("<v")) return null
    val c = line.charAt(2)
    if (c != ' ' && c != '.') return null
    val gt = line.indexOf('>')
    if (gt < 0) return null
    val sp = line.indexOf(' ')
    if (sp < 0 || sp > gt) return null
    val name = line.substring(sp + 1, gt).trim
    if (name.isEmpty) null else name
  }

  /** LRC timed lyrics — `[mm:ss.xx]line` (several timestamps may
    * prefix one line: the lyric repeats at each), the lyrics-sidecar
    * convention of audio corpora. Metadata tags (`[ar:...]`,
    * `[ti:...]` — non-numeric) are skipped; cues sort by time and
    * each ends at the NEXT cue's start (the format carries no end;
    * the last cue is zero-length). The fraction scales by length
    * (1 digit = tenths, 2 = hundredths, 3 = ms — enhanced LRC); a
    * bare `[mm:ss]` is whole-second. None for text with no timed
    * line.
    */
  private[graft] def parseLrc(s: String): Option[Seq[SubCue]] = try {
    if (s == null || s.isEmpty || s.indexOf('[') < 0) return None
    val t = s.replace("\r\n", "\n").replace('\r', '\n')
    val tag = LrcTagPat
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    t.split('\n').foreach { line =>
      val m = tag.matcher(line)
      val stamps = scala.collection.mutable.ArrayBuffer.empty[Long]
      var last = 0
      while (m.find()) {
        val frac = m.group(3)
        // fraction scales by its LENGTH (parseSubtitles' rule):
        // 1 digit = tenths, 2 = hundredths, 3 = ms — enhanced LRC
        // writes [00:12.345] and dropping it would silently lose lines
        val fracMs =
          if (frac == null) 0L
          else frac.toLong * (frac.length match {
            case 1 => 100L
            case 2 => 10L
            case _ => 1L
          })
        stamps += (m.group(1).toLong * 60 + m.group(2).toLong) * 1000 + fracMs
        last = m.end()
      }
      if (stamps.nonEmpty && raw.size < 100000) {
        val text = line.substring(last).trim
        if (text.nonEmpty) stamps.foreach(ms => raw += ((ms, text)))
      }
    }
    if (raw.isEmpty) None
    else {
      val sorted = raw.sortBy(_._1).toSeq
      Some(sorted.zipWithIndex.map { case ((ms, text), k) =>
        val end = if (k + 1 < sorted.length) sorted(k + 1)._1 else ms
        SubCue(k + 1, ms, end, text)
      })
    }
  } catch { case _: Throwable => None } // per-row isolation

  /** ASS/SSA subtitle sidecars — the fansub/anime share of a crawl:
    * an `[Events]` section whose `Dialogue:` lines carry
    * `h:mm:ss.cc` start/end (centiseconds) and the cue text in the
    * positions the section's `Format:` line DECLARES (SSA v4 exports
    * and several tool variants reorder or extend the default
    * Layer..Text order; the split caps at the declared field count,
    * so commas INSIDE a trailing Text field survive). Without a
    * `Format:` line the v4.00+ default (10 fields, Start=1, End=2,
    * Text=9) applies. `{\...}` override blocks are stripped,
    * `\N`/`\n` become newlines, `\h` a space. Events may be written
    * out of order; cues sort by start time. None for text without a
    * parseable Dialogue line.
    */
  private[graft] def parseAss(s: String): Option[Seq[SubCue]] = try {
    if (s == null || s.isEmpty) return None
    if (s.indexOf("[Events]") < 0 || s.indexOf("Dialogue:") < 0) return None
    val t = s.replace("\r\n", "\n").replace('\r', '\n')
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    // the v4.00+ default field order, used until (or without) an
    // [Events] Format: declaration
    var nFields = 10
    var startIdx = 1
    var endIdx = 2
    var textIdx = 9
    var inEvents = false
    t.split('\n').foreach { line0 =>
      val line = line0.trim
      if (line.startsWith("[")) inEvents = line.equalsIgnoreCase("[Events]")
      else if (inEvents && line.startsWith("Format:")) {
        val names = line.substring(7).split(",").map(_.trim)
        val si = names.indexWhere(_.equalsIgnoreCase("Start"))
        val ei = names.indexWhere(_.equalsIgnoreCase("End"))
        val ti = names.indexWhere(_.equalsIgnoreCase("Text"))
        if (si >= 0 && ei >= 0 && ti >= 0) {
          nFields = names.length; startIdx = si; endIdx = ei; textIdx = ti
        }
      } else if (line.startsWith("Dialogue:") && raw.size < 100000) {
        val parts = line.substring(9).split(",", nFields)
        if (parts.length == nFields) {
          val st = assTimeMs(parts(startIdx))
          val en = assTimeMs(parts(endIdx))
          val text = parts(textIdx)
            .replaceAll("\\{[^}]*\\}", "") // style override blocks
            .replace("\\N", "\n").replace("\\n", "\n").replace("\\h", " ")
            .trim
          if (st >= 0 && en >= st && text.nonEmpty) raw += ((st, en, text))
        }
      }
    }
    if (raw.isEmpty) None
    else Some(raw.sortBy(r => (r._1, r._2)).toSeq.zipWithIndex.map {
      case ((st, en, text), k) => SubCue(k + 1, st, en, text)
    })
  } catch { case _: Throwable => None } // per-row isolation

  private val AssStampPat = java.util.regex.Pattern.compile(
    "\\s*(\\d+):(\\d{1,2}):(\\d{1,2})[.:](\\d{1,3})\\s*")

  /** `h:mm:ss.cc` → ms. The fraction scales by LENGTH like
    * [[parseLrc]] and [[ttmlTimeMs]] (1 digit = tenths, 2 =
    * centiseconds — the ASS norm, 3 = ms for tool variants); -1 when
    * unparseable.
    */
  private def assTimeMs(s: String): Long = {
    val m = AssStampPat.matcher(s)
    if (!m.matches()) return -1L
    val frac = m.group(4)
    val mmm = frac.toLong * (frac.length match {
      case 1 => 100L
      case 2 => 10L
      case _ => 1L
    })
    ((m.group(1).toLong * 60 + m.group(2).toLong) * 60 +
      m.group(3).toLong) * 1000 + mmm
  }

  /** TTML/DFXP subtitle SIDECARS — the `.ttml`/`.dfxp` files a crawl
    * delivers next to the muxed `stpp` form [[mp4TextTracks]] decodes:
    * the same `<p>` paragraph walk (begin/end/dur in any attribute
    * order, [[ttmlParaTimes]]), over the whole document. The root
    * must be a `<tt>` element (namespace-prefixed accepted) — the
    * svgInfo root-tag discipline, so an HTML page that happens to
    * contain `<p begin=...>` is not a subtitle file. Unlike
    * SRT/VTT, TTML DECLARES its language: the root's `xml:lang`
    * (raw BCP-47 value; null when absent) rides along, so a TTML
    * sidecar feeds the declared-vs-detected gate like a muxed
    * track. Cues sort by start. None for non-TTML text or no timed
    * paragraph.
    */
  private[graft] def parseTtml(s: String): Option[(String, Seq[SubCue])] = try {
    if (s == null || s.isEmpty) return None
    val m0 = TtmlRootPat.matcher(s)
    if (!m0.find()) return None
    // the attribute slice comes from the ROOT match itself — a
    // '<tt' inside a pre-root comment must not steal the declaration
    val lang = {
      val attrs = m0.group(1)
      if (attrs == null) null
      else {
        val ml = TtmlLangPat.matcher(attrs)
        if (ml.find()) ml.group(1) else null
      }
    }
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val m = TtmlParaPat.matcher(s)
    while (m.find() && raw.size < 100000) {
      val (st, en) = ttmlParaTimes(m.group(1))
      val text = xmlUnescape(m.group(2).replaceAll("(?i)<br\\s*/?>", "\n")
        .replaceAll("<[^>]*>", "")).trim
      if (st >= 0 && en >= st && text.nonEmpty) raw += ((st, en, text))
    }
    if (raw.isEmpty) None
    else Some((lang, raw.sortBy(r => (r._1, r._2)).toSeq.zipWithIndex.map {
      case ((st, en, text), k) => SubCue(k + 1, st, en, text)
    }))
  } catch { case _: Throwable => None } // per-row isolation

  private val TtmlLangPat = java.util.regex.Pattern.compile(
    "xml:lang\\s*=\\s*[\"']([^\"']+)[\"']")

  // the document's ROOT element must be <tt> (optionally
  // namespace-prefixed): XML decl/comments/doctype may precede it,
  // but no other element may — the root-tag discipline svgInfo uses
  private val TtmlRootPat = java.util.regex.Pattern.compile(
    "(?s)\\A(?:\\s|<\\?[^>]*>|<!--.*?-->|<![^>]*>)*" +
      "<(?:[A-Za-z0-9_]+:)?tt(\\s[^>]*)?>")

  /** SBV (YouTube SubViewer) subtitle sidecars — the caption-export
    * format of the web's largest video host: blocks of
    * `H:MM:SS.mmm,H:MM:SS.mmm` (comma-separated start,end — no `-->`)
    * followed by text lines, blank-line separated. None for text
    * with no parseable block.
    */
  private[graft] def parseSbv(s: String): Option[Seq[SubCue]] = try {
    if (s == null || s.isEmpty) return None
    val t0 = if (s.charAt(0) == '﻿') s.substring(1) else s
    val t = t0.replace("\r\n", "\n").replace('\r', '\n')
    val lines = t.split('\n')
    val cues = Seq.newBuilder[SubCue]
    var i = 0
    var idx = 0
    while (i < lines.length && idx < 100000) {
      val m = SbvStampPat.matcher(lines(i).trim)
      if (m.matches()) {
        val m1 = SubStampPat.matcher(m.group(1))
        val m2 = SubStampPat.matcher(m.group(2))
        if (m1.find() && m2.find()) {
          val st = stampMs(m1)
          val en = stampMs(m2)
          val sb = new java.lang.StringBuilder
          i += 1
          while (i < lines.length && lines(i).trim.nonEmpty) {
            if (sb.length > 0) sb.append('\n')
            sb.append(lines(i))
            i += 1
          }
          val text = sb.toString.trim
          if (en >= st && text.nonEmpty) {
            idx += 1
            cues += SubCue(idx, st, en, text)
          }
        } else i += 1
      } else i += 1
    }
    val got = cues.result()
    if (got.isEmpty) None else Some(got)
  } catch { case _: Throwable => None } // per-row isolation

  private val SbvStampPat = java.util.regex.Pattern.compile(
    "(\\d+:\\d{1,2}:\\d{1,2}\\.\\d{1,3})\\s*,\\s*(\\d+:\\d{1,2}:\\d{1,2}\\.\\d{1,3})")

  /** Is this blob a KNOWN binary media/archive format? The cheap
    * gate before [[subtitleCues]] decodes a binary row to a String:
    * a corpus scan feeds it every unmatched blob, and decoding a
    * large JPEG/ZIP row to a transient 2x-size String just to
    * discover it is unparseable is per-row allocation at scale. The
    * gate is NEGATIVE on purpose — it skips only positively
    * identified binary magics, so a text sidecar of ANY size or
    * header shape (a typeset-heavy ASS with >8 KiB of styles, an LRC
    * with a long untimed preamble) still decodes exactly as before.
    */
  private[graft] def knownBinaryMagic(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 4) return false
    val b0 = b(0) & 0xff
    val b1 = b(1) & 0xff
    // JPEG (FF D8) / MP3-sync (FF Ex/Fx)
    if (b0 == 0xFF && (b1 == 0xD8 || (b1 & 0xE0) == 0xE0)) return true
    if (b0 == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') return true
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') return true
    if (b(0) == 'B' && b(1) == 'M') return true
    if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) return true
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') return true
    if (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') return true
    if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') return true
    if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S') return true
    if (b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F') return true
    if (b(0) == 'P' && b(1) == 'K' && (b(2) == 3 || b(2) == 5)) return true
    if (b0 == 0x1F && b1 == 0x8B) return true // gzip
    if (b(0) == 'B' && b(1) == 'Z' && b(2) == 'h') return true
    if (b0 == 0x28 && b1 == 0xB5 && (b(2) & 0xff) == 0x2F &&
      (b(3) & 0xff) == 0xFD) return true // zstd
    if (b0 == 0xFD && b(1) == '7' && b(2) == 'z') return true // xz
    // EBML / BMFF / ID3 never reach the text path (dispatched above),
    // but the gate is also used defensively
    if (b0 == 0x1A && b1 == 0x45 && (b(2) & 0xff) == 0xDF &&
      (b(3) & 0xff) == 0xA3) return true
    if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
      b(7) == 'p') return true
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') return true
    false
  }

  /** Explode a subtitle column into cue rows:
    * (id, sub_format, cue_idx, start_ms, end_ms, text) — O(cues)
    * output at the id grain, map-only (the flatMap twin of
    * [[imageTags]]); unparseable rows yield zero cues. Eight inputs
    * behind one dispatch: SRT / WebVTT (incl. HLS X-TIMESTAMP-MAP
    * segments) / ASS-SSA / TTML-DFXP / SBV / LRC sidecar FILES
    * (UTF-8 binary or string column) and — binary only — a
    * Matroska/WebM movie whose muxed S_TEXT track is extracted in
    * place ([[webmSubtitleCues]], sub_format = the EBML DocType), an
    * MP4/MOV whose muxed tx3g/wvtt/stpp track is
    * ([[mp4SubtitleCues]], sub_format = the sample-entry fourcc), or
    * an ID3-tagged audio stream whose SYLT synchronized lyrics are
    * timed cues too ([[id3SyltCues]], sub_format `sylt`).
    * Binary rows that are none of these pass a bounded-prefix
    * looks-like-text gate before any String decode. The text column
    * feeds the TEXT pipeline (lang-ID, quality, dedup,
    * decontamination) and the (start_ms, end_ms) intervals line up
    * with [[videoStats]] durations for clip-text pair cutting.
    * `declared_lang` is the container's OWN language assertion
    * ([[declaredTextLang]] — MP4 mdhd code, Matroska Language
    * element, SYLT language field; null for sidecars, which declare
    * nothing reliable), computed in the SAME scan so a pipeline can
    * gate on declared-vs-detected agreement without a second pass.
    */
  def subtitleCues(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idField = inSchema(inSchema.fieldIndex(idCol))
    val outSchema = StructType(Seq(idField,
      StructField("sub_format", StringType),
      StructField("cue_idx", IntegerType),
      StructField("start_ms", LongType),
      StructField("end_ms", LongType),
      StructField("text", StringType),
      StructField("declared_lang", StringType)))
    val idIdx = inSchema.fieldIndex(idCol)
    val contentIdx = inSchema.fieldIndex(contentCol)
    val isBinary = inSchema(contentIdx).dataType == BinaryType
    val rdd = df.rdd.flatMap { row =>
      textTracksOfRow(row, contentIdx, isBinary, allTracks = false)
        .flatMap { case (_, fmt, declared, cues) =>
          cues.map(c =>
            Row(row.get(idIdx), fmt, c.idx, c.startMs, c.endMs, c.text,
              declared))
        }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The per-row text-track dispatch behind [[subtitleCues]]
    * (`allTracks = false`: the first track with cues) and
    * [[subtitleCuesByTrack]] (`allTracks = true`: every one) —
    * (track_idx 1-based over emitted tracks, format, declared
    * language, cues). Muxed sources come from ONE walk of the
    * container per row; sidecars and SYLT are inherently
    * single-track.
    */
  /** Muxed text/image-sub tracks of a binary container — the ONE
    * container dispatch (Matroska/WebM, ISO-BMFF, ID3 SYLT) shared by
    * [[textTracksOfRow]]'s per-row surfaces and the card's
    * [[dialogCoverageOf]] kernel, so the card can never disagree with
    * [[dialogCoverage]] about what counts as a track.
    */
  private[graft] def muxedTextTracks(
      bytes: Array[Byte]): Option[Seq[(String, String, Seq[SubCue])]] =
    if (bytes != null && bytes.length >= 8 && bytes(0) == 0x1A.toByte &&
      bytes(1) == 0x45.toByte && bytes(2) == 0xDF.toByte &&
      bytes(3) == 0xA3.toByte)
      // ONE EBML walk: every track's cues ride the declared
      // language of the SAME track (no cross-stamping). EVERY
      // declared subtitle track rides through — PGS tracks with
      // null-text intervals, undecoded image codecs with zero
      // cues — so per-track surfaces agree with detection
      webmTextTracks(bytes).map { case (f, tracks) =>
        tracks.map { case (codecLabel, lang, cues) =>
          (if (codecLabel == null) f else codecLabel, lang, cues)
        }
      }.filter(_.nonEmpty)
    else if (bytes != null && bytes.length >= 16 && bytes(4) == 'f' &&
      bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p') {
      val (tracks, chapRefs) = mp4TextTracks(bytes)
      // every non-chapter text trak registers — a declaration-only
      // track (empty sample table) reports zero cues rather than
      // vanishing, so the per-track surfaces agree with
      // subtitleTrackCount's detection (the webmTextTracks rule)
      val subs = tracks.filter(t => !chapRefs.contains(t.id))
        .map(t => (t.codec, t.lang, t.cues))
      if (subs.isEmpty) None else Some(subs)
    }
    else if (bytes != null && bytes.length >= 10 && bytes(0) == 'I' &&
      bytes(1) == 'D' && bytes(2) == '3')
      // synced lyrics ARE cues; the SYLT frame names its language
      id3SyltCues(bytes).map(c =>
        Seq(("sylt", declaredTextLang(bytes), c)))
    else None

  /** Per-asset dialog coverage as a SCALAR — [[dialogCoverage]]'s
    * `coverage` column for the media card: UNION speech length of the
    * primary muxed track (first with cues) over the container's
    * declared duration, rounded to 4; null when the container
    * declares no positive duration (the fail-closed rule — an
    * mvhd-less stream asserts nothing). Byte-level and catch-to-null
    * so the card's projection stays a map-only codegen'd scan.
    */
  def dialogCoverageOf(b: Array[Byte]): java.lang.Double = try {
    if (b == null) return null
    val dur = containerDurationMs(b)
    if (dur == null || dur.longValue() <= 0) return null
    val cues = muxedTextTracks(b).getOrElse(Nil)
      .find(_._3.nonEmpty).map(_._3).getOrElse(Nil)
    java.lang.Double.valueOf(
      math.rint(cueUnionMs(cues).toDouble / dur.longValue() * 10000) / 10000)
  } catch { case _: Throwable => null } // per-row isolation

  /** [[dialogCoverageOf]] as a Column — codegen'd like
    * [[subtitleTrackCountCol]], so the card metric rides the same
    * map-only projection as the other per-row signals.
    */
  def dialogCoverageCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(DialogCoverageOf(expressionOf(content)))
  }

  case class DialogCoverageOf(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val r = dialogCoverageOf(v.asInstanceOf[Array[Byte]])
      if (r == null) null else r.doubleValue
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("dcov")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Double $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.dialogCoverageOf(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final double ${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): DialogCoverageOf = copy(c)
  }

  private def textTracksOfRow(row: Row, contentIdx: Int,
      isBinary: Boolean,
      allTracks: Boolean): Seq[(Int, String, String, Seq[SubCue])] = {
    val bytes =
      if (isBinary && !row.isNullAt(contentIdx))
        row.getAs[Array[Byte]](contentIdx)
      else null
    val muxed = muxedTextTracks(bytes)
    val parsed = muxed.orElse {
      if (isBinary && bytes != null && knownBinaryMagic(bytes)) None
      else {
        val raw =
          if (bytes == null && isBinary) null
          else if (isBinary) new String(bytes,
            java.nio.charset.StandardCharsets.UTF_8)
          else if (row.isNullAt(contentIdx)) null
          else row.getAs[String](contentIdx)
        parseSubtitles(raw).map { case (f, c) => Seq((f, null: String, c)) }
          .orElse(parseAss(raw).map(c => Seq(("ass", null: String, c))))
          .orElse(parseTtml(raw).map { case (lg, c) =>
            Seq(("ttml", lg, c)) })
          .orElse(parseSbv(raw).map(c => Seq(("sbv", null: String, c))))
          .orElse(parseLrc(raw).map(c => Seq(("lrc", null: String, c))))
      }
    }
    parsed match {
      case Some(tracks) =>
        // single-track surface = the first track with TEXT cues
        // (PGS intervals carry null text; declaration-only tracks
        // carry none) — the multi-track surface keeps every track
        val sel =
          if (allTracks) tracks
          else tracks.find(t => t._3.nonEmpty && t._3.head.text != null).toSeq
        sel.zipWithIndex.map { case ((fmt, lang, cues), k) =>
          (k + 1, fmt, lang, cues)
        }
      case None => Nil
    }
  }

  /** [[subtitleCues]] with EVERY muxed text track kept —
    * (id, track_idx, sub_format, cue_idx, start_ms, end_ms, text,
    * declared_lang, speaker): the multi-language mining surface
    * (`speaker` = the WebVTT voice-span name, null elsewhere). A
    * dubbed/fansubbed release carries parallel text in several
    * languages; per-track rows give a pairing pipeline each language
    * under its own container declaration (and the cross-language
    * ALIGNMENT signal: parallel cue intervals of the same movie are
    * translation pairs). track_idx is 1-based in declaration order
    * over the emitted tracks; sidecar files and SYLT are track 1.
    * Same one-walk, map-only, per-row-isolated discipline as
    * [[subtitleCues]].
    */
  def subtitleCuesByTrack(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idField = inSchema(inSchema.fieldIndex(idCol))
    val outSchema = StructType(Seq(idField,
      StructField("track_idx", IntegerType),
      StructField("sub_format", StringType),
      StructField("cue_idx", IntegerType),
      StructField("start_ms", LongType),
      StructField("end_ms", LongType),
      StructField("text", StringType),
      StructField("declared_lang", StringType),
      StructField("speaker", StringType)))
    val idIdx = inSchema.fieldIndex(idCol)
    val contentIdx = inSchema.fieldIndex(contentCol)
    val isBinary = inSchema(contentIdx).dataType == BinaryType
    val rdd = df.rdd.flatMap { row =>
      textTracksOfRow(row, contentIdx, isBinary, allTracks = true)
        .flatMap { case (trk, fmt, declared, cues) =>
          cues.map(c =>
            Row(row.get(idIdx), trk, fmt, c.idx, c.startMs, c.endMs,
              c.text, declared, c.speaker))
        }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Translation pairs from multi-track subtitles — the parallel-
    * corpus miner over [[subtitleCuesByTrack]]: a dubbed/fansubbed
    * release muxes the SAME dialog in several languages, and two
    * cues of different tracks whose intervals overlap are, with high
    * probability, translations of each other. For every track pair
    * (i < j) of one asset, emits
    * (id, lang_a, lang_b, start_ms, text_a, text_b, overlap_ms)
    * for cue pairs whose temporal overlap covers at least
    * `minOverlapFrac` of the SHORTER cue (dubbing shifts timings a
    * little; 0.5 keeps aligned dialog and drops neighbors). Pairs
    * whose tracks DECLARE the same language are dropped by default
    * (`crossLingualOnly`): a regular + SDH/forced track of one
    * language overlaps heavily and is not a translation — set false
    * to mine same-language alignment instead. The gate compares
    * DECLARATIONS only, so a null-declared track (sidecar SRT/ASS
    * tracks assert nothing) always pairs with a declared one —
    * unknown is not provably same — and an undeclared same-language
    * SDH sidecar passes; gate on detected cue language
    * ([[graft.operators.Curation]] lang-ID over `text_a`/`text_b`)
    * when sidecar provenance is untrusted.
    *
    * Scale shape: cue extraction is the one map-only container scan
    * (materialized once — the self-join must not decode every movie
    * twice); the pair join is an equi-join on (asset id, time
    * bucket), so both sides shuffle ONCE on the same key and cue
    * pairing is local to the asset's partition — no cross-asset
    * comparison at any corpus size. The time-bucket band (the
    * [[Scale.rangeJoin]] decomposition: each cue joins in every
    * `bucketMs`-wide bucket its interval touches, and a pair is kept
    * only in the bucket its overlap STARTS in, so nothing emits
    * twice) keeps per-asset pairing near-linear in cue count — the
    * raw id-only join is |cues_a|×|cues_b| per asset, which a
    * crafted 100k-cue-per-track file (the walker cap) turns into a
    * 10^10-pair straggler task. Hostile ceiling: a single cue longer
    * than 1440 buckets (24 h at the default minute bucket) pairs
    * only within its first 1440 — the spanning-cue clamp that keeps
    * a forged end_ms from exploding the band index (the 64-track /
    * 100k-cue cap discipline; no real cue is a day long).
    */
  def translationPairs(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content",
      minOverlapFrac: Double = 0.5,
      crossLingualOnly: Boolean = true,
      bucketMs: Long = 60000L): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val cues = subtitleCuesByTrack(df, idCol, contentCol)
      .localCheckpoint(false)
    def buck(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c / lit(bucketMs)).cast("long")
    def banded(side: String): DataFrame =
      cues.select(col(idCol), col("track_idx").as(s"trk_$side"),
        col("declared_lang").as(s"lang_$side"),
        col("start_ms").as(s"start_$side"),
        col("end_ms").as(s"end_$side"), col("text").as(s"text_$side"))
        .withColumn("__tb", explode(sequence(
          buck(col(s"start_$side")),
          least(greatest(buck(col(s"end_$side")), buck(col(s"start_$side"))),
            buck(col(s"start_$side")) + lit(1440L)))))
    val overlap = least(col("end_a"), col("end_b")) -
      greatest(col("start_a"), col("start_b"))
    val shorter = least(col("end_a") - col("start_a"),
      col("end_b") - col("start_b"))
    val langGate =
      if (crossLingualOnly) !(col("lang_a") <=> col("lang_b"))
      else lit(true)
    banded("a").join(banded("b"), Seq(idCol, "__tb"))
      .filter(col("trk_a") < col("trk_b") && langGate &&
        overlap >= lit(minOverlapFrac) * shorter && overlap > 0 &&
        // dedup: the overlap starts at the later cue's start, a
        // bucket BOTH exploded interval spans contain — keep the
        // pair there and nowhere else
        buck(greatest(col("start_a"), col("start_b"))) === col("__tb"))
      .select(col(idCol), col("lang_a"), col("lang_b"),
        col("start_a").as("start_ms"), col("text_a"), col("text_b"),
        overlap.as("overlap_ms"))
  }

  /** Chapter-aligned transcript segments — the audiobook/podcast
    * (chapter, text) pairing: every subtitle/lyrics cue of an asset
    * is assigned to the chapter whose interval contains its START
    * (the broadcast convention — a cue straddling a boundary belongs
    * to the chapter it begins in; a zero-length final chapter claims
    * everything from its start on). Emits one row per chapter with
    * the cue texts joined in time order — the segmentation a
    * narration-alignment pipeline trains on.
    *
    * Scale shape: two map-only container scans (chapters + cues) on
    * the same input, one equi-join on the asset id, one aggregation —
    * per-asset work is local after a single co-partitioning shuffle.
    */
  def chapterAlignedCues(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    // a ZERO-LENGTH chapter (point markers — end == start, the common
    // CHAP writer convention; also the next-start rule's last
    // chapter) claims [start, next chapter's start) — computed with
    // a per-asset lead window so a mid-list marker cannot claim the
    // whole tail and double-assign cues across chapters
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("chap_start"), col("chap_idx"))
    val chaps = mediaChapters(df, idCol, contentCol)
      .select(col(idCol), col("chap_idx"), col("start_ms").as("chap_start"),
        col("end_ms").as("chap_end"), col("title"))
      .withColumn("__eff_end",
        when(col("chap_end") > col("chap_start"), col("chap_end"))
          .otherwise(coalesce(lead(col("chap_start"), 1).over(w),
            lit(Long.MaxValue))))
    val cues = subtitleCues(df, idCol, contentCol)
      .select(col(idCol), col("cue_idx"), col("start_ms"), col("text"))
    chaps.join(cues, Seq(idCol))
      .filter(col("start_ms") >= col("chap_start") &&
        col("start_ms") < col("__eff_end"))
      .groupBy(col(idCol), col("chap_idx"), col("title"))
      .agg(count(lit(1)).as("n_cues"),
        min(col("start_ms")).as("first_cue_ms"),
        // collect_list order is nondeterministic under retries:
        // sort by (start, cue_idx) INSIDE the aggregate, then strip
        // to the text field — the joined transcript is reproducible
        array_join(transform(
          sort_array(collect_list(struct(col("start_ms"), col("cue_idx"),
            col("text")))),
          x => x.getField("text")), "\n").as("text"))
  }

  /** Declared duration of a media container in ms — BMFF `mvhd`
    * (all-ones = the spec's unknown sentinel → null) or Matroska
    * `Info` Duration; null for anything else. The denominator of
    * [[dialogCoverage]].
    */
  private[graft] def containerDurationMs(b: Array[Byte]): java.lang.Long = try {
    if (b == null || b.length < 16) return null
    if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') {
      val row = decodeMp4(b)
      // decodeMp4's meta Row is schemaless: positional access only
      // (the q183 discipline) — durationMs is field 5
      return if (row.isNullAt(5)) null
      else java.lang.Long.valueOf(row.getLong(5))
    }
    if (b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
      b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)
      return webmInfo(b).flatMap(i => Option(i.durationMs)).orNull
    null
  } catch { case _: Throwable => null } // per-row isolation

  /** Dialog coverage report — the clip-mining QUALITY GATE: one row
    * per input asset with
    * (id, duration_ms, n_tracks, n_cues, speech_ms, coverage):
    * `speech_ms` is the UNION length of the primary text track's cue
    * intervals (overlapping/duplicate cues count once — karaoke
    * repeats and stacked positioning cues don't inflate it),
    * `duration_ms` the container's declared duration (null for
    * sidecars/undecodable), `coverage` their ratio rounded to 4
    * (null without a duration). A pair-mining pipeline gates on it
    * ("mine only videos whose dialog covers >= X%" — silent footage
    * and credit-roll-only subs waste the cutting budget). Map-only:
    * one cue walk plus one header-only duration read per row (the
    * duration is a top-level box/element scan, cheap next to the
    * sample-table decode), no joins, no shuffles beyond the
    * caller's.
    */
  def dialogCoverage(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idField = inSchema(inSchema.fieldIndex(idCol))
    val outSchema = StructType(Seq(idField,
      StructField("duration_ms", LongType),
      StructField("n_tracks", IntegerType),
      StructField("n_cues", IntegerType),
      StructField("speech_ms", LongType),
      StructField("coverage", DoubleType)))
    val idIdx = inSchema.fieldIndex(idCol)
    val contentIdx = inSchema.fieldIndex(contentCol)
    val isBinary = inSchema(contentIdx).dataType == BinaryType
    val rdd = df.rdd.map { row =>
      val tracks = textTracksOfRow(row, contentIdx, isBinary,
        allTracks = true)
      // primary = the first track that CARRIES cues (text or PGS
      // intervals) — a declaration-only image track still counts in
      // n_tracks but cannot be the speech source
      val cues = tracks.find(_._4.nonEmpty).map(_._4).getOrElse(Nil)
      val speech = cueUnionMs(cues)
      val dur: java.lang.Long =
        if (isBinary && !row.isNullAt(contentIdx))
          containerDurationMs(row.getAs[Array[Byte]](contentIdx))
        else null
      val coverage: java.lang.Double =
        if (dur == null || dur.longValue() <= 0) null
        else java.lang.Double.valueOf(
          math.rint(speech.toDouble / dur.longValue() * 10000) / 10000)
      Row(row.get(idIdx), dur, Integer.valueOf(tracks.length),
        Integer.valueOf(cues.length), speech,
        coverage)
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** UNION length of cue intervals in ms — overlapping/duplicate
    * cues count once (karaoke repeats and stacked positioning cues
    * don't inflate it): sort by start, sweep — O(cues log cues),
    * cue-capped upstream. The one speech-length kernel behind
    * [[dialogCoverage]], [[dialogCoverageByTrack]] and the card's
    * `avg_dialog_coverage`, so the three can never disagree.
    */
  private[graft] def cueUnionMs(cues: Seq[SubCue]): Long = {
    var speech = 0L
    var curS = Long.MinValue
    var curE = Long.MinValue
    cues.sortBy(c => (c.startMs, c.endMs)).foreach { c =>
      if (c.startMs > curE) {
        if (curE > curS) speech += curE - curS
        curS = c.startMs; curE = c.endMs
      } else if (c.endMs > curE) curE = c.endMs
    }
    if (curE > curS) speech += curE - curS
    speech
  }

  /** [[dialogCoverage]] per TRACK — the gate a bilingual clip miner
    * actually filters on: a dubbed release's coverage is
    * per-language, and "mine eng+fre pairs where BOTH tracks cover
    * >= X%" needs each track's own ratio, not the primary's. One row
    * per declared text/image-sub track:
    * (id, track_idx, sub_format, declared_lang, duration_ms, n_cues,
    * speech_ms, coverage) — declaration-only tracks (undecoded image
    * codecs) report zero cues and zero coverage rather than
    * vanishing, the [[webmTextTracks]] honesty rule. Assets with no
    * tracks emit nothing (the per-asset [[dialogCoverage]] reports
    * those). Same map-only, per-row-isolated shape.
    */
  def dialogCoverageByTrack(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idField = inSchema(inSchema.fieldIndex(idCol))
    val outSchema = StructType(Seq(idField,
      StructField("track_idx", IntegerType),
      StructField("sub_format", StringType),
      StructField("declared_lang", StringType),
      StructField("duration_ms", LongType),
      StructField("n_cues", IntegerType),
      StructField("speech_ms", LongType),
      StructField("coverage", DoubleType)))
    val idIdx = inSchema.fieldIndex(idCol)
    val contentIdx = inSchema.fieldIndex(contentCol)
    val isBinary = inSchema(contentIdx).dataType == BinaryType
    val rdd = df.rdd.flatMap { row =>
      val tracks = textTracksOfRow(row, contentIdx, isBinary,
        allTracks = true)
      if (tracks.isEmpty) Nil
      else {
        val dur: java.lang.Long =
          if (isBinary && !row.isNullAt(contentIdx))
            containerDurationMs(row.getAs[Array[Byte]](contentIdx))
          else null
        tracks.map { case (trk, fmt, lang, cues) =>
          val speech = cueUnionMs(cues)
          val coverage: java.lang.Double =
            if (dur == null || dur.longValue() <= 0) null
            else java.lang.Double.valueOf(
              math.rint(speech.toDouble / dur.longValue() * 10000) / 10000)
          Row(row.get(idIdx), trk, fmt, lang, dur,
            Integer.valueOf(cues.length), speech, coverage)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Conversational turn pairs from speaker-attributed cues — the
    * instruction-tuning miner over [[subtitleCuesByTrack]]'s
    * `speaker` column (WebVTT `<v Name>` voice spans): consecutive
    * voiced cues of ONE speaker merge into a turn (text joined in
    * time order), and each adjacent turn pair with DIFFERENT speakers
    * whose gap (next start − previous end; negative = crosstalk) is
    * at most `maxGapMs` emits
    * (id, track_idx, turn_idx, speaker_a, text_a, speaker_b, text_b,
    * gap_ms) — the prompt/response adjacency a dialog model trains
    * on. Unvoiced cues (narration, SDH sound tags, plain tracks)
    * carry no attribution and are skipped; a long-silence scene cut
    * (> maxGapMs) breaks the exchange rather than pairing strangers.
    *
    * Scale shape: one map-only cue scan, then per-(asset, track)
    * PARTITIONED windows (lag for turn starts, running sum for turn
    * ids, lead for the next turn) and one groupBy — every shuffle
    * keys on the asset id, nothing crosses assets, no global window
    * anywhere. Turn text is assembled with `sort_array` INSIDE the
    * aggregate, so it is deterministic under any partitioning.
    */
  def dialogTurns(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content",
      maxGapMs: Long = 5000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cues = subtitleCuesByTrack(df, idCol, contentCol)
      .filter(col("speaker").isNotNull)
    val w = Window.partitionBy(col(idCol), col("track_idx"))
      .orderBy(col("start_ms"), col("cue_idx"))
    val turns = cues
      // a new turn on speaker change OR a silence longer than the
      // gap budget (a same-speaker line after a scene cut is a new
      // utterance, not a continuation — the split pair then fails
      // the different-speaker gate and never emits)
      .withColumn("__new",
        when(lag(col("speaker"), 1).over(w) <=> col("speaker") &&
          col("start_ms") - lag(col("end_ms"), 1).over(w) <=
            lit(maxGapMs), 0L)
          .otherwise(1L))
      .withColumn("turn_idx", sum(col("__new")).over(w))
      .groupBy(col(idCol), col("track_idx"), col("turn_idx"))
      .agg(min(col("speaker")).as("speaker"), // constant within a turn
        min(col("start_ms")).as("start_ms"),
        max(col("end_ms")).as("end_ms"),
        array_join(transform(sort_array(collect_list(struct(
          col("start_ms").as("s"), col("cue_idx").as("k"),
          col("text").as("t")))), x => x.getField("t")), " ").as("text"))
    val w2 = Window.partitionBy(col(idCol), col("track_idx"))
      .orderBy(col("turn_idx"))
    turns
      .withColumn("speaker_b", lead(col("speaker"), 1).over(w2))
      .withColumn("text_b", lead(col("text"), 1).over(w2))
      .withColumn("gap_ms", lead(col("start_ms"), 1).over(w2) - col("end_ms"))
      .filter(col("speaker_b").isNotNull &&
        col("speaker_b") =!= col("speaker") &&
        col("gap_ms") <= lit(maxGapMs))
      .select(col(idCol), col("track_idx"), col("turn_idx"),
        col("speaker").as("speaker_a"), col("text").as("text_a"),
        col("speaker_b"), col("text_b"), col("gap_ms"))
  }

  /** Per-speaker talk statistics — the diarization summary over
    * [[subtitleCuesByTrack]]'s voiced cues: one row per
    * (asset, track, speaker) with (n_cues, talk_ms, talk_share),
    * where `talk_ms` is the UNION length of the speaker's cue
    * intervals (stacked karaoke repeats count once — the
    * [[cueUnionMs]] rule, here as a gaps-and-islands program so the
    * whole computation stays in codegen'd windows) and `talk_share`
    * that speaker's fraction of the track's total voiced time. The
    * casting-balance gate a dialog miner filters on ("drop
    * monologue-heavy episodes").
    *
    * Scale shape: map-only cue scan, then ONLY per-(asset, track[,
    * speaker]) partitioned windows and one aggregate — shuffles key
    * on the asset id, nothing crosses assets.
    */
  def speakerStats(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cues = subtitleCuesByTrack(df, idCol, contentCol)
      .filter(col("speaker").isNotNull)
    // union length per speaker as gaps-and-islands: a cue starting
    // past every previous end opens a new island
    val w = Window.partitionBy(col(idCol), col("track_idx"), col("speaker"))
      .orderBy(col("start_ms"), col("end_ms"))
    val runMax = max(col("end_ms"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = cues
      .withColumn("__new",
        when(runMax.isNull || col("start_ms") > runMax, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(w))
    val perSpeaker = islands
      .groupBy(col(idCol), col("track_idx"), col("speaker"), col("__isl"))
      .agg(count(lit(1)).as("__n"),
        (max(col("end_ms")) - min(col("start_ms"))).as("__len"))
      .groupBy(col(idCol), col("track_idx"), col("speaker"))
      .agg(sum(col("__n")).as("n_cues"), sum(col("__len")).as("talk_ms"))
    val wt = Window.partitionBy(col(idCol), col("track_idx"))
    perSpeaker.withColumn("talk_share",
      round(col("talk_ms") / sum(col("talk_ms")).over(wt), 4))
  }

  /** Serialize cues back to an SRT file — the export half of
    * [[subtitleCues]] (a training-data shard ships its clip text as
    * sidecars): index, `HH:MM:SS,mmm --> HH:MM:SS,mmm`, text block.
    * `parseSubtitles(formatSrt(cues))` round-trips exactly
    * (spec-locked), so mined cue edits re-export losslessly.
    */
  private[graft] def formatSrt(cues: Seq[SubCue]): String = {
    def stamp(ms: Long): String = {
      val h = ms / 3600000
      val m = (ms % 3600000) / 60000
      val s = (ms % 60000) / 1000
      f"$h%02d:$m%02d:$s%02d,${ms % 1000}%03d"
    }
    cues.zipWithIndex.map { case (c, k) =>
      s"${k + 1}\n${stamp(c.startMs)} --> ${stamp(c.endMs)}\n${cueBody(c.text)}\n"
    }.mkString("\n")
  }

  /** [[formatSrt]]'s WebVTT twin (header + dot-separated stamps);
    * a cue's `speaker` re-emits as its opening voice span, so
    * attribution survives the round trip.
    */
  private[graft] def formatVtt(cues: Seq[SubCue]): String = {
    def stamp(ms: Long): String = {
      val h = ms / 3600000
      val m = (ms % 3600000) / 60000
      val s = (ms % 60000) / 1000
      f"$h%02d:$m%02d:$s%02d.${ms % 1000}%03d"
    }
    "WEBVTT\n\n" + cues.map { c =>
      val voice = if (c.speaker == null) "" else s"<v ${c.speaker}>"
      s"${stamp(c.startMs)} --> ${stamp(c.endMs)}\n$voice${cueBody(c.text)}\n"
    }.mkString("\n")
  }

  // a blank line inside cue text would TERMINATE the cue on reparse
  // (both formats end a cue block at the first empty line), silently
  // dropping the remainder — collapse runs of newlines so the
  // round-trip invariant holds for every SubCue input
  private def cueBody(text: String): String =
    if (text == null) "" else text.replaceAll("\n{2,}", "\n").trim

  /** Serialize cues as an LRC lyrics sidecar — [[formatSrt]]'s timed-
    * lyrics twin: `[mm:ss.mmm]line` (3-digit ms, which [[parseLrc]]
    * scales exactly). LRC carries STARTS only; the reparse derives
    * each end as the next cue's start (last zero-length), so the
    * round trip is exact for cues already in LRC shape — which is
    * what [[parseLrc]] and [[id3SyltCues]] emit. Newlines inside a
    * line become spaces (the format is line-per-lyric).
    */
  private[graft] def formatLrc(cues: Seq[SubCue]): String =
    cues.map { c =>
      val m = c.startMs / 60000
      val s = (c.startMs % 60000) / 1000
      f"[$m%02d:$s%02d.${c.startMs % 1000}%03d]" +
        cueBody(c.text).replace('\n', ' ')
    }.mkString("\n") + "\n"

  /** Serialize cues as an ASS events file — the fansub-sidecar
    * writer: a minimal `[Script Info]`/`[Events]` document whose
    * `Dialogue:` lines [[parseAss]] reads back. ASS stamps are
    * CENTISECOND precision (`h:mm:ss.cc`), so times round-trip
    * exactly only when ms % 10 == 0 — callers export at that grain
    * (sub-cs timing is below any fansub toolchain's resolution);
    * newlines become `\N` and come back as newlines.
    */
  private[graft] def formatAss(cues: Seq[SubCue]): String = {
    def stamp(ms: Long): String = {
      val h = ms / 3600000
      val m = (ms % 3600000) / 60000
      val s = (ms % 60000) / 1000
      f"$h%d:$m%02d:$s%02d.${ms % 1000 / 10}%02d"
    }
    "[Script Info]\nScriptType: v4.00+\n\n[Events]\n" +
      "Format: Layer, Start, End, Style, Name, MarginL, MarginR, " +
      "MarginV, Effect, Text\n" +
      cues.map(c =>
        s"Dialogue: 0,${stamp(c.startMs)},${stamp(c.endMs)},Default," +
          s",0,0,0,,${cueBody(c.text).replace("\n", "\\N")}").mkString("\n") +
      "\n"
  }

  /** Serialize cues as a TTML document — [[formatSrt]]'s XML twin
    * (the caption format broadcast/OTT toolchains exchange):
    * `<p begin end>` paragraphs on the clock grammar [[parseTtml]]
    * reads back exactly (ms precision); newlines become `<br/>`,
    * XML-significant characters are entity-escaped, and `lang`
    * (when given) is declared as the root's `xml:lang` — so the
    * declared-language surface round-trips too.
    */
  /** ms → `HH:MM:SS.mmm` — the TTML clock grammar, shared by the
    * [[formatTtml]] writer and the `stpp` fixture builder so the
    * two can never drift.
    */
  private[graft] def ttmlClock(ms: Long): String =
    f"${ms / 3600000}%02d:${ms % 3600000 / 60000}%02d:" +
      f"${ms % 60000 / 1000}%02d.${ms % 1000}%03d"

  private[graft] def formatTtml(cues: Seq[SubCue],
      lang: String = null): String = {
    def clock(ms: Long): String = ttmlClock(ms)
    def esc(t: String): String = t.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    val langAttr =
      if (lang == null) ""
      else s""" xml:lang="${esc(lang).replace("\"", "&quot;")}""""
    val body = cues.map { c =>
      val text = esc(cueBody(c.text)).replace("\n", "<br/>")
      s"""  <p begin="${clock(c.startMs)}" end="${clock(c.endMs)}">$text</p>"""
    }.mkString("\n")
    s"""<tt$langAttr xmlns="http://www.w3.org/ns/ttml">\n <body><div>\n""" +
      body + "\n </div></body>\n</tt>\n"
  }

  /** Serialize cues as an SBV file — [[formatSrt]]'s YouTube twin:
    * `H:MM:SS.mmm,H:MM:SS.mmm` block headers, blank-line separated;
    * [[parseSbv]] reads it back exactly.
    */
  private[graft] def formatSbv(cues: Seq[SubCue]): String = {
    def stamp(ms: Long): String =
      f"${ms / 3600000}%d:${ms % 3600000 / 60000}%02d:" +
        f"${ms % 60000 / 1000}%02d.${ms % 1000}%03d"
    cues.map(c =>
      s"${stamp(c.startMs)},${stamp(c.endMs)}\n${cueBody(c.text)}\n")
      .mkString("\n")
  }

  /** Resolve the stored raster to display orientation — the 8 EXIF
    * cases as direct pixel remaps (5-8 swap the axes).
    */
  private[graft] def applyExifOrientation(img: java.awt.image.BufferedImage,
      o: Int): java.awt.image.BufferedImage = {
    if (o <= 1 || o > 8) return img
    val w = img.getWidth
    val h = img.getHeight
    val swap = o >= 5
    val out = new java.awt.image.BufferedImage(
      if (swap) h else w, if (swap) w else h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y2 = 0
    while (y2 < out.getHeight) {
      var x2 = 0
      while (x2 < out.getWidth) {
        val (x, y) = o match {
          case 2 => (w - 1 - x2, y2)           // mirror horizontal
          case 3 => (w - 1 - x2, h - 1 - y2)   // rotate 180
          case 4 => (x2, h - 1 - y2)           // mirror vertical
          case 5 => (y2, x2)                   // transpose
          case 6 => (y2, h - 1 - x2)           // rotate 90 CW
          case 7 => (w - 1 - y2, h - 1 - x2)   // transverse
          case _ => (w - 1 - y2, x2)           // 8: rotate 90 CCW
        }
        out.setRGB(x2, y2, img.getRGB(x, y))
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** Deterministic pixel summary: mean R/G/B (0..1) plus a 4-bin
    * luminance histogram, computed over a stride-sampled grid capped
    * at ~1M pixels so a 100-megapixel asset costs the same as a
    * 1-megapixel one. Small images (anything under the cap) are
    * summarized EXACTLY — which is what lets a gate query restate the
    * stats as closed-form literals.
    */
  private[graft] def pixelSummary(img: java.awt.image.BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = math.max(1, math.ceil(math.sqrt(w.toDouble * h / 1048576.0)).toInt)
    var sr, sg, sb = 0.0
    val lumaHist = new Array[Double](4)
    var n = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        lumaHist(((r * 299 + g * 587 + b * 114) / 1000) >> 6) += 1
        n += 1
        x += stride
      }
      y += stride
    }
    Array(sr / n / 255.0, sg / n / 255.0, sb / n / 255.0,
      lumaHist(0) / n, lumaHist(1) / n, lumaHist(2) / n, lumaHist(3) / n)
  }

  /** 64-bit perceptual difference hash (dHash, Krawetz's "kind of like
    * that" scheme): block-average the raster to a 9×8 integer-luma
    * grid, emit bit `row*8 + col` = 1 when the cell to the RIGHT is
    * strictly brighter. Near-identical images (re-encodes, resizes,
    * mild quality loss) land within a few Hamming bits, which plugs
    * pixel content into the SAME banded-Hamming candidate machinery
    * text SimHash uses ([[Dedup.simhashNearDuplicatesFromSigs]]).
    *
    * Determinism is the contract: all-integer math (luma scaled
    * ×1000, averages compared by cross-multiplication — no float
    * rounding, no division), cell edges at `floor(i·dim/9)`, the same
    * stride-sampling cap as [[pixelSummary]] (≥9×8 images sample
    * every cell; the stride is a pure function of width×height). A
    * PNG's hash is therefore a closed form of its pixel function —
    * exact-oracle material — while JPEG twins get tolerance specs.
    * Null / non-decodable bytes → null (callers filter, mirroring
    * [[imageStats]]'s degrade-per-row rule).
    */
  def dhash64(bytes: Array[Byte]): java.lang.Long =
    // public (not private[graft]): the generated code calls this as a
    // JAVA STATIC — scalac only emits static forwarders for public
    // members, and without one janino can't resolve the call and the
    // whole stage silently falls back to interpreted eval
    decodePixels(bytes) match {
      case None => null
      case Some(img) => java.lang.Long.valueOf(dhashOf(img))
    }

  private[graft] def dhashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = math.max(1, math.ceil(math.sqrt(w.toDouble * h / 1048576.0)).toInt)
    val sums = new Array[Long](9 * 8) // summed ×1000 luma per grid cell
    val cnts = new Array[Long](9 * 8)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8
      val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9
        val x1 = math.max(x0 + 1, (cx + 1) * w / 9)
        var s = 0L
        var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114
            n += 1
            x += stride
          }
          y += stride
        }
        sums(cy * 9 + cx) = s
        cnts(cy * 9 + cx) = n
        cx += 1
      }
      cy += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      val row = k / 8
      val colL = row * 9 + (k % 8)
      // avg_right > avg_left without division: sR/nR > sL/nL ⇔
      // sR·nL > sL·nR (counts are positive; a stride-starved empty
      // cell — impossible at stride 1 — compares as not-brighter)
      if (cnts(colL) > 0 && cnts(colL + 1) > 0 &&
          sums(colL + 1) * cnts(colL) > sums(colL) * cnts(colL + 1))
        out |= (1L << k)
      k += 1
    }
    out
  }

  /** [[dhash64]] as a Column — a custom Catalyst expression whose
    * generated code is one static call into this object (top-level
    * object ⇒ Java static forwarder), so a signature scan stays inside
    * whole-stage codegen exactly like the text-hash kernels in
    * [[graft.functions.CatalystExpressions]]. It lives here rather
    * than there because the kernel IS the existing raster path
    * ([[decodePixels]] + EXIF normalization — an auto-oriented
    * re-upload of a rotated camera JPEG hashes identically to its
    * original).
    */
  def dhash64Col(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(DHash64(expressionOf(content)))
  }

  case class DHash64(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val h = dhash64(v.asInstanceOf[Array[Byte]])
      if (h == null) null else h.longValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("dhash")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Long $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.dhash64(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final long ${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): DHash64 = copy(c)
  }

  /** The PIXEL identity of a media asset, whatever its modality —
    * its own raster for images ([[dhash64]]), its embedded cover art
    * for tagged audio/video ([[embeddedArtBytes]] → dhash): the
    * cross-modal "same album, different rip" link key. An MP3, FLAC,
    * M4A or MKA carrying the release art hashes IDENTICALLY to the
    * crawled PNG/JPEG of that art, so one banded Hamming join links
    * the audio corpus to the image corpus ([[graft.operators.Dedup
    * .coverArtLinkCorpus]]). Null for rows with neither a decodable
    * raster nor art. Public for the generated-code static call.
    */
  def mediaLinkHash64(b: Array[Byte]): java.lang.Long = {
    if (b == null) return null
    try {
      embeddedArtBytes(b) match {
        case Some((_, art)) => dhash64(art)
        case None => dhash64(b)
      }
    } catch { case _: Throwable => null } // per-row isolation
  }

  /** [[mediaLinkHash64]] as a Column — codegen'd like [[dhash64Col]]. */
  def mediaLinkHash64Col(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(MediaLinkHash64(expressionOf(content)))
  }

  case class MediaLinkHash64(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val h = mediaLinkHash64(v.asInstanceOf[Array[Byte]])
      if (h == null) null else h.longValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("linkhash")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Long $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.mediaLinkHash64(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final long ${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): MediaLinkHash64 = copy(c)
  }

  /** Rendered-text ("textiness") score in [0,1] — the deterministic
    * kernel for the standard image-corpus card question "what share
    * of this crawl is screenshots/memes/rendered text?" (the OCR
    * transport in [[annotateImages]] answers WHAT the text says; this
    * answers IS IT text, with no model in the loop). Two signals that
    * separate glyph rasters from photographs:
    *
    *  - sharp-edge density: fraction of horizontally adjacent sampled
    *    pixels with integer-luma delta ≥ 48 (glyph strokes are step
    *    edges — antialiasing splits a step into ramps that still
    *    clear 48; photographic gradients don't);
    *  - luma bimodality: fraction of pixels at the tonal extremes
    *    (luma ≤ 64 or ≥ 192 — ink-or-paper polarization; photos
    *    concentrate mid-tones).
    *
    * score = round(min(1, 5·edge_ratio) · bimodal_ratio, 6) — the 5×
    * calibration says "one sharp edge per 5 horizontal pairs is fully
    * text-dense" (body text measures 10-25%). All-integer pixel math
    * with [[dhashOf]]'s stride rule, so a rendered PNG's score is a
    * CLOSED FORM of its pixel function (q79 oracle discipline). Null
    * for non-decodable bytes.
    */
  def textiness(bytes: Array[Byte]): java.lang.Double =
    // public: generated code calls this as a Java static (see dhash64)
    decodePixels(bytes) match {
      case None => null
      case Some(img) => java.lang.Double.valueOf(textinessOf(img))
    }

  private[graft] def textinessOf(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = math.max(1, math.ceil(math.sqrt(w.toDouble * h / 1048576.0)).toInt)
    var pixels = 0L
    var bimodal = 0L
    var pairs = 0L
    var edges = 0L
    var y = 0
    while (y < h) {
      var x = 0
      var prev = -1
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        pixels += 1
        if (luma <= 64 || luma >= 192) bimodal += 1
        if (prev >= 0) {
          pairs += 1
          if (math.abs(luma - prev) >= 48) edges += 1
        }
        prev = luma
        x += stride
      }
      y += stride
    }
    val edgeTerm =
      if (pairs == 0) 0.0 else math.min(1.0, 5.0 * (edges.toDouble / pairs))
    val score = edgeTerm * (bimodal.toDouble / pixels)
    BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** [[textiness]] as a Column — codegen'd like [[dhash64Col]]. */
  def textinessCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(TextinessScore(expressionOf(content)))
  }

  case class TextinessScore(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val s = textiness(v.asInstanceOf[Array[Byte]])
      if (s == null) null else s.doubleValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("texty")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Double $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.textiness(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final double ${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): TextinessScore = copy(c)
  }

  val ImageStatsSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("avg_r", DoubleType),
    StructField("avg_g", DoubleType),
    StructField("avg_b", DoubleType),
    StructField("textiness", DoubleType),
    StructField("exif_gps", BooleanType),
    StructField("ok", BooleanType, nullable = false),
    StructField("error", StringType)))

  /** Per-image pixel statistics (REAL ImageIO decode, the
    * `vision_detect_*`-shaped content-derived path): width/height from
    * the raster and mean channel values in [0,1]. Non-decodable rows
    * degrade to error rows, never fail the scan. Batched mapPartitions
    * like [[decode]].
    */
  def imageStats(df: DataFrame, contentCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("stats", ImageStatsSchema))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          val stats = decodePixels(bytes) match {
            case Some(img) =>
              val s = pixelSummary(img)
              // PNG/GIF/BMP cannot carry EXIF GPS -> false, not null:
              // the release gate wants "location-free", not "unknown"
              val gps = exifGpsPresent(bytes) == java.lang.Boolean.TRUE
              Row(img.getWidth, img.getHeight, s(0), s(1), s(2),
                textinessOf(img), gps, true, null)
            case None => webpInfo(bytes) match {
              // header-facts image (lossy-VP8 WebP, or a lossless
              // stream that doesn't parse — lossless WebP decodes
              // fully via [[Vp8l]] in the branch above): REAL
              // dimensions and the EXIF-chunk GPS flag, pixel stats
              // null. ok = true: the asset IS an image, and the card
              // must classify it as one — averages over null pixel
              // stats simply skip these rows.
              case Some((w, h, _, _)) =>
                val gps = exifGpsPresent(bytes) == java.lang.Boolean.TRUE
                Row(w, h, null, null, null, null, gps, true, null)
              case None => avifInfo(bytes) match {
                // AVIF/HEIC: header-facts image like lossy WebP
                // (AV1/HEVC decoders are out of pure-JDK scope); gps
                // is REAL — [[avifExifRegion]] walks the iinf/iloc
                // item indirection to the embedded TIFF block. The
                // TRI-STATE passes through: a declared-but-unreadable
                // EXIF item is unknown (null), never false — the
                // privacy gate fails closed for this carrier
                case Some((w, h, _)) =>
                  Row(w, h, null, null, null, null,
                    exifGpsPresent(bytes), true, null)
                case None => jxlInfo(bytes) match {
                  // JPEG XL: header-facts image; gps is REAL for the
                  // container form (its raw Exif box feeds the same
                  // TIFF scan), null-unknown for a naked codestream
                  // (which has no metadata container at all)
                  case Some((w, h)) =>
                    Row(w, h, null, null, null, null,
                      exifGpsPresent(bytes), true, null)
                  case None => icoInfo(bytes) match {
                    // DIB-payload favicon: header-facts image (the
                    // PNG-payload form decodes fully above); ICO
                    // carries no EXIF — gps null-unknown
                    case Some((_, w, h)) =>
                      Row(w, h, null, null, null, null, null, true, null)
                    case None => svgInfo(bytes) match {
                      // vector image: declared CSS-pixel dims, no
                      // raster to summarize, no EXIF
                      case Some((w, h)) =>
                        Row(w, h, null, null, null, null, null, true, null)
                      case None =>
                        Row(null, null, null, null, null, null, null, false,
                          "not a decodable raster")
                    }
                  }
                }
              }
            }
          }
          Row.fromSeq(row.toSeq :+ stats)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** PCM sample decode for the RIFF `data` chunk [[decodeWav]] only
    * measures: linear PCM (format 1), 16-bit signed LE or 8-bit
    * unsigned, returned as signed ints (8-bit recentered to
    * −128..127). None for non-WAV bytes, compressed formats, missing
    * chunks, or a `data` size pointing past the buffer (truncated
    * upload) — callers degrade per-row.
    */
  private[graft] def pcmSamples(b: Array[Byte]): Option[(Int, Int, Int, Array[Int])] =
    wavSamples(b).orElse(aiffSamples(b))

  private def wavSamples(b: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (b == null || b.length < 44 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var fmt, channels, bits = -1
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        fmt = le16(i + 8)
        channels = le16(i + 10)
        sampleRate = le32(i + 12).toInt
        bits = le16(i + 22)
      } else if (id == "data") {
        dataOff = i + 8
        dataLen = if (size > Int.MaxValue - 8) -1 else size.toInt
      }
      if (size > Int.MaxValue - i - 9) i = b.length
      else i += 8 + size.toInt + (size.toInt & 1)
    }
    // long arithmetic: a crafted ~2 GiB size field would overflow an
    // int sum to negative and slip past the bounds check, then OOM at
    // the array allocation instead of degrading per-row
    if (fmt != 1 || channels < 1 || dataOff < 0 || dataLen < 0 ||
      dataOff.toLong + dataLen > b.length || (bits != 16 && bits != 8)) return None
    val out =
      if (bits == 16) {
        val n = dataLen / 2
        val a = new Array[Int](n)
        var k = 0
        while (k < n) {
          a(k) = le16(dataOff + 2 * k).toShort.toInt // sign-extend
          k += 1
        }
        a
      } else {
        val a = new Array[Int](dataLen)
        var k = 0
        while (k < dataLen) {
          a(k) = (b(dataOff + k) & 0xff) - 128 // 8-bit PCM is unsigned
          k += 1
        }
        a
      }
    Some((channels, sampleRate, bits, out))
  }

  /** PCM decode for AIFF / AIFF-C — the other uncompressed-audio
    * container crawls deliver (the Apple legacy next to WAV): FORM
    * chunks big-endian, `COMM` carries channels / frame count /
    * bits / the 80-bit extended sample rate, `SSND` the samples
    * (big-endian signed; AIFF-C `sowt` = little-endian 16-bit, the
    * common modern variant; other compression types are rejected —
    * no codec in the loop). 8-bit AIFF is SIGNED, unlike WAV.
    */
  private def aiffSamples(b: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (b == null || b.length < 20 ||
      !(b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M')) return None
    val form = new String(b, 8, 4, "ISO-8859-1")
    if (form != "AIFF" && form != "AIFC") return None
    @inline def u16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    // IEEE 754 80-bit extended: sign+15-bit exponent, 64-bit mantissa
    // with an explicit integer bit — how AIFF stores the sample rate
    def ext80(o: Int): Int = {
      val exp = (((b(o) & 0x7f) << 8) | (b(o + 1) & 0xff)) - 16383
      var mant = 0L
      var i = 0
      while (i < 8) { mant = (mant << 8) | (b(o + 2 + i) & 0xffL); i += 1 }
      if (mant == 0 || exp < -63 || exp > 31) return -1
      val shift = exp - 63
      val v = if (shift >= 0) mant << shift else mant >>> -shift
      if (v > 0 && v <= Int.MaxValue) v.toInt else -1
    }
    var channels = -1
    var bits = -1
    var rate = -1
    var frames = -1L
    var little = false
    var compOk = true
    var dataOff = -1
    var dataLen = -1L
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "ISO-8859-1")
      val size = u32(i + 4)
      val body = i + 8
      if (id == "COMM" && size >= 18 && body + 18 <= b.length) {
        channels = u16(body)
        frames = u32(body + 2)
        bits = u16(body + 6)
        rate = ext80(body + 8)
        if (form == "AIFC") {
          compOk = size >= 22 && body + 22 <= b.length && {
            val c = new String(b, body + 18, 4, "ISO-8859-1")
            little = c == "sowt"
            c == "NONE" || c == "sowt"
          }
        }
      } else if (id == "SSND" && size >= 8 && body + 8 <= b.length) {
        val off = u32(body)
        if (off >= 0 && off <= size - 8) {
          dataOff = (body + 8 + off).toInt
          dataLen = size - 8 - off
        }
      }
      if (size < 0 || size > Int.MaxValue - i - 9) i = b.length
      else i += 8 + size.toInt + (size.toInt & 1) // word alignment
    }
    if (!compOk || channels < 1 || rate <= 0 || dataOff < 0 ||
      (bits != 16 && bits != 8) ||
      dataOff.toLong + dataLen > b.length) return None
    val wanted = frames * channels * (bits / 8)
    val len = math.min(dataLen, if (frames >= 0) wanted else dataLen).toInt
    val out =
      if (bits == 16) {
        val n = len / 2
        val a = new Array[Int](n)
        var k = 0
        while (k < n) {
          val o = dataOff + 2 * k
          a(k) =
            (if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
             else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)).toShort.toInt
          k += 1
        }
        a
      } else {
        val a = new Array[Int](len)
        var k = 0
        while (k < len) { a(k) = b(dataOff + k).toInt; k += 1 } // signed
        a
      }
    Some((channels, rate, bits, out))
  }

  /** AIFF declared tags — the `NAME`/`AUTH` text chunks (AIFF-1.3
    * §Text Chunks); AIFF has no album convention, so album stays
    * null. None for non-AIFF bytes or a file with neither chunk.
    */
  private[graft] def aiffTags(b: Array[Byte]): Option[(String, String, String, String)] = {
    if (b == null || b.length < 12 ||
      !(b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M')) return None
    val form = new String(b, 8, 4, "ISO-8859-1")
    if (form != "AIFF" && form != "AIFC") return None
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    var title: String = null
    var author: String = null
    var saw = false
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "ISO-8859-1")
      val size = u32(i + 4)
      if (size < 0 || i + 8 + size > b.length) i = b.length
      else {
        val body = i + 8
        val end = (body + size).toInt
        id match {
          case "NAME" =>
            saw = true
            title = new String(b, body, end - body,
              java.nio.charset.StandardCharsets.UTF_8)
          case "AUTH" =>
            saw = true
            author = new String(b, body, end - body,
              java.nio.charset.StandardCharsets.UTF_8)
          case _ => ()
        }
        i = end + (size.toInt & 1)
      }
    }
    if (!saw) None else Some((title, author, null, "aiff"))
  }

  /** Render an AIFF (or AIFF-C `sowt`) from 16-bit samples — the
    * [[renderWav]] twin; optional NAME/AUTH text chunks.
    */
  private[graft] def renderAiff(sampleRate: Int, channels: Int,
      samples: Array[Short], sowt: Boolean = false,
      name: String = null, author: String = null): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = java.nio.ByteBuffer.allocate(8 + body.length + pad)
      out.put(id.getBytes("ISO-8859-1")).putInt(body.length).put(body)
      out.array()
    }
    def ext80Of(v: Int): Array[Byte] = {
      // normalize v into 1.63 fixed point: exponent 16383 + (bits-1)
      val bitsN = 32 - Integer.numberOfLeadingZeros(v)
      val exp = 16383 + bitsN - 1
      val mant = v.toLong << (64 - bitsN)
      java.nio.ByteBuffer.allocate(10)
        .putShort(exp.toShort).putLong(mant).array()
    }
    val comm = chunk("COMM", java.nio.ByteBuffer
      .allocate(if (sowt) 18 + 4 + 2 else 18)
      .putShort(channels.toShort)
      .putInt(samples.length / channels)
      .putShort(16)
      .put(ext80Of(sampleRate)) match {
        case bb if sowt =>
          bb.put("sowt".getBytes("ISO-8859-1")).putShort(0).array()
        case bb => bb.array()
      })
    val data = java.nio.ByteBuffer.allocate(8 + samples.length * 2)
    data.putInt(0).putInt(0) // offset, blockSize
    samples.foreach { s =>
      if (sowt) { data.put((s & 0xff).toByte).put(((s >> 8) & 0xff).toByte) }
      else data.putShort(s)
    }
    val ssnd = chunk("SSND", data.array())
    val texts = Option(name).map(n =>
      chunk("NAME", n.getBytes("UTF-8"))).getOrElse(Array.emptyByteArray) ++
      Option(author).map(a =>
        chunk("AUTH", a.getBytes("UTF-8"))).getOrElse(Array.emptyByteArray)
    val form = (if (sowt) "AIFC" else "AIFF").getBytes("ISO-8859-1") ++
      comm ++ texts ++ ssnd
    val bb = java.nio.ByteBuffer.allocate(8 + form.length)
    bb.put("FORM".getBytes("ISO-8859-1")).putInt(form.length).put(form)
    bb.array()
  }

  /** Parsed MPEG audio (the MP3 family) stream facts from a pure-JDK
    * frame-header walk — no PCM decode. `gains` is the per-granule
    * loudness envelope read from the Layer III side information
    * (`global_gain`, the 8-bit log-scale granule amplitude at a FIXED
    * bit offset — 21 bits into each granule/channel block — so no
    * Huffman work is needed), folded max-over-channels; empty for
    * Layers I/II.
    */
  final case class MpegAudioInfo(version: String, layer: Int,
      sampleRate: Int, channels: Int, nFrames: Int, totalSamples: Long,
      avgBitrateKbps: Double, vbr: Boolean, gains: Array[Int])

  private case class MpegHdr(verId: Int, layer: Int, bitrateKbps: Int,
      sampleRate: Int, channels: Int, crc: Boolean, frameSize: Int,
      samples: Int)

  // bitrate tables (kbps), indexed [verGroup][layer-1][brIdx-1]:
  // verGroup 0 = MPEG1, 1 = MPEG2/2.5 (LSF)
  private val MpegBitrates: Array[Array[Array[Int]]] = Array(
    Array(
      Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),
    Array(
      Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))

  // sample rates, indexed by header version id (0=2.5, 2=2, 3=1)
  private val MpegRates: Map[Int, Array[Int]] = Map(
    0 -> Array(11025, 12000, 8000),
    2 -> Array(22050, 24000, 16000),
    3 -> Array(44100, 48000, 32000))

  private def mpegHdr(b: Array[Byte], pos: Int): MpegHdr = {
    if (pos < 0 || pos + 4 > b.length) return null
    val h = ((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
      ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return null
    val verId = (h >>> 19) & 3 // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layerId = (h >>> 17) & 3 // 1=III, 2=II, 3=I
    val brIdx = (h >>> 12) & 15
    val srIdx = (h >>> 10) & 3
    val padding = (h >>> 9) & 1
    val mode = (h >>> 6) & 3
    // brIdx 0 is FREE FORMAT (frame size not derivable from the
    // header) — rejected, documented at [[mpegAudioInfo]]
    if (verId == 1 || layerId == 0 || brIdx == 0 || brIdx == 15 ||
      srIdx == 3) return null
    val layer = 4 - layerId // 1/2/3
    val verGroup = if (verId == 3) 0 else 1
    val br = MpegBitrates(verGroup)(layer - 1)(brIdx - 1)
    val sr = MpegRates(verId)(srIdx)
    val samples =
      if (layer == 1) 384
      else if (layer == 2) 1152
      else if (verId == 3) 1152
      else 576
    val frameSize =
      if (layer == 1) (12 * br * 1000 / sr + padding) * 4
      else if (layer == 3 && verId != 3) 72 * br * 1000 / sr + padding
      else 144 * br * 1000 / sr + padding
    MpegHdr(verId, layer, br, sr, if (mode == 3) 1 else 2,
      crc = ((h >>> 16) & 1) == 0, frameSize, samples)
  }

  /** MPEG audio frame walk — the compressed-audio analog of
    * [[pcmSamples]]'s facts: version/layer/rate/channels from the
    * headers, frame count → EXACT duration (`totalSamples / rate`),
    * mean bitrate + VBR flag, and the Layer III `global_gain`
    * envelope feeding [[audioHash64]]. Crawl-robust without becoming
    * a false-positive magnet: an ID3v2 tag is skipped by its syncsafe
    * size, the first sync must appear within the first 4 KiB of what
    * remains (real MP3s start at 0 or right after the tag; scanning a
    * whole PNG for chance sync bytes is how misclassification
    * happens), the SECOND frame must parse consistently (same
    * version/layer/rate — the standard dual-frame anchor), and the
    * walk stops cleanly at trailing junk (ID3v1 tags). Free-format
    * streams (bitrate index 0) are rejected — their frame size is not
    * derivable. None = not MPEG audio; callers degrade per-row.
    */
  /** Known container / raster magics rejected before any elementary-
    * stream sync scan (MPEG audio AND ADTS) — compressed payloads can
    * chance-contain sync-like bytes, and "this JPEG is 0.1 s of
    * MPEG2.5" is the failure mode to ban. Every raster format
    * [[decodePixels]] accepts must appear here too, or an image whose
    * pixel bytes chance-contain a dual-frame-consistent sync would
    * classify as BOTH image and audio in [[mediaCard]]
    * (double-counted, pct_undecodable negative).
    */
  private def knownNonAudioMagic(b: Array[Byte]): Boolean =
    (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      (b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') ||
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42) ||
      (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') ||
      (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') || // AIFF
      (b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
        b(2) == 0xDF.toByte && b(3) == 0xA3.toByte) || // EBML
      (b(0) == 0 && b(1) == 0 && b(2) == 1 && b(3) == 0) // ICO

  private[graft] def mpegAudioInfo(b: Array[Byte]): Option[MpegAudioInfo] = {
    if (b == null || b.length < 8 || knownNonAudioMagic(b)) return None
    var pos = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val footer = if ((b(5) & 0x10) != 0) 10 else 0
      val skip = 10L + size + footer
      if (skip >= b.length) return None
      pos = skip.toInt
    }
    // anchor: first dual-frame-consistent sync within 4 KiB
    var start = -1
    var scan = pos
    val scanEnd = math.min(b.length - 4, pos + 4096)
    while (start < 0 && scan <= scanEnd) {
      val h = mpegHdr(b, scan)
      if (h != null) {
        val nxt = mpegHdr(b, scan + h.frameSize)
        val lastFrame = scan + h.frameSize >= b.length - 3
        if (lastFrame || (nxt != null && nxt.verId == h.verId &&
          nxt.layer == h.layer && nxt.sampleRate == h.sampleRate))
          start = scan
      }
      if (start < 0) scan += 1
    }
    if (start < 0) return None
    val first = mpegHdr(b, start)
    var at = start
    var nFrames = 0
    var brSum = 0L
    var vbr = false
    // Bounded envelope memory: hours-long audio carries millions of
    // granules, and the hash grid only needs uniform coverage — when
    // the buffer hits 2^17 entries, keep every 2nd and double the
    // collection stride (uniform decimation; ≤ 512 KiB however long
    // the stream). Short fixtures never hit the cap, so closed forms
    // are untouched.
    var gains = scala.collection.mutable.ArrayBuffer.empty[Int]
    var gainStride = 1
    var granuleIdx = 0L
    val frameGains = scala.collection.mutable.ArrayBuffer.empty[Int]
    var done = false
    while (!done) {
      val h = mpegHdr(b, at)
      if (h == null || h.verId != first.verId || h.layer != first.layer ||
        h.sampleRate != first.sampleRate || at + h.frameSize > b.length) {
        done = true // trailing tags / truncation end the walk
      } else {
        nFrames += 1
        brSum += h.bitrateKbps
        if (h.bitrateKbps != first.bitrateKbps) vbr = true
        if (h.layer == 3) {
          frameGains.clear()
          readGains(b, at, h, frameGains)
          var gi = 0
          while (gi < frameGains.length) {
            if (granuleIdx % gainStride == 0) gains += frameGains(gi)
            granuleIdx += 1
            gi += 1
          }
          if (gains.length >= 131072) {
            gains = gains.zipWithIndex.collect {
              case (g, i) if i % 2 == 0 => g
            }
            gainStride *= 2
          }
        }
        at += h.frameSize
        if (at >= b.length - 3) done = true
      }
    }
    if (nFrames < 1) return None
    val version =
      if (first.verId == 3) "1" else if (first.verId == 2) "2" else "2.5"
    Some(MpegAudioInfo(version, first.layer, first.sampleRate,
      first.channels, nFrames, nFrames.toLong * first.samples,
      brSum.toDouble / nFrames, vbr, gains.toArray))
  }

  /** Append the frame's per-granule max-over-channels `global_gain`
    * values. Side-info geometry (ISO/IEC 11172-3 §2.4.1.7): MPEG1 =
    * main_data_begin(9) + private(5 mono / 3 stereo) + scfsi(4·nch),
    * then 2 granules × nch blocks of 59 bits; LSF (MPEG2/2.5) =
    * main_data_begin(8) + private(1 mono / 2 stereo), 1 granule × nch
    * blocks of 63 bits. In every block global_gain sits 21 bits in
    * (after part2_3_length(12) + big_values(9)).
    */
  private def readGains(b: Array[Byte], frameAt: Int, h: MpegHdr,
      out: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    val sideOff = frameAt + 4 + (if (h.crc) 2 else 0)
    val mpeg1 = h.verId == 3
    val nch = h.channels
    val sideLen = if (mpeg1) { if (nch == 1) 17 else 32 }
      else { if (nch == 1) 9 else 17 }
    if (sideOff + sideLen > b.length) return
    def bits(bitOff: Int, n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val abs = sideOff.toLong * 8 + bitOff + i
        val byte = b((abs >> 3).toInt) & 0xff
        v = (v << 1) | ((byte >> (7 - (abs & 7)).toInt) & 1)
        i += 1
      }
      v
    }
    val nGr = if (mpeg1) 2 else 1
    val base =
      if (mpeg1) 9 + (if (nch == 1) 5 else 3) + 4 * nch
      else 8 + (if (nch == 1) 1 else 2)
    val block = if (mpeg1) 59 else 63
    var gr = 0
    while (gr < nGr) {
      var g = 0
      var ch = 0
      while (ch < nch) {
        g = math.max(g, bits(base + (gr * nch + ch) * block + 21, 8))
        ch += 1
      }
      out += g
      gr += 1
    }
  }

  /** FLAC STREAMINFO facts — (channels, sampleRate, bitsPerSample,
    * totalSamples): the mandatory first metadata block of every FLAC
    * stream (format spec §STREAMINFO: after the `fLaC` magic, block
    * type 0, 34-byte body; sample rate 20 bits / channels-1 3 bits /
    * bps-1 5 bits / total samples 36 bits packed at byte 10). Header
    * facts only — no frame decode — which is exactly what the card
    * and duration gates need. None for non-FLAC bytes.
    */
  private[graft] def flacStreamInfo(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b == null || b.length < 8 + 34 ||
      !(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    // first metadata block header at 4: [last:1][type:7][len:24]
    if ((b(4) & 0x7f) != 0) return None // STREAMINFO must be first
    val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (len < 34 || 8 + len > b.length) return None
    val o = 8
    val sr = ((b(o + 10) & 0xff) << 12) | ((b(o + 11) & 0xff) << 4) |
      ((b(o + 12) & 0xff) >> 4)
    val ch = ((b(o + 12) >> 1) & 7) + 1
    val bps = (((b(o + 12) & 1) << 4) | ((b(o + 13) & 0xff) >> 4)) + 1
    val total = ((b(o + 13) & 0x0fL) << 32) |
      ((b(o + 14) & 0xffL) << 24) | ((b(o + 15) & 0xffL) << 16) |
      ((b(o + 16) & 0xffL) << 8) | (b(o + 17) & 0xffL)
    if (sr <= 0) return None
    Some((ch, sr, bps, total))
  }

  /** Minimal FLAC: magic + a last-marked STREAMINFO block with the
    * given facts (header-facts fixture, [[syntheticMp3]] discipline).
    */
  private[graft] def syntheticFlac(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long): Array[Byte] = {
    val out = new Array[Byte](8 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last block, type 0 (STREAMINFO)
    out(7) = 34
    val o = 8
    out(o + 10) = ((sampleRate >> 12) & 0xff).toByte
    out(o + 11) = ((sampleRate >> 4) & 0xff).toByte
    out(o + 12) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 7) << 1) |
      (((bitsPerSample - 1) >> 4) & 1)).toByte
    out(o + 13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    out(o + 14) = ((totalSamples >> 24) & 0xff).toByte
    out(o + 15) = ((totalSamples >> 16) & 0xff).toByte
    out(o + 16) = ((totalSamples >> 8) & 0xff).toByte
    out(o + 17) = (totalSamples & 0xff).toByte
    out
  }

  /** Ogg-Opus stream facts — (channels, preSkip, inputSampleRate,
    * lastGranule): the `OpusHead` packet on the first Ogg page (RFC
    * 7845 §5.1) plus the LAST page's granule position (48 kHz sample
    * count — Opus always times at 48 kHz, so duration_ms =
    * (granule − preSkip) · 1000 / 48000 regardless of input rate).
    * The last page is found by scanning backwards for a valid `OggS`
    * capture, the standard duration technique (no packet decode).
    * None for non-Ogg/non-Opus bytes.
    */
  private[graft] def opusInfo(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b == null || b.length < 47 ||
      !(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')) return None
    @inline def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    @inline def le64(o: Int): Long = le32(o) | (le32(o + 4) << 32)
    // first page payload: after 27-byte header + segment table
    val nSegs = b(26) & 0xff
    val payload = 27 + nSegs
    if (payload + 19 > b.length) return None
    val head = new String(b, payload, 8, "ISO-8859-1")
    if (head != "OpusHead") return None
    val channels = b(payload + 9) & 0xff
    val preSkip = ((b(payload + 11) & 0xff) << 8) | (b(payload + 10) & 0xff)
    val inputRate = le32(payload + 12).toInt
    // last page: scan backwards for "OggS" with version byte 0
    var i = b.length - 27
    var granule = -1L
    while (granule < 0 && i >= 0) {
      if (b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
        b(i + 3) == 'S' && b(i + 4) == 0) granule = le64(i + 6)
      i -= 1
    }
    if (granule < 0) None else Some((channels, preSkip, inputRate, granule))
  }

  /** Vorbis comment fields (TITLE/ARTIST/ALBUM; keys case-insensitive
    * per the Vorbis-comment spec, values UTF-8) from a comment region:
    * LE u32 vendor length + vendor string + LE u32 comment count +
    * per-comment LE u32 length + `KEY=value`. The shared field parse
    * behind FLAC metadata block 4 and the `OpusTags` packet. None when
    * the region is structurally invalid (lengths out of range) — a
    * declared-but-unreadable tags block reports untagged, the
    * [[audioTags]] all-null convention, never garbled text.
    */
  private def vorbisFields(b: Array[Byte], start: Int,
      end: Int): Option[(String, String, String)] =
    vorbisFieldMap(b, start, end, Set("TITLE", "ARTIST", "ALBUM")).map(m =>
      (m.getOrElse("TITLE", null), m.getOrElse("ARTIST", null),
        m.getOrElse("ALBUM", null)))

  /** The generic field walk behind [[vorbisFields]] (and the LYRICS
    * read): collects the LAST occurrence of each wanted key.
    */
  private def vorbisFieldMap(b: Array[Byte], start: Int, end: Int,
      wanted: Set[String]): Option[Map[String, String]] = {
    var out = Map.empty[String, String]
    if (!vorbisFieldsForeach(b, start, end) { (key, value) =>
      if (wanted.contains(key)) out = out.updated(key, value)
    }) return None
    Some(out)
  }

  /** Iterate every UPPERCASED (key, value) field of a Vorbis comment
    * region — the one walk behind [[vorbisFieldMap]] and the
    * `CHAPTERnnn` chapter read. False = structurally invalid header
    * (a truncated field LIST keeps what parsed, like before).
    */
  private def vorbisFieldsForeach(b: Array[Byte], start: Int,
      end: Int)(fn: (String, String) => Unit): Boolean = {
    @inline def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var p = start
    if (p + 4 > end) return false
    val vendorLen = le32(p); p += 4
    if (vendorLen < 0 || vendorLen > end - p) return false
    p += vendorLen.toInt
    if (p + 4 > end) return false
    var n = le32(p); p += 4
    if (n < 0) return false
    while (n > 0 && p + 4 <= end) {
      val len = le32(p); p += 4
      if (len < 0 || len > end - p) n = 0 // truncated list: keep what parsed
      else {
        val s = new String(b, p, len.toInt,
          java.nio.charset.StandardCharsets.UTF_8)
        val eq = s.indexOf('=')
        if (eq > 0)
          fn(s.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
            s.substring(eq + 1))
        p += len.toInt
        n -= 1
      }
    }
    true
  }

  /** Chapters declared as Vorbis-comment `CHAPTERnnn` /
    * `CHAPTERnnnNAME` fields (the ogg-chapter-extension convention
    * audiobook `.opus`/`.ogg` rips carry): `CHAPTER001=00:00:00.000`
    * stamps a start on the TTML clock grammar, the NAME twin titles
    * it (untitled = empty). Ends follow the LRC next-start rule.
    * None when the region declares no chapter field.
    */
  private def vorbisChapterCues(b: Array[Byte], start: Int,
      end: Int): Option[Seq[SubCue]] = try {
    val starts = scala.collection.mutable.Map.empty[Int, Long]
    val names = scala.collection.mutable.Map.empty[Int, String]
    vorbisFieldsForeach(b, start, end) { (key, value) =>
      val m = VorbisChapterPat.matcher(key)
      if (m.matches() && starts.size < 10000) {
        val idx = m.group(1).toInt
        if (m.group(2) == null) {
          val ms = ttmlTimeMs(value)
          if (ms >= 0) starts(idx) = ms
        } else names(idx) = value
      }
    }
    if (starts.isEmpty) None
    else {
      val sorted = starts.toSeq.sortBy(e => (e._2, e._1))
      Some(sorted.zipWithIndex.map { case ((idx, ms), k) =>
        val endMs = if (k + 1 < sorted.length) sorted(k + 1)._2 else ms
        SubCue(k + 1, ms, endMs, names.getOrElse(idx, ""))
      })
    }
  } catch { case _: Throwable => None } // per-row isolation

  private val VorbisChapterPat = java.util.regex.Pattern.compile(
    "CHAPTER(\\d{1,3})(NAME)?")

  /** FLAC declared tags — the VORBIS_COMMENT metadata block (type 4,
    * FLAC format spec) the lossless half of a crawled audio corpus
    * carries its titles/artists in (ID3 is the MP3/AAC convention;
    * FLAC's own is Vorbis comments). Metadata block walk from the
    * `fLaC` magic: [last:1|type:7][len:24] headers, stop at the last
    * block or truncation. None for non-FLAC bytes, no comment block,
    * or a structurally invalid one.
    */
  private[graft] def flacTags(b: Array[Byte]): Option[(String, String, String, String)] =
    flacCommentRegion(b).flatMap { case (from, until) =>
      vorbisFields(b, from, until).map { case (t, a, al) => (t, a, al, "flac") }
    }

  /** The VORBIS_COMMENT block's (from, until) within a FLAC file —
    * the single locate behind [[flacTags]] and the LYRICS read.
    */
  private def flacCommentRegion(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 8 ||
      !(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    var off = 4
    var last = false
    while (!last && off + 4 <= b.length) {
      val hdr = b(off) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      val body = off + 4
      if (body + len > b.length) return None // truncated block
      if (btype == 4) return Some((body, body + len))
      off = body + len
    }
    None
  }

  /** Embedded cover art from a FLAC `PICTURE` metadata block (type 6,
    * FLAC format spec): (mime, image bytes) — big-endian
    * length-prefixed fields (picture type, MIME, description,
    * dims/depth/colors, data). None for non-FLAC bytes, no picture
    * block, or a structurally invalid one (every length is
    * bounds-checked against the block, so a hostile length field ends
    * the read instead of walking out of it).
    */
  private[graft] def flacPicture(b: Array[Byte]): Option[(String, Array[Byte])] = {
    if (b == null || b.length < 8 ||
      !(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    var off = 4
    var last = false
    while (!last && off + 4 <= b.length) {
      val hdr = b(off) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      val body = off + 4
      if (body + len > b.length) return None // truncated block
      if (btype == 6) return flacPictureBody(b, body, body + len)
      off = body + len
    }
    None
  }

  /** Decode the BODY of a FLAC `PICTURE` block in `b[from, until)` —
    * the shared kernel of [[flacPicture]] (where the body sits inside
    * a FLAC metadata-block chain) and the Vorbis-comment
    * `METADATA_BLOCK_PICTURE` field (where the SAME structure arrives
    * base64-encoded inside an Ogg Vorbis/Opus tag — the standard art
    * carrier of `.ogg`/`.opus` rips). Every length is bounds-checked
    * against the block, so a hostile length ends the read instead of
    * walking out of it.
    */
  private def flacPictureBody(b: Array[Byte], from: Int,
      until: Int): Option[(String, Array[Byte])] = {
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val end = until
    var p = from + 4 // picture type (3 = front cover) — not needed
    if (p + 4 > end) return None
    val mimeLen = u32(p); p += 4
    if (mimeLen < 0 || mimeLen > end - p) return None
    val mime = new String(b, p, mimeLen.toInt, "ISO-8859-1")
    p += mimeLen.toInt
    if (p + 4 > end) return None
    val descLen = u32(p); p += 4
    if (descLen < 0 || descLen > end - p) return None
    p += descLen.toInt
    p += 16 // width, height, depth, colors
    if (p + 4 > end) return None
    val dataLen = u32(p); p += 4
    if (dataLen <= 0 || dataLen > end - p) return None
    Some((mime, java.util.Arrays.copyOfRange(b, p, p + dataLen.toInt)))
  }

  /** Embedded cover art of an Ogg Vorbis/Opus stream — the
    * Vorbis-comment `METADATA_BLOCK_PICTURE` field (the
    * xiph.org coverart convention: a base64-encoded FLAC PICTURE
    * block body), decoded through the SAME [[flacPictureBody]]
    * kernel FLAC files use. None for non-Ogg bytes, no such field,
    * or an undecodable payload.
    */
  private[graft] def oggEmbeddedPicture(b: Array[Byte]): Option[(String, Array[Byte])] = {
    val region = opusCommentRegion(b).orElse(vorbisOggCommentRegion(b))
    region.flatMap { case (arr, from, until) =>
      vorbisFieldMap(arr, from, until, Set("METADATA_BLOCK_PICTURE"))
        .flatMap(_.get("METADATA_BLOCK_PICTURE"))
        .flatMap { b64 =>
          try {
            val block = java.util.Base64.getDecoder.decode(b64)
            if (block.length < 8) None
            else flacPictureBody(block, 0, block.length)
          } catch { case _: IllegalArgumentException => None }
        }
    }
  }

  /** Ogg-Opus declared tags — the `OpusTags` packet (RFC 7845 §5.2),
    * by spec the second packet of the stream, carrying the same
    * Vorbis-comment structure as FLAC. Sequential Ogg page walk from
    * the mandatory `OpusHead` first page; the tags packet is read
    * within its first page (a >64 KiB spanning tag degrades to None,
    * never to shifted reads). None for non-Ogg/non-Opus bytes or no
    * tags packet within the first pages.
    */
  private[graft] def opusTags(b: Array[Byte]): Option[(String, String, String, String)] =
    opusCommentRegion(b).flatMap { case (arr, from, until) =>
      vorbisFields(arr, from, until).map { case (t, a, al) => (t, a, al, "opus") }
    }

  /** The FIRST packet of the Ogg page at `pageOff`, following
    * continued pages (RFC 3533 §6: a lacing value of 255 means the
    * packet continues; the next page's header-type sets bit 0x01)
    * until a lacing < 255 ends it — (backing array, from, until).
    * Zero-copy into the input when the packet ends on its starting
    * page (the overwhelmingly common case); a stitched copy only
    * when it spans pages — which real cover art routinely does: a
    * `METADATA_BLOCK_PICTURE` base64 payload exceeds one page's
    * ~64 KiB ceiling for any non-thumbnail image. Truncated input
    * degrades to the intact prefix (the [[webmInfo]] clamp rule);
    * capped at 64 pages / 16 MiB against hostile chains.
    */
  private def oggPacketFrom(b: Array[Byte],
      pageOff: Int): Option[(Array[Byte], Int, Int)] = {
    var off = pageOff
    var first = true
    var out: java.io.ByteArrayOutputStream = null
    var pages = 0
    while (off + 27 <= b.length && pages < 64) {
      pages += 1
      if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
        b(off + 3) == 'S' && b(off + 4) == 0)) return None
      if (!first && (b(off + 5) & 0x01) == 0) return None // not continued
      val nSegs = b(off + 26) & 0xff
      if (off + 27 + nSegs > b.length) return None
      // this page's share of the packet: leading segments until the
      // first lacing < 255; all-255 to the page end = continues
      var len = 0
      var ended = false
      var i = 0
      while (i < nSegs && !ended) {
        val l = b(off + 27 + i) & 0xff
        len += l
        if (l < 255) ended = true
        i += 1
      }
      val payload = off + 27 + nSegs
      if (payload + len > b.length) { // truncated: keep intact prefix
        len = b.length - payload
        ended = true
      }
      if (ended && first) return Some((b, payload, payload + len))
      if (out == null) out = new java.io.ByteArrayOutputStream()
      if (out.size().toLong + len > (16L << 20)) return None
      out.write(b, payload, len)
      if (ended) {
        val arr = out.toByteArray
        return Some((arr, 0, arr.length))
      }
      // next page starts after ALL of this page's segments
      var full = 0
      i = 0
      while (i < nSegs) { full += b(off + 27 + i) & 0xff; i += 1 }
      off = payload + full
      first = false
    }
    None
  }

  /** The `OpusTags` packet's comment region within the first Ogg
    * pages — the single locate behind [[opusTags]] and LYRICS:
    * (backing array, from, until), stitched across continued pages
    * by [[oggPacketFrom]] so a spanning tag packet (cover art) reads
    * whole.
    */
  private def opusCommentRegion(b: Array[Byte]): Option[(Array[Byte], Int, Int)] = {
    if (b == null || b.length < 47 ||
      !(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')) return None
    var off = 0
    var sawHead = false
    var pages = 0
    while (off + 27 <= b.length && pages < 64) {
      pages += 1
      if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
        b(off + 3) == 'S' && b(off + 4) == 0)) return None
      val nSegs = b(off + 26) & 0xff
      if (off + 27 + nSegs > b.length) return None
      var plen = 0
      var i = 0
      while (i < nSegs) { plen += b(off + 27 + i) & 0xff; i += 1 }
      val payload = off + 27 + nSegs
      val pend = math.min(b.length, payload + plen)
      if (!sawHead) {
        if (pend - payload < 8 ||
          new String(b, payload, 8, "ISO-8859-1") != "OpusHead") return None
        sawHead = true
      } else if (pend - payload >= 8 &&
        new String(b, payload, 8, "ISO-8859-1") == "OpusTags") {
        return oggPacketFrom(b, off).collect {
          case (arr, f, u) if u - f >= 8 => (arr, f + 8, u)
        }
      }
      off = payload + plen
    }
    None
  }

  /** Ogg-Vorbis stream facts — (channels, sampleRate, lastGranule):
    * the `vorbis` identification header on the first Ogg page
    * (Vorbis I spec §4.2.2: version u32 0, channels u8, rate LE u32)
    * plus the LAST page's granule position, which for Vorbis counts
    * PCM samples at the stream's own rate (unlike Opus' fixed 48 kHz
    * clock), so duration_ms = granule · 1000 / rate. Same
    * backward-scan duration technique as [[opusInfo]]. None for
    * non-Ogg or non-Vorbis bytes (an Ogg-OPUS stream is not Vorbis —
    * the first-packet magic disambiguates the container).
    */
  private[graft] def vorbisInfo(b: Array[Byte]): Option[(Int, Int, Long)] = {
    if (b == null || b.length < 47 ||
      !(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')) return None
    @inline def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    @inline def le64(o: Int): Long = le32(o) | (le32(o + 4) << 32)
    val nSegs = b(26) & 0xff
    val p = 27 + nSegs
    if (p + 16 > b.length) return None
    if (!(b(p) == 1 && b(p + 1) == 'v' && b(p + 2) == 'o' && b(p + 3) == 'r' &&
      b(p + 4) == 'b' && b(p + 5) == 'i' && b(p + 6) == 's')) return None
    if (le32(p + 7) != 0L) return None // vorbis_version must be 0
    val channels = b(p + 11) & 0xff
    val rate = le32(p + 12).toInt
    if (channels < 1 || rate <= 0) return None
    var i = b.length - 27
    var granule = -1L
    while (granule < 0 && i >= 0) {
      if (b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
        b(i + 3) == 'S' && b(i + 4) == 0) granule = le64(i + 6)
      i -= 1
    }
    if (granule < 0) None else Some((channels, rate, granule))
  }

  /** Ogg-Vorbis declared tags — the comment header (`vorbis`
    * packet, by spec the second packet), same Vorbis-comment
    * structure as FLAC/Opus. Page walk like [[opusTags]].
    */
  private[graft] def vorbisTags(b: Array[Byte]): Option[(String, String, String, String)] =
    vorbisOggCommentRegion(b).flatMap { case (arr, from, until) =>
      vorbisFields(arr, from, until).map { case (t, a, al) => (t, a, al, "vorbis") }
    }

  /** The Ogg-Vorbis comment-header region — [[opusCommentRegion]]'s
    * Vorbis-codec twin, continuation-stitched the same way.
    */
  private def vorbisOggCommentRegion(b: Array[Byte]): Option[(Array[Byte], Int, Int)] = {
    if (b == null || b.length < 47 ||
      !(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')) return None
    var off = 0
    var sawIdent = false
    var pages = 0
    while (off + 27 <= b.length && pages < 64) {
      pages += 1
      if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
        b(off + 3) == 'S' && b(off + 4) == 0)) return None
      val nSegs = b(off + 26) & 0xff
      if (off + 27 + nSegs > b.length) return None
      var plen = 0
      var i = 0
      while (i < nSegs) { plen += b(off + 27 + i) & 0xff; i += 1 }
      val payload = off + 27 + nSegs
      val pend = math.min(b.length, payload + plen)
      @inline def leads(tag: Int): Boolean =
        pend - payload >= 7 && b(payload) == tag && b(payload + 1) == 'v' &&
          b(payload + 2) == 'o' && b(payload + 3) == 'r' &&
          b(payload + 4) == 'b' && b(payload + 5) == 'i' && b(payload + 6) == 's'
      if (!sawIdent) {
        if (!leads(1)) return None
        sawIdent = true
      } else if (leads(3)) {
        return oggPacketFrom(b, off).collect {
          case (arr, f, u) if u - f >= 7 => (arr, f + 7, u)
        }
      }
      off = payload + plen
    }
    None
  }

  /** Minimal Ogg-Vorbis: an identification-header page, optionally a
    * comment-header page with the given tags, and an EOS page at the
    * given granule (header-facts fixture, [[syntheticOpus]]
    * discipline).
    */
  private[graft] def syntheticVorbis(channels: Int, sampleRate: Int,
      lastGranule: Long, tags: Option[(String, String, String)] = None,
      lyrics: Option[String] = None,
      picture: Option[(String, Array[Byte])] = None,
      chapters: Seq[(Long, String)] = Nil): Array[Byte] = {
    val ident = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).put("vorbis".getBytes("ISO-8859-1"))
      .putInt(0) // version
      .put(channels.toByte).putInt(sampleRate)
      .putInt(0).putInt(0).putInt(0) // bitrates
      .put(0xB8.toByte).put(1.toByte) // blocksizes + framing bit
      .array()
    val head = oggPage(0x02, 0L, 0, ident)
    val comment =
      if (tags.isEmpty && picture.isEmpty && chapters.isEmpty) None
      else {
        val (t, a, al) = tags.getOrElse(("", "", ""))
        Some(oggPackedPages(0x00, 0L, 1,
          Array[Byte](3) ++ "vorbis".getBytes("ISO-8859-1") ++
            vorbisCommentBytes(t, a, al, lyrics.orNull,
              picture.toSeq.map { case (m, art) =>
                "METADATA_BLOCK_PICTURE=" + java.util.Base64.getEncoder
                  .encodeToString(flacPictureBlockBodyBytes(m, art))
              } ++ vorbisChapterFieldStrings(chapters)) ++
            Array[Byte](1))) // framing bit
      }
    val eos = oggPage(0x04, lastGranule, if (comment.isDefined) 2 else 1,
      Array[Byte](0))
    head ++ comment.getOrElse(Array.emptyByteArray) ++ eos
  }

  /** Parsed ADTS (AAC) stream facts — the other half of real crawled
    * audio next to the MPEG walk: (profile, sampleRate, channels,
    * nFrames, totalSamples, avgBitrateKbps). Same crawl-robust shape
    * as [[mpegAudioInfo]]: known containers rejected by magic first,
    * ID3v2 skipped by its syncsafe size, the first sync must appear
    * within 4 KiB and the SECOND frame must parse consistently (same
    * sampling-frequency index + channel config — the dual-frame
    * anchor), the walk stops cleanly at trailing junk. ADTS and MPEG
    * syncs are disjoint by construction (ADTS layer bits are 00,
    * which [[mpegAudioInfo]] rejects as reserved, and vice versa).
    * Sample count is exact — 1024 samples per raw data block, blocks
    * per frame from the header — so duration is a closed form.
    */
  final case class AdtsInfo(profile: Int, sampleRate: Int, channels: Int,
      nFrames: Int, totalSamples: Long, avgBitrateKbps: Double)

  // MPEG-4 sampling_frequency_index table (ISO/IEC 14496-3 §1.6.3.4)
  private val AdtsRates: Array[Int] = Array(96000, 88200, 64000, 48000,
    44100, 32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** One ADTS header at `pos`: (sfIdx, chCfg, frameLen, blocks) packed
    * in an Int array, or null. Layer bits must be 00 (an MPEG audio
    * header never matches) and the length must cover the header.
    */
  private def adtsHdr(b: Array[Byte], pos: Int): Array[Int] = {
    if (pos < 0 || pos + 7 > b.length) return null
    if ((b(pos) & 0xff) != 0xFF || (b(pos + 1) & 0xF6) != 0xF0) return null
    val sfIdx = (b(pos + 2) >> 2) & 0xf
    if (sfIdx >= AdtsRates.length) return null
    val chCfg = ((b(pos + 2) & 1) << 2) | ((b(pos + 3) >> 6) & 3)
    if (chCfg == 0) return null // PCE-carried config: not a header fact
    val profile = (b(pos + 2) >> 6) & 3
    val frameLen = ((b(pos + 3) & 3) << 11) | ((b(pos + 4) & 0xff) << 3) |
      ((b(pos + 5) >> 5) & 7)
    val crc = (b(pos + 1) & 1) == 0
    if (frameLen < (if (crc) 9 else 7)) return null
    val blocks = (b(pos + 6) & 3) + 1
    Array(sfIdx, chCfg, frameLen, blocks, profile)
  }

  private[graft] def adtsAudioInfo(b: Array[Byte]): Option[AdtsInfo] = {
    if (b == null || b.length < 8 || knownNonAudioMagic(b)) return None
    var pos = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val footer = if ((b(5) & 0x10) != 0) 10 else 0
      val skip = 10L + size + footer
      if (skip >= b.length) return None
      pos = skip.toInt
    }
    var start = -1
    var scan = pos
    val scanEnd = math.min(b.length - 7, pos + 4096)
    while (start < 0 && scan <= scanEnd) {
      val h = adtsHdr(b, scan)
      if (h != null) {
        val nxt = adtsHdr(b, scan + h(2))
        val lastFrame = scan + h(2) >= b.length - 6
        if (lastFrame || (nxt != null && nxt(0) == h(0) && nxt(1) == h(1)))
          start = scan
      }
      if (start < 0) scan += 1
    }
    if (start < 0) return None
    val first = adtsHdr(b, start)
    var at = start
    var nFrames = 0
    var totalSamples = 0L
    var totalBytes = 0L
    var done = false
    while (!done) {
      val h = adtsHdr(b, at)
      if (h == null || h(0) != first(0) || h(1) != first(1) ||
        at + h(2) > b.length) done = true
      else {
        nFrames += 1
        totalSamples += 1024L * h(3)
        totalBytes += h(2)
        at += h(2)
        if (at >= b.length - 6) done = true
      }
    }
    if (nFrames < 1) return None
    val rate = AdtsRates(first(0))
    Some(AdtsInfo(first(4), rate, first(1), nFrames, totalSamples,
      totalBytes * 8.0 * rate / totalSamples / 1000.0))
  }

  private val AdtsProfileNames = Array("main", "lc", "ssr", "ltp")

  /** Build a VALID ADTS stream with zeroed payloads — real headers,
    * deterministic bytes ([[syntheticMp3]] discipline): every fact
    * [[adtsAudioInfo]] reports is a closed form of the arguments.
    * `payloadSizes` = per-frame raw-data byte counts.
    */
  private[graft] def syntheticAdts(profile: Int, sfIdx: Int, channels: Int,
      payloadSizes: Seq[Int], id3Bytes: Int = 0): Array[Byte] = {
    require(profile >= 0 && profile <= 3, s"profile: $profile")
    require(sfIdx >= 0 && sfIdx < AdtsRates.length, s"sfIdx: $sfIdx")
    require(channels >= 1 && channels <= 7, s"channels: $channels")
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      out.write(new Array[Byte](id3Bytes))
    }
    payloadSizes.foreach { p =>
      val len = 7 + p
      val f = new Array[Byte](len)
      f(0) = 0xFF.toByte
      f(1) = 0xF1.toByte // MPEG-4, layer 00, no CRC
      f(2) = ((profile << 6) | (sfIdx << 2) | ((channels >> 2) & 1)).toByte
      f(3) = (((channels & 3) << 6) | ((len >> 11) & 3)).toByte
      f(4) = ((len >> 3) & 0xff).toByte
      f(5) = (((len & 7) << 5) | 0x1f).toByte // fullness high bits
      f(6) = 0xFC.toByte // fullness low, 1 raw data block
      out.write(f)
    }
    out.toByteArray
  }

  /** M4A (AAC-in-ISO-BMFF) audio-track facts — (channels, sampleRate,
    * nSamples, codecFourcc): the FIRST `soun`-handler track's `mdhd`
    * timescale/duration plus the `stsd` sample entry's channel count
    * and 16.16 sample rate (the `mp4a` layout — same fields for any
    * audio sample entry). nSamples rescales the mdhd duration to the
    * sample-rate clock (exact in the common timescale == rate case);
    * the all-ones unknown-duration sentinel reads as 0 samples, the
    * [[mp4VideoTrack]] rule. None for non-BMFF bytes, a file with no
    * complete audio description, or a container that ALSO carries a
    * `vide` track — a movie's modality is video ([[mediaCard]] must
    * not count it as audio just because it has a soundtrack; its
    * frames go through [[mp4VideoTrack]]).
    */
  private[graft] def m4aAudioInfo(b: Array[Byte]): Option[(Int, Int, Long, String)] = {
    if (b == null || b.length < 16 ||
      !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    @inline def u32(o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    @inline def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    @inline def u16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    var timescale = 0
    var duration = 0L
    var isAudioTrack = false
    var sawVideoTrack = false
    var codec: String = null
    var channels = 0
    var rate = 0
    var found: Option[(Int, Int, Long, String)] = None
    def finishTrak(): Unit = {
      if (found.isEmpty && isAudioTrack && codec != null && rate > 0 &&
        timescale > 0) {
        val samples = duration * rate / timescale
        found = Some((channels, rate, samples, codec))
      }
      timescale = 0; duration = 0L; isAudioTrack = false
      codec = null; channels = 0; rate = 0
    }
    // depth-capped: a crafted file nesting thousands of 8-byte
    // container boxes must exhaust the CAP, not the task stack
    def walk(start: Long, end: Long, depth: Int = 0): Unit = {
      if (depth > 16) return
      var off = start
      while (!sawVideoTrack && off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = new String(b, off.toInt + 4, 4, "ISO-8859-1")
        var body = off + 8
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) return
        val p = body.toInt
        id match {
          case "moov" | "mdia" | "minf" | "stbl" => walk(body, boxEnd, depth + 1)
          case "trak" => walk(body, boxEnd, depth + 1); finishTrak()
          case "mdhd" if p + 4 <= boxEnd =>
            if (b(p) == 1 && p + 32 <= boxEnd) {
              timescale = u32(p + 20).toInt; duration = u64(p + 24)
            } else if (p + 24 <= boxEnd) {
              timescale = u32(p + 12).toInt; duration = u32(p + 16)
            }
            if (duration == 0xFFFFFFFFL || duration == -1L) duration = 0L
          case "hdlr" if p + 12 <= boxEnd =>
            val handler = new String(b, p + 8, 4, "ISO-8859-1")
            isAudioTrack = handler == "soun"
            if (handler == "vide") sawVideoTrack = true
          case "stsd" if p + 16 <= boxEnd =>
            // first sample entry: fourcc at +12; the audio sample
            // entry's channelcount sits 24 bytes and its 16.16 sample
            // rate 32 bytes into the entry (ISO/IEC 14496-12 §12.2.3)
            val entry = p + 8
            codec = new String(b, entry + 4, 4, "ISO-8859-1")
            if (entry + 36 <= boxEnd) {
              channels = u16(entry + 24)
              rate = (u32(entry + 32) >> 16).toInt
            }
          case _ => ()
        }
        off = boxEnd
      }
    }
    walk(0L, b.length.toLong)
    if (sawVideoTrack) None else found
  }

  /** Minimal M4A: ftyp + moov/trak/mdia(mdhd, hdlr soun, minf/stbl/
    * stsd(mp4a)) with the given facts ([[syntheticMjpegMp4]]'s audio
    * twin; timescale == sampleRate so nSamples is exact).
    */
  private[graft] def syntheticM4a(channels: Int, sampleRate: Int,
      nSamples: Long, codec: String = "mp4a"): Array[Byte] = {
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(id.getBytes("ISO-8859-1")).put(payload)
      out.array()
    }
    val mdhd = {
      val p = java.nio.ByteBuffer.allocate(24)
      p.putInt(0).putInt(0).putInt(0) // v0, times
      p.putInt(sampleRate).putInt(nSamples.toInt).putInt(0)
      p.array()
    }
    val hdlr = java.nio.ByteBuffer.allocate(24).putInt(0).putInt(0)
      .put("soun".getBytes("ISO-8859-1")).putInt(0).putInt(0).putInt(0)
      .array()
    val entry = {
      val p = java.nio.ByteBuffer.allocate(36)
      p.putInt(36).put(codec.getBytes("ISO-8859-1"))
      p.position(8 + 16) // reserved/data-ref/version/revision/vendor
      p.putShort(channels.toShort).putShort(16) // channelcount, samplesize
      p.putInt(0) // pre_defined + reserved
      p.putInt(sampleRate << 16) // 16.16
      p.array()
    }
    val stsd = java.nio.ByteBuffer.allocate(8).putInt(0).putInt(1).array() ++ entry
    val stbl = box("stbl", box("stsd", stsd))
    val mdia = box("mdia", box("mdhd", mdhd) ++ box("hdlr", hdlr) ++
      box("minf", stbl))
    val ftyp = box("ftyp", "M4A \u0000\u0000\u0002\u0000isomiso2".getBytes("ISO-8859-1"))
    ftyp ++ box("moov", box("trak", mdia))
  }

  /** Declared audio metadata — the curation surface the stats walk
    * doesn't carry: who/what an audio asset SAYS it is. Null fields
    * when the tag or frame is absent; `tag_format` names the carrier.
    */
  val AudioTagsSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("artist", StringType),
    StructField("album", StringType),
    StructField("tag_format", StringType)))

  /** Reverse ID3v2 unsynchronisation: drop every 0x00 that
    * immediately follows an 0xFF (the inserted stuffing byte).
    */
  private def id3DeUnsync(a: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](a.length)
    var i = 0
    var n = 0
    while (i < a.length) {
      out(n) = a(i); n += 1
      if (a(i) == 0xFF.toByte && i + 1 < a.length && a(i + 1) == 0) i += 2
      else i += 1
    }
    if (n == a.length) a else java.util.Arrays.copyOf(out, n)
  }

  /** Walk the readable frames of a leading ID3v2.2/2.3/2.4 tag:
    * syncsafe tag size, optional extended header (v2.3 plain-size,
    * v2.4 syncsafe self-inclusive), per-frame sizes plain u32 (v2.3),
    * syncsafe (v2.4) or u24 (v2.2's 6-byte headers).
    * Unsynchronised regions are de-unsynchronised before delivery —
    * whole-tag for v2.2/v2.3, per-frame for v2.4 (the global flag or
    * the frame's 0x02 format bit), matching the spec's application
    * scope, so a tag whose frames carry 0xFF 0x00 stuffing reads back
    * the original bytes instead of shifted garbage. Compressed or
    * encrypted frames are skipped, not misread; a v2.2 tag with the
    * compression header bit is unreadable by spec and reports -1.
    * Stops cleanly at padding. Calls `f(id, frame, from, until)` per
    * readable frame body; returns the tag's major version, or -1 when
    * no ID3v2 tag leads the bytes — the ONE walk behind the text tags
    * ([[id3v2Tags]]) and the embedded cover art ([[id3Apic]]), so the
    * two surfaces can never disagree on frame boundaries.
    */
  private def id3FrameWalk(b: Array[Byte])(
      f: (String, Array[Byte], Int, Int) => Unit): Int = {
    if (b == null || b.length < 10 ||
      !(b(0) == 'I' && b(1) == 'D' && b(2) == '3')) return -1
    val ver = b(3) & 0xff
    if (ver != 2 && ver != 3 && ver != 4) return -1
    val unsync = (b(5) & 0x80) != 0
    if (ver == 2 && (b(5) & 0x40) != 0) return -1 // v2.2 compression bit
    @inline def syncsafeHdr(o: Int): Int =
      ((b(o) & 0x7f) << 21) | ((b(o + 1) & 0x7f) << 14) |
        ((b(o + 2) & 0x7f) << 7) | (b(o + 3) & 0x7f)
    val tagEnd = math.min(b.length.toLong, 10L + syncsafeHdr(6)).toInt
    if (tagEnd <= 10) return -1
    // the frames region; v2.2/v2.3 unsync applies to the whole tag
    val body0 = java.util.Arrays.copyOfRange(b, 10, tagEnd)
    val body = if (unsync && ver != 4) id3DeUnsync(body0) else body0
    @inline def syncsafe(o: Int): Int =
      ((body(o) & 0x7f) << 21) | ((body(o + 1) & 0x7f) << 14) |
        ((body(o + 2) & 0x7f) << 7) | (body(o + 3) & 0x7f)
    @inline def u32(o: Int): Long =
      ((body(o) & 0xffL) << 24) | ((body(o + 1) & 0xffL) << 16) |
        ((body(o + 2) & 0xffL) << 8) | (body(o + 3) & 0xffL)
    val end = body.length
    var pos = 0
    if (ver >= 3 && (b(5) & 0x40) != 0) { // extended header
      if (pos + 4 > end) return -1
      val extLen =
        if (ver == 4) syncsafe(pos) // self-inclusive
        else u32(pos).toInt + 4 // v2.3: size field excludes itself
      if (extLen < 4 || pos + extLen > end) return -1
      pos += extLen
    }
    val hdrLen = if (ver == 2) 6 else 10
    var break = false
    while (!break && pos + hdrLen <= end) {
      if (body(pos) == 0) break = true // padding reached
      else if (ver == 2) {
        val id = new String(body, pos, 3, "ISO-8859-1")
        val size = ((body(pos + 3) & 0xff) << 16) |
          ((body(pos + 4) & 0xff) << 8) | (body(pos + 5) & 0xff)
        if (size < 0 || pos + 6 + size > end) break = true
        else {
          f(id, body, pos + 6, pos + 6 + size)
          pos += 6 + size
        }
      } else {
        val id = new String(body, pos, 4, "ISO-8859-1")
        val size = if (ver == 4) syncsafe(pos + 4) else u32(pos + 4).toInt
        val fmtFlags = body(pos + 9) & 0xff
        if (size < 0 || pos + 10 + size > end) break = true
        else {
          // v2.3 frame flags byte 2: 0x80 compressed / 0x40 encrypted;
          // v2.4: 0x08 compressed / 0x04 encrypted — skip, never misread
          val unreadable =
            if (ver == 3) (fmtFlags & 0xC0) != 0
            else (fmtFlags & 0x0C) != 0
          if (!unreadable) {
            var from = pos + 10
            var until = pos + 10 + size
            var frame = body
            if (ver == 4) {
              if ((fmtFlags & 0x01) != 0 && until - from >= 4) from += 4 // data-length indicator
              if (unsync || (fmtFlags & 0x02) != 0) {
                frame = id3DeUnsync(java.util.Arrays.copyOfRange(body, from, until))
                from = 0; until = frame.length
              }
            }
            f(id, frame, from, until)
          }
          pos += 10 + size
        }
      }
    }
    ver
  }

  /** ID3v2.2/2.3/2.4 text frames (TIT2/TPE1/TALB; v2.2's 3-char
    * TT2/TP1/TAL) from the tag most MP3 and ADTS uploads lead with —
    * text encodings 0 latin-1, 1 UTF-16 with BOM, 2 UTF-16BE,
    * 3 UTF-8; values NUL-trimmed (a v2.4 multi-value list reports its
    * first). Frame boundaries, unsynchronisation scope, and the
    * compressed/encrypted skip rules are [[id3FrameWalk]]'s. None
    * when no ID3v2 tag leads the bytes.
    */
  private[graft] def id3v2Tags(b: Array[Byte]): Option[(String, String, String, String)] = {
    var title: String = null
    var artist: String = null
    var album: String = null
    def text(a: Array[Byte], from: Int, until: Int): String = {
      if (until <= from + 1) return ""
      val enc = a(from) & 0xff
      val raw = enc match {
        case 0 => new String(a, from + 1, until - from - 1, "ISO-8859-1")
        case 1 => new String(a, from + 1, until - from - 1, "UTF-16")
        case 2 => new String(a, from + 1, until - from - 1, "UTF-16BE")
        case _ => new String(a, from + 1, until - from - 1, "UTF-8")
      }
      val nul = raw.indexOf('\u0000')
      if (nul >= 0) raw.substring(0, nul) else raw
    }
    val ver = id3FrameWalk(b) { (id, frame, from, until) =>
      id match {
        case "TIT2" | "TT2" => title = text(frame, from, until)
        case "TPE1" | "TP1" => artist = text(frame, from, until)
        case "TALB" | "TAL" => album = text(frame, from, until)
        case _ => ()
      }
    }
    if (ver < 0) None else Some((title, artist, album, s"id3v2.$ver"))
  }

  /** Embedded cover art from an ID3v2 `APIC` frame (v2.2's `PIC`):
    * (mime, image bytes) of the first art-carrying frame. The v2.2
    * form stores a 3-char image format instead of a MIME string;
    * UTF-16-encoded descriptions terminate on an ALIGNED double-NUL
    * (a single 0x00 can be the high byte of a code unit, so the
    * latin-1 scan would split art data). None when no tag, no
    * picture frame, or an empty/truncated payload. Frame boundaries
    * and unsynchronisation are [[id3FrameWalk]]'s, so the art can
    * never disagree with the text tags on where frames live.
    */
  private[graft] def id3Apic(b: Array[Byte]): Option[(String, Array[Byte])] = {
    var mime: String = null
    var art: Array[Byte] = null
    id3FrameWalk(b) { (id, frame, from, until) =>
      if (art == null && (id == "APIC" || id == "PIC") && until - from >= 4) {
        val enc = frame(from) & 0xff
        var p = from + 1
        var m: String = null
        if (id == "PIC") {
          if (until - p >= 3) {
            m = new String(frame, p, 3, "ISO-8859-1").trim match {
              case "PNG" => "image/png"
              case "JPG" => "image/jpeg"
              case other => "image/" + other.toLowerCase(java.util.Locale.ROOT)
            }
            p += 3
          }
        } else {
          var z = p
          while (z < until && frame(z) != 0) z += 1
          if (z < until) {
            m = new String(frame, p, z - p, "ISO-8859-1")
            p = z + 1
          }
        }
        if (m != null && p < until) {
          p += 1 // picture type byte
          if (enc == 1 || enc == 2) { // UTF-16 description: aligned double-NUL
            while (p + 1 < until && !(frame(p) == 0 && frame(p + 1) == 0)) p += 2
            p += 2
          } else {
            while (p < until && frame(p) != 0) p += 1
            p += 1
          }
          if (p < until) {
            mime = m
            art = java.util.Arrays.copyOfRange(frame, p, until)
          }
        }
      }
    }
    if (art == null) None else Some((mime, art))
  }

  /** Unsynchronised-lyrics text from an ID3v2 `USLT` frame (v2.2's
    * `ULT`): enc byte, 3-char language, NUL-terminated content
    * descriptor (double-NUL when the encoding is UTF-16), then the
    * lyrics text in the frame's encoding. First non-empty frame wins;
    * None when no tag or no lyrics frame.
    */
  private[graft] def id3Lyrics(b: Array[Byte]): Option[String] = {
    var lyrics: String = null
    id3FrameWalk(b) { (id, frame, from, until) =>
      if (lyrics == null && (id == "USLT" || id == "ULT") &&
        until - from >= 6) {
        val enc = frame(from) & 0xff
        var p = from + 4 // enc + language
        if (enc == 1 || enc == 2) { // UTF-16 descriptor: aligned double-NUL
          while (p + 1 < until && !(frame(p) == 0 && frame(p + 1) == 0)) p += 2
          p += 2
        } else {
          while (p < until && frame(p) != 0) p += 1
          p += 1
        }
        if (p < until) {
          val raw = enc match {
            case 0 => new String(frame, p, until - p, "ISO-8859-1")
            case 1 => new String(frame, p, until - p, "UTF-16")
            case 2 => new String(frame, p, until - p, "UTF-16BE")
            case _ => new String(frame, p, until - p, "UTF-8")
          }
          val nul = raw.indexOf(0.toChar)
          val t = (if (nul >= 0) raw.substring(0, nul) else raw).trim
          if (t.nonEmpty) lyrics = t
        }
      }
    }
    Option(lyrics)
  }

  /** SYNCHRONIZED lyrics from an ID3v2 `SYLT` frame (v2.2's `SLT`) —
    * [[id3Lyrics]]' timed twin, in the [[SubCue]] shape the LRC
    * sidecar path already defines: enc byte, 3-char language, 1-byte
    * timestamp format (2 = milliseconds; 1 = MPEG frame index,
    * converted through the STREAM'S OWN frame duration — the
    * [[mpegAudioInfo]] walk already knows samples-per-frame and
    * sample rate, so frame × samplesPerFrame × 1000 / rate is exact;
    * a format-1 tag on an unreadable audio stream stays None), 1-byte
    * content type, NUL-terminated descriptor (aligned double-NUL
    * under UTF-16), then repeated (NUL-terminated text, u32
    * timestamp) sync entries. Entries may be written out of order;
    * cues sort by time and each ends at the NEXT cue's start (the
    * LRC rule — the format carries no end). None when no tag or no
    * resolvable SYLT.
    */
  private[graft] def id3SyltCues(b: Array[Byte]): Option[Seq[SubCue]] = try {
    // ms-format frames always win; frame-index (format 1) entries
    // are kept SEPARATELY and used only when no ms frame yielded
    // anything — a later format-2 frame must never be suppressed by
    // an earlier format-1 one (multi-frame tags carry per-language
    // SYLT frames)
    val rawMs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val rawFr = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    id3FrameWalk(b) { (id, frame, from, until) =>
      if ((id == "SYLT" || id == "SLT") && until - from >= 7 &&
        from + 5 <= frame.length) {
        val enc = frame(from) & 0xff
        val tsFormat = frame(from + 4) & 0xff
        val raw = if (tsFormat == 1) rawFr else rawMs
        if (raw.isEmpty && (tsFormat == 2 || tsFormat == 1)) {
          var p = from + 6 // enc + lang + format + content type
          // descriptor
          if (enc == 1 || enc == 2) {
            while (p + 1 < until && !(frame(p) == 0 && frame(p + 1) == 0)) p += 2
            p += 2
          } else {
            while (p < until && frame(p) != 0) p += 1
            p += 1
          }
          // sync entries: text NUL timestamp, repeated
          while (p < until && raw.size < 100000) {
            val t0 = p
            if (enc == 1 || enc == 2) {
              while (p + 1 < until && !(frame(p) == 0 && frame(p + 1) == 0)) p += 2
              val text = enc match {
                case 1 => new String(frame, t0, p - t0, "UTF-16")
                case _ => new String(frame, t0, p - t0, "UTF-16BE")
              }
              p += 2
              if (p + 4 <= until) {
                val ms = ((frame(p) & 0xffL) << 24) | ((frame(p + 1) & 0xffL) << 16) |
                  ((frame(p + 2) & 0xffL) << 8) | (frame(p + 3) & 0xffL)
                p += 4
                val t = text.trim
                if (t.nonEmpty) raw += ((ms, t))
              } else p = until
            } else {
              while (p < until && frame(p) != 0) p += 1
              val text = new String(frame, t0, p - t0,
                if (enc == 0) "ISO-8859-1" else "UTF-8")
              p += 1
              if (p + 4 <= until) {
                val ms = ((frame(p) & 0xffL) << 24) | ((frame(p + 1) & 0xffL) << 16) |
                  ((frame(p + 2) & 0xffL) << 8) | (frame(p + 3) & 0xffL)
                p += 4
                val t = text.trim
                if (t.nonEmpty) raw += ((ms, t))
              } else p = until
            }
          }
        }
      }
    }
    if (rawMs.isEmpty && rawFr.isEmpty) None
    else {
      // format 1: timestamps are MPEG frame indices — convert on the
      // stream's own clock; unreadable audio = unresolvable tag
      val entries: Seq[(Long, String)] =
        if (rawMs.nonEmpty) rawMs.toSeq
        else mpegAudioInfo(b) match {
          case Some(info) if info.nFrames > 0 && info.sampleRate > 0 &&
            info.totalSamples > 0 =>
            val samplesPerFrame = info.totalSamples / info.nFrames
            rawFr.toSeq.map { case (fr, text) =>
              (fr * samplesPerFrame * 1000L / info.sampleRate, text)
            }
          case _ => return None
        }
      val sorted = entries.sortBy(_._1)
      Some(sorted.zipWithIndex.map { case ((ms, text), k) =>
        val end = if (k + 1 < sorted.length) sorted(k + 1)._1 else ms
        SubCue(k + 1, ms, end, text)
      })
    }
  } catch { case _: Throwable => None } // per-row isolation

  /** Podcast chapters from ID3v2 `CHAP` frames (the id3v2-chapters
    * addendum every podcast app writes): elementID (latin-1, NUL),
    * u32 start/end ms, u32 start/end byte offsets (ignored), then
    * EMBEDDED sub-frames — the title is the embedded `TIT2` when
    * present, else the elementID. When a `CTOC` table of contents is
    * present, its child-element order IS the chapter order (the
    * addendum's point: the toc, not file offsets or timestamps,
    * declares the listing) — the first top-level (`0x02`-flagged)
    * CTOC wins (a lone un-flagged toc counts as the root; several
    * un-flagged ones are sub-sections and don't reorder anything),
    * CHAPs it doesn't list append in start order, and
    * without any CTOC chapters sort by start as before. v2.3 and
    * v2.4 embedded-frame size formats both handled. None when no
    * tag or no CHAP frame.
    */
  private[graft] def id3Chapters(b: Array[Byte]): Option[Seq[SubCue]] = try {
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, String)]
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Int, Int)]
    val tocs = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Int, Int)]
    val ver = id3FrameWalk(b) { (id, frame, from, until) =>
      if (id == "CHAP" && until - from >= 17 && frames.size < 10000)
        frames += ((frame, from, until))
      else if (id == "CTOC" && until - from >= 3 && tocs.size < 64)
        tocs += ((frame, from, until))
    }
    if (ver < 0 || frames.isEmpty) return None
    frames.foreach { case (frame, from, until) =>
      var p = from
      while (p < until && frame(p) != 0) p += 1
      val elementId = new String(frame, from, p - from, "ISO-8859-1")
      p += 1
      if (p + 16 <= until) {
        @inline def u32(o: Int): Long =
          ((frame(o) & 0xffL) << 24) | ((frame(o + 1) & 0xffL) << 16) |
            ((frame(o + 2) & 0xffL) << 8) | (frame(o + 3) & 0xffL)
        val st = u32(p)
        val en = u32(p + 4)
        p += 16 // times + byte offsets
        // embedded sub-frames in the OUTER tag's frame format
        var title: String = null
        while (title == null && p + 10 <= until) {
          val fid = new String(frame, p, 4, "ISO-8859-1")
          val size =
            if (ver == 4)
              ((frame(p + 4) & 0x7f) << 21) | ((frame(p + 5) & 0x7f) << 14) |
                ((frame(p + 6) & 0x7f) << 7) | (frame(p + 7) & 0x7f)
            else u32(p + 4).toInt
          if (size < 0 || p + 10 + size > until) p = until
          else {
            if (fid == "TIT2" && size >= 1) {
              val enc = frame(p + 10) & 0xff
              val t = enc match {
                case 0 => new String(frame, p + 11, size - 1, "ISO-8859-1")
                case 1 => new String(frame, p + 11, size - 1, "UTF-16")
                case 2 => new String(frame, p + 11, size - 1, "UTF-16BE")
                case _ => new String(frame, p + 11, size - 1, "UTF-8")
              }
              val nul = t.indexOf(0.toChar)
              title = (if (nul >= 0) t.substring(0, nul) else t).trim
            }
            p += 10 + size
          }
        }
        if (en >= st)
          raw += ((st, en, if (title != null && title.nonEmpty) title
          else elementId, elementId))
      }
    }
    if (raw.isEmpty) return None
    // CTOC payload: elementID NUL, flags (0x02 top-level, 0x01
    // ordered), entry count, child elementIDs NUL each
    def tocChildren(t: (Array[Byte], Int, Int)): (Boolean, Seq[String]) = {
      val (frame, from, until) = t
      var p = from
      while (p < until && frame(p) != 0) p += 1
      if (p + 3 > until) return (false, Nil)
      val flags = frame(p + 1) & 0xff
      val n = frame(p + 2) & 0xff
      p += 3
      val ids = scala.collection.mutable.ArrayBuffer.empty[String]
      var k = 0
      while (k < n && p < until) {
        val s = p
        while (p < until && frame(p) != 0) p += 1
        ids += new String(frame, s, p - s, "ISO-8859-1")
        p += 1; k += 1
      }
      ((flags & 0x02) != 0, ids.toSeq)
    }
    val parsedTocs = tocs.map(tocChildren).filter(_._2.nonEmpty)
    // the ROOT listing only: the first top-level (0x02) toc — or the
    // file's single CTOC when the writer forgot the flag. Multiple
    // un-flagged tocs are sub-sections; ordering the whole list by
    // one section's partial children would silently reshuffle it, so
    // that shape keeps the start-sort fallback.
    val tocOrder: Option[Map[String, Int]] =
      parsedTocs.find(_._1)
        .orElse(if (parsedTocs.length == 1) parsedTocs.headOption else None)
        .map(_._2.zipWithIndex.toMap)
    val sorted = raw.sortBy(r => (r._1, r._2)).toSeq
    val ordered = tocOrder match {
      case Some(pos) =>
        // stable: listed chapters in toc position, the rest (CHAPs
        // the toc doesn't mention) keep their start order after
        val (listed, rest) = sorted.partition(r => pos.contains(r._4))
        listed.sortBy(r => pos(r._4)) ++ rest
      case None => sorted
    }
    Some(ordered.zipWithIndex.map {
      case ((st, en, t, _), k) => SubCue(k + 1, st, en, t)
    })
  } catch { case _: Throwable => None } // per-row isolation

  /** Matroska/WebM chapters — `Chapters/EditionEntry/ChapterAtom`
    * with `ChapterTimeStart`/`ChapterTimeEnd` (ns) and the
    * `ChapterDisplay/ChapString` title, returned with the DocType
    * so callers don't re-parse the header for the label. NESTED
    * ChapterAtoms (legal per spec) each commit their own scratch —
    * parent state is saved around the recursion. An atom without an
    * end time ends where the next chapter starts (the last is
    * zero-length) — the LRC rule. Same EBML reading and depth-cap
    * discipline as [[webmInfo]]; None for non-EBML bytes or no
    * chapter atom.
    */
  private[graft] def webmChapters(b: Array[Byte]): Option[(String, Seq[SubCue])] = try {
    if (b == null || b.length < 8 ||
      !(b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
        b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)) return None
    @inline def vintLen(o: Int): Int = {
      if (o >= b.length) return -1
      val b0 = b(o) & 0xff
      if (b0 == 0) -1 else Integer.numberOfLeadingZeros(b0) - 23
    }
    def readId(o: Int): Long = {
      val n = vintLen(o)
      if (n < 1 || n > 4 || o + n > b.length) return -1L
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    def readSize(o: Int): (Long, Int) = {
      val n = vintLen(o)
      if (n < 1 || n > 8 || o + n > b.length) return (-2L, 0)
      var v = (b(o) & 0xff & (0xff >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      (if (v == (1L << (7 * n)) - 1) -1L else v, n)
    }
    @inline def uintOf(from: Int, until: Int): Long = {
      var v = 0L
      var i = from
      while (i < until) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      v
    }
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    var docType: String = null
    var aStart = -1L
    var aEnd = -1L
    var aTitle: String = null
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16 || raw.size >= 10000) return
      var off = start
      while (off < end && raw.size < 10000) {
        val id = readId(off)
        if (id < 0) return
        val idLen = vintLen(off)
        val (size, szLen) = readSize(off + idLen)
        if (szLen == 0) return
        val body = off + idLen + szLen
        val isContainer = id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1043A770L | 0x45B9L |
               0xB6L | 0x80L => true
          case _ => false
        }
        val bodyEnd =
          if (size < 0) { if (isContainer) end else return }
          else if (size > end - body) { if (isContainer) end else return }
          else body + size.toInt
        id match {
          case _ if isContainer =>
            if (id == 0xB6L) {
              // NESTED ChapterAtoms each commit their own scratch:
              // save the parent's around the recursion
              val (ps, pe, pt) = (aStart, aEnd, aTitle)
              aStart = -1L; aEnd = -1L; aTitle = null
              walk(body, bodyEnd, depth + 1)
              if (aStart >= 0)
                raw += ((aStart / 1000000L,
                  if (aEnd >= aStart) aEnd / 1000000L else -1L,
                  if (aTitle == null) "" else aTitle))
              aStart = ps; aEnd = pe; aTitle = pt
            } else walk(body, bodyEnd, depth + 1)
          case 0x4282L => // DocType
            docType = new String(b, body, bodyEnd - body, "ISO-8859-1")
          case 0x91L => aStart = uintOf(body, bodyEnd) // ns
          case 0x92L => aEnd = uintOf(body, bodyEnd)
          case 0x85L => // ChapString
            aTitle = new String(b, body, bodyEnd - body,
              java.nio.charset.StandardCharsets.UTF_8)
          case _ => ()
        }
        off = bodyEnd
      }
    }
    walk(0, b.length, 0)
    if (raw.isEmpty) None
    else {
      val sorted = raw.sortBy(_._1).toSeq
      Some(((if (docType == null) "matroska" else docType),
        sorted.zipWithIndex.map { case ((st, en, t), k) =>
          val end = if (en >= 0) en
            else if (k + 1 < sorted.length) sorted(k + 1)._1 else st
          SubCue(k + 1, st, end, t)
        }))
    }
  } catch { case _: Throwable => None } // per-row isolation

  /** MP4/M4A/M4B chapters from the Nero `chpl` box under
    * `moov/udta` (the audiobook convention): fullbox + u32 reserved +
    * u8 count, entries of u64 start (100 ns units) + pascal-string
    * title. Ends follow the LRC rule (next start; last zero-length).
    * None for non-BMFF bytes or no chpl box.
    */
  private[graft] def mp4Chapters(b: Array[Byte]): Option[Seq[SubCue]] = try {
    if (b == null || b.length < 16 ||
      !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    @inline def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    var chplAt = -1
    var chplEnd = -1
    def walk(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 16) return
      var off = start
      while (chplAt < 0 && off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = new String(b, off.toInt + 4, 4, "ISO-8859-1")
        var body = off + 8
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) return
        id match {
          case "moov" | "udta" => walk(body, boxEnd, depth + 1)
          case "chpl" => chplAt = body.toInt; chplEnd = boxEnd.toInt
          case _ => ()
        }
        off = boxEnd
      }
    }
    walk(0L, b.length.toLong, 0)
    if (chplAt < 0 || chplEnd - chplAt < 9) return None
    var p = chplAt + 8 // fullbox version/flags + u32 reserved
    val count = b(p) & 0xff
    p += 1
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var i = 0
    while (i < count && p + 9 <= chplEnd) {
      val startMs = u64(p) / 10000L // 100 ns units
      val len = b(p + 8) & 0xff
      p += 9
      if (p + len > chplEnd) return None
      raw += ((startMs, new String(b, p, len,
        java.nio.charset.StandardCharsets.UTF_8)))
      p += len
      i += 1
    }
    if (raw.isEmpty) None
    else {
      val sorted = raw.sortBy(_._1).toSeq
      Some(sorted.zipWithIndex.map { case ((st, t), k) =>
        val end = if (k + 1 < sorted.length) sorted(k + 1)._1 else st
        SubCue(k + 1, st, end, t)
      })
    }
  } catch { case _: Throwable => None } // per-row isolation

  /** Explode media chapters into rows:
    * (id, chap_format, chap_idx, start_ms, end_ms, title) —
    * [[subtitleCues]]' segmentation twin for the audiobook/podcast
    * surface: ID3 `CHAP` frames (format `id3`), Matroska `Chapters`
    * (`matroska`/`webm` DocType), the Nero `chpl` box (`chpl`). One
    * map-only flatMap; chapterless rows yield nothing. The
    * (start_ms, end_ms) segments drive clip cutting exactly like cue
    * intervals.
    */
  def mediaChapters(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idField = inSchema(inSchema.fieldIndex(idCol))
    val outSchema = StructType(Seq(idField,
      StructField("chap_format", StringType),
      StructField("chap_idx", IntegerType),
      StructField("start_ms", LongType),
      StructField("end_ms", LongType),
      StructField("title", StringType)))
    val idIdx = inSchema.fieldIndex(idCol)
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.flatMap { row =>
      val bytes =
        if (!row.isNullAt(contentIdx)) row.getAs[Array[Byte]](contentIdx)
        else null
      mediaChaptersOf(bytes) match {
        case Some((fmt, chaps)) => chaps.map(c =>
          Row(row.get(idIdx), fmt, c.idx, c.startMs, c.endMs, c.text))
        case None => Nil
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The per-row chapter dispatch behind [[mediaChapters]] and the
    * card's `pct_audio_with_chapters` counter — ONE rule for what
    * counts as a chaptered asset across the four carrier
    * conventions.
    */
  private[graft] def mediaChaptersOf(
      bytes: Array[Byte]): Option[(String, Seq[SubCue])] = {
    if (bytes == null || bytes.length < 10) None
    else if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3')
      id3Chapters(bytes).map(("id3", _))
    else if (bytes(0) == 0x1A.toByte && bytes(1) == 0x45.toByte &&
      bytes(2) == 0xDF.toByte && bytes(3) == 0xA3.toByte)
      webmChapters(bytes) // one pass: the walk carries its DocType
    else if (bytes.length >= 16 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p')
      mp4Chapters(bytes).map(("chpl", _))
        // the QuickTime convention: a text track another trak
        // references via tref/chap IS the chapter list
        .orElse(mp4QtChapterCues(bytes).map(("chap", _)))
    // the ogg-chapter-extension convention: CHAPTERnnn Vorbis fields
    // (Opus/Vorbis streams and FLAC's comment block alike)
    else if (bytes(0) == 'O' && bytes(1) == 'g' && bytes(2) == 'g' &&
      bytes(3) == 'S')
      opusCommentRegion(bytes).orElse(vorbisOggCommentRegion(bytes))
        .flatMap { case (arr, f, u) => vorbisChapterCues(arr, f, u) }
        .map(("vorbis", _))
    else if (bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
      bytes(3) == 'C')
      flacCommentRegion(bytes)
        .flatMap { case (f, u) => vorbisChapterCues(bytes, f, u) }
        .map(("vorbis", _))
    else None
  }

  /** The facts an M4A `ilst` item list declares — text tags plus the
    * `covr` cover art ([[m4aTags]] and [[embeddedArtBytes]] both read
    * from this ONE walk).
    */
  private final case class IlstFacts(title: String, artist: String,
      album: String, artMime: String, art: Array[Byte],
      lyrics: String)

  /** iTunes-style item list from an M4A's `moov/udta/meta/ilst`: the
    * `©nam`/`©ART`/`©alb` atoms' `data` payloads (type 1 = UTF-8,
    * after the 8-byte type+locale preamble) and the `covr` atom's
    * image payload (type 13 = JPEG, 14 = PNG, 0 = implicit — sniffed
    * from the magic). None when the list is absent — header-facts-only
    * synthetics and movies report no tags.
    */
  private def m4aIlst(b: Array[Byte]): Option[IlstFacts] = {
    if (b == null || b.length < 16 ||
      !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    @inline def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    @inline def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    var title: String = null
    var artist: String = null
    var album: String = null
    var artMime: String = null
    var art: Array[Byte] = null
    var lyrics: String = null
    var sawIlst = false
    def dataText(start: Long, end: Long): String = {
      // first child `data` box: 4B type, 4B locale, then the value
      var off = start
      while (off + 16 <= end) {
        val size = u32(off.toInt)
        if (size < 8 || off + size > end) return null
        if (new String(b, off.toInt + 4, 4, "ISO-8859-1") == "data" &&
          (u32(off.toInt + 8) & 0xffffffL) == 1L)
          return new String(b, off.toInt + 16, (size - 16).toInt, "UTF-8")
        off += size
      }
      null
    }
    def dataArt(start: Long, end: Long): Unit = {
      var off = start
      while (off + 16 <= end) {
        val size = u32(off.toInt)
        if (size < 16 || off + size > end) return
        if (new String(b, off.toInt + 4, 4, "ISO-8859-1") == "data") {
          val from = off.toInt + 16
          val until = (off + size).toInt
          val m = (u32(off.toInt + 8) & 0xffffffL) match {
            case 13L => "image/jpeg"
            case 14L => "image/png"
            case 0L => // implicit: sniff the payload magic
              if (until - from >= 4 && b(from) == 0x89.toByte &&
                b(from + 1) == 'P') "image/png"
              else if (until - from >= 2 && b(from) == 0xFF.toByte &&
                b(from + 1) == 0xD8.toByte) "image/jpeg"
              else null
            case _ => null
          }
          if (m != null && until > from) {
            artMime = m
            art = java.util.Arrays.copyOfRange(b, from, until)
          }
          return
        }
        off += size
      }
    }
    def walk(start: Long, end: Long, inIlst: Boolean,
        depth: Int = 0): Unit = {
      if (depth > 16) return // crafted deep nesting: give up, not the stack
      var off = start
      while (off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = new String(b, off.toInt + 4, 4, "ISO-8859-1")
        var body = off + 8
        // size==1: ISO-BMFF 64-bit largesize at off+8 (mp4VideoTrack's rule)
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) return
        if (inIlst) {
          id match {
            case "©nam" => title = dataText(body, boxEnd)
            case "©ART" => artist = dataText(body, boxEnd)
            case "©alb" => album = dataText(body, boxEnd)
            case "©lyr" => lyrics = dataText(body, boxEnd)
            case "covr" if art == null => dataArt(body, boxEnd)
            case _ => ()
          }
        } else id match {
          case "moov" | "udta" => walk(body, boxEnd, inIlst = false, depth + 1)
          case "meta" => walk(body + 4, boxEnd, inIlst = false, depth + 1) // FULL box
          case "ilst" => sawIlst = true; walk(body, boxEnd, inIlst = true, depth + 1)
          case _ => ()
        }
        off = boxEnd
      }
    }
    walk(0L, b.length.toLong, inIlst = false)
    if (!sawIlst) None
    else Some(IlstFacts(title, artist, album, artMime, art, lyrics))
  }

  /** iTunes-style text tags ([[m4aIlst]]'s text surface). */
  private[graft] def m4aTags(b: Array[Byte]): Option[(String, String, String, String)] =
    m4aIlst(b).map(f => (f.title, f.artist, f.album, "m4a"))

  /** WAV declared tags — the RIFF `LIST`/`INFO` chunk's `INAM`
    * (title) / `IART` (artist) / `IPRD` (album) sub-chunks, the PCM
    * world's metadata convention. NUL-trimmed Latin-1/UTF-8 values;
    * word-aligned chunk walk like [[decodeWav]]. None for non-WAV
    * bytes or a file with no INFO list.
    */
  private[graft] def wavInfoTags(b: Array[Byte]): Option[(String, String, String, String)] = {
    if (b == null || b.length < 12 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    @inline def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def text(from: Int, until: Int): String = {
      var end = until
      while (end > from && b(end - 1) == 0) end -= 1 // NUL padding
      new String(b, from, end - from, java.nio.charset.StandardCharsets.UTF_8)
    }
    var title: String = null
    var artist: String = null
    var album: String = null
    var sawInfo = false
    var i = 12
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "ISO-8859-1")
      val size = le32(i + 4)
      if (size < 0 || size > Int.MaxValue - i - 9) return None // hostile
      val body = i + 8
      val bodyEnd = math.min(b.length.toLong, body + size).toInt
      if (id == "LIST" && bodyEnd - body >= 4 &&
        new String(b, body, 4, "ISO-8859-1") == "INFO") {
        sawInfo = true
        var j = body + 4
        while (j + 8 <= bodyEnd) {
          val sid = new String(b, j, 4, "ISO-8859-1")
          val ssize = le32(j + 4)
          if (ssize < 0 || j + 8 + ssize > bodyEnd) j = bodyEnd
          else {
            val sEnd = (j + 8 + ssize).toInt
            sid match {
              case "INAM" => title = text(j + 8, sEnd)
              case "IART" => artist = text(j + 8, sEnd)
              case "IPRD" => album = text(j + 8, sEnd)
              case _ => ()
            }
            j = sEnd + (ssize.toInt & 1) // word alignment
          }
        }
      }
      i = bodyEnd + (size.toInt & 1)
    }
    if (!sawInfo) None else Some((title, artist, album, "wav"))
  }

  /** Splice a `LIST`/`INFO` tag chunk onto a WAV (e.g. [[renderWav]]
    * output) and fix up the RIFF size — the fixture builder for
    * [[wavInfoTags]].
    */
  private[graft] def wavWithInfoTags(wav: Array[Byte], title: String,
      artist: String, album: String): Array[Byte] = {
    def sub(id: String, v: String): Array[Byte] = {
      val s = v.getBytes(java.nio.charset.StandardCharsets.UTF_8) :+ 0.toByte
      val padded = if (s.length % 2 == 1) s :+ 0.toByte else s
      val bb = java.nio.ByteBuffer.allocate(8 + padded.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("ISO-8859-1")).putInt(s.length).put(padded)
      bb.array()
    }
    val body = "INFO".getBytes("ISO-8859-1") ++
      sub("INAM", title) ++ sub("IART", artist) ++ sub("IPRD", album)
    val list = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    list.put("LIST".getBytes("ISO-8859-1")).putInt(body.length).put(body)
    val out = wav ++ list.array()
    // RIFF size field = file length - 8
    val sz = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(out.length - 8).array()
    System.arraycopy(sz, 0, out, 4, 4)
    out
  }

  /** Matroska/WebM declared tags — the `Tags/Tag/SimpleTag` tree's
    * TITLE/ARTIST/ALBUM TagName→TagString pairs (names matched
    * case-insensitively per the Matroska spec's UPPERCASE
    * convention). Depth-capped EBML walk like [[webmInfo]]. None for
    * non-EBML bytes or a file declaring no Tags element.
    */
  private[graft] def webmTags(b: Array[Byte]): Option[(String, String, String, String)] = try {
    if (b == null || b.length < 8 ||
      !(b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
        b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)) return None
    @inline def vintLen(o: Int): Int = {
      if (o >= b.length) return -1
      val b0 = b(o) & 0xff
      if (b0 == 0) -1 else Integer.numberOfLeadingZeros(b0) - 23
    }
    def readId(o: Int): Long = {
      val n = vintLen(o)
      if (n < 1 || n > 4 || o + n > b.length) return -1L
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      v
    }
    def readSize(o: Int): (Long, Int) = {
      val n = vintLen(o)
      if (n < 1 || n > 8 || o + n > b.length) return (-2L, 0)
      var v = (b(o) & 0xff & (0xff >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      (if (v == (1L << (7 * n)) - 1) -1L else v, n)
    }
    var title: String = null
    var artist: String = null
    var album: String = null
    var sawTags = false
    // per-SimpleTag scratch
    var tagName: String = null
    var tagValue: String = null
    def commitSimpleTag(): Unit = {
      if (tagName != null && tagValue != null)
        tagName.toUpperCase(java.util.Locale.ROOT) match {
          case "TITLE" => title = tagValue
          case "ARTIST" => artist = tagValue
          case "ALBUM" => album = tagValue
          case _ => ()
        }
      tagName = null; tagValue = null
    }
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16) return
      var off = start
      while (off < end) {
        val id = readId(off)
        if (id < 0) return
        val idLen = vintLen(off)
        val (size, szLen) = readSize(off + idLen)
        if (szLen == 0) return
        val body = off + idLen + szLen
        val isContainer = id match {
          case 0x18538067L | 0x1254C367L | 0x7373L | 0x67C8L => true
          case _ => false
        }
        val bodyEnd =
          if (size < 0) { if (isContainer) end else return }
          else if (size > end - body) { if (isContainer) end else return }
          else body + size.toInt
        id match {
          case _ if isContainer =>
            if (id == 0x1254C367L) sawTags = true
            walk(body, bodyEnd, depth + 1)
            if (id == 0x67C8L) commitSimpleTag()
          case 0x45A3L => // TagName, UTF-8
            tagName = new String(b, body, bodyEnd - body,
              java.nio.charset.StandardCharsets.UTF_8)
          case 0x4487L => // TagString, UTF-8
            tagValue = new String(b, body, bodyEnd - body,
              java.nio.charset.StandardCharsets.UTF_8)
          case _ => ()
        }
        off = bodyEnd
      }
    }
    walk(0, b.length, 0)
    if (!sawTags) None else Some((title, artist, album, "matroska"))
  } catch { case _: Throwable => None }

  /** Append a `tags` struct ([[AudioTagsSchema]]) per row: ID3v2 if
    * the bytes lead with one, else the M4A item list, else the Vorbis
    * comments of a FLAC or Ogg-Opus/Ogg-Vorbis stream, else the WAV
    * `LIST INFO` chunk, else the Matroska `Tags` tree — the
    * [[audioStats]] batching/isolation discipline. All-null struct
    * for untagged or non-audio rows.
    */
  def audioTags(df: DataFrame, contentCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("tags", AudioTagsSchema))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          val tags =
            (try id3v2Tags(bytes).orElse(m4aTags(bytes))
              .orElse(flacTags(bytes)).orElse(opusTags(bytes))
              .orElse(vorbisTags(bytes)).orElse(wavInfoTags(bytes))
              .orElse(webmTags(bytes)).orElse(aiffTags(bytes))
            catch { case _: Throwable => None }) match {
              case Some((t, a, al, fmt)) => Row(t, a, al, fmt)
              case None => Row(null, null, null, null)
            }
          Row.fromSeq(row.toSeq :+ tags)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Embedded cover art across the carriers that declare one — the
    * ID3v2 `APIC`/`PIC` frame (MP3/AAC), the M4A `covr` item, the
    * FLAC `PICTURE` block: (mime, image bytes), or None. The
    * extracted bytes are ordinary images — [[decodePixels]],
    * dHash near-dup, and the exact-fingerprint dedup compose on them
    * directly, which is the point: cover art is the cross-modal
    * identity signal of a crawled audio corpus (re-encoded rips of
    * the same release share art long after the audio bytes diverge).
    */
  private[graft] def embeddedArtBytes(b: Array[Byte]): Option[(String, Array[Byte])] =
    try id3Apic(b)
      .orElse(m4aIlst(b).flatMap(f => Option(f.art).map(a => (f.artMime, a))))
      .orElse(flacPicture(b))
      .orElse(oggEmbeddedPicture(b))
      .orElse(webmAttachedPicture(b))
    catch { case _: Throwable => None } // per-row isolation

  /** Append `art_mime` (string) and `art` (binary) columns: the
    * embedded cover art of each audio row, null when none —
    * [[audioTags]]' batching/isolation discipline. Map-only: at
    * corpus scale the art column feeds the IMAGE dedup operators
    * (exact fingerprint groupBy or banded dHash join), so "group
    * audio by its cover art" costs one scan plus the image pipeline
    * it already shares.
    */
  def embeddedArt(df: DataFrame, contentCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("art_mime", StringType) :+ StructField("art", BinaryType))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          val (m, a) = embeddedArtBytes(bytes) match {
            case Some((mm, aa)) => (mm, aa)
            case None => (null, null)
          }
          Row.fromSeq(row.toSeq :+ m :+ a)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Declared lyrics across carriers — the audio-text pairing
    * surface (transcripts/lyrics turn an audio corpus into
    * (clip, text) training pairs): ID3v2 `USLT`/`ULT` (falling back
    * to the SYLT timed text, de-timed — a track tagged only with
    * synchronized lyrics still has lyrics), the M4A
    * `©lyr` item, and the Vorbis-comment `LYRICS` field of
    * FLAC / Ogg-Opus / Ogg-Vorbis streams. None when untagged.
    */
  private[graft] def audioLyricsText(b: Array[Byte]): Option[String] =
    try id3Lyrics(b)
      .orElse(id3SyltCues(b).map(_.map(_.text).mkString("\n")))
      .orElse(m4aIlst(b).flatMap(f => Option(f.lyrics)))
      .orElse(flacCommentRegion(b).flatMap { case (from, until) =>
        vorbisFieldMap(b, from, until, Set("LYRICS")).flatMap(_.get("LYRICS"))
      })
      .orElse(opusCommentRegion(b).flatMap { case (arr, from, until) =>
        vorbisFieldMap(arr, from, until, Set("LYRICS")).flatMap(_.get("LYRICS"))
      })
      .orElse(vorbisOggCommentRegion(b).flatMap { case (arr, from, until) =>
        vorbisFieldMap(arr, from, until, Set("LYRICS")).flatMap(_.get("LYRICS"))
      })
      .filter(_.nonEmpty)
    catch { case _: Throwable => None } // per-row isolation

  /** Append a `lyrics` string column ([[audioLyricsText]] per row) —
    * [[audioTags]]' discipline: map-only, null for untagged rows;
    * the column feeds the TEXT pipeline directly.
    */
  def audioLyrics(df: DataFrame, contentCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("lyrics", StringType))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          Row.fromSeq(row.toSeq :+ audioLyricsText(bytes).orNull)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Apply ID3v2 unsynchronisation: insert a 0x00 after every 0xFF
    * (the writer-side twin of [[id3DeUnsync]] — fixtures only).
    */
  private def id3Unsync(a: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(a.length + 16)
    var i = 0
    while (i < a.length) {
      out.write(a(i))
      if (a(i) == 0xFF.toByte) out.write(0)
      i += 1
    }
    out.toByteArray
  }

  /** A REAL ID3v2 tag with the given text frames — prepend to any
    * audio stream ([[syntheticMp3]] etc.; the stats walks skip ID3).
    * v2.2 writes 3-char frame IDs with u24 sizes and UTF-16 text;
    * v2.3 writes UTF-16-with-BOM titles and plain frame sizes; v2.4
    * writes UTF-8 and syncsafe sizes — the wild encodings. `unsync`
    * applies spec-scope unsynchronisation: whole-tag for v2.2/v2.3,
    * per-frame (with the 0x02 format bit) for v2.4; UTF-16 BOMs
    * guarantee the stream actually carries 0xFF bytes to stuff.
    */
  private[graft] def syntheticId3(version: Int, title: String,
      artist: String, album: String, unsync: Boolean = false,
      apic: Option[(String, Array[Byte])] = None,
      lyrics: Option[String] = None,
      syncedLyrics: Seq[(Long, String)] = Nil,
      chapters: Seq[(Long, Long, String)] = Nil,
      syltFormat: Int = 2,
      syncedLyrics2: Seq[(Long, String)] = Nil,
      syltFormat2: Int = 2,
      ctocOrder: Seq[Int] = Nil): Array[Byte] = {
    require(version == 2 || version == 3 || version == 4, s"version: $version")
    def rawFrame(id: String, payload0: Array[Byte]): Array[Byte] = {
      // v2.4: unsync is per-frame; the stored size counts stuffed bytes
      val payload =
        if (version == 4 && unsync) id3Unsync(payload0) else payload0
      val hdrLen = if (version == 2) 6 else 10
      val bb = java.nio.ByteBuffer.allocate(hdrLen + payload.length)
      bb.put(id.getBytes("ISO-8859-1"))
      val n = payload.length
      if (version == 2) {
        bb.put(((n >> 16) & 0xff).toByte).put(((n >> 8) & 0xff).toByte)
          .put((n & 0xff).toByte)
      } else if (version == 4) {
        bb.put(((n >> 21) & 0x7f).toByte).put(((n >> 14) & 0x7f).toByte)
          .put(((n >> 7) & 0x7f).toByte).put((n & 0x7f).toByte)
        bb.put(0.toByte).put(if (unsync) 0x02.toByte else 0.toByte)
      } else {
        bb.putInt(payload.length)
        bb.putShort(0)
      }
      bb.put(payload)
      bb.array()
    }
    def frame(id: String, value: String): Array[Byte] = rawFrame(id,
      if (version == 4) Array[Byte](3) ++ value.getBytes("UTF-8")
      else Array[Byte](1) ++ // UTF-16 with BOM
        Array[Byte](0xFF.toByte, 0xFE.toByte) ++ value.getBytes("UTF-16LE"))
    val ids =
      if (version == 2) Seq("TT2" -> title, "TP1" -> artist, "TAL" -> album)
      else Seq("TIT2" -> title, "TPE1" -> artist, "TALB" -> album)
    // cover art: v2.2's PIC stores a 3-char format; APIC a MIME string.
    // enc 0, picture type 3 (front cover), empty latin-1 description
    val apicFrame = apic.map { case (mime, art) =>
      if (version == 2)
        rawFrame("PIC", Array[Byte](0) ++
          (if (mime == "image/png") "PNG" else "JPG").getBytes("ISO-8859-1") ++
          Array[Byte](3, 0) ++ art)
      else
        rawFrame("APIC", Array[Byte](0) ++ mime.getBytes("ISO-8859-1") ++
          Array[Byte](0, 3, 0) ++ art)
    }.getOrElse(Array.emptyByteArray)
    // USLT (v2.2 ULT): enc + "eng" + empty NUL-terminated descriptor
    // (double-NUL under UTF-16) + the lyrics in the frame encoding
    val lyricsFrame = lyrics.map { text =>
      val payload =
        if (version == 4)
          Array[Byte](3) ++ "eng".getBytes("ISO-8859-1") ++ Array[Byte](0) ++
            text.getBytes("UTF-8")
        else
          Array[Byte](1) ++ "eng".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++
            Array[Byte](0xFF.toByte, 0xFE.toByte) ++ text.getBytes("UTF-16LE")
      rawFrame(if (version == 2) "ULT" else "USLT", payload)
    }.getOrElse(Array.emptyByteArray)
    // SYLT (v2.2 SLT): enc + "eng" + timestamp format (2 = the
    // syncedLyrics values are ms; 1 = they are MPEG frame indices) +
    // content type 1 (lyrics) + empty descriptor + (text NUL u32)
    // sync entries in the frame encoding
    def syltFrameFor(entries: Seq[(Long, String)],
        fmt: Int): Array[Byte] =
      if (entries.isEmpty) Array.emptyByteArray
      else {
        val out = new java.io.ByteArrayOutputStream()
        val utf8 = version == 4
        out.write(if (utf8) 3 else 1)
        out.write('e'); out.write('n'); out.write('g')
        out.write(fmt); out.write(1)
        if (utf8) out.write(0) else { out.write(0); out.write(0) }
        entries.foreach { case (ms, text) =>
          if (utf8) {
            out.write(text.getBytes("UTF-8"), 0,
              text.getBytes("UTF-8").length)
            out.write(0)
          } else {
            out.write(0xFF); out.write(0xFE)
            val u = text.getBytes("UTF-16LE")
            out.write(u, 0, u.length)
            out.write(0); out.write(0)
          }
          out.write(((ms >> 24) & 0xff).toInt); out.write(((ms >> 16) & 0xff).toInt)
          out.write(((ms >> 8) & 0xff).toInt); out.write((ms & 0xff).toInt)
        }
        rawFrame(if (version == 2) "SLT" else "SYLT", out.toByteArray)
      }
    val syltFrame = syltFrameFor(syncedLyrics, syltFormat) ++
      syltFrameFor(syncedLyrics2, syltFormat2)
    // CHAP (v2.3/v2.4 only — the chapters addendum postdates v2.2):
    // elementID NUL, u32 start/end ms, u32 offsets (unused =
    // 0xFFFFFFFF), embedded TIT2 in this version's frame format
    val chapFrames =
      if (chapters.isEmpty) Array.emptyByteArray
      else {
        require(version >= 3, "CHAP frames are a v2.3+ surface")
        chapters.zipWithIndex.toArray.flatMap { case ((st, en, title), k) =>
          val tit2 = frame("TIT2", title)
          val out = new java.io.ByteArrayOutputStream()
          val eid = s"chp$k".getBytes("ISO-8859-1")
          out.write(eid, 0, eid.length); out.write(0)
          def w32(v: Long): Unit = {
            out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
            out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
          }
          w32(st); w32(en); w32(0xFFFFFFFFL); w32(0xFFFFFFFFL)
          out.write(tit2, 0, tit2.length)
          rawFrame("CHAP", out.toByteArray)
        }
      }
    // CTOC (optional): a top-level + ordered toc whose child ids are
    // the CHAP elementIDs `chp<i>` in the given index order — the
    // declared listing a podcast app renders, independent of CHAP
    // frame order or timestamps
    val ctocFrame =
      if (ctocOrder.isEmpty) Array.emptyByteArray
      else {
        require(version >= 3 && chapters.nonEmpty,
          "CTOC needs v2.3+ and CHAP frames to reference")
        val out = new java.io.ByteArrayOutputStream()
        val eid = "toc".getBytes("ISO-8859-1")
        out.write(eid, 0, eid.length); out.write(0)
        out.write(0x03) // top-level | ordered
        out.write(ctocOrder.length)
        ctocOrder.foreach { i =>
          val c = s"chp$i".getBytes("ISO-8859-1")
          out.write(c, 0, c.length); out.write(0)
        }
        rawFrame("CTOC", out.toByteArray)
      }
    val frames0 = ids.flatMap { case (id, v) => frame(id, v) }.toArray ++
      apicFrame ++ lyricsFrame ++ syltFrame ++ ctocFrame ++ chapFrames
    // v2.2/v2.3: unsync applies to the whole composed tag
    val frames =
      if (unsync && version != 4) id3Unsync(frames0) else frames0
    val n = frames.length
    val flags: Byte = if (unsync) 0x80.toByte else 0
    Array[Byte]('I', 'D', '3', version.toByte, 0, flags,
      ((n >> 21) & 0x7f).toByte, ((n >> 14) & 0x7f).toByte,
      ((n >> 7) & 0x7f).toByte, (n & 0x7f).toByte) ++ frames
  }

  /** `udta/meta/ilst` tag atoms to append inside a `moov` —
    * [[syntheticM4a]]'s metadata companion (concat onto its `moov`
    * payload via [[syntheticM4aTagged]]).
    */
  private[graft] def syntheticM4aTagged(channels: Int, sampleRate: Int,
      nSamples: Long, title: String, artist: String,
      album: String, cover: Option[(String, Array[Byte])] = None,
      lyricsTag: Option[String] = None): Array[Byte] = {
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(id.getBytes("ISO-8859-1")).put(payload)
      out.array()
    }
    def atom(id: String, value: String): Array[Byte] =
      box(id, box("data",
        Array[Byte](0, 0, 0, 1, 0, 0, 0, 0) ++ value.getBytes("UTF-8")))
    val covr = cover.map { case (mime, art) =>
      val typ: Byte = if (mime == "image/png") 14 else 13
      box("covr", box("data", Array[Byte](0, 0, 0, typ, 0, 0, 0, 0) ++ art))
    }.getOrElse(Array.emptyByteArray)
    val ilst = box("ilst", atom("©nam", title) ++
      atom("©ART", artist) ++ atom("©alb", album) ++
      lyricsTag.map(atom("©lyr", _)).getOrElse(Array.emptyByteArray) ++ covr)
    val meta = box("meta", new Array[Byte](4) ++ ilst)
    val udta = box("udta", meta)
    // splice udta into the existing moov: rebuild the container with
    // the same trak payload plus the metadata
    val plain = syntheticM4a(channels, sampleRate, nSamples)
    // plain = ftyp ++ moov; moov starts right after ftyp
    val ftypLen = java.nio.ByteBuffer.wrap(plain, 0, 4).getInt
    val moovPayload = java.util.Arrays.copyOfRange(plain, ftypLen + 8, plain.length)
    java.util.Arrays.copyOfRange(plain, 0, ftypLen) ++
      box("moov", moovPayload ++ udta)
  }

  /** Serialized Vorbis comment region ([[vorbisFields]]'s writer
    * twin): vendor + TITLE/ARTIST/ALBUM fields, UTF-8.
    */
  private def vorbisCommentBytes(title: String, artist: String,
      album: String, lyrics: String = null,
      extraFields: Seq[String] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(n: Int): Unit = {
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    }
    def field(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      le32(b.length); out.write(b)
    }
    field("graft fixture")
    le32((if (lyrics == null) 3 else 4) + extraFields.length)
    field(s"TITLE=$title"); field(s"ARTIST=$artist"); field(s"ALBUM=$album")
    if (lyrics != null) field(s"LYRICS=$lyrics")
    extraFields.foreach(field)
    out.toByteArray
  }

  /** `CHAPTERnnn`/`CHAPTERnnnNAME` Vorbis fields for the given
    * (startMs, title) chapters — the ogg-chapter-extension writer
    * shared by the Opus/Vorbis/FLAC tagged fixtures.
    */
  private def vorbisChapterFieldStrings(
      chapters: Seq[(Long, String)]): Seq[String] =
    chapters.zipWithIndex.flatMap { case ((ms, nm), i) =>
      val stamp = f"${ms / 3600000}%02d:${ms % 3600000 / 60000}%02d:" +
        f"${ms % 60000 / 1000}%02d.${ms % 1000}%03d"
      Seq(f"CHAPTER${i + 1}%03d=$stamp", f"CHAPTER${i + 1}%03dNAME=$nm")
    }

  /** The BODY of a FLAC PICTURE block for the given (mime, art) —
    * what [[syntheticFlacTagged]] wraps in a type-6 metadata block
    * and the `METADATA_BLOCK_PICTURE` Vorbis field base64-encodes.
    */
  private def flacPictureBlockBodyBytes(mime: String,
      art: Array[Byte]): Array[Byte] = {
    val m = mime.getBytes("ISO-8859-1")
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + m.length + 4 + 16 + 4 + art.length)
    bb.putInt(3) // picture type: front cover
      .putInt(m.length).put(m)
      .putInt(0) // empty description
      .putInt(0).putInt(0).putInt(0).putInt(0) // width/height/depth/colors
      .putInt(art.length).put(art)
    bb.array()
  }

  /** [[syntheticFlac]] plus a VORBIS_COMMENT block (type 4) carrying
    * the given tags — STREAMINFO first (not last), comments last.
    */
  private[graft] def syntheticFlacTagged(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, title: String,
      artist: String, album: String,
      picture: Option[(String, Array[Byte])] = None,
      lyrics: Option[String] = None,
      chapters: Seq[(Long, String)] = Nil): Array[Byte] = {
    val base = syntheticFlac(sampleRate, channels, bitsPerSample, totalSamples)
    base(4) = 0 // STREAMINFO no longer the last block
    val body = vorbisCommentBytes(title, artist, album, lyrics.orNull,
      vorbisChapterFieldStrings(chapters))
    val n = body.length
    // the PICTURE block (type 6), when present, becomes the last block
    val pictureBlock = picture.map { case (mime, art) =>
      val pb = flacPictureBlockBodyBytes(mime, art)
      val pn = pb.length
      Array[Byte](0x86.toByte, ((pn >> 16) & 0xff).toByte,
        ((pn >> 8) & 0xff).toByte, (pn & 0xff).toByte) ++ pb
    }.getOrElse(Array.emptyByteArray)
    val commentHdr: Byte = if (picture.isEmpty) 0x84.toByte else 0x04.toByte
    base ++ Array[Byte](commentHdr, // type 4, last unless a picture follows
      ((n >> 16) & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      (n & 0xff).toByte) ++ body ++ pictureBlock
  }

  /** [[syntheticOpus]] plus the RFC 7845 `OpusTags` second packet
    * carrying the given tags.
    */
  private[graft] def syntheticOpusTagged(channels: Int, preSkip: Int,
      inputSampleRate: Int, lastGranule: Long, title: String,
      artist: String, album: String,
      lyrics: Option[String] = None,
      picture: Option[(String, Array[Byte])] = None,
      chapters: Seq[(Long, String)] = Nil): Array[Byte] = {
    val head = java.nio.ByteBuffer.allocate(19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("OpusHead".getBytes("ISO-8859-1")).put(1.toByte)
      .put(channels.toByte).putShort(preSkip.toShort)
      .putInt(inputSampleRate).putShort(0.toShort).put(0.toByte)
      .array()
    val tags = "OpusTags".getBytes("ISO-8859-1") ++
      vorbisCommentBytes(title, artist, album, lyrics.orNull,
        picture.toSeq.map { case (m, art) =>
          "METADATA_BLOCK_PICTURE=" + java.util.Base64.getEncoder
            .encodeToString(flacPictureBlockBodyBytes(m, art))
        } ++ vorbisChapterFieldStrings(chapters))
    oggPage(0x02, 0L, 0, head) ++
      oggPackedPages(0x00, 0L, 1, tags) ++
      oggPage(0x04, lastGranule, 2, Array[Byte](0))
  }

  /** One Ogg page with REAL segment lacing (255-byte runs + final
    * short segment), so fixture packets over 254 bytes — a
    * base64 `METADATA_BLOCK_PICTURE` tag easily is — still occupy
    * one structurally valid page. CRC left zero (the header walks
    * don't check it).
    */
  private def oggPage(headerType: Int, granule: Long, seq: Int,
      payload: Array[Byte]): Array[Byte] = {
    val full = payload.length / 255
    val rem = payload.length % 255
    val nSegs = full + 1
    require(nSegs <= 255, "fixture packet too large for one page")
    val bb = java.nio.ByteBuffer.allocate(27 + nSegs + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("OggS".getBytes("ISO-8859-1")).put(0.toByte)
      .put(headerType.toByte).putLong(granule).putInt(1).putInt(seq)
      .putInt(0) // crc unchecked by the header walks
      .put(nSegs.toByte)
    var i = 0
    while (i < full) { bb.put(0xFF.toByte); i += 1 }
    bb.put(rem.toByte).put(payload)
    bb.array()
  }

  /** A packet as one or MORE Ogg pages — [[oggPage]] splitting at
    * the 255-segment page ceiling the way real muxers do (RFC 3533
    * §6): every page but the last carries 255 lacings of 255 (the
    * packet continues) and the followers set header-type bit 0x01.
    * The fixture half of [[oggPacketFrom]]'s continuation stitching —
    * a spanning `METADATA_BLOCK_PICTURE` tag packet is the
    * real-cover-art shape.
    */
  private def oggPackedPages(headerType: Int, granule: Long, seqStart: Int,
      payload: Array[Byte]): Array[Byte] = {
    val pageMax = 255 * 255 // all-255 lacing: packet continues
    if (payload.length < pageMax)
      return oggPage(headerType, granule, seqStart, payload)
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    var seq = seqStart
    while (payload.length - off >= pageMax) {
      val bb = java.nio.ByteBuffer.allocate(27 + 255 + pageMax)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("OggS".getBytes("ISO-8859-1")).put(0.toByte)
        .put((if (off == 0) headerType else headerType | 0x01).toByte)
        .putLong(-1L) // granule -1: no packet ends on this page
        .putInt(1).putInt(seq).putInt(0).put(255.toByte)
      var i = 0
      while (i < 255) { bb.put(0xFF.toByte); i += 1 }
      bb.put(payload, off, pageMax)
      out.write(bb.array())
      off += pageMax
      seq += 1
    }
    out.write(oggPage(headerType | (if (off == 0) 0 else 0x01), granule,
      seq, java.util.Arrays.copyOfRange(payload, off, payload.length)))
    out.toByteArray
  }

  /** Minimal Ogg-Opus: an OpusHead page plus an EOS page with the
    * given granule position (header-facts fixture).
    */
  private[graft] def syntheticOpus(channels: Int, preSkip: Int,
      inputSampleRate: Int, lastGranule: Long): Array[Byte] = {
    def page(headerType: Int, granule: Long, seq: Int,
        payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 255, "single-segment fixture pages only")
      val bb = java.nio.ByteBuffer.allocate(27 + 1 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("OggS".getBytes("ISO-8859-1")).put(0.toByte)
        .put(headerType.toByte).putLong(granule).putInt(1).putInt(seq)
        .putInt(0) // crc unchecked by the header walk
        .put(1.toByte).put(payload.length.toByte).put(payload)
      bb.array()
    }
    val head = java.nio.ByteBuffer.allocate(19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("OpusHead".getBytes("ISO-8859-1")).put(1.toByte)
      .put(channels.toByte).putShort(preSkip.toShort)
      .putInt(inputSampleRate).putShort(0.toShort).put(0.toByte)
      .array()
    page(0x02, 0L, 0, head) ++
      page(0x04, lastGranule, 1, Array[Byte](0)) // EOS data page
  }

  /** Build a VALID MPEG Layer III stream with planted per-granule
    * `global_gain` values and zeroed main data — real headers, real
    * side-info geometry, deterministic bytes. The fixture kernel for
    * the MPEG walk (the [[syntheticMjpegAvi]] discipline): every
    * field [[mpegAudioInfo]] reports is a closed form of the
    * arguments. `frames` = per-frame (bitrateIdx, per-granule gains).
    */
  private[graft] def syntheticMp3(verId: Int, srIdx: Int, channels: Int,
      frames: Seq[(Int, Seq[Int])], id3Bytes: Int = 0): Array[Byte] = {
    require(verId == 3 || verId == 2 || verId == 0, s"verId: $verId")
    require(channels == 1 || channels == 2, s"channels: $channels")
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) { // a minimal ID3v2 tag the walk must skip
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      out.write(((id3Bytes >> 21) & 0x7f)); out.write(((id3Bytes >> 14) & 0x7f))
      out.write(((id3Bytes >> 7) & 0x7f)); out.write((id3Bytes & 0x7f))
      out.write(new Array[Byte](id3Bytes))
    }
    val mpeg1 = verId == 3
    val nGr = if (mpeg1) 2 else 1
    frames.foreach { case (brIdx, gains) =>
      require(brIdx >= 1 && brIdx <= 14, s"brIdx: $brIdx")
      require(gains.length == nGr, s"need $nGr granule gains")
      val br = MpegBitrates(if (mpeg1) 0 else 1)(2)(brIdx - 1)
      val sr = MpegRates(verId)(srIdx)
      val frameSize =
        if (mpeg1) 144 * br * 1000 / sr else 72 * br * 1000 / sr
      val f = new Array[Byte](frameSize)
      f(0) = 0xFF.toByte
      f(1) = (0xE0 | (verId << 3) | (1 << 1) | 1).toByte // layer III, no CRC
      f(2) = ((brIdx << 4) | (srIdx << 2)).toByte // no padding
      f(3) = (if (channels == 1) 3 << 6 else 0).toByte
      val base =
        if (mpeg1) 9 + (if (channels == 1) 5 else 3) + 4 * channels
        else 8 + (if (channels == 1) 1 else 2)
      val block = if (mpeg1) 59 else 63
      var gr = 0
      while (gr < nGr) {
        var ch = 0
        while (ch < channels) {
          val off = base + (gr * channels + ch) * block + 21
          var i = 0
          while (i < 8) { // plant the 8 global_gain bits after header
            val abs = 4L * 8 + off + i
            if (((gains(gr) >> (7 - i)) & 1) != 0)
              f((abs >> 3).toInt) = (f((abs >> 3).toInt) |
                (1 << (7 - (abs & 7)).toInt)).toByte
            i += 1
          }
          ch += 1
        }
        gr += 1
      }
      out.write(f)
    }
    out.toByteArray
  }

  val AudioStatsSchema: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("peak_norm", DoubleType),
    StructField("rms_norm", DoubleType),
    StructField("clip_ratio", DoubleType),
    StructField("silence_ratio", DoubleType),
    StructField("ok", BooleanType, nullable = false),
    StructField("error", StringType),
    StructField("codec", StringType),
    StructField("duration_ms", LongType),
    StructField("bitrate_kbps", DoubleType),
    StructField("vbr", BooleanType)))

  /** Per-asset PCM audio statistics — the content-derived curation
    * gates text already has ([[imageStats]] for pixels, this for
    * waveforms): peak and RMS amplitude normalized to full scale,
    * clipping ratio (|s| at/above full scale — distorted capture),
    * silence ratio (|s| ≤ `silence`·full-scale — dead air; gate
    * speech corpora on both). All sums are exact integer arithmetic
    * over the decoded samples (one long Σs² per asset), so a rendered
    * fixture's stats are closed forms of its sample function — the
    * q79 exact-oracle discipline for audio.
    *
    * MPEG audio (the MP3 family — what crawled corpora actually
    * carry) is recognized via [[mpegAudioInfo]]'s frame walk:
    * `codec`/`channels`/`sample_rate`/`n_samples`/`duration_ms`/
    * `bitrate_kbps`/`vbr` are REAL header-derived facts (`ok = true`,
    * duration exact from the frame count), while the sample-level
    * stats stay null — there is no PCM without a full Layer III
    * decode, and a null keeps downstream averages honest. Rows that
    * are neither degrade to error rows, never fail the scan. Batched
    * mapPartitions like [[decode]]; map-only, zero shuffles.
    */
  def audioStats(df: DataFrame, contentCol: String = "content",
      batchSize: Int = 64, silence: Double = 0.01): DataFrame = {
    require(silence >= 0 && silence < 1, s"silence must be in [0,1): $silence")
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("audio", AudioStatsSchema))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          // per-row isolation ([[decodePixels]] rule): a kernel defect
          // on one hostile row degrades to an error row, never fails
          // the task — the catch is OUTSIDE the codec dispatch so any
          // future walker bug is contained too
          val stats = try pcmSamples(bytes) match {
            case Some((ch, sr, bits, s)) if s.nonEmpty =>
              val fullScale = (1 << (bits - 1)) - 1 // 32767 / 127
              val silenceBar = (silence * fullScale).toInt
              var sumSq = 0L
              var peak = 0
              var clipped = 0L
              var silent = 0L
              var k = 0
              while (k < s.length) {
                val v = math.abs(s(k))
                sumSq += v.toLong * v
                if (v > peak) peak = v
                if (v >= fullScale) clipped += 1
                if (v <= silenceBar) silent += 1
                k += 1
              }
              val n = s.length
              def r6(x: Double): Double =
                BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              val durMs: java.lang.Long =
                if (sr > 0 && ch > 0) java.lang.Long.valueOf(
                  (n.toLong / ch) * 1000L / sr) else null
              Row(ch, sr, bits, n.toLong,
                r6(peak.toDouble / fullScale),
                r6(math.sqrt(sumSq.toDouble / n) / fullScale),
                r6(clipped.toDouble / n),
                r6(silent.toDouble / n), true, null,
                "pcm", durMs, sr.toDouble * bits * ch / 1000.0, false)
            case Some(_) =>
              Row(null, null, null, null, null, null, null, null, false,
                "empty data chunk", null, null, null, null)
            case None => mpegAudioInfo(bytes) match {
              case Some(m) =>
                def r3(x: Double): Double = BigDecimal(x)
                  .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
                Row(m.channels, m.sampleRate, null, m.totalSamples,
                  null, null, null, null, true, null,
                  s"mpeg${m.version}-l${m.layer}",
                  m.totalSamples * 1000L / m.sampleRate,
                  r3(m.avgBitrateKbps), m.vbr)
              case None => flacStreamInfo(bytes) match {
                case Some((ch, sr, bits, total)) =>
                  // header facts only — FLAC frames are not decoded, so
                  // sample stats stay null like MPEG; bitrate/vbr are
                  // not header facts for a lossless codec (left null)
                  Row(ch, sr, bits, total, null, null, null, null, true,
                    null, "flac", total * 1000L / sr, null, null)
                case None => opusInfo(bytes) match {
                  case Some((ch, preSkip, _, granule)) =>
                    // Opus decodes on a fixed 48 kHz clock whatever the
                    // OpusHead input rate was (RFC 7845 §5.1 calls the
                    // input rate informational only) — n_samples is
                    // measured on that clock, so sample_rate MUST report
                    // 48000 or n_samples/sample_rate disagrees with
                    // duration_ms. Cross-codec invariant, all rows:
                    // duration_ms == n_samples * 1000 / sample_rate.
                    val samples = math.max(0L, granule - preSkip)
                    Row(ch, 48000, null, samples, null, null, null,
                      null, true, null, "opus", samples * 1000L / 48000L,
                      null, null)
                  case None => vorbisInfo(bytes) match {
                    case Some((ch, sr, granule)) =>
                      // Vorbis granules are PCM samples at the
                      // stream's OWN rate (no fixed-clock rule like
                      // Opus); bitrate/vbr are not header facts
                      Row(ch, sr, null, granule, null, null, null,
                        null, true, null, "vorbis",
                        granule * 1000L / sr, null, null)
                    case None => adtsAudioInfo(bytes) match {
                    case Some(a) =>
                      def r3(x: Double): Double = BigDecimal(x)
                        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
                      // AAC frame sizes vary by content even at a fixed
                      // target rate, so vbr is not a header fact (null)
                      Row(a.channels, a.sampleRate, null, a.totalSamples,
                        null, null, null, null, true, null,
                        s"aac-${AdtsProfileNames(a.profile)}",
                        a.totalSamples * 1000L / a.sampleRate,
                        r3(a.avgBitrateKbps), null)
                    case None => m4aAudioInfo(bytes) match {
                      case Some((ch, sr, samples, fourcc)) =>
                        Row(ch, sr, null, samples, null, null, null, null,
                          true, null,
                          if (fourcc == "mp4a") "aac" else fourcc,
                          samples * 1000L / sr, null, null)
                      case None => webmInfo(bytes) match {
                        // audio-PRIMARY Matroska/WebM only (a movie's
                        // modality is video, the m4aAudioInfo rule);
                        // n_samples rescales the header duration onto
                        // the sample clock, exact when ms·rate ∤ 1000
                        // doesn't truncate (fixtures choose so)
                        case Some(w) if w.kind == "audio" &&
                            w.sampleRate != null =>
                          val sr = w.sampleRate.intValue()
                          val samples: java.lang.Long =
                            if (w.durationMs == null) null
                            else java.lang.Long.valueOf(
                              w.durationMs.longValue() * sr / 1000L)
                          val codecName = Option(w.codec)
                            .map(c => c.stripPrefix("A_")
                              .toLowerCase(java.util.Locale.ROOT))
                            .getOrElse("unknown")
                          Row(w.channels, sr, null, samples, null, null,
                            null, null, true, null,
                            s"${w.docType}-$codecName", w.durationMs,
                            null, null)
                        case _ =>
                          Row(null, null, null, null, null, null, null, null,
                            false,
                            "not PCM WAV or MPEG/FLAC/Opus/Vorbis/AAC/M4A/WebM audio",
                            null, null, null, null)
                      }
                    }
                  }
                }
              }
            }
          }
          } catch {
            case t: Throwable =>
              Row(null, null, null, null, null, null, null, null, false,
                s"audio kernel failure: ${t.getClass.getSimpleName}",
                null, null, null, null)
          }
          Row.fromSeq(row.toSeq :+ stats)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** 64-bit perceptual audio hash — the waveform analog of
    * [[dhash64]]: 8 rows × 8 bits over an (envelope-derivative ×
    * time) grid. Row r takes the r-th order DIFFERENCE of the
    * channel-folded sample stream (a discrete high-pass ladder — the
    * poor-deterministic-man's filter bank: higher rows emphasize
    * higher-frequency content), splits it into 9 duration-relative
    * windows, and sets bit `r*8 + t` when window t+1 carries strictly
    * more energy than window t.
    *
    * Invariances that make it a DEDUP hash: uniform gain scales every
    * window's energy by the same factor (comparisons unchanged — the
    * arithmetic is integer, exact for mono; multi-channel folds by a
    * truncating channel mean, noise ≪ any real energy gap);
    * re-encoding PCM is byte-identical; resampling is EXACT for
    * sample-repeat ratios and near-exact otherwise, because frames
    * are point-sampled onto a FIXED duration-relative grid of
    * [[AudioHashGrid]] positions before the ladder: grid point g
    * reads frame `⌊g·nf/G⌋`, and for a k× sample-repeat stream
    * (`t[i] = s[⌊i/k⌋]`, nf' = k·nf) that is
    * `s[⌊⌊g·k·nf/G⌋/k⌋] = s[⌊g·nf/G⌋]` — the SAME sample, so the
    * whole ladder and therefore the hash are bit-identical
    * (DedupSpec asserts Hamming 0 on a 2× repeat; rational ratios
    * land within a bit or two of grid-boundary wobble). Overflow
    * headroom is PROVEN, not hoped: folded frames ≤ 2^15, the grid
    * is 2^12 points, 7th differences ≤ 2^22, squared-and-window-
    * summed ≤ 2^56 — so a synthetic fixture's hash is a CLOSED FORM
    * of its sample function (q79/q148 exact-oracle material).
    *
    * MPEG audio (MP3 family): no PCM is decoded; the hash runs over
    * the per-granule `global_gain` LOUDNESS ENVELOPE from the Layer
    * III side info ([[mpegAudioInfo]]) through the same fixed grid —
    * so two MP3s carrying the same encode (re-muxed, re-tagged,
    * bitstream-copied, ID3-stripped) hash identically, and re-encodes
    * of the same source by the same encoder land nearby. The gain
    * envelope lives in a DIFFERENT feature space than PCM energies:
    * an MP3 never pairs with the WAV it was encoded from (documented
    * limitation — cross-codec dedup needs a full decode). Null for
    * non-audio/empty bytes and for Layer I/II (no per-granule gains).
    */
  def audioHash64(bytes: Array[Byte]): java.lang.Long = pcmSamples(bytes) match {
    case Some((ch, _, _, s)) if s.length >= ch && ch >= 1 =>
      val nf = s.length / ch
      if (nf == 0) return null
      // fixed-grid point sampling: O(G) regardless of stream length,
      // and the source of the resample exactness proven above (short
      // streams upsample by repetition — same floor rule, same proof)
      val frames = new Array[Long](AudioHashGrid)
      var g = 0
      while (g < AudioHashGrid) {
        val f = (g.toLong * nf / AudioHashGrid).toInt
        var c = 0
        var sum = 0L
        while (c < ch) { sum += s(f * ch + c); c += 1 }
        frames(g) = sum / ch
        g += 1
      }
      java.lang.Long.valueOf(audioHashOf(frames))
    case _ => mpegAudioInfo(bytes) match {
      case Some(m) if m.gains.length >= 2 =>
        val frames = new Array[Long](AudioHashGrid)
        var g = 0
        while (g < AudioHashGrid) {
          frames(g) = m.gains((g.toLong * m.gains.length / AudioHashGrid).toInt)
          g += 1
        }
        java.lang.Long.valueOf(audioHashOf(frames))
      case _ => null
    }
  }

  /** Duration-relative frame-grid size for [[audioHash64]] — 2^12
    * points keeps the 7th-difference energy sums within proven long
    * headroom while sampling densely enough that window energies
    * track the envelope.
    */
  val AudioHashGrid = 4096

  /** Versioned kernel names for DURABLE signature stores
    * ([[graft.streaming.StreamOps.streamingSignatureDedupIngest]],
    * durable Hamming indexes): any change to a kernel's bit output
    * silently breaks incremental matching against signatures persisted
    * under the old framing — no error, just missed duplicates — so
    * stores are stamped with the kernel name/version at creation and
    * ingest refuses a mismatch. BUMP the suffix whenever the kernel's
    * output changes for any input (audiohash64 is at /2: the round-11
    * move from ceil-stride framing to the fixed [[AudioHashGrid]]
    * changed every value).
    */
  val DHashSignatureName = "dhash64/1"
  val AudioHashSignatureName = "audiohash64/2"
  val VideoFingerprintSignatureName = "videofp64/1"
  // composes dhash64/1 with the embeddedArt dispatch: bump if EITHER
  // the hash framing or the art-extraction surface changes a value
  val MediaLinkHashSignatureName = "medialinkhash64/1"

  /** The grid kernel behind [[audioHash64]] (generated code calls
    * [[audioHash64]] itself, so this can stay internal).
    */
  private[graft] def audioHashOf(frames0: Array[Long]): Long = {
    var out = 0L
    var cur = frames0
    var row = 0
    while (row < 8) {
      val n = cur.length
      var t = 0
      var prev = -1L
      while (t < 9) {
        val x0 = t * n / 9
        val x1 = math.max(x0 + 1, (t + 1) * n / 9)
        var e = 0L
        var j = x0
        val end = math.min(x1, n)
        while (j < end) { e += cur(j) * cur(j); j += 1 }
        if (t > 0 && e > prev) out |= (1L << (row * 8 + (t - 1)))
        prev = e
        t += 1
      }
      // next row: first difference (exact integers; length floor n-1,
      // floored at 1 so short streams degrade to constant rows)
      if (row < 7) {
        val m = math.max(1, n - 1)
        val nxt = new Array[Long](m)
        var k = 0
        while (k < m) {
          nxt(k) = (if (k + 1 < n) cur(k + 1) else cur(k)) - cur(k)
          k += 1
        }
        cur = nxt
      }
      row += 1
    }
    out
  }

  /** [[audioHash64]] as a Column — same codegen discipline as
    * [[dhash64Col]].
    */
  def audioHash64Col(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(AudioHash64(expressionOf(content)))
  }

  case class AudioHash64(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val h = audioHash64(v.asInstanceOf[Array[Byte]])
      if (h == null) null else h.longValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("ahash")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Long $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.audioHash64(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final long ${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): AudioHash64 = copy(c)
  }

  /** Declared-text / declared-art presence flags — the card's
    * coverage counters ride these (pct_image_with_text,
    * pct_audio_with_art, pct_audio_with_lyrics). Public for the
    * generated-code static calls; null only for null input, so the
    * card's `when(ok, ...)` gating decides which rows count.
    */
  def imageTextPresent(b: Array[Byte]): java.lang.Boolean =
    if (b == null) null
    else java.lang.Boolean.valueOf(imageTextFacts(b).isDefined)

  def audioArtPresent(b: Array[Byte]): java.lang.Boolean =
    if (b == null) null
    else java.lang.Boolean.valueOf(embeddedArtBytes(b).isDefined)

  def audioLyricsPresent(b: Array[Byte]): java.lang.Boolean =
    if (b == null) null
    else java.lang.Boolean.valueOf(audioLyricsText(b).isDefined)

  /** Chapters declared in any of the four carrier conventions —
    * `pct_audio_with_chapters` rides this ([[mediaChaptersOf]], the
    * SAME dispatch the extraction uses).
    */
  def audioChaptersPresent(b: Array[Byte]): java.lang.Boolean =
    if (b == null) null
    else java.lang.Boolean.valueOf(
      try mediaChaptersOf(b).isDefined catch { case _: Throwable => false })

  /** EXIF IFD1 thumbnail present — `pct_image_with_thumb` rides this
    * ([[exifThumbnail]], the same walk the forensic link uses).
    */
  def imageThumbPresent(b: Array[Byte]): java.lang.Boolean =
    if (b == null) null
    else java.lang.Boolean.valueOf(exifThumbnail(b) != null)

  /** The presence flags as Columns — codegen'd like [[dhash64Col]]. */
  def imageTextPresentCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(MediaFlag(expressionOf(content), "imageTextPresent"))
  }
  def audioArtPresentCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(MediaFlag(expressionOf(content), "audioArtPresent"))
  }
  def audioLyricsPresentCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(MediaFlag(expressionOf(content), "audioLyricsPresent"))
  }
  def audioChaptersPresentCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(MediaFlag(expressionOf(content), "audioChaptersPresent"))
  }
  def imageThumbPresentCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(MediaFlag(expressionOf(content), "imageThumbPresent"))
  }

  /** One boolean media-presence kernel by name — a single Expression
    * class serves all three flags (the kernel name is part of the
    * expression's semantics, so equality/canonicalization stay
    * correct).
    */
  case class MediaFlag(child: org.apache.spark.sql.catalyst.expressions.Expression,
      kernel: String)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    // doGenCode splices the kernel name into generated Java verbatim:
    // an unknown name must fail HERE at construction, not produce
    // broken codegen (or an arbitrary static-call splice) at runtime
    require(MediaFlag.Kernels(kernel), s"unknown media flag kernel: $kernel")
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    @transient private lazy val fn: Array[Byte] => java.lang.Boolean = kernel match {
      case "imageTextPresent" => imageTextPresent
      case "audioArtPresent" => audioArtPresent
      case "audioChaptersPresent" => audioChaptersPresent
      case "imageThumbPresent" => imageThumbPresent
      case _ => audioLyricsPresent
    }
    override def nullSafeEval(v: Any): Any = {
      val r = fn(v.asInstanceOf[Array[Byte]])
      if (r == null) null else r.booleanValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("mflag")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Boolean $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.$kernel(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final boolean ${ev.value} = ${ev.isNull} ? false : $boxed.booleanValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): MediaFlag =
      copy(child = c)
  }

  object MediaFlag {
    /** The only kernel names [[MediaFlag.doGenCode]] may splice. */
    private[graft] val Kernels: Set[String] =
      Set("imageTextPresent", "audioArtPresent", "audioLyricsPresent",
        "audioChaptersPresent", "imageThumbPresent")
  }

  /** Media corpus card — the multimodal twin of
    * [[graft.operators.Curation.dataCard]]: per group, long-format
    * (group, metric, value) rows summarizing what a mixed media
    * corpus actually contains — modality mix (decodable image /
    * audio / video container / undecodable), image geometry and
    * brightness, audio level
    * and defect rates (clipping, dead air), and DECLARED-text
    * coverage (captions, cover art, lyrics, subtitle tracks — the
    * pairing-signal share a caption-mining pipeline starts from).
    * The release-gate report
    * for a multimodal ingest ("what did this crawl deliver, per
    * source"), diffable with [[graft.operators.Curation
    * .dataCardDiff]] like the text card.
    *
    * Two batched decode passes ([[imageStats]] then [[audioStats]] —
    * each rejects the other modality on magic bytes before any
    * expensive work), one aggregation, map-only otherwise. Metrics
    * over a modality average over THAT modality's decodable rows
    * only (an image has no clipping; null elsewhere keeps the
    * column honest), so on lossless fixtures every value is a closed
    * form (the q79/q150 exact-oracle discipline).
    */
  def mediaCard(df: DataFrame, contentCol: String,
      groupCol: String): DataFrame =
    deriveMediaCard(mediaCardSignals(df, contentCol, groupCol), groupCol)

  /** The per-group MONOID frame behind [[mediaCard]] — every column a
    * commutative sum/count, so the same aggregate serves the batch
    * card and the incremental state fold
    * ([[upsertMediaCardState]]): folding batches and re-summing is
    * EXACTLY the one-shot aggregate. Integer signals (counts, pixel
    * dims, whole-ms durations, rates, keyframes) accumulate as longs;
    * real-valued per-row signals (luma, textiness, rms) accumulate as
    * `decimal(28,12)` — the per-row cast quantizes deterministically
    * at 1e-12 (invisible at the card's 4/6-decimal rounding) and
    * decimal addition is associative, so the derived card is
    * bit-identical however the corpus is split across ingests (the
    * float-sum-ORDER problem a double sum would reintroduce).
    */
  private[graft] def mediaCardSignals(df: DataFrame, contentCol: String,
      groupCol: String): DataFrame = {
    val enriched = audioStats(imageStats(df, contentCol), contentCol)
    val img = col("stats")
    val aud = col("audio")
    // video CONTAINERS classified by magic bytes (MJPEG-AVI /
    // ISO-BMFF) so an MP4 upload reads as "video", not "undecodable";
    // frame-level stats stay with videoFrames + imageStats (decoding
    // every frame is a pipeline stage, not a card scan)
    val isVideo = !img.getField("ok") && !aud.getField("ok") && (
      (substring(col(contentCol), 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
        substring(col(contentCol), 9, 4) === lit("AVI ".getBytes("US-ASCII"))) ||
      substring(col(contentCol), 5, 4) === lit("ftyp".getBytes("US-ASCII")) ||
      // Matroska/WebM (EBML magic); audio-PRIMARY files never reach
      // here — audioStats already claimed them (aud.ok)
      substring(col(contentCol), 1, 4) ===
        lit(Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte)))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(28,12)")
    enriched
      // compute each per-row signal ONCE (the keyframe walk would
      // otherwise run twice, for its sum and its count)
      .select(col(groupCol).cast("string").as("__g"),
        when(img.getField("ok"), img.getField("width").cast("long")).as("__w"),
        when(img.getField("ok"), img.getField("height").cast("long")).as("__h"),
        when(img.getField("ok"), dec((img.getField("avg_r") +
          img.getField("avg_g") + img.getField("avg_b")) / 3.0)).as("__lum"),
        // rendered-text share signal (screenshots/memes vs photos)
        when(img.getField("ok"), dec(img.getField("textiness"))).as("__txt"),
        when(img.getField("ok") && img.getField("exif_gps"), 1L)
          .otherwise(0L).as("__gps"),
        when(img.getField("ok"), 1L).otherwise(0L).as("__isimg"),
        when(aud.getField("ok"), dec(aud.getField("rms_norm"))).as("__rms"),
        // duration/rate come from the header walk, so they are real
        // for MPEG/AAC audio too (rms is PCM-only, null there)
        when(aud.getField("ok"), aud.getField("duration_ms").cast("long"))
          .as("__dur"),
        when(aud.getField("ok"), aud.getField("sample_rate").cast("long"))
          .as("__hz"),
        when(aud.getField("ok") && aud.getField("clip_ratio") > 0.0, 1L)
          .otherwise(0L).as("__clip"),
        when(aud.getField("ok") && aud.getField("silence_ratio") === 1.0, 1L)
          .otherwise(0L).as("__sil"),
        when(aud.getField("ok"), 1L).otherwise(0L).as("__isaud"),
        // seekability of the video share: sync samples from the BMFF
        // sample tables (AVI MJPEG = all frames); null when the
        // container carries no parseable track
        when(isVideo, videoKeyframesCol(col(contentCol)).cast("long"))
          .as("__vkey"),
        when(isVideo, 1L).otherwise(0L).as("__isvid"),
        // declared-text coverage: the pairing-signal share — CaseWhen
        // evaluates lazily, so the text/art/lyrics walks only run on
        // rows of their own modality
        when(img.getField("ok") && imageTextPresentCol(col(contentCol)), 1L)
          .otherwise(0L).as("__htext"),
        when(aud.getField("ok") && audioArtPresentCol(col(contentCol)), 1L)
          .otherwise(0L).as("__hart"),
        when(aud.getField("ok") && audioLyricsPresentCol(col(contentCol)), 1L)
          .otherwise(0L).as("__hlyr"),
        when(isVideo &&
          coalesce(subtitleTrackCountCol(col(contentCol)), lit(0)) > 0, 1L)
          .otherwise(0L).as("__hsub"),
        // segmentation/forensic coverage (round-15 card metrics)
        when(aud.getField("ok") && audioChaptersPresentCol(col(contentCol)), 1L)
          .otherwise(0L).as("__hchap"),
        when(img.getField("ok") && imageThumbPresentCol(col(contentCol)), 1L)
          .otherwise(0L).as("__hthumb"),
        // q203's per-asset quality ratio as a corpus share: null
        // without a declared container duration (fail-closed), so
        // the average reads over videos that actually assert one
        when(isVideo, dec(dialogCoverageCol(col(contentCol)))).as("__dcov"))
      .groupBy(col("__g"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__isimg")).as("ni"),
        sum(col("__isaud")).as("na"),
        sum(col("__isvid")).as("nv"),
        sum(col("__w")).as("wsum"), count(col("__w")).as("wcnt"),
        sum(col("__h")).as("hsum"), count(col("__h")).as("hcnt"),
        sum(col("__lum")).as("lumsum"), count(col("__lum")).as("lumcnt"),
        sum(col("__txt")).as("txtsum"), count(col("__txt")).as("txtcnt"),
        sum(col("__gps")).as("ngps"),
        sum(col("__rms")).as("rmssum"), count(col("__rms")).as("rmscnt"),
        sum(col("__dur")).as("dursum"), count(col("__dur")).as("durcnt"),
        sum(col("__hz")).as("hzsum"), count(col("__hz")).as("hzcnt"),
        sum(col("__clip")).as("nclip"),
        sum(col("__sil")).as("nsilent"),
        sum(col("__vkey")).as("vkeysum"), count(col("__vkey")).as("vkeycnt"),
        sum(col("__htext")).as("nhtext"),
        sum(col("__hart")).as("nhart"),
        sum(col("__hlyr")).as("nhlyr"),
        sum(col("__hsub")).as("nhsub"),
        sum(col("__hchap")).as("nhchap"),
        sum(col("__hthumb")).as("nhthumb"),
        sum(col("__dcov")).as("dcovsum"), count(col("__dcov")).as("dcovcnt"))
  }

  /** Derive the long-format card from the monoid frame — shared by
    * the one-shot [[mediaCard]] and [[mediaCardFromState]], so the
    * two can never diverge on a metric definition. A signal with no
    * contributing rows (count 0) is null, matching the `avg`-skips-
    * nulls semantics the card always had. `avg_audio_secs` divides
    * the exact integer millisecond sum ONCE — float-sum-order-safe
    * at corpus scale.
    */
  private[graft] def deriveMediaCard(state: DataFrame,
      groupCol: String): DataFrame = {
    def avgOf(sumCol: String, cntCol: String, scale: Int) =
      when(col(cntCol) > 0,
        round(col(sumCol).cast("double") / col(cntCol), scale))
    state.select(col("__g").as(groupCol), explode(map(
      lit("avg_image_height"), avgOf("hsum", "hcnt", 2),
      lit("avg_image_luma"), avgOf("lumsum", "lumcnt", 4),
      lit("avg_image_textiness"), avgOf("txtsum", "txtcnt", 6),
      lit("avg_image_width"), avgOf("wsum", "wcnt", 2),
      lit("avg_audio_rms"), avgOf("rmssum", "rmscnt", 6),
      lit("avg_audio_secs"),
      when(col("durcnt") > 0,
        round(col("dursum").cast("double") / col("durcnt") / 1000.0, 4)),
      lit("avg_audio_hz"), avgOf("hzsum", "hzcnt", 2),
      lit("avg_video_keyframes"), avgOf("vkeysum", "vkeycnt", 2),
      lit("avg_dialog_coverage"), avgOf("dcovsum", "dcovcnt", 4),
      lit("pct_image_gps"),
      when(col("ni") > 0, round(col("ngps").cast("double") / col("ni"), 4)),
      lit("pct_image_with_text"),
      when(col("ni") > 0, round(col("nhtext").cast("double") / col("ni"), 4)),
      lit("pct_audio_with_art"),
      when(col("na") > 0, round(col("nhart").cast("double") / col("na"), 4)),
      lit("pct_audio_with_lyrics"),
      when(col("na") > 0, round(col("nhlyr").cast("double") / col("na"), 4)),
      lit("pct_video_with_subs"),
      when(col("nv") > 0, round(col("nhsub").cast("double") / col("nv"), 4)),
      lit("pct_audio_with_chapters"),
      when(col("na") > 0, round(col("nhchap").cast("double") / col("na"), 4)),
      lit("pct_image_with_thumb"),
      when(col("ni") > 0, round(col("nhthumb").cast("double") / col("ni"), 4)),
      lit("n_assets"), col("n").cast("double"),
      lit("pct_audio"), round(col("na").cast("double") / col("n"), 4),
      lit("pct_audio_clipped"),
      when(col("na") > 0, round(col("nclip").cast("double") / col("na"), 4)),
      lit("pct_audio_silent"),
      when(col("na") > 0, round(col("nsilent").cast("double") / col("na"), 4)),
      lit("pct_image"), round(col("ni").cast("double") / col("n"), 4),
      lit("pct_video"), round(col("nv").cast("double") / col("n"), 4),
      lit("pct_undecodable"),
      round((col("n") - col("ni") - col("na") - col("nv"))
        .cast("double") / col("n"), 4))).as(Seq("metric", "value")))
  }

  /** Re-sum a union of [[mediaCardSignals]] frames into one row per
    * group — the monoid merge shared by the incremental upsert and
    * the streaming partial-store reader, so the fold can never
    * diverge between them.
    */
  private[graft] def mergeMediaCardSignals(both: DataFrame): DataFrame = {
    // a state written before the declared-text coverage counters
    // cannot be silently merged (its missing sums would read as
    // zero-coverage lies) — refuse loudly, like the signature-store
    // kernel-version stamp
    val missing = Seq("nhtext", "nhart", "nhlyr", "nhsub", "nhchap",
      "nhthumb", "dcovsum", "dcovcnt").filterNot(both.columns.contains)
    require(missing.isEmpty,
      s"media-card state predates the declared-text coverage metrics " +
        s"(missing ${missing.mkString(", ")}) — rebuild the state with " +
        "the current kernel")
    both.groupBy(col("__g")).agg(
      sum(col("n")).as("n"), sum(col("ni")).as("ni"),
      sum(col("na")).as("na"), sum(col("nv")).as("nv"),
      sum(col("wsum")).as("wsum"), sum(col("wcnt")).as("wcnt"),
      sum(col("hsum")).as("hsum"), sum(col("hcnt")).as("hcnt"),
      sum(col("lumsum")).as("lumsum"), sum(col("lumcnt")).as("lumcnt"),
      sum(col("txtsum")).as("txtsum"), sum(col("txtcnt")).as("txtcnt"),
      sum(col("ngps")).as("ngps"),
      sum(col("rmssum")).as("rmssum"), sum(col("rmscnt")).as("rmscnt"),
      sum(col("dursum")).as("dursum"), sum(col("durcnt")).as("durcnt"),
      sum(col("hzsum")).as("hzsum"), sum(col("hzcnt")).as("hzcnt"),
      sum(col("nclip")).as("nclip"), sum(col("nsilent")).as("nsilent"),
      sum(col("vkeysum")).as("vkeysum"), sum(col("vkeycnt")).as("vkeycnt"),
      sum(col("nhtext")).as("nhtext"), sum(col("nhart")).as("nhart"),
      sum(col("nhlyr")).as("nhlyr"), sum(col("nhsub")).as("nhsub"),
      sum(col("nhchap")).as("nhchap"), sum(col("nhthumb")).as("nhthumb"),
      sum(col("dcovsum")).as("dcovsum"), sum(col("dcovcnt")).as("dcovcnt"))
  }

  /** Incremental [[mediaCard]] — the daily-multimodal-ingest form
    * ([[graft.operators.Curation.upsertDataCardState]]'s media twin):
    * fold each batch's [[mediaCardSignals]] into a versioned parquet
    * state ([[Scale.writeVersionedState]]'s crash-safe pointer
    * discipline), so the decode work per ingest is O(batch) + an
    * O(groups) merge — never a re-scan of the corpus. Every signal
    * is a commutative monoid (no sketch needed: the media card has
    * no distinct-count metric), so `fold(b1); fold(b2)` equals
    * `fold(b1 ∪ b2)` EXACTLY and the derived card replays
    * bit-for-bit regardless of batch split. Returns the merged
    * state; read the card with [[mediaCardFromState]].
    */
  def upsertMediaCardState(spark: SparkSession, path: String,
      batch: DataFrame, contentCol: String, groupCol: String): DataFrame = {
    val partial = mediaCardSignals(batch, contentCol, groupCol)
    val merged = Scale.readVersionedState(spark, path) match {
      case None => partial
      case Some(state) =>
        val missing = partial.columns.filterNot(state.columns.contains)
        require(missing.isEmpty,
          s"media-card state at $path predates the current card metrics " +
            s"(missing ${missing.mkString(", ")}) — rebuild the state " +
            "with the current kernel")
        mergeMediaCardSignals(state.unionByName(partial))
    }
    Scale.writeVersionedState(spark, path, merged)
  }

  /** Derive the media card from [[upsertMediaCardState]] state — the
    * same metrics as [[mediaCard]], via the same [[deriveMediaCard]].
    */
  def mediaCardFromState(spark: SparkSession, path: String,
      groupCol: String): DataFrame =
    deriveMediaCard(Scale.readVersionedState(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no media-card state at $path")),
      groupCol)

  /** Render a PNG via ImageIO from a per-pixel color function —
    * REAL raster bytes for pixel-path tests and gate queries
    * (deterministic: PNG is lossless, so decode returns exactly the
    * rendered pixels regardless of encoder details).
    */
  private[graft] def renderPng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] =
    renderImage("png", w, h, rgb)

  /** Splice a PNG-1.2-extension `eXIf` chunk (raw TIFF block, CRC'd)
    * after IHDR — the fixture no mainstream encoder emits, for the
    * PNG GPS flag ([[syntheticTiff]]'s gps discipline).
    */
  private[graft] def pngWithExif(png: Array[Byte],
      gps: Boolean): Array[Byte] = {
    val nTags = if (gps) 1 else 0
    val tiff = java.nio.ByteBuffer.allocate(8 + 2 + 12 * nTags + 4 +
      (if (gps) 6 else 0)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    tiff.putShort(nTags.toShort)
    if (gps) tiff.putShort(0x8825.toShort).putShort(4).putInt(1)
      .putInt(8 + 2 + 12 + 4)
    tiff.putInt(0) // next-IFD pointer
    if (gps) tiff.putShort(0).putInt(0) // empty GPS IFD
    pngWithExifTiff(png, tiff.array())
  }

  /** Splice an ARBITRARY TIFF block as a PNG `eXIf` chunk (CRC'd) —
    * [[pngWithExif]]'s generic form, for IFD1-thumbnail fixtures.
    */
  private[graft] def pngWithExifTiff(png: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
    chunk.putInt(data.length).put("eXIf".getBytes("ISO-8859-1")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(chunk.array(), 4, 4 + data.length)
    chunk.putInt(crc.getValue.toInt)
    // IHDR is always the first chunk: signature 8 + (12 + 13) bytes
    val at = 8 + 25
    java.util.Arrays.copyOfRange(png, 0, at) ++ chunk.array() ++
      java.util.Arrays.copyOfRange(png, at, png.length)
  }

  /** Splice PNG textual chunks after IHDR — `tEXt` (latin-1) or, when
    * `intl` is set, an uncompressed `iTXt` (UTF-8, empty language and
    * translated-keyword fields), CRC'd like [[pngWithExif]].
    */
  private[graft] def pngWithText(png: Array[Byte],
      entries: Seq[(String, String, Boolean)]): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("ISO-8859-1")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val spliced = entries.toArray.flatMap { case (kw, text, intl) =>
      if (intl)
        chunk("iTXt", kw.getBytes("ISO-8859-1") ++
          Array[Byte](0, 0, 0, 0, 0) ++ // NUL, flag 0, method 0, "" NUL, "" NUL
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      else
        chunk("tEXt", kw.getBytes("ISO-8859-1") ++ Array[Byte](0) ++
          text.getBytes("ISO-8859-1"))
    }
    val at = 8 + 25 // after signature + IHDR
    java.util.Arrays.copyOfRange(png, 0, at) ++ spliced ++
      java.util.Arrays.copyOfRange(png, at, png.length)
  }

  /** Insert a JPEG `COM` comment segment after SOI. */
  private[graft] def jpegWithComment(jpeg: Array[Byte],
      comment: String): Array[Byte] = {
    val c = comment.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(c.length <= 65533, "COM segment length is u16")
    val seg = Array(0xFF.toByte, 0xFE.toByte,
      (((c.length + 2) >> 8) & 0xff).toByte,
      ((c.length + 2) & 0xff).toByte) ++ c
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  /** Insert a JPEG APP1 EXIF segment whose IFD0 carries an ASCII
    * ImageDescription (0x010E) — inline when the NUL-included value
    * fits the 4-byte slot, out-of-line past the next-IFD pointer
    * otherwise, per the TIFF spec (q161's `withExif` discipline).
    */
  private[graft] def jpegWithExifDescription(jpeg: Array[Byte],
      desc: String): Array[Byte] = {
    val d = desc.getBytes(java.nio.charset.StandardCharsets.UTF_8) :+ 0.toByte
    val ifdBytes = 2 + 12 + 4
    val inline = d.length <= 4
    val bb = java.nio.ByteBuffer.allocate(8 + ifdBytes +
      (if (inline) 0 else d.length))
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    bb.putShort(1)
    bb.putShort(0x010E.toShort).putShort(2).putInt(d.length)
    if (inline) { bb.put(d); var i = d.length; while (i < 4) { bb.put(0.toByte); i += 1 } }
    else bb.putInt(8 + ifdBytes)
    bb.putInt(0) // next-IFD pointer
    if (!inline) bb.put(d)
    val payload = "Exif".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++ bb.array()
    val app1 = Array(0xFF.toByte, 0xE1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** A minimal XMP packet with dc:title/dc:description rdf:Alt
    * entries — the Adobe toolchain shape [[xmpProperty]] reads.
    */
  private[graft] def xmpPacketXml(title: String, description: String): String = {
    def alt(prop: String, v: String): String =
      if (v == null) ""
      else {
        val esc = v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        s"""<$prop><rdf:Alt><rdf:li xml:lang="x-default">$esc</rdf:li></rdf:Alt></$prop>"""
      }
    "<?xpacket begin=\"﻿\" id=\"W5M0MpCehiHzreSzNTczkc9d\"?>" +
      "<x:xmpmeta xmlns:x=\"adobe:ns:meta/\"><rdf:RDF " +
      "xmlns:rdf=\"http://www.w3.org/1999/02/22-rdf-syntax-ns#\">" +
      "<rdf:Description xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
      alt("dc:title", title) + alt("dc:description", description) +
      "</rdf:Description></rdf:RDF></x:xmpmeta><?xpacket end=\"w\"?>"
  }

  /** Insert a JPEG APP1 XMP segment (namespace-prefixed) after SOI. */
  private[graft] def jpegWithXmp(jpeg: Array[Byte], xml: String): Array[Byte] = {
    val payload = "http://ns.adobe.com/xap/1.0/".getBytes("ISO-8859-1") ++
      Array[Byte](0) ++ xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(payload.length <= 65533, "single-segment fixture packets")
    val app1 = Array(0xFF.toByte, 0xE1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** Insert a GIF Comment Extension (0x21 0xFE) right after the
    * global color table, before any frame.
    */
  private[graft] def gifWithComment(gif: Array[Byte],
      comment: String): Array[Byte] = {
    val c = comment.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(c.nonEmpty && c.length <= 255, "single-sub-block fixture comments")
    val packed = gif(10) & 0xff
    val at = 13 + (if ((packed & 0x80) != 0) 3 << ((packed & 7) + 1) else 0)
    val ext = Array[Byte](0x21, 0xFE.toByte, c.length.toByte) ++ c ++ Array[Byte](0)
    java.util.Arrays.copyOfRange(gif, 0, at) ++ ext ++
      java.util.Arrays.copyOfRange(gif, at, gif.length)
  }

  /** JPEG twin of [[renderPng]] (lossy — for tolerance-based specs,
    * not exact oracles).
    */
  private[graft] def renderJpeg(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] =
    renderImage("jpg", w, h, rgb)

  /** Render any ImageIO-writable format from a per-pixel color
    * function — PNG/BMP are lossless (exact-oracle material; a
    * ≤256-color GIF is exact too, the palette quantizes nothing).
    */
  private[graft] def renderImage(format: String, w: Int, h: Int,
      rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Decode a binary column into typed metadata via batched
    * mapPartitions. `batchSize` is the real knob: a production decoder
    * allocates scratch buffers / a session per batch.
    */
  def decode(df: DataFrame, contentCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("decoded", DecodedSchema))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real decoder would set up buffers
        batch.map { row =>
          val decoded =
            try decodeStub(row.getAs[Array[Byte]](contentIdx))
            catch { case e: Exception => meta(ok = false, error = e.getMessage) }
          Row.fromSeq(row.toSeq :+ decoded)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Feature extractor. PNG/JPEG bytes that ImageIO can fully decode
    * get REAL content-derived features (channel means + luminance
    * histogram + aspect, folded to `dim` and unit-normed) — two
    * renderings of the same image land near each other in feature
    * space, which is what media near-dup search needs. Everything else
    * (non-image formats, header-only synthetics) keeps the
    * deterministic rolling-hash pseudo-embedding — the explicit test
    * seam where a production pipeline would call its inference model,
    * with the same batching contract as [[decode]].
    */
  def extractFeatures(df: DataFrame, contentCol: String = "content",
      dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          val vec = decodePixels(bytes) match {
            case Some(img) => pixelFeatureVector(img, dim)
            case None => hashFeatureVector(bytes, dim)
          }
          Row.fromSeq(row.toSeq :+ vec.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Asset modality from header facts — `image` / `audio` / `video` /
    * `other`, the dispatch key for mixed-corpus operators
    * ([[graft.operators.Dedup.mediaDedupCorpus]]): cheap magics for
    * the image family, container walks only where the magic is
    * ambiguous (an ISO-BMFF is a HEIF still, an audio-only M4A, or a
    * movie; an EBML file declares its own primary track). MPEG/ADTS
    * streams anchor on their dual-frame sync like [[audioStats]].
    * Exception-guarded: hostile bytes classify as `other`, never
    * fail a scan.
    */
  def mediaModality(b: Array[Byte]): String = try {
    if (b == null || b.length < 8) return "other"
    val isRiff = b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
    if ((b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M') || isTiffMagic(b) ||
      (isRiff && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') ||
      isHeifMagic(b) || jxlInfo(b).isDefined ||
      icoInfo(b).isDefined || svgInfo(b).isDefined) return "image"
    if (isRiff && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')
      return "video"
    if ((isRiff && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
      (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') ||
      (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'))
      return "audio"
    if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')
      return if (m4aAudioInfo(b).isDefined) "audio" else "video"
    if (b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
      b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)
      return webmInfo(b).map(_.kind).getOrElse("other")
    if ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      mpegAudioInfo(b).isDefined || adtsAudioInfo(b).isDefined)
      return "audio"
    "other"
  } catch { case _: Throwable => "other" }

  /** MIME type from the magic bytes the decode kernel recognizes —
    * what [[annotateImages]] stamps into the data URL.
    */
  private[graft] def sniffMime(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 12) "application/octet-stream"
    else if (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "image/jpeg"
    else if (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') "image/png"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8') "image/gif"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "image/bmp"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
      bytes(10) == 'B' && bytes(11) == 'P') "image/webp"
    else if (isTiffMagic(bytes)) "image/tiff"
    else if (avifInfo(bytes).isDefined) heifBrand(bytes) match {
      case Some("avif") => "image/avif"
      case Some("heic") => "image/heic"
      case _ => "image/heif"
    }
    else if (bytes(0) == 0x1A.toByte && bytes(1) == 0x45.toByte &&
      bytes(2) == 0xDF.toByte && bytes(3) == 0xA3.toByte) "video/webm"
    else if (jxlInfo(bytes).isDefined) "image/jxl"
    else if (icoInfo(bytes).isDefined) "image/vnd.microsoft.icon"
    else if (svgInfo(bytes).isDefined) "image/svg+xml"
    else "application/octet-stream"
  }

  /** Vision-model annotation — the PRODUCTION path at the seam where
    * [[extractFeatures]] keeps its deterministic stub (matching the
    * reference's provider-delegated `vision_detect_labels/text/…`,
    * `vision_tool.py:372-428`): per-partition batched calls through a
    * pluggable [[graft.llm.SemanticOps.VisionClient]] (one client per
    * partition, never serialized), each image shipped as a base64
    * data URL with its sniffed MIME type, the model's response
    * attached as `outputCol`. What the response contains —
    * label JSON, OCR text, a caption — is the prompt's contract;
    * tests drive a deterministic stub / in-JVM server
    * (SemanticSpec), production passes
    * `() => new HttpModelClient(...)`.
    *
    * Scale shape: the classic inference map stage — no shuffle, CPU/
    * network bound, batch size bounds in-flight memory; throughput
    * scales with partitions × provider concurrency.
    */
  def annotateImages(df: DataFrame, contentCol: String, prompt: String,
      clientFactory: () => graft.llm.SemanticOps.VisionClient,
      outputCol: String = "annotation", batchSize: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField(outputCol, StringType))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      val client = clientFactory()
      it.grouped(batchSize).flatMap { batch =>
        val images = batch.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          (bytes, sniffMime(bytes))
        }
        val outs = client.analyzeImages(prompt, images)
        require(outs.size == batch.size,
          s"vision client returned ${outs.size} answers for ${batch.size} images")
        batch.zip(outs).map { case (row, ann) => Row.fromSeq(row.toSeq :+ ann) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** OCR image subtitles into TEXT cues — the bridge that makes a
    * Blu-ray-remux's bitmap track usable by every text surface:
    * [[imageSubtitleBitmaps]]' decoded plates ride [[annotateImages]]'
    * vision transport (batched, one client per partition) and come
    * back as (id, track_idx, cue_idx, start_ms, end_ms, text) — the
    * [[subtitleCuesByTrack]] cue shape, ready for translation-pair
    * mining, dialog coverage or sidecar export. The model sets the
    * transcription quality; the Spark plumbing (plate decode scan,
    * batch shape, per-partition client reuse) is what has to hold at
    * corpus scale, and does — both halves are map-only.
    */
  def ocrImageSubtitles(df: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content",
      clientFactory: () => graft.llm.SemanticOps.VisionClient = null,
      prompt: String =
        "Transcribe the subtitle text in this image; reply with the text only.",
      batchSize: Int = 16): DataFrame = {
    require(clientFactory != null, "ocrImageSubtitles needs a vision client")
    annotateImages(imageSubtitleBitmaps(df, idCol, contentCol), "bitmap",
      prompt, clientFactory, outputCol = "text", batchSize = batchSize)
      .select(col(idCol), col("track_idx"), col("cue_idx"),
        col("start_ms"), col("end_ms"), col("text"))
  }

  /** Content-derived image features: [avgR, avgG, avgB, 4-bin luma
    * histogram, aspect ratio] cyclically folded into `dim` floats,
    * unit-normed.
    */
  private[graft] def pixelFeatureVector(img: java.awt.image.BufferedImage,
      dim: Int): Array[Float] = {
    val s = pixelSummary(img)
    val aspect = math.min(img.getWidth.toDouble / img.getHeight,
      img.getHeight.toDouble / img.getWidth)
    val raw = s :+ aspect
    val vec = new Array[Float](dim)
    var i = 0
    while (i < raw.length) {
      vec(i % dim) += raw(i).toFloat
      i += 1
    }
    unitNorm(vec)
  }

  /** The rolling-hash pseudo-embedding (deterministic stub half). */
  private[graft] def hashFeatureVector(bytes: Array[Byte], dim: Int): Array[Float] = {
    val vec = new Array[Float](dim)
    if (bytes != null && bytes.nonEmpty) {
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < math.min(bytes.length, 4096)) {
        h = graft.functions.CatalystExpressions.splitmix64(h ^ bytes(i))
        vec(i % dim) += (h.toInt.toFloat / Int.MaxValue)
        i += 1
      }
      unitNorm(vec)
    }
    vec
  }

  private def unitNorm(vec: Array[Float]): Array[Float] = {
    val norm = math.sqrt(vec.map(x => x.toDouble * x).sum).toFloat
    if (norm > 0) {
      var j = 0
      while (j < vec.length) { vec(j) = vec(j) / norm; j += 1 }
    }
    vec
  }

  /** MJPEG-in-AVI frame walk — a REAL video frame decode path with no
    * codec libraries: Motion JPEG stores every frame as an intact
    * JPEG inside RIFF/AVI `##dc`/`##db` chunks, so a pure-JDK RIFF
    * chunk walk yields bytes the existing JPEG stack (header parse,
    * ImageIO raster decode, EXIF, resize, annotate) consumes
    * unchanged. Recurses through LIST containers (`movi` holds the
    * stream), honors word alignment, stops cleanly at truncation.
    * Non-AVI input → no frames.
    */
  /** One parsed ISO-BMFF (MP4/MOV) video track: codec FourCC from
    * `stsd`, `mdhd` timescale/duration, per-sample byte ranges
    * reconstructed from the `stbl` sample tables (`stsz` sizes +
    * `stco`/`co64` chunk offsets + `stsc` sample-to-chunk runs), and
    * the sync-sample ("keyframe") numbers from `stss` (absent table =
    * every sample is sync, per the spec).
    */
  final case class Mp4Track(codec: String, timescale: Int,
      durationMs: Long, sampleOffsets: Array[Long], sampleSizes: Array[Int],
      syncSamples: Array[Int])

  /** Walk an ISO-BMFF box tree and reconstruct the FIRST video
    * track's sample table — the pure-JDK "demuxer" half of what
    * [[aviMjpegFrames]] does for RIFF: with byte ranges + sync flags,
    * keyframe extraction is `copyOfRange`, no codec in the loop.
    * Handles 32/64-bit box sizes, size-0 (to-EOF) boxes, version-1
    * `mdhd`, uniform and per-sample `stsz`, `stco` and `co64`.
    * None for non-BMFF bytes or a file with no complete video `stbl`
    * (e.g. metadata-only synthetics) — callers degrade per-row.
    */
  /** Expand an ISO-BMFF sample table to per-sample ABSOLUTE file
    * offsets via the `stsc` runs — the one walk [[mp4VideoTrack]]
    * (frames) and [[mp4SubtitleCues]] (timed text) both resolve
    * through, so the two surfaces can never disagree on where a
    * sample lives. Null when the tables don't cover every sample
    * (truncated/malformed file).
    */
  private def expandSampleOffsets(sizes: Array[Int], chunkOffsets: Array[Long],
      stscRuns: Array[(Int, Int)]): Array[Long] = {
    if (stscRuns.isEmpty) return null
    val n = sizes.length
    val offsets = new Array[Long](n)
    var s = 0
    var run = 0
    var chunk = 0 // 0-based
    while (s < n && chunk < chunkOffsets.length) {
      val perChunk =
        if (run < stscRuns.length) stscRuns(run)._2 else stscRuns.last._2
      var within = 0
      var at = chunkOffsets(chunk)
      while (within < perChunk && s < n) {
        offsets(s) = at
        at += sizes(s)
        within += 1
        s += 1
      }
      chunk += 1
      if (run + 1 < stscRuns.length && chunk + 1 >= stscRuns(run + 1)._1)
        run += 1
    }
    if (s == n) offsets else null
  }

  private[graft] def mp4VideoTrack(bytes: Array[Byte]): Option[Mp4Track] = {
    if (bytes == null || bytes.length < 16 ||
      !(bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'))
      return None
    @inline def u32(o: Int): Long =
      ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
        ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
    @inline def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    val MaxSamples = 100000
    // per-track scratch, reset at each trak
    var codec: String = null
    var timescale = 0
    var duration = 0L
    var isVideoTrack = false
    var sizes: Array[Int] = null
    var chunkOffsets: Array[Long] = null
    var stscRuns: Array[(Int, Int)] = null // (firstChunk, samplesPerChunk)
    var sync: Array[Int] = null
    var found: Option[Mp4Track] = None
    def finishTrak(): Unit = {
      if (found.isEmpty && isVideoTrack && codec != null && sizes != null &&
        chunkOffsets != null && stscRuns != null && timescale > 0) {
        val offsets = expandSampleOffsets(sizes, chunkOffsets, stscRuns)
        if (offsets != null) {
          val n = sizes.length
          val sync0 = if (sync != null) sync else Array.tabulate(n)(_ + 1)
          found = Some(Mp4Track(codec, timescale,
            duration * 1000L / timescale, offsets, sizes, sync0))
        }
      }
      codec = null; timescale = 0; duration = 0L; isVideoTrack = false
      sizes = null; chunkOffsets = null; stscRuns = null; sync = null
    }
    // depth-capped like its siblings: crafted deep nesting exhausts
    // the cap, never the task stack
    def walk(start: Long, end: Long, depth: Int = 0,
        parent: String = ""): Unit = {
      if (depth > 16) return
      var off = start
      while (found.isEmpty && off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = new String(bytes, off.toInt + 4, 4, "ISO-8859-1")
        var body = off + 8
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) return // malformed: stop
        val b = body.toInt
        id match {
          case "moov" | "mdia" | "minf" | "stbl" =>
            walk(body, boxEnd, depth + 1, id)
          case "trak" => walk(body, boxEnd, depth + 1, id); finishTrak()
          case "mdhd" if b + 4 <= boxEnd =>
            if (bytes(b) == 1 && b + 32 <= boxEnd) { // version 1
              timescale = u32(b + 20).toInt; duration = u64(b + 24)
            } else if (b + 24 <= boxEnd) {
              timescale = u32(b + 12).toInt; duration = u32(b + 16)
            }
            // the spec's "unknown" sentinel (all-ones — fragmented or
            // live-muxed files) must not divide into a bogus ~82-day
            // durationMs; 0 is the explicit unknown signal here
            if (duration == 0xFFFFFFFFL || duration == -1L) duration = 0L
          // only the mdia-level hdlr names the track's role — real
          // QuickTime files carry a second (data-handler) hdlr under
          // minf which must not clobber it
          case "hdlr" if parent == "mdia" && b + 12 <= boxEnd =>
            isVideoTrack = new String(bytes, b + 8, 4, "ISO-8859-1") == "vide"
          case "stsd" if b + 16 <= boxEnd =>
            codec = new String(bytes, b + 12, 4, "ISO-8859-1")
          case "stsz" if b + 12 <= boxEnd =>
            val uniform = u32(b + 4)
            val n = u32(b + 8)
            if (n >= 0 && n <= MaxSamples) {
              if (uniform != 0) sizes = Array.fill(n.toInt)(uniform.toInt)
              else if (b + 12 + 4L * n <= boxEnd)
                sizes = Array.tabulate(n.toInt)(i => u32(b + 12 + 4 * i).toInt)
            }
          case "stco" if b + 8 <= boxEnd =>
            val n = u32(b + 4)
            if (n >= 0 && n <= MaxSamples && b + 8 + 4L * n <= boxEnd)
              chunkOffsets = Array.tabulate(n.toInt)(i => u32(b + 8 + 4 * i))
          case "co64" if b + 8 <= boxEnd =>
            val n = u32(b + 4)
            if (n >= 0 && n <= MaxSamples && b + 8 + 8L * n <= boxEnd)
              chunkOffsets = Array.tabulate(n.toInt)(i => u64(b + 8 + 8 * i))
          case "stsc" if b + 8 <= boxEnd =>
            val n = u32(b + 4)
            if (n >= 0 && n <= MaxSamples && b + 8 + 12L * n <= boxEnd)
              stscRuns = Array.tabulate(n.toInt)(i =>
                (u32(b + 8 + 12 * i).toInt, u32(b + 12 + 12 * i).toInt))
          case "stss" if b + 8 <= boxEnd =>
            val n = u32(b + 4)
            if (n >= 0 && n <= MaxSamples && b + 8 + 4L * n <= boxEnd)
              sync = Array.tabulate(n.toInt)(i => u32(b + 8 + 4 * i).toInt)
          case _ => () // leaf we don't need (mdat, ftyp, tkhd, ...)
        }
        off = boxEnd
      }
    }
    walk(0L, bytes.length.toLong)
    found
  }

  /** Keyframe (sync-sample) bytes of an MP4 video track, bounds-safe:
    * (sampleIndex0Based, bytes) for each `stss` entry whose range fits
    * the buffer. MJPEG-in-MP4 samples ARE JPEG files, so these feed
    * the image stack directly ([[dhash64]], [[imageStats]]).
    */
  private[graft] def mp4KeyframeSamples(bytes: Array[Byte]): Seq[(Int, Array[Byte])] =
    mp4VideoTrack(bytes) match {
      case None => Nil
      case Some(t) =>
        t.syncSamples.toSeq.collect {
          case sNum if sNum >= 1 && sNum <= t.sampleOffsets.length &&
            t.sampleOffsets(sNum - 1) >= 0 &&
            t.sampleOffsets(sNum - 1) + t.sampleSizes(sNum - 1) <= bytes.length =>
            val i = sNum - 1
            (i, java.util.Arrays.copyOfRange(bytes,
              t.sampleOffsets(i).toInt, t.sampleOffsets(i).toInt + t.sampleSizes(i)))
        }
    }

  // TTML (`stpp`) paragraph: the <p ...>text</p> block; begin/end/dur
  // are extracted from the attribute slice INDEPENDENTLY (legal TTML
  // orders them freely, and begin+dur is as common as begin+end).
  // Compiled once — runs per sample in a corpus scan.
  private val TtmlParaPat = java.util.regex.Pattern.compile(
    "(?s)<p\\b([^>]*)>(.*?)</p>")
  private val TtmlBeginPat = java.util.regex.Pattern.compile(
    "\\bbegin\\s*=\\s*\"([^\"]+)\"")
  private val TtmlEndPat = java.util.regex.Pattern.compile(
    "\\bend\\s*=\\s*\"([^\"]+)\"")
  private val TtmlDurPat = java.util.regex.Pattern.compile(
    "\\bdur\\s*=\\s*\"([^\"]+)\"")

  /** (startMs, endMs) of one TTML `<p>` from its attribute slice:
    * begin + end, or begin + dur (end = begin + dur); (-1, -1) when
    * untimed/unparseable.
    */
  private[graft] def ttmlParaTimes(attrs: String): (Long, Long) = {
    val mb = TtmlBeginPat.matcher(attrs)
    if (!mb.find()) return (-1L, -1L)
    val st = ttmlTimeMs(mb.group(1))
    if (st < 0) return (-1L, -1L)
    val me = TtmlEndPat.matcher(attrs)
    if (me.find()) {
      val en = ttmlTimeMs(me.group(1))
      return (st, en)
    }
    val md = TtmlDurPat.matcher(attrs)
    if (md.find()) {
      val d = ttmlTimeMs(md.group(1))
      if (d >= 0) return (st, st + d)
    }
    (-1L, -1L)
  }
  private val TtmlClockPat = java.util.regex.Pattern.compile(
    "(?:(\\d+):)?(\\d{1,2}):(\\d{1,2})(?:[.,](\\d{1,3}))?")

  /** TTML time expression → ms: clock-time `[hh:]mm:ss[.fff]` or
    * offset-time `N[.f]s` / `Nms`; -1 when unparseable.
    */
  private def ttmlTimeMs(s: String): Long = {
    val v = s.trim
    if (v.endsWith("ms")) {
      try v.dropRight(2).trim.toDouble.round
      catch { case _: NumberFormatException => -1L }
    } else if (v.endsWith("s") && v.indexOf(':') < 0) {
      try (v.dropRight(1).trim.toDouble * 1000.0).round
      catch { case _: NumberFormatException => -1L }
    } else {
      val m = TtmlClockPat.matcher(v)
      if (!m.matches()) return -1L
      val h = if (m.group(1) == null) 0L else m.group(1).toLong
      val frac = m.group(4)
      val mmm =
        if (frac == null) 0L
        else frac.toLong * (frac.length match {
          case 1 => 100L
          case 2 => 10L
          case _ => 1L
        })
      ((h * 60 + m.group(2).toLong) * 60 + m.group(3).toLong) * 1000 + mmm
    }
  }

  /** Muxed MP4/MOV timed text → cues — the extraction half of the
    * BMFF line in [[subtitleTrackCount]] (detection without
    * extraction would blind video-text pairing for the web's dominant
    * video container): walk the first `sbtl`/`subt`/`text` track's
    * sample table (the same mdhd/stsd/stts/stsc/stsz/stco machinery
    * [[mp4VideoTrack]] walks, offsets resolved through the shared
    * [[expandSampleOffsets]]) and decode its samples per sample-entry
    * codec —
    *
    *  - `tx3g` (3GPP timed text, the MP4 default) and QuickTime
    *    `text`: u16 text length + UTF-8; length-0 samples are the
    *    gaps between cues;
    *  - `wvtt` (WebVTT-in-MP4, ISO 14496-30): `vttc` cue boxes whose
    *    `payl` child carries the text; `vtte` marks a gap;
    *  - `stpp` (TTML): each sample is an XML document whose
    *    `<p begin end>` paragraphs carry their OWN absolute times.
    *
    * Cue start/end for tx3g/wvtt come from the `stts` deltas
    * rescaled to ms on the track's mdhd timescale. A text track the
    * movie marks as its CHAPTER track (a `tref/chap` reference from
    * another trak — the QuickTime chapter convention) is NOT
    * subtitles and is excluded here ([[mp4Chapters]] picks it up).
    * Returns (sample-entry fourcc, cues); None for non-BMFF bytes or
    * a movie without a parseable non-chapter text track.
    * Depth-capped, sample-capped (100k), exception-guarded like its
    * siblings.
    */
  private[graft] def mp4SubtitleCues(bytes: Array[Byte]): Option[(String, Seq[SubCue])] = {
    val (tracks, chapRefs) = mp4TextTracks(bytes)
    tracks.find(t => !chapRefs.contains(t.id) && t.cues.nonEmpty)
      .map(t => (t.codec, t.cues))
  }

  /** The QuickTime-chapter text track's cues — the `tref/chap`
    * complement of [[mp4SubtitleCues]].
    */
  private[graft] def mp4QtChapterCues(bytes: Array[Byte]): Option[Seq[SubCue]] = {
    val (tracks, chapRefs) = mp4TextTracks(bytes)
    tracks.find(t => chapRefs.contains(t.id) && t.cues.nonEmpty).map(_.cues)
  }

  /** One timed-text track of an ISO-BMFF movie: tkhd id, stsd
    * sample-entry fourcc (null when the trak declares none), the
    * mdhd language code (null when unset), decoded cues (empty when
    * the sample tables are absent/unparseable — the trak still
    * DECLARES a text track, which detection and the declared
    * language need).
    */
  private[graft] final case class Mp4TextTrack(id: Long, codec: String,
      lang: String, cues: Seq[SubCue])

  /** Decode every timed-text track of an ISO-BMFF movie (capped at
    * 4) plus the set of track ids some OTHER trak references as its
    * chapter list via `tref/chap` — the one walk behind
    * [[mp4SubtitleCues]] and [[mp4QtChapterCues]], so the
    * subtitle/chapter split can never disagree on what a track
    * contains. Cue times honor the track's `edts/elst` edit list
    * (ISO 14496-12 §8.6.6): leading empty edits (media_time −1,
    * durations on the MOVIE `mvhd` clock) delay the presentation,
    * and the first non-empty edit's media_time trims it — so a
    * delayed-subtitle mux reports presentation-timeline cues, not
    * raw media times. With `decodeCues = false` the walk reads only
    * the track DECLARATIONS (hdlr role, tkhd id, mdhd language,
    * tref/chap refs — NOT the stsd fourcc: minf/stbl are skipped
    * whole, so `codec` is null in this mode) and skips the sample
    * tables and payload decode entirely — the cheap form behind
    * [[subtitleTrackCount]] and [[declaredTextLang]], which need a
    * count and a 3-char code, not 100k decoded samples.
    */
  private[graft] def mp4TextTracks(bytes: Array[Byte],
      decodeCues: Boolean = true): (Seq[Mp4TextTrack], Set[Long]) = try {
    if (bytes == null || bytes.length < 16 ||
      !(bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'))
      return (Nil, Set.empty)
    @inline def u16(o: Int): Int =
      ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    @inline def u32(o: Int): Long =
      ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
        ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
    @inline def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    val MaxSamples = 100000
    var movieTimescale = 0 // mvhd clock: empty-edit durations tick on it
    var handlerIsText = false
    var codec: String = null
    var timescale = 0
    var trackId = -1L
    var langPacked = -1
    var sizes: Array[Int] = null
    var chunkOffsets: Array[Long] = null
    var stscRuns: Array[(Int, Int)] = null
    var sttsRuns: Array[(Int, Long)] = null // (count, delta ticks)
    var elstEntries: Array[(Long, Long)] = null // (segDur movie-ticks, mediaTime)
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4TextTrack]
    val chapRefs = scala.collection.mutable.Set.empty[Long]
    def decodeTx3g(off: Int, size: Int): String = {
      if (size < 2) return null
      val len = u16(off)
      if (len == 0 || 2 + len > size) return null
      new String(bytes, off + 2, len, java.nio.charset.StandardCharsets.UTF_8)
    }
    def decodeWvtt(off: Int, size: Int): String = {
      // box walk inside the sample: vttc(payl(text)) | vtte
      var i = off
      val end = off + size
      while (i + 8 <= end) {
        val bsz = u32(i)
        val id = new String(bytes, i + 4, 4, "ISO-8859-1")
        val bEnd = i + bsz
        if (bsz < 8 || bEnd > end) return null
        if (id == "vttc") {
          var j = i + 8
          while (j + 8 <= bEnd) {
            val csz = u32(j)
            val cEnd = j + csz
            if (csz < 8 || cEnd > bEnd) return null
            if (new String(bytes, j + 4, 4, "ISO-8859-1") == "payl")
              return new String(bytes, j + 8, (cEnd - j - 8).toInt,
                java.nio.charset.StandardCharsets.UTF_8)
            j = cEnd.toInt
          }
        }
        i = bEnd.toInt
      }
      null
    }
    def finishTrak(): Unit = {
      // record up to 64 declared text tracks (the detection count);
      // DECODE only the first 4 (bounded CPU per row)
      if (tracks.size < 64 && handlerIsText) {
        // mdhd language (3x5-bit ISO-639-2); 0 / 0x7FFF = unset
        val lang =
          if (langPacked <= 0 || langPacked == 0x7FFF) null
          else {
            val c1 = ((langPacked >> 10) & 0x1f) + 0x60
            val c2 = ((langPacked >> 5) & 0x1f) + 0x60
            val c3 = (langPacked & 0x1f) + 0x60
            if (c1 >= 'a' && c1 <= 'z' && c2 >= 'a' && c2 <= 'z' &&
              c3 >= 'a' && c3 <= 'z')
              new String(Array(c1.toChar, c2.toChar, c3.toChar))
            else null
          }
        val cues =
          if (decodeCues && tracks.size < 4) decodeTrackCues() else Nil
        tracks += Mp4TextTrack(trackId, codec, lang, cues)
      }
      handlerIsText = false; codec = null; timescale = 0; trackId = -1L
      langPacked = -1
      sizes = null; chunkOffsets = null; stscRuns = null; sttsRuns = null
      elstEntries = null
    }
    // the first non-empty edit's presentation offset in ms: leading
    // empty edits delay (movie clock), its media_time trims (media
    // clock); no edit list = zero
    def editOffsetMs(): Long = {
      if (elstEntries == null || timescale <= 0) return 0L
      var emptyTicks = 0L
      var i = 0
      while (i < elstEntries.length) {
        val (segDur, mediaTime) = elstEntries(i)
        if (mediaTime < 0) emptyTicks += segDur
        else {
          // an mvhd-less file cannot convert the empty-edit delay to
          // ms — applying only the media_time trim would shift the
          // timeline ONE-SIDED (earlier), worse than no edit at all:
          // skip the whole adjustment instead
          if (emptyTicks > 0 && movieTimescale <= 0) return 0L
          val delay =
            if (movieTimescale > 0) emptyTicks * 1000L / movieTimescale else 0L
          return delay - mediaTime * 1000L / timescale
        }
        i += 1
      }
      if (movieTimescale > 0) emptyTicks * 1000L / movieTimescale else 0L
    }
    def decodeTrackCues(): Seq[SubCue] = {
      if (codec != null &&
        (codec == "tx3g" || codec == "text" || codec == "wvtt" ||
          codec == "stpp") && sizes != null && chunkOffsets != null &&
        stscRuns != null && sttsRuns != null && timescale > 0) {
        val offsets = expandSampleOffsets(sizes, chunkOffsets, stscRuns)
        if (offsets != null) {
          val offMs = editOffsetMs()
          val cues = Seq.newBuilder[SubCue]
          var idx = 0
          var ticks = 0L
          var s = 0
          var run = 0
          var inRun = 0
          while (s < sizes.length && run < sttsRuns.length) {
            val delta = sttsRuns(run)._2
            val off = offsets(s)
            val sz = sizes(s)
            if (off >= 0 && off + sz <= bytes.length && idx < MaxSamples) {
              val o = off.toInt
              if (codec == "stpp") {
                // the sample is a TTML doc; paragraphs carry times
                val xml = new String(bytes, o, sz,
                  java.nio.charset.StandardCharsets.UTF_8)
                val m = TtmlParaPat.matcher(xml)
                while (m.find() && idx < MaxSamples) {
                  val (st0, en0) = ttmlParaTimes(m.group(1))
                  val text = xmlUnescape(m.group(2)
                    .replaceAll("(?i)<br\\s*/?>", "\n")
                    .replaceAll("<[^>]*>", "")).trim
                  // edit-list shift; a cue the edit clips away is gone
                  val st = math.max(0L, st0 + offMs)
                  val en = en0 + offMs
                  if (st0 >= 0 && en0 >= st0 && en >= 0 && text.nonEmpty) {
                    idx += 1
                    cues += SubCue(idx, st, en, text)
                  }
                }
              } else {
                val raw =
                  if (codec == "wvtt") decodeWvtt(o, sz) else decodeTx3g(o, sz)
                // muxed wvtt payloads carry the SAME markup as
                // sidecar VTT: capture the opening voice span's
                // speaker, then strip tags — the sidecar rule, so the
                // two carriers agree on text and attribution
                val speaker =
                  if (codec == "wvtt" && raw != null) {
                    val nl = raw.indexOf('\n')
                    voiceSpanName(
                      (if (nl >= 0) raw.substring(0, nl) else raw).trim)
                  } else null
                val text =
                  if (codec == "wvtt" && raw != null) stripVttMarkup(raw)
                  else raw
                val st = math.max(0L, ticks * 1000L / timescale + offMs)
                val en = (ticks + delta) * 1000L / timescale + offMs
                if (text != null && text.trim.nonEmpty && en >= 0) {
                  idx += 1
                  cues += SubCue(idx, st, en, text.trim, speaker)
                }
              }
            }
            ticks += delta
            s += 1
            inRun += 1
            if (inRun >= sttsRuns(run)._1) { run += 1; inRun = 0 }
          }
          return cues.result()
        }
      }
      Nil
    }
    def walk(start: Long, end: Long, depth: Int = 0,
        parent: String = ""): Unit = {
      if (depth > 16) return
      var off = start
      while (off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = new String(bytes, off.toInt + 4, 4, "ISO-8859-1")
        var body = off + 8
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) return
        val b = body.toInt
        id match {
          case "minf" | "stbl" | "edts" if !decodeCues =>
            () // declaration-only walk: no sample tables, no edits
          case "moov" | "mdia" | "minf" | "stbl" | "tref" | "edts" =>
            walk(body, boxEnd, depth + 1, id)
          case "trak" => walk(body, boxEnd, depth + 1, id); finishTrak()
          case "mvhd" if b + 4 <= boxEnd =>
            if (bytes(b) == 1 && b + 24 <= boxEnd)
              movieTimescale = u32(b + 20).toInt
            else if (b + 16 <= boxEnd) movieTimescale = u32(b + 12).toInt
          case "elst" if b + 8 <= boxEnd =>
            val v1 = bytes(b) == 1
            val n = u32(b + 4)
            val entryLen = if (v1) 20L else 12L
            if (n >= 0 && n <= 256 && b + 8 + entryLen * n <= boxEnd)
              elstEntries = Array.tabulate(n.toInt) { i =>
                val e = b + 8 + (entryLen * i).toInt
                if (v1) (u64(e), u64(e + 8))
                else (u32(e), u32(e + 4).toInt.toLong) // i32 media_time
              }
          case "tkhd" if b + 4 <= boxEnd =>
            if (bytes(b) == 1 && b + 24 <= boxEnd) trackId = u32(b + 20)
            else if (b + 16 <= boxEnd) trackId = u32(b + 12)
          case "chap" if parent == "tref" =>
            // tref/chap: ids of THIS trak's chapter tracks
            var q = b
            while (q + 4 <= boxEnd) { chapRefs += u32(q); q += 4 }
          case "mdhd" if b + 4 <= boxEnd =>
            if (bytes(b) == 1 && b + 34 <= boxEnd) {
              timescale = u32(b + 20).toInt; langPacked = u16(b + 32)
            } else if (b + 22 <= boxEnd) {
              timescale = u32(b + 12).toInt; langPacked = u16(b + 20)
            }
          // ONLY the mdia-level hdlr names the track's role: real
          // QuickTime files carry a SECOND hdlr under minf (the data
          // handler, 'alis'/'url ') which must not clobber it
          case "hdlr" if parent == "mdia" && b + 12 <= boxEnd =>
            val h = new String(bytes, b + 8, 4, "ISO-8859-1")
            handlerIsText = h == "sbtl" || h == "subt" || h == "text"
          case "stsd" if b + 16 <= boxEnd =>
            codec = new String(bytes, b + 12, 4, "ISO-8859-1")
          case "stts" if b + 8 <= boxEnd =>
            val n = u32(b + 4)
            if (n >= 0 && n <= MaxSamples && b + 8 + 8L * n <= boxEnd)
              sttsRuns = Array.tabulate(n.toInt)(i =>
                (u32(b + 8 + 8 * i).toInt, u32(b + 12 + 8 * i)))
          case "stsz" if b + 12 <= boxEnd =>
            val uniform = u32(b + 4)
            val n = u32(b + 8)
            if (n >= 0 && n <= MaxSamples) {
              if (uniform != 0) sizes = Array.fill(n.toInt)(uniform.toInt)
              else if (b + 12 + 4L * n <= boxEnd)
                sizes = Array.tabulate(n.toInt)(i => u32(b + 12 + 4 * i).toInt)
            }
          case "stco" if b + 8 <= boxEnd =>
            val n = u32(b + 4)
            if (n >= 0 && n <= MaxSamples && b + 8 + 4L * n <= boxEnd)
              chunkOffsets = Array.tabulate(n.toInt)(i => u32(b + 8 + 4 * i))
          case "co64" if b + 8 <= boxEnd =>
            val n = u32(b + 4)
            if (n >= 0 && n <= MaxSamples && b + 8 + 8L * n <= boxEnd)
              chunkOffsets = Array.tabulate(n.toInt)(i => u64(b + 8 + 8 * i))
          case "stsc" if b + 8 <= boxEnd =>
            val n = u32(b + 4)
            if (n >= 0 && n <= MaxSamples && b + 8 + 12L * n <= boxEnd)
              stscRuns = Array.tabulate(n.toInt)(i =>
                (u32(b + 8 + 12 * i).toInt, u32(b + 12 + 12 * i).toInt))
          case _ => ()
        }
        off = boxEnd
      }
    }
    // mvhd PRE-PASS: box order inside moov is not mandated, and a
    // trak may close (decoding its cues, which needs the movie clock
    // for empty-edit delays) before the main walk has met mvhd —
    // read it first so the edit offset is order-independent
    if (decodeCues) {
      var off = 0L
      val end = bytes.length.toLong
      while (movieTimescale == 0 && off + 8 <= end) {
        val size0 = u32(off.toInt)
        val id = new String(bytes, off.toInt + 4, 4, "ISO-8859-1")
        var body = off + 8
        val boxEnd =
          if (size0 == 1 && off + 16 <= end) { body = off + 16; off + u64(off.toInt + 8) }
          else if (size0 == 0) end
          else off + size0
        if (boxEnd < body || boxEnd > end) off = end
        else if (id == "moov") {
          var q = body
          while (movieTimescale == 0 && q + 8 <= boxEnd) {
            val cSize0 = u32(q.toInt)
            val cId = new String(bytes, q.toInt + 4, 4, "ISO-8859-1")
            var cBody = q + 8
            val cEnd =
              if (cSize0 == 1 && q + 16 <= boxEnd) { cBody = q + 16; q + u64(q.toInt + 8) }
              else if (cSize0 == 0) boxEnd
              else q + cSize0
            if (cEnd < cBody || cEnd > boxEnd) q = boxEnd
            else {
              if (cId == "mvhd" && cBody.toInt + 4 <= cEnd) {
                val b = cBody.toInt
                if (bytes(b) == 1 && b + 24 <= cEnd)
                  movieTimescale = u32(b + 20).toInt
                else if (b + 16 <= cEnd) movieTimescale = u32(b + 12).toInt
              }
              q = cEnd
            }
          }
          off = end
        } else off = boxEnd
      }
    }
    walk(0L, bytes.length.toLong)
    (tracks.toSeq, chapRefs.toSet)
  } catch { case _: Throwable => (Nil, Set.empty) } // per-row isolation

  /** xxhash64 (seed 42, the built-in `xxhash64` column's) of every
    * keyframe's byte range, hashed IN PLACE over the container buffer
    * — no frame copies, which is the whole point of an exact-dedup
    * scan at 100 TB. ISO-BMFF: the `stss` sync samples of the first
    * video track in table order (absent `stss` = every sample is
    * sync, per spec) — codec-FREE, so it covers `avc1`/H.264 and
    * anything else the demuxer meets without a decoder in the loop.
    * AVI MJPEG: every `##dc`/`##db` frame (Motion JPEG is
    * all-keyframe). Hashing the exact sample bytes makes the
    * signature invariant under re-muxing (chunk layout, interleave,
    * box order, timescale, tags) and under container swaps that
    * preserve payloads (MJPEG AVI ↔ MP4) — and different the moment
    * one frame is re-ENCODED: this is EXACT dedup, the byte-range
    * sibling of the perceptual [[dhash64]] frame path (which needs a
    * decodable codec and stays the lossy-twin catcher). Null when the
    * bytes yield no frame ranges. Array index = keyframe ordinal.
    */
  def videoKeyframeHashes(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null) return null
    // runs inside codegen'd expressions with no catch above it: any
    // kernel defect on one hostile row must degrade to null, never
    // fail the task 4 times and kill a corpus scan (the
    // [[decodePixels]] per-row-isolation precedent)
    try {
      @inline def hash(start: Int, end: Int): Long =
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
          end - start, 42L)
      val out = Array.newBuilder[Long]
      var n = 0
      aviWalkFrames(bytes, (b, e) => { out += hash(b, e); n += 1 })
      if (n == 0) mp4VideoTrack(bytes).foreach { t =>
        t.syncSamples.foreach { sNum =>
          if (sNum >= 1 && sNum <= t.sampleOffsets.length) {
            val i = sNum - 1
            val off = t.sampleOffsets(i)
            if (off >= 0 && off + t.sampleSizes(i) <= bytes.length) {
              out += hash(off.toInt, (off + t.sampleSizes(i)).toInt)
              n += 1
            }
          }
        }
      }
      if (n == 0) null else out.result()
    } catch { case _: Throwable => null }
  }

  /** Whole-video EXACT fingerprint: an order-sensitive splitmix chain
    * over [[videoKeyframeHashes]] — ONE 64-bit signature per video, so
    * corpus-scale exact dedup is a map-only projection + a groupBy on
    * the signature ([[graft.operators.Dedup.videoDedupCorpus]]), never
    * a pairwise join: identical-bitstream re-muxes collapse to one
    * group no matter how many thousands of copies a crawl delivers
    * (the all-pairs output a coverage join would emit for a k-copy
    * class is k², the fingerprint group is k). Order-sensitive on
    * purpose — the same keyframes re-cut in a different order are a
    * different video; clip-in-longer-cut containment intentionally
    * does NOT share a fingerprint (that asymmetric relation is
    * [[graft.operators.Dedup.videoExactDuplicates]]'s coverage-pair
    * job). Null when no frame ranges parse.
    */
  def videoFingerprint64(bytes: Array[Byte]): java.lang.Long = {
    val hs = videoKeyframeHashes(bytes)
    if (hs == null) return null
    var h = 0x6C62272E07BB0142L // chain seed; any fixed odd constant
    var i = 0
    while (i < hs.length) {
      h = graft.functions.ExprKernels.splitmix64(h ^ hs(i))
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  /** [[videoFingerprint64]] as a Column — codegen'd like
    * [[dhash64Col]].
    */
  def videoFingerprint64Col(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(VideoFingerprint64(expressionOf(content)))
  }

  case class VideoFingerprint64(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val h = videoFingerprint64(v.asInstanceOf[Array[Byte]])
      if (h == null) null else h.longValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("vfp")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Long $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.videoFingerprint64(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final long ${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): VideoFingerprint64 = copy(c)
  }

  /** [[videoKeyframeHashes]] as Catalyst `ArrayData` — the
    * generated-code bridge (null stays null so non-video rows drop
    * out of a `posexplode`).
    */
  def videoKeyframeHashesData(bytes: Array[Byte]):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val a = videoKeyframeHashes(bytes)
    if (a == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(a)
  }

  /** [[videoKeyframeHashes]] as a Column (`array<bigint>`, null for
    * non-video rows) — same codegen discipline as [[dhash64Col]].
    */
  def videoKeyframeHashesCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(VideoKeyframeHashes(expressionOf(content)))
  }

  case class VideoKeyframeHashes(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any =
      videoKeyframeHashesData(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val arr = ctx.freshName("kfhashes")
      ev.copy(code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${c.isNull} ? null :
          graft.operators.Multimodal.videoKeyframeHashesData(${c.value});
        final boolean ${ev.isNull} = $arr == null;
        final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $arr;""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): VideoKeyframeHashes = copy(c)
  }

  /** Minimal-but-valid MJPEG-in-MP4 around pre-encoded JPEG frames —
    * [[syntheticMjpegAvi]]'s ISO-BMFF twin: `ftyp` + `mdat` holding
    * the samples + a full `moov/trak/mdia(mdhd,hdlr vide,minf/stbl)`
    * with real `stsd('jpeg')`/`stts`/`stsc`/`stsz`/`stco`/`stss`
    * tables (sync every `syncEvery`-th sample, 1-based sample 1
    * always sync). `codec` is the sample-entry FourCC (`jpeg` keeps
    * the MJPEG-decodable default; `avc1` builds the re-mux fixtures
    * the exact keyframe-hash dedup needs). `samplesPerChunk` > 0
    * splits the samples across that-many-sample chunks (multi-entry
    * `stco` plus a partial-tail `stsc` run — the chunk-layout
    * dimension a re-mux actually changes); 0 = one chunk holding all
    * samples. Offsets point into `mdat` either way.
    */
  private[graft] def syntheticMjpegMp4(frames: Seq[Array[Byte]],
      syncEvery: Int = 1, timescale: Int = 1000,
      frameDurationTicks: Int = 40, codec: String = "jpeg",
      samplesPerChunk: Int = 0): Array[Byte] = {
    require(frames.nonEmpty, "frames must be non-empty")
    require(syncEvery >= 1, s"syncEvery: $syncEvery")
    require(codec.length == 4, s"codec must be a FourCC: $codec")
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(id.getBytes("ISO-8859-1")).put(payload)
      out.array()
    }
    def u32s(vs: Seq[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt)
      bb.array()
    }
    val ftyp = box("ftyp", "isom\u0000\u0000\u0002\u0000isomiso2".getBytes("ISO-8859-1"))
    val mdatPayload = frames.flatten.toArray
    val mdat = box("mdat", mdatPayload)
    // sample offsets are absolute file offsets into mdat's payload
    val mdatStart = ftyp.length + 8
    val offsets = frames.scanLeft(mdatStart)(_ + _.length).init
    val n = frames.length
    val duration = n * frameDurationTicks
    val mdhd = u32s(Seq(0, 0, 0, timescale, duration, 0))
    val hdlr = u32s(Seq(0, 0)) ++ "vide".getBytes("ISO-8859-1") ++ new Array[Byte](12)
    val stsd = u32s(Seq(0, 1)) ++ box(codec, new Array[Byte](70))
    val stts = u32s(Seq(0, 1, n, frameDurationTicks))
    val spc = if (samplesPerChunk <= 0) n else math.min(samplesPerChunk, n)
    // chunk k (0-based) holds samples [k*spc, min((k+1)*spc, n)); its
    // stco entry is the file offset of its first sample (samples stay
    // contiguous in mdat — only the TABLES change with the layout).
    // stsc: one uniform run, plus a partial-tail run when spc ∤ n.
    val chunkStarts = (0 until n by spc).toSeq
    val stsc = u32s(
      if (n % spc == 0) Seq(0, 1, 1, spc, 1)
      else Seq(0, 2, 1, spc, 1, chunkStarts.length, n % spc, 1))
    val stsz = u32s(Seq(0, 0, n) ++ frames.map(_.length))
    val stco = u32s(Seq(0, chunkStarts.length) ++ chunkStarts.map(offsets(_)))
    val syncIdx = (1 to n).filter(s => (s - 1) % syncEvery == 0)
    val stss = u32s(Seq(0, syncIdx.length) ++ syncIdx)
    val stbl = box("stbl", box("stsd", stsd) ++ box("stts", stts) ++
      box("stsc", stsc) ++ box("stsz", stsz) ++ box("stco", stco) ++
      box("stss", stss))
    val minf = box("minf", stbl)
    val mdia = box("mdia", box("mdhd", mdhd) ++ box("hdlr", hdlr) ++ minf)
    val moov = box("moov", box("trak", mdia))
    ftyp ++ mdat ++ moov
  }

  /** MJPEG movie + a muxed TIMED-TEXT track — [[syntheticMjpegMp4]]'s
    * captioned twin, the fixture for [[mp4SubtitleCues]]: `ftyp` +
    * `mdat` (JPEG frames, then the text samples) + `moov` with the
    * video trak AND a text trak (`hdlr sbtl`, 1000-tick mdhd so
    * ticks == ms, full stsd/stts/stsc/stsz/stco). Gaps between cues
    * become empty samples (tx3g: u16 0; wvtt: `vtte`), exactly how
    * real muxers encode them. `codec`:
    *  - `tx3g` — samples are u16 length + UTF-8;
    *  - `wvtt` — samples are `vttc(payl)` / `vtte` boxes;
    *  - `stpp` — ONE sample holding a TTML doc with per-`<p>` times.
    * Every cue [[mp4SubtitleCues]] reports is a closed form of the
    * arguments.
    */
  private[graft] def syntheticMp4TimedText(frames: Seq[Array[Byte]],
      cues: Seq[(Long, Long, String)],
      codec: String = "tx3g", lang: String = "eng",
      asQtChapters: Boolean = false,
      editDelayMs: Long = 0L,
      cues2: Seq[(Long, Long, String)] = Nil,
      codec2: String = "tx3g", lang2: String = "fre"): Array[Byte] = {
    // editDelayMs > 0 writes a real edts/elst on the FIRST text trak:
    // an initial EMPTY edit of that many movie ticks (mvhd timescale
    // 1000 = ms) then the media - the delayed-subtitle mux
    // convention; cue times are given in MEDIA time and present at
    // mediaTime + editDelayMs. `cues2` muxes a SECOND text track
    // (codec2/lang2) - the multi-language form subtitleCuesByTrack
    // reads.
    require(frames.nonEmpty && cues.nonEmpty, "frames and cues required")
    Seq(codec, codec2).foreach(c =>
      require(c == "tx3g" || c == "wvtt" || c == "stpp", s"codec: $c"))
    Seq(lang, lang2).foreach(l =>
      require(l.length == 3 && l.forall(c => c >= 'a' && c <= 'z'),
        s"ISO-639-2 code: $l"))
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(id.getBytes("ISO-8859-1")).put(payload)
      out.array()
    }
    def u32s(vs: Seq[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(bb.putInt)
      bb.array()
    }
    def utf8(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // text samples: (duration ticks == ms at timescale 1000, bytes)
    def mkSamples(cdc: String, cs: Seq[(Long, Long, String)])
        : Seq[(Int, Array[Byte])] = {
      val sorted = cs.sortBy(_._1)
      val samples = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      if (cdc == "stpp") {
        val body = sorted.map { case (st, en, tx) =>
          s"""    <p begin="${ttmlClock(st)}" end="${ttmlClock(en)}">$tx</p>"""
        }.mkString("\n")
        val ttml = "<tt xmlns=\"http://www.w3.org/ns/ttml\">\n <body>\n" +
          s"  <div>\n$body\n  </div>\n </body>\n</tt>\n"
        samples += ((sorted.last._2.toInt, utf8(ttml)))
      } else {
        var prev = 0L
        sorted.foreach { case (st, en, tx) =>
          require(st >= prev && en >= st, s"cues must not overlap: $st")
          val payload = utf8(tx)
          def lenPrefixed(p: Array[Byte]): Array[Byte] =
            java.nio.ByteBuffer.allocate(2 + p.length)
              .putShort(p.length.toShort).put(p).array()
          if (st > prev) samples += (((st - prev).toInt,
            if (cdc == "tx3g") Array[Byte](0, 0)
            else box("vtte", Array.emptyByteArray)))
          samples += (((en - st).toInt,
            if (cdc == "tx3g") lenPrefixed(payload)
            else box("vttc", box("payl", payload))))
          prev = en
        }
      }
      samples.toSeq
    }
    val samples = mkSamples(codec, cues)
    val samples2 = if (cues2.isEmpty) Nil else mkSamples(codec2, cues2)
    val ftyp = box("ftyp", "isom\u0000\u0000\u0002\u0000isomiso2".getBytes("ISO-8859-1"))
    val mdatPayload = frames.flatten.toArray ++ samples.flatMap(_._2) ++
      samples2.flatMap(_._2)
    val mdat = box("mdat", mdatPayload)
    val mdatStart = ftyp.length + 8
    val frameOffsets = frames.scanLeft(mdatStart)(_ + _.length)
    // video trak (the syntheticMjpegMp4 shape, one chunk)
    val n = frames.length
    val vMdhd = u32s(Seq(0, 0, 0, 1000, n * 40, 0))
    val vHdlr = u32s(Seq(0, 0)) ++ "vide".getBytes("ISO-8859-1") ++ new Array[Byte](12)
    val vStbl = box("stbl",
      box("stsd", u32s(Seq(0, 1)) ++ box("jpeg", new Array[Byte](70))) ++
        box("stts", u32s(Seq(0, 1, n, 40))) ++
        box("stsc", u32s(Seq(0, 1, 1, n, 1))) ++
        box("stsz", u32s(Seq(0, 0, n) ++ frames.map(_.length))) ++
        box("stco", u32s(Seq(0, 1, frameOffsets.head))) ++
        box("stss", u32s(Seq(0, 1, 1))))
    // tkhd v0 (id at body+12) for every trak; when the movie marks
    // the text track as its CHAPTER list, the video trak carries a
    // tref/chap reference to it (the QuickTime convention)
    def tkhd(id: Int): Array[Byte] = {
      val body = new Array[Byte](84) // v0: id at +12, rest zeros
      java.nio.ByteBuffer.wrap(body, 12, 4).putInt(id)
      box("tkhd", body)
    }
    val tref =
      if (!asQtChapters) Array.emptyByteArray
      else box("tref", box("chap", u32s(Seq(2))))
    val vTrak = box("trak", tkhd(1) ++ tref ++ box("mdia",
      box("mdhd", vMdhd) ++ box("hdlr", vHdlr) ++ box("minf", vStbl)))
    // text traks: ticks are ms (timescale 1000), one chunk each after
    // the frames (track 2) and after track 2's samples (track 3)
    def textTrak(trackId: Int, cdc: String, lg: String,
        smp: Seq[(Int, Array[Byte])], startOff: Int,
        delayMs: Long): Array[Byte] = {
      val tn = smp.length
      // mdhd language: 3x5-bit packed ISO-639-2 in the u16 after duration
      val packedLang = ((lg(0) - 0x60) << 10) | ((lg(1) - 0x60) << 5) |
        (lg(2) - 0x60)
      val tMdhd = u32s(Seq(0, 0, 0, 1000, smp.map(_._1).sum,
        packedLang << 16))
      val tHdlr = u32s(Seq(0, 0)) ++ "sbtl".getBytes("ISO-8859-1") ++
        new Array[Byte](12)
      val tStbl = box("stbl",
        box("stsd", u32s(Seq(0, 1)) ++ box(cdc, new Array[Byte](70))) ++
          box("stts", u32s(Seq(0, tn) ++ smp.flatMap(s => Seq(1, s._1)))) ++
          box("stsc", u32s(Seq(0, 1, 1, tn, 1))) ++
          box("stsz", u32s(Seq(0, 0, tn) ++ smp.map(_._2.length))) ++
          box("stco", u32s(Seq(0, 1, startOff))))
      val tEdts =
        if (delayMs <= 0) Array.emptyByteArray
        else box("edts", box("elst", u32s(Seq(0, 2,
          delayMs.toInt, -1, 0x00010000, // empty edit: the delay
          smp.map(_._1).sum, 0, 0x00010000)))) // then the media
      box("trak", tkhd(trackId) ++ tEdts ++ box("mdia",
        box("mdhd", tMdhd) ++ box("hdlr", tHdlr) ++ box("minf", tStbl)))
    }
    val textStart = frameOffsets.last
    val tTrak = textTrak(2, codec, lang, samples, textStart, editDelayMs)
    val tTrak2 =
      if (samples2.isEmpty) Array.emptyByteArray
      else textTrak(3, codec2, lang2, samples2,
        textStart + samples.map(_._2.length).sum, 0L)
    // mvhd: the movie clock empty-edit durations tick on (ms)
    val mvhd = box("mvhd", u32s(Seq(0, 0, 0, 1000, n * 40)) ++
      new Array[Byte](80))
    ftyp ++ mdat ++ box("moov", mvhd ++ vTrak ++ tTrak ++ tTrak2)
  }

  /** Keyframe count of a video asset — AVI MJPEG (every frame is a
    * keyframe) or ISO-BMFF (`stss` sync samples; a BMFF file without
    * a parseable video sample table is null). The card-level "how
    * seekable / how decodable is this corpus" scalar; public for the
    * generated-code static call.
    */
  def videoKeyframes(bytes: Array[Byte]): java.lang.Integer = {
    if (bytes == null) return null
    try {
      val avi = aviMjpegFrameCount(bytes) // count only — no frame copies
      if (avi > 0) return java.lang.Integer.valueOf(avi)
      mp4VideoTrack(bytes) match {
        case Some(t) => java.lang.Integer.valueOf(t.syncSamples.length)
        case None => webmInfo(bytes) match {
          // Matroska Cues = the seek table, one CuePoint per indexed
          // keyframe; a Cues-less (live-muxed) file stays null-unknown
          case Some(w) if w.kind == "video" && w.cuePoints > 0 =>
            java.lang.Integer.valueOf(w.cuePoints)
          case _ => null
        }
      }
    } catch { case _: Throwable => null } // per-row isolation, [[decodePixels]] rule
  }

  /** [[videoKeyframes]] as a Column — codegen'd like [[dhash64Col]]. */
  def videoKeyframesCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    columnOf(VideoKeyframes(expressionOf(content)))
  }

  case class VideoKeyframes(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val k = videoKeyframes(v.asInstanceOf[Array[Byte]])
      if (k == null) null else k.intValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val c = child.genCode(ctx)
      val boxed = ctx.freshName("vkeys")
      ev.copy(code = code"""
        ${c.code}
        java.lang.Integer $boxed = ${c.isNull} ? null :
          graft.operators.Multimodal.videoKeyframes(${c.value});
        final boolean ${ev.isNull} = $boxed == null;
        final int ${ev.value} = ${ev.isNull} ? 0 : $boxed.intValue();""")
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): VideoKeyframes = copy(c)
  }

  private[graft] def aviMjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val frames = Seq.newBuilder[Array[Byte]]
    aviWalkFrames(bytes, (body, bodyEnd) =>
      frames += java.util.Arrays.copyOfRange(bytes, body, bodyEnd))
    frames.result()
  }

  /** Count AVI MJPEG frames WITHOUT copying their bytes — the card
    * scan only needs the number, and copying every frame of a large
    * video to count them is exactly the allocation a 100 TB scan
    * can't afford.
    */
  private[graft] def aviMjpegFrameCount(bytes: Array[Byte]): Int = {
    var n = 0
    aviWalkFrames(bytes, (_, _) => n += 1)
    n
  }

  /** RIFF walk visiting each `NNdc`/`NNdb` frame's (bodyStart,
    * bodyEnd) byte range — the one implementation behind frame
    * extraction and frame counting.
    */
  private def aviWalkFrames(bytes: Array[Byte],
      onFrame: (Int, Int) => Unit): Unit = {
    if (bytes == null || bytes.length < 12 ||
      !(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F'))
      return
    @inline def u32(off: Int): Long =
      (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
    // depth-capped: crafted 100k-deep LIST nesting exhausts the cap,
    // never the task stack (the BMFF walkers' 16-level rule)
    def walk(start: Int, end: Int, depth: Int = 0): Unit = {
      if (depth > 16) return
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val id = new String(bytes, off, 4, "ISO-8859-1")
        val size = u32(off + 4)
        val body = off + 8
        if (size < 0 || size > Int.MaxValue - body) ok = false
        else {
          val bodyEnd = body + size.toInt
          val truncated = bodyEnd > end
          if (id == "RIFF" || id == "LIST") {
            // a truncated CONTAINER still holds intact leading chunks —
            // clamp and recurse (every frame before the damage survives)
            val clamped = math.min(bodyEnd, end)
            if (clamped - body >= 4) walk(body + 4, clamped, depth + 1) // skip form/subtype FourCC
          } else if (!truncated &&
            Character.isDigit(id.charAt(0)) && Character.isDigit(id.charAt(1)) &&
            id.charAt(2) == 'd' && (id.charAt(3) == 'c' || id.charAt(3) == 'b')) {
            onFrame(body, bodyEnd)
          }
          // a truncated LEAF ends the sibling walk (its length lies
          // about where the next chunk starts)
          if (truncated) ok = false
          else off = bodyEnd + (size.toInt & 1) // RIFF chunks are word-aligned
        }
      }
    }
    walk(0, bytes.length)
  }

  /** Minimal MJPEG AVI container around pre-encoded JPEG frames —
    * fixture builder for the frame-walk tests and gate (same role as
    * [[syntheticPng]]).
    */
  private[graft] def syntheticMjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("ISO-8859-1")).putInt(body.length).put(body)
      if (pad == 1) out.put(0.toByte)
      out.array()
    }
    val movi = "movi".getBytes("ISO-8859-1") ++
      frames.flatMap(f => chunk("00dc", f)).toArray
    val riffBody = "AVI ".getBytes("ISO-8859-1") ++ chunk("LIST", movi)
    chunk("RIFF", riffBody)
  }

  /** Explode video assets into their sampled frames: every `stride`-th
    * MJPEG frame as its own row (input columns + `frame_idx`,
    * `frame`), ready for the image stack — [[decode]]/[[imageStats]]
    * for metadata and means, [[resizeImages]], [[annotateImages]] for
    * provider inference. Extraction is a map-side generator (no
    * shuffle): at scale the downstream per-frame work, not the walk,
    * dominates, and it parallelizes by frame row.
    *
    * Containers: MJPEG-AVI (every `movi` dc/db chunk is a frame) and
    * MJPEG-in-MP4 ([[mp4KeyframeSamples]] — KEYFRAMES only, located
    * by the `stbl` sample tables with no codec in the loop;
    * `frame_idx` is the sample index, so a re-mux of the same frames
    * indexes identically). Anything else produces zero rows (a frame
    * operator has nothing to say about stills).
    */
  def videoFrames(df: DataFrame, contentCol: String = "content",
      stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("frame_idx", IntegerType) :+
      StructField("frame", BinaryType))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](contentIdx)
        val avi = aviMjpegFrames(bytes).zipWithIndex.map(_.swap)
        val frames = if (avi.nonEmpty) avi else mp4KeyframeSamples(bytes)
          .collect { case (i, f)
            if f.length >= 2 && f(0) == 0xFF.toByte && f(1) == 0xD8.toByte =>
            (i, f) // only JPEG-coded samples feed the image stack
          }
        frames.collect {
          case (i, f) if i % stride == 0 => Row.fromSeq(row.toSeq :+ i :+ f)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling plan for video-like assets: given per-asset frame
    * counts, emit (asset, frame_idx) rows for every `stride`-th frame —
    * pure relational (sequence + explode), ready to feed a frame
    * decoder. This is the partition-parallel "seek list" a real
    * pipeline hands to the codec.
    */
  def sampleFrames(df: DataFrame, idCol: String, nFramesCol: String,
      stride: Int): DataFrame =
    df.select(col(idCol),
      explode(sequence(lit(0), greatest(col(nFramesCol).cast("int") - 1, lit(0)),
        lit(stride))).as("frame_idx"))

  /** Resize plan: attach target dims preserving aspect ratio — pure
    * column math over decoded metadata (the real resize kernel,
    * [[resizeImages]], maps over (content, target dims)).
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val w = col("decoded.width")
    val h = col("decoded.height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"), lit(1.0))
    decoded
      .withColumn("target_w", ceil(w * scale).cast("int"))
      .withColumn("target_h", ceil(h * scale).cast("int"))
  }

  val ResizedSchema: StructType = StructType(Seq(
    StructField("content", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("ok", BooleanType, nullable = false),
    StructField("error", StringType)))

  /** REAL raster resize — the kernel half of [[resizePlan]]: decode
    * (EXIF-aware, like [[imageStats]]), downscale to the
    * aspect-preserving bound (`ceil`, matching resizePlan's column
    * math; never upscales), bilinear `Graphics2D`, re-encode as PNG
    * (lossless — the output raster is exactly the scaled pixels,
    * independent of the input codec). Non-decodable rows degrade to
    * error rows. Batched mapPartitions like [[decode]]; at 100 TB
    * this is the classic CPU-bound map stage — no shuffle, parallel
    * in input splits.
    */
  def resizeImages(df: DataFrame, contentCol: String = "content",
      maxSide: Int = 512, batchSize: Int = 64): DataFrame = {
    require(maxSide >= 1, s"maxSide must be >= 1: $maxSide")
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("resized", ResizedSchema))
    val contentIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val resized = decodePixels(row.getAs[Array[Byte]](contentIdx)) match {
            case Some(img) =>
              val scale = math.min(
                maxSide.toDouble / math.max(img.getWidth, img.getHeight), 1.0)
              val tw = math.ceil(img.getWidth * scale).toInt
              val th = math.ceil(img.getHeight * scale).toInt
              val out = new java.awt.image.BufferedImage(tw, th,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, tw, th, null)
              } finally g.dispose()
              val buf = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", buf)
              Row(buf.toByteArray, tw, th, true, null)
            case None =>
              Row(null, null, null, false, "not a decodable raster")
          }
          Row.fromSeq(row.toSeq :+ resized)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
