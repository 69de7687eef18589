package graft.io

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) crawl-archive ingestion — the front door of a
  * crawl-scale training-data pipeline (Common Crawl publishes its
  * corpus as gzipped WARC; the reference's crawl surface,
  * `web_scrape_tool.py`, consumes live pages — this is the archived
  * equivalent at corpus scale).
  *
  * Format essentials implemented here (from the public ISO 28500 /
  * WARC 1.1 spec): a WARC file is a sequence of records, each a
  * `WARC/1.x` version line + CRLF-terminated named headers + empty
  * line + exactly `Content-Length` block bytes + two CRLFs. Common
  * Crawl compresses each record as its OWN gzip member, concatenated
  * — `GZIPInputStream` consumes concatenated members natively, so the
  * same streaming parser serves `.warc` and `.warc.gz`.
  *
  * Scale: the parallelism grain is the FILE (`sparkContext
  * .binaryFiles` → one `PortableDataStream` per file — Common Crawl
  * segments the corpus into ~1 GB files precisely so file-grain
  * parallelism is enough; 100 TB ≈ 100k files ≫ any cluster's cores).
  * Records stream one at a time off the (decompressing) input stream
  * — per-task memory is bounded by the largest single RECORD, never
  * the file. A corrupt file yields one error row and the scan
  * continues (the [[PdfSource.readPages]] isolation contract).
  */
object WarcSource {

  val RecordSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** One row per WARC record under `dir` (both `.warc` and `.warc.gz`,
    * sniffed per file by gzip magic). For `response` records whose
    * block is an HTTP message, the HTTP envelope is split off:
    * `http_status`/`http_content_type` are populated and `payload` is
    * the entity body; for every other record `payload` is the raw
    * block.
    */
  def read(spark: SparkSession, dir: String, glob: String = "*.warc*",
      minPartitions: Int = 0): DataFrame = {
    val path = if (glob.isEmpty) dir else s"$dir/$glob"
    // binaryFiles' CombineFileInputFormat packs small files into few
    // splits (its split size is floored at spark.files.openCostInBytes,
    // 4 MB) — right for 1 GB crawl segments, wrong for a small local
    // corpus. Floor the partition count at the session's parallelism by
    // redistributing the FILE HANDLES (a PortableDataStream is a path +
    // offsets — the shuffle moves no payload bytes; the
    // Scale.parallelismFloor discipline: identity at real scale, where
    // split count >= cores already).
    val minParts =
      if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val handles0 = spark.sparkContext.binaryFiles(path, minParts)
    val handles =
      if (handles0.getNumPartitions < minParts) handles0.repartition(minParts)
      else handles0
    val rdd = handles.flatMap {
      case (file, pds) =>
        new Iterator[Row] {
          private var in: InputStream = _
          private var done = false
          private var pending: Row = _
          private def ensureOpen(): Unit = if (in == null) {
            val raw = new BufferedInputStream(pds.open(), 1 << 16)
            raw.mark(2)
            val b0 = raw.read(); val b1 = raw.read()
            raw.reset()
            in = if (b0 == 0x1f && b1 == 0x8b)
              new BufferedInputStream(new GZIPInputStream(raw), 1 << 16)
            else raw
          }
          // sets `pending` to the next row, or `done` at clean EOF; a
          // parse error emits ONE error row and ends the file's stream
          // (record boundaries are untrustworthy after a bad record)
          private def fetch(): Unit = {
            if (done || pending != null) return
            try {
              ensureOpen()
              parseRecord(in) match {
                case Some(r) => pending = toRow(file, r)
                case None => done = true; in.close()
              }
            } catch {
              case e: Exception =>
                done = true
                try if (in != null) in.close() catch { case _: Exception => () }
                pending = Row(file, null, null, null, null, null, null,
                  null, null, null,
                  s"${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          }
          override def hasNext: Boolean = { fetch(); pending != null }
          override def next(): Row = {
            fetch()
            if (pending == null) throw new NoSuchElementException
            val r = pending
            pending = null
            r
          }
        }
    }
    spark.createDataFrame(rdd, RecordSchema)
  }

  /** The crawl→documents bridge: keep successful HTML `response`
    * records and extract text with the engine's HTML→text kernel —
    * the raw-corpus input of the curation stack (dedup, NB/LM quality
    * gates, DSIR). Map-only: no shuffle between the WARC scan and the
    * text extraction.
    */
  def warcDocuments(records: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    records
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(
        col("record_id"),
        col("target_uri").as("url"),
        col("warc_date"),
        TextFunctions.htmlToText(
          decode(col("payload"), "UTF-8")).as("text"))
  }

  // ---- record parsing -------------------------------------------------

  private[io] case class WarcRecord(headers: Map[String, String],
      block: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.get(name.toLowerCase(java.util.Locale.ROOT))
  }

  /** Read one record off the stream; None at clean EOF. */
  private[io] def parseRecord(in: InputStream): Option[WarcRecord] = {
    var line = readLine(in)
    // tolerate inter-record blank lines beyond the mandated two CRLFs
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return None
    if (!line.startsWith("WARC/"))
      throw new IllegalArgumentException(s"expected WARC version line, got: $line")
    val hdrs = Map.newBuilder[String, String]
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      if (i < 0) throw new IllegalArgumentException(s"malformed WARC header: $h")
      hdrs += h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT) ->
        h.substring(i + 1).trim
      h = readLine(in)
    }
    if (h == null) throw new EOFException("EOF inside WARC headers")
    val rec = WarcRecord(hdrs.result(), Array.emptyByteArray)
    val len = rec.header("content-length").map(_.toLong).getOrElse(
      throw new IllegalArgumentException("WARC record without Content-Length"))
    if (len > Int.MaxValue - 8)
      throw new IllegalArgumentException(s"unsupported WARC block size: $len")
    val block = readFully(in, len.toInt)
    Some(rec.copy(block = block))
  }

  private def toRow(file: String, r: WarcRecord): Row = {
    val wtype = r.header("warc-type").orNull
    val ctype = r.header("content-type").orNull
    val (status, httpCt, payload) =
      if (wtype == "response" && ctype != null &&
          ctype.startsWith("application/http")) splitHttp(r.block)
      else (null, null, r.block)
    Row(file,
      r.header("warc-record-id").orNull,
      wtype,
      r.header("warc-date").orNull,
      r.header("warc-target-uri").orNull,
      ctype,
      java.lang.Long.valueOf(r.block.length.toLong),
      status, httpCt, payload, null)
  }

  /** Split an HTTP response message into (status, content-type, body).
    * Malformed messages fall back to the raw block with null envelope
    * — ingestion never drops payload bytes on a bad envelope.
    */
  private[io] def splitHttp(block: Array[Byte]):
      (Integer, String, Array[Byte]) = {
    val sep = indexOfDoubleCrlf(block)
    if (sep < 0) return (null, null, block)
    val head = new String(block, 0, sep, "ISO-8859-1")
    val lines = head.split("\r\n")
    val status = lines.headOption.filter(_.startsWith("HTTP/")).flatMap { sl =>
      sl.split(" ").lift(1).flatMap(s => scala.util.Try(s.toInt).toOption)
    }
    if (status.isEmpty) return (null, null, block)
    val ct = lines.tail.collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }
    (Integer.valueOf(status.get), ct.orNull,
      java.util.Arrays.copyOfRange(block, sep + 4, block.length))
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** CRLF-terminated line (returned without the terminator); bare LF
    * tolerated; null at EOF before any byte.
    */
  private def readLine(in: InputStream): String = {
    val out = new ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') out.write(c)
      c = in.read()
    }
    new String(out.toByteArray, "UTF-8")
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) throw new EOFException(
        s"EOF inside WARC block: expected $n bytes, got $off")
      off += k
    }
    buf
  }

  // ---- record serialization (export + spec fixtures) ------------------

  /** Serialize one record (version line, headers, block, trailing
    * CRLF CRLF) — the exact byte form [[parseRecord]] consumes.
    */
  private[graft] def recordBytes(headers: Seq[(String, String)],
      block: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(block.length + 256)
    def w(s: String): Unit = out.write(s.getBytes("UTF-8"))
    w("WARC/1.1\r\n")
    headers.foreach { case (k, v) => w(s"$k: $v\r\n") }
    w(s"Content-Length: ${block.length}\r\n\r\n")
    out.write(block)
    w("\r\n\r\n")
    out.toByteArray
  }

  /** Wrap a serialized record as its own gzip member (the Common
    * Crawl layout — members concatenate into a seekable-by-record
    * `.warc.gz`).
    */
  private[graft] def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  /** Export a corpus as per-record-gzipped WARC `response` records —
    * one `part-NNNNN.warc.gz` per partition, written straight to the
    * Hadoop filesystem (works on any FS the session can reach).
    * Expects columns (id, url, date, payload: binary|string).
    *
    * Scale: map-only — each task streams its partition's records
    * through one open file; no driver collection, no shuffle.
    */
  def write(df: DataFrame, idCol: String, urlCol: String, dateCol: String,
      payloadCol: String, dir: String): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val cols = df.select(
      col(idCol).cast("string"), col(urlCol).cast("string"),
      col(dateCol).cast("string"), col(payloadCol).cast("binary"))
    cols.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val p = new org.apache.hadoop.fs.Path(
          dir, f"part-${tc.partitionId()}%05d.warc.gz")
        val fs = p.getFileSystem(conf.value)
        val out: OutputStream = fs.create(p, true)
        try {
          it.foreach { r =>
            val body = Option(r.getAs[Array[Byte]](3)).getOrElse(Array.emptyByteArray)
            val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
              s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
            val block = http ++ body
            out.write(gzipMember(recordBytes(Seq(
              "WARC-Type" -> "response",
              "WARC-Record-ID" -> s"<urn:uuid:${r.getString(0)}>",
              "WARC-Date" -> r.getString(2),
              "WARC-Target-URI" -> r.getString(1),
              "Content-Type" -> "application/http; msgtype=response"), block)))
          }
        } finally out.close()
      }
    }
  }
}
