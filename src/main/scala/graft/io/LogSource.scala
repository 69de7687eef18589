package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL / log / text sources — parity with the reference's
  * runtime-logs and filesystem tools.
  */
object LogSource {

  /** JSONL scan with corrupt-line skip — exactly the reference's
    * behavior of silently skipping undecodable lines
    * (`runtime_logs_tool.py:25-46`) via DROPMALFORMED. Glob patterns
    * cover the sessions-dir layouts (`runtime_logs_tool.py:83-140`),
    * e.g. a star-glob over `sessions/&#42;/logs/details.jsonl`.
    */
  def readJsonl(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read
      .option("mode", "DROPMALFORMED")
      .json(pathGlob)

  /** L1/L2/L3 log-level scan (`runtime_logs_tool.py:83-232`): summary /
    * details / tool logs, newest first, bounded — the reference's
    * default limit is 20 (`runtime_logs_tool.py:86`).
    */
  def queryLogs(spark: SparkSession, pathGlob: String,
      statusFilter: Option[String] = None,
      orderCol: String = "started_at", limit: Int = 20): DataFrame = {
    val df = readJsonl(spark, pathGlob)
    val filtered = statusFilter.fold(df)(s => df.filter(col("status") === s))
    filtered.orderBy(desc(orderCol)).limit(limit)
  }

  /** Regex scan over files — `grep_search` parity
    * (`grep_search.py:13-90`): matching lines with their source file.
    */
  def grepSearch(spark: SparkSession, pathGlob: String, pattern: String): DataFrame =
    spark.read.textFile(pathGlob).toDF("line")
      .withColumn("file", input_file_name())
      .filter(col("line").rlike(pattern))

  /** Blob page read with O(1) byte-offset seek and UTF-8 boundary
    * trimming — `load_data` parity (`data_tools.py:68-170`): seeks to
    * `offsetBytes`, reads `limitBytes`, then trims any partial UTF-8
    * sequence at both ends so the result is valid text.
    */
  def loadData(path: String, offsetBytes: Long = 0, limitBytes: Int = 10000): String = {
    val f = new java.io.RandomAccessFile(path, "r")
    try {
      val total = f.length()
      if (offsetBytes >= total) return ""
      f.seek(offsetBytes)
      val buf = new Array[Byte](math.min(limitBytes.toLong, total - offsetBytes).toInt)
      f.readFully(buf)
      var start = 0
      // skip UTF-8 continuation bytes at the start (mid-sequence seek)
      while (start < buf.length && (buf(start) & 0xC0) == 0x80) start += 1
      var end = buf.length
      // back off a trailing incomplete multi-byte sequence
      var i = buf.length - 1
      while (i >= start && (buf(i) & 0xC0) == 0x80) i -= 1
      if (i >= start) {
        val lead = buf(i) & 0xFF
        val expected =
          if (lead >= 0xF0) 4 else if (lead >= 0xE0) 3 else if (lead >= 0xC0) 2 else 1
        if (buf.length - i < expected) end = i
      }
      new String(buf, start, end - start, java.nio.charset.StandardCharsets.UTF_8)
    } finally f.close()
  }

  /** Blob sink (`save_data`, `data_tools.py:24-65`). */
  def saveData(path: String, data: String, append: Boolean = false): Unit = {
    val w = new java.io.FileOutputStream(path, append)
    try w.write(data.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally w.close()
  }

  /** String-replace blob edit (`edit_data`, `data_tools.py:313`):
    * replaces every occurrence of `find` (literal, not regex) and
    * returns the replacement count.
    */
  def editData(path: String, find: String, replace: String): Int = {
    require(find.nonEmpty, "find must be non-empty")
    val content = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    var count = 0
    var idx = content.indexOf(find)
    while (idx >= 0) { count += 1; idx = content.indexOf(find, idx + find.length) }
    if (count > 0) saveData(path, content.replace(find, replace))
    count
  }
}
