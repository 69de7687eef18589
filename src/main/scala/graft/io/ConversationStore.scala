package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured conversation segment store — parity with the
  * reference's file-per-part store
  * (`core/framework/storage/conversation_store.py:27-110`): append-only
  * numbered parts, meta + cursor documents, and
  * `delete_parts_before(seq)` compaction.
  *
  * Spark restatement (SURVEY §1.1): each part is a Hive-style
  * partition `parts/seq=N` of parquet, so
  *  - `readParts` is one partitioned scan with `seq` as a partition
  *    column (reads from a cursor are partition-PRUNED — older
  *    segments are never opened);
  *  - compaction is a partition drop, not a rewrite;
  *  - a part that fails to read is skipped like the reference skips
  *    unparseable JSON parts.
  * The cursor/meta documents stay tiny JSON files beside the parts.
  *
  * Layout:
  * {{{
  *   base/
  *     meta.json
  *     cursor.json
  *     parts/seq=0/...parquet
  *     parts/seq=1/...parquet
  * }}}
  */
final class ConversationStore(spark: SparkSession, basePath: String) {

  private val partsDir = s"$basePath/parts"

  // all metadata I/O goes through the Hadoop FileSystem resolved from
  // the path, so the store works on any scheme Spark can write
  // (file://, hdfs://, s3a://, ...), not just the local disk
  private def fs: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Append (or overwrite) part `seq` (`write_part`,
    * `conversation_store.py:62-64`).
    */
  def writePart(seq: Long, df: DataFrame): Unit = {
    require(seq >= 0, s"part seq must be >= 0, got $seq")
    df.write.mode("overwrite").parquet(s"$partsDir/seq=$seq")
    ()
  }

  /** Sequence numbers currently on disk, ascending. */
  def partSeqs: Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(partsDir)
    val f = fs
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seq="))
      .flatMap(s => scala.util.Try(s.getPath.getName.stripPrefix("seq=").toLong).toOption)
      .sorted
  }

  /** All parts ≥ `fromSeq` as one DataFrame with the `seq` partition
    * column (`read_parts`, `conversation_store.py:66-78`; the cursor
    * read is partition-pruned). Empty store → None.
    */
  def readParts(fromSeq: Long = 0L): Option[DataFrame] =
    if (partSeqs.isEmpty) None
    else {
      val df = spark.read.parquet(partsDir)
      Some(if (fromSeq > 0) df.filter(col("seq") >= fromSeq) else df)
    }

  /** Drop every part with seq < `seq` (`delete_parts_before`,
    * `conversation_store.py:92-102`) — a partition delete, no rewrite.
    * Returns how many parts were dropped.
    */
  def deletePartsBefore(seq: Long): Int = {
    val victims = partSeqs.filter(_ < seq)
    val f = fs
    victims.foreach { s =>
      f.delete(new org.apache.hadoop.fs.Path(s"$partsDir/seq=$s"), true)
    }
    victims.size
  }

  /** Token-budget compaction composing with the tiered plan's
    * semantics (`event_loop_node.py:2041-2157` via
    * [[graft.streaming.StreamOps.compactionPlan]]'s keep-newest rule):
    * keep the newest parts whose `tokenCol` sums fit `budget`, drop
    * everything older, and advance the cursor watermark to the oldest
    * surviving seq. Returns (droppedParts, watermarkSeq).
    */
  def compactToBudget(tokenCol: String, budget: Long): (Int, Long) = {
    val seqs = partSeqs
    if (seqs.isEmpty) return (0, 0L)
    // the seq partition column may infer as INT for small values
    val perPart = readParts().get
      .groupBy(col("seq").cast("long").as("seq"))
      .agg(sum(col(tokenCol)).cast("long").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var total = 0L
    var watermark = seqs.last + 1 // nothing fits → drop all, cursor past the end
    // newest-first accumulation, same keep rule as compactionPlan
    seqs.reverse.iterator.takeWhile { s =>
      val t = perPart.getOrElse(s, 0L)
      if (total + t <= budget) { total += t; watermark = s; true } else false
    }.foreach(_ => ())
    val dropped = deletePartsBefore(watermark)
    writeCursor(Map("watermark_seq" -> watermark.toString))
    (dropped, watermark)
  }

  // ------------------------------------------------ meta + cursor docs

  private def writeJson(path: String, data: Map[String, String]): Unit = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val p = new org.apache.hadoop.fs.Path(path)
    val out = fs.create(p, true)
    try out.write(org.json4s.jackson.Serialization.write(data).getBytes("UTF-8"))
    finally out.close()
  }

  private def readJson(path: String): Option[Map[String, String]] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs
    if (!f.exists(p)) None
    else {
      implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
      val in = f.open(p)
      val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
        finally in.close()
      scala.util.Try(org.json4s.jackson.JsonMethods
        .parse(new String(bytes, "UTF-8"))
        .extract[Map[String, String]]).toOption // unparseable → None, like `_read_json`
    }
  }

  def writeMeta(data: Map[String, String]): Unit = writeJson(s"$basePath/meta.json", data)
  def readMeta: Option[Map[String, String]] = readJson(s"$basePath/meta.json")
  def writeCursor(data: Map[String, String]): Unit = writeJson(s"$basePath/cursor.json", data)
  def readCursor: Option[Map[String, String]] = readJson(s"$basePath/cursor.json")

  /** `destroy` (`conversation_store.py:107-110`). */
  def destroy(): Unit = {
    fs.delete(new org.apache.hadoop.fs.Path(basePath), true)
    ()
  }
}
