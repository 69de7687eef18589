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
  * buffer setup per batch, not per row. The decode kernel itself is a
  * deterministic STUB here (media codecs are not in this environment);
  * everything around it — schemas, batching, partitioning, null
  * handling — is real and tested, and swapping the stub for a real
  * codec changes one function.
  */
object Multimodal {

  /** Typed metadata produced by decode: mirrors what an image decoder
    * would emit. `ok=false` rows carry the failure reason (corrupt
    * media must degrade per-row, never fail the scan — DROPMALFORMED
    * discipline for media).
    */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType),
    StructField("ok", BooleanType, nullable = false),
    StructField("error", StringType)))

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

  /** Decode kernel: REAL pure-JDK header parses for PNG (IHDR) and
    * JPEG (SOF marker walk) — dimensions and channel counts are the
    * actual file metadata; malformed files of either format degrade to
    * per-row error rows. Formats beyond those two keep the
    * deterministic length-derived stub (full pixel decode needs codec
    * libs this environment lacks); swapping in a real codec (FFI to
    * libjpeg/ffmpeg) still changes only this function — bytes in,
    * metadata Row out, total.
    */
  private[graft] def decodeStub(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty) return Row(null, null, null, null, false, "empty content")
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte)
      return decodeJpeg(bytes)
    if (bytes.length >= 8 && bytes(0) == 0x89.toByte && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G')
      return decodePng(bytes)
    val width = 64 + bytes.length % 1024
    // long arithmetic: length * 31 overflows Int beyond ~69 MB assets
    val height = 64 + (bytes.length.toLong * 31 % 1024).toInt
    Row(width, height, 3, "raw", true, null)
  }

  /** PNG IHDR parse: width/height big-endian at offsets 16/20,
    * channels from the color type at 25 (grayscale 1, truecolor 3,
    * palette 1, gray+alpha 2, RGBA 4).
    */
  private[graft] def decodePng(b: Array[Byte]): Row = {
    if (b.length < 26) return Row(null, null, null, "png", false, "truncated png header")
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return Row(null, null, null, "png", false, "missing IHDR chunk")
    def be32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val w = be32(16)
    val h = be32(20)
    val channels = (b(25) & 0xff) match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case other => return Row(null, null, null, "png", false, s"bad color type $other")
    }
    if (w <= 0 || h <= 0) Row(null, null, null, "png", false, s"bad dimensions ${w}x$h")
    else Row(w, h, channels, "png", true, null)
  }

  /** JPEG SOF parse: walk marker segments from SOI to the first frame
    * header (SOF0-15 minus DHT/JPG/DAC), read height/width/components.
    */
  private[graft] def decodeJpeg(b: Array[Byte]): Row = {
    var i = 2 // past SOI
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xFF)
        return Row(null, null, null, "jpeg", false, f"bad marker byte at $i")
      val mk = b(i + 1) & 0xff
      if (mk == 0xFF) i += 1 // fill byte
      else if (mk == 0x01 || (mk >= 0xD0 && mk <= 0xD9)) i += 2 // standalone
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (mk >= 0xC0 && mk <= 0xCF && mk != 0xC4 && mk != 0xC8 && mk != 0xCC) {
          if (i + 9 >= b.length)
            return Row(null, null, null, "jpeg", false, "truncated SOF segment")
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          val channels = b(i + 9) & 0xff
          return if (w <= 0 || h <= 0)
            Row(null, null, null, "jpeg", false, s"bad dimensions ${w}x$h")
          else Row(w, h, channels, "jpeg", true, null)
        }
        if (len < 2) return Row(null, null, null, "jpeg", false, "bad segment length")
        i += 2 + len
      }
    }
    Row(null, null, null, "jpeg", false, "no SOF marker found")
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
          val meta =
            try decodeStub(row.getAs[Array[Byte]](contentIdx))
            catch { case e: Exception => Row(null, null, null, null, false, e.getMessage) }
          Row.fromSeq(row.toSeq :+ meta)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB feature extractor: deterministic pseudo-embedding (unit-norm
    * dim-`dim` vector from a rolling hash). The real version is a
    * batched inference call — identical batching contract to [[decode]].
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
          val vec = new Array[Float](dim)
          if (bytes != null && bytes.nonEmpty) {
            var h = 0x9E3779B97F4A7C15L
            var i = 0
            while (i < math.min(bytes.length, 4096)) {
              h = graft.functions.CatalystExpressions.splitmix64(h ^ bytes(i))
              vec(i % dim) += (h.toInt.toFloat / Int.MaxValue)
              i += 1
            }
            val norm = math.sqrt(vec.map(x => x.toDouble * x).sum).toFloat
            if (norm > 0) (0 until dim).foreach(j => vec(j) = vec(j) / norm)
          }
          Row.fromSeq(row.toSeq :+ vec.toSeq)
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
    * column math over decoded metadata (the real resize kernel then
    * maps over (content, target_w, target_h)).
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val w = col("decoded.width")
    val h = col("decoded.height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"), lit(1.0))
    decoded
      .withColumn("target_w", ceil(w * scale).cast("int"))
      .withColumn("target_h", ceil(h * scale).cast("int"))
  }
}
