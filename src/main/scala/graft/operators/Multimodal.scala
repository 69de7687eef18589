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

  /** STUB decode kernel: deterministic pseudo-metadata from the bytes
    * (first bytes sniff the "format"; dimensions derived from the
    * content length — a fake as honest as a hash, and one a SQL oracle
    * can restate, so the decode PLUMBING is hash-compare-checkable,
    * q44). Replace with a real codec (e.g. FFI to libjpeg/ffmpeg) —
    * the signature (bytes in, metadata out, total function) is the
    * contract.
    */
  private[graft] def decodeStub(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty) return Row(null, null, null, null, false, "empty content")
    val format =
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else "raw"
    val width = 64 + bytes.length % 1024
    // long arithmetic: length * 31 overflows Int beyond ~69 MB assets
    val height = 64 + (bytes.length.toLong * 31 % 1024).toInt
    Row(width, height, 3, format, true, null)
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
