package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Engine.table(spark, dir, "documents")
    docs.count()
    // hamming histogram of candidate pairs (bands=16)
    val hashed = Dedup.simhashSignatures(docs, "doc_id", "text").localCheckpoint(false)
    val bandStructs = (0 until 16).map(b =>
      struct(lit(b).as("band"), shiftright(col("sh"), b * 4).bitwiseAND(15L).as("chunk")))
    val banded = hashed.select(col("id"), col("sh"),
      explode(array(bandStructs: _*)).as("lsh"))
      .select(col("id"), col("sh"), col("lsh.band"), col("lsh.chunk"))
    val left = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val right = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sh").as("sh_b"))
    val pairs = left.join(right, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
    pairs.filter(col("hamming") <= 15)
      .select(col("hamming")).groupBy("hamming").count().orderBy("hamming").show(20)
    // distinct pair volumes at various thresholds
    for (h <- Seq(9, 10, 11, 12)) {
      val n = pairs.filter(col("hamming") <= h).select("id_a", "id_b").distinct().count()
      println(s"maxHamming=$h distinct pairs: $n")
    }
    spark.stop()
  }
}
