package graft

import org.apache.spark.sql.functions._
import graft.io.TarSource
import graft.operators.TextOps

/** WebDataset tar shards: pure-JDK ustar round-trip, byte-determinism,
  * sample grouping, hash sharding, and foreign (python-tarfile)
  * archive interop — including PAX extended headers the reader must
  * skip. Fixtures from `scripts/make_tar_fixture.py`.
  */
class TarSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private def sampleDf = Seq(
    ("k1", "the first document".getBytes("UTF-8"), "en".getBytes("UTF-8")),
    ("k2", "another doc".getBytes("UTF-8"), "de".getBytes("UTF-8")),
    ("k3", Array.emptyByteArray, "fr".getBytes("UTF-8")),
    ("k4", "vier".getBytes("UTF-8"), null: Array[Byte]))
    .toDF("key", "txt", "cls")
    .withColumn("shard", pmod(TextOps.portableHash(col("key"), "tar"), lit(2))
      .cast("int"))

  test("write + read round-trip: every non-null payload survives byte-exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tar").toString
    val n = TarSource.writeShards(sampleDf, dir, "key", "shard",
      Seq("txt" -> "txt", "cls" -> "cls"), numShards = 2)
    assert(n == 4)
    val back = TarSource.read(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        new String(r.getAs[Array[Byte]](3), "UTF-8")).toMap
    assert(back(("k1", "txt")) == "the first document")
    assert(back(("k3", "txt")) == "") // empty payload is a real entry
    assert(back(("k2", "cls")) == "de")
    assert(!back.contains(("k4", "cls")), "null payloads are skipped")
    assert(back(("k4", "txt")) == "vier")
  }

  test("writes are byte-identical across runs (content-addressable shards)") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-tar1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-tar2").toString
    TarSource.writeShards(sampleDf, d1, "key", "shard",
      Seq("txt" -> "txt", "cls" -> "cls"), numShards = 2)
    TarSource.writeShards(sampleDf.repartition(5), d2, "key", "shard",
      Seq("txt" -> "txt", "cls" -> "cls"), numShards = 2)
    def bytes(dir: String): Map[String, Seq[Byte]] =
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".tar"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    val (b1, b2) = (bytes(d1), bytes(d2))
    assert(b1.keySet == b2.keySet && b1.keySet.nonEmpty)
    b1.keySet.foreach(k => assert(b1(k) == b2(k), s"$k bytes differ"))
  }

  test("readSamples groups a sample's files into one ext→content map row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tar").toString
    TarSource.writeShards(sampleDf, dir, "key", "shard",
      Seq("txt" -> "txt", "cls" -> "cls"), numShards = 2)
    val samples = TarSource.readSamples(spark, dir).collect()
      .map(r => r.getString(1) -> r.getMap[String, Array[Byte]](2)).toMap
    assert(samples.size == 4)
    assert(samples("k1").keySet == Set("txt", "cls"))
    assert(samples("k4").keySet == Set("txt"))
    assert(new String(samples("k2")("txt"), "UTF-8") == "another doc")
  }

  test("shard assignment is the portable hash — replayable in any engine") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tar").toString
    TarSource.writeShards(sampleDf, dir, "key", "shard",
      Seq("txt" -> "txt"), numShards = 2)
    val got = TarSource.read(spark, dir)
      .select(col("shard"), col("key")).distinct().collect()
      .map(r => r.getString(1) -> r.getString(0)).toMap
    val want = sampleDf.select(col("key"), col("shard")).collect()
      .map(r => r.getString(0) -> f"shard-${r.getInt(1)}%05d.tar").toMap
    assert(got == want)
  }

  test("foreign python-tarfile archives load: ustar and PAX (extended headers skipped)") {
    Seq("webdataset.tar", "webdataset_pax.tar").foreach { fx =>
      val dir = java.nio.file.Files.createTempDirectory("graft-tarfx").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(fixture(fx)),
        java.nio.file.Paths.get(dir, fx))
      val rows = TarSource.read(spark, dir).collect()
        .map(r => (r.getString(1), r.getString(2)) ->
          new String(r.getAs[Array[Byte]](3), "UTF-8")).toMap
      assert(rows.size == 6, s"$fx: expected 3 samples × 2 files, got $rows")
      assert(rows(("000001", "txt")) == "hello webdataset", s"$fx")
      assert(rows(("000002", "cls")) == "3", s"$fx")
      assert(rows(("000003", "txt")) == "", s"$fx")
    }
  }
}
