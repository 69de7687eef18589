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

  test("commit protocol: _SUCCESS written after the job, stale files swept, read can require the marker") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tarc").toString
    // plant debris from a hypothetical earlier crashed run: a stale
    // target shard, a stale staging dir, a loose legacy in-progress
    // temp, and a stale marker
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-00000.tar"),
      "GARBAGE-NOT-A-TAR".getBytes("UTF-8"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, ".staging-deadrun00"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".staging-deadrun00", "shard-00001.tar"),
      "half-committed".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".shard-00001.tar.a99.inprogress"),
      "half-written".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_SUCCESS"), Array.emptyByteArray)
    TarSource.writeShards(sampleDf, dir, "key", "shard",
      Seq("txt" -> "txt"), numShards = 2)
    val names = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(names.contains("_SUCCESS"), "job-level marker must be written")
    assert(!names.exists(_.endsWith(".inprogress")),
      s"stale temps must be swept: $names")
    assert(!names.exists(_.startsWith(".staging-")),
      s"dead runs' staging dirs must be reclaimed: $names")
    // the stale garbage shard was replaced (driver sweep), so the
    // marker-gated read loads a consistent dataset
    val back = TarSource.read(spark, dir, requireSuccessMarker = true)
    assert(back.count() == 4)
    // without the marker, requireSuccessMarker must refuse the read
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_SUCCESS"))
    val e = intercept[IllegalArgumentException] {
      TarSource.read(spark, dir, requireSuccessMarker = true)
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
    // and the default read stays lenient (generations, foreign dirs)
    assert(TarSource.read(spark, dir).count() == 4)
  }

  test("a rerun that fails mid-job leaves the previous committed dataset intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tarf").toString
    TarSource.writeShards(sampleDf, dir, "key", "shard",
      Seq("txt" -> "txt"), numShards = 2)
    val committed = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".tar") || f.getName == "_SUCCESS")
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    // a rerun whose job THROWS mid-task must not touch the committed
    // shards or the marker — the swap only runs after the reduce
    val bomb = udf((k: String) => {
      if (k == "k3") throw new RuntimeException("synthetic task failure")
      k.getBytes("UTF-8")
    })
    intercept[org.apache.spark.SparkException] {
      TarSource.writeShards(sampleDf.withColumn("txt", bomb(col("key"))),
        dir, "key", "shard", Seq("txt" -> "txt"), numShards = 2)
    }
    val after = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".tar") || f.getName == "_SUCCESS")
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    assert(after == committed,
      "failed rerun must leave the prior committed dataset byte-intact")
    assert(TarSource.read(spark, dir, requireSuccessMarker = true).count() == 4)
  }

  test("a rerun with fewer shards sweeps the old run's higher-numbered shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tars").toString
    val wide = sampleDf.withColumn("shard",
      pmod(TextOps.portableHash(col("key"), "tar"), lit(4)).cast("int"))
    TarSource.writeShards(wide, dir, "key", "shard", Seq("txt" -> "txt"),
      numShards = 4)
    // the corpus shrinks (or re-shards): numShards drops to 2 — run 1's
    // shard-00002/00003 must not survive into a _SUCCESS-stamped dir
    TarSource.writeShards(sampleDf, dir, "key", "shard", Seq("txt" -> "txt"),
      numShards = 2)
    val tars = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.endsWith(".tar")).sorted.toSeq
    // only shards the rerun actually wrote may remain (a shard with no
    // rows is never created — all four sample keys hash to shard 1)
    assert(tars.forall(_ <= "shard-00001.tar") && tars.nonEmpty,
      s"stale higher-numbered shards must be swept: $tars")
    assert(TarSource.read(spark, dir, requireSuccessMarker = true).count() == 4,
      "the marker-gated read sees exactly the rerun's samples")
  }

  test("reshard: shards → image dedup keep-list → compacted shards, end to end") {
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    def noise(i: Int)(x: Int, y: Int): Int =
      gray((((x / 4) * 73856093) ^ ((y / 4) * 19349663) ^ ((i + 1) * 83492791)) & 0xff)
    val in = java.nio.file.Files.createTempDirectory("graft-tar-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-tar-out").toString
    // corpus: three distinct images + a resize twin of the first, each
    // a sample with an image payload and a caption sidecar
    val imgs = Seq(
      ("a", M.renderPng(32, 32, noise(1))),
      ("b", M.renderPng(32, 32, noise(2))),
      ("c", M.renderPng(32, 32, noise(3))),
      ("a2", M.renderPng(64, 64, (x, y) => noise(1)(x / 2, y / 2))))
    val df = imgs.map { case (k, png) =>
      (k, png, s"caption of $k".getBytes("UTF-8"))
    }.toDF("key", "png", "txt")
      .withColumn("shard", pmod(TextOps.portableHash(col("key"), "tar"), lit(2))
        .cast("int"))
    TarSource.writeShards(df, in, "key", "shard",
      Seq("png" -> "png", "txt" -> "txt"), numShards = 2)
    // dedup the IMAGES read back from the shards; keep-list drives the
    // re-export (the twin "a2" dies, its keeper "a" survives)
    val samples = TarSource.readSamples(spark, in)
      .select(col("key"), element_at(col("sample"), "png").as("content"))
    val keep = graft.operators.Dedup.imageDedupCorpus(samples, "key", "content")
      .filter(col("keep")).select(col("key"))
    val written = TarSource.reshard(spark, in, out, keep, numShards = 2)
    assert(written == 3, "the twin must be dropped in the re-export")
    val back = TarSource.readSamples(spark, out, requireSuccessMarker = true)
      .collect().map(r => r.getString(1) -> r.getMap[String, Array[Byte]](2)).toMap
    assert(back.keySet == Set("a", "b", "c"))
    assert(back("a").keySet == Set("png", "txt"), "samples keep their file layout")
    assert(new String(back("c")("txt"), "UTF-8") == "caption of c")
  }

  test("reshard refuses in-place runs and resolves duplicate keys last-generation-wins") {
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-tar-$tag").toString
    def oneShard(dir: String, payload: String): Unit = {
      val d = Seq(("k1", payload.getBytes("UTF-8")))
        .toDF("key", "txt").withColumn("shard", lit(0))
      TarSource.writeShards(d, dir, "key", "shard", Seq("txt" -> "txt"), 1)
    }
    val (g1, g2, in, out) = (tmp("g1"), tmp("g2"), tmp("in"), tmp("out"))
    oneShard(g1, "stale crawl")
    oneShard(g2, "fresh crawl")
    // assemble a generation dir: the SAME key delivered by two batches
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(g1, "shard-00000.tar"),
      java.nio.file.Paths.get(in, "shard-00000-b000001.tar"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(g2, "shard-00000.tar"),
      java.nio.file.Paths.get(in, "shard-00000-b000002.tar"))
    val keep = Seq("k1").toDF("key")
    // in-place would sweep the source before the lazy read runs
    val e = intercept[IllegalArgumentException] {
      TarSource.reshard(spark, in, in, keep, numShards = 1)
    }
    assert(e.getMessage.contains("outDir"), e.getMessage)
    assert(TarSource.reshard(spark, in, out, keep, numShards = 1) == 1,
      "one sample — the unique-key contract is restored before writing")
    val back = TarSource.read(spark, out, requireSuccessMarker = true).collect()
      .map(r => r.getString(2) -> new String(r.getAs[Array[Byte]](3), "UTF-8"))
      .toMap
    assert(back("txt") == "fresh crawl", s"later generation must win: $back")
    // the winner is picked by GENERATION, not by whole file name: when
    // the key remaps to a lower shard NUMBER in the later generation
    // (changed numShards or hash seed), shard-00003-b000001 sorts above
    // shard-00001-b000002 as a raw string — the fresh sample must still
    // win
    val (in2, out2) = (tmp("in2"), tmp("out2"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(g1, "shard-00000.tar"),
      java.nio.file.Paths.get(in2, "shard-00003-b000001.tar"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(g2, "shard-00000.tar"),
      java.nio.file.Paths.get(in2, "shard-00001-b000002.tar"))
    assert(TarSource.reshard(spark, in2, out2, keep, numShards = 1) == 1)
    val back2 = TarSource.read(spark, out2, requireSuccessMarker = true)
      .collect()
      .map(r => r.getString(2) -> new String(r.getAs[Array[Byte]](3), "UTF-8"))
      .toMap
    assert(back2("txt") == "fresh crawl",
      s"generation token must outrank the shard number: $back2")
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

  test("streaming shard export: per-batch generations union to the batch write") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft-tarstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tarckpt").toString
    val input = MemoryStream[(String, String)](spark)
    val stream = input.toDF().toDF("key", "text")
      .withColumn("txt", col("text").cast("binary"))
      .withColumn("shard",
        pmod(TextOps.portableHash(col("key"), "tar"), lit(2)).cast("int"))
    val q = TarSource.writeStreamShards(stream, dir, "key", "shard",
      Seq("txt" -> "txt"), numShards = 2, checkpointDir = ckpt)
    try {
      input.addData(("a", "first"), ("b", "second"))
      q.processAllAvailable()
      input.addData(("c", "third"))
      q.processAllAvailable()
    } finally q.stop()
    // generations are separate files; read() unions them all
    val back = TarSource.read(spark, dir).collect()
      .map(r => r.getString(1) -> new String(r.getAs[Array[Byte]](3), "UTF-8"))
      .toMap
    assert(back == Map("a" -> "first", "b" -> "second", "c" -> "third"))
    val gens = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.endsWith(".tar")).toSet
    assert(gens.forall(_.matches("shard-\\d{5}-b\\d{6}\\.tar")), s"$gens")
    assert(gens.exists(_.contains("-b000000")) && gens.exists(_.contains("-b000001")),
      s"each micro-batch writes its own generation: $gens")
  }

  test("multimodal composition: image shards round-trip into imageStats unchanged") {
    import graft.operators.Multimodal
    // red and blue 8×8 PNGs + a caption per sample — the WebDataset
    // image/caption pairing — written to shards, read back, decoded
    val dir = java.nio.file.Files.createTempDirectory("graft-tarimg").toString
    val imgs = Seq(
      ("s1", Multimodal.renderPng(8, 8, (_, _) => 0xFF0000), "a red square"),
      ("s2", Multimodal.renderPng(8, 8, (_, _) => 0x0000FF), "a blue square"))
      .toDF("key", "png", "cap")
      .withColumn("capb", col("cap").cast("binary"))
      .withColumn("shard", lit(0))
    TarSource.writeShards(imgs, dir, "key", "shard",
      Seq("png" -> "png", "capb" -> "txt"), numShards = 1)
    val decoded = Multimodal.imageStats(
        TarSource.read(spark, dir).filter(col("ext") === "png"))
      .select(col("key"), col("stats.width"),
        col("stats.avg_r"), col("stats.avg_b"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    // avg channels are normalized to [0, 1]
    assert(decoded("s1") == ((8, 1.0, 0.0)), s"red survives the tar: $decoded")
    assert(decoded("s2") == ((8, 0.0, 1.0)), s"blue survives the tar: $decoded")
  }

  test("shardCountForBytes sizes shards to the payload, never zero") {
    val df = Seq(
      ("a", Array.fill(4000)('x'.toByte)),
      ("b", Array.fill(4000)('y'.toByte)),
      ("c", null: Array[Byte]))
      .toDF("key", "payload")
    // 2 × (4000 + 1024) ≈ 10048 bytes; 5 KB target → 2-3 shards
    val n = TarSource.shardCountForBytes(df, Seq("payload"), targetBytes = 5000L)
    assert(n == 3, s"ceil(10048/5000) = 3, got $n")
    assert(TarSource.shardCountForBytes(df.limit(0), Seq("payload")) == 1,
      "empty input still yields one shard")
  }

  test("a truncated shard fails loudly, never silently yields partial samples") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tartrunc").toString
    TarSource.writeShards(sampleDf, dir, "key", "shard",
      Seq("txt" -> "txt"), numShards = 1)
    val f = new java.io.File(dir).listFiles.find(_.getName.endsWith(".tar")).get
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // cut inside the last entry's content; drop the local-FS checksum
    // sidecar so the READER's own truncation check is what fires
    java.nio.file.Files.write(f.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length - 1200))
    new java.io.File(dir).listFiles.filter(_.getName.endsWith(".crc"))
      .foreach(_.delete())
    new java.io.File(dir, s".${f.getName}.crc").delete()
    val e = intercept[org.apache.spark.SparkException] {
      TarSource.read(spark, dir).collect()
    }
    assert(e.getMessage.contains("truncated") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated")),
      s"expected a truncation error, got: ${e.getMessage.take(300)}")
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
