package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.io.WarcSource

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-warc").toString

  private val html =
    "<html><head><title>T</title></head><body><p>Hello crawl world</p></body></html>"

  private def responseRecord(id: String, uri: String,
      body: String = html, status: String = "200 OK",
      httpCt: String = "text/html; charset=utf-8"): Array[Byte] = {
    val bodyBytes = body.getBytes("UTF-8")
    val http = (s"HTTP/1.1 $status\r\nContent-Type: $httpCt\r\n" +
      s"Content-Length: ${bodyBytes.length}\r\n\r\n").getBytes("ISO-8859-1")
    WarcSource.recordBytes(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:$id>",
      "WARC-Date" -> "2026-08-14T00:00:00Z",
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"), http ++ bodyBytes)
  }

  private def warcinfoRecord: Array[Byte] =
    WarcSource.recordBytes(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:uuid:info-1>",
      "WARC-Date" -> "2026-08-14T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      "software: graft-test\r\n".getBytes("UTF-8"))

  test("plain .warc: record fields, HTTP envelope split, payload bytes") {
    val p = s"$tmp/a/plain.warc"
    Files.createDirectories(Paths.get(p).getParent)
    Files.write(Paths.get(p),
      warcinfoRecord ++
        responseRecord("r1", "http://example.com/a") ++
        responseRecord("r2", "http://example.com/b", body = "plain",
          httpCt = "text/plain"))
    val df = WarcSource.read(spark, s"$tmp/a").cache()
    assert(df.count() == 3)
    assert(df.filter(col("error").isNotNull).count() == 0)
    val info = df.filter(col("warc_type") === "warcinfo").head()
    assert(info.getAs[String]("record_id") == "<urn:uuid:info-1>")
    assert(new String(info.getAs[Array[Byte]]("payload"), "UTF-8")
      .startsWith("software: graft-test"))
    val r1 = df.filter(col("record_id") === "<urn:uuid:r1>").head()
    assert(r1.getAs[String]("warc_type") == "response")
    assert(r1.getAs[String]("target_uri") == "http://example.com/a")
    assert(r1.getAs[Int]("http_status") == 200)
    assert(r1.getAs[String]("http_content_type").startsWith("text/html"))
    // payload is the entity body ONLY — HTTP envelope split off
    assert(new String(r1.getAs[Array[Byte]]("payload"), "UTF-8") == html)
    val r2 = df.filter(col("record_id") === "<urn:uuid:r2>").head()
    assert(new String(r2.getAs[Array[Byte]]("payload"), "UTF-8") == "plain")
  }

  test(".warc.gz with per-record gzip members (Common Crawl layout) parses identically") {
    val p = s"$tmp/b/cc.warc.gz"
    Files.createDirectories(Paths.get(p).getParent)
    Files.write(Paths.get(p),
      WarcSource.gzipMember(warcinfoRecord) ++
        WarcSource.gzipMember(responseRecord("g1", "http://example.com/gz")) ++
        WarcSource.gzipMember(responseRecord("g2", "http://example.com/gz2")))
    val df = WarcSource.read(spark, s"$tmp/b")
    assert(df.count() == 3)
    val r = df.filter(col("record_id") === "<urn:uuid:g1>").head()
    assert(r.getAs[Int]("http_status") == 200)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == html)
  }

  test("corrupt file yields ONE error row; other files in the scan are unaffected") {
    val dir = s"$tmp/c"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/good.warc"),
      responseRecord("ok1", "http://example.com/ok"))
    Files.write(Paths.get(s"$dir/bad.warc"),
      "NOT A WARC FILE AT ALL\r\n\r\n".getBytes("UTF-8"))
    val df = WarcSource.read(spark, dir).cache()
    assert(df.count() == 2)
    val err = df.filter(col("error").isNotNull).head()
    assert(err.getAs[String]("file").endsWith("bad.warc"))
    assert(df.filter(col("record_id") === "<urn:uuid:ok1>").count() == 1)
  }

  test("truncated block (EOF inside Content-Length) is an error row, prior records kept") {
    val dir = s"$tmp/d"
    Files.createDirectories(Paths.get(dir))
    val full = responseRecord("t1", "http://example.com/t") ++
      responseRecord("t2", "http://example.com/t2")
    Files.write(Paths.get(s"$dir/trunc.warc"), full.dropRight(40))
    val df = WarcSource.read(spark, dir).cache()
    // first record parses; the second dies inside its block
    assert(df.filter(col("record_id") === "<urn:uuid:t1>").count() == 1)
    assert(df.filter(col("error").isNotNull).count() == 1)
  }

  test("warcDocuments: 200 text/html responses -> extracted text via the HTML kernel") {
    val dir = s"$tmp/e"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/f.warc"),
      warcinfoRecord ++
        responseRecord("d1", "http://example.com/good") ++
        responseRecord("d2", "http://example.com/miss", status = "404 Not Found") ++
        responseRecord("d3", "http://example.com/json",
          body = "{}", httpCt = "application/json"))
    val docs = WarcSource.warcDocuments(WarcSource.read(spark, dir)).cache()
    assert(docs.columns.toSeq == Seq("record_id", "url", "warc_date", "text"))
    assert(docs.count() == 1) // only the 200 text/html record
    val d = docs.head()
    assert(d.getAs[String]("url") == "http://example.com/good")
    assert(d.getAs[String]("text").contains("Hello crawl world"))
    assert(!d.getAs[String]("text").contains("<p>"))
  }

  test("write exports per-partition .warc.gz that read() round-trips") {
    val dir = s"$tmp/f"
    val df = Seq(
      ("w1", "http://example.com/1", "2026-08-14T00:00:00Z", "<p>one</p>"),
      ("w2", "http://example.com/2", "2026-08-14T00:00:00Z", "<p>two</p>"),
      ("w3", "http://example.com/3", "2026-08-14T00:00:00Z", "<p>three</p>"))
      .toDF("id", "url", "date", "body")
      .withColumn("payload", col("body").cast("binary"))
      .repartition(2)
    WarcSource.write(df, "id", "url", "date", "payload", dir)
    val back = WarcSource.read(spark, dir).cache()
    assert(back.filter(col("error").isNotNull).count() == 0)
    assert(back.count() == 3)
    val byId = back.collect()
      .map(r => r.getAs[String]("record_id") ->
        new String(r.getAs[Array[Byte]]("payload"), "UTF-8")).toMap
    assert(byId("<urn:uuid:w2>") == "<p>two</p>")
    assert(back.head().getAs[Int]("http_status") == 200)
  }

  test("file-grain parallelism: many files -> many partitions (the 100 TB scale grain)") {
    val dir = s"$tmp/g"
    Files.createDirectories(Paths.get(dir))
    (0 until 6).foreach { i =>
      Files.write(Paths.get(f"$dir/f$i%02d.warc"),
        responseRecord(s"p$i", s"http://example.com/$i"))
    }
    val df = WarcSource.read(spark, dir)
    assert(df.count() == 6)
    assert(df.rdd.getNumPartitions >= 2,
      "multi-file WARC scans must not serialize onto one partition")
  }
}
