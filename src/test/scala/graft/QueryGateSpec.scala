package graft

import graft.sql.{QueryGate, QueryStats}
import org.apache.spark.sql.functions.col

/** SELECT-only gate parity with `csv_tool.py:333-352` — but plan-level,
  * so string literals containing keywords pass and comment-hidden DDL
  * still fails.
  */
class QueryGateSpec extends SparkSpec {

  test("plain SELECT passes") {
    assert(QueryGate.validate(spark, "SELECT 1 AS x").isRight)
  }

  test("SELECT with keyword-looking literal passes (substring gates get this wrong)") {
    assert(QueryGate.validate(spark, "SELECT 'DROP TABLE t' AS s").isRight)
  }

  test("INSERT / UPDATE / DELETE / DDL are rejected") {
    val denied = Seq(
      "INSERT INTO t VALUES (1)",
      "UPDATE t SET x = 1",
      "DELETE FROM t",
      "DROP TABLE t",
      "CREATE TABLE t (x INT)",
      "ALTER TABLE t ADD COLUMN y INT",
      "TRUNCATE TABLE t")
    denied.foreach { q =>
      assert(QueryGate.validate(spark, q).isLeft, s"should reject: $q")
    }
  }

  test("comment-wrapped DDL is still rejected (BigQuery comment-strip parity)") {
    assert(QueryGate.validate(spark, "/* hi */ DROP TABLE t -- bye").isLeft)
  }

  test("CTE SELECT passes") {
    assert(QueryGate.validate(spark, "WITH x AS (SELECT 1 AS a) SELECT * FROM x").isRight)
  }

  test("remote-dialect validation: foreign SELECT passes, writes still rejected") {
    // Spark's parser rejects these dialects — the lexical fallback
    // must admit read-only statements bound for the REMOTE engine
    assert(QueryGate.validateRemote(spark, "SELECT TOP 5 id FROM metrics").isRight)
    assert(QueryGate.validateRemote(spark,
      "SELECT x FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY x) = 1 OPTION (MAXDOP 1)").isRight)
    // a write keyword inside a LITERAL must not trip the fallback
    // (reference's raw-substring gate gets this wrong)
    assert(QueryGate.validateRemote(spark,
      "SELECT TOP 5 * FROM t WHERE x = 'DROP TABLE'").isRight)
    // multi-statement smuggling is refused even when unparseable locally
    assert(QueryGate.validateRemote(spark, "SELECT TOP 1 x FROM t; DROP TABLE t").isLeft)
    // unparseable non-SELECT statements are refused
    assert(QueryGate.validateRemote(spark, "TRUNCATE TABLE t CASCADE NOW").isLeft)
    assert(QueryGate.validateRemote(spark, "SELECT TOP 5 x, DELETE FROM t").isLeft)
    // locally-parseable statements keep the STRONG plan-walk verdicts
    assert(QueryGate.validateRemote(spark, "DROP TABLE t").isLeft)
    assert(QueryGate.validateRemote(spark, "SELECT 'DROP TABLE' AS s").isRight)
  }

  test("gated execution works end-to-end") {
    graft.core.Engine.open(spark, sfDir)
    assert(QueryGate.sql(spark, "SELECT count(*) AS n FROM lineitem").head().getLong(0) > 0)
    intercept[QueryGate.RejectedQuery] {
      QueryGate.sql(spark, "DROP TABLE lineitem")
    }
  }

  test("query stats: max_rows cap, truncation, bytes accounting (`bigquery_tool.py:149-275`)") {
    import org.apache.spark.sql.functions._
    val events = graft.core.Engine.table(spark, sfDir, "events")
    val fileBytes = new java.io.File(s"$sfDir/events.parquet").length()

    // dry-run estimate is in the ballpark of the file footprint
    val est = QueryStats.dryRunBytes(events)
    assert(est > 0 && est <= fileBytes)

    // capped run: truncation flagged, accounting populated
    val cut = QueryStats.run(events.select(col("event_id"), col("event_type")), maxRows = 25)
    assert(cut.truncated && cut.rowCount == 25 && cut.rows.count() == 25)
    assert(cut.scannedFiles >= 1)
    assert(cut.scannedBytes > 0 && cut.scannedBytes <= fileBytes,
      s"scanned ${cut.scannedBytes} vs file $fileBytes")

    // uncapped fit: no truncation
    val whole = QueryStats.run(events.limit(10), maxRows = 50)
    assert(!whole.truncated && whole.rowCount == 10)

    // partition-pruned scan accounts only the surviving partitions
    val dir = java.nio.file.Files.createTempDirectory("graft-qstats").toString
    graft.operators.Scale.writePartitioned(events, dir, Seq("event_type"))
    val all = spark.read.parquet(dir)
    val one = all.filter(col("event_type") === "error")
    val prunedEst = QueryStats.dryRunBytes(one)
    assert(prunedEst < QueryStats.dryRunBytes(all),
      s"pruned estimate $prunedEst should undercut full ${QueryStats.dryRunBytes(all)}")
    val pruned = QueryStats.run(one, maxRows = 1000000)
    val full = QueryStats.run(all, maxRows = 1000000)
    assert(pruned.scannedBytes < full.scannedBytes)
  }

  test("registered kernel functions compose in gated SQL; the gate still rejects writes") {
    graft.sql.SqlFunctions.register(spark)
    // every binding resolves and evaluates through plain spark.sql
    val row = QueryGate.sql(spark,
      """SELECT url_domain(canonical_url('HTTPS://WWW.Example.COM:443/a/../b/?utm_source=x&id=2')) AS dom,
        |  estimate_tokens('twelve chars') AS est,
        |  quality_score('the cat sat on the mat and it was good') AS q,
        |  lang_id('le chat est dans la maison pour le moment') AS lang,
        |  sentiment_score('good good bad') AS snt,
        |  nfc_normalize('café') AS nfc,
        |  token_count('  a b   c ') AS tc
        |FROM (SELECT 1)""".stripMargin).head()
    assert(row.getAs[String]("dom") == "example.com")
    assert(row.getAs[Long]("est") == 3L) // ceil(12/4)
    assert(row.getAs[Double]("q") > 0.0 && row.getAs[Double]("q") <= 1.0)
    assert(row.getAs[String]("lang") == "fr")
    assert(row.getAs[Double]("snt") == 0.3333)
    assert(row.getAs[String]("nfc") == "café")
    assert(row.getAs[Int]("tc") == 3)
    // same SQL surface as the Scala API — identical column values
    import spark.implicits._
    val df = Seq("The quick brown fox is over the lazy dog").toDF("text")
    df.createOrReplaceTempView("__gate_fn_t")
    val viaSql = QueryGate.sql(spark,
      "SELECT quality_score(text) AS q, simhash64(text) AS h FROM __gate_fn_t").head()
    val viaApi = df.select(
      graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
      graft.functions.CatalystExpressions.simhash64(
        graft.functions.CatalystExpressions.tokenHashes(col("text"))).as("h")).head()
    assert(viaSql == viaApi)
    // the gate's non-SELECT rejection is unchanged by registration
    intercept[QueryGate.RejectedQuery] {
      QueryGate.sql(spark, "CREATE TABLE x AS SELECT quality_score('a') AS q")
    }
    intercept[QueryGate.RejectedQuery] {
      QueryGate.sql(spark, "INSERT INTO __gate_fn_t VALUES ('p')")
    }
  }

  test("spark.sql.extensions deployment gets the SQL functions without register()") {
    import org.apache.spark.sql.SparkSession
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the JVM's SparkContext but builds a FRESH session with
      // the extension applied. `spark.sql.extensions` is a STATIC conf
      // (only honored on a brand-new context), so the test drives the
      // same injection path through the public withExtensions builder.
      val s2 = SparkSession.builder()
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      assert(s2 ne old, "must be a fresh session, not the suite session")
      val r = s2.sql(
        """SELECT url_domain('https://sub.example.com/x?utm_source=a') AS d,
          |  estimate_tokens('abcdefgh') AS t,
          |  lang_id('der hund und die katze ist mit') AS lang""".stripMargin)
        .head()
      assert(r.getString(0) == "sub.example.com")
      assert(r.getLong(1) == 2L)
      assert(r.getString(2) == "de")
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
