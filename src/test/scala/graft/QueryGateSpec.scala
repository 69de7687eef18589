package graft

import graft.sql.QueryGate

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

  test("gated execution works end-to-end") {
    graft.core.Engine.open(spark, sfDir)
    assert(QueryGate.sql(spark, "SELECT count(*) AS n FROM lineitem").head().getLong(0) > 0)
    intercept[QueryGate.RejectedQuery] {
      QueryGate.sql(spark, "DROP TABLE lineitem")
    }
  }
}
