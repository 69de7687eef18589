package graft

/** Smoke coverage: every registered query runs on sf0.001 and produces
  * a sane schema. Value-level correctness is the driver's DuckDB-oracle
  * gate (mirrored locally by scripts/oracle_check.py).
  */
class QueriesSpec extends SparkSpec {

  // zero-row results are legitimate for these on the tiny SF
  private val mayBeEmpty = Set("q05_cust_no_orders", "q25_dups",
    "q09_frank", "q16_stall_runs")

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

  test("bench stdout line fits the collector's bounded tail") {
    // The harness that records the bench keeps only a ~2000-char tail
    // of stdout, and sbt appends a ~67-char "[success] ..." line after
    // ours — so the line must stay ≤ ~1932 chars. Budget with
    // worst-plausible per-query values: Bench.fmt caps sub-10 s values
    // at 3 chars ("9.9") and drops ≥10 s values to integer seconds
    // ("99" is 2, "999" is 3), so 3 chars is the per-query worst case
    // short of a 1000 s query (and Bench additionally falls back to a
    // totals-only line at emit time if the full line ever exceeds the
    // tail window). ADDING a query should fail here, not silently
    // break the next round's bench parse. The line keys queries by
    // their qNN prefix (Bench shortKeys) — at 4 budget chars per
    // 3-digit short key + value there is room for ~100 more queries.
    val prefixes = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
    assert(prefixes.distinct.size == prefixes.size,
      "qNN prefixes must stay unique — Bench's short stdout keys depend on it")
    val line = "{\"metric\":\"total\",\"value\":12345.67,\"unit\":\"sec\",\"queries\":{" +
      prefixes.map(k => s""""$k":9.9""").mkString(",") +
      "},\"index_sec\":12.34," +
      // self-diagnosis fields at worst-plausible widths
      "\"load\":[99.99,99.99],\"spin\":[9.99,9.99]," +
      "\"passes\":[999,999,999],\"sf\":\"sf0.1\"}"
    assert(line.length <= 1925,
      s"bench line budget exceeded (${line.length} chars) — shorten new query keys")
  }
}
