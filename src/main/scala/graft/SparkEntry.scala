package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Analytics, CorpusIndex, Curation, Dedup, Scale, Similarity, TextOps}

/** Driver contract: one `queries` entry (+ `oracleSql` where ANSI-SQL
  * expressible) per implemented operator from SURVEY.md §2.
  *
  * Column-name discipline: every computed column is aliased identically
  * in the DataFrame code and the oracle SQL (the driver's compare sorts
  * columns by name before hashing). Every query is deterministically
  * ordered; float aggregates are rounded on both sides.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  // Session-cached corpus index artifacts (see [[CorpusIndex]]):
  // derived once per (session, sf dir) and shared by every dedup /
  // text-analysis query, the single-session analog of the parquet
  // index tables a 100 TB corpus store maintains at ingest. Results
  // are identical to inline computation — only materialization is
  // shared.
  private def docs(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  private def docFingerprints(s: SparkSession, dir: String): DataFrame =
    CorpusIndex.fingerprints(docs(s, dir), dir, "doc_id", "text")
  private def docShingleSets(s: SparkSession, dir: String): DataFrame =
    CorpusIndex.shingleSets(docs(s, dir), dir, "doc_id", "text")
  private def docMinhashSigs(s: SparkSession, dir: String): DataFrame =
    CorpusIndex.minhashSignatures(docs(s, dir), dir, "doc_id", "text")
  private def docSimhashSigs(s: SparkSession, dir: String): DataFrame =
    CorpusIndex.simhashSignatures(docs(s, dir), dir, "doc_id", "text")
  private def docDedupClasses(s: SparkSession, dir: String): DataFrame =
    CorpusIndex.dedupClasses(docs(s, dir), dir, "doc_id", "text", minJaccard = 0.3)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing")(spark, "/root/testdata/sf0.001")

  // ===================================================================
  // Aggregations (SURVEY §2.4)
  // ===================================================================

  /** A1 — TPC-H Q1-flavored pricing summary: scan-heavy hash aggregate
    * with partial (map-side) combine; one shuffle on the 6-row group key.
    */
  private def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** J1/A1 — TPC-H Q5-flavored revenue by nation: 5-way join; the four
    * dimension tables are broadcast (they are tiny at any SF; only
    * lineitem⋈orders shuffles, on the join key).
    */
  private def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))

  /** O2 — top-k join: TakeOrderedAndProject, no global sort. */
  private def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)

  /** J6 — semi join (EXISTS): orders having any heavy lineitem. */
  private def q04(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem").filter(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** J6 — anti join (NOT EXISTS): customers with no recent orders. */
  private def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderdate") >= lit("2000-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** A1 — TPC-H Q6-flavored single-row filtered aggregate: the filters
    * are pushed to the parquet scan (`PushedFilters` in explain).
    */
  private def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** A2 — success rate per group (`query.py:241-243` parity). */
  private def q07(s: SparkSession, dir: String): DataFrame =
    Analytics.successRate(t(s, dir, "orders"),
      col("o_orderstatus") === "F", Seq("o_orderpriority"))
      .orderBy(col("o_orderpriority"))

  /** A3 — top-5 common failures (`query.py:246-253` parity). */
  private def q08(s: SparkSession, dir: String): DataFrame =
    Analytics.topFailures(t(s, dir, "events"),
      col("event_type") === "error", col("user_id"), k = 5)

  /** A4 — failure-rate ranking above threshold (`query.py:256-270`). */
  private def q09(s: SparkSession, dir: String): DataFrame =
    Analytics.failureRanking(t(s, dir, "events"), "user_id",
      col("event_type") === "error", threshold = 0.1)

  /** A6 — weighted progress Σwᵢpᵢ/Σwᵢ with zero-guard
    * (`outcome_aggregator.py:246-295`); weight parsed from the JSON
    * props column (scalar JSON surface, §2.7).
    */
  private def q10(s: SparkSession, dir: String): DataFrame =
    Analytics.weightedProgress(
      t(s, dir, "events").withColumn("w",
        get_json_object(col("props"), "$.k").cast("double")),
      col("w"), col("value"), Seq("event_type"))
      .orderBy(col("event_type"))

  /** A7 — exact count-distinct metrics (`outcome_aggregator.py:283-295`). */
  private def q11(s: SparkSession, dir: String): DataFrame =
    Analytics.distinctMetrics(
      t(s, dir, "events").withColumn("user_event",
        concat_ws(":", col("user_id"), col("event_type"))),
      Seq("user_id", "user_event"))

  /** A9 — weighted risk score + grade ladder (`risk_scorer.py`). */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val score = least(greatest(col("c_acctbal") / 100.0, lit(0.0)), lit(100.0))
    t(s, dir, "customer")
      .withColumn("grade", Analytics.gradeLadder(score))
      .groupBy(col("grade"))
      .agg(count(lit(1)).as("n_customers"), round(avg(col("c_acctbal")), 2).as("avg_acctbal"))
      .orderBy(col("grade"))
  }

  /** A10 — histogram of event types (`query.py:439-468`). */
  private def q13(s: SparkSession, dir: String): DataFrame =
    Analytics.histogram(t(s, dir, "events"), Seq("event_type"))

  /** A11 — rollup over region/nation (subtotals + grand total). */
  private def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** A12 — distinct projection. */
  private def q15(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ===================================================================
  // Windows (SURVEY §2.5)
  // ===================================================================

  /** W1 — stall detection: N consecutive identical values in arrival
    * order (`event_loop_node.py:1823-1829`). One shuffle on user_id.
    */
  private def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("stalled", Analytics.stallFlag(col("event_type"),
        Seq(col("event_id")), Seq(col("user_id")), threshold = 3))
      .filter(col("stalled"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_stalls"))
      .orderBy(col("user_id"))

  /** W4 — running sum in arrival order (token-budget-window shape,
    * `conversation.py:186-192`). Sequential fold per partition ⇒
    * deterministic float accumulation on both engines.
    */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(sum(col("value")).over(w), 2).as("running_value"))
      .orderBy(col("event_id"))
  }

  /** W5/W3 — top-3 per group via row_number (recent-history tails). */
  private def q18(s: SparkSession, dir: String): DataFrame =
    Analytics.topNPerGroup(t(s, dir, "events"), Seq("event_type"),
      Seq(desc("value"), asc("event_id")), 3)
      .select(col("event_type"), col("event_id"), col("value"))
      .orderBy(col("event_type"), desc("value"), col("event_id"))

  // ===================================================================
  // Sorts / limits / set ops (SURVEY §2.6)
  // ===================================================================

  /** O1 — newest-first tail (`runtime_logs_tool.py:135-138`). */
  private def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .orderBy(desc("event_id"))
      .select(col("event_id"), col("event_type"), col("value"))
      .limit(20)

  /** S1 — offset/limit pagination (`csv_tool.py:15-88` semantics). */
  private def q20(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .offset(100).limit(50)

  /** O6 — union of branch outputs then merge-aggregate. */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.filter(col("event_type") === "purchase").select(col("user_id"), col("value"))
      .unionByName(e.filter(col("event_type") === "signup").select(col("user_id"), col("value")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** O7 — intersect: nations present among both customers and suppliers. */
  private def q22(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  /** O7 — except: nations with no supplier. */
  private def q23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(col("n_nationkey").as("nationkey"))
      .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  // ===================================================================
  // Dedup / text (SURVEY §2.6 O8 + LLM-pipeline mandate)
  // ===================================================================

  /** O8 — exact-dedup stats over canonical fingerprints. */
  private def q24(s: SparkSession, dir: String): DataFrame =
    docFingerprints(s, dir)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fingerprint")).as("n_unique"))

  /** O8 — duplicate classes (fingerprint, size, representative id). */
  private def q25(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateGroupsFromFingerprints(docFingerprints(s, dir), "doc_id")
      .orderBy(col("fingerprint"))

  /** P/LIKE — pattern filter + grouped count (`csv_tool.py:308-309`). */
  private def q26(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").like("%red%"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_parts"), round(avg(col("p_retailprice")), 2).as("avg_price"))
      .orderBy(col("p_type"))

  /** §2.7 string functions: upper/lower/substring/replace/length. */
  private def q27(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("prefix"),
        regexp_replace(col("c_name"), "#", "-").as("dashed"))
      .orderBy(col("c_custkey"))
      .limit(100)

  /** §2.7 date functions: year/month buckets. */
  private def q28(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("o_year"), month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_year"), col("o_month"))

  /** §2.7 JSON extraction (`event_bus` props parity). */
  private def q29(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy((get_json_object(col("props"), "$.k").cast("int") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k_bucket"))

  /** ST/W6 — processing-time hourly windows over the event stream
    * (batch parity of the Structured Streaming window aggregation).
    */
  private def q30(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      // group on the truncated timestamp, format only the grouped rows
      // (string-formatting inside a grouping key runs once per input row)
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("hour_ts"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Text analysis — token counts per language. */
  private def q31(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TF.tokenCount(col("text"))).as("sum_tokens"),
        round(avg(TF.tokenCount(col("text"))), 4).as("avg_tokens"))
      .orderBy(col("lang"))

  /** Text analysis — punctuation/alpha ratios per source. */
  private def q32(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(
        round(avg(TF.punctRatio(col("text"))), 4).as("avg_punct_ratio"),
        round(avg(TF.stopwordRatio(col("text"))), 4).as("avg_stopword_ratio"))
      .orderBy(col("source"))

  /** Similarity search — brute-force cosine top-10 against the vec_id=0
    * embedding (exact ANN baseline).
    */
  private def q33(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    Similarity.knnBrute(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", query, 10)
  }

  /** §2.8 — safe_eval edge predicate compiled to a Catalyst Column
    * (`safe_eval.py` semantics; the oracle states the same predicate in
    * plain SQL, proving the translation).
    */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    events
      .filter(graft.expr.SafeEval.predicate(
        "value > 100 and event_type != 'error' and 'k' in props", events.schema))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** §2.2/§3 — dataflow graph execution: a GraphSpec with conditional
    * safe_eval routing + per-node transforms, run by GraphExecutor; the
    * oracle states the equivalent relational program.
    */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    import graft.graph._
    val spec = GraphSpec(
      nodes = Seq(NodeSpec("src"), NodeSpec("hot"), NodeSpec("cold"), NodeSpec("sink")),
      edges = Seq(
        EdgeSpec("src", "hot", "conditional", Some("value > 100")),
        EdgeSpec("src", "cold", "conditional", Some("not value > 100")),
        EdgeSpec("hot", "sink", inputMapping = Map("user_id" -> "user_id", "v" -> "value", "side" -> "side")),
        EdgeSpec("cold", "sink", inputMapping = Map("user_id" -> "user_id", "v" -> "value", "side" -> "side"))),
      entryNode = "src", terminalNodes = Seq("sink"))
    val registry: GraphExecutor.Registry = Map(
      "hot" -> ((df: DataFrame) => df.withColumn("side", lit("hot"))),
      "cold" -> ((df: DataFrame) => df.withColumn("side", lit("cold"))))
    GraphExecutor.run(spec, t(s, dir, "events"), registry)
      .terminalOutputs("sink")
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("sum_value"))
      .orderBy(col("side"))
  }

  /** ST11 — tiered token-budget compaction plan
    * (`event_loop_node.py:2041-2157`): running-from-tail token sums +
    * usage-ratio tier ladder decide the keep set per session.
    */
  private def q36(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.compactionPlan(
      t(s, dir, "events").select(col("user_id"), col("event_id"),
        floor(col("value")).cast("long").as("tokens")),
      "user_id", "event_id", "tokens", budget = 5000L)
      .select(col("user_id"), col("event_id"), col("keep"))
      .orderBy(col("user_id"), col("event_id"))

  /** Dedup — MinHash-LSH candidate pairs, exact-shingle-Jaccard
    * verified. The oracle recomputes EVERY pair's Jaccard by brute
    * force in SQL, so a hash match proves the LSH banding found all
    * true near-duplicates (the corpus's planted pairs sit at J ≥ 0.9
    * with the next pair at 0.07 — far above the banding's recall
    * knee, so full recall is deterministic at gate scale).
    */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    // exact verification follows, so the est-jaccard prefilter would
    // be two extra joins buying nothing — candidates go straight in
    val cands = Dedup.minhashCandidatePairsFromSigs(docMinhashSigs(s, dir),
      "doc_id", numHashes = 64, bands = 16)
    Dedup.ngramJaccardFromSets(docShingleSets(s, dir), cands)
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Dedup — SimHash-banded candidate pairs, exact-shingle-Jaccard
    * verified: same brute-force oracle as q37, different discovery
    * path. 8×8-bit banding guarantees recall through Hamming 7 — the
    * gate corpus's planted pairs reach Hamming 6, and two of them
    * share no 16-bit chunk, so the scale-default 4×16 split cannot see
    * them. Chunk width is the honest scale knob: 4-bit chunks (16-band
    * guarantee ≤15) collide so freely that candidate generation
    * degenerates to ~all-pairs on a small-vocabulary corpus (measured
    * 53M joined rows at sf0.1), so tight-Hamming discovery is
    * simhash's contract and the loose-threshold outliers (one J=0.91
    * pair at Hamming 9 in the sf0.001 corpus) belong to the minhash
    * path, which q37 keeps exact.
    */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val cands = Dedup.simhashNearDuplicatesFromSigs(docSimhashSigs(s, dir),
      maxHamming = 7, bands = 8)
    Dedup.ngramJaccardFromSets(docShingleSets(s, dir),
        cands.select(col("id_a"), col("id_b")))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Text analysis: language-ID heuristic distribution
    * (custom-expression hot loop; the oracle restates the
    * stopword-profile argmax — ties resolve to the lexicographically
    * first profile — as plain SQL).
    */
  private def q39(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(TF.langIdHeuristic(col("text")).as("detected_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("detected_lang"))

  /** Text analysis: composite quality-score stats (the oracle restates
    * the full C4-flavored score — length, stopword, punctuation terms
    * — as plain SQL).
    */
  private def q40(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(round(avg(TF.qualityScore(col("text"))), 4).as("avg_quality"),
        round(avg(TF.bpeishTokenCount(col("text"))), 2).as("avg_bpeish_tokens"))
      .orderBy(col("lang"))

  /** Similarity: LSH-bucketed approximate knn. The oracle restates the
    * ENTIRE machinery in SQL — bucket sign-bits against the same
    * seeded hyperplanes (inlined as literals), the multi-probe bucket
    * set (Hamming ≤ 2 of the query's bucket, 22/64 buckets probed),
    * and the final top-k — so a hash match proves the pruned scan
    * returns exactly what the construction promises. (Exact top-10
    * recall under honest pruning is impossible on this corpus — the
    * neighbors are near-orthogonal, so their sign bits are random;
    * q54 grades exact recall with pruning on the IVF path instead.)
    */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    Similarity.knnLsh(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      query, k = 10, nPlanes = 6, probeHamming = 2)
  }

  /** Dedup: embedding near-duplicate pairs via AND-OR banded
    * random-hyperplane LSH. Like q41/q58, the oracle restates the
    * MACHINERY in SQL — per-band bucket sign-bits from the same seeded
    * planes (inlined as literals), candidates = bucket collisions in
    * ANY band, exact rounded-cosine gate, deterministic top-100 — so
    * the hash compare proves the banded construction computes exactly
    * what it promises. (Exact RECALL vs all true pairs at cosine 0.2
    * stays out of reach on random vectors; that contract is graded on
    * q54's IVF path and DedupSpec's planted-pair tests.)
    */
  private def q42(s: SparkSession, dir: String): DataFrame =
    // AND-OR construction: 8 bands of 8 sign bits — narrower buckets
    // (n/256 per band, vs n/16 single-band) with recall recovered by
    // OR-ing bands; the honest shape at corpus scale
    Dedup.embeddingNearDuplicates(t(s, dir, "embeddings"), "vec_id", "embedding",
      minCosine = 0.2, nPlanes = 8, dim = 64, bands = 8)
      .orderBy(desc("cosine"), col("id_a"), col("id_b"))
      .limit(100)

  /** A7 at scale: HyperLogLog count-distinct — the 100 TB form of q11.
    * Sketch values are engine-specific, so each engine instead asserts
    * its own sketch lands within 5% of its own exact count; the gate
    * compares the resulting booleans.
    */
  private def q43(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(approx_count_distinct(col("user_id")).as("a_u"),
        countDistinct(col("user_id")).as("e_u"),
        approx_count_distinct(concat_ws(":", col("user_id"), col("event_type"))).as("a_ue"),
        countDistinct(concat_ws(":", col("user_id"), col("event_type"))).as("e_ue"))
      .select(
        (abs(col("a_u") - col("e_u")) <= lit(0.05) * col("e_u")).as("users_within_5pct"),
        (abs(col("a_ue") - col("e_ue")) <= lit(0.05) * col("e_ue")).as("user_events_within_5pct"))

  /** Multimodal: binary-column decode — documents as synthetic raw
    * media bytes (length-derived stub dims the oracle restates as
    * byte-length arithmetic) UNIONED with real PNG/JPEG/WAV/MP4
    * fixtures whose metadata comes from REAL header parses (IHDR, SOF
    * walk, RIFF chunk walk, ISO-BMFF box walk), known a priori and
    * restated as literals in the oracle. The gate then checks the
    * batched mapPartitions plumbing AND the real header kernels end to
    * end across all three modalities.
    */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("content"))
    val M = graft.operators.Multimodal
    val fixtures = Seq(
      (1000001L, M.syntheticPng(640, 480)),
      (1000002L, M.syntheticPng(800, 600)),
      (1000003L, M.syntheticPng(1024, 768)),
      (1000004L, M.syntheticJpeg(320, 240)),
      (1000005L, M.syntheticJpeg(512, 384)),
      (1000006L, M.syntheticWav(44100, 2, millis = 2500)),
      (1000007L, M.syntheticWav(16000, 1, millis = 1000)),
      (1000008L, M.syntheticMp4(1920, 1080, durationMs = 90000L))).toDF("doc_id", "content")
    M.decode(media.unionByName(fixtures))
      .groupBy(col("decoded.format").as("format"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("decoded.width")), 2).as("avg_width"),
        round(avg(col("decoded.sample_rate")), 2).as("avg_sr"),
        sum(col("decoded.duration_ms")).as("total_ms"))
      .orderBy(col("format"))
  }

  /** Semantic ops: deterministic-stub LLM judge over documents (the
    * event-loop/judge mapPartitions harness end to end). The stub's
    * criterion is a pure function of the document text (len > 300), so
    * the oracle can state the whole judge pipeline — prompt render,
    * batched client calls, verdict parse — as one SQL CASE.
    */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.SemanticOps
    val judged = SemanticOps.llmJudge(
      t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
      "document is long enough", "text",
      () => SemanticOps.DeterministicStub { p =>
        // recover the document from the rendered prompt — the judged
        // criterion must depend only on the text for oracle parity
        val doc = p.substring(p.indexOf("Text: ") + 6, p.lastIndexOf("\nAnswer"))
        if (doc.length > 300) "PASS: long" else "FAIL: short"
      })
    judged.groupBy(col("lang"), col("verdict"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("verdict"))
  }

  /** W6 — gap-based session windows (`session_window`, the
    * beyond-reference event-time extension; oracle states the same
    * sessions as a gaps-and-islands program). Second-truncated
    * timestamps keep the gap arithmetic identical across engines.
    */
  private def q46(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("ts_s", date_trunc("second", col("ts")))
      .groupBy(col("user_id"), session_window(col("ts_s"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))

  /** A9 full form — weighted multi-category risk scoring
    * (`risk_scorer.py:25-120, 181-…`): per-check points, per-category
    * 100-cap, weighted sum, grade ladder; oracle states the identical
    * arithmetic in SQL.
    */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics.RiskCheck
    val scored = Analytics.riskScore(
      t(s, dir, "customer"),
      checks = Seq(
        RiskCheck("balance", col("c_acctbal") >= 5000, 60),
        RiskCheck("balance", col("c_acctbal") >= 1000, 40),
        RiskCheck("segment", col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"), 80),
        RiskCheck("segment", col("c_nationkey") % 2 === 0, 20)),
      categoryWeights = Map("balance" -> 0.7, "segment" -> 0.3))
    scored.groupBy(col("risk_grade"))
      .agg(count(lit(1)).as("n"), round(avg(col("risk_score")), 2).as("avg_score"))
      .orderBy(col("risk_grade"))
  }

  /** A5 extension — per-group latency-percentile metrics: exact
    * interpolated percentiles (both engines use linear interpolation);
    * the 100 TB path swaps in `approx_percentile` (t-digest) the same
    * way q43 twins q11.
    */
  private def q48(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy(col("event_type"))

  /** J-family depth — left outer join with NULL-bearing aggregates:
    * customers against their recent orders; never-ordered customers
    * surface with zero counts via coalesce.
    */
  private def q49(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderdate") >= lit("2000-01-01")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("n_orders"), // NULLs not counted
        round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("sum_price"))
      .orderBy(col("c_mktsegment"))

  /** A11 depth — CUBE over two dimensions (all grouping sets). */
  private def q50(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** J2/§3.2 — the SQL path end-to-end: temp views + SELECT-only gate
    * + scalar subquery (orders above the global average).
    */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    Engine.open(s, dir)
    graft.sql.QueryGate.sql(s,
      """SELECT o_orderpriority, count(*) AS n_above_avg
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** W5 depth — ranking-function suite: rank / dense_rank / ntile /
    * lag / lead over one window, top-5 rows per group.
    */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(desc("value"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(lag(col("value"), 1).over(w), 2).as("prev_value"),
        round(lead(col("value"), 1).over(w), 2).as("next_value"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy(col("event_type"), desc("value"), col("event_id"))
  }

  /** Dedup: end-to-end corpus dedup — LSH candidates → Jaccard verify
    * → transitive classes → keep-list summary. The oracle restates the
    * ENTIRE pipeline in SQL: brute-force pair Jaccard, then connected
    * components as a recursive CTE, then the same keep-list counts —
    * so a hash match proves candidate recall, verification, and the
    * min-label component propagation all at once.
    */
  private def q53(s: SparkSession, dir: String): DataFrame =
    docDedupClasses(s, dir)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_kept"),
        countDistinct(col("dup_class")).as("n_dup_classes"))

  /** Similarity: IVF ANN — kmeans-lite centroids fitted on a sample,
    * probe the nearest clusters only (the partition-pruned scale
    * path). Graded against the exact answer like q41: the oracle is
    * the brute-force top-10 in SQL, so a hash match proves the chosen
    * nProbe achieves exact recall at gate scale.
    */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 8,
      fitSampleFraction = 0.5)
    Similarity.knnIvf(emb.filter(col("vec_id") =!= 0), index,
      "vec_id", "embedding", query, k = 10, nProbe = 5)
  }

  /** Text analysis: lexicon sentiment polarity per source
    * (`news_sentiment` engine-side analog; the oracle inlines the
    * lexicon in SQL).
    */
  private def q55(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(round(avg(TF.sentimentScore(col("text"))), 4).as("avg_sentiment"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))

  /** ST4 — CDC upsert (the MERGE shape over plain parquet): base rows
    * plus a change feed with tombstones, last write per key wins. The
    * oracle states the same merge as one window program.
    */
  private def q56(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"),
      col("event_id").as("version"), col("value"), col("event_type"))
    val base = ev.filter(col("version") <= 5000).drop("event_type")
    val changes = ev.filter(col("version") > 5000 && col("version") <= 10000)
      .withColumn("deleted", col("event_type") === "error")
      .drop("event_type")
    graft.operators.Guards.applyChanges(base, changes, Seq("user_id"), "version",
        deletedCol = Some("deleted"))
      .select(col("user_id"), col("version"), round(col("value"), 2).as("value"))
      .orderBy(col("user_id"))
  }

  /** ST4 — as-of (time-travel) read over a versioned keyed table: the
    * last write per key at or before the version watermark.
    */
  private def q57(s: SparkSession, dir: String): DataFrame =
    graft.operators.Guards.stateAsOf(
      t(s, dir, "events").select(col("user_id"),
        col("event_id").as("version"), round(col("value"), 2).as("value")),
      Seq("user_id"), "version", asOfVersion = 3000L)
      .orderBy(col("user_id"))

  /** Cross-corpus similarity linking via shared LSH buckets. Like q41,
    * the oracle restates the machinery: both sides' bucket sign-bits
    * (seeded planes inlined as SQL literals), the bucket equi-join,
    * and the exact cosine gate — so the hash compare proves the
    * linking join does exactly what the construction promises.
    */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    // 2-band AND-OR + both sides bucket-capped — the corpus-scale
    // shape (the cap is inert at gate scale and restated in the
    // oracle, like q42's)
    val emb = t(s, dir, "embeddings")
    Similarity.crossSimilarity(
      emb.filter(pmod(col("vec_id"), lit(2)) === 0),
      emb.filter(pmod(col("vec_id"), lit(2)) === 1),
      "vec_id", "vec_id", "embedding", minCosine = 0.2, nPlanes = 8, dim = 64,
      bands = 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Approximate percentiles — the 100 TB form of q48's exact
    * interpolated percentiles. Sketch values are engine-specific, so
    * (like q43) each engine asserts its own approximation lands within
    * 2% of its own exact percentile; the gate compares the booleans.
    */
  private def q59(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("a50"),
        expr("percentile(value, 0.5)").as("e50"),
        percentile_approx(col("value"), lit(0.9), lit(10000)).as("a90"),
        expr("percentile(value, 0.9)").as("e90"))
      .select(
        (abs(col("a50") - col("e50")) <= lit(0.02) * greatest(abs(col("e50")), lit(1.0)))
          .as("p50_within_2pct"),
        (abs(col("a90") - col("e90")) <= lit(0.02) * greatest(abs(col("e90")), lit(1.0)))
          .as("p90_within_2pct"))

  /** Flagship corpus-curation pipeline — what this engine is FOR at
    * 100 TB: near-duplicate dedup keep-list → quality gate → language
    * ID → token accounting, i.e. "what survives into the training
    * set, per language, and how many tokens is it". The oracle
    * restates the ENTIRE composition in SQL: recursive-CTE connected
    * components over brute-force shingle Jaccard for the keep-list,
    * then the quality/langid/token formulas — every stage
    * hash-compared at once.
    */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val kept = docDedupClasses(s, dir).filter(col("keep"))
    kept
      .withColumn("lang_det", TF.langIdHeuristic(col("text")))
      .withColumn("quality", TF.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
      .groupBy(col("lang_det"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TF.tokenCount(col("text"))).cast("long").as("sum_tokens"),
        round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy(col("lang_det"))
  }

  private val HtmlShellHead =
    "<html><head><style>b{color:red}</style></head><body><h1>Title &amp; more</h1><p>"
  private val HtmlShellTail =
    "</p><script>track(1 < 2)</script><!-- hidden --></body></html>"

  /** S15 — web-scrape text extraction: documents wrapped in a
    * synthetic HTML shell (tags, style, script, comment, entities),
    * recovered by the codegen'd [[TextFunctions.htmlToText]] chain;
    * the oracle reruns the IDENTICAL regex chain in DuckDB (the steps
    * are shared constants, RE2-compatible by construction).
    */
  private def q61(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        TF.htmlToText(concat(lit(HtmlShellHead), col("text"), lit(HtmlShellTail)))
          .as("extracted"))
      .orderBy(col("doc_id"))

  /** q61's oracle, generated from the same step list the Spark chain
    * folds over — one source of truth for the patterns.
    */
  private def htmlExtractionOracle: String = {
    def sq(x: String): String = x.replace("'", "''")
    val input = s"concat('${sq(HtmlShellHead)}', text, '${sq(HtmlShellTail)}')"
    val chained = TF.HtmlToTextSteps.foldLeft(input) { case (acc, (p, r)) =>
      s"regexp_replace($acc, '${sq(p)}', '${sq(r)}', 'g')"
    }
    s"""SELECT doc_id, trim(regexp_replace($chained, '\\s+', ' ', 'g')) AS extracted
       |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin
  }

  private val MdShellHead =
    "# Title\n\n> a quoted line\n\n- item one\n* item two\n\n**bold** and " +
      "`inline code` with [a link](http://example.com/x) and ![alt text](img.png)\n\n```scala\n"
  private val MdShellTail = "\n```\n\n---\n"

  /** S15's markdown sibling: documents wrapped in a synthetic markdown
    * shell (headers, quotes, bullets, emphasis, inline code, links,
    * images, a fenced block around the body, an hr), recovered by the
    * codegen'd [[TF.markdownToText]] chain; the oracle reruns the
    * IDENTICAL regex chain in DuckDB, with `$1` replacements rewritten
    * to RE2's `\1`.
    */
  private def q86(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        TF.markdownToText(concat(lit(MdShellHead), col("text"), lit(MdShellTail)))
          .as("extracted"))
      .orderBy(col("doc_id"))

  /** q86's oracle, generated from the same step list the Spark chain
    * folds over — one source of truth for the patterns.
    */
  private def markdownExtractionOracle: String = {
    def sq(x: String): String = x.replace("'", "''")
    val input = s"concat('${sq(MdShellHead)}', text, '${sq(MdShellTail)}')"
    val chained = TF.MarkdownToTextSteps.foldLeft(input) { case (acc, (p, r)) =>
      val re2Repl = r.replace("$1", "\\1") // Java "$1" -> RE2 "\1"
      s"regexp_replace($acc, '${sq(p)}', '${sq(re2Repl)}', 'g')"
    }
    s"""SELECT doc_id, trim(regexp_replace($chained, '\\s+', ' ', 'g')) AS extracted
       |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin
  }

  /** CCNet-style line-level boilerplate dedup
    * ([[graft.operators.Curation.lineDedup]]): each document is
    * wrapped in a synthetic multi-line page shell — a nav line and a
    * footer shared by ALL docs (df = 60), a promo line on every third
    * doc (df = 20), and two unique lines (a title and the body). With
    * `minDocFreq = 30` the nav/footer vanish everywhere, the
    * under-threshold promo line survives, and surviving-line order is
    * preserved. The oracle restates the full relational definition
    * (explode with position → distinct-doc line frequency → anti-join
    * → ordered reassembly) in DuckDB.
    */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val shell = concat(
      lit("NAV HOME | ABOUT | CONTACT\n"),
      lit("Title: doc "), col("doc_id").cast("string"), lit("\n"),
      col("text"), lit("\n"),
      when(col("doc_id") % 3 === 0, lit("SUBSCRIBE NOW\n")).otherwise(lit("")),
      lit("(c) 2026 example.com"))
    val shelled = t(s, dir, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id"), shell.as("text"))
    Curation.lineDedup(shelled, "doc_id", "text", minDocFreq = 30)
      .orderBy("doc_id")
  }

  private def lineDedupOracle: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    concat('NAV HOME | ABOUT | CONTACT', chr(10),
      |           'Title: doc ', CAST(doc_id AS VARCHAR), chr(10),
      |           text, chr(10),
      |           CASE WHEN doc_id % 3 = 0 THEN 'SUBSCRIBE NOW' || chr(10)
      |                ELSE '' END,
      |           '(c) 2026 example.com') AS t
      |  FROM documents WHERE doc_id < 60),
      |ls AS (SELECT doc_id, string_split(t, chr(10)) AS s FROM docs),
      |ln AS (SELECT doc_id, unnest(generate_series(1, len(s))) AS pos, s
      |       FROM ls),
      |l2 AS (SELECT doc_id, pos, s[pos] AS line FROM ln),
      |bo AS (SELECT line
      |       FROM (SELECT line, count(DISTINCT doc_id) AS dfr
      |             FROM l2 GROUP BY line)
      |       WHERE dfr >= 30),
      |kept AS (SELECT doc_id, pos, line FROM l2
      |         WHERE NOT EXISTS (SELECT 1 FROM bo WHERE bo.line = l2.line)),
      |ka AS (SELECT doc_id,
      |         string_agg(line, chr(10) ORDER BY pos) AS clean_text,
      |         count(*) AS n_kept
      |       FROM kept GROUP BY doc_id),
      |tot AS (SELECT doc_id, len(s) AS n_total FROM ls)
      |SELECT tot.doc_id, coalesce(ka.clean_text, '') AS clean_text,
      |  CAST(tot.n_total - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed
      |FROM tot LEFT JOIN ka USING (doc_id) ORDER BY doc_id""".stripMargin

  /** RAG-style overlapping token-window chunking
    * ([[graft.operators.TextOps.chunkDocs]]): 30-token chunks with a
    * 10-token overlap (step 20). Map-only — the oracle rebuilds every
    * chunk with DuckDB list slicing over the same tokenization and
    * `generate_series(1, len, 20)` starts.
    */
  private def q88(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkDocs(
      t(s, dir, "documents").filter(col("doc_id") < 10),
      "doc_id", "text", chunkTokens = 30, overlapTokens = 10)
      .orderBy("doc_id", "chunk_idx")

  private def chunkDocsOracle: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS tk
      |  FROM documents WHERE doc_id < 10),
      |st AS (SELECT doc_id, tk,
      |         unnest(generate_series(1, len(tk), 20)) AS s1
      |       FROM tk WHERE len(tk) > 0)
      |SELECT doc_id, CAST((s1 - 1) // 20 AS BIGINT) AS chunk_idx,
      |  CAST(s1 - 1 AS BIGINT) AS token_start,
      |  CAST(len(tk[s1:s1+29]) AS BIGINT) AS n_tokens,
      |  array_to_string(tk[s1:s1+29], ' ') AS chunk_text
      |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  /** Retrieval-evaluation harness
    * ([[graft.operators.TextOps.retrievalMetrics]]): the first five
    * embeddings are queries, the rest the corpus; brute-force cosine
    * top-10 is the ranked run, label-equality the binary relevance
    * judgments. recall@10 / MRR@10 / nDCG@10 per query; the oracle
    * recomputes the full pipeline — cosine ranking via
    * `list_cosine_similarity` + the metric formulas — in SQL.
    */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qe"),
        col("label").as("__ql"))
    val c = emb.filter(col("vec_id") >= 5)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("__cos"), col("vec_id"))
    val results = c.crossJoin(broadcast(q))
      .withColumn("__cos", VF.cosine(col("embedding"), col("__qe")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id"), col("rank"))
    val qrels = c.select(col("vec_id"), col("label"))
      .join(broadcast(q.select(col("query_id"), col("__ql"))),
        col("label") === col("__ql"))
      .select(col("query_id"), col("vec_id"))
    TextOps.retrievalMetrics(results, qrels, "query_id", "vec_id", "rank",
        k = 10)
      .orderBy("query_id")
  }

  private def retrievalMetricsOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe,
      |    label AS ql
      |  FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
      |      FROM embeddings WHERE vec_id >= 5),
      |scored AS (
      |  SELECT qid, vec_id, label, ql,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY list_cosine_similarity(e, qe) DESC, vec_id) AS rank
      |  FROM q, c),
      |hits AS (SELECT qid, rank FROM scored
      |         WHERE rank <= 10 AND label = ql),
      |hagg AS (SELECT qid, count(*) AS n_hits, min(rank) AS first_rank,
      |           sum(1.0 / log2(rank + 1)) AS dcg
      |         FROM hits GROUP BY qid),
      |nrel AS (SELECT q.qid, count(*) AS n_rel
      |         FROM q JOIN c ON c.label = q.ql GROUP BY q.qid)
      |SELECT n.qid AS query_id,
      |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      |  CAST(n.n_rel AS BIGINT) AS n_rel,
      |  round(coalesce(h.n_hits, 0)::DOUBLE / n.n_rel, 6) AS recall_at_k,
      |  round(coalesce(1.0 / h.first_rank, 0), 6) AS mrr,
      |  round(coalesce(h.dcg, 0) / list_sum(list_transform(
      |    generate_series(1, least(n.n_rel, 10)),
      |    i -> 1.0 / log2(i + 1))), 6) AS ndcg_at_k
      |FROM nrel n LEFT JOIN hagg h USING (qid) ORDER BY query_id""".stripMargin

  /** Exact-phrase search through the INVERTED INDEX path
    * ([[graft.operators.TextOps.buildPostings]] →
    * [[graft.operators.TextOps.phraseSearch]]): postings for the two
    * phrase terms, aligned and intersected on (doc, start). The
    * oracle computes the same result the OTHER way — a brute-force
    * lambda scan counting consecutive-token matches — so the gate
    * locks index-vs-scan equivalence, occurrence counts included.
    */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val postings = TextOps.buildPostings(docs, "doc_id", "text")
    TextOps.phraseSearch(postings, "doc_id", Seq("hash", "join"))
      .orderBy("doc_id")
  }

  private def phraseSearchOracle: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS tk
      |  FROM documents),
      |occ AS (
      |  SELECT doc_id,
      |    len(list_filter(generate_series(1, len(tk) - 1),
      |      i -> tk[i:i+1] = ['hash', 'join'])) AS n
      |  FROM tk WHERE len(tk) >= 2)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_occurrences
      |FROM occ WHERE n > 0 ORDER BY doc_id""".stripMargin

  /** Lexical-diversity + readability profile
    * ([[graft.operators.TextOps.lexicalStats]]): token/type counts,
    * TTR, mean word length, vowel-group syllables, Flesch score —
    * map-only quality-classifier features. The oracle restates every
    * formula over DuckDB list/regex functions.
    */
  private def q91(s: SparkSession, dir: String): DataFrame =
    TextOps.lexicalStats(
      t(s, dir, "documents").filter(col("doc_id") < 40), "doc_id", "text")
      .orderBy("doc_id")

  private def lexicalStatsOracle: String =
    """WITH tk AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS tk
      |  FROM documents WHERE doc_id < 40),
      |base AS (
      |  SELECT doc_id,
      |    CAST(len(tk) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_types,
      |    list_sum(list_transform(tk, t -> len(t))) AS chars,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS syllables,
      |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents
      |  FROM tk)
      |SELECT doc_id, n_tokens, n_types,
      |  CASE WHEN n_tokens > 0
      |    THEN round(n_types::DOUBLE / n_tokens, 6) ELSE 0.0 END AS ttr,
      |  CASE WHEN n_tokens > 0
      |    THEN round(chars::DOUBLE / n_tokens, 6) ELSE 0.0 END AS avg_word_len,
      |  syllables,
      |  CASE WHEN n_tokens > 0
      |    THEN round(206.835 - 1.015 * (n_tokens::DOUBLE / sents)
      |      - 84.6 * (syllables::DOUBLE / n_tokens), 6)
      |    ELSE 0.0 END AS flesch
      |FROM base ORDER BY doc_id""".stripMargin

  /** TF-IDF keyword extraction
    * ([[graft.operators.TextOps.tfidfKeywords]]): per-document top-5
    * tokens by smoothed tf-idf, rank window → WindowGroupLimit. The
    * oracle recomputes tf, df, and the smoothed idf in SQL.
    */
  private def q92(s: SparkSession, dir: String): DataFrame =
    TextOps.tfidfKeywords(
      t(s, dir, "documents").filter(col("doc_id") < 15), "doc_id", "text",
      topJ = 5)
      .orderBy("doc_id", "rank")

  private def tfidfOracle: String =
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 15),
      |n AS (SELECT count(*) AS n FROM docs),
      |toks AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    t -> len(t) > 0)) AS token
      |  FROM docs),
      |tf AS (SELECT doc_id, token, count(*) AS tf
      |       FROM toks GROUP BY doc_id, token),
      |dfq AS (SELECT token, count(DISTINCT doc_id) AS df
      |        FROM toks GROUP BY token),
      |scored AS (
      |  SELECT tf.doc_id, tf.token,
      |    tf.tf * (ln((n.n + 1.0) / (dfq.df + 1.0)) + 1.0) AS score
      |  FROM tf, dfq, n WHERE tf.token = dfq.token),
      |ranked AS (
      |  SELECT doc_id, token, score,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, token) AS rank
      |  FROM scored)
      |SELECT doc_id, CAST(rank AS INTEGER) AS rank, token,
      |  round(score, 6) AS score
      |FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  /** Corpus PMI collocations
    * ([[graft.operators.TextOps.pmiCollocations]]): top-20 adjacent
    * pairs by pointwise mutual information with a min-count guard.
    * The oracle rebuilds unigram/bigram counts and the log formula.
    */
  private def q93(s: SparkSession, dir: String): DataFrame =
    TextOps.pmiCollocations(t(s, dir, "documents"), "text",
      minCount = 5, topK = 20)

  private def pmiOracle: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS tk
      |  FROM documents),
      |uni AS (SELECT unnest(tk) AS w FROM tk),
      |cu AS (SELECT w, count(*) AS cw FROM uni GROUP BY w),
      |u AS (SELECT sum(cw) AS u FROM cu),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(
      |      generate_series(1, len(tk) - 1),
      |      i -> array_to_string(tk[i:i+1], ' '))) AS g
      |  FROM tk WHERE len(tk) >= 2),
      |cb AS (SELECT g, count(*) AS cab FROM bg GROUP BY g
      |       HAVING count(*) >= 5),
      |b AS (SELECT count(*) AS b FROM bg)
      |SELECT string_split(cb.g, ' ')[1] AS w1,
      |  string_split(cb.g, ' ')[2] AS w2,
      |  CAST(cb.cab AS BIGINT) AS n_pair,
      |  round(ln((cb.cab::DOUBLE / b.b) /
      |    ((c1.cw::DOUBLE / u.u) * (c2.cw::DOUBLE / u.u))), 6) AS pmi
      |FROM cb, b, u,
      |  cu c1, cu c2
      |WHERE c1.w = string_split(cb.g, ' ')[1]
      |  AND c2.w = string_split(cb.g, ' ')[2]
      |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  /** Exact substring dedup ([[graft.operators.Dedup.duplicatedSpans]]):
    * merged token-index spans of cross-/within-document duplicated
    * 5-token windows (the ExactSubstr pass of the dedup literature,
    * re-expressed as Rabin-Karp window fingerprints → occurrence
    * stats → gaps-and-islands span merge). The Spark side groups
    * 8-byte rolling fingerprints; the oracle rebuilds the same
    * windows as literal 5-token STRINGS and replays the flag + merge
    * relationally — a hash match proves fingerprint equality ⇔ window
    * equality end-to-end (positions, keep-first discipline, merge
    * arithmetic).
    */
  private def q94(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.duplicatedSpans(docs(s, dir), "doc_id", "text",
        windowTokens = 5, minCount = 2, keepFirst = true)
      .orderBy(col("doc_id"), col("span_begin"))

  private def substrSpansOracle: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS tk
      |  FROM documents),
      |win AS (
      |  SELECT doc_id, w.pos AS pos, w.gram AS gram
      |  FROM (SELECT doc_id, unnest(list_transform(
      |      generate_series(1, len(tk) - 4),
      |      i -> struct_pack(pos := i - 1,
      |        gram := array_to_string(tk[i:i+4], ' ')))) AS w
      |    FROM tk WHERE len(tk) >= 5)),
      |st AS (
      |  SELECT doc_id, pos,
      |    count(*) OVER (PARTITION BY gram) AS cnt,
      |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rnk
      |  FROM win),
      |fl AS (SELECT doc_id, pos FROM st WHERE cnt >= 2 AND rnk > 1),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(CASE WHEN prev IS NULL OR pos - prev > 5 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM (SELECT doc_id, pos,
      |      lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |    FROM fl))
      |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_begin,
      |  CAST(max(pos) + 5 AS BIGINT) AS span_end,
      |  CAST(count(*) AS BIGINT) AS n_windows
      |FROM isl GROUP BY doc_id, island
      |ORDER BY doc_id, span_begin""".stripMargin

  /** Substring-duplication coverage gate
    * ([[graft.operators.Dedup.substringDupStats]]): per-document
    * duplicated-token fraction from the merged spans — the curation
    * filter form of q94 (drop documents whose coverage exceeds a
    * threshold). Restricted to affected documents so the result is a
    * focused diff; the oracle replays spans then aggregates.
    */
  private def q95(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.substringDupStats(docs(s, dir), "doc_id", "text",
        windowTokens = 5, minCount = 2, keepFirst = true)
      .filter(col("dup_tokens") > 0)
      .orderBy(col("doc_id"))

  private def substrStatsOracle: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS tk
      |  FROM documents),
      |win AS (
      |  SELECT doc_id, w.pos AS pos, w.gram AS gram
      |  FROM (SELECT doc_id, unnest(list_transform(
      |      generate_series(1, len(tk) - 4),
      |      i -> struct_pack(pos := i - 1,
      |        gram := array_to_string(tk[i:i+4], ' ')))) AS w
      |    FROM tk WHERE len(tk) >= 5)),
      |st AS (
      |  SELECT doc_id, pos,
      |    count(*) OVER (PARTITION BY gram) AS cnt,
      |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rnk
      |  FROM win),
      |fl AS (SELECT doc_id, pos FROM st WHERE cnt >= 2 AND rnk > 1),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(CASE WHEN prev IS NULL OR pos - prev > 5 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM (SELECT doc_id, pos,
      |      lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |    FROM fl)),
      |sp AS (
      |  SELECT doc_id, min(pos) AS b, max(pos) + 5 AS e
      |  FROM isl GROUP BY doc_id, island),
      |dup AS (SELECT doc_id, sum(e - b) AS dup_tokens FROM sp GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
      |  CAST(dup.dup_tokens AS BIGINT) AS dup_tokens,
      |  round(dup.dup_tokens::DOUBLE / len(t.tk), 6) AS dup_frac
      |FROM tk t JOIN dup ON t.doc_id = dup.doc_id
      |WHERE dup.dup_tokens > 0
      |ORDER BY t.doc_id""".stripMargin

  /** Deterministic messy-URL fixture for the URL-curation gates (the
    * corpus has no URL column): both engines build the identical
    * string per row — four shapes cycling by doc_id exercising case,
    * default/explicit ports, tracking params, fragments, and empty
    * paths.
    */
  private def syntheticUrl: Column = {
    val id = col("doc_id").cast("string")
    val m = pmod(col("doc_id"), lit(4))
    when(m === 0, concat(lit("HTTPS://WWW."), col("source"),
        lit(".Example.COM:443/a/"), id, lit("?utm_source=rss&b=2&a=1#top")))
      .when(m === 1, concat(lit("http://"), col("source"),
        lit(".example.com:80/index")))
      .when(m === 2, concat(lit("https://cdn."), col("source"),
        lit(".EXAMPLE.com:8443/x?gclid=g"), id, lit("&z=9")))
      .otherwise(concat(lit("http://"), col("source"), lit(".example.com")))
  }

  /** URL canonicalization ([[graft.operators.UrlOps.canonicalUrl]]):
    * lowercased scheme/host, default ports and fragments dropped,
    * empty path → "/", tracking params removed, surviving params
    * sorted — plus the per-domain curation key (host, `www.`
    * stripped). The oracle replays the full string surgery with
    * regexes and list functions, so a hash match grades every rule.
    */
  private def q96(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.UrlOps
    docs(s, dir).withColumn("__u", syntheticUrl)
      .select(col("doc_id"), UrlOps.canonicalUrl(col("__u")).as("url"),
        UrlOps.urlDomain(col("__u")).as("domain"))
      .orderBy(col("doc_id"))
  }

  private def urlCanonOracle: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/a/' ||
      |        CAST(doc_id AS VARCHAR) || '?utm_source=rss&b=2&a=1#top'
      |      WHEN 1 THEN 'http://' || source || '.example.com:80/index'
      |      WHEN 2 THEN 'https://cdn.' || source || '.EXAMPLE.com:8443/x?gclid=g' ||
      |        CAST(doc_id AS VARCHAR) || '&z=9'
      |      ELSE 'http://' || source || '.example.com'
      |    END AS u
      |  FROM documents),
      |p AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(u, '^([^:/?#]+)://', 1)) AS scheme,
      |    regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1) AS auth,
      |    regexp_extract(u, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path0,
      |    CASE WHEN contains(u, '?')
      |      THEN regexp_extract(u, '\?([^#]*)', 1) ELSE '' END AS q
      |  FROM raw),
      |hp AS (
      |  SELECT doc_id, scheme,
      |    lower(CASE WHEN contains(auth, ':')
      |      THEN split_part(auth, ':', 1) ELSE auth END) AS host,
      |    CASE WHEN contains(auth, ':')
      |      THEN split_part(auth, ':', 2) ELSE '' END AS port,
      |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
      |    -- array_to_string of an EMPTY list is NULL in DuckDB
      |    coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'),
      |      x -> len(x) > 0
      |        AND NOT starts_with(lower(split_part(x, '=', 1)), 'utm_')
      |        AND lower(split_part(x, '=', 1)) NOT IN
      |          ('gclid','fbclid','msclkid','mc_eid','igshid','ref','ref_src'))),
      |      '&'), '') AS qs
      |  FROM p)
      |SELECT doc_id,
      |  scheme || '://' || host ||
      |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
      |      OR (scheme = 'https' AND port = '443')
      |      THEN '' ELSE ':' || port END ||
      |    path || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS url,
      |  CASE WHEN starts_with(host, 'www.') THEN substr(host, 5)
      |    ELSE host END AS domain
      |FROM hp ORDER BY doc_id""".stripMargin

  /** Domain blocklist + per-domain aggregation
    * ([[graft.operators.UrlOps.blocklistAntiJoin]] /
    * [[graft.operators.UrlOps.domainStats]]): drop two blocked
    * registrable domains INCLUDING their subdomains (cdn.src1… falls,
    * src10… survives the dot-boundary), then count and share the
    * surviving corpus per domain. The anti-join explodes each domain
    * into its dot-suffixes and joins the broadcast blocklist on
    * equality — the oracle expresses the same predicate with
    * suffix LIKE.
    */
  private def q97(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.UrlOps
    val blocklist = Seq("src1.example.com", "src7.example.com").toDF("domain")
    val kept = UrlOps.blocklistAntiJoin(
      docs(s, dir).withColumn("__u", syntheticUrl), "__u", blocklist, "domain")
    UrlOps.domainStats(kept, "__u").orderBy(col("domain"))
  }

  private def domainBlockOracle: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN 'www.' || source || '.example.com'
      |      WHEN 2 THEN 'cdn.' || source || '.example.com'
      |      ELSE source || '.example.com'
      |    END AS host
      |  FROM documents),
      |dom AS (
      |  SELECT doc_id,
      |    CASE WHEN starts_with(host, 'www.') THEN substr(host, 5)
      |      ELSE host END AS domain
      |  FROM raw),
      |kept AS (
      |  SELECT domain FROM dom
      |  WHERE NOT (domain IN ('src1.example.com', 'src7.example.com')
      |    OR domain LIKE '%.src1.example.com'
      |    OR domain LIKE '%.src7.example.com')),
      |c AS (SELECT domain, count(*) AS n_docs FROM kept GROUP BY domain),
      |t AS (SELECT sum(n_docs) AS t FROM c)
      |SELECT c.domain, CAST(c.n_docs AS BIGINT) AS n_docs,
      |  round(c.n_docs::DOUBLE / t.t, 6) AS share
      |FROM c, t ORDER BY c.domain""".stripMargin

  /** Domain-level quality gate
    * ([[graft.operators.UrlOps.domainQualityGate]]): drop whole
    * domains whose mean quality score misses the bar — the C4-style
    * provenance filter downstream of q96/q97. The per-row score is
    * the q40 composite quality score plus a deterministic
    * source-derived offset (both engines compute it identically), so
    * which domains clear the bar is fixed by construction; the oracle
    * replays scoring, per-domain means, the gate, and the surviving
    * aggregation.
    */
  private def q98(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.UrlOps
    val scored = docs(s, dir).withColumn("__u", syntheticUrl)
      .withColumn("__q",
        (substring(col("source"), 4, 10).cast("int") % 3).cast("double") * 2.0 +
          TF.qualityScore(col("text")))
    UrlOps.domainQualityGate(scored, "__u", "__q", minMeanScore = 3.0, minDocs = 2)
      .groupBy(UrlOps.urlDomain(col("__u")).as("domain"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("__q")), 4).as("mean_q"))
      .orderBy(col("domain"))
  }

  private def domainQualityOracle: String =
    """WITH s AS (
      |  SELECT doc_id, source,
      |    CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN source || '.example.com'
      |      WHEN 2 THEN 'cdn.' || source || '.example.com'
      |      ELSE source || '.example.com'
      |    END AS domain,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS toks, text
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, domain,
      |    (CAST(substr(source, 4) AS INTEGER) % 3) * 2.0 +
      |    round(
      |      least(len(toks) / 50.0, 1.0) * 0.4
      |      + least((CASE WHEN len(toks) = 0 THEN 0.0
      |          ELSE len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','that','this','be'))) * 1.0 / len(toks) END) * 4.0, 1.0) * 0.3
      |      + greatest(0.0, 1.0 - (CASE WHEN len(text) = 0 THEN 0.0
      |          ELSE len(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / len(text) END) * 5.0) * 0.3,
      |      4) AS qs
      |  FROM s),
      |good AS (
      |  SELECT domain FROM q GROUP BY domain
      |  HAVING avg(qs) >= 3.0 AND count(*) >= 2)
      |SELECT q.domain, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(avg(q.qs), 4) AS mean_q
      |FROM q JOIN good ON q.domain = good.domain
      |GROUP BY q.domain ORDER BY q.domain""".stripMargin

  /** Cross-corpus span decontamination
    * ([[graft.operators.Dedup.crossCorpusDuplicatedSpans]]): token
    * ranges of even-id documents that appear verbatim (5-token
    * windows) anywhere in the odd-id reference half — q67's
    * train/eval split at q94's span granularity. The oracle rebuilds
    * reference grams as a DISTINCT string set, semi-joins, and
    * replays the merge.
    */
  private def q100(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.Dedup.crossCorpusDuplicatedSpans(
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        d.filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", windowTokens = 5)
      .orderBy(col("doc_id"), col("span_begin"))
  }

  private def crossSpansOracle: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS tk
      |  FROM documents),
      |win AS (
      |  SELECT doc_id, w.pos AS pos, w.gram AS gram
      |  FROM (SELECT doc_id, unnest(list_transform(
      |      generate_series(1, len(tk) - 4),
      |      i -> struct_pack(pos := i - 1,
      |        gram := array_to_string(tk[i:i+4], ' ')))) AS w
      |    FROM tk WHERE len(tk) >= 5)),
      |rf AS (SELECT DISTINCT gram FROM win WHERE doc_id % 2 = 1),
      |fl AS (
      |  SELECT t.doc_id, t.pos
      |  FROM (SELECT * FROM win WHERE doc_id % 2 = 0) t
      |  JOIN rf ON t.gram = rf.gram),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(CASE WHEN prev IS NULL OR pos - prev > 5 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM (SELECT doc_id, pos,
      |      lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |    FROM fl))
      |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_begin,
      |  CAST(max(pos) + 5 AS BIGINT) AS span_end,
      |  CAST(count(*) AS BIGINT) AS n_windows
      |FROM isl GROUP BY doc_id, island
      |ORDER BY doc_id, span_begin""".stripMargin

  /** Video frame decode ([[graft.operators.Multimodal.videoFrames]]):
    * MJPEG-in-AVI assets explode into real JPEG frames (pure-JDK RIFF
    * walk), stride-sampled, then the EXISTING image stack decodes each
    * frame's raster — dims are exact codec facts known a priori, so
    * the oracle is the literal expectation table (the q44 discipline
    * for binary kernels). A still image contributes zero rows.
    */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def solid(w: Int, h: Int, c: Int) = M.renderJpeg(w, h, (_, _) => c)
    val assets = Seq(
      (1L, M.syntheticMjpegAvi(Seq(
        solid(64, 32, 0xA03219), solid(64, 32, 0x19A032), solid(128, 64, 0x636363)))),
      (2L, M.syntheticMjpegAvi(Seq(solid(32, 32, 0x0000FF)))),
      (3L, M.renderPng(8, 8, (_, _) => 0))
    ).toDF("doc_id", "content")
    M.imageStats(M.videoFrames(assets, stride = 2), contentCol = "frame")
      .select(col("doc_id"), col("frame_idx"),
        col("stats.width").as("width"), col("stats.height").as("height"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private def videoFramesOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(frame_idx AS INTEGER) AS frame_idx,
      |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height
      |FROM (VALUES (1, 0, 64, 32), (1, 2, 128, 64), (2, 0, 32, 32))
      |  AS t(doc_id, frame_idx, width, height)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Token-budget mixture sampling
    * ([[graft.operators.TextOps.tokenBudgetSample]]): per-stratum
    * prefix selection in portable-hash order until the TOKEN budget is
    * spent — training mixes are specified in tokens, not documents.
    * The operator runs the two-phase bucket decomposition (no stratum
    * funnels through one reducer); the oracle IS the naive
    * single-window form it must equal, so the hash match proves the
    * decomposition, the running totals, and the stop condition.
    */
  private def q101(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps.tokenBudgetSample(docs(s, dir), "source", "doc_id",
        "text", Map("src0" -> 3000L, "src1" -> 1200L, "src2" -> 500L))
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tok"))
      .orderBy(col("source"), col("cum_tok"))

  private def tokenBudgetOracle: String =
    """WITH b AS (
      |  SELECT * FROM (VALUES ('src0', 3000), ('src1', 1200), ('src2', 500))
      |    v(source, budget)),
      |t AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> len(x) > 0)) AS BIGINT) AS n_tok,
      |    CAST(concat('0x', substring(md5(concat('mix:', doc_id)), 1, 8))
      |      AS BIGINT) AS h
      |  FROM documents),
      |w AS (
      |  SELECT t.doc_id, t.source, t.n_tok, b.budget,
      |    sum(t.n_tok) OVER (PARTITION BY t.source ORDER BY t.h, t.doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
      |  FROM t JOIN b USING (source))
      |SELECT doc_id, source, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
      |FROM w WHERE cum_tok <= budget
      |ORDER BY source, cum_tok""".stripMargin

  /** Curation: NB quality classifier — the GPT-3-style quality filter
    * (Brown et al. 2020 App. A: a cheap linear classifier fit to
    * separate a trusted corpus from raw crawl, crawl thresholded on
    * its score). Fit separates src0 (trusted) from the rest (raw)
    * with a CAPPED vocabulary so the gate exercises the OOV fallback;
    * scoring is map-only (the fitted table rides the expression, zero
    * shuffles). The oracle refits the whole classifier in SQL: token
    * class counts, Laplace log-odds in the exact arithmetic grouping
    * of [[Curation.fitNbQuality]], the (total desc, token) vocab cap,
    * OOV coalesce, and the document-count prior.
    */
  private def q102(s: SparkSession, dir: String): DataFrame = {
    val docsDf = t(s, dir, "documents")
    val model = Curation.memoModel(s, s"$dir#nb-src0")(
      Curation.fitNbQuality(docsDf.filter(col("source") === "src0"),
        docsDf.filter(col("source") =!= "src0"), "text", maxVocab = 512))
    Curation.nbScore(docsDf, "doc_id", "text", model)
      .select(col("doc_id"), col("n_tokens"),
        round(col("nb_score"), 6).as("nb_score"))
      .orderBy(desc("nb_score"), col("doc_id"))
      .limit(20)
  }

  private def nbQualityOracle: String =
    """WITH tk AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS tk
      |  FROM documents),
      |tok AS (SELECT doc_id, source, unnest(tk) AS w FROM tk),
      |cnt AS (
      |  SELECT w,
      |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS cp,
      |    sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cn
      |  FROM tok GROUP BY w),
      |st AS (SELECT count(*) AS v, sum(cp) AS np, sum(cn) AS nn FROM cnt),
      |dc AS (
      |  SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS dp,
      |         sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS dn
      |  FROM documents),
      |vocab AS (SELECT w, cp, cn FROM cnt ORDER BY cp + cn DESC, w LIMIT 512),
      |lo AS (
      |  SELECT vocab.w, CAST(round(ln(((cp + 1.0) / (np + v)) /
      |      ((cn + 1.0) / (nn + v))) * 1000000) AS BIGINT) AS lo
      |  FROM vocab CROSS JOIN st),
      |oov AS (SELECT CAST(round(ln((1.0 / (np + v)) /
      |      (1.0 / (nn + v))) * 1000000) AS BIGINT) AS lo FROM st),
      |prior AS (SELECT CAST(round(ln((dp + 1.0) / (dn + 1.0)) * 1000000)
      |      AS BIGINT) AS p FROM dc),
      |scored AS (
      |  SELECT tok.doc_id, count(*) AS n_tokens,
      |    CAST(sum(coalesce(lo.lo, oov.lo)) AS BIGINT) AS s
      |  FROM tok LEFT JOIN lo ON lo.w = tok.w CROSS JOIN oov
      |  GROUP BY tok.doc_id)
      |SELECT doc_id, n_tokens,
      |  round(CAST(s + prior.p AS DOUBLE) / 1000000.0, 6) AS nb_score
      |FROM scored CROSS JOIN prior
      |ORDER BY nb_score DESC, doc_id LIMIT 20""".stripMargin

  /** Scale: Z-order (Morton-curve) multi-column layout
    * ([[graft.operators.Scale.zOrderLayout]] over
    * [[graft.functions.CatalystExpressions.zOrderValue]]): rows
    * cluster along the space-filling curve so every output file's
    * min/max footer stats cover a tight rectangle in BOTH columns —
    * the data-skipping layout for 100 TB tables queried on more than
    * one axis (ScaleSpec measures the per-file bounding boxes; this
    * gate pins the interleave arithmetic bit-for-bit: the oracle
    * recomputes the Morton value with DuckDB bit operators over
    * `generate_series`). The layout pass itself is row-preserving, so
    * running the gate THROUGH it also proves the reorder loses and
    * invents nothing.
    */
  private def q103(s: SparkSession, dir: String): DataFrame = {
    val pts = docs(s, dir).select(col("doc_id"),
      (col("doc_id") % 256).cast("long").as("x"),
      ((col("doc_id") * 31 + 7) % 256).cast("long").as("y"))
    graft.operators.Scale.zOrderLayout(pts, "x", "y", numFiles = 8, bits = 8)
      .select(col("doc_id"), col("x"), col("y"),
        graft.functions.CatalystExpressions.zOrderValue(col("x"), col("y"), 8)
          .as("zval"))
      .orderBy(col("doc_id"))
  }

  private def zOrderOracle: String =
    """WITH pts AS (
      |  SELECT doc_id,
      |    CAST(doc_id % 256 AS BIGINT) AS x,
      |    CAST((doc_id * 31 + 7) % 256 AS BIGINT) AS y
      |  FROM documents),
      |z AS (
      |  SELECT doc_id, x, y,
      |    CAST(sum((((x >> i.i) & 1) << (2 * i.i)) +
      |             (((y >> i.i) & 1) << (2 * i.i + 1))) AS BIGINT) AS zval
      |  FROM pts, generate_series(0, 7) AS i(i)
      |  GROUP BY doc_id, x, y)
      |SELECT doc_id, x, y, zval FROM z ORDER BY doc_id""".stripMargin

  /** A7/O8 family — frequent items via the Misra–Gries sketch
    * ([[graft.operators.Analytics.frequentItems]] /
    * [[graft.operators.Aggregators.misraGries]]): fixed-memory
    * mergeable heavy-hitters summary instead of a full
    * `groupBy(item).count()` shuffle. The documents vocabulary (31
    * distinct tokens at every SF) sits under the capacity (64), so the
    * sketch is provably EXACT here and the oracle's exact counts gate
    * the whole reduce/merge path; SketchSpec covers the lossy regime
    * (counters evicted, ε-bound, merge associativity).
    */
  private def q104(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("item"))
      .filter(col("item") =!= "")
    graft.operators.Analytics.frequentItems(toks, "item", capacity = 64, k = 10)
  }

  private def heavyHittersOracle: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS item
      |  FROM documents)
      |SELECT item, CAST(count(*) AS BIGINT) AS freq
      |FROM toks WHERE item <> ''
      |GROUP BY item ORDER BY freq DESC, item LIMIT 10""".stripMargin

  /** Domain-authority PageRank
    * ([[graft.operators.Analytics.pageRank]]): weighted power
    * iteration over the customer-nation → supplier-nation trade graph
    * (5 iterations, α=0.85, dangling mass redistributed uniformly).
    * The crawl-curation quality prior: rank a domain by who links to
    * it, not by its own content. The oracle unrolls the SAME five
    * iterations as chained CTEs in DuckDB — per-node double sums over
    * ≤25 terms, so both engines agree to well past the rounded 6
    * decimals.
    */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val cst = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    val edges = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(cst, o("o_custkey") === cst("c_custkey"))
      .join(nat.select(col("n_nationkey").as("__cnk"), col("n_name").as("src")),
        cst("c_nationkey") === col("__cnk"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nat.select(col("n_nationkey").as("__snk"), col("n_name").as("dst")),
        sup("s_nationkey") === col("__snk"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    graft.operators.Analytics.pageRank(edges, "src", "dst", "w",
        iterations = 5, alpha = 0.85)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy(col("node"))
  }

  private def pageRankOracle: String = {
    val base = """WITH edges AS (
      |  SELECT cn.n_name AS src, sn.n_name AS dst,
      |    CAST(count(*) AS DOUBLE) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |  GROUP BY cn.n_name, sn.n_name),
      |nodes AS (SELECT DISTINCT src AS node FROM edges
      |          UNION SELECT DISTINCT dst FROM edges),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |trans AS (
      |  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p
      |  FROM edges),
      |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)""".stripMargin
    val iters = (1 to 5).map { k =>
      val j = k - 1
      s""",
      |d$k AS (SELECT coalesce(sum(rank), 0) AS dang FROM r$j
      |        WHERE node NOT IN (SELECT DISTINCT src FROM trans)),
      |c$k AS (SELECT t.dst AS node, sum(r.rank * t.p) AS cin
      |        FROM r$j r JOIN trans t ON r.node = t.src GROUP BY t.dst),
      |r$k AS (
      |  SELECT nodes.node,
      |    (1 - 0.85) / nn.n + 0.85 * (coalesce(c$k.cin, 0) + d$k.dang / nn.n)
      |      AS rank
      |  FROM nodes CROSS JOIN nn CROSS JOIN d$k
      |  LEFT JOIN c$k ON nodes.node = c$k.node)""".stripMargin
    }.mkString
    base + iters + "\nSELECT node, round(rank, 6) AS rank FROM r5 ORDER BY node"
  }

  /** α-temperature mixture sampling
    * ([[graft.operators.TextOps.temperatureResample]]): the XLM-R/mT5
    * multilingual rebalancing rule — stratum quotas `∝ n^α` flatten
    * the head (α=0.5 here: en's 218 docs get 92 slots, fr's 64 get
    * 50), rows selected as the portableHash-order prefix per stratum.
    * The oracle refits the whole policy in SQL: per-lang counts,
    * `round(total · n^α / Σn^α)` quotas (identical IEEE arithmetic
    * order), the md5-hash rank, and the prefix filter.
    */
  private def q106(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps.temperatureResample(docs(s, dir), "lang", "doc_id",
        alpha = 0.5, totalDocs = 300)
      .select(col("doc_id"), col("lang"), col("k_stratum"))
      .orderBy(col("lang"), col("doc_id"))

  private def temperatureOracle: String =
    """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      |z AS (SELECT sum(pow(n, 0.5)) AS z FROM c),
      |k AS (
      |  SELECT lang, least(n, CAST(round(300 * pow(n, 0.5) / z.z) AS BIGINT))
      |    AS k_stratum
      |  FROM c, z),
      |h AS (
      |  SELECT doc_id, lang,
      |    CAST(concat('0x', substring(md5(concat('mix:', doc_id)), 1, 8))
      |      AS BIGINT) AS h
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
      |  FROM h)
      |SELECT r.doc_id, r.lang, k.k_stratum
      |FROM r JOIN k USING (lang) WHERE r.rk <= k.k_stratum
      |ORDER BY lang, doc_id""".stripMargin

  /** One-sided containment dedup
    * ([[graft.operators.Dedup.containmentPairs]]): Broder's
    * containment `|A∩B|/|A|` over distinct word 5-grams — the
    * quote/partial-copy detector Jaccard resemblance misses (a
    * fragment inside a much larger document dilutes the union). The
    * oracle restates grams, the pair equi-join, per-doc totals, and
    * the rounded ratio filter relationally.
    */
  private def q107(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.containmentPairs(docs(s, dir), "doc_id", "text",
        n = 5, minContainment = 0.8)
      .orderBy(col("contained_id"), col("container_id"))

  private def containmentOracle: String =
    """WITH tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS tk
      |  FROM documents),
      |ng AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |      generate_series(1, len(tk) - 4),
      |      i -> array_to_string(tk[i:i+4], ' ')))) AS gram
      |  FROM tk WHERE len(tk) >= 5),
      |tot AS (SELECT doc_id, count(*) AS n_grams FROM ng GROUP BY doc_id),
      |sh AS (
      |  SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
      |    count(*) AS n_shared
      |  FROM ng a JOIN ng b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2)
      |SELECT s.contained_id, s.container_id,
      |  CAST(s.n_shared AS BIGINT) AS n_shared,
      |  CAST(t.n_grams AS BIGINT) AS n_grams,
      |  round(CAST(s.n_shared AS DOUBLE) / t.n_grams, 6) AS containment
      |FROM sh s JOIN tot t ON s.contained_id = t.doc_id
      |WHERE round(CAST(s.n_shared AS DOUBLE) / t.n_grams, 6) >= 0.8
      |ORDER BY contained_id, container_id""".stripMargin

  /** Corpus-shift drift report ([[graft.operators.Curation.tokenShift]]):
    * per-token KL contribution between two snapshots (even vs odd
    * doc_id here) over the Laplace-smoothed union vocabulary — the
    * "what changed between crawls" monitor. Every output value is
    * per-row arithmetic (no cross-token float sums), so both engines
    * agree bit-for-bit before the rounding.
    */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Curation.tokenShift(
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        d.filter(pmod(col("doc_id"), lit(2)) === 1), "text")
      .orderBy(desc("kl_term"), col("token"))
      .limit(20)
  }

  private def tokenShiftOracle: String =
    """WITH tk AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    t -> len(t) > 0)) AS token
      |  FROM documents),
      |ca AS (SELECT token, count(*) AS n_a FROM tk WHERE doc_id % 2 = 0
      |       GROUP BY token),
      |cb AS (SELECT token, count(*) AS n_b FROM tk WHERE doc_id % 2 = 1
      |       GROUP BY token),
      |j AS (
      |  SELECT coalesce(ca.token, cb.token) AS token,
      |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
      |  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
      |t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS v FROM j),
      |p AS (
      |  SELECT token, n_a, n_b,
      |    CAST(n_a + 1 AS DOUBLE) / (t.ta + t.v) AS pa,
      |    CAST(n_b + 1 AS DOUBLE) / (t.tb + t.v) AS pb
      |  FROM j, t)
      |SELECT token, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  round(pa, 8) AS p_a, round(pb, 8) AS p_b,
      |  round(pa * ln(pa / pb), 9) AS kl_term
      |FROM p ORDER BY kl_term DESC, token LIMIT 20""".stripMargin

  /** Quality-aware dedup keeper ([[graft.operators.Dedup.keepBest]]):
    * within each near-dup class keep the most COMPLETE member
    * (highest `n_chars`, ties → lowest id) instead of the arbitrary
    * lowest-id default — dedup should retain the canonical copy. The
    * oracle rebuilds the classes (q53's recursive-CC CTE) and replays
    * the argmax ranking; the window runs only over classed rows, so
    * no giant null-class partition exists at scale.
    */
  private def q109(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.keepBest(docDedupClasses(s, dir), "doc_id", "n_chars")
      .filter(col("dup_class").isNotNull)
      .select(col("doc_id"), col("dup_class"), col("n_chars"), col("keep"))
      .orderBy(col("dup_class"), col("doc_id"))

  private def keepBestOracle: String =
    s"""WITH RECURSIVE $ShingleJaccardCte,
       |pairs AS (SELECT id_a, id_b FROM jacc WHERE jaccard >= 0.3),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |reach AS (SELECT s AS node, d AS r FROM edges
       |          UNION
       |          SELECT rc.node, e.d AS r FROM reach rc JOIN edges e ON rc.r = e.s),
       |labels AS (SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node),
       |scored AS (
       |  SELECT l.node AS doc_id, l.comp AS dup_class, d.n_chars
       |  FROM labels l JOIN documents d ON l.node = d.doc_id)
       |SELECT doc_id, dup_class, n_chars,
       |  row_number() OVER (PARTITION BY dup_class
       |    ORDER BY n_chars DESC, doc_id) = 1 AS keep
       |FROM scored ORDER BY dup_class, doc_id""".stripMargin

  /** First-touch funnel over the event stream
    * ([[graft.operators.Analytics.funnel]]): view → click → purchase.
    * One hash aggregate keyed by user (conditional min per stage) plus
    * a tiny stage rollup — no window, no self-join, so the plan is a
    * single user-keyed exchange at any scale. The oracle restates the
    * strictly-increasing-first-times semantics with conditional mins.
    */
  private def q110(s: SparkSession, dir: String): DataFrame =
    Analytics.funnel(t(s, dir, "events"), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))

  private def funnelOracle: String =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
      |  GROUP BY user_id),
      |c AS (
      |  SELECT
      |    sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS r0,
      |    sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL
      |             AND t0 < t1 THEN 1 ELSE 0 END) AS r1,
      |    sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t2 IS NOT NULL
      |             AND t0 < t1 AND t1 < t2 THEN 1 ELSE 0 END) AS r2
      |  FROM f),
      |st AS (
      |  SELECT 1 AS stage_idx, 'view' AS stage, r0 AS users, r0 AS base FROM c
      |  UNION ALL
      |  SELECT 2, 'click', r1, r0 FROM c
      |  UNION ALL
      |  SELECT 3, 'purchase', r2, r0 FROM c)
      |SELECT stage_idx, stage, CAST(users AS BIGINT) AS users,
      |  round(CASE WHEN base = 0 THEN 0.0
      |             ELSE CAST(users AS DOUBLE) / base END, 4) AS conversion
      |FROM st ORDER BY stage_idx""".stripMargin

  /** Weekly cohort retention ([[graft.operators.Analytics.cohortRetention]]):
    * cohort = ISO week of first event; cells count distinct active
    * users per week offset. Two user-keyed exchanges (first-times agg +
    * join back on the same key) and one (cohort, offset) count-distinct.
    */
  private def q111(s: SparkSession, dir: String): DataFrame =
    Analytics.cohortRetention(t(s, dir, "events"), "user_id", "ts")
      // ISO string on both sides: DuckDB DATE arrives in pandas as
      // datetime64 (isoformats with T00:00:00), Spark DATE as date
      .withColumn("cohort_week", col("cohort_week").cast("string"))

  private def cohortOracle: String =
    """WITH f AS (
      |  SELECT user_id,
      |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id)
      |SELECT CAST(f.cohort_week AS VARCHAR) AS cohort_week,
      |  CAST(datediff('day', f.cohort_week,
      |       CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT) AS week_offset,
      |  count(DISTINCT e.user_id) AS users
      |FROM events e JOIN f ON e.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Rolling z-score anomaly monitor
    * ([[graft.operators.Analytics.anomalyFlags]]): each event's value
    * vs the mean/σ of the user's previous 20 events. Rolling sums run
    * over integer cents so partial-order can never shift a bit; the
    * oracle replays the identical integer-sum arithmetic in a window.
    */
  private def q112(s: SparkSession, dir: String): DataFrame =
    Analytics.anomalyFlags(t(s, dir, "events"), Seq("user_id"), "event_id",
        "value", window = 20, z = 2.5)
      .filter(col("anomaly"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("roll_mean"), col("roll_std"), col("zscore"))
      .orderBy(col("event_id"))

  private def anomalyOracle: String =
    """WITH c AS (
      |  SELECT event_id, user_id, value,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |w AS (
      |  SELECT event_id, user_id, value, cents,
      |    count(cents) OVER win AS n,
      |    sum(cents) OVER win AS s1,
      |    sum(cents * cents) OVER win AS s2
      |  FROM c
      |  WINDOW win AS (PARTITION BY user_id ORDER BY event_id
      |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT event_id, user_id, value,
      |    CAST(s1 AS DOUBLE) / n AS mean,
      |    sqrt(greatest((CAST(s2 AS DOUBLE) -
      |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n, 0.0)) AS std,
      |    n
      |  FROM w)
      |SELECT event_id, user_id, value,
      |  round(mean / 100.0, 6) AS roll_mean,
      |  round(std / 100.0, 6) AS roll_std,
      |  round((CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) - mean) / std, 6) AS zscore
      |FROM z
      |WHERE n = 20 AND std > 0
      |  AND abs(round((CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) - mean) / std, 6)) > 2.5
      |ORDER BY event_id""".stripMargin

  /** KMV bottom-k distinct-token estimate per source
    * ([[graft.operators.Analytics.kmvDistinct]], k=256) vs the exact
    * count — the mergeable engine-portable alternative to HLL for
    * corpus vocabulary accounting. The oracle replays the ENTIRE
    * sketch in DuckDB (same md5-prefix hashes, same kth-smallest, same
    * estimator), so this gates the sketch bit-for-bit, not just
    * "approximately right".
    */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val exact = toks.groupBy(col("source"))
      .agg(countDistinct(col("token")).as("n_exact"))
    Analytics.kmvDistinct(toks, "token", Seq("source"), k = 256, seed = "kmv")
      .join(exact, Seq("source"))
      .withColumn("rel_err",
        round(abs(col("distinct_est") - col("n_exact")) /
          col("n_exact").cast("double"), 4))
      .select(col("source"), col("n_exact"), col("n_tracked"),
        col("kth_hash"), col("distinct_est"), col("rel_err"))
      .orderBy(col("source"))
  }

  private def kmvOracle: String =
    """WITH tk AS (
      |  SELECT DISTINCT source, t AS token FROM (
      |    SELECT source, unnest(list_filter(
      |      string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0)) AS t
      |    FROM documents)),
      |hd AS (
      |  SELECT DISTINCT source,
      |    CAST(('0x' || substr(md5('kmv:' || token), 1, 8)) AS BIGINT) AS h
      |  FROM tk),
      |r AS (SELECT source, h,
      |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      |      FROM hd),
      |st AS (
      |  SELECT source, least(count(*), 256) AS n_tracked,
      |    max(CASE WHEN rn = 256 THEN h END) AS kth_hash
      |  FROM r GROUP BY source),
      |ex AS (SELECT source, count(DISTINCT token) AS n_exact
      |       FROM tk GROUP BY source),
      |est AS (
      |  SELECT st.source, ex.n_exact, st.n_tracked, st.kth_hash,
      |    CASE WHEN st.n_tracked < 256 THEN CAST(st.n_tracked AS DOUBLE)
      |         ELSE round(255 * 4294967296.0 / kth_hash, 3) END AS distinct_est
      |  FROM st JOIN ex ON st.source = ex.source)
      |SELECT source, n_exact, CAST(n_tracked AS BIGINT) AS n_tracked,
      |  kth_hash, distinct_est,
      |  round(abs(distinct_est - n_exact) / CAST(n_exact AS DOUBLE), 4) AS rel_err
      |FROM est ORDER BY source""".stripMargin

  /** Group-aware train/val/test split
    * ([[graft.operators.TextOps.groupAwareSplit]]): whole sources land
    * in one split (no cross-split leakage by construction), assignment
    * by the portable md5 hash — a pure map-side projection. The gate
    * checks both the per-split totals and that no source straddles
    * splits (n_sources sums to the true source count).
    */
  private def q114(s: SparkSession, dir: String): DataFrame =
    TextOps.groupAwareSplit(docs(s, dir), "source",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "split")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("split"))

  private def groupSplitOracle: String =
    """WITH a AS (
      |  SELECT source,
      |    CAST(('0x' || substr(md5('split:' || source), 1, 8)) AS BIGINT)
      |      / 4294967296.0 AS u
      |  FROM documents),
      |s AS (
      |  SELECT source,
      |    CASE WHEN u < 0.8 THEN 'train'
      |         WHEN u < 0.9 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM a)
      |SELECT split, count(*) AS n_docs,
      |  count(DISTINCT source) AS n_sources
      |FROM s GROUP BY split ORDER BY split""".stripMargin

  /** Gopher quality-rule bundle ([[graft.operators.Curation.gopherFlags]],
    * Rae et al. 2021 Table A1) rolled up per source. Thresholds are
    * tuned to be discriminative on the synthetic corpus (minWords=30,
    * minStopwordHits=1); all counters are integers so the rollup is
    * float-sum-order-free.
    */
  private def q115(s: SparkSession, dir: String): DataFrame =
    Curation.gopherFlags(docs(s, dir), "text",
        minWords = 30, minStopwordHits = 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pass_gopher"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(!col("ok_words"), 1L).otherwise(0L)).as("n_fail_words"),
        sum(when(!col("ok_word_len"), 1L).otherwise(0L)).as("n_fail_len"),
        sum(when(!col("ok_stops"), 1L).otherwise(0L)).as("n_fail_stops"),
        sum(col("n_words")).as("sum_words"))
      .orderBy(col("source"))

  private def gopherOracle: String =
    """WITH f AS (
      |  SELECT source,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |      w -> len(w) > 0) AS tk,
      |    list_filter(string_split(text, chr(10)),
      |      l -> len(trim(l)) > 0) AS ln,
      |    text
      |  FROM documents),
      |m AS (
      |  SELECT source, len(tk) AS n_words,
      |    CASE WHEN len(tk) > 0 THEN round(
      |      CAST(list_sum(list_transform(tk, w -> len(w))) AS DOUBLE)
      |        / len(tk), 6) ELSE 0.0 END AS mean_word_len,
      |    CASE WHEN len(tk) > 0 THEN round(
      |      ((len(text) - len(replace(text, '#', ''))) +
      |       (len(text) - len(replace(text, '...', ''))) / 3)
      |        / CAST(len(tk) AS DOUBLE), 6) ELSE 0.0 END AS symbol_ratio,
      |    CASE WHEN len(ln) > 0 THEN round(
      |      CAST(len(list_filter(ln,
      |        l -> regexp_matches(ltrim(l), '^[-*•]'))) AS DOUBLE)
      |        / len(ln), 6) ELSE 0.0 END AS bullet_frac,
      |    CASE WHEN len(ln) > 0 THEN round(
      |      CAST(len(list_filter(ln,
      |        l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS DOUBLE)
      |        / len(ln), 6) ELSE 0.0 END AS ellipsis_frac,
      |    CASE WHEN len(tk) > 0 THEN round(
      |      CAST(len(list_filter(tk,
      |        w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
      |        / len(tk), 6) ELSE 0.0 END AS alpha_word_frac,
      |    len(list_intersect(list_distinct(list_transform(tk, w -> lower(w))),
      |      ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))
      |      AS stop_hits
      |  FROM f),
      |fl AS (
      |  SELECT source, n_words,
      |    (n_words >= 30 AND n_words <= 100000) AS ok_words,
      |    (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS ok_word_len,
      |    (symbol_ratio <= 0.1) AS ok_symbols,
      |    (bullet_frac <= 0.9) AS ok_bullets,
      |    (ellipsis_frac <= 0.3) AS ok_ellipsis,
      |    (alpha_word_frac >= 0.8) AS ok_alpha,
      |    (stop_hits >= 1) AS ok_stops
      |  FROM m)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN ok_words AND ok_word_len AND ok_symbols
      |           AND ok_bullets AND ok_ellipsis AND ok_alpha AND ok_stops
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |  CAST(sum(CASE WHEN NOT ok_words THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_fail_words,
      |  CAST(sum(CASE WHEN NOT ok_word_len THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_fail_len,
      |  CAST(sum(CASE WHEN NOT ok_stops THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_fail_stops,
      |  CAST(sum(n_words) AS BIGINT) AS sum_words
      |FROM fl GROUP BY source ORDER BY source""".stripMargin

  /** Snapshot diff ([[graft.operators.Scale.snapshotDiff]]): old =
    * docs with id%7≠0, new = docs with id%5≠0 where every id%11==0
    * doc's text is rewritten — so all four statuses occur. One
    * full-outer join on the id over map-side fingerprints; the gate
    * checks the per-status counts AND the changed-id set.
    */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val oldSnap = d.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val newSnap = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(11)) === 0, upper(col("text")))
          .otherwise(col("text")))
    graft.operators.Scale.snapshotDiff(oldSnap, newSnap, "doc_id", Seq("text"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("status"))
  }

  private def snapDiffOracle: String =
    """WITH oldsnap AS (
      |  SELECT doc_id, md5(text) AS old_fp FROM documents
      |  WHERE doc_id % 7 <> 0),
      |newsnap AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END)
      |      AS new_fp
      |  FROM documents WHERE doc_id % 5 <> 0),
      |d AS (
      |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |    CASE WHEN o.old_fp IS NULL THEN 'added'
      |         WHEN n.new_fp IS NULL THEN 'removed'
      |         WHEN o.old_fp = n.new_fp THEN 'unchanged'
      |         ELSE 'changed' END AS status
      |  FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id)
      |SELECT status, count(*) AS n,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM d GROUP BY status ORDER BY status""".stripMargin

  /** Per-source percent-rank quality calibration
    * ([[graft.operators.Curation.percentRankNormalize]] over `n_chars`)
    * + top-half gate. Exact `percent_rank()` semantics via the
    * distinct-score rank table (no giant-partition window sort); the
    * oracle uses the window function directly — same numbers, two very
    * different physical plans.
    */
  private def q117(s: SparkSession, dir: String): DataFrame =
    Curation.percentRankNormalize(docs(s, dir), "source", "n_chars")
      .withColumn("keep", col("pct_rank") >= 0.5)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("pct_rank"), col("keep"))
      .orderBy(col("doc_id"))

  private def pctRankOracle: String =
    """SELECT doc_id, source, n_chars,
      |  round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
      |    AS pct_rank,
      |  round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
      |    >= 0.5 AS keep
      |FROM documents ORDER BY doc_id""".stripMargin

  /** KMV vocabulary-overlap estimate ([[graft.operators.Analytics.kmvOverlap]],
    * k=128) between the even- and odd-doc_id halves of the corpus,
    * plus the exact Jaccard for reference. The oracle replays the full
    * sketch composition — per-side bottom-k, merged-union kth,
    * inclusion–exclusion — in SQL, so the estimator is gated
    * bit-for-bit.
    */
  private def q118(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    def toks(side: DataFrame) = side.select(
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val a = toks(d.filter(pmod(col("doc_id"), lit(2)) === 0))
    val b = toks(d.filter(pmod(col("doc_id"), lit(2)) === 1))
    val est = Analytics.kmvOverlap(a, b, "token", k = 128, seed = "kmv")
    val exact = a.select(col("token")).distinct()
      .join(b.select(col("token")).distinct(), Seq("token"))
      .agg(count(lit(1)).as("__i"))
      .crossJoin(broadcast(
        a.select(col("token")).union(b.select(col("token"))).distinct()
          .agg(count(lit(1)).as("__u"))))
      .select(round(col("__i").cast("double") / col("__u"), 6)
        .as("jaccard_exact"))
    est.crossJoin(broadcast(exact))
  }

  private def kmvOverlapOracle: String =
    """WITH tk AS (
      |  SELECT doc_id % 2 AS side, unnest(list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    t -> len(t) > 0)) AS token
      |  FROM documents),
      |hd AS (
      |  SELECT DISTINCT side,
      |    CAST(('0x' || substr(md5('kmv:' || token), 1, 8)) AS BIGINT) AS h
      |  FROM tk),
      |rk AS (SELECT side, h,
      |         row_number() OVER (PARTITION BY side ORDER BY h) AS rn
      |       FROM hd),
      |ska AS (SELECT h FROM rk WHERE side = 0 AND rn <= 128),
      |skb AS (SELECT h FROM rk WHERE side = 1 AND rn <= 128),
      |un AS (
      |  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
      |    SELECT h FROM ska UNION SELECT h FROM skb)),
      |est AS (
      |  SELECT
      |    CASE WHEN (SELECT count(*) FROM ska) < 128
      |         THEN CAST((SELECT count(*) FROM ska) AS DOUBLE)
      |         ELSE round(127 * 4294967296.0 /
      |                (SELECT h FROM ska ORDER BY h LIMIT 1 OFFSET 127), 3)
      |    END AS est_a,
      |    CASE WHEN (SELECT count(*) FROM skb) < 128
      |         THEN CAST((SELECT count(*) FROM skb) AS DOUBLE)
      |         ELSE round(127 * 4294967296.0 /
      |                (SELECT h FROM skb ORDER BY h LIMIT 1 OFFSET 127), 3)
      |    END AS est_b,
      |    CASE WHEN (SELECT count(*) FROM un WHERE rn <= 128) < 128
      |         THEN CAST((SELECT count(*) FROM un WHERE rn <= 128) AS DOUBLE)
      |         ELSE round(127 * 4294967296.0 /
      |                (SELECT h FROM un WHERE rn = 128), 3)
      |    END AS est_union),
      |cmp AS (
      |  SELECT est_a, est_b, est_union,
      |    round(greatest(est_a + est_b - est_union, 0.0), 3) AS est_inter
      |  FROM est),
      |ex AS (
      |  SELECT round(
      |    CAST((SELECT count(*) FROM
      |      (SELECT DISTINCT token FROM tk WHERE side = 0
      |       INTERSECT SELECT DISTINCT token FROM tk WHERE side = 1))
      |      AS DOUBLE) /
      |    (SELECT count(DISTINCT token) FROM tk), 6) AS jaccard_exact)
      |SELECT est_a, est_b, est_union, est_inter,
      |  CASE WHEN est_union > 0 THEN round(est_inter / est_union, 6)
      |       ELSE 0.0 END AS jaccard_est,
      |  jaccard_exact
      |FROM cmp, ex""".stripMargin

  /** Event-type transition matrix
    * ([[graft.operators.Analytics.transitionMatrix]]): consecutive
    * event pairs per user, counts + exact-ratio probabilities. One
    * user-keyed window, one tiny-matrix aggregate.
    */
  private def q119(s: SparkSession, dir: String): DataFrame =
    Analytics.transitionMatrix(t(s, dir, "events"), "user_id", "event_id",
        "event_type")
      .orderBy(col("from_type"), col("to_type"))

  private def markovOracle: String =
    """WITH p AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
      |      AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, count(*) AS n FROM p
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6)
      |    AS prob
      |FROM c ORDER BY from_type, to_type""".stripMargin

  /** Conversion lag ([[graft.operators.Analytics.conversionLag]]):
    * whole seconds from first `view` to the first strictly-later
    * `purchase` per user, summarized. Integer-seconds arithmetic end
    * to end.
    */
  private def q120(s: SparkSession, dir: String): DataFrame =
    Analytics.conversionLag(t(s, dir, "events"), "user_id", "ts",
      "event_type", "view", "purchase")

  private def convLagOracle: String =
    """WITH f AS (
      |  SELECT user_id, min(ts) AS t_from FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id,
      |    CAST(floor(epoch(min(e.ts))) AS BIGINT) -
      |      CAST(floor(epoch(f.t_from)) AS BIGINT) AS lag_s
      |  FROM events e JOIN f ON e.user_id = f.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > f.t_from
      |  GROUP BY e.user_id, f.t_from)
      |SELECT count(*) AS n_converted,
      |  round(avg(lag_s), 2) AS avg_s,
      |  min(lag_s) AS min_s, max(lag_s) AS max_s
      |FROM c""".stripMargin

  /** Per-source winsorization ([[graft.operators.Curation.winsorize]])
    * of `n_chars` at the [0.1, 0.9] discrete quantiles. The oracle
    * replays the cumulative-share boundary rule (percentile_disc
    * semantics) rather than trusting any engine's quantile builtin.
    */
  private def q121(s: SparkSession, dir: String): DataFrame =
    Curation.winsorize(docs(s, dir), "source", "n_chars",
        loP = 0.1, hiP = 0.9)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("score_lo"), col("score_hi"), col("n_chars_clipped"))
      .orderBy(col("doc_id"))

  private def winsorOracle: String =
    """WITH c AS (
      |  SELECT source, n_chars, count(*) AS cnt
      |  FROM documents GROUP BY 1, 2),
      |f AS (
      |  SELECT source, n_chars,
      |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
      |    sum(cnt) OVER (PARTITION BY source) AS frac
      |  FROM c),
      |b AS (
      |  SELECT source,
      |    min(CASE WHEN frac >= 0.1 THEN n_chars END) AS score_lo,
      |    min(CASE WHEN frac >= 0.9 THEN n_chars END) AS score_hi
      |  FROM f GROUP BY source)
      |SELECT d.doc_id, d.source, d.n_chars, b.score_lo, b.score_hi,
      |  least(greatest(d.n_chars, b.score_lo), b.score_hi)
      |    AS n_chars_clipped
      |FROM documents d JOIN b ON d.source = b.source
      |ORDER BY d.doc_id""".stripMargin

  /** Count–min sketch point estimates
    * ([[graft.operators.Analytics.cmsCounts]], 3×1024) for a fixed
    * probe list vs exact counts. The oracle rebuilds the probe items'
    * sketch CELLS from the same portable md5 hashes and takes the same
    * min — the sketch is gated cell-for-cell, and `overcount ≥ 0`
    * exhibits the one-sided error guarantee.
    */
  private val CmsProbes =
    Seq("the", "a", "table", "query", "spark", "value", "zzz_absent")

  private def q122(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    Analytics.cmsCounts(toks, "token", CmsProbes, depth = 3, width = 1024)
      .orderBy(col("item"))
  }

  private def cmsOracle: String =
    s"""WITH tk AS (
       |  SELECT unnest(list_filter(
       |    string_split_regex(lower(trim(text)), '\\s+'),
       |    t -> len(t) > 0)) AS token
       |  FROM documents),
       |probe AS (SELECT unnest([${CmsProbes.map("'" + _ + "'").mkString(", ")}]) AS item),
       |d AS (SELECT unnest([0, 1, 2]) AS d),
       |pc AS (
       |  SELECT d.d, p.item,
       |    CAST(('0x' || substr(md5('cms' || d.d || ':' || p.item), 1, 8))
       |      AS BIGINT) % 1024 AS cell
       |  FROM probe p, d),
       |tc AS (
       |  SELECT d.d,
       |    CAST(('0x' || substr(md5('cms' || d.d || ':' || token), 1, 8))
       |      AS BIGINT) % 1024 AS cell,
       |    count(*) AS n
       |  FROM tk, d GROUP BY 1, 2),
       |est AS (
       |  SELECT pc.item, min(coalesce(tc.n, 0)) AS est
       |  FROM pc LEFT JOIN tc ON pc.d = tc.d AND pc.cell = tc.cell
       |  GROUP BY pc.item),
       |ex AS (SELECT token AS item, count(*) AS exact_n FROM tk
       |       WHERE token IN (${CmsProbes.map("'" + _ + "'").mkString(", ")})
       |       GROUP BY token)
       |SELECT e.item, CAST(e.est AS BIGINT) AS est,
       |  CAST(coalesce(ex.exact_n, 0) AS BIGINT) AS exact_n,
       |  CAST(e.est AS BIGINT) - CAST(coalesce(ex.exact_n, 0) AS BIGINT)
       |    AS overcount
       |FROM est e LEFT JOIN ex ON e.item = ex.item
       |ORDER BY e.item""".stripMargin

  /** Hourly gap fill with forward fill
    * ([[graft.operators.Analytics.gapFillHourly]]) rolled up per user:
    * how dense is each user's hourly grid and what do the carried
    * values sum to. All integer-cents arithmetic; the oracle rebuilds
    * the grid with generate_series and replays the
    * last-value-ignore-nulls fill.
    */
  private def q123(s: SparkSession, dir: String): DataFrame =
    Analytics.gapFillHourly(t(s, dir, "events"), "user_id", "ts", "value")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("observed"), 1L).otherwise(0L)).as("n_observed"),
        sum(when(!col("observed"), 1L).otherwise(0L)).as("n_filled"),
        sum(col("filled_cents")).as("filled_sum_cents"))
      .orderBy(col("user_id"))

  private def gapFillOracle: String =
    """WITH h AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2),
      |sp AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
      |       FROM h GROUP BY user_id),
      |grid AS (
      |  SELECT sp.user_id, unnest(generate_series(sp.h0, sp.h1,
      |    INTERVAL 1 HOUR)) AS hour
      |  FROM sp),
      |f AS (
      |  SELECT g.user_id, g.hour, h.cents,
      |    h.cents IS NOT NULL AS observed,
      |    last_value(h.cents IGNORE NULLS) OVER (
      |      PARTITION BY g.user_id ORDER BY g.hour
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
      |  FROM grid g LEFT JOIN h ON g.user_id = h.user_id AND g.hour = h.hour)
      |SELECT user_id, count(*) AS n_hours,
      |  CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_observed,
      |  CAST(sum(CASE WHEN NOT observed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_filled,
      |  CAST(sum(filled_cents) AS BIGINT) AS filled_sum_cents
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Key-skew report ([[graft.operators.Scale.skewReport]]) over the
    * lineitem supplier key: hottest keys, shares, skew ratio, and the
    * per-key salt suggestion that feeds saltedJoin/saltedAggregate.
    */
  private def q124(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.skewReport(t(s, dir, "lineitem"),
      Seq("l_suppkey"), topK = 10)

  private def skewOracle: String =
    """WITH c AS (
      |  SELECT CAST(l_suppkey AS VARCHAR) AS key, count(*) AS cnt
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
      |        max(cnt) AS max_cnt FROM c)
      |SELECT c.key, c.cnt,
      |  round(CAST(c.cnt AS DOUBLE) / t.n_rows, 6) AS share,
      |  t.n_keys, t.n_rows,
      |  round(CAST(t.max_cnt AS DOUBLE) * t.n_keys / t.n_rows, 3)
      |    AS skew_ratio,
      |  CAST(ceil(CAST(c.cnt AS DOUBLE) * t.n_keys / t.n_rows) AS INT)
      |    AS suggested_salt
      |FROM c, t ORDER BY c.cnt DESC, c.key LIMIT 10""".stripMargin

  /** Per-source equi-depth histogram
    * ([[graft.operators.Scale.equiDepthHistogram]]): decile boundaries
    * of `n_chars` per source — the stats-collection primitive. Oracle
    * replays the cumulative-share boundary rule over the same
    * distinct-score counts.
    */
  private def q125(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.equiDepthHistogram(docs(s, dir), "source",
        "n_chars", buckets = 10)
      .orderBy(col("source"), col("bucket"))

  private def eqDepthOracle: String =
    """WITH c AS (
      |  SELECT source, n_chars, count(*) AS cnt
      |  FROM documents GROUP BY 1, 2),
      |f AS (
      |  SELECT source, n_chars,
      |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
      |    sum(cnt) OVER (PARTITION BY source) AS frac
      |  FROM c),
      |b AS (SELECT unnest(generate_series(1, 10)) AS bucket)
      |SELECT f.source, CAST(b.bucket AS INT) AS bucket,
      |  min(CASE WHEN f.frac >= b.bucket / 10.0 THEN f.n_chars END)
      |    AS upper_bound
      |FROM f, b GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin

  /** Deterministic synchronous label propagation
    * ([[graft.operators.Analytics.labelPropagation]], 3 rounds) over
    * the undirected nation trade graph. The oracle unrolls the same
    * three argmax rounds as chained CTEs — weighted votes, ties to the
    * smallest label — so every intermediate assignment is gated.
    */
  private def q126(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val cst = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    val edges = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(cst, o("o_custkey") === cst("c_custkey"))
      .join(nat.select(col("n_nationkey").as("__cnk"), col("n_name").as("src")),
        cst("c_nationkey") === col("__cnk"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nat.select(col("n_nationkey").as("__snk"), col("n_name").as("dst")),
        sup("s_nationkey") === col("__snk"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    Analytics.labelPropagation(edges, "src", "dst", "w", iterations = 3)
      .orderBy(col("node"))
  }

  private def labelPropOracle: String = {
    def round(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT node, label FROM (
         |    SELECT e.a AS node, l.label,
         |      row_number() OVER (PARTITION BY e.a
         |        ORDER BY sum(e.w) DESC, l.label) AS rn
         |    FROM und e JOIN $prev l ON e.b = l.node
         |    GROUP BY e.a, l.label)
         |  WHERE rn = 1)""".stripMargin
    s"""WITH edges AS (
       |  SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |  GROUP BY 1, 2),
       |und AS (
       |  SELECT a, b, CAST(sum(w) AS BIGINT) AS w FROM (
       |    SELECT src AS a, dst AS b, w FROM edges WHERE src <> dst
       |    UNION ALL
       |    SELECT dst, src, w FROM edges WHERE src <> dst)
       |  GROUP BY a, b),
       |l0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
       |${round("l0", "l1")},
       |${round("l1", "l2")},
       |${round("l2", "l3")}
       |SELECT node, label FROM l3 ORDER BY node""".stripMargin
  }

  /** Hard-negative mining ([[graft.operators.Similarity.hardNegatives]]):
    * per query (vec_id < 5), the 3 most-cosine-similar corpus vectors
    * excluding the labeled positive (vec_id = qid + 100). Broadcast
    * queries, map-side scoring, WindowGroupLimit top-k; the oracle
    * restates the identical cosine + anti-join + rank.
    */
  private def q127(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 5)
    val positives = queries.select(col("qid"),
      (col("qid") + 100L).as("vec_id"))
    Similarity.hardNegatives(corpus, "vec_id", "embedding",
        queries, "qid", "embedding", positives, k = 3)
      .orderBy(col("qid"), col("rank"))
  }

  private def hardNegOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      |s AS (
      |  SELECT q.qid, c.vec_id,
      |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |      CAST(q.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM c, q WHERE c.vec_id <> q.qid + 100),
      |r AS (
      |  SELECT qid, vec_id, cosine,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY cosine DESC, vec_id) AS rank
      |  FROM s)
      |SELECT qid, vec_id, cosine, CAST(rank AS INT) AS rank
      |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** CCNet head/middle/tail corpus split (Wenzek et al. 2020): score
    * every document with the reference-fitted bigram LM (q82's model,
    * memoized per session), then tercile each LANGUAGE by perplexity —
    * head = the third that reads most like the reference. The split
    * CCNet-style pipelines publish as their quality tiers, here as one
    * ntile window over per-language rounded perplexities. The oracle
    * refits the LM and replays the tiering end to end.
    */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val lm = Curation.memoModel(s, s"$dir#lm-mod10")(
      Curation.fitBigramLm(d.filter(col("doc_id") % 10 === 0), "text"))
    val scored = Curation.perplexity(d, "doc_id", "text", lm)
      .select(col("doc_id"), round(col("ppl"), 4).as("ppl"))
      .join(d.select(col("doc_id"), col("lang"), col("n_chars")), Seq("doc_id"))
    val w = Window.partitionBy(col("lang")).orderBy(col("ppl"), col("doc_id"))
    scored.withColumn("__b", ntile(3).over(w))
      .withColumn("tier",
        when(col("__b") === 1, "head").when(col("__b") === 2, "middle")
          .otherwise("tail"))
      .groupBy(col("lang"), col("tier"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("ppl")).as("min_ppl"), max(col("ppl")).as("max_ppl"))
      .orderBy(col("lang"), col("tier"))
  }

  private def ccnetOracle: String =
    """WITH tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |    t -> len(t) > 0) AS tk
      |  FROM documents),
      |ref AS (SELECT tk FROM tk WHERE doc_id % 10 = 0),
      |uni AS (SELECT w, count(*) AS c
      |        FROM (SELECT unnest(tk) AS w FROM ref) GROUP BY w),
      |v AS (SELECT count(*) AS v FROM uni),
      |big AS (
      |  SELECT tk[i] AS w1, tk[i+1] AS w2, count(*) AS c
      |  FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i
      |        FROM ref WHERE len(tk) >= 2)
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
      |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-1)) AS i
      |        FROM tk WHERE len(tk) >= 2)),
      |scored AS (
      |  SELECT p.doc_id, count(*) AS n_bigrams,
      |    CAST(sum(CAST(round(ln((coalesce(b.c, 0) + 1.0) /
      |      (coalesce(u.c, 0) + v.v)) * 1000000) AS BIGINT)) AS BIGINT) AS lp_sum
      |  FROM pairs p
      |  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
      |  LEFT JOIN uni u ON u.w = p.w1
      |  CROSS JOIN v
      |  GROUP BY p.doc_id),
      |ranked AS (
      |  SELECT s.doc_id,
      |    round(exp(-(CAST(lp_sum AS DOUBLE)/1000000.0)/n_bigrams), 4) AS ppl,
      |    d.lang, d.n_chars
      |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
      |nt AS (
      |  SELECT lang, n_chars, ppl,
      |    ntile(3) OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS b
      |  FROM ranked)
      |SELECT lang,
      |  CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(ppl) AS min_ppl, max(ppl) AS max_ppl
      |FROM nt GROUP BY 1, 2 ORDER BY lang, tier""".stripMargin

  /** Data-quality expectations report
    * ([[graft.operators.Guards.qualityReport]]) over `orders`: four
    * row predicates folded into ONE scan aggregate, two uniqueness
    * checks, one FK check against `customer` — a mix of passing and
    * deliberately-violated expectations so both zero and non-zero
    * counts are gated.
    */
  private def q129(s: SparkSession, dir: String): DataFrame =
    graft.operators.Guards.qualityReport(t(s, dir, "orders"),
      checks = Seq(
        "totalprice_positive" -> (col("o_totalprice") > 0),
        "orderdate_present" -> col("o_orderdate").isNotNull,
        "status_in_domain" -> col("o_orderstatus").isin("F", "O", "P"),
        "price_under_250k" -> (col("o_totalprice") <= 250000)),
      uniqueKeys = Seq(
        "orderkey_unique" -> Seq("o_orderkey"),
        "custkey_unique" -> Seq("o_custkey")),
      foreignKeys = Seq(
        ("custkey_fk_customer", "o_custkey", t(s, dir, "customer"), "c_custkey")))
      .orderBy(col("check_name"))

  private def dataQualityOracle: String =
    """SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations FROM (
      |  SELECT 'totalprice_positive' AS check_name,
      |    sum(CASE WHEN NOT coalesce(o_totalprice > 0, false)
      |        THEN 1 ELSE 0 END) AS n_violations FROM orders
      |  UNION ALL
      |  SELECT 'orderdate_present',
      |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'status_in_domain',
      |    sum(CASE WHEN NOT coalesce(o_orderstatus IN ('F', 'O', 'P'), false)
      |        THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'price_under_250k',
      |    sum(CASE WHEN NOT coalesce(o_totalprice <= 250000, false)
      |        THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'orderkey_unique',
      |    count(*) - count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL
      |  SELECT 'custkey_unique',
      |    count(*) - count(DISTINCT o_custkey) FROM orders
      |  UNION ALL
      |  SELECT 'custkey_fk_customer', count(*) FROM orders o
      |  WHERE o.o_custkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM customer c
      |                    WHERE c.c_custkey = o.o_custkey)
      |) ORDER BY check_name""".stripMargin

  /** CMS join-size estimation
    * ([[graft.operators.Analytics.cmsJoinSizeEstimate]]): the
    * lineitem self-join size on `l_partkey` (= Σ_k f(k)² — the
    * frequency-weighted quantity a distinct count cannot see)
    * estimated from two 3×1024 sketches vs the actual join count.
    * The oracle rebuilds both sketches' cells and replays the
    * min-over-depths inner product.
    */
  private def q130(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    Analytics.cmsJoinSizeEstimate(li, "l_partkey", li, "l_partkey",
      depth = 3, width = 1024)
  }

  private def joinEstOracle: String =
    """WITH ka AS (
      |  SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
      |  WHERE l_partkey IS NOT NULL),
      |d AS (SELECT unnest([0, 1, 2]) AS d),
      |ca AS (
      |  SELECT d.d,
      |    CAST(('0x' || substr(md5('cms' || d.d || ':' || k), 1, 8))
      |      AS BIGINT) % 1024 AS cell,
      |    count(*) AS n
      |  FROM ka, d GROUP BY 1, 2),
      |ip AS (SELECT a.d, sum(a.n * b.n) AS s
      |       FROM ca a JOIN ca b ON a.d = b.d AND a.cell = b.cell
      |       GROUP BY a.d),
      |est AS (SELECT min(s) AS est FROM ip),
      |g AS (SELECT k, count(*) AS n FROM ka GROUP BY k),
      |ex AS (SELECT sum(a.n * b.n) AS exact_n
      |       FROM g a JOIN g b ON a.k = b.k)
      |SELECT CAST(est.est AS BIGINT) AS est,
      |  CAST(ex.exact_n AS BIGINT) AS exact_n,
      |  CAST(est.est - ex.exact_n AS BIGINT) AS overcount
      |FROM est, ex""".stripMargin

  /** Population-stability-index drift report between the even- and
    * odd-orderkey halves of `orders`, binned on `o_totalprice`
    * (50k-wide bins, Laplace-smoothed shares). Per-bin `psi_term`
    * rows — the q108 discipline: every emitted value is per-row
    * arithmetic over integer counts, so no cross-bin float summation
    * can diverge between engines (callers sum the terms for the
    * headline PSI).
    */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("bin", floor(col("o_totalprice") / 50000).cast("int"))
    val a = o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .groupBy(col("bin")).agg(count(lit(1)).as("n_a"))
    val b = o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .groupBy(col("bin")).agg(count(lit(1)).as("n_b"))
    val bins = a.join(b, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = bins.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"),
      count(lit(1)).as("__k"))
    bins.crossJoin(broadcast(totals))
      .withColumn("p_a",
        (col("n_a") + 1).cast("double") / (col("__ta") + col("__k")))
      .withColumn("p_b",
        (col("n_b") + 1).cast("double") / (col("__tb") + col("__k")))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(col("p_a"), 8).as("p_a"), round(col("p_b"), 8).as("p_b"),
        round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")), 9)
          .as("psi_term"))
      .orderBy(col("bin"))
  }

  private def psiOracle: String =
    """WITH o AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice / 50000) AS INT) AS bin
      |  FROM orders),
      |a AS (SELECT bin, count(*) AS n_a FROM o WHERE o_orderkey % 2 = 0
      |      GROUP BY bin),
      |b AS (SELECT bin, count(*) AS n_b FROM o WHERE o_orderkey % 2 = 1
      |      GROUP BY bin),
      |j AS (
      |  SELECT coalesce(a.bin, b.bin) AS bin,
      |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
      |  FROM a FULL OUTER JOIN b ON a.bin = b.bin),
      |t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS k FROM j),
      |p AS (
      |  SELECT bin, n_a, n_b,
      |    CAST(n_a + 1 AS DOUBLE) / (t.ta + t.k) AS pa,
      |    CAST(n_b + 1 AS DOUBLE) / (t.tb + t.k) AS pb
      |  FROM j, t)
      |SELECT bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  round(pa, 8) AS p_a, round(pb, 8) AS p_b,
      |  round((pa - pb) * ln(pa / pb), 9) AS psi_term
      |FROM p ORDER BY bin""".stripMargin

  /** Time-in-state ledger ([[graft.operators.Analytics.timeInState]]):
    * per event type, total whole-second dwell until each user's next
    * event. One lead window + one tiny aggregate; integer seconds.
    */
  private def q132(s: SparkSession, dir: String): DataFrame =
    Analytics.timeInState(t(s, dir, "events"), "user_id", "ts", "event_type")
      .orderBy(col("state"))

  private def timeInStateOracle: String =
    """WITH sp AS (
      |  SELECT event_type AS state,
      |    CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) -
      |      CAST(floor(epoch(ts)) AS BIGINT) AS dwell_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
      |SELECT state, count(*) AS n_spells,
      |  CAST(sum(dwell_s) AS BIGINT) AS total_s,
      |  max(dwell_s) AS max_spell_s
      |FROM sp WHERE dwell_s IS NOT NULL
      |GROUP BY state ORDER BY state""".stripMargin

  /** Robust per-source location/dispersion
    * ([[graft.operators.Curation.medianMad]]): percentile_disc median
    * and MAD of `n_chars`, both from distinct-value count tables —
    * every statistic is an actual data value, replayed exactly by the
    * oracle's cumulative-share rule applied twice.
    */
  private def q133(s: SparkSession, dir: String): DataFrame =
    Curation.medianMad(docs(s, dir), "source", "n_chars")
      .orderBy(col("source"))

  private def madOracle: String =
    """WITH c AS (
      |  SELECT source, n_chars, count(*) AS cnt
      |  FROM documents GROUP BY 1, 2),
      |f AS (
      |  SELECT source, n_chars,
      |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
      |    sum(cnt) OVER (PARTITION BY source) AS frac
      |  FROM c),
      |med AS (
      |  SELECT source, min(CASE WHEN frac >= 0.5 THEN n_chars END) AS median
      |  FROM f GROUP BY source),
      |d AS (
      |  SELECT doc.source, abs(doc.n_chars - med.median) AS dev
      |  FROM documents doc JOIN med ON doc.source = med.source),
      |dc AS (SELECT source, dev, count(*) AS cnt FROM d GROUP BY 1, 2),
      |df2 AS (
      |  SELECT source, dev,
      |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY dev
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
      |    sum(cnt) OVER (PARTITION BY source) AS frac
      |  FROM dc),
      |mad AS (
      |  SELECT source, min(CASE WHEN frac >= 0.5 THEN dev END) AS mad
      |  FROM df2 GROUP BY source)
      |SELECT med.source, med.median, mad.mad
      |FROM med JOIN mad ON med.source = mad.source
      |ORDER BY med.source""".stripMargin

  /** Dedup-class-aware train/val/test split: the leakage-proof
    * composition of the dedup family with [[graft.operators.TextOps.groupAwareSplit]]
    * — the split GROUP is the near-dup CLASS (singletons group by
    * their own id), so near-copies can never land on opposite sides
    * of a train/eval boundary (splitting by raw source or row hash
    * cannot guarantee that). The oracle rebuilds the classes with the
    * recursive-CC CTE and replays the md5 ladder.
    */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    val classed = docs(s, dir)
      .join(docDedupClasses(s, dir).select(col("doc_id"), col("dup_class")),
        Seq("doc_id"), "left")
      .withColumn("split_key",
        coalesce(col("dup_class"), col("doc_id")).cast("string"))
    TextOps.groupAwareSplit(classed, "split_key",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "dsplit")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split_key")).as("n_groups"))
      .orderBy(col("split"))
  }

  private def dedupSplitOracle: String =
    s"""WITH RECURSIVE $ShingleJaccardCte,
       |pairs AS (SELECT id_a, id_b FROM jacc WHERE jaccard >= 0.3),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |reach AS (SELECT s AS node, d AS r FROM edges
       |          UNION
       |          SELECT rc.node, e.d AS r FROM reach rc JOIN edges e ON rc.r = e.s),
       |labels AS (SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node),
       |keyed AS (
       |  SELECT d.doc_id,
       |    CAST(coalesce(l.comp, d.doc_id) AS VARCHAR) AS split_key
       |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.node),
       |assigned AS (
       |  SELECT doc_id, split_key,
       |    CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (SELECT doc_id, split_key,
       |          CAST(('0x' || substr(md5('dsplit:' || split_key), 1, 8))
       |            AS BIGINT) / 4294967296.0 AS u
       |        FROM keyed))
       |SELECT split, count(*) AS n_docs,
       |  count(DISTINCT split_key) AS n_groups
       |FROM assigned GROUP BY split ORDER BY split""".stripMargin

  /** N-gram novelty score vs the reference slice (doc_id ≡ 0 mod 10):
    * the fraction of a document's distinct word 3-grams never seen in
    * the reference — decontamination's scoring twin (a filter drops,
    * novelty RANKS: near-0 = boilerplate/duplication, near-1 =
    * genuinely new text worth keeping). One distinct-gram explode +
    * one anti-join against the reference gram set.
    */
  private def q135(s: SparkSession, dir: String): DataFrame = {
    val grams = docs(s, dir).select(col("doc_id"),
        explode(array_distinct(Curation.wordNgrams(col("text"), 3))).as("g"))
    val ref = grams.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("g")).distinct()
    val tr = grams.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val counts = tr.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val novel = tr.join(ref, Seq("g"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    counts.join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 6))
      .orderBy(col("doc_id"))
  }

  private def noveltyOracle: String =
    """WITH tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |    t -> len(t) > 0) AS tk
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(tk) - 2),
      |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS g
      |  FROM tk WHERE len(tk) >= 3),
      |ref AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 0),
      |tr AS (SELECT doc_id, g FROM g WHERE doc_id % 10 <> 0),
      |c AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY 1),
      |nv AS (
      |  SELECT t.doc_id, count(*) AS n_novel
      |  FROM tr t LEFT JOIN ref r ON t.g = r.g
      |  WHERE r.g IS NULL GROUP BY 1)
      |SELECT c.doc_id, c.n_grams,
      |  CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
      |  round(CAST(coalesce(nv.n_novel, 0) AS DOUBLE) / c.n_grams, 6)
      |    AS novelty
      |FROM c LEFT JOIN nv ON c.doc_id = nv.doc_id
      |ORDER BY c.doc_id""".stripMargin

  /** Balanced source interleave for training order: rank each source's
    * documents by the portable shuffle hash, then order globally by
    * (rank, source) — consecutive training rows rotate through sources
    * instead of clumping (the "shuffled but balanced" curriculum
    * ordering), fully deterministic and append-stable per source.
    * First 60 positions gated. Global positions come from
    * [[graft.operators.Scale.globalRowNumber]] (rank-count table +
    * bucketed prefix sums + a per-rank tie window of ≤ one row per
    * source), never a single-partition window — and the gate
    * pre-filters to `rank_in_source <= 60`, which provably contains
    * the global top 60 (a row ranked 61st within its source has 60
    * same-source rows ahead of it). At full scale the materialized
    * training order skips positions entirely:
    * `repartitionByRange(rank_in_source, source) +
    * sortWithinPartitions` (the q70 writeShuffled discipline).
    */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(TextOps.portableHash(col("doc_id"), "interleave"), col("doc_id"))
    // tiny (≤ 60 × #sources rows) — materialize once so the position
    // count-table pass and the join-back don't re-run the rank window
    val top = docs(s, dir)
      .withColumn("rank_in_source", row_number().over(w))
      .filter(col("rank_in_source") <= 60)
      .localCheckpoint(false)
    Scale.globalRowNumber(top, "rank_in_source", Seq("source", "doc_id"),
        outCol = "pos")
      .withColumn("pos", col("pos").cast("int"))
      .filter(col("pos") <= 60)
      .select(col("pos"), col("doc_id"), col("source"), col("rank_in_source"))
      .orderBy(col("pos"))
  }

  private def interleaveOracle: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY CAST(('0x' || substr(md5('interleave:' || doc_id), 1, 8))
      |        AS BIGINT), doc_id) AS rank_in_source
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, source, rank_in_source,
      |    row_number() OVER (ORDER BY rank_in_source, source, doc_id) AS pos
      |  FROM r)
      |SELECT CAST(pos AS INT) AS pos, doc_id, source,
      |  CAST(rank_in_source AS INT) AS rank_in_source
      |FROM p WHERE pos <= 60 ORDER BY pos""".stripMargin

  /** Top 3-step user paths: consecutive event-type triples per user,
    * counted and ranked — [[graft.operators.Analytics.transitionMatrix]]
    * extended one hop (the "how do users actually move" report). One
    * user-keyed window (two leads share it), one tiny aggregate.
    */
  private def q137(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    t(s, dir, "events")
      .withColumn("__s2", lead(col("event_type"), 1).over(w))
      .withColumn("__s3", lead(col("event_type"), 2).over(w))
      .filter(col("__s2").isNotNull && col("__s3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("__s2").as("step2"),
        col("__s3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("step1"), col("step2"), col("step3"))
      .limit(15)
  }

  private def pathsOracle: String =
    """WITH p AS (
      |  SELECT event_type AS step1,
      |    lead(event_type, 1) OVER w AS step2,
      |    lead(event_type, 2) OVER w AS step3
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
      |SELECT step1, step2, step3, count(*) AS n
      |FROM p WHERE step2 IS NOT NULL AND step3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, step1, step2, step3 LIMIT 15""".stripMargin

  /** RFM segmentation: per user recency (days since last event,
    * against the corpus max date so the gate is deterministic),
    * frequency (event count) and monetary (integer-cents sum), each
    * quintile-scored — the classic customer-value segmentation, all
    * integer arithmetic. Quintiles are TIE-COHERENT value deciles, not
    * ntile: score = min(5, (users strictly ahead)·5 div n + 1) per
    * DISTINCT metric value, so equal metric values always share a
    * score (ntile would split a tie group across quintiles by
    * arbitrary user order) and the whole computation runs on
    * distinct-value count tables via ONE [[graft.operators.Scale
    * .groupedPrefixSums]] pass over all three stacked metrics — no
    * per-user global window, which at real user cardinality is a
    * one-task sort. "Ahead" = smaller recency
    * (more recent), larger frequency, larger spend. Output: per
    * (r, f, m) score cell, user count and total cents.
    */
  private def q138(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    // ONE materialization of the per-user frame: the stacked quintile
    // count table and the final scoring both derive from it — without
    // the checkpoint the events groupBy would re-run per consumer
    val rfm0 = ev.groupBy(col("user_id"))
      .agg(max(col("ts").cast("long")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(round(col("value") * 100).cast("long")).as("monetary_cents"))
      .localCheckpoint(false)
    // one action does three things: materializes the checkpoint,
    // yields the recency anchor (corpus max ts = max of per-user
    // lasts — no separate events pass, no broadcast crossJoin), and
    // probes the per-metric spans fed to groupedPrefixSums as
    // precomputed ranges (skipping its internal min/max job)
    val mm = rfm0.agg(
      min(col("__last")), max(col("__last")),
      min(col("frequency")), max(col("frequency")),
      min(col("monetary_cents")), max(col("monetary_cents"))).head()
    if (mm.isNullAt(0)) { // empty corpus: schema-stable empty result
      return rfm0
        .withColumn("recency_days", lit(null).cast("long"))
        .withColumn("r_score", lit(null).cast("int"))
        .withColumn("f_score", lit(null).cast("int"))
        .withColumn("m_score", lit(null).cast("int"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("monetary_cents")).as("total_cents"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    }
    val t1 = mm.getLong(1)
    def days(last: Long): Long = ((t1 - last).toDouble / 86400L).toLong
    val rfm = rfm0.withColumn("recency_days",
      ((lit(t1) - col("__last")) / 86400L).cast("long"))
    val ranges = Seq(
      // recency flips the ordering: max __last → min days and v.v.
      ("r", days(mm.getLong(1)).toDouble, days(mm.getLong(0)).toDouble),
      ("f", mm.getLong(2).toDouble, mm.getLong(3).toDouble),
      ("m", mm.getLong(4).toDouble, mm.getLong(5).toDouble))
    // ONE long-format prefix-sums pass for all three quintile ladders:
    // stack (metric, value) rows and run Scale.groupedPrefixSums once —
    // one min/max action, one checkpoint, one bucket collect — instead
    // of three serial globalPrefixSums calls (3× the scheduler
    // overhead for identical results). "Ahead" flips per metric:
    // recency is better-ascending, frequency/monetary better-descending.
    val counts = rfm.select(explode(map(
        lit("r"), col("recency_days"),
        lit("f"), col("frequency"),
        lit("m"), col("monetary_cents"))).as(Seq("__metric", "__v")))
      .groupBy(col("__metric"), col("__v")).agg(count(lit(1)).as("__c"))
    val scored = Scale.groupedPrefixSums(counts, "__metric", "__v", Seq("__c"),
        ranges = ranges)
      .withColumn("__ahead",
        when(col("__metric") === "r", col("cum___c") - col("__c"))
          .otherwise(col("total___c") - col("cum___c")))
      .select(col("__metric"), col("__v"),
        least(lit(5L), call_function("div", col("__ahead") * 5,
          col("total___c")) + 1L).cast("int").as("__score"))
    // The score is MONOTONE in the value within each metric (ahead is
    // a prefix count), so the whole (value → score) mapping compresses
    // to at most 5 contiguous ranges per metric: collect each score's
    // minimum value (≤15 rows, metadata-sized at any corpus size) and
    // score the users with a map-side CASE ladder — zero joins back.
    val cuts = scored.groupBy(col("__metric"), col("__score"))
      .agg(min(col("__v")).as("__lo"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    def ladder(metric: String, v: Column): Column = {
      val ranges = cuts.filter(_._1 == metric).sortBy(_._3) // by range lo
      ranges.tail.foldLeft(lit(ranges.head._2)) { case (e, (_, s, lo)) =>
        when(v >= lo, s).otherwise(e) // outermost when = largest lo
      }
    }
    rfm
      .withColumn("r_score", ladder("r", col("recency_days")))
      .withColumn("f_score", ladder("f", col("frequency")))
      .withColumn("m_score", ladder("m", col("monetary_cents")))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("monetary_cents")).as("total_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** Exact ROC AUC ([[graft.operators.Analytics.aucScore]], the
    * Mann–Whitney rank-sum identity with average-rank tie handling)
    * of the first embedding component (rounded to 4, so real tie
    * groups exercise the tie path) as a predictor of label < 5. The
    * oracle replays the doubled-average-rank integer arithmetic.
    */
  private def q139(s: SparkSession, dir: String): DataFrame =
    Analytics.aucScore(
      t(s, dir, "embeddings")
        .select(round(element_at(col("embedding"), 1).cast("double"), 4)
            .as("score"),
          when(col("label") < 5, 1).otherwise(0).as("y")),
      "score", "y")

  private def aucOracle: String =
    """WITH s AS (
      |  SELECT round(CAST(embedding[1] AS DOUBLE), 4) AS score,
      |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
      |  FROM embeddings),
      |r AS (
      |  SELECT y,
      |    2 * rank() OVER (ORDER BY score) +
      |      count(*) OVER (PARTITION BY score) - 1 AS r2
      |  FROM s),
      |a AS (
      |  SELECT
      |    CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT) AS sum2,
      |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |    CAST(sum(CASE WHEN y <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      |  FROM r)
      |SELECT n_pos, n_neg,
      |  round((CAST(sum2 AS DOUBLE) / 2.0 -
      |    CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0) /
      |    (CAST(n_pos AS DOUBLE) * n_neg), 6) AS auc
      |FROM a""".stripMargin

  /** Calibration / reliability bins: TIE-COHERENT decile buckets of
    * the score — bin = min(10, (rows strictly below)·10 div n + 1)
    * per DISTINCT score, so equal scores always share a bin and the
    * bins derive from the distinct-score count table
    * ([[graft.operators.Scale.globalPrefixSums]] bucketed running
    * totals) instead of an ntile over every scored row (a
    * single-partition sort at corpus scale). Per-bin positives
    * fraction and score range — the companion report that says WHERE
    * a ranking score is trustworthy.
    */
  private def q140(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "embeddings")
      .select(round(element_at(col("embedding"), 1).cast("double"), 4).as("score"),
        when(col("label") < 5, 1L).otherwise(0L).as("y"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("__c"), sum(col("y")).as("__pos"))
    Scale.globalPrefixSums(counts, "score", Seq("__c"))
      .withColumn("bin",
        least(lit(10L), call_function("div",
          (col("cum___c") - col("__c")) * 10, col("total___c")) + 1L)
          .cast("int"))
      .groupBy(col("bin"))
      .agg(sum(col("__c")).as("n"), sum(col("__pos")).as("n_pos"),
        round(sum(col("__pos")).cast("double") / sum(col("__c")), 6).as("frac_pos"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
      .orderBy(col("bin"))
  }

  private def calibOracle: String =
    """WITH s AS (
      |  SELECT round(CAST(embedding[1] AS DOUBLE), 4) AS score,
      |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
      |  FROM embeddings),
      |c AS (
      |  SELECT score, count(*) AS c, sum(y) AS pos FROM s GROUP BY 1),
      |r AS (
      |  SELECT score, c, pos,
      |    coalesce(sum(c) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
      |    sum(c) OVER () AS n
      |  FROM c)
      |SELECT CAST(least(10, below * 10 // n + 1) AS INT) AS bin,
      |  CAST(sum(c) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
      |  round(CAST(sum(pos) AS DOUBLE) / sum(c), 6) AS frac_pos,
      |  min(score) AS min_score, max(score) AS max_score
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** Vocabulary growth curve (the Heaps'-law monitor): per source, the
    * distinct-token vocabulary after its 5th/10th/15th/20th/25th
    * document (doc_id order). Computed with the first-occurrence
    * trick — a token's contribution point is min(doc_id), so the
    * running distinct count is one aggregate + a checkpoint join, not
    * a growing-window count-distinct. A flattening curve says a
    * source's crawl has saturated; a linear one says keep crawling.
    */
  private def q141(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val first = d.select(col("source"), col("doc_id"),
        explode(array_distinct(filter(
          split(lower(trim(col("text"))), "\\s+"),
          t => length(t) > 0))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(min(col("doc_id")).as("first_doc"))
    val marks = d.select(col("source"), col("doc_id"))
      .withColumn("n_docs", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .filter(col("n_docs").isin(5, 10, 15, 20, 25))
    marks.join(first, Seq("source"))
      .filter(col("first_doc") <= col("doc_id"))
      .groupBy(col("source"), col("n_docs"))
      .agg(count(lit(1)).as("vocab"))
      .orderBy(col("source"), col("n_docs"))
  }

  private def vocabGrowthOracle: String =
    """WITH tk AS (
      |  SELECT source, doc_id, unnest(list_distinct(list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    t -> len(t) > 0))) AS token
      |  FROM documents),
      |f AS (SELECT source, token, min(doc_id) AS first_doc
      |      FROM tk GROUP BY 1, 2),
      |m AS (
      |  SELECT source, doc_id, n_docs FROM (
      |    SELECT source, doc_id,
      |      row_number() OVER (PARTITION BY source ORDER BY doc_id) AS n_docs
      |    FROM documents)
      |  WHERE n_docs IN (5, 10, 15, 20, 25))
      |SELECT m.source, CAST(m.n_docs AS INT) AS n_docs,
      |  count(*) AS vocab
      |FROM m JOIN f ON m.source = f.source AND f.first_doc <= m.doc_id
      |GROUP BY 1, 2 ORDER BY m.source, n_docs""".stripMargin

  private def rfmOracle: String =
    """WITH a AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS t1
      |           FROM events),
      |u AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s,
      |    count(*) AS frequency,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS monetary_cents
      |  FROM events GROUP BY user_id),
      |s AS (
      |  SELECT u.user_id, u.frequency, u.monetary_cents,
      |    CAST((a.t1 - u.last_s) // 86400 AS BIGINT) AS recency_days
      |  FROM u, a),
      |n AS (SELECT count(*) AS n FROM s),
      |rq AS (
      |  SELECT v, CAST(least(5, (coalesce(sum(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) * 5
      |      // (SELECT n FROM n) + 1) AS INT) AS r_score
      |  FROM (SELECT recency_days AS v, count(*) AS c FROM s GROUP BY 1)),
      |fq AS (
      |  SELECT v, CAST(least(5, (coalesce(sum(c) OVER (ORDER BY v DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) * 5
      |      // (SELECT n FROM n) + 1) AS INT) AS f_score
      |  FROM (SELECT frequency AS v, count(*) AS c FROM s GROUP BY 1)),
      |mq AS (
      |  SELECT v, CAST(least(5, (coalesce(sum(c) OVER (ORDER BY v DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) * 5
      |      // (SELECT n FROM n) + 1) AS INT) AS m_score
      |  FROM (SELECT monetary_cents AS v, count(*) AS c FROM s GROUP BY 1)),
      |sc AS (
      |  SELECT rq.r_score, fq.f_score, mq.m_score, s.monetary_cents
      |  FROM s
      |  JOIN rq ON s.recency_days = rq.v
      |  JOIN fq ON s.frequency = fq.v
      |  JOIN mq ON s.monetary_cents = mq.v)
      |SELECT r_score, f_score, m_score,
      |  count(*) AS n_users, CAST(sum(monetary_cents) AS BIGINT) AS total_cents
      |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** J5 — true as-of join via the custom sort-merge operator
    * ([[graft.plans.AsOf]]: logical node → strategy → exec, one hash
    * exchange + sort per side, streaming O(1)-state merge). Each click
    * is joined to the user's most recent PRIOR error event. The oracle
    * is DuckDB's native ASOF LEFT JOIN — an independent engine's
    * implementation of the same semantics, so a hash match grades the
    * whole operator (backward inclusive match, per-key discipline,
    * unmatched-left null fill) against a reference implementation.
    */
  private def q62(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), round(col("value"), 2).as("click_value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("event_id").as("prior_error_id"),
        round(col("value"), 2).as("prior_error_value"))
    graft.plans.AsOf.join(clicks, errors, "event_id", "prior_error_id",
        Seq("user_id"), Seq("err_user"), joinType = "left")
      .select(col("user_id"), col("event_id"), col("click_value"),
        col("prior_error_id"), col("prior_error_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** J5 — bucketed range join ([[graft.operators.Scale.rangeJoin]]):
    * each click against every signup window `[signup_id, signup_id +
    * 2000]` of the same user. Spark would plan the raw BETWEEN join as
    * a nested loop; the operator decomposes it into an equi-join on
    * (user, fixed-width bucket) with an exact post-filter — each pair
    * meets in exactly one bucket, so no dedup pass. The oracle is the
    * plain inequality join in DuckDB (small enough there), so the hash
    * match proves the decomposition loses and invents nothing.
    */
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        round(col("value"), 2).as("click_value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"),
        (col("event_id") + 2000L).as("signup_hi"))
    graft.operators.Scale.rangeJoin(clicks, "click_id",
        signups, "signup_id", "signup_hi",
        Seq("user_id"), Seq("s_user"), bucketWidth = 2000L)
      .select(col("user_id"), col("click_id"), col("signup_id"), col("click_value"))
      .orderBy(col("user_id"), col("click_id"), col("signup_id"))
  }

  /** Training-data decontamination — cross-corpus near-duplicate
    * detection ([[graft.operators.Dedup.crossCorpusNearDuplicates]]):
    * even doc_ids play the training corpus, odd the held-out eval set;
    * any training document near-duplicating an eval document is
    * contamination. The oracle recomputes EVERY crossing pair's
    * shingle Jaccard by brute force in DuckDB, so a hash match proves
    * the shared-bucket LSH join found every true contamination pair
    * (the corpus's planted pairs sit at J ≥ 0.9; the next crossing
    * pair is < 0.35 — far below the banding's recall knee).
    */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.crossCorpusNearDuplicates(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", minJaccard = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Sequence packing ([[graft.operators.TextOps.packSequences]]):
    * concat-then-chunk training-bin assignment under a fixed token
    * budget. The engine runs the two-pass sharded decomposition (range
    * repartition → per-shard window → broadcast base offsets); the
    * oracle restates the SEMANTICS as one global window (fine at
    * DuckDB scale), so a hash match proves the decomposition equals
    * the global-order definition document for document.
    */
  private def q65(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps.packSequences(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", tokenBudget = 2048L)
      .select(col("doc_id"), col("n_tokens"), col("bin"))
      .orderBy(col("doc_id"))

  /** Deterministic stratified sampling
    * ([[graft.operators.TextOps.stratifiedSample]]): hash-of-id
    * selection, reproducible under any partitioning (unlike
    * rand/sampleBy, which draw in row order). Selected SETS are
    * hash-function-specific, so (like q43/q59) each engine asserts its
    * OWN achieved per-stratum fraction lands within tolerance of the
    * same targets; the gate compares the booleans.
    */
  private def q66(s: SparkSession, dir: String): DataFrame = {
    val targets = Seq("de" -> 0.4, "en" -> 0.5, "es" -> 0.3,
      "fr" -> 0.2, "zh" -> 0.6)
    val docs = t(s, dir, "documents")
    val sampled = graft.operators.TextOps.stratifiedSample(
      docs, "lang", "doc_id", targets.toMap)
    val totals = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val hits = sampled.groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
    val targetCol = element_at(
      map(targets.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
      col("lang"))
    totals.join(hits, Seq("lang"), "left")
      .select(col("lang"), targetCol.as("target"),
        (abs(coalesce(col("n_sampled"), lit(0L)).cast("double") / col("n_total")
          - targetCol) <= 0.15).as("within_tol"))
      .orderBy(col("lang"))
  }

  /** Exact n-gram decontamination
    * ([[graft.operators.Curation.ngramDecontaminate]]) — the GPT-3
    * style exact complement of q64's fuzzy MinHash decontamination:
    * train docs (even ids) sharing ≥3 distinct word 5-grams with an
    * eval doc (odd ids). One equi-join on the gram; the oracle builds
    * the same distinct 5-gram sets with DuckDB list functions and
    * joins them, so a hash match proves gram construction, distinct
    * semantics, and the pair counts all agree.
    */
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.Curation.ngramDecontaminate(
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        d.filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", n = 5, minShared = 3)
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** Gopher-style repetition metrics
    * ([[graft.operators.Curation.repetitionMetrics]]): duplicate-word
    * fraction and top-bigram share per document, computed entirely
    * row-locally (the bigram mode is the longest run in the row's
    * SORTED bigram array — no explode/groupBy). The oracle computes
    * the bigram mode the relational way (unnest → group → max), so a
    * hash match proves the run-length shortcut equals the definition.
    */
  private def q68(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.repetitionMetrics(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** PII redaction ([[graft.operators.Curation.piiRedact]]): the
    * corpus text is salted with a synthetic email / IPv4 / phone per
    * row (both engines build the identical string), then counted and
    * redacted by the same regex chain. Patterns are chosen to behave
    * identically under Java regex (Spark) and RE2 (oracle).
    */
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val enriched = docs(s, dir).select(col("doc_id"),
      concat(
        substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or 10.0."),
        pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".7 call +1-555-"),
        (pmod(col("doc_id"), lit(9000)) + 1000).cast("string")).as("text"))
    graft.operators.Curation.piiRedact(enriched, "text")
      .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
        col("n_ips").cast("long").as("n_ips"),
        col("n_phones").cast("long").as("n_phones"), col("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic global shuffle order
    * ([[graft.operators.Curation.shuffleKey]]): training-order export
    * keyed by md5(seed:id) — a pure row property, reproducible on any
    * partitioning and stable under appends. The gate reads the first
    * 100 rows of the induced order (TakeOrderedAndProject — no global
    * sort); both engines compute the identical md5 hex.
    */
  private def q70(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.withShuffleKey(docs(s, dir), "doc_id", "seed42")
      .select(col("doc_id"), col("shuffle_key"))
      .orderBy(col("shuffle_key"))
      .limit(100)

  /** Int8-quantized brute-force ANN
    * ([[graft.operators.Curation.quantizedKnn]]): symmetric max-abs
    * quantization to [-127,127], then an EXACT integer dot product —
    * reproducible across engines and partition orders where float
    * summation is not. The oracle restates the quantization with the
    * same expression shape (`round(cast(x as double) * 127.0 / mx)`,
    * both engines round half away from zero) so the scores hash-match
    * exactly.
    */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    graft.operators.Curation.quantizedKnn(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", query, 10)
  }

  /** Bloom-pruned semi-join ([[graft.operators.Scale.bloomSemiPrune]]):
    * lineitem is map-side pre-filtered by a Bloom filter built over the
    * urgent orders' keys (the broadcast-a-sketch pattern for filter
    * sides too big to broadcast exactly), then the exact semi-join
    * removes the ~fpp false positives — so the result equals the plain
    * semi-join, which is exactly what the oracle states. A hash match
    * proves the bloom pass lost nothing.
    */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val hot = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = graft.operators.Scale.bloomSemiPrune(
      li, "l_orderkey", hot, "o_orderkey", expectedItems = 100000L)
    pruned.join(hot.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Two-stage quantized ANN
    * ([[graft.operators.Curation.quantizedKnnRerank]]): int8 candidate
    * generation (q71's machinery, 4× oversampled) → exact float cosine
    * re-rank of the 40 survivors. The oracle restates BOTH stages in
    * DuckDB (the quantized CTE inlined, then list_cosine_similarity on
    * the candidate set), so a hash match proves the exact top-10 of
    * the composition — candidate selection, re-rank order, and ties.
    */
  private def q73(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    graft.operators.Curation.quantizedKnnRerank(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", query, 10,
      candidateFactor = 4)
  }

  /** Domain-mixture resampling
    * ([[graft.operators.TextOps.mixtureResample]]): downsample a
    * multi-source corpus to target mixture proportions (50/30/20),
    * bounded by the scarcest stratum, rows selected by the PORTABLE
    * md5-prefix hash — so unlike q66's engine-specific xxhash64
    * sampling, the oracle recomputes the SAME selection in DuckDB and
    * the per-source sampled counts hash-match exactly.
    */
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val targets = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val d = docs(s, dir)
    val sampled = graft.operators.TextOps.mixtureResample(
      d, "source", "doc_id", targets)
    d.filter(col("source").isin(targets.keys.toSeq.map(lit): _*))
      .groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      .join(sampled.groupBy(col("source")).agg(count(lit(1)).as("n_sampled")),
        Seq("source"), "left")
      .select(col("source"), col("n_total"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy(col("source"))
  }

  /** Exact per-stratum deterministic sampling
    * ([[graft.operators.TextOps.samplePerStratum]]): exactly 7 docs
    * per language, selected by ranking on the portable md5-prefix
    * hash — the deterministic replacement for per-group reservoir
    * sampling. Both engines compute the identical hash ranking, so
    * the SELECTED IDS hash-match exactly; the plan is
    * WindowGroupLimit (PlanAudit), never a full partition sort.
    */
  private def q75(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps.samplePerStratum(
        docs(s, dir), "lang", "doc_id", k = 7, seed = "s75")
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))

  /** Unicode NFC normalization
    * ([[graft.functions.CatalystExpressions.NormalizeNfc]]): the
    * corpus text is salted with decomposed sequences (e + combining
    * acute, then ß which NFC must leave alone); both engines normalize
    * — JDK Normalizer vs utf8proc — and the strings + codepoint
    * lengths hash-match, proving canonical composition agrees.
    */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    // decomposed salt: e+COMBINING ACUTE, i+COMBINING DIAERESIS; NFC
    // composes both and must leave the sharp s alone
    val salted = concat(substring(col("text"), 1, 10),
      lit(" e\u0301 stra\u00dfe nai\u0308ve"))
    docs(s, dir).select(col("doc_id"),
        TF.normalizeText(salted).as("norm"))
      .withColumn("n_norm", length(col("norm")).cast("long"))
      .orderBy(col("doc_id"))
      .limit(50)
  }

  /** End-to-end training-data EXPORT pipeline — the exact-oracle
    * capstone composing six curation operators in their production
    * order: exact-dedup keep-list (md5 fingerprint, min-id winner) →
    * cross-corpus n-gram decontamination against a held-out eval
    * slice → PII redaction → token-length filter → domain-mixture
    * resampling (portable hash) → per-source document/token
    * accounting. Every stage is restated in the oracle's CTE chain,
    * so ONE hash compare proves the whole composition — the
    * exact-path twin of q60's near-dup curation pipeline.
    */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sampled = graft.operators.Curation.exportPipeline(
      train = d.filter(pmod(col("doc_id"), lit(7)) =!= 3),
      evalDocs = d.filter(pmod(col("doc_id"), lit(7)) === 3),
      idCol = "doc_id", textCol = "text", strataCol = "source",
      targets = Map("src0" -> 0.34, "src1" -> 0.33, "src2" -> 0.33))
    sampled.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
      // output is <= #strata rows by construction; the limit turns the
      // deterministic sort into TakeOrderedAndProject (no range-sample
      // job, no sort exchange)
      .orderBy(col("source"))
      .limit(3)
  }

  /** Similarity: the partition-pruned IVF probe — the 100 TB form of
    * q54. The corpus is written ONCE partitioned by cluster
    * (`Similarity.ensureIvfLayout`, memoized per session like the
    * corpus index) and the probe reads only the nProbe nearest
    * clusters' partition DIRECTORIES: the scan carries
    * `PartitionFilters` (PlanAudit locks it), so a query touches
    * ~nProbe/k of the corpus bytes instead of scanning everything and
    * filtering. Same index parameters as q54, so the same 5-of-8
    * probing is exact at gate scale — the oracle is the brute-force
    * top-10.
    */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val layoutPath = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_layout_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    Similarity.ensureIvfLayout(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      layoutPath, nCentroids = 8, fitSampleFraction = 0.5, fitOn = Some(emb))
    Similarity.knnIvfPartitioned(s, layoutPath, "vec_id", "embedding", query,
      k = 10, nProbe = 5)
  }

  /** Multimodal: REAL pixel decode — ImageIO-rendered PNGs (lossless,
    * so decoded pixels are exactly the rendered ones) through
    * [[graft.operators.Multimodal.imageStats]]; the oracle restates
    * each image's mean channel values as closed-form literals. JPEG
    * (lossy) takes the tolerance-based spec route instead
    * (SemanticSpec), never an exact oracle.
    */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val imgs = Seq(
      (1L, M.renderPng(16, 16, (_, _) => (200 << 16) | (50 << 8) | 25)),
      (2L, M.renderPng(8, 8, (_, _) => (128 << 8) | 255)),
      // left half pure red, right half pure blue: means (0.5, 0, 0.5)
      (3L, M.renderPng(4, 2, (x, _) => if (x < 2) 0xFF0000 else 0x0000FF))
    ).toDF("img_id", "content")
    M.imageStats(imgs)
      .select(col("img_id"), col("stats.width").as("width"),
        col("stats.height").as("height"),
        round(col("stats.avg_r"), 4).as("avg_r"),
        round(col("stats.avg_g"), 4).as("avg_g"),
        round(col("stats.avg_b"), 4).as("avg_b"))
      .orderBy(col("img_id"))
  }

  /** Search: BM25 lexical top-10 over the documents table — ONE
    * corpus-stats aggregate (N, avgdl, per-term df) broadcast as
    * literals, map-side scoring, TakeOrderedAndProject. The oracle
    * restates the full Okapi formula in SQL with the same stats CTE.
    */
  private def q80(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextOps.bm25Rank(t(s, dir, "documents"),
      "doc_id", "text", Seq("spark", "table", "hash"), k = 10)

  /** Search: hybrid retrieval — BM25 top-20 and embedding-cosine
    * top-20 (doc_id ≡ vec_id in the testdata), fused by
    * reciprocal-rank fusion (1/(60+rank)). Lexical and vector ranks
    * are each deterministic (score desc, id), so the fused list has
    * one exact oracle.
    */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    // ranks via the distinct-score count table (Scale.globalRowNumber),
    // not a global window: the inputs are already top-k-bounded, but
    // the suite's no-unpartitioned-window lock holds everywhere. Each
    // 20-row list is materialized once so the count-table pass and the
    // join-back don't re-run its scoring scan.
    val lex = Scale.globalRowNumber(
        graft.operators.TextOps.bm25Rank(
          t(s, dir, "documents").filter(col("doc_id") =!= 0),
          "doc_id", "text", Seq("spark", "table", "hash"), k = 20)
          .localCheckpoint(false),
        "score", Seq("doc_id"), ascending = false)
      .select(col("doc_id"), col("rank"))
    val vec = Scale.globalRowNumber(
        Similarity.knnBrute(emb.filter(col("vec_id") =!= 0),
          "vec_id", "embedding", query, k = 20)
          .localCheckpoint(false),
        "cosine", Seq("vec_id"), ascending = false)
      .select(col("vec_id").as("doc_id"), col("rank"))
    graft.operators.TextOps.rrfFuse(Seq(lex, vec), "doc_id", "rank",
      kRrf = 60, k = 10)
  }

  /** Curation: CCNet-style perplexity scoring — fit an add-one bigram
    * LM on a reference slice (doc_id % 10 == 0), score EVERY document
    * map-side (model rides in the expression, zero shuffles), report
    * the 20 highest-perplexity (junkiest) docs. The oracle refits the
    * identical integer-count model in SQL and reproduces the
    * integer-scaled log-prob sums exactly.
    */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val lm = Curation.memoModel(s, s"$dir#lm-mod10")(
      Curation.fitBigramLm(docs.filter(col("doc_id") % 10 === 0), "text"))
    Curation.perplexity(docs, "doc_id", "text", lm)
      .select(col("doc_id"), col("n_bigrams"), round(col("ppl"), 4).as("ppl"))
      .orderBy(desc("ppl"), col("doc_id"))
      .limit(20)
  }

  /** Curation: DSIR importance weighting — fit hashed-feature
    * importance ratios of a target slice (source = 'src0') against the
    * full corpus, score every document map-side, report the 20 docs
    * that look most like the target. The oracle refits the identical
    * md5-bucket model in SQL.
    */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = Curation.memoModel(s, s"$dir#dsir-src0")(
      Curation.fitDsir(docs.filter(col("source") === "src0"), docs, "text"))
    Curation.dsirScore(docs, "doc_id", "text", model)
      .select(col("doc_id"), col("n_features"),
        round(col("logw"), 6).as("logw"))
      .orderBy(desc("logw"), col("doc_id"))
      .limit(20)
  }

  /** Dedup: SemDeDup-style SEMANTIC dedup summary — the q53 contract
    * on the embedding side (q42's banded pairs → transitive classes →
    * keep-list). The oracle rebuilds the identical banded candidate
    * set (shared CTE with q42) and resolves components with the same
    * recursive CTE as q53's.
    */
  private def q84(s: SparkSession, dir: String): DataFrame =
    Dedup.semanticDedupCorpus(t(s, dir, "embeddings"), "vec_id", "embedding",
        minCosine = 0.2, nPlanes = 8, dim = 64, bands = 8)
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_kept"),
        countDistinct(col("dup_class")).as("n_dup_classes"))

  /** Curation capstone v2: the LM-perplexity junk gate (q82's model)
    * and the DSIR target-likeness gate (q83's model) composed as ONE
    * quality filter — the CCNet/DSIR combination a production corpus
    * pass runs (drop incoherent docs AND docs unlike the target
    * distribution), summarized per source. Both fits are small-side;
    * both scores are map-only; the filter compares UNROUNDED scores
    * (both engines reproduce the doubles exactly from the integer
    * sums). The oracle refits BOTH models in SQL.
    */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val docsDf = t(s, dir, "documents")
    // the same fits as q82/q83 — memoized per session, so the composed
    // gate refits nothing (fit-once/score-everywhere)
    val lm = Curation.memoModel(s, s"$dir#lm-mod10")(
      Curation.fitBigramLm(docsDf.filter(col("doc_id") % 10 === 0), "text"))
    val model = Curation.memoModel(s, s"$dir#dsir-src0")(
      Curation.fitDsir(docsDf.filter(col("source") === "src0"), docsDf, "text"))
    // both scores are map-only projections of the SAME scan — compose
    // them as Columns in one pass (Curation.pplCol/logwCol, the
    // expression twins of perplexity/dsirScore) instead of two
    // doc_id self-joins; the >=2-token filter reproduces the inner
    // joins' row set (ppl needs a bigram, dsir only a token)
    docsDf.select(col("source"), TF.tokens(col("text")).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col("source"),
        Curation.pplCol(col("__tk"), lm).as("ppl"),
        Curation.logwCol(col("__tk"), model).as("logw"))
      .filter(col("ppl") <= 36.0 && col("logw") >= -70.0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("ppl")), 4).as("avg_ppl"),
        round(avg(col("logw")), 4).as("avg_logw"))
      // bounded by #distinct sources; TakeOrdered, no range-sample job
      .orderBy(col("source"))
      .limit(1000)
  }

  /** SQL surface over the scalar kernels
    * ([[graft.sql.SqlFunctions]]): the reference's users query through
    * SQL only (`csv_tool.py:274-386`), so the engine's text-analysis
    * kernels must compose inside a gated SELECT the way DuckDB
    * functions do there. This runs `lang_id` / `estimate_tokens` /
    * `sentiment_score` / `quality_score` as registered session
    * functions through [[graft.sql.QueryGate]]; every function stays
    * the same codegen'd expression the Scala API uses, so the plan is
    * one scan + one aggregate. The oracle restates each formula in
    * DuckDB SQL (the q40/q55 discipline).
    */
  private def q142(s: SparkSession, dir: String): DataFrame = {
    Engine.open(s, dir)
    graft.sql.SqlFunctions.register(s)
    graft.sql.QueryGate.sql(s,
      """SELECT source, lang_id(text) AS lang_guess, count(*) AS n_docs,
        |  CAST(sum(estimate_tokens(text)) AS BIGINT) AS est_tokens,
        |  round(avg(sentiment_score(text)), 4) AS avg_sentiment,
        |  round(avg(quality_score(text)), 4) AS avg_quality
        |FROM documents
        |GROUP BY source, lang_id(text)
        |ORDER BY source, lang_guess""".stripMargin)
  }

  private def sqlFnOracle: String =
    """WITH s AS (
      |  SELECT source, text,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      t -> len(t) > 0) AS toks
      |  FROM documents),
      |f AS (
      |  SELECT source,
      |    len(list_filter(toks, t -> t IN ('der','die','das','und','ein','eine','ist','von','mit','für'))) AS h_de,
      |    len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','that','this','be'))) AS h_en,
      |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','un','una','por','con','para','es'))) AS h_es,
      |    len(list_filter(toks, t -> t IN ('le','la','de','et','un','une','pour','dans','est','que','au'))) AS h_fr,
      |    CAST(ceil(len(text) / 4.0) AS BIGINT) AS est,
      |    round((len(list_filter(toks, t -> t IN ('good','great','excellent','fast','happy','love','best','success','win','improve','easy','clean')))
      |        - len(list_filter(toks, t -> t IN ('bad','slow','terrible','fail','error','hate','worst','broken','bug','crash','hard','dirty')))) * 1.0
      |      / greatest(len(list_filter(toks, t -> t IN ('good','great','excellent','fast','happy','love','best','success','win','improve','easy','clean')))
      |        + len(list_filter(toks, t -> t IN ('bad','slow','terrible','fail','error','hate','worst','broken','bug','crash','hard','dirty'))), 1), 4) AS snt,
      |    round(
      |      least(len(toks) / 50.0, 1.0) * 0.4
      |      + least((CASE WHEN len(toks) = 0 THEN 0.0
      |          ELSE len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','that','this','be'))) * 1.0 / len(toks) END) * 4.0, 1.0) * 0.3
      |      + greatest(0.0, 1.0 - (CASE WHEN len(text) = 0 THEN 0.0
      |          ELSE len(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / len(text) END) * 5.0) * 0.3,
      |      4) AS qs
      |  FROM s),
      |g AS (
      |  SELECT source,
      |    CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
      |         WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
      |         WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
      |         WHEN h_es >= h_fr THEN 'es'
      |         ELSE 'fr' END AS lang_guess,
      |    est, snt, qs
      |  FROM f)
      |SELECT source, lang_guess, count(*) AS n_docs,
      |  CAST(sum(est) AS BIGINT) AS est_tokens,
      |  round(avg(snt), 4) AS avg_sentiment,
      |  round(avg(qs), 4) AS avg_quality
      |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** IVF-PQ ANN against a durable layout
    * ([[graft.operators.Similarity.ensureIvfPqLayout]] /
    * [[graft.operators.Similarity.knnIvfPqPartitioned]]): coarse IVF
    * clusters as partition directories + 8-byte PQ codes per vector,
    * probed as a partition-pruned scan whose ADC candidate pass reads
    * (vec_id, pq_codes) only, then an exact re-rank of the survivors.
    * The q54 discipline: the oracle is the exact brute-force top-10,
    * so the gate proves the two-stage probe RECOVERS the exact answer
    * at this corpus/parameter point — while the plan (PlanAudit) is
    * the 100 TB shape: nProbe/k of the directories × ~1/32 of the
    * candidate-pass bytes.
    */
  private def q143(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val layoutPath = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_layout_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    Similarity.ensureIvfPqLayout(emb.filter(col("vec_id") =!= 0), "vec_id",
      "embedding", layoutPath, nCentroids = 8, m = 8, ksub = 16,
      fitSampleFraction = 0.5, fitOn = Some(emb))
    Similarity.knnIvfPqPartitioned(s, layoutPath, "vec_id", "embedding", query,
      k = 10, nProbe = 5, candidateFactor = 24)
  }

  /** Unigram-tokenizer token budget
    * ([[graft.operators.Unigram.fitUnigram]] pieces feeding
    * [[graft.operators.TextOps.tokenBudgetSample]]'s bucketed
    * selection): fit a unigram LM on the corpus, account every
    * document in FITTED pieces, select each source's hash-order
    * prefix within its piece budget. The EM fit has no SQL oracle
    * (UnigramSpec walks the lattice by hand), so this gate follows
    * the q59 discipline: exactly-replayable whitespace counts plus
    * engine-asserted invariants the oracle states as literals — every
    * doc's piece count sits in [words, chars] (a correct segmentation
    * can't leave that band), the selected pieces fit the budget, and
    * the selection is maximal (the next doc in hash order would
    * overflow). A broken fit, encode or budget walk flips a boolean
    * and fails the hash compare.
    */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    val budgets = Map("src0" -> 4000L, "src1" -> 2000L, "src2" -> 900L)
    val d = docs(s, dir).filter(col("source").isin(budgets.keys.toSeq: _*))
    val model = Curation.memoModel(s, s"$dir#uni256")(
      graft.operators.Unigram.fitUnigram(d, "text", vocabSize = 256,
        maxPieceLen = 6))
    val sel = TextOps.tokenBudgetSample(d, "source", "doc_id", "text",
        budgets, seed = "uni",
        tokenCount = Some(graft.operators.Unigram.pieceCount(col("text"), model)))
      .select(col("doc_id"), col("n_tok").as("__sel_tok"))
    val budgetCol = element_at(
      map(budgets.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
      col("source"))
    val toks = TF.tokens(col("text"))
    val all = d
      .withColumn("__np",
        graft.operators.Unigram.pieceCount(col("text"), model).cast("long"))
      .withColumn("__w", TF.tokenCount(col("text")).cast("long"))
      .withColumn("__chars",
        aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
          .cast("long"))
      .withColumn("__h", TextOps.portableHash(col("doc_id"), "uni"))
      .join(sel, Seq("doc_id"), "left")
      .withColumn("__sel", col("__sel_tok").isNotNull)
    all.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("__w")).as("ws_tokens"),
        min(col("__w") <= col("__np") && col("__np") <= col("__chars"))
          .as("pieces_bounded"),
        (coalesce(sum(when(col("__sel"), col("__np"))), lit(0L)) <=
          first(budgetCol)).as("budget_respected"),
        (coalesce(sum(when(col("__sel"), col("__np"))), lit(0L)) +
          coalesce(min(when(!col("__sel"),
              struct(col("__h").as("h"), col("doc_id").as("d"),
                col("__np").as("np")))).getField("np"),
            lit(Long.MaxValue / 4)) > first(budgetCol)).as("budget_maximal"))
      .orderBy(col("source"))
  }

  private def unigramBudgetOracle: String =
    """WITH t AS (
      |  SELECT source,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> len(x) > 0) AS toks
      |  FROM documents WHERE source IN ('src0', 'src1', 'src2'))
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(len(toks)) AS BIGINT) AS ws_tokens,
      |  true AS pieces_bounded, true AS budget_respected,
      |  true AS budget_maximal
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  /** WebDataset shard export + read-back ([[graft.io.TarSource]]):
    * write the corpus as portable-hash-sharded ustar tars (the
    * multimodal training-data container — samples stream shard-
    * sequentially, no per-sample object-store round trips), read the
    * shards back, and aggregate per shard. The shard assignment and
    * payload byte lengths replay exactly in DuckDB (the q101 portable-
    * hash discipline), so the gate proves the WHOLE round trip: hash
    * sharding, tar framing, byte-exact payloads, key naming.
    */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_wds_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    val shardDf = docs(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("txt"))
      .withColumn("shard",
        pmod(TextOps.portableHash(col("doc_id"), "wds"), lit(4)).cast("int"))
    graft.io.TarSource.writeShards(shardDf, out, "doc_id", "shard",
      Seq("txt" -> "txt"), numShards = 4)
    graft.io.TarSource.read(s, out)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_files"),
        sum(length(col("content")).cast("long")).as("sum_bytes"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key"))
      .orderBy(col("shard"))
  }

  private def wdsOracle: String =
    """WITH h AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS key,
      |    CAST(('0x' || substr(md5('wds:' || doc_id), 1, 8)) AS BIGINT) % 4
      |      AS sh,
      |    strlen(text) AS b
      |  FROM documents)
      |SELECT printf('shard-%05d.tar', sh) AS shard, count(*) AS n_files,
      |  CAST(sum(b) AS BIGINT) AS sum_bytes,
      |  min(key) AS min_key, max(key) AS max_key
      |FROM h GROUP BY sh ORDER BY shard""".stripMargin

  /** Per-source corpus data card ([[graft.operators.Curation
    * .dataCard]]): the dataset-documentation numbers a released
    * training corpus ships — volume, exact-dup rate, language mix,
    * quality, PII incidence, short-doc share — in long
    * (source, metric, value) format. Every metric composes
    * already-gated kernels, so the oracle replays the whole card.
    */
  private def q146(s: SparkSession, dir: String): DataFrame =
    Curation.dataCard(docs(s, dir), "text", "source")
      .orderBy(col("source"), col("metric"))

  private def dataCardOracle: String =
    """WITH s AS (
      |  SELECT source, text,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> len(x) > 0) AS toks
      |  FROM documents),
      |e AS (
      |  SELECT source, len(toks) AS tok,
      |    round(
      |      least(len(toks) / 50.0, 1.0) * 0.4
      |      + least((CASE WHEN len(toks) = 0 THEN 0.0
      |          ELSE len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','that','this','be'))) * 1.0 / len(toks) END) * 4.0, 1.0) * 0.3
      |      + greatest(0.0, 1.0 - (CASE WHEN len(text) = 0 THEN 0.0
      |          ELSE len(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / len(text) END) * 5.0) * 0.3,
      |      4) AS q,
      |    len(list_filter(toks, t -> t IN ('der','die','das','und','ein','eine','ist','von','mit','für'))) AS h_de,
      |    len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','that','this','be'))) AS h_en,
      |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','un','una','por','con','para','es'))) AS h_es,
      |    len(list_filter(toks, t -> t IN ('le','la','de','et','un','une','pour','dans','est','que','au'))) AS h_fr,
      |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |    regexp_matches(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS has_email
      |  FROM s),
      |l AS (
      |  SELECT *, CASE
      |      WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
      |      WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
      |      WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
      |      WHEN h_es >= h_fr THEN 'es'
      |      ELSE 'fr' END AS lang
      |  FROM e),
      |a AS (
      |  SELECT source, count(*) AS n, CAST(sum(tok) AS BIGINT) AS wt,
      |    count(DISTINCT fp) AS u,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nen,
      |    round(avg(q), 4) AS aq,
      |    sum(CASE WHEN has_email THEN 1 ELSE 0 END) AS ne,
      |    sum(CASE WHEN tok < 10 THEN 1 ELSE 0 END) AS ns,
      |    max(tok) AS mt
      |  FROM l GROUP BY source)
      |SELECT source, metric, value FROM (
      |  SELECT source, 'avg_quality' AS metric, aq AS value FROM a
      |  UNION ALL SELECT source, 'max_doc_tokens', CAST(mt AS DOUBLE) FROM a
      |  UNION ALL SELECT source, 'n_docs', CAST(n AS DOUBLE) FROM a
      |  UNION ALL SELECT source, 'pct_email', round(ne * 1.0 / n, 4) FROM a
      |  UNION ALL SELECT source, 'pct_en', round(nen * 1.0 / n, 4) FROM a
      |  UNION ALL SELECT source, 'pct_short', round(ns * 1.0 / n, 4) FROM a
      |  UNION ALL SELECT source, 'pct_unique', round(u * 1.0 / n, 4) FROM a
      |  UNION ALL SELECT source, 'ws_tokens', CAST(wt AS DOUBLE) FROM a)
      |ORDER BY source, metric""".stripMargin

  /** C4 line-level cleaning ([[graft.operators.Curation
    * .c4LineFilter]], Raffel et al. 2020 §2.2): per source, the doc
    * pass rate and line survival under the terminal-punctuation /
    * min-words / javascript line rules + the lorem-ipsum / brace /
    * min-lines page gates. The oracle replays every rule with the
    * same RE2-safe regexes.
    */
  private def q147(s: SparkSession, dir: String): DataFrame =
    Curation.c4LineFilter(docs(s, dir), "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pass_c4_page"), 1L).otherwise(0L)).as("n_pass"),
        sum(col("n_lines").cast("long")).as("n_lines"),
        sum(col("n_kept").cast("long")).as("n_kept"),
        sum(when(col("pass_c4_page"),
          TF.tokenCount(col("clean_text")).cast("long")).otherwise(0L))
          .as("clean_tokens"))
      .orderBy(col("source"))

  /** Image near-dup — perceptual dHash banded through the SimHash
    * Hamming join ([[graft.operators.Dedup.imageNearDuplicates]], the
    * q38 discipline applied to pixels). Lossless in-engine PNGs with
    * CLOSED-FORM hashes (the q79 precedent): an 18×16 luma gradient
    * block-averages to a strictly increasing 9×8 grid → all 64
    * brighter-to-the-right bits set (hash = all-ones); its 2×-resolution
    * twin averages to the same grid ordering → Hamming 0; a copy with
    * one brightened corner cell flips exactly bit 0 → Hamming 1; the
    * reversed gradient hashes to all-zeros and shares no band. The
    * oracle states the resulting pair list as literals. DedupSpec
    * carries the JPEG re-encode twin (lossy → tolerance spec, never an
    * exact oracle).
    */
  private def q148(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val imgs = Seq(
      (1L, M.renderPng(18, 16, (x, _) => gray(x * 10))),
      (2L, M.renderPng(36, 32, (x, _) => gray(x * 5))),
      (3L, M.renderPng(18, 16,
        (x, y) => gray(if (y < 2 && x < 2) 200 else x * 10))),
      (4L, M.renderPng(18, 16, (x, _) => gray((17 - x) * 10)))
    ).toDF("img_id", "content")
    graft.operators.Dedup.imageNearDuplicates(imgs, "img_id", "content",
        maxHamming = 6)
      .orderBy(col("id_a"), col("id_b"))
  }

  private def imgDupOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), CAST(2 AS BIGINT), 0),
      | (CAST(1 AS BIGINT), CAST(3 AS BIGINT), 1),
      | (CAST(2 AS BIGINT), CAST(3 AS BIGINT), 1)
      |) AS t(id_a, id_b, hamming)
      |ORDER BY id_a, id_b""".stripMargin

  /** C4 dirty-word page gate ([[graft.operators.Curation
    * .badwordFilter]], Raffel et al. 2020 §2.2's "remove any page
    * containing a listed word" — the content companion to q147's
    * structural rules): per source, flagged-page rate and total hits
    * under a stand-in list (one word the corpus contains, two it
    * doesn't — the real list is distribution-restricted; the operator
    * is list-agnostic). Map-only fused tokenize + hash-set membership
    * ([[graft.functions.CatalystExpressions.CountInSet]]); the oracle
    * replays exact-token membership with DuckDB list ops.
    */
  private def q149(s: SparkSession, dir: String): DataFrame =
    Curation.badwordFilter(docs(s, dir), "text",
        Seq("slow", "terrible", "worst"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("pass_badwords"), 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_badwords").cast("long")).as("total_hits"))
      .withColumn("pct_flagged",
        round(col("n_flagged").cast("double") / col("n_docs"), 4))
      .orderBy(col("source"))

  private def badwordOracle: String =
    """WITH t AS (
      |  SELECT source,
      |    len(list_filter(
      |      list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''),
      |      x -> list_contains(['slow', 'terrible', 'worst'], lower(x))))
      |      AS hits
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_flagged,
      |  CAST(sum(hits) AS BIGINT) AS total_hits,
      |  round(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
      |    AS pct_flagged
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  /** Audio content stats ([[graft.operators.Multimodal.audioStats]],
    * REAL PCM decode of the RIFF data chunk): peak/RMS amplitude,
    * clipping ratio, silence ratio over in-engine WAVs whose sample
    * functions make every stat a closed form — exact integer Σs², so
    * the oracle restates the same arithmetic as literals (the q79
    * discipline for audio). The junk row proves the degrade-per-row
    * rule. 8-bit PCM and truncated-chunk handling are spec-gated
    * (SemanticSpec).
    */
  private def q150(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val square = Array.tabulate[Short](800)(i =>
      (if (i % 2 == 0) 16384 else -16384).toShort)
    val silent = new Array[Short](400)
    val mix = Array.tabulate[Short](200)(i =>
      (if (i < 100) 0 else if (i % 2 == 0) 32767 else -32767).toShort)
    val wavs = Seq(
      (1L, M.renderWav(8000, 1, square)),
      (2L, M.renderWav(44100, 2, silent)),
      (3L, M.renderWav(16000, 1, mix)),
      (4L, "not audio".getBytes("UTF-8"))
    ).toDF("wav_id", "content")
    M.audioStats(wavs)
      .select(col("wav_id"), col("audio.channels").as("channels"),
        col("audio.sample_rate").as("sample_rate"),
        col("audio.n_samples").as("n_samples"),
        col("audio.peak_norm").as("peak_norm"),
        col("audio.rms_norm").as("rms_norm"),
        col("audio.clip_ratio").as("clip_ratio"),
        col("audio.silence_ratio").as("silence_ratio"),
        col("audio.ok").as("ok"),
        col("audio.codec").as("codec"),
        col("audio.duration_ms").as("duration_ms"))
      .orderBy(col("wav_id"))
  }

  private def audioOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 1, 8000, CAST(800 AS BIGINT),
      |  round(16384.0/32767, 6), round(16384.0/32767, 6), 0.0, 0.0, TRUE,
      |  'pcm', CAST(800 * 1000 // 8000 AS BIGINT)),
      | (CAST(2 AS BIGINT), 2, 44100, CAST(400 AS BIGINT),
      |  0.0, 0.0, 0.0, 1.0, TRUE,
      |  'pcm', CAST(200 * 1000 // 44100 AS BIGINT)),
      | (CAST(3 AS BIGINT), 1, 16000, CAST(200 AS BIGINT),
      |  1.0, round(sqrt((100.0*32767*32767)/200)/32767, 6), 0.5, 0.5, TRUE,
      |  'pcm', CAST(200 * 1000 // 16000 AS BIGINT)),
      | (CAST(4 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
      |  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), FALSE,
      |  CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT))
      |) AS t(wav_id, channels, sample_rate, n_samples, peak_norm,
      |       rms_norm, clip_ratio, silence_ratio, ok, codec, duration_ms)
      |ORDER BY wav_id""".stripMargin

  /** Mergeable quantile sketch ([[graft.operators.Aggregators
    * .kllSketch]] — the KLL compactor hierarchy as a typed Aggregator,
    * replacing q59's reliance on Spark-internal percentile_approx with
    * the engine's OWN sketch): per event type, the p50/p90 estimates
    * must land within 2% of the exact percentile. Sketch internals are
    * engine-specific, so the q59/q43 boolean discipline applies — each
    * engine asserts its own approximation, the gate compares booleans
    * plus the exactly-replayable counts.
    */
  private def q151(s: SparkSession, dir: String): DataFrame = {
    val kll = org.apache.spark.sql.functions.udaf(
      graft.operators.Aggregators.kllQuantiles(k = 256, qs = Seq(0.5, 0.9)))
    t(s, dir, "events")
      // the sketch's contract: finite doubles only (a null would fail
      // the primitive-Double deserializer, a NaN has no rank) — the
      // oracle applies the same predicate so the counts agree
      .filter(col("value").isNotNull && !col("value").isNaN)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        kll(col("value")).as("__est"),
        expr("percentile(value, 0.5)").as("__e50"),
        expr("percentile(value, 0.9)").as("__e90"))
      .select(col("event_type"), col("n"),
        (abs(element_at(col("__est"), 1) - col("__e50")) <=
          lit(0.02) * greatest(abs(col("__e50")), lit(1.0))).as("p50_within_2pct"),
        (abs(element_at(col("__est"), 2) - col("__e90")) <=
          lit(0.02) * greatest(abs(col("__e90")), lit(1.0))).as("p90_within_2pct"))
      .orderBy(col("event_type"))
  }

  private def kllOracle: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      | abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
      |   <= 0.02 * greatest(abs(quantile_cont(value, 0.5)), 1.0) AS p50_within_2pct,
      | abs(approx_quantile(value, 0.9) - quantile_cont(value, 0.9))
      |   <= 0.02 * greatest(abs(quantile_cont(value, 0.9)), 1.0) AS p90_within_2pct
      |FROM events
      |WHERE value IS NOT NULL AND NOT isnan(value)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Media corpus card ([[graft.operators.Multimodal.mediaCard]] —
    * the multimodal twin of q146's text card): per group, modality
    * mix, image geometry/brightness, audio level and defect rates in
    * long format. Lossless in-engine fixtures (PNG + PCM WAV + a
    * synthetic MP3 + junk) make every value a closed form the oracle
    * states as literals; single-audio groups keep per-row-rounded
    * averages off rounding boundaries. The MP3 group proves the card
    * classifies MPEG audio as audio with REAL rate/duration facts
    * (`avg_audio_hz`/`avg_audio_secs` from the frame walk).
    */
  private def q152(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val square = Array.tabulate[Short](800)(i =>
      (if (i % 2 == 0) 16384 else -16384).toShort)
    // MPEG1 Layer III, 32000 Hz mono, 10 frames @128 kbps: chosen so
    // every card fact is integral — frame = 144·128000/32000 = 576
    // bytes, 10·1152 samples @32 kHz = exactly 360 ms
    val mp3 = M.syntheticMp3(verId = 3, srIdx = 2, channels = 1,
      frames = (0 until 10).map(i => (9, Seq(100 + 2 * i, 101 + 2 * i))))
    val assets = Seq(
      ("img", M.renderPng(16, 16, (_, _) => (200 << 16) | (50 << 8) | 25)),
      ("img", M.renderPng(4, 2, (x, _) => if (x < 2) 0xFF0000 else 0x0000FF)),
      ("aud", M.renderWav(8000, 1, square)),
      ("aud", "not media".getBytes("UTF-8")),
      ("mp3", mp3),
      ("sil", M.renderWav(44100, 2, new Array[Short](400))),
      ("vid", M.syntheticMp4(64, 48, durationMs = 2000)),
      // a REAL MJPEG-in-MP4: 3 JPEG samples, sync every 2nd -> stss
      // {1,3} -> exactly 2 keyframes (the metadata-only MP4 above has
      // no sample table and contributes null)
      ("vid", M.syntheticMjpegMp4(
        (0 until 3).map(i => M.renderJpeg(16, 16,
          (_, _) => ((40 * i) << 16) | ((40 * i) << 8) | (40 * i))),
        syncEvery = 2))
    ).toDF("source", "content")
    M.mediaCard(assets, "content", "source")
      .orderBy(col("source"), col("metric"))
  }

  private def mediaCardOracle: String =
    """SELECT * FROM (VALUES
      | ('aud', 'avg_audio_hz', 8000.0),
      | ('aud', 'avg_audio_rms', round(16384.0/32767, 6)),
      | ('aud', 'avg_audio_secs', 0.1),
      | ('aud', 'avg_image_height', CAST(NULL AS DOUBLE)),
      | ('aud', 'avg_image_luma', CAST(NULL AS DOUBLE)),
      | ('aud', 'avg_image_textiness', CAST(NULL AS DOUBLE)),
      | ('aud', 'avg_image_width', CAST(NULL AS DOUBLE)),
      | ('aud', 'avg_video_keyframes', CAST(NULL AS DOUBLE)),
      | ('aud', 'avg_dialog_coverage', CAST(NULL AS DOUBLE)),
      | ('aud', 'n_assets', 2.0),
      | ('aud', 'pct_audio', 0.5),
      | ('aud', 'pct_audio_clipped', 0.0),
      | ('aud', 'pct_audio_silent', 0.0),
      | ('aud', 'pct_audio_with_art', 0.0),
      | ('aud', 'pct_audio_with_lyrics', 0.0),
      | ('aud', 'pct_audio_with_chapters', 0.0),
      | ('aud', 'pct_image', 0.0),
      | ('aud', 'pct_image_gps', CAST(NULL AS DOUBLE)),
      | ('aud', 'pct_image_with_text', CAST(NULL AS DOUBLE)),
      | ('aud', 'pct_image_with_thumb', CAST(NULL AS DOUBLE)),
      | ('aud', 'pct_undecodable', 0.5),
      | ('aud', 'pct_video_with_subs', CAST(NULL AS DOUBLE)),
      | ('aud', 'pct_video', 0.0),
      | ('img', 'avg_audio_hz', CAST(NULL AS DOUBLE)),
      | ('img', 'avg_audio_rms', CAST(NULL AS DOUBLE)),
      | ('img', 'avg_audio_secs', CAST(NULL AS DOUBLE)),
      | ('img', 'avg_image_height', 9.0),
      | ('img', 'avg_image_luma',
      |   round(((200/255.0 + 50/255.0 + 25/255.0)/3 + (0.5 + 0.0 + 0.5)/3)/2, 4)),
      | ('img', 'avg_image_textiness', 0.0),
      | ('img', 'avg_image_width', 10.0),
      | ('img', 'avg_video_keyframes', CAST(NULL AS DOUBLE)),
      | ('img', 'avg_dialog_coverage', CAST(NULL AS DOUBLE)),
      | ('img', 'n_assets', 2.0),
      | ('img', 'pct_audio', 0.0),
      | ('img', 'pct_audio_clipped', CAST(NULL AS DOUBLE)),
      | ('img', 'pct_audio_silent', CAST(NULL AS DOUBLE)),
      | ('img', 'pct_audio_with_art', CAST(NULL AS DOUBLE)),
      | ('img', 'pct_audio_with_lyrics', CAST(NULL AS DOUBLE)),
      | ('img', 'pct_audio_with_chapters', CAST(NULL AS DOUBLE)),
      | ('img', 'pct_image', 1.0),
      | ('img', 'pct_image_gps', 0.0),
      | ('img', 'pct_image_with_text', 0.0),
      | ('img', 'pct_image_with_thumb', 0.0),
      | ('img', 'pct_undecodable', 0.0),
      | ('img', 'pct_video', 0.0),
      | ('img', 'pct_video_with_subs', CAST(NULL AS DOUBLE)),
      | ('mp3', 'avg_audio_hz', 32000.0),
      | ('mp3', 'avg_audio_rms', CAST(NULL AS DOUBLE)),
      | ('mp3', 'avg_audio_secs', 0.36),
      | ('mp3', 'avg_image_height', CAST(NULL AS DOUBLE)),
      | ('mp3', 'avg_image_luma', CAST(NULL AS DOUBLE)),
      | ('mp3', 'avg_image_textiness', CAST(NULL AS DOUBLE)),
      | ('mp3', 'avg_image_width', CAST(NULL AS DOUBLE)),
      | ('mp3', 'avg_video_keyframes', CAST(NULL AS DOUBLE)),
      | ('mp3', 'avg_dialog_coverage', CAST(NULL AS DOUBLE)),
      | ('mp3', 'n_assets', 1.0),
      | ('mp3', 'pct_audio', 1.0),
      | ('mp3', 'pct_audio_clipped', 0.0),
      | ('mp3', 'pct_audio_silent', 0.0),
      | ('mp3', 'pct_audio_with_art', 0.0),
      | ('mp3', 'pct_audio_with_lyrics', 0.0),
      | ('mp3', 'pct_audio_with_chapters', 0.0),
      | ('mp3', 'pct_image', 0.0),
      | ('mp3', 'pct_image_gps', CAST(NULL AS DOUBLE)),
      | ('mp3', 'pct_image_with_text', CAST(NULL AS DOUBLE)),
      | ('mp3', 'pct_image_with_thumb', CAST(NULL AS DOUBLE)),
      | ('mp3', 'pct_undecodable', 0.0),
      | ('mp3', 'pct_video', 0.0),
      | ('mp3', 'pct_video_with_subs', CAST(NULL AS DOUBLE)),
      | ('sil', 'avg_audio_hz', 44100.0),
      | ('sil', 'avg_audio_rms', 0.0),
      | ('sil', 'avg_audio_secs', round((200 * 1000 // 44100) / 1000.0, 4)),
      | ('sil', 'avg_image_height', CAST(NULL AS DOUBLE)),
      | ('sil', 'avg_image_luma', CAST(NULL AS DOUBLE)),
      | ('sil', 'avg_image_textiness', CAST(NULL AS DOUBLE)),
      | ('sil', 'avg_image_width', CAST(NULL AS DOUBLE)),
      | ('sil', 'avg_video_keyframes', CAST(NULL AS DOUBLE)),
      | ('sil', 'avg_dialog_coverage', CAST(NULL AS DOUBLE)),
      | ('sil', 'n_assets', 1.0),
      | ('sil', 'pct_audio', 1.0),
      | ('sil', 'pct_audio_clipped', 0.0),
      | ('sil', 'pct_audio_silent', 1.0),
      | ('sil', 'pct_audio_with_art', 0.0),
      | ('sil', 'pct_audio_with_lyrics', 0.0),
      | ('sil', 'pct_audio_with_chapters', 0.0),
      | ('sil', 'pct_image', 0.0),
      | ('sil', 'pct_image_gps', CAST(NULL AS DOUBLE)),
      | ('sil', 'pct_image_with_text', CAST(NULL AS DOUBLE)),
      | ('sil', 'pct_image_with_thumb', CAST(NULL AS DOUBLE)),
      | ('sil', 'pct_undecodable', 0.0),
      | ('sil', 'pct_video', 0.0),
      | ('sil', 'pct_video_with_subs', CAST(NULL AS DOUBLE)),
      | ('vid', 'avg_audio_hz', CAST(NULL AS DOUBLE)),
      | ('vid', 'avg_audio_rms', CAST(NULL AS DOUBLE)),
      | ('vid', 'avg_audio_secs', CAST(NULL AS DOUBLE)),
      | ('vid', 'avg_image_height', CAST(NULL AS DOUBLE)),
      | ('vid', 'avg_image_luma', CAST(NULL AS DOUBLE)),
      | ('vid', 'avg_image_textiness', CAST(NULL AS DOUBLE)),
      | ('vid', 'avg_image_width', CAST(NULL AS DOUBLE)),
      | ('vid', 'avg_video_keyframes', 2.0),
      | -- the mvhd'd MP4 declares 2000 ms and carries no text track:
      | -- coverage 0.0; the mvhd-less MJPEG asserts nothing (null)
      | ('vid', 'avg_dialog_coverage', 0.0),
      | ('vid', 'n_assets', 2.0),
      | ('vid', 'pct_audio', 0.0),
      | ('vid', 'pct_audio_clipped', CAST(NULL AS DOUBLE)),
      | ('vid', 'pct_audio_silent', CAST(NULL AS DOUBLE)),
      | ('vid', 'pct_audio_with_art', CAST(NULL AS DOUBLE)),
      | ('vid', 'pct_audio_with_lyrics', CAST(NULL AS DOUBLE)),
      | ('vid', 'pct_audio_with_chapters', CAST(NULL AS DOUBLE)),
      | ('vid', 'pct_image', 0.0),
      | ('vid', 'pct_image_gps', CAST(NULL AS DOUBLE)),
      | ('vid', 'pct_image_with_text', CAST(NULL AS DOUBLE)),
      | ('vid', 'pct_image_with_thumb', CAST(NULL AS DOUBLE)),
      | ('vid', 'pct_undecodable', 0.0),
      | ('vid', 'pct_video', 1.0),
      | ('vid', 'pct_video_with_subs', 0.0)
      |) AS t(source, metric, value)
      |ORDER BY source, metric""".stripMargin

  /** Audio near-dup — perceptual audio hashing banded through the
    * SAME Hamming machinery as q148's images ([[graft.operators.Dedup
    * .audioNearDuplicates]]): an amplitude-RISING square wave drives
    * every envelope-derivative comparison up (hash = all-ones,
    * provable: strictly increasing per-sample magnitudes beat the
    * ±1-sample window-length wobble by a quadratic margin), integer
    * gain scaling multiplies every window energy by the same factor
    * (bit-identical hash ⇒ Hamming-0 twins), and the FALLING wave
    * hashes to all-zeros — no shared band, no pair. The oracle states
    * the resulting pair list as literals; resample/noise robustness
    * is spec-gated (DedupSpec).
    */
  private def q153(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def amSquare(n: Int, gain: Int, rising: Boolean): Array[Short] =
      Array.tabulate[Short](n) { i =>
        val a = (if (rising) 100 + i else 100 + n - 1 - i) * gain
        (if (i % 2 == 0) a else -a).toShort
      }
    val wavs = Seq(
      (1L, M.renderWav(8000, 1, amSquare(900, 1, rising = true))),
      (2L, M.renderWav(8000, 1, amSquare(900, 2, rising = true))), // gain twin
      (3L, M.renderWav(8000, 1, amSquare(900, 3, rising = true))), // gain twin
      (4L, M.renderWav(8000, 1, amSquare(900, 1, rising = false)))
    ).toDF("wav_id", "content")
    graft.operators.Dedup.audioNearDuplicates(wavs, "wav_id", "content",
        maxHamming = 6)
      .orderBy(col("id_a"), col("id_b"))
  }

  private def audioDupOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), CAST(2 AS BIGINT), 0),
      | (CAST(1 AS BIGINT), CAST(3 AS BIGINT), 0),
      | (CAST(2 AS BIGINT), CAST(3 AS BIGINT), 0)
      |) AS t(id_a, id_b, hamming)
      |ORDER BY id_a, id_b""".stripMargin

  /** MPEG audio (MP3) header walk — [[graft.operators.Multimodal
    * .mpegAudioInfo]] facts on synthetic Layer III streams whose
    * every field is a closed form of the builder arguments
    * ([[graft.operators.Multimodal.syntheticMp3]], the q150
    * discipline for compressed audio): MPEG1 CBR mono, MPEG2 (LSF)
    * stereo, MPEG1 VBR (alternating 128/192 kbps), an ID3v2-tagged
    * twin the walk must skip, and junk that degrades. Durations are
    * exact frame-count arithmetic — `n_frames · samples_per_frame ·
    * 1000 // rate`.
    */
  private def q154(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val cbrFrames = (0 until 10).map(_ => (9, Seq(100, 101)))
    val streams = Seq(
      (1L, M.syntheticMp3(verId = 3, srIdx = 2, channels = 1,
        frames = cbrFrames)),
      (2L, M.syntheticMp3(verId = 2, srIdx = 2, channels = 2,
        frames = (0 until 8).map(_ => (5, Seq(90))))),
      (3L, M.syntheticMp3(verId = 3, srIdx = 0, channels = 1,
        frames = Seq((9, Seq(1, 2)), (11, Seq(3, 4)),
          (9, Seq(5, 6)), (11, Seq(7, 8))))),
      (4L, M.syntheticMp3(verId = 3, srIdx = 2, channels = 1,
        frames = cbrFrames, id3Bytes = 64)),
      (5L, "junk bytes".getBytes("UTF-8"))
    ).toDF("mp3_id", "content")
    M.audioStats(streams)
      .select(col("mp3_id"), col("audio.codec").as("codec"),
        col("audio.channels").as("channels"),
        col("audio.sample_rate").as("sample_rate"),
        col("audio.n_samples").as("n_samples"),
        col("audio.duration_ms").as("duration_ms"),
        col("audio.bitrate_kbps").as("bitrate_kbps"),
        col("audio.vbr").as("vbr"),
        col("audio.ok").as("ok"))
      .orderBy(col("mp3_id"))
  }

  private def mpegWalkOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'mpeg1-l3', 1, 32000,
      |  CAST(10 * 1152 AS BIGINT), CAST(10 * 1152 * 1000 // 32000 AS BIGINT),
      |  128.0, FALSE, TRUE),
      | (CAST(2 AS BIGINT), 'mpeg2-l3', 2, 16000,
      |  CAST(8 * 576 AS BIGINT), CAST(8 * 576 * 1000 // 16000 AS BIGINT),
      |  40.0, FALSE, TRUE),
      | (CAST(3 AS BIGINT), 'mpeg1-l3', 1, 44100,
      |  CAST(4 * 1152 AS BIGINT), CAST(4 * 1152 * 1000 // 44100 AS BIGINT),
      |  160.0, TRUE, TRUE),
      | (CAST(4 AS BIGINT), 'mpeg1-l3', 1, 32000,
      |  CAST(10 * 1152 AS BIGINT), CAST(10 * 1152 * 1000 // 32000 AS BIGINT),
      |  128.0, FALSE, TRUE),
      | (CAST(5 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
      |  CAST(NULL AS INTEGER), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN), FALSE)
      |) AS t(mp3_id, codec, channels, sample_rate, n_samples,
      |       duration_ms, bitrate_kbps, vbr, ok)
      |ORDER BY mp3_id""".stripMargin

  private def c4LineOracle: String =
    """WITH l AS (
      |  SELECT source, text, string_split(text, chr(10)) AS lines
      |  FROM documents),
      |k AS (
      |  SELECT source, text, lines,
      |    list_filter(lines, x ->
      |      regexp_matches(trim(x), '[.!?"]$')
      |      AND len(list_filter(string_split_regex(trim(x), '\s+'),
      |        w -> len(w) > 0)) >= 5
      |      AND NOT regexp_matches(lower(trim(x)), '\bjavascript\b')) AS kept
      |  FROM l),
      |p AS (
      |  SELECT source, lines, kept,
      |    (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
      |      AND NOT contains(text, '{')) AS pass,
      |    len(list_filter(string_split_regex(
      |      lower(trim(array_to_string(kept, chr(10)))), '\s+'),
      |      w -> len(w) > 0)) AS ct
      |  FROM k)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |  CAST(sum(len(lines)) AS BIGINT) AS n_lines,
      |  CAST(sum(len(kept)) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN pass THEN ct ELSE 0 END) AS BIGINT)
      |    AS clean_tokens
      |FROM p GROUP BY source ORDER BY source""".stripMargin

  /** Rendered-text detection ([[graft.operators.Multimodal
    * .textiness]] — the deterministic screenshot/meme-share kernel
    * behind `mediaCard.avg_image_textiness`): hard two-tone stripes
    * saturate the score at 1, wider stripes land at the exact
    * closed-form 5·(7/63), a smooth gradient has no sharp edges
    * (score 0), mid-gray stripes have edges but no tonal polarization
    * (the bimodality term zeroes them), junk is null. Every value is
    * integer-pixel arithmetic the oracle restates (q79 discipline).
    */
  private def q155(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val imgs = Seq(
      (1L, M.renderPng(64, 64, (x, _) => if (x % 8 < 4) 0 else gray(255))),
      (2L, M.renderPng(64, 64, (x, _) => if (x % 16 < 8) 0 else gray(255))),
      (3L, M.renderPng(64, 64, (x, _) => gray(x * 4))),
      (4L, M.renderPng(64, 64, (x, _) => if (x % 8 < 4) gray(96) else gray(160))),
      (5L, "not an image".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    imgs.select(col("img_id"),
        M.textinessCol(col("content")).as("textiness"))
      .orderBy(col("img_id"))
  }

  private def textinessOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 1.0),
      | (CAST(2 AS BIGINT), round(5 * (7.0/63), 6)),
      | (CAST(3 AS BIGINT), 0.0),
      | (CAST(4 AS BIGINT), 0.0),
      | (CAST(5 AS BIGINT), CAST(NULL AS DOUBLE))
      |) AS t(img_id, textiness)
      |ORDER BY img_id""".stripMargin

  /** Corpus-scale image dedup — q148's machinery driven by the
    * `documents` table instead of 4 literal fixtures, so the BENCH
    * measures the distributed path (render → dHash → banded Hamming
    * join → connected components → keep-list) at corpus size: one
    * 64×64 PNG per document, pattern class = `doc_id % 15` (light
    * stripes at the grid columns named by the class bits — classes
    * are exactly Hamming-0 inside and ≥ 8 bits apart, so the class
    * structure is provable at ANY scale factor), per-document tone
    * jitter that provably never moves a dHash bit (uniform shifts
    * keep every cell comparison's direction). The oracle restates the
    * whole dedup outcome as doc_id arithmetic: dup_class = the class
    * residue (the smallest doc_id of a class IS its residue), one
    * keeper per class.
    */
  private def q156(s: SparkSession, dir: String): DataFrame = {
    // render at full parallelism: documents is 1-2 input splits at
    // test SF, and ImageIO encode/decode is the query's actual cost
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val rdd = docs.rdd.map { r =>
      val id = r.getLong(0)
      val cls = (id % 15).toInt
      val dark = 20 + (id % 23).toInt // < 43: never crosses a light tone
      val light = 200 + (id % 37).toInt
      def g(v: Int): Int = (v << 16) | (v << 8) | v
      // light stripe occupies grid column 1+2k for each set bit k of
      // (cls+1): rising boundary at column 2k -> 8 set bits per stripe
      val lightCols = (0 until 4).filter(k => ((cls + 1) >> k & 1) != 0)
        .map(k => 1 + 2 * k).toSet
      // full object path (a `val M` alias would capture the module
      // instance into the task closure — objects aren't Serializable)
      val png = graft.operators.Multimodal.renderPng(64, 64, (x, _) => {
        val gridCol = x * 9 / 64
        if (lightCols(gridCol)) g(light) else g(dark)
      })
      org.apache.spark.sql.Row(id, png)
    }
    // render ONCE: imageDedupCorpus reads the frame twice (signature
    // derivation + the final keep join), and re-rendering 5k PNGs is
    // the whole query cost; the checkpointed frame is ~1 MB
    val imgs = s.createDataFrame(rdd, schema).localCheckpoint(false)
    graft.operators.Dedup.imageDedupCorpus(imgs, "doc_id", "content")
      .groupBy((col("doc_id") % 15).as("img_class"))
      .agg(count(lit(1)).as("n"),
        min(col("dup_class")).as("class_min"),
        max(col("dup_class")).as("class_max"), // == class_min: one class
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .orderBy(col("img_class"))
  }

  private def imgCorpusOracle: String =
    """SELECT doc_id % 15 AS img_class, count(*) AS n,
      | CAST(doc_id % 15 AS BIGINT) AS class_min,
      | CAST(doc_id % 15 AS BIGINT) AS class_max,
      | CAST(1 AS BIGINT) AS n_keep
      |FROM documents GROUP BY doc_id % 15 ORDER BY img_class""".stripMargin

  /** Corpus-scale media card — q152's card driven by the `documents`
    * table: one media asset per document (PNG / PCM WAV / synthetic
    * MP3 / junk by `doc_id % 4`), every per-asset fact a closed form
    * of doc_id so the 14-metric card is restatable as doc_id
    * arithmetic at ANY scale factor. Float-sum-ordering safety: the
    * per-group averaged values are either identical across rows
    * (luma, rms, rates) or integer-derived (widths, durations in
    * whole ms), so group averages stay far from rounding boundaries.
    */
  private def q157(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val rdd = docs.rdd.map { r =>
      val id = r.getLong(0)
      val g = (id % 4).toInt
      val content: Array[Byte] = g match {
        case 0 =>
          graft.operators.Multimodal.renderPng(24 + (id % 10).toInt * 4, 16,
            (_, _) => (123 << 16) | (123 << 8) | 123)
        case 1 =>
          val n = 400 + (id % 100).toInt * 8 // /8000 Hz = whole ms
          graft.operators.Multimodal.renderWav(8000, 1,
            Array.tabulate[Short](n)(i =>
              (if (i % 2 == 0) 12000 else -12000).toShort))
        case 2 =>
          graft.operators.Multimodal.syntheticMp3(verId = 3, srIdx = 2,
            channels = 1,
            frames = (0 until (5 + (id % 7).toInt)).map(_ => (9, Seq(100, 101))))
        case _ => s"junk $id".getBytes("UTF-8")
      }
      org.apache.spark.sql.Row(id, g.toString, content)
    }
    graft.operators.Multimodal
      .mediaCard(s.createDataFrame(rdd, schema), "content", "grp")
      .orderBy(col("grp"), col("metric"))
  }

  private def mediaCorpusOracle: String =
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS grp
      |           FROM documents),
      |a AS (
      | SELECT grp, CAST(count(*) AS DOUBLE) AS n,
      |  round(avg(CASE WHEN grp = '1' THEN 8000.0
      |                 WHEN grp = '2' THEN 32000.0 END), 2) AS ahz,
      |  round(avg(CASE WHEN grp = '1'
      |                 THEN round(12000.0/32767, 6) END), 6) AS arms,
      |  round(avg(CASE WHEN grp = '1' THEN 50 + doc_id % 100
      |                 WHEN grp = '2'
      |                 THEN (5 + doc_id % 7) * 1152 * 1000 // 32000
      |            END) / 1000.0, 4) AS asec,
      |  round(avg(CASE WHEN grp = '0' THEN 16.0 END), 2) AS ah,
      |  round(avg(CASE WHEN grp = '0'
      |                 THEN (123/255.0 + 123/255.0 + 123/255.0)/3 END), 4) AS al,
      |  round(avg(CASE WHEN grp = '0' THEN 0.0 END), 6) AS atxt,
      |  round(avg(CASE WHEN grp = '0'
      |                 THEN 24 + (doc_id % 10) * 4 END), 2) AS aw,
      |  round(avg(CASE WHEN grp IN ('1','2') THEN 1.0 ELSE 0.0 END), 4) AS pa,
      |  CASE WHEN grp IN ('1','2') THEN 0.0 END AS pclip,
      |  CASE WHEN grp IN ('1','2') THEN 0.0 END AS psil,
      |  round(avg(CASE WHEN grp = '0' THEN 1.0 ELSE 0.0 END), 4) AS pi,
      |  round(avg(CASE WHEN grp = '3' THEN 1.0 ELSE 0.0 END), 4) AS pu,
      |  0.0 AS pv,
      |  CAST(NULL AS DOUBLE) AS vkey,
      |  CASE WHEN grp = '0' THEN 0.0 END AS pgps,
      |  CASE WHEN grp = '0' THEN 0.0 END AS ptext,
      |  CASE WHEN grp IN ('1','2') THEN 0.0 END AS part,
      |  CASE WHEN grp IN ('1','2') THEN 0.0 END AS plyr,
      |  CASE WHEN grp IN ('1','2') THEN 0.0 END AS pchap,
      |  CASE WHEN grp = '0' THEN 0.0 END AS pthumb,
      |  CAST(NULL AS DOUBLE) AS psub,
      |  CAST(NULL AS DOUBLE) AS dcov
      | FROM d GROUP BY grp)
      |SELECT grp, metric, value FROM (
      | SELECT grp, 'avg_audio_hz' AS metric, ahz AS value FROM a
      | UNION ALL SELECT grp, 'avg_audio_rms', arms FROM a
      | UNION ALL SELECT grp, 'avg_audio_secs', asec FROM a
      | UNION ALL SELECT grp, 'avg_image_height', ah FROM a
      | UNION ALL SELECT grp, 'avg_image_luma', al FROM a
      | UNION ALL SELECT grp, 'avg_image_textiness', atxt FROM a
      | UNION ALL SELECT grp, 'avg_image_width', aw FROM a
      | UNION ALL SELECT grp, 'avg_video_keyframes', vkey FROM a
      | UNION ALL SELECT grp, 'avg_dialog_coverage', dcov FROM a
      | UNION ALL SELECT grp, 'n_assets', n FROM a
      | UNION ALL SELECT grp, 'pct_audio', pa FROM a
      | UNION ALL SELECT grp, 'pct_audio_clipped', pclip FROM a
      | UNION ALL SELECT grp, 'pct_audio_silent', psil FROM a
      | UNION ALL SELECT grp, 'pct_image', pi FROM a
      | UNION ALL SELECT grp, 'pct_image_gps', pgps FROM a
      | UNION ALL SELECT grp, 'pct_image_with_text', ptext FROM a
      | UNION ALL SELECT grp, 'pct_audio_with_art', part FROM a
      | UNION ALL SELECT grp, 'pct_audio_with_lyrics', plyr FROM a
      | UNION ALL SELECT grp, 'pct_audio_with_chapters', pchap FROM a
      | UNION ALL SELECT grp, 'pct_image_with_thumb', pthumb FROM a
      | UNION ALL SELECT grp, 'pct_video_with_subs', psub FROM a
      | UNION ALL SELECT grp, 'pct_undecodable', pu FROM a
      | UNION ALL SELECT grp, 'pct_video', pv FROM a
      |) ORDER BY grp, metric""".stripMargin

  /** Span surgery ([[graft.operators.Dedup.cutSpans]] — the Lee et
    * al. ExactSubstr CUT step over [[graft.operators.Dedup
    * .duplicatedSpans]] output): literal documents with a planted
    * 5-token duplicated run, 3-token windows, keep-first. The first
    * occurrences survive byte-identically (no trim, no respace — d3's
    * double space is the probe); the later copies lose exactly the
    * duplicated token range, adjacent kept tokens keep their original
    * separators, and a single space joins across the cut. The oracle
    * states the surgically cut strings as literals.
    */
  private def q158(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two alpha beta gamma delta epsilon seven"),
      (3L, "Foo  BAR baz"),
      (4L, "x  q Foo BAR baz y  z")
    ).toDF("doc_id", "text")
    val spans = graft.operators.Dedup.duplicatedSpans(docs, "doc_id", "text",
      windowTokens = 3, minCount = 2, keepFirst = true)
    graft.operators.Dedup.cutSpans(docs, spans, "doc_id", "text")
      .select(col("doc_id"), col("text_cut"))
      .orderBy(col("doc_id"))
  }

  private def cutSpansOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'alpha beta gamma delta epsilon zeta'),
      | (CAST(2 AS BIGINT), 'one two seven'),
      | (CAST(3 AS BIGINT), 'Foo  BAR baz'),
      | (CAST(4 AS BIGINT), 'x  q y  z')
      |) AS t(doc_id, text_cut)
      |ORDER BY doc_id""".stripMargin

  /** Compressed-audio header facts beyond MPEG — FLAC STREAMINFO
    * ([[graft.operators.Multimodal.flacStreamInfo]]: rate/channels/
    * bits/total samples packed in the mandatory first metadata block)
    * and Ogg-Opus ([[graft.operators.Multimodal.opusInfo]]: OpusHead
    * + last-page granule; Opus decodes on a fixed 48 kHz clock
    * whatever the OpusHead input rate was, so sample_rate reports
    * 48000 — the clock n_samples is measured in — and
    * duration_ms == n_samples · 1000 / sample_rate holds across
    * codecs; fixture 4's 16 kHz input rate is informational only).
    * With q154's MPEG walk this covers the three dominant
    * crawled-audio codecs; every value is a closed form of the
    * fixture arguments.
    */
  private def q159(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val streams = Seq(
      (1L, M.syntheticFlac(44100, 2, 16, 441000L)),
      (2L, M.syntheticFlac(48000, 1, 24, 120000L)),
      (3L, M.syntheticOpus(2, 312, 48000, 96312L)),
      (4L, M.syntheticOpus(1, 0, 16000, 24000L)),
      (5L, "junk bytes".getBytes("UTF-8")),
      // Vorbis granules count PCM samples at the stream's OWN rate
      // (no Opus fixed-clock rule) — round 13's codec addition
      (6L, M.syntheticVorbis(2, 44100, 88200L)),
      (7L, M.syntheticVorbis(1, 22050, 11025L,
        tags = Some(("T", "A", "B")))),
      // AIFF: REAL PCM decode like WAV (80-bit extended sample rate),
      // incl. the AIFF-C sowt little-endian variant — round 13
      (8L, M.renderAiff(22050, 1,
        Array.tabulate[Short](441)(i => if (i % 2 == 0) 9000 else -9000))),
      (9L, M.renderAiff(8000, 2,
        Array.tabulate[Short](320)(i => if (i % 2 == 0) 9000 else -9000),
        sowt = true))
    ).toDF("aud_id", "content")
    M.audioStats(streams)
      .select(col("aud_id"), col("audio.codec").as("codec"),
        col("audio.channels").as("channels"),
        col("audio.sample_rate").as("sample_rate"),
        col("audio.bits").as("bits"),
        col("audio.n_samples").as("n_samples"),
        col("audio.duration_ms").as("duration_ms"),
        col("audio.ok").as("ok"))
      .orderBy(col("aud_id"))
  }

  private def audioCodecOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'flac', 2, 44100, 16,
      |  CAST(441000 AS BIGINT), CAST(441000 * 1000 // 44100 AS BIGINT), TRUE),
      | (CAST(2 AS BIGINT), 'flac', 1, 48000, 24,
      |  CAST(120000 AS BIGINT), CAST(120000 * 1000 // 48000 AS BIGINT), TRUE),
      | (CAST(3 AS BIGINT), 'opus', 2, 48000, CAST(NULL AS INTEGER),
      |  CAST(96000 AS BIGINT), CAST(96000 * 1000 // 48000 AS BIGINT), TRUE),
      | (CAST(4 AS BIGINT), 'opus', 1, 48000, CAST(NULL AS INTEGER),
      |  CAST(24000 AS BIGINT), CAST(24000 * 1000 // 48000 AS BIGINT), TRUE),
      | (CAST(5 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
      |  CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
      |  CAST(NULL AS BIGINT), FALSE),
      | (CAST(6 AS BIGINT), 'vorbis', 2, 44100, CAST(NULL AS INTEGER),
      |  CAST(88200 AS BIGINT), CAST(88200 * 1000 // 44100 AS BIGINT), TRUE),
      | (CAST(7 AS BIGINT), 'vorbis', 1, 22050, CAST(NULL AS INTEGER),
      |  CAST(11025 AS BIGINT), CAST(11025 * 1000 // 22050 AS BIGINT), TRUE),
      | (CAST(8 AS BIGINT), 'pcm', 1, 22050, 16,
      |  CAST(441 AS BIGINT), CAST(441 * 1000 // 22050 AS BIGINT), TRUE),
      | (CAST(9 AS BIGINT), 'pcm', 2, 8000, 16,
      |  CAST(320 AS BIGINT), CAST((320 // 2) * 1000 // 8000 AS BIGINT),
      |  TRUE)
      |) AS t(aud_id, codec, channels, sample_rate, bits, n_samples,
      |       duration_ms, ok)
      |ORDER BY aud_id""".stripMargin

  /** GIF/BMP image decode — [[graft.operators.Multimodal
    * .decodePixels]] now admits both pure-JDK ImageIO formats, so the
    * whole pixel stack (stats, dHash, textiness, near-dup) reads what
    * crawls actually deliver. Closed forms: BMP is lossless RGB and a
    * 2-color GIF palette-quantizes exactly, so every value is pixel
    * arithmetic — the gradient BMP's dHash is all-ones (right cell
    * always brighter), the two-tone GIF sets exactly the two grid
    * columns straddling the split (bits 3,4 of every row =
    * 0x1818181818181818) and scores 5·(32/992) on textiness.
    */
  private def q160(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val bmp = M.renderImage("bmp", 18, 16, (x, _) => gray(x * 10))
    val gif = M.renderImage("gif", 32, 32,
      (x, _) => if (x < 16) gray(10) else gray(250))
    val imgs = Seq(
      (1L, bmp), (2L, gif), (3L, "not an image".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    M.imageStats(imgs)
      .select(col("img_id"),
        col("stats.width").as("width"), col("stats.height").as("height"),
        round(col("stats.avg_r"), 4).as("avg_r"),
        M.dhash64Col(col("content")).as("dhash"),
        col("stats.textiness").as("textiness"),
        col("stats.ok").as("ok"))
      .orderBy(col("img_id"))
  }

  private def gifBmpOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 18, 16, round(85/255.0, 4),
      |  CAST(-1 AS BIGINT), 0.0, TRUE),
      | (CAST(2 AS BIGINT), 32, 32, round(130/255.0, 4),
      |  CAST(1736164148113840152 AS BIGINT), round(5 * (32.0/992), 6), TRUE),
      | (CAST(3 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
      |  FALSE)
      |) AS t(img_id, width, height, avg_r, dhash, textiness, ok)
      |ORDER BY img_id""".stripMargin

  /** EXIF GPS PII flag ([[graft.operators.Multimodal.exifGpsPresent]]
    * — TIFF tag 0x8825 in IFD0, the "this photo embeds a capture
    * location" release-gate signal; the scrub path is
    * [[graft.operators.Multimodal.resizeImages]]'s EXIF-free PNG
    * re-encode): a spliced big-endian EXIF block with the GPS IFD
    * pointer flags true, an orientation-only block and a bare JPEG
    * flag false, decodable non-JPEG rasters report FALSE at the
    * stats surface (a format that cannot carry EXIF is location-free,
    * not unknown), junk degrades. All header arithmetic — literal
    * oracle.
    */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val base = M.renderJpeg(16, 16, (_, _) => (128 << 16) | (128 << 8) | 128)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.putShort(tag.toShort).putShort(typ.toShort)
        .putInt(count.toInt).putInt(value.toInt)
      bb.array()
    }
    def withExif(jpeg: Array[Byte], gps: Boolean): Array[Byte] = {
      val n = if (gps) 2 else 1
      val ifdBytes = 2 + 12 * n + 4
      // orientation SHORT=1 left-justified; GPS pointer LONG -> an
      // empty GPS IFD placed right after IFD0
      val entries =
        entry(0x0112, 3, 1L, 0x00010000L) ++
          (if (gps) entry(0x8825, 4, 1L, (8 + ifdBytes).toLong)
           else Array.emptyByteArray)
      val gpsIfd = if (gps) Array[Byte](0, 0, 0, 0, 0, 0) else Array.emptyByteArray
      val tiff = "MM".getBytes("ISO-8859-1") ++ Array[Byte](0, 42, 0, 0, 0, 8) ++
        Array[Byte](0, n.toByte) ++ entries ++ Array[Byte](0, 0, 0, 0) ++ gpsIfd
      val payload = "Exif".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++ tiff
      val app1 = Array(0xFF.toByte, 0xE1.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte,
        ((payload.length + 2) & 0xff).toByte) ++ payload
      jpeg.take(2) ++ app1 ++ jpeg.drop(2)
    }
    val imgs = Seq(
      (1L, base),
      (2L, withExif(base, gps = true)),
      (3L, withExif(base, gps = false)),
      (4L, M.renderPng(8, 8, (_, _) => 0x123456)),
      (5L, "junk".getBytes("UTF-8")),
      // PNG carries EXIF too since the 2017 eXIf chunk — decode must
      // still read the raster THROUGH the spliced chunk (round 13)
      (6L, M.pngWithExif(M.renderPng(8, 8, (_, _) => 0x123456), gps = true)),
      (7L, M.pngWithExif(M.renderPng(8, 8, (_, _) => 0x123456), gps = false))
    ).toDF("img_id", "content")
    M.imageStats(imgs)
      .select(col("img_id"), col("stats.exif_gps").as("exif_gps"),
        col("stats.ok").as("ok"))
      .orderBy(col("img_id"))
  }

  private def exifGpsOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), FALSE, TRUE),
      | (CAST(2 AS BIGINT), TRUE, TRUE),
      | (CAST(3 AS BIGINT), FALSE, TRUE),
      | (CAST(4 AS BIGINT), FALSE, TRUE),
      | (CAST(5 AS BIGINT), CAST(NULL AS BOOLEAN), FALSE),
      | (CAST(6 AS BIGINT), TRUE, TRUE),
      | (CAST(7 AS BIGINT), FALSE, TRUE)
      |) AS t(img_id, exif_gps, ok)
      |ORDER BY img_id""".stripMargin

  /** WebP header facts ([[graft.operators.Multimodal.webpInfo]] — the
    * dominant crawled-image format the JDK can't decode): `VP8 `
    * lossy sync + 14-bit dims, `VP8L` lossless bit-packed dims +
    * alpha, `VP8X` extended canvas + flags, and the RIFF `EXIF`
    * chunk's GPS pointer feeding the same PII flag as a JPEG APP1
    * (q161 discipline). The decode kernel reports format/dims/
    * channels; imageStats classifies the asset as an IMAGE with real
    * dimensions (pixel stats stay null — header facts, no VP8
    * decoder), so a WebP-heavy crawl's card reads pct_image, not
    * pct_undecodable. All header arithmetic — literal oracle.
    */
  private def q162(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    // little-endian TIFF whose IFD0 carries the GPS pointer (0x8825)
    val gpsTiff = "Exif".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++
      "II".getBytes("ISO-8859-1") ++ Array[Byte](42, 0, 8, 0, 0, 0) ++
      Array[Byte](1, 0) ++ // one IFD0 entry
      Array[Byte](0x25, 0x88.toByte, 4, 0, 1, 0, 0, 0, 0, 0, 0, 0) ++
      Array[Byte](0, 0, 0, 0) // no next IFD
    val imgs = Seq(
      (1L, M.syntheticWebp("vp8", 320, 240)),
      (2L, M.syntheticWebp("vp8l", 33, 17, alpha = true)),
      (3L, M.syntheticWebp("vp8x", 640, 360, alpha = true,
        extraChunks = Seq("EXIF" -> gpsTiff))),
      (4L, "not a webp".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    M.imageStats(M.decode(imgs))
      .select(col("img_id"),
        col("decoded.format").as("format"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        col("decoded.channels").as("channels"),
        col("stats.ok").as("is_image"),
        col("stats.exif_gps").as("exif_gps"))
      .orderBy(col("img_id"))
  }

  private def webpOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'webp-vp8', 320, 240, 3, TRUE, FALSE),
      | (CAST(2 AS BIGINT), 'webp-vp8l', 33, 17, 4, TRUE, FALSE),
      | (CAST(3 AS BIGINT), 'webp-vp8x', 640, 360, 4, TRUE, TRUE),
      | -- the 10-byte junk row rides the deterministic raw stub:
      | -- width 64 + len%1024, height 64 + len*31%1024
      | (CAST(4 AS BIGINT), 'raw', 64 + 10, 64 + 310, 3, FALSE,
      |  CAST(NULL AS BOOLEAN))
      |) AS t(img_id, format, width, height, channels, is_image, exif_gps)
      |ORDER BY img_id""".stripMargin

  /** AAC header facts — ADTS frame walk
    * ([[graft.operators.Multimodal.adtsAudioInfo]]: sync scan with
    * the q154 dual-frame anchor, 1024 samples per raw data block →
    * exact duration, mean bitrate from the 13-bit frame lengths) and
    * audio-only ISO-BMFF ([[graft.operators.Multimodal.m4aAudioInfo]]:
    * `mp4a` sample-entry channels + 16.16 rate, mdhd duration on the
    * sample-rate clock; a non-mp4a entry reports its own fourcc).
    * With MPEG/FLAC/Opus this completes the crawled-audio codec set;
    * every value is a closed form of the fixture arguments.
    */
  private def q163(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val streams = Seq(
      (1L, M.syntheticAdts(1, 3, 2, Seq(50, 60, 70), id3Bytes = 20)),
      (2L, M.syntheticAdts(0, 11, 1, Seq(10))),
      (3L, M.syntheticM4a(2, 44100, 441000L)),
      (4L, M.syntheticM4a(1, 22050, 11025L, codec = "alac")),
      (5L, "junk bytes".getBytes("UTF-8"))
    ).toDF("aud_id", "content")
    M.audioStats(streams)
      .select(col("aud_id"), col("audio.codec").as("codec"),
        col("audio.channels").as("channels"),
        col("audio.sample_rate").as("sample_rate"),
        col("audio.n_samples").as("n_samples"),
        col("audio.duration_ms").as("duration_ms"),
        col("audio.bitrate_kbps").as("bitrate_kbps"),
        col("audio.ok").as("ok"))
      .orderBy(col("aud_id"))
  }

  private def aacOracle: String =
    """SELECT * FROM (VALUES
      | -- 3 LC frames at 48 kHz stereo: lengths 57/67/77, 3072 samples
      | (CAST(1 AS BIGINT), 'aac-lc', 2, 48000, CAST(3072 AS BIGINT),
      |  CAST(3072 * 1000 // 48000 AS BIGINT),
      |  round((57 + 67 + 77) * 8 * 48000.0 / 3072 / 1000, 3), TRUE),
      | -- 1 Main frame at 8 kHz mono: length 17, 1024 samples
      | (CAST(2 AS BIGINT), 'aac-main', 1, 8000, CAST(1024 AS BIGINT),
      |  CAST(1024 * 1000 // 8000 AS BIGINT),
      |  round(17 * 8 * 8000.0 / 1024 / 1000, 3), TRUE),
      | (CAST(3 AS BIGINT), 'aac', 2, 44100, CAST(441000 AS BIGINT),
      |  CAST(441000 * 1000 // 44100 AS BIGINT), CAST(NULL AS DOUBLE), TRUE),
      | (CAST(4 AS BIGINT), 'alac', 1, 22050, CAST(11025 AS BIGINT),
      |  CAST(11025 * 1000 // 22050 AS BIGINT), CAST(NULL AS DOUBLE), TRUE),
      | (CAST(5 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
      |  CAST(NULL AS INTEGER), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
      |  CAST(NULL AS DOUBLE), FALSE)
      |) AS t(aud_id, codec, channels, sample_rate, n_samples, duration_ms,
      |       bitrate_kbps, ok)
      |ORDER BY aud_id""".stripMargin

  /** Corpus-scale EXACT video dedup — q156's discipline for the
    * keyframe byte-range path: one `avc1` MP4 per document, sample
    * payloads a closed form of `doc_id % 11` (identical inside a
    * class, distinct across — an xxhash64 collision of distinct
    * 64+-byte payloads is the only failure mode, and the 11 fixed
    * payload sets make that a build-time-checkable non-event), with
    * per-document MUX jitter (timescale, frame duration, chunk
    * layout) that re-muxing changes and the sample bytes don't see.
    * [[graft.operators.Dedup.videoDedupCorpus]] must therefore
    * recover exactly the residue classes at ANY scale factor —
    * restated by the oracle as doc_id arithmetic (q156 shape).
    */
  private def q164(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val rdd = docs.rdd.map { r =>
      val id = r.getLong(0)
      val cls = (id % 11).toInt
      // 4 opaque "avc1" samples per video, bytes a function of the
      // CLASS only; every sample is a sync sample (syncEvery = 1)
      val samples = (0 until 4).map(f =>
        Array.tabulate[Byte](64 + cls * 3 + f)(j =>
          ((cls * 131 + f * 29 + j * 7 + 17) & 0xff).toByte))
      val mp4 = graft.operators.Multimodal.syntheticMjpegMp4(samples,
        syncEvery = 1, timescale = 600 + (id % 5).toInt * 120,
        frameDurationTicks = 30 + (id % 4).toInt * 10, codec = "avc1",
        samplesPerChunk = 1 + (id % 3).toInt)
      org.apache.spark.sql.Row(id, mp4)
    }
    // mux ONCE: the corpus dedup reads the frame twice (signature
    // derivation + the final keep join)
    val vids = s.createDataFrame(rdd, schema).localCheckpoint(false)
    graft.operators.Dedup.videoDedupCorpus(vids, "doc_id", "content")
      .groupBy((col("doc_id") % 11).as("vid_class"))
      .agg(count(lit(1)).as("n"),
        min(col("dup_class")).as("class_min"),
        max(col("dup_class")).as("class_max"), // == class_min: one class
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .orderBy(col("vid_class"))
  }

  private def videoCorpusOracle: String =
    """SELECT doc_id % 11 AS vid_class, count(*) AS n,
      | CAST(doc_id % 11 AS BIGINT) AS class_min,
      | CAST(doc_id % 11 AS BIGINT) AS class_max,
      | CAST(1 AS BIGINT) AS n_keep
      |FROM documents GROUP BY doc_id % 11 ORDER BY vid_class""".stripMargin

  /** Corpus-scale audio dedup — q156's discipline for the waveform
    * path: one mono PCM WAV per document whose ENVELOPE LADDER is a
    * closed form of `doc_id % 19`. The 9 duration-relative windows
    * of [[graft.operators.Multimodal.audioHash64]] get amplitudes
    * walking ±100 from 1000 by the class's bit pattern, so window
    * t vs t+1 energy comparisons equal the class bits in EVERY
    * difference row (a ±A period-2 square's r-th difference is a
    * ±2^r·A period-2 square, scaling all window energies by 4^r):
    * classes are Hamming-0 inside and ≥ 8 bits apart — outside the
    * default maxHamming = 6 gate. Per-document jitter exercises the
    * PROVEN invariances: integer gain (energies scale by g²,
    * comparisons unchanged) and k× sample-repeat (bit-identical by
    * the fixed-grid floor identity). The oracle restates the dedup
    * outcome as doc_id arithmetic.
    */
  private def q165(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val rdd = docs.rdd.map { r =>
      val id = r.getLong(0)
      val cls = (id % 19).toInt
      val gain = 1 + (id % 16).toInt // amp ≤ 1800·16 < 2^15: exact fold
      val rep = 1 + (id % 3).toInt // sample-repeat: grid-exact resample
      val amps = new Array[Int](9)
      amps(0) = 1000
      var t = 0
      while (t < 8) {
        amps(t + 1) = amps(t) + (if (((cls >> t) & 1) != 0) 100 else -100)
        t += 1
      }
      // base stream on the hash's own grid (4096 frames at 8 kHz),
      // windowed with the SAME floor boundaries audioHashOf uses
      val base = new Array[Short](4096)
      var w = 0
      while (w < 9) {
        var i = w * 4096 / 9
        val x1 = (w + 1) * 4096 / 9
        while (i < x1) {
          base(i) = (amps(w) * gain * (if (i % 2 == 0) 1 else -1)).toShort
          i += 1
        }
        w += 1
      }
      val samples = new Array[Short](4096 * rep)
      var i = 0
      while (i < samples.length) { samples(i) = base(i / rep); i += 1 }
      org.apache.spark.sql.Row(id,
        graft.operators.Multimodal.renderWav(8000, 1, samples))
    }
    // render ONCE (the q156/q164 checkpoint discipline)
    val wavs = s.createDataFrame(rdd, schema).localCheckpoint(false)
    graft.operators.Dedup.audioDedupCorpus(wavs, "doc_id", "content")
      .groupBy((col("doc_id") % 19).as("aud_class"))
      .agg(count(lit(1)).as("n"),
        min(col("dup_class")).as("class_min"),
        max(col("dup_class")).as("class_max"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .orderBy(col("aud_class"))
  }

  private def audioCorpusOracle: String =
    """SELECT doc_id % 19 AS aud_class, count(*) AS n,
      | CAST(doc_id % 19 AS BIGINT) AS class_min,
      | CAST(doc_id % 19 AS BIGINT) AS class_max,
      | CAST(1 AS BIGINT) AS n_keep
      |FROM documents GROUP BY doc_id % 19 ORDER BY aud_class""".stripMargin

  /** TIFF decode — the JDK has shipped an ImageIO TIFF plugin since
    * 9, so TIFF rides the full PIXEL path (lossless → exact means,
    * the q160 BMP discipline): header facts from the IFD0 walk
    * ([[graft.operators.Multimodal.decodeTiff]], both byte orders,
    * SHORT and LONG dims), real rasters through [[graft.operators
    * .Multimodal.decodePixels]], and the GPS PII flag read from the
    * file's OWN IFD0 — a TIFF is its own EXIF block, the third
    * carrier after JPEG APP1 and the WebP EXIF chunk. Rows: an
    * ImageIO-written gradient (writer→reader round trip), a
    * hand-rolled solid with the GPS pointer, junk on the raw stub.
    */
  private def q166(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val imgs = Seq(
      (1L, M.renderImage("tiff", 18, 12, (x, _) => gray(x * 10))),
      (2L, M.syntheticTiff(16, 9, (_, _) => (90 << 16) | (140 << 8) | 200,
        gps = true)),
      (3L, "not a tiff".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    M.imageStats(M.decode(imgs))
      .select(col("img_id"),
        col("decoded.format").as("format"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        round(col("stats.avg_r"), 4).as("avg_r"),
        round(col("stats.avg_b"), 4).as("avg_b"),
        col("stats.textiness").as("textiness"),
        col("stats.exif_gps").as("exif_gps"),
        col("stats.ok").as("is_image"))
      .orderBy(col("img_id"))
  }

  private def tiffOracle: String =
    """SELECT * FROM (VALUES
      | -- 18-wide x*10 gradient: mean gray = 10*153/18 = 85; 10-step
      | -- edges are below the textiness sharpness bar (q160 rule)
      | (CAST(1 AS BIGINT), 'tiff', 18, 12, round(85/255.0, 4),
      |  round(85/255.0, 4), 0.0, FALSE, TRUE),
      | (CAST(2 AS BIGINT), 'tiff', 16, 9, round(90/255.0, 4),
      |  round(200/255.0, 4), 0.0, TRUE, TRUE),
      | -- junk rides the raw stub: width 64 + len%1024, height
      | -- 64 + len*31%1024 at len = 10
      | (CAST(3 AS BIGINT), 'raw', 74, 374, CAST(NULL AS DOUBLE),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
      |  CAST(NULL AS BOOLEAN), FALSE)
      |) AS t(img_id, format, width, height, avg_r, avg_b, textiness,
      |       exif_gps, is_image)
      |ORDER BY img_id""".stripMargin

  /** VP8L (lossless WebP) PIXEL decode — the round-11 header walk
    * graduated to a full [[graft.operators.Vp8l]] bitstream decoder,
    * so the lossless subset of the dominant crawled format now rides
    * the ENTIRE pixel stack: exact stats means, textiness, and —
    * the dedup headline — container-invariant dHash: a WebP
    * re-encode of a PNG is a Hamming-0 twin (rows 1 and 2 carry
    * IDENTICAL literals below, which IS the assertion). Lossy VP8
    * (row 4) stays header-facts-only: real dims, null pixel stats.
    * Every value is integer-exact (lossless decode of two-tone
    * streams, the q155/q160 closed-form discipline).
    */
  private def q167(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = 0xff000000 | (v << 16) | (v << 8) | v
    def stripes(x: Int, y: Int): Boolean = x % 8 >= 4
    val imgs = Seq(
      (1L, M.renderPng(64, 64,
        (x, y) => if (stripes(x, y)) 0xebebeb else 0x141414)),
      (2L, M.syntheticVp8lTwoTone(64, 64, stripes, gray(20), gray(235))),
      (3L, M.syntheticVp8lTwoTone(24, 16, (_, _) => false, gray(77), gray(77))),
      (4L, M.syntheticWebp("vp8", 320, 240)),
      (5L, "not an image".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    M.imageStats(imgs)
      .select(col("img_id"),
        col("stats.width").as("width"), col("stats.height").as("height"),
        round(col("stats.avg_r"), 4).as("avg_r"),
        col("stats.textiness").as("textiness"),
        M.dhash64Col(col("content")).as("dhash"),
        col("stats.ok").as("is_image"))
      .orderBy(col("img_id"))
  }

  private def vp8lOracle: String =
    """SELECT * FROM (VALUES
      | -- PNG stripes and their VP8L twin: IDENTICAL rows — pixel
      | -- equality across containers is the oracle's point
      | (CAST(1 AS BIGINT), 64, 64, round(127.5/255, 4), 1.0,
      |  CAST(578721382704613384 AS BIGINT), TRUE),
      | (CAST(2 AS BIGINT), 64, 64, round(127.5/255, 4), 1.0,
      |  CAST(578721382704613384 AS BIGINT), TRUE),
      | (CAST(3 AS BIGINT), 24, 16, round(77/255.0, 4), 0.0,
      |  CAST(0 AS BIGINT), TRUE),
      | -- lossy VP8: an image with real dims, no pixel facts
      | (CAST(4 AS BIGINT), 320, 240, CAST(NULL AS DOUBLE),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), TRUE),
      | (CAST(5 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
      |  FALSE)
      |) AS t(img_id, width, height, avg_r, textiness, dhash, is_image)
      |ORDER BY img_id""".stripMargin

  /** AVIF header facts ([[graft.operators.Multimodal.avifInfo]]:
    * brand scan incl. compatible-brand-only files, `meta/iprp/ipco`
    * walk for `ispe` dims and `pixi` channels) — the q162 discipline
    * for the other format modern crawls deliver in volume. The ftyp
    * dispatch is the point of row 3: an ISO-BMFF MOVIE must still
    * read as mp4/video, not as an image. Pixel decode stays out of
    * pure-JDK scope (AV1, like lossy VP8) but the GPS PII flag is
    * REAL: row 5's EXIF item is resolved through the HEIF
    * `iinf`/`iloc` indirection ([[graft.operators.Multimodal
    * .avifExifRegion]]) and its TIFF block scanned for tag 0x8825;
    * a GPS-less AVIF reports false ("location-free"), not unknown.
    * Row 8 exercises iloc construction method 1 (extents relative to
    * `meta/idat` — the iOS/encoder layout); row 9 is the fail-closed
    * lock: an EXIF item whose idat is too short for its extent must
    * report UNKNOWN (null), never false — a privacy gate built on
    * this flag cannot be allowed to fail open.
    */
  private def q168(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val idatGps = M.syntheticAvif(320, 200, gps = true, idatExif = true)
    // hostile twin: shrink the idat box 4 bytes so the extent overruns
    val truncIdat = java.util.Arrays.copyOf(idatGps, idatGps.length)
    locally {
      var i = 0
      while (!(truncIdat(i + 4) == 'i' && truncIdat(i + 5) == 'd' &&
        truncIdat(i + 6) == 'a' && truncIdat(i + 7) == 't')) i += 1
      val bb = java.nio.ByteBuffer.wrap(truncIdat, i, 4)
      val old = bb.getInt
      java.nio.ByteBuffer.wrap(truncIdat, i, 4).putInt(old - 4)
    }
    val rows = Seq(
      (1L, M.syntheticAvif(800, 600)),
      (2L, M.syntheticAvif(128, 128, channels = 4)),
      (3L, M.syntheticMp4(32, 32, 2000L)),
      (4L, "not an avif".getBytes("UTF-8")),
      (5L, M.syntheticAvif(320, 200, gps = true)),
      // HEIC (the iPhone default) shares the whole HEIF walk: dims,
      // brand-derived format, and the same GPS item indirection
      (6L, M.syntheticAvif(4032, 3024, brand = "heic")),
      (7L, M.syntheticAvif(640, 480, gps = true, brand = "heix")),
      (8L, idatGps),
      (9L, truncIdat)
    ).toDF("img_id", "content")
    M.imageStats(M.decode(rows))
      .select(col("img_id"),
        col("decoded.format").as("format"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        col("decoded.channels").as("channels"),
        col("stats.ok").as("is_image"),
        col("stats.exif_gps").as("gps"))
      .orderBy(col("img_id"))
  }

  private def avifOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'avif', 800, 600, 3, TRUE, FALSE),
      | (CAST(2 AS BIGINT), 'avif', 128, 128, 4, TRUE, FALSE),
      | -- a movie stays on the mp4 path and is NOT an image
      | (CAST(3 AS BIGINT), 'mp4', 32, 32, CAST(NULL AS INTEGER), FALSE,
      |  CAST(NULL AS BOOLEAN)),
      | -- junk rides the raw stub at len = 11
      | (CAST(4 AS BIGINT), 'raw', 64 + 11, 64 + 341, 3, FALSE,
      |  CAST(NULL AS BOOLEAN)),
      | -- the iinf/iloc-resolved EXIF item carries the GPS pointer
      | (CAST(5 AS BIGINT), 'avif', 320, 200, 3, TRUE, TRUE),
      | (CAST(6 AS BIGINT), 'heic', 4032, 3024, 3, TRUE, FALSE),
      | (CAST(7 AS BIGINT), 'heic', 640, 480, 3, TRUE, TRUE),
      | -- idat-relative EXIF (iloc construction method 1) resolves
      | (CAST(8 AS BIGINT), 'avif', 320, 200, 3, TRUE, TRUE),
      | -- a declared EXIF item the walk CANNOT resolve is unknown,
      | -- never false: the privacy flag fails closed
      | (CAST(9 AS BIGINT), 'avif', 320, 200, 3, TRUE,
      |  CAST(NULL AS BOOLEAN))
      |) AS t(img_id, format, width, height, channels, is_image, gps)
      |ORDER BY img_id""".stripMargin

  /** Media card over the round-12/13 formats — the card-level
    * integration lock: a LOSSLESS WebP contributes full pixel stats
    * (decoded by [[graft.operators.Vp8l]]), a lossy WebP and an AVIF
    * contribute header dims as images, a GPS-tagged TIFF counts in
    * `pct_image_gps` (its own IFD0 is the EXIF block) and so does a
    * GPS-tagged AVIF (EXIF resolved through `iinf`/`iloc`) while the
    * GPS-less AVIF counts as location-FREE (false, a denominator
    * row), and an MP4 movie lands in the video share with its
    * keyframe count. Every value is a closed form of the builders'
    * arguments.
    */
  private def q169(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val rows = Seq(
      ("a", M.syntheticVp8lTwoTone(32, 16, (_, _) => false,
        0xff000000 | gray(51), 0xff000000 | gray(51))),
      ("a", M.syntheticWebp("vp8", 320, 240)),
      ("a", "xx".getBytes("UTF-8")),
      ("b", M.syntheticTiff(12, 6, (_, _) => (60 << 16) | (120 << 8) | 180,
        gps = true)),
      ("b", M.syntheticAvif(640, 360)),
      ("b", M.syntheticAvif(320, 200, gps = true)),
      ("b", M.syntheticMjpegMp4(Seq(M.renderJpeg(16, 8, (_, _) => gray(99)))))
    ).toDF("grp", "content")
    M.mediaCard(rows, "content", "grp").orderBy(col("grp"), col("metric"))
  }

  private def mediaFormatsOracle: String =
    """SELECT * FROM (VALUES
      | ('a', 'avg_audio_hz', CAST(NULL AS DOUBLE)),
      | ('a', 'avg_audio_rms', CAST(NULL AS DOUBLE)),
      | ('a', 'avg_audio_secs', CAST(NULL AS DOUBLE)),
      | ('a', 'avg_image_height', (16 + 240) / 2.0),
      | ('a', 'avg_image_luma', round(51/255.0, 4)),
      | ('a', 'avg_image_textiness', 0.0),
      | ('a', 'avg_image_width', (32 + 320) / 2.0),
      | ('a', 'avg_video_keyframes', CAST(NULL AS DOUBLE)),
      | ('a', 'avg_dialog_coverage', CAST(NULL AS DOUBLE)),
      | ('a', 'n_assets', 3.0),
      | ('a', 'pct_audio', 0.0),
      | ('a', 'pct_audio_clipped', CAST(NULL AS DOUBLE)),
      | ('a', 'pct_audio_silent', CAST(NULL AS DOUBLE)),
      | ('a', 'pct_audio_with_art', CAST(NULL AS DOUBLE)),
      | ('a', 'pct_audio_with_lyrics', CAST(NULL AS DOUBLE)),
      | ('a', 'pct_audio_with_chapters', CAST(NULL AS DOUBLE)),
      | ('a', 'pct_image', round(2/3.0, 4)),
      | ('a', 'pct_image_gps', 0.0),
      | ('a', 'pct_image_with_text', 0.0),
      | ('a', 'pct_image_with_thumb', 0.0),
      | ('a', 'pct_undecodable', round(1/3.0, 4)),
      | ('a', 'pct_video', 0.0),
      | ('a', 'pct_video_with_subs', CAST(NULL AS DOUBLE)),
      | ('b', 'avg_audio_hz', CAST(NULL AS DOUBLE)),
      | ('b', 'avg_audio_rms', CAST(NULL AS DOUBLE)),
      | ('b', 'avg_audio_secs', CAST(NULL AS DOUBLE)),
      | ('b', 'avg_image_height', round((6 + 360 + 200) / 3.0, 2)),
      | ('b', 'avg_image_luma', round(120/255.0, 4)),
      | ('b', 'avg_image_textiness', 0.0),
      | ('b', 'avg_image_width', (12 + 640 + 320) / 3.0),
      | ('b', 'avg_video_keyframes', 1.0),
      | -- the only video is the mvhd-less MJPEG: no declared duration,
      | -- no coverage claim
      | ('b', 'avg_dialog_coverage', CAST(NULL AS DOUBLE)),
      | ('b', 'n_assets', 4.0),
      | ('b', 'pct_audio', 0.0),
      | ('b', 'pct_audio_clipped', CAST(NULL AS DOUBLE)),
      | ('b', 'pct_audio_silent', CAST(NULL AS DOUBLE)),
      | ('b', 'pct_audio_with_art', CAST(NULL AS DOUBLE)),
      | ('b', 'pct_audio_with_lyrics', CAST(NULL AS DOUBLE)),
      | ('b', 'pct_audio_with_chapters', CAST(NULL AS DOUBLE)),
      | ('b', 'pct_image', 0.75),
      | ('b', 'pct_image_gps', round(2/3.0, 4)),
      | ('b', 'pct_image_with_text', 0.0),
      | ('b', 'pct_image_with_thumb', 0.0),
      | ('b', 'pct_undecodable', 0.0),
      | ('b', 'pct_video', 0.25),
      | ('b', 'pct_video_with_subs', 0.0)
      |) AS t(grp, metric, value)
      |ORDER BY grp, metric""".stripMargin

  /** Declared audio metadata ([[graft.operators.Multimodal
    * .audioTags]]) — ID3v2.2 (3-char frames), ID3v2.3 (UTF-16 text,
    * plain frame sizes; also unsynchronised), ID3v2.4 (UTF-8,
    * syncsafe sizes), M4A `ilst` atoms, the Vorbis comments of FLAC
    * (metadata block 4), Ogg-Opus (`OpusTags`) and Ogg-Vorbis, the
    * WAV `LIST INFO` chunk, and the Matroska `Tags` tree: the
    * curation surface for grouping/filtering an audio corpus by what
    * its files SAY they are, next to the stats walk's facts about
    * what they ARE. Untagged audio and junk report all-null tags.
    */
  private def q170(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val rows = Seq(
      (1L, M.syntheticId3(3, "Song One", "The Band", "LP") ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (2L, M.syntheticId3(4, "Zweites Lied", "Künstler", "Älbum") ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (3L, M.syntheticM4aTagged(2, 44100, 441000L, "Third", "Trio",
        "Collection")),
      (4L, M.syntheticM4a(1, 8000, 800L)),
      (5L, "junk".getBytes("UTF-8")),
      (6L, M.syntheticId3(2, "Vieux Titre", "Duo Rétro", "EP 78") ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (7L, M.syntheticId3(3, "Caché", "La Bande ÿ", "Disque", unsync = true) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (8L, M.syntheticFlacTagged(48000, 2, 16, 96000L,
        "Flac Lied", "Zwei Hände", "Verlustfrei")),
      (9L, M.syntheticOpusTagged(2, 120, 48000, 48120L,
        "Opus Ode", "Der Sänger", "Œuvre")),
      (10L, M.syntheticFlac(22050, 1, 8, 55125L)), // no comment block
      (11L, M.syntheticVorbis(2, 44100, 88200L,
        tags = Some(("Vorbis Väg", "Okänd Kör", "Ogg Classics")))),
      (12L, M.wavWithInfoTags(M.renderWav(8000, 1,
        Array.tabulate[Short](80)(i => (i * 100).toShort)),
        "Wave Title", "PCM Artist", "Lossless LP")),
      (13L, M.syntheticWebm("audio", channels = 2, sampleRate = 48000,
        durationMs = 2000L, codec = "A_OPUS",
        tags = Some(("Matroska Lied", "Webm Wölfe", "Container LP")))),
      (14L, M.renderAiff(8000, 1,
        Array.tabulate[Short](16)(i => (i * 100).toShort),
        name = "Aiff Air", author = "Endian Ensemble"))
    ).toDF("aud_id", "content")
    M.audioTags(rows)
      .select(col("aud_id"), col("tags.title").as("title"),
        col("tags.artist").as("artist"), col("tags.album").as("album"),
        col("tags.tag_format").as("tag_format"))
      .orderBy(col("aud_id"))
  }

  private def audioTagsOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'Song One', 'The Band', 'LP', 'id3v2.3'),
      | (CAST(2 AS BIGINT), 'Zweites Lied', 'Künstler', 'Älbum',
      |  'id3v2.4'),
      | (CAST(3 AS BIGINT), 'Third', 'Trio', 'Collection', 'm4a'),
      | (CAST(4 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
      | (CAST(5 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
      | (CAST(6 AS BIGINT), 'Vieux Titre', 'Duo Rétro', 'EP 78',
      |  'id3v2.2'),
      | (CAST(7 AS BIGINT), 'Caché', 'La Bande ÿ', 'Disque', 'id3v2.3'),
      | (CAST(8 AS BIGINT), 'Flac Lied', 'Zwei Hände', 'Verlustfrei',
      |  'flac'),
      | (CAST(9 AS BIGINT), 'Opus Ode', 'Der Sänger', 'Œuvre', 'opus'),
      | (CAST(10 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
      | (CAST(11 AS BIGINT), 'Vorbis Väg', 'Okänd Kör', 'Ogg Classics',
      |  'vorbis'),
      | (CAST(12 AS BIGINT), 'Wave Title', 'PCM Artist', 'Lossless LP',
      |  'wav'),
      | (CAST(13 AS BIGINT), 'Matroska Lied', 'Webm Wölfe', 'Container LP',
      |  'matroska'),
      | -- AIFF has no album convention: NAME/AUTH only
      | (CAST(14 AS BIGINT), 'Aiff Air', 'Endian Ensemble',
      |  CAST(NULL AS VARCHAR), 'aiff')
      |) AS t(aud_id, title, artist, album, tag_format)
      |ORDER BY aud_id""".stripMargin

  /** Dedup report ([[graft.operators.Dedup.dedupReport]]) over
    * [[graft.operators.Dedup.exactDedupCorpus]] — per-source
    * duplication numbers from PLANTED classes: documents below 250
    * share 7 residue texts (all-dup), the rest are unique; sources
    * are the doc_id parity. The oracle replays the whole pipeline
    * (fingerprint classes → keeper → per-group aggregation) in SQL,
    * so class membership, keeper choice, distinct-class counts and
    * the within-group max class size are all checked at once.
    */
  private def q171(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") < 250,
        concat(lit("T"), (col("doc_id") % 7).cast("string")))
        .otherwise(concat(lit("U"), col("doc_id").cast("string"))).as("t"),
      (col("doc_id") % 2).as("grp"))
    graft.operators.Dedup.dedupReport(
      graft.operators.Dedup.exactDedupCorpus(docs, "doc_id", "t"), "grp")
      .orderBy(col("grp"))
  }

  private def dedupReportOracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, doc_id % 2 AS grp,
      |    CASE WHEN doc_id < 250 THEN 'T' || CAST(doc_id % 7 AS VARCHAR)
      |         ELSE 'U' || CAST(doc_id AS VARCHAR) END AS t
      |  FROM documents),
      |cls AS (SELECT t, count(*) AS cn, min(doc_id) AS keeper
      |        FROM corpus GROUP BY t),
      |j AS (SELECT c.doc_id, c.grp, c.t, cl.cn, cl.keeper
      |      FROM corpus c JOIN cls cl USING (t)),
      |perclass AS (SELECT grp, t, count(*) AS cs FROM j
      |             WHERE cn > 1 GROUP BY grp, t)
      |SELECT g.grp AS grp, g.n_docs, g.n_in_dup_classes, g.n_dropped,
      |  round(g.n_dropped / CAST(g.n_docs AS DOUBLE), 4) AS pct_redundant,
      |  p.ncls AS n_dup_classes, p.mx AS max_class_rows
      |FROM (SELECT grp, count(*) AS n_docs,
      |        CAST(sum(CASE WHEN cn > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS n_in_dup_classes,
      |        CAST(sum(CASE WHEN cn > 1 AND doc_id != keeper
      |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      |      FROM j GROUP BY grp) g
      |JOIN (SELECT grp, count(*) AS ncls, max(cs) AS mx
      |      FROM perclass GROUP BY grp) p USING (grp)
      |ORDER BY grp""".stripMargin

  /** Span-surgery report ([[graft.operators.Dedup.spanSurgeryReport]]
    * — [[graft.operators.Dedup.dedupReport]]'s twin for the
    * ExactSubstr/CUT convention): q158's literal documents with a
    * group column, run through the whole duplicatedSpans → cutSpans →
    * report pipeline. The oracle replays the arithmetic over the SAME
    * literals — q158 already pins the cut strings byte-exactly, so
    * the report's character math is `length()` over known strings and
    * the token math is the planted run lengths (5 in group a, 3 in
    * group b; first occurrences keep, so one cut doc per group and a
    * clean doc dilutes group b).
    */
  private def q172(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Seq(
      ("a", 1L, "alpha beta gamma delta epsilon zeta"),
      ("a", 2L, "one two alpha beta gamma delta epsilon seven"),
      ("b", 3L, "Foo  BAR baz"),
      ("b", 4L, "x  q Foo BAR baz y  z"),
      ("b", 5L, "totally unique words here")
    ).toDF("grp", "doc_id", "text")
    val spans = graft.operators.Dedup.duplicatedSpans(docs, "doc_id", "text",
      windowTokens = 3, minCount = 2, keepFirst = true)
    val cut = graft.operators.Dedup.cutSpans(docs, spans, "doc_id", "text")
    graft.operators.Dedup.spanSurgeryReport(cut, spans, "doc_id", "grp", "text")
      .orderBy(col("grp"))
  }

  private def spanSurgeryOracle: String =
    """WITH m AS (SELECT * FROM (VALUES
      | -- (grp, text, text_cut, n_spans, tokens_cut) — the cut strings
      | -- are q158's byte-exact literals; clean docs cut nothing
      | ('a', 'alpha beta gamma delta epsilon zeta',
      |  'alpha beta gamma delta epsilon zeta', 0, 0),
      | ('a', 'one two alpha beta gamma delta epsilon seven',
      |  'one two seven', 1, 5),
      | ('b', 'Foo  BAR baz', 'Foo  BAR baz', 0, 0),
      | ('b', 'x  q Foo BAR baz y  z', 'x  q y  z', 1, 3),
      | ('b', 'totally unique words here',
      |  'totally unique words here', 0, 0)
      |) AS t(grp, text, text_cut, n_spans, tokens_cut))
      |SELECT grp,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN n_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_docs_cut,
      |  CAST(sum(n_spans) AS BIGINT) AS n_spans,
      |  CAST(sum(tokens_cut) AS BIGINT) AS tokens_cut,
      |  CAST(sum(length(text)) AS BIGINT) AS chars_in,
      |  CAST(sum(length(text) - length(text_cut)) AS BIGINT) AS chars_cut,
      |  round(sum(length(text) - length(text_cut))
      |    / CAST(sum(length(text)) AS DOUBLE), 6) AS pct_chars_cut
      |FROM m GROUP BY grp ORDER BY grp""".stripMargin

  /** Animated-image structural facts ([[graft.operators.Multimodal
    * .animationInfo]] — GIF: frame count from image descriptors, GCE
    * delays, the NETSCAPE2.0 loop count, all WITHOUT an LZW decode;
    * animated WebP: `ANMF` frame chunks + the `ANIM` loop count):
    * what tells a 500-frame meme apart from a photo in an image
    * corpus, across both containers the web serves memes in.
    * Animations stay images — the same rows run the pixel/header
    * stack (`is_image`/dims), so the two surfaces are locked
    * together.
    */
  private def q174(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val rows = Seq(
      (1L, M.syntheticGif(Seq(25, 50, 100), loops = Some(0))),
      (2L, M.syntheticGif(Seq(10), loops = Some(7))),
      (3L, M.renderImage("gif", 6, 4, (_, _) => 0x112233)), // still
      (4L, M.renderPng(8, 8, (_, _) => 0x445566)), // not animated
      (5L, "junk".getBytes("UTF-8")),
      (6L, M.syntheticAnimatedWebp(Seq(40, 60, 100), loops = 3)),
      (7L, M.syntheticAnimatedWebp(Seq(500), loops = 0))
    ).toDF("img_id", "content")
    val withAnim = M.imageStats(rows).rdd // reuse stats; add anim facts
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("img_id", LongType, nullable = false),
      StructField("frames", IntegerType),
      StructField("duration_ms", LongType),
      StructField("loops", IntegerType),
      StructField("is_image", BooleanType, nullable = false),
      StructField("width", IntegerType)))
    val out = withAnim.map { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      val st = r.getAs[org.apache.spark.sql.Row]("stats")
      // full path, not the M alias: a module alias captured in an RDD
      // closure serializes the (non-serializable) object
      graft.operators.Multimodal.animationInfo(bytes) match {
        case Some(g) => org.apache.spark.sql.Row(r.getAs[Long]("img_id"),
          g.frames, g.durationMs, g.loops, st.getAs[Boolean]("ok"),
          st.getAs[Integer]("width"))
        case None => org.apache.spark.sql.Row(r.getAs[Long]("img_id"),
          null, null, null, st.getAs[Boolean]("ok"),
          st.getAs[Integer]("width"))
      }
    }
    s.createDataFrame(out, schema).orderBy(col("img_id"))
  }

  private def gifAnimOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 3, CAST(1750 AS BIGINT), 0, TRUE, 1),
      | (CAST(2 AS BIGINT), 1, CAST(100 AS BIGINT), 7, TRUE, 1),
      | -- an encoder still: one frame, no delays, no loop extension
      | (CAST(3 AS BIGINT), 1, CAST(0 AS BIGINT), CAST(NULL AS INTEGER),
      |  TRUE, 6),
      | (CAST(4 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
      |  CAST(NULL AS INTEGER), TRUE, 8),
      | (CAST(5 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
      |  CAST(NULL AS INTEGER), FALSE, CAST(NULL AS INTEGER)),
      | -- animated WebP: ANMF durations are already milliseconds
      | (CAST(6 AS BIGINT), 3, CAST(200 AS BIGINT), 3, TRUE, 16),
      | (CAST(7 AS BIGINT), 1, CAST(500 AS BIGINT), 0, TRUE, 16)
      |) AS t(img_id, frames, duration_ms, loops, is_image, width)
      |ORDER BY img_id""".stripMargin

  /** Matroska/WebM header facts ([[graft.operators.Multimodal
    * .webmInfo]] — EBML walk: DocType, primary-modality track
    * selection, PixelWidth/Height, float Duration × TimecodeScale,
    * audio clock, Cues seek-table count): the container half the
    * web's `<video>` tags actually serve, previously classified
    * undecodable. Video rows carry dims + the Cues keyframe count;
    * audio-primary rows flow through [[graft.operators.Multimodal
    * .audioStats]] with the container-codec name and the duration
    * rescaled onto the sample clock. Every value is a closed form of
    * the builders' arguments.
    */
  private def q173(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val rows = Seq(
      (1L, M.syntheticWebm("video", width = 1280, height = 720,
        durationMs = 6000L, codec = "V_VP9", cuePoints = 12)),
      (2L, M.syntheticWebm("audio", channels = 2, sampleRate = 48000,
        durationMs = 2000L, codec = "A_OPUS")),
      (3L, M.syntheticWebm("audio", channels = 1, sampleRate = 24000,
        durationMs = 2000L, codec = "A_VORBIS", docType = "matroska")),
      (4L, "not a webm".getBytes("UTF-8"))
    ).toDF("vid_id", "content")
    M.audioStats(M.decode(rows))
      .select(col("vid_id"),
        col("decoded.format").as("format"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        col("decoded.duration_ms").as("duration_ms"),
        col("audio.codec").as("a_codec"),
        col("audio.sample_rate").as("a_hz"),
        col("audio.n_samples").as("a_samples"),
        graft.operators.Multimodal.videoKeyframesCol(col("content"))
          .as("keyframes"))
      .orderBy(col("vid_id"))
  }

  private def webmOracle: String =
    """SELECT * FROM (VALUES
      | -- video: dims + duration + Cues count; no audio claim
      | (CAST(1 AS BIGINT), 'webm', 1280, 720, CAST(6000 AS BIGINT),
      |  CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
      |  CAST(NULL AS BIGINT), 12),
      | -- audio-primary: the sample clock, duration rescaled exactly
      | (CAST(2 AS BIGINT), 'webm', CAST(NULL AS INTEGER),
      |  CAST(NULL AS INTEGER), CAST(2000 AS BIGINT), 'webm-opus',
      |  48000, CAST(2000 * 48000 // 1000 AS BIGINT),
      |  CAST(NULL AS INTEGER)),
      | (CAST(3 AS BIGINT), 'matroska', CAST(NULL AS INTEGER),
      |  CAST(NULL AS INTEGER), CAST(2000 AS BIGINT), 'matroska-vorbis',
      |  24000, CAST(2000 * 24000 // 1000 AS BIGINT),
      |  CAST(NULL AS INTEGER)),
      | -- junk rides the raw stub at len = 10
      | (CAST(4 AS BIGINT), 'raw', 64 + 10, 64 + 310,
      |  CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
      |  CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
      |  CAST(NULL AS INTEGER))
      |) AS t(vid_id, format, width, height, duration_ms, a_codec, a_hz,
      |       a_samples, keyframes)
      |ORDER BY vid_id""".stripMargin

  /** Surgical GPS scrub ([[graft.operators.Multimodal.scrubGps]] —
    * in-place EXIF surgery on a copy: the IFD0 GPS pointer is
    * neutralized, the GPS IFD and its out-of-line coordinate bytes
    * zeroed, PNG chunk CRCs recomputed; everything else, pixels
    * included, stays byte-identical): the release-gate PII REMOVAL
    * twin of q161's detection flag, across every carrier the flag
    * reads. Each row reports its flag before and after the scrub
    * plus proof the asset survived (still an image, same dims).
    */
  private def q175(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val rows = Seq(
      (1L, M.syntheticTiff(9, 5, (x, y) => (x << 16) | (y << 8) | 7,
        gps = true)),
      (2L, M.pngWithExif(M.renderPng(6, 4, (_, _) => 0x335577), gps = true)),
      (3L, M.syntheticAvif(320, 200, gps = true)),
      (4L, M.syntheticAvif(640, 480, gps = true, brand = "heic")),
      (5L, M.renderPng(8, 8, (_, _) => 0x224466)), // clean: no-op scrub
      (6L, M.syntheticJxl(320, 240, container = true, gps = true)),
      // idat-relative EXIF (iloc construction method 1): the scrub
      // reaches through the same resolution the flag uses
      (7L, M.syntheticAvif(320, 200, gps = true, idatExif = true))
    ).toDF("img_id", "content")
    val before = M.imageStats(rows)
      .select(col("img_id"), col("stats.exif_gps").as("gps_before"))
    val after = M.imageStats(rows.withColumn("content",
        M.scrubGpsCol(col("content"))))
      .select(col("img_id"), col("stats.exif_gps").as("gps_after"),
        col("stats.ok").as("is_image"), col("stats.width").as("width"))
    before.join(after, Seq("img_id")).orderBy(col("img_id"))
  }

  private def scrubGpsOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), TRUE, FALSE, TRUE, 9),
      | (CAST(2 AS BIGINT), TRUE, FALSE, TRUE, 6),
      | (CAST(3 AS BIGINT), TRUE, FALSE, TRUE, 320),
      | (CAST(4 AS BIGINT), TRUE, FALSE, TRUE, 640),
      | (CAST(5 AS BIGINT), FALSE, FALSE, TRUE, 8),
      | -- the JXL container's raw Exif box, sixth carrier
      | (CAST(6 AS BIGINT), TRUE, FALSE, TRUE, 320),
      | -- HEIF iloc construction method 1 (idat-relative extents)
      | (CAST(7 AS BIGINT), TRUE, FALSE, TRUE, 320)
      |) AS t(img_id, gps_before, gps_after, is_image, width)
      |ORDER BY img_id""".stripMargin

  /** Video GPS flag + scrub ([[graft.operators.Multimodal
    * .videoGpsPresent]] / `scrubVideoGps` — the QuickTime `©xyz`
    * ISO 6709 atom under `moov/udta`, which is exactly where iPhone
    * videos put the capture location): q175's movie twin. Each row
    * reports the flag before/after the scrub plus proof the asset
    * survived — the exact keyframe fingerprint must be IDENTICAL
    * after surgery (dedup identity preserved), and the demuxed
    * keyframe count unchanged.
    */
  private def q176(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val movie = M.syntheticMjpegMp4(
      Seq(M.renderJpeg(16, 8, (_, _) => gray(99)),
        M.renderJpeg(16, 8, (_, _) => gray(180))))
    val rows = Seq(
      (1L, M.mp4WithGps(movie)),
      (2L, movie), // clean movie
      (3L, M.mp4WithGps(M.syntheticM4a(2, 44100, 441000L))), // audio too
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("vid_id", "content")
    rows.select(col("vid_id"), col("content"),
        M.videoFingerprint64Col(col("content")).as("fp_before"),
        M.videoGpsPresentCol(col("content")).as("gps_before"))
      .withColumn("content", M.scrubVideoGpsCol(col("content")))
      .select(col("vid_id"), col("gps_before"),
        M.videoGpsPresentCol(col("content")).as("gps_after"),
        (M.videoFingerprint64Col(col("content")) === col("fp_before"))
          .as("fingerprint_kept"),
        M.videoKeyframesCol(col("content")).as("keyframes"))
      .orderBy(col("vid_id"))
  }

  private def videoGpsOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), TRUE, FALSE, TRUE, 2),
      | (CAST(2 AS BIGINT), FALSE, FALSE, TRUE, 2),
      | (CAST(3 AS BIGINT), TRUE, FALSE, CAST(NULL AS BOOLEAN),
      |  CAST(NULL AS INTEGER)),
      | (CAST(4 AS BIGINT), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN),
      |  CAST(NULL AS BOOLEAN), CAST(NULL AS INTEGER))
      |) AS t(vid_id, gps_before, gps_after, fingerprint_kept, keyframes)
      |ORDER BY vid_id""".stripMargin

  /** JPEG XL header facts ([[graft.operators.Multimodal.jxlInfo]] —
    * the ISO 18181 SizeHeader bit walk: shared div8 flag, the
    * 9/13/18/30-bit size selector, the 7-entry aspect-ratio table,
    * naked codestream and BMFF `jxlc` container): the newest crawled
    * image format classifies as an image with real dimensions
    * instead of riding the raw stub.
    */
  private def q177(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val rows = Seq(
      (1L, M.syntheticJxl(1920, 1080)),
      (2L, M.syntheticJxl(256, 64, div8 = true)),
      (3L, M.syntheticJxl(0, 1080, ratio = 5)), // 16:9 -> 1920
      (4L, M.syntheticJxl(800, 600, container = true)),
      (5L, "not a jxl".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    M.imageStats(M.decode(rows))
      .select(col("img_id"),
        col("decoded.format").as("format"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        col("stats.ok").as("is_image"))
      .orderBy(col("img_id"))
  }

  private def jxlOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'jxl', 1920, 1080, TRUE),
      | (CAST(2 AS BIGINT), 'jxl', 256, 64, TRUE),
      | (CAST(3 AS BIGINT), 'jxl', 1920, 1080, TRUE),
      | (CAST(4 AS BIGINT), 'jxl', 800, 600, TRUE),
      | -- junk rides the raw stub at len = 9
      | (CAST(5 AS BIGINT), 'raw', 64 + 9, 64 + 279, FALSE)
      |) AS t(img_id, format, width, height, is_image)
      |ORDER BY img_id""".stripMargin

  /** Mixed-corpus dedup ([[graft.operators.Dedup.mediaDedupCorpus]] —
    * ONE call over a raw crawl dump: header-fact modality dispatch,
    * then each asset through its modality's corpus operator, united
    * in the `dup_class`/`keep` convention): planted classes per
    * modality — byte-identical PNG twins (dHash Hamming 0), identical
    * WAV squares (audioHash Hamming 0), a re-MUXED video pair (same
    * keyframe bitstream, different chunk tables — the exact
    * fingerprint collapses them, byte equality would NOT), and
    * byte-identical junk through the exact fallback. Distinct assets
    * of each modality stay unique. The oracle restates the planted
    * classes as literals.
    */
  private def q178(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val pngA = M.renderPng(64, 64, (x, _) => if (x % 8 >= 4) gray(230) else gray(20))
    val pngB = M.renderPng(64, 64, (x, y) => if ((x / 16 + y / 16) % 2 == 0) gray(240) else gray(10))
    def square(amp: Int => Int) =
      Array.tabulate[Short](2048)(i =>
        (if (i % 2 == 0) amp(i) else -amp(i)).toShort)
    val wavA = M.renderWav(8000, 1, square(i => 2000 + i * 14)) // rising
    val wavB = M.renderWav(8000, 1, square(_ => 9000)) // constant
    val frames = Seq(M.renderJpeg(16, 8, (_, _) => gray(99)),
      M.renderJpeg(16, 8, (_, _) => gray(180)))
    val vidA = M.syntheticMjpegMp4(frames)
    val vidARemux = M.syntheticMjpegMp4(frames, samplesPerChunk = 1)
    val vidB = M.syntheticMjpegMp4(Seq(M.renderJpeg(16, 8, (_, _) => gray(40))))
    val junkA = "same junk bytes".getBytes("UTF-8")
    val rows = Seq(
      (1L, pngA), (2L, pngA), (3L, pngB),
      (4L, wavA), (5L, wavA), (6L, wavB),
      (7L, vidA), (8L, vidARemux), (9L, vidB),
      (10L, junkA), (11L, junkA), (12L, "unique junk".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    graft.operators.Dedup.mediaDedupCorpus(rows, "doc_id", "content")
      .select(col("doc_id"), col("modality"), col("dup_class"), col("keep"))
      .orderBy(col("doc_id"))
  }

  private def mediaDedupOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'image', CAST(1 AS BIGINT), TRUE),
      | (CAST(2 AS BIGINT), 'image', CAST(1 AS BIGINT), FALSE),
      | (CAST(3 AS BIGINT), 'image', CAST(NULL AS BIGINT), TRUE),
      | (CAST(4 AS BIGINT), 'audio', CAST(4 AS BIGINT), TRUE),
      | (CAST(5 AS BIGINT), 'audio', CAST(4 AS BIGINT), FALSE),
      | (CAST(6 AS BIGINT), 'audio', CAST(NULL AS BIGINT), TRUE),
      | -- the re-mux pair collapses on the keyframe fingerprint
      | (CAST(7 AS BIGINT), 'video', CAST(7 AS BIGINT), TRUE),
      | (CAST(8 AS BIGINT), 'video', CAST(7 AS BIGINT), FALSE),
      | (CAST(9 AS BIGINT), 'video', CAST(NULL AS BIGINT), TRUE),
      | (CAST(10 AS BIGINT), 'other', CAST(10 AS BIGINT), TRUE),
      | (CAST(11 AS BIGINT), 'other', CAST(10 AS BIGINT), FALSE),
      | (CAST(12 AS BIGINT), 'other', CAST(NULL AS BIGINT), TRUE)
      |) AS t(doc_id, modality, dup_class, keep)
      |ORDER BY doc_id""".stripMargin

  /** Declared image text ([[graft.operators.Multimodal.imageTags]] —
    * [[graft.operators.Multimodal.audioTags]]' image twin): the
    * caption surface image-text pair mining starts from. Fixtures
    * cover EXIF ImageDescription through two carriers (a JPEG APP1
    * and a TIFF's own IFD0), a JPEG `COM` segment, PNG `tEXt` and
    * UTF-8 `iTXt`, and a GIF comment extension; untexted and
    * non-image rows report the all-null struct. Planted literals —
    * literal oracle.
    */
  private def q179(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val jpeg = M.renderJpeg(16, 16, (_, _) => gray(128))
    val png = M.renderPng(8, 8, (_, _) => 0x336699)
    val rows = Seq(
      (1L, M.jpegWithExifDescription(jpeg, "Alpine sunrise over the valley")),
      (2L, M.jpegWithComment(jpeg, "shot on film")),
      (3L, M.pngWithText(png, Seq(
        ("Title", "Checker", false),
        ("Description", "A tiny test chart", false),
        ("Comment", "graft fixture", false)))),
      (4L, M.pngWithText(png, Seq(("Description", "Über Wölkchen — ☁", true)))),
      (5L, M.gifWithComment(M.syntheticGif(Seq(0)), "looping banner, 1990s vintage")),
      (6L, M.syntheticTiff(4, 4, (_, _) => gray(200),
        description = "scanned page 3 of 12")),
      (7L, png),
      (8L, "junk".getBytes("UTF-8")),
      // the Adobe-ecosystem caption carrier: XMP dc:title/description
      // in a JPEG APP1 packet and a PNG XML:com.adobe.xmp iTXt chunk
      (9L, M.jpegWithXmp(jpeg,
        M.xmpPacketXml("Xmp & Title", "Bridge at <dusk>"))),
      (10L, M.pngWithText(png, Seq(("XML:com.adobe.xmp",
        M.xmpPacketXml(null, "Gare du Nord, 1925"), true))))
    ).toDF("img_id", "content")
    M.imageTags(rows)
      .select(col("img_id"), col("itext.title").as("title"),
        col("itext.description").as("description"),
        col("itext.comment").as("comment"),
        col("itext.text_format").as("text_format"))
      .orderBy(col("img_id"))
  }

  private def imageTextOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), CAST(NULL AS VARCHAR),
      |  'Alpine sunrise over the valley', CAST(NULL AS VARCHAR), 'jpeg'),
      | (CAST(2 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  'shot on film', 'jpeg'),
      | (CAST(3 AS BIGINT), 'Checker', 'A tiny test chart',
      |  'graft fixture', 'png'),
      | (CAST(4 AS BIGINT), CAST(NULL AS VARCHAR), 'Über Wölkchen — ☁',
      |  CAST(NULL AS VARCHAR), 'png'),
      | (CAST(5 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  'looping banner, 1990s vintage', 'gif'),
      | (CAST(6 AS BIGINT), CAST(NULL AS VARCHAR), 'scanned page 3 of 12',
      |  CAST(NULL AS VARCHAR), 'tiff'),
      | (CAST(7 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
      | (CAST(8 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
      | -- XMP entities unescape: & and <dusk> round-trip
      | (CAST(9 AS BIGINT), 'Xmp & Title', 'Bridge at <dusk>',
      |  CAST(NULL AS VARCHAR), 'jpeg'),
      | (CAST(10 AS BIGINT), CAST(NULL AS VARCHAR), 'Gare du Nord, 1925',
      |  CAST(NULL AS VARCHAR), 'png')
      |) AS t(img_id, title, description, comment, text_format)
      |ORDER BY img_id""".stripMargin

  /** Embedded cover art ([[graft.operators.Multimodal.embeddedArt]])
    * plus the cross-modal grouping it exists for: the SAME
    * front-cover PNG planted in an ID3 `APIC` frame and a FLAC
    * `PICTURE` block extracts byte-identically, so an exact
    * fingerprint groupBy finds release duplicates ACROSS audio
    * codecs — rips of one release share art long after the audio
    * bytes diverge. Grouping is fingerprint-groupBy + broadcast join
    * back (the q164 shape: k rows per k-copy class, never pairs).
    */
  private def q180(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val artA = M.renderPng(8, 8, (x, y) => if ((x + y) % 2 == 0) gray(250) else gray(5))
    val artB = M.renderPng(8, 8, (_, y) => if (y < 4) gray(220) else gray(30))
    val rows = Seq(
      (1L, M.syntheticId3(3, "Song", "Band", "LP",
        apic = Some(("image/png", artA))) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (2L, M.syntheticFlacTagged(48000, 2, 16, 96000L, "Song", "Band", "LP",
        picture = Some(("image/png", artA)))),
      (3L, M.syntheticM4aTagged(2, 44100, 441000L, "Other", "Trio", "EP",
        cover = Some(("image/png", artB)))),
      (4L, M.syntheticId3(4, "Bare", "NoArt", "Single") ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (5L, "junk".getBytes("UTF-8")),
      // the MKA convention: art rides an Attachments element — the
      // SAME bytes as the M4A cover, so the class spans containers
      (6L, M.syntheticWebm("audio", channels = 2, sampleRate = 48000,
        durationMs = 1000L, codec = "A_FLAC",
        attachedArt = Some(("image/png", artB)))),
      // ID3v2.2: the 3-char PIC frame (format string, not a MIME) —
      // the v2.2 parity row; shares artA's class
      (7L, M.syntheticId3(2, "Song", "Band", "LP",
        apic = Some(("image/png", artA))) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      // Ogg convention: METADATA_BLOCK_PICTURE (base64 FLAC PICTURE
      // body in a Vorbis-comment field) — Opus joins artA's class,
      // Vorbis artB's: the classes now span FIVE carrier families
      (8L, M.syntheticOpusTagged(2, 312, 48000, 96000L, "Song", "Band",
        "LP", picture = Some(("image/png", artA)))),
      (9L, M.syntheticVorbis(2, 44100, 88200L,
        tags = Some(("Other", "Trio", "EP")),
        picture = Some(("image/png", artB))))
    ).toDF("aud_id", "content")
    val withArt = M.embeddedArt(rows)
      .withColumn("art_fp", when(col("art").isNotNull, xxhash64(col("art"))))
    val groups = withArt.filter(col("art_fp").isNotNull)
      .groupBy(col("art_fp")).agg(count(lit(1)).as("n_sharing_art"))
    withArt.join(broadcast(groups), Seq("art_fp"), "left")
      .select(col("aud_id"), col("art_mime"),
        col("art").isNotNull.as("has_art"), col("n_sharing_art"))
      .orderBy(col("aud_id"))
  }

  private def embeddedArtOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'image/png', TRUE, CAST(4 AS BIGINT)),
      | (CAST(2 AS BIGINT), 'image/png', TRUE, CAST(4 AS BIGINT)),
      | (CAST(3 AS BIGINT), 'image/png', TRUE, CAST(3 AS BIGINT)),
      | (CAST(4 AS BIGINT), CAST(NULL AS VARCHAR), FALSE, CAST(NULL AS BIGINT)),
      | (CAST(5 AS BIGINT), CAST(NULL AS VARCHAR), FALSE, CAST(NULL AS BIGINT)),
      | -- M4A covr, MKA attachment and Ogg-Vorbis picture share
      | -- bytes: one class, three containers
      | (CAST(6 AS BIGINT), 'image/png', TRUE, CAST(3 AS BIGINT)),
      | -- v2.2 PIC: same bytes as rows 1/2/8 — the class is four
      | -- carriers wide (APIC, FLAC PICTURE, PIC, OpusTags picture)
      | (CAST(7 AS BIGINT), 'image/png', TRUE, CAST(4 AS BIGINT)),
      | (CAST(8 AS BIGINT), 'image/png', TRUE, CAST(4 AS BIGINT)),
      | (CAST(9 AS BIGINT), 'image/png', TRUE, CAST(3 AS BIGINT))
      |) AS t(aud_id, art_mime, has_art, n_sharing_art)
      |ORDER BY aud_id""".stripMargin

  /** Subtitle-cue explode ([[graft.operators.Multimodal.subtitleCues]])
    * — the video-text pairing surface: one SRT and one WebVTT file
    * (comma vs dot stamps, optional hours, cue settings, a NOTE
    * block, markup stripping, multi-line text), an ASS file (the
    * fansub sidecar: `[Events]` `Dialogue:` lines, centisecond
    * stamps, `{\...}` override strip, `\N` line breaks, events
    * written out of order re-sorting by time) plus an unparseable
    * row contributing zero cues. Every value is a planted literal.
    */
  private def q181(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val srt =
      """1
        |00:00:01,000 --> 00:00:04,000
        |Hello world
        |second line
        |
        |2
        |00:01:02,500 --> 00:01:05,250
        |<i>styled</i> farewell
        |""".stripMargin
    val vtt =
      """WEBVTT
        |
        |NOTE this block is skipped
        |
        |intro
        |00:03.000 --> 00:06.500 align:start position:10%
        |Minutes only
        |
        |01:00:00.200 --> 01:00:02.000
        |With hours
        |""".stripMargin
    val ass =
      """[Script Info]
        |ScriptType: v4.00+
        |
        |[Events]
        |Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
        |Dialogue: 0,0:00:08.50,0:00:10.00,Default,,0,0,0,,{\i1}later{\i0} line
        |Dialogue: 0,0:00:02.25,0:00:04.00,Default,,0,0,0,,first\Nbroken, comma kept
        |""".stripMargin
    // SSA-style reordered/reduced Format declaration: the parser
    // indexes Start/End/Text by the DECLARED positions
    val ssa =
      """[Events]
        |Format: Marked, Start, End, Style, Text
        |Dialogue: Marked=0,0:00:01.50,0:00:03.00,Default,reordered fields, kept
        |""".stripMargin
    // HLS segment VTT: X-TIMESTAMP-MAP rebases LOCAL cue time onto
    // the MPEG-TS 90 kHz clock (900000 ticks = +10 s)
    val hls =
      """WEBVTT
        |X-TIMESTAMP-MAP=MPEGTS:900000,LOCAL:00:00:00.000
        |
        |00:02.000 --> 00:04.000
        |mapped line
        |""".stripMargin
    // TTML sidecar (.ttml/.dfxp): root-element discipline, begin+dur
    val ttml =
      """<?xml version="1.0"?>
        |<tt xmlns="http://www.w3.org/ns/ttml">
        | <body><div>
        |  <p begin="00:00:04.000" dur="00:00:02.500">ttml ligne</p>
        | </div></body>
        |</tt>
        |""".stripMargin
    // SBV (YouTube caption export): comma-separated start,end blocks
    val sbv =
      """0:00:07.000,0:00:09.000
        |sbv block
        |second line
        |""".stripMargin
    // unlike SRT, TTML can DECLARE its language (root xml:lang)
    val ttmlFr =
      """<tt xml:lang="fr" xmlns="http://www.w3.org/ns/ttml">
        | <body><div>
        |  <p begin="00:00:08.000" end="00:00:09.000">ligne d&#39;essai</p>
        | </div></body>
        |</tt>
        |""".stripMargin
    val rows = Seq(
      (1L, srt.getBytes("UTF-8")),
      (2L, vtt.getBytes("UTF-8")),
      (3L, "no cues here".getBytes("UTF-8")),
      (4L, ass.getBytes("UTF-8")),
      (5L, ssa.getBytes("UTF-8")),
      (6L, hls.getBytes("UTF-8")),
      (7L, ttml.getBytes("UTF-8")),
      (8L, sbv.getBytes("UTF-8")),
      (9L, ttmlFr.getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    graft.operators.Multimodal.subtitleCues(rows)
      .orderBy(col("doc_id"), col("cue_idx"))
  }

  private def subtitleOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'srt', 1, CAST(1000 AS BIGINT),
      |  CAST(4000 AS BIGINT), 'Hello world' || chr(10) || 'second line',
      |  CAST(NULL AS VARCHAR)),
      | (CAST(1 AS BIGINT), 'srt', 2, CAST(62500 AS BIGINT),
      |  CAST(65250 AS BIGINT), 'styled farewell', CAST(NULL AS VARCHAR)),
      | (CAST(2 AS BIGINT), 'vtt', 1, CAST(3000 AS BIGINT),
      |  CAST(6500 AS BIGINT), 'Minutes only', CAST(NULL AS VARCHAR)),
      | (CAST(2 AS BIGINT), 'vtt', 2, CAST(3600200 AS BIGINT),
      |  CAST(3602000 AS BIGINT), 'With hours', CAST(NULL AS VARCHAR)),
      | -- ASS events re-sorted by start; overrides stripped, \N broken
      | -- (sidecars declare no language: declared_lang stays null)
      | (CAST(4 AS BIGINT), 'ass', 1, CAST(2250 AS BIGINT),
      |  CAST(4000 AS BIGINT), 'first' || chr(10) || 'broken, comma kept',
      |  CAST(NULL AS VARCHAR)),
      | (CAST(4 AS BIGINT), 'ass', 2, CAST(8500 AS BIGINT),
      |  CAST(10000 AS BIGINT), 'later line', CAST(NULL AS VARCHAR)),
      | -- 5-field Format declaration: Text is field 4, commas kept
      | (CAST(5 AS BIGINT), 'ass', 1, CAST(1500 AS BIGINT),
      |  CAST(3000 AS BIGINT), 'reordered fields, kept',
      |  CAST(NULL AS VARCHAR)),
      | -- X-TIMESTAMP-MAP: 900000/90 = +10000 ms on every cue
      | (CAST(6 AS BIGINT), 'vtt', 1, CAST(12000 AS BIGINT),
      |  CAST(14000 AS BIGINT), 'mapped line', CAST(NULL AS VARCHAR)),
      | -- TTML sidecar: begin + dur derives the end
      | (CAST(7 AS BIGINT), 'ttml', 1, CAST(4000 AS BIGINT),
      |  CAST(6500 AS BIGINT), 'ttml ligne', CAST(NULL AS VARCHAR)),
      | (CAST(8 AS BIGINT), 'sbv', 1, CAST(7000 AS BIGINT),
      |  CAST(9000 AS BIGINT), 'sbv block' || chr(10) || 'second line',
      |  CAST(NULL AS VARCHAR)),
      | -- TTML declares a language (xml:lang) and entities decode
      | (CAST(9 AS BIGINT), 'ttml', 1, CAST(8000 AS BIGINT),
      |  CAST(9000 AS BIGINT), 'ligne d''essai', 'fr')
      |) AS t(doc_id, sub_format, cue_idx, start_ms, end_ms, text,
      |       declared_lang)
      |ORDER BY doc_id, cue_idx""".stripMargin

  /** Declared lyrics ([[graft.operators.Multimodal.audioLyrics]]) —
    * the audio-text pairing surface across FOUR carriers: ID3 USLT
    * (v2.4 UTF-8 and v2.3 UTF-16 with the double-NUL descriptor),
    * M4A `©lyr`, and the Vorbis-comment LYRICS field of FLAC and
    * Ogg-Opus streams; untagged and non-audio rows are null.
    */
  private def q182(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val rows = Seq(
      (1L, M.syntheticId3(4, "T", "A", "B",
        lyrics = Some("Vers libre, ligne un")) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (2L, M.syntheticId3(3, "T", "A", "B",
        lyrics = Some("Üñïcode chorus ÿ")) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (3L, M.syntheticM4aTagged(2, 44100, 441000L, "T", "A", "B",
        lyricsTag = Some("ilst couplet"))),
      (4L, M.syntheticFlacTagged(48000, 2, 16, 96000L, "T", "A", "B",
        lyrics = Some("lossless refrain"))),
      (5L, M.syntheticId3(3, "T", "A", "B") ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (6L, "junk".getBytes("UTF-8")),
      // SYLT-only track: the synced lyrics surface as de-timed text
      (7L, M.syntheticId3(4, "T", "A", "B",
        syncedLyrics = Seq((900L, "timed un"), (2100L, "timed deux"))) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      // ID3v2.2: the 3-char ULT frame — the v2.2 parity row
      (8L, M.syntheticId3(2, "T", "A", "B",
        lyrics = Some("v22 ÜLT vers")) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101)))))
    ).toDF("aud_id", "content")
    M.audioLyrics(rows)
      .select(col("aud_id"), col("lyrics"))
      .orderBy(col("aud_id"))
  }

  private def lyricsOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'Vers libre, ligne un'),
      | (CAST(2 AS BIGINT), 'Üñïcode chorus ÿ'),
      | (CAST(3 AS BIGINT), 'ilst couplet'),
      | (CAST(4 AS BIGINT), 'lossless refrain'),
      | (CAST(5 AS BIGINT), CAST(NULL AS VARCHAR)),
      | (CAST(6 AS BIGINT), CAST(NULL AS VARCHAR)),
      | -- USLT absent: the SYLT fallback joins the timed lines
      | (CAST(7 AS BIGINT), 'timed un' || chr(10) || 'timed deux'),
      | -- v2.2's 3-char ULT frame (UTF-16 text under that version)
      | (CAST(8 AS BIGINT), 'v22 ÜLT vers')
      |) AS t(aud_id, lyrics)
      |ORDER BY aud_id""".stripMargin

  /** Container-declared subtitle tracks
    * ([[graft.operators.Multimodal.subtitleTrackCount]] — the
    * detection half of the video-text surface; q181 parses the
    * sidecars): ISO-BMFF `hdlr` sbtl/subt/text and Matroska
    * TrackType 0x11, null-unknown for non-container bytes.
    */
  private def q183(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val plain = M.syntheticMp4(96, 64, 2000L)
    val rows = Seq(
      (1L, plain),
      (2L, M.withMp4SubtitleTrack(plain)),
      (3L, M.syntheticWebm("video", width = 64, height = 48,
        durationMs = 1500L)),
      (4L, M.syntheticWebm("video", width = 64, height = 48,
        durationMs = 1500L, subtitleTracks = 2)),
      (5L, M.renderPng(4, 4, (_, _) => gray(30))),
      (6L, "junk".getBytes("UTF-8")),
      // a muxed tx3g DIALOG track counts; the same track marked as
      // the movie's chapter list via tref/chap does NOT (chapters
      // are segmentation, q196's surface)
      (7L, M.syntheticMp4TimedText(
        Seq(M.renderJpeg(8, 8, (_, _) => gray(40))),
        Seq((0L, 500L, "line")))),
      (8L, M.syntheticMp4TimedText(
        Seq(M.renderJpeg(8, 8, (_, _) => gray(40))),
        Seq((0L, 500L, "part")), asQtChapters = true))
    ).toDF("vid_id", "content")
    rows.select(col("vid_id"),
      M.subtitleTrackCountCol(col("content")).as("subtitle_tracks"))
      .orderBy(col("vid_id"))
  }

  private def subtitleTracksOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 0),
      | (CAST(2 AS BIGINT), 1),
      | (CAST(3 AS BIGINT), 0),
      | (CAST(4 AS BIGINT), 2),
      | (CAST(5 AS BIGINT), CAST(NULL AS INTEGER)),
      | (CAST(6 AS BIGINT), CAST(NULL AS INTEGER)),
      | (CAST(7 AS BIGINT), 1),
      | -- the tref/chap-referenced text track is chapters, not subs
      | (CAST(8 AS BIGINT), 0)
      |) AS t(vid_id, subtitle_tracks)
      |ORDER BY vid_id""".stripMargin

  /** Media card with DECLARED-TEXT coverage — the four pairing-signal
    * metrics added in round 13 (`pct_image_with_text`,
    * `pct_audio_with_art`, `pct_audio_with_lyrics`,
    * `pct_video_with_subs`) over fixtures that actually carry
    * captions/art/lyrics/subtitle tracks, so every pct is a
    * non-trivial closed form (q152 carries the all-zero case). PNG
    * images only (lossless luma), whole-ms audio durations.
    */
  private def q184(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val base = M.renderPng(16, 16, (_, _) => gray(120))
    val rows = Seq(
      ("x", M.pngWithText(base, Seq(("Description", "x caption", false)))),
      ("x", base),
      // 1 MPEG1-L3 frame @32 kHz = 1152 samples = exactly 36 ms
      ("x", M.syntheticId3(3, "T", "A", "B",
        apic = Some(("image/png", M.renderPng(4, 4, (_, _) => gray(9))))) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      // 80 samples @8 kHz = exactly 10 ms
      ("x", M.syntheticFlacTagged(8000, 1, 16, 80L, "T", "A", "B",
        lyrics = Some("x refrain"))),
      ("y", M.pngWithText(M.renderPng(16, 16, (_, _) => gray(60)),
        Seq(("XML:com.adobe.xmp", M.xmpPacketXml(null, "y caption"), true)))),
      ("y", M.syntheticWebm("video", width = 64, height = 48,
        durationMs = 1500L, subtitleTracks = 1,
        // 600 of 1500 ms spoken: avg_dialog_coverage's closed form
        // (the mvhd-less MJPEG MP4 next to it asserts no duration)
        subCues = Seq((0L, 400L, "hey"), (300L, 600L, "there")))),
      ("y", M.syntheticMjpegMp4(Seq(M.renderJpeg(16, 8, (_, _) => gray(99))))),
      // round 15: segmentation + forensic coverage. A PNG whose eXIf
      // chunk carries an IFD1 thumbnail (lossless luma preserved),
      // and a CHAP-chaptered podcast MP3
      ("x", M.pngWithExifTiff(M.renderPng(16, 16, (_, _) => gray(120)),
        M.tiffWithThumbnail(M.renderJpeg(4, 4, (_, _) => gray(33))))),
      ("y", M.syntheticId3(4, "T", "A", "B",
        chapters = Seq((0L, 1000L, "Intro"), (1000L, 2000L, "Body"))) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101)))))
    ).toDF("grp", "content")
    M.mediaCard(rows, "content", "grp").orderBy(col("grp"), col("metric"))
  }

  private def mediaTextCardOracle: String =
    """SELECT * FROM (VALUES
      | ('x', 'avg_audio_hz', 20000.0),
      | ('x', 'avg_audio_rms', CAST(NULL AS DOUBLE)),
      | ('x', 'avg_audio_secs', 0.023),
      | ('x', 'avg_image_height', 16.0),
      | ('x', 'avg_image_luma', round(120/255.0, 4)),
      | ('x', 'avg_image_textiness', 0.0),
      | ('x', 'avg_image_width', 16.0),
      | ('x', 'avg_video_keyframes', CAST(NULL AS DOUBLE)),
      | ('x', 'avg_dialog_coverage', CAST(NULL AS DOUBLE)),
      | ('x', 'n_assets', 5.0),
      | ('x', 'pct_audio', 0.4),
      | ('x', 'pct_audio_clipped', 0.0),
      | ('x', 'pct_audio_silent', 0.0),
      | ('x', 'pct_audio_with_art', 0.5),
      | ('x', 'pct_audio_with_chapters', 0.0),
      | ('x', 'pct_audio_with_lyrics', 0.5),
      | ('x', 'pct_image', 0.6),
      | ('x', 'pct_image_gps', 0.0),
      | ('x', 'pct_image_with_text', round(1/3.0, 4)),
      | ('x', 'pct_image_with_thumb', round(1/3.0, 4)),
      | ('x', 'pct_undecodable', 0.0),
      | ('x', 'pct_video', 0.0),
      | ('x', 'pct_video_with_subs', CAST(NULL AS DOUBLE)),
      | -- the CHAP mp3 makes y's audio metrics real: one MPEG1-L3
      | -- frame at 32 kHz = exactly 36 ms
      | ('y', 'avg_audio_hz', 32000.0),
      | ('y', 'avg_audio_rms', CAST(NULL AS DOUBLE)),
      | ('y', 'avg_audio_secs', 0.036),
      | ('y', 'avg_image_height', 16.0),
      | ('y', 'avg_image_luma', round(60/255.0, 4)),
      | ('y', 'avg_image_textiness', 0.0),
      | ('y', 'avg_image_width', 16.0),
      | ('y', 'avg_video_keyframes', 1.0),
      | ('y', 'avg_dialog_coverage', round(600/1500.0, 4)),
      | ('y', 'n_assets', 4.0),
      | ('y', 'pct_audio', 0.25),
      | ('y', 'pct_audio_clipped', 0.0),
      | ('y', 'pct_audio_silent', 0.0),
      | ('y', 'pct_audio_with_art', 0.0),
      | ('y', 'pct_audio_with_chapters', 1.0),
      | ('y', 'pct_audio_with_lyrics', 0.0),
      | ('y', 'pct_image', 0.25),
      | ('y', 'pct_image_gps', 0.0),
      | ('y', 'pct_image_with_text', 1.0),
      | ('y', 'pct_image_with_thumb', 0.0),
      | ('y', 'pct_undecodable', 0.0),
      | ('y', 'pct_video', 0.5),
      | ('y', 'pct_video_with_subs', 0.5)
      |) AS t(grp, metric, value)
      |ORDER BY grp, metric""".stripMargin

  /** Muxed-subtitle extraction
    * ([[graft.operators.Multimodal.webmSubtitleCues]] behind the
    * [[graft.operators.Multimodal.subtitleCues]] dispatch): a WebM
    * movie's S_TEXT BlockGroups become the same cue rows a sidecar
    * .srt yields — one operator, three inputs. Times are
    * cluster+relative ticks at the default 1 ms TimecodeScale.
    */
  private def q185(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val movie = M.syntheticWebm("video", width = 64, height = 48,
      durationMs = 9000L, subtitleTracks = 1,
      subCues = Seq((1000L, 2500L, "muxed hello"),
        (4000L, 6000L, "müxed wörld")))
    val srt = "1\n00:00:07,000 --> 00:00:08,000\nsidecar line\n"
    val rows = Seq(
      (1L, movie),
      (2L, srt.getBytes("UTF-8")),
      (3L, M.syntheticWebm("video", width = 64, height = 48,
        durationMs = 1000L)), // no subtitle track: zero cues
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    M.subtitleCues(rows).orderBy(col("doc_id"), col("cue_idx"))
  }

  private def muxedSubsOracle: String =
    """SELECT * FROM (VALUES
      | -- a subtitle track WITHOUT a Language element declares the
      | -- Matroska spec default: eng
      | (CAST(1 AS BIGINT), 'webm', 1, CAST(1000 AS BIGINT),
      |  CAST(2500 AS BIGINT), 'muxed hello', 'eng'),
      | (CAST(1 AS BIGINT), 'webm', 2, CAST(4000 AS BIGINT),
      |  CAST(6000 AS BIGINT), 'müxed wörld', 'eng'),
      | (CAST(2 AS BIGINT), 'srt', 1, CAST(7000 AS BIGINT),
      |  CAST(8000 AS BIGINT), 'sidecar line', CAST(NULL AS VARCHAR))
      |) AS t(doc_id, sub_format, cue_idx, start_ms, end_ms, text,
      |       declared_lang)
      |ORDER BY doc_id, cue_idx""".stripMargin

  /** Camera provenance
    * ([[graft.operators.Multimodal.imageProvenanceTags]]): EXIF Make /
    * Model / DateTimeOriginal (Exif sub-IFD via the 0x8769 pointer)
    * — the group-by-camera / burst-bucketing signal of a photo
    * corpus. Null struct for images without EXIF provenance and for
    * non-images.
    */
  private def q186(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val jpeg = M.renderJpeg(8, 8, (_, _) => 0x707070)
    val rows = Seq(
      (1L, M.jpegWithExifProvenance(jpeg, "Acme Optics", "DX-9",
        "2021:07:09 10:11:12")),
      (2L, M.jpegWithExifProvenance(jpeg, "Büld Kameras", "Nørd 5",
        "2023:01:02 03:04:05")),
      (3L, jpeg),
      (4L, M.renderPng(4, 4, (_, _) => 0x112233)),
      (5L, "junk".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    M.imageProvenanceTags(rows)
      .select(col("img_id"), col("prov.make").as("make"),
        col("prov.model").as("model"),
        col("prov.captured_at").as("captured_at"))
      .orderBy(col("img_id"))
  }

  private def provenanceOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'Acme Optics', 'DX-9', '2021:07:09 10:11:12'),
      | (CAST(2 AS BIGINT), 'Büld Kameras', 'Nørd 5', '2023:01:02 03:04:05'),
      | (CAST(3 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR)),
      | (CAST(4 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR)),
      | (CAST(5 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR))
      |) AS t(img_id, make, model, captured_at)
      |ORDER BY img_id""".stripMargin

  /** Image-caption pair mining end to end: extract declared captions
    * ([[graft.operators.Multimodal.imageTags]]), score them with the
    * C4-flavored quality kernel, and gate — the pipeline that turns a
    * crawled image corpus into (image, text) training pairs. The
    * oracle replays the FULL quality arithmetic in SQL (q40's
    * restatement) over the same literal captions, so extraction AND
    * scoring are both checked by the hash compare.
    */
  private def q187(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val jpeg = M.renderJpeg(8, 8, (_, _) => 0x777777)
    val png = M.renderPng(8, 8, (_, _) => 0x334455)
    val rows = Seq(
      (1L, M.jpegWithExifDescription(jpeg,
        "the quick brown fox jumps over the lazy dog and runs to the hills")),
      (2L, M.pngWithText(png, Seq(("Description", "!!! ??? !!!", false)))),
      (3L, M.gifWithComment(M.syntheticGif(Seq(0)),
        "a short note on the picture of a cat in the garden")),
      (4L, png),
      (5L, "junk".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    graft.operators.Multimodal.imageTags(rows)
      .select(col("img_id"),
        coalesce(col("itext.description"), col("itext.comment")).as("caption"))
      .filter(col("caption").isNotNull)
      .withColumn("quality", round(TF.qualityScore(col("caption")), 4))
      .withColumn("keep", col("quality") >= 0.3)
      .orderBy(col("img_id"))
  }

  private def captionMiningOracle: String =
    """WITH caps AS (SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT),
      |   'the quick brown fox jumps over the lazy dog and runs to the hills'),
      |  (CAST(2 AS BIGINT), '!!! ??? !!!'),
      |  (CAST(3 AS BIGINT),
      |   'a short note on the picture of a cat in the garden')
      | ) AS t(img_id, caption)),
      |s AS (
      |  SELECT img_id, caption,
      |    list_filter(string_split_regex(lower(trim(caption)), '\s+'),
      |      t -> len(t) > 0) AS toks
      |  FROM caps),
      |q AS (
      |  SELECT img_id, caption,
      |    round(
      |      least(len(toks) / 50.0, 1.0) * 0.4
      |      + least((CASE WHEN len(toks) = 0 THEN 0.0
      |          ELSE len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','that','this','be'))) * 1.0 / len(toks) END) * 4.0, 1.0) * 0.3
      |      + greatest(0.0, 1.0 - (CASE WHEN len(caption) = 0 THEN 0.0
      |          ELSE len(regexp_replace(caption, '[^[:punct:]]', '', 'g')) * 1.0 / len(caption) END) * 5.0) * 0.3,
      |      4) AS quality
      |  FROM s)
      |SELECT img_id, caption, quality, quality >= 0.3 AS keep
      |FROM q ORDER BY img_id""".stripMargin

  /** ICO favicons ([[graft.operators.Multimodal.icoInfo]] /
    * `icoPngPayload`): the most numerous image asset of a web crawl —
    * PNG-payload icons decode FULLY through the existing pixel stack
    * (the largest entry), so the favicon and the standalone logo it
    * was cut from share a perceptual hash (cross-format identity,
    * like PNG↔lossless-WebP); DIB payloads report header facts.
    */
  private def q188(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val logo = M.renderPng(32, 32,
      (x, y) => if ((x / 4 + y / 4) % 2 == 0) gray(240) else gray(10))
    val small = M.renderPng(16, 16, (_, _) => gray(128))
    val ico = M.syntheticIco(Seq(small, logo))
    val logoHash = M.dhash64(logo).longValue
    val rows = Seq(
      (1L, ico),
      (2L, logo),
      (3L, "junk".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    M.imageStats(rows)
      .select(col("img_id"), col("stats.width").as("width"),
        col("stats.height").as("height"), col("stats.ok").as("ok"),
        coalesce(M.dhash64Col(col("content")) === lit(logoHash), lit(false))
          .as("matches_logo"))
      .orderBy(col("img_id"))
  }

  private def icoOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 32, 32, TRUE, TRUE),
      | (CAST(2 AS BIGINT), 32, 32, TRUE, TRUE),
      | (CAST(3 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
      |  FALSE, FALSE)
      |) AS t(img_id, width, height, ok, matches_logo)
      |ORDER BY img_id""".stripMargin

  /** The web's remaining image containers: APNG animation facts
    * ([[graft.operators.Multimodal.pngAnimationInfo]] behind the same
    * `animationInfo` dispatch as GIF/WebP — acTL frame/play counts,
    * fcTL delay fractions, delay_den 0 meaning 100 per spec) and SVG
    * declared dimensions ([[graft.operators.Multimodal.svgInfo]] —
    * width/height attrs with viewBox fallback; an HTML page with an
    * INLINE svg is not an svg asset). ImageIO ignores the animation
    * chunks, so the APNG raster still decodes (width stays real).
    */
  private def q189(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val base = M.renderPng(16, 16, (_, _) => 0x445566)
    val rows = Seq(
      // 10/100 s + 1/4 s = 100 + 250 = 350 ms, 3 plays
      (1L, M.pngWithAnimation(base, Seq((10, 100), (1, 4)), plays = 3)),
      // delay_den 0 -> 100 per spec; plays 0 = loop forever
      (2L, M.pngWithAnimation(base, Seq((1, 0)), plays = 0)),
      (3L, base), // still PNG: no animation facts
      (4L, ("<svg xmlns=\"http://www.w3.org/2000/svg\" width=\"120\" " +
        "height=\"80\"><rect width=\"10\" height=\"10\"/></svg>")
        .getBytes("UTF-8")),
      (5L, ("<?xml version=\"1.0\"?><!-- logo -->\n" +
        "<svg viewBox=\"0 0 24 24\"><path d=\"M0 0\"/></svg>")
        .getBytes("UTF-8")),
      (6L, ("<html><body><svg width=\"9\" height=\"9\"></svg></body></html>")
        .getBytes("UTF-8")), // inline svg in HTML: not an svg asset
      (7L, "junk".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    val withStats = M.imageStats(rows).rdd
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("img_id", LongType, nullable = false),
      StructField("frames", IntegerType),
      StructField("duration_ms", LongType),
      StructField("loops", IntegerType),
      StructField("is_image", BooleanType, nullable = false),
      StructField("width", IntegerType)))
    val out = withStats.map { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      val st = r.getAs[org.apache.spark.sql.Row]("stats")
      graft.operators.Multimodal.animationInfo(bytes) match {
        case Some(g) => org.apache.spark.sql.Row(r.getAs[Long]("img_id"),
          g.frames, g.durationMs, g.loops, st.getAs[Boolean]("ok"),
          st.getAs[Integer]("width"))
        case None => org.apache.spark.sql.Row(r.getAs[Long]("img_id"),
          null, null, null, st.getAs[Boolean]("ok"),
          st.getAs[Integer]("width"))
      }
    }
    s.createDataFrame(out, schema).orderBy(col("img_id"))
  }

  private def apngSvgOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 2, CAST(350 AS BIGINT), 3, TRUE, 16),
      | (CAST(2 AS BIGINT), 1, CAST(10 AS BIGINT), 0, TRUE, 16),
      | (CAST(3 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
      |  CAST(NULL AS INTEGER), TRUE, 16),
      | (CAST(4 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
      |  CAST(NULL AS INTEGER), TRUE, 120),
      | (CAST(5 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
      |  CAST(NULL AS INTEGER), TRUE, 24),
      | (CAST(6 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
      |  CAST(NULL AS INTEGER), FALSE, CAST(NULL AS INTEGER)),
      | (CAST(7 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
      |  CAST(NULL AS INTEGER), FALSE, CAST(NULL AS INTEGER))
      |) AS t(img_id, frames, duration_ms, loops, is_image, width)
      |ORDER BY img_id""".stripMargin

  /** Corpus-scale caption mining — q187's pipeline at corpus shape:
    * one image per `documents` row (every third captioned,
    * deterministic from doc_id), [[graft.operators.Multimodal
    * .imageTags]] extraction, ONE aggregate for per-group coverage
    * and caption-length totals. The 100 TB plan is a single scan —
    * map-only extraction, no joins, no windows; the PlanAudit job
    * gate locks the count as pipeline-constant. Oracle = doc_id
    * arithmetic (caption = 'caption for document <id>').
    */
  private def q190(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    // constant frame rendered ONCE on the driver (the q197 lesson:
    // per-row ImageIO encode of an id-independent image was the whole
    // cost) — the closure ships the ~100 bytes of PNG, and per-row
    // work is only the pngWithText splice on captioned rows
    val base = graft.operators.Multimodal.renderPng(24, 16,
      (_, _) => (200 << 16) | (123 << 8) | 77)
    val rdd = docs.rdd.map { r =>
      val id = r.getLong(0)
      val content =
        if (id % 3 == 0) graft.operators.Multimodal.pngWithText(base,
          Seq(("Description", s"caption for document $id", false)))
        else base
      org.apache.spark.sql.Row(id, (id % 4).toString, content)
    }
    graft.operators.Multimodal.imageTags(s.createDataFrame(rdd, schema))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_images"),
        count(col("itext.description")).as("n_captioned"),
        sum(length(col("itext.description"))).as("caption_chars"))
      .orderBy(col("grp"))
  }

  private def captionCorpusOracle: String =
    """SELECT CAST(doc_id % 4 AS VARCHAR) AS grp,
      |  count(*) AS n_images,
      |  CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_captioned,
      |  CAST(sum(CASE WHEN doc_id % 3 = 0
      |           THEN 21 + length(CAST(doc_id AS VARCHAR)) END) AS BIGINT)
      |    AS caption_chars
      |FROM documents GROUP BY 1 ORDER BY grp""".stripMargin

  /** LRC timed lyrics ([[graft.operators.Multimodal.parseLrc]] behind
    * the same `subtitleCues` dispatch): metadata tags skipped,
    * repeated-timestamp lines expand to one cue per stamp, cues sort
    * by time and end at the next cue's start.
    */
  private def q191(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lrc =
      """[ar:The Band]
        |[ti:Song One]
        |[00:01.345]enhanced ms stamp
        |[00:05.00]first line
        |[00:12.50]second line
        |[00:20.1][01:02.25]repeated refrain
        |""".stripMargin
    val rows = Seq(
      (1L, lrc.getBytes("UTF-8")),
      (2L, "no stamps here".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    graft.operators.Multimodal.subtitleCues(rows)
      .orderBy(col("doc_id"), col("cue_idx"))
  }

  private def lrcOracle: String =
    """SELECT * FROM (VALUES
      | -- a 3-digit fraction is milliseconds (enhanced LRC)
      | (CAST(1 AS BIGINT), 'lrc', 1, CAST(1345 AS BIGINT),
      |  CAST(5000 AS BIGINT), 'enhanced ms stamp', CAST(NULL AS VARCHAR)),
      | (CAST(1 AS BIGINT), 'lrc', 2, CAST(5000 AS BIGINT),
      |  CAST(12500 AS BIGINT), 'first line', CAST(NULL AS VARCHAR)),
      | (CAST(1 AS BIGINT), 'lrc', 3, CAST(12500 AS BIGINT),
      |  CAST(20100 AS BIGINT), 'second line', CAST(NULL AS VARCHAR)),
      | -- a single-digit fraction is tenths: .1 = 100 ms
      | (CAST(1 AS BIGINT), 'lrc', 4, CAST(20100 AS BIGINT),
      |  CAST(62250 AS BIGINT), 'repeated refrain', CAST(NULL AS VARCHAR)),
      | (CAST(1 AS BIGINT), 'lrc', 5, CAST(62250 AS BIGINT),
      |  CAST(62250 AS BIGINT), 'repeated refrain', CAST(NULL AS VARCHAR))
      |) AS t(doc_id, sub_format, cue_idx, start_ms, end_ms, text,
      |       declared_lang)
      |ORDER BY doc_id, cue_idx""".stripMargin

  /** Muxed MP4 timed text ([[graft.operators.Multimodal
    * .mp4SubtitleCues]] behind the same `subtitleCues` dispatch) —
    * closing the detection/extraction asymmetry for the web's
    * dominant video container: the `sbtl` track's sample table is
    * walked (the stts deltas BECOME the cue times) and its samples
    * decoded per sample-entry codec — `tx3g` u16-length text (gaps
    * are length-0 samples), `wvtt` `vttc(payl)` boxes (gaps are
    * `vtte`), `stpp` TTML documents whose `<p begin end>` paragraphs
    * carry their own clock times. A caption-less movie contributes
    * zero cues. Every value is a closed form of the builder's
    * arguments.
    */
  private def q192(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val frames = Seq(M.renderJpeg(16, 8, (_, _) => gray(70)),
      M.renderJpeg(16, 8, (_, _) => gray(190)))
    val wanted = Seq((500L, 1500L, "Opening line"),
      (2000L, 2800L, "Seconde réplique"))
    val rows = Seq(
      (1L, M.syntheticMp4TimedText(frames, wanted, codec = "tx3g")),
      (2L, M.syntheticMp4TimedText(frames, wanted, codec = "wvtt")),
      (3L, M.syntheticMp4TimedText(frames, wanted, codec = "stpp")),
      (4L, M.syntheticMjpegMp4(frames)), // caption-less: zero cues
      // a real edts/elst on the text trak: an initial 700 ms empty
      // edit — cue times present SHIFTED on the movie timeline
      (5L, M.syntheticMp4TimedText(frames, wanted, codec = "tx3g",
        editDelayMs = 700L))
    ).toDF("doc_id", "content")
    M.subtitleCues(rows).orderBy(col("doc_id"), col("cue_idx"))
  }

  private def mp4TimedTextOracle: String =
    """SELECT * FROM (VALUES
      | -- declared_lang = the text trak's mdhd language code
      | (CAST(1 AS BIGINT), 'tx3g', 1, CAST(500 AS BIGINT),
      |  CAST(1500 AS BIGINT), 'Opening line', 'eng'),
      | (CAST(1 AS BIGINT), 'tx3g', 2, CAST(2000 AS BIGINT),
      |  CAST(2800 AS BIGINT), 'Seconde réplique', 'eng'),
      | (CAST(2 AS BIGINT), 'wvtt', 1, CAST(500 AS BIGINT),
      |  CAST(1500 AS BIGINT), 'Opening line', 'eng'),
      | (CAST(2 AS BIGINT), 'wvtt', 2, CAST(2000 AS BIGINT),
      |  CAST(2800 AS BIGINT), 'Seconde réplique', 'eng'),
      | (CAST(3 AS BIGINT), 'stpp', 1, CAST(500 AS BIGINT),
      |  CAST(1500 AS BIGINT), 'Opening line', 'eng'),
      | (CAST(3 AS BIGINT), 'stpp', 2, CAST(2000 AS BIGINT),
      |  CAST(2800 AS BIGINT), 'Seconde réplique', 'eng'),
      | -- the elst empty edit delays the track 700 ms: media times
      | -- 500/2000 present at 1200/2700 on the movie timeline
      | (CAST(5 AS BIGINT), 'tx3g', 1, CAST(1200 AS BIGINT),
      |  CAST(2200 AS BIGINT), 'Opening line', 'eng'),
      | (CAST(5 AS BIGINT), 'tx3g', 2, CAST(2700 AS BIGINT),
      |  CAST(3500 AS BIGINT), 'Seconde réplique', 'eng')
      |) AS t(doc_id, sub_format, cue_idx, start_ms, end_ms, text,
      |       declared_lang)
      |ORDER BY doc_id, cue_idx""".stripMargin

  /** SYLT synchronized lyrics ([[graft.operators.Multimodal
    * .id3SyltCues]] behind the same `subtitleCues` dispatch) —
    * [[q191]]'s muxed twin: the cue shape is the LRC contract (end =
    * next start, last zero-length), the carrier an ID3v2 frame
    * across all three tag versions (v2.4 UTF-8, v2.3 UTF-16 with
    * out-of-order entries re-sorting, v2.2's 3-char `SLT`). A track
    * with USLT-only lyrics contributes zero CUES (untimed text is
    * q182's surface, not a cue stream).
    */
  private def q193(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def mp3(v: Int, synced: Seq[(Long, String)],
        plain: Option[String] = None, fmt: Int = 2): Array[Byte] =
      M.syntheticId3(v, "T", "A", "B", lyrics = plain,
        syncedLyrics = synced, syltFormat = fmt) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))
    val rows = Seq(
      (1L, mp3(4, Seq((1200L, "premier vers"), (3400L, "deuxième vers")))),
      (2L, mp3(3, Seq((5000L, "écrit en retard"), (700L, "sorted first")))),
      (3L, mp3(2, Seq((250L, "v22 line")))),
      (4L, mp3(4, Nil, plain = Some("untimed only"))),
      // timestamp format 1: MPEG frame indices, converted on the
      // stream's own clock (MPEG1 L3 at 32 kHz = 36 ms/frame)
      (5L, mp3(4, Seq((10L, "frame ten"), (25L, "frame twenty-five")),
        fmt = 1))
    ).toDF("doc_id", "content")
    M.subtitleCues(rows).orderBy(col("doc_id"), col("cue_idx"))
  }

  private def syltOracle: String =
    """SELECT * FROM (VALUES
      | -- declared_lang = the SYLT frame's 3-char language field
      | (CAST(1 AS BIGINT), 'sylt', 1, CAST(1200 AS BIGINT),
      |  CAST(3400 AS BIGINT), 'premier vers', 'eng'),
      | (CAST(1 AS BIGINT), 'sylt', 2, CAST(3400 AS BIGINT),
      |  CAST(3400 AS BIGINT), 'deuxième vers', 'eng'),
      | -- entries written out of order sort by time
      | (CAST(2 AS BIGINT), 'sylt', 1, CAST(700 AS BIGINT),
      |  CAST(5000 AS BIGINT), 'sorted first', 'eng'),
      | (CAST(2 AS BIGINT), 'sylt', 2, CAST(5000 AS BIGINT),
      |  CAST(5000 AS BIGINT), 'écrit en retard', 'eng'),
      | (CAST(3 AS BIGINT), 'sylt', 1, CAST(250 AS BIGINT),
      |  CAST(250 AS BIGINT), 'v22 line', 'eng'),
      | -- format-1 frame indices 10/25 x 36 ms (1152 samples at
      | -- 32 kHz) = 360/900 ms on the stream's own clock
      | (CAST(5 AS BIGINT), 'sylt', 1, CAST(360 AS BIGINT),
      |  CAST(900 AS BIGINT), 'frame ten', 'eng'),
      | (CAST(5 AS BIGINT), 'sylt', 2, CAST(900 AS BIGINT),
      |  CAST(900 AS BIGINT), 'frame twenty-five', 'eng')
      |) AS t(doc_id, sub_format, cue_idx, start_ms, end_ms, text,
      |       declared_lang)
      |ORDER BY doc_id, cue_idx""".stripMargin

  /** Media chapters ([[graft.operators.Multimodal.mediaChapters]]) —
    * the audiobook/podcast segmentation surface behind one dispatch:
    * ID3 `CHAP` frames with embedded TIT2 titles (v2.4 UTF-8 and
    * v2.3 UTF-16), Matroska `Chapters/EditionEntry/ChapterAtom` in
    * ns with `ChapterDisplay` titles, and the Nero `chpl` box (100 ns
    * starts, pascal-string titles, ends following the LRC
    * next-start rule). A chapterless audio row contributes nothing.
    */
  private def q196(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val chaps = Seq((0L, 60000L, "Intro"), (60000L, 150000L, "Deuxième acte"))
    val rows = Seq(
      (1L, M.syntheticId3(4, "Pod", "Host", "Show", chapters = chaps) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (2L, M.syntheticId3(3, "Pod", "Host", "Show", chapters = chaps) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (3L, M.syntheticWebm("audio", channels = 2, sampleRate = 48000,
        durationMs = 200000L, codec = "A_OPUS", docType = "matroska",
        chapters = chaps)),
      (4L, M.mp4WithChpl(M.syntheticM4a(2, 44100, 441000L),
        Seq((0L, "One"), (60000L, "Zwölf & Co")))),
      (5L, M.syntheticId3(4, "NoChap", "X", "Y") ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (6L, "junk".getBytes("UTF-8")),
      // the QuickTime convention: a text track referenced via
      // tref/chap is the chapter list (and is NOT subtitles)
      (7L, M.syntheticMp4TimedText(
        Seq(M.renderJpeg(8, 8, (_, _) => 0x505050)), chaps,
        asQtChapters = true)),
      // the ogg-chapter-extension convention: CHAPTERnnn/NAME
      // Vorbis-comment fields (the audiobook .opus rip)
      (8L, M.syntheticOpusTagged(2, 312, 48000, 96000L, "Book", "Nrtr",
        "Shelf", chapters = Seq((0L, "Intro"), (60000L, "Deuxième acte")))),
      // CTOC declares the listing: the toc orders the bonus segment
      // (chp0, starts at 60 s) FIRST — start-sort would reverse it
      (9L, M.syntheticId3(4, "Pod", "Host", "Show",
        chapters = Seq((60000L, 150000L, "Bonus d'abord"),
          (0L, 60000L, "Cold open")),
        ctocOrder = Seq(0, 1)) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101)))))
    ).toDF("doc_id", "content")
    M.mediaChapters(rows).orderBy(col("doc_id"), col("chap_idx"))
  }

  private def chaptersOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 'id3', 1, CAST(0 AS BIGINT),
      |  CAST(60000 AS BIGINT), 'Intro'),
      | (CAST(1 AS BIGINT), 'id3', 2, CAST(60000 AS BIGINT),
      |  CAST(150000 AS BIGINT), 'Deuxième acte'),
      | (CAST(2 AS BIGINT), 'id3', 1, CAST(0 AS BIGINT),
      |  CAST(60000 AS BIGINT), 'Intro'),
      | (CAST(2 AS BIGINT), 'id3', 2, CAST(60000 AS BIGINT),
      |  CAST(150000 AS BIGINT), 'Deuxième acte'),
      | (CAST(3 AS BIGINT), 'matroska', 1, CAST(0 AS BIGINT),
      |  CAST(60000 AS BIGINT), 'Intro'),
      | (CAST(3 AS BIGINT), 'matroska', 2, CAST(60000 AS BIGINT),
      |  CAST(150000 AS BIGINT), 'Deuxième acte'),
      | -- chpl carries no ends: next start, last zero-length
      | (CAST(4 AS BIGINT), 'chpl', 1, CAST(0 AS BIGINT),
      |  CAST(60000 AS BIGINT), 'One'),
      | (CAST(4 AS BIGINT), 'chpl', 2, CAST(60000 AS BIGINT),
      |  CAST(60000 AS BIGINT), 'Zwölf & Co'),
      | -- the QT tref/chap text track: real ends from its stts
      | (CAST(7 AS BIGINT), 'chap', 1, CAST(0 AS BIGINT),
      |  CAST(60000 AS BIGINT), 'Intro'),
      | (CAST(7 AS BIGINT), 'chap', 2, CAST(60000 AS BIGINT),
      |  CAST(150000 AS BIGINT), 'Deuxième acte'),
      | -- CHAPTERnnn Vorbis fields (starts only: next-start ends)
      | (CAST(8 AS BIGINT), 'vorbis', 1, CAST(0 AS BIGINT),
      |  CAST(60000 AS BIGINT), 'Intro'),
      | (CAST(8 AS BIGINT), 'vorbis', 2, CAST(60000 AS BIGINT),
      |  CAST(60000 AS BIGINT), 'Deuxième acte'),
      | -- the CTOC's child order beats start order: the 60 s bonus
      | -- segment is chapter 1 because the toc SAYS so
      | (CAST(9 AS BIGINT), 'id3', 1, CAST(60000 AS BIGINT),
      |  CAST(150000 AS BIGINT), 'Bonus d''abord'),
      | (CAST(9 AS BIGINT), 'id3', 2, CAST(0 AS BIGINT),
      |  CAST(60000 AS BIGINT), 'Cold open')
      |) AS t(doc_id, chap_format, chap_idx, start_ms, end_ms, title)
      |ORDER BY doc_id, chap_idx""".stripMargin

  /** EXIF IFD1 thumbnail linking ([[graft.operators.Multimodal
    * .exifThumbnails]]) — the photo-forensics dedup signal: editors
    * re-encode the main image but COPY the original EXIF block, so
    * an edited upload and its original share thumbnail bytes while
    * their pixels (and dHashes) diverge. Rows 1-2 are exactly that
    * pair: different main rasters, one thumbnail identity; row 3 has
    * its own thumbnail, row 4 EXIF without IFD1, row 5 no EXIF.
    */
  private def q198(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val t1 = M.renderJpeg(8, 4, (_, _) => gray(120))
    val t2 = M.renderJpeg(8, 4, (_, _) => gray(33))
    val rows = Seq(
      (1L, M.jpegWithThumbnail(M.renderJpeg(32, 16, (x, _) => gray(x * 7)), t1)),
      (2L, M.jpegWithThumbnail(M.renderJpeg(32, 16, (_, y) => gray(y * 11)), t1)),
      (3L, M.jpegWithThumbnail(M.renderJpeg(16, 16, (_, _) => gray(200)), t2)),
      (4L, M.jpegWithExifProvenance(M.renderJpeg(8, 8, (_, _) => gray(90)),
        "Maker", "Model Z", "2022:05:06 07:08:09")),
      (5L, "junk".getBytes("UTF-8"))
    ).toDF("img_id", "content")
    val withThumb = M.exifThumbnails(rows)
      .withColumn("thumb_fp",
        when(col("thumb").isNotNull, xxhash64(col("thumb"))))
    val groups = withThumb.filter(col("thumb_fp").isNotNull)
      .groupBy(col("thumb_fp")).agg(count(lit(1)).as("n_sharing_thumb"))
    withThumb.join(broadcast(groups), Seq("thumb_fp"), "left")
      .select(col("img_id"), col("thumb").isNotNull.as("has_thumb"),
        col("n_sharing_thumb"))
      .orderBy(col("img_id"))
  }

  private def thumbLinkOracle: String =
    """SELECT * FROM (VALUES
      | -- the original and its edit share one thumbnail identity
      | (CAST(1 AS BIGINT), TRUE, CAST(2 AS BIGINT)),
      | (CAST(2 AS BIGINT), TRUE, CAST(2 AS BIGINT)),
      | (CAST(3 AS BIGINT), TRUE, CAST(1 AS BIGINT)),
      | -- IFD0-only EXIF: no thumbnail
      | (CAST(4 AS BIGINT), FALSE, CAST(NULL AS BIGINT)),
      | (CAST(5 AS BIGINT), FALSE, CAST(NULL AS BIGINT))
      |) AS t(img_id, has_thumb, n_sharing_thumb)
      |ORDER BY img_id""".stripMargin

  /** Corpus-scale clip-text pair mining — q190's video twin: a
    * captioned MP4 (muxed tx3g track) for every SECOND `documents`
    * row, 1 + id%3 cues each (500 ms clips at 1 s strides, gaps as
    * empty samples — what a real muxer writes),
    * [[graft.operators.Multimodal.subtitleCues]] extraction gated on
    * the container-declared language, ONE aggregate for per-group
    * pair counts, text volume and clip seconds. The 100 TB plan is a
    * single scan — map-only extraction, no joins, no windows; the
    * PlanAudit job gate locks the count as pipeline-constant. Oracle
    * = doc_id arithmetic (every cue of doc d is 18+len(d) chars and
    * 500 ms).
    */
  private def q197(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    // the frame is identical for every row: render ONCE on the driver
    // and ship the byte array in the closure (a per-row ImageIO encode
    // would be the whole query cost at corpus scale)
    val frame = graft.operators.Multimodal.renderJpeg(8, 4,
      (_, _) => (90 << 16) | (90 << 8) | 90)
    val rdd = docs.rdd.flatMap { r =>
      val id = r.getLong(0)
      if (id % 2 != 0) Nil
      else {
        val cues = (0 until (1 + (id % 3)).toInt).map(j =>
          (1000L * j, 1000L * j + 500L, s"cue $j of document $id"))
        Seq(org.apache.spark.sql.Row(id,
          graft.operators.Multimodal.syntheticMp4TimedText(Seq(frame),
            cues, codec = "tx3g", lang = "eng")))
      }
    }
    val movies = s.createDataFrame(rdd, schema)
    graft.operators.Multimodal.subtitleCues(movies)
      .filter(col("declared_lang") === "eng") // the pairing gate
      .groupBy((col("doc_id") % 5).as("grp"))
      .agg(sum(when(col("cue_idx") === 1, 1L).otherwise(0L)).as("n_videos"),
        count(lit(1)).as("n_pairs"),
        sum(length(col("text"))).as("pair_chars"),
        sum(col("end_ms") - col("start_ms")).as("clip_ms"))
      .orderBy(col("grp"))
  }

  private def clipPairCorpusOracle: String =
    """SELECT doc_id % 5 AS grp,
      | CAST(count(*) AS BIGINT) AS n_videos,
      | CAST(sum(1 + doc_id % 3) AS BIGINT) AS n_pairs,
      | CAST(sum((1 + doc_id % 3)
      |   * (18 + length(CAST(doc_id AS VARCHAR)))) AS BIGINT) AS pair_chars,
      | CAST(sum((1 + doc_id % 3) * 500) AS BIGINT) AS clip_ms
      |FROM documents WHERE doc_id % 2 = 0
      |GROUP BY doc_id % 5 ORDER BY grp""".stripMargin

  /** Corpus-scale cover-art linking ([[graft.operators.Dedup
    * .coverArtLinkCorpus]]) — the "same album, different rip" signal:
    * a stripe-class PNG for every THIRD `documents` row (the q156
    * Hamming-separated construction, 14 classes), an audio file for
    * every FIFTH row whose embedded art is that class's image —
    * carrier rotating MP3-APIC → FLAC-PICTURE → M4A-covr →
    * MKA-attachment → OpusTags-METADATA_BLOCK_PICTURE, the five art
    * surfaces. One codegen'd
    * [[graft.operators.Multimodal.mediaLinkHash64Col]] projection
    * (an image hashes its raster, audio its art), one banded Hamming
    * join: every class spans both modalities and all five audio
    * containers at any scale factor (14 is coprime with both
    * samplers). The corpus must carry at least 42 rows (one full
    * lcm(3, 14) sampler cycle) so every residue class holds an image
    * member — below that an audio-only class would take its id from
    * the 1e8+ range and the doc_id-arithmetic oracle would not model
    * it; the guard REFUSES tiny corpora instead of silently
    * diverging. The 3/5 sampling and the 14-way split keep the
    * identical-hash buckets SMALL — the q164 lesson: fixture classes
    * of hundreds of byte-identical members make the candidate join
    * k-squared and push the CC edge count onto the iterative path;
    * real corpora never look like that, and the fixture shouldn't
    * either. Oracle = doc_id arithmetic; job count gate-locked
    * data-independent (PlanAudit).
    */
  private def q194(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    // one full image-sampler cycle mod 14 (lcm(3, 14) = 42): below
    // this a residue class can be audio-only and the oracle's
    // image-anchored class ids stop modeling the corpus
    val nDocs = docs.count()
    require(nDocs >= 42,
      s"q194 needs >= 42 documents rows for full class coverage; got $nDocs")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("asset_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val AudioIdBase = 100000000L
    val rdd = docs.rdd.flatMap { r =>
      val id = r.getLong(0)
      if (id % 3 != 0 && id % 5 != 0) Nil
      else {
        val cls = (id % 14).toInt
        val dark = 20 + (id % 23).toInt
        val light = 200 + (id % 37).toInt
        def g(v: Int): Int = (v << 16) | (v << 8) | v
        // light stripe at grid column 1+2k per set bit k of (cls+1) —
        // dHash-identical within a class whatever the tones (light
        // always > dark), >= 8 bits apart across classes (q156's rule)
        val lightCols = (0 until 4).filter(k => ((cls + 1) >> k & 1) != 0)
          .map(k => 1 + 2 * k).toSet
        val png = graft.operators.Multimodal.renderPng(64, 64, (x, _) => {
          val gridCol = x * 9 / 64
          if (lightCols(gridCol)) g(light) else g(dark)
        })
        // full object paths only — a module alias captured in this
        // RDD closure would serialize the (non-Serializable) module
        val image =
          if (id % 3 == 0) Seq(org.apache.spark.sql.Row(id, png)) else Nil
        val audio =
          if (id % 5 != 0) Nil
          else {
            val art = ("image/png", png)
            val bytes = ((id / 5) % 5) match {
              case 0 => graft.operators.Multimodal.syntheticId3(4, "T", "A", "B",
                apic = Some(art)) ++
                graft.operators.Multimodal.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))
              case 1 => graft.operators.Multimodal.syntheticFlacTagged(
                48000, 2, 16, 4800L, "T", "A", "B", picture = Some(art))
              case 2 => graft.operators.Multimodal.syntheticM4aTagged(
                2, 44100, 4410L, "T", "A", "B", cover = Some(art))
              case 3 => graft.operators.Multimodal.syntheticWebm("audio",
                channels = 2, sampleRate = 48000, durationMs = 100L,
                codec = "A_OPUS", docType = "matroska",
                attachedArt = Some(art))
              case _ => graft.operators.Multimodal.syntheticOpusTagged(
                2, 312, 48000, 4800L, "T", "A", "B", picture = Some(art))
            }
            Seq(org.apache.spark.sql.Row(AudioIdBase + id, bytes))
          }
        image ++ audio
      }
    }
    val assets = s.createDataFrame(rdd, schema).localCheckpoint(false)
    graft.operators.Dedup.coverArtLinkCorpus(assets, "asset_id", "content")
      .groupBy((col("dup_class") % 14).as("art_class"))
      .agg(count(lit(1)).as("n_assets"),
        sum(when(col("asset_id") >= AudioIdBase, 1L).otherwise(0L))
          .as("n_audio"),
        min(col("dup_class")).as("class_min"),
        max(col("dup_class")).as("class_max")) // == class_min: one class
      .orderBy(col("art_class"))
  }

  /** Cue language report — declared-vs-detected over the one
    * [[graft.operators.Multimodal.subtitleCues]] scan: the container
    * asserts a language (MP4 mdhd code, Matroska Language element,
    * SYLT field; sidecars assert nothing), the stopword heuristic
    * ([[graft.functions.TextFunctions.langIdHeuristic]], q39's
    * kernel) detects one from the cue text, and a pairing pipeline
    * gates on agreement. Fixtures plant one case per quadrant:
    * declared==detected, declared!=detected (the mislabeled-upload
    * signal), undeclared sidecar, and a detected-und cue.
    */
  private def q195(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val frames = Seq(M.renderJpeg(16, 8, (_, _) => gray(80)))
    val rows = Seq(
      // declared eng, text detects en: agreement
      (1L, M.syntheticMp4TimedText(frames,
        Seq((0L, 900L, "the fox and the dog went to the river"),
          (1000L, 2000L, "they found a boat on the water")), lang = "eng")),
      // declared spa, text detects fr: the mislabeled upload
      (2L, M.syntheticMp4TimedText(frames,
        Seq((0L, 800L, "le chat est dans la maison pour un moment")),
        lang = "spa")),
      // Matroska with an explicit Language element
      (3L, M.syntheticWebm("video", width = 32, height = 16,
        durationMs = 4000L, subtitleTracks = 1, subLang = Some("fre"),
        subCues = Seq((500L, 1500L, "la vie est une fête dans le jardin")))),
      // sidecar: no declaration, german text detects de
      (4L, ("1\n00:00:01,000 --> 00:00:02,000\n" +
        "der hund und die katze ist ein freund\n").getBytes("UTF-8")),
      // stopword-free cue: detection reports 'und'
      (5L, M.syntheticMp4TimedText(frames,
        Seq((0L, 700L, "zzz qqq xxx")), lang = "eng")),
      // a TTML sidecar DECLARES (xml:lang) — the round-15 sidecar
      // quadrant: declared 'fr' (raw BCP-47), detected fr
      (6L, M.formatTtml(Seq(M.SubCue(1, 0L, 1000L,
        "le chien est dans le jardin avec une fleur")), lang = "fr")
        .getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    M.subtitleCues(rows)
      .groupBy(col("declared_lang"),
        TF.langIdHeuristic(col("text")).as("detected_lang"))
      .agg(count(lit(1)).as("n_cues"),
        sum(length(col("text"))).as("text_chars"))
      .orderBy(col("declared_lang").asc_nulls_first, col("detected_lang"))
  }

  private def cueLangOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(NULL AS VARCHAR), 'de', CAST(1 AS BIGINT),
      |  CAST(37 AS BIGINT)),
      | ('eng', 'en', CAST(2 AS BIGINT), CAST(37 + 30 AS BIGINT)),
      | ('eng', 'und', CAST(1 AS BIGINT), CAST(11 AS BIGINT)),
      | -- the TTML sidecar's own xml:lang (raw BCP-47 value)
      | ('fr', 'fr', CAST(1 AS BIGINT), CAST(42 AS BIGINT)),
      | ('fre', 'fr', CAST(1 AS BIGINT), CAST(34 AS BIGINT)),
      | -- declared != detected: the mislabeled-upload quadrant
      | ('spa', 'fr', CAST(1 AS BIGINT), CAST(41 AS BIGINT))
      |) AS t(declared_lang, detected_lang, n_cues, text_chars)
      |ORDER BY declared_lang NULLS FIRST, detected_lang""".stripMargin

  private def coverArtCorpusOracle: String =
    """SELECT doc_id % 14 AS art_class,
      | CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
      |   + sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
      |   AS BIGINT) AS n_assets,
      | CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_audio,
      | -- the class id is the smallest MEMBER id: image assets keep
      | -- their doc_id, audio assets live at 1e8+doc_id — so the min
      | -- is always the smallest image doc_id of the class
      | CAST(min(CASE WHEN doc_id % 3 = 0 THEN doc_id END) AS BIGINT)
      |   AS class_min,
      | CAST(min(CASE WHEN doc_id % 3 = 0 THEN doc_id END) AS BIGINT)
      |   AS class_max
      |FROM documents GROUP BY doc_id % 14 ORDER BY art_class""".stripMargin

  /** Incremental cover-art linking == batch linking — q178's
    * oracle-gate discipline for the STREAMING art-link path: the
    * same cross-modal corpus (images at every 9th `documents` row,
    * audio at every 10th, 7 stripe classes, the five-carrier art
    * rotation) is linked twice — once through
    * [[graft.operators.Dedup.coverArtLinkCorpus]] in one batch, and
    * once replayed as TWO ingest batches through the exact
    * new-vs-anything join the streaming signature store runs
    * ([[graft.operators.Dedup.incrementalHammingNearDuplicates]]:
    * batch 1 against itself, batch 2 against the full store) — and
    * the class assignments must agree asset-for-asset (`n_agree ==
    * n_assets` in every class). The corpus needs >= 126 rows (two
    * full lcm(9, 7) image cycles) so every class holds >= 2 image
    * members and no class is a singleton/null. Oracle = doc_id
    * arithmetic.
    */
  private def q199(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val nDocs = docs.count()
    require(nDocs >= 126,
      s"q199 needs >= 126 documents rows for multi-member classes; got $nDocs")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("asset_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val AudioIdBase = 100000000L
    val rdd = docs.rdd.flatMap { r =>
      val id = r.getLong(0)
      if (id % 9 != 0 && id % 10 != 0) Nil
      else {
        val cls = (id % 7).toInt
        val dark = 20 + (id % 23).toInt
        val light = 200 + (id % 37).toInt
        def g(v: Int): Int = (v << 16) | (v << 8) | v
        val lightCols = (0 until 4).filter(k => ((cls + 1) >> k & 1) != 0)
          .map(k => 1 + 2 * k).toSet
        val png = graft.operators.Multimodal.renderPng(64, 64, (x, _) => {
          val gridCol = x * 9 / 64
          if (lightCols(gridCol)) g(light) else g(dark)
        })
        val image =
          if (id % 9 == 0) Seq(org.apache.spark.sql.Row(id, png)) else Nil
        val audio =
          if (id % 10 != 0) Nil
          else {
            val art = ("image/png", png)
            val bytes = ((id / 10) % 5) match {
              case 0 => graft.operators.Multimodal.syntheticId3(4, "T", "A", "B",
                apic = Some(art)) ++
                graft.operators.Multimodal.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))
              case 1 => graft.operators.Multimodal.syntheticFlacTagged(
                48000, 2, 16, 4800L, "T", "A", "B", picture = Some(art))
              case 2 => graft.operators.Multimodal.syntheticM4aTagged(
                2, 44100, 4410L, "T", "A", "B", cover = Some(art))
              case 3 => graft.operators.Multimodal.syntheticWebm("audio",
                channels = 2, sampleRate = 48000, durationMs = 100L,
                codec = "A_OPUS", docType = "matroska",
                attachedArt = Some(art))
              case _ => graft.operators.Multimodal.syntheticOpusTagged(
                2, 312, 48000, 4800L, "T", "A", "B", picture = Some(art))
            }
            Seq(org.apache.spark.sql.Row(AudioIdBase + id, bytes))
          }
        image ++ audio
      }
    }
    val assets = s.createDataFrame(rdd, schema).localCheckpoint(false)
    val D = graft.operators.Dedup
    // sigs computed ONCE for BOTH paths (the batch run and the
    // replayed ingest): each container is decoded and hashed a single
    // time — the second decode pass was pure duplicated work
    val sigs = D.coverArtLinkSignatures(assets, "asset_id", "content")
      .localCheckpoint(false)
    val full = D.coverArtLinkCorpus(assets, "asset_id", "content",
        precomputedSigs = Some(sigs))
      .select(col("asset_id"), col("dup_class").as("full_class"))
    // the replayed two-batch ingest: sigs split deterministically,
    // joined exactly as the streaming path does — batch1 vs itself,
    // then batch2 vs all
    val b1 = sigs.filter(col("id") % 2 === 0)
    val b2 = sigs.filter(col("id") % 2 =!= 0)
    val pairs = D.incrementalHammingNearDuplicates(b1, b1)
      .unionByName(D.incrementalHammingNearDuplicates(sigs, b2))
    val incr = D.connectedComponents(pairs.select(col("id_a"), col("id_b")))
      .withColumnRenamed("id", "asset_id")
      .withColumnRenamed("component", "incr_class")
    full.join(incr, Seq("asset_id"), "left")
      .groupBy((col("full_class") % 7).as("art_class"))
      .agg(count(lit(1)).as("n_assets"),
        sum(when(col("asset_id") >= AudioIdBase, 1L).otherwise(0L))
          .as("n_audio"),
        sum(when(col("incr_class") <=> col("full_class"), 1L).otherwise(0L))
          .as("n_agree"))
      .orderBy(col("art_class"))
  }

  private def artLinkIncrOracle: String =
    """SELECT doc_id % 7 AS art_class,
      | CAST(sum(CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END)
      |   + sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END)
      |   AS BIGINT) AS n_assets,
      | CAST(sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_audio,
      | -- the replayed two-batch ingest must assign every asset the
      | -- SAME class as the one-shot batch run
      | CAST(sum(CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END)
      |   + sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END)
      |   AS BIGINT) AS n_agree
      |FROM documents GROUP BY doc_id % 7 ORDER BY art_class""".stripMargin

  /** Multi-track subtitle extraction ([[graft.operators.Multimodal
    * .subtitleCuesByTrack]]) — the multi-language mining surface: a
    * dubbed/fansubbed release muxes parallel text in several
    * languages, and per-track rows give a pairing pipeline each
    * language under its own container declaration (q181/q192 keep
    * only the first track — this surface keeps them all, with
    * `track_idx` in declaration order). Fixtures: an MP4 carrying
    * BOTH a tx3g/eng and a wvtt/fre track, a WebM with two S_TEXT
    * tracks (eng + fre), a sidecar (inherently track 1), junk.
    */
  private def q200(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val frames = Seq(M.renderJpeg(8, 8, (_, _) => gray(77)))
    val mp4 = M.syntheticMp4TimedText(frames,
      Seq((0L, 900L, "hello"), (1000L, 1800L, "again")),
      codec = "tx3g", lang = "eng",
      cues2 = Seq((100L, 700L, "bonjour")), codec2 = "wvtt", lang2 = "fre")
    val webm = M.syntheticWebm("video", width = 8, height = 8,
      durationMs = 4000L, subtitleTracks = 2,
      subLang = Some("eng"), subLang2 = Some("spa"),
      subCues = Seq((50L, 80L, "hi")),
      subCues2 = Seq((100L, 400L, "hola"), (500L, 900L, "mundo")))
    val rows = Seq(
      (1L, mp4),
      (2L, webm),
      (3L, ("1\n00:00:01,000 --> 00:00:02,000\nsidecar line\n").getBytes("UTF-8")),
      (4L, "junk".getBytes("UTF-8")),
      // VTT voice spans name the speaker — the diarization signal;
      // an unvoiced cue in the same file stays null
      (5L, ("WEBVTT\n\n00:00:01.000 --> 00:00:02.000\n" +
        "<v Ayana>the voiced line\n\n00:00:03.000 --> 00:00:04.000\n" +
        "plain line\n").getBytes("UTF-8")),
      // the Blu-ray-remux shape: PGS bitmap subs — intervals with
      // NULL text under the track's own declaration
      (6L, M.syntheticWebm("video", width = 8, height = 8,
        durationMs = 4000L, docType = "matroska",
        imageSubs = Seq(("S_HDMV/PGS", "fre", Seq((1000L, 2500L))))))
    ).toDF("doc_id", "content")
    M.subtitleCuesByTrack(rows)
      .orderBy(col("doc_id"), col("track_idx"), col("cue_idx"))
  }

  private def multiTrackOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 1, 'tx3g', 1, CAST(0 AS BIGINT),
      |  CAST(900 AS BIGINT), 'hello', 'eng', CAST(NULL AS VARCHAR)),
      | (CAST(1 AS BIGINT), 1, 'tx3g', 2, CAST(1000 AS BIGINT),
      |  CAST(1800 AS BIGINT), 'again', 'eng', CAST(NULL AS VARCHAR)),
      | -- the SECOND text track keeps its own codec and declaration
      | (CAST(1 AS BIGINT), 2, 'wvtt', 1, CAST(100 AS BIGINT),
      |  CAST(700 AS BIGINT), 'bonjour', 'fre', CAST(NULL AS VARCHAR)),
      | (CAST(2 AS BIGINT), 1, 'webm', 1, CAST(50 AS BIGINT),
      |  CAST(80 AS BIGINT), 'hi', 'eng', CAST(NULL AS VARCHAR)),
      | (CAST(2 AS BIGINT), 2, 'webm', 1, CAST(100 AS BIGINT),
      |  CAST(400 AS BIGINT), 'hola', 'spa', CAST(NULL AS VARCHAR)),
      | (CAST(2 AS BIGINT), 2, 'webm', 2, CAST(500 AS BIGINT),
      |  CAST(900 AS BIGINT), 'mundo', 'spa', CAST(NULL AS VARCHAR)),
      | (CAST(3 AS BIGINT), 1, 'srt', 1, CAST(1000 AS BIGINT),
      |  CAST(2000 AS BIGINT), 'sidecar line', CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR)),
      | -- the voice span names the speaker AND strips from the text
      | (CAST(5 AS BIGINT), 1, 'vtt', 1, CAST(1000 AS BIGINT),
      |  CAST(2000 AS BIGINT), 'the voiced line', CAST(NULL AS VARCHAR),
      |  'Ayana'),
      | (CAST(5 AS BIGINT), 1, 'vtt', 2, CAST(3000 AS BIGINT),
      |  CAST(4000 AS BIGINT), 'plain line', CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR)),
      | -- PGS bitmap subs: interval rows with NULL text (the image
      | -- payload is OCR-seam data, not text)
      | (CAST(6 AS BIGINT), 1, 'pgs', 1, CAST(1000 AS BIGINT),
      |  CAST(2500 AS BIGINT), CAST(NULL AS VARCHAR), 'fre',
      |  CAST(NULL AS VARCHAR))
      |) AS t(doc_id, track_idx, sub_format, cue_idx, start_ms, end_ms,
      |       text, declared_lang, speaker)
      |ORDER BY doc_id, track_idx, cue_idx""".stripMargin

  /** Translation-pair mining ([[graft.operators.Multimodal
    * .translationPairs]]) — parallel corpora from dubbed media: two
    * cues of different tracks whose intervals overlap >= 50% of the
    * shorter cue are translation pairs. Fixtures: an MP4 with
    * tx3g/eng + wvtt/fre tracks (one pair per dialog line, the
    * dub-shifted second line still pairing), a WebM with eng+spa
    * S_TEXT tracks (one exactly-at-threshold pair, one unpaired
    * straggler), a single-track sidecar (nothing to pair), junk.
    */
  private def q201(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val frames = Seq(M.renderJpeg(8, 8, (_, _) => gray(66)))
    val mp4 = M.syntheticMp4TimedText(frames,
      Seq((0L, 1000L, "hello"), (2000L, 3000L, "world")),
      codec = "tx3g", lang = "eng",
      cues2 = Seq((100L, 900L, "bonjour"), (2100L, 3100L, "monde")),
      codec2 = "wvtt", lang2 = "fre")
    val webm = M.syntheticWebm("video", width = 8, height = 8,
      durationMs = 6000L, subtitleTracks = 2,
      subLang = Some("eng"), subLang2 = Some("spa"),
      subCues = Seq((0L, 1000L, "hi")),
      subCues2 = Seq((600L, 1400L, "hola"), (2000L, 2500L, "mundo")))
    val rows = Seq(
      (1L, mp4),
      (2L, webm),
      (3L, ("1\n00:00:01,000 --> 00:00:02,000\nalone\n").getBytes("UTF-8")),
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    M.translationPairs(rows)
      .orderBy(col("doc_id"), col("start_ms"))
  }

  private def translationPairsOracle: String =
    """SELECT * FROM (VALUES
      | -- hello(0-1000) x bonjour(100-900): overlap 800 = the whole
      | -- shorter cue
      | (CAST(1 AS BIGINT), 'eng', 'fre', CAST(0 AS BIGINT), 'hello',
      |  'bonjour', CAST(800 AS BIGINT)),
      | -- the dub-shifted second line still pairs (900/1000 >= 0.5)
      | (CAST(1 AS BIGINT), 'eng', 'fre', CAST(2000 AS BIGINT), 'world',
      |  'monde', CAST(900 AS BIGINT)),
      | -- exactly at threshold: overlap 400 = 0.5 x shorter 800
      | (CAST(2 AS BIGINT), 'eng', 'spa', CAST(0 AS BIGINT), 'hi',
      |  'hola', CAST(400 AS BIGINT))
      |) AS t(doc_id, lang_a, lang_b, start_ms, text_a, text_b,
      |       overlap_ms)
      |ORDER BY doc_id, start_ms""".stripMargin

  /** Chapter-aligned transcripts ([[graft.operators.Multimodal
    * .chapterAlignedCues]]) — the audiobook (chapter, text) pairing:
    * cues assigned to the chapter containing their START, texts
    * joined in time order. Fixtures compose two round-14/15
    * surfaces on ONE file each: an ID3 mp3 whose CHAP chapters
    * segment its own SYLT synced lyrics (a boundary-straddling cue
    * belongs to the chapter it begins in), and a WebM whose
    * Matroska chapters segment its muxed S_TEXT cues.
    */
  private def q202(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val rows = Seq(
      (1L, M.syntheticId3(4, "Book", "Nrtr", "Shelf",
        chapters = Seq((0L, 60000L, "Intro"), (60000L, 150000L, "Deux")),
        syncedLyrics = Seq((1000L, "ligne a"), (59000L, "ligne b"),
          (61000L, "ligne c"))) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (2L, M.syntheticWebm("video", width = 8, height = 8,
        durationMs = 8000L, subtitleTracks = 1, subLang = Some("fre"),
        chapters = Seq((0L, 4000L, "Part A"), (4000L, 8000L, "Part B")),
        subCues = Seq((100L, 500L, "un"), (3900L, 4200L, "deux"),
          (4500L, 5000L, "trois")))),
      (3L, M.syntheticId3(4, "NoChap", "X", "Y",
        syncedLyrics = Seq((100L, "orphan"))) ++
        M.syntheticMp3(3, 2, 1, Seq((9, Seq(100, 101))))),
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    M.chapterAlignedCues(rows)
      .orderBy(col("doc_id"), col("chap_idx"))
  }

  private def chapterAlignedOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 1, 'Intro', CAST(2 AS BIGINT),
      |  CAST(1000 AS BIGINT), 'ligne a' || chr(10) || 'ligne b'),
      | (CAST(1 AS BIGINT), 2, 'Deux', CAST(1 AS BIGINT),
      |  CAST(61000 AS BIGINT), 'ligne c'),
      | -- the straddling cue (3900-4200) belongs to the chapter it
      | -- STARTS in
      | (CAST(2 AS BIGINT), 1, 'Part A', CAST(2 AS BIGINT),
      |  CAST(100 AS BIGINT), 'un' || chr(10) || 'deux'),
      | (CAST(2 AS BIGINT), 2, 'Part B', CAST(1 AS BIGINT),
      |  CAST(4500 AS BIGINT), 'trois')
      |) AS t(doc_id, chap_idx, title, n_cues, first_cue_ms, text)
      |ORDER BY doc_id, chap_idx""".stripMargin

  /** Dialog-coverage quality gate ([[graft.operators.Multimodal
    * .dialogCoverage]]) — "mine only videos whose dialog covers
    * >= X%": per asset, the UNION length of the primary text
    * track's cue intervals over the container's declared duration.
    * Fixtures: a 4-second MP4 whose tx3g cues cover 45%, a 2-second
    * WebM whose OVERLAPPING cues merge to 45% (the union rule — a
    * naive sum would say 50%), a sidecar (no container duration →
    * null coverage), junk, and a subtitle-less movie without mvhd.
    */
  private def q203(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val frame = M.renderJpeg(8, 8, (_, _) => gray(90))
    val rows = Seq(
      // 100 frames x 40 ms = a 4000 ms movie; cues cover 1800 ms
      (1L, M.syntheticMp4TimedText(Seq.fill(100)(frame),
        Seq((500L, 1500L, "un"), (2000L, 2800L, "deux")))),
      // 2000 ms WebM; cues (0,500) and (400,900) UNION to 900 ms
      (2L, M.syntheticWebm("video", width = 8, height = 8,
        durationMs = 2000L, subtitleTracks = 1,
        subCues = Seq((0L, 500L, "a"), (400L, 900L, "b")))),
      (3L, ("1\n00:00:01,000 --> 00:00:04,000\nx\n\n" +
        "2\n00:01:02,500 --> 00:01:05,250\ny\n").getBytes("UTF-8")),
      (4L, "junk".getBytes("UTF-8")),
      (5L, M.syntheticMjpegMp4(Seq(frame, frame))),
      // the Blu-ray-remux shape: PGS bitmap subs — the track
      // subtitleTrackCount always counted now carries interval-
      // accurate speech too, so detection and this gate AGREE
      (6L, M.syntheticWebm("video", width = 8, height = 8,
        durationMs = 3000L, docType = "matroska",
        imageSubs = Seq(("S_HDMV/PGS", "fre",
          Seq((0L, 600L), (1000L, 1600L))))))
    ).toDF("doc_id", "content")
    M.dialogCoverage(rows).orderBy(col("doc_id"))
  }

  private def dialogCoverageOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), CAST(4000 AS BIGINT), 1, 2,
      |  CAST(1800 AS BIGINT), 0.45),
      | -- overlapping cues count ONCE: union 900, not sum 1000
      | (CAST(2 AS BIGINT), CAST(2000 AS BIGINT), 1, 2,
      |  CAST(900 AS BIGINT), 0.45),
      | -- sidecars have no container duration: coverage unknowable
      | (CAST(3 AS BIGINT), CAST(NULL AS BIGINT), 1, 2,
      |  CAST(5750 AS BIGINT), CAST(NULL AS DOUBLE)),
      | (CAST(4 AS BIGINT), CAST(NULL AS BIGINT), 0, 0,
      |  CAST(0 AS BIGINT), CAST(NULL AS DOUBLE)),
      | -- an mvhd-less movie: no duration, no text tracks
      | (CAST(5 AS BIGINT), CAST(NULL AS BIGINT), 0, 0,
      |  CAST(0 AS BIGINT), CAST(NULL AS DOUBLE)),
      | -- PGS bitmap subs: interval union 1200 of 3000 = 0.4
      | (CAST(6 AS BIGINT), CAST(3000 AS BIGINT), 1, 2,
      |  CAST(1200 AS BIGINT), 0.4)
      |) AS t(doc_id, duration_ms, n_tracks, n_cues, speech_ms,
      |       coverage)
      |ORDER BY doc_id""".stripMargin

  /** Corpus-scale translation-pair mining — q201's operator driven
    * over `documents` (the q197 discipline: a dual-language MP4 per
    * third row, the caption frame rendered ONCE on the driver):
    * every asset muxes an eng tx3g track (1 + id%2 cues of 400 ms)
    * and a fre track shifted +100 ms, so each cue pairs EXACTLY its
    * own translation (300 ms overlap = 75% of the shorter cue) and
    * never a neighbor. One materialized cue scan + one equi-join on
    * the asset id; the job count is a function of the pipeline, not
    * the corpus (PlanAudit gate). Oracle = doc_id arithmetic.
    */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    // ONE frame for every asset, rendered on the driver and shipped
    // in the closure — per-row ImageIO encode was q197's whole cost
    val frame = graft.operators.Multimodal.renderJpeg(8, 8,
      (_, _) => (90 << 16) | (90 << 8) | 90)
    val rdd = docs.rdd.flatMap { r =>
      val id = r.getLong(0)
      if (id % 3 != 0) Nil
      else {
        val k = 1 + (id % 2).toInt
        val eng = (0 until k).map(j =>
          (j * 1000L, j * 1000L + 400L, s"line $j $id"))
        val fre = (0 until k).map(j =>
          (j * 1000L + 100L, j * 1000L + 500L, s"ligne $j $id"))
        Seq(org.apache.spark.sql.Row(id,
          graft.operators.Multimodal.syntheticMp4TimedText(Seq(frame),
            eng, codec = "tx3g", lang = "eng",
            cues2 = fre, codec2 = "tx3g", lang2 = "fre")))
      }
    }
    val assets = s.createDataFrame(rdd, schema).localCheckpoint(false)
    graft.operators.Multimodal.translationPairs(assets, "doc_id", "content")
      .groupBy((col("doc_id") % 4).as("grp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_pairs"),
        sum(col("overlap_ms")).as("overlap_ms"),
        sum(length(col("text_a")) + length(col("text_b")))
          .as("pair_chars"))
      .orderBy(col("grp"))
  }

  /** Corpus-scale conversational mining ([[graft.operators.Multimodal
    * .dialogTurns]] over a synthesized voiced-VTT corpus) — the
    * 100 TB plan check for q207's operator: a transcript for every
    * SECOND `documents` row with `1 + id%3` Ana→Ben exchanges (200 ms
    * reply gaps; 2 s scene gaps between exchanges also pair), one
    * map-only transcript scan, per-asset partitioned windows, ONE
    * aggregate. Oracle = doc_id arithmetic: pairs per doc = 2k−1,
    * Ana-led = k, gap sum = k·200 + (k−1)·2000. PlanAudit locks the
    * job count as pipeline-constant.
    */
  private def q208(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.StringType)))
    val rdd = docs.rdd.flatMap { r =>
      val id = r.getLong(0)
      if (id % 2 != 0) Nil
      else {
        val k = 1 + (id % 3).toInt
        val sb = new StringBuilder("WEBVTT\n\n")
        (0 until k).foreach { j =>
          val s0 = j * 4
          sb.append(f"00:00:$s0%02d.000 --> 00:00:${s0 + 1}%02d.000\n")
          sb.append(s"<v Ana>ask $j $id\n\n")
          sb.append(f"00:00:${s0 + 1}%02d.200 --> 00:00:${s0 + 2}%02d.000\n")
          sb.append(s"<v Ben>answer $j $id\n\n")
        }
        Seq(org.apache.spark.sql.Row(id, sb.toString))
      }
    }
    val assets = s.createDataFrame(rdd, schema)
    graft.operators.Multimodal.dialogTurns(assets, "doc_id", "content")
      .groupBy((col("doc_id") % 4).as("grp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_pairs"),
        sum(when(col("speaker_a") === "Ana", 1L).otherwise(0L))
          .as("ana_pairs"),
        sum(col("gap_ms")).as("gap_ms"))
      .orderBy(col("grp"))
  }

  private def turnsCorpusOracle: String =
    """SELECT doc_id % 4 AS grp,
      | CAST(count(*) AS BIGINT) AS n_docs,
      | CAST(sum(2 * (1 + doc_id % 3) - 1) AS BIGINT) AS n_pairs,
      | CAST(sum(1 + doc_id % 3) AS BIGINT) AS ana_pairs,
      | CAST(sum((1 + doc_id % 3) * 200
      |   + (doc_id % 3) * 2000) AS BIGINT) AS gap_ms
      |FROM documents WHERE doc_id % 2 = 0
      |GROUP BY doc_id % 4 ORDER BY grp""".stripMargin

  /** Cross-release plate linking ([[graft.operators.Dedup
    * .pgsPlateLinks]]) — q156's stripe-class discipline applied to
    * PGS subtitle plates: every 16th `documents` row carries an MKV
    * whose single plate is the doc's `id % 15` stripe pattern
    * (Hamming-0 within a class, ≥ 8 apart across, the q156 proof),
    * so links are exactly the within-class pairs and the oracle
    * replays `n·(n−1)/2` from the same arithmetic. One plate
    * decode+hash scan, one banded join, one aggregate.
    */
  private def q209(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Scale.parallelismFloor(
      t(s, dir, "documents").select(col("doc_id")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val rdd = docs.rdd.flatMap { r =>
      val id = r.getLong(0)
      if (id % 16 != 0) Nil
      else {
        val cls = (id % 15).toInt
        // the q156 stripe construction, in palette indices: light
        // stripe at grid column 1+2k per set bit k of (cls+1); the
        // per-doc dark/light VALUES wobble but every gradient keeps
        // its sign, so dHash is class-constant
        val dark = 20 + (id % 23).toInt
        val light = 200 + (id % 37).toInt
        val lightCols = (0 until 4).filter(k => ((cls + 1) >> k & 1) != 0)
          .map(k => 1 + 2 * k).toSet
        val mkv = graft.operators.Multimodal.syntheticWebm("video",
          width = 64, height = 64, durationMs = 4000L,
          docType = "matroska",
          imageSubs = Seq(("S_HDMV/PGS", "eng", Seq((0L, 1000L)))),
          pgsObjects = Map(0 -> ((64, 64, (x: Int, _: Int) => {
            val gridCol = x * 9 / 64
            if (lightCols(gridCol)) light else dark
          }))))
        Seq(org.apache.spark.sql.Row(id, mkv))
      }
    }
    val assets = s.createDataFrame(rdd, schema)
    graft.operators.Dedup.pgsPlateLinks(assets, "doc_id", "content")
      .groupBy((col("id_a") % 15).as("cls"))
      .agg(count(lit(1)).as("n_links"),
        min(col("shared_plates")).as("min_shared"),
        max(col("shared_plates")).as("max_shared"))
      .orderBy(col("cls"))
  }

  /** OCR'd image subtitles ([[graft.operators.Multimodal
    * .ocrImageSubtitles]]) — bitmap tracks become text cues through
    * the batched vision transport (the q45 discipline: a
    * DETERMINISTIC local client whose answer is a pure function of
    * the plate pixels, so the oracle can state the transcript as
    * literals). Two plates of different gray content "read" as
    * distinct texts on their own cue intervals; an interval-only PGS
    * track and junk contribute nothing.
    */
  private def q210(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val mkv = M.syntheticWebm("video", width = 8, height = 8,
      durationMs = 3000L, docType = "matroska",
      imageSubs = Seq(("S_HDMV/PGS", "fre",
        Seq((0L, 600L), (1000L, 1600L)))),
      pgsObjects = Map(0 -> ((8, 4, (x: Int, _: Int) =>
        if (x < 4) 200 else 60))))
    val solid = M.syntheticWebm("video", width = 8, height = 8,
      durationMs = 2000L, docType = "matroska",
      imageSubs = Seq(("S_HDMV/PGS", "jpn", Seq((100L, 900L)))),
      pgsObjects = Map(0 -> ((8, 4, (_: Int, _: Int) => 77))))
    val bare = M.syntheticWebm("video", width = 8, height = 8,
      durationMs = 2000L, docType = "matroska",
      imageSubs = Seq(("S_HDMV/PGS", "deu", Seq((0L, 300L)))))
    val rows = Seq((1L, mkv), (2L, solid), (3L, bare),
      (4L, "junk".getBytes("UTF-8"))).toDF("doc_id", "content")
    // deterministic "OCR": the plate's average gray — a pure
    // function of pixels, so the transcript is a closed form
    val fake: () => graft.llm.SemanticOps.VisionClient =
      () => new graft.llm.SemanticOps.VisionClient {
        def analyzeImages(prompt: String,
            images: Seq[(Array[Byte], String)]): Seq[String] =
          images.map { case (bytes, _) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            var sum = 0L
            for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
              sum += img.getRGB(x, y) & 0xff
            s"gray ${sum / (img.getWidth.toLong * img.getHeight)}"
          }
      }
    M.ocrImageSubtitles(rows, clientFactory = fake)
      .orderBy(col("doc_id"), col("track_idx"), col("cue_idx"))
  }

  private def ocrSubsOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 1, 1, CAST(0 AS BIGINT), CAST(600 AS BIGINT),
      |  'gray 130'),
      | (CAST(1 AS BIGINT), 1, 2, CAST(1000 AS BIGINT),
      |  CAST(1600 AS BIGINT), 'gray 130'),
      | (CAST(2 AS BIGINT), 1, 1, CAST(100 AS BIGINT),
      |  CAST(900 AS BIGINT), 'gray 77')
      | -- interval-only PGS (no ODS) and junk: no plates, no text
      |) AS t(doc_id, track_idx, cue_idx, start_ms, end_ms, text)
      |ORDER BY doc_id, track_idx, cue_idx""".stripMargin

  /** Per-speaker talk statistics ([[graft.operators.Multimodal
    * .speakerStats]]) — the casting-balance gate: union talk time
    * per voiced speaker (overlapping karaoke repeats count once via
    * the gaps-and-islands window program) and each speaker's share
    * of the track's voiced total. Ana's stacked pair unions to
    * 1500 ms and her scene-cut line adds 600 more; the unvoiced SRT
    * and junk contribute nothing.
    */
  private def q211(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vtt = ("WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n" +
      "<v Ana>first\n\n00:00:00.800 --> 00:00:01.500\n" +
      "<v Ana>stacked\n\n00:00:02.000 --> 00:00:02.500\n" +
      "<v Ben>reply\n\n00:00:05.000 --> 00:00:05.600\n" +
      "<v Ana>later\n")
    val rows = Seq(
      (1L, vtt.getBytes("UTF-8")),
      (2L, "1\n00:00:01,000 --> 00:00:02,000\nplain\n".getBytes("UTF-8")),
      (3L, "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    graft.operators.Multimodal.speakerStats(rows)
      .orderBy(col("doc_id"), col("track_idx"), col("speaker"))
  }

  private def speakerStatsOracle: String =
    """SELECT * FROM (VALUES
      | -- Ana: (0,1000)+(800,1500) union 1500, + 600 later = 2100
      | (CAST(1 AS BIGINT), 1, 'Ana', CAST(3 AS BIGINT),
      |  CAST(2100 AS BIGINT), round(2100/2600.0, 4)),
      | (CAST(1 AS BIGINT), 1, 'Ben', CAST(1 AS BIGINT),
      |  CAST(500 AS BIGINT), round(500/2600.0, 4))
      |) AS t(doc_id, track_idx, speaker, n_cues, talk_ms, talk_share)
      |ORDER BY doc_id, track_idx, speaker""".stripMargin

  private def plateLinkOracle: String =
    """WITH d AS (SELECT doc_id % 15 AS cls, count(*) AS n
      |  FROM documents WHERE doc_id % 16 = 0 GROUP BY 1)
      |SELECT cls, CAST(n * (n - 1) // 2 AS BIGINT) AS n_links,
      | CAST(1 AS BIGINT) AS min_shared, CAST(1 AS BIGINT) AS max_shared
      |FROM d WHERE n > 1 ORDER BY cls""".stripMargin

  /** Per-track dialog coverage ([[graft.operators.Multimodal
    * .dialogCoverageByTrack]]) — the bilingual clip-mining gate:
    * a dubbed release's coverage is per-language ("mine eng+fre
    * pairs where BOTH tracks cover >= X%"), which q203's
    * primary-track report cannot answer. Fixtures: a dual-track MP4
    * (eng covers 50%, the fre dub only 12.5%), a Matroska muxing a
    * text track, a PGS bitmap track, AND a declaration-only VobSub
    * track (zero cues, zero coverage — visible, not vanished), a
    * sidecar (no duration → null coverage), junk (no rows).
    */
  private def q205(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val frame = M.renderJpeg(8, 8, (_, _) => gray(80))
    val rows = Seq(
      // 100 frames x 40 ms = 4000 ms; eng union 2000, fre 500
      (1L, M.syntheticMp4TimedText(Seq.fill(100)(frame),
        Seq((0L, 1000L, "one"), (2000L, 3000L, "two")),
        codec = "tx3g", lang = "eng",
        cues2 = Seq((100L, 600L, "un")), codec2 = "wvtt", lang2 = "fre")),
      // 2000 ms matroska: text 900/2000, PGS 1200/2000, VobSub 0
      (2L, M.syntheticWebm("video", width = 8, height = 8,
        durationMs = 2000L, docType = "matroska", subtitleTracks = 1,
        subLang = Some("spa"),
        subCues = Seq((0L, 500L, "a"), (400L, 900L, "b")),
        imageSubs = Seq(("S_HDMV/PGS", "fre", Seq((0L, 600L), (1000L, 1600L))),
          ("S_VOBSUB", "deu", Nil)))),
      (3L, ("1\n00:00:01,000 --> 00:00:02,000\nx\n").getBytes("UTF-8")),
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    M.dialogCoverageByTrack(rows)
      .orderBy(col("doc_id"), col("track_idx"))
  }

  private def covByTrackOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 1, 'tx3g', 'eng', CAST(4000 AS BIGINT), 2,
      |  CAST(2000 AS BIGINT), 0.5),
      | -- the dub's own ratio: the question q203's primary can't answer
      | (CAST(1 AS BIGINT), 2, 'wvtt', 'fre', CAST(4000 AS BIGINT), 1,
      |  CAST(500 AS BIGINT), 0.125),
      | (CAST(2 AS BIGINT), 1, 'matroska', 'spa', CAST(2000 AS BIGINT), 2,
      |  CAST(900 AS BIGINT), 0.45),
      | (CAST(2 AS BIGINT), 2, 'pgs', 'fre', CAST(2000 AS BIGINT), 2,
      |  CAST(1200 AS BIGINT), 0.6),
      | -- declaration-only image subs: visible with zero coverage
      | (CAST(2 AS BIGINT), 3, 'vobsub', 'deu', CAST(2000 AS BIGINT), 0,
      |  CAST(0 AS BIGINT), 0.0),
      | (CAST(3 AS BIGINT), 1, 'srt', CAST(NULL AS VARCHAR),
      |  CAST(NULL AS BIGINT), 1, CAST(1000 AS BIGINT),
      |  CAST(NULL AS DOUBLE))
      |) AS t(doc_id, track_idx, sub_format, declared_lang, duration_ms,
      |       n_cues, speech_ms, coverage)
      |ORDER BY doc_id, track_idx""".stripMargin

  /** PGS bitmap plates through the vision stack
    * ([[graft.operators.Multimodal.imageSubtitleBitmaps]]) — the OCR
    * seam for image subtitles: each Blu-ray-style display interval's
    * ODS object decodes (RLE + BT.709 palette, composited on black)
    * into a PNG the image stack reads. Fixtures: a dual-interval PGS
    * MKV whose 8×4 plate is half gray(200)/half gray(60) (luma
    * 130/255), a half-transparent plate (100/255), an interval-only
    * PGS track (no ODS ever muxed → intervals but no plates), junk.
    * Every value a closed form of the palette-index grid.
    */
  private def q206(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = graft.operators.Multimodal
    val rows = Seq(
      (1L, M.syntheticWebm("video", width = 8, height = 8,
        durationMs = 3000L, docType = "matroska",
        imageSubs = Seq(("S_HDMV/PGS", "fre",
          Seq((0L, 600L), (1000L, 1600L)))),
        pgsObjects = Map(0 -> ((8, 4, (x: Int, _: Int) =>
          if (x < 4) 200 else 60))))),
      (2L, M.syntheticWebm("video", width = 8, height = 8,
        durationMs = 2000L, docType = "matroska",
        imageSubs = Seq(("S_HDMV/PGS", "jpn", Seq((0L, 500L)))),
        pgsObjects = Map(0 -> ((8, 4, (x: Int, _: Int) =>
          if (x < 4) 200 else 0))))),
      (3L, M.syntheticWebm("video", width = 8, height = 8,
        durationMs = 2000L, docType = "matroska",
        imageSubs = Seq(("S_HDMV/PGS", "deu", Seq((0L, 300L)))))),
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    val bm = graft.operators.Multimodal.imageSubtitleBitmaps(rows)
    graft.operators.Multimodal.imageStats(bm, "bitmap")
      .select(col("doc_id"), col("track_idx"), col("cue_idx"),
        col("start_ms"), col("end_ms"), col("width"), col("height"),
        col("stats.ok").as("decodes"),
        round((col("stats.avg_r") + col("stats.avg_g") +
          col("stats.avg_b")) / 3.0, 4).as("plate_luma"))
      .orderBy(col("doc_id"), col("track_idx"), col("cue_idx"))
  }

  private def pgsBitmapOracle: String =
    """SELECT * FROM (VALUES
      | -- half gray(200) / half gray(60): luma (200+60)/2/255
      | (CAST(1 AS BIGINT), 1, 1, CAST(0 AS BIGINT), CAST(600 AS BIGINT),
      |  8, 4, TRUE, round((200 + 60) / 2.0 / 255, 4)),
      | (CAST(1 AS BIGINT), 1, 2, CAST(1000 AS BIGINT),
      |  CAST(1600 AS BIGINT), 8, 4, TRUE,
      |  round((200 + 60) / 2.0 / 255, 4)),
      | -- transparent half composites onto black: 200/2/255
      | (CAST(2 AS BIGINT), 1, 1, CAST(0 AS BIGINT), CAST(500 AS BIGINT),
      |  8, 4, TRUE, round(200 / 2.0 / 255, 4))
      | -- doc 3 declares intervals but muxes no ODS: no plate rows
      |) AS t(doc_id, track_idx, cue_idx, start_ms, end_ms, width,
      |       height, decodes, plate_luma)
      |ORDER BY doc_id, track_idx, cue_idx""".stripMargin

  /** Conversational turn pairs ([[graft.operators.Multimodal
    * .dialogTurns]]) — voiced-VTT cues merge into speaker turns and
    * adjacent different-speaker turns within the 5 s gap budget emit
    * prompt/response pairs. Fixtures: a four-speaker-turn exchange
    * with a Ben double-cue merge and a 14 s scene cut (same-speaker
    * resumption never pairs), a sound-tag interruption that must NOT
    * split Ana's turn, an unvoiced SRT and junk (nothing).
    */
  private def q207(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vtt1 = ("WEBVTT\n\n00:00:00.000 --> 00:00:02.000\n" +
      "<v Ana>hello there\n\n00:00:02.200 --> 00:00:04.000\n" +
      "<v Ben>hi!\n\n00:00:04.100 --> 00:00:05.000\n" +
      "<v Ben>how are you\n\n00:00:05.200 --> 00:00:06.000\n" +
      "<v Ana>fine\n\n00:00:20.000 --> 00:00:21.000\n" +
      "<v Ana>later scene\n\n00:00:21.200 --> 00:00:22.000\n" +
      "<v Ben>indeed\n")
    val vtt2 = ("WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n" +
      "<v Ana>first half\n\n00:00:01.100 --> 00:00:01.500\n" +
      "[door slams]\n\n00:00:01.600 --> 00:00:02.000\n" +
      "<v Ana>second half\n\n00:00:02.100 --> 00:00:03.000\n" +
      "<v Ben>reply\n")
    val rows = Seq(
      (1L, vtt1.getBytes("UTF-8")),
      (2L, vtt2.getBytes("UTF-8")),
      (3L, "1\n00:00:01,000 --> 00:00:02,000\nplain\n".getBytes("UTF-8")),
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    graft.operators.Multimodal.dialogTurns(rows)
      .orderBy(col("doc_id"), col("turn_idx"))
  }

  private def dialogTurnsOracle: String =
    """SELECT * FROM (VALUES
      | (CAST(1 AS BIGINT), 1, CAST(1 AS BIGINT), 'Ana', 'hello there',
      |  'Ben', 'hi! how are you', CAST(200 AS BIGINT)),
      | (CAST(1 AS BIGINT), 1, CAST(2 AS BIGINT), 'Ben',
      |  'hi! how are you', 'Ana', 'fine', CAST(200 AS BIGINT)),
      | -- the 14 s scene cut breaks Ana's turn; her resumption pairs
      | -- with Ben's answer, never with her own earlier line
      | (CAST(1 AS BIGINT), 1, CAST(4 AS BIGINT), 'Ana', 'later scene',
      |  'Ben', 'indeed', CAST(200 AS BIGINT)),
      | -- the [door slams] sound tag carries no voice: Ana's halves
      | -- stay ONE turn
      | (CAST(2 AS BIGINT), 1, CAST(1 AS BIGINT), 'Ana',
      |  'first half second half', 'Ben', 'reply', CAST(100 AS BIGINT))
      |) AS t(doc_id, track_idx, turn_idx, speaker_a, text_a,
      |       speaker_b, text_b, gap_ms)
      |ORDER BY doc_id, turn_idx""".stripMargin

  private def transPairCorpusOracle: String =
    """SELECT doc_id % 4 AS grp,
      | CAST(count(*) AS BIGINT) AS n_docs,
      | CAST(sum(1 + doc_id % 2) AS BIGINT) AS n_pairs,
      | CAST(sum((1 + doc_id % 2) * 300) AS BIGINT) AS overlap_ms,
      | -- 'line j <id>' (7+len) + 'ligne j <id>' (8+len) per pair
      | CAST(sum((1 + doc_id % 2)
      |   * (15 + 2 * length(CAST(doc_id AS VARCHAR)))) AS BIGINT)
      |   AS pair_chars
      |FROM documents WHERE doc_id % 3 = 0
      |GROUP BY doc_id % 4 ORDER BY grp""".stripMargin

  // ===================================================================
  // Registry
  // ===================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing" -> (q01 _),
    "q02_rev_nation" -> (q02 _),
    "q03_top_orders" -> (q03 _),
    "q04_semi_join" -> (q04 _),
    "q05_cust_no_orders" -> (q05 _),
    "q06_forecast" -> (q06 _),
    "q07_success_rate" -> (q07 _),
    "q08_top_failures" -> (q08 _),
    "q09_frank" -> (q09 _),
    "q10_wprog" -> (q10 _),
    "q11_ndist" -> (q11 _),
    "q12_risk_grades" -> (q12 _),
    "q13_histo" -> (q13 _),
    "q14_rollup_acctbal" -> (q14 _),
    "q15_distinct_flags" -> (q15 _),
    "q16_stall_runs" -> (q16 _),
    "q17_running_total" -> (q17 _),
    "q18_top3_per_type" -> (q18 _),
    "q19_recent_events" -> (q19 _),
    "q20_page_lineitem" -> (q20 _),
    "q21_union_segments" -> (q21 _),
    "q22_common_nations" -> (q22 _),
    "q23_anti_nations" -> (q23 _),
    "q24_dedup_stats" -> (q24 _),
    "q25_dups" -> (q25 _),
    "q26_brand_like" -> (q26 _),
    "q27_string_funcs" -> (q27 _),
    "q28_monthly_orders" -> (q28 _),
    "q29_json_extract" -> (q29 _),
    "q30_hourly_windows" -> (q30 _),
    "q31_token_stats" -> (q31 _),
    "q32_doc_ratios" -> (q32 _),
    "q33_knn_brute" -> (q33 _),
    "q34_edge_filter" -> (q34 _),
    "q35_graph_route" -> (q35 _),
    "q36_compact" -> (q36 _),
    "q37_minhash_nd" -> (q37 _),
    "q38_simhash_nd" -> (q38 _),
    "q39_langid_mix" -> (q39 _),
    "q40_quality_scores" -> (q40 _),
    "q41_knn_lsh" -> (q41 _),
    "q42_emb_neardup" -> (q42 _),
    "q43_hll" -> (q43 _),
    "q44_mm_decode" -> (q44 _),
    "q45_semantic_judge" -> (q45 _),
    "q46_sess" -> (q46 _),
    "q47_risk_weighted" -> (q47 _),
    "q48_pctls" -> (q48 _),
    "q49_ljoin" -> (q49 _),
    "q50_cube_orders" -> (q50 _),
    "q51_subq" -> (q51 _),
    "q52_window_suite" -> (q52 _),
    "q53_dedup_corpus" -> (q53 _),
    "q54_knn_ivf" -> (q54 _),
    "q55_sentiment_mix" -> (q55 _),
    "q56_cdc_upsert" -> (q56 _),
    "q57_state_asof" -> (q57 _),
    "q58_cross_linking" -> (q58 _),
    "q59_approx_pctl" -> (q59 _),
    "q60_curate" -> (q60 _),
    "q61_html" -> (q61 _),
    "q62_asof_join" -> (q62 _),
    "q63_range_join" -> (q63 _),
    "q64_decontam" -> (q64 _),
    "q65_packing" -> (q65 _),
    "q66_strat" -> (q66 _),
    "q67_ngram_overlap" -> (q67 _),
    "q68_repetition" -> (q68 _),
    "q69_pii" -> (q69 _),
    "q70_shuffle_order" -> (q70 _),
    "q71_int8_knn" -> (q71 _),
    "q72_bloom_prune" -> (q72 _),
    "q73_rerank" -> (q73 _),
    "q74_mixture" -> (q74 _),
    "q75_topk" -> (q75 _),
    "q76_nfc" -> (q76 _),
    "q77_export" -> (q77 _),
    "q78_ivf_part" -> (q78 _),
    "q79_img_px" -> (q79 _),
    "q80_bm25" -> (q80 _),
    "q81_hybrid" -> (q81 _),
    "q82_ppl" -> (q82 _),
    "q83_dsir" -> (q83 _),
    "q84_semdd" -> (q84 _),
    "q85_qgate" -> (q85 _),
    "q86_md" -> (q86 _),
    "q87_lines" -> (q87 _),
    "q88_chunk" -> (q88 _),
    "q89_ndcg" -> (q89 _),
    "q90_phr" -> (q90 _),
    "q91_lex" -> (q91 _),
    "q92_tfidf" -> (q92 _),
    "q93_pmi" -> (q93 _),
    "q94_substr_spans" -> (q94 _),
    "q95_substr_frac" -> (q95 _),
    "q96_url_canon" -> (q96 _),
    "q97_domain_block" -> (q97 _),
    "q98_domain_qgate" -> (q98 _),
    "q99_video_frames" -> (q99 _),
    "q100_xspans" -> (q100 _),
    "q101_tok_budget" -> (q101 _),
    "q102_nbq" -> (q102 _),
    "q103_zorder" -> (q103 _),
    "q104_heavy" -> (q104 _),
    "q105_pgrank" -> (q105 _),
    "q106_temp" -> (q106 _),
    "q107_contain" -> (q107 _),
    "q108_shift" -> (q108 _),
    "q109_keepbest" -> (q109 _),
    "q110_funnel" -> (q110 _),
    "q111_cohort" -> (q111 _),
    "q112_zanom" -> (q112 _),
    "q113_kmv" -> (q113 _),
    "q114_split" -> (q114 _),
    "q115_gopher" -> (q115 _),
    "q116_snapdiff" -> (q116 _),
    "q117_pctrank" -> (q117 _),
    "q118_kmv_jacc" -> (q118 _),
    "q119_markov" -> (q119 _),
    "q120_convlag" -> (q120 _),
    "q121_winsor" -> (q121 _),
    "q122_cms" -> (q122 _),
    "q123_gapfill" -> (q123 _),
    "q124_skew" -> (q124 _),
    "q125_eqdepth" -> (q125 _),
    "q126_lprop" -> (q126 _),
    "q127_hardneg" -> (q127 _),
    "q128_ccnet" -> (q128 _),
    "q129_dq" -> (q129 _),
    "q130_joinest" -> (q130 _),
    "q131_psi" -> (q131 _),
    "q132_tis" -> (q132 _),
    "q133_mad" -> (q133 _),
    "q134_dsplit" -> (q134 _),
    "q135_novel" -> (q135 _),
    "q136_ilv" -> (q136 _),
    "q137_paths" -> (q137 _),
    "q138_rfm" -> (q138 _),
    "q139_auc" -> (q139 _),
    "q140_calib" -> (q140 _),
    "q141_vocab" -> (q141 _),
    "q142_sqlfn" -> (q142 _),
    "q143_pq" -> (q143 _),
    "q144_unitok" -> (q144 _),
    "q145_wds" -> (q145 _),
    "q146_card" -> (q146 _),
    "q147_c4" -> (q147 _),
    "q148_imgdup" -> (q148 _),
    "q149_badwords" -> (q149 _),
    "q150_audio" -> (q150 _),
    "q151_kll" -> (q151 _),
    "q152_mcard" -> (q152 _),
    "q153_auddup" -> (q153 _),
    "q154_mpeg" -> (q154 _),
    "q155_texty" -> (q155 _),
    "q156_imgcorp" -> (q156 _),
    "q157_mcorp" -> (q157 _),
    "q158_cut" -> (q158 _),
    "q159_acodec" -> (q159 _),
    "q160_gifbmp" -> (q160 _),
    "q161_gps" -> (q161 _),
    "q162_webp" -> (q162 _),
    "q163_aac" -> (q163 _),
    "q164_vidcorp" -> (q164 _),
    "q165_audcorp" -> (q165 _),
    "q166_tiff" -> (q166 _),
    "q167_vp8l" -> (q167 _),
    "q168_avif" -> (q168 _),
    "q169_mcard" -> (q169 _),
    "q170_atags" -> (q170 _),
    "q171_dreport" -> (q171 _),
    "q172_sreport" -> (q172 _),
    "q173_webm" -> (q173 _),
    "q174_anim" -> (q174 _),
    "q175_gpscrub" -> (q175 _),
    "q176_vidgps" -> (q176 _),
    "q177_jxl" -> (q177 _),
    "q178_mixdedup" -> (q178 _),
    "q179_itext" -> (q179 _),
    "q180_art" -> (q180 _),
    "q181_subs" -> (q181 _),
    "q182_lyrics" -> (q182 _),
    "q183_subtrk" -> (q183 _),
    "q184_mcard3" -> (q184 _),
    "q185_mkvsubs" -> (q185 _),
    "q186_prov" -> (q186 _),
    "q187_pairs" -> (q187 _),
    "q188_ico" -> (q188 _),
    "q189_apngsvg" -> (q189 _),
    "q190_capcorp" -> (q190 _),
    "q191_lrc" -> (q191 _),
    "q192_mp4text" -> (q192 _),
    "q193_sylt" -> (q193 _),
    "q194_artlink" -> (q194 _),
    "q195_cuelang" -> (q195 _),
    "q196_chapters" -> (q196 _),
    "q197_clippairs" -> (q197 _),
    "q198_thumblink" -> (q198 _),
    "q199_artincr" -> (q199 _),
    "q200_multitrack" -> (q200 _),
    "q201_transpairs" -> (q201 _),
    "q202_chapalign" -> (q202 _),
    "q203_dialogcov" -> (q203 _),
    "q204_tpaircorp" -> (q204 _),
    "q205_covtrk" -> (q205 _),
    "q206_pgsbmp" -> (q206 _),
    "q207_turns" -> (q207 _),
    "q208_turncorp" -> (q208 _),
    "q209_platelink" -> (q209 _),
    "q210_ocrsubs" -> (q210 _),
    "q211_spkstats" -> (q211 _))

  def oracleSql: Map[String, String] = Map(
    "q01_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_rev_nation" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q03_top_orders" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_cust_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q06_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q07_success_rate" ->
      """SELECT o_orderpriority, count(*) AS n_total,
        | round(avg(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END), 4) AS success_rate
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q08_top_failures" ->
      """SELECT user_id AS error_key, count(*) AS n_failures FROM events
        |WHERE event_type = 'error' GROUP BY user_id
        |ORDER BY n_failures DESC, error_key LIMIT 5""".stripMargin,
    "q09_frank" ->
      """SELECT user_id, count(*) AS n_total,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
        | round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
        |   AS failure_rate
        |FROM events GROUP BY user_id
        |HAVING round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0 / count(*), 4) > 0.1
        |ORDER BY failure_rate DESC, user_id""".stripMargin,
    "q10_wprog" ->
      """SELECT event_type,
        | round(sum(CAST(json_extract_string(props, '$.k') AS DOUBLE) * value)
        |   / greatest(sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 1.0), 4)
        |   AS weighted_progress
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q11_ndist" ->
      """SELECT count(DISTINCT user_id) AS n_distinct_user_id,
        | count(DISTINCT concat(user_id, ':', event_type)) AS n_distinct_user_event
        |FROM events""".stripMargin,
    "q12_risk_grades" ->
      """SELECT CASE WHEN least(greatest(c_acctbal / 100.0, 0.0), 100.0) >= 90 THEN 'A'
        |            WHEN least(greatest(c_acctbal / 100.0, 0.0), 100.0) >= 80 THEN 'B'
        |            WHEN least(greatest(c_acctbal / 100.0, 0.0), 100.0) >= 70 THEN 'C'
        |            WHEN least(greatest(c_acctbal / 100.0, 0.0), 100.0) >= 60 THEN 'D'
        |            ELSE 'F' END AS grade,
        | count(*) AS n_customers, round(avg(c_acctbal), 2) AS avg_acctbal
        |FROM customer GROUP BY 1 ORDER BY grade""".stripMargin,
    "q13_histo" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "q14_rollup_acctbal" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q15_distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q16_stall_runs" ->
      """SELECT user_id, count(*) AS n_stalls FROM (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER w AS p1, lag(event_type, 2) OVER w AS p2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |WHERE event_type = p1 AND event_type = p2 AND len(event_type) > 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q17_running_total" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q18_top3_per_type" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn <= 3
        |ORDER BY event_type, value DESC, event_id""".stripMargin,
    "q19_recent_events" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY event_id DESC LIMIT 20""".stripMargin,
    "q20_page_lineitem" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 50 OFFSET 100""".stripMargin,
    "q21_union_segments" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value FROM (
        |  SELECT user_id, value FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, value FROM events WHERE event_type = 'signup')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q22_common_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q23_anti_nations" ->
      """SELECT n_nationkey AS nationkey FROM nation
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q24_dedup_stats" ->
      """SELECT count(*) AS n_docs,
        | count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_unique
        |FROM documents""".stripMargin,
    "q25_dups" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        | min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY fingerprint""".stripMargin,
    "q26_brand_like" ->
      """SELECT p_type, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
        |FROM part WHERE p_name LIKE '%red%' GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q27_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS name_len,
        | substring(c_name, 1, 8) AS prefix, regexp_replace(c_name, '#', '-', 'g') AS dashed
        |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin,
    "q28_monthly_orders" ->
      """SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin,
    "q29_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,
    "q30_hourly_windows" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q31_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |   t -> len(t) > 0))) AS BIGINT) AS sum_tokens,
        | round(avg(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |   t -> len(t) > 0))), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q32_doc_ratios" ->
      """SELECT source,
        | round(avg(CASE WHEN len(text) = 0 THEN 0.0 ELSE
        |   len(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / len(text) END), 4)
        |   AS avg_punct_ratio,
        | round(avg(CASE WHEN len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |     t -> len(t) > 0)) = 0 THEN 0.0 ELSE
        |   len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |     t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was',
        |       'for','on','with','as','by','at','it','that','this','be'], t))) * 1.0 /
        |   len(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0))
        |   END), 4) AS avg_stopword_ratio
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q33_knn_brute" ->
      """SELECT e.vec_id,
        | round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |   CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings e,
        | (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin,
    "q34_edge_filter" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |WHERE value > 100 AND event_type <> 'error' AND contains(props, 'k')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q35_graph_route" ->
      """SELECT CASE WHEN value > 100 THEN 'hot' ELSE 'cold' END AS side,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY side""".stripMargin,
    "q36_compact" ->
      """SELECT user_id, event_id,
        | (rn <= keep_n AND run_tokens <= 5000) AS keep
        |FROM (
        |  SELECT user_id, event_id,
        |    sum(tokens) OVER (PARTITION BY user_id ORDER BY event_id DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_tokens,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn,
        |    CASE WHEN sum(tokens) OVER (PARTITION BY user_id) / 5000.0 < 0.8 THEN 2147483647
        |         WHEN sum(tokens) OVER (PARTITION BY user_id) / 5000.0 < 1.0 THEN 4
        |         WHEN sum(tokens) OVER (PARTITION BY user_id) / 5000.0 < 1.2 THEN 2
        |         ELSE 1 END AS keep_n
        |  FROM (SELECT user_id, event_id, CAST(floor(value) AS BIGINT) AS tokens FROM events))
        |ORDER BY user_id, event_id""".stripMargin,
    "q46_sess" ->
      """SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
        | max(n_events) AS max_session_events
        |FROM (
        |  SELECT user_id, session_id, count(*) AS n_events FROM (
        |    SELECT user_id, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |    FROM (
        |      SELECT user_id, event_id, date_trunc('second', ts) AS ts_s,
        |        CASE WHEN lag(date_trunc('second', ts)) OVER
        |            (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id)
        |            IS NULL THEN 1
        |          WHEN date_trunc('second', ts) - lag(date_trunc('second', ts)) OVER
        |            (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id)
        |            > INTERVAL 300 SECOND THEN 1
        |          ELSE 0 END AS new_sess
        |      FROM events))
        |  GROUP BY user_id, session_id)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q47_risk_weighted" ->
      """SELECT risk_grade, count(*) AS n, round(avg(risk_score), 2) AS avg_score
        |FROM (
        |  SELECT round(
        |    least((CASE WHEN c_acctbal >= 5000 THEN 60.0 ELSE 0.0 END
        |         + CASE WHEN c_acctbal >= 1000 THEN 40.0 ELSE 0.0 END), 100.0) * 0.7
        |    + least((CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 80.0 ELSE 0.0 END
        |         + CASE WHEN c_nationkey % 2 = 0 THEN 20.0 ELSE 0.0 END), 100.0) * 0.3,
        |    2) AS risk_score,
        |    CASE WHEN round(
        |      least((CASE WHEN c_acctbal >= 5000 THEN 60.0 ELSE 0.0 END
        |           + CASE WHEN c_acctbal >= 1000 THEN 40.0 ELSE 0.0 END), 100.0) * 0.7
        |      + least((CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 80.0 ELSE 0.0 END
        |           + CASE WHEN c_nationkey % 2 = 0 THEN 20.0 ELSE 0.0 END), 100.0) * 0.3,
        |      2) >= 90 THEN 'A'
        |      WHEN round(
        |      least((CASE WHEN c_acctbal >= 5000 THEN 60.0 ELSE 0.0 END
        |           + CASE WHEN c_acctbal >= 1000 THEN 40.0 ELSE 0.0 END), 100.0) * 0.7
        |      + least((CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 80.0 ELSE 0.0 END
        |           + CASE WHEN c_nationkey % 2 = 0 THEN 20.0 ELSE 0.0 END), 100.0) * 0.3,
        |      2) >= 80 THEN 'B'
        |      WHEN round(
        |      least((CASE WHEN c_acctbal >= 5000 THEN 60.0 ELSE 0.0 END
        |           + CASE WHEN c_acctbal >= 1000 THEN 40.0 ELSE 0.0 END), 100.0) * 0.7
        |      + least((CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 80.0 ELSE 0.0 END
        |           + CASE WHEN c_nationkey % 2 = 0 THEN 20.0 ELSE 0.0 END), 100.0) * 0.3,
        |      2) >= 70 THEN 'C'
        |      WHEN round(
        |      least((CASE WHEN c_acctbal >= 5000 THEN 60.0 ELSE 0.0 END
        |           + CASE WHEN c_acctbal >= 1000 THEN 40.0 ELSE 0.0 END), 100.0) * 0.7
        |      + least((CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 80.0 ELSE 0.0 END
        |           + CASE WHEN c_nationkey % 2 = 0 THEN 20.0 ELSE 0.0 END), 100.0) * 0.3,
        |      2) >= 60 THEN 'D' ELSE 'F' END AS risk_grade
        |  FROM customer)
        |GROUP BY risk_grade ORDER BY risk_grade""".stripMargin,
    "q48_pctls" ->
      """SELECT event_type, count(*) AS n,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.95), 4) AS p95,
        | round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q49_ljoin" ->
      """SELECT c_mktsegment, count(*) AS n_rows, count(o_orderkey) AS n_orders,
        | round(sum(coalesce(o_totalprice, 0.0)), 2) AS sum_price
        |FROM customer LEFT JOIN (
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01') o
        |ON c_custkey = o.o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q50_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q51_subq" ->
      """SELECT o_orderpriority, count(*) AS n_above_avg
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q52_window_suite" ->
      """SELECT event_type, event_id, value, rnk, drnk, quartile,
        | prev_value, next_value
        |FROM (
        |  SELECT event_type, event_id, value,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    ntile(4) OVER w AS quartile,
        |    round(lag(value, 1) OVER w, 2) AS prev_value,
        |    round(lead(value, 1) OVER w, 2) AS next_value,
        |    row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id))
        |WHERE rn <= 5 ORDER BY event_type, value DESC, event_id""".stripMargin,
    "q37_minhash_nd" ->
      s"""WITH $ShingleJaccardCte
         |SELECT id_a, id_b, jaccard FROM jacc WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "q38_simhash_nd" ->
      s"""WITH $ShingleJaccardCte
         |SELECT id_a, id_b, jaccard FROM jacc WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "q39_langid_mix" ->
      """WITH s AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0) AS toks FROM documents),
        |sc AS (
        |  SELECT
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ein','eine','ist','von','mit','für'))) AS de,
        |    len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','that','this','be'))) AS en,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','un','una','por','con','para','es'))) AS es,
        |    len(list_filter(toks, t -> t IN ('le','la','de','et','un','une','pour','dans','est','que','au'))) AS fr
        |  FROM s)
        |SELECT CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
        |            WHEN de >= en AND de >= es AND de >= fr THEN 'de'
        |            WHEN en >= es AND en >= fr THEN 'en'
        |            WHEN es >= fr THEN 'es'
        |            ELSE 'fr' END AS detected_lang,
        |       count(*) AS n
        |FROM sc GROUP BY 1 ORDER BY detected_lang""".stripMargin,
    "q40_quality_scores" ->
      """WITH s AS (
        |  SELECT lang, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |q AS (
        |  SELECT lang,
        |    round(
        |      least(len(toks) / 50.0, 1.0) * 0.4
        |      + least((CASE WHEN len(toks) = 0 THEN 0.0
        |          ELSE len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','that','this','be'))) * 1.0 / len(toks) END) * 4.0, 1.0) * 0.3
        |      + greatest(0.0, 1.0 - (CASE WHEN len(text) = 0 THEN 0.0
        |          ELSE len(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / len(text) END) * 5.0) * 0.3,
        |      4) AS qs,
        |    len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9'']+'), x -> len(x) > 0))
        |      + len(regexp_extract_all(text, '[a-z][A-Z]'))
        |      + len(regexp_extract_all(text, '[A-Za-z][0-9]'))
        |      + len(regexp_extract_all(text, '[0-9][A-Za-z]')) AS bp
        |  FROM s)
        |SELECT lang, round(avg(qs), 4) AS avg_quality, round(avg(bp), 2) AS avg_bpeish_tokens
        |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
    "q41_knn_lsh" -> knnLshOracle,
    "q42_emb_neardup" -> embeddingNearDupOracle,
    "q43_hll" ->
      """SELECT
        | abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |   <= 0.05 * count(DISTINCT user_id) AS users_within_5pct,
        | abs(approx_count_distinct(user_id || ':' || event_type)
        |     - count(DISTINCT user_id || ':' || event_type))
        |   <= 0.05 * count(DISTINCT user_id || ':' || event_type) AS user_events_within_5pct
        |FROM events""".stripMargin,
    "q44_mm_decode" ->
      """SELECT format, n, avg_width, avg_sr, total_ms FROM (
        |  SELECT 'raw' AS format, count(*) AS n,
        |    round(avg(64 + octet_length(encode(text)) % 1024), 2) AS avg_width,
        |    CAST(NULL AS DOUBLE) AS avg_sr, CAST(NULL AS BIGINT) AS total_ms
        |  FROM documents
        |  UNION ALL
        |  -- real header parses of the PNG fixtures: (640+800+1024)/3
        |  SELECT 'png', CAST(3 AS BIGINT), CAST(821.33 AS DOUBLE),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
        |  UNION ALL
        |  -- real header parses of the JPEG fixtures: (320+512)/2
        |  SELECT 'jpeg', CAST(2 AS BIGINT), CAST(416.0 AS DOUBLE),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
        |  UNION ALL
        |  -- RIFF chunk walk: rates (44100+16000)/2, durations 2500+1000
        |  SELECT 'wav', CAST(2 AS BIGINT), CAST(NULL AS DOUBLE),
        |    CAST(30050.0 AS DOUBLE), CAST(3500 AS BIGINT)
        |  UNION ALL
        |  -- ISO-BMFF box walk: tkhd 16.16 width, mvhd duration
        |  SELECT 'mp4', CAST(1 AS BIGINT), CAST(1920.0 AS DOUBLE),
        |    CAST(NULL AS DOUBLE), CAST(90000 AS BIGINT)
        |) ORDER BY format""".stripMargin,
    "q45_semantic_judge" ->
      """SELECT lang, len(text) > 300 AS verdict, count(*) AS n
        |FROM documents GROUP BY lang, verdict ORDER BY lang, verdict""".stripMargin,
    "q53_dedup_corpus" ->
      s"""WITH RECURSIVE $ShingleJaccardCte,
         |pairs AS (SELECT id_a, id_b FROM jacc WHERE jaccard >= 0.3),
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (SELECT s AS node, d AS r FROM edges
         |          UNION
         |          SELECT rc.node, e.d AS r FROM reach rc JOIN edges e ON rc.r = e.s),
         |labels AS (SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node)
         |SELECT (SELECT count(*) FROM documents) AS n_docs,
         |       (SELECT count(*) FROM documents)
         |         - (SELECT count(*) FROM labels WHERE node <> comp) AS n_kept,
         |       (SELECT count(DISTINCT comp) FROM labels) AS n_dup_classes""".stripMargin,
    "q54_knn_ivf" ->
      """SELECT e.vec_id,
        | round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |   CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings e,
        | (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin,
    "q144_unitok" -> unigramBudgetOracle,
    "q145_wds" -> wdsOracle,
    "q146_card" -> dataCardOracle,
    "q147_c4" -> c4LineOracle,
    "q148_imgdup" -> imgDupOracle,
    "q149_badwords" -> badwordOracle,
    "q150_audio" -> audioOracle,
    "q151_kll" -> kllOracle,
    "q152_mcard" -> mediaCardOracle,
    "q153_auddup" -> audioDupOracle,
    "q154_mpeg" -> mpegWalkOracle,
    "q155_texty" -> textinessOracle,
    "q156_imgcorp" -> imgCorpusOracle,
    "q157_mcorp" -> mediaCorpusOracle,
    "q158_cut" -> cutSpansOracle,
    "q159_acodec" -> audioCodecOracle,
    "q160_gifbmp" -> gifBmpOracle,
    "q161_gps" -> exifGpsOracle,
    "q162_webp" -> webpOracle,
    "q163_aac" -> aacOracle,
    "q164_vidcorp" -> videoCorpusOracle,
    "q165_audcorp" -> audioCorpusOracle,
    "q166_tiff" -> tiffOracle,
    "q167_vp8l" -> vp8lOracle,
    "q168_avif" -> avifOracle,
    "q169_mcard" -> mediaFormatsOracle,
    "q170_atags" -> audioTagsOracle,
    "q171_dreport" -> dedupReportOracle,
    "q172_sreport" -> spanSurgeryOracle,
    "q173_webm" -> webmOracle,
    "q174_anim" -> gifAnimOracle,
    "q175_gpscrub" -> scrubGpsOracle,
    "q176_vidgps" -> videoGpsOracle,
    "q177_jxl" -> jxlOracle,
    "q178_mixdedup" -> mediaDedupOracle,
    "q179_itext" -> imageTextOracle,
    "q180_art" -> embeddedArtOracle,
    "q181_subs" -> subtitleOracle,
    "q182_lyrics" -> lyricsOracle,
    "q183_subtrk" -> subtitleTracksOracle,
    "q184_mcard3" -> mediaTextCardOracle,
    "q185_mkvsubs" -> muxedSubsOracle,
    "q186_prov" -> provenanceOracle,
    "q187_pairs" -> captionMiningOracle,
    "q188_ico" -> icoOracle,
    "q189_apngsvg" -> apngSvgOracle,
    "q190_capcorp" -> captionCorpusOracle,
    "q191_lrc" -> lrcOracle,
    "q192_mp4text" -> mp4TimedTextOracle,
    "q193_sylt" -> syltOracle,
    "q194_artlink" -> coverArtCorpusOracle,
    "q195_cuelang" -> cueLangOracle,
    "q196_chapters" -> chaptersOracle,
    "q197_clippairs" -> clipPairCorpusOracle,
    "q198_thumblink" -> thumbLinkOracle,
    "q199_artincr" -> artLinkIncrOracle,
    "q200_multitrack" -> multiTrackOracle,
    "q201_transpairs" -> translationPairsOracle,
    "q202_chapalign" -> chapterAlignedOracle,
    "q203_dialogcov" -> dialogCoverageOracle,
    "q204_tpaircorp" -> transPairCorpusOracle,
    "q205_covtrk" -> covByTrackOracle,
    "q206_pgsbmp" -> pgsBitmapOracle,
    "q207_turns" -> dialogTurnsOracle,
    "q208_turncorp" -> turnsCorpusOracle,
    "q209_platelink" -> plateLinkOracle,
    "q210_ocrsubs" -> ocrSubsOracle,
    "q211_spkstats" -> speakerStatsOracle,
    "q55_sentiment_mix" ->
      """WITH s AS (
        |  SELECT source,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS toks
        |  FROM documents),
        |p AS (
        |  SELECT source,
        |    len(list_filter(toks, t -> t IN ('good','great','excellent','fast','happy','love','best','success','win','improve','easy','clean'))) AS pos,
        |    len(list_filter(toks, t -> t IN ('bad','slow','terrible','fail','error','hate','worst','broken','bug','crash','hard','dirty'))) AS neg
        |  FROM s)
        |SELECT source,
        | round(avg(round((pos - neg) * 1.0 / greatest(pos + neg, 1), 4)), 4) AS avg_sentiment,
        | count(*) AS n_docs
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    "q56_cdc_upsert" ->
      """WITH all_rows AS (
        |  SELECT user_id, event_id AS version, value,
        |    CASE WHEN event_id > 5000 AND event_type = 'error' THEN true ELSE false END AS deleted
        |  FROM events WHERE event_id <= 10000),
        |latest AS (
        |  SELECT user_id, version, value, deleted,
        |    row_number() OVER (PARTITION BY user_id ORDER BY version DESC) AS rn
        |  FROM all_rows)
        |SELECT user_id, version, round(value, 2) AS value FROM latest
        |WHERE rn = 1 AND NOT deleted ORDER BY user_id""".stripMargin,
    "q57_state_asof" ->
      """SELECT user_id, version, value FROM (
        |  SELECT user_id, event_id AS version, round(value, 2) AS value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id <= 3000)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q58_cross_linking" -> crossLinkingOracle,
    "q61_html" -> htmlExtractionOracle,
    "q86_md" -> markdownExtractionOracle,
    "q87_lines" -> lineDedupOracle,
    "q88_chunk" -> chunkDocsOracle,
    "q89_ndcg" -> retrievalMetricsOracle,
    "q90_phr" -> phraseSearchOracle,
    "q91_lex" -> lexicalStatsOracle,
    "q92_tfidf" -> tfidfOracle,
    "q93_pmi" -> pmiOracle,
    "q94_substr_spans" -> substrSpansOracle,
    "q95_substr_frac" -> substrStatsOracle,
    "q96_url_canon" -> urlCanonOracle,
    "q97_domain_block" -> domainBlockOracle,
    "q98_domain_qgate" -> domainQualityOracle,
    "q99_video_frames" -> videoFramesOracle,
    "q100_xspans" -> crossSpansOracle,
    "q101_tok_budget" -> tokenBudgetOracle,
    "q102_nbq" -> nbQualityOracle,
    "q103_zorder" -> zOrderOracle,
    "q104_heavy" -> heavyHittersOracle,
    "q105_pgrank" -> pageRankOracle,
    "q106_temp" -> temperatureOracle,
    "q107_contain" -> containmentOracle,
    "q108_shift" -> tokenShiftOracle,
    "q109_keepbest" -> keepBestOracle,
    "q110_funnel" -> funnelOracle,
    "q111_cohort" -> cohortOracle,
    "q112_zanom" -> anomalyOracle,
    "q113_kmv" -> kmvOracle,
    "q114_split" -> groupSplitOracle,
    "q115_gopher" -> gopherOracle,
    "q116_snapdiff" -> snapDiffOracle,
    "q117_pctrank" -> pctRankOracle,
    "q118_kmv_jacc" -> kmvOverlapOracle,
    "q119_markov" -> markovOracle,
    "q120_convlag" -> convLagOracle,
    "q121_winsor" -> winsorOracle,
    "q122_cms" -> cmsOracle,
    "q123_gapfill" -> gapFillOracle,
    "q124_skew" -> skewOracle,
    "q125_eqdepth" -> eqDepthOracle,
    "q126_lprop" -> labelPropOracle,
    "q127_hardneg" -> hardNegOracle,
    "q128_ccnet" -> ccnetOracle,
    "q129_dq" -> dataQualityOracle,
    "q130_joinest" -> joinEstOracle,
    "q131_psi" -> psiOracle,
    "q132_tis" -> timeInStateOracle,
    "q133_mad" -> madOracle,
    "q134_dsplit" -> dedupSplitOracle,
    "q135_novel" -> noveltyOracle,
    "q136_ilv" -> interleaveOracle,
    "q137_paths" -> pathsOracle,
    "q138_rfm" -> rfmOracle,
    "q139_auc" -> aucOracle,
    "q140_calib" -> calibOracle,
    "q141_vocab" -> vocabGrowthOracle,
    "q142_sqlfn" -> sqlFnOracle,
    // the q54 discipline: the two-stage IVF-PQ probe must RECOVER the
    // exact brute-force top-10 (DuckDB replays the exact side)
    "q143_pq" ->
      """SELECT e.vec_id,
        | round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |   CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings e,
        | (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin,
    "q62_asof_join" ->
      """SELECT l.user_id, l.event_id, round(l.value, 2) AS click_value,
        | r.event_id AS prior_error_id, round(r.value, 2) AS prior_error_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
        | ON l.user_id = r.user_id AND l.event_id >= r.event_id
        |ORDER BY l.user_id, l.event_id""".stripMargin,
    "q63_range_join" ->
      """SELECT c.user_id, c.event_id AS click_id, s.event_id AS signup_id,
        | round(c.value, 2) AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        | ON c.user_id = s.user_id
        | AND c.event_id >= s.event_id AND c.event_id <= s.event_id + 2000
        |ORDER BY c.user_id, click_id, signup_id""".stripMargin,
    "q64_decontam" ->
      s"""WITH ${CrossJaccardCte}
        |SELECT id_a, id_b, jaccard FROM jacc WHERE jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q65_packing" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
        |    AS BIGINT) AS bin
        |FROM tk ORDER BY doc_id""".stripMargin,
    "q66_strat" ->
      """WITH tgt AS (
        |  SELECT * FROM (VALUES ('de', 0.4), ('en', 0.5), ('es', 0.3),
        |    ('fr', 0.2), ('zh', 0.6)) v(lang, target)),
        |t AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang),
        |s AS (SELECT d.lang, count(*) AS n_sampled
        |      FROM documents d JOIN tgt ON d.lang = tgt.lang
        |      WHERE (hash(d.doc_id) % 10000) / 10000.0 < tgt.target
        |      GROUP BY d.lang)
        |SELECT t.lang, tgt.target,
        |  abs(coalesce(s.n_sampled, 0) * 1.0 / t.n_total - tgt.target) <= 0.15
        |    AS within_tol
        |FROM t JOIN tgt ON t.lang = tgt.lang LEFT JOIN s ON t.lang = s.lang
        |ORDER BY t.lang""".stripMargin,
    "q67_ngram_overlap" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |      generate_series(1, len(tk) - 4),
        |      i -> array_to_string(tk[i:i+4], ' ')))) AS gram
        |  FROM tk WHERE len(tk) >= 5)
        |SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
        |  count(*) AS n_shared
        |FROM ng a JOIN ng b ON a.gram = b.gram
        |WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |GROUP BY a.doc_id, b.doc_id
        |HAVING count(*) >= 3
        |ORDER BY train_id, eval_id""".stripMargin,
    "q68_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(tk) > 0
        |      THEN CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE)
        |           / CAST(len(tk) AS DOUBLE)
        |      ELSE 0.0 END AS dup_word_frac
        |  FROM tk),
        |ex AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(tk) - 1),
        |      i -> concat(tk[i], ' ', tk[i+1]))) AS g
        |  FROM tk WHERE len(tk) >= 2),
        |cnt AS (SELECT doc_id, g, count(*) AS c FROM ex GROUP BY doc_id, g),
        |mx AS (SELECT doc_id, max(c) AS mc, sum(c) AS tot FROM cnt GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens, b.dup_word_frac,
        |  CASE WHEN mx.doc_id IS NULL THEN 0.0
        |    ELSE CAST(mx.mc AS DOUBLE) / CAST(mx.tot AS DOUBLE) END
        |    AS top_bigram_frac
        |FROM base b LEFT JOIN mx ON b.doc_id = mx.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q69_pii" ->
      """WITH enr AS (
        |  SELECT doc_id,
        |    concat(substring(text, 1, 40), ' contact user', doc_id,
        |      '@mail.example.com or 10.0.', doc_id % 256,
        |      '.7 call +1-555-', doc_id % 9000 + 1000) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text,
        |    '\+\d{1,3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d{1,3}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
        |FROM enr ORDER BY doc_id""".stripMargin,
    "q70_shuffle_order" ->
      """SELECT doc_id, md5(concat('seed42:', doc_id)) AS shuffle_key
        |FROM documents
        |ORDER BY shuffle_key
        |LIMIT 100""".stripMargin,
    "q77_export" ->
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 7 <> 3),
        |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 3),
        |keep AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (
        |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rk
        |    FROM train) WHERE rk = 1),
        |kept AS (SELECT t.* FROM train t JOIN keep USING (doc_id)),
        |ktk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |          t -> len(t) > 0) AS tk FROM kept),
        |etk AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |          t -> len(t) > 0) AS tk FROM ev),
        |kng AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |          generate_series(1, len(tk) - 4),
        |          i -> array_to_string(tk[i:i+4], ' ')))) AS gram
        |        FROM ktk WHERE len(tk) >= 5),
        |eng AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |          generate_series(1, len(tk) - 4),
        |          i -> array_to_string(tk[i:i+4], ' ')))) AS gram
        |        FROM etk WHERE len(tk) >= 5),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT a.doc_id FROM kng a JOIN eng b ON a.gram = b.gram
        |    GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3)),
        |clean AS (SELECT k.* FROM kept k
        |          WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = k.doc_id)),
        |red AS (SELECT doc_id, source,
        |          regexp_replace(regexp_replace(regexp_replace(text,
        |            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |            '\+\d{1,3}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
        |        FROM clean),
        |filt AS (SELECT * FROM (
        |    SELECT doc_id, source,
        |      CAST(len(list_filter(string_split_regex(lower(trim(redacted)), '\s+'),
        |        t -> len(t) > 0)) AS BIGINT) AS n_tok
        |    FROM red) WHERE n_tok BETWEEN 10 AND 5000),
        |tgt AS (SELECT * FROM (VALUES ('src0', 0.34), ('src1', 0.33), ('src2', 0.33))
        |          v(source, target)),
        |cnt AS (SELECT source, count(*) AS n FROM filt GROUP BY source),
        |j AS (SELECT c.source, c.n, t.target, CAST(c.n AS DOUBLE) / t.target AS cap
        |      FROM cnt c JOIN tgt t USING (source)),
        |m AS (SELECT min(cap) AS mincap FROM j),
        |r AS (SELECT j.source, m.mincap * j.target / CAST(j.n AS DOUBLE) AS rate
        |      FROM j, m),
        |sel AS (SELECT f.source, f.n_tok
        |        FROM filt f JOIN r USING (source)
        |        WHERE CAST(concat('0x',
        |            substring(md5(concat('mix77:', f.doc_id)), 1, 8)) AS BIGINT)
        |          < r.rate * 4294967296.0)
        |SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens
        |FROM sel GROUP BY source ORDER BY source""".stripMargin,
    "q75_topk" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST(concat('0x',
        |        substring(md5(concat('s75:', doc_id)), 1, 8)) AS BIGINT),
        |      doc_id) AS r
        |  FROM documents) t
        |WHERE r <= 7
        |ORDER BY lang, doc_id""".stripMargin,
    "q76_nfc" ->
      """WITH salted AS (
        |  SELECT doc_id,
        |    nfc_normalize(concat(substring(text, 1, 10),
        |      ' e', chr(769), ' stra', chr(223), 'e nai', chr(776), 've'))
        |      AS norm
        |  FROM documents)
        |SELECT doc_id, norm, CAST(length(norm) AS BIGINT) AS n_norm
        |FROM salted ORDER BY doc_id LIMIT 50""".stripMargin,
    "q74_mixture" ->
      """WITH tgt AS (
        |  SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2))
        |    v(source, target)),
        |cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |j AS (SELECT c.source, c.n, t.target,
        |        CAST(c.n AS DOUBLE) / t.target AS cap
        |      FROM cnt c JOIN tgt t USING (source)),
        |m AS (SELECT min(cap) AS mincap FROM j),
        |r AS (SELECT j.source, j.n,
        |        m.mincap * j.target / CAST(j.n AS DOUBLE) AS rate
        |      FROM j, m),
        |sel AS (
        |  SELECT d.source
        |  FROM documents d JOIN r USING (source)
        |  WHERE CAST(concat('0x',
        |      substring(md5(concat('mix:', d.doc_id)), 1, 8)) AS BIGINT)
        |    < r.rate * 4294967296.0),
        |sc AS (SELECT source, count(*) AS n_sampled FROM sel GROUP BY source)
        |SELECT r.source, r.n AS n_total,
        |  coalesce(sc.n_sampled, 0) AS n_sampled
        |FROM r LEFT JOIN sc USING (source)
        |ORDER BY r.source""".stripMargin,
    "q72_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q73_rerank" ->
      """WITH qq AS (
        |  SELECT qe, CASE WHEN mx IS NULL OR mx = 0
        |      THEN list_transform(qe, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(qe,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT))
        |    END AS qv
        |  FROM (SELECT embedding AS qe,
        |          list_max(list_transform(embedding,
        |            x -> abs(CAST(x AS DOUBLE)))) AS mx
        |        FROM embeddings WHERE vec_id = 0)),
        |c AS (
        |  SELECT vec_id, CASE WHEN mx IS NULL OR mx = 0
        |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT))
        |    END AS cv
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding,
        |            x -> abs(CAST(x AS DOUBLE)))) AS mx
        |        FROM embeddings WHERE vec_id <> 0)),
        |cand AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(cv)),
        |      i -> cv[i] * qv[i])) AS BIGINT) AS qdot
        |  FROM c, qq
        |  ORDER BY qdot DESC, vec_id
        |  LIMIT 40)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |    CAST(q.qe AS DOUBLE[])), 6) AS cosine
        |FROM embeddings e
        |JOIN cand ON e.vec_id = cand.vec_id,
        | (SELECT qe FROM qq) q
        |ORDER BY cosine DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    "q71_int8_knn" ->
      """WITH qq AS (
        |  SELECT CASE WHEN mx IS NULL OR mx = 0
        |      THEN list_transform(qe, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(qe,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT))
        |    END AS qv
        |  FROM (SELECT embedding AS qe,
        |          list_max(list_transform(embedding,
        |            x -> abs(CAST(x AS DOUBLE)))) AS mx
        |        FROM embeddings WHERE vec_id = 0)),
        |c AS (
        |  SELECT vec_id, CASE WHEN mx IS NULL OR mx = 0
        |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding,
        |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT))
        |    END AS cv
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding,
        |            x -> abs(CAST(x AS DOUBLE)))) AS mx
        |        FROM embeddings WHERE vec_id <> 0))
        |SELECT vec_id,
        |  CAST(list_sum(list_transform(generate_series(1, len(cv)),
        |    i -> cv[i] * qv[i])) AS BIGINT) AS qdot
        |FROM c, qq
        |ORDER BY qdot DESC, vec_id
        |LIMIT 10""".stripMargin,
    "q60_curate" ->
      s"""WITH RECURSIVE $ShingleJaccardCte,
         |pairs AS (SELECT id_a, id_b FROM jacc WHERE jaccard >= 0.3),
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (SELECT s AS node, d AS r FROM edges
         |          UNION
         |          SELECT rc.node, e.d AS r FROM reach rc JOIN edges e ON rc.r = e.s),
         |labels AS (SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node),
         |kept AS (
         |  SELECT d.text FROM documents d
         |  WHERE NOT EXISTS (SELECT 1 FROM labels l
         |                    WHERE l.node = d.doc_id AND l.node <> l.comp)),
         |feat AS (
         |  SELECT text,
         |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |      t -> len(t) > 0) AS tk
         |  FROM kept),
         |scored AS (
         |  SELECT len(tk) AS n_toks,
         |    CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
         |         WHEN de >= en AND de >= es AND de >= fr THEN 'de'
         |         WHEN en >= es AND en >= fr THEN 'en'
         |         WHEN es >= fr THEN 'es'
         |         ELSE 'fr' END AS lang_det,
         |    round(
         |      least(len(tk) / 50.0, 1.0) * 0.4
         |      + least((CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE en * 1.0 / len(tk) END) * 4.0, 1.0) * 0.3
         |      + greatest(0.0, 1.0 - (CASE WHEN len(text) = 0 THEN 0.0
         |          ELSE len(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / len(text) END) * 5.0) * 0.3,
         |      4) AS quality
         |  FROM (
         |    SELECT text, tk,
         |      len(list_filter(tk, t -> t IN ('der','die','das','und','ein','eine','ist','von','mit','für'))) AS de,
         |      len(list_filter(tk, t -> t IN ('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','that','this','be'))) AS en,
         |      len(list_filter(tk, t -> t IN ('el','la','de','que','y','en','un','una','por','con','para','es'))) AS es,
         |      len(list_filter(tk, t -> t IN ('le','la','de','et','un','une','pour','dans','est','que','au'))) AS fr
         |    FROM feat))
         |SELECT lang_det, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
         |  round(avg(quality), 4) AS avg_quality
         |FROM scored WHERE quality >= 0.5
         |GROUP BY lang_det ORDER BY lang_det""".stripMargin,
    "q59_approx_pctl" ->
      """SELECT
        | abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
        |   <= 0.02 * greatest(abs(quantile_cont(value, 0.5)), 1.0) AS p50_within_2pct,
        | abs(approx_quantile(value, 0.9) - quantile_cont(value, 0.9))
        |   <= 0.02 * greatest(abs(quantile_cont(value, 0.9)), 1.0) AS p90_within_2pct
        |FROM events""".stripMargin,
    // q78 probes only 5/8 partition directories but is graded against
    // the exact answer, like q54: a hash match proves the pruned
    // layout loses nothing at gate scale.
    "q78_ivf_part" ->
      """SELECT e.vec_id,
        | round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |   CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings e,
        | (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin,
    // q79's images are rendered in-engine (lossless PNG), so the mean
    // channel values are known in closed form: solid colors average to
    // component/255, the half-red-half-blue strip to (0.5, 0, 0.5).
    "q79_img_px" ->
      """SELECT * FROM (VALUES
        | (CAST(1 AS BIGINT), 16, 16, round(200/255.0, 4), round(50/255.0, 4), round(25/255.0, 4)),
        | (CAST(2 AS BIGINT), 8, 8, round(0/255.0, 4), round(128/255.0, 4), round(255/255.0, 4)),
        | (CAST(3 AS BIGINT), 4, 2, round(0.5, 4), round(0.0, 4), round(0.5, 4))
        |) AS t(img_id, width, height, avg_r, avg_g, avg_b)
        |ORDER BY img_id""".stripMargin,
    // q80/q81: the full Okapi BM25 formula restated in SQL with the
    // same one-pass stats CTE the operator broadcasts (N, avgdl,
    // per-term df). Arithmetic grouping mirrors the Column expression
    // exactly so the doubles agree bit-for-bit before round(6).
    "q80_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS dl
        |  FROM documents),
        |stats AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |    sum(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN list_contains(toks, 'table') THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN list_contains(toks, 'hash') THEN 1 ELSE 0 END) AS df2
        |  FROM toks),
        |tfs AS (
        |  SELECT doc_id, dl,
        |    CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tf0,
        |    CAST(len(list_filter(toks, x -> x = 'table')) AS DOUBLE) AS tf1,
        |    CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf2
        |  FROM toks)
        |SELECT doc_id, round(
        |    ln((n - df0 + 0.5)/(df0 + 0.5) + 1.0) * tf0 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n - df1 + 0.5)/(df1 + 0.5) + 1.0) * tf1 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln((n - df2 + 0.5)/(df2 + 0.5) + 1.0) * tf2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
        |FROM tfs, stats ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q81_hybrid" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS dl
        |  FROM documents WHERE doc_id <> 0),
        |stats AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |    sum(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN list_contains(toks, 'table') THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN list_contains(toks, 'hash') THEN 1 ELSE 0 END) AS df2
        |  FROM toks),
        |tfs AS (
        |  SELECT doc_id, dl,
        |    CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tf0,
        |    CAST(len(list_filter(toks, x -> x = 'table')) AS DOUBLE) AS tf1,
        |    CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf2
        |  FROM toks),
        |bm AS (
        |  SELECT doc_id, round(
        |      ln((n - df0 + 0.5)/(df0 + 0.5) + 1.0) * tf0 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df1 + 0.5)/(df1 + 0.5) + 1.0) * tf1 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df2 + 0.5)/(df2 + 0.5) + 1.0) * tf2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
        |  FROM tfs, stats ORDER BY score DESC, doc_id LIMIT 20),
        |bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bm),
        |vec AS (
        |  SELECT e.vec_id AS doc_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |  WHERE e.vec_id <> 0 ORDER BY cosine DESC, doc_id LIMIT 20),
        |vr AS (SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank FROM vec),
        |allr AS (SELECT * FROM bmr UNION ALL SELECT * FROM vr)
        |SELECT doc_id, round(sum(1.0/(60 + rank)), 6) AS rrf FROM allr
        |GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    // q82: the bigram LM refit from scratch in SQL — integer unigram/
    // bigram counts and V over the same reference slice, then the
    // identical add-one formula per adjacent pair with the log-prob
    // integer-scaled (round half away from zero, matching the
    // kernel's roundHalfAway) BEFORE summing, so the per-doc sum is
    // evaluation-order independent and matches Spark exactly.
    "q82_ppl" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0) AS tk
        |  FROM documents),
        |ref AS (SELECT tk FROM tk WHERE doc_id % 10 = 0),
        |uni AS (SELECT w, count(*) AS c
        |        FROM (SELECT unnest(tk) AS w FROM ref) GROUP BY w),
        |v AS (SELECT count(*) AS v FROM uni),
        |big AS (
        |  SELECT tk[i] AS w1, tk[i+1] AS w2, count(*) AS c
        |  FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i
        |        FROM ref WHERE len(tk) >= 2)
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
        |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-1)) AS i
        |        FROM tk WHERE len(tk) >= 2)),
        |scored AS (
        |  SELECT p.doc_id, count(*) AS n_bigrams,
        |    CAST(sum(CAST(round(ln((coalesce(b.c, 0) + 1.0) /
        |      (coalesce(u.c, 0) + v.v)) * 1000000) AS BIGINT)) AS BIGINT) AS lp_sum
        |  FROM pairs p
        |  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
        |  LEFT JOIN uni u ON u.w = p.w1
        |  CROSS JOIN v
        |  GROUP BY p.doc_id)
        |SELECT doc_id, n_bigrams,
        |  round(exp(-(CAST(lp_sum AS DOUBLE)/1000000.0)/n_bigrams), 4) AS ppl
        |FROM scored ORDER BY ppl DESC, doc_id LIMIT 20""".stripMargin,
    // q83: the DSIR fit refit from scratch in SQL — every unigram and
    // adjacent-pair bigram occurrence hashed via md5("dsir:" || f)
    // into 4096 buckets, target (source='src0') and raw (all docs)
    // bucket counts, per-bucket integer-scaled add-one log-ratios
    // (grouping of the ratio arithmetic mirrors Curation.fitDsir
    // exactly), then the per-doc sum over occurrences.
    "q83_dsir" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, source,
        |    unnest(tk || list_transform(generate_series(1, len(tk)-1),
        |                   i -> tk[i] || ' ' || tk[i+1])) AS f
        |  FROM tk WHERE len(tk) >= 1),
        |bf AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5('dsir:' || f), 1, 8)) AS BIGINT) % 4096 AS b
        |  FROM feats),
        |tc AS (SELECT b, count(*) AS c FROM bf WHERE source = 'src0' GROUP BY b),
        |rc AS (SELECT b, count(*) AS c FROM bf GROUP BY b),
        |tn AS (SELECT count(*) AS n FROM bf WHERE source = 'src0'),
        |rn AS (SELECT count(*) AS n FROM bf),
        |lr AS (
        |  SELECT rc.b, CAST(round(ln(
        |      ((coalesce(tc.c, 0) + 1.0) / (tn.n + 4096)) /
        |      ((rc.c + 1.0) / (rn.n + 4096))) * 1000000) AS BIGINT) AS lr
        |  FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tn CROSS JOIN rn),
        |scored AS (
        |  SELECT bf.doc_id, count(*) AS n_features,
        |    CAST(sum(lr.lr) AS BIGINT) AS s
        |  FROM bf JOIN lr ON lr.b = bf.b GROUP BY bf.doc_id)
        |SELECT doc_id, n_features,
        |  round(CAST(s AS DOUBLE)/1000000.0, 6) AS logw
        |FROM scored ORDER BY logw DESC, doc_id LIMIT 20""".stripMargin,
    // q84: q42's banded candidate CTE + q53's recursive connected
    // components, over embeddings — the semantic-dedup keep-list
    // summary.
    "q84_semdd" ->
      s"""WITH RECURSIVE $embeddingBandedScoredCte,
         |pairs AS (SELECT id_a, id_b FROM scored WHERE cosine >= 0.2),
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (SELECT s AS node, d AS r FROM edges
         |          UNION
         |          SELECT rc.node, e.d AS r FROM reach rc JOIN edges e ON rc.r = e.s),
         |labels AS (SELECT node, least(node, min(r)) AS comp FROM reach GROUP BY node)
         |SELECT (SELECT count(*) FROM embeddings) AS n_vecs,
         |       (SELECT count(*) FROM embeddings)
         |         - (SELECT count(*) FROM labels WHERE node <> comp) AS n_kept,
         |       (SELECT count(DISTINCT comp) FROM labels) AS n_dup_classes""".stripMargin,
    // q85: BOTH models refit in one SQL statement — q82's bigram LM
    // CTEs (unrounded ppl) and q83's DSIR CTEs (unrounded logw) — then
    // the same unrounded-threshold filter and per-source summary.
    "q85_qgate" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |ref AS (SELECT tk FROM tk WHERE doc_id % 10 = 0),
        |uni AS (SELECT w, count(*) AS c
        |        FROM (SELECT unnest(tk) AS w FROM ref) GROUP BY w),
        |v AS (SELECT count(*) AS v FROM uni),
        |big AS (
        |  SELECT tk[i] AS w1, tk[i+1] AS w2, count(*) AS c
        |  FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i
        |        FROM ref WHERE len(tk) >= 2)
        |  GROUP BY 1, 2),
        |bp AS (
        |  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
        |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-1)) AS i
        |        FROM tk WHERE len(tk) >= 2)),
        |pplx AS (
        |  SELECT p.doc_id,
        |    exp(-(CAST(CAST(sum(CAST(round(ln((coalesce(b.c, 0) + 1.0) /
        |      (coalesce(u.c, 0) + v.v)) * 1000000) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |      / 1000000.0) / count(*)) AS ppl
        |  FROM bp p
        |  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2
        |  LEFT JOIN uni u ON u.w = p.w1
        |  CROSS JOIN v
        |  GROUP BY p.doc_id),
        |feats AS (
        |  SELECT doc_id, source,
        |    unnest(tk || list_transform(generate_series(1, len(tk)-1),
        |                   i -> tk[i] || ' ' || tk[i+1])) AS f
        |  FROM tk WHERE len(tk) >= 1),
        |bf AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5('dsir:' || f), 1, 8)) AS BIGINT) % 4096 AS b
        |  FROM feats),
        |tc AS (SELECT b, count(*) AS c FROM bf WHERE source = 'src0' GROUP BY b),
        |rc AS (SELECT b, count(*) AS c FROM bf GROUP BY b),
        |tn AS (SELECT count(*) AS n FROM bf WHERE source = 'src0'),
        |rn AS (SELECT count(*) AS n FROM bf),
        |lr AS (
        |  SELECT rc.b, CAST(round(ln(
        |      ((coalesce(tc.c, 0) + 1.0) / (tn.n + 4096)) /
        |      ((rc.c + 1.0) / (rn.n + 4096))) * 1000000) AS BIGINT) AS lr
        |  FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tn CROSS JOIN rn),
        |dw AS (
        |  SELECT bf.doc_id,
        |    CAST(CAST(sum(lr.lr) AS BIGINT) AS DOUBLE) / 1000000.0 AS logw
        |  FROM bf JOIN lr ON lr.b = bf.b GROUP BY bf.doc_id)
        |SELECT d.source, count(*) AS n_docs,
        |  round(avg(p.ppl), 4) AS avg_ppl,
        |  round(avg(w.logw), 4) AS avg_logw
        |FROM documents d
        |JOIN pplx p ON p.doc_id = d.doc_id
        |JOIN dw w ON w.doc_id = d.doc_id
        |WHERE p.ppl <= 36.0 AND w.logw >= -70.0
        |GROUP BY d.source ORDER BY d.source""".stripMargin)

  /** q58's oracle, generated like [[embeddingNearDupOracle]]: both
    * corpora's per-band bucket bits from the seeded planes (seed
    * 42+band, inlined as literals), candidates = pairs colliding in
    * ANY band with BOTH sides' hot buckets dropped (the same cap the
    * Spark side applies), then the exact rounded-cosine gate.
    */
  private def crossLinkingOracle: String = {
    def bucketExpr(vec: String, bandSeed: Long): String =
      graft.functions.VectorFunctions.randomPlanes(nPlanes = 8, dim = 64, seed = bandSeed)
        .zipWithIndex.map { case (p, j) =>
          s"(CASE WHEN list_dot_product($vec, ${p.mkString("[", ", ", "]")}) >= 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString(" + ")
    val bucketCols = (0 until 2)
      .map(b => s"${bucketExpr("CAST(embedding AS DOUBLE[])", 42L + b)} AS b$b")
      .mkString(",\n    ")
    // mirror the per-side hot-bucket cap: a (band, bucket) hotter than
    // DefaultMaxBucketSize on either side is dropped from candidates
    val cap = graft.operators.Dedup.DefaultMaxBucketSize
    val bandJoins = (0 until 2)
      .map(b => s"  SELECT l.vec_id AS id_a, r.vec_id AS id_b FROM l JOIN r ON l.b$b = r.b$b\n" +
        s"  WHERE l.b$b NOT IN (SELECT b$b FROM l GROUP BY b$b HAVING count(*) > $cap)\n" +
        s"    AND r.b$b NOT IN (SELECT b$b FROM r GROUP BY b$b HAVING count(*) > $cap)")
      .mkString("\n  UNION\n")
    s"""WITH l AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    $bucketCols
       |  FROM embeddings WHERE vec_id % 2 = 0),
       |r AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    $bucketCols
       |  FROM embeddings WHERE vec_id % 2 = 1),
       |cand AS (
       |$bandJoins)
       |SELECT c.id_a, c.id_b,
       |  round(list_cosine_similarity(a.e, b.e), 6) AS cosine
       |FROM cand c JOIN l a ON c.id_a = a.vec_id JOIN r b ON c.id_b = b.vec_id
       |WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.2
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q41's oracle, generated with the same seeded hyperplanes the
    * Spark query uses, inlined as SQL literals: bucket = sign bits of
    * plane dot products, probe set = buckets within Hamming 2 of the
    * query's bucket, then cosine top-10 over the probed rows only.
    * DuckDB recomputes all of it independently — sign arithmetic in
    * the same double precision — so the gate checks the LSH machinery
    * end to end.
    */
  private def knnLshOracle: String = {
    val planes = graft.functions.VectorFunctions.randomPlanes(nPlanes = 6, dim = 64, seed = 42L)
    def planeLit(p: Array[Double]): String = p.mkString("[", ", ", "]")
    def bucketExpr(vec: String): String = planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product($vec, ${planeLit(p)}) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("\n      + ")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
       |b AS (
       |  SELECT e.vec_id,
       |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cosine,
       |    ${bucketExpr("CAST(e.embedding AS DOUBLE[])")} AS bucket,
       |    ${bucketExpr("q.qe")} AS qbucket
       |  FROM embeddings e, q WHERE e.vec_id <> 0)
       |SELECT vec_id, cosine FROM b
       |WHERE bit_count(xor(bucket, qbucket)) <= 2
       |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Shared oracle fragment for q42/q84: the AND-OR banded
    * construction restated in SQL. Per-band bucket bits are
    * precomputed per vector (the same seeded planes the Spark side
    * uses, seed 42+band, inlined as literals); candidates are pairs
    * colliding in ANY band (hot buckets over the cap dropped, like the
    * Spark side); `scored` carries the exact rounded cosine per
    * candidate pair.
    */
  private def embeddingBandedScoredCte: String = {
    def bucketExpr(vec: String, bandSeed: Long): String =
      graft.functions.VectorFunctions.randomPlanes(nPlanes = 8, dim = 64, seed = bandSeed)
        .zipWithIndex.map { case (p, j) =>
          s"(CASE WHEN list_dot_product($vec, ${p.mkString("[", ", ", "]")}) >= 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString(" + ")
    val bucketCols = (0 until 8)
      .map(b => s"${bucketExpr("CAST(embedding AS DOUBLE[])", 42L + b)} AS b$b")
      .mkString(",\n    ")
    // mirror the hot-bucket cap: buckets over DefaultMaxBucketSize are
    // dropped from candidate generation on the Spark side too
    val cap = graft.operators.Dedup.DefaultMaxBucketSize
    val bandJoins = (0 until 8)
      .map(b => s"  SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM emb a JOIN emb b\n" +
        s"    ON a.vec_id < b.vec_id AND a.b$b = b.b$b\n" +
        s"  WHERE a.b$b NOT IN (SELECT b$b FROM emb GROUP BY b$b HAVING count(*) > $cap)")
      .mkString("\n  UNION\n")
    s"""emb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    $bucketCols
       |  FROM embeddings),
       |cand AS (
       |$bandJoins),
       |scored AS (
       |  SELECT c.id_a, c.id_b,
       |    round(list_cosine_similarity(a.e, b.e), 6) AS cosine
       |  FROM cand c JOIN emb a ON c.id_a = a.vec_id JOIN emb b ON c.id_b = b.vec_id)""".stripMargin
  }

  /** q42's oracle: banded candidates, exact rounded-cosine gate, the
    * deterministic top-100 — mirrors the query.
    */
  private def embeddingNearDupOracle: String =
    s"""WITH $embeddingBandedScoredCte
       |SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.2
       |ORDER BY cosine DESC, id_a, id_b LIMIT 100""".stripMargin

  /** Shared oracle fragment: per-document distinct 3-token-shingle
    * sets and all-pairs exact Jaccard. Mirrors
    * [[graft.operators.Dedup.shingleHashSet]] — shingle identity is by
    * string here, by 64-bit shingle hash there; the Jaccards are equal
    * absent 64-bit collisions inside one pair's union (impossible in
    * practice at ~200 shingles/doc). Brute-force (all pairs) on
    * purpose: the oracle is the ground truth the LSH path must
    * reproduce.
    */
  /** [[ShingleJaccardCte]]'s cross-corpus twin: even doc_ids joined
    * against odd doc_ids (no a < b constraint — distinct universes).
    */
  private val CrossJaccardCte: String =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |    t -> len(t) > 0) AS tl FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tl) < 3 THEN [list_aggregate(tl, 'string_agg', ' ')]
      |         ELSE list_distinct([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
      |                             for i in range(1, len(tl) - 1)])
      |    END AS ss FROM toks),
      |jacc AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    round(CASE WHEN len(list_distinct(list_concat(a.ss, b.ss))) = 0 THEN 1.0
      |          ELSE len(list_intersect(a.ss, b.ss)) * 1.0
      |               / len(list_distinct(list_concat(a.ss, b.ss))) END, 4) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1)""".stripMargin

  private val ShingleJaccardCte: String =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |    t -> len(t) > 0) AS tl FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tl) < 3 THEN [list_aggregate(tl, 'string_agg', ' ')]
      |         ELSE list_distinct([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
      |                             for i in range(1, len(tl) - 1)])
      |    END AS ss FROM toks),
      |jacc AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    round(CASE WHEN len(list_distinct(list_concat(a.ss, b.ss))) = 0 THEN 1.0
      |          ELSE len(list_intersect(a.ss, b.ss)) * 1.0
      |               / len(list_distinct(list_concat(a.ss, b.ss))) END, 4) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)""".stripMargin
}
