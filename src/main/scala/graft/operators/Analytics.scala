package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Run/log analytics operators — the Spark-native restatement of the
  * reference's BuilderQuery / OutcomeAggregator / runtime-logs surface
  * (`core/framework/builder/query.py:222-282`,
  * `core/framework/runtime/outcome_aggregator.py:225-295`,
  * `tools/src/aden_tools/tools/runtime_logs_tool/runtime_logs_tool.py`).
  *
  * Every operator is a single declarative plan: partial (map-side)
  * aggregation, broadcast of small sides, and top-k as
  * TakeOrderedAndProject all come from Catalyst, so each one scales to
  * 100 TB without code changes.
  */
object Analytics {

  /** Success rate per group — `len(completed)/len(runs)`
    * (`query.py:241-243`), as one hash aggregate.
    */
  def successRate(df: DataFrame, isSuccess: Column, groupCols: Seq[String],
      scale: Int = 4): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_total"),
        round(avg(when(isSuccess, 1.0).otherwise(0.0)), scale).as("success_rate"))

  /** Top-k most common failures (`query.py:246-253`): count by error
    * key, sort desc, take k. Catalyst plans the limit as
    * TakeOrderedAndProject — only k rows per partition ever move.
    */
  def topFailures(df: DataFrame, isFailure: Column, errorKey: Column, k: Int = 5): DataFrame =
    df.filter(isFailure)
      .groupBy(errorKey.as("error_key"))
      .agg(count(lit(1)).as("n_failures"))
      .orderBy(desc("n_failures"), asc("error_key"))
      .limit(k)

  /** Problematic-node ranking (`query.py:256-270`): per-key totals and
    * failure counts → failure rate, threshold filter, rank desc.
    */
  def failureRanking(df: DataFrame, keyCol: String, isFailure: Column,
      threshold: Double = 0.1, scale: Int = 4): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(isFailure, 1L).otherwise(0L)).as("n_failed"))
      .withColumn("failure_rate",
        round(col("n_failed").cast("double") / col("n_total"), scale))
      .filter(col("failure_rate") > threshold)
      .orderBy(desc("failure_rate"), asc(keyCol))

  /** Weighted progress (`outcome_aggregator.py:246-270`):
    * Σ wᵢ·pᵢ / Σ wᵢ with the reference's `max(1, …)` zero-guard
    * (`outcome_aggregator.py:283-295`). Pure column math — no UDAF.
    */
  def weightedProgress(df: DataFrame, weight: Column, progress: Column,
      groupCols: Seq[String], scale: Int = 4): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(round(
        sum(weight * progress) / greatest(sum(weight), lit(1.0)), scale)
        .as("weighted_progress"))

  /** Outcome metrics with count-distinct (`outcome_aggregator.py:283-295`).
    * `exact = false` switches to HyperLogLog (`approx_count_distinct`) —
    * the only version that should run at 100 TB.
    */
  def distinctMetrics(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val aggs = cols.map { c =>
      (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
        .as(s"n_distinct_$c")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Weighted risk scoring + letter grade (`risk_scorer.py:25-120`):
    * per-check points via a `when` ladder, weighted category sum,
    * grade buckets A–F — all column arithmetic.
    */
  def gradeLadder(score: Column): Column =
    when(score >= 90, "A").when(score >= 80, "B").when(score >= 70, "C")
      .when(score >= 60, "D").otherwise("F")

  /** One scoring check: when `predicate` holds, `points` accrue to
    * `category` (`risk_scorer.py:25-120` — e.g. SSL checks worth
    * 25/30/10/20/15 points).
    */
  final case class RiskCheck(category: String, predicate: Column, points: Double)

  /** Full weighted risk score (`risk_scorer.py:25-120, 181-…`):
    * per-category points (capped at 100), weighted by the category
    * weight table, plus the A–F grade. Pure column arithmetic — one
    * projection, no UDF, no shuffle.
    */
  def riskScore(df: DataFrame, checks: Seq[RiskCheck],
      categoryWeights: Map[String, Double],
      scoreCol: String = "risk_score", gradeCol: String = "risk_grade"): DataFrame = {
    val byCategory = checks.groupBy(_.category)
    val overall = categoryWeights.toSeq.sortBy(_._1).map { case (cat, w) =>
      val pts = byCategory.getOrElse(cat, Nil)
        .map(c => when(c.predicate, c.points).otherwise(0.0))
        .reduceOption(_ + _).getOrElse(lit(0.0))
      least(pts, lit(100.0)) * w
    }.reduce(_ + _)
    df.withColumn(scoreCol, round(overall, 2))
      .withColumn(gradeCol, gradeLadder(col(scoreCol)))
  }

  /** Histogram (`query.py:439-468`): counts by key. */
  def histogram(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(keyCols.map(col): _*)

  /** Top-n rows per group via `row_number` — the reference's
    * recent-history tails (`runtime_logs_tool.py:135-138`,
    * `shared_state.py:341-343`) generalized. Shuffles once on the
    * partition keys; no global sort.
    */
  def topNPerGroup(df: DataFrame, partitionCols: Seq[String],
      orderBy: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n).drop("rn")
  }

  /** Trailing-window stall detector (`event_loop_node.py:1823-1829`):
    * true when the last `threshold` consecutive values in arrival order
    * are identical and non-empty. Lag-based, one shuffle on the key.
    */
  def stallFlag(valueCol: Column, orderCols: Seq[Column], partitionCols: Seq[Column],
      threshold: Int = 3): Column = {
    require(threshold >= 2, s"stall threshold must be >= 2, got $threshold")
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val allSame = (1 until threshold)
      .map(i => lag(valueCol, i).over(w) === valueCol)
      .reduce(_ && _)
    coalesce(allSame && length(valueCol) > 0, lit(false))
  }

  /** Tool doom-loop detector (W2, `event_loop_node.py:1884-1928`):
    * flags a turn when the last `threshold` consecutive turn
    * fingerprints are identical. A turn fingerprint is the
    * order-sensitive hash of its (tool, canonical-json-args) call
    * sequence (`:1895-1899`) — canonical JSON via the custom
    * expression so key order never breaks equality.
    *
    * Input: one row per tool call with (session, turn, callIdx, tool,
    * argsJson). Output: per (session, turn) with `doom_loop` flag.
    */
  def doomLoopFlags(calls: DataFrame, sessionCol: String, turnCol: String,
      callIdxCol: String, toolCol: String, argsJsonCol: String,
      threshold: Int = 3): DataFrame = {
    require(threshold >= 2, s"doom-loop threshold must be >= 2, got $threshold")
    val fp = calls
      .withColumn("__canon",
        concat_ws("|", col(toolCol),
          coalesce(graft.functions.CatalystExpressions.canonicalJson(col(argsJsonCol)),
            col(argsJsonCol))))
      .groupBy(col(sessionCol), col(turnCol))
      .agg(xxhash64(concat_ws(";",
        array_sort(collect_list(struct(col(callIdxCol), col("__canon"))))
          .getField("__canon"))).as("turn_fp"))
    val w = Window.partitionBy(col(sessionCol)).orderBy(col(turnCol))
    val same = (1 until threshold)
      .map(i => lag(col("turn_fp"), i).over(w) === col("turn_fp"))
      .reduce(_ && _)
    fp.withColumn("doom_loop", coalesce(same, lit(false)))
  }

  /** Top-k frequent items via the Misra–Gries sketch
    * ([[Aggregators.misraGries]]): ONE fixed-memory aggregate instead
    * of a full `groupBy(item).count()` shuffle — at 100 TB a frequent-
    * domains / frequent-tokens question over billions of distinct
    * items becomes a single `capacity`-counter summary per partition
    * merged once. Counts are lower bounds within `N/(capacity+1)` of
    * truth (exact whenever distinct ≤ capacity throughout — see the
    * aggregator's contract); the head of the distribution, which is
    * what "frequent" asks for, is where the bound is tightest
    * relative to the count. Output: (item, freq), count-desc then
    * item-asc, limited to `k` — the summary explode is a ≤ capacity
    * row frame, so the tail sort is trivial.
    */
  def frequentItems(df: DataFrame, itemCol: String, capacity: Int,
      k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val summary = df.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull).as[String]
      .select(Aggregators.misraGries(capacity).toColumn) // typed select: one summary row
    summary.toDF("mg").select(explode(col("mg")).as(Seq("item", "freq")))
      .orderBy(col("freq").desc, col("item"))
      .limit(k)
  }

  /** Weighted PageRank by iterated joins — domain-authority ranking
    * for crawl curation (the quality prior CommonCrawl-scale pipelines
    * attach to each registrable domain before content filters run).
    * Power iteration with damping `alpha`:
    *
    *   rank₀ = 1/N;  rankₜ₊₁(d) = (1-α)/N + α·(Σ_{s→d} rankₜ(s)·w/outₜ(s)
    *                                          + dangling/N)
    *
    * where `out(s)` is s's total out-weight and `dangling` is the rank
    * mass parked on nodes with no out-edges (redistributed uniformly —
    * the standard stochastic-matrix completion, so Σrank stays 1 every
    * iteration).
    *
    * Scale shape (guide §2.4 — keep one partitioning across rounds):
    * the edge list, out-weight totals, node set and rank are RDDs
    * sharing ONE HashPartitioner. The adjacency is RAW edge records
    * partitioned by src — never grouped per key, so a supernode's
    * out-edge list streams through its task instead of materializing
    * as one in-memory array (the §2.5 skew trap a
    * groupByKey-adjacency carries: groupByKey spills BETWEEN records,
    * not within one, so a web-scale hub OOMs its task). Each round is
    * one narrow zip over the shared partitioner — per partition an
    * O(nodes-in-partition) rank/out-total map, edges streaming — and
    * the only shuffle per round is the contribution reduceByKey on
    * the SAME partitioner. The Catalyst form of this loop cannot do
    * that — a localCheckpoint'ed graph scans as an RDD with
    * partitioning Catalyst has forgotten, so every iteration
    * re-exchanged BOTH join sides plus the aggregate
    * (~3 exchanges/round, and under AQE ~3 scheduled jobs each of
    * pure overhead at toy scale, real re-shuffles of the full graph
    * at 100 TB). Shuffle outputs are reused across actions (skipped
    * stages). The expensive edge derivation itself (possibly a
    * many-table join) is still materialized exactly once, as a
    * DataFrame checkpoint. Residual skew note: one hub's edges still
    * live in one task (time, not memory — contributions stream);
    * rank lookups stay partition-local by construction.
    *
    * Determinism: per-(node) sums accumulate in doubles whose
    * combine order follows shuffle arrival, exactly like the hash
    * aggregate it replaces — both forms are order-nondeterministic at
    * the last ulp and both are consumed through `round(rank, 6)`
    * oracles with 10 orders of magnitude of headroom.
    *
    * Edges with a null endpoint or null/≤0 weight are dropped (the
    * pre-RDD Catalyst equi-joins never matched null keys; keeping
    * them would silently re-route rank mass). Node keys are
    * re-encoded to value-equality forms where the JVM object would
    * not group correctly as an RDD key (BinaryType → byte Seq —
    * Array[Byte] hashes by identity; float/double −0.0 → 0.0, the
    * SQL normalization). Output: (node, rank) with `node` in the
    * union-coerced type of the two endpoint columns (the previous
    * form's union semantics).
    *
    * Dangling graphs fold the leaked-mass term into the SAME
    * per-round shuffle (a sentinel key in the contribution
    * reduceByKey, summed from each partition's dangling rank
    * entries); the driver reads it back with a single-partition
    * `lookup` on the already-shuffled round — one action per round,
    * not a separate rank⋈dangling join + sum job. Graphs without
    * dangling nodes run all rounds in ONE lineage with no per-round
    * action at all.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int, alpha: Double = 0.85,
      checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val spark = edges.sparkSession
    // endpoint type = what the nodes union would coerce to, applied to
    // BOTH columns up front so RDD keys from either side hash/compare
    // consistently (Catalyst did this coercion at the union/join)
    val nodeType = edges.select(col(srcCol)).limit(0)
      .union(edges.select(col(dstCol)).limit(0)).schema.head.dataType
    // Materialize the EDGE FRAME once: everything below derives from
    // it, and the edge build is possibly a many-table join (q105's
    // 5-table build ran twice before this checkpoint existed).
    val e = edges
      .filter(col(weightCol).isNotNull && col(weightCol) > 0 &&
        col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).cast(nodeType).as("__src"),
        col(dstCol).cast(nodeType).as("__dst"),
        col(weightCol).cast("double").as("__w"))
      .localCheckpoint(true)
    if (e.isEmpty) {
      // schema-stable empty result (node in the coerced type)
      return e.select(col("__src").as("node"))
        .withColumn("rank", lit(0.0))
    }
    val enc = rddKeyEncoder(nodeType)
    val dec = rddKeyDecoder(nodeType)
    val part = new org.apache.spark.HashPartitioner(
      spark.sessionState.conf.numShufflePartitions)
    // adjacency: RAW (src, (dst, w)) edge records partitioned ONCE by
    // src — no per-key grouping anywhere (see scaladoc)
    val adjE = e.rdd
      .map(r => (enc(r.get(0)), (enc(r.get(1)), r.getDouble(2))))
      .partitionBy(part)
    // out-weight totals per src: O(1) state per key, map-side combined
    val outTot = e.rdd
      .map(r => (enc(r.get(0)), r.getDouble(2)))
      .reduceByKey(part, _ + _)
    // node set on the SAME partitioner (distinct via reduceByKey)
    val nodesR = e.rdd
      .flatMap(r => Iterator(r.get(0), r.get(1)))
      .map(v => (enc(v), ()))
      .reduceByKey(part, (a, _) => a)
    val n = nodesR.count().toDouble
    // dangling = nodes with no out-edges, a property of the GRAPH:
    // found once; a graph without them (most link graphs after
    // self-loop cleanup) pays nothing per iteration for the term
    val dangR = nodesR.subtractByKey(outTot)
    val hasDangling = !dangR.isEmpty()
    var rank = nodesR.mapValues(_ => 1.0 / n) // partitioner preserved
    var lastCheckpointed: org.apache.spark.rdd.RDD[_] = null
    var i = 0
    while (i < iterations) {
      // ONE narrow 4-way zip (all sides on `part`): stream the edges
      // against per-partition rank/out-total maps, emit per-dst
      // partial contributions plus the partition's dangling rank mass
      // under a sentinel key → ONE shuffle on the same partitioner
      val rankNow = rank
      val contrib = adjE.zipPartitions(outTot, rankNow, dangR) {
        (eit, tit, rit, dit) =>
          val tot = new java.util.HashMap[Any, java.lang.Double]()
          tit.foreach { case (s, t) => tot.put(s, Double.box(t)); () }
          val rnk = new java.util.HashMap[Any, java.lang.Double]()
          rit.foreach { case (node, r) => rnk.put(node, Double.box(r)); () }
          var dangMass = 0.0
          var sawDangling = false
          dit.foreach { case (node, _) =>
            sawDangling = true
            dangMass += rnk.get(node).doubleValue()
          }
          val contribs = eit.map { case (s, (d, w)) =>
            (d, rnk.get(s).doubleValue() * w / tot.get(s).doubleValue())
          }
          if (sawDangling) contribs ++ Iterator((DanglingMassKey: Any, dangMass))
          else contribs
      }.reduceByKey(part, _ + _)
      val base =
        if (!hasDangling) (1.0 - alpha) / n
        else {
          // the sentinel rides the round's own shuffle: `lookup` runs
          // the map side once and reads ONE reduce partition; the full
          // contribution pass below reuses those shuffle files
          val dang = contrib.lookup(DanglingMassKey).headOption.getOrElse(0.0)
          (1.0 - alpha) / n + alpha * dang / n
        }
      val contribNodes =
        if (hasDangling) contrib.filter(_._1 != DanglingMassKey) else contrib
      rank = nodesR.leftOuterJoin(contribNodes) // narrow: both on `part`
        .mapValues { case (_, c) => base + alpha * c.getOrElse(0.0) }
      i += 1
      if (i % checkpointEvery == 0 && i < iterations) {
        rank.localCheckpoint()
        rank.count() // force: a lazy checkpoint never truncates
        if (lastCheckpointed != null) { lastCheckpointed.unpersist(); () }
        lastCheckpointed = rank
      }
    }
    spark.createDataFrame(
      rank.map { case (node, r) => org.apache.spark.sql.Row(dec(node), r) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", nodeType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** Sentinel RDD key for the folded dangling-mass term of
    * [[pageRank]] — equal only to itself, so it can never collide
    * with a graph node of any type.
    */
  private case object DanglingMassKey extends Serializable

  /** Partitioner over composite (node, …) keys that delegates to the
    * shared node partitioner on the FIRST component only: a keyed
    * aggregate on (node, label) then leaves every one of a node's
    * rows in the node's home partition, so the per-node argmax that
    * follows is partition-local — no second shuffle — and the result
    * layout still zips narrowly against anything partitioned by the
    * base partitioner.
    */
  private final class NodeKeyPartitioner(
      base: org.apache.spark.HashPartitioner)
      extends org.apache.spark.Partitioner {
    override def numPartitions: Int = base.numPartitions
    override def getPartition(key: Any): Int =
      base.getPartition(key.asInstanceOf[(Any, Any)]._1)
    override def equals(other: Any): Boolean = other match {
      case p: NodeKeyPartitioner => p.numPartitions == numPartitions
      case _ => false
    }
    override def hashCode: Int = 31 * numPartitions + 7
  }

  /** Re-encode a column value so it is usable as an RDD key: RDD
    * groupBy/reduce/join key on JVM `hashCode`/`equals`, which for
    * `Array[Byte]` (BinaryType) is IDENTITY-based — identical byte
    * arrays from different rows would never group — and for boxed
    * floating zeros distinguishes −0.0 from 0.0 where SQL equality
    * does not. (All NaN bit patterns already collapse:
    * `java.lang.Double.equals`/`hashCode` go through
    * `doubleToLongBits`, which canonicalizes NaN.) Everything else
    * (strings, integral types, decimals, dates) has value equality
    * already and passes through unchanged.
    */
  private def rddKeyEncoder(
      dt: org.apache.spark.sql.types.DataType): Any => Any = dt match {
    case org.apache.spark.sql.types.BinaryType =>
      v => v.asInstanceOf[Array[Byte]].toSeq // immutable ArraySeq: value equality
    case org.apache.spark.sql.types.DoubleType =>
      v => { val d = v.asInstanceOf[java.lang.Double].doubleValue()
        if (d == 0.0) java.lang.Double.valueOf(0.0) else v }
    case org.apache.spark.sql.types.FloatType =>
      v => { val f = v.asInstanceOf[java.lang.Float].floatValue()
        if (f == 0.0f) java.lang.Float.valueOf(0.0f) else v }
    case _ => identity
  }

  /** Inverse of [[rddKeyEncoder]] for the output rows. */
  private def rddKeyDecoder(
      dt: org.apache.spark.sql.types.DataType): Any => Any = dt match {
    case org.apache.spark.sql.types.BinaryType =>
      v => v.asInstanceOf[Seq[Byte]].toArray
    case _ => identity
  }

  /** KMV bottom-k distinct estimate per group
    * (see [[Aggregators.kmv]]): hash each item with the portable
    * md5-prefix hash ([[TextOps.portableHash]], uint32 space), keep the
    * k smallest distinct hashes per group, and estimate
    * |D| = (k−1)·2³²/h₍k₎ (exact count when fewer than k distinct
    * hashes exist — the sketch IS the distinct set there).
    *
    * vs `approx_count_distinct` (HLL): same one-exchange plan and O(k)
    * state, but the KMV summary additionally supports exact-merge
    * set-union composition across corpora/partitions and an
    * intersection estimator, and — because the hash is engine-portable
    * md5, not Spark-internal xxhash — the whole sketch is reproducible
    * bit-for-bit in ANY engine (the q113 oracle replays it in DuckDB).
    *
    * Scale shape: one hash aggregate with map-side partial combine;
    * the buffer never exceeds k longs, so 1000 executors × any number
    * of groups stream through without spill pressure.
    *
    * Output: group cols + `n_tracked` (sketch fill), `kth_hash`
    * (null until the sketch is full), `distinct_est` (rounded to 3).
    */
  def kmvDistinct(df: DataFrame, itemCol: String, groupCols: Seq[String],
      k: Int = 256, seed: String = "kmv"): DataFrame = {
    val sketch = udaf(Aggregators.kmv(k))
    val hashSpace = 4294967296.0 // 2^32: portableHash's range
    df.filter(col(itemCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(sketch(TextOps.portableHash(col(itemCol), seed)).as("__kmv"))
      .withColumn("n_tracked", size(col("__kmv")).cast("long"))
      .withColumn("kth_hash",
        when(col("n_tracked") === k, element_at(col("__kmv"), k)))
      .withColumn("distinct_est",
        when(col("n_tracked") < k, col("n_tracked").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * hashSpace /
            col("kth_hash").cast("double"), 3)))
      .drop("__kmv")
  }

  /** Time-in-state accounting: each event opens a state (`typeCol`)
    * that lasts until the entity's NEXT event; report per-state total
    * dwell seconds, spell counts and the max spell. The "where does
    * the time go" ledger for session/agent streams (each entity's
    * last event closes nothing and is excluded, as in any
    * open-interval ledger).
    *
    * Whole-second integer arithmetic (epoch floors) end to end. One
    * user-keyed window for `lead` + one tiny per-state aggregate.
    */
  def timeInState(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol))
    events
      .withColumn("__next_ts", lead(col(tsCol), 1).over(w))
      .filter(col("__next_ts").isNotNull)
      .withColumn("__dwell_s",
        col("__next_ts").cast("long") - col(tsCol).cast("long"))
      .groupBy(col(typeCol).as("state"))
      .agg(count(lit(1)).as("n_spells"),
        sum(col("__dwell_s")).as("total_s"),
        max(col("__dwell_s")).as("max_spell_s"))
  }

  /** Hourly time-grid gap fill with forward fill (last observation
    * carried forward): regularize an irregular per-entity event stream
    * onto each entity's [first, last] hourly grid, marking which cells
    * were observed and carrying the last observed value across gaps —
    * the resampling step every downstream window/forecast operator
    * assumes has already happened.
    *
    * Values aggregate per hour as integer cents (exact), so fills and
    * sums are bit-stable. Scale shape: one (entity, hour) aggregate,
    * one per-entity span aggregate whose `sequence()` explode
    * generates the grid (O(span-hours) rows per entity — bound it
    * upstream for entities with years of history), one co-partitioned
    * left join back, one forward-fill window on the same entity key.
    *
    * Output: (entity, hour, observed, cents, filled_cents).
    */
  def gapFillHourly(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val hours = events
      .groupBy(col(entityCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("cents"))
    val grid = hours.groupBy(col(entityCol))
      .agg(min(col("hour")).as("__h0"), max(col("hour")).as("__h1"))
      .select(col(entityCol),
        explode(sequence(col("__h0"), col("__h1"),
          expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hours, Seq(entityCol, "hour"), "left")
      .withColumn("observed", col("cents").isNotNull)
      .withColumn("filled_cents", last(col("cents"), ignoreNulls = true).over(w))
  }

  /** KMV set-overlap estimate between two item streams — the sketch
    * composition HLL cannot do: from each side's bottom-k sketch
    * ([[Aggregators.kmv]]) alone, estimate |A|, |B|, |A∪B| (the k
    * smallest of the merged sketch IS the union's KMV sketch — Beyer
    * et al. SIGMOD'07), then |A∩B| by inclusion–exclusion and the
    * Jaccard. The corpus-overlap monitor ("how much does this crawl
    * share with that one") at O(k) state per side, no re-scan of
    * either corpus needed once the sketches exist.
    *
    * All estimator arithmetic is column math over the two 1-row
    * sketches (estimates rounded to 3 BEFORE composition, Jaccard to
    * 6 — the fixed rounding order an external oracle replays exactly).
    *
    * Scale shape: one global aggregate per side (map-side combine,
    * O(k) buffers) + a 1×1 cross join.
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, itemCol: String,
      k: Int = 256, seed: String = "kmv"): DataFrame = {
    val sk = udaf(Aggregators.kmv(k))
    def sketch(df: DataFrame, out: String): DataFrame =
      df.filter(col(itemCol).isNotNull)
        .agg(sk(TextOps.portableHash(col(itemCol), seed)).as(out))
    val hashSpace = 4294967296.0
    def est(c: Column): Column =
      when(size(c) < k, size(c).cast("double"))
        .otherwise(round(lit((k - 1).toDouble) * hashSpace /
          element_at(c, k).cast("double"), 3))
    sketch(a, "__a").crossJoin(broadcast(sketch(b, "__b")))
      .withColumn("__u", slice(array_sort(array_union(col("__a"), col("__b"))), 1, k))
      .withColumn("est_a", est(col("__a")))
      .withColumn("est_b", est(col("__b")))
      .withColumn("est_union", est(col("__u")))
      .withColumn("est_inter",
        round(greatest(col("est_a") + col("est_b") - col("est_union"),
          lit(0.0)), 3))
      .withColumn("jaccard_est",
        when(col("est_union") > 0,
          round(col("est_inter") / col("est_union"), 6)).otherwise(0.0))
      .select(col("est_a"), col("est_b"), col("est_union"),
        col("est_inter"), col("jaccard_est"))
  }

  /** Event-type transition matrix (first-order Markov view of the
    * event stream): for each (from_type, to_type) pair of CONSECUTIVE
    * events of the same user, the count and row-normalized transition
    * probability. The "what do users do next" journey summary.
    *
    * Scale shape: one user-keyed window for `lead` (the per-entity
    * sessionization shuffle), one hash aggregate on the type pair, and
    * a window over the ≤|types|² matrix for row totals — the matrix is
    * tiny no matter how big the stream. Probabilities are exact
    * integer ratios rounded to 6.
    */
  def transitionMatrix(events: DataFrame, userCol: String,
      orderCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(orderCol))
    events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("prob",
        round(col("n").cast("double") / col("row_total"), 6))
  }

  /** Conversion-lag summary: per user, the whole seconds from their
    * FIRST `fromType` event to the first `toType` event strictly
    * after it; aggregated to one row (n_converted / avg / min / max
    * seconds). Companion to [[funnel]] — the "how fast" to funnel's
    * "how many".
    *
    * All lag arithmetic is whole-second integers (epoch floor on both
    * ends), so the averages are exact-integer-sum ratios — no
    * float-order risk. Scale shape: two user-keyed aggregates joined
    * on the same key.
    */
  def conversionLag(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, fromType: String, toType: String): DataFrame = {
    val firsts = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__t_from"))
    val converts = events.filter(col(typeCol) === toType)
      .join(firsts, Seq(userCol))
      .filter(col(tsCol) > col("__t_from"))
      .groupBy(col(userCol))
      .agg((min(col(tsCol)).cast("long") -
        first(col("__t_from")).cast("long")).as("__lag_s"))
    converts.agg(
      count(lit(1)).as("n_converted"),
      round(avg(col("__lag_s")), 2).as("avg_s"),
      min(col("__lag_s")).as("min_s"),
      max(col("__lag_s")).as("max_s"))
  }

  /** ROC AUC via the Mann–Whitney rank-sum identity:
    * AUC = (Σ_{positives} r̄ − P(P+1)/2) / (P·N) with tie-groups
    * taking their AVERAGE rank (r̄ = rank() + (|tie group|−1)/2) — the
    * exact probability a random positive outscores a random negative,
    * counting ties as ½. The classifier-eval gate every quality-model
    * fit (NB, DSIR, perplexity) needs before its scores gate a corpus.
    *
    * All rank arithmetic is exact integers until the single final
    * division (rounded to `scale`), so the statistic is bit-stable
    * across engines and partitionings. Scale shape: NO global sort —
    * ranks come from the distinct-score count table (group by score →
    * per-score positive/total counts → [[Scale.globalPrefixSums]]
    * bucketed running totals): a row's doubled average rank is
    * 2·(rows strictly below) + (its tie-group size) + 1, all derivable
    * per DISTINCT score, so the window runs over |distinct scores| ≪
    * |rows| and is partitioned by range bucket — a scored corpus of
    * any size never funnels through one task.
    */
  def aucScore(df: DataFrame, scoreCol: String, labelCol: String,
      scale: Int = 6): DataFrame = {
    val counts = df
      // NaN scores are excluded EXPLICITLY (a NaN has no rank; left
      // in, it would silently drop at the rank-table join and skew
      // n_pos/n_neg); null labels/scores are out as before
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
        !isnan(col(scoreCol).cast("double")))
      .groupBy(col(scoreCol))
      .agg(sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("__pos"),
        count(lit(1)).as("__c"))
    val cum = Scale.globalPrefixSums(counts, scoreCol, Seq("__c"))
    // doubled average rank of every row tied at this score stays
    // integral: 2r̄ = 2·below + tie + 1 (below = cum − tie)
    cum.agg(
      sum(col("__pos") *
        (lit(2L) * (col("cum___c") - col("__c")) + col("__c") + 1L)).as("__sum2"),
      sum(col("__pos")).as("n_pos"),
      sum(col("__c") - col("__pos")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        round((col("__sum2").cast("double") / 2.0 -
          col("n_pos").cast("double") * (col("n_pos") + 1L) / 2.0) /
          (col("n_pos").cast("double") * col("n_neg")), scale).as("auc"))
  }

  /** Join-size estimation from two count–min sketches
    * ([[Aggregators.countMinInnerProduct]]): the CM inner product
    * min_d Σ_w a[d][w]·b[d][w] estimates Σ_k f_A(k)·f_B(k) = |A ⋈ B|
    * on the key — never under, the join planner's "should I broadcast
    * / salt / pre-filter" signal from two O(depth·width) summaries,
    * no join executed. The report runs the ACTUAL join too (the gate
    * quantifies the overestimate); production callers skip it.
    *
    * Scale shape: BOTH sketches fit in ONE action — the sides union
    * with a side tag and a single grouped aggregate (map-side
    * cell-wise combine) produces the two summaries together (the
    * `fitNbQuality` side-tag discipline: two serialized driver
    * `.head()` fits were two whole scheduler round-trips for work one
    * job expresses); the estimate is then computed driver-side from
    * the collected 2-row result.
    */
  def cmsJoinSizeEstimate(a: DataFrame, keyA: String, b: DataFrame,
      keyB: String, depth: Int = 3, width: Int = 1024): DataFrame = {
    val spark = a.sparkSession
    val cmAgg = org.apache.spark.sql.functions.udaf(
      Aggregators.countMin(depth, width))
    def side(df: DataFrame, key: String, tag: Int): DataFrame =
      df.filter(col(key).isNotNull)
        .select(lit(tag).as("__side"), col(key).cast("string").as("__k"))
    val zero = new Array[Long](depth * width) // empty side = empty sketch
    val tagged = side(a, keyA, 0).unionAll(side(b, keyB, 1))
    val fitted = tagged
      .groupBy(col("__side")).agg(cmAgg(col("__k")).as("__sk"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    val est = Aggregators.countMinInnerProduct(
      fitted.getOrElse(0, zero), fitted.getOrElse(1, zero), depth, width)
    // exact Σ_k f_A(k)·f_B(k) without materializing the join OR a
    // count-table join: one keyed aggregate over the same tagged union
    // yields both sides' per-key counts as conditional sums (a key
    // missing from a side multiplies by 0, exactly the inner join's
    // contribution), then one global sum — a single exchange where the
    // join form paid two scans, two aggregates and a join
    val exact = tagged
      .groupBy(col("__k"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__na"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__nb"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("exact_n"))
    exact.select(lit(est).as("est"), col("exact_n"),
      (lit(est) - col("exact_n")).as("overcount"))
  }

  /** Unicode code-point (= binary UTF-8) string comparison — the
    * ordering Catalyst and DuckDB use for string min/ORDER BY.
    * `String.compareTo` is UTF-16 code-unit order, which disagrees
    * whenever one side has a supplementary character (its surrogate
    * units 0xD800–0xDFFF compare BELOW chars in 0xE000–0xFFFF, but
    * the code point is above all of them). Standard fixup: remap the
    * disputed ranges so surrogates sort above the rest of the BMP.
    */
  private[operators] def codePointCompare(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i); val cb = b.charAt(i)
      if (ca != cb) {
        def fix(c: Char): Int =
          if (c >= 0xE000) c - 0x800 else if (c >= 0xD800) c + 0x2000 else c.toInt
        return fix(ca) - fix(cb)
      }
      i += 1
    }
    a.length - b.length
  }

  /** Synchronous weighted label propagation (Raghavan et al. 2007,
    * the deterministic synchronous variant): every node starts as its
    * own community; each iteration every node adopts the label with
    * the highest total edge weight among its neighbors (graph treated
    * as undirected, self-loops dropped), ties broken by the
    * lexicographically smallest label — fully deterministic, unlike
    * the randomized asynchronous original. The cheap community
    * detector for domain/citation graphs where PageRank answers
    * "importance" and this answers "which cluster".
    *
    * Scale shape (guide §2.4 — the [[pageRank]] treatment): the
    * symmetrized edge list is built and checkpointed ONCE in
    * Catalyst (possibly a many-table join), then the iteration runs
    * over RDDs sharing one HashPartitioner: the adjacency is
    * partitioned once by the NEIGHBOR endpoint and each round reads
    * that partition's labels through a narrow zip (no join exchange,
    * no re-shuffle of the graph), so the only per-round movement is
    * the vote stream: ONE reduceByKey on (node, label) — map-side
    * combined, and partitioned by the NODE component alone
    * ([[NodeKeyPartitioner]]) so every vote for a node lands in that
    * node's home partition and the argmax is a partition-local pass
    * (per-partition state O(nodes), the same vertex-state budget as
    * [[pageRank]]'s rank map; hot (node, label) pairs collapse
    * map-side in the combine). The Catalyst form of this loop
    * re-exchanged the whole transition matrix plus both aggregates
    * every round (~2 exchanges × iterations of full-graph shuffle at
    * 100 TB, and a scheduled AQE job each at toy scale).
    *
    * Argmax semantics are the exact restatement of
    * `min(struct(-weight, label))`: highest total vote weight, ties
    * to the smallest label in binary-UTF-8 order
    * ([[codePointCompare]] — `String.compareTo` would diverge on
    * supplementary characters). Vote totals sum doubles in shuffle
    * arrival order exactly like the hash aggregate they replace;
    * integer-valued weights (count graphs) sum exactly.
    *
    * Output: (node, label) after `iterations` rounds.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val spark = edges.sparkSession
    val e = edges
      .filter(col(weightCol).isNotNull && col(weightCol) > 0 &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).cast("string").as("__a"),
        col(dstCol).cast("string").as("__b"),
        // double, NOT long: a long cast would truncate fractional
        // weights in (0,1) to 0 and silently degrade the weighted
        // argmax to lexicographic tie-breaks; count-graph longs sum
        // exactly in double far past any realistic vote total
        col(weightCol).cast("double").as("__w"))
    val und = e.union(e.select(col("__b").as("__a"), col("__a").as("__b"),
        col("__w")))
      .groupBy(col("__a"), col("__b")).agg(sum(col("__w")).as("__w"))
      .localCheckpoint(true)
    val part = new org.apache.spark.HashPartitioner(
      spark.sessionState.conf.numShufflePartitions)
    // adjacency keyed by the NEIGHBOR (__b): each round reads b's
    // label and votes (__a, label(b), w). Raw edge records — never
    // grouped per key, so a hub's edge list streams through its task
    // instead of materializing as one in-memory array
    val adj = und.rdd
      .map(r => (r.getString(1), (r.getString(0), r.getDouble(2))))
      .partitionBy(part)
    // node set on the SAME partitioner (distinct via reduceByKey);
    // every node appears as __a AND __b (und is symmetric), so labels
    // always cover every vote source
    var labels = und.rdd
      .map(r => (r.getString(0), ()))
      .reduceByKey(part, (a, _) => a)
      .mapPartitions(_.map { case (node, _) => (node, node) },
        preservesPartitioning = true)
    val votePart = new NodeKeyPartitioner(part)
    var i = 0
    while (i < iterations) {
      val lbl = labels
      // narrow zip (positional over the shared layout): per partition,
      // the label map is O(nodes in partition); edges stream through
      labels = adj.zipPartitions(lbl) { (eit, lit) =>
        val m = new java.util.HashMap[String, String]()
        lit.foreach { case (node, l) => m.put(node, l); () }
        eit.map { case (b, (a, w)) => ((a, m.get(b)), w) }
      }
        // THE round's one shuffle: complete (node, label) vote totals,
        // co-located by node (NodeKeyPartitioner hashes the node only)
        .reduceByKey(votePart, _ + _)
        // partition-local argmax — weight desc, ties label asc, the
        // exact min(struct(-w, label)) rule
        .mapPartitions { it =>
          val best = new java.util.HashMap[String, (String, Double)]()
          it.foreach { case ((a, l), w) =>
            val cur = best.get(a)
            if (cur == null || w > cur._2 ||
              (w == cur._2 && codePointCompare(l, cur._1) < 0)) {
              best.put(a, (l, w)); ()
            }
          }
          val jit = best.entrySet().iterator()
          new Iterator[(String, String)] {
            def hasNext: Boolean = jit.hasNext
            def next(): (String, String) = {
              val e = jit.next(); (e.getKey, e.getValue._1)
            }
          }
        }
      i += 1
      if (i % 5 == 0 && i < iterations) {
        labels.localCheckpoint()
        labels.count() // force: a lazy checkpoint never truncates
        ()
      }
    }
    spark.createDataFrame(
      labels.map { case (node, l) => org.apache.spark.sql.Row(node, l) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.StringType))))
  }

  /** Count–min point estimates for a fixed probe list
    * ([[Aggregators.countMin]]): build ONE depth×width sketch over the
    * whole item stream (global typed aggregate, cell-wise partial
    * merge), then answer "how many times did THIS item occur" for each
    * probe — including items a heavy-hitter summary evicted — with the
    * guaranteed-never-under CMS estimate. Output per probe:
    * (item, est, exact_n, overcount ≥ 0); `exact_n` comes from a
    * probe-filtered count so the gate can quantify the overestimate.
    *
    * Scale shape: the sketch is one O(depth·width) buffer per
    * partition merged cell-wise; the exact side filters to the probe
    * list BEFORE its aggregate (never a full-vocabulary count). The
    * one-row sketch is collected to the driver to answer the probes —
    * O(depth·width) bytes, not data-sized.
    */
  def cmsCounts(df: DataFrame, itemCol: String, probes: Seq[String],
      depth: Int = 3, width: Int = 1024): DataFrame = {
    require(probes.nonEmpty, "probes must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val sketch = df.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull).as[String]
      .select(Aggregators.countMin(depth, width).toColumn).head()
    val est = probes.map(p =>
      (p, Aggregators.countMinQuery(sketch, depth, width, p))).toDF("item", "est")
    val exact = df
      .filter(col(itemCol).isin(probes.map(p => p: Any): _*))
      .groupBy(col(itemCol).cast("string").as("item"))
      .agg(count(lit(1)).as("exact_n"))
    est.join(exact, Seq("item"), "left")
      .withColumn("exact_n", coalesce(col("exact_n"), lit(0L)))
      .withColumn("overcount", col("est") - col("exact_n"))
  }

  /** Funnel analysis over an event stream: how many users reached each
    * stage of an ordered `stages` sequence (the product-analytics
    * staple the reference's outcome aggregator approximates with
    * per-status counts, `outcome_aggregator.py:225-295` — generalized
    * here to arbitrary event-type sequences).
    *
    * Semantics (first-touch): a user reaches stage k when their FIRST
    * occurrence of each stage's event type is strictly later than the
    * first occurrence of the previous stage's — i.e. stage-k first
    * times are strictly increasing through the prefix. This is the
    * standard "first-touch funnel" simplification: one conditional-min
    * aggregate per user instead of a sequential scan, so the whole
    * funnel is ONE hash aggregate keyed by user (map-side partial
    * combine; no window, no self-join) plus a tiny stage rollup —
    * the shape that survives 100 TB of events unchanged.
    *
    * Output: (stage_idx, stage, users, conversion) where `conversion`
    * is users(k)/users(1) rounded to `scale`.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], scale: Int = 4): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    val firstAggs = stages.zipWithIndex.map { case (st, i) =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"__t$i")
    }
    val firsts = events
      .filter(col(typeCol).isin(stages.map(s => s: Any): _*))
      .groupBy(col(userCol))
      .agg(firstAggs.head, firstAggs.tail: _*)
    // reached(k) = all first-times t0..tk present and strictly increasing
    val reached = stages.indices.map { k =>
      (0 to k).map(i => col(s"__t$i").isNotNull)
        .reduce(_ && _) &&
        (1 to k).map(i => col(s"__t${i - 1}") < col(s"__t$i"))
          .foldLeft(lit(true))(_ && _)
    }
    val counted = firsts.select(
      stages.indices.map(k =>
        sum(when(reached(k), 1L).otherwise(0L)).as(s"__r$k")): _*)
    // conversion derives from the SAME one-row frame (no self-join:
    // a second reference to `counted` would re-run the whole user
    // aggregate — the plan must contain exactly one user exchange)
    counted.select(explode(array(
      stages.indices.map(k => struct(
        lit(k + 1).as("stage_idx"), lit(stages(k)).as("stage"),
        col(s"__r$k").as("users"),
        round(when(col("__r0") === 0, 0.0)
          .otherwise(col(s"__r$k").cast("double") / col("__r0")), scale)
          .as("conversion"))): _*)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.users"),
        col("s.conversion"))
      .orderBy(col("stage_idx"))
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of
    * their first event; each (cohort_week, week_offset) cell counts
    * distinct users from that cohort active `week_offset` weeks later.
    * The growth-analytics matrix behind every "do users come back"
    * question.
    *
    * Scale shape: one aggregate keyed by user for first-times (map-side
    * combine), broadcast-free join back on user (a shuffle join on the
    * SAME user key — co-partitioned with the first agg's output), then
    * one count-distinct keyed by (cohort, offset). Count-distinct is
    * exact here because the cell cardinality is what the report IS; at
    * 100 TB swap `countDistinct` for `approx_count_distinct` — the
    * plan shape is unchanged.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("__w"))
      .join(firsts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("__w"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Rolling z-score anomaly flags: for each row, compare `valueCol`
    * against the mean/stddev of the PREVIOUS `window` rows of the same
    * `partition` key (event-order by `orderCol`) and flag
    * |value − mean| > z·σ. The metric-stream outlier monitor (spiky
    * users, runaway costs) in one window pass.
    *
    * Float discipline (the cross-engine lesson from q91/q108): the
    * rolling sums run over INTEGER cents (`round(value·100)` as long),
    * so partial-aggregation order can never change a bit; mean and the
    * population σ are derived per-row from the two exact integer sums.
    * Rows with fewer than `window` predecessors are never flagged
    * (cold start). Output adds `roll_mean`, `roll_std`, `zscore`
    * (rounded to 6) and `anomaly`.
    *
    * Scale shape: one window exchange keyed by the partition column —
    * the same shuffle any per-entity sessionization pays. Frame is
    * bounded (`window` rows), so state per key is O(window).
    */
  def anomalyFlags(events: DataFrame, partitionCols: Seq[String],
      orderCol: String, valueCol: String, window: Int = 20,
      z: Double = 3.0): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol)).rowsBetween(-window, -1)
    val cents = round(col(valueCol) * 100).cast("long")
    // materialize the three frame aggregates ONCE, then derive
    // everything per-row — keeps the plan at a single Window pass
    // (expression-level composition re-derives a Window op per
    // withColumn chain and planned as two passes before this)
    val staged = events
      .withColumn("__cents", cents)
      // the square is projected BEFORE the window columns: a derived
      // expression inside a window arg forces a Project between Window
      // ops, which blocks CollapseWindow from fusing the passes
      .withColumn("__c2", col("__cents") * col("__cents"))
      .withColumn("__n", count(col("__cents")).over(w))
      .withColumn("__s1", sum(col("__cents")).over(w))
      .withColumn("__s2", sum(col("__c2")).over(w))
    val mean = col("__s1").cast("double") / col("__n")
    // population variance from exact integer sums; max(0) guards the
    // tiny negative residue double subtraction can leave
    val variance = greatest(
      (col("__s2").cast("double") -
        col("__s1").cast("double") * col("__s1").cast("double") / col("__n")) /
        col("__n"),
      lit(0.0))
    val std = sqrt(variance)
    val zscore = when(std > 0,
      (col("__cents").cast("double") - mean) / std).otherwise(lit(null))
    staged
      .withColumn("roll_mean", round(mean / 100.0, 6))
      .withColumn("roll_std", round(std / 100.0, 6))
      .withColumn("zscore", round(zscore, 6))
      .withColumn("anomaly",
        col("__n") === window && coalesce(abs(col("zscore")) > z, lit(false)))
      .drop("__cents", "__c2", "__n", "__s1", "__s2")
  }
}
