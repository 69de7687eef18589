package graft

/** Plan-shape regression tests: the physical plans the 100 TB design
  * depends on — pushdown, pruning, broadcast, top-k — must not
  * silently degrade.
  */
class PlanAudit extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q06: filters pushed to parquet scan, columns pruned") {
    val p = plan("q06_forecast")
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual"))
    assert(!scan.contains("l_orderkey"), "scan should not read unused columns")
  }

  test("q02: dimension joins broadcast, no sort-merge at test SF") {
    val p = plan("q02_rev_nation")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3)
    assert(p.linesIterator.count(_.contains("SortMergeJoin")) == 0)
  }

  test("q01: partial + final hash aggregation") {
    assert(plan("q01_pricing").linesIterator.count(_.contains("HashAggregate")) == 2)
  }

  test("q03: top-k plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("q03_top_orders").contains("TakeOrderedAndProject"))
  }

  test("q26: LIKE pushed as Contains to the scan") {
    val scan = plan("q26_brand_like").linesIterator
      .find(_.contains("FileScan parquet")).get
    assert(scan.contains("Contains(p_name"))
  }

  test("q18: top-n-per-group plans with WindowGroupLimit (no full-partition sort)") {
    assert(plan("q18_top3_per_type").contains("WindowGroupLimit"))
  }

  test("q56: CDC merge plans one shuffle on the key + one Window pass") {
    val p = plan("q56_cdc_upsert")
    // last-write-wins is a single window over the union — no repeated
    // exchanges per branch beyond the key partitioning
    assert(p.linesIterator.count(_.contains("Window")) >= 1)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"CDC merge should not multiply shuffles, saw $exchanges:\n$p")
  }

  test("q57: as-of read plans with WindowGroupLimit (rank-1 never sorts whole partitions)") {
    assert(plan("q57_state_asof").contains("WindowGroupLimit"))
  }

  test("dedup signature stage scans documents column-pruned to (doc_id, text)") {
    // q37's final plan starts at checkpointed signatures, so audit the
    // scan-side stage that feeds the checkpoint
    val docs = graft.core.Engine.table(spark, dir, "documents")
    val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    val scan = sigs.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"dedup must never scan lang/source/n_chars: $scan")
  }

  test("q41: probed ANN still plans top-k as TakeOrderedAndProject") {
    assert(plan("q41_knn_lsh").contains("TakeOrderedAndProject"))
  }

  test("q62: as-of join plans AsOfJoinExec with event_type pushed to both scans") {
    val p = plan("q62_asof_join")
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(p.contains("AsOfJoin "), s"q62 must use the custom exec:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.count(_.contains("EqualTo(event_type")) == 2,
      s"both side filters must reach their scans:\n${scans.mkString("\n")}")
  }

  test("q63: range join plans as equi-join (bucket decomposition, no nested loop)") {
    val p = plan("q63_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must never nested-loop:\n$p")
  }

  test("q64: decontamination never scans doc metadata columns") {
    val p = plan("q64_decontam")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(s =>
      !s.contains("lang") && !s.contains("source")),
      s"cross-corpus dedup reads only (doc_id, text):\n${scans.mkString("\n")}")
  }

  test("q67: gram decontamination is an equi-join, scans pruned to (doc_id, text)") {
    val p = plan("q67_ngram_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(s => !s.contains("lang") && !s.contains("source")))
  }

  test("q70: shuffle-order export head plans as TakeOrderedAndProject") {
    assert(plan("q70_shuffle_order").contains("TakeOrderedAndProject"))
  }

  test("q71: quantized ANN plans top-k as TakeOrderedAndProject") {
    assert(plan("q71_int8_knn").contains("TakeOrderedAndProject"))
  }

  test("q78: partitioned IVF probe is a partition-pruned scan + top-k") {
    val p = plan("q78_ivf_part")
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("PartitionFilters") && scan.contains("cluster"),
      s"probe must prune cluster partitions at planning time: $scan")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q80: BM25 scoring is map-side + TakeOrderedAndProject top-k") {
    val p = plan("q80_bm25")
    assert(p.contains("TakeOrderedAndProject"))
    // after the one stats collect, scoring must not shuffle the corpus:
    // no exchange beyond what top-k itself needs
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"),
      s"BM25 scoring should be a pure projection over the scan:\n$p")
  }

  test("q82: LM perplexity scoring is map-only — model rides the expression, zero exchanges") {
    // the fit collects happen at query-build time over the (small)
    // reference slice; the returned SCORING plan over the full corpus
    // must be scan -> project -> filter -> top-k with no shuffle
    val p = plan("q82_ppl")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"), s"perplexity scoring must not shuffle:\n$p")
  }

  test("q83: DSIR scoring is map-only — ratio table rides the expression, zero exchanges") {
    val p = plan("q83_dsir")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"), s"DSIR scoring must not shuffle:\n$p")
  }

  test("q68: repetition metrics are map-only (no exchange at all)") {
    // the row-local run-length formulation must never introduce a
    // shuffle; a global sort would mean someone re-expressed the
    // bigram mode as explode+groupBy
    val p = SparkEntry.queries("q68_repetition")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("rangepartitioning")) == 0,
      s"repetitionMetrics should not shuffle:\n$p")
  }

  test("q75: per-stratum top-k plans with WindowGroupLimit (no full partition sort)") {
    assert(plan("q75_topk").contains("WindowGroupLimit"))
  }

  test("q91: lexical stats are map-only — only the output sort exchanges") {
    val p = plan("q91_lex")
    assert(p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("rangepartitioning")) == 0,
      s"lexicalStats must not shuffle:\n$p")
  }

  test("q92: per-doc tf-idf top-j plans with WindowGroupLimit") {
    assert(plan("q92_tfidf").contains("WindowGroupLimit"))
  }

  test("q93: PMI top-k is TakeOrderedAndProject; unigram joins stay equi-joins") {
    val p = plan("q93_pmi")
    assert(p.contains("TakeOrderedAndProject"), s"no global sort for top-k:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the two unigram-count attaches (w1, w2) must be hash equi-joins
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2, p)
    // the ONLY nested-loop joins are the two one-row corpus-total
    // singletons (U, B) — same shape Spark plans for scalar subqueries
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 2, p)
    // each count aggregate is materialized ONCE: every consumer reads
    // the checkpointed frame, so the final plan carries NO explode at
    // all (the un-checkpointed form re-exploded the corpus five times
    // — join-branch isnotnull inference broke exchange identity)
    assert(!p.contains("Generate"),
      s"tokenize/explode must run once inside the checkpoint builds:\n$p")
  }

  test("q94: substring dedup scans pruned to (doc_id, text); stats join stays equi") {
    val p = plan("q94_substr_spans")
    // the window-fingerprint explode must never drag doc metadata
    // through the fp shuffle
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(
      _.contains("ReadSchema: struct<doc_id:bigint,text:string>")),
      s"substring dedup must scan only (doc_id, text):\n$scans")
    // occurrence stats are a groupBy (map-side partials absorb hot
    // fingerprints) joined back on fp — an equi-join, never a
    // nested loop; partial aggregation shows as two HashAggregate
    // levels around the fp exchange
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
  }

  test("q96: URL canonicalization is map-only — only the output sort exchanges") {
    val p = plan("q96_url_canon")
    assert(p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("rangepartitioning")) == 0,
      s"canonicalUrl/urlDomain must not shuffle:\n$p")
  }

  test("q97: blocklist is a broadcast equi-join on exploded suffixes") {
    val p = plan("q97_domain_block")
    assert(!p.contains("CartesianProduct"), p)
    // suffix membership + the anti-join + the grand-total attach are
    // all broadcast-shaped; the only nested loop is the one-row total
    // singleton (scalar-subquery shape)
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
    assert(p.linesIterator.exists(l => l.contains("BroadcastHashJoin") &&
      l.contains("LeftAnti")), s"blocklist must anti-join broadcast:\n$p")
  }

  test("q101: token-budget cumsum windows partition by (stratum, bucket), never stratum alone") {
    val p = plan("q101_tok_budget")
    // the whole point of the two-phase decomposition: a window
    // partitioned by the stratum alone funnels a 50B-token stratum
    // through one reducer
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, s"expected a window in:\n$p")
    assert(specs.forall(_.contains("__b")),
      s"cumsum must partition by (stratum, bucket):\n$specs")
    // the bucket-prefix table rides a broadcast join
    assert(p.linesIterator.exists(_.contains("BroadcastHashJoin")), p)
  }

  test("q88: chunking is map-only — only the output sort exchanges") {
    val p = plan("q88_chunk")
    assert(p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("rangepartitioning")) == 0,
      s"chunkDocs must not shuffle:\n$p")
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("doc_id") && scan.contains("text") &&
      !scan.contains("lang"), "chunk scan pruned to (doc_id, text)")
  }

  test("q87: lineDedup takes the broadcast-rewrite path (map-only second pass)") {
    val p = plan("q87_lines")
    // the boilerplate set rides the FilterNotInSet expression as a
    // reference object: the rewrite is a pure fused projection — no
    // join of any kind and no exchange in the returned plan (the
    // line-df aggregate runs in its own bounded fit action)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"rewrite must not join:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("rangepartitioning")) == 0,
      s"rewrite must not shuffle (the gate's orderBy range exchange aside):\n$p")
  }

  test("q90: phrase postings intersect as a broadcast equi-join, never nested-loop") {
    val p = plan("q90_phr")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"postings alignment must be an equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no all-pairs path in phrase search:\n$p")
    assert(p.linesIterator.filter(_.contains("FileScan parquet"))
      .forall(l => !l.contains("lang") && !l.contains("source")),
      "postings scans pruned to (doc_id, text)")
  }

  test("q103: z-order layout range-partitions on the interleaved key; scan pruned to doc_id") {
    val p = plan("q103_zorder")
    assert(p.linesIterator.count(_.contains("Exchange rangepartitioning")) >= 1,
      s"z-order layout must range-partition along the curve:\n$p")
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(!scan.contains("text") && !scan.contains("source"),
      s"coordinates derive from doc_id alone — scan must not read text: $scan")
  }

  test("q104: Misra-Gries summary is one object aggregate, one single-partition exchange") {
    val p = plan("q104_heavy")
    // partial summaries per partition + one final merge — the whole
    // point is that NO per-item hash shuffle happens
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 2 ||
      p.linesIterator.count(_.contains("SortAggregate")) == 2,
      s"sketch must aggregate partial+final:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 0,
      s"no per-item hash exchange — the summary merge is the only movement:\n$p")
  }

  test("q105: PageRank iterates from the materialized graph, never all-pairs") {
    val p = plan("q105_pgrank")
    assert(!p.contains("CartesianProduct"), s"no all-pairs in PageRank:\n$p")
    // the power iteration runs on RDDs sharing one HashPartitioner
    // (one shuffle per round, narrow joins) — the query plan must be
    // nothing but the rank RDD's scan + the final projection/sort:
    // NOT a re-derivation of the 5-table edge join (the edge frame is
    // checkpointed once), and no Catalyst join ladder re-exchanging
    // the graph per iteration (the pre-r16-opt shape)
    assert(p.linesIterator.count(_.contains("ExistingRDD")) == 1,
      s"the final plan reads exactly the rank RDD:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"no per-iteration re-scan of the fact tables:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"iteration joins live in the partitioned RDD loop, not the final plan:\n$p")
  }

  test("q126: label propagation iterates in the partitioned RDD loop, never a Catalyst join ladder") {
    val p = plan("q126_lprop")
    // the rounds run over RDDs sharing one HashPartitioner (one vote
    // shuffle per round, narrow zips) — the query plan must be nothing
    // but the final label RDD's scan + the gate's sort: NOT a
    // re-derivation of the edge join, and no per-iteration
    // SortMergeJoin/HashAggregate ladder (the pre-r17 shape:
    // ~2 exchanges × 3 iterations of full-graph re-shuffle)
    assert(p.linesIterator.count(_.contains("ExistingRDD")) == 1,
      s"the final plan reads exactly the label RDD:\n$p")
    assert(!p.contains("FileScan parquet"),
      s"no per-iteration re-scan of the fact tables:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"iteration joins live in the partitioned RDD loop, not the final plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs in label propagation:\n$p")
  }

  test("q106: temperature quotas plan with WindowGroupLimit (heap, not full stratum sort)") {
    val p = plan("q106_temp")
    assert(p.contains("WindowGroupLimit"),
      s"the literal max-quota conjunct must drive a running top-k heap:\n$p")
  }

  test("q107: containment is a df-capped gram equi-join, never all-pairs") {
    val p = plan("q107_contain")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no all-pairs path in containment:\n$p")
  }

  test("q110: funnel is ONE user-keyed exchange — no window, no self-join") {
    val p = plan("q110_funnel")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"funnel must stay a conditional-min aggregate:\n$p")
    val userExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges == 1,
      s"exactly one user-keyed shuffle expected, saw $userExchanges:\n$p")
  }

  test("q112: anomaly flags are one bounded-frame window pass on the user key") {
    val p = plan("q112_zanom")
    val userExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges == 1,
      s"one user-keyed shuffle expected, saw $userExchanges:\n$p")
    assert(p.contains("RowFrame, -20, -1"),
      s"the frame must stay bounded (O(window) state per key):\n$p")
    val windows = p.linesIterator.count(_.trim.startsWith("+- Window "))
    assert(windows <= 1, s"one Window pass expected, saw $windows:\n$p")
  }

  test("q113: KMV sketch aggregates partially before the exchange") {
    val p = plan("q113_kmv")
    // typed-Aggregator UDAF → ObjectHashAggregate with a partial_
    // stage below the shuffle: the O(k) buffer combines map-side
    val stages = p.linesIterator.filter(_.contains("ObjectHashAggregate")).toSeq
    assert(stages.size == 2 && stages.exists(_.contains("partial_")),
      s"KMV must map-side combine (partial + final ObjectHashAggregate):\n$p")
  }

  test("q117: percent-rank runs the window over the COUNT table, not raw rows") {
    val p = plan("q117_pctrank")
    // the aggregate (group, score) → count must sit BELOW the window
    val lines = p.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(winIdx >= 0, s"expected a window stage:\n$p")
    assert(lines.drop(winIdx).exists(_.contains("HashAggregate")),
      s"the distinct-score aggregate must feed the window:\n$p")
  }

  test("q143: IVF-PQ probe partition-prunes; the ADC pass scans codes, never vectors") {
    val p = plan("q143_pq")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("PartitionFilters")),
      s"every layout scan must prune cluster partitions:\n${scans.mkString("\n")}")
    assert(scans.exists(s => s.contains("pq_codes") && !s.contains("embedding")),
      s"the candidate pass must read (id, pq_codes) only:\n${scans.mkString("\n")}")
    assert(p.contains("TakeOrderedAndProject"), s"both top-k stages stay heaps:\n$p")
  }

  test("q144: unigram budget cumsum windows partition by (stratum, bucket), never stratum alone") {
    // same discipline as q101 — the piece-count accounting unit must
    // not change the two-phase bucketed selection's shape
    val p = plan("q144_unitok")
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, s"expected the budget windows in:\n$p")
    assert(specs.forall(_.contains("__b")),
      s"cumsum must partition by (stratum, bucket):\n$specs")
  }

  test("q146: data card is one scan + group aggregates — no join, no window") {
    val p = plan("q146_card")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the card must stay aggregate-only:\n$p")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size == 1 && scans.head.contains("ReadSchema: struct<text:string,source:string>"),
      s"one scan, pruned to (text, source):\n$scans")
  }

  test("no unpartitioned window anywhere in the suite (100 TB lock)") {
    // A Window (or WindowGroupLimit) with an empty partitionSpec moves
    // EVERY input row through ONE task — the canonical at-scale
    // executor OOM, and the round-7 lesson (aucScore/q136/q138/q140
    // shipped correct-but-global windows). Global rank/ntile/cume
    // statistics must come from distinct-value count tables
    // (Scale.globalPrefixSums / globalRowNumber) instead. This audits
    // the PRE-ADAPTIVE physical plan of every registered query.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, dir).queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            s"$name: Window over ${w.windowExpression.map(_.sql).mkString(", ")}"
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            s"$name: WindowGroupLimit"
        }
    }
    assert(offenders.isEmpty,
      s"single-partition window scale-killers:\n${offenders.mkString("\n")}")
  }

  test("q149: badword gate is map-side codegen — pruned scan, one hash exchange") {
    val p = plan("q149_badwords")
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("ReadSchema: struct<text:string,source:string>"),
      s"the gate must never scan doc_id/n_chars/lang: $scan")
    assert(p.contains("countinset(tokenize("),
      "membership must be the fused kernel expression, not a join or HOF")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"one aggregation exchange only:\n$p")
    assert(!p.contains("Join"), "a plan-shipped set never joins")
  }

  test("q151: KLL sketch aggregates partial+final ObjectHashAggregate, one exchange") {
    val p = plan("q151_kll")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 2,
      s"typed aggregator must combine map-side:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("ReadSchema: struct<event_type:string,value:double>"),
      s"sketching must scan only (event_type, value): $scan")
  }

  test("q148: image near-dup is a banded equi-join with the Hamming gate at join time") {
    val p = plan("q148_imgdup")
    assert(p.contains("HashJoin"), s"banding must plan an equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "image dedup must never go all-pairs")
    // the Hamming verify rides the join condition, so the pair-dedup
    // exchange only ever sees surviving pairs
    assert(p.contains("bit_count"), "Hamming gate must be in the plan")
  }

  test("q190: corpus-scale caption mining is one scan — bounded, data-independent job count") {
    // map-only extraction + ONE aggregate: at 100 TB this is a single
    // pass over the corpus with no joins and no windows
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries("q190_capcorp")(spark, dir).collect()
      Thread.sleep(500) // listener delivery is async
    } finally spark.sparkContext.removeSparkListener(l)
    val jobs = counter.get()
    assert(jobs <= 8,
      s"caption mining must stay a one-scan pipeline: $jobs jobs")
    assert(jobs >= 1, s"listener must have observed the scan: $jobs")
  }

  test("q156: corpus-scale image dedup runs a bounded, data-independent job count") {
    // the job count is a function of the PIPELINE (render scan,
    // signature checkpoint, bucket cap, banded join, CC iterations,
    // keep join), not of the corpus size — the shuffle-barrier budget
    // that matters at 100 TB. Count actual jobs at sf0.001.
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries("q156_imgcorp")(spark, dir).collect()
      Thread.sleep(500) // listener delivery is async (JobTrace precedent)
    } finally spark.sparkContext.removeSparkListener(l)
    val jobs = counter.get()
    assert(jobs <= 20,
      s"corpus-scale image dedup must stay within its job budget: $jobs")
    assert(jobs >= 5, s"listener must have observed the pipeline: $jobs")
  }

  test("q197: corpus-scale clip-text pair mining is one scan — bounded job count") {
    // muxed-cue extraction is a map-only flatMap + ONE aggregate: at
    // 100 TB this is a single pass over the video corpus
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries("q197_clippairs")(spark, dir).collect()
      Thread.sleep(500) // listener delivery is async
    } finally spark.sparkContext.removeSparkListener(l)
    val jobs = counter.get()
    assert(jobs <= 8,
      s"clip-pair mining must stay a one-scan pipeline: $jobs jobs")
    assert(jobs >= 1, s"listener must have observed the scan: $jobs")
  }

  test("q194: corpus-scale cover-art linking runs a bounded, data-independent job count") {
    // the q156 gate for the cross-modal linker: one codegen'd
    // link-hash projection, one bucket-capped banded join, CC, keep
    // join — the job count is a function of the PIPELINE, not of how
    // many audio files carry art
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val rows = try {
      val out = SparkEntry.queries("q194_artlink")(spark, dir).collect()
      Thread.sleep(500) // listener delivery is async (JobTrace precedent)
      out
    } finally spark.sparkContext.removeSparkListener(l)
    val jobs = counter.get()
    assert(jobs <= 20, s"cover-art linking must stay within its job budget: $jobs")
    assert(jobs >= 4, s"listener must have observed the pipeline: $jobs")
    assert(rows.length == 14, "one row per art class")
    rows.foreach { r =>
      val cls = r.getLong(0)
      assert(r.getLong(3) == r.getLong(4) && r.getLong(3) % 14 == cls,
        s"class $cls must be ONE cross-modal class: $r")
      assert(r.getLong(2) > 0, s"class $cls must contain linked audio: $r")
    }
  }

  test("q204: corpus-scale translation-pair mining is one scan + one equi-join — bounded job count") {
    // one materialized cue scan, one co-partitioned join, one
    // aggregate: the job count is a function of the PIPELINE
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries("q204_tpaircorp")(spark, dir).collect()
      Thread.sleep(500) // listener delivery is async
    } finally spark.sparkContext.removeSparkListener(l)
    val jobs = counter.get()
    assert(jobs <= 10,
      s"translation-pair mining must stay a scan+join pipeline: $jobs jobs")
    assert(jobs >= 2, s"listener must have observed the pipeline: $jobs")
  }

  test("q208: corpus-scale dialog-turn mining is one scan + partitioned windows — bounded job count") {
    // one synthesized-transcript scan, per-asset windows, one
    // aggregate: the job count is a function of the PIPELINE
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries("q208_turncorp")(spark, dir).collect()
      Thread.sleep(500) // listener delivery is async
    } finally spark.sparkContext.removeSparkListener(l)
    val jobs = counter.get()
    assert(jobs <= 8,
      s"dialog-turn mining must stay a scan+window pipeline: $jobs jobs")
    assert(jobs >= 1, s"listener must have observed the pipeline: $jobs")
  }

  test("q209: corpus-scale plate linking is one decode scan + one banded join — bounded job count") {
    // one plate decode+hash scan (materialized once), one
    // bucket-capped banded join, one aggregate
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries("q209_platelink")(spark, dir).collect()
      Thread.sleep(500) // listener delivery is async
    } finally spark.sparkContext.removeSparkListener(l)
    val jobs = counter.get()
    assert(jobs <= 12,
      s"plate linking must stay a scan+banded-join pipeline: $jobs jobs")
    assert(jobs >= 2, s"listener must have observed the pipeline: $jobs")
  }

  test("q199: two-batch incremental art-link replay stays within a bounded job count") {
    // the streaming-ingest identity check runs the link pipeline
    // TWICE (full + two incremental joins) plus CC — still a
    // data-independent job count, roughly double q194's linker half
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val rows = try {
      val out = SparkEntry.queries("q199_artincr")(spark, dir).collect()
      Thread.sleep(500) // listener delivery is async (JobTrace precedent)
      out
    } finally spark.sparkContext.removeSparkListener(l)
    val jobs = counter.get()
    assert(jobs <= 36,
      s"incremental art-link replay must stay within its job budget: $jobs")
    assert(jobs >= 4, s"listener must have observed the pipeline: $jobs")
    assert(rows.length == 7, "one row per art class")
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(3),
        s"every asset's incremental class must equal its batch class: $r")
    }
  }

  test("q164/q165: corpus-scale video-exact and audio dedup run bounded job counts and recover the residue classes") {
    // the q156 gate extended to the other two modalities: the job
    // count is a function of the PIPELINE, never the corpus size —
    // and the collect doubles as the class-structure check (every
    // group one class, smallest-id keeper) ahead of the DuckDB gate.
    for ((qname, mod) <- Seq(("q164_vidcorp", 11), ("q165_audcorp", 19))) {
      val counter = new java.util.concurrent.atomic.AtomicInteger()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          counter.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      val rows = try {
        val out = SparkEntry.queries(qname)(spark, dir).collect()
        Thread.sleep(500) // listener delivery is async (JobTrace precedent)
        out
      } finally spark.sparkContext.removeSparkListener(l)
      val jobs = counter.get()
      assert(jobs <= 20, s"$qname must stay within its job budget: $jobs")
      assert(jobs >= 4, s"$qname: listener must have observed the pipeline: $jobs")
      assert(rows.length == mod, s"$qname: one row per residue class")
      rows.foreach { r =>
        val cls = r.getLong(0)
        assert(r.getLong(2) == cls && r.getLong(3) == cls,
          s"$qname class $cls: dup_class must be the residue: $r")
        assert(r.getLong(4) == 1L, s"$qname class $cls: one keeper: $r")
      }
    }
  }

  test("image hash signatures are a map-only codegen projection (no exchange)") {
    // parquet-backed input (a local Seq would constant-fold to a
    // LocalTableScan); non-image bytes only exercise the PLAN shape
    val docs = graft.core.Engine.table(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text").cast("binary").as("content"))
    val p = graft.operators.Dedup.imageHashSignatures(docs, "doc_id", "content")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"signature stage must not shuffle:\n$p")
    assert(p.contains("dhash64"), s"the codegen'd kernel must appear:\n$p")
    assert(p.contains("*(1) Project"),
      s"the projection must stay inside whole-stage codegen (the *(n) marker):\n$p")
  }

  test("compiled safe_eval predicates push down to the parquet scan") {
    val events = graft.core.Engine.table(spark, dir, "events")
    val filtered = events.filter(
      graft.expr.SafeEval.filterCondition("value > 100 and event_type != 'error'", events.schema))
    val scan = filtered.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("GreaterThan(value,100.0"),
      s"safe_eval comparison should reach PushedFilters: $scan")
  }
}
