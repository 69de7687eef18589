package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Training-corpus curation operators beyond the dedup/similarity
  * family: exact n-gram decontamination, repetition (boilerplate)
  * metrics, PII redaction, deterministic global shuffle order, and
  * int8 embedding quantization. Each is a relational composition that
  * keeps its per-row work inside expressions (map-only) and its
  * cross-row work inside equi-joins/aggregations — no driver loops,
  * no O(n²) passes.
  */
object Curation {

  /** Session-scoped memo for fitted models (a [[BigramLm]], a
    * [[DsirModel]], a merge table…) — [[CorpusIndex]]'s
    * fit-once/score-everywhere discipline applied to model fits: a
    * reference model is corpus metadata, refit only when the corpus
    * the caller's `key` names changes. Queries composing several
    * fitted signals (q82/q83/q85 share the same LM and DSIR fits)
    * then pay each fit once per session instead of once per query.
    *
    * Lifecycle + staleness: see [[graft.core.SessionMemo]] — sessions
    * are weak keys (abandoned sessions release their models at GC,
    * stopped contexts purge eagerly), and `key` NAMES a corpus
    * snapshot: refitting after an in-place rewrite of the data under
    * the same key returns the stale fit, so mutable corpora must
    * version the key.
    */
  private val modelCache = new graft.core.SessionMemo[AnyRef]

  def memoModel[T <: AnyRef](spark: SparkSession, key: String)(fit: => T): T =
    modelCache.getOrCompute(spark, key)(fit).asInstanceOf[T]

  /** Test/diagnostic surface for the memo's session lifecycle. */
  private[graft] def memoSessionCount: Int = modelCache.sessionCount

  /** Word n-grams as strings: sliding windows of `n` tokens joined by
    * a single space over [[TextFunctions.tokens]] (lowercased,
    * whitespace-split). Documents shorter than `n` tokens contribute
    * no n-grams (the eval-overlap definition: a contamination gram
    * must be a full n-token span). Row-local — no shuffle.
    */
  def wordNgrams(text: Column, n: Int): Column =
    // fused kernel — the transform(sequence…slice…concat_ws) composed
    // form is an interpreted HOF on the gram-scan hot path
    // (byte-identical output, see ExprKernels.wordNgrams)
    graft.functions.CatalystExpressions.wordNgrams(TextFunctions.tokens(text), n)

  /** Exact n-gram decontamination (the GPT-3 style complement to
    * [[Dedup.crossCorpusNearDuplicates]]'s fuzzy form): a training
    * document is contaminated if it shares at least `minShared`
    * distinct word n-grams with an eval document. Distinct grams per
    * document explode to (id, gram) and the crossing pairs come from
    * ONE equi-join on the gram — work proportional to true overlap,
    * never all-pairs.
    *
    * Scale: `maxGramDf` drops grams whose document frequency (across
    * both sides) exceeds the cap before the join — the boilerplate
    * gram ("terms of service apply to all") that would otherwise
    * produce a quadratic hot key, same discipline as the LSH
    * hot-bucket caps. The over-cap gram list is tiny, so it
    * anti-joins back as a broadcast. Default keeps every gram
    * (exact semantics for the gate oracle).
    *
    * Returns (train_id, eval_id, n_shared) — n_shared counts DISTINCT
    * shared grams.
    */
  def ngramDecontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 5, minShared: Int = 1,
      maxGramDf: Int = Int.MaxValue): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    def grams(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
          explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
    var tg = grams(train, "train_id")
    var eg = grams(eval, "eval_id")
    if (maxGramDf != Int.MaxValue) {
      // document frequency across BOTH corpora: a gram over the cap on
      // either side is boilerplate for the pair-join regardless of
      // which side supplied the bulk
      // anti-join against the (tiny) over-cap gram list rather than a
      // window count over the explode: AQE broadcasts the hot-gram
      // list, so the filter costs no extra exchange on the big side
      val hot = tg.select(col("gram")).unionAll(eg.select(col("gram")))
        .groupBy(col("gram")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxGramDf)
        .select(col("gram"))
      tg = tg.join(hot, Seq("gram"), "left_anti")
      eg = eg.join(hot, Seq("gram"), "left_anti")
    }
    // Pin the gram-join parallelism (same blind spot as the LSH bucket
    // joins, see [[Dedup.pinJoinParallelism]]): AQE sizes post-shuffle
    // partitions by the exploded-gram shuffle INPUT and coalesces the
    // join to ~1 task, but the join OUTPUT fans out per shared gram —
    // measured at sf0.1: 4 tasks total for the whole query before the
    // pin. The repartition is the exact distribution the join needs,
    // so it adds no exchange.
    tg = Dedup.pinJoinParallelism(tg, Seq("gram"))
    tg.join(eg, Seq("gram"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Corpus-shift report: per-token KL contribution between two corpus
    * snapshots — the drift monitor a recurring crawl ingest needs
    * ("what changed between last month's snapshot and this one").
    * Token distributions are Laplace-smoothed over the UNION
    * vocabulary (`p_t = (c_t+1)/(N+V)`), and each token's KL term
    * `p_a·ln(p_a/p_b)` is pure per-row arithmetic — no cross-token
    * float summation, so results are bit-stable across engines and
    * partitionings (the aggregate KL is the caller's one `sum` away).
    * Positive terms are tokens over-represented in A vs B; the head of
    * the |term| ranking is the "what changed" answer.
    *
    * Scale: one token-count aggregate per corpus (map-side combined),
    * one full-outer equi-join on the token, and a lazy 1-row broadcast
    * of the three normalization scalars — vocabulary-sized
    * intermediates, never corpus-sized.
    */
  def tokenShift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame =
      df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as(out))
    val j = counts(a, "n_a").join(counts(b, "n_b"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = j.agg(sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"),
      count(lit(1)).as("__v"))
    j.crossJoin(broadcast(tot))
      .withColumn("p_a",
        (col("n_a") + 1).cast("double") / (col("__ta") + col("__v")))
      .withColumn("p_b",
        (col("n_b") + 1).cast("double") / (col("__tb") + col("__v")))
      .select(col("token"), col("n_a"), col("n_b"),
        round(col("p_a"), 8).as("p_a"), round(col("p_b"), 8).as("p_b"),
        round(col("p_a") * log(col("p_a") / col("p_b")), 9).as("kl_term"))
  }

  /** Gopher-style repetition metrics, entirely row-local (map-only —
    * the per-document work never reaches a shuffle):
    *   - `dup_word_frac`: fraction of token occurrences that repeat an
    *     earlier occurrence ((n - distinct) / n)
    *   - `top_bigram_frac`: share of all word bigrams taken by the
    *     most frequent one — computed as the longest run in the SORTED
    *     bigram array (sorting within a row is array work, not a
    *     shuffle), so no explode/groupBy per document is needed.
    * Empty/short documents score 0.0.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = TextFunctions.tokens(col(textCol))
    val nTok = size(tk).cast("long")
    val dupFrac = when(nTok > 0,
      (nTok - size(array_distinct(tk)).cast("long")).cast("double") /
        nTok.cast("double")).otherwise(lit(0.0))
    val grams = wordNgrams(col(textCol), 2)
    val sorted = sort_array(grams)
    // longest run of equal adjacent elements in the sorted array ==
    // max frequency of any bigram; aggregate() carries (prev, run, best)
    val zero = struct(lit("\u0000").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    val best = aggregate(sorted, zero,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val nGrams = size(grams).cast("long")
    val topFrac = when(nGrams > 0, best.cast("double") / nGrams.cast("double"))
      .otherwise(lit(0.0))
    df.select(col(idCol), nTok.as("n_tokens"),
      dupFrac.as("dup_word_frac"), topFrac.as("top_bigram_frac"))
  }

  /** The Gopher quality-rule bundle (Rae et al. 2021, "Scaling
    * Language Models: … Gopher", Table A1 — the repetition-free subset;
    * [[repetitionMetrics]] covers the duplicate-fraction rules): named
    * per-document boolean signals plus the composite `pass_gopher`.
    * Rules (defaults = the published thresholds):
    *
    *  - word count in [minWords, maxWords]
    *  - mean word length in [minMeanWordLen, maxMeanWordLen]
    *  - symbol-to-word ratio (`#` and `...`) ≤ maxSymbolRatio
    *  - ≤ maxBulletFrac of lines start with a bullet character
    *  - ≤ maxEllipsisFrac of lines end with an ellipsis
    *  - ≥ minAlphaWordFrac of words contain an alphabetic character
    *  - ≥ minStopwordHits distinct common-English stopwords present
    *
    * Pure column math over one `split` per axis (words/lines) — a
    * map-only codegen'd projection, the cheapest possible 100 TB scan
    * stage. Every ratio is rounded to 6 before its threshold compare
    * (the q107 cross-engine discipline: both engines compare the SAME
    * rounded value, so a boundary document cannot flip between
    * engines). Adds the ratio columns and one boolean per rule.
    */
  def gopherFlags(df: DataFrame, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val words = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val nWords = size(words).cast("long")
    val meanLen = when(nWords > 0,
      round(aggregate(words, lit(0L), (acc, w) => acc + length(w))
        .cast("double") / nWords, 6)).otherwise(lit(0.0))
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nEllip = (length(t) -
      length(regexp_replace(t, "\\.\\.\\.", ""))) / lit(3)
    val symbolRatio = when(nWords > 0,
      round((nHash + nEllip).cast("double") / nWords, 6)).otherwise(lit(0.0))
    val lines = filter(split(t, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("long")
    val bulletFrac = when(nLines > 0,
      round(size(filter(lines, l =>
        regexp_like(ltrim(l), lit("^[-*•]")))).cast("double") / nLines, 6))
      .otherwise(lit(0.0))
    val ellipsisFrac = when(nLines > 0,
      round(size(filter(lines, l =>
        regexp_like(rtrim(l), lit("(\\.\\.\\.|…)$")))).cast("double") / nLines, 6))
      .otherwise(lit(0.0))
    val alphaFrac = when(nWords > 0,
      round(size(filter(words, w =>
        regexp_like(w, lit("[A-Za-z]")))).cast("double") / nWords, 6))
      .otherwise(lit(0.0))
    val stops = array(GopherStopwords.map(lit): _*)
    val stopHits = size(array_intersect(
      array_distinct(transform(words, w => lower(w))), stops)).cast("long")
    val out = df
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("bullet_frac", bulletFrac)
      .withColumn("ellipsis_frac", ellipsisFrac)
      .withColumn("alpha_word_frac", alphaFrac)
      .withColumn("stop_hits", stopHits)
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_word_len",
        col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen)
      .withColumn("ok_symbols", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("ok_bullets", col("bullet_frac") <= maxBulletFrac)
      .withColumn("ok_ellipsis", col("ellipsis_frac") <= maxEllipsisFrac)
      .withColumn("ok_alpha", col("alpha_word_frac") >= minAlphaWordFrac)
      .withColumn("ok_stops", col("stop_hits") >= minStopwordHits)
    out.withColumn("pass_gopher",
      col("ok_words") && col("ok_word_len") && col("ok_symbols") &&
        col("ok_bullets") && col("ok_ellipsis") && col("ok_alpha") &&
        col("ok_stops"))
  }

  /** C4's LINE-level cleaning (Raffel et al. 2020, §2.2 — the first
    * filter of the C4 pipeline, upstream of every doc-level gate
    * here): keep only lines that end in a terminal punctuation mark,
    * carry at least `minLineWords` words, and don't mention
    * javascript; then apply the page gates — at least `minLines`
    * surviving lines, no "lorem ipsum", no curly brace. Returns every
    * input row with `clean_text` (surviving lines re-joined),
    * `n_lines`/`n_kept` accounting, and the three page booleans plus
    * the combined `pass_c4_page` — callers filter, the gopherRules
    * contract.
    *
    * Map-only (split → filter → re-join inside one projection; the
    * lambda predicates are RE2-compatible so the oracle replays them
    * verbatim). At 100 TB this is scan-speed work — exactly why C4
    * orders it first.
    */
  def c4LineFilter(df: DataFrame, textCol: String, minLineWords: Int = 5,
      minLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    def lineOk(l: Column): Column = {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(filter(split(t, "\\s+"), w => length(w) > 0)) >= minLineWords &&
        !lower(t).rlike("\\bjavascript\\b")
    }
    df.withColumn("__lines", lines)
      .withColumn("__kept", filter(col("__lines"), lineOk(_)))
      .withColumn("clean_text", array_join(col("__kept"), "\n"))
      .withColumn("n_lines", size(col("__lines")))
      .withColumn("n_kept", size(col("__kept")))
      .withColumn("ok_min_lines", col("n_kept") >= minLines)
      .withColumn("ok_lorem", !lower(col(textCol)).contains("lorem ipsum"))
      .withColumn("ok_brace", !col(textCol).contains("{"))
      .withColumn("pass_c4_page",
        col("ok_min_lines") && col("ok_lorem") && col("ok_brace"))
      .drop("__lines", "__kept")
  }

  /** C4's dirty-word page gate (Raffel et al. 2020 §2.2: "removed any
    * page that contained any word on the [badword list]") — the
    * CONTENT companion to [[c4LineFilter]]'s structural rules and
    * [[graft.operators.UrlOps]]'s domain gates. Adds `n_badwords`
    * (hit count over the lowercased whitespace tokens — the reporting
    * signal: "how dirty", not just "dirty") and `pass_badwords`
    * (no hits). Callers supply the list (the canonical one is
    * distribution-restricted; any vocabulary works).
    *
    * Scale: map-only codegen — one fused tokenize +
    * hash-set-membership kernel per row
    * ([[graft.functions.CatalystExpressions.CountInSet]]); the set
    * ships once with the plan (badword lists are ~2k words), so the
    * gate adds zero shuffles and zero driver round trips at any
    * corpus size. Matching is exact-token (C4's rule), so "class"
    * never trips on a substring the way a regex gate would.
    */
  def badwordFilter(df: DataFrame, textCol: String,
      badwords: Seq[String]): DataFrame = {
    require(badwords.nonEmpty, "badwords must be non-empty")
    df.withColumn("n_badwords",
        graft.functions.CatalystExpressions.countInSet(
          TextFunctions.tokens(col(textCol)),
          badwords.map(_.toLowerCase(java.util.Locale.ROOT)).distinct))
      .withColumn("pass_badwords", col("n_badwords") === 0)
  }

  /** Gopher's "stop word" presence list (Rae et al. 2021, §A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-group percent-rank score normalization — the FineWeb-style
    * per-dump calibration: a raw quality score is only comparable
    * WITHIN its group (crawl dump, domain, language), so gates like
    * "keep the top half" must rank within the group, not globally.
    * `pct_rank` is exactly SQL `percent_rank()`:
    * (#rows with strictly smaller score) / (n_group − 1), 0 for
    * singleton groups.
    *
    * Scale shape: this is deliberately NOT
    * `percent_rank().over(partitionBy(group))` — that window sorts
    * every row of a group in one task, and a 100 TB corpus has
    * billion-row groups. Instead: aggregate to (group, score) counts
    * (map-side combine collapses duplicate scores), run the window
    * over the DISTINCT-SCORE frame (|distinct scores| ≪ |rows|,
    * bounded for integer-ish scores), and hash-join the tiny rank
    * table back — same exact result, no giant-partition sort. The
    * join back is on (group, score): co-partitioned with the
    * aggregate's own shuffle.
    */
  def percentRankNormalize(df: DataFrame, groupCol: String,
      scoreCol: String, scale: Int = 6): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val ranked = counts
      .withColumn("__smaller", coalesce(sum(col("__c")).over(w), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wg))
      .withColumn("pct_rank",
        when(col("__n") <= 1, 0.0).otherwise(
          round(col("__smaller").cast("double") / (col("__n") - 1L), scale)))
      .select(col(groupCol), col(scoreCol), col("pct_rank"))
    df.join(ranked, Seq(groupCol, scoreCol))
  }

  /** Per-group winsorization: clip a score to its group's
    * [loP, hiP] discrete quantiles (percentile_disc semantics: the
    * smallest score whose cumulative share reaches p) — the robust
    * outlier-taming step before any mean/σ-based gate, computed per
    * group because score scales differ per dump/domain.
    *
    * Same scalable shape as [[percentRankNormalize]]: quantile
    * boundaries come from the (group, score) count table + a window
    * over DISTINCT scores (never a giant per-group row sort), then one
    * co-partitioned join back. Adds `score_lo`, `score_hi`,
    * `<score>_clipped`.
    */
  /** Per-group median and MAD (median absolute deviation) — the
    * robust location/dispersion pair for score distributions the mean
    * and σ misread under heavy tails. `percentile_disc(0.5)`
    * semantics for both medians (the smallest value whose cumulative
    * share reaches 1/2), so every reported statistic is an actual
    * data value and the whole computation replays exactly in any
    * engine.
    *
    * Scale shape: the same never-sort-raw-rows discipline as
    * [[percentRankNormalize]]/[[winsorize]] twice over — (group,
    * score) counts → distinct-score window → median; then (group,
    * |score − median|) counts → window → MAD. Two aggregate+window
    * passes regardless of row count.
    */
  def medianMad(df: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    def discMedian(in: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col(valueCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      in.groupBy(col(groupCol), col(valueCol))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__frac",
          sum(col("__c")).over(w).cast("double") / sum(col("__c")).over(wg))
        .groupBy(col(groupCol))
        .agg(min(when(col("__frac") >= 0.5, col(valueCol))).as(out))
    }
    val med = discMedian(df, scoreCol, "median")
    val dev = df.join(med, Seq(groupCol))
      .withColumn("__dev", abs(col(scoreCol) - col("median")))
    discMedian(dev, "__dev", "mad").join(med, Seq(groupCol))
      .select(col(groupCol), col("median"), col("mad"))
  }

  def winsorize(df: DataFrame, groupCol: String, scoreCol: String,
      loP: Double = 0.05, hiP: Double = 0.95): DataFrame = {
    require(loP >= 0 && hiP <= 1 && loP <= hiP, s"bad quantiles [$loP, $hiP]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val frac = df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__frac",
        sum(col("__c")).over(w).cast("double") / sum(col("__c")).over(wg))
    val bounds = frac.groupBy(col(groupCol)).agg(
      min(when(col("__frac") >= loP, col(scoreCol))).as("score_lo"),
      min(when(col("__frac") >= hiP, col(scoreCol))).as("score_hi"))
    df.join(bounds, Seq(groupCol))
      .withColumn(s"${scoreCol}_clipped",
        least(greatest(col(scoreCol), col("score_lo")), col("score_hi")))
  }

  /** Per-group corpus DATA CARD — the dataset-documentation report
    * every released training corpus ships (Datasheets for Datasets /
    * HF dataset-card numbers): per source, document and token volume,
    * exact-duplicate rate, language mix, quality distribution, PII
    * incidence and short-doc share, in long (group, metric, value)
    * format so downstream dashboards and drift diffs consume it
    * without schema changes as metrics are added.
    *
    * Every metric composes already-oracle-gated kernels
    * ([[TextFunctions.tokenCount]]/[[TextFunctions.qualityScore]]/
    * [[TextFunctions.langIdHeuristic]]/[[TextFunctions
    * .exactFingerprint]]/[[EmailPattern]]), so the whole card replays
    * in SQL. Scale shape: ONE scan computing all per-doc signals,
    * ONE aggregate on the group key (count-distinct for the
    * fingerprint is the only extra exchange), then a map-literal
    * explode to long rows — O(#groups × #metrics) output.
    */
  def dataCard(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val toks = TextFunctions.tokenCount(col(textCol))
    val enriched = df.select(col(groupCol).cast("string").as("__g"),
      toks.cast("long").as("__tok"),
      TextFunctions.qualityScore(col(textCol)).as("__q"),
      TextFunctions.langIdHeuristic(col(textCol)).as("__lang"),
      TextFunctions.exactFingerprint(col(textCol)).as("__fp"),
      col(textCol).rlike(EmailPattern).as("__email"))
    enriched.groupBy(col("__g")).agg(
        count(lit(1)).as("__n"),
        sum(col("__tok")).as("__wt"),
        countDistinct(col("__fp")).as("__u"),
        sum(when(col("__lang") === "en", 1L).otherwise(0L)).as("__nen"),
        round(avg(col("__q")), 4).as("__aq"),
        sum(when(col("__email"), 1L).otherwise(0L)).as("__ne"),
        sum(when(col("__tok") < 10, 1L).otherwise(0L)).as("__ns"),
        max(col("__tok")).as("__mt"))
      .select(col("__g").as(groupCol), explode(map(
        lit("avg_quality"), col("__aq"),
        lit("max_doc_tokens"), col("__mt").cast("double"),
        lit("n_docs"), col("__n").cast("double"),
        lit("pct_email"), round(col("__ne").cast("double") / col("__n"), 4),
        lit("pct_en"), round(col("__nen").cast("double") / col("__n"), 4),
        lit("pct_short"), round(col("__ns").cast("double") / col("__n"), 4),
        lit("pct_unique"), round(col("__u").cast("double") / col("__n"), 4),
        lit("ws_tokens"), col("__wt").cast("double"))).as(Seq("metric", "value")))
  }

  /** Incremental [[dataCard]] — the daily-ingest form: fold each
    * batch's per-group signals into a versioned parquet state
    * ([[Scale.writeVersionedState]]'s crash-safe pointer discipline)
    * and derive the card from state, so the work per ingest is
    * O(batch) + O(state), never O(corpus). Every metric is a
    * commutative monoid (counts, sums, max) except uniqueness, which
    * rides a mergeable KMV bottom-k sketch over the fingerprint
    * hashes — EXACT while a group's distinct fingerprints ≤ `kmvK`,
    * the standard (k−1)·H/h₍k₎ estimate beyond — so the incremental
    * card reports `pct_unique_est`. Quality averages accumulate as
    * exact integer sums of the (already 4-decimal) scores, so the
    * derived mean replays bit-for-bit regardless of batch split.
    *
    * Returns the merged state; read the card with
    * [[dataCardFromState]].
    */
  def upsertDataCardState(spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, groupCol: String, kmvK: Int = 256): DataFrame = {
    val toks = TextFunctions.tokenCount(col(textCol))
    val kmvAgg = org.apache.spark.sql.functions.udaf(Aggregators.kmv(kmvK))
    val enriched = batch.select(col(groupCol).cast("string").as("__g"),
      toks.cast("long").as("__tok"),
      TextFunctions.qualityScore(col(textCol)).as("__q"),
      TextFunctions.langIdHeuristic(col(textCol)).as("__lang"),
      // null for null text (concat_ws inside portableHash would
      // otherwise fold a null doc into a constant hash): parity with
      // the batch card, where countDistinct skips null fingerprints
      when(col(textCol).isNotNull,
        TextOps.portableHash(TextFunctions.exactFingerprint(col(textCol)),
          "card")).as("__fph"),
      col(textCol).rlike(EmailPattern).as("__email"))
      // both aggregations below consume this frame — without the
      // checkpoint the tokenize/quality/langid/hash projection would
      // run twice per document
      .localCheckpoint(false)
    // A group whose text is all null/untokenizable yields null `__fph`,
    // which must never reach the primitive-Long KMV input — and the
    // group must still keep its counts. So: numeric monoid in one agg,
    // the sketch in a second agg over NON-NULL hashes only, left-join,
    // coalesce the missing sketch to the empty one (the KMV identity).
    val emptySketch = array().cast("array<bigint>")
    val partialNums = enriched.groupBy(col("__g")).agg(
      count(lit(1)).as("n"),
      sum(col("__tok")).as("wt"),
      // exact integer accumulation of 4-decimal scores
      sum(round(col("__q") * 10000).cast("long")).as("q4"),
      sum(when(col("__lang") === "en", 1L).otherwise(0L)).as("nen"),
      sum(when(col("__email"), 1L).otherwise(0L)).as("ne"),
      sum(when(col("__tok") < 10, 1L).otherwise(0L)).as("ns"),
      max(col("__tok")).as("mt"))
    val partialSketch = enriched.where(col("__fph").isNotNull)
      .groupBy(col("__g")).agg(kmvAgg(col("__fph")).as("fp_kmv"))
    val partial = partialNums.join(partialSketch, Seq("__g"), "left")
      .withColumn("fp_kmv", coalesce(col("fp_kmv"), emptySketch))
    val merged = Scale.readVersionedState(spark, path) match {
      case None => partial
      case Some(state) =>
        val both = state.unionByName(partial)
        val nums = both.groupBy(col("__g")).agg(
          sum(col("n")).as("n"), sum(col("wt")).as("wt"),
          sum(col("q4")).as("q4"), sum(col("nen")).as("nen"),
          sum(col("ne")).as("ne"), sum(col("ns")).as("ns"),
          max(col("mt")).as("mt"))
        // KMV(A ∪ B) = bottom-k of (bottom-k(A) ∪ bottom-k(B)):
        // explode both sketches, re-aggregate — mergeability is the
        // sketch's defining property. explode() of an empty sketch
        // emits no rows, so a group can vanish from `sketches` while
        // its counts live on in `nums`: the join must be a left join
        // with the empty sketch restored, or the merge silently drops
        // that group's state.
        val sketches = both
          .select(col("__g"), explode(col("fp_kmv")).as("__h"))
          .groupBy(col("__g")).agg(kmvAgg(col("__h")).as("fp_kmv"))
        nums.join(sketches, Seq("__g"), "left")
          .withColumn("fp_kmv", coalesce(col("fp_kmv"), emptySketch))
    }
    Scale.writeVersionedState(spark, path, merged)
  }

  /** Derive the long-format card from [[upsertDataCardState]] state.
    * Same metrics as [[dataCard]] with `pct_unique` →
    * `pct_unique_est` (the KMV estimate, rounded like the rest).
    */
  def dataCardFromState(spark: SparkSession, path: String,
      groupCol: String, kmvK: Int = 256): DataFrame = {
    val state = Scale.readVersionedState(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no data-card state at $path"))
    val hashSpace = 4294967296.0 // portableHash space: [0, 2^32)
    val uniq =
      when(size(col("fp_kmv")) < kmvK, size(col("fp_kmv")).cast("double"))
        .otherwise(lit((kmvK - 1).toDouble) * hashSpace /
          element_at(col("fp_kmv"), kmvK).cast("double"))
    state.select(col("__g").as(groupCol), explode(map(
      lit("avg_quality"),
      round(col("q4").cast("double") / 10000.0 / col("n"), 4),
      lit("max_doc_tokens"), col("mt").cast("double"),
      lit("n_docs"), col("n").cast("double"),
      lit("pct_email"), round(col("ne").cast("double") / col("n"), 4),
      lit("pct_en"), round(col("nen").cast("double") / col("n"), 4),
      lit("pct_short"), round(col("ns").cast("double") / col("n"), 4),
      lit("pct_unique_est"), round(uniq / col("n"), 4),
      lit("ws_tokens"), col("wt").cast("double"))).as(Seq("metric", "value")))
  }

  /** Diff two [[dataCard]] outputs — the release-to-release corpus
    * drift report ("what changed between yesterday's card and
    * today's"): full-outer join on (group, metric), absolute delta
    * and percent change per cell; a metric present on only one side
    * surfaces with a null partner (a new source appearing / an old
    * one vanishing IS the headline). O(groups × metrics) both sides —
    * the cards are already tiny.
    */
  def dataCardDiff(oldCard: DataFrame, newCard: DataFrame,
      groupCol: String): DataFrame =
    oldCard.withColumnRenamed("value", "old_value")
      .join(newCard.withColumnRenamed("value", "new_value"),
        Seq(groupCol, "metric"), "full_outer")
      .withColumn("delta",
        round(col("new_value") - col("old_value"), 4))
      .withColumn("pct_change",
        when(col("old_value").isNull || col("new_value").isNull ||
          col("old_value") === 0.0, lit(null).cast("double"))
          .otherwise(round((col("new_value") - col("old_value")) /
            abs(col("old_value")), 4)))

  /** PII patterns chosen to behave identically under Java regex and
    * RE2-family engines (no backrefs, no lookaround). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+\\d{1,3}-\\d{3}-\\d{4}"

  /** PII redaction: count and replace emails, IPv4 addresses and
    * +CC-NNN-NNNN phone numbers. Pure regexp expression chain —
    * codegen'd `regexp_replace`/`regexp_count`, map-only, pushes
    * nothing to the driver. Order matters and is fixed (email → ip →
    * phone) so counts are taken on the ORIGINAL text while each
    * replacement runs on the previous stage's output.
    * Returns the input columns plus n_emails, n_ips, n_phones,
    * redacted.
    */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, lit(EmailPattern), lit("<EMAIL>")),
          lit(Ipv4Pattern), lit("<IP>")),
        lit(PhonePattern), lit("<PHONE>"))
    df.withColumn("n_emails", regexp_count(t, lit(EmailPattern)))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Pattern)))
      .withColumn("n_phones", regexp_count(t, lit(PhonePattern)))
      .withColumn("redacted", redacted)
  }

  /** Deterministic global shuffle key for training-order export:
    * md5 of `"<seed>:<id>"`. A pure row property — the induced order
    * is reproducible on any cluster layout, stable under appends
    * (existing rows keep their position relative to each other), and
    * resumable (a reader can seek to a key range). Materialize the
    * order at scale with [[writeShuffled]]; never `orderBy` the whole
    * corpus to look at it.
    */
  def shuffleKey(idCol: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed), idCol.cast("string")))

  def withShuffleKey(df: DataFrame, idCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key", shuffleKey(col(idCol), seed))

  /** Materialized deterministic shuffle: range-repartition by the
    * shuffle key then sort within partitions — the scalable global
    * order (each output file is a contiguous key range; no single-
    * task global sort). Reading files in name order replays the
    * exact global permutation.
    */
  def writeShuffled(df: DataFrame, idCol: String, seed: String,
      path: String, partitions: Int = 0): Unit = {
    val keyed = withShuffleKey(df, idCol, seed)
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    keyed.repartitionByRange(parts, col("shuffle_key"))
      .sortWithinPartitions(col("shuffle_key"))
      .write.mode("overwrite").parquet(path)
  }

  /** Symmetric int8 quantization of a float embedding: per-vector
    * max-abs scale to [-127, 127]. 4× smaller vectors for ANN
    * shuffles/broadcasts, and the quantized dot product is EXACT
    * integer arithmetic — reproducible across engines and partition
    * orders (float summation is neither). The expression shape
    * (`round(cast(x as double) * 127.0 / mx)`) is chosen so an
    * oracle restating it computes bit-identical doubles.
    */
  def quantize(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x.cast("double"))))
    when(mx.isNull || mx === 0.0, transform(vec, _ => lit(0L)))
      .otherwise(transform(vec, x =>
        round(x.cast("double") * 127.0 / mx).cast("long")))
  }

  /** Exact integer dot product of two quantized vectors. */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Brute-force top-k over int8-quantized embeddings: quantization is
    * map-only, scoring is one codegen-friendly pass, and the top-k is
    * TakeOrderedAndProject (no global sort). The int8 score ranks a
    * 100 TB candidate pass at 4× less bandwidth; re-rank the survivors
    * with [[Similarity]]'s exact float path if full precision matters.
    */
  def quantizedKnn(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    // the distance scan is CPU-bound; floor the input parallelism so a
    // single-split local table doesn't serialize it on one core. The
    // query is quantized driver-side (same component formula as the
    // kernel) and rides the fused QuantizedDotQ expression — one
    // codegen'd loop per row instead of the interpreted
    // quantize()/quantizedDot() HOF composition (spec locks equality).
    val qQuant = quantizeDriver(query)
    Scale.parallelismFloor(corpus)
      .select(col(idCol), graft.functions.CatalystExpressions
        .quantizedDotQ(col(vecCol), qQuant).as("qdot"))
      .orderBy(col("qdot").desc, col(idCol))
      .limit(k)
  }

  /** Driver-side twin of the kernel's per-vector quantization (for
    * query literals): identical double arithmetic via the shared
    * [[graft.functions.ExprKernels.quantizeComponent]].
    */
  private[graft] def quantizeDriver(v: Seq[Float]): Array[Long] = {
    val mx = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x.toDouble)))
    if (mx == 0.0) Array.fill(v.length)(0L)
    else v.map(x => graft.functions.ExprKernels.quantizeComponent(x.toDouble, mx)).toArray
  }

  /** The standard export pipeline, composed in production order:
    *
    *  0. (opt-in, non-empty `badwords`) C4 dirty-word page gate
    *     ([[badwordFilter]]): drop any document containing a listed
    *     token — row-local, so it runs first and every later stage
    *     sees only clean pages;
    *  1. exact dedup — keep the lowest-id document per canonical
    *     fingerprint ([[TextFunctions.exactFingerprint]]);
    *  2. exact n-gram decontamination against `evalDocs`
    *     ([[ngramDecontaminate]], drop any train doc sharing
    *     ≥ `minShared` distinct `n`-grams with an eval doc);
    *  2.5 (opt-in, `maxSubstringDupFrac < 1`) substring-duplication
    *     gate: drop documents whose duplicated-span token coverage
    *     ([[Dedup.substringDupStats]], `substringWindow`-token
    *     windows, keep-first) exceeds the cap;
    *  3. PII redaction ([[piiRedact]]);
    *  4. token-length filter on the REDACTED text;
    *  5. domain-mixture resampling to `targets` proportions
    *     ([[TextOps.mixtureResample]], portable hash).
    *
    * Returns the surviving rows plus `n_tok` (redacted-token count).
    * Every stage is deterministic, so two runs over the same corpus
    * produce byte-identical exports (q77's oracle proves the whole
    * composition against an independent engine). Scale shape: stages
    * 1–2 are the only shuffles (fingerprint window + gram equi-join);
    * 3–5 are map-side (the mixture rates are a driver-fitted literal
    * map — #strata values). Under the default `maxGramDf` (no hot-gram
    * cap) stages 1 and 2 EXECUTE in the reverse of their logical
    * order — provably result-identical there (see the inline comment)
    * and it halves the fingerprint shuffle; a finite `maxGramDf` keeps
    * the logical order so gram document frequency is counted over
    * DEDUPED documents, exactly as the stage list reads.
    */
  def exportPipeline(train: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, strataCol: String, targets: Map[String, Double],
      n: Int = 5, minShared: Int = 3, minTokens: Long = 10,
      maxTokens: Long = 5000, seed: String = "mix77",
      maxGramDf: Int = Int.MaxValue,
      maxSubstringDupFrac: Double = 1.0,
      substringWindow: Int = 50,
      badwords: Seq[String] = Nil): DataFrame = {
    require(maxSubstringDupFrac > 0 && maxSubstringDupFrac <= 1.0,
      s"maxSubstringDupFrac must be in (0,1]: $maxSubstringDupFrac")
    // Stage 0 (opt-in): the C4 dirty-word page gate — map-only, zero
    // extra shuffles; applied to the raw frame so every later stage
    // sees only clean pages (C4's own order: page removal precedes
    // dedup). Disabled (the default) adds zero work.
    val train0 =
      if (badwords.isEmpty) train
      else badwordFilter(train, textCol, badwords)
        .filter(col("pass_badwords"))
        .drop("n_badwords", "pass_badwords")
    // Job-count discipline (the q53/q77 treatment): ONE lazy
    // localCheckpoint of the post-redaction survivors, materialized by
    // mixtureResample's single countByValue rates fit; the returned
    // frame is then a map-only selection over the same checkpoint.
    // Stages 1-4 therefore execute exactly ONCE (the previous form
    // checkpointed two id lists and re-ran the redaction tail twice —
    // two extra actions, a second full PII/token scan, and a
    // broadcast job per re-join). The checkpoint holds the SURVIVOR
    // rows (post-dedup, post-decontam, post-length-gate) on
    // executor-local storage — disk-spillable, bounded by the
    // surviving fraction of the corpus, i.e. the same order as one
    // shuffle of the export itself.
    //
    // Under the DEFAULT maxGramDf (no hot-gram cap), decontamination
    // runs FIRST, then the fingerprint dedup — a pure execution
    // reorder: equal fingerprints mean equal normalized text (md5 of
    // lowercased whitespace-normalized text), hence equal token
    // streams, hence the same gram overlap with eval — so every
    // member of a fingerprint class shares one contamination verdict
    // and the surviving (min-id) winner per class is identical either
    // way. Dedup-first consumed the windowed frame TWICE (gram side
    // pruned to (id, text), anti side keeping all columns — different
    // projections defeat exchange reuse, so the full-text fingerprint
    // shuffle ran double); decontaminate-first is a linear chain and
    // the window shuffles once, post-filter.
    //
    // With a FINITE maxGramDf the reorder is NOT result-identical:
    // gram document frequency would then be counted over duplicate
    // documents, so a duplicate-heavy gram could cross the cap and be
    // exempted from the contamination join — contaminated documents
    // surviving that dedup-first would drop. That case keeps the
    // logical order: dedup first, decontaminate the deduped frame
    // (DF counted over distinct documents), paying the second
    // fingerprint shuffle for exact capped semantics.
    //
    // no .distinct() on the contaminated side: a left_anti probe is
    // indifferent to duplicate build keys, and the distinct would add
    // an exchange. The contaminated-id list is broadcast explicitly:
    // it is small by construction (docs sharing >= minShared distinct
    // n-grams with the eval suite), and without the hint the
    // anti-join's initial AQE plan exchanges BOTH sides on the id —
    // re-shuffling the whole corpus to drop a sliver of it.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(col(idCol))
    def dedupFp(df: DataFrame): DataFrame = df
      .withColumn("__fp", TextFunctions.exactFingerprint(col(textCol)))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__fp", "__rk")
    val kept =
      if (maxGramDf == Int.MaxValue) {
        val contaminated = ngramDecontaminate(train0, evalDocs, idCol, textCol,
            n, minShared, maxGramDf)
          .select(col("train_id").as(idCol))
        dedupFp(train0.join(broadcast(contaminated), Seq(idCol), "left_anti"))
      } else {
        val deduped = dedupFp(train0)
        val contaminated = ngramDecontaminate(deduped, evalDocs, idCol, textCol,
            n, minShared, maxGramDf)
          .select(col("train_id").as(idCol))
        deduped.join(broadcast(contaminated), Seq(idCol), "left_anti")
      }
    // Optional stage 2.5 — substring-duplication gate (opt-in,
    // maxSubstringDupFrac < 1): drop documents whose duplicated-span
    // token coverage (Dedup.substringDupStats over the post-dedup,
    // post-decontamination survivors; keep-first, so the corpus-first
    // copy of a span never counts against its own document) exceeds
    // the cap — the ExactSubstr complement of the whole-document
    // stages: a doc assembled from text seen elsewhere dies here even
    // though no single fingerprint or gram count catches it. Offender
    // lists are small by construction and broadcast into the
    // anti-join; disabled (the default) adds zero work.
    val gated =
      if (maxSubstringDupFrac >= 1.0) kept
      else {
        val offenders = Dedup.substringDupStats(kept, idCol, textCol,
            windowTokens = substringWindow, minCount = 2, keepFirst = true)
          .filter(col("dup_frac") > maxSubstringDupFrac)
          .select(col(idCol))
        kept.join(broadcast(offenders), Seq(idCol), "left_anti")
      }
    // The redaction+token chain is CPU-heavy per byte; after the
    // window-dedup exchange AQE coalesces the (small-in-bytes) frame
    // below core count and the chain runs near-serial — floor the
    // parallelism from the size ESTIMATE (identity at real scale,
    // where the estimate clears the threshold; measured 855 ms
    // single-task → ~80 ms spread at sf0.1).
    val survivors = piiRedact(Scale.parallelismFloorBySize(gated), textCol)
      .withColumn("n_tok", TextFunctions.tokenCount(col("redacted")).cast("long"))
      .filter(col("n_tok").between(minTokens, maxTokens))
      .localCheckpoint(false)
    TextOps.mixtureResample(survivors, strataCol, idCol, targets, seed)
  }

  /** The INCREMENTAL (streaming) form of the export filter: PII
    * redaction + token-length gate + mixture selection with
    * PRE-FITTED per-stratum rates — a stream cannot count its strata
    * ahead of time, so the rates come from a batch fit over the
    * existing corpus (the `__rate` column of
    * [[TextOps.mixtureResample]]'s derivation, or any policy table).
    * Every stage is row-local, so the same call runs identically on a
    * batch frame or a `readStream` frame (StreamingSpec diffs the
    * two), and the hash selection keeps the export append-stable:
    * rows already exported never flip when the stream grows. Strata
    * without a rate are dropped.
    */
  def exportFilterWithRates(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, rates: Map[String, Double], seed: String = "mix77",
      minTokens: Long = 10, maxTokens: Long = 5000): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1),
      s"rates must be in [0,1]: $rates")
    val rateCol = element_at(
      map(rates.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
      col(strataCol).cast("string"))
    piiRedact(df, textCol)
      .withColumn("n_tok", TextFunctions.tokenCount(col("redacted")).cast("long"))
      .filter(col("n_tok").between(minTokens, maxTokens))
      .withColumn("__rate", rateCol)
      .filter(col("__rate").isNotNull &&
        TextOps.portableHash(col(idCol), seed) < col("__rate") * lit(4294967296.0))
      .drop("__rate")
  }

  /** Two-stage ANN: int8-quantized candidate generation (cheap scan,
    * 4× less bandwidth) → exact float cosine re-rank of the
    * `candidateFactor × k` survivors only. The standard
    * quantize-then-rerank trade: full-precision scoring cost shrinks
    * from O(corpus) to O(k), and the quantized pass loses recall only
    * where int8 resolution can't separate neighbors — which the
    * oversampled candidate pool absorbs (the spec measures recall
    * against exact brute force).
    */
  def quantizedKnnRerank(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, candidateFactor: Int = 4): DataFrame = {
    require(candidateFactor >= 1, s"candidateFactor must be >= 1: $candidateFactor")
    val candidates = quantizedKnn(corpus, idCol, vecCol, query, k * candidateFactor)
      .select(col(idCol))
    Similarity.knnBrute(
      corpus.join(candidates, Seq(idCol), "left_semi"),
      idCol, vecCol, query.map(_.toDouble).toArray, k)
  }

  /** A fitted add-one-smoothed bigram language model: unigram counts
    * (conditioning denominators), bigram counts, and the reference
    * vocabulary size V. All counts are integers, so the model — and
    * every score derived from it — is exactly reproducible in any
    * engine. Serializable; rides inside the scoring expression
    * ([[graft.functions.CatalystExpressions.BigramLogProbSum]]).
    */
  case class BigramLm(uni: Map[String, Long], big: Map[(String, String), Long],
      vocabSize: Long)

  /** Fit a [[BigramLm]] on a reference corpus — the CCNet recipe
    * (train a small LM on a trusted corpus, score the crawl by
    * perplexity under it). Tokenization is [[TextFunctions.tokens]];
    * bigram identity reuses [[wordNgrams]] (tokens never contain
    * spaces, so the joined gram splits back unambiguously).
    *
    * Scale: the fit shuffles only the REFERENCE corpus (two count
    * aggregates — the trusted slice is small by construction; the
    * 100 TB crawl is never touched here), and the driver collect is
    * bounded by `maxUnigrams`/`maxBigrams` — over-cap tails are
    * dropped in deterministic (count desc, gram) order and simply
    * score as unseen, which add-one smoothing already handles.
    * `vocabSize` stays the FULL distinct-unigram count (a scalar)
    * regardless of the cap.
    */
  def fitBigramLm(ref: DataFrame, textCol: String,
      maxUnigrams: Int = 1 << 20, maxBigrams: Int = 1 << 22): BigramLm = {
    // floor the tokenize scan's parallelism (single-split local input
    // would serialize it; no-op at scale — same guard as fitDsir)
    val src = Scale.parallelismFloor(ref)
    val tk = src.select(TextFunctions.tokens(col(textCol)).as("__tk"))
    val uniDf = tk.select(explode(col("__tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // vocabSize (ALL distinct words, not just the kept top-K) rides
    // the same action as the top-K collect via an observation — the
    // TakeOrdered consumes every aggregate row, so the observed count
    // is exact and the separate count() job disappears
    val vocabObs = org.apache.spark.sql.Observation()
    val uni = uniDf.observe(vocabObs, count(lit(1)).as("n"))
      .orderBy(desc("c"), col("w")).limit(maxUnigrams)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabSize = vocabObs.get("n").asInstanceOf[Long]
    val big = src.select(explode(wordNgrams(col(textCol), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("g")).limit(maxBigrams)
      .collect().map { r =>
        val Array(w1, w2) = r.getString(0).split(" ", 2)
        (w1, w2) -> r.getLong(1)
      }.toMap
    BigramLm(uni, big, vocabSize)
  }

  /** Per-document perplexity under a fitted [[BigramLm]] — the
    * quality-filter signal CCNet/Gopher pipelines threshold on (junk
    * and boilerplate score high; fluent reference-like text scores
    * low). Adds `n_bigrams` and `ppl = exp(−mean bigram log-prob)`;
    * documents with fewer than 2 tokens have no bigrams and are
    * excluded. The per-document log-prob sum is integer-scaled inside
    * the kernel (order-independent — see
    * [[graft.functions.ExprKernels.bigramLogProbSum]]), so `ppl` is
    * bit-stable under any partitioning and restatable in oracle SQL.
    *
    * Scale: scoring is a map-only projection over the corpus — the
    * model rides in the expression (one broadcast per executor), ZERO
    * shuffles; a downstream threshold filter stays on the scan.
    */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
      lm: BigramLm): DataFrame = {
    import graft.functions.CatalystExpressions
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col(idCol),
        (size(col("__tk")) - 1).cast("long").as("n_bigrams"),
        CatalystExpressions.bigramLogProbSum(
          col("__tk"), lm.uni, lm.big, lm.vocabSize).as("lp_sum"))
      .withColumn("ppl",
        exp(-(col("lp_sum").cast("double") / lit(1e6)) / col("n_bigrams")))
  }

  /** A fitted DSIR model: per-bucket integer-scaled log importance
    * ratios `round(ln(p_target(b)/p_raw(b)) · 1e6)` over hashed
    * unigram+bigram features (add-one smoothing over buckets on both
    * sides). One long per bucket — a 4096-bucket model is 32 KB.
    */
  case class DsirModel(logRatios: Array[Long], numBuckets: Int)

  /** Hashed features for the DSIR fit, Column-side: unigrams plus
    * adjacent-pair bigrams (space-joined), exactly the feature set the
    * scoring kernel walks.
    */
  private def dsirFeatures(text: Column): Column =
    concat(TextFunctions.tokens(text), wordNgrams(text, 2))

  private def dsirBucket(f: Column, numBuckets: Int): Column =
    TextOps.portableHash(f, "dsir") % numBuckets

  /** Fit DSIR (Data Selection via Importance Resampling, Xie et al.
    * 2023) importance weights: hash every unigram/bigram occurrence of
    * the target ("what I want more of") and raw ("what I have")
    * corpora into `numBuckets` md5 buckets, and keep one
    * integer-scaled log-ratio per bucket. The hash is the md5-based
    * [[TextOps.portableHash]] (seed "dsir"), so the whole fit is
    * restatable in any md5-capable engine — the oracle refits it.
    *
    * Scale: two bucket-count aggregates (the only shuffles — and the
    * target corpus is small by construction); the collected state is
    * `numBuckets` longs per side regardless of corpus size.
    */
  def fitDsir(target: DataFrame, raw: DataFrame, textCol: String,
      numBuckets: Int = 4096): DsirModel = {
    require(numBuckets >= 2, s"numBuckets must be >= 2: $numBuckets")
    // Both sides' bucket histograms in ONE action (side-tagged union →
    // one shuffle, one collect of <= 2·numBuckets rows) — the
    // two-action form spent a separate scan/shuffle/collect job chain
    // per side. The explode+md5 scan is CPU-bound; floor the input
    // parallelism (a tiny local table is ONE parquet split — at real
    // scale the scan already has file-split parallelism, a no-op).
    def side(df: DataFrame, tag: Int): DataFrame =
      Scale.parallelismFloor(df)
        .select(explode(dsirFeatures(col(textCol))).as("f"))
        .select(lit(tag).as("__side"), dsirBucket(col("f"), numBuckets).as("b"))
    val counts = side(target, 0).unionAll(side(raw, 1))
      .groupBy(col("__side"), col("b")).agg(count(lit(1)).as("c"))
      .collect()
    val tc = new Array[Long](numBuckets)
    val rc = new Array[Long](numBuckets)
    var tn = 0L
    var rn = 0L
    counts.foreach { r =>
      val c = r.getLong(2)
      if (r.getInt(0) == 0) { tc(r.getLong(1).toInt) = c; tn += c }
      else { rc(r.getLong(1).toInt) = c; rn += c }
    }
    val lr = Array.tabulate(numBuckets) { b =>
      graft.functions.ExprKernels.roundHalfAway(math.log(
        ((tc(b) + 1.0) / (tn + numBuckets)) /
          ((rc(b) + 1.0) / (rn + numBuckets))) * 1e6)
    }
    DsirModel(lr, numBuckets)
  }

  /** Per-document DSIR log importance weight: the sum of the model's
    * log-ratios over every feature occurrence — positive means the
    * document looks more like the target corpus than the raw one.
    * Adds `n_features` (unigrams + bigrams) and `logw` (the scaled sum
    * ÷ 1e6). Documents with no tokens are excluded. Map-only over the
    * corpus — the 32 KB ratio table rides in the expression, ZERO
    * shuffles (the [[perplexity]] scale shape).
    */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
      model: DsirModel): DataFrame = {
    import graft.functions.CatalystExpressions
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 1)
      .select(col(idCol),
        (size(col("__tk")) * 2 - 1).cast("long").as("n_features"),
        CatalystExpressions.dsirLogRatioSum(
          col("__tk"), model.logRatios, model.numBuckets).as("lr_sum"))
      .withColumn("logw", col("lr_sum").cast("double") / lit(1e6))
  }

  /** [[perplexity]]'s score as a single Column over a token array
    * (caller guarantees `size(tk) >= 2`) — identical expression tree
    * to the DataFrame form, so compositions (q85's combined quality
    * gate) can score several signals in ONE projection of one scan
    * instead of joining per-signal frames on the id.
    */
  def pplCol(tk: Column, lm: BigramLm): Column = {
    import graft.functions.CatalystExpressions
    exp(-(CatalystExpressions.bigramLogProbSum(tk, lm.uni, lm.big, lm.vocabSize)
      .cast("double") / lit(1e6)) / (size(tk) - 1).cast("long"))
  }

  /** [[dsirScore]]'s `logw` as a single Column over a token array
    * (caller guarantees `size(tk) >= 1`) — the composition twin of
    * [[pplCol]].
    */
  def logwCol(tk: Column, model: DsirModel): Column = {
    import graft.functions.CatalystExpressions
    CatalystExpressions.dsirLogRatioSum(tk, model.logRatios, model.numBuckets)
      .cast("double") / lit(1e6)
  }

  /** Persist a fitted [[BigramLm]] as parquet artifacts (`uni/`,
    * `big/`, `meta/` under `path`) — the fit-once/score-everywhere
    * discipline of [[CorpusIndex]]: a CCNet-style reference model is
    * corpus metadata, refit only when the reference corpus changes,
    * and any later session (or another engine reading the parquet)
    * scores with it.
    */
  def saveBigramLm(spark: org.apache.spark.sql.SparkSession, lm: BigramLm,
      path: String): Unit = {
    import spark.implicits._
    lm.uni.toSeq.toDF("w", "c")
      .repartition(1).write.mode("overwrite").parquet(s"$path/uni")
    lm.big.toSeq.map { case ((w1, w2), c) => (w1, w2, c) }
      .toDF("w1", "w2", "c")
      .repartition(1).write.mode("overwrite").parquet(s"$path/big")
    Seq(lm.vocabSize).toDF("vocab_size")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadBigramLm(spark: org.apache.spark.sql.SparkSession,
      path: String): BigramLm = {
    val uni = spark.read.parquet(s"$path/uni").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = spark.read.parquet(s"$path/big").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val v = spark.read.parquet(s"$path/meta").collect().head.getLong(0)
    BigramLm(uni, big, v)
  }

  /** Persist/load a fitted [[DsirModel]] (`ratios/` + the bucket count
    * riding in the row count) — same discipline as [[saveBigramLm]].
    */
  def saveDsir(spark: org.apache.spark.sql.SparkSession, model: DsirModel,
      path: String): Unit = {
    import spark.implicits._
    model.logRatios.toSeq.zipWithIndex.map { case (lr, b) => (b, lr) }
      .toDF("b", "lr")
      .repartition(1).write.mode("overwrite").parquet(s"$path/ratios")
  }

  def loadDsir(spark: org.apache.spark.sql.SparkSession,
      path: String): DsirModel = {
    val rows = spark.read.parquet(s"$path/ratios").collect()
    val arr = new Array[Long](rows.length)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    DsirModel(arr, rows.length)
  }

  /** A fitted Naive-Bayes quality classifier: per-token integer-scaled
    * log-odds `round(ln(P(w|pos)/P(w|neg)) · 1e6)` under Laplace
    * smoothing (the GPT-3 / CCNet quality-filter recipe — fit a cheap
    * linear classifier to separate a trusted corpus from raw crawl,
    * then threshold the crawl on its score; Brown et al. 2020 App. A,
    * Wenzek et al. 2019). `oovLogOdds` is the score of any token
    * outside the (possibly capped) vocabulary — the zero-count
    * smoothed ratio, so capping the vocab only coarsens, never skews,
    * the tail. `priorLogOdds` is the smoothed document-count prior.
    */
  case class NbModel(logOdds: Map[String, Long], oovLogOdds: Long,
      priorLogOdds: Long)

  /** Fit an [[NbModel]] from a positive (trusted/target) and negative
    * (raw) corpus. Tokenization is [[TextFunctions.tokens]]; counts
    * are per-occurrence (multinomial NB).
    *
    * Scale: ONE action — both sides' per-token class counts in a
    * single side-tagged union aggregate (one shuffle; the labeled fit
    * set is small by construction, the 100 TB crawl is only ever
    * SCORED, map-only). The driver collect is bounded by `maxVocab`;
    * over-cap tokens are dropped in deterministic (total count desc,
    * token) order and score as OOV. Vocabulary size, total occurrence
    * counts, and per-side document counts ride the same action as
    * `Observation`s, so no separate count jobs run.
    */
  def fitNbQuality(pos: DataFrame, neg: DataFrame, textCol: String,
      maxVocab: Int = 1 << 20): NbModel = {
    import org.apache.spark.sql.Observation
    val posDocs = Observation()
    val negDocs = Observation()
    val statsObs = Observation()
    def side(df: DataFrame, obs: Observation, tag: Int): DataFrame =
      Scale.parallelismFloor(df)
        .observe(obs, count(lit(1)).as("docs"))
        .select(explode(TextFunctions.tokens(col(textCol))).as("w"),
          lit(tag).as("__side"))
    val kept = side(pos, posDocs, 0).unionAll(side(neg, negDocs, 1))
      .groupBy(col("w"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("cp"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("cn"))
      .observe(statsObs, count(lit(1)).as("v"),
        sum(col("cp")).as("np"), sum(col("cn")).as("nn"))
      .orderBy((col("cp") + col("cn")).desc, col("w"))
      .limit(maxVocab)
      .collect()
    def scalar(obs: Observation, name: String): Long =
      Option(obs.get(name)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val v = scalar(statsObs, "v")
    val np = scalar(statsObs, "np")
    val nn = scalar(statsObs, "nn")
    val dp = scalar(posDocs, "docs")
    val dn = scalar(negDocs, "docs")
    def lo(cp: Long, cn: Long): Long =
      graft.functions.ExprKernels.roundHalfAway(math.log(
        ((cp + 1.0) / (np + v)) / ((cn + 1.0) / (nn + v))) * 1e6)
    NbModel(
      kept.map(r => r.getString(0) -> lo(r.getLong(1), r.getLong(2))).toMap,
      lo(0L, 0L),
      graft.functions.ExprKernels.roundHalfAway(
        math.log((dp + 1.0) / (dn + 1.0)) * 1e6))
  }

  /** Per-document NB quality score: `(prior + Σ logOdds(token)) / 1e6`
    * — positive means the document looks more like the positive
    * (trusted) corpus. Adds `n_tokens` and `nb_score`; documents with
    * no tokens are excluded. Map-only over the corpus — the capped
    * vocabulary table rides in the expression, ZERO shuffles (the
    * [[perplexity]]/[[dsirScore]] scale shape).
    */
  def nbScore(df: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    import graft.functions.CatalystExpressions
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 1)
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        CatalystExpressions.tokenLogOddsSum(
          col("__tk"), model.logOdds, model.oovLogOdds).as("lo_sum"))
      .withColumn("nb_score",
        (col("lo_sum") + lit(model.priorLogOdds)).cast("double") / lit(1e6))
  }

  /** [[nbScore]]'s score as a single Column over a token array — the
    * composition twin of [[pplCol]]/[[logwCol]], so a combined quality
    * gate can score all three signals in ONE projection of one scan.
    */
  def nbScoreCol(tk: Column, model: NbModel): Column = {
    import graft.functions.CatalystExpressions
    (CatalystExpressions.tokenLogOddsSum(tk, model.logOdds, model.oovLogOdds) +
      lit(model.priorLogOdds)).cast("double") / lit(1e6)
  }

  /** Persist/load a fitted [[NbModel]] — same fit-once/score-everywhere
    * discipline as [[saveBigramLm]]/[[saveDsir]].
    */
  def saveNb(spark: org.apache.spark.sql.SparkSession, model: NbModel,
      path: String): Unit = {
    import spark.implicits._
    model.logOdds.toSeq.toDF("w", "lo")
      .repartition(1).write.mode("overwrite").parquet(s"$path/logodds")
    Seq((model.oovLogOdds, model.priorLogOdds)).toDF("oov", "prior")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadNb(spark: org.apache.spark.sql.SparkSession,
      path: String): NbModel = {
    val lo = spark.read.parquet(s"$path/logodds").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = spark.read.parquet(s"$path/meta").collect().head
    NbModel(lo, m.getLong(0), m.getLong(1))
  }

  /** DSIR's Gumbel top-k resampling step, deterministic: rank by
    * `logw + Gumbel(0,1)` where the Gumbel draw derives from
    * [[TextOps.portableHash]] of the document id
    * (`u = (h + 0.5) / 2^32`, `g = −ln(−ln u)`) — sampling without
    * replacement proportional to importance weight, reproducible on
    * any partitioning. Top-k is a TakeOrderedAndProject, never a
    * global sort.
    */
  def dsirSample(scored: DataFrame, idCol: String, k: Int,
      seed: String = "gumbel"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val u = (TextOps.portableHash(col(idCol), seed) + lit(0.5)) /
      lit(4294967296.0)
    scored.withColumn("__g", col("logw") + -log(-log(u)))
      .orderBy(desc("__g"), col(idCol))
      .limit(k)
      .drop("__g")
  }

  /** CCNet-style line-level boilerplate removal (Wenzek et al. 2019
    * §4.1 dedups at the line/paragraph grain; the reference's crawl
    * ingestion, `web_scrape_tool.py`, returns page text that carries
    * exactly this nav/footer noise): a line is boilerplate when it
    * appears in at least `minDocFreq` DISTINCT documents, and every
    * occurrence of a boilerplate line is removed from every document,
    * preserving the order of surviving lines. Lines compare EXACTLY
    * (raw `\n`-split segments, no trimming/lowering) so the relational
    * definition restates verbatim in the oracle engine.
    *
    * Returns `(idCol, clean_text, n_removed)` — one row per input
    * document (a document whose every line is boilerplate survives
    * with `clean_text = ""`).
    *
    * Scale: pass 1 is one shuffle — the line document-frequency
    * aggregate (map-side partial on (line, id)). The boilerplate SET
    * is small by construction: at most `totalLines / minDocFreq`
    * distinct lines, so with the production-scale thresholds (100+)
    * it is ≤1% of distinct lines. Pass 2 exploits that:
    *  - `nBoiler <= maxBroadcastLines` (the common case): the set is
    *    collected (bounded by the cap) and rides a codegen'd
    *    [[graft.functions.CatalystExpressions.FilterNotInSet]]
    *    expression as a hash-set reference object — the rewrite is a
    *    MAP-ONLY fused projection with O(1) membership per line, no
    *    second shuffle, no reassembly aggregate. (Micro-bench, 20k
    *    docs × 60 lines, local[32]: warm rewrite is ~0.15–0.6 s FLAT
    *    across |boiler| = 100 → 100k; the previous `array_contains`
    *    -over-broadcast-array form was O(|boiler|) per line — 0.3 s at
    *    |boiler|=100 but ~19 s at 10k.)
    *  - otherwise (or `forceJoinPath`, which the spec uses to lock
    *    path equivalence): explode → anti-join on the line →
    *    order-preserving reassembly, all equi-hash operations.
    * Same hybrid discipline as [[Dedup.connectedComponents]]'s
    * driver/iterative split.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minDocFreq: Int, forceJoinPath: Boolean = false,
      maxBroadcastLines: Int = 100000): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2: $minDocFreq")
    val splitLines = split(col(textCol), "\n")
    val lines = df.select(col(idCol),
      posexplode(splitLines).as(Seq("pos", "line")))
    val boiler = lines.groupBy("line")
      .agg(countDistinct(col(idCol)).as("line_df"))
      .filter(col("line_df") >= minDocFreq)
      .select("line")
    // one bounded action decides the path AND fetches the set: ≤cap+1
    // rows of boilerplate lines (each seen in ≥minDocFreq docs, so the
    // set is ≤ totalLines/minDocFreq distinct lines by construction)
    val collected = boiler.limit(maxBroadcastLines + 1).collect().map(_.getString(0))
    val useBroadcast = !forceJoinPath && collected.length <= maxBroadcastLines
    if (useBroadcast) {
      // fitted-model shape: the set rides the codegen'd expression as
      // a reference object — map-only rewrite, O(1) membership per
      // line (array_contains over a collected array was O(|boiler|))
      val keptArr = graft.functions.CatalystExpressions
        .filterNotInSet(splitLines, collected.toIndexedSeq)
      df.select(col(idCol),
          array_join(keptArr, "\n").as("clean_text"),
          (size(splitLines) - size(keptArr)).cast("long").as("n_removed"))
    } else {
      val kept = lines.join(boiler, Seq("line"), "left_anti")
        .groupBy(idCol)
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n").as("clean_text"),
          count(lit(1)).as("n_kept"))
      df.select(col(idCol), size(splitLines).cast("long").as("n_total"))
        .join(kept, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          (col("n_total") - coalesce(col("n_kept"), lit(0L)))
            .as("n_removed"))
    }
  }
}
