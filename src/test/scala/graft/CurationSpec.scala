package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta IOTA"), // shares 3 distinct 5-grams with 1
    (3L, "totally different words with zero overlap whatsoever"),
    (4L, "short doc"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("wordNgrams: sliding windows, short docs contribute none") {
    val out = docs.select(col("doc_id"),
        Curation.wordNgrams(col("text"), 5).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).length == 4) // 8 tokens -> 4 five-grams
    assert(out(1L).head == "alpha beta gamma delta epsilon")
    assert(out(4L).isEmpty && out(5L).isEmpty)
  }

  test("ngramDecontaminate finds the planted train/eval overlap only") {
    val train = docs.filter(col("doc_id") % 2 === 1)
    val eval = docs.filter(col("doc_id") % 2 === 0)
    val hits = Curation.ngramDecontaminate(train, eval, "doc_id", "text",
        n = 5, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq == Seq((1L, 2L, 3L))) // 5-grams at offsets 1..3 survive the IOTA edit
  }

  test("ngramDecontaminate: maxGramDf drops boilerplate grams") {
    val boiler = "terms of service apply to all"
    val train = (1L to 6L).map(i => (i, s"$boiler document number $i")).toDF("doc_id", "text")
    val eval = (11L to 16L).map(i => (i, s"$boiler evaluation row $i")).toDF("doc_id", "text")
    val uncapped = Curation.ngramDecontaminate(train, eval, "doc_id", "text", n = 5)
    assert(uncapped.count() == 36) // boilerplate gram crosses every pair
    val capped = Curation.ngramDecontaminate(train, eval, "doc_id", "text",
      n = 5, maxGramDf = 4)
    assert(capped.count() == 0)
  }

  test("repetitionMetrics: run-length bigram mode equals the definition") {
    val d = Seq(
      (1L, "a b a b a b"),          // bigrams: ab,ba,ab,ba,ab -> top "a b" 3/5; dup words 4/6
      (2L, "x y z"),                // all distinct
      (3L, "w"),                    // no bigrams
      (4L, "")
    ).toDF("doc_id", "text")
    val m = Curation.repetitionMetrics(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(1L) == ((6L, 4.0 / 6.0, 3.0 / 5.0)))
    assert(m(2L) == ((3L, 0.0, 0.5))) // 2 distinct bigrams -> mode 1 of 2
    assert(m(3L) == ((1L, 0.0, 0.0)))
    assert(m(4L) == ((0L, 0.0, 0.0)))
  }

  test("piiRedact counts and replaces emails, IPs, phones") {
    val d = Seq(
      (1L, "mail a.b@x.io and c@y.co from 10.0.0.1 call +1-555-1234"),
      (2L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val out = Curation.piiRedact(d, "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_ips"),
          r.getAs[Int]("n_phones"), r.getAs[String]("redacted")))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "mail <EMAIL> and <EMAIL> from <IP> call <PHONE>")
    assert(out(2L) == ((0, 0, 0, "clean text with no pii at all")))
  }

  test("shuffle key is a pure row property: same key under any partitioning") {
    val a = Curation.withShuffleKey(docs, "doc_id", "s1")
      .select("doc_id", "shuffle_key").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Curation.withShuffleKey(docs.repartition(7), "doc_id", "s1")
      .select("doc_id", "shuffle_key").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    val c = Curation.withShuffleKey(docs, "doc_id", "s2")
      .select("shuffle_key").collect().map(_.getString(0)).toSet
    assert(c.intersect(a.map(_._2)) == Set.empty) // different seed, different order
  }

  test("writeShuffled materializes a contiguous global order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shuffle").toString
    Curation.writeShuffled(docs, "doc_id", "seed", s"$dir/out", partitions = 3)
    val back = spark.read.parquet(s"$dir/out")
    // reading part files in name order must replay the sorted key order
    // (range partition i holds keys below range partition i+1's)
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    val keys = files.flatMap(f =>
      spark.read.parquet(f).select("shuffle_key").collect().map(_.getString(0)))
    assert(keys.toSeq == keys.toSeq.sorted)
    assert(back.count() == docs.count())
  }

  test("quantize: [-127,127] symmetric, zero vector safe, dot is exact integer") {
    val d = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = d.select(col("vec_id"), Curation.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(q(1L) == Seq(127L, -64L, 32L)) // round(63.5)=64 away from zero, round(31.75)=32
    assert(q(2L) == Seq(0L, 0L, 0L))
  }

  test("quantizedKnn survives non-finite embedding components (scores them 0)") {
    // a NaN/Infinity component made quantizeComponent throw
    // NumberFormatException out of BigDecimal.valueOf and kill the
    // whole scan; it must quantize to 0 (Spark round's
    // NaN/Infinite pass-through + long cast) and score harmlessly
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(Float.NaN, 0.5f)),
      (3L, Array(Float.PositiveInfinity, 1.0f)),
      (4L, Array(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val top = Curation.quantizedKnn(corpus, "vec_id", "embedding",
      Seq(1.0f, 0.0f), 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top.map(_._1) == Seq(1L, 4L, 2L, 3L), s"got $top")
    // the corrupt rows score 0, not NaN-poisoned or crashed
    assert(top.filter(t => t._1 == 2L || t._1 == 3L).forall(_._2 == 0L), s"got $top")
  }

  test("quantizedDotQ kernel equals the composed quantize/dot form on the corpus") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 3).select(col("embedding"))
      .head().getSeq[Float](0)
    val qLit = array(query.map(lit(_)): _*)
    val composed = Curation.quantizedDot(
      Curation.quantize(col("embedding")), Curation.quantize(qLit))
    val fused = graft.functions.CatalystExpressions.quantizedDotQ(
      col("embedding"), Curation.quantizeDriver(query))
    val diff = emb.select(composed.as("a"), fused.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0, "fused kernel must match the composed HOF form exactly")
  }

  test("quantizedKnnRerank recovers the exact top-k on the sf corpus") {
    val emb = graft.core.Engine.table(spark, sfDir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val exact = graft.operators.Similarity.knnBrute(corpus, "vec_id", "embedding",
      query.map(_.toDouble).toArray, 10).collect().map(_.getLong(0)).toSet
    val reranked = Curation.quantizedKnnRerank(corpus, "vec_id", "embedding",
      query, 10, candidateFactor = 4).collect().map(_.getLong(0)).toSet
    // int8 resolution + 4x oversampling: expect (near-)perfect recall
    assert(exact.intersect(reranked).size >= 9,
      s"rerank recall too low: $reranked vs $exact")
  }

  test("mixtureResample hits target proportions, scarcest stratum kept whole") {
    import org.apache.spark.sql.functions.count
    val d = (0L until 3000L).map(i =>
      (i, if (i % 6 < 3) "web" else if (i % 6 < 5) "code" else "books"))
      .toDF("id", "src") // 1500 web, 1000 code, 500 books
    val out = graft.operators.TextOps.mixtureResample(
      d, "src", "id", Map("web" -> 0.4, "code" -> 0.3, "books" -> 0.3))
    val by = out.groupBy(col("src")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // books is scarcest (500/0.3 ≈ 1667 = N): kept whole
    assert(by("books") == 500L)
    // web ≈ N*0.4 ≈ 667, code ≈ N*0.3 = 500 — hash noise ≤ ~10%
    assert(math.abs(by("web") - 667L) < 70, s"web=${by("web")}")
    assert(math.abs(by("code") - 500L) < 60, s"code=${by("code")}")
    // deterministic under repartitioning: same selected id set
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = graft.operators.TextOps.mixtureResample(
        d.repartition(13), "src", "id", Map("web" -> 0.4, "code" -> 0.3, "books" -> 0.3))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("tokenShift: closed-form KL terms, Gibbs non-negativity of the total") {
    val a = Seq((1L, "x x y")).toDF("id", "text")
    val b = Seq((2L, "x z")).toDF("id", "text")
    val got = Curation.tokenShift(a, b, "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    // union vocab {x,y,z}, Na=3, Nb=2, V=3 → pa = (c+1)/6, pb = (c+1)/5
    def term(ca: Long, cb: Long): Double = {
      val pa = (ca + 1).toDouble / 6; val pb = (cb + 1).toDouble / 5
      BigDecimal(pa * math.log(pa / pb)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("x") == ((2L, 1L, term(2, 1))), s"got ${got("x")}")
    assert(got("y") == ((1L, 0L, term(1, 0))), s"got ${got("y")}")
    assert(got("z") == ((0L, 1L, term(0, 1))), s"got ${got("z")}")
    // Gibbs: KL(P||Q) ≥ 0 even though single terms go negative
    assert(got.values.map(_._3).sum >= 0)
    assert(got.values.exists(_._3 < 0))
  }

  test("temperatureResample: alpha flattens quotas between proportional and uniform") {
    import org.apache.spark.sql.functions.count
    val d = (0L until 1600L).map(i =>
      (i, if (i % 16 < 12) "en" else if (i % 16 < 15) "de" else "mi"))
      .toDF("id", "lang") // 1200 en, 300 de, 100 mi
    def quotas(alpha: Double): Map[String, Long] =
      graft.operators.TextOps.temperatureResample(d, "lang", "id", alpha, 400)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // α=1: natural proportions (400 · n/1600)
    assert(quotas(1.0) == Map("en" -> 300L, "de" -> 75L, "mi" -> 25L))
    // α=0: uniform quotas (133 each), mi capped at its 100 rows
    assert(quotas(0.0) == Map("en" -> 133L, "de" -> 133L, "mi" -> 100L))
    // α=0.5: strictly between — the low-resource stratum gains share
    val half = quotas(0.5)
    assert(half("mi") > 25L && half("mi") <= 100L, s"got $half")
    assert(half("en") < 300L && half("en") > 134L, s"got $half")
    // quota can't exceed the stratum (tiny stratum kept whole at most)
    assert(half.values.sum <= 403L && half.values.sum >= 397L, s"got $half")
    // deterministic under repartitioning: same selected id set
    val a = graft.operators.TextOps.temperatureResample(d, "lang", "id", 0.5, 400)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = graft.operators.TextOps.temperatureResample(
        d.repartition(13), "lang", "id", 0.5, 400)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("samplePerStratum: exactly k per stratum, partition-invariant, small strata kept whole") {
    import org.apache.spark.sql.functions.count
    val d = (0L until 1000L).map(i => (i, if (i < 990) "big" else "tiny"))
      .toDF("id", "s")
    val out = graft.operators.TextOps.samplePerStratum(d, "s", "id", k = 25)
    val by = out.groupBy(col("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by == Map("big" -> 25L, "tiny" -> 10L))
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = graft.operators.TextOps.samplePerStratum(d.repartition(11), "s", "id", k = 25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("NFC normalization composes decomposed sequences, leaves composed text alone") {
    val d = Seq(
      (1L, "e\u0301clair nai\u0308ve"),  // decomposed: e+ACUTE, i+DIAERESIS
      (2L, "\u00e9clair na\u00efve"),    // precomposed — must pass through
      (3L, "stra\u00dfe plain ascii")
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
        graft.functions.TextFunctions.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "\u00e9clair na\u00efve")
    assert(out(2L) == "\u00e9clair na\u00efve")
    assert(out(1L) == out(2L), "canonically-equal strings must share one byte form")
    assert(out(3L) == "stra\u00dfe plain ascii") // NFC never touches the sharp s
  }

  test("exportPipeline: dedups, decontaminates, filters, resamples — deterministically") {
    val mk = (id: Long, src: String, text: String) => (id, src, text)
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val train = Seq(
      mk(1L, "a", body + " one"),
      mk(2L, "a", body + " one"),              // exact dup of 1 -> dropped
      mk(3L, "a", "leak " + body),             // shares 5-grams with eval -> dropped
      mk(4L, "a", "unique words entirely disjoint from everything else present here today"),
      mk(5L, "b", "second source document with its own completely distinct vocabulary set okay"),
      mk(6L, "b", "tiny")                      // < 10 tokens -> dropped
    ).toDF("doc_id", "source", "text")
    val evalDocs = Seq((100L, "x", body + " evaluation")).toDF("doc_id", "source", "text")
    val out = Curation.exportPipeline(train, evalDocs, "doc_id", "text",
      "source", Map("a" -> 0.5, "b" -> 0.5), minTokens = 10, maxTokens = 50)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(2L), "exact duplicate must not survive")
    assert(!ids.contains(3L), "contaminated doc must not survive")
    assert(!ids.contains(6L), "short doc must not survive")
    assert(ids.subsetOf(Set(1L, 4L, 5L)))
    assert(ids.nonEmpty)
    // byte-identical export: same rows under a different partitioning
    val again = Curation.exportPipeline(train.repartition(5), evalDocs,
        "doc_id", "text", "source", Map("a" -> 0.5, "b" -> 0.5),
        minTokens = 10, maxTokens = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
  }

  test("exportPipeline: finite maxGramDf counts gram DF over DEDUPED documents") {
    // the round-6 decontam-before-dedup reorder is only
    // result-identical with the DEFAULT (no) hot-gram cap: here six
    // exact duplicates would push the leak gram's PRE-dedup DF to 8
    // (> cap 3) and exempt it, letting contaminated docs survive.
    // The finite-cap path must dedup first: post-dedup DF is 3
    // (X + one Y + eval) ≤ cap, the gram stays, both leaks drop.
    val leak = "alpha beta gamma delta epsilon"
    val tail = "plus enough extra filler tokens to clear the minimum length gate"
    val train = (
      Seq((1L, "a", s"$leak $tail")) ++                    // X: contaminated
      (10L to 15L).map(i => (i, "a", s"$leak entirely other continuation words making twelve tokens here")) ++ // Y ×6 exact dups, contaminated
      Seq((20L, "b", s"clean document $tail"))             // control, survives
    ).toDF("doc_id", "source", "text")
    val evalDocs = Seq((100L, "x", s"$leak evaluation suite text")).toDF("doc_id", "source", "text")
    val ids = Curation.exportPipeline(train, evalDocs, "doc_id", "text",
        "source", Map("a" -> 1.0, "b" -> 1.0), minShared = 1,
        minTokens = 5, maxTokens = 50, maxGramDf = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(20L),
      s"duplicates must not exempt the leak gram from the cap: $ids")

    // sanity: with the cap wide open the same input drops the leaks too
    val open = Curation.exportPipeline(train, evalDocs, "doc_id", "text",
        "source", Map("a" -> 1.0, "b" -> 1.0), minShared = 1,
        minTokens = 5, maxTokens = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(open == Set(20L))
  }

  test("tokenBudgetSample: exact prefix semantics, equals the single-window form") {
    import graft.operators.TextOps
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
    val budgets = Map("src0" -> 900L, "src1" -> 400L, "src2" -> 0L)
    val out = TextOps.tokenBudgetSample(docs, "source", "doc_id", "text", budgets)
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._2, t._4))

    // naive single-window reference (the form the operator decomposes)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(graft.operators.TextOps.portableHash(col("doc_id"), "mix"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val budgetCol = element_at(
      map(budgets.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
      col("source"))
    val ref = docs
      .withColumn("n_tok",
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
      .filter(budgetCol.isNotNull)
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budgetCol)
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._2, t._4))
    assert(out == ref, s"two-phase must equal the single window:\n$out\nvs\n$ref")
    assert(out.nonEmpty && out.forall(_._4 <= 900L))
    // budgets bind: every stratum stops under its budget, zero-budget drops all
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(bySrc.getOrElse("src0", 0L) <= 900L && bySrc.getOrElse("src1", 0L) <= 400L)
    assert(!bySrc.contains("src2"), "zero budget selects nothing")
    // a tiny bucket count forces multi-bucket cutoffs through the same result
    val coarse = TextOps.tokenBudgetSample(docs, "source", "doc_id", "text",
        budgets, buckets = 2)
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._2, t._4))
    assert(coarse == ref)
  }

  test("exportPipeline: opt-in substring-duplication gate drops span-stitched docs") {
    val run = "wolves hunt elk across frozen northern tundra under pale moonlight"
    val train = Seq(
      // doc 1 holds the corpus-first copy of the run → low coverage
      (1L, "a", s"$run with an original continuation of several more words here"),
      // doc 2 is MOSTLY that borrowed run (10 of 13 tokens ≈ 0.77)
      (2L, "a", s"$run plus three tokens"),
      (3L, "a", "a fully original document containing nothing borrowed from any peer at all")
    ).toDF("doc_id", "source", "text")
    val evalDocs = Seq((100L, "x", "completely unrelated evaluation text"))
      .toDF("doc_id", "source", "text")
    def ids(maxFrac: Double): Set[Long] =
      Curation.exportPipeline(train, evalDocs, "doc_id", "text", "source",
          Map("a" -> 1.0), minTokens = 4, maxTokens = 50,
          maxSubstringDupFrac = maxFrac, substringWindow = 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(0.5) == Set(1L, 3L), "span-stitched doc must fall at a 0.5 cap")
    assert(ids(1.0) == Set(1L, 2L, 3L), "default (disabled) keeps it")
  }

  test("quantizedKnn ranks by integer dot with deterministic ties") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(-1.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Curation.quantizedKnn(corpus, "vec_id", "embedding",
      Seq(1.0f, 0.0f), 3).collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L, 4L))
  }

  test("bigram LM perplexity matches a plain-Scala closed form") {
    val ref = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "a dog ran"))
      .toDF("doc_id", "text")
    val lm = Curation.fitBigramLm(ref, "text")
    assert(lm.vocabSize == 6) // the cat sat ran a dog
    assert(lm.uni("the") == 2L && lm.uni("ran") == 2L)
    assert(lm.big(("the", "cat")) == 2L && lm.big(("cat", "sat")) == 1L)

    val score = Seq((10L, "the cat sat"), (11L, "zz qq"), (12L, "one"))
      .toDF("doc_id", "text")
    val out = Curation.perplexity(score, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    // independent recomputation (plain Scala, same formula)
    def lp(c2: Long, c1: Long): Long = {
      val x = math.log((c2 + 1.0) / (c1 + 6.0)) * 1e6
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    }
    val sum10 = lp(2, 2) + lp(1, 2) // "the cat" + "cat sat"
    assert(out(10L) == ((2L, sum10, math.exp(-(sum10 / 1e6) / 2))))
    val sum11 = lp(0, 0) // both words unseen -> p = 1/V
    assert(out(11L) == ((1L, sum11, math.exp(-(sum11 / 1e6) / 1))))
    assert(!out.contains(12L), "single-token docs have no bigrams")
    // unseen-everything text is junkier (higher ppl) than in-model text
    assert(out(11L)._3 > out(10L)._3)
  }

  test("DSIR fit+score matches a plain-Scala closed form") {
    val target = Seq((1L, "spark table join"), (2L, "spark table scan"))
      .toDF("doc_id", "text")
    val raw = Seq((1L, "spark table join"), (2L, "spark table scan"),
      (3L, "dog cat mouse"), (4L, "red green blue"))
      .toDF("doc_id", "text")
    val b = 64
    val model = Curation.fitDsir(target, raw, "text", numBuckets = b)

    // independent reimplementation: md5 bucket + add-one log-ratios
    def bucket(f: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("dsir:" + f).getBytes("UTF-8"))
      ((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % b).toInt
    }
    def feats(text: String): Seq[String] = {
      val tk = text.split("\\s+").toSeq
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val tFeats = Seq("spark table join", "spark table scan").flatMap(feats)
    val rFeats = tFeats ++ Seq("dog cat mouse", "red green blue").flatMap(feats)
    def counts(fs: Seq[String]): Map[Int, Long] =
      fs.groupBy(bucket).map { case (k, v) => k -> v.size.toLong }
    val (tc, rc) = (counts(tFeats), counts(rFeats))
    def round6(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    val expectedLr = Array.tabulate(b) { i =>
      round6(math.log(((tc.getOrElse(i, 0L) + 1.0) / (tFeats.size + b)) /
        ((rc.getOrElse(i, 0L) + 1.0) / (rFeats.size + b))) * 1e6)
    }
    assert(model.logRatios.toSeq == expectedLr.toSeq)

    val out = Curation.dsirScore(raw, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def score(text: String): Long = feats(text).map(f => expectedLr(bucket(f))).sum
    assert(out(1L) == ((5L, score("spark table join"))))
    assert(out(3L) == ((5L, score("dog cat mouse"))))
    // target-like docs must outweigh off-target docs
    assert(out(1L)._2 > out(3L)._2)
  }

  test("NB quality classifier fit+score matches a plain-Scala closed form") {
    val pos = Seq((1L, "spark table join"), (2L, "spark table scan"))
      .toDF("doc_id", "text")
    val neg = Seq((3L, "dog cat mouse"), (4L, "red green blue spark"))
      .toDF("doc_id", "text")
    val model = Curation.fitNbQuality(pos, neg, "text")

    // closed form: Np=6 pos occurrences, Nn=7 neg, V=10 distinct
    def round6(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    def lo(cp: Long, cn: Long): Long =
      round6(math.log(((cp + 1.0) / (6 + 10.0)) / ((cn + 1.0) / (7 + 10.0))) * 1e6)
    assert(model.logOdds.size == 10)
    assert(model.logOdds("spark") == lo(2, 1))
    assert(model.logOdds("table") == lo(2, 0))
    assert(model.logOdds("dog") == lo(0, 1))
    assert(model.oovLogOdds == lo(0, 0))
    assert(model.priorLogOdds == 0L) // dp = dn = 2 -> ln(3/3) = 0

    val score = Seq((10L, "spark table"), (11L, "dog zz"), (12L, ""))
      .toDF("doc_id", "text")
    val out = Curation.nbScore(score, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out(10L) == ((2L,
      (model.logOdds("spark") + model.logOdds("table")) / 1e6)))
    assert(out(11L) == ((2L,
      (model.logOdds("dog") + model.oovLogOdds) / 1e6)))
    assert(!out.contains(12L), "token-less docs are excluded")
    // trusted-like text must outscore off-distribution text
    assert(out(10L)._2 > out(11L)._2)
  }

  test("NB vocab cap keeps highest-count tokens deterministically; capped-out tokens score as OOV") {
    val pos = Seq((1L, "spark table join"), (2L, "spark table scan"))
      .toDF("doc_id", "text")
    val neg = Seq((3L, "dog cat mouse"), (4L, "red green blue spark"))
      .toDF("doc_id", "text")
    val full = Curation.fitNbQuality(pos, neg, "text")
    val capped = Curation.fitNbQuality(pos, neg, "text", maxVocab = 2)
    // top-2 by (total desc, token): spark (3), table (2)
    assert(capped.logOdds.keySet == Set("spark", "table"))
    assert(capped.logOdds("spark") == full.logOdds("spark"))
    // OOV constant and prior are cap-independent (V/Np/Nn are global)
    assert(capped.oovLogOdds == full.oovLogOdds)
    assert(capped.priorLogOdds == full.priorLogOdds)
    // a capped-out token scores exactly as OOV
    val one = Seq((20L, "dog")).toDF("doc_id", "text")
    val got = Curation.nbScore(one, "doc_id", "text", capped)
      .collect().head.getDouble(3)
    assert(got == capped.oovLogOdds / 1e6)
  }

  test("NB model save/load round-trips") {
    val pos = Seq((1L, "spark table join")).toDF("doc_id", "text")
    val neg = Seq((2L, "dog cat")).toDF("doc_id", "text")
    val model = Curation.fitNbQuality(pos, neg, "text")
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    Curation.saveNb(spark, model, dir)
    assert(Curation.loadNb(spark, dir) == model)
  }

  test("LM and DSIR kernels agree with plain-Scala references on random unicode corpora") {
    // the kernels do byte-level work (UTF8String map lookups, md5 over
    // UTF-8 bytes) — random multi-byte tokens catch any byte/string
    // divergence the ASCII fixtures can't
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("the", "cat", "naïve", "café", "日本語", "привет",
      "🙂", "x1", "ß", "mañana", "εδώ", "한글")
    val corpus = Seq.tabulate(40) { i =>
      val n = rnd.nextInt(13)
      (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    val ref = df.filter(col("doc_id") % 2 === 0)

    // plain-Scala twin of tokenize (alphabet is already lowercase)
    def toks(t: String): Seq[String] =
      t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val refToks = corpus.filter(_._1 % 2 == 0).map(c => toks(c._2))

    // ---- bigram LM
    val lm = Curation.fitBigramLm(ref, "text")
    val uniRef = refToks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val bigRef = refToks.flatMap(_.sliding(2).filter(_.size == 2))
      .groupBy(identity).map { case (p, g) => (p(0), p(1)) -> g.size.toLong }
    assert(lm.uni == uniRef && lm.big == bigRef &&
      lm.vocabSize == uniRef.size.toLong)
    def lp(c2: Long, c1: Long): Long = {
      val x = math.log((c2 + 1.0) / (c1 + lm.vocabSize)) * 1e6
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    }
    val got = Curation.perplexity(df, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    corpus.foreach { case (id, text) =>
      val tk = toks(text)
      if (tk.size >= 2) {
        val want = tk.sliding(2).map { p =>
          lp(bigRef.getOrElse((p(0), p(1)), 0L), uniRef.getOrElse(p(0), 0L))
        }.sum
        assert(got(id) == want, s"doc $id lp_sum")
      } else assert(!got.contains(id))
    }

    // ---- DSIR
    val b = 128
    val model = Curation.fitDsir(ref, df, "text", numBuckets = b)
    def bucket(f: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("dsir:" + f).getBytes("UTF-8"))
      ((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % b).toInt
    }
    def feats(t: String): Seq[String] = {
      val tk = toks(t)
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val dsirGot = Curation.dsirScore(df, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    corpus.foreach { case (id, text) =>
      val fs = feats(text)
      if (fs.nonEmpty)
        assert(dsirGot(id) == fs.map(f => model.logRatios(bucket(f))).sum,
          s"doc $id lr_sum")
      else assert(!dsirGot.contains(id))
    }
  }

  test("fitted LM and DSIR models round-trip through parquet artifacts") {
    val ref = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "a dog ran"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_models").toString
    val lm = Curation.fitBigramLm(ref, "text")
    Curation.saveBigramLm(spark, lm, s"$dir/lm")
    assert(Curation.loadBigramLm(spark, s"$dir/lm") == lm)
    val dsir = Curation.fitDsir(ref.limit(1), ref, "text", numBuckets = 64)
    Curation.saveDsir(spark, dsir, s"$dir/dsir")
    val loaded = Curation.loadDsir(spark, s"$dir/dsir")
    assert(loaded.numBuckets == 64 &&
      loaded.logRatios.toSeq == dsir.logRatios.toSeq)
  }

  test("dsirSample is deterministic under repartitioning and favors heavy weights") {
    val scored = Seq.tabulate(50) { i =>
      (i.toLong, 1L, 0L, if (i < 5) 10.0 else -10.0)
    }.toDF("doc_id", "n_features", "lr_sum", "logw")
    val picked = Curation.dsirSample(scored, "doc_id", k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(picked == Set(0L, 1L, 2L, 3L, 4L),
      "a 20-logit gap must dominate Gumbel noise")
    val again = Curation.dsirSample(scored.repartition(7), "doc_id", k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(again == picked)
  }

  test("fitBigramLm caps keep highest-count grams deterministically; capped-out grams score as unseen") {
    val ref = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "a dog ran"))
      .toDF("doc_id", "text")
    val capped = Curation.fitBigramLm(ref, "text", maxBigrams = 1)
    assert(capped.big == Map(("the", "cat") -> 2L)) // count 2 beats the count-1 ties
    assert(capped.vocabSize == 6, "V stays the full vocab size under caps")
    val full = Curation.fitBigramLm(ref, "text")
    // capped model scores "cat sat" with c2=0; everything else matches
    val doc = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val pplCapped = Curation.perplexity(doc, "doc_id", "text", capped)
      .collect().head.getDouble(3)
    val pplFull = Curation.perplexity(doc, "doc_id", "text", full)
      .collect().head.getDouble(3)
    assert(pplCapped > pplFull, "losing a bigram to the cap must raise perplexity")
  }

  private lazy val pages = {
    val nav = "HOME | ABOUT"
    val foot = "(c) example.com"
    Seq(
      (1L, s"$nav\ntitle one\nbody line one\n$foot"),
      (2L, s"$nav\ntitle two\nbody line two\n$foot"),
      (3L, s"$nav\ntitle three\nPROMO\nbody line three\n$foot"),
      (4L, s"$nav\ntitle four\nPROMO\n$foot"),
      (5L, s"$nav\n$foot") // every line is boilerplate at df>=3
    ).toDF("doc_id", "text")
  }

  test("lineDedup removes >=minDocFreq lines, keeps order, empties all-boiler docs") {
    val out = Curation.lineDedup(pages, "doc_id", "text", minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("title one\nbody line one", 2L)))
    assert(out(3L) == (("title three\nPROMO\nbody line three", 2L)),
      "df=2 PROMO is under the threshold and must survive in place")
    assert(out(5L) == (("", 2L)), "all-boilerplate doc survives as empty text")
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), "one row per input doc")
  }

  test("lineDedup: df counts DISTINCT docs, threshold moves the PROMO line") {
    val out = Curation.lineDedup(pages, "doc_id", "text", minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) == "title three\nbody line three", "df=2 PROMO gone at threshold 2")
    // a doc repeating a unique line keeps both copies (within-doc repeats count once)
    val rep = Seq((1L, "same\nsame\nother"), (2L, "x\ny"), (3L, "x\nz"))
      .toDF("doc_id", "text")
    val o2 = Curation.lineDedup(rep, "doc_id", "text", minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(o2(1L) == "same\nsame\nother", "df of 'same' is 1 doc; both copies stay")
    assert(o2(2L) == "y" && o2(3L) == "z")
  }

  test("lineDedup: broadcast and join paths agree on the sf corpus") {
    val shelled = spark.read.parquet(s"$sfDir/documents.parquet").limit(40)
      .select(col("doc_id"), concat(lit("NAV\n"), col("text"), lit("\nFOOT"))
        .as("text"))
    val fast = Curation.lineDedup(shelled, "doc_id", "text", minDocFreq = 20)
      .orderBy("doc_id").collect().toSeq
    val slow = Curation.lineDedup(shelled, "doc_id", "text", minDocFreq = 20,
        forceJoinPath = true)
      .orderBy("doc_id").collect().toSeq
    assert(fast == slow, "hybrid paths must be observationally identical")
    assert(fast.forall(_.getLong(2) == 2L), "NAV and FOOT removed everywhere")
  }

  test("wordNgrams kernel equals the composed HOF form byte-for-byte") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    for (n <- Seq(1, 2, 5)) {
      val tk = graft.functions.TextFunctions.tokens(col("text"))
      val composed = when(size(tk) >= n,
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => concat_ws(" ", slice(tk, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val diff = docs.select(Curation.wordNgrams(col("text"), n).as("a"), composed.as("b"))
        .filter(!(col("a") <=> col("b"))).count()
      assert(diff == 0, s"n=$n: kernel must match the composed form")
    }
  }

  test("lineDedup broadcast rewrite is correct and O(1)-membership at a large boiler set") {
    // 60 docs sharing 40 boilerplate lines each (df=60 >= 2) plus one
    // unique line; correctness at a set size where the old
    // O(|boiler|)-per-line array_contains form would already be
    // measurably superlinear (see lineDedup scaladoc micro-bench:
    // flat 0.15-0.6 s from |boiler|=100 to 100k vs ~19 s at 10k).
    val boilerBlock = (0 until 40).map(i => s"shared boiler line $i").mkString("\n")
    val docs = (0 until 60).map(d => (d.toLong, s"$boilerBlock\nunique line $d"))
      .toDF("doc_id", "text")
    val out = Curation.lineDedup(docs, "doc_id", "text", minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out.size == 60)
    (0 until 60).foreach { d =>
      assert(out(d.toLong) == ((s"unique line $d", 40L)))
    }
  }

  test("gopherFlags: each rule trips on its designed offender, clean prose passes") {
    val clean = ("the quick brown fox jumps over a lazy dog and then " * 5).trim
    val rows = Seq(
      (1L, clean),                                    // passes everything
      (2L, "the of and"),                             // too few words
      (3L, ("a b c " * 20).trim + " the of"),         // mean word len < 3
      (4L, (clean + " ") + ("### ## # " * 20).trim),  // symbol ratio > 0.1
      (5L, (1 to 10).map(i => s"- the bullet of item $i word word word").mkString("\n")),
      (6L, (1 to 10).map(i => s"the line of number $i trails off word...").mkString("\n")),
      (7L, ("123 456 7890 " * 10).trim + " the of"),  // alpha-word frac < 0.8
      (8L, ("zork blorp quux " * 12).trim))           // no stopwords
      .toDF("doc_id", "text")
    val f = Curation.gopherFlags(rows, "text", minWords = 10)
      .select(col("doc_id"), col("pass_gopher"), col("ok_words"),
        col("ok_word_len"), col("ok_symbols"), col("ok_bullets"),
        col("ok_ellipsis"), col("ok_alpha"), col("ok_stops"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getBoolean(1), "clean prose must pass")
    assert(!f(2L).getBoolean(2), "word-count rule")
    assert(!f(3L).getBoolean(3), "mean-word-length rule")
    assert(!f(4L).getBoolean(4), "symbol-ratio rule")
    assert(!f(5L).getBoolean(5), "bullet-line rule")
    assert(!f(6L).getBoolean(6), "ellipsis-line rule")
    assert(!f(7L).getBoolean(7), "alpha-word rule")
    assert(!f(8L).getBoolean(8), "stopword rule")
  }

  test("percentRankNormalize equals the window percent_rank exactly, ties share ranks") {
    val df = Seq(
      ("a", 1L, 10), ("a", 2L, 20), ("a", 3L, 20), ("a", 4L, 30),
      ("b", 5L, 7), ("c", 6L, 99)) // c: singleton group → 0.0
      .toDF("g", "id", "score")
    val got = Curation.percentRankNormalize(df, "g", "score")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct_rank")).toMap
    val want = df
      .withColumn("pct_rank", round(org.apache.spark.sql.functions.percent_rank()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("score"))), 6))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct_rank")).toMap
    assert(got == want)
    assert(got(2L) == got(3L), "tied scores must share a rank")
    assert(got(6L) == 0.0, "singleton group is 0, not NaN")
  }

  test("winsorize clips to the group's discrete quantiles, per group") {
    // group a: scores 1..10 → p10 boundary = 1 (cum 1/10 ≥ .1),
    // p90 = 9; outliers 1 and 10 clip to [1, 9]... use 0.15/0.85 for a
    // two-sided clip: lo = 2 (cum 2/10 ≥ .15), hi = 9 (cum 9/10 ≥ .85)
    val df = ((1 to 10).map(i => ("a", i.toLong, i)) :+ (("b", 99L, 1000)))
      .toDF("g", "id", "score")
    val got = Curation.winsorize(df, "g", "score", loP = 0.15, hiP = 0.85)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("score_lo"), r.getAs[Int]("score_hi"),
          r.getAs[Int]("score_clipped")))).toMap
    assert(got(1L) == ((2, 9, 2)), "low outlier clips up to the p15 score")
    assert(got(10L) == ((2, 9, 9)), "high outlier clips down to the p85 score")
    assert(got(5L) == ((2, 9, 5)), "in-range scores pass through")
    assert(got(99L) == ((1000, 1000, 1000)), "singleton group clips to itself")
  }

  test("medianMad: disc medians are data values; outlier barely moves them") {
    // scores 1..9 → median 5, |x-5| = {0,1,1,2,2,3,3,4,4} → MAD 2
    val df = ((1 to 9).map(("a", _)) :+ (("b", 7))).toDF("g", "score")
    val got = Curation.medianMad(df, "g", "score")
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2)))).toMap
    assert(got("a") == ((5, 2)))
    assert(got("b") == ((7, 0)), "singleton: median itself, zero spread")
    // robustness: replacing 9 with 9000 leaves median and MAD unchanged
    val out = ((1 to 8).map(("a", _)) :+ (("a", 9000))).toDF("g", "score")
    val r2 = Curation.medianMad(out, "g", "score").head()
    assert(r2.getInt(1) == 5 && r2.getInt(2) == 2,
      "one huge outlier must not move the robust pair")
  }

  test("dataCard covers every metric per group; dataCardDiff reports drift and gaps") {
    import spark.implicits._
    val v1 = Seq(
      ("s1", "the cat sat on the mat"),
      ("s1", "the cat sat on the mat"), // exact dup → pct_unique 0.5
      ("s2", "der hund und die katze")).toDF("source", "text")
    val card1 = Curation.dataCard(v1, "text", "source")
    val m1 = card1.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val metrics = Set("avg_quality", "max_doc_tokens", "n_docs", "pct_email",
      "pct_en", "pct_short", "pct_unique", "ws_tokens")
    assert(m1.keySet == metrics.flatMap(m => Set("s1" -> m, "s2" -> m)))
    assert(m1(("s1", "n_docs")) == 2.0 && m1(("s1", "pct_unique")) == 0.5)
    assert(m1(("s1", "pct_en")) == 1.0 && m1(("s2", "pct_en")) == 0.0)
    assert(m1(("s1", "ws_tokens")) == 12.0 && m1(("s2", "pct_short")) == 1.0)
    // drift: s2 disappears, s1 doubles its docs, a new s3 appears
    val v2 = Seq(
      ("s1", "the cat sat on the mat"), ("s1", "a dog ran"),
      ("s1", "the cat sat on the mat"), ("s1", "a dog ran"),
      ("s3", "le chat est la")).toDF("source", "text")
    val diff = Curation.dataCardDiff(card1,
        Curation.dataCard(v2, "text", "source"), "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val grew = diff(("s1", "n_docs"))
    assert(grew.getDouble(2) == 2.0 && grew.getDouble(3) == 4.0 &&
      grew.getDouble(4) == 2.0 && grew.getDouble(5) == 1.0,
      s"s1 n_docs 2 -> 4 is delta 2, +100%: $grew")
    assert(diff(("s2", "n_docs")).isNullAt(3), "vanished source: null new side")
    assert(diff(("s3", "n_docs")).isNullAt(2), "new source: null old side")
  }

  test("c4LineFilter applies the Raffel §2.2 rules line-by-line and page-wide") {
    import spark.implicits._
    val goodLine = "This sentence has plenty of honest words in it."
    val doc = Seq(
      goodLine,                                  // kept
      "Too short.",                              // < 5 words → dropped
      "No terminal punctuation here at all",     // no . ! ? " → dropped
      "Please enable JavaScript to continue reading this page.", // dropped
      "Another perfectly reasonable sentence ends right here!",  // kept
      "\"A quoted sentence still counts as terminal.\"",         // kept (")
      goodLine                                   // kept
    ).mkString("\n")
    val rows = Seq(
      (1L, doc),
      (2L, s"$goodLine\n$goodLine"),             // only 2 kept → page fails
      (3L, s"$doc\nlorem ipsum dolor sit."),     // lorem → page fails
      (4L, s"$doc\nvar x = { a: 1 };"))          // brace → page fails
      .toDF("doc_id", "text")
    val got = Curation.c4LineFilter(rows, "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_kept"), r.getAs[Boolean]("pass_c4_page"),
          r.getAs[String]("clean_text")))).toMap
    assert(got(1L)._1 == 4 && got(1L)._2,
      s"doc 1 keeps 4 of 7 lines and passes: ${got(1L)}")
    assert(!got(1L)._3.contains("JavaScript") && !got(1L)._3.contains("Too short"))
    assert(got(2L)._1 == 2 && !got(2L)._2, "two sentences is below the page floor")
    assert(!got(3L)._2, "lorem ipsum fails the page")
    assert(!got(4L)._2, "a curly brace fails the page")
  }

  test("incremental data card: batch folds equal one-shot state; card matches batch card") {
    import spark.implicits._
    val b1 = Seq(("s1", "the cat sat on the mat"), ("s1", "a dog"),
      ("s2", "der hund und die katze")).toDF("source", "text")
    val b2 = Seq(("s1", "the cat sat on the mat"), // dup of a b1 doc
      ("s2", "le chat est la")).toDF("source", "text")
    val twoStep = java.nio.file.Files.createTempDirectory("graft-card2").toString
    Curation.upsertDataCardState(spark, twoStep, b1, "text", "source")
    Curation.upsertDataCardState(spark, twoStep, b2, "text", "source")
    val oneShot = java.nio.file.Files.createTempDirectory("graft-card1").toString
    Curation.upsertDataCardState(spark, oneShot, b1.unionByName(b2), "text", "source")
    def cardOf(path: String) =
      Curation.dataCardFromState(spark, path, "source").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val (inc, full) = (cardOf(twoStep), cardOf(oneShot))
    assert(inc == full, "two folds must equal the one-shot state exactly")
    // distinct fingerprints <= k → KMV is exact → state card equals the
    // batch dataCard on every shared metric, and pct_unique_est is the
    // exact uniqueness
    val batchCard = Curation.dataCard(b1.unionByName(b2), "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    batchCard.foreach { case ((g, m), v) =>
      val mm = if (m == "pct_unique") "pct_unique_est" else m
      assert(math.abs(inc((g, mm)) - v) < 1e-9, s"($g, $m): ${inc((g, mm))} vs $v")
    }
  }

  test("badwordFilter: exact-token membership, case-insensitive, substring-safe") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a perfectly clean sentence about tables"),
      (2L, "this one mentions forbiddenword once"),
      (3L, "FORBIDDENWORD shouted twice forbiddenword"),   // case-folds, counts 2
      (4L, "classroom and classes are longer words entirely"), // must NOT trip on "class"
      (5L, "")                                              // empty → clean
    ).toDF("doc_id", "text")
    val got = Curation.badwordFilter(rows, "text",
        Seq("forbiddenword", "class", "absentword"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_badwords"), r.getAs[Boolean]("pass_badwords")))).toMap
    assert(got(1L) == ((0, true)))
    assert(got(2L) == ((1, false)))
    assert(got(3L) == ((2, false)), "case-insensitive, every hit counted")
    assert(got(4L) == ((0, true)), "exact tokens only — no substring match")
    assert(got(5L) == ((0, true)))
    // exportPipeline stage 0: the gated doc vanishes before dedup, the
    // rest of the pipeline is unchanged
    val evalDocs = Seq((100L, "held out evaluation text nothing shared here"))
      .toDF("doc_id", "text")
    val train = rows.filter(col("doc_id") =!= 5L)
      .withColumn("source", lit("s"))
      .withColumn("text", concat(col("text"),
        lit(" padding tokens so the length gate keeps every surviving doc")))
    val out = Curation.exportPipeline(train, evalDocs, "doc_id", "text",
      "source", Map("s" -> 1.0), minTokens = 1,
      badwords = Seq("forbiddenword", "class"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 4L), s"docs 2 and 3 die at stage 0: $out")
  }

  test("incremental data card: an all-null-text group's counts survive the merge") {
    import spark.implicits._
    // null text → null fingerprint → the group's KMV sketch is EMPTY;
    // exploding an empty sketch emits no rows, so an inner sketch join
    // would silently drop the group's counts from the merged state
    val path = java.nio.file.Files.createTempDirectory("graft-cardnull").toString
    val b1 = Seq(("s1", "the cat sat on the mat"),
      ("ghost", null.asInstanceOf[String]),
      ("ghost", null.asInstanceOf[String])).toDF("source", "text")
    val b2 = Seq(("s1", "a dog barked"),
      ("ghost", null.asInstanceOf[String])).toDF("source", "text")
    Curation.upsertDataCardState(spark, path, b1, "text", "source")
    Curation.upsertDataCardState(spark, path, b2, "text", "source")
    val card = Curation.dataCardFromState(spark, path, "source").collect()
      .map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2))).toMap
    assert(card(("ghost", "n_docs")) == Some(3.0),
      s"null-text group's counts must survive both merges: $card")
    assert(card(("ghost", "pct_unique_est")) == Some(0.0),
      "no hashable text means zero distinct fingerprints")
    assert(card(("s1", "n_docs")) == Some(2.0))
    assert(card(("s1", "pct_unique_est")) == Some(1.0),
      "the non-null group's sketch must be unaffected")
  }
}
