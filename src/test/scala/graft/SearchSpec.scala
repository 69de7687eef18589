package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Lexical + hybrid retrieval: bm25Rank against a plain-Scala
  * restatement of the Okapi formula (independent code path from the
  * Column expression), rrfFuse fusion semantics.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark table"),
    (2L, "spark hash"),
    (3L, "other words here entirely")
  ).toDF("doc_id", "text")

  test("bm25Rank matches the closed-form Okapi score on a tiny corpus") {
    val out = TextOps.bm25Rank(docs, "doc_id", "text",
        Seq("spark", "table"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent plain-Scala computation of the same formula
    val corpus = Map(1L -> Seq("spark", "spark", "table"),
      2L -> Seq("spark", "hash"), 3L -> Seq("other", "words", "here", "entirely"))
    val n = corpus.size
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    def score(toks: Seq[String]): Double =
      Seq("spark", "table").map { t =>
        val df = corpus.values.count(_.contains(t))
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        val tf = toks.count(_ == t).toDouble
        idf * tf / (tf + 1.2 * (0.25 + 0.75 * toks.size / avgdl))
      }.sum
    corpus.foreach { case (id, toks) =>
      assert(math.abs(out(id) - score(toks)) < 1e-6, s"doc $id")
    }
    // ranking: d1 (both terms) > d2 (one term) > d3 (none)
    assert(out(1L) > out(2L) && out(2L) > out(3L) && out(3L) == 0.0)
  }

  test("bm25Rank: k truncates, duplicate query terms collapse") {
    val top1 = TextOps.bm25Rank(docs, "doc_id", "text", Seq("spark"), k = 1)
      .collect()
    assert(top1.length == 1 && top1(0).getLong(0) == 1L)
    val dup = TextOps.bm25Rank(docs, "doc_id", "text",
        Seq("spark", "spark"), k = 3).collect().map(_.getDouble(1))
    val single = TextOps.bm25Rank(docs, "doc_id", "text",
        Seq("spark"), k = 3).collect().map(_.getDouble(1))
    assert(dup.sameElements(single), "duplicate terms must not double-count")
  }

  test("rrfFuse: items in both lists outrank items in one; ties break by id") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("doc_id", "rank")
    val out = TextOps.rrfFuse(Seq(a, b), "doc_id", "rank", kRrf = 60, k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def c(r: Int) = 1.0 / (60 + r)
    val expected = Map(
      10L -> (c(1) + c(3)), 20L -> (c(2) + c(1)),
      30L -> c(3), 40L -> c(2))
    out.foreach { case (id, v) =>
      assert(math.abs(v - expected(id)) < 1e-6, s"doc $id")
    }
    // 20 (ranks 1+2) beats 10 (ranks 1+3); singles ordered 40 (rank 2) > 30 (rank 3)
    assert(out.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L))
  }

  test("rrfFuse: single list is rank order; k truncates") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val out = TextOps.rrfFuse(Seq(a), "doc_id", "rank", k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L))
  }

  test("lexicalStats: hand-computed TTR, word length, syllables, Flesch") {
    val d = Seq(
      (1L, "aa aa bee"), // 3 tokens, 2 types, 7 chars, 3 vowel groups, no sentence marks
      (2L, "One two. Three four!"), // 2 sentences
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.lexicalStats(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 3 && r1.getLong(2) == 2)
    assert(math.abs(r1.getDouble(3) - 0.666667) < 1e-6)
    assert(math.abs(r1.getDouble(4) - 7.0 / 3) < 1e-6)
    assert(r1.getLong(5) == 3, "aa + aa + ee = 3 vowel groups")
    val fl1 = 206.835 - 1.015 * 3.0 - 84.6 * 1.0 // 1 sentence floor, 3 syll / 3 words
    assert(math.abs(r1.getDouble(6) - fl1) < 1e-6)
    val r2 = out(2L)
    val fl2 = 206.835 - 1.015 * (4.0 / 2) - 84.6 * (5.0 / 4) // o-e,o,ee,ou,ou
    assert(math.abs(r2.getDouble(6) - fl2) < 1e-4, s"saw ${r2.getDouble(6)} want $fl2")
    val r3 = out(3L)
    assert(r3.getLong(1) == 0 && r3.getDouble(3) == 0.0 && r3.getDouble(6) == 0.0)
  }

  test("tfidfKeywords: rare terms outrank corpus-wide terms; ties break by token") {
    val d = Seq(
      (1L, "common rare rare"), // rare: tf=2, df=1 -> top
      (2L, "common zebra"),
      (3L, "common apple")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfKeywords(d, "doc_id", "text", topJ = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._3).toSeq == Seq("rare", "common"))
    val idfRare = math.log(4.0 / 2) + 1
    assert(math.abs(doc1.head._4 - 2 * idfRare) < 1e-6)
    // df=3 'common' has idf ln(4/4)+1 = 1 -> score 1 everywhere
    assert(out.filter(_._3 == "common").forall(t => math.abs(t._4 - 1.0) < 1e-9))
  }

  test("pmiCollocations: planted pair tops the list; minCount prunes") {
    val pairDocs = (1 to 6).map(i => (i.toLong, "strong coffee here")) ++
      Seq((7L, "weak coffee strong tea"), (8L, "filler words only"))
    val d = pairDocs.toDF("doc_id", "text")
    val out = TextOps.pmiCollocations(d, "text", minCount = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 2, "only pairs with >= 5 occurrences survive")
    assert(out.map(p => (p._1, p._2)).toSet ==
      Set(("strong", "coffee"), ("coffee", "here")))
    // U = 25 unigrams, B = 17 bigrams; strong 7, coffee 7, here 6
    val sc = out.find(p => (p._1, p._2) == (("strong", "coffee"))).get
    assert(sc._3 == 6L)
    val want = math.log((6.0 / 17) / ((7.0 / 25) * (7.0 / 25)))
    assert(math.abs(sc._4 - want) < 1e-6, s"saw ${sc._4} want $want")
    val ch = out.find(p => (p._1, p._2) == (("coffee", "here"))).get
    val wantCh = math.log((6.0 / 17) / ((7.0 / 25) * (6.0 / 25)))
    assert(math.abs(ch._4 - wantCh) < 1e-6)
    assert(out.head._1 == "coffee" && out.head._2 == "here",
      "higher-pmi pair ranks first")
  }

  test("phraseOccurrences: overlaps, repeats, case, and boundary edges") {
    val d = Seq(
      (1L, "Hash Join beats hash join here"), // case-insensitive, 2 occurrences
      (2L, "hash hash hash"), //                 overlapping starts for [hash,hash]
      (3L, "join hash"), //                      reversed order is no match
      (4L, "hash"), //                           shorter than the phrase
      (5L, "")
    ).toDF("doc_id", "text")
    def occ(phrase: Seq[String]) =
      d.select(col("doc_id"), TextOps.phraseOccurrences(col("text"), phrase).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hj = occ(Seq("hash", "join"))
    assert(hj == Map(1L -> 2, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0))
    assert(occ(Seq("hash", "hash"))(2L) == 2, "overlapping occurrences both count")
    assert(occ(Seq("hash"))(2L) == 3, "single-token phrase is term frequency")
  }

  test("phraseSearch over postings == phraseOccurrences scan, on the sf corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val postings = TextOps.buildPostings(docs, "doc_id", "text")
    for (phrase <- Seq(Seq("fast", "table"), Seq("the", "big", "merge"),
        Seq("no", "such", "phrase", "anywhere"))) {
      val indexed = TextOps.phraseSearch(postings, "doc_id", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val scanned = docs.select(col("doc_id"),
          TextOps.phraseOccurrences(col("text"), phrase).as("n"))
        .filter(col("n") > 0)
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      assert(indexed == scanned, s"phrase $phrase: index and scan must agree")
    }
  }

  test("retrievalMetrics: hand-computed recall/MRR/nDCG on a tiny run") {
    // query 1: rel docs {10,11,12}; run ranks 10@1, 99@2, 11@3
    // query 2: rel docs {20};       run has no hits
    // query 3: judged but absent from the run entirely
    val results = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      (2L, 98L, 1), (2L, 97L, 2)
    ).toDF("qid", "doc", "rank")
    val qrels = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (3L, 30L))
      .toDF("qid", "doc")
    val out = TextOps.retrievalMetrics(results, qrels, "qid", "doc", "rank", k = 10)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val dcg = 1.0 / (math.log(2) / math.log(2)) + 1.0 / (math.log(4) / math.log(2))
    val idcg = (1 to 3).map(i => 1.0 / (math.log(i + 1.0) / math.log(2))).sum
    assert(out(1L)._1 == 2L && out(1L)._2 == 3L)
    assert(math.abs(out(1L)._3 - 0.666667) < 1e-6, "recall 2/3")
    assert(out(1L)._4 == 1.0, "first hit at rank 1")
    assert(math.abs(out(1L)._5 -
      BigDecimal(dcg / idcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(2L) == ((0L, 1L, 0.0, 0.0, 0.0)), "judged query, zero hits")
    assert(out(3L) == ((0L, 1L, 0.0, 0.0, 0.0)), "judged query missing from run")
    assert(out.size == 3, "exactly the judged queries")
  }

  test("retrievalMetrics: k truncates the run before scoring") {
    val results = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "doc", "rank")
    val qrels = Seq((1L, 11L), (1L, 12L)).toDF("qid", "doc")
    val at2 = TextOps.retrievalMetrics(results, qrels, "qid", "doc", "rank", k = 2)
      .collect().head
    assert(at2.getLong(1) == 1L, "rank-3 hit is outside k=2")
    assert(math.abs(at2.getDouble(3) - 0.5) < 1e-9)
    assert(math.abs(at2.getDouble(4) - 0.5) < 1e-9, "first hit at rank 2")
  }

  test("chunkDocs: window arithmetic, overlap, short-doc and empty-doc edges") {
    val d = Seq(
      (1L, "a b c d e f g"), // 7 tokens
      (2L, "x y"), //  shorter than one chunk
      (3L, "") //       no chunks at all
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(d, "doc_id", "text",
        chunkTokens = 3, overlapTokens = 1) // step 2
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(out.filter(_._1 == 1L) == Seq(
      (1L, 0L, 0L, 3L, "a b c"),
      (1L, 1L, 2L, 3L, "c d e"),
      (1L, 2L, 4L, 3L, "e f g"),
      (1L, 3L, 6L, 1L, "g"))) // trailing partial chunk
    assert(out.filter(_._1 == 2L) == Seq((2L, 0L, 0L, 2L, "x y")))
    assert(!out.exists(_._1 == 3L), "empty doc yields no chunks")
  }

  test("chunkDocs: every token covered; consecutive chunks overlap by overlapTokens") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
    val chunks = TextOps.chunkDocs(d, "doc_id", "text", 30, 10).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    val toks = d.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    byDoc.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      // chunks reassemble the doc: strip the 10-token overlap after the first
      val rebuilt = sorted.head.getString(4).split(" ").toSeq ++
        sorted.tail.toSeq.flatMap(_.getString(4).split(" ").drop(10).toSeq)
      assert(rebuilt == toks(id), s"doc $id must be exactly covered")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(2) == 20L, s"doc $id stride")
        case _ =>
      }
    }
  }
}
