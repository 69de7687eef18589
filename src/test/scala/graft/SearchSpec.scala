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
}
