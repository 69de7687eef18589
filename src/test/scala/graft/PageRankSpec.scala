package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Weighted PageRank by iterated joins: closed-form fixpoints, rank
  * conservation under dangling nodes, proportional split of weighted
  * out-edges, and the lazy-plan contract (no driver action per
  * iteration beyond the explicit checkpoint cadence).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)], iters: Int,
      alpha: Double = 0.85): Map[String, Double] =
    Analytics.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iterations = iters, alpha = alpha)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("two-node cycle: uniform rank is the fixpoint from iteration zero") {
    val r = ranks(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 7)
    assert(math.abs(r("a") - 0.5) < 1e-12 && math.abs(r("b") - 0.5) < 1e-12)
  }

  test("dangling nodes: rank mass is conserved and sinks outrank sources") {
    // a -> b, b has no out-edges: b's rank leaks back uniformly
    val r = ranks(Seq(("a", "b", 1L)), iters = 20)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"rank mass must stay 1: $r")
    assert(r("b") > r("a"), s"the sink must outrank its source: $r")
  }

  private def lprop(edges: Seq[(String, String, Long)], iters: Int): Map[String, String] =
    Analytics.labelPropagation(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iterations = iters)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("labelPropagation: two cliques joined by a weak bridge become two communities") {
    // clique {a,b,c} and {x,y,z} fully connected with weight 10,
    // one weight-1 bridge c—x
    def clique(ns: Seq[String]) =
      for (i <- ns; j <- ns if i < j) yield (i, j, 10L)
    val edges = clique(Seq("a", "b", "c")) ++ clique(Seq("x", "y", "z")) :+
      (("c", "x", 1L))
    val l = lprop(edges, iters = 4)
    assert(l("a") == l("b") && l("b") == l("c"), s"left clique split: $l")
    assert(l("x") == l("y") && l("y") == l("z"), s"right clique split: $l")
    assert(l("a") != l("x"), s"bridge must not merge the cliques: $l")
  }

  test("labelPropagation: ties go to the lexicographically smallest label; deterministic") {
    // star: center m with equal-weight spokes a and z → m takes "a"
    val l = lprop(Seq(("m", "a", 1L), ("m", "z", 1L)), iters = 1)
    assert(l("m") == "a", s"tie must break to the smallest label: $l")
    // zero iterations = identity labeling
    val l0 = lprop(Seq(("p", "q", 1L)), iters = 0)
    assert(l0 == Map("p" -> "p", "q" -> "q"))
    // partition-invariance
    val big = (1 to 50).map(i => (s"n${i % 10}", s"n${(i * 7) % 10}", (i % 5 + 1).toLong))
      .filter(e => e._1 != e._2)
    val one = Analytics.labelPropagation(big.toDF("src", "dst", "w"),
      "src", "dst", "w", 3).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val two = Analytics.labelPropagation(big.toDF("src", "dst", "w").repartition(13),
      "src", "dst", "w", 3).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(one == two)
  }

  test("weighted edges split contribution proportionally (one hand-computed step)") {
    // a -> b (w=3), a -> c (w=1); b and c dangle. N=3, r0 = 1/3 each.
    val alpha = 0.85
    val n = 3.0
    val dang = 2.0 / 3.0 // b + c at r0
    val expB = (1 - alpha) / n + alpha * ((1.0 / 3.0) * 0.75 + dang / n)
    val expC = (1 - alpha) / n + alpha * ((1.0 / 3.0) * 0.25 + dang / n)
    val expA = (1 - alpha) / n + alpha * (dang / n)
    val r = ranks(Seq(("a", "b", 3L), ("a", "c", 1L)), iters = 1)
    assert(math.abs(r("b") - expB) < 1e-12, s"b: ${r("b")} vs $expB")
    assert(math.abs(r("c") - expC) < 1e-12, s"c: ${r("c")} vs $expC")
    assert(math.abs(r("a") - expA) < 1e-12, s"a: ${r("a")} vs $expA")
  }

  test("zero-weight and null-weight edges are dropped; empty graph yields empty ranks") {
    val edges = Seq(("a", "b", 0L)).toDF("src", "dst", "w")
    assert(Analytics.pageRank(edges, "src", "dst", "w", 3).count() == 0)
  }
}
