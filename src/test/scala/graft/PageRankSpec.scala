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

  test("planted hub: a supernode's out-edges stream in chunks — ranks match the dense closed recursion") {
    // one hub fanning out to 2000 spokes that all link back: the shape
    // that OOMs a groupByKey-array adjacency at crawl scale. The edge
    // stream must produce EXACTLY the ranks of a dense reference
    // recursion (contributions are additive, so no semantic drift is
    // tolerated).
    val k = 2000
    val alpha = 0.85
    val iters = 3
    val edges = (1 to k).flatMap(i => Seq(("hub", s"s$i", 1L), (s"s$i", "hub", 1L)))
    val r = ranks(edges, iters = iters, alpha = alpha)
    // reference: n = k+1 nodes, no dangling; spokes are symmetric
    val n = (k + 1).toDouble
    var hub = 1.0 / n
    var spoke = 1.0 / n
    for (_ <- 1 to iters) {
      val hubNext = (1 - alpha) / n + alpha * (spoke * k) // every spoke's whole mass
      val spokeNext = (1 - alpha) / n + alpha * (hub / k) // hub splits k ways
      hub = hubNext; spoke = spokeNext
    }
    assert(math.abs(r("hub") - hub) < 1e-9, s"hub: ${r("hub")} vs $hub")
    assert(math.abs(r("s1") - spoke) < 1e-9, s"spoke: ${r("s1")} vs $spoke")
    assert(math.abs(r.values.sum - 1.0) < 1e-9, "mass conserved")
  }

  test("binary node ids group by VALUE, not array identity") {
    // BinaryType endpoints: every row constructs fresh Array[Byte]
    // instances, whose hashCode/equals are identity-based — an RDD
    // keyed on the raw arrays would treat equal ids as distinct nodes
    // and silently mis-rank. The key re-encoding must restore value
    // semantics: a 2-cycle of byte-array nodes is the uniform fixpoint.
    val edges = Seq(
      (Array[Byte](1, 2), Array[Byte](3, 4), 1L),
      (Array[Byte](1, 2), Array[Byte](3, 4), 1L), // same edge, fresh arrays
      (Array[Byte](3, 4), Array[Byte](1, 2), 1L)
    ).toDF("src", "dst", "w")
    val out = Analytics.pageRank(edges, "src", "dst", "w", iterations = 5)
      .collect().map(r => r.getAs[Array[Byte]](0).toSeq -> r.getDouble(1)).toMap
    assert(out.size == 2, s"two distinct byte-value nodes expected: $out")
    assert(math.abs(out(Seq[Byte](1, 2)) - 0.5) < 1e-12 &&
      math.abs(out(Seq[Byte](3, 4)) - 0.5) < 1e-12,
      s"2-cycle fixpoint must be uniform: $out")
  }

  test("null endpoints are dropped (the Catalyst equi-join rule), not treated as a node") {
    val edges = Seq(
      (Some("a"), Some("b"), 1L), (Some("b"), Some("a"), 1L),
      (None, Some("a"), 99L), (Some("b"), None, 99L)
    ).toDF("src", "dst", "w")
    val r = Analytics.pageRank(edges, "src", "dst", "w", iterations = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set("a", "b"), s"null endpoints must not rank: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("labelPropagation: hub vote totals match the dense per-round argmax (reference recursion)") {
    // 60-spoke hub with weighted spokes; reference implementation runs
    // the exact min(struct(-w, label)) rule densely in plain Scala
    val edges = (1 to 60).map(i => ("hub", f"s$i%02d", (i % 7 + 1).toLong)) ++
      (1 to 59).map(i => (f"s$i%02d", f"s${i + 1}%02d", 2L))
    val got = lprop(edges, iters = 3)
    // dense reference: undirected adjacency with summed weights
    val und = scala.collection.mutable.Map[(String, String), Double]()
    edges.foreach { case (a, b, w) =>
      und((a, b)) = und.getOrElse((a, b), 0.0) + w.toDouble
      und((b, a)) = und.getOrElse((b, a), 0.0) + w.toDouble
    }
    val nodes = und.keys.map(_._1).toSeq.distinct.sorted
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = nodes.map { a =>
        val votes = scala.collection.mutable.Map[String, Double]()
        und.foreach { case ((x, b), w) =>
          if (x == a) votes(lbl(b)) = votes.getOrElse(lbl(b), 0.0) + w
        }
        a -> votes.toSeq.minBy { case (l, w) => (-w, l) }._1
      }.toMap
    }
    assert(got == lbl, s"RDD loop diverged from the dense argmax:\n$got\nvs\n$lbl")
  }
}
