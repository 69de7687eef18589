package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregators, Analytics}

/** Misra–Gries heavy-hitters sketch: exactness in the small-cardinality
  * regime (what the q104 oracle gate relies on), and the published
  * guarantees in the lossy regime — counts are lower bounds within
  * N/(capacity+1), no item is overcounted, and every TRUE heavy hitter
  * survives eviction. Merges are forced by partitioning, so the
  * summary-merge rule (not just the single-partition reduce) carries
  * the bound.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("misraGries is exact when distinct items fit the capacity") {
    val items = (1 to 3000).map(i => s"k${i % 20}")
    val ds = items.toDF("item").repartition(8).as[String]
    val got = ds.select(Aggregators.misraGries(64).toColumn).head()
    assert(got == exactCounts(items))
  }

  test("misraGries lossy regime: lower bounds within N/(k+1), heavy hitters survive") {
    // Zipf-ish stream: a few heavy keys over a long tail, far more
    // distinct items than counters; repartition(11) forces the merge
    // path across unevenly-filled partial summaries.
    val rnd = new scala.util.Random(13)
    val heavy = Seq.fill(4000)("h" + rnd.nextInt(3)) // 3 keys, ~1333 each
    val tail = Seq.fill(6000)("t" + rnd.nextInt(2000)) // 2000 rare keys
    val items = rnd.shuffle(heavy ++ tail)
    val n = items.size.toLong
    val capacity = 9
    val truth = exactCounts(items)
    val est = items.toDF("item").repartition(11).as[String]
      .select(Aggregators.misraGries(capacity).toColumn).head()
    assert(est.size <= capacity)
    val bound = n / (capacity + 1)
    est.foreach { case (k, c) =>
      val t = truth.getOrElse(k, 0L)
      assert(c <= t, s"$k overcounted: est $c > true $t")
      assert(c >= t - bound, s"$k undercounted past the bound: est $c, true $t")
    }
    // completeness: every item with true count > N/(capacity+1) is present
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(est.contains(k), s"true heavy hitter $k evicted")
    }
  }

  test("frequentItems: deterministic head order, nulls ignored, k-bounded") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(50)("b") ++ Seq.fill(10)("c") ++
      Seq[String](null)).toDF("item")
    val got = Analytics.frequentItems(df, "item", capacity = 16, k = 2).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 50L), ("b", 50L))) // tie broken item-asc, c cut by k
  }

  test("kmv is the exact sorted distinct set below k, partition-invariant") {
    val items = (1 to 500).map(i => (i % 40).toLong) // 40 distinct hashes
    val a = items.toDF("h").repartition(7).as[Long]
      .select(Aggregators.kmv(64).toColumn).head()
    assert(a.toSeq == (0L until 40L), "below-k sketch must BE the distinct set")
    val b = items.toDF("h").repartition(1).as[Long]
      .select(Aggregators.kmv(64).toColumn).head()
    assert(a.toSeq == b.toSeq, "partitioning must not change the sketch")
  }

  test("kmv keeps exactly the k smallest distinct values through merges") {
    val rnd = new scala.util.Random(7)
    val hashes = Seq.fill(5000)(rnd.nextLong(1L << 32))
    val expect = hashes.distinct.sorted.take(128)
    val got = hashes.toDF("h").repartition(13).as[Long]
      .select(Aggregators.kmv(128).toColumn).head()
    assert(got.toSeq == expect, "bottom-k must survive the merge path exactly")
  }

  test("kmvDistinct estimator lands within the published ~1/sqrt(k) band") {
    val df = (1 to 20000).map(i => ("g", s"tok$i")).toDF("g", "item")
    val r = Analytics.kmvDistinct(df, "item", Seq("g"), k = 256).head()
    val est = r.getAs[Double]("distinct_est")
    assert(r.getAs[Long]("n_tracked") == 256L)
    // standard error ≈ D/sqrt(k-2) ≈ 6.3%; allow 4σ
    assert(math.abs(est - 20000) / 20000.0 < 0.25, s"estimate off: $est")
    // and a small group is reported exactly
    val small = (1 to 10).map(i => ("s", s"t${i % 5}")).toDF("g", "item")
    val rs = Analytics.kmvDistinct(small, "item", Seq("g"), k = 256).head()
    assert(rs.getAs[Long]("n_tracked") == 5L)
    assert(rs.getAs[Double]("distinct_est") == 5.0)
    assert(rs.isNullAt(rs.fieldIndex("kth_hash")))
  }

  test("kmvOverlap: disjoint sets estimate ~zero overlap, identical sets Jaccard 1") {
    val a = (1 to 5000).map(i => s"a$i").toDF("item")
    val b = (1 to 5000).map(i => s"b$i").toDF("item")
    val disjoint = Analytics.kmvOverlap(a, b, "item", k = 256).head()
    assert(disjoint.getAs[Double]("jaccard_est") < 0.12,
      s"disjoint sets must estimate near-zero: $disjoint")
    val same = Analytics.kmvOverlap(a, a, "item", k = 256).head()
    assert(same.getAs[Double]("jaccard_est") == 1.0)
    assert(same.getAs[Double]("est_inter") == same.getAs[Double]("est_union"))
  }

  test("kmvOverlap: below-k sides are exact, estimator lands near true Jaccard") {
    // |A|=300, |B|=300, |A∩B|=150 → J = 150/450 = 1/3
    val a = (1 to 300).map(i => s"t$i").toDF("item")
    val b = (151 to 450).map(i => s"t$i").toDF("item")
    val r = Analytics.kmvOverlap(a, b, "item", k = 512).head()
    // k=512 > all cardinalities: every estimate is EXACT
    assert(r.getAs[Double]("est_a") == 300.0 && r.getAs[Double]("est_b") == 300.0)
    assert(r.getAs[Double]("est_union") == 450.0)
    assert(r.getAs[Double]("est_inter") == 150.0)
    assert(math.abs(r.getAs[Double]("jaccard_est") - 1.0 / 3) < 1e-6)
  }

  test("countMin never underestimates, bounds the overcount, merges exactly") {
    val rnd = new scala.util.Random(11)
    val items = Seq.fill(2000)("h" + rnd.nextInt(5)) ++
      Seq.fill(8000)("t" + rnd.nextInt(3000))
    val truth = exactCounts(items)
    val depth = 4; val width = 512
    val sketch = items.toDF("item").repartition(9).as[String]
      .select(Aggregators.countMin(depth, width).toColumn).head()
    val n = items.size
    val bound = math.ceil(math.E / width * n).toLong // εN, ε = e/width
    (truth.keys ++ Seq("never_seen")).foreach { k =>
      val est = Aggregators.countMinQuery(sketch, depth, width, k)
      val t = truth.getOrElse(k, 0L)
      assert(est >= t, s"$k underestimated: $est < $t")
      assert(est <= t + bound * 3, s"$k overcounted past 3x the bound: $est vs $t")
    }
    // partition-invariance: the sketch is identical however data splits
    val again = items.toDF("item").repartition(2).as[String]
      .select(Aggregators.countMin(depth, width).toColumn).head()
    assert(sketch.toSeq == again.toSeq)
  }

  test("countMinInnerProduct: join size never underestimated, exact at ample width") {
    val a = (Seq.fill(100)("x") ++ Seq.fill(10)("y") ++ Seq("only_a")).toDF("k")
    val b = (Seq.fill(7)("x") ++ Seq.fill(3)("y") ++ Seq("only_b")).toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.as[String].select(Aggregators.countMin(3, 4096).toColumn).head()
    val est = Aggregators.countMinInnerProduct(sk(a), sk(b), 3, 4096)
    val exact = 100 * 7 + 10 * 3 // only_a/only_b never pair
    assert(est >= exact, s"inner product must not underestimate: $est < $exact")
    // 4 distinct keys in 3x4096 cells: collisions essentially impossible
    assert(est == exact, s"ample width should be exact: $est vs $exact")
    // mismatched sketch shapes are rejected, not silently mis-multiplied
    intercept[IllegalArgumentException] {
      Aggregators.countMinInnerProduct(sk(a).take(24), sk(b), 3, 4096)
    }
  }

  test("kllSketch: exact below capacity, mergeable, size-bounded, error band at 100k") {
    val k = 256
    // ---- exactness below capacity: no compaction ever fires
    val small = new scala.util.Random(5).shuffle((1 to 200).toVector).map(_.toDouble)
    val agg = Aggregators.kllSketch(k)
    var buf = agg.zero
    small.foreach(v => buf = agg.reduce(buf, v))
    assert(buf.map(_.length).sum == 200 && buf(0).length == 200,
      "below capacity the sketch IS the sorted data")
    for (q <- Seq(0.0, 0.1, 0.5, 0.9, 1.0)) {
      val exact = math.max(1, math.ceil(q * 200).toInt) // rank-based
      assert(Aggregators.kllQuantile(buf, q) == exact.toDouble,
        s"q=$q must be exact below capacity")
    }
    // ---- merge: two halves merged == one legal sketch of the union
    val rnd = new scala.util.Random(11)
    val big = Array.fill(100000)(rnd.nextDouble() * 1000.0)
    val (h1, h2) = big.splitAt(big.length / 2)
    def build(xs: Array[Double]): Array[Array[Double]] = {
      var b = agg.zero
      xs.foreach(v => b = agg.reduce(b, v))
      b
    }
    val merged = agg.merge(build(h1), build(h2))
    // size bound: O(k log(n/k)) — every level holds at most k items
    assert(merged.forall(_.length <= k), "no level may exceed capacity post-merge")
    assert(merged.length <= (math.log(big.length.toDouble / k) / math.log(2)).toInt + 3,
      s"level count stays logarithmic: ${merged.length}")
    // weight conservation: compaction halves weight-preservingly
    val totalW = merged.zipWithIndex.map { case (l, i) => l.length.toLong << i }.sum
    assert(totalW == big.length.toLong, s"total weight must be n: $totalW")
    // ---- error band (empirical, well inside the log^2(n/k)/k envelope)
    val sorted = big.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val est = Aggregators.kllQuantile(merged, q)
      val rank = sorted.count(_ <= est)
      assert(math.abs(rank - q * big.length) <= 0.02 * big.length,
        s"q=$q: rank $rank vs target ${q * big.length}")
    }
    // ---- the same band through Spark's partial aggregation (8 partitions)
    val udafCol = org.apache.spark.sql.functions.udaf(
      Aggregators.kllQuantiles(k, Seq(0.5, 0.9)))
    val ests = big.toSeq.toDF("v").repartition(8)
      .agg(udafCol(col("v"))).head().getSeq[Double](0)
    for (((q, est), _) <- Seq(0.5, 0.9).zip(ests).zipWithIndex) {
      val rank = sorted.count(_ <= est)
      assert(math.abs(rank - q * big.length) <= 0.02 * big.length,
        s"spark path q=$q: rank $rank")
    }
    // empty sketch → NaN, bad q rejected
    assert(Aggregators.kllQuantile(agg.zero, 0.5).isNaN)
    intercept[IllegalArgumentException] { Aggregators.kllQuantile(merged, 1.5) }
  }

  test("cmsCounts reports exact heavy counts and zero for absent probes at ample width") {
    val df = (Seq.fill(500)("big") ++ Seq.fill(7)("rare")).toDF("item")
    val got = Analytics.cmsCounts(df, "item", Seq("big", "rare", "ghost"),
        depth = 3, width = 4096)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 2 distinct items in 3x4096 cells: collisions essentially impossible
    assert(got("big") == ((500L, 500L, 0L)))
    assert(got("rare") == ((7L, 7L, 0L)))
    assert(got("ghost") == ((0L, 0L, 0L)))
  }

  test("cmsJoinSizeEstimate: exact inner product, never-under estimate, null/empty sides") {
    // f_A = {x:3, y:2, z:1}, f_B = {x:2, z:4, w:5} → Σ f_A·f_B = 10
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("z"))
      .toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(4)("z") ++ Seq.fill(5)("w"))
      .toDF("k")
    val r = Analytics.cmsJoinSizeEstimate(a, "k", b, "k",
      depth = 3, width = 2048).head()
    assert(r.getLong(1) == 10L, s"exact_n: $r")
    // 4 distinct keys in 3x2048 cells: no collisions, estimate exact
    assert(r.getLong(0) == 10L && r.getLong(2) == 0L, s"est/overcount: $r")
    // nulls are excluded like the oracle's IS NOT NULL; an all-null
    // side is the empty sketch (est 0, exact 0)
    val nulls = Seq[Option[String]](None, None).toDF("k")
    val rn = Analytics.cmsJoinSizeEstimate(a, "k", nulls, "k").head()
    assert(rn.getLong(0) == 0L && rn.getLong(1) == 0L, s"empty side: $rn")
  }
}
