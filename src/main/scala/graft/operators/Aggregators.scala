package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (§2.8 / §7.3) — the
  * user-facing custom-aggregate API the reference lacks (its
  * aggregation is all hardcoded, SURVEY §2.8 "UDAF analog").
  */
object Aggregators {

  /** Weighted progress Σwᵢpᵢ/Σwᵢ with the reference's `max(1, …)`
    * zero-guard (`outcome_aggregator.py:246-295`) as a typed
    * Aggregator: usable via `ds.select(weightedProgress.toColumn)` or
    * registered for SQL. The column-math form in [[Analytics]] is the
    * codegen-friendly default; this is the typed API.
    */
  val weightedProgress: Aggregator[(Double, Double), (Double, Double), Double] =
    new Aggregator[(Double, Double), (Double, Double), Double] {
      override def zero: (Double, Double) = (0.0, 0.0)
      override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
        (b._1 + in._1 * in._2, b._2 + in._1)
      override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
        (a._1 + b._1, a._2 + b._2)
      override def finish(r: (Double, Double)): Double = r._1 / math.max(r._2, 1.0)
      override def bufferEncoder: Encoder[(Double, Double)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Order-insensitive set fingerprint: XOR of element hashes — the
    * dedup-class fingerprint aggregate (distributed, one pass,
    * mergeable — HLL-style algebraic structure).
    */
  val xorFingerprint: Aggregator[Long, Long, Long] =
    new Aggregator[Long, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, in: Long): Long =
        b ^ graft.functions.CatalystExpressions.splitmix64(in)
      override def merge(a: Long, b: Long): Long = a ^ b
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; merge rule
    * from Agrawal/Cormode et al., "Mergeable Summaries", PODS'12) as a
    * mergeable typed Aggregator: at most `capacity` counters, O(total
    * items) work, fixed memory — the way to ask "what are the frequent
    * domains / tokens / user agents" over 100 TB without shuffling a
    * full (item, count) aggregate when the item cardinality is huge
    * and only the head matters.
    *
    * Guarantee (N = stream length): every reported count `est`
    * satisfies `true - N/(capacity+1) ≤ est ≤ true`, and every item
    * with `true > N/(capacity+1)` is present in the summary. When the
    * DISTINCT item count never exceeds `capacity` on any partition nor
    * after any merge, no counter is ever decremented and counts are
    * EXACT — the property the oracle gate exercises; the spec covers
    * the lossy regime.
    *
    * reduce: hit → +1; miss with room → insert 1; miss when full →
    * decrement ALL counters (dropping zeros) instead of inserting —
    * O(capacity), amortized O(1) per decremented count.
    * merge: sum counts, then if over capacity subtract the
    * (capacity+1)-th largest count from every counter and drop ≤ 0 —
    * the summary-error composition that keeps the bound additive.
    */
  def misraGries(capacity: Int): Aggregator[String, Map[String, Long], Map[String, Long]] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      override def zero: Map[String, Long] = Map.empty
      override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
        b.get(item) match {
          case Some(c) => b.updated(item, c + 1L)
          case None if b.size < capacity => b.updated(item, 1L)
          case None =>
            b.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
        }
      override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val sum = b.foldLeft(a) { case (m, (k, c)) =>
          m.updated(k, m.getOrElse(k, 0L) + c)
        }
        if (sum.size <= capacity) sum
        else {
          // subtract the (capacity+1)-th largest count; ≥1 counter
          // drops to ≤0 so the result is within capacity again
          val kth = sum.valuesIterator.toArray.sortBy(-_).apply(capacity)
          sum.flatMap { case (k, c) => if (c > kth) Some(k -> (c - kth)) else None }
        }
      }
      override def finish(r: Map[String, Long]): Map[String, Long] = r
      override def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
      override def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }
  }

  /** KMV (k-minimum-values / bottom-k) distinct sketch (Bar-Yossef et
    * al. 2002; Beyer et al. SIGMOD'07 "unbiased KMV"): keep the `k`
    * smallest DISTINCT hash values seen. O(k) state, exactly mergeable
    * (merge = sorted-union, keep k smallest — the union sketch IS the
    * sketch of the union, so partial aggregation composes losslessly),
    * which is what HLL gives up: KMV also supports intersection
    * estimates via the inclusion–exclusion over the k-min union.
    *
    * Input is the HASH (caller hashes, e.g. [[TextOps.portableHash]]'s
    * md5-prefix uint32 — deterministic and restatable in any engine,
    * so a DuckDB oracle can replay the sketch bit-for-bit). Output is
    * the sorted bottom-k array; the estimator is a pure function of it
    * (see [[Analytics.kmvDistinct]]): |D| ≈ (k−1)·H/h₍k₎ for hash
    * space [0, H).
    *
    * reduce: binary-search insert, dedup, cap k — O(log k) search +
    * O(k) shift only when the value actually lands in the bottom-k
    * (for a stream far larger than k, almost never).
    */
  def kmv(k: Int): Aggregator[Long, Array[Long], Array[Long]] = {
    require(k >= 2, s"k must be >= 2, got $k")
    new Aggregator[Long, Array[Long], Array[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray
      override def reduce(b: Array[Long], h: Long): Array[Long] = {
        val n = b.length
        if (n == k && h >= b(n - 1)) return b
        val i = java.util.Arrays.binarySearch(b, h)
        if (i >= 0) return b // already tracked
        val ins = -i - 1
        val out = new Array[Long](math.min(n + 1, k))
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, out.length - ins - 1)
        out
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        if (a.isEmpty) return b
        if (b.isEmpty) return a
        val out = new Array[Long](math.min(a.length + b.length, k))
        var (i, j, o) = (0, 0, 0)
        var last = Long.MinValue
        while (o < out.length && (i < a.length || j < b.length)) {
          val v =
            if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
            else { val x = b(j); j += 1; x }
          if (o == 0 || v != last) { out(o) = v; o += 1; last = v }
        }
        if (o == out.length) out else java.util.Arrays.copyOf(out, o)
      }
      override def finish(r: Array[Long]): Array[Long] = r
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }

  /** Count–min sketch (Cormode & Muthukrishnan 2005): `depth` hash
    * rows × `width` counters; every item increments one counter per
    * row, a point query reads the MINIMUM of its `depth` counters —
    * an overestimate by at most εN (ε = e/width) with probability
    * 1 − δ (δ = e^−depth), never an underestimate. The complement of
    * [[misraGries]]: MG answers "which items are frequent", CMS
    * answers "how frequent is THIS item" for any item, including ones
    * MG evicted.
    *
    * Merge is cell-wise addition — exact, so partial aggregation
    * composes losslessly and sketches built on different corpora
    * add. State is a fixed depth×width Long array regardless of
    * stream size.
    *
    * Hashing is the engine-portable md5 prefix (seed `"cms<row>"`,
    * same scheme as [[kmv]]/`TextOps.portableHash`), so an external
    * engine can rebuild the identical sketch cell-for-cell — the q122
    * oracle does exactly that in DuckDB.
    */
  def countMin(depth: Int, width: Int): Aggregator[String, Array[Long], Array[Long]] = {
    require(depth >= 1 && width >= 2, s"bad CMS shape: $depth x $width")
    new Aggregator[String, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](depth * width)
      override def reduce(b: Array[Long], item: String): Array[Long] = {
        var d = 0
        while (d < depth) {
          b(d * width + CmsHash.cell(item, d, width)) += 1L
          d += 1
        }
        b
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      override def finish(r: Array[Long]): Array[Long] = r
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }

  /** Point estimate from a [[countMin]] summary: min over the item's
    * `depth` cells. Pure function of (sketch, item) — runs driver-side
    * on the collected summary or inside an expression.
    */
  def countMinQuery(sketch: Array[Long], depth: Int, width: Int,
      item: String): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + CmsHash.cell(item, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }

  /** Inner-product estimate from two [[countMin]] summaries built with
    * the SAME (depth, width): min over rows of Σ_w a[d][w]·b[d][w] —
    * the Cormode–Muthukrishnan estimator for Σ_k f_A(k)·f_B(k), which
    * is EXACTLY the row count of the equi-join A ⋈ B on that key.
    * One-sided like the point query: never under the true size,
    * over by at most εN_A·N_B per colliding mass. The join-planning
    * primitive: estimate a join's output from two O(depth·width)
    * summaries without touching either table again.
    */
  def countMinInnerProduct(a: Array[Long], b: Array[Long], depth: Int,
      width: Int): Long = {
    require(a.length == depth * width && b.length == depth * width,
      s"sketch shape mismatch: ${a.length}/${b.length} vs ${depth}x$width")
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      var s = 0L
      var w = 0
      while (w < width) { s += a(d * width + w) * b(d * width + w); w += 1 }
      if (s < best) best = s
      d += 1
    }
    best
  }

  /** KLL-style mergeable quantile sketch (Karnin–Lang–Liberty, FOCS'16
    * — the compactor hierarchy, with a FIXED per-level capacity `k`
    * and a data-derived compaction offset instead of a random coin):
    * level i holds items of weight 2^i; inserting goes to level 0;
    * when a level exceeds `k` its sorted even-prefix is halved —
    * alternate items survive to level i+1, the parity chosen from the
    * smallest item's bit pattern, so the sketch is a deterministic
    * function of the (partition, merge-order) history with no RNG
    * state to replay. Merge = level-wise sorted union + the same
    * compaction rule, so partial aggregation composes and sketches
    * built on different corpora add — the quantile companion of
    * [[kmv]]/[[misraGries]]/[[countMin]], closing the "global
    * percentile without a global sort" gap that q59 leans on Spark's
    * internal percentile_approx for.
    *
    * Guarantees: EXACT below capacity (no compaction until level 0
    * exceeds `k` — SketchSpec locks this); once compacting, each
    * level-i halving perturbs any rank by ≤ 2^i, giving the classic
    * ~log²(n/k)/k rank-error envelope (the spec asserts an empirical
    * band well inside it). State is O(k·log(n/k)) doubles. Like every
    * sketch here, the raw state is the output; estimators are pure
    * functions of it ([[kllQuantile]]), and exposed gate values
    * follow the q59 boolean discipline (merge order can nudge the
    * estimate inside the band, never out of it).
    *
    * Input contract: finite doubles (filter NaN first — NaN has no
    * rank). Levels are kept sorted at all times.
    */
  def kllSketch(k: Int): Aggregator[Double, Array[Array[Double]], Array[Array[Double]]] = {
    require(k >= 8, s"k must be >= 8, got $k")
    new Aggregator[Double, Array[Array[Double]], Array[Array[Double]]] {
      override def zero: Array[Array[Double]] = Array(Array.emptyDoubleArray)
      override def reduce(b: Array[Array[Double]], v: Double): Array[Array[Double]] = {
        val l0 = b(0)
        val i = java.util.Arrays.binarySearch(l0, v)
        val ins = if (i >= 0) i else -i - 1
        val out = new Array[Double](l0.length + 1)
        System.arraycopy(l0, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(l0, ins, out, ins + 1, l0.length - ins)
        b(0) = out
        compact(b)
      }
      override def merge(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
        val levels = math.max(a.length, b.length)
        val out = new Array[Array[Double]](levels)
        var i = 0
        while (i < levels) {
          val x = if (i < a.length) a(i) else Array.emptyDoubleArray
          val y = if (i < b.length) b(i) else Array.emptyDoubleArray
          out(i) = mergeSorted(x, y)
          i += 1
        }
        compact(out)
      }
      override def finish(r: Array[Array[Double]]): Array[Array[Double]] = r
      override def bufferEncoder: Encoder[Array[Array[Double]]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Array[Double]]]()
      override def outputEncoder: Encoder[Array[Array[Double]]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Array[Double]]]()

      private def mergeSorted(x: Array[Double], y: Array[Double]): Array[Double] = {
        if (x.isEmpty) return y
        if (y.isEmpty) return x
        val out = new Array[Double](x.length + y.length)
        var (i, j, o) = (0, 0, 0)
        while (i < x.length || j < y.length) {
          out(o) =
            if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
            else { val v = y(j); j += 1; v }
          o += 1
        }
        out
      }

      // halve every over-capacity level, lowest first (a halving can
      // push level i+1 over, so sweep upward; one sweep suffices
      // because each level at most doubles once per call)
      private def compact(b0: Array[Array[Double]]): Array[Array[Double]] = {
        var b = b0
        var i = 0
        while (i < b.length) {
          if (b(i).length > k) {
            val lvl = b(i)
            val m = lvl.length - (lvl.length & 1) // even prefix; odd leftover stays
            // deterministic data-derived parity — no RNG state in the
            // buffer, unbiased across heterogeneous inputs
            val off = (java.lang.Double.doubleToLongBits(lvl(0)) >>> 17 & 1L).toInt
            val survivors = new Array[Double]((m - off + 1) / 2)
            var s = 0
            var j = off
            while (j < m) { survivors(s) = lvl(j); s += 1; j += 2 }
            val rest =
              if (m < lvl.length) Array(lvl(lvl.length - 1)) else Array.emptyDoubleArray
            b(i) = rest
            if (i + 1 == b.length) b = b :+ Array.emptyDoubleArray
            b(i + 1) = mergeSorted(b(i + 1), survivors)
          }
          i += 1
        }
        b
      }
    }
  }

  /** Quantile estimate from a [[kllSketch]] summary: weighted rank walk
    * over the level hierarchy (level i items count 2^i), returning the
    * smallest value whose cumulative weight reaches q·W. Pure function
    * of (sketch, q) — driver-side on the collected summary, like
    * [[countMinQuery]]. q ∈ [0, 1]; empty sketch → NaN.
    */
  def kllQuantile(levels: Array[Array[Double]], q: Double): Double = {
    require(q >= 0 && q <= 1, s"q must be in [0,1]: $q")
    var total = 0L
    var i = 0
    while (i < levels.length) {
      total += levels(i).length.toLong << i
      i += 1
    }
    if (total == 0L) return Double.NaN
    // gather (value, weight), sort by value — sketch sizes are
    // O(k log n), trivially driver-sized
    val flat = new Array[(Double, Long)](levels.map(_.length).sum)
    var o = 0
    i = 0
    while (i < levels.length) {
      levels(i).foreach { v => flat(o) = (v, 1L << i); o += 1 }
      i += 1
    }
    val sorted = flat.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var j = 0
    while (j < sorted.length) {
      cum += sorted(j)._2
      if (cum >= target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }

  /** [[kllSketch]] with the estimator fused into `finish`: the
    * aggregation returns the quantile estimates for `qs` directly —
    * the query-facing form (q151), keeping the raw-sketch form for
    * state that must keep merging.
    */
  def kllQuantiles(k: Int, qs: Seq[Double]): Aggregator[Double, Array[Array[Double]], Array[Double]] = {
    require(qs.nonEmpty, "qs must be non-empty")
    val base = kllSketch(k)
    new Aggregator[Double, Array[Array[Double]], Array[Double]] {
      override def zero: Array[Array[Double]] = base.zero
      override def reduce(b: Array[Array[Double]], v: Double): Array[Array[Double]] =
        base.reduce(b, v)
      override def merge(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
        base.merge(a, b)
      override def finish(r: Array[Array[Double]]): Array[Double] =
        qs.map(q => kllQuantile(r, q)).toArray
      override def bufferEncoder: Encoder[Array[Array[Double]]] = base.bufferEncoder
      override def outputEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    }
  }
}

/** The portable md5-prefix cell hash shared by the CMS reduce path and
  * any external replay: first 8 hex chars of md5("cms<row>:<item>")
  * as uint32, mod width — identical to
  * `CAST(('0x'||substr(md5('cms'||d||':'||item),1,8)) AS BIGINT) % width`
  * in DuckDB.
  */
private[operators] object CmsHash {
  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  def cell(item: String, row: Int, width: Int): Int = {
    val md = mdLocal.get()
    md.reset()
    val digest = md.digest(s"cms$row:$item".getBytes("UTF-8"))
    // first 4 bytes as uint32 == the first 8 hex chars of the md5 string
    val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
    (h % width).toInt
  }
}
