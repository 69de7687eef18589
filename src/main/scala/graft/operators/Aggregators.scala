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
}
