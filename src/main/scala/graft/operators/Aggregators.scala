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
}
