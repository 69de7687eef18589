package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely
  * from codegen'd higher-order functions (`zip_with` / `aggregate`) —
  * no UDFs, so whole-stage codegen stays intact and the expressions
  * survive on a 1000-executor cluster unchanged.
  *
  * Reference surface: semantic similarity search over embeddings
  * (`tools/src/aden_tools/tools/exa_search_tool/exa_search_tool.py:188`
  * is provider-side; the math itself is new, per the 100 TB mandate).
  */
object VectorFunctions {

  /** Sum of elementwise products, accumulated left-to-right in double.
    * Backed by a custom Catalyst expression (tight JVM loop); the
    * `aggregate(zip_with(...))` formulation is semantically identical
    * but evaluates interpreted lambdas per element.
    */
  def dot(a: Column, b: Column): Column = CatalystExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero-norm vectors instead of NaN. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** L2-normalize once up front so later similarity passes are a pure
    * dot product — the cheap half of the work at scale.
    */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
  }

  /** Sign bits of `vec` against `planes` (random-hyperplane LSH): bit j
    * = 1 iff dot(vec, planes(j)) >= 0. Returns an int bucket id.
    * Cosine-similar vectors collide with high probability — the
    * standard SimHash-for-vectors construction (Charikar, STOC 2002).
    */
  def hyperplaneBucket(vec: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val plane = array(p.map(lit): _*)
      when(dot(vec, plane) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic pseudo-random unit hyperplanes (fixed seed). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    (0 until nPlanes).map { _ =>
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }
}
