package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over embedding columns — the
  * beyond-reference similarity-search mandate (the reference only has
  * provider-side neural search, `exa_search_tool.py:84-340`).
  *
  * Scale design: the query vector is a literal (broadcast by
  * definition); brute force is one scan + TakeOrderedAndProject (top-k
  * never sorts globally). The LSH variant prunes the scan to matching
  * buckets — at 100 TB, bucket the corpus once at ingest (write
  * partitioned by bucket) and ANN probes become partition-pruned scans.
  */
object Similarity {

  /** Brute-force cosine top-k: exact baseline. */
  def knnBrute(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int = 10): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol), round(VectorFunctions.cosine(col(vecCol), q), 6).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Random-hyperplane LSH ANN: probe only buckets within `probeHamming`
    * sign-bit flips of the query's bucket (multi-probe). Recall rises
    * with `probeHamming`; cost is the fraction of buckets probed.
    */
  def knnLsh(df: DataFrame, idCol: String, vecCol: String, query: Array[Double],
      k: Int = 10, nPlanes: Int = 8, probeHamming: Int = 1,
      seed: Long = 42L): DataFrame = {
    val planes = VectorFunctions.randomPlanes(nPlanes, query.length, seed)
    val qBucket = planes.zipWithIndex.map { case (p, j) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0.0) 1L << j else 0L
    }.sum
    val bucketed = df.withColumn("bucket",
      VectorFunctions.hyperplaneBucket(col(vecCol), planes))
    val probed = bucketed.filter(
      bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
    knnBrute(probed, idCol, vecCol, query, k)
  }

  /** All-pairs cosine ≥ threshold between two corpora via shared LSH
    * buckets (e.g. query-set vs corpus linking).
    */
  def crossSimilarity(left: DataFrame, right: DataFrame, idA: String, idB: String,
      vecCol: String, minCosine: Double, nPlanes: Int = 8, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = VectorFunctions.randomPlanes(nPlanes, dim, seed)
    val l = left.select(col(idA).as("id_a"),
      VectorFunctions.l2Normalize(col(vecCol)).as("v_a"))
      .withColumn("bucket", VectorFunctions.hyperplaneBucket(col("v_a"), planes))
    val r = right.select(col(idB).as("id_b"),
      VectorFunctions.l2Normalize(col(vecCol)).as("v_b"))
      .withColumn("bucket", VectorFunctions.hyperplaneBucket(col("v_b"), planes))
    l.join(r, Seq("bucket"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.dot(col("v_a"), col("v_b")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .distinct()
  }
}
