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

  /** IVF (inverted-file) index: k centroids fitted with a few Lloyd
    * iterations (deterministic seed selection by id-hash), plus the
    * cluster assignment per vector. Centroids are a tiny driver-side
    * model (k × dim doubles); assignments are a DataFrame. At 100 TB,
    * write the corpus partitioned by `cluster` and ANN probes become
    * partition-pruned scans — the IVF alternative to the hyperplane-LSH
    * path.
    */
  final case class IvfIndex(centroids: Array[Array[Double]], assignments: DataFrame)

  def ivfIndex(df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, iterations: Int = 2,
      fitSampleFraction: Double = 0.05, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.sql.Row
    // Fit on a sample, assign the full corpus exactly once at the end:
    // the model is only k×dim doubles, so a few-percent sample is
    // plenty for k ≤ 4096, and it keeps the per-Lloyd-iteration
    // posexplode+shuffle off the full corpus (at 100 TB the fit cost
    // becomes O(sample), not O(corpus × iterations)).
    val fitDf = (if (fitSampleFraction >= 1.0) df
      else df.sample(withReplacement = false, fitSampleFraction, seed))
      .select(col(idCol), col(vecCol))
      .localCheckpoint(false) // small; re-read every iteration

    // deterministic seeds: sample vectors with the smallest id-hash
    var centroids: Array[Array[Double]] = fitDf
      .orderBy(xxhash64(col(idCol)))
      .limit(nCentroids)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(centroids.nonEmpty,
      s"ivfIndex: sample fraction $fitSampleFraction yielded no rows to seed centroids")

    // One custom expression, not a per-centroid least(struct…) ladder:
    // the ladder's O(k) expression tree chokes analysis/codegen at the
    // k=256-4096 an IVF index actually wants, while the matrix inside
    // one expression ships via the stage's broadcast task binary.
    // Assignment semantics (float-rounded normalize, lowest-index tie
    // break) are bit-identical — see NearestCentroid's scaladoc.
    def assign(target: DataFrame, c: Array[Array[Double]]): DataFrame =
      target.withColumn("cluster",
        graft.functions.CatalystExpressions.nearestCentroid(col(vecCol), c))

    var it = 0
    while (it < iterations) {
      // recompute centroids as per-cluster dimension means (k×dim
      // values — a tiny aggregate over the sample, collected as the
      // updated model)
      val assigned = assign(fitDf, centroids)
      val means = assigned
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .collect()
      val dim = centroids.head.length
      val next = centroids.zipWithIndex.map { case (old, ci) =>
        val mine = means.filter(_.getInt(0) == ci)
        if (mine.isEmpty) old
        else {
          val arr = new Array[Double](dim)
          mine.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          // normalize so cosine against centroids is a plain dot
          val n = math.sqrt(arr.map(x => x * x).sum)
          if (n > 0) arr.map(_ / n) else old
        }
      }
      centroids = next
      it += 1
    }
    IvfIndex(centroids, assign(df, centroids).select(col(idCol), col("cluster")))
  }

  /** IVF ANN probe: rank centroids against the query (driver-side,
    * k dot products), brute-force only the `nProbe` nearest clusters.
    */
  def knnIvf(df: DataFrame, index: IvfIndex, idCol: String, vecCol: String,
      query: Array[Double], k: Int = 10, nProbe: Int = 3): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qUnit = if (qn > 0) query.map(_ / qn) else query
    val ranked = index.centroids.zipWithIndex
      .map { case (c, i) => i -> c.zip(qUnit).map { case (a, b) => a * b }.sum }
      .sortBy(-_._2).take(nProbe).map(_._1).toSet
    val probed = df.join(
      index.assignments.filter(col("cluster").isin(ranked.toSeq: _*)), Seq(idCol))
    knnBrute(probed, idCol, vecCol, query, k)
  }

  /** All-pairs cosine ≥ threshold between two corpora via shared LSH
    * buckets (e.g. query-set vs corpus linking). Buckets hash the raw
    * vectors (sign bits are scale-invariant, so normalization buys
    * nothing there) and the output cosine is computed from the raw
    * vectors too — the float-cast re-normalize would inject ~1e-7
    * noise into a value the oracle recomputes exactly.
    *
    * Scale shape matches [[Dedup.embeddingNearDuplicates]]: `bands > 1`
    * is the AND-OR construction (band b hashes with planes seeded
    * `seed + b`; a pair is a candidate if it collides in ANY band), so
    * recall at a given cosine is tuned by adding bands instead of
    * loosening every bucket; and BOTH sides are bucket-capped — a
    * (band, bucket) hot on either side is boilerplate (near-zero
    * vectors, templated embeddings) whose |L|×|R| pair fan-out would
    * dominate the join at corpus scale, so its rows are dropped from
    * candidate generation on that side.
    */
  def crossSimilarity(left: DataFrame, right: DataFrame, idA: String, idB: String,
      vecCol: String, minCosine: Double, nPlanes: Int = 8, dim: Int = 64,
      seed: Long = 42L, bands: Int = 1,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    require(bands >= 1, "bands must be >= 1")
    def bucketize(df: DataFrame, id: String, outId: String, outV: String): DataFrame = {
      val base = df.select(col(id).as(outId), col(vecCol).as(outV))
      val bandStructs = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          VectorFunctions.hyperplaneBucket(col(outV),
            VectorFunctions.randomPlanes(nPlanes, dim, seed + b)).as("bucket"))
      }
      base.select(col(outId), col(outV), explode(array(bandStructs: _*)).as("lsh"))
        .select(col(outId), col(outV), col("lsh.band"), col("lsh.bucket"))
    }
    val l = Dedup.capBucketsPartitioned(bucketize(left, idA, "id_a", "v_a"),
      Seq("band", "bucket"), maxBucketSize)
    val r = Dedup.capBucketsPartitioned(bucketize(right, idB, "id_b", "v_b"),
      Seq("band", "bucket"), maxBucketSize)
    l.join(r, Seq("band", "bucket"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosine(col("v_a"), col("v_b")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .distinct()
  }
}
