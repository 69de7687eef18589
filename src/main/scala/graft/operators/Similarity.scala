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
  * never sorts globally). The LSH and IVF variants prune the scan to
  * matching buckets/clusters — at 100 TB, bucket the corpus once at
  * ingest (write partitioned by bucket/cluster) and ANN probes become
  * partition-pruned scans. The PQ family ([[pqFit]]/[[pqKnn]]/
  * [[ensureIvfPqLayout]]) adds the memory answer on top: m-byte codes
  * per vector, asymmetric-distance candidate scoring, exact re-rank.
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

  /** Hard-negative mining for contrastive / embedding training: for
    * each query vector, the top-k most-similar corpus vectors that are
    * NOT its labeled positives — the negatives that actually teach the
    * model, versus random negatives it already separates. Positive
    * pairs are excluded by an anti-join on (query, doc) BEFORE the
    * per-query top-k, so a positive can never crowd out a negative.
    *
    * Scale shape: the query side is broadcast (mining runs per
    * training batch — hundreds to thousands of queries), scores are a
    * map-side projection over the corpus scan, per-query top-k is a
    * rank-1..k WindowGroupLimit (never a full sort of the scored
    * space). For query sets too large to broadcast, generate
    * candidates with [[crossSimilarity]]'s banded join first and rank
    * those — same output contract.
    *
    * Output: (qIdCol, idCol, cosine, rank), rank 1..k per query.
    */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      positives: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(qIdCol), col(qVecCol).as("__qv")))
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(q)
      .withColumn("cosine",
        round(VectorFunctions.cosine(col(vecCol), col("__qv")), 6))
      .join(positives.select(col(qIdCol), col(idCol)),
        Seq(qIdCol, idCol), "left_anti")
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(desc("cosine"), col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("cosine"), col("rank"))
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

    // Lloyd loop as ONE treeAggregate job per iteration over a cached
    // sample RDD: the earlier posexplode+groupBy+collect form paid 2-3
    // AQE stage-jobs per iteration for a model-sized (k×dim) result —
    // serial driver round-trips that dominated the warm fit. The
    // per-partition accumulator is the k-means standard (k×dim sums +
    // k counts, exactly what MLlib's fit aggregates); assignment calls
    // the SAME ExprKernels.nearestCentroid the scoring expression
    // uses, so fit-time and assignment-time semantics can't drift.
    val dim = centroids.head.length
    val nC = centroids.length
    val vecs = fitDf.select(col(vecCol)).rdd
      .map(_.getSeq[Any](0))
      .filter(_.nonEmpty)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sc = df.sparkSession.sparkContext
    var it = 0
    while (it < iterations) {
      val bc = sc.broadcast(centroids)
      val (sums, cnts) = vecs.treeAggregate(
        (Array.fill(nC)(new Array[Double](dim)), new Array[Long](nC)))(
        seqOp = { case ((s, n), v) =>
          val arr = v.toArray
          val isFloat = arr(0).isInstanceOf[Float]
          val ci = graft.functions.ExprKernels.nearestCentroid(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(arr),
            bc.value, isFloat)
          if (ci >= 0) {
            var j = 0
            while (j < arr.length && j < dim) {
              s(ci)(j) += arr(j).asInstanceOf[Number].doubleValue()
              j += 1
            }
            n(ci) += 1
          }
          (s, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var c = 0
          while (c < nC) {
            var j = 0
            while (j < dim) { s1(c)(j) += s2(c)(j); j += 1 }
            n1(c) += n2(c)
            c += 1
          }
          (s1, n1)
        })
      bc.destroy()
      centroids = centroids.zipWithIndex.map { case (old, ci) =>
        if (cnts(ci) == 0L) old
        else {
          val arr = sums(ci).map(_ / cnts(ci))
          // normalize so cosine against centroids is a plain dot
          val n = math.sqrt(arr.map(x => x * x).sum)
          if (n > 0) arr.map(_ / n) else old
        }
      }
      it += 1
    }
    vecs.unpersist(blocking = false)
    IvfIndex(centroids, assign(df, centroids).select(col(idCol), col("cluster")))
  }

  /** IVF ANN probe: rank centroids against the query (driver-side,
    * k dot products), brute-force only the `nProbe` nearest clusters.
    *
    * The probe filters on the assignment EXPRESSION directly (cluster
    * is a pure function of the vector and the fixed centroid matrix),
    * not by joining `index.assignments` back on the id — same result,
    * but the plan is a map-only filter + TakeOrderedAndProject with
    * ZERO shuffles instead of an id equi-join. The materialized
    * assignments exist for [[ivfWriteLayout]], where clusters become
    * partition directories and probes prune at planning time instead.
    */
  def knnIvf(df: DataFrame, index: IvfIndex, idCol: String, vecCol: String,
      query: Array[Double], k: Int = 10, nProbe: Int = 3): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qUnit = if (qn > 0) query.map(_ / qn) else query
    val ranked = index.centroids.zipWithIndex
      .map { case (c, i) => i -> c.zip(qUnit).map { case (a, b) => a * b }.sum }
      .sortBy(-_._2).take(nProbe).map(_._1)
    val probed = df.filter(
      graft.functions.CatalystExpressions.nearestCentroid(col(vecCol), index.centroids)
        .isin(ranked: _*))
    knnBrute(probed, idCol, vecCol, query, k)
  }

  // ----------------------------------------- partition-pruned probes
  //
  // The at-scale form of ANN: bucket/cluster the corpus ONCE at ingest
  // and write it `partitionBy` that column; a probe then reads only
  // the matching partition directories (planning-time pruning — the
  // scan's `PartitionFilters`), instead of scanning the corpus and
  // filtering. At 100 TB a per-query full scan is the difference
  // between touching ~nProbe/k of the bytes and touching all of them.

  // Weak session keys + stopped-context purge (see SessionMemo); the
  // memo only avoids re-CHECKING the filesystem per query — existence
  // of the layout's meta file is the durable source of truth.
  private val layoutBuilt = new graft.core.SessionMemo[java.lang.Boolean]

  /** Does `path` exist on the session's Hadoop filesystem? */
  private def pathExists(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def writeJson(spark: org.apache.spark.sql.SparkSession, path: String,
      obj: Map[String, Any]): Unit = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true)
    try out.write(org.json4s.jackson.Serialization.write(obj).getBytes("UTF-8"))
    finally out.close()
  }

  private def readJson(spark: org.apache.spark.sql.SparkSession,
      path: String): org.json4s.JValue = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    org.json4s.jackson.JsonMethods.parse(text)
  }

  /** Write the durable IVF layout under `path`: the corpus partitioned
    * by cluster assignment (`corpus/cluster=N/…`) plus the centroid
    * matrix as JSON metadata — everything [[knnIvfPartitioned]] needs
    * in a later session without the fitting corpus.
    */
  def ivfWriteLayout(df: DataFrame, index: IvfIndex, idCol: String,
      vecCol: String, path: String): Unit = {
    Scale.writePartitioned(df.join(index.assignments, Seq(idCol)),
      s"$path/corpus", Seq("cluster"))
    // fit-time distance distribution (mean/p95 of 1 − nearest-centroid
    // similarity over the stored corpus): the baseline ivfDrift
    // compares incremental batches against, so the caller-owned re-fit
    // decision has a signal instead of a guess. One extra aggregate
    // over a frame this write already scans.
    val dist = lit(1.0) -
      graft.functions.CatalystExpressions.nearestCentroidSim(col(vecCol), index.centroids)
    val stats = df.agg(avg(dist).as("m"),
      percentile_approx(dist, lit(0.95), lit(10000)).as("p")).head()
    writeJson(df.sparkSession, s"$path/ivf_meta.json",
      Map("centroids" -> index.centroids.map(_.toSeq).toSeq,
        "fit_dist_mean" -> stats.getDouble(0),
        "fit_dist_p95" -> stats.getDouble(1)))
  }

  /** Centroid-drift report for an incremental batch against a durable
    * IVF layout: `batchMean` is the batch's mean distance
    * (1 − nearest-centroid similarity, the assignment's own measure)
    * under the PERSISTED centroids; `fitMean`/`fitP95` are the
    * fit-time distribution stored by [[ivfWriteLayout]]. A ratio near
    * 1 means the batch looks like the fit corpus (append freely);
    * sustained ratios well above 1 — or `batchMean` beyond `fitP95` —
    * say the fixed centroids no longer describe the data and the
    * caller should schedule the re-fit that [[ivfAppend]] deliberately
    * never does on its own.
    */
  final case class IvfDriftReport(batchMean: Double, fitMean: Double,
      fitP95: Double) {
    def ratio: Double = if (fitMean > 0) batchMean / fitMean else Double.NaN
  }

  def ivfDrift(batch: DataFrame, vecCol: String, path: String): IvfDriftReport = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val meta = readJson(batch.sparkSession, s"$path/ivf_meta.json")
    val centroids = (meta \ "centroids").extract[Seq[Seq[Double]]].map(_.toArray).toArray
    val fitMean = (meta \ "fit_dist_mean").extractOpt[Double].getOrElse(
      throw new IllegalStateException(
        s"$path/ivf_meta.json has no fit_dist_mean — layout written before " +
          "drift stats existed; rebuild it to enable drift reporting"))
    val fitP95 = (meta \ "fit_dist_p95").extractOpt[Double].getOrElse(fitMean)
    val dist = lit(1.0) -
      graft.functions.CatalystExpressions.nearestCentroidSim(col(vecCol), centroids)
    IvfDriftReport(batch.agg(avg(dist)).head().getDouble(0), fitMean, fitP95)
  }

  /** IVF ANN probe against a durable [[ivfWriteLayout]] layout: rank
    * the persisted centroids driver-side, then read ONLY the `nProbe`
    * nearest clusters' partition directories — the probe scan carries
    * `PartitionFilters` (PlanAudit locks this on the gate query), so
    * at 100 TB it touches ~nProbe/k of the corpus bytes instead of all
    * of them.
    */
  def knnIvfPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, query: Array[Double], k: Int = 10,
      nProbe: Int = 3): DataFrame = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val centroids = (readJson(spark, s"$path/ivf_meta.json") \ "centroids")
      .extract[Seq[Seq[Double]]].map(_.toArray).toArray
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qUnit = if (qn > 0) query.map(_ / qn) else query
    val ranked = centroids.zipWithIndex
      .map { case (c, i) => i -> c.zip(qUnit).map { case (a, b) => a * b }.sum }
      .sortBy(-_._2).take(nProbe).map(_._1).toSeq
    val probed = spark.read.parquet(s"$path/corpus")
      .filter(col("cluster").isin(ranked: _*))
    knnBrute(probed, idCol, vecCol, query, k)
  }

  /** Build the IVF layout AT MOST ONCE per path: if
    * `$path/ivf_meta.json` already exists — written last by
    * [[ivfWriteLayout]], and the same artifact every probe reads — the
    * build is skipped, so `ensure` is idempotent ACROSS sessions: a
    * fresh session calling ensure on a layout another session built
    * and [[ivfAppend]]ed to can never overwrite-rebuild the corpus
    * from its own input frame and silently drop the appended batches
    * (DurableIndexSpec locks this). The session memo only avoids
    * re-checking the filesystem on every query; the meta file is the
    * durable source of truth. To rebuild deliberately (e.g. after
    * centroid drift), delete the layout directory first.
    *
    * `fitOn` lets the centroid fit see a superset of the stored corpus
    * (e.g. the full table when the layout excludes held-out query
    * vectors), so a layout probe reproduces an in-memory [[knnIvf]]
    * that fitted on that superset.
    */
  def ensureIvfLayout(df: DataFrame, idCol: String, vecCol: String, path: String,
      nCentroids: Int = 16, iterations: Int = 2, fitSampleFraction: Double = 0.05,
      seed: Long = 42L, fitOn: Option[DataFrame] = None): Unit = {
    layoutBuilt.getOrCompute(df.sparkSession, path) {
      if (!pathExists(df.sparkSession, s"$path/ivf_meta.json")) {
        ivfWriteLayout(df,
          ivfIndex(fitOn.getOrElse(df), idCol, vecCol, nCentroids, iterations,
            fitSampleFraction, seed),
          idCol, vecCol, path)
      }
      java.lang.Boolean.TRUE
    }
    ()
  }

  /** LSH twin of [[ensureIvfLayout]]: build the durable hyperplane-LSH
    * layout at most once per path — skipped whenever
    * `$path/lsh_meta.json` exists, so a fresh session can never
    * clobber a layout (and its [[lshAppend]]ed batches) built by an
    * earlier one.
    */
  def ensureLshLayout(df: DataFrame, idCol: String, vecCol: String, path: String,
      nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): Unit = {
    layoutBuilt.getOrCompute(df.sparkSession, path) {
      if (!pathExists(df.sparkSession, s"$path/lsh_meta.json"))
        lshWriteLayout(df, idCol, vecCol, path, nPlanes, dim, seed)
      java.lang.Boolean.TRUE
    }
    ()
  }

  /** Incremental ingest for a durable IVF layout — the daily-crawl
    * pattern, mirroring [[CorpusIndex.append]]'s old-never-rejoined
    * discipline: assign the new batch with the PERSISTED centroids
    * (the model is fixed at fit time; append never re-clusters, so
    * existing cluster partitions are never read or rewritten) and
    * append only the batch's rows to the cluster-partitioned corpus.
    * Cost is O(batch); a subsequent [[knnIvfPartitioned]] probe sees
    * layout ∪ batch exactly as if the layout had been rebuilt whole
    * with the same centroids (DurableIndexSpec locks the equality).
    * Centroid drift under sustained ingest is a re-fit decision the
    * caller owns — the standard IVF upsert trade.
    *
    * Returns the assigned batch (with its `cluster` column).
    */
  def ivfAppend(batch: DataFrame, vecCol: String, path: String): DataFrame = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val centroids = (readJson(batch.sparkSession, s"$path/ivf_meta.json") \ "centroids")
      .extract[Seq[Seq[Double]]].map(_.toArray).toArray
    val assigned = batch.withColumn("cluster",
      graft.functions.CatalystExpressions.nearestCentroid(col(vecCol), centroids))
    assigned.write.mode("append").partitionBy("cluster").parquet(s"$path/corpus")
    assigned
  }

  /** Write the durable hyperplane-LSH layout under `path`: the corpus
    * partitioned by sign-bucket plus (nPlanes, dim, seed) metadata so
    * probes in any session derive the identical planes.
    */
  def lshWriteLayout(df: DataFrame, idCol: String, vecCol: String, path: String,
      nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): Unit = {
    val planes = VectorFunctions.randomPlanes(nPlanes, dim, seed)
    Scale.writePartitioned(
      df.withColumn("bucket", VectorFunctions.hyperplaneBucket(col(vecCol), planes)),
      s"$path/corpus", Seq("bucket"))
    writeJson(df.sparkSession, s"$path/lsh_meta.json",
      Map("nPlanes" -> nPlanes, "dim" -> dim, "seed" -> seed))
  }

  /** Every bucket value within `maxFlips` sign-bit flips of `qBucket` —
    * the multi-probe set, enumerated driver-side (Σ C(nPlanes, d)
    * values) so the probe scan can partition-prune on an explicit IN
    * list instead of computing `bit_count` over every row.
    */
  private[graft] def bucketsWithin(qBucket: Long, nPlanes: Int,
      maxFlips: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer(qBucket)
    def rec(start: Int, flipsLeft: Int, cur: Long): Unit = {
      if (flipsLeft <= 0) return
      var i = start
      while (i < nPlanes) {
        val flipped = cur ^ (1L << i)
        out += flipped
        rec(i + 1, flipsLeft - 1, flipped)
        i += 1
      }
    }
    rec(0, maxFlips, qBucket)
    out.toSeq
  }

  /** LSH ANN probe against a durable [[lshWriteLayout]] layout:
    * compute the query's bucket and its Hamming-`probeHamming`
    * neighborhood driver-side, read ONLY those partition directories
    * (`PartitionFilters` on the scan), brute-force inside. Same probe
    * set as [[knnLsh]] — SimilaritySpec locks result equality — but
    * the full-corpus scan+filter becomes a pruned scan.
    */
  def knnLshPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, query: Array[Double], k: Int = 10,
      probeHamming: Int = 1): DataFrame = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val meta = readJson(spark, s"$path/lsh_meta.json")
    val nPlanes = (meta \ "nPlanes").extract[Int]
    val dim = (meta \ "dim").extract[Int]
    val seed = (meta \ "seed").extract[Long]
    require(query.length == dim,
      s"query dim ${query.length} != layout dim $dim")
    val planes = VectorFunctions.randomPlanes(nPlanes, dim, seed)
    val qBucket = planes.zipWithIndex.map { case (p, j) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0.0) 1L << j else 0L
    }.sum
    val probeSet = bucketsWithin(qBucket, nPlanes, probeHamming)
    val probed = spark.read.parquet(s"$path/corpus")
      .filter(col("bucket").isin(probeSet: _*))
    knnBrute(probed, idCol, vecCol, query, k)
  }

  /** Incremental ingest for a durable LSH layout: derive the planes
    * from the persisted (nPlanes, dim, seed) metadata — identical in
    * every session by construction — bucket the new batch, and append
    * only its rows to the bucket-partitioned corpus. Same O(batch) /
    * old-never-rejoined discipline as [[ivfAppend]]; probes after the
    * append equal probes of a whole-corpus rebuild (DurableIndexSpec).
    *
    * Returns the bucketed batch (with its `bucket` column).
    */
  def lshAppend(batch: DataFrame, vecCol: String, path: String): DataFrame = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val meta = readJson(batch.sparkSession, s"$path/lsh_meta.json")
    val planes = VectorFunctions.randomPlanes(
      (meta \ "nPlanes").extract[Int], (meta \ "dim").extract[Int],
      (meta \ "seed").extract[Long])
    val bucketed = batch.withColumn("bucket",
      VectorFunctions.hyperplaneBucket(col(vecCol), planes))
    bucketed.write.mode("append").partitionBy("bucket").parquet(s"$path/corpus")
    bucketed
  }

  // --------------------------------------------------- product quantization
  //
  // The 100 TB memory answer for embedding search (Jégou et al. 2011,
  // "Product Quantization for Nearest Neighbor Search"): store m byte
  // codes per vector instead of 4·dim float bytes (64-dim float32 →
  // 8 codes is 32× smaller), score candidates with an asymmetric
  // distance table (query full-precision, corpus codes only), then
  // exact-rerank the few survivors — the q73 two-stage discipline
  // with a far smaller candidate pass.

  /** A fitted PQ model: `codebooks(s)(c)` is sub-space s's c-th
    * centroid (dsub doubles). Driver-side size m·ksub·dsub doubles —
    * e.g. 8×256×8 = 16k values, a broadcast-literal model.
    */
  final case class PqModel(m: Int, dsub: Int,
      codebooks: Array[Array[Array[Double]]]) {
    def ksub: Int = codebooks.head.length
    /** Flattened (m·ksub) × dsub, sub-space-major — the kernel layout. */
    def flat: Array[Array[Double]] = codebooks.flatten
    /** The query's ADC lookup table: lut[s·ksub + c] = ⟨query_s, codebook(s)(c)⟩
      * over the L2-normalized query — m·ksub doubles per query. */
    def lut(query: Array[Double]): Array[Double] = {
      val qn = math.sqrt(query.map(x => x * x).sum)
      val qUnit = if (qn > 0) query.map(_ / qn) else query
      val out = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < ksub) {
          val cent = codebooks(s)(c)
          var d = 0.0
          var j = 0
          while (j < dsub) { d += qUnit(s * dsub + j) * cent(j); j += 1 }
          out(s * ksub + c) = d
          c += 1
        }
        s += 1
      }
      out
    }
  }

  /** Fit PQ codebooks: per sub-space k-means over an L2-normalized
    * sample, all m sub-spaces advancing inside ONE treeAggregate per
    * Lloyd iteration (the [[ivfIndex]] fit discipline — model-sized
    * state, no shuffle, O(sample) cost however large the corpus).
    * Seeds are deterministic: the `ksub` sample vectors with the
    * smallest id-hash, sliced per sub-space.
    */
  def pqFit(df: DataFrame, idCol: String, vecCol: String, m: Int = 8,
      ksub: Int = 16, iterations: Int = 2, fitSampleFraction: Double = 0.25,
      seed: Long = 42L): PqModel = {
    require(m >= 1 && ksub >= 1 && iterations >= 0,
      s"bad PQ parameters m=$m ksub=$ksub iterations=$iterations")
    val fitDf = (if (fitSampleFraction >= 1.0) df
      else df.sample(withReplacement = false, fitSampleFraction, seed))
      .select(col(idCol), col(vecCol))
      .localCheckpoint(false)
    def unitOf(raw: Seq[Any]): Array[Double] = {
      val v = raw.map {
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d.doubleValue()
        case x => x.asInstanceOf[Number].doubleValue()
      }.toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    val seedVecs = fitDf
      .orderBy(xxhash64(col(idCol)))
      .limit(ksub)
      .select(col(vecCol))
      .collect()
      .map(r => unitOf(r.getSeq[Any](0)))
    require(seedVecs.nonEmpty, "pqFit: sample yielded no rows to seed codebooks")
    val dim = seedVecs.head.length
    require(dim % m == 0, s"vector dim $dim must divide into m=$m sub-spaces")
    val dsub = dim / m
    // seed codebook: slice each seed vector; short samples reuse seeds
    // cyclically so every sub-space has ksub entries
    var books: Array[Array[Array[Double]]] = Array.tabulate(m, ksub) { (s, c) =>
      seedVecs(c % seedVecs.length).slice(s * dsub, (s + 1) * dsub)
    }
    val vecs = fitDf.select(col(vecCol)).rdd
      .map(r => unitOf(r.getSeq[Any](0)))
      .filter(_.length == dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sc = df.sparkSession.sparkContext
    var it = 0
    while (it < iterations) {
      val bc = sc.broadcast(books)
      val (sums, cnts) = vecs.treeAggregate(
        (Array.fill(m, ksub)(new Array[Double](dsub)),
          Array.fill(m)(new Array[Long](ksub))))(
        seqOp = { case ((sm, cn), u) =>
          var s = 0
          while (s < m) {
            var best = 0
            var bestD = Double.PositiveInfinity
            var c = 0
            while (c < ksub) {
              val cent = bc.value(s)(c)
              var d = 0.0
              var j = 0
              while (j < dsub) {
                val diff = u(s * dsub + j) - cent(j); d += diff * diff; j += 1
              }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            var j = 0
            while (j < dsub) { sm(s)(best)(j) += u(s * dsub + j); j += 1 }
            cn(s)(best) += 1
            s += 1
          }
          (sm, cn)
        },
        combOp = { case ((a, an), (b, bn)) =>
          var s = 0
          while (s < m) {
            var c = 0
            while (c < ksub) {
              var j = 0
              while (j < dsub) { a(s)(c)(j) += b(s)(c)(j); j += 1 }
              an(s)(c) += bn(s)(c)
              c += 1
            }
            s += 1
          }
          (a, an)
        })
      bc.destroy()
      books = Array.tabulate(m, ksub) { (s, c) =>
        if (cnts(s)(c) == 0L) books(s)(c)
        else sums(s)(c).map(_ / cnts(s)(c))
      }
      it += 1
    }
    vecs.unpersist(blocking = false)
    PqModel(m, dsub, books)
  }

  /** Parametric OPQ rotation (Ge et al., CVPR'13 §4 "OPQ-P"): PCA of
    * the L2-normalized sample's second-moment matrix, then EIGENVALUE
    * ALLOCATION — principal directions dealt greedily to the m
    * sub-spaces balancing each sub-space's variance product — so PQ's
    * per-sub-space codebooks quantize decorrelated, variance-balanced
    * coordinates instead of whatever the raw axes happened to mix.
    * The rotation is ORTHOGONAL (rows are eigenvectors), so rotating
    * both corpus and query preserves every inner product exactly:
    * only the ADC approximation quality changes, never the re-ranked
    * answer's ground truth.
    *
    * Scale shape: ONE treeAggregate accumulates the dim×dim second
    * moment (model-sized, no shuffle); the eigendecomposition is a
    * driver-side cyclic Jacobi on a ≤few-hundred-dim symmetric matrix
    * — microseconds next to any scan. Returns the row-major rotation
    * R (apply as y = R·x, [[graft.functions.CatalystExpressions
    * .matVec]]).
    */
  def opqRotation(df: DataFrame, idCol: String, vecCol: String, m: Int = 8,
      fitSampleFraction: Double = 0.25, seed: Long = 42L): Array[Array[Double]] = {
    require(m >= 1, s"m must be >= 1: $m")
    val fitDf = (if (fitSampleFraction >= 1.0) df
      else df.sample(withReplacement = false, fitSampleFraction, seed))
      .select(col(vecCol))
    val vecs = fitDf.rdd.map { r =>
      val v = r.getSeq[Any](0).map {
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d.doubleValue()
        case x => x.asInstanceOf[Number].doubleValue()
      }.toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    val firstRows = vecs.take(1) // emptiness probe BEFORE first(): an
    // empty sample must fail with this message, not an opaque
    // NoSuchElementException
    require(firstRows.nonEmpty, "opqRotation: sample yielded no vectors")
    val dim = firstRows.head.length
    require(dim % m == 0, s"vector dim $dim must divide into m=$m sub-spaces")
    val (moment, cnt) = vecs.filter(_.length == dim).treeAggregate(
      (Array.ofDim[Double](dim, dim), 0L))(
      seqOp = { case ((acc, n), u) =>
        var i = 0
        while (i < dim) {
          val ui = u(i)
          val row = acc(i)
          var j = 0
          while (j < dim) { row(j) += ui * u(j); j += 1 }
          i += 1
        }
        (acc, n + 1)
      },
      combOp = { case ((a, an), (b, bn)) =>
        var i = 0
        while (i < dim) {
          var j = 0
          while (j < dim) { a(i)(j) += b(i)(j); j += 1 }
          i += 1
        }
        (a, an + bn)
      })
    require(cnt > 0, "opqRotation: sample yielded no vectors")
    val cov = moment.map(_.map(_ / cnt))
    val (eigVals, eigVecs) = symEigen(cov)
    // sort principal directions by variance, descending
    val order = eigVals.indices.sortBy(i => -eigVals(i))
    val dsub = dim / m
    // Greedy balanced allocation, ROUND-CONSTRAINED: directions are
    // dealt in descending-variance order, each to the sub-space with
    // the smallest variance log-product AMONG THE LEAST-FILLED ones.
    // The fill constraint is what makes the greedy sound here: unit
    // vectors put every eigenvalue below 1 (logs negative), so an
    // unconstrained "smallest product" would keep stuffing the same
    // sub-space with ALL the top directions — the exact concentration
    // the allocation exists to prevent.
    val bucketOf = new Array[Int](dim)
    val logProd = new Array[Double](m)
    val fill = new Array[Int](m)
    order.foreach { e =>
      val minFill = fill.min
      var best = -1
      var bestLp = Double.PositiveInfinity
      var s = 0
      while (s < m) {
        if (fill(s) == minFill && logProd(s) < bestLp) { best = s; bestLp = logProd(s) }
        s += 1
      }
      bucketOf(e) = best
      logProd(best) += math.log(math.max(eigVals(e), 1e-12))
      fill(best) += 1
    }
    // rotation rows: sub-space s's dsub coordinates are its allocated
    // eigenvectors, in allocation order
    val rows = Array.ofDim[Double](dim, dim)
    val nextRow = Array.tabulate(m)(_ * dsub)
    order.foreach { e =>
      val s = bucketOf(e)
      rows(nextRow(s)) = eigVecs(e)
      nextRow(s) += 1
    }
    rows
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * (eigenvalues, eigenvectors as ROWS). Deterministic, O(n³) per
    * sweep — built for the ≤few-hundred-dim covariance matrices the
    * OPQ fit produces, not general linear algebra.
    */
  private[graft] def symEigen(sym: Array[Array[Double]],
      maxSweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val n = sym.length
    val a = sym.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var done = false
    while (sweep < maxSweeps && !done) {
      var off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) { // A ← JᵀAJ on rows/cols p,q
              val akp = a(k)(p)
              val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k)
              val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              // V accumulates the same column rotations
              val vkp = v(k)(p)
              val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      done = off < 1e-18
      sweep += 1
    }
    val eigVals = Array.tabulate(n)(i => a(i)(i))
    val eigRows = Array.tabulate(n, n)((e, j) => v(j)(e)) // column e → row
    (eigVals, eigRows)
  }

  /** [[pqFit]] with a learned [[opqRotation]] in front: fit the
    * codebooks on ROTATED vectors. Returns (rotation, model); probe
    * with [[pqKnnRotated]].
    */
  def opqPqFit(df: DataFrame, idCol: String, vecCol: String, m: Int = 8,
      ksub: Int = 16, iterations: Int = 2, fitSampleFraction: Double = 0.25,
      seed: Long = 42L): (Array[Array[Double]], PqModel) = {
    val r = opqRotation(df, idCol, vecCol, m, fitSampleFraction, seed)
    val rotated = df.select(col(idCol),
      graft.functions.CatalystExpressions.matVec(col(vecCol), r).as(vecCol))
    (r, pqFit(rotated, idCol, vecCol, m, ksub, iterations,
      fitSampleFraction, seed))
  }

  /** [[pqKnn]] under an OPQ rotation: the ADC pass encodes R·x
    * (map-only — rotation and encoding fuse into one codegen'd
    * projection) against codebooks fit in rotated space, the query's
    * LUT uses R·q, and the exact re-rank runs on the ORIGINAL vectors
    * (orthogonal R preserves cosine, so ground truth is untouched —
    * only candidate quality improves).
    */
  def pqKnnRotated(corpus: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], rotation: Array[Array[Double]], model: PqModel,
      k: Int = 10, candidateFactor: Int = 4): DataFrame = {
    require(candidateFactor >= 1, s"candidateFactor must be >= 1: $candidateFactor")
    val rq = rotation.map(row => row.zip(query).map { case (a, b) => a * b }.sum)
    val rotVec = graft.functions.CatalystExpressions.matVec(col(vecCol), rotation)
    val codes = graft.functions.CatalystExpressions.pqEncode(
      rotVec, model.flat, model.m, model.dsub)
    val candidates = Scale.parallelismFloor(corpus)
      .select(col(idCol),
        graft.functions.CatalystExpressions.pqAdcDot(codes, model.lut(rq),
          model.ksub).as("__adc"))
      .orderBy(desc("__adc"), col(idCol))
      .limit(k * candidateFactor)
      .select(col(idCol))
    knnBrute(corpus.join(candidates, Seq(idCol), "left_semi"),
      idCol, vecCol, query, k)
  }

  /** Two-stage PQ ANN: ADC candidate pass over the codes (map-only
    * projection — each row contributes m table lookups, no vector
    * bytes), TakeOrderedAndProject top k·candidateFactor, then exact
    * cosine re-rank of the survivors ([[knnBrute]] over a semi-join).
    */
  def pqKnn(corpus: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], model: PqModel, k: Int = 10,
      candidateFactor: Int = 4): DataFrame = {
    require(candidateFactor >= 1, s"candidateFactor must be >= 1: $candidateFactor")
    val codes = graft.functions.CatalystExpressions.pqEncode(
      col(vecCol), model.flat, model.m, model.dsub)
    val candidates = Scale.parallelismFloor(corpus)
      .select(col(idCol),
        graft.functions.CatalystExpressions.pqAdcDot(codes, model.lut(query),
          model.ksub).as("__adc"))
      .orderBy(desc("__adc"), col(idCol))
      .limit(k * candidateFactor)
      .select(col(idCol))
    knnBrute(corpus.join(candidates, Seq(idCol), "left_semi"),
      idCol, vecCol, query, k)
  }

  /** Build the durable IVF-PQ layout at most once per path (the
    * [[ensureIvfLayout]] discipline): coarse IVF clusters become
    * partition directories; each stored row additionally carries its
    * `pq_codes` (encoded ONCE at write time). Probes then read only
    * the probed clusters' directories, and the candidate pass prunes
    * its scan to (id, pq_codes) — at 100 TB that is nProbe/k of the
    * directories × ~1/32 of the bytes.
    */
  def ensureIvfPqLayout(df: DataFrame, idCol: String, vecCol: String,
      path: String, nCentroids: Int = 16, m: Int = 8, ksub: Int = 16,
      iterations: Int = 2, fitSampleFraction: Double = 0.25, seed: Long = 42L,
      fitOn: Option[DataFrame] = None, opq: Boolean = false): Unit = {
    layoutBuilt.getOrCompute(df.sparkSession, path) {
      if (!pathExists(df.sparkSession, s"$path/ivfpq_meta.json")) {
        val fitDf = fitOn.getOrElse(df)
        // the coarse IVF stage always runs on RAW vectors (cluster
        // geometry is rotation-invariant and the probe ranks raw
        // centroids); only the fine PQ stage benefits from OPQ
        val index = ivfIndex(fitDf, idCol, vecCol, nCentroids, iterations,
          fitSampleFraction.max(0.05), seed)
        val (rotation, pq): (Array[Array[Double]], PqModel) =
          if (opq) opqPqFit(fitDf, idCol, vecCol, m, ksub, iterations,
            fitSampleFraction, seed)
          else (null, pqFit(fitDf, idCol, vecCol, m, ksub, iterations,
            fitSampleFraction, seed))
        val codeInput =
          if (opq) graft.functions.CatalystExpressions.matVec(col(vecCol), rotation)
          else col(vecCol)
        val encoded = df
          .withColumn("cluster", graft.functions.CatalystExpressions
            .nearestCentroid(col(vecCol), index.centroids))
          .withColumn("pq_codes", graft.functions.CatalystExpressions
            .pqEncode(codeInput, pq.flat, pq.m, pq.dsub))
        Scale.writePartitioned(encoded, s"$path/corpus", Seq("cluster"))
        // the rotation RIDES THE LAYOUT META: probes of an OPQ layout
        // need no out-of-band knowledge, and pre-OPQ layouts (no
        // "rotation" key) keep reading as identity
        val baseMeta = Map("centroids" -> index.centroids.map(_.toSeq).toSeq,
          "m" -> pq.m, "dsub" -> pq.dsub,
          "codebooks" -> pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
        val meta =
          if (opq) baseMeta + ("rotation" -> rotation.map(_.toSeq).toSeq)
          else baseMeta
        writeJson(df.sparkSession, s"$path/ivfpq_meta.json", meta)
      }
      java.lang.Boolean.TRUE
    }
    ()
  }

  /** IVF-PQ probe against a durable [[ensureIvfPqLayout]] layout:
    * centroids ranked driver-side, ONLY the `nProbe` nearest cluster
    * directories read (`PartitionFilters` — PlanAudit locks this), the
    * ADC candidate pass scans (id, pq_codes) alone, and the exact
    * re-rank touches just the k·candidateFactor survivors' vectors.
    */
  def knnIvfPqPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, query: Array[Double], k: Int = 10,
      nProbe: Int = 3, candidateFactor: Int = 4): DataFrame = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val meta = readJson(spark, s"$path/ivfpq_meta.json")
    val centroids = (meta \ "centroids").extract[Seq[Seq[Double]]]
      .map(_.toArray).toArray
    val pq = PqModel((meta \ "m").extract[Int], (meta \ "dsub").extract[Int],
      (meta \ "codebooks").extract[Seq[Seq[Seq[Double]]]]
        .map(_.map(_.toArray).toArray).toArray)
    // OPQ layouts carry their rotation in the meta; apply it to the
    // query's LUT only (codes were encoded rotated at write time, the
    // coarse centroids and exact re-rank stay in raw space)
    val lutQuery = (meta \ "rotation").toOption
      .map(_.extract[Seq[Seq[Double]]]
        .map(row => row.zip(query).map { case (a, b) => a * b }.sum).toArray)
      .getOrElse(query)
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qUnit = if (qn > 0) query.map(_ / qn) else query
    val ranked = centroids.zipWithIndex
      .map { case (c, i) => i -> c.zip(qUnit).map { case (a, b) => a * b }.sum }
      .sortBy(-_._2).take(nProbe).map(_._1).toSeq
    val probed = spark.read.parquet(s"$path/corpus")
      .filter(col("cluster").isin(ranked: _*))
    val candidates = probed
      .select(col(idCol),
        graft.functions.CatalystExpressions.pqAdcDot(col("pq_codes"),
          pq.lut(lutQuery), pq.ksub).as("__adc"))
      .orderBy(desc("__adc"), col(idCol))
      .limit(k * candidateFactor)
      .select(col(idCol))
    knnBrute(probed.join(candidates, Seq(idCol), "left_semi"),
      idCol, vecCol, query, k)
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
