package graft

import org.apache.spark.sql.functions._
import graft.core.Engine
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Engine.table(spark, sfDir, "embeddings")
  private lazy val query: Array[Double] =
    emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray

  test("brute-force knn: self is most similar with cosine 1") {
    val top = Similarity.knnBrute(emb, "vec_id", "embedding", query, 5).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
    val scores = top.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("lsh knn achieves decent recall vs brute force") {
    val exact = Similarity.knnBrute(emb, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.knnLsh(emb, "vec_id", "embedding", query,
      k = 10, nPlanes = 6, probeHamming = 2)
      .collect().map(_.getLong(0)).toSet
    assert(approx.intersect(exact).size >= 5, s"recall too low: $approx vs $exact")
  }

  test("ivf index: clusters cover the corpus, probe recall beats random") {
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 8)
    assert(index.centroids.length == 8)
    assert(index.assignments.count() == emb.count())
    assert(index.assignments.select("cluster").distinct().count() > 1)
    val exact = Similarity.knnBrute(emb, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.knnIvf(emb, index, "vec_id", "embedding", query,
      k = 10, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    assert(approx.intersect(exact).size >= 5, s"ivf recall too low: $approx vs $exact")
    // the query vector itself lives in a probed cluster
    assert(approx.contains(0L))
  }

  test("nearestCentroid matches the least(struct) ladder bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = ((1L to 200L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))) :+
      (999L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding") // zero-norm edge case
    val cents = Array.fill(17)(Array.fill(8)(rnd.nextGaussian())).map { c =>
      val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n)
    }
    // the replaced formulation, verbatim
    val ladder = vecs.withColumn("cluster",
      least(cents.zipWithIndex.map { case (cent, i) =>
        struct((lit(0.0) - graft.functions.VectorFunctions.dot(
          graft.functions.VectorFunctions.l2Normalize(col("embedding")),
          array(cent.map(lit): _*))).as("negsim"), lit(i).as("cluster"))
      }: _*).getField("cluster"))
    val expr = vecs.withColumn("cluster",
      graft.functions.CatalystExpressions.nearestCentroid(col("embedding"), cents))
    val l = ladder.collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1)
    val e = expr.collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1)
    assert(e === l)
  }

  test("ivf fits k=256 without an O(k) expression tree in the plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vecs = (1L to 600L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val index = Similarity.ivfIndex(vecs, "vec_id", "embedding",
      nCentroids = 256, iterations = 1, fitSampleFraction = 1.0)
    assert(index.centroids.length == 256)
    // the assignment plan carries ONE expression holding the matrix —
    // the ladder this replaces had ~5 nodes per centroid (>1200 at
    // k=256), which is what blew up analysis/codegen
    val nodes = index.assignments.queryExecution.optimizedPlan.expressions
      .map(e => { var c = 0; e.foreach(_ => c += 1); c }).sum
    assert(nodes < 60, s"assignment expression tree too large: $nodes nodes")
    val clusters = index.assignments.select("cluster").distinct()
      .collect().map(_.getInt(0))
    assert(clusters.forall(c => c >= 0 && c < 256))
    assert(clusters.length > 32, "600 spread vectors should hit many of 256 clusters")
  }

  test("cross-corpus similarity links each vector to itself") {
    val self = Similarity.crossSimilarity(
      emb.select(col("vec_id").as("qid"), col("embedding")),
      emb.select(col("vec_id").as("cid"), col("embedding")),
      "qid", "cid", "embedding", minCosine = 0.999, nPlanes = 6, dim = 64)
    val matched = self.filter(col("id_a") === col("id_b")).count()
    assert(matched == emb.count())
  }

  test("partitioned LSH probe == in-memory LSH probe, and the scan is pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-layout").toString
    Similarity.lshWriteLayout(emb, "vec_id", "embedding", dir,
      nPlanes = 6, dim = 64, seed = 42L)
    val fromLayout = Similarity.knnLshPartitioned(spark, dir, "vec_id", "embedding",
      query, k = 10, probeHamming = 2)
    val inMemory = Similarity.knnLsh(emb, "vec_id", "embedding", query,
      k = 10, nPlanes = 6, probeHamming = 2)
    // same probe set by construction -> identical results
    assert(fromLayout.collect().toSeq == inMemory.collect().toSeq)
    val scan = fromLayout.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"probe scan must prune bucket partitions: $scan")
  }

  test("bucketsWithin enumerates exactly the Hamming ball") {
    val ball = Similarity.bucketsWithin(qBucket = 0b101L, nPlanes = 4, maxFlips = 2)
    // C(4,0)+C(4,1)+C(4,2) = 1+4+6 = 11 distinct values, all within distance 2
    assert(ball.distinct.size == 11 && ball.size == 11)
    assert(ball.forall(b => java.lang.Long.bitCount(b ^ 0b101L) <= 2))
    assert(ball.contains(0b101L))
  }

  test("partitioned IVF probe == in-memory IVF probe on the same index") {
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 4, fitSampleFraction = 1.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-layout").toString
    Similarity.ivfWriteLayout(emb, index, "vec_id", "embedding", dir)
    val fromLayout = Similarity.knnIvfPartitioned(spark, dir, "vec_id", "embedding",
      query, k = 10, nProbe = 2)
    val inMemory = Similarity.knnIvf(emb, index, "vec_id", "embedding",
      query, k = 10, nProbe = 2)
    assert(fromLayout.collect().toSeq == inMemory.collect().toSeq)
  }

  test("hardNegatives: positives excluded, nearest non-positive ranks first") {
    import spark.implicits._
    // corpus on a line: vectors at angles; q points at 0°. Nearest is
    // c1 (5°), but c1 is the labeled positive → c2 (10°) must rank 1.
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val corpus = Seq((1L, v(5)), (2L, v(10)), (3L, v(60)), (4L, v(170)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, v(0))).toDF("qid", "embedding")
    val positives = Seq((100L, 1L)).toDF("qid", "vec_id")
    val got = Similarity.hardNegatives(corpus, "vec_id", "embedding",
        queries, "qid", "embedding", positives, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank")))
    assert(got.toSeq == Seq((2L, 1), (3L, 2)),
      s"positive must be excluded, order by similarity: ${got.toSeq}")
    // plan: per-query top-k must be a WindowGroupLimit, not a full sort
    val p = Similarity.hardNegatives(corpus, "vec_id", "embedding",
        queries, "qid", "embedding", positives, k = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"expected rank-k group limit:\n$p")
  }

  test("symEigen recovers a planted spectrum: A·v = λ·v, eigenvalues match") {
    val n = 8
    val rnd = new scala.util.Random(31)
    // orthonormal Q via Gram-Schmidt
    val qm = Array.fill(n)(Array.fill(n)(rnd.nextGaussian()))
    for (i <- 0 until n) {
      for (j <- 0 until i) {
        val d = qm(i).zip(qm(j)).map { case (x, y) => x * y }.sum
        for (k <- 0 until n) qm(i)(k) -= d * qm(j)(k)
      }
      val nn = math.sqrt(qm(i).map(x => x * x).sum)
      for (k <- 0 until n) qm(i)(k) /= nn
    }
    val planted = Array.tabulate(n)(i => (n - i).toDouble) // 8,7,...,1
    val a = Array.tabulate(n, n) { (r, c) =>
      (0 until n).map(e => planted(e) * qm(e)(r) * qm(e)(c)).sum
    }
    val (vals, vecs) = Similarity.symEigen(a)
    assert(vals.sorted.zip(planted.sorted).forall { case (g, w) =>
      math.abs(g - w) < 1e-8 }, s"eigenvalues: ${vals.sorted.toSeq}")
    for (e <- 0 until n) {
      val av = a.map(row => row.zip(vecs(e)).map { case (x, y) => x * y }.sum)
      val lv = vecs(e).map(_ * vals(e))
      val err = av.zip(lv).map { case (x, y) => math.abs(x - y) }.max
      assert(err < 1e-8, s"A·v != λ·v for eigenpair $e (err $err)")
    }
  }

  test("OPQ: orthogonal rotation lifts ADC recall above unrotated PQ on correlated data") {
    import spark.implicits._
    val dim = 16
    val m = 4
    val rnd = new scala.util.Random(97)
    // random orthonormal basis (Gram–Schmidt over seeded Gaussians):
    // the data's energy lives in a few NON-axis-aligned directions, so
    // raw PQ sub-spaces see strongly correlated mixtures — exactly the
    // regime OPQ exists for
    val basis = {
      val b = Array.fill(dim)(Array.fill(dim)(rnd.nextGaussian()))
      for (i <- 0 until dim) {
        for (j <- 0 until i) {
          val d = b(i).zip(b(j)).map { case (x, y) => x * y }.sum
          for (k2 <- 0 until dim) b(i)(k2) -= d * b(j)(k2)
        }
        val n = math.sqrt(b(i).map(x => x * x).sum)
        for (k2 <- 0 until dim) b(i)(k2) /= n
      }
      b
    }
    // mild decay: anisotropic enough for sub-space correlations to
    // hurt raw PQ, spread enough that normalized vectors don't
    // collapse onto ±v1 (a steeper spectrum makes top-k noise-driven)
    val sd = Array.tabulate(dim)(i => math.pow(0.75, i))
    def sample(): Array[Double] = {
      val z = Array.fill(dim)(rnd.nextGaussian())
      val x = new Array[Double](dim)
      var e = 0
      while (e < dim) {
        val w = z(e) * sd(e)
        var j = 0
        while (j < dim) { x(j) += w * basis(e)(j); j += 1 }
        e += 1
      }
      x
    }
    val rows = (0 until 400).map(i => (i.toLong, sample().toSeq))
    val corpus = rows.toDF("vec_id", "embedding").localCheckpoint(true)
    val queries = Array.fill(24)(sample())

    val fitKs = 8
    val plain = Similarity.pqFit(corpus, "vec_id", "embedding", m, fitKs,
      iterations = 3, fitSampleFraction = 1.0)
    val (rot, rotated) = Similarity.opqPqFit(corpus, "vec_id", "embedding",
      m, fitKs, iterations = 3, fitSampleFraction = 1.0)
    // R is orthogonal: R·Rᵀ = I (inner products — and therefore the
    // exact re-rank's ground truth — are preserved)
    for (i <- 0 until dim; j <- 0 until dim) {
      val d = rot(i).zip(rot(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRt[$i][$j] = $d")
    }
    // recall@10 with candidateFactor=1 (ADC ordering decides), totaled
    // over 24 held-out queries so one lucky draw can't decide the test
    var plainHits = 0
    var rotHits = 0
    queries.foreach { q =>
      val exact = Similarity.knnBrute(corpus, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      plainHits += Similarity.pqKnn(corpus, "vec_id", "embedding", q, plain,
        k = 10, candidateFactor = 1)
        .collect().map(_.getLong(0)).toSet.intersect(exact).size
      rotHits += Similarity.pqKnnRotated(corpus, "vec_id", "embedding", q,
        rot, rotated, k = 10, candidateFactor = 1)
        .collect().map(_.getLong(0)).toSet.intersect(exact).size
    }
    info(s"ADC recall@10 over 24 queries: unrotated $plainHits/240, OPQ $rotHits/240")
    assert(rotHits > plainHits,
      s"OPQ must strictly beat unrotated PQ: $rotHits vs $plainHits of 240")
  }

  test("PQ: two-stage ADC recovers brute-force top-k on the gate corpus") {
    val exact = Similarity.knnBrute(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", query, 10).collect().map(_.getLong(0)).toSet
    val model = Similarity.pqFit(emb, "vec_id", "embedding",
      m = 8, ksub = 16, fitSampleFraction = 1.0)
    assert(model.dsub * model.m == 64 && model.ksub == 16)
    val got = Similarity.pqKnn(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", query, model, k = 10, candidateFactor = 8)
      .collect()
    // exact re-rank means every returned cosine is the true cosine,
    // sorted desc; recall floor on the candidate stage
    val scores = got.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
    val recall = got.map(_.getLong(0)).toSet.intersect(exact).size
    assert(recall >= 8, s"PQ recall too low: $recall/10")
  }

  test("PQ: encode/ADC expressions agree with the driver-side model math") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "v")
    val model = Similarity.pqFit(df, "id", "v", m = 4, ksub = 8,
      fitSampleFraction = 1.0)
    val q = vecs(5)._2.map(_.toDouble).toArray
    val lut = model.lut(q)
    // ADC via expressions == lut-sum over the expression-encoded codes
    val row = df.filter(col("id") === 9L)
      .select(
        graft.functions.CatalystExpressions.pqEncode(col("v"), model.flat,
          model.m, model.dsub).as("codes"),
        graft.functions.CatalystExpressions.pqAdcDot(
          graft.functions.CatalystExpressions.pqEncode(col("v"), model.flat,
            model.m, model.dsub), lut, model.ksub).as("adc"))
      .head()
    val codes = row.getSeq[Int](0)
    assert(codes.length == model.m && codes.forall(c => c >= 0 && c < model.ksub))
    val expect = codes.zipWithIndex.map { case (c, s) => lut(s * model.ksub + c) }.sum
    assert(math.abs(row.getDouble(1) - expect) < 1e-12)
    // dimension mismatch → null codes, null ADC (never a wrong score)
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
      .select(graft.functions.CatalystExpressions.pqEncode(col("v"), model.flat,
        model.m, model.dsub).as("codes"))
      .head()
    assert(bad.isNullAt(0))
  }

  test("PQ: durable IVF-PQ layout probe matches the in-memory two-stage result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Similarity.ensureIvfPqLayout(emb.filter(col("vec_id") =!= 0), "vec_id",
      "embedding", dir, nCentroids = 8, m = 8, ksub = 16,
      fitSampleFraction = 1.0, fitOn = Some(emb))
    val got = Similarity.knnIvfPqPartitioned(spark, dir, "vec_id", "embedding",
      query, k = 10, nProbe = 8, candidateFactor = 8).collect()
    // nProbe = all clusters → probe scope is the whole corpus: result
    // must equal the in-memory two-stage with the same fit inputs
    val model = Similarity.pqFit(emb, "vec_id", "embedding", m = 8, ksub = 16,
      fitSampleFraction = 1.0)
    val want = Similarity.pqKnn(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", query, model, k = 10, candidateFactor = 8).collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      want.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // the probe scan is partition-pruned and the ADC pass never reads
    // the embedding column
    val plan = Similarity.knnIvfPqPartitioned(spark, dir, "vec_id", "embedding",
      query, k = 10, nProbe = 2, candidateFactor = 8)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.forall(_.contains("PartitionFilters")), s"pruning lost:\n$plan")
    assert(scans.exists(s => s.contains("pq_codes") && !s.contains("embedding")),
      s"ADC pass must scan codes only:\n${scans.mkString("\n")}")
  }

  test("OPQ IVF-PQ layout: rotation rides the meta, probe matches the rotated two-stage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-opq").toString
    Similarity.ensureIvfPqLayout(emb.filter(col("vec_id") =!= 0), "vec_id",
      "embedding", dir, nCentroids = 8, m = 8, ksub = 16,
      fitSampleFraction = 1.0, fitOn = Some(emb), opq = true)
    // the meta carries the rotation — a probe needs no out-of-band state
    val metaTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "ivfpq_meta.json")), "UTF-8")
    assert(metaTxt.contains("\"rotation\""), "rotation must ride the layout meta")
    val got = Similarity.knnIvfPqPartitioned(spark, dir, "vec_id", "embedding",
      query, k = 10, nProbe = 8, candidateFactor = 8).collect()
    // nProbe = all clusters → must equal the in-memory rotated two-stage
    // with the same fit inputs
    val (rot, model) = Similarity.opqPqFit(emb, "vec_id", "embedding",
      m = 8, ksub = 16, fitSampleFraction = 1.0)
    val want = Similarity.pqKnnRotated(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", query, rot, model, k = 10, candidateFactor = 8)
      .collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      want.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // pruning + codes-only ADC scan hold on the OPQ layout too
    val plan = Similarity.knnIvfPqPartitioned(spark, dir, "vec_id", "embedding",
      query, k = 10, nProbe = 2, candidateFactor = 8)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.forall(_.contains("PartitionFilters")), s"pruning lost:\n$plan")
    assert(scans.exists(s => s.contains("pq_codes") && !s.contains("embedding")),
      s"ADC pass must scan codes only:\n${scans.mkString("\n")}")
  }
}
