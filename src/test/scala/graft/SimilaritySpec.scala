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

  test("cross-corpus similarity links each vector to itself") {
    val self = Similarity.crossSimilarity(
      emb.select(col("vec_id").as("qid"), col("embedding")),
      emb.select(col("vec_id").as("cid"), col("embedding")),
      "qid", "cid", "embedding", minCosine = 0.999, nPlanes = 6, dim = 64)
    val matched = self.filter(col("id_a") === col("id_b")).count()
    assert(matched == emb.count())
  }
}
