package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals unsalted join on skewed data") {
    // hot key: 5000 of 5100 rows share key 1
    val large = ((1 to 5000).map(i => (1L, i.toDouble)) ++
      (1 to 100).map(i => (i.toLong + 1, i.toDouble))).toDF("k", "v")
    val small = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salted = Scale.saltedJoin(large, small, Seq("k"))
    val plain = large.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted aggregate equals direct aggregate") {
    val df = ((1 to 5000).map(_ => ("hot", 1.0)) ++
      (1 to 100).map(i => (s"k$i", 2.0))).toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = Scale.saltedAggregate(df, Seq("k"), saltFactor = 8,
      partialAggs = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      finalAggs = Seq(sum("pn").as("n"), sum("ps").as("s")))
    assert(salted.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(salted).count() == 0)
  }

  test("rangeJoin equals the plain inequality join, never a nested loop") {
    val rnd = new scala.util.Random(5)
    val points = (1 to 2000).map(_ => (rnd.nextInt(8).toLong, rnd.nextInt(100000).toLong))
      .toDF("k", "p")
    val intervals = (1 to 300).map { _ =>
      val lo = rnd.nextInt(100000).toLong - 500
      (rnd.nextInt(8).toLong, lo, lo + rnd.nextInt(3000).toLong)
    }.toDF("ik", "lo", "hi")
    val bucketed = Scale.rangeJoin(points, "p", intervals, "lo", "hi",
      Seq("k"), Seq("ik"), bucketWidth = 1000L)
      .select("k", "p", "lo", "hi")
    val plain = points.join(intervals,
        points("k") === intervals("ik") &&
          points("p") >= intervals("lo") && points("p") <= intervals("hi"))
      .select("k", "p", "lo", "hi")
    assert(bucketed.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(bucketed).count() == 0)
    assert(bucketed.count() > 0)
    bucketed.collect()
    val phys = bucketed.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      s"range join must plan as an equi-join:\n$phys")
  }

  test("rangeJoin: inverted and null-bounded intervals match nothing; negative axis works") {
    val points = Seq((1L, -1500L), (1L, 500L)).toDF("k", "p")
    val intervals = Seq(
      (1L, Some(-2000L), Some(-1000L)), // covers -1500
      (1L, Some(900L), Some(100L)),     // inverted: matches nothing
      (1L, None, Some(1000L))           // null lo: dropped
    ).toDF("ik", "lo", "hi")
    val out = Scale.rangeJoin(points, "p", intervals, "lo", "hi",
      Seq("k"), Seq("ik"), bucketWidth = 700L)
    val rows = out.select("p", "lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((-1500L, -2000L, -1000L)))
  }

  test("bucketed join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a fresh JVM's in-memory catalog forgets managed tables but their
    // warehouse directories persist — clear them or CREATE fails
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(s"$wh/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(d)
      }
    }
    val dir = "/root/testdata/sf0.001"
    Scale.writeBucketed(graft.core.Engine.table(spark, dir, "orders"),
      "b_orders", Seq("o_orderkey"), 4)
    Scale.writeBucketed(
      graft.core.Engine.table(spark, dir, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 4)
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("bloomSemiPrune: zero false negatives, effective pruning") {
    val big = spark.range(0, 100000).select(col("id").as("k"))
    val small = spark.range(0, 1000).select((col("id") * 7).as("k"))
    val pruned = graft.operators.Scale.bloomSemiPrune(big, "k", small, "k",
      expectedItems = 1000)
    val trueSemi = big.join(small, Seq("k"), "left_semi")
    // no false negatives: every true match survives the bloom
    assert(trueSemi.join(pruned, Seq("k"), "left_anti").count() == 0)
    // effective: passes the ~1000 true keys plus ~fpp of the rest,
    // nowhere near the unpruned 100k
    val n = pruned.count()
    assert(n >= trueSemi.count() && n <= 5000, s"pruned to $n rows")
    // string keys work through the same xxhash64 normalization
    val bigS = big.select(concat(lit("k"), col("k")).as("k"))
    val smallS = small.select(concat(lit("k"), col("k")).as("k"))
    val prunedS = graft.operators.Scale.bloomSemiPrune(bigS, "k", smallS, "k",
      expectedItems = 1000)
    assert(smallS.join(prunedS, Seq("k"), "left_anti").count() == 0)
  }

  test("LSH hot-bucket cap bounds candidate pairs on a boilerplate corpus") {
    import graft.operators.Dedup
    // adversarial corpus: 2000 docs share one boilerplate text (all
    // land in the same bucket in EVERY band), plus a small planted
    // near-dup pair and unique filler
    val boiler = "this software is provided as is without warranty of any kind express or implied"
    val docs = (
      (1 to 2000).map(i => (i.toLong, boiler)) ++
      Seq((9001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
          (9002L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda")) ++
      // filler must be pairwise token-disjoint, or it forms its own
      // near-dup cluster and defeats the point of the test
      (1 to 200).map(i => (20000L + i, (1 to 12).map(j => s"w${i}x$j").mkString(" ")))
    ).toDF("doc_id", "text")

    // uncapped: the boilerplate bucket alone yields ~2M candidate pairs
    // capped at 100: the whole boilerplate cluster is dropped, the
    // planted pair survives
    val capped = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      minJaccard = 0.5, maxBucketSize = 100)
    val pairs = capped.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((9001L, 9002L)), "planted near-dup pair must survive the cap")
    assert(pairs.length < 1000,
      s"bucket cap must bound candidates, got ${pairs.length}")
    // the diagnostic reports exactly the dropped buckets
    val hot = Dedup.minhashHotBuckets(docs, "doc_id", "text", maxBucketSize = 100)
      .collect()
    assert(hot.nonEmpty && hot.forall(_.getLong(2) == 2000L),
      "every hot bucket is the 2000-doc boilerplate cluster")
    // simhash path honors the same cap
    val simCapped = Dedup.simhashNearDuplicates(docs, "doc_id", "text",
      maxHamming = 15, bands = 16, maxBucketSize = 100)
    assert(simCapped.count() < 1000)
    // embedding path: identical vectors all in one bucket, capped away
    val vecs = ((1 to 2000).map(i => (i.toLong, Array.fill(8)(1.0f))) ++
      // negated direction → opposite sign bits → a bucket disjoint
      // from the boilerplate cluster's
      Seq((9001L, Array(-1f, -2f, -3f, -4f, -5f, -6f, -7f, -8f)),
          (9002L, Array(-1f, -2f, -3f, -4f, -5f, -6f, -7f, -8.01f)))).toDF("vec_id", "embedding")
    val embCapped = Dedup.embeddingNearDuplicates(vecs, "vec_id", "embedding",
      minCosine = 0.9, nPlanes = 4, dim = 8, maxBucketSize = 100)
    val embPairs = embCapped.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(embPairs.contains((9001L, 9002L)), "planted vector pair must survive")
    assert(embPairs.length < 1000)
  }

  test("crossSimilarity caps hot buckets on both sides; bands only add candidates") {
    import graft.operators.Similarity
    // adversarial linking corpus: 2000 identical vectors on EACH side
    // (the same hot bucket in every band — 4M cross pairs uncapped),
    // plus one planted cross-pair in the opposite sign quadrant
    val hotL = ((1 to 2000).map(i => (i.toLong, Array.fill(8)(1.0f))) ++
      Seq((9001L, Array(-1f, -2f, -3f, -4f, -5f, -6f, -7f, -8f)))).toDF("qid", "embedding")
    val hotR = ((1 to 2000).map(i => (10000L + i, Array.fill(8)(1.0f))) ++
      Seq((9002L, Array(-1f, -2f, -3f, -4f, -5f, -6f, -7f, -8.01f)))).toDF("cid", "embedding")
    val linked = Similarity.crossSimilarity(hotL, hotR, "qid", "cid", "embedding",
      minCosine = 0.9, nPlanes = 4, dim = 8, maxBucketSize = 100)
    val pairs = linked.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((9001L, 9002L)), "planted cross pair must survive the cap")
    assert(pairs.length < 1000, s"per-side bucket cap must bound the join, got ${pairs.length}")

    // AND-OR banding: band 0 uses the same seeded planes in both runs,
    // so the 2-band candidate set is a superset of the 1-band one
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 60L).map(i => (i, Array.fill(8)(rnd.nextFloat() - 0.5f)))
    val l = vecs.filter(_._1 % 2 == 0).toDF("qid", "embedding")
    val r = vecs.filter(_._1 % 2 == 1).toDF("cid", "embedding")
    def run(bands: Int): Set[(Long, Long)] =
      Similarity.crossSimilarity(l, r, "qid", "cid", "embedding",
          minCosine = 0.0, nPlanes = 4, dim = 8, bands = bands)
        .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val one = run(1)
    val two = run(2)
    assert(one.subsetOf(two), "2-band candidates must contain all 1-band candidates")
    assert(two.size > one.size, "the second band should surface extra candidates here")
  }

  test("dedupCorpus is unchanged by the default cap on a normal corpus") {
    import graft.operators.Dedup
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
    val withCap = Dedup.dedupCorpus(docs, "doc_id", "text", minJaccard = 0.3)
      .agg(sum(when(col("keep"), 1L).otherwise(0L)), countDistinct(col("dup_class"))).head()
    val noCap = Dedup.dedupCorpus(docs, "doc_id", "text", minJaccard = 0.3,
      maxBucketSize = 0)
      .agg(sum(when(col("keep"), 1L).otherwise(0L)), countDistinct(col("dup_class"))).head()
    assert(withCap == noCap)
  }

  test("IVF layout: cluster-partitioned corpus makes probes partition-pruned scans") {
    import graft.operators.Similarity
    val emb = graft.core.Engine.table(spark, sfDir, "embeddings")
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 4, fitSampleFraction = 1.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    // the at-scale layout: corpus written once, partitioned by cluster
    graft.operators.Scale.writePartitioned(
      emb.join(index.assignments, Seq("vec_id")), dir, Seq("cluster"))
    val layout = spark.read.parquet(dir)
    val probed = layout.filter(col("cluster").isin(0, 1))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"probe must be a partition-pruned scan:\n$plan")
    // pruned probe reads exactly the two clusters' rows
    val expected = index.assignments.filter(col("cluster").isin(0, 1)).count()
    assert(probed.count() == expected && expected > 0)
    // and the dry-run accounting shows the probe reads fewer bytes
    assert(graft.sql.QueryStats.dryRunBytes(probed) <
      graft.sql.QueryStats.dryRunBytes(layout))
  }

  test("partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Scale.writePartitioned(
      graft.core.Engine.table(spark, sfDir, "events"), dir, Seq("event_type"))
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "error")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition filters in:\n$plan")
    assert(pruned.count() ==
      graft.core.Engine.table(spark, sfDir, "events")
        .filter(col("event_type") === "error").count())
  }

  test("zOrderValue matches a reference Morton interleave, clamping out-of-range") {
    def ref(a: Long, b: Long, bits: Int): Long = {
      val mask = (1L << bits) - 1
      val x = math.min(math.max(a, 0L), mask)
      val y = math.min(math.max(b, 0L), mask)
      (0 until bits).foldLeft(0L) { (z, i) =>
        z | (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1))
      }
    }
    val rnd = new scala.util.Random(7)
    val pts = Seq((-5L, 3L), (0L, 0L), (255L, 255L), (256L, 1L), (999L, -1L)) ++
      (1 to 500).map(_ => (rnd.nextInt(400).toLong - 50, rnd.nextInt(400).toLong - 50))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.CatalystExpressions.zOrderValue(col("a"), col("b"), 8).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 8),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order layout gives multi-column file skipping a single-column sort cannot") {
    // 64x64 grid, 16 files. A layout sorted on x alone makes every
    // file span the FULL y domain (no file can be skipped for a
    // predicate on y); the z-order layout's files cover tight
    // rectangles, so a point predicate on y prunes most files by
    // min/max footer stats.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def fileYRanges(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("y").as("lo"), max("y").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    }
    val xSorted = fileYRanges(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    val zOrdered = fileYRanges(Scale.zOrderLayout(grid, "x", "y", numFiles = 16, bits = 6))
    // a y=17 point predicate: files whose [min,max] straddle it can't be skipped
    def hit(ranges: Seq[(Long, Long)]): Int =
      ranges.count { case (lo, hi) => lo <= 17 && 17 <= hi }
    assert(hit(xSorted) == xSorted.size,
      s"x-sorted layout should never skip on y: ${xSorted.sorted}")
    assert(hit(zOrdered) * 2 <= zOrdered.size,
      s"z-order layout must skip most files on a y predicate: ${zOrdered.sorted}")
    // row-preserving: the reorder loses and invents nothing
    assert(Scale.zOrderLayout(grid, "x", "y", 16, 6).count() == 64L * 64L)
  }

  test("deleteByKeys rewrites only affected partitions; emptied partitions are dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-del").toString
    // 4 partitions; user 42 lives in p=1 and p=2; p=3 contains ONLY user 99
    val rows = Seq(
      (1L, 0L, "a"), (2L, 0L, "b"),
      (42L, 1L, "c"), (5L, 1L, "d"),
      (42L, 2L, "e"),
      (99L, 3L, "f"))
    rows.toDF("user_id", "p", "v").write.mode("overwrite").partitionBy("p").parquet(dir)
    def fileState(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val before = fileState()
    Thread.sleep(1100) // mtime granularity
    val deleted = Scale.deleteByKeys(spark, dir, "p", "user_id",
      Seq(42L, 99L).toDF("user_id"))
    assert(deleted == 3L, s"deleted $deleted")
    val after = fileState()
    // untouched partitions keep their exact files
    val untouched = before.filter { case (path, _) => path.contains("p=0") }
    untouched.foreach { case (path, m) =>
      assert(after.get(path).contains(m), s"p=0 file must be untouched: $path")
    }
    // p=3 (all rows deleted) is gone entirely
    assert(!after.keys.exists(_.contains("p=3")), "emptied partition must be dropped")
    // survivors are exactly the non-hit rows
    // partition values come back type-inferred from dir names (int)
    val out = spark.read.parquet(dir)
      .select(col("user_id"), col("p").cast("long"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 0L, "a"), (2L, 0L, "b"), (5L, 1L, "d")))
    // no-op delete returns 0 and changes nothing
    assert(Scale.deleteByKeys(spark, dir, "p", "user_id",
      Seq(12345L).toDF("user_id")) == 0L)
  }

  test("compactToTarget sizes the rewrite from real input bytes") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    // pathological ingest layout: 64 tiny files
    val df = (1 to 20000).map(i => (i.toLong, s"row_$i")).toDF("id", "v")
    df.repartition(64).write.mode("overwrite").parquet(inDir)
    val fs = new java.io.File(inDir)
    val inBytes = fs.listFiles.filter(f => f.isFile && !f.getName.startsWith("_"))
      .map(_.length).sum
    val nOut = Scale.compactToTarget(spark, inDir, outDir, targetBytes = inBytes / 4)
    // ceil(inBytes / (inBytes/4)) = 4, or 5 when integer division floors
    assert(nOut == 4 || nOut == 5, s"~4 files expected, got $nOut")
    val outFiles = new java.io.File(outDir).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(outFiles.length == nOut,
      s"files on disk (${outFiles.length}) must match the computed count")
    val out = spark.read.parquet(outDir)
    assert(out.count() == 20000)
    assert(out.exceptAll(df).count() == 0 && df.exceptAll(out).count() == 0)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by content fingerprint") {
    val oldSnap = Seq((1L, "alpha", "x"), (2L, "beta", "y"), (3L, "gamma", "z"))
      .toDF("id", "text", "meta")
    val newSnap = Seq((2L, "beta", "y"), (3L, "GAMMA", "z"), (4L, "delta", "w"))
      .toDF("id", "text", "meta")
    val got = Scale.snapshotDiff(oldSnap, newSnap, "id", Seq("text", "meta"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // multi-column fingerprint: meta-only change is still "changed"
    val metaChanged = Scale.snapshotDiff(
        oldSnap, oldSnap.withColumn("meta", concat(col("meta"), lit("!"))),
        "id", Seq("text", "meta"))
      .filter(col("status") === "changed").count()
    assert(metaChanged == 3L)
  }

  test("skewReport: hot key surfaces with its share and a salt ≈ count/avg") {
    // 1 hot key with 900 rows + 100 keys with 1 row: avg ≈ 9.9
    val df = (Seq.fill(900)("hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("k")
    val top = Scale.skewReport(df, Seq("k"), topK = 3).collect()
    assert(top.head.getAs[String]("key") == "hot")
    assert(top.head.getAs[Long]("cnt") == 900L)
    assert(top.head.getAs[Double]("share") == 0.9)
    assert(top.head.getAs[Long]("n_keys") == 101L)
    assert(top.head.getAs[Long]("n_rows") == 1000L)
    // skew = max*keys/rows = 900*101/1000 = 90.9; salt = ceil(90.9) = 91
    assert(top.head.getAs[Double]("skew_ratio") == 90.9)
    assert(top.head.getAs[Int]("suggested_salt") == 91)
    // cold keys suggest salt 1 (no salting)
    assert(top(1).getAs[Int]("suggested_salt") == 1)
    assert(top.length == 3)
  }

  test("equiDepthHistogram: quartiles of 1..8 land on percentile_disc boundaries") {
    val df = (1 to 8).map(i => ("g", i)).toDF("g", "score")
    val got = Scale.equiDepthHistogram(df, "g", "score", buckets = 4)
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Int]("upper_bound"))
      .toMap
    // cum shares: score k has frac k/8 → boundaries at .25/.5/.75/1
    assert(got == Map(1 -> 2, 2 -> 4, 3 -> 6, 4 -> 8))
    // heavy ties: one dominant value swallows several buckets
    val skewed = (Seq.fill(90)(5) ++ Seq(1, 9)).map(("s", _)).toDF("g", "score")
    val sk = Scale.equiDepthHistogram(skewed, "g", "score", buckets = 4)
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Int]("upper_bound"))
      .toMap
    assert(sk(1) == 5 && sk(2) == 5 && sk(3) == 5 && sk(4) == 9)
  }

  test("upsertAggState: batch folds equal the full recompute; crash-safe pointer versioning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-aggstate").toString
    val b1 = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("k", "v")
    val b2 = Seq(("a", 0.5), ("c", 3.25)).toDF("k", "v")
    Scale.upsertAggState(spark, dir, b1, Seq("k"), "v")
    val after2 = Scale.upsertAggState(spark, dir, b2, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // equals the one-shot aggregate over b1 ∪ b2, in exact cents
    assert(after2 == Map("a" -> ((3L, 350L)), "b" -> ((1L, 1000L)),
      "c" -> ((1L, 325L))))
    // versioned layout: v1 and v2 both present, _CURRENT points at v2
    val files = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(files.contains("v1") && files.contains("v2") && files.contains("_CURRENT"))
    assert(Scale.readAggState(spark, dir).collect().length == 3)
    // a torn write of v3 (no pointer flip) must leave readers on v2
    new java.io.File(s"$dir/v3").mkdirs()
    assert(Scale.readAggState(spark, dir)
      .collect().map(_.getString(0)).toSet == Set("a", "b", "c"))
  }

  test("snapshotDiff fingerprints are boundary- and null-collision-safe") {
    // ("ab","c") vs ("a","bc"): a separator-less concat collides
    val l = Seq((1L, "ab", "c")).toDF("id", "a", "b")
    val r = Seq((1L, "a", "bc")).toDF("id", "a", "b")
    assert(Scale.snapshotDiff(l, r, "id", Seq("a", "b"))
      .head().getAs[String]("status") == "changed")
    // ("a", null) vs ("a", ""): concat_ws drops nulls and collides;
    // and null vs null must still compare "unchanged"
    val ln = Seq((1L, "a", null: String), (2L, null: String, null: String))
      .toDF("id", "a", "b")
    val rn = Seq((1L, "a", ""), (2L, null: String, null: String))
      .toDF("id", "a", "b")
    val st = Scale.snapshotDiff(ln, rn, "id", Seq("a", "b"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
    assert(st == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("globalPrefixSums equals the window cumulative, and never plans a global window") {
    val rnd = new scala.util.Random(11)
    val counts = (1 to 500).map(i => (rnd.nextInt(40) * 3 - 17, i.toLong))
      .groupBy(_._1).map { case (v, rows) => (v, rows.size.toLong) }
      .toSeq.toDF("v", "c")
    val got = Scale.globalPrefixSums(counts, "v", Seq("c"), buckets = 7)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = counts.withColumn("cum_c", sum(col("c")).over(w))
      .withColumn("total_c", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window
          .rowsBetween(Long.MinValue, Long.MaxValue)))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // the whole point: no unpartitioned Window in the physical plan
    import org.apache.spark.sql.execution.window.WindowExec
    assert(got.queryExecution.sparkPlan.collect {
      case x: WindowExec if x.partitionSpec.isEmpty => x
    }.isEmpty, "globalPrefixSums must never plan a global window")
    // constant-value degenerate case: everything lands in bucket 0
    val one = Seq((5, 2L), (5, 3L)).toDF("v", "c")
      .groupBy("v").agg(sum("c").as("c"))
    val oneOut = Scale.globalPrefixSums(one, "v", Seq("c")).head()
    assert(oneOut.getAs[Long]("cum_c") == 5L && oneOut.getAs[Long]("total_c") == 5L)
    // empty input keeps the schema
    val empty = Scale.globalPrefixSums(counts.filter(lit(false)), "v", Seq("c"))
    assert(empty.columns.toSet == Set("v", "c", "cum_c", "total_c"))
    assert(empty.count() == 0)
  }

  test("globalPrefixSums fails loudly on NaN or null order values") {
    // a single NaN would make max() NaN → every bucket NaN → non-ANSI
    // cast folds all rows into one bucket, silently recreating the
    // global window: the helper must refuse instead
    val nan = Seq((1.0, 2L), (Double.NaN, 3L), (4.0, 5L)).toDF("v", "c")
    val e1 = intercept[IllegalArgumentException] {
      Scale.globalPrefixSums(nan, "v", Seq("c"))
    }
    assert(e1.getMessage.contains("NaN"), e1.getMessage)
    val withNull = Seq((Some(1.0), 2L), (Option.empty[Double], 3L),
      (Some(4.0), 5L)).toDF("v", "c")
    val e2 = intercept[IllegalArgumentException] {
      Scale.globalPrefixSums(withNull, "v", Seq("c"))
    }
    assert(e2.getMessage.contains("NaN/null"), e2.getMessage)
  }

  test("globalPrefixSums property sweep: random shapes and bucket counts match the window form") {
    for (seed <- 1 to 5; buckets <- Seq(1, 3, 16)) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(300)
      val spread = 1 + rnd.nextInt(200)
      val counts = (1 to n)
        .map(_ => (rnd.nextInt(spread) - spread / 2, 1L + rnd.nextInt(9)))
        .groupBy(_._1).map { case (v, rows) => (v, rows.map(_._2).sum) }
        .toSeq.toDF("v", "c")
      val got = Scale.globalPrefixSums(counts, "v", Seq("c"), buckets)
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val want = counts.withColumn("cum_c", sum(col("c")).over(w))
        .withColumn("total_c", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window
            .rowsBetween(Long.MinValue, Long.MaxValue)))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"mismatch at seed=$seed buckets=$buckets")
    }
  }

  test("groupedPrefixSums equals per-group window cumulatives in one pass") {
    val rnd = new scala.util.Random(7)
    val counts = (for {
      g <- Seq("r", "f", "m"); _ <- 1 to 150
    } yield (g, rnd.nextInt(30 + g.hashCode.abs % 50).toLong, 1L))
      .groupBy(t => (t._1, t._2))
      .map { case ((g, v), rows) => (g, v, rows.map(_._3).sum) }
      .toSeq.toDF("g", "v", "c")
    val got = Scale.groupedPrefixSums(counts, "g", "v", Seq("c"), buckets = 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wt = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val want = counts.withColumn("cum_c", sum(col("c")).over(w))
      .withColumn("total_c", sum(col("c")).over(wt))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    import org.apache.spark.sql.execution.window.WindowExec
    assert(got.queryExecution.sparkPlan.collect {
      case x: WindowExec if x.partitionSpec.isEmpty => x
    }.isEmpty, "groupedPrefixSums must never plan a global window")
    // NaN in any group refuses the whole call
    val nan = Seq(("a", 1.0, 2L), ("b", Double.NaN, 3L)).toDF("g", "v", "c")
    val e = intercept[IllegalArgumentException] {
      Scale.groupedPrefixSums(nan, "g", "v", Seq("c"))
    }
    assert(e.getMessage.contains("NaN"), e.getMessage)
    // constant-value group coexists with a spread group
    val mix = Seq(("k", 5L, 2L), ("k", 5L, 3L), ("s", 1L, 1L), ("s", 9L, 4L))
      .toDF("g", "v", "c").groupBy("g", "v").agg(sum("c").as("c"))
    val mixGot = Scale.groupedPrefixSums(mix, "g", "v", Seq("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("cum_c"), r.getAs[Long]("total_c")))).toMap
    assert(mixGot(("k", 5L)) == ((5L, 5L)))
    assert(mixGot(("s", 1L)) == ((1L, 5L)) && mixGot(("s", 9L)) == ((5L, 5L)))
    // empty input keeps the schema
    val empty = Scale.groupedPrefixSums(counts.filter(lit(false)), "g", "v", Seq("c"))
    assert(empty.columns.toSet == Set("g", "v", "c", "cum_c", "total_c"))
    assert(empty.count() == 0)
  }

  test("globalRowNumber equals row_number over (value, ties) in both directions") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 300).map(i => (rnd.nextInt(25), s"id_$i")).toDF("score", "id")
    val wAsc = org.apache.spark.sql.expressions.Window
      .orderBy(col("score"), col("id"))
    val wantAsc = df.withColumn("rank",
      row_number().over(wAsc).cast("long"))
    val gotAsc = Scale.globalRowNumber(df, "score", Seq("id"))
    assert(gotAsc.exceptAll(wantAsc).count() == 0 &&
      wantAsc.exceptAll(gotAsc).count() == 0)
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id"))
    val wantDesc = df.withColumn("rank", row_number().over(wDesc).cast("long"))
    val gotDesc = Scale.globalRowNumber(df, "score", Seq("id"), ascending = false)
    assert(gotDesc.exceptAll(wantDesc).count() == 0 &&
      wantDesc.exceptAll(gotDesc).count() == 0)
  }
}
