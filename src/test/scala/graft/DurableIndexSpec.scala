package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CorpusIndex, Dedup}

/** Durability of the corpus index and the dedup path (round-2 verdict
  * item 1): an index persisted as parquet must serve a *different*
  * session's queries with hash-identical results, and the
  * connected-components loop must run on durable (DFS) checkpoints
  * instead of executor block storage when asked.
  *
  * "Kill and re-open a session" in one test JVM: suites share the
  * SparkContext (stopping it would kill every other suite), so the
  * re-open is `spark.newSession()` — fresh session state and a fresh
  * identity in CorpusIndex's (session, key) cache, i.e. the loaded
  * index CANNOT be served by the building session's memo. We
  * additionally assert the served frame's input files point at the
  * persisted parquet, proving the load path (not a recompute) answered.
  */
class DurableIndexSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("persist + load serves q53/q60 from the parquet index, hash-identical") {
    val base = Files.createTempDirectory("graft-index").toString
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
    CorpusIndex.persist(docs, base, key = sfDir, idCol = "doc_id", textCol = "text")

    // the layout on disk is what the scaladoc promises
    assert(new java.io.File(s"$base/index_meta.json").exists())
    assert(new java.io.File(s"$base/artifacts").listFiles().exists(_.getName.endsWith(".parquet")))

    // fresh-compute ground truth (building session, its own memo)
    val q53Fresh = rows(SparkEntry.queries("q53_dedup_corpus")(spark, sfDir))
    val q60Fresh = rows(SparkEntry.queries("q60_curate")(spark, sfDir))

    // "re-opened" session: new session state, new cache identity
    val s2 = spark.newSession()
    val art = CorpusIndex.load(s2, base)
    assert(art.inputFiles.exists(_.contains(s"$base/artifacts")),
      "loaded frame must be backed by the persisted parquet")

    // the accessors in the new session must be served by the loaded
    // frame — same parquet files, not a recomputation of the corpus
    val sigs = CorpusIndex.minhashSignatures(
      graft.core.Engine.table(s2, sfDir, "documents"), sfDir, "doc_id", "text")
    assert(sigs.inputFiles.exists(_.contains(s"$base/artifacts")),
      "accessor in the loaded session must read the persisted index")

    assert(rows(SparkEntry.queries("q53_dedup_corpus")(s2, sfDir)) === q53Fresh)
    assert(rows(SparkEntry.queries("q60_curate")(s2, sfDir)) === q60Fresh)
  }

  test("a memoized build may depend on another memoized build (cold)") {
    // Regression: dedupClasses' memo thunk calls minhashSignatures'
    // (via artifacts') memo on the SAME cache. When the map held the
    // values directly, the nested computeIfAbsent threw
    // IllegalStateException("Recursive update") whenever the outer
    // entry computed first AND both keys hashed into the same bin —
    // a suite-order-dependent flake (hit q60 in full runs).
    //
    // Deterministic form: "Aa" and "BB" have equal String.hashCode
    // (and equal length, so a shared prefix preserves the equality),
    // hence these two keys share a bin at EVERY table size — the
    // pre-fix map throws here on every run, not just unlucky ones.
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
    val ids = docs.select("doc_id").limit(5)
    val out = CorpusIndex.memo(spark, "memo-reentry-Aa") {
      CorpusIndex.memo(spark, "memo-reentry-BB")(ids)
      ids
    }
    assert(out.count() == 5)

    // and the real nested path, cold in a fresh cache identity
    val s2 = spark.newSession()
    val classes = CorpusIndex.dedupClasses(
      graft.core.Engine.table(s2, sfDir, "documents"),
      sfDir, "doc_id", "text")
    assert(classes.count() > 0)
  }

  test("append grows the persisted index incrementally; incremental near-dup equals full recompute") {
    val base = Files.createTempDirectory("graft-index-incr").toString
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
    val old = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    CorpusIndex.persist(old, base, key = s"$sfDir#incr", idCol = "doc_id", textCol = "text")

    // ingest the delta: derives the BATCH only, appends to the parquet index
    val newArt = CorpusIndex.append(batch, base, textCol = "text")
    val art2 = CorpusIndex.load(spark.newSession(), base)
    assert(art2.count() === docs.count(), "index must now cover old + batch")

    // incremental pairs (old∪new banded vs new banded) ∪ old-only pairs
    // == one full recompute over the whole corpus (same params, cap off
    // so old-bucket and full-bucket cap decisions cannot diverge)
    val incr = CorpusIndex.incrementalNearDuplicates(spark, base, newArt,
        minJaccard = 0.5, maxBucketSize = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oldPairs = Dedup.ngramJaccard(old,
        Dedup.minhashCandidatePairs(old, "doc_id", "text", maxBucketSize = 0),
        "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.ngramJaccard(docs,
        Dedup.minhashCandidatePairs(docs, "doc_id", "text", maxBucketSize = 0),
        "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr.union(oldPairs) === full)
    assert(incr.intersect(oldPairs) === Set.empty, "incremental pairs always touch the batch")
  }

  test("incremental Hamming near-dup (image-sig form): full(old) ∪ incr(all, new) == full(all)") {
    import spark.implicits._
    // synthetic 64-bit signature store with planted near pairs; the
    // equivalence is the contract that lets a nightly image ingest pay
    // O(batch) instead of re-pairing the corpus
    val rnd = new scala.util.Random(41)
    def flip(h: Long, bits: Int): Long =
      (0 until bits).foldLeft(h)((x, _) => x ^ (1L << rnd.nextInt(64)))
    val baseHashes = Array.fill(120)(rnd.nextLong())
    val old = (0 until 120).map(i => (i.toLong, baseHashes(i)))
    // new batch: 20 fresh + near-dups of old ids 3 and 7 + a near pair
    // WITHIN the batch
    val fresh = (200 until 220).map(i => (i.toLong, rnd.nextLong()))
    val batch = fresh ++ Seq(
      (300L, flip(baseHashes(3), 2)),
      (301L, flip(baseHashes(7), 3)),
      (302L, flip(baseHashes(3), 1))) // also near 300
    val oldDf = old.toDF("id", "sh")
    val allDf = (old ++ batch).toDF("id", "sh")
    val newDf = batch.toDF("id", "sh")
    def pairs(df: DataFrame) =
      Dedup.simhashNearDuplicatesFromSigs(df, maxHamming = 6, bands = 8,
        maxBucketSize = 0).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val incr = Dedup.incrementalHammingNearDuplicates(allDf, newDf,
      maxHamming = 6, bands = 8, maxBucketSize = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs(oldDf) ++ incr == pairs(allDf),
      "incremental union must equal the full recompute with the cap off")
    assert(incr.exists(p => p._1 == 3L && p._2 == 300L),
      s"batch-vs-old pair must surface: $incr")
    assert(incr.exists(p => p._1 == 300L && p._2 == 302L),
      s"batch-vs-batch pair must surface: $incr")
    assert(!incr.exists(p => p._1 < 200L && p._2 < 200L),
      s"old-vs-old must never re-pair: $incr")
  }

  test("incremental Hamming pairs with identical-signature twins equal the brute-force join row-for-row") {
    import spark.implicits._
    // The collapse-then-expand candidate generation must be an EXACT
    // restatement of the direct banded join — pair multiplicity is a
    // spec'd surface (the streaming store persists these rows). Plant
    // the meme shape it exists for: identical-signature twin classes
    // on both sides, plus near pairs and isolates.
    val rnd = new scala.util.Random(7)
    def flip(h: Long, bits: Int): Long =
      (0 until bits).foldLeft(h)((x, _) => x ^ (1L << rnd.nextInt(64)))
    val classHash = Array.fill(4)(rnd.nextLong())
    // full store: 3 twin classes of 6 + 10 isolates (ids 0..27)
    val full = (0 until 18).map(i => (i.toLong, classHash(i % 3))) ++
      (18 until 28).map(i => (i.toLong, rnd.nextLong()))
    // batch: twins of class 0 and a NEW twin class, a near-dup of
    // class 1, isolates; batch ids overlap nothing
    val batch = (100 until 105).map(i => (i.toLong, classHash(0))) ++
      (110 until 114).map(i => (i.toLong, classHash(3))) ++
      Seq((120L, flip(classHash(1), 2)), (121L, rnd.nextLong()))
    val allDf = (full ++ batch).toDF("id", "sh")
    val newDf = batch.toDF("id", "sh")
    val got = Dedup.incrementalHammingNearDuplicates(allDf, newDf,
        maxHamming = 6, bands = 8, maxBucketSize = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference: new-vs-anything sharing >= 1 band chunk,
    // Hamming <= 6, least/greatest ids, distinct
    def chunks(sh: Long): Seq[Long] =
      (0 until 8).map(b => (sh >>> (b * 8)) & 0xFFL)
    val expect = (for {
      (idn, shn) <- batch
      (idf, shf) <- full ++ batch
      if idf != idn
      if chunks(shf).zip(chunks(shn)).exists { case (a, b) => a == b }
      if java.lang.Long.bitCount(shf ^ shn) <= 6
    } yield (math.min(idf, idn), math.max(idf, idn),
      java.lang.Long.bitCount(shf ^ shn))).toSet
    assert(got === expect,
      s"missing=${expect -- got}\nextra=${got -- expect}")
    // the twin classes really exercise the collapse: class 0 alone
    // must contribute 6 full-store twins x 5 batch twins + C(5,2)
    assert(expect.count(p => p._3 == 0 && (p._1 < 18 || p._1 >= 100)) >= 40)
  }

  test("IVF layout append: probe(layout ∪ batch) == probe(rebuilt layout), old partitions untouched") {
    import graft.operators.Similarity
    val emb = graft.core.Engine.table(spark, sfDir, "embeddings")
    val old = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300)
    val query = emb.filter(col("vec_id") === 1).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray

    // fit on OLD only (the model is fixed at fit time), layout = old
    val index = Similarity.ivfIndex(old, "vec_id", "embedding",
      nCentroids = 4, fitSampleFraction = 1.0)
    val appended = Files.createTempDirectory("graft-ivf-app").toString
    Similarity.ivfWriteLayout(old, index, "vec_id", "embedding", appended)
    val oldFiles = spark.read.parquet(s"$appended/corpus").inputFiles.toSet

    Similarity.ivfAppend(batch, "embedding", appended)
    assert(spark.read.parquet(s"$appended/corpus").inputFiles.toSet
      .intersect(oldFiles) == oldFiles, "append must not rewrite old files")

    // rebuild whole with the SAME centroids (assignments extended to
    // the full corpus — ivfWriteLayout keeps only assigned rows)
    val rebuilt = Files.createTempDirectory("graft-ivf-reb").toString
    val fullIndex = Similarity.IvfIndex(index.centroids,
      emb.withColumn("cluster", graft.functions.CatalystExpressions
          .nearestCentroid(col("embedding"), index.centroids))
        .select(col("vec_id"), col("cluster")))
    Similarity.ivfWriteLayout(emb, fullIndex, "vec_id", "embedding", rebuilt)

    for (nProbe <- Seq(1, 2, 4)) {
      val a = Similarity.knnIvfPartitioned(spark, appended, "vec_id", "embedding",
        query, k = 10, nProbe = nProbe).collect().toSeq
      val b = Similarity.knnIvfPartitioned(spark, rebuilt, "vec_id", "embedding",
        query, k = 10, nProbe = nProbe).collect().toSeq
      assert(a == b, s"nProbe=$nProbe: appended layout must equal rebuild")
    }
  }

  test("LSH layout append: probe(layout ∪ batch) == probe(rebuilt layout)") {
    import graft.operators.Similarity
    val emb = graft.core.Engine.table(spark, sfDir, "embeddings")
    val old = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300)
    val query = emb.filter(col("vec_id") === 1).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray

    val appended = Files.createTempDirectory("graft-lsh-app").toString
    Similarity.lshWriteLayout(old, "vec_id", "embedding", appended,
      nPlanes = 6, dim = 64, seed = 42L)
    val oldFiles = spark.read.parquet(s"$appended/corpus").inputFiles.toSet
    Similarity.lshAppend(batch, "embedding", appended)
    assert(spark.read.parquet(s"$appended/corpus").inputFiles.toSet
      .intersect(oldFiles) == oldFiles, "append must not rewrite old files")

    val rebuilt = Files.createTempDirectory("graft-lsh-reb").toString
    Similarity.lshWriteLayout(emb, "vec_id", "embedding", rebuilt,
      nPlanes = 6, dim = 64, seed = 42L)

    for (h <- Seq(0, 1, 2)) {
      val a = Similarity.knnLshPartitioned(spark, appended, "vec_id", "embedding",
        query, k = 10, probeHamming = h).collect().toSeq
      val b = Similarity.knnLshPartitioned(spark, rebuilt, "vec_id", "embedding",
        query, k = 10, probeHamming = h).collect().toSeq
      assert(a == b, s"probeHamming=$h: appended layout must equal rebuild")
    }
  }

  test("ensureIvfLayout in a fresh session cannot clobber an appended layout") {
    import graft.operators.Similarity
    val emb = graft.core.Engine.table(spark, sfDir, "embeddings")
    val old = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300)
    val query = emb.filter(col("vec_id") === 1).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray

    // session A: ensure (builds, old rows only), then append the batch
    val path = Files.createTempDirectory("graft-ivf-ensure").toString
    Similarity.ensureIvfLayout(old, "vec_id", "embedding", path,
      nCentroids = 4, fitSampleFraction = 1.0)
    Similarity.ivfAppend(batch, "embedding", path)
    val files = spark.read.parquet(s"$path/corpus").inputFiles.toSet
    val mtimes = files.map(f => f -> new java.io.File(new java.net.URI(f)).lastModified).toMap
    val expect = (1 to 4).map(p => Similarity.knnIvfPartitioned(spark, path,
      "vec_id", "embedding", query, k = 10, nProbe = p).collect().toSeq)

    // session B: fresh memo identity; ensure with a DIFFERENT input
    // frame (old only) — pre-fix this re-fit + overwrite dropped the
    // appended batch; post-fix the existing meta short-circuits it
    val s2 = spark.newSession()
    Similarity.ensureIvfLayout(
      graft.core.Engine.table(s2, sfDir, "embeddings").filter(col("vec_id") < 300),
      "vec_id", "embedding", path, nCentroids = 4, fitSampleFraction = 1.0)

    val after = s2.read.parquet(s"$path/corpus").inputFiles.toSet
    assert(after == files, "ensure in a new session must not rewrite the corpus")
    files.foreach { f =>
      assert(new java.io.File(new java.net.URI(f)).lastModified == mtimes(f),
        s"ensure must not touch $f")
    }
    for ((exp, p) <- expect.zip(1 to 4)) {
      val got = Similarity.knnIvfPartitioned(s2, path, "vec_id", "embedding",
        query, k = 10, nProbe = p).collect().toSeq
      assert(got == exp, s"nProbe=$p: probe must still see layout ∪ batch")
    }
  }

  test("ivfDrift: ≈ fit-mean for in-distribution batches, large for shifted batches") {
    import spark.implicits._
    import graft.operators.Similarity
    // clustered corpus (the shape IVF is FOR — the sf embeddings are
    // near-uniform, where no batch can meaningfully drift): vectors
    // hug one of 4 orthogonal axes with a deterministic noise spike
    val dim = 64
    def mk(id: Long, axis: Int): (Long, Array[Float]) = {
      val v = new Array[Float](dim)
      v(axis) = 1.0f
      val spike = ((id * 7 + 13) % dim).toInt
      if (spike != axis) v(spike) = 0.3f
      (id, v)
    }
    val fit = (0L until 200L).map(i => mk(i, (i % 4).toInt * 8)).toDF("vec_id", "embedding")
    val batch = (1000L until 1200L).map(i => mk(i, (i % 4).toInt * 8)).toDF("vec_id", "embedding")
    val shifted = (2000L until 2200L).map(i => mk(i, 50)).toDF("vec_id", "embedding")

    val path = Files.createTempDirectory("graft-ivf-drift").toString
    val index = Similarity.ivfIndex(fit, "vec_id", "embedding",
      nCentroids = 4, fitSampleFraction = 1.0)
    Similarity.ivfWriteLayout(fit, index, "vec_id", "embedding", path)

    // same construction, new ids → batch mean ≈ fit mean
    val inDist = Similarity.ivfDrift(batch, "embedding", path)
    assert(inDist.fitMean > 0 && inDist.fitP95 >= inDist.fitMean)
    assert(inDist.ratio > 0.5 && inDist.ratio < 1.5,
      s"in-distribution batch must sit near the fit distribution: $inDist")

    // a 5th, unseen axis: the assignment's own distance explodes —
    // both the ratio and the p95 gate trip
    val drift = Similarity.ivfDrift(shifted, "embedding", path)
    assert(drift.ratio > 1.5, s"shifted batch must report drift: $drift")
    assert(drift.batchMean > drift.fitP95,
      s"shifted batch must exceed the fit-time p95: $drift")
  }

  test("ensureLshLayout in a fresh session cannot clobber an appended layout") {
    import graft.operators.Similarity
    val emb = graft.core.Engine.table(spark, sfDir, "embeddings")
    val old = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300)
    val query = emb.filter(col("vec_id") === 1).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray

    val path = Files.createTempDirectory("graft-lsh-ensure").toString
    Similarity.ensureLshLayout(old, "vec_id", "embedding", path,
      nPlanes = 6, dim = 64, seed = 42L)
    Similarity.lshAppend(batch, "embedding", path)
    val files = spark.read.parquet(s"$path/corpus").inputFiles.toSet
    val expect = (0 to 2).map(h => Similarity.knnLshPartitioned(spark, path,
      "vec_id", "embedding", query, k = 10, probeHamming = h).collect().toSeq)

    val s2 = spark.newSession()
    Similarity.ensureLshLayout(
      graft.core.Engine.table(s2, sfDir, "embeddings").filter(col("vec_id") < 300),
      "vec_id", "embedding", path, nPlanes = 6, dim = 64, seed = 42L)

    assert(s2.read.parquet(s"$path/corpus").inputFiles.toSet == files,
      "ensure in a new session must not rewrite the corpus")
    for ((exp, h) <- expect.zip(0 to 2)) {
      val got = Similarity.knnLshPartitioned(s2, path, "vec_id", "embedding",
        query, k = 10, probeHamming = h).collect().toSeq
      assert(got == exp, s"probeHamming=$h: probe must still see layout ∪ batch")
    }
  }

  test("durable substring index: indexed check == direct; append == rebuild; old files untouched") {
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
    val train = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val refA = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
    val refB = docs.filter(pmod(col("doc_id"), lit(4)) === 3)
    def spansOf(df: DataFrame): Seq[(Long, Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted

    // persist half the reference; indexed check equals the direct operator
    val path = Files.createTempDirectory("graft-substr-idx").toString
    Dedup.substringIndexPersist(refA, "text", path, windowTokens = 5)
    val direct = spansOf(Dedup.crossCorpusDuplicatedSpans(train, refA,
      "doc_id", "text", windowTokens = 5))
    val indexed = spansOf(Dedup.duplicatedSpansIndexed(train, "doc_id", "text", path))
    assert(indexed == direct && direct.nonEmpty)

    // append the other half: check(batch ∪) == direct against the full
    // reference, and the original fp files are never rewritten
    val oldFiles = spark.read.parquet(s"$path/fps").inputFiles.toSet
    Dedup.substringIndexAppend(refB, "text", path)
    assert(spark.read.parquet(s"$path/fps").inputFiles.toSet
      .intersect(oldFiles) == oldFiles, "append must not rewrite old fp files")
    val directFull = spansOf(Dedup.crossCorpusDuplicatedSpans(train,
      refA.unionByName(refB), "doc_id", "text", windowTokens = 5))
    val indexedFull = spansOf(Dedup.duplicatedSpansIndexed(train, "doc_id", "text", path))
    assert(indexedFull == directFull)

    // a different session answers from the artifact alone
    val s2 = spark.newSession()
    val other = spansOf(Dedup.duplicatedSpansIndexed(
      graft.core.Engine.table(s2, sfDir, "documents")
        .filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", path))
    assert(other == indexedFull)
  }

  test("connectedComponents with a durable checkpoint dir matches localCheckpoint") {
    import spark.implicits._
    // two chains (1-2-3-4) and (10-11), plus a ring (20-21-22-20):
    // multi-iteration propagation so labels_* checkpoints actually cycle
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("id_a", "id_b")
    val ckpt = Files.createTempDirectory("graft-cc").toString
    // maxDriverEdges = 0 forces the ITERATIVE path — this suite locks
    // the durable-checkpoint discipline, not the driver fast path
    val durable = rows(Dedup.connectedComponents(pairs, checkpointDir = Some(ckpt),
      maxDriverEdges = 0L))
    val local = rows(Dedup.connectedComponents(pairs, maxDriverEdges = 0L))
    assert(durable === local)
    // and the driver union-find fast path agrees with both
    assert(rows(Dedup.connectedComponents(pairs)) === local)
    // each invocation namespaces its files under a run-unique cc_* dir
    val runDirs = new java.io.File(ckpt).listFiles().filter(_.getName.startsWith("cc_"))
    assert(runDirs.length == 1, s"one run dir expected: ${runDirs.mkString(",")}")
    val dirs = runDirs.head.listFiles().map(_.getName).toSeq
    assert(dirs.contains("edges"), s"edge list must be durably checkpointed: $dirs")
    // per-iteration cleanup: at most the final labels_* dir survives
    assert(dirs.count(_.startsWith("labels_")) <= 1,
      s"stale per-iteration label checkpoints must be deleted: $dirs")
  }

  test("durable CC results survive a second run reusing the checkpoint dir") {
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft-cc-reuse").toString
    // run A: a 4-chain; its result is a LAZY parquet read — don't touch it yet
    val a = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b"),
      checkpointDir = Some(ckpt), maxDriverEdges = 0L)
    // run B: disjoint ids, same dir, converges in fewer shapes — before
    // the per-run namespacing this overwrote/deleted run A's files
    val b = Dedup.connectedComponents(
      Seq((100L, 101L)).toDF("id_a", "id_b"),
      checkpointDir = Some(ckpt), maxDriverEdges = 0L)
    assert(rows(b) === Seq("[100,100]", "[101,100]"))
    // run A's still-unread plan must see ITS labels, not run B's
    assert(rows(a) === Seq("[1,1]", "[2,1]", "[3,1]", "[4,1]"))
  }

  test("dedupCorpus accepts a durable checkpoint dir end-to-end") {
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val withDir = Dedup.dedupCorpus(docs, "doc_id", "text", minJaccard = 0.3,
        checkpointDir = Some(ckpt))
      .agg(count(lit(1)).as("n"), sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
    val without = Dedup.dedupCorpus(docs, "doc_id", "text", minJaccard = 0.3)
      .agg(count(lit(1)).as("n"), sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
    assert(rows(withDir) === rows(without))
    val runDirs = new java.io.File(ckpt).listFiles().filter(_.getName.startsWith("cc_"))
    assert(runDirs.nonEmpty && runDirs.exists(d => new java.io.File(d, "edges").exists()))
  }
}
