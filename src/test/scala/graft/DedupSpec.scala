package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different text about spark query engines and distributed joins"),
    (4L, "THE  quick   brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1 modulo ws/case
    (5L, "another unrelated document mentioning parquet files and shuffle partitions")
  ).toDF("doc_id", "text")

  test("exact dedup groups whitespace/case-normalized copies") {
    val groups = Dedup.duplicateGroups(docs, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n_copies") == 2)
    assert(groups.head.getAs[Long]("doc_id") == 1L)
  }

  test("minhash LSH finds the planted near-duplicate pair and not unrelated pairs") {
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text", minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((3L, 5L)))
  }

  test("empty documents: identical (J=1) rather than 0/0-null") {
    import spark.implicits._
    val empties = Seq((1L, ""), (2L, "   "), (3L, "real content here")).toDF("doc_id", "text")
    val j = graft.operators.Dedup.ngramJaccard(empties,
      Seq((1L, 2L)).toDF("id_a", "id_b"), "doc_id", "text")
      .head().getDouble(2)
    assert(j == 1.0)
  }

  test("exact ngram jaccard verifies candidates") {
    val cand = Seq((1L, 2L), (3L, 5L)).toDF("id_a", "id_b")
    val verified = Dedup.ngramJaccard(docs, cand, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(verified((1L, 2L)) > 0.5)
    assert(verified((3L, 5L)) == 0.0)
  }

  test("simhash near-dup: identical docs hamming 0, near-dups small hamming") {
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(4L)) // same tokens -> same simhash
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) <= 8)
    val pairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("embedding near-dup finds cosine-close vectors via hyperplane LSH") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.1f)), // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("id", "vec")
    val pairs = Dedup.embeddingNearDuplicates(vecs, "id", "vec",
      minCosine = 0.95, nPlanes = 4, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("AND-OR banding recovers moderate-cosine pairs a single band misses") {
    // 200 random unit-ish vectors (fixed seed) + 5 planted pairs at
    // cosine ~0.9: with 8 sign bits a single band's per-pair collision
    // probability at theta=26 degrees is ~0.28, so one band misses
    // most planted pairs; OR-ing 16 bands lifts per-pair recall to
    // ~0.995 — and with this fixed data+seed, to all 5.
    val rng = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(rng.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    def jitter(v: Array[Float]): Array[Float] = {
      val w = unit()
      v.zip(w).map { case (a, b) => (a * 0.95f + b * 0.31f) } // cos ~0.95
    }
    val base = (1 to 200).map(i => (i.toLong, unit()))
    val planted = (1 to 5).map { i =>
      val (id, v) = base(i * 10)
      (9000L + i, jitter(v))
    }
    val vecs = (base ++ planted).toDF("vec_id", "embedding")
    def found(bands: Int): Set[(Long, Long)] =
      Dedup.embeddingNearDuplicates(vecs, "vec_id", "embedding",
        minCosine = 0.85, nPlanes = 8, dim = 16, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = found(1)
    val sixteen = found(16)
    val expected = (1 to 5).map(i => ((i * 10 + 1).toLong, 9000L + i)).toSet
    assert(one.subsetOf(sixteen), "adding bands can only add candidates")
    assert((expected -- sixteen).isEmpty,
      s"16 bands must find all planted pairs, missed ${expected -- sixteen}")
    assert(one.size < sixteen.size, "a single band should miss some planted pairs here")
  }

  test("connected components: transitive chains collapse to min label") {
    // chain 1-2-3, pair 7-9, singleton edge 4-4 excluded by construction
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(7L) == 7L && comps(9L) == 7L)
  }

  test("cross-corpus decontamination: planted contamination found, sides stay distinct") {
    val train = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely unrelated text about cooking pasta with garlic and olive oil"),
      (4L, "another unique document describing mountain hiking trails in the alps")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
      (3L, "totally different content on quantum computing and qubit decoherence")
    ).toDF("doc_id", "text")
    val hits = Dedup.crossCorpusNearDuplicates(train, eval_, "doc_id", "text",
        minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits == Seq((0L, 1L))) // the planted contamination, nothing else
    // id_a always from the left corpus, id_b from the right — and the
    // train-side near-dups (none here) never pair with themselves
    val self = Dedup.crossCorpusNearDuplicates(train, train, "doc_id", "text",
      minJaccard = 0.99)
    assert(self.count() == 3) // identity pairs: each doc matches itself cross-side
  }

  test("connected components: driver union-find == iterative propagation on random graphs") {
    val rnd = new scala.util.Random(11)
    // 300 random edges over 120 nodes: many multi-node components,
    // rings, chains — every structural shape both paths must agree on
    val pairs = (1 to 300)
      .map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    def comps(maxDriver: Long): Map[Long, Long] =
      Dedup.connectedComponents(pairs, maxDriverEdges = maxDriver, maxIter = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(maxDriver = 2000000L) === comps(maxDriver = 0L))
  }

  test("dedupCorpus: transitive near-dup classes, min-id survives") {
    // 1≈2 and 2≈6 (transitively one class even if 1~6 is weaker)
    val corpus = docs.unionByName(Seq(
      (6L, "the quick brown fox jumps over the lazy dog near the river bank sometimes")
    ).toDF("doc_id", "text"))
    val out = Dedup.dedupCorpus(corpus, "doc_id", "text", minJaccard = 0.35)
    val byId = out.collect()
      .map(r => r.getLong(0) -> (Option(r.get(r.fieldIndex("dup_class"))), r.getBoolean(r.fieldIndex("keep"))))
      .toMap
    // 1, 2, 4, 6 form one duplicate class with representative 1
    assert(byId(1L)._1.contains(1L) && byId(1L)._2)
    assert(byId(2L)._1.contains(1L) && !byId(2L)._2)
    assert(byId(4L)._1.contains(1L) && !byId(4L)._2)
    assert(byId(6L)._1.contains(1L) && !byId(6L)._2)
    // unrelated docs stay unique and kept
    assert(byId(3L)._1.isEmpty && byId(3L)._2)
    assert(byId(5L)._1.isEmpty && byId(5L)._2)
  }

  test("semanticDedupCorpus keeps one representative per embedding class") {
    import spark.implicits._
    // two planted duplicate groups (identical vectors collide in EVERY
    // band, so banding cannot miss them) + two unique directions
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),   // dup of 1
      (5L, Array(1.0f, 0.0f, 0.0f)),   // dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f)),   // dup of 3
      (6L, Array(0.0f, 0.0f, -1.0f)),
      (7L, Array(-0.5f, 0.7f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupCorpus(vecs, "vec_id", "embedding",
        minCosine = 0.99, nPlanes = 4, dim = 3, bands = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(r.fieldIndex("dup_class"))), r.getBoolean(r.fieldIndex("keep")))))
      .toMap
    assert(out(1L) == ((Some(1L), true)))
    assert(out(2L) == ((Some(1L), false)))
    assert(out(5L) == ((Some(1L), false)))
    assert(out(3L) == ((Some(3L), true)))
    assert(out(4L) == ((Some(3L), false)))
    assert(out(6L) == ((None, true)))
    assert(out(7L) == ((None, true)))
    // banded result equals the brute-force (nPlanes = 0) ground truth
    val brute = Dedup.semanticDedupCorpus(vecs, "vec_id", "embedding",
        minCosine = 0.99, nPlanes = 0, dim = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(r.fieldIndex("dup_class"))), r.getBoolean(r.fieldIndex("keep")))))
      .toMap
    assert(brute == out)
  }

  test("rolling-hash fingerprint is order-sensitive, exact fingerprint is ws-insensitive") {
    val fp = docs.select(col("doc_id"),
      TextFunctions.rollingHashFingerprint(col("text")).as("rh"),
      TextFunctions.exactFingerprint(col("text")).as("ef"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(fp(1L)._2 == fp(4L)._2) // exact fingerprint normalizes
    assert(fp(1L)._1 == fp(4L)._1) // token stream identical
    assert(fp(1L)._1 != fp(2L)._1)
  }

  test("duplicatedSpans finds a planted cross-document duplicated span and merges windows") {
    // doc 2 copies tokens 5..14 of doc 1 (a 10-token span) into the
    // middle of otherwise-unique text; w=5 windows inside that span
    // duplicate, nothing else does
    val span = "wolves hunt elk across frozen northern tundra under pale moonlight"
    val d = Seq(
      (1L, s"unique opening words here $span and a unique ending closes one"),
      (2L, s"totally different prefix text leads into $span then diverges again after"),
      (3L, "a control document sharing no five token windows with any peer")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(d, "doc_id", "text",
        windowTokens = 5, minCount = 2, keepFirst = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1 holds the corpus-first occurrence of every duplicated
    // window (smaller id) → only doc 2's copy is flagged
    assert(spans.length == 1, s"got ${spans.toSeq}")
    val (id, b, e, nw) = spans.head
    // span tokens in doc 2: positions 6..15 (10 tokens) → windows 6..11
    // merged into one span [6, 16)
    assert(id == 2L && b == 6L && e == 16L && nw == 6L, s"got ${spans.toSeq}")

    // keepFirst=false flags BOTH copies
    val both = Dedup.duplicatedSpans(d, "doc_id", "text",
        windowTokens = 5, minCount = 2, keepFirst = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(both.length == 2 && both.map(_._1).toSeq == Seq(1L, 2L), s"got ${both.toSeq}")
    // doc 1's copy sits at positions 4..13 → windows 4..9 → span [4, 14)
    assert(both.head == ((1L, 4L, 14L)), s"got ${both.toSeq}")

    // coverage stats: doc 2 has 10 of its 20 tokens duplicated, others 0
    val stats = Dedup.substringDupStats(d, "doc_id", "text",
        windowTokens = 5, minCount = 2, keepFirst = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(stats(2L)._2 == 10L, s"got $stats")
    assert(stats(1L)._2 == 0L && stats(3L)._2 == 0L, s"got $stats")
    assert(math.abs(stats(2L)._3 - 10.0 / stats(2L)._1) < 1e-6)
  }

  test("crossCorpusDuplicatedSpans flags only reference-verbatim ranges") {
    val quote = "to be or not to be that is the question"
    val train = Seq(
      (1L, s"an essay begins here $quote and then continues its own argument"),
      (2L, "a fully original composition free of any borrowed reference material")
    ).toDF("doc_id", "text")
    val ref = Seq(
      (100L, s"famous soliloquy $quote end of extract"),
      // reference-internal duplication must not flag train text
      (101L, s"$quote $quote")
    ).toDF("doc_id", "text")
    val spans = Dedup.crossCorpusDuplicatedSpans(train, ref, "doc_id", "text",
        windowTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: quote occupies tokens 4..13 → windows 4..9 → span [4, 14)
    assert(spans.toSeq == Seq((1L, 4L, 14L, 6L)), s"got ${spans.toSeq}")
  }

  test("duplicatedSpans: within-document repetition counts toward minCount") {
    // the same 5-token run appears twice INSIDE one document — the
    // Lee et al. criterion counts occurrences, not distinct documents
    val loop = "repeat these five exact tokens"
    val d = Seq(
      (1L, s"$loop and some middle filler then $loop to close out"),
      (2L, "nothing here repeats any five token window at all today")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(d, "doc_id", "text",
        windowTokens = 5, minCount = 2, keepFirst = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // first occurrence (pos 0) survives; the second copy at pos 10
    // flags as one window → span [10, 15)
    assert(spans.toSeq == Seq((1L, 10L, 15L, 1L)), s"got ${spans.toSeq}")
  }

  test("containment: a fragment quoted inside a larger doc scores ~1 one way, low the other") {
    val frag = "alpha beta gamma delta epsilon zeta eta theta"
    val container = s"intro words before the quote $frag and then a very long tail " +
      "of completely unrelated content that keeps flowing with many more " +
      "distinct tokens diluting any union based similarity measure badly"
    val d = Seq((1L, frag), (2L, container),
      (3L, "unrelated third document about something else entirely here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(d, "doc_id", "text", n = 5,
        minContainment = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
    // frag's grams all appear in container → containment(1 in 2) = 1.0;
    // container in frag is far below 0.5 (its tail has no match);
    // Jaccard would have missed this pair at any usual threshold
    assert(pairs == Seq((1L, 2L, 1.0)), s"got $pairs")
    val j = Dedup.ngramJaccardFromSets(
      d.select(col("doc_id").as("id"),
        Dedup.shingleHashSet(col("text"), 5).as("sh")),
      Seq((1L, 2L)).toDF("id_a", "id_b"))
      .collect().head.getDouble(2)
    assert(j < 0.5, s"the point of containment: resemblance is diluted, J=$j")
  }

  test("keepBest keeps the highest-scoring class member; uniques untouched") {
    val d = Seq(
      (1L, Some(10L), 100L, false), // class 10: id 2 has the best score
      (2L, Some(10L), 300L, false),
      (3L, Some(10L), 300L, false), // tie with 2 → lower id 2 wins
      (7L, None: Option[Long], 5L, true) // unique
    ).toDF("doc_id", "dup_class", "score", "keep")
    val out = Dedup.keepBest(d, "doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 7L -> true), s"got $out")
  }

  test("dHash closed forms: gradients, scale invariance, single-cell flip, non-images") {
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    // 18×16 → exact 2×2 blocks per 9×8 grid cell; luma strictly
    // increases with x → every right cell brighter → all 64 bits set
    val a = M.renderPng(18, 16, (x, _) => gray(x * 10))
    assert(M.dhash64(a) == -1L, "increasing gradient = all ones")
    // the same pixel FUNCTION at 2× resolution block-averages to the
    // same grid ordering → identical hash (resize invariance, exact)
    val a2 = M.renderPng(36, 32, (x, _) => gray(x * 5))
    assert(M.dhash64(a2) == -1L, "2x resize of the gradient hashes identically")
    // decreasing gradient → no right cell ever brighter → 0
    val b = M.renderPng(18, 16, (x, _) => gray((17 - x) * 10))
    assert(M.dhash64(b) == 0L, "decreasing gradient = all zeros")
    // brighten ONLY cell (0,0): flips exactly bit 0 (200 > cell(1,0))
    val c = M.renderPng(18, 16,
      (x, y) => gray(if (y < 2 && x < 2) 200 else x * 10))
    val hc = M.dhash64(c).longValue()
    assert(java.lang.Long.bitCount(-1L ^ hc) == 1 && (hc & 1L) == 0L,
      s"one-cell flip = Hamming 1 at bit 0, got ${java.lang.Long.toBinaryString(hc)}")
    // non-decodable bytes → null, the degrade-per-row rule
    assert(M.dhash64(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)) == null)
    assert(M.dhash64(null) == null)
  }

  test("image near-dup: JPEG re-encode and resize twins pair up; unrelated images don't") {
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    // block-structured content is robust to JPEG loss at cell grain
    def halves(x: Int, y: Int): Int = gray(if (x < 16) 40 else 200)
    def checker(x: Int, y: Int): Int =
      gray(if (((x / 8) + (y / 8)) % 2 == 0) 30 else 220)
    val imgs = Seq(
      (1L, M.renderPng(32, 32, halves)),
      (2L, M.renderJpeg(32, 32, halves)),          // lossy re-encode of 1
      (3L, M.renderPng(64, 64, (x, y) => halves(x / 2, y / 2))), // 2x resize of 1
      (4L, M.renderPng(32, 32, checker)),          // unrelated
      (5L, "not an image at all".getBytes("UTF-8")), // non-decodable
      (6L, M.renderImage("gif", 32, 32, halves)),  // GIF re-encode of 1
      (7L, M.renderImage("bmp", 32, 32, halves))   // BMP re-encode of 1
    ).toDF("img_id", "content")
    val jpegHamming = java.lang.Long.bitCount(
      M.dhash64(imgs.filter(col("img_id") === 1).head().getAs[Array[Byte]](1)).longValue() ^
      M.dhash64(imgs.filter(col("img_id") === 2).head().getAs[Array[Byte]](1)).longValue())
    info(s"png-vs-jpeg twin hamming = $jpegHamming")
    val pairs = Dedup.imageNearDuplicates(imgs, "img_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)), s"jpeg twin must pair: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) == 0,
      s"resize twin is Hamming 0: $pairs")
    assert(pairs.contains((2L, 3L)), s"twins are transitive candidates: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated image must not pair: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L),
      s"non-decodable row is dropped: $pairs")
    // GIF/BMP re-encodes are lossless for 2-tone content: Hamming 0
    assert(pairs.get((1L, 6L)).contains(0), s"gif twin is exact: $pairs")
    assert(pairs.get((1L, 7L)).contains(0), s"bmp twin is exact: $pairs")
    // end-to-end corpus form: {1,2,3,6,7} one class keeping 1 (the
    // cross-FORMAT class — png/jpeg/gif/bmp); 4 unique; 5
    // non-decodable → unique
    val corpus = Dedup.imageDedupCorpus(imgs, "img_id", "content")
      .collect().map(r => r.getAs[Long]("img_id") ->
        ((Option(r.getAs[java.lang.Long]("dup_class")), r.getAs[Boolean]("keep")))).toMap
    assert(corpus(1L) == ((Some(1L), true)))
    assert(corpus(2L) == ((Some(1L), false)))
    assert(corpus(3L) == ((Some(1L), false)))
    assert(corpus(6L) == ((Some(1L), false)))
    assert(corpus(7L) == ((Some(1L), false)))
    assert(corpus(4L) == ((None, true)))
    assert(corpus(5L) == ((None, true)))
  }

  test("audio hash closed forms: rising/falling envelopes, gain invariance, resample robustness") {
    val M = graft.operators.Multimodal
    def amSquare(n: Int, gain: Int, rising: Boolean): Array[Short] =
      Array.tabulate[Short](n) { i =>
        val a = (if (rising) 100 + i else 100 + n - 1 - i) * gain
        (if (i % 2 == 0) a else -a).toShort
      }
    val up = M.renderWav(8000, 1, amSquare(900, 1, rising = true))
    assert(M.audioHash64(up) == -1L, "rising envelope = all comparisons up")
    assert(M.audioHash64(M.renderWav(8000, 1, amSquare(900, 3, rising = true))) == -1L,
      "integer gain never moves a bit")
    assert(M.audioHash64(M.renderWav(8000, 1, amSquare(900, 1, rising = false))) == 0L,
      "falling envelope = all comparisons down")
    assert(M.audioHash64("junk".getBytes("UTF-8")) == null)
    assert(M.audioHash64(null) == null)
    // sample-repeat 2x resample of the rising wave: the fixed
    // duration-relative grid reads the SAME source sample at every
    // grid point (floor(floor(2x)/2) = floor(x)), so the hash is
    // bit-identical — resampled twins pair at the DEFAULT gate
    val base = amSquare(900, 1, rising = true)
    val resampled = Array.tabulate[Short](1800)(i => base(i / 2))
    val rh = M.audioHash64(M.renderWav(16000, 1, resampled)).longValue()
    val d = java.lang.Long.bitCount(-1L ^ rh)
    assert(d == 0, s"sample-repeat resample must hash identically: $d")
    // a non-integer 3/2 ratio only wobbles at grid boundaries — well
    // inside the default maxHamming = 6 gate
    val r32 = Array.tabulate[Short](1350)(i => base(i * 2 / 3))
    val d32 = java.lang.Long.bitCount(
      -1L ^ M.audioHash64(M.renderWav(12000, 1, r32)).longValue())
    assert(d32 <= 6, s"rational resample must stay inside the default gate: $d32")
    // stereo fold: duplicating the mono stream into two channels is
    // the same envelope — identical hash
    val stereo = Array.tabulate[Short](1800)(i => base(i / 2)) // L=R interleave
    assert(M.audioHash64(M.renderWav(8000, 2, stereo)) == -1L)
    // unrelated noise is far from the monotone envelopes
    val rnd = new scala.util.Random(13)
    val noise = Array.fill[Short](900)((rnd.nextInt(4000) - 2000).toShort)
    val nh = M.audioHash64(M.renderWav(8000, 1, noise)).longValue()
    assert(java.lang.Long.bitCount(-1L ^ nh) > 6 &&
      java.lang.Long.bitCount(nh) > 6, "noise sits far from both extremes")
    // corpus form: {rising, gain-twin, RESAMPLED twin} one class
    // keeping the lowest id — the resampled twin pairs at DEFAULT
    // parameters; falling + noise + junk are unique
    import spark.implicits._
    val corpus = Seq(
      (1L, up),
      (2L, M.renderWav(8000, 1, amSquare(900, 2, rising = true))),
      (3L, M.renderWav(8000, 1, amSquare(900, 1, rising = false))),
      (4L, M.renderWav(8000, 1, noise)),
      (5L, "junk".getBytes("UTF-8")),
      (6L, M.renderWav(16000, 1, resampled))
    ).toDF("clip_id", "content")
    val classes = Dedup.audioDedupCorpus(corpus, "clip_id", "content")
      .collect().map(r => r.getAs[Long]("clip_id") ->
        ((Option(r.getAs[java.lang.Long]("dup_class")), r.getAs[Boolean]("keep")))).toMap
    assert(classes(1L) == ((Some(1L), true)))
    assert(classes(2L) == ((Some(1L), false)))
    assert(classes(6L) == ((Some(1L), false)),
      "resampled twin must join the class at default parameters")
    assert(classes(3L) == ((None, true)) && classes(4L) == ((None, true)))
    assert(classes(5L) == ((None, true)), "non-decodable rows are unique, never lost")
  }

  test("mp3 gain-envelope hash: tag/bitrate twins identical, near-dup pairs at defaults") {
    val M = graft.operators.Multimodal
    def mp3(gains: Seq[Int], id3: Int = 0, brIdx: Int = 9): Array[Byte] =
      M.syntheticMp3(verId = 3, srIdx = 2, channels = 1,
        frames = gains.grouped(2).map(g => (brIdx, g.toSeq)).toSeq,
        id3Bytes = id3)
    // a varied (non-monotone) loudness envelope over 40 granules
    val env = (0 until 40).map(i => 80 + ((i * 37) % 90))
    val base = mp3(env)
    val tagged = mp3(env, id3 = 128) // re-tagged: same frames
    val rebr = mp3(env, brIdx = 11) // re-encoded bitrate, same envelope
    val h = M.audioHash64(base).longValue()
    assert(M.audioHash64(tagged).longValue() == h,
      "an ID3 tag must not move the gain-envelope hash")
    assert(M.audioHash64(rebr).longValue() == h,
      "same envelope at another bitrate must hash identically")
    // constant gains: rows 1-7 (differences) are all zero, and row 0's
    // windows tie except the LAST (4096 = 9·455 + 1, so window 8 is one
    // point longer -> one deterministic length-wobble bit at row 0 t=8)
    val flat = mp3(Seq.fill(40)(100))
    assert(M.audioHash64(flat).longValue() == 128L)
    assert(java.lang.Long.bitCount(h ^ 128L) > 12,
      s"varied envelope must sit far from the flat hash: ${java.lang.Long.bitCount(h ^ 128L)}")
    // corpus: the three twins form one class at DEFAULT parameters;
    // flat + junk stay unique
    import spark.implicits._
    val corpus = Seq(
      (1L, base), (2L, tagged), (3L, rebr), (4L, flat),
      (5L, "junk".getBytes("UTF-8"))
    ).toDF("clip_id", "content")
    val classes = Dedup.audioDedupCorpus(corpus, "clip_id", "content")
      .collect().map(r => r.getAs[Long]("clip_id") ->
        ((Option(r.getAs[java.lang.Long]("dup_class")), r.getAs[Boolean]("keep")))).toMap
    assert(classes(1L) == ((Some(1L), true)))
    assert(classes(2L) == ((Some(1L), false)))
    assert(classes(3L) == ((Some(1L), false)))
    assert(classes(4L) == ((None, true)))
    assert(classes(5L) == ((None, true)))
  }

  test("video near-dup: resized twin covers fully, clip-in-longer-cut is asymmetric, unrelated stays out") {
    val M = graft.operators.Multimodal
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    // one distinct block pattern per frame index (vertical split walks
    // right); unrelated frames are 4px block noise — essentially random
    // 64-bit hashes, pairwise far from everything (a horizontal split
    // would be degenerate: constant rows dHash to 0)
    def pat(i: Int)(x: Int, y: Int): Int = gray(if (x < 8 + 4 * i) 30 else 220)
    def unrel(i: Int)(x: Int, y: Int): Int =
      gray((((x / 4) * 73856093) ^ ((y / 4) * 19349663) ^ ((i + 1) * 83492791)) & 0xff)
    def avi(fs: Seq[Array[Byte]]): Array[Byte] = M.syntheticMjpegAvi(fs)
    val base = (0 until 4).map(i => M.renderJpeg(32, 32, pat(i)))
    val twin2x = (0 until 4).map(i =>
      M.renderJpeg(64, 64, (x, y) => pat(i)(x / 2, y / 2))) // resized re-encode
    val vids = Seq(
      (1L, avi(base)),
      (2L, avi(twin2x)),
      (3L, avi(base :+ M.renderJpeg(32, 32, unrel(0)))), // the longer cut
      (4L, avi((1 to 4).map(i => M.renderJpeg(32, 32, unrel(i)))))
    ).toDF("video_id", "content")
    val pairs = graft.operators.Dedup.videoNearDuplicates(vids, "video_id",
        "content", maxFrameHamming = 6, minFrameCoverage = 0.9)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("frame_coverage")).toMap
    assert(pairs.get(("1", "2")).contains(1.0), s"resized twin covers fully: $pairs")
    assert(pairs.get(("2", "1")).contains(1.0), s"symmetric for equal-length twins: $pairs")
    assert(pairs.get(("1", "3")).contains(1.0),
      s"the clip is fully contained in the longer cut: $pairs")
    assert(!pairs.contains(("3", "1")),
      s"the longer cut's own coverage (4/5) must miss the 0.9 bar: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == "4" || p._2 == "4"),
      s"unrelated video must not pair: $pairs")
  }

  test("video near-dup crosses containers: an MP4 re-mux of the AVI pairs at full coverage") {
    val M = graft.operators.Multimodal
    def pat(i: Int)(x: Int, y: Int): Int = {
      val v = if (x < 8 + 4 * i) 30 else 220
      (v << 16) | (v << 8) | v
    }
    val frames = (0 until 4).map(i => M.renderJpeg(32, 32, pat(i)))
    val vids = Seq(
      (1L, M.syntheticMjpegAvi(frames)),
      (2L, M.syntheticMjpegMp4(frames)) // same samples, other container
    ).toDF("video_id", "content")
    val pairs = graft.operators.Dedup.videoNearDuplicates(vids, "video_id",
        "content", maxFrameHamming = 6, minFrameCoverage = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("frame_coverage")).toMap
    assert(pairs.get(("1", "2")).contains(1.0) &&
      pairs.get(("2", "1")).contains(1.0),
      s"identical samples re-muxed must cover fully both ways: $pairs")
  }

  test("video EXACT dedup: avc1 re-mux pairs at 1.0, clip containment is asymmetric, a re-encoded keyframe breaks the pair") {
    val M = graft.operators.Multimodal
    // opaque "H.264" sample payloads — the keyframe-hash path is
    // codec-FREE (it hashes stss byte ranges), so deterministic bytes
    // stand in for an avc1 bitstream no JDK decoder could touch
    def sample(i: Int): Array[Byte] =
      Array.tabulate[Byte](60 + i)(j => ((i * 31 + j * 7 + 3) & 0xff).toByte)
    val samples = (0 until 6).map(sample)
    // same bitstream, three different muxes: chunk layout (1 chunk vs
    // 4+2 partial tail), timescale, frame duration — everything a
    // remux/re-tag actually changes
    val muxA = M.syntheticMjpegMp4(samples, syncEvery = 2, timescale = 1000,
      frameDurationTicks = 40, codec = "avc1")
    val muxB = M.syntheticMjpegMp4(samples, syncEvery = 2, timescale = 600,
      frameDurationTicks = 25, codec = "avc1", samplesPerChunk = 4)
    // "re-encode": one byte of one SYNC sample (0-based 2) differs
    val reenc = samples.updated(2, {
      val b = sample(2).clone(); b(5) = (b(5) ^ 1).toByte; b
    })
    val muxC = M.syntheticMjpegMp4(reenc, syncEvery = 2, codec = "avc1")
    // the first 4 samples as their own clip (sync keyframes 0, 2)
    val clip = M.syntheticMjpegMp4(samples.take(4), syncEvery = 2,
      timescale = 90000, codec = "avc1", samplesPerChunk = 1)
    val vids = Seq((1L, muxA), (2L, muxB), (3L, muxC), (4L, clip),
      (5L, "not a video".getBytes("UTF-8"))).toDF("video_id", "content")
    val pairs = Dedup.videoExactDuplicates(vids, "video_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("frame_coverage")).toMap
    assert(pairs.get((1L, 2L)).contains(1.0) && pairs.get((2L, 1L)).contains(1.0),
      s"re-muxed avc1 twins must pair at full coverage both ways: $pairs")
    assert(pairs.get((4L, 1L)).contains(1.0) && pairs.get((4L, 2L)).contains(1.0),
      s"the clip's keyframes all appear in the full cuts: $pairs")
    assert(!pairs.contains((1L, 4L)),
      s"the full cut (3 keyframes, 2 matched) must miss the 1.0 bar: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      s"a re-encoded sync sample must break exact matching (2/3 < 1.0): $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L),
      s"non-video bytes must drop out of the signature explode: $pairs")
  }

  test("video EXACT dedup crosses containers: MJPEG AVI and its MP4 re-mux are byte-identical keyframes") {
    val M = graft.operators.Multimodal
    def pat(i: Int)(x: Int, y: Int): Int = {
      val v = if (x < 8 + 4 * i) 30 else 220
      (v << 16) | (v << 8) | v
    }
    val frames = (0 until 4).map(i => M.renderJpeg(32, 32, pat(i)))
    val vids = Seq(
      (1L, M.syntheticMjpegAvi(frames)),
      (2L, M.syntheticMjpegMp4(frames)) // same JPEG bytes, other container
    ).toDF("video_id", "content")
    val pairs = Dedup.videoExactDuplicates(vids, "video_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("frame_coverage")).toMap
    assert(pairs.get((1L, 2L)).contains(1.0) && pairs.get((2L, 1L)).contains(1.0),
      s"payload-preserving container swap must pair exactly: $pairs")
  }

  test("exactDedupCorpus + dedupReport: class/keep convention, per-group numbers, all-unique group") {
    import spark.implicits._
    val docs = Seq(
      (1L, "g1", "same text"), (2L, "g1", "same text"),
      (3L, "g1", "same  text"), // whitespace-normalized: SAME class
      (4L, "g1", "other"),
      (5L, "g2", "same text"), // the class spans groups
      (6L, "g2", "solo"),
      (7L, "g2", null) // null text: not classifiable, stays unique
    ).toDF("doc_id", "src", "text")
    val deduped = Dedup.exactDedupCorpus(docs, "doc_id", "text")
    val byId = deduped.collect().map(r => r.getAs[Long]("doc_id") ->
      ((Option(r.getAs[Any]("dup_class")), r.getAs[Boolean]("keep")))).toMap
    assert(byId(1L) == ((Some(1L), true)) && byId(2L) == ((Some(1L), false)))
    assert(byId(3L) == ((Some(1L), false)), "normalization folds whitespace")
    assert(byId(4L) == ((None, true)) && byId(6L) == ((None, true)))
    assert(byId(5L) == ((Some(1L), false)), "classes cross group lines")
    assert(byId(7L) == ((None, true)), "null text is unique, never a class")
    val rep = Dedup.dedupReport(deduped, "src").collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_in_dup_classes"), r.getAs[Long]("n_dropped"),
        r.getAs[Double]("pct_redundant"), r.getAs[Long]("n_dup_classes"),
        r.getAs[Long]("max_class_rows")))).toMap
    // keeper 1 lives in g1, so g1 drops only members 2 and 3
    assert(rep("g1") == ((4L, 3L, 2L, 0.5, 1L, 3L)), s"${rep("g1")}")
    assert(rep("g2") == ((3L, 1L, 1L, 0.3333, 1L, 1L)), s"${rep("g2")}")
    // a group with no duplicates at all reports zeros, not nulls
    val rep2 = Dedup.dedupReport(
      Dedup.exactDedupCorpus(Seq((1L, "g", "a"), (2L, "g", "b"))
        .toDF("doc_id", "src", "text"), "doc_id", "text"), "src")
      .collect().head
    assert(rep2.getAs[Long]("n_dup_classes") == 0L &&
      rep2.getAs[Long]("max_class_rows") == 0L &&
      rep2.getAs[Double]("pct_redundant") == 0.0)
  }

  test("videoDedupCorpus: re-mux twins share a class with one keeper; re-encodes and junk stay unique") {
    val M = graft.operators.Multimodal
    def sample(i: Int): Array[Byte] =
      Array.tabulate[Byte](48 + i)(j => ((i * 17 + j * 11 + 5) & 0xff).toByte)
    val samples = (0 until 4).map(sample)
    val reenc = samples.updated(0, {
      val b = sample(0).clone(); b(0) = (b(0) ^ 1).toByte; b
    })
    val vids = Seq(
      (1L, M.syntheticMjpegMp4(samples, codec = "avc1")),
      (2L, M.syntheticMjpegMp4(samples, codec = "avc1", timescale = 600,
        samplesPerChunk = 3)),
      (3L, M.syntheticMjpegMp4(reenc, codec = "avc1")),
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("video_id", "content")
    val out = Dedup.videoDedupCorpus(vids, "video_id", "content")
      .collect().map(r => r.getAs[Long]("video_id") ->
        ((Option(r.getAs[Any]("dup_class")), r.getAs[Boolean]("keep")))).toMap
    assert(out(1L) == ((Some(1L), true)), s"smallest id keeps: $out")
    assert(out(2L) == ((Some(1L), false)), s"the re-mux twin is dropped: $out")
    assert(out(3L) == ((None, true)), s"a re-encode is NOT an exact dup: $out")
    assert(out(4L) == ((None, true)), s"undecodable rows stay unique: $out")
  }

  test("cutSpans: byte-exact surgery boundaries — edges, separators, unicode, clamping") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s"),                       // first occurrence: untouched
      (2L, "p q r tail1\ttail2"),            // span at doc START, tab kept
      (3L, "head1  head2 p q r"),            // span at doc END, 2 spaces kept
      (4L, "aé x p q r aé x p q r final") // NBSP inside token; two flagged windows
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text",
      windowTokens = 3, minCount = 2, keepFirst = true)
    val out = Dedup.cutSpans(docs, spans, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_cut")).toMap
    assert(out(1L) == "p q r s", "the kept first occurrence must be byte-identical")
    assert(out(2L) == "tail1\ttail2",
      s"leading cut drops the span and ONLY the span; tab separator survives: '${out(2L)}'")
    assert(out(3L) == "head1  head2",
      s"trailing cut; original double space between kept neighbors survives: '${out(3L)}'")
    // d4 tokens: [aé x, p, q, r, aé x, p, q, r, final] —
    // NBSP (U+00A0) is NOT \\s, so 'aé x' is ONE token. Flagged
    // windows: pos 1 and 5 ([p q r] duplicates d1) and pos 4 (the
    // leading window repeats at pos 4 within-doc) — positions 1,4,5
    // sit within windowTokens of each other, so they MERGE into one
    // span [1,8): kept tokens 0 and 8, one space across the cut,
    // the NBSP token byte-exact.
    assert(out(4L) == "aé x final", s"got '${out(4L)}'")
    // direct kernel probes: clamping, whole-doc cut, null spans
    val k = graft.functions.ExprKernels
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    def spansOf(ps: (Long, Long)*) =
      new GenericArrayData(ps.map(p => InternalRow(p._1, p._2)).toArray[Any])
    assert(k.cutTokenSpans(UTF8String.fromString("a b c"),
      spansOf((-5L, 99L))).toString == "", "out-of-range spans clamp; whole-doc cut is empty")
    assert(k.cutTokenSpans(UTF8String.fromString("  padded text  "),
      spansOf((0L, 1L))).toString == "text",
      "trim-region bytes drop once any cut happens")
    assert(k.cutTokenSpans(UTF8String.fromString("a b c d"),
      spansOf((0L, 1L), (3L, 4L), (0L, 1L))).toString == "b c",
      "overlapping/duplicate spans are tolerated")
    assert(k.cutTokenSpans(UTF8String.fromString("keep all"), null).toString
      == "keep all", "null spans pass the text through unchanged")
  }

  test("spanSurgeryReport: per-group cut accounting replays the span arithmetic") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, "p q r s"),
      ("a", 2L, "p q r tail1\ttail2"),
      ("b", 3L, "head1  head2 p q r"),
      ("b", 4L, "clean words only here")
    ).toDF("grp", "doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text",
      windowTokens = 3, minCount = 2, keepFirst = true)
    val cut = Dedup.cutSpans(docs, spans, "doc_id", "text")
    val rep = Dedup.spanSurgeryReport(cut, spans, "doc_id", "grp", "text")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    // group a: d1 kept byte-identical, d2 loses "p q r " (chars 17→11)
    val a = rep("a")
    assert(a.getAs[Long]("n_docs") == 2 && a.getAs[Long]("n_docs_cut") == 1)
    assert(a.getAs[Long]("n_spans") == 1 && a.getAs[Long]("tokens_cut") == 3)
    assert(a.getAs[Long]("chars_in") ==
      "p q r s".length + "p q r tail1\ttail2".length)
    assert(a.getAs[Long]("chars_cut") ==
      "p q r tail1\ttail2".length - "tail1\ttail2".length)
    assert(a.getAs[Double]("pct_chars_cut") ==
      BigDecimal(6.0 / (7 + 17)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // group b: d3 cut at the end, d4 clean
    val bR = rep("b")
    assert(bR.getAs[Long]("n_docs") == 2 && bR.getAs[Long]("n_docs_cut") == 1)
    assert(bR.getAs[Long]("n_spans") == 1 && bR.getAs[Long]("tokens_cut") == 3)
    assert(bR.getAs[Long]("chars_cut") ==
      "head1  head2 p q r".length - "head1  head2".length)
    // a group with no cuts at all reports zeros, not nulls
    val clean = Seq(("c", 9L, "nothing doubled")).toDF("grp", "doc_id", "text")
    val cleanSpans = Dedup.duplicatedSpans(clean, "doc_id", "text", 3, 2, true)
    val cleanRep = Dedup.spanSurgeryReport(
      Dedup.cutSpans(clean, cleanSpans, "doc_id", "text"),
      cleanSpans, "doc_id", "grp", "text").head()
    assert(cleanRep.getAs[Long]("n_spans") == 0 &&
      cleanRep.getAs[Long]("chars_cut") == 0 &&
      cleanRep.getAs[Double]("pct_chars_cut") == 0.0)
  }

  test("mediaDedupCorpus: modality dispatch, per-kind classes, report breaks down by kind") {
    import spark.implicits._
    val M = graft.operators.Multimodal
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // modality classifier probes across the format zoo
    assert(M.mediaModality(M.renderPng(4, 4, (_, _) => 1)) == "image")
    assert(M.mediaModality(M.syntheticAvif(8, 8, brand = "heic")) == "image")
    assert(M.mediaModality(M.syntheticJxl(8, 8)) == "image")
    assert(M.mediaModality(M.renderWav(8000, 1,
      Array.tabulate[Short](8)(_.toShort))) == "audio")
    assert(M.mediaModality(M.renderAiff(8000, 1,
      Array.tabulate[Short](8)(_.toShort))) == "audio")
    assert(M.mediaModality(M.syntheticFlac(44100, 2, 16, 100L)) == "audio")
    assert(M.mediaModality(M.syntheticM4a(1, 8000, 80L)) == "audio")
    assert(M.mediaModality(M.syntheticMp3(3, 2, 1,
      Seq((9, Seq(100, 101))))) == "audio")
    assert(M.mediaModality(M.syntheticWebm("audio", channels = 1,
      sampleRate = 8000, durationMs = 100L)) == "audio")
    assert(M.mediaModality(M.syntheticMjpegMp4(
      Seq(M.renderJpeg(8, 8, (_, _) => gray(99))))) == "video")
    assert(M.mediaModality(M.syntheticWebm("video", width = 64,
      height = 48, durationMs = 100L)) == "video")
    assert(M.mediaModality(M.syntheticMjpegAvi(
      Seq(M.renderJpeg(8, 8, (_, _) => gray(99))))) == "video")
    assert(M.mediaModality("plain text".getBytes("UTF-8")) == "other")
    assert(M.mediaModality(null) == "other")
    // end-to-end classes: one exact-copy pair per modality plus a
    // cross-modality NON-pair (a PNG and a WAV never class together)
    val png = M.renderPng(64, 64, (x, _) => if (x % 8 >= 4) gray(230) else gray(20))
    val wav = M.renderWav(8000, 1,
      Array.tabulate[Short](2048)(i => (if (i % 2 == 0) 9000 else -9000).toShort))
    val rows = Seq(
      (1L, png), (2L, png),
      (3L, wav), (4L, wav),
      (5L, "junk x".getBytes("UTF-8")), (6L, "junk x".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    val out = graft.operators.Dedup.mediaDedupCorpus(rows, "doc_id", "content")
    val got = out.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("modality"), Option(r.getAs[java.lang.Long]("dup_class")),
        r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) == (("image", Some(1L), true)))
    assert(got(2L) == (("image", Some(1L), false)))
    assert(got(3L) == (("audio", Some(3L), true)))
    assert(got(4L) == (("audio", Some(3L), false)))
    assert(got(5L) == (("other", Some(5L), true)))
    assert(got(6L) == (("other", Some(5L), false)))
    // the kept modality column feeds dedupReport per kind
    val rep = graft.operators.Dedup.dedupReport(out, "modality")
      .collect().map(r => r.getAs[String]("modality") ->
        r.getAs[Long]("n_dropped")).toMap
    assert(rep == Map("image" -> 1L, "audio" -> 1L, "other" -> 1L))
  }

  test("pgsPlateLinks: shared subtitle plates link releases, minShared gates weak links") {
    import spark.implicits._
    val M = graft.operators.Multimodal
    // plate A: left-bright; plate B: inverse shading of a DIFFERENT
    // stripe layout; plate C: A's twin with wobbled gray values
    // (re-encode of the same authored composition)
    def mkv(plates: Seq[(Int, Int) => Int]): Array[Byte] =
      M.syntheticWebm("video", width = 64, height = 64,
        durationMs = 4000L, docType = "matroska",
        imageSubs = Seq(("S_HDMV/PGS", "eng",
          plates.indices.map(j => (j * 1000L, j * 1000L + 500L)))),
        pgsObjects = Map.empty) // placeholder, rebuilt below
    // the fixture writer keys one object per track, so multi-plate
    // assets concatenate single-plate tracks' display sets — instead
    // use two assets x one plate each plus a two-plate double
    def plate(stripe: Int, dark: Int, light: Int): (Int, Int) => Int = {
      val cols = (0 until 4).filter(k => ((stripe + 1) >> k & 1) != 0)
        .map(k => 1 + 2 * k).toSet
      (x: Int, _: Int) => if (cols(x * 9 / 64)) light else dark
    }
    def asset(stripe: Int, dark: Int, light: Int): Array[Byte] =
      M.syntheticWebm("video", width = 64, height = 64,
        durationMs = 4000L, docType = "matroska",
        imageSubs = Seq(("S_HDMV/PGS", "eng", Seq((0L, 1000L)))),
        pgsObjects = Map(0 -> ((64, 64, plate(stripe, dark, light)))))
    val rows = Seq(
      (1L, asset(3, 20, 200)),
      (2L, asset(3, 31, 219)), // same composition, re-encoded values
      (3L, asset(12, 25, 210)), // different film
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    val links = graft.operators.Dedup.pgsPlateLinks(rows, "doc_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(links.toSeq == Seq((1L, 2L, 1L)),
      s"only the shared-composition pair links: ${links.toSeq}")
    // minShared above the shared count gates the link out
    assert(graft.operators.Dedup.pgsPlateLinks(rows, "doc_id", "content",
      minShared = 2).count() == 0)
  }

  test("containment maxGramDf: boilerplate grams dropped from both numerator and denominator") {
    // the same long boilerplate footer in EVERY doc would make a
    // quadratic hot gram AND fake high containment between unrelated
    // docs; with the cap, containment is over surviving grams only
    val boiler = "standard footer text all rights reserved worldwide " +
      "contact the legal department for permission requests"
    val d = (1L to 12L).map(i => (i, s"doc$i body$i $boiler"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.containmentPairs(d, "doc_id", "text", n = 5,
      minContainment = 0.7)
    assert(uncapped.count() > 0,
      "without the cap, shared boilerplate fakes containment between unrelated docs")
    val capped = Dedup.containmentPairs(d, "doc_id", "text", n = 5,
      minContainment = 0.7, maxGramDf = 4)
    assert(capped.count() == 0,
      "after dropping the boilerplate grams no unrelated pair should clear the bar")
  }

  test("hammingClassPairs: identical-signature collapse preserves connected components exactly") {
    import spark.implicits._
    // random 64-bit signatures with planted duplicate groups (the
    // meme/re-upload shape that makes the full per-bucket join k²) +
    // planted near pairs across groups; components from the collapsed
    // pair graph must equal components from the FULL pair join
    val rnd = new scala.util.Random(7)
    val baseSigs = (0 until 40).map(_ => rnd.nextLong())
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var id = 0L
    baseSigs.zipWithIndex.foreach { case (s, i) =>
      val twins = 1 + (i % 5) // groups of 1..5 identical signatures
      (0 until twins).foreach { _ => rows += ((id, s)); id += 1 }
      if (i % 3 == 0) { // a near neighbor within Hamming 2
        rows += ((id, s ^ 3L)); id += 1
      }
    }
    val sigs = rows.toSeq.toDF("id", "sh").localCheckpoint(false)
    def classesOf(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.connectedComponents(pairs.select(col("id_a"), col("id_b")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = classesOf(Dedup.simhashNearDuplicatesFromSigs(
      sigs, maxHamming = 6, bands = 8))
    val collapsed = classesOf(Dedup.hammingClassPairs(
      sigs, maxHamming = 6, bands = 8, maxBucketSize = Dedup.DefaultMaxBucketSize))
    assert(full == collapsed,
      s"collapsed class map must equal the full-pair class map\nfull=$full\ncollapsed=$collapsed")
    assert(full.nonEmpty, "the planted corpus must produce duplicate classes")
  }

  test("hammingClassPairs under a BINDING bucket cap classes strictly MORE rows, never fewer") {
    import spark.implicits._
    // When the hot-bucket cap binds, the collapse counts DISTINCT
    // signatures where the full join counted rows — so a bucket that
    // is hot only because of twins survives for the class consumers
    // (the incrementalHammingNearDuplicates cap-direction precedent).
    // Locked here as the documented superset direction: every id the
    // full capped form classes stays classed, and twin-heavy buckets
    // gain classes.
    val twins = (0L until 30L).map(id => (id, 0x1234567890ABCDEFL))
    val near = Seq((100L, 0x1234567890ABCDEEL)) // Hamming 1 from the twins
    val far = Seq((200L, 0x0F0F0F0F0F0F0F0FL)) // unrelated isolate
    val sigs = (twins ++ near ++ far).toDF("id", "sh").localCheckpoint(false)
    def classedIds(pairs: org.apache.spark.sql.DataFrame): Set[Long] =
      Dedup.connectedComponents(pairs.select(col("id_a"), col("id_b")))
        .collect().map(_.getLong(0)).toSet
    // cap = 10 binds: every bucket holding the 31 twin/near rows is
    // over cap for the FULL join (rows), under cap for the collapse
    // (2 distinct signatures)
    val fullCapped = classedIds(Dedup.simhashNearDuplicatesFromSigs(
      sigs, maxHamming = 6, bands = 8, maxBucketSize = 10))
    val collapsedCapped = classedIds(Dedup.hammingClassPairs(
      sigs, maxHamming = 6, bands = 8, maxBucketSize = 10))
    assert(fullCapped.subsetOf(collapsedCapped),
      s"cap direction must be a superset: full=$fullCapped collapsed=$collapsedCapped")
    assert(fullCapped.isEmpty, "the planted bucket must actually over-cap the full join")
    assert(collapsedCapped == (0L until 30L).toSet + 100L,
      s"twin class + its near neighbor must survive the cap via the collapse: $collapsedCapped")
  }
}
