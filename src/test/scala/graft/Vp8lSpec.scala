package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Vp8l}

/** VP8L decoder vs an INDEPENDENT python encoder
  * (`scripts/make_vp8l_fixture.py`): each fixture ships a .argb
  * sidecar with the expected row-major pixels, so every comparison is
  * bytes-in, exact-ARGB-out — no formula re-derivation on the JVM
  * side. One fixture per feature axis; together they cover literals,
  * normal and simple prefix codes, the code-length code with 17/18
  * zero-runs, color cache, LZ77 copies (mapped and direct
  * distances), all four transforms, sub-byte palette packing, and
  * meta prefix partitioning.
  */
class Vp8lSpec extends AnyFunSuite {

  private def fix(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource(s"/fixtures/$name").toURI))

  private def expected(name: String): (Int, Int, Array[Int]) = {
    val lines = new String(fix(name), "US-ASCII").trim.linesIterator.toSeq
    val Array(w, h) = lines.head.split(" ").map(_.toInt)
    val pix = lines.tail.map(s => java.lang.Long.parseLong(s, 16).toInt).toArray
    (w, h, pix)
  }

  private def check(name: String): Unit = {
    val (ew, eh, epix) = expected(s"$name.argb")
    val got = Vp8l.decode(fix(s"$name.webp"))
    assert(got.isDefined, s"$name must decode")
    val (w, h, _, pix) = got.get
    assert(w == ew && h == eh, s"$name dims: ${w}x$h vs ${ew}x$eh")
    val bad = pix.zip(epix).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(bad.isEmpty,
      s"$name: ${bad.length} wrong pixels, first at ${bad.headOption.map(_._2)}: " +
        bad.take(3).map { case ((a, b), i) =>
          f"[$i] got $a%08x want $b%08x" }.mkString(", "))
  }

  test("literals through normal prefix codes decode exactly")(check("vp8l_lit"))
  test("LZ77 backrefs: mapped plane codes (0,1)/(1,0) and direct distances")(check("vp8l_backref"))
  test("color cache refs reproduce the hash-slot contents")(check("vp8l_cache"))
  test("SUBTRACT_GREEN inverse restores the channels")(check("vp8l_subgreen"))
  test("PREDICTOR inverse: modes 1-12 across blocks, spec border rules")(check("vp8l_pred"))
  test("COLOR_INDEXING: delta-coded palette, 2-bit packed indices")(check("vp8l_palette"))
  test("meta prefix codes route pixels to per-block groups")(check("vp8l_meta"))

  test("spec-invalid predictor mode (>13) rejects the decode — never half-transformed pixels") {
    // python fixture: identical to vp8l_pred but block 3's mode is 14;
    // a decoder that bails mid-transform would return residuals as
    // pixels with ok=Some — silently wrong dHash food
    assert(Vp8l.decode(fix("vp8l_badpred.webp")).isEmpty)
    // and the valid twin still decodes (the rejection is the mode, not
    // the stream geometry)
    assert(Vp8l.decode(fix("vp8l_pred.webp")).isDefined)
  }

  test("distance map is structurally sound and spec-headed") {
    val n = Vp8l.distanceMapSize
    assert(n == 120, "120 short-distance plane codes")
    val all = (0 until n).map(Vp8l.distanceMapEntry)
    assert(all.distinct.length == n, "entries unique")
    all.foreach { case (x, y) =>
      assert(y >= 0 && y <= 7 && x >= -7 && x <= 8, s"range: ($x, $y)")
      assert(y > 0 || x >= 1, s"y=0 must look left: ($x, $y)")
    }
    // the spec's published head, which the backref fixture exercises
    assert(all.take(5) == Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2)))
  }

  test("two-tone scala encoder: pixel-exact, and the PNG twin dHashes identically") {
    def gray(v: Int) = 0xff000000 | (v << 16) | (v << 8) | v
    def stripes(x: Int, y: Int): Boolean = x % 8 >= 4
    val webp = Multimodal.syntheticVp8lTwoTone(64, 64, stripes,
      gray(20), gray(235))
    val png = Multimodal.renderPng(64, 64,
      (x, y) => if (stripes(x, y)) 0xebebeb else 0x141414)
    val img = Multimodal.decodePixels(webp)
    assert(img.isDefined, "the scala-encoded VP8L must decode")
    val d = img.get
    assert(d.getWidth == 64 && d.getHeight == 64)
    for (x <- 0 until 64; y <- 0 until 64)
      assert((d.getRGB(x, y) & 0xffffff) == (if (stripes(x, y)) 0xebebeb else 0x141414),
        s"pixel ($x, $y)")
    // cross-format EXACT perceptual identity: the same pixels hash the
    // same whatever container carried them, so WebP twins of PNG
    // originals land at Hamming 0 in image dedup
    assert(Multimodal.dhash64(webp) == Multimodal.dhash64(png),
      "dHash must be container-invariant for identical pixels")
    // a one-symbol alpha/channel code consumes zero bits: solid image
    val solid = Multimodal.syntheticVp8lTwoTone(9, 5, (_, _) => false,
      gray(77), gray(77))
    val s = Multimodal.decodePixels(solid).get
    assert((0 until 5).forall(y => (0 until 9).forall(x =>
      (s.getRGB(x, y) & 0xffffff) == 0x4d4d4d)))
  }

  test("property: random two-tone images round-trip the scala encoder exactly") {
    // 200 random (dims, colors, pattern) triples through encode→decode:
    // the simple-prefix-code path generatively, not just at fixtures.
    // Deterministic seed; alpha branch covered by non-0xff alphas.
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { trial =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val a = rnd.nextInt() | (if (rnd.nextBoolean()) 0xff000000 else 0)
      val b = if (rnd.nextBoolean()) a else rnd.nextInt()
      val seed = rnd.nextInt()
      def pick(x: Int, y: Int): Boolean =
        ((x * 73856093 ^ y * 19349663 ^ seed) & 1) == 1
      val webp = Multimodal.syntheticVp8lTwoTone(w, h, pick, a, b)
      val got = Vp8l.decode(webp)
      assert(got.isDefined, s"trial $trial (${w}x$h) must decode")
      val (gw, gh, _, pix) = got.get
      assert(gw == w && gh == h, s"trial $trial dims")
      var i = 0
      while (i < pix.length) {
        val want = if (pick(i % w, i / w)) b else a
        assert(pix(i) == want,
          f"trial $trial pixel $i: got ${pix(i)}%08x want $want%08x")
        i += 1
      }
    }
  }

  test("the downstream pixel stack consumes VP8L: identical features to the PNG twin") {
    // extractFeatures and dhash both ride decodePixels, so a lossless
    // WebP and a PNG of the same pixels must produce BIT-IDENTICAL
    // content features (cross-format retrieval / ANN dedup)
    def gray(v: Int) = 0xff000000 | (v << 16) | (v << 8) | v
    def pat(x: Int, y: Int): Boolean = (x / 4 + y / 4) % 2 == 0
    val webp = Multimodal.syntheticVp8lTwoTone(24, 24, pat, gray(30), gray(210))
    val png = Multimodal.renderPng(24, 24,
      (x, y) => if (pat(x, y)) 0xd2d2d2 else 0x1e1e1e)
    val spark = graft.core.Engine.session("graft-test", cores = 4)
    import spark.implicits._
    val feats = Multimodal.extractFeatures(
      Seq((1L, png), (2L, webp)).toDF("id", "content"))
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L) == feats(2L),
      "same pixels must feature identically whatever container carried them")
  }

  test("mutation fuzz: corrupted streams degrade, never throw or hang") {
    // hostile-input posture for a 100 TB crawl scan: every byte of a
    // valid stream flipped, truncated, or randomized must come back
    // as Some(wrong pixels) or None — exceptions would fail the scan,
    // and unbounded loops would wedge an executor. Deterministic seed.
    val rnd = new scala.util.Random(42)
    val names = Seq("vp8l_lit", "vp8l_backref", "vp8l_cache",
      "vp8l_subgreen", "vp8l_pred", "vp8l_palette", "vp8l_meta")
    names.foreach { n =>
      val good = fix(s"$n.webp")
      // every single-byte flip past the RIFF header
      (12 until good.length).foreach { i =>
        val m = good.clone()
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
        Vp8l.decode(m)
      }
      // random multi-byte corruption + truncation
      (0 until 200).foreach { _ =>
        val m = good.clone()
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          m(12 + rnd.nextInt(m.length - 12)) = rnd.nextInt(256).toByte
        }
        Vp8l.decode(java.util.Arrays.copyOfRange(m, 0,
          13 + rnd.nextInt(m.length - 13)))
      }
    }
    // pure noise behind a valid container frame
    (0 until 300).foreach { _ =>
      val payload = new Array[Byte](1 + rnd.nextInt(64))
      rnd.nextBytes(payload)
      payload(0) = 0x2f
      Vp8l.decodePayload(payload, 0, payload.length)
    }
  }

  test("malformed streams degrade to None, never throw") {
    assert(Vp8l.decode(null).isEmpty)
    assert(Vp8l.decode("junk".getBytes).isEmpty)
    val good = fix("vp8l_lit.webp")
    // truncations at every length must not throw
    (12 until good.length by 7).foreach { cut =>
      Vp8l.decode(java.util.Arrays.copyOfRange(good, 0, cut))
    }
    // flipped version bits must be rejected
    val bad = good.clone()
    bad(bad.length - 1) = 0xff.toByte
    Vp8l.decode(bad) // any result, no throw
    // a VP8 (lossy) container yields None
    assert(Vp8l.decode(Multimodal.syntheticWebp("vp8", 32, 32)).isEmpty)
  }
}
