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
