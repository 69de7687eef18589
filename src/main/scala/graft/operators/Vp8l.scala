package graft.operators

/** Pure-JDK VP8L (WebP lossless) bitstream decoder — the pixel half
  * of the WebP story: round 11's header walk ([[Multimodal.webpInfo]])
  * classified WebP rows and read dims, but every pixel operator
  * (stats means, dHash near-dup, textiness, resize) stayed blind
  * because the JDK ships no WebP plugin. Lossless WebP is an
  * entropy-coded ARGB image with optional spatial transforms, all
  * integer math — decodable exactly with no codec library, which
  * makes decoded fixtures CLOSED FORMS of their source pixels (the
  * q79/q160 exact-oracle discipline). Lossy VP8 stays header-only (a
  * DCT codec is out of pure-JDK scope, stated in SURVEY §3).
  *
  * Implements the full spec surface: LSB-first bit reading, canonical
  * prefix codes (simple 1/2-symbol and normal code-length-coded),
  * color cache, LZ77 backward references with the 2D distance
  * mapping, meta prefix-code partitioning, and the four transforms
  * (predictor with all 14 modes, cross-color, subtract-green,
  * color-indexing incl. sub-byte index packing), inverted in reverse
  * stream order. Cross-validated against an INDEPENDENT python
  * encoder (`scripts/make_vp8l_fixture.py`) over literals, normal
  * and simple codes, cache hits, backrefs (direct and mapped
  * distances), every transform, and packed palettes; the deep tail
  * of the 120-entry distance-map table follows the spec's published
  * ordering and is structurally spec-checked (unique, in-range,
  * verified head), the one surface a container without libwebp
  * cannot differentially test.
  *
  * Scale shape: a per-row kernel like the JPEG/PNG paths — decode is
  * O(pixels), allocation is one int array per image, failures degrade
  * per-row to None (DROPMALFORMED discipline for media).
  */
private[graft] object Vp8l {

  /** LSB-first bit reader over a byte range; reads past the end set
    * `eos` and return zeros (the caller rejects the decode), so a
    * truncated upload degrades instead of throwing.
    */
  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bitPos = 0
    var eos = false
    def bit(): Int = {
      if (pos >= end) { eos = true; return 0 }
      val v = (b(pos) >> bitPos) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      v
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  /** Canonical prefix-code tree as a flat node array: `nodes(2*i)` /
    * `nodes(2*i+1)` are the 0/1 children of node i — a non-negative
    * value is a child node index, `-(symbol+1)` is a leaf, Int.MinValue
    * is an unassigned branch (invalid stream). `single` >= 0 marks the
    * degenerate one-symbol code whose reads consume ZERO bits (both
    * the spec's 1-symbol simple code and a normal code with one used
    * symbol).
    */
  private final class Tree(val nodes: Array[Int], val single: Int)

  /** Build the canonical tree from per-symbol code lengths (0 =
    * unused): count-per-length -> first canonical code per length ->
    * insert each symbol along its code's bits MSB-first (the bit
    * order prefix codes are serialized in). None for over-subscribed
    * or empty codes.
    */
  private def buildTree(lengths: Array[Int]): Option[Tree] = {
    val maxLen = 15
    var used = 0
    var totLen = 0
    var singleSym = -1
    val count = new Array[Int](maxLen + 1)
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l < 0 || l > maxLen) return None
      if (l > 0) { used += 1; totLen += l; singleSym = i; count(l) += 1 }
      i += 1
    }
    if (used == 0) return None
    if (used == 1) return Some(new Tree(null, singleSym))
    // canonical first-code per length; reject over-subscription
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + count(l - 1)) << 1
      nextCode(l) = code
      if (count(l) > 0 && (code + count(l) - 1) >>> l != 0) return None
      l += 1
    }
    var nNodes = 1
    // internal nodes ≤ the total code length (every code bit visits at
    // most one new node), so 2 slots × (totLen + 1) bounds the tree —
    // NOT alphabet×maxLen, which would allocate ~280 KB per green code
    // on every corpus row
    val arr = new Array[Int]((2 * (totLen + 1)) max 16)
    java.util.Arrays.fill(arr, Int.MinValue)
    i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) {
        val c = nextCode(len)
        nextCode(len) += 1
        var node = 0
        var bit = len - 1
        while (bit >= 0) {
          val branch = 2 * node + ((c >>> bit) & 1)
          if (bit == 0) {
            if (arr(branch) != Int.MinValue) return None
            arr(branch) = -(i + 1)
          } else {
            if (arr(branch) == Int.MinValue) { arr(branch) = nNodes; nNodes += 1 }
            else if (arr(branch) < 0) return None
            node = arr(branch)
          }
          bit -= 1
        }
      }
      i += 1
    }
    Some(new Tree(java.util.Arrays.copyOf(arr, 2 * nNodes), -1))
  }

  private def readSymbol(t: Tree, br: BitReader): Int = {
    if (t.single >= 0) return t.single
    var node = 0
    while (true) {
      val v = t.nodes(2 * node + br.bit())
      if (v < 0) return if (v == Int.MinValue) -1 else -v - 1
      node = v
    }
    -1
  }

  /** One prefix code as the stream serializes it: 1-bit simple flag,
    * then either the 1/2-symbol form or the code-length-coded normal
    * form (19-symbol CL code in the fixed order, 16/17/18 repeats,
    * optional max-symbol cutoff).
    */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readCode(br: BitReader, alphabetSize: Int): Option[Tree] = {
    if (br.bits(1) == 1) { // simple
      val numSymbols = br.bits(1) + 1
      val first8 = br.bits(1)
      val lengths = new Array[Int](alphabetSize)
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      if (s0 >= alphabetSize) return None
      lengths(s0) = 1
      if (numSymbols == 2) {
        val s1 = br.bits(8)
        if (s1 >= alphabetSize || s1 == s0) return None
        lengths(s1) = 1
      }
      buildTree(lengths)
    } else {
      val numCl = 4 + br.bits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val clTree = buildTree(clLengths) match {
        case Some(t) => t
        case None => return None
      }
      var maxSymbols = alphabetSize
      if (br.bits(1) == 1) { // length-limited
        val nbits = 2 + 2 * br.bits(3)
        maxSymbols = 2 + br.bits(nbits)
        if (maxSymbols > alphabetSize) return None
      }
      val lengths = new Array[Int](alphabetSize)
      var sym = 0
      var prevLen = 8 // repeats of "previous non-zero" default to 8
      while (sym < alphabetSize && maxSymbols > 0) {
        maxSymbols -= 1
        val cl = readSymbol(clTree, br)
        if (cl < 0 || br.eos) return None
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeat, value) = cl match {
            case 16 => (3 + br.bits(2), prevLen)
            case 17 => (3 + br.bits(3), 0)
            case _ => (11 + br.bits(7), 0)
          }
          if (sym + repeat > alphabetSize) return None
          var r = 0
          while (r < repeat) { lengths(sym) = value; sym += 1; r += 1 }
        }
      }
      buildTree(lengths)
    }
  }

  /** LZ77 prefix-coded value (lengths and distance plane codes):
    * codes 0-3 are the value directly (+1), beyond that an exponential
    * bucket with extra bits.
    */
  private def lz77Value(code: Int, br: BitReader): Int = {
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }
  }

  /** The spec's 120-entry short-distance map: plane codes 1-120 name
    * near pixels (x, y) with dist = y*width + x (clamped >= 1); codes
    * beyond 120 are the literal distance + 120. Candidates are
    * {(x,0): 1<=x<=8} ∪ {(x,y): 1<=y<=7, -7<=x<=8}, published sorted
    * by closeness — head order spec-verified, structure gated by
    * Vp8lSpec.
    */
  private val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (7, 1), (-7, 1), (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 5), (-5, 5), (8, 0), (4, 7), (-4, 7), (7, 4),
    (-7, 4), (8, 1), (8, 2), (6, 5), (-6, 5), (5, 6), (-5, 6), (8, 3),
    (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 6), (-6, 6), (8, 5),
    (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 6), (7, 7), (-7, 7), (8, 7))

  private[graft] def distanceMapSize: Int = DistanceMap.length
  private[graft] def distanceMapEntry(i: Int): (Int, Int) = DistanceMap(i)

  private def planeCodeToDistance(planeCode: Int, width: Int): Int = {
    if (planeCode > 120) planeCode - 120
    else {
      val (x, y) = DistanceMap(planeCode - 1)
      val d = y * width + x
      if (d >= 1) d else 1
    }
  }

  // ----------------------------------------------------- entropy image

  private final class Group(val green: Tree, val red: Tree,
      val blue: Tree, val alpha: Tree, val dist: Tree)

  /** Decode one entropy-coded ARGB image: optional color cache,
    * (top-level only) optional meta prefix-code partition, the
    * prefix-code groups, then the literal / backref / cache-ref
    * stream. Returns null on any malformed structure.
    */
  private def decodeEntropyImage(br: BitReader, w: Int, h: Int,
      topLevel: Boolean): Array[Int] = {
    // color cache
    var cacheBits = 0
    if (br.bits(1) == 1) {
      cacheBits = br.bits(4)
      if (cacheBits < 1 || cacheBits > 11) return null
    }
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    // meta prefix partition (spec: only while reading the ARGB image)
    var metaBits = 0
    var meta: Array[Int] = null
    var nGroups = 1
    if (topLevel && br.bits(1) == 1) {
      metaBits = br.bits(3) + 2
      val mw = subSampleSize(w, metaBits)
      val mh = subSampleSize(h, metaBits)
      meta = decodeEntropyImage(br, mw, mh, topLevel = false)
      if (meta == null) return null
      var i = 0
      while (i < meta.length) {
        val g = (meta(i) >>> 8) & 0xffff
        if (g + 1 > nGroups) nGroups = g + 1
        i += 1
      }
    }
    val greenAlphabet = 256 + 24 + cacheSize
    val groups = new Array[Group](nGroups)
    var g = 0
    while (g < nGroups) {
      val trees = new Array[Tree](5)
      var c = 0
      while (c < 5) {
        val size = c match {
          case 0 => greenAlphabet
          case 4 => 40
          case _ => 256
        }
        trees(c) = readCode(br, size) match {
          case Some(t) => t
          case None => return null
        }
        c += 1
      }
      groups(g) = new Group(trees(0), trees(1), trees(2), trees(3), trees(4))
      g += 1
    }
    val out = new Array[Int](w * h)
    val mw = if (meta != null) subSampleSize(w, metaBits) else 0
    @inline def groupAt(x: Int, y: Int): Group =
      if (meta == null) groups(0)
      else {
        val gi = (meta((y >> metaBits) * mw + (x >> metaBits)) >>> 8) & 0xffff
        groups(gi)
      }
    @inline def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    var pos = 0
    val n = w * h
    while (pos < n) {
      val x = pos % w
      val grp = groupAt(x, pos / w)
      val s = readSymbol(grp.green, br)
      if (s < 0 || br.eos) return null
      if (s < 256) {
        val r = readSymbol(grp.red, br)
        val b2 = readSymbol(grp.blue, br)
        val a = readSymbol(grp.alpha, br)
        if (r < 0 || b2 < 0 || a < 0) return null
        val argb = (a << 24) | (r << 16) | (s << 8) | b2
        out(pos) = argb
        cacheInsert(argb)
        pos += 1
      } else if (s < 280) {
        val length = lz77Value(s - 256, br)
        val distCode = readSymbol(grp.dist, br)
        if (distCode < 0) return null
        val planeCode = lz77Value(distCode, br)
        val dist = planeCodeToDistance(planeCode, w)
        if (dist > pos || pos + length > n) return null
        var i = 0
        while (i < length) {
          val v = out(pos - dist)
          out(pos) = v
          cacheInsert(v)
          pos += 1
          i += 1
        }
      } else {
        val idx = s - 280
        if (cache == null || idx >= cacheSize) return null
        out(pos) = cache(idx)
        pos += 1
      }
      if (br.eos) return null
    }
    out
  }

  @inline private def subSampleSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  // ------------------------------------------------------- transforms

  private final case class Transform(kind: Int, bits: Int,
      data: Array[Int], paletteSize: Int)

  /** Inverse PREDICTOR transform: add the per-block-mode prediction
    * to every pixel, raster order (each prediction reads already-
    * reconstructed neighbors). Contiguous-array neighbor addressing
    * makes the borders come out per spec: (0,0) predicts opaque
    * black, row 0 predicts left, column 0 predicts top, and the
    * top-right of a row's last pixel is the row's own first pixel.
    * Returns false on a spec-invalid mode (> 13) — the caller must
    * reject the whole decode: half-transformed residuals reported as
    * pixels would feed dHash signatures silently wrong.
    */
  private def inversePredictor(argb: Array[Int], w: Int, h: Int,
      bits: Int, modes: Array[Int]): Boolean = {
    val mw = subSampleSize(w, bits)
    @inline def avg2(a: Int, b: Int): Int =
      (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
    @inline def addPixels(a: Int, b: Int): Int = {
      val alphaAndGreen = (a & 0xff00ff00) + (b & 0xff00ff00)
      val redAndBlue = (a & 0x00ff00ff) + (b & 0x00ff00ff)
      (alphaAndGreen & 0xff00ff00) | (redAndBlue & 0x00ff00ff)
    }
    @inline def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    def select(a: Int, b: Int, c: Int): Int = {
      @inline def sub3(x: Int, y: Int, z: Int): Int =
        math.abs(y - z) - math.abs(x - z)
      val p = sub3((a >>> 24), (b >>> 24), (c >>> 24)) +
        sub3((a >>> 16) & 0xff, (b >>> 16) & 0xff, (c >>> 16) & 0xff) +
        sub3((a >>> 8) & 0xff, (b >>> 8) & 0xff, (c >>> 8) & 0xff) +
        sub3(a & 0xff, b & 0xff, c & 0xff)
      if (p <= 0) a else b
    }
    def clampAddSubFull(a: Int, b: Int, c: Int): Int = {
      @inline def ch(sh: Int): Int =
        clip255(((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) - ((c >>> sh) & 0xff))
      (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
    }
    def clampAddSubHalf(a: Int, b: Int, c: Int): Int = {
      val ave = avg2(a, b)
      @inline def ch(sh: Int): Int = {
        val v = (ave >>> sh) & 0xff
        clip255(v + (v - ((c >>> sh) & 0xff)) / 2)
      }
      (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
    }
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (pos == 0) 0xff000000
          else if (y == 0) argb(pos - 1) // row 0: left
          else if (x == 0) argb(pos - w) // column 0: top
          else {
            val mode = (modes((y >> bits) * mw + (x >> bits)) >>> 8) & 0xff
            val l = argb(pos - 1)
            val t = argb(pos - w)
            val tl = argb(pos - w - 1)
            val tr = argb(pos - w + 1) // last column: row's first pixel
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(t, l, tl)
              case 12 => clampAddSubFull(l, t, tl)
              case 13 => clampAddSubHalf(l, t, tl)
              case _ => return false // spec-invalid mode: fail the decode
            }
          }
        argb(pos) = addPixels(argb(pos), pred)
        x += 1
        pos += 1
      }
      y += 1
    }
    true
  }

  /** Inverse cross-COLOR transform: per-block multipliers undo the
    * green->red, green->blue and red->blue decorrelation (signed
    * 3.5 fixed-point deltas, the spec's exact integer arithmetic).
    */
  private def inverseColor(argb: Array[Int], w: Int, h: Int,
      bits: Int, elems: Array[Int]): Unit = {
    val mw = subSampleSize(w, bits)
    @inline def delta(pred: Int, color: Int): Int =
      (pred.toByte.toInt * color.toByte.toInt) >> 5
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = elems((y >> bits) * mw + (x >> bits))
        val g2r = m & 0xff
        val g2b = (m >>> 8) & 0xff
        val r2b = (m >>> 16) & 0xff
        val v = argb(pos)
        val g = (v >>> 8) & 0xff
        var r = (v >>> 16) & 0xff
        var b = v & 0xff
        r = (r + delta(g2r, g)) & 0xff
        b = (b + delta(g2b, g)) & 0xff
        b = (b + delta(r2b, r)) & 0xff
        argb(pos) = (v & 0xff00ff00) | (r << 16) | b
        x += 1
        pos += 1
      }
      y += 1
    }
  }

  /** Inverse SUBTRACT_GREEN: red += green, blue += green (mod 256). */
  private def inverseSubtractGreen(argb: Array[Int]): Unit = {
    var i = 0
    while (i < argb.length) {
      val v = argb(i)
      val g = (v >>> 8) & 0xff
      val r = (((v >>> 16) & 0xff) + g) & 0xff
      val b = ((v & 0xff) + g) & 0xff
      argb(i) = (v & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Inverse COLOR_INDEXING: unpack sub-byte indices from the green
    * channel (palettes <= 16 pack 2/4/8 indices per coded pixel) and
    * look up the delta-decoded palette; out-of-range indices are
    * transparent black per spec.
    */
  private def inverseColorIndexing(packed: Array[Int], w: Int, h: Int,
      palette: Array[Int], widthBits: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    val packedW = subSampleSize(w, widthBits)
    val idxPerPixel = 1 << widthBits
    val idxBits = 8 >> widthBits
    val idxMask = (1 << idxBits) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cp = packed(y * packedW + (x >> widthBits))
        val within = x & (idxPerPixel - 1)
        val idx = ((cp >>> 8) >>> (within * idxBits)) & idxMask
        out(y * w + x) = if (idx < palette.length) palette(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  // ----------------------------------------------------------- driver

  /** Decode a bare VP8L payload (the bytes of the RIFF `VP8L` chunk):
    * (width, height, alphaUsed, ARGB row-major). None on any
    * malformed/truncated structure — per-row degradation, never an
    * exception across a corpus scan.
    */
  def decodePayload(bytes: Array[Byte], off: Int, len: Int): Option[(Int, Int, Boolean, Array[Int])] = {
    try decodePayload0(bytes, off, len)
    catch { case _: Throwable => None }
  }

  private def decodePayload0(bytes: Array[Byte], off: Int,
      len: Int): Option[(Int, Int, Boolean, Array[Int])] = {
    if (bytes == null || len < 5 || off < 0 || off + len > bytes.length ||
      bytes(off) != 0x2f) return None
    val br = new BitReader(bytes, off + 1, off + len)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    val alphaUsed = br.bits(1) == 1
    if (br.bits(3) != 0) return None // version must be 0
    if (w.toLong * h > 16777216L) return None // 16M-pixel safety cap
    // transforms (top level only), each kind at most once
    var transforms = List.empty[Transform]
    var seen = 0
    var curW = w
    var break = false
    while (!break && br.bits(1) == 1) {
      val kind = br.bits(2)
      if ((seen & (1 << kind)) != 0) return None
      seen |= 1 << kind
      kind match {
        case 0 | 1 => // PREDICTOR | COLOR: block bits + sub-image
          val tBits = br.bits(3) + 2
          val tw = subSampleSize(curW, tBits)
          val th = subSampleSize(h, tBits)
          val data = decodeEntropyImage(br, tw, th, topLevel = false)
          if (data == null) return None
          transforms ::= Transform(kind, tBits, data, 0)
        case 2 => // SUBTRACT_GREEN: no data
          transforms ::= Transform(2, 0, null, 0)
        case _ => // COLOR_INDEXING
          val paletteSize = br.bits(8) + 1
          val raw = decodeEntropyImage(br, paletteSize, 1, topLevel = false)
          if (raw == null) return None
          // palette entries are component-wise deltas off the previous
          var i = 1
          while (i < raw.length) {
            val p = raw(i - 1)
            val c = raw(i)
            raw(i) = ((((c >>> 24) + (p >>> 24)) & 0xff) << 24) |
              (((((c >>> 16) & 0xff) + ((p >>> 16) & 0xff)) & 0xff) << 16) |
              (((((c >>> 8) & 0xff) + ((p >>> 8) & 0xff)) & 0xff) << 8) |
              (((c & 0xff) + (p & 0xff)) & 0xff)
            i += 1
          }
          val widthBits =
            if (paletteSize <= 2) 3
            else if (paletteSize <= 4) 2
            else if (paletteSize <= 16) 1
            else 0
          transforms ::= Transform(3, widthBits, raw, paletteSize)
          curW = subSampleSize(curW, widthBits) // subsequent reads see packed width
      }
      if (br.eos) return None
    }
    var argb = decodeEntropyImage(br, curW, h, topLevel = true)
    if (argb == null) return None
    // invert in reverse stream order (transforms is already reversed
    // by the prepending above)
    var curWidth = curW
    transforms.foreach { t =>
      t.kind match {
        case 0 =>
          if (!inversePredictor(argb, curWidth, h, t.bits, t.data))
            return None // invalid predictor mode: never report wrong pixels
        case 1 => inverseColor(argb, curWidth, h, t.bits, t.data)
        case 2 => inverseSubtractGreen(argb)
        case _ =>
          argb = inverseColorIndexing(argb, w, h, t.data, t.bits)
          curWidth = w
      }
    }
    if (curWidth != w) return None // color-indexing promised a widening
    Some((w, h, alphaUsed, argb))
  }

  /** Decode a whole WebP container's lossless payload: walk the RIFF
    * chunks for `VP8L` (bare or inside a `VP8X` extended file) and
    * decode it. None for lossy (`VP8 `) or alpha-less containers
    * without a lossless chunk.
    */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Boolean, Array[Int])] = {
    if (bytes == null || bytes.length < 20 ||
      !(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P'))
      return None
    @inline def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    var i = 12
    while (i + 8 <= bytes.length) {
      val size = le32(i + 4)
      if (bytes(i) == 'V' && bytes(i + 1) == 'P' && bytes(i + 2) == '8' &&
        bytes(i + 3) == 'L') {
        val end = math.min(bytes.length.toLong, i + 8 + size).toInt
        return decodePayload(bytes, i + 8, end - (i + 8))
      }
      if (size < 0 || size > Int.MaxValue - i - 9) return None
      i += 8 + size.toInt + (size.toInt & 1)
    }
    None
  }
}
