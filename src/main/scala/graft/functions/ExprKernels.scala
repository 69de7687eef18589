package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels shared by the interpreted (`eval`) and generated
  * (`doGenCode`) paths of the custom expressions in
  * [[CatalystExpressions]]. A top-level Scala object with no companion
  * class gets Java static forwarders, so whole-stage-generated code
  * calls `graft.functions.ExprKernels.simhash64(arr)` directly — the
  * surrounding stage stays fused instead of splitting into interpreted
  * `CodegenFallback` eval with per-row boxing. Keeping ONE body per
  * kernel also guarantees the two execution paths cannot drift.
  *
  * All kernels are total on their boxed-null conventions: an
  * expression whose null-handling is "null input → constant output"
  * passes the null straight through (the generated code carries no
  * branch beyond the `isNull ? null : value` hand-off).
  */
object ExprKernels {

  /** splitmix64 — standard public-domain 64-bit mixer (Steele et al.,
    * OOPSLA'14); derives the k MinHash permutations from one base hash.
    */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 64-bit SimHash over token hashes: per-bit majority vote packed to
    * a long. Null/empty input → 0.
    */
  def simhash64(arr: ArrayData): Long = {
    if (arr == null) return 0L
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 >= n) out |= (1L << j)
      j += 1
    }
    out
  }

  /** MinHash signature over shingle hashes: slot i = min over shingles
    * of splitmix64(base ^ seed_i). Null/empty input → all Long.MaxValue
    * (never collides with real content).
    */
  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    if (arr != null) {
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val base = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          val h = splitmix64(base ^ (k.toLong * 0xA24BAED4963EE407L))
          if (h < out(k)) out(k) = h
          k += 1
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Unicode NFC normalization; the isNormalized fast path skips the
    * rebuild for the (dominant) already-composed case.
    */
  def normalizeNfc(v: UTF8String): UTF8String = {
    val s = v.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Deflate (zlib level 6) compression ratio of the UTF-8 bytes —
    * compressed/raw in (0, ~1.05]; empty input → 1.0. One Deflater
    * per call (they are not thread-safe to share and carry native
    * state); the 8 KiB output buffer loop avoids sizing games.
    */
  def deflateRatio(v: UTF8String): Double = {
    val raw = v.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.end()
  }

  private lazy val jsonMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.configure(
      com.fasterxml.jackson.databind.SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    m
  }

  private def canonNode(node: com.fasterxml.jackson.databind.JsonNode):
      com.fasterxml.jackson.databind.JsonNode = node match {
    case o: com.fasterxml.jackson.databind.node.ObjectNode =>
      val sorted = jsonMapper.createObjectNode()
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = o.fieldNames()
      while (it.hasNext) names += it.next()
      names.sorted.foreach { n =>
        sorted.set[com.fasterxml.jackson.databind.JsonNode](n, canonNode(o.get(n))); ()
      }
      sorted
    case a: com.fasterxml.jackson.databind.node.ArrayNode =>
      val out = jsonMapper.createArrayNode()
      (0 until a.size()).foreach { i => out.add(canonNode(a.get(i))); () }
      out
    case other => other
  }

  /** Canonical JSON (recursively sorted keys, compact separators);
    * invalid JSON → null.
    */
  def canonicalJson(v: UTF8String): UTF8String =
    try {
      val parsed = jsonMapper.readTree(v.toString)
      UTF8String.fromString(jsonMapper.writeValueAsString(canonNode(parsed)))
    } catch { case _: Exception => null }

  private val und = UTF8String.fromString("und")

  /** Stopword-profile language ID over a token array: one pass of
    * zero-copy set lookups, argmax language, "und" when nothing
    * matches (ties → lowest profile index). Null input → "und".
    */
  def langId(arr: ArrayData, langs: Array[UTF8String],
      sets: Array[java.util.HashSet[UTF8String]]): UTF8String = {
    if (arr == null) return und
    val n = arr.numElements()
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      var p = 0
      while (p < sets.length) {
        if (sets(p).contains(tok)) counts(p) += 1
        p += 1
      }
      i += 1
    }
    var best = -1
    var bestCount = 0
    var p = 0
    while (p < counts.length) {
      if (counts(p) > bestCount) { best = p; bestCount = counts(p) }
      p += 1
    }
    if (best < 0) und else langs(best)
  }

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")
  private val EmptyStringArray = new GenericArrayData(Array.empty[Any])

  /** Whitespace tokenizer: lowercase(trim(text)) split on whitespace
    * runs, empties dropped. Null input → empty array.
    */
  def tokenize(v: UTF8String): ArrayData = {
    if (v == null) return EmptyStringArray
    val s = v.toString.trim
    if (s.isEmpty) return EmptyStringArray
    val parts = wsPattern.split(s)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      out(i) = UTF8String.fromString(parts(i).toLowerCase(java.util.Locale.ROOT))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val EmptyLongArray = UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])

  /** Tokenize + per-token xxhash64 in ONE pass — the fused form of
    * `transform(tokens(text), t => xxhash64(t))`. The wrapper
    * `transform` is a Spark higher-order function and therefore a
    * `CodegenFallback`: even with a codegen'd tokenizer inside, the
    * HOF forces the whole signature projection back to interpreted
    * eval. Hashing calls the SAME `XxHash64Function` (seed 42) the
    * built-in `xxhash64` column uses, so values are bit-identical to
    * the composed formulation. Null input → empty array.
    */
  def tokenHashes(v: UTF8String): ArrayData = {
    if (v == null) return EmptyLongArray
    val s = v.toString.trim
    if (s.isEmpty) return EmptyLongArray
    val parts = wsPattern.split(s)
    val out = new Array[Long](parts.length)
    var i = 0
    while (i < parts.length) {
      val tok = UTF8String.fromString(parts(i).toLowerCase(java.util.Locale.ROOT))
      out(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(tok, org.apache.spark.sql.types.StringType, 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Order-sensitive rolling fingerprint over the token sequence — the
    * fused form of `aggregate(tokens(text), lit(SEED), (acc, t) =>
    * xxhash64(acc, t))` (another interpreted-HOF hot path). Chain
    * semantics replicate the two-child `xxhash64(acc, t)` exactly:
    * seed 42, fold the long then the string through
    * `XxHash64Function`. Null/empty input → the init value, like the
    * fold over an empty array.
    */
  def rollingFingerprint(v: UTF8String, init: Long): Long = {
    var acc = init
    if (v == null) return acc
    val s = v.toString.trim
    if (s.isEmpty) return acc
    val parts = wsPattern.split(s)
    val fn = org.apache.spark.sql.catalyst.expressions.XxHash64Function
    var i = 0
    while (i < parts.length) {
      val tok = UTF8String.fromString(parts(i).toLowerCase(java.util.Locale.ROOT))
      val h1 = fn.hash(acc, org.apache.spark.sql.types.LongType, 42L)
      acc = fn.hash(tok, org.apache.spark.sql.types.StringType, h1)
      i += 1
    }
    acc
  }

  /** Distinct k-shingle hashes from token hashes (splitmix chain over
    * each window; fewer than k tokens → one shingle of all tokens).
    * Null/empty input → empty array.
    */
  def shingleHashes(arr: ArrayData, k: Int): ArrayData = {
    if (arr == null) return EmptyLongArray
    val n = arr.numElements()
    if (n == 0) return EmptyLongArray
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (n < k) {
      var h = 0x51ED270B9A3F46DAL
      var i = 0
      while (i < n) { h = splitmix64(h ^ arr.getLong(i)); i += 1 }
      out.add(h)
    } else {
      var i = 0
      while (i + k <= n) {
        var h = 0x51ED270B9A3F46DAL
        var j = i
        while (j < i + k) { h = splitmix64(h ^ arr.getLong(j)); j += 1 }
        out.add(h)
        i += 1
      }
    }
    val prim = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { prim(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(prim)
  }

  /** Exact set Jaccard of two long arrays, with the SAME set
    * semantics as `size(array_intersect) / size(array_union)` over
    * non-null long elements (each side deduplicated; two empty sets
    * are identical documents → 1.0), in ONE primitive pass instead of
    * two generic-ArrayData passes: |A∪B| = |Da| + |Db| − |Da∩Db|, so
    * one open-addressing long table per side replaces the boxed
    * intersect AND union walks — the hot inner op of every
    * LSH-candidate verification join, measured at >90% of the
    * verify stage's CPU in the array_intersect/array_union form.
    */
  def setJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    // open addressing with linear probing; 0 is reserved (tracked by
    // a flag) so the table can use 0 as the empty slot. A null
    // ELEMENT is one more distinct set member on its side (exactly
    // array_intersect/array_union's treatment — signature arrays are
    // containsNull=false by construction, but a parquet round trip of
    // the durable index relaxes the schema to nullable and the
    // semantics must not change underneath it).
    def cap(n: Int): Int = {
      var c = 16
      while (c < (n + 1) * 2) c <<= 1
      c
    }
    val capA = cap(na)
    val maskA = capA - 1
    val tabA = new Array[Long](capA)
    var aZero = false
    var aNull = false
    var da = 0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) { if (!aNull) { aNull = true; da += 1 } }
      else {
        val v = a.getLong(i)
        if (v == 0L) { if (!aZero) { aZero = true; da += 1 } }
        else {
          var idx = (java.lang.Long.hashCode(splitmix64(v)) & maskA)
          while (tabA(idx) != 0L && tabA(idx) != v) idx = (idx + 1) & maskA
          if (tabA(idx) == 0L) { tabA(idx) = v; da += 1 }
        }
      }
      i += 1
    }
    val capB = cap(nb)
    val maskB = capB - 1
    val tabB = new Array[Long](capB)
    var bZero = false
    var bNull = false
    var db = 0
    var inter = 0
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) {
        if (!bNull) { bNull = true; db += 1; if (aNull) inter += 1 }
      } else {
        val v = b.getLong(i)
        if (v == 0L) {
          if (!bZero) { bZero = true; db += 1; if (aZero) inter += 1 }
        } else {
          var idx = (java.lang.Long.hashCode(splitmix64(v)) & maskB)
          while (tabB(idx) != 0L && tabB(idx) != v) idx = (idx + 1) & maskB
          if (tabB(idx) == 0L) {
            tabB(idx) = v; db += 1
            var ia = (java.lang.Long.hashCode(splitmix64(v)) & maskA)
            while (tabA(ia) != 0L && tabA(ia) != v) ia = (ia + 1) & maskA
            if (tabA(ia) == v) inter += 1
          }
        }
      }
      i += 1
    }
    val union = da.toLong + db.toLong - inter
    if (union == 0L) 1.0 else inter.toDouble / union
  }

  /** Dot product of two equal-length numeric arrays, accumulated
    * left-to-right in double. Callers check the length precondition
    * (mismatch is their null case).
    */
  def dotProduct(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Argmax-similarity cluster assignment against a fixed centroid
    * matrix. Input is L2-normalized with per-element float rounding
    * when the source array is float (bit-parity with
    * `VectorFunctions.l2Normalize`); ties resolve to the lowest
    * cluster index; −1 when no same-dimension centroid exists (the
    * caller's null case).
    */
  def nearestCentroid(a: ArrayData, centroids: Array[Array[Double]],
      elemFloat: Boolean): Int = {
    val n = a.numElements()
    @inline def elem(i: Int): Double =
      if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = elem(i); ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    val unit = new Array[Double](n)
    i = 0
    while (i < n) {
      unit(i) =
        if (nrm == 0.0) elem(i)
        else if (elemFloat) (elem(i) / nrm).toFloat.toDouble
        else elem(i) / nrm
      i += 1
    }
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length == n) {
        var sim = 0.0
        var j = 0
        while (j < n) { sim += unit(j) * cent(j); j += 1 }
        if (sim > bestSim) { best = c; bestSim = sim }
      }
      c += 1
    }
    best
  }

  /** Half-away-from-zero rounding to long — the SQL `round()` rule in
    * both Spark and DuckDB. `Math.round` is `floor(x + 0.5)`, which
    * disagrees on negative half-integer boundaries (−2.5 → −2 instead
    * of −3), and the LM log-probs below are always negative.
    */
  @inline def roundHalfAway(x: Double): Long =
    if (x >= 0) Math.floor(x + 0.5).toLong else Math.ceil(x - 0.5).toLong

  /** Add-one-smoothed bigram LM log-probability sum over a token
    * array, integer-scaled: for each adjacent pair (w1, w2),
    * `p = (c(w1,w2) + 1) / (c(w1) + V)` and the accumulator adds
    * `roundHalfAway(ln(p) * 1e6)`. Scaling to integers BEFORE the sum
    * makes the per-document score independent of evaluation order —
    * exactly reproducible in any engine with `ln` and `round` (float
    * log-prob sums are not). Unseen w1/bigram fall out of the same
    * formula (counts default 0). Fewer than 2 tokens (or null) → 0;
    * callers exclude those rows (no bigrams to score).
    */
  def bigramLogProbSum(toks: ArrayData,
      uni: java.util.HashMap[UTF8String, java.lang.Long],
      big: java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]],
      v: Long): Long = {
    if (toks == null) return 0L
    val n = toks.numElements()
    if (n < 2) return 0L
    var acc = 0L
    var w1 = toks.getUTF8String(0)
    var i = 0
    while (i < n - 1) {
      val w2 = toks.getUTF8String(i + 1)
      val c1l = uni.get(w1)
      val c1 = if (c1l == null) 0L else c1l.longValue()
      val inner = big.get(w1)
      val c2l = if (inner == null) null else inner.get(w2)
      val c2 = if (c2l == null) 0L else c2l.longValue()
      acc += roundHalfAway(Math.log((c2 + 1.0) / (c1 + v)) * 1e6)
      w1 = w2
      i += 1
    }
    acc
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val DsirPrefix =
    "dsir:".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Bucket = the first 8 hex chars of the digest as an unsigned int,
    * mod B — byte-identical to the SQL formulation
    * `conv(substring(md5(s), 1, 8), 16, 10) % B` (Spark) /
    * `('0x' || substr(md5(s), 1, 8))::BIGINT % B` (DuckDB) that the
    * fit and the oracle both use.
    */
  @inline private def md5Bucket(digest: Array[Byte], b: Int): Int = {
    val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
    (v % b).toInt
  }

  /** Greedy BPE encode of one word against a merge-rank table (the
    * GPT-2 apply algorithm): split to code points (+ the `</w>`
    * end-of-word symbol), then repeatedly merge the adjacent pair with
    * the lowest (earliest-learned) rank, leftmost occurrence first,
    * until no learned merge applies. Code-point split keeps surrogate
    * pairs (emoji, rare CJK) intact.
    */
  def bpeEncodeWord(word: String,
      ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]]): java.util.ArrayList[String] =
    bpeEncodeWord(word, ranks, null)

  /** As above, with optional byte-level fallback: when `alphabet` is
    * non-null, a code point the fit never saw expands to sentencepiece
    * -style `<0xXX>` byte pieces BEFORE merging (byte pieces carry no
    * merges, so they pass through) — the no-unknown-symbol guarantee
    * of production tokenizers. `</w>` is appended after expansion and
    * is always known.
    */
  def bpeEncodeWord(word: String,
      ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]],
      alphabet: java.util.HashSet[String]): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String]()
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val s = new String(Character.toChars(cp))
      if (alphabet == null || alphabet.contains(s)) syms.add(s)
      else {
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var b = 0
        while (b < bytes.length) {
          syms.add(f"<0x${bytes(b) & 0xff}%02X>")
          b += 1
        }
      }
      i += Character.charCount(cp)
    }
    syms.add("</w>")
    var done = false
    while (!done && syms.size > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var j = 0
      while (j < syms.size - 1) {
        val inner = ranks.get(syms.get(j))
        if (inner != null) {
          val r = inner.get(syms.get(j + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestI = j
          }
        }
        j += 1
      }
      if (bestI < 0) done = true
      else {
        syms.set(bestI, syms.get(bestI) + syms.get(bestI + 1))
        syms.remove(bestI + 1)
      }
    }
    syms
  }

  /** BPE encode over a token array: per-token [[bpeEncodeWord]],
    * pieces concatenated in order. Null → empty array.
    */
  def bpeEncode(toks: ArrayData,
      ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]],
      alphabet: java.util.HashSet[String]): ArrayData = {
    if (toks == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[AnyRef](0))
    val out = new java.util.ArrayList[AnyRef]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val pieces = bpeEncodeWord(toks.getUTF8String(i).toString, ranks, alphabet)
      var j = 0
      while (j < pieces.size) {
        out.add(UTF8String.fromString(pieces.get(j)))
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)))
  }

  /** DSIR log importance-weight sum over a token array: every hashed
    * feature occurrence — each unigram and each adjacent-pair bigram
    * ("w1 w2"), hashed as md5("dsir:" + feature) into `numBuckets` —
    * adds its bucket's precomputed integer-scaled log-ratio
    * `round(ln(p_target(b)/p_raw(b)) · 1e6)`. Integer accumulation
    * keeps the score evaluation-order independent (see
    * [[bigramLogProbSum]]). Null/empty input → 0.
    */
  def dsirLogRatioSum(toks: ArrayData, logRatios: Array[Long],
      numBuckets: Int): Long = {
    if (toks == null) return 0L
    val md = md5Local.get()
    val n = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i).getBytes
      md.reset(); md.update(DsirPrefix); md.update(w)
      acc += logRatios(md5Bucket(md.digest(), numBuckets))
      if (i < n - 1) {
        val w2 = toks.getUTF8String(i + 1).getBytes
        md.reset(); md.update(DsirPrefix); md.update(w)
        md.update(' '.toByte); md.update(w2)
        acc += logRatios(md5Bucket(md.digest(), numBuckets))
      }
      i += 1
    }
    acc
  }

  /** Naive-Bayes log-odds sum over a token array: per-occurrence
    * lookup in the fitted per-token table, `oov` for tokens outside
    * the (possibly capped) vocabulary. Long accumulation of
    * integer-scaled entries — order-independent, so the per-document
    * score is bit-stable under any partitioning and restatable in
    * oracle SQL.
    */
  def tokenLogOddsSum(toks: ArrayData,
      logOdds: java.util.HashMap[UTF8String, java.lang.Long],
      oov: Long): Long = {
    if (toks == null) return 0L
    val n = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val lo = logOdds.get(toks.getUTF8String(i))
      acc += (if (lo == null) oov else lo.longValue())
      i += 1
    }
    acc
  }

  /** Fused int8 quantize + exact integer dot against a pre-quantized
    * query — one tight loop replacing the composed
    * `quantizedDot(quantize(vec), qQuant)` HOF pair (three
    * interpreted lambda evals per row on the q71/q73 candidate scan).
    * Quantization replicates the Column form op-for-op:
    * `round(cast(x as double) * 127.0 / max(|x|))` with Spark round
    * semantics (BigDecimal HALF_UP — `Math.floor(x+0.5)` differs on
    * doubles just under a half ulp). Null or zero-max vectors
    * quantize to zeros → dot 0. One DOCUMENTED deviation from the
    * composed form: a row vector whose length differs from the query
    * dots over the common prefix (min(m, q.length)) instead of
    * zip_with's null propagation — a truncated score ranks the row
    * low, where a null score would need null-ordering care in every
    * caller; same-dim embeddings (the contract) never hit either
    * path.
    */
  def quantizedDotQ(vec: ArrayData, q: Array[Long]): Long = {
    if (vec == null) return 0L
    val m = vec.numElements()
    var mx = 0.0
    var i = 0
    while (i < m) {
      val v = math.abs(vec.getFloat(i).toDouble)
      if (v > mx) mx = v
      i += 1
    }
    if (mx == 0.0) return 0L
    val n = math.min(m, q.length)
    var acc = 0L
    i = 0
    while (i < n) {
      acc += quantizeComponent(vec.getFloat(i).toDouble, mx) * q(i)
      i += 1
    }
    acc
  }

  /** One component of the symmetric int8 quantization — shared by the
    * kernel loop and the driver-side query quantization so the two
    * sides cannot drift. Non-finite scaled values (a NaN/Infinity
    * embedding component, or Inf/Inf when the max-abs itself is
    * infinite) quantize to 0 — mirroring Spark `round`'s
    * NaN/Infinite pass-through in the Column form, where the long
    * cast then yields 0 — so one corrupt row scores harmlessly
    * instead of throwing NumberFormatException out of
    * BigDecimal.valueOf and killing the scan.
    */
  @inline def quantizeComponent(x: Double, mx: Double): Long = {
    val scaled = x * 127.0 / mx
    if (!java.lang.Double.isFinite(scaled)) 0L
    else java.math.BigDecimal.valueOf(scaled)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }

  /** Similarity of a vector to its NEAREST centroid — the same
    * normalize + argmax-dot walk as [[nearestCentroid]], returning the
    * winning dot product instead of the index. Feeds the IVF centroid
    * drift metric (batch mean of `1 − sim` vs the fit-time value
    * persisted in the layout meta). NaN when no centroid matches the
    * dimension.
    */
  def nearestCentroidSim(a: ArrayData, centroids: Array[Array[Double]],
      elemFloat: Boolean): Double = {
    val n = a.numElements()
    @inline def elem(i: Int): Double =
      if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = elem(i); ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    val unit = new Array[Double](n)
    i = 0
    while (i < n) {
      unit(i) =
        if (nrm == 0.0) elem(i)
        else if (elemFloat) (elem(i) / nrm).toFloat.toDouble
        else elem(i) / nrm
      i += 1
    }
    var bestSim = Double.NaN
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length == n) {
        var sim = 0.0
        var j = 0
        while (j < n) { sim += unit(j) * cent(j); j += 1 }
        if (!(sim <= bestSim)) bestSim = sim // NaN-safe max
      }
      c += 1
    }
    bestSim
  }

  /** Product-quantization encode (Jégou et al. 2011): L2-normalize
    * the vector (same float-rounded normalize as [[nearestCentroid]]),
    * split it into `m` contiguous sub-vectors of `dsub` dims, and for
    * each sub-space emit the index of the L2-nearest codebook entry
    * (ties → lowest index). `codebooks` is the flattened (m·ksub) ×
    * dsub matrix, sub-space-major: rows [s·ksub, (s+1)·ksub) are
    * sub-space s's entries. Returns the m int codes — the 100 TB
    * memory answer for embedding search (m bytes instead of 4·dim) —
    * or null when the vector's dimension isn't m·dsub.
    */
  def pqEncode(a: ArrayData, codebooks: Array[Array[Double]], m: Int,
      dsub: Int, elemFloat: Boolean): ArrayData = {
    val n = a.numElements()
    if (n != m * dsub || codebooks.length % m != 0) return null
    val ksub = codebooks.length / m
    @inline def elem(i: Int): Double =
      if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = elem(i); ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    val unit = new Array[Double](n)
    i = 0
    while (i < n) {
      unit(i) =
        if (nrm == 0.0) elem(i)
        else if (elemFloat) (elem(i) / nrm).toFloat.toDouble
        else elem(i) / nrm
      i += 1
    }
    val codes = new Array[Any](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val cent = codebooks(s * ksub + c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = unit(s * dsub + j) - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance (ADC) dot product: the query stays full
    * precision as a per-sub-space lookup table (`lut` flattened
    * m·ksub, sub-space-major: lut[s·ksub + c] = ⟨query_s, codebook
    * entry c⟩) and each stored vector contributes only its m codes —
    * one table lookup per sub-space, no vector bytes touched. The
    * scoring half of [[pqEncode]].
    */
  def pqAdcDot(codes: ArrayData, lut: Array[Double], ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      val idx = s * ksub + c
      if (c >= 0 && c < ksub && idx < lut.length) acc += lut(idx)
      s += 1
    }
    acc
  }

  /** Viterbi segmentation of each pre-token under a unigram LM
    * (Kudo 2018, SentencePiece's unigram model): per word, the
    * max-log-probability split into vocabulary pieces via one
    * left-to-right DP over code points (transitions bounded by
    * `maxLen`). Deterministic tie-break: on equal score the LONGER
    * final piece wins (smaller split point). Code points outside the
    * vocabulary segment as single-character pieces at `unkLogProb` —
    * every word always segments (the no-unknown-symbol guarantee).
    * Output: the concatenated piece sequence across all words.
    */
  def unigramViterbi(words: ArrayData,
      pieces: java.util.HashMap[String, java.lang.Double], maxLen: Int,
      unkLogProb: Double): ArrayData = {
    if (words == null) return EmptyStringArray
    val out = new java.util.ArrayList[Any]()
    val nw = words.numElements()
    var w = 0
    while (w < nw) {
      val word = words.getUTF8String(w).toString
      // code-point boundaries
      val cps = new java.util.ArrayList[Integer]()
      var ci = 0
      while (ci < word.length) {
        cps.add(ci)
        ci += Character.charCount(word.codePointAt(ci))
      }
      cps.add(word.length)
      val n = cps.size() - 1
      if (n > 0) {
        val score = new Array[Double](n + 1)
        val back = new Array[Int](n + 1)
        java.util.Arrays.fill(score, Double.NegativeInfinity)
        score(0) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxLen)
          while (j < i) {
            if (score(j) > Double.NegativeInfinity) {
              val piece = word.substring(cps.get(j), cps.get(i))
              val lp = pieces.get(piece)
              val stepLp: Double =
                if (lp != null) lp.doubleValue()
                else if (i - j == 1) unkLogProb
                else Double.NegativeInfinity
              if (stepLp > Double.NegativeInfinity) {
                val cand = score(j) + stepLp
                // strict >: earlier (smaller) j wins ties → longer piece
                if (cand > score(i)) { score(i) = cand; back(i) = j }
              }
            }
            j += 1
          }
          i += 1
        }
        // reconstruct
        val rev = new java.util.ArrayList[String]()
        var pos = n
        while (pos > 0) {
          val j = back(pos)
          rev.add(word.substring(cps.get(j), cps.get(pos)))
          pos = j
        }
        var r = rev.size() - 1
        while (r >= 0) { out.add(UTF8String.fromString(rev.get(r))); r -= 1 }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Mojibake repair (the ftfy idea, reduced to its deterministic
    * core): text that went UTF-8 → bytes → wrongly decoded as
    * Windows-1252/Latin-1 shows the classic "Ã©" / "â€™" smell —
    * repair by re-encoding those code points as Windows-1252 bytes
    * and decoding them as UTF-8, accepting a round only when it (a)
    * decodes cleanly (every byte consumed, no replacement chars) and
    * (b) strictly reduces the mojibake-marker count — so clean text,
    * and text that legitimately contains "Ã", pass through untouched.
    * Up to `rounds` passes handle double-encoded input. Deterministic
    * and idempotent (a repaired string has no markers left to trip
    * on).
    */
  def fixMojibake(v: UTF8String, rounds: Int): UTF8String = {
    if (v == null) return null
    var s = v.toString
    var r = 0
    var changed = true
    while (r < rounds && changed) {
      changed = false
      val markers = mojibakeMarkers(s)
      if (markers > 0) {
        val bytes = toWindows1252Bytes(s)
        if (bytes != null) {
          val decoder = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          try {
            val out = decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
            if (mojibakeMarkers(out) < markers) { s = out; changed = true }
          } catch { case _: java.nio.charset.CharacterCodingException => () }
        }
      }
      r += 1
    }
    if (s.length == v.numChars() && s == v.toString) v
    else UTF8String.fromString(s)
  }

  /** Count of the tell-tale lead bytes of UTF-8-as-1252 text: Â Ã Ä Å
    * (C2–C5 leads) and â (E2 lead, the punctuation block). */
  private def mojibakeMarkers(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'Â' && c <= 'Å') || c == 'â') n += 1
      i += 1
    }
    n
  }

  /** Windows-1252 byte for each char, or null when any char has none
    * (true non-Latin text — not a candidate for this repair). */
  private def toWindows1252Bytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b: Int =
        if (c < 0x100) c.toInt // Latin-1 range maps to itself
        else Cp1252Reverse.getOrDefault(c, -1)
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    out
  }

  /** The 27 Windows-1252 codepage positions (0x80–0x9F) that differ
    * from Latin-1, reversed (char → byte). */
  private val Cp1252Reverse: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    val chars = "€‚ƒ„…†‡ˆ‰Š" +
      "‹ŒŽ‘’“”•–—˜" +
      "™š›œžŸ"
    val bytes = Array(0x80, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8A, 0x8B, 0x8C, 0x8E, 0x91, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97,
      0x98, 0x99, 0x9A, 0x9B, 0x9C, 0x9E, 0x9F)
    var i = 0
    while (i < chars.length) { m.put(chars.charAt(i), bytes(i)); i += 1 }
    m
  }

  /** Query parameters stripped by URL canonicalization: the
    * click-/campaign-tracking names (exact, lowercase) plus the whole
    * `utm_*` family. The standard crawl-curation front door (CCNet/C4
    * canonicalize URLs before per-domain aggregation and dedup).
    */
  private val TrackingParams = {
    val s = new java.util.HashSet[String]()
    Seq("gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref", "ref_src")
      .foreach(s.add)
    s
  }

  private def isTrackingParam(p: String): Boolean = {
    val eq = p.indexOf('=')
    val name = (if (eq >= 0) p.substring(0, eq) else p)
      .toLowerCase(java.util.Locale.ROOT)
    name.startsWith("utm_") || TrackingParams.contains(name)
  }

  /** Canonical URL form: scheme and host lowercased, default ports
    * dropped (http:80, https:443), empty path → "/", fragment
    * dropped, tracking params removed and the surviving query params
    * sorted (lexicographic on the whole `k=v` string, so equal-URL
    * detection is order-insensitive). Strings without a `://` pass
    * through trimmed-only (not an absolute URL — never invent
    * structure). Null → null (expression layer). Userinfo, when
    * present, is preserved case-sensitively; a non-numeric
    * port-looking suffix is treated as part of the host.
    */
  def canonicalUrl(v: UTF8String): UTF8String = {
    if (v == null) return null
    val s = v.toString.trim
    val si = s.indexOf("://")
    if (si <= 0) return UTF8String.fromString(s)
    val scheme = s.substring(0, si).toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(si + 3)
    var i = 0
    while (i < rest.length && rest.charAt(i) != '/' &&
      rest.charAt(i) != '?' && rest.charAt(i) != '#') i += 1
    val auth = rest.substring(0, i)
    val tail = rest.substring(i)
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    val hostport = auth.substring(at + 1)
    val ci = hostport.lastIndexOf(':')
    val portDigits = ci >= 0 && ci < hostport.length - 1 &&
      hostport.substring(ci + 1).forall(c => c >= '0' && c <= '9')
    val host = (if (portDigits) hostport.substring(0, ci) else hostport)
      .toLowerCase(java.util.Locale.ROOT)
    val port = if (portDigits) hostport.substring(ci + 1) else ""
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    val hi = tail.indexOf('#')
    val noFrag = if (hi >= 0) tail.substring(0, hi) else tail
    val qi = noFrag.indexOf('?')
    val path0 = if (qi >= 0) noFrag.substring(0, qi) else noFrag
    val path = if (path0.isEmpty) "/" else path0
    val query = if (qi >= 0) noFrag.substring(qi + 1) else ""
    val kept = query.split("&", -1)
      .filter(p => p.nonEmpty && !isTrackingParam(p)).sorted
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(userinfo).append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (kept.nonEmpty) sb.append('?').append(kept.mkString("&"))
    UTF8String.fromString(sb.toString)
  }

  /** Registrable-ish domain of a URL for per-domain curation: the
    * canonical (lowercased, port-stripped) host with ONE leading
    * `www.` label removed. True eTLD+1 extraction needs the public
    * suffix list; the www-strip covers the dominant alias without
    * shipping that table — subdomains otherwise aggregate separately,
    * which is the conservative direction for blocklists (suffix
    * matching handles them, see blocklist operators). No `://` → null
    * (not a URL).
    */
  def urlDomain(v: UTF8String): UTF8String = {
    if (v == null) return null
    val s = v.toString.trim
    val si = s.indexOf("://")
    if (si <= 0) return null
    val rest = s.substring(si + 3)
    var i = 0
    while (i < rest.length && rest.charAt(i) != '/' &&
      rest.charAt(i) != '?' && rest.charAt(i) != '#') i += 1
    val auth = rest.substring(0, i)
    val at = auth.lastIndexOf('@')
    val hostport = auth.substring(at + 1)
    val ci = hostport.lastIndexOf(':')
    val portDigits = ci >= 0 && ci < hostport.length - 1 &&
      hostport.substring(ci + 1).forall(c => c >= '0' && c <= '9')
    val host = (if (portDigits) hostport.substring(0, ci) else hostport)
      .toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(
      if (host.startsWith("www.")) host.substring(4) else host)
  }

  /** Positional w-token window fingerprints over a token-hash array —
    * the primitive behind exact substring dedup (the "remove
    * duplicated 50-token spans" pass of the training-data dedup
    * literature, Lee et al. 2021). Slot i fingerprints tokens
    * i..i+k-1 via a Rabin-Karp polynomial over the token hashes in
    * 2^64 arithmetic (odd multiplier, exact under wraparound), so the
    * whole array costs O(n) — one multiply-add in, one multiply-sub
    * out per slide — instead of O(n·k) per-window rehashing at k=50.
    * Equality of fingerprints ⇔ equality of the token-hash windows
    * (collisions are the usual 2^-64-per-pair hash caveat; inputs are
    * already xxhash64-mixed). Fewer than k tokens → empty array (a
    * window must be a full k-token span — unlike [[shingleHashes]]'s
    * short-doc fallback, a short document simply has no w-windows).
    */
  def rollingWindowHashes(arr: ArrayData, k: Int): ArrayData = {
    if (arr == null) return EmptyLongArray
    val n = arr.numElements()
    if (n < k) return EmptyLongArray
    val B = 0x9E3779B97F4A7C15L // odd ⇒ invertible mod 2^64
    var bk = 1L // B^(k-1)
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + arr.getLong(i); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - k) {
      h = (h - arr.getLong(p - 1) * bk) * B + arr.getLong(p + k - 1)
      out(p) = h
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Space-joined word n-grams over a token array — the fused form of
    * `transform(sequence(1, m-n+1), i => concat_ws(" ", slice(tk,i,n)))`,
    * whose `transform` wrapper is an interpreted HOF (per-element
    * lambda eval) on the decontamination / PMI / DSIR-feature scan
    * path. Fewer than `n` tokens → empty array (a gram must be a full
    * n-token span). Byte-identical output to the composed form.
    */
  def wordNgrams(arr: ArrayData, n: Int): ArrayData = {
    if (arr == null) return EmptyStringArray
    val m = arr.numElements()
    if (m < n) return EmptyStringArray
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      if (n == 1) out(i) = arr.getUTF8String(i)
      else {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** GPT-2's pre-tokenization regex (Radford et al. 2019, released in
    * the public gpt-2 repo): contractions split off, letter runs,
    * number runs, punctuation runs — each optionally carrying ONE
    * leading space — and residual whitespace. Case- and
    * space-preserving, unlike the whitespace tokenizer.
    */
  // UNICODE_CHARACTER_CLASS so \s means Unicode White_Space (the GPT-2
  // reference regex is a Unicode-aware `\s`): without it Java's \s is
  // ASCII-only and NBSP-family spaces fall into the punctuation
  // alternative `' ?[^\s\p{L}\p{N}]+'` instead of the whitespace runs.
  private val Gpt2Pattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** The Unicode White_Space property, matching the pattern's \s under
    * UNICODE_CHARACTER_CLASS. `Character.isWhitespace` alone excludes
    * the non-breaking members (U+00A0, U+2007, U+202F — isSpaceChar
    * covers those) and NEL (U+0085, neither predicate).
    */
  @inline private def isUnicodeWhitespace(ch: Char): Boolean =
    Character.isWhitespace(ch) || Character.isSpaceChar(ch) || ch == '\u0085'

  /** GPT-2-style pre-tokenization of raw text: regex match stream,
    * pure-whitespace matches dropped (they carry no mergeable
    * content; the `" ?"` prefixes keep word-leading spaces). Null →
    * empty array.
    */
  def gpt2PreTokenize(v: UTF8String): ArrayData = {
    if (v == null) return EmptyStringArray
    val s = v.toString
    if (s.isEmpty) return EmptyStringArray
    val m = Gpt2Pattern.matcher(s)
    val out = new java.util.ArrayList[AnyRef]()
    while (m.find()) {
      val piece = m.group()
      if (!piece.forall(isUnicodeWhitespace))
        out.add(UTF8String.fromString(piece))
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative coordinates: bit i of `a` lands at output position
    * 2i, bit i of `b` at 2i+1. Sorting by the result orders rows along
    * the Z-curve, which keeps rows close in BOTH dimensions inside the
    * same output file — the standard multi-column data-skipping layout
    * (each parquet file's min/max footer stats cover a tight rectangle
    * instead of a full-width stripe). Coordinates outside [0, 2^bits-1]
    * clamp to the nearest edge cell (callers pre-scale; clamping keeps
    * out-of-range stragglers ordered instead of wrapping them across
    * the curve); `bits ≤ 31` keeps the result non-negative in a long.
    */
  def interleaveBits(a: Long, b: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val x = if (a < 0L) 0L else if (a > mask) mask else a
    val y = if (b < 0L) 0L else if (b > mask) mask else b
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Drop the elements of a string array that are members of `set` —
    * O(1) hash membership per element, vs `array_contains`'s linear
    * scan over the set (O(|set|) per element; at lineDedup's 100k-line
    * broadcast cap that is 10^5 comparisons per document line).
    * UTF8String hashing is zero-copy against the array's backing
    * bytes. Null array → null; null elements are kept.
    */
  def filterNotInSet(arr: ArrayData,
      set: java.util.HashSet[UTF8String]): ArrayData = {
    if (arr == null) return null
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s == null || !set.contains(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Dense matrix–vector product against a plan-shipped row-major
    * matrix: out(r) = Σ_j mat(r)(j)·x(j) — the orthogonal-rotation
    * kernel of the OPQ path (rotate each vector before PQ encoding,
    * map-only). Null for a dimension mismatch (the caller's null
    * case, like DotProduct's).
    */
  def matVec(arr: ArrayData, mat: Array[Array[Double]],
      isFloat: Boolean): ArrayData = {
    if (arr == null) return null
    val dim = mat(0).length
    if (arr.numElements() != dim) return null
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      x(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val out = new Array[Any](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      var acc = 0.0
      var k = 0
      while (k < dim) { acc += row(k) * x(k); k += 1 }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Count of array elements present in the set — the membership twin
    * of [[filterNotInSet]] (dirty-word page gates want the HIT COUNT
    * for reporting, not the survivors). Null array → 0.
    */
  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    if (arr == null) return 0
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null && set.contains(s)) hits += 1
      i += 1
    }
    hits
  }

  /** Remove token spans from the ORIGINAL text — the surgery kernel
    * behind [[graft.operators.Dedup.cutSpans]] (the cut step of Lee
    * et al.'s ExactSubstr dedup, arXiv:2107.06499 §4.2: duplicated
    * token ranges come from [[graft.operators.Dedup.duplicatedSpans]]
    * as indices into the lowercased token sequence; this maps them
    * back to ORIGINAL character offsets and cuts there).
    *
    * Offset recovery is exact by construction: [[tokenize]] is
    * `trim + split("\\s+")`, so token i's original characters are the
    * i-th maximal run of non-`\s` characters inside the trim region
    * (trim strips chars ≤ U+0020 at both ends; `\s` is the ASCII
    * class `[ \t\n\x0B\f\r]` — both replicated here verbatim, NOT
    * `Character.isWhitespace`, which would split on Unicode spaces
    * the tokenizer keeps inside tokens). Lowercasing only changes
    * hash values, never boundaries.
    *
    * Byte-exact output rule (DedupSpec pins it): kept tokens are
    * emitted in order; between two kept tokens that were ADJACENT in
    * the input their original inter-token whitespace is preserved
    * byte-for-byte; across a cut a single space joins the sides;
    * leading/trailing trim-region bytes are dropped. `spans` is an
    * array of (span_begin, span_end) token structs — half-open,
    * clamped, overlap-tolerant; null/empty spans return the input
    * unchanged.
    */
  def cutTokenSpans(v: UTF8String, spans: ArrayData): UTF8String = {
    if (v == null) return null
    if (spans == null || spans.numElements() == 0) return v
    val s = v.toString
    // trim region exactly like String.trim
    var lo = 0
    while (lo < s.length && s.charAt(lo) <= ' ') lo += 1
    var hi = s.length
    while (hi > lo && s.charAt(hi - 1) <= ' ') hi -= 1
    @inline def isWs(c: Char): Boolean = c == ' ' || (c >= '\t' && c <= '\r')
    // token char ranges: maximal non-\s runs inside [lo, hi)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = lo
    while (i < hi) {
      if (!isWs(s.charAt(i))) {
        val a = i
        while (i < hi && !isWs(s.charAt(i))) i += 1
        starts.add(a); ends.add(i)
      } else i += 1
    }
    val n = starts.size()
    if (n == 0) return v
    val drop = new Array[Boolean](n)
    var k = 0
    while (k < spans.numElements()) {
      val row = spans.getStruct(k, 2)
      var b = math.max(0L, row.getLong(0)).toInt
      val e = math.min(n.toLong, row.getLong(1)).toInt
      while (b < e) { drop(b) = true; b += 1 }
      k += 1
    }
    val sb = new java.lang.StringBuilder(s.length)
    var prevKept = -1
    var t = 0
    while (t < n) {
      if (!drop(t)) {
        if (prevKept >= 0) {
          if (prevKept == t - 1) sb.append(s, ends.get(prevKept), starts.get(t))
          else sb.append(' ')
        }
        sb.append(s, starts.get(t).intValue(), ends.get(t).intValue())
        prevKept = t
      }
      t += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
