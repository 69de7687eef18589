package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot loops that higher-order
  * functions evaluate interpreted (lambda-per-element): these run as
  * tight JVM loops per row instead. Preference order per the Spark
  * guide: compose built-ins → custom Expression → custom plan →
  * mapPartitions; these are stage (b).
  */
object CatalystExpressions {

  /** splitmix64 — a standard, public-domain 64-bit mixer (Steele et
    * al., "Fast Splittable Pseudorandom Number Generators", OOPSLA'14).
    * Used to derive the k MinHash permutations from one base hash.
    */
  @inline private[graft] def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 64-bit SimHash over an array of token hashes: per-bit majority
    * vote, packed to a long. Empty/null input → 0.
    */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = {
      val arr = child.eval(input)
      if (arr == null) return 0L
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n == 0) return 0L
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = a.getLong(i)
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
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** MinHash signature over an array of shingle hashes: for seed i,
    * slot i = min over shingles of splitmix64(base ^ seed_i). Empty or
    * null input → all Long.MaxValue (never collides with real content).
    */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = {
      val out = Array.fill(numHashes)(Long.MaxValue)
      val arr = child.eval(input)
      if (arr != null) {
        val a = arr.asInstanceOf[ArrayData]
        val n = a.numElements()
        var i = 0
        while (i < n) {
          val base = a.getLong(i)
          var k = 0
          while (k < numHashes) {
            val h = splitmix64(base ^ (k.toLong * 0xA24BAED4963EE407L))
            if (h < out(k)) out(k) = h
            k += 1
          }
          i += 1
        }
      }
      new GenericArrayData(out.map(Long.box))
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)
  }

  /** Canonical JSON: parse a JSON string and re-serialize with
    * recursively sorted object keys and compact separators — the
    * fingerprint canonicalization of the reference
    * (`json.dumps(sort_keys=True)`, `event_loop_node.py:1895-1899`).
    * Spark's `to_json` preserves field order, so this needs a custom
    * expression (SURVEY §4 custom-work item 4). Invalid JSON → null
    * (callers treat null as "not comparable", matching
    * parse-or-passthrough at `event_loop_node.py:2003-2009`).
    */
  /** Unicode NFC normalization (canonical composition): combining
    * sequences fold to their precomposed forms ("e"+U+0301 → "é"), so
    * fingerprints, dedup joins, and tokenization see ONE byte form per
    * canonically-equal string — web text mixes both forms freely, and
    * without this an exact-dedup pass silently treats them as distinct
    * documents. JDK `java.text.Normalizer` implements the Unicode
    * standard, matching utf8proc-based engines on canonical forms.
    * Map-only, row-local.
    */
  case class NormalizeNfc(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val out =
        if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
        else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      UTF8String.fromString(out)
    }
    override protected def withNewChildInternal(c: Expression): NormalizeNfc = copy(c)
  }

  case class CanonicalJson(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    @transient private lazy val mapper = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.configure(
        com.fasterxml.jackson.databind.SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
      m
    }
    private def canon(node: com.fasterxml.jackson.databind.JsonNode):
        com.fasterxml.jackson.databind.JsonNode = node match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode =>
        val sorted = mapper.createObjectNode()
        val names = scala.collection.mutable.ArrayBuffer.empty[String]
        val it = o.fieldNames()
        while (it.hasNext) names += it.next()
        names.sorted.foreach { n => sorted.set[com.fasterxml.jackson.databind.JsonNode](n, canon(o.get(n))); () }
        sorted
      case a: com.fasterxml.jackson.databind.node.ArrayNode =>
        val out = mapper.createArrayNode()
        (0 until a.size()).foreach { i => out.add(canon(a.get(i))); () }
        out
      case other => other
    }
    override def nullSafeEval(v: Any): Any =
      try {
        val parsed = mapper.readTree(v.asInstanceOf[UTF8String].toString)
        UTF8String.fromString(mapper.writeValueAsString(canon(parsed)))
      } catch { case _: Exception => null }
    override protected def withNewChildInternal(c: Expression): CanonicalJson = copy(c)
  }

  /** Stopword-profile language ID over a token array: counts profile
    * hits per language in one pass (zero-copy UTF8String set lookups)
    * and returns the argmax language, "und" when nothing matches.
    * Ties → first profile in declaration order. The tight-loop form of
    * [[TextFunctions.langIdHeuristic]].
    */
  case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    @transient private lazy val langs: Array[UTF8String] =
      profiles.map(p => UTF8String.fromString(p._1)).toArray
    @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
      profiles.map { case (_, words) =>
        val s = new java.util.HashSet[UTF8String](words.size * 2)
        words.foreach(w => s.add(UTF8String.fromString(w)))
        s
      }.toArray
    @transient private lazy val und = UTF8String.fromString("und")
    override def eval(input: InternalRow): Any = {
      val arr = child.eval(input)
      if (arr == null) return und
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      val counts = new Array[Int](sets.length)
      var i = 0
      while (i < n) {
        val tok = a.getUTF8String(i)
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
    override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(c)
  }

  /** Whitespace tokenizer: lowercase(trim(text)) split on whitespace
    * runs, empties dropped — one pass over the bytes per row instead
    * of the interpreted `filter(split(...))` lambda chain (the hot
    * first step of every text operator).
    */
  case class Tokenize(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericArrayData(Array.empty[Any])
      val s = v.asInstanceOf[UTF8String].toString.trim
      if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
      val parts = ws.split(s)
      val out = new Array[Any](parts.length)
      var i = 0
      while (i < parts.length) {
        out(i) = UTF8String.fromString(parts(i).toLowerCase(java.util.Locale.ROOT))
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Tokenize = copy(c)
  }

  /** Distinct k-shingle hashes from an array of token hashes: slot i
    * combines hashes i..i+k-1 with a splitmix chain (shingle identity
    * by hash, no string rebuilding — the interpreted
    * slice+concat_ws-per-shingle formulation dominated the dedup
    * pipeline). Fewer than k tokens → one shingle of all tokens.
    */
  case class ShingleHashes(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = {
      val arr = child.eval(input)
      if (arr == null) return new GenericArrayData(Array.empty[Any])
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      if (n < k) {
        var h = 0x51ED270B9A3F46DAL
        var i = 0
        while (i < n) { h = splitmix64(h ^ a.getLong(i)); i += 1 }
        out.add(h)
      } else {
        var i = 0
        while (i + k <= n) {
          var h = 0x51ED270B9A3F46DAL
          var j = i
          while (j < i + k) { h = splitmix64(h ^ a.getLong(j)); j += 1 }
          out.add(h)
          i += 1
        }
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(c)
  }

  /** Dot product of two numeric arrays (float or double elements),
    * accumulated left-to-right in double — bit-identical to the
    * sequential `aggregate(zip_with(...))` formulation it replaces,
    * but a tight JVM loop instead of interpreted lambdas (the hot
    * inner op of every similarity/near-dup pass). Null input or
    * length mismatch → null.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    private def elemIsFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      val af = elemIsFloat(left)
      val bf = elemIsFloat(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(l, r)
  }

  /** Argmax-similarity cluster assignment against a fixed centroid
    * matrix: one expression, one tight loop — replaces the per-centroid
    * `least(struct(negsim, i), …)` ladder whose O(k) expression tree
    * blows up analysis/codegen at k ≥ a few hundred (IVF wants
    * k = 256–4096). The matrix rides inside the expression; Spark
    * broadcasts the serialized task binary once per stage, so a
    * k=4096 × dim=64 matrix (~2 MB) ships once per executor, not per
    * row or per task.
    *
    * Semantics replicate the ladder exactly: the input vector is
    * L2-normalized with each element rounded back to FLOAT (matching
    * [[VectorFunctions.l2Normalize]]'s cast, so assignments are
    * bit-identical to the composed-Column formulation), similarity is
    * the double-accumulated dot product, ties resolve to the lowest
    * cluster index. Null input → null; a centroid of mismatched
    * dimension never wins (dot against it is undefined — the ladder's
    * null-struct edge case that real same-dim embeddings never hit).
    */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    private lazy val elemFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      @inline def elem(i: Int): Double =
        if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i)
      var ss = 0.0
      var i = 0
      while (i < n) { val x = elem(i); ss += x * x; i += 1 }
      val nrm = math.sqrt(ss)
      // normalized vector materialized ONCE, float-rounded like
      // l2Normalize (zero-norm vectors pass through unnormalized, also
      // like l2Normalize) — inside the centroid loop the division and
      // ArrayData accessor would otherwise run k× per element
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
      if (best < 0) null else best
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(c)
  }

  // ------------------------------------------------------- Column API

  import org.apache.spark.sql.graft.bridge.{columnOf => column, expressionOf => expression}

  def simhash64(tokenHashes: Column): Column = column(SimHash64(expression(tokenHashes)))

  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    column(MinHashSig(expression(shingleHashes), numHashes))

  def canonicalJson(jsonStr: Column): Column = column(CanonicalJson(expression(jsonStr)))

  def normalizeNfc(text: Column): Column = column(NormalizeNfc(expression(text)))

  def langId(tokens: Column, profiles: Seq[(String, Seq[String])]): Column =
    column(LangIdExpr(expression(tokens), profiles))

  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def tokenize(text: Column): Column = column(Tokenize(expression(text)))

  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    column(NearestCentroid(expression(vec), centroids))

  def shingleHashes(tokenHashes: Column, k: Int): Column =
    column(ShingleHashes(expression(tokenHashes), k))
}
