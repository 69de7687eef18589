package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot loops that higher-order
  * functions evaluate interpreted (lambda-per-element): these run as
  * tight JVM loops per row instead. Preference order per the Spark
  * guide: compose built-ins → custom Expression → custom plan →
  * mapPartitions; these are stage (b).
  *
  * Every expression implements REAL `doGenCode` — the generated code
  * is a static call into [[ExprKernels]], so the surrounding
  * whole-stage-codegen region stays fused (a `CodegenFallback` here
  * would interpret the whole child subtree per row with boxing, and
  * these sit on the 100 TB signature-scan path). `eval` delegates to
  * the SAME kernel, so the interpreted and generated paths cannot
  * drift.
  */
object CatalystExpressions {

  /** Fully-qualified call target for generated code: a top-level Scala
    * object with no companion class compiles with Java static
    * forwarders, so janino calls these kernels like plain statics.
    */
  private val K = "graft.functions.ExprKernels"

  @inline private[graft] def splitmix64(x0: Long): Long = ExprKernels.splitmix64(x0)

  /** 64-bit SimHash over an array of token hashes: per-bit majority
    * vote, packed to a long. Empty/null input → 0.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.simhash64(child.eval(input).asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final long ${ev.value} = ${c.isNull} ? 0L : $K.simhash64(${c.value});""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** MinHash signature over an array of shingle hashes: for seed i,
    * slot i = min over shingles of splitmix64(base ^ seed_i). Empty or
    * null input → all Long.MaxValue (never collides with real content).
    */
  case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.minhashSig(child.eval(input).asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final ArrayData ${ev.value} =
            $K.minhashSig(${c.isNull} ? null : ${c.value}, $numHashes);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)
  }

  /** Unicode NFC normalization (canonical composition): combining
    * sequences fold to their precomposed forms ("e"+U+0301 → "é"), so
    * fingerprints, dedup joins, and tokenization see ONE byte form per
    * canonically-equal string — web text mixes both forms freely, and
    * without this an exact-dedup pass silently treats them as distinct
    * documents. JDK `java.text.Normalizer` implements the Unicode
    * standard, matching utf8proc-based engines on canonical forms.
    * Map-only, row-local.
    */
  /** Mojibake repair ([[ExprKernels.fixMojibake]], the ftfy idea):
    * UTF-8-decoded-as-Windows-1252 text re-decoded correctly; clean
    * text passes through untouched.
    */
  case class FixMojibake(child: Expression, rounds: Int)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      ExprKernels.fixMojibake(v.asInstanceOf[UTF8String], rounds)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.fixMojibake($c, $rounds)")
    override protected def withNewChildInternal(c: Expression): FixMojibake = copy(c)
  }

  case class NormalizeNfc(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      ExprKernels.normalizeNfc(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.normalizeNfc($c)")
    override protected def withNewChildInternal(c: Expression): NormalizeNfc = copy(c)
  }

  /** Token-span surgery over the ORIGINAL text ([[ExprKernels
    * .cutTokenSpans]] — the ExactSubstr cut step): remove the token
    * ranges named by `spans` (array of (span_begin, span_end) structs
    * from [[graft.operators.Dedup.duplicatedSpans]]) with exact
    * original-offset recovery. A null SPANS side passes the text
    * through unchanged (the left-join "nothing to cut" case) — only
    * null text is null, so this needs hand-rolled null plumbing
    * instead of nullSafeEval.
    */
  case class CutTokenSpans(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = left.nullable
    override def eval(input: InternalRow): Any = {
      val t = left.eval(input)
      if (t == null) null
      else ExprKernels.cutTokenSpans(t.asInstanceOf[UTF8String],
        right.eval(input).asInstanceOf[ArrayData])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val l = left.genCode(ctx)
      val r = right.genCode(ctx)
      ev.copy(code = code"""
        ${l.code}
        ${r.code}
        final boolean ${ev.isNull} = ${l.isNull};
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          ${ev.isNull} ? null :
            $K.cutTokenSpans(${l.value}, ${r.isNull} ? null : ${r.value});""")
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): CutTokenSpans = copy(l, r)
  }

  /** Deflate compression ratio of a string's UTF-8 bytes
    * (compressed/raw, level 6) — the RedPajama/Gopher-family quality
    * signal that flags templated or repetitive text no token-level
    * ratio catches: heavy boilerplate compresses far below prose
    * (~0.3 vs ~0.6+). Deterministic for a fixed zlib level on the
    * JVM's Deflater; empty strings report 1.0 (nothing to judge).
    */
  case class DeflateRatio(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any =
      ExprKernels.deflateRatio(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.deflateRatio($c)")
    override protected def withNewChildInternal(c: Expression): DeflateRatio = copy(c)
  }

  /** Canonical JSON: parse a JSON string and re-serialize with
    * recursively sorted object keys and compact separators — the
    * fingerprint canonicalization of the reference
    * (`json.dumps(sort_keys=True)`, `event_loop_node.py:1895-1899`).
    * Spark's `to_json` preserves field order, so this needs a custom
    * expression (SURVEY §4 custom-work item 4). Invalid JSON → null
    * (callers treat null as "not comparable", matching
    * parse-or-passthrough at `event_loop_node.py:2003-2009`) — hence
    * `nullable` is unconditionally true, independent of the child.
    */
  case class CanonicalJson(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any =
      ExprKernels.canonicalJson(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $K.canonicalJson($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    override protected def withNewChildInternal(c: Expression): CanonicalJson = copy(c)
  }

  /** Stopword-profile language ID over a token array: counts profile
    * hits per language in one pass (zero-copy UTF8String set lookups)
    * and returns the argmax language, "und" when nothing matches.
    * Ties → first profile in declaration order. The tight-loop form of
    * [[TextFunctions.langIdHeuristic]].
    */
  case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
      extends UnaryExpression {
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
    override def eval(input: InternalRow): Any =
      ExprKernels.langId(child.eval(input).asInstanceOf[ArrayData], langs, sets)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val langsRef = ctx.addReferenceObj("langs", langs, "UTF8String[]")
      val setsRef = ctx.addReferenceObj("sets", sets, "java.util.HashSet[]")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final UTF8String ${ev.value} =
            $K.langId(${c.isNull} ? null : ${c.value}, $langsRef, $setsRef);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(c)
  }

  /** Whitespace tokenizer: lowercase(trim(text)) split on whitespace
    * runs, empties dropped — one pass over the bytes per row instead
    * of the interpreted `filter(split(...))` lambda chain (the hot
    * first step of every text operator).
    */
  case class Tokenize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.tokenize(child.eval(input).asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final ArrayData ${ev.value} =
            $K.tokenize(${c.isNull} ? null : ${c.value});""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): Tokenize = copy(c)
  }

  /** Tokenize + per-token xxhash64 fused into one kernel — replaces
    * `transform(tokens(text), t => xxhash64(t))`, whose `transform`
    * wrapper is a CodegenFallback HOF that forced the whole signature
    * projection back to interpreted eval even after [[Tokenize]]
    * gained codegen. Values are bit-identical to the composed
    * formulation (same `XxHash64Function`, seed 42). Null → empty
    * array.
    */
  case class TokenHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.tokenHashes(child.eval(input).asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final ArrayData ${ev.value} =
            $K.tokenHashes(${c.isNull} ? null : ${c.value});""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): TokenHashes = copy(c)
  }

  /** Order-sensitive rolling token fingerprint — the fused form of
    * `aggregate(tokens(text), lit(init), (acc, t) => xxhash64(acc, t))`
    * (interpreted-HOF fold). Chain semantics identical (see
    * [[ExprKernels.rollingFingerprint]]). Null/empty → `init`.
    */
  case class RollingFingerprint(child: Expression, init: Long) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.rollingFingerprint(child.eval(input).asInstanceOf[UTF8String], init)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final long ${ev.value} =
            $K.rollingFingerprint(${c.isNull} ? null : ${c.value}, ${init}L);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(c)
  }

  /** Distinct k-shingle hashes from an array of token hashes: slot i
    * combines hashes i..i+k-1 with a splitmix chain (shingle identity
    * by hash, no string rebuilding — the interpreted
    * slice+concat_ws-per-shingle formulation dominated the dedup
    * pipeline). Fewer than k tokens → one shingle of all tokens.
    */
  case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.shingleHashes(child.eval(input).asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final ArrayData ${ev.value} =
            $K.shingleHashes(${c.isNull} ? null : ${c.value}, $k);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(c)
  }

  /** Canonical URL form ([[ExprKernels.canonicalUrl]]): lowercased
    * scheme/host, default ports and fragments dropped, tracking
    * params removed, surviving params sorted. Null → null; non-URL
    * strings pass through trimmed.
    */
  case class CanonicalUrl(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any =
      ExprKernels.canonicalUrl(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $K.canonicalUrl($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    override protected def withNewChildInternal(c: Expression): CanonicalUrl = copy(c)
  }

  /** Per-domain curation key ([[ExprKernels.urlDomain]]): canonical
    * host with one leading `www.` stripped; null for non-URLs.
    */
  case class UrlDomain(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any =
      ExprKernels.urlDomain(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $K.urlDomain($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    override protected def withNewChildInternal(c: Expression): UrlDomain = copy(c)
  }

  /** Positional w-token window fingerprints from an array of token
    * hashes (Rabin-Karp rolling polynomial, O(n) per document — see
    * [[ExprKernels.rollingWindowHashes]]). Slot i = fingerprint of
    * tokens i..i+k-1; fewer than k tokens → empty array. The exact
    * substring dedup primitive: posexplode gives (pos, fingerprint)
    * rows whose equality means equality of the k-token windows.
    */
  case class WindowFingerprints(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.rollingWindowHashes(child.eval(input).asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final ArrayData ${ev.value} =
            $K.rollingWindowHashes(${c.isNull} ? null : ${c.value}, $k);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): WindowFingerprints = copy(c)
  }

  /** Dot product of two numeric arrays (float or double elements),
    * accumulated left-to-right in double — bit-identical to the
    * sequential `aggregate(zip_with(...))` formulation it replaces,
    * but a tight JVM loop instead of interpreted lambdas (the hot
    * inner op of every similarity/near-dup pass). Null input or
    * length mismatch → null (so `nullable` is unconditionally true).
    */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    private def elemIsFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) null
      else ExprKernels.dotProduct(a, b, elemIsFloat(left), elemIsFloat(right))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val af = elemIsFloat(left)
      val bf = elemIsFloat(right)
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
        else { ${ev.value} = $K.dotProduct($a, $b, $af, $bf); }""")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(l, r)
  }

  /** Exact set Jaccard of two long-array shingle sets
    * ([[ExprKernels.setJaccard]]) — semantics identical to
    * `when(size(array_union(a,b))===0, 1.0)
    *  .otherwise(size(array_intersect(a,b))/size(array_union(a,b)))`
    * but one primitive-long pass per side instead of two boxed
    * generic-array walks (intersect + union each rebuild a hash set);
    * the LSH-verification hot loop.
    */
  case class SetJaccard(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    // null ELEMENTS are one distinct set member per side, exactly
    // array_intersect/array_union's treatment (the kernel handles
    // them; a parquet round trip of the durable index relaxes the
    // signature arrays to containsNull=true)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(e: Expression): Boolean = e.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"setJaccard requires array<bigint> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override def nullSafeEval(l: Any, r: Any): Any =
      ExprKernels.setJaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = $K.setJaccard($a, $b);""")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SetJaccard =
      copy(l, r)
  }

  /** Dense matrix–vector product against a fixed row-major matrix
    * ([[ExprKernels.matVec]]): the OPQ rotation applied per row as a
    * map-only codegen'd projection; the matrix rides inside the
    * expression like [[NearestCentroid]]'s centroids (ships once per
    * executor with the task binary, never per row). Null on dimension
    * mismatch.
    */
  case class MatVec(child: Expression, mat: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    private def elemIsFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(v: Any): Any =
      ExprKernels.matVec(v.asInstanceOf[ArrayData], mat, elemIsFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
      val f = elemIsFloat
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $K.matVec($c, $matRef, $f);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    }
    override protected def withNewChildInternal(c: Expression): MatVec = copy(c)
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
    * null-struct edge case that real same-dim embeddings never hit) —
    * so `nullable` is unconditionally true.
    */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    private lazy val elemFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(v: Any): Any = {
      val best = ExprKernels.nearestCentroid(v.asInstanceOf[ArrayData], centroids, elemFloat)
      if (best < 0) null else best
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, c => {
        val best = ctx.freshName("bestCluster")
        s"""
        final int $best = $K.nearestCentroid($c, $centRef, $elemFloat);
        if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }"""
      })
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(c)
  }

  /** Similarity (dot after the same float-rounded normalize) of a
    * vector to its nearest centroid — [[NearestCentroid]]'s winning
    * score instead of its index; null when no centroid matches the
    * dimension. Feeds the IVF drift metric.
    */
  /** Unigram-LM Viterbi encode over a pre-token array
    * ([[ExprKernels.unigramViterbi]]): the fitted (piece → log-prob)
    * table rides the expression as a reference HashMap, like every
    * other fitted model here.
    */
  case class UnigramEncode(child: Expression, pieces: Seq[(String, Double)],
      maxLen: Int, unkLogProb: Double) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    @transient private lazy val table = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
      pieces.foreach { case (p, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
      m
    }
    override def eval(input: InternalRow): Any =
      ExprKernels.unigramViterbi(
        child.eval(input).asInstanceOf[ArrayData], table, maxLen, unkLogProb)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("unigramTable", table, "java.util.HashMap")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final ArrayData ${ev.value} =
            $K.unigramViterbi(${c.isNull} ? null : ${c.value}, $tableRef, $maxLen,
              ${unkLogProb}D);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): UnigramEncode = copy(c)
  }

  /** Product-quantization encode against a fixed flattened codebook
    * matrix ([[ExprKernels.pqEncode]]): vector → m int codes. The
    * codebooks ride the expression as a task-binary reference object,
    * exactly like [[NearestCentroid]]'s matrix.
    */
  case class PqEncode(child: Expression, codebooks: Array[Array[Double]],
      m: Int, dsub: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    private lazy val elemFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(v: Any): Any =
      ExprKernels.pqEncode(v.asInstanceOf[ArrayData], codebooks, m, dsub, elemFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][]")
      nullSafeCodeGen(ctx, ev, c => {
        val codes = ctx.freshName("pqCodes")
        s"""
        final org.apache.spark.sql.catalyst.util.ArrayData $codes =
          $K.pqEncode($c, $cbRef, $m, $dsub, $elemFloat);
        if ($codes == null) { ${ev.isNull} = true; } else { ${ev.value} = $codes; }"""
      })
    }
    override protected def withNewChildInternal(c: Expression): PqEncode = copy(c)
  }

  /** ADC scoring over stored PQ codes ([[ExprKernels.pqAdcDot]]): the
    * query's per-sub-space lookup table is the reference object; each
    * row contributes only its m codes.
    */
  case class PqAdcDot(child: Expression, lut: Array[Double], ksub: Int)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(v: Any): Any =
      ExprKernels.pqAdcDot(v.asInstanceOf[ArrayData], lut, ksub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $K.pqAdcDot($c, $lutRef, $ksub);")
    }
    override protected def withNewChildInternal(c: Expression): PqAdcDot = copy(c)
  }

  case class NearestCentroidSim(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    private lazy val elemFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(v: Any): Any = {
      val sim = ExprKernels.nearestCentroidSim(v.asInstanceOf[ArrayData], centroids, elemFloat)
      if (java.lang.Double.isNaN(sim)) null else sim
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, c => {
        val sim = ctx.freshName("bestSim")
        s"""
        final double $sim = $K.nearestCentroidSim($c, $centRef, $elemFloat);
        if (Double.isNaN($sim)) { ${ev.isNull} = true; } else { ${ev.value} = $sim; }"""
      })
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroidSim = copy(c)
  }

  /** Integer-scaled bigram-LM log-probability sum over a token array
    * (the scoring half of a CCNet-style perplexity filter). The fitted
    * model — unigram counts, bigram counts, vocabulary size — rides
    * inside the expression like [[NearestCentroid]]'s matrix: Spark
    * ships the serialized task binary once per executor, so a capped
    * model (top-K bigrams) costs one broadcast, and scoring a 100 TB
    * corpus is a map-only projection with ZERO shuffles. Maps are
    * rebuilt as UTF8String hash maps lazily per executor (zero-copy
    * token lookups against the array's UTF8Strings).
    */
  case class BigramLogProbSum(child: Expression, uni: Map[String, Long],
      big: Map[(String, String), Long], vocabSize: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    @transient private lazy val uniMap: java.util.HashMap[UTF8String, java.lang.Long] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](uni.size * 2)
      uni.foreach { case (w, c) => m.put(UTF8String.fromString(w), c) }
      m
    }
    @transient private lazy val bigMap:
        java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]] = {
      val m = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]()
      big.foreach { case ((w1, w2), c) =>
        m.computeIfAbsent(UTF8String.fromString(w1),
          _ => new java.util.HashMap[UTF8String, java.lang.Long]())
          .put(UTF8String.fromString(w2), c)
      }
      m
    }
    override def eval(input: InternalRow): Any =
      ExprKernels.bigramLogProbSum(
        child.eval(input).asInstanceOf[ArrayData], uniMap, bigMap, vocabSize)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val uniRef = ctx.addReferenceObj("uni", uniMap, "java.util.HashMap")
      val bigRef = ctx.addReferenceObj("big", bigMap, "java.util.HashMap")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final long ${ev.value} = $K.bigramLogProbSum(
            ${c.isNull} ? null : ${c.value}, $uniRef, $bigRef, ${vocabSize}L);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): BigramLogProbSum = copy(c)
  }

  /** DSIR log importance weight over a token array — the per-bucket
    * log-ratio table (one long per hash bucket, fitted driver-side
    * from target/raw feature counts) rides as a reference object, so
    * scoring is a map-only projection like [[BigramLogProbSum]].
    */
  case class DsirLogRatioSum(child: Expression, logRatios: Array[Long],
      numBuckets: Int) extends UnaryExpression {
    require(logRatios.length == numBuckets,
      s"logRatios must have one entry per bucket: ${logRatios.length} != $numBuckets")
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.dsirLogRatioSum(
        child.eval(input).asInstanceOf[ArrayData], logRatios, numBuckets)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lrRef = ctx.addReferenceObj("logRatios", logRatios, "long[]")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final long ${ev.value} = $K.dsirLogRatioSum(
            ${c.isNull} ? null : ${c.value}, $lrRef, $numBuckets);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): DsirLogRatioSum = copy(c)
  }

  /** Naive-Bayes log-odds sum over a token array — the scoring half of
    * a CCNet/GPT-3-style quality classifier (per-token Laplace-smoothed
    * class log-likelihood ratios fitted driver-side; see
    * `Curation.fitNbQuality`). The capped vocabulary table rides as a
    * reference object rebuilt lazily per executor as a UTF8String hash
    * map (zero-copy lookups), so scoring a 100 TB corpus is a map-only
    * projection with ZERO shuffles, like [[BigramLogProbSum]].
    */
  case class TokenLogOddsSum(child: Expression, logOdds: Map[String, Long],
      oov: Long) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    @transient private lazy val loMap: java.util.HashMap[UTF8String, java.lang.Long] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](logOdds.size * 2)
      logOdds.foreach { case (w, c) => m.put(UTF8String.fromString(w), c) }
      m
    }
    override def eval(input: InternalRow): Any =
      ExprKernels.tokenLogOddsSum(
        child.eval(input).asInstanceOf[ArrayData], loMap, oov)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val loRef = ctx.addReferenceObj("logOdds", loMap, "java.util.HashMap")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final long ${ev.value} = $K.tokenLogOddsSum(
            ${c.isNull} ? null : ${c.value}, $loRef, ${oov}L);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): TokenLogOddsSum = copy(c)
  }

  /** BPE encode of a token array against a learned merge list
    * (ordered; index = rank). The rank table rides as a reference
    * object like the other fitted models; encoding is map-only.
    */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)],
      alphabet: Seq[String] = Nil) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    @transient private lazy val ranks:
        java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
      val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
      merges.zipWithIndex.foreach { case ((a, b), r) =>
        m.computeIfAbsent(a, _ => new java.util.HashMap[String, Integer]())
          .putIfAbsent(b, Integer.valueOf(r))
      }
      m
    }
    // null = byte fallback off (empty alphabet means "nothing known",
    // which is never what a caller wants — the Bpe API guards it)
    @transient private lazy val alphaSet: java.util.HashSet[String] =
      if (alphabet.isEmpty) null
      else {
        val s = new java.util.HashSet[String](alphabet.size * 2)
        alphabet.foreach(s.add)
        s
      }
    override def eval(input: InternalRow): Any =
      ExprKernels.bpeEncode(child.eval(input).asInstanceOf[ArrayData], ranks, alphaSet)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ranksRef = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
      val alphaRef = ctx.addReferenceObj("alpha", alphaSet, "java.util.HashSet")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final ArrayData ${ev.value} = $K.bpeEncode(
            ${c.isNull} ? null : ${c.value}, $ranksRef, $alphaRef);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): BpeEncode = copy(c)
  }

  // ------------------------------------------------------- Column API

  /** GPT-2-style regex pre-tokenization of raw text — see
    * [[ExprKernels.gpt2PreTokenize]]. Null → empty array.
    */
  case class Gpt2PreTokenize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.gpt2PreTokenize(child.eval(input).asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final ArrayData ${ev.value} =
            $K.gpt2PreTokenize(${c.isNull} ? null : ${c.value});""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): Gpt2PreTokenize = copy(c)
  }

  /** Fused int8 quantize + integer dot against a pre-quantized query
    * vector riding as a reference object — see
    * [[ExprKernels.quantizedDotQ]]. Never null (null vec → 0).
    */
  case class QuantizedDotQ(child: Expression, q: Array[Long])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.quantizedDotQ(child.eval(input).asInstanceOf[ArrayData], q)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val qRef = ctx.addReferenceObj("q", q, "long[]")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final long ${ev.value} =
            $K.quantizedDotQ(${c.isNull} ? null : ${c.value}, $qRef);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): QuantizedDotQ = copy(c)
  }

  /** Space-joined word n-grams over a token array — see
    * [[ExprKernels.wordNgrams]]. Null/short input → empty array, so
    * the expression is never null.
    */
  case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"n must be >= 1: $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ExprKernels.wordNgrams(child.eval(input).asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final ArrayData ${ev.value} =
            $K.wordNgrams(${c.isNull} ? null : ${c.value}, $n);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): WordNgrams = copy(c)
  }

  /** Filter a string array against a fitted string SET, keeping
    * non-members — the O(1)-membership replacement for
    * `filter(arr, x => !array_contains(lit(set), x))`, whose
    * `array_contains` is a linear scan over the set per element. The
    * set rides as a reference object like the other fitted models
    * (ships once per executor in the task binary), so a 100k-entry
    * boilerplate set costs one broadcast and the rewrite stage stays
    * a fused map-only projection. Used by
    * [[graft.operators.Curation.lineDedup]]'s broadcast path.
    */
  case class FilterNotInSet(child: Expression, values: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = child.dataType
    @transient private lazy val set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](values.size * 2)
      values.foreach(v => s.add(UTF8String.fromString(v)))
      s
    }
    override def nullSafeEval(v: Any): Any =
      ExprKernels.filterNotInSet(v.asInstanceOf[ArrayData], set)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("set", set, "java.util.HashSet")
      defineCodeGen(ctx, ev, c => s"$K.filterNotInSet($c, $setRef)")
    }
    override protected def withNewChildInternal(c: Expression): FilterNotInSet = copy(c)
  }

  /** Membership-count twin of [[FilterNotInSet]]: how many array
    * elements appear in the set ([[ExprKernels.countInSet]] — O(1)
    * hash probes against a plan-shipped set, the badword page gate's
    * kernel). Null array → 0.
    */
  case class CountInSet(child: Expression, values: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false
    @transient private lazy val set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](values.size * 2)
      values.foreach(v => s.add(UTF8String.fromString(v)))
      s
    }
    override def eval(input: InternalRow): Any =
      ExprKernels.countInSet(child.eval(input).asInstanceOf[ArrayData], set)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("set", set, "java.util.HashSet")
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          final int ${ev.value} =
            $K.countInSet(${c.isNull} ? null : ${c.value}, $setRef);""",
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): CountInSet = copy(c)
  }

  /** Morton (Z-order) value of two integral coordinates
    * ([[ExprKernels.interleaveBits]]): the multi-column data-layout
    * sort key. Range-partitioning + sorting by this value clusters
    * rows that are close in BOTH dimensions into the same parquet
    * file, so each file's min/max footer stats cover a tight rectangle
    * and point/range predicates on EITHER column skip most files —
    * single-column sorting only ever skips on the leading column.
    */
  case class InterleaveBits(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any =
      ExprKernels.interleaveBits(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = $K.interleaveBits($a, $b, $bits);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): InterleaveBits =
      copy(l, r)
  }

  import org.apache.spark.sql.graft.bridge.{columnOf => column, expressionOf => expression}

  def simhash64(tokenHashes: Column): Column = column(SimHash64(expression(tokenHashes)))

  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    column(MinHashSig(expression(shingleHashes), numHashes))

  def canonicalJson(jsonStr: Column): Column = column(CanonicalJson(expression(jsonStr)))

  def normalizeNfc(text: Column): Column = column(NormalizeNfc(expression(text)))

  def fixMojibake(text: Column, rounds: Int = 2): Column =
    column(FixMojibake(expression(text), rounds))

  def deflateRatio(text: Column): Column = column(DeflateRatio(expression(text)))

  def cutTokenSpans(text: Column, spans: Column): Column =
    column(CutTokenSpans(expression(text), expression(spans)))

  def langId(tokens: Column, profiles: Seq[(String, Seq[String])]): Column =
    column(LangIdExpr(expression(tokens), profiles))

  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def setJaccard(a: Column, b: Column): Column =
    column(SetJaccard(expression(a), expression(b)))

  def matVec(vec: Column, mat: Array[Array[Double]]): Column =
    column(MatVec(expression(vec), mat))

  def tokenize(text: Column): Column = column(Tokenize(expression(text)))

  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    column(NearestCentroid(expression(vec), centroids))

  def unigramEncode(preTokens: Column, pieces: Seq[(String, Double)],
      maxLen: Int, unkLogProb: Double): Column =
    column(UnigramEncode(expression(preTokens), pieces, maxLen, unkLogProb))

  def pqEncode(vec: Column, codebooks: Array[Array[Double]], m: Int,
      dsub: Int): Column =
    column(PqEncode(expression(vec), codebooks, m, dsub))

  def pqAdcDot(codes: Column, lut: Array[Double], ksub: Int): Column =
    column(PqAdcDot(expression(codes), lut, ksub))

  def nearestCentroidSim(vec: Column, centroids: Array[Array[Double]]): Column =
    column(NearestCentroidSim(expression(vec), centroids))

  def shingleHashes(tokenHashes: Column, k: Int): Column =
    column(ShingleHashes(expression(tokenHashes), k))

  def tokenHashes(text: Column): Column = column(TokenHashes(expression(text)))

  def rollingFingerprint(text: Column, init: Long): Column =
    column(RollingFingerprint(expression(text), init))

  def windowFingerprints(tokenHashes: Column, k: Int): Column =
    column(WindowFingerprints(expression(tokenHashes), k))

  def canonicalUrl(url: Column): Column = column(CanonicalUrl(expression(url)))

  def urlDomain(url: Column): Column = column(UrlDomain(expression(url)))

  def bigramLogProbSum(tokens: Column, uni: Map[String, Long],
      big: Map[(String, String), Long], vocabSize: Long): Column =
    column(BigramLogProbSum(expression(tokens), uni, big, vocabSize))

  def dsirLogRatioSum(tokens: Column, logRatios: Array[Long],
      numBuckets: Int): Column =
    column(DsirLogRatioSum(expression(tokens), logRatios, numBuckets))

  def tokenLogOddsSum(tokens: Column, logOdds: Map[String, Long],
      oov: Long): Column =
    column(TokenLogOddsSum(expression(tokens), logOdds, oov))

  def filterNotInSet(arr: Column, values: Seq[String]): Column =
    column(FilterNotInSet(expression(arr), values))

  def countInSet(arr: Column, values: Seq[String]): Column =
    column(CountInSet(expression(arr), values))

  def wordNgrams(tokens: Column, n: Int): Column =
    column(WordNgrams(expression(tokens), n))

  def quantizedDotQ(vec: Column, q: Array[Long]): Column =
    column(QuantizedDotQ(expression(vec), q))

  def zOrderValue(a: Column, b: Column, bits: Int): Column =
    column(InterleaveBits(expression(a.cast("long")), expression(b.cast("long")), bits))

  def gpt2PreTokenize(text: Column): Column =
    column(Gpt2PreTokenize(expression(text)))

  def bpeEncode(tokens: Column, merges: Seq[(String, String)],
      alphabet: Seq[String] = Nil): Column =
    column(BpeEncode(expression(tokens), merges, alphabet))
}
