package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import graft.functions.CatalystExpressions

/** Locks the whole-stage-codegen story of the custom expressions: the
  * signature scan (tokenize → shingle → minhash / simhash) is the
  * hottest loop the engine owns at 100 TB, and an interpreted
  * `CodegenFallback` there evaluates the whole chain per row with
  * boxing. These tests fail if anyone reintroduces a fallback or if
  * the generated code stops compiling (forcing Spark's silent
  * interpreted fallback).
  */
class CodegenSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.graft.bridge.expressionOf

  private def docs = graft.core.Engine.table(spark, sfDir, "documents")
  private lazy val lm =
    graft.operators.Curation.fitBigramLm(docs.limit(50), "text")

  test("no custom expression is a CodegenFallback") {
    val exprs = Seq(
      CatalystExpressions.tokenize(col("text")),
      CatalystExpressions.shingleHashes(col("h"), 3),
      CatalystExpressions.minhashSig(col("h"), 16),
      CatalystExpressions.simhash64(col("h")),
      CatalystExpressions.langId(col("t"), Seq("en" -> Seq("the"))),
      CatalystExpressions.normalizeNfc(col("text")),
      CatalystExpressions.canonicalJson(col("text")),
      CatalystExpressions.dotProduct(col("a"), col("b")),
      CatalystExpressions.nearestCentroid(col("a"), Array(Array(1.0, 0.0))),
      CatalystExpressions.bigramLogProbSum(col("t"),
        Map("a" -> 1L), Map(("a", "b") -> 1L), 2L),
      CatalystExpressions.dsirLogRatioSum(col("t"), new Array[Long](16), 16),
      CatalystExpressions.tokenLogOddsSum(col("t"), Map("a" -> 1L), -5L),
      CatalystExpressions.bpeEncode(col("t"), Seq(("e", "s"))),
      CatalystExpressions.windowFingerprints(col("h"), 5),
      CatalystExpressions.canonicalUrl(col("text")),
      CatalystExpressions.urlDomain(col("text")),
      CatalystExpressions.nearestCentroidSim(col("a"), Array(Array(1.0, 0.0))),
      CatalystExpressions.zOrderValue(col("x"), col("y"), 16),
      CatalystExpressions.pqEncode(col("a"), Array(Array(1.0), Array(0.0)), 2, 1),
      CatalystExpressions.pqAdcDot(col("codes"), Array(1.0, 0.0), 1),
      CatalystExpressions.unigramEncode(col("t"), Seq("a" -> -1.0), 2, -100.0))
    exprs.foreach { c =>
      val e = expressionOf(c)
      assert(!e.isInstanceOf[CodegenFallback],
        s"${e.getClass.getSimpleName} must implement real doGenCode")
    }
  }

  test("signature projection stays inside one whole-stage region calling static kernels") {
    val sigs = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    val plan = sigs.queryExecution.executedPlan
    // the projection that computes signatures must sit under a
    // WholeStageCodegen node (not be forced out by a fallback split)
    val wsc = plan.collect { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, s"signature stage lost whole-stage codegen:\n$plan")
    // and its generated source must call the static kernels — proof
    // the fused path is the kernel call, not interpreted eval
    val generated = wsc.map(w => w.doCodeGen()._2.body).mkString("\n")
    assert(generated.contains("graft.functions.ExprKernels"),
      "generated code must call ExprKernels statics")
    assert(!generated.contains("CodegenFallback"),
      "generated code must not route through interpreted fallback")
  }

  test("generated kernel code compiles and matches the interpreted path bit-for-bit") {
    // CODEGEN_ONLY would make expression-compile errors throw instead
    // of silently falling back to interpreted eval; wholeStage fallback
    // off does the same for stage compilation. Compare full outputs of
    // the two modes on real data: identical results prove the two
    // paths share one semantics.
    val q = () => {
      val base = docs.select(col("doc_id"), col("text"))
      base.select(
        col("doc_id"),
        CatalystExpressions.minhashSig(
          graft.operators.Dedup.shingleHashSet(col("text"), 3), 16).getItem(0).as("sig_head"),
        CatalystExpressions.simhash64(
          transform(graft.functions.TextFunctions.tokens(col("text")),
            t => xxhash64(t))).as("sh"),
        CatalystExpressions.normalizeNfc(col("text")).as("nfc"),
        CatalystExpressions.langId(
          CatalystExpressions.tokenize(col("text")),
          graft.functions.TextFunctions.DefaultLangProfiles.toSeq.sortBy(_._1)).as("lang"),
        CatalystExpressions.bigramLogProbSum(
          CatalystExpressions.tokenize(col("text")),
          lm.uni, lm.big, lm.vocabSize).as("lp"),
        CatalystExpressions.filterNotInSet(
          split(col("text"), " "), Seq("the", "a", "of", "and")).as("fns"),
        CatalystExpressions.wordNgrams(
          CatalystExpressions.tokenize(col("text")), 3).as("w3"))
        .orderBy("doc_id").collect().toSeq
    }
    val conf = spark.conf
    val before = (conf.getOption("spark.sql.codegen.factoryMode"),
      conf.getOption("spark.sql.codegen.fallback"))
    val codegenRows =
      try {
        conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        conf.set("spark.sql.codegen.fallback", "false")
        q()
      } finally {
        before._1.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
          conf.set("spark.sql.codegen.factoryMode", v))
        before._2.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
          conf.set("spark.sql.codegen.fallback", v))
      }
    val interpretedRows =
      try {
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        conf.set("spark.sql.codegen.wholeStage", "false")
        q()
      } finally {
        before._1.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
          conf.set("spark.sql.codegen.factoryMode", v))
        conf.unset("spark.sql.codegen.wholeStage")
      }
    assert(codegenRows == interpretedRows,
      "codegen and interpreted evaluation must agree on real documents")
    assert(codegenRows.nonEmpty)
  }

  test("PQ + unigram expressions: codegen == interpreted on real documents") {
    val pq = graft.operators.Similarity.pqFit(
      graft.core.Engine.table(spark, sfDir, "embeddings"),
      "vec_id", "embedding", m = 8, ksub = 8, fitSampleFraction = 1.0)
    val uni = graft.operators.Unigram.fitUnigram(
      docs.limit(50), "text", vocabSize = 64, maxPieceLen = 4)
    def q(): Seq[org.apache.spark.sql.Row] =
      graft.core.Engine.table(spark, sfDir, "embeddings")
        .select(col("vec_id"),
          CatalystExpressions.pqEncode(col("embedding"), pq.flat, pq.m,
            pq.dsub).as("codes"),
          CatalystExpressions.pqAdcDot(
            CatalystExpressions.pqEncode(col("embedding"), pq.flat, pq.m,
              pq.dsub),
            pq.lut(Array.fill(64)(0.1)), pq.ksub).as("adc"))
        .orderBy("vec_id").collect().toSeq ++
      docs.select(col("doc_id"),
          graft.operators.Unigram.encode(col("text"), uni).as("pieces"))
        .orderBy("doc_id").collect().toSeq
    val conf = spark.conf
    val codegenRows =
      try {
        conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        conf.set("spark.sql.codegen.fallback", "false")
        q()
      } finally {
        conf.unset("spark.sql.codegen.factoryMode")
        conf.unset("spark.sql.codegen.fallback")
      }
    val interpretedRows =
      try {
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        conf.set("spark.sql.codegen.wholeStage", "false")
        q()
      } finally {
        conf.unset("spark.sql.codegen.factoryMode")
        conf.unset("spark.sql.codegen.wholeStage")
      }
    assert(codegenRows == interpretedRows,
      "PQ/unigram codegen and interpreted evaluation must agree")
    assert(codegenRows.nonEmpty)
  }

  test("DHash64 / MatVec / CountInSet: no fallback, codegen == interpreted bit-for-bit") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val M = graft.operators.Multimodal
    Seq(
      CatalystExpressions.countInSet(col("t"), Seq("a")),
      CatalystExpressions.matVec(col("a"), Array(Array(1.0, 0.0))),
      M.dhash64Col(col("b")),
      M.audioHash64Col(col("b")),
      M.textinessCol(col("b")),
      M.videoKeyframesCol(col("b")),
      M.dialogCoverageCol(col("b")),
      M.scrubGpsCol(col("b")),
      M.videoGpsPresentCol(col("b")),
      M.scrubVideoGpsCol(col("b")),
      CatalystExpressions.cutTokenSpans(col("t"),
        expr("array(named_struct('span_begin', 0L, 'span_end', 1L))"))
    ).foreach { c =>
      val e = expressionOf(c)
      assert(!e.isInstanceOf[CodegenFallback],
        s"${e.getClass.getSimpleName} must implement real doGenCode")
    }
    // RDD-backed frame: a local Seq would constant-fold before either
    // execution mode runs (this shape is what caught the missing
    // static forwarder for a private[graft] kernel)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("img", BinaryType),
      StructField("vec", ArrayType(DoubleType)),
      StructField("toks", ArrayType(StringType))))
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    val rows = Seq(
      Row(1L, M.renderPng(18, 16, (x, _) => gray(x * 10)),
        Seq(1.5, -2.0), Seq("a", "b", "a", "c")),
      Row(2L, "not an image".getBytes("UTF-8"), Seq(3.0, 4.0), Seq("d")),
      Row(3L, M.withMp4SubtitleTrack(M.syntheticMp4(32, 16, 500L)),
        Seq(0.5, 0.5), Seq("e")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val q = () => df.select(col("id"),
        M.dhash64Col(col("img")).as("dh"),
        M.audioHash64Col(col("img")).as("ah"), // non-audio bytes → null path
        M.textinessCol(col("img")).as("tx"),
        base64(M.scrubGpsCol(col("img"))).as("sg"), // clean rows pass through
        M.dhash64Col(M.scrubGpsCol(col("img"))).as("dhsg"),
        M.mediaLinkHash64Col(col("img")).as("mlh"), // == dh for raw images
        M.subtitleTrackCountCol(col("img")).as("stc"), // null for images
        M.declaredTextLangCol(col("img")).as("dtl"), // null for images
        M.dialogCoverageCol(col("img")).as("dcv"), // 0.0 for the cue-less mp4
        CatalystExpressions.matVec(col("vec"),
          Array(Array(0.0, 1.0), Array(1.0, 0.0))).as("mv"),
        CatalystExpressions.countInSet(col("toks"), Seq("a", "c")).as("cis"))
      .orderBy("id").collect().toSeq.map(_.toString)
    val conf = spark.conf
    val codegenRows =
      try {
        conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        conf.set("spark.sql.codegen.fallback", "false")
        q()
      } finally {
        conf.unset("spark.sql.codegen.factoryMode")
        conf.unset("spark.sql.codegen.fallback")
      }
    val interpretedRows =
      try {
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        conf.set("spark.sql.codegen.wholeStage", "false")
        q()
      } finally {
        conf.unset("spark.sql.codegen.factoryMode")
        conf.unset("spark.sql.codegen.wholeStage")
      }
    assert(codegenRows == interpretedRows,
      s"codegen and interpreted must agree:\n$codegenRows\n$interpretedRows")
    assert(codegenRows.head.contains("-1"), "gradient hash is all-ones")
    assert(codegenRows.head.contains("3"), "3 of 4 tokens are in the set")
  }

  test("setJaccard == array_intersect/array_union formulation, codegen == interpreted") {
    // the kernel replaced the boxed two-pass form in the LSH verify
    // joins; lock exact equality on the edge shapes (empty/empty = 1.0,
    // zeros, duplicates, disjoint, identical) plus a seeded random sweep
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      (Array.empty[Long], Array.empty[Long]),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(0L), Array(0L)),
      (Array(0L, 0L, 5L), Array(0L, 7L)),
      (Array(1L, 1L, 2L, 3L), Array(3L, 3L, 4L)),
      (Array(-1L, Long.MinValue, Long.MaxValue), Array(Long.MinValue, 9L)),
      (Array(1L, 2L, 3L), Array(4L, 5L))) ++
      (0 until 50).map { _ =>
        (Array.fill(rnd.nextInt(40))(rnd.nextInt(20).toLong - 5),
          Array.fill(rnd.nextInt(40))(rnd.nextInt(20).toLong - 5))
      }
    val df = cases.zipWithIndex
      .map { case ((a, b), i) =>
        (i, a.toSeq.map(java.lang.Long.valueOf), b.toSeq.map(java.lang.Long.valueOf)) }
      // NULL elements too (a parquet round trip relaxes signature
      // arrays to containsNull=true): null is one distinct member per
      // side, matching array_intersect/array_union
      .appended((1000, Seq[java.lang.Long](null, 1L, null),
        Seq[java.lang.Long](null, 2L)))
      .appended((1001, Seq[java.lang.Long](null), Seq[java.lang.Long](3L)))
      .appended((1002, Seq[java.lang.Long](null, 0L), Seq[java.lang.Long](null, 0L)))
      .toDF("i", "a", "b")
    def q(): Seq[org.apache.spark.sql.Row] =
      df.select(col("i"),
          CatalystExpressions.setJaccard(col("a"), col("b")).as("k"),
          when(size(array_union(col("a"), col("b"))) === 0, 1.0)
            .otherwise(size(array_intersect(col("a"), col("b"))).cast("double") /
              size(array_union(col("a"), col("b")))).as("ref"))
        .orderBy("i").collect().toSeq
    val conf = spark.conf
    val codegenRows =
      try {
        conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        conf.set("spark.sql.codegen.fallback", "false")
        q()
      } finally {
        conf.unset("spark.sql.codegen.factoryMode")
        conf.unset("spark.sql.codegen.fallback")
      }
    val interpretedRows =
      try {
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        conf.set("spark.sql.codegen.wholeStage", "false")
        q()
      } finally {
        conf.unset("spark.sql.codegen.factoryMode")
        conf.unset("spark.sql.codegen.wholeStage")
      }
    assert(codegenRows == interpretedRows)
    codegenRows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"setJaccard mismatch at row ${r.getInt(0)}: kernel=${r.getDouble(1)} ref=${r.getDouble(2)}")
    }
  }

  test("nullable-on-success expressions declare nullable (invalid input maps to null)") {
    // CanonicalJson / DotProduct / NearestCentroid return null for
    // NON-null inputs (bad JSON, length mismatch, no matching
    // centroid); if they inherited child nullability the optimizer
    // could legally elide the null checks over non-null columns.
    val df = Seq(("{bad json", Array(1.0, 2.0), Array(1.0))).toDF("j", "a", "b")
    val out = df.select(
      CatalystExpressions.canonicalJson(col("j")).as("cj"),
      CatalystExpressions.dotProduct(col("a"), col("b")).as("dp"),
      CatalystExpressions.nearestCentroid(col("b"), Array(Array(1.0, 0.0))).as("nc"))
    assert(out.schema.fields.forall(_.nullable))
    val r = out.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
