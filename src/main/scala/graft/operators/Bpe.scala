package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CatalystExpressions, TextFunctions}

/** Trainable byte-pair-encoding tokenizer — the real form of the
  * `bpeishTokenCount` heuristic: learn a merge table from the corpus
  * (the standard Sennrich 2016 algorithm over a word-type histogram)
  * and encode with it. Training pipelines fit tokenizers on corpus
  * samples exactly this way; piece counts from a FITTED tokenizer feed
  * the token-budget operators ([[TextOps.packSequences]], length
  * filters) with real numbers instead of estimates.
  *
  * Scale shape: the corpus-scale pass is ONE word-histogram aggregate
  * (groupBy word — the same shuffle a word count costs), capped at
  * `maxWordTypes` in deterministic (count desc, word) order; merge
  * learning then iterates DRIVER-SIDE over the bounded histogram
  * (every production BPE trainer works this way — the histogram, not
  * the corpus, is the training set). Encoding is map-only: the merge
  * table rides inside [[CatalystExpressions.BpeEncode]] like the other
  * fitted models.
  *
  * No SQL-expressible oracle exists for the iterative merge loop
  * (BpeSpec hand-verifies the Sennrich walkthrough instead), so this
  * surface is spec-gated like the I/O kernels.
  *
  * **Pre-tokenization boundary**: by default apply is
  * whitespace-Sennrich — words come from [[TextFunctions.tokens]]
  * (lowercased whitespace split), each encoded independently against
  * the merge table. A GPT-2-style regex pre-tokenizer is available
  * (`preTokenizer = Bpe.Gpt2`, carried by the model so fit and apply
  * cannot disagree): case/space-preserving, contractions split off,
  * punctuation separated. Byte-level fallback is OPT-IN
  * (`encode(…, byteFallback = true)`): off, characters never seen in
  * the fit corpus stay un-merged single-code-point pieces, so piece
  * counts on unicode-heavy / cross-lingual text run HIGHER than a
  * production tokenizer would report (BpeSpec quantifies the
  * inflation on a unicode fixture); on, OOV code points expand to
  * sentencepiece-style `<0xXX>` byte pieces — the no-unknown-symbol
  * guarantee, at the usual multi-byte piece cost for non-Latin
  * scripts. Punctuation glued to a word is part of that word's
  * symbol sequence either way. Calibrate against the target model's
  * real tokenizer before using the counts as exact billing numbers.
  */
object Bpe {

  /** An ordered merge list; index = rank (earlier = higher priority).
    * Symbols are code-point strings growing by concatenation, with
    * `</w>` as the end-of-word symbol. `alphabet` is every single
    * code point the fit observed — the known-symbol set byte-level
    * fallback tests against (empty on models saved before the
    * alphabet artifact existed; refit or re-save to use fallback).
    */
  case class BpeModel(merges: Vector[(String, String)],
      alphabet: Set[String] = Set.empty,
      preTokenizer: String = Bpe.Whitespace)

  private def codePoints(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Pre-tokenizer names a model carries: [[Whitespace]] is the
    * default lowercased whitespace split ([[TextFunctions.tokens]]);
    * [[Gpt2]] is the case/space-preserving GPT-2 regex
    * ([[CatalystExpressions.Gpt2PreTokenize]] — contractions split
    * off, punctuation its own pre-token, one leading space kept).
    * Encode always applies the pre-tokenizer the model was FIT with.
    */
  val Whitespace = "whitespace"
  val Gpt2 = "gpt2"

  private def preTokens(text: Column, preTokenizer: String): Column =
    preTokenizer match {
      case Whitespace => TextFunctions.tokens(text)
      case Gpt2 => CatalystExpressions.gpt2PreTokenize(text)
      case other => throw new IllegalArgumentException(
        s"unknown preTokenizer: $other (expected $Whitespace or $Gpt2)")
    }

  /** Learn `numMerges` merges from the corpus. Pair counting is
    * overlapping (`zip(tail)`), replacement is leftmost
    * non-overlapping — the standard algorithm's convention. Ties on
    * count break to the lexicographically smallest pair, so the fit is
    * deterministic. Stops early when the best pair occurs fewer than
    * `minPairCount` times (merging hapax pairs memorizes noise).
    */
  def fitBpe(df: DataFrame, textCol: String, numMerges: Int = 200,
      maxWordTypes: Int = 1 << 20, minPairCount: Long = 2L,
      preTokenizer: String = Whitespace): BpeModel = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    // floor the tokenize scan's parallelism (single-split local input
    // would serialize it; no-op at scale — same guard as fitDsir)
    val grouped = Scale.parallelismFloor(df)
      .select(explode(preTokens(col(textCol), preTokenizer)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val words = grouped
      .orderBy(desc("c"), col("w")).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // The alphabet is defined over the WHOLE fit corpus, not the
    // capped histogram: when the maxWordTypes cap binds, code points
    // appearing only in dropped rare word types must still count as
    // in-alphabet (else byteFallback would byte-expand characters the
    // corpus demonstrably contains). Detecting the bind by
    // words.length == cap keeps the common uncapped fit at one job;
    // the capped path pays one extra tiny distinct-code-point
    // aggregate (split("") is code-point-safe — Java regex never
    // splits a surrogate pair; BpeSpec locks this on an astral-plane
    // fixture).
    val alphabet: Set[String] =
      if (words.length < maxWordTypes)
        words.iterator.flatMap { case (w, _) => codePoints(w) }.toSet
      else
        grouped.select(explode(split(col("w"), "")).as("ch"))
          .filter(length(col("ch")) > 0).distinct()
          .collect().map(_.getString(0)).toSet
    var vocab: Array[(Array[String], Long)] =
      words.map { case (w, c) => (codePoints(w) :+ "</w>", c) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestCount = 0L
      pairCounts.foreach { case (p, c) =>
        if (c > bestCount ||
          (c == bestCount && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestCount = c
        }
      }
      if (best == null || bestCount < minPairCount) exhausted = true
      else {
        merges += best
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best), c) }
        round += 1
      }
    }
    BpeModel(merges.result(), alphabet, preTokenizer)
  }

  /** Leftmost non-overlapping replacement of `pair` in a symbol
    * sequence.
    */
  private[operators] def mergePair(syms: Array[String],
      pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode `text` to BPE pieces (map-only), pre-tokenized with the
    * model's own pre-tokenizer.
    * `byteFallback = true` expands code points outside the model's
    * fit alphabet to sentencepiece-style `<0xXX>` byte pieces — the
    * no-unknown-symbol guarantee (requires a model carrying its
    * alphabet; see [[BpeModel]]).
    */
  def encode(text: Column, model: BpeModel,
      byteFallback: Boolean = false): Column = {
    require(!byteFallback || model.alphabet.nonEmpty,
      "byteFallback needs a model with a fit alphabet (refit or re-save the model)")
    CatalystExpressions.bpeEncode(preTokens(text, model.preTokenizer), model.merges,
      if (byteFallback) model.alphabet.toSeq.sorted else Nil)
  }

  /** Piece count under a fitted tokenizer — the real replacement for
    * [[TextFunctions.bpeishTokenCount]]'s vocabulary-free estimate.
    */
  def pieceCount(text: Column, model: BpeModel,
      byteFallback: Boolean = false): Column =
    size(encode(text, model, byteFallback))

  /** Persist/load the merge table (+ fit alphabet) as one parquet
    * artifact — same fit-once discipline as [[Curation.saveBigramLm]].
    * Alphabet symbols ride as rank = −1 rows, so artifacts saved
    * before the alphabet existed still load (with an empty alphabet).
    */
  def save(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    (model.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) } ++
        model.alphabet.toSeq.sorted.map(sym => (-1, sym, null: String)) ++
        Seq((-2, model.preTokenizer, null: String)))
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): BpeModel = {
    val rows = spark.read.parquet(path).orderBy(col("rank")).collect()
    BpeModel(
      rows.filter(_.getInt(0) >= 0).map(r => (r.getString(1), r.getString(2))).toVector,
      rows.filter(_.getInt(0) == -1).map(_.getString(1)).toSet,
      rows.find(_.getInt(0) == -2).map(_.getString(1)).getOrElse(Whitespace))
  }
}
