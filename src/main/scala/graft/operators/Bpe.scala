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
  * **Pre-tokenization boundary**: apply is whitespace-Sennrich — words
  * come from [[TextFunctions.tokens]] (lowercased whitespace split),
  * each encoded independently against the merge table, with NO
  * byte-level fallback and NO GPT-2-style regex pre-tokenizer.
  * Consequences: (1) characters never seen in the fit corpus stay
  * un-merged single-code-point pieces, so piece counts on
  * unicode-heavy / cross-lingual text run HIGHER than a production
  * byte-fallback tokenizer would report (BpeSpec quantifies the
  * inflation on a unicode fixture); (2) punctuation glued to a word
  * is part of that word's symbol sequence, not split off. Fine for
  * the token-budget estimates this feeds; calibrate against the
  * target model's real tokenizer before using the counts as exact
  * billing numbers.
  */
object Bpe {

  /** An ordered merge list; index = rank (earlier = higher priority).
    * Symbols are code-point strings growing by concatenation, with
    * `</w>` as the end-of-word symbol.
    */
  case class BpeModel(merges: Vector[(String, String)])

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

  /** Learn `numMerges` merges from the corpus. Pair counting is
    * overlapping (`zip(tail)`), replacement is leftmost
    * non-overlapping — the standard algorithm's convention. Ties on
    * count break to the lexicographically smallest pair, so the fit is
    * deterministic. Stops early when the best pair occurs fewer than
    * `minPairCount` times (merging hapax pairs memorizes noise).
    */
  def fitBpe(df: DataFrame, textCol: String, numMerges: Int = 200,
      maxWordTypes: Int = 1 << 20, minPairCount: Long = 2L): BpeModel = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    // floor the tokenize scan's parallelism (single-split local input
    // would serialize it; no-op at scale — same guard as fitDsir)
    val words = Scale.parallelismFloor(df)
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w")).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
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
    BpeModel(merges.result())
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

  /** Encode whitespace tokens of `text` to BPE pieces (map-only). */
  def encode(text: Column, model: BpeModel): Column =
    CatalystExpressions.bpeEncode(TextFunctions.tokens(text), model.merges)

  /** Piece count under a fitted tokenizer — the real replacement for
    * [[TextFunctions.bpeishTokenCount]]'s vocabulary-free estimate.
    */
  def pieceCount(text: Column, model: BpeModel): Column =
    size(encode(text, model))

  /** Persist/load the merge table as a parquet artifact (rank order
    * preserved) — same fit-once discipline as
    * [[Curation.saveBigramLm]].
    */
  def save(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): BpeModel =
    BpeModel(spark.read.parquet(path).orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toVector)
}
