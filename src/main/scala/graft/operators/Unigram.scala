package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CatalystExpressions

/** Trainable unigram-LM tokenizer (Kudo 2018, "Subword
  * Regularization" — SentencePiece's unigram model): the other half
  * of production tokenization beside [[Bpe]]. Where BPE grows pieces
  * bottom-up by merging, the unigram model starts from a LARGE seed
  * vocabulary of candidate substrings and prunes it top-down: EM fits
  * piece probabilities over every possible segmentation of the word
  * histogram, pruning then drops the lowest-expected-count pieces
  * (single characters are never dropped — the coverage guarantee),
  * and encoding is the Viterbi max-probability segmentation.
  *
  * Scale shape — identical to [[Bpe.fitBpe]]: the corpus-scale pass is
  * ONE word-histogram aggregate (the word-count shuffle), capped at
  * `maxWordTypes` in deterministic (count desc, word) order; EM +
  * pruning iterate DRIVER-SIDE over the bounded histogram (the
  * histogram, not the corpus, is the training set — how SentencePiece
  * itself trains). Encoding is map-only: the piece table rides inside
  * [[CatalystExpressions.UnigramEncode]] like every fitted model here.
  *
  * The EM loop itself has no SQL-expressible oracle (UnigramSpec
  * hand-verifies lattice expectations and Viterbi walkthroughs; q144
  * gates the encode's invariants + the budget mechanics in
  * CORRECTNESS), matching [[Bpe]]'s spec-gated discipline.
  *
  * Determinism: seed selection, EM accumulation and pruning all
  * iterate in sorted piece order with lexicographic tie-breaks, so two
  * fits of the same histogram produce byte-identical models.
  */
object Unigram {

  /** Log-probability assigned to a single OUT-OF-VOCABULARY code point
    * at encode time (the sentencepiece unk-penalty idea): harsh enough
    * that any in-vocabulary segmentation wins, finite so every word
    * still segments.
    */
  val UnkLogProb: Double = -100.0

  /** A fitted unigram model: piece → log-probability (natural log,
    * normalized over the final vocabulary), plus the pre-tokenizer
    * it was fit with and its maximum piece length in code points.
    */
  final case class UnigramModel(pieces: Vector[(String, Double)],
      maxPieceLen: Int, preTokenizer: String = Bpe.Whitespace) {
    require(pieces.nonEmpty, "empty unigram vocabulary")
    def vocabSize: Int = pieces.size
  }

  private def codePointSlices(w: String): Array[Int] = {
    val out = Array.newBuilder[Int]
    var i = 0
    while (i < w.length) {
      out += i
      i += Character.charCount(w.codePointAt(i))
    }
    out += w.length
    out.result()
  }

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

  /** One EM pass over the word histogram: forward–backward expected
    * piece counts under the current log-probs, then re-normalized
    * probabilities. Returns (newLogProbs, corpus log-likelihood) —
    * the likelihood is what UnigramSpec asserts is non-decreasing.
    */
  private[graft] def emStep(words: Array[(String, Long)],
      logp: collection.Map[String, Double],
      maxLen: Int): (Map[String, Double], Double) = {
    val expected = scala.collection.mutable.HashMap.empty[String, Double]
    var ll = 0.0
    words.foreach { case (w, cnt) =>
      val cps = codePointSlices(w)
      val n = cps.length - 1
      val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
      val beta = Array.fill(n + 1)(Double.NegativeInfinity)
      alpha(0) = 0.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        while (j < i) {
          val lp = logp.getOrElse(w.substring(cps(j), cps(i)),
            Double.NegativeInfinity)
          if (lp > Double.NegativeInfinity && alpha(j) > Double.NegativeInfinity)
            alpha(i) = logSumExp(alpha(i), alpha(j) + lp)
          j += 1
        }
        i += 1
      }
      if (alpha(n) > Double.NegativeInfinity) {
        ll += cnt * alpha(n)
        beta(n) = 0.0
        var j = n - 1
        while (j >= 0) {
          var i2 = j + 1
          val hi = math.min(n, j + maxLen)
          while (i2 <= hi) {
            val lp = logp.getOrElse(w.substring(cps(j), cps(i2)),
              Double.NegativeInfinity)
            if (lp > Double.NegativeInfinity && beta(i2) > Double.NegativeInfinity)
              beta(j) = logSumExp(beta(j), lp + beta(i2))
            i2 += 1
          }
          j -= 1
        }
        // occurrence (j, i) posterior: exp(α_j + lp + β_i − α_n)
        var jj = 0
        while (jj < n) {
          var ii = jj + 1
          val hi = math.min(n, jj + maxLen)
          while (ii <= hi) {
            val piece = w.substring(cps(jj), cps(ii))
            val lp = logp.getOrElse(piece, Double.NegativeInfinity)
            if (lp > Double.NegativeInfinity &&
                alpha(jj) > Double.NegativeInfinity &&
                beta(ii) > Double.NegativeInfinity) {
              val post = math.exp(alpha(jj) + lp + beta(ii) - alpha(n))
              if (post > 0)
                expected.update(piece, expected.getOrElse(piece, 0.0) + cnt * post)
            }
            ii += 1
          }
          jj += 1
        }
      }
    }
    val total = expected.valuesIterator.sum
    val out = logp.keysIterator.map { p =>
      val e = expected.getOrElse(p, 0.0)
      // floor: a piece with zero expected count keeps a tiny mass so
      // single chars never become unreachable mid-fit (pruning, not
      // the floor, is what removes pieces)
      p -> math.log(math.max(e, 1e-10) / math.max(total, 1e-10))
    }.toMap
    (out, ll)
  }

  /** Fit a unigram model: seed = all word substrings up to
    * `maxPieceLen` code points scored by count·length (top
    * `seedFactor`·`vocabSize` kept, single characters always), then
    * rounds of (EM ×`emPerRound`, prune to `shrink`·|vocab| by
    * expected-count order) until the vocabulary fits `vocabSize`,
    * with a final EM re-normalization.
    */
  def fitUnigram(df: DataFrame, textCol: String, vocabSize: Int = 512,
      maxPieceLen: Int = 8, maxWordTypes: Int = 1 << 20,
      seedFactor: Int = 4, emPerRound: Int = 2, shrink: Double = 0.75,
      preTokenizer: String = Bpe.Whitespace): UnigramModel = {
    require(vocabSize >= 2 && maxPieceLen >= 1 && seedFactor >= 1)
    require(shrink > 0 && shrink < 1, s"shrink must be in (0,1): $shrink")
    val preTok = preTokenizer match {
      case Bpe.Whitespace => graft.functions.TextFunctions.tokens(col(textCol))
      case Bpe.Gpt2 => CatalystExpressions.gpt2PreTokenize(col(textCol))
      case other => throw new IllegalArgumentException(s"unknown preTokenizer: $other")
    }
    val words = Scale.parallelismFloor(df)
      .select(explode(preTok).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w")).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(words.nonEmpty, "fitUnigram: empty fit corpus")
    // mandatory single characters: one driver pass over the histogram
    // (O(total chars), no blow-up)
    val chars = scala.collection.mutable.TreeSet.empty[String]
    words.foreach { case (w, _) =>
      val cps = codePointSlices(w)
      var j = 0
      while (j < cps.length - 1) { chars += w.substring(cps(j), cps(j + 1)); j += 1 }
    }
    // substring candidates scored by count × length (longer frequent
    // pieces are the valuable ones). Scored as a SPARK aggregate over
    // the histogram, not a driver map: a 2^20-word-type histogram
    // explodes to ~10^8 substring occurrences — model-sized only
    // AFTER the top-N cut, so the cut runs distributed
    // (TakeOrderedAndProject on the grouped scores).
    val spark = df.sparkSession
    import spark.implicits._
    val mpl = maxPieceLen
    val nSeed = math.max(0, seedFactor * vocabSize - chars.size)
    val seedScored: Seq[(String, Long)] = spark.createDataset(words.toSeq)
      .flatMap { case (w, cnt) =>
        val cps = codePointSlices(w)
        val n = cps.length - 1
        for {
          j <- 0 until n
          i <- (j + 2) to math.min(n, j + mpl)
        } yield (w.substring(cps(j), cps(i)), cnt * (i - j))
      }
      .toDF("p", "sc").groupBy(col("p")).agg(sum(col("sc")).as("sc"))
      .orderBy(desc("sc"), col("p")).limit(nSeed)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val seedScore: Map[String, Long] = seedScored.toMap
    var vocab: Set[String] = chars.toSet ++ seedScored.map(_._1)
    // init probs ∝ count·length scores (chars get their raw counts)
    val charCount = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, cnt) =>
      val cps = codePointSlices(w)
      var j = 0
      while (j < cps.length - 1) {
        val c = w.substring(cps(j), cps(j + 1))
        charCount.update(c, charCount.getOrElse(c, 0L) + cnt)
        j += 1
      }
    }
    val initTotal = vocab.iterator
      .map(p => math.max(seedScore.getOrElse(p, charCount.getOrElse(p, 1L)), 1L))
      .sum.toDouble
    var logp: Map[String, Double] = vocab.iterator.map { p =>
      p -> math.log(
        math.max(seedScore.getOrElse(p, charCount.getOrElse(p, 1L)), 1L) / initTotal)
    }.toMap
    var lastLl = Double.NegativeInfinity
    def runEm(times: Int): Unit = {
      var t = 0
      while (t < times) {
        val (next, ll) = emStep(words, logp, maxPieceLen)
        logp = next
        lastLl = ll
        t += 1
      }
    }
    // prune rounds: EM, then drop the lowest-probability multi-char
    // pieces until the budget fits
    val floorSize = math.max(vocabSize, chars.size)
    var guard = 0
    while (vocab.size > floorSize && guard < 64) {
      runEm(emPerRound)
      val target = math.max(floorSize, (vocab.size * shrink).toInt)
      val keepMulti = logp.toSeq
        .filter { case (p, _) => !chars.contains(p) }
        .sortBy { case (p, lp) => (-lp, p) }
        .take(math.max(0, target - chars.size))
        .map(_._1)
      vocab = chars.toSet ++ keepMulti
      logp = logp.filter { case (p, _) => vocab.contains(p) }
      guard += 1
    }
    runEm(emPerRound) // final re-normalization over the kept vocabulary
    UnigramModel(
      logp.toVector.sortBy { case (p, lp) => (-lp, p) },
      maxPieceLen, preTokenizer)
  }

  /** Viterbi encode `text` to unigram pieces (map-only), pre-tokenized
    * with the model's own pre-tokenizer; OOV code points become
    * single-character pieces at [[UnkLogProb]].
    */
  def encode(text: Column, model: UnigramModel): Column = {
    val preTok = model.preTokenizer match {
      case Bpe.Whitespace => graft.functions.TextFunctions.tokens(text)
      case Bpe.Gpt2 => CatalystExpressions.gpt2PreTokenize(text)
      case other => throw new IllegalArgumentException(s"unknown preTokenizer: $other")
    }
    CatalystExpressions.unigramEncode(preTok, model.pieces, model.maxPieceLen,
      UnkLogProb)
  }

  /** Piece count under a fitted unigram tokenizer — the unigram twin
    * of [[Bpe.pieceCount]], feeding the same token-budget operators.
    */
  def pieceCount(text: Column, model: UnigramModel): Column =
    size(encode(text, model))

  /** Persist/load the piece table as one parquet artifact (the
    * [[Bpe.save]] discipline): pieces as (piece, logp) rows, the
    * pre-tokenizer and max piece length as marker rows.
    */
  def save(spark: SparkSession, model: UnigramModel, path: String): Unit = {
    import spark.implicits._
    (model.pieces.map { case (p, lp) => ("p", p, lp) } ++
        Seq(("pretok", model.preTokenizer, 0.0),
          ("maxlen", model.maxPieceLen.toString, 0.0)))
      .toDF("kind", "piece", "logp")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): UnigramModel = {
    val rows = spark.read.parquet(path).collect()
    val pieces = rows.filter(_.getString(0) == "p")
      .map(r => (r.getString(1), r.getDouble(2)))
      .sortBy { case (p, lp) => (-lp, p) }.toVector
    UnigramModel(
      pieces,
      rows.find(_.getString(0) == "maxlen").map(_.getString(1).toInt).getOrElse(8),
      rows.find(_.getString(0) == "pretok").map(_.getString(1))
        .getOrElse(Bpe.Whitespace))
  }
}
