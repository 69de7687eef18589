package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Unigram}

/** Unigram-LM tokenizer (Kudo 2018) against hand-computed lattice
  * expectations and Viterbi walkthroughs — like BpeSpec, the
  * published algorithm's worked properties are the ground truth the
  * EM fit can't get from a SQL oracle.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("EM step: hand-computed lattice posterior on 'abab' with uniform probs") {
    // vocab {a, b, ab} uniform 1/3. Segmentations of "abab" and their
    // probabilities p = (1/3)^pieces:
    //   [ab,ab]       (1/3)^2 = 9/81
    //   [ab,a,b]      (1/3)^3 = 3/81
    //   [a,b,ab]      (1/3)^3 = 3/81
    //   [a,b,a,b]     (1/3)^4 = 1/81
    // total = 16/81; E[ab] = (2·9 + 3 + 3)/16 = 24/16 = 1.5,
    // E[a] = E[b] = (3 + 3 + 2)/16 = 0.5... per-word; check exactly.
    val lp = math.log(1.0 / 3)
    val (next, ll) = graft.operators.Unigram.emStep(
      Array(("abab", 1L)),
      Map("a" -> lp, "b" -> lp, "ab" -> lp), maxLen = 2)
    assert(math.abs(ll - math.log(16.0 / 81)) < 1e-12,
      s"corpus likelihood must be the lattice total, got $ll")
    // normalized expected counts: E = {ab: 1.5, a: 0.5, b: 0.5}? E[a]:
    // [ab,a,b] has one a, [a,b,ab] one, [a,b,a,b] two →
    // (3 + 3 + 2·1)/16 = 8/16 = 0.5. Total mass 1.5+0.5+0.5 = 2.5.
    assert(math.abs(math.exp(next("ab")) - 1.5 / 2.5) < 1e-12)
    assert(math.abs(math.exp(next("a")) - 0.5 / 2.5) < 1e-12)
    assert(math.abs(math.exp(next("b")) - 0.5 / 2.5) < 1e-12)
  }

  test("EM is monotone: corpus log-likelihood never decreases across steps") {
    val words = Array(("abab", 4L), ("ab", 6L), ("ba", 2L), ("aabb", 1L))
    var logp: Map[String, Double] = Map(
      "a" -> math.log(0.3), "b" -> math.log(0.3),
      "ab" -> math.log(0.2), "ba" -> math.log(0.1), "aa" -> math.log(0.1))
    var lastLl = Double.NegativeInfinity
    (1 to 6).foreach { _ =>
      val (next, ll) = graft.operators.Unigram.emStep(words, logp, maxLen = 2)
      // ll is the likelihood UNDER THE INCOMING probs; EM guarantees
      // it is non-decreasing step over step
      assert(ll >= lastLl - 1e-9, s"EM decreased likelihood: $lastLl -> $ll")
      lastLl = ll
      logp = next
    }
  }

  test("fitUnigram keeps every corpus character and learns the repeating piece") {
    val corpus = (Seq.fill(20)("ababab") ++ Seq.fill(5)("xy"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val model = Unigram.fitUnigram(corpus, "text", vocabSize = 8, maxPieceLen = 4)
    val vocab = model.pieces.map(_._1).toSet
    assert(Set("a", "b", "x", "y").subsetOf(vocab), s"chars must survive: $vocab")
    val p = model.pieces.toMap
    assert(p.contains("ab"), s"frequent bigram must survive pruning: $vocab")
    // the repeating piece must beat composing it from characters
    assert(p("ab") > p("a") + p("b"),
      s"p(ab)=${p("ab")} must exceed p(a)+p(b)=${p("a") + p("b")} in log space")
    // Viterbi then segments the repetition into the learned pieces
    val pieces = Seq((1L, "ababab")).toDF("doc_id", "text")
      .select(Unigram.encode(col("text"), model).as("p"))
      .head().getSeq[String](0)
    assert(pieces.forall(_.contains("ab")) && pieces.length <= 3,
      s"expected ab-built segmentation, got $pieces")
    // deterministic refit: byte-identical model
    val model2 = Unigram.fitUnigram(corpus.repartition(7), "text",
      vocabSize = 8, maxPieceLen = 4)
    assert(model2.pieces == model.pieces)
  }

  test("Viterbi: max-probability split wins; exact ties prefer the longer piece") {
    // integer log-probs so the tie is EXACT in doubles:
    // [aa] = -2.0 ties [a,a] = -1.0 + -1.0 → longer piece wins
    val tie = Unigram.UnigramModel(Vector(
      ("a", -1.0), ("aa", -2.0), ("b", -0.5)), maxPieceLen = 2)
    val got = Seq((1L, "aa aab")).toDF("doc_id", "text")
      .select(Unigram.encode(col("text"), tie).as("p"))
      .head().getSeq[String](0)
    assert(got == Seq("aa", "aa", "b"), s"tie must take the longer piece: $got")
    // clearly-better split wins regardless of piece count:
    // [a,a] = -1.0 beats [aa] = -3.0
    val m2 = Unigram.UnigramModel(Vector(
      ("a", -0.5), ("aa", -3.0), ("b", -0.5)), maxPieceLen = 2)
    val got2 = Seq((1L, "aa")).toDF("doc_id", "text")
      .select(Unigram.encode(col("text"), m2).as("p"))
      .head().getSeq[String](0)
    assert(got2 == Seq("a", "a"), s"[a,a]=-1.0 beats [aa]=-3.0: $got2")
  }

  test("OOV code points segment as single unk pieces; words always segment") {
    val model = Unigram.UnigramModel(Vector(
      ("h", math.log(0.5)), ("i", math.log(0.5))), maxPieceLen = 2)
    val rows = Seq((1L, "hi🙂hi"), (2L, "zzz"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Unigram.encode(col("text"), model).as("p"),
        Unigram.pieceCount(col("text"), model).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getInt(2)))).toMap
    assert(rows(1L) == ((Seq("h", "i", "🙂", "h", "i"), 5)),
      s"astral-plane OOV must stay one piece: ${rows(1L)}")
    assert(rows(2L) == ((Seq("z", "z", "z"), 3)))
  }

  test("model parquet round-trip is identity; pieceCount feeds token budgets") {
    val corpus = (Seq.fill(10)("the cat sat") ++ Seq.fill(5)("the hat"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val model = Unigram.fitUnigram(corpus, "text", vocabSize = 16, maxPieceLen = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-unigram").toString
    Unigram.save(spark, model, dir)
    val loaded = Unigram.load(spark, dir)
    assert(loaded == model, "save/load must round-trip the exact model")
    // counts from the loaded model equal counts from the fit model,
    // and are sane bounds for a budget gate: words <= pieces <= chars
    val counts = corpus.select(
        Unigram.pieceCount(col("text"), loaded).as("n"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("w"),
        length(regexp_replace(col("text"), "\\s", "")).as("c"))
      .collect()
    counts.foreach { r =>
      assert(r.getInt(1) <= r.getInt(0) && r.getInt(0) <= r.getInt(2),
        s"words ${r.getInt(1)} <= pieces ${r.getInt(0)} <= chars ${r.getInt(2)}")
    }
  }
}
