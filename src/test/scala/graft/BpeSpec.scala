package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer/encoder against the hand-computed Sennrich (2016)
  * walkthrough — the published worked example is the independent
  * ground truth the iterative fit can't get from a SQL oracle.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic corpus: low×5 lower×2 newest×6 widest×3
  private lazy val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("fitBpe reproduces the Sennrich walkthrough merge order") {
    val model = Bpe.fitBpe(corpus, "text", numMerges = 5)
    // hand-derived: pair counts 9/9/9 tie → lexicographic: (e,s) first,
    // then (es,t), (est,</w>); next max 7 ties (l,o) before (o,w) →
    // (l,o), then (lo,w)
    assert(model.merges == Vector(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("encode applies merges by rank; unknown words fall back to code points") {
    val model = Bpe.fitBpe(corpus, "text", numMerges = 5)
    val enc = Seq((1L, "lowest"), (2L, "low"), (3L, "xyz"), (4L, "low lowest"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.encode(col("text"), model).as("p"),
        Bpe.pieceCount(col("text"), model).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getInt(2)))).toMap
    assert(enc(1L) == ((Seq("low", "est</w>"), 2)))
    assert(enc(2L) == ((Seq("low", "</w>"), 2)))
    assert(enc(3L) == ((Seq("x", "y", "z", "</w>"), 4)))
    assert(enc(4L) == ((Seq("low", "</w>", "low", "est</w>"), 4)))
  }

  test("surrogate pairs stay intact; fit is deterministic under repartitioning") {
    val model = Bpe.fitBpe(corpus, "text", numMerges = 5)
    val pieces = Seq((1L, "🙂🙂"))
      .toDF("doc_id", "text")
      .select(Bpe.encode(col("text"), model).as("p"))
      .collect().head.getSeq[String](0)
    assert(pieces == Seq("🙂", "🙂", "</w>")) // two code points, not four chars
    val again = Bpe.fitBpe(corpus.repartition(7), "text", numMerges = 5)
    assert(again == model)
  }

  test("pre-tokenization boundary: OOV unicode inflates piece counts (no byte fallback)") {
    // fit on ASCII English; score text whose characters the fit never
    // saw. With no byte-level fallback every OOV word degrades to one
    // piece PER CODE POINT (+ </w>) — quantify the inflation a
    // production byte-fallback tokenizer would not show.
    val model = Bpe.fitBpe(corpus, "text", numMerges = 5)
    val rows = Seq(
      (1L, "lowest newest"),   // in-domain: merges fire
      (2L, "наилучший новейший") // OOV cyrillic: code-point fallback
    ).toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.pieceCount(col("text"), model).as("n"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("words"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val (inDomain, inWords) = rows(1L)
    val (oov, oovWords) = rows(2L)
    // in-domain: ~2 pieces/word ("low"+"est</w>", "n ewest..." partial)
    assert(inDomain <= inWords * 4, s"in-domain count $inDomain for $inWords words")
    // OOV: exactly code points + 1 per word = 9+1 and 8+1 here — ~4x
    // the in-domain pieces-per-word rate
    assert(oov == 10 + 9, s"OOV must degrade to per-code-point pieces, got $oov")
    assert(oov.toDouble / oovWords > 2 * inDomain.toDouble / inWords,
      "unicode-heavy text must show the documented piece-count inflation")
  }

  test("byte fallback: OOV code points expand to <0xXX> pieces; known text unchanged") {
    val model = Bpe.fitBpe(corpus, "text", numMerges = 5)
    assert(model.alphabet == Set("l", "o", "w", "e", "r", "n", "s", "t", "i", "d"))
    val enc = Seq((1L, "lowest"), (2L, "и"), (3L, "x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.encode(col("text"), model, byteFallback = true).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // in-alphabet text encodes exactly as without fallback
    assert(enc(1L) == Seq("low", "est</w>"))
    // cyrillic и = UTF-8 0xD0 0xB8 -> two byte pieces + </w>
    assert(enc(2L) == Seq("<0xD0>", "<0xB8>", "</w>"))
    // 'x' is OOV for this tiny fit corpus too (single ASCII byte)
    assert(enc(3L) == Seq("<0x78>", "</w>"))
    // fallback requires an alphabet-carrying model
    intercept[IllegalArgumentException] {
      Bpe.encode(col("text"), Bpe.BpeModel(model.merges), byteFallback = true)
    }
  }

  test("GPT-2 pre-tokenizer: contractions and punctuation split, case/space kept, model-carried") {
    // pre-tokenization alone (expression level)
    val pre = Seq((1L, "Don't stop, won't stop!"))
      .toDF("doc_id", "text")
      .select(graft.functions.CatalystExpressions.gpt2PreTokenize(col("text")).as("p"))
      .collect().head.getSeq[String](0)
    assert(pre == Seq("Don", "'t", " stop", ",", " won", "'t", " stop", "!"),
      s"got $pre")

    // fit with the gpt2 pre-tokenizer: the model carries it, encode
    // reuses it, and the alphabet is case/space-aware
    val corpus2 = Seq.fill(4)((1L, "Don't stop, won't stop!")).zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = Bpe.fitBpe(corpus2, "text", numMerges = 3, preTokenizer = Bpe.Gpt2)
    assert(m.preTokenizer == Bpe.Gpt2)
    assert(m.alphabet.contains("D") && m.alphabet.contains(" "),
      "gpt2 alphabet preserves case and leading spaces")
    val enc = Seq((1L, "Don't"))
      .toDF("doc_id", "text")
      .select(Bpe.encode(col("text"), m).as("p"))
      .collect().head.getSeq[String](0)
    // "Don" and "'t" encode as separate pre-tokens, each with </w>
    assert(enc.count(_.endsWith("</w>")) == 2, s"got $enc")

    // whitespace-mode encode of the same text glues the punctuation
    val mWs = Bpe.fitBpe(corpus2, "text", numMerges = 3)
    assert(mWs.preTokenizer == Bpe.Whitespace)

    // preTokenizer round-trips through the artifact
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_g2").toString
    Bpe.save(spark, m, s"$dir/m")
    assert(Bpe.load(spark, s"$dir/m") == m)
  }

  test("merge table round-trips through parquet; min pair count stops noise merges") {
    val model = Bpe.fitBpe(corpus, "text", numMerges = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Bpe.save(spark, model, s"$dir/m")
    assert(Bpe.load(spark, s"$dir/m") == model)
    assert(Bpe.load(spark, s"$dir/m").alphabet.nonEmpty, "alphabet must round-trip")
    // asking for far more merges than the corpus supports stops at the
    // minPairCount floor instead of memorizing hapax pairs
    val capped = Bpe.fitBpe(corpus, "text", numMerges = 10000)
    assert(capped.merges.size < 50)
  }

  test("alphabet covers code points of word types dropped by the maxWordTypes cap") {
    // 3 word types, cap 2: the rare astral-clef word is dropped from
    // the merge histogram, but its code points are still corpus
    // alphabet — byteFallback must NOT byte-expand them (pre-cap
    // alphabet aggregate; also locks split("")'s surrogate safety)
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, astral plane
    val d = (Seq.fill(5)("low") ++ Seq.fill(4)("lower") ++ Seq(s"$clef"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val m = Bpe.fitBpe(d, "text", numMerges = 2, maxWordTypes = 2)
    assert(m.alphabet.contains(clef),
      s"alphabet must include dropped-word code points: ${m.alphabet}")
    val enc = Seq((1L, clef)).toDF("doc_id", "text")
      .select(Bpe.encode(col("text"), m, byteFallback = true).as("p"))
      .collect().head.getSeq[String](0)
    assert(enc == Seq(clef, "</w>"), s"in-alphabet char must not byte-expand: $enc")

    // uncapped fit of the same corpus agrees (single-job fast path)
    val mFull = Bpe.fitBpe(d, "text", numMerges = 2)
    assert(mFull.alphabet == m.alphabet)
  }

  test("GPT-2 pre-tokenizer treats Unicode whitespace as whitespace (NBSP, NEL)") {
    // NBSP (U+00A0), narrow NBSP (U+202F) and NEL (U+0085) are
    // White_Space: with ASCII-only \s they fell into the punctuation
    // alternative and leaked out as pre-tokens
    val pre = Seq((1L, "a\u00A0b\u0085c\u202Fd"))
      .toDF("doc_id", "text")
      .select(graft.functions.CatalystExpressions.gpt2PreTokenize(col("text")).as("p"))
      .collect().head.getSeq[String](0)
    assert(pre == Seq("a", "b", "c", "d"), s"got ${pre.map(_.codePoints().toArray.toSeq)}")
  }
}
