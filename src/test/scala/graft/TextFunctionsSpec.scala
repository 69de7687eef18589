package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(1).toDF("x").select(c).head()

  test("stratifiedSample: hash-based selection is partition-invariant and appends-stable") {
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    val fr = Map("en" -> 0.5, "de" -> 0.3)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.operators.TextOps.stratifiedSample(df, "lang", "doc_id", fr)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val base = ids(docs)
    assert(base.nonEmpty)
    // same set under a different partitioning (rand-based sampling breaks this)
    assert(ids(docs.repartition(17)) === base)
    assert(ids(docs.orderBy(desc("doc_id"))) === base)
    // appends never flip earlier decisions: the old corpus's sample is
    // a strict subset of the grown corpus's sample
    val half = docs.filter(col("doc_id") < 250)
    assert(ids(half).subsetOf(base))
    // strata without a configured fraction are dropped
    val langs = graft.operators.TextOps.stratifiedSample(docs, "lang", "doc_id", fr)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de")))
  }

  test("packSequences: sharded decomposition equals the global-window definition") {
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def bins(shards: Int): Map[Long, Long] =
      graft.operators.TextOps.packSequences(docs, "doc_id", 2048L, shards = shards)
        .select("doc_id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sharded = bins(8)
    assert(sharded === bins(1), "shard count must not change bin assignment")
    // bins are monotone in order and start at 0
    val byDoc = sharded.toSeq.sortBy(_._1).map(_._2)
    assert(byDoc.head == 0L)
    assert(byDoc.zip(byDoc.tail).forall { case (a, b) => b >= a })
    // a bin break happens exactly when the running span crosses the budget
    val toks = graft.operators.TextOps.packSequences(docs, "doc_id", 2048L)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var running = 0L
    toks.toSeq.sortBy(_._1).foreach { case (id, n) =>
      assert(sharded(id) == running / 2048L, s"doc $id bin mismatch")
      running += n
    }
  }

  test("tokenCount handles empty, padded, multi-space text") {
    assert(one(TF.tokenCount(lit(""))).getInt(0) == 0)
    assert(one(TF.tokenCount(lit("  hello   world  "))).getInt(0) == 2)
    assert(one(TF.tokenCount(lit("a b c"))).getInt(0) == 3)
  }

  test("estimateTokens is the reference chars/4 heuristic") {
    assert(one(TF.estimateTokens(lit("12345678"))).getLong(0) == 2L)
    assert(one(TF.estimateTokens(lit("123456789"))).getLong(0) == 3L)
  }

  test("bpe-ish token count splits case/digit boundaries") {
    assert(one(TF.bpeishTokenCount(lit("camelCase99x"))).getInt(0) == 4)
  }

  test("punct and alpha ratios") {
    assert(one(TF.punctRatio(lit("ab!?"))).getDouble(0) == 0.5)
    assert(one(TF.punctRatio(lit(""))).getDouble(0) == 0.0)
    assert(one(TF.alphaRatio(lit("ab12"))).getDouble(0) == 0.5)
  }

  test("stopword ratio and quality score ranges") {
    assert(one(TF.stopwordRatio(lit("the cat and the dog"))).getDouble(0) == 0.6)
    val q = one(TF.qualityScore(lit("the quick brown fox is near the lazy dog"))).getDouble(0)
    assert(q > 0.0 && q <= 1.0)
  }

  test("sentiment score: lexicon polarity in [-1,1]") {
    assert(one(TF.sentimentScore(lit("this is great and i love it"))).getDouble(0) == 1.0)
    assert(one(TF.sentimentScore(lit("terrible slow broken mess"))).getDouble(0) == -1.0)
    assert(one(TF.sentimentScore(lit("good but slow"))).getDouble(0) == 0.0)
    assert(one(TF.sentimentScore(lit("neutral words only here"))).getDouble(0) == 0.0)
  }

  test("htmlToText strips scripts/styles/comments/tags and decodes entities") {
    val html = """<html><head><style>p { color: red }</style>
      |<script type="text/js">if (1 < 2) { track("</p>"); }</script></head>
      |<body><!-- nav --><h1>Big&nbsp;News</h1>
      |<p>Ben &amp; Jerry said &quot;5 &lt; 7&quot;.</p>
      |<div>line one<br/>line two</div></body></html>""".stripMargin
    assert(one(TF.htmlToText(lit(html))).getString(0) ==
      """Big News Ben & Jerry said "5 < 7". line one line two""")
    // plain text passes through normalized
    assert(one(TF.htmlToText(lit("  just   text  "))).getString(0) == "just text")
  }

  test("language id picks the profile with highest stopword hit rate") {
    assert(one(TF.langIdHeuristic(lit("the cat and the dog is here"))).getString(0) == "en")
    assert(one(TF.langIdHeuristic(lit("el perro y la casa en un pueblo"))).getString(0) == "es")
    assert(one(TF.langIdHeuristic(lit("der Hund und die Katze ist hier"))).getString(0) == "de")
    assert(one(TF.langIdHeuristic(lit("xyzzy plugh qwerty"))).getString(0) == "und")
  }

  test("deflateRatio: repetitive text compresses far below prose; empty is 1.0") {
    import graft.functions.CatalystExpressions
    def ratio(s: String): Double =
      one(CatalystExpressions.deflateRatio(lit(s))).getDouble(0)
    val boiler = "click here to subscribe now! " * 100
    val prose = (1 to 100).map(i => s"w${i * 7919 % 1000}x${i}").mkString(" ")
    assert(ratio(boiler) < 0.1, s"boilerplate should crush: ${ratio(boiler)}")
    assert(ratio(prose) > 0.3, s"high-entropy text should not: ${ratio(prose)}")
    assert(ratio("") == 1.0)
    // deterministic across calls (fixed level, fresh Deflater per call)
    assert(ratio(boiler) == ratio(boiler))
    // codegen path agrees with interpreted eval
    val df = Seq(boiler, prose, "").toDF("t")
    val viaPlan = df.select(CatalystExpressions.deflateRatio(col("t")))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaPlan == Seq(ratio(boiler), ratio(prose), 1.0))
  }

  test("groupAwareSplit: groups never straddle splits; assignment is partition-invariant") {
    val docs = graft.core.Engine.table(spark, sfDir, "documents")
    val split = graft.operators.TextOps.groupAwareSplit(docs, "source")
    // every source maps to exactly one split
    val perGroup = split.groupBy("source")
      .agg(countDistinct(col("split")).as("k")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L), "a group straddled splits")
    // rows follow their group, regardless of physical layout
    val a = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.operators.TextOps.groupAwareSplit(docs.repartition(13), "source")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // weights steer proportions: over many synthetic groups the split
    // frequencies approach the ladder (coarse band, it's a hash)
    val groups = (1 to 2000).map(i => s"g$i").toDF("g")
    val frac = graft.operators.TextOps.groupAwareSplit(groups, "g",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(frac("train") - 1600.0) < 120, s"train share off: $frac")
    assert(frac.values.sum == 2000L)
  }

  test("fixMojibake repairs UTF-8-as-1252 text, passes clean text untouched") {
    import spark.implicits._
    def fix(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(graft.functions.CatalystExpressions.fixMojibake(col("t")))
        .head().getString(0)
    // the classic single-encode smells: Latin-1 and 1252-block leads
    assert(fix("cafÃ©") == "café")
    assert(fix("donâ€™t â€œquoteâ€\u009d me") == "don’t “quote” me")
    assert(fix("naÃ¯ve rÃ©sumÃ©") == "naïve résumé")
    assert(fix("ok â€” ok") == "ok — ok") // em dash: E2 80 94 seen as 1252
    // double-encoded survives two rounds
    assert(fix("cafÃƒÂ©") == "café")
    // clean text — including a legitimate standalone Ã — is untouched
    assert(fix("plain ascii text.") == "plain ascii text.")
    assert(fix("o Ã é uma letra") == "o Ã é uma letra",
      "a repair that does not reduce markers must not apply")
    assert(fix("日本語のテキスト") == "日本語のテキスト", "non-Latin text is not a candidate")
    // idempotent: repairing repaired text is the identity
    assert(fix(fix("donâ€™t")) == fix("donâ€™t"))
    // null stays null
    val n = Seq(Tuple1(null: String)).toDF("t")
      .select(graft.functions.CatalystExpressions.fixMojibake(col("t"))).head()
    assert(n.isNullAt(0))
  }
}
