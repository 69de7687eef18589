package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * pure column expressions (codegen'd, no UDFs) so they run at full
  * scan speed over 100 TB of documents.
  *
  * Reference surface: token estimation
  * (`core/framework/graph/conversation.py:355-374` — chars/4
  * heuristic), canonical fingerprinting for dedup
  * (`core/framework/graph/event_loop_node.py:1895-1899`); the quality /
  * language-ID operators are the beyond-reference LLM-pipeline mandate.
  */
object TextFunctions {

  /** Whitespace tokens of lowercased, trimmed text; empty text → [].
    * Custom expression — one pass per row; the equivalent
    * `filter(split(lower(trim(.))))` evaluates interpreted lambdas.
    */
  def tokens(text: Column): Column = CatalystExpressions.tokenize(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** The reference's chars/4 token estimate (`conversation.py:355-374`). */
  def estimateTokens(text: Column): Column = ceil(length(text) / lit(4.0))

  /** BPE-ish subword count: word-piece regex splits on case/digit
    * boundaries and punctuation, approximating a BPE tokenizer's piece
    * count without a vocab file.
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(
      split(text, "(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=\\d)|(?<=\\d)(?=[A-Za-z])|[^A-Za-z0-9']+"),
      t => length(t) > 0))

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / length(text))

  /** Fraction of characters that are letters or spaces. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") / length(text))

  private val EnglishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "that", "this", "be")

  /** Fraction of tokens that are (English) stopwords — a standard
    * fluency signal in pretraining-data quality filters.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = array(EnglishStopwords.map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(stops, t))).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, a
    * healthy stopword ratio, and low punctuation noise (C4/Gopher-rule
    * flavored, reduced to pure column math).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    round((lenScore * 0.4 + stopScore * 0.3 + punctPenalty * 0.3), 4)
  }

  /** Stopword-profile language ID. Scores each candidate language by
    * its stopword hits over the token stream and returns the argmax
    * (ties → lexicographically first profile), "und" when no profile
    * matches. N-gram-free but the same shape as real fastText-style
    * heuristics; profiles are pluggable. Implemented as a custom
    * Catalyst expression (one tight loop per row — the HOF lambda
    * formulation evaluates interpreted and is ~15× slower).
    */
  def langIdHeuristic(text: Column,
      profiles: Map[String, Seq[String]] = DefaultLangProfiles): Column =
    CatalystExpressions.langId(tokens(text), profiles.toSeq.sortBy(_._1))

  val DefaultLangProfiles: Map[String, Seq[String]] = Map(
    "en" -> EnglishStopwords,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "por", "con", "para", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "pour", "dans", "est", "que", "au"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "von", "mit", "für"))

  /** The ordered (regex, replacement) chain behind [[htmlToText]] —
    * exposed so the DuckDB oracle can restate the identical pipeline.
    * RE2-compatible on purpose (no backreferences/lookaround): the
    * oracle engine must be able to run every pattern.
    */
  val HtmlToTextSteps: Seq[(String, String)] = Seq(
    "(?is)<script\\b[^>]*>.*?</script\\s*>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style\\s*>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "(?s)<[^>]*>" -> " ", // tags (incl. block closers) → separator
    "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'")

  /** HTML → text extraction (the kernel of the reference's
    * scrape-to-text surface, SURVEY S15: provider-side there,
    * engine-side here): drop script/style/comment blocks, strip tags,
    * decode the common entities, collapse whitespace, trim. Built
    * entirely from `regexp_replace` chains so it stays inside
    * whole-stage codegen and runs at scan speed over 100 TB of crawl
    * data — the first, highest-volume step of a web-corpus pipeline.
    */
  /** Unicode NFC normalization (see
    * [[CatalystExpressions.NormalizeNfc]]) — run this before
    * fingerprinting/dedup so canonically-equal strings share one byte
    * form. */
  def normalizeText(text: Column): Column = CatalystExpressions.normalizeNfc(text)

  def htmlToText(html: Column): Column =
    trim(regexp_replace(
      HtmlToTextSteps.foldLeft(html) { case (c, (p, r)) => regexp_replace(c, p, r) },
      "\\s+", " "))

  /** The ordered (regex, replacement) chain behind [[markdownToText]].
    * RE2-compatible patterns (no backreferences/lookaround — the
    * setext/hr rules are split per character instead of using `\1`).
    * Replacements may use `$1` (Java syntax); the oracle generator
    * rewrites to RE2's `\1`. Underscore emphasis is deliberately NOT
    * stripped: `snake_case` identifiers are ubiquitous in crawled
    * technical text and the collateral damage outweighs the markup.
    */
  val MarkdownToTextSteps: Seq[(String, String)] = Seq(
    "!\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1", // images (before links: the ! prefix)
    "\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1", // links -> anchor text
    "(?m)^```[^\n]*$" -> " ", // fence markers go, fenced body stays
    "`([^`]*)`" -> "$1", // inline code ticks
    "(?m)^#{1,6}[ \t]+" -> "", // ATX headers
    "(?m)^>[ \t]?" -> "", // blockquotes
    "(?m)^[-*+][ \t]+" -> "", // list bullets
    "\\*{1,3}([^*]+)\\*{1,3}" -> "$1", // *emphasis* / **bold**
    "(?m)^-{3,}[ \t]*$" -> " ", // hr / setext dashes
    "(?m)^={3,}[ \t]*$" -> " ") // setext equals

  /** Markdown → text extraction — [[htmlToText]]'s sibling for the
    * second-most-common crawl format (READMEs, forums, docs sites).
    * Same design: a `regexp_replace` chain that stays inside
    * whole-stage codegen and restates verbatim in the oracle engine.
    */
  def markdownToText(md: Column): Column =
    trim(regexp_replace(
      MarkdownToTextSteps.foldLeft(md) { case (c, (p, r)) => regexp_replace(c, p, r) },
      "\\s+", " "))

  /** Order-sensitive rolling fingerprint over the token sequence — the
    * document-fingerprint analog of the reference's canonical
    * fingerprints (`event_loop_node.py:1895-1899`). Implemented as a
    * chained xxhash64 fold (hash(acc, token)) rather than polynomial
    * multiply-add: same order sensitivity, no ANSI overflow, one
    * fused custom expression ([[CatalystExpressions.RollingFingerprint]]
    * — the `aggregate()` HOF formulation evaluated interpreted).
    */
  def rollingHashFingerprint(text: Column): Column =
    CatalystExpressions.rollingFingerprint(text, 1125899906842597L)

  /** Content-defined exact-dedup fingerprint: md5 of
    * whitespace-normalized lowercased text (stable across engines).
    */
  def exactFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  private val PositiveWords = Seq(
    "good", "great", "excellent", "fast", "happy", "love", "best",
    "success", "win", "improve", "easy", "clean")
  private val NegativeWords = Seq(
    "bad", "slow", "terrible", "fail", "error", "hate", "worst",
    "broken", "bug", "crash", "hard", "dirty")

  /** Lexicon sentiment score in [-1, 1]: (pos − neg) / max(pos+neg, 1)
    * over the token stream — the engine-side analog of the reference's
    * provider-routed `news_sentiment` (SURVEY §2.7 "Sentiment /
    * scoring"); lexicons are pluggable.
    */
  def sentimentScore(text: Column,
      positive: Seq[String] = PositiveWords,
      negative: Seq[String] = NegativeWords): Column = {
    val toks = tokens(text)
    val pos = size(filter(toks, t => array_contains(array(positive.map(lit): _*), t)))
    val neg = size(filter(toks, t => array_contains(array(negative.map(lit): _*), t)))
    round((pos - neg).cast("double") / greatest(pos + neg, lit(1)), 4)
  }
}
