package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CatalystExpressions

/** URL canonicalization and per-domain curation — the crawl-scale
  * front door (CCNet/C4 style) ahead of the dedup/quality family:
  * canonicalize URLs so per-URL dedup keys are stable, aggregate and
  * gate by domain, and drop blocklisted domains (including their
  * subdomains) before any expensive text pass. The reference has no
  * URL surface (its ingestion is connector-based); this is a
  * beyond-reference extension for the 100 TB pipeline mandate.
  *
  * Scale design: canonicalization and domain extraction are map-only
  * codegen'd expressions; domain aggregation is one groupBy on a
  * low-cardinality key; blocklisting against a driver-side list is a
  * map-only filter, and against a blocklist FRAME it is a
  * suffix-explode + broadcast anti-join (equality only — never a
  * per-row × per-rule `endsWith` theta-join, which plans as a nested
  * loop at corpus scale).
  */
object UrlOps {

  /** Canonical URL ([[CatalystExpressions.CanonicalUrl]]): lowercased
    * scheme/host, default port + fragment dropped, empty path → "/",
    * tracking params (`utm_*`, gclid, fbclid, …) removed, surviving
    * params sorted.
    */
  def canonicalUrl(url: Column): Column = CatalystExpressions.canonicalUrl(url)

  /** Curation domain key: canonical host, one leading `www.` removed;
    * null for strings that are not absolute URLs.
    */
  def urlDomain(url: Column): Column = CatalystExpressions.urlDomain(url)

  /** Per-domain document counts and corpus share. One aggregate on the
    * domain key; the grand total broadcasts back (a 1-row frame), so
    * no single-partition window is involved.
    */
  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val counts = df.select(urlDomain(col(urlCol)).as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("__t"))
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n_docs").cast("double") / col("__t").cast("double"), 6))
      .drop("__t")
  }

  /** Drop rows whose domain matches any of a DRIVER-SIDE blocklist
    * (exact, or any subdomain when `matchSubdomains`). Map-only — the
    * predicate compiles into the scan filter; suitable for policy
    * lists up to a few thousand entries (beyond that, use
    * [[blocklistAntiJoin]]).
    */
  def blocklistFilter(df: DataFrame, urlCol: String, blocked: Seq[String],
      matchSubdomains: Boolean = true): DataFrame = {
    if (blocked.isEmpty) return df
    val dom = urlDomain(col(urlCol))
    val hit = blocked.map { b =>
      val exact = dom === lit(b)
      if (matchSubdomains) exact || dom.endsWith(lit("." + b)) else exact
    }.reduce(_ || _)
    // non-URL rows (null domain) are kept: the blocklist is a domain
    // policy, not a validity filter
    df.filter(!coalesce(hit, lit(false)))
  }

  /** Domain-level quality gate (the C4/CCNet "domain filter" step):
    * keep only rows whose domain's MEAN `scoreCol` clears
    * `minMeanScore` over at least `minDocs` documents — low-quality
    * and too-thin domains fall as a unit, which is the right
    * granularity for crawl provenance (one bad domain poisons all its
    * pages; a 2-page domain's mean is noise). Rows without a domain
    * (non-URL provenance) are dropped: a provenance gate cannot vouch
    * for them.
    *
    * Scale shape: ONE aggregate on the low-cardinality domain key
    * (map-side partials), the good-domain list broadcasts back as a
    * semi-join — the corpus itself never shuffles.
    */
  def domainQualityGate(df: DataFrame, urlCol: String, scoreCol: String,
      minMeanScore: Double, minDocs: Long = 1L): DataFrame = {
    val withDom = df.withColumn("__dom", urlDomain(col(urlCol)))
    val good = withDom.filter(col("__dom").isNotNull)
      .groupBy(col("__dom"))
      .agg(avg(col(scoreCol)).as("__m"), count(lit(1)).as("__n"))
      .filter(col("__m") >= minMeanScore && col("__n") >= minDocs)
      .select(col("__dom"))
    withDom.join(broadcast(good), Seq("__dom"), "left_semi").drop("__dom")
  }

  /** The domain itself plus every proper dot-suffix with at least two
    * labels (`a.b.c.d` → [a.b.c.d, b.c.d, c.d]; `localhost` →
    * [localhost]) — the equi-join form of subdomain matching. The
    * two-label floor on PROPER suffixes means a blocklist entry can
    * never act as a bare TLD, while exact matches (including
    * single-label intranet hosts) always work. The `greatest` guard
    * matters: `sequence(0, -1)` is a DESCENDING sequence in Spark and
    * the resulting `slice(…, 0, …)` throws.
    */
  private[operators] def domainSuffixes(domain: Column): Column = {
    val parts = split(domain, "\\.")
    transform(sequence(lit(0), greatest(size(parts) - lit(2), lit(0))),
      i => array_join(slice(parts, i + 1, size(parts) - i), "."))
  }

  /** Drop rows whose domain is, or is a subdomain of, any domain in
    * the blocklist FRAME (`blockCol`, exact registrable domains). The
    * scalable form: each row explodes into its ≤ #labels dot-suffixes
    * and anti-joins the blocklist on EQUALITY — the blocklist
    * broadcasts (policy tables are small next to the corpus), so the
    * whole gate is map-side with no shuffle of the corpus.
    */
  def blocklistAntiJoin(df: DataFrame, urlCol: String,
      blocklist: DataFrame, blockCol: String): DataFrame = {
    val withDom = df.withColumn("__dom", urlDomain(col(urlCol)))
    val hits = withDom
      .select(col("__dom"))
      .filter(col("__dom").isNotNull)
      .select(col("__dom"), explode(domainSuffixes(col("__dom"))).as("__sfx"))
      .join(broadcast(blocklist.select(col(blockCol).as("__sfx"))), Seq("__sfx"))
      .select(col("__dom")).distinct()
    withDom.join(broadcast(hits), Seq("__dom"), "left_anti").drop("__dom")
  }
}
