package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlOps

/** URL canonicalization + per-domain curation: rule-by-rule fixtures
  * for the string surgery (the oracle gates q96/q97 prove the corpus
  * composition; this pins each rule in isolation).
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("u")
      .select(UrlOps.canonicalUrl(col("u"))).head().getString(0)

  private def dom(url: String): Option[String] =
    Option(Seq(Tuple1(url)).toDF("u")
      .select(UrlOps.urlDomain(col("u"))).head().getString(0))

  test("canonicalUrl: case, default ports, fragments, tracking params, param sort") {
    assert(canon("HTTPS://WWW.Example.COM:443/a/1?utm_source=rss&b=2&a=1#top")
      == "https://www.example.com/a/1?a=1&b=2")
    assert(canon("http://example.com:80/index") == "http://example.com/index")
    assert(canon("https://cdn.EXAMPLE.com:8443/x?gclid=g&z=9")
      == "https://cdn.example.com:8443/x?z=9")
    assert(canon("http://example.com") == "http://example.com/")
    // non-default port on the other scheme is kept
    assert(canon("http://example.com:443/") == "http://example.com:443/")
    // all params tracking → no '?' at all
    assert(canon("https://e.com/p?utm_campaign=x&fbclid=1&ref=z") == "https://e.com/p")
    // path case is preserved; userinfo preserved case-sensitively
    assert(canon("https://User:Pw@Ex.COM/Path") == "https://User:Pw@ex.com/Path")
    // not an absolute URL → trimmed passthrough, never invented structure
    assert(canon("  not a url  ") == "not a url")
    // non-numeric colon suffix is host material, not a port
    assert(canon("http://host:notaport/") == "http://host:notaport/")
  }

  test("urlDomain: strips one www., null for non-URLs") {
    assert(dom("HTTPS://WWW.Example.COM:443/x").contains("example.com"))
    assert(dom("https://cdn.example.com/x").contains("cdn.example.com"))
    assert(dom("https://www.www.example.com/").contains("www.example.com"))
    assert(dom("not a url").isEmpty)
  }

  test("blocklist: exact + subdomain matching with dot boundaries (filter == anti-join)") {
    val d = Seq(
      (1L, "https://src1.example.com/a"),
      (2L, "https://cdn.src1.example.com/b"),   // subdomain → blocked
      (3L, "https://src10.example.com/c"),      // dot boundary → kept
      (4L, "https://www.src1.example.com/d"),   // www-strip → exact → blocked
      (5L, "https://other.org/e"),
      (6L, "no url here")                       // null domain → kept
    ).toDF("doc_id", "url")
    val filtered = UrlOps.blocklistFilter(d, "url", Seq("src1.example.com"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(filtered == Set(3L, 5L, 6L), s"got $filtered")

    val viaJoin = UrlOps.blocklistAntiJoin(d, "url",
        Seq("src1.example.com").toDF("domain"), "domain")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaJoin == filtered)

    // single-label domains (intranet hosts) must not crash the suffix
    // explode (sequence(0,-1) is DESCENDING in Spark); they block
    // exactly, while a bare-TLD blocklist entry never matches by suffix
    val intranet = Seq((10L, "http://localhost/x"), (11L, "http://a.b/y"))
      .toDF("doc_id", "url")
    val kept2 = UrlOps.blocklistAntiJoin(intranet, "url",
        Seq("localhost", "b").toDF("domain"), "domain")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(11L), s"got $kept2") // a.b's only suffix is 'a.b'; 'b' is a bare TLD
  }

  test("domainQualityGate keeps whole domains by mean score and minDocs") {
    val d = Seq(
      (1L, "https://good.com/1", 0.9), (2L, "https://good.com/2", 0.7),
      (3L, "https://bad.com/3", 0.9), (4L, "https://bad.com/4", 0.1), // mean 0.5 < 0.6
      (5L, "https://thin.com/5", 1.0),                                // < minDocs
      (6L, "not a url", 1.0)                                          // no provenance
    ).toDF("doc_id", "url", "q")
    val kept = UrlOps.domainQualityGate(d, "url", "q",
        minMeanScore = 0.6, minDocs = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"got $kept")
  }

  test("domainStats shares sum to 1 over the surviving corpus") {
    val d = Seq(
      (1L, "https://a.com/1"), (2L, "https://a.com/2"),
      (3L, "https://b.com/3"), (4L, "https://www.a.com/4")
    ).toDF("doc_id", "url")
    val stats = UrlOps.domainStats(d, "url")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(stats("a.com") == ((3L, 0.75)) && stats("b.com") == ((1L, 0.25)))
  }
}
