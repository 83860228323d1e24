package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class UrlOpsSpec extends SparkSuite {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalizeUrl: case, userinfo, www, default port, slash " +
      "runs, trailing slash, fragment, tracking params, and param " +
      "order all normalize away; real distinctions survive") {
    assert(canon(
      "HTTPS://User:Pw@WWW.Example.CO.UK:443//a//b/?utm_source=x&b=2&a=1#frag")
      === Seq("https://example.co.uk/a/b?a=1&b=2"))
    // non-default port and root path survive
    assert(canon("http://Host.COM:8080/") === Seq("http://host.com:8080/"))
    // empty path becomes /; default http port drops
    assert(canon("http://example.com:80") === Seq("http://example.com/"))
    // all-tracking query drops the ? entirely
    assert(canon("https://x.com/p?utm_a=1&gclid=z")
      === Seq("https://x.com/p"))
    // param sort is byte-lexicographic; empties drop
    assert(canon("https://x.com/p?b=2&&a=10&a=2")
      === Seq("https://x.com/p?a=10&a=2&b=2"))
    // distinct resources stay distinct
    assert(canon("https://x.com/p?a=1", "https://x.com/p?a=2").distinct.size === 2)
  }

  test("registrableDomain: last-2 default, last-3 under multi-label " +
      "public suffixes, single-label passthrough") {
    val out = Seq("a.b.example.com", "example.co.uk",
      "deep.sub.example.co.uk", "co.uk", "localhost", "example.org")
      .toDF("h").select(UrlOps.registrableDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("example.com", "example.co.uk", "example.co.uk",
      "co.uk", "localhost", "example.org"))
  }

  test("domainCap keeps exactly k best-ordered rows per registrable " +
      "domain; domainShares lands on the exact ppm lattice") {
    val docs = Seq(
      (1L, "https://a.example.com/1", 50L),
      (2L, "https://b.example.com/2", 90L),
      (3L, "https://example.com/3", 70L),
      (4L, "https://other.org/x", 10L))
      .toDF("doc_id", "url", "n_chars")
    val capped = UrlOps.domainCap(docs, "url", 2,
        Seq(col("n_chars").desc, col("doc_id")))
      .select(col("domain"), col("doc_id"), col("rk"))
      .orderBy(col("domain"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(capped === Array(("example.com", 2L, 1L),
      ("example.com", 3L, 2L), ("other.org", 4L, 1L)))
    val shares = UrlOps.domainShares(docs, "url", "n_chars")
      .orderBy(col("domain"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(shares === Array(("example.com", 3L, 750000L),
      ("other.org", 1L, 250000L)))
  }
}
