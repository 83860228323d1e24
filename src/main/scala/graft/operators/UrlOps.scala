package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus URL operations — the curation primitives a crawl-scale
  * training-data pipeline runs before any text-level dedup: URL
  * canonicalization (so trivially-distinct URLs of the same resource
  * collapse), registrable-domain extraction (so caps and audits
  * group by the OWNER, not the hostname), and per-domain caps/shares
  * (the C4/RefinedWeb corpus-balance pattern: no single domain may
  * dominate the corpus).
  *
  * Everything here is a composition of codegen'd Spark builtins
  * (regexp/array functions) — no UDFs, no shuffles beyond the
  * declared aggregations — so canonicalization fuses into the scan's
  * whole-stage codegen and the cap/share operators are one window or
  * one aggregate each. Scale shape: canonicalize is embarrassingly
  * row-parallel; domainCap is a single hash-partitioned window by
  * domain (skew note: a mega-domain concentrates its rows on one
  * task — cap k is tiny, so a pre-aggregation would save nothing;
  * the window only materializes row_number ≤ k after the filter);
  * domainShares is one aggregate plus a scalar total.
  *
  * The reference corpus (SURVEY §1) is CSV-resident with no URLs;
  * these are the engine's scale-path extensions (SURVEY §2.10
  * policy), exercised over deterministically DERIVED URLs in the
  * driver queries so both engines see identical inputs.
  */
object UrlOps {

  /** Query parameters dropped during canonicalization: tracking
    * params that vary per click while identifying the same resource
    * (the k_anonymity-style closed list — documented, not
    * heuristic).
    */
  val trackingParamPattern: String =
    "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|ref|igshid)="

  /** Canonicalize an absolute http(s) URL for dedup-grouping:
    *
    *  1. fragment dropped (client-side only);
    *  2. scheme and host lowercased; userinfo dropped; a leading
    *     `www.` dropped (the dedup-canonical convention — the
    *     variant hosts serve the same resource in practice);
    *  3. default ports dropped (`:80` for http, `:443` for https),
    *     any other explicit port kept;
    *  4. path: runs of `/` collapse to one, a trailing `/` drops
    *     unless the path is exactly `/`, an empty path becomes `/`;
    *  5. query: split on `&`, empty and tracking params
    *     ([[trackingParamPattern]]) drop, the survivors SORT
    *     byte-lexicographically and rejoin — param order never
    *     distinguishes resources; an empty survivor set drops the
    *     `?` entirely.
    *
    * Pure string/array builtins end to end — stays inside
    * whole-stage codegen, safe to apply in the scan projection of a
    * 100 TB crawl. Percent-encoding is NOT normalized (a lossy
    * rewrite without a full RFC 3986 table; out of scope, noted).
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(
      regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = regexp_replace(
      lower(regexp_extract(rest, "^([^/?]*)", 1)), "^[^@]*@", "")
    val hostPort = regexp_replace(auth, "^www\\.", "")
    val host = regexp_replace(hostPort, ":[0-9]+$", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val collapsed = regexp_replace(
      regexp_extract(rest, "^[^/?]*([^?]*)", 1), "/{2,}", "/")
    val noTrail = when(collapsed =!= "/",
      regexp_replace(collapsed, "/$", "")).otherwise(collapsed)
    val path = when(noTrail === "", lit("/")).otherwise(noTrail)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike(trackingParamPattern))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** The host of a canonical URL (post-[[canonicalizeUrl]] shape:
    * `scheme://host[:port]/...`).
    */
  def canonicalHost(canonical: Column): Column =
    regexp_replace(
      regexp_extract(canonical, "^[a-z][a-z0-9+.-]*://([^/?:]*)", 1),
      "^www\\.", "")

  /** Multi-label public suffixes recognized by
    * [[registrableDomain]] — the high-traffic two-label subset of
    * the public-suffix idea (country-code second-level domains).
    * A full PSL is a data file a deployment would broadcast; the
    * closed subset keeps the operator deterministic offline and the
    * contract explicit.
    */
  val twoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "co.kr", "com.br", "com.mx", "co.in", "co.za", "com.cn",
    "com.tw", "com.sg", "co.nz", "com.ar", "com.tr", "co.il",
    "com.hk", "co.th", "com.my", "co.id", "com.ph", "com.vn",
    "com.eg")

  /** The registrable ("owner") domain of a host: the last two
    * labels, or the last three when the last two form a recognized
    * multi-label public suffix ([[twoLabelSuffixes]]) — so
    * `a.b.example.co.uk` → `example.co.uk` and `sub.example.com` →
    * `example.com`. A bare single-label host passes through
    * unchanged. Pure array builtins; codegen-safe.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3),
      element_at(labels, -2), element_at(labels, -1))
    val suffixes = typedLit(twoLabelSuffixes)
    when(n <= 1, host)
      .when(n >= 3 && array_contains(suffixes, last2), last3)
      .otherwise(last2)
  }

  /** Per-domain cap (the C4/RefinedWeb balance rule): keep at most
    * `k` rows per registrable domain, best-first by `order`
    * (ties MUST be broken to a total order upstream — pass e.g.
    * `Seq(col("quality").desc, col("doc_id"))`). One
    * hash-partitioned window; emits (the input columns) + `domain`
    * + `rk` for audit.
    */
  def domainCap(
      df: DataFrame, urlCol: String, k: Int, order: Seq[Column])
      : DataFrame = {
    require(k >= 1, s"k: $k")
    val withDomain = df.withColumn("domain",
      registrableDomain(canonicalHost(canonicalizeUrl(col(urlCol)))))
    val w = Window.partitionBy(col("domain")).orderBy(order: _*)
    withDomain
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Per-domain corpus share audit: docs and characters per
    * registrable domain plus each domain's exact ppm share of the
    * corpus (integer `div` lattice — both engines agree exactly).
    * One aggregate + a broadcast scalar total.
    */
  def domainShares(
      df: DataFrame, urlCol: String, charsCol: String): DataFrame = {
    val perDomain = df
      .select(registrableDomain(
          canonicalHost(canonicalizeUrl(col(urlCol)))).as("domain"),
        col(charsCol).cast("long").as("__chars"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__chars")).as("chars"))
    val total = perDomain.agg(sum(col("n_docs")).as("__t"))
    perDomain.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"), col("chars"),
        expr("(n_docs * CAST(1000000 AS BIGINT)) div __t")
          .as("share_ppm"))
  }
}
