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

  /** The pre-r13 closed two-label suffix subset — now the documented
    * FALLBACK rule base [[graft.functions.PublicSuffixes]] uses when
    * the bundled PSL snapshot resource is absent (a stripped jar).
    * The primary rule base is the pinned Public Suffix List snapshot
    * at `src/main/resources/public_suffix_list.dat` (full grammar:
    * 3+-label suffixes like `pvt.k12.ma.us`, wildcards `*.ck`,
    * exceptions `!www.ck`, private suffixes like `github.io`).
    */
  val twoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "co.kr", "com.br", "com.mx", "co.in", "co.za", "com.cn",
    "com.tw", "com.sg", "co.nz", "com.ar", "com.tr", "co.il",
    "com.hk", "co.th", "com.my", "co.id", "com.ph", "com.vn",
    "com.eg")

  /** The registrable ("owner") domain of a host under the Public
    * Suffix List ([[graft.functions.PublicSuffixes]]): public suffix
    * + one label, with the full PSL grammar — `a.b.example.co.uk` →
    * `example.co.uk`, `sub.example.com` → `example.com`, `a.x.github
    * .io` → `x.github.io` (private suffix), `x.pvt.k12.ma.us` →
    * itself (4-label suffix), `b.a.ck` → itself (wildcard `*.ck`),
    * `a.www.ck` → `www.ck` (exception). A host that IS a public
    * suffix (or a bare label) passes through unchanged — the dedup-
    * grouping convention. A native codegen expression (static hash
    * probes per row, no UDF, no broadcast): fuses into the scan
    * projection like the rest of the layer.
    */
  def registrableDomain(host: Column): Column =
    graft.functions.registrable_domain(host)

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
