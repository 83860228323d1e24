package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Public Suffix List matching (publicsuffix.org) for registrable-
  * ("owner"-) domain extraction — the rule base behind
  * [[graft.operators.UrlOps.registrableDomain]]. The list ships as a
  * pinned snapshot at `src/main/resources/public_suffix_list.dat`
  * (the full grammar is parsed — exact, `*.` wildcard and `!`
  * exception rules, ICANN and private sections alike — so a
  * deployment swaps in the full upstream file with no code change);
  * when the resource is missing the loader falls back to
  * [[graft.operators.UrlOps.twoLabelSuffixes]], the documented
  * closed offline subset that was the whole rule base before r13.
  *
  * Matching follows the published PSL algorithm with one documented
  * divergence: when the host IS a public suffix (or shorter), the
  * host passes through unchanged instead of yielding null — the
  * dedup-grouping convention [[graft.operators.UrlOps]] has always
  * used (a corpus row keyed by a bare suffix still needs SOME dedup
  * key). Formally:
  *
  *  - a rule matches when the host's trailing labels equal the rule
  *    (a `*` consumes exactly one extra label);
  *  - an exception rule beats every other match and makes the public
  *    suffix one label SHORTER than itself (`!www.ck` ⇒ suffix `ck`);
  *  - otherwise the longest match wins; no match ⇒ the default rule
  *    (suffix = the last label);
  *  - registrable domain = public suffix + one label, clamped to the
  *    host itself when it has no extra labels.
  *
  * Hosts are expected lowercase (canonicalizeUrl lowercases before
  * this); punycode/IDNA is out of scope — rules and hosts compare as
  * the byte strings the scan produced.
  *
  * Scale shape: the rule sets are STATIC JVM state (loaded once per
  * executor from the classpath, never broadcast, never shuffled) and
  * lookup is O(host labels) hash probes inside whole-stage codegen —
  * the shape that survives a 100 TB scan. The DuckDB oracles replay
  * the same rules via [[oracleValuesSql]], generated from this loader
  * so both engines share one source of truth.
  */
object PublicSuffixes {

  /** Parsed rule base: exact rules, wildcard BASES (`*.ck` stores
    * `ck`), exception rules (stored without the `!`), and the max
    * label count across match strings (the probe-loop bound).
    */
  final case class Rules(
      exact: Set[String], wild: Set[String], exc: Set[String]) {
    val maxLabels: Int =
      ((exact.iterator ++ wild.iterator ++ exc.iterator)
        .map(_.count(_ == '.') + 1) ++ Iterator(1)).max
  }

  private def parse(lines: Iterator[String]): Rules = {
    var exact = Set.empty[String]
    var wild = Set.empty[String]
    var exc = Set.empty[String]
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
      .foreach { l =>
        if (l.startsWith("!")) exc += l.substring(1)
        else if (l.startsWith("*.")) wild += l.substring(2)
        else if (l != "*") exact += l
      }
    Rules(exact, wild, exc)
  }

  /** The active rule base: the bundled snapshot, or the closed
    * two-label fallback when the resource is absent (a stripped
    * deployment jar) — never an exception at class-init.
    */
  val rules: Rules = {
    val res = Option(getClass.getResourceAsStream("/public_suffix_list.dat"))
    res match {
      case Some(in) =>
        try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
        finally in.close()
      case None =>
        Rules(graft.operators.UrlOps.twoLabelSuffixes.toSet,
          Set.empty, Set.empty)
    }
  }

  /** Label count of the host's public suffix under [[rules]]. */
  def publicSuffixLabels(host: String): Int =
    publicSuffixLabels(host.split('.'))

  /** [[publicSuffixLabels]] over a pre-split label array — the
    * per-row hot path ([[registrable]]) splits the host ONCE and
    * passes the labels to both steps.
    */
  def publicSuffixLabels(ls: Array[String]): Int = {
    val n = ls.length
    var best = 1
    var excLen = -1
    val kMax = math.min(n, rules.maxLabels + 1)
    var k = 1
    var lastk: String = null
    while (k <= kMax) {
      lastk = if (k == 1) ls(n - 1) else ls(n - k) + "." + lastk
      if (rules.exc.contains(lastk) && k - 1 > excLen) excLen = k - 1
      if (rules.exact.contains(lastk) && k > best) best = k
      // a wildcard base match makes the NEXT label part of the suffix
      if (rules.wild.contains(lastk) && k + 1 > best) best = k + 1
      k += 1
    }
    if (excLen >= 0) math.max(excLen, 1) else best
  }

  /** Registrable domain of a lowercase host — public suffix + one
    * label, pass-through when the host has no extra labels. Static
    * and allocation-light: called per row from codegen.
    */
  def registrable(host: String): String = {
    if (host.isEmpty || host.indexOf('.') < 0) return host
    val ls = host.split('.') // once — shared with the suffix walk
    val p = publicSuffixLabels(ls)
    val n = ls.length
    if (n <= p + 1) host
    else {
      val sb = new java.lang.StringBuilder()
      var i = n - p - 1
      while (i < n) {
        if (i > n - p - 1) sb.append('.')
        sb.append(ls(i))
        i += 1
      }
      sb.toString
    }
  }

  /** The rule base as a DuckDB `(mstr, mk, publen, pri)` VALUES body
    * for the oracle replay: `mstr` is the string the host's trailing
    * `mk` labels must equal, `publen` the resulting public-suffix
    * label count, `pri` the precedence (exceptions 10000, otherwise
    * publen — longest-resulting-suffix wins, exactly the Scala
    * matcher's order). Generated from [[rules]] so the SQL and the
    * expression can never drift.
    */
  def oracleValuesSql: String = {
    def esc(s: String) = s.replace("'", "''")
    val rows =
      rules.exact.toSeq.sorted.map { r =>
        val k = r.count(_ == '.') + 1
        s"('${esc(r)}',$k,$k,$k)"
      } ++ rules.wild.toSeq.sorted.map { b =>
        val k = b.count(_ == '.') + 1
        s"('${esc(b)}',$k,${k + 1},${k + 1})"
      } ++ rules.exc.toSeq.sorted.map { e =>
        val k = e.count(_ == '.') + 1
        s"('${esc(e)}',$k,${math.max(k - 1, 1)},10000)"
      }
    rows.mkString(",\n            ")
  }
}

/** Native Catalyst expression for PSL registrable-domain extraction —
  * a real `doGenCode` expression (one static call per row, null-
  * propagating, whole-stage-codegen-resident), NOT a Scala UDF, so
  * URL canonicalization + owner-domain grouping stay fused into the
  * scan projection (the PlanShapeSpec URL-layer gate).
  */
case class RegistrableDomainExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "registrable_domain"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      PublicSuffixes.registrable(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PublicSuffixes.registrable($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): RegistrableDomainExpression =
    copy(child = newChild)
}
