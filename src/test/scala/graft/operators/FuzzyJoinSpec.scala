package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** FuzzyJoin: blocked result equals the naive cross join, dedup over
  * the value domain, and the short-name completeness guard.
  */
class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val names = Seq(
    "red widget", "red widgets", "red widgit", "blue widget",
    "cold anvil", "old anvil", "gold anvil", "small plate",
    "small plates", "large plate", "entirely different")
    // duplicate rows: the join is over distinct values
    .flatMap(n => Seq(n, n)).toDF("name")

  private def naive(maxDist: Int): Set[(String, String, Int)] = {
    val d = names.select(col("name")).distinct()
    d.as("a").crossJoin(d.as("b"))
      .where(col("a.name") < col("b.name") &&
        levenshtein(col("a.name"), col("b.name")) <= maxDist)
      .select(col("a.name"), col("b.name"),
        levenshtein(col("a.name"), col("b.name")))
      .as[(String, String, Int)].collect().toSet
  }

  test("similarPairs equals the naive cross join at k=1 and k=2") {
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.similarPairs(names, "name", maxDist = k)
        .as[(String, String, Int)].collect().toSet
      assert(got == naive(k), s"maxDist=$k")
    }
  }

  test("pairs are unordered (a < b) and never self-paired") {
    val got = FuzzyJoin.similarPairs(names, "name", maxDist = 2)
      .as[(String, String, Int)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("null names are ignored; short names fail loudly") {
    val withNull = names.unionByName(
      Seq(Option.empty[String]).toDF("name"))
    val got = FuzzyJoin.similarPairs(withNull, "name", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got == naive(2))

    val short = names.unionByName(Seq(Some("abc")).toDF("name"))
    val e = intercept[Exception] {
      FuzzyJoin.similarPairs(short, "name", maxDist = 2).collect()
    }
    assert(e.getMessage.contains("abc") ||
      Option(e.getCause).exists(_.getMessage.contains("abc")))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.similarPairs(names, "name", maxDist = 0)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.similarPairs(names, "name", maxDist = 1, q = 0)
    }
  }
}
