package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[WordShingles]] must reproduce the replaced shingle UDFs exactly:
  * distinct space-joined k-grams in first-occurrence order, empty
  * (never null) on null/short inputs. The kernel fronts every dedup
  * chain, so its contract is pinned against a literal UDF twin.
  */
class ShingleExpressionSpec extends SparkSuite {
  import spark.implicits._

  private val twin = udf { (tokens: Seq[String], k: Int) =>
    if (tokens == null || tokens.length < k) Array.empty[String]
    else {
      val seen = new java.util.LinkedHashSet[String]
      tokens.sliding(k).foreach { g =>
        if (g.length == k) seen.add(g.mkString(" "))
      }
      val out = new Array[String](seen.size)
      seen.toArray(out)
      out
    }
  }

  test("equals the UDF twin on edge cases for every k") {
    val rows = Seq(
      Seq("a", "b", "c", "d"),
      Seq("a", "b", "a", "b", "a"), // duplicate shingles collapse
      Seq("x"),
      Seq.empty[String],
      null.asInstanceOf[Seq[String]],
      Seq("", "a", "", ""), // empty tokens are legal symbols
      Seq("repeat", "repeat", "repeat", "repeat"))
    val df = rows.zipWithIndex.map(_.swap).toDF("id", "toks")
    for (k <- 1 to 4) {
      val out = df.select($"id",
        word_shingles($"toks", k).as("native"),
        twin($"toks", lit(k)).as("udf"))
        .as[(Int, Seq[String], Seq[String])].collect()
      out.foreach { case (id, n, u) =>
        assert(n === u, s"k=$k row $id")
        assert(n != null, s"k=$k row $id must be empty, not null")
      }
    }
  }

  test("randomized token arrays match the twin in content AND order") {
    val rnd = new scala.util.Random(1919)
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(12))(s"w${rnd.nextInt(5)}"))
    val df = rows.zipWithIndex.map(_.swap).toDF("id", "toks")
    for (k <- Seq(2, 3, 5)) {
      val out = df.select($"id",
        word_shingles($"toks", k).as("native"),
        twin($"toks", lit(k)).as("udf"))
        .as[(Int, Seq[String], Seq[String])].collect()
      out.foreach { case (id, n, u) => assert(n === u, s"k=$k row $id") }
    }
  }

  test("simhash64 kernel is bit-identical to the UDF it replaced, " +
      "including non-ASCII (UTF-16 code-unit lattice) and " +
      "null/empty inputs") {
    val udfTwin = udf { tokens: Seq[String] =>
      val acc = new Array[Long](64)
      if (tokens != null) tokens.foreach { t =>
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    val rnd = new scala.util.Random(64)
    val rows: Seq[Seq[String]] = Seq(
      null.asInstanceOf[Seq[String]],
      Seq.empty[String],
      Seq("héllo", "wörld", "héllo"), // repeats weight the vote
      Seq("日本語", "𝒜𝓑"), // surrogate pairs: 2 UTF-16 units each
      Seq("")) ++
      Seq.fill(100)(Seq.fill(rnd.nextInt(10))(s"t${rnd.nextInt(7)}"))
    val df = rows.zipWithIndex.map(_.swap).toDF("id", "toks")
    val out = df.select($"id", simhash64($"toks").as("native"),
        udfTwin($"toks").as("udf"))
      .as[(Int, Long, Long)].collect()
    out.foreach { case (id, n, u) => assert(n === u, s"row $id") }
  }

  test("stays inside whole-stage codegen on the dedup scan shape") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .select(col("doc_id"),
        explode(word_shingles(col("tokens"), 3)).as("shingle"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` star prefix is the whole-stage-codegen marker in the
    // plan rendering: a codegen-incompatible expression would demote
    // the Generate to a bare (un-starred) node
    assert(plan.contains("*(1) Generate"), s"no codegen span:\n$plan")
    assert(df.collect().map(_.getString(1)).toSeq ===
      Seq("a b c", "b c d", "c d e"))
  }
}
