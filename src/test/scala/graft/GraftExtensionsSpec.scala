package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The SQL function surface: runtime registration makes every custom
  * Catalyst expression callable from `spark.sql` by name, agreeing
  * with its Column-API twin; the config-time extensions entry point
  * installs without error.
  */
class GraftExtensionsSpec extends SparkSuite {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("graft_stem agrees with the Porter2 Column API") {
    val rows = spark.sql(
      """SELECT graft_stem('consistently') AS a,
                graft_stem('intellectual') AS b""").head()
    assert(rows.getString(0) == graft.functions.Porter2.stem("consistently"))
    assert(rows.getString(1) == graft.functions.Porter2.stem("intellectual"))
  }

  test("graft_cosine / graft_dist2 compute over SQL array literals") {
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                graft_dist2(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d""")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 25.0)
  }

  test("graft_tokenize_lower matches the fused expression's contract") {
    val toks = spark.sql("SELECT graft_tokenize_lower('Hello  World x')")
      .head().getSeq[String](0)
    val viaColumn = Seq("Hello  World x").toDF("t")
      .select(graft.functions.tokenize_lower($"t"))
      .head().getSeq[String](0)
    assert(toks == viaColumn)
  }

  test("graft_hyperplane_buckets needs literal bits/tables") {
    val buckets = spark.sql(
      "SELECT graft_hyperplane_buckets(array(CAST(1.0 AS FLOAT)), 4, 2)")
      .head().getSeq[Long](0)
    assert(buckets.length == 2)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_hyperplane_buckets(array(CAST(1.0 AS FLOAT)), 1 + 3, 2)")
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("the extensions entry point installs every function and the strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    assert(GraftFunctions.all.map(_._1.funcName).distinct.size
      == GraftFunctions.all.size)
  }

  test("graft_nfc_normalize composes decomposed input from SQL") {
    // the Scala lexer turns the \\u escapes below into the real
    // decomposed/precomposed characters before the SQL parser sees them
    val r = spark.sql(
      "SELECT graft_nfc_normalize('cafe\u0301') AS n").head().getString(0)
    assert(r === "caf\u00e9")
  }

  test("CollapseNfcNormalize removes redundant normalization layers") {
    import org.apache.spark.sql.functions.col
    val df = Seq("cafe\u0301").toDF("s")
    val nested = df.select(graft.functions.NfcNormalize(
      graft.functions.NfcNormalize(
        graft.functions.NfcNormalize(col("s")))).as("n"))
    val optimized = graft.plans.CollapseNfcNormalize(
      nested.queryExecution.analyzed)
    val remaining = optimized.expressions.map(_.collect {
      case e: graft.functions.NfcNormalizeExpression => e
    }.size).sum
    assert(remaining === 1, optimized.toString)
    // semantics preserved
    assert(nested.head().getString(0) === "caf\u00e9")
  }

  test("graft_icu_tokenize_lower / graft_stopword_count / " +
      "graft_stem_prune agree with their Column-API twins") {
    val icu = spark.sql(
      "SELECT graft_icu_tokenize_lower('Mid-Century don''t 3.14 x')")
      .head().getSeq[String](0)
    assert(icu == Seq("mid-century", "don't", "x"))
    val counted = spark.sql(
      "SELECT graft_stopword_count(array('the', 'quick', 'and', 'x'))")
      .head().getInt(0)
    assert(counted === 2) // 'the' and 'and' are Snowball stopwords
    val stemmed = spark.sql(
      "SELECT graft_stem_prune(array('consistently', 'a', 'dogs'))")
      .head().getSeq[String](0)
    assert(stemmed ==
      Seq("consistently", "dogs").map(graft.functions.Porter2.stem))
  }

  test("graft_top_k_by aggregates from SQL with the bounded-heap " +
      "semantics of the Column API") {
    Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9), (1L, 13L, 0.1),
      (2L, 20L, 0.3))
      .toDF("g", "id", "score").createOrReplaceTempView("tkb")
    val rows = spark.sql("""
      SELECT g, graft_top_k_by(score, id, 2) AS top
      FROM tkb GROUP BY g ORDER BY g""").collect()
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    // (score desc, id asc): 0.9@11 before 0.9@12; 0.5@10 drops at k=2
    assert(g1.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((0.9, 11L), (0.9, 12L)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getLong(1)) == Seq(20L))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_top_k_by(score, id, 1 + 1) FROM tkb")
        .collect()
    }
    assert(err.getMessage != null) // k must be a literal
  }
}
