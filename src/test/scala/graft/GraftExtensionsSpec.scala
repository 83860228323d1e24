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
}
