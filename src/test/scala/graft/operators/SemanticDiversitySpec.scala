package graft.operators

import graft.SparkSuite

class SemanticDiversitySpec extends SparkSuite {

  import spark.implicits._

  test("identical vectors score 1e6 ppm, orthogonal score 0") {
    val df = Seq(
      ("same", Seq(1f, 0f, 0f)), ("same", Seq(1f, 0f, 0f)),
      ("same", Seq(1f, 0f, 0f)),
      ("orth", Seq(1f, 0f, 0f)), ("orth", Seq(0f, 1f, 0f)),
      ("anti", Seq(1f, 0f, 0f)), ("anti", Seq(-1f, 0f, 0f))
    ).toDF("g", "embedding")
    val out = SemanticDiversity
      .averagePairwiseCosine(df, "g", "embedding")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out("same") == ((3L, 1000000L)))
    assert(out("orth") == ((2L, 0L)))
    assert(out("anti") == ((2L, -1000000L)))
  }

  test("zero vectors are dropped; singleton groups excluded") {
    val df = Seq(
      ("a", Seq(0f, 0f)),              // zero norm -> dropped
      ("a", Seq(1f, 0f)),              // leaves n=1 -> excluded
      ("b", Seq(3f, 4f)), ("b", Seq(6f, 8f)) // same direction, diff scale
    ).toDF("g", "embedding")
    val out = SemanticDiversity
      .averagePairwiseCosine(df, "g", "embedding")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(!out.contains("a"))
    assert(out("b") == ((2L, 1000000L))) // cosine is scale-invariant
  }
}
