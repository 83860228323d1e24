package graft.operators

import graft.SparkSuite

/** Hand-checked idf-weighted Jaccard: ubiquitous shingles carry
  * weight 0, so overlap on them contributes nothing.
  */
class WeightedJaccardSpec extends SparkSuite {
  import spark.implicits._

  // A = {x,y,z}, B = {x,y,z}, C = {x,q}; x is in every doc → w(x)=0
  private def shingles = Seq(
    (1L, "x"), (1L, "y"), (1L, "z"),
    (2L, "x"), (2L, "y"), (2L, "z"),
    (3L, "x"), (3L, "q")).toDF("id", "shingle")

  test("identical docs score 1.0; boilerplate-only overlap scores 0") {
    val all = Dedup.weightedJaccardPairs(shingles, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(all((1L, 2L)) === 1.0)
    // A∩C = {x} with idf 0 → weighted overlap 0 despite shared shingle
    assert(all((1L, 3L)) === 0.0)
    assert(all((2L, 3L)) === 0.0)
  }

  test("threshold keeps only the genuinely-overlapping pair") {
    val hits = Dedup.weightedJaccardPairs(shingles, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq === Seq((1L, 2L)))
  }

  test("unweighted Jaccard would NOT separate these (the motivation)") {
    // plain Jaccard(A,C) = 1/4 > 0 while weighted = 0: the idf
    // weighting is what suppresses the template-only match
    val plain = Dedup.jaccardPairs(shingles, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(plain((1L, 3L)) === 0.25)
  }
}
