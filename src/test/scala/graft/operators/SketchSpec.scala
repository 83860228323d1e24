package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Count-min-sketch heavy hitters: the mergeable-sketch counterpart to
  * the HLL distinct-count query (q_distinct_sketch). At 100 TB the
  * exact word-count groupBy is still linear, but a CMS answers
  * "estimate THIS key's count" from a kilobyte-sized mergeable summary
  * — the shape a monitoring layer wants. Spark's CountMinSketch
  * guarantees est >= exact and est <= exact + eps*N at the given
  * confidence; merge is cellwise sum, so partial sketches combine
  * associatively (map-side friendly).
  */
class SketchSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("count-min estimates bound the exact word counts") {
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ", -1)).as("word"))
    val n = words.count()
    val eps = 0.001
    val sketch = words.stat.countMinSketch("word", eps, 0.99, seed = 42)
    val exact = words.groupBy("word").count()
      .orderBy(col("count").desc, col("word")).limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    for ((w, c) <- exact) {
      val est = sketch.estimateCount(w)
      assert(est >= c, s"CMS underestimated '$w': $est < $c")
      assert(est <= c + (eps * n).toLong + 1,
        s"CMS error bound blown for '$w': $est vs $c (n=$n)")
    }
  }

  test("partial sketches merge to the whole-corpus sketch") {
    val words = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("word"))
    val a = words.where(col("doc_id") % 2 === 0)
      .stat.countMinSketch("word", 0.001, 0.99, seed = 42)
    val b = words.where(col("doc_id") % 2 === 1)
      .stat.countMinSketch("word", 0.001, 0.99, seed = 42)
    val whole = words.stat.countMinSketch("word", 0.001, 0.99, seed = 42)
    val merged = a.mergeInPlace(b)
    for (w <- Seq("table", "row", "spark", "value")) {
      assert(merged.estimateCount(w) == whole.estimateCount(w),
        s"merge mismatch for '$w'")
    }
    assert(merged.totalCount() == whole.totalCount())
  }
}
