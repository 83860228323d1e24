package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Dedup.minhashBuckets]]'s round-16 reformulation (one
  * ElementwiseMin fold per shingle row) must be bit-identical to the
  * explode/groupBy-min reference it replaced — same signatures, same
  * band keys, same bucket rows, under any partitioning. The reference
  * formulation is inlined here verbatim so the equivalence stays
  * executable.
  */
class MinhashSigSpec extends SparkSuite {
  import spark.implicits._

  private def corpus() = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta",
    2L -> "alpha beta gamma delta epsilon zeta eta iota",
    3L -> "one two three four five six seven eight",
    5L -> "one two three four five six seven nine",
    10L -> "red orange yellow green blue indigo violet black",
    11L -> "cat dog fish bird mouse horse cow sheep"
  ).toDF("doc_id", "text")
    .withColumn("tokens", split(col("text"), " "))

  /** The pre-round-16 formulation, verbatim: posexplode the hash
    * array to (id, seed, h), min per (id, seed), reassemble ordered
    * by seed.
    */
  private def referenceBuckets(
      shingles: org.apache.spark.sql.DataFrame,
      bands: Int, rowsPerBand: Int): org.apache.spark.sql.DataFrame = {
    val numHashes = bands * rowsPerBand
    val seeds = sequence(lit(0), lit(numHashes - 1))
    val hashed = shingles
      .select(col("id"),
        posexplode(transform(seeds, s => xxhash64(s, col("shingle")))))
      .withColumnRenamed("pos", "seed").withColumnRenamed("col", "h")
    val sigs = hashed
      .groupBy(col("id"), col("seed")).agg(min(col("h")).as("h"))
      .groupBy(col("id"))
      .agg(transform(
        sort_array(collect_list(struct(col("seed"), col("h")))),
        x => x("h")).as("sig"))
    val bandKeys = (0 until bands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(s => col("sig")(s)): _*)
    }
    sigs.select(col("id"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
  }

  test("aggregate-fold buckets are bit-identical to the explode/" +
      "groupBy-min reference, at several partitionings") {
    val sh0 = Dedup.shingleSets(corpus(), "doc_id", "tokens", 3)
    for (sh <- Seq(sh0, sh0.repartition(7),
        sh0.orderBy(desc("shingle")).coalesce(1))) {
      val got = Dedup.minhashBuckets(sh, 8, 4)
        .as[(Long, Int, Long)].collect().toSet
      val ref = referenceBuckets(sh, 8, 4)
        .as[(Long, Int, Long)].collect().toSet
      assert(got === ref)
      assert(got.nonEmpty)
      // every doc occupies exactly `bands` buckets
      assert(got.groupBy(_._1).forall(_._2.size == 8))
    }
  }

  test("elementwise_min rejects mixed lengths loudly and skips nulls") {
    val ok = Seq((1L, Seq(5L, 2L)), (1L, Seq(3L, 9L)))
      .toDF("id", "hs")
      .groupBy(col("id"))
      .agg(graft.functions.elementwise_min(col("hs")).as("m"))
      .as[(Long, Seq[Long])].collect()
    assert(ok.toSeq === Seq((1L, Seq(3L, 2L))))
    // a NULL ARRAY (nullable array of non-nullable elements) must be
    // skipped by the fold, not treated as empty or corrupt the buffer
    val withNullRow = Seq((1L, true), (1L, false), (1L, true))
      .toDF("id", "keep")
      .select(col("id"), when(col("keep"),
        array(lit(7L), lit(4L))).as("hs")) // !keep -> null array
      .groupBy(col("id"))
      .agg(graft.functions.elementwise_min(col("hs")).as("m"))
      .as[(Long, Seq[Long])].collect()
    assert(withNullRow.toSeq === Seq((1L, Seq(7L, 4L))))
    val mixed = Seq((1L, Seq(5L, 2L)), (1L, Seq(3L)))
      .toDF("id", "hs")
      .groupBy(col("id"))
      .agg(graft.functions.elementwise_min(col("hs")).as("m"))
    val e = intercept[Exception] { mixed.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("mixed array lengths")), s"$e")
  }

  test("elementwise_min rejects nullable-element arrays at analysis " +
      "time (a null would silently fold as 0)") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("id")
        .select(col("id"),
          array(lit(5L), lit(null).cast("long")).as("hs"))
        .groupBy(col("id"))
        .agg(graft.functions.elementwise_min(col("hs")).as("m"))
        .collect()
    }
    assert(e.getMessage.contains("non-nullable array elements"), s"$e")
  }
}
