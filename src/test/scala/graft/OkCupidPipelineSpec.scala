package graft

import org.apache.spark.sql.functions._

/** End-to-end reference-pipeline replication on the fixture corpus:
  * ingest → clean → featurize → split → tree → confusion matrix
  * (SURVEY §3 EP1+EP2 in miniature).
  */
class OkCupidPipelineSpec extends SparkSuite {

  test("full pipeline trains and evaluates on the fixture") {
    val profiles = OkCupidPipeline.load(spark, fixturePath)
    val (confusion, accuracy) = OkCupidPipeline.trainAndEvaluate(
      profiles, minDocFreq = 1, minTermFreq = 1, maxDepth = 3)
    val cells = confusion.collect()
    val total = cells.map(_.getAs[Long]("n")).sum
    // 24 rows: m=14 → ceil(9.8)=10 train, 4 test; f=10 → 7 train, 3 test
    assert(total == 7, s"test rows = $total")
    assert(accuracy >= 0.0 && accuracy <= 1.0)
  }

  test("trimmed vocabulary contains stems, not raw words") {
    val profiles = OkCupidPipeline.load(spark, fixturePath)
    val essays = OkCupidPipeline.withEssays(profiles)
    val model = OkCupidPipeline.featurePipeline(1, 1).fit(essays)
    val vocab = model.stages.last
      .asInstanceOf[graft.operators.TrimmedCountVectorizerModel]
      .vocabulary.toSet
    assert(vocab.contains("danc"))    // dancing/dances/dancer → danc
    assert(!vocab.contains("dancing"))
    assert(vocab.contains("code"))    // coding → code
  }

  test("treePartitions never saturates the executor thread count: " +
      "the cap is parallelism - 2 (the measured 52.9s cliff at 32 " +
      "busy partitions on local[32]), growth below the cap follows " +
      "rows/2048, and degenerate parallelism still yields >= 1") {
    import OkCupidPipeline.treePartitions
    // any corpus >= 63,488 rows used to select 32 partitions — the
    // configuration the round-11 sweep measured at 52.9 s vs 8.5 s
    // at 30; the clamp must keep 2 threads of headroom
    assert(treePartitions(32, 63488L, 2048L) === 30)
    assert(treePartitions(32, 10000000L, 2048L) === 30)
    // below the cap: data-sized, ceil-ish (n/2048 + 1)
    assert(treePartitions(32, 59946L, 2048L) === 30)
    assert(treePartitions(32, 20480L, 2048L) === 11)
    assert(treePartitions(32, 1L, 2048L) === 1)
    // degenerate session widths never go to zero
    assert(treePartitions(1, 100000L, 2048L) === 1)
    assert(treePartitions(2, 100000L, 2048L) === 1)
    assert(treePartitions(3, 100000L, 2048L) === 1)
    assert(treePartitions(4, 100000L, 2048L) === 2)
  }
}
