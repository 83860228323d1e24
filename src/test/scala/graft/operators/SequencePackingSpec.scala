package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Sharded two-pass prefix sum == the naive global running sum. */
class SequencePackingSpec extends SparkSuite {
  import spark.implicits._

  test("packing offsets equal a global prefix sum, across shard splits") {
    val docs = (0L until 57L).map(i => (i, 1L + (i * 37L) % 23L))
      .toDF("doc_id", "ntok")
    val packed = SequencePacking
      .pack(docs, "doc_id", "ntok", capacity = 16L, shardSize = 10L)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    var running = 0L
    docs.orderBy("doc_id").collect().zip(packed).foreach {
      case (in, (id, ntok, start, chunk, off)) =>
        assert(id == in.getLong(0) && ntok == in.getLong(1))
        assert(start == running, s"doc $id start $start != $running")
        assert(chunk == running / 16L)
        assert(off == running % 16L)
        running += ntok
    }
  }

  test("duplicateSpans finds planted cross-document spans only") {
    val span = (1 to 25).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $span beta"),
      (2L, s"gamma delta $span"),
      (3L, "unrelated words only here repeated repeated repeated")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ", -1).as("toks"))
    val dup = Dedup.duplicateSpans(docs, "doc_id", "toks", n = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc1: span tokens at positions 2..26 → 20-gram windows fully
    // inside the span: starts 2..7 (6 of them); doc2 similarly 3..8
    assert(dup.map(_._1).toSet == Set(1L, 2L))
    assert(dup.filter(_._1 == 1L).map(_._2).sorted.toSeq == (2L to 7L))
    assert(dup.filter(_._1 == 2L).map(_._2).sorted.toSeq == (3L to 8L))
  }

  test("lengthBuckets: batches respect size and bucket bounds; " +
      "waste is n·max − sum; totals conserved") {
    val df = (1L to 100L).map(i => (i, 10L + (i * 37) % 490))
      .toDF("doc_id", "len")
    val out = SequencePacking
      .lengthBuckets(df, "doc_id", "len", bucketWidth = 100L,
        batchSize = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    out.foreach { case (b, _, n, mn, mx, sm, waste) =>
      assert(n >= 1 && n <= 8)
      // every member's length lies in the bucket's band
      assert(mn >= b * 100 && mx < (b + 1) * 100, s"bucket $b: [$mn,$mx]")
      assert(waste === n * mx - sm)
    }
    assert(out.map(_._3).sum === 100L) // every doc lands somewhere
    // at most one partial batch per bucket
    out.groupBy(_._1).foreach { case (b, batches) =>
      assert(batches.count(_._3 < 8) <= 1, s"bucket $b")
    }
  }

  test("lengthBuckets is partitioning-independent") {
    val df = (1L to 80L).map(i => (i, 5L + (i * 13) % 300))
      .toDF("doc_id", "len")
    def run(d: org.apache.spark.sql.DataFrame) =
      SequencePacking.lengthBuckets(d, "doc_id", "len", 50L, 4)
        .orderBy("bucket", "batch_id").collect().toSeq
    assert(run(df) === run(df.repartition(9)))
  }
}
