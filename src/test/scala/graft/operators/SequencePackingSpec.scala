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
}
