package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[(Long, String)] =
    TextChunking.chunkFixed(
        Seq((1L, text)).toDF("id", "text"), "text", size, overlap)
      .select(col("chunk_idx"), col("chunk"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq

  test("golden: size 5, overlap 2 → stride 3") {
    assert(chunksOf("abcdefghij", 5, 2) == Seq(
      (0L, "abcde"), (1L, "defgh"), (2L, "ghij"), (3L, "j")))
  }

  test("no overlap: exact partition of the text") {
    assert(chunksOf("abcdefg", 3, 0) == Seq(
      (0L, "abc"), (1L, "def"), (2L, "g")))
    // reassembly is the original document
    assert(chunksOf("abcdefg", 3, 0).map(_._2).mkString == "abcdefg")
  }

  test("edge cases: empty text, exact-multiple length, unicode") {
    assert(chunksOf("", 5, 2).isEmpty)
    assert(chunksOf("abcdef", 3, 0) == Seq((0L, "abc"), (1L, "def")))
    // substring counts characters, not bytes
    assert(chunksOf("日本語のテキスト", 4, 1) == Seq(
      (0L, "日本語の"), (1L, "のテキス"), (2L, "スト")))
  }

  test("chunk counts follow ceil(len/stride) on varied lengths") {
    val docs = (0 until 50).map(i => (i.toLong, "x" * i)).toDF("id", "text")
    val counts = TextChunking.chunkFixed(docs, "text", 7, 3)
      .groupBy("id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (1 until 50).foreach { i =>
      assert(counts(i.toLong) == (i + 3) / 4, s"len $i")
    }
    assert(!counts.contains(0L)) // empty doc → no chunks
  }
}
