package graft.functions

import graft.SparkSuite
import org.apache.spark.ml.linalg.{SparseVector, Vector, Vectors}
import org.apache.spark.sql.functions.{col, udf}

/** The native count_vectorize kernel must be a drop-in equivalent of
  * the straightforward per-row formulation it replaced in
  * TrimmedCountVectorizerModel.transform (reference DFM build, R:92).
  */
class CountVectorizeSpec extends SparkSuite {
  import spark.implicits._

  private val vocab = Array("apple", "banana", "cherry", "durian", "é")

  // Independent twin: the simplest possible correct implementation.
  private def twin(vocabulary: Array[String]) = {
    val index = vocabulary.zipWithIndex.toMap
    udf { tokens: Seq[String] =>
      val counts = scala.collection.mutable.TreeMap[Int, Double]()
      if (tokens != null) tokens.foreach { t =>
        index.get(t).foreach(i => counts(i) = counts.getOrElse(i, 0.0) + 1)
      }
      Vectors.sparse(vocabulary.length, counts.toSeq): Vector
    }
  }

  private val docs = Seq(
    Seq("apple", "banana", "apple", "apple"),
    Seq("zebra", "unknown", "apple"),
    Seq.empty[String],
    Seq("é", "é", "cherry"),
    Seq("durian"),
    (1 to 500).map(i => vocab(i % vocab.length)), // heavy repeats
    Seq("apple", "APPLE", "Apple") // case-sensitive like the old map
  ).toDF("tokens")

  test("count_vectorize == per-row twin (incl. OOV, empty, repeats)") {
    val fused = docs.select(count_vectorize(col("tokens"), vocab).as("v"))
      .collect().map(_.getAs[Vector]("v"))
    val ref = docs.select(twin(vocab)(col("tokens")).as("v"))
      .collect().map(_.getAs[Vector]("v"))
    fused.zip(ref).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // Sparse encoding with strictly ascending indices, not just equal.
    fused.foreach { v =>
      val sv = v.asInstanceOf[SparseVector]
      assert(sv.indices.sameElements(sv.indices.sorted.distinct))
    }
  }

  test("count_vectorize: null token array yields the empty vector") {
    val df = Seq(Tuple1(Seq("apple")), Tuple1(null: Seq[String]))
      .toDF("tokens")
    val out = df.select(count_vectorize(col("tokens"), vocab).as("v"))
      .collect().map(_.getAs[Vector]("v"))
    assert(out(1) == Vectors.sparse(vocab.length, Array.empty[Int], Array.empty[Double]))
  }

  test("count_vectorize: empty vocabulary") {
    val out = Seq(Tuple1(Seq("apple"))).toDF("tokens")
      .select(count_vectorize(col("tokens"), Array.empty[String]).as("v"))
      .head().getAs[Vector]("v")
    assert(out.size == 0)
  }
}
