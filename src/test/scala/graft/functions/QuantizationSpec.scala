package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

import scala.util.Random

/** int8 absmax quantization: codes in range, per-dimension error
  * bounded by scale/2, zero vectors safe, and cosine survives
  * quantization well enough to serve ANN.
  */
class QuantizationSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = {
    val r = new Random(3)
    (0L until 100L).map(i =>
      (i, Array.fill(64)((r.nextDouble() * 2 - 1).toFloat))) :+
      (100L, Array.fill(64)(0.0f)) // zero vector
  }.toDF("id", "v")

  private lazy val quantized = vecs
    .withColumn("scale", Quantization.absmaxScale($"v"))
    .withColumn("codes", Quantization.quantizeInt8($"v", $"scale"))
    .withColumn("deq", Quantization.dequantize($"codes", $"scale"))

  test("codes are int8-ranged; zero vector gives scale 0 and zero codes") {
    val rows = quantized.select($"id", $"scale", $"codes").collect()
    rows.foreach { r =>
      val codes = r.getSeq[Byte](2)
      assert(codes.length == 64)
      assert(codes.forall(c => c >= -127 && c <= 127))
      if (r.getLong(0) == 100L) {
        assert(r.getDouble(1) == 0.0)
        assert(codes.forall(_ == 0))
      } else assert(r.getDouble(1) > 0.0)
    }
  }

  test("per-dimension reconstruction error is bounded by scale/2") {
    val bad = quantized
      .select(explode(zip_with($"v", $"deq",
        (x, d) => abs(x.cast("double") - d) - $"scale" / 2 * 1.0000001))
        .as("slack"))
      .filter($"slack" > 0).count()
    assert(bad == 0L)
  }

  test("sse matches a driver-side recomputation") {
    val got = quantized
      .select($"id",
        Quantization.reconstructionSse($"v", $"codes", $"scale").as("sse"))
      .as[(Long, Double)].collect().toMap
    vecs.as[(Long, Array[Float])].collect().foreach { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max) / 127.0
      val sse = v.foldLeft(0.0) { (acc, x) =>
        val q = if (scale == 0) 0.0
          else math.max(-127.0, math.min(127.0,
            BigDecimal(x.toDouble / scale)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble))
        val e = x.toDouble - q * scale
        acc + e * e
      }
      assert(math.abs(got(id) - sse) < 1e-12, s"id=$id")
    }
  }

  test("cosine of dequantized vectors stays close to float cosine") {
    val pairs = quantized.as("a").join(quantized.as("b"),
        col("a.id") + 1 === col("b.id"))
      .select(
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("c32"),
        VectorFunctions.cosine(
          transform(col("a.deq"), x => x.cast("float")),
          transform(col("b.deq"), x => x.cast("float"))).as("c8"))
      .as[(Double, Double)].collect()
    pairs.filter(p => !p._1.isNaN && !p._2.isNaN).foreach { case (c32, c8) =>
      assert(math.abs(c32 - c8) < 0.01, s"$c32 vs $c8")
    }
  }
}
