package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized equivalence: all three as-of implementations against an
  * in-memory brute-force reference (per-left-row argmax/argmin over
  * the right side), across seeds, with key collisions and time ties
  * between the sides (right unique per (key, time), as the contract
  * requires).
  */
class AsOfJoinRandomSpec extends SparkSuite {
  import spark.implicits._

  test("backward/forward/broadcastBackward match brute force, 3 seeds") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val lefts = (0 until 500).map(i =>
        (i.toLong, "k" + rnd.nextInt(20), rnd.nextInt(1000).toLong))
      val rights = (0 until 300)
        .map(i => ("k" + rnd.nextInt(20), rnd.nextInt(1000).toLong, 1000L + i))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val lDf = lefts.toDF("id", "k", "t")
      val rDf = rights.toDF("k", "t", "pid")

      val expB = lefts.map { case (id, k, t) =>
        val c = rights.filter(r => r._1 == k && r._2 <= t)
        id -> (if (c.isEmpty) None else Some(c.maxBy(_._2)._3))
      }.toMap
      val expF = lefts.map { case (id, k, t) =>
        val c = rights.filter(r => r._1 == k && r._2 >= t)
        id -> (if (c.isEmpty) None else Some(c.minBy(_._2)._3))
      }.toMap

      def collect(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
        df.select(col("id"), col("pid")).collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      assert(collect(AsOfJoin.backward(lDf, rDf, "k", "t", "t", Seq("pid")))
        == expB, s"backward seed $seed")
      assert(collect(AsOfJoin.forward(lDf, rDf, "k", "t", "t", Seq("pid")))
        == expF, s"forward seed $seed")
      assert(collect(AsOfJoin.broadcastBackward(
        lDf, rDf, "k", "t", "t", Seq("pid"))) == expB,
        s"broadcastBackward seed $seed")
    }
  }
}
