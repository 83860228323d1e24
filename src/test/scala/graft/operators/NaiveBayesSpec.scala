package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSuite {
  import spark.implicits._

  private val train = Seq(
    (1L, "spam", "buy cheap pills now buy"),
    (2L, "spam", "cheap pills cheap offer"),
    (3L, "ham", "meeting at noon about the report"),
    (4L, "ham", "the report is due at noon")
  ).toDF("id", "label", "text")

  test("model lattice values match a hand computation") {
    val m = NaiveBayes.fit(train, "text", "label")
    val classes = m.classes.orderBy("label").collect()
    // priors: 2/4 each → log10(0.5) = -0.301029995... → -301030 micro
    assert(classes.map(_.getAs[Long]("prior_micro")).toSeq ===
      Seq(-301030L, -301030L))
    // vocab: spam {buy,cheap,pills,now,offer}, ham {meeting,at,noon,
    // about,the,report,is,due} minus overlap → count distinct
    val v = (("buy cheap pills now buy cheap pills cheap offer " +
      "meeting at noon about the report the report is due at noon")
      .split(" ").distinct.length)
    val ham = classes.find(_.getString(0) == "ham").get
    // ham tokens = 12 (two 6-token docs), default = log10(1/(12+v))
    assert(ham.getAs[Long]("tokens") === 12L)
    val expDefault = math.round(math.log10(1.0 / (12 + v)) * 1e6)
    assert(ham.getAs[Long]("default_micro") === expDefault)
  }

  test("classifies held-out docs by the dominant class vocabulary") {
    val m = NaiveBayes.fit(train, "text", "label")
    val test = Seq(
      (10L, "cheap pills offer"),
      (11L, "the report at noon")
    ).toDF("id", "text")
    val preds = NaiveBayes.classify(m, test, "id", "text")
      .orderBy("id").collect()
    assert(preds.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((10L, "spam"), (11L, "ham")))
  }

  test("unseen terms shift scores by exactly the default mass") {
    val m = NaiveBayes.fit(train, "text", "label")
    val base = NaiveBayes.scores(m,
      Seq((1L, "cheap pills")).toDF("id", "text"), "id", "text")
      .orderBy("label").collect()
    val extra = NaiveBayes.scores(m,
      Seq((1L, "cheap pills zzzunseen")).toDF("id", "text"), "id", "text")
      .orderBy("label").collect()
    val defaults = m.classes.orderBy("label").collect()
      .map(_.getAs[Long]("default_micro"))
    base.zip(extra).zip(defaults).foreach { case ((b, e), d) =>
      assert(e.getAs[Long]("score_micro") ===
        b.getAs[Long]("score_micro") + d)
    }
  }

  test("scores are invariant to input partitioning (integer lattice)") {
    val docs = (0L until 40L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} tok${i % 11} filler"))
      .toDF("id", "text")
    val labeled = train
    val m = NaiveBayes.fit(labeled, "text", "label")
    val a = NaiveBayes.scores(m, docs.repartition(1), "id", "text")
      .orderBy("id", "label").collect().toSeq
    val b = NaiveBayes.scores(m, docs.repartition(13), "id", "text")
      .orderBy("id", "label").collect().toSeq
    assert(a === b)
  }

  test("confusion counts every held-out doc exactly once") {
    val m = NaiveBayes.fit(train, "text", "label")
    val test = Seq(
      (10L, "spam", "cheap pills offer"),
      (11L, "ham", "the report at noon"),
      (12L, "ham", "buy cheap pills")   // will confuse → spam
    ).toDF("id", "label", "text")
    val conf = NaiveBayes.confusion(m, test, "id", "text", "label")
    assert(conf.agg(sum("n")).collect().head.getLong(0) === 3L)
    val asMap = conf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(asMap(("ham", "spam")) === 1L)
    assert(asMap(("spam", "spam")) === 1L)
  }

  test("scoring broadcasts the model; no cartesian product") {
    val m = NaiveBayes.fit(train, "text", "label")
    val plan = NaiveBayes
      .scores(m, train.select($"id", $"text"), "id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"model join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"scores plans a CartesianProduct:\n$plan")
  }

  test("reserved __ columns are rejected") {
    val bad = train.withColumn("__x", lit(1))
    intercept[IllegalArgumentException] {
      NaiveBayes.fit(bad, "text", "label")
    }
  }
}
