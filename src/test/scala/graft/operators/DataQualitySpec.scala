package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSuite {
  import spark.implicits._

  test("validate emits one row per violated rule; nulls are violations") {
    val df = Seq(
      (1L, Some("ok"), Some(10)),
      (2L, None, Some(10)),         // fails nonnull
      (3L, Some("ok"), Some(-1)),   // fails positive
      (4L, None, None)              // fails both; null predicate -> violation
    ).toDF("id", "s", "v")
    val out = DataQuality.validate(df, Seq("id"),
        Seq("s_nonnull" -> $"s".isNotNull, "v_positive" -> ($"v" > 0)))
      .as[(Long, String)].collect().toSet
    assert(out == Set(
      2L -> "s_nonnull", 3L -> "v_positive",
      4L -> "s_nonnull", 4L -> "v_positive"))
  }

  test("clean side via left_anti on the violations is exact") {
    val df = Seq((1L, 5), (2L, -5), (3L, 7)).toDF("id", "v")
    val bad = DataQuality.validate(df, Seq("id"), Seq("pos" -> ($"v" > 0)))
    val clean = df.join(bad.select("id").distinct(), Seq("id"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(clean == Set(1L, 3L))
  }
}
