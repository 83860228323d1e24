package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Per-group simple linear regression by the exact closed form —
  * "fit thousands of small models in one pass", the grouped-ML shape
  * (per-source calibration curves, per-tenant trends) that needs no
  * iterative solver:
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
  *   intercept = (Σy − slope·Σx)/n,
  *   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
  *
  * Determinism: x and y are cast to LONG, so the five sufficient
  * statistics are exact integer aggregates (order-free); every
  * integer here stays below 2^53, so the double arithmetic on them
  * is exact and the outputs are pure functions of five integers —
  * bit-replayable in any engine. At magnitudes where n·Σx² would
  * pass 2^53, move the sums to DECIMAL and the products to HUGEINT
  * (the engine's squared-lattice convention) before trusting the
  * hash edge.
  *
  * Scale shape: ONE map-side-combined aggregation over the corpus —
  * the model count is the group count, and no group's data ever
  * gathers anywhere.
  */
object GroupedOls {

  /** (groupCol, n, slope, intercept, r2), 6-dp at the edge. Groups
    * with a degenerate x (zero variance) or fewer than 2 rows are
    * excluded — their slope is undefined in any engine.
    *
    * Integral inputs ride the lattice as-is. Fractional inputs MUST
    * pass an explicit `scale` (values are snapped to `round(v·scale)`
    * lattice units): a silent cast would truncate fractions and
    * return a wrong slope with no error. Scaling x and y by the same
    * s leaves slope and r² unchanged and multiplies intercept by s,
    * so the intercept is divided back out at the edge — outputs are
    * always in the caller's original units.
    */
  def fit(
      df: DataFrame, groupCol: String,
      xCol: String, yCol: String, scale: Long = 1L): DataFrame = {
    Reserved.check("fit" -> df)
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    def lattice(c: String) = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType if scale == 1L =>
        col(c).cast("long")
      case ByteType | ShortType | IntegerType | LongType =>
        (col(c) * lit(scale)).cast("long")
      case FloatType | DoubleType | _: DecimalType if scale > 1L =>
        round(col(c) * lit(scale.toDouble)).cast("long")
      case dt => throw new IllegalArgumentException(
        s"GroupedOls.fit: column '$c' is $dt; fractional inputs need an " +
          "explicit scale (lattice granularity) — a bare cast would " +
          "silently truncate fractions and corrupt the fit")
    }
    val stats = df
      .select(col(groupCol), lattice(xCol).as("__x"), lattice(yCol).as("__y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    // Output edge: the explicit micro-lattice snap (×1e6 in double →
    // integer round → one IEEE division back), NOT `round(x, 6)` —
    // Spark rounds HALF_UP on a BigDecimal of the double's decimal
    // string while a replay engine rounds the double's binary value,
    // and the two disagree at 6-dp magnitudes (the q_theil_sen /
    // q_bm25 / q_quantize lesson). The snap leaves only a scale-0
    // integer round, where the engines agree.
    def snap6(c: org.apache.spark.sql.Column) =
      round(c * lit(1e6)).cast("long").cast("double") / lit(1e6)
    stats
      .filter(col("__n") >= 2 && varx =!= lit(0.0))
      .select(col(groupCol), col("__n").as("n"),
        snap6(cov / varx).as("slope"),
        snap6((sy - (cov / varx) * sx) / n / lit(scale.toDouble))
          .as("intercept"),
        when(vary === lit(0.0), lit(null))
          .otherwise(snap6((cov * cov) / (varx * vary))).as("r2"))
  }
}
