package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Zipf-law fit per group: the OLS slope of log10(frequency) against
  * log10(rank) over the group's term-frequency distribution. Natural
  * text sits near slope −1; a corpus slice that drifts far from it
  * is a curation smell (machine-generated boilerplate flattens the
  * head, deduplicated spam steepens it) — the distribution-shape
  * sibling of `q_token_entropy`'s per-doc signal.
  *
  * Determinism: ranks are exact (row_number under the count-desc,
  * term-asc quirk-Q6 total order); both logs snap once to the micro
  * lattice (round(log10·10⁶) — the bm25 idf policy, log10 being the
  * one non-correctly-rounded op in the chain), so the five OLS
  * sufficient statistics are exact LONG/DECIMAL(38) aggregates and
  * the final combine is one written IEEE sequence. The slope is a
  * lattice-unit ratio (unitless); the intercept divides the 10⁶ back
  * out at the edge.
  *
  * Scale: one (group, term) count aggregation, one rank window over
  * each group's vocabulary (vocab-sized, not corpus-sized), one
  * aggregation to group-level rows. A single group's vocabulary too
  * large for one task moves the rank onto the sharded range-rank
  * decomposition (GlobalIds) without changing the result.
  */
object ZipfFit {

  /** (groupCol, n_terms, slope, intercept, r2), 6 dp at the edge.
    * Groups with < 2 distinct terms are dropped (undefined fit).
    */
  def fit(df: DataFrame, groupCol: String, termCol: String): DataFrame = {
    Reserved.check("fit" -> df)
    val d38 = DecimalType(38, 0)
    val counts = df.groupBy(col(groupCol), col(termCol).as("__t"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__cnt").desc, col("__t"))
    val lattice = counts
      .withColumn("__rank", row_number().over(w))
      .select(col(groupCol),
        round(log10(col("__rank").cast("double")) * lit(1e6))
          .cast("long").as("__lx"),
        round(log10(col("__cnt").cast("double")) * lit(1e6))
          .cast("long").as("__ly"))
    val stats = lattice.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__lx")).as("__sx"), sum(col("__ly")).as("__sy"),
        sum(col("__lx").cast(d38) * col("__ly").cast(d38)).as("__sxy"),
        sum(col("__lx").cast(d38) * col("__lx").cast(d38)).as("__sxx"),
        sum(col("__ly").cast(d38) * col("__ly").cast(d38)).as("__syy"))
    val nD = col("n_terms").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val cov = nD * sxy - sx * sy
    val varx = nD * sxx - sx * sx
    val vary = nD * syy - sy * sy
    stats
      .filter(col("n_terms") >= 2)
      .select(col(groupCol), col("n_terms"),
        round(cov / varx, 6).as("slope"),
        round((sy - cov / varx * sx) / nD / lit(1e6), 6).as("intercept"),
        // vary = 0 (all counts equal) leaves r2 undefined — NULL, not
        // an ANSI divide-by-zero error
        when(vary === lit(0.0), lit(null))
          .otherwise(round(cov * cov / (varx * vary), 6)).as("r2"))
  }

  /** Heaps'-law fit: V(N) = K·N^β — how fast the vocabulary grows
    * with the token stream. One row (n_points, beta, log10_k, r2):
    * the OLS of log10(cumulative vocabulary) against log10(cumulative
    * tokens), one checkpoint per document in id order. Natural text
    * sits at β ≈ 0.5–0.8; β near 1 means near-random tokens (vocab
    * grows linearly — an OCR/garbage smell), β near 0 a looping
    * template. The capacity-planning twin of [[fit]]: β prices the
    * vocabulary table a tokenizer/embedding build will need at 100 TB.
    *
    * Exactness: vocabulary growth needs no sequential scan of the
    * corpus — a term's first appearance is `min(doc_id)` (one
    * aggregate), so per-doc vocabulary increments are a doc-sized
    * table and both cumulatives are prefix sums over it. Logs snap
    * once to the micro lattice; the OLS sums are exact (the [[fit]]
    * policy). The prefix window runs on the COLLAPSED doc table; at
    * extreme doc counts it decomposes by the sharded two-pass scan
    * (GlobalScan) without changing the result.
    */
  def heaps(tokens: DataFrame, docCol: String, termCol: String): DataFrame = {
    Reserved.check("heaps" -> tokens)
    val d38 = DecimalType(38, 0)
    val perDoc = tokens.groupBy(col(docCol).as("__d"))
      .agg(count(lit(1)).as("__n"))
    val vocabAt = tokens.groupBy(col(termCol).as("__t"))
      .agg(min(col(docCol)).as("__d"))
      .groupBy(col("__d")).agg(count(lit(1)).as("__v"))
    val w = Window.orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lattice = perDoc
      .join(vocabAt, Seq("__d"), "left")
      .na.fill(0L, Seq("__v"))
      .withColumn("__N", sum(col("__n")).over(w))
      .withColumn("__V", sum(col("__v")).over(w))
      .select(
        round(log10(col("__N").cast("double")) * lit(1e6))
          .cast("long").as("__lx"),
        round(log10(col("__V").cast("double")) * lit(1e6))
          .cast("long").as("__ly"))
    val stats = lattice.agg(
      count(lit(1)).as("n_points"),
      sum(col("__lx")).as("__sx"), sum(col("__ly")).as("__sy"),
      sum(col("__lx").cast(d38) * col("__ly").cast(d38)).as("__sxy"),
      sum(col("__lx").cast(d38) * col("__lx").cast(d38)).as("__sxx"),
      sum(col("__ly").cast(d38) * col("__ly").cast(d38)).as("__syy"))
    val nD = col("n_points").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val cov = nD * sxy - sx * sy
    val varx = nD * sxx - sx * sx
    val vary = nD * syy - sy * sy
    stats
      .filter(col("n_points") >= 2)
      .select(col("n_points"),
        round(cov / varx, 6).as("beta"),
        round((sy - cov / varx * sx) / nD / lit(1e6), 6).as("log10_k"),
        // constant vocabulary (vary = 0) leaves r2 undefined — NULL,
        // not an ANSI divide-by-zero error
        when(vary === lit(0.0), lit(null))
          .otherwise(round(cov * cov / (varx * vary), 6)).as("r2"))
  }
}
