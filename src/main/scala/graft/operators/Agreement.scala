package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the label-quality gate an RLHF /
  * supervised-data pipeline runs before trusting human (or model)
  * annotations: raw agreement alone is inflated by class imbalance,
  * so Cohen's κ subtracts chance agreement from the marginals
  * (Cohen 1960).
  *
  * Everything up to the final ratio is INTEGER arithmetic on the
  * k×k pair counts (n·agree and Σ row·col products), so both engines
  * compute identical numerators/denominators; the single division
  * happens once on those exact integers (double-exact below 2^53)
  * and rounds to ppm — the engine's integer-lattice discipline.
  * κ can be negative (worse-than-chance), so the edge uses
  * round-half-away (identical in both engines for the same double),
  * NOT integer floor division whose truncation direction differs.
  *
  * Scale: one map-side-combined groupBy over the pair stream; every
  * later frame is label-vocabulary-sized.
  */
object Agreement {

  /** One row: (n, agree, po_ppm, pe_ppm, kappa_ppm) for the two
    * label columns. Rows where either label is null are excluded
    * (an unlabeled item can't agree or disagree).
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    Reserved.check("labels" -> df)
    val pairs = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))

    val totals = pairs.agg(
      sum(col("__c")).as("n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
        .as("agree"))
    // chance-agreement mass: Σ_label rowTotal(label) · colTotal(label).
    // Inner join is exact: a label missing on either side contributes
    // a zero product.
    val rowT = pairs.groupBy(col("__a").as("__l"))
      .agg(sum(col("__c")).as("__ra"))
    val colT = pairs.groupBy(col("__b").as("__l"))
      .agg(sum(col("__c")).as("__rb"))
    val peNum = rowT.join(colT, "__l")
      .agg(coalesce(sum(col("__ra") * col("__rb")), lit(0L)).as("__pe"))

    totals.crossJoin(broadcast(peNum))
      .select(col("n"), col("agree"),
        expr("(agree * CAST(1000000 AS BIGINT)) div n").as("po_ppm"),
        expr("(__pe * CAST(1000000 AS BIGINT)) div (n * n)").as("pe_ppm"),
        round((col("n") * col("agree") - col("__pe")).cast("double") /
          (col("n") * col("n") - col("__pe")).cast("double") * lit(1e6))
          .cast("long").as("kappa_ppm"))
  }

  /** Krippendorff's alpha per partition, nominal metric
    * (Krippendorff 1970; 2011) — the agreement coefficient an
    * annotation pipeline standardizes on once [[cohensKappa]]'s
    * limits bite: ANY number of raters, MISSING ratings allowed
    * (units keep whatever ratings they have; only unpairable 1-rating
    * units drop), and a chance model from the pooled value
    * distribution rather than per-rater marginals.
    *
    * With n_uc the count of category c in unit u, m_u = Σ_c n_uc the
    * unit's pairable ratings, n = Σ_u m_u and n_c = Σ_u n_uc:
    *
    *   α = 1 − (n−1) · [Σ_u Σ_c n_uc(m_u − n_uc)/(m_u−1)]
    *               / [Σ_c n_c(n − n_c)]
    *
    * (the coincidence-matrix formulation collapsed for the nominal
    * metric). The per-unit quotient rides the kruskalWallis
    * div+remnano lattice — integer quotient T_u div (m_u−1)
    * DECIMAL-summed, remainder fraction snapped alone to nano and
    * integer-summed — and the expected-disagreement denominator is
    * an exact DECIMAL integer, so ONE written IEEE sequence forms α
    * at the micro edge. Rater identity is irrelevant under the
    * nominal metric (only per-unit category counts enter), so the
    * input is simply (part, unit, label) rows; NULL labels drop
    * (an abstention, the missing-data path alpha exists for).
    *
    * Shape: two keyed aggregates + label-vocabulary-sized frames —
    * no windows, no joins beyond group-sized ones, scale-safe.
    *
    * Output: (part, n_units, n_ratings, k_categories, alpha_micro) —
    * partitions with ≥ 2 pairable units and a nonzero expected
    * disagreement (all ratings one category → no test).
    */
  def krippendorffAlpha(
      df: DataFrame, partCol: String, unitCol: String, labelCol: String)
      : DataFrame = {
    Reserved.check("labels" -> df)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = df.filter(col(labelCol).isNotNull)
      .select(col(partCol).as("__p"), col(unitCol).as("__u"),
        col(labelCol).as("__l"))
    val perUnitLabel = rows.groupBy(col("__p"), col("__u"), col("__l"))
      .agg(count(lit(1)).as("__nuc"))
    val perUnit = perUnitLabel.groupBy(col("__p"), col("__u"))
      .agg(sum(col("__nuc")).as("__mu"))
      .filter(col("__mu") >= 2)
    val kept = perUnitLabel.join(perUnit, Seq("__p", "__u"))
    val unitDisagreement = kept
      .groupBy(col("__p"), col("__u"))
      .agg(first(col("__mu")).as("__mu"),
        sum(col("__nuc") * (col("__mu") - col("__nuc"))).as("__tu"))
    val no = unitDisagreement.groupBy(col("__p"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("__mu")).as("n_ratings"),
        sum((col("__tu").cast(d38) -
          pmod(col("__tu").cast(d38), (col("__mu") - 1L).cast(d38))) /
          (col("__mu") - 1L).cast(d38)).as("__qsum"),
        sum(round(pmod(col("__tu").cast(d38),
          (col("__mu") - 1L).cast(d38)).cast("double") /
          (col("__mu") - 1L).cast("double") * lit(1e9))
          .cast("long")).as("__remsum"))
    val catTotals = kept.groupBy(col("__p"), col("__l"))
      .agg(sum(col("__nuc")).as("__nc"))
    val de = catTotals
      .join(no.select(col("__p"), col("n_ratings")), "__p")
      .groupBy(col("__p"))
      .agg(count(lit(1)).as("k_categories"),
        sum(col("__nc").cast(d38) *
          (col("n_ratings") - col("__nc")).cast(d38)).as("__de"))
    no.join(de, "__p")
      .filter(col("n_units") >= 2 && col("__de") > 0)
      .select(col("__p").as(partCol), col("n_units"), col("n_ratings"),
        col("k_categories"),
        round((lit(1.0) -
          (col("n_ratings").cast("double") - lit(1.0)) *
            (col("__qsum").cast("double") +
              col("__remsum").cast("double") / lit(1e9)) /
            col("__de").cast("double")) * lit(1e6))
          .cast("long").as("alpha_micro"))
  }

  /** Intraclass correlation ICC(1), one-way random effects (Shrout &
    * Fleiss 1979, unbalanced form) — the CONTINUOUS-ratings
    * agreement coefficient completing the family ([[cohensKappa]]
    * nominal two-rater, [[krippendorffAlpha]] nominal multi-rater
    * with missingness, Kendall's W ordinal): what fraction of score
    * variance is BETWEEN the rated units rather than rater noise.
    *
    *   ICC = (MSB − MSW)/(MSB + (n₀−1)·MSW)
    *   n₀ = (N − Σkᵤ²/N)/(U−1)      (the unbalanced group-size mean)
    *
    * with MSB/MSW the one-way ANOVA mean squares over units. Every
    * sufficient statistic is exact: per-unit (kᵤ, Sᵤ) integers,
    * ΣSᵤ²/kᵤ on the kruskalWallis div+remnano lattice, ΣX and
    * DECIMAL ΣX²; ONE written IEEE sequence forms ICC at the micro
    * edge. Units with a single rating still contribute (they carry
    * between-unit information; SSW gains nothing from them — the
    * one-way ANOVA handles unbalance natively). NULL ratings drop.
    *
    * Shape: two keyed aggregates — no windows, no joins beyond
    * group-sized ones, scale-safe.
    *
    * Output: (part, n_units, n_ratings, icc_micro) — partitions
    * with ≥ 2 units, N > U, and a nonzero denominator.
    */
  def icc1(
      df: DataFrame, partCol: String, unitCol: String, scoreCol: String)
      : DataFrame = {
    Reserved.check("scores" -> df)
    // A DoubleType score would silently truncate at the long cast
    // below and yield a plausible-but-wrong ICC — refuse fractional
    // inputs eagerly (the NonParametric family policy).
    NonParametric.requireIntegral(df, scoreCol)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val rows = df.filter(col(scoreCol).isNotNull)
      .select(col(partCol).as("__p"), col(unitCol).as("__u"),
        col(scoreCol).cast("long").as("__x"))
    val perUnit = rows.groupBy(col("__p"), col("__u"))
      .agg(count(lit(1)).as("__k"), sum(col("__x")).as("__s"))
      .select(col("__p"), col("__k"),
        expr("(__s * __s) div __k").as("__q"),
        round(expr("(__s * __s) % __k").cast("double") /
          col("__k").cast("double") * lit(1e9)).cast("long")
          .as("__remnano"))
    val units = perUnit.groupBy(col("__p"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("__k")).as("n_ratings"),
        sum(col("__k").cast(d38) * col("__k").cast(d38)).as("__sk2"),
        sum(col("__q").cast(d38)).as("__qsum"),
        sum(col("__remnano")).as("__remsum"))
    val totals = rows.groupBy(col("__p"))
      .agg(sum(col("__x")).as("__t"),
        sum(col("__x").cast(d38) * col("__x").cast(d38)).as("__sxx"))
    val j = units.join(totals, "__p")
      .filter(col("n_units") >= 2 && col("n_ratings") > col("n_units"))
    val nD = col("n_ratings").cast("double")
    val uD = col("n_units").cast("double")
    val sOverK = col("__qsum").cast("double") +
      col("__remsum").cast("double") / lit(1e9)
    val ssb = sOverK -
      col("__t").cast("double") * col("__t").cast("double") / nD
    val ssw = col("__sxx").cast("double") - sOverK
    val n0 = (nD - col("__sk2").cast("double") / nD) / (uD - lit(1.0))
    val msb = ssb / (uD - lit(1.0))
    val msw = ssw / (nD - uD)
    val den = msb + (n0 - lit(1.0)) * msw
    j.filter(den > 0.0)
      .select(col("__p").as(partCol), col("n_units"), col("n_ratings"),
        round((msb - msw) / den * lit(1e6)).cast("long")
          .as("icc_micro"))
  }
}
