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
}
