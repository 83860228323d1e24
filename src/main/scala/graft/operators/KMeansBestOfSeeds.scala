package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.sql.Dataset

/** R's `kmeans(nstart=50)` (reference `Week5_datingNLP.R:301-313`)
  * keeps the best of 50 random restarts. MLlib has no restart knob (its
  * k-means‖ init usually needs none) — this helper replicates the
  * intent: fit once per seed, keep the model with minimum training
  * cost. Runs are sequential; each is fully distributed.
  */
object KMeansBestOfSeeds {
  def fit(
      data: Dataset[_],
      k: Int,
      seeds: Seq[Long],
      featuresCol: String = "features",
      maxIter: Int = 20): KMeansModel = {
    require(seeds.nonEmpty, "need at least one seed")
    seeds.map { seed =>
      new KMeans()
        .setK(k).setSeed(seed).setMaxIter(maxIter)
        .setFeaturesCol(featuresCol)
        .fit(data)
    }.minBy(_.summary.trainingCost)
  }
}
