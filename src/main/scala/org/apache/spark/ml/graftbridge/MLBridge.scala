package org.apache.spark.ml.graftbridge

import org.apache.spark.ml.param.Params
import org.apache.spark.ml.util.{DefaultParamsReader, DefaultParamsWriter}
import org.apache.spark.sql.SparkSession

/** Documented access point to Spark's `private[ml]` persistence
  * helpers (the ml twin of `org.apache.spark.sql.graftbridge.Bridge`).
  *
  * Custom `MLWritable` stages must emit the exact metadata layout
  * `Pipeline`/`PipelineModel` readers expect (`metadata/part-*` JSON
  * with class/uid/paramMap), and the canonical emitters —
  * `DefaultParamsWriter.saveMetadata` / `DefaultParamsReader
  * .loadMetadata` — are `private[ml]`. Re-implementing the format by
  * hand would silently drift across Spark versions; delegating keeps
  * the engine's saved pipelines loadable by stock Spark.
  */
object MLBridge {

  /** Write `path/metadata` for a params-only or model stage. */
  def saveMetadata(instance: Params, path: String, spark: SparkSession): Unit =
    DefaultParamsWriter.saveMetadata(instance, path, spark)

  /** Read and validate `path/metadata` (expected class checked). */
  def loadMetadata(
      path: String, spark: SparkSession,
      expectedClassName: String): DefaultParamsReader.Metadata =
    DefaultParamsReader.loadMetadata(path, spark, expectedClassName)

  /** Restore param values from loaded metadata onto a new instance. */
  def getAndSetParams(
      instance: Params, metadata: DefaultParamsReader.Metadata): Unit =
    metadata.getAndSetParams(instance)
}
