package graft.operators

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.graftbridge.MLBridge
import org.apache.spark.ml.linalg.{SQLDataTypes, Vector, Vectors}
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Unsmoothed base-10 IDF: idf(t) = log10(N / df(t)), the reference's
  * `inverse.doc.freq` (`Week5_datingNLP.R:220-225`). Deliberately NOT
  * MLlib's `IDF`, which computes the smoothed natural-log variant
  * ln((N+1)/(df+1)) (SURVEY M6).
  *
  * fit() is a single distributed pass: `Summarizer.numNonZeros` gives
  * per-slot document frequencies as one reduced vector (no shuffle of
  * the data, tree-aggregated to the driver); the idf vector is then
  * broadcast inside the transform closure. Terms with df=0 get idf=0.
  */
class Log10IDF(override val uid: String)
    extends Estimator[Log10IDFModel] with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("log10idf"))

  final val inputCol =
    new Param[String](this, "inputCol", "count/tf vector input column")
  final val outputCol =
    new Param[String](this, "outputCol", "idf-scaled output column")
  setDefault(outputCol -> "tfidf")
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def fit(ds: Dataset[_]): Log10IDFModel = {
    val row = ds.toDF().select(
      Summarizer.metrics("numNonZeros", "count")
        .summary(col($(inputCol))).as("s"))
      .select(col("s.numNonZeros"), col("s.count"))
      .head()
    val dfVec = row.getAs[Vector](0)
    val n = row.getLong(1).toDouble
    val idf = dfVec.toArray.map { df =>
      if (df > 0) math.log10(n / df) else 0.0
    }
    copyValues(new Log10IDFModel(uid, Vectors.dense(idf)).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), SQLDataTypes.VectorType, nullable = false)

  override def copy(extra: ParamMap): Log10IDF = defaultCopy(extra)
}

object Log10IDF extends DefaultParamsReadable[Log10IDF]

/** Fitted model: element-wise multiply by the idf vector. */
class Log10IDFModel(override val uid: String, val idf: Vector)
    extends Model[Log10IDFModel] with MLWritable {

  final val inputCol =
    new Param[String](this, "inputCol", "count/tf vector input column")
  final val outputCol =
    new Param[String](this, "outputCol", "idf-scaled output column")
  setDefault(outputCol -> "tfidf")
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(ds: Dataset[_]): DataFrame =
    // the native layout-preserving kernel (round 18): same multiply
    // order as the former UDF, bit-identical outputs, but the scan
    // stays inside whole-stage codegen — the UDF paid a VectorUDT
    // deserialize + re-serialize per document on the featurize path
    ds.withColumn($(outputCol),
      graft.functions.vector_scale(col($(inputCol)), idf.toArray))

  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), SQLDataTypes.VectorType, nullable = false)

  override def copy(extra: ParamMap): Log10IDFModel = {
    val copied = new Log10IDFModel(uid, idf)
    copyValues(copied, extra).setParent(parent)
  }

  override def write: MLWriter = new Log10IDFModel.Writer(this)
}

/** S4 persistence: `metadata/` + a one-row `data/` parquet holding the
  * idf vector values (mirrors Spark's IDFModel writer).
  */
object Log10IDFModel extends MLReadable[Log10IDFModel] {

  private class Writer(instance: Log10IDFModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      MLBridge.saveMetadata(instance, path, sparkSession)
      val spark = sparkSession
      import spark.implicits._
      Seq(Tuple1(instance.idf.toArray)).toDF("idf")
        .repartition(1).write.parquet(s"$path/data")
    }
  }

  private class Reader extends MLReader[Log10IDFModel] {
    private val className = classOf[Log10IDFModel].getName
    override def load(path: String): Log10IDFModel = {
      val metadata = MLBridge.loadMetadata(path, sparkSession, className)
      val idf = sparkSession.read.parquet(s"$path/data")
        .select("idf").head().getSeq[Double](0).toArray
      val model = new Log10IDFModel(metadata.uid, Vectors.dense(idf))
      MLBridge.getAndSetParams(model, metadata)
      model
    }
  }

  override def read: MLReader[Log10IDFModel] = new Reader
}
