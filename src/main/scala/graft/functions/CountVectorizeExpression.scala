package graft.functions

import org.apache.spark.ml.linalg.{SQLDataTypes, Vector, Vectors}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, UserDefinedType}
import org.apache.spark.unsafe.types.UTF8String

/** Native bag-of-words kernel backing
  * [[graft.operators.TrimmedCountVectorizerModel.transform]] (reference
  * DFM build, `Week5_datingNLP.R:92`): `array<string> → ml SparseVector`
  * of per-document vocabulary counts.
  *
  * Why not a UDF: the previous formulation paid, per token, a
  * UTF8String→String copy, an immutable-Map lookup, and a boxed TreeMap
  * insert — measured as the largest remaining cost of the flagship
  * pipeline at ~9M tokens. This kernel probes a UTF8String-keyed
  * HashMap directly against the unsafe array bytes (no copies) and
  * scatters counts into a thread-local dense int array (vocab-sized,
  * allocated once per executor thread, reset via the touched-index
  * list), then emits indices in ascending order with one bounded sort.
  *
  * Executor-side state: the kernel rides the serialized plan — Spark
  * broadcasts the task binary once per stage, so the vocabulary ships
  * to each executor once, like the old explicit `Broadcast`.
  */
final class CountVectorizeKernel(val vocabulary: Array[String])
    extends Serializable {

  private val numTerms = vocabulary.length

  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](numTerms * 2)
    var i = 0
    while (i < numTerms) { m.put(UTF8String.fromString(vocabulary(i)), i); i += 1 }
    m
  }

  @transient private lazy val udt =
    SQLDataTypes.VectorType.asInstanceOf[UserDefinedType[Vector]]

  // Dense per-thread scatter buffer; entries are zeroed on exit via the
  // touched list, so re-use across rows is clean.
  @transient private lazy val scratch: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](numTerms))

  def apply(arr: ArrayData): InternalRow = {
    val n = if (arr == null) 0 else arr.numElements()
    if (n == 0 || numTerms == 0)
      return udt
        .serialize(Vectors.sparse(numTerms, Array.emptyIntArray, Array.emptyDoubleArray))
        .asInstanceOf[InternalRow]
    val idx = index
    val counts = scratch.get()
    val touched = new Array[Int](math.min(n, numTerms))
    var nTouched = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val slot = idx.get(t)
        if (slot != null) {
          val s = slot.intValue()
          if (counts(s) == 0) { touched(nTouched) = s; nTouched += 1 }
          counts(s) += 1
        }
      }
      i += 1
    }
    java.util.Arrays.sort(touched, 0, nTouched)
    val indices = new Array[Int](nTouched)
    val values = new Array[Double](nTouched)
    var j = 0
    while (j < nTouched) {
      val s = touched(j)
      indices(j) = s
      values(j) = counts(s).toDouble
      counts(s) = 0
      j += 1
    }
    udt.serialize(Vectors.sparse(numTerms, indices, values))
      .asInstanceOf[InternalRow]
  }
}

/** `array<string> → vector` vocabulary-count expression (codegen). Null
  * or empty token arrays yield the empty sparse vector (the model's
  * documented semantics), so the output is never null.
  */
case class CountVectorizeExpression(
    child: Expression,
    kernel: CountVectorizeKernel)
    extends UnaryExpression {

  override def dataType: DataType = SQLDataTypes.VectorType
  override def nullable: Boolean = false
  override def prettyName: String = "count_vectorize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> input, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): Any =
    kernel(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernelRef = ctx.addReferenceObj(
      "countVecKernel", kernel, classOf[CountVectorizeKernel].getName)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        |${childGen.code}
        |$javaType ${ev.value} =
        |  $kernelRef.apply(${childGen.isNull} ? null : ${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CountVectorizeExpression = copy(child = newChild)
}
