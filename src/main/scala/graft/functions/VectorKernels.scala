package graft.functions

import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Row-level ml-`Vector` kernels shared by the native expressions
  * below (VERDICT r17 #7, completing the vector_at work): both read
  * the serialized `VectorUDT` layout `(type: byte, size: int,
  * indices: array<int>, values: array<double>)` straight off the
  * input row and emit Catalyst-native values, so the operators they
  * back stay inside whole-stage codegen. The UDFs they replace paid,
  * per row, a full UDT deserialization (indices + values copied into
  * an ml `Vector`), a Scala collection build, and the
  * reflection-encoded conversion back — measured as CART's stats-pass
  * and the TF-IDF featurize tax on the flagship.
  *
  * Input array handles are NEVER retained: unsafe buffers are reused
  * between rows by the scan, so each kernel copies what it keeps
  * (`toIntArray`/`toDoubleArray`).
  */
private object VectorKernelUtil {
  /** (indices, values, size) of the serialized vector, densified to
    * the sparse view: for a dense vector indices are 0..n-1.
    */
  @inline def isDense(row: InternalRow): Boolean =
    row.getByte(0) == 1.toByte
}

/** Nonzero `(index, value)` pairs of an ml vector as
  * `array<struct<_1:int, _2:double>>` — the exact output shape of the
  * Scala-tuple UDF it replaces (DeterministicCart's stats pass reads
  * `e._1`/`e._2`), with explicit zeros filtered on both layouts.
  */
case class VectorNonzeros(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("_1", IntegerType, nullable = false),
      StructField("_2", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "vector_nonzeros"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == SQLDataTypes.VectorType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a vector input, got " +
        child.dataType.simpleString(10))

  /** Public row kernel — called from both eval and generated code
    * (generated classes cannot reach a protected nullSafeEval).
    */
  def kernel(row: InternalRow): ArrayData = {
    val values = row.getArray(3)
    val n = values.numElements()
    val out = new Array[Any](n)
    var k = 0
    if (VectorKernelUtil.isDense(row)) {
      var i = 0
      while (i < n) {
        val x = values.getDouble(i)
        if (x != 0.0) {
          out(k) = new GenericInternalRow(Array[Any](i, x)); k += 1
        }
        i += 1
      }
    } else {
      val indices = row.getArray(2)
      var i = 0
      while (i < n) {
        val x = values.getDouble(i)
        if (x != 0.0) {
          out(k) = new GenericInternalRow(
            Array[Any](indices.getInt(i), x)); k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(
      if (k == n) out
      else java.util.Arrays.copyOfRange(
        out.asInstanceOf[Array[AnyRef]], 0, k))
  }

  override def nullSafeEval(vec: Any): Any =
    kernel(vec.asInstanceOf[InternalRow])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("vectorNonzeros", this,
      classOf[VectorNonzeros].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.kernel($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): VectorNonzeros = copy(child = newChild)
}

/** `array<float|double>` → dense ml vector, the KMeans/PCA input
  * adapter — replaces the `toMlVector` UDF: same null propagation
  * (null array → null vector; MLlib fits NPE on a null feature row
  * otherwise), but the conversion never materializes a Scala Seq or
  * an ml `Vector` object — one primitive-array copy into the
  * serialized dense layout, inside whole-stage codegen.
  */
case class VectorFromFloats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = SQLDataTypes.VectorType
  override def prettyName: String = "vector_from_floats"

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  // ADVICE r18: getFloat/getDouble read a null slot as 0.0, so a
  // nullable-element array could silently zero embedding dimensions
  // where the replaced toMlVector UDF failed loudly. Parquet reads
  // arrays as containsNull=true even for null-free data, so the
  // check is a per-element RUNTIME raise (analysis-time rejection
  // would refuse every parquet-sourced embedding column); it is
  // skipped entirely when the schema proves no nulls.
  private lazy val elemNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) |
           ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> input, got " +
          other.simpleString(10))
    }

  /** Public row kernel — called from both eval and generated code. */
  def kernel(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val values = new Array[Double](n)
    var i = 0
    if (elemNullable) {
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: null element at index $i — a null embedding " +
            "dimension cannot be silently zeroed; filter or coalesce " +
            "null slots upstream")
        i += 1
      }
      i = 0
    }
    if (elemIsFloat) {
      while (i < n) { values(i) = arr.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { values(i) = arr.getDouble(i); i += 1 }
    }
    new GenericInternalRow(
      Array[Any](1.toByte, null, null, new GenericArrayData(values)))
  }

  override def nullSafeEval(arr: Any): Any =
    kernel(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("vectorFromFloats", this,
      classOf[VectorFromFloats].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.kernel($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): VectorFromFloats = copy(child = newChild)
}

/** Element-wise product of an ml vector with a fixed weight array
  * (the fitted idf vector), preserving layout: sparse stays sparse on
  * the SAME indices, dense stays dense. Backs
  * [[graft.operators.Log10IDFModel.transform]]; same multiply order
  * as the UDF it replaces, so outputs are bit-identical. The weight
  * array rides the serialized expression — shipped once per stage
  * with the task binary, like a broadcast.
  */
case class VectorScale(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = SQLDataTypes.VectorType
  override def prettyName: String = "vector_scale"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == SQLDataTypes.VectorType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a vector input, got " +
        child.dataType.simpleString(10))

  /** Public row kernel — called from both eval and generated code. */
  def kernel(row: InternalRow): InternalRow = {
    val values = row.getArray(3)
    val n = values.numElements()
    val scaled = new Array[Double](n)
    if (VectorKernelUtil.isDense(row)) {
      var i = 0
      while (i < n) { scaled(i) = values.getDouble(i) * weights(i); i += 1 }
      new GenericInternalRow(
        Array[Any](1.toByte, null, null, new GenericArrayData(scaled)))
    } else {
      val indices = row.getArray(2).toIntArray() // copy: buffer reuse
      var i = 0
      while (i < n) {
        scaled(i) = values.getDouble(i) * weights(indices(i)); i += 1
      }
      new GenericInternalRow(Array[Any](0.toByte, row.getInt(1),
        new GenericArrayData(indices), new GenericArrayData(scaled)))
    }
  }

  override def nullSafeEval(vec: Any): Any =
    kernel(vec.asInstanceOf[InternalRow])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("vectorScale", this,
      classOf[VectorScale].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.kernel($v);")
  }

  // case-class equality on an Array is reference equality; make copies
  // with equal weights compare equal (Catalyst dedups subexpressions
  // by semanticEquals)
  override def equals(other: Any): Boolean = other match {
    case VectorScale(c, w) =>
      c == child && java.util.Arrays.equals(w, weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)

  override protected def withNewChildInternal(
      newChild: Expression): VectorScale = copy(child = newChild)
}
