package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `elementwise_min(array<bigint>)` — per-group elementwise minimum of
  * equal-length long arrays, the MinHash signature fold.
  *
  * Why an imperative aggregate: the previous signature formulation
  * posexploded the per-shingle 32-hash array into narrow
  * (id, seed, hash) rows and reduced them with a plain `min` — correct
  * and map-side-combinable, but it materializes shingles × numHashes
  * rows through the hash-aggregate machinery (256M update calls at the
  * bench's 8M-shingle scale witness). This aggregate folds the SAME
  * per-row hash array in one update call per shingle row — numHashes×
  * fewer aggregate updates, no row explosion, and the partial buffer
  * shipped by map-side combine is one numHashes-long array per (doc,
  * map partition) instead of numHashes rows. (The other two rejected
  * formulations stand as measured in the Dedup.minhashBuckets
  * scaladoc: numHashes separate `min(...)` columns blow up janino
  * whole-stage codegen; a Scala `Aggregator` UDAF pays per-row encoder
  * overhead.)
  *
  * Exactness contract: the fold is min, so the result is bit-identical
  * to the explode/groupBy-min reference for any row order or
  * partitioning — MinhashSigSpec pins the bucket rows against the
  * reference formulation verbatim. Null arrays are skipped; arrays
  * with NULLABLE elements are rejected at analysis time
  * (ArrayData.toLongArray would silently read a null element as 0 —
  * the xxhash64 signature path is containsNull=false by
  * construction); mixed lengths raise (signatures are fixed
  * numHashes-length by construction).
  */
case class ElementwiseMin(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
        "elementwise_min requires non-nullable array elements: " +
          "ArrayData.toLongArray would silently read a null element " +
          "as 0 and corrupt the fold")
      case dt => TypeCheckResult.TypeCheckFailure(
        s"elementwise_min requires array<bigint>, got ${dt.sql}")
    }
  // a group whose every array value is null folds nothing and evals
  // to NULL (standard aggregate semantics, like min over all-nulls)
  // — never to the empty-buffer sentinel, which downstream sig[i]
  // indexing would read as garbage
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "elementwise_min"

  /** Empty = "no rows folded yet" sentinel (real inputs are required
    * nonzero length — update raises on a zero-length array, which
    * would otherwise be indistinguishable from the sentinel).
    */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData].toLongArray()
      require(arr.length > 0,
        "elementwise_min: empty array input — zero-length arrays are " +
          "indistinguishable from the uninitialized buffer and would " +
          "be silently skipped; filter them out upstream")
      if (buffer.isEmpty) arr
      else {
        require(arr.length == buffer.length,
          s"elementwise_min: mixed array lengths " +
            s"(${arr.length} vs ${buffer.length})")
        var i = 0
        while (i < buffer.length) {
          if (arr(i) < buffer(i)) buffer(i) = arr(i)
          i += 1
        }
        buffer
      }
    }
  }

  override def merge(
      buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (buffer.isEmpty) other
    else if (other.isEmpty) buffer
    else {
      require(other.length == buffer.length,
        s"elementwise_min: mixed array lengths " +
          s"(${other.length} vs ${buffer.length})")
      var i = 0
      while (i < buffer.length) {
        if (other(i) < buffer(i)) buffer(i) = other(i)
        i += 1
      }
      buffer
    }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = bb.getLong(); i += 1 }
    a
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ElementwiseMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ElementwiseMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): ElementwiseMin =
    copy(child = newChild)
}
