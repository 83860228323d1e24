package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-k min-heap ordered worst-first, where
  * "worse" = lower score, ties broken by larger id (so the survivor
  * set and its (score desc, id asc) order match a global
  * `row_number().over(orderBy(desc(score), asc(id))) <= k` filter).
  */
final class TopKHeap(val k: Int) extends Serializable {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](math.max(k, 1))
  val ids: Array[Long] = new Array[Long](math.max(k, 1))

  // Total order matching Spark's double ordering (NaN greatest).
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  def insert(s: Double, id: Long): Unit = {
    if (k == 0) return
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id; siftDown(0)
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var j = 0
    while (j < other.size) { insert(other.scores(j), other.ids(j)); j += 1 }
  }

  /** Entries as (score, id), best first. */
  def sortedEntries: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(j => (scores(j), ids(j)))
    // best first = reverse of "worse": score desc, id asc
    java.util.Arrays.sort(out, { (a: (Double, Long), b: (Double, Long)) =>
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    out
  }
}

/** `top_k_by(score, id, k)` — per-group top-k rows by (score desc, id
  * asc) as `array<struct<score double, id bigint>>`, best first.
  *
  * Why an imperative aggregate and not a rank window: a window's
  * exchange carries EVERY candidate row to the query's reducer before
  * the rank filter drops them — for brute-force ANN that is
  * queries × corpus rows through one shuffle. This aggregate's partial
  * buffers are capped at k entries, so map-side combine bounds the
  * exchange to groups × k rows per map partition, independent of the
  * corpus size.
  *
  * Semantics vs the window formulation: rows where score or id is
  * null are SKIPPED (a `desc` window would rank null scores last and
  * could pad the tail with them); inputs must already be double/long
  * (no implicit coercion — `AbstractDataType` is private[sql], so the
  * [[graft.functions.top_k_by]] wrapper casts explicitly instead).
  */
case class TopKByScore(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap]
    with BinaryLike[Expression] {

  require(k >= 1, s"top_k_by requires k >= 1, got $k")

  def score: Expression = left
  def id: Expression = right

  /** The wrapper casts id→bigint and score→double for the buffer; a
    * silent cast from a string/decimal/fractional id would null or
    * truncate rows invisibly, so this check looks THROUGH a top-level
    * cast at the source type and rejects non-integral ids and
    * non-numeric scores at analysis time.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    def source(e: Expression): DataType = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => c.child.dataType
      case other => other.dataType
    }
    if (!TopKByScore.isIntegral(source(id)))
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by id must be integral (byte/short/int/long), got " +
          s"${source(id).sql}: a non-integral id would cast to null or " +
          "truncate silently")
    else if (!source(score).isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by score must be numeric, got ${source(score).sql}")
    else if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by requires (double, bigint) inputs, got " +
        s"(${score.dataType.sql}, ${id.dataType.sql}); cast explicitly")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedEntries.map {
      case (s, i) => InternalRow(s, i)
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var j = 0
    while (j < buffer.size) {
      bb.putDouble(buffer.scores(j)); bb.putLong(buffer.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var j = 0
    while (j < n) { heap.insert(bb.getDouble(), bb.getLong()); j += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopKByScore {
  /** `IntegralType` is private[sql]; enumerate the concrete types. */
  def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
}
