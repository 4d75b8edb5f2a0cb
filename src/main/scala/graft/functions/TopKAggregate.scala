package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Heap-based top-k aggregate: `top_k_by_value(value, id, k)` keeps the k
  * largest (value, id) pairs per group in a bounded min-heap.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY v DESC)` sorts EVERY group member per partition — O(n log n)
  * over the whole input, with window buffers. The heap aggregate is
  * O(n log k) with map-side partial aggregation: each map task ships at
  * most k pairs per group to the shuffle, which at 100 TB is the
  * difference between shuffling the corpus and shuffling k·|groups|
  * rows. (TypedImperativeAggregate is the third Catalyst extension rung,
  * next to the scalar `DotProductD` Expression and the typed
  * `MinHashAggregator`.)
  *
  * Output: array<struct<value double, id long>> sorted value desc, id asc
  * (same deterministic tie-break as the window formulation).
  */
case class TopKByValue(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "top_k_by_value"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val numeric = Set[DataType](ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    if (!numeric.contains(valueExpr.dataType))
      TypeCheckFailure(s"$prettyName value must be numeric, got ${valueExpr.dataType.simpleString}")
    else if (!numeric.contains(idExpr.dataType))
      TypeCheckFailure(s"$prettyName id must be integral, got ${idExpr.dataType.simpleString}")
    else if (k <= 0) TypeCheckFailure(s"$prettyName k must be positive, got $k")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buf.add(v.asInstanceOf[Number].doubleValue(), id.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = { buf.addAll(other); buf }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (v, id) =>
      InternalRow(v, id)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

/** Bounded min-heap of (value, id); evicts the smallest when over k.
  * Ordering: larger value wins; on equal values the SMALLER id wins a
  * slot (matches `ORDER BY value DESC, id`).
  */
final class TopKBuffer(val k: Int) {
  // PriorityQueue dequeues the ord-MAXIMUM; rank the weakest element
  // (smallest value, then largest id) as maximum so it's evicted first
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)

  def add(v: Double, id: Long): Unit = {
    heap.enqueue((v, id))
    if (heap.size > k) heap.dequeue()
  }

  def addAll(other: TopKBuffer): Unit = other.heap.foreach { case (v, id) => add(v, id) }

  def sortedDesc: Array[(Double, Long)] =
    heap.toArray.sortBy { case (v, id) => (-v, id) }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(heap.size)
    heap.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush(); bos.toByteArray
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }
}

object TopKFunctions {
  val name = "top_k_by_value"

  /** Single builder shared by the temp-function path and
    * [[GraftExtensions]]. k must be a foldable integral literal —
    * rejected with a usage message, not a ClassCastException, because
    * the extensions path exposes this to every SQL user on a cluster.
    */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"$name requires (value, id, k), got ${exprs.length} arguments")
    val kExpr = exprs(2)
    require(kExpr.foldable, s"$name: k must be a literal, got ${kExpr.sql}")
    val k = kExpr.eval(InternalRow.empty) match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: k must be an integral literal, got $other")
    }
    TopKByValue(exprs(0), exprs(1), k)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder _, "built-in")

  /** top-k (value, id) pairs per group; `k` must be a literal. */
  def topKByValue(value: Column, id: Column, k: Int): Column =
    call_function(name, value, id, org.apache.spark.sql.functions.lit(k))
}
