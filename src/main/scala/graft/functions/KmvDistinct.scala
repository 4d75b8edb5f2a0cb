package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** KMV (k-minimum-values) distinct-count sketch: `kmv_minhashes(h, k)`
  * keeps the k smallest DISTINCT hash values per group.
  *
  * This is the mergeable sketch behind approximate COUNT DISTINCT at
  * 100 TB: each map task ships at most k longs per group to the shuffle
  * (vs. the full value set an exact distinct moves), partials merge by
  * set-union-then-truncate, and the estimator is
  * `(k-1) / frac(kth_min)` where `frac` maps the hash onto (0, 1].
  * Unlike HyperLogLog the sketch is exact below k distinct values and —
  * because it is just "the k smallest hashes" — every intermediate state
  * is reproducible by an ORDER BY h LIMIT k in any engine, which is what
  * makes the estimate oracle-checkable bit-for-bit (DuckDB's own
  * approx_count_distinct is HLL-based and engine-specific; this isn't).
  *
  * The hash input is expected to be [[PortableHash.tokenHash]] (60-bit,
  * non-negative) so Spark and the oracle agree on every value.
  *
  * Output: array<long> of the ≤ k smallest distinct hashes, ascending.
  */
case class KmvMinHashes(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "kmv_minhashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    if (!integral.contains(hashExpr.dataType))
      TypeCheckFailure(s"$prettyName hash must be integral, got ${hashExpr.dataType.simpleString}")
    else if (k <= 0) TypeCheckFailure(s"$prettyName k must be positive, got $k")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hashExpr.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = { buf.addAll(other); buf }

  override def eval(buf: KmvBuffer): Any = new GenericArrayData(buf.sortedAsc)

  override def serialize(buf: KmvBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0))
}

/** Bounded sorted set of the k smallest distinct longs. TreeSet gives
  * O(log k) insert/evict and free deduplication — duplicates of an
  * already-seen hash are no-ops, which is exactly the distinct-count
  * semantics (frequency must not matter).
  */
final class KmvBuffer(val k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    // skip the insert when the sketch is full and h can't displace anything
    if (set.size < k || set.last().longValue > h) {
      set.add(java.lang.Long.valueOf(h))
      if (set.size > k) set.pollLast()
    }
  }

  def addAll(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  def sortedAsc: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(set.size)
    val it = set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }
}

object KmvBuffer {
  def fromBytes(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }
}

object KmvFunctions {
  val name = "kmv_minhashes"

  /** tokenHash range is [0, 2^60): frac(h) = (h+1)/2^60 ∈ (0, 1]. */
  val HashSpace: Double = 1152921504606846976.0 // 2^60

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$name requires (hash, k), got ${exprs.length} arguments")
    val kExpr = exprs(1)
    require(kExpr.foldable, s"$name: k must be a literal, got ${kExpr.sql}")
    val k = kExpr.eval(InternalRow.empty) match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: k must be an integral literal, got $other")
    }
    KmvMinHashes(exprs(0), k)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder _, "built-in")

  /** k smallest distinct hashes per group; `k` must be a literal. */
  def kmvMinHashes(hash: Column, k: Int): Column =
    call_function(name, hash, org.apache.spark.sql.functions.lit(k))
}
