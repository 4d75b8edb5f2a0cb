package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed `Aggregator[IN, BUF, OUT]` — the typed
  * Dataset API counterpart of the 16-column `min` formulation in
  * [[graft.ops.Dedup.minhashSignatures]] (SURVEY.md §2.8: custom
  * aggregates land as Aggregators).
  *
  * IN  = a 60-bit non-negative feature hash ([[PortableHash.tokenHash]])
  * BUF = the running 16-slot minimum vector
  * OUT = the final signature
  *
  * The buffer is a fixed-width Array[Long] — merge is element-wise min,
  * so the aggregate is associative + commutative and Spark runs it with
  * map-side partial aggregation, same as the untyped path. Used via
  * `ds.groupByKey(_.docId).agg(MinHashAggregator.toColumn)`.
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {

  import PortableHash.{P, minhashPerms}

  private val perms = minhashPerms.toArray

  override def zero: Array[Long] = Array.fill(perms.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < perms.length) {
      val (a, b) = perms(i)
      val v = (a * (h % P) + b) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  private val enc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def bufferEncoder: Encoder[Array[Long]] = enc
  override def outputEncoder: Encoder[Array[Long]] = enc
}
