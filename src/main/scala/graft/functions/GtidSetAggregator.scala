package graft.functions

import graft.model.LogPosition.GtidSet
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed GTID-set union as a typed `Aggregator` — the committed
  * frontier of a sharded stream.
  *
  * The reference computes its committable frontier as a min over
  * per-partition scalar positions (coordinator/DefaultOffsetCoordinator.scala:117-150),
  * which only works because a single binlog totally orders events. With
  * GTID sets (multi-source replication, failover) the frontier is the
  * set UNION of what every partition has applied — an associative,
  * commutative fold, so Spark runs it with map-side partial aggregation:
  * each task unions its own gtids locally and ships ONE compact set to
  * the reduce side, regardless of how many billions of events it saw.
  *
  * IN  = one event's `uuid:txn` gtid string
  * BUF = the running [[GtidSet]] (coalesced intervals — O(#uuids×#gaps))
  * OUT = the canonical set string, directly persistable as the resume
  *       offset for [[graft.sources.BinlogFileSource]]'s `startGtids`
  */
object GtidSetAggregator extends Aggregator[String, GtidSet, String] {

  override def zero: GtidSet = GtidSet.empty

  override def reduce(buf: GtidSet, gtid: String): GtidSet = {
    val i = gtid.lastIndexOf(':')
    require(i > 0, s"bad gtid: $gtid")
    buf.add(gtid.substring(0, i), gtid.substring(i + 1).toLong)
  }

  override def merge(a: GtidSet, b: GtidSet): GtidSet = a.union(b)

  override def finish(buf: GtidSet): String = buf.toString

  override def bufferEncoder: Encoder[GtidSet] = Encoders.kryo[GtidSet]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
