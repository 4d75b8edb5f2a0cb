package graft

import graft.functions.GtidSetAggregator
import graft.model.LogPosition.GtidSet

/** Distributed GTID frontier = union aggregate; result must equal the
  * sequential union regardless of partitioning, and gaps must survive
  * (they are exactly what catchup needs to replay).
  */
class GtidSetAggregatorSpec extends SparkSpec {

  import spark.implicits._

  test("distributed union equals sequential union under any partitioning") {
    val gtids = (1 to 500).map(i => s"a:$i") ++ (3 to 400 by 3).map(i => s"b:$i")
    val sequential = gtids.foldLeft(GtidSet.empty) { (s, g) =>
      val i = g.lastIndexOf(':')
      s.add(g.substring(0, i), g.substring(i + 1).toLong)
    }.toString
    for (parts <- Seq(1, 7, 32)) {
      val got = gtids.toDS().repartition(parts)
        .select(GtidSetAggregator.toColumn.name("frontier")).head()
      assert(got == sequential, s"partitions=$parts")
    }
    assert(sequential.startsWith("a:1-500,b:3"), sequential)
  }

  test("gaps survive the union (what catchup must replay)") {
    val got = Seq("s:1", "s:2", "s:5", "s:6", "s:9").toDS()
      .select(GtidSetAggregator.toColumn.name("frontier")).head()
    assert(got == "s:1-2:5-6:9")
    // the replay gap against a complete server set:
    val gap = GtidSet.parse("s:1-9").subtract(GtidSet.parse(got)).toString
    assert(gap == "s:3-4:7-8")
  }

  test("per-group frontiers via groupByKey (one resume offset per table)") {
    val events = Seq(("t0", "a:1"), ("t0", "a:2"), ("t1", "a:5"), ("t1", "b:1")).toDS()
    val got = events.groupByKey(_._1)
      .mapValues(_._2)
      .agg(GtidSetAggregator.toColumn.name("frontier"))
      .collect().toMap
    assert(got == Map("t0" -> "a:1-2", "t1" -> "a:5,b:1"))
  }
}
