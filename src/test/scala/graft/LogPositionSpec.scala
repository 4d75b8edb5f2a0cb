package graft

import graft.model.LogPosition.{FilePosition, GtidSet}
import org.scalatest.funsuite.AnyFunSuite

/** Position algebra: file ordering + correct GTID-set semantics (the
  * reference's string compare would get several of these wrong:
  * model/BinlogPosition.scala:19-20).
  */
class LogPositionSpec extends AnyFunSuite {

  test("file positions order by numeric suffix then offset") {
    assert(FilePosition("binlog.000002", 4L) > FilePosition("binlog.000001", 999999L))
    assert(FilePosition("binlog.000010", 4L) > FilePosition("binlog.000009", 4L)) // lexical compare fails this
    assert(FilePosition("binlog.000001", 100L) < FilePosition("binlog.000001", 200L))
    assert(FilePosition.parse("binlog.000007:1234") == FilePosition("binlog.000007", 1234L))
  }

  private val u1 = "3E11FA47-71CA-11E1-9E33-C80AA9429562"
  private val u2 = "AAAAAAAA-0000-0000-0000-000000000000"

  test("gtid parse / render round-trip with coalescing") {
    val g = GtidSet.parse(s"$u1:1-5:7:6,$u2:10-20")
    // 1-5,6,7 coalesce to 1-7
    assert(g.toString == s"$u1:1-7,$u2:10-20".sortedGtid)
    assert(g.txnCount == 7 + 11)
  }

  implicit class S(s: String) { def sortedGtid: String = s.split(",").sorted.mkString(",") }

  test("numeric interval compare (string compare gets 1-9 vs 1-10 wrong)") {
    val small = GtidSet.parse(s"$u1:1-9")
    val big = GtidSet.parse(s"$u1:1-10")
    assert(small.compare(big) == Some(-1)) // "1-9" > "1-10" lexically — the reference's bug
    assert(big.compare(small) == Some(1))
    assert(small.compare(small) == Some(0))
  }

  test("incomparable sets return None, not an arbitrary order") {
    val a = GtidSet.parse(s"$u1:1-5")
    val b = GtidSet.parse(s"$u1:1-3:7-8")
    assert(a.compare(b).isEmpty && b.compare(a).isEmpty)
  }

  test("multi-source subset requires every uuid covered") {
    val a = GtidSet.parse(s"$u1:1-5,$u2:1-2")
    val b = GtidSet.parse(s"$u1:1-10")
    assert(!a.isSubsetOf(b)) // u2 missing from b
    assert(GtidSet.parse(s"$u1:2-4").isSubsetOf(a))
  }

  test("union coalesces adjacent and overlapping ranges") {
    val g = GtidSet.parse(s"$u1:1-3").union(GtidSet.parse(s"$u1:4-6:10"))
    assert(g.toString == s"$u1:1-6:10")
  }

  test("subtract yields the catchup gap") {
    val executed = GtidSet.parse(s"$u1:1-100")
    val applied = GtidSet.parse(s"$u1:1-40:61-90")
    val gap = executed.subtract(applied)
    assert(gap.toString == s"$u1:41-60:91-100")
    assert(applied.union(gap).compare(executed) == Some(0))
  }

  test("add is idempotent and extends ranges") {
    val g = GtidSet.empty.add(u1, 1).add(u1, 2).add(u1, 2).add(u1, 4)
    assert(g.toString == s"$u1:1-2:4")
    assert(g.contains(u1, 2) && !g.contains(u1, 3))
  }
}
