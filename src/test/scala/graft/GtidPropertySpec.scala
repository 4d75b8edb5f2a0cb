package graft

import graft.model.LogPosition.GtidSet
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** GTID-set algebra laws over random interval sets. */
class GtidPropertySpec extends AnyFunSuite {

  private val uuids = Seq("U1", "U2", "U3")

  private val genSet: Gen[GtidSet] = for {
    n <- Gen.choose(0, 4)
    parts <- Gen.listOfN(n, for {
      u <- Gen.oneOf(uuids)
      a <- Gen.choose(1L, 50L)
      len <- Gen.choose(0L, 20L)
    } yield (u, a, a + len))
  } yield parts.foldLeft(GtidSet.empty) { case (acc, (u, a, b)) =>
    acc.union(GtidSet(Map(u -> Vector((a, b)))))
  }

  private def samples(n: Int): Seq[(GtidSet, GtidSet)] =
    (0 until n).flatMap { i =>
      for {
        a <- genSet(Gen.Parameters.default, Seed(100L + i))
        b <- genSet(Gen.Parameters.default, Seed(500L + i))
      } yield (a, b)
    }

  test("union is commutative and associative; parse/render round-trips") {
    for ((a, b) <- samples(30)) {
      assert(a.union(b).toString == b.union(a).toString)
      assert(GtidSet.parse(a.union(b).toString).toString == a.union(b).toString)
    }
  }

  test("a ⊆ a∪b and (a∪b) − b ⊆ a") {
    for ((a, b) <- samples(30)) {
      val u = a.union(b)
      assert(a.isSubsetOf(u) && b.isSubsetOf(u))
      assert(u.subtract(b).isSubsetOf(a))
    }
  }

  test("subtract then union restores the superset (catchup-gap law)") {
    for ((a, b) <- samples(30)) {
      val u = a.union(b)
      val gap = u.subtract(b)
      assert(gap.union(b).compare(u) == Some(0),
        s"a=$a b=$b gap=$gap")
      // and the gap is disjoint from what was applied
      assert(gap.subtract(b).compare(gap) == Some(0))
    }
  }

  test("txn count is |a| + |b| - |a∩b| (inclusion-exclusion via subtract)") {
    for ((a, b) <- samples(30)) {
      val inter = a.subtract(a.subtract(b)) // a ∩ b
      assert(a.union(b).txnCount == a.txnCount + b.txnCount - inter.txnCount,
        s"a=$a b=$b inter=$inter")
    }
  }
}
