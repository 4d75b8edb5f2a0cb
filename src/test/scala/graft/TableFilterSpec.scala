package graft

import graft.cdc.TableFilter
import org.apache.spark.sql.functions.col

/** Wildcard include/exclude semantics (reference filter/TableFilter.scala:51-88)
  * + driver-side / Column-predicate agreement.
  */
class TableFilterSpec extends SparkSpec {

  private val names = Seq("users", "orders", "user_audit", "tmp_users", "t1", "t2", "t31")

  test("empty include means include everything; exclude wins") {
    val f = TableFilter(Nil, Seq("tmp_*"))
    assert(f.filterTables(names) == names.filterNot(_ == "tmp_users"))
  }

  test("* and ? wildcards") {
    assert(TableFilter(Seq("user*"), Nil).filterTables(names) == Seq("users", "user_audit"))
    assert(TableFilter(Seq("t?"), Nil).filterTables(names) == Seq("t1", "t2"))
  }

  test("raw regex patterns pass through") {
    assert(TableFilter(Seq("^t[0-9]+$"), Nil).filterTables(names) == Seq("t1", "t2", "t31"))
  }

  test("exclude beats include on the same table") {
    val f = TableFilter(Seq("t*"), Seq("t31"))
    assert(f.filterTables(names) == Seq("tmp_users", "t1", "t2"))
  }

  test("validate: conflicting include/exclude rules are rejected") {
    val v = TableFilter(Seq("users", "t*"), Seq("t*", "tmp_*")).validate
    assert(!v.isValid)
    assert(v.errors.exists(_.contains("t*")))
    intercept[IllegalArgumentException] {
      TableFilter(Seq("t*"), Seq("t*")).validated
    }
  }

  test("validate: uncompilable pattern is an error") {
    val v = TableFilter(Seq("t[0-9"), Nil).validate
    assert(!v.isValid)
    assert(v.errors.exists(_.contains("t[0-9")))
  }

  test("validate: exclude-everything under include rules is a dead config") {
    assert(!TableFilter(Seq("users"), Seq("*")).validate.isValid)
  }

  test("validate: empty include warns but stays valid") {
    val v = TableFilter(Nil, Seq("tmp_*")).validate
    assert(v.isValid && v.warnings.nonEmpty)
    TableFilter(Nil, Seq("tmp_*")).validated // does not throw
  }

  test("stats: per-table decision + volumes match driver-side filter") {
    import spark.implicits._
    val events = Seq("users", "users", "t1", "t2", "t2", "t2", "tmp_users")
      .toDF("tbl")
    val f = TableFilter(Seq("user*", "t?"), Seq("t2"))
    val got = f.stats(events, col("tbl")).orderBy("tbl")
      .as[(String, Boolean, Long)].collect().toSeq
    assert(got == Seq(
      ("t1", true, 1L), ("t2", false, 3L),
      ("tmp_users", false, 1L), ("users", true, 2L)))
  }

  test("Column predicate agrees with driver-side predicate") {
    import spark.implicits._
    for (f <- Seq(
      TableFilter(Nil, Nil),
      TableFilter(Seq("user*", "t?"), Seq("t2")),
      TableFilter(Seq("^t[0-9]+$"), Seq("t3*")))) {
      val viaColumn = names.toDF("t").filter(f.column(col("t"))).as[String].collect().toSeq
      assert(viaColumn == f.filterTables(names), s"filter=$f")
    }
  }
}
