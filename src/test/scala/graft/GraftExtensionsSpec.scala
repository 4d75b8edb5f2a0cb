package graft

import org.apache.spark.sql.SparkSession

/** spark.sql.extensions wiring: a session built with GraftExtensions
  * resolves the custom functions in plain SQL with no per-session
  * registration calls.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extension-injected functions resolve in SQL on a fresh session") {
    val original = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // shares the JVM's SparkContext; only the session state is new.
      // (spark.sql.extensions is a STATIC conf read from the SparkContext
      // at startup — in-process the builder's withExtensions hook applies
      // the same class; spark-submit uses the conf form.)
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions()(_))
        .getOrCreate()
      assert(s ne original, "must be a NEW session (extensions apply at creation)")
      val dot = s.sql(
        "SELECT dot_product_d(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
        .head().getDouble(0)
      assert(dot == 32.0)
      val topk = s.sql(
        """SELECT g, top_k_by_value(v, id, 2) AS top FROM VALUES
          |  ('a', 1.0d, 1L), ('a', 3.0d, 2L), ('a', 2.0d, 3L), ('b', 5.0d, 4L)
          |  AS t(g, v, id) GROUP BY g ORDER BY g""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)))
      assert(topk.toSeq == Seq("a" -> Seq(2L, 3L), "b" -> Seq(4L)))
    } finally {
      SparkSession.setDefaultSession(original)
      SparkSession.setActiveSession(original)
    }
  }
}
