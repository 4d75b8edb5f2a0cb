package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Codegen'd dot product: agrees with the HOF formulation bit-for-bit
  * (same summation order), handles nulls, survives both codegen and
  * interpreted paths.
  */
class VectorExpressionSpec extends SparkSpec {

  import spark.implicits._

  test("matches HOF left-fold exactly, including summation order") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, 0.2), Array(0.3, 0.4)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val got = df.select(
      VectorFunctions.dotD(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x).as("hof"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(got(0).getDouble(0) == 32.0)
    assert(got(2).getDouble(0) == 0.0)
  }

  test("null vector yields null; works in SQL via registry") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None: Option[Array[Double]], Some(Array(3.0, 4.0)))
    ).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT dot_product_d(a, b) AS d FROM vecs").collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
  }

  test("interpreted eval path agrees with codegen") {
    VectorFunctions.register(spark)
    // force interpreted path by evaluating through a filter with codegen off
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val df = Seq((Array(1.5, -2.5), Array(2.0, 4.0))).toDF("a", "b")
      val v = df.select(VectorFunctions.dotD(col("a"), col("b"))).head.getDouble(0)
      assert(v == 1.5 * 2.0 + -2.5 * 4.0)
    }
  }

  private def withSQLConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
