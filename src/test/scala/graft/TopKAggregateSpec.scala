package graft

import graft.functions.{TopKBuffer, TopKFunctions}
import org.apache.spark.sql.functions._

/** Heap top-k aggregate: agrees with the window row_number formulation
  * (including ties), survives partial-agg serialization, bounded buffer.
  */
class TopKAggregateSpec extends SparkSpec {

  import spark.implicits._

  test("buffer keeps the k largest with deterministic tie-break and round-trips bytes") {
    val b = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 3L), (5.0, 1L), (2.0, 7L), (9.0, 2L), (0.5, 9L))
      .foreach { case (v, id) => b.add(v, id) }
    assert(b.sortedDesc.toSeq == Seq((9.0, 2L), (5.0, 1L), (5.0, 3L)))
    val rt = TopKBuffer.fromBytes(b.toBytes)
    assert(rt.sortedDesc.toSeq == b.sortedDesc.toSeq)
  }

  test("aggregate matches the window formulation on the events fixture") {
    TopKFunctions.register(spark)
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // heap aggregate path
    val agg = events.groupBy(col("user_id"))
      .agg(TopKFunctions.topKByValue(col("value"), col("event_id"), 3).as("top"))
      .select(col("user_id"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("user_id"), col("p.id").as("event_id"), col("p.value").as("value"),
        (col("i") + 1).cast("long").as("rank"))
    // window path
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    val win = events.select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
    val a = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = win.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong)).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("works from SQL via the registry") {
    TopKFunctions.register(spark)
    Seq((1L, 5.0, 100L), (1L, 7.0, 101L), (1L, 6.0, 102L))
      .toDF("g", "v", "id").createOrReplaceTempView("tk")
    val got = spark.sql(
      "SELECT top_k_by_value(v, id, 2) AS top FROM tk GROUP BY g")
      .selectExpr("transform(top, x -> x.id) AS ids").head.getSeq[Long](0)
    assert(got == Seq(101L, 102L))
  }
}
