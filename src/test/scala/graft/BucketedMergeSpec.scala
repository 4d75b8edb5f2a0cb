package graft

import org.apache.spark.sql.functions._

/** Bucketing = the persistent partitioning that makes repeated keyed
  * merges shuffle-free on the big side. A CDC target table is merged
  * into on every micro-batch; storing it bucketed by pk means only the
  * (small) delta shuffles — verified here by asserting the physical plan
  * has NO Exchange on the bucketed scan side.
  */
class BucketedMergeSpec extends SparkSpec {

  import spark.implicits._

  test("join on the bucket key needs no exchange on the bucketed side") {
    spark.sql("DROP TABLE IF EXISTS base_bucketed")
    // base state: bucketed + sorted by pk (what a CDC target table is)
    (0L until 1000L).map(i => (i, i * 1.0)).toDF("pk", "value")
      .write.bucketBy(8, "pk").sortBy("pk").saveAsTable("base_bucketed")

    val delta = (0L until 100L).map(i => (i * 10, "U", i * 2.0)).toDF("pk", "op", "value")

    // disable auto-broadcast so a shuffle join would be visible if forced
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = spark.table("base_bucketed").as("b")
        .join(delta.repartition(8, col("pk")).as("d"), Seq("pk"), "left_outer")
      val plan = merged.queryExecution.executedPlan.toString
      // the bucketed scan must flow into the join without an Exchange
      val scanSide = plan.linesIterator.filter(_.contains("base_bucketed")).mkString
      assert(scanSide.nonEmpty)
      val exchanges = plan.linesIterator.count(l => l.contains("Exchange hashpartitioning"))
      // exactly one exchange (the delta side); bucketed side reads in place
      assert(exchanges <= 1, s"expected <=1 exchange, plan:\n$plan")
      assert(merged.count() == 1000L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS base_bucketed")
    }
  }
}
