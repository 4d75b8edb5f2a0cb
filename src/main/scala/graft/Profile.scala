package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named SparkEntry queries in isolation (3 runs each,
  * cache cleared between) and optionally dump the formatted plan.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt 'runMain graft.Profile text_tfidf_top_terms'
  *   PROFILE_EXPLAIN=1 ... to print .explain("formatted")
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("text_tfidf_top_terms")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.contains("PROFILE_EXPLAIN")) fn(spark, sfDir).explain("formatted")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        ops.Caches.releaseCaches(); spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
