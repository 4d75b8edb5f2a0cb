package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (round-12 directive #6): merge cost of the
  * incremental-maintenance paths vs PREFIX artifact size at FIXED batch
  * size — the delta-bounded claim is that the cluster merge is (nearly)
  * independent of |corpus|, while the exact kNN merge carries its |C|
  * term and the ANN-assisted merge carries nprobe/nlist of it. The 1×
  * prefix is built from sf0.01, the 10× prefix from sf0.1 (same
  * generator), and the SAME batch (sf0.1 rows above both prefixes'
  * frontiers) merges into each; min of 2 runs on fresh hardlinked
  * artifacts per measurement.
  *
  * Usage: `sbt 'runMain graft.PrefixScale'` — prints one JSON line;
  * `scripts/prefix_scale.sh` merges it into scaling_curves.json.
  */
object PrefixScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docsOf(sf: String) = spark.read
      .parquet(s"/root/testdata/sf$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    def embOf(sf: String) = spark.read
      .parquet(s"/root/testdata/sf$sf/embeddings.parquet")

    // FIXED batches, cached once: 100 shifted near-dup docs / 40 vectors,
    // ids above every prefix frontier in play
    val batchDocs = ops.Dedup.nearDupCorpus(docsOf("0.1"))
      .filter(col("doc_id") >= 1000000L && col("doc_id") < 1000100L)
      .cache()
    batchDocs.count()
    val vMax = embOf("0.1").agg(max(col("vec_id"))).head().getLong(0)
    val vLo = (vMax + 1) * 4 / 5
    val batchVec = embOf("0.1")
      .filter(col("vec_id") >= vLo && col("vec_id") < vLo + 40)
      .cache()
    batchVec.count()

    def minOf2(body: => Unit): Double = {
      val runs = (1 to 2).map { _ =>
        ops.Caches.releaseCaches(); spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(s"  runs: ${runs.map(r => f"$r%.2f").mkString(", ")}")
      runs.min
    }

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    Seq("1x" -> "0.01", "10x" -> "0.1").foreach { case (label, sf) =>
      // cluster-map merge
      val (pi, pm) = ops.Dedup.buildClusterMaintPrefix(
        spark, docsOf(sf), 0.5, graft.Scratch.dir(s"ps-cl-$label"))
      out(s"cluster_merge_$label") = minOf2 {
        val r = graft.Scratch.dir(s"ps-cl-run-$label")
        ops.BucketSwap.linkTree(pi, s"$r/index")
        ops.BucketSwap.linkTree(pm, s"$r/map")
        ops.Dedup.maintainClusterMap(spark, s"$r/index", s"$r/map",
          batchDocs, 0.5, 0L)
        ()
      }
      // exact kNN merge (the |C| term, by design)
      val (pv, pk) = ops.Similarity.buildKnnMaintPrefix(
        spark, embOf(sf), 10, graft.Scratch.dir(s"ps-knn-$label"))
      out(s"knn_exact_merge_$label") = minOf2 {
        val r = graft.Scratch.dir(s"ps-knn-run-$label")
        ops.BucketSwap.linkTree(pv, s"$r/vectors")
        ops.BucketSwap.linkTree(pk, s"$r/knn")
        ops.Similarity.maintainKnnGraph(spark, s"$r/vectors", s"$r/knn",
          batchVec, 10, 0L)
        ()
      }
      // ANN-assisted kNN merge (nprobe/nlist of the |C| term)
      val (pc, pcl, pk2) = ops.Similarity.buildIvfKnnMaintPrefix(
        spark, embOf(sf), 10, 32, graft.Scratch.dir(s"ps-ann-$label"))
      out(s"knn_ann_merge_$label") = minOf2 {
        val r = graft.Scratch.dir(s"ps-ann-run-$label")
        ops.BucketSwap.linkTree(pcl, s"$r/cells")
        ops.BucketSwap.linkTree(pk2, s"$r/knn")
        ops.Similarity.maintainKnnGraphAnn(spark, pc, s"$r/cells", s"$r/knn",
          batchVec, 10, 4, 0L)
        ()
      }
      ops.Caches.releaseCaches(); ops.Caches.releaseStreamingState(spark)
    }
    def fmt(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def ratio(fam: String) = fmt(out(s"${fam}_10x") / out(s"${fam}_1x"))
    val json = out.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString(",") +
      s""","cluster_merge_ratio":${ratio("cluster_merge")}""" +
      s""","knn_exact_merge_ratio":${ratio("knn_exact_merge")}""" +
      s""","knn_ann_merge_ratio":${ratio("knn_ann_merge")}"""
    println(s"""{"metric":"prefix_scale","batch_docs":100,"batch_vecs":40,$json}""")
    spark.stop()
  }
}
