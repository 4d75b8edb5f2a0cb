package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions.col

/** Definition tests for ANN-assisted kNN maintenance: the merge that
  * bounds the scored pass by probing the persisted IVF index (round-12
  * directive #1). Anchored on two structural facts:
  *
  *  - probing EVERY cell makes the candidate set identical to the exact
  *    path's, so the maintained graph must equal the from-scratch
  *    rebuild (recall 1.0 for every anchor);
  *  - the candidate set is monotone in the probe set, and a displacing
  *    candidate always outranks the displaced row in the EXACT ordering
  *    too — so per-anchor recall can never decrease as nprobe grows.
  */
class AnnMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private def synthEmb(n: Int) =
    (0L until n.toLong).map { i =>
      (i, Array.tabulate(4)(d => math.sin(i * 1.7 + d * 0.9)))
    }.toDF("vec_id", "embedding")

  test("probing every cell reproduces the exact rebuild: recall 1.0 for every anchor") {
    val emb = synthEmb(60)
    val nlist = 8
    val (cents, cells, knn) = Similarity.buildIvfKnnMaintPrefix(
      spark, emb, 5, nlist, graft.Scratch.dir("ann-def-full"))
    val audit = Similarity.annMaintenanceRun(spark, emb, 5, nlist, cents, cells, knn)
      .collect()
    assert(audit.length == 60)
    assert(audit.forall(_.getAs[Double]("recall") == 1.0),
      audit.filter(_.getAs[Double]("recall") < 1.0).mkString(", "))
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("per-anchor recall is monotone in nprobe (candidate-set monotonicity)") {
    val emb = synthEmb(60)
    val (cents, cells, knn) = Similarity.buildIvfKnnMaintPrefix(
      spark, emb, 5, 8, graft.Scratch.dir("ann-def-mono"))
    def recalls(nprobe: Int): Map[Long, Double] =
      Similarity.annMaintenanceRun(spark, emb, 5, nprobe, cents, cells, knn)
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("recall")).toMap
    val r1 = recalls(1)
    val r3 = recalls(3)
    assert(r1.keySet == r3.keySet)
    r1.foreach { case (a, v) =>
      assert(v <= r3(a) + 1e-9, s"anchor $a: recall(nprobe=1)=$v > recall(nprobe=3)=${r3(a)}")
    }
    // nprobe=1 must still produce a non-degenerate graph (some hits)
    assert(r1.values.sum > 0.0)
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("streaming ANN ingest: stop/restart continues; from-zero replay is absorbed") {
    val emb = synthEmb(60)
    val (cents, cellsP, knnP) = Similarity.buildIvfKnnMaintPrefix(
      spark, emb, 5, 8, graft.Scratch.dir("ann-stream-prefix"))
    val root = graft.Scratch.dir("ann-stream-run")
    val cells = s"$root/cells"; val map = s"$root/knn"
    graft.ops.BucketSwap.linkTree(cellsP, cells)
    graft.ops.BucketSwap.linkTree(knnP, map)
    val chunks = s"$root/chunks"
    new java.io.File(chunks).mkdirs()
    val schema = emb.schema
    def writeChunk(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$chunks/$name.parquet"))
      ()
    }
    // cut = 48; feed [48, 54) then "kill", then [54, 60) on restart
    writeChunk(emb.filter(col("vec_id") >= 48L && col("vec_id") < 54L), "chunk_0")
    Similarity.streamingAnnIngest(spark, chunks, schema, cents, cells, map, 5, 8, s"$root/ckpt")
    writeChunk(emb.filter(col("vec_id") >= 54L), "chunk_1")
    Similarity.streamingAnnIngest(spark, chunks, schema, cents, cells, map, 5, 8, s"$root/ckpt")
    // nprobe = nlist: the streamed ANN merges must equal the exact rebuild
    val want = Similarity.knnGraph(emb, 5)
      .select(col("anchor_id"), col("neighbor_id"), col("rank"))
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(map)
      .select(col("anchor_id"), col("neighbor_id"), col("rank"))
      .collect().map(_.toSeq).toSet
    assert(got == want, s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
    // from-zero replay (fresh checkpoint): absorbed by the _knn_frontier
    Similarity.streamingAnnIngest(spark, chunks, schema, cents, cells, map, 5, 8, s"$root/ckpt2")
    val replayed = spark.read.parquet(map)
      .select(col("anchor_id"), col("neighbor_id"), col("rank"))
      .collect().map(_.toSeq).toSet
    assert(replayed == want, "full replay must be absorbed")
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("replayed batch id is absorbed without touching the artifacts") {
    val emb = synthEmb(40)
    val (cents, cellsP, knnP) = Similarity.buildIvfKnnMaintPrefix(
      spark, emb, 5, 8, graft.Scratch.dir("ann-def-replay"))
    val root = graft.Scratch.dir("ann-def-replay-run")
    val cells = s"$root/cells"; val map = s"$root/knn"
    graft.ops.BucketSwap.linkTree(cellsP, cells)
    graft.ops.BucketSwap.linkTree(knnP, map)
    val cut = 40L * 4 / 5
    val batch = emb.filter(col("vec_id") >= cut)
    assert(Similarity.maintainKnnGraphAnn(spark, cents, cells, map, batch, 5, 3, 0L))
    val after = spark.read.parquet(map).collect().map(_.toSeq).toSet
    // replay of the same batch id: absorbed, graph unchanged
    assert(!Similarity.maintainKnnGraphAnn(spark, cents, cells, map, batch, 5, 3, 0L))
    assert(spark.read.parquet(map).collect().map(_.toSeq).toSet == after)
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }
}
