package graft

import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN search: brute force is exact on known geometry; IVF returns a
  * subset consistent with its probed cells, perfect recall when nprobe
  * covers all cells, and a centroid count that does NOT grow with the
  * corpus (fixed-k sample, not a modulo rule).
  */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  // 2-D geometry with known cosine order relative to v0 = (1, 0)
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.5f, 0.5f), 0),
    (3L, Array(0.0f, 1.0f), 1),
    (4L, Array(-1.0f, 0.1f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("brute force top-k ranks by cosine desc") {
    val got = Similarity.bruteForceTopK(vecs, 1, 4)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("IVF with full probe coverage equals brute force") {
    val bf = Similarity.bruteForceTopK(vecs, 1, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    // nlist=3 centroids, nprobe=3 probes every cell → exact
    val ivf = Similarity.ivfTopK(vecs, 1, 3, 3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(ivf == bf)
  }

  test("IVF with nprobe=1 returns a non-empty subset of the brute-force set") {
    val bf = Similarity.bruteForceTopK(vecs, 1, 4).collect().map(_.getLong(1)).toSet
    val got = Similarity.ivfTopK(vecs, 1, 4, 3, 1).collect().map(_.getLong(1)).toSet
    assert(got.nonEmpty && got.subsetOf(bf))
  }

  test("int8 quantization: known codes on a ramp; constant vector degenerates cleanly") {
    val e = Seq(
      (0L, Array(0.0f, 1.0f, 0.25f), 0),
      (1L, Array(0.25f, 0.25f, 0.25f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.quantizeInt8(e).collect()
    val r0 = got(0)
    assert(r0.getAs[Double]("lo") == 0.0 && r0.getAs[Double]("hi") == 1.0)
    // codes 0, 255, round(0.25 * 255) = 64
    assert(r0.getAs[Long]("q_sum") == 0L + 255L + 64L)
    assert(r0.getAs[Double]("mse") < 1e-5)
    val r1 = got(1) // hi == lo → scale 0 → all-zero codes, exact reconstruction
    assert(r1.getAs[Long]("q_sum") == 0L && r1.getAs[Double]("mse") == 0.0)
  }

  test("kmeans refine: singleton cells do not move; one cell averages all members") {
    val singletons = Similarity.kmeansRefine(vecs, 5).collect()
    assert(singletons.length == 5)
    assert(singletons.forall(_.getAs[Long]("n_members") == 1L))
    assert(singletons.forall(_.getAs[Double]("shift_cosine") == 1.0))
    val one = Similarity.kmeansRefine(vecs, 1).collect()
    assert(one.length == 1 && one(0).getAs[Long]("n_members") == 5L)
    // the hash-picked seed needn't point anywhere near the mean — only
    // the cosine RANGE is guaranteed (here the seed is nearly opposite)
    val shift = one(0).getAs[Double]("shift_cosine")
    assert(shift >= -1.0 && shift <= 1.0 && shift != 0.0)
  }

  test("centroid count is fixed-k: cells stay <= nlist as the corpus doubles") {
    // threshold -1 keeps every within-cell pair, so distinct `cell` values
    // in the output count the non-singleton cells — bounded by nlist on
    // both the corpus and its doubled version (a modulo-step rule would
    // double its centroid count here).
    def nCells(df: DataFrame): Long =
      Similarity.ivfNearDup(df, 2, -1.0).select("cell").distinct().count()
    val doubled = vecs.unionByName(vecs.withColumn("vec_id", col("vec_id") + 100L))
    assert(nCells(vecs) <= 2)
    assert(nCells(doubled) <= 2)
  }
}
