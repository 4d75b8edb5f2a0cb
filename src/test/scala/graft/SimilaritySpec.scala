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
