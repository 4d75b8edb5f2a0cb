package graft

import graft.ops.Similarity

/** ANN search: brute force is exact on known geometry; IVF returns a
  * subset consistent with its probed cells and perfect recall when
  * nprobe covers all cells.
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
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.map(_._2).toSeq == Seq(1, 2, 3, 4))
  }

  test("IVF with full probe coverage equals brute force") {
    val bf = Similarity.bruteForceTopK(vecs, 1, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    // centroidStep=2 → centroids {0,2,4}; nprobe=3 probes every cell
    val ivf = Similarity.ivfTopK(vecs, 1, 3, 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(ivf == bf)
  }

  test("IVF with nprobe=1 returns only vectors from the query's own cell") {
    val got = Similarity.ivfTopK(vecs, 1, 4, 2, 1)
      .collect().map(_.getLong(1)).toSet
    // query 0's nearest centroid is 0; cell 0 holds {0,1,2} (2 is its own centroid)
    assert(got.subsetOf(Set(1L, 2L)))
    assert(got.contains(1L))
  }
}
