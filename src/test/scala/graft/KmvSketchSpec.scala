package graft

import graft.functions.{KmvBuffer, KmvFunctions, PortableHash}
import graft.ops.Sketches
import org.apache.spark.sql.functions._

import scala.util.Random

class KmvSketchSpec extends SparkSpec {

  test("buffer keeps the k smallest DISTINCT values; duplicates are no-ops") {
    val buf = new KmvBuffer(4)
    Seq(9L, 5L, 5L, 7L, 1L, 9L, 3L, 8L, 1L).foreach(buf.add)
    assert(buf.sortedAsc.toSeq == Seq(1L, 3L, 5L, 7L))
  }

  test("merge is union-then-truncate and order-insensitive") {
    val rnd = new Random(7)
    val values = Seq.fill(200)(rnd.nextLong().abs)
    val whole = new KmvBuffer(16)
    values.foreach(whole.add)
    // split into shards, merge in a different order
    val shards = values.grouped(37).map { g =>
      val b = new KmvBuffer(16); g.foreach(b.add); b
    }.toSeq
    val merged = new KmvBuffer(16)
    Random.shuffle(shards).foreach(merged.addAll)
    assert(merged.sortedAsc.toSeq == whole.sortedAsc.toSeq)
  }

  test("serde round-trips the bounded state") {
    val buf = new KmvBuffer(8)
    (1L to 20L).foreach(h => buf.add(h * 131))
    val back = KmvBuffer.fromBytes(buf.toBytes)
    assert(back.k == 8)
    assert(back.sortedAsc.toSeq == buf.sortedAsc.toSeq)
  }

  test("aggregate matches a sort-limit over distinct hashes; exact below k") {
    import spark.implicits._
    KmvFunctions.register(spark)
    // group a: 100 distinct ids (> k); group b: 5 distinct ids (< k)
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", (i % 5).toLong))).toDF("g", "id")
    val h = PortableHash.tokenHash(col("id").cast("string"))
    val got = df.groupBy("g")
      .agg(KmvFunctions.kmvMinHashes(h, 16).as("sk"))
      .orderBy("g")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
    val expected = df.select(col("g"), h.as("h")).distinct()
      .orderBy("g", "h")
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) => g -> rows.map(_.getLong(1)).sorted.take(16).toSeq }
    assert(got("a") == expected("a"))
    assert(got("a").length == 16)
    assert(got("b") == expected("b"))
    assert(got("b").length == 5) // exact path: sketch not full
  }

  test("KMV estimate lands within the ±3/sqrt(k) band of the true count") {
    import spark.implicits._
    val n = 5000
    val df = (1 to n).map(i => ("t", i.toLong)).toDF("event_type", "user_id")
    val row = Sketches.approxDistinctUsers(df, 64).collect().head
    assert(row.getAs[Long]("n_exact") == n)
    val est = row.getAs[Double]("kmv_estimate")
    // standard error of KMV is ~1/sqrt(k-2) ≈ 12.7%; 3 sigma band
    assert(math.abs(est - n) / n < 0.4, s"estimate $est too far from $n")
  }

  test("segment overlap: exact below k; estimates track a known 50% overlap") {
    import spark.implicits._
    // segments p/q: users 1-2000 and 1001-3000 → union 3000, inter 1000;
    // tiny segment r: users 1-30 (sketch never fills → exact path)
    val rows = (1 to 2000).map(u => (u.toLong, "p")) ++
      (1001 to 3000).map(u => (u.toLong, "q")) ++
      (1 to 30).map(u => (u.toLong, "r"))
    val got = Sketches.segmentOverlap(rows.toDF("user_id", "event_type"), 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val pq = got(("p", "q"))
    assert(pq.getAs[Long]("union_exact") == 3000L)
    assert(pq.getAs[Long]("inter_exact") == 1000L)
    // theta estimators carry ~1/sqrt(k) noise; 3-sigma bands
    assert(math.abs(pq.getAs[Double]("union_est") - 3000.0) / 3000.0 < 0.45)
    assert(math.abs(pq.getAs[Double]("inter_est") - 1000.0) / 1000.0 < 0.75)
    // p∩r is all 30 of r's users; both sketches exact for those hashes —
    // but p's sketch is FULL, so only common hashes below theta count.
    // r-vs-p lands on the (r, p)? ordering: "p" < "r" → pair is (p, r)
    val pr = got(("p", "r"))
    assert(pr.getAs[Long]("inter_exact") == 30L)
    assert(pr.getAs[Double]("inter_est") >= 0.0)
    // q∩r empty → zero on both paths
    val qr = got(("q", "r"))
    assert(qr.getAs[Long]("inter_exact") == 0L)
  }

  test("Count-Min estimates never undercount; heavy key is near-exact at low load") {
    import spark.implicits._
    // zipf-ish: key 1 dominates, long tail of singletons keeps cells busy
    val rows = Seq.fill(500)(1L) ++ Seq.fill(120)(2L) ++ (100L to 400L)
    val df = rows.map(u => (u, "click")).toDF("user_id", "event_type")
    val got = Sketches.countMinHeavyHitters(df, 4, 256, 10).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"Count-Min undercounted ${r.getAs[Long]("user_id")}: $r")
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("n_exact"))
    }
    // 922 increments over 4x256 cells: the dominant key's min-row is very
    // unlikely to share all 4 cells with the tail — demand a tight estimate
    val top = got.find(_.getAs[Long]("user_id") == 1L).get
    assert(top.getAs[Long]("n_exact") == 500L)
    assert(top.getAs[Long]("cm_est") - 500L <= 10L)
  }

  test("Count-Min sketch cells merge additively across disjoint shards") {
    import spark.implicits._
    // the sketch of a union equals cell-wise addition of shard sketches —
    // checked end-to-end: estimates over the union frame equal estimates
    // computed when the same rows arrive as two batches unioned afterward
    // (partial aggregation order cannot matter for a sum of counts)
    val a = (1 to 300).map(i => ((i % 7).toLong, "a")).toDF("user_id", "event_type")
    val b = (1 to 200).map(i => ((i % 5).toLong, "b")).toDF("user_id", "event_type")
    val whole = Sketches.countMinHeavyHitters(a.unionAll(b), 4, 64, 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val swapped = Sketches.countMinHeavyHitters(b.unionAll(a), 4, 64, 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(whole == swapped)
  }
}
