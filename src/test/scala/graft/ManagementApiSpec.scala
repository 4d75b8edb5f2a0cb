package graft

import graft.functions.{MinHashAggregator, PortableHash, Tokenize}
import graft.ops.{ManagementApi, Resilience}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.net.{HttpURLConnection, URI}
import scala.io.Source

/** Management API served over real HTTP + the typed MinHash Aggregator. */
class ManagementApiSpec extends SparkSpec {

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = Source.fromInputStream(is).mkString
    is.close()
    (code, body)
  }

  test("health/metrics/prometheus endpoints serve live snapshots") {
    var healthy = true
    val api = new ManagementApi(
      metricsSnapshot = () => Map("events_total" -> 42.0, "rows_per_sec" -> 1234.5),
      healthSnapshot = () =>
        if (healthy) Resilience.HealthSnapshot(0, 0.0, 0.1)
        else Resilience.HealthSnapshot(10 * 60 * 1000L, 0.2, 0.95)).start()
    try {
      val base = s"http://127.0.0.1:${api.boundPort}"
      val (hc, hb) = get(s"$base/api/v1/health")
      assert(hc == 200 && hb.contains("\"healthy\": true"))
      val (mc, mb) = get(s"$base/api/v1/metrics")
      assert(mc == 200 && mb.contains("\"events_total\": 42.0"))
      val (pc, pb) = get(s"$base/metrics")
      assert(pc == 200 && pb.contains("graft_events_total 42.0"))
      assert(pb.contains("# TYPE graft_rows_per_sec gauge"))
      healthy = false
      val (hc2, hb2) = get(s"$base/api/v1/health")
      assert(hc2 == 503 && hb2.contains("error rate"))
    } finally api.stop()
  }

  test("typed MinHash Aggregator matches the untyped 16-min formulation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a completely different stream of words for the second document here"))
      .toDF("doc_id", "text")
    // typed path
    val typed = docs
      .select(col("doc_id"), explode(array_distinct(
        Tokenize.shingles3(Tokenize.tokens(col("text"))))).as("feat"))
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAggregator.toColumn.name("sig"))
      .collect().toMap
    // untyped path
    val untyped = graft.ops.Dedup.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toArray).toMap
    for (k <- untyped.keys) assert(typed(k).toSeq == untyped(k).toSeq, s"doc $k")
  }
}
