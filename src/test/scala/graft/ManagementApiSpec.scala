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

  test("status/components/table-activity endpoints incl. 503/404/400 paths") {
    import spark.implicits._
    val changelog = Seq(
      ("db.users", "I", 1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("db.users", "U", 1L, 11L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05")),
      ("db.orders", "D", 7L, 12L, java.sql.Timestamp.valueOf("2024-01-01 00:00:09")))
      .toDF("tbl", "op", "pk", "pos", "ts")
    val activity = ManagementApi.tableActivityRows(
      graft.ops.Metrics.tableActivity(changelog))
    var componentsUp = true
    val api = new ManagementApi(
      metricsSnapshot = () => Map.empty,
      healthSnapshot = () => Resilience.HealthSnapshot(0, 0.0, 0.1),
      statusSnapshot = () => ManagementApi.EngineStatus("STREAMING", isRunning = true, 2, 1234L),
      componentsSnapshot = () =>
        if (componentsUp) Map("binlog-source" -> "running", "apply-worker" -> "running")
        else Map("binlog-source" -> "running", "apply-worker" -> "circuit-open"),
      tableActivitySnapshot = () => activity).start()
    try {
      val base = s"http://127.0.0.1:${api.boundPort}"
      val (sc, sb) = get(s"$base/api/v1/status")
      assert(sc == 200 && sb.contains("\"state\": \"STREAMING\"")
        && sb.contains("\"activeQueries\": 2"), sb)
      val (cc, cb) = get(s"$base/api/v1/components")
      assert(cc == 200 && cb.contains("\"apply-worker\": \"running\""), cb)
      componentsUp = false
      val (cc2, cb2) = get(s"$base/api/v1/components")
      assert(cc2 == 503 && cb2.contains("circuit-open"), cb2)
      val (tc, tb) = get(s"$base/api/v1/tables/db.users/activity")
      assert(tc == 200 && tb.contains("\"nEvents\": 2") && tb.contains("\"nUpdates\": 1")
        && tb.contains("\"lagSeconds\": 4"), tb)
      val (nc, _) = get(s"$base/api/v1/tables/db.nope/activity")
      assert(nc == 404)
      val (bc, _) = get(s"$base/api/v1/tables/db.users")
      assert(bc == 400)
    } finally api.stop()
  }

  test("engineStatus reflects the session's active streaming query set") {
    val idle = ManagementApi.engineStatus(spark, System.currentTimeMillis() - 50)
    assert(!idle.isRunning && idle.state == "IDLE" && idle.uptimeMs >= 0)
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
