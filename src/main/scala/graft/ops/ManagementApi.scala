package graft.ops

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** HTTP management/observability endpoint — the reference's management
  * API surface (reference: api/CDCManagementAPI.scala:121-203 —
  * /health, /status, /metrics over Pekko HTTP; Prometheus exposition
  * metrics/PrometheusMetrics.scala:26-166) on the JDK's built-in
  * HttpServer: zero extra dependencies, same endpoints.
  *
  *   GET /api/v1/health   → 200/503 + JSON issues (rules from Resilience)
  *   GET /api/v1/metrics  → JSON counters
  *   GET /metrics         → Prometheus text exposition format
  */
final class ManagementApi(
    metricsSnapshot: () => Map[String, Double],
    healthSnapshot: () => Resilience.HealthSnapshot,
    port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Bound port (useful when started on an ephemeral port). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String, contentType: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def json(m: Map[String, Double]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")

  server.createContext("/api/v1/health", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val h = healthSnapshot()
      val issues = Resilience.healthIssues(h)
      val body = s"""{"healthy": ${issues.isEmpty}, "issues": [${issues.map(i => s""""$i"""").mkString(", ")}]}"""
      respond(ex, if (issues.isEmpty) 200 else 503, body, "application/json")
    }
  })

  server.createContext("/api/v1/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex, 200, json(metricsSnapshot()), "application/json")
  })

  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex, 200, ManagementApi.prometheusFormat(metricsSnapshot()), "text/plain; version=0.0.4")
  })

  def start(): ManagementApi = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

object ManagementApi {
  /** Prometheus text exposition: `graft_<name> <value>` lines, sorted —
    * the shape scraped by the reference's deployment
    * (docker/prometheus/, metrics/PrometheusMetrics.scala).
    */
  def prometheusFormat(m: Map[String, Double]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      val name = "graft_" + k.replaceAll("[^a-zA-Z0-9_]", "_")
      s"# TYPE $name gauge\n$name $v"
    }.mkString("", "\n", "\n")
}
