package graft.ops

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP management/observability endpoint — the reference's management
  * API surface (reference: api/CDCManagementAPI.scala:121-203 —
  * /health, /status, /metrics, /components, /tables/{t}/activity over
  * Pekko HTTP; Prometheus exposition metrics/PrometheusMetrics.scala:
  * 26-166) on the JDK's built-in HttpServer: zero extra dependencies,
  * same endpoints.
  *
  *   GET /api/v1/health               → 200/503 + JSON issues (Resilience rules)
  *   GET /api/v1/status               → engine state/uptime/active streaming queries
  *   GET /api/v1/metrics              → JSON counters
  *   GET /api/v1/components           → per-component status map (503 if any down)
  *   GET /api/v1/tables/{t}/activity  → per-table event stats (404 unknown table)
  *   GET /metrics                     → Prometheus text exposition format
  *
  * All snapshots are pull-model closures: the server owns no Spark state
  * and never blocks a query — each GET reads whatever the driver last
  * published (the [[ManagementApi.tableActivityRows]] helper materializes
  * the bounded per-table frame for the closure).
  */
final class ManagementApi(
    metricsSnapshot: () => Map[String, Double],
    healthSnapshot: () => Resilience.HealthSnapshot,
    statusSnapshot: () => ManagementApi.EngineStatus =
      () => ManagementApi.EngineStatus("IDLE", isRunning = false, 0, 0L),
    componentsSnapshot: () => Map[String, String] = () => Map.empty,
    tableActivitySnapshot: () => Seq[ManagementApi.TableActivity] = () => Seq.empty,
    port: Int = 0) {

  import ManagementApi.quote

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
      val body = s"""{"healthy": ${issues.isEmpty}, "issues": [${issues.map(quote).mkString(", ")}]}"""
      respond(ex, if (issues.isEmpty) 200 else 503, body, "application/json")
    }
  })

  server.createContext("/api/v1/status", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val s = statusSnapshot()
      val body =
        s"""{"state": ${quote(s.state)}, "isRunning": ${s.isRunning}, """ +
          s""""activeQueries": ${s.activeQueries}, "uptimeMs": ${s.uptimeMs}}"""
      respond(ex, 200, body, "application/json")
    }
  })

  server.createContext("/api/v1/components", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val comps = componentsSnapshot()
      val body = comps.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }.mkString("{", ", ", "}")
      // any component not reporting a healthy state flips the endpoint to
      // 503 — the liveness contract a deployment probe points at
      val allUp = comps.values.forall(v => v == "running" || v == "ok")
      respond(ex, if (allUp) 200 else 503, body, "application/json")
    }
  })

  server.createContext("/api/v1/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex, 200, json(metricsSnapshot()), "application/json")
  })

  server.createContext("/api/v1/tables", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      // path shape: /api/v1/tables/{tbl}/activity
      val rest = ex.getRequestURI.getPath.stripPrefix("/api/v1/tables")
      rest.stripPrefix("/").split("/").toList match {
        case tbl :: "activity" :: Nil if tbl.nonEmpty =>
          tableActivitySnapshot().find(_.tbl == tbl) match {
            case Some(a) =>
              val body =
                s"""{"tableId": ${quote(a.tbl)}, "nEvents": ${a.nEvents}, """ +
                  s""""nInserts": ${a.nInserts}, "nUpdates": ${a.nUpdates}, """ +
                  s""""nDeletes": ${a.nDeletes}, "nKeys": ${a.nKeys}, """ +
                  s""""maxPos": ${a.maxPos}, "lagSeconds": ${a.lagSeconds}}"""
              respond(ex, 200, body, "application/json")
            case None =>
              respond(ex, 404, s"""{"error": ${quote(s"unknown table: $tbl")}}""", "application/json")
          }
        case _ =>
          respond(ex, 400,
            """{"error": "expected /api/v1/tables/{table}/activity"}""", "application/json")
      }
    }
  })

  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex, 200, ManagementApi.prometheusFormat(metricsSnapshot()), "text/plain; version=0.0.4")
  })

  def start(): ManagementApi = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

object ManagementApi {

  /** Engine status for /api/v1/status (reference state machine
    * INIT→SNAPSHOT→CATCHUP→STREAMING; here derived from the live
    * StreamingQuery set).
    */
  final case class EngineStatus(
      state: String, isRunning: Boolean, activeQueries: Int, uptimeMs: Long)

  /** One /tables/{t}/activity row ([[Metrics.tableActivity]] schema). */
  final case class TableActivity(
      tbl: String, nEvents: Long, nInserts: Long, nUpdates: Long,
      nDeletes: Long, nKeys: Long, maxPos: Long, lagSeconds: Long)

  /** Status snapshot from the session's active streaming queries — the
    * Spark-native reading of the reference's engine state machine.
    */
  def engineStatus(spark: SparkSession, startedAtMs: Long): EngineStatus = {
    val active = spark.streams.active.length
    EngineStatus(
      state = if (active > 0) "STREAMING" else "IDLE",
      isRunning = active > 0,
      activeQueries = active,
      uptimeMs = math.max(0L, System.currentTimeMillis() - startedAtMs))
  }

  /** Materialize a [[Metrics.tableActivity]] frame for the endpoint
    * closure — bounded at one row per table by construction.
    */
  def tableActivityRows(activity: DataFrame): Seq[TableActivity] =
    activity.collect().map { r =>
      TableActivity(
        tbl = r.getAs[String]("tbl"),
        nEvents = r.getAs[Long]("n_events"),
        nInserts = r.getAs[Long]("n_inserts"),
        nUpdates = r.getAs[Long]("n_updates"),
        nDeletes = r.getAs[Long]("n_deletes"),
        nKeys = r.getAs[Long]("n_keys"),
        maxPos = r.getAs[Long]("max_pos"),
        lagSeconds = r.getAs[Long]("lag_seconds"))
    }.toSeq

  private[ops] def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

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
