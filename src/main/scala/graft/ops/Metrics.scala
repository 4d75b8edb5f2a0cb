package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability — the reference's counter/gauge layer
  * (reference: metrics/CDCMetrics.scala:13-151 — AtomicLong ingest/apply/
  * error counts, TPS, binlog lag; metrics/EnhancedMetricsCollector.scala:
  * 83-135 per-table stats) re-expressed with `Dataset.observe`: metrics
  * ride the job itself (collected by the executors as the data flows, no
  * second pass, no driver-side counting loop).
  */
object Metrics {

  /** Attach CDC throughput counters to a changelog frame. Read the
    * results from the returned Observation after an action completes —
    * batch equivalent of a StreamingQueryListener harvest.
    */
  def observed(changelog: DataFrame, name: String = "cdc"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val df = changelog.observe(obs,
      count(lit(1)).as("n_events"),
      sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_inserts"),
      sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updates"),
      sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"),
      min(col("pos")).as("min_pos"),
      max(col("pos")).as("max_pos"),
      approx_count_distinct(struct(col("tbl"), col("pk"))).as("approx_keys"))
    (df, obs)
  }

  /** Per-table activity stats (the /hotset endpoint,
    * api/CDCManagementAPI.scala:121-203): event counts, op mix and
    * position span per table — plus replication lag per table measured
    * against the newest event in the batch (deterministic stand-in for
    * wall-clock lag, CDCMetrics.scala:78-83).
    */
  def tableActivity(changelog: DataFrame): DataFrame = {
    val maxTs = changelog.agg(max(col("ts")).as("now")).select(col("now"))
    changelog.crossJoin(broadcast(maxTs))
      .groupBy(col("tbl"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_inserts"),
        sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updates"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"),
        count_distinct(col("pk")).as("n_keys"),
        max(col("pos")).as("max_pos"),
        (max(col("now")).cast("long") - max(col("ts")).cast("long")).as("lag_seconds"))
      .orderBy(col("tbl"))
  }

  def tableActivitySql(clCte: String): String =
    s"""WITH cl AS ($clCte),
       |mx AS (SELECT max(ts) AS now FROM cl)
       |SELECT tbl, count(*) AS n_events,
       |  CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
       |  CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
       |  CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
       |  count(DISTINCT pk) AS n_keys,
       |  max(pos) AS max_pos,
       |  CAST(floor(epoch(max(now))) AS BIGINT) - CAST(floor(epoch(max(ts))) AS BIGINT) AS lag_seconds
       |FROM cl, mx GROUP BY tbl ORDER BY tbl""".stripMargin

  /** PK-range chunking for parallel snapshot reads (reference:
    * snapshot/SnapshotWorker.scala:240-297 — SELECT MIN/MAX/COUNT then
    * fixed-width ranges; natively what `read.jdbc(partitionColumn, lower,
    * upper, numPartitions)` does). Emits per-table chunk boundaries.
    */
  def pkChunks(changelog: DataFrame, maxRowsPerChunk: Long): DataFrame = {
    val stats = changelog.groupBy(col("tbl"))
      .agg(min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
        count_distinct(col("pk")).as("n_rows"))
      .withColumn("n_chunks",
        greatest(lit(1L), ceil(col("n_rows").cast("double") / maxRowsPerChunk).cast("long")))
    stats
      .select(col("tbl"), col("min_pk"), col("max_pk"), col("n_rows"), col("n_chunks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("width", ceil((col("max_pk") - col("min_pk") + 1).cast("double") / col("n_chunks")).cast("long"))
      .select(col("tbl"), col("chunk_id"),
        (col("min_pk") + col("chunk_id") * col("width")).as("chunk_lo"),
        least(col("min_pk") + (col("chunk_id") + 1) * col("width"), col("max_pk") + 1).as("chunk_hi"),
        col("n_rows"), col("n_chunks"))
      .orderBy(col("tbl"), col("chunk_id"))
  }

  def pkChunksSql(clCte: String, maxRowsPerChunk: Long): String =
    s"""WITH cl AS ($clCte),
       |stats AS (
       |  SELECT tbl, min(pk) AS min_pk, max(pk) AS max_pk,
       |         count(DISTINCT pk) AS n_rows,
       |         greatest(1, CAST(ceil(CAST(count(DISTINCT pk) AS DOUBLE) / $maxRowsPerChunk) AS BIGINT)) AS n_chunks
       |  FROM cl GROUP BY tbl),
       |chunks AS (
       |  SELECT s.*, unnest(range(0, n_chunks)) AS chunk_id,
       |         CAST(ceil(CAST(max_pk - min_pk + 1 AS DOUBLE) / n_chunks) AS BIGINT) AS width
       |  FROM stats s)
       |SELECT tbl, chunk_id,
       |       min_pk + chunk_id * width AS chunk_lo,
       |       least(min_pk + (chunk_id + 1) * width, max_pk + 1) AS chunk_hi,
       |       n_rows, n_chunks
       |FROM chunks ORDER BY tbl, chunk_id""".stripMargin

  /** Event-time disorder audit: per table, how badly does event time (ts)
    * disagree with log order (pos) WITHIN a key's change sequence? For
    * every (tbl, pk) the events are walked in pos order; an event is
    * "late" when its ts is older than the newest ts already seen on that
    * key. This is the audit that justifies (or falsifies) the engine's
    * LWW-by-pos merge: a nonzero inversion count is exactly the set of
    * rows a ts-based merge would have resolved differently, and
    * max_late_s is the watermark horizon a streaming consumer needs to
    * avoid dropping those events (cf. [[graft.cdc.Watermark]]).
    *
    * Scale shape: one window partitioned by (tbl, pk) — the same keyed
    * shuffle every other per-key CDC op uses, never a global per-table
    * sort (a whole-table pos ordering would serialize 100 TB through one
    * partition; intra-key disorder is the LWW-relevant measure and keys
    * are the unit of parallelism). Lateness is floored to whole seconds
    * on each side before differencing (engine-parity: epoch-µs
    * truncation differs at the sub-second edge).
    */
  def outOfOrderAudit(changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("tbl"), col("pk")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val es = floor(col("ts").cast("double")).cast("long")
    changelog
      .withColumn("run_max_s", max(es).over(w))
      .withColumn("late_s", greatest(col("run_max_s") - es, lit(0L)))
      .groupBy(col("tbl"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late_s") > 0, 1L).otherwise(0L)).as("n_late"),
        round(sum(when(col("late_s") > 0, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("late_rate"),
        max(col("late_s")).as("max_late_s"),
        sum(col("late_s")).as("total_late_s"))
      .orderBy(col("tbl"))
  }

  def outOfOrderAuditSql(clCte: String): String =
    s"""WITH cl AS ($clCte),
       |runs AS (
       |  SELECT tbl, pk,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
       |    max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
       |      PARTITION BY tbl, pk ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max_s
       |  FROM cl),
       |lat AS (SELECT tbl, greatest(run_max_s - es, 0) AS late_s FROM runs)
       |SELECT tbl, count(*) AS n_events,
       |  CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       |  round(CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS late_rate,
       |  max(late_s) AS max_late_s,
       |  CAST(sum(late_s) AS BIGINT) AS total_late_s
       |FROM lat GROUP BY tbl ORDER BY tbl""".stripMargin

  /** Per-table position-sequence gap audit: the LOG-INTEGRITY check a
    * CDC consumer runs after replication (a routed table's positions
    * should be dense in the per-table subsequence only if nothing was
    * dropped upstream — gaps quantify drop windows). lag() per table,
    * exact integer gap arithmetic.
    */
  def sequenceGaps(changelog: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("tbl")).orderBy(col("pos"))
    changelog
      .select(col("tbl"), col("pos"))
      .withColumn("gap", col("pos") - lag(col("pos"), 1).over(w) - 1)
      .groupBy(col("tbl"))
      .agg(count(lit(1)).as("n_events"),
        min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
        sum(when(col("gap") > 0, 1L).otherwise(0L)).as("n_gaps"),
        coalesce(sum(when(col("gap") > 0, col("gap"))), lit(0L)).as("missing_positions"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap"))
      .orderBy("tbl")
  }

  def sequenceGapsSql(clCte: String): String =
    s"""WITH cl AS ($clCte),
       |g AS (
       |  SELECT tbl, pos,
       |         pos - lag(pos, 1) OVER (PARTITION BY tbl ORDER BY pos) - 1 AS gap
       |  FROM cl)
       |SELECT tbl, count(*) AS n_events,
       |       min(pos) AS first_pos, max(pos) AS last_pos,
       |       CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       |       coalesce(CAST(sum(CASE WHEN gap > 0 THEN gap END) AS BIGINT), 0) AS missing_positions,
       |       coalesce(CAST(max(gap) AS BIGINT), 0) AS max_gap
       |FROM g GROUP BY tbl ORDER BY tbl""".stripMargin

  /** Hot-key burst audit: per table, which primary keys receive BURSTS
    * of changes (≥ `minBurst` changes with ≤ `gapS` seconds between
    * consecutive ones) and what share of the table's write volume those
    * bursts carry — the measurement a CDC operator runs BEFORE enabling
    * per-key conflation ([[graft.streaming.Conflation]]) or key salting:
    * conflation only pays where bursts concentrate volume.
    *
    * Burst segmentation is gaps-and-islands on the (tbl, pk) change
    * sequence in pos order: a new island starts where the second-floored
    * inter-change gap exceeds `gapS` (floor BEFORE subtracting — the
    * repo's epoch-parity rule). All outputs are exact integers; the
    * share rides the 1e6-DIV device.
    *
    * Scale shape: ONE shuffle on (tbl, pk) serves both windows (lag +
    * running island sum share the partition key), then three chained
    * partial aggregations shrink keys (tbl,pk,island) → (tbl,pk) → tbl —
    * the same exchange the LWW apply already pays, never a global sort.
    */
  def hotKeys(changelog: DataFrame, gapS: Long, minBurst: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("tbl"), col("pk")).orderBy(col("pos"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val es = floor(col("ts").cast("double")).cast("long")
    val bursts = changelog
      .withColumn("es", es)
      .withColumn("gap_s", col("es") - lag(col("es"), 1).over(w))
      .withColumn("new_burst",
        when(col("gap_s").isNull || col("gap_s") > gapS, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_burst")).over(wRun))
      .groupBy(col("tbl"), col("pk"), col("island"))
      .agg(count(lit(1)).as("sz"))
    val perKey = bursts.groupBy(col("tbl"), col("pk"))
      .agg(sum(col("sz")).as("n_changes_k"),
        max(col("sz")).as("max_burst_k"),
        sum(when(col("sz") >= minBurst, col("sz")).otherwise(0L)).as("burst_changes_k"),
        sum(when(col("sz") >= minBurst, 1L).otherwise(0L)).as("n_bursts_k"))
    perKey.groupBy(col("tbl"))
      .agg(count(lit(1)).cast("long").as("n_keys"),
        sum(col("n_changes_k")).cast("long").as("n_changes"),
        sum(when(col("max_burst_k") >= minBurst, 1L).otherwise(0L)).as("n_hot_keys"),
        sum(col("n_bursts_k")).cast("long").as("n_bursts"),
        max(col("max_burst_k")).cast("long").as("max_burst"),
        sum(col("burst_changes_k")).cast("long").as("burst_changes"))
      .withColumn("burst_share_ppm",
        expr("CAST((1000000 * burst_changes) DIV n_changes AS BIGINT)"))
      .orderBy(col("tbl"))
  }

  def hotKeysSql(clCte: String, gapS: Long, minBurst: Long): String =
    s"""WITH cl AS ($clCte),
       |seq AS (
       |  SELECT tbl, pk, pos, CAST(floor(epoch(ts)) AS BIGINT) AS es
       |  FROM cl),
       |gapped AS (
       |  SELECT tbl, pk, pos, es,
       |         es - lag(es) OVER (PARTITION BY tbl, pk ORDER BY pos) AS gap_s
       |  FROM seq),
       |islands AS (
       |  SELECT tbl, pk,
       |         sum(CASE WHEN gap_s IS NULL OR gap_s > $gapS THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY tbl, pk ORDER BY pos
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM gapped),
       |bursts AS (
       |  SELECT tbl, pk, island, count(*) AS sz
       |  FROM islands GROUP BY 1, 2, 3),
       |per_key AS (
       |  SELECT tbl, pk, sum(sz) AS n_changes_k, max(sz) AS max_burst_k,
       |         sum(CASE WHEN sz >= $minBurst THEN sz ELSE 0 END) AS burst_changes_k,
       |         sum(CASE WHEN sz >= $minBurst THEN 1 ELSE 0 END) AS n_bursts_k
       |  FROM bursts GROUP BY 1, 2)
       |SELECT tbl, CAST(count(*) AS BIGINT) AS n_keys,
       |       CAST(sum(n_changes_k) AS BIGINT) AS n_changes,
       |       CAST(sum(CASE WHEN max_burst_k >= $minBurst THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_hot_keys,
       |       CAST(sum(n_bursts_k) AS BIGINT) AS n_bursts,
       |       CAST(max(max_burst_k) AS BIGINT) AS max_burst,
       |       CAST(sum(burst_changes_k) AS BIGINT) AS burst_changes,
       |       CAST((1000000 * CAST(sum(burst_changes_k) AS BIGINT))
       |            // CAST(sum(n_changes_k) AS BIGINT) AS BIGINT) AS burst_share_ppm
       |FROM per_key GROUP BY tbl ORDER BY tbl""".stripMargin

  /** Conflation what-if: if [[graft.streaming.Conflation]] kept only the
    * LAST change per (tbl, pk) per `windowS`-second tumbling window, how
    * much write volume disappears and how stale do the dropped writes
    * get? The decision companion to [[hotKeys]] — hot keys say WHERE
    * bursts are, this prices the throttle: reduction_ppm is the sink
    * writes saved, staleness is how long a dropped intermediate value
    * would have been visible had it been the final one (survivor es −
    * dropped es, exact seconds).
    *
    * Deterministic tumbling windows: window id = floored epoch DIV
    * windowS (integer division on non-negative epochs — identical in
    * both engines). Staleness is measured against the window's freshest
    * timestamp (max es — the survivor's emit time); everything is one
    * shuffle on (tbl, pk)-grain keys followed by shrinking partial
    * aggs, exactly the apply exchange's shape.
    */
  def conflationSavings(changelog: DataFrame, windowS: Long): DataFrame = {
    val es = floor(col("ts").cast("double")).cast("long")
    val perWin = changelog
      .withColumn("es", es)
      .withColumn("win", expr(s"es DIV ${windowS}L"))
      .groupBy(col("tbl"), col("pk"), col("win"))
      .agg(count(lit(1)).as("n_in_win"),
        max(col("es")).as("survivor_es"),
        sum(col("es")).as("sum_es"))
    perWin.groupBy(col("tbl"))
      .agg(count(lit(1)).cast("long").as("n_written"),
        sum(col("n_in_win")).cast("long").as("n_changes"),
        sum(col("n_in_win") - 1).cast("long").as("n_conflated"),
        // Σ over dropped of (survivor − es) = Σ (n·survivor − Σes) per win
        sum(col("n_in_win") * col("survivor_es") - col("sum_es"))
          .cast("long").as("total_staleness_s"),
        max(when(col("n_in_win") > 1,
          col("n_in_win") * col("survivor_es") - col("sum_es"))
          .otherwise(0L)).cast("long").as("max_window_staleness_s"))
      .select(col("tbl"), col("n_changes"), col("n_written"), col("n_conflated"),
        expr("CAST((1000000 * n_conflated) DIV n_changes AS BIGINT)")
          .as("reduction_ppm"),
        col("total_staleness_s"),
        when(col("n_conflated") > 0,
          expr("total_staleness_s DIV n_conflated")).otherwise(lit(0L))
          .cast("long").as("mean_staleness_s"),
        col("max_window_staleness_s"))
      .orderBy(col("tbl"))
  }

  def conflationSavingsSql(clCte: String, windowS: Long): String =
    s"""WITH cl AS ($clCte),
       |seq AS (
       |  SELECT tbl, pk, CAST(floor(epoch(ts)) AS BIGINT) AS es
       |  FROM cl),
       |per_win AS (
       |  SELECT tbl, pk, es // $windowS AS win,
       |         count(*) AS n_in_win, max(es) AS survivor_es, sum(es) AS sum_es
       |  FROM seq GROUP BY 1, 2, 3)
       |SELECT tbl,
       |       CAST(sum(n_in_win) AS BIGINT) AS n_changes,
       |       CAST(count(*) AS BIGINT) AS n_written,
       |       CAST(sum(n_in_win - 1) AS BIGINT) AS n_conflated,
       |       CAST((1000000 * CAST(sum(n_in_win - 1) AS BIGINT))
       |            // CAST(sum(n_in_win) AS BIGINT) AS BIGINT) AS reduction_ppm,
       |       CAST(sum(n_in_win * survivor_es - sum_es) AS BIGINT)
       |         AS total_staleness_s,
       |       CASE WHEN sum(n_in_win - 1) > 0
       |            THEN CAST(CAST(sum(n_in_win * survivor_es - sum_es) AS BIGINT)
       |                      // CAST(sum(n_in_win - 1) AS BIGINT) AS BIGINT)
       |            ELSE 0 END AS mean_staleness_s,
       |       CAST(max(CASE WHEN n_in_win > 1
       |                     THEN n_in_win * survivor_es - sum_es
       |                     ELSE 0 END) AS BIGINT) AS max_window_staleness_s
       |FROM per_win GROUP BY tbl ORDER BY tbl""".stripMargin
}
