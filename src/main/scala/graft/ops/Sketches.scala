package graft.ops

import graft.functions.{KmvFunctions, PortableHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketch summaries — the approximate-aggregate layer a 100 TB
  * analytics store runs on (exact global distincts don't fit a shuffle;
  * bounded sketches do).
  */
object Sketches {

  /** Approximate distinct users per event type via the KMV sketch
    * ([[graft.functions.KmvMinHashes]]), audited against the exact count.
    *
    * Scale shape: the sketch is a k-bounded partial aggregate — map tasks
    * ship ≤ k longs per group, merge is union-truncate, so the shuffle
    * volume is O(groups · k) regardless of corpus size. The exact
    * `count_distinct` alongside is the AUDIT column (cheap at fixture
    * scale; on the real corpus you'd drop it and trust the ±1/√k bound —
    * k=64 gives ~12% expected error).
    *
    * Estimator: exact when the sketch isn't full (size < k ⇒ the group
    * had < k distinct hashes ⇒ size IS the distinct count); otherwise the
    * classic KMV estimate (k-1)/frac(kth smallest hash), frac mapping the
    * 60-bit portable hash onto (0, 1].
    */
  def approxDistinctUsers(events: DataFrame, k: Int): DataFrame = {
    KmvFunctions.register(events.sparkSession)
    val h = PortableHash.tokenHash(col("user_id").cast("string"))
    events
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_exact"),
        KmvFunctions.kmvMinHashes(h, k).as("sk"))
      .select(col("event_type"), col("n_exact"),
        size(col("sk")).cast("long").as("sketch_size"),
        round(
          when(size(col("sk")) < k, size(col("sk")).cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              ((element_at(col("sk"), k).cast("double") + lit(1.0)) / lit(KmvFunctions.HashSpace))),
          4).as("kmv_estimate"))
      .withColumn("rel_error",
        round(abs(col("kmv_estimate") - col("n_exact")) / col("n_exact"), 4))
      .orderBy("event_type")
  }

  /** Per-group quantile estimates from a fixed-bin histogram sketch — the
    * mergeable, bounded-buffer replacement for exact `percentile` (whose
    * aggregation buffer holds EVERY group value, i.e. O(|group|) memory on
    * one reducer at corpus scale).
    *
    * Scale shape: two bounded aggregations. Pass 1 ships (min, max, count)
    * partials per group; pass 2 bins each value against the broadcast
    * bounds and ships ≤ nBins counter partials per group — so reducer
    * memory is O(groups · nBins) regardless of corpus size, and both
    * passes are map-side partial-merged. This is the same role a t-digest
    * plays, but with a sketch the DuckDB oracle can rebuild declaratively
    * (bin = floor((v-min)/width); a t-digest's centroid layout is
    * engine-private, like HLL registers — unverifiable).
    *
    * Estimator: rank target = max(ceil(p·n), 1); walk the cumulative
    * histogram to the first bin with cum ≥ target and interpolate
    * uniformly within it. All arithmetic is order-independent (integer
    * counts, double ops in a fixed expression order), so results are
    * bit-stable across partitionings and engines.
    */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         nBins: Int, ps: Seq[(String, Double)]): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val g = col(groupCol)
    val v = col(valueCol)
    val bounds = df.groupBy(g).agg(
      min(v).as("v_min"), max(v).as("v_max"), count(lit(1)).as("n"))
    val width = (col("v_max") - col("v_min")) / lit(nBins)
    val binned = df.join(broadcast(bounds), groupCol)
      .select(g,
        when(col("v_max") === col("v_min"), lit(0L))
          .otherwise(least(floor((v - col("v_min")) / width), lit((nBins - 1).toLong)))
          .as("bin"))
      .groupBy(g, col("bin")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(g).orderBy(col("bin"))
    val cum = binned.withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(bounds), groupCol)
    val ests = ps.map { case (name, p) =>
      val target = greatest(ceil(lit(p) * col("n")), lit(1L))
      val prev = col("cum") - col("c")
      val est: Column = when(col("v_max") === col("v_min"), col("v_min"))
        .otherwise(when(col("cum") >= target && prev < target,
          col("v_min") + (col("v_max") - col("v_min")) / lit(nBins) *
            (col("bin") + (target - prev).cast("double") / col("c"))))
      round(max(est), 4).as(name)
    }
    cum.groupBy(g).agg(max(col("n")).as("n"), ests: _*)
  }

  /** Histogram-sketch P50/P95/P99 of `events.value` per event type, with
    * the exact interpolated percentile kept as the AUDIT column (the same
    * exact-vs-sketch pairing as [[approxDistinctUsers]]): at fixture scale
    * the audit is cheap; at 100 TB you drop it and keep the bounded sketch.
    */
  def valueQuantileSketch(events: DataFrame, nBins: Int): DataFrame = {
    val sk = histogramQuantiles(events, "event_type", "value", nBins,
      Seq(("p50_sketch", 0.5), ("p95_sketch", 0.95), ("p99_sketch", 0.99)))
    val exact = events.groupBy(col("event_type")).agg(
      round(expr("percentile(value, 0.5)"), 4).as("p50_exact"),
      round(expr("percentile(value, 0.95)"), 4).as("p95_exact"),
      round(expr("percentile(value, 0.99)"), 4).as("p99_exact"))
    sk.join(exact, "event_type")
      .select(col("event_type"), col("n"),
        col("p50_sketch"), col("p50_exact"),
        round(abs(col("p50_sketch") - col("p50_exact")), 4).as("p50_err"),
        col("p95_sketch"), col("p95_exact"),
        round(abs(col("p95_sketch") - col("p95_exact")), 4).as("p95_err"),
        col("p99_sketch"), col("p99_exact"),
        round(abs(col("p99_sketch") - col("p99_exact")), 4).as("p99_err"))
      .orderBy("event_type")
  }

  /** Oracle mirror of [[valueQuantileSketch]]: the histogram is rebuilt
    * declaratively (bin assignment, windowed cumulative counts, the same
    * rank/interpolation arithmetic in the same expression order).
    */
  def valueQuantileSketchSql(nBins: Int): String = {
    def est(p: Double): String = {
      val target = s"greatest(CAST(ceil($p * b.n) AS BIGINT), 1)"
      s"""CASE WHEN b.v_max = b.v_min THEN b.v_min
         |     WHEN cum >= $target AND cum - c < $target
         |     THEN b.v_min + (b.v_max - b.v_min) / $nBins *
         |          (bin + CAST($target - (cum - c) AS DOUBLE) / c) END""".stripMargin
    }
    s"""WITH bounds AS (
       |  SELECT event_type, min(value) AS v_min, max(value) AS v_max, count(*) AS n
       |  FROM events GROUP BY event_type),
       |binned AS (
       |  SELECT e.event_type,
       |    CASE WHEN b.v_max = b.v_min THEN 0
       |         ELSE least(CAST(floor((e.value - b.v_min) / ((b.v_max - b.v_min) / $nBins)) AS BIGINT), ${nBins - 1}) END AS bin,
       |    count(*) AS c
       |  FROM events e JOIN bounds b USING (event_type)
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, bin, c,
       |         sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
       |  FROM binned),
       |sk AS (
       |  SELECT cm.event_type, max(b.n) AS n,
       |    round(max(${est(0.5)}), 4) AS p50_sketch,
       |    round(max(${est(0.95)}), 4) AS p95_sketch,
       |    round(max(${est(0.99)}), 4) AS p99_sketch
       |  FROM cum cm JOIN bounds b USING (event_type)
       |  GROUP BY cm.event_type),
       |exact AS (
       |  SELECT event_type,
       |    round(quantile_cont(value, 0.5), 4) AS p50_exact,
       |    round(quantile_cont(value, 0.95), 4) AS p95_exact,
       |    round(quantile_cont(value, 0.99), 4) AS p99_exact
       |  FROM events GROUP BY event_type)
       |SELECT s.event_type, s.n,
       |  s.p50_sketch, x.p50_exact, round(abs(s.p50_sketch - x.p50_exact), 4) AS p50_err,
       |  s.p95_sketch, x.p95_exact, round(abs(s.p95_sketch - x.p95_exact), 4) AS p95_err,
       |  s.p99_sketch, x.p99_exact, round(abs(s.p99_sketch - x.p99_exact), 4) AS p99_err
       |FROM sk s JOIN exact x USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  /** Audience-overlap estimates between event-type segments from KMV
    * (theta-style) sketches: distinct-user union, intersection, and
    * Jaccard per segment pair — WITHOUT ever co-shuffling the raw id sets.
    *
    * Scale shape: one k-bounded sketch per segment (the same mergeable
    * partial aggregate as [[approxDistinctUsers]]), then all set algebra
    * happens on the k-long sketch arrays — the pair join moves
    * O(segments² · k) longs, never user ids. At 100 TB the exact audit
    * columns (a distinct self-join) are what you drop; the sketch path's
    * cost does not grow with the corpus at all once the sketches exist.
    *
    * Estimator (theta sketch): θ = k-th smallest hash of the UNION of the
    * two sketches; every retained hash below θ represents 1/frac(θ) users.
    * Hashes of A∩B below θ are guaranteed present in BOTH sketches
    * (each sketch's own threshold is ≥ θ), so the intersection estimate
    * c/frac(θ) is unbiased; below k the sketches are exact and so are the
    * "estimates".
    */
  def segmentOverlap(events: DataFrame, k: Int): DataFrame = {
    KmvFunctions.register(events.sparkSession)
    val h = PortableHash.tokenHash(col("user_id").cast("string"))
    val sks = events.groupBy(col("event_type"))
      .agg(KmvFunctions.kmvMinHashes(h, k).as("sk"),
        count_distinct(col("user_id")).as("n"))
    val du = events.select(col("event_type"), col("user_id")).distinct()
    val interExact = du.as("x").join(du.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("seg_a"), col("y.event_type").as("seg_b"))
      .agg(count(lit(1)).as("inter_exact"))
    // theta must be BOUND through a projection before the filter lambda:
    // HOF lambdas re-evaluate unbound child expressions per element
    val frac = (col("theta").cast("double") + lit(1.0)) / lit(KmvFunctions.HashSpace)
    sks.as("a").join(broadcast(sks.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("seg_a"), col("b.event_type").as("seg_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        array_sort(array_union(col("a.sk"), col("b.sk"))).as("u"),
        array_intersect(col("a.sk"), col("b.sk")).as("common"))
      .withColumn("is_full", size(col("u")) >= k)
      .withColumn("theta", when(col("is_full"), element_at(col("u"), k)))
      .withColumn("c", when(col("is_full"),
          size(filter(col("common"), x => x < col("theta"))))
        .otherwise(size(col("common"))).cast("long"))
      .withColumn("union_est", round(
        when(col("is_full"), lit((k - 1).toDouble) / frac)
          .otherwise(size(col("u")).cast("double")), 4))
      .withColumn("inter_est", round(
        when(col("is_full"), col("c").cast("double") / frac)
          .otherwise(col("c").cast("double")), 4))
      .join(broadcast(interExact), Seq("seg_a", "seg_b"), "left")
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        (col("n_a") + col("n_b") - coalesce(col("inter_exact"), lit(0L))).as("union_exact"),
        col("union_est"),
        coalesce(col("inter_exact"), lit(0L)).as("inter_exact"),
        col("inter_est"),
        round(col("inter_est") / col("union_est"), 4).as("jaccard_est"))
      .orderBy("seg_a", "seg_b")
  }

  /** Oracle mirror of [[segmentOverlap]]: sketches rebuilt as row_number
    * ≤ k over distinct hashes, union/theta/common via plain joins, the
    * estimate arithmetic in the same expression order.
    */
  def segmentOverlapSql(k: Int): String =
    s"""WITH nx AS (
       |  SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY event_type),
       |hh AS (
       |  SELECT DISTINCT event_type,
       |         ${PortableHash.tokenHashSql("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |ranked AS (
       |  SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM hh),
       |sk AS (SELECT event_type, h FROM ranked WHERE rn <= $k),
       |pairs AS (
       |  SELECT a.event_type AS seg_a, b.event_type AS seg_b, a.n AS n_a, b.n AS n_b
       |  FROM nx a JOIN nx b ON a.event_type < b.event_type),
       |uh AS (
       |  SELECT DISTINCT p.seg_a, p.seg_b, s.h
       |  FROM pairs p JOIN sk s ON s.event_type = p.seg_a OR s.event_type = p.seg_b),
       |ur AS (
       |  SELECT seg_a, seg_b, h,
       |         row_number() OVER (PARTITION BY seg_a, seg_b ORDER BY h) AS rn
       |  FROM uh),
       |ustat AS (
       |  SELECT seg_a, seg_b, count(*) AS usize,
       |         max(CASE WHEN rn = $k THEN h END) AS theta
       |  FROM ur GROUP BY seg_a, seg_b),
       |cm AS (
       |  SELECT p.seg_a, p.seg_b, x.h
       |  FROM pairs p
       |  JOIN sk x ON x.event_type = p.seg_a
       |  JOIN sk y ON y.event_type = p.seg_b AND y.h = x.h),
       |cstat AS (
       |  SELECT u.seg_a, u.seg_b, u.usize, u.theta,
       |         count(CASE WHEN u.usize >= $k THEN (CASE WHEN c.h < u.theta THEN 1 END)
       |                    ELSE (CASE WHEN c.h IS NOT NULL THEN 1 END) END) AS c
       |  FROM ustat u LEFT JOIN cm c ON c.seg_a = u.seg_a AND c.seg_b = u.seg_b
       |  GROUP BY u.seg_a, u.seg_b, u.usize, u.theta),
       |est AS (
       |  SELECT seg_a, seg_b,
       |    round(CASE WHEN usize >= $k
       |          THEN ${(k - 1).toDouble} / ((theta + 1.0) / ${KmvFunctions.HashSpace})
       |          ELSE CAST(usize AS DOUBLE) END, 4) AS union_est,
       |    round(CASE WHEN usize >= $k
       |          THEN CAST(c AS DOUBLE) / ((theta + 1.0) / ${KmvFunctions.HashSpace})
       |          ELSE CAST(c AS DOUBLE) END, 4) AS inter_est
       |  FROM cstat),
       |ix AS (
       |  SELECT x.event_type AS seg_a, y.event_type AS seg_b, count(*) AS inter_exact
       |  FROM (SELECT DISTINCT event_type, user_id FROM events) x
       |  JOIN (SELECT DISTINCT event_type, user_id FROM events) y
       |    ON x.user_id = y.user_id AND x.event_type < y.event_type
       |  GROUP BY x.event_type, y.event_type)
       |SELECT p.seg_a, p.seg_b, p.n_a, p.n_b,
       |       p.n_a + p.n_b - coalesce(i.inter_exact, 0) AS union_exact,
       |       e.union_est,
       |       coalesce(i.inter_exact, 0) AS inter_exact,
       |       e.inter_est,
       |       round(e.inter_est / e.union_est, 4) AS jaccard_est
       |FROM pairs p
       |JOIN est e ON e.seg_a = p.seg_a AND e.seg_b = p.seg_b
       |LEFT JOIN ix i ON i.seg_a = p.seg_a AND i.seg_b = p.seg_b
       |ORDER BY p.seg_a, p.seg_b""".stripMargin

  /** Count-Min sketch heavy hitters: estimate per-key frequencies from a
    * d×w counter grid, audited against the exact counts for the top-N
    * keys (the same exact-vs-sketch pairing as [[approxDistinctUsers]]).
    *
    * Scale shape: the sketch build is ONE pass — each row explodes into d
    * (row, bucket) coordinates (d a small constant) and a groupBy counts
    * cells, so map-side partials merge and the full sketch is d·w counters
    * (a few KB) REGARDLESS of corpus size; sketches from different
    * partitions/days merge by cell-wise addition, which is exactly what
    * the partial aggregation already does. The exact top-N and its join
    * are the AUDIT path you drop at 100 TB (candidates then come from the
    * stream itself or a per-partition candidate heap).
    *
    * Estimator: est(k) = min over the d rows of cell[r][hash_r(k) % w] —
    * each cell only ever ADDS other keys' collisions, so est ≥ exact
    * always (the one-sided Count-Min guarantee; `overcount` exposes it,
    * and the spec + oracle assert it never goes negative).
    */
  def countMinHeavyHitters(events: DataFrame, d: Int, w: Int, topN: Int): DataFrame = {
    def coords(k: Column): Column = array((0 until d).map(i =>
      struct(lit(i).as("r"),
        (PortableHash.tokenHash(concat(lit(s"cm$i:"), k)) % lit(w.toLong)).as("b"))): _*)
    val cells = events
      .select(explode(coords(col("user_id").cast("string"))).as("c"))
      .select(col("c.r").as("r"), col("c.b").as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
    val top = events.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id")).limit(topN)
    val probes = top
      .select(col("user_id"), col("n_exact"),
        explode(coords(col("user_id").cast("string"))).as("c"))
      .select(col("user_id"), col("n_exact"), col("c.r").as("r"), col("c.b").as("b"))
    probes.join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("user_id"), col("n_exact"))
      .agg(min(col("cnt")).as("cm_est"))
      .select(col("user_id"), col("n_exact"), col("cm_est"),
        (col("cm_est") - col("n_exact")).as("overcount"))
      .orderBy("user_id")
  }

  /** Oracle mirror of [[countMinHeavyHitters]]: the d coordinate sets are
    * unrolled as a UNION ALL per hash row with the same `cm<i>:` seed
    * prefixes, so every cell count — and therefore every min-estimate —
    * is bit-identical.
    */
  def countMinHeavyHittersSql(d: Int, w: Int, topN: Int): String = {
    def bucket(i: Int, key: String): String =
      s"${PortableHash.tokenHashSql(s"'cm$i:' || CAST($key AS VARCHAR)")} % $w"
    val cellRows = (0 until d).map(i =>
      s"SELECT $i AS r, ${bucket(i, "user_id")} AS b FROM events").mkString("\n    UNION ALL ")
    val probeRows = (0 until d).map(i =>
      s"SELECT user_id, n_exact, $i AS r, ${bucket(i, "user_id")} AS b FROM top").mkString("\n    UNION ALL ")
    s"""WITH cells AS (
       |  SELECT r, b, count(*) AS cnt FROM (
       |    $cellRows)
       |  GROUP BY r, b),
       |top AS (
       |  SELECT user_id, count(*) AS n_exact FROM events GROUP BY user_id
       |  ORDER BY n_exact DESC, user_id LIMIT $topN),
       |probes AS (
       |    $probeRows),
       |est AS (
       |  SELECT p.user_id, p.n_exact, min(c.cnt) AS cm_est
       |  FROM probes p JOIN cells c ON p.r = c.r AND p.b = c.b
       |  GROUP BY p.user_id, p.n_exact)
       |SELECT user_id, n_exact, cm_est, cm_est - n_exact AS overcount
       |FROM est ORDER BY user_id""".stripMargin
  }

  /** The oracle rebuilds the sketch declaratively: the k smallest distinct
    * hashes per group are just `row_number() OVER (ORDER BY h) <= k` —
    * that reproducibility (vs. HLL's engine-private register layout) is
    * why KMV is the checkable choice here.
    */
  /** The KMV sketch INSIDE a watermarked streaming aggregation: distinct
    * users per finalized hourly window, estimated from k-bounded
    * mergeable state. This is the sketch's real deployment shape — the
    * streaming state per open (window, type) group is ≤ k longs instead
    * of a distinct-user set, so state size is bounded by windows·k, not
    * by traffic. Append mode emits each window once, when the watermark
    * passes its end.
    */
  def streamingApproxDistinct(events: DataFrame, k: Int): DataFrame = {
    KmvFunctions.register(events.sparkSession)
    val h = PortableHash.tokenHash(col("user_id").cast("string"))
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(KmvFunctions.kmvMinHashes(h, k).as("sk"))
      .select(col("window.start").as("hour"), col("event_type"),
        size(col("sk")).cast("long").as("sketch_size"),
        round(
          when(size(col("sk")) < k, size(col("sk")).cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              ((element_at(col("sk"), k).cast("double") + lit(1.0)) / lit(KmvFunctions.HashSpace))),
          4).as("kmv_estimate"))
  }

  /** Oracle for [[streamingApproxDistinct]]: the batch KMV estimate per
    * hourly window, restricted to watermark-finalized windows.
    */
  def streamingApproxDistinctSql(k: Int): String =
    s"""WITH mx AS (SELECT max(ts) AS mx FROM events),
       |h AS (
       |  SELECT DISTINCT date_trunc('hour', ts) AS hour, event_type,
       |         ${PortableHash.tokenHashSql("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |ranked AS (
       |  SELECT hour, event_type, h,
       |         row_number() OVER (PARTITION BY hour, event_type ORDER BY h) AS rn
       |  FROM h),
       |sk AS (
       |  SELECT hour, event_type, count(*) AS sketch_size,
       |         max(CASE WHEN rn = $k THEN h END) AS kth
       |  FROM ranked WHERE rn <= $k GROUP BY 1, 2)
       |SELECT hour, event_type, CAST(sketch_size AS BIGINT) AS sketch_size,
       |       round(CASE WHEN sketch_size < $k THEN CAST(sketch_size AS DOUBLE)
       |             ELSE ${(k - 1).toDouble} / ((kth + 1.0) / ${KmvFunctions.HashSpace}) END, 4) AS kmv_estimate
       |FROM sk, mx
       |WHERE epoch_us(hour) + 3600000000
       |      <= (epoch_us(mx.mx) // 1000) * 1000 - 7200000000
       |ORDER BY hour, event_type""".stripMargin

  /** Histogram-sketch quantiles INSIDE a watermarked streaming
    * aggregation — [[valueQuantileSketch]]'s deployment shape: per
    * finalized hourly window and event type, P50/P95/P99 estimated from
    * `nBins` FIXED-bound bin counters held as streaming state. The batch
    * sketch takes a bounds pass first; a stream cannot (two chained
    * aggregations are unsupported in append mode), so bounds are part of
    * the DESIGN: bins span [0, vMax] and overflow clamps into the top
    * bin — a documented saturation, visible in the top-bin mass, exactly
    * how a production histogram metric (e.g. a latency histogram) works.
    *
    * State per open (window, type) group: nBins LongSum cells + a count
    * — the same bounded-state story as the KMV sketch. Estimates are
    * computed STATELESSLY after the aggregate (array walk over the bin
    * columns; in append mode nothing downstream may re-aggregate), with
    * the [[histogramQuantiles]] rank/interpolation arithmetic in the
    * same expression order, so the batch oracle rebuild is bit-identical.
    */
  def streamingQuantileSketch(events: DataFrame, nBins: Int, vMax: Double): DataFrame = {
    val width = vMax / nBins
    val binCol = least(greatest(floor(col("value") / lit(width)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val binSums = (0 until nBins).map(i =>
      sum(when(col("bin") === i, 1L).otherwise(0L)).as(s"b$i"))
    val agg = events
      .withWatermark("ts", "2 hours")
      .withColumn("bin", binCol)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), binSums: _*)
      // arr BOUND through a projection: HOF lambdas re-evaluate unbound
      // child expressions per element (build notes)
      .withColumn("arr", array((0 until nBins).map(i => col(s"b$i")): _*))
    def est(p: Double): Column = {
      val target = greatest(ceil(lit(p) * col("n")), lit(1L))
      def cum(i: Column): Column =
        aggregate(slice(col("arr"), lit(1), i), lit(0L), (acc, x) => acc + x)
      val firstBin = element_at(
        filter(sequence(lit(1), lit(nBins)), i => cum(i) >= target), 1)
      val prev = cum(firstBin - 1)
      val c = element_at(col("arr"), firstBin)
      round(lit(width) * ((firstBin - 1).cast("double") +
        (target - prev).cast("double") / c.cast("double")), 4)
    }
    agg.select(col("window.start").as("hour"), col("event_type"), col("n"),
      est(0.5).as("p50_est"), est(0.95).as("p95_est"), est(0.99).as("p99_est"),
      element_at(col("arr"), nBins).as("top_bin_mass"))
  }

  /** Oracle for [[streamingQuantileSketch]]: batch rebuild of the fixed
    * histogram per hourly window, same estimator expression order (and
    * the same width literal via a string→double cast, never a bare
    * decimal literal — build notes), restricted to watermark-finalized
    * windows with the ms-truncated cut. */
  def streamingQuantileSketchSql(nBins: Int, vMax: Double): String = {
    val width = vMax / nBins
    val w = s"CAST('$width' AS DOUBLE)"
    def pick(p: Double, tag: String): String =
      s"""${tag}sel AS (
         |  SELECT hour, event_type, n, bin, cum - c AS pv, c AS cb,
         |         row_number() OVER (PARTITION BY hour, event_type ORDER BY bin) AS rn
         |  FROM cum
         |  WHERE cum >= greatest(CAST(ceil($p * n) AS BIGINT), 1)),
         |$tag AS (
         |  SELECT hour, event_type, n,
         |         round($w * (CAST(bin AS DOUBLE)
         |               + CAST(greatest(CAST(ceil($p * n) AS BIGINT), 1) - pv AS DOUBLE)
         |                 / CAST(cb AS DOUBLE)), 4) AS ${tag}_est
         |  FROM ${tag}sel WHERE rn = 1)""".stripMargin
    s"""WITH mx AS (SELECT max(ts) AS mx FROM events),
       |b AS (
       |  SELECT date_trunc('hour', ts) AS hour, event_type,
       |         CAST(least(greatest(floor(value / $w), 0.0),
       |                    CAST('${(nBins - 1).toDouble}' AS DOUBLE)) AS BIGINT) AS bin
       |  FROM events),
       |binned AS (
       |  SELECT hour, event_type, bin, count(*) AS c
       |  FROM b GROUP BY 1, 2, 3),
       |tot AS (
       |  SELECT hour, event_type, CAST(sum(c) AS BIGINT) AS n
       |  FROM binned GROUP BY 1, 2),
       |cum AS (
       |  SELECT bn.hour, bn.event_type, bn.bin, bn.c, t.n,
       |         sum(bn.c) OVER (PARTITION BY bn.hour, bn.event_type
       |                         ORDER BY bn.bin) AS cum
       |  FROM binned bn JOIN tot t ON t.hour = bn.hour
       |                           AND t.event_type = bn.event_type),
       |${pick(0.5, "p50")},
       |${pick(0.95, "p95")},
       |${pick(0.99, "p99")},
       |tb AS (
       |  SELECT hour, event_type, CAST(sum(CASE WHEN bin = ${nBins - 1} THEN c
       |                                         ELSE 0 END) AS BIGINT) AS top_bin_mass
       |  FROM binned GROUP BY 1, 2)
       |SELECT p50.hour, p50.event_type, p50.n,
       |       p50.p50_est, p95.p95_est, p99.p99_est, tb.top_bin_mass
       |FROM p50
       |JOIN p95 ON p95.hour = p50.hour AND p95.event_type = p50.event_type
       |JOIN p99 ON p99.hour = p50.hour AND p99.event_type = p50.event_type
       |JOIN tb ON tb.hour = p50.hour AND tb.event_type = p50.event_type, mx
       |WHERE epoch_us(p50.hour) + 3600000000
       |      <= (epoch_us(mx.mx) // 1000) * 1000 - 7200000000
       |ORDER BY p50.hour, p50.event_type""".stripMargin
  }

  /** KMV join-cardinality estimate — the planner question "how many rows
    * will `orders ⋈ σ(customer)` produce?" answered from two k-bounded
    * sketches instead of a scan of either side.
    *
    * Each side is reduced to (key, row-count) partials, sketched with
    * [[graft.functions.KmvMinHashes]] over the portable key hash; the
    * union sketch (k smallest of the merged arrays — computable
    * declaratively from the two sketches, no third pass) is a uniform
    * sample of the combined key universe, so:
    * `est_union = (k-1)/frac(kth)`, `est_intersection = |members|·scale`,
    * and `est_join_rows = Σ_{members} cnt_a·cnt_b · scale` where members
    * are union-sketch hashes present in BOTH sketches and
    * `scale = est_union / |union sketch|` (1 when the sketch isn't full —
    * then the sample IS the universe and every estimate is exact).
    *
    * Scale shape: per-key counts are partial-agged groupBys; sketches are
    * k-bounded aggregates (≤ k longs to the driver-side scalar row); the
    * member frame (≤ k rows) is broadcast back against the key frames.
    * The exact join alongside is the fixture-scale AUDIT column, dropped
    * at 100 TB — which is the whole point: the estimate costs two
    * bounded sketches, the truth costs the join.
    */
  def kmvJoinCardinality(orders: DataFrame, customer: DataFrame,
                         k: Int, segment: String): DataFrame = {
    KmvFunctions.register(orders.sparkSession)
    val a = Caches.tracked(orders
      .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("cnt_a"))
      .withColumn("h", PortableHash.tokenHash(col("key").cast("string")))
      .persist())
    val b = Caches.tracked(customer
      .filter(col("c_mktsegment") === segment)
      .groupBy(col("c_custkey").as("key")).agg(count(lit(1)).as("cnt_b"))
      .withColumn("h", PortableHash.tokenHash(col("key").cast("string")))
      .persist())
    val sk = a.agg(KmvFunctions.kmvMinHashes(col("h"), k).as("sk_a"),
        count(lit(1)).as("n_a"))
      .crossJoin(b.agg(KmvFunctions.kmvMinHashes(col("h"), k).as("sk_b"),
        count(lit(1)).as("n_b")))
      .withColumn("sk_u", slice(array_sort(array_distinct(concat(col("sk_a"), col("sk_b")))), 1, k))
      .withColumn("members", filter(col("sk_u"),
        x => array_contains(col("sk_a"), x) && array_contains(col("sk_b"), x)))
      .withColumn("u_size", size(col("sk_u")))
      .withColumn("est_union",
        when(col("u_size") < k, col("u_size").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            ((element_at(col("sk_u"), k).cast("double") + lit(1.0)) / lit(KmvFunctions.HashSpace))))
      .withColumn("scale", col("est_union") / col("u_size").cast("double"))
    // member hashes (≤ k) back to their per-key counts: broadcast the
    // tiny member frame, never the key frames
    val members = sk.select(explode(col("members")).as("h"))
    val joinSample = members
      .join(a.select(col("h"), col("cnt_a")), "h")
      .join(b.select(col("h"), col("cnt_b")), "h")
      .agg(coalesce(sum(col("cnt_a") * col("cnt_b")), lit(0L)).as("sample_join_rows"))
    val exact = a.join(b, "key")
      .agg(coalesce(sum(col("cnt_a") * col("cnt_b")), lit(0L)).as("exact_join_rows"))
    sk.crossJoin(joinSample).crossJoin(exact)
      .select(
        col("n_a").as("distinct_a"), col("n_b").as("distinct_b"),
        col("u_size").cast("long").as("union_sketch_size"),
        size(col("members")).cast("long").as("n_members"),
        round(col("est_union"), 4).as("est_union"),
        round(size(col("members")).cast("double") * col("scale"), 4).as("est_intersection"),
        round(col("sample_join_rows").cast("double") * col("scale"), 4).as("est_join_rows"),
        col("exact_join_rows"),
        round(abs(col("sample_join_rows").cast("double") * col("scale") -
          col("exact_join_rows").cast("double")) /
          nullif(col("exact_join_rows").cast("double"), lit(0.0)), 4).as("rel_error"))
  }

  def kmvJoinCardinalitySql(k: Int, segment: String): String =
    s"""WITH a AS (
       |  SELECT o_custkey AS key, count(*) AS cnt_a,
       |         ${PortableHash.tokenHashSql("CAST(o_custkey AS VARCHAR)")} AS h
       |  FROM orders GROUP BY o_custkey),
       |b AS (
       |  SELECT c_custkey AS key, count(*) AS cnt_b,
       |         ${PortableHash.tokenHashSql("CAST(c_custkey AS VARCHAR)")} AS h
       |  FROM customer WHERE c_mktsegment = '$segment' GROUP BY c_custkey),
       |ra AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM a),
       |rb AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM b),
       |sa AS (SELECT h FROM ra WHERE rn <= $k),
       |sb AS (SELECT h FROM rb WHERE rn <= $k),
       |ru AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |       FROM (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb))),
       |su AS (SELECT h, rn FROM ru WHERE rn <= $k),
       |mem AS (SELECT su.h FROM su
       |        WHERE su.h IN (SELECT h FROM sa) AND su.h IN (SELECT h FROM sb)),
       |scal AS (
       |  SELECT CAST(count(*) AS BIGINT) AS u_size,
       |         CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |              ELSE ${(k - 1).toDouble} /
       |                   ((max(CASE WHEN rn = $k THEN h END) + 1.0) / ${KmvFunctions.HashSpace}) END
       |           AS est_union
       |  FROM su),
       |samp AS (
       |  SELECT coalesce(CAST(sum(a.cnt_a * b.cnt_b) AS BIGINT), 0) AS sample_join_rows,
       |         CAST(count(*) AS BIGINT) AS n_members
       |  FROM mem JOIN a ON mem.h = a.h JOIN b ON mem.h = b.h),
       |ex AS (
       |  SELECT coalesce(CAST(sum(a.cnt_a * b.cnt_b) AS BIGINT), 0) AS exact_join_rows
       |  FROM a JOIN b ON a.key = b.key),
       |nn AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS distinct_a,
       |              (SELECT CAST(count(*) AS BIGINT) FROM b) AS distinct_b)
       |SELECT nn.distinct_a, nn.distinct_b,
       |       scal.u_size AS union_sketch_size,
       |       samp.n_members,
       |       round(scal.est_union, 4) AS est_union,
       |       round(CAST(samp.n_members AS DOUBLE) * scal.est_union / scal.u_size, 4) AS est_intersection,
       |       round(CAST(samp.sample_join_rows AS DOUBLE) * scal.est_union / scal.u_size, 4) AS est_join_rows,
       |       ex.exact_join_rows,
       |       round(abs(CAST(samp.sample_join_rows AS DOUBLE) * scal.est_union / scal.u_size
       |                 - CAST(ex.exact_join_rows AS DOUBLE))
       |             / nullif(CAST(ex.exact_join_rows AS DOUBLE), 0.0), 4) AS rel_error
       |FROM nn, scal, samp, ex""".stripMargin

  /** HyperLogLog bucket count: 64 registers (p = 6). Constant-size like
    * all engine HLLs, but — unlike Spark's `approx_count_distinct` or
    * DuckDB's, whose register layouts are engine-private — built from
    * [[PortableHash]], so the oracle rebuilds the registers bit-for-bit.
    */
  val HllM = 64

  /** Rank clamp: keeps every 2^-rank term a multiple of 2^-40, so the
    * 64-term register sum spans ≤ 47 bits of mantissa and is EXACT in
    * double — order- and engine-independent. P(rank > 40) ≈ 2^-40 per
    * item; the clamp's estimator bias is far below the output rounding.
    */
  val HllMaxRank = 40

  private val hllAlphaM2: Double = 0.7213 / (1 + 1.079 / HllM) * HllM * HllM

  /** ln-derived literals precomputed in Scala (JVM and libm ln differ in
    * the last ulp — build notes): linear-counting corrections m·ln(m/V)
    * for V = 1..m, embedded verbatim in both engines.
    */
  private val hllLnTable: Seq[Double] =
    (1 to HllM).map(v => HllM * math.log(HllM.toDouble / v))

  /** HyperLogLog distinct-user estimate per event type, audited against
    * the exact count (the same pairing as [[approxDistinctUsers]]; KMV
    * answers set algebra, HLL is the constant-memory counter — 64
    * registers vs KMV's k longs).
    *
    * Register build: h = 60-bit portable hash; bucket = h % 64; rank =
    * leading-zero count of the remaining 54-bit word + 1, computed as
    * 55 − length(bin(w)) — `bin()` exists with identical semantics in
    * both engines, which is what makes the registers oracle-checkable.
    *
    * Scale shape: one partial-agged groupBy to (type, bucket) MAX — 64
    * counters per group regardless of corpus size, mergeable by MAX
    * (the streaming/partitioned union story for free). The 64-row grid
    * join is a broadcast of a constant.
    *
    * Estimator: raw = α·m²/Σ2^-M_j with the small-range linear-counting
    * correction below 2.5m when empty registers remain (the standard
    * Flajolet et al. schedule).
    */
  def hllDistinctUsers(events: DataFrame): DataFrame = {
    val regs = events
      .select(col("event_type"),
        PortableHash.tokenHash(col("user_id").cast("string")).as("h"))
      .select(col("event_type"), (col("h") % lit(HllM.toLong)).as("bucket"),
        expr(s"h div $HllM").as("w"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(
        least(when(col("w") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("w")))), lit(HllMaxRank.toLong))).as("m"))
    val grid = events.select(col("event_type")).distinct()
      .select(col("event_type"), explode(sequence(lit(0L), lit(HllM - 1L))).as("bucket"))
    val full = grid.join(regs, Seq("event_type", "bucket"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
    val lnArr = array(hllLnTable.map(lit): _*)
    val est = full.groupBy(col("event_type"))
      .agg(sum(lit(1.0) / expr("cast(shiftleft(CAST(1 AS BIGINT), CAST(m AS INT)) as double)")).as("isum"),
        sum(when(col("m") === 0L, 1L).otherwise(0L)).as("v"))
      .withColumn("raw", lit(hllAlphaM2) / col("isum"))
      // (alpha literal interpolated as CAST('…' AS DOUBLE) in the oracle:
      // a string→double parse round-trips exactly; a bare decimal literal
      // would be DECIMAL in DuckDB — round-7 pitfall)
      .withColumn("hll_estimate", round(
        when(col("raw") <= lit(2.5 * HllM) && col("v") > 0L,
          element_at(lnArr, col("v").cast("int"))).otherwise(col("raw")), 4))
    val exact = events.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_exact"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("v").as("zero_registers"),
        col("hll_estimate"),
        round(abs(col("hll_estimate") - col("n_exact")) / col("n_exact"), 4).as("rel_error"))
      .orderBy("event_type")
  }

  def hllDistinctUsersSql: String = {
    val lnList = hllLnTable.map(d => s"CAST($d AS DOUBLE)").mkString(", ")
    s"""WITH h AS (
       |  SELECT event_type,
       |         ${PortableHash.tokenHashSql("CAST(user_id AS VARCHAR)")} % $HllM AS bucket,
       |         ${PortableHash.tokenHashSql("CAST(user_id AS VARCHAR)")} // $HllM AS w
       |  FROM events),
       |regs AS (
       |  SELECT event_type, bucket,
       |         max(least(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END, $HllMaxRank)) AS m
       |  FROM h GROUP BY 1, 2),
       |grid AS (
       |  SELECT et.event_type, b.bucket
       |  FROM (SELECT DISTINCT event_type FROM events) et,
       |       (SELECT unnest(range(0, $HllM)) AS bucket) b),
       |full_regs AS (
       |  SELECT g.event_type, coalesce(r.m, 0) AS m
       |  FROM grid g LEFT JOIN regs r ON r.event_type = g.event_type AND r.bucket = g.bucket),
       |est AS (
       |  SELECT event_type,
       |         sum(1.0 / CAST((CAST(1 AS BIGINT) << CAST(m AS INTEGER)) AS DOUBLE)) AS isum,
       |         sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
       |  FROM full_regs GROUP BY event_type),
       |fin AS (
       |  SELECT event_type, v,
       |         round(CASE WHEN CAST('$hllAlphaM2' AS DOUBLE) / isum <= ${2.5 * HllM} AND v > 0
       |               THEN [$lnList][CAST(v AS INTEGER)]
       |               ELSE CAST('$hllAlphaM2' AS DOUBLE) / isum END, 4) AS hll_estimate
       |  FROM est)
       |SELECT f.event_type, x.n_exact, CAST(f.v AS BIGINT) AS zero_registers,
       |       f.hll_estimate,
       |       round(abs(f.hll_estimate - x.n_exact) / x.n_exact, 4) AS rel_error
       |FROM fin f JOIN (SELECT event_type, count(DISTINCT user_id) AS n_exact
       |                 FROM events GROUP BY event_type) x USING (event_type)
       |ORDER BY f.event_type""".stripMargin
  }

  def approxDistinctUsersSql(k: Int): String =
    s"""WITH exact AS (
       |  SELECT event_type, count(DISTINCT user_id) AS n_exact
       |  FROM events GROUP BY event_type),
       |h AS (
       |  SELECT DISTINCT event_type,
       |         ${PortableHash.tokenHashSql("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |ranked AS (
       |  SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h),
       |sk AS (
       |  SELECT event_type, count(*) AS sketch_size,
       |         max(CASE WHEN rn = $k THEN h END) AS kth
       |  FROM ranked WHERE rn <= $k GROUP BY event_type),
       |est AS (
       |  SELECT e.event_type, e.n_exact, CAST(s.sketch_size AS BIGINT) AS sketch_size,
       |         round(CASE WHEN s.sketch_size < $k THEN CAST(s.sketch_size AS DOUBLE)
       |               ELSE ${(k - 1).toDouble} / ((s.kth + 1.0) / ${KmvFunctions.HashSpace}) END, 4) AS kmv_estimate
       |  FROM exact e JOIN sk s ON e.event_type = s.event_type)
       |SELECT event_type, n_exact, sketch_size, kmv_estimate,
       |       round(abs(kmv_estimate - n_exact) / n_exact, 4) AS rel_error
       |FROM est ORDER BY event_type""".stripMargin

  /** EXACT distinct users per (type, day) via Spark's bitmap aggregates
    * (bucketed roaring-style bitmaps: bitmap_construct_agg per 32k-id
    * bucket, merged counts summed) — the scalable exact-distinct pattern
    * that replaces count_distinct's per-group hash set with fixed-size
    * bitmap partials, sitting beside the approximate KMV/HLL paths. The
    * oracle asserts it equals plain COUNT(DISTINCT): the bitmap layout
    * is engine-internal, the COUNT is not.
    */
  def bitmapDistinctDaily(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        col("user_id"))
      .groupBy(col("event_type"), col("day"),
        expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
      .select(col("event_type"),
        timestamp_micros(col("day") * lit(86400000000L)).as("day"),
        col("n_distinct"))
      .orderBy("event_type", "day")

  val bitmapDistinctDailySql: String =
    """SELECT event_type,
      |       make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS day,
      |       count(DISTINCT user_id) AS n_distinct
      |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  /** DAU/MAU stickiness with the trailing-window MAU from MERGED HLL
    * registers — the flagship mergeability demo: per-day registers are
    * a bounded partial aggregate, and the trailing `windowDays` union
    * is just a per-bucket windowed MAX (HLL union = register-wise max),
    * so the sliding 30-day distinct costs O(days·64) after the one
    * partial-agged scan — no per-window rescan of user ids, which is
    * exactly how the 100 TB version works. DAU stays exact (cheap per
    * day); the estimator, clamp and linear-counting table are the
    * [[hllDistinctUsers]] constants, shared verbatim with the oracle.
    */
  def stickinessHll(events: DataFrame, windowDays: Int): DataFrame = {
    val regs = events
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        PortableHash.tokenHash(col("user_id").cast("string")).as("h"))
      .select(col("day"), (col("h") % lit(HllM.toLong)).as("bucket"),
        expr(s"h div $HllM").as("w"))
      .groupBy(col("day"), col("bucket"))
      .agg(max(
        least(when(col("w") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("w")))), lit(HllMaxRank.toLong))).as("m"))
    val days = events.select(expr("unix_micros(ts) div 86400000000").as("day")).distinct()
    val grid = days.select(col("day"), explode(sequence(lit(0L), lit(HllM - 1L))).as("bucket"))
    val full = grid.join(regs, Seq("day", "bucket"), "left")
    val wWin = Window.partitionBy(col("bucket")).orderBy(col("day"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    val winRegs = full.withColumn("mw", coalesce(max(col("m")).over(wWin), lit(0L)))
    val lnArr = array(hllLnTable.map(lit): _*)
    val mau = winRegs.groupBy(col("day"))
      .agg(sum(lit(1.0) / expr("cast(shiftleft(CAST(1 AS BIGINT), CAST(mw AS INT)) as double)")).as("isum"),
        sum(when(col("mw") === 0L, 1L).otherwise(0L)).as("v"))
      .withColumn("raw", lit(hllAlphaM2) / col("isum"))
      .withColumn("mau_hll", round(
        when(col("raw") <= lit(2.5 * HllM) && col("v") > 0L,
          element_at(lnArr, col("v").cast("int"))).otherwise(col("raw")), 4))
    val dau = events
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count_distinct(col("user_id")).as("dau_exact"))
    dau.join(mau.select(col("day"), col("mau_hll")), "day")
      .select(timestamp_micros(col("day") * lit(86400000000L)).as("day"),
        col("dau_exact"), col("mau_hll"),
        round(col("dau_exact").cast("double") / col("mau_hll"), 4).as("stickiness"))
      .orderBy("day")
  }

  def stickinessHllSql(windowDays: Int): String = {
    val lnList = hllLnTable.map(d => s"CAST($d AS DOUBLE)").mkString(", ")
    s"""WITH h AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |         ${PortableHash.tokenHashSql("CAST(user_id AS VARCHAR)")} % $HllM AS bucket,
       |         ${PortableHash.tokenHashSql("CAST(user_id AS VARCHAR)")} // $HllM AS w
       |  FROM events),
       |regs AS (
       |  SELECT day, bucket,
       |         max(least(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END, $HllMaxRank)) AS m
       |  FROM h GROUP BY 1, 2),
       |grid AS (
       |  SELECT d.day, b.bucket
       |  FROM (SELECT DISTINCT day FROM h) d,
       |       (SELECT unnest(range(0, $HllM)) AS bucket) b),
       |full_regs AS (
       |  SELECT g.day, g.bucket, r.m
       |  FROM grid g LEFT JOIN regs r ON r.day = g.day AND r.bucket = g.bucket),
       |win AS (
       |  SELECT day, bucket,
       |         coalesce(max(m) OVER (PARTITION BY bucket ORDER BY day
       |           RANGE BETWEEN ${windowDays - 1} PRECEDING AND CURRENT ROW), 0) AS mw
       |  FROM full_regs),
       |est AS (
       |  SELECT day,
       |         sum(1.0 / CAST((CAST(1 AS BIGINT) << CAST(mw AS INTEGER)) AS DOUBLE)) AS isum,
       |         sum(CASE WHEN mw = 0 THEN 1 ELSE 0 END) AS v
       |  FROM win GROUP BY day),
       |mau AS (
       |  SELECT day,
       |         round(CASE WHEN CAST('$hllAlphaM2' AS DOUBLE) / isum <= ${2.5 * HllM} AND v > 0
       |               THEN [$lnList][CAST(v AS INTEGER)]
       |               ELSE CAST('$hllAlphaM2' AS DOUBLE) / isum END, 4) AS mau_hll
       |  FROM est),
       |dau AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |         count(DISTINCT user_id) AS dau_exact
       |  FROM events GROUP BY 1)
       |SELECT make_timestamp(d.day * 86400000000) AS day,
       |       d.dau_exact, m.mau_hll,
       |       round(CAST(d.dau_exact AS DOUBLE) / m.mau_hll, 4) AS stickiness
       |FROM dau d JOIN mau m ON m.day = d.day
       |ORDER BY day""".stripMargin
  }
}
