package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT order statistics at 100 TB — the scale path the exact-quantile
  * audits (`events_percentiles`, `events_value_deciles`,
  * `text_quality_gate`) lack: those hold every value in one aggregation
  * buffer (`percentile`) or sort a whole group under one reducer
  * (`ntile`), which is fine as a fixture-scale audit and fatal at scale.
  * The sketch paths ([[Sketches]], `qualityGateSketch`) bound memory by
  * approximating; THIS path stays exact and still bounds memory, via the
  * classic two-pass histogram-refinement selection:
  *
  *   1. one partial-aggregated scan → per-group (min, max, count)
  *      [driver holds |groups| rows of metadata];
  *   2. one partial-aggregated scan → per-group B-bucket equi-width
  *      histogram [driver holds ≤ |groups|·B counters]; the driver walks
  *      cumulative counts to locate, for each requested rank, the bucket
  *      containing it and the rank WITHIN that bucket;
  *   3. one scan filtered to the needed buckets (broadcast join — at most
  *      |ranks| buckets per group survive), a per-bucket window over
  *      ~n/B rows reads off the exact values.
  *
  * Every stage is map-side-combined or bucket-local; driver state is
  * group/bucket COUNTS, never data rows; no stage sorts more than one
  * bucket's worth of rows in one task. Ties cost nothing: equal values
  * share a bucket, and the k-th order statistic is the same value under
  * any ordering consistent with the value order. (A pathological bucket —
  * most of a group's mass on ONE value — still sorts only that bucket's
  * rows, and only when a requested rank lands inside it; recursing the
  * refinement one level bounds even that, omitted here.) Three scans
  * instead of one is the price of exactness without an O(n) buffer — at
  * 100 TB you pay it for release gates where a sketch's ±ε is not
  * acceptable.
  *
  * Oracle note: the selected values are bit-exact order statistics, so
  * the downstream percentile/decile assemblies reproduce the single-node
  * `percentile`/`ntile` results EXACTLY and share their oracles verbatim.
  */
object ExactQuantiles {

  private val defaultBuckets = 1024

  /** Hard bound on |groups|: the driver holds |groups|·buckets histogram
    * COUNTERS (pass 2), so the contract is low-cardinality groupings only
    * (event types, doc sources, release gates) — at 4096 groups × 1024
    * buckets that is 4M counters, the sensible ceiling for driver heap.
    * Pointing this at a per-user/per-key grouping is a design error; the
    * bounded-memory alternative there is the mergeable sketch path
    * ([[Sketches]] / `qualityGateSketch`), which keeps state on executors.
    */
  val maxGroups = 4096

  /** Core selection. Returns the (group, rank_idx, v) frame of exact
    * order statistics plus the per-group non-null counts the rank
    * specs were derived from (so callers assemble without re-scanning).
    */
  private def selectRanks(df: DataFrame, groupCol: String, valueCol: String,
                          ranksFor: Long => Seq[Long], buckets: Int)
      : (DataFrame, Map[String, Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // cardinality guard BEFORE any driver-side collect: a limit-probe
    // (partial-distinct + CollectLimit) costs one cheap scan and returns
    // at most maxGroups+1 rows regardless of the true cardinality
    val probe = vals.select(col("g")).distinct().limit(maxGroups + 1).count()
    require(probe <= maxGroups,
      s"ExactQuantiles: grouping '$groupCol' has more than $maxGroups distinct " +
        s"groups — the two-pass exact selection holds |groups|*$buckets histogram " +
        "counters on the driver and is for low-cardinality groupings only. For " +
        "high-cardinality keys use the mergeable sketch path (graft.ops.Sketches / " +
        "qualityGateSketch), which keeps quantile state on the executors.")
    // pass 1: per-group bounds + count (bounded |groups| collect)
    val stats = vals.groupBy(col("g"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"), count(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val counts = stats.map { case (g, (_, _, n)) => g -> n }
    val bounds = broadcast(
      stats.toSeq.map { case (g, (mn, mx, _)) => (g, mn, mx) }.sortBy(_._1)
        .toDF("g", "mn", "mx"))
    val bucketOf: Column =
      when(col("mx") > col("mn"),
        least(floor((col("v") - col("mn")) * buckets / (col("mx") - col("mn"))),
          lit((buckets - 1).toLong)))
        .otherwise(lit(0L))
    val bucketed = vals.join(bounds, "g").withColumn("b", bucketOf)
    // pass 2: histogram (bounded |groups|·buckets collect of COUNTS)
    val hist: Map[String, Seq[(Long, Long)]] =
      bucketed.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    // driver: map each requested rank to (bucket, within-bucket rank)
    val needed = stats.toSeq.sortBy(_._1).flatMap { case (g, (_, _, n)) =>
      val cells = hist.getOrElse(g, Seq.empty[(Long, Long)])
      ranksFor(n).distinct.sorted.map { k =>
        require(k >= 0 && k < n, s"rank $k out of range for group $g (n=$n)")
        var cum = 0L
        var found: Option[(Long, Long)] = None // (bucket, count before it)
        val it = cells.iterator
        while (found.isEmpty && it.hasNext) {
          val (b, c) = it.next()
          if (cum + c > k) found = Some((b, cum)) else cum += c
        }
        val (b, before) = found.get
        (g, b, k - before, k)
      }
    }
    val sel =
      if (needed.isEmpty)
        Seq.empty[(String, Long, Double)].toDF("g", "rank_idx", "v")
      else {
        val neededDf = needed.toDF("g", "b", "wr", "rank_idx")
        // pass 3: scan only the needed buckets; a per-bucket window reads
        // the exact values (≈ n/buckets rows sorted per task, never a
        // full group)
        val wanted = bucketed
          .join(broadcast(neededDf.select(col("g"), col("b")).distinct()), Seq("g", "b"))
          .withColumn("rn",
            row_number().over(Window.partitionBy(col("g"), col("b")).orderBy(col("v"))) - 1)
        wanted.join(broadcast(neededDf), wanted("g") === neededDf("g") &&
            wanted("b") === neededDf("b") && col("rn") === col("wr"))
          .select(wanted("g"), col("rank_idx"), col("v"))
      }
    (sel, counts)
  }

  /** (group, rank_idx, v): the 0-indexed `rank_idx`-th smallest non-null
    * value of each group, for the ranks `ranksFor(groupCount)` requests.
    * `groupCol` must be string-typed; `valueCol` casts to double.
    */
  def valuesAtRanks(df: DataFrame, groupCol: String, valueCol: String,
                    ranksFor: Long => Seq[Long],
                    buckets: Int = defaultBuckets): DataFrame =
    selectRanks(df, groupCol, valueCol, ranksFor, buckets)._1

  /** Interpolated percentiles per group, EXACTLY matching the semantics
    * of Spark's `percentile(value, p)` (percentile_cont: rank p·(n−1),
    * linear interpolation between the straddling order statistics) —
    * assembled from the two-pass selection, so no unbounded buffer.
    * `ps` maps output column name → fraction, each rounded to 4 dp;
    * `n` counts ALL group rows (matching a `count(*)` column beside a
    * null-skipping percentile).
    */
  def percentiles(df: DataFrame, groupCol: String, valueCol: String,
                  ps: Seq[(String, Double)],
                  buckets: Int = defaultBuckets): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def ranksOf(n: Long): Seq[Long] = ps.flatMap { case (_, p) =>
      val r = p * (n - 1)
      Seq(math.floor(r).toLong, math.ceil(r).toLong)
    }
    val (ar0, counts) = selectRanks(df, groupCol, valueCol, ranksOf, buckets)
    val ar = Caches.tracked(ar0.persist()) // consumed twice (lo + hi join)
    // driver-built spec: (g, name, k_lo, k_hi, frac) — derived from counts
    // (metadata); the interpolation itself runs in Spark expressions with
    // the builtin's `lo + (hi − lo)·frac` arithmetic
    val spec = counts.toSeq.sortBy(_._1).flatMap { case (g, n) =>
      ps.map { case (name, p) =>
        val r = p * (n - 1)
        (g, name, math.floor(r).toLong, math.ceil(r).toLong, r - math.floor(r))
      }
    }.toDF("g", "p_name", "k_lo", "k_hi", "frac")
    val lo = ar.toDF("g", "k", "v_lo")
    val hi = ar.toDF("g", "k", "v_hi")
    val pv = spec
      .join(lo, spec("g") === lo("g") && col("k_lo") === lo("k"))
      .join(hi, spec("g") === hi("g") && col("k_hi") === hi("k"))
      .select(spec("g"), col("p_name"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac")).as("pv"))
    val pivots = ps.map { case (name, _) =>
      round(max(when(col("p_name") === name, col("pv"))), 4).as(name)
    }
    val nAll = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n"))
    pv.groupBy(col("g"))
      .agg(pivots.head, pivots.tail: _*)
      .join(broadcast(nAll), "g")
      .withColumnRenamed("g", groupCol)
      .orderBy(groupCol)
  }

  /** Exact equi-depth deciles per group, EXACTLY matching `ntile(10)`
    * bucket sizes and boundaries (the first n mod 10 deciles take the
    * extra row), per-decile lo/hi read off as order statistics — the
    * windowed audit's output contract without its per-group
    * single-reducer sort.
    */
  def deciles(df: DataFrame, groupCol: String, valueCol: String,
              buckets: Int = defaultBuckets): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def decileSpans(n: Long): Seq[(Int, Long, Long)] = {
      val q = n / 10; val rem = n % 10
      (1 to 10).flatMap { d =>
        val size = q + (if (d <= rem) 1L else 0L)
        if (size == 0) None
        else {
          val start = (d - 1) * q + math.min(d - 1L, rem)
          Some((d, start, start + size - 1))
        }
      }
    }
    val (ar0, counts) = selectRanks(df, groupCol, valueCol,
      n => decileSpans(n).flatMap(s => Seq(s._2, s._3)), buckets)
    val ar = Caches.tracked(ar0.persist()) // consumed twice (lo + hi join)
    val spec = counts.toSeq.sortBy(_._1).flatMap { case (g, n) =>
      decileSpans(n).map { case (d, s, e) => (g, d, e - s + 1, s, e) }
    }.toDF("g", "decile", "n", "k_start", "k_end")
    val lo = ar.toDF("g", "k", "lo")
    val hi = ar.toDF("g", "k", "hi")
    spec
      .join(lo, spec("g") === lo("g") && col("k_start") === lo("k"))
      .join(hi, spec("g") === hi("g") && col("k_end") === hi("k"))
      .select(spec("g").as(groupCol), col("decile"), col("n"), col("lo"), col("hi"))
      .orderBy(groupCol, "decile")
  }
}
