package graft.ops

import org.apache.spark.sql.DataFrame

/** Engine-level registry of intermediate frames persisted on behalf of a
  * lazy result.
  *
  * Several ops persist a frame their returned DataFrame consumes more
  * than once (LSH signatures, IVF assignments, scalar-probe aggregates).
  * The op cannot unpersist it eagerly — the caller's action hasn't run
  * yet — so eviction is the caller's job. One session-level convention
  * keeps that from leaking in long-lived drivers: every op registers its
  * persists here, and the caller runs [[releaseCaches]] after consuming
  * results (Bench/Verify's per-query `clearCache()` subsumes the
  * unpersist but not the reference cleanup).
  */
object Caches {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Register a frame the caller must evict; returns it for chaining. */
  def tracked(df: DataFrame): DataFrame = synchronized { frames += df; df }

  /** Unpersist every tracked frame and drop the references. */
  def releaseCaches(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
  }

  /** Number of currently tracked frames (spec observability). */
  def trackedCount: Int = synchronized(frames.size)

  /** Memory-sink temp views minted by streaming queries, registered at
    * creation so teardown drops EXACTLY these — a substring filter
    * ("name contains stream") both missed real families (4 of 9, caught
    * only in hand-review) and would silently delete any future
    * non-streaming view that happens to contain the word. Every sink
    * name goes through [[registerStreamView]] (SparkEntry's mint
    * helper); [[releaseStreamingState]] drains the set.
    */
  private val streamViews = scala.collection.mutable.Set.empty[String]

  /** Register a memory-sink view name for teardown; returns it for chaining. */
  def registerStreamView(name: String): String =
    synchronized { streamViews += name; name }

  /** Registered-but-not-yet-torn-down view names (spec observability). */
  def pendingStreamViews: Set[String] = synchronized(streamViews.toSet)

  /** Tear down executor-side streaming residue a finished query leaves in
    * a long-lived JVM: loaded state-store providers (kept in a
    * process-wide map and re-visited by the 60s maintenance thread
    * forever) and memory-sink temp views. Measured effect: with five
    * other streaming queries' providers resident, events_hourly_stream
    * read 12.0 s; in a clean JVM, 2.6 s — the residue, not the query,
    * was the cost. Bench/Verify/ProfileQ call this with releaseCaches
    * between queries; a terminated AvailableNow query never needs its
    * providers again (a restarted one reloads from the checkpoint).
    */
  def releaseStreamingState(spark: org.apache.spark.sql.SparkSession): Unit = {
    // StateStore is private[sql]; same-JVM reflection reaches the
    // public-bytecode singleton (the AbstractDataType precedent from
    // CLAUDE.md: Spark's scala-level privacy, not a JVM boundary)
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      val module = cls.getField("MODULE$").get(null)
      cls.getMethod("unloadAll").invoke(module)
      ()
    } catch { case _: Throwable => () }
    // memory-sink views are one-shot per query invocation (sequenced
    // names registered at mint time); dropping them frees the
    // collected rows. Exact-name drops only — no substring heuristics.
    val views = synchronized { val v = streamViews.toList; streamViews.clear(); v }
    views.foreach { v =>
      try spark.catalog.dropTempView(v) catch { case _: Throwable => () }
    }
  }

  /** True iff the process-wide state-store provider map is empty —
    * reached via the same reflective path [[releaseStreamingState]]
    * uses, so a Spark upgrade that breaks the unload hook ALSO breaks
    * this probe and the spec pinning it fails loudly (instead of the
    * residue fix silently disarming).
    */
  def loadedStateStoreProviders: Int = {
    val cls = Class.forName(
      "org.apache.spark.sql.execution.streaming.state.StateStore$")
    val module = cls.getField("MODULE$").get(null)
    val m = cls.getDeclaredMethod("loadedProviders")
    m.setAccessible(true)
    val map = m.invoke(module).asInstanceOf[scala.collection.mutable.HashMap[_, _]]
    map.synchronized(map.size)
  }

  /** Run `body` with the session's shuffle width scoped down to a
    * micro-batch size (cores/4, floor 4) and restored after. Stateful
    * streaming queries pin their state-store partition count from
    * `spark.sql.shuffle.partitions` at first start; at cluster width a
    * fixture-scale micro-batch pays one state/delta commit + fsync per
    * partition per batch, which dominates wall. The single definition
    * behind every scoped-width site (SparkEntry streaming entries,
    * [[Dedup.streamingNovelty]]'s batch body).
    */
  def withBatchShuffleWidth[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // AQE off for the batch body too: at micro-batch scale every AQE
    // shuffle-stage materialization is its own Spark job plus a
    // re-planning gap, and a 4-batch novelty stream measured ~16
    // jobs/batch mostly in those gaps (ProfileQ). Nothing AQE decides
    // here matters — joins are explicit broadcast(), fan-out widths are
    // pinned repartition(n, col) — so the batch pays fixed single-job
    // plans instead. Restored after the body: interactive-scale queries
    // keep AQE's skew/coalesce wins.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(4, spark.sparkContext.defaultParallelism / 8))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
