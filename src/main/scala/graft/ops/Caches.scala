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
    // names); dropping them frees the collected rows
    try spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.contains("_stream"))
      .foreach(t => spark.catalog.dropTempView(t.name))
    catch { case _: Throwable => () }
  }
}
