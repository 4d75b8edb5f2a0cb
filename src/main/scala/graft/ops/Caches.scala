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
}
