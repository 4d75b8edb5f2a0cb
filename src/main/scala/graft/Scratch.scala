package graft

/** Process-scoped scratch directories, swept by ONE JVM shutdown hook.
  *
  * Streaming queries and iterative checkpoints need temp trees that live
  * until process exit (their DataFrames read the dirs lazily, so earlier
  * deletion would break re-execution). A hook-per-dir (the previous shape)
  * leaks a Thread per invocation when Bench re-runs a query hundreds of
  * times; here repeated `dir()` calls only grow a queue of paths and the
  * single hook sweeps them all.
  */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private val hookInstalls = new java.util.concurrent.atomic.AtomicInteger(0)

  private lazy val installHook: Unit = {
    hookInstalls.incrementAndGet()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(p.toFile)
      }
    }))
  }

  /** Scratch base tier: `SPARK_GRAFT_SCRATCH` when set, else a RAM-backed
    * tmpfs (`/dev/shm`) when one is writable, else `java.io.tmpdir`.
    *
    * Everything under Scratch is process-ephemeral bookkeeping (streaming
    * checkpoints/WALs, iterative-round checkpoints, staged artifact
    * trees) whose durability tier is a DEPLOYMENT choice — on a cluster
    * it points at the job's DFS scratch path via the env var. Locally the
    * default was the disk-backed /tmp, which made every streaming
    * micro-batch pay real fsync latency for WAL/state commits (and the
    * latency grows as a long bench sweep accumulates dirty writeback from
    * the artifact builders — measured round 13: stateful streaming
    * queries ran 2-3.5x their isolated time deep into a full sweep).
    * tmpfs makes those fsyncs memory-speed without changing any result:
    * recovery-from-scratch semantics within the process are identical.
    */
  private lazy val base: java.nio.file.Path = {
    val pick = sys.env.get("SPARK_GRAFT_SCRATCH").map(java.nio.file.Paths.get(_))
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isWritable(shm)) Some(shm.resolve("graft_scratch"))
        else None
      }
      .getOrElse(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
    java.nio.file.Files.createDirectories(pick)
    pick
  }

  /** A fresh temp directory deleted (recursively) at JVM exit. */
  def dir(prefix: String): String = {
    installHook
    val p = java.nio.file.Files.createTempDirectory(base, prefix)
    created.add(p)
    p.toString
  }

  /** Number of JVM shutdown hooks this registry has installed — the
    * no-accumulation contract is that this stays 1 for the process
    * lifetime however many dirs are handed out (spec observability). */
  private[graft] def hookCount: Int = hookInstalls.get()
}
