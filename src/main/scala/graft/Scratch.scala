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

  /** A fresh temp directory deleted (recursively) at JVM exit. */
  def dir(prefix: String): String = {
    installHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  /** Number of JVM shutdown hooks this registry has installed — the
    * no-accumulation contract is that this stays 1 for the process
    * lifetime however many dirs are handed out (spec observability). */
  private[graft] def hookCount: Int = hookInstalls.get()
}
