package graft.model

/** Typed pipeline configuration + validation — the reference's HOCON
  * config layer (reference: config/CDCConfig.scala, reference.conf:3-89,
  * validation rules config/ConfigLoader.scala:148-331) as a plain case
  * class: Spark jobs get config from code/spark-submit conf, not a
  * parallel HOCON tree, so only the *shape* and the *validation rules*
  * carry over.
  */
final case class CdcConfig(
    sourceDb: String = "",
    partitionCount: Int = 64,
    applyWorkers: Int = 8,
    snapshotWorkers: Int = 4,
    batchSize: Int = 100,
    flushIntervalMs: Long = 1000L,
    commitIntervalMs: Long = 5000L,
    readerBufferSize: Int = 1000,
    enableSnapshot: Boolean = false,
    includeTables: Seq[String] = Nil,
    excludeTables: Seq[String] = Nil,
    maxRetries: Int = 3,
    circuitBreakerThreshold: Int = 5)

object CdcConfig {

  /** Validation mirroring the reference's ConfigValidator semantics
    * (ConfigLoader.scala:148-331): positive bounds, worker sanity,
    * include/exclude conflicts (the reference rejects patterns present
    * in both lists, ConfigLoader.scala:290-293). Returns all problems,
    * not just the first.
    */
  def validate(c: CdcConfig): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (c.sourceDb.isEmpty) errs += "source database must be set"
    if (c.partitionCount <= 0 || c.partitionCount > 4096)
      errs += s"partitionCount ${c.partitionCount} out of range (1, 4096]"
    if (c.applyWorkers <= 0 || c.applyWorkers > c.partitionCount)
      errs += s"applyWorkers ${c.applyWorkers} must be in (0, partitionCount]"
    if (c.snapshotWorkers <= 0) errs += "snapshotWorkers must be positive"
    if (c.batchSize <= 0 || c.batchSize > 100000)
      errs += s"batchSize ${c.batchSize} out of range (0, 100000]"
    if (c.flushIntervalMs <= 0) errs += "flushIntervalMs must be positive"
    if (c.commitIntervalMs < c.flushIntervalMs)
      errs += "commitIntervalMs must be >= flushIntervalMs"
    if (c.readerBufferSize <= 0) errs += "readerBufferSize must be positive"
    if (c.maxRetries < 0) errs += "maxRetries must be non-negative"
    if (c.circuitBreakerThreshold <= 0) errs += "circuitBreakerThreshold must be positive"
    val conflict = c.includeTables.toSet.intersect(c.excludeTables.toSet)
    if (conflict.nonEmpty)
      errs += s"patterns in both include and exclude: ${conflict.toSeq.sorted.mkString(", ")}"
    errs.result()
  }

  def validated(c: CdcConfig): CdcConfig = {
    val errs = validate(c)
    require(errs.isEmpty, s"invalid config: ${errs.mkString("; ")}")
    c
  }
}
