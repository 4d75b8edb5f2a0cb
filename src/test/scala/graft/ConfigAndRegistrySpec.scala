package graft

import graft.model.CdcConfig
import graft.sinks.ConnectorRegistry

class ConfigAndRegistrySpec extends SparkSpec {

  test("default config with a source db validates clean") {
    assert(CdcConfig.validate(CdcConfig(sourceDb = "app")).isEmpty)
  }

  test("validation collects every problem, not just the first") {
    val errs = CdcConfig.validate(CdcConfig(
      sourceDb = "", partitionCount = 0, batchSize = -1,
      includeTables = Seq("t*", "x"), excludeTables = Seq("t*")))
    assert(errs.exists(_.contains("source database")))
    assert(errs.exists(_.contains("partitionCount")))
    assert(errs.exists(_.contains("batchSize")))
    assert(errs.exists(_.contains("both include and exclude")))
    assert(errs.size >= 5) // applyWorkers > partitionCount also fires
  }

  test("commit interval must cover flush interval") {
    val errs = CdcConfig.validate(CdcConfig(sourceDb = "app",
      flushIntervalMs = 5000, commitIntervalMs = 1000))
    assert(errs.exists(_.contains("commitIntervalMs")))
  }

  test("registry: bootstrap connectors resolve; unknown names throw with inventory") {
    ConnectorRegistry.clear()
    assert(ConnectorRegistry.registeredSources.contains("parquet"))
    assert(ConnectorRegistry.registeredSources.contains("graft-binlog"))
    assert(ConnectorRegistry.registeredSinks.contains("parquet-keyed"))
    val e = intercept[IllegalArgumentException](ConnectorRegistry.source("mysql"))
    assert(e.getMessage.contains("graft-binlog"))
  }

  test("registry: parquet source factory reads fixtures") {
    ConnectorRegistry.clear()
    val df = ConnectorRegistry.source("parquet")
      .read(spark, Map("path" -> "/root/testdata/sf0.001/region.parquet"))
    assert(df.count() > 0)
  }
}
