package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connector SPI registry — the reference's pluggable source/sink
  * registration (reference: connector/ConnectorRegistry.scala:17-156,
  * bootstrapped with mysql-source/mysql-sink/starrocks-sink in
  * connector/ConnectorBootstrap.scala:27-85). In Spark the natural SPI is
  * (format, options) factories on DataFrameReader/Writer; this registry
  * keeps the same register/lookup/clear contract so pipelines select
  * connectors by name from config.
  */
object ConnectorRegistry {

  /** A named way to read a changelog-shaped DataFrame. */
  trait SourceFactory extends Serializable {
    def name: String
    def read(spark: SparkSession, options: Map[String, String]): DataFrame
  }

  /** A named way to write a batch idempotently. */
  trait SinkFactory extends Serializable {
    def name: String
    def write(df: DataFrame, options: Map[String, String]): Unit
  }

  private val sources = scala.collection.concurrent.TrieMap.empty[String, SourceFactory]
  private val sinks = scala.collection.concurrent.TrieMap.empty[String, SinkFactory]

  def registerSource(f: SourceFactory): Unit = sources.put(f.name, f)
  def registerSink(f: SinkFactory): Unit = sinks.put(f.name, f)

  def source(name: String): SourceFactory =
    sources.getOrElse(name, throw new IllegalArgumentException(
      s"unknown source connector '$name'; registered: ${sources.keys.toSeq.sorted.mkString(", ")}"))

  def sink(name: String): SinkFactory =
    sinks.getOrElse(name, throw new IllegalArgumentException(
      s"unknown sink connector '$name'; registered: ${sinks.keys.toSeq.sorted.mkString(", ")}"))

  def registeredSources: Seq[String] = sources.keys.toSeq.sorted
  def registeredSinks: Seq[String] = sinks.keys.toSeq.sorted

  /** Test hook, mirroring ConnectorRegistry.clear()
    * (reference :124-131 "主要用于测试").
    */
  def clear(): Unit = { sources.clear(); sinks.clear(); bootstrap() }

  /** Default wiring: parquet + graft-binlog sources, parquet keyed sink. */
  def bootstrap(): Unit = {
    registerSource(new SourceFactory {
      val name = "parquet"
      def read(spark: SparkSession, options: Map[String, String]): DataFrame =
        spark.read.parquet(options("path"))
    })
    registerSource(new SourceFactory {
      val name = "graft-binlog"
      def read(spark: SparkSession, options: Map[String, String]): DataFrame =
        spark.read.format("graft-binlog").options(options).load()
    })
    registerSource(new SourceFactory {
      val name = "jdbc-snapshot"
      def read(spark: SparkSession, options: Map[String, String]): DataFrame =
        JdbcSnapshot.read(spark, options("url"), options("table"),
          JdbcSnapshot.Partitioning(
            options("partitionColumn"),
            options("lowerBound").toLong,
            options("upperBound").toLong,
            options("numPartitions").toInt),
          options -- Seq("url", "table", "partitionColumn", "lowerBound", "upperBound", "numPartitions"))
    })
    registerSink(new SinkFactory {
      val name = "parquet-keyed"
      def write(df: DataFrame, options: Map[String, String]): Unit = {
        val spark = df.sparkSession
        val dir = options("path")
        val version = options.getOrElse("version", "0").toLong
        val keys = options("keys").split(",").toSeq
        val base = options.get("base").map(spark.read.parquet(_))
          .getOrElse(spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            df.drop("op").schema))
        ParquetKeyedSink.upsert(spark, dir, version, base, df, keys)
      }
    })
  }

  bootstrap()
}
