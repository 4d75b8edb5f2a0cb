package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-table schema registry driving typed payload decode.
  *
  * The reference discovers each table's column list/types from
  * information_schema at runtime and coerces every raw binlog cell
  * through it (reference: catalog/MySQLCatalogService.scala:136-173
  * getTableSchema, normalizer/MySQLEventNormalizer.scala:164-171 per-event
  * schema cache, :184-250 convertValue per column type). Spark-first, the
  * same idea is: register a `StructType` per table once on the driver and
  * decode the row-image JSON with `from_json(payload, schemaFor(tbl))` —
  * a codegen'd expression inside the scan stage instead of the reference's
  * blocking per-event `Await` on a TrieMap miss
  * (MySQLEventNormalizer.scala:166-170).
  *
  * Tables sharing an identical schema decode in ONE `from_json` branch, so
  * the common case (a sharded table family) costs a single projection; only
  * genuinely heterogeneous schemas fan out into a union, each branch still
  * a scan-local projection with no shuffle.
  */
final case class SchemaRegistry(schemas: Map[String, StructType]) {

  require(schemas.nonEmpty, "schema registry needs at least one table")

  def schemaFor(tbl: String): StructType =
    schemas.getOrElse(tbl, throw new NoSuchElementException(s"no schema registered for table $tbl"))

  def tables: Seq[String] = schemas.keys.toSeq.sorted

  /** Union of all registered fields (by name), used to align branches of
    * heterogeneous schemas. Conflicting types for the same field name are
    * a registry bug and rejected eagerly.
    */
  val unifiedFields: Seq[StructField] = {
    val byName = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    for (s <- schemas.valuesIterator.toSeq.distinct; f <- s.fields) {
      byName.get(f.name) match {
        case Some(prev) if prev.dataType != f.dataType =>
          throw new IllegalArgumentException(
            s"field ${f.name} registered with conflicting types ${prev.dataType} and ${f.dataType}")
        case _ => byName.update(f.name, f)
      }
    }
    byName.values.toSeq
  }

  /** Decode an envelope's JSON row image through each table's registered
    * schema: (tbl, pk, op, ts, pos, payload_json) → (tbl, pk, op, ts, pos,
    * <typed payload columns>). Events for unregistered tables are dropped —
    * the same scoping contract as [[TableFilter]] (replication only covers
    * registered tables).
    */
  def decode(envelope: DataFrame, payloadCol: String = "payload_json"): DataFrame = {
    val envCols = envelope.columns.filterNot(_ == payloadCol).toSeq
    // A row image naturally contains the PK column(s); the envelope's
    // extracted copy is authoritative (reference extracts PK at normalize
    // time too, MySQLEventNormalizer.scala:252-257), so payload fields
    // shadowed by envelope names are not re-emitted.
    val payloadFields = unifiedFields.filterNot(f => envCols.contains(f.name))
    val branches = schemas.groupBy(_._2).toSeq
      .map { case (schema, m) => (schema, m.keys.toSeq.sorted) }
      .sortBy(_._2.head)
      .map { case (schema, tbls) =>
        val decoded = envelope
          .filter(col("tbl").isin(tbls: _*))
          .withColumn("__row", from_json(col(payloadCol), schema))
        decoded.select(envCols.map(col) ++ payloadFields.map { f =>
          if (schema.fieldNames.contains(f.name)) col(s"__row.${f.name}").as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }: _*)
      }
    branches.reduce(_.unionByName(_))
  }
}

object SchemaRegistry {

  /** All listed tables share one schema (the sharded-family case). */
  def of(tbls: Seq[String], schema: StructType): SchemaRegistry =
    SchemaRegistry(tbls.map(_ -> schema).toMap)

  /** Discovery-driven construction: read each parquet table's footer
    * schema from a lake directory — the Spark analogue of the reference's
    * information_schema scan (catalog/MySQLCatalogService.scala:136-173),
    * composed with the same [[TableFilter]] used for replication scoping.
    */
  def fromParquetDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                     filter: TableFilter = TableFilter(Nil, Nil)): SchemaRegistry = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    val schemas = files.toSeq
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getName.stripSuffix(".parquet") -> f.getAbsolutePath)
      .filter { case (t, _) => filter.shouldInclude(t) }
      .map { case (t, p) => t -> spark.read.parquet(p).schema }
    SchemaRegistry(schemas.toMap)
  }
}
