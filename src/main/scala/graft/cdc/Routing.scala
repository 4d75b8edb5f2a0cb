package graft.cdc

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed routing and offset-frontier accounting.
  *
  * Router (reference: router/EventRouter.scala:25-32 —
  * `abs(hash(table:pk)) % partitionCount`): in Spark the guarantee
  * "same (table, pk) serializes to one partition" is exactly
  * `repartition(n, $"tbl", $"pk")`. [[partitionCol]] exposes the partition
  * id as a *portable* column so the assignment itself is oracle-checkable.
  *
  * Offset frontier (reference: coordinator/DefaultOffsetCoordinator.scala:81-115
  * — earliest position applied in every partition, the commit point of the
  * RECEIVED→APPLIED→COMMITTED machine): with per-partition max-applied
  * positions, the committable frontier is their min. In production Spark
  * this collapses into the Structured Streaming checkpoint; it is kept as
  * an explicit aggregate here because it is the reference's core
  * exactly-once invariant.
  */
object Routing {

  /** Portable partition assignment for a non-negative integral pk. */
  def partitionCol(n: Int) = PortableHash.routerPartition(col("pk"), n)

  def partitionSql(n: Int): String = PortableHash.routerPartitionSql("pk", n)

  /** Partition histogram: events and distinct keys per route partition —
    * the balance check for the hash router.
    */
  def distribution(changelog: DataFrame, n: Int): DataFrame =
    changelog
      .groupBy(partitionCol(n).as("part_id"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("tbl"), col("pk")).as("n_keys"))
      .orderBy("part_id")

  /** Per-partition applied frontier + the global committable position
    * (min over partitions of max applied pos).
    */
  def offsetFrontier(changelog: DataFrame, n: Int): DataFrame =
    changelog
      .groupBy(partitionCol(n).as("part_id"))
      .agg(max(col("pos")).as("max_applied_pos"), count(lit(1)).as("n_events"))
      .withColumn("committable_pos", min(col("max_applied_pos")).over())
      .orderBy("part_id")
}
