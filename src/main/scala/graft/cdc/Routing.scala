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

  /** GTID-SET frontier per (tbl, source uuid): the applied transactions
    * coalesced into a canonical interval string — the resumable offset
    * a multi-source stream persists ([[graft.model.LogPosition.GtidSet]]
    * semantics as a distributed plan; the typed-Aggregator counterpart is
    * [[graft.functions.GtidSetAggregator]]).
    *
    * Gaps-and-islands: within (tbl, uuid), `txn − row_number()` is
    * constant on each contiguous run, so islands fall out of one window
    * + one aggregation; the canonical string is a deterministic
    * sorted-struct fold. One explicit repartition on the frontier key
    * up front satisfies the dedup, the window AND both aggregations
    * (hash partitioning on a subset of each clustering) — the changelog
    * shuffles once.
    */
  def gtidFrontier(changelog: DataFrame, uuidCol: org.apache.spark.sql.Column,
                   txnCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("tbl"), col("uuid")).orderBy(col("txn"))
    changelog
      .select(col("tbl"), uuidCol.as("uuid"), txnCol.as("txn"))
      .repartition(col("tbl"), col("uuid"))
      .dropDuplicates("tbl", "uuid", "txn")
      .withColumn("grp", col("txn") - row_number().over(w))
      .groupBy(col("tbl"), col("uuid"), col("grp"))
      .agg(min(col("txn")).as("lo"), max(col("txn")).as("hi"))
      .groupBy(col("tbl"), col("uuid"))
      .agg(
        count(lit(1)).as("n_islands"),
        sum(col("hi") - col("lo") + 1).as("n_txns"),
        concat_ws(":", transform(
          sort_array(collect_list(struct(col("lo"), col("hi")))),
          iv => when(iv.getField("lo") === iv.getField("hi"),
            iv.getField("lo").cast("string"))
            .otherwise(concat_ws("-", iv.getField("lo").cast("string"),
              iv.getField("hi").cast("string"))))).as("intervals"))
      .select(col("tbl"), col("uuid"),
        concat_ws(":", col("uuid"), col("intervals")).as("gtid_set"),
        col("n_islands"), col("n_txns"))
      .orderBy("tbl", "uuid")
  }

  def gtidFrontierSql(clCte: String, uuidSql: String, txnSql: String): String =
    s"""WITH cl AS ($clCte),
       |d AS (SELECT DISTINCT tbl, $uuidSql AS uuid, $txnSql AS txn FROM cl),
       |g AS (
       |  SELECT tbl, uuid, txn,
       |         txn - row_number() OVER (PARTITION BY tbl, uuid ORDER BY txn) AS grp
       |  FROM d),
       |islands AS (
       |  SELECT tbl, uuid, grp, min(txn) AS lo, max(txn) AS hi
       |  FROM g GROUP BY tbl, uuid, grp)
       |SELECT tbl, uuid,
       |  uuid || ':' || string_agg(
       |    CASE WHEN lo = hi THEN CAST(lo AS VARCHAR)
       |         ELSE CAST(lo AS VARCHAR) || '-' || CAST(hi AS VARCHAR) END,
       |    ':' ORDER BY lo) AS gtid_set,
       |  count(*) AS n_islands,
       |  CAST(sum(hi - lo + 1) AS BIGINT) AS n_txns
       |FROM islands GROUP BY tbl, uuid ORDER BY tbl, uuid""".stripMargin
}
