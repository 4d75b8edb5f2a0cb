package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-safe replacement for the partitionless ranking window.
  *
  * `Window.orderBy(...)` with no partition moves EVERY row to one task
  * (Spark warns exactly this at plan time) — fine over a decile/bin
  * census, a single-task sort over a data-grained frame (|users| at the
  * design scale is 1e8–1e9). The device here is the classic two-pass
  * distributed rank, with ONE exchange and ZERO WindowExec nodes:
  *
  *  1. `repartitionByRange(width, order)` splits the total order into
  *     `width` contiguous key ranges (ties land in one partition —
  *     RangePartitioner bounds are key values, and the explicit
  *     partition count pins the width against AQE's small-input
  *     one-partition collapse, the round-11 lesson);
  *  2. `sortWithinPartitions(order)` + `monotonically_increasing_id`
  *     arithmetic stamps each row's (partition, ordinal) — the id is
  *     partitionIndex·2^33 + rowIndex, so both come back by bit math
  *     with no window; running sums, when asked for, ride the sorted
  *     partitions in one `mapPartitions` pass (the genuinely
  *     sequential per-partition step — nothing declarative expresses
  *     "running total without a global window");
  *  3. the per-partition row counts / input sums (a `width`-bounded
  *     table) come back as the TASK RESULTS of the one `runJob` that
  *     materializes the persist — fused, not a separate aggregate job —
  *     and become literal offsets added to the within-partition values:
  *     the "broadcast offsets" half of the two-pass rank, as driver
  *     literals because the offsets table is `width`-bounded by
  *     construction.
  *
  * The stamped frame is persisted (and registered with [[Caches]]):
  * the offsets pass and the main query must observe the SAME range
  * split, and one materialization is cheaper than two sorts anyway.
  * Everything is deterministic under recomputation — range bounds are
  * sampled with per-partition-index seeds, the sort is total — but the
  * persist removes even that dependency for the common case.
  *
  * Requirements: `order` must be a TOTAL order (unique tiebreaker
  * last), running-sum inputs must be non-null LONG/INT/DECIMAL columns.
  */
object Ranks {
  /** Per-partition (row count, raw sums of `names`) of `p`, gathered as
    * the TASK RESULTS of the one job that also materializes `p`'s
    * persist — see the fused-offsets note in [[overGlobalOrder]]. */
  private def partitionStats(p: DataFrame,
      names: Seq[String]): Array[(Long, Array[java.math.BigDecimal])] = {
    val pSchema = p.schema
    val sumIdx = names.map(pSchema.fieldIndex).toArray
    // 0 = LONG, 1 = INT, else decimal with packed (precision, scale)
    val sumTag: Array[Int] = names.map { nm =>
      pSchema(nm).dataType match {
        case LongType => 0
        case IntegerType => 1
        case d: DecimalType => (d.precision << 8) | d.scale
        case other => throw new IllegalStateException(s"unexpected sum input type $other")
      }
    }.toArray
    p.sparkSession.sparkContext.runJob(p.queryExecution.toRdd,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        var n = 0L
        val s = Array.fill(sumIdx.length)(java.math.BigDecimal.ZERO)
        while (it.hasNext) {
          val r = it.next(); n += 1
          var i = 0
          while (i < sumIdx.length) {
            if (!r.isNullAt(sumIdx(i))) {
              val add = sumTag(i) match {
                case 0 => java.math.BigDecimal.valueOf(r.getLong(sumIdx(i)))
                case 1 => java.math.BigDecimal.valueOf(r.getInt(sumIdx(i)).toLong)
                case ps => r.getDecimal(sumIdx(i), ps >> 8, ps & 0xff).toJavaBigDecimal
              }
              s(i) = s(i).add(add)
            }
            i += 1
          }
        }
        (n, s)
      })
  }

  private val MID = "_grank_mid"
  private val PID = "_grank_pid"
  private val RNW = "_grank_rnw"
  private val RANK = "_grank_rank"
  private def inName(nm: String) = s"_grank_in_$nm"

  /** `df` plus, all over the one shared device pass:
    *  - `rankCol`: global 1-based row_number over `order` (LONG);
    *  - `ntileCol = (n, name)`: NTILE(n) over `order` (LONG), bucket
    *    arithmetic identical to Spark/DuckDB (first `rows % n` buckets
    *    take one extra row);
    *  - `cumSums`: running sum of each input over `order`, current row
    *    INCLUSIVE (ROWS frame; subtract the input for the exclusive
    *    form) — LONG/INT in, LONG out; DECIMAL(p,s) in, DECIMAL(38,s)
    *    out;
    *  - `totals`: whole-frame sum of each input as a LITERAL column
    *    (free — the offsets collect already carries the grand total);
    *  - `countCol`: whole-frame row count as a LITERAL column.
    */
  def overGlobalOrder(
      df: DataFrame,
      order: Seq[Column],
      rankCol: Option[String] = None,
      ntileCol: Option[(Int, String)] = None,
      cumSums: Seq[(String, Column)] = Nil,
      totals: Seq[(String, Column)] = Nil,
      countCol: Option[String] = None,
      width: Int = 0): DataFrame = {
    val w = if (width > 0) width
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val keep = df.columns.toSeq
    val sumIns = cumSums ++ totals
    // bind sum inputs to names BEFORE the shuffle so mapPartitions and
    // the offsets aggregate read plain fields
    val base = df.select(keep.map(col) ++ sumIns.map { case (nm, c) => c.as(inName(nm)) }: _*)
    val isLongSum: Map[String, Boolean] = sumIns.map { case (nm, _) =>
      nm -> (base.schema(inName(nm)).dataType match {
        case LongType | IntegerType => true
        case _: DecimalType => false
        case other => throw new IllegalArgumentException(
          s"sum over $other not supported (LONG/INT/DECIMAL only)")
      })
    }.toMap
    // the id is minted ONCE per row (two independent calls would each
    // keep their own per-partition counter — same values today, but the
    // derivation must not depend on that)
    val ranged = base
      .repartitionByRange(w, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(MID, monotonically_increasing_id())
      .withColumn(PID, shiftright(col(MID), 33).cast("int"))
      .withColumn(RNW, col(MID).bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop(MID)

    // one sequential pass per sorted partition for the running sums
    val cumFields = cumSums.map { case (nm, _) =>
      if (isLongSum(nm)) StructField(nm, LongType)
      else StructField(nm,
        DecimalType(38, base.schema(inName(nm)).dataType.asInstanceOf[DecimalType].scale))
    }
    val stamped = if (cumSums.isEmpty) ranged else {
      val schemaOut = StructType(ranged.schema.fields ++ cumFields)
      val idx = cumSums.map { case (nm, _) => ranged.schema.fieldIndex(inName(nm)) }.toArray
      val isDec = cumSums.map { case (nm, _) => !isLongSum(nm) }.toArray
      ranged.mapPartitions { it =>
        val accL = Array.fill(idx.length)(0L)
        val accD = Array.fill[java.math.BigDecimal](idx.length)(java.math.BigDecimal.ZERO)
        it.map { r =>
          val extra = new Array[Any](idx.length)
          var i = 0
          while (i < idx.length) {
            if (!r.isNullAt(idx(i))) {
              if (isDec(i)) accD(i) = accD(i).add(r.getDecimal(idx(i)))
              else accL(i) += (r.get(idx(i)) match {
                case l: java.lang.Long => l.longValue
                case n: java.lang.Integer => n.longValue
                case other => throw new IllegalStateException(s"unexpected sum input $other")
              })
            }
            extra(i) = if (isDec(i)) accD(i) else accL(i)
            i += 1
          }
          Row.fromSeq(r.toSeq ++ extra)
        }
      }(Encoders.row(schemaOut))
    }
    // AQE stays ON for the device build even though each shuffle stage
    // materializes as its own job: the range split's SAMPLING pass runs
    // over the child RDD, and under AQE that child is the materialized
    // shuffle-stage output (shuffle files) — with AQE off the sampler
    // re-executes the whole upstream lineage (scan + aggregations) a
    // second time, which measured ~2x worse than the stage jobs it
    // saved (round-13; don't repeat the experiment).
    val persisted = Caches.tracked(stamped.persist())
    val stats = partitionStats(persisted, sumIns.map(x => inName(x._1)))
    // Fused into the materialization (round-12 directive #3): ONE runJob
    // over the cached plan's RDD both populates the persist AND returns
    // each partition's (row count, raw-input sums) as its TASK RESULT —
    // the separate groupBy(PID) job (its shuffle stage + collect) is
    // gone. Task results are exactly-once per partition (the successful
    // attempt's value), so there is no accumulator retry/double-count
    // hazard, and the physical partition index of the result array IS
    // the PID (monotonically_increasing_id stamps the same index, with
    // no shuffle between the stamp and the cache).
    var rows = 0L
    var rankOffs = Vector.empty[(Int, Long)]
    val sumAcc = scala.collection.mutable.LinkedHashMap[String, java.math.BigDecimal]()
    val cumOffs = scala.collection.mutable.LinkedHashMap[String, Vector[(Int, java.math.BigDecimal)]]()
    sumIns.foreach { case (nm, _) =>
      sumAcc(nm) = java.math.BigDecimal.ZERO; cumOffs(nm) = Vector.empty }
    stats.zipWithIndex.foreach { case ((n, totalsHere), pid) =>
      if (n > 0) { // empty range partitions carry no rows — keep the when-chain short
        rankOffs :+= (pid -> rows)
        sumIns.zipWithIndex.foreach { case ((nm, _), i) =>
          cumOffs(nm) :+= (pid -> sumAcc(nm))
          sumAcc(nm) = sumAcc(nm).add(totalsHere(i))
        }
      }
      rows += n
    }

    def sumLit(nm: String, v: java.math.BigDecimal): Column =
      if (isLongSum(nm)) lit(v.longValueExact) else lit(v)
    def chain(pairs: Seq[(Int, Column)], zero: Column): Column =
      pairs.foldLeft(zero) { case (acc, (pid, v)) =>
        when(col(PID) === lit(pid), v).otherwise(acc) }

    var out = persisted
    val needRank = rankCol.isDefined || ntileCol.isDefined
    if (needRank)
      out = out.withColumn(RANK,
        col(RNW) + chain(rankOffs.map { case (p, o) => p -> lit(o) }, lit(0L)))
    rankCol.foreach { rc => out = out.withColumn(rc, col(RANK)) }
    ntileCol.foreach { case (n, nc) =>
      require(n >= 1, s"ntile buckets must be >= 1: $n")
      // Spark/DuckDB NTILE: q = rows/n per bucket, the first r = rows%n
      // buckets take one extra; cut = (q+1)·r ends the padded prefix.
      // q = 0 (rows < n) degenerates to bucket = rank, which the first
      // branch covers since cut = rows. Integer DIV keeps it exact at
      // any scale (no double-division floor hazard).
      val q = rows / n; val r = rows % n; val cut = (q + 1) * r
      val bucket =
        if (q == 0) col(RANK)
        else when(col(RANK) <= lit(cut), expr(s"($RANK - 1) DIV ${q + 1} + 1"))
          .otherwise(expr(s"$r + ($RANK - $cut - 1) DIV $q + 1"))
      out = out.withColumn(nc, bucket.cast("long"))
    }
    cumSums.foreach { case (nm, _) =>
      out = out.withColumn(nm,
        col(nm) + chain(cumOffs(nm).map { case (p, v) => p -> sumLit(nm, v) },
          sumLit(nm, java.math.BigDecimal.ZERO)))
    }
    totals.foreach { case (nm, _) => out = out.withColumn(nm, sumLit(nm, sumAcc(nm))) }
    countCol.foreach { cc => out = out.withColumn(cc, lit(rows)) }
    out.drop(PID, RNW, RANK).drop(sumIns.map(p => inName(p._1)): _*)
  }
}
