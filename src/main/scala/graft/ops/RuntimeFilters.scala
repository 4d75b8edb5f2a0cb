package graft.ops

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the runtime-filter device every
  * warehouse engine injects under selective joins (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` does this invisibly; here
  * it is an explicit, auditable operator with the false-positive ledger
  * a capacity planner wants).
  *
  * The build side (urgent orders) is reduced to a constant-size bit
  * array — 2^20 bits in 32-bit words inside BIGINTs, built by one
  * partial-merged `bit_or` aggregate — and broadcast; the probe side
  * streams its DISTINCT join keys through the filter, and only
  * bloom-passing keys (true matches + quantified false passes) continue
  * to the exact join. At 100 TB the probe side never shuffles on the
  * join key until after the filter has discarded the non-matching bulk;
  * the filter itself is ≤ 32768 words regardless of data volume.
  *
  * Hashing is the portable (a·x+b) mod P family ([[PortableHash]]) so
  * the DuckDB oracle rebuilds the identical filter bit-for-bit —
  * including its false positives.
  */
object RuntimeFilters {

  private val bloomBits = 1048576L // 2^20
  private val wordBits = 32 // shifts never reach the BIGINT sign bit

  /** One-row audit: key volumes before/after the bloom pass, false
    * passes, and the final exact revenue (identical to the unfiltered
    * join by construction — false passes die in the exact join).
    */
  def bloomSemiJoin(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    import PortableHash.{bloomPerms, minhashPerm}
    val keyHash = (c: org.apache.spark.sql.Column) =>
      PortableHash.tokenHash(c.cast("string"))
    val idxArr = (h: org.apache.spark.sql.Column) => array(bloomPerms.map { case (a, b) =>
      minhashPerm(h, a, b) % lit(bloomBits)
    }: _*)

    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = urgent
      .select(explode(idxArr(keyHash(col("o_orderkey")))).as("idx"))
      .select(expr(s"idx div $wordBits").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(idx % $wordBits AS INT))").as("mask"))
      .groupBy(col("word")).agg(expr("bit_or(mask)").as("w"))

    val probeKeys = lineitem.select(col("l_orderkey")).distinct()
    val passKeys = probeKeys
      .select(col("l_orderkey"), explode(idxArr(keyHash(col("l_orderkey")))).as("idx"))
      .join(broadcast(bloom), expr(s"idx div $wordBits") === col("word"))
      .filter(expr(s"(w & shiftleft(CAST(1 AS BIGINT), CAST(idx % $wordBits AS INT))) <> 0"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_set"))
      .filter(col("n_set") === bloomPerms.size)
      .select(col("l_orderkey"))
    val pass = Caches.tracked(passKeys.persist())

    val trueKeys = pass.join(urgent, col("l_orderkey") === col("o_orderkey"))
    val revenue = lineitem
      .join(pass, Seq("l_orderkey"), "left_semi") // the pruning the filter buys
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        .as("urgent_revenue"))

    val counts = probeKeys.agg(count(lit(1)).as("n_probe_keys"))
      .crossJoin(broadcast(pass.agg(count(lit(1)).as("n_bloom_pass"))))
      .crossJoin(broadcast(trueKeys.agg(count(lit(1)).as("n_true_keys"))))
    counts.crossJoin(broadcast(revenue))
      .select(col("n_probe_keys"), col("n_bloom_pass"), col("n_true_keys"),
        (col("n_bloom_pass") - col("n_true_keys")).as("n_false_pass"),
        col("urgent_revenue"))
  }

  /** Oracle SQL for [[bloomSemiJoin]] — rebuilds the identical filter. */
  def bloomSemiJoinSql: String = {
    import PortableHash.{bloomPerms, minhashPermSql}
    def idxs(h: String) = bloomPerms.map { case (a, b) =>
      s"(${minhashPermSql(h, a, b)}) % $bloomBits"
    }.mkString(", ")
    val oh = PortableHash.tokenHashSql("CAST(o_orderkey AS VARCHAR)")
    val lh = PortableHash.tokenHashSql("CAST(l_orderkey AS VARCHAR)")
    s"""WITH urgent AS (
       |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
       |member AS (SELECT unnest([${idxs(oh)}]) AS idx FROM urgent),
       |bloom AS (
       |  SELECT idx // $wordBits AS word,
       |         bit_or(CAST(1 AS BIGINT) << CAST(idx % $wordBits AS INTEGER)) AS w
       |  FROM member GROUP BY 1),
       |probe_keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
       |probe AS (
       |  SELECT l_orderkey, unnest([${idxs(lh)}]) AS idx FROM probe_keys),
       |pass AS (
       |  SELECT p.l_orderkey
       |  FROM probe p JOIN bloom b ON p.idx // $wordBits = b.word
       |  WHERE (b.w & (CAST(1 AS BIGINT) << CAST(p.idx % $wordBits AS INTEGER))) <> 0
       |  GROUP BY p.l_orderkey HAVING count(*) = ${bloomPerms.size}),
       |true_keys AS (
       |  SELECT pass.l_orderkey FROM pass JOIN urgent ON l_orderkey = o_orderkey),
       |rev AS (
       |  SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS urgent_revenue
       |  FROM lineitem JOIN urgent ON l_orderkey = o_orderkey
       |  WHERE l_orderkey IN (SELECT l_orderkey FROM pass))
       |SELECT (SELECT count(*) FROM probe_keys) AS n_probe_keys,
       |       (SELECT count(*) FROM pass) AS n_bloom_pass,
       |       (SELECT count(*) FROM true_keys) AS n_true_keys,
       |       (SELECT count(*) FROM pass) - (SELECT count(*) FROM true_keys) AS n_false_pass,
       |       (SELECT urgent_revenue FROM rev) AS urgent_revenue""".stripMargin
  }

  /** Bloom false-positive CALIBRATION sweep: the same portable filter
    * built at several sizes m, probed with keys PROVABLY absent from
    * the build set (non-urgent orderkeys — disjoint by construction, no
    * anti-join needed), so every pass is a false positive and the
    * measured fp_ppm is the exact empirical FPR per size. The companion
    * `load_ppm = k·n·10⁶ DIV m` (hash-insertions per bit) is the design
    * knob the curve is read against — no e^{-kn/m} theory term, nothing
    * transcendental (measured vs design-load, both exact integers).
    *
    * Scale shape: the [[graft.ops.Dedup]] band-sweep fold — ONE exploded
    * (m, idx) frame builds every size's filter in one grouped bit_or;
    * probes join the broadcast word table on (m, word). Filter bits are
    * size-capped; probe volume is |keys|·k·|sizes|, linear.
    */
  def bloomFprSweep(orders: DataFrame, sizes: Seq[Long]): DataFrame = {
    import PortableHash.{bloomPerms, minhashPerm}
    require(sizes.nonEmpty && sizes.forall(m => m >= 64 && m % wordBits == 0),
      s"bad sizes: $sizes")
    val spark = orders.sparkSession
    import spark.implicits._
    val keyHash = (c: org.apache.spark.sql.Column) =>
      PortableHash.tokenHash(c.cast("string"))
    val mdf = broadcast(sizes.toDF("m"))
    val permArr = (h: org.apache.spark.sql.Column) => array(bloomPerms.map {
      case (a, b) => minhashPerm(h, a, b)
    }: _*)

    val members = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = members
      .select(explode(permArr(keyHash(col("o_orderkey")))).as("p"))
      .crossJoin(mdf)
      .select(col("m"), (col("p") % col("m")).as("idx"))
      .select(col("m"), expr(s"idx div $wordBits").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(idx % $wordBits AS INT))").as("mask"))
      .groupBy(col("m"), col("word")).agg(expr("bit_or(mask)").as("w"))
    val nMembers = broadcast(members.agg(count(lit(1)).as("n_members")))

    val probes = orders.filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_orderkey"))
    val falsePass = probes
      .select(col("o_orderkey"), explode(permArr(keyHash(col("o_orderkey")))).as("p"))
      .crossJoin(mdf)
      .select(col("m"), col("o_orderkey"), (col("p") % col("m")).as("idx"))
      .withColumn("word", expr(s"idx div $wordBits"))
      .join(broadcast(bloom), Seq("m", "word"))
      .filter(expr(s"(w & shiftleft(CAST(1 AS BIGINT), CAST(idx % $wordBits AS INT))) <> 0"))
      .groupBy(col("m"), col("o_orderkey"))
      .agg(count(lit(1)).as("n_set"))
      .filter(col("n_set") === bloomPerms.size)
      .groupBy(col("m")).agg(count(lit(1)).as("n_false_pass"))

    val nProbes = broadcast(probes.agg(count(lit(1)).as("n_probes")))
    mdf.join(falsePass, Seq("m"), "left")
      .crossJoin(nMembers).crossJoin(nProbes)
      .select(col("m").as("m_bits"), col("n_members"), col("n_probes"),
        lit(bloomPerms.size.toLong).as("k_hashes"),
        expr(s"CAST((${bloomPerms.size} * n_members * 1000000) DIV m AS BIGINT)")
          .as("load_ppm"),
        coalesce(col("n_false_pass"), lit(0L)).as("n_false_pass"),
        expr("CAST((1000000 * coalesce(n_false_pass, 0)) DIV n_probes AS BIGINT)")
          .as("fp_ppm"))
      .orderBy("m_bits")
  }

  def bloomFprSweepSql(sizes: Seq[Long]): String = {
    import PortableHash.{bloomPerms, minhashPermSql}
    val oh = PortableHash.tokenHashSql("CAST(o_orderkey AS VARCHAR)")
    val perms = bloomPerms.map { case (a, b) => minhashPermSql("h", a, b) }
      .mkString(", ")
    s"""WITH sizes AS (SELECT unnest([${sizes.mkString(", ")}]) AS m),
       |members AS (
       |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
       |mh AS (SELECT $oh AS h FROM members),
       |mperm AS (SELECT unnest([$perms]) AS p FROM mh),
       |bloom AS (
       |  SELECT m, (p % m) // $wordBits AS word,
       |         bit_or(CAST(1 AS BIGINT) << CAST((p % m) % $wordBits AS INTEGER)) AS w
       |  FROM mperm CROSS JOIN sizes GROUP BY 1, 2),
       |probes AS (
       |  SELECT o_orderkey FROM orders WHERE o_orderpriority <> '1-URGENT'),
       |ph AS (SELECT o_orderkey, $oh AS h FROM probes),
       |pperm AS (SELECT o_orderkey, unnest([$perms]) AS p FROM ph),
       |hits AS (
       |  SELECT s.m, pp.o_orderkey
       |  FROM pperm pp CROSS JOIN sizes s
       |  JOIN bloom b ON b.m = s.m AND b.word = (pp.p % s.m) // $wordBits
       |  WHERE (b.w & (CAST(1 AS BIGINT) << CAST((pp.p % s.m) % $wordBits AS INTEGER))) <> 0
       |  GROUP BY s.m, pp.o_orderkey HAVING count(*) = ${bloomPerms.size}),
       |fp AS (SELECT m, count(*) AS n_false_pass FROM hits GROUP BY m),
       |tot AS (
       |  SELECT (SELECT count(*) FROM members) AS n_members,
       |         (SELECT count(*) FROM probes) AS n_probes)
       |SELECT CAST(s.m AS BIGINT) AS m_bits,
       |       CAST(t.n_members AS BIGINT) AS n_members,
       |       CAST(t.n_probes AS BIGINT) AS n_probes,
       |       CAST(${bloomPerms.size} AS BIGINT) AS k_hashes,
       |       CAST((${bloomPerms.size} * t.n_members * 1000000) // s.m AS BIGINT) AS load_ppm,
       |       CAST(coalesce(fp.n_false_pass, 0) AS BIGINT) AS n_false_pass,
       |       CAST((1000000 * coalesce(fp.n_false_pass, 0)) // t.n_probes AS BIGINT) AS fp_ppm
       |FROM sizes s LEFT JOIN fp ON fp.m = s.m CROSS JOIN tot t
       |ORDER BY m_bits""".stripMargin
  }
}
