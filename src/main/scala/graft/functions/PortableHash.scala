package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash primitives that compute the SAME value in Spark SQL
  * and in ANSI/DuckDB SQL, so every hash-based operator (router, MinHash,
  * SimHash, fingerprints) is oracle-checkable.
  *
  * We deliberately avoid Spark's `hash()` (Murmur3) and DuckDB's `hash()`
  * (different algorithm): portability comes from md5 (bit-identical
  * everywhere) plus plain 64-bit modular arithmetic on non-negative
  * operands (identical `%` semantics in both engines).
  *
  * The reference's router is `abs(hash(s"$table:$pk")) % n`
  * (reference: router/EventRouter.scala:25-32); we keep the same contract —
  * same (table, pk) always lands in the same partition — with a Knuth
  * multiplicative hash that both engines evaluate identically.
  */
object PortableHash {

  /** Mersenne prime 2^31-1: modulus for MinHash permutations. */
  val P: Long = 2147483647L

  /** Knuth's multiplicative constant (golden-ratio hash). */
  val Knuth: Long = 2654435761L

  /** 60-bit non-negative token hash from the md5 hex prefix. */
  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def tokenHashSql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** Router partition for a non-negative integral key. The key is
    * reduced mod 2^31 BEFORE the Knuth multiply: the product then stays
    * under 2^63 (no Long wrap in Spark, no BIGINT overflow error in
    * DuckDB) for any 64-bit pk — snowflake-sized ids included.
    */
  def routerPartition(key: Column, n: Int): Column =
    ((key % lit(1L << 31)) * lit(Knuth)) % lit(1L << 31) % lit(n.toLong)

  def routerPartitionSql(e: String, n: Int): String =
    s"(((($e) % ${1L << 31}) * $Knuth) % ${1L << 31}) % $n"

  /** MinHash permutation coefficients — fixed literals shared verbatim
    * between the Spark expressions and the generated oracle SQL.
    * h_i(x) = (a_i * (x % P) + b_i) % P, with a_i, b_i < P so the product
    * stays under 2^62 (no overflow in either engine).
    */
  val minhashPerms: Seq[(Long, Long)] =
    (1 to 16).map(i => ((1000003L * i + 257L) % P, (777767777L * i + 13L) % P))

  def minhashPerm(th: Column, a: Long, b: Long): Column =
    (lit(a) * (th % lit(P)) + lit(b)) % lit(P)

  def minhashPermSql(e: String, a: Long, b: Long): String =
    s"($a * (($e) % $P) + $b) % $P"

  /** Bloom-filter hash family: same (a·x+b) mod P construction as the
    * MinHash permutations but a disjoint coefficient series, so bloom
    * bits and minhash signatures stay independent.
    */
  val bloomPerms: Seq[(Long, Long)] =
    (1 to 3).map(i => ((900000011L * i + 101L) % P, (333334444L * i + 7L) % P))
}
