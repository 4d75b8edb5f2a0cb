package graft

import graft.ops.Salting
import org.apache.spark.sql.functions._

/** Salted join/agg must be RESULT-identical to the plain formulation —
  * salting changes the shuffle layout, never the answer.
  */
class SaltingSpec extends SparkSpec {

  import spark.implicits._

  // 90% of rows on one hot key
  private def skewed = (0L until 20000L)
    .map(i => (if (i % 10 < 9) "hot" else s"k${i % 7}", i))
    .toDF("key", "v")

  private def dim = Seq(("hot", 1.0), ("k1", 2.0), ("k2", 3.0), ("k3", 4.0))
    .toDF("key", "w")

  test("salted inner join == plain inner join") {
    val plain = skewed.join(dim, "key")
      .agg(count(lit(1)), sum(col("v") * col("w"))).head()
    val salted = Salting.saltedJoin(skewed, dim, "key", 16)
      .agg(count(lit(1)), sum(col("v") * col("w"))).head()
    assert(salted == plain)
  }

  test("salted left join preserves unmatched skewed rows") {
    val plain = skewed.join(dim, Seq("key"), "left")
      .agg(count(lit(1)), count(col("w"))).head()
    val salted = Salting.saltedJoin(skewed, dim, "key", 8, "left")
      .agg(count(lit(1)), count(col("w"))).head()
    assert(salted == plain)
  }

  test("salted join handles duplicate keys on the small side") {
    val dupDim = dim.unionAll(Seq(("hot", 9.0)).toDF("key", "w"))
    val plain = skewed.join(dupDim, "key").count()
    val salted = Salting.saltedJoin(skewed, dupDim, "key", 4).count()
    assert(salted == plain)
  }

  test("salted count-distinct == exact count-distinct") {
    val df = (0L until 5000L).map(i => ("g" + (i % 3), i % 997)).toDF("key", "u")
    val plain = df.groupBy("key").agg(count_distinct(col("u")).as("n_distinct"))
      .as[(String, Long)].collect().toMap
    val salted = Salting.saltedCountDistinct(df, "key", "u", 16)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}
