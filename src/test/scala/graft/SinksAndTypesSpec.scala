package graft

import graft.model.TypeMapper
import graft.sinks.{MySqlDialect, ParquetKeyedSink, StarRocksDialect}
import org.apache.spark.sql.types._

class SinksAndTypesSpec extends SparkSpec {

  import spark.implicits._

  test("MySQL upsert SQL matches ON DUPLICATE KEY shape") {
    val sql = MySqlDialect.insertSql("users", Seq("id", "name"))
    assert(sql == "INSERT INTO `users` (`id`, `name`) VALUES (?, ?) " +
      "ON DUPLICATE KEY UPDATE `id` = VALUES(`id`), `name` = VALUES(`name`)")
    assert(MySqlDialect.updateSql("users", Seq("id", "name"), Seq("id")) ==
      "UPDATE `users` SET `name` = ? WHERE `id` = ?")
    assert(MySqlDialect.deleteSql("users", Seq("id")) == "DELETE FROM `users` WHERE `id` = ?")
  }

  test("StarRocks upsert is a plain INSERT (PK-model table)") {
    assert(StarRocksDialect.insertSql("users", Seq("id", "v")) ==
      "INSERT INTO `users` (`id`, `v`) VALUES (?, ?)")
  }

  test("parquet keyed merge: upsert overrides, delete removes, others survive") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("pk", "value")
    val delta = Seq((2L, "U", 21.0), (3L, "D", 0.0), (4L, "I", 40.0)).toDF("pk", "op", "value")
    val got = ParquetKeyedSink.merged(base, delta, Seq("pk"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 21.0, 4L -> 40.0))
  }

  test("parquet keyed merge applied twice with same delta is idempotent") {
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("pk", "value")
    val delta = Seq((2L, "U", 21.0)).toDF("pk", "op", "value")
    val once = ParquetKeyedSink.merged(base, delta, Seq("pk"))
    val twice = ParquetKeyedSink.merged(once.select("pk", "value"), delta, Seq("pk"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("MySQL native strings parse to Spark types (SURVEY §1.2 table)") {
    assert(TypeMapper.fromMySql("tinyint(1)") == BooleanType)
    assert(TypeMapper.fromMySql("TINYINT") == ByteType)
    assert(TypeMapper.fromMySql("smallint") == ShortType)
    assert(TypeMapper.fromMySql("mediumint") == IntegerType)
    assert(TypeMapper.fromMySql("int(11) unsigned") == IntegerType)
    assert(TypeMapper.fromMySql("bigint(20)") == LongType)
    assert(TypeMapper.fromMySql("decimal(12,3)") == DecimalType(12, 3))
    assert(TypeMapper.fromMySql("varchar(255)") == StringType)
    assert(TypeMapper.fromMySql("datetime") == TimestampType)
    assert(TypeMapper.fromMySql("date") == DateType)
    assert(TypeMapper.fromMySql("json") == StringType)
    assert(TypeMapper.fromMySql("blob") == BinaryType)
    assert(TypeMapper.fromMySql("geometry") == StringType) // unknown → fallback
  }

  test("StarRocks DDL sizes decimals by precision; complex types → JSON") {
    assert(TypeMapper.toStarRocks(DecimalType(8, 2)) == "DECIMAL32(8,2)")
    assert(TypeMapper.toStarRocks(DecimalType(16, 4)) == "DECIMAL64(16,4)")
    assert(TypeMapper.toStarRocks(DecimalType(30, 6)) == "DECIMAL128(30,6)")
    assert(TypeMapper.toStarRocks(ArrayType(IntegerType)) == "JSON")
    assert(TypeMapper.toMySql(TimestampType) == "DATETIME(6)")
  }

  test("type category compatibility: int widens to num, str≠bin") {
    assert(TypeMapper.compatible(IntegerType, LongType))
    assert(TypeMapper.compatible(IntegerType, DoubleType))
    assert(!TypeMapper.compatible(DoubleType, IntegerType) || TypeMapper.compatible(DoubleType, DecimalType(10, 2)))
    assert(!TypeMapper.compatible(StringType, BinaryType))
  }
}
