package graft

import graft.cdc.{SchemaEvolution, SchemaRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DDL statements fold into registry versions; decode under the evolved
  * schema is forward-compatible (pre-ALTER payloads read back with new
  * columns null).
  */
class SchemaEvolutionSpec extends SparkSpec {

  private val base = SchemaRegistry(Map(
    "users" -> StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))))

  test("CREATE TABLE registers a parsed column list (constraints skipped)") {
    val reg = SchemaEvolution.applyDdl(base,
      "CREATE TABLE orders (o_id BIGINT, amount DECIMAL(10,2), note varchar(32), PRIMARY KEY (o_id))")
    assert(reg.schemaFor("orders") == StructType(Seq(
      StructField("o_id", LongType),
      StructField("amount", DecimalType(10, 2)),
      StructField("note", StringType))))
  }

  test("ADD / DROP / MODIFY / CHANGE / RENAME COLUMN evolve the schema in order") {
    val reg = SchemaEvolution.replay(base, Seq(
      "ALTER TABLE users ADD COLUMN age INT",
      "ALTER TABLE users MODIFY COLUMN age BIGINT",
      "ALTER TABLE users CHANGE COLUMN name full_name TEXT",
      "ALTER TABLE users ADD COLUMN tmp DOUBLE",
      "ALTER TABLE users DROP COLUMN tmp",
      "ALTER TABLE users RENAME COLUMN age TO years"))
    assert(reg.schemaFor("users") == StructType(Seq(
      StructField("id", LongType),
      StructField("full_name", StringType),
      StructField("years", LongType))))
  }

  test("RENAME TABLE moves the schema; DROP TABLE deregisters; TRUNCATE/DML are no-ops") {
    val two = SchemaEvolution.applyDdl(base, "CREATE TABLE t2 (k INT)")
    val renamed = SchemaEvolution.applyDdl(two, "RENAME TABLE t2 TO t3")
    assert(renamed.tables == Seq("t3", "users"))
    val dropped = SchemaEvolution.applyDdl(renamed, "DROP TABLE IF EXISTS t3")
    assert(dropped.tables == Seq("users"))
    assert(SchemaEvolution.applyDdl(base, "TRUNCATE TABLE users") == base)
    assert(SchemaEvolution.applyDdl(base, "INSERT INTO users VALUES (1, 'x')") == base)
  }

  test("constraint-only ALTERs are schema no-ops, not phantom columns") {
    for (stmt <- Seq(
      "ALTER TABLE users ADD PRIMARY KEY (id)",
      "ALTER TABLE users ADD INDEX idx_name (name)",
      "ALTER TABLE users ADD CONSTRAINT uq UNIQUE (name)",
      "ALTER TABLE users ADD UNIQUE (name)",
      "ALTER TABLE users DROP PRIMARY KEY"))
      assert(SchemaEvolution.applyDdl(base, stmt) == base, stmt)
  }

  test("DDL for unregistered (out-of-scope) tables is skipped, not a crash") {
    for (stmt <- Seq(
      "ALTER TABLE other_scope ADD COLUMN x INT",
      "ALTER TABLE other_scope DROP COLUMN x",
      "RENAME TABLE other_scope TO elsewhere",
      "DROP TABLE other_scope"))
      assert(SchemaEvolution.applyDdl(base, stmt) == base, stmt)
  }

  test("decode under an evolved schema: old payloads get null for added columns") {
    import spark.implicits._
    val evolved = SchemaEvolution.applyDdl(base, "ALTER TABLE users ADD COLUMN age BIGINT")
    val envelope = Seq(
      ("users", 1L, "I", """{"id": 1, "name": "a"}"""),          // pre-ALTER image
      ("users", 2L, "I", """{"id": 2, "name": "b", "age": 30}""") // post-ALTER image
    ).toDF("tbl", "pk", "op", "payload_json")
    val got = evolved.decode(envelope).orderBy("pk")
      .select(col("pk"), col("name"), col("age"))
      .collect().map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == Seq((1L, "a", None), (2L, "b", Some(30L))))
  }

  test("random DDL sequences agree with a model interpreter (property)") {
    val types = Seq("INT" -> IntegerType, "BIGINT" -> LongType,
      "DOUBLE" -> DoubleType, "VARCHAR(32)" -> StringType, "DECIMAL(10,2)" -> DecimalType(10, 2))
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 20) {
      var model = Vector("c0" -> (IntegerType: DataType))
      var reg = SchemaRegistry(Map("t" -> StructType(Seq(StructField("c0", IntegerType)))))
      var next = 1
      for (_ <- 1 to 15) {
        val (ddl, newModel): (String, Vector[(String, DataType)]) = rnd.nextInt(4) match {
          case 0 =>
            val (ts, tt) = types(rnd.nextInt(types.size))
            val c = s"c$next"; next += 1
            (s"ALTER TABLE t ADD COLUMN $c $ts", model :+ (c -> tt))
          case 1 if model.size > 1 =>
            val (c, _) = model(rnd.nextInt(model.size))
            (s"ALTER TABLE t DROP COLUMN $c", model.filterNot(_._1 == c))
          case 2 =>
            val i = rnd.nextInt(model.size)
            val (c, t0) = model(i)
            val c2 = s"r$next"; next += 1
            (s"ALTER TABLE t RENAME COLUMN $c TO $c2", model.updated(i, c2 -> t0))
          case _ =>
            val i = rnd.nextInt(model.size)
            val (c, _) = model(i)
            val (ts, tt) = types(rnd.nextInt(types.size))
            (s"ALTER TABLE t MODIFY COLUMN $c $ts", model.updated(i, c -> tt))
        }
        model = newModel
        reg = SchemaEvolution.applyDdl(reg, ddl)
        val want = StructType(model.map { case (n, t0) => StructField(n, t0) })
        assert(reg.schemaFor("t") == want, s"trial $trial after: $ddl")
      }
    }
  }

  test("evolving decode routes each event through the registry version at its pos") {
    import spark.implicits._
    val env = Seq(
      // pre-DDL payloads carry "name"; post-DDL carry the renamed "full_name"
      ("users", 1L, "c", 10L, """{"id":1,"name":"ann"}"""),
      ("users", 2L, "c", 20L, """{"id":2,"name":"bo"}"""),
      ("users", 1L, "u", 30L, """{"id":1,"full_name":"ann b"}"""),
      ("users", 3L, "c", 40L, """{"id":3,"full_name":"cy"}"""))
      .toDF("tbl", "pk", "op", "pos", "payload_json")
    val got = SchemaEvolution.evolvingDecode(env, base,
      Seq("ALTER TABLE users RENAME COLUMN name TO full_name"), boundary = 30L)
      .withColumn("who", coalesce(col("full_name"), col("name")))
      .collect().map(r => r.getAs[Long]("pos") -> r.getAs[String]("who")).toMap
    // every event decodes its name under ITS schema version — none null
    assert(got == Map(10L -> "ann", 20L -> "bo", 30L -> "ann b", 40L -> "cy"))
    // the naive final-schema-only decode loses the pre-DDL names
    val naive = SchemaEvolution.replay(base,
      Seq("ALTER TABLE users RENAME COLUMN name TO full_name")).decode(env)
      .collect().map(r => r.getAs[Long]("pos") -> r.getAs[String]("full_name")).toMap
    assert(naive(10L) == null && naive(30L) == "ann b")
  }

  test("registry evolution composes with the DDL classifier's corpus") {
    // every statement in the classifier's fixed corpus folds without error
    val start = SchemaEvolution.replay(base, Seq(
      "CREATE TABLE db1.users (id INT PRIMARY KEY)",
      "CREATE TABLE orders (id INT)", "CREATE TABLE tmp_stage (id INT)",
      "CREATE TABLE audit_log (id INT)", "CREATE TABLE a (id INT)"))
    val end = SchemaEvolution.replay(start, graft.cdc.DdlClassifier.corpus.map(_._2))
    // alter added `note`; rename moved a→b; drop removed tmp_stage
    assert(end.schemaFor("orders").fieldNames.contains("note"))
    assert(end.tables.contains("b") && !end.tables.contains("a"))
    assert(!end.tables.contains("tmp_stage"))
  }
}
