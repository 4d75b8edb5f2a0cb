package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DDL detection / classification side-stream.
  *
  * The reference regex-classifies QUERY binlog events into DDL types and
  * extracts the target table (reference: ddl/DDLHandler.scala:108-194;
  * coarse gate MySQLBinlogReader.scala:307-314). Detection only — no
  * schema sync — so the Spark version is a pure projection of
  * `regexp_extract` columns suitable for a filtered side-output of the
  * main stream.
  */
object DdlClassifier {

  /** (type, anchored-prefix regex to detect) in priority order. */
  val ddlTypes: Seq[(String, String)] = Seq(
    "CREATE_TABLE" -> "^\\s*CREATE\\s+TABLE",
    "ALTER_TABLE" -> "^\\s*ALTER\\s+TABLE",
    "DROP_TABLE" -> "^\\s*DROP\\s+TABLE",
    "TRUNCATE_TABLE" -> "^\\s*TRUNCATE\\s+TABLE",
    "RENAME_TABLE" -> "^\\s*RENAME\\s+TABLE",
    "CREATE_INDEX" -> "^\\s*CREATE\\s+(UNIQUE\\s+)?INDEX",
    "DROP_INDEX" -> "^\\s*DROP\\s+INDEX"
  )

  /** Classify an upper-cased SQL column into a DDL type (or OTHER). */
  def classify(sqlText: Column): Column = {
    val up = upper(sqlText)
    ddlTypes.foldRight(lit("OTHER"): Column) { case ((name, rx), acc) =>
      when(up.rlike(rx), name).otherwise(acc)
    }
  }

  /** Regex pulling the `db.table` (or bare table) a statement targets. */
  val targetRx: String =
    "(?:CREATE|ALTER|DROP|TRUNCATE|RENAME)\\s+TABLE\\s+(?:IF\\s+(?:NOT\\s+)?EXISTS\\s+)?`?([A-Z0-9_.]+)`?"

  /** Extract the `db.table` (or bare table) that the statement targets. */
  def extractTable(sqlText: Column): Column =
    regexp_extract(upper(sqlText), targetRx, 1)

  /** Fixed statement corpus used by the oracle-checked query — the
    * harness has no live DDL stream, so classification runs over a
    * deterministic VALUES list present in both engines.
    */
  val corpus: Seq[(Int, String)] = Seq(
    1 -> "CREATE TABLE db1.users (id INT PRIMARY KEY)",
    2 -> "alter table orders add column note varchar(32)",
    3 -> "DROP TABLE IF EXISTS tmp_stage",
    4 -> "TRUNCATE TABLE audit_log",
    5 -> "RENAME TABLE a TO b",
    6 -> "CREATE UNIQUE INDEX idx_u ON users (email)",
    7 -> "DROP INDEX idx_u ON users",
    8 -> "INSERT INTO users VALUES (1)",
    9 -> "UPDATE users SET name = 'x' WHERE id = 1",
    10 -> "SELECT * FROM users"
  )

  def classifyCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    corpus.toDF("stmt_id", "stmt")
      .select(col("stmt_id"), classify(col("stmt")).as("ddl_type"),
        extractTable(col("stmt")).as("target"))
      .orderBy("stmt_id")
  }

  /** DDL statistics: groupBy type over bounded history (reference
    * ddl/DDLHandler.scala:297-314, A7 in SURVEY.md §2.5).
    */
  def ddlStats(spark: SparkSession): DataFrame =
    classifyCorpus(spark)
      .groupBy(col("ddl_type"))
      .agg(count(lit(1)).as("n_statements"),
        count_distinct(col("target")).as("n_targets"))
      .orderBy("ddl_type")

  def ddlStatsSql: String =
    s"""WITH classified AS ($corpusSql)
       |SELECT ddl_type, count(*) AS n_statements,
       |       count(DISTINCT target) AS n_targets
       |FROM classified GROUP BY ddl_type ORDER BY ddl_type""".stripMargin

  /** DuckDB oracle for [[classifyCorpus]]. */
  def corpusSql: String = {
    val values = corpus.map { case (i, s) => s"($i, '${s.replace("'", "''")}')" }.mkString(", ")
    val cases = ddlTypes.map { case (name, rx) =>
      s"WHEN regexp_matches(upper(stmt), '$rx') THEN '$name'"
    }.mkString(" ")
    s"""WITH stmts(stmt_id, stmt) AS (VALUES $values)
       |SELECT stmt_id,
       |  CASE $cases ELSE 'OTHER' END AS ddl_type,
       |  coalesce(regexp_extract(upper(stmt), '$targetRx', 1), '') AS target
       |FROM stmts ORDER BY stmt_id""".stripMargin
  }
}
