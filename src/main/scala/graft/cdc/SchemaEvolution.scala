package graft.cdc

import graft.model.TypeMapper
import org.apache.spark.sql.types._

/** Schema evolution: DDL events fold into [[SchemaRegistry]] updates, so
  * the typed decode tracks the table's shape over the changelog's
  * lifetime.
  *
  * The reference classifies DDL but stops at detection — its schema cache
  * is only refreshed by re-querying information_schema
  * (reference: ddl/DDLHandler.scala:108-194 classification;
  * normalizer/MySQLEventNormalizer.scala:164-171 cache miss → blocking
  * re-discovery). Here the DDL statement itself IS the schema delta: an
  * ALTER arriving in the stream produces the next registry version
  * without a source round-trip, and `from_json` under the evolved schema
  * gives the standard forward-compat decode (payloads written before an
  * ADD COLUMN read back with the new column null).
  *
  * Supported MySQL-dialect subset (column types via
  * [[graft.model.TypeMapper.fromMySql]]):
  * CREATE TABLE (column list), ALTER TABLE ADD/DROP/MODIFY COLUMN,
  * ALTER TABLE CHANGE (rename+retype), ALTER TABLE RENAME COLUMN,
  * RENAME TABLE, DROP TABLE, TRUNCATE (schema no-op).
  */
object SchemaEvolution {

  private def clean(ident: String): String =
    ident.replace("`", "").split('.').last

  private val CreateRx =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([`\w.]+)\s*\((.*)\)\s*[^)]*""".r
  // single-action ALTERs only: a multi-action statement's comma would be
  // ambiguous against type-level commas (DECIMAL(10,2))
  private val AddColRx =
    """(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+ADD\s+(?:COLUMN\s+)?([`\w]+)\s+(.+?)\s*""".r
  private val DropColRx =
    """(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+DROP\s+(?:COLUMN\s+)?([`\w]+)\s*""".r
  private val ModifyColRx =
    """(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+MODIFY\s+(?:COLUMN\s+)?([`\w]+)\s+(.+?)\s*""".r
  private val ChangeColRx =
    """(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+CHANGE\s+(?:COLUMN\s+)?([`\w]+)\s+([`\w]+)\s+(.+?)\s*""".r
  private val RenameColRx =
    """(?is)\s*ALTER\s+TABLE\s+([`\w.]+)\s+RENAME\s+COLUMN\s+([`\w]+)\s+TO\s+([`\w]+)\s*""".r
  private val RenameTableRx =
    """(?is)\s*RENAME\s+TABLE\s+([`\w.]+)\s+TO\s+([`\w.]+)\s*""".r
  private val DropTableRx =
    """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([`\w.]+)\s*""".r
  private val TruncateRx =
    """(?is)\s*TRUNCATE\s+TABLE\s+([`\w.]+)\s*""".r

  /** Split a CREATE TABLE body on top-level commas (types like
    * DECIMAL(10,2) carry nested commas).
    */
  private def splitTopLevel(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    body.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val constraintKeywords =
    Set("PRIMARY", "UNIQUE", "KEY", "INDEX", "CONSTRAINT", "FOREIGN", "CHECK")

  private def parseColumns(body: String): StructType =
    StructType(splitTopLevel(body).flatMap { item =>
      val head = item.split("\\s+").head
      if (constraintKeywords.contains(head.toUpperCase)) None
      else {
        val rest = item.drop(head.length).trim
        Some(StructField(clean(head), TypeMapper.fromMySql(rest)))
      }
    })

  /** Apply `f` to `tbl`'s schema — no-op when the table isn't registered:
    * replication scoping means the registry only covers in-scope tables,
    * and a shared source emits DDL for tables outside the scope
    * constantly (the same drop-unregistered contract as
    * [[SchemaRegistry.decode]]).
    */
  private def alter(reg: SchemaRegistry, tbl: String)(f: StructType => StructType): SchemaRegistry = {
    val t = clean(tbl)
    reg.schemas.get(t) match {
      case Some(s) => SchemaRegistry(reg.schemas.updated(t, f(s)))
      case None => reg
    }
  }

  /** Fold one DDL statement into the registry; statements that carry no
    * schema delta (TRUNCATE, DML, constraint-only ALTERs, DDL for
    * unregistered tables, unknown) return the registry unchanged.
    */
  def applyDdl(reg: SchemaRegistry, stmt: String): SchemaRegistry = stmt match {
    case CreateRx(tbl, body) =>
      SchemaRegistry(reg.schemas.updated(clean(tbl), parseColumns(body)))
    case RenameColRx(tbl, from, to) =>
      alter(reg, tbl)(s => StructType(s.fields.map(f =>
        if (f.name == clean(from)) f.copy(name = clean(to)) else f)))
    case ChangeColRx(tbl, from, to, tpe) =>
      alter(reg, tbl)(s => StructType(s.fields.map(f =>
        if (f.name == clean(from)) StructField(clean(to), TypeMapper.fromMySql(tpe)) else f)))
    case ModifyColRx(tbl, c, tpe) if !constraintKeywords.contains(clean(c).toUpperCase) =>
      alter(reg, tbl)(s => StructType(s.fields.map(f =>
        if (f.name == clean(c)) f.copy(dataType = TypeMapper.fromMySql(tpe)) else f)))
    // ADD PRIMARY KEY / ADD INDEX / ADD CONSTRAINT ... carry no column
    // delta — without this guard they'd parse as a phantom add-column
    case AddColRx(tbl, c, tpe) if !constraintKeywords.contains(clean(c).toUpperCase) =>
      alter(reg, tbl)(s => StructType(s.fields :+ StructField(clean(c), TypeMapper.fromMySql(tpe))))
    case DropColRx(tbl, c) if !constraintKeywords.contains(clean(c).toUpperCase) =>
      alter(reg, tbl)(s => StructType(s.fields.filterNot(_.name == clean(c))))
    case RenameTableRx(from, to) =>
      val f = clean(from)
      reg.schemas.get(f) match {
        case Some(s) => SchemaRegistry(reg.schemas - f + (clean(to) -> s))
        case None => reg
      }
    case DropTableRx(tbl) =>
      val t = clean(tbl)
      if (!reg.schemas.contains(t)) reg
      else {
        require(reg.schemas.size > 1, s"cannot drop the last registered table $t")
        SchemaRegistry(reg.schemas - t)
      }
    case TruncateRx(_) => reg
    case _ => reg
  }

  /** Replay a DDL history in order — the registry as of the last
    * statement.
    */
  def replay(reg: SchemaRegistry, statements: Seq[String]): SchemaRegistry =
    statements.foldLeft(reg)(applyDdl)

  /** Decode a wide changelog whose schema changed MID-STREAM: events with
    * pos < `boundary` decode under `v0`, events at/after decode under
    * `replay(v0, ddl)` — per-position versioned decode. The reference's
    * schema cache only ever holds the CURRENT shape (a refresh overwrites
    * history, normalizer/MySQLEventNormalizer.scala:164-171), so a
    * consumer replaying from an old offset there mis-decodes every
    * pre-DDL event; keeping both registry versions and routing by pos
    * makes replays correct across the DDL.
    *
    * Columns existing in only one version surface as null on the other
    * side (`unionByName` alignment); a RENAME is made whole downstream
    * with `coalesce(new, old)`. Both branches stay scan-local `from_json`
    * projections — the pos predicate splits the scan, no shuffle.
    */
  def evolvingDecode(envelope: org.apache.spark.sql.DataFrame, v0: SchemaRegistry,
                     ddl: Seq[String], boundary: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val v1 = replay(v0, ddl)
    val pre = v0.decode(envelope.filter(col("pos") < boundary))
    val post = v1.decode(envelope.filter(col("pos") >= boundary))
    pre.unionByName(post, allowMissingColumns = true)
  }
}
