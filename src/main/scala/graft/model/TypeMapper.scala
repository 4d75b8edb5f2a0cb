package graft.model

import org.apache.spark.sql.types._

/** MySQL/StarRocks ↔ Spark type mapping — the reference's three-layer
  * type system (reference: model/MySQLDataType.scala:6-26,
  * connector/DataType.scala:9-134, connector/source/mysql/
  * MySQLTypeMapper.scala:16-55, connector/sink/starrocks/
  * StarRocksTypeMapper.scala:12-71) collapsed onto
  * `org.apache.spark.sql.types` per the SURVEY.md §1.2 mapping table.
  */
object TypeMapper {

  private val TypeRx = """(?i)\s*([a-z]+)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?.*""".r

  /** Parse a MySQL native type string (`TYPE(len[,scale])`, trailing
    * attributes like UNSIGNED tolerated) to a Spark DataType. Unknown
    * types fall back to StringType (reference: catalog falls back to
    * Text, MySQLCatalogService.scala:201-204).
    */
  def fromMySql(native: String): DataType = native match {
    case TypeRx(name, len, scale) => name.toLowerCase match {
      case "tinyint" if len == "1" => BooleanType // MySQL bool convention
      case "tinyint" => ByteType
      case "smallint" => ShortType
      case "mediumint" | "int" | "integer" => IntegerType
      case "bigint" => LongType
      case "decimal" | "numeric" =>
        DecimalType(Option(len).map(_.toInt).getOrElse(10), Option(scale).map(_.toInt).getOrElse(0))
      case "float" => FloatType
      case "double" | "real" => DoubleType
      case "varchar" | "char" | "text" | "longtext" | "mediumtext" | "tinytext" | "enum" | "set" => StringType
      case "json" => StringType // + from_json at use sites
      case "datetime" | "timestamp" => TimestampType
      case "date" => DateType
      case "time" => StringType // no stable TIME type; documented divergence
      case "blob" | "longblob" | "mediumblob" | "tinyblob" | "varbinary" | "binary" => BinaryType
      case "bit" if len == null || len == "1" => BooleanType
      case _ => StringType
    }
    case _ => StringType
  }

  /** Render a Spark type as MySQL DDL (sink side, reference
    * connector/sink/mysql/MySQLTypeMapper.scala:12-50).
    */
  def toMySql(dt: DataType): String = dt match {
    case BooleanType => "TINYINT(1)"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case TimestampType => "DATETIME(6)"
    case DateType => "DATE"
    case BinaryType => "BLOB"
    case StringType => "TEXT"
    case _: ArrayType | _: MapType | _: StructType => "JSON"
    case _ => "TEXT"
  }

  /** Render as StarRocks DDL: DECIMAL32/64/128 sized by precision,
    * complex types degrade to JSON (reference
    * StarRocksTypeMapper.scala:12-71).
    */
  def toStarRocks(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case d: DecimalType if d.precision <= 9 => s"DECIMAL32(${d.precision},${d.scale})"
    case d: DecimalType if d.precision <= 18 => s"DECIMAL64(${d.precision},${d.scale})"
    case d: DecimalType => s"DECIMAL128(${d.precision},${d.scale})"
    case TimestampType => "DATETIME"
    case DateType => "DATE"
    case StringType => "STRING"
    case BinaryType => "VARBINARY"
    case _: ArrayType | _: MapType | _: StructType => "JSON"
    case _ => "STRING"
  }

  /** Category compatibility (reference DataType.scala:181-190): can a
    * source type land in a sink column without data loss class change.
    */
  def compatible(a: DataType, b: DataType): Boolean = {
    def cat(d: DataType): String = d match {
      case BooleanType => "bool"
      case ByteType | ShortType | IntegerType | LongType => "int"
      case FloatType | DoubleType | _: DecimalType => "num"
      case StringType => "str"
      case BinaryType => "bin"
      case TimestampType | DateType => "time"
      case _ => "other"
    }
    cat(a) == cat(b) || (cat(a) == "int" && cat(b) == "num")
  }
}
