package graft.sinks

import java.sql.PreparedStatement

/** Typed PreparedStatement parameter binding — the reference's 15-type
  * JVM dispatch (reference: connector/jdbc/JdbcDataWriter.scala:177-216)
  * as a pure value → bind-plan function, so the dispatch logic is
  * unit-testable without a live connection and the executor-side loop in
  * `foreachPartition` is a straight `plan.bind(stmt, i, v)`.
  */
object JdbcBinder {

  sealed trait Bind { def name: String; def apply(st: PreparedStatement, i: Int, v: Any): Unit }

  private def b(n: String)(f: (PreparedStatement, Int, Any) => Unit): Bind = new Bind {
    val name = n
    def apply(st: PreparedStatement, i: Int, v: Any): Unit = f(st, i, v)
  }

  val SetNull: Bind = b("null")((st, i, _) => st.setNull(i, java.sql.Types.NULL))

  /** Pick the bind plan for a JVM value (null-safe). */
  def planFor(v: Any): Bind = v match {
    case null => SetNull
    case _: java.lang.Boolean => b("boolean")((st, i, x) => st.setBoolean(i, x.asInstanceOf[Boolean]))
    case _: java.lang.Byte => b("byte")((st, i, x) => st.setByte(i, x.asInstanceOf[Byte]))
    case _: java.lang.Short => b("short")((st, i, x) => st.setShort(i, x.asInstanceOf[Short]))
    case _: java.lang.Integer => b("int")((st, i, x) => st.setInt(i, x.asInstanceOf[Int]))
    case _: java.lang.Long => b("long")((st, i, x) => st.setLong(i, x.asInstanceOf[Long]))
    case _: java.lang.Float => b("float")((st, i, x) => st.setFloat(i, x.asInstanceOf[Float]))
    case _: java.lang.Double => b("double")((st, i, x) => st.setDouble(i, x.asInstanceOf[Double]))
    case _: java.math.BigDecimal => b("decimal")((st, i, x) => st.setBigDecimal(i, x.asInstanceOf[java.math.BigDecimal]))
    case _: scala.math.BigDecimal => b("decimal")((st, i, x) => st.setBigDecimal(i, x.asInstanceOf[scala.math.BigDecimal].bigDecimal))
    case _: String => b("string")((st, i, x) => st.setString(i, x.asInstanceOf[String]))
    case _: Array[Byte] => b("bytes")((st, i, x) => st.setBytes(i, x.asInstanceOf[Array[Byte]]))
    case _: java.sql.Date => b("date")((st, i, x) => st.setDate(i, x.asInstanceOf[java.sql.Date]))
    case _: java.sql.Time => b("time")((st, i, x) => st.setTime(i, x.asInstanceOf[java.sql.Time]))
    case _: java.sql.Timestamp => b("timestamp")((st, i, x) => st.setTimestamp(i, x.asInstanceOf[java.sql.Timestamp]))
    case _: java.time.Instant => b("timestamp")((st, i, x) =>
      st.setTimestamp(i, java.sql.Timestamp.from(x.asInstanceOf[java.time.Instant])))
    case _: java.time.LocalDate => b("date")((st, i, x) =>
      st.setDate(i, java.sql.Date.valueOf(x.asInstanceOf[java.time.LocalDate])))
    case _: java.time.LocalDateTime => b("timestamp")((st, i, x) =>
      st.setTimestamp(i, java.sql.Timestamp.valueOf(x.asInstanceOf[java.time.LocalDateTime])))
    case other => b("string-fallback")((st, i, x) => st.setString(i, x.toString))
  }

  /** Bind a full row (1-based JDBC indexes). */
  def bindRow(st: PreparedStatement, values: Seq[Any]): Unit =
    values.zipWithIndex.foreach { case (v, idx) => planFor(v)(st, idx + 1, v) }
}
