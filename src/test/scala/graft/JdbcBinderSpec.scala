package graft

import graft.sinks.JdbcBinder
import org.scalatest.funsuite.AnyFunSuite

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.PreparedStatement

/** Binder dispatch verified against a recording PreparedStatement proxy
  * (no live DB in the harness — same reason the reference's writer keeps
  * its dispatch in one testable method, JdbcDataWriter.scala:177-216).
  */
class JdbcBinderSpec extends AnyFunSuite {

  private def recordingStatement(calls: collection.mutable.Buffer[(String, Int, Any)]): PreparedStatement =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[PreparedStatement]),
      new InvocationHandler {
        override def invoke(proxy: Any, method: Method, args: Array[AnyRef]): AnyRef = {
          if (method.getName.startsWith("set"))
            calls += ((method.getName, args(0).asInstanceOf[Int],
              if (args.length > 1) args(1) else null))
          null
        }
      }).asInstanceOf[PreparedStatement]

  test("every JVM type routes to its typed setter") {
    val calls = collection.mutable.Buffer.empty[(String, Int, Any)]
    val st = recordingStatement(calls)
    JdbcBinder.bindRow(st, Seq(
      true, 1.toByte, 2.toShort, 3, 4L, 5.0f, 6.0d,
      new java.math.BigDecimal("7.70"), BigDecimal("8.80"),
      "nine", Array[Byte](1, 2), java.sql.Date.valueOf("2024-01-01"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.time.Instant.ofEpochMilli(1000), java.time.LocalDate.of(2024, 2, 2),
      null))
    val names = calls.map(_._1)
    assert(names == Seq("setBoolean", "setByte", "setShort", "setInt", "setLong",
      "setFloat", "setDouble", "setBigDecimal", "setBigDecimal", "setString",
      "setBytes", "setDate", "setTimestamp", "setTimestamp", "setDate", "setNull"))
    // 1-based JDBC indexes in order
    assert(calls.map(_._2) == (1 to 16))
  }

  test("unknown types fall back to toString (reference behavior)") {
    val calls = collection.mutable.Buffer.empty[(String, Int, Any)]
    JdbcBinder.bindRow(recordingStatement(calls), Seq(new Object {
      override def toString = "custom"
    }))
    assert(calls.head._1 == "setString" && calls.head._3 == "custom")
  }
}
