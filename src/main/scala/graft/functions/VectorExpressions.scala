package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * The higher-order-function formulation
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` allocates an intermediate
  * array and evaluates interpreted lambdas per element — fine for
  * correctness, but the ANN/dedup cosine inner loop runs it
  * |corpus|·|queries| times. This expression generates a tight primitive
  * Java loop inside whole-stage codegen (guide preference (b): a custom
  * `Expression` with `doGenCode` beats composing HOFs for a hot scalar).
  *
  * Summation is in index order, matching both the HOF left-fold and
  * DuckDB's `list_dot_product`, so oracle results are bit-identical.
  * Null elements inside a vector contribute 0 (embeddings are dense; a
  * null element means corrupt input, not a different dot product).
  *
  * Inputs must already be array<double> (call sites cast at the scan
  * edge); mismatched types fail analysis via [[DotProductD.checkInputDataTypes]].
  */
case class DotProductD(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product_d"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int ${ev.value}_n = Math.min($x.numElements(), $y.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int i = 0; i < ${ev.value}_n; i++) {
         |  if (!$x.isNullAt(i) && !$y.isNullAt(i)) {
         |    ${ev.value}_s += $x.getDouble(i) * $y.getDouble(i);
         |  }
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  val name = "dot_product_d"

  /** Register in the session's function registry (idempotent) — the
    * stable public path for lifting a custom Expression into Column /
    * SQL space without private Spark APIs.
    */
  /** Single builder shared by the temp-function path and
    * [[GraftExtensions]] — one place owns arity/shape handling.
    */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$name requires exactly 2 arguments, got ${exprs.length}")
    DotProductD(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder _, "built-in")

  /** Dot product of two array<double> columns (codegen'd). Requires
    * [[register]] to have been called on the active session.
    */
  def dotD(a: Column, b: Column): Column = call_function(name, a, b)
}
