package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-deployable registration of the engine's custom Catalyst
  * functions — the production path for a shared Spark platform:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * Every session on the cluster then resolves `dot_product_d` and
  * `top_k_by_value` in SQL and `call_function` without the per-session
  * `createOrReplaceTempFunction` calls ([[VectorFunctions.register]] /
  * [[TopKFunctions.register]] remain for ad-hoc/test sessions). Session
  * extensions are the supported public injection point (SPARK-18127) —
  * no private[sql] APIs involved.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(VectorFunctions.name),
      new ExpressionInfo(classOf[DotProductD].getName, VectorFunctions.name),
      (exprs: Seq[Expression]) => VectorFunctions.builder(exprs)))
    ext.injectFunction((
      FunctionIdentifier(TopKFunctions.name),
      new ExpressionInfo(classOf[TopKByValue].getName, TopKFunctions.name),
      (exprs: Seq[Expression]) => TopKFunctions.builder(exprs)))
  }
}
