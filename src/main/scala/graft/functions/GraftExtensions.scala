package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT array_dot_l(a, b)")` works like a built-in.
  *
  * Two entry points:
  *  - builder-time: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard SparkSessionExtensions hook)
  *  - live session: `GraftFunctions.register(spark)` (temp-function
  *    registry; what the specs use since the shared test session is
  *    already built)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.arrayDotL)
}

object GraftFunctions {
  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"array_dot_l expects 2 arguments, got ${exprs.length}")
    ArrayDotProduct(exprs.head, exprs(1))
  }

  val arrayDotL: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("array_dot_l"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot_l"),
      build _)

  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "array_dot_l", build)
}
