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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.arrayDotL)
    ext.injectFunction(GraftFunctions.hash60)
    ext.injectFunction(GraftFunctions.kgramHash60)
    ext.injectFunction(GraftFunctions.nfcNormalize)
    ext.injectFunction(GraftFunctions.stripAccents)
  }
}

object GraftFunctions {
  private def buildDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"array_dot_l expects 2 arguments, got ${exprs.length}")
    ArrayDotProduct(exprs.head, exprs(1))
  }

  private def buildHash60(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"hash60 expects 1 argument, got ${exprs.length}")
    Hash60Expr(exprs.head)
  }

  val arrayDotL: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("array_dot_l"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot_l"),
      buildDot _)

  val hash60: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "hash60"),
      buildHash60 _)

  private def buildKGram(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"kgram_hash60 expects (text, k), got ${exprs.length} arguments")
    // Any foldable integral k works (2, 2L, CAST(2 AS INT), 1+1): the
    // builder runs before constant folding, so evaluate it here.
    val k = exprs(1) match {
      case e if e.foldable => e.eval() match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long => l.intValue
        case s: java.lang.Short => s.intValue
        case b: java.lang.Byte => b.intValue
        case v => throw new IllegalArgumentException(
          s"kgram_hash60 k must be an integer constant, got $v")
      }
      case e => throw new IllegalArgumentException(
        s"kgram_hash60 k must be a constant, got non-foldable $e")
    }
    KGramHash60(exprs.head, k)
  }

  val kgramHash60: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("kgram_hash60"),
      new ExpressionInfo(classOf[KGramHash60].getName, "kgram_hash60"),
      buildKGram _)

  private def buildNfc(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"nfc_normalize expects 1 argument, got ${exprs.length}")
    NfcNormalizeExpr(exprs.head)
  }

  private def buildStripAccents(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"strip_accents expects 1 argument, got ${exprs.length}")
    StripAccentsExpr(exprs.head)
  }

  val nfcNormalize: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      buildNfc _)

  val stripAccents: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccentsExpr].getName, "strip_accents"),
      buildStripAccents _)

  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "array_dot_l", buildDot)
    GraftSqlBridge.registerFunction(spark, "hash60", buildHash60)
    GraftSqlBridge.registerFunction(spark, "kgram_hash60", buildKGram)
    GraftSqlBridge.registerFunction(spark, "nfc_normalize", buildNfc)
    GraftSqlBridge.registerFunction(spark, "strip_accents", buildStripAccents)
  }
}
