package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for the curation tier: NFC
  * normalization and accent stripping (NFD + drop combining marks) as
  * native codegen expressions — the first pass every dedup pipeline
  * needs, because "café" composed and decomposed are different byte
  * strings (different md5, different shingles, different LSH buckets)
  * for the SAME text. Reference analogue: none (the reference is
  * byte-oriented); this is north-star curation surface.
  *
  * Both run inside whole-stage codegen via a static helper, same shape
  * as [[Hash60]]. ASCII fast path: `Normalizer.isNormalized` is O(n)
  * with no allocation and true for all-ASCII input, so the common case
  * (clean web text) never allocates a new string.
  *
  * Cross-engine contract: `normalizeNfc` equals DuckDB's
  * `nfc_normalize`, `stripAccents` equals DuckDB's `strip_accents`
  * (both utf8proc-backed) on the Latin-1/combining-mark range the
  * fixture exercises — pinned by the q_text_normalize full oracle.
  */
object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD-decompose, drop Unicode Mn (combining marks), NFC-recompose
    * the remainder — DuckDB strip_accents semantics on Latin text.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    var i = 0
    var hasMark = false
    while (i < nfd.length && !hasMark) {
      if (Character.getType(nfd.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark) return s
    val sb = new java.lang.StringBuilder(nfd.length)
    i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

abstract class UnicodeNormExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }
  override def dataType: DataType = StringType
}

case class NfcNormalizeExpr(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

case class StripAccentsExpr(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.stripAccents(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def apply(c: Column): Column =
    GraftSqlBridge.column(NfcNormalizeExpr(GraftSqlBridge.expression(c)))
}

object StripAccentsExpr {
  def apply(c: Column): Column =
    GraftSqlBridge.column(StripAccentsExpr(GraftSqlBridge.expression(c)))
}
