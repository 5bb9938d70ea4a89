package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of the portable 60-bit hash
  * `conv(substring(md5(x), 1, 15), 16, 10)`:
  * the first 15 hex characters of an md5 digest ARE its first 60 bits, so
  * the value is just (big-endian uint64 of digest bytes 0..7) >>> 4 — no
  * 40-char hex string, no substring, no base-16 parse. Bit-identical to
  * the built-in composition (spec-verified) and to the DuckDB oracle's
  * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`.
  *
  * The MessageDigest instance is thread-local: the hash sits on the hot
  * path of every dedup/fingerprint scan, and per-call getInstance was the
  * dominant allocation.
  */
object Hash60 {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Thread-local digest for callers that stream input incrementally
    * (KGram); the caller resets it before use.
    */
  def digest(): MessageDigest = md.get()

  /** First 60 bits of an md5 digest as a nonnegative Long. */
  def fold(dig: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(dig, 0, 8).getLong >>> 4

  def hashBytes(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    fold(d.digest(bytes))
  }

  /** Codegen entry point (referenced from generated Java). */
  def hashUtf8(s: UTF8String): Long = hashBytes(s.getBytes)
}

case class Hash60Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override def nullSafeEval(v: Any): Any =
    Hash60.hashUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60Expr =
    copy(child = newChild)
}

object Hash60Expr {
  def apply(c: Column): Column =
    GraftSqlBridge.column(Hash60Expr(GraftSqlBridge.expression(c)))
}
