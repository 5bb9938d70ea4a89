package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-gram hasher: `kgram_hash60(text, k)` ≡
  * `transform(shingleArr(text, k), g -> hash60(g))` — the portable 60-bit
  * hash of every word k-gram — WITHOUT materializing a single gram
  * string. The composed form allocates O(n·k) gram characters per
  * document (zip_with chains building each gram, then md5 over the
  * result); this expression walks the UTF-8 bytes once, records token
  * boundaries, and feeds each gram's token slices plus single-space
  * separators straight into the digest. Byte-for-byte the digest input
  * equals the composed form's gram string (tokens are byte slices of the
  * original text; the join separator is the same 0x20), so the values are
  * bit-identical — spec-verified against the composition, oracle SQL
  * unchanged.
  *
  * Tokenization matches `split(text, "\\s+")` + drop-empty exactly for
  * all VALID UTF-8: Java regex `\s` (no UNICODE_CHARACTER_CLASS) is
  * precisely [' ', '\t', '\n', 0x0B, '\f', '\r'] — six ASCII bytes,
  * which in UTF-8 never occur inside a multi-byte sequence, so
  * byte-level splitting is safe. Malformed UTF-8 is the one divergence:
  * the composed form hashes grams after String conversion replaces bad
  * bytes with U+FFFD, while this expression digests the raw bytes —
  * still deterministic, but a different value (don't mix the two forms
  * over non-UTF-8 binary-cast columns).
  */
object KGram {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Hash60 of every k-gram of s (n-k+1 values; empty below k tokens). */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    // Token runs: starts(i) inclusive, ends(i) exclusive.
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val s0 = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s0
        ends(nTok) = i
        nTok += 1
      }
    }
    val nGrams = math.max(nTok - k + 1, 0)
    val out = new Array[Long](nGrams)
    val md = Hash60.digest()
    var g = 0
    while (g < nGrams) {
      md.reset()
      var t = g
      while (t < g + k) {
        if (t > g) md.update(' '.toByte)
        md.update(bytes, starts(t), ends(t) - starts(t))
        t += 1
      }
      out(g) = Hash60.fold(md.digest())
      g += 1
    }
    // fromPrimitiveArray keeps the hot path unboxed (GenericArrayData
    // over Array[Long] would box one java.lang.Long per gram).
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Hash60 of every k-CHAR (code point) window of s — the char-gram
    * twin of [[hashes]] for rolling fingerprints: one UTF-8 walk records
    * code-point start offsets, then each window digests the raw byte
    * slice [start(j), start(j+k)) — no per-window substring string. For
    * valid UTF-8 the digest input is byte-identical to
    * `hash60(substring(s, j+1, k))` (substring slices whole code points,
    * and a code-point run's bytes ARE the substring's UTF-8 encoding),
    * so values match the composed form bit-for-bit — spec- and
    * property-verified; the DuckDB oracle's `substr(text, j, 8)` is the
    * same code-point slice. Below k chars: empty (no grams).
    */
  def charGramHashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // Code-point start offsets; starts(n) sentinel = len.
    var starts = new Array[Int](math.max(math.min(len + 1, 4096), 16))
    var n = 0
    var i = 0
    while (i < len) {
      if (n == starts.length) starts = java.util.Arrays.copyOf(starts, n * 2)
      starts(n) = i
      n += 1
      i += 1
      // Continuation bytes are 10xxxxxx — never a code-point start.
      while (i < len && (bytes(i) & 0xc0) == 0x80) i += 1
    }
    if (n == starts.length) starts = java.util.Arrays.copyOf(starts, n + 1)
    starts(n) = len
    val nGrams = math.max(n - k + 1, 0)
    val out = new Array[Long](nGrams)
    val md = Hash60.digest()
    var g = 0
    while (g < nGrams) {
      md.reset()
      md.update(bytes, starts(g), starts(g + k) - starts(g))
      out(g) = Hash60.fold(md.digest())
      g += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

case class KGramHash60(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k-gram width must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_hash60"

  override def nullSafeEval(v: Any): Any =
    KGram.hashes(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KGram.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): KGramHash60 =
    copy(child = newChild)
}

object KGramHash60 {
  def apply(c: Column, k: Int): Column =
    GraftSqlBridge.column(KGramHash60(GraftSqlBridge.expression(c), k))
}

/** `chargram_hash60(text, k)` ≡ hash60 of every k-code-point window —
  * see [[KGram.charGramHashes]] for the contract.
  */
case class CharGramHash60(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"char-gram width must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chargram_hash60"

  override def nullSafeEval(v: Any): Any =
    KGram.charGramHashes(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KGram.charGramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharGramHash60 =
    copy(child = newChild)
}

object CharGramHash60 {
  def apply(c: Column, k: Int): Column =
    GraftSqlBridge.column(CharGramHash60(GraftSqlBridge.expression(c), k))
}
