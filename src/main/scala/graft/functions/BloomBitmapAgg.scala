package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bloom-bitmap UDAF: OR a group's bit positions into an m-bit
  * bitmap EXECUTOR-SIDE and emit it as the sidecar's lowercase-hex
  * string — the fold that keeps [[graft.ops.SinkOps]]'s bloom sidecar
  * writer manifest-scale at the driver. The collect_set(bit)
  * predecessor shipped up to k·n distinct positions per file (a 1 M-row
  * file ⇒ ~4 M ints ⇒ tens of MB) for a driver-side fold; this
  * aggregator's merge is an elementwise byte OR — commutative and
  * associative, hence bit-identical under any partition layout — and
  * only m/4 hex chars per file ever reach the driver.
  *
  * IN  = bit position in [0, m)
  * BUF = m/8 bytes, bit `p` at byte `p >> 3`, mask `1 << (p & 7)` —
  *       the exact layout the driver-side prober indexes, so the
  *       sidecar bytes are identical BY CONSTRUCTION to the previous
  *       driver fold (spec-pinned against an independent replica).
  * OUT = 2·(m/8) lowercase hex chars.
  */
class BloomBitmapAgg(m: Int) extends Aggregator[Int, Array[Byte], String] {
  require(m >= 8 && (m & 7) == 0, s"bitmap bits must be a multiple of 8: $m")

  override def zero: Array[Byte] = new Array[Byte](m / 8)

  override def reduce(buf: Array[Byte], bit: Int): Array[Byte] = {
    // Negative = "no value" sentinel (a NULL in the bloomed column):
    // contributes no bit, so the one-pass multi-column writer can run
    // c aggregations side by side over rows where only some columns
    // are non-null. Bit-identical to filtering nulls per column.
    if (bit >= 0)
      buf(bit >> 3) = (buf(bit >> 3) | (1 << (bit & 7))).toByte
    buf
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
    x
  }

  override def finish(buf: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(buf.length * 2)
    val digits = "0123456789abcdef"
    var i = 0
    while (i < buf.length) {
      val b = buf(i) & 0xff
      sb.append(digits.charAt(b >> 4)).append(digits.charAt(b & 15))
      i += 1
    }
    sb.toString
  }

  override def bufferEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[String] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]()
}
