package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import graft.ops.DedupOps

/** Typed MinHash-signature UDAF — the engine's `Aggregator[IN, BUF, OUT]`
  * surface (SURVEY §2.10: the reference's pluggable-aggregation shape,
  * `ValueAggregatorDescriptor`, AggregateWordCount.java:47-64).
  *
  * IN  = pre-hashed shingle (int64, already mod P)
  * BUF = running k-element minimum vector
  * OUT = signature array (same values as DedupOps.minhashSigArr's
  *       expression path — cross-checked in MinHashAggSpec)
  *
  * The buffer is a fixed k·8-byte array: constant size per group, exact
  * merge under any partial-aggregation tree, safe for 100 TB group counts.
  * Prefer the expression path in SQL plans (whole-stage codegen); this
  * class exists for the typed/Dataset API and as the extension template a
  * user would copy for sketches Spark lacks.
  */
class MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  private val coef = DedupOps.MinhashCoef
  private val P = DedupOps.P

  override def zero: Array[Long] = Array.fill(coef.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      val (_, a, b, _, _) = coef(i)
      val v = (a * h + b) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Untyped-column form for DataFrame plans: `minhashSig(col("h"))`. */
  def minhashSig: Column => Column = {
    val f = udaf(new MinHashAgg)
    (c: Column) => f(c)
  }
}
