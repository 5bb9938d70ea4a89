package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Count-Min Sketch UDAF: approximate per-key frequencies with a
  * FIXED depth×width int64 grid (default 4×4096 = 128 KB) regardless of
  * key cardinality — the 100 TB answer to "how often does key X occur"
  * when an exact groupBy's state is the problem, not the answer.
  *
  * Unlike HLL or t-digest, the CMS state is a pure sum grid: cell
  * (d, h_d(key)) accumulates +1 per occurrence, so merge is elementwise
  * addition — COMMUTATIVE AND ASSOCIATIVE, hence bit-identical under
  * any partition layout or partial-aggregation tree, and exactly
  * reproducible in another engine from the same hash. That is why
  * q_cms_freq carries a FULL DuckDB oracle (grid mirrored as a
  * GROUP BY over the shared portable hash60) where the HLL/t-digest
  * rows are rows-only by declared contract.
  *
  * Estimate for a key = min over d of its d cells — an upper bound on
  * the true count (collisions only ADD), within ε·N with depth-many
  * independent chances; the classic Cormode-Muthukrishnan guarantee.
  *
  * IN  = key (int64)
  * BUF = depth·width int64 counters, updated in place (one md5 per
  *       depth per row through the shared [[Hash60]] digest)
  * OUT = the grid, exposed to the plan as array<bigint> for
  *       element_at-based estimation (broadcast back, never collected).
  */
class CmsAgg(depth: Int = CmsAgg.Depth, width: Int = CmsAgg.Width)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + CmsAgg.cell(d, key, width)) += 1L
      d += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CmsAgg {
  val Depth = 4
  val Width = 4096

  /** Row hash for depth d: the portable hash60 of "cms<d>-<key>" —
    * byte-identical to the SQL `hash60('cms' || d || '-' || key)` the
    * DuckDB oracle computes, which is what makes the sketch
    * cross-engine exact.
    */
  def cell(d: Int, key: Long, width: Int = Width): Int =
    (Hash60.hashBytes(s"cms$d-$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      % width).toInt

  /** Untyped-column form for DataFrame plans: `sketchOf(keyCol)`. */
  def sketchOf: Column => Column = {
    val f = udaf(new CmsAgg)
    (k: Column) => f(k)
  }
}
