package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sort / top-k operators.
  *
  * Reference semantics (cited, not copied):
  *  - total-order numeric sort via sampled range partitioning:
  *    LeanSort.java:85-162 (and the TotalOrderPartitioner+InputSampler
  *    variant in LeanSort.java.git:203,252-257)
  *  - global desc sort by count / float rank: Grep.java:86-100,
  *    SortFloatComparator.java:17-22
  *
  * Spark's orderBy IS sampled range partitioning (RangePartitioner with
  * reservoir sampling) — the reference's hand-built partitioner and its
  * single-reducer desc sort both collapse to it, and it scales to any
  * number of partitions instead of 1 or a hardcoded 160.
  */
object SortOps {

  /** Global total-order sort. Ties must be broken by the caller's key
    * list for deterministic output. */
  def totalSort(df: DataFrame, keys: Column*): DataFrame = df.orderBy(keys: _*)

  /** Top-k: Catalyst plans TakeOrderedAndProject — each partition keeps
    * only k rows, then the driver merges k*numPartitions rows. No global
    * shuffle, unlike a full sort+limit at 100 TB.
    */
  def topK(df: DataFrame, k: Int, keys: Column*): DataFrame =
    df.orderBy(keys: _*).limit(k)

  /** Z-order (Morton) value of two nonnegative dimension columns: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1, so rows close in
    * BOTH dimensions get close z-values. Pure integer expression
    * (division/mod per bit, whole-stage codegen), identical arithmetic
    * in the DuckDB oracle. Inputs must fit in `bits` bits (caller maps
    * keys into range, e.g. `% (1 << bits)`).
    */
  def zorderValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i) % 2L * lit(1L << (2 * i)) +
        shiftright(b.cast("long"), i) % 2L * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** K-DIMENSIONAL Morton value: bit i of dimension j lands at
    * position i·k + j, so rows close in ANY subset of the k dimensions
    * get close z-values — [[zorderValue]] is exactly the k = 2 case
    * (same bit layout, same integer arithmetic). The interleaved key
    * must fit a signed long: k·bits ≤ 62, checked loudly (at k = 3
    * that still leaves 20 bits ≈ 1 M distinct values per dimension —
    * layout locality, not value precision: callers fold wider domains
    * with `% (1 << bits)` and stored data is untouched). Pure integer
    * expression, whole-stage codegen like the 2-D form.
    */
  def zorderValueK(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"z-ordering needs >= 2 dimensions, got $k")
    require(bits >= 1 && k * bits <= 62,
      s"interleaved key overflows a signed long: $k dims x $bits bits")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftright(c.cast("long"), i) % 2L * lit(1L << (i * k + j))
      }
    }.reduce(_ + _)
  }

  /** Z-order data layout: range-partition + sort by the interleaved key,
    * so files written from the result carry tight min/max ranges on BOTH
    * dimensions — 2-D box predicates then prune files on either column
    * (the lakehouse OPTIMIZE ZORDER technique). One range exchange,
    * in-partition sort, no global bottleneck.
    */
  def zorderLayout(df: DataFrame, a: Column, b: Column,
                   bits: Int = 16): DataFrame = {
    val z = zorderValue(a, b, bits).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** 2-D skyline (Pareto frontier): rows not dominated on
    * (maximize `xCol`, minimize `yCol`) — a dominates b when a.x ≥ b.x,
    * a.y ≤ b.y, strict in at least one. Two phases:
    *
    * Phase 1 (scalable prune): bucket x by `bucketWidth`, take each
    * bucket's min-y, and compute per bucket the running min-y over all
    * STRICTLY higher buckets (a tiny |buckets|-row window, broadcast
    * back). Any row whose y is ≥ that bound is dominated by a
    * concretely-existing higher-x row and is dropped map-side — the
    * full table never reaches a global window. Pruning is
    * semantics-preserving (it only removes dominated rows), so the
    * oracle can run the naive one-window formulation and must agree.
    *
    * Phase 2 (exact, small): over the surviving sliver, two value-RANGE
    * frames on the x total order decide dominance exactly — strictly
    * higher x with y ≤ mine, or tied-or-higher x with y < mine (the
    * frame including ties covers the equal-x strict-y case; a row never
    * dominates itself since y < y is false). Duplicate (x, y) points
    * all survive together, deterministically.
    *
    * Adversarial-input bound: phase 2's window is an unpartitioned
    * global sort, sized by the phase-1 survivor sliver. On
    * ANTI-CORRELATED data (x and y improve together, so most rows are
    * Pareto-optimal) the prune removes little and the sliver approaches
    * the input — inherent to EXACT skylines, whose output is then
    * itself O(n) and not a useful deliverable. The operator is sized
    * for the common correlated/independent case where the frontier
    * (and hence the sliver, which phase 1 keeps within a bucket-width
    * band of it) is orders of magnitude below the input; for frontier-
    * dense data, pre-aggregate (e.g. quantize x) or accept a top-k
    * relaxation before calling.
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                bucketWidth: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("_bk",
      expr(s"CAST($xCol AS BIGINT) div $bucketWidth"))
    val wb = Window.orderBy(col("_bk").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val bounds = b.groupBy("_bk")
      .agg(min(col(yCol)).as("_bmin"))
      .withColumn("_hmin", min(col("_bmin")).over(wb))
      .select(col("_bk"), col("_hmin"))
    val survivors = b.join(broadcast(bounds), Seq("_bk"))
      .filter(col("_hmin").isNull || col(yCol) < col("_hmin"))
      .drop("_bk", "_hmin")
    val strictHigher = Window.orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val tiedOrHigher = Window.orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    survivors
      .withColumn("_m1", min(col(yCol)).over(strictHigher))
      .withColumn("_m2", min(col(yCol)).over(tiedOrHigher))
      .filter((col("_m1").isNull || col("_m1") > col(yCol)) &&
        col("_m2") >= col(yCol))
      .drop("_m1", "_m2")
  }
}
