package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (north-star tier):
  * gap-based sessionization (the batch formulation of
  * `session_window` — lag → new-session flag → running session index),
  * JSON property extraction, and schema-on-read tolerant parsing
  * (the reference skips malformed rows at PreMapper.java:22-25,
  * LeanSort.java:91, Step1Mapper.java:28 — same semantics via try_cast).
  *
  * Timestamps are compared as epoch microseconds (int64) so the arithmetic
  * is exact and engine-agnostic. Sessionization is windowed per user_id —
  * parallel across users, no global ordering; the 100 TB plan is a single
  * hash-shuffle on user_id feeding two window functions and one groupBy,
  * all in the same partitioning (Catalyst reuses the exchange).
  */
object EventOps {

  /** Session gap: 30 minutes, in microseconds. */
  val GapUs: Long = 1800L * 1000000L

  /** Gap-based sessions per user. Output one row per session:
    * (user_id, sess_idx, n_events, start_us, end_us, sum_value).
    */
  /** Epoch-micros from a time column, whichever way the scan surfaced it:
    * nanos as int64 (spark.sql.legacy.parquet.nanosAsLong=true for
    * TIMESTAMP(NANOS) parquet) or a native timestamp. Exact floor-div.
    */
  def microsOf(df: DataFrame, c: String): org.apache.spark.sql.Column =
    if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
      expr(s"$c div 1000")
    else
      // cast handles TIMESTAMP_NTZ too; session tz is UTC so NTZ wall
      // time and instant micros coincide (matching DuckDB's epoch_us).
      unix_micros(col(c).cast("timestamp"))

  private def micros(events: DataFrame) = microsOf(events, "ts")

  def sessionize(events: DataFrame, gapUs: Long = GapUs): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val e = events.select(col("user_id"), col("event_id"),
      micros(events).as("tus"), col("value"))
    val flagged = e.withColumn("prev", lag("tus", 1).over(order))
      .withColumn("new_sess",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1L)
          .otherwise(0L))
    flagged
      .withColumn("sess_idx",
        sum("new_sess").over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_idx")
      .agg(count(lit(1)).as("n_events"),
        min("tus").as("start_us"), max("tus").as("end_us"),
        AggOps.exactSum(col("value")).as("sum_value"))
  }

  /** Time-grid resample + forward fill — the time-series ETL staple
    * (downsample to fixed buckets, carry the last observation forward
    * through empty ones). Per user: events land in `bucketUs`-wide
    * epoch-aligned buckets; each bucket keeps its LATEST event's value
    * (max_by over the unique (tus, event_id) order — deterministic);
    * the per-user grid spans min..max occupied bucket, and empty buckets
    * take the previous bucket's value (`filled` = 1). The first grid
    * bucket is occupied by construction, so no leading nulls.
    *
    * Values pass through untouched (no arithmetic), so doubles are
    * engine-identical. Scale shape: one (user, bucket)-keyed agg, one
    * tiny per-user span agg whose grid explode is pure generate, one
    * keyed left join, one per-user window — all reusing the user_id
    * hash partitioning (Catalyst reuses the exchange); grids are dense
    * int64 rows, never wider than the fill columns.
    */
  def gapFill(events: DataFrame, bucketUs: Long = 21600L * 1000000L): DataFrame = {
    val e = events.select(col("user_id"), col("event_id"),
        micros(events).as("tus"), col("value"))
      .withColumn("bucket_us", expr(s"(tus div ${bucketUs}L) * ${bucketUs}L"))
    val per = e.groupBy("user_id", "bucket_us")
      .agg(max_by(col("value"), struct(col("tus"), col("event_id"))).as("v"),
        count(lit(1)).as("n_events"))
    val grid = e.groupBy("user_id")
      .agg(min("bucket_us").as("b0"), max("bucket_us").as("b1"))
      .select(col("user_id"),
        explode(sequence(col("b0"), col("b1"), lit(bucketUs))).as("bucket_us"))
    val w = Window.partitionBy("user_id").orderBy("bucket_us")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(per, Seq("user_id", "bucket_us"), "left")
      .select(col("user_id"), col("bucket_us"),
        last(col("v"), ignoreNulls = true).over(w).as("value_ff"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("v").isNull, 1L).otherwise(0L).as("filled"))
  }

  /** Ordered funnel analysis — the product-analytics staple: per user,
    * the earliest time each step of `steps` completed IN ORDER (step
    * i+1 counts only at-or-after step i's completion time; simultaneous
    * events satisfy order — the standard inclusive convention).
    * Output: (user_id, t1_us..tn_us nullable, depth = completed steps).
    * Users with no step-1 event are absent.
    *
    * Shape: one conditional min-agg per step, every agg and join keyed
    * on user_id — Catalyst reuses one hash partitioning end-to-end, so
    * at any scale this is a single shuffle of (user_id, micros) rows.
    * All-int64 micros comparisons; no value arithmetic at all.
    */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("signup", "view", "click")): DataFrame = {
    require(steps.nonEmpty)
    val e = events.select(col("user_id"), col("event_type"),
      micros(events).as("tus"))
    val first = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("tus").as("t1_us"))
    val full = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (st, i)) =>
      val prev = s"t${i}_us"
      val cur = s"t${i + 1}_us"
      val next = e.filter(col("event_type") === st)
        .join(acc.select(col("user_id"), col(prev)), "user_id")
        .filter(col("tus") >= col(prev))
        .groupBy("user_id").agg(min("tus").as(cur))
      acc.join(next, Seq("user_id"), "left")
    }
    val depth = steps.indices.map(i =>
      when(col(s"t${i + 1}_us").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    full.withColumn("depth", depth)
  }

  /** JSON property extraction + aggregate: pulls `$.k` out of the string
    * `props` column and aggregates per event_type. avg_k is a division of
    * exact integers (deterministic IEEE).
    */
  def jsonStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        (sum("k").cast("double") / count(lit(1))).as("avg_k"))

  /** Schema-on-read tolerant numeric parse over a deliberately dirty line
    * corpus: document tokens (words — unparseable), lineitem quantities
    * rendered as strings (parseable), and '#'-prefixed order keys
    * (unparseable). try_cast drops what doesn't parse; output is one
    * audit row (n_lines, n_parsed, n_dropped, sum_parsed).
    */
  def tolerantParse(docs: DataFrame, lineitem: DataFrame,
                    orders: DataFrame): DataFrame = {
    val lines = docs
      .select(explode(filter(split(col("text"), TextOps.WsRegex), x => x =!= ""))
        .as("line"))
      .union(lineitem.select(col("l_quantity").cast("string").as("line")))
      .union(orders.select(concat(lit("#"), col("o_orderkey")).as("line")))
    lines.select(expr("try_cast(line AS DOUBLE)").as("v"))
      .agg(count(lit(1)).as("n_lines"),
        count(col("v")).as("n_parsed"),
        (count(lit(1)) - count(col("v"))).as("n_dropped"),
        AggOps.exactSum(coalesce(col("v"), lit(0.0))).as("sum_parsed"))
  }

  /** Forward fill (LOCF — last observation carried forward): nulls in
    * `valueCol` take the most recent non-null value of the same key in
    * (time, tieBreak) order; leading nulls stay null. THE time-series
    * imputation primitive for sensor gaps and sparse CDC columns. One
    * key shuffle + in-partition sort; the carried value is a running
    * last(ignoreNulls) — no self-join, no per-gap work, and the fill
    * never crosses keys. Values pass through untouched (no arithmetic),
    * so filled output is bit-identical to the source observations.
    */
  def forwardFill(df: DataFrame, key: String, timeCol: String,
                  tieBreak: String, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col(timeCol).asc, col(tieBreak).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Gaps-and-islands interval coverage: each event spawns the interval
    * [tus, tus + durUs); overlapping or touching intervals per user
    * merge into maximal islands (the running-max formulation: a new
    * island starts exactly when an interval's start exceeds the max
    * end seen so far). Output one row per island:
    * (user_id, isl, n_events, start_us, end_us, covered_us).
    *
    * Same 100 TB plan as [[sessionize]]: one hash-shuffle on user_id
    * feeds both window passes and the final groupBy in the same
    * partitioning — islands never span users, so there is no global
    * ordering anywhere. All arithmetic is int64 microseconds (exact on
    * both engines).
    */
  def intervalMerge(events: DataFrame, durUs: Long = GapUs): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("s", "event_id")
    val iv = events.select(col("user_id"), col("event_id"),
        micros(events).as("s"))
      .withColumn("e", col("s") + durUs)
    val flagged = iv
      .withColumn("pmax",
        max("e").over(order.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_isl",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
    flagged
      .withColumn("isl",
        sum("new_isl").over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "isl")
      .agg(count(lit(1)).as("n_events"),
        min("s").as("start_us"), max("e").as("end_us"))
      .withColumn("covered_us", col("end_us") - col("start_us"))
  }

  /** Cumulative distinct users by first-seen day: (day_us, new_users,
    * cum_users) — the growth-curve staple. A user contributes to
    * exactly one day (its min event day), so the heavy work is one
    * user-keyed aggregation; the cumulative sum then runs over the
    * per-day rollup, which is |distinct days| rows at ANY corpus scale
    * — the single-partition running-sum window is over that tiny
    * rollup, not the data (the packLayout prefix-sum discipline).
    */
  def cumulativeDistinct(events: DataFrame,
                         bucketUs: Long = 86400L * 1000000L): DataFrame = {
    val firstSeen = events
      .select(col("user_id"), micros(events).as("tus"))
      .withColumn("day_us", expr(s"(tus div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy("user_id").agg(min("day_us").as("day_us"))
    val perDay = firstSeen.groupBy("day_us").agg(count(lit(1)).as("new_users"))
    perDay.withColumn("cum_users",
      sum("new_users").over(
        Window.orderBy("day_us")
          .rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Exact weighted moving average over each user's last `k` events
    * (ordered by time): weights are descending powers of two
    * (most-recent = 2^(k-1)), values are floor-cents of `value` — so
    * numerator and denominator are exact int64 on both engines and the
    * "average" ships as the (wma_num, wma_den) pair instead of a
    * division whose rounding could differ. Rows with fewer than k
    * predecessors weight only what exists (den reflects it).
    *
    * Expressed as k lag() terms over ONE window — a single user_id
    * shuffle + in-partition sort, no self-joins; k is a compile-time
    * constant so the whole expression stays inside codegen.
    */
  def weightedMovingAvg(events: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 62, "weights 2^(k-1) must fit int64")
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val e = events.select(col("user_id"), col("event_id"),
        micros(events).as("tus"),
        floor(col("value") * 100).as("cents"))
    val terms = (0 until k).map { j =>
      val w = 1L << (k - 1 - j)
      val lagged = if (j == 0) col("cents") else lag("cents", j).over(order)
      (when(lagged.isNotNull, lagged * w).otherwise(0L),
        when(lagged.isNotNull, lit(w)).otherwise(0L))
    }
    e.withColumn("wma_num", terms.map(_._1).reduce(_ + _))
      .withColumn("wma_den", terms.map(_._2).reduce(_ + _))
      .select("user_id", "event_id", "wma_num", "wma_den")
  }
}
