package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row for the stateful sessionizer (epoch micros). */
case class SessEvent(user_id: Long, tus: Long, value: Double)

/** SessEvent + the event-time column the watermark rides on (must stay in
  * the grouped Dataset for EventTimeTimeout to resolve).
  */
case class SessEventTs(user_id: Long, tus: Long, value: Double,
                       ts: java.sql.Timestamp)

/** Running per-user session state. */
case class SessState(start: Long, last: Long, n: Long, sum: Double)

/** A closed session. */
case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                         n_events: Long, sum_value: Double)

/** Structured Streaming operators over the `events` shape — the streaming
  * face of EventOps. The reference has no streaming at all (SURVEY §2.9);
  * this is north-star surface for the `events` table.
  *
  * Each op takes a (streaming or batch) DataFrame with
  * (event_id, ts: timestamp, user_id, event_type, value) and returns the
  * transformed frame; callers bind sources/sinks (`readStream` →
  * `writeStream`). Watermarks bound state: at 100 TB-rate ingest the
  * session/window state store only retains events newer than the
  * watermark horizon, so state is O(active keys), not O(stream).
  */
object StreamOps {

  /** Gap-based sessionization with session_window — the streaming
    * equivalent of EventOps.sessionize (same 30-min gap semantics).
    * Output per closed session: user_id, session start/end, n_events,
    * sum_value.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Custom-state sessionization via flatMapGroupsWithState — the escape
    * hatch for session semantics `session_window` cannot express (e.g.
    * per-session running aggregates, custom close conditions). Gap-based
    * like EventOps.sessionize; closed sessions are emitted either when a
    * later event proves the gap, or when the event-time watermark passes
    * the session's timeout (last event + gap). State per active user is
    * one SessState — O(active users), bounded by the watermark horizon.
    */
  def sessionizeStateful(events: Dataset[SessEvent], gapUs: Long = 1800L * 1000000L,
                         watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._

    def close(u: Long, s: SessState) = ClosedSession(u, s.start, s.last, s.n, s.sum)

    val fn = (user: Long, rows: Iterator[SessEventTs], state: GroupState[SessState]) => {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(user, _)).iterator
        state.remove()
        out
      } else {
        // Gap-merge over intervals: the carried state plus each event as a
        // point interval, sorted by start. This matches the batch
        // EventOps.sessionize result for out-of-order arrivals inside the
        // watermark horizon: an event older than the state's start merges
        // backwards (start becomes min) when within the gap, and an event
        // more than a gap older forms — and immediately closes — its own
        // earlier session instead of being absorbed.
        val intervals = (state.getOption.toSeq ++
          rows.map(e => SessState(e.tus, e.tus, 1L, e.value)))
          .sortBy(s => (s.start, s.last))
        val closed = Seq.newBuilder[ClosedSession]
        var cur: Option[SessState] = None
        for (iv <- intervals) {
          cur = cur match {
            case Some(s) if iv.start - s.last > gapUs =>
              closed += close(user, s)
              Some(iv)
            case Some(s) =>
              Some(SessState(s.start, math.max(s.last, iv.last),
                s.n + iv.n, s.sum + iv.sum))
            case None => Some(iv)
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp((s.last + gapUs) / 1000) // millis
        }
        closed.result().iterator
      }
    }

    events
      .withColumn("ts", timestamp_micros(col("tus")))
      .withWatermark("ts", watermark)
      .as[SessEventTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Monotonic suffix for memory-sink query names — unique per run of
    * sessionizeReplay within a session (concurrent Verify/Bench passes
    * over the same query re-register under fresh names).
    */
  private val ReplayCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Batch-equivalence REPLAY of the sessionizer — the driver-visible
    * proof that the streaming path computes what the (oracle-green)
    * batch path computes. The input events are staged as `nParts`
    * parquet files and streamed back as REAL micro-batches (file source,
    * maxFilesPerTrigger=1, Trigger.AvailableNow), so event-time order
    * across batches is arbitrary — the out-of-order case. The watermark
    * is pushed beyond any fixture horizon (complete output mode keeps
    * all session state anyway), so the final memory-sink table is the
    * exact session set, projected onto the batch sessionizer's
    * epoch-micros shape: session_window's end is last-event + gap, so
    * `end_us = unix_micros(session_end) − gapUs` recovers max(tus).
    *
    * Memory sink + complete mode are the test-harness binding only —
    * production binds `sessionize` to a real sink in append mode with a
    * finite watermark; the operator under test is identical.
    */
  def sessionizeReplay(events: DataFrame, stagingDir: String,
                       gap: String = "30 minutes",
                       gapUs: Long = 1800L * 1000000L,
                       nParts: Int = 8): DataFrame = {
    val spark = events.sparkSession
    val ev = events.select(col("event_id"), col("user_id"),
      graft.ops.EventOps.microsOf(events, "ts").as("tus"), col("value"))
    ev.repartition(nParts).write.mode("overwrite").parquet(stagingDir)
    val staged = spark.read.parquet(stagingDir)
    val stream = spark.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1").parquet(stagingDir)
      .withColumn("ts", timestamp_micros(col("tus")))
    val sess = sessionize(stream, gap, watermark = "87600 hours")
    val name = s"graft_sess_replay_${ReplayCounter.incrementAndGet()}"
    val q = sess.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    spark.table(name).select(col("user_id"),
      unix_micros(col("session_start")).as("start_us"),
      (unix_micros(col("session_end")) - gapUs).as("end_us"),
      col("n_events"), col("sum_value"))
  }

  /** Streaming exactly-once dedup on an id column: late duplicates are
    * dropped as long as they arrive within the watermark horizon — state
    * is one id per event inside the horizon, evicted as the watermark
    * advances (the unbounded-state trap of bare dropDuplicates avoided).
    */
  def dedupeStream(events: DataFrame, idCol: String = "event_id",
                   watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-static enrichment join: each micro-batch joins against a
    * broadcast snapshot of a dimension table — the standard streaming
    * lookup (user → profile, product → category). The static side is
    * re-read per batch by Spark's stream-static join semantics, so a
    * dimension refresh lands without restarting the query; broadcast
    * keeps the stream side from shuffling.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Sliding/tumbling windowed counts per event_type. */
  def windowedCounts(events: DataFrame, window: String = "10 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
}
