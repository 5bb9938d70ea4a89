package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application — the warehouse MERGE INTO / upsert
  * staple the reference's batch jobs emulate with re-writes. A change
  * stream carries full-row payloads tagged (op ∈ I/U/D, seq); applying
  * it to a base snapshot yields the next snapshot: latest change per key
  * wins, D drops the key, I/U replace (or introduce) the row, untouched
  * base rows pass through.
  *
  * Contract: `changes` has the base's columns plus (op, seq); (key, seq)
  * pairs are unique (a CDC log's sequence number), and an I/U row carries
  * the complete intended payload (full-row images, the Debezium-style
  * after-state shape).
  */
object CdcOps {

  /** Apply `changes` to `base` keyed by `key`.
    *
    * Scale shape: latest-change election is ONE map-side-combined
    * `max_by(struct(payload), seq)` aggregation — no window sort over
    * the log — and the application is a single full-outer equi-join on
    * the key. Both sides shuffle once on the key (or not at all if the
    * base is bucketed by it; AQE broadcasts the change side when the
    * day's delta is small, the common case). No driver materialization
    * at any size.
    */
  def mergeApply(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key)
    require(payload.nonEmpty && base.columns.contains(key),
      s"key $key must be a base column with payload alongside")
    val latest = changes.groupBy(col(key))
      .agg(max_by(struct((payload :+ "op").map(col): _*), col("seq")).as("ch"))
    base.join(latest, Seq(key), "full_outer")
      .filter(col("ch").isNull || col("ch.op") =!= "D")
      .select(col(key) +: payload.map(c =>
        when(col("ch").isNotNull, col(s"ch.$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Deterministic demo change stream over `orders` for the driver row:
    * keys ≡0 (mod 10) are deleted; keys ≡1 get TWO update versions
    * (seq 1 adds 1000, seq 2 doubles — latest must win); keys ≡2 spawn
    * inserts at key+10^9 (collision-free with the base key space).
    * Payloads are single IEEE ops on parquet-read doubles — engine-
    * identical by construction, same contract as the tfidf weights.
    */
  def demoOrderChanges(orders: DataFrame): DataFrame = {
    val b = orders
    def tagged(df: DataFrame, op: String, seq: Long) =
      df.withColumn("op", lit(op)).withColumn("seq", lit(seq))
    val u1 = tagged(b.filter(col("o_orderkey") % 10 === 1)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0), "U", 1L)
    val u2 = tagged(b.filter(col("o_orderkey") % 10 === 1)
      .withColumn("o_totalprice", col("o_totalprice") * 2.0), "U", 2L)
    val d = tagged(b.filter(col("o_orderkey") % 10 === 0), "D", 1L)
    val i = tagged(b.filter(col("o_orderkey") % 10 === 2)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000000L), "I", 1L)
    u1.union(u2).union(d).union(i)
  }

  /** Orders projected to the portable payload shape shared by the CDC
    * demos (order dates as epoch micros, the suite's timestamp contract).
    */
  def baseOrders(orders: DataFrame): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("ord_us"),
      col("o_orderpriority"))

  /** The registered merged snapshot: orders + demo changes. */
  def mergeUpsertDemo(orders: DataFrame): DataFrame = {
    val base = baseOrders(orders)
    mergeApply(base, demoOrderChanges(base), "o_orderkey")
  }

  /** SCD2 history build — the history-preserving twin of [[mergeApply]]:
    * instead of the latest snapshot, emit EVERY version as a validity
    * interval. The base snapshot is version seq=0; each change opens a
    * version at its seq; a version closes at the next change's seq
    * (`valid_to_seq`, null while current); D tombstones close their
    * predecessor and emit nothing. One user_id-free window per key — a
    * single hash shuffle on the key at any scale, no joins at all.
    */
  def scd2(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key)
    val versions = base.select(
        (col(key) +: payload.map(col)) ++
          Seq(lit("I").as("op"), lit(0L).as("seq")): _*)
      .unionByName(changes.select(
        (col(key) +: payload.map(col)) ++
          Seq(col("op"), col("seq").cast("long").as("seq")): _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy("seq")
    versions
      .withColumn("valid_to_seq", lead("seq", 1).over(w))
      .filter(col("op") =!= "D")
      .select((col(key) +: payload.map(col)) ++ Seq(
        col("seq").as("valid_from_seq"), col("valid_to_seq"),
        when(col("valid_to_seq").isNull, 1L).otherwise(0L)
          .as("is_current")): _*)
  }

  /** The registered SCD2 history: orders as version 0 + demo changes. */
  def scd2Demo(orders: DataFrame): DataFrame = {
    val base = baseOrders(orders)
    scd2(base, demoOrderChanges(base), "o_orderkey")
  }

  /** Point-in-time lookup over an SCD2 history: the table exactly as it
    * stood at `atSeq` — the consumption contract the history exists
    * for. Pure interval filter (valid_from ≤ t < valid_to, open
    * current), zero joins/shuffles: time travel is a scan predicate.
    * The oracle reconstructs the same snapshot INDEPENDENTLY (replaying
    * changes up to t with last-writer-wins), so a hash match proves the
    * interval endpoints are mutually consistent, not just well-formed.
    */
  def pitLookup(history: DataFrame, atSeq: Long): DataFrame =
    history.filter(col("valid_from_seq") <= atSeq &&
        (col("valid_to_seq").isNull || col("valid_to_seq") > atSeq))
      .drop("valid_from_seq", "valid_to_seq", "is_current")

  /** Row-level table diff: classify every key across two snapshots as
    * added / removed / changed / unchanged — the reconciliation report
    * behind every migration cutover and replication audit (the
    * row-resolution complement of the digest-only tableDigest).
    *
    * One full-outer equi-join on the key; payloads compare as single
    * structs (null-safe), so the exchange carries each row once and the
    * comparison is one codegen'd struct equality, not N column joins.
    * Returns per-status counts + key checksums: bounded output (≤ 4
    * rows) at any table size.
    */
  def tableDiff(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val payload = a.columns.filterNot(_ == key)
    require(b.columns.sorted.sameElements(a.columns.sorted),
      "tableDiff requires identical schemas")
    val l = a.select(col(key), struct(payload.map(col): _*).as("_pa"))
    val r = b.select(col(key), struct(payload.map(col): _*).as("_pb"))
    l.join(r, Seq(key), "full_outer")
      .select(col(key),
        when(col("_pa").isNull, "added")
          .when(col("_pb").isNull, "removed")
          .when(!(col("_pa") <=> col("_pb")), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sum(col(key)).as("sum_key"))
  }
}
