package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Join operators.
  *
  * Reference semantics (cited, not copied): the single join in the
  * reference is a reduce-side tagged inner equi-join — mapper tags rows
  * by source path, composite key (k, tag), partition on k, group on k,
  * secondary sort on tag (LeanJoin.java:56-100, TextPair.java:10-60,
  * KeyPartition.java:13-17, CommonReduce.java:15-25). All of that
  * machinery is what Spark's shuffled sort-merge/hash join does natively;
  * the tag disappears because the planner knows both sides.
  *
  * Scale notes: equi-joins shuffle both sides on the key unless one side
  * is broadcast. `dimJoin` forces broadcast for small dimension tables so
  * the 100 TB fact side never moves. AQE (enabled in the session) handles
  * skewed keys by splitting oversized partitions at runtime.
  */
object JoinOps {

  def inner(l: DataFrame, r: DataFrame, cond: Column): DataFrame = l.join(r, cond, "inner")

  /** EXISTS — reference had no semi join; strict superset. */
  def semi(l: DataFrame, r: DataFrame, cond: Column): DataFrame = l.join(r, cond, "left_semi")

  /** NOT EXISTS. */
  def anti(l: DataFrame, r: DataFrame, cond: Column): DataFrame = l.join(r, cond, "left_anti")

  /** Fact ⋈ small dim: broadcast the dim so the fact side never shuffles. */
  def dimJoin(fact: DataFrame, dim: DataFrame, cond: Column,
              joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, joinType)
}
