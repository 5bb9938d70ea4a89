package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

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
}
