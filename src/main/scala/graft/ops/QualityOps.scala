package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/dbt-test
  * shape): a suite of expectations evaluated against a table in bulk,
  * one violation report out — the gate a 100 TB ingest runs before
  * publishing a partition.
  *
  * Design: every constraint reduces to either an aggregate over the
  * table (not-null, range, set membership — all fused into ONE shared
  * scan/aggregation) or a keyed violation count (uniqueness = groupBy
  * HAVING, referential integrity = anti join against the dimension).
  * Output is uniformly (constraint, n_violations, sample_key): bounded
  * rows at any table size (column `check_name`; "constraint" is a
  * reserved word in several dialects), sample_key = the max offending
  * key so a
  * failing gate points at a concrete row (max, not first: deterministic
  * under any partition layout).
  */
object QualityOps {

  sealed trait Constraint { def name: String }
  /** `col` must never be null. */
  case class NotNull(col: String) extends Constraint {
    val name = s"not_null($col)"
  }
  /** `col` must lie in [lo, hi] (when non-null). */
  case class InRange(col: String, lo: Double, hi: Double) extends Constraint {
    val name = s"range($col)"
  }
  /** `col` must be one of `allowed` (when non-null). */
  case class InSet(col: String, allowed: Seq[String]) extends Constraint {
    val name = s"in_set($col)"
  }
  /** `col` values must be unique across the table. */
  case class Unique(col: String) extends Constraint {
    val name = s"unique($col)"
  }
  /** Every non-null `col` must exist in `dim`'s `dimCol` (FK). */
  case class ForeignKey(col: String, dim: DataFrame, dimCol: String)
      extends Constraint {
    val name = s"foreign_key($col)"
  }
  /** Arbitrary boolean SQL expression over the row (the Delta
    * `ADD CONSTRAINT CHECK (<expr>)` shape): a row violates when the
    * expression evaluates to FALSE; TRUE and NULL pass (the SQL
    * standard's CHECK semantics — an unknown is not a violation).
    * Row-local, so it fuses into the shared single-pass aggregate.
    */
  case class CheckExpr(sql: String) extends Constraint {
    val name = s"expr($sql)"
  }
  /** [[ForeignKey]] addressed by TABLE PATH instead of a DataFrame —
    * the SQL-reachable spelling: the dimension is the HEAD snapshot of
    * the manifest-versioned table at `dimPath`, resolved at CHECK time
    * (so a gate declared once always checks against the dimension's
    * current head, the FK semantics a catalog would give).
    */
  case class ForeignKeyRef(col: String, dimPath: String, dimCol: String)
      extends Constraint {
    val name = s"foreign_key($col)"
  }

  /** Evaluate a constraint suite. Row-local constraints (not-null /
    * range / in-set) fuse into one shared aggregation pass; each Unique
    * adds one keyed count, each ForeignKey one anti join. `keyCol`
    * labels violations in the report.
    */
  def check(df: DataFrame, keyCol: String,
            constraints: Seq[Constraint]): DataFrame = {
    val spark = df.sparkSession
    val key = col(keyCol).cast("long")

    def rowLocalViolation(c: Constraint): Option[Column] = c match {
      case NotNull(cn) => Some(col(cn).isNull)
      case InRange(cn, lo, hi) =>
        Some(col(cn).isNotNull && (col(cn) < lo || col(cn) > hi))
      case InSet(cn, allowed) =>
        Some(col(cn).isNotNull && !col(cn).isin(allowed: _*))
      case CheckExpr(sql) =>
        // Violation iff the expression is definitively FALSE — a NULL
        // (unknown) passes, per the SQL standard's CHECK semantics.
        Some(expr(sql) === lit(false))
      case _ => None
    }

    val rowLocal = constraints.flatMap(c => rowLocalViolation(c).map(c -> _))
    val fused: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else Some {
        // One scan, one aggregation row for ALL row-local constraints:
        // each contributes a conditional count + conditional max key.
        val aggs = rowLocal.flatMap { case (c, bad) => Seq(
          sum(when(bad, 1L).otherwise(0L)).as(s"n_${c.name}"),
          max(when(bad, key)).as(s"k_${c.name}"))
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val reports = rowLocal.map { case (c, _) => struct(
          lit(c.name).as("check_name"),
          col(s"n_${c.name}").as("n_violations"),
          col(s"k_${c.name}").as("sample_key"))
        }
        one.select(explode(array(reports: _*)).as("r")).select("r.*")
      }

    val keyed: Seq[DataFrame] = constraints.collect {
      case c @ Unique(cn) =>
        // Violations = rows beyond the first per duplicated value;
        // sample = the max key among rows of duplicated values.
        df.groupBy(col(cn)).agg(count(lit(1)).as("cnt"), max(key).as("mk"))
          .filter(col("cnt") > 1)
          .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n_violations"),
            max(col("mk")).as("sample_key"))
          .select(lit(c.name).as("check_name"), col("n_violations"),
            col("sample_key"))
      case c @ ForeignKey(cn, dim, dimCol) =>
        df.filter(col(cn).isNotNull)
          .join(dim.select(col(dimCol).as(cn)).distinct(), Seq(cn), "left_anti")
          .agg(count(lit(1)).as("n_violations"), max(key).as("sample_key"))
          .select(lit(c.name).as("check_name"), col("n_violations"),
            col("sample_key"))
      case c @ ForeignKeyRef(cn, dimPath, dimCol) =>
        val dim = SinkOps.readVersion(spark, dimPath)
        df.filter(col(cn).isNotNull)
          .join(dim.select(col(dimCol).as(cn)).distinct(), Seq(cn), "left_anti")
          .agg(count(lit(1)).as("n_violations"), max(key).as("sample_key"))
          .select(lit(c.name).as("check_name"), col("n_violations"),
            col("sample_key"))
    }

    (fused.toSeq ++ keyed).reduce(_.unionByName(_))
  }

  /** Deterministically dirtied orders for the driver row (the scrub
    * dirtyCorpus precedent): duplicated keys, nulled statuses, negative
    * prices, and a dangling-FK custkey slice — so every constraint has
    * real violations to find, reproducibly in both engines.
    */
  def dirtyOrders(orders: DataFrame): DataFrame = {
    val base = orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"))
    val dirtied = base.select(col("o_orderkey"),
      when(col("o_orderkey") % 23 === 0, col("o_custkey") + 1000000000L)
        .otherwise(col("o_custkey")).as("o_custkey"),
      when(col("o_orderkey") % 13 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"),
      when(col("o_orderkey") % 17 === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("o_totalprice"))
    // Every key ≡ 0 (mod 19) appears twice (second copy re-keyed into
    // the same key space → true duplicates).
    dirtied.union(dirtied.filter(col("o_orderkey") % 19 === 0))
  }
}
