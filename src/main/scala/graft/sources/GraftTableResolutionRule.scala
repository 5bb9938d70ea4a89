package graft.sources

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Resolution rule that turns a [[GraftTable]] relation into the
  * ANALYZED [[graft.ops.SinkOps.readVersion]] plan — the read half of
  * catalog-named tables: by the time Spark's capability checks run, no
  * [[GraftTable]] relation remains, and `SELECT * FROM graft.db.t
  * [VERSION|TIMESTAMP AS OF ...]` IS the path-addressed snapshot read
  * (epoch-grouped DV anti-joins, schema evolution, time travel —
  * bit-identical by construction), with Catalyst pushing filters and
  * column pruning into the spliced plan like any other relation.
  *
  * A created-but-never-committed table reads as EMPTY with its
  * declared schema (the catalog's one divergence from the raw path
  * API, whose readVersion refuses — a name that EXISTS in the catalog
  * is an empty table, not an error; a name that doesn't is a loud
  * `NoSuchTableException` from loadTable, never a silent empty).
  *
  * Injected by [[graft.functions.GraftExtensions]]; runs in the
  * analyzer's resolution fixpoint after the built-ins, so the
  * built-in ResolveRelations creates the DSv2 relation and this rule
  * replaces it within the same batch.
  */
case class GraftTableResolutionRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // One head-listing per DISTINCT table root per analysis run: a
    // query referencing the same graft table k times (self-join,
    // UNION of time-travel reads over one root) pays one driver FS
    // listing, not k (r14 VERDICT #5). Plan splices stay per-relation
    // — each occurrence needs its own attribute ids.
    val headCache = scala.collection.mutable.Map[String, Int]()
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        val head = headCache.getOrElseUpdate(t.root,
          graft.ops.SinkOps.currentVersion(spark, t.root))
        val df =
          if (head >= 1) t.snapshot(spark)
          else spark.createDataFrame(
            java.util.Collections.emptyList[Row](), t.schema)
        val snap = GraftSqlBridge.plan(df)
        // References above may already be bound to the relation's
        // attribute ids (the built-in resolver runs earlier in the
        // same fixpoint iteration) — re-alias the spliced plan's
        // output onto those ids so the replacement is invisible.
        val resolver = spark.sessionState.conf.resolver
        Project(r.output.map { a =>
          val src = snap.output.find(o => resolver(o.name, a.name))
            .getOrElse(throw new IllegalStateException(
              s"graft table ${t.name()} resolution drift: relation " +
                s"column ${a.name} missing from the snapshot plan " +
                s"(${snap.output.map(_.name).mkString(", ")})"))
          Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        }, snap)
    }
  }
}
