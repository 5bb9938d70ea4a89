package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters —
  * the standard pattern for libraries that define native Catalyst
  * expressions against Spark 4's backend-agnostic Column API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame — what a table-valued
    * function builder returns so `SELECT ... FROM graft_version(...)`
    * splices a library-built read straight into the enclosing query's
    * plan (Catalyst then pushes filters/pruning into it like any
    * other relation).
    */
  def plan(df: Dataset[Row]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** DataFrame over a logical plan — what a DML command's `run` uses
    * to hand its parsed (still unresolved) source query back to the
    * session for analysis + execution.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Batch DataFrame → streaming-tagged leaf for a V1 streaming
    * Source's `getBatch` (the Kafka-source pattern): the micro-batch
    * engine asserts the returned plan has isStreaming=true, and
    * re-tagging the plan's own relations would expose its internal
    * joins (the DV anti-join fold) to the incremental planner's
    * stream-stream join strategies. Wrapping the compiled RDD in a
    * streaming LogicalRDD leaf keeps the whole source plan opaque —
    * planned once as a batch, spliced as a leaf. Lazy: `toRdd` builds
    * the DAG, nothing runs until the sink's action.
    */
  def asStreamingBatch(df: Dataset[Row]): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Streaming micro-batch slice → plain batch DataFrame for a V1
    * Sink's `addBatch` (the inverse of [[asStreamingBatch]]): the
    * engine hands addBatch a streaming-tagged plan that batch writers
    * refuse ("must be executed with writeStream.start()"); re-rooting
    * the compiled RDD as a batch leaf is the standard sink shape
    * (Kafka's). Lazy until the write's action.
    */
  def asBatch(df: Dataset[Row]): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Register a native expression as a SQL temp function on a live
    * session (the builder-time path is SparkSessionExtensions).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Register a table-valued function on a live session (the
    * builder-time path is SparkSessionExtensions.injectTableFunction).
    */
  def registerTableFunction(spark: SparkSession, name: String,
                            builder: Seq[Expression] => LogicalPlan)
      : Unit =
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
