package org.apache.spark.sql

import graft.plans.{AsOfJoin, AsOfJoinStrategy}

/** Bridge into Spark's private[sql] plan-construction API — the standard
  * pattern for libraries that contribute custom logical plans (a shim
  * object inside org.apache.spark.sql to reach Dataset.ofRows, cf. the
  * extension shims in public Spark-extension projects). Everything
  * engine-specific lives in graft.plans; this file only crosses the
  * visibility boundary.
  */
object GraftPlanBridge {

  /** As-of join via the custom operator: left rows + `asof_ts` (micros of
    * the greatest strictly-earlier right time per key, null if none).
    * Idempotently installs the planner strategy on the session. */
  def asofJoin(left: Dataset[Row], right: Dataset[Row],
               keyCol: String, timeCol: String): DataFrame = {
    val cl = left.asInstanceOf[classic.Dataset[Row]]
    val cr = right.asInstanceOf[classic.Dataset[Row]]
    val spark = cl.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = AsOfJoinStrategy +: spark.experimental.extraStrategies
    }
    classic.Dataset.ofRows(spark,
      AsOfJoin(cl.queryExecution.analyzed, cr.queryExecution.analyzed, keyCol, timeCol))
  }

  /** (rowCount if the optimizer knows it, sizeInBytes estimate) of a
    * DataFrame's optimized plan — free driver-side statistics for
    * sizing decisions that would otherwise burn a count() job. */
  def planStats(df: Dataset[Row]): (Option[BigInt], BigInt) = {
    val st = df.asInstanceOf[classic.Dataset[Row]].queryExecution.optimizedPlan.stats
    (st.rowCount, st.sizeInBytes)
  }

  /** The analyzed logical plan of a DataFrame — what a table-valued
    * function builder contributes to the analyzer (Dataset's
    * queryExecution is private[sql] behind the api split). */
  def analyzedPlan(df: Dataset[Row]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Column ↔ catalyst Expression crossings for custom aggregates
    * (TypedImperativeAggregate has no public Column constructor). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Apply an extensions installer to a fresh SparkSessionExtensions and
    * return what it would contribute to a new session — the builder
    * methods are private[sql], so the config-path test
    * (`spark.sql.extensions=graft.GraftExtensions`) crosses the
    * visibility boundary here instead of tearing down the shared test
    * session to build a configured one. */
  def builtExtensions(spark: SparkSession, installer: SparkSessionExtensions => Unit)
  : (Seq[execution.SparkStrategy],
     Seq[org.apache.spark.sql.catalyst.rules.Rule[
       org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]) = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val ext = new SparkSessionExtensions
    installer(ext)
    (ext.buildPlannerStrategies(cs), ext.buildOptimizerRules(cs))
  }
}
