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

  /** Column ↔ catalyst Expression crossings for custom aggregates
    * (TypedImperativeAggregate has no public Column constructor). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
