package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL-text front door for the lakehouse readers — TABLE-VALUED
  * FUNCTIONS, so ad-hoc SQL (e.g. through `graft.tools.RunJob`)
  * reaches the foreign formats with no Scala DataFrame construction:
  *
  * {{{
  *   SELECT ... FROM delta_scan('/path')              -- latest version
  *   SELECT ... FROM delta_scan('/path', 3)           -- VERSION AS OF
  *   SELECT ... FROM iceberg_scan('/path'[, snapId])
  *   SELECT ... FROM hudi_scan('/path'[, 'instant'])
  * }}}
  *
  * Each builder runs at ANALYSIS time on the driver — exactly where
  * the readers already do their KB-scale metadata planning (log
  * replay / manifest walk / timeline listing) — and contributes the
  * reader's analyzed plan, which Catalyst then optimizes like any
  * view: the caller's filters and projections land on the underlying
  * parquet scan (pushdown and pruning intact). Arguments must be
  * literals (the table location IS metadata; a column-dependent path
  * has no meaning at plan time).
  *
  * Registered by [[graft.GraftExtensions]] (the
  * `spark.sql.extensions` production path) and idempotently at
  * runtime via [[register]] for sessions built without configs.
  */
object LakeScanTvf {

  type TvfDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  private def litString(e: Expression, fn: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a string literal here, got $other")
  }

  private def litLong(e: Expression, fn: String): Long = e match {
    case Literal(v: Long, LongType)   => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal here, got $other")
  }

  private def plan(df: DataFrame): LogicalPlan =
    org.apache.spark.sql.GraftPlanBridge.analyzedPlan(df)

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.LakeScanTvf", null, name, usage, "", "", "",
      "table_funcs", "", "", "built-in")

  val deltaScan: TvfDescriptor = (
    FunctionIdentifier("delta_scan"),
    info("delta_scan", "delta_scan(path[, version]) - snapshot read of a Delta table"),
    (args: Seq[Expression]) => {
      val s = SparkSession.active
      args match {
        case Seq(p) =>
          plan(graft.sources.DeltaLogReader.read(s, litString(p, "delta_scan")))
        case Seq(p, v) =>
          plan(graft.sources.DeltaLogReader.read(s, litString(p, "delta_scan"),
            litLong(v, "delta_scan")))
        case _ => throw new IllegalArgumentException(
          "delta_scan takes (path[, version])")
      }
    })

  val icebergScan: TvfDescriptor = (
    FunctionIdentifier("iceberg_scan"),
    info("iceberg_scan", "iceberg_scan(path[, snapshotId]) - snapshot read of an Iceberg table"),
    (args: Seq[Expression]) => {
      val s = SparkSession.active
      args match {
        case Seq(p) =>
          plan(graft.sources.IcebergReader.read(s, litString(p, "iceberg_scan")))
        case Seq(p, v) =>
          plan(graft.sources.IcebergReader.read(s, litString(p, "iceberg_scan"),
            litLong(v, "iceberg_scan")))
        case _ => throw new IllegalArgumentException(
          "iceberg_scan takes (path[, snapshotId])")
      }
    })

  val hudiScan: TvfDescriptor = (
    FunctionIdentifier("hudi_scan"),
    info("hudi_scan", "hudi_scan(path[, instant]) - snapshot read of a Hudi CoW table"),
    (args: Seq[Expression]) => {
      val s = SparkSession.active
      args match {
        case Seq(p) =>
          plan(graft.sources.HudiReader.read(s, litString(p, "hudi_scan")))
        case Seq(p, t) =>
          plan(graft.sources.HudiReader.readAsOf(s, litString(p, "hudi_scan"),
            litString(t, "hudi_scan")))
        case _ => throw new IllegalArgumentException(
          "hudi_scan takes (path[, instant])")
      }
    })

  val all: Seq[TvfDescriptor] = Seq(deltaScan, icebergScan, hudiScan)

  /** Idempotent runtime registration on a session built without
    * `spark.sql.extensions` (the same discipline as the scalar
    * function registrations). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.tableFunctionRegistry
    all.foreach { d =>
      if (!registry.functionExists(d._1)) registry.registerFunction(d._1, d._2, d._3)
    }
  }
}
