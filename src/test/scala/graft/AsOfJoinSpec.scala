package graft

import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The custom AsOfJoin operator (LogicalPlan + Strategy + Exec):
  * plan shape, strict-inequality semantics at ties, and end-to-end
  * agreement with the window-trick formulation on real data. */
class AsOfJoinSpec extends SparkSpec {

  test("custom operator plans as AsOfJoinExec with a streaming merge") {
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val c = ev.filter(col("event_type") === "click").select("user_id", "ts")
    val joined = GraftPlanBridge.asofJoin(p, c, "user_id", "ts")
    // SparkPlan.nodeName strips the "Exec" suffix in plan display
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("!AsOfJoin"), s"plan integrity violation (missing producedAttributes):\n$plan")
    assert(joined.columns.last == "asof_ts")
  }

  test("strictly-earlier semantics, including exact-tie exclusion") {
    import spark.implicits._
    def t(m: Int) = new Timestamp(m * 60000L)
    val left = Seq((1L, 10L, t(10)), (2L, 10L, t(20)), (3L, 20L, t(5)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, t(10)), (10L, t(15)), (20L, t(5)))
      .toDF("user_id", "ts")
    val out = GraftPlanBridge.asofJoin(left, right, "user_id", "ts")
      .select("event_id", "asof_ts").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).isEmpty, "tie at t=10 must NOT match (strict <)")
    assert(out(2L).contains(t(15).getTime * 1000), "latest earlier click (t=15) expected")
    assert(out(3L).isEmpty, "tie at t=5 must NOT match")
  }

  test("unmet column requirements fail analysis with a per-column diagnosis") {
    import spark.implicits._
    val left = Seq((1L, "oops")).toDF("user_id", "ts") // ts is a string
    val right = Seq((1L, 5L)).toDF("user_id", "ts")
    // CheckAnalysis reports the unresolved operator (the exact exception
    // class differs by Spark version); what matters is that resolution
    // FAILS without aborting analyzer probes, and the node's string form
    // carries the per-column diagnosis
    val wrongType = intercept[Exception] {
      GraftPlanBridge.asofJoin(left, right, "user_id", "ts").collect()
    }
    assert(wrongType.getMessage.contains("left.ts is string"),
      s"diagnosis missing from: ${wrongType.getMessage}")

    val absent = intercept[Exception] {
      GraftPlanBridge.asofJoin(right.select("user_id"), right, "user_id", "ts").collect()
    }
    assert(absent.getMessage.contains("left side has no column 'ts'"),
      s"missing-column diagnosis absent from: ${absent.getMessage}")
  }

  test("custom operator agrees with the window-trick q_join_asof end-to-end") {
    val viaWindow = graft.queries.EventQueries.queries("q_join_asof")(spark, sf0001).collect().toSeq
    val viaCustom = graft.queries.EventQueries.queries("q_asof_custom")(spark, sf0001).collect().toSeq
    assert(viaCustom == viaWindow,
      s"divergence:\ncustom: $viaCustom\nwindow: $viaWindow")
  }
}
