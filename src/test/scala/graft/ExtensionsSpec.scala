package graft

import org.apache.spark.sql.GraftPlanBridge

/** The production injection path: `spark.sql.extensions=
  * graft.GraftExtensions` must contribute every custom piece — both
  * planner strategies, the range-join optimizer rule, and the
  * graft_cosine function — to a configured session. The builder methods
  * are private[sql], so the assertions cross through GraftPlanBridge
  * instead of tearing down the suite's shared session to build a
  * configured one. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions contributes both strategies and the optimizer rule") {
    val (strategies, rules) =
      GraftPlanBridge.builtExtensions(spark, new GraftExtensions().apply)
    assert(strategies.contains(graft.plans.AsOfJoinStrategy),
      s"as-of strategy missing: $strategies")
    assert(strategies.contains(graft.plans.CosineJoinStrategy),
      s"cosine strategy missing: $strategies")
    assert(rules.exists(_ == graft.plans.RangeJoinRewrite),
      s"range-join rewrite missing: $rules")
  }

  test("GraftExtensions registers graft_cosine under its declared name") {
    // the descriptor GraftExtensions injects is the same one the
    // runtime register() path uses — name and builder must agree
    val (name, _, _) = graft.functions.ArrayCosineSimilarity.descriptor
    assert(name.funcName == "graft_cosine", s"unexpected function name: $name")
    graft.functions.ArrayCosineSimilarity.register(spark)
    val self = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS c").head().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }
}
