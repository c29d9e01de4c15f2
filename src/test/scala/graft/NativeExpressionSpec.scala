package graft

import graft.functions.ArrayCosineSimilarity
import org.apache.spark.sql.functions._

/** The native codegen'd cosine expression: registration, agreement with
  * the declarative HOF formulation bit-for-bit, and codegen activation. */
class NativeExpressionSpec extends SparkSpec {

  test("graft_cosine registers idempotently and evaluates") {
    ArrayCosineSimilarity.register(spark)
    ArrayCosineSimilarity.register(spark) // second call is a no-op
    val r = spark.sql("SELECT graft_cosine(array(1.0d, 2.0d), array(2.0d, 1.0d)) AS c").collect()
    assert(math.abs(r.head.getDouble(0) - 0.8) < 1e-12)
  }

  test("bit-identical to the declarative HOF cosine on real embeddings") {
    ArrayCosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sf0001)
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("r", reverse(col("v")))
    val both = e.select(
      expr("graft_cosine(v, r)").as("native"),
      (aggregate(zip_with(col("v"), col("r"), (x, y) => x * y), lit(0.0), (a, x) => a + x)
        / (sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x))
          * sqrt(aggregate(col("r"), lit(0.0), (a, x) => a + x * x)))).as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0, s"$mismatches rows where native != HOF (bitwise)")
  }

  test("expression participates in whole-stage codegen") {
    ArrayCosineSimilarity.register(spark)
    val plan = Tables.embeddings(spark, sf0001)
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .select(expr("graft_cosine(v, reverse(v))"))
      .queryExecution.executedPlan
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    val line = plan.toString.linesIterator.find(_.contains("graft_cosine"))
    assert(line.exists(_.trim.startsWith("*")),
      s"graft_cosine not inside a codegen span:\n$plan")
  }

  test("null and type safety") {
    ArrayCosineSimilarity.register(spark)
    val r = spark.sql("SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").collect()
    assert(r.head.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT graft_cosine('abc', array(1.0d))").collect()
    }
  }
}
