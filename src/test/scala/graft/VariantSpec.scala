package graft

import org.apache.spark.sql.functions._

/** Spark 4 VARIANT type — the semi-structured column path that replaces
  * string-JSON probing for schema-on-read data (the `events.props`
  * shape at scale): parse once into the binary variant encoding, then
  * typed `variant_get` extraction that Catalyst can push into the scan.
  * Exercised on the events table's real JSON props column. Test-only
  * surface: DuckDB has no variant encoding to oracle against, and the
  * graded JSON path (q_json_funcs/q_json_schema) already covers the
  * oracle-checkable semantics. */
class VariantSpec extends SparkSpec {

  test("parse_json -> variant_get round-trips the events props field typed") {
    val df = Tables.events(spark, sf0001)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k_typed", expr("variant_get(v, '$.k', 'long')"))
      .withColumn("k_string", expr("cast(get_json_object(props, '$.k') as long)"))
    val bad = df.filter(
      (col("k_typed").isNotNull || col("k_string").isNotNull) &&
        !(col("k_typed") <=> col("k_string"))).count()
    assert(bad == 0, "variant_get disagrees with the string-JSON path")
    assert(df.filter(col("k_typed").isNotNull).count() > 0, "no typed values extracted")
  }

  test("variant column survives a shuffle and aggregates by extracted key") {
    val agg = Tables.events(spark, sf0001)
      .withColumn("v", parse_json(col("props")))
      .groupBy(expr("variant_get(v, '$.k', 'long') % 10").as("kb"))
      .count().collect()
    assert(agg.length > 1 && agg.map(_.getLong(1)).sum ==
      Tables.events(spark, sf0001).count())
  }

  test("schema_of_variant reports the encoded type") {
    val s = Tables.events(spark, sf0001).limit(1)
      .select(expr("schema_of_variant(parse_json(props))")).collect()(0).getString(0)
    assert(s.contains("OBJECT<") && s.contains("k: BIGINT"),
      s"unexpected variant schema: $s")
  }
}
