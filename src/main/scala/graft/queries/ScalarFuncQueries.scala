package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** SURVEY §2.8 scalar function packs: string / date / math / array /
  * generator / json / map+struct. All codegen'd builtin expressions —
  * no UDFs in this group (UDF surface is UdxQueries).
  *
  * Cross-engine dtype discipline: every computed integer (year, length,
  * datediff, ceil, ...) is cast to BIGINT on both sides; regexes stick to
  * the Java-regex/RE2 common subset ([0-9], \s); array elements are
  * FLOAT on disk and widened to DOUBLE before arithmetic in both engines.
  */
object ScalarFuncQueries extends QueryGroup {

  val queries: Map[String, QFn] = Map(
    "q_string_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").like("STA%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "a", "_").as("name_repl"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("long").as("brand_num"))
        .orderBy("p_partkey")),

    "q_date_funcs" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          fmtDate(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("ship_days"),
          fmtDate(last_day(col("o_orderdate"))).as("month_end"),
          fmtDate(add_months(col("o_orderdate"), 3)).as("plus3m"))
        .orderBy("l_orderkey", "l_linenumber")),

    "q_math_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          round(sqrt(col("p_retailprice")), 2).as("sqrt_price"),
          round(log(col("p_retailprice")), 2).as("ln_price"),
          round(log10(col("p_retailprice")), 2).as("log10_price"),
          round(abs(col("p_retailprice") - 950.0), 2).as("abs_diff"),
          ceil(col("p_retailprice")).cast("long").as("ceil_price"),
          floor(col("p_retailprice")).cast("long").as("floor_price"),
          pow(col("p_size").cast("double"), 2.0).cast("long").as("size_sq"),
          pmod(col("p_partkey"), lit(7)).cast("long").as("key_mod7"))
        .orderBy("p_partkey")),

    "q_array_funcs" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
        .withColumn("s5", slice(col("v"), 1, 5))
      e.select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        r3(element_at(col("s5"), 1)).as("el1"),
        r3(element_at(col("s5"), 2)).as("el2"),
        r3(element_at(col("s5"), 3)).as("el3"),
        r3(element_at(col("s5"), 4)).as("el4"),
        r3(element_at(col("s5"), 5)).as("el5"),
        r3(array_max(col("v"))).as("vmax"),
        r3(array_min(col("v"))).as("vmin"))
        .orderBy("vec_id")
    }),

    // posexplode generator: per-position stats over the first 8 dims.
    "q_explode_pos" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(slice(transform(col("embedding"), x => x.cast("double")), 1, 8))
            .as(Seq("pos", "val")))
        .groupBy("pos")
        .agg(count(lit(1)).as("n"), round(avg(col("val")), 3).as("avg_val"))
        .select(col("pos").cast("long").as("pos"), col("n"), col("avg_val"))
        .orderBy("pos")),

    // ---- URL parsing (ORACLE) -------------------------------------------
    // The crawl-pipeline decomposition step: synthesized per-doc URLs
    // pulled apart with parse_url (HOST/PATH/QUERY + query-param
    // extraction), rolled up per host. The oracle rebuilds the same
    // parts from the source columns directly, so hash equality proves
    // parse_url's decomposition against the URL's known construction —
    // not against another engine's parser quirks.
    "q_url_funcs" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.org/"), col("lang"), lit("/doc/"), col("doc_id"),
          lit("?k="), col("n_chars") % 10))
      t.select(
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'k')").cast("long").as("k"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("path")).as("n_paths"),
          sum(col("k")).as("sum_k"))
        .orderBy("host")
    }),

    // ---- higher-order array functions (ORACLE) --------------------------
    // transform/filter/exists/forall/aggregate as codegen-adjacent
    // row-local vector ops — the lambda surface a feature pipeline leans
    // on instead of exploding arrays. Counts come from filter lengths
    // (portably identical to exists/forall), and the aggregate fold runs
    // on a micro-unit integer grid so the fold order can't produce float
    // drift. Oracle mirrors with DuckDB list lambdas.
    "q_hof_funcs" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      e.select(col("label"),
          size(filter(col("v"), x => x > 0)).cast("long").as("n_pos"),
          exists(col("v"), x => x > 0.3).as("has_big"),
          forall(col("v"), x => abs(x) < lit(0.5)).as("all_small"),
          aggregate(transform(col("v"),
            x => floor(x * 1000000.0 + 0.5).cast("long")), lit(0L),
            (acc, x) => acc + x).as("sum_micro"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("n_pos")).as("total_pos"),
          expr("count_if(has_big)").as("n_has_big"),
          expr("count_if(all_small)").as("n_all_small"),
          sum(col("sum_micro")).as("mass_micro"))
        .select(col("label").cast("int").as("label"), col("n_vecs"),
          col("total_pos"), col("n_has_big"), col("n_all_small"), col("mass_micro"))
        .orderBy("label")
    }),

    "q_map_struct" -> ((s, d) => {
      // build a map + struct from scalar columns, then extract back out —
      // outputs are flattened scalars (nested types never hash-compared).
      val m = Tables.documents(s, d)
        .withColumn("meta", map(lit("lang"), col("lang"), lit("src"), col("source")))
        .withColumn("st", struct(col("doc_id").as("id"), col("n_chars").as("chars")))
      m.select(
        col("meta").getItem("lang").as("lang_x"),
        col("st").getField("chars").as("chars_x"))
        .groupBy("lang_x")
        .agg(count(lit(1)).as("n_docs"), sum(col("chars_x")).as("sum_chars"))
        .orderBy("lang_x")
    }),

    // VARIANT — Spark 4's semi-structured type (the modern replacement
    // for string-JSON hot paths: a binary encoding with typed path
    // extraction, no per-row re-parse in each expression). Build a
    // nested JSON document per order, parse_json it ONCE into a
    // variant, then extract typed paths: nested object field, array
    // index, bigint id; try_variant_get on an absent path is NULL (not
    // an error — the schema-on-read contract). The extracted values
    // equal the source columns, so the oracle replays from `orders`
    // directly — grading that the variant round-trip is lossless.
    "q_variant_funcs" -> ((s, d) => {
      val js = Tables.orders(s, d).select(
        to_json(struct(
          col("o_orderkey").as("id"),
          struct(col("o_orderpriority").as("pri"),
            col("o_orderstatus").as("st")).as("meta"),
          array(pmod(col("o_orderkey"), lit(7)),
            pmod(col("o_orderkey"), lit(11))).as("tags"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))).as("js"))
      js.select(expr("parse_json(js)").as("v"))
        .select(
          expr("variant_get(v, '$.meta.pri', 'string')").as("pri"),
          expr("variant_get(v, '$.id', 'bigint')").as("id"),
          expr("variant_get(v, '$.tags[1]', 'bigint')").as("tag1"),
          expr("variant_get(v, '$.cents', 'bigint')").as("cents"),
          expr("try_variant_get(v, '$.nope.deep', 'bigint')").as("missing"))
        .groupBy("pri")
        .agg(count(lit(1)).as("n"),
          sum(pmod(col("id"), lit(1000))).as("sum_id_mod"),
          sum(col("tag1")).as("sum_tag1"),
          sum(col("cents")).as("total_cents"),
          count(col("missing")).as("n_missing"))
        .orderBy("pri")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_variant_funcs" ->
      ("SELECT o_orderpriority AS pri, count(*) AS n, " +
        "CAST(sum(o_orderkey % 1000) AS BIGINT) AS sum_id_mod, " +
        "CAST(sum(o_orderkey % 11) AS BIGINT) AS sum_tag1, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents, " +
        "CAST(0 AS BIGINT) AS n_missing " +
        "FROM orders GROUP BY pri ORDER BY pri"),
    "q_string_funcs" ->
      ("SELECT p_partkey, upper(p_name) AS name_upper, substr(p_name, 1, 5) AS name_pfx, " +
        "CAST(length(p_name) AS BIGINT) AS name_len, p_brand || ':' || p_type AS brand_type, " +
        "regexp_replace(p_name, 'a', '_', 'g') AS name_repl, " +
        "CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num " +
        "FROM part WHERE p_type LIKE 'STA%' ORDER BY p_partkey"),
    "q_date_funcs" ->
      ("SELECT l_orderkey, l_linenumber, CAST(year(o_orderdate) AS BIGINT) AS yr, " +
        "CAST(month(o_orderdate) AS BIGINT) AS mo, CAST(quarter(o_orderdate) AS BIGINT) AS qtr, " +
        "strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start, " +
        "CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS ship_days, " +
        "strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end, " +
        "strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey ORDER BY l_orderkey, l_linenumber"),
    "q_math_funcs" ->
      ("SELECT p_partkey, round(sqrt(p_retailprice), 2) AS sqrt_price, " +
        "round(ln(p_retailprice), 2) AS ln_price, round(log10(p_retailprice), 2) AS log10_price, " +
        "round(abs(p_retailprice - 950.0), 2) AS abs_diff, " +
        "CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price, CAST(floor(p_retailprice) AS BIGINT) AS floor_price, " +
        "CAST(power(CAST(p_size AS DOUBLE), 2.0) AS BIGINT) AS size_sq, " +
        "CAST(p_partkey % 7 AS BIGINT) AS key_mod7 " +
        "FROM part ORDER BY p_partkey"),
    "q_array_funcs" ->
      ("SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, " +
        "floor(CAST(embedding[1] AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS el1, " +
        "floor(CAST(embedding[2] AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS el2, " +
        "floor(CAST(embedding[3] AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS el3, " +
        "floor(CAST(embedding[4] AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS el4, " +
        "floor(CAST(embedding[5] AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS el5, " +
        "floor(list_aggregate(CAST(embedding AS DOUBLE[]), 'max') * 1000.0 + 0.5) / 1000.0 AS vmax, " +
        "floor(list_aggregate(CAST(embedding AS DOUBLE[]), 'min') * 1000.0 + 0.5) / 1000.0 AS vmin " +
        "FROM embeddings ORDER BY vec_id"),
    "q_explode_pos" ->
      ("SELECT CAST(i - 1 AS BIGINT) AS pos, count(*) AS n, " +
        "round(avg(CAST(embedding[i] AS DOUBLE)), 3) AS avg_val " +
        "FROM embeddings, (SELECT unnest(generate_series(1, 8)) AS i) idx " +
        "GROUP BY i ORDER BY pos"),
    "q_map_struct" ->
      ("SELECT lang AS lang_x, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents GROUP BY lang ORDER BY lang_x"),
    "q_url_funcs" ->
      ("SELECT source || '.example.org' AS host, count(*) AS n_docs, " +
        "count(DISTINCT '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)) AS n_paths, " +
        "CAST(sum(n_chars % 10) AS BIGINT) AS sum_k " +
        "FROM documents GROUP BY host ORDER BY host"),
    "q_hof_funcs" ->
      ("WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "p AS (SELECT label, " +
        "CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos, " +
        "len(list_filter(v, x -> x > 0.3)) > 0 AS has_big, " +
        "len(list_filter(v, x -> abs(x) < 0.5)) = len(v) AS all_small, " +
        "CAST(list_sum(list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT) AS sum_micro FROM e) " +
        "SELECT CAST(label AS INT) AS label, count(*) AS n_vecs, " +
        "CAST(sum(n_pos) AS BIGINT) AS total_pos, CAST(count_if(has_big) AS BIGINT) AS n_has_big, " +
        "CAST(count_if(all_small) AS BIGINT) AS n_all_small, CAST(sum(sum_micro) AS BIGINT) AS mass_micro " +
        "FROM p GROUP BY label ORDER BY label"),
  )
}
