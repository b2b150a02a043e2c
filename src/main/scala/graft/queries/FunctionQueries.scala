package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Completeness fill-in for function/join families the reference lacks
  * entirely (SURVEY.md §2.3 "absent", §2.8 "absent"): full/cross joins,
  * date/time functions, regexp extraction, array functions. Outputs are
  * scalars/strings only (array/struct values never cross the oracle hash).
  */
object FunctionQueries {

  // ---- Full outer join with unmatched rows on both sides ---------------------
  def fullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_custkey") < 500)
      .select(col("c_custkey"), col("c_mktsegment"))
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_urgent"))
    cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_mktsegment"), lit("<none>")).as("segment"),
        coalesce(col("n_urgent"), lit(0L)).cast("long").as("n_urgent"),
        col("c_custkey").isNull.as("cust_missing"),
        col("o_custkey").isNull.as("orders_missing"))
      .orderBy("custkey")
  }

  val fullOuterJoinSql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 500),
      |urgent AS (
      |  SELECT o_custkey, count(*) AS n_urgent FROM orders
      |  WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
      |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
      |  COALESCE(c_mktsegment, '<none>') AS segment,
      |  CAST(COALESCE(n_urgent, 0) AS BIGINT) AS n_urgent,
      |  c_custkey IS NULL AS cust_missing,
      |  o_custkey IS NULL AS orders_missing
      |FROM cust FULL OUTER JOIN urgent ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  // ---- Cross join ------------------------------------------------------------
  def crossJoinRegions(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select(col("r_name"))
      .crossJoin(Tables.nation(s, dir).select(col("n_name")))
      .orderBy("r_name", "n_name")

  val crossJoinRegionsSql: String =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  // ---- Date/time functions ---------------------------------------------------
  def datetimeFunctions(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 300)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_end"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
      .orderBy("o_orderkey")

  val datetimeFunctionsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  CAST(day(o_orderdate) AS BIGINT) AS d,
      |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |  strftime(CAST(o_orderdate AS DATE) + INTERVAL '30 days', '%Y-%m-%d') AS plus30,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_end,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
      |FROM orders WHERE o_orderkey < 300
      |ORDER BY o_orderkey""".stripMargin

  // ---- Regexp extraction + string functions ----------------------------------
  def regexpFunctions(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") < 300)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "#(\\d+)", 1).as("cust_num"),
        regexp_extract(col("c_name"), "([A-Za-z]+)#", 1).as("cust_word"),
        (length(col("c_name")) - length(regexp_replace(col("c_name"), "0", "")))
          .cast("long").as("zeros"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        replace(col("c_mktsegment"), lit("I"), lit("!")).as("seg_repl"))
      .orderBy("c_custkey")

  val regexpFunctionsSql: String =
    """SELECT c_custkey,
      |  COALESCE(regexp_extract(c_name, '#(\d+)', 1), '') AS cust_num,
      |  COALESCE(regexp_extract(c_name, '([A-Za-z]+)#', 1), '') AS cust_word,
      |  CAST(length(c_name) - length(replace(c_name, '0', '')) AS BIGINT) AS zeros,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
      |  reverse(c_mktsegment) AS seg_rev,
      |  replace(c_mktsegment, 'I', '!') AS seg_repl
      |FROM customer WHERE c_custkey < 300
      |ORDER BY c_custkey""".stripMargin

  // ---- Array functions (scalar outputs only) ---------------------------------
  def arrayFunctions(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.functions.Tokenizer.tokenize(col("text"))
    Tables.documents(s, dir)
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        array_contains(toks, "spark").as("has_spark"),
        coalesce(array_position(toks, "spark"), lit(0L)).cast("long").as("spark_pos"),
        element_at(toks, 1).as("first_tok"),
        element_at(sort_array(toks), 1).as("min_tok"),
        element_at(sort_array(toks, asc = false), 1).as("max_tok"))
      .orderBy("doc_id")
  }

  val arrayFunctionsSql: String =
    s"""WITH ${OracleSql.TokCte}
       |SELECT doc_id,
       |  CAST(len(l) AS BIGINT) AS n,
       |  CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct,
       |  list_contains(l, 'spark') AS has_spark,
       |  CAST(COALESCE(list_position(l, 'spark'), 0) AS BIGINT) AS spark_pos,
       |  l[1] AS first_tok,
       |  list_aggregate(l, 'min') AS min_tok,
       |  list_aggregate(l, 'max') AS max_tok
       |FROM docs_l WHERE doc_id < 100
       |ORDER BY doc_id""".stripMargin

  // ---- Linear-regression aggregates -------------------------------------------
  // The regr_* family (slope/intercept/r2/count + avgs) per event type:
  // value regressed on event-time day — the per-segment trend extraction
  // analytics dashboards run; one partial-aggregated pass (moments), no
  // window, no second scan.
  def regressionAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), col("value"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
          .cast("double").as("x"))
      .groupBy(col("event_type"))
      // pinned to the 1e-6 grid: regression stats on near-uncorrelated
      // data sit close to zero, where the comparator's RELATIVE epsilon
      // would amplify benign cross-engine moment-cancellation noise
      .agg(
        round(expr("regr_slope(value, x)"), 6).cast("double").as("slope"),
        round(expr("regr_intercept(value, x)"), 6).cast("double").as("intercept"),
        round(expr("regr_r2(value, x)"), 6).cast("double").as("r2"),
        expr("regr_count(value, x)").cast("long").as("n"))
      .orderBy("event_type")

  val regressionAggSql: String =
    """SELECT event_type,
      |  CAST(round(regr_slope(value, x), 6) AS DOUBLE) AS slope,
      |  CAST(round(regr_intercept(value, x), 6) AS DOUBLE) AS intercept,
      |  CAST(round(regr_r2(value, x), 6) AS DOUBLE) AS r2,
      |  CAST(regr_count(value, x) AS BIGINT) AS n
      |FROM (
      |  SELECT event_type, value,
      |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE) AS x
      |  FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- Higher-order array functions -------------------------------------------
  // transform / filter / exists / aggregate / zip_with over the embedding
  // vectors, reduced to scalars for the oracle hash. The lambda forms stay
  // inside whole-stage codegen (no UDF boxing).
  def hofFunctions(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < 100)
      .select(col("vec_id"),
        expr("CAST(round(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x), 6) AS DOUBLE)")
          .as("sum_v"),
        expr("CAST(size(filter(embedding, x -> x > 0)) AS BIGINT)").as("n_pos"),
        expr("exists(embedding, x -> x > 0.9)").as("has_big"),
        expr("""CAST(round(aggregate(
                  zip_with(embedding, reverse(embedding), (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),
                  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x), 6) AS DOUBLE)""")
          .as("dot_reversed"),
        expr("CAST(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE)")
          .as("max_abs"))
      .orderBy("vec_id")

  val hofFunctionsSql: String =
    """SELECT vec_id,
      |  CAST(round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS DOUBLE) AS sum_v,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
      |  len(list_filter(embedding, x -> x > 0.9)) > 0 AS has_big,
      |  CAST(round(list_dot_product(
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |    list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6) AS DOUBLE) AS dot_reversed,
      |  CAST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE) AS max_abs
      |FROM embeddings
      |WHERE vec_id < 100
      |ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "full_outer_join" -> (fullOuterJoin _),
    "cross_join_regions" -> (crossJoinRegions _),
    "datetime_functions" -> (datetimeFunctions _),
    "regexp_functions" -> (regexpFunctions _),
    "array_functions" -> (arrayFunctions _),
    "regression_agg" -> (regressionAgg _),
    "hof_functions" -> (hofFunctions _))

  val oracles: Map[String, String] = Map(
    "full_outer_join" -> fullOuterJoinSql,
    "cross_join_regions" -> crossJoinRegionsSql,
    "datetime_functions" -> datetimeFunctionsSql,
    "regexp_functions" -> regexpFunctionsSql,
    "array_functions" -> arrayFunctionsSql,
    "regression_agg" -> regressionAggSql,
    "hof_functions" -> hofFunctionsSql)
}
