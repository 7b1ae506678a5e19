package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.HFunctions._

/** SURVEY §2.3 scalar expression engine: math/trig, string ops, CAST,
  * BETWEEN, IFNULL/NULLIF, array functions, JSON access — each exercised
  * end-to-end against a DuckDB oracle. All expressions are Catalyst
  * built-ins (whole-stage codegen; no UDFs).
  *
  * Floating-point outputs are rounded on both sides: Java's libm and
  * DuckDB's C libm can differ in the last ulp for transcendentals.
  */
object ScalarQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // UnaryOp.hs math set: ABS CEIL FLOOR ROUND SIGN SQRT LOG LOG2 LOG10 EXP.
    "q_scalar_math" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .select(
          $"event_id",
          round(abs($"value" - 100), 4).as("v_abs"),
          ceil($"value").as("v_ceil"),
          floor($"value").as("v_floor"),
          round($"value").cast("long").as("v_round"),
          signum($"value" - 100).cast("double").as("v_sign"),
          round(sqrt($"value"), 6).as("v_sqrt"),
          round(log($"value" + 1), 6).as("v_ln"),
          round(log2($"value" + 1), 6).as("v_log2"),
          round(log10($"value" + 1), 6).as("v_log10"),
          round(exp($"value" / 100), 6).as("v_exp"))
        .orderBy($"event_id")
    }),

    // UnaryOp.hs trig set incl. hyperbolics (SIN..ATANH).
    "q_scalar_trig" -> ((s, dir) => {
      import s.implicits._
      val x = col("value") / 1000 // bound into (-1, 1) for asin/atanh (max value ~560 at sf0.1)
      Tables.load(s, dir, "events")
        .select(
          $"event_id",
          round(sin($"value"), 6).as("v_sin"),
          round(cos($"value"), 6).as("v_cos"),
          round(tan($"value" / 1000), 6).as("v_tan"),
          round(asin(x), 6).as("v_asin"),
          round(acos(x), 6).as("v_acos"),
          round(atan($"value"), 6).as("v_atan"),
          round(sinh(x), 6).as("v_sinh"),
          round(cosh(x), 6).as("v_cosh"),
          round(tanh(x), 6).as("v_tanh"),
          round(asinh(x), 6).as("v_asinh"),
          round(acosh($"value" + 1), 6).as("v_acosh"),
          round(atanh(x), 6).as("v_atanh"))
        .orderBy($"event_id")
    }),

    // String ops: TO_LOWER TO_UPPER TRIM REVERSE STRLEN TAKE TAKEEND DROP
    // DROPEND SPLIT(+ARRAY_JOIN) CHUNKSOF (UnaryOp.hs / BinOp.hs).
    "q_scalar_string" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(
          $"doc_id",
          lower($"source").as("v_lower"),
          upper($"lang").as("v_upper"),
          reverse($"source").as("v_rev"),
          strLen($"text").as("v_len"),
          hTake(lit(10), $"text").as("v_take"),
          hTakeEnd(lit(8), $"text").as("v_takeend"),
          hDrop(lit(100), $"text").as("v_drop"),
          hDropEnd(lit(200), $"text").as("v_dropend"),
          array_join(hSplit(hTake(lit(40), $"text"), lit(" ")), "|").as("v_split"),
          array_join(chunksOf(7, hTake(lit(30), $"text")), "|").as("v_chunks"))
        .orderBy($"doc_id")
    }),

    // CAST (Cast.hs:52-258), BETWEEN [SYMMETRIC] (TerOp.hs), IFNULL/NULLIF.
    "q_scalar_cast_between" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .select(
          $"event_id",
          floor($"value").cast("long").as("v_int"),
          $"user_id".cast("double").as("v_dbl"),
          $"ts".cast("date").as("v_date"),
          hBetween($"value", lit(50), lit(150)).as("v_between"),
          hBetweenSymmetric($"value", lit(150), lit(50)).as("v_between_sym"),
          ifNull(nullIf($"event_type", lit("error")), lit("was_error")).as("v_ifnull"),
          hEq($"event_type", lit("click")).as("v_nullsafe_eq"),
          hNeq(nullIf($"event_type", lit("error")), lit("click")).as("v_nullsafe_neq"))
        .orderBy($"event_id")
    }),

    // JSON ops -> ->> (JsonOp.hs:33-84) over the JSON text column.
    "q_json_ops" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .select(
          $"event_id",
          jsonGetText($"props", "k").as("v_text"),
          // explicit text→long cast, NOT the variant-typed jsonGet: this
          // oracle defines text-cast semantics (CAST(json_extract_string)),
          // and get_json_object's streaming single-key extract is ~40%
          // cheaper than a full variant parse — the right plan for a hot
          // scan extracting one scalar. Typed `->` access is gated by
          // q_sql_json and HFunctionsSpec instead.
          jsonGetText($"props", "k").cast("long").as("v_typed"),
          jsonIsNum($"props", "k").as("v_isnum"))
        .orderBy($"event_id")
    }),

    // Array functions (SQL-v1.cf:316-327) over word arrays derived from
    // documents: DISTINCT/CONTAIN/LENGTH/MAX/MIN/SORT/JOIN + 0-based index
    // and slice (Common.hs:72-86); set ops EXCEPT/INTERSECT/UNION/REMOVE.
    "q_array_funcs" -> ((s, dir) => {
      import s.implicits._
      val words = split(col("text"), " ")
      Tables.load(s, dir, "documents")
        .select($"doc_id", words.as("w"))
        .select(
          $"doc_id",
          size($"w").as("v_len"),
          size(array_distinct($"w")).as("v_distinct_len"),
          array_contains($"w", "data").as("v_contains"),
          array_max($"w").as("v_max"),
          array_min($"w").as("v_min"),
          array_join(slice(sort_array($"w"), 1, 5), "|").as("v_sorted5"),
          arrayGet($"w", 0).as("v_idx0"),
          array_join(arraySlice($"w", 1, 4), "|").as("v_slice"),
          array_join(array_sort(array_except($"w", array(lit("the"), lit("a")))), "|").as("v_except"),
          array_join(array_sort(array_intersect($"w", array(lit("data"), lit("query")))), "|").as("v_intersect"),
          array_join(array_sort(array_remove($"w", "the")), "|").as("v_remove"))
        .orderBy($"doc_id")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_scalar_math" ->
      """SELECT event_id,
         round(abs(value - 100),4) AS v_abs,
         CAST(ceil(value) AS BIGINT) AS v_ceil,
         CAST(floor(value) AS BIGINT) AS v_floor,
         CAST(round(value) AS BIGINT) AS v_round,
         CAST(sign(value - 100) AS DOUBLE) AS v_sign,
         round(sqrt(value),6) AS v_sqrt,
         round(ln(value + 1),6) AS v_ln,
         round(log2(value + 1),6) AS v_log2,
         round(log10(value + 1),6) AS v_log10,
         round(exp(value / 100),6) AS v_exp
         FROM events ORDER BY event_id""",
    "q_scalar_trig" ->
      """SELECT event_id,
         round(sin(value),6) AS v_sin,
         round(cos(value),6) AS v_cos,
         round(tan(value/1000),6) AS v_tan,
         round(asin(value/1000),6) AS v_asin,
         round(acos(value/1000),6) AS v_acos,
         round(atan(value),6) AS v_atan,
         round((exp(value/1000) - exp(-value/1000))/2,6) AS v_sinh,
         round((exp(value/1000) + exp(-value/1000))/2,6) AS v_cosh,
         round((exp(2*value/1000) - 1)/(exp(2*value/1000) + 1),6) AS v_tanh,
         round(ln(value/1000 + sqrt((value/1000)*(value/1000) + 1)),6) AS v_asinh,
         round(ln(value + 1 + sqrt((value+1)*(value+1) - 1)),6) AS v_acosh,
         round(0.5*ln((1 + value/1000)/(1 - value/1000)),6) AS v_atanh
         FROM events ORDER BY event_id""",
    "q_scalar_string" ->
      """SELECT doc_id,
         lower(source) AS v_lower,
         upper(lang) AS v_upper,
         reverse(source) AS v_rev,
         length(text) AS v_len,
         left(text, 10) AS v_take,
         right(text, 8) AS v_takeend,
         substr(text, 101) AS v_drop,
         left(text, greatest(length(text) - 200, 0)) AS v_dropend,
         array_to_string(string_split(left(text, 40), ' '), '|') AS v_split,
         array_to_string(regexp_extract_all(left(text, 30), '(?s).{1,7}'), '|') AS v_chunks
         FROM documents ORDER BY doc_id""",
    "q_scalar_cast_between" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT event_id,
         CAST(floor(value) AS BIGINT) AS v_int,
         CAST(user_id AS DOUBLE) AS v_dbl,
         CAST(ts AS DATE) AS v_date,
         value BETWEEN 50 AND 150 AS v_between,
         value BETWEEN least(150,50) AND greatest(150,50) AS v_between_sym,
         coalesce(nullif(event_type,'error'), 'was_error') AS v_ifnull,
         event_type IS NOT DISTINCT FROM 'click' AS v_nullsafe_eq,
         nullif(event_type,'error') IS DISTINCT FROM 'click' AS v_nullsafe_neq
         FROM ev ORDER BY event_id""",
    "q_json_ops" ->
      """SELECT event_id,
         json_extract_string(props, '$.k') AS v_text,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS v_typed,
         TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL AS v_isnum
         FROM events ORDER BY event_id""",
    "q_array_funcs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         SELECT doc_id,
         length(w) AS v_len,
         length(array_distinct(w)) AS v_distinct_len,
         list_contains(w, 'data') AS v_contains,
         list_max(w) AS v_max,
         list_min(w) AS v_min,
         array_to_string(list_sort(w)[1:5], '|') AS v_sorted5,
         w[1] AS v_idx0,
         array_to_string(w[2:4], '|') AS v_slice,
         coalesce(array_to_string(list_sort(array_distinct(list_filter(w, x -> x NOT IN ('the','a')))), '|'), '') AS v_except,
         coalesce(array_to_string(list_sort(array_distinct(list_filter(w, x -> x IN ('data','query')))), '|'), '') AS v_intersect,
         array_to_string(list_sort(list_filter(w, x -> x <> 'the')), '|') AS v_remove
         FROM d ORDER BY doc_id""".stripMargin
  )
}
