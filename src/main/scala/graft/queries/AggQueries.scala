package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TopK

/** SURVEY §2.5 aggregation specifics beyond the core pack: TOPK /
  * TOPKDISTINCT (custom Aggregator), NULL-handling in COUNT, HAVING,
  * multi-agg composition (Common.hs:96-119 — in Spark, just N agg columns).
  */
object AggQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // TOPK(val, k) exploded to rows (array columns don't hash-compare
    // portably); values are the deterministic multiset even under ties.
    "q_topk" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(TopK.topk($"l_extendedprice", 5).as("vals"))
        .select($"l_returnflag", posexplode($"vals"))
        .select($"l_returnflag", ($"pos" + 1).cast("long").as("rnk"),
          round($"col", 2).as("price"))
        .orderBy($"l_returnflag", $"rnk")
    }),

    "q_topk_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .agg(TopK.topkDistinct($"l_quantity", 10).as("vals"))
        .select($"l_linestatus", posexplode($"vals"))
        .select($"l_linestatus", ($"pos" + 1).cast("long").as("rnk"),
          round($"col", 2).as("qty"))
        .orderBy($"l_linestatus", $"rnk")
    }),

    // COUNT(e) NULL semantics: the reference counts every row regardless of
    // NULLs (AggOp.hs:68-71); we implement SQL-correct COUNT(e) and expose
    // the reference behavior as COUNT(*) — both shown here (documented
    // divergence, SURVEY §7.3).
    "q_agg_count_nulls" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .withColumn("maybe", when($"event_type" === "error", lit(null).cast("double"))
          .otherwise($"value"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("cnt_star"),
          count($"maybe").as("cnt_val"),
          round(sum($"maybe"), 2).as("sum_val"))
        .orderBy($"user_id")
    }),

    // HAVING (Filter over aggregated relation — Planner.hs:380-382).
    "q_having" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .filter($"n" >= 3)
        .orderBy($"o_custkey")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_topk" ->
      """SELECT l_returnflag, rnk, price FROM (
           SELECT l_returnflag,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC) AS rnk,
             round(l_extendedprice, 2) AS price
           FROM lineitem)
         WHERE rnk <= 5 ORDER BY l_returnflag, rnk""",
    "q_topk_distinct" ->
      """SELECT l_linestatus, rnk, qty FROM (
           SELECT l_linestatus,
             row_number() OVER (PARTITION BY l_linestatus
                                ORDER BY q DESC) AS rnk,
             round(q, 2) AS qty
           FROM (SELECT DISTINCT l_linestatus, l_quantity AS q FROM lineitem))
         WHERE rnk <= 10 ORDER BY l_linestatus, rnk""",
    "q_agg_count_nulls" ->
      """SELECT user_id, count(*) AS cnt_star,
         count(CASE WHEN event_type='error' THEN NULL ELSE value END) AS cnt_val,
         round(sum(CASE WHEN event_type='error' THEN NULL ELSE value END),2) AS sum_val
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_having" ->
      """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice),2) AS total
         FROM orders GROUP BY 1 HAVING count(*) >= 3 ORDER BY 1"""
  )
}
