package graft.sql

import org.apache.spark.sql.catalyst.plans.logical._
import graft.SparkSpec

/** Logical-plan shape golden tests — the meaningful port of the reference's
  * plan corpus (hstream-sql/etc/plan-test-cases.yaml + Planner.hs decouple
  * ordering): WHERE compiles below the aggregation, HAVING above it,
  * the final Project on top, and scalar-only selects stay Filter+Project.
  */
class PlanSpec extends SparkSpec {

  private def analyzed(sql: String) = {
    import spark.implicits._
    Seq((1L, "a", 2L)).toDF("x", "k", "v").createOrReplaceTempView("s_plan")
    new SqlEngine(spark).batch(sql).queryExecution.analyzed
  }

  private def ops(plan: LogicalPlan): Seq[String] =
    plan.collect { case n => n.nodeName }

  test("scalar select compiles to Project over Filter over scan (Planner.hs:343-350)") {
    val plan = analyzed("SELECT x NOT BETWEEN SYMMETRIC 0 AND 42 AS b FROM s_plan WHERE v > 1;")
    val names = ops(plan)
    val (p, f) = (names.indexOf("Project"), names.indexOf("Filter"))
    assert(p >= 0 && f > p, s"expected Project above Filter, got $names")
    assert(!names.contains("Aggregate"))
  }

  test("WHERE below Aggregate, HAVING above it (Planner.hs:339-387)") {
    val plan = analyzed(
      "SELECT k, SUM(v) AS s FROM s_plan WHERE v > 0 GROUP BY k HAVING SUM(v) < 10;")
    val names = ops(plan)
    val proj = names.indexOf("Project")
    val havingFilter = names.indexOf("Filter")
    val agg = names.indexOf("Aggregate")
    val whereFilter = names.lastIndexOf("Filter")
    assert(proj < havingFilter && havingFilter < agg && agg < whereFilter,
      s"expected Project > Filter(HAVING) > Aggregate > Filter(WHERE), got $names")
  }

  test("aggregates are extracted and deduplicated (Planner.hs:352-367)") {
    val plan = analyzed(
      "SELECT SUM(v) AS a, SUM(v) + SUM(v) AS b FROM s_plan GROUP BY k;")
    val aggs = plan.collect { case a: Aggregate => a }.head
    // one physical SUM(v), referenced three times
    assert(aggs.aggregateExpressions.flatMap(_.collect {
      case e if e.nodeName == "AggregateExpression" => e
    }).size == 1, aggs.toString)
  }
}
