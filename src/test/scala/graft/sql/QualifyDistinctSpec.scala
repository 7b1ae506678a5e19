package graft.sql

import graft.SparkSpec

/** QUALIFY, SELECT DISTINCT [ON (…)], and RANGE window frames — the
  * round-7 dialect extensions (all DuckDB-compatible, batch/pull only). */
class QualifyDistinctSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    Seq(("a", 1L, 30L), ("a", 2L, 10L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("b", 5L, 7L), ("b", 6L, 9L)).toDF("k", "i", "v")
      .createOrReplaceTempView("qd_t")
  }

  private def rejects(sql: String, frag: String): Unit = {
    val ex = intercept[Exception](e.sql(sql) match { case r: Object => r })
    assert(ex.getMessage != null && ex.getMessage.toLowerCase
      .contains(frag.toLowerCase), s"message for [$sql]: ${ex.getMessage}")
  }

  test("QUALIFY filters by select alias of a window function") {
    setup()
    val got = e.batch(
      """SELECT k, i, ROW_NUMBER() OVER (PARTITION BY k
           ORDER BY v DESC, i) AS rk
         FROM qd_t QUALIFY rk <= 1 ORDER BY k;""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(("a", 1L, 1), ("b", 6L, 1)))
  }

  test("QUALIFY with an inline OVER expression") {
    setup()
    val got = e.batch(
      """SELECT k, i FROM qd_t
         QUALIFY RANK() OVER (PARTITION BY k ORDER BY v DESC) = 1
         ORDER BY k, i;""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // RANK gives both ties in group a (v=30 at i=1 and i=3)
    assert(got.toSeq == Seq(("a", 1L), ("a", 3L), ("b", 6L)))
  }

  test("rank<=k under QUALIFY plans as a window group limit, not a full sort-and-filter") {
    setup()
    val plan = e.batch(
      """SELECT k, i, ROW_NUMBER() OVER (PARTITION BY k
           ORDER BY v DESC, i) AS rk
         FROM qd_t QUALIFY rk <= 1;""")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("DISTINCT ON picks the first row per key in ORDER BY order") {
    setup()
    val got = e.batch(
      """SELECT DISTINCT ON (k) k, i, v FROM qd_t
         ORDER BY k, v DESC, i;""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L, 30L), ("b", 6L, 9L)))
    val plan = e.batch(
      """SELECT DISTINCT ON (k) k, i, v FROM qd_t
         ORDER BY k, v DESC, i;""").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("SELECT DISTINCT dedups after projection") {
    setup()
    val got = e.batch("SELECT DISTINCT k, v FROM qd_t ORDER BY k, v;")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 7L),
      ("b", 9L)))
  }

  test("RANGE frame offsets are value-typed (gaps widen the reach)") {
    setup()
    // group a values at i = 1,2,3,4: RANGE 2 PRECEDING on i covers rows
    // whose i is within [cur-2, cur] — at i=4 that is i∈{2,3,4}
    val got = e.batch(
      """SELECT i, SUM(v) OVER (PARTITION BY k ORDER BY i
           RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s
         FROM qd_t WHERE k = 'a' ORDER BY i;""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 30L), (2L, 40L), (3L, 70L), (4L, 60L)))
  }

  test("IS [NOT] NULL postfix (extension) evaluates three-valued") {
    import spark.implicits._
    Seq((1L, Some(5L)), (2L, None)).toDF("id", "v")
      .createOrReplaceTempView("isn_t")
    val got = e.batch(
      "SELECT id, v IS NULL AS a, v IS NOT NULL AS b FROM isn_t ORDER BY id;")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, false, true), (2L, true, false)))
  }

  test("rejections carry dialect vocabulary") {
    setup()
    rejects("SELECT k, i FROM qd_t QUALIFY i > 1;", "QUALIFY must reference a window function")
    rejects("SELECT k FROM qd_t QUALIFY RANK() OVER (ORDER BY v) = 1 EMIT CHANGES;",
      "not supported in continuous")
    rejects("""SELECT k, COUNT(*) AS c FROM qd_t GROUP BY k
               QUALIFY RANK() OVER (ORDER BY k) = 1;""", "cannot combine with GROUP BY")
    rejects("SELECT DISTINCT ON (k) k, i FROM qd_t;", "DISTINCT ON requires ORDER BY")
    rejects("""SELECT DISTINCT ON (k) k,
                 ROW_NUMBER() OVER (ORDER BY i) AS rk
               FROM qd_t ORDER BY k;""", "cannot combine with window functions")
    rejects("SELECT DISTINCT k FROM qd_t ORDER BY v;",
      "ORDER BY must reference output columns")
    rejects("SELECT DISTINCT k, COUNT(*) AS c FROM qd_t GROUP BY k ORDER BY k;",
      "cannot combine with GROUP BY")
    rejects("""SELECT SUM(v) OVER (PARTITION BY k ORDER BY i, v
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s
               FROM qd_t;""", "exactly one ORDER BY key")
    rejects("""SELECT SUM(v) OVER (PARTITION BY k ORDER BY k
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s
               FROM qd_t;""", "RANGE")
    rejects("""SELECT SUM(v) OVER (PARTITION BY k ORDER BY i
                 GROUPS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s
               FROM qd_t;""", "GROUPS")
  }
}
