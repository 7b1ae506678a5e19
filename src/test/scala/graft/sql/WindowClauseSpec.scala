package graft.sql

import graft.SparkSpec

/** Named WINDOW clause (standard SQL; extension): parse-time, per-SELECT
  * resolution of `OVER name` references. */
class WindowClauseSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("b", 1L, 5L))
      .toDF("k", "i", "v").createOrReplaceTempView("wc_t")
  }

  test("named window == the same spec written inline") {
    setup()
    val named = e.batch(
      """SELECT i, SUM(v) OVER w AS s, COUNT(v) OVER w AS c
         FROM wc_t
         WINDOW w AS (PARTITION BY k ORDER BY i
                      ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
         ORDER BY k, i;""").collect().map(_.toString).toSeq
    val inline = e.batch(
      """SELECT i, SUM(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s,
                COUNT(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c
         FROM wc_t ORDER BY k, i;""").collect().map(_.toString).toSeq
    assert(named == inline && named.nonEmpty)
  }

  test("named window carries EXCLUDE; QUALIFY may reference one; unknown name rejected") {
    setup()
    val ex = intercept[Exception](e.batch(
      """SELECT i, SUM(v) OVER w2 AS s
         FROM wc_t WINDOW w AS (PARTITION BY k ORDER BY i);""").collect())
    assert(ex.getMessage.contains("unknown window name 'w2'"), ex.getMessage)
    // EXCLUDE CURRENT ROW travels with the named spec; QUALIFY's
    // COUNT(v) OVER w = 0 filters the lone row of partition b (frame
    // minus current = empty)
    val ok = e.batch(
      """SELECT i, SUM(v) OVER w AS s
         FROM wc_t
         WINDOW w AS (PARTITION BY k ORDER BY i
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                      EXCLUDE CURRENT ROW)
         QUALIFY COUNT(v) OVER w > 0
         ORDER BY i;""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ok.toSeq == Seq((1L, 20L), (2L, 40L), (3L, 20L)))
    // r13: the frame-valued collected plan composes with named windows
    // too — FIRST_VALUE through the same EXCLUDE-carrying spec (k='a':
    // ±1 frame minus current → 20,10,20; k='b' lone row → NULL)
    val fv = e.batch(
      """SELECT k, i, FIRST_VALUE(v) OVER w AS f
         FROM wc_t
         WINDOW w AS (PARTITION BY k ORDER BY i
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                      EXCLUDE CURRENT ROW)
         ORDER BY k, i;""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(fv.toSeq == Seq(("a", 1L, 20L), ("a", 2L, 10L), ("a", 3L, 20L),
      ("b", 1L, -1L)), fv.toSeq)
  }

  test("scoping: a subquery's WINDOW clause is invisible outside") {
    setup()
    val ex = intercept[Exception](e.batch(
      """SELECT SUM(v) OVER w AS s
         FROM (SELECT k, i, v FROM wc_t WINDOW w AS (PARTITION BY k)) t;""")
      .collect())
    assert(ex.getMessage.contains("unknown window name 'w'"), ex.getMessage)
  }

  test("window refinement: OVER (w …) extends the base; chaining resolves in order") {
    setup()
    // refinement adds ORDER BY + frame to a partition-only base
    val refined = e.batch(
      """SELECT i, SUM(v) OVER (w ORDER BY i
           ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
         FROM wc_t WINDOW w AS (PARTITION BY k) ORDER BY k, i;""")
      .collect().map(_.toString).toSeq
    val inline = e.batch(
      """SELECT i, SUM(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
         FROM wc_t ORDER BY k, i;""").collect().map(_.toString).toSeq
    assert(refined == inline && refined.nonEmpty)
    // chaining: w2 refines w1 in the WINDOW clause itself; the frame
    // lands on the final use site
    val chained = e.batch(
      """SELECT i, SUM(v) OVER (w2 ROWS BETWEEN 1 PRECEDING
                                AND CURRENT ROW) AS s
         FROM wc_t
         WINDOW w1 AS (PARTITION BY k), w2 AS (w1 ORDER BY i)
         ORDER BY k, i;""").collect().map(_.toString).toSeq
    assert(chained == inline)
    // empty refinement of a frameless base == bare reference
    val bare = e.batch(
      """SELECT i, SUM(v) OVER (w) AS s, SUM(v) OVER w AS s2
         FROM wc_t WINDOW w AS (PARTITION BY k ORDER BY i)
         ORDER BY k, i;""").collect()
    assert(bare.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("window refinement rejections: PARTITION BY, double ORDER BY, framed base, forward chain") {
    setup()
    def rejects(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](e.batch(sql).collect())
      assert(ex.getMessage != null && ex.getMessage.contains(frag),
        s"message for [$sql] was: ${ex.getMessage}")
    }
    rejects("""SELECT SUM(v) OVER (w PARTITION BY i) AS s
         FROM wc_t WINDOW w AS (PARTITION BY k);""",
      "cannot specify PARTITION BY")
    rejects("""SELECT SUM(v) OVER (w ORDER BY v) AS s
         FROM wc_t WINDOW w AS (PARTITION BY k ORDER BY i);""",
      "base window already has one")
    rejects("""SELECT SUM(v) OVER (w ORDER BY i) AS s
         FROM wc_t WINDOW w AS (PARTITION BY k
           ROWS BETWEEN 1 PRECEDING AND CURRENT ROW);""",
      "is final")
    rejects("""SELECT SUM(v) OVER w2 AS s
         FROM wc_t WINDOW w2 AS (w1 ORDER BY i), w1 AS (PARTITION BY k);""",
      "defined earlier")
  }

  test("ordered aggregates work through named windows and refinement") {
    setup()
    // STRING_AGG OVER w (bare ref) and OVER (w ...) refinement both
    // resolve; in-call ORDER BY v DESC sorts elements, w frames rows
    val got = e.batch(
      """SELECT i,
                STRING_AGG(v, ',' ORDER BY v DESC) OVER w AS run_desc,
                STRING_AGG(v, ',' ORDER BY v DESC) OVER (wp ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ref_desc
         FROM wc_t
         WINDOW wp AS (PARTITION BY k),
                w AS (wp ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY k, i;""").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "10", "10"), (2L, "20,10", "20,10"), (3L, "30,20,10", "30,20,10"),
      (1L, "5", "5")), got.toSeq)
  }

  test("plan pin: functions sharing a named window land in ONE Window exec") {
    setup()
    // three functions over the same named spec (same partition + order)
    // must not plan three sort+window passes — Spark groups window
    // expressions by (partitionSpec, orderSpec) into one WindowExec
    val df = e.batch(
      """SELECT i, SUM(v) OVER w AS s, COUNT(v) OVER w AS c,
                ROW_NUMBER() OVER w AS rn
         FROM wc_t WINDOW w AS (PARTITION BY k ORDER BY i);""")
    // string-count the plan: under AQE the executedPlan wrapper does not
    // expose its inner plan to collect()
    val planStr = df.queryExecution.executedPlan.toString
    val nWindows = planStr.linesIterator
      .count(_.matches(""".*\bWindow \[.*"""))
    assert(nWindows == 1, planStr.take(1500))
  }

  test("duplicate window names are rejected") {
    setup()
    val ex = intercept[Exception](e.batch(
      """SELECT SUM(v) OVER w AS s FROM wc_t
         WINDOW w AS (PARTITION BY k), w AS (ORDER BY i);""").collect())
    assert(ex.getMessage.contains("duplicate WINDOW name"), ex.getMessage)
  }
}
