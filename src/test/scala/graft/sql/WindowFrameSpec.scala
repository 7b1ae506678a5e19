package graft.sql

import graft.SparkSpec

/** ROWS window frames in the dialect's OVER clause (extension). */
class WindowFrameSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("a", 4L, 40L),
      ("b", 1L, 5L)).toDF("k", "i", "v").createOrReplaceTempView("wf_t")
  }

  test("moving SUM over ROWS BETWEEN n PRECEDING AND CURRENT ROW") {
    setup()
    val got = e.batch(
      """SELECT k, i, SUM(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS mv
         FROM wf_t ORDER BY k, i;""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 50L),
      ("a", 4L, 70L), ("b", 1L, 5L)))
  }

  test("single-bound shorthand and FOLLOWING bounds") {
    setup()
    val got = e.batch(
      """SELECT i,
                COUNT(v) OVER (PARTITION BY k ORDER BY i ROWS 1 PRECEDING) AS c2,
                SUM(v) OVER (PARTITION BY k ORDER BY i
                  ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS nxt,
                MAX(v) OVER (PARTITION BY k ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS mx
         FROM wf_t WHERE k = 'a' ORDER BY i;""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 30L, 40L), (2L, 2L, 50L, 40L),
      (3L, 2L, 70L, 40L), (4L, 2L, 40L, 40L)))
  }

  test("frame rejections carry dialect vocabulary") {
    setup()
    def rejects(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](e.batch(sql).collect())
      assert(ex.getMessage != null && ex.getMessage.contains(frag),
        s"message for [$sql] was: ${ex.getMessage}")
    }
    rejects("""SELECT SUM(v) OVER (PARTITION BY k
                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
               FROM wf_t;""", "requires ORDER BY")
    rejects("""SELECT ROW_NUMBER() OVER (ORDER BY i
                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS rn
               FROM wf_t;""", "does not accept a window frame")
    rejects("""SELECT SUM(v) OVER (ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 1 PRECEDING) AS s
               FROM wf_t;""", "lower bound exceeds upper bound")
    // GROUPS frames are now supported (r8) — peer-group units, planned
    // as RANGE over a hidden dense_rank ordinal (QualifyDistinctSpec has
    // the tie-class semantics; here: it parses, plans, and runs)
    assert(e.batch("""SELECT SUM(v) OVER (ORDER BY i
        GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
      FROM wf_t;""").collect().nonEmpty)
  }

  test("frame EXCLUDE: semantics on a hand-checked table + loud rejections") {
    setup()
    // k='a' rows: i=1..4, v=10,20,30,40. ROWS 1 PRECEDING..1 FOLLOWING
    // EXCLUDE CURRENT ROW at i=2 → {10, 30} → sum 40
    val got = e.batch(
      """SELECT i, SUM(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
           EXCLUDE CURRENT ROW) AS s
         FROM wf_t WHERE k = 'a' ORDER BY i;""")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq((1L, 20L), (2L, 40L), (3L, 60L), (4L, 30L)))
    // single-row partition minus current = empty frame → SUM NULL
    val lone = e.batch(
      """SELECT SUM(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 0 PRECEDING AND 0 FOLLOWING
           EXCLUDE CURRENT ROW) AS s
         FROM wf_t WHERE k = 'b';""").collect()
    assert(lone.length == 1 && lone(0).isNullAt(0))
    def rejects(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](e.batch(sql).collect())
      assert(ex.getMessage != null && ex.getMessage.contains(frag),
        s"message for [$sql] was: ${ex.getMessage}")
    }
    // MIN/MAX + EXCLUDE CURRENT ROW on ROWS frames (r10): planned as the
    // prefix/suffix two-window decomposition. k='a': v=10,20,30,40.
    val mm = e.batch(
      """SELECT i, MIN(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
           EXCLUDE CURRENT ROW) AS mn,
                MAX(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           EXCLUDE CURRENT ROW) AS mx
         FROM wf_t WHERE k = 'a' ORDER BY i;""")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(mm.toSeq == Seq((1L, 20L, -1L), (2L, 10L, 10L),
      (3L, 20L, 20L), (4L, 30L, 30L)), mm.toSeq)
    // r11: the collected-frame plan closes the former rejections —
    // MIN/MAX with EXCLUDE on value-typed RANGE frames and EXCLUDE
    // CURRENT ROW on GROUPS frames. Hand-checked over all 5 rows
    // (ORDER BY i puts the two i=1 rows, v=10 and v=5, in one peer set).
    val rng = e.batch(
      """SELECT k, i,
                MIN(v) OVER (ORDER BY i RANGE BETWEEN 1 PRECEDING AND
                  1 FOLLOWING EXCLUDE CURRENT ROW) AS mn_cur,
                MIN(v) OVER (ORDER BY i RANGE BETWEEN 1 PRECEDING AND
                  1 FOLLOWING EXCLUDE GROUP) AS mn_grp,
                MAX(v) OVER (ORDER BY i RANGE BETWEEN 1 PRECEDING AND
                  1 FOLLOWING EXCLUDE TIES) AS mx_ties,
                MAX(v) OVER (ORDER BY i GROUPS BETWEEN 1 PRECEDING AND
                  1 FOLLOWING EXCLUDE CURRENT ROW) AS mx_gcur
         FROM wf_t ORDER BY i, k;""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rng.toSeq == Seq(
      ("a", 1L, 5L, 20L, 20L, 20L),
      ("b", 1L, 10L, 20L, 20L, 20L),
      ("a", 2L, 5L, 5L, 30L, 30L),
      ("a", 3L, 20L, 20L, 40L, 40L),
      ("a", 4L, 30L, 30L, 40L, 30L)), rng.toSeq)
    rejects("""SELECT FIRST_VALUE(v) OVER (ORDER BY i
         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS m
       FROM wf_t;""", "does not support frame EXCLUDE")
    rejects("""SELECT SUM(v) OVER (ORDER BY i
         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS s
       FROM wf_t;""", "requires a RANGE or GROUPS frame")
    rejects("""SELECT SUM(v) OVER (ORDER BY i EXCLUDE CURRENT ROW) AS s
       FROM wf_t;""", "EXCLUDE requires an explicit")
  }
}
