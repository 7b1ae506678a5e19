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
    rejects("""SELECT SUM(v) OVER (ORDER BY i EXCLUDE CURRENT ROW) AS s
       FROM wf_t;""", "EXCLUDE requires an explicit")
  }

  test("ROWS + EXCLUDE GROUP/TIES (r12 collected-frame plan), hand-checked") {
    setup()
    // Global ORDER BY i puts the two i=1 rows — ('a',10) and ('b',5) — in
    // ONE peer group whose internal order is engine-chosen, so only
    // position-invariant shapes are asserted: UNBOUNDED frames, and
    // running frames where TIES keeps exactly the current row's own value.
    // Sorted: [i=1 ×2 (10,5 in some order), i=2 (20), i=3 (30), i=4 (40)].
    val all = e.batch(
      """SELECT k, i,
                SUM(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS sg,
                SUM(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS st,
                SUM(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW EXCLUDE TIES) AS rt,
                SUM(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW EXCLUDE GROUP) AS rg
         FROM wf_t ORDER BY i, k;""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    // total 105; i=1 peers sum 15. Running TIES at an i=1 row keeps only
    // itself (peer dropped whichever side of it the engine put it);
    // running GROUP there empties the frame → NULL (−1 sentinel).
    assert(all.toSeq == Seq(
      ("a", 1L, 90L, 100L, 10L, -1L),
      ("b", 1L, 90L, 95L, 5L, -1L),
      ("a", 2L, 85L, 105L, 35L, 15L),
      ("a", 3L, 75L, 105L, 65L, 35L),
      ("a", 4L, 65L, 105L, 105L, 65L)), all.toSeq)
    // pure-PRECEDING bounds: exclusion is ACTIVE on a ROWS frame even
    // though offset 0 is outside [−2,−1] (peers are value-based); with
    // unique keys inside k='a' the peer set is the current row alone,
    // which is never in the frame → plain moving sum, NULL/empty at i=1.
    // TIES does NOT add the absent current row (the standard only ever
    // removes rows; PostgreSQL agrees — DuckDB 1.0.0 diverges on frames
    // that don't reach the current row, duckdb_pins.py #6, so this
    // engine-semantics pin lives here rather than in a gate row)
    val prec = e.batch(
      """SELECT i, SUM(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING EXCLUDE GROUP) AS s,
                MIN(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING EXCLUDE TIES) AS mn
         FROM wf_t WHERE k = 'a' ORDER BY i;""")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(prec.toSeq == Seq((1L, -1L, -1L), (2L, 10L, 10L),
      (3L, 30L, 10L), (4L, 50L, 20L)), prec.toSeq)
    // NULL order keys are each other's peers (null-safe match), and NULL
    // values never count: n=NULL rows form one peer group (v 7, NULL)
    import spark.implicits._
    Seq((1L, Option(5L), Option(10L)), (2L, Option(5L), Option(20L)),
      (3L, Option.empty[Long], Option(7L)),
      (4L, Option.empty[Long], Option.empty[Long]))
      .toDF("id", "n", "v").createOrReplaceTempView("wf_null")
    val nk = e.batch(
      """SELECT id,
                SUM(v) OVER (ORDER BY n ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS sg,
                COUNT(v) OVER (ORDER BY n ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS ct
         FROM wf_null ORDER BY id;""")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2)))
    // total 37; n=5 peers sum 30, n=NULL peers sum 7 (one NULL v).
    // TIES counts non-null values minus peers-except-self: id=3 keeps its
    // own 7 (3 values), id=4's own value is NULL (2 values).
    assert(nk.toSeq == Seq((1L, 7L, 2L), (2L, 7L, 2L),
      (3L, 30L, 3L), (4L, 30L, 2L)), nk.toSeq)
  }
}
