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
    rejects("""SELECT SUM(v) OVER (ORDER BY i EXCLUDE CURRENT ROW) AS s
       FROM wf_t;""", "EXCLUDE requires an explicit")
    // r13: EXCLUDE on the frame-valued functions (the former rejection) —
    // row-identity collected plan. k='a' v=10,20,30,40 by i; ±1 ROWS
    // frame minus the current row; single-row k='b' partition → empty →
    // NULL (−1 sentinel).
    val fv = e.batch(
      """SELECT k, i, FIRST_VALUE(v) OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
           EXCLUDE CURRENT ROW) AS f
         FROM wf_t ORDER BY k, i;""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(fv.toSeq == Seq(("a", 1L, 20L), ("a", 2L, 10L), ("a", 3L, 20L),
      ("a", 4L, 30L), ("b", 1L, -1L)), fv.toSeq)
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

  test("EXCLUDE on frame-valued functions (r13), hand-checked") {
    import spark.implicits._
    // values are a FUNCTION of the tied order key g, so which peer the
    // engine puts at which position inside a tie class is invisible
    Seq((1L, 1L, 10L), (2L, 1L, 10L), (3L, 2L, 20L), (4L, 2L, 20L),
      (5L, 3L, 30L)).toDF("id", "g", "v").createOrReplaceTempView("fx_t")
    val got = e.batch(
      """SELECT id,
                FIRST_VALUE(v) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED
                  PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS f_grp,
                LAST_VALUE(v) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED
                  PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS l_grp,
                NTH_VALUE(v, 2) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED
                  PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS n2_ties,
                LAST_VALUE(v) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW EXCLUDE TIES) AS l_run,
                FIRST_VALUE(v) OVER (ORDER BY g ROWS BETWEEN 2 PRECEDING
                  AND 1 PRECEDING EXCLUDE TIES) AS f_prec
         FROM fx_t ORDER BY id;""")
      .collect().map(r => (r.getLong(0),
        (1 to 4).map(i => if (r.isNullAt(i)) -1L else r.getLong(i)),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    // f_grp: drop the whole own tie class from [10,10,20,20,30];
    // l_grp symmetric; n2_ties keeps self, drops the OTHER peer;
    // l_run: running frame ends at the current row, peers-other-than-
    // self drop → last survivor is the current row's own value;
    // f_prec: self outside the [−2,−1] frame stays absent (removal-only
    // — the duckdb #6 divergence shape), in-frame peers drop.
    assert(got.toSeq == Seq(
      (1L, Seq(20L, 30L, 20L, 10L), -1L),
      (2L, Seq(20L, 30L, 20L, 10L), -1L),
      (3L, Seq(10L, 30L, 10L, 20L), 10L),
      (4L, Seq(10L, 30L, 10L, 20L), 10L),
      (5L, Seq(10L, 20L, 10L, 30L), 20L)), got.toSeq)
    // windowed ordered aggregates under EXCLUDE: the in-call ORDER BY
    // sorts elements, the OVER frame (post-exclusion) selects them;
    // single-row frame minus its own group → NULL, not an empty array
    val agg = e.batch(
      """SELECT id,
                STRING_AGG(v, ',' ORDER BY v) OVER (ORDER BY g
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                  EXCLUDE GROUP) AS sa,
                ARRAY_AGG(v ORDER BY v DESC) OVER (ORDER BY g
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                  EXCLUDE TIES) AS aa,
                ARRAY_AGG(v ORDER BY v) OVER (ORDER BY g
                  ROWS BETWEEN CURRENT ROW AND CURRENT ROW
                  EXCLUDE GROUP) AS aa_null,
                COUNT(*) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS cstar
         FROM fx_t ORDER BY id;""")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getSeq[Long](2).toList,
        r.isNullAt(3), r.getLong(4)))
    assert(agg.toSeq == Seq(
      (1L, "20,20,30", List(30L, 20L, 20L, 10L), true, 3L),
      (2L, "20,20,30", List(30L, 20L, 20L, 10L), true, 3L),
      (3L, "10,10,30", List(30L, 20L, 10L, 10L), true, 3L),
      (4L, "10,10,30", List(30L, 20L, 10L, 10L), true, 3L),
      (5L, "10,10,20,20", List(30L, 20L, 20L, 10L, 10L), true, 4L)),
      agg.toSeq)
    // IGNORE NULLS composes with EXCLUDE: exclusion deletes rows first,
    // null-skipping then indexes the survivors
    Seq((1L, 1L, Option(10L)), (2L, 2L, Option(20L)),
      (3L, 3L, Option.empty[Long]))
      .toDF("id", "g", "v").createOrReplaceTempView("fx_n")
    val ig = e.batch(
      """SELECT id,
                LAST_VALUE(v IGNORE NULLS) OVER (ORDER BY g ROWS BETWEEN
                  UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                  EXCLUDE GROUP) AS l_ig,
                LAST_VALUE(v) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED
                  PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS l_re
         FROM fx_n ORDER BY id;""")
      .collect().map(r => ((1 to 2).map(i =>
        if (r.isNullAt(i)) -1L else r.getLong(i))))
    assert(ig.toSeq == Seq(Seq(20L, -1L), Seq(10L, -1L), Seq(20L, 20L)),
      ig.toSeq)
  }

  test("decimal SUM under ROWS + EXCLUDE keeps full scale (r13 ADVICE)") {
    import spark.implicits._
    // DECIMAL(38,6): the naive get−get fold zero would be capped to
    // scale 5 (precision 39 → minimal-loss cut), silently rounding every
    // add; the probed accumulator folds at (37,6) and stays exact
    import org.apache.spark.sql.functions.{col, expr}
    val df = Seq(1L, 2L, 3L).toDF("i")
      .withColumn("d", (col("i") + expr("CAST(0.000001 AS DECIMAL(38,6))"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
    df.createOrReplaceTempView("fx_dec")
    val got = e.batch(
      """SELECT i, SUM(d) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED
           PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS s
         FROM fx_dec ORDER BY i;""")
      .collect().map(_.getDecimal(1))
    // unique keys → TIES removes nothing → every row sums all three
    val want = new java.math.BigDecimal("6.000003")
    got.foreach(d => assert(d.compareTo(want) == 0, s"got $d want $want"))
  }
}
