package graft.sql

import graft.SparkSpec

/** Dialect ASOF [LEFT] JOIN (extension; DuckDB-compatible syntax) over the
  * union-trick operator (AsofJoin.backward). Semantics pinned against
  * hand-computed sets; plan-level behaviors (null keys never match,
  * collision naming, inner-vs-left) each get a case.
  */
class AsofSqlSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    // trades: id, k, ts, lv — quotes: k, ts, qv (k and ts COLLIDE)
    Seq((1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0), (3L, "b", 15L, 3.0),
      (4L, "c", 30L, 4.0)).toDF("id", "k", "ts", "lv")
      .createOrReplaceTempView("asof_l")
    Seq(("a", 5L, 100.0), ("a", 20L, 200.0), ("a", 25L, 250.0),
      ("b", 99L, 300.0)).toDF("k", "ts", "qv")
      .createOrReplaceTempView("asof_r")
    // a right side with NULL key / NULL ts rows that must never match
    Seq((Some("a"), Some(5L), 100.0), (None, Some(1L), 666.0),
      (Some("a"), None, 777.0)).toDF("k", "ts", "qv")
      .createOrReplaceTempView("asof_rn")
  }

  test("ASOF LEFT JOIN: latest right at-or-before, unmatched keeps NULL") {
    setup()
    val got = e.batch(
      """SELECT id, qv FROM asof_l AS l ASOF LEFT JOIN asof_r AS r
         ON l.k = r.k AND l.ts >= r.ts ORDER BY id;""")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(
      1L -> Some(100.0),  // a@10 → quote a@5
      2L -> Some(200.0),  // a@20 → quote a@20 (inclusive)
      3L -> None,         // b@15: only quote is b@99 (after)
      4L -> None))        // c: no quotes
  }

  test("inner ASOF JOIN drops unmatched left rows") {
    setup()
    val got = e.batch(
      """SELECT id, qv FROM asof_l AS l ASOF JOIN asof_r AS r
         ON l.k = r.k AND l.ts >= r.ts ORDER BY id;""")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.toSeq == Seq(1L -> 100.0, 2L -> 200.0))
  }

  test("colliding right columns surface as `stream.field`; flipped inequality accepted") {
    setup()
    val df = e.batch(
      """SELECT id, ts, r.ts AS rts, qv FROM asof_l AS l ASOF LEFT JOIN asof_r AS r
         ON l.k = r.k AND r.ts <= l.ts ORDER BY id;""")
    assert(df.columns.toSeq == Seq("id", "ts", "rts", "qv"))
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10L, 5L), (2L, 20L, 20L), (3L, 15L, -1L), (4L, 30L, -1L)))
  }

  test("NULL right keys / timestamps never match") {
    setup()
    val got = e.batch(
      """SELECT id, qv FROM asof_l AS l ASOF LEFT JOIN asof_rn AS r
         ON l.k = r.k AND l.ts >= r.ts ORDER BY id;""")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    // only the (a, 5, 100.0) right row is matchable
    assert(got.toSeq == Seq(1L -> Some(100.0), 2L -> Some(100.0), 3L -> None, 4L -> None))
  }

  test("multi-key ASOF combines equalities into one hidden struct key") {
    import spark.implicits._
    Seq((1L, "a", "x", 10L), (2L, "a", "y", 10L)).toDF("id", "k1", "k2", "ts")
      .createOrReplaceTempView("asof_ml")
    Seq(("a", "x", 5L, 1.0), ("a", "y", 5L, 2.0), ("a", "x", 9L, 3.0))
      .toDF("q1", "q2", "qts", "qv").createOrReplaceTempView("asof_mr")
    val got = e.batch(
      """SELECT id, qv FROM asof_ml AS l ASOF JOIN asof_mr AS r
         ON l.k1 = r.q1 AND l.k2 = r.q2 AND l.ts >= r.qts ORDER BY id;""")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.toSeq == Seq(1L -> 3.0, 2L -> 2.0))
    // the hidden struct key must not leak
    val cols = e.batch(
      """SELECT * FROM asof_ml AS l ASOF JOIN asof_mr AS r
         ON l.k1 = r.q1 AND l.k2 = r.q2 AND l.ts >= r.qts;""").columns
    assert(!cols.exists(_.contains("__graft")), cols.mkString(","))
  }

  test("rejections: shape rules and the continuous gate") {
    setup()
    def rejects(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](e.batch(sql).collect())
      assert(ex.getMessage != null && ex.getMessage.contains(frag),
        s"message for [$sql] was: ${ex.getMessage}")
    }
    rejects("""SELECT id FROM asof_l AS l ASOF JOIN asof_r AS r
               ON l.k = r.k;""", "requires a timestamp inequality")
    rejects("""SELECT id FROM asof_l AS l ASOF JOIN asof_r AS r
               ON l.ts >= r.ts;""", "at least one equality key")
    rejects("""SELECT id FROM asof_l AS l ASOF JOIN asof_r AS r
               ON l.k = r.k AND l.ts >= r.ts AND l.ts >= r.ts;""",
      "exactly one timestamp inequality")
    rejects("""SELECT id FROM asof_l AS l ASOF JOIN asof_r AS r
               ON l.k = r.k AND l.ts > r.ts;""", "ASOF JOIN ON must be")
    val ex = intercept[Exception](e.sql(
      """SELECT id FROM asof_l AS l ASOF JOIN asof_r AS r
         ON l.k = r.k AND l.ts >= r.ts EMIT CHANGES;"""))
    assert(ex.getMessage.contains("not supported in continuous queries"))
  }
}
