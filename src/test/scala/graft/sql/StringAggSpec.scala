package graft.sql

import graft.SparkSpec

/** STRING_AGG ordered aggregate + the r9 arithmetic/window-fn extensions. */
class StringAggSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    Seq((1L, "a", "x", 3L), (2L, "a", "y", 1L), (3L, "a", "z", 2L),
      (4L, "b", "q", 9L)).toDF("i", "k", "s", "n")
      .createOrReplaceTempView("sa_t")
  }

  test("STRING_AGG orders by its keys (asc, desc, multi-key) and casts values") {
    setup()
    val got = e.batch(
      """SELECT k,
                STRING_AGG(s, ',' ORDER BY i) AS asc_s,
                STRING_AGG(s, ',' ORDER BY n DESC, i) AS by_n_desc,
                STRING_AGG(i, '-' ORDER BY i DESC) AS ids_desc
         FROM sa_t GROUP BY k ORDER BY k;""").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      ("a", "x,y,z", "x,z,y", "3-2-1"),
      ("b", "q", "q", "4")))
  }

  test("STRING_AGG/ARRAY_AGG NULL order keys sort last (DuckDB default)") {
    import spark.implicits._
    // n is NULL for two rows; a raw `<` comparator would make them compare
    // equal to everything (NULL → false both ways) — placement would be
    // nondeterministic. The contract: nulls last regardless of direction,
    // further keys break ties among the nulls.
    Seq((1L, "a", "w", Some(3L)), (2L, "a", "x", None),
      (3L, "a", "y", Some(1L)), (4L, "a", "z", None))
      .toDF("i", "k", "s", "n").createOrReplaceTempView("sa_n")
    val got = e.batch(
      """SELECT k,
                STRING_AGG(s, ',' ORDER BY n, i) AS asc_s,
                STRING_AGG(s, ',' ORDER BY n DESC, i) AS desc_s,
                ARRAY_AGG(s ORDER BY n, i) AS arr,
                STRING_AGG(s, ',' ORDER BY n NULLS FIRST, i) AS nf_s
         FROM sa_n GROUP BY k;""").collect()(0)
    assert(got.getString(1) == "y,w,x,z", got.getString(1))
    assert(got.getString(2) == "w,y,x,z", got.getString(2))
    assert(got.getSeq[String](3) == Seq("y", "w", "x", "z"))
    // explicit NULLS FIRST inside the call flips the null arm
    assert(got.getString(4) == "x,z,y,w", got.getString(4))
  }

  test("STRING_AGG/ARRAY_AGG as window functions: frame + in-call order are independent") {
    setup()
    // k='a': i=1(x,n=3), 2(y,n=1), 3(z,n=2). The OVER clause frames rows
    // by i; the in-call ORDER BY sorts the collected elements by n.
    val got = e.batch(
      """SELECT i,
                STRING_AGG(s, ',' ORDER BY n, i) OVER (PARTITION BY k
                  ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS run_by_n,
                ARRAY_AGG(i ORDER BY i DESC) OVER (PARTITION BY k
                  ORDER BY i ROWS BETWEEN 1 PRECEDING
                  AND CURRENT ROW) AS win_ids
         FROM sa_t WHERE k = 'a' ORDER BY i;""").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Long](2)))
    assert(got.toSeq == Seq(
      (1L, "x", Seq(1L)),
      (2L, "y,x", Seq(2L, 1L)),
      (3L, "y,z,x", Seq(3L, 2L))), got.toSeq)
  }

  test("ARRAY_AGG FILTER drops filtered rows but keeps genuine NULL elements") {
    import spark.implicits._
    // i=2 carries a genuine NULL value that PASSES the filter (must stay
    // as a NULL element); i=3 FAILS the filter (must vanish, not become
    // NULL — the exact ambiguity the old CASE desugar couldn't express);
    // i=5's NULL n makes the condition UNKNOWN → filtered out like false.
    Seq((1L, "a", Some("x"), Some(3L)), (2L, "a", None: Option[String], Some(5L)),
      (3L, "a", Some("z"), Some(0L)), (4L, "a", Some("w"), Some(2L)),
      (5L, "a", Some("u"), None: Option[Long]),
      (6L, "b", Some("q"), Some(0L))) // every 'b' row fails the filter
      .toDF("i", "k", "s", "n").createOrReplaceTempView("sa_f")
    val got = e.batch(
      """SELECT k,
                ARRAY_AGG(s ORDER BY i) FILTER (WHERE n > 1) AS arr,
                ARRAY_LENGTH(ARRAY_AGG(s ORDER BY i) FILTER (WHERE n > 1)) AS len
         FROM sa_f GROUP BY k ORDER BY k;""").collect()
    assert(got(0).getSeq[String](1) == Seq("x", null, "w"), got(0).getSeq[String](1))
    assert(got(0).getInt(2) == 3)
    // all rows filtered out → NULL (DuckDB's empty array_agg), not []
    assert(got(1).isNullAt(1) && got(1).isNullAt(2), got(1))
  }

  test("windowed ARRAY_AGG FILTER: frame rows filtered, NULL values kept") {
    import spark.implicits._
    Seq((1L, "a", Some("x"), Some(3L)), (2L, "a", None: Option[String], Some(5L)),
      (3L, "a", Some("z"), Some(0L)), (4L, "a", Some("w"), Some(2L)))
      .toDF("i", "k", "s", "n").createOrReplaceTempView("sa_fw")
    val got = e.batch(
      """SELECT i,
                ARRAY_AGG(s ORDER BY i) FILTER (WHERE n > 1)
                  OVER (PARTITION BY k ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
         FROM sa_fw ORDER BY i;""").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(got.toSeq == Seq(
      (1L, Seq("x")),
      (2L, Seq("x", null)),
      (3L, Seq("x", null)),       // i=3 in frame but filtered out
      (4L, Seq("x", null, "w"))), got.toSeq)
  }

  test("property: STRING_AGG/ARRAY_AGG match a Scala evaluator on randomized tables") {
    import spark.implicits._
    // NULL values, NULL order keys, ties — the unique trailing key i
    // makes the expected order total. STRING_AGG skips NULL values and
    // is NULL when none survive (DuckDB); ARRAY_AGG keeps NULL elements.
    val rnd = new scala.util.Random(20261214L)
    (0 until 5).foreach { _ =>
      val n = 5 + rnd.nextInt(40)
      val rows = (0 until n).map { i =>
        (i.toLong, s"g${rnd.nextInt(3)}",
          if (rnd.nextInt(4) == 0) None else Some(s"v${rnd.nextInt(9)}"),
          if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(4).toLong))
      }
      rows.toDF("i", "k", "s", "n").createOrReplaceTempView("sa_p")
      val got = e.batch(
        """SELECT k, STRING_AGG(s, ',' ORDER BY n DESC, i) AS sa,
                  ARRAY_AGG(s ORDER BY n, i) AS aa
           FROM sa_p GROUP BY k ORDER BY k;""").collect()
        .map(r => r.getString(0) -> (
          if (r.isNullAt(1)) null else r.getString(1),
          r.getSeq[String](2))).toMap
      val want = rows.groupBy(_._2).map { case (k, rs) =>
        // n DESC with NULLS LAST, then i ASC
        val byDesc = rs.sortBy(r => (r._4.isEmpty, r._4.map(-_).getOrElse(0L), r._1))
        val sa0 = byDesc.flatMap(_._3)
        val sa = if (sa0.isEmpty) null else sa0.mkString(",")
        // n ASC with NULLS LAST, then i ASC; null values kept
        val byAsc = rs.sortBy(r => (r._4.isEmpty, r._4.getOrElse(0L), r._1))
        k -> (sa, byAsc.map(_._3.orNull))
      }
      assert(got.keySet == want.keySet)
      got.keySet.foreach { k =>
        assert(got(k)._1 == want(k)._1, s"STRING_AGG($k): ${got(k)} vs ${want(k)}")
        assert(got(k)._2.toSeq == want(k)._2.toSeq,
          s"ARRAY_AGG($k): ${got(k)._2} vs ${want(k)._2}")
      }
    }
  }

  test("STRING_AGG over all-NULL values is NULL (DuckDB), not empty string") {
    import spark.implicits._
    Seq(("a", None: Option[String], 1L), ("a", None, 2L),
      ("b", Some("x"), 3L)).toDF("k", "s", "i")
      .createOrReplaceTempView("sa_nullv")
    val got = e.batch(
      """SELECT k, STRING_AGG(s, ',' ORDER BY i) AS sa
         FROM sa_nullv GROUP BY k ORDER BY k;""").collect()
    assert(got(0).isNullAt(1) && got(1).getString(1) == "x")
    // and the window form agrees
    val win = e.batch(
      """SELECT k, STRING_AGG(s, ',' ORDER BY i) OVER (PARTITION BY k) AS sa
         FROM sa_nullv ORDER BY i;""").collect()
    assert(win(0).isNullAt(1) && win(1).isNullAt(1) && win(2).getString(1) == "x")
  }

  test("STRING_AGG rejections: missing ORDER BY, DISTINCT, non-literal sep") {
    setup()
    def rejects(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](e.batch(sql).collect())
      assert(ex.getMessage != null && ex.getMessage.contains(frag),
        s"message for [$sql] was: ${ex.getMessage}")
    }
    rejects("SELECT STRING_AGG(s, ',') AS x FROM sa_t;",
      "requires ORDER BY inside the call")
    rejects("SELECT STRING_AGG(DISTINCT s, ',' ORDER BY s) AS x FROM sa_t;",
      "DISTINCT")
    rejects("SELECT STRING_AGG(s, s ORDER BY i) AS x FROM sa_t;",
      "separator must be a string literal")
    rejects("""SELECT k, STRING_AGG(s, ',' ORDER BY i) AS x
               FROM sa_t GROUP BY k EMIT CHANGES;""",
      "STRING_AGG is not supported in continuous queries")
  }

  test("ARRAY_AGG orders by its keys and keeps value types") {
    setup()
    val got = e.batch(
      """SELECT k,
                ARRAY_AGG(s ORDER BY n DESC, i) AS by_n,
                ARRAY_AGG(i ORDER BY i DESC) AS ids
         FROM sa_t GROUP BY k ORDER BY k;""").collect()
      .map(r => (r.getString(0), r.getSeq[String](1), r.getSeq[Long](2)))
    assert(got.toSeq == Seq(
      ("a", Seq("x", "z", "y"), Seq(3L, 2L, 1L)),
      ("b", Seq("q"), Seq(4L))))
    val ex = intercept[Exception](e.batch(
      "SELECT ARRAY_AGG(s) AS x FROM sa_t;").collect())
    assert(ex.getMessage.contains("requires ORDER BY inside the call"),
      ex.getMessage)
  }

  test("/ and % operators: precedence, types, negative dividends") {
    setup()
    val got = e.batch(
      """SELECT 7 / 2 AS d, 7 % 3 AS m, 0 - 7 % 3 AS mn,
                1 + 6 / 4 AS prec, 7.5 % 2.0 AS fm
         FROM sa_t WHERE i = 1;""").collect()(0)
    assert(got.getDouble(0) == 3.5)
    assert(got.getLong(1) == 1L)
    assert(got.getLong(2) == -1L)   // % binds tighter than -
    assert(got.getDouble(3) == 2.5) // / binds tighter than +
    assert(math.abs(got.getDouble(4) - 1.5) < 1e-12)
    // zero divisor → NULL (DuckDB's rule): never ANSI DIVIDE_BY_ZERO,
    // never IEEE Infinity
    val z = e.batch(
      "SELECT 7 / 0 AS dz, 7 % 0 AS mz, 7.5 % 0.0 AS fz FROM sa_t WHERE i = 1;")
      .collect()(0)
    assert(z.isNullAt(0) && z.isNullAt(1) && z.isNullAt(2), z.toString)
  }

  test("IGNORE NULLS on offset/value window functions; RESPECT NULLS; rejections") {
    import spark.implicits._
    Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)), (4L, None),
      (5L, Some(50L))).toDF("i", "x").createOrReplaceTempView("in_t")
    val got = e.batch(
      """SELECT i,
                LAST_VALUE(x IGNORE NULLS) OVER (ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill,
                LAG(x, 1 IGNORE NULLS) OVER (ORDER BY i) AS prev_nn,
                LAG(x, 1) OVER (ORDER BY i) AS prev_raw,
                LAST_VALUE(x RESPECT NULLS) OVER (ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS raw
         FROM in_t ORDER BY i;""").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    // DuckDB-verified: fill carries the last non-null forward; prev_nn is
    // the most recent non-null strictly before; RESPECT NULLS = default
    assert(got.toSeq == Seq(
      (1L, 10L, -1L, -1L, 10L), (2L, 10L, 10L, 10L, -1L),
      (3L, 30L, 10L, -1L, 30L), (4L, 30L, 30L, 30L, -1L),
      (5L, 50L, 30L, -1L, 50L)), got.toSeq)
    val ex = intercept[Exception](e.batch(
      "SELECT ROW_NUMBER(IGNORE NULLS) OVER (ORDER BY i) AS r FROM in_t;")
      .collect())
    assert(ex.getMessage.contains("does not accept IGNORE NULLS"), ex.getMessage)
  }

  test("PERCENT_RANK / CUME_DIST / NTH_VALUE semantics and rejections") {
    setup()
    val got = e.batch(
      """SELECT i,
                PERCENT_RANK() OVER (PARTITION BY k ORDER BY i) AS pr,
                CUME_DIST() OVER (PARTITION BY k ORDER BY i) AS cd,
                NTH_VALUE(s, 2) OVER (PARTITION BY k ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv
         FROM sa_t WHERE k = 'a' ORDER BY i;""").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0.0, 1.0 / 3, null), (2L, 0.5, 2.0 / 3, "y"), (3L, 1.0, 1.0, "y")))
    val ex = intercept[Exception](e.batch(
      """SELECT PERCENT_RANK() OVER (PARTITION BY k ORDER BY i
           ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS p FROM sa_t;""")
      .collect())
    assert(ex.getMessage.contains("does not accept a window frame"), ex.getMessage)
  }
}
