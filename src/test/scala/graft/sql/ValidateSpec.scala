package graft.sql

import graft.SparkSpec

/** Semantic-rejection cases, mirroring the reference's validation suite
  * (hstream-sql/test/HStream/SQL/ValidateSpec.hs:23-113): statements that
  * parse but must be refused with a meaningful error.
  */
class ValidateSpec extends SparkSpec {

  private def e = new SqlEngine(spark)

  private def rejects(sql: String, fragment: String = ""): Unit = {
    val ex = intercept[Exception](e.sql(sql) match {
      case r: Object => r // force evaluation path for batch plans
    })
    if (fragment.nonEmpty)
      assert(ex.getMessage != null && ex.getMessage.toLowerCase.contains(fragment),
        s"expected '$fragment' in: ${ex.getMessage}")
  }

  test("WITHIN-less join is batch-only (stream rejection lives in Translate; SqlEngineSpec)") {
    // batch tables join fine without WITHIN (extension); a nonexistent
    // relation now fails at resolution, not at the grammar
    spark.range(1).toDF("x").createOrReplaceTempView("wlj1")
    spark.range(1).toDF("y").createOrReplaceTempView("wlj2")
    val e = new SqlEngine(spark)
    val df = e.batch("SELECT a.x AS x FROM wlj1 AS a JOIN wlj2 AS b ON a.x = b.y;")
    assert(df.count() == 1)
  }

  test("aggregates in WHERE are rejected (aggregate context)") {
    spark.range(1).toDF("v").createOrReplaceTempView("vt1")
    rejects("SELECT v FROM vt1 WHERE SUM(v) > 1;", "aggregate")
  }

  test("unknown scalar function is rejected") {
    rejects("SELECT NOSUCHFN(x) FROM s;")
  }

  test("duplicate CREATE STREAM is rejected") {
    val eng = e
    eng.sql("CREATE STREAM dup1 (a INTEGER, _ts TIMESTAMP);")
    val ex = intercept[Exception](
      eng.sql("CREATE STREAM dup1 (a INTEGER, _ts TIMESTAMP);"))
    assert(ex.getMessage.contains("exists"))
    eng.sql("DROP STREAM dup1;")
  }

  test("subquery in a join without alias is rejected") {
    import spark.implicits._
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("x", "ts").createOrReplaceTempView("vs1")
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("y", "ts").createOrReplaceTempView("vs2")
    rejects(
      """SELECT * FROM (SELECT x, ts FROM vs1) JOIN vs2 ON x = y
         WITHIN (INTERVAL 1 MINUTE);""", "alias")
  }

  test("windowed relations cannot be joined (Codegen/V1.hs:295-300)") {
    spark.range(1).toDF("v").createOrReplaceTempView("vt2")
    val ex = intercept[Exception](e.sql(
      """SELECT * FROM TUMBLE(vt2, INTERVAL 1 MINUTE) AS a
         JOIN vt2 AS b ON a.v = b.v WITHIN (INTERVAL 1 MINUTE);"""))
    assert(ex.getMessage.toLowerCase.contains("window"))
  }

  test("statements must be ';'-terminated (BNFC grammar)") {
    rejects("SELECT x FROM s")
  }

  // ---- parse-time semantic validation (Validate.hs, 805 LoC mirrored) ------

  test("aggregates in JOIN condition are rejected (Validate.hs:521)") {
    rejects("""SELECT * FROM a JOIN b ON SUM(a.x) = b.y
               WITHIN (INTERVAL 1 MINUTE);""", "aggregate")
  }

  test("nested aggregates are rejected (Validate.hs:106)") {
    rejects("SELECT SUM(COUNT(x)) AS s FROM s GROUP BY k;", "nested")
  }

  test("duplicate SELECT aliases are rejected (Validate.hs sel case)") {
    rejects("SELECT a AS x, b AS x FROM s;", "duplicate")
  }

  test("invalid DATE literal rejected at parse time (Validate.hs date case)") {
    rejects("SELECT * FROM s WHERE d = DATE '2021-02-29';", "date")
  }

  test("invalid TIME literal rejected at parse time (Validate.hs time case)") {
    rejects("SELECT * FROM s WHERE t = TIME '14:61:59';", "time")
  }

  test("invalid TIMESTAMP literal rejected at parse time") {
    rejects("SELECT * FROM s WHERE t = TIMESTAMP '2024-13-01 00:00:00';", "timestamp")
  }

  test("lenient timestamp rollover is rejected, not normalized (strict resolution)") {
    // java.sql.Timestamp.valueOf would silently turn this into Mar 1 15:01:59
    rejects("SELECT * FROM s WHERE t = TIMESTAMP '2021-02-29 14:61:59';", "timestamp")
    rejects("SELECT * FROM s WHERE t = TIMESTAMP '2024-01-01 25:00:00';", "timestamp")
  }

  test("GROUP BY matches columns case-insensitively, like the resolver") {
    spark.range(1).selectExpr("id AS lang").createOrReplaceTempView("vt5")
    // caseSensitive=false (default): LANG resolves to lang in SELECT/WHERE,
    // so the GROUP BY guard must accept it too
    assert(e.batch("SELECT COUNT(*) AS c FROM vt5 GROUP BY LANG;")
      .collect().head.getLong(0) == 1L)
  }

  test("valid date/time literals pass validation (not vacuous rejections)") {
    // leap day 2020-02-29 is valid — the reference's own positive case
    Parser.parse("SELECT * FROM s WHERE d = DATE '2020-02-29';")
    Parser.parse("SELECT * FROM s WHERE t = TIME '14:16:59';")
    Parser.parse("SELECT * FROM s WHERE t = TIMESTAMP '2024-12-01 00:00:00';")
  }

  test("non-positive WITHIN interval is rejected") {
    rejects("""SELECT * FROM a JOIN b ON a.x = b.y
               WITHIN (INTERVAL 0 MINUTE);""", "positive")
  }

  test("non-positive window intervals are rejected") {
    rejects("SELECT COUNT(*) AS c FROM TUMBLE(s, INTERVAL 0 MINUTE);", "positive")
    rejects("SELECT COUNT(*) AS c FROM SESSION(s, INTERVAL 0 SECOND);", "positive")
  }

  test("HOP advance exceeding size is rejected") {
    rejects("""SELECT COUNT(*) AS c
               FROM HOP(s, INTERVAL 1 MINUTE, INTERVAL 5 MINUTE);""", "advance")
  }

  test("HOP gap check handles mixed calendar/fixed units") {
    // 2 MONTHS ≈ 60 days > 40 days — the raw-count comparison (2 < 40)
    // silently let this gap-producing window through
    rejects("""SELECT COUNT(*) AS c
               FROM HOP(s, INTERVAL 40 DAY, INTERVAL 2 MONTH);""", "advance")
    // and the sane calendar pair still passes validation (fails later only
    // on the unknown stream, not on the window)
    val ex = intercept[Exception](e.sql(
      """SELECT COUNT(*) AS c FROM HOP(nosuchstream, INTERVAL 1 YEAR, INTERVAL 1 MONTH);"""))
    assert(!ex.getMessage.toLowerCase.contains("advance"))
  }

  test("windowed join inputs rejected at PARSE time, not plan time (Codegen/V1.hs:295-300)") {
    // no streams/views exist: if this error surfaces, it came from Validate
    // before any name resolution happened
    rejects("""SELECT * FROM TUMBLE(nosuch1, INTERVAL 1 MINUTE) AS a
               JOIN nosuch2 AS b ON a.v = b.v WITHIN (INTERVAL 1 MINUTE);""",
      "window")
  }

  test("CREATE STREAM with duplicate columns is rejected") {
    rejects("CREATE STREAM dupc (a INTEGER, a STRING, _ts TIMESTAMP);", "duplicate")
  }

  test("INSERT arity mismatch is rejected") {
    rejects("INSERT INTO s (a, b) VALUES (1);", "values")
  }

  test("INSERT duplicate target columns are rejected") {
    rejects("INSERT INTO s (a, a) VALUES (1, 2);", "duplicate")
  }

  test("TOPK with non-positive k is rejected") {
    rejects("SELECT TOPK(v, 0) AS t FROM s GROUP BY k;", "positive")
  }

  test("USING with empty column list is rejected") {
    rejects("""SELECT * FROM a JOIN b USING () WITHIN (INTERVAL 1 MINUTE);""")
  }

  test("GROUP BY on an unknown column names the dialect, not Catalyst internals") {
    spark.range(1).selectExpr("id AS v").createOrReplaceTempView("vt4")
    rejects("SELECT COUNT(*) AS c FROM vt4 GROUP BY nope;", "unknown column")
  }

  test("malformed CAST yields NULL per row, never aborts the query") {
    import spark.implicits._
    Seq("42", "abc", "7").toDF("s").createOrReplaceTempView("vt3")
    val rows = e.batch("SELECT s :: INTEGER AS n FROM vt3;")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rows.toSet == Set(Some(42L), None, Some(7L)))
  }

  test("ORDER BY / LIMIT rejected in continuous queries (batch/pull-only extension)") {
    rejects("SELECT a FROM s ORDER BY a EMIT CHANGES;", "order by / limit")
    rejects("SELECT a FROM s LIMIT 5 EMIT CHANGES;", "order by / limit")
    rejects("CREATE STREAM o1 AS SELECT a FROM s ORDER BY a;", "order by / limit")
    rejects("CREATE VIEW o2 AS SELECT a, COUNT(*) AS c FROM s GROUP BY a LIMIT 3;",
      "order by / limit")
    rejects("INSERT INTO t SELECT a FROM s ORDER BY a LIMIT 1;", "order by / limit")
    // a sorted subquery inside a continuous statement is just as unbounded
    rejects("CREATE STREAM o3 AS SELECT a FROM (SELECT a FROM s ORDER BY a) AS x;",
      "order by / limit")
  }

  test("set ops in continuous queries: UNION ALL only; nested EMIT rejected") {
    rejects("SELECT a FROM s INTERSECT SELECT a FROM t EMIT CHANGES;", "union all")
    rejects("SELECT a FROM s EXCEPT SELECT a FROM t EMIT CHANGES;", "union all")
    rejects("SELECT a FROM s UNION SELECT a FROM t EMIT CHANGES;", "union all")
    rejects("CREATE STREAM su1 AS SELECT a FROM s EXCEPT SELECT a FROM t;", "union all")
    rejects("SELECT a FROM (SELECT a FROM s EMIT CHANGES) AS x;", "top level")
  }

  test("continuous agg → join rejected, matching the reference (r14)") {
    import Ast._
    // the reference rejects joins over aggregated/windowed streams
    // (Codegen/V1.hs:295-300); an aggregated subquery as a continuous
    // join input must be a messaged rejection, not a raw Spark
    // AnalysisException at stream start. The BATCH form stays legal.
    rejects("SELECT x.k, t.a FROM (SELECT k, COUNT(*) AS c FROM s GROUP " +
      "BY k) AS x JOIN t ON x.k = t.a EMIT CHANGES;", "aggregated stream")
    rejects("CREATE STREAM aj1 AS SELECT x.k, t.a FROM (SELECT k, " +
      "SUM(v) AS sv FROM s GROUP BY k) AS x JOIN t ON x.k = t.a;",
      "aggregated stream")
    // global aggregate (no GROUP BY) is just as much an aggregate side
    rejects("CREATE STREAM aj2 AS SELECT t.a FROM (SELECT COUNT(*) AS c " +
      "FROM s) AS x JOIN t ON x.c = t.a;", "aggregated stream")
    // join THEN aggregate stays the supported continuous direction, and
    // the same agg-subquery join is fine as a batch/pull query
    assert(Parser.parse("SELECT x.k FROM (SELECT k, COUNT(*) AS c FROM s " +
      "GROUP BY k) AS x JOIN t ON x.k = t.a;").isInstanceOf[SelectStmt])
  }

  test("PERCENTILE literal-fraction rules; DISTINCT limited to COUNT/SUM") {
    rejects("SELECT PERCENTILE(v, 1.5) AS p FROM s;", "[0, 1]")
    rejects("SELECT PERCENTILE(v, x) AS p FROM s;", "literal")
    rejects("SELECT MEDIAN(v, 2) AS m FROM s;", "one argument")
    rejects("SELECT AVG(DISTINCT v) AS a FROM s;", "count and sum")
  }

  test("APPROX_PERCENTILE argument rules") {
    rejects("SELECT APPROX_PERCENTILE(v) AS p FROM s;", "fraction")
    rejects("SELECT APPROX_PERCENTILE(v, 2.0) AS p FROM s;", "[0, 1]")
    rejects("SELECT APPROX_PERCENTILE(v, x) AS p FROM s;", "literal")
    rejects("SELECT APPROX_PERCENTILE(v, 0.5, 0) AS p FROM s;", "positive")
    rejects("SELECT APPROX_PERCENTILE(v, 0.5, x) AS p FROM s;", "positive int")
    rejects("SELECT APPROX_PERCENTILE(v, 0.5, 4294967296) AS p FROM s;", "maximum")
  }

  test("ROLLUP rules: non-grouped column, GROUPING_ID outside rollup, continuous") {
    spark.range(1).selectExpr("id AS a", "id AS b", "id AS v")
      .createOrReplaceTempView("rollup_t")
    // non-grouped bare column on super-aggregate rows has no value
    rejects("SELECT a, b, v FROM rollup_t GROUP BY ROLLUP (a, b);",
      "non-grouped")
    // the level bitmask is meaningless without rollup levels
    rejects("SELECT a, GROUPING_ID() AS g, COUNT(*) AS c FROM rollup_t GROUP BY a;",
      "rollup")
    // batch/pull only: one state store per grouping level otherwise
    rejects("SELECT a, COUNT(*) AS c FROM rollup_t GROUP BY ROLLUP (a) EMIT CHANGES;",
      "rollup")
    // the accepted shape works end-to-end
    val ok = e.batch(
      """SELECT GROUPING_ID() AS gid, IFNULL(TO_STR(a), '<ALL>') AS a2,
                COUNT(*) AS c, SUM(v) AS sv
         FROM rollup_t GROUP BY ROLLUP (a) ORDER BY gid, a2;""")
    assert(ok.columns.toSeq == Seq("gid", "a2", "c", "sv"))
    assert(ok.count() == 2) // one base row + the grand total
  }

  test("LIMIT beyond Int.MaxValue is rejected (Dataset.limit is Int)") {
    rejects("SELECT a FROM s LIMIT 4294967296;", "maximum")
    rejects("SELECT a FROM s UNION SELECT b FROM t LIMIT 2147483648;", "maximum")
  }

  test("CASE: branch type mixing and non-bool searched conditions reject; NULL fall-through works") {
    spark.range(4).selectExpr("id AS a", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("case_t")
    // searched-form WHEN must be boolean
    rejects("SELECT CASE WHEN a THEN 1 ELSE 0 END AS x FROM case_t;", "bool")
    // branches must agree in family
    rejects("SELECT CASE WHEN a > 1 THEN 'x' ELSE 2 END AS x FROM case_t;",
      "branches mix")
    // simple-form operand vs WHEN family
    rejects("SELECT CASE a WHEN 'one' THEN 1 END AS x FROM case_t;",
      "mismatch")
    // no branches
    rejects("SELECT CASE END AS x FROM case_t;", "when")
    // missing ELSE → NULL; simple + searched forms end-to-end
    val ok = e.batch(
      """SELECT a,
                CASE a WHEN 0 THEN 'zero' WHEN 1 THEN 'one' END AS named,
                CASE WHEN v > 2.0 THEN 'big' ELSE 'small' END AS size
         FROM case_t ORDER BY a;""")
    assert(ok.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((0L, "zero", "small"), (1L, "one", "small"),
        (2L, null, "small"), (3L, null, "big")))
  }

  test("window functions (OVER): batch-only, no GROUP BY mix, ranking needs ORDER BY") {
    spark.range(5).selectExpr("id AS a", "id * 2 AS v")
      .createOrReplaceTempView("win_t")
    // continuous rejection (the ORDER-BY-over-a-stream rule)
    rejects("SELECT ROW_NUMBER() OVER (ORDER BY a) AS rn FROM win_t EMIT CHANGES;",
      "continuous")
    // GROUP BY mix rejection
    rejects("SELECT SUM(v) OVER (ORDER BY a) AS s FROM win_t GROUP BY a;",
      "group by")
    // ranking without ORDER BY
    rejects("SELECT RANK() OVER (PARTITION BY a) AS r FROM win_t;",
      "order by")
    // window fn in WHERE
    rejects("SELECT a FROM win_t WHERE ROW_NUMBER() OVER (ORDER BY a) = 1;",
      "not allowed")
    // aggregates inside an OVER clause's args
    rejects("SELECT SUM(SUM(v)) OVER (ORDER BY a) AS s FROM win_t;",
      "over clause")
    // bare ranking call without OVER
    rejects("SELECT ROW_NUMBER() AS rn FROM win_t;", "over")
    // ROWS, RANGE, and (r8) GROUPS frames are all supported — the
    // shorthand `GROUPS 2 PRECEDING` parses as BETWEEN … AND CURRENT ROW
    assert(e.batch(
      "SELECT SUM(v) OVER (ORDER BY a GROUPS 2 PRECEDING) AS s FROM win_t;")
      .collect().nonEmpty)
    // the accepted shape works end-to-end (running sum + rank + lag)
    val ok = e.batch(
      """SELECT a, SUM(v) OVER (ORDER BY a) AS rs,
                RANK() OVER (ORDER BY a DESC) AS rk,
                LAG(v, 1, -1) OVER (ORDER BY a) AS pv
         FROM win_t ORDER BY a;""")
    assert(ok.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSeq == Seq((0L, 0L, 5, -1L), (1L, 2L, 4, 0L), (2L, 6L, 3, 2L),
        (3L, 12L, 2, 4L), (4L, 20L, 1, 6L)))
  }
}
