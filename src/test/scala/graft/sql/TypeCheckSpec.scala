package graft.sql

import graft.SparkSpec

/** Schema-aware type-compatibility rejections — the reference's
  * isNumExpr/isOrdExpr/isBoolExpr/argument-mask rules
  * (hstream-sql/src/HStream/SQL/Internal/Validate.hs:113-135, 207-420),
  * extended with the resolved relation schema (the reference leaves column
  * refs untyped — Validate.hs:236 TODO). Plus the acceptance side: TIME
  * flowing through a subquery alias keeps wraparound arithmetic.
  */
class TypeCheckSpec extends SparkSpec {

  private def e = new SqlEngine(spark)

  private lazy val typed = {
    import spark.implicits._
    Seq((1L, 2.5, "abc", true, java.sql.Timestamp.valueOf("2024-01-01 23:30:00")))
      .toDF("n", "f", "s", "b", "ts")
      .withColumn("arr", org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.lit(1L)))
      .createOrReplaceTempView("tc")
  }

  private def rejects(sql: String, fragment: String): Unit = {
    typed
    val ex = intercept[Exception](e.sql(sql) match { case r: Object => r })
    assert(ex.getMessage != null && ex.getMessage.toLowerCase.contains(fragment.toLowerCase),
      s"expected '$fragment' in: ${ex.getMessage}")
  }

  // ---- isNumExpr (Validate.hs:207-247) -------------------------------------
  test("'a' + 1 is rejected (literal shape, isNumExpr)") {
    rejects("SELECT 'a' + 1 AS x FROM tc;", "numeric")
  }
  test("string COLUMN + 1 is rejected (schema-aware)") {
    rejects("SELECT s + 1 AS x FROM tc;", "numeric")
  }
  test("bool column * 2 is rejected") {
    rejects("SELECT b * 2 AS x FROM tc;", "numeric")
  }
  test("1 + INTERVAL is rejected (interval needs temporal left operand)") {
    rejects("SELECT n + INTERVAL 1 HOUR AS x FROM tc;", "interval")
  }

  // ---- isOrdExpr + family compat (Validate.hs:307-356) ---------------------
  test("n < 'x' mixed compare is rejected") {
    rejects("SELECT n FROM tc WHERE n < 'x';", "compare")
  }
  test("comparing a bool is rejected (not orderable)") {
    rejects("SELECT n FROM tc WHERE b < true;", "orderable")
  }
  test("BETWEEN over mixed types is rejected") {
    rejects("SELECT n FROM tc WHERE n BETWEEN 'a' AND 3;", "mixed")
  }
  test("BETWEEN bounds from columns: s BETWEEN 1 AND 2 rejected") {
    rejects("SELECT n FROM tc WHERE s BETWEEN 1 AND 2;", "mixed")
  }

  // ---- isBoolExpr (Validate.hs:358-420) ------------------------------------
  test("numeric operand of AND is rejected") {
    rejects("SELECT n FROM tc WHERE n AND b;", "boolean")
  }
  test("NOT over a string column is rejected") {
    rejects("SELECT n FROM tc WHERE NOT s;", "boolean")
  }

  // ---- aggregate operand rules (Validate.hs:113-123) -----------------------
  test("SUM over a string column is rejected (isNumExpr)") {
    rejects("SELECT SUM(s) AS x FROM tc GROUP BY n;", "numeric")
  }
  test("TOPK over a string column is rejected") {
    rejects("SELECT TOPK(s, 3) AS x FROM tc GROUP BY n;", "numeric")
  }
  test("MIN over a bool column is rejected (isOrdExpr)") {
    rejects("SELECT MIN(b) AS x FROM tc GROUP BY n;", "orderable")
  }

  // ---- scalar argument masks (Validate.hs:126-138) -------------------------
  test("SIN over a string column is rejected (numMask)") {
    rejects("SELECT SIN(s) AS x FROM tc;", "numeric")
  }
  test("TO_LOWER over a numeric column is rejected (stringMask)") {
    rejects("SELECT TO_LOWER(n) AS x FROM tc;", "string")
  }
  test("ARRAY_LENGTH over a numeric column is rejected") {
    rejects("SELECT ARRAY_LENGTH(n) AS x FROM tc;", "array")
  }
  test("JSON access over a numeric column is rejected") {
    rejects("SELECT n -> 'k' AS x FROM tc;", "json")
  }
  test("array index over a scalar column is rejected") {
    rejects("SELECT n[0] AS x FROM tc;", "array")
  }
  test("DATEDIFF over non-date args is rejected with dialect vocabulary") {
    // ADVICE r7: DATEDIFF(1, 'x') used to pass validation and die later as
    // a deep Spark cast error / silent nulls
    rejects("SELECT DATEDIFF(n, ts) AS x FROM tc;", "date-compatible")
    rejects("SELECT DATEDIFF(b, b) AS x FROM tc;", "date-compatible")
  }
  test("DATEDIFF accepts DATE/TIMESTAMP/string args") {
    typed
    val out = e.sql(
      "SELECT DATEDIFF('2024-01-03', ts :: DATE) AS d FROM tc;")
      .asInstanceOf[SqlEngine#Rows].df.head()
    assert(out.getLong(0) == 2L)
  }

  test("ill-typed JOIN condition is rejected (qualified refs resolve)") {
    import spark.implicits._
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("x", "ts").createOrReplaceTempView("tj1")
    Seq(("s", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("y", "ts").createOrReplaceTempView("tj2")
    rejects(
      """SELECT * FROM tj1 AS a JOIN tj2 AS b ON a.x < b.y
         WITHIN (INTERVAL 1 MINUTE);""", "compare")
  }

  // ---- acceptance: dynamic values stay unchecked ---------------------------
  test("JSON leaves are dynamic: comparisons/arithmetic over -> pass") {
    import spark.implicits._
    Seq(("""{"k": 7}""", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("props", "ts").createOrReplaceTempView("tcj")
    val out = e.sql("SELECT (props -> 'k') :: INTEGER + 1 AS x FROM tcj;")
      .asInstanceOf[SqlEngine#Rows].df.head()
    assert(out.getLong(0) == 8L)
  }

  // ---- VERDICT r3 #9: TIME through a subquery alias ------------------------
  test("TIME type survives a subquery alias: wraparound without re-cast") {
    typed
    // 23:30:00 + 90 min wraps to 01:00:00 — before the typed env, the alias
    // lost TIME-ness and this fell into plain timestamp arithmetic
    val out = e.sql(
      """SELECT t + INTERVAL 90 MINUTE AS wrapped
         FROM (SELECT ts :: TIME AS t FROM tc) AS sub;""")
      .asInstanceOf[SqlEngine#Rows].df.head()
    assert(out.getString(0) == "01:00:00")
  }

  test("declared TIME stream column: wraparound arithmetic + TIME comparison plan") {
    val eng = e
    eng.sql("CREATE STREAM tctt (t TIME, _ts TIMESTAMP);")
    try {
      // regression: CREATE STREAM declares TIME but Spark carries a string
      // column — the declared dialect type must reach TypeCheck, so this
      // plans (with wraparound dispatch) instead of failing "INTERVAL
      // arithmetic needs a DATE/TIME/TIMESTAMP left operand"
      val q = eng.sql(
        """SELECT t + INTERVAL 90 MINUTE AS w FROM tctt
           WHERE t < TIME '23:59:59' EMIT CHANGES;""").asInstanceOf[SqlEngine#Started]
      eng.sql("""INSERT INTO tctt (t, _ts) VALUES ('23:30:00', '2024-01-01 00:00:00');""")
      eng.engine.processAll()
      val w = spark.table(q.query.name).head().getString(0)
      assert(w == "01:00:00", s"no wraparound: $w")
      eng.sql(s"TERMINATE QUERY ${q.query.name};")
    } finally eng.sql("DROP STREAM tctt;")
  }

  test("TIME survives a SELECT * wildcard subquery hop") {
    typed
    val out = e.sql(
      """SELECT t + INTERVAL 90 MINUTE AS wrapped
         FROM (SELECT * FROM (SELECT ts :: TIME AS t FROM tc) AS s1) AS s2;""")
      .asInstanceOf[SqlEngine#Rows].df.head()
    assert(out.getString(0) == "01:00:00")
  }

  test("TIME through TWO alias hops still wraps") {
    typed
    val out = e.sql(
      """SELECT t2 - INTERVAL 2 HOUR AS back
         FROM (SELECT t AS t2 FROM (SELECT ts :: TIME AS t FROM tc) AS s1) AS s2;""")
      .asInstanceOf[SqlEngine#Rows].df.head()
    assert(out.getString(0) == "21:30:00")
  }
}
