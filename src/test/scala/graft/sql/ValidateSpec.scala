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

  test("joins without WITHIN are rejected (SQL-v1.cf:121)") {
    rejects("SELECT * FROM a JOIN b ON a.x = b.y;", "within")
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

  test("malformed CAST yields NULL per row, never aborts the query") {
    import spark.implicits._
    Seq("42", "abc", "7").toDF("s").createOrReplaceTempView("vt3")
    val rows = e.batch("SELECT s :: INTEGER AS n FROM vt3;")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rows.toSet == Set(Some(42L), None, Some(7L)))
  }
}
