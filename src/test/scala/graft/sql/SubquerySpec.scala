package graft.sql

import graft.SparkSpec

/** Expression subqueries (dialect extension — the reference parses
  * subqueries but rejects them, AST.hs:593; scalar forms commented out,
  * AST.hs:339): IN/NOT IN value lists and subqueries, EXISTS/NOT EXISTS
  * with correlation, and scalar subqueries. Each case asserts semantics
  * against hand-computed sets; plan-shape cases pin the join strategies
  * the 100 TB story depends on (semi/anti joins, broadcast null-aware
  * anti join for NOT IN — never a per-row nested loop).
  */
class SubquerySpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (4L, "c", 40L),
      (5L, "d", 50L)).toDF("id", "cat", "v").createOrReplaceTempView("subq_t")
    Seq(("a", 1L), ("b", 2L), ("x", 9L)).toDF("cat", "rank")
      .createOrReplaceTempView("subq_cats")
    // value table with a NULL for NOT IN three-valued semantics
    Seq(Some(10L), Some(40L), None).toDF("v").createOrReplaceTempView("subq_vals")
    spark.sql("SELECT * FROM subq_t WHERE 1=0").createOrReplaceTempView("subq_empty")
  }

  private def ids(sql: String): Set[Long] = {
    setup()
    e.batch(sql).collect().map(_.getLong(0)).toSet
  }

  test("IN value list; NOT IN value list with NULL operand filters the row") {
    assert(ids("SELECT id FROM subq_t WHERE cat IN ('a', 'c');") == Set(1L, 3L, 4L))
    assert(ids("SELECT id FROM subq_t WHERE cat NOT IN ('a', 'c');") == Set(2L, 5L))
    // NULL IN list → UNKNOWN → filtered (null-unsafe, unlike dialect `=`)
    assert(ids(
      "SELECT id FROM subq_t WHERE IFNULL(NULLIF(cat, 'a'), NULL) NOT IN ('b');")
      == Set(4L, 5L))
  }

  test("IN (SELECT …) plans a semi join; NOT IN is null-aware") {
    assert(ids(
      "SELECT id FROM subq_t WHERE cat IN (SELECT cat FROM subq_cats WHERE rank <= 2);")
      == Set(1L, 2L, 3L))
    // sub side contains NULL → NOT IN yields no rows (standard SQL)
    assert(ids(
      "SELECT id FROM subq_t WHERE v NOT IN (SELECT v FROM subq_vals);").isEmpty)
    // without the NULL, plain difference
    assert(ids(
      "SELECT id FROM subq_t WHERE v NOT IN (SELECT v FROM subq_vals WHERE v > 0);")
      == Set(2L, 3L, 5L))
    // NOT IN over an empty subquery keeps everything
    assert(ids(
      "SELECT id FROM subq_t WHERE v NOT IN (SELECT v FROM subq_empty);")
      == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("plan shapes: IN → semi join; NOT IN → broadcast null-aware anti join") {
    setup()
    val semi = e.batch(
      "SELECT id FROM subq_t WHERE cat IN (SELECT cat FROM subq_cats);")
      .queryExecution.executedPlan.toString
    assert(semi.contains("LeftSemi"), s"expected semi join:\n$semi")
    val anti = e.batch(
      "SELECT id FROM subq_t WHERE v NOT IN (SELECT v FROM subq_vals);")
      .queryExecution.executedPlan.toString
    assert(anti.contains("LeftAnti"), s"expected anti join:\n$anti")
    assert(!anti.contains("CartesianProduct"), s"NOT IN must not plan a cartesian:\n$anti")
  }

  test("correlated EXISTS / NOT EXISTS (semi/anti join on the correlation)") {
    assert(ids(
      """SELECT id FROM subq_t AS t WHERE EXISTS
         (SELECT 1 FROM subq_cats AS c WHERE c.cat = t.cat AND c.rank <= 2);""")
      == Set(1L, 2L, 3L))
    assert(ids(
      """SELECT id FROM subq_t AS t WHERE NOT EXISTS
         (SELECT 1 FROM subq_cats AS c WHERE c.cat = t.cat);""")
      == Set(4L, 5L))
    // correlated self-join: rows that share a cat with a LATER row
    assert(ids(
      """SELECT id FROM subq_t AS t WHERE EXISTS
         (SELECT 1 FROM subq_t AS u WHERE u.cat = t.cat AND u.id > t.id);""")
      == Set(1L))
  }

  test("correlated EXISTS: local conjuncts filter the sub side below the join") {
    setup()
    val plan = e.batch(
      """SELECT id FROM subq_t AS t WHERE EXISTS
         (SELECT 1 FROM subq_cats AS c WHERE c.cat = t.cat AND c.rank <= 2);""")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
  }

  test("uncorrelated EXISTS: empty → no rows, non-empty → all rows") {
    assert(ids(
      "SELECT id FROM subq_t WHERE EXISTS (SELECT id FROM subq_empty);").isEmpty)
    assert(ids(
      "SELECT id FROM subq_t WHERE EXISTS (SELECT cat FROM subq_cats WHERE rank = 9);")
      == Set(1L, 2L, 3L, 4L, 5L))
    assert(ids(
      "SELECT id FROM subq_t WHERE NOT EXISTS (SELECT id FROM subq_empty);")
      == Set(1L, 2L, 3L, 4L, 5L))
    // EXISTS over a global aggregate is vacuously true (one row always)
    assert(ids(
      "SELECT id FROM subq_t WHERE EXISTS (SELECT COUNT(*) AS c FROM subq_empty);")
      == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("scalar subquery in WHERE, SELECT list, and under SELECT *") {
    assert(ids(
      "SELECT id FROM subq_t WHERE v > (SELECT AVG(v) FROM subq_t);")
      == Set(4L, 5L))
    setup()
    val withCol = e.batch(
      "SELECT id, v - (SELECT MIN(v) FROM subq_t) AS dv FROM subq_t;")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withCol == Map(1L -> 0L, 2L -> 10L, 3L -> 20L, 4L -> 30L, 5L -> 40L))
    // `*` must not leak the hidden __graft_scalar helper column
    val star = e.batch(
      "SELECT * FROM subq_t WHERE v >= (SELECT MAX(v) FROM subq_t);")
    assert(star.columns.toSeq == Seq("id", "cat", "v"))
    assert(star.collect().map(_.getLong(0)).toSet == Set(5L))
    // LIMIT 1 with a total order is the other provably-one-row form
    assert(ids(
      """SELECT id FROM subq_t
         WHERE cat = (SELECT cat FROM subq_cats ORDER BY rank DESC LIMIT 1);""").isEmpty)
  }

  test("scalar subquery in WHERE of an aggregate query (pre-agg position)") {
    setup()
    val got = e.batch(
      """SELECT cat, SUM(v) AS sv FROM subq_t
         WHERE v > (SELECT MIN(v) FROM subq_t) GROUP BY cat;""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 30L, "b" -> 20L, "c" -> 40L, "d" -> 50L))
  }

  test("scalar subquery plans a broadcast, not a driver collect or cartesian") {
    setup()
    val plan = e.batch(
      "SELECT id FROM subq_t WHERE v > (SELECT AVG(v) FROM subq_t);")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"scalar sub must broadcast:\n$plan")
  }

  test("correlated scalar subquery: per-key aggregate via decorrelated left join") {
    setup()
    // COUNT per cat: a→2, b→1, c→1, d→0 via subq_cats? — count of
    // subq_cats rows matching each outer cat: a→1, b→1, c→0, d→0
    val got = e.batch(
      """SELECT id, (SELECT COUNT(*) FROM subq_cats AS c
                     WHERE c.cat = subq_t.cat) AS n
         FROM subq_t ORDER BY id;""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 0L), (5L, 0L)),
      s"got ${got.toSeq}") // COUNT over an empty group is 0, not NULL
    // MAX: unmatched outer rows keep NULL per SQL
    val mx = e.batch(
      """SELECT id, (SELECT MAX(rank) FROM subq_cats AS c
                     WHERE c.cat = subq_t.cat) AS r
         FROM subq_t ORDER BY id;""")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(mx.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, -1L), (5L, -1L)))
    // correlated scalar in WHERE, with a LOCAL conjunct alongside
    val w = e.batch(
      """SELECT id FROM subq_t
         WHERE v > (SELECT SUM(rank) FROM subq_cats AS c
                    WHERE c.cat = subq_t.cat AND c.rank > 0)
         ORDER BY id;""")
      .collect().map(_.getLong(0))
    assert(w.toSeq == Seq(1L, 2L, 3L)) // d/c: NULL sum → comparison UNKNOWN
  }

  test("correlated scalar rejections carry dialect vocabulary") {
    setup()
    def rejects(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](e.sql(sql) match { case r: Object => r })
      assert(ex.getMessage != null && ex.getMessage.toLowerCase
        .contains(frag.toLowerCase), s"message for [$sql]: ${ex.getMessage}")
    }
    rejects( // non-equality correlation
      """SELECT id, (SELECT COUNT(*) FROM subq_cats AS c
                     WHERE c.rank < subq_t.v) AS n FROM subq_t;""",
      "equality correlation")
    rejects( // correlated but not a bare aggregate
      """SELECT id, (SELECT rank FROM subq_cats AS c
                     WHERE c.cat = subq_t.cat) AS r FROM subq_t;""",
      "aggregate")
  }

  test("rejections carry dialect vocabulary") {
    setup()
    def rejects(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](e.batch(sql).collect())
      assert(ex.getMessage != null && ex.getMessage.contains(frag),
        s"message for [$sql] was: ${ex.getMessage}")
    }
    // EXISTS/IN outside WHERE
    rejects("SELECT EXISTS (SELECT id FROM subq_empty) AS x FROM subq_t;",
      "only allowed in the WHERE clause")
    rejects("SELECT id, cat IN (SELECT cat FROM subq_cats) AS m FROM subq_t;",
      "only allowed in the WHERE clause")
    // nested under OR — not a top-level conjunct
    rejects(
      """SELECT id FROM subq_t
         WHERE cat = 'a' OR EXISTS (SELECT 1 FROM subq_cats AS c WHERE c.cat = subq_t.cat);""",
      "top-level AND conjuncts")
    // scalar subquery not provably one-row
    rejects("SELECT id FROM subq_t WHERE v > (SELECT v FROM subq_vals);",
      "provably one-row")
    // multi-column scalar sub
    rejects("SELECT id FROM subq_t WHERE v > (SELECT MIN(v), MAX(v) FROM subq_t);",
      "exactly one column")
    // correlated EXISTS with aggregation is vacuously true — rejected
    rejects(
      """SELECT id FROM subq_t AS t WHERE EXISTS
         (SELECT COUNT(*) AS c FROM subq_cats AS c2 WHERE c2.cat = t.cat);""",
      "must not aggregate")
    // continuous queries: batch-only surface
    val ex = intercept[Exception](e.sql(
      "SELECT id FROM subq_t WHERE cat IN (SELECT cat FROM subq_cats) EMIT CHANGES;"))
    assert(ex.getMessage.contains("not supported in continuous queries"))
  }
}
