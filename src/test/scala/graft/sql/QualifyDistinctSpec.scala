package graft.sql

import graft.SparkSpec

/** QUALIFY, SELECT DISTINCT [ON (…)], and RANGE window frames — the
  * round-7 dialect extensions (all DuckDB-compatible, batch/pull only). */
class QualifyDistinctSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    Seq(("a", 1L, 30L), ("a", 2L, 10L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("b", 5L, 7L), ("b", 6L, 9L)).toDF("k", "i", "v")
      .createOrReplaceTempView("qd_t")
  }

  private def rejects(sql: String, frag: String): Unit = {
    val ex = intercept[Exception](e.sql(sql) match { case r: Object => r })
    assert(ex.getMessage != null && ex.getMessage.toLowerCase
      .contains(frag.toLowerCase), s"message for [$sql]: ${ex.getMessage}")
  }

  test("QUALIFY filters by select alias of a window function") {
    setup()
    val got = e.batch(
      """SELECT k, i, ROW_NUMBER() OVER (PARTITION BY k
           ORDER BY v DESC, i) AS rk
         FROM qd_t QUALIFY rk <= 1 ORDER BY k;""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(("a", 1L, 1), ("b", 6L, 1)))
  }

  test("QUALIFY with an inline OVER expression") {
    setup()
    val got = e.batch(
      """SELECT k, i FROM qd_t
         QUALIFY RANK() OVER (PARTITION BY k ORDER BY v DESC) = 1
         ORDER BY k, i;""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // RANK gives both ties in group a (v=30 at i=1 and i=3)
    assert(got.toSeq == Seq(("a", 1L), ("a", 3L), ("b", 6L)))
  }

  test("QUALIFY filters AFTER windows compute (rk = 2 keeps the true rank-2 row)") {
    setup()
    // wrong (filter-first) order would re-rank survivors and output rk=1
    // or nothing; standard order computes ranks over ALL rows, then keeps
    // exactly the rank-2 row of each partition
    val got = e.batch(
      """SELECT k, i, ROW_NUMBER() OVER (PARTITION BY k
           ORDER BY v DESC, i) AS rk
         FROM qd_t QUALIFY rk = 2 ORDER BY k;""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(("a", 3L, 2), ("b", 5L, 2)))
  }

  test("select-list windows beside a QUALIFY filter aggregate the PRE-filter partition") {
    setup()
    // SUM over partition a = 30+10+30+20 = 90 even though QUALIFY keeps
    // one row; a post-filter evaluation would output 30 (the kept row)
    val got = e.batch(
      """SELECT k, i, SUM(v) OVER (PARTITION BY k) AS tot,
           ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC, i) AS rk
         FROM qd_t QUALIFY rk <= 1 ORDER BY k;""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(got.toSeq == Seq(("a", 1L, 90L, 1), ("b", 6L, 16L, 1)))
  }

  test("ORDER BY window expression under QUALIFY reads the pre-filter value") {
    setup()
    // order the survivors by each partition's PRE-filter total (a=90 > b=16
    // descending puts a first; a post-filter SUM would give a=30 < b=16...
    // no: 30>16 still — so also project it to pin the value itself)
    val got = e.batch(
      """SELECT k, SUM(v) OVER (PARTITION BY k) AS tot
         FROM qd_t QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY i) = 1
         ORDER BY SUM(v) OVER (PARTITION BY k) DESC;""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 90L), ("b", 16L)))
  }

  test("QUALIFY with wildcard projection does not leak hidden window columns") {
    setup()
    val df = e.batch(
      """SELECT * FROM qd_t
         QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC, i) = 1
         ORDER BY k;""")
    assert(df.columns.toSeq == Seq("k", "i", "v"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L, 30L), ("b", 6L, 9L)))
  }

  test("rank<=k under QUALIFY plans as a window group limit, not a full sort-and-filter") {
    setup()
    val plan = e.batch(
      """SELECT k, i, ROW_NUMBER() OVER (PARTITION BY k
           ORDER BY v DESC, i) AS rk
         FROM qd_t QUALIFY rk <= 1;""")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("DISTINCT ON picks the first row per key in ORDER BY order") {
    setup()
    val got = e.batch(
      """SELECT DISTINCT ON (k) k, i, v FROM qd_t
         ORDER BY k, v DESC, i;""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L, 30L), ("b", 6L, 9L)))
    val plan = e.batch(
      """SELECT DISTINCT ON (k) k, i, v FROM qd_t
         ORDER BY k, v DESC, i;""").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("SELECT DISTINCT dedups after projection") {
    setup()
    val got = e.batch("SELECT DISTINCT k, v FROM qd_t ORDER BY k, v;")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 7L),
      ("b", 9L)))
  }

  test("RANGE frame offsets are value-typed (gaps widen the reach)") {
    setup()
    // group a values at i = 1,2,3,4: RANGE 2 PRECEDING on i covers rows
    // whose i is within [cur-2, cur] — at i=4 that is i∈{2,3,4}
    val got = e.batch(
      """SELECT i, SUM(v) OVER (PARTITION BY k ORDER BY i
           RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s
         FROM qd_t WHERE k = 'a' ORDER BY i;""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 30L), (2L, 40L), (3L, 70L), (4L, 60L)))
  }

  test("IS [NOT] NULL postfix (extension) evaluates three-valued") {
    import spark.implicits._
    Seq((1L, Some(5L)), (2L, None)).toDF("id", "v")
      .createOrReplaceTempView("isn_t")
    val got = e.batch(
      "SELECT id, v IS NULL AS a, v IS NOT NULL AS b FROM isn_t ORDER BY id;")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, false, true), (2L, true, false)))
  }

  test("* EXCLUDE / * REPLACE star modifiers (DuckDB-style)") {
    setup()
    val ex = e.batch("SELECT * EXCLUDE (v) FROM qd_t ORDER BY i;")
    assert(ex.columns.toSeq == Seq("k", "i"))
    val rep = e.batch(
      "SELECT * REPLACE (v + 1 AS v) FROM qd_t WHERE k = 'b' ORDER BY i;")
    assert(rep.columns.toSeq == Seq("k", "i", "v")) // position + name kept
    assert(rep.collect().map(_.getLong(2)).toSeq == Seq(8L, 10L))
    val both = e.batch(
      "SELECT * EXCLUDE (i) REPLACE (v + 1 AS v) FROM qd_t WHERE k = 'b' ORDER BY v;")
    assert(both.columns.toSeq == Seq("k", "v"))
    assert(both.collect().map(_.getLong(1)).toSeq == Seq(8L, 10L))
    def rejects2(sql: String, frag: String): Unit = {
      val ex0 = intercept[Exception](e.sql(sql) match { case r: Object => r })
      assert(ex0.getMessage != null && ex0.getMessage.toLowerCase
        .contains(frag.toLowerCase), s"message for [$sql]: ${ex0.getMessage}")
    }
    rejects2("SELECT * EXCLUDE (nope) FROM qd_t;", "unknown column")
    rejects2("SELECT * EXCLUDE (v) REPLACE (v + 1 AS v) FROM qd_t;",
      "both EXCLUDE and REPLACE")
    rejects2("SELECT * REPLACE (v + 1 AS v, v + 2 AS v) FROM qd_t;",
      "more than once in REPLACE")
    rejects2("SELECT * REPLACE (v + 1 AS nope) FROM qd_t;", "unknown column")
    rejects2("SELECT * EXCLUDE (v), COUNT(*) AS c FROM qd_t GROUP BY k;",
      "does not combine with aggregation")
  }

  test("* EXCLUDE prunes the excluded column from the parquet scan") {
    // the 100 TB payoff: EXCLUDE (text) must reach the reader as column
    // pruning — a scan that still reads the heavy text column would make
    // the modifier cosmetic
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("sm_docs")
    val plan = e.batch("SELECT * EXCLUDE (text) FROM sm_docs ORDER BY doc_id;")
      .queryExecution.executedPlan.toString
    val read = plan.split("ReadSchema").lift(1).getOrElse("")
    assert(read.nonEmpty && !read.contains("text"),
      s"text not pruned from scan: ${plan.take(1500)}")
  }

  test("a window function inside * REPLACE under QUALIFY computes PRE-filter") {
    setup()
    // rank over the FULL group-a partition (4 rows): the kept row (i=1,
    // v=30 ties → rank by v desc, i: i=1 first) must report its rank
    // among ALL rows, not among survivors
    val got = e.batch(
      """SELECT * EXCLUDE (k) REPLACE (
           ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC, i) AS v)
         FROM qd_t
         QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY i DESC) = 1
         ORDER BY i;""")
    assert(got.columns.toSeq == Seq("i", "v"))
    // survivors: per k, the max-i row: (a, i=4, v=20) and (b, i=6, v=9).
    // Pre-filter ranks by (v DESC, i): a = [i1(30), i3(30), i4(20),
    // i2(10)] → i=4 ranks 3rd; b's i=6 (v=9) ranks 1st of {9,7}. A
    // post-filter evaluation would rank both survivors 1st.
    val rows = got.collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.toSeq == Seq((4L, 3), (6L, 1)), s"got ${rows.toSeq}")
  }

  test("rejections carry dialect vocabulary") {
    setup()
    rejects("SELECT k, i FROM qd_t QUALIFY i > 1;", "QUALIFY must reference a window function")
    rejects("SELECT k FROM qd_t QUALIFY RANK() OVER (ORDER BY v) = 1 EMIT CHANGES;",
      "not supported in continuous")
    rejects("""SELECT k, COUNT(*) AS c FROM qd_t GROUP BY k
               QUALIFY RANK() OVER (ORDER BY k) = 1;""", "cannot combine with GROUP BY")
    rejects("SELECT DISTINCT ON (k) k, i FROM qd_t;", "DISTINCT ON requires ORDER BY")
    rejects("""SELECT DISTINCT ON (k) k,
                 ROW_NUMBER() OVER (ORDER BY i) AS rk
               FROM qd_t ORDER BY k;""", "cannot combine with window functions")
    rejects("SELECT DISTINCT k FROM qd_t ORDER BY v;",
      "ORDER BY must reference output columns")
    rejects("SELECT DISTINCT k, COUNT(*) AS c FROM qd_t GROUP BY k ORDER BY k;",
      "cannot combine with GROUP BY")
    rejects("""SELECT SUM(v) OVER (PARTITION BY k ORDER BY i, v
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s
               FROM qd_t;""", "exactly one ORDER BY key")
    rejects("""SELECT SUM(v) OVER (PARTITION BY k ORDER BY k
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s
               FROM qd_t;""", "RANGE")
    rejects("""SELECT SUM(v) OVER (PARTITION BY k
                 GROUPS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s
               FROM qd_t;""", "requires ORDER BY")
  }

  test("GROUPS frame counts peer groups (distinct from RANGE and ROWS)") {
    setup()
    // group a, ORDER BY v: peer groups {10},{20},{30,30}. 1 PRECEDING in
    // GROUPS units: v=10→10, v=20→10+20=30, v=30 rows→20+30+30=80.
    // (RANGE 1 PRECEDING would give 10/20/60; ROWS would split the tie.)
    val got = e.batch(
      """SELECT i, SUM(v) OVER (PARTITION BY k ORDER BY v
           GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
         FROM qd_t WHERE k = 'a' ORDER BY i;""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 80L), (2L, 10L), (3L, 80L), (4L, 30L)))
  }

  test("GROUPS frame with wildcard/no-qualify does not leak the hidden ordinal") {
    setup()
    val df = e.batch(
      """SELECT k, i, COUNT(v) OVER (PARTITION BY k ORDER BY v
           GROUPS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS c
         FROM qd_t ORDER BY k, i;""")
    assert(df.columns.toSeq == Seq("k", "i", "c"))
    // group a descending-from-peer counts: v=30 rows see the {30,30} tail
    // (2), v=20 sees {20,30,30} (3), v=10 sees all 4
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 2L),
      ("a", 4L, 3L), ("b", 5L, 2L), ("b", 6L, 1L)))
  }
}
