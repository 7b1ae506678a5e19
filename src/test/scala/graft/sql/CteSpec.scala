package graft.sql

import graft.SparkSpec

/** WITH (common table expressions) — r8 dialect extension, desugared at
  * parse time into aliased FROM-subqueries (CTE references inside
  * expression subqueries substitute too; left-to-right CTE scope). */
class CteSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L), ("b", 4L, 7L),
      ("c", 5L, 50L)).toDF("k", "i", "v")
      .createOrReplaceTempView("cte_t")
  }

  test("single CTE feeds the main query") {
    setup()
    val got = e.batch(
      """WITH big AS (SELECT k, v FROM cte_t WHERE v >= 10)
         SELECT k, COUNT(*) AS n FROM big GROUP BY k ORDER BY k;""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 2L), ("c", 1L)))
  }

  test("later CTE references an earlier one; main query references the last") {
    setup()
    val got = e.batch(
      """WITH big AS (SELECT k, v FROM cte_t WHERE v >= 10),
              agg AS (SELECT k, SUM(v) AS s FROM big GROUP BY k)
         SELECT k, s FROM agg WHERE s > 20 ORDER BY k;""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 30L), ("c", 50L)))
  }

  test("a CTE referenced twice (join + scalar subquery)") {
    setup()
    val got = e.batch(
      """WITH s AS (SELECT k, COUNT(*) AS n FROM cte_t GROUP BY k)
         SELECT k, n FROM s WHERE n < (SELECT MAX(n) FROM s) ORDER BY k;""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("c", 1L))) // a and b have the max (2)
  }

  test("CTE name shadows the real table; its own body still sees the table") {
    setup()
    // non-recursive scope: inside the CTE body, cte_t is the REAL table
    // (only earlier CTEs substitute); outside, the CTE shadows it
    val got = e.batch(
      """WITH cte_t AS (SELECT k, i + 100 AS i FROM cte_t WHERE k = 'a')
         SELECT k, i FROM cte_t ORDER BY i;""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 101L), ("a", 102L)))
  }

  test("WITH RECURSIVE (UNION ALL): bounded series generation") {
    setup()
    val got = e.batch(
      """WITH RECURSIVE nums AS (
           SELECT 1 AS n FROM cte_t WHERE i = 1
           UNION ALL
           SELECT n + 1 AS n FROM nums WHERE n < 5)
         SELECT n FROM nums ORDER BY n;""")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("WITH RECURSIVE (UNION): transitive closure terminates on a CYCLE") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      .createOrReplaceTempView("cyc_edges")
    // 1→2→3→1: UNION's seen-set dedup reaches the fixpoint {1,2,3}
    // despite the cycle (UNION ALL would loop forever — capped + loud)
    val got = e.batch(
      """WITH RECURSIVE reach AS (
           SELECT dst FROM cyc_edges WHERE src = 1
           UNION
           SELECT e.dst AS dst FROM reach AS r
           JOIN cyc_edges AS e ON r.dst = e.src)
         SELECT dst FROM reach ORDER BY dst;""")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("WITH RECURSIVE rejections: continuous queries; self-ref outside union step") {
    setup()
    def rejects(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](e.sql(sql) match { case r: Object => r })
      assert(ex.getMessage != null && ex.getMessage.toLowerCase
        .contains(frag.toLowerCase), s"message for [$sql]: ${ex.getMessage}")
    }
    rejects(
      """WITH RECURSIVE nums AS (
           SELECT 1 AS n FROM cte_t UNION ALL
           SELECT n + 1 AS n FROM nums WHERE n < 5)
         SELECT n FROM nums EMIT CHANGES;""", "continuous")
    rejects(
      """WITH RECURSIVE nums AS (SELECT i FROM nums)
         SELECT i FROM nums;""", "base UNION")
    // NON-LINEAR recursion: two self-references would both bind to the
    // frontier (delta-joins-delta — silently missing rows); rejected loud
    rejects(
      """WITH RECURSIVE r AS (
           SELECT i AS a, v AS b FROM cte_t
           UNION
           SELECT x.a AS a, y.b AS b FROM r AS x JOIN r AS y ON x.b = y.a)
         SELECT a, b FROM r;""", "exactly once")
    // self-reference hidden inside a subquery: must not silently bind to
    // a real table of the same name (or to the frontier either)
    rejects(
      """WITH RECURSIVE r AS (
           SELECT i FROM cte_t
           UNION
           SELECT i + 1 AS i FROM cte_t
           WHERE i IN (SELECT i FROM r))
         SELECT i FROM r;""", "directly in its FROM clause")
    // aggregate over the frontier is non-monotone under semi-naive eval
    rejects(
      """WITH RECURSIVE r AS (
           SELECT i FROM cte_t
           UNION
           SELECT MAX(i) + 1 AS i FROM r)
         SELECT i FROM r;""", "must not aggregate")
  }

  test("WITH RECURSIVE reachability == Graph.connectedComponents on a random graph") {
    import spark.implicits._
    // two INDEPENDENT iterative engines must agree: undirected reachability
    // from a component's minimum node (recursive CTE fixpoint) is exactly
    // that node's component (alternating-star contraction)
    val edges = (0 until 300).flatMap { i =>
      val a = (i * 2654435761L) % 400
      val b = (i * 40503L + 13) % 400
      if (a == b) Nil else Seq((a, b), (b, a))
    }
    val edf = edges.toDF("u", "v")
    edf.createOrReplaceTempView("rg_edges")
    val labels = graft.operators.Graph.connectedComponents(edf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val roots = labels.values.toSet.toSeq.sorted.take(3) // 3 components
    for (root <- roots) {
      val expect = labels.collect { case (u, l) if l == root => u }.toSet
      val got = e.batch(
        s"""WITH RECURSIVE reach AS (
              SELECT v AS node FROM rg_edges WHERE u = $root
              UNION
              SELECT e.v AS node FROM reach AS r
              JOIN rg_edges AS e ON e.u = r.node)
            SELECT node FROM reach ORDER BY node;""")
        .collect().map(_.getLong(0)).toSet + root
      assert(got == expect,
        s"component of $root: CC ${expect.size} nodes, recursive ${got.size}")
    }
  }

  test("EXPLAIN of a recursive query does NOT execute the fixpoint") {
    setup()
    // a recursion that would FAIL at the 200-round cap if executed —
    // EXPLAIN must render base ∪ one symbolic step round instead
    val out = e.sql(
      """EXPLAIN WITH RECURSIVE nums AS (
           SELECT 1 AS n FROM cte_t WHERE i = 1
           UNION ALL
           SELECT n + 1 AS n FROM nums)
         SELECT n FROM nums;""")
    val text = out.getClass.getDeclaredMethods
      .find(_.getName == "text").map(_.invoke(out).toString)
      .getOrElse(out.toString)
    assert(text.toLowerCase.contains("union"), s"plan text: ${text.take(300)}")
  }

  test("CTE works under EXISTS and in a view-style CSAS parse") {
    setup()
    val got = e.batch(
      """WITH buyers AS (SELECT k FROM cte_t WHERE v >= 20)
         SELECT k, i FROM cte_t AS o
         WHERE EXISTS (SELECT 1 FROM buyers WHERE buyers.k = o.k)
         ORDER BY i;""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 1L), ("a", 2L), ("c", 5L)))
  }
}
