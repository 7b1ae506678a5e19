package graft.sql

import graft.SparkSpec

/** Dialect features over an EMPTY relation — the degenerate input a
  * 100 TB pipeline hits constantly (a filter that matches nothing, a
  * partition with no files, day one of a new source). Every feature must
  * plan and return the STANDARD empty-input value, not crash:
  * grouped aggregates → 0 rows; global aggregates → ONE row (COUNT 0,
  * SUM/MIN/MAX/STRING_AGG NULL); window functions → 0 rows; ROLLUP →
  * only the grand-total row. DuckDB agrees on all of these (spot-checked
  * while writing the cases). */
class EmptyRelationSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    Seq.empty[(Long, String, Long)].toDF("i", "k", "v")
      .createOrReplaceTempView("mt_t")
  }

  test("grouped aggregates, windows, QUALIFY, DISTINCT ON: zero rows, right schema") {
    setup()
    val grouped = e.batch(
      """SELECT k, COUNT(*) AS n, SUM(v) AS sv,
                STRING_AGG(v, ',' ORDER BY i) AS sa
         FROM mt_t GROUP BY k;""")
    assert(grouped.columns.toSeq == Seq("k", "n", "sv", "sa"))
    assert(grouped.count() == 0)
    val windows = e.batch(
      """SELECT i, ROW_NUMBER() OVER (PARTITION BY k ORDER BY i) AS rn,
                SUM(v) OVER (PARTITION BY k ORDER BY i
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                  EXCLUDE CURRENT ROW) AS s,
                LAG(v, 1 IGNORE NULLS) OVER (PARTITION BY k ORDER BY i) AS p
         FROM mt_t;""")
    assert(windows.count() == 0)
    assert(e.batch(
      """SELECT k, v FROM mt_t QUALIFY
           ROW_NUMBER() OVER (PARTITION BY k ORDER BY i) = 1;""").count() == 0)
    assert(e.batch(
      "SELECT DISTINCT ON (k) k, v FROM mt_t ORDER BY k, i;").count() == 0)
  }

  test("global aggregates on empty input: ONE row, SQL empty-set values") {
    setup()
    val r = e.batch(
      """SELECT COUNT(*) AS n, COUNT(v) AS nv, SUM(v) AS sv, MIN(v) AS mn,
                AVG(v) AS av, STRING_AGG(k, ',' ORDER BY i) AS sa
         FROM mt_t;""").collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 0L && r(0).getLong(1) == 0L)
    assert(r(0).isNullAt(2) && r(0).isNullAt(3) && r(0).isNullAt(4) &&
      r(0).isNullAt(5))
  }

  test("CUBE with an aggregate alias colliding with the grouping key name") {
    import spark.implicits._
    // SELECT k, COUNT(*) AS k: the synthesized grand-total row binds by
    // POSITION (r10 ADVICE — name binding was ambiguous here). Non-empty
    // input: the probe anti-join suppresses the synthetic row.
    Seq((1L, "a", 2L), (2L, "a", 3L), (3L, "b", 4L))
      .toDF("i", "k", "v").createOrReplaceTempView("mt_dup")
    val r = e.batch(
      "SELECT k, COUNT(*) AS k FROM mt_dup GROUP BY CUBE (k);").collect()
    // levels: (a,2) (b,1) + grand total (NULL,3)
    val got = r.map(x => (if (x.isNullAt(0)) null else x.getString(0),
      x.getLong(1))).toSet
    assert(got == Set(("a", 2L), ("b", 1L), (null, 3L)), got)
    // and on EMPTY input the synthesized row itself carries the collision
    setup()
    val r2 = e.batch(
      "SELECT k, COUNT(*) AS k FROM mt_t GROUP BY CUBE (k);").collect()
    assert(r2.length == 1 && r2(0).isNullAt(0) && r2(0).getLong(1) == 0L,
      r2.mkString(","))
  }

  test("ROLLUP / set ops / subqueries / CTEs on empty input") {
    setup()
    // ROLLUP's grand-total group aggregates the empty set → exactly one
    // row (the NULL,NULL total with count 0)
    val roll = e.batch(
      """SELECT k, COUNT(*) AS n FROM mt_t GROUP BY ROLLUP (k);""").collect()
    assert(roll.length == 1 && roll(0).isNullAt(0) && roll(0).getLong(1) == 0L)
    assert(e.batch(
      """SELECT k FROM mt_t UNION SELECT k FROM mt_t;""").count() == 0)
    // uncorrelated IN over an empty subquery: nothing matches
    assert(e.batch(
      """SELECT i FROM mt_t WHERE i IN (SELECT i FROM mt_t);""").count() == 0)
    assert(e.batch(
      """WITH c AS (SELECT k, COUNT(*) AS n FROM mt_t GROUP BY k)
         SELECT * FROM c ORDER BY k LIMIT 5;""").count() == 0)
  }
}
