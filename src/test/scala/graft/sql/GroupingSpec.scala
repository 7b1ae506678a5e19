package graft.sql

import graft.SparkSpec

/** GROUP BY CUBE / GROUPING SETS (extension, §2.5 family) and the
  * aggregate-less GROUP BY distinct form. */
class GroupingSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def setup(): Unit = {
    import spark.implicits._
    Seq(("en", "web", 10L), ("en", "book", 20L), ("de", "web", 30L))
      .toDF("lang", "src", "n").createOrReplaceTempView("gs_t")
  }

  test("CUBE emits every subset level with GROUPING_ID disambiguation") {
    setup()
    val got = e.batch(
      """SELECT GROUPING_ID() AS gid, IFNULL(lang, '*') AS l,
                IFNULL(src, '*') AS s, SUM(n) AS t
         FROM gs_t GROUP BY CUBE (lang, src) ORDER BY gid, l, s;""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "de", "web", 30L), (0L, "en", "book", 20L), (0L, "en", "web", 10L),
      (1L, "de", "*", 30L), (1L, "en", "*", 30L),
      (2L, "*", "book", 20L), (2L, "*", "web", 40L),
      (3L, "*", "*", 60L)))
  }

  test("aggregate FILTER clause: counts/sums/distinct/windowed, empty-filter semantics") {
    setup()
    val got = e.batch(
      """SELECT lang,
                COUNT(*) AS n,
                COUNT(*) FILTER (WHERE src = 'web') AS n_web,
                SUM(n) FILTER (WHERE n > 15) AS big,
                SUM(DISTINCT n) FILTER (WHERE src = 'web') AS dweb,
                MAX(n) FILTER (WHERE src = 'paper') AS none_match
         FROM gs_t GROUP BY lang ORDER BY lang;""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    // de: 1 row (web 30); en: web 10 + book 20. SUM over an all-filtered
    // group is NULL (standard), COUNT is 0.
    assert(got.toSeq == Seq(
      ("de", 1L, 1L, 30L, 30L, -1L),
      ("en", 2L, 1L, 20L, 10L, -1L)), s"got ${got.toSeq}")
    // windowed form: running filtered count
    val w = e.batch(
      """SELECT lang, src,
                COUNT(*) FILTER (WHERE n > 15) OVER (PARTITION BY lang) AS c
         FROM gs_t ORDER BY lang, src;""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(w.toSeq == Seq(("de", "web", 1L), ("en", "book", 1L),
      ("en", "web", 1L)))
  }

  test("GROUP BY ALL infers keys; ORDER BY ALL orders all output columns") {
    setup()
    val got = e.batch(
      """SELECT lang, src, COUNT(*) AS n, SUM(n) AS t
         FROM gs_t GROUP BY ALL ORDER BY ALL;""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("de", "web", 1L, 30L), ("en", "book", 1L, 20L),
      ("en", "web", 1L, 10L)))
    val desc = e.batch("SELECT lang, n FROM gs_t ORDER BY ALL DESC;")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(desc.toSeq == Seq(("en", 20L), ("en", 10L), ("de", 30L)))
    def rejects(sql: String, frag: String): Unit = {
      val ex = intercept[Exception](e.sql(sql) match { case r: Object => r })
      assert(ex.getMessage != null &&
        ex.getMessage.toLowerCase.contains(frag.toLowerCase),
        s"message for [$sql]: ${ex.getMessage}")
    }
    rejects("SELECT STRLEN(lang) AS l2, COUNT(*) AS n FROM gs_t GROUP BY ALL;",
      "bare column refs")
    rejects("SELECT * FROM gs_t GROUP BY ALL;", "cannot be combined with *")
    rejects("SELECT * FROM gs_t ORDER BY ALL;", "list the columns")
  }

  test("GROUPING SETS emits exactly the requested levels") {
    setup()
    val got = e.batch(
      """SELECT GROUPING_ID() AS gid, IFNULL(lang, '*') AS l,
                IFNULL(src, '*') AS s, SUM(n) AS t
         FROM gs_t GROUP BY GROUPING SETS ((lang), (src)) ORDER BY gid, l, s;""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // only the two subtotal levels — no detail rows, no grand total
    assert(got.toSeq == Seq(
      (1L, "de", "*", 30L), (1L, "en", "*", 30L),
      (2L, "*", "book", 20L), (2L, "*", "web", 40L)))
  }

  test("aggregate-less GROUP BY is distinct-on-keys") {
    setup()
    val got = e.batch("SELECT lang FROM gs_t GROUP BY lang ORDER BY lang;")
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("de", "en"))
  }

  test("CUBE/GROUPING SETS rejected in continuous queries") {
    setup()
    val ex = intercept[Exception](e.sql(
      "SELECT lang, COUNT(*) AS c FROM gs_t GROUP BY CUBE (lang) EMIT CHANGES;"))
    assert(ex.getMessage.contains("not supported in continuous queries"))
  }
}
