package graft

import graft.sql.FuzzGen

/** Grammar-coverage map for the differential fuzzer (r12 VERDICT #6):
  * renders the CI-pinned corpora (no Spark session, no execution) and
  * counts which dialect productions the generator can actually DRAW.
  * A production the templates can never emit is a blind spot of the
  * certification no matter how many seeds roam — this tool makes the
  * blind spots a committed table instead of a guess.
  *
  * Usage: runMain graft.FuzzCoverage [seed:n ...]   (default: the CI
  * pins — seed 1 ×170 and the smoke seed 424242 ×33, plus one BIG-tier
  * corpus seed 12 ×90 whose join/frame branches differ).
  */
object FuzzCoverage {

  /** (production label, regex over the DIALECT text). Word-ish bounds
    * keep substrings honest (COUNT vs COUNT(DISTINCT …)). */
  val productions: Seq[(String, String)] = Seq(
    // §2.3 scalar layer
    "CASE WHEN" -> "CASE\\s+WHEN",
    "CAST/::" -> "CAST\\s*\\(|::",
    "BETWEEN" -> "[^Y]\\s+BETWEEN\\s", // not ROWS/RANGE/GROUPS BETWEEN
    "BETWEEN SYMMETRIC" -> "BETWEEN\\s+SYMMETRIC",
    "IFNULL/NULLIF/COALESCE" -> "IFNULL|NULLIF|COALESCE",
    "IS [NOT] NULL" -> "IS\\s+(NOT\\s+)?NULL",
    "IN (list)" -> "(?i)IN\\s*\\(\\s*[-'0-9]",
    "division / modulo" -> "[a-z0-9)]\\s*[/%]\\s*[0-9(]",
    "string fns" -> "TO_UPPER|TO_LOWER|TRIM|REVERSE|STRLEN|SPLIT|CHUNKSOF|TAKE|DROP",
    "math/trig fns" -> "\\b(ABS|CEIL|FLOOR|ROUND|SQRT|LOG|EXP|SIN|COS|TAN)\\s*\\(",
    "type predicates IS_*" -> "\\bIS_(INT|FLOAT|NUM|BOOL|STR|ARRAY|DATE|TIME)\\b",
    "array fns/index/slice" -> "ARRAY_[A-Z]+|\\[[0-9]+\\]|\\[[0-9]*:[0-9]*\\]",
    "JSON ops" -> "->>?|#>>?",
    "datetime arith/DATEDIFF" -> "INTERVAL|DATEDIFF|DATETOSTRING|STRINGTODATE",
    // §2.5 aggregation
    "GROUP BY" -> "GROUP\\s+BY",
    "HAVING" -> "HAVING",
    "ROLLUP" -> "ROLLUP",
    "CUBE" -> "CUBE",
    "GROUPING SETS" -> "GROUPING\\s+SETS",
    "GROUPING_ID/GROUPING(col)" -> "GROUPING_ID|GROUPING\\s*\\(",
    "DISTINCT agg" -> "\\(\\s*DISTINCT",
    "APPROX_COUNT_DISTINCT" -> "APPROX_COUNT_DISTINCT",
    "PERCENTILE/MEDIAN" -> "PERCENTILE|MEDIAN|APPROX_PERCENTILE",
    "TOPK" -> "TOPK",
    "STRING_AGG" -> "STRING_AGG",
    "ARRAY_AGG" -> "ARRAY_AGG",
    "agg FILTER (WHERE)" -> "FILTER\\s*\\(\\s*WHERE",
    "GROUP BY ALL / ORDER BY ALL" -> "(GROUP|ORDER)\\s+BY\\s+ALL",
    // §2.4/§2.7 relations
    "JOIN (inner/outer)" -> "(INNER|LEFT|RIGHT|FULL|CROSS)\\s+JOIN",
    "JOIN USING / NATURAL" -> "USING\\s*\\(|NATURAL\\s+JOIN",
    "ASOF JOIN" -> "ASOF",
    "UNION/INTERSECT/EXCEPT" -> "UNION|INTERSECT|EXCEPT\\s",
    "FROM-subquery" -> "FROM\\s*\\(\\s*SELECT",
    "IN (SELECT)" -> "IN\\s*\\(\\s*SELECT",
    "EXISTS" -> "EXISTS\\s*\\(",
    "scalar subquery" -> "[=<>+*,(]\\s*\\(\\s*SELECT",
    "correlated scalar" -> "\\(\\s*SELECT[^()]+WHERE[^()]+\\.",
    "WITH CTE" -> "WITH\\s+[a-z]",
    "WITH RECURSIVE" -> "WITH\\s+RECURSIVE",
    "ORDER BY / LIMIT" -> "ORDER\\s+BY[\\s\\S]*LIMIT",
    "OFFSET" -> "OFFSET",
    "NULLS FIRST/LAST" -> "NULLS\\s+(FIRST|LAST)",
    "SELECT DISTINCT" -> "SELECT\\s+DISTINCT\\b(?!\\s+ON)",
    "DISTINCT ON" -> "DISTINCT\\s+ON",
    "star EXCLUDE/REPLACE" -> "\\*\\s+(EXCLUDE|REPLACE)",
    // §2.8 window functions
    "ranking fns" -> "ROW_NUMBER|DENSE_RANK|\\bRANK\\b|NTILE|PERCENT_RANK|CUME_DIST",
    "LAG/LEAD" -> "\\b(LAG|LEAD)\\s*\\(",
    "FIRST/LAST/NTH_VALUE" -> "(FIRST|LAST|NTH)_VALUE",
    "IGNORE NULLS" -> "IGNORE\\s+NULLS",
    "ROWS frame" -> "ROWS\\s+BETWEEN",
    "RANGE frame" -> "RANGE\\s+BETWEEN",
    "GROUPS frame" -> "GROUPS\\s+BETWEEN",
    "frame EXCLUDE" -> "EXCLUDE\\s+(CURRENT|GROUP|TIES|NO)",
    "QUALIFY" -> "QUALIFY",
    "named WINDOW clause" -> "WINDOW\\s+[a-z_]+\\s+AS",
    "windowed STRING/ARRAY_AGG" -> "(STRING|ARRAY)_AGG\\s*\\([^)]*\\)\\s*OVER")

  def main(args: Array[String]): Unit = {
    val corpora: Seq[(Long, Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        val p = a.split(":"); (p(0).toLong, p(1).toInt,
          if (p.length > 2) p(2).toInt else 0)
      }
      else Seq((1L, 170, 0), (424242L, 33, 0), (12L, 90, 50000))
    val texts = corpora.flatMap { case (seed, n, rows1) =>
      FuzzGen.queries(seed, n, rows1).map(_.dialect) }
    val total = texts.size
    println(f"[coverage] corpora=${corpora.mkString(" ")} queries=$total")
    val rows = productions.map { case (label, re) =>
      val rx = ("(?i)" + re).r
      (label, texts.count(t => rx.findFirstIn(t).isDefined))
    }
    rows.foreach { case (l, c) =>
      println(f"[coverage] $l%-32s $c%5d  ${if (c == 0) "<<< NEVER DRAWN" else ""}")
    }
    val dead = rows.filter(_._2 == 0).map(_._1)
    println(s"[coverage] never-drawn: ${dead.size} → ${dead.mkString("; ")}")
  }
}
