package graft.sql

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Grammar-driven differential SQL fuzzer over the implemented batch
  * dialect (r10 VERDICT #1: "the remaining risk is bugs no hand-written
  * gate query happens to exercise"). Every generator emits a PAIR of
  * texts — the dialect query and the equivalent DuckDB oracle SQL — that
  * differ ONLY at the documented divergence points (README "Accepted
  * divergences"); everywhere else the texts are identical, so a result
  * mismatch is an engine bug, not an encoding artifact.
  *
  * Divergences the renderer translates (the normalization table):
  *   - dialect `=`/`<>` are NULL-SAFE (reference semantics, AST.hs) →
  *     oracle `IS [NOT] DISTINCT FROM`;
  *   - dialect type name STRING → oracle VARCHAR;
  *   - dialect TO_UPPER/TO_LOWER/STRLEN/ARRAY_LENGTH/ARRAY_JOIN →
  *     oracle upper/lower/length/len/array_to_string;
  *   - oracle SUM/CEIL/FLOOR/ARRAY_LENGTH get `::BIGINT` (DuckDB widens
  *     bigint sums to HUGEINT and ceil to DOUBLE; values are equal);
  *   - oracle STRING_AGG/ARRAY_AGG values get `::VARCHAR` (the dialect
  *     casts aggregate values to string itself); PERCENTILE →
  *     quantile_cont.
  *
  * Determinism rules (the harness compares SORTED rows, so only
  * order-SENSITIVE constructs need totalization):
  *   - every LIMIT/OFFSET/DISTINCT ON query orders by a key set ending
  *     in the unique `id`;
  *   - every sequence-sensitive window function (ROW_NUMBER, LAG/LEAD,
  *     NTILE, FIRST/LAST/NTH_VALUE, ROWS frames) appends `id` to its
  *     OVER ORDER BY; peer-based functions (RANK, RANGE/GROUPS frames)
  *     may keep ties — tie semantics are exactly what they pin;
  *   - ordered aggregates carry their mandatory in-call ORDER BY with an
  *     `id` tiebreak; doubles in outputs are ROUNDed.
  *
  * Table shapes court the semantics minefield on purpose: ~20% NULLs in
  * every nullable column, tiny value ranges (ties, hot keys), duplicated
  * whole rows (set-op ALL semantics), zero values (division), empty
  * strings, and an empty-after-filter tail.
  */
object FuzzGen {

  final case class FuzzQuery(name: String, dialect: String, oracle: String)

  // ---- deterministic tables ------------------------------------------------

  /** Two small tables, deterministic in `seed`. t1 is the main relation
    * (nullable ints a/b, double c, strings s/g, bool f, unique id); t2 is
    * the join side (k overlaps a's range, v double, s2 overlaps s's
    * vocab). Registered as temp views AND returned for parquet dumping.
    *
    * `rows1 > 0` pins t1's base size (t2 scales to a quarter) instead of
    * the default ~100-row draw — the BIG tier (`fuzz.py --rows N`): same
    * templates, thousands of rows, so AQE/exchange planning actually
    * engages and plan-level wrong-at-scale behavior surfaces as a
    * DuckDB mismatch. Value distributions are unchanged (the tiny key
    * ranges now make BIG tie groups — exactly the hard case for
    * peer-based window semantics). */
  def tables(spark: SparkSession, seed: Long,
             rows1: Int = 0): (DataFrame, DataFrame) = {
    val r = new Random(seed)
    val vocab = Vector("ab", "cd", "ef", "gh", "xy", "")
    def optLong(p: Double, lo: Int, hi: Int): Any =
      if (r.nextDouble() < p) null else (lo + r.nextInt(hi - lo + 1)).toLong
    def optStr(p: Double): Any =
      if (r.nextDouble() < p) null else vocab(r.nextInt(vocab.size))
    def optDbl(p: Double): Any =
      if (r.nextDouble() < p) null
      else math.rint(r.nextDouble() * 2000 - 500) / 100.0
    def optBool(p: Double): Any =
      if (r.nextDouble() < p) null else r.nextBoolean()

    // ts: a few days around 2024-01-01 UTC at odd second offsets (both
    // date AND time-of-day vary), 15% NULL — the datetime template's
    // cast/arith/compare substrate
    val epoch2024 = 1704067200000L
    def optTs(p: Double): Any =
      if (r.nextDouble() < p) null
      else new java.sql.Timestamp(
        epoch2024 + (r.nextInt(6 * 86400).toLong * 1000L))

    // j: flat+nested JSON text (the tJsonJoin substrate), 15% NULL
    def optJson(p: Double): Any =
      if (r.nextDouble() < p) null
      else s"""{"x":${r.nextInt(9)},"o":{"y":${r.nextInt(5)}}}"""

    val n1 = if (rows1 > 0) rows1 else 80 + r.nextInt(60)
    // BIG tier only: `a` (the join/group key) gets ONE hot value at ~50%
    // frequency, so AQE's skew handling (and the engines' agreement under
    // it) enters the certified surface (r11 VERDICT #6). The `rows1 > 0`
    // short-circuit keeps the default tier's RNG stream byte-identical —
    // the committed seed pins depend on it.
    def aDraw(): Any =
      if (rows1 > 0 && r.nextBoolean()) 2L else optLong(0.2, 0, 4)
    val base = (0 until n1).map { i =>
      Row(i.toLong, aDraw(), optLong(0.15, -3, 9), optDbl(0.2),
        optStr(0.15), s"g${r.nextInt(4)}", optBool(0.2), optTs(0.15),
        optJson(0.15))
    }
    // duplicate a block of rows VERBATIM except id (ALL-semantics bait)
    val dups = base.take(n1 / 8).zipWithIndex.map { case (row, j) =>
      Row((n1 + j).toLong, row(1), row(2), row(3), row(4), row(5), row(6),
        row(7), row(8))
    }
    val s1 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", LongType, nullable = true),
      StructField("b", LongType, nullable = true),
      StructField("c", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("g", StringType, nullable = false),
      StructField("f", BooleanType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("j", StringType, nullable = true)))
    val t1 = spark.createDataFrame(
      spark.sparkContext.parallelize(base ++ dups, 4), s1)

    val n2 = if (rows1 > 0) rows1 / 4 else 25 + r.nextInt(20)
    val rows2 = (0 until n2).map { i =>
      Row(i.toLong, optLong(0.25, 0, 4), optDbl(0.2), optStr(0.2),
        optTs(0.1))
    }
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("k", LongType, nullable = true),
      StructField("v", DoubleType, nullable = true),
      StructField("s2", StringType, nullable = true),
      StructField("ts", TimestampType, nullable = true)))
    val t2 = spark.createDataFrame(spark.sparkContext.parallelize(rows2, 2), s2)

    t1.createOrReplaceTempView("t1")
    t2.createOrReplaceTempView("t2")
    (t1, t2)
  }

  // ---- dual-text rendering -------------------------------------------------

  /** A query fragment rendered for both engines. Fragments compose by
    * concatenation; `same` lifts divergence-free text. */
  final case class Tx(d: String, o: String) {
    def +(that: Tx): Tx = Tx(d + that.d, o + that.o)
    def +(t: String): Tx = Tx(d + t, o + t)
  }
  private def same(t: String): Tx = Tx(t, t)
  private def cat(parts: Tx*): Tx = parts.reduce(_ + _)

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  // ---- expressions over t1 -------------------------------------------------

  private def numLit(r: Random): Tx = same(String.valueOf(r.nextInt(8) - 2))

  /** Numeric expression over t1's columns (long- or double-valued). */
  private def numExpr(r: Random, depth: Int): Tx =
    if (depth <= 0) pick(r, Seq(same("a"), same("b"), same("id"), same("c"),
      numLit(r)))
    else r.nextInt(8) match {
      case 0 => cat(same("("), numExpr(r, depth - 1),
        same(s" ${pick(r, Seq("+", "-", "*"))} "), numExpr(r, depth - 1),
        same(")"))
      // division/modulo: x/0 and x%0 are NULL in BOTH engines (the
      // dialect adopted DuckDB's rule in r10) — b is often 0, on purpose
      case 1 => cat(same("("), numExpr(r, depth - 1),
        same(s" ${pick(r, Seq("/", "%"))} "), pick(r, Seq(same("b"),
          numLit(r))), same(")"))
      case 2 => cat(same("ABS("), numExpr(r, depth - 1), same(")"))
      case 3 => cat(same("IFNULL("), numExpr(r, depth - 1), same(", "),
        numLit(r), same(")"))
      case 4 => cat(same("CASE WHEN "), boolExpr(r, depth - 1),
        same(" THEN "), numExpr(r, depth - 1), same(" ELSE "),
        numExpr(r, depth - 1), same(" END"))
      case 5 => cat(same("NULLIF("), numExpr(r, depth - 1), same(", "),
        numLit(r), same(")"))
      case _ => numExpr(r, 0)
    }

  /** String expression over t1's columns. */
  private def strExpr(r: Random, depth: Int): Tx =
    if (depth <= 0) pick(r, Seq(same("s"), same("g"), same("'zz'"), same("''")))
    else r.nextInt(5) match {
      case 0 => cat(Tx("TO_UPPER(", "upper("), strExpr(r, depth - 1), same(")"))
      case 1 => cat(Tx("TO_LOWER(", "lower("), strExpr(r, depth - 1), same(")"))
      case 2 => cat(same("IFNULL("), strExpr(r, depth - 1), same(", 'nn')"))
      case 3 => cat(Tx("CAST(", "CAST("), pick(r, Seq(same("a"), same("b"))),
        Tx(" AS STRING)", " AS VARCHAR)"))
      case _ => strExpr(r, 0)
    }

  /** Boolean expression over t1's columns. Dialect `=`/`<>` are
    * NULL-SAFE → the oracle spells IS [NOT] DISTINCT FROM. */
  private def boolExpr(r: Random, depth: Int): Tx =
    if (depth <= 0) r.nextInt(6) match {
      case 0 => cat(numExpr(r, 0),
        same(s" ${pick(r, Seq("<", "<=", ">", ">="))} "), numExpr(r, 0))
      case 1 =>
        val (l, rr) = (pick(r, Seq("a", "b")), pick(r, Seq("b", "1", "3")))
        if (r.nextBoolean()) Tx(s"$l = $rr", s"$l IS NOT DISTINCT FROM $rr")
        else Tx(s"$l <> $rr", s"$l IS DISTINCT FROM $rr")
      case 2 => cat(pick(r, Seq(same("a"), same("c"), same("s"), same("f"))),
        same(if (r.nextBoolean()) " IS NULL" else " IS NOT NULL"))
      case 3 => same(s"${pick(r, Seq("a", "b"))} IN (${
        Seq.fill(1 + r.nextInt(3))(r.nextInt(6) - 1).distinct.mkString(", ")})")
      case 4 => same(s"s IN (${
        Seq.fill(1 + r.nextInt(2))(s"'${pick(r, Seq("ab", "cd", "xy", "qq"))}'")
          .distinct.mkString(", ")})")
      case _ => cat(pick(r, Seq(same("b"), same("id"))),
        same(if (r.nextBoolean()) " BETWEEN 1 AND 5" else " NOT BETWEEN 2 AND 7"))
    }
    else r.nextInt(4) match {
      case 0 => cat(same("("), boolExpr(r, depth - 1),
        same(s" ${pick(r, Seq("AND", "OR"))} "), boolExpr(r, depth - 1),
        same(")"))
      case 1 => cat(same("NOT ("), boolExpr(r, depth - 1), same(")"))
      case _ => boolExpr(r, 0)
    }

  /** Wrap a numeric output column for stable comparison. The `* 1.0`
    * forces DOUBLE on both sides: DuckDB's round(INTEGER, n) returns
    * DOUBLE while Spark's round(LONG, n) stays LONG — a dtype artifact,
    * not a semantic divergence. */
  private def rounded(e: Tx): Tx =
    cat(same("ROUND(("), e, same(") * 1.0, 4)"))

  // ---- query templates -----------------------------------------------------

  private type Template = (Random, Int) => FuzzQuery

  /** 1. Scalar projection + WHERE: expression semantics, null
    * propagation, null-safe =, division by zero, CASE, IN, BETWEEN. */
  private def tScalar(r: Random, i: Int): FuzzQuery = {
    val e1 = rounded(numExpr(r, 2))
    val e2 = strExpr(r, 2)
    val p = boolExpr(r, 2)
    val w = boolExpr(r, 2)
    val q = cat(same("SELECT id, "), e1, same(" AS e1, "), e2,
      same(" AS e2, "), p, same(" AS p1 FROM t1 WHERE "), w,
      same(" ORDER BY id"))
    FuzzQuery(f"fz_${i}%03d_scalar", q.d, q.o)
  }

  /** 2. Grouped aggregates + HAVING + FILTER clauses. */
  private def tAgg(r: Random, i: Int): FuzzQuery = {
    val key = pick(r, Seq("g", "a", "s"))
    val filt = boolExpr(r, 1)
    val aggs = Seq(
      same("COUNT(*) AS n"),
      Tx("SUM(b) AS sb", "SUM(b)::BIGINT AS sb"),
      cat(same("SUM(c) AS sc_raw")), // raw double: see the ac_raw comment
      same("MIN(b) AS mnb"), same("MAX(s) AS mxs"),
      cat(same("ROUND(AVG(b), 4) AS avb")),
      same("COUNT(DISTINCT b) AS ndb"),
      Tx("SUM(DISTINCT b) AS sdb", "SUM(DISTINCT b)::BIGINT AS sdb"),
      cat(same("COUNT(c) FILTER (WHERE "), filt, same(") AS nf")),
      Tx("PERCENTILE(b, 0.5) AS p50", "quantile_cont(b, 0.5) AS p50"),
      cat(Tx("MEDIAN(b) AS med", "median(b) AS med")))
    val chosen = r.shuffle(aggs).take(3 + r.nextInt(3))
    val having =
      if (r.nextBoolean()) cat(same(" HAVING COUNT(*) > "),
        same(String.valueOf(1 + r.nextInt(3))))
      else same("")
    val q = cat(same(s"SELECT $key AS kk, "),
      chosen.reduce((x, y) => cat(x, same(", "), y)),
      same(s" FROM t1 GROUP BY $key"), having)
    FuzzQuery(f"fz_${i}%03d_agg", q.d, q.o)
  }

  /** 3. Ordered aggregates (STRING_AGG / ARRAY_AGG [+ FILTER]) with
    * NULLS placement in the in-call ORDER BY. */
  /** ARRAY_JOIN oracle normalization: the dialect's ARRAY_JOIN follows
    * the reference (Codegen/Utils.hs arrJoinPrim: empty array → "") and
    * Spark's array_join (all-NULL elements → ""), but DuckDB's
    * array_to_string returns NULL when NO non-null element survives.
    * Wrap: NULL array stays NULL, otherwise coalesce the quirk to "".
    * (Seed-8 fuzzer finding — an oracle-side divergence, not an engine
    * bug; the reference's "" is the contract.) */
  private def joinOracle(arr: String, sep: String): String =
    s"CASE WHEN ($arr) IS NULL THEN NULL " +
      s"ELSE COALESCE(array_to_string($arr, '$sep'), '') END"

  private def tOrderedAgg(r: Random, i: Int): FuzzQuery = {
    val dir = if (r.nextBoolean()) " DESC" else ""
    val nulls = pick(r, Seq("", " NULLS FIRST", " NULLS LAST"))
    val filt = boolExpr(r, 1)
    val sa = Tx(s"STRING_AGG(b, ',' ORDER BY b$dir$nulls, id) AS sa",
      s"string_agg(b::VARCHAR, ',' ORDER BY b$dir$nulls, id) AS sa")
    val aa = Tx(
      s"ARRAY_JOIN(ARRAY_AGG(s ORDER BY c$dir$nulls, id), '|') AS aa",
      joinOracle(s"array_agg(s ORDER BY c$dir$nulls, id)", "|") + " AS aa")
    val aaLen = Tx(
      s"ARRAY_LENGTH(ARRAY_AGG(s ORDER BY c$dir$nulls, id)) AS alen",
      s"len(array_agg(s ORDER BY c$dir$nulls, id))::BIGINT AS alen")
    val aafD = s"ARRAY_JOIN(ARRAY_AGG(CAST(b AS STRING) ORDER BY b$dir, id)" +
      s" FILTER (WHERE ${filt.d}), '|') AS aaf"
    val aafO = joinOracle(s"array_agg(b::VARCHAR ORDER BY b$dir, id)" +
      s" FILTER (WHERE ${filt.o})", "|") + " AS aaf"
    val aaf = Tx(aafD, aafO)
    val aafLen = cat(
      Tx("ARRAY_LENGTH(ARRAY_AGG(s ORDER BY id) FILTER (WHERE ",
         "len(array_agg(s ORDER BY id) FILTER (WHERE "),
      filt, Tx(")) AS aflen", "))::BIGINT AS aflen"))
    val chosen = r.shuffle(Seq(sa, aa, aaLen, aaf, aafLen)).take(2 + r.nextInt(3))
    val q = cat(same("SELECT g, "),
      chosen.reduce((x, y) => cat(x, same(", "), y)),
      same(" FROM t1 GROUP BY g"))
    FuzzQuery(f"fz_${i}%03d_ordagg", q.d, q.o)
  }

  /** 4. Multi-level grouping: ROLLUP / CUBE / GROUPING SETS with
    * GROUPING indicators (IFNULL'd keys keep NULL-vs-ALL unambiguous:
    * a/s are nullable, so the indicator column disambiguates). */
  private def tMultiLevel(r: Random, i: Int): FuzzQuery = {
    // every referenced key must appear in at least one grouping set
    val mode = pick(r, Seq("ROLLUP (g, a)", "CUBE (g, a)",
      "GROUPING SETS ((g, a), (g), ())", "GROUPING SETS ((g), (a), ())"))
    val q = cat(
      same("SELECT IFNULL(g, '<A>') AS g2, IFNULL(CAST(a AS "),
      Tx("STRING", "VARCHAR"),
      same("), '<A>') AS a2, "),
      Tx("GROUPING(g) AS gg, ", "GROUPING(g)::BIGINT AS gg, "),
      Tx("GROUPING(a) AS ga, ", "GROUPING(a)::BIGINT AS ga, "),
      same("COUNT(*) AS n, "),
      Tx("SUM(b) AS sb", "SUM(b)::BIGINT AS sb"),
      same(s" FROM t1 GROUP BY $mode"))
    FuzzQuery(f"fz_${i}%03d_multilevel", q.d, q.o)
  }

  /** 5. Ranking/offset window functions; sometimes QUALIFY. Peer-based
    * ranks run on TIED keys; sequence-based functions get an id
    * tiebreak. */
  private def tWindowRank(r: Random, i: Int): FuzzQuery = {
    val part = pick(r, Seq("PARTITION BY g", "PARTITION BY a", ""))
    val tied = pick(r, Seq("b", "s", "IFNULL(a, -1)"))
    val fns = Seq(
      same(s"RANK() OVER ($part ORDER BY $tied) AS rnk"),
      same(s"DENSE_RANK() OVER ($part ORDER BY $tied) AS drnk"),
      same(s"ROUND(PERCENT_RANK() OVER ($part ORDER BY $tied), 6) AS pr"),
      same(s"ROUND(CUME_DIST() OVER ($part ORDER BY $tied), 6) AS cd"),
      same(s"ROW_NUMBER() OVER ($part ORDER BY $tied, id) AS rn"),
      same(s"NTILE(${2 + r.nextInt(3)}) OVER ($part ORDER BY $tied, id) AS nt"),
      same(s"LAG(b, ${1 + r.nextInt(2)}) OVER ($part ORDER BY $tied, id) AS lg"),
      same(s"LEAD(s) OVER ($part ORDER BY $tied, id) AS ld"),
      same(s"LAG(c${if (r.nextBoolean()) " IGNORE NULLS" else ""}) " +
        s"OVER ($part ORDER BY $tied, id) AS lgn"),
      same(s"FIRST_VALUE(s${if (r.nextBoolean()) " IGNORE NULLS" else ""}) " +
        s"OVER ($part ORDER BY $tied, id) AS fv"))
    val chosen = r.shuffle(fns).take(2 + r.nextInt(3))
    val qualify =
      if (r.nextInt(3) == 0)
        same(s" QUALIFY ROW_NUMBER() OVER ($part ORDER BY $tied, id) <= ${3 + r.nextInt(5)}")
      else same("")
    val q = cat(same("SELECT id, "),
      chosen.reduce((x, y) => cat(x, same(", "), y)),
      same(" FROM t1"), qualify, same(" ORDER BY id"))
    FuzzQuery(f"fz_${i}%03d_winrank", q.d, q.o)
  }

  /** 6. Frame aggregates: ROWS/RANGE/GROUPS bounds, EXCLUDE (the
    * supported combinations), running windows.
    *
    * BIG tier (`big`): the MIN/MAX-EXCLUDE fragments plan as
    * collected-frame evaluation — O(frame) PER ROW, and over the default
    * coarse keys (6 distinct values) a ±2 value frame is ~40% of the
    * relation, i.e. O(n²) total: exact but single-task-quadratic, ~30 min
    * for ONE query at 50k rows. The BIG tier therefore derives a
    * FINE-grained order key (same key structure × an id residue) so
    * frames stay a few hundred rows and the whole template is O(n);
    * what the tier certifies — plan behavior under AQE at real row
    * counts — is unchanged, and the quadratic-frame shapes stay covered
    * at the default tier where they are cheap. */
  private def tWindowFrame(big: Boolean)(r: Random, i: Int): FuzzQuery = {
    val part = pick(r, Seq("PARTITION BY g", ""))
    val vKey = if (big) "(IFNULL(a, -1) * 29 + id % 23)" else "IFNULL(a, -1)"
    def bounds(): String = pick(r, Seq(
      "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      s"BETWEEN ${1 + r.nextInt(3)} PRECEDING AND CURRENT ROW",
      s"BETWEEN ${1 + r.nextInt(2)} PRECEDING AND ${1 + r.nextInt(2)} FOLLOWING",
      "BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"))
    // ROWS frames take NO OTHERS / CURRENT ROW only (the engine rejects
    // EXCLUDE GROUP/TIES there: a ROWS boundary can cut a peer group)
    val excl = pick(r, Seq("", " EXCLUDE NO OTHERS", " EXCLUDE CURRENT ROW"))
    val fns = scala.collection.mutable.Buffer[Tx]()
    // ROWS frame (id tiebreak): subtractable aggs take any EXCLUDE.
    // bounds() draws once per fragment — interpolating a fresh call into
    // each rendered side would give the two engines DIFFERENT frames
    val bSb = bounds()
    fns += Tx(s"SUM(b) OVER ($part ORDER BY b, id ROWS $bSb$excl) AS sb",
      s"SUM(b) OVER ($part ORDER BY b, id ROWS $bSb$excl)::BIGINT AS sb")
    fns += same(s"COUNT(c) OVER ($part ORDER BY s, id ROWS ${bounds()}$excl) AS nc")
    // RAW double, no ROUND: float sums accumulate in different orders on
    // the two engines, and rounding an ulp-apart pair at a .00005
    // boundary flips the last digit (seed-2 finding — 1 row in 121).
    // fuzz.py compares doubles with rtol=1e-9, which absorbs the ulp.
    // The _raw suffix excludes the column from resultHash's pins (the
    // same ulp would flip a pinned MD5 across same-engine runs).
    fns += same(s"AVG(c) OVER ($part ORDER BY b, id ROWS ${bounds()}$excl) AS ac_raw")
    // MIN/MAX: no EXCLUDE, or EXCLUDE CURRENT ROW on ROWS (the engine's
    // exact decompositions)
    fns += same(s"MIN(b) OVER ($part ORDER BY c, id ROWS ${bounds()}" +
      s"${pick(r, Seq("", " EXCLUDE CURRENT ROW"))}) AS mnb")
    // RANGE value frame over a non-null numeric key
    val lo = 1 + r.nextInt(3); val hi = 1 + r.nextInt(3)
    fns += Tx(
      s"SUM(b) OVER ($part ORDER BY IFNULL(b, -5) RANGE BETWEEN $lo PRECEDING AND $hi FOLLOWING) AS rsb",
      s"SUM(b) OVER ($part ORDER BY IFNULL(b, -5) RANGE BETWEEN $lo PRECEDING AND $hi FOLLOWING)::BIGINT AS rsb")
    // MIN/MAX with any EXCLUDE on a RANGE frame (r11 collected-frame
    // plan; DuckDB's RANGE EXCLUDE is native) — the tied key makes peer
    // groups big, and c varies within them
    val rexcl = pick(r, Seq("", " EXCLUDE NO OTHERS", " EXCLUDE CURRENT ROW",
      " EXCLUDE GROUP", " EXCLUDE TIES"))
    fns += same(s"MIN(c) OVER ($part ORDER BY $vKey RANGE " +
      s"BETWEEN ${1 + r.nextInt(2)} PRECEDING AND " +
      s"${1 + r.nextInt(2)} FOLLOWING$rexcl) AS rmn")
    // GROUPS frame on a tied key (COUNT and MAX, any EXCLUDE).
    // DuckDB 1.0.0 has NO GROUPS mode ("not implemented yet"), so the
    // oracle uses the DEFINITIONAL expansion — the same convention as
    // the q_sql_groups_frame gate row: a RANGE frame over a precomputed
    // dense_rank peer-group ordinal (__dr, from a derived table). Peers
    // under ORDER BY __dr are exactly the GROUPS peer classes, so
    // EXCLUDE GROUP/TIES carry over unchanged.
    // r11: EXCLUDE CURRENT ROW joins GROUP/TIES (frame-type-agnostic,
    // so it carries over the dense_rank expansion unchanged)
    val gexcl = pick(r, Seq("", " EXCLUDE GROUP", " EXCLUDE TIES",
      " EXCLUDE CURRENT ROW"))
    val gLo = 1 + r.nextInt(2)
    fns += Tx(
      s"COUNT(*) OVER ($part ORDER BY $vKey GROUPS " +
        s"BETWEEN $gLo PRECEDING AND CURRENT ROW$gexcl) AS gn",
      s"COUNT(*) OVER ($part ORDER BY __dr RANGE " +
        s"BETWEEN $gLo PRECEDING AND CURRENT ROW$gexcl) AS gn")
    fns += Tx(
      s"MAX(b) OVER ($part ORDER BY $vKey GROUPS " +
        s"BETWEEN 1 PRECEDING AND 1 FOLLOWING$gexcl) AS gmx",
      s"MAX(b) OVER ($part ORDER BY __dr RANGE " +
        s"BETWEEN 1 PRECEDING AND 1 FOLLOWING$gexcl) AS gmx")
    val chosen = r.shuffle(fns.toSeq).take(2 + r.nextInt(3))
    val needsDr = chosen.exists(_.o.contains("__dr"))
    val from =
      if (needsDr) Tx(" FROM t1 ",
        s" FROM (SELECT *, dense_rank() OVER ($part ORDER BY $vKey)" +
          " AS __dr FROM t1) AS t1 ")
      else same(" FROM t1 ")
    val q = cat(same("SELECT id, "),
      chosen.reduce((x, y) => cat(x, same(", "), y)),
      from, same("ORDER BY id"))
    FuzzQuery(f"fz_${i}%03d_winframe", q.d, q.o)
  }

  /** 7. Joins: all types, equi (null-safe divergence!) and non-equi ON,
    * sometimes aggregated on top. In the BIG tier the ON clause gains an
    * id BAND (t1.id within ±40 of 4·t2.id — both ids are dense ranges,
    * t2 a quarter of t1): the tiny key domains make every join's output
    * quadratic in the row count, and at --rows 50000 the unbanded product
    * (~10⁸ rows) neither executes in the 4 GB harness JVM nor teaches
    * anything the banded join doesn't — the band keeps output linear in R
    * while the join type/null-semantics surface is unchanged (r11 VERDICT
    * #6). The default tier keeps the full product. */
  private def tJoin(big: Boolean)(r: Random, i: Int): FuzzQuery = {
    val jt = pick(r, Seq("JOIN", "INNER JOIN", "LEFT JOIN", "RIGHT JOIN",
      "FULL JOIN"))
    val on0 = r.nextInt(3) match {
      // dialect ON a = k matches NULL==NULL (null-safe) → oracle INDF
      case 0 => Tx("t1.a = t2.k", "t1.a IS NOT DISTINCT FROM t2.k")
      case 1 => same("t1.a < t2.k")
      case _ => cat(Tx("t1.a = t2.k", "t1.a IS NOT DISTINCT FROM t2.k"),
        same(" AND "), same("t1.b > t2.id"))
    }
    val on = if (big)
      cat(on0, same(" AND t1.id BETWEEN t2.id * 4 - 40 AND t2.id * 4 + 40"))
    else on0
    val q0 = cat(same(s"SELECT t1.id AS i1, t2.id AS i2, t1.a, t2.k, " +
      "t1.s, t2.s2 FROM t1 "), same(jt), same(" t2 ON "), on)
    val q =
      if (r.nextBoolean()) q0
      else cat(same("SELECT q.a AS a, COUNT(*) AS n, "),
        Tx("SUM(q.k) AS sk", "SUM(q.k)::BIGINT AS sk"),
        same(" FROM ("), q0, same(") AS q GROUP BY q.a"))
    FuzzQuery(f"fz_${i}%03d_join", q.d, q.o)
  }

  /** 8. Set operations with ALL/DISTINCT semantics over duplicated rows. */
  private def tSetOp(r: Random, i: Int): FuzzQuery = {
    val op = pick(r, Seq("UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
      "EXCEPT", "EXCEPT ALL"))
    val w1 = boolExpr(r, 1); val w2 = boolExpr(r, 1)
    val q = cat(same("SELECT a, b, s FROM t1 WHERE "), w1,
      same(s" $op SELECT a, b, s FROM t1 WHERE "), w2)
    FuzzQuery(f"fz_${i}%03d_setop", q.d, q.o)
  }

  /** 9. Subqueries: [NOT] IN (nullable side on purpose), correlated
    * EXISTS, scalar subquery in SELECT. */
  private def tSubquery(r: Random, i: Int): FuzzQuery = {
    val w2 = boolExpr(r, 1)
    r.nextInt(3) match {
      case 0 =>
        val not = if (r.nextBoolean()) "NOT " else ""
        // NOT IN over a subquery that may yield NULLs: the standard
        // three-valued trap both engines must agree on
        val q = same(s"SELECT id, a FROM t1 WHERE a ${not}IN " +
          "(SELECT k FROM t2 WHERE v > 0) ORDER BY id")
        FuzzQuery(f"fz_${i}%03d_insub", q.d, q.o)
      case 1 =>
        val not = if (r.nextBoolean()) "NOT " else ""
        val q = cat(same(s"SELECT id, b FROM t1 WHERE ${not}EXISTS " +
          "(SELECT 1 FROM t2 WHERE t2.k "),
          Tx("= t1.a", "IS NOT DISTINCT FROM t1.a"),
          same(" AND "), w2, same(") ORDER BY id"))
        FuzzQuery(f"fz_${i}%03d_existssub", q.d, q.o)
      case _ =>
        // equality correlation only (the decorrelation's documented
        // restriction); a is nullable → the null-safe-= divergence rides
        // the correlation itself
        val q = cat(
          // the correlated form requires a BARE aggregate — round OUTSIDE
          same("SELECT id, a, ROUND((SELECT MAX(v) FROM t2 WHERE t2.k "),
          Tx("= t1.a", "IS NOT DISTINCT FROM t1.a"),
          same("), 4) AS mv, (SELECT COUNT(*) FROM t2 WHERE t2.k "),
          Tx("= t1.b", "IS NOT DISTINCT FROM t1.b"),
          same(" AND t2.v > 0) AS nk FROM t1 ORDER BY id"))
        FuzzQuery(f"fz_${i}%03d_scalarsub", q.d, q.o)
    }
  }

  /** 10. CTEs, referenced twice (plan reuse + correctness). */
  private def tCte(r: Random, i: Int): FuzzQuery = {
    val w = boolExpr(r, 1)
    val q = cat(same("WITH x AS (SELECT g, a, COUNT(*) AS n, "),
      Tx("SUM(b) AS sb", "SUM(b)::BIGINT AS sb"),
      same(" FROM t1 WHERE "), w,
      same(" GROUP BY g, a) SELECT x1.g, x1.a, x1.n, x1.sb, x2.n AS n2 " +
        "FROM x AS x1 LEFT JOIN x AS x2 ON x1.g "),
      Tx("= x2.g", "IS NOT DISTINCT FROM x2.g"),
      same(" AND x2.a "), Tx("= x1.a", "IS NOT DISTINCT FROM x1.a"))
    FuzzQuery(f"fz_${i}%03d_cte", q.d, q.o)
  }

  /** 11. ORDER BY + LIMIT/OFFSET with explicit and default NULLS
    * placement: the row SET depends on the sort, so the cut pins null
    * ordering. DISTINCT ON rides the same mechanics. */
  private def tOrderLimit(r: Random, i: Int): FuzzQuery = {
    val key = pick(r, Seq("b", "c", "s"))
    val dir = if (r.nextBoolean()) " DESC" else ""
    // dialect default = NULLS LAST both directions = DuckDB default:
    // leaving it unwritten in BOTH texts is itself the divergence pin
    val nulls = pick(r, Seq("", " NULLS FIRST", " NULLS LAST"))
    val lim = 5 + r.nextInt(20)
    val off = if (r.nextBoolean()) s" OFFSET ${r.nextInt(10)}" else ""
    if (r.nextInt(3) == 0) {
      val q = same(s"SELECT DISTINCT ON (g) g, id, $key FROM t1 " +
        s"ORDER BY g, $key$dir$nulls, id")
      FuzzQuery(f"fz_${i}%03d_distincton", q.d, q.o)
    } else {
      val q = same(s"SELECT id, $key FROM t1 " +
        s"ORDER BY $key$dir$nulls, id LIMIT $lim$off")
      FuzzQuery(f"fz_${i}%03d_orderlimit", q.d, q.o)
    }
  }

  /** 12. GROUP BY ALL / ORDER BY ALL (DuckDB-compatible extensions):
    * key inference from the select list, with a nullable key (a) so the
    * default NULLS LAST placement rides along. */
  private def tGroupAll(r: Random, i: Int): FuzzQuery = {
    val w = boolExpr(r, 1)
    val q = cat(same("SELECT g, a, COUNT(*) AS n, "),
      Tx("SUM(b) AS sb", "SUM(b)::BIGINT AS sb"),
      same(", MIN(s) AS mns FROM t1 WHERE "), w,
      same(" GROUP BY ALL ORDER BY ALL"))
    FuzzQuery(f"fz_${i}%03d_groupall", q.d, q.o)
  }

  /** 13. Named WINDOW clause + use-site refinement (standard SQL): one
    * ORDER-BY-less base, consumers add ORDER BY and frames. DuckDB
    * resolves DIRECTLY-defined named windows natively — only chained
    * definitions hit its 1.0.0 resolver bug (duckdb_pins.py #1), so the
    * generator stays on direct definitions. */
  private def tWinClause(r: Random, i: Int): FuzzQuery = {
    val part = pick(r, Seq("PARTITION BY g", "PARTITION BY IFNULL(a, -1)"))
    val k = pick(r, Seq("b", "c", "IFNULL(a, -1)"))
    val lo = 1 + r.nextInt(3)
    val q = cat(
      same("SELECT id, "),
      Tx("SUM(b) OVER w AS sw", "(SUM(b) OVER w)::BIGINT AS sw"),
      same(s", ROW_NUMBER() OVER (w ORDER BY $k, id) AS rn"),
      same(s", RANK() OVER (w ORDER BY $k) AS rk, "),
      Tx(s"SUM(b) OVER (w ORDER BY $k, id ROWS BETWEEN $lo PRECEDING AND CURRENT ROW) AS sm",
        s"(SUM(b) OVER (w ORDER BY $k, id ROWS BETWEEN $lo PRECEDING AND CURRENT ROW))::BIGINT AS sm"),
      same(s" FROM t1 WINDOW w AS ($part) ORDER BY id"))
    FuzzQuery(f"fz_${i}%03d_winclause", q.d, q.o)
  }

  /** 14. String functions: dialect names vs DuckDB's (TO_UPPER/upper,
    * STRLEN/length, TAKE/left, SPLIT/string_split), empty strings and
    * NULL propagation; SPLIT's delimiter is LITERAL on both sides. */
  private def tStrFn(r: Random, i: Int): FuzzQuery = {
    val inner: Tx = pick(r, Seq(same("s"), same("g"),
      same(s"IFNULL(s, '${pick(r, Seq("", "zb"))}')")))
    val n = 1 + r.nextInt(3)
    val fns = Seq(
      cat(Tx("TO_UPPER(", "upper("), inner, same(") AS e1")),
      cat(Tx("TO_LOWER(", "lower("), inner, same(") AS e2")),
      cat(Tx("STRLEN(", "length("), inner, same(") AS e3")),
      cat(same("REVERSE("), inner, same(") AS e4")),
      cat(Tx(s"TAKE($n, ", "left("), inner,
        Tx(") AS e5", s", $n) AS e5")),
      cat(Tx("ARRAY_JOIN(SPLIT(", "array_to_string(string_split("), inner,
        same(", 'b'), '|') AS e6")))
    val chosen = r.shuffle(fns).take(2 + r.nextInt(3))
    val q = cat(same("SELECT id, "),
      chosen.reduce((x, y) => cat(x, same(", "), y)),
      same(" FROM t1 ORDER BY id"))
    FuzzQuery(f"fz_${i}%03d_strfn", q.d, q.o)
  }

  /** 15. WITH RECURSIVE series joined back to data (semi-naive loop +
    * the null-safe-= divergence on the join key). */
  private def tRecursive(r: Random, i: Int): FuzzQuery = {
    val k = 3 + r.nextInt(6)
    val q = cat(
      same("WITH RECURSIVE rs AS (SELECT 0 AS n FROM t2 WHERE id = 0 " +
        s"UNION ALL SELECT n + 1 AS n FROM rs WHERE n < $k) " +
        "SELECT rs.n, COUNT(t1.id) AS cnt, "),
      Tx("SUM(t1.b) AS sb", "SUM(t1.b)::BIGINT AS sb"),
      same(" FROM rs LEFT JOIN t1 ON t1.a "),
      Tx("= rs.n", "IS NOT DISTINCT FROM rs.n"),
      same(" GROUP BY rs.n ORDER BY rs.n"))
    FuzzQuery(f"fz_${i}%03d_recursive", q.d, q.o)
  }

  /** 16. Timestamp/date/time semantics over nullable ts: casts render
    * via the format mappings (dialect DATETOSTRING + 'yyyy-MM-dd' vs
    * DuckDB strftime + '%Y-%m-%d'); TIME values render as HH:MM:SS text
    * on both sides (the q_sql_datetime convention); INTERVAL literal
    * syntax is shared; DATEDIFF(a, b) = days a−b = DuckDB date
    * subtraction. */
  private def tDatetime(r: Random, i: Int): FuzzQuery = {
    // every random amount drawn ONCE and interpolated into both texts
    // (a second draw would hand the engines different intervals)
    val mins = 5 + r.nextInt(2000)
    val hrs = 1 + r.nextInt(40)
    val cut = s"2024-01-0${1 + r.nextInt(6)}"
    val fns = Seq(
      Tx("DATETOSTRING(ts :: DATE, 'yyyy-MM-dd') AS d1",
        "strftime(ts::DATE, '%Y-%m-%d') AS d1"),
      Tx("ts :: TIME AS tod", "strftime(ts, '%H:%M:%S') AS tod"),
      Tx(s"DATETOSTRING(ts + INTERVAL $mins MINUTE, 'yyyy-MM-dd HH:mm:ss') AS p1",
        s"strftime(ts + INTERVAL $mins MINUTE, '%Y-%m-%d %H:%M:%S') AS p1"),
      Tx(s"DATETOSTRING(ts - INTERVAL $hrs HOUR, 'yyyy-MM-dd HH:mm:ss') AS m1",
        s"strftime(ts - INTERVAL $hrs HOUR, '%Y-%m-%d %H:%M:%S') AS m1"),
      Tx(s"DATEDIFF(ts :: DATE, DATE '$cut') AS dd",
        s"(ts::DATE - DATE '$cut') AS dd"),
      same(s"ts > TIMESTAMP '$cut 12:00:00' AS cmp"),
      Tx("ts :: TIME > TIME '06:30:00' AS pm",
        "strftime(ts, '%H:%M:%S') > '06:30:00' AS pm"))
    val chosen = r.shuffle(fns).take(2 + r.nextInt(3))
    val q = cat(same("SELECT id, "),
      chosen.reduce((x, y) => cat(x, same(", "), y)),
      same(" FROM t1 ORDER BY id"))
    FuzzQuery(f"fz_${i}%03d_datetime", q.d, q.o)
  }

  /** 17. ASOF [LEFT] JOIN, both directions, IDENTICAL texts — DuckDB
    * 1.0 plans its native ASOF independently of the engine's union-trick
    * operator. Keys are IFNULL-projected in FROM-subqueries (the ON
    * clause takes bare columns, and DuckDB's ASOF `=` is not null-safe);
    * NULL timestamps are filtered on BOTH sides because DuckDB's ASOF
    * implements the inequality in SORT order — a NULL left ts matches
    * the key's GREATEST right ts instead of nothing (duckdb_pins.py #5;
    * seed-1 fuzzer finding), where the engine keeps SQL comparison
    * semantics (NULL compares UNKNOWN, matches nothing — AsofJoin
    * scaladoc). Only l.* and the matched right ts
    * are projected, so duplicate right (key, ts) rows — where "the"
    * match is ambiguous in both engines — cannot wobble the output. */
  private def tAsof(r: Random, i: Int): FuzzQuery = {
    val lt = if (r.nextBoolean()) "ASOF LEFT JOIN" else "ASOF JOIN"
    val cmp = if (r.nextBoolean()) ">=" else "<=" // backward / forward
    val q = cat(
      same("SELECT l.id, "),
      Tx("DATETOSTRING(l.ts, 'yyyy-MM-dd HH:mm:ss') AS lts",
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS lts"),
      same(", "),
      // the engine's asof output carries the matched right column BARE
      // (right-side qualifiers don't survive the union-trick plan);
      // unqualified `rts` is unambiguous in DuckDB too
      Tx("DATETOSTRING(rts, 'yyyy-MM-dd HH:mm:ss') AS mts",
        "strftime(rts, '%Y-%m-%d %H:%M:%S') AS mts"),
      same(" FROM (SELECT id, IFNULL(a, -1) AS ak, ts FROM t1" +
        " WHERE ts IS NOT NULL) AS l "),
      same(s"$lt (SELECT IFNULL(k, -1) AS rk, ts AS rts FROM t2" +
        " WHERE ts IS NOT NULL) AS r "),
      same(s"ON l.ak = r.rk AND l.ts $cmp r.rts ORDER BY l.id"))
    FuzzQuery(f"fz_${i}%03d_asof", q.d, q.o)
  }

  /** 18. ROWS frames + EXCLUDE GROUP/TIES (r12 collected-frame plan):
    * positional frames over TIED keys. Which peer occupies which row
    * offset is engine-chosen, so the template projects NO per-row id and
    * every aggregated value is a FUNCTION of the order key — the output
    * row MULTISET is then invariant under any peer permutation, and the
    * harness's sorted-rows compare is exact. COUNT takes the (never-null)
    * key expression for the same reason: counting a column whose null
    * pattern varies WITHIN a peer group would be positional again. Every
    * frame reaches the current row (duckdb_pins #6: DuckDB 1.0.0
    * mis-evaluates EXCLUDE on frames that don't). */
  private def tRowsExclude(big: Boolean)(r: Random, i: Int): FuzzQuery = {
    val part = pick(r, Seq("PARTITION BY g", ""))
    val key = pick(r, Seq("IFNULL(a, -1)", "IFNULL(b, -9)"))
    // the collected plan is O(frame) per row — UNBOUNDED shapes are
    // O(n²) total, exact but ruinous at the BIG tier's row counts, so
    // BIG draws finite frames only (the tWindowFrame reasoning)
    def bounds(): String = pick(r,
      Seq(
        s"BETWEEN ${1 + r.nextInt(3)} PRECEDING AND CURRENT ROW",
        s"BETWEEN ${1 + r.nextInt(2)} PRECEDING AND ${1 + r.nextInt(2)} FOLLOWING") ++
      (if (big) Nil else Seq(
        "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        "BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING")))
    val e1 = pick(r, Seq(" EXCLUDE GROUP", " EXCLUDE TIES"))
    val e2 = pick(r, Seq(" EXCLUDE GROUP", " EXCLUDE TIES"))
    val b1 = bounds(); val b2 = bounds(); val b3 = bounds()
    // g varies WITHIN a peer group when unpartitioned — project it only
    // when it is constant there (multiset invariance again)
    val gsel = if (part.isEmpty) "'x'" else "g"
    val q = cat(
      same(s"SELECT $gsel AS gg, $key AS kk, "),
      Tx(s"SUM($key * 3 + 1) OVER ($part ORDER BY $key ROWS $b1$e1) AS s1",
        s"SUM($key * 3 + 1) OVER ($part ORDER BY $key ROWS $b1$e1)::BIGINT AS s1"),
      same(s", COUNT($key) OVER ($part ORDER BY $key ROWS $b2$e2) AS c1"),
      same(s", MIN($key - 7) OVER ($part ORDER BY $key ROWS $b3$e1) AS m1"),
      same(s", MAX($key * 2) OVER ($part ORDER BY $key ROWS $b2$e1) AS x1"),
      same(" FROM t1"))
    FuzzQuery(f"fz_${i}%03d_rowsexcl", q.d, q.o)
  }

  /** 19. Frame EXCLUDE on the FRAME-VALUED window functions (r13):
    * FIRST/LAST/NTH_VALUE take the row-identity collected plan — the
    * engine deletes excluded rows from the collected frame and indexes
    * the survivors. Same multiset-invariance protocol as tRowsExclude
    * (values are functions of the tied order key, no per-row id) so the
    * positional ambiguity of ROWS frames is invisible; every frame
    * reaches the current row (duckdb_pins #6). DuckDB's EXCLUDE on these
    * functions is native — identical text. One column exercises the
    * IGNORE-NULLS-after-exclusion evaluation order. Cost: O(frame)/row —
    * BIG draws finite frames only (the tRowsExclude reasoning). */
  private def tFrameValuedExclude(big: Boolean)(r: Random, i: Int): FuzzQuery = {
    val part = pick(r, Seq("PARTITION BY g", ""))
    // BIG tier: the tiny key domains make a value-typed RANGE frame span
    // ~half the relation, and the collected plan is O(frame)/row — a
    // fine-grained key keeps tie groups ~50 rows and frames bounded (the
    // tRowsExclude BIG reasoning); the draw still happens so the default
    // tier's RNG stream is byte-identical for the pins
    val key0 = pick(r, Seq("IFNULL(a, -1)", "IFNULL(b, -9)"))
    val key = if (big) "(id % 997)" else key0
    def rbounds(): String = pick(r,
      Seq(
        s"BETWEEN ${1 + r.nextInt(3)} PRECEDING AND CURRENT ROW",
        s"BETWEEN ${1 + r.nextInt(2)} PRECEDING AND ${1 + r.nextInt(2)} FOLLOWING",
        s"BETWEEN CURRENT ROW AND ${1 + r.nextInt(3)} FOLLOWING") ++
      (if (big) Nil else Seq(
        "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING")))
    def excl(): String = pick(r,
      Seq(" EXCLUDE CURRENT ROW", " EXCLUDE GROUP", " EXCLUDE TIES"))
    val ft = pick(r, Seq("ROWS", "RANGE")) // RANGE: single numeric key ✓
    val gsel = if (part.isEmpty) "'x'" else "g"
    val nth = 1 + r.nextInt(3)
    val q = cat(
      same(s"SELECT $gsel AS gg, $key AS kk"),
      same(s", FIRST_VALUE($key * 3 + 1) OVER ($part ORDER BY $key" +
        s" $ft ${rbounds()}${excl()}) AS f1"),
      same(s", LAST_VALUE($key * 2 - 5) OVER ($part ORDER BY $key" +
        s" $ft ${rbounds()}${excl()}) AS l1"),
      same(s", NTH_VALUE($key * 5, $nth) OVER ($part ORDER BY $key" +
        s" $ft ${rbounds()}${excl()}) AS n1"),
      same(s", FIRST_VALUE(CASE WHEN $key % 3 = 0 THEN NULL" +
        s" ELSE $key * 7 END IGNORE NULLS) OVER ($part ORDER BY $key" +
        s" $ft ${rbounds()}${excl()}) AS fig"),
      same(" FROM t1"))
    FuzzQuery(f"fz_${i}%03d_fvexcl", q.d, q.o)
  }

  /** 20. Coverage sweep A (r13 VERDICT #6 — productions the map showed the
    * generator could NEVER draw): SELECT DISTINCT, star EXCLUDE/REPLACE,
    * BETWEEN SYMMETRIC, the IS_* dynamic type predicates, and
    * TOPK/TOPKDISTINCT + APPROX_COUNT_DISTINCT. Three shapes; oracles:
    * DuckDB has no SYMMETRIC (→ least/greatest), no IS_* (→ the typed-
    * column static semantics: TRY_CAST/IS NOT NULL), no TOPK (→ sorted
    * list slice, rendered through ARRAY_JOIN because the harness compares
    * rows as sorted scalars); APPROX_COUNT_DISTINCT compares against
    * EXACT COUNT(DISTINCT) — the key domain is ≤ 6 values, where the
    * HLL++ sparse representation is exact, and pinning THAT is the point
    * (a sketch that wobbles on a 6-value domain is broken). */
  private def tMiscProd(r: Random, i: Int): FuzzQuery = {
    val q = r.nextInt(3) match {
      case 0 =>
        val lo = r.nextInt(7) - 3; val hi = r.nextInt(7) - 3
        cat(
          same("SELECT DISTINCT g, IFNULL(a, -1) AS ak, "),
          Tx(s"(IFNULL(b, 0) BETWEEN SYMMETRIC $hi AND $lo) AS bs",
            s"(IFNULL(b, 0) BETWEEN least($hi, $lo)" +
              s" AND greatest($hi, $lo)) AS bs"),
          Tx(", IS_NUM(s) AS inum", ", (TRY_CAST(s AS DOUBLE) IS NOT NULL) AS inum"),
          Tx(", IS_STR(s) AS istr", ", (s IS NOT NULL) AS istr"),
          Tx(", IS_BOOL(f) AS ibool", ", (f IS NOT NULL) AS ibool"),
          same(" FROM t1"))
      case 1 =>
        // identical text: DuckDB's star EXCLUDE/REPLACE is native. ts/j
        // excluded to keep the projection scalar-typed and compact.
        val cut = 20 + r.nextInt(60)
        same("SELECT * EXCLUDE (ts, j) REPLACE (IFNULL(a, -1) AS a)" +
          s" FROM t1 WHERE id < $cut")
      case _ =>
        val k = 2 + r.nextInt(3)
        cat(
          same("SELECT g, "),
          Tx(s"ARRAY_JOIN(TOPK(IFNULL(b, 0), $k), ',') AS tk",
            "array_to_string((list_sort(list(CAST(IFNULL(b, 0) AS DOUBLE))," +
              s" 'DESC'))[1:$k], ',') AS tk"),
          Tx(s", ARRAY_JOIN(TOPKDISTINCT(IFNULL(b, 0), $k), ',') AS tkd",
            ", array_to_string((list_sort(list(DISTINCT CAST(IFNULL(b, 0)" +
              s" AS DOUBLE)), 'DESC'))[1:$k], ',') AS tkd"),
          Tx(", APPROX_COUNT_DISTINCT(a) AS acd",
            ", COUNT(DISTINCT a) AS acd"),
          same(" FROM t1 GROUP BY g"))
    }
    FuzzQuery(f"fz_${i}%03d_misc", q.d, q.o)
  }

  /** 21. Coverage sweep B: JOIN USING / NATURAL JOIN (renamed-subquery
    * sides so the shared-column contract is explicit) and the JSON access
    * operators over t1.j ({"x":n,"o":{"y":m}}). Oracle: DuckDB's native
    * USING/NATURAL; json_extract_string for ->>/#>> (the q_sql_json
    * protocol). The join keys are IFNULL'd — both engines' USING equality
    * is null-UNSAFE, so the divergence-free form keeps nulls out of the
    * key rather than certifying a semantics neither engine documents. */
  private def tJsonJoin(big: Boolean)(r: Random, i: Int): FuzzQuery = {
    val natural = r.nextBoolean()
    val jt = pick(r, Seq("JOIN", "LEFT JOIN"))
    // BIG tier: USING/NATURAL equality can't take the id band (the key
    // set is exactly the shared columns), so both sides are bounded by
    // an id cut instead — the tiny key domain would otherwise make the
    // output quadratic in R (the r11 join-template OOM class). Identical
    // text both engines; the default tier's RNG stream is untouched.
    val (lcut, rcut) =
      if (big) (" WHERE id < 400", " WHERE id < 400") else ("", "")
    val join =
      if (natural) same(s" FROM (SELECT IFNULL(a, -1) AS k, g, j FROM t1$lcut)" +
        s" AS l NATURAL $jt (SELECT IFNULL(k, -1) AS k, s2 FROM t2$rcut) AS r ")
      else same(s" FROM (SELECT IFNULL(a, -1) AS k, g, j FROM t1$lcut) AS l" +
        s" $jt (SELECT IFNULL(k, -1) AS k, s2 FROM t2$rcut) AS r USING (k) ")
    val q = cat(
      same("SELECT k, g, s2, "),
      Tx("j ->> 'x' AS jx", "json_extract_string(j, '$.x') AS jx"),
      Tx(", CAST(j -> 'o' ->> 'y' AS INTEGER) AS jy",
        ", CAST(json_extract_string(j, '$.o.y') AS BIGINT) AS jy"),
      Tx(", j #>> {'o','y'} AS jp",
        ", json_extract_string(j, '$.o.y') AS jp"),
      join)
    FuzzQuery(f"fz_${i}%03d_jsonjoin", q.d, q.o)
  }

  /** 22. STRING_AGG / ARRAY_AGG as WINDOW functions (extension; the last
    * fuzz-external production — r13 VERDICT #3). DuckDB 1.0 cannot parse
    * an in-call ORDER BY on a window function, so the oracle is the
    * DEFINITIONAL expansion the q_sql_string_agg_window gate row already
    * proved works as oracle text: row_number the partition in a CTE, then
    * a correlated ordered-aggregate subquery over each frame's row range.
    * Nothing of the engine's collect+comparator-sort window plan is
    * shared with the oracle.
    *
    * Semantics pinned (all established by the engine's grouped forms and
    * re-asserted here for frames): STRING_AGG skips NULL values and is
    * NULL on an empty/all-NULL frame (DuckDB's string_agg contract);
    * ARRAY_AGG keeps NULLs and ARRAY_JOIN drops them at render (all-NULL
    * non-empty frame → "", which the oracle spells COALESCE(…, '') under
    * a COUNT(*)-guard for the genuinely-empty EXCLUDE/FILTER cases);
    * FILTER and EXCLUDE CURRENT ROW compose (r13 surface).
    *
    * BIG tier: the default PARTITION BY g leaves ~R/4-row partitions —
    * an UNBOUNDED running collect is O(n²/partitions) and the DuckDB
    * correlated expansion scans the whole partition per row. The BIG
    * variant partitions by a fine residue (id % 211 → ~R/211-row groups)
    * and draws bounded frames only, the tWindowFrame convention: what
    * the tier certifies — plan behavior at real row counts — is
    * unchanged, and the UNBOUNDED/coarse shapes stay covered at the
    * default tier where they are cheap. */
  private def tWinStringAgg(big: Boolean)(r: Random, i: Int): FuzzQuery = {
    // partition: both texts must denote the same grouping; the oracle
    // correlates on it (non-null by construction: g never null, id % k
    // never null)
    val (partD, pkSel, corr) =
      if (big) (s"PARTITION BY id % 211 ",
        "id % 211 AS __pk, ", "e2.__pk = e.__pk AND ")
      else if (r.nextBoolean()) ("PARTITION BY g ", "g AS __pk, ",
        "e2.__pk = e.__pk AND ")
      else ("", "", "")
    val okey = pick(r, Seq("b", "c", "s"))       // window order (id tiebreak)
    val dir = if (r.nextBoolean()) " DESC" else ""
    val nulls = pick(r, Seq("", " NULLS FIRST", " NULLS LAST"))
    val ikey = pick(r, Seq("b", "c"))            // in-call element order
    // frame bounds and the rn-range they denote in the expansion; rn
    // starts at 1, so lo=0 encodes UNBOUNDED PRECEDING
    val p = 1 + r.nextInt(3)
    val fUp = r.nextInt(2)
    val frames = Seq(
      (s"ROWS BETWEEN $p PRECEDING AND CURRENT ROW", s"e.rn - $p", "e.rn"),
      (s"ROWS BETWEEN $p PRECEDING AND $fUp FOLLOWING",
        s"e.rn - $p", s"e.rn + $fUp")) ++
      (if (big) Nil else Seq(
        ("ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", "0", "e.rn")))
    val (frame, lo, hi) = pick(r, frames)
    // ROWS frames take EXCLUDE NO OTHERS / CURRENT ROW only (a ROWS
    // boundary can cut a peer group)
    val (excl, exclO) = pick(r, Seq(("", ""), (" EXCLUDE NO OTHERS", ""),
      (" EXCLUDE CURRENT ROW", " AND e2.rn <> e.rn")))
    val over = s"OVER ($partD" + s"ORDER BY $okey, id $frame$excl)"
    val range = s"FROM e e2 WHERE $corr" + s"e2.rn BETWEEN $lo AND $hi$exclO"
    // FILTER predicate: hand-qualified pair (boolExpr emits unqualified
    // refs the correlated oracle cannot reuse)
    val (fd, fo) = pick(r, Seq(
      ("f", "e2.f"), ("b > 2", "e2.b > 2"),
      ("s IS NOT NULL", "e2.s IS NOT NULL"),
      ("id % 2 = 0", "e2.id % 2 = 0")))
    val sa = Tx(
      s"STRING_AGG(s, ',' ORDER BY $ikey$dir$nulls, id) $over AS sa",
      s"(SELECT string_agg(e2.s, ',' ORDER BY e2.$ikey$dir$nulls, e2.id) " +
        s"$range) AS sa")
    val saf = Tx(
      s"STRING_AGG(s, ';' ORDER BY $ikey$dir, id) FILTER (WHERE $fd) $over AS saf",
      s"(SELECT string_agg(e2.s, ';' ORDER BY e2.$ikey$dir, e2.id) " +
        s"$range AND $fo) AS saf")
    val aa = Tx(
      s"ARRAY_JOIN(ARRAY_AGG(s ORDER BY $ikey$dir$nulls, id) $over, '|') AS aa",
      s"(SELECT CASE WHEN COUNT(*) = 0 THEN NULL ELSE " +
        s"COALESCE(string_agg(e2.s, '|' ORDER BY e2.$ikey$dir$nulls, e2.id), '') " +
        s"END $range) AS aa")
    val alen = Tx(
      s"ARRAY_LENGTH(ARRAY_AGG(g ORDER BY id) $over) AS alen",
      s"(SELECT NULLIF(COUNT(*), 0)::BIGINT $range) AS alen")
    val chosen = r.shuffle(Seq(sa, saf, aa, alen)).take(2 + r.nextInt(2))
    val ePro = Tx(
      s" FROM t1 ",
      s"WITH e AS (SELECT *, ${pkSel}ROW_NUMBER() OVER (${partD}ORDER BY " +
        s"$okey, id) AS rn FROM t1) ")
    val q = FuzzQuery(f"fz_${i}%03d_winsagg",
      "SELECT id, " + chosen.map(_.d).mkString(", ") + ePro.d + "ORDER BY id",
      ePro.o + "SELECT id, " + chosen.map(_.o).mkString(", ") +
        " FROM e ORDER BY id")
    q
  }

  private def templates(big: Boolean): Vector[Template] = Vector(
    tScalar, tAgg, tOrderedAgg, tMultiLevel, tWindowRank, tWindowFrame(big),
    tJoin(big), tSetOp, tSubquery, tCte, tOrderLimit,
    tGroupAll, tWinClause, tStrFn, tRecursive, tDatetime, tAsof,
    tRowsExclude(big), tFrameValuedExclude(big), tMiscProd, tJsonJoin(big),
    tWinStringAgg(big))

  /** `n` deterministic queries for a seed. Query i uses its own derived
    * RNG, so any query reproduces alone from (seed, i) — the shrinking
    * story: re-run a single failing index without the rest. `rows1` must
    * match the value given to [[tables]]: the BIG tier swaps the join
    * template's ON clause for its banded form (see tJoin).
    *
    * The per-query seed is MurmurHash3-mixed before use: java.util.Random
    * seeded with near-linear values repeats its first bounded draws
    * VERBATIM across queries and corpora (r11 ADVICE — every seed-1 query
    * shared its first nextInt(4)/nextBoolean choices, silently narrowing
    * the certified dialect surface to one branch of each template). */
  def queries(seed: Long, n: Int, rows1: Int = 0): Seq[FuzzQuery] = {
    val ts = templates(rows1 > 0)
    (0 until n).map { i =>
      val m1 = scala.util.hashing.MurmurHash3.productHash((seed, i))
      val m2 = scala.util.hashing.MurmurHash3.productHash((i, seed, 0x9e3779b9L))
      val r = new Random((m1.toLong << 32) | (m2.toLong & 0xffffffffL))
      ts(i % ts.size)(r, i)
    }
  }

  /** Canonical hash of a query result: rows rendered to strings, sorted,
    * MD5'd. Used by the FuzzSpec pins: a fuzz corpus certified green
    * against DuckDB (fuzz.py) has its engine-side hashes committed,
    * turning the offline differential into an in-CI regression gate.
    *
    * `*_raw`-suffixed columns (the deliberately un-ROUNDed double
    * outputs: grouped SUM(c) and windowed AVG(c), whose partial-aggregate
    * merge order Spark does not fix) are excluded from the VALUE hash —
    * a float sum landing within an ulp of any finite-precision rounding
    * boundary would flip a pinned MD5 between runs of the SAME engine
    * (r11 ADVICE). Their values are still certified: fuzz.py compares
    * them against DuckDB with rtol at certification time; the pin covers
    * every other column plus the full column-name set. Query-ROUNDed
    * doubles (≤4 dp by construction) hash exactly via the 6-dp render. */
  def resultHash(df: DataFrame): String = {
    val rawIdx = df.columns.zipWithIndex
      .collect { case (c, i) if c.endsWith("_raw") => i }.toSet
    def cell(v: Any): String = v match {
      case null => "∅"
      case d: java.lang.Double =>
        val r = math.rint(d * 1e6) / 1e6
        if (r == 0.0) "0" else BigDecimal(r).underlying.stripTrailingZeros.toPlainString
      case f: java.lang.Float => cell(f.toDouble)
      case other => other.toString
    }
    val lines = df.collect().map(_.toSeq.zipWithIndex
      .collect { case (v, i) if !rawIdx.contains(i) => cell(v) }
      .mkString("\t")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(df.columns.sorted.mkString("\t").getBytes("UTF-8"))
    lines.foreach(l => md.update(("\n" + l).getBytes("UTF-8")))
    md.digest().map(b => f"$b%02x").mkString
  }
}
