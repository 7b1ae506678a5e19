package graft.sql

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** INDEPENDENT window-frame semantics pin: a brute-force row-at-a-time
  * evaluator (sort each partition as a Scala Vector, compute every frame
  * LITERALLY from the SQL-standard definition — row offsets for ROWS,
  * value intervals with peer inclusion for RANGE, peer-group indices for
  * GROUPS) checked against the engine on randomized tables and randomized
  * frame bounds. Unlike the DuckDB gate oracles, nothing here shares the
  * engine's rewrite (the GROUPS → RANGE-over-dense_rank expansion): the
  * evaluator never builds a frame translation at all, so agreement pins
  * the semantics, not the rewrite. */
class FrameOracleSpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  // ---- brute-force evaluator -------------------------------------------
  // v is nullable (Option): SUM/MIN/MAX skip NULLs and return NULL when a
  // frame holds none; COUNT(v) counts non-nulls. The NULL rows pin the
  // EXCLUDE planner's peer-sum coalesce (an all-NULL peer group must not
  // NULL the whole subtraction).
  private case class R(i: Long, k: String, o: Long, v: Option[Long])

  private sealed trait B
  private case object UP extends B
  private case class P(n: Long) extends B
  private case object CR extends B
  private case class F(n: Long) extends B
  private case object UF extends B

  private def sqlOf(b: B): String = b match {
    case UP => "UNBOUNDED PRECEDING"
    case P(n) => s"$n PRECEDING"
    case CR => "CURRENT ROW"
    case F(n) => s"$n FOLLOWING"
    case UF => "UNBOUNDED FOLLOWING"
  }

  /** The frame's rows for `part(idx)`, straight from the standard:
    * ROWS = physical offsets; RANGE = order-value interval (CURRENT ROW
    * means the peer value itself, so ties join the frame from either
    * bound); GROUPS = peer-group (distinct order value) index offsets. */
  private def frameRows(mode: String, part: Vector[R], idx: Int,
                        lo: B, hi: B): Vector[R] = mode match {
    case "ROWS" =>
      val s = lo match { case UP => 0
        case P(n) => idx - n.toInt; case CR => idx
        case F(n) => idx + n.toInt; case UF => part.size - 1 }
      val t = hi match { case UP => 0
        case P(n) => idx - n.toInt; case CR => idx
        case F(n) => idx + n.toInt; case UF => part.size - 1 }
      if (s > t) Vector.empty
      else part.slice(math.max(s, 0), math.min(t, part.size - 1) + 1)
    case "RANGE" =>
      val cur = part(idx).o
      val loV = lo match { case UP => Long.MinValue
        case P(n) => cur - n; case CR => cur; case F(n) => cur + n
        case UF => Long.MaxValue }
      val hiV = hi match { case UP => Long.MinValue
        case P(n) => cur - n; case CR => cur; case F(n) => cur + n
        case UF => Long.MaxValue }
      part.filter(r => r.o >= loV && r.o <= hiV)
    case "GROUPS" =>
      val groups = part.map(_.o).distinct.sorted
      val gOf = groups.zipWithIndex.toMap
      val g = gOf(part(idx).o)
      val s = lo match { case UP => 0
        case P(n) => g - n.toInt; case CR => g
        case F(n) => g + n.toInt; case UF => groups.size - 1 }
      val t = hi match { case UP => 0
        case P(n) => g - n.toInt; case CR => g
        case F(n) => g + n.toInt; case UF => groups.size - 1 }
      part.filter(r => gOf(r.o) >= s && gOf(r.o) <= t)
  }

  /** (sum, count, min, max) with SQL null semantics over an empty frame. */
  private def bruteAggs(rows: Seq[R], orderCol: R => Long, mode: String,
                        lo: B, hi: B): Map[Long, (Option[Long], Long, Option[Long], Option[Long])] =
    rows.groupBy(_.k).flatMap { case (_, ps) =>
      val part = ps.sortBy(r => (orderCol(r), r.i)).toVector
      part.zipWithIndex.map { case (r, idx) =>
        val vals = frameRows(mode, part, idx, lo, hi).flatMap(_.v)
        r.i -> (if (vals.isEmpty) (None, 0L, None, None)
                else (Some(vals.sum), vals.size.toLong,
                  Some(vals.min), Some(vals.max)))
      }
    }

  // ---- randomized data + frames ----------------------------------------
  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(seed + i)))

  private val tableGen = for {
    n <- Gen.chooseNum(3, 40)
    ks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    os <- Gen.listOfN(n, Gen.chooseNum(0L, 9L)) // deliberate ties
    vs <- Gen.listOfN(n, Gen.frequency(
      4 -> Gen.chooseNum(-50L, 50L).map(Some(_): Option[Long]),
      1 -> Gen.const(None: Option[Long])))
  } yield ks.lazyZip(os).lazyZip(vs).toList.zipWithIndex
    .map { case ((k, o, v), i) => R(i.toLong, k, o, v) }

  private val boundPair: Gen[(B, B)] = Gen.oneOf(
    Gen.const((UP: B, CR: B)),
    Gen.const((UP: B, UF: B)),
    Gen.chooseNum(0L, 4L).map(n => (P(n): B, CR: B)),
    for (a <- Gen.chooseNum(0L, 4L); b <- Gen.chooseNum(0L, 4L))
      yield (P(a): B, F(b): B),
    Gen.chooseNum(0L, 4L).map(n => (CR: B, F(n): B)),
    Gen.const((CR: B, UF: B)),
    // empty-capable shapes: a trailing / leading frame can miss every row
    for (a <- Gen.chooseNum(1L, 4L); b <- Gen.chooseNum(0L, 4L)) yield
      if (a >= b) (P(a): B, P(b): B) else (P(b): B, P(a): B),
    for (a <- Gen.chooseNum(0L, 4L); b <- Gen.chooseNum(1L, 4L)) yield
      if (a <= b) (F(a): B, F(b): B) else (F(b): B, F(a): B))

  private def check(mode: String, seed: Long): Unit = {
    import spark.implicits._
    // ROWS over tied order keys is nondeterministic by definition — order
    // by the unique i there; RANGE/GROUPS get tied keys (the interesting
    // case: peers enter frames together)
    val orderSql = if (mode == "ROWS") "i" else "o"
    val orderCol: R => Long = if (mode == "ROWS") _.i else _.o
    samples(tableGen, 5, seed).zipWithIndex.foreach { case (data, ti) =>
      data.map(r => (r.i, r.k, r.o, r.v)).toDF("i", "k", "o", "v")
        .createOrReplaceTempView("fo_t")
      samples(boundPair, 4, seed * 31 + ti).foreach { case (lo, hi) =>
        val fr = s"$mode BETWEEN ${sqlOf(lo)} AND ${sqlOf(hi)}"
        val got = e.batch(
          s"""SELECT i,
                     SUM(v) OVER (PARTITION BY k ORDER BY $orderSql $fr) AS s,
                     COUNT(v) OVER (PARTITION BY k ORDER BY $orderSql $fr) AS c,
                     MIN(v) OVER (PARTITION BY k ORDER BY $orderSql $fr) AS mn,
                     MAX(v) OVER (PARTITION BY k ORDER BY $orderSql $fr) AS mx
              FROM fo_t ORDER BY i;""").collect()
          .map(r => r.getLong(0) -> (
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
        val want = bruteAggs(data, orderCol, mode, lo, hi)
        assert(got == want,
          s"$fr over ORDER BY $orderSql mismatch\n table=${data.take(10)}…\n" +
            s" got=${got.toSeq.sortBy(_._1).take(8)}\n want=${want.toSeq.sortBy(_._1).take(8)}")
      }
    }
  }

  test("ROWS frames match the literal evaluator on randomized tables") {
    check("ROWS", 1001L)
  }
  test("RANGE frames (tied keys) match the literal evaluator") {
    check("RANGE", 2002L)
  }
  test("GROUPS frames (tied keys) match the literal evaluator") {
    check("GROUPS", 3003L)
  }

  // ---- frame EXCLUDE (r9 extension) ------------------------------------
  /** Literal exclusion: drop the excluded rows FROM the frame set. The
    * current row is identified by its unique i; peers by order value. */
  private def applyExclude(fr: Vector[R], cur: R, excl: String,
                           peerKey: R => Long): Vector[R] = excl match {
    case "NO OTHERS" => fr
    case "CURRENT ROW" => fr.filterNot(_.i == cur.i)
    case "GROUP" => fr.filterNot(r => peerKey(r) == peerKey(cur))
    // the standard's exclusion only ever REMOVES rows: TIES drops the
    // peers OTHER than the current row, and never adds an absent current
    // row (PostgreSQL agrees; DuckDB 1.0.0 diverges on frames that don't
    // reach the current row — duckdb_pins.py #6)
    case "TIES" =>
      fr.filterNot(r => peerKey(r) == peerKey(cur) && r.i != cur.i)
  }

  private def checkExclude(mode: String, excl: String, seed: Long): Unit = {
    import spark.implicits._
    val orderSql = if (mode == "ROWS") "i" else "o"
    val orderCol: R => Long = if (mode == "ROWS") _.i else _.o
    // r11: MIN/MAX accept every supported mode × EXCLUDE combo (the
    // collected-frame plan covers what the prefix/suffix decompositions
    // can't), so the literal evaluator checks them everywhere.
    val withMinMax = true
    samples(tableGen, 4, seed).zipWithIndex.foreach { case (data, ti) =>
      data.map(r => (r.i, r.k, r.o, r.v)).toDF("i", "k", "o", "v")
        .createOrReplaceTempView("fo_t")
      samples(boundPair, 3, seed * 17 + ti).foreach { case (lo, hi) =>
        val fr = s"$mode BETWEEN ${sqlOf(lo)} AND ${sqlOf(hi)} EXCLUDE $excl"
        val mmSql = if (withMinMax)
          s""", MIN(v) OVER (PARTITION BY k ORDER BY $orderSql $fr) AS mn,
               MAX(v) OVER (PARTITION BY k ORDER BY $orderSql $fr) AS mx"""
          else ""
        val got = e.batch(
          s"""SELECT i,
                     SUM(v) OVER (PARTITION BY k ORDER BY $orderSql $fr) AS s,
                     COUNT(v) OVER (PARTITION BY k ORDER BY $orderSql $fr) AS c,
                     AVG(v) OVER (PARTITION BY k ORDER BY $orderSql $fr) AS a
                     $mmSql
              FROM fo_t ORDER BY i;""").collect()
          .map(r => r.getLong(0) -> (
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (!withMinMax || r.isNullAt(4)) None else Some(r.getLong(4)),
            if (!withMinMax || r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
        val want = data.groupBy(_.k).flatMap { case (_, ps) =>
          val part = ps.sortBy(r => (orderCol(r), r.i)).toVector
          part.zipWithIndex.map { case (r, idx) =>
            val fr0 = frameRows(mode, part, idx, lo, hi)
            val vals = applyExclude(fr0, r, excl, orderCol).flatMap(_.v)
            r.i -> (if (vals.isEmpty) (None, 0L, None, None, None)
                    else (Some(vals.sum), vals.size.toLong,
                      Some(vals.sum.toDouble / vals.size),
                      if (withMinMax) Some(vals.min) else None,
                      if (withMinMax) Some(vals.max) else None))
          }
        }
        val close = got.keySet == want.keySet && got.keySet.forall { i =>
          val (gs, gc, ga, gmn, gmx) = got(i)
          val (ws, wc, wa, wmn, wmx) = want(i)
          gs == ws && gc == wc && gmn == wmn && gmx == wmx &&
            ((ga, wa) match {
              case (None, None) => true
              case (Some(x), Some(y)) => math.abs(x - y) < 1e-9
              case _ => false
            })
        }
        assert(close,
          s"$fr over ORDER BY $orderSql mismatch\n table=${data.take(10)}…\n" +
            s" got=${got.toSeq.sortBy(_._1).take(8)}\n want=${want.toSeq.sortBy(_._1).take(8)}")
      }
    }
  }

  test("ROWS EXCLUDE CURRENT ROW (incl. MIN/MAX) matches the literal evaluator") {
    checkExclude("ROWS", "CURRENT ROW", 4004L)
  }

  /** ROWS + GROUP/TIES (r12 collected-frame plan): a ROWS frame over TIED
    * order keys is positional — which peer sits at which offset is
    * engine-chosen — so per-row equality is not well-defined. Two things
    * ARE invariant under any peer permutation, and the check pins both:
    * (a) with every value a FUNCTION of the order key, the value sequence
    * in sort order is engine-independent, and (b) the MULTISET of
    * (k, o, aggs…) output rows is then identical whichever engine-chosen
    * permutation produced it. */
  private def checkExcludeRowsPeers(excl: String, seed: Long): Unit = {
    import spark.implicits._
    def fv(o: Long): Option[Long] = if (o == 3L) None else Some(o * 7 - 11)
    samples(tableGen, 4, seed).zipWithIndex.foreach { case (data0, ti) =>
      val data = data0.map(r => r.copy(v = fv(r.o)))
      data.map(r => (r.i, r.k, r.o, r.v)).toDF("i", "k", "o", "v")
        .createOrReplaceTempView("fo_t")
      samples(boundPair, 3, seed * 17 + ti).foreach { case (lo, hi) =>
        val fr = s"ROWS BETWEEN ${sqlOf(lo)} AND ${sqlOf(hi)} EXCLUDE $excl"
        val got = e.batch(
          s"""SELECT k, o,
                     SUM(v) OVER (PARTITION BY k ORDER BY o $fr) AS s,
                     COUNT(v) OVER (PARTITION BY k ORDER BY o $fr) AS c,
                     AVG(v) OVER (PARTITION BY k ORDER BY o $fr) AS a,
                     MIN(v) OVER (PARTITION BY k ORDER BY o $fr) AS mn,
                     MAX(v) OVER (PARTITION BY k ORDER BY o $fr) AS mx
              FROM fo_t;""").collect()
          .map(r => (r.getString(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)),
            if (r.isNullAt(5)) None else Some(r.getLong(5)),
            if (r.isNullAt(6)) None else Some(r.getLong(6))))
          .groupBy(identity).view.mapValues(_.size).toMap
        val want = data.groupBy(_.k).toSeq.flatMap { case (_, ps) =>
          val part = ps.sortBy(r => (r.o, r.i)).toVector
          part.zipWithIndex.map { case (r, idx) =>
            val fr0 = frameRows("ROWS", part, idx, lo, hi)
            val vals = applyExclude(fr0, r, excl, _.o).flatMap(_.v)
            (r.k, r.o,
              if (vals.isEmpty) None else Some(vals.sum),
              vals.size.toLong,
              if (vals.isEmpty) None else Some(vals.sum.toDouble / vals.size),
              vals.minOption, vals.maxOption)
          }
        }.groupBy(identity).view.mapValues(_.size).toMap
        assert(got == want,
          s"$fr multiset mismatch\n table=${data.take(10)}…\n" +
            s" got=${got.toSeq.sortBy(_.toString).take(8)}\n" +
            s" want=${want.toSeq.sortBy(_.toString).take(8)}")
      }
    }
  }

  test("ROWS EXCLUDE GROUP / TIES (r12) match the literal evaluator as multisets") {
    checkExcludeRowsPeers("GROUP", 11011L)
    checkExcludeRowsPeers("TIES", 12012L)
  }

  /** Frame-valued functions under EXCLUDE (r13): FIRST/LAST/NTH_VALUE
    * (RESPECT and IGNORE NULLS) and the windowed ordered aggregates,
    * against the literal evaluator. Everything orders by the TIED key o
    * with values a FUNCTION of o (NULL at o=3), so any engine-chosen peer
    * permutation yields the same value sequence — results compare as
    * multisets of (k, o, …) rows, the checkExcludeRowsPeers protocol. */
  private def checkExcludeFrameValued(mode: String, excl: String,
                                      seed: Long): Unit = {
    import spark.implicits._
    def fv(o: Long): Option[Long] = if (o == 3L) None else Some(o * 7 - 11)
    samples(tableGen, 4, seed).zipWithIndex.foreach { case (data0, ti) =>
      val data = data0.map(r => r.copy(v = fv(r.o)))
      data.map(r => (r.i, r.k, r.o, r.v)).toDF("i", "k", "o", "v")
        .createOrReplaceTempView("fo_t")
      samples(boundPair, 3, seed * 17 + ti).foreach { case (lo, hi) =>
        val fr = s"$mode BETWEEN ${sqlOf(lo)} AND ${sqlOf(hi)} EXCLUDE $excl"
        val got = e.batch(
          s"""SELECT k, o,
                     FIRST_VALUE(v) OVER (PARTITION BY k ORDER BY o $fr) AS f,
                     LAST_VALUE(v) OVER (PARTITION BY k ORDER BY o $fr) AS l,
                     NTH_VALUE(v, 2) OVER (PARTITION BY k ORDER BY o $fr) AS n2,
                     FIRST_VALUE(v IGNORE NULLS)
                       OVER (PARTITION BY k ORDER BY o $fr) AS fig,
                     STRING_AGG(v, ',' ORDER BY v)
                       OVER (PARTITION BY k ORDER BY o $fr) AS sa,
                     ARRAY_AGG(v ORDER BY v DESC)
                       OVER (PARTITION BY k ORDER BY o $fr) AS aa
              FROM fo_t;""").collect()
          .map(r => (r.getString(0), r.getLong(1),
            (2 to 4).map(c => if (r.isNullAt(c)) None else Some(r.getLong(c))),
            if (r.isNullAt(5)) None else Some(r.getLong(5)),
            if (r.isNullAt(6)) None else Some(r.getString(6)),
            if (r.isNullAt(7)) None
            else Some(r.getSeq[Any](7).map(Option(_)
              .map(_.asInstanceOf[Long])).toList)))
          .groupBy(identity).view.mapValues(_.size).toMap
        // exclusion activity, the engine's static rule: ROWS + GROUP/TIES
        // is always live (peers are positional); otherwise 0 ∈ bounds
        val active = (mode == "ROWS" && excl != "CURRENT ROW") || {
          val loOk = lo match { case UP | CR => true; case P(_) => true
            case F(n) => n == 0L; case UF => false }
          val hiOk = hi match { case UF | CR => true; case F(_) => true
            case P(n) => n == 0L; case UP => false }
          loOk && hiOk
        }
        val want = data.groupBy(_.k).toSeq.flatMap { case (_, ps) =>
          val part = ps.sortBy(r => (r.o, r.i)).toVector
          part.zipWithIndex.map { case (r, idx) =>
            val fr0 = frameRows(mode, part, idx, lo, hi)
            val surv =
              if (active) applyExclude(fr0, r, excl, _.o) else fr0
            val nn = surv.flatMap(_.v)
            (r.k, r.o,
              Seq(surv.headOption.flatMap(_.v), surv.lastOption.flatMap(_.v),
                surv.lift(1).flatMap(_.v)),
              nn.headOption,
              if (nn.isEmpty) None else Some(nn.sorted.mkString(",")),
              // empty → NULL only under an ACTIVE exclusion (or FILTER);
              // the plain windowed ARRAY_AGG keeps the empty array
              if (surv.isEmpty && active) None
              else Some(surv.map(_.v).sortBy {
                case Some(x) => (0, -x); case None => (1, 0L) }.toList))
          }
        }.groupBy(identity).view.mapValues(_.size).toMap
        assert(got == want,
          s"$fr frame-valued multiset mismatch\n table=${data.take(10)}…\n" +
            s" got=${got.toSeq.sortBy(_.toString).take(6)}\n" +
            s" want=${want.toSeq.sortBy(_.toString).take(6)}")
      }
    }
  }

  test("frame-valued fns: ROWS EXCLUDE modes match the literal evaluator") {
    checkExcludeFrameValued("ROWS", "CURRENT ROW", 13013L)
    checkExcludeFrameValued("ROWS", "GROUP", 14014L)
    checkExcludeFrameValued("ROWS", "TIES", 15015L)
  }
  test("frame-valued fns: RANGE EXCLUDE modes match the literal evaluator") {
    checkExcludeFrameValued("RANGE", "CURRENT ROW", 16016L)
    checkExcludeFrameValued("RANGE", "GROUP", 17017L)
    checkExcludeFrameValued("RANGE", "TIES", 18018L)
  }
  test("frame-valued fns: GROUPS EXCLUDE modes match the literal evaluator") {
    checkExcludeFrameValued("GROUPS", "CURRENT ROW", 19019L)
    checkExcludeFrameValued("GROUPS", "GROUP", 20020L)
    checkExcludeFrameValued("GROUPS", "TIES", 21021L)
  }
  test("RANGE EXCLUDE CURRENT ROW / GROUP / TIES match the literal evaluator") {
    checkExclude("RANGE", "CURRENT ROW", 5005L)
    checkExclude("RANGE", "GROUP", 6006L)
    checkExclude("RANGE", "TIES", 7007L)
  }
  test("GROUPS EXCLUDE CURRENT ROW / GROUP / TIES (incl. MIN/MAX) match the literal evaluator") {
    checkExclude("GROUPS", "CURRENT ROW", 8008L)
    checkExclude("GROUPS", "GROUP", 9009L)
    checkExclude("GROUPS", "TIES", 10010L)
  }
}
