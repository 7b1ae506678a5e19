package graft.streaming

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Bucket-level zone maps for DELTA-LOG incremental views.
  *
  * Delta-log serving resolves last-writer-wins per key ABOVE the scan, so a
  * value predicate cannot push into the parquet reader: a stale
  * generation's row could pass a filter its replacement fails (see
  * Engine.upsertDeltaLog). What CAN prune soundly is a bucket's delta
  * chain as a whole — every resolved row is one of the chain's stored
  * rows, so if no stored row in any generation of the chain satisfies a
  * conjunct, no resolved row can either, and the whole bucket is skipped.
  * min/max per zoned column per leaf file give exactly that test.
  *
  * Zoned columns are the view's numeric AND string outputs. String ranges
  * compare in UTF-8 binary order — the SAME total order Spark's
  * UTF8String comparison (and therefore its min/max aggregates) uses, so
  * the range test is exact, not approximate. A numeric bound never tests
  * a string column's zones or vice versa (kind-matched at extraction):
  * cross-kind comparisons would order "10" < "2" and prune unsoundly.
  *
  * File-level pruning would be UNSOUND: dropping only a stale delta file
  * from a served chain would resurrect the older generation it superseded
  * (key k with base total=10 and delta total=3 under `total > 4` must
  * serve nothing, not the stale 10).
  */
private[streaming] object ZoneMap {

  /** One prunable conjunct of a pull predicate: `col op literal`, with the
    * literal either numeric (Left) or string (Right) — matched to the
    * zoned column's own kind. */
  final case class Bound(col: String, op: String,
                         lit: Either[BigDecimal, String])

  /** Leaf path → zoned column → (min, max): BigDecimal strings for numeric
    * columns, raw values for string columns. */
  type Zones = Map[String, Map[String, (String, String)]]

  /** UTF-8 binary comparison — Spark's string total order (UTF8String
    * compares bytes unsigned), so string zone tests agree exactly with
    * the min/max the executors computed. */
  def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Extract the prunable conjuncts of `where`: top-level AND-ed
    * comparisons between a zoned column and a non-null literal of the
    * SAME kind (numeric col ↔ numeric literal, string col ↔ string
    * literal), either operand order. Anything else (OR trees, expressions
    * over the column, kind mismatches, NaN/Inf) contributes no bound and
    * so prunes nothing — never an error. `zoned` maps the zoned column
    * name to true iff it is a string column. */
  def bounds(spark: SparkSession, where: String,
             zoned: Map[String, Boolean]): Seq[Bound] = {
    if (where.trim.equalsIgnoreCase("true")) return Nil
    val parsed = Try(spark.sessionState.sqlParser.parseExpression(where))
      .getOrElse(return Nil)
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other     => Seq(other)
    }
    def litOf(l: Literal, isString: Boolean): Option[Either[BigDecimal, String]] =
      (l.dataType, isString) match {
        case (_: NumericType, false) if l.value != null =>
          Try(BigDecimal(l.value.toString)).toOption.map(scala.Left(_))
        case (StringType, true) if l.value != null =>
          Some(scala.Right(l.value.toString))
        case _ => None
      }
    def mk(a: UnresolvedAttribute, op: String, l: Literal): Option[Bound] =
      for {
        (c, isStr) <- zoned.find(_._1.equalsIgnoreCase(a.name))
        v <- litOf(l, isStr)
      } yield Bound(c, op, v)
    split(parsed).flatMap {
      case GreaterThan(a: UnresolvedAttribute, l: Literal)        => mk(a, ">", l)
      case GreaterThan(l: Literal, a: UnresolvedAttribute)        => mk(a, "<", l)
      case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) => mk(a, ">=", l)
      case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) => mk(a, "<=", l)
      case LessThan(a: UnresolvedAttribute, l: Literal)           => mk(a, "<", l)
      case LessThan(l: Literal, a: UnresolvedAttribute)           => mk(a, ">", l)
      case LessThanOrEqual(a: UnresolvedAttribute, l: Literal)    => mk(a, "<=", l)
      case LessThanOrEqual(l: Literal, a: UnresolvedAttribute)    => mk(a, ">=", l)
      case EqualTo(a: UnresolvedAttribute, l: Literal)            => mk(a, "=", l)
      case EqualTo(l: Literal, a: UnresolvedAttribute)            => mk(a, "=", l)
      // <=> with a non-null literal filters exactly like = (min/max
      // already ignore nulls, so the range test is identical)
      case EqualNullSafe(a: UnresolvedAttribute, l: Literal)      => mk(a, "=", l)
      case EqualNullSafe(l: Literal, a: UnresolvedAttribute)      => mk(a, "=", l)
      case _                                                      => None
    }
  }

  /** May any resolved row of this bucket chain satisfy ALL bounds? A chain
    * with any leaf missing a zone for a bound's column cannot be pruned on
    * that bound (unknown range ⇒ assume satisfiable — recovery from a
    * pre-zone manifest, an all-null/NaN column in one delta, or a string
    * extreme the sidecar format cannot hold). */
  def mayMatch(chain: Seq[String], bnds: Seq[Bound], zones: Zones): Boolean =
    // an EMPTY chain serves no rows, so no predicate can match it — prune
    // outright (chains can be empty since r13: compaction of an
    // all-expired bucket records an empty chain instead of a dangling
    // path; the unguarded fold below would throw on it)
    chain.nonEmpty && bnds.forall { b =>
      val ranges = chain.map(p => zones.get(p).flatMap(_.get(b.col)))
      ranges.exists(_.isEmpty) || {
        val rs = ranges.flatten
        b.lit match {
          case scala.Left(num) =>
            val mn = rs.map(r => BigDecimal(r._1)).min
            val mx = rs.map(r => BigDecimal(r._2)).max
            b.op match {
              case ">"  => mx > num
              case ">=" => mx >= num
              case "<"  => mn < num
              case "<=" => mn <= num
              case _    => mn <= num && mx >= num
            }
          case scala.Right(str) =>
            val mn = rs.map(_._1).reduce((a, c) => if (utf8Cmp(a, c) <= 0) a else c)
            val mx = rs.map(_._2).reduce((a, c) => if (utf8Cmp(a, c) >= 0) a else c)
            b.op match {
              case ">"  => utf8Cmp(mx, str) > 0
              case ">=" => utf8Cmp(mx, str) >= 0
              case "<"  => utf8Cmp(mn, str) < 0
              case "<=" => utf8Cmp(mn, str) <= 0
              case _    => utf8Cmp(mn, str) <= 0 && utf8Cmp(mx, str) >= 0
            }
        }
      }
    }
}
