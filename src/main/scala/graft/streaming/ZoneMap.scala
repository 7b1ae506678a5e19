package graft.streaming

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.NumericType

/** Bucket-level zone maps for DELTA-LOG incremental views.
  *
  * Delta-log serving resolves last-writer-wins per key ABOVE the scan, so a
  * value predicate cannot push into the parquet reader: a stale
  * generation's row could pass a filter its replacement fails (see
  * Engine.upsertDeltaLog). What CAN prune soundly is a bucket's delta
  * chain as a whole — every resolved row is one of the chain's stored
  * rows, so if no stored row in any generation of the chain satisfies a
  * conjunct, no resolved row can either, and the whole bucket is skipped.
  * min/max per numeric column per leaf file give exactly that test.
  *
  * File-level pruning would be UNSOUND: dropping only a stale delta file
  * from a served chain would resurrect the older generation it superseded
  * (key k with base total=10 and delta total=3 under `total > 4` must
  * serve nothing, not the stale 10).
  */
private[streaming] object ZoneMap {

  /** One prunable conjunct of a pull predicate: `col op literal`. */
  final case class Bound(col: String, op: String, lit: BigDecimal)

  /** Leaf path → numeric column → (min, max) as BigDecimal strings. */
  type Zones = Map[String, Map[String, (String, String)]]

  /** Extract the prunable conjuncts of `where`: top-level AND-ed
    * comparisons between a zoned column and a non-null numeric literal,
    * either operand order. Anything else (OR trees, expressions over the
    * column, string/other literals, NaN/Inf) contributes no bound and so
    * prunes nothing — never an error. */
  def bounds(spark: SparkSession, where: String,
             zoned: Set[String]): Seq[Bound] = {
    if (where.trim.equalsIgnoreCase("true")) return Nil
    val parsed = Try(spark.sessionState.sqlParser.parseExpression(where))
      .getOrElse(return Nil)
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other     => Seq(other)
    }
    def num(l: Literal): Option[BigDecimal] = l.dataType match {
      case _: NumericType if l.value != null =>
        Try(BigDecimal(l.value.toString)).toOption
      case _ => None
    }
    def mk(a: UnresolvedAttribute, op: String, l: Literal): Option[Bound] =
      for { c <- zoned.find(_.equalsIgnoreCase(a.name)); v <- num(l) }
        yield Bound(c, op, v)
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
    * pre-zone manifest, or an all-null/NaN column in one delta). */
  def mayMatch(chain: Seq[String], bnds: Seq[Bound], zones: Zones): Boolean =
    bnds.forall { b =>
      val ranges = chain.map(p => zones.get(p).flatMap(_.get(b.col)))
      ranges.exists(_.isEmpty) || {
        val rs = ranges.flatten
        val mn = rs.map(r => BigDecimal(r._1)).min
        val mx = rs.map(r => BigDecimal(r._2)).max
        b.op match {
          case ">"  => mx > b.lit
          case ">=" => mx >= b.lit
          case "<"  => mn < b.lit
          case "<=" => mn <= b.lit
          case _    => mn <= b.lit && mx >= b.lit
        }
      }
    }
}
