package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** TOPK / TOPKDISTINCT aggregate (reference: hstream-sql AST.hs:269-301,
  * grammar SQL-v1.cf:274-275; the V1 runtime left the per-row step
  * `undefined` — AggOp.hs:104-105 — so this is also a fix, matching the
  * commented intent at AggOp.hs:107-129: top-k numeric values as a
  * descending-sorted array).
  *
  * Implemented as a typed [[Aggregator]] so Spark gets partial aggregation
  * for free: each partition reduces to <= `cap` values before the shuffle,
  * so at 100 TB the shuffle carries O(partitions * k) doubles, not the data.
  * The buffer is an unsorted Vector compacted lazily at 4k elements —
  * amortized O(1) insert, O(k log k) compaction.
  */
final class TopKAgg(k: Int, distinct: Boolean)
    extends Aggregator[Double, Vector[Double], Seq[Double]] {
  require(k > 0, s"TOPK k must be positive, got $k")
  private val cap = 4 * k

  private def compact(b: Vector[Double]): Vector[Double] = {
    val base = if (distinct) b.distinct else b
    base.sortBy(-_).take(k)
  }

  override def zero: Vector[Double] = Vector.empty
  override def reduce(b: Vector[Double], a: Double): Vector[Double] = {
    val nb = b :+ a
    if (nb.length >= cap) compact(nb) else nb
  }
  override def merge(b1: Vector[Double], b2: Vector[Double]): Vector[Double] =
    compact(b1 ++ b2)
  override def finish(r: Vector[Double]): Seq[Double] = compact(r)

  override def bufferEncoder: Encoder[Vector[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object TopK {
  /** `topk(col, k)`: k largest values, descending. */
  def topk(c: Column, k: Int): Column =
    udaf(new TopKAgg(k, distinct = false), Encoders.scalaDouble).apply(c)

  /** `topkdistinct(col, k)`: k largest distinct values, descending. */
  def topkDistinct(c: Column, k: Int): Column =
    udaf(new TopKAgg(k, distinct = true), Encoders.scalaDouble).apply(c)
}
