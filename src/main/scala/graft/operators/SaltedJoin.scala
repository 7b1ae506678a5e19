package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic hot-key equi-join salting — the scatter/replicate pattern.
  *
  * AQE's skew-join splitter only engages when BOTH join children are bare
  * shuffle stages (pinned in SkewJoinSpec): a build side with a groupBy/
  * distinct inlined above its own shuffle never splits, which is exactly
  * the shape of every "join back to an aggregate of yourself" dedup/
  * first-occurrence pipeline. This operator is the unconditional fix: the
  * probe side scatters each row to one of `n` salts, the build side
  * replicates each row to ALL `n` salts, and the join adds the salt to the
  * equi-key — a key whose probe mass would land on one reducer now spreads
  * over `n`, regardless of what sits above either shuffle.
  *
  * Semantics: identical row multiset to `probe.join(build, keys)` (inner):
  * every probe row meets every matching build row exactly once (its one
  * salt meets the one matching replica). Cost: the build shuffle grows
  * `n`-fold — keep `n` small (4–16) and the build side narrow.
  *
  * The salt derives from `scatterBy`, a probe-side expression that should
  * vary WITHIN a hot key (a row id, offset, or hash of the full row) —
  * salting by a constant would put every replica of the hot key back on
  * one reducer.
  */
object SaltedJoin {
  def apply(probe: DataFrame, build: DataFrame, keys: Seq[String],
            scatterBy: Column, n: Int): DataFrame = {
    require(n > 0, s"salt count must be positive, got $n")
    require(keys.nonEmpty, "salted join requires at least one equi-key")
    val salted = probe.withColumn("__salt",
      pmod(scatterBy.cast("long"), lit(n.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
