package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The generic scatter/replicate salted join: row-multiset equivalence to
  * the plain equi-join, salt dropped from the output, and the salted plan
  * shape (replicating Generate + __salt in the join key). */
class SaltedJoinSpec extends SparkSpec {

  test("salted join = plain join row multiset; salted shape in plan") {
    import spark.implicits._
    // 90% of probe rows share one hot key — the shape AQE can't split when
    // the build side is an aggregate over the join key (SkewJoinSpec)
    val probe = (1 to 1000)
      .map(i => (if (i <= 900) "hot" else s"k$i", i.toLong)).toDF("k", "rid")
    val build = probe.groupBy($"k").agg(min($"rid").as("first_rid"))
    val plain = probe.join(build, "k")
    val salted = SaltedJoin(probe, build, Seq("k"), $"rid", 8)
    assert(salted.columns.toSet == plain.columns.toSet)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty)
    assert(plain.exceptAll(salted).isEmpty)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), plan.take(2000))
    assert(plan.contains("Generate") || plan.toLowerCase.contains("explode"),
      plan.take(2000))
  }

  test("hot key's probe rows use all n salts (spread, not re-concentration)") {
    import spark.implicits._
    val probe = (1 to 800).map(i => ("hot", i.toLong)).toDF("k", "rid")
    val build = Seq(("hot", 1L)).toDF("k", "first_rid")
    val salted = SaltedJoin(probe, build, Seq("k"), $"rid", 8)
    assert(salted.count() == 800)
    // the scatter expression reaches all 8 salts for this key
    assert(probe.select(pmod($"rid", lit(8L))).distinct().count() == 8)
  }
}
