package graft.queries

import graft.SparkSpec

/** Pins for the Naive Bayes classifier pair: the shuffle-free claim of the
  * serving twin, exact batch↔served agreement (the gate also hash-checks
  * both against the same DuckDB oracle), and model sanity. */
class NbClassifierSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.load(spark, sf, "documents")

  test("model is dense and properly normalized per language") {
    val rows = TextQueries.nbModelFrom(docs).collect()
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == 256, s"$lang model not dense: ${rs.length} buckets")
      // add-1 smoothing: sum of exp(llk) over the dense vocab must be ~1
      val mass = rs.map(r => math.exp(r.getDouble(2))).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"$lang probability mass $mass")
    }
  }

  test("served scorer is map-side only: no exchange anywhere in the plan") {
    val plan = TextQueries.nbServedFrom(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("served twin reproduces the batch scores bit-for-bit") {
    val batch = TextQueries.nbScoreFrom(docs).collect()
      .map(r => (r.getLong(0), (r.getString(2), r.getDouble(3)))).toMap
    val served = TextQueries.nbServedFrom(docs).collect()
      .map(r => (r.getLong(0), (r.getString(2), r.getDouble(3)))).toMap
    assert(batch.keySet == served.keySet)
    assert(batch.nonEmpty)
    batch.foreach { case (id, bs) =>
      assert(served(id) == bs, s"doc $id: batch $bs vs served ${served(id)}")
    }
  }
}
