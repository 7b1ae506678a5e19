package graft.queries

import graft.SparkSpec

/** Property pins for the curation operators (the driver gate hash-verifies
  * values; these assert the invariants that make the operators curation-
  * correct on any corpus). */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stratified sample is deterministic: two runs agree exactly") {
    val a = CurationQueries.queries("q_curation_sample")(spark, sf).collect()
    val b = CurationQueries.queries("q_curation_sample")(spark, sf).collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("top-k per group: ranks dense from 1, at most 3 per language") {
    val rows = CurationQueries.queries("q_curation_topk_group")(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.length <= 3, s"$lang has ${rs.length} rows")
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length), s"$lang ranks ${rs.toSeq}")
    }
  }

  test("token budget: cumulative sums within budget and consistent per language") {
    val rows = CurationQueries.queries("q_curation_token_budget")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 <= 10000), "a cum_tokens exceeds the budget")
    // within a language, cum_tokens is a prefix-sum of admitted docs
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val total = rs.map(_._3).sum
      assert(rs.map(_._4).max == total, s"$lang cum/total mismatch")
    }
  }
}
