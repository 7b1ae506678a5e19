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

  test("mixture sampling: no upsampling, binding group near target, others above") {
    val rows = CurationQueries.queries("q_curation_mix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, avail, kept, p) =>
      assert(kept <= avail, s"$lang upsampled: $kept > $avail")
      assert(p > 0.0 && p <= 1.0, s"$lang keep_p $p out of range")
    }
    // the binding group (min n/w) has p == 1, so every doc is kept
    val binding = rows.minBy { case (lang, avail, _, _) =>
      avail / (if (lang == "en") 0.40 else 0.15) }
    assert(binding._4 == 1.0 && binding._3 == binding._2,
      s"binding group ${binding._1} should keep everything: $binding")
  }

  test("split assignment: all three splits present, stable across corpus growth") {
    val small = CurationQueries.queries("q_curation_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // sf0.1 is a genuine id-SUPERSET (5000 docs vs 500) — sf0.01 shares
    // sf0.001's exact id set and would make this test vacuous
    val large = CurationQueries.queries("q_curation_split")(spark, "/root/testdata/sf0.1")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(large.size > small.size * 5, "large corpus must actually be larger")
    assert(large.values.toSet == Set("train", "val", "test"))
    assert(large.values.count(_ == "train") > large.size * 9 / 10)
    // growth stability: a doc's split never changes when the corpus grows
    small.foreach { case (id, sp) =>
      assert(large.get(id).forall(_ == sp), s"doc $id moved split: $sp -> ${large(id)}")
    }
  }

  test("shard assignment: partition of the corpus, dense positions per shard") {
    val rows = CurationQueries.queries("q_curation_shard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == n, "sharding must not drop or duplicate docs")
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.sameElements(1L to rs.length),
        s"shard $shard positions not dense: ${rs.map(_._3).sorted.toSeq}")
    }
  }

  test("scale-safe twins select the identical rows and ranks as the window forms") {
    // the bounded-heap TopKRowsAgg twins must be value-identical to the
    // exact row_number forms — that is what lets them share one oracle
    for ((exact, scalable) <- Seq(
        "q_curation_topk_group" -> "q_curation_topk_group_scalable",
        "q_curation_dsir" -> "q_curation_dsir_scalable")) {
      val a = CurationQueries.queries(exact)(spark, sf).collect().toSeq
      val b = CurationQueries.queries(scalable)(spark, sf).collect().toSeq
      assert(a.nonEmpty, s"$exact returned no rows")
      assert(a == b, s"$scalable diverges from $exact")
    }
  }

  test("DSIR importance resampling: target-language weights dominate, ranks dense") {
    val rows = CurationQueries.queries("q_curation_dsir")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // ranks dense from 1, at most 20 per language
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      assert(rs.length <= 20, s"$lang has ${rs.length} rows")
      assert(rs.map(_._4).sorted.sameElements(1L to rs.length), s"$lang ranks")
    }
    // the whole point of DSIR: docs from the target distribution (en) score
    // higher log importance weights than off-target docs on average
    val byLang = rows.groupBy(_._2).view.mapValues(rs =>
      rs.map(_._3).sum / rs.length).toMap
    val others = byLang.removed("en")
    assert(others.nonEmpty && byLang("en") > others.values.max,
      s"en mean weight must dominate: $byLang")
    // determinism: a rerun agrees exactly
    val again = CurationQueries.queries("q_curation_dsir")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }
}
