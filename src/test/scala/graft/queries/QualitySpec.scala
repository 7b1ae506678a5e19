package graft.queries

import graft.SparkSpec

/** Property pins for the Gopher-style quality filter, PII redaction, and
  * SemDeDup semantic dedup (the driver gate hash-verifies exact values;
  * these assert the invariants that hold on any corpus). */
class QualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("gopher metrics: fractions in [0,1], keep consistent with thresholds, both classes present") {
    val rows = TextQueries.queries("q_quality_gopher")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getLong(1)
      val mwl = r.getDouble(2)
      val dup = r.getDouble(3)
      val topBg = r.getDouble(4)
      val keep = r.getBoolean(5)
      assert(dup >= 0.0 && dup <= 1.0, s"dup_word_frac $dup")
      assert(topBg >= 0.0 && topBg <= 1.0, s"top_bigram_frac $topBg")
      val expected = nWords >= 30 && mwl >= 3.0 && mwl <= 10.0 &&
        dup < 0.6 && topBg < 0.06
      assert(keep == expected, s"keep mismatch at doc ${r.getLong(0)}")
    }
    val kept = rows.count(_.getBoolean(5))
    assert(kept > 0 && kept < rows.length,
      s"degenerate filter: $kept/${rows.length} kept — thresholds have no signal")
  }

  test("pii redaction: all injected PII found and scrubbed") {
    val rows = TextQueries.queries("q_text_pii_redact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 1L, s"doc $id n_emails ${r.getLong(1)}")
      assert(r.getLong(2) == id % 3, s"doc $id n_ips ${r.getLong(2)}")
      assert(r.getLong(3) == 1L, s"doc $id n_phones ${r.getLong(3)}")
      val tail = r.getString(4)
      assert(!tail.contains("@"), s"doc $id leaked an email: $tail")
      assert(!tail.matches(".*\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}.*"),
        s"doc $id leaked an IP: $tail")
      assert(!tail.matches(".*\\+1-555-\\d{4}.*"), s"doc $id leaked a phone: $tail")
      assert(tail.contains("<PHONE>"), s"doc $id tail missing redaction mark: $tail")
    }
  }

  test("semantic dedup: canonical is lower id, sims above threshold, recall subset of brute-force pairs") {
    val sem = SimilarityQueries.queries("q_dedup_semantic")(spark, sf).collect()
    val brute = SimilarityQueries.queries("q_embed_neardup")(spark, sf).collect()
      .map(r => r.getLong(1)).toSet // d2 side of every ≥0.4 pair
    assert(sem.nonEmpty, "no semantic dups found at sf0.001")
    sem.foreach { r =>
      val (vid, dupOf, sim) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(dupOf < vid, s"canonical $dupOf not lower than $vid")
      assert(sim >= 0.4, s"best_sim $sim below threshold")
      assert(brute.contains(vid),
        s"vec $vid dropped by semantic dedup but no brute-force pair has it as d2")
    }
  }
}
