package graft.queries

import graft.SparkSpec

/** Property pins for the ANN pack (the driver gate hash-verifies values;
  * these assert the retrieval-quality invariants that make the approximate
  * paths useful on any corpus). */
class AnnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def topIds(name: String): Map[Long, Seq[Long]] =
    SimilarityQueries.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

  test("PQ codes: one code per (vector, subspace), codebook ids in range") {
    val rows = SimilarityQueries.queries("q_ann_pq_codes")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length == n * 8, "exactly 8 codes per vector")
    assert(rows.map(c => (c._1, c._2)).distinct.length == rows.length)
    assert(rows.forall(c => c._3 >= 0 && c._3 < 16), "codes index the 16-entry codebook")
    // seed vectors must encode to themselves: their sub-vectors ARE the
    // codebook, so nearest centroid distance is 0 at their own cid
    rows.filter(_._1 < 16).foreach { case (vid, _, code) =>
      assert(code == vid, s"seed $vid encoded to $code")
    }
  }

  test("PQ ADC top-5 recalls most of the brute-force top-5") {
    val truth = topIds("q_ann_bruteforce")
    val pq = topIds("q_ann_pq")
    assert(pq.keySet == truth.keySet, "same query set")
    val recalls = truth.keys.toSeq.map { q =>
      truth(q).toSet.intersect(pq(q).toSet).size / 5.0
    }
    val mean = recalls.sum / recalls.length
    // 8×8 PQ over 64 dims is a lossy 32× compression; anything near-random
    // (≈5/n) would read ~0. Require a solid majority overlap on average.
    assert(mean >= 0.5, s"mean PQ recall@5 too low: $mean ($recalls)")
  }

  test("IVF-PQ top-5 recalls most of the IVF top-5 (same probed lists)") {
    // IVF-PQ reads only the probed inverted lists, so its ceiling is IVF's
    // candidate set (not the global brute-force truth): measure against
    // q_ann_ivf, which probes the same 2 lists with exact distances. The
    // residual codes + exact re-rank should recover most of that ranking.
    val ivf = topIds("q_ann_ivf")
    val ivfpq = topIds("q_ann_ivfpq")
    assert(ivfpq.keySet == ivf.keySet, "same query set")
    val recalls = ivf.keys.toSeq.map { q =>
      ivf(q).toSet.intersect(ivfpq(q).toSet).size / math.max(ivf(q).size, 1).toDouble
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.5, s"mean IVF-PQ recall@5 vs IVF too low: $mean ($recalls)")
  }
}
