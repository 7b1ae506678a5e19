package graft.queries

import graft.SparkSpec

/** Pins the MinHash+LSH hash-family invariant: the xxhash64 fast path and
  * the md5 oracle-verified path must produce the SAME verified near-dup
  * pairs with the SAME exact-Jaccard values. Same docs + same banding ⇒
  * identical candidate recall on this corpus, and the verify stage computes
  * Jaccard over injectively-hashed shingle sets, which is hash-family-
  * independent absent 32-bit collisions. A divergence here means one of the
  * twins' shingle/band pipelines drifted — caught at `sbt test` time, not
  * at end-of-round.
  */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("xxhash64 LSH twin emits exactly the md5 twin's verified pair set") {
    val md5Pairs = DedupQueries.queries("q_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val fastPairs = DedupQueries.queries("q_dedup_minhash_lsh_fast")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(md5Pairs.nonEmpty, "LSH pipeline found no pairs at sf0.001")
    assert(fastPairs.toSeq == md5Pairs.toSeq)
  }

  test("LSH pipeline recall: verified pairs equal the exact-Jaccard ground truth") {
    val lsh = DedupQueries.queries("q_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = DedupQueries.queries("q_dedup_jaccard_exact")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh.toSet == exact.toSet)
  }

  test("near-dup clusters: connected components of the pair graph, min canonical") {
    val pairs = DedupQueries.queries("q_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val members = DedupQueries.queries("q_dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty && members.nonEmpty)
    val label = members.map(m => m._1 -> m._2).toMap
    // every doc appearing in a pair is a member, and pair endpoints share
    // a component (transitivity by fixpoint)
    pairs.foreach { case (a, b) =>
      assert(label.contains(a) && label(a) == label(b), s"pair ($a,$b) split")
    }
    // canonical = the component minimum; sizes consistent
    members.groupBy(_._2).foreach { case (canon, ms) =>
      assert(ms.map(_._1).min == canon, s"canonical $canon is not the min")
      assert(ms.forall(_._3 == ms.size), s"bad cluster_size for $canon")
    }
  }
}
