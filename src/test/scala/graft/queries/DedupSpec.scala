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

  test("paragraph dedup: injected boilerplate removed everywhere but its first host") {
    val rows = DedupQueries.queries("q_dedup_paragraph")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val hosts = rows.filter(_._1 % 4 == 0)
    assert(hosts.nonEmpty)
    // every 4th doc carries text + boilerplate; others only their text
    hosts.foreach { case (id, nParas, _, _) =>
      assert(nParas == 2, s"doc $id should have 2 paragraphs, had $nParas") }
    rows.filterNot(_._1 % 4 == 0).foreach { case (id, nParas, _, _) =>
      assert(nParas == 1, s"doc $id should have 1 paragraph, had $nParas") }
    // the boilerplate survives exactly once corpus-wide: each host after the
    // first loses (at least) its boilerplate copy
    val firstHost = hosts.map(_._1).min
    assert(hosts.count(_._3 == 0) <= 1, "only the first host keeps boilerplate")
    assert(hosts.filter(_._1 > firstHost).forall(_._3 >= 1),
      "later hosts must have their boilerplate copy removed")
    // hosts that kept everything vs lost boilerplate have different kept text
    val first = hosts.find(_._1 == firstHost).get
    assert(first._3 == 0, s"first host $firstHost must keep its boilerplate")
  }
}
