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
    val fastPairs = DedupQueries.benchOnly("q_dedup_minhash_lsh_fast")(spark, sf)
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

  test("banded SimHash equals the exhaustive Hamming scan (banding lossless)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val banded = DedupQueries.queries("q_dedup_simhash_banded")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force over the same signatures
    val sig = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", graft.functions.PipelineFunctions
        .simhashBands(split($"text", " ")).as("sh"))
      .select($"doc_id", $"sh"(0).as("sh0"), $"sh"(1).as("sh1"),
        $"sh"(2).as("sh2"), $"sh"(3).as("sh3"))
    val dist = (bit_count($"a.sh0".bitwiseXOR($"b.sh0")) +
      bit_count($"a.sh1".bitwiseXOR($"b.sh1")) +
      bit_count($"a.sh2".bitwiseXOR($"b.sh2")) +
      bit_count($"a.sh3".bitwiseXOR($"b.sh3"))).cast("long")
    val brute = sig.as("a").join(sig.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"), dist.as("dist"))
      .filter($"dist" <= 3).orderBy($"d1", $"d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(brute.nonEmpty, "corpus has no near-dup signatures at dist <= 3")
    assert(banded.toSeq == brute.toSeq)
  }

  test("hot-bucket sub-band refinement loses no pair (synthetic hot band)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 600 docs sharing ONE band-0 value (sig low band constant) but spread
    // over the other 48 bits: a hot bucket well above the threshold, with
    // only the crafted near pairs at dist <= 3
    val rows = (0L until 600L).map { i =>
      val rest = i * 2654435761L % (1L << 48)
      (i, 42L, rest & 0xFFFFL, (rest >> 16) & 0xFFFFL, (rest >> 32) & 0xFFFFL)
    } ++ Seq( // a planted near pair inside the hot bucket (dist 1)
      (1000L, 42L, 7L, 7L, 7L),
      (1001L, 42L, 7L, 7L, 6L))
    val sig = rows.toDF("doc_id", "sh0", "sh1", "sh2", "sh3")
    val refined = DedupQueries.simhashBandedPairs(sig, hotThreshold = 100L)
      .orderBy($"d1", $"d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dist = (bit_count($"a.sh0".bitwiseXOR($"b.sh0")) +
      bit_count($"a.sh1".bitwiseXOR($"b.sh1")) +
      bit_count($"a.sh2".bitwiseXOR($"b.sh2")) +
      bit_count($"a.sh3".bitwiseXOR($"b.sh3"))).cast("long")
    val brute = sig.as("a").join(sig.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"), dist.as("dist"))
      .filter($"dist" <= 3).orderBy($"d1", $"d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(brute.exists(p => p._1 == 1000L && p._2 == 1001L),
      "planted pair must be a true near-dup")
    assert(refined.toSeq == brute.toSeq)
  }

  test("span removal cuts every injected boilerplate token, leaves clean docs intact") {
    val rows = DedupQueries.queries("q_dedup_span_removal")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, nRem) =>
      assert(nRem <= nTok)
      // the injected 8-token tail (doc_id%3) / 5-token head (doc_id%5)
      // recur corpus-wide, so their 5-grams are hot and fully covered
      if (id % 3 == 0) assert(nRem >= 8, s"doc $id tail not removed ($nRem)")
      if (id % 5 == 0) assert(nRem >= 5, s"doc $id head not removed ($nRem)")
    }
    val clean = rows.filter(r => r._1 % 3 != 0 && r._1 % 5 != 0)
    assert(clean.count(_._3 == 0) > clean.length / 2,
      "most non-injected docs should survive untouched")
  }
}
