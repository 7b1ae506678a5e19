package graft.operators

import scala.util.Random

import graft.SparkSpec

/** CONNECTED-COMPONENTS differential fuzzer: the generative layer for the
  * two-phase (large-star/small-star) contraction behind `q_dedup_clusters`.
  * GraphSpec's existing differential twin is min-label propagation —
  * another SPARK algorithm sharing the session and the edge-canonicalization
  * helpers — so a bug in the shared substrate (or a Spark-level
  * misplanning both implementations inherit) could agree on a wrong
  * answer. The referee here is a driver-side union-find over the raw edge
  * list: plain Scala, no DataFrame, nothing shared but the input.
  *
  * Each scenario draws a random graph from a family chosen to stress a
  * distinct failure mode of the contraction:
  *   - erdos:  uniform random edges at a density that yields MANY small
  *             components plus a giant one (merge correctness across
  *             component-count extremes);
  *   - chain:  a single long path — the O(log n)-rounds claim's worst
  *             shape, where a height-halving bug splits the component at
  *             the iteration cap;
  *   - cliques: dense cliques bridged by random edges (large-star's
  *             strictly-larger-neighbor filter does the heavy lifting);
  *   - stars:  hub-and-leaf forests with chained hubs (small-star's
  *             smaller-or-equal side);
  *   - mixed:  a union of two disjoint-id-space draws with planted
  *             self-loops, duplicate edges, and per-edge random
  *             orientation (the input contract says arbitrary direction).
  * Ids are sparsified through an affine map (no collisions, values far
  * from dense 0..n) so nothing can silently rely on contiguous ids.
  *
  * Asserted per scenario: the exact (node → component-minimum) map, one
  * row per node, AND convergence under the default round cap.
  *
  * Kept deterministic on purpose (CI must not roam): two pinned seeds.
  */
class GraphFuzzSpec extends SparkSpec {

  /** Union-find with path compression; union points the LARGER root at
    * the smaller, so every surviving root is its component's minimum id
    * — exactly the label contract of [[Graph.connectedComponents]]. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val ru = find(u); val rv = find(v)
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Sparse non-contiguous ids: affine, injective over the drawn range. */
  private def sparse(i: Long, off: Long): Long = i * 7919L + off

  private def genEdges(r: Random, shape: Int, off: Long): Seq[(Long, Long)] =
    shape match {
      case 0 => // erdos: low density → many components + a giant one
        val k = 20 + r.nextInt(180)
        val m = k / 2 + r.nextInt(2 * k)
        Seq.fill(m)((sparse(r.nextInt(k).toLong, off),
          sparse(r.nextInt(k).toLong, off)))
      case 1 => // chain: one long path (diameter = length)
        val len = 50 + r.nextInt(350)
        (0 until len).map(i =>
          (sparse(i.toLong, off), sparse(i.toLong + 1, off)))
      case 2 => // cliques + random bridges
        val nc = 3 + r.nextInt(4)
        val cliques = (0 until nc).flatMap { c =>
          val size = 4 + r.nextInt(5)
          val ids = (0 until size).map(j => sparse(c * 100L + j, off))
          for (a <- ids; b <- ids if a < b) yield (a, b)
        }
        val bridges = Seq.fill(r.nextInt(nc))(
          (sparse(r.nextInt(nc) * 100L + r.nextInt(4), off),
           sparse(r.nextInt(nc) * 100L + r.nextInt(4), off)))
        cliques ++ bridges
      case _ => // star forest, some hubs chained
        val nh = 2 + r.nextInt(5)
        val stars = (0 until nh).flatMap { h =>
          val hub = sparse(h * 50L, off)
          (1 to 3 + r.nextInt(8)).map(j => (hub, sparse(h * 50L + j, off)))
        }
        val chains = (0 until nh - 1).filter(_ => r.nextBoolean())
          .map(h => (sparse(h * 50L, off), sparse((h + 1) * 50L, off)))
        stars ++ chains
    }

  private def genScenario(r: Random, i: Int): Seq[(Long, Long)] = {
    val base =
      if (i % 5 == 4) // mixed: two families in disjoint id spaces
        genEdges(r, r.nextInt(4), off = 1L) ++
          genEdges(r, r.nextInt(4), off = 20000000L)
      else genEdges(r, i % 5, off = 1L)
    // contract stress: self-loops (ignored, but their nodes get labels),
    // verbatim duplicates, and per-edge random orientation
    val loops = Seq.fill(1 + r.nextInt(3))(
      { val x = sparse(90000L + r.nextInt(5), 1L); (x, x) })
    val dups = r.shuffle(base).take(base.size / 4)
    r.shuffle((base ++ dups ++ loops).map { case (u, v) =>
      if (r.nextBoolean()) (u, v) else (v, u)
    })
  }

  private def checkSeed(seed: Long, n: Int): Unit = {
    import spark.implicits._
    (0 until n).foreach { i =>
      val r = new Random(seed * 1000003L + i)
      val edges = genScenario(r, i)
      val want = unionFind(edges)
      val (labels, rounds, converged) =
        Graph.connectedComponentsWithRounds(edges.toDF("u", "v"))
      val got = labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      labels.unpersist()
      assert(converged, s"scenario $i did not converge in $rounds rounds")
      assert(got == want, {
        val diff = (got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)
        s"scenario $i (${edges.size} edges, ${want.size} nodes): " +
          s"${diff.size} label disagreements, e.g. ${diff.take(5)}"
      })
    }
  }

  test("cc fuzzer: pinned seed 1 — labels == driver-side union-find") {
    checkSeed(1L, 10)
  }

  test("cc fuzzer: pinned seed 6151 — labels == driver-side union-find") {
    checkSeed(6151L, 10)
  }
}
