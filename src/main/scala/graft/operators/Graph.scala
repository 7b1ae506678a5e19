package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives used by the dedup pipeline. */
object Graph {

  /** Connected components by alternating large-star/small-star contraction
    * (the two-phase MapReduce algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014 — public literature):
    *
    *   - large-star: every node connects its strictly-LARGER neighbors to
    *     the minimum of its closed neighborhood;
    *   - small-star: every node connects its smaller-or-equal neighbors
    *     (and itself) to that minimum.
    *
    * Each phase is one groupBy(min) + one join — fully distributed, and
    * the pair provably halves the component height, so convergence is
    * O(log n) ROUNDS ON ANY GRAPH SHAPE. That is the property min-label
    * propagation lacks: its round count is the graph DIAMETER, so a
    * template-chain corpus (A≈B≈C≈… without A≈C — the boilerplate-drift
    * case) degenerates to O(n) rounds and silently splits components at
    * any iteration cap. GraphSpec pins a 4096-node chain converging in
    * well under the cap; ScaleProbe's `cc_chain_twophase_rounds` row
    * measures rounds on a 50k chain where min-label would need 50k.
    *
    * Convergence is detected by a per-round (count, hash-sum) fingerprint
    * of the edge set — one cheap aggregate action per round — CONFIRMED
    * by an exact set comparison before the loop exits, so a fingerprint
    * collision can never terminate the loop early.
    *
    * Input: SYMMETRIC (or arbitrary-direction) edge list over columns
    * `u`, `v`; self-loops ignored. Returns (u, lbl): one row per node
    * appearing in `edges0`, labelled with its component's minimum node id
    * — identical output to min-label propagation at its fixpoint. The
    * returned relation is CACHED and materialized; the caller owns it —
    * unpersist after consuming if the session runs many of these. */
  def connectedComponents(edges0: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(edges0, maxIter)._1

  /** [[connectedComponents]] plus (rounds actually run, converged) — the
    * round count feeds ScaleProbe's chain-shape comparison. */
  private[graft] def connectedComponentsWithRounds(
      edges0: DataFrame, maxIter: Int = 50): (DataFrame, Int, Boolean) = {
    import edges0.sparkSession.implicits._
    // Materialize the INPUT edge list exactly once (r15, guide §2.4/§5):
    // `nodes` and the canonical edge set are two branches off edges0, and
    // edges0 is typically the expensive part (the LSH verify pipeline for
    // q_dedup_clusters) — deriving both from one materialized frame stops
    // the second branch from re-executing that whole upstream plan.
    // persist, NOT localCheckpoint (r16, ADVICE): a localCheckpoint's
    // blocks are pinned for as long as the returned labels' lineage
    // reaches them (labels→nodes→ed0) — Dataset.unpersist is a no-op on a
    // checkpointed frame and the ContextCleaner can't reclaim a reachable
    // RDD — so sessions running many connectedComponents between cache
    // clears accumulated one full edge list per call. A CacheManager
    // persist is releasable: ed0.unpersist() below actually frees the
    // blocks once labels is materialized. The eager materialization the
    // checkpoint provided still happens at `e`'s eager localCheckpoint
    // (the first action over ed0), which populates this cache.
    val ed0 = edges0.persist()
    // canonical orientation u > v (both star phases preserve it).
    // Each round CHECKPOINTS (eagerly): an iterative DataFrame's logical
    // plan otherwise nests every previous round — re-analyzed and
    // re-optimized each iteration, the plan grows exponentially and the
    // driver dies on plan strings long before the data is the problem.
    // localCheckpoint truncates lineage in local mode; on a cluster a
    // reliable `checkpoint()` dir is the same one-line seam.
    // SCALE-ADAPTIVE round partitioning (r16, guide §2 "derive from input
    // size, not a constant"): localCheckpoint materializes through .rdd,
    // which executes the AQE plan WITHOUT runtime re-optimization — no
    // partition coalescing — so every round of a near-dup graph (a few
    // hundred edges at bench scale) ran its shuffles at the session's 32
    // partitions: pure scheduling overhead, ~30 near-empty tasks per
    // stage, ~6 stages per round. The edge count is already known each
    // round (the convergence fingerprint carries it), so the star phases
    // repartition to ceil(count / 250k rows) — 1 task at bench scale,
    // and at large counts the cap defers to the planner's defaults
    // (None ⇒ no repartition), so cluster-scale behavior is unchanged.
    val para = edges0.sparkSession.sparkContext.defaultParallelism
    def npFor(count: Long): Option[Int] = {
      val target = 250000L
      val n = ((count + target - 1) / target).toInt
      if (n >= para) None else Some(math.max(1, n))
    }
    val np0 = npFor(ed0.count()) // count also materializes the ed0 cache
    val nodes = {
      val all = ed0.select($"u").union(ed0.select($"v".as("u")))
      np0.map(n => all.repartition(n, $"u")).getOrElse(all)
        .distinct().persist()
    }
    var e = np0.map(n => ed0.repartition(n, $"u")).getOrElse(ed0)
      .filter($"u" =!= $"v")
      .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      .distinct().localCheckpoint(true)
    var prev = fingerprint(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val np = npFor(prev._1)
      // no persist on ls (r16): the window-based smallStar consumes its
      // input exactly once, so the whole round fuses into one job
      val ss = smallStar(largeStar(e, np), np).localCheckpoint(true)
      val cur = fingerprint(ss)
      if (cur == prev) // exact confirm — a colliding fingerprint must not
        // end the loop with a half-contracted forest. ONE-sided check
        // suffices (r16): the fingerprint includes the exact row count,
        // so cur == prev ⟹ |ss| = |e|; both sets are distinct-ed, and
        // ss ∖ e = ∅ with equal cardinality ⟹ ss = e.
        converged = ss.exceptAll(e).isEmpty
      e.unpersist()
      e = ss
      prev = cur
      iter += 1
    }
    if (!converged && iter >= maxIter)
      System.err.println(s"[graft] connectedComponents: NOT converged after " +
        s"$maxIter alternating-star rounds (log₂ of the largest component " +
        "exceeds the cap) — labels may split components; raise maxIter")
    // at the fixpoint the edge set is a star forest: (node → component
    // min) for every non-root node; roots label themselves. The min-agg
    // guarantees ONE row per node even when the maxIter cap left a
    // half-contracted forest (a capped node may still hold several
    // outgoing edges — a bare left join would duplicate it); at the
    // fixpoint each node has ≤ 1 edge, so the agg is free.
    // both join inputs already hash-partitioned by u at the derived width
    // (nodes above; e re-spread here), so the join and the groupBy reuse
    // those exchanges instead of re-shuffling at the session default
    val eFinal = np0.map(n => e.repartition(n, $"u")).getOrElse(e)
    val labels = nodes.join(eFinal.withColumnRenamed("v", "lbl"), Seq("u"), "left")
      .groupBy($"u").agg(min(coalesce($"lbl", $"u")).as("lbl"))
      .persist()
    labels.count() // materialize before releasing the lineage's cache
    nodes.unpersist()
    e.unpersist()
    ed0.unpersist() // r16 ADVICE: release the materialized input edge list
    (labels, iter, converged)
  }

  /** (count, xor of per-edge hashes) — a one-action per-round convergence
    * fingerprint (xor is order-independent and cannot overflow under ANSI
    * arithmetic); equality is confirmed exactly before the loop exits. */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)),
      call_function("bit_xor", xxhash64(col("u"), col("v")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** large-star(u): emit (v, min(Γ(u) ∪ {u})) for every neighbor v > u.
    * Output stays canonically oriented (child > target).
    * RESTRUCTURED r16 (guide §2.4 "share one exchange"): the per-node min
    * attaches via an unbounded window over the SAME partitioning the
    * aggregate needed, replacing groupBy(min) + join — one exchange of
    * the adjacency instead of two plus a hash join; the distinct is the
    * only other shuffle. Identical output set. */
  private def largeStar(e: DataFrame, np: Option[Int]): DataFrame = {
    import e.sparkSession.implicits._
    val adj = e.union(e.select($"v".as("u"), $"u".as("v")))
    // np (from the round's known edge count): both shuffles run at the
    // derived width — the window reuses the repartition's hash(u), the
    // distinct reuses hash(u, v) (subset/equal clustering, no second
    // exchange). None ⇒ planner defaults (large graphs, cluster scale).
    val spreadIn = np.map(n => adj.repartition(n, $"u")).getOrElse(adj)
    val win = org.apache.spark.sql.expressions.Window.partitionBy($"u")
    val starred = spreadIn.withColumn("m", least(min($"v").over(win), $"u"))
      .filter($"v" > $"u")
      .select($"v".as("u"), $"m".as("v"))
      .filter($"u" =!= $"v")
    np.map(n => starred.repartition(n, $"u", $"v")).getOrElse(starred)
      .distinct()
  }

  /** small-star(u): m = min(Γ≤(u) ∪ {u}); emit (v, m) for every
    * smaller-or-equal neighbor v ≠ m, plus (u, m). Edges arrive
    * canonically oriented, so Γ≤(u) is exactly this node's out-list.
    * Same r16 window restructure as [[largeStar]]; both output rows of a
    * source edge ((v, m) moved + (u, m) self) emit from ONE pass via an
    * array explode — the self rows duplicate per source row instead of
    * per node, and the trailing distinct (already required) dedups them.
    * Rows with v = m would emit (m, m) and are dropped by the u ≠ v
    * filter, exactly as the old v ≠ m pre-filter did. */
  private def smallStar(e: DataFrame, np: Option[Int]): DataFrame = {
    import e.sparkSession.implicits._
    val spreadIn = np.map(n => e.repartition(n, $"u")).getOrElse(e)
    val win = org.apache.spark.sql.expressions.Window.partitionBy($"u")
    val starred = spreadIn.withColumn("m", min($"v").over(win))
      .select(explode(array(
        struct($"v".as("u"), $"m".as("v")),
        struct($"u".as("u"), $"m".as("v")))).as("p"))
      .select($"p.u".as("u"), $"p.v".as("v"))
      .filter($"u" =!= $"v")
    np.map(n => starred.repartition(n, $"u", $"v")).getOrElse(starred)
      .distinct()
  }

  /** Min-label propagation — the O(diameter)-round baseline the two-phase
    * algorithm replaced (kept for the ScaleProbe round-count comparison
    * and as an independent second implementation in GraphSpec's
    * cross-check). Returns (u, lbl) like [[connectedComponents]], plus
    * the number of rounds actually run, and whether it converged. */
  private[graft] def minLabelPropagation(edges0: DataFrame, maxIter: Int = 20)
      : (DataFrame, Int, Boolean) = {
    import edges0.sparkSession.implicits._
    val edges = edges0.persist()
    var labels = edges.select($"u").distinct().withColumn("lbl", $"u").persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbr = edges.join(labels.select($"u".as("v"), $"lbl".as("nlbl")), "v")
        .groupBy($"u").agg(min($"nlbl").as("nlbl"))
      // carry the previous label through the SAME join so convergence is a
      // filter over `next`, not a second labels join per iteration
      // eager localCheckpoint, not persist: truncates the logical plan —
      // 20 rounds of nested joins otherwise re-analyze an exponentially
      // growing lineage (same seam as the two-phase loop above)
      val next = labels.join(nbr, Seq("u"), "left")
        .select($"u", $"lbl".as("old"),
          least($"lbl", coalesce($"nlbl", $"lbl")).as("lbl"))
        .localCheckpoint(true)
      converged = next.filter($"lbl" =!= $"old").isEmpty
      labels.unpersist()
      labels = next.select($"u", $"lbl")
      iter += 1
    }
    edges.unpersist()
    (labels, iter, converged)
  }
}
