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
    // q_dedup_clusters) — deriving both from one eager checkpoint stops
    // the second branch from re-executing that whole upstream plan.
    val ed0 = edges0.localCheckpoint(true)
    val nodes = ed0.select($"u").union(ed0.select($"v".as("u")))
      .distinct().persist()
    // canonical orientation u > v (both star phases preserve it).
    // Each round CHECKPOINTS (eagerly): an iterative DataFrame's logical
    // plan otherwise nests every previous round — re-analyzed and
    // re-optimized each iteration, the plan grows exponentially and the
    // driver dies on plan strings long before the data is the problem.
    // localCheckpoint truncates lineage in local mode; on a cluster a
    // reliable `checkpoint()` dir is the same one-line seam.
    var e = ed0.filter($"u" =!= $"v")
      .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      .distinct().localCheckpoint(true)
    var prev = fingerprint(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val ls = largeStar(e).persist()
      val ss = smallStar(ls).localCheckpoint(true) // action: materializes
      val cur = fingerprint(ss)
      if (cur == prev) // exact confirm — a colliding fingerprint must not
        converged =    // end the loop with a half-contracted forest
          ss.exceptAll(e).isEmpty && e.exceptAll(ss).isEmpty
      ls.unpersist()
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
    val labels = nodes.join(e.withColumnRenamed("v", "lbl"), Seq("u"), "left")
      .groupBy($"u").agg(min(coalesce($"lbl", $"u")).as("lbl"))
      .persist()
    labels.count() // materialize before releasing the lineage's cache
    nodes.unpersist()
    e.unpersist()
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
    * Output stays canonically oriented (child > target). */
  private def largeStar(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val adj = e.union(e.select($"v".as("u"), $"u".as("v")))
    val mins = adj.groupBy($"u").agg(min($"v").as("mv"))
      .select($"u", least($"mv", $"u").as("m"))
    adj.join(mins, "u").filter($"v" > $"u")
      .select($"v".as("u"), $"m".as("v"))
      .filter($"u" =!= $"v")
      .distinct()
  }

  /** small-star(u): m = min(Γ≤(u) ∪ {u}); emit (v, m) for every
    * smaller-or-equal neighbor v ≠ m, plus (u, m). Edges arrive
    * canonically oriented, so Γ≤(u) is exactly this node's out-list. */
  private def smallStar(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val mins = e.groupBy($"u").agg(min($"v").as("m"))
    val moved = e.join(mins, "u").filter($"v" =!= $"m")
      .select($"v".as("u"), $"m".as("v"))
    val self = mins.select($"u", $"m".as("v"))
    moved.union(self).filter($"u" =!= $"v").distinct()
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
