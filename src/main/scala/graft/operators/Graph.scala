package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives used by the dedup pipeline. */
object Graph {

  /** Connected components by min-label propagation over a SYMMETRIC edge
    * list (columns `u`, `v`): every node's label shrinks monotonically to
    * its component minimum, so the fixpoint is the exact component id
    * regardless of schedule. The driver loop only ORCHESTRATES iterations
    * (the classic Pregel shape — GraphX does the same); every data
    * operation is a distributed join/agg over the edge node set, and the
    * loop runs at most graph-diameter rounds (near-dup clusters are
    * near-cliques — 2-3 rounds in practice).
    *
    * Returns (u, lbl): one row per node appearing in `edges`, labelled with
    * its component's minimum node id. The returned relation is CACHED (it
    * fed the final convergence check); the caller owns it — unpersist after
    * consuming if the session runs many of these. Intermediate labels and
    * the edge relation are released here. */
  def connectedComponents(edges0: DataFrame, maxIter: Int = 20): DataFrame = {
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
      val next = labels.join(nbr, Seq("u"), "left")
        .select($"u", $"lbl".as("old"),
          least($"lbl", coalesce($"nlbl", $"lbl")).as("lbl"))
        .persist()
      converged = next.filter($"lbl" =!= $"old").isEmpty
      labels.unpersist()
      labels = next.select($"u", $"lbl")
      iter += 1
    }
    if (!converged)
      System.err.println(s"[graft] connectedComponents: NOT converged after " +
        s"$maxIter iterations (graph diameter exceeds the cap) — " +
        "labels may split components; raise maxIter")
    edges.unpersist()
    labels
  }
}
