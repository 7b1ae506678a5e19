package graft.queries

import graft.SparkSpec

/** Fleet-wide physical-plan audit over EVERY gate query: no accidental
  * non-broadcast cartesian product may appear anywhere. The deliberate
  * O(n²) correctness anchors (brute-force pair scans whose scale paths are
  * separate gate queries) are allowlisted explicitly — a new query that
  * joins without keys fails here at `sbt test` time instead of surfacing
  * as a 100 TB incident. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose CartesianProduct is the documented point of the query
    * (exact ground-truth anchors; each names its scale-path twin). */
  private val deliberatePairScans = Set(
    "q_dedup_jaccard_exact",   // anchor for q_dedup_minhash_lsh
    "q_dedup_simhash_pairs",   // anchor for q_dedup_simhash_banded
    "q_embed_neardup",         // anchor for q_ann_lsh_bucketed
    "q_embed_clusters",        // built on the anchor pairs (scale: bucketed)
    "q_dedup_semantic"         // within-cluster pairs; Σ|cluster|² by design
  )

  test("no gate query plans a non-broadcast cartesian product (unless a documented anchor)") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable =>
            fail(s"$name failed to plan: ${e.getMessage}")
          }
        if (plan.contains("CartesianProduct") &&
            !deliberatePairScans.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected CartesianProduct in: ${offenders.mkString(", ")}")
    spark.catalog.clearCache()
  }
}
