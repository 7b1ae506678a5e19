package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  test("connectedComponents merges a diameter-3 chain (multiple propagation rounds)") {
    import spark.implicits._
    // chain 1-2-3-4 (labels must cross three hops) + a separate pair
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L),
      (10L, 11L), (11L, 10L)).toDF("u", "v")
    val labels = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L), s"got $labels")
  }

  test("maxIter cap returns (possibly partial) labels instead of hanging") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("u", "v")
    val labels = Graph.connectedComponents(edges, maxIter = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == Set(1L, 2L, 3L)) // every node labelled, loop bounded
  }
}
