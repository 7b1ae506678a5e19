package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("TOPK returns k largest values descending, merging across partitions") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
      .repartition(8) // force partial-aggregate merge path
    val out = df.groupBy($"g").agg(TopK.topk($"v", 3).as("t"))
      .select($"t").head().getSeq[Double](0)
    assert(out == Seq(100.0, 99.0, 98.0))
  }

  test("TOPKDISTINCT dedups before ranking (AggOp.hs TOPKDISTINCT)") {
    import spark.implicits._
    val df = Seq(5.0, 5.0, 4.0, 4.0, 3.0, 1.0).map(("g", _)).toDF("g", "v")
      .repartition(4)
    val out = df.groupBy($"g").agg(TopK.topkDistinct($"v", 3).as("t"))
      .select($"t").head().getSeq[Double](0)
    assert(out == Seq(5.0, 4.0, 3.0))
  }

  test("TOPK with fewer than k values returns all, descending") {
    import spark.implicits._
    val out = Seq(("g", 2.0), ("g", 7.0)).toDF("g", "v")
      .groupBy($"g").agg(TopK.topk($"v", 5).as("t"))
      .select($"t").head().getSeq[Double](0)
    assert(out == Seq(7.0, 2.0))
  }
}
