package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Partition pruning — the 100 TB layout strategy for time/category-sliced
  * scans: data written partitioned by a predicate column means a filtered
  * query reads only matching directories (PartitionFilters in the scan, not
  * a post-scan filter). On a date-partitioned 100 TB corpus this is the
  * difference between scanning a day and scanning a year.
  */
class PartitionPruningSpec extends SparkSpec {

  test("filter on the partition column prunes directories at plan time") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_part").toString
    graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val q = spark.read.parquet(out)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(sum($"value").as("sv"))
    val plan = q.queryExecution.executedPlan.toString

    // the predicate lives in PartitionFilters (directory pruning), not in
    // PushedFilters/post-scan data filters
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(plan.contains("= purchase)"), plan)
    assert(plan.contains("PushedFilters: []"), plan)

    // correctness unchanged vs the unpartitioned scan
    val expected = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(sum($"value").as("sv"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = q.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet &&
      got.forall { case (k, v) => math.abs(v - expected(k)) < 1e-9 })
  }
}
