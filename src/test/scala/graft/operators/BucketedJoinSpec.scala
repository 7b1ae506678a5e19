package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Co-located joins via bucketing — the 100 TB strategy for the repeated
  * big-big join (SURVEY build-plan note: "bucketing for co-located joins").
  * Both sides bucketed+sorted on the join key at write time → the join
  * compiles to a SortMergeJoin with ZERO shuffle exchanges: each task reads
  * bucket i of both tables. At cluster scale this turns the dominant
  * repeated-join cost from O(data shuffled per query) into O(data read).
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val sf = "/root/testdata/sf0.001"
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      val customer = spark.read.parquet(s"$sf/customer.parquet")

      orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bkt")

      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))

      // the join must be bucket-co-located: scans report Bucketed and no
      // exchange hash-partitions on the join keys (AQE wraps the plan, so
      // assert on its string form)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"join shuffled despite bucketing:\n$plan")

      // and the result matches the unbucketed join
      val expected = orders.join(customer, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
