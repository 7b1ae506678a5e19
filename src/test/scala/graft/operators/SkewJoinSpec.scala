package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE skew-join splitting — the runtime escape hatch for hot-keyed equi-
  * joins (the paragraph-dedup first-occurrence join's boilerplate key, LSH
  * band keys): the fat partition is SPLIT into multiple tasks with the
  * matching build rows replicated. A window's within-partition sort has no
  * such escape hatch, which is why q_dedup_paragraph uses agg+join instead
  * of row_number.
  *
  * The precondition this spec PINS (found by testing, not assumed): AQE's
  * splitter pattern-matches BOTH join children as bare shuffle stages — a
  * build side with its final aggregate inlined above its shuffle (e.g.
  * `.distinct()` or `groupBy.agg` feeding the join directly) does NOT
  * match, and the skew silently stays. At 100 TB the firsts/dim relation
  * must be MATERIALIZED (written + re-read, as a real pipeline would
  * between stages) for the splitter to engage — that is the shape tested
  * here, with thresholds lowered so the small fixture takes the same code
  * path, and the assertion reads the final adaptive plan's skew=true
  * marker rather than trusting configuration.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot-key partition when the build side is materialized") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_build")
    try {
      // 90% of probe rows share one hot md5 key (the boilerplate-paragraph
      // shape: paragraph-hash join keys); incompressible payload so the
      // shuffle BYTES skew detection measures reflect the row skew
      val probe = spark.range(120000)
        .select(when($"id" % 10 =!= 0, md5(lit("boilerplate")))
          .otherwise(md5($"id".cast("string"))).as("k"),
          ($"id" % 1000).as("doc_id"),
          md5(($"id" + 7).cast("string")).as("payload"))
      // the firsts/dim relation, MATERIALIZED (write + re-read): inlining
      // its distinct/agg above the shuffle would defeat the splitter
      probe.select($"k").distinct().withColumn("first_payload", lit(1L))
        .write.mode("overwrite").parquet(dir.toString)
      val build = spark.read.parquet(dir.toString)
      val joined = probe.join(build, "k")
        .groupBy($"doc_id").agg(count(lit(1)).as("n"),
          count_distinct($"payload").as("s"))
      val n = joined.collect().map(_.getLong(1)).sum
      assert(n == 120000L, s"join lost rows: $n")
      // the finalized adaptive plan must have split the hot partition
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }
}
