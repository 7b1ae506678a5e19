package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Fault tolerance parity (SURVEY §2.10): the reference persists a changelog
  * per state mutation + RocksDB snapshots every 10 s and restores state on
  * restart (Processor/ChangeLog.hs, Handler/Common.hs:437-460). In Spark the
  * checkpoint location subsumes both: source offsets + state store survive a
  * query restart. This spec kills a streaming aggregation mid-stream,
  * restarts it from the checkpoint, and asserts state carried over without
  * reprocessing (exactly-once over the file source).
  */
class RecoverySpec extends SparkSpec {

  test("file-backed CSAS resumes exactly-once across an ENGINE restart (spark.graft.checkpointRoot)") {
    val srcDir = Files.createTempDirectory("graft_rsrc").toString
    val tgtDir = Files.createTempDirectory("graft_rtgt").toString
    val ckptRoot = Files.createTempDirectory("graft_rckpt").toString
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType),
      StructField("_ts", TimestampType)))
    val tgtSchema = StructType(Seq(
      StructField("k", StringType), StructField("x", LongType)))
    def writeFile(name: String, lines: String): Unit =
      Files.writeString(java.nio.file.Paths.get(srcDir, name), lines)

    spark.conf.set("spark.graft.checkpointRoot", ckptRoot)
    try {
      def mkEngine(): Engine = {
        val e = new Engine(spark)
        e.createFileStream("rsrc", srcDir, schema)
        e.createFileStream("rtgt", tgtDir, tgtSchema)
        e
      }
      val e1 = mkEngine()
      writeFile("f1.json", """{"k":"a","v":1,"_ts":"2024-01-01 00:00:00"}""")
      e1.createStreamAs("rtgt",
        e1.df("rsrc").select(col("k"), (col("v") * 2).as("x")))
      e1.processAll()
      e1.terminate("rtgt") // "crash": the engine goes away, checkpoint stays

      writeFile("f2.json", """{"k":"b","v":5,"_ts":"2024-01-01 00:00:01"}""")
      val e2 = mkEngine() // fresh engine, same checkpoint root
      e2.createStreamAs("rtgt",
        e2.df("rsrc").select(col("k"), (col("v") * 2).as("x")))
      e2.processAll()
      e2.terminate("rtgt")

      // exactly-once: f1's row was NOT reprocessed after the restart, f2's
      // row arrived — two rows total, each exactly once
      val got = spark.read.schema(tgtSchema).json(tgtDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(got.toSeq == Seq(("a", 2L), ("b", 10L)), got.mkString(","))
    } finally spark.conf.unset("spark.graft.checkpointRoot")
  }

  test("aggregation state survives query restart via checkpoint") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_src").toFile
    val ckpt = Files.createTempDirectory("graft_ckpt").toFile
    val outDir = Files.createTempDirectory("graft_out").toFile

    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))

    def writeBatch(name: String, rows: Seq[(String, Long)]): Unit =
      rows.toDF("k", "v").coalesce(1).write.mode("append").json(src + s"/$name")

    // results land in per-batch parquet via foreachBatch (update mode) —
    // the same upsert-into-a-store shape a production view sink uses
    def start() = spark.readStream.schema(schema).json(src + "/*")
      .groupBy($"k").agg(sum($"v").as("s"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(outDir + s"/b$id")
      }
      .start()

    writeBatch("f1", Seq(("a", 1L), ("a", 2L), ("b", 10L)))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    writeBatch("f2", Seq(("a", 4L), ("c", 7L)))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // the last batch's updates must reflect pre-restart state: a = 1+2+4
    val batches = outDir.listFiles().map(_.getName).sorted
    val last = spark.read.parquet(outDir + "/" + batches.last)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last("a") == 7L, s"state lost across restart: $last")
    assert(last("c") == 7L)
    // and batch1's rows were NOT reprocessed into the post-restart batch
    assert(!last.contains("b"))
  }
}
