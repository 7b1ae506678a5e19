package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{Engine, StreamOps}

/** Streaming throughput bench: replay the `events` table through live
  * Structured Streaming topologies — the same shape as the reference's own
  * harnesses (hstream-diffflow/bench/throughout-map.hs /-join /-reduce:
  * push bursts through a running graph, count processed rows per tick).
  *
  * Reads events as parquet, feeds them through a file-backed streaming scan
  * (maxFilesPerTrigger batches), and measures wall time to drain:
  *   - s_stream_filter  : stateless filter+project push query (map shape)
  *   - s_stream_agg     : unwindowed groupBy in update mode (reduce shape)
  *   - s_stream_window  : 1-day tumbling window agg with watermark
  */
object StreamBench {

  def run(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    import spark.implicits._
    // the file streaming source wants a directory: stage the events parquet
    // into a temp dir once (streamed with one file per micro-batch)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    def stream: DataFrame = {
      // Same two-generation ts normalization as Tables.load (nanos-as-long
      // vs native timestamp[us]); keep both paths in sync.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      Tables.normalizeEventsTs(
        spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(dir.toString))
    }

    def drain(name: String, plan: DataFrame, mode: String): (String, Double) = {
      val t0 = System.nanoTime()
      val q = plan.writeStream.outputMode(mode).format("noop").start()
      q.processAllAvailable()
      q.stop()
      name -> (System.nanoTime() - t0) / 1e9
    }

    // interval-join replay (the reference's throughout-join.hs shape):
    // odd/even event-id halves of the same stream joined WITHIN ±2 min
    def joinPlan = {
      val l = stream.filter($"event_id" % 2 === 0)
        .select($"user_id".as("lu"), $"ts".as("lts"), $"event_id".as("lid"))
      val r = stream.filter($"event_id" % 2 === 1)
        .select($"user_id".as("ru"), $"ts".as("rts"), $"event_id".as("rid"))
      // Grace = the WITHIN window itself (the reference's jwGraceMs = 0,
      // Codegen/V1.hs:287-291) — NOT the 24 h default, which would buffer
      // the whole replay corpus as join state for a ±2 min window.
      StreamOps.intervalJoin(l, r, "lts", "rts", "2 minutes", "2 minutes",
        col("lu") === col("ru"), grace = "2 minutes")
        .select($"lid", $"rid")
    }

    try Seq(
      drain("s_stream_filter",
        stream.filter($"event_type" === "purchase" && $"value" > 100.0)
          .select($"event_id", $"user_id", ($"value" * 2).as("v2")),
        "append"),
      drain("s_stream_agg",
        stream.groupBy($"user_id")
          .agg(count(lit(1)).as("cnt"), sum($"value").as("sv")),
        "update"),
      drain("s_stream_window",
        StreamOps.tumble(stream, "ts", "1 day")
          .agg(count(lit(1)).as("cnt"), sum($"value").as("sv")),
        "update"),
      drain("s_stream_join", joinPlan, "append"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] streaming: ${e.getMessage}"); Seq.empty
    }
  }
}
