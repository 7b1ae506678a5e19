package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the CDC-apply second-decade probe (r9's
  * cdc_apply_150k_1m5_15m ratio100 = 14.09 vs r8's 7.56 on the same
  * shape): separates DATA-SHAPE growth (envelopes, distinct keys — both
  * exactly ×N by construction, every copy distinct-keyed) from PLAN
  * constants (shuffle bytes per row, spill onset, GC pressure) and from
  * MACHINE speed (a fixed CPU-bound calib anchor timed alongside).
  *
  * Per decade (1×, 10×, 100× of sf0.1 orders → ~230k/2.3M/23M envelopes)
  * it reports, instrumented via task metrics deltas:
  *   - decode_secs: JSON envelope encode → from_json decode → row hash,
  *     NO shuffle — the linear half of the pipeline in isolation;
  *   - apply_secs: the full applyLatest (decode + ONE partial-agg max_by
  *     shuffle over distinct keys) — the probed shape;
  *   - shuffle_w/r bytes, mem/disk spill, gc_ms, run_ms for the apply
  *     stage — a superlinear constant shows here (bytes/row should be
  *     FLAT across decades; spill should be 0 until memory truly runs
  *     out; gc_ms/run_ms rising with scale = heap pressure, not plan).
  *
  * Reference counterpart: latest-per-key table materialization
  * (hstream-processing Stream.hs:89-135).
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.CdcDiag"`
  */
object CdcDiag {
  private class Acc extends SparkListener {
    val shufW = new AtomicLong; val shufR = new AtomicLong
    val spillMem = new AtomicLong; val spillDisk = new AtomicLong
    val gcMs = new AtomicLong; val runMs = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
        gcMs.addAndGet(m.jvmGCTime)
        runMs.addAndGet(m.executorRunTime)
      }
    }
    def snap: Seq[Long] = Seq(shufW.get, shufR.get, spillMem.get,
      spillDisk.get, gcMs.get, runMs.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    val orders = Tables.load(spark, sfDir, "orders")
    def xN(df: DataFrame, n: Int): DataFrame = (0 until n).map(i =>
      df.withColumn("o_orderkey", $"o_orderkey" + lit(i * 1000000000L)))
      .reduce(_ unionAll _)

    // fixed CPU-bound anchor: machine-speed normalizer across runs/rounds
    def calib(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: ANSI mode overflows a long sum of hashes
      spark.range(200000000L).select(expr("bit_xor(xxhash64(id))")).first()
      (System.nanoTime() - t0) / 1e9
    }

    def measure(tag: String, o: DataFrame, sized: Boolean = true): Unit = {
      val decoded = graft.queries.CdcQueries.decodedFrom(o)
      // decode-only: force the JSON round-trip on the fat fields, no agg
      val t0 = System.nanoTime()
      decoded.select(xxhash64($"op", $"ts_ms", $"after.o_totalprice")
        .as("h")).agg(expr("bit_xor(h)")).first()
      val tDecode = (System.nanoTime() - t0) / 1e9
      val before = acc.snap
      val t1 = System.nanoTime()
      val outRows = graft.operators.Cdc
        .applyLatest(decoded, Seq("o_orderkey"),
          sizeShuffleForState = sized).count()
      val tApply = (System.nanoTime() - t1) / 1e9
      val d = acc.snap.zip(before).map { case (a, b) => a - b }
      val nEnv = decoded.count()
      println(f"""[cdcdiag] {"decade":"$tag","envelopes":$nEnv,""" +
        f""""out_rows":$outRows,"decode_secs":$tDecode%.2f,""" +
        f""""apply_secs":$tApply%.2f,"shuf_w_mb":${d(0) / 1e6}%.1f,""" +
        f""""shuf_r_mb":${d(1) / 1e6}%.1f,"spill_mem_mb":${d(2) / 1e6}%.1f,""" +
        f""""spill_disk_mb":${d(3) / 1e6}%.1f,"gc_ms":${d(4)},""" +
        f""""run_ms":${d(5)}}""")
    }

    println(f"""[cdcdiag] {"calib_pre":${calib()}%.3f}""")
    // Default rows now include applyLatest's own AQE state-sizing (r11:
    // the r10 diagnostic's tuned knobs are the OPERATOR's behavior for
    // inputs estimated >512 MB — x100 crosses the threshold, x1/x10
    // run at session defaults as before).
    measure("x1_150k", orders)
    measure("x10_1m5", xN(orders, 10))
    measure("x100_15m", xN(orders, 100))
    // CONTROL: the r9/r10 failure shape — auto-sizing off, stock 64 MB
    // advisory. The hash-agg state (~3 GB of 15M max_by buffers)
    // concentrates into 32 post-shuffle partitions because AQE coalesces
    // by shuffle bytes, which undercount agg state ~5x — this row should
    // show the spill the default row no longer pays.
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    measure("x100_15m_unsized_control", xN(orders, 100), sized = false)
    println(f"""[cdcdiag] {"calib_post":${calib()}%.3f}""")
    spark.stop()
  }
}
