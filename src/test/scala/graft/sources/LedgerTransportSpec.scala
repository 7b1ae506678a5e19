package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.streaming.Engine

/** The offset-tracked transport contract, end-to-end (VERDICT r4 ask #1):
  * a replayable NETWORK source (ledger broker) feeding a CSAS through the
  * shared Engine.df() seam must survive an ENGINE restart with no loss and
  * no duplication — the class of guarantee RecoverySpec proves for the
  * file transport, now on a broker transport with consumer offsets in the
  * Spark checkpoint and replay served by the broker. */
class LedgerTransportSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType),
    StructField("_ts", TimestampType)))
  private val tgtSchema = StructType(Seq(
    StructField("k", StringType), StructField("x", LongType)))

  private def rec(k: String, v: Long, s: Int): String =
    s"""{"k":"$k","v":$v,"_ts":"2024-01-01 00:00:0$s"}"""

  test("ledger CSAS resumes exactly-once across an engine restart (offsets from checkpoint, replay from broker)") {
    val dataFile = Files.createTempDirectory("graft_ledger").resolve("log")
    val tgtDir = Files.createTempDirectory("graft_ltgt").toString
    val ckptRoot = Files.createTempDirectory("graft_lckpt").toString
    val broker = new LedgerBroker(dataFile)
    val port = broker.start()
    spark.conf.set("spark.graft.checkpointRoot", ckptRoot)
    try {
      def mkEngine(): Engine = {
        val e = new Engine(spark)
        e.createLedgerStream("lsrc", "localhost", port, schema)
        e.createFileStream("ltgt", tgtDir, tgtSchema)
        e
      }
      LedgerClient.produce("localhost", port, rec("a", 1, 0))
      LedgerClient.produce("localhost", port, rec("b", 2, 1))

      val e1 = mkEngine()
      e1.createStreamAs("ltgt",
        e1.df("lsrc").select(col("k"), (col("v") * 2).as("x")))
      e1.processAll()
      e1.terminate("ltgt") // crash: engine gone, checkpoint + broker stay

      // records produced while the consumer is down must arrive after
      // resume; the two already-consumed offsets must NOT be reprocessed
      // even though the broker would happily replay them
      LedgerClient.produce("localhost", port, rec("c", 3, 2))

      val e2 = mkEngine()
      e2.createStreamAs("ltgt",
        e2.df("lsrc").select(col("k"), (col("v") * 2).as("x")))
      e2.processAll()
      e2.terminate("ltgt")

      val got = spark.read.schema(tgtSchema).json(tgtDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == Seq(("a", 2L), ("b", 4L), ("c", 6L)), got.mkString(","))
    } finally {
      spark.conf.unset("spark.graft.checkpointRoot")
      broker.stop()
    }
  }

  test("broker restart replays the identical log from its file (offset stability)") {
    val dataFile = Files.createTempDirectory("graft_ledger2").resolve("log")
    val b1 = new LedgerBroker(dataFile)
    val p1 = b1.start()
    (0 until 5).foreach(i =>
      assert(LedgerClient.produce("localhost", p1, s"r$i") == i.toLong))
    val before = LedgerClient.fetch("localhost", p1, 0, 5)
    b1.stop()

    val b2 = new LedgerBroker(dataFile) // fresh broker, same log file
    val p2 = b2.start()
    try {
      assert(LedgerClient.endOffset("localhost", p2) == 5L)
      // same offsets -> same records: the determinism Structured Streaming
      // requires of a replayable source
      assert(LedgerClient.fetch("localhost", p2, 0, 5) == before)
      assert(LedgerClient.fetch("localhost", p2, 2, 4) == before.slice(2, 4))
    } finally b2.stop()
  }

  test("batch ranges split into executor-parallel fetch partitions") {
    val dataFile = Files.createTempDirectory("graft_ledger3").resolve("log")
    val broker = new LedgerBroker(dataFile)
    val port = broker.start()
    try {
      (0 until 10).foreach(i => LedgerClient.produce("localhost", port, s"x$i"))
      val stream = new LedgerMicroBatchStream("localhost", port, 4)
      val parts = stream.planInputPartitions(LedgerOffset(0), LedgerOffset(10))
      assert(parts.length == 4)
      val ranges = parts.map(_.asInstanceOf[LedgerInputPartition])
      // contiguous cover of [0, 10), no overlap
      assert(ranges.map(r => r.until - r.from).sum == 10)
      assert(ranges.sliding(2).forall {
        case Array(a, b) => a.until == b.from
        case _ => true
      })
      // an empty range plans no partitions (no busy work per trigger)
      assert(stream.planInputPartitions(LedgerOffset(10), LedgerOffset(10)).isEmpty)
    } finally broker.stop()
  }
}
