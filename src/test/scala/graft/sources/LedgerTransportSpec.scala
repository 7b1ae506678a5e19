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

  test("dialect: CREATE STREAM WITH TRANSPORT='ledger' reads the broker") {
    val dataFile = Files.createTempDirectory("graft_ledger4").resolve("log")
    val broker = new LedgerBroker(dataFile)
    val port = broker.start()
    val e = new graft.sql.SqlEngine(spark)
    try {
      LedgerClient.produce("localhost", port, rec("a", 1, 0))
      LedgerClient.produce("localhost", port, rec("b", 5, 1))
      e.sql(s"""CREATE STREAM lds (k STRING, v INTEGER, _ts TIMESTAMP)
                WITH (TRANSPORT = 'ledger', PORT = $port);""")
      val q = e.sql("SELECT k, v FROM lds EMIT CHANGES;").asInstanceOf[e.Started]
      val deadline = System.currentTimeMillis() + 20000
      def rows() = { e.engine.processAll(); spark.table(q.query.name).collect() }
      while (rows().length < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(rows().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 1L), ("b", 5L)))
      // dialect INSERT INTO a ledger stream PRODUCES to the broker (the
      // uniform append-to-log contract, AST.hs:777-804): durable in the
      // log, then visible to the running query
      e.sql("INSERT INTO lds (k, v, _ts) VALUES ('c', 9, '2024-01-01 00:00:02');")
      assert(LedgerClient.endOffset("localhost", port) == 3L,
        "INSERT did not produce to the broker")
      while (rows().length < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(rows().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 1L), ("b", 5L), ("c", 9L)))
      e.sql(s"TERMINATE QUERY ${q.query.name};")
      e.sql("DROP STREAM lds;")
    } finally broker.stop()
  }

  test("dialect: ledger SOURCE and SINK connectors execute in-engine") {
    val srcBroker = new LedgerBroker(
      Files.createTempDirectory("graft_ledger5").resolve("log"))
    val sinkBroker = new LedgerBroker(
      Files.createTempDirectory("graft_ledger6").resolve("log"))
    val (p1, p2) = (srcBroker.start(), sinkBroker.start())
    val e = new graft.sql.SqlEngine(spark)
    try {
      LedgerClient.produce("localhost", p1, rec("a", 1, 0))
      LedgerClient.produce("localhost", p1, rec("b", 5, 1))
      e.sql("CREATE STREAM ltgt2 (k STRING, v INTEGER, _ts TIMESTAMP);")
      val r = e.sql(
        s"""CREATE SOURCE CONNECTOR lc1 FROM ledger
            WITH ("stream" = 'ltgt2', "port" = $p1);""")
      assert(r.isInstanceOf[e.Started])
      val rk = e.sql(
        s"""CREATE SINK CONNECTOR lk1 TO ledger
            WITH ("stream" = 'ltgt2', "port" = $p2);""")
      assert(rk.isInstanceOf[e.Started])
      // broker → source connector → stream → sink connector → broker:
      // the sink broker's log ends up holding the wire-encoded records
      val deadline = System.currentTimeMillis() + 20000
      def sunk() = { e.engine.processAll(); LedgerClient.endOffset("localhost", p2) }
      while (sunk() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val lines = LedgerClient.fetch("localhost", p2, 0,
        LedgerClient.endOffset("localhost", p2))
      assert(lines.size == 2, s"got $lines")
      assert(lines.exists(l => l.contains(""""k":"a"""") &&
        l.contains(""""v":{"$numberLong":"1"}""")), s"got $lines")
      e.sql("DROP CONNECTOR lc1;")
      e.sql("DROP CONNECTOR lk1;")
      e.sql("DROP STREAM ltgt2;")
    } finally { srcBroker.stop(); sinkBroker.stop() }
  }

  test("FORMAT='wire' composes with TRANSPORT='ledger': INSERT wire-encodes, read decodes") {
    val dataFile = Files.createTempDirectory("graft_ledger8").resolve("log")
    val broker = new LedgerBroker(dataFile)
    val port = broker.start()
    val e = new graft.sql.SqlEngine(spark)
    try {
      e.sql(s"""CREATE STREAM lwr (k STRING, v INTEGER, _ts TIMESTAMP)
                WITH (TRANSPORT = 'ledger', PORT = $port, FORMAT = 'wire');""")
      e.sql("INSERT INTO lwr (k, v, _ts) VALUES ('w', 7, '2024-01-01 00:00:00');")
      // the broker log holds the EXTENDED-JSON wire payload…
      val raw = LedgerClient.fetch("localhost", port, 0, 1).head
      assert(raw.contains(""""v":{"$numberLong":"7"}"""), raw)
      // …and the stream decodes it back to the declared types
      val q = e.sql("SELECT k, v FROM lwr EMIT CHANGES;").asInstanceOf[e.Started]
      val deadline = System.currentTimeMillis() + 20000
      def rows() = { e.engine.processAll(); spark.table(q.query.name).collect() }
      while (rows().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(rows().map(r => (r.getString(0), r.getLong(1))).toSet == Set(("w", 7L)))
      e.sql(s"TERMINATE QUERY ${q.query.name};")
      e.sql("DROP STREAM lwr;")
    } finally broker.stop()
  }

  test("ledger SOURCE connector: PAUSE/RESUME preserves exactly-once into a file-backed stream") {
    val dataFile = Files.createTempDirectory("graft_ledger7").resolve("log")
    val tgtDir = Files.createTempDirectory("graft_lprt").toString
    val broker = new LedgerBroker(dataFile)
    val port = broker.start()
    val e = new Engine(spark)
    try {
      LedgerClient.produce("localhost", port, rec("a", 1, 0))
      LedgerClient.produce("localhost", port, rec("b", 2, 1))
      e.createFileStream("lprt", tgtDir, schema)
      e.startSourceConnector("lpc", "lprt", "localhost", port, "ledger")
      e.processAll()
      def got() = spark.read.schema(schema).json(tgtDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got() == Seq(("a", 1L), ("b", 2L)))

      // PAUSE stops consumption; records produced meanwhile wait in the
      // broker; RESUME restarts from the CHECKPOINTED offset — the already-
      // consumed records must not duplicate even though the broker would
      // happily replay them (the lifecycle contract of the reference's
      // resumable connector tasks, Worker.hs:71-83)
      e.pause("connector_lpc")
      LedgerClient.produce("localhost", port, rec("c", 3, 2))
      e.resume("connector_lpc")
      e.processAll()
      assert(got() == Seq(("a", 1L), ("b", 2L), ("c", 3L)), got().mkString(","))
      e.dropConnector("lpc")
    } finally broker.stop()
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
