package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.{LedgerBroker, LedgerClient}
import graft.streaming.Engine

/** CDC changelog processing: envelope decode, latest-state materialization
  * (out-of-order, delete, re-insert, malformed), and the in-engine cdc
  * connector — ledger transport in, materialized table out, resumable. */
class CdcSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def env(op: String, id: Long, v: String, ts: Long): String = {
    val payload = s"""{"id":$id,"v":"$v"}"""
    val (before, after) =
      if (op == "d") (payload, "null") else ("null", payload)
    s"""{"op":"$op","before":$before,"after":$after,"ts_ms":$ts,"seq":$ts}"""
  }

  private def state(envelopes: Seq[String]): Seq[(Long, String)] = {
    import spark.implicits._
    val df = spark.createDataset(envelopes).toDF("value")
    Cdc.applyLatest(Cdc.decode(df, rowSchema), Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
  }

  test("applyLatest: last write wins regardless of arrival order") {
    // arrival order scrambled; (ts_ms, seq) order decides
    val got = state(Seq(
      env("u", 1, "B", 20), env("c", 1, "A", 10), env("u", 1, "C", 30),
      env("c", 2, "X", 5)))
    assert(got == Seq((1L, "C"), (2L, "X")))
  }

  test("applyLatest: delete removes the key; key comes from `before`") {
    val got = state(Seq(
      env("c", 1, "A", 10), env("d", 1, "A", 20), env("c", 2, "X", 5)))
    assert(got == Seq((2L, "X")))
  }

  test("applyLatest: re-insert after delete resurrects the key") {
    val got = state(Seq(
      env("c", 1, "A", 10), env("d", 1, "A", 20), env("c", 1, "A2", 30)))
    assert(got == Seq((1L, "A2")))
  }

  test("decode drops malformed envelopes (Debezium skipped-event semantics)") {
    import spark.implicits._
    val df = spark.createDataset(Seq(
      env("c", 1, "A", 10), "not json at all", """{"x": 1}""")).toDF("value")
    val decoded = Cdc.decode(df, rowSchema)
    assert(decoded.count() == 1)
  }

  test("seq breaks ts_ms ties (same-millisecond changes stay ordered)") {
    import spark.implicits._
    val rows = Seq(
      """{"op":"c","after":{"id":1,"v":"A"},"ts_ms":10,"seq":1}""",
      """{"op":"u","after":{"id":1,"v":"B"},"ts_ms":10,"seq":2}""")
    val df = spark.createDataset(rows).toDF("value")
    val got = Cdc.applyLatest(Cdc.decode(df, rowSchema), Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "B")))
  }

  test("cdc connector: envelopes over ledger maintain a materialized table, " +
    "resumable across engine restart (offsets from checkpoint)") {
    val dataFile = Files.createTempDirectory("graft_cdcledger").resolve("log")
    val ckptRoot = Files.createTempDirectory("graft_cdcckpt").toString
    val broker = new LedgerBroker(dataFile)
    val port = broker.start()
    spark.conf.set("spark.graft.checkpointRoot", ckptRoot)
    try {
      // one durable changelog dir shared by both engine incarnations (the
      // temp dir is minted by the first startCdcConnector; reuse via the
      // same Engine would hide the restart, so pin it with a fixed table
      // registration on each engine instance)
      LedgerClient.produce("localhost", port, env("c", 1, "A", 10))
      LedgerClient.produce("localhost", port, env("c", 2, "B", 11))

      val e1 = new Engine(spark)
      e1.startCdcConnector("t1", "tbl", "localhost", port, rowSchema, Seq("id"))
      e1.processAll()
      val s1 = e1.cdcTable("tbl").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(s1 == Seq((1L, "A"), (2L, "B")))

      // updates + a delete arrive; same engine processes incrementally
      LedgerClient.produce("localhost", port, env("u", 1, "A2", 20))
      LedgerClient.produce("localhost", port, env("d", 2, "B", 21))
      e1.processAll()
      val s2 = e1.cdcTable("tbl").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(s2 == Seq((1L, "A2")))
      e1.terminate("connector_t1") // crash; checkpoint + broker survive
      val logDir = e1.cdcLogDir("tbl")

      // produced while down
      LedgerClient.produce("localhost", port, env("c", 3, "C", 30))

      val e2 = new Engine(spark)
      e2.adoptCdcTable("tbl", logDir, rowSchema, Seq("id"))
      e2.startCdcConnector("t1", "tbl", "localhost", port, rowSchema, Seq("id"))
      e2.processAll()
      val s3 = e2.cdcTable("tbl").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      // no duplicate application of offsets 0-3, no loss of offset 4
      assert(s3 == Seq((1L, "A2"), (3L, "C")))
      e2.terminate("connector_t1")
    } finally {
      spark.conf.unset("spark.graft.checkpointRoot")
      broker.stop()
    }
  }

  test("dialect: CREATE SOURCE CONNECTOR ... FROM cdc materializes and serves pulls") {
    val dataFile = Files.createTempDirectory("graft_cdcsql").resolve("log")
    val broker = new LedgerBroker(dataFile)
    val port = broker.start()
    val e = new graft.sql.SqlEngine(spark)
    try {
      LedgerClient.produce("localhost", port, env("c", 1, "A", 10))
      LedgerClient.produce("localhost", port, env("u", 1, "B", 20))
      LedgerClient.produce("localhost", port, env("c", 2, "X", 15))
      LedgerClient.produce("localhost", port, env("d", 2, "X", 25))
      e.sql("CREATE STREAM items (id INTEGER, v STRING);")
      e.sql(s"""CREATE SOURCE CONNECTOR ic FROM cdc
                WITH (STREAM = 'items', PORT = $port, KEYS = 'id');""")
      e.engine.processAll()
      val rows = e.sql("SELECT id, v FROM items;") match {
        case e.Rows(df) => df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        case other => fail(s"expected rows, got $other")
      }
      assert(rows == Seq((1L, "B")))
      e.sql("DROP CONNECTOR ic;")
    } finally broker.stop()
  }
}
