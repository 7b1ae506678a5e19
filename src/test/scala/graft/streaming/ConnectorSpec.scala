package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket

import scala.collection.mutable

import graft.SparkSpec
import graft.sql.SqlEngine

/** CREATE SOURCE/SINK CONNECTOR *execution* for the built-in socket type:
  * the DDL starts a live TCP task through the engine's source/sink seams,
  * and the lifecycle verbs (PAUSE/RESUME/DROP, SHOW CONNECTORS) control a
  * real running transport — the in-engine analogue of the reference's
  * external connector worker processes
  * (hstream-io/src/HStream/IO/Worker.hs:71-83). Non-socket types remain
  * metadata-only (executed as external tasks in the reference: Docker
  * images, conf/hstream.yaml:129-143).
  */
class ConnectorSpec extends SparkSpec {

  /** Producer: accepts connections in a loop (the source task reconnects
    * on RESUME) and replays all payloads to each connection. */
  private def producer(payloads: Seq[String]): ServerSocket = {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        new Thread(() => {
          try {
            val out = new PrintWriter(sock.getOutputStream, true)
            payloads.foreach(out.println)
            out.flush()
            Thread.sleep(60000) // hold open while the query drains
          } catch { case _: Throwable => () }
        }).start()
      } catch { case _: Throwable => () } // server closed: done
    })
    t.setDaemon(true); t.start()
    server
  }

  /** Consumer: accepts connections in a loop (one per result partition per
    * batch — the sink task writes executor-side) and collects lines. */
  private def consumer(into: mutable.Buffer[String]): ServerSocket = {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        new Thread(() => {
          try {
            val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
            var line = in.readLine()
            while (line != null) {
              into.synchronized { into += line }
              line = in.readLine()
            }
          } catch { case _: Throwable => () }
        }).start()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    server
  }

  test("CREATE SOURCE CONNECTOR runs: socket → stream → query (Worker.hs:71-83)") {
    val payloads = Seq(
      """{"k":"a","v":1,"_ts":"2024-01-01 00:00:00"}""",
      """{"k":"b","v":5,"_ts":"2024-01-01 00:00:01"}""")
    val server = producer(payloads)
    val e = new SqlEngine(spark)
    try {
      e.sql("CREATE STREAM conn_tgt (k STRING, v INTEGER, _ts TIMESTAMP);")
      val r = e.sql(
        s"""CREATE SOURCE CONNECTOR sc1 FROM socket
            WITH ("stream" = 'conn_tgt', "port" = ${server.getLocalPort});""")
      assert(r.isInstanceOf[e.Started])
      e.sql("SHOW CONNECTORS;") match {
        case e.Done(info) => assert(info.contains("sc1(SOURCE->socket:RUNNING)"))
        case other => fail(s"unexpected $other")
      }
      // a plain engine query over the fed stream sees the socket's records
      val q = e.sql("SELECT k, v FROM conn_tgt EMIT CHANGES;").asInstanceOf[e.Started]
      val deadline = System.currentTimeMillis() + 20000
      def rows() = { e.engine.processAll(); spark.table(q.query.name).collect() }
      while (rows().length < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(rows().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 1L), ("b", 5L)))
      e.sql("PAUSE CONNECTOR sc1;")
      e.sql("SHOW CONNECTORS;") match {
        case e.Done(info) => assert(info.contains(":PAUSED"))
        case other => fail(s"unexpected $other")
      }
      e.sql("DROP CONNECTOR sc1;")
      e.sql("SHOW CONNECTORS;") match {
        case e.Done(info) => assert(!info.contains("sc1"))
        case other => fail(s"unexpected $other")
      }
      assert(!e.engine.showQueries.contains("connector_sc1"))
      e.sql(s"TERMINATE QUERY ${q.query.name};")
      e.sql("DROP STREAM conn_tgt;")
    } finally server.close()
  }

  test("CREATE SINK CONNECTOR runs: stream → wire encode → socket consumer") {
    val got = mutable.Buffer.empty[String]
    val server = consumer(got)
    val e = new SqlEngine(spark)
    try {
      e.sql("CREATE STREAM conn_src (k STRING, v INTEGER, _ts TIMESTAMP);")
      val r = e.sql(
        s"""CREATE SINK CONNECTOR sk1 TO socket
            WITH ("stream" = 'conn_src', "port" = ${server.getLocalPort});""")
      assert(r.isInstanceOf[e.Started])
      e.sql("INSERT INTO conn_src (k, v, _ts) VALUES ('x', 7, '2024-01-01 00:00:00');")
      e.sql("INSERT INTO conn_src (k, v, _ts) VALUES ('y', 9, '2024-01-01 00:00:01');")
      val deadline = System.currentTimeMillis() + 20000
      def n() = { e.engine.processAll(); got.synchronized(got.size) }
      while (n() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(200)
      val lines = got.synchronized(got.toList)
      assert(lines.size == 2, s"got $lines")
      // wire-encoded extended JSON — exactly what the reference's sink task
      // would push to the external system
      assert(lines.exists(l => l.contains(""""k":"x"""") &&
        l.contains(""""v":{"$numberLong":"7"}""")), s"got $lines")
      e.sql("DROP CONNECTOR sk1;")
      e.sql("DROP STREAM conn_src;")
    } finally server.close()
  }

  test("non-socket connector types stay metadata-only") {
    val e = new SqlEngine(spark)
    val r = e.sql("""CREATE SOURCE CONNECTOR mc1 FROM mysql WITH ("host" = 'h');""")
    assert(r.isInstanceOf[e.Done])
    e.sql("SHOW CONNECTORS;") match {
      case e.Done(info) => assert(info.contains("mc1(SOURCE->mysql:RUNNING)"))
      case other => fail(s"unexpected $other")
    }
    e.sql("DROP CONNECTOR mc1;")
  }
}
