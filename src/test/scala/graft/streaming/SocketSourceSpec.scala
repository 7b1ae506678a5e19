package graft.streaming

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** External-transport e2e: a real TCP socket producer → [[Engine.df]]'s
  * source seam → wire decode → streaming query → sink. The reference runs
  * external source connector tasks feeding streams over the network
  * (hstream-io/src/HStream/IO/Worker.hs:71-83); this spec is that shape
  * with the producer embedded in the test — proving the "swap the
  * transport by changing only the source expression" claim on a live
  * non-file socket, with the wire decode path (Rts/Old.hs:159-198)
  * exercised end-to-end over the network.
  */
class SocketSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType),
    StructField("_ts", TimestampType)))

  /** Minimal embedded producer: accepts one connection, writes each payload
    * as one line, keeps the connection open until closed. */
  private def serve(payloads: Seq[String]): (ServerSocket, Thread) = {
    val server = new ServerSocket(0) // ephemeral port
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new PrintWriter(sock.getOutputStream, true)
        payloads.foreach(out.println)
        out.flush()
        // hold the connection open while the query drains
        Thread.sleep(30000)
        sock.close()
      } catch { case _: Throwable => } // closed by the test: fine
    })
    t.setDaemon(true)
    t.start()
    (server, t)
  }

  test("socket producer → wire decode → query → sink (Worker.hs:71-83 shape)") {
    // extended-JSON wire payloads, exactly what the reference's source task
    // would append (ints as $numberLong, timestamps as $timestamp)
    val payloads = Seq(
      """{"k":"a","v":{"$numberLong":"1"},"_ts":{"$timestamp":"2024-01-01T00:00:00.000000Z"}}""",
      """{"k":"b","v":{"$numberLong":"5"},"_ts":{"$timestamp":"2024-01-01T00:00:01.000000Z"}}""",
      """{"k":"c","v":{"$numberLong":"9"},"_ts":{"$timestamp":"2024-01-01T00:00:02.000000Z"}}""")
    val (server, _) = serve(payloads)
    val e = new Engine(spark)
    try {
      e.createSocketStream("sock1", "localhost", server.getLocalPort, schema, wire = true)
      assert(e.showStreams.contains("sock1") && e.isWireStream("sock1"))
      // the SAME query shape every other transport runs: filter + project
      val q = e.emitChanges("sockout",
        e.df("sock1").filter(col("v") > 1)
          .select(col("k"), (col("v") * 2).as("x"), col("_ts")))
      // socket delivery is asynchronous: poll until both surviving rows land
      val deadline = System.currentTimeMillis() + 20000
      def rows() = {
        q.processAllAvailable()
        spark.table("sockout").collect()
      }
      while (rows().length < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val got = rows().map(r => (r.getString(0), r.getLong(1),
        r.getTimestamp(2).toString)).toSet
      assert(got == Set(
        ("b", 10L, "2024-01-01 00:00:01.0"),
        ("c", 18L, "2024-01-01 00:00:02.0")), s"got $got")
      e.terminate("sockout")
    } finally {
      e.dropStream("sock1")
      server.close()
    }
  }
}
