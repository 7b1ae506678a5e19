package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** A minimal OFFSET-TRACKED, REPLAYABLE log broker — the Kafka-shaped
  * transport contract the socket source cannot provide (Spark's socket
  * source keeps no offsets; Engine.scala documents it as at-most-once).
  *
  * The broker owns an append-only record log: every PRODUCE is assigned a
  * monotone offset and appended to `dataFile` before being acknowledged, so
  * a broker restart reloads the identical log and any offset range can be
  * re-FETCHed forever (replay) — the property that lets a consumer resume
  * from a checkpointed offset with no loss and no duplication. This mirrors
  * the reference's resumable connector tasks (hstream-io/src/HStream/IO/
  * Worker.hs:71-83 persists per-task progress so a restarted task resumes
  * where it left off); Kafka is the production instance of the same
  * contract, and [[LedgerSourceProvider]] consumes any implementation of
  * this protocol.
  *
  * Wire protocol (newline-delimited text; payloads must not contain \n):
  *   PRODUCE <payload>   ->  OK <assigned-offset>
  *   END                 ->  OK <end-offset>           (next offset to be assigned)
  *   FETCH <from> <until> -> OK <n>\n<payload>*n        (offsets [from, until))
  * Connections are persistent; one command per line.
  */
final class LedgerBroker(dataFile: Path) {
  private val records = ArrayBuffer.empty[String]
  if (Files.exists(dataFile))
    records ++= Files.readAllLines(dataFile, StandardCharsets.UTF_8).asScala

  @volatile private var server: ServerSocket = _
  @volatile private var running = false

  /** Bind an ephemeral port, serve until [[stop]]; returns the port. */
  def start(): Int = {
    server = new ServerSocket(0)
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => handle(sock))
          t.setDaemon(true)
          t.start()
        } catch { case _: Throwable => /* server closed */ }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = { running = false; if (server != null) server.close() }

  /** Current end offset (= number of records ever produced). */
  def end: Long = records.synchronized(records.size.toLong)

  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(
      new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
    try {
      var line = in.readLine()
      while (line != null) {
        if (line.startsWith("PRODUCE ")) {
          val payload = line.substring("PRODUCE ".length)
          val off = records.synchronized {
            // durability BEFORE the ack, like a real log broker: the record
            // is on disk when the producer sees OK
            Files.writeString(dataFile, payload + "\n",
              StandardOpenOption.CREATE, StandardOpenOption.APPEND)
            records += payload
            records.size - 1
          }
          out.println(s"OK $off"); out.flush()
        } else if (line == "END") {
          out.println(s"OK $end"); out.flush()
        } else if (line.startsWith("FETCH ")) {
          val parts = line.split(" ")
          val from = parts(1).toLong; val until = parts(2).toLong
          val slice = records.synchronized {
            records.slice(from.toInt, math.min(until, records.size).toInt).toVector
          }
          out.println(s"OK ${slice.size}")
          slice.foreach(out.println)
          out.flush()
        } else {
          out.println("ERR unknown command"); out.flush()
        }
        line = in.readLine()
      }
    } catch { case _: Throwable => () } finally sock.close()
  }
}

/** Client helpers shared by the driver (offset polls) and executors
  * (range fetches) — one short-lived connection per call. */
object LedgerClient {
  private def withConn[A](host: String, port: Int)(
      f: (BufferedReader, PrintWriter) => A): A = {
    val sock = new Socket(host, port)
    try {
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = new PrintWriter(
        new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
      f(in, out)
    } finally sock.close()
  }

  private def expectOk(line: String): String = {
    require(line != null && line.startsWith("OK "), s"broker error: $line")
    line.substring(3)
  }

  def produce(host: String, port: Int, payload: String): Long =
    withConn(host, port) { (in, out) =>
      out.println(s"PRODUCE $payload"); out.flush()
      expectOk(in.readLine()).toLong
    }

  def endOffset(host: String, port: Int): Long =
    withConn(host, port) { (in, out) =>
      out.println("END"); out.flush()
      expectOk(in.readLine()).toLong
    }

  /** Records with offsets in [from, until), in offset order. */
  def fetch(host: String, port: Int, from: Long, until: Long): Vector[String] =
    withConn(host, port) { (in, out) =>
      out.println(s"FETCH $from $until"); out.flush()
      val n = expectOk(in.readLine()).toInt
      Vector.fill(n)(in.readLine())
    }
}
