package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The engine facade: streams, continuous queries, and materialized views —
  * the reference's server surface (SURVEY §3) re-expressed on Structured
  * Streaming.
  *
  * Reference semantics mirrored (citations into /root/reference):
  *   - A stream is a named append-only log of JSON records
  *     (hstream-sql/src/HStream/SQL/AST.hs:761-772). Here: a declared
  *     StructType + an event-time `_ts` column; records enter via
  *     [[insert]] (SQL `INSERT`, AST.hs:777-804) or any readStream source.
  *   - `_ts` is producer-assigned at append when the payload has no
  *     timestamp (Processor.hs:530 uses wall clock at sink).
  *   - SELECT … EMIT CHANGES = update-mode sink: every input row re-emits
  *     the updated aggregate (GroupedStream.hs:102) — micro-batching
  *     coalesces per batch, an accepted divergence (SURVEY §7.3).
  *   - CREATE VIEW … AS SELECT <agg> materializes aggregation state served
  *     by pull queries (hstream/src/HStream/Server/Core/View.hs:94-254). We
  *     materialize the *final* view output (complete mode into a driver
  *     table), which sidesteps the reference's HAVING/Project splice
  *     (View.hs:189-222) by construction.
  *   - TERMINATE / PAUSE / RESUME / DROP / SHOW (AST.hs:806-906) map onto
  *     StreamingQuery lifecycle + catalog ops.
  *
  * Scale: MemoryStream is the test transport; production streams plug in any
  * readStream source (Kafka/files) with the same declared schema — every
  * transform downstream of [[df]] is source-agnostic. View state lives in
  * Spark's state store (RocksDB on a cluster); only the *served snapshot* of
  * a pull query is driver-side, and [[pull]] applies the predicate before
  * collecting.
  */
class Engine(val spark: SparkSession) {
  import spark.implicits._

  private case class StreamEntry(schema: StructType, source: MemoryStream[String],
                                 options: Map[String, String])
  private val streams = TrieMap.empty[String, StreamEntry]
  private val queries = TrieMap.empty[String, StreamingQuery]
  private val paused  = TrieMap.empty[String, () => StreamingQuery]

  /** Default window grace: the reference's fixed 24 h (TimeWindows.hs:39). */
  val defaultGrace: String = "24 hours"

  // ---- DDL (SURVEY §2.1) ---------------------------------------------------

  /** CREATE STREAM name (schema) [WITH (…)]: registers an append-only JSON
    * stream. Options (AST.hs:703-750): DURATION = backlog retention — served
    * reads exclude records older than it (default: unbounded here; the
    * reference defaults to 7 days). REPLICATE is storage-layer metadata
    * (meaningless on Spark — durability comes from the source/checkpoint)
    * and is recorded but inert. */
  def createStream(name: String, schema: StructType,
                   options: Map[String, String] = Map.empty): Unit = {
    require(!streams.contains(name), s"stream $name exists")
    streams(name) = StreamEntry(schema, MemoryStream[String](spark), options)
  }

  /** Declared WITH-options of a stream (DESCRIBE-style metadata). */
  def streamOptions(name: String): Map[String, String] =
    streams.get(name).map(_.options).getOrElse(Map.empty)

  def dropStream(name: String): Unit = {
    streams.remove(name); fileStreams.remove(name)
  }
  def showStreams: Seq[String] = (streams.keys ++ fileStreams.keys).toSeq.sorted

  /** INSERT INTO name: append JSON payloads (AST.hs:777-804 json form). */
  def insert(name: String, jsonRecords: String*): Unit =
    streams(name).source.addData(jsonRecords)

  /** Register a file-backed stream (the production transport: new files in
    * `dir` are micro-batches; swap for Kafka by changing only this method's
    * body — everything downstream of [[df]] is source-agnostic). */
  def createFileStream(name: String, dir: String, schema: StructType,
                       format: String = "json"): Unit = {
    require(!streams.contains(name), s"stream $name exists")
    fileStreams(name) = () => {
      val parsed = spark.readStream.schema(schema).format(format).load(dir)
      if (schema.fieldNames.contains("_ts")) parsed
      else parsed.withColumn("_ts", current_timestamp())
    }
  }
  private val fileStreams = TrieMap.empty[String, () => DataFrame]

  /** The stream as an unbounded DataFrame: parsed payload columns + `_ts`.
    * If the schema declares no `_ts`, it is producer-assigned at append. */
  def df(name: String): DataFrame = fileStreams.get(name) match {
    case Some(mk) => mk()
    case None =>
      val e = streams(name)
      val parsed = e.source.toDF()
        .select(from_json($"value", e.schema).as("r"))
        .select($"r.*")
      val withTs =
        if (e.schema.fieldNames.contains("_ts")) parsed
        else parsed.withColumn("_ts", current_timestamp())
      // DURATION retention: serve only records within the backlog window
      e.options.get("DURATION") match {
        case Some(d) => withTs.filter(col("_ts") >= current_timestamp() - expr(s"INTERVAL $d"))
        case None => withTs
      }
  }

  // ---- continuous queries (SURVEY §3.1, §3.3) ------------------------------

  /** SELECT … EMIT CHANGES: update-mode push query into an in-memory sink
    * table named `name` (read results via `spark.table(name)`). */
  def emitChanges(name: String, plan: DataFrame): StreamingQuery =
    startQuery(name, plan, "update")

  /** CREATE STREAM out AS SELECT (CSAS): append-mode stream→stream query
    * writing into the sink stream's backing table. */
  def createStreamAs(name: String, plan: DataFrame): StreamingQuery =
    startQuery(name, plan, "append")

  /** CSAS with the reference's wire encoding on the way out: rows are
    * serialized to extended JSON (graft.sources.WireFormat) so the sink
    * table holds exactly what the reference would append to a sink topic. */
  def createStreamAsWire(name: String, plan: DataFrame): StreamingQuery =
    startQuery(name, graft.sources.WireFormat.encode(plan), "append")

  private def startQuery(name: String, plan: DataFrame, mode: String): StreamingQuery = {
    def start() = plan.writeStream
      .outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    val q = start()
    queries(name) = q
    paused(name) = start _
    q
  }

  /** INSERT INTO target SELECT … (InsertBySelectPlan, Codegen/V1.hs:151-160):
    * a continuous query appending each result row INTO the target stream,
    * so queries over the target observe them. Rows are re-encoded as JSON
    * through the target's insert path (driver-side per micro-batch — the
    * MemoryStream transport is driver-resident anyway; a file/Kafka-backed
    * stream would make this a distributed sink write instead). */
  def insertSelect(target: String, plan: DataFrame): StreamingQuery = {
    val q = plan.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.toJSON.collect()
        if (rows.nonEmpty) insert(target, rows.toIndexedSeq: _*)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    queries(s"insert_$target") = q
    q
  }

  /** TERMINATE QUERY (AST.hs:856-868). */
  def terminate(name: String): Unit = {
    queries.remove(name).foreach(_.stop()); paused.remove(name)
  }

  /** PAUSE: stop consumption, keep the restart closure (AST.hs:880-906).
    * MemoryStream retains data, so RESUME replays from the start — same
    * at-least-once contract as the reference's changelog restore. */
  def pause(name: String): Unit = queries.get(name).foreach(_.stop())
  def resume(name: String): StreamingQuery = {
    val q = paused(name)(); queries(name) = q; q
  }

  def showQueries: Seq[String] = queries.keys.toSeq.sorted

  /** EXPLAIN: the physical plan of a (streaming) DataFrame. */
  def explain(plan: DataFrame): String = plan.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)

  /** Block until every started query has processed all available input. */
  def processAll(): Unit = queries.values.foreach(_.processAllAvailable())

  // ---- materialized views (SURVEY §3.2) ------------------------------------

  /** CREATE VIEW name AS <aggregation plan>: completes-mode materialization
    * into an in-memory table; serves pull queries. */
  def createView(name: String, plan: DataFrame): StreamingQuery = {
    val q = plan.writeStream
      .outputMode("complete").format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    queries(name) = q
    q
  }

  /** Pull query over a view: batch SELECT with the immediate WHERE applied
    * before anything is collected (View.hs:166-254; predicate pushes into
    * the in-memory scan, bounding what the driver serves). */
  def pull(view: String, where: String = "true"): DataFrame =
    spark.table(view).where(where)

  /** Bounded pull: the reference dumps whole state stores to the client
    * (ksDump/ssDump, Processor.hs:380-411) — unbounded driver memory on a
    * big view. This serves at most `limit` rows as a local iterator, so
    * driver memory is O(limit) regardless of view size (SURVEY §7.3). */
  def pullBounded(view: String, where: String = "true",
                  limit: Int = 10000): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    pull(view, where).limit(limit).toLocalIterator().asScala
  }
}
