package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  *     materialize the *final* view output into a parquet-backed snapshot
  *     (distributed foreachBatch write, never driver memory), which
  *     sidesteps the reference's HAVING/Project splice (View.hs:189-222) by
  *     construction.
  *   - TERMINATE / PAUSE / RESUME / DROP / SHOW (AST.hs:806-906) map onto
  *     StreamingQuery lifecycle + catalog ops.
  *
  * Scale: MemoryStream is the test transport; production streams plug in any
  * readStream source (Kafka/files) with the same declared schema — every
  * transform downstream of [[df]] is source-agnostic. View state lives in
  * Spark's state store (RocksDB on a cluster) and served snapshots live in
  * parquet; [[pull]] is a batch scan with predicate/projection pushdown, so
  * nothing view-sized ever sits on the driver.
  */
class Engine(val spark: SparkSession) {
  import spark.implicits._

  private case class StreamEntry(schema: StructType, source: MemoryStream[String],
                                 options: Map[String, String], wire: Boolean = false)
  /** File-backed stream registration: `dir`+`format` are kept so sinks
    * (insertSelect / CSAS into the stream) can write DISTRIBUTED into the
    * same directory the source tails — no driver hop. */
  private case class FileStreamEntry(dir: String, schema: StructType,
                                     format: String, wire: Boolean = false)
  private val streams = TrieMap.empty[String, StreamEntry]
  private val fileStreams = TrieMap.empty[String, FileStreamEntry]
  private val queries = TrieMap.empty[String, StreamingQuery]
  private val paused  = TrieMap.empty[String, () => StreamingQuery]

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Root for streaming checkpoints (file sinks + views). Set
    * `spark.graft.checkpointRoot` to a durable path for recovery across
    * engine restarts (RecoverySpec shape: offsets + state survive, nothing
    * reprocessed); defaults to a fresh temp dir per engine instance, so
    * within one engine a terminated-and-recreated query resumes from its
    * own checkpoint. Memory-sink queries are deliberately NOT checkpointed:
    * pause/resume replays the MemoryStream from the start into the fresh
    * sink table, and a checkpoint would skip those offsets. */
  private val checkpointRoot: String =
    spark.conf.getOption("spark.graft.checkpointRoot")
      .getOrElse(tempDir("graft_ckpt"))
  private def ckpt(tag: String): String = s"$checkpointRoot/$tag"

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
    require(!streams.contains(name) && !fileStreams.contains(name),
      s"stream $name exists")
    // FORMAT='wire': payloads are the reference's extended JSON and are
    // decoded on read (jsonValueToFlowValue, Rts/Old.hs:159-198)
    val wire = options.get("FORMAT").exists(_.equalsIgnoreCase("wire"))
    streams(name) = StreamEntry(schema, MemoryStream[String](spark), options, wire)
  }

  /** Whether `name` is a wire-format stream (payloads are extended JSON).
    * Callers appending records (INSERT paths) must encode accordingly. */
  def isWireStream(name: String): Boolean =
    streams.get(name).exists(_.wire) || fileStreams.get(name).exists(_.wire)

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
    * body — everything downstream of [[df]] is source-agnostic).
    * `wire = true` reads text files of extended-JSON payloads and decodes
    * them to the declared schema — the source half of the reference's
    * connector transport (Rts/Old.hs:159-198).
    *
    * Producer contract: a file-backed stream is fed EITHER by an external
    * producer dropping files into `dir` OR by one engine file-sink query
    * (CSAS / INSERT-SELECT). Once a FileSink attaches it writes
    * `_spark_metadata` into `dir`, and file sources then list only
    * sink-committed files — externally-dropped files become invisible, and
    * a second sink sharing the metadata log would silently skip batches.
    * [[attachFileSink]] enforces the one-sink half of this loudly. */
  def createFileStream(name: String, dir: String, schema: StructType,
                       format: String = "json", wire: Boolean = false): Unit = {
    require(!streams.contains(name) && !fileStreams.contains(name),
      s"stream $name exists")
    fileStreams(name) = FileStreamEntry(dir, schema, if (wire) "text" else format, wire)
  }

  /** Writer registry enforcing one live FileSink per file-backed stream
    * (two sinks sharing one _spark_metadata log lose batches silently). */
  private val fileSinkWriters = TrieMap.empty[String, String]
  private def attachFileSink(target: String, writer: String): Unit = {
    val prev = fileSinkWriters.putIfAbsent(target, writer)
    require(prev.isEmpty || prev.contains(writer),
      s"stream $target already has file-sink writer ${prev.get}; " +
        "terminate it first (one sink per file-backed stream)")
  }

  /** Producer-assigned `_ts` when the schema declares none
    * (Processor.hs:530 uses wall clock at sink). */
  private def withEventTime(parsed: DataFrame, schema: StructType): DataFrame =
    if (schema.fieldNames.contains("_ts")) parsed
    else parsed.withColumn("_ts", current_timestamp())

  /** The stream as an unbounded DataFrame: parsed payload columns + `_ts`. */
  def df(name: String): DataFrame = fileStreams.get(name) match {
    case Some(fe) =>
      val raw = spark.readStream.schema(
          if (fe.wire) StructType(Seq(StructField("value", StringType)))
          else fe.schema)
        .format(fe.format).load(fe.dir)
      val parsed =
        if (fe.wire) graft.sources.WireFormat.decode(raw, fe.schema) else raw
      withEventTime(parsed, fe.schema)
    case None =>
      val e = streams(name)
      val parsed =
        if (e.wire) graft.sources.WireFormat.decode(e.source.toDF(), e.schema)
        else e.source.toDF()
          .select(from_json($"value", e.schema).as("r"))
          .select($"r.*")
      val withTs = withEventTime(parsed, e.schema)
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

  /** EMIT CHANGES with the reference's per-row cadence: one emission per
    * input row (GroupedStream.hs:102), not one per micro-batch — the
    * fidelity opt-in for tests/consumers that need the exact changelog
    * (README "Accepted divergences"). Covers the unwindowed aggregate set:
    * running COUNT/SUM/MIN/MAX/AVG per key. */
  def emitChangesPerRow(name: String, source: DataFrame,
                        key: String, value: String): StreamingQuery =
    startQuery(name, StreamOps.perRowAgg(source, key, value), "update")

  /** CREATE STREAM out AS SELECT (CSAS): append-mode stream→stream query.
    * If `name` is a registered file-backed stream, result partitions write
    * executor-side through the streaming FileSink into the stream's
    * directory (the 100 TB path — downstream queries tail the same files);
    * otherwise an in-memory sink table serves tests and pull-style reads. */
  def createStreamAs(name: String, plan: DataFrame): StreamingQuery =
    fileStreams.get(name) match {
      case Some(fe) => startFileSinkQuery(name, name, fe, plan, s"csas_$name")
      case None => startQuery(name, plan, "append")
    }

  /** Shared FileSink launch for CSAS / INSERT-SELECT into a file-backed
    * stream: distributed append writes, resumable (checkpointed + paused-
    * closure registered like every other query), one sink per target. */
  private def startFileSinkQuery(queryName: String, target: String,
                                 fe: FileStreamEntry, plan: DataFrame,
                                 ckptTag: String): StreamingQuery = {
    attachFileSink(target, queryName)
    val encoded =
      if (fe.wire) graft.sources.WireFormat.encode(plan) else plan
    def start() = encoded.writeStream.outputMode("append").format(fe.format)
      .option("checkpointLocation", ckpt(ckptTag))
      .option("path", fe.dir)
      .trigger(Trigger.ProcessingTime(0)).start()
    val q = start()
    queries(queryName) = q
    paused(queryName) = start _
    q
  }

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
    * so queries over the target observe them.
    *
    * File-backed target: Spark's native streaming file sink writes result
    * partitions EXECUTOR-SIDE into the directory the target's source tails —
    * nothing crosses the driver, so INSERT-SELECT throughput scales with the
    * cluster (this is the path a Kafka-backed stream would take too, with
    * only the sink format changing). MemoryStream target: rows are collected
    * and re-encoded through the insert path — that transport is
    * driver-resident by definition (tests only). */
  def insertSelect(target: String, plan: DataFrame): StreamingQuery =
    fileStreams.get(target) match {
      case Some(fe) =>
        startFileSinkQuery(s"insert_$target", target, fe, plan, s"insert_$target")
      case None =>
        // MemoryStream transport (driver-resident by definition; tests).
        // A wire-format target stores extended-JSON payloads, so re-encode
        // through WireFormat (one `value` string column) — plain toJSON
        // would feed bare values to the wire decoder, which nulls every
        // non-string field.
        val wire = isWireStream(target)
        val encoded =
          if (wire) graft.sources.WireFormat.encode(plan) else plan
        def start() = encoded.writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val rows =
              if (wire) batch.collect().map(_.getString(0))
              else batch.toJSON.collect()
            if (rows.nonEmpty) insert(target, rows.toIndexedSeq: _*)
          }
          .trigger(Trigger.ProcessingTime(0)).start()
        val q = start()
        queries(s"insert_$target") = q
        paused(s"insert_$target") = start _
        q
    }

  /** TERMINATE QUERY (AST.hs:856-868). */
  def terminate(name: String): Unit = {
    queries.remove(name).foreach(_.stop()); paused.remove(name)
    fileSinkWriters.filterInPlace((_, writer) => writer != name)
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

  /** Block until every started query has processed all available input.
    * Queries can feed each other (CSAS / INSERT-SELECT pipelines), so one
    * pass in arbitrary order can leave a downstream query unfed; draining
    * once per query reaches a fixpoint for any acyclic pipeline (a drained
    * query's processAllAvailable is a cheap no-op). */
  def processAll(): Unit = {
    val passes = math.max(queries.size, 1)
    (1 to passes).foreach(_ => queries.values.foreach(_.processAllAvailable()))
  }

  // ---- materialized views (SURVEY §3.2) ------------------------------------

  /** view name → (base dir, latest snapshot path, result schema). The
    * snapshot pointer flips only after a full distributed write succeeds,
    * so pulls never observe a half-written snapshot. */
  private final class ViewState(val dir: String, val schema: StructType) {
    @volatile var snapshot: Option[String] = None
  }
  private val views = TrieMap.empty[String, ViewState]

  /** CREATE VIEW name AS <aggregation plan>: complete-mode materialization
    * into a PARQUET-BACKED table via foreachBatch — each trigger writes the
    * full aggregate distributed (executor-side, one snapshot dir per batch)
    * and then flips the serving pointer. The reference holds view state in
    * an in-memory store and dumps it per pull (groupbyStores, View.hs:
    * 134-135; ksDump Processor.hs:380-411) — a driver-memory bound we
    * deliberately do not inherit: at 100 TB the aggregate lives in files,
    * the driver only tracks a path. */
  /** Root for view snapshots. Set `spark.graft.viewRoot` to SHARED storage
    * (HDFS/object store) on a real cluster — executors write snapshot
    * partitions there and the driver's pull() scans the same path; the
    * local temp default is correct only for local[*]. */
  private val viewRoot: String =
    spark.conf.getOption("spark.graft.viewRoot").getOrElse(tempDir("graft_view"))

  def createView(name: String, plan: DataFrame): StreamingQuery = {
    val state = new ViewState(s"$viewRoot/$name", plan.schema)
    views(name) = state
    val q = plan.writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckpt(s"view_$name"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val path = s"${state.dir}/b$batchId"
        batch.write.mode("overwrite").parquet(path)
        val previous = state.snapshot
        state.snapshot = Some(path)
        // keep only the serving snapshot (and tolerate a concurrent reader
        // of the one just replaced — deletion is deferred by one batch).
        // Hadoop FS, not java.io: the view root may be HDFS/S3.
        previous.foreach { p =>
          val dirPath = new org.apache.hadoop.fs.Path(state.dir)
          val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val keep = Set(path, p).map(s => new org.apache.hadoop.fs.Path(s).getName)
          fs.listStatus(dirPath)
            .filterNot(st => keep.contains(st.getPath.getName))
            .foreach(st => fs.delete(st.getPath, true))
        }
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    queries(name) = q
    q
  }

  /** Pull query over a view: a BATCH scan over the parquet snapshot with the
    * immediate WHERE applied — the predicate and projection push into the
    * parquet reader (View.hs:166-254's splice made unnecessary by
    * materializing final output; SURVEY §3.2). Falls back to the session
    * catalog for names materialized elsewhere (e.g. memory-sink tests). */
  def pull(view: String, where: String = "true"): DataFrame =
    views.get(view) match {
      case Some(state) => state.snapshot match {
        case Some(path) => spark.read.parquet(path).where(where)
        case None => // no trigger has completed yet: empty, correctly typed
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], state.schema)
            .where(where)
      }
      case None => spark.table(view).where(where)
    }

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
