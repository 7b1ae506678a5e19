package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 micro-batch source over the [[LedgerBroker]] protocol — the
  * OFFSET-TRACKED transport through Engine's df() seam.
  *
  * Contract (what the socket source lacks, and what makes this the
  * Kafka-shaped class of transport):
  *   - every record has a monotone broker offset;
  *   - Spark's checkpoint offset log stores the (start, end] range of each
  *     micro-batch; after a crash the restarted query re-plans from the
  *     last COMMITTED offset — and because the broker replays any range on
  *     demand, recovery is no-loss AND no-duplication end-to-end (proven
  *     against a transactional file sink in LedgerTransportSpec);
  *   - getBatch(start, end) is DETERMINISTIC: the same offsets always
  *     return the same records, the property Structured Streaming requires
  *     of a replayable source (kafka/KafkaSource follows the same shape).
  *
  * Scale design: a batch's offset range splits into `fetchPartitions`
  * contiguous sub-ranges, one [[InputPartition]] each — fetches run on
  * EXECUTORS in parallel with per-partition connections (like Kafka's one
  * consumer per partition-range); the driver only ever polls END. A
  * production broker would shard the log by topic-partition; the protocol
  * and this reader are agnostic to that (one stream per shard through the
  * same seam).
  *
  * Usage: spark.readStream.format("graft.sources.LedgerSourceProvider")
  *          .option("host", h).option("port", p).load()
  */
class LedgerSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LedgerSourceProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val host = properties.get("host")
    val port = properties.get("port")
    require(host != null && port != null, "ledger source requires host and port")
    val parts = Option(properties.get("fetchpartitions")).map(_.toInt).getOrElse(4)
    new LedgerTable(host, port.toInt, parts)
  }
}

object LedgerSourceProvider {
  /** One payload line per record, like the kafka source's `value`. */
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
}

private[sources] class LedgerTable(host: String, port: Int, fetchParts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"ledger($host:$port)"
  override def schema(): StructType = LedgerSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = LedgerSourceProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new LedgerMicroBatchStream(host, port, fetchParts)
      }
    }
}

/** Offset = the broker's record count high-water mark. */
private[sources] case class LedgerOffset(off: Long) extends Offset {
  override def json(): String = off.toString
}

private[sources] class LedgerMicroBatchStream(host: String, port: Int,
                                              fetchParts: Int)
    extends MicroBatchStream {
  override def initialOffset(): Offset = LedgerOffset(0L)
  override def latestOffset(): Offset =
    LedgerOffset(LedgerClient.endOffset(host, port))
  override def deserializeOffset(json: String): Offset =
    LedgerOffset(json.trim.toLong)
  // the broker retains its full log (replay is its contract); consumer
  // progress lives in Spark's checkpoint offset log, not broker-side
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LedgerOffset].off
    val e = end.asInstanceOf[LedgerOffset].off
    if (e <= s) Array.empty
    else {
      // contiguous sub-ranges, executor-parallel like Kafka range fetches
      val k = math.min(fetchParts.toLong, e - s).toInt
      val step = (e - s) / k
      val rem = (e - s) % k
      var from = s
      (0 until k).map { i =>
        val len = step + (if (i < rem) 1 else 0)
        val p = LedgerInputPartition(host, port, from, from + len)
        from += len
        p: InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    LedgerReaderFactory
}

private[sources] case class LedgerInputPartition(host: String, port: Int,
                                                 from: Long, until: Long)
    extends InputPartition

private[sources] object LedgerReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LedgerInputPartition]
    new PartitionReader[InternalRow] {
      // executor-side range fetch; the range is one micro-batch sub-range,
      // bounded by trigger cadence (a production reader would stream the
      // socket instead of buffering — same protocol)
      private val rows =
        LedgerClient.fetch(p.host, p.port, p.from, p.until).iterator
      private var cur: String = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(cur))
      override def close(): Unit = ()
    }
  }
}
