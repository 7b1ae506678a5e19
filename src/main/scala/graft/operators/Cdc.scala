package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** CDC changelog processing: decode Debezium-shaped change envelopes and
  * materialize the latest table state from an ordered change stream.
  *
  * The reference registers mysql/postgres/mongo CDC connectors as external
  * Docker tasks and only keeps their metadata in-engine (conf/hstream.yaml:
  * 129-143; hstream-io/src/HStream/IO/Worker.hs:71-83 tracks per-task
  * progress) — the actual envelope decode and state maintenance happen
  * inside the Debezium container. Here the PROCESSING half runs in-engine:
  * any transport that can deliver envelope strings (the offset-tracked
  * ledger source, a socket, a file) feeds [[decode]] + [[applyLatest]], and
  * exactly-once resumability comes from the transport's offsets exactly as
  * it does for every other ledger consumer.
  *
  * Envelope shape (the public Debezium JSON contract, minus the schema
  * preamble):
  * {{{
  *   {"op":"c"|"u"|"d", "before":{...}|null, "after":{...}|null,
  *    "ts_ms":<long>, "seq":<long>}
  * }}}
  * `seq` is the transport's total-order tiebreak within one `ts_ms`
  * (Debezium's `source.pos`/LSN); the pair (ts_ms, seq) totally orders
  * changes per key.
  *
  * Scale design: [[applyLatest]] is ONE shuffle of pre-reduced partials —
  * `max_by` is a mergeable aggregate, so every map task first collapses its
  * partition to one candidate row per key (partial aggregation), and no
  * per-key sort or window exists anywhere. A 100 TB changelog with a
  * billion keys reduces map-side before the exchange; key skew is
  * irrelevant because the combined row is constant-size.
  */
object Cdc {

  /** Envelope schema for a given row schema: before/after are nullable
    * structs of the row type (null `after` on delete, null `before` on
    * insert/snapshot-read). */
  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("before", rowSchema, nullable = true),
    StructField("after", rowSchema, nullable = true),
    StructField("ts_ms", LongType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** Decode a one-string-column frame of JSON envelopes into typed change
    * rows `(op, before, after, ts_ms, seq)`. Pure map-side (from_json is a
    * codegen'd expression); malformed payloads yield null structs rather
    * than failing the batch (Spark's PERMISSIVE default) and are dropped,
    * mirroring Debezium's skipped-event accounting. */
  def decode(envelopes: DataFrame, rowSchema: StructType,
             valueCol: String = "value"): DataFrame = {
    val env = from_json(col(valueCol), envelopeSchema(rowSchema))
    envelopes.select(env.as("e")).select("e.*")
      .filter(col("op").isNotNull)
  }

  /** Inputs estimated above this size get the AQE state-sizing treatment
    * in [[applyLatest]]; below it, the default partitioning never spills
    * and the session is left untouched. Calibrated against the measured
    * decades (CDCDIAG_r10): the 23M-envelope shape that spills 3.5 GB
    * estimates ~1.35 GB (planner stats undershoot the in-flight JSON
    * ~3x), the spill-free 2.3M shape estimates ~135 MB. */
  private val SizingThresholdBytes: BigInt = BigInt(512L) << 20 // 512 MiB

  /** Materialize the latest state from decoded change rows: per key, keep
    * the row of the (ts_ms, seq)-maximal change, then drop keys whose last
    * change is a delete. Input must carry `op`, `after`, `ts_ms`, `seq`;
    * `keyCols` are fields of the `after`/`before` structs (for deletes,
    * where `after` is null, the key is taken from `before` — Debezium
    * guarantees the key side of a delete).
    *
    * Output schema = the row schema (after.*), one row per live key.
    *
    * Shuffle sizing (measured, CDCDIAG_r10): the final hash-aggregate
    * holds one max_by buffer per key, and that state deserializes to
    * roughly 5x the pre-reduced shuffle bytes — but AQE coalesces
    * post-shuffle partitions by shuffle BYTES alone, so at the ~20M-key
    * decade it packs gigabytes of agg state into a few dozen tasks and
    * spills (3.5 GB at an 8 GB heap; 0 after sizing, same plan). When
    * `sizeShuffleForState` (default) and the input's estimated size
    * exceeds [[SizingThresholdBytes]], this sets two session-level AQE
    * knobs —
    * `coalescePartitions.initialPartitionNum` (from the size estimate)
    * and `advisoryPartitionSizeInBytes` (8m) — so per-task agg state
    * stays in the tens of MB. They are SESSION-level because Spark has
    * no per-exchange override that preserves map-side partial
    * aggregation (an explicit repartition before the groupBy would ship
    * every envelope un-reduced); they stay set until the caller runs
    * [[restoreShuffleSizing]] AFTER the action that consumed the result
    * (the previous values are snapshotted here). Left unrestored they
    * only make AQE coalescing finer-grained elsewhere. Pass
    * `sizeShuffleForState = false` to manage the session yourself.
    */
  private val SizingKeys = Seq(
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes")

  /** Per-session snapshot of the two AQE knobs [[applyLatest]] overrides,
    * captured at the FIRST sizing mutation that session (None = the key
    * was unset). The overrides must outlive applyLatest itself — they
    * take effect when the returned (lazy) DataFrame executes, and Spark
    * has no per-exchange override — so the operator can't restore them;
    * callers do, after the action that consumed the result, via
    * [[restoreShuffleSizing]] (r11 ADVICE: the values previously leaked
    * into the session forever with no way back).
    * WEAK keys (r13 ADVICE): a session whose caller never calls
    * restoreShuffleSizing (direct applyLatest users outside Bench/Verify)
    * must not be pinned for the JVM lifetime by this map — entries vanish
    * with the session. All access synchronizes on the map (WeakHashMap is
    * not thread-safe; Collections.synchronizedMap's default-method
    * overrides lock every call). */
  private val sizingSnapshots =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[
        org.apache.spark.sql.SparkSession, Seq[(String, Option[String])]]())

  /** Restore the session's pre-[[applyLatest]] values of the two AQE
    * sizing knobs (no-op if no sizing mutation happened, or already
    * restored). Call AFTER the action that executed applyLatest's result. */
  def restoreShuffleSizing(spark: org.apache.spark.sql.SparkSession): Unit = {
    val snap = sizingSnapshots.remove(spark)
    if (snap != null) snap.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  def applyLatest(changes: DataFrame, keyCols: Seq[String],
                  sizeShuffleForState: Boolean = true): DataFrame = {
    if (sizeShuffleForState) {
      val spark = changes.sparkSession
      // planner estimate only — no job is triggered
      val bytes = BigInt(
        changes.queryExecution.optimizedPlan.stats.sizeInBytes.toString())
      if (bytes > SizingThresholdBytes &&
          spark.conf.get("spark.sql.adaptive.enabled", "true") == "true") {
        val parts = (bytes / (8L << 20)).min(2048).max(64).toInt
        // snapshot once per session BEFORE overriding, so a caller can
        // put the session back after consuming the result
        sizingSnapshots.computeIfAbsent(spark,
          _ => SizingKeys.map(k => k -> spark.conf.getOption(k)))
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          parts.toString)
        spark.conf.set(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      }
    }
    val keyed = changes.withColumn("_k",
      struct(keyCols.map(k => coalesce(col(s"after.$k"), col(s"before.$k")).as(k)): _*))
    val last = keyed
      .groupBy(col("_k"))
      .agg(max_by(struct(col("op"), col("after")), struct(col("ts_ms"), col("seq"))).as("_last"))
    last
      .filter(col("_last.op") =!= lit("d"))
      .select(col("_last.after.*"))
  }

  /** Count surviving/deleted/total changes per op — the operational summary
    * a CDC pipeline dashboards (Debezium's event counters). One partial-agg
    * pass; no key state. */
  def opCounts(changes: DataFrame): DataFrame =
    changes.groupBy(col("op")).agg(count(lit(1)).as("n")).orderBy(col("op"))

  /** Encode typed rows as envelopes (the producer side — what a source
    * connector emits into the transport). `opCol`, `tsCol`, `seqCol` name
    * columns of `rows`; the remaining columns form the row payload. Deletes
    * put the payload in `before`, everything else in `after` (the Debezium
    * contract). */
  def encode(opCol: Column, tsCol: Column, seqCol: Column,
             payloadCols: Seq[String]): Column = {
    val payload = struct(payloadCols.map(col): _*)
    val isDelete = opCol === lit("d")
    to_json(struct(
      opCol.as("op"),
      when(isDelete, payload).as("before"),
      when(!isDelete, payload).as("after"),
      tsCol.cast(LongType).as("ts_ms"),
      seqCol.cast(LongType).as("seq")))
  }
}
