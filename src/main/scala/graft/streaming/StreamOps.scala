package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transform combinators: the windowed-aggregation and interval-
  * join surface of the dialect (SURVEY §2.4–§2.6), watermark-correct by
  * construction.
  *
  * Reference semantics (citations into /root/reference):
  *   - TUMBLE(s, i): size = advance = i
  *     (hstream-processing/.../TimeWindows.hs:34-40).
  *   - HOP(s, size, advance): a record lands in ⌈size/advance⌉ windows
  *     (TimeWindows.hs:42-48).
  *   - SESSION(s, gap): overlapping sessions merged — min start / max end /
  *     merged accumulators (SessionWindowedStream.hs:93-138); Spark's
  *     session_window performs the same merge in the state store.
  *   - Grace: windows carry twGraceMs = 24 h (TimeWindows.hs:39,47); late
  *     records beyond it are dropped (TimeWindowedStream.hs:99-113) — the
  *     watermark reproduces exactly this drop rule.
  *   - JOIN … WITHIN t: buffer both sides, match in [ts−t, ts+t]
  *     (Stream.hs:273-312). Unlike the reference's nested-loop scan over an
  *     unkeyed store (Codegen/V1.hs:286 — empty join key!), equi-conjuncts
  *     here hash-partition the state, and the watermark bounds it — this is
  *     what makes the same query run at 100 TB.
  *   - Join type is honored (LEFT/RIGHT/FULL) — the reference V1 silently
  *     downgrades all to INNER (Codegen/V1.hs:301); we match the V2 engine
  *     (DiffFlow/Types.hs:323-328) and standard SQL instead.
  */
object StreamOps {

  val DefaultGrace = "24 hours"

  /** Watermarked tumbling-window groupBy (window struct exposed as
    * `window.start`/`window.end`, the reference's TimeWindow {start,end}). */
  def tumble(df: DataFrame, ts: String, size: String,
             keys: Seq[Column] = Nil, grace: String = DefaultGrace): RelationalGroupedDataset =
    df.withWatermark(ts, grace).groupBy(window(col(ts), size) +: keys: _*)

  /** Watermarked hopping-window groupBy. */
  def hop(df: DataFrame, ts: String, size: String, advance: String,
          keys: Seq[Column] = Nil, grace: String = DefaultGrace): RelationalGroupedDataset =
    df.withWatermark(ts, grace).groupBy(window(col(ts), size, advance) +: keys: _*)

  /** Watermarked session-window groupBy (gap-merged, per key). */
  def session(df: DataFrame, ts: String, gap: String,
              keys: Seq[Column] = Nil, grace: String = DefaultGrace): RelationalGroupedDataset =
    df.withWatermark(ts, grace).groupBy(session_window(col(ts), gap) +: keys: _*)

  /** Stream-stream interval join: `left ⋈ right` where
    * rightTs ∈ [leftTs − before, leftTs + after] ∧ cond.
    *
    * Symmetric watermarks on both sides let Spark expire buffered state at
    * exactly the reference's retention bound (jwBeforeMs/jwAfterMs,
    * Codegen/V1.hs:287-291). Outer types need both watermarks — present by
    * construction. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTs: String, rightTs: String,
                   before: String, after: String,
                   cond: Column, joinType: String = "inner",
                   grace: String = DefaultGrace): DataFrame = {
    val l = left.withWatermark(leftTs, grace)
    val r = right.withWatermark(rightTs, grace)
    val range =
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after")
    l.join(r, range && cond, joinType)
  }

  /** Stream→table materialization: latest value per key (the reference's
    * `table` source — a stream consumed into a KV store keeping the newest
    * record per key, Stream.hs:89-135). max_by over the event-time column
    * gives Spark's partial-aggregated form of the same state. Ties on ts
    * break deterministically by the packed struct's remaining fields. */
  def latestPerKey(df: DataFrame, keys: Seq[String], ts: String): DataFrame = {
    val others = df.columns.filterNot(c => keys.contains(c)).toIndexedSeq
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), col(ts)).as("_latest"))
      .select(keys.map(col) ++ others.map(c => col(s"_latest.$c")): _*)
  }

  /** Per-row running accumulator: (count, sum, min, max) composes every
    * unwindowed aggregate of the dialect (AVG = sum/count) — the Spark twin
    * of the reference's one-accumulator-object `composeAggs`
    * (Codegen/Common.hs:96-119). */
  /** Per-row emission for unwindowed aggregation: ONE output row per INPUT
    * row, carrying the running COUNT/SUM/MIN/MAX/AVG — the reference's
    * exact EMIT CHANGES cadence (every input re-emits the updated
    * accumulator, GroupedStream.hs:79-102), where plain update-mode groupBy
    * coalesces all of a key's rows within a micro-batch into one emission.
    * Built on flatMapGroupsWithState: state is one accumulator per key,
    * partitioned across executors like any streaming agg — per-row fidelity
    * costs emission volume, not driver memory. */
  def perRowAgg(df: DataFrame, key: String, value: String): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    // state = (count, sum, min, max): composes every unwindowed aggregate
    // of the dialect (AVG = sum/count) — the Spark twin of the reference's
    // one-accumulator-object composeAggs (Codegen/Common.hs:96-119)
    df.select(col(key).cast("string"), col(value).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Double, Double),
        (String, Long, Double, Double, Double, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[(String, Double)],
         state: GroupState[(Long, Double, Double, Double)]) =>
          var (cnt, sm, lo, hi) = state.getOption.getOrElse(
            (0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity))
          val emissions = rows.map { case (_, v) =>
            cnt += 1; sm += v; lo = math.min(lo, v); hi = math.max(hi, v)
            (k, cnt, sm, lo, hi, sm / cnt)
          }.toVector // materialize BEFORE state.update sees the final acc
          state.update((cnt, sm, lo, hi))
          emissions.iterator
      }
      .toDF(key, "cnt", "sum", "min", "max", "avg")
  }

  /** Streaming exact dedup with bounded state: first-seen row per key wins;
    * state for keys older than the watermark is dropped. The streaming form
    * of q_dedup_exact (and of the reference's idempotent-producer dedup). */
  def dedupWithinWatermark(df: DataFrame, ts: String, cols: Seq[String],
                           grace: String = DefaultGrace): DataFrame =
    df.withWatermark(ts, grace).dropDuplicatesWithinWatermark(cols)
}
