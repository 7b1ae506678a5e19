package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, the single most recent
  * right row with the same key at-or-before the left row's timestamp —
  * the join a feature store / training pipeline needs ("what was the
  * user's last purchase when this click happened") and one Spark has no
  * native operator for. An interval join answers a different question
  * (ALL right rows in a range, row count multiplies); as-of picks exactly
  * one and never explodes.
  *
  * The reference engine has no as-of operator either (its grammar stops at
  * INTERVAL joins, Stream.hs:273-312) — this is a beyond-reference op,
  * expressed in the two shapes that survive 100 TB:
  *
  *   - [[AsofJoin.backward]]: the union trick. Tag left/right, union,
  *     one shuffle on the key, and a per-key ordered running `last(payload,
  *     ignoreNulls)` fills each left row with the latest preceding right
  *     row. No row explosion, no range self-join; the sort group is one
  *     key's full history (fine when keys are plentiful — the usual case).
  *   - [[AsofJoin.backwardBucketed]]: the skew-safe refinement. Time is
  *     cut into fixed buckets; right rows collapse to one summary row per
  *     (key, bucket); a tiny window over bucket summaries computes each
  *     bucket's carry-in; the exact union-trick pass then runs per
  *     (key, bucket) — the sort granularity drops from "one key's entire
  *     history" to "one key's single bucket", so a hot key's years of
  *     events no longer form one unsplittable sort task. Results are
  *     identical to [[backward]] (pinned in AsofJoinSpec).
  *
  * Right rows sharing an exact (key, ts) make "the" most recent row
  * ambiguous — pre-dedupe the right side for deterministic output (the
  * gate queries' corpus has no such ties; DuckDB's ASOF has the same
  * caveat).
  *
  * The STREAMING form — a live left stream enriched against a right
  * stream's history with watermark-trimmed per-key state — is
  * [[graft.streaming.StreamOps.asofEnrich]], twin-pinned to this
  * operator's hash-verified rows in StreamingTwinSpec.
  */
object AsofJoin {

  /** SQL NULL semantics for the timestamps (DuckDB ASOF agrees): a NULL
    * ts compares UNKNOWN to everything, so a NULL-ts RIGHT row can never
    * be anyone's match (dropped before the window — otherwise NULLS FIRST
    * ordering would slot it below every frame), and a NULL-ts LEFT row
    * matches nothing: it bypasses the window entirely and re-emits with
    * null payloads (the planner's inner-asof marker filter then drops it,
    * mirroring DuckDB's inner ASOF). Without the bypass, asc NULLS-FIRST
    * ordering plus a FOLLOWING frame would hand a NULL-ts left row the
    * key's EARLIEST right row in [[forward]]; [[backward]] was safe only
    * by accident (empty PRECEDING frame). */
  private def nullTsBypass(left: DataFrame, right: DataFrame,
                           leftTs: String, rightTs: String,
                           payload: Seq[String])
                          (core: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val collide = payload.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"payload columns collide with left: $collide")
    val rSchema = right.schema
    val lNull = left.filter(col(leftTs).isNull)
    val core0 = core(left.filter(col(leftTs).isNotNull),
      right.filter(col(rightTs).isNotNull))
    core0.unionByName(lNull.select(left.columns.toSeq.map(col) ++
      payload.map(p => lit(null).cast(rSchema(p).dataType).as(p)): _*))
  }

  /** Exact backward as-of join (inclusive: a right row AT the left row's
    * timestamp matches). `right` must carry exactly `rightKey`, `rightTs`,
    * and `payload` columns, with payload names disjoint from `left`'s
    * columns; unmatched left rows keep null payloads (left-join
    * semantics). One shuffle, partitioned by key, ordered by time. */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame =
    nullTsBypass(left, right, leftTs, rightTs, payload) { (l, r) =>
      backwardCore(l, r, leftKey, rightKey, leftTs, rightTs, payload)
    }

  private def backwardCore(left: DataFrame, right: DataFrame,
                           leftKey: String, rightKey: String,
                           leftTs: String, rightTs: String,
                           payload: Seq[String]): DataFrame = {
    val (unioned, leftCols) = tagAndUnion(left, right, leftKey, rightKey,
      leftTs, rightTs, payload)
    // right (__tag 0) sorts before left (__tag 1) at equal ts → inclusive
    val w = Window.partitionBy("__k").orderBy("__t", "__tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** Exact FORWARD as-of join (inclusive): for each left row, the single
    * EARLIEST right row with the same key at-or-after the left row's
    * timestamp — time-to-next-event enrichment ("when is this click's
    * next purchase"), the mirror of [[backward]] (pandas merge_asof
    * direction='forward'; DuckDB expresses it as ASOF ON l.ts <= r.ts).
    * Same union-trick shape: one shuffle on the key, per-key ordered
    * running `first(payload, ignoreNulls)` over the FOLLOWING frame; left
    * rows sort before right rows at equal ts so an exactly-simultaneous
    * right row matches. */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTs: String, rightTs: String,
              payload: Seq[String]): DataFrame =
    nullTsBypass(left, right, leftTs, rightTs, payload) { (l, r) =>
      forwardCore(l, r, leftKey, rightKey, leftTs, rightTs, payload)
    }

  private def forwardCore(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTs: String, rightTs: String,
                          payload: Seq[String]): DataFrame = {
    val (unioned, leftCols) = tagAndUnion(left, right, leftKey, rightKey,
      leftTs, rightTs, payload)
    // left (__tag 1) sorts before right (__tag 0) at equal ts → inclusive
    val w = Window.partitionBy("__k").orderBy(col("__t").asc, col("__tag").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, first(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** Scale-safe backward as-of join: identical output to [[backward]],
    * but no per-key total-order sort. `bucket` is the time-bucket width in
    * seconds; pick it so one key's rows per bucket fit a sort task (e.g.
    * a day for event data). Three shuffles instead of one — the price of
    * making every sort group (key, bucket)-bounded:
    *
    *   1. right → one summary row per (key, bucket): the bucket's LAST
    *      payload (map-side partial `max_by`).
    *   2. carry-in per (key, bucket): running last over the summaries of
    *      strictly-earlier buckets — a window over O(buckets-per-key)
    *      rows, not O(rows-per-key).
    *   3. the exact union-trick pass, partitioned by (key, bucket), with
    *      each left row falling back to its bucket's carry-in when no
    *      same-bucket right row precedes it.
    */
  def backwardBucketed(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       payload: Seq[String], bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket width must be positive seconds, got $bucket")
    nullTsBypass(left, right, leftTs, rightTs, payload) { (l, r) =>
      backwardBucketedCore(l, r, leftKey, rightKey, leftTs, rightTs,
        payload, bucket)
    }
  }

  private def backwardBucketedCore(left: DataFrame, right: DataFrame,
                                   leftKey: String, rightKey: String,
                                   leftTs: String, rightTs: String,
                                   payload: Seq[String],
                                   bucket: Long): DataFrame = {
    def bucketOf(ts: String): Column =
      floor(unix_micros(col(ts)) / lit(bucket * 1000000L)).cast("long")
    val rightB = right.withColumn("__b", bucketOf(rightTs))
    // 1. bucket-final right row per (key, bucket): max_by is a mergeable
    // aggregate, so this partial-aggregates map-side before its shuffle
    val summary = rightB.groupBy(col(rightKey).as("__k"), col("__b"))
      .agg(max_by(struct((rightTs +: payload).map(col): _*), col(rightTs))
        .as("__fin"))
    // 2. per-bucket carry-in = last summary of any STRICTLY earlier bucket.
    // Left buckets with no right summary still need a carry row, so the
    // window runs over the union of both bucket sets — one row per
    // (key, bucket), O(active buckets) per key.
    val leftBuckets = left.select(col(leftKey).as("__k"),
      bucketOf(leftTs).as("__b")).distinct()
    val allBuckets = leftBuckets
      .join(summary, Seq("__k", "__b"), "full_outer")
    val wCarry = Window.partitionBy("__k").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allBuckets
      .withColumn("__carry", last(col("__fin"), ignoreNulls = true).over(wCarry))
      .select(col("__k"), col("__b"), col("__carry"))
    // 3. exact within-bucket pass, sort groups = (key, bucket)
    val (unioned, leftCols) = tagAndUnion(left, right, leftKey, rightKey,
      leftTs, rightTs, payload)
    val w = Window.partitionBy("__k", "__b").orderBy("__t", "__tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned.withColumn("__b", bucketOf("__t"))) {
      (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1)
      .join(carry, Seq("__k", "__b"), "left")
      .select(leftCols.map(col) ++ payload.map(p =>
        // same-bucket match wins; else the carry-in from earlier buckets
        coalesce(col(p), col("__carry").getField(p)).as(p)): _*)
  }

  /** Shared union-trick frame: left rows tagged 1 with null payloads,
    * right rows tagged 0 with null left columns, one schema. */
  private def tagAndUnion(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTs: String, rightTs: String,
                          payload: Seq[String]): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    val collide = payload.toSet.intersect(leftCols.toSet)
    require(collide.isEmpty, s"payload columns collide with left: $collide")
    val rSchema = right.schema
    val lSchema = left.schema
    def nullAs(name: String, from: org.apache.spark.sql.types.StructType) =
      lit(null).cast(from(name).dataType).as(name)
    val lTagged = left.select(
      Seq(col(leftKey).as("__k"), col(leftTs).as("__t"), lit(1).as("__tag")) ++
        leftCols.map(col) ++ payload.map(nullAs(_, rSchema)): _*)
    val rTagged = right.select(
      Seq(col(rightKey).as("__k"), col(rightTs).as("__t"), lit(0).as("__tag")) ++
        leftCols.map(nullAs(_, lSchema)) ++ payload.map(col): _*)
    (lTagged.unionByName(rTagged), leftCols)
  }
}
