package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.CoreQueries

/** Streaming-vs-batch TWIN equality: the same data replayed through live
  * Structured Streaming topologies must produce exactly the rows of the
  * DuckDB-hash-verified batch gate queries — which transitively puts the
  * streaming execution paths (watermarks, output modes, state stores)
  * under the oracle. One twin per streaming surface the gate can't reach
  * directly: tumble/hop/session window aggs, the stream-stream interval
  * join, unwindowed update-mode agg, and the stateless filter/project. */
class StreamingTwinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Stage a table's parquet into a temp dir and open it as a stream
    * (whole file = one micro-batch), with the same ns→µs events handling
    * as Tables.load. Returns (staging dir, stream). */
  private def staged(table: String) = {
    val dir = Files.createTempDirectory(s"graft_twin_$table")
    Files.copy(Paths.get(s"$sf/$table.parquet"), dir.resolve(s"$table.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val df = if (table == "events") graft.Tables.normalizeEventsTs(raw) else raw
    (dir, df)
  }

  private def drain(plan: DataFrame, mode: String, name: String) = {
    val q = plan.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }

  /** Far-future sentinel event (user_id −1): appended as a second
    * micro-batch it advances the watermark past every real record, closing
    * all append-mode windows. `eventType` pins the sentinel's type — a
    * topology that SPLITS the source by event_type before watermarking
    * needs one sentinel PER branch, since each branch's watermark only
    * sees rows that pass its own filter. */
  private def appendSentinel(dir: java.nio.file.Path,
                             eventType: Option[String] = None): Unit = {
    import org.apache.spark.sql.types._
    val cur = spark.read.parquet(dir.toString)
    // Sentinel must match the dir's physical ts encoding so the fixed-schema
    // stream reader accepts the appended file: nanos long for the legacy
    // generation, a cast timestamp (~2096) for timestamp[us]/NTZ data.
    val sentinelTs = cur.schema("ts").dataType match {
      case LongType => lit(4000000000000000000L) // ~2096 in nanos
      case t => timestamp_micros(lit(4000000000000000L)).cast(t)
    }
    val base = cur.limit(1)
      .withColumn("ts", sentinelTs)
      .withColumn("user_id", lit(-1L))
    eventType.map(t => base.withColumn("event_type", lit(t))).getOrElse(base)
      .write.mode("append").parquet(dir.toString)
  }

  private def batch(name: String) =
    CoreQueries.queries(name)(spark, sf).collect().toSeq

  test("tumbling window agg twin (update mode) == oracle'd q_window_tumble") {
    import spark.implicits._
    val (_, s) = staged("events")
    val q = drain(
      s.withWatermark("ts", "1 minute")
        .groupBy(window($"ts", "1 day"))
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("sum_value"))
        .select($"window.start".as("window_start"), $"cnt", $"sum_value"),
      "update", "tw_tumble")
    val got = spark.table("tw_tumble").orderBy("window_start").collect().toSeq
    assert(got == batch("q_window_tumble"), "streaming tumble != batch twin")
    q.stop()
  }

  test("hopping window agg twin (update mode) == oracle'd q_window_hop") {
    import spark.implicits._
    val (_, s) = staged("events")
    val q = drain(
      s.withWatermark("ts", "1 minute")
        .groupBy(window($"ts", "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select($"window.start".as("window_start"), $"cnt"),
      "update", "tw_hop")
    val got = spark.table("tw_hop").orderBy("window_start").collect().toSeq
    assert(got == batch("q_window_hop"), "streaming hop != batch twin")
    q.stop()
  }

  test("session window agg twin (append + sentinel close) == oracle'd q_window_session") {
    import spark.implicits._
    val (dir, s) = staged("events")
    val q = drain(
      s.withWatermark("ts", "1 minute")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("sum_value"))
        .select($"user_id", $"session_window.start".as("session_start"),
          $"cnt", $"sum_value"),
      "append", "tw_session")
    appendSentinel(dir) // close every real session
    q.processAllAvailable()
    val got = spark.table("tw_session").filter($"user_id" =!= -1L)
      .orderBy("user_id", "session_start").collect().toSeq
    assert(got == batch("q_window_session"), "streaming session != batch twin")
    q.stop()
  }

  test("stream-stream interval join twin == oracle'd q_interval_join") {
    import spark.implicits._
    val (_, s) = staged("events")
    val a = s.select($"user_id".as("a_user"), $"ts".as("a_ts"), $"event_id".as("a_id"))
      .withWatermark("a_ts", "2 minutes")
    val b = s.select($"user_id".as("b_user"), $"ts".as("b_ts"), $"event_id".as("b_id"))
      .withWatermark("b_ts", "2 minutes")
    val q = drain(
      a.join(b, $"a_user" === $"b_user" && $"a_id" =!= $"b_id"
          && $"b_ts" >= $"a_ts" - expr("INTERVAL 2 MINUTES")
          && $"b_ts" <= $"a_ts" + expr("INTERVAL 2 MINUTES"))
        .select($"a_user", $"a_id", $"b_id"),
      "append", "tw_join")
    // aggregate the emitted pair stream batch-side (chaining a streaming
    // agg after a stream-stream join is its own operator-support question;
    // the twin pins the JOIN) — must equal the oracle'd per-user counts
    val got = spark.table("tw_join").groupBy($"a_user")
      .agg(count(lit(1)).as("pairs"))
      .select($"a_user".as("user_id"), $"pairs")
      .orderBy("user_id").collect().toSeq
    assert(got == batch("q_interval_join"), "streaming interval join != batch twin")
    q.stop()
  }

  test("streaming LEFT OUTER interval join twin == oracle'd q_interval_join_left") {
    import spark.implicits._
    // the risky half of an OUTER stream-stream join is the NULL side:
    // an unmatched left emits its null-padded row only when the join's
    // watermark proves no matching right can still arrive — exactly the
    // rows a batch LEFT join emits immediately. Twin: same clicks ⋈
    // purchases-within-10min shape as the hash-verified batch row.
    val (dir, s) = staged("events")
    val a = s.filter($"event_type" === "click")
      .select($"user_id".as("a_user"), $"ts".as("a_ts"), $"event_id".as("a_id"))
      .withWatermark("a_ts", "2 minutes")
    val b = s.filter($"event_type" === "purchase")
      .select($"user_id".as("b_user"), $"ts".as("b_ts"), $"event_id".as("b_id"))
      .withWatermark("b_ts", "2 minutes")
    val q = drain(
      a.join(b, $"a_user" === $"b_user"
          && $"b_ts" >= $"a_ts"
          && $"b_ts" <= $"a_ts" + expr("INTERVAL 10 MINUTES"), "leftOuter")
        .select($"a_user", $"a_id", $"b_id"),
      "append", "tw_join_left")
    // both branches filter BEFORE watermarking, so each needs its own
    // sentinel to advance its watermark and flush the null side
    appendSentinel(dir, Some("click"))
    appendSentinel(dir, Some("purchase"))
    q.processAllAvailable()
    val got = spark.table("tw_join_left").filter($"a_user" =!= -1L)
      .groupBy($"a_id").agg(count($"b_id").as("purchases_within_10m"))
      .orderBy("a_id").collect().toSeq
    assert(got == batch("q_interval_join_left"),
      "streaming LEFT interval join != batch twin")
    q.stop()
  }

  test("unwindowed agg twin (update mode) == oracle'd q_agg_unwindowed") {
    import spark.implicits._
    val (_, s) = staged("lineitem")
    val q = drain(
      s.groupBy($"l_suppkey")
        .agg(count(lit(1)).as("cnt"),
          round(sum($"l_extendedprice"), 2).as("sum_price"),
          round(min($"l_quantity"), 2).as("min_qty"),
          round(max($"l_quantity"), 2).as("max_qty"),
          round(avg($"l_discount"), 6).as("avg_disc")),
      "update", "tw_agg")
    val got = spark.table("tw_agg").orderBy("l_suppkey").collect().toSeq
    assert(got == batch("q_agg_unwindowed"), "streaming agg != batch twin")
    q.stop()
  }

  test("stateless filter/project twin (append) == oracle'd q_filter_project") {
    import spark.implicits._
    val (_, s) = staged("events")
    val q = drain(
      s.filter($"event_type" === "purchase" && $"value" > 100.0)
        .select($"event_id", $"user_id",
          round($"value" * lit(2) - lit(1), 4).as("v2")),
      "append", "tw_filter")
    val got = spark.table("tw_filter").orderBy("event_id").collect().toSeq
    assert(got == batch("q_filter_project"), "streaming filter != batch twin")
    q.stop()
  }

  test("streaming retention twin (first-seen cohort state) == oracle'd q_events_retention") {
    import spark.implicits._
    val (dir, s) = staged("events")
    // Spark's conservative global-watermark check flags ANY stateful agg
    // downstream of flatMapGroupsWithState (cohort rows finalize exactly
    // when the watermark passes them, so they are "late" by construction).
    // The downstream agg here is UNWATERMARKED update-mode — it never
    // discards late rows, so the flagged risk cannot occur; disabling the
    // check is the documented escape hatch for exactly this shape.
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    // retention emits one row per distinct (user, day), exactly once, so
    // count(1) downstream IS the batch count_distinct(user)
    val q = try drain(
      StreamOps.retention(s, "user_id", "ts")
        .filter($"user_id" =!= -1L) // sentinel user never reaches the agg
        .groupBy($"cohort_day", $"day_offset")
        .agg(count(lit(1)).as("n_users")),
      "update", "tw_retention")
    finally spark.conf.unset(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    appendSentinel(dir) // watermark past every real day → cohorts finalize
    q.processAllAvailable()
    val got = spark.table("tw_retention")
      .orderBy("cohort_day", "day_offset").collect().toSeq
    val batchRows = batch("q_events_retention")
    assert(got == batchRows,
      s"streaming retention != batch twin (got ${got.size}, want ${batchRows.size})")
    assert(got.exists(_.getLong(1) > 0L), "no cohort re-activated on a later day")
    q.stop()
  }

  test("streaming incremental dedup twin: live new docs vs a STATIC signature store") {
    import spark.implicits._
    import graft.functions.PipelineFunctions._
    // the production crawl-ingest pattern: the existing corpus's band/
    // signature table is STATIC (persisted between crawls, built by the
    // same sigWithBands the batch op uses); new docs stream in, band
    // map-side, stream-static join against the store, verify Jaccard,
    // verdict per new doc via one min_by aggregation. Band multiplicity
    // (one pair via several bands) needs NO dedup: min_by picks the same
    // (old_id, jac) regardless — one stateful op in the whole topology.
    val allDocs = graft.Tables.load(spark, sf, "documents")
    val oldBanded = graft.queries.DedupQueries
      .sigWithBands(allDocs.filter($"doc_id" % 4 =!= 0).select($"doc_id", $"text"))
      .filter(size($"hs") > 0)
      .select($"doc_id".as("old_id"), $"hs".as("old_hs"),
        explode($"bands").as("band"))
      .persist()
    val (dir, s0) = staged("documents")
    val newBanded = graft.queries.DedupQueries
      .sigWithBands(s0.filter($"doc_id" % 4 === 0).select($"doc_id", $"text"))
      .filter(size($"hs") > 0)
      .select($"doc_id".as("new_id"), $"hs".as("new_hs"),
        explode($"bands").as("band"))
    val q = drain(
      newBanded.join(oldBanded, "band")
        .select($"new_id", $"old_id",
          round(jaccard($"new_hs", $"old_hs"), 6).as("jac"))
        .filter($"jac" >= 0.5)
        .groupBy($"new_id")
        .agg(min_by(struct($"old_id", $"jac"), $"old_id").as("m"))
        .select($"new_id".as("doc_id"), $"m.old_id".as("dup_of"),
          $"m.jac".as("jac")),
      "complete", "tw_incdedup")
    val got = spark.table("tw_incdedup")
      .orderBy("doc_id").collect().toSeq
    val batchRows = graft.queries.DedupQueries
      .queries("q_dedup_incremental")(spark, sf)
      .filter($"dup_of".isNotNull).select($"doc_id", $"dup_of", $"jac")
      .collect().toSeq
    assert(got == batchRows,
      s"streaming incremental dedup != batch twin\n got=${got.take(5)}…\nwant=${batchRows.take(5)}…")
    assert(got.nonEmpty, "no cross-corpus duplicates found at all")
    q.stop()
    oldBanded.unpersist()
  }

  test("streaming incremental dedup twin over the PERSISTED SignatureStore") {
    import spark.implicits._
    import graft.functions.PipelineFunctions._
    // same topology as the static-store twin above, but the existing
    // corpus's band table is read from the on-disk SignatureStore the
    // batch pipeline commits — live stream × persisted store, the exact
    // crawl-ingest deployment shape (store written by one run, probed by
    // the next)
    val allDocs = graft.Tables.load(spark, sf, "documents")
    val storeDir = Files.createTempDirectory("graft_twin_store").toString
    graft.operators.SignatureStore.append(spark, storeDir, "corpus",
      graft.queries.DedupQueries
        .sigWithBands(allDocs.filter($"doc_id" % 4 =!= 0).select($"doc_id", $"text"))
        .select($"doc_id", $"hs", $"bands"))
    val oldBanded = graft.operators.SignatureStore.bands(spark, storeDir)
      .withColumnRenamed("doc_id", "old_id")
      .join(graft.operators.SignatureStore.sigs(spark, storeDir).get
        .select($"doc_id".as("old_id"), $"hs".as("old_hs")), "old_id")
    val (_, s0) = staged("documents")
    val newBanded = graft.queries.DedupQueries
      .sigWithBands(s0.filter($"doc_id" % 4 === 0).select($"doc_id", $"text"))
      .filter(size($"hs") > 0)
      .select($"doc_id".as("new_id"), $"hs".as("new_hs"),
        explode($"bands").as("band"))
    val q = drain(
      newBanded.join(oldBanded, "band")
        .select($"new_id", $"old_id",
          round(jaccard($"new_hs", $"old_hs"), 6).as("jac"))
        .filter($"jac" >= 0.5)
        .groupBy($"new_id")
        .agg(min_by(struct($"old_id", $"jac"), $"old_id").as("m"))
        .select($"new_id".as("doc_id"), $"m.old_id".as("dup_of"),
          $"m.jac".as("jac")),
      "complete", "tw_incdedup_store")
    val got = spark.table("tw_incdedup_store").orderBy("doc_id").collect().toSeq
    val batchRows = graft.queries.DedupQueries
      .queries("q_dedup_incremental")(spark, sf)
      .filter($"dup_of".isNotNull).select($"doc_id", $"dup_of", $"jac")
      .collect().toSeq
    assert(got == batchRows,
      s"store-backed streaming twin != batch\n got=${got.take(5)}…\nwant=${batchRows.take(5)}…")
    q.stop()
  }

  test("streaming A/B experiment twin (funnel-state conversion + live spend aggs) == oracle'd q_events_experiment") {
    import spark.implicits._
    val (dir, s) = staged("events")
    val variant = when(pmod(graft.functions.PipelineFunctions.hash32(
      concat(lit("exp1"), $"user_id".cast("string"))), lit(2L)) === 0,
      "control").otherwise("treatment")
    // conversion = the 2-step funnel (first view → purchase within 24 h):
    // the same event-time state machine the funnel twin pins, aggregated
    // per variant in COMPLETE mode so the sink holds only final counts
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val q1 = try drain(
      StreamOps.funnel(s, "user_id", "event_type", "ts",
          Seq("view", "purchase"), stepWindow = "24 hours")
        .filter($"user_id" =!= -1L)
        .withColumn("variant", variant)
        .groupBy($"variant")
        .agg(count(lit(1)).as("n_users"),
          sum(when($"reached" === 2L, 1L).otherwise(0L)).as("n_converted")),
      "complete", "tw_exp_conv")
    finally spark.conf.unset(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    val q2 = drain(
      s.filter($"event_type" === "purchase" && $"user_id" =!= -1L)
        .withColumn("variant", variant)
        .groupBy($"variant")
        .agg(sum(round($"value" * 100)).cast("long").as("purchase_cents"),
          count(lit(1)).as("n_purchases")),
      "complete", "tw_exp_spend")
    appendSentinel(dir)
    q1.processAllAvailable(); q2.processAllAvailable()
    // stitch the two live aggregates exactly like the batch final project
    val got = spark.table("tw_exp_conv")
      .join(spark.table("tw_exp_spend"), Seq("variant"), "left")
      .select($"variant", $"n_users", $"n_converted",
        round($"n_converted".cast("double") / $"n_users", 6).as("conv_rate"),
        coalesce($"purchase_cents", lit(0L)).as("purchase_cents"),
        coalesce($"n_purchases", lit(0L)).as("n_purchases"))
      .orderBy($"variant").collect().toSeq
    val batchRows = batch("q_events_experiment")
    assert(got == batchRows,
      s"streaming experiment != batch twin\n got=$got\nwant=$batchRows")
    q1.stop(); q2.stop()
  }

  test("streaming funnel twin (event-time state + timeouts) == oracle'd q_events_funnel") {
    val (dir, s) = staged("events")
    val q = drain(StreamOps.funnel(s, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), stepWindow = "24 hours"),
      "append", "tw_funnel")
    // the far-future sentinel advances the watermark past every real
    // event + deadline, firing all per-user finalization timeouts
    appendSentinel(dir)
    q.processAllAvailable()
    val got = spark.table("tw_funnel").filter(col("user_id") =!= -1L)
      .orderBy("user_id").collect().toSeq
    val batchRows = batch("q_events_funnel")
    assert(got.nonEmpty && got == batchRows,
      s"streaming funnel != batch twin (got ${got.size}, want ${batchRows.size})")
    assert(got.exists(_.getLong(4) == 3L), "no user completed the funnel")
    q.stop()
  }

  test("streaming funnel: cross-batch out-of-order step events still chain") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_funnel_ooo")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(hours: Double) =
      new java.sql.Timestamp(t0.getTime + (hours * 3600 * 1000).toLong)
    // batch 1: u1's view, plus a click OUTSIDE the 24h window (t0+30h) —
    // it also drags the watermark to t0+30h-24h = t0+6h
    Seq((1L, "view", ts(0)), (1L, "click", ts(30)))
      .toDF("user_id", "event_type", "ts")
      .write.mode("append").parquet(dir.toString)
    val s = spark.readStream
      .schema(spark.read.parquet(dir.toString).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val q = drain(StreamOps.funnel(s, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), stepWindow = "24 hours"),
      "append", "tw_funnel_ooo")
    // batch 2: an OUT-OF-ORDER click at t0+7h — earlier than batch 1's
    // click, above the current watermark (t0+6h), inside the window: the
    // buffered state must accept it as t2
    Seq((1L, "click", ts(7)))
      .toDF("user_id", "event_type", "ts")
      .write.mode("append").parquet(dir.toString)
    q.processAllAvailable()
    // batch 3: sentinel advances the watermark past every deadline
    Seq((-1L, "view", ts(100000)))
      .toDF("user_id", "event_type", "ts")
      .write.mode("append").parquet(dir.toString)
    q.processAllAvailable()
    val rows = spark.table("tw_funnel_ooo").filter($"user_id" === 1L).collect()
    assert(rows.length == 1, s"expected one funnel row, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getTimestamp(1) == ts(0), "t1 must be the view")
    assert(r.getTimestamp(2) == ts(7),
      s"t2 must be the out-of-order in-window click, got ${r.getTimestamp(2)}")
    assert(r.isNullAt(3) && r.getLong(4) == 2L)
    q.stop()
  }

  test("streaming hashed-embedding twin (stateless fold) == oracle'd q_text_embed_hash") {
    import spark.implicits._
    import graft.functions.PipelineFunctions.{tokens, hash32Chain}
    val (_, s) = staged("documents")
    val wv = (f: org.apache.spark.sql.Column) =>
      transform(sequence(lit(0), lit(63)), j =>
        pmod(hash32Chain(concat(lit("e"), j.cast("string"), lit(" "), f)),
          lit(2001L)) - 1000L)
    val zero = transform(sequence(lit(0), lit(63)), _ => lit(0L))
    val emb = aggregate(tokens($"text"), zero,
      (acc, t) => zip_with(acc, wv(t), (a, b) => a + b))
    val q = drain(
      s.select($"doc_id", posexplode(emb).as(Seq("j", "s")))
        .select($"doc_id", $"j".cast("long").as("j"), $"s"),
      "append", "tw_embed")
    val got = spark.table("tw_embed").orderBy("doc_id", "j").collect().toSeq
    val batchRows = graft.queries.TextQueries
      .queries("q_text_embed_hash")(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == batchRows,
      "streaming embed fold != hash-verified batch embeddings")
    q.stop()
  }

  test("streaming NB TRAINING twin: update-mode counts == the batch model's counts") {
    // closed-form training is a mergeable count aggregation — which means
    // the classifier trains INCREMENTALLY on a live stream with no change
    // to the formula; the final state equals the batch training counts
    // that the hash-verified model derives from
    import spark.implicits._
    import graft.functions.PipelineFunctions.{tokens, hash32Chain}
    val (_, s) = staged("documents")
    val split = pmod(hash32Chain(concat(lit("nb"), $"doc_id".cast("string"))),
      lit(100L))
    def counts(df: org.apache.spark.sql.DataFrame) = df.filter(split < 80)
      .select($"lang", explode(tokens($"text")).as("f"))
      .withColumn("b", pmod(hash32Chain($"f"), lit(256L)))
      .groupBy($"lang", $"b").agg(count(lit(1)).as("cnt"))
    val q = drain(counts(s), "update", "tw_nb_train")
    val streaming = spark.table("tw_nb_train").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val batchCounts = counts(
      graft.Tables.load(spark, sf, "documents")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streaming.nonEmpty && streaming == batchCounts,
      "incrementally trained counts != batch training counts")
    q.stop()
  }

  test("streaming NB model-serving twin (map-side scorer) == oracle'd q_quality_nb_score") {
    // "train batch, serve streaming": the model trains from the batch
    // table, the scorer is pure map-side expressions — applying it to a
    // LIVE stream needs no state, no watermark, no output-mode caveats
    val (_, s) = staged("documents")
    val batchDocs = graft.Tables.load(spark, sf, "documents")
    val q = drain(graft.queries.TextQueries.nbServeOn(batchDocs, s),
      "append", "tw_nb")
    val got = spark.table("tw_nb").orderBy("doc_id").collect().toSeq
    val batchRows = graft.queries.TextQueries
      .queries("q_quality_nb_score")(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == batchRows,
      "streaming NB serving != hash-verified batch scores")
    q.stop()
  }

  test("streaming vocabulary twin (tokenize-explode path) == oracle'd q_text_vocab tf") {
    import spark.implicits._
    import graft.functions.PipelineFunctions
    val (_, s) = staged("documents")
    val q = drain(
      s.select($"doc_id", explode(PipelineFunctions.tokens($"text")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("tf"))
        .filter($"tf" >= 10),
      "update", "twin_vocab")
    val streaming = spark.table("twin_vocab").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val batchRows = graft.queries.TextQueries.queries("q_text_vocab")(spark, sf)
      .select("tok", "tf").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streaming == batchRows, s"streaming=$streaming batch=$batchRows")
    q.stop()
  }

  test("streaming repeated-span-collapse twin == oracle'd q_text_despan") {
    import spark.implicits._
    import graft.functions.PipelineFunctions._
    val (_, s) = staged("documents")
    // q_text_despan's indexed-filter pipeline (a different HOF class than
    // the quantize twin's folds), stateless append mode
    val q = drain(
      s.select($"doc_id", tokens($"text").as("w"))
        .withColumn("kept", filter($"w", (t, i) =>
          !(i >= 1 && t === get($"w", i - 1)) &&
            !(i >= 3 && t === get($"w", i - 2) &&
              get($"w", i - 1) === get($"w", i - 3))))
        .select($"doc_id", size($"w").cast("long").as("n_before"),
          size($"kept").cast("long").as("n_after"),
          md5(array_join($"kept", " ")).as("cleaned_fp")),
      "append", "twin_despan")
    val streaming = spark.table("twin_despan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val batchRows = graft.queries.TextQueries.queries("q_text_despan")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streaming == batchRows)
    q.stop()
  }

  test("per-row SESSION cadence: final session emissions == oracle'd q_window_session, one row per input") {
    import spark.implicits._
    val (_, s) = staged("events")
    val plan = StreamOps.perRowAggsSession(
      s, Seq("user_id"),
      Seq(StreamOps.RowAgg("cnt", "count", "*"),
        StreamOps.RowAgg("sum_value", "sum", "value")),
      ts = "ts", gap = "30 minutes")
    val q = drain(plan, "update", "tw_session_perrow")
    val emitted = spark.table("tw_session_perrow").collect()
    val inputs = spark.read.parquet(s"$sf/events.parquet").count()
    // the reference's exact cadence: one emission per input row
    assert(emitted.length == inputs, s"${emitted.length} emissions for $inputs rows")
    // after a session's LAST event (event-time order within the replay),
    // its emission carries the final merged bounds + accumulators — so
    // every oracle'd batch session row must appear verbatim among the
    // emissions (projected to the batch row shape)
    // plan schema: user_id, cnt, sum_value, window_start, window_end
    val emittedSet = emitted.map(r => (r.getLong(0),
      r.getTimestamp(3), r.getLong(1),
      BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSet
    val batchRows = batch("q_window_session").map(r => (r.getLong(0),
      r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val missing = batchRows.filterNot(emittedSet.contains)
    assert(missing.isEmpty,
      s"${missing.size}/${batchRows.size} batch sessions never emitted: ${missing.take(3)}")
    q.stop()
  }

  test("streaming as-of enrichment twin == oracle'd q_join_asof") {
    import spark.implicits._
    val (dir, s) = staged("events")
    val clicks = s.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts", round($"value", 4).as("click_value"))
    val purchases = s.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", round($"value", 4).as("purchase_value"),
        $"ts".as("purchase_ts"))
    val plan = StreamOps.asofEnrich(clicks, purchases,
      "user_id", "user_id", "ts", "ts",
      Seq("purchase_value", "purchase_ts"), grace = "1 minute")
    val q = drain(plan, "append", "twin_asof")
    // far-future sentinels advance the watermark past every real event,
    // flushing all pending lefts. One per event_type: each branch filters
    // the union stream, and the global watermark is the MIN across both
    // watermark operators — a single-type sentinel would advance only one.
    locally {
      import org.apache.spark.sql.types._
      val cur = spark.read.parquet(dir.toString)
      val sentinelTs = cur.schema("ts").dataType match {
        case LongType => lit(4000000000000000000L) // ~2096 in nanos
        case t => timestamp_micros(lit(4000000000000000L)).cast(t)
      }
      Seq("click", "purchase").foreach { et =>
        cur.limit(1).withColumn("ts", sentinelTs)
          .withColumn("user_id", lit(-1L))
          .withColumn("event_type", lit(et))
          .write.mode("append").parquet(dir.toString)
      }
    }
    q.processAllAvailable()
    def key(id: Long, uid: Long, ts: java.sql.Timestamp, cv: Double,
            pv: Any, pts: Any) = (id, uid, ts, cv, pv, pts)
    val streaming = spark.table("twin_asof").collect()
      .filter(_.getLong(1) != -1L) // drop the sentinel's own emission
      .map(r => key(r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3), r.get(4), r.get(5))).toSet
    val batchRows = batch("q_join_asof")
      .map(r => key(r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3), r.get(4), r.get(5))).toSet
    assert(batchRows.nonEmpty)
    assert(streaming == batchRows,
      s"asof twin diverged: ${((streaming diff batchRows) ++
        (batchRows diff streaming)).take(3)}")
    q.stop()
  }

  test("streaming int8-quantization twin (stateless map path) == oracle'd q_embed_quantize") {
    val (_, s) = staged("embeddings")
    // the ONE shared quantize pipeline (SimilarityQueries.quantize) over a
    // live stream, stateless append mode
    val q = drain(graft.queries.SimilarityQueries.quantize(s),
      "append", "twin_quantize")
    val streaming = spark.table("twin_quantize").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3),
        r.getString(4), r.getDouble(5))).toSet
    val batchRows = graft.queries.SimilarityQueries
      .queries("q_embed_quantize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3),
        r.getString(4), r.getDouble(5))).toSet
    assert(streaming == batchRows)
    q.stop()
  }
}
