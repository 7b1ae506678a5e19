package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PipelineFunctions._

/** Corpus-curation operators — the selection half of a training-data
  * pipeline (the cleaning/dedup half lives in TextQueries/DedupQueries):
  * deterministic stratified sampling, per-group quality top-k, and
  * token-budget selection. All three are DETERMINISTIC by construction
  * (hash-based sampling, total orders with unique tiebreaks) so they
  * hash-verify against DuckDB — the property that separates reproducible
  * dataset builds from `rand()`-seeded ones no two runs agree on.
  */
object CurationQueries extends QueryPack {

  /** Shared DuckDB quality CTE fragment (the exact qualityScore formula). */
  private val qExpr =
    """round(least(len(w) / 200.0, 1.0) * 0.5
         + (len(list_distinct(w))::DOUBLE / len(w)) * 0.3
         + (1.0 - len(list_filter(w, t -> t IN ('the','a','of','and','is')))::DOUBLE / len(w)) * 0.2,
         6)"""

  /** (doc_id, lang, q) quality-scored corpus — shared by the exact and
    * scale-safe top-k-per-language twins (and the ScaleProbe rows) so score
    * arithmetic cannot drift. */
  private[graft] def scoredDocsFrom(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val w = tokens($"text")
    docs.select($"doc_id", $"lang", round(qualityScore(w), 6).as("q"))
  }

  private def scoredDocs(s: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame =
    scoredDocsFrom(Tables.load(s, dir, "documents"))

  /** DSIR importance weights + deterministic Gumbel resample key
    * (doc_id, lang, w, key) — the whole pipeline up to the final per-
    * language top-20, shared by the exact (window) and scale-safe
    * (bounded-heap) twins and the ScaleProbe rows. See q_curation_dsir for
    * the full design notes. */
  private[graft] def dsirKeyedFrom(docs0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = docs0.sparkSession
    import s.implicits._
    val bigrams = when(size($"w") >= 2,
      transform(sequence(lit(0), size($"w") - 2),
        i => concat_ws(" ", slice($"w", i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val feats = docs0
      .select($"doc_id", $"lang", tokens($"text").as("w"))
      // the n-gram explode amplifies each doc ~2·tokens×; spread docs
      // before it (at 100 TB the scan's own splits do this — one small
      // local parquet file would serialize the pass into one task)
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", $"lang", explode(concat($"w", bigrams)).as("f"))
      .withColumn("b", pmod(hash32($"f"), lit(256L)))
    // persisted (r15): docBuckets feeds TWO branches (the 256-bucket
    // histogram and the per-doc weight join) and the exchanges do not
    // canonicalize as reusable, so without the cache the tokenize +
    // bigram-explode pass — the dominant map cost — ran once per branch.
    // Bounded: ≤ docs × 256 small rows.
    val docBuckets = feats.groupBy($"doc_id", $"lang", $"b")
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val hist = docBuckets.groupBy($"b")
      .agg(sum($"cnt").as("n_raw"),
        sum(when($"lang" === "en", $"cnt").otherwise(0L)).as("n_tgt"))
    // global totals via a window over the ≤256-row histogram (tiny frame,
    // same pattern as q_curation_mix's feasibility scalar)
    val wAll = Window.partitionBy()
    val ratio = hist
      .withColumn("t_raw", sum($"n_raw").over(wAll))
      .withColumn("t_tgt", sum($"n_tgt").over(wAll))
      .select($"b", round(
        log(($"n_tgt" + 1).cast("double") / ($"t_tgt" + 256)) -
          log(($"n_raw" + 1).cast("double") / ($"t_raw" + 256)), 7)
        .cast("decimal(20,7)").as("lr"))
    // w = the exact decimal sum cast to double, NOT rounded: wdec carries
    // exactly 7 fractional digits, so a cosmetic round(·, 6) lands on
    // decimal half-way points where Spark (shortest-repr HALF_UP via
    // BigDecimal) and DuckDB (binary-double rounding) legitimately
    // disagree — the sf1 sidecar caught ~1% of rows flipping at 10× rows
    // (r14). Both engines convert the same exact decimal to the same
    // nearest double, so the unrounded value compares bit-identically.
    val weights = docBuckets.join(broadcast(ratio), "b")
      .groupBy($"doc_id", $"lang")
      .agg(sum($"cnt".cast("decimal(12,0)") * $"lr").as("wdec"))
      .select($"doc_id", $"lang", $"wdec".cast("double").as("w"))
    // deterministic Gumbel draw g = -ln(-ln(u)) from an independent hash
    // stream ("dsir" prefix), u offset to (0,1) open interval
    val u = (pmod(hash32(concat(lit("dsir"), $"doc_id".cast("string"))),
      lit(1000000L)).cast("double") + 0.5) / 1e6
    weights.withColumn("key", $"w" + round(-log(-log(u)), 6))
  }

  private def dsirKeyed(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame =
    dsirKeyedFrom(Tables.load(s, dir, "documents"))

  override def queries: Map[String, Q] = Map(
    // Deterministic stratified sampling: keep a doc iff a stable hash of
    // its id falls under the language's rate — reproducible downsampling
    // (the md5-derived hash32 used across the pipeline), map-side only,
    // zero shuffle: the filter pushes to the scan and at 100 TB this is
    // pure embarrassing parallelism. rand()-based sampling could never
    // hash-verify — determinism IS the operator here.
    "q_curation_sample" -> ((s, dir) => {
      import s.implicits._
      val bucket = pmod(hash32($"doc_id".cast("string")), lit(100L))
      val rate = when($"lang" === "en", 30L).otherwise(10L)
      Tables.load(s, dir, "documents")
        .filter(bucket < rate)
        .select($"doc_id", $"lang", size(tokens($"text")).cast("long").as("n_tokens"))
        .orderBy($"doc_id")
    }),

    // Per-language quality top-k: the "best N docs per bucket" curation
    // primitive. row_number over (lang | q DESC, doc_id) — rounded quality
    // + unique id tiebreak = total order, so ranks are reproducible. One
    // shuffle on lang; rank truncation happens inside the window exec, so
    // only k rows per group survive to the output.
    "q_curation_topk_group" -> ((s, dir) => {
      import s.implicits._
      val win = Window.partitionBy($"lang").orderBy($"q".desc, $"doc_id")
      scoredDocs(s, dir)
        .withColumn("rk", row_number().over(win).cast("long"))
        .filter($"rk" <= 3)
        .orderBy($"lang", $"rk")
    }),

    // SCALE-SAFE per-language top-k (same oracle as q_curation_topk_group):
    // the window form above sorts one language's ENTIRE corpus in a single
    // task; here the bounded-heap TopKRowsAgg partial-aggregates map-side —
    // each partition reduces to ≤ k rows per language before the shuffle,
    // so the exchange carries O(partitions·k) rows and no per-group total
    // sort exists anywhere. Rank = position in the aggregator's ordered
    // output (the identical (q DESC, doc_id) total order), so rows AND
    // ranks hash-match the exact form bit-for-bit.
    "q_curation_topk_group_scalable" -> ((s, dir) => {
      import s.implicits._
      scoredDocs(s, dir)
        .groupBy($"lang")
        .agg(graft.operators.TopK.topkRows($"q", $"doc_id", $"q", 3).as("top"))
        .select($"lang", posexplode($"top"))
        .select($"col.id".as("doc_id"), $"lang", $"col.v".as("q"),
          ($"pos" + 1).cast("long").as("rk"))
        .orderBy($"lang", $"rk")
    }),

    // Token-budget selection: per language, admit docs in quality order
    // until the running token total exceeds the budget — "assemble a 10k-
    // token training mix per language, best docs first". Running-sum window
    // over the same total order. At 100 TB an exact per-group global order
    // is a big sort; that is the semantics' price — the scale variant
    // (approximate quantile cutoff via percentile_approx, then one filter)
    // trades exactness for a single pass and is what you'd run first.
    "q_curation_token_budget" -> ((s, dir) => {
      import s.implicits._
      val w = tokens($"text")
      val order = Window.partitionBy($"lang").orderBy($"q".desc, $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang", size(tokens($"text")).cast("long").as("n_tokens"),
          round(qualityScore(w), 6).as("q"))
        .withColumn("cum_tokens", sum($"n_tokens").over(order))
        .filter($"cum_tokens" <= 10000)
        .select($"doc_id", $"lang", $"n_tokens", $"cum_tokens")
        .orderBy($"doc_id")
    }),

    // SCALE-SAFE token-budget selection (the form you'd run at 100 TB
    // first): instead of an exact running sum over a per-language total
    // order (one un-splittable sort task per language at scale), quantize
    // quality into 100 integer bins and find the admission cutoff from a
    // per-(lang,bin) token histogram — a map-side partial agg whose shuffle
    // is |langs|·101 rows, a window over that tiny frame, and one broadcast-
    // joined filter pass. Histogram-quantile rather than percentile_approx:
    // the GK sketch's merge is partition-order-dependent and DuckDB can't
    // replicate it bit-for-bit, while integer binning is deterministic and
    // hash-verifiable in both engines. Error bound: admitted token mass
    // overshoots the budget by at most the boundary bin's mass (the bin
    // whose strictly-higher bins are still under budget is admitted whole).
    "q_curation_token_budget_approx" -> ((s, dir) => {
      import s.implicits._
      val w = tokens($"text")
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang",
          size(tokens($"text")).cast("long").as("n_tokens"),
          floor(round(qualityScore(w), 6) * 100).cast("long").as("qbin"))
      val hist = docs.groupBy($"lang", $"qbin")
        .agg(sum($"n_tokens").as("bin_tokens"))
      val desc = Window.partitionBy($"lang").orderBy($"qbin".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cut = hist
        .withColumn("cum_above", sum($"bin_tokens").over(desc) - $"bin_tokens")
        .filter($"cum_above" < 10000)
        .groupBy($"lang").agg(min($"qbin").as("cut_bin"))
      docs.join(broadcast(cut), "lang")
        .filter($"qbin" >= $"cut_bin")
        .select($"doc_id", $"lang", $"n_tokens", $"qbin")
        .orderBy($"doc_id")
    }),

    // Quality-WEIGHTED sampling: keep a doc with probability equal to its
    // quality score — deterministic Bernoulli via the stable id hash
    // (bucket/1000 < floor(q·1000)), so high-quality docs survive
    // proportionally more often and the draw is reproducible. Map-side
    // only, zero shuffle — the 100 TB shape of importance sampling.
    "q_curation_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      val w = tokens($"text")
      val bucket = pmod(hash32($"doc_id".cast("string")), lit(1000L))
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang", round(qualityScore(w), 6).as("q"),
          bucket.as("bucket"))
        .filter($"bucket" < floor($"q" * 1000).cast("long"))
        .select($"doc_id", $"lang", $"q")
        .orderBy($"doc_id")
    }),

    // Domain-MIXTURE sampling: downsample each language to target mixture
    // weights — "40% en, 15% each of the rest" — taking the LARGEST corpus
    // that matches the target proportions without upsampling any group:
    // feasible total T = min_g(n_g / w_g), per-group keep probability
    // p_g = w_g·T / n_g, applied as the deterministic id-hash Bernoulli.
    // Relational end to end, TWO corpus passes (inherent: group counts
    // must exist before any keep decision): pass 1 is the counts agg, with
    // T derived in-frame by a global window over the |langs|-row agg output
    // (one task over a handful of rows — NOT over the corpus; this replaces
    // an earlier persist() that leaked a cache entry per invocation in
    // long-lived sessions); pass 2 is the keep filter, map-side against the
    // broadcast rates. Never a collect.
    "q_curation_mix" -> ((s, dir) => {
      import s.implicits._
      val wgt = when($"lang" === "en", 0.40).otherwise(0.15)
      val docs = Tables.load(s, dir, "documents")
      val counts = docs.groupBy($"lang")
        .agg(count(lit(1)).as("n_avail")).withColumn("w", wgt)
      val rated = counts
        .withColumn("t", min($"n_avail" / $"w").over(Window.partitionBy()))
        .withColumn("p", least(lit(1.0), $"w" * $"t" / $"n_avail"))
        .select($"lang", $"n_avail", $"p")
      val bucket = pmod(hash32($"doc_id".cast("string")), lit(1000000L))
      docs.join(broadcast(rated), "lang")
        .filter(bucket < floor($"p" * 1e6).cast("long"))
        .groupBy($"lang").agg(count(lit(1)).as("n_kept"),
          first($"n_avail").as("n_avail"), round(first($"p"), 6).as("keep_p"))
        .select($"lang", $"n_avail", $"n_kept", $"keep_p")
        .orderBy($"lang")
    }),

    // Deterministic train/val/test SPLIT assignment (98/1/1): the split a
    // doc lands in is a pure function of its id (an independent hash
    // stream — note the "split" prefix — so membership is uncorrelated
    // with the sampling draws), which is what makes splits reproducible,
    // disjoint by construction, and stable under corpus growth: adding
    // docs never moves an existing doc across splits. Map-side, zero
    // shuffle.
    "q_curation_split" -> ((s, dir) => {
      import s.implicits._
      val b = pmod(hash32(concat(lit("split"), $"doc_id".cast("string"))),
        lit(100L))
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang",
          when(b < 98, "train").when(b < 99, "val").otherwise("test")
            .as("split"))
        .orderBy($"doc_id")
    }),

    // Corpus VERSION DIFF — the dataset-versioning primitive: which docs
    // were added, removed, or content-changed between corpus snapshots
    // (v2 is derived deterministically here: every 97th doc dropped, every
    // 31st edited, every 13th re-added under a new id). Content compare is
    // by hash (never raw text at the join), the full-outer join hash-
    // partitions on doc_id, and "same" rows — the overwhelming mass at
    // 100 TB — are filtered before any downstream stage. Synthetic re-add
    // ids are NEGATIVE (-id-1): collision-free with any real non-negative
    // id at any corpus size, and the re-add branch reuses v1's hashes —
    // two corpus scans total (v1, and v2's edited-text hashes).
    "q_curation_diff" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
      val v1 = d.select($"doc_id", md5($"text").as("h1"))
      val v2 = d.filter($"doc_id" % 97 =!= 0)
        .select($"doc_id", md5(when($"doc_id" % 31 === 0,
          concat($"text", lit(" edited"))).otherwise($"text")).as("h2"))
        .unionAll(v1.filter($"doc_id" % 13 === 0)
          .select((-$"doc_id" - 1).as("doc_id"), $"h1".as("h2")))
      v1.join(v2, Seq("doc_id"), "full")
        .select($"doc_id",
          when($"h1".isNull, "added").when($"h2".isNull, "removed")
            .when($"h1" =!= $"h2", "changed").otherwise("same").as("change"))
        .filter($"change" =!= "same")
        .orderBy($"doc_id")
    }),

    // Deterministic training-order SHARDING: every epoch pipeline needs a
    // reproducible global shuffle of the corpus into N output shards. A
    // true global sort at 100 TB is one giant range exchange; instead the
    // doc's stable hash picks the shard (map-side) and an independent
    // order-hash gives the within-shard position — partition-parallel
    // row_number per shard, shuffle is O(corpus) with no global order
    // anywhere. This is exactly repartition-by-key + sortWithinPartitions.
    "q_curation_shard" -> ((s, dir) => {
      import s.implicits._
      val shard = pmod(hash32($"doc_id".cast("string")), lit(16L))
      val ord = hash32(concat(lit("ord"), $"doc_id".cast("string")))
      val win = Window.partitionBy($"shard").orderBy($"ord", $"doc_id")
      Tables.load(s, dir, "documents")
        .select($"doc_id", shard.as("shard"), ord.as("ord"))
        .withColumn("pos", row_number().over(win).cast("long"))
        .select($"doc_id", $"shard", $"pos")
        .orderBy($"shard", $"pos")
    }),

    // SCALE-SAFE sharding: q_curation_shard's per-shard row_number is one
    // sort task per shard (6 TB each at 100 TB / 16 shards). Here the
    // within-shard order is redefined as (sub, ord, doc_id) where sub is an
    // independent hash sub-bucket — still a pure deterministic function of
    // the doc id, still a total order, but now ranks are computed per
    // (shard, sub) partition (16·8 = 128 parallel small sorts; at 100 TB
    // you'd raise SUBS into the thousands) and stitched to global per-shard
    // positions RELATIONALLY: offset(shard, sub) = token count of all lower
    // subs in the shard, from a |shards|·|subs|-row count frame windowed
    // per shard and broadcast back. No single-task sort anywhere.
    "q_curation_shard_scalable" -> ((s, dir) => {
      import s.implicits._
      val SUBS = 8L
      val rows = Tables.load(s, dir, "documents")
        .select($"doc_id",
          pmod(hash32($"doc_id".cast("string")), lit(16L)).as("shard"),
          pmod(hash32(concat(lit("sub"), $"doc_id".cast("string"))),
            lit(SUBS)).as("sub"),
          hash32(concat(lit("ord"), $"doc_id".cast("string"))).as("ord"))
      val counts = rows.groupBy($"shard", $"sub").agg(count(lit(1)).as("n"))
      val perShard = Window.partitionBy($"shard").orderBy($"sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = counts
        .withColumn("off", sum($"n").over(perShard) - $"n")
        .select($"shard", $"sub", $"off")
      val sub = Window.partitionBy($"shard", $"sub").orderBy($"ord", $"doc_id")
      rows
        .withColumn("rk", row_number().over(sub).cast("long"))
        .join(broadcast(offsets), Seq("shard", "sub"))
        .select($"doc_id", $"shard", ($"off" + $"rk").as("pos"))
        .orderBy($"shard", $"pos")
    }),

    // KEEP-BEST-IN-CLUSTER — the production dedup DECISION: near-dup
    // clusters (the same CC + election pipeline as q_dedup_clusters) keep
    // their highest-QUALITY member, not the lowest id — "of these N
    // near-copies, train on the best one". Argmax is a mergeable
    // min(struct(-q, doc_id)) (best quality, then smallest id) — no
    // per-cluster sort; clusters are tiny, the shuffle is per-cluster keys.
    "q_curation_keep_best" -> ((s, dir) => {
      import s.implicits._
      val members = DedupQueries.clusterMembers(s, dir)
      val q = scoredDocs(s, dir).select($"doc_id", $"q")
      members.join(q, "doc_id")
        .groupBy($"canonical_id")
        .agg(min(struct((-$"q").as("nq"), $"doc_id")).as("best"),
          count(lit(1)).as("cluster_size"))
        .select($"canonical_id", $"best.doc_id".as("keep_id"),
          round(-$"best.nq", 6).as("q"), $"cluster_size")
        .orderBy($"canonical_id")
    }),

    // DSIR-shape importance resampling (Xie et al. 2023, public): select
    // raw docs whose hashed-n-gram profile looks like a target domain.
    // Features are the unigram+bigram MULTISET hashed into 256 buckets
    // (the same md5-derived hash32 as every other deterministic draw);
    // the target distribution is the corpus' own lang='en' slice, the raw
    // distribution is everything. Per-doc log importance weight
    // w = Σ_b cnt_doc[b]·ln(p_tgt[b]/p_raw[b]) with add-1 smoothing, and
    // the resample is per-language Gumbel-top-k: perturb w with a
    // deterministic hash-derived Gumbel draw and keep the top 20 per
    // language — the standard without-replacement softmax sample, made
    // reproducible. Scale shape: bucket histograms are a 256-key map-side
    // partial agg; the 256-row log-ratio table broadcasts back onto
    // per-(doc,bucket) counts (one shuffle keyed by doc); the per-doc sum
    // is DECIMAL-exact over round(7) ratios, so partial-agg order can
    // never perturb a weight; the only window runs per language, the same
    // accepted shape as q_curation_topk_group.
    "q_curation_dsir" -> ((s, dir) => {
      import s.implicits._
      val win = Window.partitionBy($"lang").orderBy($"key".desc, $"doc_id")
      dsirKeyed(s, dir)
        .withColumn("rk", row_number().over(win).cast("long"))
        .filter($"rk" <= 20)
        .select($"doc_id", $"lang", $"w", $"rk")
        .orderBy($"lang", $"rk")
    }),

    // SCALE-SAFE DSIR resample (same oracle as q_curation_dsir): the
    // Gumbel-top-20 per language via the bounded-heap TopKRowsAgg instead
    // of a per-language row_number window — the window form funnels each
    // language's whole weighted corpus through one sort task, the heap
    // partial-aggregates to ≤ 20 rows per partition before the shuffle.
    // Keys are the same round(6) doubles, so the selected docs and ranks
    // hash-match the exact form; the carried payload v is the unperturbed
    // weight w the output reports.
    "q_curation_dsir_scalable" -> ((s, dir) => {
      import s.implicits._
      dsirKeyed(s, dir)
        .groupBy($"lang")
        .agg(graft.operators.TopK.topkRows($"key", $"doc_id", $"w", 20).as("top"))
        .select($"lang", posexplode($"top"))
        .select($"col.id".as("doc_id"), $"lang", $"col.v".as("w"),
          ($"pos" + 1).cast("long").as("rk"))
        .orderBy($"lang", $"rk")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_curation_sample" ->
      """SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tokens
         FROM documents
         WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100
               < CASE WHEN lang = 'en' THEN 30 ELSE 10 END
         ORDER BY doc_id""",
    // reuses DedupQueries' recursive cluster CTE (cc + the shCte `d` frame
    // the quality formula reads)
    "q_curation_keep_best" ->
      s"""${DedupQueries.clusterCte},
         qd AS (SELECT doc_id, $qExpr AS q FROM d),
         best AS (SELECT canonical_id, doc_id, q,
             row_number() OVER (PARTITION BY canonical_id
               ORDER BY q DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY canonical_id) AS cluster_size
           FROM cc JOIN qd USING (doc_id))
         SELECT canonical_id, doc_id AS keep_id, q, cluster_size
         FROM best WHERE rk = 1 ORDER BY canonical_id""",
    "q_curation_topk_group" -> topkGroupOracleSql,
    // the bounded-heap twin selects the identical rows/ranks — same oracle
    "q_curation_topk_group_scalable" -> topkGroupOracleSql,
    "q_curation_token_budget" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
          q AS (SELECT doc_id, lang, len(w)::BIGINT AS n_tokens, $qExpr AS q FROM d),
          c AS (SELECT doc_id, lang, n_tokens,
                  sum(n_tokens) OVER (PARTITION BY lang ORDER BY q DESC, doc_id
                    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
                FROM q)
          SELECT doc_id, lang, n_tokens, cum_tokens FROM c
          WHERE cum_tokens <= 10000 ORDER BY doc_id""",
    "q_curation_token_budget_approx" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
          q AS (SELECT doc_id, lang, len(w)::BIGINT AS n_tokens,
                  CAST(floor($qExpr * 100) AS BIGINT) AS qbin FROM d),
          h AS (SELECT lang, qbin, sum(n_tokens) AS bin_tokens
                FROM q GROUP BY lang, qbin),
          c AS (SELECT lang, qbin,
                  sum(bin_tokens) OVER (PARTITION BY lang ORDER BY qbin DESC
                    ROWS UNBOUNDED PRECEDING) - bin_tokens AS cum_above
                FROM h),
          cut AS (SELECT lang, min(qbin) AS cut_bin
                  FROM c WHERE cum_above < 10000 GROUP BY lang)
          SELECT doc_id, lang, n_tokens, qbin FROM q JOIN cut USING (lang)
          WHERE qbin >= cut_bin ORDER BY doc_id""",
    "q_curation_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
          q AS (SELECT doc_id, lang, $qExpr AS q FROM d)
          SELECT doc_id, lang, q FROM q
          WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000
                < CAST(floor(q * 1000) AS BIGINT)
          ORDER BY doc_id""",
    "q_curation_mix" ->
      """WITH counts AS (
           SELECT lang, count(*) AS n_avail,
                  CASE WHEN lang = 'en' THEN 0.40::DOUBLE
                       ELSE 0.15::DOUBLE END AS w
           FROM documents GROUP BY lang),
         feas AS (SELECT min(n_avail / w) AS t FROM counts),
         rated AS (SELECT lang, n_avail,
                     least(1.0::DOUBLE, w * t / n_avail) AS p
                   FROM counts CROSS JOIN feas),
         kept AS (SELECT d.lang, count(*) AS n_kept
                  FROM documents d JOIN rated r USING (lang)
                  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
                          % 1000000
                        < CAST(floor(p * 1e6) AS BIGINT)
                  GROUP BY d.lang)
         SELECT lang, n_avail, n_kept, round(p::DOUBLE, 6) AS keep_p
         FROM rated JOIN kept USING (lang)
         ORDER BY lang""",
    "q_curation_split" ->
      """SELECT doc_id, lang,
           CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val'
                ELSE 'test' END AS split
         FROM (SELECT doc_id, lang,
                 ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8))::BIGINT
                   % 100 AS b
               FROM documents)
         ORDER BY doc_id""",
    "q_curation_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
         v2 AS (
           SELECT doc_id,
             md5(CASE WHEN doc_id % 31 = 0 THEN text || ' edited'
                 ELSE text END) AS h2
           FROM documents WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT -doc_id - 1, md5(text) FROM documents
           WHERE doc_id % 13 = 0),
         j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
                 CASE WHEN v1.h1 IS NULL THEN 'added'
                      WHEN v2.h2 IS NULL THEN 'removed'
                      WHEN v1.h1 <> v2.h2 THEN 'changed'
                      ELSE 'same' END AS change
               FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id)
         SELECT doc_id, change FROM j WHERE change <> 'same'
         ORDER BY doc_id""",
    "q_curation_shard" ->
      """WITH s AS (SELECT doc_id,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 16 AS shard,
           ('0x' || substr(md5('ord' || doc_id::VARCHAR), 1, 8))::BIGINT AS ord
         FROM documents)
         SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS pos
         FROM s ORDER BY shard, pos""",
    "q_curation_shard_scalable" ->
      """WITH s AS (SELECT doc_id,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 16 AS shard,
           ('0x' || substr(md5('sub' || doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS sub,
           ('0x' || substr(md5('ord' || doc_id::VARCHAR), 1, 8))::BIGINT AS ord
         FROM documents)
         SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY sub, ord, doc_id) AS pos
         FROM s ORDER BY shard, pos""",
    // DSIR replica: identical features (unigrams + bigrams, multiset),
    // identical md5 bucket hash, add-1 smoothing, round(7) log-ratios
    // summed DECIMAL-exact, and the same hash-Gumbel per-language top-20.
    "q_curation_dsir" -> dsirOracleSql,
    // the bounded-heap twin selects the identical rows/ranks — same oracle
    "q_curation_dsir_scalable" -> dsirOracleSql
  )

  private val topkGroupOracleSql: String =
    s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
        q AS (SELECT doc_id, lang, $qExpr AS q FROM d),
        r AS (SELECT doc_id, lang, q,
                row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS rk
              FROM q)
        SELECT doc_id, lang, q, rk FROM r WHERE rk <= 3 ORDER BY lang, rk"""

  private val dsirOracleSql: String =
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
         f AS (SELECT doc_id, lang,
                 unnest(list_concat(w,
                   list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS f
               FROM d),
         db AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(f), 1, 8))::BIGINT % 256 AS b,
                  count(*) AS cnt
                FROM f GROUP BY doc_id, lang, b),
         h AS (SELECT b, sum(cnt)::BIGINT AS n_raw,
                 sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END)::BIGINT AS n_tgt
               FROM db GROUP BY b),
         r AS (SELECT b,
                 round(ln((n_tgt + 1)::DOUBLE / (t_tgt + 256))
                     - ln((n_raw + 1)::DOUBLE / (t_raw + 256)), 7)::DECIMAL(20,7) AS lr
               FROM (SELECT b, n_raw, n_tgt,
                       sum(n_raw) OVER () AS t_raw,
                       sum(n_tgt) OVER () AS t_tgt FROM h)),
         wt AS (SELECT doc_id, lang,
                  sum(cnt::DECIMAL(12,0) * lr)::DOUBLE AS w
                FROM db JOIN r USING (b) GROUP BY doc_id, lang),
         res AS (SELECT doc_id, lang, w,
                   row_number() OVER (PARTITION BY lang ORDER BY
                     w + round(-ln(-ln(
                       ((('0x' || substr(md5('dsir' || doc_id::VARCHAR), 1, 8))::BIGINT
                         % 1000000) + 0.5) / 1e6)), 6) DESC,
                     doc_id) AS rk
                 FROM wt)
         SELECT doc_id, lang, w, rk FROM res WHERE rk <= 20
         ORDER BY lang, rk"""
}
