package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PipelineFunctions._

/** Deduplication operators for a pretraining-data pipeline over `documents`:
  * exact (content-hash groupBy), MinHash+LSH banding, SimHash Hamming
  * neighborhoods, and exact n-gram Jaccard as the ground truth.
  *
  * Scale design (the point of each shape at 100 TB):
  *   - exact: one shuffle on a 128-bit content hash; the texts themselves
  *     never move, only (hash, id) pairs.
  *   - MinHash+LSH: signatures are computed map-side (one pass per doc);
  *     candidate generation shuffles only (band-key, id, signature) — the
  *     classic way to avoid the O(n²) pairwise join. Verification re-joins
  *     text for candidates only (a tiny fraction of the corpus).
  *   - SimHash: one 16-bit integer per doc; near-dup = small Hamming
  *     distance, found by joining on signature buckets.
  */
object DedupQueries extends QueryPack {

  /** doc_id + distinct 3-shingle hashes, built from per-word hashes combined
    * arithmetically — no shingle strings are ever constructed. One native
    * codegen pass (PipelineFunctions.shingles3): the HOF chain re-evaluated
    * the word-hash transform at every element access once CollapseProject
    * inlined it — O(words²) md5 digests per doc per plan node. At 100 TB
    * this map-side stage is the dominant cost of LSH dedup. */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // md5 word-hash shingling is the dominant map-side cost of LSH dedup
    // (see the header note); spread docs BEFORE it — the local parquet
    // reads as ONE split, which would serialize the whole pass into one
    // task (r15; the same pattern q_curation_dsir/q_quality_perplexity
    // already use). At 100 TB the scan's own splits provide this for free.
    Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .withColumn("hs", shingles3(tokens($"text")))
      .select($"doc_id", $"hs")
  }

  /** Decorrelated bounded slice of the documents table (r14 VERDICT #6):
    * keep docs whose BASE id (doc_id mod 1e7 — SynthSf1's replica offset)
    * is < `keep`, and suffix every token with the doc's replica index
    * (`_u<r>`, r = doc_id div 1e7 — the SimhashDiag `unrelated`
    * construction). At the driver SFs every doc_id < 1e7, so r = 0 and
    * this is a uniform token suffix (dup structure identical to the raw
    * corpus — the sf0.01 gate row is as meaningful as the original
    * anchor); at the synthesized sf1 the 10 replicas of one base doc
    * share NO tokens, so the brute-force anchors' true-pair output stays
    * linear in the base corpus instead of inheriting the replica
    * corpus's quadratic dup structure, and the bounded slice keeps the
    * all-pairs compute inside both engines' budgets. */
  private def decorrelatedDocs(s: SparkSession, dir: String,
                               keep: Long): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .filter(pmod($"doc_id", lit(10000000L)) < keep)
      .select($"doc_id",
        concat_ws(" ", transform(split($"text", " "),
          w => concat(w, lit("_u"),
            ($"doc_id" / lit(10000000L)).cast("long")))).as("text"))
  }

  /** The SQL twin of [[decorrelatedDocs]] (a CTE named `dcd`). */
  private def dcdCte(keep: Long): String =
    s"""dcd AS (SELECT doc_id,
       array_to_string(list_transform(string_split(text, ' '),
         x -> x || '_u' || (doc_id // 10000000)::VARCHAR), ' ') AS text
       FROM documents WHERE doc_id % 10000000 < $keep)"""

  /** The verified near-dup pairs of the md5 MinHash+LSH pipeline:
    * 4 bands × 2 rows → candidate id pairs → exact Jaccard ≥ 0.5 on
    * candidates only. Scale shape: the banded self-join and the candidate
    * dedup shuffle BARE (band, id) / (d1, d2) tuples — shingle-hash arrays
    * are re-joined only for the few surviving candidates, and Jaccard
    * compares int arrays, not strings. */
  private def lshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lshCandJaccards(s, dir).filter($"jac" >= 0.5)
  }

  /** Candidate pairs + exact Jaccard BEFORE the 0.5 keep-threshold — the
    * threshold-tuning surface (q_dedup_jaccard_hist) and the verified-pair
    * input (lshPairs) share one pipeline. */
  private def lshCandJaccards(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the signature relation feeds three plan branches (banding + both
    // sides of the verify join); persist it so the md5 shingling runs
    // once — the batch analogue of materializing a signature table
    val sig = shingled(s, dir).select($"doc_id", $"hs",
      array((0 until 4).map(b =>
        concat_ws("_", lit(b), minhash($"hs", 2 * b), minhash($"hs", 2 * b + 1))): _*)
        .as("bands"))
      .persist()
    // Degenerate-doc skew guard: docs under 3 words have an EMPTY shingle
    // set, so minhash returns the sentinel P for every permutation and all
    // of them would share identical band keys in all bands — a quadratic
    // candidate blowup on a 100 TB corpus with billions of near-empty
    // docs. They can't be near-dups by shingle definition (Jaccard is
    // 0/0 = NULL), so exclude them before banding. Mirrored in the SQL
    // frontend and the DuckDB oracle.
    val banded = sig.filter(size($"hs") > 0)
      .select($"doc_id", explode($"bands").as("band"))
    val cand = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    val hs = sig.select($"doc_id", $"hs")
    cand
      .join(hs.as("h1"), $"d1" === $"h1.doc_id")
      .join(hs.as("h2"), $"d2" === $"h2.doc_id")
      .select($"d1", $"d2", round(jaccard($"h1.hs", $"h2.hs"), 6).as("jac"))
  }

  override def queries: Map[String, Q] = Map(
    // Exact dedup: corpus with planted duplicates (every 3rd doc re-appears)
    // → group by md5(text), keep the smallest id as canonical.
    "q_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
      val corpus = d.unionAll(d.filter($"doc_id" % 3 === 0))
      corpus
        .groupBy(md5($"text").as("h"))
        .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
        .select($"canonical_id", $"n_copies")
        .orderBy($"canonical_id")
    }),

    // MinHash signatures (8 permutations over 3-shingles) — the map-side
    // primitive of LSH dedup, verified value-exactly against the oracle.
    "q_minhash_signatures" -> ((s, dir) => {
      import s.implicits._
      shingled(s, dir)
        .select($"doc_id" +: MinhashPerms.indices.map(i =>
          minhash($"hs", i).as(s"m$i")): _*)
        .orderBy($"doc_id")
    }),

    // Full MinHash+LSH near-dup pipeline: 4 bands × 2 rows → candidate id
    // pairs → exact Jaccard ≥ 0.5 on candidates only. Scale shape: the
    // banded self-join and the candidate dedup shuffle BARE (band, id) /
    // (d1, d2) tuples — shingle-hash arrays are re-joined only for the few
    // surviving candidates, and Jaccard compares int arrays, not strings.
    "q_dedup_minhash_lsh" -> ((s, dir) => lshPairs(s, dir).orderBy("d1", "d2")),

    // Jaccard HISTOGRAM over the LSH candidate pairs (pre-threshold) —
    // the threshold-tuning diagnostic: how many candidate pairs land in
    // each 0.1-wide similarity bin, i.e. what a 0.4 vs 0.5 vs 0.6 cutoff
    // would keep. Same pipeline as the verified pairs, one extra tiny
    // aggregation — candidates only, never all pairs.
    "q_dedup_jaccard_hist" -> ((s, dir) => {
      import s.implicits._
      lshCandJaccards(s, dir)
        .groupBy(floor($"jac" * 10).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"bin")
    }),

    // Benchmark DECONTAMINATION: find training docs whose 3-shingle sets
    // overlap a held-out test set (every 50th doc here) above 20% — the
    // contamination check every training-data pipeline runs before a
    // model sees the corpus. Shape: inverted-index join on shingle hash
    // (shuffle by shingle; the benchmark side is small → broadcast at
    // scale), group by pair, count overlap — never an n² doc comparison.
    "q_dedup_contamination" -> ((s, dir) => {
      import s.implicits._
      val sh = shingled(s, dir)
      val test = sh.filter($"doc_id" % 50 === 0)
        .select($"doc_id".as("test_id"), explode($"hs").as("h"))
      val train = sh.filter($"doc_id" % 50 =!= 0)
        .select($"doc_id".as("train_id"), size($"hs").as("n"), explode($"hs").as("h"))
      train.join(test, "h")
        .groupBy($"train_id", $"test_id", $"n")
        .agg(count(lit(1)).as("overlap"))
        .filter($"overlap" * 5 >= $"n") // ≥ 20% of the train doc's shingles
        .select($"train_id", $"test_id", $"overlap")
        .orderBy($"train_id", $"test_id")
    }),

    // Cross-document REPEATED n-GRAM detection — the duplicated-substring
    // signal of training-data dedup (Lee et al., "Deduplicating Training
    // Data Makes Language Models Better") at 3-shingle granularity: which
    // shingles recur across >= 3 distinct docs. Scale shape: ONE shuffle
    // keyed by shingle hash with map-side partial counts (hs is distinct
    // per doc, so count(*) IS the doc frequency); no doc×doc comparison
    // anywhere. At 100 TB this is the word-count shape over ~tokens rows.
    "q_dedup_hot_ngrams" -> ((s, dir) => {
      import s.implicits._
      shingled(s, dir).select(explode($"hs").as("h"))
        .groupBy($"h").agg(count(lit(1)).as("ndocs"))
        .filter($"ndocs" >= 3)
        .orderBy($"ndocs".desc, $"h")
    }),

    // Cross-document DUPLICATED-SPAN REMOVAL — the acting half of Lee et
    // al.'s substring dedup (q_dedup_hot_ngrams detects, this REMOVES):
    // every token covered by a 5-gram that recurs in >= 3 distinct docs is
    // cut from the document. Two shared boilerplate spans are injected
    // deterministically (head on doc_id%5, tail on doc_id%3 — the same
    // inject-then-operate pattern as PII/paragraph dedup) so the operator
    // has real cross-doc targets, and the output fingerprints the cleaned
    // token stream. Scale shape: the occurrence→hot join keys on gram
    // hash (the hot side shrinks to the >= 3 survivors — broadcastable);
    // covered positions aggregate per doc with collect_set bounded by doc
    // length; the final cut is a per-row indexed filter, map-side.
    "q_dedup_span_removal" -> ((s, dir) =>
      spanRemovalFrom(Tables.load(s, dir, "documents"))),

    // Per-doc BOILERPLATE ratio: how much of each doc is corpus-hot
    // shingles (the actionable per-doc form of q_dedup_hot_ngrams — docs
    // dominated by repeated spans are template/boilerplate candidates).
    // The hot set is tiny after the >= 3 filter → broadcast back against
    // the exploded corpus; output kept integral (nsh, nhot) so the gate
    // hashes exactly.
    "q_dedup_boilerplate_ratio" -> ((s, dir) => {
      import s.implicits._
      val sh = shingled(s, dir)
      val hot = sh.select(explode($"hs").as("h"))
        .groupBy($"h").agg(count(lit(1)).as("ndocs"))
        .filter($"ndocs" >= 3).select($"h")
      val hotCounts = sh.select($"doc_id", explode($"hs").as("h"))
        .join(broadcast(hot), "h")
        .groupBy($"doc_id").agg(count(lit(1)).as("nhot"))
      sh.select($"doc_id", size($"hs").cast("long").as("nsh"))
        .join(hotCounts, Seq("doc_id"), "left")
        .select($"doc_id", $"nsh", coalesce($"nhot", lit(0L)).as("nhot"))
        .orderBy($"doc_id")
    }),

    // LSH candidates verified by EDIT DISTANCE instead of Jaccard:
    // dist ≤ 20% of the longer text (dist*5 ≤ max_len — integer form, no
    // float threshold). The expensive O(len²) Levenshtein kernel runs on
    // CANDIDATE PAIRS ONLY (the banded join prunes the n² pair space), the
    // shape that keeps fuzzy dedup feasible at 100 TB.
    "q_dedup_lsh_editdist" -> ((s, dir) => {
      import s.implicits._
      val sig = shingled(s, dir).select($"doc_id",
          array((0 until 4).map(b =>
            concat_ws("_", lit(b), minhash($"hs", 2 * b), minhash($"hs", 2 * b + 1))): _*)
            .as("bands"), size($"hs").as("nsh"))
      val banded = sig.filter($"nsh" > 0) // degenerate-doc skew guard
        .select($"doc_id", explode($"bands").as("band"))
      val cand = banded.as("a").join(banded.as("b"),
          $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
      val txt = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      cand
        .join(txt.as("t1"), $"d1" === $"t1.doc_id")
        .join(txt.as("t2"), $"d2" === $"t2.doc_id")
        .select($"d1", $"d2",
          levenshtein($"t1.text", $"t2.text").as("dist"),
          greatest(length($"t1.text"), length($"t2.text")).as("mx"))
        .filter($"dist" * 5 <= $"mx")
        .select($"d1", $"d2", $"dist")
        .orderBy("d1", "d2")
    }),

    // Near-dup CLUSTERING: connected components over the verified LSH pair
    // graph + canonical-doc election (min id per component) — the step that
    // turns pairwise near-dups into the actual corpus-dedup decision ("keep
    // one doc per cluster"). Distributed min-label propagation: labels
    // shrink monotonically to the component minimum, so the fixpoint is the
    // exact component id regardless of schedule. The driver loop only
    // ORCHESTRATES iterations (the classic Pregel shape — GraphX does the
    // same); every data operation is a distributed join/agg, and per
    // iteration it shuffles ONLY the dup-pair node set (a tiny fraction of
    // the corpus), for at most graph-diameter rounds (near-dup clusters are
    // near-cliques — 2-3 rounds in practice, hard cap 20).
    "q_dedup_clusters" -> ((s, dir) =>
      clusterMembers(s, dir).orderBy(col("doc_id"))),

    // Exact n-gram Jaccard ground truth (brute-force pairwise — correctness
    // anchor for the LSH path; at scale you only ever run the LSH variant).
    // Jaccard over the 32-bit shingle hashes (identical sets both engines).
    "q_dedup_jaccard_exact" -> ((s, dir) => {
      import s.implicits._
      val d = shingled(s, dir).select($"doc_id", $"hs").persist()
      d.as("a").join(d.as("b"), $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
          round(jaccard($"a.hs", $"b.hs"), 6).as("jac"))
        .filter($"jac" >= 0.5)
        .orderBy($"d1", $"d2")
    }),

    // INCREMENTAL (cross-corpus) dedup — the daily-crawl shape: dedupe a
    // NEW batch (every 4th doc here) against the EXISTING corpus without
    // ever re-pairing existing×existing. Candidates come from banding the
    // new side against the existing side's band table ONLY, so candidate
    // work scales with the increment (× band occupancy), not the corpus;
    // the existing side's signatures come from the PERSISTED
    // SignatureStore (built-if-absent, reused across runs) — the new
    // batch is the only text that gets tokenized/shingled/minhashed.
    // Verdict per new doc in ONE mergeable aggregation (min_by picks the
    // earliest matching existing doc and its Jaccard together — no
    // join-back, no per-group sort): dup_of + jac, or keep.
    "q_dedup_incremental" -> ((s, dir) => {
      import s.implicits._
      val store = storeFor(s, dir)
      incrementalDedupStored(s, store,
        Tables.load(s, dir, "documents")
          .filter(pmod($"doc_id", lit(4L)) === 0)
          .select($"doc_id", $"text"))
        .orderBy($"doc_id")
    }),

    // MULTI-GENERATION incremental dedup — two crawls through the SAME
    // persisted store: batch1 (doc_id ≡ 0 mod 8) dedups against the
    // corpus store, its signatures are APPENDED, then batch2 (≡ 4 mod 8)
    // dedups against corpus ∪ batch1 — the accumulate-and-resume cycle a
    // daily pipeline runs. Built in a FRESH store each run (generation
    // content differs from q_dedup_incremental's), committed batch by
    // batch through the same manifest protocol. The oracle derives both
    // generations' verdicts from the one verified-pair set, so the
    // append path (not just the single-store read) is hash-checked.
    "q_dedup_incremental_multi" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val store = java.nio.file.Files
        .createTempDirectory("graft_sigstore_multi").toString
      graft.operators.SignatureStore.ingest(s, store, "corpus",
        sigWithBands(docs.filter(pmod($"doc_id", lit(4L)) =!= 0))
          .select($"doc_id", $"hs", $"bands"))
      val out1 = incrementalDedupStored(s, store,
        docs.filter(pmod($"doc_id", lit(8L)) === 0))
        .withColumn("batch", lit(1L))
      // materialize batch1's verdicts BEFORE the store grows: the lazy
      // plan would otherwise see batch1's own signatures as "existing"
      val out1Rows = out1.persist()
      out1Rows.count()
      // maxLeaves = 1 forces the ingest step's auto-compaction here, so
      // batch2's probe (hash-checked below) reads the FOLDED store — the
      // append → compact → probe cycle a daily pipeline runs, inside one
      // oracle-verified gate row
      graft.operators.SignatureStore.ingest(s, store, "batch1",
        sigWithBands(docs.filter(pmod($"doc_id", lit(8L)) === 0))
          .select($"doc_id", $"hs", $"bands"), maxLeaves = 1)
      val out2 = incrementalDedupStored(s, store,
        docs.filter(pmod($"doc_id", lit(8L)) === 4))
        .withColumn("batch", lit(2L))
      out1Rows.unionAll(out2)
        .select($"batch", $"doc_id", $"dup_of", $"jac", $"keep")
        .orderBy($"batch", $"doc_id")
    }),

    // The fast twin's GATE ROW: md5-verified pairs UNION ALL the symmetric
    // difference of the two pipelines' verified pair sets. When the twins
    // agree — the invariant DedupSpec pins in-Spark — the output IS the
    // md5 pair set, so the md5 DuckDB oracle hash-checks it; any
    // divergence (a pair either pipeline finds that the other doesn't, or
    // a drifted Jaccard value) adds rows and turns the gate red. This
    // makes the xxhash64 path rows+schema+hash-checkable without an
    // xxhash64 in DuckDB.
    "q_dedup_minhash_lsh_fast_check" -> ((s, dir) => {
      import s.implicits._
      val md5P = lshPairs(s, dir)
      val fastP = fastLshPairs(s, dir)
      md5P
        .unionAll(fastP.exceptAll(md5P))
        .unionAll(md5P.exceptAll(fastP))
        .orderBy($"d1", $"d2")
    }),

    // The SAME md5 MinHash+LSH pipeline through the PLAIN-SQL frontend:
    // pure spark.sql text over the SqlFunctions UDF surface (no Column API,
    // no dialect) — a third frontend path hash-verified against the same
    // oracle. CTEs instead of persist(): this is the correctness twin; the
    // DataFrame form above is the perf path.
    "q_dedup_minhash_lsh_sql" -> ((s, dir) => {
      graft.functions.SqlFunctions.registerAll(s)
      graft.Tables.registerAll(s, dir)
      val bands = (0 until 4).map { b =>
        val (a1, b1) = MinhashPerms(2 * b); val (a2, b2) = MinhashPerms(2 * b + 1)
        s"concat_ws('_', $b, graft_minhash(hs, ${a1}L, ${b1}L), graft_minhash(hs, ${a2}L, ${b2}L))"
      }
      s.sql(
        s"""WITH sig AS (
              SELECT doc_id,
                     graft_shingles3(graft_word_hashes(graft_tokens(text))) AS hs
              FROM documents),
            withbands AS (
              SELECT doc_id, hs, array(${bands.mkString(", ")}) AS bands FROM sig),
            banded AS (SELECT doc_id, explode(bands) AS band FROM withbands
                       WHERE size(hs) > 0),
            cand AS (
              SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.doc_id < b.doc_id)
            SELECT d1, d2, round(graft_jaccard(h1.hs, h2.hs), 6) AS jac
            FROM cand
            JOIN withbands h1 ON d1 = h1.doc_id
            JOIN withbands h2 ON d2 = h2.doc_id
            WHERE round(graft_jaccard(h1.hs, h2.hs), 6) >= 0.5
            ORDER BY d1, d2""")
    }),

    // SimHash signatures + Hamming-distance near-dup pairs (distance ≤ 3 of
    // 16 bits). One integer per doc; the pair join is on the tiny signature
    // relation.
    "q_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", simhash16("split(text, ' ')").as("sh16"))
        .orderBy($"doc_id")
    }),

    "q_dedup_simhash_pairs" -> ((s, dir) => {
      import s.implicits._
      val sig = Tables.load(s, dir, "documents")
        .select($"doc_id", simhash16("split(text, ' ')").as("sh16"))
      sig.as("a").join(sig.as("b"), $"a.doc_id" < $"b.doc_id"
          && hamming($"a.sh16", $"b.sh16") <= 3)
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
          hamming($"a.sh16", $"b.sh16").cast("long").as("dist"))
        .orderBy($"d1", $"d2")
    }),

    // Decorrelated sf1 twins (r14 VERDICT #6): the same brute-force
    // OPERATORS as the three quadratic anchors (q_dedup_jaccard_exact,
    // q_dedup_simhash_pairs, q_dedup_lsh_editdist) over
    // [[decorrelatedDocs]] — at driver SFs structurally identical to the
    // anchors (uniform token suffix over the full sf0.01 corpus), at the
    // synthesized sf1 replica-decorrelated + base-sliced so the all-pairs
    // scans and their DuckDB oracles stay inside budget. The anchors stay
    // sf0.01-only; these rows carry the operators to the sf1 sidecar.
    "q_dedup_jaccard_exact_dc" -> ((s, dir) => {
      import s.implicits._
      // repartition BEFORE the all-pairs nested loop: the sliced corpus
      // reads as 1-2 parquet splits, which would leave the O(n²) jaccard
      // kernel on as many tasks — parallelism must come from the left side
      // 500-base slice (not 1000): the twin's DuckDB oracle pays
      // O(pairs) list_intersect calls — 1.2e7 pairs keeps it minutes,
      // while at the driver SFs (all doc_ids < 500) the slice still
      // retains the ENTIRE corpus, so the gate row loses nothing
      val d = decorrelatedDocs(s, dir, 500L)
        .withColumn("hs", shingles3(tokens($"text")))
        .select($"doc_id", $"hs")
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
        .persist()
      d.as("a").join(d.as("b"), $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
          round(jaccard($"a.hs", $"b.hs"), 6).as("jac"))
        .filter($"jac" >= 0.5)
        .orderBy($"d1", $"d2")
    }),

    "q_dedup_simhash_pairs_dc" -> ((s, dir) => {
      import s.implicits._
      val sig = decorrelatedDocs(s, dir, 1000L)
        .select($"doc_id", simhash16("split(text, ' ')").as("sh16"))
      sig.as("a").join(sig.as("b"), $"a.doc_id" < $"b.doc_id"
          && hamming($"a.sh16", $"b.sh16") <= 3)
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
          hamming($"a.sh16", $"b.sh16").cast("long").as("dist"))
        .orderBy($"d1", $"d2")
    }),

    "q_dedup_lsh_editdist_dc" -> ((s, dir) => {
      import s.implicits._
      val docs = decorrelatedDocs(s, dir, 1000L).persist()
      val sh = docs.withColumn("hs", shingles3(tokens($"text")))
        .select($"doc_id", $"hs")
      val sig = sh.select($"doc_id",
          array((0 until 4).map(b =>
            concat_ws("_", lit(b), minhash($"hs", 2 * b), minhash($"hs", 2 * b + 1))): _*)
            .as("bands"), size($"hs").as("nsh"))
      val banded = sig.filter($"nsh" > 0)
        .select($"doc_id", explode($"bands").as("band"))
      val cand = banded.as("a").join(banded.as("b"),
          $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
      cand
        .join(docs.as("t1"), $"d1" === $"t1.doc_id")
        .join(docs.as("t2"), $"d2" === $"t2.doc_id")
        .select($"d1", $"d2",
          levenshtein($"t1.text", $"t2.text").as("dist"),
          greatest(length($"t1.text"), length($"t2.text")).as("mx"))
        .filter($"dist" * 5 <= $"mx")
        .select($"d1", $"d2", $"dist")
        .orderBy("d1", "d2")
    }),

    // SimHash near-dup at SCALE: 64-bit signature held as four 16-bit bands
    // (sh0..sh3 = bits [0,16) [16,32) [32,48) [48,64) of the per-word
    // 64-bit md5-prefix SimHash). Pigeonhole: Hamming ≤ 3 over 64 bits
    // leaves ≥1 of the 4 bands untouched, so candidates = pairs agreeing
    // EXACTLY on some band — a bucketed equi-join on (band, value), never
    // the all-pairs Hamming scan of q_dedup_simhash_pairs (that one stays
    // as the 16-bit correctness anchor; 16-bit sigs can't band — 4-bit
    // buckets have 16 values, still n²/4). Expected bucket occupancy at
    // uniform hashing is n/65536 per band value, so the shuffled candidate
    // set is ~n + true-dup pairs: the same reason MinHash-LSH scales.
    // The oracle is the EXHAUSTIVE O(n²) scan in DuckDB — banding is
    // provably lossless, so the hash must match exactly.
    "q_dedup_simhash_banded" -> ((s, dir) => {
      import s.implicits._
      val sig = simhashSig(Tables.load(s, dir, "documents")).persist()
      simhashBandedPairs(sig, hotThreshold = 1024L).orderBy($"d1", $"d2")
    }),

    // PARAGRAPH-level exact dedup (CCNet-style boilerplate removal): split
    // each doc into paragraphs, keep only each paragraph's FIRST occurrence
    // corpus-wide (total (doc_id, idx) order), report per-doc survivors.
    // The synthetic corpus has no natural paragraph structure, so a shared
    // boilerplate paragraph is injected deterministically into every 4th
    // doc — the classic header/footer the operator exists to strip.
    // Scale: the first-occurrence key per paragraph hash is a PARTIAL-
    // AGGREGATED min (map-side combined — a boilerplate paragraph shared by
    // 25% of the corpus still reduces to one row per partition before the
    // shuffle), NOT a row_number window: a window's within-partition sort
    // runs the whole hot hash group in one un-splittable task. The join
    // back on the hash IS hot-keyed; AQE's skew splitter handles exactly
    // this shape PROVIDED the firsts side is materialized (written and
    // re-read between stages, as a 100 TB pipeline would) — the splitter
    // pattern-matches bare shuffle stages, so this single-query gate form
    // with the agg inlined above the build shuffle does not engage it
    // (SkewJoinSpec pins both facts). Then one regroup by doc.
    // Suffix-array substring dedup (the alternative) needs a global order
    // and does not distribute.
    "q_dedup_paragraph" -> ((s, dir) => paragraphDedup(s, dir, salt = 0)),

    // The SAME operator with the firsts join SALTED 8 ways (same oracle):
    // probe rows scatter by an okey-derived salt, build rows replicate to
    // every salt — the hot boilerplate key spreads over 8 reducers WITHOUT
    // relying on AQE's (conditional — see SkewJoinSpec) splitter. This is
    // the self-contained single-query form you'd run at 100 TB when the
    // firsts relation is not materialized.
    "q_dedup_paragraph_salted" -> ((s, dir) => paragraphDedup(s, dir, salt = 8))
  )

  /** The xxhash64 MinHash+LSH pipeline's verified pairs — the fast path
    * you actually run at 100 TB (one 64-bit hash per word instead of an
    * md5 digest). Same banding, same degenerate-doc skew guard, same
    * exact-Jaccard verify over injectively-hashed shingle sets as
    * [[lshPairs]]; shared by q_dedup_minhash_lsh_fast and its gate-row
    * cross-check so the two can never drift apart silently. */
  private def fastLshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = Tables.load(s, dir, "documents")
      // same 1-split-scan spread as [[shingled]] (r15)
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .withColumn("wh", transform(tokens($"text"), w => pmod(xxhash64(w), lit(1L << 32))))
      .withColumn("hs", combineShingles3($"wh"))
      .select($"doc_id", $"hs",
        array((0 until 4).map(b =>
          concat_ws("_", lit(b), minhash($"hs", 2 * b), minhash($"hs", 2 * b + 1))): _*)
          .as("bands"))
      .persist()
    // same degenerate-doc skew guard as the md5 twin (see lshPairs)
    val banded = sig.filter(size($"hs") > 0)
      .select($"doc_id", explode($"bands").as("band"))
    val cand = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    val hs = sig.select($"doc_id", $"hs")
    cand
      .join(hs.as("h1"), $"d1" === $"h1.doc_id")
      .join(hs.as("h2"), $"d2" === $"h2.doc_id")
      .select($"d1", $"d2", round(jaccard($"h1.hs", $"h2.hs"), 6).as("jac"))
      .filter($"jac" >= 0.5)
  }

  /** 64-bit SimHash signature frame (doc_id, sh0..sh3) — ONE native pass
    * computes all four bands (each word md5-digested once, not 4×; see
    * VectorExpressions.SimHashBands). Callers persist before the
    * self-join so the map-side sig compute runs once, not per branch. */
  private[graft] def simhashSig(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // same 1-split-scan spread as [[shingled]] (r15): per-word md5 SimHash
    // is the amplified map here
    docs.repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", simhashBands(split($"text", " ")).as("sh"))
      .select($"doc_id", $"sh"(0).as("sh0"), $"sh"(1).as("sh1"),
        $"sh"(2).as("sh2"), $"sh"(3).as("sh3"))
  }

  /** Banded 64-bit-SimHash near-dup pairs (d1, d2, dist ≤ 3) from a
    * signature frame (doc_id, sh0..sh3) — shared by q_dedup_simhash_banded
    * and the ScaleProbe rows so plan and probe cannot drift.
    *
    * Cold path: candidates = pairs agreeing exactly on some 16-bit band
    * (pigeonhole: Hamming ≤ 3 over 64 bits leaves ≥ 1 of 4 bands
    * untouched). Expected occupancy at uniform hashing is n/65536 per band
    * value, so candidates ≈ n + true pairs.
    *
    * Hot-bucket refinement (the skew guard): real corpora break the
    * uniformity assumption — short docs over a small vocabulary concentrate
    * into few signatures, and one band value shared by m docs costs m²
    * candidate pairs. Any bucket above `hotThreshold` is therefore joined
    * on an ADDITIONAL 12-bit sub-band of the remaining 48 bits (the other
    * three bands packed little-endian). Pigeonhole again: band k exact ⇒
    * the ≤ 3 errors lie in those 48 bits ⇒ of the four 12-bit sub-bands
    * ≥ 1 matches exactly — so refinement loses no pair, and a hot bucket's
    * join cost drops from m² to Σ (m/4096-expected sub-occupancy)². The
    * hot set itself is ≤ 4n/threshold keys — broadcastable by
    * construction. Both paths union before the pair-level distinct, so a
    * pair found via several bands (or both paths) counts once. */
  private[graft] def simhashBandedPairs(sig: DataFrame,
                                        hotThreshold: Long): DataFrame = {
    val s = sig.sparkSession
    import s.implicits._
    val bands = sig.select($"doc_id", $"sh0", $"sh1", $"sh2", $"sh3",
      explode(array((0 to 3).map { k =>
        // rest = the other three bands as one 48-bit word (consistent
        // order both sides of the self-join — that is all pigeonhole needs)
        val rest = col(s"sh${(k + 1) % 4}") +
          col(s"sh${(k + 2) % 4}") * lit(65536L) +
          col(s"sh${(k + 3) % 4}") * lit(65536L * 65536L)
        struct(lit(k).as("band"), col(s"sh$k").as("bval"), rest.as("rest"))
      }: _*)).as("bk"))
      .select($"doc_id", $"sh0", $"sh1", $"sh2", $"sh3",
        $"bk.band".as("band"), $"bk.bval".as("bval"), $"bk.rest".as("rest"))
    val hot = bands.groupBy($"band", $"bval")
      .agg(count(lit(1)).as("n")).filter($"n" > hotThreshold)
      .select($"band", $"bval", lit(true).as("__hot"))
    // persisted (r16): marked feeds FOUR plan branches (both sides of the
    // cold self-join, both sides of the hot sub-band self-join) — without
    // the cache each branch re-ran the band explode + hot broadcast join.
    // Bounded: 4 rows per doc.
    val marked = bands.join(broadcast(hot), Seq("band", "bval"), "left")
      .persist()
    val dist = (hamming($"a.sh0", $"b.sh0") + hamming($"a.sh1", $"b.sh1") +
      hamming($"a.sh2", $"b.sh2") + hamming($"a.sh3", $"b.sh3")).cast("long")
    val cold = marked.filter($"__hot".isNull)
    val coldPairs = cold.as("a").join(cold.as("b"),
        $"a.band" === $"b.band" && $"a.bval" === $"b.bval" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"), dist.as("dist"))
    val hotSub = marked.filter($"__hot" === true)
      .select($"doc_id", $"sh0", $"sh1", $"sh2", $"sh3", $"band", $"bval",
        explode(array((0 to 3).map(j =>
          struct(lit(j).as("sub"),
            shiftright($"rest", 12 * j).bitwiseAND(lit(4095L)).as("subv"))): _*))
          .as("sb"))
      .select($"doc_id", $"sh0", $"sh1", $"sh2", $"sh3", $"band", $"bval",
        $"sb.sub".as("sub"), $"sb.subv".as("subv"))
    val hotPairs = hotSub.as("a").join(hotSub.as("b"),
        $"a.band" === $"b.band" && $"a.bval" === $"b.bval" &&
          $"a.sub" === $"b.sub" && $"a.subv" === $"b.subv" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"), dist.as("dist"))
    coldPairs.unionAll(hotPairs)
      .distinct() // a pair can agree on several bands / sub-bands
      .filter($"dist" <= 3)
  }

  /** The paragraph-dedup pipeline behind q_dedup_paragraph and its salted
    * twin — one definition, so operator and mitigation cannot drift.
    * @param salt 0 = plain hash join on h; n > 0 = the probe side scatters
    *             by pmod(okey, n) and the firsts side replicates to every
    *             salt, spreading a hot paragraph hash over n reducers. */
  private def paragraphDedup(s: SparkSession, dir: String,
                             salt: Int): DataFrame = {
    import s.implicits._
    val bp = "this site uses cookies accept our policy to continue reading"
    val aug = when(pmod($"doc_id", lit(4L)) === 0,
      concat($"text", lit(" <p> "), lit(bp))).otherwise($"text")
    // okey = total (doc_id, idx) order packed into one long (paragraph
    // index is bounded far below 1e6 by doc length)
    val paras = Tables.load(s, dir, "documents")
      .select($"doc_id", posexplode(split(aug, " <p> ")))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "para")
      .withColumn("h", md5($"para"))
      .withColumn("okey", $"doc_id" * lit(1000000L) + $"idx")
    val firsts0 = paras.groupBy($"h").agg(min($"okey").as("first_okey"))
    val joined =
      if (salt == 0) paras.join(firsts0, "h")
      else graft.operators.SaltedJoin(paras, firsts0, Seq("h"), $"okey", salt)
    joined
      .withColumn("keep", $"okey" === $"first_okey")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(!$"keep", 1L).otherwise(0L)).as("n_removed"),
        // collect_list skips the NULLs the when() leaves for removed
        // paragraphs; struct sort restores document order
        md5(array_join(transform(
          array_sort(collect_list(when($"keep", struct($"idx", $"para")))),
          p => p("para")), " <p> ")).as("kept_fp"))
      .orderBy($"doc_id")
  }

  /** DuckDB-side shingle CTE shared by the dedup oracles: the same per-word
    * hash + rolling combine as combineShingles3. */
  /** Shingle-hash CTE chain over `src` (normally `documents`; the
    * decorrelated sf1 twins pass the `dcd` slice). */
  private def shCteBody(src: String): String =
    s"""d AS (SELECT doc_id, string_split(text, ' ') w FROM $src),
       wh AS (SELECT doc_id,
         list_transform(w, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS wh
       FROM d),
       h AS (SELECT doc_id,
         list_distinct(CASE WHEN len(wh) >= 3
           THEN list_transform(range(0, len(wh) - 2),
                i -> ((wh[i+1] * 131 + wh[i+2]) % 1000000007 * 131 + wh[i+3]) % 1000000007)
           ELSE [] END) AS hs
       FROM wh)"""

  private val shCte = "WITH " + shCteBody("documents")

  private def mh(i: Int, hs: String = "hs"): String = {
    val (a, b) = MinhashPerms(i)
    s"coalesce(list_min(list_transform($hs, x -> ($a * x + $b) % 1000000007)), 1000000007)"
  }

  /** DuckDB replica of the md5 MinHash+LSH pipeline. Shared by BOTH twins:
    * on this corpus the verified pair sets and Jaccard values are
    * empirically identical across hash families (DedupSpec pins the twins
    * equal in-Spark; the driver's hash gate confirmed it at sf0.01). This
    * coincidence is NOT guaranteed in general — LSH candidate recall is
    * probabilistic per hash family — so if a corpus change ever fails only
    * the fast twin's gate row, check DedupSpec first: a twin-equality pass
    * with a red gate means band-collision luck diverged, not a plan bug. */
  /** Near-dup cluster membership (doc_id, canonical_id, cluster_size) —
    * connected components + min-canonical election over the verified LSH
    * pairs; shared by q_dedup_clusters and the keep-best curation policy.
    * Both edge directions come from ONE pass over the (expensive) LSH
    * pipeline — a union of two selects would execute it twice. */
  private[graft] def clusterMembers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = lshPairs(s, dir)
      .select(explode(array(
        struct($"d1".as("u"), $"d2".as("v")),
        struct($"d2".as("u"), $"d1".as("v")))).as("e"))
      .select($"e.u", $"e.v")
    val labels = graft.operators.Graph.connectedComponents(edges)
    val members = labels.select($"u".as("doc_id"), $"lbl".as("canonical_id"))
    val sizes = members.groupBy($"canonical_id")
      .agg(count(lit(1)).as("cluster_size"))
    members.join(sizes, "canonical_id")
      .select($"doc_id", $"canonical_id", $"cluster_size")
  }

  /** Candidate pairs + pre-threshold Jaccard (cj) — shared by the verified
    * pair set and the threshold histogram. */
  private val lshCandJacCte: String =
    s"""$shCte,
       sig AS (SELECT doc_id, hs,
         [${(0 until 4).map(b => s"concat_ws('_', $b, ${mh(2 * b)}, ${mh(2 * b + 1)})").mkString(", ")}] AS bands
       FROM h),
       banded AS (SELECT doc_id, unnest(bands) AS band FROM sig
                  WHERE len(hs) > 0),
       cand AS (SELECT DISTINCT a.doc_id d1, b.doc_id d2
         FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
       cj AS (SELECT d1, d2,
           round(len(list_intersect(a.hs, b.hs))::DOUBLE
             / len(list_distinct(a.hs || b.hs)), 6) AS jac
         FROM cand JOIN sig a ON a.doc_id = d1 JOIN sig b ON b.doc_id = d2)"""

  private val lshVerifiedCte: String =
    s"""$lshCandJacCte,
       vp AS (SELECT d1, d2, jac FROM cj WHERE jac >= 0.5)"""

  private val lshOracleSql: String =
    s"$lshVerifiedCte SELECT d1, d2, jac FROM vp ORDER BY d1, d2"

  /** Connected components over the verified pair graph via a recursive CTE:
    * `walk` accumulates every (node, reachable-node) pair — symmetric edges
    * put each node in its own reachable set — so min per node is the exact
    * component minimum, the same fixpoint the Spark label propagation
    * converges to. */
  private[graft] val clusterCte: String =
    s"""${lshVerifiedCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       edges AS (SELECT d1 AS u, d2 AS v FROM vp
                 UNION SELECT d2, d1 FROM vp),
       walk(node, lbl) AS (
         SELECT u, v FROM edges
         UNION
         SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.node = e.v),
       cc AS (SELECT node AS doc_id, least(node, min(lbl)) AS canonical_id
              FROM walk GROUP BY node)"""

  private val clusterOracleSql: String =
    s"""$clusterCte
       SELECT doc_id, canonical_id,
              count(*) OVER (PARTITION BY canonical_id) AS cluster_size
       FROM cc ORDER BY doc_id"""


  /** The incremental cross-corpus dedup pipeline (shared by the gate query
    * and ScaleProbe) — see the q_dedup_incremental entry's design notes.
    * New batch = every 4th doc; existing corpus = the rest. */
  /** (doc_id, hs, bands) — the md5 MinHash signature + band keys of a
    * document relation; pure map-side expressions, so it applies to a
    * STREAM as-is (the streaming incremental-dedup twin uses it on live
    * rows against a static store built by the same function). */
  /** Signature ALGORITHM version, folded into persisted store paths: a
    * future change to tokenization, shingle width, hash count, or banding
    * must change this tag, or a content-fingerprint-keyed store would
    * silently serve signatures computed under the old algorithm.
    * Encodes the current shape: 3-shingles, 8 minhash fns, 4 bands × 2. */
  private[graft] val sigAlgoVersion = "s3h8b4v1"

  private[graft] def sigWithBands(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // same 1-split-scan spread as [[shingled]] (r15): the batch side of
    // incremental dedup and the store-ingest path both shingle here
    docs.repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("hs", shingles3(tokens($"text")))
      .select(docs.columns.map(col).toIndexedSeq :+ $"hs" :+
        array((0 until 4).map(b =>
          concat_ws("_", lit(b), minhash($"hs", 2 * b), minhash($"hs", 2 * b + 1))): _*)
          .as("bands"): _*)
  }

  /** TRUE incremental dedup: probe a NEW batch against the PERSISTED
    * [[graft.operators.SignatureStore]] of everything crawled before —
    * signatures are computed for the batch ONLY; the existing corpus
    * contributes a columnar scan of its thin band table plus candidate-only
    * reads of its signature arrays. Same verdict semantics as
    * [[incrementalDedupFrom]] (min_by earliest existing match, NULL = keep),
    * so the same DuckDB oracle hash-checks both paths. The store side of
    * the candidate join is new-batch-bands × store-bands — work scales
    * with the increment × band occupancy, never with corpus × corpus. */
  private[graft] def incrementalDedupStored(s: SparkSession, storeDir: String,
                                            newDocs: DataFrame): DataFrame = {
    import s.implicits._
    import graft.operators.SignatureStore
    val newSig = sigWithBands(newDocs.select($"doc_id", $"text"))
      .select($"doc_id", $"hs", $"bands")
      .persist()
    val bandedNew = newSig.filter(size($"hs") > 0)
      .select($"doc_id", explode($"bands").as("band"))
    // The batch side is SMALL BY DEFINITION (a crawl increment vs the
    // whole corpus), and it comes out of a compute (no scan statistics),
    // so Catalyst would shuffle-join by default — broadcast it
    // explicitly: the candidate stage becomes ONE map-side hash probe
    // over the store's thin band scan, no shuffle of the corpus-sized
    // side at all. (A pipeline whose increments outgrow broadcast drops
    // the hint and pre-buckets the store on band instead.)
    val cand = broadcast(bandedNew.as("a"))
      .join(SignatureStore.bands(s, storeDir).as("b"), $"a.band" === $"b.band")
      .select($"a.doc_id".as("new_id"), $"b.doc_id".as("old_id"))
      .distinct()
    val oldHs = SignatureStore.sigs(s, storeDir)
      .getOrElse(newSig.select($"doc_id", $"hs").limit(0))
    // same asymmetry for verification: (candidates × batch signatures)
    // is small — broadcast it so the store's fat hs column is read in
    // ONE unshuffled pass that probes a hash table of candidates
    val candSigs = broadcast(cand
      .join(newSig.select($"doc_id", $"hs").as("h1"), $"new_id" === $"h1.doc_id")
      .select($"new_id", $"old_id", $"h1.hs".as("new_hs")))
    val verified = candSigs
      .join(oldHs.as("h2"), $"old_id" === $"h2.doc_id")
      .select($"new_id", $"old_id",
        round(jaccard($"new_hs", $"h2.hs"), 6).as("jac"))
      .filter($"jac" >= 0.5)
    val bj = verified.groupBy($"new_id")
      .agg(min_by(struct($"old_id", $"jac"), $"old_id").as("m"))
      .select($"new_id", $"m.old_id".as("dup_of"), $"m.jac".as("jac"))
    newDocs.select($"doc_id")
      .join(bj, $"doc_id" === $"new_id", "left")
      .select($"doc_id", $"dup_of", $"jac", $"dup_of".isNull.as("keep"))
  }

  /** Build-if-absent the signature store for a source dir's existing
    * corpus (doc_id % 4 != 0), keyed by an order-insensitive content
    * fingerprint so a changed source can never serve a stale store. The
    * fingerprint pass reads the text once but runs NO tokenize/shingle/
    * minhash — it exists only because the gate has no crawl ledger; a
    * production pipeline keys batches by crawl id and skips it. */
  private[graft] def storeFor(s: SparkSession, dir: String): String = {
    import s.implicits._
    val old = Tables.load(s, dir, "documents")
      .filter(pmod($"doc_id", lit(4L)) =!= 0)
      .select($"doc_id", $"text")
    // bit_xor: order-insensitive, ANSI-overflow-free; (doc_id, text) rows
    // are unique per doc_id so xor pair-cancellation cannot collide runs.
    // An empty corpus xors to the 0L sentinel (bit_xor over zero rows is
    // NULL) — a valid, stable store key.
    val fpRow = old.agg(expr("bit_xor(xxhash64(doc_id, text))")).first()
    val fp = if (fpRow.isNullAt(0)) 0L else fpRow.getLong(0)
    // path = algorithm version + content fingerprint: changing EITHER the
    // signature parameters or the corpus text lands on a fresh store
    val store = s"${System.getProperty("java.io.tmpdir")}/graft_sigstore/" +
      s"corpus_${sigAlgoVersion}_" + java.lang.Long.toHexString(fp)
    // ingest = append + bounded auto-compaction: a no-op fold at one
    // leaf here, but the same call a daily pipeline makes per crawl
    graft.operators.SignatureStore.ingest(s, store, "corpus",
      sigWithBands(old).select($"doc_id", $"hs", $"bands"))
    store
  }

  private[graft] def incrementalDedupFrom(docs0: DataFrame): DataFrame = {
    val s = docs0.sparkSession
    import s.implicits._
    val sig = sigWithBands(docs0.select($"doc_id", $"text"))
      .select($"doc_id", $"hs", $"bands")
      .persist()
    val banded = sig.filter(size($"hs") > 0)
      .select($"doc_id", explode($"bands").as("band"))
    val bandedNew = banded.filter(pmod($"doc_id", lit(4L)) === 0)
    val bandedOld = banded.filter(pmod($"doc_id", lit(4L)) =!= 0)
    val cand = bandedNew.as("a").join(bandedOld.as("b"), $"a.band" === $"b.band")
      .select($"a.doc_id".as("new_id"), $"b.doc_id".as("old_id"))
      .distinct()
    val hs = sig.select($"doc_id", $"hs")
    val verified = cand
      .join(hs.as("h1"), $"new_id" === $"h1.doc_id")
      .join(hs.as("h2"), $"old_id" === $"h2.doc_id")
      .select($"new_id", $"old_id",
        round(jaccard($"h1.hs", $"h2.hs"), 6).as("jac"))
      .filter($"jac" >= 0.5)
    val bj = verified.groupBy($"new_id")
      .agg(min_by(struct($"old_id", $"jac"), $"old_id").as("m"))
      .select($"new_id", $"m.old_id".as("dup_of"), $"m.jac".as("jac"))
    docs0.filter(pmod($"doc_id", lit(4L)) === 0)
      .select($"doc_id")
      .join(bj, $"doc_id" === $"new_id", "left")
      .select($"doc_id", $"dup_of", $"jac", $"dup_of".isNull.as("keep"))
  }

  /** The duplicated-span-removal pipeline (shared by the gate and the
    * ScaleProbe row) — see the q_dedup_span_removal entry's design notes. */
  private[graft] def spanRemovalFrom(docs0: DataFrame): DataFrame = {
    val s = docs0.sparkSession
    import s.implicits._
      val aug = concat(
        when(pmod($"doc_id", lit(5L)) === 0,
          lit("click here to accept cookies ")).otherwise(lit("")),
        $"text",
        when(pmod($"doc_id", lit(3L)) === 0,
          lit(" subscribe to our newsletter for daily updates now"))
          .otherwise(lit("")))
      val gramArr = when(size($"w") >= 5,
        transform(sequence(lit(0), size($"w") - 5),
          i => struct(i.as("i"),
            hash32(concat_ws(" ", slice($"w", i + 1, lit(5)))).as("gh"))))
        .otherwise(array().cast("array<struct<i:int,gh:bigint>>"))
      // the md5-derived gram hashes are computed ONCE into a cached array
      // column (r15): `occ` feeds two branches (hot-gram detection and the
      // covered-position join), and without this the per-gram hashing —
      // the dominant map cost — ran twice, once per branch
      val docs = docs0
        .select($"doc_id", tokens(aug).as("w"))
        .repartition(s.sparkContext.defaultParallelism, $"doc_id")
        .withColumn("garr", gramArr)
        .persist()
      val occ = docs.select($"doc_id", explode($"garr").as("g"))
        .select($"doc_id", $"g.i".as("i"), $"g.gh".as("gh"))
      val hot = occ.groupBy($"gh")
        .agg(count_distinct($"doc_id").as("nd"))
        .filter($"nd" >= 3).select($"gh")
      val covered = occ.join(broadcast(hot), "gh")
        .select($"doc_id", explode(sequence($"i", $"i" + 4)).as("p"))
        .groupBy($"doc_id").agg(collect_set($"p").as("cov"))
      // kept positions via array_except (hash-set based, O(len + |cov|))
      // rather than a per-token array_contains probe (O(len·|cov|) — a
      // fully-boilerplate 100k-token doc would pay 1e10 comparisons);
      // sequence() is ascending and array_except preserves first-arg
      // order, so document order survives without a sort
      docs.join(covered, Seq("doc_id"), "left")
        .withColumn("kept", array_except(
          sequence(lit(0), size($"w") - 1),
          coalesce($"cov", array().cast("array<int>"))))
        .select($"doc_id",
          size($"w").cast("long").as("n_tokens"),
          coalesce(size($"cov"), lit(0)).cast("long").as("n_removed"),
          md5(concat_ws(" ",
            transform($"kept", i => element_at($"w", i + 1)))).as("kept_fp"))
        .orderBy($"doc_id")
  }

  /** The xxhash64 production LSH path stays in the bench headline but OUT
    * of the correctness gate (VERDICT r7 #6): xxhash64 banding is not
    * DuckDB-expressible and candidate recall is hash-family-dependent, so
    * a rows-only gate row carried no information. Its semantic pin is the
    * hash-green gate row `q_dedup_minhash_lsh_fast_check` (md5 pair set ∪
    * symmetric difference of the twins — equal to the md5 oracle exactly
    * when the twins agree) plus DedupSpec's in-Spark set equality. */
  override def benchOnly: Map[String, Q] = Map(
    "q_dedup_minhash_lsh_fast" -> ((s, dir) => {
      import s.implicits._
      fastLshPairs(s, dir).orderBy($"d1", $"d2")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """WITH corpus AS (
           SELECT * FROM documents
           UNION ALL SELECT * FROM documents WHERE doc_id % 3 = 0)
         SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
         FROM corpus GROUP BY md5(text) ORDER BY canonical_id""",
    "q_minhash_signatures" ->
      s"""$shCte
         SELECT doc_id, ${MinhashPerms.indices.map(i => s"${mh(i)} AS m$i").mkString(", ")}
         FROM h ORDER BY doc_id""",
    "q_dedup_minhash_lsh" -> lshOracleSql,
    "q_dedup_jaccard_hist" ->
      s"""$lshCandJacCte
         SELECT CAST(floor(jac * 10) AS BIGINT) AS bin, count(*) AS n_pairs
         FROM cj GROUP BY 1 ORDER BY 1""",
    "q_dedup_contamination" ->
      s"""$shCte,
         test AS (SELECT doc_id AS test_id, hs FROM h WHERE doc_id % 50 = 0),
         train AS (SELECT doc_id AS train_id, hs FROM h WHERE doc_id % 50 <> 0),
         pairs AS (SELECT train_id, test_id,
                     len(list_intersect(train.hs, test.hs)) AS overlap,
                     len(train.hs) AS n
                   FROM train CROSS JOIN test)
         SELECT train_id, test_id, overlap FROM pairs
         WHERE overlap * 5 >= n ORDER BY train_id, test_id""",
    "q_dedup_hot_ngrams" ->
      s"""$shCte,
         ex AS (SELECT doc_id, unnest(hs) AS hh FROM h),
         hot AS (SELECT hh, count(*)::BIGINT AS ndocs FROM ex
                 GROUP BY hh HAVING count(*) >= 3)
         SELECT hh AS h, ndocs FROM hot ORDER BY ndocs DESC, hh""",
    "q_dedup_span_removal" ->
      """WITH d0 AS (SELECT doc_id, string_split(
             CASE WHEN doc_id % 5 = 0 THEN 'click here to accept cookies '
                  ELSE '' END || text ||
             CASE WHEN doc_id % 3 = 0
                  THEN ' subscribe to our newsletter for daily updates now'
                  ELSE '' END, ' ') AS w
           FROM documents),
         gi AS (SELECT doc_id, w,
             unnest(range(0, greatest(len(w) - 4, 0))) AS i FROM d0),
         g AS (SELECT doc_id, i,
             ('0x' || substr(md5(array_to_string(w[i+1 : i+5], ' ')), 1, 8))
               ::BIGINT AS gh
           FROM gi),
         hot AS (SELECT gh FROM (SELECT gh, count(DISTINCT doc_id) nd
                                 FROM g GROUP BY gh) WHERE nd >= 3),
         covp AS (SELECT doc_id, unnest(range(i, i + 5)) AS p
                  FROM g JOIN hot USING (gh)),
         cov AS (SELECT doc_id, list(DISTINCT p) AS cov
                 FROM covp GROUP BY doc_id)
         SELECT d0.doc_id, len(w)::BIGINT AS n_tokens,
           coalesce(len(cov), 0)::BIGINT AS n_removed,
           md5(coalesce(array_to_string(list_filter(
             list_transform(range(1, len(w) + 1),
               i -> CASE WHEN cov IS NULL OR NOT list_contains(cov, i - 1)
                         THEN w[i] END),
             x -> x IS NOT NULL), ' '), '')) AS kept_fp
         FROM d0 LEFT JOIN cov USING (doc_id) ORDER BY doc_id""",
    "q_dedup_boilerplate_ratio" ->
      s"""$shCte,
         ex AS (SELECT doc_id, unnest(hs) AS hh FROM h),
         hot AS (SELECT hh FROM ex GROUP BY hh HAVING count(*) >= 3),
         hc AS (SELECT doc_id, count(*)::BIGINT AS nhot FROM ex
                JOIN hot USING (hh) GROUP BY doc_id)
         SELECT h.doc_id, len(hs)::BIGINT AS nsh,
                coalesce(hc.nhot, 0)::BIGINT AS nhot
         FROM h LEFT JOIN hc USING (doc_id) ORDER BY doc_id""",
    "q_dedup_lsh_editdist" ->
      s"""$shCte,
         sig AS (SELECT doc_id, hs,
           [${(0 until 4).map(b => s"concat_ws('_', $b, ${mh(2 * b)}, ${mh(2 * b + 1)})").mkString(", ")}] AS bands
         FROM h),
         banded AS (SELECT doc_id, unnest(bands) AS band FROM sig
                    WHERE len(hs) > 0),
         cand AS (SELECT DISTINCT a.doc_id d1, b.doc_id d2
           FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         ed AS (SELECT d1, d2, levenshtein(ta.text, tb.text) AS dist,
                  greatest(length(ta.text), length(tb.text)) AS mx
                FROM cand JOIN documents ta ON ta.doc_id = d1
                          JOIN documents tb ON tb.doc_id = d2)
         SELECT d1, d2, dist FROM ed WHERE dist * 5 <= mx ORDER BY d1, d2""",
    "q_dedup_clusters" -> clusterOracleSql,
    // q_dedup_minhash_lsh_fast is benchOnly (not in the gate at all, r8):
    // the _check row below is its full-strength semantic pin — its output
    // equals the md5 pair set UNLESS the twins diverge (the symmetric
    // difference unions in), so the md5 oracle hash-checks the xxhash64
    // pipeline end-to-end.
    "q_dedup_minhash_lsh_fast_check" -> lshOracleSql,
    // cross pairs = vp restricted to one-new-one-old sides (band equality
    // is symmetric, so the restricted self-join candidate set equals the
    // new×old band join's); verdict = min existing match per new doc
    "q_dedup_incremental" ->
      s"""$lshVerifiedCte,
         cross_pairs AS (
           SELECT CASE WHEN d1 % 4 = 0 THEN d1 ELSE d2 END AS new_id,
                  CASE WHEN d1 % 4 = 0 THEN d2 ELSE d1 END AS old_id, jac
           FROM vp WHERE (d1 % 4 = 0) <> (d2 % 4 = 0)),
         best AS (SELECT new_id, min(old_id) AS dup_of
                  FROM cross_pairs GROUP BY new_id),
         bj AS (SELECT b.new_id, b.dup_of, cp.jac
                FROM best b JOIN cross_pairs cp
                  ON cp.new_id = b.new_id AND cp.old_id = b.dup_of)
         SELECT d.doc_id, bj.dup_of, bj.jac, (bj.dup_of IS NULL) AS keep
         FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 0) d
         LEFT JOIN bj ON bj.new_id = d.doc_id
         ORDER BY d.doc_id""",
    // generation 1: new ≡ 0 (mod 8) vs corpus (%4 ≠ 0) only; generation
    // 2: new ≡ 4 (mod 8) vs everything else (corpus ∪ batch1 — exactly
    // what the store holds after the append). Both derived from the one
    // verified-pair set vp.
    "q_dedup_incremental_multi" ->
      s"""$lshVerifiedCte,
         g1 AS (SELECT CASE WHEN d1 % 8 = 0 THEN d1 ELSE d2 END AS new_id,
                       CASE WHEN d1 % 8 = 0 THEN d2 ELSE d1 END AS old_id, jac
                FROM vp WHERE (d1 % 8 = 0) <> (d2 % 8 = 0)
                  AND (CASE WHEN d1 % 8 = 0 THEN d2 ELSE d1 END) % 4 <> 0),
         b1 AS (SELECT new_id, min(old_id) AS dup_of FROM g1 GROUP BY new_id),
         j1 AS (SELECT b.new_id, b.dup_of, g.jac FROM b1 b
                JOIN g1 g ON g.new_id = b.new_id AND g.old_id = b.dup_of),
         r1 AS (SELECT 1 AS batch, d.doc_id, j1.dup_of, j1.jac,
                  (j1.dup_of IS NULL) AS keep
                FROM (SELECT doc_id FROM documents WHERE doc_id % 8 = 0) d
                LEFT JOIN j1 ON j1.new_id = d.doc_id),
         g2 AS (SELECT CASE WHEN d1 % 8 = 4 THEN d1 ELSE d2 END AS new_id,
                       CASE WHEN d1 % 8 = 4 THEN d2 ELSE d1 END AS old_id, jac
                FROM vp WHERE (d1 % 8 = 4) <> (d2 % 8 = 4)),
         b2 AS (SELECT new_id, min(old_id) AS dup_of FROM g2 GROUP BY new_id),
         j2 AS (SELECT b.new_id, b.dup_of, g.jac FROM b2 b
                JOIN g2 g ON g.new_id = b.new_id AND g.old_id = b.dup_of),
         r2 AS (SELECT 2 AS batch, d.doc_id, j2.dup_of, j2.jac,
                  (j2.dup_of IS NULL) AS keep
                FROM (SELECT doc_id FROM documents WHERE doc_id % 8 = 4) d
                LEFT JOIN j2 ON j2.new_id = d.doc_id)
         SELECT batch::BIGINT AS batch, doc_id, dup_of, jac, keep
         FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
         ORDER BY batch, doc_id""",
    "q_dedup_minhash_lsh_sql" -> lshOracleSql, // same md5 formulas, SQL frontend
    "q_dedup_jaccard_exact" ->
      s"""$shCte
         SELECT d1, d2, jac FROM (
           SELECT a.doc_id d1, b.doc_id d2,
             round(len(list_intersect(a.hs, b.hs))::DOUBLE
               / len(list_distinct(a.hs || b.hs)), 6) AS jac
           FROM h a JOIN h b ON a.doc_id < b.doc_id)
         WHERE jac >= 0.5 ORDER BY d1, d2""",
    "q_dedup_simhash" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         h AS (SELECT doc_id,
           list_transform(w, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hs
         FROM d)
         SELECT doc_id, list_sum(list_transform(range(0, 16), b ->
           CASE WHEN list_sum(list_transform(hs, x -> ((x >> b) & 1) * 2 - 1)) >= 0
                THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS sh16
         FROM h ORDER BY doc_id""",
    "q_dedup_simhash_pairs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         h AS (SELECT doc_id,
           list_transform(w, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hs
         FROM d),
         sig AS (SELECT doc_id, list_sum(list_transform(range(0, 16), b ->
           CASE WHEN list_sum(list_transform(hs, x -> ((x >> b) & 1) * 2 - 1)) >= 0
                THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS sh16
         FROM h)
         SELECT a.doc_id d1, b.doc_id d2, bit_count(xor(a.sh16, b.sh16))::BIGINT AS dist
         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           AND bit_count(xor(a.sh16, b.sh16)) <= 3
         ORDER BY d1, d2""",
    // Decorrelated sf1 twins: the anchors' oracles verbatim, over the
    // dcd slice instead of raw documents (both engines transform text
    // identically, so the differential stands).
    "q_dedup_jaccard_exact_dc" ->
      s"""WITH ${dcdCte(500L)}, ${shCteBody("dcd")}
         SELECT d1, d2, jac FROM (
           SELECT a.doc_id d1, b.doc_id d2,
             round(len(list_intersect(a.hs, b.hs))::DOUBLE
               / len(list_distinct(a.hs || b.hs)), 6) AS jac
           FROM h a JOIN h b ON a.doc_id < b.doc_id)
         WHERE jac >= 0.5 ORDER BY d1, d2""",
    "q_dedup_simhash_pairs_dc" ->
      s"""WITH ${dcdCte(1000L)},
         d AS (SELECT doc_id, string_split(text, ' ') w FROM dcd),
         h AS (SELECT doc_id,
           list_transform(w, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hs
         FROM d),
         sig AS (SELECT doc_id, list_sum(list_transform(range(0, 16), b ->
           CASE WHEN list_sum(list_transform(hs, x -> ((x >> b) & 1) * 2 - 1)) >= 0
                THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS sh16
         FROM h)
         SELECT a.doc_id d1, b.doc_id d2, bit_count(xor(a.sh16, b.sh16))::BIGINT AS dist
         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           AND bit_count(xor(a.sh16, b.sh16)) <= 3
         ORDER BY d1, d2""",
    "q_dedup_lsh_editdist_dc" ->
      s"""WITH ${dcdCte(1000L)}, ${shCteBody("dcd")},
         sig AS (SELECT doc_id, hs,
           [${(0 until 4).map(b => s"concat_ws('_', $b, ${mh(2 * b)}, ${mh(2 * b + 1)})").mkString(", ")}] AS bands
         FROM h),
         banded AS (SELECT doc_id, unnest(bands) AS band FROM sig
                    WHERE len(hs) > 0),
         cand AS (SELECT DISTINCT a.doc_id d1, b.doc_id d2
           FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
         ed AS (SELECT d1, d2, levenshtein(ta.text, tb.text) AS dist,
                  greatest(length(ta.text), length(tb.text)) AS mx
                FROM cand JOIN dcd ta ON ta.doc_id = d1
                          JOIN dcd tb ON tb.doc_id = d2)
         SELECT d1, d2, dist FROM ed WHERE dist * 5 <= mx ORDER BY d1, d2""",
    // Exhaustive O(n²) 64-bit-Hamming scan: banding in the Spark plan is
    // provably lossless (pigeonhole over 4×16-bit bands at dist ≤ 3), so
    // the bucketed join must reproduce the brute-force answer bit-for-bit.
    "q_dedup_simhash_banded" -> {
      def sub(off: Int) =
        s"""list_sum(list_transform(range(0, 16), b ->
           CASE WHEN list_sum(list_transform(hs, x ->
             ((x >> (b + $off)) & 1::UBIGINT)::BIGINT * 2 - 1)) >= 0
           THEN (1::BIGINT << b) ELSE 0 END))::BIGINT"""
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         h AS (SELECT doc_id,
           list_transform(w, t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS hs
         FROM d),
         sig AS (SELECT doc_id, ${sub(0)} AS sh0, ${sub(16)} AS sh1,
           ${sub(32)} AS sh2, ${sub(48)} AS sh3 FROM h)
         SELECT d1, d2, dist FROM (
           SELECT a.doc_id d1, b.doc_id d2,
             (bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1))
              + bit_count(xor(a.sh2, b.sh2)) + bit_count(xor(a.sh3, b.sh3)))::BIGINT AS dist
           FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         WHERE dist <= 3 ORDER BY d1, d2"""
    },
    "q_dedup_paragraph" -> paragraphOracleSql,
    // salting must not change a single value — same oracle
    "q_dedup_paragraph_salted" -> paragraphOracleSql
  )

  private val paragraphOracleSql: String =
    """WITH a AS (SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN text || ' <p> ' ||
           'this site uses cookies accept our policy to continue reading'
         ELSE text END AS aug
       FROM documents),
       sp AS (SELECT doc_id, string_split(aug, ' <p> ') ps FROM a),
       ix AS (SELECT doc_id, ps, unnest(range(1, len(ps) + 1)) AS i FROM sp),
       p AS (SELECT doc_id, i - 1 AS idx, ps[i] AS para FROM ix),
       r AS (SELECT doc_id, idx, para,
               doc_id * 1000000 + idx AS okey,
               min(doc_id * 1000000 + idx)
                 OVER (PARTITION BY md5(para)) AS first_okey
             FROM p)
       SELECT doc_id, count(*) AS n_paras,
         sum(CASE WHEN okey <> first_okey THEN 1 ELSE 0 END)::BIGINT
           AS n_removed,
         md5(coalesce(array_to_string(
           list(para ORDER BY idx) FILTER (WHERE okey = first_okey),
           ' <p> '), '')) AS kept_fp
       FROM r GROUP BY doc_id ORDER BY doc_id"""
}
