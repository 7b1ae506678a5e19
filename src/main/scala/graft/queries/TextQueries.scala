package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.PipelineFunctions._

/** Text-analysis operators for a pretraining-data pipeline over `documents`:
  * token statistics, quality scoring, language-profile scoring, and document
  * fingerprinting. All pure Catalyst expressions (codegen'd, no UDFs) — at
  * 100 TB each document is scored where it lives, no shuffle at all until an
  * aggregation asks for one.
  */
object TextQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // Token counting (whitespace + BPE-ish subtokens), lexical diversity,
    // stopword density, and the composite quality score.
    "q_text_stats" -> ((s, dir) => {
      import s.implicits._
      val w = tokens($"text")
      Tables.load(s, dir, "documents")
        .select(
          $"doc_id",
          size(w).as("n_tokens"),
          subtokenCount($"text").as("n_subtokens"),
          size(array_distinct(w)).as("n_distinct"),
          round(aggregate(transform(w, t => length(t).cast("long")), lit(0L),
            (a, x) => a + x).cast("double") / size(w), 6).as("avg_token_len"),
          round(stopwordRatio(w), 6).as("stop_ratio"),
          round(qualityScore(w), 6).as("quality"))
        .orderBy($"doc_id")
    }),

    // Language-profile scoring: rate of hits against per-profile marker
    // lists, argmax with a deterministic tie-break. Real deployments swap in
    // per-language stopword/charset profiles; the scoring plumbing is what
    // scales (one pass, no shuffle).
    "q_text_langid" -> ((s, dir) => {
      import s.implicits._
      val w = tokens($"text")
      val scores = langScores(w)
      Tables.load(s, dir, "documents")
        .select(Seq($"doc_id") ++
          LangProfiles.zip(scores).map { case ((name, _), sc) =>
            round(sc, 6).as(s"score_$name") } :+
          langPred(w).as("pred"): _*)
        .orderBy($"doc_id")
    }),

    // Text cleaning: normalization pipeline (lowercase, collapse whitespace,
    // strip non-alphanumerics, drop stopwords) — the standard pre-tokenize
    // transform, all codegen'd string/array expressions.
    "q_text_clean" -> ((s, dir) => {
      import s.implicits._
      val normalized = regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " ")
      val words = split(trim(normalized), " ")
      val kept = filter(words, w => !w.isin(Stopwords: _*))
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          size(words).as("n_before"),
          size(kept).as("n_after"),
          array_join(slice(kept, 1, 8), " ").as("head"))
        .orderBy($"doc_id")
    }),


    // Corpus-level statistics: the aggregation a dataset card reports —
    // docs/tokens per language bucket, mean quality, dedup-relevant counts.
    "q_corpus_stats" -> ((s, dir) => {
      import s.implicits._
      val w = tokens($"text")
      Tables.load(s, dir, "documents")
        .select($"lang", size(w).as("n_tokens"),
          round(qualityScore(w), 6).as("q"), md5($"text").as("h"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          // Float averages must be cross-engine deterministic: Spark's
          // partial aggregation sums doubles in partition order, DuckDB
          // sums sequentially, and the 6th decimal can flip. Sum exactly
          // as DECIMAL(38,18) (q carries <=6 decimal places, so the sum is
          // exact), then do ONE double division — order-independent.
          round(sum($"n_tokens").cast("double") / count(lit(1)), 4)
            .as("avg_tokens"),
          round(sum($"q".cast("decimal(38,18)")).cast("double") /
            count(lit(1)), 6).as("avg_quality"),
          countDistinct($"h").as("n_unique"))
        .orderBy($"lang")
    }),

    // CCNet-shape perplexity filtering (Wenzek et al. 2020, public): train
    // a char-trigram LM on the corpus' own lang='en' slice, score every
    // doc by mean negative log-likelihood under it — low avg_nll ≈ "looks
    // like the target distribution", the classic model-based quality
    // signal (complementing DSIR's n-gram importance weights). Add-1
    // smoothing over the observed vocab + one OOV bucket. Scale shape:
    // the LM is a bounded char-trigram table (broadcast both for the
    // probability lookup and the totals); doc trigrams explode from
    // co-located rows, so the per-doc partial agg collapses each doc
    // map-side and the ONLY shuffle carries one row per doc. Per-trigram
    // log-probs round to 7 dp as DECIMAL before the per-doc sum — exact,
    // order-independent, engine-agnostic.
    "q_quality_perplexity" -> ((s, dir) => {
      import s.implicits._
      // the explode amplifies each doc ~n_chars×; spread docs across the
      // cluster BEFORE it so the amplification is parallel. At 100 TB the
      // scan's own splits provide this for free — a single small local
      // parquet file is one split, which would serialize the whole
      // trigram pass into one task.
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang", lower($"text").as("t"))
        .filter(length($"t") >= 3)
        .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      // NOT persisted (r15 A/B): the trigram explode feeds both the LM
      // aggregation and the scoring branch; caching the 5M-row exploded
      // relation measured neutral-to-negative (cache write+read ≈ the
      // recompute) while adding memory pressure — recompute is also the
      // 100 TB-correct choice (guide §5).
      val tris = docs.select($"doc_id", $"lang",
        explode(transform(sequence(lit(1), length($"t") - 2),
          i => $"t".substr(i, lit(3)))).as("tri"))
      val lm = tris.filter($"lang" === "en")
        .groupBy($"tri").agg(count(lit(1)).as("c"))
      // smoothing denominator in-frame via a global window over the
      // bounded LM table (the q_curation_mix pattern — no persist, no
      // extra corpus pass), so lmP is ONE branch off the LM aggregation
      val wAll = Window.partitionBy()
      val lmP = lm
        .withColumn("denom",
          (sum($"c").over(wAll) + count(lit(1)).over(wAll) + 1).cast("double"))
        .select($"tri",
          round(log(($"c" + 1) / $"denom"), 7).cast("decimal(20,7)").as("lp"))
      // OOV default applied AFTER the per-doc aggregation: count misses at
      // trigram level, charge them the default on the O(docs) frame — the
      // 1-row crossJoin never touches the exploded relation
      val dflt = lm.agg((sum($"c") + count(lit(1)) + 1).cast("double").as("dn"))
        .select(round(log(lit(1.0) / $"dn"), 7).cast("decimal(20,7)").as("dflt"))
      tris.join(broadcast(lmP), Seq("tri"), "left")
        .groupBy($"doc_id", $"lang")
        .agg(count(lit(1)).as("n_tri"), sum($"lp").as("sdec"),
          count($"lp").as("n_match"))
        .crossJoin(broadcast(dflt))
        .select($"doc_id", $"lang", $"n_tri",
          round(-(coalesce($"sdec", lit(0).cast("decimal(20,7)")) +
            ($"n_tri" - $"n_match").cast("decimal(13,0)") * $"dflt")
            .cast("double") / $"n_tri", 6).as("avg_nll"))
        .orderBy($"doc_id")
    }),

    // Multi-level corpus stats in ONE pass: ROLLUP (lang, source) computes
    // per-(lang, source), per-lang, and grand-total rows without three
    // scans — at 100 TB the difference between one shuffle and three. The
    // grouping_id bitmask (source = LSB, same as DuckDB's grouping())
    // disambiguates levels; base lang/source are never null, so the
    // '<ALL>' coalesce is unambiguous and keeps ORDER BY engine-agnostic
    // (Spark sorts nulls first, DuckDB last).
    "q_corpus_rollup" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .rollup($"lang", $"source")
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          round(sum($"n_chars").cast("double") / count(lit(1)), 2)
            .as("avg_chars"))
        .select($"gid",
          coalesce($"lang", lit("<ALL>")).as("lang2"),
          coalesce($"source", lit("<ALL>")).as("source2"),
          $"n_docs", $"total_chars", $"avg_chars")
        .orderBy($"gid", $"lang2", $"source2")
    }),

    // The pretraining pipeline END-TO-END: quality-score → filter → exact
    // dedup (planted duplicates, as q_dedup_exact) → per-language dataset
    // stats. One composed plan: scoring is map-side, dedup shuffles only
    // (hash, id, tiny attrs), the final agg is over the deduped survivors —
    // at 100 TB this is the shape of a real corpus-prep job, and Catalyst
    // pipelines all three stages without materializing between them.
    "q_pipeline_quality_dedup" -> ((s, dir) => {
      import s.implicits._
      val w = tokens($"text")
      val d = Tables.load(s, dir, "documents")
      val corpus = d.unionAll(d.filter($"doc_id" % 3 === 0))
      val scored = corpus
        .select($"doc_id", md5($"text").as("h"),
          round(qualityScore(w), 6).as("q"),
          langPred(w).as("pred"))
        .filter($"q" >= 0.5)
      // duplicates share text ⇒ identical (h, q, pred); keep the smallest id
      val deduped = scored.groupBy($"h")
        .agg(min($"doc_id").as("doc_id"), min($"pred").as("pred"),
          min($"q".cast("decimal(38,18)")).as("qd"))
      deduped.groupBy($"pred")
        .agg(count(lit(1)).as("n_docs"),
          round(sum($"qd").cast("double") / count(lit(1)), 6).as("avg_quality"))
        .orderBy($"pred")
    }),

    // Document fingerprinting: content md5, order-sensitive polynomial
    // rolling hash over words, and a 60-bit integer fingerprint.
    "q_text_fingerprint" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(
          $"doc_id",
          md5($"text").as("fp_md5"),
          polyFingerprint(tokens($"text")).as("fp_poly"),
          hash60($"text").as("fp_int60"))
        .orderBy($"doc_id")
    }),

    // Vocabulary build: token → collection frequency + document frequency,
    // floor-filtered — the input of BPE training, stopword discovery, and
    // IDF weighting. The classic word-count shape: explode is map-side,
    // the single shuffle is the partial-agg'd groupBy(token); at 100 TB
    // the tf floor prunes the long hapax tail before any driver contact.
    "q_text_vocab" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", explode(tokens($"text")).as("tok"))
        .groupBy($"tok")
        .agg(count(lit(1)).as("tf"), count_distinct($"doc_id").as("df"))
        .filter($"tf" >= 10)
        .orderBy($"tok")
    }),

    // Token-window chunking: split each doc into 100-token windows —
    // sequence packing for a training pipeline (context-window sharding).
    // Pure per-row compute (transform + posexplode, no shuffle at all);
    // chunk count rides with doc length so output is linear in corpus.
    "q_text_chunks" -> ((s, dir) => {
      import s.implicits._
      chunkRows(Tables.load(s, dir, "documents"), Seq.empty)
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // Sequence PACKING: assign the token-window chunks to fixed 2048-token
    // training bins via a running sum — bin = floor(tokens-before / 2048).
    // Packing is PER-LANGUAGE (partition-parallel windows): a single global
    // running sum would serialize on one partition at 100 TB; per-shard
    // packing is how real pipelines do it (shard = language here).
    "q_text_pack" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"lang").orderBy($"doc_id", $"chunk_idx")
      chunkRows(Tables.load(s, dir, "documents"), Seq("lang"))
        .withColumn("bin",
          floor((sum($"n_tok").over(w) - $"n_tok") / 2048).cast("long"))
        .select($"lang", $"doc_id", $"chunk_idx", $"n_tok", $"bin")
        .orderBy($"lang", $"doc_id", $"chunk_idx")
    }),

    // Gopher-style repetition/quality heuristics (Rae et al. 2021 §A1.1,
    // public): word-count bounds, mean word length, duplicate-word
    // fraction, top-bigram fraction → a keep/drop verdict per doc. The
    // per-doc metrics are map-side HOFs; the top-bigram mode is computed
    // RELATIONALLY (explode → two-level groupBy → max) rather than a
    // per-row scan — mode-within-array is O(len²) per row, and at 100 TB
    // a single doc can be 100k words, while the explode path is the same
    // distributed partial-agg Spark already scales.
    "q_quality_gopher" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val w = tokens($"text")
      val base = docs.select(
        $"doc_id",
        size(w).cast("long").as("n_words"),
        round(aggregate(transform(w, t => length(t).cast("long")), lit(0L),
          (a, x) => a + x).cast("double") / size(w), 6).as("mean_word_len"),
        round(lit(1.0) - size(array_distinct(w)).cast("double") / size(w), 6)
          .as("dup_word_frac"))
      val bigrams = docs.select($"doc_id", explode(
        zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bg"))
      val top = bigrams.groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as("top_bg"))
      base.join(top, Seq("doc_id"), "left")
        .select($"doc_id", $"n_words", $"mean_word_len", $"dup_word_frac",
          when($"n_words" > 1,
            round(coalesce($"top_bg", lit(0L)).cast("double")
              / ($"n_words" - 1), 6)).otherwise(0.0).as("top_bigram_frac"))
        .withColumn("keep",
          $"n_words" >= 30 && $"mean_word_len".between(3.0, 10.0) &&
            $"dup_word_frac" < 0.6 && $"top_bigram_frac" < 0.06)
        .orderBy($"doc_id")
    }),

    // Gopher-style LINE repetition signals (Rae et al. 2021 §A1.1's
    // duplicate-line fraction / duplicate-line CHARACTER fraction — the
    // two §A1.1 signals q_quality_gopher doesn't carry). The corpus has
    // no natural line structure, so "lines" are deterministic 8-word
    // chunks of the token stream (same convention both engines). Scale
    // shape: per-line counts are computed RELATIONALLY (explode → two
    // groupBys with map-side partial aggregation) — a per-row HOF
    // occurrence count would be O(lines²) per doc, fatal on a 100k-word
    // doc; the explode path is the word-count shape Spark already scales.
    "q_quality_repetition" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val w = tokens($"text")
      val lines = docs
        .select($"doc_id", w.as("w"))
        .filter(size($"w") > 0)
        .select($"doc_id", explode(transform(
          sequence(lit(0), ceil(size($"w") / lit(8.0)).cast("int") - 1),
          i => concat_ws(" ", slice($"w", i * 8 + 1, lit(8))))).as("line"))
      lines.groupBy($"doc_id", $"line")
        .agg(count(lit(1)).as("c"))
        .withColumn("cl", length($"line").cast("long"))
        .groupBy($"doc_id")
        .agg(
          sum($"c").cast("long").as("n_lines"),
          round(lit(1.0) - count(lit(1)).cast("double") / sum($"c"), 6)
            .as("dup_line_frac"),
          round(sum(when($"c" > 1, $"cl" * $"c").otherwise(0L)).cast("double")
            / sum($"cl" * $"c"), 6).as("dup_line_char_frac"))
        .orderBy($"doc_id")
    }),

    // Gopher top-n-gram fractions (§A1.1's remaining signals: the
    // fraction of words inside the single most frequent 2-/3-/4-gram) —
    // same relational shape as q_quality_gopher's bigram: n-grams build
    // map-side, counts partial-aggregate, one max per (doc, n). Output is
    // a doc × n matrix — the filter thresholds (0.20/0.18/0.16 in Rae et
    // al.) apply downstream.
    "q_quality_ngram_frac" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val w = tokens($"text")
      val base = docs.select($"doc_id", w.as("w"), size(w).as("nw"))
      val grams = base
        .select($"doc_id", $"w", $"nw",
          explode(array((2 to 4).map(n => lit(n)): _*)).as("n"))
        .filter($"nw" >= $"n")
        .select($"doc_id", $"n", $"nw", explode(transform(
          sequence(lit(0), $"nw" - $"n"),
          i => concat_ws(" ", slice($"w", i + 1, $"n")))).as("g"))
      grams.groupBy($"doc_id", $"n", $"nw", $"g")
        .agg(count(lit(1)).as("c"))
        .groupBy($"doc_id", $"n", $"nw")
        .agg(max($"c").as("top"))
        // occurrences OVERLAP, so count·n can exceed the word count on
        // degenerate docs ('a a a a'); the signal is a FRACTION and the
        // published thresholds assume [0,1] — cap at 1 (both engines)
        .select($"doc_id", $"n".cast("long").as("n"),
          round(least(lit(1.0), $"top" * $"n" / $"nw".cast("double")), 6)
            .as("top_gram_frac"))
        .orderBy($"doc_id", $"n")
    }),

    // Multinomial Naive Bayes language classifier — the fastText-LID /
    // CCNet-filter shape, picked BECAUSE its training is closed-form:
    // the model IS a pair of mergeable count aggregations, so a 100 TB
    // corpus trains in one shuffle keyed by (lang, bucket) — no gradient
    // loop, no driver-side iteration. Features are unigrams hashed into
    // 256 buckets (the pipeline's md5-derived hash32); the 80/20
    // train/held-out split is an independent deterministic hash stream
    // ("nb" prefix). The emitted model is DENSE — every lang × bucket
    // carries an add-1-smoothed log-likelihood — so scoring is a plain
    // inner broadcast join with no unseen-bucket special case.
    "q_quality_nb_model" -> ((s, dir) => {
      import s.implicits._
      nbModelFrom(Tables.load(s, dir, "documents")).orderBy($"lang", $"b")
    }),

    // NB scoring of the held-out 20%: per-(doc, bucket) counts partial-
    // aggregate map-side, the |langs|·256-row model broadcasts, per-
    // (doc, lang) scores are DECIMAL-exact sums of round(7) terms (agg
    // order can never perturb them — the q_curation_dsir discipline), and
    // the argmax is a mergeable max(struct(score, lang)) — no per-doc
    // window, no sort; two shuffles total at any corpus size.
    "q_quality_nb_score" -> ((s, dir) =>
      nbScoreFrom(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // The SERVING twin of q_quality_nb_score (same oracle): the trained
    // model is bounded (|langs|·256 rows) at ANY corpus size, so it
    // collects once and embeds as literal arrays — scoring becomes a pure
    // map-side expression (a per-token decimal fold per language + a
    // greatest(struct) argmax), ZERO shuffles, streaming-safe. Decimal
    // addition is exact and order-independent, so the fold reproduces the
    // batch form's sum(cnt·llk) bit-for-bit — "train batch, serve
    // anywhere" with a hash-proof the two paths agree.
    "q_quality_nb_score_served" -> ((s, dir) =>
      nbServedFrom(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // HASHING-TRICK text embeddings (random-projection/feature-hashing,
    // public classic): each token contributes a deterministic 64-dim
    // integer weight vector (hash-derived, ∈ [-1000, 1000]); the document
    // embedding is their sum, computed in ONE map-side fold per doc —
    // zero shuffle, no model. This bridges the text pack to the ANN pack:
    // the output vectors are exactly what q_ann_lsh_bucketed/IVF consume
    // when no learned embedding exists yet. Integer sums are exact and
    // order-independent, so the long-form output hash-gates directly.
    // Scale note: the fold computes 64 hash32 draws per token; a native
    // expression hashing once per token and bit-mixing 64 ways (the
    // Shingles3 treatment) is the next step if this enters a hot path.
    "q_text_embed_hash" -> ((s, dir) => {
      import s.implicits._
      hashedEmbeddings(Tables.load(s, dir, "documents"))
        .select($"doc_id", posexplode($"e").as(Seq("j", "s")))
        .select($"doc_id", $"j".cast("long").as("j"), $"s")
        .orderBy($"doc_id", $"j")
    }),

    // TEXT ANN end-to-end over the hashed embeddings: top-5 nearest docs
    // per query doc by INTEGER dot product — the whole text→vector→search
    // path with zero models and zero floats (integer dots are exact, so
    // ranks are unconditionally deterministic). Shape: embeddings fold
    // map-side; the 10-query side broadcasts; per-pair dot is one
    // zip_with fold; top-5 via the rank window Spark turns into a
    // partial+final group limit.
    "q_text_embed_ann" -> ((s, dir) => {
      import s.implicits._
      val emb = hashedEmbeddings(Tables.load(s, dir, "documents")).persist()
      val q = emb.filter($"doc_id" < 10)
        .select($"doc_id".as("qid"), $"e".as("qe"))
      val scored = emb.join(broadcast(q), $"doc_id" =!= $"qid")
        .select($"qid", $"doc_id".as("did"),
          aggregate(zip_with($"qe", $"e", (a, b) => a * b), lit(0L),
            (acc, x) => acc + x).as("dot"))
      val w = Window.partitionBy($"qid").orderBy($"dot".desc, $"did")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .select($"qid", $"rnk".cast("long").as("rnk"), $"did", $"dot")
        .orderBy($"qid", $"rnk")
    }),

    // PII redaction — the scrub step of a pretraining pipeline. The
    // synthetic corpus has no natural PII, so deterministic fake PII
    // (derived from doc_id: one email, doc_id%3 IPs, one phone) is
    // INJECTED first and then redacted — the operator under test is the
    // regex scrub, and the counts prove every injected item was found.
    // Pure codegen'd string expressions: zero shuffle at 100 TB.
    "q_text_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phoneRe = "\\+1-555-\\d{4}"
      val ipOnce = concat(lit(" from 10."), pmod($"doc_id", lit(200L)),
        lit(".0."), pmod($"doc_id", lit(250L)))
      val ips = when(pmod($"doc_id", lit(3L)) === 0, lit(""))
        .when(pmod($"doc_id", lit(3L)) === 1, ipOnce)
        .otherwise(concat(ipOnce, ipOnce))
      val aug = concat($"text", lit(" contact user"), $"doc_id",
        lit("@mail.example.com"), ips, lit(" call +1-555-"),
        lpad(pmod($"doc_id", lit(10000L)).cast("string"), 4, "0"))
      val redacted = regexp_replace(regexp_replace(regexp_replace(aug,
        emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>")
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          regexp_count(aug, lit(emailRe)).cast("long").as("n_emails"),
          regexp_count(aug, lit(ipRe)).cast("long").as("n_ips"),
          regexp_count(aug, lit(phoneRe)).cast("long").as("n_phones"),
          redacted.as("redacted"))
        .select($"doc_id", $"n_emails", $"n_ips", $"n_phones",
          expr("right(redacted, 46)").as("tail"),
          md5($"redacted").as("redacted_fp"))
        .orderBy($"doc_id")
    }),

    // Repeated-SPAN collapse — the cleanup for degenerate repetition
    // (stuttered crawls, looping generations): drop a token that repeats
    // its immediate predecessor, and a token that continues an immediately
    // repeated bigram. ONE positional pass over the original indices (a
    // fixpoint re-collapse would be sequential semantics; the single pass
    // is what distributes), pure codegen'd HOFs — zero shuffle at 100 TB.
    "q_text_despan" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", tokens($"text").as("w"))
        .withColumn("kept", filter($"w", (t, i) =>
          !(i >= 1 && t === get($"w", i - 1)) &&
            !(i >= 3 && t === get($"w", i - 2) &&
              get($"w", i - 1) === get($"w", i - 3))))
        .select($"doc_id", size($"w").cast("long").as("n_before"),
          size($"kept").cast("long").as("n_after"),
          md5(array_join($"kept", " ")).as("cleaned_fp"))
        .orderBy($"doc_id")
    }),

    // Per-doc top-3 TF-IDF terms — keyword extraction for retrieval/quality
    // filters, and the repo's demonstration of ANALYTIC window functions
    // (SURVEY §2.8: no OVER clause exists in the reference; free in Spark).
    // Corpus size N is one scalar aggregate (a single count job, broadcast
    // as a literal); ranking shuffles by doc_id only. Scores are rounded
    // BEFORE ranking on both engines so rank ties break identically.
    "q_text_tfidf_top" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val toks = docs.select($"doc_id", explode(tokens($"text")).as("tok"))
      val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      val df = toks.select($"doc_id", $"tok").distinct()
        .groupBy($"tok").agg(count(lit(1)).as("df"))
      val n = docs.count().toDouble
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"tok")
      tf.join(df, "tok")
        .select($"doc_id", $"tok",
          round($"tf" * log(lit(n) / $"df"), 6).as("score"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"doc_id", $"tok", $"score", $"rk")
        .orderBy($"doc_id", $"rk")
    })
  )

  /** 100-token window chunks per doc: (doc_id, extra…, chunk_idx, chunk,
    * n_tok) via transform + posexplode — pure per-row compute, no shuffle.
    * The single chunking definition behind q_text_chunks AND q_text_pack
    * (the 100-token constant and the slice arithmetic live only here). */
  private def chunkRows(docs: org.apache.spark.sql.DataFrame,
                        extra: Seq[String]): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    val keep = $"doc_id" +: extra.map(col)
    docs.select(keep :+ tokens($"text").as("w"): _*)
      .select(keep :+ posexplode(transform(
        sequence(lit(0), floor((size($"w") - 1) / 100).cast("int")),
        i => array_join(slice($"w", i * 100 + 1, lit(100)), " "))): _*)
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
      .withColumn("n_tok", size(split($"chunk", " ")))
  }

  /** (doc_id, e: 64 exact-integer dims) — the hashing-trick embedding
    * fold shared by the long-form gate query, the text-ANN query, and the
    * streaming twin's expression. */
  private[graft] def hashedEmbeddings(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    val wv = (f: org.apache.spark.sql.Column) =>
      transform(sequence(lit(0), lit(63)), j =>
        pmod(hash32(concat(lit("e"), j.cast("string"), lit(" "), f)),
          lit(2001L)) - 1000L)
    val zero = transform(sequence(lit(0), lit(63)), _ => lit(0L))
    docs.select($"doc_id", aggregate(tokens($"text"), zero,
      (acc, t) => zip_with(acc, wv(t), (a, b) => a + b)).as("e"))
  }

  /** Deterministic 0-99 train/held-out split draw — an independent hash
    * stream ("nb" prefix) so it never correlates with feature buckets. */
  private def nbSplit: org.apache.spark.sql.Column =
    pmod(hash32(concat(lit("nb"), col("doc_id").cast("string"))),
      lit(100L))

  /** Dense multinomial-NB model (lang, b, llk): add-1-smoothed hashed-
    * unigram log-likelihoods trained on the deterministic 80% split.
    * Training is ONE mergeable count aggregation keyed by (lang, bucket);
    * densification + smoothing run on the ≤ |langs|·256-row count table
    * (a window over a bounded frame, the q_curation_mix pattern). */
  private[graft] def nbModelFrom(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val train = docs.filter(nbSplit < 80)
    val counts = train
      .select($"lang", explode(tokens($"text")).as("f"))
      .withColumn("b", pmod(hash32($"f"), lit(256L)))
      .groupBy($"lang", $"b").agg(count(lit(1)).as("cnt"))
    val wLang = Window.partitionBy($"lang")
    train.select($"lang").distinct()
      .select($"lang", explode(sequence(lit(0L), lit(255L))).as("b"))
      .join(counts, Seq("lang", "b"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0L)))
      .withColumn("tot", sum($"cnt").over(wLang))
      .select($"lang", $"b",
        round(log(($"cnt" + 1).cast("double") / ($"tot" + 256)), 7).as("llk"))
  }

  /** Train-on-80% + score-the-held-out-20% NB pipeline (shared by the
    * gate query and the ScaleProbe row). Per-(doc, bucket) counts
    * partial-aggregate map-side, the |langs|·256-row model broadcasts,
    * per-(doc, lang) scores are DECIMAL-exact sums of round(7) terms (agg
    * order can never perturb them — the q_curation_dsir discipline), and
    * the argmax is a mergeable max(struct(score, lang)) — no per-doc
    * window, no sort; two shuffles total at any corpus size. */
  private[graft] def nbScoreFrom(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val model = nbModelFrom(docs)
      .select($"lang".as("mlang"), $"b",
        $"llk".cast("decimal(20,7)").as("llk"))
    val wAll = Window.partitionBy()
    val priors = docs.filter(nbSplit < 80)
      .groupBy($"lang").agg(count(lit(1)).as("nd"))
      .withColumn("ntot", sum($"nd").over(wAll))
      .select($"lang".as("mlang"),
        round(log($"nd".cast("double") / $"ntot"), 7)
          .cast("decimal(20,7)").as("lprior"))
    val held = docs.filter(nbSplit >= 80)
      .select($"doc_id", $"lang", explode(tokens($"text")).as("f"))
      .withColumn("b", pmod(hash32($"f"), lit(256L)))
      .groupBy($"doc_id", $"lang", $"b").agg(count(lit(1)).as("cnt"))
    held.join(broadcast(model), Seq("b"))
      .groupBy($"doc_id", $"lang", $"mlang")
      .agg(sum($"cnt".cast("decimal(12,0)") * $"llk").as("sdec"))
      .join(broadcast(priors), Seq("mlang"))
      // cast the (38,7) sum down to (20,7) BEFORE adding the prior: the
      // raw addition's result precision would exceed 38 and Spark reduces
      // SCALE to 6 — a silent half-up quantization the old round(·, 6)
      // masked and the unrounded sf1 compare exposed (r14). The sum is
      // value-bounded far below 10^13, so the downcast is lossless.
      .select($"doc_id", $"lang", $"mlang",
        ($"sdec".cast("decimal(20,7)") + $"lprior").as("sc"))
      .groupBy($"doc_id", $"lang")
      .agg(max(struct($"sc", $"mlang")).as("best"))
      .select($"doc_id", $"lang", $"best.mlang".as("pred"),
        // exact 7-digit decimal -> double, NOT rounded to 6: the cosmetic
        // round landed on decimal half-way points where the two engines'
        // rounding rules legitimately disagree (r14 sf1 find, the DSIR
        // class); the unrounded decimal converts to the identical double
        $"best.sc".cast("double").as("score"),
        ($"best.mlang" === $"lang").as("correct"))
  }

  /** Map-side NB scoring: the trained model (bounded — |langs|·256 llk
    * rows + |langs| priors at any corpus size) collects to the driver once
    * and embeds as array literals; each held-out doc scores with a
    * per-token decimal fold per language and a greatest(struct) argmax.
    * No join, no aggregation, no shuffle — the plan is scan→project→
    * filter, which also makes it legal inside a streaming map stage.
    * Exactness: llk literals are the same round(7) doubles cast to
    * DECIMAL(20,7) as the batch form, and decimal addition is exact and
    * order-independent, so the fold equals sum(cnt·llk) exactly. */
  private[graft] def nbServedFrom(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = nbServeOn(docs, docs)

  /** Train on `docs`' 80% split, score `target`'s held-out rows. `target`
    * may be a STREAMING frame: the scorer is stateless map-side work, so
    * the same expressions serve batch and live streams unchanged. */
  private[graft] def nbServeOn(docs: org.apache.spark.sql.DataFrame,
                               target: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val modelRows = nbModelFrom(docs).collect()
    val llkByLang: Map[String, Seq[Double]] = modelRows
      .groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq }
    val wAll = Window.partitionBy()
    val priorRows = docs.filter(nbSplit < 80)
      .groupBy($"lang").agg(count(lit(1)).as("nd"))
      .withColumn("ntot", sum($"nd").over(wAll))
      .select($"lang",
        round(log($"nd".cast("double") / $"ntot"), 7).as("lprior"))
      .collect()
    val priorByLang: Map[String, Double] =
      priorRows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val langs = llkByLang.keys.toSeq.sorted
    val toks = tokens($"text")
    def scoreFor(lang: String) = {
      val arr = typedLit(llkByLang(lang))
      // acc precision 30: a (30,7)+(20,7) add yields (31,7) — inside
      // Spark's 38-digit cap, so NO minimal-precision-loss scale cut ever
      // fires and every intermediate stays exact at 7 dp (a (38,7) acc
      // would overflow to (38,6) per add and drift off the batch sums)
      val fold = aggregate(toks, lit(0).cast("decimal(30,7)"),
        (acc, t) => (acc + element_at(arr,
          (pmod(hash32(t), lit(256L)) + 1).cast("int"))
          .cast("decimal(20,7)")).cast("decimal(30,7)"))
      fold + lit(priorByLang(lang)).cast("decimal(20,7)")
    }
    val best = greatest(langs.map(l =>
      struct(scoreFor(l).as("sc"), lit(l).as("mlang"))): _*)
    target.filter(nbSplit >= 80)
      .select($"doc_id", $"lang", best.as("best"))
      .select($"doc_id", $"lang", $"best.mlang".as("pred"),
        // exact 7-digit decimal -> double, NOT rounded to 6: the cosmetic
        // round landed on decimal half-way points where the two engines'
        // rounding rules legitimately disagree (r14 sf1 find, the DSIR
        // class); the unrounded decimal converts to the identical double
        $"best.sc".cast("double").as("score"),
        ($"best.mlang" === $"lang").as("correct"))
  }

  override def oracleSql: Map[String, String] = Map(
    "q_quality_ngram_frac" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
           len(string_split(text, ' ')) AS nw FROM documents),
         g AS (SELECT doc_id, n, nw,
                 unnest(list_transform(range(0, nw - n + 1),
                   i -> array_to_string(w[i + 1 : i + n], ' '))) AS g
               FROM d CROSS JOIN (SELECT unnest([2, 3, 4]) AS n)
               WHERE nw >= n),
         cnt AS (SELECT doc_id, n, nw, g, count(*) AS c
                 FROM g GROUP BY doc_id, n, nw, g),
         top AS (SELECT doc_id, n, nw, max(c) AS top
                 FROM cnt GROUP BY doc_id, n, nw)
         SELECT doc_id, n::BIGINT AS n,
           round(least(1.0, top * n / nw::DOUBLE), 6) AS top_gram_frac
         FROM top ORDER BY doc_id, n""",
    "q_quality_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents WHERE len(string_split(text, ' ')) > 0),
         l AS (SELECT doc_id,
                 unnest(list_transform(range(0, (len(w) + 7) // 8),
                   i -> array_to_string(w[i * 8 + 1 : i * 8 + 8], ' '))) AS line
               FROM d),
         g AS (SELECT doc_id, line, count(*) AS c, length(line) AS cl
               FROM l GROUP BY doc_id, line)
         SELECT doc_id,
           sum(c)::BIGINT AS n_lines,
           round(1 - count(*)::DOUBLE / sum(c), 6) AS dup_line_frac,
           round(sum(CASE WHEN c > 1 THEN cl * c ELSE 0 END)::DOUBLE
                 / sum(cl * c), 6) AS dup_line_char_frac
         FROM g GROUP BY doc_id ORDER BY doc_id""",
    "q_text_stats" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') w FROM documents)
         SELECT doc_id,
           len(w) AS n_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subtokens,
           len(list_distinct(w)) AS n_distinct,
           round(list_sum(list_transform(w, t -> len(t)))::DOUBLE / len(w), 6) AS avg_token_len,
           round(len(list_filter(w, t -> t IN ('the','a','of','and','is')))::DOUBLE / len(w), 6) AS stop_ratio,
           round(least(len(w) / 200.0, 1.0) * 0.5
             + (len(list_distinct(w))::DOUBLE / len(w)) * 0.3
             + (1.0 - len(list_filter(w, t -> t IN ('the','a','of','and','is')))::DOUBLE / len(w)) * 0.2,
             6) AS quality
         FROM d ORDER BY doc_id""",
    "q_text_langid" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         sc AS (SELECT doc_id,
           len(list_filter(w, t -> t IN ('the','a','of')))::DOUBLE / len(w) AS s_en,
           len(list_filter(w, t -> t IN ('data','table','query')))::DOUBLE / len(w) AS s_db,
           len(list_filter(w, t -> t IN ('row','value','scan')))::DOUBLE / len(w) AS s_op
         FROM d)
         SELECT doc_id, round(s_en,6) AS score_en, round(s_db,6) AS score_db,
           round(s_op,6) AS score_op,
           CASE WHEN s_en >= s_db AND s_en >= s_op THEN 'en'
                WHEN s_db >= s_op THEN 'db' ELSE 'op' END AS pred
         FROM sc ORDER BY doc_id""",
    "q_text_clean" ->
      """WITH d AS (SELECT doc_id,
           string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') w
         FROM documents),
         k AS (SELECT doc_id, w,
           list_filter(w, t -> t NOT IN ('the','a','of','and','is')) kept
         FROM d)
         SELECT doc_id, len(w) AS n_before, len(kept) AS n_after,
           array_to_string(kept[1:8], ' ') AS head
         FROM k ORDER BY doc_id""",
    "q_corpus_stats" ->
      """WITH d AS (SELECT lang, string_split(text, ' ') w, md5(text) h FROM documents),
         q AS (SELECT lang, len(w) n_tokens, h,
           round(least(len(w) / 200.0, 1.0) * 0.5
             + (len(list_distinct(w))::DOUBLE / len(w)) * 0.3
             + (1.0 - len(list_filter(w, t -> t IN ('the','a','of','and','is')))::DOUBLE / len(w)) * 0.2,
             6) q
         FROM d)
         SELECT lang, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
           round(sum(n_tokens)::DOUBLE / count(*), 4) AS avg_tokens,
           round(CAST(sum(CAST(q AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS avg_quality,
           count(DISTINCT h) AS n_unique
         FROM q GROUP BY lang ORDER BY lang""",
    "q_quality_perplexity" ->
      """WITH d AS (SELECT doc_id, lang, lower(text) t FROM documents
           WHERE len(text) >= 3),
         tri AS (SELECT doc_id, lang,
           unnest(list_transform(range(1, len(t)-1), i -> substr(t, i, 3))) AS tri
           FROM d),
         lm AS (SELECT tri, count(*) c FROM tri WHERE lang='en' GROUP BY tri),
         tot AS (SELECT sum(c) t_total, count(*) v FROM lm),
         lmp AS (SELECT tri, round(ln((c+1)/(t_total+v+1)), 7)::DECIMAL(20,7) lp
           FROM lm, tot),
         sc AS (SELECT doc_id, lang, coalesce(lp,
             (SELECT round(ln(1.0/(t_total+v+1)), 7)::DECIMAL(20,7) FROM tot)) lp2
           FROM tri LEFT JOIN lmp USING (tri))
         SELECT doc_id, lang, count(*) AS n_tri,
           round(-CAST(sum(lp2) AS DOUBLE)/count(*), 6) AS avg_nll
         FROM sc GROUP BY 1, 2 ORDER BY doc_id""",
    "q_corpus_rollup" ->
      """SELECT grouping(lang, source)::BIGINT AS gid,
         coalesce(lang, '<ALL>') AS lang2,
         coalesce(source, '<ALL>') AS source2,
         count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
         round(sum(n_chars)::DOUBLE / count(*), 2) AS avg_chars
         FROM documents GROUP BY ROLLUP (lang, source)
         ORDER BY gid, lang2, source2""",
    "q_pipeline_quality_dedup" ->
      """WITH corpus AS (
           SELECT * FROM documents
           UNION ALL SELECT * FROM documents WHERE doc_id % 3 = 0),
         d AS (SELECT doc_id, md5(text) h, string_split(text, ' ') w FROM corpus),
         sc AS (SELECT doc_id, h,
           round(least(len(w) / 200.0, 1.0) * 0.5
             + (len(list_distinct(w))::DOUBLE / len(w)) * 0.3
             + (1.0 - len(list_filter(w, t -> t IN ('the','a','of','and','is')))::DOUBLE / len(w)) * 0.2,
             6) q,
           len(list_filter(w, t -> t IN ('the','a','of')))::DOUBLE / len(w) s_en,
           len(list_filter(w, t -> t IN ('data','table','query')))::DOUBLE / len(w) s_db,
           len(list_filter(w, t -> t IN ('row','value','scan')))::DOUBLE / len(w) s_op
         FROM d),
         flt AS (SELECT *,
           CASE WHEN s_en >= s_db AND s_en >= s_op THEN 'en'
                WHEN s_db >= s_op THEN 'db' ELSE 'op' END pred
         FROM sc WHERE q >= 0.5),
         ddp AS (SELECT min(doc_id) doc_id, min(pred) pred,
           min(CAST(q AS DECIMAL(38,18))) qd FROM flt GROUP BY h)
         SELECT pred, count(*) AS n_docs,
           round(CAST(sum(qd) AS DOUBLE) / count(*), 6) AS avg_quality
         FROM ddp GROUP BY pred ORDER BY pred""",
    "q_text_fingerprint" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') w FROM documents)
         SELECT doc_id,
           md5(text) AS fp_md5,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(w, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
             (h, x) -> (h * 131 + x) % 1000000007) AS fp_poly,
           ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp_int60
         FROM d ORDER BY doc_id""",
    "q_text_vocab" ->
      """SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents)
         GROUP BY tok HAVING count(*) >= 10 ORDER BY tok""",
    "q_text_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         c AS (SELECT doc_id, w,
                 unnest(range(0,
                   CAST(floor((len(w)-1)/100.0) AS BIGINT) + 1)) AS chunk_idx
               FROM d),
         ch AS (SELECT doc_id, chunk_idx,
                  array_to_string(w[chunk_idx*100+1 : (chunk_idx+1)*100],
                                  ' ') AS chunk
                FROM c)
         SELECT doc_id, chunk_idx, chunk,
                len(string_split(chunk, ' ')) AS n_tok
         FROM ch ORDER BY doc_id, chunk_idx""",
    "q_text_pack" ->
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') w
                    FROM documents),
         c AS (SELECT doc_id, lang, w,
                 unnest(range(0,
                   CAST(floor((len(w)-1)/100.0) AS BIGINT) + 1)) AS chunk_idx
               FROM d),
         ch AS (SELECT doc_id, lang, chunk_idx,
                  len(string_split(
                    array_to_string(w[chunk_idx*100+1 : (chunk_idx+1)*100],
                                    ' '), ' ')) AS n_tok
                FROM c)
         SELECT lang, doc_id, chunk_idx, n_tok,
           CAST(floor((sum(n_tok) OVER (PARTITION BY lang
                                        ORDER BY doc_id, chunk_idx)
                       - n_tok) / 2048.0) AS BIGINT) AS bin
         FROM ch ORDER BY lang, doc_id, chunk_idx""",
    "q_quality_gopher" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         base AS (SELECT doc_id, len(w) AS n_words,
           round(list_sum(list_transform(w, t -> len(t)))::DOUBLE / len(w), 6)
             AS mean_word_len,
           round(1.0 - len(list_distinct(w))::DOUBLE / len(w), 6)
             AS dup_word_frac
         FROM d),
         bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                  i -> w[i] || ' ' || w[i + 1])) AS bg FROM d),
         top AS (SELECT doc_id, max(c) AS top_bg FROM
           (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
           GROUP BY doc_id),
         m AS (SELECT b.doc_id, n_words, mean_word_len, dup_word_frac,
           CASE WHEN n_words > 1 THEN
             round(coalesce(top_bg, 0)::DOUBLE / (n_words - 1), 6)
           ELSE 0.0 END AS top_bigram_frac
         FROM base b LEFT JOIN top USING (doc_id))
         SELECT doc_id, n_words, mean_word_len, dup_word_frac,
           top_bigram_frac,
           (n_words >= 30 AND mean_word_len BETWEEN 3.0 AND 10.0
             AND dup_word_frac < 0.6 AND top_bigram_frac < 0.06) AS keep
         FROM m ORDER BY doc_id""",
    "q_text_pii_redact" ->
      """WITH a AS (SELECT doc_id,
           text || ' contact user' || doc_id::VARCHAR || '@mail.example.com'
             || CASE WHEN doc_id % 3 = 0 THEN ''
                     WHEN doc_id % 3 = 1 THEN
                       ' from 10.' || (doc_id % 200)::VARCHAR || '.0.'
                         || (doc_id % 250)::VARCHAR
                     ELSE repeat(' from 10.' || (doc_id % 200)::VARCHAR
                         || '.0.' || (doc_id % 250)::VARCHAR, 2) END
             || ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             AS aug
         FROM documents),
         r AS (SELECT doc_id, aug,
           regexp_replace(regexp_replace(regexp_replace(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+1-555-\d{4}', '<PHONE>', 'g') AS redacted
         FROM a)
         SELECT doc_id,
           len(regexp_extract_all(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
             AS n_emails,
           len(regexp_extract_all(aug,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips,
           len(regexp_extract_all(aug, '\+1-555-\d{4}'))::BIGINT AS n_phones,
           right(redacted, 46) AS tail,
           md5(redacted) AS redacted_fp
         FROM r ORDER BY doc_id""",
    "q_text_despan" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         k AS (SELECT doc_id, w,
           list_transform(
             list_filter(range(1, len(w) + 1), i ->
               NOT (i >= 2 AND w[i] = w[i-1])
               AND NOT (i >= 4 AND w[i] = w[i-2] AND w[i-1] = w[i-3])),
             i -> w[i]) AS kept
           FROM d)
         SELECT doc_id, len(w) AS n_before, len(kept) AS n_after,
           md5(array_to_string(kept, ' ')) AS cleaned_fp
         FROM k ORDER BY doc_id""",
    "q_text_tfidf_top" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
         n AS (SELECT count(*) AS n FROM documents),
         scored AS (SELECT doc_id, t.tok,
                      round(tf * ln(n.n::DOUBLE / df), 6) AS score
                    FROM tf t JOIN df USING (tok) CROSS JOIN n),
         ranked AS (SELECT doc_id, tok, score,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, tok) AS rk
                    FROM scored)
         SELECT doc_id, tok, score, rk FROM ranked
         WHERE rk <= 3 ORDER BY doc_id, rk""",
    "q_text_embed_hash" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         t AS (SELECT doc_id, unnest(w) AS f FROM d),
         tj AS (SELECT doc_id, f, unnest(range(0, 64)) AS j FROM t),
         s AS (SELECT doc_id, j,
             sum(('0x' || substr(md5('e' || j::VARCHAR || ' ' || f), 1, 8))
               ::BIGINT % 2001 - 1000)::BIGINT AS s
           FROM tj GROUP BY doc_id, j)
         SELECT doc_id, j::BIGINT AS j, s FROM s ORDER BY doc_id, j""",
    "q_text_embed_ann" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         t AS (SELECT doc_id, unnest(w) AS f FROM d),
         tj AS (SELECT doc_id, f, unnest(range(0, 64)) AS j FROM t),
         s AS (SELECT doc_id, j,
             sum(('0x' || substr(md5('e' || j::VARCHAR || ' ' || f), 1, 8))
               ::BIGINT % 2001 - 1000)::BIGINT AS s
           FROM tj GROUP BY doc_id, j),
         q AS (SELECT doc_id AS qid, j, s AS qs FROM s WHERE doc_id < 10),
         dots AS (SELECT q.qid, s.doc_id AS did, sum(q.qs * s.s)::BIGINT AS dot
           FROM q JOIN s ON q.j = s.j AND s.doc_id <> q.qid
           GROUP BY 1, 2),
         r AS (SELECT qid, did, dot,
             row_number() OVER (PARTITION BY qid
               ORDER BY dot DESC, did) AS rnk
           FROM dots)
         SELECT qid, rnk::BIGINT AS rnk, did, dot FROM r
         WHERE rnk <= 5 ORDER BY qid, rnk""",
    "q_quality_nb_model" -> s"""$nbOracleCtes
         SELECT lang, b::BIGINT AS b, llk FROM model ORDER BY lang, b""",
    "q_quality_nb_score" -> nbScoreOracleSql,
    // the map-side serving twin must reproduce the batch scores exactly —
    // same oracle
    "q_quality_nb_score_served" -> nbScoreOracleSql
  )

  private lazy val nbScoreOracleSql: String = s"""$nbOracleCtes,
         modeld AS (SELECT lang AS mlang, b, llk::DECIMAL(20,7) AS llk
                    FROM model),
         priors AS (SELECT lang AS mlang,
                      round(ln(nd::DOUBLE / ntot), 7)::DECIMAL(20,7) AS lprior
                    FROM (SELECT lang, count(*) AS nd,
                            sum(count(*)) OVER () AS ntot
                          FROM d WHERE sp < 80 GROUP BY lang)),
         db AS (SELECT doc_id, lang, b, count(*) AS cnt
                FROM fb WHERE sp >= 80 GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id, db.lang AS lang, m.mlang AS mlang,
                  sum(db.cnt::DECIMAL(12,0) * m.llk) AS sdec
                FROM db JOIN modeld m USING (b) GROUP BY 1, 2, 3),
         sc2 AS (SELECT doc_id, lang, sc.mlang AS mlang,
                  sdec + pr.lprior AS score
                 FROM sc JOIN priors pr ON pr.mlang = sc.mlang),
         best AS (SELECT doc_id, lang, mlang, score,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, mlang DESC) AS rk
                  FROM sc2)
         SELECT doc_id, lang, mlang AS pred, score::DOUBLE AS score,
           (mlang = lang) AS correct
         FROM best WHERE rk = 1 ORDER BY doc_id"""

  /** Shared NB oracle pipeline: split draw, hashed-unigram buckets, and
    * the dense add-1-smoothed model — the same formulas as nbModelFrom,
    * re-derived in DuckDB SQL. */
  private val nbOracleCtes: String =
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w,
             ('0x' || substr(md5('nb' || doc_id::VARCHAR), 1, 8))::BIGINT % 100
               AS sp
           FROM documents),
         f AS (SELECT doc_id, lang, sp, unnest(w) AS f FROM d),
         fb AS (SELECT doc_id, lang, sp,
                  ('0x' || substr(md5(f), 1, 8))::BIGINT % 256 AS b FROM f),
         cnts AS (SELECT lang, b, count(*) AS cnt
                  FROM fb WHERE sp < 80 GROUP BY 1, 2),
         langs AS (SELECT DISTINCT lang FROM d WHERE sp < 80),
         dense AS (SELECT l.lang, r.range AS b, coalesce(c.cnt, 0) AS cnt
                   FROM langs l CROSS JOIN range(0, 256) r
                   LEFT JOIN cnts c ON c.lang = l.lang AND c.b = r.range),
         model AS (SELECT lang, b,
                     round(ln((cnt + 1)::DOUBLE / (tot + 256)), 7) AS llk
                   FROM (SELECT lang, b, cnt,
                           sum(cnt) OVER (PARTITION BY lang) AS tot
                         FROM dense))"""
}
