package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Large-scale training-data pipeline primitives: deterministic hashing,
  * shingling, MinHash, SimHash, rolling-hash fingerprints, and embedding
  * vector math — the beyond-reference operator set (SURVEY §7.2 step 8).
  *
  * Design rules for 100 TB:
  *   - Everything is a Catalyst expression over built-ins (md5, conv,
  *     higher-order array functions) — whole-stage codegen, no UDFs, no
  *     driver-side loops; each doc/vector is processed where it lives.
  *   - All hashes are md5-derived so results are deterministic and
  *     reproducible across engines, runs, and partitionings (the DuckDB
  *     oracle computes bit-identical values).
  *   - Fold-based sums (`aggregate`) are sequential left folds, so floating
  *     point results are partition-independent for a given row.
  */
object PipelineFunctions {

  /** Modulus for MinHash/rolling-hash arithmetic: the classic 1e9+7 prime.
    * Small enough that a*x+b stays far below Long overflow (ANSI mode). */
  val P: Long = 1000000007L

  /** (a, b) parameters of the 8 MinHash permutations h_i(x) = (a*x+b) mod P. */
  val MinhashPerms: Seq[(Long, Long)] = Seq(
    (999999937L, 12345L), (887L, 54321L), (104729L, 7L), (15485863L, 999L),
    (32452843L, 31L), (49979687L, 77L), (67867967L, 101L), (86028121L, 5L))

  // ---- deterministic hashing ----------------------------------------------

  /** 60-bit hash of a string via md5 prefix (cross-engine deterministic). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit hash of a string via md5 prefix — the unit of MinHash/SimHash.
    * Native digest-bytes expression when registered (no hex round trip),
    * else the equivalent conv/substr/md5 chain; identical values. */
  def hash32(c: Column): Column =
    if (org.apache.spark.sql.SparkSession.getActiveSession
        .exists(_.catalog.functionExists("graft_hash32")))
      call_function("graft_hash32", c)
    else hash32Chain(c)

  /** Extension-free fallback chain (also the oracle's formula). */
  def hash32Chain(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Polynomial rolling-hash fingerprint of a word array:
    * fold h = (h*131 + hash32(word)) mod P. Order-sensitive, so it
    * fingerprints the document content, not just its word set. */
  def polyFingerprint(words: Column): Column =
    aggregate(transform(words, w => hash32(w)), lit(0L),
      (h, x) => pmod(h * lit(131L) + x, lit(P)))

  // ---- shingling + MinHash -------------------------------------------------

  /** Whitespace tokens (single-space convention, matching the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles joined by spaces; empty array when the doc is
    * shorter than n words. */
  def shingles(words: Column, n: Int): Column =
    when(size(words) >= n,
      array_distinct(transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** 32-bit hashes of each shingle. */
  def shingleHashes(sh: Column): Column = transform(sh, s => hash32(s))

  /** Per-word 32-bit hashes — materialize this as a column (withColumn)
    * before calling [[combineShingles3]]: HOF expressions inline at every
    * reference site, so an unmaterialized wh would be recomputed per get. */
  def wordHashes(words: Column): Column = transform(words, w => hash32(w))

  /** Distinct 3-shingle hashes computed WITHOUT building shingle strings:
    * combine consecutive word-hashes with a rolling polynomial —
    * s_i = ((wh_i·131 + wh_{i+1}) mod P · 131 + wh_{i+2}) mod P. Profiling
    * shows shingle-string construction (not hashing) dominates the string
    * path; this does ~word-count hashes instead of ~3× that many string
    * builds + hashes. Cross-engine reproducible from the word-hash formula.
    * @param wh a MATERIALIZED word-hash array column */
  def combineShingles3(wh: Column): Column =
    when(size(wh) >= 3,
      array_distinct(transform(sequence(lit(0), size(wh) - 3), i =>
        pmod(pmod(get(wh, i) * lit(131L) + get(wh, i + 1), lit(P)) * lit(131L)
          + get(wh, i + 2), lit(P)))))
      .otherwise(array().cast("array<long>"))

  /** Distinct 3-shingle hashes straight from the token array — ONE native
    * codegen pass (hash → rolling combine → distinct) when the session has
    * GraftExtensions, the [[combineShingles3]]∘[[wordHashes]] HOF chain
    * otherwise. Prefer THIS over the chain: when CollapseProject inlines
    * the word-hash transform into every `get(wh, i)` reference site, each
    * element access re-evaluates the whole O(words) transform — O(words²)
    * md5 digests per doc, repeated per plan node (a 25× slowdown on the
    * sf0.1 hot-ngrams scan). Bit-identical output either way (same hashes,
    * same polynomial, same first-occurrence distinct order); null words →
    * empty, matching the chain's `when/otherwise` null fallthrough. */
  def shingles3(words: Column): Column =
    if (org.apache.spark.sql.SparkSession.getActiveSession
        .exists(_.catalog.functionExists("graft_shingles3_native")))
      coalesce(call_function("graft_shingles3_native", words), array().cast("array<long>"))
    else combineShingles3(wordHashes(words))

  /** MinHash signature element i: min over shingle hashes of (a*x+b) mod P.
    * NULL (encoded as P, an impossible hash) for empty shingle sets. */
  def minhash(hs: Column, i: Int): Column = {
    val (a, b) = MinhashPerms(i)
    coalesce(array_min(transform(hs, x => pmod(lit(a) * x + lit(b), lit(P)))), lit(P))
  }

  /** Exact n-gram Jaccard similarity of two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  // ---- SimHash -------------------------------------------------------------

  /** 16-bit SimHash over the word multiset: bit b of the result is set when
    * the signed sum of bit b across all word hashes is >= 0. Near-duplicate
    * docs land within small Hamming distance.
    *
    * Single pass over the word hashes, accumulating all 16 signed bit
    * counters in one array fold (a 16-scan per-bit formulation computes the
    * same integers — order-independent — at 16× the cost). Uses the native
    * codegen'd expression (VectorExpressions.SimHash16 — one loop, no
    * per-word intermediate arrays) when the session has GraftExtensions;
    * bit-identical signatures either way. SQL-lambda fallback form because
    * bit shifts by a lambda variable need expression-level shifts.
    * @param wordsExpr SQL expression string yielding an array<string> */
  def simhash16(wordsExpr: String): Column = {
    if (org.apache.spark.sql.SparkSession.getActiveSession
        .exists(_.catalog.functionExists("graft_simhash16_native")))
      return call_function("graft_simhash16_native", expr(wordsExpr))
    val h =
      if (org.apache.spark.sql.SparkSession.getActiveSession
          .exists(_.catalog.functionExists("graft_hash32"))) "graft_hash32(w)"
      else "CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"
    expr(
      s"""aggregate(
         |  transform(
         |    aggregate(
         |      transform($wordsExpr, w -> $h),
         |      array_repeat(0L, 16),
         |      (acc, x) -> transform(acc, (c, b) -> c + ((x >> b) & 1) * 2 - 1)),
         |    (c, b) -> IF(c >= 0, shiftleft(1L, b), 0L)),
         |  0L, (s, v) -> s + v)""".stripMargin)
  }

  /** Column-input SimHash16 (for callers that hold a Column, e.g. the
    * dialect's SIMHASH16 function): native codegen'd expression when the
    * session has GraftExtensions, else a per-bit 16-scan Column fold —
    * order-independent signed sums, so bit-identical signatures to the
    * single-pass forms above at 16× the fallback cost. */
  def simhash16Col(words: Column): Column = {
    if (org.apache.spark.sql.SparkSession.getActiveSession
        .exists(_.catalog.functionExists("graft_simhash16_native")))
      return call_function("graft_simhash16_native", words)
    val wh = transform(words, w => hash32(w))
    (0 until 16).map { b =>
      val cnt = aggregate(wh, lit(0L),
        (acc, x) => acc + shiftright(x, b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
      when(cnt >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** One 16-bit band (bits [off, off+16) over 64-bit md5-prefix word
    * hashes) of a 64-bit SimHash — see VectorExpressions.SimHashBand for
    * the banding math. Native-only: the band decomposition exists FOR the
    * bucketed join, which only runs where GraftExtensions is installed
    * (every entrypoint session — Verify/Bench/SqlEngine/tests). */
  def simhashBand(words: Column, off: Int): Column = {
    require(Seq(0, 16, 32, 48).contains(off), s"bad band offset $off")
    requireNative("graft_simhash_band")
    call_function("graft_simhash_band", words, lit(off))
  }

  /** All four bands at once as array<long> [sh0..sh3] — one md5 digest per
    * word instead of four (VectorExpressions.SimHashBands). Native-only,
    * like [[simhashBand]]. */
  def simhashBands(words: Column): Column = {
    requireNative("graft_simhash_bands")
    call_function("graft_simhash_bands", words)
  }

  /** Distinguish "no active session on this thread" from "session lacks
    * GraftExtensions" — the two failure modes need different fixes, and a
    * message blaming the extension when no session exists sends the caller
    * down the wrong path. */
  private def requireNative(fn: String): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case None => throw new IllegalStateException(
        s"$fn: no active SparkSession on this thread — build/getOrCreate the " +
          "session (with spark.sql.extensions=graft.functions.GraftExtensions) " +
          "before constructing this Column")
      case Some(s) if !s.catalog.functionExists(fn) =>
        throw new IllegalStateException(
          s"$fn: active session lacks GraftExtensions — set " +
            "spark.sql.extensions=graft.functions.GraftExtensions at session build")
      case _ => ()
    }

  // ---- embedding vector math ----------------------------------------------

  /** Cast a float array column to double for stable arithmetic. */
  def vecD(a: Column): Column = transform(a, x => x.cast("double"))

  /** Dot product: the codegen'd native expression (VectorExpressions.scala)
    * when the session has GraftExtensions, else the HOF fold. Both are the
    * same ascending left fold (bit-identical results, and matching the
    * oracle engine's list_reduce). */
  def dot(a: Column, b: Column): Column =
    if (org.apache.spark.sql.SparkSession.getActiveSession
        .exists(_.catalog.functionExists("graft_dot")))
      call_function("graft_dot", a, b)
    else dotHof(a, b)

  /** Interpreted fallback fold (used when the extension isn't registered). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalized double vector — the one-expression form of normVecs
    * (SimilarityQueries), surfaced to the dialect as L2NORMALIZE. The norm
    * is an outer reference inside the HOF lambda; codegen subexpression
    * elimination computes it once per row, not once per element. */
  def l2normalize(a: Column): Column = {
    val v = vecD(a)
    transform(v, x => x / l2norm(v))
  }

  /** int8 min/max quantization codes — EXACTLY SimilarityQueries.quantize's
    * codec (one rounding site: round(..., 0) to long), as a single column
    * expression for the dialect's QUANTIZE_INT8. */
  def quantizeInt8(a: Column): Column = {
    val v = vecD(a)
    val mn = array_min(v)
    val scale = (array_max(v) - mn) / 255.0
    transform(v, x => when(scale === 0, lit(0L))
      .otherwise(round((x - mn) / scale, 0).cast("long")))
  }

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** The 16×64 random-hyperplane weight matrix, computed ONCE driver-side
    * with the exact md5 formula [[lshSignature]] evaluates per row — the
    * values are bit-identical, so results (and the DuckDB oracle) don't
    * change, but the per-row cost drops from 1024 md5 calls to pure
    * arithmetic. This is the 100 TB form; the expression-level variant
    * documents the derivation. */
  lazy val LshWeights: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(16, 64) { (p, d) =>
      md.reset()
      val hex = md.digest(s"h${p}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      ((java.lang.Long.parseLong(hex, 16) % 2001) - 1000) / 1000.0
    }
  }

  /** LSH signature from the precomputed weight matrix over a double array:
    * the native codegen'd expression when registered (a 1024-literal
    * expression chain overflows codegen method limits and interprets),
    * else the literal chain. Identical output either way (same values,
    * same left-to-right summation order). */
  def lshSignatureFast(v: Column): Column =
    if (org.apache.spark.sql.SparkSession.getActiveSession
        .exists(_.catalog.functionExists("graft_lsh16")))
      call_function("graft_lsh16", v)
    else lshSignatureChain(v)

  /** Literal-chain form (extension-free fallback). */
  def lshSignatureChain(v: Column): Column =
    (0 until 16).map { p =>
      val proj = (0 until 64).map(d => lit(LshWeights(p)(d)) * v.getItem(d))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** 16-bit random-hyperplane LSH signature of an embedding (SimHash for
    * vectors): plane p has md5-derived weights w(p,d) in [-1, 1]; bit p is
    * the sign of the projection. Cosine-similar vectors collide in high bits.
    * @param vecExpr SQL expression string yielding array<float/double>
    * @param dim     embedding dimensionality */
  def lshSignature(vecExpr: String, dim: Int, planes: Int = 16): Column = expr(
    s"""aggregate(sequence(0, ${planes - 1}), 0L, (acc, p) -> acc +
       |  CASE WHEN aggregate(sequence(0, ${dim - 1}), 0D, (s, d) -> s +
       |    (CAST(conv(substring(md5(concat('h', CAST(p AS STRING), '_', CAST(d AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2001 - 1000) / 1000.0
       |      * CAST(element_at($vecExpr, d + 1) AS DOUBLE)) >= 0
       |  THEN shiftleft(1L, p) ELSE 0L END)""".stripMargin)

  // ---- text statistics -----------------------------------------------------

  /** English-ish function words used by the quality/lang heuristics. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(words: Column): Column =
    size(filter(words, w => w.isin(Stopwords: _*))).cast("double") /
      size(words).cast("double")

  /** BPE-ish subtoken count: alpha runs, digit runs, and single symbols. */
  def subtokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Heuristic quality score in [0,1]: length saturation + lexical diversity
    * + non-stopword density, the standard cheap pretraining-corpus filter. */
  def qualityScore(words: Column): Column = {
    val n = size(words).cast("double")
    val diversity = size(array_distinct(words)).cast("double") / n
    least(n / lit(200.0), lit(1.0)) * lit(0.5) +
      diversity * lit(0.3) + (lit(1.0) - stopwordRatio(words)) * lit(0.2)
  }

  // ---- language-profile scoring (one definition for every consumer) --------

  /** Per-profile marker lists. Real deployments swap in per-language
    * stopword/charset profiles; the scoring plumbing is what scales. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "db" -> Seq("data", "table", "query"),
    "op" -> Seq("row", "value", "scan"))

  /** Fraction of tokens hitting a marker list. */
  def markerRate(words: Column, markers: Seq[String]): Column =
    size(filter(words, t => t.isin(markers: _*))).cast("double") / size(words)

  /** Profile scores in LangProfiles order. */
  def langScores(words: Column): Seq[Column] =
    LangProfiles.map { case (_, markers) => markerRate(words, markers) }

  /** Argmax profile with deterministic first-wins tie-break. */
  def langPred(words: Column): Column = {
    val Seq(sEn, sDb, sOp) = langScores(words)
    when(sEn >= sDb && sEn >= sOp, "en").when(sDb >= sOp, "db").otherwise("op")
  }
}
