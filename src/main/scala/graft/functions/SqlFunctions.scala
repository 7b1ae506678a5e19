package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration of the pipeline primitives: Spark 4 SQL UDFs
  * (`CREATE FUNCTION … RETURN <expr>`) are macro-expanded into the calling
  * plan at analysis time, so these stay fully codegen'd — no black-box UDF
  * boundary — while making every dedup/similarity/text primitive usable
  * from plain `spark.sql` text, not just the Scala Column API.
  *
  * Each body is the EXACT expression its Scala twin in
  * [[PipelineFunctions]] builds (same formulas, same fold order, same
  * md5-derived hashing), so results are interchangeable and the same
  * DuckDB oracles apply; SqlFunctionsSpec pins the equivalence.
  */
object SqlFunctions {

  private val P = PipelineFunctions.P

  /** One CREATE per primitive; idempotent (OR REPLACE), session-scoped. */
  def registerAll(spark: SparkSession): Unit = defs.foreach(spark.sql(_))

  private val hash32 = "CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"

  private def defs: Seq[String] = Seq(
    // whitespace tokens (single-space corpus convention)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_tokens(text STRING)
       RETURNS ARRAY<STRING> RETURN split(text, ' ')""",

    // per-word 32-bit md5-prefix hashes (hash32Chain)
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_word_hashes(words ARRAY<STRING>)
       RETURNS ARRAY<BIGINT> RETURN transform(words, w -> $hash32)""",

    // distinct 3-shingle hashes from word hashes (combineShingles3)
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_shingles3(wh ARRAY<BIGINT>)
       RETURNS ARRAY<BIGINT> RETURN
       CASE WHEN size(wh) >= 3 THEN
         array_distinct(transform(sequence(0, size(wh) - 3), i ->
           pmod(pmod(wh[i] * 131L + wh[i + 1], ${P}L) * 131L + wh[i + 2], ${P}L)))
       ELSE CAST(array() AS ARRAY<BIGINT>) END""",

    // MinHash signature element under permutation (a, b) (minhash)
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_minhash(
         hs ARRAY<BIGINT>, a BIGINT, b BIGINT)
       RETURNS BIGINT RETURN
       coalesce(array_min(transform(hs, x -> pmod(a * x + b, ${P}L))), ${P}L)""",

    // exact Jaccard over distinct-element arrays (jaccard)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_jaccard(
         a ARRAY<BIGINT>, b ARRAY<BIGINT>)
       RETURNS DOUBLE RETURN
       CAST(size(array_intersect(a, b)) AS DOUBLE)
         / CAST(size(array_union(a, b)) AS DOUBLE)""",

    // stopword density (stopwordRatio; Stopwords list inlined)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_stopword_ratio(words ARRAY<STRING>)
       RETURNS DOUBLE RETURN
       CAST(size(filter(words, w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
         / CAST(size(words) AS DOUBLE)""",

    // heuristic quality score (qualityScore)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_quality(words ARRAY<STRING>)
       RETURNS DOUBLE RETURN
       least(CAST(size(words) AS DOUBLE) / 200.0, 1.0) * 0.5
         + (CAST(size(array_distinct(words)) AS DOUBLE) / CAST(size(words) AS DOUBLE)) * 0.3
         + (1.0 - CAST(size(filter(words, w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
             / CAST(size(words) AS DOUBLE)) * 0.2""",

    // 16-bit SimHash over the word multiset (simhash16's single-pass fold)
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_simhash16(words ARRAY<STRING>)
       RETURNS BIGINT RETURN
       aggregate(
         transform(
           aggregate(
             transform(words, w -> $hash32),
             array_repeat(0L, 16),
             (acc, x) -> transform(acc, (c, b) -> c + ((x >> b) & 1) * 2 - 1)),
           (c, b) -> IF(c >= 0, shiftleft(1L, b), 0L)),
         0L, (s, v) -> s + v)""",

    // Hamming distance between two SimHash values (hamming)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_hamming(a BIGINT, b BIGINT)
       RETURNS INT RETURN bit_count(a ^ b)""",

    // rolling polynomial fingerprint (polyFingerprint)
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_fingerprint(words ARRAY<STRING>)
       RETURNS BIGINT RETURN
       aggregate(transform(words, w -> $hash32), 0L,
         (h, x) -> pmod(h * 131L + x, ${P}L))""",

    // cosine similarity over double arrays (cosine via the HOF dot fold —
    // same ascending left fold as graft_dot, bit-identical)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_cosine(
         a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
       RETURNS DOUBLE RETURN
       aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
         / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0D, (acc, x) -> acc + x))
            * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)))""")
}
