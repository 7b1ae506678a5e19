package graft.sql

import graft.SparkSpec
import graft.functions.PipelineFunctions

/** The LLM-pipeline primitives surfaced in the HStream dialect (SURVEY §6
  * operators through the 4th frontend): each dialect call must produce the
  * exact value of its Column-API twin in PipelineFunctions — the property
  * that makes the shared DuckDB oracles apply to dialect text. */
class DialectPipelineSpec extends SparkSpec {

  private def e = new SqlEngine(spark)

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words entirely"),
      (4L, "tiny doc")) // <3 words after shingling → empty shingle set
      .toDF("doc_id", "text").createOrReplaceTempView("ddocs")
  }

  private def rows(sql: String) =
    e.sql(sql).asInstanceOf[SqlEngine#Rows].df.orderBy("doc_id").collect()

  test("dialect MINHASH/SHINGLES3/WORD_HASHES/TOKENS == Column API") {
    docs
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = rows(
      """SELECT doc_id, MINHASH(hs, 0) AS m0, MINHASH(hs, 5) AS m5
         FROM (SELECT doc_id, SHINGLES3(WORD_HASHES(TOKENS(text))) AS hs
               FROM ddocs) AS sig;""")
    val want = spark.table("ddocs")
      .withColumn("wh", PipelineFunctions.wordHashes(PipelineFunctions.tokens($"text")))
      .withColumn("hs", PipelineFunctions.combineShingles3($"wh"))
      .select($"doc_id", PipelineFunctions.minhash($"hs", 0).as("m0"),
        PipelineFunctions.minhash($"hs", 5).as("m5"))
      .orderBy("doc_id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("dialect JACCARD and HAMMING and SIMHASH16 == Column API") {
    docs
    import spark.implicits._
    val got = rows(
      """SELECT doc_id,
                JACCARD(SHINGLES3(WORD_HASHES(TOKENS(text))),
                        SHINGLES3(WORD_HASHES(TOKENS('the quick brown fox jumps over the lazy dog')))) AS j,
                SIMHASH16(TOKENS(text)) AS sh
         FROM ddocs WHERE doc_id < 3;""")
    assert(got.length == 2)
    assert(got(0).getDouble(1) == 1.0) // doc 1 vs itself
    assert(got(1).getDouble(1) > 0.5 && got(1).getDouble(1) < 1.0)
    val sh = spark.table("ddocs").filter($"doc_id" < 3)
      .select($"doc_id", PipelineFunctions.simhash16("split(text, ' ')").as("sh"))
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(2)).toSeq == sh.map(_.getLong(1)).toSeq)
    // near-dup docs land within small Hamming distance
    val ham = rows(
      """SELECT 1 AS doc_id, HAMMING(SIMHASH16(TOKENS('the quick brown fox')),
                                     SIMHASH16(TOKENS('the quick brown fox'))) AS h FROM ddocs;""")
    assert(ham.head.getInt(1) == 0)
  }

  test("dialect QUALITY_SCORE / STOPWORD_RATIO / FINGERPRINT / COSINE") {
    docs
    import spark.implicits._
    val got = rows(
      """SELECT doc_id, QUALITY_SCORE(TOKENS(text)) AS q,
                STOPWORD_RATIO(TOKENS(text)) AS sr,
                FINGERPRINT(TOKENS(text)) AS fp
         FROM ddocs WHERE doc_id = 1;""").head
    val want = spark.table("ddocs").filter($"doc_id" === 1)
      .select(PipelineFunctions.qualityScore(PipelineFunctions.tokens($"text")),
        PipelineFunctions.stopwordRatio(PipelineFunctions.tokens($"text")),
        PipelineFunctions.polyFingerprint(PipelineFunctions.tokens($"text")))
      .head()
    assert(got.getDouble(1) == want.getDouble(0))
    assert(got.getDouble(2) == want.getDouble(1))
    assert(got.getLong(3) == want.getLong(2))
    // COSINE over dialect array literals
    val cos = rows(
      "SELECT 1 AS doc_id, COSINE({1.0, 0.0}, {0.0, 1.0}) AS c FROM ddocs;")
    assert(cos.head.getDouble(1) == 0.0)
  }

  test("pipeline fns are typed: MINHASH over a scalar rejects") {
    docs
    val ex = intercept[Exception](
      e.sql("SELECT MINHASH(doc_id, 0) AS m FROM ddocs;"))
    assert(ex.getMessage.toLowerCase.contains("array"))
  }

  test("dialect BUCKET == Column-API hash bucket; typed and literal-checked") {
    docs
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = rows("SELECT doc_id, BUCKET(TO_STR(doc_id), 100) AS b FROM ddocs;")
    val want = spark.table("ddocs")
      .select($"doc_id",
        pmod(PipelineFunctions.hash32($"doc_id".cast("string")), lit(100L)).as("b"))
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(1)).toSeq == want.map(_.getLong(1)).toSeq)
    assert(got.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 100))
    // modulus must be a literal; input must be a string (`this.e`: the
    // functions._ import shadows the engine helper with Euler's number)
    val ex1 = intercept[Exception](
      this.e.sql("SELECT BUCKET(TO_STR(doc_id), doc_id) AS b FROM ddocs;"))
    assert(ex1.getMessage.toLowerCase.contains("literal"))
    val ex2 = intercept[Exception](
      this.e.sql("SELECT BUCKET(doc_id, 100) AS b FROM ddocs;"))
    assert(ex2.getMessage.toLowerCase.contains("string"))
    // modulus 0 would be pmod-by-zero (ANSI abort); negative buckets would
    // make a `< rate` filter always-true; wrong arity gets a real message
    val ex3 = intercept[Exception](
      this.e.sql("SELECT BUCKET(TO_STR(doc_id), 0) AS b FROM ddocs;"))
    assert(ex3.getMessage.toLowerCase.contains("positive"))
    val ex4 = intercept[Exception](
      this.e.sql("SELECT BUCKET(TO_STR(doc_id), -5) AS b FROM ddocs;"))
    assert(ex4.getMessage.toLowerCase.contains("positive"))
    val ex5 = intercept[Exception](
      this.e.sql("SELECT BUCKET(TO_STR(doc_id)) AS b FROM ddocs;"))
    assert(ex5.getMessage.toLowerCase.contains("requires"))
  }
}
