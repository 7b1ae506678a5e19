package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import PipelineFunctions._

/** Pins the SQL-UDF surface (SqlFunctions) to its Scala Column twins: each
  * registered function must return byte-identical results to the
  * PipelineFunctions combinator it macro-expands, on real corpus text.
  */
class SqlFunctionsSpec extends SparkSpec {

  private lazy val docs = {
    SqlFunctions.registerAll(spark)
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(50).cache()
  }

  private def assertSame(sqlExpr: String, col: org.apache.spark.sql.Column): Unit = {
    val rows = docs.select(expr(sqlExpr).as("a"), col.as("b")).collect()
    rows.foreach(r => assert(r.get(0) == r.get(1), s"$sqlExpr: ${r.get(0)} != ${r.get(1)}"))
  }

  test("graft_tokens / graft_word_hashes / graft_shingles3 match the Scala twins") {
    docs.createOrReplaceTempView("sqlfn_docs")
    assertSame("graft_tokens(text)", tokens(col("text")))
    assertSame("graft_word_hashes(graft_tokens(text))",
      wordHashes(tokens(col("text"))))
    assertSame("graft_shingles3(graft_word_hashes(graft_tokens(text)))",
      combineShingles3(wordHashes(tokens(col("text")))))
  }

  test("graft_minhash matches minhash for every permutation") {
    MinhashPerms.zipWithIndex.foreach { case ((a, b), i) =>
      assertSame(
        s"graft_minhash(graft_shingles3(graft_word_hashes(graft_tokens(text))), ${a}L, ${b}L)",
        minhash(combineShingles3(wordHashes(tokens(col("text")))), i))
    }
  }

  test("graft_quality / graft_stopword_ratio / graft_fingerprint match") {
    assertSame("graft_quality(graft_tokens(text))", qualityScore(tokens(col("text"))))
    assertSame("graft_stopword_ratio(graft_tokens(text))",
      stopwordRatio(tokens(col("text"))))
    assertSame("graft_fingerprint(graft_tokens(text))",
      polyFingerprint(tokens(col("text"))))
  }

  test("graft_simhash16 + graft_hamming match simhash16 + hamming") {
    assertSame("graft_simhash16(graft_tokens(text))", simhash16("split(text, ' ')"))
    val r = spark.sql("SELECT graft_hamming(5L, 6L)").head()
    assert(r.getInt(0) == 2) // 101 vs 110
  }

  test("graft_jaccard and graft_cosine: plain-SQL near-dup one-liner works") {
    docs.createOrReplaceTempView("sqlfn_docs")
    // the whole LSH verify stage as one SQL expression over two docs
    val j = spark.sql(
      """SELECT graft_jaccard(
           graft_shingles3(graft_word_hashes(graft_tokens(a.text))),
           graft_shingles3(graft_word_hashes(graft_tokens(b.text)))) AS jac
         FROM sqlfn_docs a JOIN sqlfn_docs b ON a.doc_id = b.doc_id""").head()
    assert(j.getDouble(0) == 1.0) // self-similarity is exactly 1
    val c = spark.sql("SELECT graft_cosine(array(1D, 0D), array(0D, 1D))").head()
    assert(c.getDouble(0) == 0.0)
  }
}
