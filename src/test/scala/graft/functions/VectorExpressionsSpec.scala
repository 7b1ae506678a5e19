package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.PipelineFunctions._

/** Native expressions must agree bit-for-bit with the interpreted forms. */
class VectorExpressionsSpec extends SparkSpec {

  test("graft_dot (codegen) equals HOF fold bit-for-bit") {
    import spark.implicits._
    val df = spark.createDataFrame(Seq(
      (1L, Array(0.1, 0.2, 0.3), Array(1.0, -2.0, 3.0)),
      (2L, Array(1e-300, 1e300, -1.0), Array(1e300, 1e-300, 1.0)),
      (3L, Array.empty[Double], Array.empty[Double])
    )).toDF("id", "a", "b")
    assert(spark.catalog.functionExists("graft_dot"), "extension not registered")
    val rows = df.select($"id", call_function("graft_dot", $"a", $"b").as("n"),
      dotHof($"a", $"b").as("h")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
  }

  test("LshWeights literal matrix matches the md5 expression formula") {
    import spark.implicits._
    // one row whose vector isolates dimension d for plane p
    val v = Array.fill(64)(0.0f)
    v(5) = 1.0f
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val exprSig = df.select(lshSignature("embedding", 64).as("s")).head().getLong(0)
    val fastSig = df.select(lshSignatureFast(vecD($"embedding")).as("s")).head().getLong(0)
    assert(exprSig == fastSig)
  }

  test("graft_lsh16 (codegen) equals md5-expression and literal-chain forms") {
    import spark.implicits._
    val vecs = Seq.tabulate(5)(i =>
      (i.toLong, Array.tabulate(64)(d => math.sin(i * 64 + d).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val rows = df.select($"vec_id",
      lshSignature("embedding", 64).as("viaMd5Expr"),
      lshSignatureChain(vecD($"embedding")).as("viaChain"),
      call_function("graft_lsh16", vecD($"embedding")).as("viaNative")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) && r.getLong(2) == r.getLong(3),
        s"vec ${r.getLong(0)}: ${r.getLong(1)} / ${r.getLong(2)} / ${r.getLong(3)}")
    }
  }

  test("graft_hash32 equals the conv/substr/md5 chain exactly") {
    import spark.implicits._
    val df = Seq("", "a", "abc", "the quick brown fox", "héllo wörld", "a b c")
      .toDF("s")
    val rows = df.select(
      call_function("graft_hash32", $"s").as("n"),
      hash32Chain($"s").as("c")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("graft_simhash16_native (codegen) equals the HOF fold on corpus text") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
    // the HOF form, forced (bypasses the native dispatch in simhash16)
    val hof = expr(
      """aggregate(
        |  transform(
        |    aggregate(
        |      transform(split(text, ' '), w -> graft_hash32(w)),
        |      array_repeat(0L, 16),
        |      (acc, x) -> transform(acc, (c, b) -> c + ((x >> b) & 1) * 2 - 1)),
        |    (c, b) -> IF(c >= 0, shiftleft(1L, b), 0L)),
        |  0L, (s, v) -> s + v)""".stripMargin)
    val rows = docs.select($"doc_id",
      call_function("graft_simhash16_native", split($"text", " ")).as("native"),
      hof.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}"))
  }

  test("graft_simhash16_native: null word poisons to NULL like the HOF fold") {
    import spark.implicits._
    val r = spark.range(1)
      .select(call_function("graft_simhash16_native",
        array(lit("a"), lit(null).cast("string"), lit("b"))).as("s"))
      .head()
    assert(r.isNullAt(0))
  }

  test("dot() picks the native function when registered") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assert(df.select(dot($"a", $"b")).head().getDouble(0) == 11.0)
  }

  test("graft_shingles3 equals the combineShingles3∘wordHashes HOF chain, element order included") {
    import spark.implicits._
    import graft.functions.PipelineFunctions._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(100).select($"doc_id", $"text")
      // edge cases the corpus lacks: empty, 1-word, exactly-3-word, and a
      // doc whose repeated words force distinct-dedup to actually fire
      .unionByName(Seq((100001L, ""), (100002L, "one"), (100003L, "a b c"),
        (100004L, "x y x y x y x y")).toDF("doc_id", "text"))
    val rows = docs.select($"doc_id",
      // the native expression directly (not the shingles3 dispatcher — a
      // silent fallback to the HOF form would make this pin vacuous)
      call_function("graft_shingles3_native", tokens($"text")).as("native"),
      combineShingles3(wordHashes(tokens($"text"))).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
      s"doc ${r.getLong(0)}: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}"))
    // null text → EMPTY array, matching the chain's when/otherwise fallthrough
    val nullRow = spark.range(1)
      .select(shingles3(tokens(lit(null).cast("string"))).as("hs")).head()
    assert(!nullRow.isNullAt(0) && nullRow.getSeq[Long](0).isEmpty)
  }
}
