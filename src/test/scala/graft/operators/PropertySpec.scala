package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.PipelineFunctions

/** Property tests for the custom operators: TopK against the sort-take
  * reference on arbitrary inputs, and MinHash's Jaccard estimate against
  * exact Jaccard (the property LSH dedup relies on). Raw ScalaCheck Gen
  * with a fixed seed (no scalatest bridge in the dependency set).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(42L + i)))

  test("TopK equals sort-take for arbitrary inputs, sizes, and k") {
    import spark.implicits._
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
      k <- Gen.chooseNum(1, 12)
    } yield (xs, k)
    samples(gen, 20).foreach { case (xs, k) =>
      val got = xs.toDF("v").agg(TopK.topk($"v", k)).head()
        .getSeq[Double](0)
      assert(got == xs.sorted(Ordering[Double].reverse).take(k),
        s"k=$k xs=${xs.take(20)}")
      val gotD = xs.toDF("v").agg(TopK.topkDistinct($"v", k)).head()
        .getSeq[Double](0)
      assert(gotD == xs.distinct.sorted(Ordering[Double].reverse).take(k))
    }
  }

  test("MinHash collision rate estimates Jaccard within tolerance") {
    import spark.implicits._
    // two documents sharing a controlled fraction of shingles
    val shared = (1 to 60).map(i => s"sh$i")
    val aOnly = (1 to 40).map(i => s"ax$i")
    val bOnly = (1 to 40).map(i => s"bx$i")
    val a = shared ++ aOnly
    val b = shared ++ bOnly
    val trueJac = shared.size.toDouble / (shared.size + aOnly.size + bOnly.size)

    val df = Seq(("a", a), ("b", b)).toDF("id", "sh")
      .withColumn("hs", PipelineFunctions.shingleHashes($"sh"))
    val sigs = df.select($"id" +: PipelineFunctions.MinhashPerms.indices.map(i =>
        PipelineFunctions.minhash($"hs", i).as(s"m$i")): _*)
      .collect().map(r => r.getString(0) -> (1 to 8).map(r.getLong)).toMap
    val matches = sigs("a").zip(sigs("b")).count { case (x, y) => x == y }
    val estimate = matches.toDouble / 8
    // 8 permutations → coarse estimate; property is agreement, not precision
    assert(math.abs(estimate - trueJac) <= 0.35,
      s"true=$trueJac est=$estimate")
  }

  test("SimHash Hamming distance is monotone in document similarity") {
    import spark.implicits._
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val near = ((1 to 190).map(i => s"w$i") ++ (1 to 10).map(i => s"x$i")).mkString(" ")
    val far = (1 to 200).map(i => s"z$i").mkString(" ")
    val df = Seq(("base", base), ("near", near), ("far", far)).toDF("id", "text")
      .select($"id", PipelineFunctions.simhash16("split(text, ' ')").as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("base"), m("near")) < ham(m("base"), m("far")),
      s"near=${ham(m("base"), m("near"))} far=${ham(m("base"), m("far"))}")
  }
}
