package graft.sql

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Randomized EQUIVALENCE properties for the r8 parse-time desugars: each
  * sugar form must produce exactly the rows of its hand-written expansion
  * through the same engine, on arbitrary data. Raw ScalaCheck Gen with
  * fixed seeds (no scalatest bridge in the dependency set). */
class DesugarPropertySpec extends SparkSpec {

  private lazy val e = new SqlEngine(spark)

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(77L + i)))

  private def rows(sql: String): Seq[String] =
    e.batch(sql).collect().map(_.toString).toSeq

  private val tableGen = for {
    n <- Gen.chooseNum(1, 40)
    ks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    vs <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
  } yield ks.zip(vs).zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }

  test("FILTER (WHERE …) ≡ CASE expansion on arbitrary data") {
    import spark.implicits._
    samples(tableGen, 8).foreach { data =>
      data.toDF("i", "k", "v").createOrReplaceTempView("dp_t")
      val sugar = rows(
        """SELECT k, COUNT(*) FILTER (WHERE v > 0) AS c,
                  SUM(v) FILTER (WHERE v > 0) AS s,
                  MAX(v) FILTER (WHERE v < 0) AS m
           FROM dp_t GROUP BY k ORDER BY k;""")
      val expanded = rows(
        """SELECT k, COUNT(CASE WHEN v > 0 THEN 1 END) AS c,
                  SUM(CASE WHEN v > 0 THEN v END) AS s,
                  MAX(CASE WHEN v < 0 THEN v END) AS m
           FROM dp_t GROUP BY k ORDER BY k;""")
      assert(sugar == expanded, s"FILTER mismatch on ${data.take(8)}")
    }
  }

  test("GROUP BY ALL ≡ explicit key list on arbitrary data") {
    import spark.implicits._
    samples(tableGen, 8).foreach { data =>
      data.toDF("i", "k", "v").createOrReplaceTempView("dp_t")
      val sugar = rows(
        "SELECT k, COUNT(*) AS c, SUM(v) AS s FROM dp_t GROUP BY ALL ORDER BY k;")
      val explicit = rows(
        "SELECT k, COUNT(*) AS c, SUM(v) AS s FROM dp_t GROUP BY k ORDER BY k;")
      assert(sugar == explicit, s"GROUP BY ALL mismatch on ${data.take(8)}")
    }
  }

  test("GROUPS frame ≡ RANGE over dense_rank expansion on arbitrary data") {
    import spark.implicits._
    samples(tableGen, 8).foreach { data =>
      data.toDF("i", "k", "v").createOrReplaceTempView("dp_t")
      val sugar = rows(
        """SELECT i, SUM(v) OVER (PARTITION BY k ORDER BY v
             GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
           FROM dp_t ORDER BY i;""")
      // the definitional expansion, hand-written through a FROM-subquery
      val expanded = rows(
        """SELECT i, SUM(v) OVER (PARTITION BY k ORDER BY dr
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
           FROM (SELECT i, k, v,
                   DENSE_RANK() OVER (PARTITION BY k ORDER BY v) AS dr
                 FROM dp_t) AS sub
           ORDER BY i;""")
      assert(sugar == expanded, s"GROUPS mismatch on ${data.take(8)}")
    }
  }

  test("ORDER BY ALL ≡ explicit column list on arbitrary data") {
    import spark.implicits._
    samples(tableGen, 8).foreach { data =>
      data.toDF("i", "k", "v").createOrReplaceTempView("dp_t")
      val sugar = rows("SELECT k, v, i FROM dp_t ORDER BY ALL;")
      val explicit = rows("SELECT k, v, i FROM dp_t ORDER BY k, v, i;")
      assert(sugar == explicit, s"ORDER BY ALL mismatch on ${data.take(8)}")
    }
  }
}
