package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the banded-SimHash second-decade probe (r8's
  * simhash_banded ratio100 = 12.02 vs ~10 linear): separates CANDIDATE
  * GROWTH (a property of the corpus's duplicate structure) from plan
  * constants (shuffle/partition scaling — a defect).
  *
  * Per decade (1×, 10×, 100× of sf0.1 documents) it reports:
  *   - bucket_pairs: Σ over (band, bval) buckets of C(n, 2) — exactly the
  *     pair enumerations the cold self-join performs (pre hot-refinement,
  *     pre distinct);
  *   - out_pairs: the verified dist ≤ 3 output pairs.
  *
  * Two ×100 corpus constructions are measured:
  *   - `replica` (the probe's x100Distinct): each doc appears 100× with
  *     ONE token appended — SimHash moves ≤ a few bits, so the 100
  *     replicas of a doc are GENUINE near-dups and any near-dup detector
  *     must emit ~C(100,2) pairs per doc: output (and hence candidate)
  *     growth is quadratic in the replication factor BY CONSTRUCTION.
  *   - `unrelated`: every token carries a replica-unique suffix — replicas
  *     share no content, signatures decorrelate, and a linear plan should
  *     show ~10× time and ~10× candidates per decade.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SimhashDiag"`
  */
object SimhashDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")

    // the probe's construction: id offset + ONE appended token
    def replicas(df: DataFrame, n: Int): DataFrame = (0 until n).map(i =>
      df.withColumn("doc_id", $"doc_id" + lit(i * 10000000L))
        .withColumn("text", concat($"text", lit(s" probe$i"))))
      .reduce(_ unionAll _)
    // content-unrelated: every token suffixed with the replica index, so
    // copies share no tokens and SimHash bits decorrelate
    def unrelated(df: DataFrame, n: Int): DataFrame = (0 until n).map(i =>
      df.withColumn("doc_id", $"doc_id" + lit(i * 10000000L))
        .withColumn("text",
          concat_ws(" ", transform(split($"text", " "),
            w => concat(w, lit(s"_u$i"))))))
      .reduce(_ unionAll _)

    def measure(tag: String, df: DataFrame): Unit = {
      val sig = graft.queries.DedupQueries.simhashSig(df).persist()
      val bands = sig.select($"doc_id",
        explode(array((0 to 3).map(k =>
          struct(lit(k).as("band"), col(s"sh$k").as("bval"))): _*)).as("bk"))
        .select($"bk.band".as("band"), $"bk.bval".as("bval"))
      val t0 = System.nanoTime()
      val bp = bands.groupBy($"band", $"bval").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) DIV 2"))).first().getLong(0)
      val outPairs = graft.queries.DedupQueries
        .simhashBandedPairs(sig, hotThreshold = 1024L).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val nd = sig.count()
      sig.unpersist()
      println(f"""[simhashdiag] {"corpus":"$tag","docs":$nd,""" +
        f""""bucket_pairs":$bp,"out_pairs":$outPairs,"secs":$secs%.2f}""")
    }

    measure("base_1x", docs)
    measure("replica_10x", replicas(docs, 10))
    measure("replica_100x", replicas(docs, 100))
    measure("unrelated_10x", unrelated(docs, 10))
    measure("unrelated_100x", unrelated(docs, 100))
    spark.stop()
  }
}
