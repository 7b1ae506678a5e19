package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash signature store — the "what we already crawled" state
  * of TRUE incremental cross-corpus dedup. A daily-crawl pipeline computes
  * signatures ONLY for the new batch, probes them against the persisted
  * band table of everything crawled before, and appends the batch's
  * signatures for the next run — the existing corpus's text is never
  * re-tokenized, re-shingled, or re-minhashed. At 100 TB the signature
  * pass IS the bill (one md5 per 3-shingle per doc); this store turns the
  * per-crawl cost from O(corpus) compute into O(batch) compute plus an
  * O(corpus) columnar scan of two thin columns — the same
  * materialized-state pattern the reference serves view pulls from
  * (hstream/src/HStream/Server/Core/View.hs:166-254), applied to the
  * pipeline's most expensive operator.
  *
  * Layout (any Hadoop filesystem):
  * {{{
  *   dir/
  *     b<batchId>-<nonce>/bands/   (doc_id LONG, band STRING)   parquet
  *     b<batchId>-<nonce>/sigs/    (doc_id LONG, hs ARRAY<INT>) parquet
  *     manifest-g<N>.txt           batchId \t leafDir   (one line per batch)
  * }}}
  *
  * Commit protocol (replay-safe): data lands under a fresh nonce dir, then
  * the next-generation manifest — the previous manifest's lines plus the
  * new batch — is written to a `.tmp` path and RENAMED into place (atomic
  * on HDFS and POSIX). Readers list only manifest-referenced dirs, so
  *   - a crash after the data write but before the rename leaves an
  *     orphan nonce dir that no reader ever sees; the retried append
  *     writes a fresh nonce and commits it;
  *   - appending an already-committed batchId is a NO-OP (idempotent), so
  *     an at-least-once driver retry cannot double-count a crawl.
  * Two tables, not one: the band table (two thin columns) is what every
  * probe scans in full; the signature arrays — the fat column — are read
  * only to verify the batch's few surviving candidates. */
object SignatureStore {

  private def fs(dir: String, spark: SparkSession) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** batchId → committed leaf dir, from the newest manifest generation. */
  def committed(spark: SparkSession, dir: String): Map[String, String] = {
    val (hfs, p) = fs(dir, spark)
    if (!hfs.exists(p)) return Map.empty
    val manifests = hfs.listStatus(p)
      .filter(_.getPath.getName.matches("manifest-g\\d+\\.txt"))
      .sortBy(_.getPath.getName.stripPrefix("manifest-g").stripSuffix(".txt").toLong)
    manifests.lastOption.map { st =>
      val in = hfs.open(st.getPath)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      text.linesIterator.filter(_.contains('\t')).map { line =>
        val Array(id, leaf) = line.split("\t", 2)
        id -> leaf
      }.toMap
    }.getOrElse(Map.empty)
  }

  private def nextGen(spark: SparkSession, dir: String): Long = {
    val (hfs, p) = fs(dir, spark)
    if (!hfs.exists(p)) 0L
    else hfs.listStatus(p)
      .filter(_.getPath.getName.matches("manifest-g\\d+\\.txt"))
      .map(_.getPath.getName.stripPrefix("manifest-g").stripSuffix(".txt").toLong)
      .maxOption.map(_ + 1L).getOrElse(0L)
  }

  /** Append one batch's signatures. `sig` must carry (doc_id, hs, bands)
    * — the exact shape `DedupQueries.sigWithBands` emits. Returns true if
    * this call committed the batch, false if it was already committed
    * (idempotent replay).
    *
    * SINGLE WRITER: like a crawl pipeline's ingest step, appends are
    * serialized by the caller (one crawl at a time) — the manifest
    * generation is read-modify-write. Two UNserialized appends racing to
    * the same generation would last-writer-win on filesystems whose
    * rename overwrites (POSIX), dropping the loser's line; on HDFS the
    * loser's rename fails the require instead. Crash-safety (the
    * documented guarantee) is orthogonal and holds either way. */
  def append(spark: SparkSession, dir: String, batchId: String,
             sig: DataFrame): Boolean = {
    require(batchId.matches("[A-Za-z0-9_.-]+"),
      s"batchId must be filesystem-safe, got '$batchId'")
    val before = committed(spark, dir)
    if (before.contains(batchId)) return false
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val leaf = s"b$batchId-$nonce"
    // Degenerate docs (empty shingle set) never enter the band table —
    // same skew guard as the batch pipeline: at store scale, billions of
    // near-empty docs sharing the sentinel band key would make every
    // future probe quadratic.
    val s = sig.persist()
    try {
      s.filter(size(col("hs")) > 0)
        .select(col("doc_id"), explode(col("bands")).as("band"))
        .write.mode("overwrite").parquet(s"$dir/$leaf/bands")
      s.select(col("doc_id"), col("hs"))
        .write.mode("overwrite").parquet(s"$dir/$leaf/sigs")
    } finally s.unpersist()
    val (hfs, _) = fs(dir, spark)
    val gen = nextGen(spark, dir)
    val lines = (before + (batchId -> leaf)).toSeq.sorted
      .map { case (id, l) => s"$id\t$l" }.mkString("\n")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.manifest-g$gen.tmp")
    val out = hfs.create(tmp, true)
    try out.write(lines.getBytes("UTF-8")) finally out.close()
    require(hfs.rename(tmp, new org.apache.hadoop.fs.Path(s"$dir/manifest-g$gen.txt")),
      s"signature-store commit rename failed for batch $batchId gen $gen")
    true
  }

  private def readUnion(spark: SparkSession, dir: String,
                        sub: String): Option[DataFrame] = {
    val leaves = committed(spark, dir).values.toSeq.sorted
    if (leaves.isEmpty) None
    else Some(spark.read.parquet(leaves.map(l => s"$dir/$l/$sub"): _*))
  }

  /** The full committed band table (doc_id, band) — two thin columns; a
    * probe scans this in full, which is the cheap part of LSH. */
  def bands(spark: SparkSession, dir: String): DataFrame =
    readUnion(spark, dir, "bands").getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("band",
            org.apache.spark.sql.types.StringType)))))

  /** The full committed signature table (doc_id, hs). Join this against a
    * candidate set — only the hs pages of row groups holding candidates
    * matter; at store scale, keep the table range-clustered on doc_id so
    * parquet min/max zone maps prune the fat column's reads. */
  def sigs(spark: SparkSession, dir: String): Option[DataFrame] =
    readUnion(spark, dir, "sigs")
}
