package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted signature store behind TRUE incremental dedup: commit
  * protocol (idempotent append, orphan data invisible), read-back
  * fidelity, and store-path ≡ in-memory-path result equality. */
class SignatureStoreSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("sigstore_spec").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def sigOf(df: org.apache.spark.sql.DataFrame) =
    graft.queries.DedupQueries.sigWithBands(df)
      .select(col("doc_id"), col("hs"), col("bands"))

  test("append is idempotent per batchId; read-back = written") {
    val dir = tmpDir()
    val d = docs(1L -> "alpha beta gamma delta", 2L -> "one two three four five")
    assert(SignatureStore.append(spark, dir, "b1", sigOf(d)))
    val n1 = SignatureStore.bands(spark, dir).count()
    // replay of an already-committed batch: no-op, no double count
    assert(!SignatureStore.append(spark, dir, "b1", sigOf(d)))
    assert(SignatureStore.bands(spark, dir).count() == n1)
    assert(SignatureStore.committed(spark, dir).keySet == Set("b1"))
    // signatures round-trip exactly
    val back = SignatureStore.sigs(spark, dir).get
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Any](1)))
    val exp = sigOf(d).select(col("doc_id"), col("hs"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Any](1)))
    assert(back.toSeq == exp.toSeq)
  }

  test("orphan data dir (crash before manifest rename) is invisible") {
    val dir = tmpDir()
    val d = docs(1L -> "alpha beta gamma delta")
    assert(SignatureStore.append(spark, dir, "b1", sigOf(d)))
    // simulate a crash AFTER the data write, BEFORE the manifest commit:
    // data lands under a nonce dir no manifest references
    sigOf(docs(9L -> "orphan words never seen here"))
      .select(col("doc_id"), explode(col("bands")).as("band"))
      .write.parquet(s"$dir/borphan-dead00/bands")
    assert(!SignatureStore.bands(spark, dir).collect().map(_.getLong(0)).contains(9L))
    // the retried append (fresh nonce) commits and becomes visible
    assert(SignatureStore.append(spark, dir, "b2",
      sigOf(docs(9L -> "orphan words never seen here"))))
    assert(SignatureStore.bands(spark, dir).select("doc_id")
      .distinct().collect().map(_.getLong(0)).toSet == Set(1L, 9L))
  }

  test("multi-batch append accumulates; degenerate docs never band") {
    val dir = tmpDir()
    SignatureStore.append(spark, dir, "b1", sigOf(docs(1L -> "a b c d e")))
    SignatureStore.append(spark, dir, "b2", sigOf(docs(2L -> "f g h i j")))
    // a 2-word doc has an empty shingle set → sigs row, zero band rows
    SignatureStore.append(spark, dir, "b3", sigOf(docs(3L -> "ab cd")))
    assert(SignatureStore.committed(spark, dir).keySet == Set("b1", "b2", "b3"))
    assert(SignatureStore.bands(spark, dir).select("doc_id")
      .distinct().collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(SignatureStore.sigs(spark, dir).get.count() == 3)
  }

  test("plan pin: the candidate join scans ONLY the store's thin band table") {
    import org.apache.spark.sql.functions.{col, explode, size}
    val dir = tmpDir()
    SignatureStore.append(spark, dir, "corpus",
      sigOf(docs(1L -> "alpha beta gamma delta", 2L -> "one two three four")))
    // the probe's candidate stage: new-batch bands x store bands — the
    // store side must read (doc_id, band) ONLY, never the fat hs arrays
    val newBanded = sigOf(docs(9L -> "alpha beta gamma delta"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id").as("new_id"), explode(col("bands")).as("band"))
    val cand = newBanded.join(SignatureStore.bands(spark, dir), "band")
    val scans = cand.queryExecution.executedPlan.toString
      .split("Scan parquet").toSeq.tail
    val storeScan = scans.find(_.contains("/bands"))
    assert(storeScan.isDefined, scans.mkString("\n---\n").take(2000))
    val read = storeScan.get.split("ReadSchema").lift(1).getOrElse("")
    assert(read.contains("doc_id") && read.contains("band") &&
      !read.contains("hs"), read.take(500))
  }

  test("compaction folds leaves, preserves contents, idempotence, and appendability") {
    import spark.implicits._
    val dir = tmpDir()
    val d1 = docs(1L -> "alpha beta gamma delta epsilon")
    val d2 = docs(2L -> "one two three four five six")
    val d3 = docs(3L -> "red orange yellow green blue indigo")
    Seq("b1" -> d1, "b2" -> d2, "b3" -> d3).foreach { case (id, d) =>
      SignatureStore.append(spark, dir, id, sigOf(d)) }
    val bandsBefore = SignatureStore.bands(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val sigsBefore = SignatureStore.sigs(spark, dir).get
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Any](1))).toSeq
    // below threshold: no-op; above: folds all three
    assert(SignatureStore.compactIfNeeded(spark, dir, 3) == 0)
    assert(SignatureStore.compactIfNeeded(spark, dir, 2) == 3)
    val after = SignatureStore.committed(spark, dir)
    assert(after.keySet == Set("b1", "b2", "b3")) // every batchId survives
    assert(after.values.toSeq.distinct.size == 1) // …pointing at ONE leaf
    assert(SignatureStore.bands(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq == bandsBefore)
    assert(SignatureStore.sigs(spark, dir).get
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1))).toSeq == sigsBefore)
    // append idempotence survives compaction (batchIds still committed)
    assert(!SignatureStore.append(spark, dir, "b2", sigOf(d2)))
    // and a fresh append after compaction is visible alongside the fold
    assert(SignatureStore.append(spark, dir, "b4",
      sigOf(docs(4L -> "violet gray black white silver gold"))))
    assert(SignatureStore.sigs(spark, dir).get.count() == 4)
    // re-compacting folds the compacted leaf + the new batch
    assert(SignatureStore.compact(spark, dir) == 2)
    assert(SignatureStore.sigs(spark, dir).get.count() == 4)
    // the DEFAULT grace protects every just-written dir (a reader on the
    // pre-compaction manifest may still scan them; a mid-write append's
    // data dir looks identical) — nothing deleted
    assert(SignatureStore.vacuum(spark, dir) == 0)
    // grace 0 = caller asserts quiescence: deletes the unreferenced
    // leftovers (4 batch leaves + the first compaction's leaf), keeps
    // the live leaf, contents unchanged
    assert(SignatureStore.vacuum(spark, dir, graceMs = 0) == 5)
    assert(SignatureStore.vacuum(spark, dir, graceMs = 0) == 0) // idempotent
    assert(SignatureStore.sigs(spark, dir).get.count() == 4)
    assert(SignatureStore.bands(spark, dir).select("doc_id")
      .distinct().count() == 4)
  }

  test("reader on the pre-compaction manifest survives compact + graced vacuum") {
    val dir = tmpDir()
    SignatureStore.append(spark, dir, "b1", sigOf(docs(1L -> "a b c d e")))
    SignatureStore.append(spark, dir, "b2", sigOf(docs(2L -> "f g h i j")))
    // reader opens the CURRENT (pre-compaction) manifest's leaves lazily
    val reader = SignatureStore.bands(spark, dir)
    assert(SignatureStore.compact(spark, dir) == 2)
    // graced vacuum retains the old leaves (they are younger than the
    // grace) — the in-flight reader's scan still succeeds afterwards
    assert(SignatureStore.vacuum(spark, dir) == 0)
    assert(reader.select("doc_id").distinct().count() == 2)
    // the quiesced-caller path deletes them; a NEW reader (current
    // manifest = the compacted leaf) is unaffected
    assert(SignatureStore.vacuum(spark, dir, graceMs = 0) == 2)
    assert(SignatureStore.bands(spark, dir)
      .select("doc_id").distinct().count() == 2)
  }

  test("a commit that lost the generation race fails loudly, not silently") {
    val dir = tmpDir()
    SignatureStore.append(spark, dir, "b1", sigOf(docs(1L -> "a b c d e")))
    SignatureStore.append(spark, dir, "b2", sigOf(docs(2L -> "f g h i j")))
    // simulate a compaction that read gen 0 (only b1) while the b2 append
    // committed gen 1: its manifest commit must fail instead of
    // committing a manifest without b2 (the silently-lost-batch hazard)
    val stale = SignatureStore.committed(spark, dir) - "b2"
    val ex = intercept[IllegalArgumentException](
      SignatureStore.commitManifest(spark, dir, stale, readGen = 0L))
    assert(ex.getMessage.contains("concurrent commit"), ex.getMessage)
    // the store is untouched: b2 still committed, contents intact
    assert(SignatureStore.committed(spark, dir).keySet == Set("b1", "b2"))
    assert(SignatureStore.sigs(spark, dir).get.count() == 2)
  }

  test("ingest = append + auto-compaction above maxLeaves; replay never compacts") {
    val dir = tmpDir()
    assert(SignatureStore.ingest(spark, dir, "c1",
      sigOf(docs(1L -> "a b c d e")), maxLeaves = 2))
    assert(SignatureStore.ingest(spark, dir, "c2",
      sigOf(docs(2L -> "f g h i j")), maxLeaves = 2))
    // two leaves ≤ maxLeaves: no fold yet
    assert(SignatureStore.committed(spark, dir).values.toSeq.distinct.size == 2)
    assert(SignatureStore.ingest(spark, dir, "c3",
      sigOf(docs(3L -> "k l m n o")), maxLeaves = 2))
    // third leaf crossed the threshold: folded to one, every id committed
    val after = SignatureStore.committed(spark, dir)
    assert(after.keySet == Set("c1", "c2", "c3"))
    assert(after.values.toSeq.distinct.size == 1)
    assert(SignatureStore.sigs(spark, dir).get.count() == 3)
    // idempotent replay: no append, and no re-compaction churn
    assert(!SignatureStore.ingest(spark, dir, "c2",
      sigOf(docs(2L -> "f g h i j")), maxLeaves = 2))
    assert(SignatureStore.committed(spark, dir) == after)
  }

  test("signature files are doc_id range-clustered: non-overlapping per-file ranges") {
    import spark.implicits._
    val dir = tmpDir()
    // two batches with interleaved ids, then compact: the rewrite must
    // re-cluster ACROSS batches so each surviving file owns a disjoint
    // doc_id range (what parquet zone maps prune on)
    val words = (0 until 6).map(i => s"w$i alpha beta gamma delta").toVector
    SignatureStore.append(spark, dir, "b1",
      sigOf((0L until 40L by 2L).map(i => (i, words((i % 6).toInt))).toDF("doc_id", "text")))
    SignatureStore.append(spark, dir, "b2",
      sigOf((1L until 40L by 2L).map(i => (i, words((i % 6).toInt))).toDF("doc_id", "text")))
    SignatureStore.compact(spark, dir)
    val leaf = SignatureStore.committed(spark, dir).values.head
    val files = new java.io.File(s"$dir/$leaf/sigs").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
      .map(_.getAbsolutePath)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"doc_id"), max($"doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: ${ranges.mkString(", ")}")
      case _ => ()
    }
    // and every file is internally sorted (row-group min/max monotone)
    files.foreach { f =>
      val ids = spark.read.parquet(f).select($"doc_id")
        .collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"unsorted file $f")
    }
  }

  test("store≡memory equality holds across a compaction") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val all = docs(
      0L -> base, 1L -> base,
      2L -> "completely different words in this document body here",
      3L -> (base + " extra"), 4L -> "unique new content nothing matches this",
      5L -> "another existing doc with its own content entirely",
      8L -> (base + " extra"))
    val dir = tmpDir()
    // the corpus arrives as THREE crawls, then compacts to one generation
    val old = all.filter($"doc_id" % 4 =!= 0)
    Seq(1L, 2L, 3L).foreach(i => SignatureStore.append(spark, dir, s"c$i",
      sigOf(old.filter($"doc_id" % 3 === i % 3))))
    assert(SignatureStore.compact(spark, dir) == 3)
    val stored = graft.queries.DedupQueries
      .incrementalDedupStored(spark, dir, all.filter($"doc_id" % 4 === 0))
      .orderBy("doc_id").collect()
    val mem = graft.queries.DedupQueries.incrementalDedupFrom(all)
      .orderBy("doc_id").collect()
    assert(stored.toSeq == mem.toSeq)
  }

  test("store-backed incremental dedup = in-memory path on same corpus") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val all = docs(
      0L -> base, 1L -> base, // 0 is new (id%4==0) and dups 1 (existing)
      2L -> "completely different words in this document body here",
      3L -> (base + " extra"), 4L -> "unique new content nothing matches this",
      5L -> "another existing doc with its own content entirely",
      8L -> (base + " extra")) // new, dups 3
    val dir = tmpDir()
    SignatureStore.append(spark, dir, "corpus",
      sigOf(all.filter($"doc_id" % 4 =!= 0)))
    val stored = graft.queries.DedupQueries
      .incrementalDedupStored(spark, dir, all.filter($"doc_id" % 4 === 0))
      .orderBy("doc_id").collect()
    val mem = graft.queries.DedupQueries.incrementalDedupFrom(all)
      .orderBy("doc_id").collect()
    assert(stored.toSeq == mem.toSeq)
    // and the dup verdicts are the expected ones
    val verdicts = stored.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(verdicts(0L) == Some(1L))
    assert(verdicts(8L) == Some(1L)) // "base extra" near-dups base too; min_by → earliest
    assert(verdicts(4L) == None)
  }

  // ---- TRUE concurrency (r11 VERDICT #7): the generation guard under
  // real thread interleavings, not sequential simulation. A blocking UDF
  // inside the appended batch's text column parks the append BETWEEN its
  // manifest read and its commit — the exact window the guard protects.

  test("REAL-THREAD race: an append paused mid-flight loses to a compaction, loudly") {
    val dir = tmpDir()
    SignatureStore.append(spark, dir, "b1", sigOf(docs(1L -> "a b c d e")))
    SignatureStore.append(spark, dir, "b2", sigOf(docs(2L -> "f g h i j")))
    StoreRaceGates.reset()
    val blockText = udf(StoreRaceGates.block _)
    val blockedSig = sigOf(docs(3L -> "k l m n o")
      .withColumn("text", blockText(col("text"))))
    @volatile var thrown: Throwable = null
    val t = new Thread(() => {
      try SignatureStore.append(spark, dir, "b3", blockedSig)
      catch { case e: Throwable => thrown = e }
    })
    t.start()
    assert(StoreRaceGates.entered.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "the racing append never started evaluating its batch")
    // the append holds generation 1; this compaction commits generation 2
    assert(SignatureStore.compact(spark, dir) == 2)
    StoreRaceGates.release.countDown()
    t.join(120000)
    assert(!t.isAlive, "racing append still running")
    assert(thrown != null && thrown.getMessage.contains("concurrent commit"),
      s"append should have failed loudly, got: $thrown")
    // the compacted store is intact; the loser's data is an invisible orphan
    assert(SignatureStore.committed(spark, dir).keySet == Set("b1", "b2"))
    assert(!SignatureStore.bands(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).contains(3L))
    // the documented recovery: retry re-reads the new manifest and lands
    assert(SignatureStore.append(spark, dir, "b3", sigOf(docs(3L -> "k l m n o"))))
    assert(SignatureStore.committed(spark, dir).keySet == Set("b1", "b2", "b3"))
  }

  test("REAL-THREAD race: of two unserialized appends, exactly the stale commit fails") {
    val dir = tmpDir()
    SignatureStore.append(spark, dir, "b1", sigOf(docs(1L -> "a b c d e")))
    StoreRaceGates.reset()
    val blockText = udf(StoreRaceGates.block _)
    val blockedSig = sigOf(docs(7L -> "p q r s t")
      .withColumn("text", blockText(col("text"))))
    @volatile var thrown: Throwable = null
    val t = new Thread(() => {
      try SignatureStore.append(spark, dir, "bx", blockedSig)
      catch { case e: Throwable => thrown = e }
    })
    t.start()
    assert(StoreRaceGates.entered.await(60, java.util.concurrent.TimeUnit.SECONDS))
    // a second writer starts later but commits FIRST (the first writer's
    // read generation is now stale)
    assert(SignatureStore.append(spark, dir, "by", sigOf(docs(8L -> "u v w x y"))))
    StoreRaceGates.release.countDown()
    t.join(120000)
    assert(!t.isAlive)
    assert(thrown != null && thrown.getMessage.contains("concurrent commit"),
      s"stale append should have failed loudly, got: $thrown")
    assert(SignatureStore.committed(spark, dir).keySet == Set("b1", "by"))
    assert(SignatureStore.append(spark, dir, "bx", sigOf(docs(7L -> "p q r s t"))))
    assert(SignatureStore.committed(spark, dir).keySet == Set("b1", "by", "bx"))
  }

  test("vacuum gates on UNREFERENCE time: old leaves under a fresh manifest survive") {
    // r11 ADVICE: the grace was keyed on leaf WRITE time, so a leaf
    // written long ago but unreferenced seconds ago (by a compaction) was
    // deleted immediately — under a reader still scanning it. The fix
    // also requires the newest manifest (the unreference event) to be
    // older than the grace.
    val dir = tmpDir()
    SignatureStore.append(spark, dir, "b1", sigOf(docs(1L -> "a b c d e")))
    SignatureStore.append(spark, dir, "b2", sigOf(docs(2L -> "f g h i j")))
    val reader = SignatureStore.bands(spark, dir) // pre-compaction manifest, lazy
    assert(SignatureStore.compact(spark, dir) == 2)
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    def ageAll(pred: String => Boolean): Unit =
      hfs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(st => pred(st.getPath.getName))
        .foreach(st => hfs.setTimes(st.getPath, old, old))
    ageAll(n => n.startsWith("b") || n.startsWith("c")) // every leaf dir
    // leaves far older than the grace, manifest fresh → NOTHING deleted
    assert(SignatureStore.vacuum(spark, dir) == 0,
      "a just-superseded manifest's leaves must survive the grace")
    assert(reader.select("doc_id").distinct().count() == 2)
    // once the supersession itself is older than the grace, vacuum reclaims
    ageAll(_.matches("manifest-g\\d+\\.txt"))
    assert(SignatureStore.vacuum(spark, dir) == 2)
    assert(SignatureStore.bands(spark, dir)
      .select("doc_id").distinct().count() == 2)
  }
}

/** Latches for the real-thread commit races above, referenced from a UDF
  * via this MODULE: a closure capturing a CountDownLatch directly would
  * fail closure serialization; a module reference round-trips and local
  * mode runs the task in-JVM, so the latch instances are shared. */
object StoreRaceGates {
  @volatile var entered: java.util.concurrent.CountDownLatch = _
  @volatile var release: java.util.concurrent.CountDownLatch = _
  def reset(): Unit = {
    entered = new java.util.concurrent.CountDownLatch(1)
    release = new java.util.concurrent.CountDownLatch(1)
  }
  def block(s: String): String = {
    entered.countDown()
    release.await(60, java.util.concurrent.TimeUnit.SECONDS)
    s
  }
}
