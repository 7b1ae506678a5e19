package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming near-dup detection: the LSH candidate stage as a stateful
  * stream (StreamOps.nearDupCandidates) — band-key state remembers the
  * first owner, later colliding docs emit candidate pairs, state is
  * watermark-bounded. Mirrors the batch pipeline's banding formulas, so a
  * pair the batch LSH would surface is surfaced here once both docs have
  * streamed through. */
class StreamDedupSpec extends SparkSpec {

  test("near-dup docs emit candidate pairs across micro-batches; distinct docs don't") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val base = "the quick brown fox jumps over the lazy dog again and again"
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

    val out = StreamOps.nearDupCandidates(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      // batch 1: the original + an unrelated doc
      in.addData((1L, base, ts(0)),
        (2L, "completely different words about databases and query engines here", ts(1)))
      q.processAllAvailable()
      assert(spark.table("neardup_out").isEmpty)

      // batch 2: a near-identical doc (one word changed) + a short doc
      // (degenerate guard: must not band at all)
      in.addData((3L, base.replace("dog", "cat"), ts(2)), (4L, "tiny doc", ts(3)))
      q.processAllAvailable()
      val pairs = spark.table("neardup_out")
        .select("doc_id", "owner_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((3L, 1L)), s"got $pairs")

      // batch 3: an exact copy of doc 2 — owner is doc 2, not doc 1
      in.addData((5L, "completely different words about databases and query engines here", ts(4)))
      q.processAllAvailable()
      val pairs2 = spark.table("neardup_out")
        .select("doc_id", "owner_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs2 == Set((3L, 1L), (5L, 2L)), s"got $pairs2")
    } finally q.stop()
  }

  test("streaming paragraph dedup: boilerplate survives once, unique paragraphs pass") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val bp = "this site uses cookies"

    val out = StreamOps.paragraphDedup(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("paradedup_out").start()
    try {
      in.addData((1L, s"unique alpha words <p> $bp", ts(0)))
      q.processAllAvailable()
      // doc 2 repeats the boilerplate (dropped) + brings a new paragraph
      in.addData((2L, s"fresh beta content <p> $bp", ts(1)))
      q.processAllAvailable()
      val got = spark.table("paradedup_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got == Set(
        (1L, 0, "unique alpha words"), (1L, 1, bp),
        (2L, 0, "fresh beta content")), s"got $got")
    } finally q.stop()
  }
}
