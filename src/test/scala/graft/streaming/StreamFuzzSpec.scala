package graft.streaming

import graft.SparkSpec

/** In-CI half of the STREAMING twin fuzzer (r11 VERDICT #1 — the batch
  * dialect had 6,000+ differential queries, streaming semantics only a
  * dozen hand twins). StreamFuzz generates random topologies (TUMBLE/HOP/
  * SESSION aggs × keyed/global × agg sets, INNER/LEFT interval joins,
  * per-row EMIT CHANGES) over seeded event streams carrying out-of-order,
  * duplicate, NULL-ts and decisively-late records, replays them through
  * live Structured Streaming with a deterministic micro-batch/watermark
  * trajectory, and asserts exact emission-set equality against the same
  * aggregation run as a batch plan over the referee's survivor set.
  *
  * Kept deterministic on purpose (CI must not roam): two pinned seeds.
  * Offline roaming: `sbt "runMain graft.streaming.StreamFuzz <seeds> [n]"`.
  */
class StreamFuzzSpec extends SparkSpec {

  // 28 = two full passes over the 14 topology kinds (r13 added RIGHT/FULL
  // outer interval joins and the composed join → windowed-agg chain;
  // r14 adds chain3 — join → TUMBLE agg → coarser TUMBLE re-agg, three
  // chained stateful operators)
  test("streaming twin fuzzer: pinned seed 1, every topology == its batch twin") {
    val reports = StreamFuzz.run(spark, 1L, 28)
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, bad.map(r => s"${r.name}: ${r.detail}").mkString("\n"))
    assert(reports.size == 28)
  }

  test("streaming twin fuzzer: pinned seed 424242, every topology == its batch twin") {
    val reports = StreamFuzz.run(spark, 424242L, 28)
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, bad.map(r => s"${r.name}: ${r.detail}").mkString("\n"))
  }

  test("streaming twin fuzzer under RocksDB state store (r12 VERDICT #7)") {
    // one pass over all 14 kinds with the PRODUCTION state-store
    // provider: extends the differential certification from the heap
    // store (STREAMPROBE_r12 proved identical state bounds; this proves
    // identical ANSWERS on live topologies)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val reports = StreamFuzz.run(spark, 77L, 14)
      val bad = reports.filterNot(_.ok)
      assert(bad.isEmpty, bad.map(r => s"${r.name}: ${r.detail}").mkString("\n"))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
