package graft.sql

import graft.SparkSpec

/** In-CI half of the STREAMING-SQL grammar fuzzer (r15): grammar-drawn
  * streaming-legal SELECTs through the real statement surface — CREATE
  * STREAM, per-row INSERT INTO … VALUES '<json>' statements, EMIT
  * CHANGES push queries, CSAS through a wire-format FileSink — each
  * compared against THE SAME dialect text run through the batch path
  * over the same rows. Certifies the streaming execution + payload
  * decode + wire round-trip half of the SQL surface; FuzzGen × DuckDB
  * certifies the shared translation itself.
  *
  * Kept deterministic on purpose (CI must not roam): pinned seeds.
  * Offline roaming: `sbt "runMain graft.sql.StreamSqlFuzz <seeds> [n]"`.
  */
class StreamSqlFuzzSpec extends SparkSpec {

  // 14 = two full passes over the 7 scenario kinds (stateless, unwindowed
  // agg, TUMBLE, HOP, CSAS wire round-trip, stream-stream WITHIN join,
  // live materialized view pulled mid-stream)
  test("streaming-SQL fuzzer: pinned seed 1, streaming == batch on the same text") {
    val reports = StreamSqlFuzz.run(spark, 1L, 14)
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, bad.map(r => s"${r.name}: ${r.detail}").mkString("\n"))
    assert(reports.size == 14)
    // non-vacuity: the drawn scenarios must actually exercise the hard
    // cases — NULL fields through the insert/decode path, WHERE clauses
    // that filter, and aggregations with multiple groups
    assert(reports.map(_.nullFields).sum > 20,
      s"too few NULL fields inserted: ${reports.map(_.nullFields).sum}")
    assert(reports.exists(r => r.groups == 0 && r.survivors < r.inserted &&
      r.survivors > 0), "no stateless scenario with a selective WHERE")
    assert(reports.filter(_.groups > 0).map(_.groups).sum > 10,
      "too few aggregate groups across agg/window scenarios")
  }

  test("streaming-SQL fuzzer: pinned seed 424242") {
    val reports = StreamSqlFuzz.run(spark, 424242L, 14)
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, bad.map(r => s"${r.name}: ${r.detail}").mkString("\n"))
  }
}
