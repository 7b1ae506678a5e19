package graft.sources

import graft.SparkSpec

/** In-CI half of the LEDGER-TRANSPORT schedule fuzzer: random
  * compositions of produce bursts, drain boundaries, engine kills with
  * produce-while-down, and broker restarts, each asserting the sink
  * holds exactly one transform of every produced record. Small pinned n
  * — every scenario pays real streaming-query starts and kills; roaming
  * depth comes from `sbt "runMain graft.sources.LedgerFuzz <seeds> [n]"`.
  */
class LedgerFuzzSpec extends SparkSpec {

  test("ledger fuzzer: pinned seed 1 — exactly-once across random schedules") {
    val reports = LedgerFuzz.run(spark, 1L, 4)
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, bad.map(r => s"${r.name}: ${r.detail}").mkString("\n"))
    // non-vacuity: kills with records produced while the consumer was
    // down, and at least one broker restart, must be inside the pass
    assert(reports.map(_.restarts).sum > 0, "no engine restart drawn")
    assert(reports.map(_.whileDown).sum > 0, "no produce-while-down drawn")
    assert(reports.map(_.brokerRestarts).sum > 0, "no broker restart drawn")
  }
}
