package graft.operators

import graft.SparkSpec

/** In-CI half of the SIGNATURE-STORE schedule fuzzer: random (planted
  * near-dup corpus × batch partition × ingest/replay/compact/vacuum/
  * orphan schedule) scenarios; every probe of an arriving batch is
  * compared against a store-free recompute over the union of committed
  * batches, and every maintenance event asserts its invariant (replay
  * no-op, fold preserves results, vacuum reaps exactly the unreferenced
  * dirs, orphans invisible). See StoreFuzz scaladoc for the protocol.
  *
  * Kept deterministic on purpose (CI must not roam): two pinned seeds.
  * Offline roaming: `sbt "runMain graft.operators.StoreFuzz <seeds> [n]"`.
  */
class StoreFuzzSpec extends SparkSpec {

  private def checkSeed(seed: Long, n: Int): Unit = {
    val reports = StoreFuzz.run(spark, seed, n)
    val bad = reports.filterNot(_.ok)
    assert(bad.isEmpty, bad.map(r => s"${r.name}: ${r.detail}").mkString("\n"))
    assert(reports.size == n)
    // non-vacuity: the certified surface must include real folds,
    // idempotent replays, vacuum deletions, orphan fabrication, and
    // at least one found duplicate per scenario (the exact-copy probe)
    assert(reports.map(_.compactions).sum > 0, "no schedule ever compacted")
    assert(reports.map(_.replays).sum > 0, "no schedule ever replayed")
    assert(reports.map(_.vacuumed).sum > 0, "no vacuum ever deleted a dir")
    assert(reports.map(_.orphans).sum > 0, "no schedule ever fabricated an orphan")
    assert(reports.forall(_.dupsFound > 0), "a scenario found zero duplicates")
  }

  test("store fuzzer: pinned seed 1 — every probe == store-free recompute") {
    checkSeed(1L, 6)
  }

  test("store fuzzer: pinned seed 4711 — every probe == store-free recompute") {
    checkSeed(4711L, 6)
  }
}
