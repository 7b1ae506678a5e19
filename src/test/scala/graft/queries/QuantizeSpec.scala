package graft.queries

import graft.SparkSpec

/** Property pins for int8 embedding quantization (the driver gate
  * hash-verifies exact values; these assert the invariants that make the
  * codec a correct codec on any corpus). */
class QuantizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("int8 quantization: codes bounded, error within half a quantization step") {
    val rows = SimilarityQueries.queries("q_embed_quantize")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(2)
      val codeSum = r.getLong(3)
      val mse = r.getDouble(5)
      assert(scale > 0.0, s"vec ${r.getLong(0)} degenerate scale")
      // 64 dims, each code in [0, 255]
      assert(codeSum >= 0 && codeSum <= 255L * 64,
        s"vec ${r.getLong(0)} code_sum $codeSum out of range")
      // rounding to the nearest code keeps per-dim |err| <= scale/2,
      // so mse <= (scale/2)^2 (plus float slack)
      assert(mse <= scale * scale / 4 * (1 + 1e-9) + 1e-15,
        s"vec ${r.getLong(0)} mse $mse exceeds (scale/2)^2 ${scale * scale / 4}")
    }
  }

  test("quantization is deterministic: two runs agree exactly") {
    val a = SimilarityQueries.queries("q_embed_quantize")(spark, sf).collect()
    val b = SimilarityQueries.queries("q_embed_quantize")(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
  }
}
