package graft.sql

import graft.SparkSpec

/** In-CI half of the differential fuzzer (r10 VERDICT #1).
  *
  * The offline half (`fuzz.py`) runs FuzzGen's seeded corpus through the
  * engine AND DuckDB and compares results; a green run certifies the
  * engine-side canonical hashes, which are committed as
  * `src/test/resources/fuzz_pins_seed1.json`. This spec re-generates the
  * same corpus and re-hashes the engine's answers: any behavior change in
  * parser/translate/optimizer that alters ANY of the 170 generated
  * queries' results breaks CI — a DuckDB-certified regression gate that
  * needs no DuckDB in the JVM.
  *
  * A legitimate semantics change (or generator change) re-certifies by
  * running `python3 fuzz.py /tmp/fuzz_s1 --n 170 --seed 1` to green and
  * copying `/tmp/fuzz_s1/hashes.json` over the resource file — the
  * DuckDB comparison stays in the loop; hand-editing a pin cannot make a
  * wrong answer green.
  */
class FuzzSpec extends SparkSpec {

  private def pins: Map[String, String] = {
    val in = getClass.getResourceAsStream("/fuzz_pins_seed1.json")
    assert(in != null, "missing resource fuzz_pins_seed1.json — run " +
      "`python3 fuzz.py /tmp/fuzz_s1 --n 170 --seed 1` and commit its hashes.json")
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    """"([A-Za-z0-9_]+)"\s*:\s*"([0-9a-f]{32})"""".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
  }

  test("seed-1 fuzz corpus matches its DuckDB-certified pins") {
    val expected = pins
    FuzzGen.tables(spark, 1L)
    val engine = new SqlEngine(spark)
    val qs = FuzzGen.queries(1L, 170)
    assert(qs.map(_.name).toSet == expected.keySet,
      "fuzz corpus and pin set diverged — re-certify via fuzz.py " +
        s"(corpus ${qs.size}, pins ${expected.size})")
    val bad = qs.flatMap { fq =>
      val h = FuzzGen.resultHash(engine.batch(fq.dialect + ";"))
      if (h == expected(fq.name)) None
      else Some(s"${fq.name}: hash $h != pinned ${expected(fq.name)}\n  ${fq.dialect}")
    }
    assert(bad.isEmpty,
      s"${bad.size} fuzz queries drifted from their DuckDB-certified " +
        s"results:\n${bad.take(5).mkString("\n")}")
  }

  test("an uncertified seed's corpus at least parses, validates, and executes") {
    // the no-pin smoke tier: every template must stay RUNNABLE on a
    // second, deterministic seed no offline run certified — catches
    // generator/engine shape breakage without DuckDB in the loop. (Kept
    // deterministic on purpose: CI must not roam; offline `fuzz.py
    // --seed N` is the roaming instrument.)
    val seed2 = 424242L
    FuzzGen.tables(spark, seed2)
    val engine = new SqlEngine(spark)
    FuzzGen.queries(seed2, 33).foreach { fq =>
      try engine.batch(fq.dialect + ";").collect()
      catch { case e: Throwable =>
        fail(s"seed=$seed2 ${fq.name} failed to run: ${e.getMessage}\n  ${fq.dialect}")
      }
    }
  }
}
