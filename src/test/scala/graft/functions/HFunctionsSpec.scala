package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.HFunctions._

/** Golden cases for the scalar layer, ported from the reference's specs:
  * hstream-sql/test/HStream/SQL/Codegen/MathSpec.hs:17-28 and
  * ArraySpec.hs:15-102, plus the null-semantics table in BinOp.hs.
  */
class HFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def eval(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head().get(0)

  // --- BinOp.hs:116-138 non-standard NULL equality ---------------------------
  test("= is null-safe: NULL = NULL -> TRUE (BinOp.hs:116-118)") {
    assert(eval(hEq(lit(null), lit(null))) == true)
  }
  test("= is null-safe: NULL = 1 -> FALSE") {
    assert(eval(hEq(lit(null).cast("int"), lit(1))) == false)
  }
  test("<> mirrors null-safety (BinOp.hs:136-138)") {
    assert(eval(hNeq(lit(null), lit(null))) == false)
    assert(eval(hNeq(lit(null).cast("int"), lit(1))) == true)
  }
  test("< returns NULL on NULL side (BinOp.hs:155-157)") {
    assert(eval(lit(null).cast("int") < lit(1)) == null)
  }
  test("arithmetic null-propagates (BinOp.hs:68-69)") {
    assert(eval(lit(null).cast("int") + lit(1)) == null)
  }

  // --- ArraySpec.hs golden cases (set ops match the reference exactly) -------
  test("ARRAY_EXCEPT dedups and keeps NULL (ArraySpec ARRAY_EXCEPT__0/1)") {
    assert(eval(array_except(array(lit(1), lit(2), lit(3), lit(1), lit(2)),
      array(lit(2), lit(3)))) == Seq(1))
    assert(eval(array_except(
      array(lit("apple"), lit("apple"), lit(null), lit("cherry")),
      array(lit("cherry")))) == Seq("apple", null))
  }
  test("ARRAY_INTERSECT dedups preserving left order (ARRAY_INTERSECT__0/1)") {
    assert(eval(array_intersect(array(lit(1), lit(2), lit(3), lit(1), lit(2)),
      array(lit(2), lit(1)))) == Seq(1, 2))
    assert(eval(array_intersect(
      array(lit("apple"), lit("apple"), lit(null), lit("cherry")),
      array(lit("apple")))) == Seq("apple"))
  }
  test("ARRAY_MIN ignores NULL like the reference (ARRAY_MIN__0)") {
    assert(eval(array_min(array(lit(-1), lit(2), lit(null), lit(0)))) == -1)
  }
  test("ARRAY_MAX NULL handling diverges (documented): ref treats NULL as max") {
    // reference: max([-1,2,null,0]) = NULL (ArraySpec ARRAY_MAX__0 — its
    // dynamic ordering puts Null on top); Spark sanely ignores nulls.
    // Intentional divergence, SURVEY §7.3 spirit.
    assert(eval(array_max(array(lit(-1), lit(2), lit(null), lit(0)))) == 2)
  }
  test("ARRAY_DISTINCT keeps first occurrences (ARRAY_DISTINCT__0/1)") {
    assert(eval(array_distinct(array(lit(1), lit(1), lit(2), lit(3), lit(1), lit(2))))
      == Seq(1, 2, 3))
    assert(eval(array_distinct(
      array(lit("apple"), lit("apple"), lit(null), lit("cherry"))))
      == Seq("apple", null, "cherry"))
  }

  // --- array edge cases (Common.hs:72-86) ------------------------------------
  test("array index OOB yields NULL (documented divergence from row-drop)") {
    assert(eval(arrayGet(array(lit(1), lit(2)), 5)) == null)
  }
  test("slice edges: empty, overlong, inverted") {
    assert(eval(arraySlice(array(lit(1), lit(2), lit(3)), 1, 1)) ==
      Seq.empty[Int])
    assert(eval(arraySlice(array(lit(1), lit(2), lit(3)), 0, 99)) ==
      Seq(1, 2, 3))
    assert(eval(arraySlice(array(lit(1), lit(2), lit(3)), 2, 1)) ==
      Seq.empty[Int])
  }
  test("CHUNKSOF remainder chunk is short (BinOp.hs op_chunksOf)") {
    assert(eval(chunksOf(3, lit("abcdefgh"))) == Seq("abc", "def", "gh"))
  }
  test("BETWEEN null-propagates (TerOp.hs:38-44)") {
    assert(eval(hBetween(lit(null).cast("int"), lit(1), lit(3))) == null)
    assert(eval(hBetweenSymmetric(lit(5), lit(null).cast("int"), lit(3))) == null)
  }

  // --- MathSpec.hs golden cases ----------------------------------------------
  test("FLOOR/CEIL over int/float mixes (MathSpec.hs)") {
    assert(eval(floor(lit(1.5))) == 1L)
    assert(eval(ceil(lit(1.5))) == 2L)
    assert(eval(floor(lit(-1.5))) == -2L)
    assert(eval(ceil(lit(-1.5))) == -1L)
    assert(eval(lit(1) + lit(2)) == 3)
    assert(eval(lit(1) + lit(2.5)) == 3.5)
  }

  // --- string binary ops (BinOp.hs take/drop/chunksOf/split) -----------------
  test("TAKE/TAKEEND/DROP/DROPEND") {
    assert(eval(hTake(lit(3), lit("abcdef"))) == "abc")
    assert(eval(hTakeEnd(lit(3), lit("abcdef"))) == "def")
    assert(eval(hDrop(lit(2), lit("abcdef"))) == "cdef")
    assert(eval(hDropEnd(lit(2), lit("abcdef"))) == "abcd")
    // n beyond length
    assert(eval(hTake(lit(10), lit("ab"))) == "ab")
    assert(eval(hTakeEnd(lit(10), lit("ab"))) == "ab")
    assert(eval(hDrop(lit(10), lit("ab"))) == "")
    assert(eval(hDropEnd(lit(10), lit("ab"))) == "")
  }
  test("CHUNKSOF") {
    assert(eval(chunksOf(2, lit("abcde"))) == Seq("ab", "cd", "e"))
  }
  test("SPLIT is literal, not regex (BinOp.hs op_split)") {
    assert(eval(hSplit(lit("a.b.c"), lit("."))) == Seq("a", "b", "c"))
  }

  // --- ArraySpec.hs golden cases ---------------------------------------------
  test("ARRAY_DISTINCT keeps first occurrence (ArraySpec.hs)") {
    assert(eval(array_distinct(array(lit(1), lit(2), lit(2), lit(1)))) == Seq(1, 2))
  }
  test("ARRAY_EXCEPT / ARRAY_INTERSECT / ARRAY_UNION / ARRAY_REMOVE") {
    assert(eval(array_except(array(lit(1), lit(2), lit(3)), array(lit(2)))) == Seq(1, 3))
    assert(eval(array_intersect(array(lit(1), lit(2)), array(lit(2), lit(4)))) == Seq(2))
    assert(eval(array_union(array(lit(1), lit(2)), array(lit(2), lit(3)))) == Seq(1, 2, 3))
    assert(eval(array_remove(array(lit(1), lit(2), lit(1)), lit(1))) == Seq(2))
  }
  test("ARRAY_MAX / ARRAY_MIN / ARRAY_SORT / ARRAY_JOIN / ARRAY_LENGTH") {
    assert(eval(array_max(array(lit(3), lit(1), lit(2)))) == 3)
    assert(eval(array_min(array(lit(3), lit(1), lit(2)))) == 1)
    assert(eval(array_sort(array(lit(3), lit(1), lit(2)))) == Seq(1, 2, 3))
    assert(eval(array_join(array(lit("a"), lit("b")), ",")) == "a,b")
    assert(eval(size(array(lit(1), lit(2)))) == 2)
  }
  test("0-based index and half-open slice (Common.hs:72-86)") {
    val a = array(lit(10), lit(20), lit(30), lit(40))
    assert(eval(arrayGet(a, 0)) == 10)
    assert(eval(arrayGet(a, 3)) == 40)
    assert(eval(arraySlice(a, 1, 3)) == Seq(20, 30))
    assert(eval(arraySlice(a, 2, 2)) == Seq())
  }

  // --- BETWEEN family (TerOp.hs:34-70) ---------------------------------------
  test("BETWEEN and BETWEEN SYMMETRIC") {
    assert(eval(hBetween(lit(5), lit(1), lit(10))) == true)
    assert(eval(hBetween(lit(5), lit(10), lit(1))) == false)
    assert(eval(hBetweenSymmetric(lit(5), lit(10), lit(1))) == true)
    assert(eval(hBetween(lit(null).cast("int"), lit(1), lit(10))) == null)
  }

  // --- IFNULL / NULLIF --------------------------------------------------------
  test("IFNULL / NULLIF") {
    assert(eval(ifNull(lit(null).cast("int"), lit(7))) == 7)
    assert(eval(ifNull(lit(5), lit(7))) == 5)
    assert(eval(nullIf(lit(5), lit(5))) == null)
    assert(eval(nullIf(lit(5), lit(6))) == 5)
  }

  // --- JSON ops (JsonOp.hs:33-84) ---------------------------------------------
  test("-> / ->> JSON access") {
    val j = lit("""{"a": 1, "b": {"c": "x"}}""")
    assert(eval(jsonGetText(j, "a")) == "1")
    assert(eval(jsonGet(j, "a").cast("long")) == 1L)
    assert(eval(jsonPath(j, Seq("b", "c")).cast("string")) == "x")
    assert(eval(jsonPathText(j, Seq("b", "c"))) == "x")
    assert(eval(jsonIsNum(j, "a")) == true)
    assert(eval(jsonIsNum(lit("""{"a":"z"}"""), "a")) == false)
  }

  test("-> is TYPED (JOpArrow, JsonOp.hs:40-44): numeric compare + null-vs-missing") {
    // typed: 9 > 50 is FALSE numerically; the text form compares
    // lexicographically and '9' > '50' is TRUE — the divergence typed
    // access exists to prevent
    val j = lit("""{"n": 9, "z": null}""")
    assert(eval(jsonGet(j, "n").cast("long") > 50) == false)
    assert(eval(jsonGetText(j, "n") > "50") == true)
    // typed access distinguishes a JSON null from a missing key
    // (get_json_object renders both as SQL NULL)
    assert(eval(is_variant_null(jsonGet(j, "z"))) == true)
    assert(eval(jsonGet(j, "missing").isNull) == true)
    // nested object stays structured: field access composes on the variant
    val o = lit("""{"b": {"c": 7}}""")
    assert(eval(variant_get(jsonGet(o, "b"), "$.c", "long")) == 7L)
  }

  // --- date/time -------------------------------------------------------------
  test("DATETOSTRING / STRINGTODATE") {
    assert(eval(dateToString(lit("2024-03-05").cast("date"), "yyyy/MM/dd")) == "2024/03/05")
    assert(eval(stringToDate(lit("2024/03/05"), "yyyy/MM/dd")).toString == "2024-03-05")
  }

  // --- TIME ± INTERVAL wraparound (AST.hs:155-173 TimeOfDay arithmetic) ------
  test("TIME + INTERVAL wraps past midnight (23:30 + 45 min = 00:15)") {
    assert(eval(timeAdd(lit("23:30:00"), expr("INTERVAL 45 MINUTE"))) == "00:15:00")
  }
  test("TIME + INTERVAL within the day does not wrap") {
    assert(eval(timeAdd(lit("10:00:00"), expr("INTERVAL 90 MINUTE"))) == "11:30:00")
  }
  test("TIME - INTERVAL wraps before midnight (00:15 - 45 min = 23:30)") {
    assert(eval(timeSub(lit("00:15:00"), expr("INTERVAL 45 MINUTE"))) == "23:30:00")
  }
  test("TIME + multi-day INTERVAL keeps only the clock component") {
    assert(eval(timeAdd(lit("12:00:00"), expr("INTERVAL 49 HOUR"))) == "13:00:00")
  }
  test("TIME arithmetic on malformed input yields NULL, never aborts") {
    assert(eval(timeAdd(lit("not-a-time"), expr("INTERVAL 1 HOUR"))) == null)
  }

  // --- BETWEEN null cases (TerOp.hs:38-52: null-propagating) -----------------
  test("x BETWEEN NULL AND b -> NULL, not FALSE (TerOp.hs:38-44)") {
    assert(eval(hBetween(lit(5), lit(null).cast("int"), lit(3))) == null)
    assert(eval(hBetween(lit(5), lit(1), lit(null).cast("int"))) == null)
    assert(eval(hBetween(lit(null).cast("int"), lit(1), lit(3))) == null)
  }
  test("BETWEEN SYMMETRIC null bound -> NULL (TerOp.hs:46-52)") {
    assert(eval(hBetweenSymmetric(lit(5), lit(null).cast("int"), lit(3))) == null)
    assert(eval(hBetweenSymmetric(lit(2), lit(3), lit(1))) == true)
  }
  test("BETWEEN non-null cases unchanged by the null guard") {
    assert(eval(hBetween(lit(2), lit(1), lit(3))) == true)
    assert(eval(hBetween(lit(5), lit(1), lit(3))) == false)
  }
}
