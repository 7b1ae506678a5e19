package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's scalar-expression surface: every scalar/array/JSON operator
  * the reference SQL dialect exposes (SURVEY §2.3), as `Column` combinators.
  *
  * Everything here compiles to built-in Catalyst expressions — whole-stage
  * codegen applies, no UDFs, so these run at full vectorized speed on a
  * cluster. Reference semantics (citations into /root/reference):
  *
  *   - `=` / `<>` are null-safe: NULL = NULL → TRUE, NULL = x → FALSE
  *     (hstream-sql/src/HStream/SQL/Codegen/BinOp.hs:116-138) → `<=>`.
  *   - `<` / `>` / `<=` / `>=` return NULL when a side is NULL
  *     (BinOp.hs:155-157) → Spark default comparison semantics.
  *   - Arithmetic is null-propagating (BinOp.hs:68-69) → Spark default.
  *   - Array indexing is 0-based and slices are [i, j) half-open
  *     (Codegen/Common.hs:72-86) → `getItem` / `slice` with +1 offset.
  */
object HFunctions {

  // ---- binary ops (AST.hs:237-244, BinOp.hs) -------------------------------

  /** Reference `=`: null-safe equality (BinOp.hs:116-118). */
  def hEq(a: Column, b: Column): Column = a <=> b

  /** Reference `<>`: negated null-safe equality (BinOp.hs:136-138). */
  def hNeq(a: Column, b: Column): Column = !(a <=> b)

  /** IFNULL(a, b) → b when a is NULL (BinOp.hs via `op_ifNull`). */
  def ifNull(a: Column, b: Column): Column = coalesce(a, b)

  /** NULLIF(a, b) → NULL when a equals b (null-safely, matching hEq). */
  def nullIf(a: Column, b: Column): Column = when(a <=> b, lit(null)).otherwise(a)

  /** DATETOSTRING(d, fmt) (BinOp.hs `op_dateToString`). */
  def dateToString(d: Column, fmt: String): Column = date_format(d, fmt)

  /** STRINGTODATE(s, fmt) (BinOp.hs `op_stringToDate`). */
  def stringToDate(s: Column, fmt: String): Column = to_date(s, fmt)

  /** SPLIT(s, sep) (BinOp.hs `op_split`) — literal separator, not regex. */
  def hSplit(s: Column, sep: Column): Column =
    split(s, concat(lit("\\Q"), sep, lit("\\E")))

  /** CHUNKSOF(n, s): s cut into n-char pieces (BinOp.hs `op_chunksOf`). */
  def chunksOf(n: Int, s: Column): Column =
    regexp_extract_all(s, lit(s"(?s).{1,$n}"), lit(0))

  /** TAKE(n, s): first n chars (BinOp.hs `op_take`). */
  def hTake(n: Column, s: Column): Column = s.substr(lit(1), n)

  /** TAKEEND(n, s): last n chars (BinOp.hs `op_takeEnd`). */
  def hTakeEnd(n: Column, s: Column): Column =
    s.substr(greatest(length(s) - n + lit(1), lit(1)), n)

  /** DROP(n, s): all but first n chars (BinOp.hs `op_drop`). */
  def hDrop(n: Column, s: Column): Column =
    s.substr(n + lit(1), greatest(length(s) - n, lit(0)))

  /** DROPEND(n, s): all but last n chars (BinOp.hs `op_dropEnd`). */
  def hDropEnd(n: Column, s: Column): Column =
    s.substr(lit(1), greatest(length(s) - n, lit(0)))

  // ---- unary ops (AST.hs:246-257, UnaryOp.hs) ------------------------------
  // Trig/math map 1:1 onto org.apache.spark.sql.functions (codegen'd):
  // sin sinh asin asinh cos cosh acos acosh tan tanh atan atanh abs ceil
  // floor round signum sqrt log log2 log10 exp — used directly by callers.

  /** STRLEN (UnaryOp.hs `op_strlen`). */
  def strLen(s: Column): Column = length(s)

  /** TO_STR (UnaryOp.hs `op_toStr`). */
  def toStr(c: Column): Column = c.cast("string")

  // Type predicates (UnaryOp.hs IS_INT/IS_FLOAT/...): on our schema-ful
  // columns these are static; on dynamic JSON payloads use the Json ops
  // below with try-casts — see jsonIsNum.

  // ---- ternary: BETWEEN family (TerOp.hs:34-70) ----------------------------

  /** x BETWEEN a AND b (null-propagating, TerOp.hs:38-44). Explicit guard:
    * SQL three-valued AND would yield FALSE for `5 BETWEEN NULL AND 3`
    * (one NULL bound, other comparison false) where the reference returns
    * NULL — same treatment as hBetweenSymmetric. */
  def hBetween(x: Column, a: Column, b: Column): Column =
    when(x.isNull || a.isNull || b.isNull, lit(null).cast("boolean"))
      .otherwise(x >= a && x <= b)

  /** x BETWEEN SYMMETRIC a AND b (bounds order-insensitive, TerOp.hs:46-52).
    * Explicit null-propagation: Spark's least/greatest SKIP nulls, which
    * would turn a NULL bound into FALSE instead of the reference's NULL. */
  def hBetweenSymmetric(x: Column, a: Column, b: Column): Column =
    when(x.isNull || a.isNull || b.isNull, lit(null).cast("boolean"))
      .otherwise(x >= least(a, b) && x <= greatest(a, b))

  // ---- array ops (SQL-v1.cf:316-327, grammar) ------------------------------
  // ARRAY_CONTAIN → array_contains, ARRAY_DISTINCT → array_distinct,
  // ARRAY_EXCEPT/INTERSECT/UNION/REMOVE → same names, ARRAY_LENGTH → size,
  // ARRAY_JOIN → array_join, ARRAY_MAX/MIN → array_max/min,
  // ARRAY_SORT → array_sort. All direct built-ins; no wrappers needed.

  /** 0-based array index a[i] (Common.hs:72-76; OOB → NULL rather than the
    * reference's row-dropping error — documented divergence). `get`, not
    * `getItem`: ANSI mode makes getItem THROW on out-of-bounds. */
  def arrayGet(a: Column, i: Int): Column = get(a, lit(i))

  /** Half-open 0-based slice a[i:j] (Common.hs:77-86). */
  def arraySlice(a: Column, i: Int, j: Int): Column = slice(a, i + 1, math.max(j - i, 0))

  // ---- TIME arithmetic (AST.hs:155-173 interval model) ---------------------
  // TIME is carried as a zero-padded HH:mm:ss string (no Spark TIME type).
  // Arithmetic routes through an anchored timestamp and takes the clock part
  // back out, so crossing midnight wraps mod 24 h like the reference's
  // TimeOfDay arithmetic. The anchor day is irrelevant — only the clock
  // component survives date_format.

  /** t + INTERVAL, wrapping past midnight. */
  def timeAdd(t: Column, interval: Column): Column =
    date_format(try_to_timestamp(concat(lit("1970-01-02 "), t)) + interval,
      "HH:mm:ss")

  /** t - INTERVAL, wrapping before midnight. */
  def timeSub(t: Column, interval: Column): Column =
    date_format(try_to_timestamp(concat(lit("1970-01-02 "), t)) - interval,
      "HH:mm:ss")

  // ---- JSON ops (AST.hs:262-267, JsonOp.hs:33-84) --------------------------
  // The reference's JSONB values arrive as JSON text columns here (events.props).

  /** j -> 'k': TYPED JSON field access (JsonOp.hs:40-44 — JOpArrow returns
    * the typed FlowValue, not text). The result is a Spark VARIANT: ints
    * stay ints, bools stay bools, nested objects/arrays stay structured,
    * and a JSON null is distinguishable from a missing key
    * (is_variant_null vs NULL). Cast at the use site for concrete-typed
    * arithmetic/comparison — `(props -> 'k')::INTEGER` compares numerically
    * where the text form `->>` would compare lexicographically. */
  def jsonGet(j: Column, key: String): Column =
    try_variant_get(try_parse_json(j), s"$$.$key", "variant")

  /** j ->> 'k': JSON field access as text (JsonOp.hs:46-48). */
  def jsonGetText(j: Column, key: String): Column =
    get_json_object(j, s"$$.$key")

  /** j #> '{a,b}': TYPED JSON path access (JsonOp.hs:50-60; same typed
    * value semantics as `->`). */
  def jsonPath(j: Column, path: Seq[String]): Column =
    try_variant_get(try_parse_json(j), "$." + path.mkString("."), "variant")

  /** j #>> '{a,b}': JSON path access as text. */
  def jsonPathText(j: Column, path: Seq[String]): Column =
    get_json_object(j, "$." + path.mkString("."))

  /** IS_NUM-style dynamic type predicate over a JSON text value.
    * try_cast, not cast: Spark 4 runs ANSI mode by default and a plain cast
    * throws on non-numeric text instead of yielding NULL. */
  def jsonIsNum(j: Column, key: String): Column =
    get_json_object(j, s"$$.$key").try_cast("double").isNotNull
}
