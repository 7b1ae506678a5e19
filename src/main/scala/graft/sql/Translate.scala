package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType => SparkDT, _}

import Ast._
import graft.functions.{HFunctions, PipelineFunctions}
import graft.operators.TopK

/** AST → DataFrame planner: the reference's `decouple` pipeline
  * (hstream-sql/src/HStream/SQL/Planner.hs:339-387 — WHERE → Filter,
  * computed SELECT items → Affiliate, GROUP BY + aggregates → Reduce,
  * HAVING → Filter, SELECT list → Project) expressed by *declaring* the same
  * logical plan through the DataFrame API and letting Catalyst do the
  * physical planning (SURVEY §4.1: the reference has no optimizer to port).
  *
  * Semantics preserved:
  *   - `=` / `<>` are null-safe (Codegen/BinOp.hs:116-138) → `<=>`.
  *   - Aggregates are extracted from SELECT/HAVING and deduplicated
  *     (Planner.hs:352-367, 390-432) — structural equality on the AST.
  *   - Windowed aggregation appends window start/end to the output row
  *     (Codegen/V1.hs:422-425) as `window_start`/`window_end`.
  *   - Interval joins: WITHIN t → |ts_l − ts_r| ≤ t range condition
  *     (Stream.hs:297); join *type* is honored, matching the V2 engine
  *     (DiffFlow/Types.hs:323-328) where V1 drops it (Codegen/V1.hs:301).
  *   - Windowed relations cannot be joined (Codegen/V1.hs:295-300).
  */
object Translate {

  /** Resolve a stream/table name to its DataFrame. */
  type Lookup = String => DataFrame

  // ---- type mapping (SURVEY §1.2) ------------------------------------------

  def sparkType(t: SqlType): SparkDT = t match {
    case TInt => LongType
    case TFloat => DoubleType
    case TBool => BooleanType
    case TBytea => BinaryType
    case TString => StringType
    case TDate => DateType
    case TTime => StringType // no Spark TIME type (SURVEY §1.2)
    case TTimestamp => TimestampType
    case TInterval => CalendarIntervalType
    case TJson => StringType // JSONB carried as JSON text
    case TArray(e) => ArrayType(sparkType(e))
  }

  def structType(schema: Seq[(String, SqlType)]): StructType =
    StructType(schema.map { case (n, t) => StructField(n, sparkType(t)) })

  // ---- expression translation ----------------------------------------------

  private def intervalExpr(i: IntervalLit): Column =
    expr(s"INTERVAL ${i.n} ${i.unit}")

  def intervalString(i: IntervalLit): String = s"${i.n} ${i.unit.toLowerCase}"

  /** Upper-bound width of a WITHIN interval in microseconds, for the
    * banded-join bucket. Calendar units take their maximum length (31-day
    * months, 366-day years): wider buckets stay correct — the exact range
    * residual still filters — just less selective. */
  private def withinMicros(iv: IntervalLit): Long =
    1000000L * (iv.unit.toUpperCase match {
      case "SECOND" => iv.n
      case "MINUTE" => iv.n * 60L
      case "HOUR" => iv.n * 3600L
      case "DAY" => iv.n * 86400L
      case "MONTH" => iv.n * 31L * 86400L
      case "YEAR" => iv.n * 366L * 86400L
      case other => throw new IllegalArgumentException(
        s"unsupported WITHIN unit $other")
    })

  /** Deterministic output name for an unaliased SELECT item (the reference
    * names by pretty-printed expression text, Planner.hs:178-222). */
  def exprName(e: Expr): String = e match {
    case ColRef(_, n) => n
    case Agg(n, args, true, _) => s"${n}(*)".toLowerCase
    case Agg(n, args, _, true) =>
      s"${n}(distinct ${args.map(exprName).mkString(",")})".toLowerCase
    case Agg(n, args, _, _) => s"${n}(${args.map(exprName).mkString(",")})".toLowerCase
    case Fn(n, args) => s"${n}(${args.map(exprName).mkString(",")})".toLowerCase
    case w: WinFn =>
      s"${w.name}(${w.args.map(exprName).mkString(",")})_over".toLowerCase
    case _: CaseWhen => "case"
    case _: InList | _: InSub => "in"
    case _: ExistsSub => "exists"
    case _: ScalarSub => "scalar"
    case Bin(op, l, r) => s"(${exprName(l)}$op${exprName(r)})"
    case IntLit(v) => v.toString
    case NumLit(v) => v.toString
    case StrLit(v) => v
    case _ => "expr"
  }

  /** Analytic/ranking window functions (SURVEY §2.8 extension — no OVER in
    * the reference grammar). Default frame only, which both Spark and
    * DuckDB define as RANGE UNBOUNDED PRECEDING..CURRENT ROW when ORDER BY
    * is present and the whole partition otherwise — so running aggregates
    * agree with the oracle including peer-row (tie) semantics.
    *
    * Scale: a window function IS a per-partition sort — the declared
    * PARTITION BY is the unit of parallelism. An empty PARTITION BY moves
    * the relation to one task (Spark plans exactly that and warns); that is
    * inherent to the semantic, not a planning defect, and the scalable
    * per-group top-k path for the common rank-then-filter shape is the
    * TopK Aggregator (operators/TopK.scala). */
  private def winFnCol(w: WinFn, go: Expr => Column,
                       dtypeOf: Column => Option[SparkDT] = _ => None): Column = {
    import org.apache.spark.sql.expressions.Window
    require(!w.groupsFrame, "internal: GROUPS frames must be rewritten to " +
      "RANGE-over-dense_rank before translation (planSelect)")
    val w0 =
      if (w.partitionBy.nonEmpty) Window.partitionBy(w.partitionBy.map(go): _*)
      else Window.partitionBy()
    val ordered =
      if (w.orderBy.nonEmpty)
        w0.orderBy(w.orderBy.map(o => sortCol(go(o.e), o)): _*)
      else w0
    // explicit ROWS/RANGE frame (already in Spark's bound encoding);
    // absent → the shared default frame (see the scaladoc above). RANGE
    // with a finite offset is value-typed: it needs exactly one ORDER BY
    // key (numeric — TypeCheck enforces the type; Spark would otherwise
    // raise a deep analysis error here).
    val spec = w.frame match {
      case Some((lo, hi)) if w.rangeFrame =>
        if ((lo != Long.MinValue && lo != 0L) ||
            (hi != Long.MaxValue && hi != 0L))
          require(w.orderBy.size == 1,
            "RANGE frames with numeric offsets require exactly one " +
              s"ORDER BY key, got ${w.orderBy.size}")
        ordered.rangeBetween(lo, hi)
      case Some((lo, hi)) => ordered.rowsBetween(lo, hi)
      case None => ordered
    }
    // ---- frame EXCLUDE statics (shared by every EXCLUDE plan below) ----
    // ROWS + EXCLUDE GROUP/TIES (r12): peers are VALUE-based but a ROWS
    // boundary is POSITIONAL, so (a) the static 0 ∈ [lo,hi] activity test
    // doesn't apply — a frame of pure PRECEDING offsets can still contain
    // peers of the current row — and (b) whole-peer-set subtraction
    // over-removes when the boundary cuts through the peer group.
    val rowsPeerExcl = !w.rangeFrame && w.frame.isDefined &&
      (w.exclude == "GROUP" || w.exclude == "TIES")
    // Whether the current row is a member of the frame — statically
    // decidable from the literal bounds on every frame type (offset 0 is
    // the row itself / its own value / its own peer group). Exclusion is
    // a pure REMOVAL (the standard's rules only ever delete rows from the
    // frame; EXCLUDE TIES deletes the peers OTHER than the current row,
    // it never ADDS an absent current row — PostgreSQL agrees), so on
    // RANGE/GROUPS frames, where the whole peer set sits at order
    // distance 0, a frame with 0 ∉ bounds makes every mode a no-op. On
    // ROWS frames peers are positional and can sit anywhere in the frame
    // (rowsPeerExcl above). NOTE DuckDB 1.0.0 diverges here: ANY EXCLUDE
    // on a frame not reaching the current row extends the frame toward it
    // (even EXCLUDE CURRENT ROW over [-3,-2] returns the [-1] row) —
    // duckdb_pins.py #6 pins that bug; gate rows avoid the shape.
    val selfInFrame = w.frame.exists { case (lo, hi) => lo <= 0L && 0L <= hi }
    val exclActive = w.exclude != "NO OTHERS" && (rowsPeerExcl || selfInFrame)
    // Row-identity collected-frame exclusion (r13) for the FRAME-VALUED
    // window functions — FIRST/LAST/NTH_VALUE and the windowed ordered
    // aggregates — where the result is a value AT a frame position, not a
    // subtractable aggregate: the frame collects (identity, …) structs
    // and the excluded rows are deleted literally. Identity = row_number
    // over the OVER ordering, computed in the SAME Window sort pass (one
    // more O(1) expression, no extra shuffle), so the id the current row
    // sees and the id collected into its neighbors' frames agree even
    // between order-key ties. CURRENT ROW deletes exactly the current
    // row; GROUP deletes the order-key peer set (null-safely — NULL keys
    // are each other's peers); TIES deletes the peers OTHER than the
    // current row.
    lazy val exclId = row_number().over(ordered)
    def exclFields: Seq[Column] =
      w.orderBy.zipWithIndex.map { case (o, i) => go(o.e).as(s"p$i") } :+
        exclId.as("rid")
    def exclKeep(e: Column): Column = {
      lazy val peer = w.orderBy.zipWithIndex
        .map { case (o, i) => e(s"p$i") <=> go(o.e) }
        .reduceOption(_ && _).getOrElse(lit(true))
      w.exclude match {
        case "CURRENT ROW" => e("rid") =!= exclId
        case "GROUP" => !peer
        case "TIES" => !peer || e("rid") === exclId
        case other => throw new IllegalArgumentException(
          s"internal: unknown EXCLUDE mode $other")
      }
    }
    // STRING_AGG / ARRAY_AGG as window functions (extension; batch/pull
    // only, as every OVER is): collect the (keys…, value) structs over
    // the FRAME, then comparator-sort and serialize the per-row result —
    // the in-call ORDER BY (mandatory, parser-enforced) orders elements,
    // the OVER clause orders/frames rows, independently. NULL values ride
    // inside the struct, so ARRAY_AGG keeps them and array_join drops
    // them, exactly like the grouped forms.
    if (w.name == "STRING_AGG" || w.name == "ARRAY_AGG") {
      val (vArg, sep, ordKeys) =
        if (w.name == "STRING_AGG") w.args match {
          case v +: StrLit(s) +: ks => (v, Some(s), ks)
          case _ => throw new IllegalArgumentException(
            "STRING_AGG requires (value, 'separator' ORDER BY …)")
        } else w.args match {
          case v +: ks => (v, None, ks)
          case _ => throw new IllegalArgumentException(
            "ARRAY_AGG requires (value ORDER BY …)")
        }
      val keys = ordKeys.collect { case k: OrdKey => k }
      require(keys.size == ordKeys.size && keys.nonEmpty,
        s"internal: unexpected ${w.name} argument shape ${w.args}")
      // windowed ARRAY_AGG + FILTER: same Kept plan as the grouped form
      // (struct under when(cond, …); collect_list skips the NULL input)
      val (condW, vArg1) = vArg match {
        case Kept(c, x) => (Some(go(c)), x)
        case x => (None, x)
      }
      val vCol = if (w.name == "STRING_AGG") go(vArg1).cast("string") else go(vArg1)
      // under frame EXCLUDE the struct carries the exclusion identity
      // fields too (p0…, rid); the comparator and the value extractors
      // read k0…/v by NAME, so the extra fields ride along inertly
      val fields = keys.zipWithIndex.map { case (k, i) =>
        go(k.e).as(s"k$i") } ++ (if (exclActive) exclFields else Nil) :+
        vCol.as("v")
      val stW = struct(fields: _*)
      val collected0 =
        collect_list(condW.map(c => when(c, stW)).getOrElse(stW)).over(spec)
      val collected =
        if (exclActive) filter(collected0, e => exclKeep(e)) else collected0
      val sorted = array_sort(collected, orderedAggComparator(keys))
      return sep.map(stringAggJoin(sorted, _)).getOrElse {
        val arr = transform(sorted, x => x.getField("v"))
        // empty-after-FILTER / empty-after-EXCLUDE frame → NULL (DuckDB's
        // aggregate-over-zero-rows value), as in the grouped form
        if (condW.isDefined || exclActive)
          when(size(arr) === 0, lit(null)).otherwise(arr)
        else arr
      }
    }
    // FIRST_VALUE / LAST_VALUE / NTH_VALUE under an ACTIVE frame EXCLUDE
    // (r13): not subtractable and not an aggregate at all — the value at
    // a position of the post-exclusion frame. Collected-frame plan:
    // collect (identity, value) structs over the frame IN FRAME ORDER,
    // delete the excluded rows (exclKeep above), then index the survivor
    // values — FIRST = position 0, LAST = size−1, NTH(n) = n−1 — with
    // `get` (never raises; out-of-range/empty → NULL, the SQL
    // empty-frame value). IGNORE NULLS drops NULL survivor values before
    // indexing, the same counting DuckDB/Spark use. O(frame)/row — the
    // windowed ARRAY_AGG cost class, only where EXCLUDE is actually
    // active; the plain forms keep Spark's native O(1) frame functions.
    if (exclActive &&
        Set("FIRST_VALUE", "LAST_VALUE", "NTH_VALUE").contains(w.name)) {
      val (vExpr, nth) = (w.name, w.args) match {
        case ("NTH_VALUE", Seq(e, IntLit(n))) =>
          require(n >= 1, "NTH_VALUE offset must be at least 1")
          (e, n.toInt)
        case ("NTH_VALUE", _) => throw new IllegalArgumentException(
          "NTH_VALUE requires (expr, integer literal)")
        case (_, Seq(e)) => (e, 1)
        case _ => throw new IllegalArgumentException(
          s"${w.name} requires exactly one argument")
      }
      val x = go(vExpr)
      val arr = filter(
        collect_list(struct(exclFields :+ x.as("v"): _*)).over(spec),
        e => exclKeep(e))
      val vals0 = transform(arr, e => e("v"))
      val vals =
        if (w.ignoreNulls) filter(vals0, v => v.isNotNull) else vals0
      return w.name match {
        case "FIRST_VALUE" => get(vals, lit(0))
        case "LAST_VALUE" => get(vals, size(vals) - 1)
        case "NTH_VALUE" => get(vals, lit(nth - 1))
      }
    }
    def lagLead(f: (Column, Int, Any) => Column): Column = w.args match {
      case Seq(e) => f(go(e), 1, null)
      case Seq(e, IntLit(n)) => f(go(e), n.toInt, null)
      case Seq(e, IntLit(n), d) =>
        val dv = d match {
          case IntLit(v) => v
          case NumLit(v) => v
          case StrLit(v) => v
          case BoolLit(v) => v
          case NullLit => null
          case other => throw new IllegalArgumentException(
            s"${w.name} default must be a literal, got $other")
        }
        f(go(e), n.toInt, dv)
      case _ => throw new IllegalArgumentException(
        s"${w.name} requires (expr[, offset[, default]])")
    }
    def one(fn: Column => Column): Column = w.args match {
      case Seq(e) => fn(go(e))
      case _ => throw new IllegalArgumentException(
        s"${w.name} requires exactly one argument")
    }
    val f = w.name match {
      case "ROW_NUMBER" => row_number()
      case "RANK" => rank()
      case "DENSE_RANK" => dense_rank()
      case "NTILE" => w.args match {
        case Seq(IntLit(n)) => ntile(n.toInt)
        case _ => throw new IllegalArgumentException(
          "NTILE requires one integer literal argument")
      }
      // IGNORE NULLS (standard; extension) rides Spark's native
      // ignoreNulls variants — same null-skipping counting as DuckDB
      case "LAG" => lagLead(lag(_, _, _, w.ignoreNulls))
      case "LEAD" => lagLead(lead(_, _, _, w.ignoreNulls))
      case "FIRST_VALUE" => one(first(_, w.ignoreNulls))
      case "NTH_VALUE" => w.args match {
        case Seq(e, IntLit(n)) => nth_value(go(e), n.toInt, w.ignoreNulls)
        case _ => throw new IllegalArgumentException(
          "NTH_VALUE requires (expr, integer literal)")
      }
      case "PERCENT_RANK" => percent_rank()
      case "CUME_DIST" => cume_dist()
      case "LAST_VALUE" => one(last(_, w.ignoreNulls))
      case "SUM" => one(sum(_))
      case "COUNT" => one(count(_))
      case "AVG" => one(avg(_))
      case "MIN" => one(min(_))
      case "MAX" => one(max(_))
      case other => throw new IllegalArgumentException(
        s"unknown window function $other")
    }
    // Frame EXCLUDE planning for the aggregates (extension; Validate
    // pinned name ∈ SUM/COUNT/AVG/MIN/MAX here — the frame-valued
    // functions returned above). The excluded set lies at order distance
    // 0, so whether it intersects the frame is STATICALLY decidable from
    // the literal bounds (exclActive above). When it does intersect, the
    // result is frame-aggregate SUBTRACTION: agg(frame) − agg(excluded),
    // with the empty-after-exclusion case mapped to SQL's empty-set
    // values (SUM/AVG → NULL, COUNT → 0). Peer-set aggregates come from
    // ONE extra window over (partition keys ++ order keys) — peers of
    // the current row are exactly that partition (under the GROUPS
    // rewrite the order key is the dense_rank ordinal, so peers survive
    // the rewrite unchanged). ROWS + EXCLUDE GROUP/TIES frames take the
    // collected-frame plan instead (rowsPeerExcl above).
    if (!exclActive) f.over(spec)
    else {
      val x = w.args match {
        case Seq(e) => go(e)
        case _ => throw new IllegalArgumentException(
          s"${w.name} with EXCLUDE requires exactly one argument")
      }
      if (rowsPeerExcl) {
        // Collected-frame evaluation (the r11 MIN/MAX plan, generalized to
        // all five EXCLUDE-capable aggregates): collect (order keys…,
        // value) structs over the ROWS frame, drop peers of the current
        // row NULL-SAFELY (a NULL key's peers are the other NULL-key
        // rows), aggregate what remains. O(frame) per row — the windowed
        // ARRAY_AGG cost class; every other frame × EXCLUDE combo keeps
        // its cheap subtraction / prefix-suffix plan.
        val ks = w.orderBy.map(o => go(o.e))
        val kv = struct(ks.zipWithIndex.map { case (k, i) => k.as(s"k$i") }
          :+ x.as("v"): _*)
        val arr = collect_list(kv).over(spec)
        def peer(e: Column): Column =
          ks.zipWithIndex.map { case (k, i) => e(s"k$i") <=> k }.reduce(_ && _)
        val others = filter(transform(filter(arr, e => !peer(e)),
          e => e("v")), v => v.isNotNull)
        // TIES retains the current row iff the frame CONTAINS it (the
        // standard removes peers other than R; it never adds an absent
        // R) — for ROWS frames membership is statically 0 ∈ [lo, hi]
        val vals =
          if (w.exclude == "TIES" && selfInFrame)
            when(x.isNotNull, concat(others, array(x))).otherwise(others)
          else others
        val cnt = size(vals)
        // Accumulator typing (r13 ADVICE): an aggregate() fold's
        // accumulator type is its zero's, and every merge result is cast
        // back to it. For DECIMAL(p,s) the get−get zero is (p+1,s), and
        // near p=38 the add's cast-back hits Spark's minimal-loss rule,
        // which cuts SCALE — every step silently rounds. With the input
        // type probed, decimals fold in the widened space native SUM uses
        // (p+10, capped at 37 so one more add never needs precision 39 —
        // the per-step cast back stays lossless), presented as native
        // sum's result type (min(38, p+10), s). Non-decimals keep the
        // typed get−get zero (long/double folds are exact/native).
        val decAcc = dtypeOf(x).collect { case d: DecimalType =>
          (DecimalType(math.min(37, d.precision + 10), d.scale),
           DecimalType(math.min(38, d.precision + 10), d.scale))
        }
        def total: Column = decAcc match {
          case Some((acc, out)) => aggregate(
            vals, lit(0).cast(acc),
            (a, v) => (a + v.cast(acc)).cast(acc)).cast(out)
          case None => aggregate(
            vals, get(vals, lit(0)) - get(vals, lit(0)), (acc, v) => acc + v)
        }
        w.name match {
          case "COUNT" => cnt.cast("long")
          case "MIN" => array_min(vals)
          case "MAX" => array_max(vals)
          case "SUM" => when(cnt === 0, lit(null)).otherwise(total)
          case "AVG" =>
            when(cnt === 0, lit(null)).otherwise(total.cast("double") / cnt)
          case other => throw new IllegalArgumentException(
            s"internal: $other must have been rejected by Validate")
        }
      } else if (w.name == "MIN" || w.name == "MAX") {
        // MIN/MAX aren't subtractable. Two exact plan families; the
        // cheaper one wins per combo:
        //  (1) prefix/suffix decomposition, O(1) extra state per row —
        //      exact when the excluded set is a bound split: ROWS +
        //      EXCLUDE CURRENT ROW (the excluded row sits at offset 0),
        //      and a GROUPS frame (already rewritten here to RANGE over
        //      the integer dense_rank ordinal, where ±1 steps exactly
        //      one peer group) for GROUP/TIES; for GROUPS + CURRENT ROW
        //      the ordinal split [lo,-1] ∪ [0,0] ∪ [1,hi] isolates the
        //      peer group, leaving only the small peer-group collect.
        //  (2) collected-frame evaluation (r11), O(frame) per row — the
        //      same cost class as windowed ARRAY_AGG: collect the
        //      frame's values and evaluate the exclusion literally. A
        //      value-typed RANGE frame has NO bound split (value offsets
        //      can't isolate the peer set: [k+lo, k−1] misses (k−1, k)
        //      for non-integer keys), so RANGE + any EXCLUDE lands here.
        //      EXCLUDE CURRENT ROW needs no row identity: MIN/MAX depend
        //      only on the value MULTISET, so removing ONE occurrence of
        //      the current value is enough — a value beyond the frame
        //      aggregate leaves it; an equal one keeps it iff it occurs
        //      twice, else the remaining values re-aggregate.
        // least/greatest skip NULLs, so an empty side degrades to the
        // other; everything empty → NULL, the SQL empty-frame value.
        val isMin = w.name == "MIN"
        val (lo, hi) = w.frame.get
        val agg: Column => Column = if (isMin) min else max
        val arrAgg: Column => Column = if (isMin) array_min else array_max
        val between: (Long, Long) => org.apache.spark.sql.expressions.WindowSpec =
          if (w.rangeFrame) ordered.rangeBetween else ordered.rowsBetween
        // a GROUPS-rewritten frame orders by the hidden dense_rank
        // ordinal; a user query can never reference that column
        val ordinalKey = w.rangeFrame && (w.orderBy match {
          case Seq(OrderItem(ColRef(None, n), _, _)) =>
            n.startsWith("__graft_grp")
          case _ => false
        })
        // frame agg with ONE occurrence of the current row's value
        // removed, over the values collected by `collectSpec`
        def minusOne(collectSpec: org.apache.spark.sql.expressions.WindowSpec): Column = {
          val arr = collect_list(x).over(collectSpec)
          val whole = arrAgg(arr)
          val unaffected = if (isMin) x > whole else x < whole
          when(x.isNull, whole)
            .otherwise(when(unaffected, whole)
              .otherwise(when(size(filter(arr, e => e <=> x)) >= 2, whole)
                .otherwise(arrAgg(filter(arr, e => !(e <=> x))))))
        }
        def sides(tail: Seq[Column]): Column = {
          val pre = if (lo <= -1L) Some(agg(x).over(between(lo, -1L))) else None
          val suf = if (hi >= 1L) Some(agg(x).over(between(1L, hi))) else None
          (pre.toSeq ++ suf.toSeq ++ tail) match {
            case Seq() => lit(null)
            case Seq(only) => only
            case many => if (isMin) least(many: _*) else greatest(many: _*)
          }
        }
        if (!w.rangeFrame) sides(Nil) // ROWS ⇒ CURRENT ROW (Validate)
        else if (ordinalKey) {
          if (w.exclude == "CURRENT ROW") sides(Seq(minusOne(between(0L, 0L))))
          else sides(if (w.exclude == "TIES") Seq(x) else Nil)
        } else if (w.exclude == "CURRENT ROW") minusOne(between(lo, hi))
        else {
          // value-typed RANGE + GROUP/TIES: peers = frame rows sharing
          // the current ORDER BY key (null-safe — a NULL key's peers are
          // the other NULL-key rows); collect (key, value) structs and
          // filter them out. TIES re-admits the current row's own value.
          val k = go(w.orderBy.head.e) // RANGE ⇒ exactly one key
          val kv = when(x.isNotNull, struct(k.as("k"), x.as("v")))
          val others = arrAgg(transform(
            filter(collect_list(kv).over(between(lo, hi)),
              e => !(e("k") <=> k)), e => e("v")))
          if (w.exclude == "TIES")
            (if (isMin) least(others, x) else greatest(others, x))
          else others
        }
      } else {
      val sumF = sum(x).over(spec)
      val cntF = count(x).over(spec)
      val curSum = when(x.isNotNull, x).otherwise(lit(0))
      val curCnt = when(x.isNotNull, lit(1L)).otherwise(lit(0L))
      lazy val peersSpec = Window.partitionBy(
        (w.partitionBy.map(go) ++ w.orderBy.map(o => go(o.e))): _*)
      // Peer-set SUM is NULL when every peer value is NULL (count is 0,
      // never NULL) — coalesce to 0 so subtraction degrades to the frame
      // aggregate instead of propagating NULL (mirrors the curSum guard).
      lazy val peerSum = coalesce(sum(x).over(peersSpec), lit(0))
      val (sumE, cntE) = w.exclude match {
        case "CURRENT ROW" => (curSum, curCnt)
        case "GROUP" => (peerSum, count(x).over(peersSpec))
        case "TIES" =>
          (peerSum - curSum, count(x).over(peersSpec) - curCnt)
        case other => throw new IllegalArgumentException(
          s"internal: unknown EXCLUDE mode $other")
      }
      val cnt = cntF - cntE
      w.name match {
        case "COUNT" => cnt
        case "SUM" => when(cnt === 0L, lit(null)).otherwise(sumF - sumE)
        case "AVG" =>
          when(cnt === 0L, lit(null))
            .otherwise((sumF - sumE).cast("double") / cnt)
        case other => throw new IllegalArgumentException(
          s"internal: $other must have been rejected by Validate")
      }
      }
    }
  }

  def column(e: Expr, resolve: ColRef => Column,
             env: TypeCheck.Env = Map.empty,
             dtypeOf: Column => Option[SparkDT] = _ => None): Column = {
    def go(e: Expr): Column = e match {
      case IntLit(v) => lit(v)
      case NumLit(v) => lit(v)
      case StrLit(v) => lit(v)
      case BoolLit(v) => lit(v)
      case NullLit => lit(null)
      case DateLit(s) => to_date(lit(s))
      case TimeLit(s) => lit(s)
      case TimestampLit(s) => to_timestamp(lit(s))
      case i: IntervalLit => intervalExpr(i)
      case ArrLit(items) => array(items.map(go): _*)
      case c: ColRef => resolve(c)
      case Not(x) => !go(x)
      case Bin(op, l, r) => binOp(op, l, r, go, env)
      case Fn(name, args) =>
        fnCallLit(name, args, go).getOrElse(fnCall(name, args.map(go)))
      case w: WinFn => winFnCol(w, go, dtypeOf)
      case CaseWhen(operand, branches, elseE) =>
        // searched: WHEN is the condition; simple: `=` against the operand
        // (null-unsafe equality, standard SQL — a NULL operand matches no
        // branch and falls to ELSE)
        val conds = branches.map { case (c, r) =>
          (operand.map(o => go(o) === go(c)).getOrElse(go(c)), go(r))
        }
        val chained = conds.tail.foldLeft(when(conds.head._1, conds.head._2)) {
          case (acc, (c, r)) => acc.when(c, r)
        }
        elseE.map(e2 => chained.otherwise(go(e2))).getOrElse(chained)
      case Cast(x, dt) => castTo(go(x), dt)
      case Between(x, lo, hi, not, sym) =>
        val b = if (sym) HFunctions.hBetweenSymmetric(go(x), go(lo), go(hi))
                else HFunctions.hBetween(go(x), go(lo), go(hi))
        if (not) !b else b
      case ArrIndex(a, i) => // 0-based (Common.hs:72-76); OOB → NULL (ANSI getItem throws)
        HFunctions.arrayGet(go(a), i.toInt)
      case ArrSlice(a, from, to) =>
        val f = from.getOrElse(0L)
        to match {
          case Some(t) => slice(go(a), f.toInt + 1, math.max((t - f).toInt, 0))
          case None => slice(go(a), lit(f.toInt + 1), size(go(a)))
        }
      // standard SQL null-unsafe membership (NULL operand → UNKNOWN →
      // filtered), matching DuckDB — unlike the dialect's null-safe `=`
      case InList(x, items, not) =>
        val c = go(x).isin(items.map(go): _*)
        if (not) !c else c
      case _: InSub | _: ExistsSub => throw new IllegalArgumentException(
        "IN (SELECT …) / EXISTS (…) must be top-level AND conjuncts of the " +
          "WHERE clause (they plan as semi/anti joins, which OR/NOT nesting " +
          "cannot express)")
      case _: ScalarSub => throw new IllegalArgumentException(
        "scalar subquery is not supported in this position")
      case a: Agg => throw new IllegalArgumentException(
        s"aggregate ${a.name} in a non-aggregate context")
      // internal wrapper nodes — never reach scalar translation by
      // construction; named here so the match is exhaustive and a future
      // misuse fails with a message instead of a MatchError
      case _: Kept => throw new IllegalArgumentException(
        "internal: Kept (agg FILTER wrapper) outside aggregation context")
      case _: OrdKey => throw new IllegalArgumentException(
        "internal: OrdKey (in-call ORDER BY wrapper) outside an ordered " +
          "aggregate argument list")
    }
    go(e)
  }

  private def binOp(op: String, l: Expr, r: Expr, go: Expr => Column,
                    env: TypeCheck.Env): Column = op match {
    case "OR" => go(l) || go(r)
    case "AND" => go(l) && go(r)
    case "=" => HFunctions.hEq(go(l), go(r))   // null-safe (BinOp.hs:116-118)
    case "<>" => HFunctions.hNeq(go(l), go(r))
    case "<" => go(l) < go(r)
    case ">" => go(l) > go(r)
    case "<=" => go(l) <= go(r)
    case ">=" => go(l) >= go(r)
    case "+" =>
      if (isTimeExpr(l, env) && r.isInstanceOf[IntervalLit])
        HFunctions.timeAdd(go(l), go(r)) // TIME + INTERVAL wraps (AST.hs:155-173)
      else go(l) + go(r)
    case "-" =>
      if (isTimeExpr(l, env) && r.isInstanceOf[IntervalLit])
        HFunctions.timeSub(go(l), go(r))
      else go(l) - go(r)
    case "*" => go(l) * go(r)
    // `/` and `%` (extensions): real division — integer ÷ integer is
    // DOUBLE, matching DuckDB's `/` — and modulo with the dividend's sign
    // (Spark pmod differs; `%` matches DuckDB/Java semantics). A ZERO
    // divisor is NULL, DuckDB's rule end-to-end: without the guard, `/`
    // yields IEEE Infinity (double path) and `%` raises ANSI
    // DIVIDE_BY_ZERO — one zero denominator in 100 TB of rows must not
    // kill the job (the try_cast philosophy).
    case "/" =>
      val d = go(r)
      when(d === 0, lit(null)).otherwise(go(l).cast("double") / d)
    case "%" =>
      val d = go(r)
      when(d === 0, lit(null)).otherwise(go(l) % d)
    // JSON access (JsonOp.hs:33-84); key is a string literal or int index.
    // `->` / `#>` return the TYPED JSON value (a VARIANT — JOpArrow yields
    // FlowValue, JsonOp.hs:40-44); `->>` / `#>>` return text (JsonOp.hs:46).
    // Accesses compose: a chained `(j -> 'a') ->> 'b'` operates on the
    // VARIANT produced by the inner access, not on re-parsed text.
    case "->" => jsonAccess(l, r, typed = true, go)
    case "->>" => jsonAccess(l, r, typed = false, go)
    case "#>" | "#>>" => r match {
      case ArrLit(parts) =>
        val path = parts.map { case StrLit(s) => s; case IntLit(i) => s"[$i]"
          case other => throw new IllegalArgumentException(s"bad json path: $other") }
          .map(p => if (p.startsWith("[")) p else s".$p").mkString
        if (op == "#>")
          try_variant_get(jsonVariant(l, go), "$" + path, "variant")
        else get_json_object(jsonSource(l, go), "$" + path)
      case other => throw new IllegalArgumentException(s"$op expects a path array, got $other")
    }
  }

  /** Statically TIME-typed expressions: TIME literals, ::TIME casts,
    * TIME±INTERVAL chains over them, and — via the inferred type
    * environment — column refs whose dialect type is TIME, including
    * subquery output aliases (`SELECT t + INTERVAL 1 HOUR FROM
    * (SELECT ts::TIME AS t …)` gets wraparound semantics without a
    * re-cast). Drives the wraparound arithmetic dispatch above (the
    * reference types per-row at runtime; our dialect is schema-ful, so
    * the static type is the dispatch). */
  private def isTimeExpr(e: Expr, env: TypeCheck.Env): Boolean = e match {
    case _: TimeLit => true
    case Cast(_, TTime) => true
    case Bin("+" | "-", l, _: IntervalLit) => isTimeExpr(l, env)
    case c: ColRef => TypeCheck.infer(c, env).contains(TTime)
    case _ => false
  }

  private def jsonAccess(j: Expr, key: Expr, typed: Boolean, go: Expr => Column): Column = {
    val path = key match {
      case StrLit(k) => s"$$.$k"
      case IntLit(i) => s"$$[$i]"
      case other => throw new IllegalArgumentException(s"-> expects string/int key, got $other")
    }
    if (typed) try_variant_get(jsonVariant(j, go), path, "variant")
    else get_json_object(jsonSource(j, go), path)
  }

  /** The operand of a JSON op as a VARIANT: a typed access (`->` / `#>`)
    * already IS one; anything else is JSON text and gets parsed. */
  private def jsonVariant(e: Expr, go: Expr => Column): Column = e match {
    case Bin("->" | "#>", _, _) => go(e)
    case _ => try_parse_json(go(e))
  }

  /** The operand of a text JSON op (`->>` / `#>>`) as JSON text:
    * a typed-access VARIANT renders back to its JSON form (to_json), so
    * get_json_object semantics stay byte-identical to the plain-text path. */
  private def jsonSource(e: Expr, go: Expr => Column): Column = e match {
    case Bin("->" | "#>", _, _) => to_json(go(e))
    case _ => go(e)
  }

  // Backstop for the variable-arity names the parser can't check (the
  // pipeline fns): arity is checked against an explicit per-name table
  // BEFORE dispatch, so a wrong-arity call surfaces as the dialect's own
  // error class while a genuine IndexOutOfBoundsException thrown inside a
  // function implementation still propagates as the bug it is (r13
  // RejectFuzz audit; narrowed from a catch-all in r14 per ADVICE).
  private val fnArity: Map[String, (Int, Int)] = {
    val one = Seq("SIN", "SINH", "ASIN", "ASINH", "COS", "COSH", "ACOS",
      "ACOSH", "TAN", "TANH", "ATAN", "ATANH", "ABS", "CEIL", "FLOOR",
      "SIGN", "SQRT", "LOG", "LOG2", "LOG10", "EXP", "IS_NULL", "IS_INT",
      "IS_FLOAT", "IS_NUM", "IS_BOOL", "IS_STR", "IS_ARRAY", "IS_DATE",
      "IS_TIME", "TO_STR", "TO_LOWER", "TO_UPPER", "TRIM", "LEFT_TRIM",
      "RIGHT_TRIM", "REVERSE", "STRLEN", "ARRAY_DISTINCT", "ARRAY_LENGTH",
      "ARRAY_MAX", "ARRAY_MIN", "ARRAY_SORT", "TOKENS", "WORD_HASHES",
      "SHINGLES3", "SIMHASH16", "FINGERPRINT", "STOPWORD_RATIO",
      "QUALITY_SCORE", "L2NORMALIZE", "LSH16", "QUANTIZE_INT8")
    val two = Seq("IFNULL", "NULLIF", "DATETOSTRING", "STRINGTODATE",
      "SPLIT", "CHUNKSOF", "TAKE", "TAKEEND", "DROP", "DROPEND",
      "ARRAY_CONTAIN", "ARRAY_EXCEPT", "ARRAY_INTERSECT", "ARRAY_REMOVE",
      "ARRAY_UNION", "LEVENSHTEIN", "DATEDIFF", "JACCARD", "HAMMING",
      "COSINE", "DOT")
    val oneOrTwo = Seq("ROUND", "ARRAY_JOIN")
    (one.map(_ -> ((1, 1))) ++ two.map(_ -> ((2, 2))) ++
      oneOrTwo.map(_ -> ((1, 2)))).toMap
  }

  private def fnCall(name: String, a: Seq[Column]): Column = {
    fnArity.get(name).foreach { case (lo, hi) =>
      if (a.size < lo || a.size > hi) throw new IllegalArgumentException(
        s"$name: wrong number of arguments (got ${a.size})")
    }
    fnCallArities(name, a)
  }

  private def fnCallArities(name: String, a: Seq[Column]): Column = name match {
    case "SIN" => sin(a(0));     case "SINH" => sinh(a(0))
    case "ASIN" => asin(a(0));   case "ASINH" => asinh(a(0))
    case "COS" => cos(a(0));     case "COSH" => cosh(a(0))
    case "ACOS" => acos(a(0));   case "ACOSH" => acosh(a(0))
    case "TAN" => tan(a(0));     case "TANH" => tanh(a(0))
    case "ATAN" => atan(a(0));   case "ATANH" => atanh(a(0))
    case "ABS" => abs(a(0));     case "CEIL" => ceil(a(0))
    case "FLOOR" => floor(a(0)); case "ROUND" => round(a(0))
    case "SIGN" => signum(a(0)); case "SQRT" => sqrt(a(0))
    case "LOG" => log(a(0));     case "LOG2" => log2(a(0))
    case "LOG10" => log10(a(0)); case "EXP" => exp(a(0))
    case "IS_NULL" => a(0).isNull // `e IS [NOT] NULL` (parser-desugared)
    case "IS_INT" => a(0).try_cast("long").isNotNull
    case "IS_FLOAT" | "IS_NUM" => a(0).try_cast("double").isNotNull
    case "IS_BOOL" => a(0).try_cast("boolean").isNotNull
    case "IS_STR" => a(0).cast("string").isNotNull
    case "IS_ARRAY" => lit(true) // static on typed arrays (SURVEY §7.3)
    case "IS_DATE" => a(0).try_cast("date").isNotNull
    case "IS_TIME" => a(0).try_cast("timestamp").isNotNull
    case "TO_STR" => HFunctions.toStr(a(0))
    case "TO_LOWER" => lower(a(0)); case "TO_UPPER" => upper(a(0))
    case "TRIM" => trim(a(0))
    case "LEFT_TRIM" => ltrim(a(0)); case "RIGHT_TRIM" => rtrim(a(0))
    case "REVERSE" => reverse(a(0)); case "STRLEN" => HFunctions.strLen(a(0))
    case "IFNULL" => HFunctions.ifNull(a(0), a(1))
    case "NULLIF" => HFunctions.nullIf(a(0), a(1))
    // Non-literal (per-row) format strings: the reference evaluates the
    // format at runtime (op_dateStr/op_strDate take FlowText). Catalyst's
    // DateFormatClass / GetTimestamp accept a NON-FOLDABLE format — the
    // formatter is built per row instead of once — so call_function keeps
    // this codegen'd with no UDF; the literal path (fnCallLit) stays the
    // build-formatter-once fast path.
    case "DATETOSTRING" => call_function("date_format", a(0), a(1))
    case "STRINGTODATE" => call_function("try_to_date", a(0), a(1))
    case "SPLIT" => HFunctions.hSplit(a(0), a(1))
    case "CHUNKSOF" => regexp_extract_all(a(1), concat(lit("(?s).{1,"), a(0), lit("}")), lit(0))
    case "TAKE" => HFunctions.hTake(a(0), a(1))
    case "TAKEEND" => HFunctions.hTakeEnd(a(0), a(1))
    case "DROP" => HFunctions.hDrop(a(0), a(1))
    case "DROPEND" => HFunctions.hDropEnd(a(0), a(1))
    case "ARRAY_CONTAIN" => array_contains(a(0), a(1))
    case "ARRAY_DISTINCT" => array_distinct(a(0))
    case "ARRAY_EXCEPT" => array_except(a(0), a(1))
    case "ARRAY_INTERSECT" => array_intersect(a(0), a(1))
    case "ARRAY_LENGTH" => size(a(0))
    case "ARRAY_REMOVE" => array_remove(a(0), a(1))
    case "ARRAY_UNION" => array_union(a(0), a(1))
    case "ARRAY_JOIN" =>
      // ArrayJoin's delimiter is a full expression — a per-row separator
      // column rides whole-stage codegen like the literal form
      if (a.size == 1) array_join(a(0), "")
      else call_function("array_join", a(0), a(1))
    case "LEVENSHTEIN" => levenshtein(a(0), a(1))
    // DATEDIFF(end, start) → whole days (extension; the reference's only
    // date fns are DATETOSTRING/STRINGTODATE)
    case "DATEDIFF" => datediff(a(0), a(1)).cast("long")
    case "ARRAY_MAX" => array_max(a(0)); case "ARRAY_MIN" => array_min(a(0))
    case "ARRAY_SORT" => array_sort(a(0))
    // LLM-pipeline primitives (SURVEY §6) — same formulas as the Column
    // API frontend (PipelineFunctions), so the shared oracles apply
    case "TOKENS" => PipelineFunctions.tokens(a(0))
    case "WORD_HASHES" => PipelineFunctions.wordHashes(a(0))
    case "SHINGLES3" => PipelineFunctions.combineShingles3(a(0))
    case "JACCARD" => PipelineFunctions.jaccard(a(0), a(1))
    case "SIMHASH16" => PipelineFunctions.simhash16Col(a(0))
    case "HAMMING" => PipelineFunctions.hamming(a(0), a(1))
    case "FINGERPRINT" => PipelineFunctions.polyFingerprint(a(0))
    case "STOPWORD_RATIO" => PipelineFunctions.stopwordRatio(a(0))
    case "QUALITY_SCORE" => PipelineFunctions.qualityScore(a(0))
    case "COSINE" => PipelineFunctions.cosine(a(0), a(1))
    // similarity/ANN pack: vector args pass through vecD (no-op on double
    // arrays, stable-cast on raw float embeddings) so each fn works on
    // both raw and pre-normalized inputs
    case "L2NORMALIZE" => PipelineFunctions.l2normalize(a(0))
    case "DOT" =>
      PipelineFunctions.dot(PipelineFunctions.vecD(a(0)), PipelineFunctions.vecD(a(1)))
    case "LSH16" =>
      PipelineFunctions.lshSignatureFast(PipelineFunctions.vecD(a(0)))
    case "QUANTIZE_INT8" => PipelineFunctions.quantizeInt8(a(0))
    case other => throw new IllegalArgumentException(s"unknown function $other")
  }

  /** Functions whose 2nd argument must stay a literal (format strings,
    * join separators) get special-cased before generic translation. */
  private def fnCallLit(name: String, args: Seq[Expr], go: Expr => Column): Option[Column] =
    (name, args) match {
      // SHINGLES3(WORD_HASHES(w)): fused to the native one-pass expression.
      // Translating the composition literally re-evaluates the word-hash
      // HOF at every shingle element access once projections collapse —
      // O(words²) md5 digests per doc. Values are bit-identical.
      case ("SHINGLES3", Seq(Fn("WORD_HASHES", Seq(w)))) =>
        Some(PipelineFunctions.shingles3(go(w)))
      case ("DATETOSTRING", Seq(d, StrLit(fmt))) => Some(date_format(go(d), fmt))
      // ROUND(x, n): scale must be a literal (Spark's round takes an Int
      // scale, and a silent fall-through to 1-arg round would truncate)
      case ("ROUND", Seq(x, IntLit(n))) => Some(round(go(x), n.toInt))
      case ("ROUND", Seq(_, bad)) => throw new IllegalArgumentException(
        s"ROUND scale must be an integer literal, got $bad")
      // try_to_date: a malformed string yields NULL for that row — ANSI
      // to_date would abort the whole query on one bad record (see castTo)
      case ("STRINGTODATE", Seq(s, StrLit(fmt))) =>
        Some(try_to_date(go(s), fmt))
      case ("ARRAY_JOIN", Seq(arr, StrLit(sep))) => Some(array_join(go(arr), sep))
      case ("CHUNKSOF", Seq(IntLit(n), s)) => Some(HFunctions.chunksOf(n.toInt, go(s)))
      // MINHASH(hs, i): permutation index must be a literal — it selects
      // the (a, b) constants of the i-th shared permutation (MinhashPerms)
      case ("MINHASH", Seq(hs, IntLit(i))) =>
        Some(PipelineFunctions.minhash(go(hs), i.toInt))
      // BUCKET(s, n): deterministic hash bucket in [0, n) — the dialect's
      // reproducible-sampling primitive (the grammar has no % operator);
      // same md5-derived hash32 as the curation operators, so the shared
      // oracles apply
      case ("BUCKET", Seq(s, IntLit(n))) =>
        // n <= 0 would be pmod-by-zero (ANSI abort) or negative buckets
        // (a `< rate` sampling filter silently keeps everything)
        if (n <= 0) throw new IllegalArgumentException(
          s"BUCKET modulus must be a positive int literal, got $n")
        Some(pmod(PipelineFunctions.hash32(go(s)), lit(n)))
      case ("BUCKET", Seq(_, other)) => throw new IllegalArgumentException(
        s"BUCKET modulus must be a positive int literal, got $other")
      // SHIFTRIGHT(x, n): shift count must be a literal (Spark's shiftright
      // takes an Int, and a data-dependent shift has no dialect use case)
      case ("SHIFTRIGHT", Seq(x, IntLit(n))) =>
        Some(shiftright(go(x), n.toInt))
      case ("SHIFTRIGHT", Seq(_, other)) => throw new IllegalArgumentException(
        s"SHIFTRIGHT count must be an int literal, got $other")
      case _ => None
    }

  /** Dialect CAST: try_cast semantics throughout. The reference evaluates
    * casts per row and a failure drops that row (Codegen errors propagate
    * as Left — V1.hs:235-240 drops silently); under Spark 4's ANSI mode a
    * plain cast would instead ABORT the whole query on one malformed value.
    * NULL-on-failure is the closest scalable behavior (and one bad row out
    * of 100 TB must never kill the job). */
  private def castTo(c: Column, dt: SqlType): Column = dt match {
    case TDate => c.try_cast(DateType)
    case TTimestamp => c.try_cast(TimestampType)
    case TTime =>
      // TIME = time-of-day as zero-padded HH:mm:ss (no Spark TIME type;
      // lexicographic order on the fixed-width form IS chronological order).
      // Timestamp-castable inputs take their clock part; strings pass through.
      coalesce(date_format(c.try_cast(TimestampType), "HH:mm:ss"), c.cast(StringType))
    case other => c.try_cast(sparkType(other))
  }

  // ---- aggregate extraction (Planner.hs:352-367, 390-432) ------------------

  /** Collect distinct aggregates from an expression tree. */
  def collectAggs(e: Expr): Seq[Agg] = e match {
    case a: Agg => Seq(a)
    case InList(x, items, _) => (x +: items).flatMap(collectAggs).distinct
    case InSub(x, _, _) => collectAggs(x) // sub body is its own scope
    case Bin(_, l, r) => (collectAggs(l) ++ collectAggs(r)).distinct
    case Not(x) => collectAggs(x)
    case Fn(_, args) => args.flatMap(collectAggs).distinct
    case Cast(x, _) => collectAggs(x)
    case Between(x, lo, hi, _, _) => (collectAggs(x) ++ collectAggs(lo) ++ collectAggs(hi)).distinct
    case ArrIndex(x, _) => collectAggs(x)
    case ArrSlice(x, _, _) => collectAggs(x)
    case ArrLit(items) => items.flatMap(collectAggs).distinct
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .flatMap(collectAggs).distinct
    case _ => Nil
  }

  /** Top-down partial rewrite: where `pf` is defined the replacement is
    * taken verbatim (no recursion into it); elsewhere the node is rebuilt
    * with rewritten children. Subquery bodies are their own scope and are
    * not entered (mirrors collectAggs). */
  def rewriteExpr(e: Expr)(pf: PartialFunction[Expr, Expr]): Expr =
    if (pf.isDefinedAt(e)) pf(e)
    else e match {
      case Bin(op, l, r) => Bin(op, rewriteExpr(l)(pf), rewriteExpr(r)(pf))
      case Not(x) => Not(rewriteExpr(x)(pf))
      case Fn(n, args) => Fn(n, args.map(rewriteExpr(_)(pf)))
      case Agg(n, args, s, d) => Agg(n, args.map(rewriteExpr(_)(pf)), s, d)
      case OrdKey(x, d, nl) => OrdKey(rewriteExpr(x)(pf), d, nl)
      case Kept(c, v) => Kept(rewriteExpr(c)(pf), rewriteExpr(v)(pf))
      case Cast(x, dt) => Cast(rewriteExpr(x)(pf), dt)
      case w: WinFn =>
        w.copy(args = w.args.map(rewriteExpr(_)(pf)),
          partitionBy = w.partitionBy.map(rewriteExpr(_)(pf)),
          orderBy = w.orderBy.map(o => o.copy(e = rewriteExpr(o.e)(pf))))
      case Between(x, lo, hi, n, s) =>
        Between(rewriteExpr(x)(pf), rewriteExpr(lo)(pf),
          rewriteExpr(hi)(pf), n, s)
      case InList(x, items, n) =>
        InList(rewriteExpr(x)(pf), items.map(rewriteExpr(_)(pf)), n)
      case InSub(x, q, n) => InSub(rewriteExpr(x)(pf), q, n)
      case ArrIndex(x, i) => ArrIndex(rewriteExpr(x)(pf), i)
      case ArrSlice(x, f, t) => ArrSlice(rewriteExpr(x)(pf), f, t)
      case ArrLit(items) => ArrLit(items.map(rewriteExpr(_)(pf)))
      case CaseWhen(op0, bs, el) =>
        CaseWhen(op0.map(rewriteExpr(_)(pf)),
          bs.map { case (c, r) => (rewriteExpr(c)(pf), rewriteExpr(r)(pf)) },
          el.map(rewriteExpr(_)(pf)))
      case other => other
    }

  /** All window-function calls in an expression (not entering subqueries).
    * WinFns cannot nest in this dialect, so a found node is a whole unit. */
  def collectWins(e: Expr): Seq[WinFn] = e match {
    case w: WinFn => Seq(w)
    case Bin(_, l, r) => (collectWins(l) ++ collectWins(r)).distinct
    case Not(x) => collectWins(x)
    case Fn(_, args) => args.flatMap(collectWins).distinct
    case Agg(_, args, _, _) => args.flatMap(collectWins).distinct
    case Kept(c, v) => (collectWins(c) ++ collectWins(v)).distinct
    case Cast(x, _) => collectWins(x)
    case Between(x, lo, hi, _, _) =>
      (collectWins(x) ++ collectWins(lo) ++ collectWins(hi)).distinct
    case InList(x, items, _) => (x +: items).flatMap(collectWins).distinct
    case InSub(x, _, _) => collectWins(x)
    case ArrIndex(x, _) => collectWins(x)
    case ArrSlice(x, _, _) => collectWins(x)
    case ArrLit(items) => items.flatMap(collectWins).distinct
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .flatMap(collectWins).distinct
    case _ => Nil
  }

  /** Rewrite aggregates to their assigned output aliases. */
  def rewriteAggs(e: Expr, names: Map[Agg, String]): Expr = e match {
    case a: Agg => ColRef(None, names(a))
    case InList(x, items, n) =>
      InList(rewriteAggs(x, names), items.map(rewriteAggs(_, names)), n)
    case InSub(x, q, n) => InSub(rewriteAggs(x, names), q, n)
    case Bin(op, l, r) => Bin(op, rewriteAggs(l, names), rewriteAggs(r, names))
    case Not(x) => Not(rewriteAggs(x, names))
    case Fn(n, args) => Fn(n, args.map(rewriteAggs(_, names)))
    case Cast(x, dt) => Cast(rewriteAggs(x, names), dt)
    case Between(x, lo, hi, n, s) =>
      Between(rewriteAggs(x, names), rewriteAggs(lo, names), rewriteAggs(hi, names), n, s)
    case ArrIndex(x, i) => ArrIndex(rewriteAggs(x, names), i)
    case ArrSlice(x, f, t) => ArrSlice(rewriteAggs(x, names), f, t)
    case ArrLit(items) => ArrLit(items.map(rewriteAggs(_, names)))
    case CaseWhen(op0, bs, el) =>
      CaseWhen(op0.map(rewriteAggs(_, names)),
        bs.map { case (c, r) => (rewriteAggs(c, names), rewriteAggs(r, names)) },
        el.map(rewriteAggs(_, names)))
    case other => other
  }

  /** Spark sort key for one ORDER BY item, applying the dialect's
    * DuckDB-default null placement: NULLS LAST in BOTH directions unless
    * an explicit NULLS FIRST/LAST was written (Spark's own ASC default
    * is nulls-FIRST, which would diverge from the oracle on nullable
    * keys). */
  private[sql] def sortCol(c: Column, o: OrderItem): Column =
    (o.desc, o.nullsLast.getOrElse(true)) match {
      case (false, true) => c.asc_nulls_last
      case (false, false) => c.asc_nulls_first
      case (true, true) => c.desc_nulls_last
      case (true, false) => c.desc_nulls_first
    }

  /** Join the sorted (keys…, v) structs' values for STRING_AGG: NULL
    * values are skipped, and when NO non-null value survives the result
    * is NULL — DuckDB's string_agg contract (a bare array_join would
    * yield "" there, indistinguishable from aggregating empty strings). */
  private def stringAggJoin(sorted: Column, sep: String): Column = {
    val vals = filter(transform(sorted, x => x.getField("v")),
      v => v.isNotNull)
    when(size(vals) === 0, lit(null)).otherwise(array_join(vals, sep))
  }

  /** Struct comparator for the ordered aggregates (STRING_AGG/ARRAY_AGG):
    * compares fields k0..kn-1 in order, first differing key decides, DESC
    * keys flip. NULL keys sort LAST regardless of direction — DuckDB's
    * default null order — and two NULLs fall through to the next key, so
    * a NULL never makes a row "equal to everything" (a raw `<` on a NULL
    * key is NULL → silently false → nondeterministic placement). */
  private def orderedAggComparator(keys: Seq[OrdKey])
      : (Column, Column) => Column = (l, r) =>
    keys.zipWithIndex.foldRight(lit(0)) { case ((k, i), acc) =>
      val (lk, rk) = (l.getField(s"k$i"), r.getField(s"k$i"))
      val (lt, gt) =
        if (k.desc) (lk > rk, lk < rk) else (lk < rk, lk > rk)
      // explicit NULLS FIRST flips the null arm; default stays LAST
      val (ln, rn) = if (k.nullsLast.getOrElse(true)) (1, -1) else (-1, 1)
      when(lk.isNull && rk.isNull, acc)
        .when(lk.isNull, ln).when(rk.isNull, rn)
        .when(lt, -1).when(gt, 1).otherwise(acc)
    }

  /** Translate one aggregate call (AggOp.hs:38-162; SURVEY §2.5 divergences:
    * COUNT(e) skips NULLs per standard SQL, AVG is supported, MIN/MAX start
    * from NULL not FlowInt 0). */
  def aggColumn(a: Agg, resolve: ColRef => Column): Column = a match {
    case Agg("COUNT", _, true, _) => count(lit(1))
    // ROLLUP level bitmask (last group col = LSB — the same convention as
    // DuckDB's grouping(), so shared oracles compare directly)
    case Agg("GROUPING_ID", Nil, _, _) => grouping_id()
    // GROUPING(col) — the per-column rollup indicator (standard SQL;
    // 1 = this output row aggregates over col). Spark's grouping() and
    // DuckDB's GROUPING agree; cast to long so gid-style arithmetic types
    // line up across engines.
    case Agg("GROUPING", Seq(e), _, _) =>
      grouping(column(e, resolve)).cast("long")
    // DISTINCT aggregates (extension; batch-only — Validate gates them):
    // Spark plans these as a partial-dedup expand + final agg, shuffle-safe
    case Agg("COUNT", Seq(e), _, true) => count_distinct(column(e, resolve))
    case Agg("SUM", Seq(e), _, true) => sum_distinct(column(e, resolve))
    case Agg("COUNT", Seq(e), _, _) => count(column(e, resolve))
    case Agg("SUM", Seq(e), _, _) => sum(column(e, resolve))
    case Agg("MIN", Seq(e), _, _) => min(column(e, resolve))
    case Agg("MAX", Seq(e), _, _) => max(column(e, resolve))
    case Agg("AVG", Seq(e), _, _) => avg(column(e, resolve))
    // HyperLogLog++ sketch — the streaming/100 TB-scale form of COUNT
    // DISTINCT (mergeable partial state, works in update-mode streaming)
    case Agg("APPROX_COUNT_DISTINCT", Seq(e), _, _) =>
      approx_count_distinct(column(e, resolve))
    // Exact percentile/median (extension; linear interpolation — the same
    // definition as DuckDB's quantile_cont, so results hash-match). Sort-
    // free: Spark's Percentile aggregate builds a per-group value map.
    case Agg("PERCENTILE", Seq(e, p), _, _) =>
      val frac = p match {
        case NumLit(x) => x
        case IntLit(x) => x.toDouble
        case other => throw new IllegalArgumentException(
          s"PERCENTILE fraction must be a literal, got $other")
      }
      percentile(column(e, resolve), lit(frac))
    case Agg("MEDIAN", Seq(e), _, _) => median(column(e, resolve))
    // Mergeable quantile sketch (GK summaries, bounded state) — the
    // streaming/100 TB form of PERCENTILE; returns an actual data value.
    case Agg("APPROX_PERCENTILE", e +: p +: rest, _, _) =>
      val frac = p match {
        case NumLit(x) => x
        case IntLit(x) => x.toDouble
        case other => throw new IllegalArgumentException(
          s"APPROX_PERCENTILE fraction must be a literal, got $other")
      }
      val acc = rest match {
        case Seq() => 10000L
        case Seq(IntLit(a)) => a
        case other => throw new IllegalArgumentException(
          s"APPROX_PERCENTILE accuracy must be an int literal, got $other")
      }
      percentile_approx(column(e, resolve), lit(frac), lit(acc))
    // STRING_AGG (ordered aggregate, extension): collect (keys..., value)
    // structs, sort with an explicit comparator (first differing key
    // decides; DESC keys flip), join. The collect+sort runs per GROUP on
    // the agg side - at scale the state is the group's values, the price
    // any ordered concatenation costs; NULL values are skipped
    // (array_join), matching DuckDB's string_agg.
    case Agg("STRING_AGG", vArg +: sepArg +: ordKeys, _, _) =>
      val sep = sepArg match {
        case StrLit(x) => x
        case other => throw new IllegalArgumentException(
          "STRING_AGG separator must be a string literal")
      }
      val keys = ordKeys.collect { case k: OrdKey => k }
      require(keys.size == ordKeys.size,
        s"internal: unexpected STRING_AGG argument shape $ordKeys")
      val fields = keys.zipWithIndex.map { case (k, i) =>
        column(k.e, resolve).as(s"k$i") } :+
        column(vArg, resolve).cast("string").as("v")
      val sorted = array_sort(collect_list(struct(fields: _*)),
        orderedAggComparator(keys))
      stringAggJoin(sorted, sep)
    // ARRAY_AGG (ordered aggregate, extension): same comparator-sorted
    // collect as STRING_AGG, but the values keep their type and land in
    // an array instead of a joined string. NULL values are kept (DuckDB
    // array_agg keeps them too). A FILTER clause arrives as the Kept
    // marker: the struct is built under when(cond, …), so collect_list
    // skips filtered-out rows (NULL input) BEFORE the shuffle while a
    // genuine NULL value still rides inside its non-null struct — exact
    // DuckDB `array_agg(v ORDER BY …) FILTER (WHERE c)` semantics.
    case Agg("ARRAY_AGG", vArg +: ordKeys, _, _) if ordKeys.nonEmpty =>
      val keys = ordKeys.collect { case k: OrdKey => k }
      require(keys.size == ordKeys.size,
        s"internal: unexpected ARRAY_AGG argument shape $ordKeys")
      val (cond, v) = vArg match {
        case Kept(c, x) => (Some(column(c, resolve)), x)
        case x => (None, x)
      }
      val fields = keys.zipWithIndex.map { case (k, i) =>
        column(k.e, resolve).as(s"k$i") } :+ column(v, resolve).as("v")
      val st = struct(fields: _*)
      val sorted = array_sort(
        collect_list(cond.map(c => when(c, st)).getOrElse(st)),
        orderedAggComparator(keys))
      val arr = transform(sorted, x => x.getField("v"))
      // a group where NO row passes the filter: DuckDB's array_agg is
      // NULL over zero inputs, collect_list is [] — map it (unreachable
      // without FILTER: groups have ≥1 row and NULL values are kept)
      if (cond.isDefined) when(size(arr) === 0, lit(null)).otherwise(arr)
      else arr
    case Agg("TOPK", Seq(e, IntLit(k)), _, _) =>
      TopK.topk(column(e, resolve).cast("double"), k.toInt)
    case Agg("TOPKDISTINCT", Seq(e, IntLit(k)), _, _) =>
      TopK.topkDistinct(column(e, resolve).cast("double"), k.toInt)
    case other => throw new IllegalArgumentException(s"bad aggregate: $other")
  }

  // ---- FROM-clause planning ------------------------------------------------

  private case class Source(df: DataFrame, window: Option[WindowSpec])

  /** Event-time column of a relation: declared `_ts` first, else `ts`
    * (SURVEY §2.10: recordTimestamp ↦ a dedicated event-time column). */
  def tsCol(df: DataFrame): String =
    if (df.columns.contains("_ts")) "_ts"
    else if (df.columns.contains("ts")) "ts"
    else throw new IllegalArgumentException(
      s"no event-time column (_ts/ts) in [${df.columns.mkString(",")}]")

  private def planFrom(ref: TableRef, lookup: Lookup,
                       declared: DeclaredTypes): Source = ref match {
    case TRStream(n) => Source(lookup(n).alias(n), None)
    case TRSubquery(sel) => Source(plan(sel, lookup, declared = declared), None)
    case TRAlias(inner, a) =>
      val s = planFrom(inner, lookup, declared); Source(s.df.alias(a), s.window)
    case TRWindowed(inner, w) =>
      val s = planFrom(inner, lookup, declared)
      require(s.window.isEmpty, "nested windows are not supported")
      Source(s.df, Some(w))
    case TRFlatten(inner, e, alias) =>
      // one row per array element (explode = Spark's Generate — map-side,
      // no shuffle); the element column joins the input row's columns
      val s = planFrom(inner, lookup, declared)
      def res(c: ColRef): Column = c match {
        case ColRef(Some(q), n) => col(s"$q.$n")
        case ColRef(None, n) => col(n)
      }
      Source(s.df.withColumn(alias, explode(column(e, res))), s.window)
    case j: TRJoin => Source(planJoin(j, lookup, declared), None)
    case r: TRRecursive => Source(planRecursive(r, lookup, declared), None)
  }

  /** WITH RECURSIVE fixpoint loop — semi-naive evaluation: the recursive
    * reference inside `step` resolves to the previous round's FRONTIER
    * (UNION: only rows never seen before, the delta; UNION ALL: the full
    * previous round), each round is pure distributed joins/aggs, and the
    * driver only orchestrates (the Graph.connectedComponents shape,
    * including the per-round localCheckpoint that keeps the iterative
    * logical plan from growing without bound). Batch/pull only.
    *
    * Termination: frontier empty. UNION queries terminate on any finite
    * domain (the accumulated set grows monotonically); UNION ALL loops
    * are the standard footgun — both are capped at `maxRecursionRounds`
    * and FAIL LOUDLY at the cap (silent truncation would be a wrong
    * answer, not a slow one). */
  private val maxRecursionRounds = 200

  /** EXPLAIN mode: an iterative fixpoint has no single static physical
    * plan, and EXPLAIN must never EXECUTE the recursion — with this set,
    * [[planRecursive]] renders base ∪ one SYMBOLIC step round (frontier
    * bound to the base relation, fully lazy) instead of running the
    * loop. */
  private[sql] val explainMode = new scala.util.DynamicVariable[Boolean](false)

  private def planRecursive(r: TRRecursive, lookup: Lookup,
                            declared: DeclaredTypes): DataFrame = {
    val baseDf = plan(r.base, lookup, declared = declared)
    require(!baseDf.isStreaming,
      "WITH RECURSIVE is batch/pull only (a fixpoint over an unbounded " +
        "stream is undefined)")
    if (explainMode.value) {
      val stepLookup: Lookup = nm =>
        if (nm.equalsIgnoreCase(r.name)) baseDf else lookup(nm)
      return baseDf.unionAll(plan(r.step, stepLookup, declared = declared)
        .toDF(baseDf.columns.toIndexedSeq: _*))
    }
    // only each round's FRONTIER is checkpointed; the accumulated result
    // is a lazy union of those flat checkpointed leaves — plan size and
    // materialized bytes stay LINEAR in rounds (checkpointing the whole
    // accumulation each round would rewrite O(rounds²) data)
    val base = (if (r.unionAll) baseDf else baseDf.distinct())
      .localCheckpoint(true)
    var parts = Vector(base)
    def acc: DataFrame = parts.reduce(_ unionAll _)
    var frontier = base
    var iter = 0
    while (!frontier.isEmpty && iter < maxRecursionRounds) {
      val stepLookup: Lookup = nm =>
        if (nm.equalsIgnoreCase(r.name)) frontier else lookup(nm)
      val next0 = plan(r.step, stepLookup, declared = declared)
      require(next0.columns.length == base.columns.length,
        s"WITH RECURSIVE ${r.name}: step produces ${next0.columns.length} " +
          s"columns, base produced ${base.columns.length}")
      // positional union (standard SQL) — align step names to base names
      val next = next0.toDF(base.columns.toIndexedSeq: _*)
      frontier =
        (if (r.unionAll) next else next.distinct().exceptAll(acc))
          .localCheckpoint(true)
      if (!frontier.isEmpty) parts :+= frontier
      iter += 1
    }
    require(frontier.isEmpty,
      s"WITH RECURSIVE ${r.name}: no fixpoint after $maxRecursionRounds " +
        "rounds" + (if (r.unionAll) " — UNION ALL recursions must " +
        "terminate by construction; use UNION for set semantics" else ""))
    acc
  }

  private def planJoin(j: TRJoin, lookup: Lookup,
                       declared: DeclaredTypes): DataFrame = {
    if (j.joinType == "asof" || j.joinType == "asof_left")
      return planAsofJoin(j, lookup, declared)
    val left = planFrom(j.l, lookup, declared)
    val right = planFrom(j.r, lookup, declared)
    require(left.window.isEmpty && right.window.isEmpty,
      "joining time-windowed streams is not supported (Codegen/V1.hs:295-300)")
    // Streaming inputs must carry a watermark BEFORE a stream-stream join:
    // it bounds the buffered state to the WITHIN window (instead of growing
    // forever), and Spark refuses outer stream-stream joins without one.
    // Grace = the WITHIN interval (the reference's join grace is 0 —
    // jwGraceMs, Codegen/V1.hs:287-291 — so the window itself is the bound).
    // A chained join's left side has no plain ts (qualifyCollisions renamed
    // it to the literal `<alias>.ts`); its watermark propagated through the
    // inner join, so only plain-ts (leaf) inputs set one here.
    // WITHIN absent (extension): a plain relational join — legal only for
    // batch inputs, where no state bound is needed; streams must bound
    // their buffered state with WITHIN.
    if (j.within.isEmpty)
      require(!left.df.isStreaming && !right.df.isStreaming,
        "WITHIN is required when joining streams (it bounds the join state)")
    def wm(df: DataFrame): DataFrame = j.within match {
      case Some(iv) if df.isStreaming &&
          (df.columns.contains("_ts") || df.columns.contains("ts")) =>
        df.withWatermark(tsCol(df), intervalString(iv))
      case _ => df
    }
    val (ldf, rdf) = (wm(left.df), wm(right.df))
    // Event time of a join side, anchored at its leftmost stream: a
    // chained-join side carries the renamed literal `a.ts` column
    // (backtick-quoted — checked FIRST: a deeper chain can also hold a
    // later leaf's un-renamed plain ts, which must not shadow the anchor);
    // a leaf side resolves `alias.ts` through its alias. So in
    // `a JOIN b ... JOIN c`, c is matched against a's timestamps
    // (left-anchored chaining; the dialect's documented n-way semantics).
    // The plain-name fallbacks test ANCHOR-QUALIFIED resolvability, not
    // bare columns.contains on the whole frame: a side whose anchor leaf
    // uses `ts` while a pass-through leaf contributes an uncollided `_ts`
    // must resolve the anchor's ts, not fail on `<anchor>._ts`.
    def eventTs(df: DataFrame, anchor: String): Column = {
      def resolves(name: String): Boolean =
        try { df(name); true } catch { case _: Throwable => false }
      if (df.columns.contains(s"$anchor._ts")) col(s"`$anchor._ts`")
      else if (df.columns.contains(s"$anchor.ts")) col(s"`$anchor.ts`")
      else if (resolves(s"$anchor._ts")) col(s"$anchor._ts")
      else if (resolves(s"$anchor.ts")) col(s"$anchor.ts")
      else throw new IllegalArgumentException(
        s"no event-time column (_ts/ts) in [${df.columns.mkString(",")}]")
    }
    val range: Column = j.within match {
      case Some(iv) =>
        val lts = eventTs(ldf, refAlias(j.l))
        val rts = eventTs(rdf, refAlias(j.r))
        val w = intervalExpr(iv)
        rts >= lts - w && rts <= lts + w // Stream.hs:297
      case None => lit(true) // batch join, no time bound (folded away)
    }
    def resolve(c: ColRef): Column = c match {
      // a chained join's left side carries collision-renamed literal "q.n"
      // columns (same fallback as the SELECT-level resolver)
      case ColRef(Some(q), n) if ldf.columns.contains(s"$q.$n") ||
          rdf.columns.contains(s"$q.$n") => col(s"`$q.$n`")
      case ColRef(Some(q), n) => col(s"$q.$n")
      case ColRef(None, n) => col(n)
    }
    // BANDED keyed WITHIN join (r16, guide §2.4/§3.1): the equi-key form
    // shared the CrossC band's problem at a smaller exponent — with the
    // time bounds left as a post-join residual, the join enumerates ALL
    // same-key pairs (O(Σ n_k²) candidate evaluations for keys whose rows
    // span the corpus' time range, e.g. a user active for a month joined
    // WITHIN ±2 min — measured 100k × ~67 ≈ 6.7M pair evals in ONE task
    // at sf0.1 because the planner picks BroadcastHashJoin over the
    // 1-split local scan). Adding the time bucket to the equi key bounds
    // candidates to the ±1-bucket neighborhood; the full condition (exact
    // range included) stays as the residual, so results are identical.
    // The probe (non-exploded) side is additionally hash-repartitioned by
    // its bucket when batch: locally that parallelizes the 1-split probe
    // scan; at scale the bucket is a SUBSET of the sort-merge join's
    // clustering keys, so EnsureRequirements reuses this exchange instead
    // of adding a second one. FULL outer falls back to the plain join
    // inside bandedIntervalJoin (both sides would need the 3-way explode,
    // duplicating unmatched rows).
    def timeJoin(l: DataFrame, r: DataFrame, full: Column): DataFrame =
      j.within match {
        case Some(iv) =>
          val lts = eventTs(ldf, refAlias(j.l))
          val rts = eventTs(rdf, refAlias(j.r))
          val w = withinMicros(iv)
          def spreadB(df: DataFrame, b: Column) =
            if (df.isStreaming) df
            else df.repartition(df.sparkSession.sparkContext.defaultParallelism, b)
          val (l2, r2) = j.joinType match {
            case "right" => (l, spreadB(r, floor(unix_micros(rts) / lit(w))))
            case "full" => (l, r) // not bandable; plain join below
            case _ => (spreadB(l, floor(unix_micros(lts) / lit(w))), r)
          }
          graft.streaming.StreamOps.bandedIntervalJoin(
            l2, r2, lts, rts, w, full, j.joinType)
        case None => l.join(r, full, j.joinType)
      }
    j.cond match {
      case CrossC =>
        // A WITHIN cross join has NO equi key, so Spark plans a
        // BroadcastNestedLoopJoin in batch — O(|L|·|R|) row comparisons,
        // found dominating the sf1 sidecar at 10× rows (r14:
        // q_sql_join_cross ran 20+ min in ONE task) — and in streaming a
        // keyless StreamingSymmetricHashJoin whose state all hashes to ONE
        // partition (empty key), a single-executor bottleneck at scale.
        // Band it like every other interval join in the engine
        // (StreamOps.intervalJoin / AsofJoin.bucketed convention): bucket
        // both event times by the interval width, explode the right row
        // into its 3 candidate buckets, equi-join on the bucket, and keep
        // the EXACT range as the residual filter — a shuffled hash join
        // (batch) / a bucket-keyed symmetric hash join (streaming, state
        // spread across partitions and still watermark-evicted through the
        // residual range on both event-time columns; r14 VERDICT #4).
        // Output linear in true matches either way. Calendar units take
        // their maximum length as the bucket width (31-day months, 366-day
        // years): wider buckets stay correct (the exact range still
        // filters), just less selective.
        val banded: DataFrame = j.within match {
          case Some(iv) =>
            graft.streaming.StreamOps.bandedKeylessJoin(ldf, rdf,
              eventTs(ldf, refAlias(j.l)), eventTs(rdf, refAlias(j.r)),
              withinMicros(iv), range)
          case _ => ldf.join(rdf, range, "inner")
        }
        qualifyCollisions(banded, j, ldf, rdf)
      case On(e) =>
        // type-check the join condition against both sides' schemas
        // (bare + alias-qualified names), with declared dialect types
        // (TIME/JSONB carried as strings) layered on top as in plan()
        val lenv = TypeCheck.envOf(ldf) ++ dialectTypes(j.l, declared)
        val renv = TypeCheck.envOf(rdf) ++ dialectTypes(j.r, declared)
        val env: TypeCheck.Env = lenv ++ renv ++
          lenv.map { case (k, v) => s"${refAlias(j.l).toLowerCase}.$k" -> v } ++
          renv.map { case (k, v) => s"${refAlias(j.r).toLowerCase}.$k" -> v }
        TypeCheck.check(e, env)
        qualifyCollisions(timeJoin(ldf, rdf, range && column(e, resolve, env)),
          j, ldf, rdf)
      case Using(cols0) => usingJoin(ldf, rdf, j, range, cols0, timeJoin)
      case Natural =>
        // event-time columns are transport infrastructure, not natural
        // keys — excluded when PRESENT. (r13 fuzz find: this previously
        // called tsCol, which THROWS on a relation with no _ts/ts, so
        // NATURAL JOIN between ts-less batch subqueries failed outright.)
        val tsNames = Seq(ldf, rdf)
          .flatMap(d => Seq("_ts", "ts").filter(d.columns.contains)).toSet
        val shared = ldf.columns.toSet.intersect(rdf.columns.toSet) -- tsNames
        require(shared.nonEmpty, "NATURAL JOIN with no shared columns")
        usingJoin(ldf, rdf, j, range, shared.toSeq.sorted, timeJoin)
    }
  }

  /** ASOF [LEFT] JOIN (extension; DuckDB-compatible syntax): for each left
    * row, the single most recent right row with equal keys at-or-before the
    * left row's timestamp. Plans through [[graft.operators.AsofJoin.backward]]
    * — the union-trick single-shuffle shape: no range self-join, no row
    * explosion, sort groups bounded per key. The inner form drops unmatched
    * left rows via a constant marker payload; colliding right column names
    * take the reference's `stream.field` output naming, like the equi-join
    * path. Right-side key columns are not in the output (they equal the
    * left keys on every matched row). */
  private def planAsofJoin(j: TRJoin, lookup: Lookup,
                           declared: DeclaredTypes): DataFrame = {
    def bad(msg: String): Nothing = throw new IllegalArgumentException(msg)
    val left = planFrom(j.l, lookup, declared)
    val right = planFrom(j.r, lookup, declared)
    require(left.window.isEmpty && right.window.isEmpty,
      "joining time-windowed streams is not supported (Codegen/V1.hs:295-300)")
    val (ldf, rdf) = (left.df, right.df)
    require(!ldf.isStreaming && !rdf.isStreaming,
      "ASOF JOIN is batch/pull only — for a live stream use the as-of " +
        "enrichment (StreamOps.asofEnrich)")
    require(!ldf.columns.exists(_.contains(".")),
      "ASOF JOIN over a left side with collision-renamed columns is not " +
        "supported — project/alias them in a FROM-subquery first")
    val e = j.cond match {
      case On(x) => x
      case _ => bad("ASOF JOIN requires an ON condition")
    }
    val la = refAlias(j.l); val ra = refAlias(j.r)
    val lenv = TypeCheck.envOf(ldf) ++ dialectTypes(j.l, declared)
    val renv = TypeCheck.envOf(rdf) ++ dialectTypes(j.r, declared)
    val env: TypeCheck.Env = lenv ++ renv ++
      lenv.map { case (k, v) => s"${la.toLowerCase}.$k" -> v } ++
      renv.map { case (k, v) => s"${ra.toLowerCase}.$k" -> v }
    TypeCheck.check(e, env)

    // resolve a ColRef to a concrete column name of one side
    def nameOn(df: DataFrame, alias: String, c: ColRef): Option[String] = c match {
      case ColRef(Some(q), n) if q.equalsIgnoreCase(alias) =>
        df.columns.find(_.equalsIgnoreCase(n))
      case ColRef(Some(_), _) => None
      case ColRef(None, n) => df.columns.find(_.equalsIgnoreCase(n))
    }
    val eqsB = Vector.newBuilder[(String, String)]
    // direction: (left_ts, right_ts, forward?) — `l >= r` (or `r <= l`)
    // is the backward pick (latest at-or-before), `l <= r` (or `r >= l`)
    // the FORWARD pick (earliest at-or-after, DuckDB's other ASOF form)
    var ineq: Option[(String, String, Boolean)] = None
    def addIneq(aRef: ColRef, bRef: ColRef, fwdIfLeftFirst: Boolean): Unit = {
      if (ineq.nonEmpty) bad("ASOF JOIN takes exactly one timestamp inequality")
      (nameOn(ldf, la, aRef), nameOn(rdf, ra, bRef)) match {
        case (Some(lt), Some(rt)) => ineq = Some((lt, rt, fwdIfLeftFirst))
        case _ => (nameOn(ldf, la, bRef), nameOn(rdf, ra, aRef)) match {
          case (Some(lt), Some(rt)) => ineq = Some((lt, rt, !fwdIfLeftFirst))
          case _ => bad("ASOF JOIN inequality must compare a left timestamp " +
            s"with a right timestamp, got $aRef vs $bRef")
        }
      }
    }
    conjunctsOf(e).foreach {
      case Bin("=", a: ColRef, b: ColRef) =>
        (nameOn(ldf, la, a), nameOn(rdf, ra, b)) match {
          case (Some(lc), Some(rc)) => eqsB += ((lc, rc))
          case _ => (nameOn(ldf, la, b), nameOn(rdf, ra, a)) match {
            case (Some(lc), Some(rc)) => eqsB += ((lc, rc))
            case _ => bad("ASOF JOIN equality must pair a left column " +
              s"with a right column, got $a = $b")
          }
        }
      case Bin(">=", a: ColRef, b: ColRef) => addIneq(a, b, fwdIfLeftFirst = false)
      case Bin("<=", a: ColRef, b: ColRef) => addIneq(a, b, fwdIfLeftFirst = true)
      case other => bad("ASOF JOIN ON must be column equalities plus one " +
        s"'left_ts >= right_ts' (backward) or 'left_ts <= right_ts' " +
        s"(forward) inequality, got $other")
    }
    val keys = eqsB.result()
    val (lts, rts0, fwd) = ineq.getOrElse(
      bad("ASOF JOIN requires a timestamp inequality " +
        "(left_ts >= right_ts for backward, left_ts <= right_ts for forward)"))
    if (keys.isEmpty) bad("ASOF JOIN requires at least one equality key")

    // SQL null semantics: a right row with a NULL key or NULL timestamp can
    // never match; filter them out BEFORE the shuffle (the union-trick
    // window would otherwise group/order NULLs together and match them)
    val rFiltered = (keys.map(_._2) :+ rts0)
      .foldLeft(rdf)((d, c) => d.filter(col(c).isNotNull))
    // colliding names: rename dot-free for the operator, restore the
    // reference's `stream.field` naming after the join
    val collisions = ldf.columns.toSet.intersect(rdf.columns.toSet)
    val renamedR = collisions.foldLeft(rFiltered)(
      (d, c) => d.withColumnRenamed(c, s"__graft_r_$c"))
    def rn(c: String): String = if (collisions.contains(c)) s"__graft_r_$c" else c
    val rts = rn(rts0)
    val rKeys = keys.map(k => rn(k._2))
    val marker = "__graft_asof_m" // never-null payload → matched-row flag
    val withMarker = renamedR.withColumn(marker, lit(1))
    val payload = withMarker.columns.toSeq.filterNot(rKeys.contains)
    // multiple equality keys combine into one hidden struct key per side
    val (l2, r2, lk, rk) =
      if (keys.size == 1) (ldf, withMarker, keys.head._1, rKeys.head)
      else {
        // positional field names: the union-trick unions by NAME, so both
        // sides' struct keys must agree field-for-field
        val kk = "__graft_asof_k"
        (ldf.withColumn(kk,
          struct(keys.zipWithIndex.map { case ((lc, _), i) => col(lc).as(s"_$i") }: _*)),
          withMarker.withColumn(kk,
            struct(rKeys.zipWithIndex.map { case (rc, i) => col(rc).as(s"_$i") }: _*)),
          kk, kk)
      }
    val joined =
      if (fwd) graft.operators.AsofJoin.forward(l2, r2, lk, rk, lts, rts, payload)
      else graft.operators.AsofJoin.backward(l2, r2, lk, rk, lts, rts, payload)
    val unkeyed = if (keys.size == 1) joined else joined.drop("__graft_asof_k")
    val matched =
      if (j.joinType == "asof") unkeyed.filter(col(marker).isNotNull) else unkeyed
    collisions.foldLeft(matched.drop(marker))(
      (d, c) => d.withColumnRenamed(s"__graft_r_$c", s"$ra.$c"))
  }

  /** After an ON/CROSS join, colliding field names become `stream.field` in
    * the output — the reference's sink naming rule (flowObjectToJsonObject,
    * Rts/Old.hs:200-209: qualify only when names collide). Qualified refs
    * in later clauses resolve to these renamed columns (see resolve). */
  private def qualifyCollisions(joined: DataFrame, j: TRJoin,
                                ldf: DataFrame, rdf: DataFrame): DataFrame = {
    val ra = refAlias(j.r)
    val collisions = ldf.columns.toSet.intersect(rdf.columns.toSet)
    if (collisions.isEmpty) joined
    else {
      // A chained left side can contribute a colliding plain column that
      // belongs to an INNER leaf (a(k) JOIN b(k,w) JOIN c(w): the plain w
      // is b's) — qualify with the leaf alias that actually resolves it,
      // not blindly the leftmost. At most one left leaf can own a plain
      // column (two owners would have collided and been renamed earlier).
      val leftLeaves = leafAliases(j.l)
      def leftOwner(c: String): String =
        leftLeaves.find(q => scala.util.Try(ldf(s"$q.$c")).isSuccess)
          .getOrElse(leftLeaves.head)
      val cols = joined.columns.zipWithIndex.map { case (c, i) =>
        // backtick-quote pass-through names: a deeper chain's left side
        // already holds literal `x.y` columns a bare joined(c) would
        // misparse as qualifier x + field y
        if (!collisions.contains(c)) joined(s"`$c`")
        else {
          // left copy comes first in join output column order
          val qualifier = if (i < ldf.columns.length) leftOwner(c) else ra
          col(s"$qualifier.$c").as(s"$qualifier.$c")
        }
      }
      joined.select(cols.toIndexedSeq: _*)
    }
  }

  /** Leaf (non-join) aliases of a table ref, left to right. */
  private def leafAliases(r: TableRef): Seq[String] = r match {
    case TRJoin(l, rr, _, _, _) => leafAliases(l) ++ leafAliases(rr)
    case other => Seq(refAlias(other))
  }

  /** USING/NATURAL join keeping ONE copy of each key column: the right
    * side's keys are renamed pre-join (avoiding ambiguity even on
    * self-joins), then dropped — for RIGHT/FULL the surviving key is
    * coalesced left-then-right. Non-key same-named columns stay duplicated
    * behind their stream qualifiers, mirroring the reference's
    * "stream.field" output keys on collision (Rts/Old.hs:200-209). */
  private def usingJoin(ldf: DataFrame, rdf: DataFrame, j: TRJoin,
                        range: Column, keys: Seq[String],
                        joinFn: (DataFrame, DataFrame, Column) => DataFrame)
      : DataFrame = {
    val la = refAlias(j.l); val ra = refAlias(j.r)
    val renamed = keys.foldLeft(rdf.as(s"__pre_$ra"))(
      (d, k) => d.withColumnRenamed(k, s"__graft_r_$k")).alias(ra)
    val eq = keys.map(k => col(s"$la.$k") === col(s"$ra.__graft_r_$k")).reduce(_ && _)
    // joinFn = planJoin's timeJoin: plain when no WITHIN, banded otherwise
    val joined = joinFn(ldf, renamed, range && eq)
    val merged =
      if (j.joinType == "right" || j.joinType == "full")
        keys.foldLeft(joined)((d, k) =>
          d.withColumn(k, coalesce(col(s"$la.$k"), col(s"$ra.__graft_r_$k"))))
      else joined
    keys.foldLeft(merged)((d, k) => d.drop(s"__graft_r_$k"))
  }

  /** AST-level output types a Spark schema cannot carry (TIME and JSONB
    * render as string columns): declared CREATE STREAM types for named
    * streams, inferred statically from SELECT items for subqueries — so
    * the dialect type survives an alias boundary. Inference runs with the
    * inner relation's own dialect overrides only (no Spark schema), which
    * can only under-approximate — an unknown type never rejects. */
  private def dialectTypes(ref: TableRef, declared: DeclaredTypes): TypeCheck.Env =
    ref match {
      case TRSubquery(sel) => qTypes(sel, declared)
      case TRAlias(inner, a) =>
        val m = dialectTypes(inner, declared)
        m ++ m.map { case (k, v) => s"${a.toLowerCase}.$k" -> v }
      case TRWindowed(inner, _) => dialectTypes(inner, declared)
      case TRFlatten(inner, _, _) => dialectTypes(inner, declared)
      case TRJoin(l, r, _, _, _) =>
        dialectTypes(l, declared) ++ dialectTypes(r, declared)
      case TRRecursive(_, base, _, _) => qTypes(base, declared) // base names win
      case TRStream(n) => declared(n)
    }

  /** Dialect types of a query body's output: a set op takes the LEFT
    * operand's names (standard SQL), so its types come from the left. */
  private def qTypes(q: Query, declared: DeclaredTypes): TypeCheck.Env = q match {
    case s: Select => selTypes(s, declared)
    case SetOp(_, _, l, _, _, _, _, _) => qTypes(l, declared)
  }

  private def selTypes(sel: Select, declared: DeclaredTypes): TypeCheck.Env = {
    val inner = dialectTypes(sel.from, declared)
    sel.items.flatMap {
      case ItemExpr(e, alias) =>
        val name = alias.getOrElse(exprName(e)).toLowerCase
        // only record types Spark's schema would mis-describe
        TypeCheck.infer(e, inner)
          .filter(t => t == TTime || t == TJson).map(name -> _)
      // wildcards pass the inner relation's dialect types through unchanged
      case ItemWildcard(_, ex, rep) => inner.filterNot(_._1.contains('.'))
        // EXCLUDE drops the column; REPLACE changes its value, so the
        // inner relation's TIME/JSON tag no longer applies (unknown
        // types never reject — conservative)
        .filterNot { case (k, _) =>
          ex.exists(_.equalsIgnoreCase(k)) ||
            rep.exists(_._2.equalsIgnoreCase(k)) }
    }.toMap
  }

  private def refAlias(r: TableRef): String = r match {
    case TRStream(n) => n
    case TRAlias(_, a) => a
    case TRRecursive(n, _, _, _) => n
    case TRWindowed(i, _) => refAlias(i)
    case TRFlatten(i, _, _) => refAlias(i)
    case j: TRJoin => refAlias(j.l)
    case _: TRSubquery =>
      throw new IllegalArgumentException("subquery in a join needs an AS alias")
  }

  // ---- SELECT planning (the decouple pipeline) -----------------------------

  /** Plan a SELECT. `grace` is the watermark used for windowed aggregation
    * over streaming sources (the reference's 24 h, TimeWindows.hs:39). */
  /** Dialect-declared column types of a named stream (CREATE STREAM
    * schema) that a Spark schema cannot carry — TIME and JSONB both render
    * as string columns. Engines that track declared schemas pass their
    * registry here so TypeCheck sees the dialect type. */
  type DeclaredTypes = String => TypeCheck.Env

  /** Plan a query body: a single SELECT, or a set-operation tree (dialect
    * extension, SURVEY §2.7 — the reference's V1 codegen throws on its own
    * Union node, Codegen/V1.hs:457-460; V2 implements union). Column
    * matching is positional with the left operand's names (standard SQL);
    * Spark's union/intersect/exceptAll plan as hash-partitioned
    * aggregates/joins on the row value — shuffle-safe at scale. */
  def plan(q: Query, lookup: Lookup, grace: String = "24 hours",
           declared: DeclaredTypes = _ => Map.empty): DataFrame = q match {
    case s: Select => planSelect(s, lookup, grace, declared)
    case SetOp(op, all, l, r, ob, lim, _, off) =>
      val ld = plan(l, lookup, grace, declared)
      val rd = plan(r, lookup, grace, declared)
      require(ld.columns.length == rd.columns.length,
        s"set operation operands must have the same number of columns " +
          s"(${ld.columns.length} vs ${rd.columns.length})")
      val combined = (op, all) match {
        case ("union", true) => ld.union(rd)
        case ("union", false) => ld.union(rd).distinct()
        case ("intersect", true) => ld.intersectAll(rd)
        case ("intersect", false) => ld.intersect(rd)
        case ("except", true) => ld.exceptAll(rd)
        case ("except", false) => ld.except(rd)
        case other => throw new IllegalArgumentException(s"bad set op: $other")
      }
      // ORDER BY over a set op resolves against the combined relation's
      // (= left operand's) output columns
      val env: TypeCheck.Env = TypeCheck.envOf(combined)
      ob.foreach(o => TypeCheck.check(o.e, env))
      def resolve(c: ColRef): Column = c match {
        case ColRef(None, n) => col(n)
        case ColRef(Some(q0), n) => col(s"$q0.$n")
      }
      val sorted =
        if (ob.isEmpty) combined
        else combined.orderBy(ob.map(o =>
          sortCol(column(o.e, resolve, env), o)): _*)
      lim.foldLeft(off.foldLeft(sorted)((d, m) => d.offset(m.toInt)))(
        (d, n) => d.limit(n.toInt))
  }

  private def planSelect(sel00: Select, lookup: Lookup, grace: String,
                         declared: DeclaredTypes): DataFrame = {
    // The dialect has NO lateral column aliases (SELECT a+1 AS x, x*2 —
    // refs resolve against the base relation only; QUALIFY's alias
    // substitution happens at parse level), but Spark's implicit LCA
    // resolution still fires on generated projections whose output
    // aliases shadow base columns, and it cannot resolve a window
    // expression inside a higher-order-function lambda (the r13
    // collected-frame EXCLUDE identity): UNSUPPORTED_FEATURE.
    // LATERAL_COLUMN_ALIAS_IN_WINDOW on plans that are perfectly
    // resolvable against the child. Dataset construction analyzes
    // EAGERLY, so disabling implicit LCA for the duration of plan
    // construction fixes the whole class without leaking the setting
    // into the user's session.
    val lcaSession = org.apache.spark.sql.SparkSession.active
    val lcaKey = "spark.sql.lateralColumnAlias.enableImplicitResolution"
    val lcaPrev = lcaSession.conf.getOption(lcaKey)
    lcaSession.conf.set(lcaKey, "false")
    try {
      planSelectLcaFree(sel00, lookup, grace, declared)
    } finally lcaPrev match {
      case Some(v) => lcaSession.conf.set(lcaKey, v)
      case None => lcaSession.conf.unset(lcaKey)
    }
  }

  private def planSelectLcaFree(sel00: Select, lookup: Lookup, grace: String,
                                declared: DeclaredTypes): DataFrame = {
    val src = planFrom(sel00.from, lookup, declared)
    // scalar subqueries (extension) rewrite to broadcast 1-row cross-join
    // columns BEFORE anything else, so every later clause sees a plain
    // column ref and the value itself never leaves the distributed plan
    val (sel, base0, scalarsAttached) =
      attachScalarSubs(sel00, src.df, lookup, grace, declared)

    // Schema-aware type validation (the type-compatibility rules of
    // Validate.hs, now with the resolved relation's schema in hand — see
    // TypeCheck). Dialect-level types a Spark schema can't carry (TIME
    // renders as a string column) are layered on top, so e.g. a TIME value
    // flowing through a subquery alias keeps wraparound arithmetic.
    val env: TypeCheck.Env = TypeCheck.envOf(base0) ++ dialectTypes(sel.from, declared)
    sel.where.foreach(TypeCheck.check(_, env))
    sel.items.foreach {
      case ItemExpr(e, _) => TypeCheck.check(e, env)
      case ItemWildcard(_, _, rep) =>
        rep.foreach { case (e, _) => TypeCheck.check(e, env) }
    }
    sel.having.foreach(TypeCheck.check(_, env))
    sel.orderBy.foreach(o => TypeCheck.check(o.e, env))

    def resolve(c: ColRef): Column = c match {
      // collision-renamed join outputs carry the literal name "q.n"
      case ColRef(Some(q), n) if base0.columns.contains(s"$q.$n") =>
        col(s"`$q.$n`")
      case ColRef(Some(q), n) => col(s"$q.$n")
      case ColRef(None, n) => col(n)
    }

    // Static-type probe for plans that must know an argument's RUNTIME
    // Spark type (today: the decimal accumulator of the collected-frame
    // EXCLUDE fold — winFnCol). Resolves the column against the given
    // relation at analysis time; no job runs. None on any failure →
    // callers keep their type-agnostic plan.
    def probeOn(d: DataFrame): Column => Option[SparkDT] =
      c => scala.util.Try(d.select(c).schema.head.dataType).toOption

    // WHERE → Filter (Planner.hs:343-345). Top-level AND conjuncts that
    // are IN/EXISTS subquery predicates (extension) peel off into semi/
    // anti joins; the remaining conjuncts filter first, so pushdown-able
    // predicates reach the scan below the joins.
    val whereConjs = sel.where.toSeq.flatMap(conjunctsOf)
    val (subPreds, plainPreds) = whereConjs.partition(isSubqueryPred)
    plainPreds.filter(containsJoinSub).foreach { p =>
      throw new IllegalArgumentException(
        "IN (SELECT …) / EXISTS (…) must be top-level AND conjuncts of " +
          s"the WHERE clause — found one nested inside: $p")
    }
    val plainFiltered =
      plainPreds.foldLeft(base0)((d, p) => d.filter(column(p, resolve, env)))
    val filtered = subPreds.zipWithIndex.foldLeft(plainFiltered) {
      case (d, (p, i)) =>
        applySubqueryPred(d, p, i, resolve, env, lookup, grace, declared)
    }

    // aggregates from SELECT + HAVING (Planner.hs:390-432) + ORDER BY
    // (extension: `ORDER BY SUM(x)` with the agg absent from the SELECT
    // list is standard SQL; its agg must join the Reduce like HAVING's)
    val itemAggs = sel.items.flatMap { case ItemExpr(e, _) => collectAggs(e); case _ => Nil }
    val aggs = (itemAggs ++ sel.having.toSeq.flatMap(collectAggs) ++
      sel.orderBy.flatMap(o => collectAggs(o.e))).distinct

    if (aggs.isEmpty && sel.groupBy.isEmpty && src.window.isEmpty &&
        !sel.multiLevel) {
      // GROUPS frames (extension): Spark has no GROUPS mode — but a
      // GROUPS frame is BY DEFINITION a RANGE frame over the peer-group
      // ordinal, dense_rank() over the same (PARTITION BY, ORDER BY). So
      // the ordinal materializes as a hidden column and each GROUPS
      // window rewrites to RANGE over it (ascending — dense_rank is
      // order-preserving, and CURRENT ROW then spans the full tie class,
      // exactly the GROUPS peer semantics).
      def itemExprs(items: Seq[SelectItem]): Seq[Expr] = items.flatMap {
        case ItemExpr(e, _) => Seq(e)
        case ItemWildcard(_, _, rep) => rep.map(_._1) // REPLACE exprs too
      }
      val grpSpecs = (itemExprs(sel.items) ++
        sel.orderBy.map(_.e) ++ sel.qualify.toSeq)
        .flatMap(collectWins).filter(_.groupsFrame)
        .map(w => (w.partitionBy, w.orderBy)).distinct
      val grpNames = grpSpecs.zipWithIndex
        .map { case (sp, i) => sp -> s"__graft_grp$i" }.toMap
      val filteredG = grpSpecs.foldLeft(filtered)((d, sp) =>
        d.withColumn(grpNames(sp),
          column(WinFn("DENSE_RANK", Nil, sp._1, sp._2), resolve, env)))
      def subGroups(e: Expr): Expr = rewriteExpr(e) {
        case w: WinFn if w.groupsFrame =>
          w.copy(orderBy = Seq(OrderItem(
            ColRef(None, grpNames((w.partitionBy, w.orderBy))), desc = false)),
            rangeFrame = true, groupsFrame = false)
      }
      val selG = if (grpSpecs.isEmpty) sel else sel.copy(
        items = sel.items.map {
          case ItemExpr(e, a) =>
            ItemExpr(subGroups(e), Some(a.getOrElse(exprName(e))))
          case w @ ItemWildcard(_, _, rep) =>
            w.copy(replace = rep.map { case (e, n) => (subGroups(e), n) })
        },
        orderBy = sel.orderBy.map(o => o.copy(e = subGroups(o.e))),
        qualify = sel.qualify.map(subGroups))

      // QUALIFY (extension): standard/DuckDB order is windows FIRST over
      // the whole post-WHERE relation, THEN the qualify filter. So every
      // window expression anywhere in the query (the predicate itself,
      // the select list, ORDER BY) materializes as a hidden column on
      // `filtered` BEFORE the filter, and the later clauses project from
      // those columns — a select-list SUM(...) OVER beside a QUALIFY rank
      // filter aggregates ALL rows, and `QUALIFY rk = 2` sees rk computed
      // over the unfiltered partition. Select aliases substitute into the
      // predicate (DuckDB-compatible) when the base relation has no
      // column of that name.
      val (qualified, selQ, winsAttached) = selG.qualify match {
        case None => (filteredG, selG, grpSpecs.nonEmpty)
        case Some(q0) =>
          val aliasExprs: Map[String, Expr] = selG.items.collect {
            case ItemExpr(e, Some(a)) => a.toLowerCase -> e }.toMap
          def hasBase(n: String): Boolean =
            filtered.columns.exists(_.equalsIgnoreCase(n))
          val qSub = rewriteExpr(q0) {
            case ColRef(None, n)
                if !hasBase(n) && aliasExprs.contains(n.toLowerCase) =>
              aliasExprs(n.toLowerCase)
          }
          val wins: Seq[WinFn] =
            (qSub +: (itemExprs(selG.items) ++
              selG.orderBy.map(_.e))).flatMap(collectWins).distinct
          val winNames: Map[WinFn, String] =
            wins.zipWithIndex.map { case (w, i) => w -> s"__graft_win$i" }.toMap
          def subWins(e: Expr): Expr = rewriteExpr(e) {
            case w: WinFn if winNames.contains(w) => ColRef(None, winNames(w))
          }
          val withWins = wins.foldLeft(filteredG)((d, w) =>
            d.withColumn(winNames(w), column(w, resolve, env, probeOn(d))))
          val flt = withWins
            .withColumn("__graft_qual", column(subWins(qSub), resolve, env))
            .filter(col("__graft_qual")).drop("__graft_qual")
          // rewrite the later clauses to read the pre-filter columns;
          // pin each item's output name to the ORIGINAL expression's
          // (substitution must not rename `rn() over` → `__graft_win0`)
          val items2 = selG.items.map {
            case ItemExpr(e, alias) =>
              ItemExpr(subWins(e), Some(alias.getOrElse(exprName(e))))
            case w @ ItemWildcard(_, _, rep) =>
              w.copy(replace = rep.map { case (e, n) => (subWins(e), n) })
          }
          val ob2 = selG.orderBy.map(o => o.copy(e = subWins(o.e)))
          (flt, selG.copy(items = items2, orderBy = ob2, qualify = None),
            wins.nonEmpty || grpSpecs.nonEmpty)
      }
      // DISTINCT ON (extension): first row per key group in ORDER BY
      // order, picked pre-projection so order keys may use base columns.
      // rank<=1 over (keys | ORDER BY) is the one shape Spark's
      // InferWindowGroupLimit rewrites to a partial+final per-group
      // top-1 — a map-side bounded pick, not a per-group sort.
      val donBase = if (selQ.distinctOn.isEmpty) qualified else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(selQ.distinctOn.map(resolve): _*)
          .orderBy(selQ.orderBy.map(o =>
            sortCol(column(o.e, resolve, env), o)): _*)
        qualified.withColumn("__graft_don", row_number().over(w))
          .filter(col("__graft_don") === 1).drop("__graft_don")
      }
      // plain Filter/Project pipeline. With scalar-subquery columns
      // attached, `*` expands to the ORIGINAL relation's columns so the
      // hidden __graft_scalar* (and __graft_win*) helpers never leak into
      // the output. EXCLUDE drops listed columns, REPLACE substitutes a
      // column's value in place (name/position preserved) — DuckDB star
      // modifiers; both verified against the base column set so a typo is
      // a vocabulary rejection, not a silent no-op.
      def expandStar(baseCols: Seq[String], ex: Seq[String],
                     rep: Seq[(Expr, String)]): Seq[Column] = {
        (ex ++ rep.map(_._2)).foreach { c =>
          if (!baseCols.exists(_.equalsIgnoreCase(c)))
            throw new IllegalArgumentException(
              s"* EXCLUDE/REPLACE references unknown column '$c' " +
                s"(available: ${baseCols.mkString(", ")})")
        }
        rep.map(_._2).foreach { c =>
          if (ex.exists(_.equalsIgnoreCase(c)))
            throw new IllegalArgumentException(
              s"column '$c' cannot appear in both EXCLUDE and REPLACE")
        }
        rep.map(_._2.toLowerCase).groupBy(identity).foreach { case (c, v) =>
          if (v.length > 1) throw new IllegalArgumentException(
            s"column '$c' appears more than once in REPLACE")
        }
        val repMap = rep.map { case (e, n) => n.toLowerCase -> e }.toMap
        baseCols.filterNot(c => ex.exists(_.equalsIgnoreCase(c))).map { c =>
          repMap.get(c.toLowerCase) match {
            case Some(e) => column(e, resolve, env, probeOn(donBase)).as(c)
            case None => col(s"`$c`")
          }
        }
      }
      val cols = selQ.items.flatMap {
        case ItemWildcard(None, ex, rep) =>
          val baseCols =
            if (scalarsAttached) src.df.columns.toSeq
            else if (winsAttached) filtered.columns.toSeq
            else donBase.columns.toSeq
          if (ex.isEmpty && rep.isEmpty && !scalarsAttached && !winsAttached)
            Seq(col("*"))
          else expandStar(baseCols, ex, rep)
        case ItemWildcard(Some(q), Nil, Nil) => Seq(col(s"$q.*"))
        case ItemWildcard(Some(q), _, _) =>
          throw new IllegalArgumentException(
            s"$q.* does not take EXCLUDE/REPLACE — apply them to a bare *")
        case ItemExpr(e, alias) =>
          Seq(column(e, resolve, env, probeOn(donBase))
            .as(alias.getOrElse(exprName(e))))
      }
      finishSelect(donBase, cols, Nil, selQ,
        e => column(e, resolve, env, probeOn(donBase)))
    } else {
      // Validate rejects these with full dialect explanations; backstop
      // for direct Translate callers
      require(sel.qualify.isEmpty && !sel.distinct && sel.distinctOn.isEmpty,
        "QUALIFY / SELECT DISTINCT / DISTINCT ON do not combine with " +
          "aggregation")
      // Reduce (Codegen/V1.hs:382-456)
      // GROUP BY on a column the relation doesn't have: reject with the
      // dialect's vocabulary, not a deep Catalyst resolution error. Match
      // with the resolver's case rules (spark.sql.caseSensitive, default
      // false) so a query accepted in SELECT/WHERE isn't rejected here.
      val caseSensitive = base0.sparkSession.conf
        .get("spark.sql.caseSensitive", "false").toBoolean
      def hasColumn(n: String): Boolean =
        if (caseSensitive) base0.columns.contains(n)
        else base0.columns.exists(_.equalsIgnoreCase(n))
      sel.groupBy.foreach {
        case ColRef(None, n) if !hasColumn(n) =>
          throw new IllegalArgumentException(
            s"GROUP BY references unknown column '$n' " +
              s"(available: ${base0.columns.mkString(", ")})")
        case _ => () // qualified refs resolve through alias scopes
      }
      val aggNames = aggs.zipWithIndex.map { case (a, i) => a -> s"_agg$i" }.toMap
      val aggCols = aggs.map(a => aggColumn(a, resolve).as(aggNames(a)))
      // Bare refs stay UNALIASED: `.as` is a naming no-op for them, but
      // the Alias node would defeat Spark's semantic match between
      // GROUPING(col) and its grouping column (GROUPING_COLUMN_MISMATCH).
      // Qualified refs keep the alias (output-name normalization);
      // GROUPING over a qualified key is therefore unsupported.
      val keyCols = sel.groupBy.map(c =>
        if (c.stream.isEmpty) resolve(c) else resolve(c).as(c.name))

      val (windowCol, windowName) = src.window match {
        case Some(Tumble(i)) =>
          (Some(window(col(tsCol(base0)), intervalString(i))), "window")
        case Some(Hop(s, a)) =>
          (Some(window(col(tsCol(base0)), intervalString(s), intervalString(a))), "window")
        case Some(Session(g)) =>
          (Some(session_window(col(tsCol(base0)), intervalString(g))), "session_window")
        case None => (None, "")
      }
      val watermarked =
        if (src.window.isDefined && filtered.isStreaming)
          filtered.withWatermark(tsCol(base0), grace)
        else filtered
      // ROLLUP/CUBE/GROUPING SETS: one shuffle computes every grouping
      // level (Validate gates them to batch/pull; windows stay out)
      if (sel.multiLevel && src.window.isDefined)
        throw new IllegalArgumentException(
          "GROUP BY ROLLUP/CUBE/GROUPING SETS cannot combine with " +
            "TUMBLE/HOP/SESSION windows")
      val grouped = sel.groupMode match {
        case "rollup" => watermarked.rollup(keyCols: _*)
        case "cube" => watermarked.cube(keyCols: _*)
        case "sets" =>
          // UNALIASED on both sides: an Alias carries a fresh exprId, so
          // aliased set exprs would not match the grouping columns and
          // Spark would union them in as extra (always-null) group bits
          watermarked.groupingSets(
            sel.groupSets.map(_.map(resolve)), sel.groupBy.map(resolve): _*)
        case _ => watermarked.groupBy(windowCol.toSeq ++ keyCols: _*)
      }
      // aggregate-less GROUP BY (`SELECT k FROM t GROUP BY k`) is a
      // distinct-on-keys — a dummy count materializes the grouping
      val agged0 =
        if (aggCols.isEmpty)
          grouped.agg(count(lit(1)).as("__graft_dummy")).drop("__graft_dummy")
        else grouped.agg(aggCols.head, aggCols.tail: _*)
      // SQL standard: the empty grouping set `()` aggregates even an
      // EMPTY input into one grand-total row (DuckDB/Postgres emit it;
      // Spark's rollup/cube emit nothing there). Synthesize that row as
      // a GLOBAL aggregate over a LIMIT-0 copy of the input — by
      // construction the exact empty-set value of every aggregate —
      // with GROUPING/GROUPING_ID replaced by their all-aggregated
      // constants (they cannot be evaluated outside a grouping-sets
      // plan), and keep it ONLY when the input is empty via an
      // anti-join against a LIMIT-1 probe: non-empty inputs pay one
      // probed row + a 1-row broadcast anti-join, nothing at scale.
      val emptySetIncluded = sel.groupMode match {
        case "rollup" | "cube" => true
        case "sets" => sel.groupSets.exists(_.isEmpty)
        case _ => false
      }
      val agged =
        if (!sel.multiLevel || !emptySetIncluded || agged0.isStreaming)
          agged0
        else {
          val nKeys = sel.groupBy.size
          // synthetic positional aliases: an aggregate output alias may
          // COLLIDE with a grouping-key name (SELECT k, COUNT(*) AS k …
          // GROUP BY CUBE(k)) — binding by name would then be ambiguous
          // or silently wrong, so the whole synthesis binds by position
          val totalAggCols = aggs.zipWithIndex.map { case (a, i) =>
            (a match {
              case Agg("GROUPING", _, _, _) => lit(1L)
              case Agg("GROUPING_ID", _, _, _) => lit((1L << nKeys) - 1L)
              case a2 => aggColumn(a2, resolve)
            }).as(s"__graft_total$i")
          }
          val empty = watermarked.limit(0)
          val total0 =
            if (totalAggCols.isEmpty)
              empty.agg(count(lit(1)).as("__graft_dummy")).drop("__graft_dummy")
            else empty.agg(totalAggCols.head, totalAggCols.tail: _*)
          // agged0's schema = grouping keys (a known-width prefix) then
          // the aggregates in `aggs` order — rebuild it positionally
          val nPrefix = agged0.schema.length - aggs.length
          val total = total0.select(agged0.schema.zipWithIndex.map {
            case (f, i) =>
              (if (i < nPrefix) lit(null) else col(s"__graft_total${i - nPrefix}"))
                .cast(f.dataType).as(f.name)
          }.toIndexedSeq: _*)
          val probe = watermarked.select(lit(1).as("__graft_probe")).limit(1)
          // positional union (not unionByName): columns line up by
          // construction, and duplicate output names stay representable
          agged0.union(total.join(probe, lit(true), "left_anti"))
        }

      // HAVING over the aggregated relation (Planner.hs:380-382)
      def postResolve(c: ColRef): Column = col(c.name)
      val havinged = sel.having
        .map(h => agged.filter(column(rewriteAggs(h, aggNames), postResolve, env)))
        .getOrElse(agged)

      // final Project; window bounds appended (Codegen/V1.hs:422-425)
      val itemCols = sel.items.map {
        case ItemWildcard(_, Nil, Nil) => col("*")
        case _: ItemWildcard => throw new IllegalArgumentException(
          "* EXCLUDE/REPLACE does not combine with aggregation — project " +
            "in a FROM-subquery first")
        case ItemExpr(e, alias) =>
          column(rewriteAggs(e, aggNames), postResolve, env).as(alias.getOrElse(exprName(e)))
      }
      val windowBounds = windowCol.toSeq.flatMap(_ => Seq(
        col(s"$windowName.start").as("window_start"),
        col(s"$windowName.end").as("window_end")))
      finishSelect(havinged, itemCols ++ windowBounds,
        windowCol.toSeq.flatMap(_ => Seq("window_start", "window_end")), sel,
        e => column(rewriteAggs(e, aggNames), postResolve, env))
    }
  }

  /** Final projection plus the ORDER BY / LIMIT extension (SURVEY §2.7 —
    * no such production in the reference grammar; Validate restricts both
    * to batch/pull queries). ORDER BY keys resolve standard-SQL style: a
    * bare name that matches an output column binds to the PROJECTED value
    * (so aliases of computed columns sort correctly); anything else is
    * translated against the pre-projection relation and carried through as
    * a hidden column, dropped after the sort. `orderBy.limit(n)` plans as
    * TakeOrderedAndProject — a per-partition top-n plus a k-way driver
    * merge, never a full global sort, which is the 100 TB-safe shape. */
  private def finishSelect(pre: DataFrame, outCols: Seq[Column],
                           extraOutNames: Seq[String], sel: Select,
                           translate: Expr => Column): DataFrame = {
    // SELECT DISTINCT (extension): dedup AFTER projection (standard SQL —
    // DuckDB computes the select list, then DISTINCT over its results).
    // Validate restricts ORDER BY to output columns here, so the sort
    // never needs a hidden key that would re-introduce duplicates.
    def dedup(d: DataFrame): DataFrame = if (sel.distinct) d.distinct() else d
    def page(d: DataFrame): DataFrame =
      sel.limit.foldLeft(sel.offset.foldLeft(d)((x, m) => x.offset(m.toInt)))(
        (x, n) => x.limit(n.toInt))
    if (sel.orderBy.isEmpty)
      return page(dedup(pre.select(outCols: _*)))
    val outNames: Seq[String] = sel.items.flatMap {
      case ItemExpr(e, alias) => Seq(alias.getOrElse(exprName(e)))
      case ItemWildcard(None, ex, _) =>
        pre.columns.toSeq.filterNot(c => ex.exists(_.equalsIgnoreCase(c)))
      case ItemWildcard(Some(_), _, _) => Nil // qualified subset — hidden-column path
    } ++ extraOutNames
    val keys = sel.orderBy.zipWithIndex.map {
      case (o @ OrderItem(ColRef(None, n), _, _), _)
          if outNames.exists(_.equalsIgnoreCase(n)) =>
        (col(n), o, None)
      case (o, i) =>
        (col(s"__graft_ord$i"), o,
          Some(translate(o.e).as(s"__graft_ord$i")))
    }
    val hidden = keys.collect { case (_, _, Some(c)) => c }
    val sortCols = keys.map { case (c, o, _) => sortCol(c, o) }
    val sorted = dedup(pre.select(outCols ++ hidden: _*)).orderBy(sortCols: _*)
    // offset+limit BEFORE dropping the hidden keys, so the cut respects
    // the sort
    val limited = page(sorted)
    keys.collect { case (c, _, Some(_)) => c }
      .foldLeft(limited)((d, c) => d.drop(c))
  }

  // ---- expression subqueries (extension; the reference parses subqueries
  // but rejects them — AST.hs:593, scalar forms commented out AST.hs:339).
  // Batch/pull only (Validate). Planning is Spark-first: IN → left-semi /
  // null-aware left-anti join, EXISTS → semi/anti join with correlated
  // conjuncts as the join condition, scalar → broadcast 1-row cross-join.

  /** Top-level AND conjuncts of a predicate. */
  private def conjunctsOf(e: Expr): Seq[Expr] = e match {
    case Bin("AND", l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case other => Seq(other)
  }

  /** A conjunct this planner turns into a semi/anti join. */
  private def isSubqueryPred(e: Expr): Boolean = e match {
    case _: InSub | _: ExistsSub => true
    case Not(x) => isSubqueryPred(x)
    case _ => false
  }

  private def containsJoinSub(e: Expr): Boolean = e match {
    case _: InSub | _: ExistsSub => true
    case Bin(_, l, r) => containsJoinSub(l) || containsJoinSub(r)
    case Not(x) => containsJoinSub(x)
    case Fn(_, args) => args.exists(containsJoinSub)
    case Cast(x, _) => containsJoinSub(x)
    case Between(x, lo, hi, _, _) => Seq(x, lo, hi).exists(containsJoinSub)
    case ArrIndex(x, _) => containsJoinSub(x)
    case ArrSlice(x, _, _) => containsJoinSub(x)
    case ArrLit(items) => items.exists(containsJoinSub)
    case InList(x, items, _) => (x +: items).exists(containsJoinSub)
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .exists(containsJoinSub)
    case _ => false
  }

  private def colRefsOf(e: Expr): Seq[ColRef] = e match {
    case c: ColRef => Seq(c)
    case Bin(_, l, r) => colRefsOf(l) ++ colRefsOf(r)
    case Not(x) => colRefsOf(x)
    case Fn(_, args) => args.flatMap(colRefsOf)
    case Agg(_, args, _, _) => args.flatMap(colRefsOf)
    case OrdKey(x, _, _) => colRefsOf(x)
    case Kept(c, v) => colRefsOf(c) ++ colRefsOf(v)
    case Cast(x, _) => colRefsOf(x)
    case Between(x, lo, hi, _, _) => Seq(x, lo, hi).flatMap(colRefsOf)
    case ArrIndex(x, _) => colRefsOf(x)
    case ArrSlice(x, _, _) => colRefsOf(x)
    case ArrLit(items) => items.flatMap(colRefsOf)
    case InList(x, items, _) => (x +: items).flatMap(colRefsOf)
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .flatMap(colRefsOf)
    case _ => Nil
  }

  private def applySubqueryPred(cur: DataFrame, p: Expr, idx: Int,
                                resolve: ColRef => Column, env: TypeCheck.Env,
                                lookup: Lookup, grace: String,
                                declared: DeclaredTypes): DataFrame = {
    def unwrap(e: Expr, neg: Boolean): (Expr, Boolean) = e match {
      case Not(x) => unwrap(x, !neg)
      case other => (other, neg)
    }
    unwrap(p, neg = false) match {
      case (ExistsSub(q), neg) =>
        existsJoin(cur, q, neg, lookup, grace, declared)
      case (InSub(x, q, not), neg) =>
        inJoin(cur, x, q, not ^ neg, idx, resolve, env, lookup, grace, declared)
      case (other, _) =>
        throw new IllegalStateException(s"not a subquery predicate: $other")
    }
  }

  /** `e [NOT] IN (SELECT …)` — uncorrelated; one column. IN plans as a
    * left-semi join (WHERE filters UNKNOWN rows anyway, so null-unsafe
    * equality is exactly the membership filter). NOT IN uses the
    * `(l = r) OR isnull(l = r)` condition — the exact shape Spark's
    * ExtractSingleColumnNullAwareAntiJoin recognizes, so the physical plan
    * is a broadcast null-aware anti join rather than a nested loop — which
    * also gives the standard three-valued semantics: any NULL on either
    * side suppresses the row. */
  private def inJoin(cur: DataFrame, x: Expr, q: Query, not: Boolean,
                     idx: Int, resolve: ColRef => Column, env: TypeCheck.Env,
                     lookup: Lookup, grace: String,
                     declared: DeclaredTypes): DataFrame = {
    val sub = plan(q, lookup, grace, declared)
    require(!sub.isStreaming,
      "IN (SELECT …) requires a batch/pull subquery relation")
    require(sub.columns.length == 1,
      s"IN subquery must return exactly one column, got ${sub.columns.length}")
    val nm = s"__graft_in$idx"
    val rhs = sub.select(col(sub.columns.head).as(nm))
    val l = column(x, resolve, env)
    if (!not) cur.join(rhs, l === rhs(nm), "left_semi")
    else {
      val eq = l === rhs(nm)
      cur.join(rhs, eq || eq.isNull, "left_anti")
    }
  }

  /** `[NOT] EXISTS (SELECT …)`. Correlated conjuncts of the subquery's
    * WHERE (refs the subquery's own relation lacks but the outer one has)
    * become the semi/anti join condition; purely-local conjuncts filter
    * the subquery side first, below the join. Column refs bind to their
    * owning DataFrame (dataset-bound), so EXISTS over the outer query's
    * own table — a self-join — stays unambiguous. */
  private def existsJoin(cur: DataFrame, q: Query, negate: Boolean,
                         lookup: Lookup, grace: String,
                         declared: DeclaredTypes): DataFrame = {
    val joinType = if (negate) "left_anti" else "left_semi"
    def uncorrelated(): DataFrame = {
      val sub = plan(q, lookup, grace, declared)
      require(!sub.isStreaming,
        "EXISTS (…) requires a batch/pull subquery relation")
      // row-existence only: limit(1) caps the broadcast side at one row
      cur.join(broadcast(sub.limit(1)), lit(true), joinType)
    }
    q match {
      case s: Select if s.where.isDefined =>
        val subSrc = planFrom(s.from, lookup, declared)
        val subDf = subSrc.df
        require(!subDf.isStreaming,
          "EXISTS (…) requires a batch/pull subquery relation")
        def resolvable(df: DataFrame, name: String): Boolean =
          try { df(name); true } catch { case _: Throwable => false }
        def subHas(c: ColRef): Boolean = c match {
          case ColRef(Some(qual), n) =>
            subDf.columns.contains(s"$qual.$n") || resolvable(subDf, s"$qual.$n")
          case ColRef(None, n) => subDf.columns.exists(_.equalsIgnoreCase(n))
        }
        def outerHas(c: ColRef): Boolean = c match {
          case ColRef(Some(qual), n) =>
            cur.columns.contains(s"$qual.$n") || resolvable(cur, s"$qual.$n")
          case ColRef(None, n) => cur.columns.exists(_.equalsIgnoreCase(n))
        }
        val cs = conjunctsOf(s.where.get)
        val (corr, local) =
          cs.partition(c => colRefsOf(c).exists(r => !subHas(r) && outerHas(r)))
        if (corr.isEmpty) uncorrelated()
        else {
          require(subSrc.window.isEmpty,
            "correlated EXISTS subquery cannot be windowed")
          require(s.groupBy.isEmpty && !s.multiLevel && s.having.isEmpty,
            "correlated EXISTS subquery must be a plain SELECT " +
              "(no GROUP BY / HAVING)")
          require(s.items.forall {
            case ItemExpr(e, _) => collectAggs(e).isEmpty
            case _ => true },
            "correlated EXISTS subquery must not aggregate (a global " +
              "aggregate always yields one row, making EXISTS vacuously true)")
          val subEnv = TypeCheck.envOf(subDf)
          // local filters resolve unbound (only the sub frame is in scope)
          def subResolveUnbound(c: ColRef): Column = c match {
            case ColRef(Some(qual), n) if subDf.columns.contains(s"$qual.$n") =>
              col(s"`$qual.$n`")
            case ColRef(Some(qual), n) => col(s"$qual.$n")
            case ColRef(None, n) => col(n)
          }
          local.foreach(TypeCheck.check(_, subEnv))
          val filteredSub = local.foldLeft(subDf)(
            (d, c) => d.filter(column(c, subResolveUnbound, subEnv)))
          // join-condition refs resolve UNBOUND by alias qualifier —
          // Spark's documented self-join pattern ($"a.id" > $"b.id"):
          // dataset-bound columns do not survive the dedup rewrite when
          // the subquery reads the outer query's own table. Bare local
          // refs get the sub's anchor alias, so a name both sides share
          // still resolves to the subquery side.
          val subAlias = scala.util.Try(refAlias(s.from)).toOption
          def subResolve(c: ColRef): Column = c match {
            case ColRef(Some(qual), n) if subDf.columns.contains(s"$qual.$n") =>
              col(s"`$qual.$n`")
            case ColRef(Some(qual), n) => col(s"$qual.$n")
            case ColRef(None, n) =>
              subAlias.map(a => col(s"$a.$n")).getOrElse(col(n))
          }
          def outerResolve(c: ColRef): Column = c match {
            case ColRef(Some(qual), n) if cur.columns.contains(s"$qual.$n") =>
              col(s"`$qual.$n`")
            case ColRef(Some(qual), n) => col(s"$qual.$n")
            case ColRef(None, n) => col(n)
          }
          def mixedResolve(c: ColRef): Column =
            if (subHas(c)) subResolve(c) else outerResolve(c)
          val cond = corr.map(c => column(c, mixedResolve)).reduce(_ && _)
          cur.join(filteredSub, cond, joinType)
        }
      case _ => uncorrelated()
    }
  }

  // ---- scalar subqueries ---------------------------------------------------

  private def collectScalars(e: Expr): Seq[ScalarSub] = e match {
    case s: ScalarSub => Seq(s)
    case Bin(_, l, r) => (collectScalars(l) ++ collectScalars(r)).distinct
    case Not(x) => collectScalars(x)
    case Fn(_, args) => args.flatMap(collectScalars).distinct
    case Agg(_, args, _, _) => args.flatMap(collectScalars).distinct
    case OrdKey(x, _, _) => collectScalars(x)
    case Kept(c, v) => (collectScalars(c) ++ collectScalars(v)).distinct
    case Cast(x, _) => collectScalars(x)
    case Between(x, lo, hi, _, _) => Seq(x, lo, hi).flatMap(collectScalars).distinct
    case ArrIndex(x, _) => collectScalars(x)
    case ArrSlice(x, _, _) => collectScalars(x)
    case ArrLit(items) => items.flatMap(collectScalars).distinct
    case InList(x, items, _) => (x +: items).flatMap(collectScalars).distinct
    case InSub(x, _, _) => collectScalars(x)
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .flatMap(collectScalars).distinct
    case w: WinFn =>
      (w.args ++ w.partitionBy ++ w.orderBy.map(_.e))
        .flatMap(collectScalars).distinct
    case _ => Nil
  }

  private def replaceScalars(e: Expr, names: Map[ScalarSub, String]): Expr = e match {
    case s: ScalarSub => ColRef(None, names(s))
    case Bin(op, l, r) => Bin(op, replaceScalars(l, names), replaceScalars(r, names))
    case Not(x) => Not(replaceScalars(x, names))
    case Fn(n, args) => Fn(n, args.map(replaceScalars(_, names)))
    case Agg(n, args, st, d) => Agg(n, args.map(replaceScalars(_, names)), st, d)
    case OrdKey(x, d, nl) => OrdKey(replaceScalars(x, names), d, nl)
    case Kept(c, v) => Kept(replaceScalars(c, names), replaceScalars(v, names))
    case Cast(x, dt) => Cast(replaceScalars(x, names), dt)
    case Between(x, lo, hi, n, sy) =>
      Between(replaceScalars(x, names), replaceScalars(lo, names),
        replaceScalars(hi, names), n, sy)
    case ArrIndex(x, i) => ArrIndex(replaceScalars(x, names), i)
    case ArrSlice(x, f, t) => ArrSlice(replaceScalars(x, names), f, t)
    case ArrLit(items) => ArrLit(items.map(replaceScalars(_, names)))
    case InList(x, items, n) =>
      InList(replaceScalars(x, names), items.map(replaceScalars(_, names)), n)
    case InSub(x, q, n) => InSub(replaceScalars(x, names), q, n)
    case CaseWhen(op0, bs, el) =>
      CaseWhen(op0.map(replaceScalars(_, names)),
        bs.map { case (c, r) => (replaceScalars(c, names), replaceScalars(r, names)) },
        el.map(replaceScalars(_, names)))
    case w: WinFn =>
      w.copy(args = w.args.map(replaceScalars(_, names)),
        partitionBy = w.partitionBy.map(replaceScalars(_, names)),
        orderBy = w.orderBy.map(o => o.copy(e = replaceScalars(o.e, names))))
    case other => other
  }

  private def hasWindowedFrom(r: TableRef): Boolean = r match {
    case _: TRWindowed => true
    case TRAlias(i, _) => hasWindowedFrom(i)
    case TRFlatten(i, _, _) => hasWindowedFrom(i)
    case TRJoin(l, rr, _, _, _) => hasWindowedFrom(l) || hasWindowedFrom(rr)
    case _ => false
  }

  /** A scalar subquery must be PROVABLY one-row — a global aggregate (no
    * GROUP BY, no FROM-window) or an explicit LIMIT 1 — as a static rule,
    * instead of Spark's runtime "more than one row" error. */
  private def provablyOneRow(q: Query): Boolean = q match {
    case s: Select =>
      s.limit.contains(1L) ||
        (s.groupBy.isEmpty && !s.multiLevel && !hasWindowedFrom(s.from) &&
          s.items.nonEmpty &&
          s.items.forall { case ItemExpr(_, _) => true; case _ => false } &&
          s.items.exists {
            case ItemExpr(e, _) => collectAggs(e).nonEmpty; case _ => false })
    case so: SetOp => so.limit.contains(1L)
  }

  /** Rewrite every scalar subquery in `sel` to a hidden column attached to
    * the source relation by a broadcast 1-row cross-join. The value stays
    * in the distributed plan — no driver-side collect — and Catalyst folds
    * the broadcast into every partition. */
  private def attachScalarSubs(sel: Select, df0: DataFrame, lookup: Lookup,
                               grace: String, declared: DeclaredTypes)
      : (Select, DataFrame, Boolean) = {
    val whereSubs = sel.where.toSeq.flatMap(collectScalars)
    val postExprs = sel.items.flatMap {
      case ItemExpr(e, _) => Seq(e)
      case ItemWildcard(_, _, rep) => rep.map(_._1)
    } ++ sel.having.toSeq ++ sel.orderBy.map(_.e)
    val postSubs = postExprs.flatMap(collectScalars)
    val subs = (whereSubs ++ postSubs).distinct
    if (subs.isEmpty) return (sel, df0, false)
    // post-aggregation positions can't see a pre-aggregation helper column:
    // aggregate queries may use scalar subqueries in WHERE only
    val aggregates = sel.groupBy.nonEmpty || sel.multiLevel ||
      postExprs.exists(collectAggs(_).nonEmpty)
    if (aggregates && postSubs.nonEmpty)
      throw new IllegalArgumentException(
        "scalar subqueries in the SELECT list / HAVING / ORDER BY of an " +
          "aggregate query are not supported — aggregate in a " +
          "FROM-subquery and compare outside, or move the test to WHERE")
    val names = subs.zipWithIndex.map { case (s, i) => s -> s"__graft_scalar$i" }.toMap
    val base = subs.foldLeft(df0) { (d, s) =>
      attachOneScalar(d, s, names(s), lookup, grace, declared)
    }
    def rw(e: Expr): Expr = replaceScalars(e, names)
    val sel2 = sel.copy(
      items = sel.items.map {
        case ItemExpr(e, a) => ItemExpr(rw(e), a)
        case w @ ItemWildcard(_, _, rep) =>
          w.copy(replace = rep.map { case (e, n) => (rw(e), n) }) },
      where = sel.where.map(rw),
      having = sel.having.map(rw),
      orderBy = sel.orderBy.map(o => o.copy(e = rw(o.e))))
    (sel2, base, true)
  }


  /** Attach one scalar subquery's value as a hidden column.
    *
    * Uncorrelated: must be PROVABLY one-row (global aggregate or LIMIT 1,
    * statically checked); planned as a broadcast 1-row cross-join.
    *
    * Correlated (r8 extension): `(SELECT agg(x) FROM t2 WHERE t2.k =
    * outer.k [AND local…])` — decorrelated the classic way: the sub
    * relation filters by its LOCAL conjuncts, groups ONCE by the
    * correlation keys, aggregates, and LEFT-joins that per-key aggregate
    * to the outer relation. No per-outer-row re-execution anywhere: one
    * aggregation shuffle plus one join at any scale. Empty groups yield
    * NULL per SQL — except COUNT, which coalesces to 0 (the COUNT bug of
    * naive decorrelation). Restricted to equality correlation and a
    * single bare aggregate select item, rejected with vocabulary
    * otherwise. */
  private def attachOneScalar(cur: DataFrame, s: ScalarSub, outName: String,
                              lookup: Lookup, grace: String,
                              declared: DeclaredTypes): DataFrame = {
    def uncorrelated(): DataFrame = {
      if (!provablyOneRow(s.q))
        throw new IllegalArgumentException(
          "scalar subquery must be provably one-row: a global aggregate " +
            "(no GROUP BY) or LIMIT 1")
      val sub = plan(s.q, lookup, grace, declared)
      require(!sub.isStreaming, "scalar subquery must be a batch/pull relation")
      require(sub.columns.length == 1,
        s"scalar subquery must return exactly one column, got ${sub.columns.length}")
      cur.crossJoin(broadcast(sub.select(col(sub.columns.head).as(outName))))
    }
    s.q match {
      case q: Select if q.where.isDefined =>
        val subSrc = planFrom(q.from, lookup, declared)
        val subDf = subSrc.df
        def resolvable(df: DataFrame, name: String): Boolean =
          try { df(name); true } catch { case _: Throwable => false }
        def subHas(c: ColRef): Boolean = c match {
          case ColRef(Some(qual), n) =>
            subDf.columns.contains(s"$qual.$n") || resolvable(subDf, s"$qual.$n")
          case ColRef(None, n) => subDf.columns.exists(_.equalsIgnoreCase(n))
        }
        def outerHas(c: ColRef): Boolean = c match {
          case ColRef(Some(qual), n) =>
            cur.columns.contains(s"$qual.$n") || resolvable(cur, s"$qual.$n")
          case ColRef(None, n) => cur.columns.exists(_.equalsIgnoreCase(n))
        }
        val cs = conjunctsOf(q.where.get)
        val (corr, local) =
          cs.partition(c => colRefsOf(c).exists(r => !subHas(r) && outerHas(r)))
        if (corr.isEmpty) uncorrelated()
        else {
          require(!subDf.isStreaming,
            "scalar subquery must be a batch/pull relation")
          require(subSrc.window.isEmpty,
            "correlated scalar subquery cannot be windowed")
          require(q.groupBy.isEmpty && !q.multiLevel && q.having.isEmpty &&
            q.orderBy.isEmpty && q.limit.isEmpty && q.offset.isEmpty,
            "correlated scalar subquery must be a single global aggregate " +
              "over its own relation (no GROUP BY/HAVING/ORDER BY/LIMIT)")
          val aggItem = q.items match {
            case Seq(ItemExpr(a: Agg, _)) => a
            case _ => throw new IllegalArgumentException(
              "correlated scalar subquery must SELECT exactly one bare " +
                "aggregate call, e.g. (SELECT MAX(x) FROM t WHERE t.k = o.k)")
          }
          // correlation must be equalities: sub column = outer column
          val keyPairs: Seq[(ColRef, ColRef)] = corr.map {
            case Bin("=", l: ColRef, r: ColRef)
                if subHas(l) && !subHas(r) && outerHas(r) => (l, r)
            case Bin("=", l: ColRef, r: ColRef)
                if subHas(r) && !subHas(l) && outerHas(l) => (r, l)
            case other => throw new IllegalArgumentException(
              "correlated scalar subquery supports equality correlation " +
                s"(sub_col = outer_col) only, got: $other")
          }
          val subEnv = TypeCheck.envOf(subDf)
          def subResolve(c: ColRef): Column = c match {
            case ColRef(Some(qual), n) if subDf.columns.contains(s"$qual.$n") =>
              col(s"`$qual.$n`")
            case ColRef(Some(qual), n) => col(s"$qual.$n")
            case ColRef(None, n) => col(n)
          }
          local.foreach(TypeCheck.check(_, subEnv))
          val filteredSub = local.foldLeft(subDf)(
            (d, c) => d.filter(column(c, subResolve, subEnv)))
          val keyCols = keyPairs.zipWithIndex.map { case ((sk, _), i) =>
            subResolve(sk).as(s"__graft_sk$i") }
          val agged = filteredSub.groupBy(keyCols: _*)
            .agg(aggColumn(aggItem, subResolve).as(outName))
          def outerResolve(c: ColRef): Column = c match {
            case ColRef(Some(qual), n) if cur.columns.contains(s"$qual.$n") =>
              col(s"`$qual.$n`")
            case ColRef(Some(qual), n) => col(s"$qual.$n")
            case ColRef(None, n) => col(n)
          }
          // <=> not ===: the dialect's `=` is NULL-SAFE everywhere else
          // (Bin("=") translates to <=>, including EXISTS correlation),
          // so a NULL outer key must match the sub relation's NULL-key
          // group here too. Found by the r11 differential fuzzer: ===
          // silently returned NULL for NULL outer keys while DuckDB's
          // IS NOT DISTINCT FROM (the oracle spelling of the dialect's
          // `=`) aggregates the NULL group.
          val cond = keyPairs.zipWithIndex.map { case ((_, ok), i) =>
            outerResolve(ok) <=> col(s"__graft_sk$i") }.reduce(_ && _)
          val joined = cur.join(agged, cond, "left")
          val fixed = // COUNT over an empty group is 0, not NULL
            if (aggItem.name == "COUNT")
              joined.withColumn(outName, coalesce(col(outName), lit(0L)))
            else joined
          keyPairs.indices.foldLeft(fixed)((d, i) => d.drop(s"__graft_sk$i"))
        }
      case _ => uncorrelated()
    }
  }

  /** Full fn translation including literal-arg special cases. */
  def fnColumn(name: String, args: Seq[Expr], resolve: ColRef => Column): Column =
    fnCallLit(name, args, e => column(e, resolve))
      .getOrElse(fnCall(name, args.map(e => column(e, resolve))))
}
