package graft.sql

import Ast._

/** Parse-time semantic validation — the reference's `validate` stage
  * (hstream-sql/src/HStream/SQL/Internal/Validate.hs, 805 LoC), which runs
  * between parsing and refinement and rejects ill-formed statements with a
  * meaningful message before anything is planned. The checks here mirror the
  * reference's rules (each cites its source); schema-dependent checks (e.g.
  * GROUP BY on a column the relation doesn't have) live in Translate.plan
  * where the resolved relation is in hand.
  *
  * Deliberate supersets (README "Accepted divergences"): scalar functions
  * OVER aggregates (`ABS(SUM(v))`) are allowed here — the reference rejects
  * them (Validate.hs:126-135) but the planner's aggregate extraction handles
  * them correctly, so rejecting would only shrink the surface.
  */
object Validate {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Strict 'uuuu-MM-dd HH:mm:ss[.f…]' — no lenient field rollover. */
  private val strictTsFmt: java.time.format.DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("uuuu-MM-dd HH:mm:ss")
      .optionalStart()
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 9, true)
      .optionalEnd()
      .toFormatter()
      .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  def apply(stmt: Stmt): Stmt = { checkStmt(stmt); stmt }

  private def checkStmt(stmt: Stmt): Unit = stmt match {
    case SelectStmt(q) => checkQuery(q, continuous = q.emitChanges)
    case CreateStreamAs(_, q, _) => checkQuery(q, continuous = true)
    case CreateView(_, q) => checkQuery(q, continuous = true)
    case InsertSel(_, q) => checkQuery(q, continuous = true)
    case CreateStream(name, schema, _) =>
      val dups = schema.map(_._1).groupBy(identity).collect { case (c, vs) if vs.size > 1 => c }
      if (dups.nonEmpty)
        fail(s"CREATE STREAM $name: duplicate column ${dups.mkString(", ")}")
    case InsertValues(stream, cols, vals) =>
      if (cols.size != vals.size)
        fail(s"INSERT INTO $stream: ${cols.size} columns but ${vals.size} values")
      val dups = cols.groupBy(identity).collect { case (c, vs) if vs.size > 1 => c }
      if (dups.nonEmpty) fail(s"INSERT INTO $stream: duplicate column ${dups.mkString(", ")}")
      vals.foreach(checkExpr(_, aggAllowed = false, where = "INSERT VALUES"))
    case Explain(inner) => checkStmt(inner)
    case _ => ()
  }

  /** A query body: a single SELECT or a set-operation tree (dialect
    * extension, SURVEY §2.7). Continuous forms allow only UNION ALL —
    * streaming union is the one set op Spark (and the reference's V2
    * union node, DiffFlow/Graph.hs:70-71) can run without unbounded
    * distinct state; INTERSECT/EXCEPT/distinct-UNION are batch-only. */
  private def checkQuery(q: Query, continuous: Boolean,
                         top: Boolean = true): Unit = q match {
    case s: Select =>
      if (!top && s.emitChanges)
        fail("EMIT CHANGES is only allowed at the top level of a query")
      checkSelect(s, continuous)
    case SetOp(op, all, l, r, ob, lim, emit, off) =>
      if (!top && emit)
        fail("EMIT CHANGES is only allowed at the top level of a query")
      val cont = continuous || emit
      if (cont && !(op == "union" && all))
        fail(s"only UNION ALL is supported in continuous queries, not " +
          s"${op.toUpperCase}${if (all) " ALL" else ""} — " +
          "INTERSECT/EXCEPT/distinct UNION need unbounded state; " +
          "use a batch/pull SELECT")
      if (cont && (ob.nonEmpty || lim.nonEmpty || off.nonEmpty))
        fail("ORDER BY / LIMIT / OFFSET are not supported in continuous queries " +
          "(EMIT CHANGES / CREATE STREAM AS / CREATE VIEW / INSERT-SELECT); " +
          "use a batch/pull SELECT")
      // set-op output rows carry no aggregation context: keys are plain
      // expressions over the combined relation's columns
      ob.foreach(o => checkExpr(o.e, aggAllowed = false, where = "ORDER BY"))
      checkLimit(lim); checkLimit(off)
      checkQuery(l, cont, top = false)
      checkQuery(r, cont, top = false)
  }

  private def checkSelect(sel: Select, continuous: Boolean = false): Unit = {
    // duplicate output aliases (Validate.hs `sel` case: DerivedColAs with a
    // repeated Ident is rejected)
    val aliases = sel.items.collect { case ItemExpr(_, Some(a)) => a }
    val dupAliases = aliases.groupBy(identity).collect { case (a, vs) if vs.size > 1 => a }
    if (dupAliases.nonEmpty)
      fail(s"duplicate column alias in SELECT: ${dupAliases.mkString(", ")}")

    // ORDER BY / LIMIT are a batch/pull-only extension (SURVEY §2.7): a
    // total order over an unbounded stream is undefined, and Spark rejects
    // sorting on streaming plans — surface that as a dialect rule, not a
    // deep Catalyst error
    if (continuous && (sel.orderBy.nonEmpty || sel.limit.nonEmpty ||
        sel.offset.nonEmpty))
      fail("ORDER BY / LIMIT / OFFSET are not supported in continuous queries " +
        "(EMIT CHANGES / CREATE STREAM AS / CREATE VIEW / INSERT-SELECT); " +
        "use a batch/pull SELECT")
    sel.orderBy.foreach(o => checkExpr(o.e, aggAllowed = true, where = "ORDER BY"))
    checkLimit(sel.limit); checkLimit(sel.offset)

    // exact DISTINCT aggregates cannot run incrementally over a stream
    // (Spark refuses distinct aggregation on streaming plans); the
    // mergeable-sketch form can — point users at it
    if (continuous) {
      val aggs = (sel.items.collect { case ItemExpr(e, _) => e } ++
        sel.having.toSeq)
      val distinctAggs = aggs.flatMap(collectDistinctAggs)
      if (distinctAggs.nonEmpty)
        fail(s"${distinctAggs.head.name}(DISTINCT …) is not supported in " +
          "continuous queries — use APPROX_COUNT_DISTINCT (mergeable " +
          "HyperLogLog state) or a batch/pull SELECT")
      // ordered concatenation over a stream = unbounded per-group value
      // state AND an order that is never final — batch/pull only
      val ordered = Seq("STRING_AGG", "ARRAY_AGG")
        .filter(n => aggs.flatMap(collectNamedAggs(n)).nonEmpty)
      if (ordered.nonEmpty)
        fail(s"${ordered.head} is not supported in continuous queries — " +
          "per-group collection state is unbounded and its order is " +
          "never final over a stream; use a batch/pull SELECT")
    }

    // subqueries in expressions (IN/EXISTS/scalar — extension, AST.hs:593
    // parses-but-rejects) are batch/pull only: their semi/anti/cross-join
    // plans need the full subquery result, which an unbounded stream never
    // finalizes
    if (continuous) {
      val withSubs = (sel.items.collect { case ItemExpr(e, _) => e } ++
        sel.where.toSeq ++ sel.having.toSeq ++ sel.orderBy.map(_.e))
        .filter(hasSubquery)
      if (withSubs.nonEmpty)
        fail("subqueries in expressions (IN / EXISTS / scalar) are not " +
          "supported in continuous queries (EMIT CHANGES / CREATE STREAM " +
          "AS / CREATE VIEW / INSERT-SELECT); use a batch/pull SELECT")
    }

    // aggregates are not allowed in WHERE (Validate.hs:521: "Aggregate
    // functions are not allowed in WHERE clause, HAVING clause and JOIN
    // condition" — HAVING over aggregates is standard SQL and the planner
    // handles it, so only WHERE and JOIN conditions reject here)
    sel.where.foreach(checkExpr(_, aggAllowed = false, where = "WHERE clause"))
    sel.items.foreach {
      case ItemExpr(e, _) => checkExpr(e, aggAllowed = true, where = "SELECT list")
      case _ => ()
    }
    sel.having.foreach(checkExpr(_, aggAllowed = true, where = "HAVING clause"))
    sel.groupBy.foreach(c => checkExpr(c, aggAllowed = false, where = "GROUP BY"))

    // GROUP BY ROLLUP (extension): batch/pull only — rollup levels over an
    // unbounded stream would need one state store per grouping level
    if (sel.multiLevel && continuous)
      fail("GROUP BY ROLLUP/CUBE/GROUPING SETS is not supported in continuous queries " +
        "(EMIT CHANGES / CREATE STREAM AS / CREATE VIEW / INSERT-SELECT); " +
        "use a batch/pull SELECT")
    // under ROLLUP every non-aggregate column reference must be a grouping
    // column: super-aggregate rows null the rolled-up keys, so a bare
    // non-grouped column has no value on those rows — reject with the
    // dialect's vocabulary, not a deep Catalyst grouping error
    if (sel.multiLevel) {
      val grouped = sel.groupBy.map(_.name.toLowerCase).toSet
      // HAVING/ORDER BY bind standard-SQL style to projected output
      // columns too, so aliases of computed items are legal references
      val outAliases = sel.items.collect {
        case ItemExpr(_, Some(a)) => a.toLowerCase }.toSet
      val loose = (sel.items.collect { case ItemExpr(e, _) => e } ++
        sel.having.toSeq ++ sel.orderBy.map(_.e))
        .flatMap(nonAggColRefs)
        .filter(c => !grouped.contains(c.name.toLowerCase) &&
          !outAliases.contains(c.name.toLowerCase))
      if (loose.nonEmpty)
        fail(s"ROLLUP query references non-grouped column " +
          s"'${loose.head.name}' outside an aggregate — add it to GROUP BY " +
          "ROLLUP (…) or wrap it in an aggregate")
    }
    // GROUPING_ID() is the rollup level indicator — meaningless elsewhere
    if (!sel.multiLevel) {
      val gids = (sel.items.collect { case ItemExpr(e, _) => e } ++
        sel.having.toSeq ++ sel.orderBy.map(_.e))
        .flatMap(Translate.collectAggs)
        .collect { case Agg("GROUPING_ID" | "GROUPING", _, _, _) => () }
      if (gids.nonEmpty)
        fail("GROUPING_ID()/GROUPING(col) requires GROUP BY ROLLUP/CUBE/GROUPING SETS")
    }

    // window functions (OVER — §2.8 extension): batch/pull only (a
    // per-partition total order is undefined over an unbounded stream, the
    // ORDER BY rule), and not combinable with GROUP BY (the dialect's
    // window functions read the pre-aggregation relation)
    val winFns = (sel.items.collect { case ItemExpr(e, _) => e } ++
      sel.orderBy.map(_.e)).flatMap(collectWinFns)
    if (winFns.nonEmpty) {
      if (continuous)
        fail(s"window function ${winFns.head.name} OVER (…) is not " +
          "supported in continuous queries (EMIT CHANGES / CREATE STREAM " +
          "AS / CREATE VIEW / INSERT-SELECT); use a batch/pull SELECT")
      if (sel.groupBy.nonEmpty || sel.multiLevel)
        fail(s"window function ${winFns.head.name} OVER (…) cannot " +
          "combine with GROUP BY — window it over the grouped result " +
          "via a FROM-subquery")
    }

    // QUALIFY (extension, DuckDB-compatible): a filter over window-
    // function results — batch/pull only (window rule), non-aggregated
    // selects only (the dialect's window functions already exclude
    // GROUP BY), and it must actually involve a window function: inline
    // OVER (…) or a select alias of one. Row predicates belong in WHERE.
    sel.qualify.foreach { q =>
      if (continuous)
        fail("QUALIFY is not supported in continuous queries " +
          "(EMIT CHANGES / CREATE STREAM AS / CREATE VIEW / INSERT-SELECT); " +
          "use a batch/pull SELECT")
      if (sel.groupBy.nonEmpty || sel.multiLevel)
        fail("QUALIFY cannot combine with GROUP BY — QUALIFY filters " +
          "window-function results; use HAVING for aggregate conditions")
      checkExpr(q, aggAllowed = false, where = "QUALIFY")
      val winAliases = sel.items.collect {
        case ItemExpr(e, Some(a)) if collectWinFns(e).nonEmpty =>
          a.toLowerCase }.toSet
      val refsWinAlias =
        nonAggColRefs(q).exists(c => winAliases.contains(c.name.toLowerCase))
      if (collectWinFns(q).isEmpty && !refsWinAlias)
        fail("QUALIFY must reference a window function — inline " +
          "fn(…) OVER (…) or a select alias of one; use WHERE for plain " +
          "row predicates")
    }

    // SELECT DISTINCT / DISTINCT ON (extension, DuckDB-compatible):
    // batch/pull only — exact deduplication over an unbounded stream needs
    // unbounded state (same rule as distinct UNION / DISTINCT aggregates)
    if ((sel.distinct || sel.distinctOn.nonEmpty) && continuous)
      fail("SELECT DISTINCT is not supported in continuous queries " +
        "(EMIT CHANGES / CREATE STREAM AS / CREATE VIEW / INSERT-SELECT); " +
        "use a batch/pull SELECT")
    if (sel.distinctOn.nonEmpty) {
      // the pick is "first row per key in ORDER BY order": without ORDER
      // BY it would be nondeterministic (DuckDB leaves it arbitrary; we
      // reject — reproducibility is this engine's contract)
      if (sel.orderBy.isEmpty)
        fail("DISTINCT ON requires ORDER BY: the first row per key group " +
          "is picked in ORDER BY order; an unordered pick would be " +
          "nondeterministic")
      if (sel.groupBy.nonEmpty || sel.multiLevel)
        fail("DISTINCT ON cannot combine with GROUP BY — GROUP BY already " +
          "produces one row per key; use aggregates to pick values")
      val itemExprs = sel.items.collect { case ItemExpr(e, _) => e }
      if (itemExprs.flatMap(Translate.collectAggs).nonEmpty)
        fail("DISTINCT ON cannot combine with aggregates")
      if (itemExprs.flatMap(collectWinFns).nonEmpty ||
          sel.qualify.exists(q => collectWinFns(q).nonEmpty))
        fail("DISTINCT ON cannot combine with window functions in the " +
          "same SELECT — window the picked rows via a FROM-subquery " +
          "(the evaluation order would otherwise be ambiguous)")
      sel.distinctOn.foreach(
        checkExpr(_, aggAllowed = false, where = "DISTINCT ON"))
    }
    if (sel.distinct) {
      if (sel.groupBy.nonEmpty || sel.multiLevel ||
          sel.items.collect { case ItemExpr(e, _) => e }
            .flatMap(Translate.collectAggs).nonEmpty)
        fail("SELECT DISTINCT cannot combine with GROUP BY or " +
          "aggregates — grouped output is already one row per key")
      // standard SQL: with DISTINCT, ORDER BY may only use output columns
      // (a hidden sort key would re-introduce the duplicates it needs)
      val outNames = sel.items.collect {
        case ItemExpr(e, a) => a.getOrElse(Translate.exprName(e)).toLowerCase
      }.toSet
      sel.orderBy.foreach {
        case OrderItem(ColRef(None, n), _, _) if outNames.contains(n.toLowerCase) => ()
        case OrderItem(e, _, _) =>
          fail(s"with SELECT DISTINCT, ORDER BY must reference output " +
            s"columns of the select list; '$e' is not one")
      }
    }

    checkFrom(sel.from, inJoin = false, continuous = continuous)
  }

  /** Does a query aggregate its input — a GROUP BY, or any aggregate call
    * in the select list (a global aggregate)? Used by the continuous
    * agg-as-join-input rejection: the deciding property is "this relation
    * is an update-mode aggregate", which either form produces. Set-op
    * branches are checked both ways (one aggregated branch makes the
    * union an aggregate-bearing stream). */
  private def hasAggregation(q: Query): Boolean = q match {
    case s: Select =>
      s.groupBy.nonEmpty || s.items.exists {
        case ItemExpr(e, _) => hasAggCall(e)
        case _ => false
      }
    case so: SetOp => hasAggregation(so.l) || hasAggregation(so.r)
    case _ => false
  }

  private def hasAggCall(e: Expr): Boolean = e match {
    case _: Agg => true
    case InList(x, items, _) => (x +: items).exists(hasAggCall)
    case Bin(_, l, r) => hasAggCall(l) || hasAggCall(r)
    case Not(x) => hasAggCall(x)
    case Fn(_, args) => args.exists(hasAggCall)
    case Kept(c, v) => hasAggCall(c) || hasAggCall(v)
    case Cast(x, _) => hasAggCall(x)
    case Between(x, lo, hi, _, _) => Seq(x, lo, hi).exists(hasAggCall)
    case ArrIndex(x, _) => hasAggCall(x)
    case ArrSlice(x, _, _) => hasAggCall(x)
    case ArrLit(items) => items.exists(hasAggCall)
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .exists(hasAggCall)
    case _ => false
  }

  /** Any subquery node in an expression tree (sub bodies not entered —
    * they are separate scopes, validated via checkExpr's recursion). */
  private def hasSubquery(e: Expr): Boolean = e match {
    case _: InSub | _: ExistsSub | _: ScalarSub => true
    case InList(x, items, _) => (x +: items).exists(hasSubquery)
    case Bin(_, l, r) => hasSubquery(l) || hasSubquery(r)
    case Not(x) => hasSubquery(x)
    case Fn(_, args) => args.exists(hasSubquery)
    case Agg(_, args, _, _) => args.exists(hasSubquery)
    case Kept(c, v) => hasSubquery(c) || hasSubquery(v)
    case Cast(x, _) => hasSubquery(x)
    case Between(x, lo, hi, _, _) => Seq(x, lo, hi).exists(hasSubquery)
    case ArrIndex(x, _) => hasSubquery(x)
    case ArrSlice(x, _, _) => hasSubquery(x)
    case ArrLit(items) => items.exists(hasSubquery)
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .exists(hasSubquery)
    case w: WinFn =>
      (w.args ++ w.partitionBy ++ w.orderBy.map(_.e)).exists(hasSubquery)
    case _ => false
  }

  /** All OVER-clause window calls in an expression tree. */
  private def collectWinFns(e: Expr): Seq[WinFn] = e match {
    case w: WinFn => Seq(w)
    case InList(x, items, _) => (x +: items).flatMap(collectWinFns)
    case InSub(x, _, _) => collectWinFns(x)
    case Bin(_, l, r) => collectWinFns(l) ++ collectWinFns(r)
    case Not(x) => collectWinFns(x)
    case Fn(_, args) => args.flatMap(collectWinFns)
    case Agg(_, args, _, _) => args.flatMap(collectWinFns)
    case Kept(c, v) => collectWinFns(c) ++ collectWinFns(v)
    case Cast(x, _) => collectWinFns(x)
    case Between(x, lo, hi, _, _) => Seq(x, lo, hi).flatMap(collectWinFns)
    case ArrIndex(x, _) => collectWinFns(x)
    case ArrSlice(x, _, _) => collectWinFns(x)
    case ArrLit(items) => items.flatMap(collectWinFns)
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .flatMap(collectWinFns)
    case _ => Nil
  }

  /** Bare column references NOT under an aggregate call — the refs a
    * ROLLUP query must ground in its grouping columns. Aliases of computed
    * aggregates rewrite to ColRefs only after Translate, so every ColRef
    * seen here is a real input column. */
  private def nonAggColRefs(e: Expr): Seq[ColRef] = e match {
    case _: Agg => Nil
    case c: ColRef => Seq(c)
    case InList(x, items, _) => (x +: items).flatMap(nonAggColRefs)
    case InSub(x, _, _) => nonAggColRefs(x) // sub body is its own scope
    case Bin(_, l, r) => nonAggColRefs(l) ++ nonAggColRefs(r)
    case Not(x) => nonAggColRefs(x)
    case Fn(_, args) => args.flatMap(nonAggColRefs)
    case Cast(x, _) => nonAggColRefs(x)
    case Between(x, lo, hi, _, _) =>
      nonAggColRefs(x) ++ nonAggColRefs(lo) ++ nonAggColRefs(hi)
    case ArrIndex(x, _) => nonAggColRefs(x)
    case ArrSlice(x, _, _) => nonAggColRefs(x)
    case ArrLit(items) => items.flatMap(nonAggColRefs)
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .flatMap(nonAggColRefs)
    case _ => Nil
  }

  private def checkFrom(ref: TableRef, inJoin: Boolean, continuous: Boolean): Unit = ref match {
    case TRStream(_) => ()
    case TRSubquery(s) =>
      // An AGGREGATED subquery as a continuous join input (agg → join):
      // the reference rejects joins over aggregated/windowed streams
      // (Codegen/V1.hs:295-300, the same rule TRWindowed pins below), and
      // Spark's stream-stream join cannot take an update-mode aggregate
      // side — pinned as a messaged dialect rule instead of a raw
      // AnalysisException at stream start (r14, VERDICT r13 #5).
      if (inJoin && continuous && hasAggregation(s))
        fail("joining an aggregated stream is not supported in continuous " +
          "queries (aggregate the join's result instead, or use a " +
          "batch/pull SELECT)")
      checkQuery(s, continuous, top = false)
    case TRRecursive(name, base, step, _) =>
      // a fixpoint over an unbounded stream is undefined — same gate as
      // ORDER BY; base and step are ordinary batch queries
      if (continuous)
        fail(s"WITH RECURSIVE ($name) is not supported in continuous " +
          "queries (EMIT CHANGES / CREATE STREAM AS / CREATE VIEW / " +
          "INSERT-SELECT) — use a batch/pull SELECT")
      checkQuery(base, continuous = false, top = false)
      checkQuery(step, continuous = false, top = false)
    case TRAlias(inner, _) => checkFrom(inner, inJoin, continuous)
    case TRFlatten(inner, e, _) =>
      checkExpr(e, aggAllowed = false, where = "FLATTEN")
      checkFrom(inner, inJoin, continuous)
    case TRWindowed(inner, win) =>
      // windowed relations cannot be join inputs (Codegen/V1.hs:295-300
      // "Joining time-windowed and non-time-windowed streams is not
      // supported") — rejected HERE at parse time, not at plan time
      if (inJoin) fail("joining time-windowed streams is not supported (window the join's result instead)")
      checkWindow(win)
      checkFrom(inner, inJoin, continuous)
    case TRJoin(l, r, jt, cond, within) =>
      // ASOF JOIN (extension): one-shuffle union-trick plan needs the full
      // right history — batch/pull only; streams get StreamOps.asofEnrich
      if ((jt == "asof" || jt == "asof_left") && continuous)
        fail("ASOF JOIN is not supported in continuous queries " +
          "(EMIT CHANGES / CREATE STREAM AS / CREATE VIEW / INSERT-SELECT) " +
          "— use the streaming as-of enrichment, or a batch/pull SELECT")
      within.foreach { w =>
        if (w.n <= 0)
          fail(s"WITHIN interval must be positive, got ${w.n} ${w.unit}")
      }
      cond match {
        case On(e) => checkExpr(e, aggAllowed = false, where = "JOIN condition")
        case Using(cols) if cols.isEmpty => fail("USING () requires at least one column")
        case _ => ()
      }
      checkFrom(l, inJoin = true, continuous = continuous)
      checkFrom(r, inJoin = true, continuous = continuous)
  }

  private def checkWindow(win: WindowSpec): Unit = win match {
    case Tumble(i) =>
      if (i.n <= 0) fail(s"TUMBLE interval must be positive, got ${i.n} ${i.unit}")
    case Session(g) =>
      if (g.n <= 0) fail(s"SESSION gap must be positive, got ${g.n} ${g.unit}")
    case Hop(size, adv) =>
      if (size.n <= 0 || adv.n <= 0)
        fail("HOP size and advance must be positive")
      // advance > size leaves gaps no record falls into — reject loudly
      // (Spark's window() would also refuse slide > duration at run time)
      if (toMillis(adv) > toMillis(size))
        fail(s"HOP advance (${adv.n} ${adv.unit}) must not exceed size (${size.n} ${size.unit})")
  }

  private def toMillis(i: IntervalLit): Long = i.unit.toUpperCase match {
    case "SECOND" | "SECONDS" => i.n * 1000L
    case "MINUTE" | "MINUTES" => i.n * 60000L
    case "HOUR" | "HOURS" => i.n * 3600000L
    case "DAY" | "DAYS" => i.n * 86400000L
    // calendar units: approximate spans so the HOP gap check compares in a
    // common scale (raw counts silently passed mixed-unit pairs, e.g.
    // HOP size 40 DAYS advance 2 MONTHS). Exact length varies per month;
    // a ±2-day approximation cannot flip a sane size/advance pair.
    case "MONTH" | "MONTHS" => i.n * 30L * 86400000L
    case "YEAR" | "YEARS" => i.n * 365L * 86400000L
    case _ => i.n
  }

  /** LIMIT rides Spark's Dataset.limit(Int); larger literals would
    * silently truncate (2^32 → 0 rows). Reject at parse time. */
  private def checkLimit(limit: Option[Long]): Unit = limit.foreach { n =>
    if (n > Int.MaxValue)
      fail(s"LIMIT/OFFSET $n exceeds the supported maximum (${Int.MaxValue})")
  }

  private def collectNamedAggs(name: String)(e: Expr): Seq[Agg] =
    collectDistinctAggs(e, _.name == name)

  private def collectDistinctAggs(e: Expr): Seq[Agg] =
    collectDistinctAggs(e, _.distinct)

  private def collectDistinctAggs(e: Expr, p: Agg => Boolean): Seq[Agg] = e match {
    case a: Agg if p(a) => Seq(a) ++ a.args.flatMap(collectDistinctAggs(_, p))
    case a: Agg => a.args.flatMap(collectDistinctAggs(_, p))
    case OrdKey(x, _, _) => collectDistinctAggs(x, p)
    case Kept(c, v) =>
      collectDistinctAggs(c, p) ++ collectDistinctAggs(v, p)
    case InList(x, items, _) => (x +: items).flatMap(collectDistinctAggs(_, p))
    case InSub(x, _, _) => collectDistinctAggs(x, p)
    case Bin(_, l, r) => collectDistinctAggs(l, p) ++ collectDistinctAggs(r, p)
    case Not(x) => collectDistinctAggs(x, p)
    case Fn(_, args) => args.flatMap(collectDistinctAggs(_, p))
    case Cast(x, _) => collectDistinctAggs(x, p)
    case Between(x, lo, hi, _, _) => Seq(x, lo, hi).flatMap(collectDistinctAggs(_, p))
    case ArrIndex(x, _) => collectDistinctAggs(x, p)
    case ArrSlice(x, _, _) => collectDistinctAggs(x, p)
    case ArrLit(items) => items.flatMap(collectDistinctAggs(_, p))
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .flatMap(collectDistinctAggs(_, p))
    case _ => Nil
  }

  /** Expression walk: nested-aggregate rejection (Validate.hs:106
    * "Aggregate functions can not be nested"), aggregate-position rules,
    * and date/time literal well-formedness (Validate.hs date/time cases:
    * 2021-02-29 and 14:61:59 must be rejected at parse time). */
  private def checkExpr(e: Expr, aggAllowed: Boolean, where: String,
                        insideAgg: Boolean = false): Unit = e match {
    case Agg(name, args, _, distinct) =>
      if (insideAgg) fail(s"aggregate functions cannot be nested: $name")
      if (!aggAllowed) fail(s"aggregate function $name is not allowed in $where")
      // DISTINCT aggregates (extension): exact dedup only for COUNT/SUM;
      // MIN/MAX(DISTINCT) is a no-op and the rest have no exact Spark form
      if (distinct && !Set("COUNT", "SUM").contains(name))
        fail(s"DISTINCT is supported for COUNT and SUM only, not $name " +
          "(for approximate cardinality use APPROX_COUNT_DISTINCT)")
      name match {
        case "PERCENTILE" => args match {
          case Seq(v, frac) =>
            val f = frac match {
              case NumLit(x) => x; case IntLit(x) => x.toDouble
              case other => fail(s"PERCENTILE fraction must be a numeric literal, got $other")
            }
            if (f < 0.0 || f > 1.0) fail(s"PERCENTILE fraction must be in [0, 1], got $f")
            checkExpr(v, aggAllowed, where, insideAgg = true)
          case _ => fail("PERCENTILE requires (expr, fraction-literal)")
        }
        case "MEDIAN" => args match {
          case Seq(v) => checkExpr(v, aggAllowed, where, insideAgg = true)
          case _ => fail("MEDIAN requires exactly one argument")
        }
        // the mergeable-sketch percentile (bounded state; the streaming /
        // 100 TB form — exact PERCENTILE keeps a per-group value map)
        case "APPROX_PERCENTILE" =>
          if (args.length < 2 || args.length > 3)
            fail("APPROX_PERCENTILE requires (expr, fraction[, accuracy])")
          val f = args(1) match {
            case NumLit(x) => x; case IntLit(x) => x.toDouble
            case other => fail(s"APPROX_PERCENTILE fraction must be a numeric literal, got $other")
          }
          if (f < 0.0 || f > 1.0) fail(s"APPROX_PERCENTILE fraction must be in [0, 1], got $f")
          if (args.length == 3) args(2) match {
            // Spark's ApproximatePercentile takes an Int accuracy — reject
            // overflow here, as for LIMIT, instead of leaking an engine error
            case IntLit(a) if a > 0 && a <= Int.MaxValue => ()
            case IntLit(a) if a > Int.MaxValue =>
              fail(s"APPROX_PERCENTILE accuracy maximum is ${Int.MaxValue}, got $a")
            case other => fail(s"APPROX_PERCENTILE accuracy must be a positive int literal, got $other")
          }
          checkExpr(args.head, aggAllowed, where, insideAgg = true)
        case "TOPK" | "TOPKDISTINCT" => args match {
          case Seq(v, IntLit(k)) =>
            if (k <= 0) fail(s"$name k must be positive, got $k")
            checkExpr(v, aggAllowed, where, insideAgg = true)
          case _ => fail(s"$name requires (expr, positive-int-literal)")
        }
        case _ => args.foreach(checkExpr(_, aggAllowed, where, insideAgg = true))
      }
    case DateLit(s) =>
      try java.time.LocalDate.parse(s)
      catch { case _: Exception => fail(s"invalid DATE literal: $s") }
    case TimeLit(s) =>
      try java.time.LocalTime.parse(s)
      catch { case _: Exception => fail(s"invalid TIME literal: $s") }
    case TimestampLit(s) =>
      // both forms the reference accepts: 'yyyy-MM-dd HH:mm:ss[.f]' and
      // ISO-8601 with T separator / zone offset (FlowTimestamp ZonedTime).
      // STRICT resolution throughout — java.sql.Timestamp.valueOf would
      // leniently roll '2021-02-29 14:61:59' over to March 1st 15:01:59,
      // exactly the class of literal this pass exists to reject.
      val ok =
        try { java.time.LocalDateTime.parse(s, Validate.strictTsFmt); true }
        catch { case _: Exception =>
          try { java.time.OffsetDateTime.parse(s); true }
          catch { case _: Exception =>
            try { java.time.LocalDateTime.parse(s); true }
            catch { case _: Exception => false } } }
      if (!ok) fail(s"invalid TIMESTAMP literal: $s")
    case wf: WinFn =>
      import wf.{name, args, partitionBy => parts, orderBy => ord, frame,
        rangeFrame, groupsFrame, exclude}
      // a named-window reference that survived parsing was used outside
      // the defining SELECT's resolution scope (e.g. a trailing ORDER BY)
      wf.windowRef.foreach(r => fail(s"window reference '$r' was not " +
        "resolved — named windows (WINDOW clause) are usable in the " +
        "SELECT list and QUALIFY of the defining SELECT"))
      // window functions are SELECT-list/ORDER-BY/QUALIFY expressions
      // only; their value is undefined pre-projection (standard SQL), and
      // nesting one inside an aggregate has no meaning either
      if (insideAgg) fail(s"window function $name cannot appear inside an aggregate")
      if (where != "SELECT list" && where != "ORDER BY" && where != "QUALIFY")
        fail(s"window function $name is not allowed in $where")
      if (Set("ROW_NUMBER", "RANK", "DENSE_RANK", "NTILE",
          "PERCENT_RANK", "CUME_DIST").contains(name) && ord.isEmpty)
        fail(s"$name requires ORDER BY in its OVER clause")
      // ROWS/RANGE/GROUPS frames (extension): aggregates and FIRST/
      // LAST_VALUE only — ranking functions and LAG/LEAD define their own
      // row scope
      frame.foreach { case (lo, hi) =>
        val kind = if (groupsFrame) "GROUPS" else if (rangeFrame) "RANGE"
          else "ROWS"
        if (ord.isEmpty)
          fail(s"$name: a $kind frame requires ORDER BY in the OVER clause")
        if (Set("ROW_NUMBER", "RANK", "DENSE_RANK", "NTILE", "LAG", "LEAD",
            "PERCENT_RANK", "CUME_DIST").contains(name))
          fail(s"$name does not accept a window frame")
        if (lo > hi)
          fail(s"$name: $kind frame lower bound exceeds upper bound")
        // RANGE offsets are values added to the single ORDER BY key;
        // multiple keys make the offset arithmetic undefined
        val finite = (lo != Long.MinValue && lo != 0L) ||
          (hi != Long.MaxValue && hi != 0L)
        if (rangeFrame && finite && ord.size != 1)
          fail(s"$name: a RANGE frame with numeric offsets requires " +
            s"exactly one ORDER BY key in the OVER clause, got ${ord.size}")
      }
      // frame EXCLUDE (extension): SUM/COUNT/AVG plan it by
      // frame-aggregate SUBTRACTION where the whole peer set is inside
      // the frame (RANGE/GROUPS); MIN/MAX take an exact prefix/suffix
      // decomposition where one exists; every remaining combo — value-
      // typed RANGE + any EXCLUDE (r11) and ROWS + GROUP/TIES, where the
      // positional boundary can cut through the value-based peer group
      // (r12) — takes the collected-frame evaluation (Translate
      // winFnCol). The FRAME-VALUED functions — FIRST/LAST/NTH_VALUE and
      // the windowed STRING_AGG/ARRAY_AGG — take the row-identity
      // collected plan (r13). Every EXCLUDE mode is supported on every
      // frame type for all ten.
      if (exclude != "NO OTHERS" &&
          !Set("SUM", "COUNT", "AVG", "MIN", "MAX", "FIRST_VALUE",
            "LAST_VALUE", "NTH_VALUE", "STRING_AGG", "ARRAY_AGG")
            .contains(name))
        fail(s"$name does not support frame EXCLUDE (the aggregates " +
          "SUM/COUNT/AVG/MIN/MAX and the frame-valued FIRST_VALUE/" +
          "LAST_VALUE/NTH_VALUE/STRING_AGG/ARRAY_AGG do)")
      // no aggregates (and no nested window fns) inside any part
      (args ++ parts ++ ord.map(_.e))
        .foreach(checkExpr(_, aggAllowed = false, where = s"$name's OVER clause"))
    case InList(x, items, _) =>
      (x +: items).foreach(checkExpr(_, aggAllowed, where, insideAgg))
    case InSub(x, q, _) =>
      // semi/anti-join plans exist only at the WHERE level (same rule as
      // Spark's own analyzer for predicate subqueries)
      if (where != "WHERE clause")
        fail(s"IN (SELECT …) is only allowed in the WHERE clause, not in $where")
      checkExpr(x, aggAllowed, where, insideAgg)
      checkQuery(q, continuous = false, top = false)
    case ExistsSub(q) =>
      if (where != "WHERE clause")
        fail(s"EXISTS (…) is only allowed in the WHERE clause, not in $where")
      checkQuery(q, continuous = false, top = false)
    case ScalarSub(q) =>
      if (insideAgg)
        fail("a scalar subquery cannot appear inside an aggregate")
      checkQuery(q, continuous = false, top = false)
    case Bin(_, l, r) =>
      checkExpr(l, aggAllowed, where, insideAgg); checkExpr(r, aggAllowed, where, insideAgg)
    case Not(x) => checkExpr(x, aggAllowed, where, insideAgg)
    case Fn(_, args) => args.foreach(checkExpr(_, aggAllowed, where, insideAgg))
    case Cast(x, _) => checkExpr(x, aggAllowed, where, insideAgg)
    case Between(x, lo, hi, _, _) =>
      Seq(x, lo, hi).foreach(checkExpr(_, aggAllowed, where, insideAgg))
    case ArrIndex(x, _) => checkExpr(x, aggAllowed, where, insideAgg)
    case ArrSlice(x, _, _) => checkExpr(x, aggAllowed, where, insideAgg)
    case ArrLit(items) => items.foreach(checkExpr(_, aggAllowed, where, insideAgg))
    // ordered-aggregate sort key (STRING_AGG/ARRAY_AGG, grouped or
    // windowed): validate the key expression itself
    case OrdKey(x, _, _) => checkExpr(x, aggAllowed, where, insideAgg)
    // ARRAY_AGG FILTER marker: condition and value both sit inside the
    // aggregate call (the FILTER condition may not itself aggregate)
    case Kept(c, v) =>
      checkExpr(c, aggAllowed, where, insideAgg)
      checkExpr(v, aggAllowed, where, insideAgg)
    case CaseWhen(op0, bs, el) =>
      (op0.toSeq ++ bs.flatMap { case (c, r) => Seq(c, r) } ++ el.toSeq)
        .foreach(checkExpr(_, aggAllowed, where, insideAgg))
    case _ => ()
  }
}
