package graft.sql

import Ast._

/** Recursive-descent parser for the HStream SQL dialect.
  *
  * Grammar: /root/reference/hstream-sql/etc/SQL-v1.cf. Expression precedence
  * mirrors the grammar's ValueExpr .. ValueExpr10 ladder (SQL-v1.cf:176-255):
  * OR < AND < NOT < comparisons < BETWEEN < JSON-access < add/sub < mul <
  * array-access < cast < atoms. Notable dialect facts preserved: every join
  * requires WITHIN (SQL-v1.cf:121); `/` and `%` are documented EXTENSIONS
  * (the reference grammar stops at OpAdd|OpSub|OpMul, SQL-v1.cf:201-203),
  * 0-based array indexing (Codegen/Common.hs:72-86), `{…}` array literals.
  * Keywords are matched case-insensitively (friendlier than the reference's
  * uppercase-only lexer); identifiers keep their case, `"…"` quoting allowed.
  */
object Parser {

  def parse(sql: String): Stmt =
    Validate(new Parser(Lexer.tokenize(sql)).statement())

  def parseExpr(s: String): Expr = new Parser(Lexer.tokenize(s)).fullExpr()

  // ---- CTE desugaring (WITH name AS (…)) -----------------------------------
  // Each CTE reference becomes an aliased FROM-subquery; references inside
  // expression subqueries (IN/EXISTS/scalar) substitute too. Names compare
  // case-insensitively (the resolver's default), CTEs shadow real tables.

  private[sql] def substCtes(q: Query, m: Map[String, TableRef]): Query =
    if (m.isEmpty) q else q match {
      case s: Select => s.copy(
        items = s.items.map {
          case ItemExpr(e, a) => ItemExpr(substCteExpr(e, m), a)
          case w @ ItemWildcard(_, _, rep) =>
            w.copy(replace = rep.map { case (e, n) => (substCteExpr(e, m), n) })
        },
        from = substCteRef(s.from, m),
        where = s.where.map(substCteExpr(_, m)),
        having = s.having.map(substCteExpr(_, m)),
        qualify = s.qualify.map(substCteExpr(_, m)),
        orderBy = s.orderBy.map(o => o.copy(e = substCteExpr(o.e, m))))
      case so: SetOp => so.copy(l = substCtes(so.l, m), r = substCtes(so.r, m))
    }

  private def substCteRef(r: TableRef, m: Map[String, TableRef]): TableRef = r match {
    // replacement is VERBATIM — never re-walked, so a CTE body resolved
    // against its (earlier-names-only) scope can't capture later names
    case TRStream(n) if m.contains(n.toLowerCase) =>
      TRAlias(m(n.toLowerCase), n)
    case TRAlias(i, a) => TRAlias(substCteRef(i, m), a)
    case TRWindowed(i, w) => TRWindowed(substCteRef(i, m), w)
    case TRFlatten(i, e, a) => TRFlatten(substCteRef(i, m), substCteExpr(e, m), a)
    case TRJoin(l, rr, jt, c, w) =>
      val c2 = c match {
        case On(e) => On(substCteExpr(e, m))
        case other => other
      }
      TRJoin(substCteRef(l, m), substCteRef(rr, m), jt, c2, w)
    case TRSubquery(q) => TRSubquery(substCtes(q, m))
    // an inner query's recursive table: outer names are in scope inside
    // its base/step, EXCEPT the table's own name (the self-reference)
    case TRRecursive(n, b, st, all) =>
      val m2 = m - n.toLowerCase
      TRRecursive(n, substCtes(b, m2), substCtes(st, m2), all)
    case other => other
  }

  private def substCteExpr(e: Expr, m: Map[String, TableRef]): Expr =
    Translate.rewriteExpr(e) {
      case InSub(x, q, n) => InSub(substCteExpr(x, m), substCtes(q, m), n)
      case ExistsSub(q) => ExistsSub(substCtes(q, m))
      case ScalarSub(q) => ScalarSub(substCtes(q, m))
    }

  /** TOTAL references to `name` anywhere in the query — FROM trees,
    * nested FROM-subqueries, and expression subqueries (IN/EXISTS/scalar).
    * A nested recursive table of the same name shadows it (scope ends). */
  private[sql] def totalSelfRefs(q: Query, name: String): Int = {
    def refR(r: TableRef): Int = r match {
      case TRStream(n) => if (n.equalsIgnoreCase(name)) 1 else 0
      case TRAlias(i, _) => refR(i)
      case TRWindowed(i, _) => refR(i)
      case TRFlatten(i, e, _) => refR(i) + refE(e)
      case TRJoin(l, rr, _, c, _) =>
        refR(l) + refR(rr) + (c match { case On(e) => refE(e); case _ => 0 })
      case TRSubquery(sub) => totalSelfRefs(sub, name)
      case TRRecursive(n2, b, st, _) =>
        if (n2.equalsIgnoreCase(name)) 0 // shadowed scope
        else totalSelfRefs(b, name) + totalSelfRefs(st, name)
    }
    def refE(e: Expr): Int = {
      var n = 0
      Translate.rewriteExpr(e) {
        case is @ InSub(x, sub, _) =>
          n += totalSelfRefs(sub, name) + refE(x); is
        case ex @ ExistsSub(sub) => n += totalSelfRefs(sub, name); ex
        case sc @ ScalarSub(sub) => n += totalSelfRefs(sub, name); sc
      }
      n
    }
    q match {
      case s: Select =>
        refR(s.from) +
          (s.items.flatMap {
            case ItemExpr(e, _) => Seq(refE(e))
            case ItemWildcard(_, _, rep) => rep.map(p => refE(p._1))
          } ++
            s.where.map(refE) ++ s.having.map(refE) ++
            s.qualify.map(refE) ++ s.orderBy.map(o => refE(o.e))).sum
      case so: SetOp => totalSelfRefs(so.l, name) + totalSelfRefs(so.r, name)
    }
  }

  /** References to `name` DIRECTLY in a select's FROM tree (join chains,
    * aliases, windows — but not inside any subquery). */
  private def fromSelfRefs(s: Select, name: String): Int = {
    def refR(r: TableRef): Int = r match {
      case TRStream(n) => if (n.equalsIgnoreCase(name)) 1 else 0
      case TRAlias(i, _) => refR(i)
      case TRWindowed(i, _) => refR(i)
      case TRFlatten(i, _, _) => refR(i)
      case TRJoin(l, rr, _, _, _) => refR(l) + refR(rr)
      case _ => 0
    }
    refR(s.from)
  }

  // ---- lexer ---------------------------------------------------------------

  sealed trait Tok { def text: String }
  case class TIdent(text: String) extends Tok          // bare or "quoted" ident
  case class TNum(text: String) extends Tok
  case class TStr(text: String) extends Tok            // 'single quoted'
  case class TSym(text: String) extends Tok            // punctuation/operators
  case object TEnd extends Tok { val text = "<end>" }

  object Lexer {
    private val symbols = List("->>", "#>>", "<=", ">=", "<>", "->", "#>",
      "::", "(", ")", "{", "}", "[", "]", ",", ";", ".", "*", "+", "-", "=",
      "<", ">", ":", "/", "%")

    def tokenize(s: String): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < s.length) {
        val c = s(i)
        if (c.isWhitespace) i += 1
        else if (c == '/' && i + 1 < s.length && s(i + 1) == '/') {
          while (i < s.length && s(i) != '\n') i += 1
        } else if (c == '-' && i + 1 < s.length && s(i + 1) == '-') {
          // standard SQL line comment (extension; the reference lexer has
          // only //-style). `--` is never subtraction-of-negation in SQL.
          while (i < s.length && s(i) != '\n') i += 1
        } else if (c == '/' && i + 1 < s.length && s(i + 1) == '*') {
          i = s.indexOf("*/", i) match { case -1 => s.length; case j => j + 2 }
        } else if (c == '\'') {
          // standard SQL '' escape: a doubled quote inside a literal is a
          // single quote character, not close-then-reopen
          val sb = new StringBuilder
          var j = i + 1
          var done = false
          while (!done) {
            require(j < s.length, s"unterminated string at $i")
            if (s(j) == '\'') {
              if (j + 1 < s.length && s(j + 1) == '\'') { sb += '\''; j += 2 }
              else { done = true; j += 1 }
            } else { sb += s(j); j += 1 }
          }
          out += TStr(sb.toString); i = j
        } else if (c == '"') {
          val j = s.indexOf('"', i + 1)
          require(j >= 0, s"unterminated quoted ident at $i")
          out += TIdent(s.substring(i + 1, j)); i = j + 1
        } else if (c.isDigit) {
          val start = i
          while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
          // trailing '.' belongs to qualified refs, not numbers
          if (s.substring(start, i).endsWith(".")) i -= 1
          out += TNum(s.substring(start, i))
        } else if (c.isLetter || c == '_') {
          val start = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          out += TIdent(s.substring(start, i))
        } else symbols.find(sym => s.startsWith(sym, i)) match {
          case Some(sym) => out += TSym(sym); i += sym.length
          case None => throw new IllegalArgumentException(s"bad char '$c' at $i")
        }
      }
      out += TEnd
      out.result()
    }
  }

  private val aggNames = Set("COUNT", "SUM", "MIN", "MAX", "AVG", "TOPK",
    "TOPKDISTINCT", "APPROX_COUNT_DISTINCT", "PERCENTILE",
    "APPROX_PERCENTILE", "MEDIAN", "GROUPING_ID", "GROUPING", "STRING_AGG",
    "ARRAY_AGG")
  private val unaryFns = Set("SIN", "SINH", "ASIN", "ASINH", "COS", "COSH",
    "ACOS", "ACOSH", "TAN", "TANH", "ATAN", "ATANH", "ABS", "CEIL", "FLOOR",
    "ROUND", "SIGN", "SQRT", "LOG", "LOG2", "LOG10", "EXP", "IS_INT",
    "IS_FLOAT", "IS_NUM", "IS_BOOL", "IS_STR", "IS_ARRAY", "IS_DATE",
    "IS_TIME", "TO_STR", "TO_LOWER", "TO_UPPER", "TRIM", "LEFT_TRIM",
    "RIGHT_TRIM", "REVERSE", "STRLEN", "ARRAY_DISTINCT", "ARRAY_LENGTH",
    "ARRAY_MAX", "ARRAY_MIN", "ARRAY_SORT")
  private val binaryFns = Set("IFNULL", "NULLIF", "DATETOSTRING",
    "STRINGTODATE", "SPLIT", "CHUNKSOF", "TAKE", "TAKEEND", "DROP", "DROPEND",
    "ARRAY_CONTAIN", "ARRAY_EXCEPT", "ARRAY_INTERSECT", "ARRAY_REMOVE",
    "ARRAY_UNION", "ARRAY_JOIN", "LEVENSHTEIN", "DATEDIFF")
  /** LLM-pipeline primitives (SURVEY §6) surfaced in the dialect — same
    * formulas as the Column API / SQL-UDF frontends (PipelineFunctions /
    * SqlFunctions), so the shared DuckDB oracles apply. */
  private val pipelineFns = Set("TOKENS", "WORD_HASHES", "SHINGLES3",
    "MINHASH", "JACCARD", "SIMHASH16", "HAMMING", "FINGERPRINT",
    "STOPWORD_RATIO", "QUALITY_SCORE", "COSINE", "BUCKET",
    // similarity/ANN pack (embedding-vector primitives)
    "L2NORMALIZE", "DOT", "LSH16", "QUANTIZE_INT8", "SHIFTRIGHT")
  private val intervalUnits = Set("SECOND", "MINUTE", "HOUR", "DAY", "MONTH", "YEAR")

  /** Ranking/analytic functions valid ONLY with an OVER clause (SURVEY
    * §2.8 extension — the reference grammar has no OVER at all). Aggregate
    * names also accept OVER, becoming running/windowed aggregates. */
  private val winOnlyFns = Set("ROW_NUMBER", "RANK", "DENSE_RANK", "NTILE",
    "LAG", "LEAD", "FIRST_VALUE", "LAST_VALUE",
    "NTH_VALUE", "PERCENT_RANK", "CUME_DIST")

  class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def kwPeek: String = peek match {
      case TIdent(t) => t.toUpperCase; case t => t.text
    }
    private def isKw(kw: String): Boolean = kwPeek == kw
    private def accept(kw: String): Boolean =
      if (isKw(kw)) { pos += 1; true } else false
    private def expect(kw: String): Unit =
      require(accept(kw), s"expected $kw, got '${peek.text}' at token $pos")
    private def ident(): String = next() match {
      case TIdent(t) => t
      case t => throw new IllegalArgumentException(s"expected identifier, got '${t.text}'")
    }
    /** `NULLS FIRST | NULLS LAST` after ASC/DESC (standard SQL;
      * extension). None = unwritten → the dialect's DuckDB default,
      * nulls last in both directions. */
    private def nullsOrder(): Option[Boolean] =
      if (accept("NULLS")) {
        if (accept("FIRST")) Some(false)
        else { expect("LAST"); Some(true) }
      } else None

    def fullExpr(): Expr = { val e = expr(); require(peek == TEnd, s"trailing input at '${peek.text}'"); e }

    // ---- statements --------------------------------------------------------

    def statement(): Stmt = {
      val s = kwPeek match {
        case "SELECT" | "(" | "WITH" => SelectStmt(query())
        case "CREATE" => create()
        case "INSERT" => insert()
        case "SHOW" => next(); val w = kwPeek; next(); Show(w)
        case "DROP" =>
          next(); val what = kwPeek; next(); val n = ident()
          val ifEx = accept("IF") && { expect("EXISTS"); true }
          DropStmt(what, n, ifEx)
        case "TERMINATE" => next(); expect("QUERY"); Terminate(ident())
        case "PAUSE" =>
          next()
          if (accept("CONNECTOR")) PauseConnector(ident())
          else { expect("QUERY"); PauseStmt(ident()) }
        case "RESUME" =>
          next()
          if (accept("CONNECTOR")) ResumeConnector(ident())
          else { expect("QUERY"); ResumeStmt(ident()) }
        case "EXPLAIN" => next(); Explain(statementNoSemi())
        case k => throw new IllegalArgumentException(s"unexpected statement start: $k")
      }
      expect(";") // statements are ';'-terminated (SQL-v1.cf:30-40)
      require(peek == TEnd, s"trailing input at '${peek.text}'")
      s
    }

    private def statementNoSemi(): Stmt = kwPeek match {
      case "SELECT" | "(" | "WITH" => SelectStmt(query())
      case "CREATE" => create()
      case k => throw new IllegalArgumentException(s"EXPLAIN does not support: $k")
    }

    private def create(): Stmt = {
      expect("CREATE")
      kwPeek match {
        case "VIEW" => next(); val n = ident(); expect("AS"); CreateView(n, query())
        case "STREAM" =>
          next(); val n = ident()
          if (accept("AS")) {
            val sel = query()
            CreateStreamAs(n, sel, if (isKw("WITH")) options() else Map.empty)
          } else if (isKw("(")) {
            expect("(")
            val cols = Seq.newBuilder[(String, SqlType)]
            do cols += ((ident(), dataType())) while (accept(","))
            expect(")")
            CreateStream(n, cols.result(), if (isKw("WITH")) options() else Map.empty)
          } else CreateStream(n, Nil, if (isKw("WITH")) options() else Map.empty)
        case kind @ ("SOURCE" | "SINK") =>
          next(); expect("CONNECTOR")
          val n = ident()
          expect(if (kind == "SOURCE") "FROM" else "TO")
          val target = ident()
          val ifNot = accept("IF") && { expect("NOT"); expect("EXIST"); true }
          val opts = if (isKw("WITH")) options() else Map.empty[String, Expr]
          CreateConnector(kind, n, target, ifNot, opts)
        case k => throw new IllegalArgumentException(s"CREATE $k not supported")
      }
    }

    private def options(): Map[String, Expr] = {
      expect("WITH"); expect("(")
      val m = Map.newBuilder[String, Expr]
      do {
        val k = ident().toUpperCase; expect("=")
        m += k -> (if (isKw("INTERVAL")) intervalLit() else expr())
      } while (accept(","))
      expect(")")
      m.result()
    }

    private def insert(): Stmt = {
      expect("INSERT"); expect("INTO")
      val n = ident()
      if (accept("(")) {
        val cols = Seq.newBuilder[String]
        do cols += ident() while (accept(","))
        expect(")"); expect("VALUES"); expect("(")
        val vals = Seq.newBuilder[Expr]
        do vals += expr() while (accept(","))
        expect(")")
        InsertValues(n, cols.result(), vals.result())
      } else if (accept("VALUES")) {
        // raw/json payload: a string literal, optionally cast to JSONB
        // (json) or BYTEA (raw) — both `CAST(… AS t)` and `… :: t` forms
        // (InsertRawOrJson, SQL-v1.cf:77)
        expr() match {
          case StrLit(s) => InsertJson(n, s)
          case Cast(StrLit(s), TJson) => InsertJson(n, s)
          case Cast(StrLit(s), TBytea) => InsertRaw(n, s)
          case other => throw new IllegalArgumentException(
            s"INSERT VALUES expects a raw/json string, got $other")
        }
      } else InsertSel(n, query())
    }

    /** Query body: SELECT cores chained by set operations (dialect
      * extension, SURVEY §2.7 — the reference grammar has no UNION/
      * INTERSECT/EXCEPT). INTERSECT binds tighter than UNION/EXCEPT
      * (standard precedence); trailing ORDER BY / LIMIT / EMIT CHANGES
      * bind to the WHOLE tree, not the last branch. */
    def query(): Query = {
      // WITH name AS (query) [, …] — common table expressions (dialect
      // EXTENSION; DuckDB-compatible). Pure sugar: each reference expands
      // to a FROM-subquery at parse time, so Validate/TypeCheck/Translate
      // see the already-desugared tree (Catalyst dedups the repeated
      // subtrees via exchange/subquery reuse where profitable). A CTE may
      // reference earlier CTEs; inner queries' own WITH clauses resolve
      // first (natural shadowing), and CTE names shadow real tables.
      val (recursive, ctes: Seq[(String, Query)]) =
        if (isKw("WITH")) {
          next()
          // WITH RECURSIVE (extension): the keyword marks the clause;
          // a CTE whose body is `base UNION [ALL] step-referencing-self`
          // becomes an iterative fixpoint table (TRRecursive)
          val rec = accept("RECURSIVE")
          val b = Seq.newBuilder[(String, Query)]
          do {
            val n = ident(); expect("AS"); expect("(")
            val cq = query(); expect(")")
            b += ((n, cq))
          } while (accept(","))
          (rec, b.result())
        } else (false, Nil)
      var l = intersectChain()
      var done = false
      while (!done) kwPeek match {
        case op @ ("UNION" | "EXCEPT") =>
          next(); val all = accept("ALL")
          l = SetOp(op.toLowerCase, all, l, intersectChain())
        case _ => done = true
      }
      val (ob, lim, off, emit) = trailing()
      // a solely-parenthesized query keeps its own trailing clauses; outer
      // clauses may not REPLACE inner ones (standard SQL would apply them
      // over the inner result — direct users through a FROM-subquery
      // rather than silently dropping either set)
      val q0 =
        if (ob.isEmpty && lim.isEmpty && off.isEmpty && !emit) l
        else {
          require(l.orderBy.isEmpty && l.limit.isEmpty && l.offset.isEmpty &&
            !l.emitChanges,
            "both the parenthesized query and the outer query carry " +
              "ORDER BY/LIMIT/EMIT CHANGES; put the inner query in a " +
              "FROM-subquery instead")
          l match {
            case s: Select =>
              s.copy(orderBy = ob, limit = lim, offset = off, emitChanges = emit)
            case so: SetOp =>
              so.copy(orderBy = ob, limit = lim, offset = off, emitChanges = emit)
          }
        }
      val q1 = expandOrderAll(q0)
      if (ctes.isEmpty) q1
      else {
        // earlier CTEs substitute into later CTE bodies, then all into the
        // main query — left-to-right scope, standard SQL
        val resolved = ctes.foldLeft(Map.empty[String, TableRef]) {
          case (acc, (n, cq)) =>
            val body = Parser.substCtes(cq, acc)
            val ref: TableRef = body match {
              case SetOp("union", all, lq, rq, Nil, None, false, None)
                  if recursive && Parser.totalSelfRefs(rq, n) > 0 =>
                require(Parser.totalSelfRefs(lq, n) == 0,
                  s"WITH RECURSIVE $n: the recursive reference must be in " +
                    "the SECOND union branch (base UNION [ALL] step)")
                // semi-naive evaluation binds the self-reference to the
                // previous round's frontier. Multiple references, or one
                // hidden inside a subquery, or an aggregate over the
                // frontier would all be SILENTLY WRONG under that binding
                // (non-linear / non-monotone recursion) — reject loudly,
                // the Postgres rule.
                val step = rq match {
                  case sel: Select => sel
                  case _ => throw new IllegalArgumentException(
                    s"WITH RECURSIVE $n: the step must be a plain SELECT " +
                      "(no nested set operations around the self-reference)")
                }
                require(Parser.totalSelfRefs(step, n) == 1 &&
                  Parser.fromSelfRefs(step, n) == 1,
                  s"WITH RECURSIVE $n: the step must reference $n exactly " +
                    "once, directly in its FROM clause (not inside a " +
                    "subquery) — linear recursion only")
                require(step.groupBy.isEmpty && !step.multiLevel &&
                  step.having.isEmpty &&
                  step.items.forall {
                    case ItemExpr(e, _) => Translate.collectAggs(e).isEmpty
                    case _ => true
                  },
                  s"WITH RECURSIVE $n: the step must not aggregate — an " +
                    "aggregate over the frontier is non-monotone and would " +
                    "be silently wrong under semi-naive evaluation")
                TRRecursive(n, lq, step, all)
              case other =>
                require(!recursive || Parser.totalSelfRefs(other, n) == 0,
                  s"WITH RECURSIVE $n: a self-referencing CTE body must " +
                    "be exactly `base UNION [ALL] step` with no trailing " +
                    "ORDER BY/LIMIT")
                TRSubquery(other)
            }
            acc + (n.toLowerCase -> ref)
        }
        Parser.substCtes(q1, resolved)
      }
    }

    /** Expand the ORDER BY ALL sentinel into the query's output columns
      * (left operand's names for set ops, standard SQL). */
    private def expandOrderAll(q: Query): Query = {
      def outNames(q: Query): Seq[String] = q match {
        case s: Select => s.items.map {
          case ItemExpr(e, a) => a.getOrElse(Translate.exprName(e))
          case _: ItemWildcard => throw new IllegalArgumentException(
            "ORDER BY ALL cannot be combined with * (the column list is " +
              "not statically known) — list the columns")
        }
        case so: SetOp => outNames(so.l)
      }
      def isAll(ob: Seq[OrderItem]): Option[(Boolean, Option[Boolean])] =
        ob match {
          case Seq(OrderItem(ColRef(None, "__graft_order_all"), d, nl)) =>
            Some((d, nl))
          case _ => None
        }
      q match {
        case s: Select => isAll(s.orderBy).fold(q) { case (d, nl) => s.copy(
          orderBy = outNames(s).map(n => OrderItem(ColRef(None, n), d, nl))) }
        case so: SetOp => isAll(so.orderBy).fold(q) { case (d, nl) => so.copy(
          orderBy = outNames(so).map(n => OrderItem(ColRef(None, n), d, nl))) }
      }
    }

    private def intersectChain(): Query = {
      var l = queryBranch()
      while (isKw("INTERSECT")) {
        next(); val all = accept("ALL")
        l = SetOp("intersect", all, l, queryBranch())
      }
      l
    }

    /** One set-op operand: a bare SELECT core, or a parenthesized query
      * (which may carry branch-level ORDER BY/LIMIT, standard SQL). */
    private def queryBranch(): Query =
      if (isKw("(")) { next(); val q = query(); expect(")"); q }
      else selectCore()

    private def selectCore(): Select = {
      expect("SELECT")
      // SELECT DISTINCT / DISTINCT ON (k1, …) — DuckDB-compatible
      // extensions (batch/pull only, Validate). DISTINCT ON keeps the
      // first row per key group in ORDER BY order.
      val (distinct, distinctOn) =
        if (accept("DISTINCT")) {
          if (accept("ON")) {
            expect("(")
            val ks = Seq.newBuilder[ColRef]
            do ks += colName() while (accept(","))
            expect(")")
            (false, ks.result())
          } else (true, Nil)
        } else (false, Nil)
      val items = Seq.newBuilder[SelectItem]
      do items += selectItem() while (accept(","))
      val itemList = items.result()
      expect("FROM")
      val from = tableRef()
      val where = if (accept("WHERE")) Some(expr()) else None
      // GROUP BY [ROLLUP|CUBE (c1, c2) | GROUPING SETS ((…), …) | c1, c2]
      // — the multi-level-aggregation extensions (batch/pull only,
      // Validate). For GROUPING SETS, groupBy is the ordered union of all
      // set columns (standard SQL output shape).
      val (groupBy, groupMode, groupSets) =
        if (accept("GROUP")) { expect("BY")
          def parenCols(): Seq[ColRef] = {
            expect("(")
            val cols = Seq.newBuilder[ColRef]
            do cols += colName() while (accept(","))
            expect(")")
            cols.result()
          }
          kwPeek match {
            // GROUP BY ALL (extension; DuckDB-compatible): every select
            // item that is not an aggregate becomes a grouping key.
            // Restricted to bare column items — group a computed
            // expression through a FROM-subquery alias instead.
            case "ALL" =>
              next()
              val keys = itemList.map {
                case ItemExpr(c: ColRef, _) => Some(c)
                case ItemExpr(e, _) if Translate.collectAggs(e).nonEmpty =>
                  None // aggregate item — not a key
                case ItemExpr(e, _) => throw new IllegalArgumentException(
                  "GROUP BY ALL requires non-aggregate select items to be " +
                    s"bare column refs; alias '${Translate.exprName(e)}' in " +
                    "a FROM-subquery and group the alias")
                case _: ItemWildcard => throw new IllegalArgumentException(
                  "GROUP BY ALL cannot be combined with * — list the columns")
              }.flatten
              require(keys.nonEmpty,
                "GROUP BY ALL found no non-aggregate select items to group by")
              (keys, "plain", Nil)
            case "ROLLUP" => next(); (parenCols(), "rollup", Nil)
            case "CUBE" => next(); (parenCols(), "cube", Nil)
            case "GROUPING" =>
              next(); expect("SETS"); expect("(")
              val sets = Seq.newBuilder[Seq[ColRef]]
              do {
                expect("(")
                val cs = Seq.newBuilder[ColRef]
                if (!isKw(")")) do cs += colName() while (accept(","))
                expect(")")
                sets += cs.result()
              } while (accept(","))
              expect(")")
              val ss = sets.result()
              val union = ss.flatten.foldLeft(Vector.empty[ColRef])(
                (acc, c) => if (acc.contains(c)) acc else acc :+ c)
              (union.toSeq, "sets", ss)
            case _ =>
              val cols = Seq.newBuilder[ColRef]
              do cols += colName() while (accept(","))
              (cols.result(), "plain", Nil)
          }
        } else (Nil, "plain", Nil)
      val having = if (accept("HAVING")) Some(expr()) else None
      // WINDOW clause (standard SQL; extension): named window specs,
      // referenced as `fn(...) OVER name` (bare, full copy) or refined
      // as `fn(...) OVER (name …)` in this SELECT's list/QUALIFY.
      // Resolution happens HERE, at parse time, so scoping is per-SELECT
      // for free (each subquery parses and resolves its own clause).
      // Chaining `WINDOW w2 AS (w1 …)` resolves in definition order: a
      // definition may only reference a window defined EARLIER in the
      // clause (the standard's rule — which also makes cycles
      // unrepresentable).
      val winDefs: Map[String, WinFn] =
        if (accept("WINDOW")) {
          val m = scala.collection.mutable.LinkedHashMap.empty[String, WinFn]
          do {
            val n = ident().toLowerCase
            expect("AS"); expect("(")
            val spec0 = windowSpecBody()
            expect(")")
            if (m.contains(n)) throw new IllegalArgumentException(
              s"duplicate WINDOW name $n")
            val spec = spec0.windowRef match {
              case Some(b) => mergeWindow(spec0, m.getOrElse(b,
                throw new IllegalArgumentException(
                  s"unknown window name '$b' in WINDOW $n — a definition " +
                    "can only reference a window defined earlier in the " +
                    "same WINDOW clause")), b)
              case None => spec0
            }
            m += n -> spec
          } while (accept(","))
          m.toMap
        } else Map.empty
      // QUALIFY — filter on window-function results (DuckDB-compatible
      // extension; batch/pull only, Validate)
      val qualify = if (accept("QUALIFY")) Some(expr()) else None
      def resolveW(e: Expr): Expr = Translate.rewriteExpr(e) {
        case w: WinFn if w.windowRef.isDefined =>
          val n = w.windowRef.get
          val d = winDefs.getOrElse(n, throw new IllegalArgumentException(
            s"unknown window name '$n' — define it in this SELECT's " +
              "WINDOW clause"))
          // bare `OVER name` copies the whole spec (frame included);
          // `OVER (name …)` merges under the refinement rules
          if (w.refines) mergeWindow(w, d, n)
          else w.copy(partitionBy = d.partitionBy, orderBy = d.orderBy,
            frame = d.frame, rangeFrame = d.rangeFrame,
            groupsFrame = d.groupsFrame, exclude = d.exclude,
            windowRef = None)
      }
      val itemsR = itemList.map {
        case ItemExpr(e, a) => ItemExpr(resolveW(e), a)
        case w @ ItemWildcard(_, _, rep) =>
          w.copy(replace = rep.map { case (e, n) => (resolveW(e), n) })
      }
      Select(itemsR, from, where, groupBy, having,
        groupMode = groupMode, groupSets = groupSets,
        qualify = qualify.map(resolveW), distinct = distinct,
        distinctOn = distinctOn)
    }

    /** Trailing clauses shared by select() and query(): ORDER BY / LIMIT
      * (dialect extension — no production in SQL-v1.cf, SURVEY §2.7;
      * batch/pull only, Validate rejects continuous forms) and
      * EMIT CHANGES. */
    private def trailing(): (Seq[OrderItem], Option[Long], Option[Long], Boolean) = {
      val orderBy =
        if (accept("ORDER")) { expect("BY")
          // ORDER BY ALL [DESC] (extension; DuckDB-compatible): order by
          // every output column left-to-right — a sentinel here, expanded
          // in query() where the select items are known
          if (accept("ALL")) {
            val desc = if (accept("DESC")) true else { accept("ASC"); false }
            Seq(OrderItem(ColRef(None, "__graft_order_all"), desc, nullsOrder()))
          } else {
          val os = Seq.newBuilder[OrderItem]
          do {
            val e = expr()
            val desc = if (accept("DESC")) true else { accept("ASC"); false }
            os += OrderItem(e, desc, nullsOrder())
          } while (accept(","))
          os.result()
          }
        } else Nil
      val limitN = if (accept("LIMIT")) Some(intTok()) else None
      // LIMIT n OFFSET m, or a standalone OFFSET m (both standard forms)
      val offsetN = if (accept("OFFSET")) Some(intTok()) else None
      val emit = accept("EMIT") && { expect("CHANGES"); true }
      (orderBy, limitN, offsetN, emit)
    }

    private def selectItem(): SelectItem =
      if (accept("*")) {
        // * EXCLUDE (c1, …) / * REPLACE (expr AS c, …) — DuckDB-style
        // star modifiers, either order, at most once each
        var ex: Seq[String] = Nil
        var rep: Seq[(Expr, String)] = Nil
        var go = true
        while (go) kwPeek match {
          case "EXCLUDE" if ex.isEmpty =>
            next(); expect("(")
            val b = Seq.newBuilder[String]
            do b += ident() while (accept(","))
            expect(")"); ex = b.result()
          case "REPLACE" if rep.isEmpty =>
            next(); expect("(")
            val b = Seq.newBuilder[(Expr, String)]
            do {
              val e = expr(); expect("AS"); b += ((e, ident()))
            } while (accept(","))
            expect(")"); rep = b.result()
          case _ => go = false
        }
        ItemWildcard(None, ex, rep)
      }
      else {
        // `s.*` qualified wildcard vs expression
        val save = pos
        peek match {
          case TIdent(q) if toks(pos + 1) == TSym(".") && toks(pos + 2) == TSym("*") =>
            pos += 3; return ItemWildcard(Some(q))
          case _ => pos = save
        }
        val e = expr()
        ItemExpr(e, if (accept("AS")) Some(ident()) else None)
      }

    private def colName(): ColRef = {
      val a = ident()
      if (accept(".")) ColRef(Some(a), ident()) else ColRef(None, a)
    }

    // ---- FROM / joins (SQL-v1.cf:118-146) ----------------------------------

    private def tableRef(): TableRef = {
      var left = tableRefUnit()
      while (isJoinStart) {
        // ASOF [LEFT] JOIN — point-in-time join (extension; DuckDB-style
        // syntax). ON must be equalities plus ONE `left_ts >= right_ts`
        // inequality; batch/pull only (Validate).
        if (accept("ASOF")) {
          val jt = if (accept("LEFT")) { accept("OUTER"); "asof_left" } else "asof"
          expect("JOIN")
          val right = tableRefUnit()
          expect("ON")
          left = TRJoin(left, right, jt, On(expr()), None)
        } else {
        var joinType = "inner"; var natural = false; var cross = false
        if (accept("NATURAL")) natural = true
        kwPeek match {
          case "CROSS" => next(); cross = true
          case "INNER" => next()
          case "LEFT" => next(); accept("OUTER"); joinType = "left"
          case "RIGHT" => next(); accept("OUTER"); joinType = "right"
          case "FULL" => next(); accept("OUTER"); joinType = "full"
          case _ =>
        }
        expect("JOIN")
        val right = tableRefUnit()
        val cond: JoinCond =
          if (cross) CrossC
          else if (natural) Natural
          else if (accept("ON")) On(expr())
          else if (accept("USING")) {
            expect("(")
            val cols = Seq.newBuilder[String]
            do cols += ident() while (accept(","))
            expect(")")
            Using(cols.result())
          } else Natural
        // WITHIN optional (extension): absent = plain batch join; the
        // translator rejects stream inputs without one
        val within = if (accept("WITHIN")) {
          expect("(")
          val w = intervalLit()
          expect(")")
          Some(w)
        } else None
        left = TRJoin(left, right, joinType, cond, within)
        }
      }
      left
    }

    private def isJoinStart: Boolean =
      Set("JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "NATURAL", "ASOF")
        .contains(kwPeek)

    private def tableRefUnit(): TableRef = {
      val base = kwPeek match {
        case "(" =>
          // FROM-clause subquery (TableRefSubquery, SQL-v1.cf:135 — parsed
          // but rejected by the reference's refiner AST.hs:593; we support it)
          next(); val sub = query(); expect(")")
          TRSubquery(sub)
        case "TUMBLE" =>
          next(); expect("(")
          val in = tableRefUnit(); expect(",")
          val i = intervalLit(); expect(")")
          TRWindowed(in, Tumble(i))
        case "HOP" =>
          next(); expect("(")
          val in = tableRefUnit(); expect(",")
          val s = intervalLit(); expect(",")
          val a = intervalLit(); expect(")")
          TRWindowed(in, Hop(s, a))
        case "SESSION" =>
          next(); expect("(")
          val in = tableRefUnit(); expect(",")
          val g = intervalLit(); expect(")")
          TRWindowed(in, Session(g))
        case "FLATTEN" =>
          next(); expect("(")
          val in = tableRefUnit(); expect(",")
          val e = expr(); expect("AS"); val a = ident(); expect(")")
          TRFlatten(in, e, a)
        case _ => TRStream(ident())
      }
      if (accept("AS")) TRAlias(base, ident()) else base
    }

    private def intervalLit(): IntervalLit = {
      expect("INTERVAL")
      val n = next() match {
        case TNum(t) => longLit(t)
        case t => throw new IllegalArgumentException(s"expected integer, got '${t.text}'")
      }
      val u = kwPeek
      require(intervalUnits.contains(u), s"bad interval unit $u")
      next()
      IntervalLit(n, u)
    }

    // ---- expressions (precedence ladder) -----------------------------------

    def expr(): Expr = orExpr()

    private def orExpr(): Expr = {
      var l = andExpr()
      while (accept("OR")) l = Bin("OR", l, andExpr())
      l
    }
    private def andExpr(): Expr = {
      var l = notExpr()
      while (accept("AND")) l = Bin("AND", l, notExpr())
      l
    }
    private def notExpr(): Expr =
      if (accept("NOT")) Not(notExpr()) else cmpExpr()

    private def cmpExpr(): Expr = {
      var l = betweenExpr()
      var done = false
      while (!done) kwPeek match {
        case op @ ("=" | "<>" | "<" | ">" | "<=" | ">=") =>
          next(); l = Bin(op, l, betweenExpr())
        case _ => done = true
      }
      l
    }

    private def betweenExpr(): Expr = {
      val e = addExpr()
      val not = isKw("NOT") &&
        (toks(pos + 1).text.equalsIgnoreCase("BETWEEN") ||
          toks(pos + 1).text.equalsIgnoreCase("IN")) && { next(); true }
      if (accept("BETWEEN")) {
        val sym = accept("SYMMETRIC")
        val lo = addExpr(); expect("AND"); val hi = addExpr()
        Between(e, lo, hi, not, sym)
      } else if (accept("IN")) {
        // [NOT] IN — subquery or value-list membership (extension;
        // SQL-v1.cf has no IN production)
        expect("(")
        if (isKw("SELECT")) {
          val q = query(); expect(")"); InSub(e, q, not)
        } else {
          val items = Seq.newBuilder[Expr]
          do items += expr() while (accept(","))
          expect(")")
          InList(e, items.result(), not)
        }
      } else if (isKw("IS") && !not) {
        // `e IS [NOT] NULL` (extension — essential next to the dialect's
        // LEFT/FULL joins; SQL-v1.cf has no IS NULL production, only the
        // dynamic IS_* type predicates)
        next()
        val neg = accept("NOT")
        expect("NULL")
        if (neg) Not(Fn("IS_NULL", Seq(e))) else Fn("IS_NULL", Seq(e))
      } else { require(!not, "dangling NOT"); e }
    }

    private def addExpr(): Expr = {
      var l = mulExpr()
      var done = false
      while (!done) kwPeek match {
        case op @ ("+" | "-") => next(); l = Bin(op, l, mulExpr())
        case _ => done = true
      }
      l
    }
    private def mulExpr(): Expr = {
      var l = jsonExpr()
      var done = false
      // `/` and `%` are dialect EXTENSIONS: the reference grammar stops
      // at OpAdd|OpSub|OpMul (AST.hs:239) — division/modulo exist there
      // only inside builtin functions. Standard left associativity, same
      // tier as `*`.
      while (!done) kwPeek match {
        case op @ ("*" | "/" | "%") => next(); l = Bin(op, l, jsonExpr())
        case _ => done = true
      }
      l
    }

    /** JSON access ops (SQL-v1.cf:287-290); grammar places them tighter than
      * comparisons, looser than postfix. */
    private def jsonExpr(): Expr = {
      var l = postfixExpr()
      var done = false
      while (!done) kwPeek match {
        case op @ ("->" | "->>" | "#>" | "#>>") =>
          next(); l = Bin(op, l, postfixExpr())
        case _ => done = true
      }
      l
    }

    /** Array access + `::` cast postfix. */
    private def postfixExpr(): Expr = {
      var e = atom()
      var done = false
      while (!done) {
        if (accept("[")) {
          if (accept(":")) {
            val j = intTok(); expect("]")
            e = ArrSlice(e, None, Some(j))
          } else {
            val i = intTok()
            if (accept(":")) {
              if (accept("]")) e = ArrSlice(e, Some(i), None)
              else { val j = intTok(); expect("]"); e = ArrSlice(e, Some(i), Some(j)) }
            } else { expect("]"); e = ArrIndex(e, i) }
          }
        } else if (accept("::")) e = Cast(e, dataType())
        else done = true
      }
      e
    }

    private def intTok(): Long = next() match {
      case TNum(t) => longLit(t)
      case t => throw new IllegalArgumentException(s"expected integer, got '${t.text}'")
    }

    // Numeric-literal parses guarded into the dialect's own error class
    // (r13 RejectFuzz audit): the lexer's digit loop consumes dots too, so
    // '1.2.3' reaches toDouble, and a 20+-digit integer reaches toLong —
    // both previously escaped as raw NumberFormatException instead of a
    // messaged rejection.
    private def longLit(t: String): Long =
      try t.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"integer literal '$t' out of 64-bit range") }
    private def numLit(t: String): Expr =
      if (t.contains('.'))
        NumLit(try t.toDouble catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(s"bad numeric literal '$t'") })
      else IntLit(longLit(t))

    private def atom(): Expr = peek match {
      case TNum(t) =>
        next(); numLit(t)
      case TStr(s) => next(); StrLit(s)
      case TSym("(") =>
        next()
        // `(SELECT …)` in expression position is a scalar subquery
        // (extension — the reference comments these out, AST.hs:339)
        if (isKw("SELECT")) { val q = query(); expect(")"); ScalarSub(q) }
        else { val e = expr(); expect(")"); e }
      case TSym("{") =>
        next()
        val items = Seq.newBuilder[Expr]
        if (!isKw("}")) do items += expr() while (accept(","))
        expect("}")
        ArrLit(items.result())
      case TSym("+") => next(); atom()
      case TSym("-") =>
        next()
        atom() match {
          case IntLit(v) => IntLit(-v)
          case NumLit(v) => NumLit(-v)
          case e => Bin("-", IntLit(0), e)
        }
      case TIdent(_) => identAtom()
      case t => throw new IllegalArgumentException(s"unexpected token '${t.text}'")
    }

    private def identAtom(): Expr = {
      val kw = kwPeek
      kw match {
        case "NULL" => next(); return NullLit
        case "TRUE" => next(); return BoolLit(true)
        case "FALSE" => next(); return BoolLit(false)
        case "DATE" if toks(pos + 1).isInstanceOf[TStr] =>
          next(); return DateLit(next().text)
        case "TIME" if toks(pos + 1).isInstanceOf[TStr] =>
          next(); return TimeLit(next().text)
        case "TIMESTAMP" if toks(pos + 1).isInstanceOf[TStr] =>
          next(); return TimestampLit(next().text)
        case "INTERVAL" => return intervalLit()
        case "CAST" =>
          next(); expect("(")
          val e = expr(); expect("AS"); val dt = dataType(); expect(")")
          return Cast(e, dt)
        case "EXISTS" if toks(pos + 1) == TSym("(") =>
          next(); next()
          val q = query(); expect(")")
          return ExistsSub(q)
        case "CASE" =>
          next()
          // simple form carries an operand before the first WHEN
          val operand = if (!isKw("WHEN")) Some(expr()) else None
          val bs = Seq.newBuilder[(Expr, Expr)]
          while (accept("WHEN")) {
            val c = expr(); expect("THEN"); val r = expr(); bs += ((c, r))
          }
          val branches = bs.result()
          if (branches.isEmpty) throw new IllegalArgumentException(
            "CASE requires at least one WHEN … THEN … branch")
          val els = if (accept("ELSE")) Some(expr()) else None
          expect("END")
          return CaseWhen(operand, branches, els)
        case _ =>
      }
      if (winOnlyFns.contains(kw) && toks(pos + 1) == TSym("(")) {
        next(); next()
        val args = Seq.newBuilder[Expr]
        // a leading IGNORE/RESPECT NULLS (zero-arg fn) must not parse as
        // a column reference named "ignore"
        def atNullsClause: Boolean =
          (isKw("IGNORE") || isKw("RESPECT")) && (toks(pos + 1) match {
            case TIdent(t) => t.toUpperCase == "NULLS"
            case _ => false
          })
        if (!isKw(")") && !atNullsClause)
          do args += expr() while (accept(","))
        // IGNORE NULLS / RESPECT NULLS (standard SQL; DuckDB's
        // inside-the-parens placement): only the offset/value functions
        // have a null-skipping variant
        val ignoreNulls =
          if (accept("IGNORE")) { expect("NULLS"); true }
          else { if (accept("RESPECT")) expect("NULLS"); false }
        if (ignoreNulls && !Set("LAG", "LEAD", "FIRST_VALUE",
            "LAST_VALUE", "NTH_VALUE").contains(kw))
          throw new IllegalArgumentException(
            s"$kw does not accept IGNORE NULLS (only LAG/LEAD/" +
              "FIRST_VALUE/LAST_VALUE/NTH_VALUE do)")
        expect(")")
        if (!isKw("OVER")) throw new IllegalArgumentException(
          s"$kw requires an OVER (…) clause")
        return overClause(kw, args.result(), ignoreNulls)
      }
      if (aggNames.contains(kw) && toks(pos + 1) == TSym("(")) {
        next(); next()
        // `agg(…) FILTER (WHERE cond)` (extension; DuckDB-compatible):
        // desugared at parse time — the aggregated expression wraps in
        // CASE WHEN cond THEN e END, exact for null-skipping aggregates
        // (COUNT/SUM/MIN/MAX/AVG/TOPK/percentiles all skip NULLs), incl.
        // under DISTINCT and OVER. COUNT(*) FILTER counts matching rows.
        def filterClause(): Option[Expr] =
          if (accept("FILTER")) {
            expect("("); expect("WHERE"); val c = expr(); expect(")"); Some(c)
          } else None
        def wrap(e: Expr, f: Option[Expr]): Expr = f match {
          case Some(c) => CaseWhen(None, Seq((c, e)), None)
          case None => e
        }
        if (kw == "COUNT" && accept("*")) {
          expect(")")
          val f = filterClause()
          // COUNT(*) OVER (…) — running/windowed row count
          if (isKw("OVER")) return overClause("COUNT", Seq(wrap(IntLit(1), f)))
          return f match {
            case Some(_) => Agg("COUNT", Seq(wrap(IntLit(1), f)), star = false)
            case None => Agg("COUNT", Nil, star = true)
          }
        }
        // zero-arg: the ROLLUP level bitmask (last group col = LSB)
        if (kw == "GROUPING_ID") { expect(")"); return Agg("GROUPING_ID", Nil, star = false) }
        val dist = accept("DISTINCT") // COUNT/SUM(DISTINCT e) extension
        val args = Seq.newBuilder[Expr]
        do args += expr() while (accept(","))
        // STRING_AGG(e, sep ORDER BY k [DESC], ...) / ARRAY_AGG(e ORDER
        // BY k [DESC], ...) — ordered aggregates (extension). ORDER BY is
        // MANDATORY: unordered collection is nondeterministic, and
        // determinism is the engine's reproducibility contract (same
        // rule as DISTINCT ON).
        if (kw == "STRING_AGG" || kw == "ARRAY_AGG") {
          if (dist) throw new IllegalArgumentException(
            s"$kw(DISTINCT ...) is not supported")
          if (!accept("ORDER")) throw new IllegalArgumentException(
            s"$kw requires ORDER BY inside the call - unordered " +
              "collection is nondeterministic")
          expect("BY")
          do {
            val k = expr()
            val desc = if (accept("DESC")) true else { accept("ASC"); false }
            args += OrdKey(k, desc, nullsOrder())
          } while (accept(","))
        }
        expect(")")
        val f = filterClause()
        // FILTER is folded into the value as CASE WHEN cond THEN v END —
        // sound everywhere NULLs are skipped. ARRAY_AGG KEEPS NULL
        // elements, so the CASE desugar would make a filtered-out row
        // indistinguishable from a genuine NULL value; it gets the exact
        // Kept marker instead (the translator drops filtered rows before
        // collection, keeping NULL values — see Ast.Kept).
        val wrapped = args.result() match {
          case head +: rest if kw == "ARRAY_AGG" && f.isDefined =>
            Kept(f.get, head) +: rest
          case head +: rest => wrap(head, f) +: rest // TOPK(x, k): wrap x only
          case Nil => Nil
        }
        if (isKw("OVER")) {
          if (dist) throw new IllegalArgumentException(
            s"$kw(DISTINCT …) OVER is not supported (no distinct window aggregates)")
          return overClause(kw, wrapped)
        }
        return Agg(kw, wrapped, star = false, distinct = dist)
      }
      if ((unaryFns.contains(kw) || binaryFns.contains(kw) ||
           pipelineFns.contains(kw)) && toks(pos + 1) == TSym("(")) {
        next(); next()
        val args = Seq.newBuilder[Expr]
        do args += expr() while (accept(","))
        expect(")")
        val as = args.result()
        // arity enforced at parse time for the fixed-arity sets (r13
        // RejectFuzz find: IFNULL(k - 1) — a dropped comma — reached the
        // planner's a(1) and escaped as a raw IndexOutOfBoundsException);
        // ROUND optionally takes a literal scale (the fnCallLit form);
        // pipelineFns vary in arity and are guarded at translation
        if (kw == "ROUND" || kw == "ARRAY_JOIN") {
          // ROUND(x[, scale]); ARRAY_JOIN(a[, sep]) — 1-arg joins with ""
          // (SQL-v1.cf:348 ArrayFuncJoin has both forms)
          if (as.isEmpty || as.size > 2) throw new IllegalArgumentException(
            s"$kw takes 1 or 2 arguments, got ${as.size}")
        } else if (unaryFns.contains(kw) && as.size != 1)
          throw new IllegalArgumentException(
            s"$kw takes exactly 1 argument, got ${as.size}")
        else if (binaryFns.contains(kw) && as.size != 2)
          throw new IllegalArgumentException(
            s"$kw takes exactly 2 arguments, got ${as.size}")
        return Fn(kw, as)
      }
      // plain or qualified column ref
      val a = ident()
      if (isKw(".") && toks(pos + 1).isInstanceOf[TIdent]) {
        next(); ColRef(Some(a), ident())
      } else ColRef(None, a)
    }

    /** `OVER ( [PARTITION BY e, …] [ORDER BY e [ASC|DESC], …] )` — frame
      * clauses are not accepted: the default frame (RANGE UNBOUNDED
      * PRECEDING .. CURRENT ROW when ordered) matches DuckDB/standard SQL,
      * and one shared default keeps Spark and the oracle in agreement. */
    private def overClause(name: String, args: Seq[Expr],
                           ignoreNulls: Boolean = false): Expr = {
      expect("OVER")
      // `OVER name` — named-window reference; resolved by select()
      // against this SELECT's WINDOW clause
      if (!isKw("(")) {
        val ref = ident().toLowerCase
        return WinFn(name, args, Nil, Nil, windowRef = Some(ref),
          ignoreNulls = ignoreNulls)
      }
      expect("(")
      val spec = windowSpecBody()
      expect(")")
      spec.copy(name = name, args = args, ignoreNulls = ignoreNulls)
    }

    /** The inside of a parenthesized window spec — shared by inline OVER
      * clauses and named WINDOW definitions. Returned as a template WinFn
      * (empty name/args). */
    private def windowSpecBody(): WinFn = {
      // Optional leading base-window name (standard SQL refinement /
      // chaining): `(w ORDER BY …)` extends named window w. The owning
      // SELECT resolves and merges it; spec-clause keywords can't start
      // a base name, so a bare identifier here is unambiguous.
      val baseRef = peek match {
        case TIdent(_) if !Set("PARTITION", "ORDER", "ROWS", "RANGE",
          "GROUPS", "EXCLUDE").contains(kwPeek) => Some(ident().toLowerCase)
        case _ => None
      }
      val parts =
        if (accept("PARTITION")) { expect("BY")
          val b = Seq.newBuilder[Expr]
          do b += expr() while (accept(","))
          b.result()
        } else Nil
      val ord =
        if (accept("ORDER")) { expect("BY")
          val b = Seq.newBuilder[OrderItem]
          do {
            val e = expr()
            val desc = if (accept("DESC")) true else { accept("ASC"); false }
            b += OrderItem(e, desc, nullsOrder())
          } while (accept(","))
          b.result()
        } else Nil
      // ROWS and RANGE frames (extension): moving-window aggregates.
      // RANGE bounds are value-typed offsets against the single numeric
      // ORDER BY key (TypeCheck enforces the key); Spark's rangeBetween
      // and DuckDB agree on offset arithmetic and peer (tie) inclusion.
      // GROUPS frames (extension): bounds count peer groups (tie classes
      // of the ORDER BY keys). Spark has no groupsBetween, so Translate
      // rewrites to a RANGE frame over a hidden dense_rank() ordinal.
      val isRange = isKw("RANGE")
      val isGroups = isKw("GROUPS")
      val frame: Option[(Long, Long)] =
        if (accept("ROWS") || accept("RANGE") || accept("GROUPS")) {
          def bound(): Long =
            if (accept("UNBOUNDED")) {
              if (accept("PRECEDING")) Long.MinValue
              else { expect("FOLLOWING"); Long.MaxValue }
            } else if (accept("CURRENT")) { expect("ROW"); 0L }
            else {
              val n = intTok()
              if (accept("PRECEDING")) -n
              else { expect("FOLLOWING"); n }
            }
          if (accept("BETWEEN")) {
            val lo = bound(); expect("AND"); val hi = bound()
            Some((lo, hi))
          } else Some((bound(), 0L)) // `n PRECEDING` = BETWEEN … AND CURRENT ROW
        } else None
      // frame EXCLUDE clause (standard SQL, extension): removes the
      // current row / its peer group / its ties from an in-frame set
      val exclude =
        if (accept("EXCLUDE")) {
          if (frame.isEmpty) throw new IllegalArgumentException(
            "EXCLUDE requires an explicit ROWS/RANGE/GROUPS frame")
          if (accept("CURRENT")) { expect("ROW"); "CURRENT ROW" }
          else if (accept("GROUP")) "GROUP"
          else if (accept("TIES")) "TIES"
          else { expect("NO"); expect("OTHERS"); "NO OTHERS" }
        } else "NO OTHERS"
      WinFn("", Nil, parts, ord, frame, rangeFrame = isRange,
        groupsFrame = isGroups, exclude = exclude,
        windowRef = baseRef, refines = baseRef.isDefined)
    }

    /** Merge a refining spec over its base window (standard SQL window
      * refinement): PARTITION BY always comes from the base and must not
      * be respecified; ORDER BY comes from the base unless the base has
      * none; the base must be FRAMELESS (a frame makes a window final);
      * the refinement's own frame/EXCLUDE stand. */
    private def mergeWindow(local: WinFn, base: WinFn, n: String): WinFn = {
      if (local.partitionBy.nonEmpty)
        throw new IllegalArgumentException(
          s"window refinement of '$n' cannot specify PARTITION BY — " +
            "partitioning is inherited from the base window")
      if (local.orderBy.nonEmpty && base.orderBy.nonEmpty)
        throw new IllegalArgumentException(
          s"window refinement of '$n' cannot specify ORDER BY — the " +
            "base window already has one")
      if (base.frame.isDefined)
        throw new IllegalArgumentException(
          s"cannot refine window '$n': a base window with a frame " +
            "clause is final (standard SQL) — move the frame to the " +
            "refining spec")
      local.copy(partitionBy = base.partitionBy,
        orderBy = if (local.orderBy.nonEmpty) local.orderBy else base.orderBy,
        windowRef = None, refines = false)
    }

    private def dataType(): SqlType = {
      val base = kwPeek match {
        case "INTEGER" => TInt
        case "FLOAT" => TFloat
        case "BOOLEAN" => TBool
        case "BYTEA" => TBytea
        case "STRING" => TString
        case "DATE" => TDate
        case "TIME" => TTime
        case "TIMESTAMP" => TTimestamp
        case "INTERVAL" => TInterval
        case "JSONB" => TJson
        case k => throw new IllegalArgumentException(s"unknown type $k")
      }
      next()
      var t: SqlType = base
      while (isKw("[") && toks(pos + 1) == TSym("]")) { next(); next(); t = TArray(t) }
      t
    }
  }
}
