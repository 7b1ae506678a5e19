package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import Ast._

/** Schema-aware static type checking for the dialect — the type-compatibility
  * half of the reference's validate stage
  * (hstream-sql/src/HStream/SQL/Internal/Validate.hs:207-420: isNumExpr /
  * isOrdExpr / isBoolExpr / isStringExpr and the per-function argument masks
  * at 126-138). The reference checks literal/operator *shape* only and
  * leaves column refs untyped ("ExprColName -> Right expr -- TODO: Use
  * schema to decide this", Validate.hs:236); this pass goes further: it runs
  * after FROM resolution, when the relation schema is in hand, so ill-typed
  * operands over *columns* are rejected too ("'a' + n_chars", "d BETWEEN 1
  * AND 'z'") with the dialect's vocabulary instead of a deep Catalyst error.
  *
  * Inference is best-effort: `None` means the type is unknown (dynamic JSON
  * leaf, unresolvable ref) and never rejects — only *provably* incompatible
  * operands fail, so the checker cannot produce false positives on dynamic
  * data. Type families mirror the reference's masks:
  *   num  = INT | FLOAT                  (isNumExpr, Validate.hs:207-247)
  *   ord  = num | STRING | DATE | TIME | TIMESTAMP (isOrdExpr, 348-356)
  *   bool = BOOL                         (isBoolExpr, Validate.hs:358-420)
  */
object TypeCheck {

  /** lowercased column name (bare and "qualifier.name") → dialect type */
  type Env = Map[String, SqlType]

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ---- env construction ----------------------------------------------------

  /** Dialect view of a resolved relation's Spark schema. Spark types with no
    * dialect counterpart (structs, maps) stay untyped (absent). */
  def envOf(df: DataFrame): Env =
    df.schema.fields.flatMap { f =>
      fromSpark(f.dataType).map(t => f.name.toLowerCase -> t)
    }.toMap

  def fromSpark(dt: DataType): Option[SqlType] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(TInt)
    case FloatType | DoubleType | _: DecimalType => Some(TFloat)
    case BooleanType => Some(TBool)
    case StringType => Some(TString)
    case BinaryType => Some(TBytea)
    case DateType => Some(TDate)
    case TimestampType | TimestampNTZType => Some(TTimestamp)
    case ArrayType(e, _) => fromSpark(e).map(TArray)
    case VariantType => Some(TJson)
    case _ => None
  }

  // ---- families ------------------------------------------------------------

  private def isNum(t: SqlType) = t == TInt || t == TFloat
  private def isTemporal(t: SqlType) = t == TDate || t == TTime || t == TTimestamp
  private def isOrd(t: SqlType) = isNum(t) || t == TString || isTemporal(t)

  /** Comparable family for <, BETWEEN, …: numbers with numbers, strings with
    * strings, temporals with temporals (DATE vs TIMESTAMP compares fine).
    * TIME also compares with STRING: TIME is carried as a fixed-width
    * HH:mm:ss string column (SURVEY §1.2), whose lexicographic order IS
    * chronological order — a string/TIME comparison is well-defined.
    * JSONB is dynamically typed — it is compatible with everything and the
    * runtime value decides (the reference compares FlowValues at runtime). */
  private def sameFamily(a: SqlType, b: SqlType): Boolean =
    a == TJson || b == TJson ||
      (isNum(a) && isNum(b)) || (a == TString && b == TString) ||
      (isTemporal(a) && isTemporal(b)) || a == b ||
      Set(a, b) == Set[SqlType](TString, TTime)

  private def show(t: SqlType): String = t match {
    case TInt => "INTEGER";  case TFloat => "FLOAT";  case TBool => "BOOLEAN"
    case TBytea => "BYTEA";  case TString => "STRING"; case TDate => "DATE"
    case TTime => "TIME";    case TTimestamp => "TIMESTAMP"
    case TInterval => "INTERVAL"; case TJson => "JSONB"
    case TArray(e) => s"ARRAY<${show(e)}>"
  }

  // ---- argument masks (getScalarArgType, Validate.hs:126-138) --------------

  private val numArgFns = Set("SIN", "SINH", "ASIN", "ASINH", "COS", "COSH",
    "ACOS", "ACOSH", "TAN", "TANH", "ATAN", "ATANH", "ABS", "CEIL", "FLOOR",
    "ROUND", "SIGN", "SQRT", "LOG", "LOG2", "LOG10", "EXP")
  private val strArgFns = Set("TO_LOWER", "TO_UPPER", "TRIM", "LEFT_TRIM",
    "RIGHT_TRIM", "REVERSE", "STRLEN")
  private val arrArgFns = Set("ARRAY_DISTINCT", "ARRAY_LENGTH", "ARRAY_MAX",
    "ARRAY_MIN", "ARRAY_SORT")

  // ---- checking ------------------------------------------------------------

  def check(e: Expr, env: Env): Unit = { infer(e, env); () }

  /** Infer the dialect type of `e`; reject provable mismatches. */
  def infer(e: Expr, env: Env): Option[SqlType] = e match {
    case IntLit(_) => Some(TInt)
    case NumLit(_) => Some(TFloat)
    case StrLit(_) => Some(TString)
    case BoolLit(_) => Some(TBool)
    case NullLit => None
    case DateLit(_) => Some(TDate)
    case TimeLit(_) => Some(TTime)
    case TimestampLit(_) => Some(TTimestamp)
    case IntervalLit(_, _) => Some(TInterval)
    case ColRef(q, n) =>
      val key = q.map(x => s"${x.toLowerCase}.${n.toLowerCase}")
      key.flatMap(env.get).orElse(env.get(n.toLowerCase))

    case ArrLit(items) =>
      val ts = items.map(infer(_, env))
      for (Some(a) <- ts; Some(b) <- ts)
        if (!sameFamily(a, b))
          fail(s"array literal mixes ${show(a)} and ${show(b)} elements")
      ts.flatten.headOption.map(TArray)

    case Not(x) => requireBool(x, env, "NOT"); Some(TBool)

    case Bin(op, l, r) => binType(op, l, r, env)

    case Cast(x, dt) => infer(x, env); Some(dt)

    case Between(x, lo, hi, _, _) =>
      // isOrdExpr over all three (Validate.hs:307-356); schema-aware
      // extension: provably mixed families reject ("BETWEEN over mixed
      // types" — 1 BETWEEN 'a' AND x)
      val ts = Seq(x, lo, hi).map(requireOrd(_, env, "BETWEEN"))
      for (Some(a) <- ts; Some(b) <- ts)
        if (!sameFamily(a, b))
          fail(s"BETWEEN over mixed types: ${show(a)} vs ${show(b)}")
      Some(TBool)

    case ArrIndex(x, _) =>
      infer(x, env) match {
        case Some(TArray(el)) => Some(el)
        case Some(TJson) | None => None // dynamic JSON array access
        case Some(t) => fail(s"array index over non-array ${show(t)}")
      }
    case ArrSlice(x, _, _) =>
      infer(x, env) match {
        case s @ Some(TArray(_)) => s
        case Some(TJson) | None => None
        case Some(t) => fail(s"array slice over non-array ${show(t)}")
      }

    case Agg(name, args, star, _) => aggType(name, args, star, env)
    case OrdKey(x, _, _) => infer(x, env)
    // ARRAY_AGG FILTER marker: the condition must be boolean; the node's
    // type is the value's (the filter never changes element type)
    case Kept(c, v) => requireBool(c, env, "FILTER (WHERE …)"); infer(v, env)

    case Fn(name, args) => fnType(name, args, env)

    case CaseWhen(operand, branches, elseE) =>
      operand match {
        case Some(o) =>
          // simple form: operand and WHEN values compare with `=` — same
          // family required when both sides are provable
          val ot = infer(o, env)
          branches.foreach { case (c, _) =>
            val ct = infer(c, env)
            for (a <- ot; b <- ct)
              if (!sameFamily(a, b))
                fail(s"CASE operand/WHEN type mismatch: ${show(a)} vs ${show(b)}")
          }
        case None =>
          branches.foreach { case (c, _) => requireBool(c, env, "CASE WHEN") }
      }
      val rts = (branches.map(_._2) ++ elseE.toSeq).map(infer(_, env))
      for (Some(a) <- rts; Some(b) <- rts)
        if (!sameFamily(a, b))
          fail(s"CASE branches mix ${show(a)} and ${show(b)} results")
      rts.flatten.headOption

    case InList(x, items, _) =>
      val et = infer(x, env)
      items.foreach { i =>
        val it = infer(i, env)
        for (a <- et; b <- it)
          if (!sameFamily(a, b))
            fail(s"IN list mixes ${show(a)} and ${show(b)} operands")
      }
      Some(TBool)
    // subquery sides type-check against their OWN relation inside
    // Translate.plan (the sub's schema isn't in this env); the predicate
    // itself is boolean
    case InSub(x, _, _) => infer(x, env); Some(TBool)
    case _: ExistsSub => Some(TBool)
    case _: ScalarSub => None // rewritten to a column ref before planning

    case wf: WinFn =>
      import wf.{name, args, partitionBy => parts, orderBy => ord, frame,
        rangeFrame, groupsFrame}
      parts.foreach(infer(_, env))
      ord.foreach(o => requireOrd(o.e, env, "OVER (ORDER BY …)"))
      // RANGE offsets are added to the ORDER BY key, so a finite-offset
      // frame needs a numeric key (Validate already pinned it to one key).
      // GROUPS offsets count peer groups — any orderable key type works
      // (the rewrite's dense_rank ordinal is always numeric).
      frame.foreach { case (lo, hi) =>
        val finite = (lo != Long.MinValue && lo != 0L) ||
          (hi != Long.MaxValue && hi != 0L)
        if (rangeFrame && !groupsFrame && finite)
          ord.foreach(o => requireNum(o.e, env,
            s"$name's RANGE frame ORDER BY key"))
      }
      name match {
        case "ROW_NUMBER" | "RANK" | "DENSE_RANK" | "NTILE" | "COUNT" =>
          args.foreach(infer(_, env)); Some(TInt)
        case "PERCENT_RANK" | "CUME_DIST" =>
          args.foreach(infer(_, env)); Some(TFloat)
        case "LAG" | "LEAD" | "FIRST_VALUE" | "LAST_VALUE" | "MIN" | "MAX" |
             "NTH_VALUE" =>
          args.headOption.flatMap(infer(_, env))
        case "SUM" =>
          args.headOption.flatMap(a => requireNum(a, env, name))
        case "AVG" =>
          args.headOption.foreach(a => requireNum(a, env, name)); Some(TFloat)
        // ordered aggregates as window functions (r10): same shapes as
        // the grouped forms
        case "STRING_AGG" =>
          args.headOption.foreach(infer(_, env))
          // same separator rule as the grouped form (a non-string
          // separator must fail here, not as a translate-time shape error)
          args.drop(1).headOption.foreach(a => requireString(a, env, name))
          args.collect { case OrdKey(k, _, _) =>
            requireOrd(k, env, "STRING_AGG ORDER BY") }
          Some(TString)
        case "ARRAY_AGG" =>
          args.collect { case OrdKey(k, _, _) =>
            requireOrd(k, env, "ARRAY_AGG ORDER BY") }
          args.headOption.flatMap(infer(_, env)).map(TArray)
        case _ => args.foreach(infer(_, env)); None
      }
  }

  private def binType(op: String, l: Expr, r: Expr, env: Env): Option[SqlType] = op match {
    case "AND" | "OR" =>
      requireBool(l, env, op); requireBool(r, env, op); Some(TBool)

    case "=" | "<>" =>
      // ExprEQ/ExprNEQ validate operands recursively only (Validate.hs:
      // 211-212) — equality is defined across types in the dialect
      infer(l, env); infer(r, env); Some(TBool)

    case "<" | ">" | "<=" | ">=" =>
      // isOrdExpr both sides (Validate.hs:213-216) + family compat
      val a = requireOrd(l, env, s"'$op'")
      val b = requireOrd(r, env, s"'$op'")
      for (x <- a; y <- b)
        if (!sameFamily(x, y))
          fail(s"cannot compare ${show(x)} $op ${show(y)}")
      Some(TBool)

    case "+" | "-" =>
      (infer(l, env), infer(r, env)) match {
        // TIME/DATE/TIMESTAMP ± INTERVAL (AST.hs:155-173); JSONB dynamic;
        // an UNKNOWN (None) left operand never rejects (best-effort
        // contract) — only a PROVABLY non-temporal one does
        case (t @ Some(x), Some(TInterval)) if isTemporal(x) || x == TJson => t
        case (None, Some(TInterval)) => None
        case (_, Some(TInterval)) | (Some(TInterval), _) =>
          fail(s"INTERVAL arithmetic needs a DATE/TIME/TIMESTAMP left operand")
        case (a, b) =>
          requireNumT(a, s"'$op'"); requireNumT(b, s"'$op'")
          if (a.contains(TFloat) || b.contains(TFloat)) Some(TFloat)
          else if (a.contains(TInt) && b.contains(TInt)) Some(TInt) else None
      }
    case "*" =>
      val a = infer(l, env); val b = infer(r, env)
      requireNumT(a, "'*'"); requireNumT(b, "'*'")
      if (a.contains(TFloat) || b.contains(TFloat)) Some(TFloat)
      else if (a.contains(TInt) && b.contains(TInt)) Some(TInt) else None

    // `/` and `%` (extensions; the reference grammar has only + - *):
    // `/` is REAL division — integer ÷ integer is FLOAT, like DuckDB —
    // `%` keeps the operand type (sign of the dividend)
    case "/" =>
      requireNumT(infer(l, env), "'/'"); requireNumT(infer(r, env), "'/'")
      Some(TFloat)
    case "%" =>
      val a = infer(l, env); val b = infer(r, env)
      requireNumT(a, "'%'"); requireNumT(b, "'%'")
      if (a.contains(TFloat) || b.contains(TFloat)) Some(TFloat)
      else if (a.contains(TInt) && b.contains(TInt)) Some(TInt) else None

    // JSON access: left must be JSON-ish (text or variant); the right
    // operand is a key/path, not a value expression
    case "->" | "#>" => requireJson(l, env, op); Some(TJson)
    case "->>" | "#>>" => requireJson(l, env, op); Some(TString)

    case _ => None
  }

  private def aggType(name: String, args: Seq[Expr], star: Boolean, env: Env): Option[SqlType] =
    name match {
      case "COUNT" => if (!star) args.foreach(infer(_, env)); Some(TInt)
      case "SUM" | "AVG" => // isNumExpr (Validate.hs:113-115)
        val t = args.headOption.flatMap(a => requireNum(a, env, name))
        if (name == "AVG") Some(TFloat) else t
      case "MIN" | "MAX" => // isOrdExpr (Validate.hs:117-119)
        args.headOption.flatMap(a => requireOrd(a, env, name))
      case "TOPK" | "TOPKDISTINCT" => // isNumExpr both args (Validate.hs:121-123)
        args.foreach(a => requireNum(a, env, name))
        Some(TArray(TFloat))
      case "APPROX_COUNT_DISTINCT" => args.foreach(infer(_, env)); Some(TInt)
      case "GROUPING" => args.foreach(infer(_, env)); Some(TInt)
      case "ARRAY_AGG" =>
        args.collect { case OrdKey(k, _, _) =>
          requireOrd(k, env, "ARRAY_AGG ORDER BY") }
        args.headOption.flatMap(infer(_, env)).map(TArray)
      case "STRING_AGG" =>
        args.headOption.foreach(infer(_, env)) // value: any (cast to string)
        args.drop(1).headOption.foreach(a => requireString(a, env, name))
        args.collect { case OrdKey(k, _, _) =>
          requireOrd(k, env, "STRING_AGG ORDER BY") }
        Some(TString)
      case "PERCENTILE" | "MEDIAN" => // numeric input, continuous output
        args.foreach(a => requireNum(a, env, name)); Some(TFloat)
      case "APPROX_PERCENTILE" => // sketch returns a value from the data
        args.foreach(a => requireNum(a, env, name))
        infer(args.head, env)
      case _ => args.foreach(infer(_, env)); None
    }

  private def fnType(name: String, args: Seq[Expr], env: Env): Option[SqlType] = {
    if (numArgFns(name)) { // numMask (Validate.hs:131)
      args.foreach(a => requireNum(a, env, name))
      name match {
        case "ABS" | "SIGN" => infer(args.head, env)
        case "CEIL" | "FLOOR" | "ROUND" => Some(TInt)
        case _ => Some(TFloat)
      }
    } else if (strArgFns(name)) { // stringMask (Validate.hs:134)
      args.foreach(a => requireString(a, env, name))
      if (name == "STRLEN") Some(TInt) else Some(TString)
    } else if (arrArgFns(name)) {
      args.foreach(a => requireArray(a, env, name))
      name match {
        case "ARRAY_LENGTH" => Some(TInt)
        case "ARRAY_MAX" | "ARRAY_MIN" =>
          infer(args.head, env) match { case Some(TArray(e)) => Some(e); case _ => None }
        case _ => infer(args.head, env)
      }
    } else name match {
      case "SPLIT" => // SPLIT(s, delim)
        requireString(args.head, env, name); Some(TArray(TString))
      case "LEVENSHTEIN" => // edit distance over two strings
        args.foreach(a => requireString(a, env, name)); Some(TInt)
      case "DATEDIFF" => // DATEDIFF(end, start) → whole days (extension);
        // args must be date-compatible (DATE/TIMESTAMP, or a string that
        // parses as one) — the STRINGTODATE/DATETOSTRING discipline, so
        // DATEDIFF(1, 'x') is a dialect-vocabulary rejection here, not a
        // deep Spark cast error (or silent nulls) later
        args.foreach(a => requireDateLike(a, env, name)); Some(TInt)
      case "CHUNKSOF" => // CHUNKSOF(n, s) — chunk size FIRST (SQL-v1.cf)
        requireNum(args.head, env, name)
        requireString(args.last, env, name); Some(TArray(TString))
      case "TAKE" | "TAKEEND" | "DROP" | "DROPEND" =>
        requireString(args.last, env, name); Some(TString)
      case "TO_STR" => infer(args.head, env); Some(TString)
      case "DATETOSTRING" | "ARRAY_JOIN" => args.foreach(infer(_, env)); Some(TString)
      case "STRINGTODATE" => requireString(args.head, env, name); Some(TDate)
      case "IS_INT" | "IS_FLOAT" | "IS_NUM" | "IS_BOOL" | "IS_STR" |
           "IS_ARRAY" | "IS_DATE" | "IS_TIME" | "IS_NULL" =>
        infer(args.head, env); Some(TBool) // dynamic predicates take anything
      // LLM-pipeline primitives (SURVEY §6)
      case "TOKENS" =>
        requireString(args.head, env, name); Some(TArray(TString))
      case "WORD_HASHES" | "SHINGLES3" =>
        requireArray(args.head, env, name); Some(TArray(TInt))
      case "MINHASH" | "FINGERPRINT" | "SIMHASH16" | "HAMMING" =>
        requireArrayOrNum(name, args, env); Some(TInt)
      case "JACCARD" | "COSINE" =>
        args.foreach(a => requireArray(a, env, name)); Some(TFloat)
      case "STOPWORD_RATIO" | "QUALITY_SCORE" =>
        requireArray(args.head, env, name); Some(TFloat)
      case "BUCKET" =>
        if (args.length != 2) fail("BUCKET requires (string-expr, modulus)")
        requireString(args.head, env, name); Some(TInt)
      // similarity/ANN pack
      case "L2NORMALIZE" =>
        requireArray(args.head, env, name); Some(TArray(TFloat))
      case "DOT" =>
        args.foreach(a => requireArray(a, env, name)); Some(TFloat)
      case "LSH16" =>
        requireArray(args.head, env, name); Some(TInt)
      case "QUANTIZE_INT8" =>
        requireArray(args.head, env, name); Some(TArray(TInt))
      case "SHIFTRIGHT" =>
        if (args.length != 2) fail("SHIFTRIGHT requires (expr, count)")
        args.foreach(a => requireNum(a, env, name)); Some(TInt)
      case "IFNULL" | "NULLIF" =>
        val ts = args.map(infer(_, env))
        for (Some(a) <- ts; Some(b) <- ts)
          if (!sameFamily(a, b))
            fail(s"$name over mixed types: ${show(a)} vs ${show(b)}")
        ts.flatten.headOption
      case _ => args.foreach(infer(_, env)); None
    }
  }

  // ---- requirement helpers -------------------------------------------------

  private def requireNum(e: Expr, env: Env, where: String): Option[SqlType] = {
    val t = infer(e, env); requireNumT(t, where); t
  }
  private def requireNumT(t: Option[SqlType], where: String): Unit = t.foreach { x =>
    if (!isNum(x) && x != TJson)
      fail(s"Expected a numeric expression in $where but got ${show(x)} (Validate.hs:207-247)")
  }
  private def requireOrd(e: Expr, env: Env, where: String): Option[SqlType] = {
    val t = infer(e, env)
    t.foreach { x =>
      if (!isOrd(x) && x != TJson)
        fail(s"Expected an orderable expression in $where but got ${show(x)} (Validate.hs:307-356)")
    }
    t
  }
  private def requireBool(e: Expr, env: Env, where: String): Unit =
    infer(e, env).foreach { x =>
      if (x != TBool && x != TJson)
        fail(s"Expected a boolean expression in $where but got ${show(x)} (Validate.hs:358-420)")
    }
  private def requireString(e: Expr, env: Env, where: String): Unit =
    infer(e, env).foreach { x =>
      if (x != TString && x != TJson)
        fail(s"Expected a string expression in $where but got ${show(x)} (Validate.hs:134)")
    }
  /** MINHASH(arr, i) / FINGERPRINT(arr) / SIMHASH16(arr) / HAMMING(n, n):
    * first arg array (HAMMING: numeric), trailing args numeric. */
  private def requireArrayOrNum(name: String, args: Seq[Expr], env: Env): Unit =
    if (name == "HAMMING") args.foreach(a => requireNum(a, env, name))
    else {
      args.headOption.foreach(a => requireArray(a, env, name))
      args.drop(1).foreach(a => requireNum(a, env, name))
    }

  /** DATE or TIMESTAMP, or a string/JSON value that can parse as one. */
  private def requireDateLike(e: Expr, env: Env, where: String): Unit =
    infer(e, env).foreach {
      case TDate | TTimestamp | TString | TJson => ()
      case x => fail(s"Expected a date-compatible expression (DATE, " +
        s"TIMESTAMP, or a date string) in $where but got ${show(x)}")
    }

  private def requireArray(e: Expr, env: Env, where: String): Unit =
    infer(e, env).foreach {
      case TArray(_) | TJson => ()
      case x => fail(s"Expected an array expression in $where but got ${show(x)}")
    }
  private def requireJson(e: Expr, env: Env, op: String): Unit =
    infer(e, env).foreach {
      case TJson | TString | TBytea => ()
      case x => fail(s"JSON operator $op over non-JSON operand ${show(x)}")
    }
}
