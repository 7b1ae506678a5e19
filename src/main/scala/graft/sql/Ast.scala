package graft.sql

/** AST of the HStream SQL dialect (reference grammar:
  * /root/reference/hstream-sql/etc/SQL-v1.cf, 354 lines). One case class per
  * grammar production group; the shape follows the refined AST
  * (hstream-sql/src/HStream/SQL/AST.hs) rather than the raw parse tree.
  */
object Ast {

  // ---- expressions (SQL-v1.cf:176-353) -------------------------------------

  sealed trait Expr
  case class IntLit(v: Long) extends Expr
  case class NumLit(v: Double) extends Expr
  case class StrLit(v: String) extends Expr
  case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  case class DateLit(iso: String) extends Expr
  case class TimeLit(iso: String) extends Expr
  case class TimestampLit(iso: String) extends Expr
  /** INTERVAL n UNIT (SQL-v1.cf:246-248). */
  case class IntervalLit(n: Long, unit: String) extends Expr
  /** Array literal {e1, e2, …} (SQL-v1.cf:253). */
  case class ArrLit(items: Seq[Expr]) extends Expr
  /** Column ref, optionally stream-qualified (SQL-v1.cf:259-261). */
  case class ColRef(stream: Option[String], name: String) extends Expr
  /** Binary op: OR AND = <> < > <= >= + - * -> ->> #> #>> */
  case class Bin(op: String, l: Expr, r: Expr) extends Expr
  case class Not(e: Expr) extends Expr
  /** Named scalar function call (SQL-v1.cf:285-350). */
  case class Fn(name: String, args: Seq[Expr]) extends Expr
  /** Aggregate (set function, SQL-v1.cf:264-273). star = COUNT(*).
    * distinct = COUNT/SUM(DISTINCT e) — dialect EXTENSION (the reference
    * has no DISTINCT inside aggregates besides TOPKDISTINCT, SURVEY §2.5);
    * batch-only (Spark streaming can't dedup exactly — Validate points
    * continuous queries at APPROX_COUNT_DISTINCT instead). */
  case class Agg(name: String, args: Seq[Expr], star: Boolean = false,
                 distinct: Boolean = false) extends Expr
  case class Cast(e: Expr, dt: SqlType) extends Expr
  /** CASE — searched (`operand` None: WHEN are boolean conditions) and
    * simple (`operand` Some: WHEN are values compared `=` to the operand)
    * forms, optional ELSE (missing → NULL). A dialect EXTENSION — no CASE
    * production exists anywhere in SQL-v1.cf/SQL-v2.cf. */
  case class CaseWhen(operand: Option[Expr], branches: Seq[(Expr, Expr)],
                      elseE: Option[Expr]) extends Expr
  /** `fn(args) OVER (PARTITION BY … ORDER BY … [ROWS BETWEEN …])` —
    * analytic/ranking window functions, a dialect EXTENSION (SURVEY §2.8:
    * the reference grammar has no OVER clause at all). Batch/pull-only: a
    * per-partition total order is undefined over an unbounded stream (same
    * rule as ORDER BY). `frame` is a ROWS frame in Spark's encoding
    * (Long.MinValue = UNBOUNDED PRECEDING, negative = n PRECEDING,
    * 0 = CURRENT ROW, positive = n FOLLOWING, Long.MaxValue = UNBOUNDED
    * FOLLOWING); None = the default frame, which Spark and DuckDB agree on.
    * `rangeFrame` = the bounds are RANGE (value-typed offsets against the
    * single numeric ORDER BY key) rather than ROWS — Spark's rangeBetween
    * and DuckDB's RANGE agree on the offset arithmetic and on peer-row
    * (tie) inclusion. `groupsFrame` = the bounds count peer GROUPS (tie
    * classes of the ORDER BY keys); Spark has no native GROUPS mode, so
    * the planner rewrites it to a RANGE frame over a hidden
    * `dense_rank()` peer-group ordinal — exactly the GROUPS definition. */
  case class WinFn(name: String, args: Seq[Expr], partitionBy: Seq[Expr],
                   orderBy: Seq[OrderItem],
                   frame: Option[(Long, Long)] = None,
                   rangeFrame: Boolean = false,
                   groupsFrame: Boolean = false,
                   // frame EXCLUDE clause (standard SQL; dialect
                   // extension): "NO OTHERS" | "CURRENT ROW" | "GROUP" |
                   // "TIES". Planned by frame-aggregate subtraction for
                   // the subtractable aggregates (SUM/COUNT/AVG);
                   // Validate rejects the rest loudly.
                   exclude: String = "NO OTHERS",
                   // `OVER name` — reference to a named WINDOW clause
                   // (standard SQL; extension). Resolved at parse time
                   // within the owning SELECT; a WinFn carrying an
                   // unresolved ref past the parser is rejected loudly.
                   windowRef: Option[String] = None,
                   // `IGNORE NULLS` (standard SQL; extension) on the
                   // offset/value functions LAG/LEAD/FIRST_VALUE/
                   // LAST_VALUE/NTH_VALUE — parser-restricted to those
                   ignoreNulls: Boolean = false,
                   // `OVER (name …)` / `WINDOW w2 AS (w1 …)` — window
                   // REFINEMENT (standard SQL; extension): this spec's
                   // clauses extend the named base window. Distinct from
                   // a bare `OVER name` (full copy, frame allowed on the
                   // base): refinement inherits PARTITION BY (must not
                   // be respecified), inherits ORDER BY unless the base
                   // lacks one, and requires a FRAMELESS base.
                   refines: Boolean = false) extends Expr
  /** INTERNAL marker: one ORDER BY key of an ordered aggregate
    * (STRING_AGG). Lives only inside Agg.args, appended after the value
    * and separator; the aggregate translator consumes it. */
  case class OrdKey(e: Expr, desc: Boolean,
                    // None = the comparator default (nulls last, both
                    // directions); Some = explicit NULLS FIRST/LAST
                    nullsLast: Option[Boolean] = None) extends Expr
  /** INTERNAL marker: ARRAY_AGG's value argument carrying a
    * `FILTER (WHERE cond)` clause. Every other aggregate desugars FILTER
    * to `CASE WHEN cond THEN v END` at parse time (exact wherever NULLs
    * are skipped), but ARRAY_AGG KEEPS NULL elements — the CASE desugar
    * would make a filtered-out row indistinguishable from a genuine NULL
    * value. The translator instead collects `when(cond, struct(…))`:
    * collect_list skips NULL inputs, so filtered rows vanish before the
    * shuffle while NULL values ride inside non-null structs. Lives only
    * at Agg.args.head / WinFn.args.head of an ARRAY_AGG. */
  case class Kept(cond: Expr, v: Expr) extends Expr
  case class Between(e: Expr, lo: Expr, hi: Expr, not: Boolean, symmetric: Boolean) extends Expr
  /** `e [NOT] IN (v1, v2, …)` — value-list membership (dialect EXTENSION;
    * no IN production exists in SQL-v1.cf). Standard null-unsafe SQL
    * semantics (NULL operand → UNKNOWN), matching DuckDB. */
  case class InList(e: Expr, items: Seq[Expr], not: Boolean) extends Expr
  /** `e [NOT] IN (SELECT …)` — uncorrelated subquery membership (dialect
    * EXTENSION: the reference parses subqueries but rejects them,
    * AST.hs:593). Planned as a left-semi / null-aware left-anti join;
    * batch/pull only. */
  case class InSub(e: Expr, q: Query, not: Boolean) extends Expr
  /** `[NOT] EXISTS (SELECT …)` — planned as a left-semi/anti join; the
    * subquery may correlate to the outer query through alias-qualified
    * column refs (or bare names the subquery's own relation lacks).
    * Batch/pull only. */
  case class ExistsSub(q: Query) extends Expr
  /** `(SELECT …)` in expression position — a scalar subquery (dialect
    * EXTENSION). Must be provably one-row (a global aggregate or LIMIT 1);
    * planned as a broadcast cross-join, so the value never collects through
    * the driver inside the plan. Batch/pull only. */
  case class ScalarSub(q: Query) extends Expr
  /** 0-based index / half-open slice (SQL-v1.cf:204-211). */
  case class ArrIndex(e: Expr, i: Long) extends Expr
  case class ArrSlice(e: Expr, from: Option[Long], to: Option[Long]) extends Expr

  // ---- types (SQL-v1.cf:160-173) -------------------------------------------

  sealed trait SqlType
  case object TInt extends SqlType
  case object TFloat extends SqlType
  case object TBool extends SqlType
  case object TBytea extends SqlType
  case object TString extends SqlType
  case object TDate extends SqlType
  case object TTime extends SqlType
  case object TTimestamp extends SqlType
  case object TInterval extends SqlType
  case object TJson extends SqlType
  case class TArray(elem: SqlType) extends SqlType

  // ---- FROM clause (SQL-v1.cf:118-137) -------------------------------------

  sealed trait TableRef
  case class TRStream(name: String) extends TableRef
  /** FROM-clause subquery — parsed-but-rejected in the reference
    * (AST.hs:593 "Subquery is not supported yet"); we support it. */
  case class TRSubquery(sel: Query) extends TableRef
  case class TRAlias(inner: TableRef, alias: String) extends TableRef
  sealed trait WindowSpec
  case class Tumble(size: IntervalLit) extends WindowSpec
  case class Hop(size: IntervalLit, advance: IntervalLit) extends WindowSpec
  case class Session(gap: IntervalLit) extends WindowSpec
  case class TRWindowed(inner: TableRef, win: WindowSpec) extends TableRef
  /** FROM FLATTEN(rel, expr AS col) — dialect EXTENSION: one output row
    * per element of the (array-valued) expr, exposed as column `col`
    * alongside the input row; the dialect form of explode/UNNEST. Works
    * on streams too (a continuous tokenizer). */
  case class TRFlatten(inner: TableRef, e: Expr, alias: String) extends TableRef
  /** WITH RECURSIVE name AS (base UNION [ALL] step) — iterative fixpoint
    * table (dialect EXTENSION; batch/pull only). `step` references `name`
    * as the previous round's FRONTIER (UNION: rows not seen before;
    * UNION ALL: all of the previous round's rows) — the standard
    * semi-naive evaluation. Planned as a driver-orchestrated loop of
    * distributed steps with per-round lineage truncation (the Graph
    * connected-components shape). */
  case class TRRecursive(name: String, base: Query, step: Query,
                         unionAll: Boolean) extends TableRef

  sealed trait JoinCond
  case class On(expr: Expr) extends JoinCond
  case class Using(cols: Seq[String]) extends JoinCond
  case object Natural extends JoinCond
  case object CrossC extends JoinCond
  /** join type ∈ inner/left/right/full/cross; within = WITHIN interval.
    * within = None is a dialect EXTENSION (the reference grammar requires
    * WITHIN on every join, SQL-v1.cf:121): a plain relational join, legal
    * only when both sides are batch — streams must still bound their
    * buffered state with WITHIN. */
  case class TRJoin(l: TableRef, r: TableRef, joinType: String,
                    cond: JoinCond, within: Option[IntervalLit]) extends TableRef

  // ---- statements (SQL-v1.cf:30-116) ---------------------------------------

  sealed trait SelectItem
  case class ItemExpr(e: Expr, alias: Option[String]) extends SelectItem
  /** `*` with optional DuckDB-style modifiers (r8 extension):
    * `* EXCLUDE (c1, …)` drops listed columns, `* REPLACE (expr AS c)`
    * substitutes a column's value in place (position/name preserved).
    * Plain-star only — a qualified `q.*` takes no modifiers. */
  case class ItemWildcard(stream: Option[String],
                          exclude: Seq[String] = Nil,
                          replace: Seq[(Expr, String)] = Nil) extends SelectItem

  /** ORDER BY item — dialect EXTENSION: the reference grammar has no
    * ORDER BY/LIMIT production at all (SURVEY §2.7; no production in
    * SQL-v1.cf). Batch/pull queries only; Validate rejects continuous
    * forms, where a total order over an unbounded stream is undefined. */
  /** One sort key. `nullsLast`: None = the dialect default — NULLS LAST
    * in BOTH directions (DuckDB's default order, which the oracle
    * applies; Spark's own default is nulls-first for ASC). Some(b) = an
    * explicit NULLS FIRST/LAST was written. */
  case class OrderItem(e: Expr, desc: Boolean,
                       nullsLast: Option[Boolean] = None)

  /** A query body: a single SELECT or a set-operation tree over them.
    * Set operations are a dialect EXTENSION (SURVEY §2.7: UNION/INTERSECT/
    * EXCEPT productions don't exist in SQL-v1.cf; the reference's V1
    * codegen throws on its internal Union plan node, Codegen/V1.hs:457-460,
    * while V2 implements union — DiffFlow/Graph.hs:70-71). */
  sealed trait Query {
    def emitChanges: Boolean
    def orderBy: Seq[OrderItem]
    def limit: Option[Long]
    def offset: Option[Long]
  }

  case class Select(items: Seq[SelectItem], from: TableRef, where: Option[Expr],
                    groupBy: Seq[ColRef], having: Option[Expr],
                    emitChanges: Boolean = false,
                    orderBy: Seq[OrderItem] = Nil,
                    limit: Option[Long] = None,
                    // GROUP BY ROLLUP/CUBE/GROUPING SETS — dialect
                    // extension (SURVEY §2.5: no production in SQL-v1.cf);
                    // multi-level aggregation in one shuffle, batch/pull
                    // only. groupMode ∈ plain|rollup|cube|sets; for `sets`,
                    // groupBy is the ordered union of all set columns and
                    // groupSets holds the explicit sets.
                    groupMode: String = "plain",
                    groupSets: Seq[Seq[ColRef]] = Nil,
                    // QUALIFY — dialect extension (DuckDB-compatible):
                    // filter on window-function results, evaluated after
                    // the windows; refs may be inline OVER exprs or select
                    // aliases. Batch/pull only (window rule).
                    qualify: Option[Expr] = None,
                    // SELECT DISTINCT / DISTINCT ON (keys) — dialect
                    // extension (DuckDB-compatible). DISTINCT ON keeps the
                    // first row per key group in ORDER BY order (ORDER BY
                    // required — an unordered pick would be
                    // nondeterministic). Batch/pull only.
                    distinct: Boolean = false,
                    distinctOn: Seq[ColRef] = Nil,
                    // LIMIT n OFFSET m (extension; batch/pull only like
                    // LIMIT) — skip m rows of the ordered result
                    offset: Option[Long] = None) extends Query {
    /** Any multi-level grouping (ROLLUP / CUBE / GROUPING SETS). */
    def multiLevel: Boolean = groupMode != "plain"
    def rollup: Boolean = groupMode == "rollup"
  }

  /** op ∈ union/intersect/except; column matching is positional (standard
    * SQL), output names come from the left operand. INTERSECT binds tighter
    * than UNION/EXCEPT (standard precedence); chains are otherwise
    * left-associative. Trailing ORDER BY/LIMIT bind to the whole tree. */
  case class SetOp(op: String, all: Boolean, l: Query, r: Query,
                   orderBy: Seq[OrderItem] = Nil,
                   limit: Option[Long] = None,
                   emitChanges: Boolean = false,
                   offset: Option[Long] = None) extends Query

  sealed trait Stmt
  case class SelectStmt(sel: Query) extends Stmt
  case class CreateStream(name: String, schema: Seq[(String, SqlType)],
                          options: Map[String, Expr]) extends Stmt
  case class CreateStreamAs(name: String, sel: Query,
                            options: Map[String, Expr]) extends Stmt
  case class CreateView(name: String, sel: Query) extends Stmt
  case class InsertValues(stream: String, cols: Seq[String], vals: Seq[Expr]) extends Stmt
  case class InsertJson(stream: String, json: String) extends Stmt
  /** INSERT … VALUES '…' :: BYTEA — opaque binary payload. */
  case class InsertRaw(stream: String, raw: String) extends Stmt
  case class InsertSel(stream: String, sel: Query) extends Stmt
  case class Show(what: String) extends Stmt
  /** CREATE SOURCE/SINK CONNECTOR — external CDC task metadata
    * (SQL-v1.cf:54-60); execution is out of engine scope (the reference
    * launches Docker containers — hstream-io/HStream/IO/Worker.hs:71-83). */
  case class CreateConnector(kind: String, name: String, target: String,
                             ifNotExist: Boolean,
                             options: Map[String, Expr]) extends Stmt
  case class PauseConnector(name: String) extends Stmt
  case class ResumeConnector(name: String) extends Stmt
  case class DropStmt(what: String, name: String, ifExists: Boolean) extends Stmt
  case class Terminate(name: String) extends Stmt
  case class PauseStmt(name: String) extends Stmt
  case class ResumeStmt(name: String) extends Stmt
  case class Explain(inner: Stmt) extends Stmt
}
