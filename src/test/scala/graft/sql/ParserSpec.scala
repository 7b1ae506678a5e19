package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import Ast._

/** Parser golden cases, modeled on the reference's syntax corpus
  * (hstream-sql/etc/syntax-test-cases.yaml and ParseRefineSpec.hs). */
class ParserSpec extends AnyFunSuite {

  test("CREATE STREAM with schema and options") {
    assert(Parser.parse("CREATE STREAM s1 (a INTEGER, b STRING, c FLOAT[]);") ==
      CreateStream("s1", Seq("a" -> TInt, "b" -> TString, "c" -> TArray(TFloat)), Map.empty))
    Parser.parse("CREATE STREAM s2 WITH (REPLICATE = 3, DURATION = INTERVAL 7 DAY);") match {
      case CreateStream("s2", Nil, opts) => assert(opts.keySet == Set("REPLICATE", "DURATION"))
      case other => fail(other.toString)
    }
  }

  test("INSERT forms (AST.hs:777-804)") {
    assert(Parser.parse("INSERT INTO s1 (a, b) VALUES (1, 'x');") ==
      InsertValues("s1", Seq("a", "b"), Seq(IntLit(1), StrLit("x"))))
    assert(Parser.parse("""INSERT INTO s1 VALUES '{"a": 1}';""") ==
      InsertJson("s1", """{"a": 1}"""))
  }

  test("SELECT with WHERE/GROUP BY/HAVING/EMIT CHANGES") {
    val s = Parser.parse(
      "SELECT k, SUM(v) AS s FROM s1 WHERE v > 1 GROUP BY k HAVING SUM(v) < 10 EMIT CHANGES;")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[Select]
    assert(s.emitChanges)
    assert(s.groupBy == Seq(ColRef(None, "k")))
    assert(s.items == Seq(
      ItemExpr(ColRef(None, "k"), None),
      ItemExpr(Agg("SUM", Seq(ColRef(None, "v"))), Some("s"))))
    assert(s.having.contains(Bin("<", Agg("SUM", Seq(ColRef(None, "v"))), IntLit(10))))
  }

  test("windowed FROM: TUMBLE/HOP/SESSION (SQL-v1.cf:128-130)") {
    val s = Parser.parse(
      "SELECT k FROM TUMBLE(s1, INTERVAL 5 MINUTE) GROUP BY k;").asInstanceOf[SelectStmt].sel.asInstanceOf[Select]
    assert(s.from == TRWindowed(TRStream("s1"), Tumble(IntervalLit(5, "MINUTE"))))
    val h = Parser.parse(
      "SELECT k FROM HOP(s1, INTERVAL 1 HOUR, INTERVAL 30 MINUTE) GROUP BY k;")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[Select]
    assert(h.from == TRWindowed(TRStream("s1"),
      Hop(IntervalLit(1, "HOUR"), IntervalLit(30, "MINUTE"))))
  }

  test("joins: WITHIN parsed when present (optional, batch joins omit it); all four condition forms (SQL-v1.cf:121-124)") {
    def from(q: String) = Parser.parse(q).asInstanceOf[SelectStmt].sel.asInstanceOf[Select].from
    from("SELECT * FROM s1 LEFT JOIN s2 ON s1.a = s2.b WITHIN (INTERVAL 1 MINUTE);") match {
      case TRJoin(TRStream("s1"), TRStream("s2"), "left", On(_), Some(IntervalLit(1, "MINUTE"))) =>
      case other => fail(other.toString)
    }
    from("SELECT * FROM s1 JOIN s2 USING (k) WITHIN (INTERVAL 5 SECOND);") match {
      case TRJoin(_, _, "inner", Using(Seq("k")), _) =>
      case other => fail(other.toString)
    }
    from("SELECT * FROM s1 NATURAL JOIN s2 WITHIN (INTERVAL 5 SECOND);") match {
      case TRJoin(_, _, "inner", Natural, _) => case other => fail(other.toString)
    }
    from("SELECT * FROM s1 CROSS JOIN s2 WITHIN (INTERVAL 5 SECOND);") match {
      case TRJoin(_, _, "inner", CrossC, _) => case other => fail(other.toString)
    }
    // no WITHIN parses as within=None (batch-join extension; the
    // translator still rejects stream inputs without one)
    from("SELECT * FROM s1 JOIN s2 ON s1.a = s2.b;") match {
      case TRJoin(_, _, "inner", On(_), None) =>
      case other => fail(other.toString)
    }
  }

  test("expression precedence ladder (SQL-v1.cf:176-203)") {
    // * binds tighter than +; + tighter than =; = tighter than AND
    assert(Parser.parseExpr("a + b * 2 = c AND d") ==
      Bin("AND",
        Bin("=", Bin("+", ColRef(None, "a"), Bin("*", ColRef(None, "b"), IntLit(2))),
          ColRef(None, "c")),
        ColRef(None, "d")))
    // `/` and `%` are EXTENSIONS (the reference grammar stops at
    // OpAdd|OpSub|OpMul, SQL-v1.cf:201-203) — same tier as `*`
    assert(Parser.parseExpr("a + b / 2") ==
      Bin("+", ColRef(None, "a"), Bin("/", ColRef(None, "b"), IntLit(2))))
    assert(Parser.parseExpr("a % 2 = 0") ==
      Bin("=", Bin("%", ColRef(None, "a"), IntLit(2)), IntLit(0)))
  }

  test("comment forms: // (reference style), -- (standard, extension), /* */") {
    assert(Parser.parseExpr("a + // rest of line\n b") ==
      Bin("+", ColRef(None, "a"), ColRef(None, "b")))
    assert(Parser.parseExpr("a + -- rest of line\n b") ==
      Bin("+", ColRef(None, "a"), ColRef(None, "b")))
    assert(Parser.parseExpr("a /* block\n comment */ + b") ==
      Bin("+", ColRef(None, "a"), ColRef(None, "b")))
    // `--` is a comment, never subtraction-of-negation (standard SQL)
    assert(Parser.parseExpr("a --1\n") == ColRef(None, "a"))
  }

  test("BETWEEN family, cast, array literal/access, JSON ops") {
    assert(Parser.parseExpr("v NOT BETWEEN SYMMETRIC 5 AND 1") ==
      Between(ColRef(None, "v"), IntLit(5), IntLit(1), not = true, symmetric = true))
    assert(Parser.parseExpr("a :: INTEGER") == Cast(ColRef(None, "a"), TInt))
    assert(Parser.parseExpr("CAST(a AS STRING)") == Cast(ColRef(None, "a"), TString))
    assert(Parser.parseExpr("{1, 2, 3}") == ArrLit(Seq(IntLit(1), IntLit(2), IntLit(3))))
    assert(Parser.parseExpr("a[0]") == ArrIndex(ColRef(None, "a"), 0))
    assert(Parser.parseExpr("a[1:3]") == ArrSlice(ColRef(None, "a"), Some(1), Some(3)))
    assert(Parser.parseExpr("j -> 'k'") == Bin("->", ColRef(None, "j"), StrLit("k")))
    assert(Parser.parseExpr("j #> {'a','b'}") ==
      Bin("#>", ColRef(None, "j"), ArrLit(Seq(StrLit("a"), StrLit("b")))))
  }

  test("scalar function calls parse") {
    assert(Parser.parseExpr("IFNULL(SIN(a), 0.5)") ==
      Fn("IFNULL", Seq(Fn("SIN", Seq(ColRef(None, "a"))), NumLit(0.5))))
    assert(Parser.parseExpr("TOPK(v, 3)") == Agg("TOPK", Seq(ColRef(None, "v"), IntLit(3))))
    assert(Parser.parseExpr("COUNT(*)") == Agg("COUNT", Nil, star = true))
  }

  test("admin verbs (AST.hs:806-906)") {
    assert(Parser.parse("SHOW STREAMS;") == Show("STREAMS"))
    assert(Parser.parse("DROP STREAM s1 IF EXISTS;") == DropStmt("STREAM", "s1", true))
    assert(Parser.parse("TERMINATE QUERY q1;") == Terminate("q1"))
    assert(Parser.parse("PAUSE QUERY q1;") == PauseStmt("q1"))
    assert(Parser.parse("RESUME QUERY q1;") == ResumeStmt("q1"))
    Parser.parse("EXPLAIN SELECT a FROM s1;") match {
      case Explain(SelectStmt(_)) => case other => fail(other.toString)
    }
  }

  test("reference syntax corpus (hstream-sql/etc/syntax-test-cases.yaml)") {
    // statements the reference's generated corpus requires to PARSE
    val mustParse = Seq(
      "select * from s;",
      "select*from s;",
      "select c->>'season_id' from production_changes EMIT CHANGES;",
      "select c ->> 'season_id' from production_changes EMIT CHANGES;",
      "select c->'season_id' from production_changes EMIT CHANGES;",
      "select a-b from s emit changes;",
      "select a -b from s emit changes;",
      "select SPLIT('a.b.c', x) from s emit changes;",
      "select x between 0 and 42 from s emit changes;",
      "select x not between 0 and 42 from s emit changes;",
      "select x between symmetric 0 and 42 from s emit changes;",
      "select not x between 0 and 42 from s emit changes;",
      "select DATE '2021-08-07' from s;",
      "select TIME '10:41:03' from s;",
      "select TIME '01:02:03.456' from s;",
      "select TIMESTAMP '2023-06-30T12:30:45+02:00' from s;",
      "select INTERVAL 5 SECOND from s;",
      "select {'aa', 'bb', 'cc'} from s;",
      "select {} from s;",
      "select { } from s;",
      "select {{'aa', 'bb', 'cc'}, {'aa', 'bb'}} from s;",
      "select ({'aa', 'bb', 'cc'})[0] from s;",
      "select ({'aa', 'bb', 'cc'})[0 : 2] from s;",
      """insert into s values cast ('{"x": 42}' as jsonb);""",
      """insert into s values '{"x": 42}' :: jsonb;""",
      "insert into s values cast ('binary_value' as bytea);",
      "insert into s values 'binary_value' :: bytea;",
      """create source connector source01 from mysql with ("host" = 'mysql-s1', "port" = 3306);""",
      """create sink connector sink01 to postgresql if not exist with ("stream" = 's1');""",
      "pause connector source01;",
      "resume connector source01;",
      "drop connector source01;")
    mustParse.foreach { stmt =>
      try Parser.parse(stmt)
      catch { case e: Throwable => fail(s"failed to parse: $stmt — ${e.getMessage}") }
    }
    // `a-b` must lex as subtraction, not an identifier with a dash
    assert(Parser.parse("select a-b from s emit changes;").asInstanceOf[SelectStmt]
      .sel.asInstanceOf[Select].items.head == ItemExpr(Bin("-", ColRef(None, "a"), ColRef(None, "b")), None))
    // raw/json insert payload forms
    assert(Parser.parse("""insert into s values '{"x": 1}' :: jsonb;""") ==
      InsertJson("s", """{"x": 1}"""))
    assert(Parser.parse("insert into s values 'bv' :: bytea;") == InsertRaw("s", "bv"))
    // statements the corpus requires to FAIL
    Seq("select * from s", "anyhow", "select a- b from (select) x;")
      .foreach { stmt =>
        assertThrows[Exception](Parser.parse(stmt))
      }
  }

  test("literals: date/time/timestamp/interval, negatives, quoted idents") {
    assert(Parser.parseExpr("DATE '2024-01-01'") == DateLit("2024-01-01"))
    assert(Parser.parseExpr("TIMESTAMP '2024-01-01 00:00:00'") ==
      TimestampLit("2024-01-01 00:00:00"))
    assert(Parser.parseExpr("INTERVAL 5 MINUTE") == IntervalLit(5, "MINUTE"))
    assert(Parser.parseExpr("-3") == IntLit(-3))
    assert(Parser.parseExpr("-3.5") == NumLit(-3.5))
    assert(Parser.parseExpr("\"Weird Name\"") == ColRef(None, "Weird Name"))
  }

  test("ORDER BY / LIMIT extension (SURVEY §2.7 — absent from SQL-v1.cf)") {
    val s = Parser.parse(
      "SELECT a, b FROM s1 ORDER BY b DESC, a LIMIT 10;")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[Select]
    assert(s.orderBy == Seq(OrderItem(ColRef(None, "b"), desc = true),
      OrderItem(ColRef(None, "a"), desc = false)))
    assert(s.limit.contains(10L))
    // NULLS FIRST/LAST (r10): explicit placement parses per key;
    // unwritten stays None (the DuckDB nulls-last default applies later)
    val nf = Parser.parse(
      "SELECT a, b FROM s1 ORDER BY b DESC NULLS FIRST, a NULLS LAST, c;")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[Select]
    assert(nf.orderBy == Seq(
      OrderItem(ColRef(None, "b"), desc = true, nullsLast = Some(false)),
      OrderItem(ColRef(None, "a"), desc = false, nullsLast = Some(true)),
      OrderItem(ColRef(None, "c"), desc = false, nullsLast = None)))
    // LIMIT alone; explicit ASC; expression keys
    val t = Parser.parse("SELECT a FROM s1 LIMIT 3;").asInstanceOf[SelectStmt].sel.asInstanceOf[Select]
    assert(t.orderBy.isEmpty && t.limit.contains(3L))
    val u = Parser.parse("SELECT a FROM s1 ORDER BY a * 2 ASC;")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[Select]
    assert(u.orderBy == Seq(OrderItem(Bin("*", ColRef(None, "a"), IntLit(2)), desc = false))
      && u.limit.isEmpty)
  }

  test("set operations: precedence, ALL, trailing clauses bind to the tree") {
    val q = Parser.parse(
      "SELECT a FROM s UNION ALL SELECT a FROM t ORDER BY a LIMIT 5;")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[SetOp]
    assert(q.op == "union" && q.all)
    assert(q.orderBy == Seq(OrderItem(ColRef(None, "a"), desc = false)))
    assert(q.limit.contains(5L))
    // branch selects carry no trailing clauses of their own
    assert(q.l.asInstanceOf[Select].orderBy.isEmpty)
    // INTERSECT binds tighter than UNION (standard precedence):
    // A UNION B INTERSECT C = A UNION (B INTERSECT C)
    val p2 = Parser.parse(
      "SELECT a FROM x UNION SELECT a FROM y INTERSECT SELECT a FROM z;")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[SetOp]
    assert(p2.op == "union" && !p2.all)
    assert(p2.r.asInstanceOf[SetOp].op == "intersect")
    // parenthesized branch with branch-level LIMIT
    val p3 = Parser.parse(
      "(SELECT a FROM x LIMIT 2) UNION SELECT a FROM y;")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[SetOp]
    assert(p3.l.asInstanceOf[Select].limit.contains(2L))
  }

  test("parenthesized query keeps its own trailing clauses; conflicts reject") {
    val q = Parser.parse("(SELECT a FROM s1 ORDER BY a LIMIT 2);")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[Select]
    assert(q.limit.contains(2L) &&
      q.orderBy == Seq(OrderItem(ColRef(None, "a"), desc = false)))
    // EMIT CHANGES inside parens survives as a push query
    assert(Parser.parse("(SELECT a FROM s1 EMIT CHANGES);")
      .asInstanceOf[SelectStmt].sel.emitChanges)
    // inner AND outer trailing clauses: rejected, not silently merged
    val ex = intercept[Exception](
      Parser.parse("(SELECT a FROM s1 LIMIT 2) ORDER BY a;"))
    assert(ex.getMessage.contains("FROM-subquery"))
  }

  test("malformed numeric literals reject with a dialect message (r13 RejectFuzz audit)") {
    // the lexer's digit loop consumes dots, so '1.2.3' is ONE TNum token;
    // and a 20+-digit integer overflows toLong — both previously escaped
    // as raw NumberFormatException instead of IllegalArgumentException
    val big = intercept[IllegalArgumentException](
      Parser.parse("SELECT 99999999999999999999999999999 FROM s1;"))
    assert(big.getMessage.contains("out of 64-bit range"))
    val dots = intercept[IllegalArgumentException](
      Parser.parse("SELECT 1.2.3 FROM s1;"))
    assert(dots.getMessage.contains("bad numeric literal"))
    // the guarded path must not reject what it should accept
    assert(Parser.parse("SELECT 9223372036854775807, 1.25 FROM s1;")
      .asInstanceOf[SelectStmt].sel.asInstanceOf[Select].items ==
      Seq(ItemExpr(IntLit(Long.MaxValue), None),
        ItemExpr(NumLit(1.25), None)))
  }

  test("fixed-arity scalar functions reject wrong arity at parse (r13 RejectFuzz find)") {
    // a dropped comma turns IFNULL(k, -1) into IFNULL(k - 1) — previously
    // this parsed fine and escaped the planner as IndexOutOfBoundsException
    val one = intercept[IllegalArgumentException](
      Parser.parse("SELECT IFNULL(k - 1) FROM s1;"))
    assert(one.getMessage.contains("exactly 2 arguments"))
    val three = intercept[IllegalArgumentException](
      Parser.parse("SELECT ABS(a, b, c) FROM s1;"))
    assert(three.getMessage.contains("exactly 1 argument"))
    // correct arities still parse
    assert(Parser.parse("SELECT IFNULL(k, -1), ABS(v) FROM s1;")
      .isInstanceOf[SelectStmt])
    // ARRAY_JOIN keeps BOTH reference forms (SQL-v1.cf:348): 1-arg joins
    // with "" — the r13 guard over-rejected it (r14 ADVICE fix)
    assert(Parser.parse("SELECT ARRAY_JOIN(a), ARRAY_JOIN(a, ',') FROM s1;")
      .isInstanceOf[SelectStmt])
    val aj3 = intercept[IllegalArgumentException](
      Parser.parse("SELECT ARRAY_JOIN(a, ',', 'x') FROM s1;"))
    assert(aj3.getMessage.contains("1 or 2 arguments"))
  }
}
