package graft.sql

import graft.SparkSpec

/** In-CI half of the NEGATIVE fuzzer: token-corrupted variants of
  * generator-certified queries, classified into legal / rejected (the
  * engine's own IllegalArgumentException) / analysis (delegated to
  * Spark's analyzer) / runtime (ANSI value errors) — with the CRASH
  * class (MatchError, NPE, raw NumberFormatException/IOOBE, …) asserted
  * EMPTY. See RejectFuzz scaladoc for the protocol and the two finds the
  * first roam produced (numeric-literal NFE in the lexer's toLong/
  * toDouble; fixed-arity functions reaching the planner's a(1)).
  *
  * Kept deterministic on purpose (CI must not roam): two pinned seeds.
  * Offline roaming: `sbt "runMain graft.sql.RejectFuzz <seeds> [nBase]"`.
  */
class RejectFuzzSpec extends SparkSpec {

  private def checkSeed(seed: Long, nBase: Int): Unit = {
    FuzzGen.tables(spark, seed, 0)
    val t = RejectFuzz.run(new SqlEngine(spark), seed, nBase)
    assert(t.crashes.isEmpty, t.crashes.mkString("\n"))
    // non-vacuity: the corruptions must actually produce engine
    // rejections (and a healthy majority of them — a broken mutation
    // layer whose mutants all stay legal would certify nothing)
    assert(t.rejected > nBase, s"only ${t.rejected} rejections")
  }

  test("reject fuzzer: pinned seed 2 — no crash-class errors") {
    checkSeed(2L, 40) // seed 2 drew the IFNULL arity find on the first roam
  }

  test("reject fuzzer: pinned seed 5 — no crash-class errors") {
    checkSeed(5L, 40)
  }

  test("reject fuzzer, statement surface: pinned seed 3 — no crash-class errors") {
    val t = RejectFuzz.runDdl(spark, 3L)
    assert(t.crashes.isEmpty, t.crashes.mkString("\n"))
    assert(t.rejected > ddlFloor, s"only ${t.rejected} rejections")
  }
  private val ddlFloor = 12 // ≥ 1 rejection per statement family on average

  test("reject fuzzer, connector lifecycle over a live loopback port (r14)") {
    // the last absent statement family (12/12): with a real listener on
    // the port, legal CREATE CONNECTOR mutants dial a live socket and the
    // PAUSE/RESUME/DROP verbs mutate against a RUNNING connector
    val srv = RejectFuzz.loopback()
    try {
      val t = RejectFuzz.runConnector(spark, 3L, srv.getLocalPort)
      assert(t.crashes.isEmpty, t.crashes.mkString("\n"))
      assert(t.rejected >= 5, s"only ${t.rejected} rejections")
    } finally srv.close()
  }

  test("connector lifecycle under IN-FLIGHT traffic: verbs race live rows, offsets exact (r15)") {
    // PAUSE/RESUME/double-verb/DROP+reCREATE sequences fire WHILE a
    // producer floods the ledger transport; the offset-tracked referee
    // demands every produced record lands exactly once — no loss at a
    // PAUSE boundary, no replay duplication at RESUME, and DROP+reCREATE
    // under the same name resumes the same checkpoint's offsets
    val t = RejectFuzz.runConnectorInflight(spark, 3L, scenarios = 3)
    assert(t.crashes.isEmpty, t.crashes.mkString("\n"))
    assert(t.legal >= 12, s"only ${t.legal} verbs executed — sequence too thin")
    // every drawn verb is a legal statement: ANY classified error means a
    // scenario aborted before its delivery referee ran (a hidden failure)
    assert(t.rejected == 0 && t.analysis == 0 && t.runtime == 0,
      s"classified errors in an all-legal sequence: $t")
  }

  test("connector lifecycle: out-of-order verbs are messaged, never a crash (r14)") {
    val srv = RejectFuzz.loopback()
    val e = new SqlEngine(spark)
    try {
      e.sql("CREATE STREAM rfo_cs (k STRING, v INTEGER, _ts TIMESTAMP);")
      e.sql("CREATE SOURCE CONNECTOR rfo_c FROM socket WITH " +
        s"""("stream" = 'rfo_cs', "port" = ${srv.getLocalPort});""")
      // RESUME before PAUSE: idempotent — and must NOT double-start the
      // query (the restart thunk registers at START; the old resume
      // blindly invoked it, launching a second query on the same
      // checkpoint — the r14 lifecycle find)
      val live = spark.streams.active.length
      e.sql("RESUME CONNECTOR rfo_c;")
      assert(spark.streams.active.length == live,
        "RESUME of a running connector must not start a second query")
      // PAUSE twice: second is a no-op on an already-stopped query
      e.sql("PAUSE CONNECTOR rfo_c;")
      e.sql("PAUSE CONNECTOR rfo_c;")
      // RESUME after PAUSE restarts from the checkpoint
      e.sql("RESUME CONNECTOR rfo_c;")
      // DROP while running
      e.sql("DROP CONNECTOR rfo_c;")
      // verbs on the now-missing name: messaged rejections
      Seq("PAUSE CONNECTOR rfo_c;", "RESUME CONNECTOR rfo_c;",
        "DROP CONNECTOR rfo_c;").foreach { stmt =>
        val ex = intercept[IllegalArgumentException](e.sql(stmt))
        assert(ex.getMessage.contains("does not exist"), s"$stmt: ${ex.getMessage}")
      }
      // DROP … IF EXISTS of a missing connector stays a silent success
      // (dialect order: the IF EXISTS clause follows the name)
      e.sql("DROP CONNECTOR rfo_c IF EXISTS;")
      e.sql("DROP STREAM rfo_cs;")
    } finally srv.close()
  }

  test("connector/stream PORT options reject non-integers with a dialect message") {
    val engine = new SqlEngine(spark)
    val e = intercept[IllegalArgumentException](engine.sql(
      "CREATE STREAM rf_badport (x INTEGER, _ts TIMESTAMP)" +
        " WITH (TRANSPORT = 'socket', PORT = 'abc');"))
    assert(e.getMessage.contains("PORT must be an integer"), e.getMessage)
  }

  test("variable-arity pipeline functions reject via the translate backstop") {
    // through the engine, TypeCheck's own arity/type messages fire first
    // (also IllegalArgumentException — certified by the pinned seeds
    // above); the translate-level backstop exists for direct Translate
    // callers, so drive it directly with a wrong-arity AST
    import org.apache.spark.sql.functions.{array, lit}
    val e = intercept[IllegalArgumentException](
      Translate.column(Ast.Fn("DOT", Seq(Ast.ColRef(None, "x"))),
        _ => array(lit(1.0))))
    assert(e.getMessage.contains("wrong number of arguments"))
  }
}
