package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Point-in-time join semantics: latest at-or-before match, inclusive
  * boundary, null for no-match, bucket-boundary carry-in, and exact ==
  * bucketed row equality on real data. */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkFrames = {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:30")), // after r1 → matches r1
      (2L, 10L, ts("2024-01-01 00:01:00")), // exactly AT r2 → inclusive
      (3L, 10L, ts("2024-01-03 05:00:00")), // days later → carry across buckets
      (4L, 20L, ts("2024-01-01 00:00:10")), // before this key's only right row
      (5L, 30L, ts("2024-01-01 00:00:10"))  // key absent from right entirely
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), "r1"),
      (10L, ts("2024-01-01 00:01:00"), "r2"),
      (20L, ts("2024-01-01 00:05:00"), "r3")
    ).toDF("k", "t", "v")
    (left, right)
  }

  private val expected = Map(
    1L -> "r1", 2L -> "r2", 3L -> "r2", 4L -> null, 5L -> null)

  test("backward: latest at-or-before match, inclusive tie, null otherwise") {
    val (left, right) = mkFrames
    val out = AsofJoin.backward(left, right, "k", "k", "t", "t", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "v"))
    val got = out.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == expected, s"got $got")
  }

  test("forward: earliest at-or-after match, inclusive tie, null otherwise") {
    val (left, right) = mkFrames
    val out = AsofJoin.forward(left, right, "k", "k", "t", "t", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "v"))
    val got = out.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // id 1 (00:00:30) → next right is r2 (00:01:00); id 2 exactly AT r2 →
    // inclusive; id 3 is after every right row of key 10 → null; id 4 is
    // before key 20's only row → r3; id 5's key is absent → null
    assert(got == Map(1L -> "r2", 2L -> "r2", 3L -> null, 4L -> "r3",
      5L -> null), s"got $got")
  }

  test("backwardBucketed: identical results when matches cross bucket boundaries") {
    val (left, right) = mkFrames
    // 1-minute buckets: row 3's match is ~3 days of empty buckets earlier,
    // row 2's is a same-bucket boundary tie, row 1's is in-bucket
    val out = AsofJoin.backwardBucketed(left, right, "k", "k", "t", "t",
      Seq("v"), bucket = 60L)
    val got = out.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == expected, s"got $got")
  }

  test("backwardBucketed == backward on events (clicks asof purchases), and sort groups are (key, bucket)") {
    import spark.implicits._
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value".as("pv"), $"ts".as("pts"))
    val exact = AsofJoin.backward(clicks, purchases,
      "user_id", "user_id", "ts", "ts", Seq("pv", "pts"))
    val bucketed = AsofJoin.backwardBucketed(clicks, purchases,
      "user_id", "user_id", "ts", "ts", Seq("pv", "pts"), bucket = 3600L)
    assert(exact.count() == clicks.count()) // as-of never explodes rows
    assert(exact.exceptAll(bucketed).isEmpty && bucketed.exceptAll(exact).isEmpty)
    // the scale claim: the bucketed plan's big window partitions by
    // (key, bucket), not the key alone
    val plan = bucketed.queryExecution.optimizedPlan.toString
    assert(plan.contains("__b"), plan.take(2000))
  }

  test("NULL timestamps: left NULL-ts rows match nothing; right NULL-ts rows are never matches") {
    import spark.implicits._
    // key 10 has real right rows plus a NULL-ts right row; a NULL-ts left
    // row must NOT pick the key's earliest (forward) / any (backward) row,
    // and the NULL-ts right row must never be anyone's match — SQL
    // comparisons with NULL are UNKNOWN (DuckDB's ASOF behaves the same)
    val left = Seq(
      (1L, 10L, Some(ts("2024-01-01 00:00:30"))),
      (2L, 10L, None: Option[java.sql.Timestamp])
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, Some(ts("2024-01-01 00:00:00")), "r1"),
      (10L, Some(ts("2024-01-01 00:01:00")), "r2"),
      (10L, None: Option[java.sql.Timestamp], "rNull")
    ).toDF("k", "t", "v")
    for ((name, out) <- Seq(
        "backward" -> AsofJoin.backward(left, right, "k", "k", "t", "t", Seq("v")),
        "forward" -> AsofJoin.forward(left, right, "k", "k", "t", "t", Seq("v")),
        "bucketed" -> AsofJoin.backwardBucketed(left, right, "k", "k", "t", "t",
          Seq("v"), bucket = 60L))) {
      val got = out.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      val want = if (name == "forward") Map(1L -> "r2", 2L -> null)
                 else Map(1L -> "r1", 2L -> null)
      assert(got == want, s"$name: got $got")
      assert(out.count() == 2, s"$name emits every left row exactly once")
    }
  }

  test("payload name collision with a left column is rejected loudly") {
    val (left, right) = mkFrames
    val bad = right.withColumnRenamed("v", "t")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left, bad, "k", "k", "t", "t", Seq("t"))
    }
  }
}
