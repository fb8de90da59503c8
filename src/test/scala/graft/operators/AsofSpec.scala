package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Backward as-of join semantics on hand-built frames. */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("joinBackward: at-or-before match, per key, nulls when none") {
    val quotes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:02:00"), 11.0),
      (2L, ts("2024-01-01 00:01:00"), 20.0))
      .toDF("k", "ts", "px")
    val trades = Seq(
      (101L, 1L, ts("2024-01-01 00:00:30")), // after 10.0, before 11.0
      (102L, 1L, ts("2024-01-01 00:02:00")), // equal ts -> matches 11.0
      (103L, 2L, ts("2024-01-01 00:00:30")), // before any quote -> null
      (104L, 3L, ts("2024-01-01 00:05:00"))) // key with no quotes -> null
      .toDF("id", "k", "ts")
    val got = Asof
      .joinBackward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      .select($"id", $"px").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(
      101L -> Some(10.0), 102L -> Some(11.0), 103L -> None, 104L -> None))
  }

  test("joinForward: at-or-after match, per key, nulls when none") {
    val quotes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:02:00"), 11.0),
      (2L, ts("2024-01-01 00:01:00"), 20.0))
      .toDF("k", "ts", "px")
    val trades = Seq(
      (101L, 1L, ts("2024-01-01 00:00:30")), // next is 11.0 at 00:02
      (102L, 1L, ts("2024-01-01 00:02:00")), // equal ts -> matches 11.0
      (103L, 1L, ts("2024-01-01 00:03:00")), // after all quotes -> null
      (104L, 2L, ts("2024-01-01 00:00:30")), // next is 20.0
      (105L, 3L, ts("2024-01-01 00:00:00"))) // key with no quotes -> null
      .toDF("id", "k", "ts")
    val got = Asof
      .joinForward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      .select($"id", $"px").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(101L -> Some(11.0), 102L -> Some(11.0),
      103L -> None, 104L -> Some(20.0), 105L -> None))
  }

  test("joinForward: tolerance nulls far-future matches but keeps rows") {
    val quotes = Seq((1L, ts("2024-01-01 00:02:00"), 10.0))
      .toDF("k", "ts", "px")
    val trades = Seq(
      (201L, 1L, ts("2024-01-01 00:01:30")),  // 30 s ahead: fresh
      (202L, 1L, ts("2024-01-01 00:00:00")))  // 120 s ahead: too far
      .toDF("id", "k", "ts")
    val got = Asof
      .joinForward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        toleranceMs = Some(60000L))
      .select($"id", $"px").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(201L -> Some(10.0), 202L -> None))
  }

  test("joinBackward: tolerance nulls stale matches but keeps rows") {
    val quotes = Seq((1L, ts("2024-01-01 00:00:00"), 10.0))
      .toDF("k", "ts", "px")
    val trades = Seq(
      (201L, 1L, ts("2024-01-01 00:00:45")),  // 45 s old: fresh
      (202L, 1L, ts("2024-01-01 00:02:00")))  // 120 s old: stale
      .toDF("id", "k", "ts")
    val got = Asof
      .joinBackward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
        toleranceMs = Some(60000L))
      .select($"id", $"px").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(201L -> Some(10.0), 202L -> None))
  }

  test("joinBackward: left columns survive, multiple value columns") {
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1.5, "a"))
      .toDF("k", "ts", "v", "tag")
    val left = Seq((301L, 1L, ts("2024-01-01 00:01:00"), "keep"))
      .toDF("id", "k", "ts", "note")
    val row = Asof
      .joinBackward(left, right, Seq("k"), "ts", "ts", Seq("v", "tag"))
      .select($"id", $"note", $"v", $"tag")
      .as[(Long, String, Option[Double], Option[String])]
      .collect().head
    assert(row == ((301L, "keep", Some(1.5), Some("a"))))
  }

  test("joinNearest: picks the closer side, ties go backward, " +
      "tolerance bounds both directions") {
    val quotes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:02:00"), 11.0),
      (2L, ts("2024-01-01 00:10:00"), 20.0))
      .toDF("k", "ts", "px")
    val trades = Seq(
      (101L, 1L, ts("2024-01-01 00:00:30")), // 30s back vs 90s fwd -> 10.0
      (102L, 1L, ts("2024-01-01 00:01:30")), // 90s back vs 30s fwd -> 11.0
      (103L, 1L, ts("2024-01-01 00:01:00")), // 60s tie -> backward 10.0
      (104L, 2L, ts("2024-01-01 00:00:00")), // only forward, 600s -> 20.0
      (105L, 3L, ts("2024-01-01 00:00:00"))) // no quotes -> null
      .toDF("id", "k", "ts")
    val got = Asof
      .joinNearest(trades, quotes, Seq("k"), "id", "ts", "ts", Seq("px"))
      .select($"id", $"px", $"asof_dist_ms")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      101L -> ((Some(10.0), Some(30000L))),
      102L -> ((Some(11.0), Some(30000L))),
      103L -> ((Some(10.0), Some(60000L))),
      104L -> ((Some(20.0), Some(600000L))),
      105L -> ((None, None))), s"got $got")
    // Tolerance 60s: trade 104's 600s match nulls out, rows kept.
    val tol = Asof
      .joinNearest(trades, quotes, Seq("k"), "id", "ts", "ts", Seq("px"),
        toleranceMs = Some(60000L))
      .select($"id", $"px").as[(Long, Option[Double])].collect().toMap
    assert(tol(104L).isEmpty && tol.size == 5 && tol(103L).contains(10.0))
  }
}
