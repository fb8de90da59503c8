package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-shuffle ordered funnel. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("stage order and strictly-after semantics") {
    val events = Seq(
      // A completes the whole funnel.
      ("A", "view", 1L), ("A", "click", 2L), ("A", "purchase", 3L),
      // B clicked BEFORE viewing -> stalls at view.
      ("B", "click", 1L), ("B", "view", 2L),
      // C skipped click -> purchase doesn't count.
      ("C", "view", 1L), ("C", "purchase", 2L),
      // D clicked at the same instant as the view -> not strictly after.
      ("D", "view", 5L), ("D", "click", 5L),
      // E never viewed.
      ("E", "click", 1L), ("E", "purchase", 2L))
      .toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Funnel.conversion(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("l1_view" -> 4L, "l2_click" -> 1L,
      "l3_purchase" -> 1L))
  }

  test("sessionize: gap strictly-greater splits, µs-exact durations") {
    // User A: events at 0s, 60s (same session, gap == 60s limit is NOT
    // a split: split needs gap > 60s), 121s (61s gap -> new session).
    // User B: one event.
    val events = Seq(
      ("A", 1L, 0L), ("A", 2L, 60L), ("A", 3L, 121L),
      ("B", 4L, 10L))
      .toDF("user_id", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Funnel.sessionize(events, "user_id", "ts", "event_id",
      gapMinutes = 1)
      .select("user_id", "session_seq", "n_events", "dur_us")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("A", 1L, 2L, 60000000L),   // 0s..60s
      ("A", 2L, 1L, 0L),          // 121s alone
      ("B", 1L, 1L, 0L)))
  }
}
