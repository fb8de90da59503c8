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
}
