package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 history build + point-in-time lookup. */
class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("u1", "a", 100L, 1L), ("u1", "a", 200L, 2L), ("u1", "b", 300L, 3L),
    ("u1", "b", 400L, 4L), ("u1", "a", 500L, 5L),
    ("u2", "x", 150L, 6L))
    .toDF("user_id", "state0", "sec", "event_id")
    .withColumn("ts", timestamp_seconds(col("sec")))
    .withColumnRenamed("state0", "event_type")

  test("scd2: runs collapse, intervals chain, last row open") {
    val h = History.scd2(events, "user_id", "event_type", "ts", "event_id")
      .orderBy(col("user_id"), col("version"))
      .as[(String, Int, String, Long, Option[Long], Boolean)]
      .collect().toSeq
    assert(h == Seq(
      ("u1", 1, "a", 100L, Some(300L), false),
      ("u1", 2, "b", 300L, Some(500L), false),
      ("u1", 3, "a", 500L, None, true),
      ("u2", 1, "x", 150L, None, true)))
  }

  test("asOf returns the covering interval only") {
    val h = History.scd2(events, "user_id", "event_type", "ts", "event_id")
    val at350 = History.asOf(h, lit(350L))
      .select(col("user_id"), col("state")).as[(String, String)]
      .collect().toSet
    assert(at350 == Set(("u1", "b"), ("u2", "x")))
    // Boundary: valid_from inclusive, valid_to exclusive.
    val at300 = History.asOf(h, lit(300L))
      .filter(col("user_id") === "u1").select(col("state"))
      .as[String].collect().toSeq
    assert(at300 == Seq("b"))
  }
}
