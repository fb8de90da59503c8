package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Banded interval-overlap join: the bucket explosion must neither
  * double-count pairs that share several buckets nor admit same-bucket
  * pairs that do not actually overlap.
  */
class IntervalSpec extends SparkSpec {
  import spark.implicits._

  test("overlapPairs: exact pairs, witness-dedup across buckets, " +
      "same-bucket non-overlaps rejected") {
    val rows = Seq(
      // key k1: a=[0,250) spans 3 buckets (width 100); b=[150,400)
      // overlaps it in buckets 1 and 2 -> must emit ONCE (100 ms).
      ("k1", 1L, 0L, 250L),
      ("k1", 2L, 150L, 400L),
      // c=[240,260) overlaps a by 10 and b by 20.
      ("k1", 3L, 240L, 260L),
      // d=[90,95) and e=[96,99): same bucket 0, NO overlap.
      ("k1", 4L, 90L, 95L),
      ("k1", 5L, 96L, 99L),
      // other key: identical span as a, must not pair across keys.
      ("k2", 6L, 0L, 250L),
      // zero-length interval drops.
      ("k1", 7L, 50L, 50L))
      .toDF("k", "id", "s", "e")
    val got = Interval.overlapPairs(rows, Seq("k"), "id", "s", "e",
        bucketMs = 100L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(got == Map(
      ("k1", 1L, 2L) -> 100L,
      ("k1", 1L, 3L) -> 10L,
      ("k1", 2L, 3L) -> 20L,
      ("k1", 1L, 4L) -> 5L,
      ("k1", 1L, 5L) -> 3L), s"got $got")
  }
}
