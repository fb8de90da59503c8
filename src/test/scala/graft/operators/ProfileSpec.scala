package graft.operators

import graft.SparkSpec

/** One-scan column profiler. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("columns profiles nulls, distincts, min/max in one pass") {
    val df = Seq(
      (1L, Some("b"), 10), (2L, None, 20), (3L, Some("a"), 10),
      (4L, Some("a"), 30))
      .toDF("id", "s", "v")
    val got = Profile.columns(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 4L, "1", "4")))
    assert(got("s") == (("s", 4L, 1L, 2L, "a", "b")))
    assert(got("v") == (("v", 4L, 0L, 3L, "10", "30")))
  }
}
