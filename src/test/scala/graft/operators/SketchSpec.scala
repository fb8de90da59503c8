package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch invariants. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val items = Seq.tabulate(1000)(i => s"tok${i % 37}").toDF("tok")

  test("every depth row conserves the total count") {
    val buckets = Sketch.cmsBuckets(items, "tok", depth = 4, width = 64)
    val perDepth = buckets.groupBy("d").agg(sum("s").as("t"))
      .select("t").as[Long].collect()
    assert(perDepth.length == 4 && perDepth.forall(_ == 1000L))
  }

  test("estimates are never below the true counts, exact when sparse") {
    val buckets = Sketch.cmsBuckets(items, "tok", depth = 4, width = 1024)
    val truth = items.groupBy("tok").agg(count(lit(1)).as("n"))
    val est = Sketch.cmsEstimate(items, buckets, "tok", 4, 1024)
    val joined = truth.join(est, "tok")
      .select("n", "cms_est").as[(Long, Long)].collect()
    assert(joined.nonEmpty && joined.forall { case (n, e) => e >= n })
    // 37 items in 4x1024 buckets: collisions vanishingly unlikely with
    // independent md5-derived rows -> min over depth is exact here.
    assert(joined.forall { case (n, e) => e == n })
    // An unseen item estimates 0.
    val unseen = Sketch.cmsEstimate(Seq("nope").toDF("tok"), buckets,
      "tok", 4, 1024).select("cms_est").as[Long].collect().head
    assert(unseen == 0L)
  }
}
