package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COUNT-MIN SKETCH — the fixed-size frequency summary for heavy-hitter
  * queries over unbounded vocabularies (tokens, urls, user agents). The
  * sketch is depth x width COUNTERS whatever the item cardinality: at
  * 100 TB the bucket table is a few thousand rows that broadcast,
  * while an exact per-item count table would be the vocabulary itself.
  *
  * Estimates are biased high only (min over depth rows of colliding
  * bucket sums >= true count, never below). Hashes are the engine's
  * md5-derived stableHash64, so SQL oracles rebuild the identical
  * sketch bit-for-bit.
  */
object Sketch {

  private def bucket(itemCol: String, width: Int) =
    pmod(HashFunctions.stableHash64(
      concat(lit("cms:"), col("__d"), lit(":"), col(itemCol))),
      lit(width.toLong))

  /** Build the sketch: (d, bucket, s) bucket sums — one shuffle for the
    * per-item pre-count (map-side combining), then a depth-fold into
    * depth x width rows.
    */
  def cmsBuckets(items: DataFrame, itemCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape $depth x $width")
    items
      .groupBy(col(itemCol)).agg(count(lit(1)).as("__n"))
      .select(col(itemCol), col("__n"),
        explode(array((0 until depth).map(lit): _*)).as("__d"))
      .withColumn("__b", bucket(itemCol, width))
      .groupBy(col("__d").as("d"), col("__b").as("b"))
      .agg(sum(col("__n")).as("s"))
  }

  /** Point estimates for `queryItems`' distinct items against a built
    * sketch: min over the depth probes; items hitting only empty
    * buckets estimate 0. The bucket table broadcasts.
    */
  def cmsEstimate(queryItems: DataFrame, buckets: DataFrame,
      itemCol: String, depth: Int, width: Int): DataFrame =
    queryItems
      .select(col(itemCol)).distinct()
      .select(col(itemCol),
        explode(array((0 until depth).map(lit): _*)).as("__d"))
      .withColumn("__b", bucket(itemCol, width))
      .join(broadcast(buckets),
        col("__d") === col("d") && col("__b") === col("b"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("s"), lit(0L))).as("cms_est"))
}
