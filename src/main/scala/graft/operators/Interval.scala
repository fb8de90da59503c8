package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded INTERVAL-OVERLAP join — "which [start, end) spans collide" —
  * at corpus scale. A direct overlap join is an inequality predicate
  * (`a.s < b.e AND b.s < a.e`), which Spark can only plan as a
  * nested-loop per key; the scale shape instead explodes each interval
  * to the fixed-width time BUCKETS it covers so pairs meet on an EQUI
  * key (keys, bucket). Bucket co-residency overgenerates (two intervals
  * in one bucket need not overlap) and double-counts (a pair can share
  * several buckets) — the exact predicate verifies the former, and the
  * latter is killed WITHOUT a distinct exchange by crediting each pair
  * only in its overlap-start bucket (`greatest(s_a, s_b) div bucket` —
  * a bucket both sides provably cover), the same witness-dedup trick
  * the LSH candidate join uses.
  *
  * Pick `bucketMs` near the typical interval length: explosion factor
  * is ~len/bucket + 1 per interval, per-bucket fanout is the number of
  * concurrent intervals per key (the join's natural output density).
  */
object Interval {

  /** Overlapping pairs within `keys` among [startMs, endMs) intervals:
    * (keys..., a, b, overlap_ms) with a < b by `idCol`. Empty and
    * negative-length intervals are dropped.
    */
  def overlapPairs(df: DataFrame, keys: Seq[String], idCol: String,
      startMs: String, endMs: String, bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val base = df
      .select(keys.map(col) ++ Seq(col(idCol).as("__id"),
        col(startMs).cast("long").as("__s"),
        col(endMs).cast("long").as("__e")): _*)
      .filter(col("__e") > col("__s"))
      .withColumn("__bk", explode(expr(
        s"sequence(__s div $bucketMs, (__e - 1) div $bucketMs)")))
    val a = base.select(keys.map(col) ++ Seq(col("__bk"),
      col("__id").as("a"), col("__s").as("__sa"),
      col("__e").as("__ea")): _*)
    val b = base.select(keys.map(col) ++ Seq(col("__bk"),
      col("__id").as("b"), col("__s").as("__sb"),
      col("__e").as("__eb")): _*)
    a.join(b, keys :+ "__bk")
      .filter(col("a") < col("b"))
      .filter(col("__sa") < col("__eb") && col("__sb") < col("__ea"))
      .filter(col("__bk") ===
        expr(s"greatest(__sa, __sb) div $bucketMs"))
      .select(keys.map(col) ++ Seq(col("a"), col("b"),
        (least(col("__ea"), col("__eb")) -
          greatest(col("__sa"), col("__sb"))).as("overlap_ms")): _*)
  }
}
