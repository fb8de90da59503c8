package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single right row
  * with the greatest `rightTs <= leftTs` in the same key group (ties at
  * equal timestamps match — "at or before").
  *
  * Built as a union-tag + running `last(_, ignoreNulls)` over ONE
  * key-partitioned window rather than a join: both sides shuffle once on
  * the key, the window carries a single running value (no per-row
  * candidate set), and there is no row-multiplying equi-join on the key
  * followed by a filter — the classic join+window formulation explodes to
  * |left per key| × |right per key| intermediate rows on hot keys, which
  * at 100 TB is the difference between a linear sort-based pass and an
  * OOM. AQE/salting never needs to get involved because no join exists.
  *
  * Right rows sharing the same (keys, rightTs) are tie-broken
  * deterministically by the value struct itself (`__rv` is the last
  * window sort key): backward picks the greatest value struct, forward
  * the smallest, under struct field-order comparison — the same run
  * always returns the same match whatever the partitioning. Value
  * columns must therefore be of orderable types (atomics/structs/
  * arrays — no maps); pre-aggregate if a semantic winner is needed.
  *
  * `tolerance`: optional maximum age in milliseconds; a match older than
  * `leftTs - tolerance` is nulled out (the row is kept, like a left
  * join). Mirrors the bounded-staleness lookup of stream-stream joins.
  */
object Asof {

  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    val keyCols = keys.map(col)
    // Tag sides into one frame: right rows carry their values in a struct
    // (plus their own ts for the tolerance check); left rows carry their
    // full row. Sorting (ts, side) with right=0 puts a right row at the
    // same timestamp BEFORE the left rows it should match.
    val rTagged = right.select(
      keyCols :+
        col(rightTs).cast("timestamp").as("__ts") :+
        lit(0).as("__side") :+
        struct(unix_millis(col(rightTs).cast("timestamp")).as("__rms") +:
          valueCols.map(col): _*).as("__rv"): _*)
    val lTagged = left.select(
      keyCols :+
        col(leftTs).cast("timestamp").as("__ts") :+
        lit(1).as("__side") :+
        struct(left.columns.map(col): _*).as("__lrow"): _*)
    // unionByName fills the side-specific struct with a typed null.
    val r2 = rTagged.withColumn("__lrow",
      lit(null).cast(lTagged.schema("__lrow").dataType))
    val l2 = lTagged.withColumn("__rv",
      lit(null).cast(rTagged.schema("__rv").dataType))
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r2.unionByName(l2)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val aged = toleranceMs match {
      case Some(ms) =>
        matched.withColumn("__m",
          when(unix_millis(col("__ts")) - col("__m.__rms") <= ms, col("__m")))
      case None => matched
    }
    aged.select(
      left.columns.map(c => col("__lrow").getField(c).as(c)) ++
        valueCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** FORWARD as-of join: for each left row, the single right row with
    * the smallest `rightTs >= leftTs` in the same key group ("at or
    * after" — the "next event after X" lookup). Same union-tag
    * single-window shape as [[joinBackward]], mirrored: left rows sort
    * BEFORE right rows at equal timestamps and the running value is a
    * `first(_, ignoreNulls)` over the FOLLOWING frame.
    *
    * `toleranceMs`: a match further than `leftTs + tolerance` in the
    * future is nulled out (row kept, like a left join).
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    val keyCols = keys.map(col)
    val rTagged = right.select(
      keyCols :+
        col(rightTs).cast("timestamp").as("__ts") :+
        lit(1).as("__side") :+
        struct(unix_millis(col(rightTs).cast("timestamp")).as("__rms") +:
          valueCols.map(col): _*).as("__rv"): _*)
    val lTagged = left.select(
      keyCols :+
        col(leftTs).cast("timestamp").as("__ts") :+
        lit(0).as("__side") :+
        struct(left.columns.map(col): _*).as("__lrow"): _*)
    val r2 = rTagged.withColumn("__lrow",
      lit(null).cast(lTagged.schema("__lrow").dataType))
    val l2 = lTagged.withColumn("__rv",
      lit(null).cast(rTagged.schema("__rv").dataType))
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__rv"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = r2.unionByName(l2)
      .withColumn("__m", first(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val aged = toleranceMs match {
      case Some(ms) =>
        matched.withColumn("__m",
          when(col("__m.__rms") - unix_millis(col("__ts")) <= ms, col("__m")))
      case None => matched
    }
    aged.select(
      left.columns.map(c => col("__lrow").getField(c).as(c)) ++
        valueCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** NEAREST as-of join: for each left row, the right row with the
    * SMALLEST absolute timestamp distance in the key group, ties going
    * to the earlier (backward) side — "closest reading to this event,
    * either direction", the sensor-alignment form of as-of. Composes
    * [[joinBackward]] and [[joinForward]] (each already THE closest
    * candidate on its side, each the linear union-tag window — still
    * no row-multiplying join) and picks per row; `toleranceMs` bounds
    * the distance on both sides. Requires a unique left id column to
    * zip the two sides back together (one hash join on it). Appends
    * `asof_dist_ms` (null when unmatched) after the value columns.
    */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftId: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    val r2 = right.withColumn("__rts0", col(rightTs))
    val vcs = valueCols :+ "__rts0"
    val lms = unix_millis(col(leftTs).cast("timestamp"))
    val b = joinBackward(left, r2, keys, leftTs, rightTs, vcs, toleranceMs)
    val f = joinForward(left, r2, keys, leftTs, rightTs, vcs, toleranceMs)
    val fSide = f.select(col(leftId).as("__id"),
      struct(vcs.map(col): _*).as("__fv"),
      (unix_millis(col("__rts0").cast("timestamp")) - lms).as("__fd"))
    val bRen = vcs.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"__b_$c"))
    val joined = bRen
      .withColumn("__bv", struct(vcs.map(c => col(s"__b_$c").as(c)): _*))
      .withColumn("__bd",
        lms - unix_millis(col("__b___rts0").cast("timestamp")))
      .join(fSide, col(leftId) === col("__id"), "left")
    val chooseB = col("__fd").isNull ||
      (col("__bd").isNotNull && col("__bd") <= col("__fd"))
    val m = when(chooseB, col("__bv")).otherwise(col("__fv"))
    joined.select(
      left.columns.map(col) ++
        valueCols.map(c => m.getField(c).as(c)) :+
        when(chooseB, col("__bd")).otherwise(col("__fd"))
          .as("asof_dist_ms"): _*)
  }
}
