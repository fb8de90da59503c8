package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history build — the classic
  * data-integration shape downstream of the reference's CDC/upsert
  * surface (A7's last-write-wins keeps only the latest state; SCD2
  * keeps the full validity-interval history so "state as of t" joins
  * stay answerable).
  */
object History {

  /** Collapse an event log into type-2 history rows: one row per run of
    * consecutive identical `state` values per `key`, with
    * `[valid_from, valid_to)` epoch-second bounds, a per-key `version`
    * counter and an `is_current` flag (open interval).
    *
    * `tiebreak` orders events with equal timestamps deterministically.
    *
    * Scale shape: both window passes (change detection, then interval
    * bounds over the surviving change rows) partition by the same key,
    * so the whole build is ONE shuffle — the second window reuses the
    * first's hash partitioning. No driver state, no joins.
    */
  def scd2(events: DataFrame, key: String, state: String, ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val changes = events
      .withColumn("__prev", lag(col(state), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(state))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", unix_timestamp(col(ts)))
      .withColumn("valid_to", unix_timestamp(lead(col(ts), 1).over(w)))
      .select(col(key), col("version"), col(state).as("state"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Point-in-time lookup against an SCD2 frame: the state of each key
    * at epoch second `at` (rows whose validity interval covers it).
    */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
