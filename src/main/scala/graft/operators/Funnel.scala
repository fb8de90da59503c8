package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered k-stage FUNNEL conversion — "how many users did A, then B
  * strictly after it, then C strictly after that" — the sessionized
  * conversion metric every event pipeline reports.
  *
  * ONE shuffle total: events collect per user (sorted in-row), then
  * each stage's first-completion time is a pure array expression over
  * the previous stage's — `array_min` of the stage's events filtered
  * to strictly-after the prior time. A null (stage never completed)
  * propagates through the strictly-after comparison, so later stages
  * cascade to null for free. Per-task memory is bounded by one user's
  * event count, never the corpus.
  */
object Funnel {

  /** Per-stage completing-user counts: (stage, n_users), stage labeled
    * `l<i>_<name>` so the output orders by funnel position.
    */
  def conversion(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val perUser = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("t"),
        col(typeCol).as("y")))).as("evs"))
    val withTimes = stages.zipWithIndex.foldLeft(perUser) {
      case (df, (stage, i)) =>
        val after =
          if (i == 0) filter(col("evs"), e => e.getField("y") === stage)
          else filter(col("evs"), e =>
            e.getField("y") === stage && e.getField("t") > col(s"__t${i - 1}"))
        df.withColumn(s"__t$i",
          array_min(transform(after, e => e.getField("t"))))
    }
    val rows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(s"l${i + 1}_$stage").as("stage"),
        col(s"__n$i").as("n_users"))
    }
    val aggs = stages.indices.map(i =>
      sum(when(col(s"__t$i").isNotNull, 1L).otherwise(0L)).as(s"__n$i"))
    withTimes
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage"), col("r.n_users"))
  }

  /** Gap-based SESSIONIZATION (the batch twin of the streaming
    * `session_window` aggregate): per user, events ordered by
    * (ts, id) start a new session whenever the gap from the previous
    * event exceeds `gapMinutes`; returns one row per session —
    * (user, session_seq, n_events, dur_us).
    *
    * One exchange on the user key serves everything: the lag window,
    * the running boundary sum, and the final per-session aggregate all
    * share the same partitioning. Durations stay integer microseconds
    * end-to-end — no float time math anywhere.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0, s"gapMinutes must be positive, got $gapMinutes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val us = unix_micros(col(tsCol))
    val gapUs = gapMinutes * 60L * 1000000L
    val prev = lag(us, 1).over(w)
    events
      .withColumn("__new",
        when(prev.isNull || us - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(us) - min(us)).as("dur_us"))
  }
}
