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
}
