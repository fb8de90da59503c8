package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Job-queue semantics (SURVEY O1/ST1/ST5/ST7,
  * `/root/reference/db/postgres_store.py:26-68`,
  * `/root/reference/workers/worker_daemon.py:24-57`) over a jobs
  * DataFrame (job_id, status, created_at, updated_at, error).
  *
  * The reference coordinates concurrent workers with SKIP LOCKED; the
  * Spark engine schedules from a single driver, so claiming is a plain
  * deterministic top-1 plus a status transition (SURVEY §2.6 O1 note).
  * Statuses: PENDING | RUNNING | DONE | FAILED (schema.sql:56-61).
  */
object JobQueue {

  /** O1: the next job — oldest PENDING, job_id tie-break. Plans as
    * TakeOrderedAndProject (no full sort).
    */
  def pickNext(jobs: DataFrame): DataFrame =
    jobs.filter(col("status") === "PENDING")
      .orderBy(col("created_at"), col("job_id"))
      .limit(1)

  /** One status transition with updated_at/error maintenance. */
  def transition(jobs: DataFrame, jobId: String, to: String,
      error: Option[String], now: Timestamp): DataFrame =
    jobs.select(
      col("job_id"), col("created_at"),
      when(col("job_id") === jobId, lit(to)).otherwise(col("status"))
        .as("status"),
      when(col("job_id") === jobId, lit(now)).otherwise(col("updated_at"))
        .as("updated_at"),
      when(col("job_id") === jobId, lit(error.orNull))
        .otherwise(col("error")).as("error"))

  /** ST5 batch form: RUNNING jobs untouched since `cutoff` fail with
    * the reference's sentinel (`postgres_store.py:58-68`).
    */
  def staleSweep(jobs: DataFrame, cutoff: Timestamp): DataFrame = {
    val stale = col("status") === "RUNNING" && col("updated_at") < lit(cutoff)
    jobs.select(
      col("job_id"), col("created_at"),
      when(stale, lit("FAILED")).otherwise(col("status")).as("status"),
      when(stale, lit(cutoff)).otherwise(col("updated_at")).as("updated_at"),
      when(stale, lit("stale job timeout")).otherwise(col("error")).as("error"))
  }

  /** ST7: claim the next pending job, run `body`, and propagate the
    * outcome — DONE on success, FAILED with the exception message on
    * any error (`crawler_core.py:276-294` semantics: a job never wedges
    * the queue). Returns (updated jobs, claimed job id, result).
    */
  def runNext[T](jobs: DataFrame, now: Timestamp)(
      body: String => T): (DataFrame, Option[String], Option[T]) =
    pickNext(jobs).select("job_id").collect().headOption.map(_.getString(0))
      match {
        case None => (jobs, None, None)
        case Some(id) =>
          val running = transition(jobs, id, "RUNNING", None, now)
          try {
            val out = body(id)
            (transition(running, id, "DONE", None, now), Some(id), Some(out))
          } catch {
            case e: Exception =>
              (transition(running, id, "FAILED",
                Some(Option(e.getMessage).getOrElse(e.getClass.getName)), now),
                Some(id), None)
          }
      }
}
