package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class JobQueueSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private def jobs(rows: (String, String, Int, Int)*): DataFrame =
    rows.map { case (id, st, c, u) => (id, st, ts(c), ts(u), null: String) }
      .toDF("job_id", "status", "created_at", "updated_at", "error")

  test("pickNext takes the oldest PENDING with id tie-break") {
    val j = jobs(("b", "PENDING", 5, 5), ("a", "PENDING", 1, 1),
      ("z", "PENDING", 1, 1), ("r", "RUNNING", 0, 0))
    assert(JobQueue.pickNext(j).select("job_id").as[String].head() == "a")
  }

  test("runNext claims, completes, and propagates failures (ST7)") {
    val j = jobs(("a", "PENDING", 1, 1), ("b", "PENDING", 2, 2))
    val (afterA, idA, outA) = JobQueue.runNext(j, ts(10))(id => s"ran $id")
    assert(idA.contains("a") && outA.contains("ran a"))
    val stA = afterA.select("job_id", "status").as[(String, String)]
      .collect().toMap
    assert(stA == Map("a" -> "DONE", "b" -> "PENDING"))

    val (afterB, idB, outB) = JobQueue.runNext(afterA, ts(11)) { _ =>
      throw new IllegalStateException("boom")
    }
    assert(idB.contains("b") && outB.isEmpty)
    val row = afterB.filter($"job_id" === "b")
      .select("status", "error").as[(String, String)].head()
    assert(row == (("FAILED", "boom")))
    // An empty queue is a no-op.
    val (same, idNone, _) = JobQueue.runNext(afterB, ts(12))(identity)
    assert(idNone.isEmpty && same.count() == 2)
  }

  test("staleSweep fails only RUNNING jobs beyond the cutoff") {
    val j = jobs(("fresh", "RUNNING", 0, 50), ("stale", "RUNNING", 0, 10),
      ("done", "DONE", 0, 5), ("pend", "PENDING", 0, 5))
    val swept = JobQueue.staleSweep(j, ts(40))
      .select("job_id", "status", "error").as[(String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(swept("stale") == (("FAILED", "stale job timeout")))
    assert(swept("fresh") == (("RUNNING", null)))
    assert(swept("done") == (("DONE", null)))
    assert(swept("pend") == (("PENDING", null)))
  }
}
