package graft.pipeline

import graft.SparkSpec

/** The persistent url_frontier table: queued|processing|done|failed
  * transitions, retry accounting, stale-lock detection, and the
  * never-requeue-done invariant.
  */
class FrontierStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rows(urls: (String, Int)*) =
    urls.toSeq.toDF("url", "depth")
      .withColumn("domain", org.apache.spark.sql.functions.lit("ex.com"))

  private def urls(us: String*) = us.toSeq.toDF("url")

  test("enqueue is insert-if-absent per (job, kind, url)") {
    val dir = java.nio.file.Files.createTempDirectory("ft").toString
    FrontierStore.enqueue(dir, "j1", "page", rows("u1" -> 0, "u2" -> 1), 100L)
    FrontierStore.mark(dir, "j1", "page", urls("u1"), FrontierStore.Done, 200L)
    // Re-enqueue: u1 keeps done, u2 keeps its row, u3 inserts queued.
    FrontierStore.enqueue(dir, "j1", "page",
      rows("u1" -> 0, "u2" -> 1, "u3" -> 2), 300L)
    // Same url under another job or kind is a separate row.
    FrontierStore.enqueue(dir, "j2", "page", rows("u1" -> 0), 300L)
    FrontierStore.enqueue(dir, "j1", "file", rows("u1" -> 0), 300L)
    val got = FrontierStore.read(spark, dir)
      .select("job_id", "kind", "url", "state", "updated_at_ms")
      .as[(String, String, String, String, Long)].collect().toSet
    assert(got == Set(
      ("j1", "page", "u1", "done", 200L),
      ("j1", "page", "u2", "queued", 100L),
      ("j1", "page", "u3", "queued", 300L),
      ("j2", "page", "u1", "queued", 300L),
      ("j1", "file", "u1", "queued", 300L)))
  }

  test("mark transitions: lock stamping, retry bump, error capture") {
    val dir = java.nio.file.Files.createTempDirectory("ft").toString
    FrontierStore.enqueue(dir, "j", "page", rows("a" -> 0, "b" -> 0), 10L)
    FrontierStore.mark(dir, "j", "page", urls("a", "b"),
      FrontierStore.Processing, 20L)
    val locked = FrontierStore.read(spark, dir)
      .select("url", "state", "locked_at_ms")
      .as[(String, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(locked("a") == (("processing", Some(20L))))
    FrontierStore.mark(dir, "j", "page", urls("a"), FrontierStore.Done, 30L)
    FrontierStore.mark(dir, "j", "page", urls("b"), FrontierStore.Failed,
      30L, error = "boom")
    // Second failure bumps the retry count again.
    FrontierStore.mark(dir, "j", "page", urls("b"), FrontierStore.Failed,
      40L, error = "boom2")
    val got = FrontierStore.read(spark, dir)
      .select("url", "state", "retry_count", "last_error", "locked_at_ms")
      .as[(String, String, Int, Option[String], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") == (("done", 0, None, None)))        // lock cleared
    assert(got("b") == (("failed", 2, Some("boom2"), None)))
  }

  test("resumable: queued + stale processing + retryable failed only") {
    val dir = java.nio.file.Files.createTempDirectory("ft").toString
    FrontierStore.enqueue(dir, "j", "page",
      rows("q" -> 0, "stale" -> 1, "live" -> 1, "f1" -> 2, "fmax" -> 2,
        "d" -> 3), 0L)
    FrontierStore.mark(dir, "j", "page", urls("stale"),
      FrontierStore.Processing, 1000L)
    FrontierStore.mark(dir, "j", "page", urls("live"),
      FrontierStore.Processing, 9000L)
    FrontierStore.mark(dir, "j", "page", urls("f1"),
      FrontierStore.Failed, 2000L, error = "x")
    (1 to 3).foreach(i => FrontierStore.mark(dir, "j", "page",
      urls("fmax"), FrontierStore.Failed, 2000L + i, error = "x"))
    FrontierStore.mark(dir, "j", "page", urls("d"), FrontierStore.Done, 3000L)
    // now=10000, staleLock=5000 -> "stale" (locked at 1000) is dead,
    // "live" (locked at 9000) is not; maxRetries=3 keeps f1, drops fmax.
    val got = FrontierStore.resumable(spark, dir, "j", "page",
      nowMs = 10000L, staleLockMs = 5000L, maxRetries = 3)
      .as[(String, Int)].collect().toMap
    assert(got == Map("q" -> 0, "stale" -> 1, "f1" -> 2))
    // requeue flips exactly that slice back to queued.
    val re = FrontierStore.requeue(spark, dir, "j", "page",
      nowMs = 10000L, staleLockMs = 5000L, maxRetries = 3)
    assert(re.count() == 3)
    re.unpersist()
    val states = FrontierStore.read(spark, dir)
      .select("url", "state").as[(String, String)].collect().toMap
    assert(states == Map("q" -> "queued", "stale" -> "queued",
      "f1" -> "queued", "live" -> "processing", "fmax" -> "failed",
      "d" -> "done"))
  }

  test("vacuum bounds snapshot growth, keeps the current version") {
    val dir = java.nio.file.Files.createTempDirectory("ft").toString
    FrontierStore.enqueue(dir, "j", "page", rows("u1" -> 0), 100L)   // v0
    FrontierStore.enqueue(dir, "j", "page", rows("u2" -> 1), 200L)   // v1
    FrontierStore.mark(dir, "j", "page", urls("u1"),
      FrontierStore.Done, 300L)                                      // v2
    FrontierStore.mark(dir, "j", "page", urls("u2"),
      FrontierStore.Processing, 400L)                                // v3
    assert(FrontierStore.vacuum(dir, keep = 2) == Seq(0L, 1L))
    // The surviving current snapshot is intact.
    val states = FrontierStore.read(spark, dir)
      .select("url", "state").as[(String, String)].collect().toMap
    assert(states == Map("u1" -> "done", "u2" -> "processing"))
    // The pointed-at version survives even when older than the keep set.
    assert(FrontierStore.vacuum(dir, keep = 1) == Seq(2L))
    assert(FrontierStore.read(spark, dir).count() == 2)
  }

  test("frontier mutations hold the writer lease") {
    val dir = java.nio.file.Files.createTempDirectory("ft").toString
    FrontierStore.enqueue(dir, "j", "page", rows("u1" -> 0), 100L)
    graft.sources.Commits.acquireWriterLock(spark, dir)
    try {
      intercept[IllegalStateException] {
        FrontierStore.enqueue(dir, "j", "page", rows("u2" -> 0), 200L)
      }
      intercept[IllegalStateException] {
        FrontierStore.mark(dir, "j", "page", urls("u1"),
          FrontierStore.Done, 200L)
      }
    } finally graft.sources.Commits.releaseWriterLock(spark, dir)
    // Reads never needed the lease; a released store mutates again.
    FrontierStore.mark(dir, "j", "page", urls("u1"), FrontierStore.Done,
      300L)
    assert(FrontierStore.read(spark, dir)
      .filter(org.apache.spark.sql.functions.col("state") === "done")
      .count() == 1L)
  }
}
