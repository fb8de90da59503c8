package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE semantics of `/root/reference/storage/filesystem_store.py:95-128`:
  * the 3-way action matrix and the incremental-crawl invariant that
  * re-merging the same batch is a no-op.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def withHash(rows: Seq[(Long, String)]): DataFrame =
    Upsert.withContentHash(rows.toDF("doc_id", "text"), "text")

  private val target = withHash(Seq(
    1L -> "alpha doc", 2L -> "beta doc", 3L -> "gamma doc"))
  // 1: identical (skip), 2: changed (update), 3: missing (keep), 4: new.
  private val incoming = withHash(Seq(
    1L -> "alpha doc", 2L -> "beta doc v2", 4L -> "delta doc"))

  test("classify emits the full insert/update/skip/keep matrix") {
    val acts = Upsert.classify(target, incoming, "doc_id")
      .select("doc_id", "action").as[(Long, String)].collect().toMap
    assert(acts == Map(1L -> "skip", 2L -> "update", 3L -> "keep", 4L -> "insert"))
  }

  test("merge keeps target rows, takes incoming on insert/update") {
    val merged = Upsert.merge(target, incoming, "doc_id")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(merged == Map(
      1L -> "alpha doc", 2L -> "beta doc v2",
      3L -> "gamma doc", 4L -> "delta doc"))
  }

  test("merge is idempotent: re-merging the same batch is a no-op") {
    val once = Upsert.merge(target, incoming, "doc_id")
    val twice = Upsert.merge(once, incoming, "doc_id")
    val a = once.select("doc_id", "text", "content_hash").collect().toSet
    val b = twice.select("doc_id", "text", "content_hash").collect().toSet
    assert(a == b)
    // And every re-merge action is skip or keep — nothing rewrites.
    val acts = Upsert.classify(once, incoming, "doc_id")
      .select("action").as[String].collect().toSet
    assert(acts.subsetOf(Set("skip", "keep")))
  }

  test("insertIfAbsent drops in-batch and cross-target content dupes") {
    val batch = withHash(Seq(
      10L -> "alpha doc",      // content already in target -> dropped
      11L -> "fresh one",      // new
      12L -> "fresh one",      // in-batch dupe -> lowest id wins
      13L -> "fresh two"))
    val got = Upsert.insertIfAbsent(target, batch, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 13L))
  }

  test("onePerKeyByContent ties on content hash break by the row, " +
      "not arbitrarily") {
    // Same id, same normalized text (hash tie), different metadata:
    // the winner's metadata must be the same on every replay and
    // under every input order — min_by with only the hash as the
    // ordering would pick an unspecified row among the tied keys.
    val rows = Seq(
      (1L, "alpha  doc", "mirror-b"), // normalizes equal to "alpha doc"
      (1L, "alpha doc", "mirror-a"),
      (1L, "alpha doc ", "mirror-c"))
    def resolve(perm: Seq[(Long, String, String)]): (String, String) =
      Upsert.onePerKeyByContent(
          perm.toDF("doc_id", "text", "source").repartition(7),
          "doc_id", "text")
        .select("text", "source").as[(String, String)].collect().head
    val winners = rows.permutations.map(resolve).toSet
    assert(winners.size == 1, s"tie resolution flipped: $winners")
    // And the Hashed form agrees with the plain form on the winner.
    val hashed = Upsert.onePerKeyByContentHashed(
        rows.toDF("doc_id", "text", "source"), "doc_id", "text")
      .select("text", "source").as[(String, String)].collect().head
    assert(hashed == winners.head)
  }

  test("applyCdc: latest op wins, delete-last keys vanish") {
    val ops = Seq(
      ("k1", 1L, 1L, "upsert", "a"), ("k1", 2L, 2L, "upsert", "b"),
      ("k2", 1L, 3L, "upsert", "x"), ("k2", 5L, 4L, "delete", ""),
      ("k3", 1L, 5L, "delete", ""), ("k3", 1L, 6L, "upsert", "z"))
      .toDF("key", "sec", "op_id", "op", "payload")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Upsert.applyCdc(ops, "key", "ts", "op_id", "op", "delete")
      .select("key", "payload").as[(String, String)].collect().toMap
    // k1: latest upsert 'b'; k2: delete last -> gone; k3: same ts,
    // higher op_id (the upsert) wins the tie.
    assert(got == Map("k1" -> "b", "k3" -> "z"))
  }
}
