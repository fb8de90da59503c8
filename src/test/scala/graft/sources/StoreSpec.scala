package graft.sources

import graft.SparkSpec
import graft.operators.Upsert
import org.apache.spark.sql.functions._

/** Physical store semantics: partition layout, merge-by-hash, and the
  * no-write guarantee for unaffected/skip-only partitions.
  */
class StoreSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(rows: Seq[(Long, String, String)]) =
    Upsert.withContentHash(rows.toDF("doc_id", "site", "text"), "text")

  private def files(path: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(path))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("partitioned write + merge rewrites only affected partitions") {
    val dir = java.nio.file.Files.createTempDirectory("store-spec").toString
    val path = s"$dir/docs"
    Store.writePartitioned(hashed(Seq(
      (1L, "a", "one"), (2L, "a", "two"), (3L, "b", "three"))), path, "site")
    assert(new java.io.File(s"$path/site=a").isDirectory)
    assert(new java.io.File(s"$path/site=b").isDirectory)

    val before = files(s"$path/site=b")
    // Update site=a only; site=b files must remain physically untouched.
    val n = Store.mergeInto(spark,
      path, hashed(Seq((1L, "a", "one v2"), (4L, "a", "four"))),
      "doc_id", "site")
    assert(n == 1)
    assert(files(s"$path/site=b") == before)
    val state = Store.read(spark, path)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(state == Map(1L -> "one v2", 2L -> "two", 3L -> "three",
      4L -> "four"))
  }

  test("path_mode site key carries the sha1 start-path suffix") {
    import org.apache.spark.sql.functions.{col, lit}
    def sha1Hex8(s: String): String =
      java.security.MessageDigest.getInstance("SHA-1")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(8)
    val rows = Seq(
      ("ex.com", "https://ex.com/docs/guide/", "d1"),
      ("ex.com", "https://ex.com/docs/guide", "d2"),   // same after rstrip
      ("ex.com", "https://ex.com/blog/", "d3"),
      ("ex.com", "https://ex.com", "d4"))              // no path -> "/"
      .toDF("site", "start_url", "text")
    val got = rows.select(col("start_url"),
      Store.sitePartitionKey(col("site"), col("start_url"), pathMode = true)
        .as("key")).as[(String, String)].collect().toMap
    assert(got("https://ex.com/docs/guide/") ==
      s"ex_com__path_${sha1Hex8("/docs/guide")}")
    assert(got("https://ex.com/docs/guide") ==
      got("https://ex.com/docs/guide/"))
    assert(got("https://ex.com/blog/") == s"ex_com__path_${sha1Hex8("/blog")}")
    assert(got("https://ex.com") == s"ex_com__path_${sha1Hex8("/")}")
    // pathMode off: plain sanitized site key, no suffix.
    val plain = rows.limit(1).select(
      Store.sitePartitionKey(col("site"), col("start_url"), pathMode = false)
        .as("key")).as[String].head()
    assert(plain == "ex_com")

    // Composed into the partitioned layout: different subtrees of one
    // site land in disjoint partition directories.
    val dir = java.nio.file.Files.createTempDirectory("store-spec").toString
    val path = s"$dir/docs"
    Store.writeSitePartitioned(rows, path, "site", "start_url",
      pathMode = true)
    assert(new java.io.File(
      s"$path/site_key=ex_com__path_${sha1Hex8("/docs/guide")}").isDirectory)
    assert(new java.io.File(
      s"$path/site_key=ex_com__path_${sha1Hex8("/blog")}").isDirectory)
    assert(Store.read(spark, path).count() == 4)
  }

  test("bucketed store joins on the bucket key with zero shuffles") {
    val dir = java.nio.file.Files.createTempDirectory("store-spec").toString
    val docs = hashed((1L to 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", s"text $i")))
    val batch = hashed((150L to 250L).map(i => (i, "a", s"text $i v2")))
    Store.writeBucketed(docs, "bk_docs", s"$dir/bk_docs", "doc_id", 4)
    Store.writeBucketed(batch, "bk_batch", s"$dir/bk_batch", "doc_id", 4)
    try {
      val joined = Store.readBucketed(spark, "bk_docs").as("t")
        .join(Store.readBucketed(spark, "bk_batch").hint("merge").as("b"),
          col("t.doc_id") === col("b.doc_id"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join must be shuffle-free, got:\n$physical")
      assert(joined.count() == 51)

      // Shuffle-free standing merge: the full-outer merge join reads
      // the bucketed target with zero exchange — only the (small)
      // incoming batch is shuffled to match the bucket layout.
      val mergePlan = Upsert
        .merge(Store.readBucketed(spark, "bk_docs"), batch, "doc_id")
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(mergePlan).size
      assert(exchanges <= 1,
        s"bucketed merge must only shuffle the batch side, got:\n$mergePlan")

      Store.mergeIntoBucketed(spark, "bk_docs", s"$dir/bk_docs", batch,
        "doc_id", 4)
      val merged = Store.readBucketed(spark, "bk_docs")
      assert(merged.count() == 250)
      assert(merged.filter(col("doc_id") === 160L)
        .select("text").as[String].head() == "text 160 v2")
      assert(merged.filter(col("doc_id") === 10L)
        .select("text").as[String].head() == "text 10")
      assert(!new java.io.File(s"$dir/bk_docs_stage").exists(),
        "stage table files must be cleaned up")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_docs")
      spark.sql("DROP TABLE IF EXISTS bk_docs_stage")
      spark.sql("DROP TABLE IF EXISTS bk_batch")
    }
  }

  test("re-merging an applied batch rewrites nothing at all") {
    val dir = java.nio.file.Files.createTempDirectory("store-spec").toString
    val path = s"$dir/docs"
    Store.writePartitioned(hashed(Seq(
      (1L, "a", "one"), (2L, "b", "two"))), path, "site")
    val batch = hashed(Seq((1L, "a", "one v2")))
    assert(Store.mergeInto(spark, path, batch, "doc_id", "site") == 1)
    val before = files(path)
    assert(Store.mergeInto(spark, path, batch, "doc_id", "site") == 0)
    assert(files(path) == before, "skip-only merge must not touch any file")
  }
}
