package graft.sources

import graft.SparkSpec
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** S16 against a REAL JDBC database: Derby ships with the Spark
  * distribution, so the relational sink is exercised end-to-end against
  * an in-memory Derby instance — parallel batched INSERT through
  * Spark's JDBC writer, read-back fidelity, and the insert-if-absent
  * micro-batch (duplicate delivery inserts zero rows).
  */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def freshUrl(name: String): String =
    s"jdbc:derby:memory:$name;create=true"

  test("writeJdbc round-trips rows through a real database") {
    val url = freshUrl("graft_rt")
    val rows = Seq((1L, "h1", "alpha"), (2L, "h2", "beta"), (3L, "h3", "gamma"))
      .toDF("doc_id", "content_hash", "text")
    Store.writeJdbc(rows, url, "pages", opts)
    val back = Store.readJdbc(spark, url, "pages", opts)
      .select("doc_id", "content_hash", "text")
      .as[(Long, String, String)].collect().toSet
    assert(back == Set((1L, "h1", "alpha"), (2L, "h2", "beta"),
      (3L, "h3", "gamma")))
  }

  test("reingestToJdbc: index JSON -> blobs -> dedup -> auto-created table") {
    val url = freshUrl("graft_reingest")
    val dir = java.nio.file.Files.createTempDirectory("reingest").toString

    // §3.3 end to end: a JSON-lines page index on disk...
    val index = Seq(
      ("p1", "j1", "https://ex.com/a", "ex.com", 0, "/t/a.txt",
        "text/html", "", 0),
      ("p2", "j1", "https://ex.com/b", "ex.com", 1, "/t/b.txt",
        "text/html", "", 0),
      // ...including a mirror url whose blob has IDENTICAL content.
      ("p3", "j1", "https://ex.com/b-mirror", "ex.com", 2, "/t/bm.txt",
        "text/html", "", 0))
      .toDF("page_id", "job_id", "url", "domain", "depth", "text_path",
        "content_type", "content_hash", "text_len")
    JsonIndex.write(index, s"$dir/pages_index")
    val blobs = Seq(
      ("/t/a.txt", "alpha text"),
      ("/t/b.txt", "beta text"),
      ("/t/bm.txt", "beta text"))
      .toDF("text_path", "text")

    // First batch: no table yet — created by the writer; content dedup
    // keeps one of the two identical-beta rows (lowest page_id).
    val readBack = JsonIndex.read(spark, s"$dir/pages_index")
      .select("page_id", "url", "text_path")
    graft.pipeline.Ingest.reingestToJdbc(readBack, blobs, url,
      "raw_documents", "page_id", opts)
    def state() = Store.readJdbc(spark, url, "raw_documents", opts)
      .select("page_id", "url").as[(String, String)].collect().toSet
    assert(state() == Set(("p1", "https://ex.com/a"),
      ("p2", "https://ex.com/b")))

    // Re-delivery of the same index+blobs inserts zero rows.
    graft.pipeline.Ingest.reingestToJdbc(readBack, blobs, url,
      "raw_documents", "page_id", opts)
    assert(state() == Set(("p1", "https://ex.com/a"),
      ("p2", "https://ex.com/b")))
  }

  test("jdbcInsertIfAbsentBatch is idempotent under duplicate delivery") {
    val url = freshUrl("graft_iia")
    Store.writeJdbc(
      Seq((1L, "h1", "alpha")).toDF("doc_id", "content_hash", "text"),
      url, "pages", opts)
    // Batch: one known hash (skip), one new hash duplicated in-batch
    // (lowest key wins), one more new hash.
    val batch = Seq(
      (10L, "h1", "alpha again"),
      (11L, "h9", "fresh"), (12L, "h9", "fresh copy"),
      (13L, "h7", "other")).toDF("doc_id", "content_hash", "text")
    Streams.jdbcInsertIfAbsentBatch(batch, url, "pages", "doc_id", opts)
    def state() = Store.readJdbc(spark, url, "pages", opts)
      .select("doc_id", "content_hash").as[(Long, String)].collect().toSet
    assert(state() == Set((1L, "h1"), (11L, "h9"), (13L, "h7")))
    // Re-deliver the SAME batch: everything classifies absent-nothing.
    Streams.jdbcInsertIfAbsentBatch(batch, url, "pages", "doc_id", opts)
    assert(state() == Set((1L, "h1"), (11L, "h9"), (13L, "h7")))
  }
}
