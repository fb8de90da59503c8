package graft.sources

import graft.SparkSpec

class JsonIndexSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("p1", "j1", "https://e.com/a", "e.com", 0, "/t/p1.txt", "text/html",
      "h1", 10),
    ("p2", "j1", "https://e.com/b", "e.com", 1, "/t/p2.txt", "text/html",
      "h2", 20))
    .toDF("page_id", "job_id", "url", "domain", "depth", "text_path",
      "content_type", "content_hash", "text_len")

  test("JSONL round trip preserves rows and types") {
    val dir = java.nio.file.Files.createTempDirectory("jx").toString + "/idx"
    JsonIndex.write(rows, dir)
    val back = JsonIndex.read(spark, dir)
    assert(back.schema == JsonIndex.PageIndexSchema)
    assert(back.select("page_id", "depth", "text_len")
      .as[(String, Int, Int)].collect().toSet ==
      Set(("p1", 0, 10), ("p2", 1, 20)))
  }

  test("corrupt lines drop; type-mismatched fields null out (DROPMALFORMED)") {
    val dir = java.nio.file.Files.createTempDirectory("jx").toString
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "part-0.json"),
      """{"page_id":"ok","depth":1,"text_len":5}
        |{not json at all
        |{"page_id":"ok2","depth":"NaN-ish","text_len":7}
        |""".stripMargin)
    val got = JsonIndex.read(spark, dir)
      .select("page_id", "depth").as[(String, Option[Int])].collect().toSet
    // Both the syntactically-broken line and the type-mismatched row
    // drop once the mismatched column is actually projected (JSON
    // malformed-ness is evaluated against the parsed columns).
    assert(got == Set(("ok", Some(1))))
  }

  test("the reference's array-of-objects index reads via multiLine") {
    val dir = java.nio.file.Files.createTempDirectory("jx").toString
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "pages_index.json"),
      """[
        |  {"page_id": "a", "url": "https://e.com/a", "depth": 0},
        |  {"page_id": "b", "url": "https://e.com/b", "depth": 2}
        |]""".stripMargin)
    val got = JsonIndex.readLegacyArray(spark, dir)
    assert(got.select("page_id", "depth").as[(String, Int)].collect().toSet ==
      Set(("a", 0), ("b", 2)))
  }
}
