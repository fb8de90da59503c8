package graft.pipeline

import graft.SparkSpec
import graft.sources.DocBuild
import org.apache.spark.sql.DataFrame

/** The self-feeding streaming frontier against the golden mini-site:
  * must visit exactly what the batch BFS visits, extract the same
  * files, and stay quiescent on restart (everything already visited).
  */
class StreamingCrawlSpec extends SparkSpec {
  import spark.implicits._

  private def page(url: String, html: String): (String, Array[Byte], String) =
    (url, html.getBytes("UTF-8"), "text/html; charset=utf-8")

  private val root = "https://ex.com"
  private val site: Seq[(String, Array[Byte], String)] = Seq(
    page(s"$root/index.html",
      """<html><body><a href="/a.html">a</a><a href="b.html">b</a>
        |<a href="/doc.txt">d</a></body></html>""".stripMargin),
    page(s"$root/a.html",
      """<html><body>A<a href="/c.html">c</a><a href="/index.html">up</a></body></html>"""),
    page(s"$root/b.html", "<html><body>B</body></html>"),
    page(s"$root/c.html", "<html><body>C</body></html>"),
    (s"$root/doc.txt", "plain text doc".getBytes("UTF-8"), "text/plain"))

  private def siteDf: DataFrame = site.toDF("url", "payload", "content_type")

  test("streaming frontier matches the batch BFS and drains to quiet") {
    val base = java.nio.file.Files.createTempDirectory("scrawl").toString
    val dirs = StreamingCrawl.Dirs(s"$base/frontier", s"$base/pages",
      s"$base/files", s"$base/state", s"$base/ckpt")
    val cfg = CrawlConfig(rootDomain = "ex.com", maxDepth = 4)

    StreamingCrawl.seed(spark, dirs, Seq(s"$root/index.html"))
    val q = StreamingCrawl.start(spark, new LocalFetcher(siteDf), dirs, cfg)
    try q.processAllAvailable() finally q.stop()

    val pages = spark.read.parquet(dirs.pages)
      .select("url", "depth").as[(String, Int)].collect().toMap
    val batch = Crawl.run(spark, new LocalFetcher(siteDf),
      Seq(s"$root/index.html"), cfg)
    val want = batch.pages.select("url", "depth")
      .as[(String, Int)].collect().toMap
    assert(pages == want)
    assert(pages(s"$root/c.html") == 2)

    val files = spark.read.parquet(dirs.files)
      .select("url", "text").as[(String, String)].collect().toMap
    assert(files == Map(s"$root/doc.txt" -> "plain text doc"))

    // Restart on the same state: everything visited -> no new rows.
    StreamingCrawl.seed(spark, dirs, Seq(s"$root/index.html"))
    val q2 = StreamingCrawl.start(spark, new LocalFetcher(siteDf), dirs, cfg)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(dirs.pages).count() == pages.size)
  }
}
