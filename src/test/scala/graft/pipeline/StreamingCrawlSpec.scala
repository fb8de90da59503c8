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

    // The persistent frontier recorded every crawled page as done.
    val ft = FrontierStore.read(spark, StreamingCrawl.frontierTableDir(dirs))
    val states = ft.select("url", "state").as[(String, String)]
      .collect().toMap
    assert(pages.keySet.forall(u => states.get(u).contains("done")))
  }

  test("crash-resume: the frontier table re-feeds failed urls") {
    val base = java.nio.file.Files.createTempDirectory("scrawl-resume").toString
    val dirs = StreamingCrawl.Dirs(s"$base/frontier", s"$base/pages",
      s"$base/files", s"$base/state", s"$base/ckpt")
    val cfg = CrawlConfig(rootDomain = "ex.com", maxDepth = 4)
    val ftDir = StreamingCrawl.frontierTableDir(dirs)

    // Run 1: b.html is unreachable (dropped from the site) -> the
    // claimed url produces no page and lands `failed` in the table.
    val partial = siteDf.filter($"url" =!= s"$root/b.html")
    StreamingCrawl.seed(spark, dirs, Seq(s"$root/index.html"))
    val q1 = StreamingCrawl.start(spark, new LocalFetcher(partial), dirs, cfg)
    try q1.processAllAvailable() finally q1.stop()
    assert(!spark.read.parquet(dirs.pages).select("url")
      .as[String].collect().contains(s"$root/b.html"))
    val failedRow = FrontierStore.read(spark, ftDir)
      .filter($"state" === "failed")
      .select("url", "retry_count", "last_error")
      .as[(String, Int, String)].collect().toSeq
    assert(failedRow == Seq((s"$root/b.html", 1, "no page fetched")))

    // "Crash": the streaming checkpoint dir is LOST — the frontier
    // table alone must drive the resume.
    def rmrf(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rmrf)); p.delete(): Unit
    }
    rmrf(new java.io.File(dirs.checkpoint))
    // resume() requeues the failed url AND un-claims it from visited,
    // so the restarted stream (site healed) re-fetches it.
    assert(StreamingCrawl.resume(spark, dirs, maxRetries = 3) == 1L)
    assert(!spark.read.parquet(s"${dirs.state}/visited")
      .select("url").as[String].collect().contains(s"$root/b.html"))
    val q2 = StreamingCrawl.start(spark, new LocalFetcher(siteDf), dirs, cfg)
    try q2.processAllAvailable() finally q2.stop()

    assert(spark.read.parquet(dirs.pages).select("url")
      .as[String].collect().count(_ == s"$root/b.html") == 1)
    val after = FrontierStore.read(spark, ftDir)
      .select("url", "state", "retry_count")
      .as[(String, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(after(s"$root/b.html") == (("done", 1)))   // retry history kept
    assert(after.values.forall(_._1 == "done"))
  }
}
