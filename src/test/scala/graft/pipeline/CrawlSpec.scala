package graft.pipeline

import graft.SparkSpec
import graft.functions.HashFunctions
import graft.sources.{DocBuild, Store}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end golden test of the crawl composition over a synthetic
  * mini-site: scope/blocklist/depth filters, relative-href resolution,
  * file download + extraction, size gate, and incremental re-crawl via
  * the store MERGE (re-run adds zero rows).
  */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private def page(url: String, html: String): (String, Array[Byte], String) =
    (url, html.getBytes("UTF-8"), "text/html; charset=utf-8")

  private val root = "https://ex.com"
  private val site: Seq[(String, Array[Byte], String)] = Seq(
    page(s"$root/index.html",
      """<html><body><h1>Home</h1>
        |<a href="/a.html">a</a>
        |<a href="b.html">b</a>
        |<a href="/logo.png">logo</a>
        |<a href="https://other.org/x.html">ext</a>
        |<a href="/doc.txt">doc</a>
        |<a href="/big.txt">big</a>
        |<a href="/report.docx">rep</a>
        |</body></html>""".stripMargin),
    page(s"$root/a.html",
      """<html><body>Page A<a href="/c.html#frag">c</a></body></html>"""),
    page(s"$root/b.html",
      """<html><body>Page B<a href="/index.html">home</a></body></html>"""),
    page(s"$root/c.html", "<html><body>Page C</body></html>"),
    (s"$root/doc.txt", "plain text doc".getBytes("UTF-8"), "text/plain"),
    (s"$root/big.txt", ("x" * 2000).getBytes("UTF-8"), "text/plain"),
    (s"$root/report.docx",
      DocBuild.docxBytes(Seq("docx line one", "docx line two")),
      "application/vnd.openxmlformats"))

  private def siteDf: DataFrame =
    site.toDF("url", "payload", "content_type")

  test("crawl walks the site with filters, extraction and size gate") {
    val res = Crawl.run(spark, new LocalFetcher(siteDf),
      Seq(s"$root/index.html"),
      CrawlConfig(rootDomain = "ex.com", maxDepth = 5, maxFileBytes = 1000))
    val pages = res.pages
      .select("url", "depth", "text").as[(String, Int, String)]
      .collect().map(p => p._1 -> ((p._2, p._3))).toMap
    assert(pages.keySet == Set(s"$root/index.html", s"$root/a.html",
      s"$root/b.html", s"$root/c.html"))
    assert(pages(s"$root/index.html")._1 == 0)
    assert(pages(s"$root/a.html")._1 == 1)     // root-relative href
    assert(pages(s"$root/b.html")._1 == 1)     // sibling-relative href
    assert(pages(s"$root/c.html")._1 == 2)     // defragmented href
    assert(pages(s"$root/c.html")._2 == "Page C")

    val files = res.files
      .select("url", "depth", "ext", "text", "size_bytes")
      .as[(String, Int, String, String, Long)].collect()
      .map(f => f._1 -> f).toMap
    // .png blocked (F1), other.org out of scope, big.txt over the gate.
    assert(files.keySet == Set(s"$root/doc.txt", s"$root/report.docx"))
    assert(files(s"$root/doc.txt")._4 == "plain text doc")
    assert(files(s"$root/report.docx")._4 == "docx line one\ndocx line two")

    // Hashes follow the normalized-content contract.
    val h = res.pages.filter(col("url") === s"$root/c.html")
      .select(col("content_hash")).as[String].head()
    val want = Seq("Page C").toDF("t")
      .select(HashFunctions.contentHash(col("t"))).as[String].head()
    assert(h == want)
  }

  test("single-page mode fetches only depth 0") {
    val res = Crawl.run(spark, new LocalFetcher(siteDf),
      Seq(s"$root/index.html"),
      CrawlConfig(rootDomain = "ex.com", singlePage = true))
    assert(res.pages.select("url").as[String].collect().toSeq ==
      Seq(s"$root/index.html"))
  }

  test("exclusive_depth overrides max_depth_root as the cap") {
    val res = Crawl.run(spark, new LocalFetcher(siteDf),
      Seq(s"$root/index.html"),
      CrawlConfig(rootDomain = "ex.com", maxDepth = 5,
        exclusiveDepth = Some(1), maxFileBytes = 1000))
    val urls = res.pages.select("url").as[String].collect().toSet
    // c.html sits at depth 2 — beyond the exclusive cap of 1.
    assert(urls == Set(s"$root/index.html", s"$root/a.html",
      s"$root/b.html"))
  }

  test("download_files=false crawls pages but skips every file") {
    val res = Crawl.run(spark, new LocalFetcher(siteDf),
      Seq(s"$root/index.html"),
      CrawlConfig(rootDomain = "ex.com", maxDepth = 5,
        downloadFiles = false))
    assert(res.pages.count() == 4)
    assert(res.files.count() == 0)
  }

  test("documents_only persists files only but still walks the links") {
    val res = Crawl.run(spark, new LocalFetcher(siteDf),
      Seq(s"$root/index.html"),
      CrawlConfig(rootDomain = "ex.com", maxDepth = 5,
        documentsOnly = true))
    assert(res.pages.count() == 0)
    // Both files (doc.txt under the default 25 MB gate, report.docx)
    // were still discovered via the crawled pages' links.
    assert(res.files.select("url").as[String].collect().toSet ==
      Set(s"$root/doc.txt", s"$root/big.txt", s"$root/report.docx"))
  }

  test("max_pages_total budget truncates the crawl deterministically") {
    // 12-page site: index -> p01..p11. Budget 5 = index (round 1) +
    // the first 4 links by (depth, url) order.
    val links = (1 to 11).map(i => f"<a href=\"/p$i%02d.html\">$i</a>")
    val bigSite = (page(s"$root/index.html",
      s"<html><body>${links.mkString}</body></html>") +:
      (1 to 11).map(i =>
        page(f"$root/p$i%02d.html", s"<html><body>Page $i</body></html>")))
      .toDF("url", "payload", "content_type")
    val res = Crawl.run(spark, new LocalFetcher(bigSite),
      Seq(s"$root/index.html"),
      CrawlConfig(rootDomain = "ex.com", maxPagesTotal = 5))
    val urls = res.pages.select("url").as[String].collect().toSet
    assert(urls == Set(s"$root/index.html", s"$root/p01.html",
      s"$root/p02.html", s"$root/p03.html", s"$root/p04.html"))
  }

  test("one round never double-extracts a file linked at two depths") {
    // A mixed-depth frontier (the streaming micro-batch shape): both
    // pages link the same file; it must be fetched once, keeping the
    // first-arrival (min) depth.
    val dupSite = Seq(
      page(s"$root/a.html",
        """<html><body><a href="/dup.txt">d</a></body></html>"""),
      page(s"$root/b.html",
        """<html><body><a href="/dup.txt">d</a></body></html>"""),
      (s"$root/dup.txt", "dup text".getBytes("UTF-8"), "text/plain"))
      .toDF("url", "payload", "content_type")
    val frontier = Seq((s"$root/a.html", 1), (s"$root/b.html", 2))
      .toDF("url", "depth")
    val out = Crawl.round(new LocalFetcher(dupSite), frontier,
      Seq.empty[String].toDF("url"), CrawlConfig(rootDomain = "ex.com"))
    val files = out.files.select("url", "depth").as[(String, Int)].collect()
    assert(files.toSeq == Seq((s"$root/dup.txt", 1)))
  }

  test("toPageRecords pins the reference's PageRecord shape") {
    def sha1Hex(s: String): String =
      java.security.MessageDigest.getInstance("SHA-1")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val res = Crawl.run(spark, new LocalFetcher(siteDf),
      Seq(s"$root/index.html"),
      CrawlConfig(rootDomain = "ex.com", maxDepth = 5))
    val recs = Crawl.toPageRecords(res.pages, jobId = "job-7",
      baseDir = "/store/excom", agentId = "agent-x", projectId = 42)
    assert(recs.columns.toSeq == Seq("page_id", "job_id", "url", "domain",
      "depth", "text_path", "content_type", "content_hash", "text_len",
      "agent_id", "project_id"))
    val r = recs.filter($"url" === s"$root/a.html").collect().head
    assert(r.getAs[String]("page_id") == sha1Hex(s"$root/a.html"))
    assert(r.getAs[String]("text_path") ==
      s"/store/excom/pages/text/${sha1Hex(s"$root/a.html")}.txt")
    assert(r.getAs[String]("domain") == "ex.com")
    assert(r.getAs[String]("job_id") == "job-7")
    assert(r.getAs[String]("agent_id") == "agent-x")
    assert(r.getAs[Int]("project_id") == 42)

    val fRecs = Crawl.toFileRecords(res.files, jobId = "job-7",
      baseDir = "/store/excom", agentId = "agent-x", projectId = 42)
    assert(fRecs.columns.toSeq == Seq("file_id", "job_id", "url", "domain",
      "depth", "file_path", "content_type", "size_bytes", "agent_id",
      "project_id", "content_hash"))
    val f = fRecs.filter($"url" === s"$root/doc.txt").collect().head
    assert(f.getAs[String]("file_id") == sha1Hex(s"$root/doc.txt"))
    assert(f.getAs[String]("file_path") ==
      s"/store/excom/files_text/${sha1Hex(s"$root/doc.txt")}.txt")
    assert(f.getAs[String]("content_type") == "text/plain")
    // size_bytes = UTF-8 byte length of the EXTRACTED text
    // (filesystem_store.py:193), not the fetched payload size.
    assert(f.getAs[Long]("size_bytes") == "plain text doc".length.toLong)
  }

  test("incremental re-crawl merges zero changes into the store") {
    val res = Crawl.run(spark, new LocalFetcher(siteDf),
      Seq(s"$root/index.html"), CrawlConfig(rootDomain = "ex.com"))
    val docs = res.pages
      .withColumn("site", lit("ex.com"))
      .select("url", "site", "text", "content_hash")
    val dir = java.nio.file.Files.createTempDirectory("crawl-store").toString
    val path = s"$dir/docs"
    Store.writePartitioned(docs, path, "site")
    // Re-crawl the unchanged site: every page classifies as skip.
    val again = Crawl.run(spark, new LocalFetcher(siteDf),
      Seq(s"$root/index.html"), CrawlConfig(rootDomain = "ex.com"))
    val incoming = again.pages.withColumn("site", lit("ex.com"))
      .select("url", "site", "text", "content_hash")
    assert(Store.mergeInto(spark, path, incoming, "url", "site") == 0)
    assert(Store.read(spark, path).count() == docs.count())
  }
}
