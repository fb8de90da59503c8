package graft.pipeline

import graft.functions.{HashFunctions, HtmlFunctions, UrlFunctions}
import graft.sources.DocExtract
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl job configuration — the engine's `CrawlJob`
  * (`/root/reference/models.py:5-34`) reduced to the fields that shape
  * the dataflow. Defaults mirror the reference's, including
  * `downloadOnlySameDomain = true` (`models.py`
  * download_only_same_domain): offsite document files are skipped
  * unless explicitly enabled.
  */
final case class CrawlConfig(
    rootDomain: String,
    maxDepth: Int = 10,
    singlePage: Boolean = false,
    basePath: String = "/",
    allowedFileExtensions: Seq[String] = UrlFunctions.DocExtensions,
    downloadOnlySameDomain: Boolean = true,
    maxFileBytes: Long = 25000000L,
    // Page budget across the whole crawl (`models.py:23`
    // max_pages_total, default 20000 — declared but unenforced in the
    // reference; enforced here because an unbounded BFS at 100 TB is a
    // cost bug). When a round's frontier would overflow the remaining
    // budget, it is truncated deterministically by (depth, url).
    maxPagesTotal: Int = 20000,
    // `models.py:14` exclusive_depth: overrides max_depth_root as the
    // depth cap when set (`crawler_core.py:89-90`).
    exclusiveDepth: Option[Int] = None,
    // `models.py:16` download_files: false skips file handling entirely
    // (`crawler_core.py:95-96`).
    downloadFiles: Boolean = true,
    // `models.py:10` documents_only: pages are still crawled for their
    // links but only file documents are persisted
    // (`crawler_core.py:217`).
    documentsOnly: Boolean = false) {
  /** The effective depth cap (`crawler_core.py:89-90`). */
  def depthCap: Int = exclusiveDepth.getOrElse(maxDepth)
}

/** Pluggable page source: urls (url) -> (url, payload binary,
  * content_type). Missing rows are fetch failures (dropped, F11). The
  * production implementation is a `mapPartitions` HTTP client with
  * per-domain throttling (S1/ST3); tests and the oracle query join a
  * synthetic in-memory site.
  */
trait Fetcher {
  def fetch(urls: DataFrame): DataFrame
}

/** Fetcher over a prebuilt (url, payload, content_type) DataFrame. */
final class LocalFetcher(site: DataFrame) extends Fetcher {
  def fetch(urls: DataFrame): DataFrame = urls.join(site, Seq("url"))
}

/** Crawl output: fetched HTML pages and extracted file documents. */
final case class CrawlResult(pages: DataFrame, files: DataFrame)

/** The crawl pipeline (SURVEY §3.1) as a BFS driver loop where every
  * round is one distributed plan: frontier -> anti-join visited (J1) ->
  * fetch -> charset decode (F15) -> html text+links (F16/X1) ->
  * absolutize/defragment (C4/C5) -> blocklist + scope filters (F1,
  * F4-F7) -> route into page/file links (X3, F8-F9) -> file extraction
  * (S3-S10, F10-F11) -> frontier expansion (X4, J2).
  *
  * State (visited/enqueued/processed files) lives in DataFrames,
  * reliably checkpointed per round — no driver-side collections, so the
  * same loop runs at cluster scale; depth bounds the loop (<= 10 by
  * default, `/root/reference/models.py:22`).
  */
/** One crawl round's outputs: fetched pages, extracted file documents,
  * and the candidate page links (url, depth) for the next frontier —
  * NOT yet deduplicated against the enqueued set (that is the caller's
  * state: the batch BFS loop or the streaming frontier).
  */
final case class RoundOutput(pages: DataFrame, files: DataFrame,
    pageLinks: DataFrame)

object Crawl {

  private[pipeline] def ensureCheckpointDir(spark: SparkSession): Unit =
    graft.Checkpoints.ensure(spark)

  /** One round over a (url, depth) frontier: scope/depth filters, fetch,
    * decode, text+link extraction, href resolution, blocklist, page/file
    * routing, file download+extraction with size gate. Fetched content
    * is reliably checkpointed — its lineage ends at the network, so it
    * must never be recomputed.
    */
  def round(fetcher: Fetcher, frontier: DataFrame, processedFiles: DataFrame,
      cfg: CrawlConfig): RoundOutput = {
    // F4-F7: scope, depth cap, single-page.
    val inScope = frontier
      .filter(UrlFunctions.domain(col("url")) === cfg.rootDomain)
      .filter(UrlFunctions.path(col("url")).startsWith(cfg.basePath) ||
        (UrlFunctions.path(col("url")).isNull && lit(cfg.basePath == "/")))
      .filter(if (cfg.singlePage) col("depth") === 0 else lit(true))

    // Fetch + decode + keep html (F12, F15, F11).
    val html = fetcher.fetch(inScope)
      .filter(lower(col("content_type")).contains("text/html"))
      .withColumn("html",
        DocExtract.decodeHtmlUdf(col("payload"), col("content_type")))
      .filter(col("html").isNotNull && length(col("html")) > 0)

    // F16 + X1: text + raw hrefs (a UDF cannot run inside an array
    // lambda, so resolution happens after the explode).
    val pages = html.select(col("url"), col("depth"),
      col("content_type"), HtmlFunctions.htmlToText(col("html")).as("text"),
      HtmlFunctions.hrefs(col("html")).as("hrefs"))
      .transform(graft.Checkpoints.pinned)

    // X1/C4/C5: explode, absolutize against the page url, defragment;
    // blocklist + empties dropped (F1). Links carry the PARENT depth.
    val links = pages
      .select(col("depth"), col("url").as("base"),
        explode(col("hrefs")).as("href"))
      .select(col("depth"), UrlFunctions.defragment(
        UrlFunctions.resolveUrl(col("base"), col("href"))).as("url"))
      .filter(col("url").isNotNull && col("url") =!= "")
      .filter(!UrlFunctions.isStaticBlocked(col("url")))

    // X3/F8/F9: file links -> extraction; J3: skip processed.
    // download_files=false drops the whole branch (crawler_core.py:95).
    val fileLinks = links
      .filter(lit(cfg.downloadFiles))
      .filter(UrlFunctions.ext(col("url"))
        .isin(cfg.allowedFileExtensions: _*))
      .filter(if (cfg.downloadOnlySameDomain)
        UrlFunctions.domain(col("url")) === cfg.rootDomain else lit(true))
      // One fetch per file URL within the round: the same file linked
      // at two depths keeps its first-arrival depth (the reference's
      // processed-set semantics) — a (url, depth) distinct would fetch
      // and extract it twice.
      .groupBy(col("url")).agg(min(col("depth")).as("depth"))
      .join(processedFiles, Seq("url"), "left_anti")
    val files = fetcher.fetch(fileLinks)
      .filter(octet_length(col("payload")) <= cfg.maxFileBytes)  // F10
      .withColumn("ext", UrlFunctions.ext(col("url")))
      .withColumn("res",
        DocExtract.extractUdf(col("payload"), col("ext")))
      .select(col("url"), col("depth"), col("ext"), col("content_type"),
        col("res.text").as("text"),
        octet_length(col("payload")).cast("long").as("size_bytes"))
      .filter(length(col("text")) > 0)  // F11
      .transform(graft.Checkpoints.pinned)

    val pageLinks = links
      .filter(!UrlFunctions.ext(col("url"))
        .isin(cfg.allowedFileExtensions: _*))
      .select(col("url"), (col("depth") + 1).as("depth"))

    RoundOutput(pages.select("url", "depth", "content_type", "text"),
      files, pageLinks)
  }

  /** Crawled pages as full `PageRecord` rows
    * (`/root/reference/models.py:43-57`): `page_id` = sha1(url)
    * (`utils.py:11-12`), `text_path` following the store's
    * `pages/text/<page_id>.txt` convention
    * (`filesystem_store.py:89-90`), and the job/tenant stamps. Pure
    * projection — stamping 100 TB of pages adds no shuffle.
    */
  def toPageRecords(pages: DataFrame, jobId: String, baseDir: String,
      agentId: String = "default_agent_id", projectId: Int = 1): DataFrame =
    pages.select(
      sha1(col("url")).as("page_id"),
      lit(jobId).as("job_id"),
      col("url"),
      UrlFunctions.domain(col("url")).as("domain"),
      col("depth"),
      concat(lit(s"${baseDir.stripSuffix("/")}/pages/text/"),
        sha1(col("url")), lit(".txt")).as("text_path"),
      col("content_type"),
      col("content_hash"),
      col("text_len"),
      lit(agentId).as("agent_id"),
      lit(projectId).as("project_id"))

  /** Extracted files as full `FileRecord` rows
    * (`/root/reference/models.py:58-70`): `file_id` = sha1(url),
    * `file_path` following the store's `files_text/<file_id>.txt`
    * convention (`filesystem_store.py:154-157`), and `size_bytes` as
    * the UTF-8 byte length of the EXTRACTED text — the reference
    * overrides the fetch size with it (`filesystem_store.py:193`).
    */
  def toFileRecords(files: DataFrame, jobId: String, baseDir: String,
      agentId: String = "default_agent_id", projectId: Int = 1): DataFrame =
    files.select(
      sha1(col("url")).as("file_id"),
      lit(jobId).as("job_id"),
      col("url"),
      UrlFunctions.domain(col("url")).as("domain"),
      col("depth"),
      concat(lit(s"${baseDir.stripSuffix("/")}/files_text/"),
        sha1(col("url")), lit(".txt")).as("file_path"),
      col("content_type"),
      octet_length(encode(col("text"), "UTF-8")).cast("long")
        .as("size_bytes"),
      lit(agentId).as("agent_id"),
      lit(projectId).as("project_id"),
      col("content_hash"))

  def run(spark: SparkSession, fetcher: Fetcher, seeds: Seq[String],
      cfg: CrawlConfig): CrawlResult = {
    import spark.implicits._
    ensureCheckpointDir(spark)

    val emptyPages = Seq.empty[(String, Int, String, String)]
      .toDF("url", "depth", "content_type", "text")
    val emptyFiles = Seq.empty[(String, Int, String, String, String, Long)]
      .toDF("url", "depth", "ext", "content_type", "text", "size_bytes")

    // Crawl STATE: only each round's DELTA (the frontier) is
    // materialized; the cumulative sets (enqueued urls, processed
    // files) stay LAZY unions over the already-materialized frontier
    // parquet and the pinned file checkpoints — every url is written
    // once across the whole crawl (O(urls) total I/O), instead of
    // rewriting the growing union each round (O(urls x depth)). The
    // union plans are one branch per round — bounded by maxDepth.
    // Fetched CONTENT (pages/files inside `round`) is pinned under the
    // base dir: it is unioned into the final result, so it must
    // outlive the loop.
    val acc = new graft.Checkpoints.Accumulating(spark)

    // Seeds defragmented like every enqueued link (link_extractor.py:20).
    var (frontier, n) = acc.checkpointCounted(seeds.toDF("raw")
      .select(UrlFunctions.defragment(col("raw")).as("url"))
      .distinct().withColumn("depth", lit(0)))
    var enqueued = frontier.select("url")
    var processedFiles = emptyFiles.select("url")
    var pages = emptyPages
    var files = emptyFiles

    // Page budget (max_pages_total): cumulative count of frontier urls
    // fetched. The per-round count rides each frontier checkpoint write
    // as an observed metric (no separate count job), doubles as the
    // loop-exit test, and the truncation is a deterministic TakeOrdered
    // by (depth, url) — same pages on every re-run, no driver-side
    // collection.
    var budget = cfg.maxPagesTotal.toLong
    while (n > 0 && budget > 0) {
      if (n > budget)
        frontier = acc.checkpoint(
          frontier.orderBy(col("depth"), col("url")).limit(budget.toInt))
      budget -= math.min(n, budget)
      val out = round(fetcher, frontier, processedFiles, cfg)
      pages = pages.unionByName(out.pages)
      files = files.unionByName(out.files)
      processedFiles = processedFiles.unionByName(out.files.select("url"))

      // X4/J2: expand one level within the depth cap.
      if (cfg.singlePage) { frontier = frontier.limit(0); n = 0L }
      else {
        val (next, m) = acc.checkpointCounted(out.pageLinks
          .filter(col("depth") <= cfg.depthCap)
          .groupBy(col("url")).agg(min(col("depth")).as("depth"))
          .join(enqueued, Seq("url"), "left_anti"))
        frontier = next
        n = m
      }
      enqueued = enqueued.unionByName(frontier.select("url"))
    }

    // documents_only: pages were still crawled for their links, but
    // only file documents are persisted (crawler_core.py:217).
    val outPages =
      if (cfg.documentsOnly) pages.limit(0) else pages
    CrawlResult(
      outPages
        .withColumn("content_hash", HashFunctions.contentHash(col("text")))
        .withColumn("text_len", length(col("text"))),
      files.withColumn("content_hash", HashFunctions.contentHash(col("text"))))
  }
}
