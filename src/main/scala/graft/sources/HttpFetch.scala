package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.{ConcurrentHashMap, Semaphore}

import graft.pipeline.Fetcher
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Typed rows of the fetch stage (top-level for Catalyst encoders). */
final case class FetchIn(url: String, depth: Int)
final case class FetchOut(url: String, depth: Int, payload: Array[Byte],
    content_type: String)

/** S1/ST3: the HTTP fetch source
  * (`/root/reference/crawler/http_fetcher.py:18-56`) as a
  * `mapPartitions` stage: one lazily-created HTTP client per executor
  * JVM, redirects followed, a total-deadline timeout, a PER-DOMAIN
  * concurrency cap (semaphore registry, default 2 — the reference's
  * politeness limit), and errors captured as (null payload, "") rows
  * instead of task failures.
  *
  * Scale stance: with `domainPartitions` set, urls repartition by
  * domain first so one slow domain's politeness cap throttles its own
  * partition instead of head-of-line-blocking every worker, and the
  * semaphore state stays executor-local (no coordination). The driver
  * never touches a URL.
  */
final class HttpFetcher(
    timeoutSeconds: Int = 20,
    perDomain: Int = 2,
    userAgent: String = "graft-crawler/1.0",
    domainPartitions: Int = 0) extends Fetcher with Serializable {

  def fetch(urls: DataFrame): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val ds = urls.select(col("url"),
      (if (urls.columns.contains("depth")) col("depth")
       else org.apache.spark.sql.functions.lit(0)).cast("int").as("depth"))
      .as[FetchIn]
    val part =
      if (domainPartitions > 0)
        ds.repartition(domainPartitions,
          graft.functions.UrlFunctions.domain(col("url")))
      else ds
    val (t, cap, ua) = (timeoutSeconds, perDomain, userAgent)
    part.mapPartitions { it =>
      val client = HttpFetcher.client(t)
      it.map { in =>
        val (payload, ctype) = HttpFetcher.get(client, in.url, t, cap, ua)
        FetchOut(in.url, in.depth, payload, ctype)
      }
    }.toDF()
  }
}

object HttpFetcher {
  @transient private lazy val clients =
    new ConcurrentHashMap[Int, HttpClient]()
  @transient private lazy val domainSems =
    new ConcurrentHashMap[String, Semaphore]()

  /** One shared client per (executor JVM, timeout). */
  private def client(timeoutSeconds: Int): HttpClient =
    clients.computeIfAbsent(timeoutSeconds, t =>
      HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.NORMAL)
        .connectTimeout(Duration.ofSeconds(t.toLong))
        .build())

  private def sem(domain: String, cap: Int): Semaphore =
    domainSems.computeIfAbsent(domain, _ => new Semaphore(cap))

  /** GET with the per-domain cap held for the call; any failure is a
    * (null, "") row (`http_fetcher.py:53-56`).
    */
  private def get(client: HttpClient, url: String, timeoutSeconds: Int,
      perDomain: Int, userAgent: String): (Array[Byte], String) = {
    val domain =
      try new URI(url).getHost match { case null => "" case h => h.toLowerCase }
      catch { case _: Exception => "" }
    val s = sem(domain, perDomain)
    s.acquire()
    try {
      val req = HttpRequest.newBuilder(new URI(url))
        .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
        .header("User-Agent", userAgent)
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() >= 400) (null, "")
      else (resp.body(),
        resp.headers().firstValue("Content-Type").orElse(""))
    } catch {
      case _: Exception => (null, "")
    } finally s.release()
  }
}
