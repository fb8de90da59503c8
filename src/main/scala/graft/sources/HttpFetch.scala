package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.{CompletableFuture, ConcurrentHashMap, Semaphore}

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
  * instead of task failures. Matching the reference, the response body
  * is returned for EVERY status (a 404 page is still content);
  * only transport failures produce the (null, "") error row.
  *
  * Scale stance: the reference's cap is GLOBAL (one process); a
  * K-executor cluster with only executor-local semaphores would fetch
  * up to K x perDomain concurrently per domain. So by DEFAULT
  * (`domainPartitions` = -1) urls repartition by domain first — each
  * domain hash-routes to exactly ONE partition, making the executor-
  * local semaphore the global cap, and one slow domain throttles its
  * own partition instead of head-of-line-blocking every worker.
  * Within a partition requests run through async in-flight windows of
  * `windowSize`, so a domain still gets its full `perDomain`
  * concurrency (sequential iteration would silently cap it at 1).
  * Set `domainPartitions` = 0 to keep the caller's partitioning
  * (politeness then only bounds per-executor), or > 0 to pick the
  * partition count explicitly. The driver never touches a URL.
  */
final class HttpFetcher(
    timeoutSeconds: Int = 20,
    perDomain: Int = 2,
    userAgent: String = "graft-crawler/1.0",
    domainPartitions: Int = -1,
    windowSize: Int = 16) extends Fetcher with Serializable {

  def fetch(urls: DataFrame): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val ds = urls.select(col("url"),
      (if (urls.columns.contains("depth")) col("depth")
       else org.apache.spark.sql.functions.lit(0)).cast("int").as("depth"))
      .as[FetchIn]
    val nPart =
      if (domainPartitions == -1) spark.sparkContext.defaultParallelism
      else domainPartitions
    val part =
      if (nPart > 0)
        ds.repartition(nPart, graft.functions.UrlFunctions.domain(col("url")))
      else ds
    val (t, cap, ua, win) = (timeoutSeconds, perDomain, userAgent, windowSize)
    part.mapPartitions { it =>
      val client = HttpFetcher.client(t)
      it.grouped(win).flatMap { chunk =>
        chunk.map(in => in -> HttpFetcher.getAsync(client, in.url, t, cap, ua))
          .map { case (in, fut) =>
            val (payload, ctype) = fut.join()
            FetchOut(in.url, in.depth, payload, ctype)
          }
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

  /** Async GET holding the per-domain permit from before send until the
    * response (or failure) completes. The acquire happens on the task
    * thread, so a hot domain back-pressures its own partition; permits
    * release on the client's completion threads, unblocking it. Any
    * transport failure is a (null, "") row (`http_fetcher.py:53-56`);
    * HTTP error statuses still carry their body, like the reference's
    * unconditional `resp.read()` (`http_fetcher.py:51-54`).
    */
  private def getAsync(client: HttpClient, url: String, timeoutSeconds: Int,
      perDomain: Int, userAgent: String)
      : CompletableFuture[(Array[Byte], String)] = {
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
      client.sendAsync(req, HttpResponse.BodyHandlers.ofByteArray())
        .handle[(Array[Byte], String)] { (resp, err) =>
          if (err != null) (null, "")
          else (resp.body(),
            resp.headers().firstValue("Content-Type").orElse(""))
        }
        .whenComplete((_, _) => s.release())
    } catch {
      case _: Exception =>
        s.release()
        CompletableFuture.completedFuture((null, ""))
    }
  }
}
