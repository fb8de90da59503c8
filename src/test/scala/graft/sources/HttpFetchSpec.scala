package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec
import graft.pipeline.{Crawl, CrawlConfig}
import org.apache.spark.sql.functions._

/** Drives the real HTTP fetch stage against an in-JVM HTTP server:
  * payload/content-type capture, 404-body and transport-error rows, the
  * global per-domain concurrency cap (domain routing + async window),
  * and a full crawl through the network stack.
  */
class HttpFetchSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(test: (String, AtomicInteger, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val inFlight = new AtomicInteger(0)
    val maxInFlight = new AtomicInteger(0)
    server.createContext("/", { exchange =>
      val now = inFlight.incrementAndGet()
      maxInFlight.getAndUpdate(m => math.max(m, now))
      Thread.sleep(30)   // widen the overlap window for the cap probe
      try {
        val path = exchange.getRequestURI.getPath
        if (path.startsWith("/missing")) {
          val body = "gone".getBytes("UTF-8")
          exchange.sendResponseHeaders(404, body.length.toLong)
          exchange.getResponseBody.write(body)
        } else {
          val body =
            (if (path == "/") "<html><body>root" +
              "<a href=\"/p1\">1</a><a href=\"/p2\">2</a></body></html>"
             else s"<html><body>page $path</body></html>").getBytes("UTF-8")
          exchange.getResponseHeaders.add("Content-Type",
            "text/html; charset=utf-8")
          exchange.sendResponseHeaders(200, body.length.toLong)
          exchange.getResponseBody.write(body)
        }
      } finally {
        inFlight.decrementAndGet()
        exchange.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16))
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}",
      inFlight, maxInFlight)
    finally server.stop(0)
  }

  test("fetch returns payloads, content types, 404 bodies, and error rows") {
    withServer { (base, _, _) =>
      val fetcher = new HttpFetcher(timeoutSeconds = 5)
      val got = fetcher.fetch(Seq(
        (s"$base/p1", 0), (s"$base/missing", 0),
        ("http://127.0.0.1:1/unroutable", 0)).toDF("url", "depth"))
        .select(col("url"), col("payload").isNull.as("failed"),
          decode(col("payload"), "UTF-8").as("body"), col("content_type"))
        .as[(String, Boolean, Option[String], String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got(s"$base/p1")._1 === false)
      assert(got(s"$base/p1")._3 == "text/html; charset=utf-8")
      // Reference semantics: an HTTP error status still carries its
      // body (http_fetcher.py reads unconditionally) — only transport
      // failures are (null, "") rows.
      assert(got(s"$base/missing") == ((false, Some("gone"), "")))
      assert(got("http://127.0.0.1:1/unroutable") == ((true, None, "")))
    }
  }

  test("default domain routing makes the per-domain cap global") {
    withServer { (base, _, maxInFlight) =>
      maxInFlight.set(0)
      val urls = (1 to 24).map(i => (s"$base/c$i", 0)).toDF("url", "depth")
      // 24 same-domain urls spread over 4 input partitions. The DEFAULT
      // fetcher re-routes by domain (one partition per domain), so even
      // with 4 parallel tasks upstream the server must never see more
      // than perDomain=2 overlapping requests — the cluster-cap
      // invariant. The async window must still reach 2 (sequential
      // iteration would silently cap a routed domain at 1).
      new HttpFetcher(timeoutSeconds = 5, perDomain = 2)
        .fetch(urls.repartition(4)).collect()
      assert(maxInFlight.get() <= 2,
        s"politeness cap violated: ${maxInFlight.get()} in flight")
      assert(maxInFlight.get() == 2,
        "async window never overlapped requests within the domain cap")
    }
  }

  test("each domain hash-routes to exactly one fetch partition") {
    withServer { (base, _, _) =>
      // Same server under two names -> two domains; default routing
      // must put each domain's urls in a single partition (that is what
      // makes the executor-local semaphore a GLOBAL cap on a cluster).
      val localhostBase = base.replace("127.0.0.1", "localhost")
      val urls = ((1 to 8).map(i => (s"$base/a$i", 0)) ++
        (1 to 8).map(i => (s"$localhostBase/b$i", 0))).toDF("url", "depth")
      val perDomainPartitions = new HttpFetcher(timeoutSeconds = 5)
        .fetch(urls.repartition(8))
        .withColumn("pid", spark_partition_id())
        .groupBy(graft.functions.UrlFunctions.domain(col("url")).as("dom"))
        .agg(countDistinct(col("pid")).as("n_parts"))
        .as[(String, Long)].collect().toMap
      assert(perDomainPartitions.keySet == Set("127.0.0.1", "localhost"))
      assert(perDomainPartitions.values.forall(_ == 1L),
        s"domain split across partitions: $perDomainPartitions")
    }
  }

  test("crawl runs end-to-end over the real HTTP fetcher") {
    withServer { (base, _, _) =>
      val res = Crawl.run(spark, new HttpFetcher(timeoutSeconds = 5),
        Seq(s"$base/"), CrawlConfig(rootDomain = "127.0.0.1", maxDepth = 2))
      val pages = res.pages.select("url", "text")
        .as[(String, String)].collect().toMap
      assert(pages.keySet == Set(s"$base/", s"$base/p1", s"$base/p2"))
      assert(pages(s"$base/p1") == "page /p1")
    }
  }
}
