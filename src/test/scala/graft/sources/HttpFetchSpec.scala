package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec
import graft.pipeline.{Crawl, CrawlConfig}
import org.apache.spark.sql.functions._

/** Drives the real HTTP fetch stage against an in-JVM HTTP server:
  * payload/content-type capture, 404/error rows, the per-domain
  * concurrency cap, and a full crawl through the network stack.
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
          exchange.sendResponseHeaders(404, -1)
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

  test("fetch returns payloads, content types, and error rows") {
    withServer { (base, _, _) =>
      val fetcher = new HttpFetcher(timeoutSeconds = 5)
      val got = fetcher.fetch(Seq(
        (s"$base/p1", 0), (s"$base/missing", 0),
        ("http://127.0.0.1:1/unroutable", 0)).toDF("url", "depth"))
        .select(col("url"), col("payload").isNull.as("failed"),
          col("content_type"))
        .as[(String, Boolean, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(!got(s"$base/p1")._1)
      assert(got(s"$base/p1")._2 == "text/html; charset=utf-8")
      assert(got(s"$base/missing") == ((true, "")))
      assert(got("http://127.0.0.1:1/unroutable") == ((true, "")))
    }
  }

  test("per-domain cap bounds concurrent requests to one host") {
    withServer { (base, _, maxInFlight) =>
      maxInFlight.set(0)
      val urls = (1 to 24).map(i => (s"$base/c$i", 0)).toDF("url", "depth")
      // 24 urls across 4 partitions, cap 2 -> server must never see
      // more than 2 overlapping requests even with 4 parallel tasks.
      new HttpFetcher(timeoutSeconds = 5, perDomain = 2)
        .fetch(urls.repartition(4)).collect()
      assert(maxInFlight.get() <= 2,
        s"politeness cap violated: ${maxInFlight.get()} in flight")
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
