package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.pipeline.{Crawl, CrawlConfig}
import org.apache.spark.sql.functions._

/** Counts live fake renderers across the test JVM. */
object FakeRenderers {
  val open = new AtomicInteger(0)
  val created = new AtomicInteger(0)
}

/** A fake browser: "renders" a page whose DOM embeds the url and a
  * script-injected link (what static fetch would miss).
  */
class FakeFactory extends RendererFactory {
  def create(): PageRenderer = {
    FakeRenderers.open.incrementAndGet()
    FakeRenderers.created.incrementAndGet()
    new PageRenderer {
      def render(url: String): String = {
        if (url.contains("boom")) throw new IllegalStateException("crash")
        val next = url.last.toString.toIntOption.map(_ + 1).getOrElse(0)
        s"""<html><body>rendered $url<a href="/p$next">n</a></body></html>"""
      }
      def close(): Unit = FakeRenderers.open.decrementAndGet()
    }
  }
}

class JsRenderSpec extends SparkSpec {
  import spark.implicits._

  test("renders pages, captures failures, closes every renderer") {
    FakeRenderers.open.set(0)
    val urls = Seq(("https://ex.com/p1", 0), ("https://ex.com/boom", 0))
      .toDF("url", "depth").repartition(2)
    val got = new JsRenderFetcher(new FakeFactory, poolSize = 2)
      .fetch(urls)
      .select(col("url"), col("payload").isNull.as("failed"))
      .as[(String, Boolean)].collect().toMap
    assert(got == Map("https://ex.com/p1" -> false,
      "https://ex.com/boom" -> true))
    assert(FakeRenderers.open.get() == 0, "renderer leaked past task end")
  }

  test("crawl composes over the JS-rendered fetcher") {
    val res = Crawl.run(spark, new JsRenderFetcher(new FakeFactory),
      Seq("https://ex.com/p1"),
      CrawlConfig(rootDomain = "ex.com", maxDepth = 2))
    val pages = res.pages.select("url", "depth")
      .as[(String, Int)].collect().toMap
    // p1 -> /p2 -> /p3 (depth cap stops expansion past 2).
    assert(pages == Map("https://ex.com/p1" -> 0,
      "https://ex.com/p2" -> 1, "https://ex.com/p3" -> 2))
    assert(FakeRenderers.open.get() == 0)
  }
}
