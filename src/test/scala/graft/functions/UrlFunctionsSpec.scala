package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL-operator vectors from the reference crawler
  * (`/root/reference/utils.py:6-8`, `crawler/link_extractor.py:19-20`,
  * `crawler/crawler_core.py:22-30`).
  */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, url: String): String =
    Seq(url).toDF("u").select(c).as[String].head()

  test("domain: lowercases and strips only a leading www.") {
    val cases = Seq(
      "https://WWW.Example.COM/x" -> "example.com",
      "https://sub.www.example.com/" -> "sub.www.example.com",
      "http://example.com" -> "example.com",
      "https://wwwx.example.com/" -> "wwwx.example.com")
    cases.foreach { case (u, want) =>
      assert(one(UrlFunctions.domain(col("u")), u) == want, u)
    }
  }

  test("defragment / stripQuery / ext") {
    assert(one(UrlFunctions.defragment(col("u")), "https://e.com/a#b#c") ==
      "https://e.com/a")
    assert(one(UrlFunctions.stripQuery(col("u")), "https://e.com/a?x=1#b") ==
      "https://e.com/a")
    assert(one(UrlFunctions.ext(col("u")), "https://e.com/a/B.PDF?dl=1") == ".pdf")
    assert(one(UrlFunctions.ext(col("u")), "https://e.com/no-ext") == "")
    assert(one(UrlFunctions.ext(col("u")), "https://e.com/a.tar.gz") == ".gz")
  }

  test("resolveUrl handles the urljoin vectors incl. ../ and //host") {
    val base = "https://ex.com/a/b/c.html"
    val cases = Seq(
      "d.html" -> "https://ex.com/a/b/d.html",
      "../up.html" -> "https://ex.com/a/up.html",
      "/root.html" -> "https://ex.com/root.html",
      "//other.com/x" -> "https://other.com/x",
      "https://abs.com/y" -> "https://abs.com/y",
      "?q=1" -> "https://ex.com/a/b/?q=1")
    val got = cases.map(_._1).toDF("href")
      .select(UrlFunctions.resolveUrl(lit(base), col("href"))).as[String]
      .collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("resolveUrl is null-safe on garbage") {
    val got = Seq(("http://[bad", "x")).toDF("base", "href")
      .select(UrlFunctions.resolveUrl(col("base"), col("href"))).as[String]
      .collect()
    assert(got.head == null)
  }

  test("sanitizeSiteKey replaces . : / with _") {
    assert(one(UrlFunctions.sanitizeSiteKey(col("u")), "ex.com:8080/a/b") ==
      "ex_com_8080_a_b")
  }

  test("static blocklist and doc-extension routing") {
    assert(one(when(UrlFunctions.isStaticBlocked(col("u")), "y").otherwise("n"),
      "https://e.com/style.css") == "y")
    assert(one(when(UrlFunctions.isDocUrl(col("u")), "y").otherwise("n"),
      "https://e.com/report.pdf?v=2") == "y")
    assert(one(when(UrlFunctions.isDocUrl(col("u")), "y").otherwise("n"),
      "https://e.com/page.html") == "n")
  }
}
