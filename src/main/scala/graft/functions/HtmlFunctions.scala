package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML -> text/links projections (SURVEY F16/X1,
  * `/root/reference/crawler/link_extractor.py:7-21`) as codegen'd regex
  * compositions: drop script/style subtrees, strip tags, collapse
  * whitespace; hrefs via one regexp_extract_all. No DOM parser ships
  * with the environment — the regex form is the documented SURVEY M7
  * fallback and is shared verbatim by the f16/x1 oracle queries and the
  * Crawl pipeline.
  */
object HtmlFunctions {

  /** Visible text: script/style removed, tags stripped, whitespace
    * collapsed, trimmed.
    */
  def htmlToText(html: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
          "(?s)<style[^>]*>.*?</style>", " "),
        "<[^>]+>", " "),
      "\\s+", " "))

  /** All href attribute values, in document order. */
  def hrefs(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]*)\""), lit(1))
}
