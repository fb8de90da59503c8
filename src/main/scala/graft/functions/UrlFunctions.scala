package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL operators from the reference crawler, re-expressed as codegen'd
  * Column compositions (no UDFs):
  *   - domain/path/ext projections (`/root/reference/utils.py:6-8`,
  *     `/root/reference/crawler/crawler_core.py:22-30`)
  *   - defragment + query-strip (`/root/reference/crawler/link_extractor.py:20`)
  *   - the 23-extension static blocklist (`crawler_core.py:15-19`)
  *   - site-key sanitization (`/root/reference/storage/filesystem_store.py:11-17`)
  */
object UrlFunctions {

  /** Extensions the crawler never fetches (assets, media, archives). */
  val StaticExtensions: Seq[String] = Seq(
    ".js", ".css", ".png", ".jpg", ".jpeg", ".gif", ".svg", ".ico",
    ".woff", ".woff2", ".ttf", ".eot", ".mp4", ".mp3", ".avi", ".mov",
    ".wmv", ".flv", ".zip", ".rar", ".gz", ".tar", ".7z")

  /** Default downloadable document extensions (`models.py:26-32`). */
  val DocExtensions: Seq[String] =
    Seq(".pdf", ".doc", ".docx", ".xls", ".xlsx", ".txt")

  /** Host, lowercased, leading `www.` stripped — the reference's
    * `get_domain` intent (`utils.py:6-8`; see SURVEY §7.4 on the
    * any-`www.` replace bug we deliberately do not replicate).
    */
  def domain(url: Column): Column =
    regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")

  /** URL path component. */
  def path(url: Column): Column = parse_url(url, lit("PATH"))

  /** Multi-label public suffixes the registered-domain heuristic
    * recognizes (a working subset of the public-suffix list; the full
    * list is a data file a deployment ships the same way).
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au",
    "co.jp", "co.in", "com.br", "com.cn", "co.nz", "co.za")

  /** REGISTERED DOMAIN (eTLD+1) — the crawl-aggregation key that "one
    * site" actually means: `news.bbc.co.uk` and `sport.bbc.co.uk` are
    * both `bbc.co.uk`, while plain label-counting would call them
    * different sites (or collapse all of `.co.uk`). Last two host
    * labels, or three when the last two are a recognized multi-part
    * public suffix. Pure codegen'd split/slice — no UDF.
    */
  def registeredDomain(url: Column): Column = {
    val d = domain(url)
    val parts = split(d, "\\.")
    val lastTwo = concat_ws(".", slice(parts, -2, 2))
    when(size(parts) <= 2, d)
      .otherwise(when(lastTwo.isin(MultiPartSuffixes: _*),
        concat_ws(".", slice(parts, -3, 3))).otherwise(lastTwo))
  }

  /** Drop the `#fragment`. */
  def defragment(url: Column): Column = regexp_replace(url, "#.*$", "")

  /** Drop the `?query` (and fragment after it). */
  def stripQuery(url: Column): Column = regexp_replace(url, "[?#].*$", "")

  /** Query parameter KEYS that carry tracking state, not content
    * identity — two URLs differing only here are the same page to a
    * crawler. `utm_` matches as a key prefix, the rest exactly (a
    * plain-prefix "ref" would wrongly eat `refresh=`).
    */
  val TrackingParamKeys: Seq[String] =
    Seq("gclid", "fbclid", "mc_cid", "mc_eid", "ref")

  /** CANONICAL URL for visited-set identity: fragment dropped, tracking
    * parameters removed, surviving parameters SORTED (param order never
    * distinguishes pages), a bare trailing `?` cleaned up. Pure
    * codegen'd split/filter/sort — the difference between re-crawling
    * a page per ad-campaign link and fetching it once.
    */
  def canonicalizeUrl(url: Column): Column = {
    val defragged = defragment(url)
    val base = stripQuery(url)
    val query = regexp_extract(defragged, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"), p => {
      val key = regexp_extract(p, "^([^=]*)", 1)
      !(p === "") && !key.startsWith("utm_") &&
        !key.isin(TrackingParamKeys: _*)
    }))
    when(size(kept) > 0, concat(base, lit("?"), array_join(kept, "&")))
      .otherwise(base)
  }

  /** Lowercased extension of the query-stripped path ("" if none) —
    * `get_ext` (`crawler_core.py:27-30`).
    */
  def ext(url: Column): Column =
    lower(regexp_extract(stripQuery(url), "(\\.[^./?]+)$", 1))

  /** True when the url's extension is on the static blocklist (F1). */
  def isStaticBlocked(url: Column): Column =
    ext(url).isin(StaticExtensions: _*)

  /** True when the url looks like a downloadable document (F8). */
  def isDocUrl(url: Column): Column = ext(url).isin(DocExtensions: _*)

  /** Filesystem-safe site key: `.`/`:`/`/` -> `_`
    * (`filesystem_store.py:11-12`).
    */
  def sanitizeSiteKey(site: Column): Column = translate(site, ".:/", "___")

  /** Start path of a url for path-scoped storage
    * (`filesystem_store.py:15-17`): the path component (missing/empty
    * -> "/"), trailing slashes stripped, empty again -> "/".
    */
  def startPath(url: Column): Column = {
    val stripped =
      regexp_replace(coalesce(path(url), lit("")), "/+$", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Path-scoped site key (`filesystem_store.py:35-37`): the sanitized
    * site key plus `__path_<sha1(startPath)[:8]>`, so two jobs crawling
    * different subtrees of one site store into disjoint partitions.
    * The suffix hash is sha1 like the reference's `hash_url`
    * (`utils.py:11-12`).
    */
  def pathScopedSiteKey(site: Column, startUrl: Column): Column =
    concat(sanitizeSiteKey(site), lit("__path_"),
      substring(sha1(startPath(startUrl)), 1, 8))

  /** RFC-3986 resolution of a possibly-relative href against a base URL.
    * Needs real URI semantics, so this is the one URL op implemented as a
    * UDF (`java.net.URI.resolve`), mirroring `urljoin`
    * (`link_extractor.py:19`). Null-safe: unresolvable pairs yield null.
    */
  val resolveUrl: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (base: String, href: String) =>
      if (base == null || href == null) null
      else
        try new java.net.URI(base).resolve(href.trim).toString
        catch { case _: Exception => null }
    }
}
