package graft.queries

import graft.QueryDef.PresentOps
import graft.{QueryDef, Tables}
import graft.functions.{HashFunctions, TextFunctions, UrlFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function and filter surface (SURVEY §2.2 F1-F14, §2.8 C1-C24):
  * URL projections, routing filters, content hashing, JSON access,
  * interval arithmetic, string ops.
  *
  * The testdata has no URL column, so URLs are synthesized from
  * `documents` with a deterministic expression duplicated verbatim in the
  * oracle SQL (mixed-case hosts, www. prefixes, varied extensions, query
  * strings, fragments — the FIXTURES.md URL-vector cases).
  */
object ScalarQueries {

  /** Deterministic synthetic URL per document (Spark side). */
  private def withUrl(docs: DataFrame): DataFrame =
    docs.withColumn("url",
      concat(
        lit("https://"),
        when(col("doc_id") % 4 === 0, lit("www.")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".example.com/"), col("lang"), lit("/doc"), col("doc_id"),
        element_at(
          array(lit(".html"), lit(".pdf"), lit(".css"), lit(".png"),
            lit(".txt"), lit(".docx"), lit(""), lit(".js")),
          (col("doc_id") % 8 + 1).cast("int")),
        when(col("doc_id") % 3 === 0, concat(lit("?q="), col("doc_id")))
          .otherwise(lit("")),
        when(col("doc_id") % 2 === 0, concat(lit("#sec"), col("doc_id")))
          .otherwise(lit(""))))

  /** The identical expression as a DuckDB CTE. */
  private val UrlCte =
    """WITH urls AS (
      |  SELECT doc_id, lang, source, text, n_chars,
      |    'https://'
      |    || CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END
      |    || '.example.com/' || lang || '/doc' || doc_id
      |    || CASE doc_id % 8 WHEN 0 THEN '.html' WHEN 1 THEN '.pdf'
      |         WHEN 2 THEN '.css' WHEN 3 THEN '.png' WHEN 4 THEN '.txt'
      |         WHEN 5 THEN '.docx' WHEN 6 THEN '' ELSE '.js' END
      |    || CASE WHEN doc_id % 3 = 0 THEN '?q=' || doc_id ELSE '' END
      |    || CASE WHEN doc_id % 2 = 0 THEN '#sec' || doc_id ELSE '' END AS url
      |  FROM documents)
      |""".stripMargin

  /** Frozen adversarial-unicode fixtures for txt_unicode_kernel_parity:
    * every nasty class from SURVEY §7.4 risk 3 (Zs spaces, NEL,
    * line/para separators, zero-width/format chars, BOM, vertical
    * tab/form feed, newline soup, casing traps, combining marks,
    * astral-plane emoji) alone and mixed. UnicodeParitySpec pins the
    * Spark kernels to the same conventions over 400 ScalaCheck-
    * generated samples; this query pins DuckDB to them every round.
    */
  private val UnicodeFixtures: Seq[String] = Seq(
    "",
    "hello world",
    "  lead and trail  ",
    "\u00A0nbsp edges\u00A0",
    "inner\u00A0nbsp token here",
    "vt\u000Bff\u000Cmix",
    "line1\u000D\u000Aline2\u000Dline3\u000Aline4",
    "tab\u0009and  multi   space",
    "zero\u200Bwidth\u200Cjoin\u200D!",
    "\uFEFFbom lead",
    "\u6C49\u3000\u5B57",
    "nel\u0085sep",
    "ls\u2028ps\u2029end",
    "emoji \uD83D\uDE00 tone \uD83D\uDC4D\uD83C\uDFFD done",
    "combine e\u0301 c\u0327 end",
    "\u0130stanbul \u0131\u0131 III \u00DF\u017F",
    "\u03A3\u039F\u03A6\u039F\u03A3 \u03C3\u03BF\u03C6\u03BF\u03C2",
    "math \uD835\uDD18 frak",
    "digits 123 punct !?; mix a1b2",
    "thin\u2009narrow\u202Ffigure\u2007sp",
    " \u0009\u000A\u000B\u000C\u000D ",
    "\u00A0\u3000\u2009",
    "\u000D\u000D\u000A\u000A\u000D",
    "\u00A0 \u000B\u000D\u000A x\u200B\uFEFFy \u0130\u00DF \uD83D\uDE00\u3000. !",
    "a\u00A0b c\u000Bd\u000D\u000Ae\u2028f \uD83D\uDE00",
    "mix \u202F\u2007 ends\u00A0")

  /** One fixture string as an unambiguous DuckDB expression: a chain
    * of chr(codepoint) concats — e-string escapes don't cover
    * \uXXXX/astral and raw control bytes would not survive the
    * oracle_sql.json round trip.
    */
  private def duckChrExpr(s: String): String =
    if (s.isEmpty) "''"
    else s.codePoints().toArray.map(cp => s"chr($cp)").mkString(" || ")

  /** Generated oracle for txt_unicode_kernel_parity. The pinned
    * cross-engine conventions (empirically established; see
    * UnicodeParitySpec's scaladoc): `trim(x, ' ')` (DuckDB's bare trim
    * strips all Unicode Zs, Spark's only 0x20), the explicit class
    * `[ \t\n\x0b\f\r]` wherever Spark-side Java regex says `\s` (RE2's
    * `\s` lacks \x0B), and md5/sha256 over UTF-8 bytes. Every output
    * is an exact integer or hex digest — order-free compare.
    */
  private lazy val UnicodeParitySql: String = {
    val values = UnicodeFixtures.zipWithIndex
      .map { case (s, i) => s"($i, ${duckChrExpr(s)})" }
      .mkString(",\n  ")
    s"WITH f(id, text) AS (VALUES\n  $values),\n" +
      """tk AS (
        |  SELECT id, list_filter(string_split(trim(text, ' '), ' '),
        |    x -> x <> '') AS l
        |  FROM f),
        |sh AS (
        |  SELECT id, CASE WHEN len(l) >= 2
        |    THEN list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])
        |    ELSE []::VARCHAR[] END AS s2
        |  FROM tk)
        |SELECT f.id::BIGINT AS id,
        |  len(tk.l)::BIGINT AS n_tok,
        |  md5(coalesce(array_to_string(tk.l, '|'), '')) AS tok_md5,
        |  sha256(trim(regexp_replace(regexp_replace(f.text,
        |    '\r\n|\r', chr(10), 'g'), '[ \t\n\x0b\f\r]+', ' ', 'g'), ' '))
        |    AS norm_sha,
        |  len(sh.s2)::BIGINT AS n_shingle2,
        |  md5(coalesce(array_to_string(sh.s2, '|'), '')) AS sh_md5,
        |  len(regexp_extract_all(f.text,
        |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0b\f\r]'))::BIGINT AS n_bpeish,
        |  ('0x' || substr(md5(f.text), 1, 15))::BIGINT AS h64
        |FROM f JOIN tk USING (id) JOIN sh USING (id)
        |ORDER BY id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // C1: get_domain — host, lowercased, leading www. stripped.
    QueryDef(
      "c1_domain_extract",
      UrlCte +
        """SELECT regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
          |         '^www\.', '') AS domain,
          |  count(*) AS n
          |FROM urls GROUP BY domain ORDER BY domain""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .select(UrlFunctions.domain(col("url")).as("domain"))
        .groupBy(col("domain")).agg(count(lit(1)).as("n"))
        .presentSorted(col("domain"))
    },

    // Registered-domain (eTLD+1) rollup: subdomains of one
    // registrable domain aggregate together while multi-part public
    // suffixes (co.uk, gov.uk, com.au...) keep three labels — the key
    // "one site" actually means in crawl accounting. The oracle states
    // the expected registered domain per host-shape directly, so this
    // is a fixed-truth differential test of the heuristic.
    QueryDef(
      "c25_registered_domain_rollup",
      """WITH h AS (
        |  SELECT doc_id, CASE doc_id % 6
        |    WHEN 0 THEN 'www.example.com'
        |    WHEN 1 THEN 'news.bbc.co.uk'
        |    WHEN 2 THEN 'a.b.example.org'
        |    WHEN 3 THEN 'data.gov.uk'
        |    WHEN 4 THEN 'shop.papers.com.au'
        |    ELSE 'example.io' END AS host
        |  FROM documents)
        |SELECT CASE doc_id % 6
        |    WHEN 0 THEN 'example.com'
        |    WHEN 1 THEN 'bbc.co.uk'
        |    WHEN 2 THEN 'example.org'
        |    WHEN 3 THEN 'data.gov.uk'
        |    WHEN 4 THEN 'papers.com.au'
        |    ELSE 'example.io' END AS rdomain,
        |  count(*) AS n
        |FROM h GROUP BY rdomain ORDER BY rdomain""".stripMargin) { (s, d) =>
      val host = element_at(array(
        lit("www.example.com"), lit("news.bbc.co.uk"),
        lit("a.b.example.org"), lit("data.gov.uk"),
        lit("shop.papers.com.au"), lit("example.io")),
        (col("doc_id") % 6 + 1).cast("int"))
      Tables.documents(s, d)
        .select(concat(lit("https://"), host, lit("/p"), col("doc_id"))
          .as("url"))
        .select(UrlFunctions.registeredDomain(col("url")).as("rdomain"))
        .groupBy(col("rdomain")).agg(count(lit(1)).as("n"))
        .presentSorted(col("rdomain"))
    },

    // URL canonicalization for visited-set identity: fragment dropped,
    // utm_*/click-id tracking params removed BY KEY (a plain "ref"
    // prefix would wrongly eat refresh=), surviving params sorted. The
    // oracle states the expected canonical form per shape — fixed-truth
    // differential.
    QueryDef(
      "c26_url_canonicalize",
      """SELECT doc_id,
        |  'https://example.com/p' || doc_id || CASE doc_id % 4
        |    WHEN 0 THEN '?a=1&b=2'
        |    WHEN 1 THEN ''
        |    WHEN 2 THEN '?a=1&b=2&refresh=1'
        |    ELSE '' END AS canon
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val messy = element_at(array(
        lit("?utm_source=x&b=2&a=1#frag"), lit("?gclid=abc"),
        lit("?b=2&a=1&refresh=1"), lit("#top")),
        (col("doc_id") % 4 + 1).cast("int"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("https://example.com/p"), col("doc_id"), messy)
            .as("url"))
        .select(col("doc_id"),
          UrlFunctions.canonicalizeUrl(col("url")).as("canon"))
        .presentSorted(col("doc_id"))
    },

    // C5+C8: defragment / strip query; F2/C7: extension projection.
    QueryDef(
      "c5_defrag_and_ext",
      UrlCte +
        """SELECT doc_id,
          |  regexp_replace(url, '#.*$', '') AS defragged,
          |  regexp_replace(url, '[?#].*$', '') AS clean_url,
          |  lower(regexp_extract(regexp_replace(url, '[?#].*$', ''),
          |        '(\.[^./?]+)$', 1)) AS ext
          |FROM urls ORDER BY doc_id""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .select(col("doc_id"),
          UrlFunctions.defragment(col("url")).as("defragged"),
          UrlFunctions.stripQuery(col("url")).as("clean_url"),
          UrlFunctions.ext(col("url")).as("ext"))
        .presentSorted(col("doc_id"))
    },

    // F1: the 23-extension static blocklist filter.
    QueryDef(
      "f1_static_ext_blocklist",
      UrlCte +
        """SELECT ext, count(*) AS n FROM (
          |  SELECT lower(regexp_extract(regexp_replace(url, '[?#].*$', ''),
          |           '(\.[^./?]+)$', 1)) AS ext FROM urls)
          |WHERE ext NOT IN ('.js','.css','.png','.jpg','.jpeg','.gif','.svg',
          |  '.ico','.woff','.woff2','.ttf','.eot','.mp4','.mp3','.avi','.mov',
          |  '.wmv','.flv','.zip','.rar','.gz','.tar','.7z')
          |GROUP BY ext ORDER BY ext""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .select(UrlFunctions.ext(col("url")).as("ext"))
        .filter(!col("ext").isin(UrlFunctions.StaticExtensions: _*))
        .groupBy(col("ext")).agg(count(lit(1)).as("n"))
        .presentSorted(col("ext"))
    },

    // X3: link routing — file / page / blocked split (F1+F8 together).
    QueryDef(
      "x3_link_routing",
      UrlCte +
        """SELECT CASE
          |    WHEN ext IN ('.pdf','.doc','.docx','.xls','.xlsx','.txt') THEN 'file'
          |    WHEN ext IN ('.js','.css','.png','.jpg','.jpeg','.gif','.svg',
          |      '.ico','.woff','.woff2','.ttf','.eot','.mp4','.mp3','.avi',
          |      '.mov','.wmv','.flv','.zip','.rar','.gz','.tar','.7z') THEN 'blocked'
          |    ELSE 'page' END AS route, count(*) AS n
          |FROM (SELECT lower(regexp_extract(regexp_replace(url, '[?#].*$', ''),
          |        '(\.[^./?]+)$', 1)) AS ext FROM urls)
          |GROUP BY route ORDER BY route""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .select(UrlFunctions.ext(col("url")).as("ext"))
        .select(
          when(col("ext").isin(UrlFunctions.DocExtensions: _*), lit("file"))
            .when(col("ext").isin(UrlFunctions.StaticExtensions: _*), lit("blocked"))
            .otherwise(lit("page")).as("route"))
        .groupBy(col("route")).agg(count(lit(1)).as("n"))
        .presentSorted(col("route"))
    },

    // F4+F5: scope filter — same domain AND path prefix.
    QueryDef(
      "f4_f5_scope_filter",
      UrlCte +
        """SELECT doc_id FROM (
          |  SELECT doc_id,
          |    regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
          |      '^www\.', '') AS domain,
          |    regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path
          |  FROM urls)
          |WHERE domain = 'src1.example.com' AND path LIKE '/de/%'
          |ORDER BY doc_id""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .withColumn("domain", UrlFunctions.domain(col("url")))
        .withColumn("path", UrlFunctions.path(col("url")))
        .filter(col("domain") === "src1.example.com" &&
          col("path").startsWith("/de/"))
        .select(col("doc_id"))
        .presentSorted(col("doc_id"))
    },

    // F6+F7+C23: depth cap with exclusive-depth override (coalesce).
    QueryDef(
      "f6_depth_cap_coalesce",
      """SELECT depth, count(*) AS n FROM (
        |  SELECT event_id % 12 AS depth,
        |    CASE WHEN user_id % 3 = 0 THEN 4 ELSE NULL END AS exclusive_depth
        |  FROM events)
        |WHERE depth <= coalesce(exclusive_depth, 10)
        |GROUP BY depth ORDER BY depth""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select((col("event_id") % 12).as("depth"),
          when(col("user_id") % 3 === 0, lit(4)).otherwise(lit(null))
            .as("exclusive_depth"))
        .filter(col("depth") <= coalesce(col("exclusive_depth"), lit(10)))
        .groupBy(col("depth")).agg(count(lit(1)).as("n"))
        .presentSorted(col("depth"))
    },

    // A6+C3: whitespace-normalized sha256 content hash — union the docs
    // with whitespace-mangled copies; every pair must collide.
    QueryDef(
      "a6_normalized_content_hash",
      """WITH both_sides AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    ' ' || replace(text, ' ', e'\r\n') || e'\t ' FROM documents),
        |hashed AS (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(text, e'\r\n|\r', e'\n', 'g'),
        |      '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS content_hash
        |  FROM both_sides)
        |SELECT count(DISTINCT content_hash) AS n_hashes,
        |  sum(cnt)::BIGINT AS n_rows,
        |  sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END)::BIGINT AS n_pairs
        |FROM (SELECT content_hash, count(*) AS cnt FROM hashed GROUP BY 1)""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val mangled = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(lit(" "), regexp_replace(col("text"), " ", "\r\n"), lit("\t "))
          .as("text"))
      val hashed = docs.select(col("doc_id"), col("text")).unionByName(mangled)
        .select(col("doc_id"), HashFunctions.contentHash(col("text")).as("content_hash"))
      hashed.groupBy(col("content_hash")).agg(count(lit(1)).as("cnt"))
        .agg(count(col("content_hash")).as("n_hashes"),
          sum(col("cnt")).as("n_rows"),
          sum(when(col("cnt") === 2, 1).otherwise(0)).as("n_pairs"))
    },

    // Adversarial-unicode kernel parity: the frozen nasty-class
    // fixtures (NBSP/Zs spaces, NEL, line/para separators, zero-width
    // and BOM format chars, vertical tab, newline soup, casing traps,
    // combining marks, astral emoji) through tokens / contentHash
    // normalization / 2-gram shingles / bpeish count / stableHash64,
    // against oracle SQL pinned to the Spark conventions
    // (trim(x, ' '), the explicit [ \t\n\x0b\f\r] class for Java \s).
    // Both engines construct the fixtures from codepoints, so the only
    // thing under test is kernel semantics — SURVEY §7.4 risk 3.
    QueryDef(
      "txt_unicode_kernel_parity",
      UnicodeParitySql) { (s, d) =>
      val rows = UnicodeFixtures.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val df = s.createDataFrame(rows).toDF("id", "text")
      val sh2 = TextFunctions.shingles(col("text"), 2)
      df.select(col("id"), col("text"),
          TextFunctions.tokens(col("text")).as("toks"))
        .select(col("id"),
          size(col("toks")).cast("long").as("n_tok"),
          md5(concat_ws("|", col("toks"))).as("tok_md5"),
          HashFunctions.contentHash(col("text")).as("norm_sha"),
          size(sh2).cast("long").as("n_shingle2"),
          md5(concat_ws("|", sh2)).as("sh_md5"),
          TextFunctions.bpeishTokenCount(col("text")).cast("long")
            .as("n_bpeish"),
          HashFunctions.stableHash64(col("text")).as("h64"))
        .presentSorted(col("id"))
    },

    // C2-variant: per-url digest ids (sha256 + md5; sha1 is library-level —
    // DuckDB 1.0 has no sha1 to oracle it against).
    QueryDef(
      "c2_url_digests",
      UrlCte +
        """SELECT doc_id, sha256(url) AS url_sha256, md5(url) AS url_md5
          |FROM urls ORDER BY doc_id""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .select(col("doc_id"), sha2(col("url"), 256).as("url_sha256"),
          md5(col("url")).as("url_md5"))
        .presentSorted(col("doc_id"))
    },

    // C13: deterministic uuid-shaped row id derived from a hash (the
    // library also exposes real uuid(), which is not oracle-checkable).
    QueryDef(
      "c13_deterministic_uuid",
      UrlCte +
        """SELECT doc_id,
          |  substr(md5(url), 1, 8) || '-' || substr(md5(url), 9, 4) || '-'
          |  || substr(md5(url), 13, 4) || '-' || substr(md5(url), 17, 4)
          |  || '-' || substr(md5(url), 21, 12) AS row_id
          |FROM urls ORDER BY doc_id""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .withColumn("h", md5(col("url")))
        .select(col("doc_id"),
          concat_ws("-", substring(col("h"), 1, 8), substring(col("h"), 9, 4),
            substring(col("h"), 13, 4), substring(col("h"), 17, 4),
            substring(col("h"), 21, 12)).as("row_id"))
        .presentSorted(col("doc_id"))
    },

    // C14: timestamp/interval arithmetic — stale-cutoff sweep (ST5 batch
    // form): events older than (global max ts - 7 days).
    QueryDef(
      "c14_stale_cutoff_sweep",
      """SELECT event_type, count(*) AS n_stale FROM events
        |WHERE ts::TIMESTAMP < (SELECT max(ts::TIMESTAMP) FROM events)
        |                      - INTERVAL 7 DAY
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val cutoff = ev.agg(max(col("ts")).as("max_ts"))
      ev.crossJoin(broadcast(cutoff))
        .filter(col("ts") < col("max_ts") - expr("INTERVAL 7 DAY"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_stale"))
        .presentSorted(col("event_type"))
    },

    // C15: JSON access into the props payload (jobs.config analog).
    QueryDef(
      "c15_json_props_extract",
      """SELECT json_extract_string(props, '$.k')::INT % 10 AS k_mod,
        |  count(*) AS n
        |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select((get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod"))
        .groupBy(col("k_mod")).agg(count(lit(1)).as("n"))
        .presentSorted(col("k_mod"))
    },

    // C17/C10/C22: length / octet_length / trim / substring.
    QueryDef(
      "c17_string_lengths",
      """SELECT doc_id, length(text) AS n_chars_actual, strlen(text) AS n_bytes,
        |  substr(trim(text, ' '), 1, 10) AS head10
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), length(col("text")).as("n_chars_actual"),
          octet_length(col("text")).as("n_bytes"),
          substring(trim(col("text")), 1, 10).as("head10"))
        .presentSorted(col("doc_id"))
    },

    // C20+C21+T1: site-key sanitization + path normalization.
    QueryDef(
      "c20_site_key_sanitize",
      UrlCte +
        """SELECT site_key, count(*) AS n FROM (
          |  SELECT translate(
          |    regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
          |      '^www\.', '')
          |    || rtrim(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1), '/')
          |    || '/', '.:/', '___') AS site_key
          |  FROM urls)
          |GROUP BY site_key ORDER BY site_key""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .select(UrlFunctions.sanitizeSiteKey(concat(
          UrlFunctions.domain(col("url")),
          regexp_replace(UrlFunctions.path(col("url")), "/+$", ""),
          lit("/"))).as("site_key"))
        .groupBy(col("site_key")).agg(count(lit(1)).as("n"))
        .presentSorted(col("site_key"))
    },

    // C20b (T1 path_mode): start-path normalization for path-scoped
    // site keys (`/root/reference/storage/filesystem_store.py:15-17`,
    // `:35-37`): path or '/', trailing slashes stripped, empty -> '/'.
    // The sha1[:8] suffix itself is not DuckDB-expressible (no sha1);
    // it is pinned by StoreSpec against literal digests.
    QueryDef(
      "c20b_path_scope_start_path",
      UrlCte +
        """, su AS (
          |  SELECT CASE WHEN doc_id % 7 = 0
          |           THEN regexp_extract(url, '^([a-z]+://[^/?#]+)', 1)
          |         WHEN doc_id % 7 = 1
          |           THEN regexp_replace(url, '[?#].*$', '') || '/'
          |         ELSE regexp_replace(url, '[?#].*$', '') END AS start_url
          |  FROM urls)
          |SELECT site_key, start_path, count(*) AS n FROM (
          |  SELECT translate(
          |      regexp_replace(lower(regexp_extract(start_url,
          |        '^[a-z]+://([^/?#]+)', 1)), '^www\.', ''),
          |      '.:/', '___') AS site_key,
          |    CASE WHEN rtrim(regexp_extract(start_url,
          |           '^[a-z]+://[^/?#]+([^?#]*)', 1), '/') = '' THEN '/'
          |         ELSE rtrim(regexp_extract(start_url,
          |           '^[a-z]+://[^/?#]+([^?#]*)', 1), '/') END AS start_path
          |  FROM su)
          |GROUP BY site_key, start_path
          |ORDER BY site_key, start_path""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .withColumn("start_url",
          when(col("doc_id") % 7 === 0,
            regexp_extract(col("url"), "^([a-z]+://[^/?#]+)", 1))
            .when(col("doc_id") % 7 === 1,
              concat(UrlFunctions.stripQuery(col("url")), lit("/")))
            .otherwise(UrlFunctions.stripQuery(col("url"))))
        .select(
          UrlFunctions.sanitizeSiteKey(
            UrlFunctions.domain(col("start_url"))).as("site_key"),
          UrlFunctions.startPath(col("start_url")).as("start_path"))
        .groupBy(col("site_key"), col("start_path"))
        .agg(count(lit(1)).as("n"))
        .presentSorted(col("site_key"), col("start_path"))
    },

    // C24: URL shape validation filter (Pydantic HttpUrl analog).
    QueryDef(
      "c24_url_validation",
      UrlCte +
        """SELECT is_valid, count(*) AS n FROM (
          |  SELECT CASE WHEN candidate LIKE 'https://%'
          |              OR candidate LIKE 'http://%' THEN 1 ELSE 0 END AS is_valid
          |  FROM (SELECT CASE WHEN doc_id % 7 = 0
          |                    THEN 'notaurl:' || doc_id ELSE url END AS candidate
          |        FROM urls))
          |GROUP BY is_valid ORDER BY is_valid""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .select(when(col("doc_id") % 7 === 0,
          concat(lit("notaurl:"), col("doc_id"))).otherwise(col("url"))
          .as("candidate"))
        .select(when(col("candidate").startsWith("https://") ||
          col("candidate").startsWith("http://"), 1).otherwise(0).as("is_valid"))
        .groupBy(col("is_valid")).agg(count(lit(1)).as("n"))
        .presentSorted(col("is_valid"))
    },

    // F16 (regex form) + X1: html -> text + link extraction over synthetic
    // html assembled from documents. Script/style subtrees dropped first,
    // exactly like the reference's BeautifulSoup pass.
    QueryDef(
      "f16_html_to_text",
      """WITH pages AS (
        |  SELECT doc_id,
        |    '<html><head><style>p{color:red}</style>'
        |    || '<script>var x=' || doc_id || ';</script></head>'
        |    || '<body><h1>Doc ' || doc_id || '</h1><p>' || text || '</p>'
        |    || '<a href="/page' || (doc_id + 1) || '.html">next</a>'
        |    || '<a href="#frag">self</a>'
        |    || '<a href="https://other.org/x.pdf">file</a></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(html, '<script[^>]*>.*?</script>', ' ', 'gs'),
        |        '<style[^>]*>.*?</style>', ' ', 'gs'),
        |      '<[^>]+>', ' ', 'g'),
        |    '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ') AS page_text,
        |  len(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS n_links
        |FROM pages ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pages = docs.withColumn("html",
        concat(lit("<html><head><style>p{color:red}</style>"),
          lit("<script>var x="), col("doc_id"), lit(";</script></head>"),
          lit("<body><h1>Doc "), col("doc_id"), lit("</h1><p>"), col("text"),
          lit("</p><a href=\"/page"), col("doc_id") + 1,
          lit(".html\">next</a><a href=\"#frag\">self</a>"),
          lit("<a href=\"https://other.org/x.pdf\">file</a></body></html>")))
      pages.select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("html"), "(?s)<script[^>]*>.*?</script>", " "),
              "(?s)<style[^>]*>.*?</style>", " "),
            "<[^>]+>", " "),
          "\\s+", " ")).as("page_text"),
        size(regexp_extract_all(col("html"), lit("href=\"([^\"]*)\""), lit(1)))
          .as("n_links"))
        .presentSorted(col("doc_id"))
    },

    // X1 full form + C4: explode extracted links, resolve every href
    // shape (absolute, protocol-relative //host, root-relative,
    // sibling-relative, parent ../, bare fragment) against the page url
    // with the RFC-3986 resolveUrl UDF, defragment, aggregate. The
    // oracle replays each resolution case in SQL.
    QueryDef(
      "x1_extract_resolve_links",
      UrlCte +
        """, pages AS (
          |  SELECT doc_id, url,
          |    '<a href="/page' || (doc_id + 1) || '.html">n</a>'
          |    || '<a href="rel' || doc_id || '.html">r</a>'
          |    || '<a href="../up' || (doc_id % 7) || '.html">u</a>'
          |    || '<a href="//cdn.example.org/lib.pdf">p</a>'
          |    || '<a href="#frag">s</a>'
          |    || '<a href="https://other.org/x.pdf">f</a>' AS html
          |  FROM urls),
          |links AS (
          |  SELECT doc_id, url,
          |    regexp_extract(url, '^([a-z]+://[^/?#]+)', 1) AS host,
          |    regexp_replace(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1),
          |      '/[^/]*$', '/') AS dir,
          |    unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
          |  FROM pages),
          |resolved AS (
          |  SELECT doc_id,
          |    regexp_replace(
          |      CASE WHEN href LIKE '//%' THEN 'https:' || href
          |           WHEN href LIKE 'http%' THEN href
          |           WHEN href LIKE '#%' THEN regexp_replace(url, '#.*$', '')
          |           WHEN href LIKE '/%' THEN host || href
          |           WHEN href LIKE '../%' THEN
          |             host || regexp_replace(dir, '[^/]+/$', '') || substr(href, 4)
          |           ELSE host || dir || href END,
          |      '#.*$', '') AS abs_url
          |  FROM links)
          |SELECT abs_url, count(*) AS n FROM resolved
          |WHERE abs_url <> '' GROUP BY abs_url ORDER BY abs_url""".stripMargin) { (s, d) =>
      val pages = withUrl(Tables.documents(s, d)).withColumn("html",
        concat(lit("<a href=\"/page"), col("doc_id") + 1,
          lit(".html\">n</a><a href=\"rel"), col("doc_id"),
          lit(".html\">r</a><a href=\"../up"), col("doc_id") % 7,
          lit(".html\">u</a><a href=\"//cdn.example.org/lib.pdf\">p</a>"),
          lit("<a href=\"#frag\">s</a>"),
          lit("<a href=\"https://other.org/x.pdf\">f</a>")))
      val links = pages.select(col("doc_id"), col("url"),
        explode(graft.functions.HtmlFunctions.hrefs(col("html"))).as("href"))
      val resolved = links.select(col("doc_id"),
        UrlFunctions.defragment(
          UrlFunctions.resolveUrl(col("url"), col("href"))).as("abs_url"))
      resolved.filter(col("abs_url").isNotNull && col("abs_url") =!= "")
        .groupBy(col("abs_url")).agg(count(lit(1)).as("n"))
        .presentSorted(col("abs_url"))
    },

    // F7: single-page mode — any frontier item beyond depth 0 is
    // dropped for single-page jobs, untouched otherwise.
    QueryDef(
      "f7_single_page_filter",
      """SELECT depth, count(*) AS n FROM (
        |  SELECT event_id % 5 AS depth, user_id % 2 = 0 AS single_page
        |  FROM events)
        |WHERE NOT single_page OR depth = 0
        |GROUP BY depth ORDER BY depth""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select((col("event_id") % 5).as("depth"),
          (col("user_id") % 2 === 0).as("single_page"))
        .filter(!col("single_page") || col("depth") === 0)
        .groupBy(col("depth")).agg(count(lit(1)).as("n"))
        .presentSorted(col("depth"))
    },

    // F8+F9: downloadable file links, restricted to the root domain
    // when download_only_same_domain is set.
    QueryDef(
      "f9_same_domain_file_filter",
      UrlCte +
        """SELECT domain, count(*) AS n FROM (
          |  SELECT doc_id,
          |    regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
          |      '^www\.', '') AS domain,
          |    lower(regexp_extract(regexp_replace(url, '[?#].*$', ''),
          |      '(\.[^./?]+)$', 1)) AS ext
          |  FROM urls)
          |WHERE ext IN ('.pdf','.doc','.docx','.xls','.xlsx','.txt')
          |  AND domain = 'src1.example.com'
          |GROUP BY domain ORDER BY domain""".stripMargin) { (s, d) =>
      withUrl(Tables.documents(s, d))
        .select(UrlFunctions.domain(col("url")).as("domain"),
          UrlFunctions.ext(col("url")).as("ext"))
        .filter(UrlFunctions.DocExtensions
          .map(e => col("ext") === e).reduce(_ || _))
        .filter(col("domain") === "src1.example.com")
        .groupBy(col("domain")).agg(count(lit(1)).as("n"))
        .presentSorted(col("domain"))
    },

    // F13: null-stripping of the job-config map before storage
    // (map_filter; `/root/reference/api/main.py:69`).
    QueryDef(
      "f13_config_null_strip",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 AND doc_id % 5 = 0 THEN 'agent'
        |       WHEN doc_id % 3 = 0 THEN 'agent,single_page'
        |       WHEN doc_id % 5 = 0 THEN 'agent,max_depth'
        |       ELSE 'agent,max_depth,single_page' END AS kept_keys,
        |  (3 - (doc_id % 3 = 0)::INT - (doc_id % 5 = 0)::INT) AS n_keys
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), map(
          lit("agent"), lit("a1"),
          lit("max_depth"), when(col("doc_id") % 3 === 0, lit(null))
            .otherwise((col("doc_id") % 7).cast("string")),
          lit("single_page"), when(col("doc_id") % 5 === 0, lit(null))
            .otherwise(lit("true"))).as("config"))
        .select(col("doc_id"),
          map_filter(col("config"), (_, v) => v.isNotNull).as("config"))
        .select(col("doc_id"),
          array_join(array_sort(map_keys(col("config"))), ",").as("kept_keys"),
          size(map_keys(col("config"))).as("n_keys"))
        .presentSorted(col("doc_id"))
    },

    // F14: schema-projection of the job config — from_json with an
    // explicit schema keeps only the known keys (the worker's
    // unknown-key filter, `/root/reference/workers/worker_daemon.py:10-12`).
    QueryDef(
      "f14_config_schema_projection",
      """SELECT (doc_id % 7)::INT AS max_depth, count(*) AS n,
        |  sum((doc_id % 2 = 0)::INT)::BIGINT AS n_single
        |FROM documents GROUP BY max_depth ORDER BY max_depth""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types._
      val cfgSchema = StructType(Seq(
        StructField("max_depth", IntegerType),
        StructField("single_page", BooleanType)))
      Tables.documents(s, d)
        .select(col("doc_id"), concat(
          lit("{\"max_depth\": "), col("doc_id") % 7,
          lit(", \"unknown_key\": \"dropped\", \"single_page\": "),
          (col("doc_id") % 2 === 0).cast("string"), lit("}")).as("config_json"))
        .select(from_json(col("config_json"), cfgSchema).as("cfg"))
        .groupBy(col("cfg.max_depth").as("max_depth"))
        .agg(count(lit(1)).as("n"),
          sum(col("cfg.single_page").cast("int")).as("n_single"))
        .presentSorted(col("max_depth"))
    },

    // A5 monitoring variant: approx_count_distinct within 10% of exact
    // (the visited-set cardinality monitor; the boolean is what's
    // oracle-checkable about an approximate sketch).
    QueryDef(
      "a5_approx_distinct_monitor",
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  true AS within_10pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // Pre-distinct on the pair first: exact + approx over distinct
      // rows in one pass, instead of Expand doubling the input for two
      // distinct aggregates.
      Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_exact"),
          approx_count_distinct(col("user_id")).as("apx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("apx") - col("n_exact")) <=
            col("n_exact") * 0.1).as("within_10pct"))
        .presentSorted(col("event_type"))
    },

    // F12: content-type routing predicate (case-insensitive contains).
    QueryDef(
      "f12_content_type_route",
      """SELECT route, count(*) AS n FROM (
        |  SELECT CASE WHEN contains(lower(ctype), 'text/html')
        |              THEN 'html' ELSE 'other' END AS route
        |  FROM (SELECT CASE doc_id % 4
        |          WHEN 0 THEN 'text/html; charset=utf-8'
        |          WHEN 1 THEN 'application/pdf'
        |          WHEN 2 THEN 'TEXT/HTML'
        |          ELSE 'application/json' END AS ctype
        |        FROM documents))
        |GROUP BY route ORDER BY route""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(element_at(array(
          lit("text/html; charset=utf-8"), lit("application/pdf"),
          lit("TEXT/HTML"), lit("application/json")),
          (col("doc_id") % 4 + 1).cast("int")).as("ctype"))
        .select(when(lower(col("ctype")).contains("text/html"), lit("html"))
          .otherwise(lit("other")).as("route"))
        .groupBy(col("route")).agg(count(lit(1)).as("n"))
        .presentSorted(col("route"))
    }
  )
}
