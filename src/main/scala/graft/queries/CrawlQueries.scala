package graft.queries

import graft.QueryDef.PresentOps
import graft.{QueryDef, Tables}
import graft.operators.Upsert
import graft.pipeline.{Crawl, CrawlConfig, Ingest, LocalFetcher}
import org.apache.spark.sql.functions._

/** Pipeline composition (SURVEY §3.1/§3.3): the full crawl dataflow
  * over a synthetic in-memory site, and the index+blob re-ingest — both
  * oracle-checked, so the COMPOSITION (not just the operator islands)
  * sits in the correctness gate.
  */
object CrawlQueries {

  val defs: Seq[QueryDef] = Seq(

    // §3.1: BFS crawl of a binary-tree site (page i links to 2i and
    // 2i+1 — one root-relative href, one sibling-relative href, one
    // blocked asset). The oracle replays the reachability recursion and
    // the html->text projection.
    QueryDef(
      "pl_crawl_bfs_site",
      """WITH RECURSIVE r AS (
        |  SELECT 1::BIGINT AS id, 0 AS depth
        |  UNION
        |  SELECT unnest([r.id * 2, r.id * 2 + 1]) AS id, r.depth + 1 AS depth
        |  FROM r JOIN documents d ON d.doc_id = r.id
        |  WHERE r.depth < 3),
        |v AS (SELECT id, min(depth) AS depth FROM r GROUP BY id),
        |page AS (
        |  SELECT v.id, v.depth,
        |    '<html><head><style>x{}</style></head><body><p>' || d.text
        |    || '</p><a href="/page' || (v.id * 2) || '.html">a</a>'
        |    || '<a href="page' || (v.id * 2 + 1) || '.html">b</a>'
        |    || '<a href="https://other.org/x.css">c</a></body></html>' AS html
        |  FROM v JOIN documents d ON d.doc_id = v.id)
        |SELECT 'https://site.example.com/page' || id || '.html' AS url,
        |  depth,
        |  length(trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(html, '<script[^>]*>.*?</script>', ' ', 'gs'),
        |        '<style[^>]*>.*?</style>', ' ', 'gs'),
        |      '<[^>]+>', ' ', 'g'),
        |    '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS n_text
        |FROM page ORDER BY url""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val site = docs.select(
        concat(lit("https://site.example.com/page"), col("doc_id"),
          lit(".html")).as("url"),
        encode(concat(
          lit("<html><head><style>x{}</style></head><body><p>"), col("text"),
          lit("</p><a href=\"/page"), col("doc_id") * 2, lit(".html\">a</a>"),
          lit("<a href=\"page"), col("doc_id") * 2 + 1, lit(".html\">b</a>"),
          lit("<a href=\"https://other.org/x.css\">c</a></body></html>")),
          "UTF-8").as("payload"),
        lit("text/html; charset=utf-8").as("content_type"))
      val res = Crawl.run(s, new LocalFetcher(site),
        Seq("https://site.example.com/page1.html"),
        CrawlConfig(rootDomain = "site.example.com", maxDepth = 3))
      res.pages
        .select(col("url"), col("depth"), length(col("text")).as("n_text"))
        .presentSorted(col("url"))
    },

    // §3.3 + J8/S12/A8: re-ingest — index rows point at text blobs
    // (every 5th row at its predecessor's blob, making content dupes),
    // join by path, hash, insert-if-absent vs the already-ingested
    // even-id rows. Survivors: odd ids owning their own blob.
    QueryDef(
      "pl_ingest_content_dedup",
      """WITH idx AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 4 THEN doc_id - 1 ELSE doc_id END AS eff
        |  FROM documents),
        |batch AS (
        |  SELECT i.doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(d.text, e'\r\n|\r', e'\n', 'g'),
        |      '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS content_hash
        |  FROM idx i JOIN documents d ON d.doc_id = i.eff),
        |tgt AS (
        |  SELECT sha256(trim(regexp_replace(regexp_replace(text, e'\r\n|\r', e'\n', 'g'),
        |    '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS content_hash
        |  FROM documents WHERE doc_id % 2 = 0),
        |ded AS (
        |  SELECT content_hash, min(doc_id) AS doc_id FROM batch
        |  GROUP BY content_hash)
        |SELECT doc_id FROM ded
        |WHERE content_hash NOT IN (SELECT content_hash FROM tgt)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val blobs = docs.select(
        concat(lit("/blobs/"), col("doc_id"), lit(".txt")).as("text_path"),
        col("text"))
      val index = docs.select(col("doc_id"),
        concat(lit("/blobs/"),
          when(col("doc_id") % 5 === 4, col("doc_id") - 1)
            .otherwise(col("doc_id")),
          lit(".txt")).as("text_path"))
      val target = Upsert.withContentHash(
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text")), "text")
        .select(col("content_hash"))
      Ingest.reingest(index, blobs, target, "doc_id")
        .select(col("doc_id"))
        .presentSorted(col("doc_id"))
    }
  )
}
