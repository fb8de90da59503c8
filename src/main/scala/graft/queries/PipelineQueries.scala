package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.HashFunctions
import graft.operators.{Frontier, Upsert}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-semantics operators: the reference's upsert/merge matrix
  * (A7/A8/A9), change detection (J6/J7), BFS frontier recursion (X4),
  * and the multimodal binary-column plumbing.
  */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(

    // A7: last-write-wins upsert state per (user_id, event_type) key —
    // the "latest version per document key" CDC pattern.
    QueryDef(
      "a7_upsert_latest_state",
      """SELECT user_id, event_type, event_id, round(value, 2) AS value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          round(col("value"), 2).as("value"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // A9: the 3-way merge matrix — target=documents, incoming batch has
    // changed text for id%3=0, identical for id%3=1, misses id%3=2, plus
    // brand-new ids. Output: action histogram.
    QueryDef(
      "a9_merge_action_matrix",
      """WITH target AS (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(text, e'\r\n|\r', e'\n', 'g'),
        |      '\s+', ' ', 'g'))) AS content_hash
        |  FROM documents),
        |incoming AS (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(
        |      CASE WHEN doc_id % 3 = 0 THEN 'changed ' || text ELSE text END,
        |      e'\r\n|\r', e'\n', 'g'), '\s+', ' ', 'g'))) AS content_hash
        |  FROM documents WHERE doc_id % 3 <> 2
        |  UNION ALL
        |  SELECT doc_id + 5000000, sha256('new-doc-' || doc_id) FROM documents
        |  WHERE doc_id % 10 = 0),
        |m AS (
        |  SELECT CASE
        |    WHEN t.content_hash IS NULL THEN 'insert'
        |    WHEN i.content_hash IS NULL THEN 'keep'
        |    WHEN t.content_hash = i.content_hash THEN 'skip'
        |    ELSE 'update' END AS action
        |  FROM target t FULL OUTER JOIN incoming i ON t.doc_id = i.doc_id)
        |SELECT action, count(*) AS n FROM m GROUP BY action ORDER BY action""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val target = Upsert.withContentHash(
        docs.select(col("doc_id"), col("text")), "text")
      val incoming = Upsert.withContentHash(
        docs.filter(col("doc_id") % 3 =!= 2)
          .select(col("doc_id"),
            when(col("doc_id") % 3 === 0, concat(lit("changed "), col("text")))
              .otherwise(col("text")).as("text")), "text")
        .unionByName(
          docs.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 5000000).as("doc_id"),
              lit(null).cast("string").as("text"),
              sha2(concat(lit("new-doc-"), col("doc_id")), 256).as("content_hash")))
      Upsert.classify(target, incoming, "doc_id")
        .groupBy(col("action")).agg(count(lit(1)).as("n"))
        .orderBy(col("action"))
    },

    // A8 + J6/J7: insert-if-absent by content hash — incoming batch of
    // half-duplicated docs; only genuinely new content survives.
    QueryDef(
      "a8_insert_if_absent",
      """WITH target AS (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(text, e'\r\n|\r', e'\n', 'g'),
        |      '\s+', ' ', 'g'))) AS content_hash
        |  FROM documents),
        |incoming AS (
        |  SELECT doc_id + 7000000 AS doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(
        |      CASE WHEN doc_id % 2 = 0 THEN text ELSE 'fresh ' || text END,
        |      e'\r\n|\r', e'\n', 'g'), '\s+', ' ', 'g'))) AS content_hash
        |  FROM documents),
        |dedup AS (
        |  SELECT content_hash, min(doc_id) AS doc_id FROM incoming
        |  GROUP BY content_hash)
        |SELECT count(*) AS n_inserted FROM dedup
        |WHERE content_hash NOT IN (SELECT content_hash FROM target)""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val target = Upsert.withContentHash(
        docs.select(col("doc_id"), col("text")), "text")
      val incoming = Upsert.withContentHash(
        docs.select((col("doc_id") + 7000000).as("doc_id"),
          when(col("doc_id") % 2 === 0, col("text"))
            .otherwise(concat(lit("fresh "), col("text"))).as("text")), "text")
      Upsert.insertIfAbsent(target, incoming, "doc_id")
        .agg(count(lit(1)).as("n_inserted"))
    },

    // X4: BFS reachability with min-depth — driver-loop anti-join BFS in
    // Spark vs a recursive CTE oracle. Graph: lineitem-derived edges.
    QueryDef(
      "x4_bfs_reachability",
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT l_orderkey % 1000 AS src, l_partkey % 1000 AS dst
        |  FROM lineitem),
        |r AS (
        |  SELECT 0::BIGINT AS node, 0 AS depth
        |  UNION
        |  SELECT e.dst AS node, r.depth + 1 AS depth
        |  FROM r JOIN edges e ON e.src = r.node WHERE r.depth < 3)
        |SELECT node, min(depth) AS depth FROM r GROUP BY node
        |ORDER BY node""".stripMargin) { (s, d) =>
      val edges = Tables.lineitem(s, d)
        .select((col("l_orderkey") % 1000).as("src"),
          (col("l_partkey") % 1000).as("dst"))
        .distinct()
      val seeds = s.range(1).select(lit(0L).as("node"))
      Frontier.bfs(edges, seeds, 3)
        .groupBy(col("node")).agg(min(col("depth")).as("depth"))
        .orderBy(col("node"))
    },

    // Exact triangle counting over a lineitem-derived sparse graph —
    // the canonical a<b<c two-path join (each triangle built exactly
    // once, no dedup of permuted copies), per-node participation
    // counts as exact integers.
    QueryDef(
      "gr_triangle_counts",
      """WITH raw AS (
        |  SELECT DISTINCT l_orderkey % 5000 AS src, l_partkey % 5000 AS dst
        |  FROM lineitem),
        |e AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw WHERE least(src, dst) < greatest(src, dst)),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT unnest([x, y, z]) AS node FROM tri)
        |SELECT node, count(*)::BIGINT AS n_triangles
        |FROM n GROUP BY node ORDER BY node""".stripMargin) { (s, d) =>
      val edges = Tables.lineitem(s, d)
        .select((col("l_orderkey") % 5000).as("src"),
          (col("l_partkey") % 5000).as("dst"))
      graft.operators.Graph.triangleCounts(edges)
        .orderBy(col("node"))
    },

    // Multimodal plumbing, expression form: opaque binary payload
    // column + typed metadata derived in-row. The mapPartitions batch
    // path (decode/resize/frame-sample) is graft.multimodal.Multimodal,
    // exercised by the mm_image_resize_meta / mm_frame_sample queries.
    QueryDef(
      "mm_binary_metadata",
      """SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS fingerprint,
        |  64 + (('0x'||substr(md5(text),1,15))::BIGINT % 513) AS fake_width,
        |  64 + (('0x'||substr(md5('h:'||text),1,15))::BIGINT % 385) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("fingerprint"),
          (lit(64) + HashFunctions.stableHash64(col("text")) % 513).as("fake_width"),
          (lit(64) + HashFunctions.stableHash64(concat(lit("h:"), col("text"))) % 385)
            .as("fake_height"))
        .orderBy(col("doc_id"))
    }
  )
}
