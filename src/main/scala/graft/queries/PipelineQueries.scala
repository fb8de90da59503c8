package graft.queries

import graft.QueryDef.PresentOps
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

  /** Hashed features joined with the deterministic quality/test
    * labels — the shared head of the NB classifier family
    * (`pl_quality_classifier_nb` / eval / calibration). Columns:
    * (doc_id, bucket, cnt, good, test).
    */
  private def nbHvl(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    graft.operators.TextAnalysis.hashingVectorize(docs,
        "doc_id", "text", buckets = 16)
      .join(docs.select(col("doc_id"),
        (col("n_chars") >= 200).as("good"),
        (col("doc_id") % 5 === 0).as("test")), Seq("doc_id"))
  }

  /** Per-bucket add-one-smoothed log-odds weight frame (16 rows,
    * micro-units) trained over `train` rows of [[nbHvl]]'s shape —
    * the one-row class-totals cross-join is the whitelisted
    * stats-then-apply step.
    */
  private def nbWeights(train: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cls = train.groupBy(col("bucket"))
      .agg(sum(when(col("good"), col("cnt")).otherwise(0L)).as("cg"),
        sum(when(col("good"), lit(0L)).otherwise(col("cnt"))).as("cb"))
    val tot = cls.agg(sum(col("cg")).as("tg"), sum(col("cb")).as("tb"))
    cls.crossJoin(broadcast(tot)) // one-row totals frame
      .select(col("bucket"),
        round(log(((col("cg") + lit(1.0)) / (col("tg") + lit(16.0))) /
          ((col("cb") + lit(1.0)) / (col("tb") + lit(16.0)))) * lit(1e6))
          .cast("long").as("w_micro"))
  }

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
        .presentSorted(col("user_id"), col("event_type"))
    },

    // SCD2 history build (operators.History.scd2): collapse the event
    // log into type-2 validity intervals per user — one row per run of
    // consecutive identical event_type states, [valid_from, valid_to)
    // epoch bounds, version counter, open-interval is_current. The
    // whole build is one shuffle (both windows share the user_id
    // partitioning).
    QueryDef(
      "scd2_user_state_history",
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts::TIMESTAMP AS t, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts::TIMESTAMP, event_id) AS prev_type
        |  FROM events),
        |changes AS (
        |  SELECT user_id, event_type, t, event_id FROM ordered
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS version,
        |  event_type AS state,
        |  cast(floor(epoch(t)) AS BIGINT) AS valid_from,
        |  cast(floor(epoch(lead(t) OVER (PARTITION BY user_id
        |                      ORDER BY t, event_id))) AS BIGINT) AS valid_to,
        |  lead(t) OVER (PARTITION BY user_id
        |                ORDER BY t, event_id) IS NULL AS is_current
        |FROM changes ORDER BY user_id, version""".stripMargin) { (s, d) =>
      graft.operators.History.scd2(
        Tables.events(s, d), "user_id", "event_type", "ts", "event_id")
        .presentSorted(col("user_id"), col("version"))
    },

    // A9: the 3-way merge matrix — target=documents, incoming batch has
    // changed text for id%3=0, identical for id%3=1, misses id%3=2, plus
    // brand-new ids. Output: action histogram.
    QueryDef(
      "a9_merge_action_matrix",
      """WITH target AS (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(text, e'\r\n|\r', e'\n', 'g'),
        |      '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS content_hash
        |  FROM documents),
        |incoming AS (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(
        |      CASE WHEN doc_id % 3 = 0 THEN 'changed ' || text ELSE text END,
        |      e'\r\n|\r', e'\n', 'g'), '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS content_hash
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
        .presentSorted(col("action"))
    },

    // A8 + J6/J7: insert-if-absent by content hash — incoming batch of
    // half-duplicated docs; only genuinely new content survives.
    QueryDef(
      "a8_insert_if_absent",
      """WITH target AS (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(text, e'\r\n|\r', e'\n', 'g'),
        |      '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS content_hash
        |  FROM documents),
        |incoming AS (
        |  SELECT doc_id + 7000000 AS doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(
        |      CASE WHEN doc_id % 2 = 0 THEN text ELSE 'fresh ' || text END,
        |      e'\r\n|\r', e'\n', 'g'), '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS content_hash
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

    // Deterministic same-id resolution — the ingest family's answer to
    // a batch delivering one id twice with different texts: the
    // lowest-content-hash text wins on EVERY replay (min_by, not
    // dropDuplicates' arbitrary-first-row), so hash-keyed redelivery
    // convergence holds. Conflicts staged by unioning documents with a
    // variant text for every even id; output pins the winner per id.
    QueryDef(
      "pl_same_id_winner",
      """WITH cand AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'variant ' || text FROM documents
        |  WHERE doc_id % 2 = 0),
        |h AS (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(text, e'\r\n|\r', e'\n', 'g'),
        |      '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS ch
        |  FROM cand)
        |SELECT doc_id, min(ch) AS winner_hash FROM h
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val cand = docs.unionByName(
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            concat(lit("variant "), col("text")).as("text")))
      Upsert.onePerKeyByContentHashed(cand, "doc_id", "text")
        .select(col("doc_id"), col("content_hash").as("winner_hash"))
        .presentSorted(col("doc_id"))
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
        .presentSorted(col("node"))
    },

    // Exact triangle counting over a lineitem-derived sparse graph —
    // the canonical a<b<c two-path join (each triangle built exactly
    // once, no dedup of permuted copies), per-node participation
    // counts as exact integers.
    QueryDef(
      "gr_triangle_counts",
      """WITH raw AS (
        |  SELECT DISTINCT l_orderkey % 5000 AS src, l_partkey % 5000 AS dst
        |  FROM lineitem WHERE l_linenumber <= 2),
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
        .filter(col("l_linenumber") <= 2)
        .select((col("l_orderkey") % 5000).as("src"),
          (col("l_partkey") % 5000).as("dst"))
      graft.operators.Graph.triangleCounts(edges)
        .presentSorted(col("node"))
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
        .presentSorted(col("doc_id"))
    },

    // CDC replay with DELETE semantics (Upsert.applyCdc): the change
    // stream collapses to current state — latest op per key wins,
    // keys whose latest op is the delete marker ('error' here) vanish.
    // One window on one key shuffle.
    QueryDef(
      "pl_cdc_apply_deletes",
      """SELECT user_id, event_type AS last_op, round(value, 2) AS value
        |FROM (
        |  SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      Upsert.applyCdc(Tables.events(s, d), "user_id", "ts", "event_id",
        "event_type", deleteOp = "error")
        .select(col("user_id"), col("event_type").as("last_op"),
          round(col("value"), 2).as("value"))
        .presentSorted(col("user_id"))
    },

    // High-watermark incremental load (Ingest.incrementalSince): the
    // bookmark pattern of every scheduled extraction — store holds
    // events before the cutoff, the increment is everything strictly
    // beyond the store's max timestamp, pulled via a pushed-down scan
    // predicate.
    QueryDef(
      "pl_incremental_load",
      """WITH store AS (
        |  SELECT ts::TIMESTAMP AS t FROM events
        |  WHERE ts::TIMESTAMP < TIMESTAMP '2024-01-03 00:00:00'),
        |mx AS (SELECT max(t) AS m FROM store)
        |SELECT count(*) AS n_new, count(DISTINCT user_id) AS n_users,
        |  cast(floor(epoch(min(ts::TIMESTAMP))) AS BIGINT) AS first_s,
        |  cast(floor(epoch(max(ts::TIMESTAMP))) AS BIGINT) AS last_s
        |FROM events, mx WHERE ts::TIMESTAMP > mx.m""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val cutoff = lit("2024-01-03 00:00:00").cast("timestamp")
      val store = events.filter(col("ts") < cutoff)
      graft.pipeline.Ingest.incrementalSince(store, events, "ts")
        .agg(count(lit(1)).as("n_new"),
          countDistinct(col("user_id")).as("n_users"),
          unix_timestamp(min(col("ts"))).as("first_s"),
          unix_timestamp(max(col("ts"))).as("last_s"))
    },

    // Data-quality validation (operators.Checks.validate): the
    // expectations gate before publishing a load — not-null, range,
    // predicate, uniqueness and referential rules over a deliberately
    // dirtied orders frame (nulled FKs, negated prices, duplicated
    // keys, orphaned customer refs). Row-level rules + uniqueness fuse
    // into ONE aggregate over one scan; the FK rule adds one anti-join
    // against the (broadcast) customer key set.
    QueryDef(
      "pl_data_quality_checks",
      """WITH dirty AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |         WHEN o_orderkey % 89 = 0 THEN o_custkey + 9000000
        |         ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderkey % 500 = 0),
        |checks AS (
        |  SELECT 'not_null(o_custkey)' AS rule,
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS n_violations
        |  FROM dirty
        |  UNION ALL
        |  SELECT 'in_range(o_totalprice, 0.0, 1000000.0)',
        |    sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |             OR o_totalprice > 1000000 THEN 1 ELSE 0 END)::BIGINT
        |  FROM dirty
        |  UNION ALL
        |  SELECT 'satisfies(order_before_cutoff)',
        |    sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |             THEN 0 ELSE 1 END)::BIGINT
        |  FROM dirty
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)',
        |    (count(*) - count(DISTINCT o_orderkey))::BIGINT FROM dirty
        |  UNION ALL
        |  SELECT 'foreign_key(o_custkey_in_customer)',
        |    count(*)::BIGINT
        |  FROM (SELECT o_custkey FROM dirty WHERE o_custkey IS NOT NULL) dd
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM customer c WHERE c.c_custkey = dd.o_custkey))
        |SELECT rule, n_violations, n_violations = 0 AS passed
        |FROM checks ORDER BY rule""".stripMargin) { (s, d) =>
      import graft.operators.Checks
      val orders = Tables.orders(s, d)
      val dirty = orders.select(col("o_orderkey"),
          when(col("o_orderkey") % 100 === 0, lit(null).cast("long"))
            .when(col("o_orderkey") % 89 === 0, col("o_custkey") + 9000000)
            .otherwise(col("o_custkey")).as("o_custkey"),
          when(col("o_orderkey") % 97 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          col("o_orderdate"))
        .unionByName(orders.filter(col("o_orderkey") % 500 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderdate")))
      Checks.validate(dirty, Seq(
        Checks.NotNull("o_custkey"),
        Checks.InRange("o_totalprice", 0.0, 1000000.0),
        Checks.Satisfies("order_before_cutoff",
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
        Checks.Unique(Seq("o_orderkey")),
        Checks.ForeignKey(Seq("o_custkey"), Tables.customer(s, d),
          Seq("c_custkey"), "o_custkey_in_customer")))
        .presentSorted(col("rule"))
    },

    // Quarantine routing (operators.Checks.route): the dead-letter
    // half of validation — every row stamped with the sorted names of
    // the row-level rules it violates and routed main/quarantine, as a
    // pure narrow projection (the gate runs at scan speed; each side
    // streams to its sink). Rows violating several rules carry every
    // reason.
    QueryDef(
      "pl_quarantine_routing",
      """WITH dirty AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |         ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate
        |  FROM orders),
        |r AS (
        |  SELECT *,
        |    list_sort(list_filter([
        |      CASE WHEN o_custkey IS NULL THEN 'not_null(o_custkey)' END,
        |      CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |           OR o_totalprice > 1000000
        |           THEN 'in_range(o_totalprice, 0.0, 1000000.0)' END,
        |      CASE WHEN NOT coalesce(
        |             o_orderdate < TIMESTAMP '1998-01-01 00:00:00', false)
        |           THEN 'satisfies(order_before_cutoff)' END],
        |      v -> v IS NOT NULL)) AS violations
        |  FROM dirty)
        |SELECT CASE WHEN len(violations) = 0 THEN 'main'
        |            ELSE 'quarantine' END AS route,
        |  coalesce(array_to_string(violations, '|'), '') AS reasons,
        |  count(*) AS n
        |FROM r GROUP BY 1, 2 ORDER BY route, reasons""".stripMargin) { (s, d) =>
      import graft.operators.Checks
      val dirty = Tables.orders(s, d).select(col("o_orderkey"),
        when(col("o_orderkey") % 100 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")).as("o_custkey"),
        when(col("o_orderkey") % 97 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderdate"))
      Checks.route(dirty, Seq(
        Checks.NotNull("o_custkey"),
        Checks.InRange("o_totalprice", 0.0, 1000000.0),
        Checks.Satisfies("order_before_cutoff",
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))))
        .groupBy(col("route"),
          array_join(col("violations"), "|").as("reasons"))
        .agg(count(lit(1)).as("n"))
        .presentSorted(col("route"), col("reasons"))
    },

    // Column profiling (operators.Profile.columns): the QA pass before
    // trusting a new source — row/null/exact-distinct counts and
    // min/max per column, ALL columns in one scan (Expand-based
    // multi-distinct, not a per-column loop). lang is null-injected so
    // the null counting is actually exercised.
    QueryDef(
      "pl_column_profile",
      """WITH d AS (
        |  SELECT doc_id, nullif(lang, 'de') AS lang_n, source, n_chars
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT 'doc_id' AS column_name, count(*)::BIGINT AS n_rows,
        |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |    count(DISTINCT doc_id)::BIGINT AS n_distinct,
        |    min(doc_id)::VARCHAR AS min_str, max(doc_id)::VARCHAR AS max_str
        |  FROM d
        |  UNION ALL
        |  SELECT 'lang_n', count(*)::BIGINT,
        |    sum(CASE WHEN lang_n IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT lang_n)::BIGINT,
        |    min(lang_n), max(lang_n) FROM d
        |  UNION ALL
        |  SELECT 'n_chars', count(*)::BIGINT,
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT n_chars)::BIGINT,
        |    min(n_chars)::VARCHAR, max(n_chars)::VARCHAR FROM d
        |  UNION ALL
        |  SELECT 'source', count(*)::BIGINT,
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT source)::BIGINT,
        |    min(source), max(source) FROM d)
        |ORDER BY column_name""".stripMargin) { (s, d) =>
      val frame = Tables.documents(s, d).select(col("doc_id"),
        when(col("lang") === "de", lit(null).cast("string"))
          .otherwise(col("lang")).as("lang_n"),
        col("source"), col("n_chars"))
      graft.operators.Profile.columns(frame,
        Seq("doc_id", "lang_n", "n_chars", "source"))
        .presentSorted(col("column_name"))
    },

    // Fixed-iteration PageRank over the same lineitem-derived link
    // graph — the crawl-prioritization signal ("fetch high-authority
    // hosts first"). Three synchronous rounds of the un-normalized
    // (1-d) + d*sum convention, oracle-replayed as chained CTEs. The
    // top-20 ordering rounds BEFORE ranking so both engines break the
    // float ties identically.
    QueryDef(
      "gr_pagerank_topk",
      """WITH raw AS (
        |  SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst
        |  FROM lineitem
        |  WHERE l_linenumber = 1 AND l_orderkey % 2000 <> l_partkey % 2000),
        |nodes AS (SELECT src AS node FROM raw UNION SELECT dst FROM raw),
        |deg AS (SELECT src, count(*) AS outd FROM raw GROUP BY src),
        |r0 AS (SELECT node, 1.0 AS rank FROM nodes),
        |r1 AS (
        |  SELECT n.node, 0.15 + 0.85 * coalesce(sum(r.rank / dg.outd), 0) AS rank
        |  FROM nodes n
        |  LEFT JOIN raw e ON e.dst = n.node
        |  LEFT JOIN r0 r ON r.node = e.src
        |  LEFT JOIN deg dg ON dg.src = e.src
        |  GROUP BY n.node),
        |r2 AS (
        |  SELECT n.node, 0.15 + 0.85 * coalesce(sum(r.rank / dg.outd), 0) AS rank
        |  FROM nodes n
        |  LEFT JOIN raw e ON e.dst = n.node
        |  LEFT JOIN r1 r ON r.node = e.src
        |  LEFT JOIN deg dg ON dg.src = e.src
        |  GROUP BY n.node),
        |r3 AS (
        |  SELECT n.node, 0.15 + 0.85 * coalesce(sum(r.rank / dg.outd), 0) AS rank
        |  FROM nodes n
        |  LEFT JOIN raw e ON e.dst = n.node
        |  LEFT JOIN r2 r ON r.node = e.src
        |  LEFT JOIN deg dg ON dg.src = e.src
        |  GROUP BY n.node)
        |SELECT node, round(rank, 6) AS rank FROM r3
        |ORDER BY round(rank, 6) DESC, node LIMIT 20""".stripMargin) { (s, d) =>
      val edges = Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select((col("l_orderkey") % 2000).as("src"),
          (col("l_partkey") % 2000).as("dst"))
      graft.operators.Graph.pageRank(edges, iters = 3, damping = 0.85)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
    },

    // HITS hubs/authorities (Graph.hits), 2 synchronous rounds on the
    // same derived link graph — un-normalized integer convention, so
    // every score is an exact BIGINT and the oracle unrolls the rounds
    // as join+agg CTEs with zero float ambiguity. Top 20 authorities.
    QueryDef(
      "gr_hits_topk",
      """WITH raw AS (
        |  SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst
        |  FROM lineitem
        |  WHERE l_linenumber = 1 AND l_orderkey % 2000 <> l_partkey % 2000),
        |nodes AS (SELECT src AS node FROM raw UNION SELECT dst FROM raw),
        |a1 AS (
        |  SELECT n.node, count(e.src)::BIGINT AS auth
        |  FROM nodes n LEFT JOIN raw e ON e.dst = n.node
        |  GROUP BY n.node),
        |h1 AS (
        |  SELECT n.node, coalesce(sum(a.auth), 0)::BIGINT AS hub
        |  FROM nodes n
        |  LEFT JOIN raw e ON e.src = n.node
        |  LEFT JOIN a1 a ON a.node = e.dst
        |  GROUP BY n.node),
        |a2 AS (
        |  SELECT n.node, coalesce(sum(h.hub), 0)::BIGINT AS auth
        |  FROM nodes n
        |  LEFT JOIN raw e ON e.dst = n.node
        |  LEFT JOIN h1 h ON h.node = e.src
        |  GROUP BY n.node),
        |h2 AS (
        |  SELECT n.node, coalesce(sum(a.auth), 0)::BIGINT AS hub
        |  FROM nodes n
        |  LEFT JOIN raw e ON e.src = n.node
        |  LEFT JOIN a2 a ON a.node = e.dst
        |  GROUP BY n.node)
        |SELECT a2.node, h2.hub, a2.auth
        |FROM a2 JOIN h2 ON h2.node = a2.node
        |ORDER BY a2.auth DESC, a2.node LIMIT 20""".stripMargin) { (s, d) =>
      val edges = Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select((col("l_orderkey") % 2000).as("src"),
          (col("l_partkey") % 2000).as("dst"))
      graft.operators.Graph.hits(edges, iters = 2)
        .select(col("node"), col("hub"), col("auth"))
        .orderBy(col("auth").desc, col("node"))
        .limit(20)
    },

    // LABEL-PROPAGATION communities (Graph.labelPropagation): 3
    // synchronous min-label rounds on the undirected link graph —
    // every node within distance 3 of a component's minimum adopts it
    // (the mirror-site / link-farm grouping signal; run to diameter
    // it is connected components). Exact integer labels; the oracle
    // unrolls the rounds as union+min CTEs.
    QueryDef(
      "gr_label_prop",
      """WITH raw AS (
        |  SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst
        |  FROM lineitem
        |  WHERE l_linenumber = 1 AND l_orderkey % 2000 <> l_partkey % 2000),
        |sym AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
        |nodes AS (SELECT DISTINCT src AS node FROM sym),
        |l0 AS (SELECT node, node AS lbl FROM nodes),
        |l1 AS (
        |  SELECT node, min(lbl) AS lbl FROM (
        |    SELECT node, lbl FROM l0
        |    UNION ALL
        |    SELECT e.dst AS node, l.lbl FROM sym e JOIN l0 l ON l.node = e.src
        |  ) t GROUP BY node),
        |l2 AS (
        |  SELECT node, min(lbl) AS lbl FROM (
        |    SELECT node, lbl FROM l1
        |    UNION ALL
        |    SELECT e.dst AS node, l.lbl FROM sym e JOIN l1 l ON l.node = e.src
        |  ) t GROUP BY node),
        |l3 AS (
        |  SELECT node, min(lbl) AS lbl FROM (
        |    SELECT node, lbl FROM l2
        |    UNION ALL
        |    SELECT e.dst AS node, l.lbl FROM sym e JOIN l2 l ON l.node = e.src
        |  ) t GROUP BY node)
        |SELECT node, lbl AS community FROM l3 ORDER BY node""".stripMargin) { (s, d) =>
      val edges = Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select((col("l_orderkey") % 2000).as("src"),
          (col("l_partkey") % 2000).as("dst"))
      graft.operators.Graph.labelPropagation(edges, iters = 3)
        .presentSorted(col("node"))
    },

    // Bounded-hop weighted shortest paths (Graph.ssspBounded): 3
    // synchronous Bellman-Ford relaxations from the seed-hub set
    // (nodes ≡ 0 mod 400) over the min-quantity-weighted link graph —
    // "distance to the nearest trusted hub", the crawl-frontier trust
    // signal. Exact BIGINT weights/distances; the oracle unrolls the
    // rounds as union+min CTEs.
    QueryDef(
      "gr_sssp_bounded",
      """WITH raw AS (
        |  SELECT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst,
        |    min(round(l_quantity))::BIGINT AS w
        |  FROM lineitem
        |  WHERE l_linenumber = 1 AND l_orderkey % 2000 <> l_partkey % 2000
        |  GROUP BY 1, 2),
        |d0 AS (
        |  SELECT DISTINCT src AS node, 0::BIGINT AS dist FROM raw
        |  WHERE src % 400 = 0),
        |d1 AS (SELECT node, min(dist)::BIGINT AS dist FROM (
        |  SELECT * FROM d0 UNION ALL
        |  SELECT e.dst, d.dist + e.w FROM d0 d JOIN raw e ON e.src = d.node)
        |  GROUP BY node),
        |d2 AS (SELECT node, min(dist)::BIGINT AS dist FROM (
        |  SELECT * FROM d1 UNION ALL
        |  SELECT e.dst, d.dist + e.w FROM d1 d JOIN raw e ON e.src = d.node)
        |  GROUP BY node),
        |d3 AS (SELECT node, min(dist)::BIGINT AS dist FROM (
        |  SELECT * FROM d2 UNION ALL
        |  SELECT e.dst, d.dist + e.w FROM d2 d JOIN raw e ON e.src = d.node)
        |  GROUP BY node)
        |SELECT node, dist FROM d3 ORDER BY node""".stripMargin) { (s, d) =>
      val edges = Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select((col("l_orderkey") % 2000).as("src"),
          (col("l_partkey") % 2000).as("dst"),
          round(col("l_quantity")).cast("long").as("w"))
      // Seeds come from the SELF-LOOP-FILTERED edge set: the oracle's
      // d0 reads src from `raw`, which already excludes src = dst, so
      // a hub appearing only in self-loop rows must not seed here
      // either.
      val seeds = edges.filter(col("src") =!= col("dst"))
        .select(col("src").as("node"))
        .filter(col("node") % 400 === 0)
      graft.operators.Graph.ssspBounded(edges, seeds, rounds = 3)
        .presentSorted(col("node"))
    },

    // Per-source closed-form OLS of whitespace-token count on
    // character count — the tokens-per-char rate model a budget
    // planner uses to convert byte budgets into token budgets without
    // tokenizing. The distributed-training shape in miniature: ONE
    // map-side-combined pass aggregates the exact integer moments
    // (n, Σx, Σy, Σx², Σxy) per source, and the normal equations
    // solve inside the projection — slope/intercept in exact ppm /
    // milli units, no floats, no driver math.
    QueryDef(
      "pl_linreg_token_rate",
      """WITH t AS (
        |  SELECT source, n_chars::BIGINT AS x,
        |    len(list_filter(string_split(trim(text, ' '), ' '), z -> z <> ''))::BIGINT AS y
        |  FROM documents),
        |m AS (
        |  SELECT source, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |    sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
        |    sum(x * y)::BIGINT AS sxy
        |  FROM t GROUP BY 1)
        |SELECT source, n,
        |  ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx) AS slope_ppm,
        |  ((sy * sxx - sx * sxy) * 1000) // (n * sxx - sx * sx)
        |    AS intercept_milli
        |FROM m WHERE n * sxx - sx * sx > 0 ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), col("n_chars").cast("long").as("x"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .filter(expr("n * sxx - sx * sx > 0"))
        .select(col("source"), col("n"),
          expr("(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)")
            .as("slope_ppm"),
          expr("(sy * sxx - sx * sxy) * 1000 div (n * sxx - sx * sx)")
            .as("intercept_milli"))
        .presentSorted(col("source"))
    },

    // Per-source winsorization report: clamp doc lengths to the exact
    // in-source [p10, p90] deciles (deterministic index rule
    // rn == ceil(q*n) on the (value, doc_id) order — pure integer, no
    // interpolation ambiguity) and report the clip counts + winsorized
    // mass. The robust-normalization step before any length-based
    // quality gate; decile frame is #sources rows, broadcast back.
    QueryDef(
      "pl_winsorize_clip",
      """WITH t AS (
        |  SELECT source, doc_id, n_chars::BIGINT AS x FROM documents),
        |r AS (
        |  SELECT source, x,
        |    row_number() OVER (PARTITION BY source ORDER BY x, doc_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM t),
        |b AS (
        |  SELECT source,
        |    min(CASE WHEN rn = (n + 9) // 10 THEN x END) AS p10,
        |    min(CASE WHEN rn = (9 * n + 9) // 10 THEN x END) AS p90,
        |    min(n)::BIGINT AS n
        |  FROM r GROUP BY source)
        |SELECT t.source, b.n, b.p10, b.p90,
        |  sum(CASE WHEN x < p10 THEN 1 ELSE 0 END)::BIGINT AS n_clip_lo,
        |  sum(CASE WHEN x > p90 THEN 1 ELSE 0 END)::BIGINT AS n_clip_hi,
        |  sum(greatest(p10, least(p90, x)))::BIGINT AS sum_winsorized
        |FROM t JOIN b ON b.source = t.source
        |GROUP BY t.source, b.n, b.p10, b.p90
        |ORDER BY t.source""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("x"))
      val wOrd = Window.partitionBy(col("source"))
        .orderBy(col("x"), col("doc_id"))
      val wAll = Window.partitionBy(col("source"))
      val bounds = t
        .select(col("source"), col("x"),
          row_number().over(wOrd).as("rn"),
          count(lit(1)).over(wAll).as("n"))
        .groupBy(col("source"))
        .agg(
          min(when(col("rn") === expr("(n + 9) div 10"), col("x")))
            .as("p10"),
          min(when(col("rn") === expr("(9 * n + 9) div 10"), col("x")))
            .as("p90"),
          min(col("n")).as("n"))
      t.join(broadcast(bounds), Seq("source"))
        .groupBy(col("source"), col("n"), col("p10"), col("p90"))
        .agg(
          sum(when(col("x") < col("p10"), 1L).otherwise(0L))
            .as("n_clip_lo"),
          sum(when(col("x") > col("p90"), 1L).otherwise(0L))
            .as("n_clip_hi"),
          sum(greatest(col("p10"), least(col("p90"), col("x"))))
            .as("sum_winsorized"))
        .select(col("source"), col("n"), col("p10"), col("p90"),
          col("n_clip_lo"), col("n_clip_hi"), col("sum_winsorized"))
        .presentSorted(col("source"))
    },

    // Naive-Bayes quality classifier over the hashed features: TRAIN
    // (per-bucket log-odds weights from a deterministic heuristic
    // label, add-one smoothed, micro-units) and SCORE (per-doc
    // Σ cnt·w over its buckets) in one declarative plan — the
    // classic scalable text classifier, distributed as two
    // map-side-combined aggregates + a 16-row broadcast weight frame;
    // no vocabulary dictionary, no driver-side math. Top 20 by score.
    QueryDef(
      "pl_quality_classifier_nb",
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(trim(text, ' '), ' '), x -> x <> ''))
        |      AS tok
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5('hv:' || tok), 1, 15))::BIGINT % 16)
        |      AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM t GROUP BY 1, 2),
        |lab AS (SELECT doc_id, (n_chars >= 200) AS good FROM documents),
        |cls AS (
        |  SELECT h.bucket,
        |    sum(CASE WHEN lab.good THEN cnt ELSE 0 END)::BIGINT AS cg,
        |    sum(CASE WHEN lab.good THEN 0 ELSE cnt END)::BIGINT AS cb
        |  FROM h JOIN lab ON lab.doc_id = h.doc_id GROUP BY 1),
        |tot AS (SELECT sum(cg)::BIGINT AS tg, sum(cb)::BIGINT AS tb FROM cls),
        |w AS (
        |  SELECT bucket,
        |    round(ln( ((cg + 1.0) / (tg + 16.0)) / ((cb + 1.0) / (tb + 16.0)) )
        |      * 1e6)::BIGINT AS w_micro
        |  FROM cls, tot),
        |sc AS (
        |  SELECT h.doc_id, sum(h.cnt * w.w_micro)::BIGINT AS score_micro
        |  FROM h JOIN w ON w.bucket = h.bucket GROUP BY 1)
        |SELECT doc_id, score_micro FROM sc
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      val hvl = nbHvl(s, d)
      hvl.join(broadcast(nbWeights(hvl)), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt") * col("w_micro")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(20)
    },

    // Held-out EVALUATION of the NB classifier: weights train on the
    // 80% split only (doc_id % 5 != 0), the 20% test split scores
    // against them, and the confusion matrix + accuracy/precision/
    // recall come out in exact integer milli — the
    // no-train-on-test discipline every production classifier gate
    // needs, and the quality twin of search_eval_* for the selection
    // family. Same two-aggregate + broadcast-weights shape as the
    // classifier itself; one row out.
    QueryDef(
      "pl_classifier_eval_split",
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(trim(text, ' '), ' '), x -> x <> ''))
        |      AS tok
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5('hv:' || tok), 1, 15))::BIGINT % 16)
        |      AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM t GROUP BY 1, 2),
        |lab AS (SELECT doc_id, (n_chars >= 200) AS good,
        |               (doc_id % 5 = 0) AS test FROM documents),
        |cls AS (
        |  SELECT h.bucket,
        |    sum(CASE WHEN lab.good THEN cnt ELSE 0 END)::BIGINT AS cg,
        |    sum(CASE WHEN lab.good THEN 0 ELSE cnt END)::BIGINT AS cb
        |  FROM h JOIN lab ON lab.doc_id = h.doc_id
        |  WHERE NOT lab.test GROUP BY 1),
        |tot AS (SELECT sum(cg)::BIGINT AS tg, sum(cb)::BIGINT AS tb FROM cls),
        |w AS (
        |  SELECT bucket,
        |    round(ln( ((cg + 1.0) / (tg + 16.0)) / ((cb + 1.0) / (tb + 16.0)) )
        |      * 1e6)::BIGINT AS w_micro
        |  FROM cls, tot),
        |sc AS (
        |  SELECT h.doc_id, sum(h.cnt * w.w_micro)::BIGINT AS score
        |  FROM h JOIN w ON w.bucket = h.bucket
        |  JOIN lab ON lab.doc_id = h.doc_id
        |  WHERE lab.test GROUP BY 1),
        |cm AS (
        |  SELECT
        |    sum(CASE WHEN score > 0 AND good THEN 1 ELSE 0 END)::BIGINT AS tp,
        |    sum(CASE WHEN score > 0 AND NOT good THEN 1 ELSE 0 END)::BIGINT AS fp,
        |    sum(CASE WHEN score <= 0 AND NOT good THEN 1 ELSE 0 END)::BIGINT AS tn,
        |    sum(CASE WHEN score <= 0 AND good THEN 1 ELSE 0 END)::BIGINT AS fn
        |  FROM sc JOIN lab ON lab.doc_id = sc.doc_id)
        |SELECT tp, fp, tn, fn,
        |  (tp + tn) * 1000 // (tp + fp + tn + fn) AS accuracy_milli,
        |  CASE WHEN tp + fp = 0 THEN 0
        |    ELSE tp * 1000 // (tp + fp) END AS precision_milli,
        |  CASE WHEN tp + fn = 0 THEN 0
        |    ELSE tp * 1000 // (tp + fn) END AS recall_milli
        |FROM cm""".stripMargin) { (s, d) =>
      val hvl = nbHvl(s, d)
      val w = nbWeights(hvl.filter(!col("test")))
      val cm = hvl.filter(col("test"))
        .join(broadcast(w), Seq("bucket"))
        .groupBy(col("doc_id"), col("good"))
        .agg(sum(col("cnt") * col("w_micro")).as("score"))
        .agg(
          sum(when(col("score") > 0 && col("good"), 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("score") > 0 && !col("good"), 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("score") <= 0 && !col("good"), 1L).otherwise(0L))
            .as("tn"),
          sum(when(col("score") <= 0 && col("good"), 1L).otherwise(0L))
            .as("fn"))
      cm.select(col("tp"), col("fp"), col("tn"), col("fn"),
        expr("(tp + tn) * 1000 div (tp + fp + tn + fn)")
          .as("accuracy_milli"),
        when(col("tp") + col("fp") === 0, 0L)
          .otherwise(expr("tp * 1000 div (tp + fp)")).as("precision_milli"),
        when(col("tp") + col("fn") === 0, 0L)
          .otherwise(expr("tp * 1000 div (tp + fn)")).as("recall_milli"))
    },

    // CALIBRATION (reliability diagram) of the NB classifier on the
    // held-out split: test scores cut into exact rank-decile buckets
    // (the deterministic (rn-1)*10 div n rule — no interpolation, no
    // ntile ambiguity), each reporting observed good-rate + score
    // range. The "does score X mean probability Y" audit that decides
    // whether a score threshold is usable as a sampling weight.
    QueryDef(
      "pl_classifier_calibration",
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(trim(text, ' '), ' '), x -> x <> ''))
        |      AS tok
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5('hv:' || tok), 1, 15))::BIGINT % 16)
        |      AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM t GROUP BY 1, 2),
        |lab AS (SELECT doc_id, (n_chars >= 200) AS good,
        |               (doc_id % 5 = 0) AS test FROM documents),
        |cls AS (
        |  SELECT h.bucket,
        |    sum(CASE WHEN lab.good THEN cnt ELSE 0 END)::BIGINT AS cg,
        |    sum(CASE WHEN lab.good THEN 0 ELSE cnt END)::BIGINT AS cb
        |  FROM h JOIN lab ON lab.doc_id = h.doc_id
        |  WHERE NOT lab.test GROUP BY 1),
        |tot AS (SELECT sum(cg)::BIGINT AS tg, sum(cb)::BIGINT AS tb FROM cls),
        |w AS (
        |  SELECT bucket,
        |    round(ln( ((cg + 1.0) / (tg + 16.0)) / ((cb + 1.0) / (tb + 16.0)) )
        |      * 1e6)::BIGINT AS w_micro
        |  FROM cls, tot),
        |sc AS (
        |  SELECT h.doc_id, sum(h.cnt * w.w_micro)::BIGINT AS score
        |  FROM h JOIN w ON w.bucket = h.bucket
        |  JOIN lab ON lab.doc_id = h.doc_id WHERE lab.test GROUP BY 1),
        |r AS (
        |  SELECT sc.doc_id, score, lab.good,
        |    row_number() OVER (ORDER BY score, sc.doc_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM sc JOIN lab ON lab.doc_id = sc.doc_id)
        |SELECT ((rn - 1) * 10) // n AS decile,
        |  count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN good THEN 1 ELSE 0 END)::BIGINT AS n_good,
        |  (sum(CASE WHEN good THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT
        |    AS good_rate_milli,
        |  min(score)::BIGINT AS min_score, max(score)::BIGINT AS max_score
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val hvl = nbHvl(s, d)
      val w = nbWeights(hvl.filter(!col("test")))
      val scored = hvl.filter(col("test"))
        .join(broadcast(w), Seq("bucket"))
        .groupBy(col("doc_id"), col("good"))
        .agg(sum(col("cnt") * col("w_micro")).as("score"))
      // Decile rank from the two-pass distributed global rank — the
      // unpartitioned Window.orderBy it replaces is a single-task
      // WindowExec over every scored doc (guide §2's one-reducer
      // anti-pattern); the total count comes free from pass 1 instead
      // of a second global window.
      val (ranked, nDocs, _) = graft.operators.Corpus.globalOrderedRank(
        scored, Seq(col("score"), col("doc_id")), rnCol = "rn")
      ranked
        .withColumn("n", lit(nDocs))
        .groupBy(expr("((rn - 1) * 10) div n").as("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("good"), 1L).otherwise(0L)).as("n_good"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .select(col("decile"), col("n_docs"), col("n_good"),
          expr("n_good * 1000 div n_docs").as("good_rate_milli"),
          col("min_score"), col("max_score"))
        .presentSorted(col("decile"))
    },

    // Deterministic K-FOLD assignment + balance audit: folds from the
    // pinned portable hash (no RNG — any engine or retraining
    // reproduces the exact split), audited per (fold, source) so a
    // skewed fold is visible BEFORE a cross-validation run spends
    // compute on it. One narrow projection + one map-side-combined
    // aggregate.
    QueryDef(
      "pl_kfold_assign",
      """WITH f AS (
        |  SELECT doc_id, source,
        |    (('0x' || substr(md5('fold:' || doc_id), 1, 15))::BIGINT % 5)
        |      AS fold
        |  FROM documents)
        |SELECT fold, source, count(*)::BIGINT AS n_docs
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(
          (graft.functions.HashFunctions.stableHash64(
            concat(lit("fold:"), col("doc_id").cast("string"))) % 5)
            .as("fold"),
          col("source"))
        .groupBy(col("fold"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .presentSorted(col("fold"), col("source"))
    },

    // SKEW REPORT: the top heavy join keys with their traffic share
    // and the ceil(freq/avg) salting factor the salted-join family
    // would apply — the diagnosis step that decides WHEN to salt
    // (join_salted_user_segment is the treatment). One
    // map-side-combined key count + a one-row totals frame.
    QueryDef(
      "pl_skew_report",
      """WITH k AS (
        |  SELECT l_partkey AS key, count(*)::BIGINT AS n
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT sum(n)::BIGINT AS total, count(*)::BIGINT AS nkeys
        |      FROM k)
        |SELECT key, n, (n * 1000000) // total AS share_ppm,
        |  (n * nkeys + total - 1) // total AS salt_factor
        |FROM k, g ORDER BY n DESC, key LIMIT 20""".stripMargin) { (s, d) =>
      val k = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("key"))
        .agg(count(lit(1)).as("n"))
      val g = k.agg(sum(col("n")).as("total"),
        count(lit(1)).as("nkeys"))
      k.crossJoin(broadcast(g)) // one-row totals frame
        .select(col("key"), col("n"),
          expr("n * 1000000 div total").as("share_ppm"),
          expr("(n * nkeys + total - 1) div total").as("salt_factor"))
        .orderBy(col("n").desc, col("key"))
        .limit(20)
    },

    // LINK PREDICTION (Graph.commonNeighborPairs): node pairs citing
    // >= 2 common out-neighbors with the neighbor-set Jaccard —
    // mirror-detection / recommendation evidence. Pairs meet on the
    // SHARED NEIGHBOR key and only in-degree <= 20 neighbors
    // participate (the blocked-Jaccard df-cap on graphs: hubs convey
    // no similarity and would pair everyone); every count derives
    // from the same capped edge set.
    QueryDef(
      "gr_link_prediction",
      """WITH raw AS (
        |  SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst
        |  FROM lineitem
        |  WHERE l_linenumber = 1 AND l_orderkey % 2000 <> l_partkey % 2000),
        |indeg AS (SELECT dst, count(*) AS ind FROM raw GROUP BY dst),
        |e AS (SELECT src, r.dst FROM raw r JOIN indeg i ON i.dst = r.dst
        |      WHERE i.ind <= 20),
        |deg AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY src),
        |pairs AS (
        |  SELECT x.src AS a, y.src AS b, count(*)::BIGINT AS common
        |  FROM e x JOIN e y ON y.dst = x.dst AND x.src < y.src
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT a, b, common,
        |  (common * 1000) // (da.d + db.d - common) AS jaccard_milli
        |FROM pairs JOIN deg da ON da.src = a JOIN deg db ON db.src = b
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      val edges = Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select((col("l_orderkey") % 2000).as("src"),
          (col("l_partkey") % 2000).as("dst"))
      graft.operators.Graph.commonNeighborPairs(edges, inDegCap = 20,
          minCommon = 2L)
        .presentSorted(col("a"), col("b"))
    },

    // Anchor-text aggregation: the inbound-link description of a target
    // page (what the web "calls" a url — the classic relevance signal a
    // crawler's ranking layer feeds on). Positional zip of the href and
    // anchor-text capture groups, explode, then an ordered distinct
    // string-agg per target. One shuffle on the target url.
    QueryDef(
      "gr_anchor_text",
      """WITH pages AS (
        |  SELECT doc_id,
        |    '<a href="https://s' || (doc_id % 40) || '.example.com/">'
        |      || 'site ' || (doc_id % 40) || '</a>'
        |    || '<a href="https://s' || ((doc_id + 1) % 40) || '.example.com/">'
        |      || 'neighbor ' || ((doc_id + 1) % 40) || '</a>'
        |    || '<a href="https://hub.example.com/">hub no ' || (doc_id % 3) || '</a>'
        |    AS html
        |  FROM documents),
        |pairs AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(html, '<a href="([^"]*)"[^>]*>([^<]*)</a>', 1)) AS target,
        |    unnest(regexp_extract_all(html, '<a href="([^"]*)"[^>]*>([^<]*)</a>', 2)) AS anchor
        |  FROM pages)
        |SELECT target, count(*) AS n_inbound,
        |  count(DISTINCT anchor) AS n_anchors,
        |  string_agg(DISTINCT anchor, '|' ORDER BY anchor) AS anchors
        |FROM pairs GROUP BY target ORDER BY target""".stripMargin) { (s, d) =>
      val pat = "<a href=\"([^\"]*)\"[^>]*>([^<]*)</a>"
      val pages = Tables.documents(s, d).withColumn("html",
        concat(
          lit("<a href=\"https://s"), col("doc_id") % 40,
          lit(".example.com/\">site "), col("doc_id") % 40, lit("</a>"),
          lit("<a href=\"https://s"), (col("doc_id") + 1) % 40,
          lit(".example.com/\">neighbor "), (col("doc_id") + 1) % 40, lit("</a>"),
          lit("<a href=\"https://hub.example.com/\">hub no "), col("doc_id") % 3,
          lit("</a>")))
      pages
        .select(col("doc_id"),
          explode(arrays_zip(
            regexp_extract_all(col("html"), lit(pat), lit(1)),
            regexp_extract_all(col("html"), lit(pat), lit(2)))).as("p"))
        .select(col("p.0").as("target"), col("p.1").as("anchor"))
        .groupBy(col("target"))
        .agg(count(lit(1)).as("n_inbound"),
          countDistinct(col("anchor")).as("n_anchors"),
          concat_ws("|", array_sort(collect_set(col("anchor")))).as("anchors"))
        .presentSorted(col("target"))
    },

    // Corpus DATASHEET (Corpus.datasheet): the per-source release
    // summary — doc/lang counts, char/token totals, exact-dup rate,
    // mean quality. One scan + one aggregate; quality averaged via
    // exact integer micro-units so the hash compare is order-free.
    QueryDef(
      "pl_corpus_datasheet",
      """WITH corpus AS (
        |  SELECT doc_id, text, lang, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, text, lang, source FROM documents
        |  WHERE doc_id % 10 = 0),
        |p AS (
        |  SELECT source, lang, length(text) AS chars,
        |    len(list_filter(string_split(trim(text, ' '), ' '), x -> x <> '')) AS toks,
        |    sha256(trim(regexp_replace(regexp_replace(text, e'\r\n|\r', e'\n', 'g'),
        |      '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')) AS ch,
        |    round(round(
        |      least(1.0, len(list_filter(string_split(trim(text, ' '), ' '), x -> x <> '')) / 32.0) * 0.4
        |      + (len(list_distinct(list_filter(string_split(trim(text, ' '), ' '), x -> x <> ''))) * 1.0
        |         / len(list_filter(string_split(trim(text, ' '), ' '), x -> x <> ''))) * 0.4
        |      + least(1.0, len(list_filter(list_filter(string_split(trim(text, ' '), ' '), x -> x <> ''),
        |          x -> x IN ('the','a','of','and','to','in','is'))) * 8.0
        |          / len(list_filter(string_split(trim(text, ' '), ' '), x -> x <> ''))) * 0.2,
        |      4) * 1e6)::BIGINT AS q1e6
        |  FROM corpus)
        |SELECT source, count(*) AS n_docs,
        |  count(DISTINCT lang) AS n_langs,
        |  sum(chars)::BIGINT AS total_chars,
        |  sum(toks)::BIGINT AS total_tokens,
        |  round(1.0 - count(DISTINCT ch)::DOUBLE / count(*)::DOUBLE, 4) AS dup_rate,
        |  round(sum(q1e6)::DOUBLE / count(*)::DOUBLE / 1e6, 4) AS avg_quality
        |FROM p GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      import graft.operators.Corpus
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 3000000).as("doc_id"), col("text"),
            col("lang"), col("source")))
      Corpus.datasheet(corpus, "source", "text", "lang")
        .presentSorted(col("source"))
    },

    // IQR OUTLIER gate (Tukey fences) over order totals in integer
    // cents — the robust numeric-QA pass (median-based, so a single
    // corrupt row can't drag the gate the way mean/stddev z-scores
    // can). Quartiles interpolate over exact integers (deterministic
    // in both engines); fences are the same double ops in the same
    // order.
    QueryDef(
      "pl_iqr_outliers",
      """WITH c AS (
        |  SELECT round(o_totalprice * 100)::BIGINT AS cents FROM orders),
        |q AS (
        |  SELECT quantile_cont(cents, 0.25) AS q1,
        |    quantile_cont(cents, 0.75) AS q3 FROM c)
        |SELECT round(q1, 2) AS q1_cents, round(q3, 2) AS q3_cents,
        |  round(q1 - 1.5 * (q3 - q1), 2) AS lo_fence,
        |  round(q3 + 1.5 * (q3 - q1), 2) AS hi_fence,
        |  sum(CASE WHEN cents < q1 - 1.5 * (q3 - q1) THEN 1 ELSE 0 END)::BIGINT
        |    AS n_low,
        |  sum(CASE WHEN cents > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END)::BIGINT
        |    AS n_high
        |FROM c, q
        |GROUP BY q1, q3""".stripMargin) { (s, d) =>
      val cents = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      val q = cents.agg(expr("percentile(cents, 0.25)").as("q1"),
        expr("percentile(cents, 0.75)").as("q3"))
      val lo = col("q1") - lit(1.5) * (col("q3") - col("q1"))
      val hi = col("q3") + lit(1.5) * (col("q3") - col("q1"))
      cents.crossJoin(broadcast(q))
        .groupBy(col("q1"), col("q3"))
        .agg(
          sum(when(col("cents") < lo, 1L).otherwise(0L)).as("n_low"),
          sum(when(col("cents") > hi, 1L).otherwise(0L)).as("n_high"))
        .select(round(col("q1"), 2).as("q1_cents"),
          round(col("q3"), 2).as("q3_cents"),
          round(lo, 2).as("lo_fence"), round(hi, 2).as("hi_fence"),
          col("n_low"), col("n_high"))
    },

    // Train/val/test SPLIT MANIFEST (Corpus.assignSplit): stable-hash
    // band assignment — a doc's split depends only on its id, so eval
    // membership never moves as the corpus grows. Pure narrow
    // projection + one aggregate for the manifest.
    QueryDef(
      "pl_split_manifest",
      """WITH p AS (
        |  SELECT source,
        |    CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000 < 900
        |           THEN 'train'
        |         WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000 < 950
        |           THEN 'val'
        |         ELSE 'test' END AS split,
        |    len(list_filter(string_split(trim(text, ' '), ' '), x -> x <> '')) AS toks
        |  FROM documents)
        |SELECT split, source, count(*) AS n_docs, sum(toks)::BIGINT AS total_tokens
        |FROM p GROUP BY split, source ORDER BY split, source""".stripMargin) { (s, d) =>
      import graft.operators.Corpus
      import graft.functions.TextFunctions
      Corpus.assignSplit(Tables.documents(s, d), "doc_id",
          Seq("train" -> 900, "val" -> 50, "test" -> 50))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("total_tokens"))
        .presentSorted(col("split"), col("source"))
    },

    // TEMPERATURE-SCALED mixture sampling (n^0.5 source rebalancing,
    // the multilingual-corpus recipe): rates derive from the live
    // per-source counts via exact integer math (portable sqrt-floor
    // weights), then docs keep/drop by the stable-hash threshold. The
    // skewed corpus (src0 3x, src1-4 2x) must come out flattened:
    // bigger sources get LOWER per-mille rates.
    QueryDef(
      "pl_temperature_sample",
      """WITH corpus AS (
        |  SELECT doc_id, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4000000, source FROM documents
        |  WHERE substr(source, 4)::INT < 5
        |  UNION ALL
        |  SELECT doc_id + 8000000, source FROM documents WHERE source = 'src0'),
        |sz AS (
        |  SELECT source, count(*) AS n,
        |    floor(sqrt(count(*) * 1e6))::BIGINT AS w
        |  FROM corpus GROUP BY source),
        |tot AS (SELECT sum(w)::BIGINT AS tw FROM sz),
        |r AS (
        |  SELECT source, least(1000, ((150 * w) // tw) * 1000 // n) AS rate_pm
        |  FROM sz, tot)
        |SELECT c.source, r.rate_pm, count(*) AS n_kept
        |FROM corpus c JOIN r USING (source)
        |WHERE ('0x' || substr(md5(c.doc_id::VARCHAR), 1, 15))::BIGINT % 1000
        |      < r.rate_pm
        |GROUP BY c.source, r.rate_pm ORDER BY source""".stripMargin) { (s, d) =>
      import graft.operators.Corpus
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val corpus = docs
        .unionByName(docs
          .filter(substring(col("source"), 4, 10).cast("int") < 5)
          .select((col("doc_id") + 4000000).as("doc_id"), col("source")))
        .unionByName(docs.filter(col("source") === "src0")
          .select((col("doc_id") + 8000000).as("doc_id"), col("source")))
      Corpus.temperatureSample(corpus, "doc_id", "source", budgetDocs = 150)
        .groupBy(col("source"), col("rate_pm"))
        .agg(count(lit(1)).as("n_kept"))
        .presentSorted(col("source"))
    },

    // UNIMAX epoch-capped budget allocation: the waterfill that spreads
    // a token budget uniformly across sources, capping each at 2 epochs
    // of its own size — exact integer level + remainder distribution,
    // so allocations sum EXACTLY to the budget. 52000 against these
    // sizes lands some sources on their cap and the rest on the level.
    QueryDef(
      "pl_unimax_budget",
      """WITH sz AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(trim(text, ' '), ' '),
        |      x -> x <> '')))::BIGINT AS n
        |  FROM documents GROUP BY source),
        |st AS (
        |  SELECT source, n, n * 2 AS cap,
        |    row_number() OVER (ORDER BY n * 2, source) AS r,
        |    sum(n * 2) OVER (ORDER BY n * 2, source)::BIGINT AS pfx,
        |    count(*) OVER () AS nsrc
        |  FROM sz),
        |fl AS (
        |  SELECT *, (cap * (nsrc - r + 1) <= 52000 - (pfx - cap)) AS capped
        |  FROM st),
        |a AS (
        |  SELECT coalesce(max(CASE WHEN capped THEN r END), 0) AS rstar,
        |    coalesce(max(CASE WHEN capped THEN pfx END), 0) AS pfxstar
        |  FROM fl)
        |SELECT f.source, f.n AS n_tokens, f.cap,
        |  CASE WHEN f.capped THEN f.cap
        |       ELSE (52000 - a.pfxstar) // nullif(f.nsrc - a.rstar, 0)
        |         + (CASE WHEN f.r - a.rstar <=
        |              (52000 - a.pfxstar) % nullif(f.nsrc - a.rstar, 0)
        |            THEN 1 ELSE 0 END)
        |  END AS alloc,
        |  (CASE WHEN f.capped THEN f.cap
        |        ELSE (52000 - a.pfxstar) // nullif(f.nsrc - a.rstar, 0)
        |          + (CASE WHEN f.r - a.rstar <=
        |               (52000 - a.pfxstar) % nullif(f.nsrc - a.rstar, 0)
        |             THEN 1 ELSE 0 END)
        |   END) * 1000 // f.n AS epochs_milli
        |FROM fl f, a ORDER BY source""".stripMargin) { (s, d) =>
      import graft.operators.Corpus
      import graft.functions.TextFunctions
      val sizes = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
      Corpus.unimaxAllocate(sizes, "source", "n_tokens",
          budget = 52000L, epochCap = 2)
        .presentSorted(col("source"))
    },

    // LENGTH-BUCKETED BATCH assembly: token-length buckets (width 32)
    // cut into batches of 8 in id order; the manifest reports each
    // batch's padding waste — the number bucketed batching exists to
    // minimize. Per-bucket indexes come from the two-pass distributed
    // prefix sum, not a one-reducer window.
    QueryDef(
      "pl_length_bucket_batches",
      """WITH t AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(trim(text, ' '), ' '),
        |      x -> x <> ''))::BIGINT AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tokens, n_tokens // 32 AS bucket,
        |    row_number() OVER (PARTITION BY n_tokens // 32
        |                       ORDER BY doc_id) - 1 AS idx
        |  FROM t)
        |SELECT bucket, idx // 8 AS batch_id, count(*) AS n_docs,
        |  max(n_tokens) AS max_tokens, sum(n_tokens)::BIGINT AS sum_tokens,
        |  (max(n_tokens) * count(*) - sum(n_tokens))::BIGINT AS pad_waste
        |FROM b GROUP BY bucket, batch_id
        |ORDER BY bucket, batch_id""".stripMargin) { (s, d) =>
      import graft.operators.Corpus
      import graft.functions.TextFunctions
      val t = Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      Corpus.lengthBucketBatches(t, "doc_id", "n_tokens",
          bucketWidth = 32, batchSize = 8)
        .presentSorted(col("bucket"), col("batch_id"))
    },

    // MAD OUTLIER gate: median ± 3*MAD fences over order totals in
    // integer cents — the 50%-breakdown robust twin of the IQR gate
    // (pl_iqr_outliers), for tails heavy enough to drag the quartiles.
    QueryDef(
      "pl_mad_outliers",
      """WITH c AS (
        |  SELECT round(o_totalprice * 100)::BIGINT AS v FROM orders),
        |m AS (SELECT quantile_cont(v, 0.5) AS med FROM c),
        |d AS (
        |  SELECT med, quantile_cont(abs(v - med), 0.5) AS mad
        |  FROM c, m GROUP BY med)
        |SELECT round(med, 2) AS median_v, round(mad, 2) AS mad_v,
        |  round(med - 3.0 * mad, 2) AS lo_fence,
        |  round(med + 3.0 * mad, 2) AS hi_fence,
        |  sum(CASE WHEN v < med - 3.0 * mad THEN 1 ELSE 0 END)::BIGINT
        |    AS n_low,
        |  sum(CASE WHEN v > med + 3.0 * mad THEN 1 ELSE 0 END)::BIGINT
        |    AS n_high
        |FROM c, d GROUP BY med, mad""".stripMargin) { (s, d) =>
      import graft.operators.Corpus
      val cents = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      Corpus.madOutliers(cents, "cents", k = 3.0)
    },

    // SNAPSHOT DIFF: per-source metric deltas between two corpus
    // versions (docs dropped by a filter, one source removed, one
    // added) — the release-to-release data-ops report, full-outer on
    // the key with exact integer deltas and added/removed/common
    // status.
    QueryDef(
      "pl_snapshot_diff",
      """WITH b AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(len(list_filter(string_split(trim(text, ' '), ' '),
        |      x -> x <> '')))::BIGINT AS total_tokens
        |  FROM documents GROUP BY source),
        |af AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(len(list_filter(string_split(trim(text, ' '), ' '),
        |      x -> x <> '')))::BIGINT AS total_tokens
        |  FROM (
        |    SELECT source, text FROM documents
        |    WHERE doc_id % 7 <> 0 AND source <> 'src19'
        |    UNION ALL
        |    SELECT 'src_new' AS source, text FROM documents
        |    WHERE doc_id % 50 = 0) t
        |  GROUP BY source)
        |SELECT coalesce(b.source, af.source) AS source,
        |  CASE WHEN b.source IS NULL THEN 'added'
        |       WHEN af.source IS NULL THEN 'removed'
        |       ELSE 'common' END AS status,
        |  coalesce(af.n_docs, 0) - coalesce(b.n_docs, 0) AS n_docs_delta,
        |  coalesce(af.total_tokens, 0) - coalesce(b.total_tokens, 0)
        |    AS total_tokens_delta
        |FROM b FULL OUTER JOIN af ON af.source = b.source
        |ORDER BY source""".stripMargin) { (s, d) =>
      import graft.operators.Corpus
      import graft.functions.TextFunctions
      def rollup(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("total_tokens"))
      val docs = Tables.documents(s, d)
      val after = docs
        .filter(col("doc_id") % 7 =!= 0 && col("source") =!= "src19")
        .select(col("source"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 50 === 0)
          .select(lit("src_new").as("source"), col("text")))
      Corpus.snapshotDiff(rollup(docs), rollup(after), "source",
          Seq("n_docs", "total_tokens"))
        .presentSorted(col("source"))
    },

    // CURRICULUM PHASES: the whole corpus ordered best-quality-first
    // and cut into 4000-token training phases — curriculum learning's
    // data side. Global order = one range exchange; running token sum
    // = the two-pass distributed prefix (no global window).
    QueryDef(
      "pl_curriculum_order",
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(trim(text, ' '), ' '), x -> x <> '') AS l
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, len(l)::BIGINT AS n_tokens,
        |    round(round(
        |      least(1.0, len(l) / 32.0) * 0.4
        |      + (len(list_distinct(l)) * 1.0 / len(l)) * 0.4
        |      + least(1.0, len(list_filter(l,
        |          x -> x IN ('the','a','of','and','to','in','is'))) * 8.0
        |          / len(l)) * 0.2, 4) * 1e6)::BIGINT AS q1e6
        |  FROM t WHERE len(l) > 0),
        |c AS (
        |  SELECT doc_id, q1e6, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY q1e6 DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |      AS cum_tokens
        |  FROM p)
        |SELECT doc_id, q1e6, n_tokens, cum_tokens,
        |  cum_tokens // 4000 AS phase
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.operators.Corpus
      import graft.functions.TextFunctions
      val scored = Tables.documents(s, d)
        .filter(TextFunctions.tokenCount(col("text")) > 0)
        .select(col("doc_id"),
          round(TextFunctions.qualityScore(col("text")) * 1e6)
            .cast("long").as("q1e6"),
          TextFunctions.tokenCount(col("text")).cast("long")
            .as("n_tokens"))
      Corpus.curriculumPhases(scored, "doc_id", "q1e6", "n_tokens",
          phaseBudget = 4000)
        .presentSorted(col("doc_id"))
    },

    // DISTRIBUTION DRIFT: exact two-sample Kolmogorov–Smirnov statistic
    // between every source pair over document lengths, in integer ECDF
    // micro-units — the corpus-QA check for a source whose length
    // distribution silently shifted between snapshots.
    QueryDef(
      "pl_distribution_drift",
      """WITH cnt AS (
        |  SELECT source AS s, n_chars AS val, count(*) AS c
        |  FROM documents GROUP BY s, val),
        |tot AS (SELECT s, sum(c)::BIGINT AS n FROM cnt GROUP BY s),
        |grid AS (
        |  SELECT g.val, t.s, t.n, coalesce(c.c, 0) AS c
        |  FROM (SELECT DISTINCT val FROM cnt) g
        |  CROSS JOIN tot t
        |  LEFT JOIN cnt c ON c.s = t.s AND c.val = g.val),
        |ecdf AS (
        |  SELECT s, val,
        |    sum(c) OVER (PARTITION BY s ORDER BY val) * 1000000 // n AS f
        |  FROM grid)
        |SELECT a.s AS src_a, b.s AS src_b,
        |  max(abs(a.f - b.f))::BIGINT AS ks_micro
        |FROM ecdf a JOIN ecdf b ON a.val = b.val AND a.s < b.s
        |GROUP BY a.s, b.s ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
      import graft.operators.Corpus
      Corpus.distributionDrift(
          Tables.documents(s, d).select(col("source"), col("n_chars")),
          "source", "n_chars")
        .presentSorted(col("src_a"), col("src_b"))
    }
  )
}
