package graft.queries

import graft.QueryDef.PresentOps
import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: scans+filters+aggregation (SURVEY §2.2/2.5), the full
  * join surface (§2.4), sorts/limits (§2.6), set ops (§2.7), window
  * functions (§2.9), and explode/ordered-distinct (§2.3 X1/X2).
  *
  * All plans are declarative DataFrame chains — Catalyst handles filter
  * pushdown, column pruning, partial aggregation and join strategy.
  * Scale notes per query are inline where the choice matters at 100 TB.
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- TPC-H-style headline aggregations -------------------------------

    // Q1 pricing summary: single scan, hash aggregate on 2 low-card keys.
    // At scale: partial (map-side) agg reduces the shuffle to ~|groups| rows
    // per partition — Catalyst does the partial/final split automatically.
    QueryDef(
      "q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2)      AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2)      AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4)      AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-09-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .presentSorted(col("l_returnflag"), col("l_linestatus"))
    },

    // Q3 shipping priority: 3-way join narrowed by pushed filters, top-10.
    // customer is the small side (broadcast at scale); top-k plans as
    // TakeOrderedAndProject (no global sort materialization).
    QueryDef(
      "q3_shipping_priority",
      """SELECT l.l_orderkey,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  o.o_orderdate::DATE AS o_orderdate, o.o_orderpriority
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
        |  AND l.l_shipdate  > TIMESTAMP '1999-03-15 00:00:00'
        |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cut = lit("1999-03-15 00:00:00").cast("timestamp")
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d).filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cut),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          to_date(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Q5-style local-supplier revenue: 6-way join; region/nation/supplier
    // are broadcast dims, orders/lineitem shuffle on their join keys once.
    QueryDef(
      "q5_local_supplier_volume",
      """SELECT n.n_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM region r
        |JOIN nation n   ON n.n_regionkey = r.r_regionkey
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o   ON o.o_custkey   = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
        |JOIN supplier s ON s.s_suppkey   = l.l_suppkey
        |               AND s.s_nationkey = c.c_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n.n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      Tables.region(s, d)
        .join(Tables.nation(s, d), col("n_regionkey") === col("r_regionkey"))
        .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d),
          col("s_suppkey") === col("l_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .presentSorted(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q7-shaped volume shipping: bilateral trade between two
    // nations per ship year — the 6-join breadth test with a
    // disjunctive cross-nation predicate (catalyst must keep it above
    // the join, not lose it).
    QueryDef(
      "q7_volume_shipping",
      """SELECT supp_nation, cust_nation, l_year,
        |  round(sum(volume), 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l.l_shipdate) AS l_year,
        |    l.l_extendedprice * (1 - l.l_discount) AS volume
        |  FROM supplier s
        |  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        |  JOIN orders o   ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        |  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      // The disjunctive cross-pair predicate names exactly two nations,
      // so the per-side implication `n_name IN (pair)` is derivable even
      // though Catalyst (CBO off) can't decompose the OR itself: filter
      // both nation dims to the pair and broadcast-join them into
      // supplier/customer BEFORE the lineitem join — at scale this
      // semi-reduces both fact sides ~|nations|/2× ahead of the big
      // shuffle, keeping only the cross-pair OR as a residual.
      val pair = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val n1 = pair
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = pair
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.supplier(s, d)
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(Tables.lineitem(s, d)
            .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
          col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d)
            .join(broadcast(n2), col("c_nationkey") === col("c_nk")),
          col("c_custkey") === col("o_custkey"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .presentSorted(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q10-shaped returned-item reporting: top 20 customers by
    // revenue lost to returns in a quarter — join breadth + top-k over
    // an aggregate. Revenue sums as exact integer CENTS (per-row
    // rounding, BIGINT sum): a plain double sum differs between
    // engines in the last ulp at half-cent boundaries, which is enough
    // to flip a rounded cent and reorder the top-k tail.
    QueryDef(
      "q10_returned_items",
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)::BIGINT)::BIGINT
        |    AS revenue_cents
        |FROM customer c
        |JOIN orders o   ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n   ON n.n_nationkey = c.c_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c.c_custkey, c.c_name, n.n_name
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.nation(s, d), col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * lit(100)).cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q4-shaped order-priority check, adapted to this schema
    // (lineitem has no commit/receipt dates): orders in a quarter with
    // at least one RETURNED line, counted by priority — the canonical
    // EXISTS decorrelation; Catalyst must plan the probe as a LEFT
    // SEMI join on o_orderkey, never a per-order subquery.
    QueryDef(
      "q4_order_priority_check",
      """SELECT o.o_orderpriority, count(*)::BIGINT AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY o.o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .presentSorted(col("o_orderpriority"))
    },

    // TPC-H Q14-shaped promotion effect: share of one month's revenue
    // from PROMO parts. part is the broadcast dim; revenue sums as
    // exact integer cents on both engines, and the percentage divides
    // the two identical BIGINTs, so the double division is identical
    // to the last bit.
    QueryDef(
      "q14_promo_revenue",
      """SELECT promo_cents, total_cents,
        |  round(100.0 * promo_cents / total_cents, 4) AS promo_pct
        |FROM (
        |  SELECT
        |    sum(CASE WHEN p.p_type LIKE 'PROMO%'
        |        THEN round(l.l_extendedprice * (1 - l.l_discount) * 100)::BIGINT
        |        ELSE 0 END)::BIGINT AS promo_cents,
        |    sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)::BIGINT)::BIGINT
        |      AS total_cents
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |    AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00')""".stripMargin) { (s, d) =>
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * lit(100)).cast("long")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d)),
          col("p_partkey") === col("l_partkey"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"), cents).otherwise(0L))
            .as("promo_cents"),
          sum(cents).as("total_cents"))
        .select(col("promo_cents"), col("total_cents"),
          round(lit(100.0) * col("promo_cents") / col("total_cents"), 4)
            .as("promo_pct"))
    },

    // ---- Join surface (§2.4) --------------------------------------------

    QueryDef(
      "join_inner_segment_totals",
      """SELECT c.c_mktsegment, count(*) AS n_orders,
        |  round(sum(o.o_totalprice), 2) AS total_spend
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_spend"))
        .presentSorted(col("c_mktsegment"))
    },

    QueryDef(
      "join_left_customer_orders",
      """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
        |  round(coalesce(sum(o.o_totalprice), 0), 2) AS spend
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0)), 2).as("spend"))
        .presentSorted(col("c_custkey"))
    },

    QueryDef(
      "join_right_orders_customer",
      """SELECT c.c_custkey, c.c_mktsegment, count(o.o_orderkey) AS n_orders
        |FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey, c.c_mktsegment
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .presentSorted(col("c_custkey"))
    },

    QueryDef(
      "join_full_outer_keys",
      """SELECT coalesce(c.c_custkey, s.s_suppkey) AS k,
        |  coalesce(c.c_name, '(none)') AS c_name,
        |  coalesce(s.s_name, '(none)') AS s_name
        |FROM customer c FULL OUTER JOIN supplier s ON c.c_custkey = s.s_suppkey
        |ORDER BY k, c_name, s_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.supplier(s, d), col("c_custkey") === col("s_suppkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("s_suppkey")).as("k"),
          coalesce(col("c_name"), lit("(none)")).as("c_name"),
          coalesce(col("s_name"), lit("(none)")).as("s_name"))
        .presentSorted(col("k"), col("c_name"), col("s_name"))
    },

    // Semi/anti joins — the reference's visited-set pattern (J1-J3).
    QueryDef(
      "join_semi_big_spenders",
      """SELECT c.c_custkey, c.c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .presentSorted(col("c_custkey"))
    },

    // Skew-salted join: events (the big, potentially hot-keyed side)
    // against the customer dim with the key spread over 8 salt
    // sub-keys — the skew tool for the plans AQE cannot rewrite
    // (stream-static joins, non-algebraic downstream aggs). Results
    // are identical to the plain join, which is exactly what the
    // oracle checks.
    QueryDef(
      "join_salted_user_segment",
      """SELECT c.c_mktsegment, count(*)::BIGINT AS n,
        |  round(sum(e.value), 2) AS total_value
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("value"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.Salt.saltedJoin(ev, cust, "user_id", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .presentSorted(col("c_mktsegment"))
    },

    QueryDef(
      "join_anti_quiet_customers",
      """SELECT c.c_custkey, c.c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .presentSorted(col("c_custkey"))
    },

    // Equi + range residual: plans as a hash join with the BETWEEN as a
    // post-join filter — NOT a nested-loop, so it survives scale-up.
    QueryDef(
      "join_range_qty_size_band",
      """SELECT p.p_brand, count(*) AS n,
        |  round(sum(l.l_extendedprice), 2) AS total
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
        |GROUP BY p.p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey") &&
            col("l_quantity").between(col("p_size") - 2, col("p_size") + 2))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))
        .presentSorted(col("p_brand"))
    },

    // Backward as-of join (Asof.joinBackward): each click matched to the
    // user's latest purchase at-or-before it. Union-tag + running last()
    // over ONE key-partitioned window — no equi-join, so a hot user never
    // produces |clicks|×|purchases| intermediates. Oracle uses DuckDB's
    // native ASOF JOIN (an independent implementation of the semantics).
    QueryDef(
      "join_asof_purchase_before_click",
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS lts
        |           FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts::TIMESTAMP AS rts, max(value) AS pval
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, round(r.pval, 4) AS purchase_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.lts >= r.rts
        |ORDER BY l.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval"))
      graft.operators.Asof
        .joinBackward(clicks, purchases, Seq("user_id"), "ts", "ts", Seq("pval"))
        .select(col("event_id"), col("user_id"),
          round(col("pval"), 4).as("purchase_value"))
        .presentSorted(col("event_id"))
    },

    // FORWARD as-of (Asof.joinForward): for each purchase, the NEXT
    // click at-or-after it — the mirror of the backward lookup, same
    // union-tag single-window shape (no row-multiplying join).
    QueryDef(
      "join_asof_click_after_purchase",
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS lts
        |           FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, ts::TIMESTAMP AS rts, max(value) AS cval
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, round(r.cval, 4) AS click_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.lts <= r.rts
        |ORDER BY l.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("cval"))
      graft.operators.Asof
        .joinForward(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("cval"))
        .select(col("event_id"), col("user_id"),
          round(col("cval"), 4).as("click_value"))
        .presentSorted(col("event_id"))
    },

    // NEAREST as-of (Asof.joinNearest): each click matched to the
    // user's CLOSEST purchase in either direction (ties to the earlier
    // side) — the sensor-alignment form. Composes the two linear
    // union-tag windows; the oracle takes the argmin over all
    // candidates with the same (distance, earlier-first) tie rule.
    QueryDef(
      "join_asof_nearest",
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS lts
        |           FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts::TIMESTAMP AS rts, max(value) AS pval
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |cand AS (
        |  SELECT l.event_id, r.pval,
        |    abs(epoch_ms(l.lts) - epoch_ms(r.rts))::BIGINT AS d,
        |    row_number() OVER (PARTITION BY l.event_id
        |      ORDER BY abs(epoch_ms(l.lts) - epoch_ms(r.rts)), r.rts) AS rn
        |  FROM l JOIN r ON r.user_id = l.user_id)
        |SELECT l.event_id, l.user_id, round(c.pval, 4) AS nearest_value,
        |  c.d AS dist_ms
        |FROM l LEFT JOIN cand c ON c.event_id = l.event_id AND c.rn = 1
        |ORDER BY l.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval"))
      graft.operators.Asof
        .joinNearest(clicks, purchases, Seq("user_id"), "event_id",
          "ts", "ts", Seq("pval"))
        .select(col("event_id"), col("user_id"),
          round(col("pval"), 4).as("nearest_value"),
          col("asof_dist_ms").as("dist_ms"))
        .presentSorted(col("event_id"))
    },

    // As-of with bounded staleness: matches older than 48 h are nulled
    // (kept as unmatched, like a left join). The oracle expresses the
    // tolerance as a millisecond-epoch CASE over the same ASOF JOIN.
    QueryDef(
      "join_asof_tolerance_48h",
      """WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS lts
        |           FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts::TIMESTAMP AS rts, max(value) AS pval
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |m AS (SELECT l.user_id, l.lts, r.rts, r.pval
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.lts >= r.rts)
        |SELECT user_id,
        |  count(*)::BIGINT AS n_clicks,
        |  count(CASE WHEN epoch_ms(lts) - epoch_ms(rts) <= 172800000
        |             THEN 1 END)::BIGINT AS n_fresh,
        |  round(sum(CASE WHEN epoch_ms(lts) - epoch_ms(rts) <= 172800000
        |                 THEN pval END), 2) AS fresh_value
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval"))
      graft.operators.Asof
        .joinBackward(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("pval"), toleranceMs = Some(48L * 3600 * 1000))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_clicks"),
          count(col("pval")).as("n_fresh"),
          round(sum(col("pval")), 2).as("fresh_value"))
        .presentSorted(col("user_id"))
    },

    // Explicit broadcast of the dim tables (nation: 25 rows — at 100 TB the
    // fact side never shuffles for this join).
    QueryDef(
      "join_broadcast_geo_rollup",
      """SELECT r.r_name, n.n_name, count(*) AS n_cust,
        |  round(sum(c.c_acctbal), 2) AS total_bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("total_bal"))
        .presentSorted(col("r_name"), col("n_name"))
    },

    // ---- Aggregation variants (§2.5 + parity headroom) -------------------

    QueryDef(
      "agg_rollup_geo",
      """SELECT coalesce(r.r_name, '(all)') AS region,
        |  coalesce(n.n_name, '(all)') AS nation,
        |  count(*) AS n_cust, round(sum(c.c_acctbal), 2) AS total_bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r.r_name, n.n_name)
        |ORDER BY region, nation""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("total_bal"))
        .select(coalesce(col("r_name"), lit("(all)")).as("region"),
          coalesce(col("n_name"), lit("(all)")).as("nation"),
          col("n_cust"), col("total_bal"))
        .presentSorted(col("region"), col("nation"))
    },

    QueryDef(
      "agg_cube_order_status",
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total"))
        .presentSorted(col("status"), col("priority"))
    },

    QueryDef(
      "agg_distinct_users_per_type",
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n,
        |  round(sum(value), 2) AS total_value, round(avg(value), 2) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"),
          round(avg(col("value")), 2).as("avg_value"))
        .presentSorted(col("event_type"))
    },

    // Ordered string-agg — the reference's document-order text joins
    // (A2/A3): collect_list has no ordering guarantee, so sort an array of
    // (ts, event_id, event_type) structs and project — deterministic.
    QueryDef(
      "agg_ordered_event_seq",
      """SELECT user_id, count(*) AS n,
        |  string_agg(event_type, ',' ORDER BY ts::TIMESTAMP, event_id) AS seq
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"),
                col("event_type")))),
              x => x.getField("event_type")),
            ",").as("seq"))
        .presentSorted(col("user_id"))
    },

    // PIVOT: status counts fan out to columns per priority — Spark's
    // groupBy().pivot() with explicit values (no extra value-discovery
    // job) vs the oracle's FILTERed aggregates.
    QueryDef(
      "agg_pivot_status_by_priority",
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS n_open,
        |  count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS n_filled,
        |  count(*) FILTER (WHERE o_orderstatus = 'P')::BIGINT AS n_pending
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("O"), lit(0L)).as("n_open"),
          coalesce(col("F"), lit(0L)).as("n_filled"),
          coalesce(col("P"), lit(0L)).as("n_pending"))
        .presentSorted(col("o_orderpriority"))
    },

    // GROUPING SETS beyond rollup/cube: two independent breakdowns plus
    // the grand total in one pass, null markers disambiguated by
    // grouping() flags so the sort is deterministic.
    QueryDef(
      "agg_grouping_sets_orders",
      """SELECT coalesce(o_orderstatus, '-') AS status,
        |  coalesce(o_orderpriority, '-') AS priority,
        |  count(*)::BIGINT AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT coalesce(o_orderstatus, '-') AS status,
          coalesce(o_orderpriority, '-') AS priority,
          count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority""")
    },

    // Exact interpolated percentiles (both engines use the same
    // index = p*(n-1) linear interpolation), rounded to pin float
    // formatting.
    QueryDef(
      "agg_quantity_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 2) AS p25,
        |  round(quantile_cont(l_quantity, 0.50), 2) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 2) AS p75
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 2).as("p25"),
          round(expr("percentile(l_quantity, 0.50)"), 2).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 2).as("p75"))
        .presentSorted(col("l_returnflag"))
    },

    // Equi-width HISTOGRAM over order totals — the monitoring/profiling
    // staple. All bucket math is exact integer arithmetic (prices to
    // cents, integer DIV against the 1-row min/max stats broadcast):
    // no float boundary can land a row in different buckets across
    // engines.
    QueryDef(
      "agg_histogram_price",
      """WITH c AS (
        |  SELECT round(o_totalprice * 100)::BIGINT AS cents FROM orders),
        |g AS (SELECT min(cents) AS mn, max(cents) AS mx FROM c)
        |SELECT ((cents - mn) * 20 // (mx - mn + 1))::INT AS bucket,
        |  count(*) AS n, min(cents)::BIGINT AS lo_cents,
        |  max(cents)::BIGINT AS hi_cents
        |FROM c, g GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      val cents = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      val stats = cents.agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      cents.crossJoin(broadcast(stats))
        .select(expr("CAST((cents - mn) * 20 DIV (mx - mn + 1) AS INT)")
          .as("bucket"), col("cents"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("cents")).as("lo_cents"),
          max(col("cents")).as("hi_cents"))
        .presentSorted(col("bucket"))
    },

    // Salted two-level aggregation (operators.Salt.saltedAgg) for
    // non-algebraic state over skewed keys: collect_set per
    // (user, salt) first, so a hot user's rows split across `salts`
    // reducers, then a per-user merge of the (much smaller) partials.
    // The result must be EXACTLY the unsalted aggregate — that
    // equivalence is what the oracle checks.
    QueryDef(
      "agg_salted_distinct_seq",
      """SELECT user_id, count(*)::BIGINT AS n,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS seq
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      graft.operators.Salt.saltedAgg(
        Tables.events(s, d), "user_id", salts = 8)(
        partial = Seq(collect_set(col("event_type")).as("types"),
          count(lit(1)).as("pn")),
        merge = Seq(sum(col("pn")).as("n"),
          concat_ws(",", array_sort(array_distinct(
            flatten(collect_list(col("types")))))).as("seq")))
        .select(col("user_id"), col("n"), col("seq"))
        .presentSorted(col("user_id"))
    },

    // ---- Windows (§2.9) ---------------------------------------------------

    // Latest-version-per-key — the reference's upsert semantics (A7).
    QueryDef(
      "win_latest_event_per_user",
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .presentSorted(col("user_id"))
    },

    QueryDef(
      "win_top3_parts_per_brand",
      """SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, rnk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk
        |  FROM part) WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
      Tables.part(s, d)
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("p_brand"), col("p_partkey"),
          round(col("p_retailprice"), 2).as("price"), col("rnk"))
        .presentSorted(col("p_brand"), col("rnk"), col("p_partkey"))
    },

    QueryDef(
      "win_lag_value_delta",
      """SELECT event_id, round(value - prev, 2) AS delta FROM (
        |  SELECT event_id, value,
        |    lag(value) OVER (PARTITION BY user_id
        |                     ORDER BY ts::TIMESTAMP, event_id) AS prev
        |  FROM events) WHERE prev IS NOT NULL ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev", lag(col("value"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_id"), round(col("value") - col("prev"), 2).as("delta"))
        .presentSorted(col("event_id"))
    },

    QueryDef(
      "win_running_user_spend",
      """SELECT event_id, round(sum(value) OVER (PARTITION BY user_id
        |  ORDER BY ts::TIMESTAMP, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), round(sum(col("value")).over(w), 2).as("running"))
        .presentSorted(col("event_id"))
    },

    // Rolling z-score anomaly gate: flag events whose spend deviates
    // >1.5 sigma from the user's own trailing window (10 preceding
    // events, current row EXCLUDED so the outlier can't defend
    // itself). Exact integer algebra in cents — the z test
    // |x - s/n| > 1.5 * sqrt((n*ss - s^2)/n^2) cross-multiplies to
    // 4*(n*x - s)^2 > 9*(n*ss - s^2), no floats on either side.
    QueryDef(
      "win_rolling_zscore_outliers",
      """WITH c AS (
        |  SELECT event_id, user_id, ts::TIMESTAMP AS ts,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events),
        |w AS (
        |  SELECT event_id, cents,
        |    count(*) OVER win AS n, sum(cents) OVER win AS s,
        |    sum(cents * cents) OVER win AS ss
        |  FROM c WINDOW win AS (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, cents, n FROM w
        |WHERE n >= 5
        |  AND 4 * (n * cents - s) * (n * cents - s) > 9 * (n * ss - s * s)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-10, -1)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"), col("cents"),
          count(lit(1)).over(w).as("n"),
          sum(col("cents")).over(w).as("s"),
          sum(col("cents") * col("cents")).over(w).as("ss"))
        .filter(col("n") >= 5 && expr(
          "4 * (n * cents - s) * (n * cents - s) > 9 * (n * ss - s * s)"))
        .select(col("event_id"), col("cents"), col("n"))
        .presentSorted(col("event_id"))
    },

    // Market-basket association rules (Basket.coOccurrence): which
    // brand pairs co-occur in an order beyond chance. Baskets collapse
    // to distinct-item arrays in ONE map-side-combined aggregate,
    // pairs generate locally per array (bounded by basket width, max
    // ~11 brands here), and lift/confidence are exact count-algebra
    // ppm — no floats, no self-join of the fact table on the basket
    // key.
    QueryDef(
      "agg_market_basket_lift",
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey, p_brand FROM lineitem
        |    JOIN part ON p_partkey = l_partkey),
        |tot AS (SELECT count(DISTINCT l_orderkey) AS nb FROM b),
        |bc AS (SELECT p_brand, count(*) AS n FROM b GROUP BY 1),
        |pc AS (
        |  SELECT x.p_brand AS item_a, y.p_brand AS item_b,
        |    count(*) AS pair_n
        |  FROM b x JOIN b y ON y.l_orderkey = x.l_orderkey
        |    AND x.p_brand < y.p_brand
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, pair_n,
        |  (pair_n * tot.nb * 1000000) // (ba.n * bb.n) AS lift_ppm,
        |  (pair_n * 1000000) // ba.n AS conf_ppm
        |FROM pc, tot
        |  JOIN bc ba ON ba.p_brand = pc.item_a
        |  JOIN bc bb ON bb.p_brand = pc.item_b
        |WHERE pair_n >= 50
        |ORDER BY item_a, item_b""".stripMargin) { (s, d) =>
      val obs = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
      graft.operators.Basket.coOccurrence(obs, "l_orderkey", "p_brand",
          minPairN = 50L)
        .presentSorted(col("item_a"), col("item_b"))
    },

    // SAMPLING-ESTIMATOR AUDIT: can the deterministic 10% hash sample
    // stand in for the exact metric — mean AND median of purchase
    // value computed both ways, relative errors in exact ppm. The
    // governance row a sampling policy needs BEFORE dashboards switch
    // to samples; the sample membership is the pinned portable hash,
    // so any engine reproduces the same sample.
    QueryDef(
      "agg_sample_estimate_audit",
      """WITH p AS (
        |  SELECT event_id, round(value * 100)::BIGINT AS cents,
        |    (('0x' || substr(md5('smp:' || event_id), 1, 15))::BIGINT % 100)
        |      AS h
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT cents, h,
        |    row_number() OVER (ORDER BY cents, event_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM p),
        |rs AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents, event_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM p WHERE h < 10),
        |ex AS (SELECT min(n)::BIGINT AS n, sum(cents)::BIGINT AS s,
        |         min(CASE WHEN rn = (n + 1) // 2 THEN cents END)::BIGINT
        |           AS p50
        |       FROM r),
        |sm AS (SELECT min(n)::BIGINT AS n, sum(cents)::BIGINT AS s,
        |         min(CASE WHEN rn = (n + 1) // 2 THEN cents END)::BIGINT
        |           AS p50
        |       FROM rs)
        |SELECT ex.n AS n_exact, sm.n AS n_sample,
        |  (ex.s * 1000 // ex.n)::BIGINT AS exact_avg_milli,
        |  (sm.s * 1000 // sm.n)::BIGINT AS sample_avg_milli,
        |  ex.p50 AS exact_p50_cents, sm.p50 AS sample_p50_cents,
        |  (abs(sm.s * 1000 // sm.n - ex.s * 1000 // ex.n) * 1000000
        |    // (ex.s * 1000 // ex.n))::BIGINT AS avg_rel_err_ppm,
        |  (abs(sm.p50 - ex.p50) * 1000000 // ex.p50)::BIGINT
        |    AS p50_rel_err_ppm
        |FROM ex, sm""".stripMargin) { (s, d) =>
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          round(col("value") * 100).cast("long").as("cents"),
          (graft.functions.HashFunctions.stableHash64(
            concat(lit("smp:"), col("event_id").cast("string"))) % 100)
            .as("h"))
      def stats(df: org.apache.spark.sql.DataFrame) = {
        val wOrd = org.apache.spark.sql.expressions.Window
          .orderBy(col("cents"), col("event_id"))
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
        df.withColumn("rn", row_number().over(wOrd))
          .withColumn("n", count(lit(1)).over(wAll))
          .agg(min(col("n")).as("n"), sum(col("cents")).as("s"),
            min(when(col("rn") === expr("(n + 1) div 2"), col("cents")))
              .as("p50"))
      }
      val ex = stats(p).select(col("n").as("ne"), col("s").as("se"),
        col("p50").as("pe"))
      val sm = stats(p.filter(col("h") < 10))
        .select(col("n").as("ns"), col("s").as("ss"), col("p50").as("ps"))
      ex.crossJoin(broadcast(sm)) // two one-row stats frames
        .select(col("ne").as("n_exact"), col("ns").as("n_sample"),
          expr("se * 1000 div ne").as("exact_avg_milli"),
          expr("ss * 1000 div ns").as("sample_avg_milli"),
          col("pe").as("exact_p50_cents"), col("ps").as("sample_p50_cents"),
          expr("abs(ss * 1000 div ns - se * 1000 div ne) * 1000000 " +
            "div (se * 1000 div ne)").as("avg_rel_err_ppm"),
          expr("abs(ps - pe) * 1000000 div pe").as("p50_rel_err_ppm"))
    },

    // DAY-OF-WEEK UNIFORMITY: the weekly traffic profile plus a
    // chi-square uniformity statistic — "is load seasonal enough to
    // schedule around". Exact integer algebra throughout: the
    // uniform-expectation test cross-multiplies to
    // Σ(7·obs − total)² · 1000 div (7·total), no float expectation.
    QueryDef(
      "agg_dow_uniformity",
      """WITH e AS (
        |  SELECT ((floor(epoch(ts::TIMESTAMP))::BIGINT // 86400) % 7)::BIGINT
        |    AS dow
        |  FROM events),
        |c AS (SELECT dow, count(*)::BIGINT AS obs FROM e GROUP BY 1),
        |t AS (SELECT sum(obs)::BIGINT AS total FROM c)
        |SELECT c.dow, c.obs,
        |  (c.obs * 7000 // t.total)::BIGINT AS share_of_uniform_milli,
        |  (sum((7 * c.obs - t.total) * (7 * c.obs - t.total)) OVER ()
        |    * 1000 // (7 * t.total))::BIGINT AS chi2_milli
        |FROM c, t ORDER BY dow""".stripMargin) { (s, d) =>
      val w = Window.partitionBy()
      Tables.events(s, d)
        .select(((unix_timestamp(col("ts")) / 86400).cast("long") % 7)
          .as("dow"))
        .groupBy(col("dow"))
        .agg(count(lit(1)).as("obs"))
        .crossJoin(broadcast(
          Tables.events(s, d).agg(count(lit(1)).as("total"))))
        .withColumn("__ss",
          sum(expr("(7 * obs - total) * (7 * obs - total)")).over(w))
        .select(col("dow"), col("obs"),
          expr("obs * 7000 div total").as("share_of_uniform_milli"),
          expr("__ss * 1000 div (7 * total)").as("chi2_milli"))
        .presentSorted(col("dow"))
    },

    // MEDIAN INTER-PURCHASE GAP per user (exact index rule on the
    // sorted gap list — the reorder-cycle signal replenishment
    // forecasting starts from). Lag + rank windows share the one
    // user_id exchange; pure integer seconds.
    QueryDef(
      "win_interpurchase_median",
      """WITH p AS (
        |  SELECT user_id, floor(epoch(ts::TIMESTAMP))::BIGINT AS t
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT user_id,
        |    t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
        |  FROM p),
        |r AS (
        |  SELECT user_id, gap,
        |    row_number() OVER (PARTITION BY user_id ORDER BY gap) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM g WHERE gap IS NOT NULL)
        |SELECT user_id, min(n)::BIGINT AS n_gaps,
        |  min(CASE WHEN rn = (n + 1) // 2 THEN gap END)::BIGINT
        |    AS median_gap_s
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val wo = Window.partitionBy(col("user_id")).orderBy(col("t"))
      val wg = Window.partitionBy(col("user_id")).orderBy(col("gap"))
      val wu = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_timestamp(col("ts")).as("t"))
        .withColumn("gap", col("t") - lag(col("t"), 1).over(wo))
        .filter(col("gap").isNotNull)
        .withColumn("rn", row_number().over(wg))
        .withColumn("n", count(lit(1)).over(wu))
        .groupBy(col("user_id"))
        .agg(min(col("n")).as("n_gaps"),
          min(when(col("rn") === expr("(n + 1) div 2"), col("gap")))
            .as("median_gap_s"))
        .presentSorted(col("user_id"))
    },

    // PARETO CONCENTRATION: what share of purchase revenue the top
    // 1/5/10/25% of spenders hold — the "whale" concentration report
    // behind sampling and capacity decisions. Rank + cumulative-sum
    // windows over the per-user aggregate, thresholds as an in-row
    // explode matched on the exact ceil(pct·n/100) rank (collisions
    // keep both rows), shares in exact milli.
    QueryDef(
      "agg_pareto_concentration",
      """WITH u AS (
        |  SELECT user_id, sum(round(value * 100))::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |r AS (
        |  SELECT user_id, cents,
        |    row_number() OVER (ORDER BY cents DESC, user_id) AS rn,
        |    count(*) OVER () AS nu,
        |    sum(cents) OVER () AS tot,
        |    sum(cents) OVER (ORDER BY cents DESC, user_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM u)
        |SELECT v.pct AS top_pct, r.rn AS n_top,
        |  r.cum::BIGINT AS cum_cents,
        |  (r.cum * 1000 // r.tot)::BIGINT AS share_milli
        |FROM r CROSS JOIN (VALUES (1), (5), (10), (25)) v(pct)
        |WHERE r.rn = (v.pct * r.nu + 99) // 100
        |ORDER BY top_pct, n_top""".stripMargin) { (s, d) =>
      // All four window scalars (rank, inclusive running sum, total
      // count, total sum) come from ONE two-pass distributed prefix
      // sum over the per-user aggregate (Corpus.globalOrderedRank) —
      // the unpartitioned Window.orderBy this used to run executes as
      // a single-task WindowExec ("No Partition Defined"), a
      // one-reducer pass over every spender at 100 TB (guide §2).
      // Totals are free from the same pass-1 partition stats.
      val u = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100)).cast("long").as("cents"))
      val (ranked, nUsers, totCents) = graft.operators.Corpus
        .globalOrderedRank(u,
          Seq(col("cents").desc, col("user_id")), rnCol = "__rn",
          sumCol = Some("cents"))
      ranked
        .withColumn("rn", col("__rn").cast("int"))
        .withColumn("nu", lit(nUsers))
        .withColumn("tot", lit(totCents))
        .withColumn("cum", col("__cum") + col("cents"))
        .withColumn("pct", explode(array(lit(1), lit(5), lit(10), lit(25))))
        .filter(col("rn") === expr("(pct * nu + 99) div 100"))
        .select(col("pct").as("top_pct"), col("rn").as("n_top"),
          col("cum").as("cum_cents"),
          expr("cum * 1000 div tot").as("share_milli"))
        .presentSorted(col("top_pct"), col("n_top"))
    },

    // LINEAR MULTI-TOUCH ATTRIBUTION: each purchase's cents split
    // EXACTLY across the user's clicks in the prior 7 days — equal
    // integer shares with the division remainder credited to the most
    // recent touch, so credit sums reconcile to attributed revenue
    // bit-for-bit (the audit marketing pipelines actually fail).
    // Clicks meet purchases on the USER equi-key with the time range
    // as a post-join predicate (per-user bounded — no inequality-only
    // join), then two windows per purchase.
    QueryDef(
      "join_attribution_linear",
      """WITH p AS (
        |  SELECT event_id AS pid, user_id,
        |    floor(epoch(ts::TIMESTAMP))::BIGINT AS pt,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS cid, user_id,
        |    floor(epoch(ts::TIMESTAMP))::BIGINT AS ct
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.pid, p.cents, c.cid, c.ct,
        |    count(*) OVER (PARTITION BY p.pid) AS n_touch,
        |    row_number() OVER (PARTITION BY p.pid
        |      ORDER BY c.ct DESC, c.cid DESC) AS recency
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.ct < p.pt AND c.ct >= p.pt - 604800)
        |SELECT pid, cid, n_touch,
        |  (cents // n_touch) + CASE WHEN recency = 1
        |    THEN cents - (cents // n_touch) * n_touch ELSE 0 END
        |    AS credit_cents
        |FROM m ORDER BY pid, cid""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          unix_timestamp(col("ts")).as("pt"),
          round(col("value") * 100).cast("long").as("cents"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"),
          unix_timestamp(col("ts")).as("ct"))
      val wp = Window.partitionBy(col("pid"))
      val wr = Window.partitionBy(col("pid"))
        .orderBy(col("ct").desc, col("cid").desc)
      p.join(c, Seq("user_id"))
        .filter(col("ct") < col("pt") && col("ct") >= col("pt") - 604800)
        .select(col("pid"), col("cents"), col("cid"), col("ct"))
        .withColumn("n_touch", count(lit(1)).over(wp))
        .withColumn("recency", row_number().over(wr))
        .select(col("pid"), col("cid"), col("n_touch"),
          (expr("cents div n_touch") + when(col("recency") === 1,
            col("cents") - expr("cents div n_touch") * col("n_touch"))
            .otherwise(0L)).as("credit_cents"))
        .presentSorted(col("pid"), col("cid"))
    },

    // Distribution SHAPE profile per source: skewness + excess
    // kurtosis from ONE map-side-combined pass over exact integer
    // raw moments (Σx..Σx⁴ — bounded: 577⁴·250 ≈ 3e13), the
    // standardized-moment algebra then runs in a pinned double
    // operation order rounded to 4dp. The profiling depth column
    // stats stop at (is this source's length distribution heavy-
    // tailed or truncated).
    QueryDef(
      "agg_moment_shape_stats",
      """WITH t AS (SELECT source, n_chars::BIGINT AS x FROM documents),
        |m AS (
        |  SELECT source, count(*)::BIGINT AS n, sum(x)::BIGINT AS s1,
        |    sum(x*x)::BIGINT AS s2, sum(x*x*x)::BIGINT AS s3,
        |    sum(x*x*x*x)::BIGINT AS s4
        |  FROM t GROUP BY 1)
        |SELECT source, n,
        |  round( ((s3::DOUBLE / n) - 3.0 * (s1::DOUBLE / n) * (s2::DOUBLE / n)
        |      + 2.0 * (s1::DOUBLE / n) * (s1::DOUBLE / n) * (s1::DOUBLE / n))
        |    / pow((s2::DOUBLE / n) - (s1::DOUBLE / n) * (s1::DOUBLE / n), 1.5),
        |    4) AS skewness,
        |  round( ((s4::DOUBLE / n) - 4.0 * (s1::DOUBLE / n) * (s3::DOUBLE / n)
        |      + 6.0 * (s1::DOUBLE / n) * (s1::DOUBLE / n) * (s2::DOUBLE / n)
        |      - 3.0 * (s1::DOUBLE / n) * (s1::DOUBLE / n) * (s1::DOUBLE / n)
        |        * (s1::DOUBLE / n))
        |    / (((s2::DOUBLE / n) - (s1::DOUBLE / n) * (s1::DOUBLE / n))
        |       * ((s2::DOUBLE / n) - (s1::DOUBLE / n) * (s1::DOUBLE / n)))
        |    - 3.0, 4) AS excess_kurtosis
        |FROM m ORDER BY source""".stripMargin) { (s, d) =>
      val mean = col("s1").cast("double") / col("n")
      val r2 = col("s2").cast("double") / col("n")
      val r3 = col("s3").cast("double") / col("n")
      val r4 = col("s4").cast("double") / col("n")
      val m2 = r2 - mean * mean
      Tables.documents(s, d)
        .select(col("source"), col("n_chars").cast("long").as("x"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
        .select(col("source"), col("n"),
          round((r3 - lit(3.0) * mean * r2 +
            lit(2.0) * mean * mean * mean) / pow(m2, 1.5), 4)
            .as("skewness"),
          round((r4 - lit(4.0) * mean * r3 +
            lit(6.0) * mean * mean * r2 -
            lit(3.0) * mean * mean * mean * mean) / (m2 * m2) - lit(3.0),
            4).as("excess_kurtosis"))
        .presentSorted(col("source"))
    },

    // RETENTION COHORT MATRIX: users grouped by first-purchase day,
    // counted at each day-offset they purchase again — the classic
    // retention triangle. The cohort assignment is a min-window over
    // the SAME user_id partitioning the distinct pass already
    // shuffled on (no cohort join), pure integer day math.
    QueryDef(
      "agg_retention_cohorts",
      """WITH p AS (
        |  SELECT DISTINCT user_id,
        |    (floor(epoch(ts::TIMESTAMP))::BIGINT // 86400) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, day,
        |        min(day) OVER (PARTITION BY user_id) AS cohort
        |      FROM p)
        |SELECT cohort::BIGINT AS cohort_day,
        |  (day - cohort)::BIGINT AS offset_day,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val wu = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          (unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
        .distinct()
        .withColumn("cohort", min(col("day")).over(wu))
        .groupBy(col("cohort").as("cohort_day"),
          (col("day") - col("cohort")).as("offset_day"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .presentSorted(col("cohort_day"), col("offset_day"))
    },

    // A/B COHORT TEST: chi-square independence between an assignment
    // (user_id parity — the hash-bucket split an experiment framework
    // uses) and a conversion outcome (any purchase over $150 — value
    // is dollars here, not the repo-wide cents convention), with
    // per-cohort conversion rates in exact milli. The same guarded
    // pinned-order chi2 algebra as the term-selection family; one
    // row out of one aggregate.
    QueryDef(
      "agg_ab_cohort_chi2",
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS cohort,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |cm AS (
        |  SELECT
        |    sum(CASE WHEN cohort = 0 AND conv = 1 THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN cohort = 1 AND conv = 1 THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN cohort = 0 AND conv = 0 THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN cohort = 1 AND conv = 0 THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM u)
        |SELECT a, b, c, d,
        |  (a * 1000) // (a + c) AS conv0_milli,
        |  (b * 1000) // (b + d) AS conv1_milli,
        |  CASE WHEN (a+b) = 0 OR (c+d) = 0 OR (a+c) = 0 OR (b+d) = 0
        |    THEN 0.0
        |    ELSE round( ((a+b+c+d)::DOUBLE
        |        * ((a*d - b*c)::DOUBLE * (a*d - b*c)::DOUBLE))
        |      / (((a+b)::DOUBLE) * ((c+d)::DOUBLE) * ((a+c)::DOUBLE)
        |         * ((b+d)::DOUBLE)), 4) END AS chi2
        |FROM cm""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).as("cohort"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 150, 1L).otherwise(0L)).as("conv"))
      val cm = u.agg(
        sum(when(col("cohort") === 0 && col("conv") === 1, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("cohort") === 1 && col("conv") === 1, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("cohort") === 0 && col("conv") === 0, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("cohort") === 1 && col("conv") === 0, 1L)
          .otherwise(0L)).as("d"))
      cm.select(col("a"), col("b"), col("c"), col("d"),
        expr("a * 1000 div (a + c)").as("conv0_milli"),
        expr("b * 1000 div (b + d)").as("conv1_milli"),
        when((col("a") + col("b")) === 0 || (col("c") + col("d")) === 0 ||
          (col("a") + col("c")) === 0 || (col("b") + col("d")) === 0,
          lit(0.0)).otherwise(round(
          ((col("a") + col("b") + col("c") + col("d")).cast("double") *
            ((col("a") * col("d") - col("b") * col("c")).cast("double") *
              (col("a") * col("d") - col("b") * col("c")).cast("double"))) /
            ((col("a") + col("b")).cast("double") *
              (col("c") + col("d")).cast("double") *
              (col("a") + col("c")).cast("double") *
              (col("b") + col("d")).cast("double")), 4)).as("chi2"))
    },

    // Gaps-and-islands: each user's LONGEST streak of consecutive
    // active days (+ its earliest start day) — the engagement signal
    // behind retention cohorts. The classic day - row_number() island
    // key, one exchange on user_id shared by the window and both
    // aggregates; pure integer day arithmetic.
    QueryDef(
      "win_activity_streaks",
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    (floor(epoch(ts::TIMESTAMP))::BIGINT // 86400) AS day
        |  FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS grp
        |  FROM d),
        |s AS (
        |  SELECT user_id, count(*)::BIGINT AS len,
        |    min(day)::BIGINT AS start_day
        |  FROM r GROUP BY user_id, grp)
        |SELECT user_id, max(len)::BIGINT AS longest_streak,
        |  min(CASE WHEN len = ml THEN start_day END)::BIGINT
        |    AS streak_start
        |FROM (SELECT *, max(len) OVER (PARTITION BY user_id) AS ml FROM s)
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val wu = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .select(col("user_id"),
          (unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
        .distinct()
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
        .withColumn("ml", max(col("len")).over(wu))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("longest_streak"),
          min(when(col("len") === col("ml"), col("start_day")))
            .as("streak_start"))
        .presentSorted(col("user_id"))
    },

    // Recency-weighted user value: spend halves per week of age
    // (integer bucketed exponential decay — `cents div 2^age_weeks`,
    // shift-exact, age clamped so the shift stays defined). The
    // streaming-free LTV/priority signal; one aggregate over the
    // broadcast max-week frame.
    QueryDef(
      "agg_decayed_user_value",
      """WITH c AS (
        |  SELECT user_id, round(value * 100)::BIGINT AS cents,
        |    (floor(epoch(ts::TIMESTAMP))::BIGINT // 604800) AS wk
        |  FROM events),
        |m AS (SELECT max(wk) AS mx FROM c)
        |SELECT user_id,
        |  sum(cents // (1::BIGINT << least(mx - wk, 20)))::BIGINT
        |    AS decayed_cents,
        |  sum(cents)::BIGINT AS raw_cents
        |FROM c, m GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .select(col("user_id"),
          round(col("value") * 100).cast("long").as("cents"),
          (unix_timestamp(col("ts")) / 604800).cast("long").as("wk"))
      val m = c.agg(max(col("wk")).as("mx"))
      c.crossJoin(broadcast(m)) // one-row max-week frame
        .groupBy(col("user_id"))
        .agg(
          sum(expr("cents div shiftleft(1L, cast(least(mx - wk, 20) as int))"))
            .as("decayed_cents"),
          sum(col("cents")).as("raw_cents"))
        .presentSorted(col("user_id"))
    },

    // Exponentially-weighted moving average (truncated EWMA, weights
    // 8/4/2/1 over the last 4 events, exact `div 15`) — WMA's
    // recency-biased sibling; the geometric weights make it the
    // fixed-window face of the recursive EWMA smoother, kept exact by
    // skipping short-history rows (constant denominator).
    QueryDef(
      "win_ewma_user_spend",
      """WITH c AS (
        |  SELECT event_id, user_id, ts::TIMESTAMP AS ts,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events),
        |l AS (
        |  SELECT event_id, cents AS c0,
        |    lag(cents, 1) OVER w AS c1, lag(cents, 2) OVER w AS c2,
        |    lag(cents, 3) OVER w AS c3
        |  FROM c WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id))
        |SELECT event_id,
        |  (8 * c0 + 4 * c1 + 2 * c2 + c3) // 15 AS ewma_cents
        |FROM l WHERE c3 IS NOT NULL ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"), col("cents").as("c0"),
          lag(col("cents"), 1).over(w).as("c1"),
          lag(col("cents"), 2).over(w).as("c2"),
          lag(col("cents"), 3).over(w).as("c3"))
        .filter(col("c3").isNotNull)
        .select(col("event_id"),
          expr("(8 * c0 + 4 * c1 + 2 * c2 + c3) div 15").as("ewma_cents"))
        .presentSorted(col("event_id"))
    },

    // Weighted moving average over the last 3 events (weights 3/2/1 in
    // integer cents, exact `div 6`) — the smoothing window a
    // monitoring pipeline runs; rows without full history are skipped
    // so the weight denominator is constant.
    QueryDef(
      "win_wma_user_spend",
      """WITH c AS (
        |  SELECT event_id, user_id, ts::TIMESTAMP AS ts,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events),
        |l AS (
        |  SELECT event_id,
        |    cents AS c0,
        |    lag(cents, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS c1,
        |    lag(cents, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS c2
        |  FROM c)
        |SELECT event_id, (3 * c0 + 2 * c1 + c2) // 6 AS wma_cents
        |FROM l WHERE c2 IS NOT NULL ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"), col("cents").as("c0"),
          lag(col("cents"), 1).over(w).as("c1"),
          lag(col("cents"), 2).over(w).as("c2"))
        .filter(col("c2").isNotNull)
        .select(col("event_id"),
          expr("(3 * c0 + 2 * c1 + c2) div 6").as("wma_cents"))
        .presentSorted(col("event_id"))
    },

    // Banded INTERVAL-OVERLAP join (Interval.overlapPairs): which
    // 7-day order windows collide per customer — intervals explode to
    // week buckets so pairs meet on an EQUI key (no per-key nested
    // loop), the exact predicate verifies, and the overlap-start-
    // bucket witness rule dedups without a distinct exchange.
    QueryDef(
      "join_interval_overlap",
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    epoch_ms(o_orderdate::TIMESTAMP) AS s,
        |    epoch_ms(o_orderdate::TIMESTAMP + INTERVAL 7 DAY) AS e
        |  FROM orders)
        |SELECT x.o_custkey AS custkey, x.o_orderkey AS a,
        |  y.o_orderkey AS b,
        |  (least(x.e, y.e) - greatest(x.s, y.s))::BIGINT AS overlap_ms
        |FROM o x JOIN o y ON y.o_custkey = x.o_custkey
        |  AND x.o_orderkey < y.o_orderkey AND x.s < y.e AND y.s < x.e
        |ORDER BY custkey, a, b""".stripMargin) { (s, d) =>
      val weekMs = 7L * 86400000L
      val o = Tables.orders(s, d)
        .select(col("o_custkey").as("custkey"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("s"))
        .withColumn("e", col("s") + weekMs)
      graft.operators.Interval.overlapPairs(o, Seq("custkey"),
          "o_orderkey", "s", "e", bucketMs = weekMs)
        .presentSorted(col("custkey"), col("a"), col("b"))
    },

    QueryDef(
      "win_ntile_acctbal_quartile",
      """SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      // ntile(4) from the two-pass distributed global rank instead of
      // the unpartitioned window (single-task WindowExec over every
      // customer — guide §2's one-reducer anti-pattern): with N known
      // from pass 1, SQL ntile is pure arithmetic on the rank — the
      // first N % 4 buckets take ceil(N/4) rows, the rest floor(N/4).
      val (ranked, n, _) = graft.operators.Corpus.globalOrderedRank(
        Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
        Seq(col("c_acctbal"), col("c_custkey")), rnCol = "__rn")
      val q = n / 4
      val r = n % 4
      val quartile =
        if (q == 0L) col("__rn").cast("int")
        else (when(col("__rn") <= lit(r * (q + 1)),
            expr(s"(__rn - 1) div ${q + 1}"))
          .otherwise(expr(s"$r + (__rn - 1 - ${r * (q + 1)}) div $q"))
          + 1).cast("int")
      ranked
        .select(col("c_custkey"), quartile.as("quartile"))
        .presentSorted(col("c_custkey"))
    },

    // Rank-distribution windows: percent_rank and cume_dist share one
    // partition+order spec (one window exchange), rounded to pin float
    // formatting across engines.
    QueryDef(
      "win_rank_distributions",
      """SELECT c_custkey, c_mktsegment,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          round(percent_rank().over(w), 4).as("pct_rank"),
          round(cume_dist().over(w), 4).as("cume"))
        .presentSorted(col("c_custkey"))
    },

    // Frame-bounded first/last: each order's price vs the cheapest and
    // priciest order in its customer's FULL history (explicit
    // unbounded-both-sides frame — last_value defaults to a running
    // frame without it, in both engines).
    QueryDef(
      "win_first_last_frames",
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_totalprice) OVER w AS cheapest,
        |  last_value(o_totalprice) OVER w AS priciest
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          first(col("o_totalprice")).over(w).as("cheapest"),
          last(col("o_totalprice")).over(w).as("priciest"))
        .presentSorted(col("o_orderkey"))
    },

    // ---- Sorts / limits (§2.6) --------------------------------------------

    // O1: the job-queue "pick next PENDING" — orderBy.limit plans as
    // TakeOrderedAndProject (per-partition top-1, no global sort).
    QueryDef(
      "o1_job_pick_top1",
      """SELECT event_id, user_id FROM events WHERE event_type = 'signup'
        |ORDER BY ts::TIMESTAMP, event_id LIMIT 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "signup")
        .orderBy(col("ts"), col("event_id"))
        .limit(1)
        .select(col("event_id"), col("user_id"))
    },

    QueryDef(
      "topk_orders_by_price",
      """SELECT o_orderkey, round(o_totalprice, 2) AS total FROM orders
        |ORDER BY total DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- Set operations (§2.7) ---------------------------------------------

    QueryDef(
      "set_union_nation_keys",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey")))
        .distinct()
        .presentSorted(col("nationkey"))
    },

    QueryDef(
      "set_except_nation_keys",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).select(col("s_nationkey")))
        .presentSorted(col("nationkey"))
    },

    QueryDef(
      "set_intersect_nation_keys",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey")))
        .presentSorted(col("nationkey"))
    },

    // U3: pages+files funnel into one table with a discriminator.
    QueryDef(
      "u3_doc_source_union",
      """SELECT source_type, count(*) AS n, sum(n_chars)::BIGINT AS total_chars FROM (
        |  SELECT 'page' AS source_type, n_chars FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT 'file' AS source_type, n_chars FROM documents WHERE doc_id % 2 = 1)
        |GROUP BY source_type ORDER BY source_type""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pages = docs.filter(col("doc_id") % 2 === 0)
        .select(lit("page").as("source_type"), col("n_chars"))
      val files = docs.filter(col("doc_id") % 2 === 1)
        .select(lit("file").as("source_type"), col("n_chars"))
      pages.unionByName(files)
        .groupBy(col("source_type"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .presentSorted(col("source_type"))
    },

    // ---- Explode / ordered-distinct (§2.3 X1, X2) ---------------------------

    QueryDef(
      "x1_token_explode_counts",
      """SELECT tok, count(*) AS n FROM (
        |  SELECT unnest(string_split(trim(text, ' '), ' ')) AS tok FROM documents)
        |WHERE tok <> '' GROUP BY tok ORDER BY tok""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(trim(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"))
        .presentSorted(col("tok"))
    },

    // Count-min-sketch heavy hitters (operators.Sketch): a fixed
    // depth-4 x width-1024 counter table summarizes the whole token
    // frequency distribution; the exact top-20 tokens are then
    // estimated back through the sketch — estimates biased high only
    // (colliding buckets), never low. The oracle rebuilds the
    // identical sketch from the same md5-derived hashes.
    QueryDef(
      "agg_cms_heavy_hitters",
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(trim(text, ' '), ' '),
        |    x -> x <> '')) AS tok
        |  FROM documents),
        |tc AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
        |dd AS (SELECT unnest(range(0, 4)) AS d),
        |bs AS (
        |  SELECT d.d,
        |    ('0x'||substr(md5('cms:'||d.d||':'||t.tok),1,15))::BIGINT % 1024 AS b,
        |    sum(t.n)::BIGINT AS s
        |  FROM tc t, dd d GROUP BY 1, 2),
        |top AS (SELECT tok, n FROM tc ORDER BY n DESC, tok LIMIT 20),
        |probes AS (
        |  SELECT t.tok, d.d,
        |    ('0x'||substr(md5('cms:'||d.d||':'||t.tok),1,15))::BIGINT % 1024 AS b
        |  FROM top t, dd d),
        |est AS (
        |  SELECT p.tok, min(coalesce(bs.s, 0))::BIGINT AS cms_est
        |  FROM probes p LEFT JOIN bs ON bs.d = p.d AND bs.b = p.b
        |  GROUP BY p.tok)
        |SELECT t.tok, t.n::BIGINT AS n, e.cms_est
        |FROM top t JOIN est e USING (tok)
        |ORDER BY n DESC, tok""".stripMargin) { (s, d) =>
      import graft.operators.Sketch
      val toks = Tables.documents(s, d)
        .select(explode(filter(split(trim(col("text")), " "),
          t => t =!= lit(""))).as("tok"))
      val buckets = Sketch.cmsBuckets(toks, "tok", depth = 4, width = 1024)
      val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(20)
      top.join(Sketch.cmsEstimate(top, buckets, "tok", 4, 1024), Seq("tok"))
        .select(col("tok"), col("n"), col("cms_est"))
        .presentSorted(col("n").desc, col("tok"))
    },

    // Ordered funnel conversion (operators.Funnel): users completing
    // view -> click (strictly after) -> purchase (strictly after), in
    // ONE shuffle — per-user event arrays with stage times as chained
    // array expressions. The oracle chains the min-after joins.
    QueryDef(
      "agg_funnel_conversion",
      """WITH e AS (
        |  SELECT user_id, event_type, ts::TIMESTAMP AS t FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.t > s1.t1
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t > s2.t2
        |       GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 'l1_view' AS stage, count(*)::BIGINT AS n_users FROM s1
        |  UNION ALL SELECT 'l2_click', count(*)::BIGINT FROM s2
        |  UNION ALL SELECT 'l3_purchase', count(*)::BIGINT FROM s3)
        |ORDER BY stage""".stripMargin) { (s, d) =>
      graft.operators.Funnel.conversion(Tables.events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .presentSorted(col("stage"))
    },

    // Bloom-filter join prefilter (operators.Bloom.semiJoin): the
    // high-value orders' keys build a 2^20-bit filter that drops
    // non-matching lineitem rows BEFORE the join's shuffle; false
    // positives are removed by the exact semi join that follows, so the
    // oracle is the plain semi join — the filter must be invisible in
    // the result and visible only in the exchange volume.
    QueryDef(
      "join_bloom_prefilter",
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val keys = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("l_orderkey"))
      graft.operators.Bloom.semiJoin(Tables.lineitem(s, d), keys,
        "l_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .presentSorted(col("l_returnflag"))
    },

    // X2: first-occurrence-ordered distinct (Spark array_distinct preserves
    // first-seen order; the oracle reconstructs it via min(position)).
    QueryDef(
      "x2_ordered_distinct_tokens",
      """SELECT doc_id, string_agg(tok, ',' ORDER BY first_pos) AS toks FROM (
        |  SELECT doc_id, tok, min(pos) AS first_pos FROM (
        |    SELECT doc_id,
        |      unnest(string_split(trim(text, ' '), ' ')) AS tok,
        |      generate_subscripts(string_split(trim(text, ' '), ' '), 1) AS pos
        |    FROM documents)
        |  WHERE tok <> '' GROUP BY doc_id, tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(array_distinct(
            filter(split(trim(col("text")), " "), t => t =!= lit(""))), ",")
            .as("toks"))
        .presentSorted(col("doc_id"))
    }
  )
}
