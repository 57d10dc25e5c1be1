package graft.queries

import graft.{QueryDef, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operators from SURVEY.md §2.2–§2.8: scans, filters,
  * predicate pushdown, equi/semi/anti/broadcast joins, aggregations,
  * windows, set ops, sorts/limits, scalar functions.
  *
  * Reference semantics (Graphiti-HF): point lookups / group filters
  * (`huggingface_driver.py:512-641`), cursor pagination (`nodes.py:444-468`),
  * edge↔node joins (`graph_traversal.py:104-145`), RRF-style aggregation
  * (`search_utils.py:1867-1882`), latest-record-wins windows
  * (`temporal_manager.py:655-668`), union-dedup of search lanes
  * (`search.py:233-250`).
  */
object Relational {

  def defs: Seq[QueryDef] = Seq(
    // ---- aggregation: classic pricing summary (partial aggregation /
    // map-side combine; one shuffle on the group keys) ----
    QueryDef(
      "q1_agg",
      (s, dir) => {
        val li = T.load(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 1).as("revenue"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("n"),
          )
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1.0 - l_discount)), 1) AS revenue,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """),
    ),

    // ---- projection + filter pushdown: 2-column scan, predicate reaches
    // the parquet reader (PushedFilters), unique-key sort for determinism ----
    QueryDef(
      "q_filter_project",
      (s, dir) => {
        T.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .filter(col("l_quantity") > lit(45.0))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .limit(500)
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity > 45.0
        ORDER BY l_orderkey, l_linenumber LIMIT 500
      """),
    ),

    // ---- point lookup by key (reference: df[df.uuid == x]) ----
    QueryDef(
      "q_point_lookup",
      (s, dir) => {
        T.load(s, dir, "orders")
          .filter(col("o_orderkey") === lit(42L))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      },
      Some("SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey = 42"),
    ),

    // ---- isin group filter + deterministic limit (group_id filters,
    // huggingface_driver.py:535-554) ----
    QueryDef(
      "q_group_filter",
      (s, dir) => {
        T.load(s, dir, "orders")
          .filter(col("o_orderstatus").isin("F", "P"))
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
          .limit(200)
      },
      Some("""
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderstatus IN ('F','P') ORDER BY o_orderkey LIMIT 200
      """),
    ),

    // ---- cursor pagination (nodes.py:444-468): uuid < cursor DESC LIMIT n ----
    QueryDef(
      "q_cursor_page",
      (s, dir) => {
        T.load(s, dir, "events")
          .filter(col("event_id") < lit(500L))
          .select(col("event_id"), col("event_type"), col("user_id"))
          .orderBy(col("event_id").desc)
          .limit(100)
      },
      Some("""
        SELECT event_id, event_type, user_id FROM events
        WHERE event_id < 500 ORDER BY event_id DESC LIMIT 100
      """),
    ),

    // ---- star join: fact × 4 dims; dims are broadcast (each ≤ 2000 rows
    // at any SF — at 100 TB the dim side stays small so broadcast holds) ----
    QueryDef(
      "q_star_join",
      (s, dir) => {
        val li = T.load(s, dir, "lineitem")
        val o = T.load(s, dir, "orders")
        val c = broadcast(T.load(s, dir, "customer"))
        val n = broadcast(T.load(s, dir, "nation"))
        val r = broadcast(T.load(s, dir, "region"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 1).as("revenue"),
            count(lit(1)).as("n"),
          )
          .orderBy(col("r_name"))
      },
      Some("""
        SELECT r_name, round(sum(l_extendedprice * (1.0 - l_discount)), 1) AS revenue,
               count(*) AS n
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
      """),
    ),

    // ---- semi join (EXISTS; episode→mentioned-nodes pattern,
    // search_utils.py:131-149) ----
    QueryDef(
      "q_semi_join",
      (s, dir) => {
        val c = T.load(s, dir, "customer")
        val o = T.load(s, dir, "orders").filter(col("o_totalprice") > lit(50000.0))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_customers FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 50000.0)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
      """),
    ),

    // ---- anti join (filter_existing_duplicate_of_edges,
    // edge_operations.py:538-599) ----
    QueryDef(
      "q_anti_join",
      (s, dir) => {
        val c = T.load(s, dir, "customer")
        val o = T.load(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
      """),
    ),

    // ---- per-group top-k via window (top-k per query node,
    // search_utils.py:1435,1654) ----
    QueryDef(
      "q_topk_per_group",
      (s, dir) => {
        val o = T.load(s, dir, "orders")
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= lit(3) && col("o_custkey") < lit(100L))
          .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rk"))
      },
      Some("""
        SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders) t
        WHERE rk <= 3 AND o_custkey < 100
        ORDER BY o_custkey, rk
      """),
    ),

    // ---- latest-record-wins (temporal dedup, temporal_manager.py:655-668) ----
    QueryDef(
      "q_latest_wins",
      (s, dir) => {
        val e = T.load(s, dir, "events")
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        e.withColumn("rn", row_number().over(w))
          .filter(col("rn") === lit(1))
          .select(col("user_id"), col("event_id"), col("event_type"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, event_id, event_type FROM (
          SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1 ORDER BY user_id
      """),
    ),

    // ---- running aggregate window (previous-episode context window,
    // graph_data_operations.py:122-181) ----
    QueryDef(
      "q_running_sum",
      (s, dir) => {
        val e = T.load(s, dir, "events").filter(col("user_id") < lit(5L))
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("running_value", round(sum(col("value")).over(w), 2))
          .select(col("user_id"), col("event_id"), col("running_value"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_value
        FROM events WHERE user_id < 5
        ORDER BY user_id, event_id
      """),
    ),

    // ---- union + dedup by key (multi-lane search result merge,
    // search.py:233-250) ----
    QueryDef(
      "q_union_distinct",
      (s, dir) => {
        val o = T.load(s, dir, "orders")
        val lane1 = o.filter(col("o_totalprice") > lit(90000.0)).select(col("o_custkey"))
        val lane2 = o.filter(col("o_orderpriority") === lit("1-URGENT")).select(col("o_custkey"))
        lane1.unionByName(lane2).distinct().orderBy(col("o_custkey"))
      },
      Some("""
        SELECT DISTINCT o_custkey FROM (
          SELECT o_custkey FROM orders WHERE o_totalprice > 90000.0
          UNION ALL
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') t
        ORDER BY o_custkey
      """),
    ),

    // ---- set difference (fulltext results not in vector results,
    // search_utils.py:1448-1452) ----
    QueryDef(
      "q_except",
      (s, dir) => {
        val o = T.load(s, dir, "orders")
        val a = o.filter(col("o_totalprice") > lit(80000.0)).select(col("o_custkey")).distinct()
        val b = o.filter(col("o_orderstatus") === lit("O")).select(col("o_custkey")).distinct()
        a.except(b).orderBy(col("o_custkey"))
      },
      Some("""
        SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 80000.0
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey
      """),
    ),

    // ---- distinct / dropDuplicates (dedup by uuid, search.py:250) ----
    QueryDef(
      "q_drop_duplicates",
      (s, dir) => {
        T.load(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderstatus"))
          .dropDuplicates("o_custkey", "o_orderstatus")
          .orderBy(col("o_custkey"), col("o_orderstatus"))
      },
      Some("""
        SELECT DISTINCT o_custkey, o_orderstatus FROM orders
        ORDER BY o_custkey, o_orderstatus
      """),
    ),

    // ---- deterministic scoring via when/otherwise (dedup quality score,
    // episode_processor.py:699-750 — UDF-free column expression) ----
    QueryDef(
      "q_case_score",
      (s, dir) => {
        val p = T.load(s, dir, "part")
        p.withColumn(
          "quality",
          when(col("p_size") >= lit(40), lit(3))
            .when(col("p_size") >= lit(20), lit(2))
            .when(col("p_retailprice") > lit(1500.0), lit(1))
            .otherwise(lit(0)),
        ).groupBy(col("quality"))
          .agg(count(lit(1)).as("n"), round(avg(col("p_retailprice")), 2).as("avg_price"))
          .orderBy(col("quality"))
      },
      Some("""
        SELECT quality, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price FROM (
          SELECT p_retailprice,
                 CASE WHEN p_size >= 40 THEN 3
                      WHEN p_size >= 20 THEN 2
                      WHEN p_retailprice > 1500.0 THEN 1
                      ELSE 0 END AS quality
          FROM part) t
        GROUP BY quality ORDER BY quality
      """),
    ),

    // ---- JSON field extraction (attributes JSON columns,
    // huggingface_driver.py:834-859) ----
    QueryDef(
      "q_json_extract",
      (s, dir) => {
        T.load(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("event_type"))
          .agg(round(avg(col("k")), 4).as("avg_k"), max(col("k")).as("max_k"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, round(avg(k), 4) AS avg_k, max(k) AS max_k FROM (
          SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events) t
        GROUP BY event_type ORDER BY event_type
      """),
    ),
  )
}
