"""DuckDB oracles for the relational operator-coverage queries."""

from __future__ import annotations

REL_Q1_AGG = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

REL_JOIN_ROLLUP = """
SELECT r_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

REL_NULLSAFE_JOIN = """
WITH c AS (
  SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_key, c_nationkey FROM customer
)
SELECT a.seg_key, count(*) AS n_pairs
FROM c a JOIN c b
  ON a.seg_key IS NOT DISTINCT FROM b.seg_key
 AND a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
GROUP BY a.seg_key
"""

REL_ARGMAX_ORDER = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC) = 1
"""

REL_LONGEST_NAME = """
SELECT p_brand, p_name AS longest_name, length(p_name) AS name_len
FROM part
QUALIFY row_number() OVER (
  PARTITION BY p_brand ORDER BY length(p_name) DESC, p_name ASC) = 1
"""

REL_GROUPS_OF_ONE = """
SELECT c_nationkey, c_mktsegment, min(c_custkey) AS only_custkey
FROM customer
GROUP BY c_nationkey, c_mktsegment
HAVING count(*) = 1
"""

REL_UNION_PROBE = """
WITH u AS (
  SELECT c_name AS name, c_nationkey AS nationkey, 'customer' AS src FROM customer
  UNION ALL
  SELECT s_name, s_nationkey, 'supplier' FROM supplier
)
SELECT nationkey, src, count(*) AS n, min(name) AS first_name
FROM u GROUP BY nationkey, src
"""

REL_ANTI_JOIN = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

REL_SEMI_JOIN = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""

REL_STRING_AGG = """
SELECT r_name, string_agg(n_name, ', ' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

REL_HIERARCHY_WALK = """
SELECT c_custkey,
       r_name || ' > ' || n_name || ' > ' || c_name AS path,
       3 AS depth
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""

REL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  -- CAST: DuckDB sum(int) OVER ... yields HUGEINT (-> float in pandas) while
  -- Spark yields BIGINT; the driver's value hash is dtype-sensitive.
  SELECT user_id, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
  FROM g
)
SELECT user_id, sess_idx, count(*) AS n_events, round(sum(value), 2) AS session_value
FROM s GROUP BY user_id, sess_idx
"""

REL_PIVOT = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
FROM orders GROUP BY o_orderpriority
"""

REL_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

ALL = {
    "rel_q1_agg": REL_Q1_AGG,
    "rel_join_rollup": REL_JOIN_ROLLUP,
    "rel_nullsafe_join": REL_NULLSAFE_JOIN,
    "rel_argmax_order": REL_ARGMAX_ORDER,
    "rel_longest_name": REL_LONGEST_NAME,
    "rel_groups_of_one": REL_GROUPS_OF_ONE,
    "rel_union_probe": REL_UNION_PROBE,
    "rel_anti_join": REL_ANTI_JOIN,
    "rel_semi_join": REL_SEMI_JOIN,
    "rel_string_agg": REL_STRING_AGG,
    "rel_hierarchy_walk": REL_HIERARCHY_WALK,
    "rel_sessionize": REL_SESSIONIZE,
    "rel_pivot": REL_PIVOT,
    "rel_rollup": REL_ROLLUP,
}

REL_WINDOW_RUNNING = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
       round(value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 2) AS delta
FROM events
"""

TEXT_EXTRACT_STRUCT = """
SELECT doc_id,
       nullif(regexp_extract(text, '([0-9]+)', 1), '') AS first_number,
       nullif(regexp_extract(text, '([A-Za-z]{4,})', 1), '') AS first_long_word,
       len(list_filter(regexp_split_to_array(text, '[.!?]'), s -> trim(s) <> '')) AS n_sentences
FROM documents
"""

ALL["rel_window_running"] = REL_WINDOW_RUNNING
ALL["text_extract_struct"] = TEXT_EXTRACT_STRUCT

# CASTs: DuckDB sum(int) is HUGEINT (-> float64 in pandas) while Spark
# sum(int) is BIGINT; the driver's value hash is dtype-sensitive.
ALL["rel_json_extract"] = """
WITH e AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       max(k) AS max_k,
       round(avg(k), 6) AS avg_k
FROM e GROUP BY event_type
"""

REL_SALTED_ROLLUP = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY user_id
"""

ALL["rel_salted_rollup"] = REL_SALTED_ROLLUP

REL_GROUPING_SETS = """
SELECT c_mktsegment, c_nationkey, count(*) AS n, round(sum(c_acctbal), 2) AS bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""

REL_PERCENTILES = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders GROUP BY o_orderpriority
"""

REL_RANGE_WINDOW = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW), 2) AS trailing_10m
FROM events
"""

REL_WINDOW_FRAMES = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
       round(value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 2) AS delta,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW), 2) AS trailing_10m
FROM events
"""

ALL["rel_grouping_sets"] = REL_GROUPING_SETS
ALL["rel_percentiles"] = REL_PERCENTILES
ALL["rel_range_window"] = REL_RANGE_WINDOW
ALL["rel_window_frames"] = REL_WINDOW_FRAMES
