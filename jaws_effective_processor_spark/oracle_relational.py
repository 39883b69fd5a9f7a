"""DuckDB oracle SQL for the relational-surface queries.

Cross-engine determinism rules (mirrors relational.py):
- DuckDB sum(BIGINT/INTEGER) widens to HUGEINT -> always CAST the sum
  back to BIGINT so schema+values line up with Spark's LongType;
- no double->int casts (DuckDB rounds, Spark truncates) — money is
  floor(x*100) cents everywhere and averages stay as exact integer
  comparisons or integer division on positive values;
- every windowed ORDER BY carries a unique tie-break column.
"""

from __future__ import annotations

PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus, sum_qty_cents, sum_base_cents,
       sum_disc_cents, sum_charge_cents, count_order,
       sum_qty_cents // count_order AS avg_qty_cents
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY l_returnflag, l_linestatus
) t
"""

REVENUE_BY_NATION_SQL = """
SELECT r_name, n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

TOP_CUSTOMERS_SQL = """
SELECT o_custkey,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY o_custkey
ORDER BY revenue_cents DESC, o_custkey
LIMIT 10
"""

ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE year(o_orderdate) = 1996
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""

PARTS_WITHOUT_ORDERS_SQL = """
SELECT p_brand, count(*) AS n_parts
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
"""

LINEITEM_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

CUSTOMER_ORDER_WINDOWS_SQL = """
SELECT o_custkey, o_orderkey,
       epoch_ms(o_orderdate) AS order_ms,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       lag(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER w AS prev_cents,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS running_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

SEGMENT_CUSTKEYS_SETOPS_SQL = """
SELECT custkey, 'orders_not_building' AS side FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) a
UNION ALL
SELECT custkey, 'building_with_orders' AS side FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) b
"""

DISTINCT_COUNTS_SQL = """
SELECT count(DISTINCT l_partkey)  AS n_parts,
       count(DISTINCT l_suppkey)  AS n_supps,
       count(DISTINCT l_orderkey) AS n_orders,
       count(*) AS n_rows
FROM lineitem
"""

APPROX_DISTINCT_SQL = """
SELECT count(DISTINCT l_partkey)  AS exact_parts,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS parts_within_15pct,
       TRUE AS orders_within_15pct,
       TRUE AS median_rank_within_halfpct
FROM lineitem
"""

# Twin of q_approx_percentiles: exact group counts + literal TRUEs —
# the hash gate passes iff the Spark sketch held its rank contract
APPROX_PERCENTILES_SQL = """
SELECT event_type, count(*) AS n_events,
       TRUE AS p250_rank_ok,
       TRUE AS p500_rank_ok,
       TRUE AS p750_rank_ok,
       TRUE AS p950_rank_ok
FROM events GROUP BY event_type
"""

HEAVY_HITTERS_SQL = """
SELECT event_type, count(*) AS n_events, TRUE AS in_sketch
FROM events GROUP BY event_type
"""

EVENTS_SESSIONIZATION_SQL = """
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(ms) AS start_ms, max(ms) AS end_ms
FROM (
  SELECT user_id, ms,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM (
    SELECT user_id, event_id, epoch_ms(ts) AS ms,
           CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id)
                     IS NULL
                  OR epoch_ms(ts) - lag(epoch_ms(ts))
                     OVER (PARTITION BY user_id ORDER BY event_id) > 1800000
                THEN 1 ELSE 0 END AS new_session
    FROM events) flagged
) sessioned
GROUP BY user_id, session_id
"""

EVENTS_DAILY_SQL = """
SELECT epoch_ms(ts) // 86400000 AS day_bucket, event_type,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2
"""

USER_RETENTION_COHORTS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day
  FROM events
),
base AS (
  SELECT user_id, day,
         min(day) OVER (PARTITION BY user_id) AS cohort_day
  FROM ud
)
SELECT cohort_day, day - cohort_day AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM base GROUP BY cohort_day, day - cohort_day
"""

PARTS_ABOVE_BRAND_AVG_SQL = """
SELECT p_partkey, p_brand, price_cents
FROM (
  SELECT p_partkey, p_brand,
         CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(sum(CAST(floor(p_retailprice * 100) AS BIGINT))
              OVER (PARTITION BY p_brand) AS BIGINT) AS brand_sum,
         count(*) OVER (PARTITION BY p_brand) AS brand_n
  FROM part) t
WHERE price_cents * brand_n > brand_sum
"""

SCALAR_FUNCTIONS_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)  AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
       upper(substr(o_orderpriority, 1, 1)) AS prio_initial,
       CAST(length(o_orderstatus) AS BIGINT) AS status_len,
       'o' || CAST(o_orderkey AS VARCHAR) AS tag,
       abs(CAST(floor(o_totalprice * 100) AS BIGINT) - 100000) AS abs_diff_cents
FROM orders
"""

EVENT_TYPE_PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events
GROUP BY user_id
"""


ASOF_LAST_PURCHASE_SQL = """
WITH l AS (
  SELECT event_id AS activation_id, user_id, epoch_ms(ts) AS ts_ms
  FROM events WHERE event_type = 'error'
), r AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms,
         CAST(max(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
           AS purchase_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT l.activation_id, l.user_id, l.ts_ms, r.purchase_cents
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms
"""


RANGE_COPURCHASE_SQL = """
WITH l AS (
  SELECT event_id AS activation_id, epoch_ms(ts) AS ms
  FROM events WHERE event_type = 'error'
), r AS (
  SELECT event_id AS purchase_id, epoch_ms(ts) AS ms
  FROM events WHERE event_type = 'purchase'
)
SELECT l.activation_id, count(*) AS n_nearby_purchases
FROM l JOIN r ON r.ms BETWEEN l.ms - 60000 AND l.ms + 60000
GROUP BY l.activation_id
"""


JSON_ARRAY_FUNCTIONS_SQL = """
SELECT o_orderkey,
       CAST(json_extract_string(js, '$.k') AS BIGINT) AS json_key,
       json_extract_string(js, '$.p') AS json_prio,
       CAST(len(arr) AS BIGINT) AS arr_len,
       CAST(list_sum(arr) AS BIGINT) AS arr_sum,
       list_contains(arr, 3) AS arr_has_3,
       words[1] AS prio_word,
       list_aggregate(list_sort(words), 'string_agg', '|') AS sorted_words
FROM (
  SELECT o_orderkey,
         '{"k":' || CAST(o_orderkey AS VARCHAR) || ',"p":"'
             || o_orderpriority || '"}' AS js,
         range(1, CAST(o_orderkey % 5 + 2 AS INTEGER)) AS arr,
         string_split(o_orderpriority, '-') AS words
  FROM orders
) t
"""


EVENTS_ROLLUP_MULTIRES_SQL = """
WITH b AS (
  SELECT epoch_ms(ts) // 3600000 AS hour_bucket,
         epoch_ms(ts) // 86400000 AS day_bucket,
         event_type, value
  FROM events
)
SELECT CASE WHEN hour_bucket IS NOT NULL THEN 'hour' ELSE 'day' END
         AS resolution,
       coalesce(hour_bucket, day_bucket) AS bucket,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM b
GROUP BY GROUPING SETS ((hour_bucket, event_type),
                        (day_bucket, event_type))
"""


EVENT_TYPE_UNPIVOT_SQL = """
WITH piv AS (
  SELECT user_id,
         count(*) FILTER (WHERE event_type = 'click')    AS click,
         count(*) FILTER (WHERE event_type = 'error')    AS error,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         count(*) FILTER (WHERE event_type = 'signup')   AS signup,
         count(*) FILTER (WHERE event_type = 'view')     AS view
  FROM events GROUP BY user_id
)
SELECT user_id, 'click' AS event_type, click AS n FROM piv
UNION ALL SELECT user_id, 'error', error FROM piv
UNION ALL SELECT user_id, 'purchase', purchase FROM piv
UNION ALL SELECT user_id, 'signup', signup FROM piv
UNION ALL SELECT user_id, 'view', view FROM piv
"""

ORDER_PERCENTILES_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5)  AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75
FROM orders GROUP BY o_orderpriority
"""

EVENT_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
),
v AS (
  SELECT user_id, min(ms) AS view_ms FROM ev
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ms) AS click_ms
  FROM ev e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ms > v.view_ms
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ms) AS purchase_ms
  FROM ev e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ms > c.click_ms
  GROUP BY e.user_id
)
SELECT v.user_id, v.view_ms, c.click_ms, p.purchase_ms,
       CAST(1 + (c.click_ms IS NOT NULL)::INT
              + (p.purchase_ms IS NOT NULL)::INT AS BIGINT) AS stage
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""

# GROUPING(a, b) in DuckDB and grouping_id() in Spark both encode the
# cube dimensions most-significant-first, so g_id matches bit-for-bit
LINEITEM_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g_id,
       count(*) AS n,
       CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty_cents,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

CUSTOMER_VALUE_BANDS_SQL = """
SELECT c_custkey, n_name, acctbal_cents,
       CAST(ntile(4) OVER w AS BIGINT) AS band,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       cume_dist() OVER w AS cume
FROM (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
) c
JOIN nation ON c_nationkey = n_nationkey
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY acctbal_cents, c_custkey)
"""

MERGE_UPSERT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
         0 AS v, FALSE AS del
  FROM orders
),
deletes AS (
  SELECT o_orderkey, o_custkey, CAST(NULL AS BIGINT) AS totalprice_cents,
         2 AS v, TRUE AS del
  FROM orders WHERE o_orderkey % 13 = 0
),
updates AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) + 10000
           AS totalprice_cents,
         1 AS v, FALSE AS del
  FROM orders WHERE o_orderkey % 10 = 0
),
inserts AS (
  SELECT o_orderkey + 3000000000 AS o_orderkey, o_custkey,
         CAST(0 AS BIGINT) AS totalprice_cents, 1 AS v, FALSE AS del
  FROM orders WHERE o_orderkey % 17 = 0
),
merged AS (
  SELECT * FROM base UNION ALL SELECT * FROM deletes
  UNION ALL SELECT * FROM updates UNION ALL SELECT * FROM inserts
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC)
            AS rn
  FROM merged
)
SELECT o_orderkey, o_custkey, totalprice_cents
FROM ranked WHERE rn = 1 AND NOT del
"""

TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, totalprice_cents,
       CAST(order_rank AS BIGINT) AS order_rank
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC,
                    o_orderkey) AS order_rank
  FROM orders
) t
WHERE order_rank <= 3
"""

FUZZY_NAME_PAIRS_SQL = """
WITH v AS (
  SELECT c_custkey AS k, c_name AS s,
         unnest(list_distinct(list_append(
           list_transform(range(1, len(c_name) + 1),
             i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)),
           c_name))) AS var
  FROM customer
),
c AS (
  SELECT DISTINCT a.k AS key_a, b.k AS key_b,
                  a.s AS name_a, b.s AS name_b
  FROM v a JOIN v b USING (var) WHERE a.k < b.k
)
SELECT key_a, key_b, name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS distance
FROM c WHERE levenshtein(name_a, name_b) <= 1
"""


from .relational import DEBOUNCE_MS  # noqa: E402

EVENTS_DEBOUNCE_SQL = f"""
SELECT user_id, event_type, event_id, CAST(gap_ms AS BIGINT) AS gap_ms
FROM (
  SELECT user_id, event_type, event_id,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER
             (PARTITION BY user_id, event_type ORDER BY event_id)
           AS gap_ms
  FROM events
) t
WHERE gap_ms IS NULL OR gap_ms < 0 OR gap_ms >= {DEBOUNCE_MS}
"""
