"""DuckDB oracle SQL for each SQL-expressible query in ``queries.py``.

Tables region nation customer supplier part orders lineitem events
documents embeddings are pre-registered views over the same parquet the
Ray queries read. Column names and rounding MUST mirror queries.py —
the driver's compare sorts columns by name and value-hashes.

Queries with no entry here (LSH dedup families, IVF search, k-means,
random sampling, packing, multimodal) are non-SQL-expressible; the
driver records a rows-only check for them. langid/quality ARE oracled:
both heuristics are deterministic RE2-count arithmetic and DuckDB's
regex engine is also RE2 (entries generated at the bottom of this file
from the same _LANG_PROFILES the engine compiles).
"""

ORACLE_SQL: dict[str, str] = {
    "grouped_count_events": """
        SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
    "grouped_agg_events": """
        SELECT event_type,
               round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS sum_value,
               round(avg(value), 6) AS avg_value,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    "max_value_per_user": """
        SELECT user_id, max(value) AS max_value FROM events GROUP BY user_id
    """,
    "user_activity_span": """
        SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
        FROM events GROUP BY user_id
    """,
    "events_per_user_day": """
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
    """,
    "hourly_event_window_stats": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events GROUP BY 1, 2
    """,
    "user_event_type_pivot": """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click') AS n_click,
               count(*) FILTER (WHERE event_type = 'error') AS n_error,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               count(*) FILTER (WHERE event_type = 'view') AS n_view
        FROM events GROUP BY user_id
    """,
    "event_type_value_share": """
        WITH c AS (
            SELECT event_type,
                   sum(CAST(round(value*100) AS BIGINT)) AS cents
            FROM events GROUP BY event_type)
        SELECT event_type,
               round(cents/100.0, 2) AS sum_value,
               round(cents * 1.0 / (SELECT sum(cents) FROM c), 6) AS share
        FROM c
    """,
    "value_percentiles_by_type": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.95), 6) AS p95
        FROM events GROUP BY event_type
    """,
    "parts_per_brand": """
        SELECT p_brand, count(*) AS n_parts,
               round(avg(p_retailprice), 6) AS avg_price
        FROM part GROUP BY p_brand
    """,
    "supplier_balance_by_nation": """
        SELECT n_name, count(*) AS n_supp, round(sum(CAST(round(s_acctbal*100) AS BIGINT))/100.0, 2) AS sum_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "sliding_3h_event_counts": """
        SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
               event_type, count(*) AS n
        FROM events CROSS JOIN range(3) t(k)
        GROUP BY 1, 2
    """,
    "pricing_summary_lineitem": """
        SELECT l_returnflag, l_linestatus,
               round(sum(CAST(round(l_quantity*100) AS BIGINT))/100.0, 2) AS sum_qty,
               round(sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0, 2) AS sum_base_price,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))/10000.0, 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_revenue": """
        SELECT round(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))/10000.0, 2) AS revenue
        FROM lineitem
        WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
    """,
    "filter_project_events": """
        SELECT event_id, user_id, value FROM events WHERE value > 100
    """,
    "sort_limit_events": """
        SELECT event_id, ts FROM events ORDER BY ts, event_id LIMIT 20
    """,
    "orders_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "orders_sorted_top100": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "topk_users_by_value": """
        SELECT user_id, round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS total_value FROM events
        GROUP BY user_id ORDER BY total_value DESC, user_id LIMIT 10
    """,
    "join_customer_nation_region": """
        SELECT r_name, count(*) AS n_cust, round(sum(CAST(round(c_acctbal*100) AS BIGINT))/100.0, 2) AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "orders_by_segment": """
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0, 2) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "union_purchases_errors": """
        SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT event_id, event_type FROM events WHERE event_type = 'error'
    """,
    "customers_without_big_orders": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
    """,
    "event_types_per_user": """
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        FROM events GROUP BY user_id
    """,
    "distinct_users_per_type": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "distinct_event_types": """
        SELECT DISTINCT event_type FROM events
    """,
    "dedup_events_keep_first": """
        SELECT user_id, event_type, min(event_id) AS event_id
        FROM events GROUP BY user_id, event_type
    """,
    "melt_lineitem_measures": """
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               l_quantity AS value FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
               l_extendedprice FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
               l_discount FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
               l_tax FROM lineitem
    """,
    "reservoir_sample_events": """
        SELECT event_id, event_type, value FROM events
        ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 100
    """,
    "deterministic_sample_events": """
        SELECT event_id, event_type, value FROM events
        WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    "exact_dedup_documents": """
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    """,
    "parse_events_props": """
        SELECT event_id,
               CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
        FROM events
    """,
    "json_extract_events": """
        SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "doc_ruleset_counts": """
        SELECT CASE
            WHEN regexp_matches(text, '^(?:agg|join|group|sort|filter)\\b')
                THEN 'D01_sql_shape'
            WHEN regexp_matches(text, '\\bslow\\b.*\\bfast\\b')
                THEN 'D02_slow_fast'
            WHEN regexp_matches(text, '\\bspark\\b') THEN 'D03_spark'
            WHEN regexp_matches(text, '^(?:window|batch|stream)\\b')
                THEN 'D04_windowed'
            ELSE 'D99_other' END AS rule_id,
            count(*) AS n
        FROM documents GROUP BY 1
    """,
    "parse_documents_firstword": """
        SELECT regexp_extract(text, '^([a-z]+)', 1) AS first_word, count(*) AS n
        FROM documents GROUP BY first_word
    """,
    "string_funcs_documents": """
        SELECT doc_id, upper(lang) AS lang_up,
               CAST(length(text) AS BIGINT) AS text_len,
               substr(text, 1, 10) AS head10
        FROM documents
    """,
    "date_funcs_orders": """
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon
        FROM orders
    """,
    "revenue_lineitem": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
    """,
    "doc_token_counts": """
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               END AS n_tokens_ws
        FROM documents
    """,
    "top_tokens_documents": """
        SELECT token, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(
                regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
            FROM documents)
        WHERE token <> ''
        GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
    "doc_fingerprints": """
        SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents
    """,
    "session_counts_events": """
        WITH g AS (
            SELECT user_id,
                   epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
            FROM events)
        SELECT user_id,
               CAST(1 + count(*) FILTER (WHERE gap > 1800) AS BIGINT) AS n_sessions
        FROM g GROUP BY user_id
    """,
    "top3_events_per_type": """
        SELECT event_type, event_id, value, rn FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rn
            FROM events) WHERE rn <= 3
    """,
    "running_sum_user_events": """
        SELECT event_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_value
        FROM events
    """,
    "lag_gap_events": """
        SELECT event_id,
               epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   AS gap_s
        FROM events
    """,
    "asof_purchase_prior_click": """
        WITH p AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ), c AS (
            SELECT user_id, ts, max(value) AS prior_click_value
            FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        )
        SELECT p.event_id, round(c.prior_click_value, 2) AS prior_click_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "dup_cluster_labels_documents": """
        SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster_id
        FROM documents
    """,
    "order_revenue_join": """
        SELECT o_orderkey, o_orderpriority,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))/10000.0 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderpriority
    """,
    "q3_shipping_priority": """
        SELECT o_orderkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))/10000.0
                   AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, o_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))/10000.0
                   AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "order_returns_3way": """
        SELECT o_orderkey, o_orderpriority, n_returned,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))/10000.0
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN (SELECT l_orderkey AS rk, count(*) AS n_returned
              FROM lineitem WHERE l_returnflag = 'R'
              GROUP BY l_orderkey) r ON o_orderkey = r.rk
        GROUP BY o_orderkey, o_orderpriority, n_returned
    """,
    "skew_join_user_totals": """
        SELECT e.user_id, e.event_id, t.n_user
        FROM events e JOIN (
            SELECT user_id, count(*) AS n_user FROM events GROUP BY user_id
        ) t ON e.user_id = t.user_id
    """,
    "customer_order_counts": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "orders_with_returns_by_priority": """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "moving_avg_user_events": """
        SELECT event_id,
               round(sum(CAST(round(value*100) AS BIGINT)) OVER w
                     / count(*) OVER w / 100.0, 6) AS ma3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "value_rank_events": """
        SELECT event_id,
               CAST(dense_rank() OVER (PARTITION BY event_type
                                       ORDER BY value DESC) AS BIGINT) AS rnk
        FROM events
    """,
    "stratified_sample_events": """
        SELECT event_type, event_id, rn FROM (
            SELECT event_type, event_id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
            FROM events) WHERE rn <= 5
    """,
    "lead_value_events": """
        SELECT event_id,
               round(lead(value) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id), 2) AS next_value
        FROM events
    """,
    "ntile_value_quartiles": """
        SELECT event_id,
               CAST(ntile(4) OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS BIGINT) AS tile
        FROM events
    """,
    "last_event_type_per_user": """
        SELECT user_id, arg_max(event_type, event_id) AS last_type
        FROM events GROUP BY user_id
    """,
    "orders_rollup_status_priority": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0, 2)
                   AS total_price
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "orders_cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0, 2)
                   AS total_price
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "value_stats_by_type": """
        SELECT event_type, count(*) AS n,
               round(var_pop(value), 6) AS var_value,
               round(stddev_pop(value), 6) AS std_value
        FROM events GROUP BY event_type
    """,
    "corr_value_user_by_type": """
        SELECT event_type, count(*) AS n,
               round(corr(value, user_id), 6) AS corr_vu,
               round(covar_pop(value, user_id), 6) AS covar_vu
        FROM events GROUP BY event_type
    """,
    "value_histogram_events": """
        -- floor (not truncating //) division: matches numpy floor_divide
        -- for negative values too
        SELECT CAST(floor(CAST(round(value*100) AS BIGINT) / 500.0) AS BIGINT)
                   AS bucket,
               count(*) AS n
        FROM events GROUP BY bucket
    """,
    "nation_region_pairs": """
        SELECT n_name, r_name FROM nation CROSS JOIN region
    """,
    "user_event_types_list": """
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
        FROM events GROUP BY user_id
    """,
    "percent_rank_events": """
        SELECT event_id, event_type, value,
               percent_rank() OVER (PARTITION BY event_type ORDER BY value)
                   AS pct_rank
        FROM events
    """,
    "bloom_semi_lineitem": """
        SELECT l_orderkey, count(*) AS n FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_orderkey
    """,
    "interval_join_order_lineitem": """
        SELECT o_orderkey, count(*) AS n_early
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate
          AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        GROUP BY o_orderkey
    """,
    "purchase_error_outer_join": """
        WITH p AS (
            SELECT user_id, count(*) AS n_purchase FROM events
            WHERE event_type = 'purchase' GROUP BY user_id
        ), e AS (
            SELECT user_id, count(*) AS n_error FROM events
            WHERE event_type = 'error' GROUP BY user_id
        )
        SELECT COALESCE(p.user_id, e.user_id) AS user_id,
               p.n_purchase, e.n_error
        FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
    """,
    "normalize_documents": """
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
        FROM documents
    """,
    "chunk_documents": """
        WITH mx AS (SELECT CAST(ceil(max(length(text))/200.0) AS BIGINT) AS m
                    FROM documents),
             idx AS (SELECT unnest(range(0, (SELECT m FROM mx))) AS i)
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               substr(text, CAST(i*200 + 1 AS BIGINT), 200) AS chunk_text
        FROM documents CROSS JOIN idx
        WHERE length(text) > i*200
    """,
    "mixture_sample_documents": """
        SELECT doc_id, lang FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS INT)
              < CASE WHEN lang = 'en' THEN 8 ELSE 1 END
    """,
    "csv_source_event_counts": """
        SELECT event_type, count(*) AS n,
               round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS sum_value
        FROM events GROUP BY event_type
    """,
    "json_source_doc_counts": """
        SELECT lang, count(*) AS n FROM documents GROUP BY lang
    """,
    # snappy_jsonl_doc_counts re-ingests the same projection through the
    # from-scratch raw-Snappy codec — identical per-lang counts expected
    "snappy_jsonl_doc_counts": """
        SELECT lang, count(*) AS n FROM documents GROUP BY lang
    """,
    "ann_topk_embeddings": """
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id IN (0, 1, 2)
        ), scored AS (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                                e.vec_id
                   ) AS rank
            FROM embeddings e CROSS JOIN q
        )
        SELECT query_id, vec_id, rank FROM scored WHERE rank <= 10
    """,
    # Tolerance oracles for the sketch family: the estimates themselves
    # aren't SQL-reproducible (different HLL / summary / binning), so each
    # query emits the engine's EXACT answer (value-checked here) plus
    # booleans asserting the sketch landed inside its error bound — the
    # oracle expects those booleans to be uniformly TRUE.
    "approx_distinct_users_by_type": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS est_within_5pct
        FROM events GROUP BY event_type
    """,
    "heavy_hitter_users": """
        SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
        ORDER BY n DESC, user_id LIMIT 10
    """,
    "approx_value_percentiles_by_type": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50_exact,
               round(quantile_cont(value, 0.95), 6) AS p95_exact,
               TRUE AS p50_ok, TRUE AS p95_ok
        FROM events GROUP BY event_type
    """,
    "tdigest_value_quantiles_by_type": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50_exact,
               round(quantile_cont(value, 0.99), 6) AS p99_exact,
               TRUE AS p50_ok, TRUE AS p99_ok
        FROM events GROUP BY event_type
    """,
    "expectations_report_events": """
        WITH v AS (
            SELECT 'event_id_not_null' AS expectation,
                   sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS n
            FROM events
            UNION ALL
            SELECT 'user_id_not_null',
                   sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
            FROM events
            UNION ALL
            SELECT 'value_in_range',
                   sum(CASE WHEN value < 0 OR value > 10000
                       THEN 1 ELSE 0 END)
            FROM events
            UNION ALL
            SELECT 'event_type_in_enum',
                   sum(CASE WHEN event_type IS NULL OR event_type NOT IN
                       ('click', 'purchase', 'error', 'view', 'signup')
                       THEN 1 ELSE 0 END)
            FROM events
            UNION ALL
            SELECT 'ts_in_range',
                   sum(CASE WHEN ts < TIMESTAMP '2024-01-01'
                            OR ts >= TIMESTAMP '2027-01-01'
                       THEN 1 ELSE 0 END)
            FROM events
            UNION ALL
            SELECT 'props_is_json_object',
                   sum(CASE WHEN props IS NULL
                            OR NOT regexp_matches(props, '^\\{.*\\}$')
                       THEN 1 ELSE 0 END)
            FROM events
            UNION ALL
            SELECT 'event_id_unique',
                   count(*) - count(DISTINCT event_id)
            FROM events)
        SELECT expectation, CAST(n AS BIGINT) AS violations,
               n = 0 AS passed
        FROM v
    """,
    "l_diversity_events": """
        WITH q AS (
            SELECT event_type,
                   CAST(floor(value * 0.02) AS BIGINT) AS vb, user_id
            FROM events),
        g AS (
            SELECT event_type, vb, CAST(count(*) AS BIGINT) AS group_size,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive
            FROM q GROUP BY 1, 2)
        SELECT event_type, vb, group_size, n_sensitive,
               n_sensitive >= 3 AS diverse
        FROM g WHERE group_size >= 20
    """,
    "seasonal_naive_backtest_events": """
        WITH c AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
        b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM c),
        g AS (
            SELECT t.event_type, h.hour
            FROM (SELECT DISTINCT event_type FROM c) t
            CROSS JOIN (SELECT unnest(generate_series(
                (SELECT lo FROM b), (SELECT hi FROM b),
                INTERVAL 1 HOUR)) AS hour) h),
        d AS (
            SELECT g.event_type, g.hour, coalesce(c.n, 0) AS n
            FROM g LEFT JOIN c USING (event_type, hour)),
        l AS (
            SELECT event_type, hour, n,
                   lag(n, 168) OVER (PARTITION BY event_type
                                     ORDER BY hour) AS pred
            FROM d)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval_hours,
               CAST(sum(abs(n - pred)) AS DOUBLE) / count(*) AS mae
        FROM l, b
        WHERE hour >= hi - INTERVAL 167 HOUR AND pred IS NOT NULL
        GROUP BY event_type
    """,
    "missing_partitions_events": """
        WITH d AS (
            SELECT date_trunc('day', ts) AS day, count(*) AS n
            FROM events GROUP BY 1),
        b AS (SELECT min(day) AS lo, max(day) AS hi,
                     CAST(count(*) AS BIGINT) AS present,
                     median(n) AS med
              FROM d),
        cal AS (SELECT unnest(generate_series(
                    (SELECT lo FROM b), (SELECT hi FROM b),
                    INTERVAL 1 DAY)) AS day)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM cal)
                   AS n_days_expected,
               (SELECT present FROM b) AS n_days_present,
               (SELECT CAST(count(*) AS BIGINT) FROM cal
                WHERE day NOT IN (SELECT day FROM d)) AS n_missing,
               (SELECT CAST(count(*) AS BIGINT) FROM d, b
                WHERE 4 * n < med) AS n_sparse,
               (SELECT lo FROM b) AS first_day,
               (SELECT hi FROM b) AS last_day
    """,
    "skyline_orders": """
        WITH u AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                   o_orderdate AS d
            FROM orders GROUP BY 1, 2),
        s AS (
            SELECT c, d,
                   min(d) OVER (ORDER BY c DESC, d ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS pm
            FROM u)
        SELECT o.o_orderkey, o.o_orderdate,
               round(CAST(s.c AS DOUBLE) / 100.0, 2) AS o_totalprice
        FROM orders o
        JOIN s ON CAST(round(o.o_totalprice * 100) AS BIGINT) = s.c
              AND o.o_orderdate = s.d
        WHERE s.pm IS NULL OR s.d < s.pm
    """,
    "bucket_join_orders_customer": """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     / 100.0, 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "auto_join_orders_customer": """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     / 100.0, 2) AS revenue,
               'broadcast' AS strategy
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "dpp_join_orders_lineitem": """
        SELECT o_orderdate, CAST(count(*) AS BIGINT) AS n_items,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) / 10000.0 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-03-01 00:00:00'
        GROUP BY o_orderdate
    """,
    "top_event_paths_users": """
        WITH s AS (
            SELECT user_id, event_type,
                   lag(event_type, 2) OVER w AS a,
                   lag(event_type, 1) OVER w AS b
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT a || '>' || b || '>' || event_type AS path,
               CAST(count(*) AS BIGINT) AS n
        FROM s WHERE a IS NOT NULL AND b IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
    "knn_join_embeddings": """
        WITH s AS (
            SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(
                           CAST(b.embedding AS DOUBLE[]),
                           CAST(a.embedding AS DOUBLE[])) DESC,
                       b.vec_id) AS rank
            FROM embeddings a JOIN embeddings b
              ON a.vec_id <> b.vec_id)
        SELECT src_id, nbr_id, rank FROM s WHERE rank <= 3
    """,
    "kmv_set_users_click_purchase": """
        WITH ud AS (
            SELECT event_type,
                   user_id || '|' || strftime(ts, '%Y-%m-%d') AS ud
            FROM events WHERE event_type IN ('click', 'purchase')),
        a AS (SELECT DISTINCT ud FROM ud WHERE event_type = 'click'),
        b AS (SELECT DISTINCT ud FROM ud WHERE event_type = 'purchase')
        SELECT (SELECT count(*) FROM a) AS n_click_exact,
               (SELECT count(*) FROM b) AS n_purchase_exact,
               (SELECT count(*) FROM (SELECT ud FROM a UNION
                                      SELECT ud FROM b)) AS union_exact,
               (SELECT count(*) FROM (SELECT ud FROM a INTERSECT
                                      SELECT ud FROM b)) AS inter_exact,
               TRUE AS n_click_ok, TRUE AS n_purchase_ok,
               TRUE AS union_ok, TRUE AS inter_ok, TRUE AS jaccard_ok
    """,
    "users_intersect_purchase_error": """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "users_except_purchase_error": """
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'error'
    """,
    "mode_event_type_per_user": """
        SELECT user_id, event_type AS mode_type, n FROM (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY count(*) DESC, event_type) AS rn
            FROM events GROUP BY user_id, event_type)
        WHERE rn = 1
    """,
    "cume_dist_events": """
        SELECT event_id, event_type, value,
               cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
        FROM events
    """,
    "first_value_events": """
        SELECT event_id, user_id, ts, value,
               first_value(value) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS first_value
        FROM events
    """,
    "orders_above_customer_avg": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       OVER (PARTITION BY o_custkey) AS s,
                   count(*) OVER (PARTITION BY o_custkey) AS n
            FROM orders)
        WHERE cents * n > s
    """,
    "tfidf_top_token_documents": """
        WITH tok AS (
            SELECT doc_id, t.tok
            FROM documents,
                 unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                     AS t(tok)
            WHERE trim(text) <> '' AND t.tok <> ''
        ), tf AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, tok
        ), df AS (
            SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM tok GROUP BY tok
        ), scored AS (
            SELECT tf.doc_id, tf.tok,
                   tf.tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
                              / df.df) AS score
            FROM tf JOIN df ON tf.tok = df.tok
        )
        SELECT doc_id, tok AS top_token, round(score, 6) AS score FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, tok) AS rn
            FROM scored)
        WHERE rn = 1
    """,
    "avg_discount_weighted_lineitem": """
        SELECT l_returnflag,
               round(sum(CAST(l_quantity AS BIGINT)
                         * CAST(round(l_discount * 100) AS BIGINT)) / 100.0
                     / sum(CAST(l_quantity AS BIGINT)), 6) AS avg_discount_w
        FROM lineitem GROUP BY l_returnflag
    """,
    "value_quantile_disc_by_type": """
        SELECT event_type,
               quantile_disc(value, 0.5) AS p50_disc,
               quantile_disc(value, 0.95) AS p95_disc
        FROM events GROUP BY event_type
    """,
    "rolling_1h_user_value": """
        WITH g AS (
            SELECT user_id, ts,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM events GROUP BY user_id, ts)
        SELECT user_id, ts,
               round(sum(c) OVER (PARTITION BY user_id ORDER BY ts
                                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                  AND CURRENT ROW) / 100.0, 2) AS sum_1h
        FROM g
    """,
}

ORACLE_SQL["kcore_suppliers"] = """
    WITH so AS (
        SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
    e AS (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM so a JOIN so b ON a.o = b.o AND a.s < b.s),
    nodes AS (SELECT u AS x FROM e UNION SELECT v FROM e)
    SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST(greatest(2, ((2 * (SELECT count(*) FROM e))
                // (SELECT count(*) FROM nodes)) // 2) AS BIGINT) AS k,
           TRUE AS core_valid_ok, TRUE AS excluded_ineligible_ok
"""

ORACLE_SQL["q11_important_brands"] = """
    WITH g AS (
        SELECT p.p_brand,
               sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                        AS BIGINT)) AS rev_u
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand)
    SELECT p_brand, round(rev_u / 10000.0, 2) AS revenue
    FROM g WHERE rev_u * 50 > (SELECT sum(rev_u) FROM g)
"""

ORACLE_SQL["q22_idle_rich_customers"] = """
    WITH stats AS (
        SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
               count(*) AS n
        FROM customer WHERE c_acctbal > 0),
    rich AS (
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer c, stats
        WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * stats.n > stats.s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT'))
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
           round(sum(bal_c) / 100.0, 2) AS total_acctbal
    FROM rich GROUP BY c_mktsegment
"""

ORACLE_SQL["q16_supplier_variety_by_part"] = """
    SELECT p.p_brand, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
"""

ORACLE_SQL["geomean_value_by_type"] = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pos,
           round(exp(avg(ln(value))), 6) AS geomean
    FROM events WHERE value > 0 GROUP BY event_type
"""

ORACLE_SQL["runner_up_supplier_by_nation"] = """
    WITH r AS (
        SELECT s_nationkey, s_suppkey, s_acctbal,
               row_number() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
        FROM supplier)
    SELECT s_nationkey, s_suppkey, s_acctbal FROM r WHERE rn = 2
"""

ORACLE_SQL["all_positive_flags_by_user"] = """
    SELECT user_id, bool_and(value > 0) AS all_positive,
           bool_or(event_type = 'purchase') AS any_purchase
    FROM events GROUP BY user_id
"""

ORACLE_SQL["last_touch_attribution_events"] = """
    WITH l AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events)
    SELECT prev_type, CAST(count(*) AS BIGINT) AS n_purchases
    FROM l WHERE event_type = 'purchase' AND prev_type IS NOT NULL
    GROUP BY prev_type
"""

ORACLE_SQL["max_lineitem_per_order"] = """
    WITH r AS (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_extendedprice DESC,
                                           l_linenumber ASC) AS rn
        FROM lineitem)
    SELECT l_orderkey AS o_orderkey, l_linenumber, l_extendedprice
    FROM r WHERE rn = 1
"""

ORACLE_SQL["label_centroids_embeddings"] = """
    SELECT e.label, t.i AS dim, round(avg(e.embedding[t.i]), 6) AS centroid
    FROM embeddings e, range(1, 65) t(i)
    GROUP BY e.label, t.i
"""

# ---- TPC-H classic adaptations (round 3)

ORACLE_SQL["q4_late_orders_by_priority"] = """
    WITH j AS (
        SELECT o.o_orderpriority, o.o_orderkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY 1, 2)
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM j GROUP BY 1
"""

ORACLE_SQL["q12_returnflag_priority"] = """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
"""

ORACLE_SQL["q14_promo_revenue_share"] = """
    WITH j AS (
        SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT) AS units,
               p.p_type = 'PROMO' AS promo
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT ship_month,
           round(100.0 * sum(CASE WHEN promo THEN units ELSE 0 END)
                 / sum(units), 6) AS promo_share_pct
    FROM j GROUP BY 1
"""

ORACLE_SQL["q18_large_volume_customers"] = """
    WITH big AS (
        SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)
    SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, big.total_qty
    FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
             JOIN customer c ON o.o_custkey = c.c_custkey
"""

ORACLE_SQL["q2_min_cost_supplier"] = """
    WITH dim AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_regionkey = 3),
    pairs AS (
        SELECT l.l_partkey AS p_partkey, l.l_suppkey,
               min(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cost_c
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size = 15
        JOIN dim d ON l.l_suppkey = d.s_suppkey
        GROUP BY 1, 2)
    SELECT pr.p_partkey, pr.l_suppkey AS s_suppkey, d.s_name, d.s_acctbal,
           d.n_name, round(pr.cost_c / 100.0, 2) AS supply_cost
    FROM pairs pr JOIN dim d ON pr.l_suppkey = d.s_suppkey
    WHERE pr.cost_c = (SELECT min(p2.cost_c) FROM pairs p2
                       WHERE p2.p_partkey = pr.p_partkey)
"""

ORACLE_SQL["q7_nation_volume_shipping"] = """
    WITH sdim AS (
        SELECT s_suppkey, n_name FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2')),
    cdim AS (
        SELECT c_custkey, n_name FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2'))
    SELECT sdim.n_name AS supp_nation, cdim.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                * 10000) AS BIGINT)) / 10000.0, 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN sdim ON l.l_suppkey = sdim.s_suppkey
    JOIN cdim ON o.o_custkey = cdim.c_custkey
    WHERE sdim.n_name <> cdim.n_name
    GROUP BY 1, 2, 3
"""

ORACLE_SQL["q8_market_share"] = """
    WITH j AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT) AS rev_u,
               n.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey IN (
            SELECT c.c_custkey FROM customer c
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE n2.n_regionkey = 2))
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                               THEN rev_u ELSE 0 END) AS DOUBLE)
                 / CAST(sum(rev_u) AS DOUBLE), 6) AS mkt_share
    FROM j GROUP BY 1
"""

ORACLE_SQL["q9_profit_by_nation_year"] = """
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                * 10000) AS BIGINT)) / 10000.0, 2) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
"""

ORACLE_SQL["q13_customer_order_distribution"] = """
    WITH co AS (
        SELECT c.c_custkey, count(o.o_custkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority = '1-URGENT'
        GROUP BY 1)
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY 1
"""

ORACLE_SQL["q15_top_supplier"] = """
    WITH r AS (
        SELECT l_suppkey AS s_suppkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) AS rev_u
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
    SELECT r.s_suppkey, s.s_name,
           round(r.rev_u / 10000.0, 2) AS total_revenue
    FROM r JOIN supplier s ON r.s_suppkey = s.s_suppkey
    WHERE r.rev_u = (SELECT max(rev_u) FROM r)
"""

ORACLE_SQL["q17_small_quantity_revenue"] = """
    WITH li AS (
        SELECT l.l_partkey,
               CAST(round(l.l_quantity) AS BIGINT) AS qty_i,
               CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#3'),
    st AS (SELECT l_partkey, sum(qty_i) AS sum_q, count(*) AS n_q
           FROM li GROUP BY 1)
    SELECT round(coalesce(sum(li.price_c), 0) / 100.0 / 7.0, 2) AS avg_yearly
    FROM li JOIN st ON li.l_partkey = st.l_partkey
    WHERE li.qty_i * 5 * st.n_q < st.sum_q
"""

ORACLE_SQL["q19_discounted_revenue"] = """
    SELECT round(coalesce(sum(CAST(round(l.l_extendedprice
                 * (1 - l.l_discount) * 10000) AS BIGINT)), 0)
                 / 10000.0, 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
"""

ORACLE_SQL["q20_promotion_suppliers"] = """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_nationkey = 0 AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'red%'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(CAST(round(l.l_quantity) AS BIGINT)) > 100)
"""

ORACLE_SQL["q21_waiting_suppliers"] = """
    WITH persup AS (
        SELECT l.l_orderkey, l.l_suppkey, max(l.l_shipdate) AS smax
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY 1, 2),
    om AS (SELECT l_orderkey, max(smax) AS omax, count(*) AS nsupp
           FROM persup GROUP BY 1),
    nm AS (SELECT p.l_orderkey, count(*) AS nmax
           FROM persup p JOIN om ON p.l_orderkey = om.l_orderkey
                                AND p.smax = om.omax
           GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM persup p
    JOIN om ON p.l_orderkey = om.l_orderkey
    JOIN nm ON p.l_orderkey = nm.l_orderkey
    JOIN supplier s ON p.l_suppkey = s.s_suppkey
    WHERE om.nsupp >= 2 AND nm.nmax = 1 AND p.smax = om.omax
    GROUP BY 1, 2
"""

# ---- ML-pipeline tolerance oracles (pattern proven on the sketches):
# exact columns SQL-verified, bound assertions expected TRUE.

ORACLE_SQL["kmeans_recovery_embeddings"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(4 AS BIGINT) AS n_labels_recovered,
           TRUE AS min_purity_ok
    FROM embeddings
"""

# DSIR planted-shift recovery: slice arithmetic SQL-exact, bound TRUE
ORACLE_SQL["dsir_shift_recovery_documents"] = """
    SELECT CAST(count(*) FILTER (WHERE doc_id % 25 <> 0) AS BIGINT)
               AS n_raw,
           CAST(count(*) FILTER (WHERE doc_id % 25 <> 0
                                 AND doc_id % 7 = 3) AS BIGINT)
               AS n_planted,
           TRUE AS recovery_ok
    FROM documents
"""

# fuzzy-decontamination planted recall: slice + length cutoff SQL-exact
ORACLE_SQL["fuzzy_decontam_recall_documents"] = """
    SELECT CAST(count(*) FILTER (WHERE doc_id % 25 = 0) AS BIGINT)
               AS n_bench,
           CAST(count(*) FILTER (WHERE doc_id % 25 = 0
                                 AND n_chars >= 120) AS BIGINT)
               AS n_planted,
           TRUE AS recall_ok
    FROM documents
"""

# trained quality classifier: exact counts SQL-verified (holdout =
# every 5th doc_id), bound assertions expected TRUE
ORACLE_SQL["classifier_quality_documents"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE doc_id % 5 = 0) AS BIGINT) AS n_test,
           TRUE AS test_acc_ok, TRUE AS loss_improved_ok
    FROM documents
"""

ORACLE_SQL["ivf_recall_embeddings"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           TRUE AS min_recall_ok, TRUE AS mean_recall_ok
    FROM embeddings WHERE vec_id IN (0, 1, 2)
"""

# trace(cov) == sum of per-dimension sample variances (embedding dim is
# 64 across all test scales; the engine asserts the same formula on its
# distributed moment partials)
_PCA_VAR_TERMS = " + ".join(f"var_samp(embedding[{i + 1}])" for i in range(64))
ORACLE_SQL["pca_variance_embeddings"] = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           round({_PCA_VAR_TERMS}, 4) AS total_var,
           TRUE AS evar_ordered_ok, TRUE AS share_ok, TRUE AS orthonormal_ok
    FROM embeddings
"""

# ---- real multimodal decode lanes: the oracle is the generator's
# analytic truth stored beside the payload bytes (decode must reproduce
# it from bytes alone). Fixed cache paths, same protocol as _CORPUS.

from .queries import _MEDIA_CACHE as _MEDIA  # single source of truth

ORACLE_SQL["wav_features_media"] = f"""
    SELECT media_id, true_duration_ms AS duration_ms,
           true_rms_db AS rms_db, true_zcr AS zcr
    FROM read_parquet('{_MEDIA}/wav.parquet')
"""

ORACLE_SQL["ppm_features_media"] = f"""
    SELECT media_id, true_width AS width, true_height AS height,
           true_mean_luma AS mean_luma, true_ahash AS ahash
    FROM read_parquet('{_MEDIA}/ppm.parquet')
"""

ORACLE_SQL["ppm_resize_dims_media"] = f"""
    SELECT media_id, true_thumb_w AS thumb_w, true_thumb_h AS thumb_h,
           TRUE AS payload_roundtrip_ok
    FROM read_parquet('{_MEDIA}/ppm.parquet')
"""

ORACLE_SQL["int8_ann_recall_embeddings"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           TRUE AS min_recall_ok, TRUE AS mean_recall_ok
    FROM embeddings WHERE vec_id IN (0, 1, 2)
"""

ORACLE_SQL["third_event_per_user"] = """
    WITH r AS (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events)
    SELECT user_id, event_type AS third_type, value AS third_value
    FROM r WHERE rn = 3
"""

ORACLE_SQL["bpe_bounds_documents"] = """
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                AS BIGINT) AS n_words,
           TRUE AS bpe_in_bounds
    FROM documents
"""

# Unigram-LM tokenizer: n_words SQL-exact; Viterbi roundtrip and the
# provable piece-count bounds assert TRUE per doc (same shape as the BPE
# bounds oracle).
ORACLE_SQL["unigram_tokens_documents"] = """
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                AS BIGINT) AS n_words,
           TRUE AS roundtrip_ok, TRUE AS pieces_in_bounds
    FROM documents
"""

_DUP_GROUPS = """(SELECT CAST(count(*) AS BIGINT) FROM
    (SELECT text FROM documents GROUP BY text HAVING count(*) > 1))"""

ORACLE_SQL["compression_consistency_documents"] = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           {_DUP_GROUPS} AS n_dup_groups,
           TRUE AS ratio_consistent_ok
    FROM documents
"""

ORACLE_SQL["fingerprint_consistency_documents"] = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           {_DUP_GROUPS} AS n_dup_groups,
           TRUE AS fp_consistent_ok
    FROM documents
"""

ORACLE_SQL["minhash_exactdup_invariant_documents"] = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           {_DUP_GROUPS} AS n_dup_groups,
           TRUE AS exactdups_clustered_ok
    FROM documents
"""
ORACLE_SQL["simhash_exactdup_invariant_documents"] = \
    ORACLE_SQL["minhash_exactdup_invariant_documents"]

ORACLE_SQL["pack_coverage_documents"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS coverage_ok, TRUE AS budget_ok
    FROM documents
"""

# --------------------------------------------------------------------------
# Transcript-corpus oracles. The flagship rule table as an ordered CASE
# (first-match-wins == first-satisfied WHEN; gate = role equality AND
# anchored regex — the same technique proven on doc_ruleset_counts). The
# corpus lives outside the registered views: the query function
# generates/caches it under /tmp/logray/corpus/<sf> BEFORE the oracle runs
# (the checker always executes the Ray query first), and the driver's gate
# runs at sf=0.01, so the path is fixed.

def _corpus_src() -> str:
    from ..gen import CORPUS_VERSION

    return f"read_parquet('/tmp/logray/corpus/v{CORPUS_VERSION}/sf0.01/*.parquet')"


_CORPUS = _corpus_src()


def _sql_regex(pat: str) -> str:
    """Python-re rule pattern -> DuckDB (RE2) regex literal: strip named
    groups (RE2 accepts them, but anonymous groups keep the SQL free of
    duplicate-name pitfalls across OR'd patterns) and escape quotes. The
    rule patterns are authored RE2-compatible by construction (the engine's
    hot path IS RE2 — ruleset._re2_ok gates compilation), so no other
    translation is needed; ``$`` is end-of-text in both engines here
    (engine rewrites to ``\\Z``; DuckDB RE2 is non-multiline)."""
    import re as _re

    return _re.sub(r"\(\?P<[^>]+>", "(", pat).replace("'", "''")


def _gen_rule_case() -> str:
    """The frozen rule table rendered as an ordered CASE — generated from
    rules_transcripts.TRANSCRIPT_RULES so the SQL oracle and the engine
    share ONE source of truth (first-satisfied WHEN == first-match-wins in
    declaration order; gate == role equality AND'ed before the regex)."""
    from ..rules_transcripts import TRANSCRIPT_RULES

    whens = []
    for r in TRANSCRIPT_RULES:
        if not r.patterns:
            continue  # default rule -> ELSE
        conds = []
        for col, vals in r.gate.items():
            if len(vals) == 1:
                conds.append(f"{col} = '{vals[0]}'")
            else:
                inlist = ", ".join(f"'{v}'" for v in vals)
                conds.append(f"{col} IN ({inlist})")
        pats = [f"regexp_matches(text, '{_sql_regex(p)}')" for p in r.patterns]
        conds.append(pats[0] if len(pats) == 1 else "(" + " OR ".join(pats) + ")")
        whens.append(f"WHEN {' AND '.join(conds)}\n        THEN '{r.rule_id}'")
    default = next(r.rule_id for r in TRANSCRIPT_RULES if not r.patterns)
    return "CASE\n    " + "\n    ".join(whens) + f"\n    ELSE '{default}' END"


def _gen_sink_case() -> str:
    """rule_id -> sink routing as a CASE, generated from the same table."""
    from ..rules_transcripts import TRANSCRIPT_RULES

    by_sink: dict[str, list[str]] = {}
    default_sink = "sink_unknown"
    for r in TRANSCRIPT_RULES:
        if not r.patterns:
            default_sink = r.sink
            continue
        by_sink.setdefault(r.sink, []).append(r.rule_id)
    whens = [
        f"WHEN rule_id IN ({', '.join(repr(i) for i in ids)}) THEN '{sink}'"
        for sink, ids in by_sink.items()
    ]
    return "CASE\n    " + "\n    ".join(whens) + f"\n    ELSE '{default_sink}' END"


_RULE_CASE = _gen_rule_case()
_SINK_CASE = _gen_sink_case()

ORACLE_SQL["transcript_parse_counts"] = f"""
    SELECT {_RULE_CASE} AS rule_id, count(*) AS n
    FROM {_CORPUS} GROUP BY 1
"""

# raw_log_parse_counts renders the same corpus to .log text and re-ingests
# it through the envelope regex — the per-rule histogram is the identical
# first-match-wins classification, so it shares the transcript oracle.
ORACLE_SQL["raw_log_parse_counts"] = ORACLE_SQL["transcript_parse_counts"]
# lz4_log_parse_counts re-ingests the same corpus through the
# from-scratch LZ4 frame codec — identical per-rule histogram expected
ORACLE_SQL["lz4_log_parse_counts"] = ORACLE_SQL["transcript_parse_counts"]
# bz2/xz lanes re-ingest the same corpus through stdlib-archival shards;
# the rule histogram must be byte-identical to the parquet path's.
ORACLE_SQL["bz2_log_parse_counts"] = ORACLE_SQL["transcript_parse_counts"]
ORACLE_SQL["xz_log_parse_counts"] = ORACLE_SQL["transcript_parse_counts"]
ORACLE_SQL["zstd_log_parse_counts"] = ORACLE_SQL["transcript_parse_counts"]

# Declarative alert rules replayed in SQL: generated rule CASE gates
# each branch, field regexps re-extract the metrics, time_bucket is the
# 10-minute tumbling window; integer-only thresholds.
ORACLE_SQL["alerts_transcripts"] = f"""
    WITH cls AS (
        SELECT ts, text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    gc AS (
        SELECT 'gc_pause_spike' AS alert,
               time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
               max(CAST(regexp_extract(text, 'pause_ms=(\\d+)', 1)
                        AS BIGINT)) AS metric
        FROM cls WHERE rule_id = 'R22_gc'
        GROUP BY 2 HAVING max(CAST(regexp_extract(text,
            'pause_ms=(\\d+)', 1) AS BIGINT)) > 1000),
    er AS (
        SELECT 'tool_error_rate' AS alert,
               time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
               sum(CASE WHEN rule_id = 'R03_tool_result_err'
                        THEN 1 ELSE 0 END) AS metric
        FROM cls
        WHERE rule_id IN ('R02_tool_result_ok', 'R03_tool_result_err')
        GROUP BY 2
        HAVING count(*) >= 5
           AND 5 * sum(CASE WHEN rule_id = 'R03_tool_result_err'
                            THEN 1 ELSE 0 END) >= count(*)),
    dr AS (
        SELECT 'dropped_messages' AS alert,
               time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
               sum(CAST(regexp_extract(text, 'count=(\\d+)', 1)
                        AS BIGINT)) AS metric
        FROM cls WHERE rule_id = 'R25_dropped'
        GROUP BY 2 HAVING sum(CAST(regexp_extract(text,
            'count=(\\d+)', 1) AS BIGINT)) > 10000)
    SELECT alert, window_start, CAST(metric AS BIGINT) AS metric
    FROM (SELECT * FROM gc UNION ALL SELECT * FROM er
          UNION ALL SELECT * FROM dr)
"""

# Incident islands over the fired-alert grid: the alerts CTE reused
# verbatim, island id = window_start − row_number·10min.
ORACLE_SQL["alert_incidents_transcripts"] = f"""
    WITH fired AS ({ORACLE_SQL["alerts_transcripts"]}),
    g AS (
        SELECT alert, window_start, metric,
               window_start - (row_number() OVER (
                   PARTITION BY alert ORDER BY window_start) - 1)
                   * INTERVAL 10 MINUTE AS island
        FROM fired)
    SELECT alert, min(window_start) AS start, max(window_start) AS "end",
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(max(metric) AS BIGINT) AS peak_metric
    FROM g GROUP BY alert, island
"""

# Severity-aware downsampling: the md5 retention rule replayed in SQL
# over the same generated rule/sink CASE.
ORACLE_SQL["severity_sampled_transcripts"] = f"""
    WITH cls AS (
        SELECT conv_id, turn_idx, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    s AS (
        SELECT {_SINK_CASE} AS sink,
               CAST(substr(md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)),
                           1, 1) AS VARCHAR) AS hex1
        FROM cls)
    SELECT sink, count(*) AS n_total,
           CAST(sum(CASE
               WHEN sink = 'sink_error' THEN 1
               WHEN sink = 'sink_telemetry'
                    AND hex1 IN ('0', '1', '2', '3') THEN 1
               WHEN sink NOT IN ('sink_error', 'sink_telemetry')
                    AND hex1 = '0' THEN 1
               ELSE 0 END) AS BIGINT) AS n_kept
    FROM s GROUP BY sink
"""

# Distributed prefix sum: the sweep-line concurrency replayed as one
# SQL window running sum with the identical (ts, delta DESC, conv_id)
# tie order.
ORACLE_SQL["peak_concurrency_transcripts"] = f"""
    WITH iv AS (
        SELECT conv_id, min(ts) AS s, max(ts) AS e FROM {_CORPUS}
        GROUP BY conv_id),
    d AS (
        SELECT conv_id, s AS ts, 1 AS delta FROM iv
        UNION ALL
        SELECT conv_id, e AS ts, -1 AS delta FROM iv),
    r AS (
        SELECT ts, CAST(sum(delta) OVER (
                   ORDER BY ts, delta DESC, conv_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        FROM d)
    SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
           max(running) AS peak
    FROM r GROUP BY 1
"""

# The full flagship DAG's aggregate output: per-(sink, rule) counts.
ORACLE_SQL["flagship_transcripts"] = f"""
    WITH cls AS (SELECT {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT {_SINK_CASE} AS sink, rule_id, count(*) AS n
    FROM cls GROUP BY 1, 2
"""

ORACLE_SQL["salted_conv_counts"] = f"""
    SELECT conv_id, count(*) AS n FROM {_CORPUS} GROUP BY conv_id
"""

# ---- v2 rule-family oracles: classify with the SAME generated CASE the
# engine's table produced, then regexp_extract the typed captures.

ORACLE_SQL["gc_pause_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT count(*) AS n,
           sum(CAST(regexp_extract(text, 'pause_ms=(\\d+)', 1) AS BIGINT)) AS sum_pause_ms,
           max(CAST(regexp_extract(text, 'heap_mb=(\\d+)', 1) AS BIGINT)) AS max_heap_mb,
           round(avg(CAST(regexp_extract(text, 'freed_mb=(\\d+)', 1) AS BIGINT)), 6) AS avg_freed_mb
    FROM cls WHERE rule_id = 'R22_gc'
"""

ORACLE_SQL["tool_retry_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, '^\\[tool:([a-z_]+)\\]', 1) AS tool_name,
           count(*) AS n_retries,
           round(avg(CAST(regexp_extract(text, 'attempt=(\\d+)', 1) AS BIGINT)), 6) AS avg_attempt,
           max(CAST(regexp_extract(text, 'backoff_ms=(\\d+)', 1) AS BIGINT)) AS max_backoff_ms
    FROM cls WHERE rule_id = 'R16_tool_retry' GROUP BY 1
"""

ORACLE_SQL["pool_status_extract_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    lines AS (
        SELECT unnest(string_split(text, chr(10))) AS l
        FROM cls WHERE rule_id = 'R30_pool_table'),
    pools AS (
        SELECT regexp_extract(l, '^pool=([a-z_]+)', 1) AS pool,
               CAST(regexp_extract(l, 'active=(\\d+)', 1) AS BIGINT) AS active,
               CAST(regexp_extract(l, 'pending=(\\d+)', 1) AS BIGINT) AS pending
        FROM lines WHERE l LIKE 'pool=%')
    SELECT pool, count(*) AS n, sum(active) AS sum_active,
           sum(pending) AS sum_pending
    FROM pools GROUP BY pool
"""

ORACLE_SQL["moderation_breakdown_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'verdict=([a-z]+)', 1) AS verdict,
           regexp_extract(text, 'policy=([a-z_]+)', 1) AS policy,
           count(*) AS n,
           round(avg(CAST(regexp_extract(text, 'score=(\\d+\\.\\d+)', 1) AS DOUBLE)), 6) AS avg_score
    FROM cls WHERE rule_id = 'R29_moderation' GROUP BY 1, 2
"""

ORACLE_SQL["attachment_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'kind=(image|audio|file)', 1) AS kind,
           count(*) AS n,
           sum(CAST(regexp_extract(text, 'bytes=(\\d+)', 1) AS BIGINT)) AS sum_bytes,
           max(CAST(regexp_extract(text, 'bytes=(\\d+)', 1) AS BIGINT)) AS max_bytes
    FROM cls WHERE rule_id = 'R31_attach' GROUP BY 1
"""

ORACLE_SQL["quota_by_tier_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'tier=([a-z]+)', 1) AS tier,
           count(*) AS n,
           round(avg(CAST(regexp_extract(text, 'used_pct=(\\d+)', 1) AS BIGINT)), 6) AS avg_used_pct,
           min(CAST(regexp_extract(text, 'tokens_left=(\\d+)', 1) AS BIGINT)) AS min_tokens_left
    FROM cls WHERE rule_id = 'R28_quota' GROUP BY 1
"""

# ---- v3 rule-family oracles (same generated-CASE classify + regexp
# extraction protocol as the v2 block above) ----

ORACLE_SQL["heartbeat_lag_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'node=([a-z0-9-]+)', 1) AS hb_node,
           count(*) AS n,
           max(CAST(regexp_extract(text, 'lag_ms=(\\d+)', 1) AS BIGINT)) AS max_lag_ms,
           round(avg(CAST(regexp_extract(text, 'inflight=(\\d+)', 1) AS BIGINT)), 6) AS avg_inflight
    FROM cls WHERE rule_id = 'R40_heartbeat' GROUP BY 1
"""

ORACLE_SQL["cache_hit_ratio_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    c AS (
        SELECT regexp_extract(text, 'name=([a-z_]+)', 1) AS cache_name,
               CAST(regexp_extract(text, 'hits=(\\d+)', 1) AS BIGINT) AS hits,
               CAST(regexp_extract(text, 'misses=(\\d+)', 1) AS BIGINT) AS misses,
               CAST(regexp_extract(text, 'evictions=(\\d+)', 1) AS BIGINT) AS evictions
        FROM cls WHERE rule_id = 'R46_cache_stats')
    SELECT cache_name, count(*) AS n, sum(hits) AS sum_hits,
           sum(misses) AS sum_misses, sum(evictions) AS sum_evictions,
           CAST(sum(hits) AS DOUBLE) / CAST(sum(hits) + sum(misses) AS DOUBLE) AS hit_ratio
    FROM c GROUP BY cache_name
"""

ORACLE_SQL["auth_breakdown_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'method=(oauth|apikey|sso)', 1) AS auth_method,
           count(*) AS n,
           CAST(sum(CASE WHEN regexp_extract(text, 'result=(ok|denied)', 1) = 'denied'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_denied
    FROM cls WHERE rule_id = 'R49_auth' GROUP BY 1
"""

ORACLE_SQL["span_table_extract_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    lines AS (
        SELECT unnest(string_split(text, chr(10))) AS l
        FROM cls WHERE rule_id = 'R52_span_table'),
    spans AS (
        SELECT regexp_extract(l, '^span=([a-z_]+)', 1) AS span,
               CAST(regexp_extract(l, 'dur_us=(\\d+)', 1) AS BIGINT) AS dur_us,
               regexp_extract(l, 'ok=(true|false)', 1) AS ok
        FROM lines WHERE l LIKE 'span=%')
    SELECT span, count(*) AS n, sum(dur_us) AS sum_dur_us,
           CAST(sum(CASE WHEN ok = 'false' THEN 1 ELSE 0 END) AS BIGINT) AS n_fail
    FROM spans GROUP BY span
"""

ORACLE_SQL["model_swap_matrix_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'from=([a-z0-9-]+)', 1) AS from_model,
           regexp_extract(text, 'to=([a-z0-9-]+)', 1) AS to_model,
           count(*) AS n
    FROM cls WHERE rule_id = 'R51_model_swap' GROUP BY 1, 2
"""

ORACLE_SQL["checkpoint_timeline_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    ck AS (
        SELECT strptime(regexp_extract(text,
                   'at=(\\d{{4}}-\\d{{2}}-\\d{{2}}T\\d{{2}}:\\d{{2}}:\\d{{2}})', 1),
                   '%Y-%m-%dT%H:%M:%S') AS ckpt_ts,
               CAST(regexp_extract(text, 'bytes=(\\d+)', 1) AS BIGINT) AS bytes,
               CAST(regexp_extract(text, 'turns=(\\d+)', 1) AS BIGINT) AS turns
        FROM cls WHERE rule_id = 'R41_checkpoint')
    SELECT date_trunc('day', ckpt_ts) AS ckpt_day, count(*) AS n,
           sum(bytes) AS sum_bytes, max(turns) AS max_turns
    FROM ck GROUP BY 1
"""

# ---- v4 rule-family oracles ----

ORACLE_SQL["tool_cost_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, '^\\[tool:([a-z_]+)\\]', 1) AS tool_name,
           count(*) AS n,
           sum(CAST(regexp_extract(text, 'cpu_ms=(\\d+)', 1) AS BIGINT)) AS sum_cpu_ms,
           max(CAST(regexp_extract(text, 'mem_mb=(\\d+)', 1) AS BIGINT)) AS max_mem_mb,
           round(avg(CAST(regexp_extract(text, 'cpu_ms=(\\d+)', 1) AS BIGINT)), 6) AS avg_cpu_ms
    FROM cls WHERE rule_id = 'R61_tool_stats' GROUP BY 1
"""

ORACLE_SQL["audit_breakdown_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'action=(read|write|delete)', 1) AS action,
           count(*) AS n,
           CAST(count(DISTINCT regexp_extract(text, 'actor=(u[0-9]+)', 1)) AS BIGINT) AS n_actors
    FROM cls WHERE rule_id = 'R69_audit' GROUP BY 1
"""

ORACLE_SQL["plugin_load_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'name=([a-z_]+)', 1) AS plugin,
           count(*) AS n,
           max(CAST(regexp_extract(text, 'loaded_ms=(\\d+)', 1) AS BIGINT)) AS max_loaded_ms,
           round(avg(CAST(regexp_extract(text, 'loaded_ms=(\\d+)', 1) AS BIGINT)), 6) AS avg_loaded_ms
    FROM cls WHERE rule_id = 'R63_plugin' GROUP BY 1
"""

ORACLE_SQL["latency_histo_extract_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    lines AS (
        SELECT unnest(string_split(text, chr(10))) AS l
        FROM cls WHERE rule_id = 'R71_latency_histo'),
    b AS (
        SELECT CAST(regexp_extract(l, 'le_(\\d+)ms', 1) AS BIGINT) AS edge_ms,
               CAST(regexp_extract(l, 'count=(\\d+)', 1) AS BIGINT) AS count
        FROM lines WHERE l LIKE 'bucket=%')
    SELECT edge_ms, count(*) AS n, sum(count) AS sum_count
    FROM b GROUP BY edge_ms
"""

ORACLE_SQL["leader_terms_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'node=([a-z0-9-]+)', 1) AS hb_node,
           count(*) AS n_elections,
           max(CAST(regexp_extract(text, 'term=(\\d+)', 1) AS BIGINT)) AS max_term
    FROM cls WHERE rule_id = 'R66_leader' GROUP BY 1
"""

ORACLE_SQL["consent_rates_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'scope=([a-z_]+)', 1) AS scope,
           count(*) AS n,
           CAST(sum(CASE WHEN regexp_extract(text, 'granted=(true|false)', 1) = 'true'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_granted
    FROM cls WHERE rule_id = 'R74_consent' GROUP BY 1
"""

ORACLE_SQL["disk_pressure_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'path=(/[a-z0-9/_.-]*)', 1) AS path,
           count(*) AS n,
           max(CAST(regexp_extract(text, 'used_gb=(\\d+)', 1) AS BIGINT)) AS max_used_gb,
           min(CAST(regexp_extract(text, 'free_gb=(\\d+)', 1) AS BIGINT)) AS min_free_gb
    FROM cls WHERE rule_id = 'R68_disk' GROUP BY 1
"""

ORACLE_SQL["deprecation_report_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'feature=([a-z0-9_]+)', 1) AS feature,
           count(*) AS n,
           min(CAST(regexp_extract(text, 'removal=(\\d+\\.\\d+)', 1) AS DOUBLE)) AS min_removal
    FROM cls WHERE rule_id = 'R70_warn_deprecated' GROUP BY 1
"""

ORACLE_SQL["restore_latency_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, turn_idx, ts, text, {_RULE_CASE} AS rule_id
                 FROM {_CORPUS}),
    ck AS (SELECT conv_id, turn_idx, ts,
                  regexp_extract(text, 'id=([0-9a-f]{{8}})', 1) AS cid
           FROM cls WHERE rule_id = 'R41_checkpoint'),
    rs AS (SELECT conv_id, turn_idx, ts,
                  regexp_extract(text, 'id=([0-9a-f]{{8}})', 1) AS cid
           FROM cls WHERE rule_id = 'R42_restore'),
    pair AS (
        SELECT r.conv_id, r.turn_idx, r.ts AS rs_ts, max(c.ts) AS ck_ts
        FROM rs r JOIN ck c
          ON c.conv_id = r.conv_id AND c.cid = r.cid
         AND c.turn_idx < r.turn_idx
        GROUP BY r.conv_id, r.turn_idx, r.ts)
    SELECT (SELECT count(*) FROM rs) AS n_restores,
           count(*) AS n_paired,
           coalesce(CAST(sum(date_diff('microsecond', ck_ts, rs_ts)) AS BIGINT), 0) AS sum_gap_us,
           coalesce(CAST(max(date_diff('microsecond', ck_ts, rs_ts)) AS BIGINT), 0) AS max_gap_us
    FROM pair
"""

ORACLE_SQL["warn_pressure_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT 'warn_context' AS warn_kind, count(*) AS n,
           max(CAST(regexp_extract(text, 'used_tokens=(\\d+)', 1) AS DOUBLE)
               / CAST(regexp_extract(text, 'limit_tokens=(\\d+)', 1) AS DOUBLE)) AS max_ratio
    FROM cls WHERE rule_id = 'R44_warn_context'
    UNION ALL
    SELECT 'warn_oversize', count(*),
           max(CAST(regexp_extract(text, 'bytes=(\\d+)', 1) AS DOUBLE)
               / CAST(regexp_extract(text, 'limit_bytes=(\\d+)', 1) AS DOUBLE))
    FROM cls WHERE rule_id = 'R45_warn_oversize'
"""

ORACLE_SQL["refusal_share_transcripts"] = f"""
    WITH cls AS (SELECT role, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT CAST(sum(CASE WHEN rule_id = 'R14_refusal' THEN 1 ELSE 0 END) AS BIGINT) AS n_refusal,
           CAST(count(*) AS BIGINT) AS n_assistant,
           round(sum(CASE WHEN rule_id = 'R14_refusal' THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS share
    FROM cls WHERE role = 'assistant'
"""

ORACLE_SQL["session_uptime_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, ts, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    g AS (
        SELECT conv_id,
               min(CASE WHEN rule_id = 'R20_banner' THEN ts END) AS banner_ts,
               max(CASE WHEN rule_id = 'R26_session_end' THEN ts END) AS end_ts
        FROM cls WHERE rule_id IN ('R20_banner', 'R26_session_end')
        GROUP BY conv_id)
    SELECT conv_id, banner_ts, end_ts,
           CAST(date_diff('microsecond', banner_ts, end_ts) AS BIGINT) AS uptime_us
    FROM g WHERE banner_ts IS NOT NULL AND end_ts IS NOT NULL
"""

ORACLE_SQL["progress_monotonic_share_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, turn_idx, text, {_RULE_CASE} AS rule_id
                 FROM {_CORPUS}),
    p AS (
        SELECT conv_id, turn_idx,
               regexp_extract(text, '^\\[tool:([a-z_]+)\\]', 1) AS tool_name,
               CAST(regexp_extract(text, 'pct=(\\d+)', 1) AS BIGINT) AS pct
        FROM cls WHERE rule_id = 'R17_tool_progress'),
    l AS (
        SELECT tool_name, pct,
               lag(pct) OVER (PARTITION BY conv_id, tool_name
                              ORDER BY turn_idx) AS prev
        FROM p)
    SELECT tool_name,
           CAST(count(prev) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN pct >= prev THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nondecreasing,
           round(sum(CASE WHEN pct >= prev THEN 1 ELSE 0 END) * 1.0
                 / count(prev), 6) AS share_nondecreasing
    FROM l GROUP BY tool_name HAVING count(prev) > 0
"""

ORACLE_SQL["error_streaks_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, turn_idx, tool, {_RULE_CASE} AS rule_id
                 FROM {_CORPUS}),
    f AS (
        SELECT conv_id, tool, turn_idx, rule_id,
               row_number() OVER (PARTITION BY conv_id, tool
                                  ORDER BY turn_idx) AS rn
        FROM cls
        WHERE rule_id IN ('R02_tool_result_ok', 'R03_tool_result_err',
                          'R04_traceback', 'R16_tool_retry',
                          'R17_tool_progress', 'R18_tool_stream')),
    e AS (
        SELECT conv_id, tool,
               rn - row_number() OVER (PARTITION BY conv_id, tool
                                       ORDER BY turn_idx) AS grp
        FROM f WHERE rule_id = 'R03_tool_result_err'),
    runs AS (
        SELECT conv_id, tool, grp, count(*) AS run
        FROM e GROUP BY 1, 2, 3)
    SELECT tool AS tool_name, CAST(max(run) AS BIGINT) AS max_error_streak
    FROM runs GROUP BY 1
"""

ORACLE_SQL["latency_by_model_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, turn_idx, text, {_RULE_CASE} AS rule_id
                 FROM {_CORPUS}),
    cfg AS (
        SELECT conv_id,
               first(regexp_extract(text, 'model=([a-z0-9-]+)', 1)
                     ORDER BY turn_idx) AS model
        FROM cls WHERE rule_id = 'R21_config' GROUP BY conv_id),
    met AS (
        SELECT c.conv_id,
               CAST(regexp_extract(c.text, 'latency_ms=(\\d+)', 1) AS BIGINT)
                   AS latency_ms,
               CAST(regexp_extract(c.text, 'tokens=(\\d+)', 1) AS BIGINT)
                   AS tokens
        FROM cls c WHERE c.rule_id = 'R05_metric')
    SELECT cfg.model,
           CAST(count(*) AS BIGINT) AS n_metrics,
           sum(met.latency_ms) AS sum_latency_ms,
           sum(met.tokens) AS sum_tokens,
           round(sum(met.latency_ms) * 1.0 / count(*), 6) AS avg_latency_ms
    FROM met JOIN cfg ON met.conv_id = cfg.conv_id
    GROUP BY cfg.model
"""

ORACLE_SQL["handoff_matrix_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'to=([a-z_]+)', 1) AS target_agent,
           regexp_extract(text, 'reason=([a-z_]+)', 1) AS reason,
           CAST(count(*) AS BIGINT) AS n
    FROM cls WHERE rule_id = 'R15_handoff' GROUP BY 1, 2
"""

ORACLE_SQL["compaction_savings_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT conv_id, CAST(count(*) AS BIGINT) AS n_compactions,
           sum(CAST(regexp_extract(text, 'dropped_turns=(\\d+)', 1) AS BIGINT))
               AS sum_dropped_turns,
           sum(CAST(regexp_extract(text, 'kept_tokens=(\\d+)', 1) AS BIGINT))
               AS sum_kept_tokens
    FROM cls WHERE rule_id = 'R23_compaction' GROUP BY conv_id
"""

# Ordered per-conversation follow-up analysis: for each R01 tool call,
# is the next R01/R03 event in the conversation an R03 error within 3
# turns? (The engine filters to those two rules before the window — the
# oracle's lead() therefore also runs over the filtered stream.)
ORACLE_SQL["tool_error_followup_transcripts"] = f"""
    WITH cls AS (
        SELECT conv_id, turn_idx, tool, {_RULE_CASE} AS rule_id
        FROM {_CORPUS}),
    f AS (
        SELECT conv_id, turn_idx, tool, rule_id,
               lead(rule_id) OVER w AS nxt_rule,
               lead(turn_idx) OVER w AS nxt_turn
        FROM cls WHERE rule_id IN ('R01_tool_call', 'R03_tool_result_err')
        WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
    SELECT tool, CAST(count(*) AS BIGINT) AS n_calls,
           CAST(coalesce(sum(CASE WHEN nxt_rule = 'R03_tool_result_err'
                                   AND nxt_turn - turn_idx <= 3
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_err_followed
    FROM f WHERE rule_id = 'R01_tool_call' GROUP BY tool
"""

# Continuation folding: an R99 row attaches to the most recent preceding
# non-R99 row of its conversation (rows with no such anchor survive as
# standalone unknown events). last_value(... IGNORE NULLS) reproduces the
# engine's segmented forward-fill anchor exactly.
ORACLE_SQL["fold_continuations_transcripts"] = f"""
    WITH cls AS (
        SELECT conv_id, turn_idx, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    w AS (
        SELECT rule_id,
               last_value(CASE WHEN rule_id <> 'R99_default'
                               THEN rule_id END IGNORE NULLS)
                   OVER (PARTITION BY conv_id ORDER BY turn_idx
                         ROWS UNBOUNDED PRECEDING) AS anchor_rule
        FROM cls),
    ev AS (SELECT rule_id FROM w
           WHERE NOT (rule_id = 'R99_default' AND anchor_rule IS NOT NULL)),
    fo AS (SELECT anchor_rule AS rule_id FROM w
           WHERE rule_id = 'R99_default' AND anchor_rule IS NOT NULL)
    SELECT e.rule_id,
           e.n_events,
           coalesce(f.n_folded, 0) AS n_folded
    FROM (SELECT rule_id, CAST(count(*) AS BIGINT) AS n_events
          FROM ev GROUP BY rule_id) e
    LEFT JOIN (SELECT rule_id, CAST(count(*) AS BIGINT) AS n_folded
               FROM fo GROUP BY rule_id) f
    ON e.rule_id = f.rule_id
"""


# ---- text-analysis oracles (quality, langid) --------------------------------
# Both heuristics are deterministic RE2-count arithmetic; DuckDB's regex
# engine is also RE2, so the oracle replays the exact formulas with
# regexp_extract_all counts. Patterns are generated from the SAME
# _LANG_PROFILES the engine compiles, so the two can never drift.

from ..ops.text import _LANG_PROFILES as _LP  # noqa: E402


def _alt(words) -> str:
    return r"\b(?:" + "|".join(sorted(words)) + r")\b"


_NSTOP = (r"len(regexp_extract_all(lower(coalesce(text, '')), '"
          + _alt(_LP["en"]) + r"'))")

ORACLE_SQL["quality_documents"] = f"""
    WITH q AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS chars,
               CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
                   AS npunct,
               CAST({_NSTOP} AS DOUBLE) AS nstop,
               greatest(CAST(len(regexp_extract_all(
                   lower(coalesce(text, '')), '[a-z]+')) AS DOUBLE), 1.0)
                   AS nalpha
        FROM documents)
    SELECT doc_id,
           round(npunct / greatest(chars, 1.0), 6) AS punct_ratio,
           round(nstop / nalpha, 6) AS stopword_ratio,
           round(least(chars / 200.0, 1.0)
                 * (1.0 - least(npunct / greatest(chars, 1.0) * 2.0, 1.0))
                 * (0.5 + (nstop / nalpha) * 0.5), 6) AS quality
    FROM q
"""

_LANG_COUNTS = ",\n               ".join(
    f"len(regexp_extract_all(lower(coalesce(text, '')), '{_alt(ws)}')) AS c_{lang}"
    for lang, ws in _LP.items())
_ARGMAX_CASE = "\n                ".join(
    f"WHEN c_{lang} = best THEN '{lang}'" for lang in _LP)

ORACLE_SQL["langid_documents"] = f"""
    WITH c AS (
        SELECT doc_id,
               greatest(CAST(length(coalesce(text, '')) AS DOUBLE), 1.0)
                   AS nchars,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                   '[一-鿿぀-ヿ가-힯]')) AS DOUBLE) AS cjk,
               {_LANG_COUNTS}
        FROM documents),
    s AS (
        SELECT doc_id, cjk / nchars AS cjk_ratio,
               greatest(c_en, c_de, c_es, c_fr, c_it) AS best,
               c_en, c_de, c_es, c_fr, c_it
        FROM c)
    SELECT doc_id,
           CASE WHEN cjk_ratio > 0.05 THEN 'zh'
                WHEN best < 2 THEN 'unknown'
                {_ARGMAX_CASE}
                END AS lang_pred,
           round(CASE WHEN cjk_ratio > 0.05 THEN least(1.0, cjk_ratio * 4.0)
                      ELSE least(1.0, best / 8.0) END, 6) AS lang_score
    FROM s
"""


ORACLE_SQL["entropy_user_event_types"] = """
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS n
        FROM events GROUP BY user_id, event_type),
    a AS (
        SELECT user_id, sum(n) AS tot, sum(n * ln(n)) AS s
        FROM c GROUP BY user_id)
    SELECT user_id, round(ln(tot) - s / tot, 6) AS entropy FROM a
"""

ORACLE_SQL["ratio_to_report_events"] = """
    SELECT event_id, user_id,
           round(value / sum(value) OVER (PARTITION BY user_id), 6) AS share
    FROM events
"""

ORACLE_SQL["top_bigrams_documents"] = """
    WITH d AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        FROM documents),
    b AS (
        SELECT list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                              x -> x[1] || ' ' || x[2]) AS bgs
        FROM d),
    big AS (SELECT u.bg AS bigram FROM b, unnest(b.bgs) u(bg))
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM big GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
"""
ORACLE_SQL["price_size_regression_by_type"] = """
    WITH m AS (
        SELECT p_type, count(*) AS n,
               sum(p_size) AS sx,
               sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS sy,
               sum(p_size * CAST(round(p_retailprice * 100) AS BIGINT))
                   AS sxy,
               sum(p_size * p_size) AS sxx
        FROM part GROUP BY p_type),
    f AS (
        SELECT p_type, n,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   AS slope_cents_per_size,
               sx, sy
        FROM m
        WHERE n >= 3 AND n * sxx - sx * sx <> 0)
    SELECT p_type, CAST(n AS BIGINT) AS n, slope_cents_per_size,
           (CAST(sy AS DOUBLE) - slope_cents_per_size * CAST(sx AS DOUBLE))
               / n AS intercept_cents
    FROM f
"""

ORACLE_SQL["realized_vs_retail_by_brand"] = """
    WITH r AS (
        SELECT p_brand AS brand, count(*) AS n_parts,
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                    AS BIGINT) AS rsum
        FROM part GROUP BY 1),
    s AS (
        SELECT p_brand AS brand,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS esum,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS qsum
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1)
    SELECT brand,
           CAST(rsum AS DOUBLE) / CAST(n_parts AS DOUBLE) / 100.0
               AS retail_unit,
           CAST(esum AS DOUBLE) / CAST(qsum AS DOUBLE) / 100.0
               AS realized_unit,
           (CAST(esum AS DOUBLE) / CAST(qsum AS DOUBLE) / 100.0)
               / (CAST(rsum AS DOUBLE) / CAST(n_parts AS DOUBLE) / 100.0)
               AS ratio
    FROM r JOIN s USING (brand)
"""

ORACLE_SQL["tokens_per_minute_transcripts"] = f"""
    WITH p AS (
        SELECT conv_id,
               sum(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = ''
                        THEN 0
                        ELSE len(regexp_split_to_array(
                            regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                            '\\s+')) END) AS tok,
               min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
        FROM {_CORPUS} GROUP BY conv_id)
    SELECT conv_id, CAST(tok AS BIGINT) AS tokens,
           t1 - t0 AS span_us,
           CAST(tok AS DOUBLE)
               / (CAST(t1 - t0 AS DOUBLE) / 60000000.0) AS tokens_per_min
    FROM p WHERE t1 > t0
"""

ORACLE_SQL["idle_gap_share_users"] = """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events),
    a AS (
        SELECT user_id, count(*) AS n_gaps,
               CAST(sum(CASE WHEN gap > 3600000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_idle
        FROM g WHERE gap IS NOT NULL GROUP BY user_id)
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps, n_idle,
           CAST(n_idle AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS idle_share
    FROM a
"""

ORACLE_SQL["tool_roundtrip_latency_transcripts"] = f"""
    WITH o AS (
        SELECT conv_id, role, epoch_us(ts) AS us,
               lead(role) OVER w AS next_role,
               lead(epoch_us(ts)) OVER w AS next_us
        FROM {_CORPUS}
        WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
    d AS (SELECT next_us - us AS lat FROM o
          WHERE role = 'tool' AND next_role = 'assistant')
    SELECT CAST(count(*) AS BIGINT) AS n_roundtrips,
           CAST(quantile_disc(lat, 0.5) AS BIGINT) AS p50_us,
           CAST(quantile_disc(lat, 0.95) AS BIGINT) AS p95_us
    FROM d
"""

ORACLE_SQL["peak_hour_by_type"] = """
    WITH c AS (
        SELECT event_type, hour(ts) AS h, count(*) AS n
        FROM events GROUP BY 1, 2),
    r AS (
        SELECT event_type, h, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, h) AS rn
        FROM c)
    SELECT event_type, CAST(h AS BIGINT) AS peak_hour,
           CAST(n AS BIGINT) AS n
    FROM r WHERE rn = 1
"""

ORACLE_SQL["hour_entropy_users"] = """
    WITH c AS (
        SELECT user_id, hour(ts) AS h, CAST(count(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2),
    a AS (
        SELECT user_id, sum(n) AS tot, sum(n * ln(n)) AS s
        FROM c GROUP BY 1)
    SELECT user_id, round(ln(tot) - s / tot, 6) AS hour_entropy FROM a
"""

ORACLE_SQL["priority_mix_by_segment"] = """
    WITH cells AS (
        SELECT c_mktsegment AS segment, o_orderpriority AS prio,
               count(*) AS n
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY 1, 2)
    SELECT segment, prio, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
               / CAST(sum(n) OVER (PARTITION BY segment) AS DOUBLE) AS share
    FROM cells
"""

ORACLE_SQL["supplier_diversity_histogram"] = """
    WITH p AS (
        SELECT l_partkey, count(DISTINCT l_suppkey) AS k
        FROM lineitem GROUP BY 1)
    SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_parts
    FROM p GROUP BY k
"""

ORACLE_SQL["repeated_turns_transcripts"] = f"""
    WITH r AS (
        SELECT conv_id,
               row_number() OVER (PARTITION BY conv_id, text
                                  ORDER BY turn_idx) AS rn
        FROM {_CORPUS})
    SELECT conv_id,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeated
    FROM r GROUP BY conv_id
    HAVING sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) > 0
"""

ORACLE_SQL["charset_audit_by_source"] = """
    WITH c AS (
        SELECT source,
               CAST(length(coalesce(text, '')) AS BIGINT) AS chars,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                        '[^\\x00-\\x7F]')) AS BIGINT) AS non
        FROM documents)
    SELECT source, CAST(sum(chars) AS BIGINT) AS total_chars,
           CAST(sum(non) AS BIGINT) AS non_ascii,
           CAST(sum(non) AS DOUBLE) / CAST(sum(chars) AS DOUBLE)
               AS non_ascii_ratio
    FROM c GROUP BY source
"""

ORACLE_SQL["final_role_distribution_transcripts"] = f"""
    WITH l AS (
        SELECT conv_id, role,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY turn_idx DESC) AS rn
        FROM {_CORPUS}),
    c AS (SELECT role, count(*) AS n_convs FROM l WHERE rn = 1
          GROUP BY role),
    t AS (SELECT CAST(sum(n_convs) AS DOUBLE) AS tot FROM c)
    SELECT role, CAST(n_convs AS BIGINT) AS n_convs,
           CAST(n_convs AS DOUBLE) / t.tot AS share
    FROM c, t
"""

ORACLE_SQL["dau_wau_stickiness"] = """
    WITH du AS (
        SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id
        FROM events),
    dau AS (SELECT d AS day, count(*) AS dau FROM du GROUP BY 1),
    wau AS (
        SELECT days.d AS day, count(DISTINCT du.user_id) AS wau
        FROM (SELECT DISTINCT d FROM du) days
        JOIN du ON du.d BETWEEN days.d - 6 AND days.d
        GROUP BY days.d)
    SELECT day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau USING (day)
"""

ORACLE_SQL["round_number_bias_by_type"] = """
    WITH f AS (
        SELECT event_type,
               CASE WHEN CAST(round(value * 100) AS BIGINT) % 100 = 0
                    THEN 1 ELSE 0 END AS r
        FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(r) AS BIGINT) AS n_round,
           CAST(sum(r) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS round_share
    FROM f GROUP BY event_type
"""

ORACLE_SQL["robust_scaled_value_events"] = """
    WITH c AS (SELECT event_id,
                      CAST(round(value * 100) AS BIGINT) AS c FROM events),
    b AS (SELECT CAST(quantile_disc(c, 0.25) AS DOUBLE) AS p25,
                 CAST(quantile_disc(c, 0.5) AS DOUBLE) AS p50,
                 CAST(quantile_disc(c, 0.75) AS DOUBLE) AS p75
          FROM c)
    SELECT event_id,
           (CAST(c AS DOUBLE) - b.p50) / (b.p75 - b.p25) AS scaled
    FROM c, b
"""

ORACLE_SQL["stopword_candidates_documents"] = """
    WITH st AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                   AS token
        FROM documents),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
    f AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM st GROUP BY 1)
    SELECT token, df, CAST(df AS DOUBLE) / n.nd AS df_share
    FROM f, n
    WHERE CAST(df AS DOUBLE) / n.nd > 0.3
"""

ORACLE_SQL["top_bigrams_per_source"] = """
    WITH d AS (
        SELECT source,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        FROM documents),
    b AS (
        SELECT source, list_transform(
            list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
            x -> x[1] || ' ' || x[2]) AS bgs
        FROM d),
    big AS (SELECT source, u.bg AS bigram FROM b, unnest(b.bgs) u(bg)),
    c AS (SELECT source, bigram, CAST(count(*) AS BIGINT) AS n
          FROM big GROUP BY 1, 2)
    SELECT source, bigram, n, rn FROM (
        SELECT source, bigram, n,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n DESC, bigram) AS rn
        FROM c) WHERE rn <= 3
"""

ORACLE_SQL["minmax_scaled_value_events"] = """
    WITH c AS (SELECT event_id,
                      CAST(round(value * 100) AS BIGINT) AS c FROM events),
    b AS (SELECT CAST(min(c) AS DOUBLE) AS mn,
                 CAST(max(c) AS DOUBLE) AS mx FROM c)
    SELECT event_id, (CAST(c AS DOUBLE) - b.mn) / (b.mx - b.mn) AS scaled
    FROM c, b
"""

ORACLE_SQL["context_overflow_share_transcripts"] = f"""
    WITH p AS (
        SELECT conv_id,
               sum(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = ''
                        THEN 0
                        ELSE len(regexp_split_to_array(
                            regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                            '\\s+')) END) AS tok
        FROM {_CORPUS} GROUP BY conv_id)
    SELECT CAST(count(*) AS BIGINT) AS n_convs,
           CAST(sum(CASE WHEN tok > 512 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overflow,
           CAST(sum(CASE WHEN tok > 512 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS overflow_share
    FROM p
"""

ORACLE_SQL["order_gap_quantiles"] = """
    WITH g AS (
        SELECT epoch_us(o_orderdate) // 86400000000
               - lag(epoch_us(o_orderdate) // 86400000000) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS gap
        FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_gap_days,
           CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p90_gap_days
    FROM g WHERE gap IS NOT NULL
"""

ORACLE_SQL["longest_daily_streak_users"] = """
    WITH dd AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS d
        FROM events),
    r AS (
        SELECT user_id, d,
               d - row_number() OVER (PARTITION BY user_id ORDER BY d)
                   AS island
        FROM dd),
    runs AS (SELECT user_id, island, count(*) AS len
             FROM r GROUP BY 1, 2)
    SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY user_id
"""

ORACLE_SQL["vocab_overlap_sources"] = """
    WITH st AS (
        SELECT DISTINCT source,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                   AS token
        FROM documents),
    sz AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS inter
        FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2)
    SELECT source_a, source_b, CAST(inter AS BIGINT) AS inter,
           CAST(inter AS DOUBLE)
               / (CAST(za.n AS DOUBLE) + CAST(zb.n AS DOUBLE)
                  - CAST(inter AS DOUBLE)) AS jaccard
    FROM inter
    JOIN sz za ON za.source = inter.source_a
    JOIN sz zb ON zb.source = inter.source_b
"""

ORACLE_SQL["session_value_quantiles"] = """
    WITH o AS (
        SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS c,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                        > 3600000000
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
    s AS (
        SELECT user_id, c,
               sum(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM o),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS total
          FROM s GROUP BY user_id, sid)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(quantile_disc(total, 0.5) AS DOUBLE) / 100.0
               AS p50_session_value,
           CAST(quantile_disc(total, 0.9) AS DOUBLE) / 100.0
               AS p90_session_value
    FROM t
"""

ORACLE_SQL["ngram_novelty_documents"] = """
    WITH d AS (SELECT doc_id,
                      regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
               FROM documents),
    g AS (SELECT doc_id, list_transform(
              list_zip(toks[1:len(toks)-3], toks[2:len(toks)-2],
                       toks[3:len(toks)-1], toks[4:len(toks)]),
              x -> x[1]||' '||x[2]||' '||x[3]||' '||x[4]) AS ngs
          FROM d),
    f AS (SELECT DISTINCT doc_id, u.ng FROM g, unnest(g.ngs) u(ng)),
    mn AS (SELECT ng, min(doc_id) AS md FROM f GROUP BY 1)
    SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN mn.md = f.doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           CAST(sum(CASE WHEN mn.md = f.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS novelty
    FROM f JOIN mn USING (ng) GROUP BY f.doc_id
"""

ORACLE_SQL["ship_latency_quantiles_by_priority"] = """
    WITH d AS (
        SELECT o_orderpriority AS prio,
               epoch_us(l_shipdate) // 86400000000
                   - epoch_us(o_orderdate) // 86400000000 AS days
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey)
    SELECT prio, CAST(count(*) AS BIGINT) AS n_items,
           CAST(quantile_disc(days, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(days, 0.95) AS BIGINT) AS p95_days
    FROM d GROUP BY prio
"""

ORACLE_SQL["lang_purity_by_source"] = f"""
    WITH c AS (
        SELECT doc_id, lang, source,
               greatest(CAST(length(coalesce(text, '')) AS DOUBLE), 1.0)
                   AS nchars,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                   '[一-鿿぀-ヿ가-힯]')) AS DOUBLE) AS cjk,
               {_LANG_COUNTS}
        FROM documents),
    s AS (
        SELECT lang, source, cjk / nchars AS cjk_ratio,
               greatest(c_en, c_de, c_es, c_fr, c_it) AS best,
               c_en, c_de, c_es, c_fr, c_it
        FROM c),
    p AS (
        SELECT source, lang,
               CASE WHEN cjk_ratio > 0.05 THEN 'zh'
                    WHEN best < 2 THEN 'unknown'
                    {_ARGMAX_CASE}
                    END AS lang_pred
        FROM s),
    a AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_agree
        FROM p GROUP BY source)
    SELECT source, n, n_agree,
           CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS purity
    FROM a
"""

ORACLE_SQL["sequence_regex_matches_users"] = """
    WITH s AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(len(regexp_extract_all(seq, 'cp')) AS BIGINT) AS n_cp,
           CAST(len(regexp_extract_all(seq, 'c+p')) AS BIGINT) AS n_runs_cp
    FROM s
"""

ORACLE_SQL["weighted_median_price_by_flag"] = """
    WITH d AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2),
    c AS (
        SELECT flag, price,
               sum(w) OVER (PARTITION BY flag ORDER BY price) AS cum,
               sum(w) OVER (PARTITION BY flag) AS tot
        FROM d)
    SELECT flag, CAST(max(tot) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cum >= tot THEN price END) AS DOUBLE)
               / 100.0 AS weighted_median_price
    FROM c GROUP BY flag
"""

ORACLE_SQL["embedding_drift_by_dim"] = """
    WITH e AS (
        SELECT vec_id % 2 AS half, r.i AS dim,
               CAST(floor(CAST(embedding[CAST(r.i + 1 AS BIGINT)] AS DOUBLE)
                          * 1000000)
                    AS BIGINT) AS q
        FROM embeddings, range(64) r(i)),
    m AS (SELECT half, dim, count(*) AS n, CAST(sum(q) AS BIGINT) AS s
          FROM e GROUP BY 1, 2),
    p AS (SELECT a.dim,
                 CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS c0,
                 CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS c1
          FROM m a JOIN m b ON a.dim = b.dim
          WHERE a.half = 0 AND b.half = 1)
    SELECT CAST(dim AS BIGINT) AS dim, c0 AS centroid_even_u,
           c1 AS centroid_odd_u, (c1 - c0) * (c1 - c0) AS sq_gap_u
    FROM p
"""

ORACLE_SQL["join_size_estimate_orders_lineitem"] = """
    WITH a AS (SELECT o_orderkey AS k, count(*) AS na FROM orders GROUP BY 1),
    b AS (SELECT l_orderkey AS k, count(*) AS nb FROM lineitem GROUP BY 1)
    SELECT CAST(sum(na * nb) AS BIGINT) AS exact_join_size,
           TRUE AS estimate_ge_exact,
           TRUE AS estimate_within_bound
    FROM a JOIN b USING (k)
"""

ORACLE_SQL["gini_value_by_type"] = """
    WITH r AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS c,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY CAST(round(value * 100) AS BIGINT),
                                           event_id) AS rk
        FROM events),
    m AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(rk * c) AS BIGINT) AS srx
        FROM r GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           2.0 * CAST(srx AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
           - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
    FROM m
"""

ORACLE_SQL["pareto_top20_revenue_share"] = """
    WITH pc_ AS (
        SELECT o_custkey AS c,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev
        FROM orders GROUP BY 1),
    t AS (
        SELECT rev, ntile(5) OVER (ORDER BY rev DESC, c) AS tile FROM pc_)
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN tile = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_top,
           CAST(CAST(sum(CASE WHEN tile = 1 THEN rev ELSE 0 END) AS BIGINT)
                AS DOUBLE)
               / CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE) AS top20_share
    FROM t
"""

ORACLE_SQL["dup_cluster_size_histogram"] = """
    WITH l AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster_id
        FROM documents),
    c AS (SELECT cluster_id, count(*) AS size FROM l GROUP BY 1)
    SELECT CAST(size AS BIGINT) AS size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM c GROUP BY size
"""

ORACLE_SQL["bfs_levels_parts"] = """
    WITH RECURSIVE
    so AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (SELECT DISTINCT a.p AS u, b.p AS v
          FROM so a JOIN so b ON a.o = b.o AND a.p < b.p),
    sym AS (SELECT u AS node, v AS nbr FROM e
            UNION ALL SELECT v, u FROM e),
    bfs(node, level) AS (
        SELECT CAST(0 AS BIGINT), 0
        UNION
        SELECT sym.nbr, bfs.level + 1
        FROM bfs JOIN sym ON sym.node = bfs.node
        WHERE bfs.level < 2)
    SELECT node, CAST(min(level) AS BIGINT) AS level
    FROM bfs GROUP BY node
"""

ORACLE_SQL["dup_substring_spans_documents"] = """
    WITH corpus AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 50 = 1 AND a.text IS NOT NULL
                       AND length(a.text) >= 108 AND length(d.text) >= 37
                  THEN substr(d.text, 1, 37) || substr(a.text, 12, 97)
                       || substr(d.text, 38)
                  ELSE d.text END AS text
      FROM documents d
      LEFT JOIN documents a
        ON a.doc_id = d.doc_id - 1 AND (d.doc_id % 50) = 1),
    g AS (
      SELECT doc_id, pos, substr(text, pos, 40) AS gram
      FROM corpus, LATERAL (SELECT unnest(generate_series(
               1, length(text) - 39)) AS pos) p),
    pr AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             a.pos - b.pos AS delta, a.pos AS pos
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
    isl AS (
      SELECT a_id, b_id, delta, pos,
             pos - row_number() OVER (
                 PARTITION BY a_id, b_id, delta ORDER BY pos) AS grp
      FROM pr)
    SELECT a_id, b_id,
           CAST(min(pos) - 1 AS BIGINT) AS a_start,
           CAST(min(pos) - 1 - delta AS BIGINT) AS b_start,
           CAST(count(*) + 39 AS BIGINT) AS length
    FROM isl GROUP BY a_id, b_id, delta, grp
"""

ORACLE_SQL["dup_substring_coverage_documents"] = """
    WITH corpus AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 50 = 1 AND a.text IS NOT NULL
                       AND length(a.text) >= 108 AND length(d.text) >= 37
                  THEN substr(d.text, 1, 37) || substr(a.text, 12, 97)
                       || substr(d.text, 38)
                  ELSE d.text END AS text
      FROM documents d
      LEFT JOIN documents a
        ON a.doc_id = d.doc_id - 1 AND (d.doc_id % 50) = 1),
    g AS (
      SELECT doc_id, pos, substr(text, pos, 40) AS gram
      FROM corpus, LATERAL (SELECT unnest(generate_series(
               1, length(text) - 39)) AS pos) p),
    pr AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             a.pos - b.pos AS delta, a.pos AS pos
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
    il AS (
      SELECT a_id, b_id, delta, pos,
             pos - row_number() OVER (
                 PARTITION BY a_id, b_id, delta ORDER BY pos) AS grp
      FROM pr),
    spans AS (
      -- DISTINCT: identical intervals from different a-docs collapse
      -- (free under union semantics) so ORDER BY (st, en) is a TOTAL
      -- order — with tied rows, brk and its running sum are otherwise
      -- evaluated in two independent arbitrary tie orders and can
      -- split one island in two
      SELECT DISTINCT b_id, min(pos) - 1 - delta AS st,
             min(pos) - 1 - delta + count(*) + 39 AS en
      FROM il GROUP BY a_id, b_id, delta, grp),
    o AS (
      SELECT b_id, st, en,
             CASE WHEN st > coalesce(max(en) OVER (
                      PARTITION BY b_id ORDER BY st, en
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) THEN 1 ELSE 0 END AS brk
      FROM spans),
    i AS (
      SELECT b_id, st, en,
             sum(brk) OVER (PARTITION BY b_id ORDER BY st, en
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM o)
    SELECT b_id AS doc_id, CAST(sum(mx - mn) AS BIGINT) AS dup_bytes
    FROM (SELECT b_id, isl, min(st) AS mn, max(en) AS mx
          FROM i GROUP BY 1, 2) t
    GROUP BY 1
"""

ORACLE_SQL["sssp_parts"] = """
    WITH RECURSIVE
    op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (SELECT a.p AS u, b.p AS v,
                 10 - least(9, count(*)) AS w
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2),
    sym AS (SELECT u AS node, v AS nbr, w FROM e
            UNION ALL SELECT v, u, w FROM e),
    walk(node, d, hops) AS (
        SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
        UNION
        SELECT sym.nbr, walk.d + sym.w, walk.hops + 1
        FROM walk JOIN sym ON sym.node = walk.node
        WHERE walk.hops < 3)
    SELECT node, CAST(min(d) AS BIGINT) AS dist
    FROM walk GROUP BY node
"""

ORACLE_SQL["basket_affinity_parts"] = """
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n_orders FROM op),
    pc_ AS (SELECT p, count(*) AS np FROM op GROUP BY 1),
    pr AS (
        SELECT a.p AS part_a, b.p AS part_b, count(*) AS n_ab
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
        HAVING count(*) >= 2)
    SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_ab AS DOUBLE) * n.n_orders
               / (CAST(ca.np AS DOUBLE) * CAST(cb.np AS DOUBLE)) AS lift
    FROM pr, n
    JOIN pc_ ca ON ca.p = pr.part_a
    JOIN pc_ cb ON cb.p = pr.part_b
"""

ORACLE_SQL["weekend_effect_ttest"] = """
    WITH b AS (
        SELECT CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS w,
               CAST(round(value * 100) AS BIGINT) // 100 AS d
        FROM events),
    m AS (
        SELECT CAST(sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN w = 0 THEN d ELSE 0 END) AS BIGINT) AS s0,
               CAST(sum(CASE WHEN w = 1 THEN d ELSE 0 END) AS BIGINT) AS s1,
               CAST(sum(CASE WHEN w = 0 THEN d * d ELSE 0 END) AS BIGINT)
                   AS ss0,
               CAST(sum(CASE WHEN w = 1 THEN d * d ELSE 0 END) AS BIGINT)
                   AS ss1
        FROM b)
    SELECT n0 AS n_weekday, n1 AS n_weekend,
           CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean_weekday,
           CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_weekend,
           (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
           / sqrt(((CAST(ss1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                      / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))
                      / CAST(n1 AS DOUBLE)
                  + ((CAST(ss0 AS DOUBLE)
                      - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                        / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))
                      / CAST(n0 AS DOUBLE)) AS t_stat
    FROM m
"""

ORACLE_SQL["time_to_purchase_quantiles"] = """
    WITH fc AS (SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'click' GROUP BY 1),
    fp AS (SELECT e.user_id, min(e.ts) AS t1
           FROM events e JOIN fc ON fc.user_id = e.user_id
                                AND e.ts >= fc.t0
           WHERE e.event_type = 'purchase' GROUP BY 1),
    d AS (SELECT (epoch_us(t1) - epoch_us(t0)) // 86400000000 AS days
          FROM fp JOIN fc USING (user_id))
    SELECT CAST(count(*) AS BIGINT) AS n_converting,
           CAST(quantile_disc(days, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(days, 0.9) AS BIGINT) AS p90_days
    FROM d
"""

ORACLE_SQL["rfm_segments_users"] = """
    WITH p AS (
        SELECT user_id,
               max(epoch_us(ts) // 86400000000) AS last_day,
               count(*) AS freq,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1),
    s AS (
        SELECT user_id,
               (SELECT max(last_day) FROM p) - last_day AS recency,
               freq, cents
        FROM p),
    t AS (
        SELECT ntile(5) OVER (ORDER BY recency, user_id) AS r,
               ntile(5) OVER (ORDER BY freq DESC, user_id) AS f,
               ntile(5) OVER (ORDER BY cents DESC, user_id) AS m
        FROM s)
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS n_users
    FROM t GROUP BY 1, 2, 3
"""

ORACLE_SQL["autocorr_lag1_by_type"] = """
    WITH o AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) // 100 AS d,
               lead(CAST(round(value * 100) AS BIGINT) // 100) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS y
        FROM events),
    m AS (
        SELECT event_type, count(*) AS n,
               sum(d) AS sx, sum(y) AS sy, sum(d * y) AS sxy,
               sum(d * d) AS sxx, sum(y * y) AS syy
        FROM o WHERE y IS NOT NULL GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS autocorr
    FROM m
"""

ORACLE_SQL["hhi_supplier_revenue_by_nation"] = """
    WITH rev AS (
        SELECT l_suppkey AS s,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) // 100)
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY 1),
    j AS (
        SELECT n_name AS nation, rev
        FROM rev JOIN supplier ON s_suppkey = s
                 JOIN nation ON n_nationkey = s_nationkey)
    SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(CAST(sum(rev * rev) AS BIGINT) AS DOUBLE)
               / (CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE)
                  * CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE)) AS hhi
    FROM j GROUP BY nation
"""

ORACLE_SQL["events_dow_hour_counts"] = """
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
"""

ORACLE_SQL["langid_confusion_documents"] = f"""
    WITH c AS (
        SELECT doc_id, lang,
               greatest(CAST(length(coalesce(text, '')) AS DOUBLE), 1.0)
                   AS nchars,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                   '[一-鿿぀-ヿ가-힯]')) AS DOUBLE) AS cjk,
               {_LANG_COUNTS}
        FROM documents),
    s AS (
        SELECT doc_id, lang, cjk / nchars AS cjk_ratio,
               greatest(c_en, c_de, c_es, c_fr, c_it) AS best,
               c_en, c_de, c_es, c_fr, c_it
        FROM c),
    p AS (
        SELECT lang,
               CASE WHEN cjk_ratio > 0.05 THEN 'zh'
                    WHEN best < 2 THEN 'unknown'
                    {_ARGMAX_CASE}
                    END AS lang_pred
        FROM s)
    SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY lang, lang_pred
"""

ORACLE_SQL["conversation_depth_histogram"] = f"""
    WITH c AS (SELECT conv_id, count(*) AS n_turns FROM {_CORPUS}
               GROUP BY conv_id)
    SELECT CAST(n_turns AS BIGINT) AS n_turns,
           CAST(count(*) AS BIGINT) AS n_convs
    FROM c GROUP BY n_turns
"""

ORACLE_SQL["ltv_deciles_users"] = """
    WITH ltv AS (
        SELECT user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ltv
        FROM events GROUP BY user_id),
    t AS (
        SELECT user_id, ltv,
               ntile(10) OVER (ORDER BY ltv DESC, user_id) AS decile
        FROM ltv)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(CAST(sum(ltv) AS BIGINT) AS DOUBLE) / 100.0 AS total_value
    FROM t GROUP BY decile
"""

ORACLE_SQL["priority_escalations_customers"] = """
    WITH o AS (
        SELECT o_custkey,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS r,
               lag(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders)
    SELECT o_custkey AS custkey,
           CAST(sum(CASE WHEN r < prev THEN 1 ELSE 0 END) AS BIGINT)
               AS n_escalations
    FROM o GROUP BY o_custkey
    HAVING sum(CASE WHEN r < prev THEN 1 ELSE 0 END) > 0
"""

ORACLE_SQL["yoy_monthly_orders"] = """
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1)
    SELECT a.month,
           CAST(a.cents AS DOUBLE) / 100.0 AS revenue,
           CAST(b.cents AS DOUBLE) / 100.0 AS prev_year_revenue,
           CAST(a.cents AS DOUBLE) / CAST(b.cents AS DOUBLE) AS yoy_ratio
    FROM m a JOIN m b ON b.month = a.month - INTERVAL 1 YEAR
"""

ORACLE_SQL["duplicate_share_by_source"] = """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
           1.0 - (CAST(count(DISTINCT text) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE)) AS dup_share
    FROM documents GROUP BY source
"""

ORACLE_SQL["tool_usage_stats_transcripts"] = f"""
    WITH c AS (
        SELECT conv_id, tool FROM {_CORPUS}
        WHERE role = 'tool' AND tool IS NOT NULL),
    a AS (
        SELECT tool, count(*) AS n_calls,
               count(DISTINCT conv_id) AS n_convs
        FROM c GROUP BY 1),
    t AS (SELECT CAST(sum(n_calls) AS DOUBLE) AS tot FROM a)
    SELECT tool, CAST(n_calls AS BIGINT) AS n_calls,
           CAST(n_convs AS BIGINT) AS n_convs,
           CAST(n_calls AS DOUBLE) / t.tot AS share
    FROM a, t
"""

ORACLE_SQL["bm25_documents"] = """
    WITH d AS (
        SELECT doc_id,
               regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS s
        FROM documents),
    base AS (
        SELECT doc_id,
               CASE WHEN s = '' THEN 0
                    ELSE CAST(len(regexp_split_to_array(s, '\\s+'))
                              AS BIGINT) END AS L
        FROM d),
    wp AS (
        SELECT doc_id, unnest(regexp_split_to_array(s, '\\s+')) AS word
        FROM d WHERE s <> ''),
    tf AS (
        SELECT doc_id,
               sum(CASE WHEN word = 'merge' THEN 1 ELSE 0 END) AS tf0,
               sum(CASE WHEN word = 'window' THEN 1 ELSE 0 END) AS tf1,
               sum(CASE WHEN word = 'key' THEN 1 ELSE 0 END) AS tf2
        FROM wp GROUP BY doc_id),
    j AS (
        SELECT base.doc_id, base.L,
               COALESCE(tf0, 0) AS tf0, COALESCE(tf1, 0) AS tf1,
               COALESCE(tf2, 0) AS tf2
        FROM base LEFT JOIN tf USING (doc_id)),
    st AS (
        SELECT CAST(count(*) AS DOUBLE) AS N,
               CAST(sum(L) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
               CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
               CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
               CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        FROM j)
    SELECT doc_id,
           ln((st.N - st.df0 + 0.5) / (st.df0 + 0.5))
               * (CAST(tf0 AS DOUBLE) * 2.2)
               / (CAST(tf0 AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * (CAST(L AS DOUBLE) / st.avgdl)))
         + ln((st.N - st.df1 + 0.5) / (st.df1 + 0.5))
               * (CAST(tf1 AS DOUBLE) * 2.2)
               / (CAST(tf1 AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * (CAST(L AS DOUBLE) / st.avgdl)))
         + ln((st.N - st.df2 + 0.5) / (st.df2 + 0.5))
               * (CAST(tf2 AS DOUBLE) * 2.2)
               / (CAST(tf2 AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * (CAST(L AS DOUBLE) / st.avgdl)))
               AS score
    FROM j, st
    WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0
"""

# Hybrid RRF reuses the BM25 oracle verbatim as its lexical-leg CTE —
# one source of truth for the scoring formula; ranks are integers after
# the (score DESC, doc_id) order, so the 1.0/(60+r) fusion is bit-exact.
ORACLE_SQL["hybrid_rrf_documents"] = f"""
    WITH bm AS ({ORACLE_SQL["bm25_documents"]}),
    lex AS (
        SELECT doc_id, r AS lex_rank FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS r
            FROM bm) WHERE r <= 50),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id = 0),
    sem AS (
        SELECT doc_id, r AS sem_rank FROM (
            SELECT e.vec_id AS doc_id,
                   row_number() OVER (
                       ORDER BY list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                       e.vec_id) AS r
            FROM embeddings e, q) WHERE r <= 50)
    SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
           COALESCE(lex_rank, 0) AS lex_rank,
           COALESCE(sem_rank, 0) AS sem_rank,
           COALESCE(1.0 / (60 + lex_rank), 0.0)
               + COALESCE(1.0 / (60 + sem_rank), 0.0) AS rrf_score
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 20
"""

ORACLE_SQL["kwic_documents"] = """
    WITH w AS (
        SELECT doc_id,
               regexp_split_to_array(
                   regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                   '\\s+') AS words
        FROM documents
        WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''),
    wp AS (
        SELECT doc_id, unnest(words) AS word,
               unnest(range(len(words))) AS pos
        FROM w),
    h AS (SELECT doc_id, pos AS hit FROM wp WHERE word = 'merge')
    SELECT h.doc_id, CAST(h.hit AS BIGINT) AS pos,
           string_agg(wp.word, ' ' ORDER BY wp.pos) AS context
    FROM h JOIN wp ON wp.doc_id = h.doc_id
                  AND wp.pos BETWEEN h.hit - 3 AND h.hit + 3
    GROUP BY h.doc_id, h.hit
"""

ORACLE_SQL["order_total_reconciliation"] = """
    WITH po AS (
        SELECT l_orderkey AS o_orderkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS li_total
        FROM lineitem GROUP BY 1),
    j AS (
        SELECT o_orderstatus AS status,
               abs(CAST(round(o_totalprice * 100) AS BIGINT) - li_total)
                   AS gap
        FROM orders JOIN po USING (o_orderkey))
    SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mismatched,
           CAST(sum(gap) AS BIGINT) AS total_gap_cents
    FROM j GROUP BY status
"""

ORACLE_SQL["turn_length_stats_by_role"] = f"""
    SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
           CAST(quantile_disc(len(text), 0.5) AS BIGINT) AS p50_chars,
           CAST(quantile_disc(len(text), 0.95) AS BIGINT) AS p95_chars,
           CAST(max(len(text)) AS BIGINT) AS max_chars
    FROM {_CORPUS} GROUP BY role
"""

ORACLE_SQL["group_size_skew_users"] = """
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
           CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90,
           CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99,
           CAST(max(n) AS BIGINT) AS max_n
    FROM c
"""

ORACLE_SQL["nation_share_of_region"] = """
    WITH pn AS (
        SELECT s_nationkey,
               CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS bal
        FROM supplier GROUP BY s_nationkey),
    j AS (
        SELECT r_name AS region, n_name AS nation, bal,
               CAST(sum(bal) OVER (PARTITION BY r_name) AS BIGINT) AS rbal
        FROM pn
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey)
    SELECT region, nation,
           CAST(bal AS DOUBLE) / 100.0 AS nation_bal,
           CAST(bal AS DOUBLE) / CAST(rbal AS DOUBLE) AS share
    FROM j
"""

ORACLE_SQL["running_distinct_types_events"] = """
    WITH f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first
        FROM events)
    SELECT event_id,
           CAST(sum(first) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT)
               AS n_distinct_types
    FROM f
"""

ORACLE_SQL["time_weighted_value_users"] = """
    WITH o AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                - epoch_us(ts)) // 1000000 AS dur
        FROM events),
    s AS (
        SELECT user_id,
               CAST(sum(cents * dur) AS BIGINT) AS wv,
               CAST(sum(dur) AS BIGINT) AS w
        FROM o WHERE dur IS NOT NULL GROUP BY user_id)
    SELECT user_id, CAST(wv AS DOUBLE) / CAST(w AS DOUBLE) AS twa_cents
    FROM s WHERE w > 0
"""

ORACLE_SQL["bigram_pmi_documents"] = """
    WITH d AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        FROM documents),
    uni AS (
        SELECT u.w AS w, count(*) AS n
        FROM d, unnest(d.toks) u(w) GROUP BY 1),
    tu AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM uni),
    b AS (
        SELECT list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                              x -> x[1] || ' ' || x[2]) AS bgs
        FROM d),
    big AS (SELECT u.bg AS bigram FROM b, unnest(b.bgs) u(bg)),
    bi AS (
        SELECT split_part(bigram, ' ', 1) AS w1,
               split_part(bigram, ' ', 2) AS w2,
               count(*) AS n_xy
        FROM big GROUP BY 1, 2),
    tb AS (SELECT CAST(sum(n_xy) AS DOUBLE) AS t FROM bi)
    SELECT bi.w1, bi.w2, CAST(bi.n_xy AS BIGINT) AS n_xy,
           ln(CAST(bi.n_xy AS DOUBLE)) + ln(tu.t) + ln(tu.t)
               - ln(tb.t) - ln(CAST(u1.n AS DOUBLE))
               - ln(CAST(u2.n AS DOUBLE)) AS pmi
    FROM bi, tu, tb
    JOIN uni u1 ON u1.w = bi.w1
    JOIN uni u2 ON u2.w = bi.w2
    WHERE bi.n_xy >= 5
"""

ORACLE_SQL["scrub_events_props"] = """
    SELECT event_id,
           regexp_replace(props, '[0-9]+(\\.[0-9]+)?', '<NUM>', 'g')
               AS scrubbed,
           CAST(len(regexp_extract_all(props, '[0-9]+(\\.[0-9]+)?'))
                AS BIGINT) AS n_redacted
    FROM events
"""

ORACLE_SQL["mad_value_by_type"] = """
    SELECT event_type, round(mad(value), 6) AS mad_value
    FROM events GROUP BY event_type
"""


ORACLE_SQL["asof_view_prior_purchase_dist"] = """
    WITH v AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ), p AS (
        SELECT user_id, ts, max(value) AS prior_purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT v.event_id, round(p.prior_purchase_value, 2) AS prior_purchase_value
    FROM v ASOF LEFT JOIN p
      ON v.user_id = p.user_id AND v.ts >= p.ts
"""


ORACLE_SQL["grouping_sets_events"] = """
    WITH e AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
    SELECT event_type, day, count(*) AS n,
           round(sum(cents) / 100.0, 2) AS sum_value
    FROM e
    GROUP BY GROUPING SETS ((event_type, day), (event_type), (day))
"""

ORACLE_SQL["global_value_quantiles"] = """
    SELECT quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.95) AS p95,
           quantile_disc(value, 0.99) AS p99
    FROM events
"""

ORACLE_SQL["orders_exists_bigqty_lineitem"] = """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
"""

ORACLE_SQL["orders_not_exists_bigqty_lineitem"] = """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
"""

ORACLE_SQL["funnel_stages_events"] = """
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' AND user_id IS NOT NULL
                GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND e.ts > s1.t1
                GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                GROUP BY e.user_id)
    SELECT s1.user_id,
           CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                ELSE 1 END AS funnel_stage
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
"""

ORACLE_SQL["decontaminate_documents"] = """
    WITH d AS (SELECT doc_id,
                      regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
               FROM documents),
         g AS (SELECT doc_id, list_transform(
                   list_zip(toks[1:len(toks)-3], toks[2:len(toks)-2],
                            toks[3:len(toks)-1], toks[4:len(toks)]),
                   x -> x[1]||' '||x[2]||' '||x[3]||' '||x[4]) AS ngs
               FROM d),
         f AS (SELECT doc_id, u.ng FROM g, unnest(g.ngs) u(ng)),
         bench AS (SELECT DISTINCT ng FROM f WHERE doc_id % 25 = 0)
    SELECT f.doc_id, CAST(count(DISTINCT f.ng) AS BIGINT) AS n_hits
    FROM f
    WHERE f.doc_id % 25 <> 0 AND f.ng IN (SELECT ng FROM bench)
    GROUP BY f.doc_id
"""

ORACLE_SQL["repetition_signals_documents"] = """
    WITH d AS (SELECT doc_id,
                      regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
               FROM documents),
         t AS (SELECT doc_id, len(toks) AS n,
                      len(list_distinct(toks)) AS nd FROM d),
         b AS (SELECT doc_id, list_transform(
                   list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                   x -> x[1]||' '||x[2]) AS bgs FROM d),
         bc AS (SELECT doc_id, u.bg, count(*) AS c
                FROM b, unnest(b.bgs) u(bg) GROUP BY doc_id, u.bg),
         bm AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot
                FROM bc GROUP BY doc_id)
    SELECT t.doc_id,
           round(1.0 - CAST(nd AS DOUBLE) / n, 6) AS dup_word_frac,
           round(coalesce(CAST(bm.mx AS DOUBLE) / bm.tot, 0.0), 6)
               AS top_bigram_frac
    FROM t LEFT JOIN bm ON t.doc_id = bm.doc_id
"""

ORACLE_SQL["ipc_source_event_counts"] = ORACLE_SQL["csv_source_event_counts"]

ORACLE_SQL["value_quantile_cont_by_type"] = """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90
    FROM events GROUP BY event_type
"""

ORACLE_SQL["skew_kurt_value_by_type"] = """
    SELECT event_type,
           round(skewness(value), 6) AS skew_value,
           round(kurtosis(value), 6) AS kurt_value
    FROM events GROUP BY event_type
"""

ORACLE_SQL["cap_docs_per_source"] = """
    SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents)
    WHERE rn <= 10
"""

ORACLE_SQL["session_ids_events"] = """
    WITH g AS (
        SELECT event_id, user_id, ts,
               CASE WHEN epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                         > 3600 THEN 1 ELSE 0 END AS brk
        FROM events)
    SELECT event_id, user_id,
           CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts) + 1
                AS BIGINT) AS session_id
    FROM g
"""

ORACLE_SQL["centered_avg_user_events"] = """
    WITH c AS (
        SELECT event_id, user_id, ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
    SELECT event_id,
           avg(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
               / 100.0 AS centered_avg
    FROM c
"""

ORACLE_SQL["orc_source_event_counts"] = ORACLE_SQL["csv_source_event_counts"]

ORACLE_SQL["upsert_events_latest"] = """
    WITH upd AS (SELECT event_id, ts + INTERVAL 1 HOUR AS ts, event_type,
                        value + 1000 AS value
                 FROM events WHERE event_id % 7 = 0),
         uni AS (SELECT event_id, ts, event_type, value, 0 AS src FROM events
                 UNION ALL
                 SELECT event_id, ts, event_type, value, 1 FROM upd),
         r AS (SELECT *, row_number() OVER (PARTITION BY event_id
                                            ORDER BY ts DESC, src DESC) AS rn
               FROM uni)
    SELECT event_type, count(*) AS n,
           round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS sum_value
    FROM r WHERE rn = 1 GROUP BY event_type
"""

ORACLE_SQL["snapshot_diff_events"] = """
    WITH old AS (SELECT event_id, value FROM events WHERE event_id % 13 <> 0),
         new AS (SELECT event_id,
                        CASE WHEN event_id % 7 = 0 THEN value + 1
                             ELSE value END AS value
                 FROM events WHERE event_id % 17 <> 0)
    SELECT coalesce(o.event_id, n.event_id) AS event_id,
           CASE WHEN o.event_id IS NULL THEN 'added'
                WHEN n.event_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change
    FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
    WHERE o.event_id IS NULL OR n.event_id IS NULL OR o.value <> n.value
"""

ORACLE_SQL["winsorized_value_stats_by_type"] = """
    WITH q AS (SELECT event_type,
                      round(quantile_cont(value, 0.05), 6) AS lo,
                      round(quantile_cont(value, 0.95), 6) AS hi
               FROM events GROUP BY event_type)
    SELECT e.event_type, count(e.value) AS n, q.lo, q.hi,
           round(sum(CAST(round(least(greatest(e.value, q.lo), q.hi) * 1000000)
                          AS BIGINT))
                 / 1000000.0 / count(e.value), 6) AS mean_winsor
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type, q.lo, q.hi
"""

ORACLE_SQL["date_parts_orders"] = """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS year,
           CAST(quarter(o_orderdate) AS BIGINT) AS quarter,
           CAST(month(o_orderdate) AS BIGINT) AS month,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(isodow(o_orderdate) AS BIGINT) AS isodow
    FROM orders
"""

ORACLE_SQL["dup_ngram_coverage_documents"] = """
    WITH d AS (SELECT doc_id,
                      regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
               FROM documents),
         g AS (SELECT doc_id, list_transform(
                   list_zip(toks[1:len(toks)-3], toks[2:len(toks)-2],
                            toks[3:len(toks)-1], toks[4:len(toks)]),
                   x -> x[1]||' '||x[2]||' '||x[3]||' '||x[4]) AS ngs
               FROM d),
         f AS (SELECT DISTINCT doc_id, u.ng FROM g, unnest(g.ngs) u(ng)),
         df AS (SELECT ng FROM f GROUP BY ng HAVING count(*) >= 2),
         tot AS (SELECT doc_id, count(*) AS n_total FROM f GROUP BY doc_id),
         dup AS (SELECT f.doc_id, count(*) AS n_dup FROM f
                 WHERE f.ng IN (SELECT ng FROM df) GROUP BY f.doc_id)
    SELECT tot.doc_id,
           CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup,
           CAST(tot.n_total AS BIGINT) AS n_total,
           round(coalesce(dup.n_dup, 0) * 1.0 / tot.n_total, 6) AS dup_frac
    FROM tot LEFT JOIN dup USING (doc_id)
"""

ORACLE_SQL["incremental_agg_events"] = """
    WITH new AS (SELECT event_id, event_type,
                        CASE WHEN event_id % 7 = 0 THEN value + 1
                             ELSE value END AS value
                 FROM events WHERE event_id % 17 <> 0)
    SELECT event_type, count(*) AS n,
           round(sum(CAST(round(value*100) AS BIGINT))/100.0, 2) AS sum_value
    FROM new GROUP BY event_type
"""

ORACLE_SQL["outlier_events_zscore"] = """
    WITH m AS (SELECT event_type, count(value) AS n,
                      sum(CAST(round(value*100) AS BIGINT)) AS s,
                      sum(CAST(round(value*100) AS BIGINT)
                          * CAST(round(value*100) AS BIGINT)) AS ss
               FROM events GROUP BY event_type),
         b AS (SELECT event_type, s/100.0/n AS mean,
                      sqrt((ss/10000.0 - (s/100.0)*(s/100.0)/n)/(n-1)) AS sd
               FROM m)
    SELECT e.event_id, e.event_type, e.value
    FROM events e JOIN b USING (event_type)
    WHERE abs(e.value - b.mean) > 2*b.sd
"""

ORACLE_SQL["edit_distance_pairs_documents"] = """
    WITH l AS (SELECT doc_id AS pid, substr(text, 1, 48) AS a
               FROM documents WHERE doc_id < 250),
         r AS (SELECT doc_id - 250 AS pid, substr(text, 1, 48) AS b
               FROM documents WHERE doc_id >= 250 AND doc_id < 500)
    SELECT l.pid, CAST(levenshtein(a, b) AS BIGINT) AS dist
    FROM l JOIN r USING (pid)
"""

ORACLE_SQL["embedding_norm_topk"] = """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                                              x -> CAST(x AS DOUBLE) * x))),
                 6) AS l2
    FROM embeddings ORDER BY l2 DESC, vec_id LIMIT 20
"""

ORACLE_SQL["weighted_sample_events"] = """
    WITH p AS (SELECT event_id, event_type, value,
                      CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 13))
                           AS BIGINT) / 4503599627370496.0 AS u
               FROM events)
    SELECT event_id, event_type, value FROM p
    ORDER BY -ln(u)/value, event_id LIMIT 100
"""

ORACLE_SQL["q10_returned_customers"] = """
    WITH rev AS (
        SELECT o_custkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) AS units
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY o_custkey
        ORDER BY units DESC, o_custkey LIMIT 20)
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(units/10000.0, 2) AS revenue
    FROM rev JOIN customer c ON o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
"""

ORACLE_SQL["hard_negative_embeddings"] = """
    WITH s AS (
        SELECT a.vec_id, b.vec_id AS neg_id,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                                   CAST(a.embedding AS DOUBLE[])) DESC,
                            b.vec_id) AS rnk
        FROM embeddings a JOIN embeddings b ON a.label <> b.label)
    SELECT vec_id, neg_id FROM s WHERE rnk = 1
"""

ORACLE_SQL["asof_tolerance_purchase_click"] = """
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT user_id, ts, max(value) AS prior_click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id,
           round(arg_max(c.prior_click_value, c.ts), 2) AS prior_click_value
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
    GROUP BY p.event_id
"""

ORACLE_SQL["cms_heavy_users"] = """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n, TRUE AS est_ok
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT 10
"""

ORACLE_SQL["pagerank_customer_supplier"] = """
    WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT c AS src, s AS dst FROM pairs
               UNION ALL SELECT s AS src, c AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         params AS (SELECT count(*) AS n FROM deg),
         r0 AS (SELECT src AS node, CAST(1000000000000 // p.n AS BIGINT) AS r
                FROM deg CROSS JOIN params p),
         it1 AS (SELECT d2.src AS node,
                        CAST((15 * (1000000000000 // p.n)) // 100
                             + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS r
                 FROM deg d2 CROSS JOIN params p
                 LEFT JOIN (SELECT e.dst AS node, sum(r0.r // dg.d) AS m
                            FROM e JOIN r0 ON e.src = r0.node
                            JOIN deg dg ON e.src = dg.src
                            GROUP BY e.dst) s ON d2.src = s.node),
         it2 AS (SELECT d2.src AS node,
                        CAST((15 * (1000000000000 // p.n)) // 100
                             + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS r
                 FROM deg d2 CROSS JOIN params p
                 LEFT JOIN (SELECT e.dst AS node, sum(it1.r // dg.d) AS m
                            FROM e JOIN it1 ON e.src = it1.node
                            JOIN deg dg ON e.src = dg.src
                            GROUP BY e.dst) s ON d2.src = s.node),
         it3 AS (SELECT d2.src AS node,
                        CAST((15 * (1000000000000 // p.n)) // 100
                             + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS r
                 FROM deg d2 CROSS JOIN params p
                 LEFT JOIN (SELECT e.dst AS node, sum(it2.r // dg.d) AS m
                            FROM e JOIN it2 ON e.src = it2.node
                            JOIN deg dg ON e.src = dg.src
                            GROUP BY e.dst) s ON d2.src = s.node)
    SELECT node, r AS rank FROM it3 ORDER BY rank DESC, node LIMIT 20
"""

ORACLE_SQL["events_nearby_30min"] = """
    SELECT event_id,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                               RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING
                                         AND INTERVAL 30 MINUTE FOLLOWING)
                AS BIGINT) AS n_nearby
    FROM events
"""

ORACLE_SQL["user_active_coverage"] = """
    WITH iv AS (SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e
                FROM events),
         o AS (SELECT *, CASE WHEN s > max(e) OVER (
                                  PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING)
                              THEN 1 ELSE 0 END AS brk
               FROM iv),
         g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                                        ORDER BY s, e) AS grp
               FROM o),
         isl AS (SELECT user_id, grp, min(s) AS s0, max(e) AS e1
                 FROM g GROUP BY user_id, grp)
    SELECT user_id, CAST(sum(epoch_us(e1 - s0)) AS BIGINT) AS active_us
    FROM isl GROUP BY user_id
"""

ORACLE_SQL["new_users_per_day"] = """
    WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events
               GROUP BY user_id)
    SELECT date_trunc('day', first_ts) AS day,
           CAST(count(*) AS BIGINT) AS n_new_users
    FROM f GROUP BY day
"""

ORACLE_SQL["weekly_retention_cohorts"] = """
    WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events
               GROUP BY user_id),
         t AS (SELECT DISTINCT
                      date_trunc('week', f.first_ts) AS cohort_week,
                      CAST(datediff('day', date_trunc('week', f.first_ts),
                                    date_trunc('week', e.ts)) // 7
                           AS BIGINT) AS week_offset,
                      e.user_id
               FROM events e JOIN f USING (user_id))
    SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
    FROM t GROUP BY cohort_week, week_offset
"""

ORACLE_SQL["pushdown_scan_orders"] = """
    SELECT o_orderpriority, count(*) AS n,
           round(sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0, 2) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
"""

ORACLE_SQL["union_distinct_users"] = """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
"""

ORACLE_SQL["train_val_test_split_documents"] = """
    WITH a AS (SELECT CASE
                   WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                             AS INT) < 204 THEN 'train'
                   WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                             AS INT) < 230 THEN 'val'
                   ELSE 'test' END AS split,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM documents)
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM a GROUP BY split
"""

ORACLE_SQL["fk_violations_check"] = """
    SELECT 'lineitem.l_orderkey->orders' AS relation,
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT count(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
                AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST((SELECT count(*) FROM customer
                 WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
                AS BIGINT)
"""

ORACLE_SQL["profile_events"] = """
    SELECT 'event_id' AS column, count(*) AS n,
           CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(min(event_id) AS VARCHAR) AS min_str,
           CAST(max(event_id) AS VARCHAR) AS max_str
    FROM events
    UNION ALL
    SELECT 'user_id', count(*), count(*) - count(user_id),
           count(DISTINCT user_id),
           CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'event_type', count(*), count(*) - count(event_type),
           count(DISTINCT event_type),
           CAST(min(event_type) AS VARCHAR), CAST(max(event_type) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'value', count(*), count(*) - count(value),
           count(DISTINCT value),
           CAST(min(value) AS VARCHAR), CAST(max(value) AS VARCHAR)
    FROM events
"""

ORACLE_SQL["index_lookup_documents"] = """
    WITH toks(token) AS (VALUES ('key'), ('value'), ('table'), ('row'),
                                ('merge'), ('window')),
         f AS (SELECT doc_id,
                      unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                          AS token
               FROM documents),
         c AS (SELECT token, count(DISTINCT doc_id) AS n FROM f
               WHERE token IN (SELECT token FROM toks) GROUP BY token)
    SELECT toks.token, CAST(coalesce(c.n, 0) AS BIGINT) AS n_docs
    FROM toks LEFT JOIN c USING (token)
"""

ORACLE_SQL["debounced_events"] = """
    WITH l AS (SELECT event_id,
                      epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap_s
               FROM events)
    SELECT event_id FROM l WHERE gap_s IS NULL OR gap_s > 3600
"""

ORACLE_SQL["value_decile_events"] = """
    WITH q AS (SELECT quantile_cont(value,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
               FROM events)
    SELECT e.event_id,
           CAST(1 + len(list_filter(list_transform(q.qs, x -> round(x, 6)),
                                    x -> e.value > x)) AS BIGINT) AS decile
    FROM events e CROSS JOIN q
"""

ORACLE_SQL["gapfilled_daily_counts"] = """
    WITH b AS (SELECT user_id, date_trunc('day', min(ts)) AS d0,
                      date_trunc('day', max(ts)) AS d1
               FROM events GROUP BY user_id),
         days AS (SELECT user_id, unnest(generate_series(d0, d1,
                                                         INTERVAL 1 DAY)) AS day
                  FROM b),
         c AS (SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n
               FROM events GROUP BY user_id, day)
    SELECT days.user_id, days.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n
    FROM days LEFT JOIN c USING (user_id, day)
"""

ORACLE_SQL["conversion_rate_by_user"] = """
    WITH p AS (SELECT user_id, count(*) AS n_purchases FROM events
               WHERE event_type = 'purchase' GROUP BY user_id),
         c AS (SELECT user_id, count(*) AS n_clicks FROM events
               WHERE event_type = 'click' GROUP BY user_id)
    SELECT coalesce(p.user_id, c.user_id) AS user_id,
           CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases,
           CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
           CASE WHEN coalesce(c.n_clicks, 0) > 0
                THEN round(coalesce(p.n_purchases, 0) * 1.0 / c.n_clicks, 6)
                END AS conversion_rate
    FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
"""

ORACLE_SQL["bigram_logprob_documents"] = """
    WITH d AS (SELECT doc_id,
                      regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
               FROM documents),
         u AS (SELECT tok, count(*) AS c
               FROM (SELECT unnest(toks) AS tok FROM d) GROUP BY tok),
         v AS (SELECT count(*) AS vs FROM u),
         b AS (SELECT doc_id,
                      list_transform(list_zip(toks[1:len(toks)-1],
                                              toks[2:len(toks)]),
                                     x -> x[1]||' '||x[2]) AS bgs,
                      toks[1:len(toks)-1] AS prevs
               FROM d),
         f AS (SELECT doc_id, unnest(bgs) AS bg, unnest(prevs) AS prev FROM b),
         bc AS (SELECT bg, count(*) AS cb FROM f GROUP BY bg),
         scored AS (SELECT f.doc_id,
                           CAST(floor(1000000 * ln((bc.cb + 0.5)
                                                   / (u.c + 0.5 * v.vs)))
                                AS BIGINT) AS s
                    FROM f JOIN u ON f.prev = u.tok
                    JOIN bc ON f.bg = bc.bg
                    CROSS JOIN v),
         agg AS (SELECT doc_id, sum(s) AS tot, count(*) AS cnt
                 FROM scored GROUP BY doc_id)
    SELECT dd.doc_id, CAST(coalesce(agg.cnt, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(-((-agg.tot) // agg.cnt), 0) AS BIGINT) AS mean_logprob_u
    FROM (SELECT doc_id FROM documents) dd LEFT JOIN agg USING (doc_id)
"""

ORACLE_SQL["hive_partition_docs_en"] = """
    SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE lang = 'en'
"""

ORACLE_SQL["render_training_text_transcripts"] = f"""
    SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
           string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
               AS rendered
    FROM {_CORPUS} GROUP BY conv_id
"""

ORACLE_SQL["semantic_decontaminate_embeddings"] = """
    WITH b AS (SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS be
               FROM embeddings WHERE vec_id % 25 = 0),
         t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS te
               FROM embeddings WHERE vec_id % 25 <> 0),
         s AS (SELECT t.vec_id, b.bench_id,
                      list_cosine_similarity(te, be) AS cos,
                      row_number() OVER (
                          PARTITION BY t.vec_id
                          ORDER BY list_cosine_similarity(te, be) DESC,
                                   b.bench_id) AS rnk
               FROM t CROSS JOIN b)
    SELECT vec_id, bench_id FROM s WHERE rnk = 1 AND cos >= 0.3
"""

ORACLE_SQL["scd2_event_state"] = """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
    runs AS (
        SELECT user_id, ts, event_id, event_type FROM ordered
        WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL AS is_current
    FROM runs
"""

# Incremental SCD2 merge must equal the batch recompute over the full
# stream — the oracle IS the full-stream SCD2.
ORACLE_SQL["scd2_incremental_events"] = ORACLE_SQL["scd2_event_state"]

# Exact integer moments (x = epoch-day - 19723, y = cents), then the
# slope/intercept float expressions in the SAME operation order as the
# engine's numpy — both sides' doubles are bit-identical.
ORACLE_SQL["regr_value_day_by_type"] = """
    WITH m AS (
        SELECT event_type,
               count(*) AS n,
               sum(epoch_us(ts) // 86400000000 - 19723) AS sx,
               sum(CAST(round(value * 100) AS BIGINT)) AS sy,
               sum((epoch_us(ts) // 86400000000 - 19723)
                   * CAST(round(value * 100) AS BIGINT)) AS sxy,
               sum((epoch_us(ts) // 86400000000 - 19723)
                   * (epoch_us(ts) // 86400000000 - 19723)) AS sxx
        FROM events GROUP BY event_type),
    fit AS (
        SELECT event_type, n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_day,
               sx, sy
        FROM m)
    SELECT event_type, CAST(n AS BIGINT) AS n, slope_cents_day,
           (CAST(sy AS DOUBLE) - slope_cents_day * CAST(sx AS DOUBLE)) / n
               AS intercept_cents
    FROM fit
"""

ORACLE_SQL["role_transition_counts_transcripts"] = f"""
    WITH o AS (
        SELECT role,
               lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS prev_role
        FROM {_CORPUS})
    SELECT prev_role, role, count(*) AS n
    FROM o WHERE prev_role IS NOT NULL GROUP BY prev_role, role
"""

ORACLE_SQL["trailing_7d_active_users"] = """
    WITH du AS (
        SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id
        FROM events),
    days AS (SELECT DISTINCT d FROM du)
    SELECT days.d AS day, count(DISTINCT du.user_id) AS wau
    FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
"""

ORACLE_SQL["window_dedup_events"] = """
    SELECT event_id FROM (
        SELECT event_id,
               row_number() OVER (
                   PARTITION BY user_id, epoch_us(ts) // 600000000
                   ORDER BY ts, event_id) AS rn
        FROM events)
    WHERE rn = 1
"""

ORACLE_SQL["response_latency_transcripts"] = f"""
    WITH o AS (
        SELECT conv_id, turn_idx, role, epoch_us(ts) AS us,
               lead(role) OVER w AS next_role,
               lead(epoch_us(ts)) OVER w AS next_us
        FROM {_CORPUS}
        WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
    SELECT conv_id, CAST(turn_idx AS BIGINT) AS prompt_idx,
           next_us - us AS latency_us
    FROM o WHERE role = 'user' AND next_role = 'assistant'
"""

ORACLE_SQL["chi2_type_value_events"] = """
    WITH cells AS (
        SELECT event_type, CAST(floor(value * 0.02) AS BIGINT) AS vb,
               count(*) AS n
        FROM events GROUP BY 1, 2),
    m AS (
        SELECT event_type, vb, CAST(n AS BIGINT) AS observed,
               sum(n) OVER (PARTITION BY event_type) AS rt,
               sum(n) OVER (PARTITION BY vb) AS ct,
               sum(n) OVER () AS tot
        FROM cells)
    SELECT event_type, vb, observed,
           CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tot AS DOUBLE)
               AS expected,
           (CAST(observed AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                  / CAST(tot AS DOUBLE))
           * (CAST(observed AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                  / CAST(tot AS DOUBLE))
           / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tot AS DOUBLE))
               AS chi2_contrib
    FROM m
"""

ORACLE_SQL["wow_event_counts"] = """
    WITH c AS (
        SELECT event_type, date_trunc('week', ts) AS week,
               count(*) AS n
        FROM events GROUP BY 1, 2)
    SELECT event_type, week, CAST(n AS BIGINT) AS n,
           CAST(lag(n) OVER w AS DOUBLE) AS prev_n,
           CAST(n AS DOUBLE) / CAST(lag(n) OVER w AS DOUBLE) AS wow_ratio
    FROM c WINDOW w AS (PARTITION BY event_type ORDER BY week)
"""

ORACLE_SQL["chunk_overlap_documents"] = """
    WITH w AS (
        SELECT doc_id,
               regexp_split_to_array(
                   regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                   '\\s+') AS words
        FROM documents
        WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''),
    wp AS (
        SELECT doc_id, unnest(words) AS word,
               unnest(range(len(words))) AS pos
        FROM w),
    -- width 50 = 2x stride 25, so a word at pos belongs to exactly
    -- chunks pos//25 and pos//25 - 1 (when that exists)
    mem AS (
        SELECT doc_id, pos // 25 AS chunk_id, word, pos FROM wp
        UNION ALL
        SELECT doc_id, pos // 25 - 1, word, pos FROM wp WHERE pos // 25 >= 1)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           string_agg(word, ' ' ORDER BY pos) AS chunk_text
    FROM mem GROUP BY doc_id, chunk_id
"""

ORACLE_SQL["out_of_order_events"] = """
    WITH o AS (
        SELECT event_id, epoch_us(ts) AS us,
               max(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
        FROM events)
    SELECT event_id, wm - us AS late_by_us
    FROM o WHERE us < wm
"""

ORACLE_SQL["incremental_dedup_documents"] = """
    WITH cut AS (SELECT (max(doc_id) + 1) // 2 AS c FROM documents)
    SELECT d.doc_id
    FROM documents d, cut
    WHERE d.doc_id >= cut.c
      AND NOT EXISTS (SELECT 1 FROM documents h, cut
                      WHERE h.doc_id < cut.c AND h.text = d.text)
"""

ORACLE_SQL["topk_with_ties_events"] = """
    SELECT event_type, event_id, value, rnk FROM (
        SELECT event_type, event_id, value,
               rank() OVER (PARTITION BY event_type ORDER BY value DESC)
                   AS rnk
        FROM events)
    WHERE rnk <= 3
"""

ORACLE_SQL["k_anonymize_events"] = """
    SELECT event_id, event_type, vb FROM (
        SELECT event_id, event_type,
               CAST(floor(value * 0.02) AS BIGINT) AS vb,
               count(*) OVER (PARTITION BY event_type,
                              CAST(floor(value * 0.02) AS BIGINT)) AS n
        FROM events)
    WHERE n >= 20
"""

ORACLE_SQL["pseudonymize_events"] = """
    SELECT event_id, md5('u:' || CAST(user_id AS VARCHAR)) AS user_pseudo
    FROM events
"""

ORACLE_SQL["zorder_scan_events"] = """
    WITH q AS (
        SELECT event_id, user_id & 65535 AS x,
               CAST(round(value * 100) AS BIGINT) & 65535 AS y
        FROM events
        WHERE user_id >= 2 AND user_id < 10
          AND CAST(round(value * 100) AS BIGINT) >= 10000
          AND CAST(round(value * 100) AS BIGINT) < 30000),
    s1 AS (SELECT event_id, (x | (x << 8)) & 16711935 AS x,
                  (y | (y << 8)) & 16711935 AS y FROM q),
    s2 AS (SELECT event_id, (x | (x << 4)) & 252645135 AS x,
                  (y | (y << 4)) & 252645135 AS y FROM s1),
    s3 AS (SELECT event_id, (x | (x << 2)) & 858993459 AS x,
                  (y | (y << 2)) & 858993459 AS y FROM s2),
    s4 AS (SELECT event_id, (x | (x << 1)) & 1431655765 AS x,
                  (y | (y << 1)) & 1431655765 AS y FROM s3)
    SELECT event_id, x | (y << 1) AS zcode FROM s4
"""

# splitmix64 replayed exactly in SQL: HUGEINT arithmetic mod 2^64 with
# split 32-bit multiplies (a*b mod 2^64 = (lo(a)*b mod 2^64 +
# (hi(a)*b mod 2^32)<<32) mod 2^64 — HUGEINT never overflows), xor/shift
# native. Bit-identical to logray.ops.bloom._splitmix64 (pytest-checked).
ORACLE_SQL["negative_sample_parts"] = """
    WITH s1 AS (
        SELECT c_custkey AS c,
               ((c_custkey * 8 + r.j)::HUGEINT + 11400714819323198485)
                   % 18446744073709551616 AS z
        FROM customer, range(8) r(j)),
    s2 AS (SELECT c, xor(z, z >> 30) AS z FROM s1),
    s3 AS (SELECT c,
               ( ((z % 4294967296) * 13787848793156543929)
                     % 18446744073709551616
               + (((z // 4294967296) * 13787848793156543929)
                     % 4294967296) * 4294967296 )
                   % 18446744073709551616 AS z FROM s2),
    s4 AS (SELECT c, xor(z, z >> 27) AS z FROM s3),
    s5 AS (SELECT c,
               ( ((z % 4294967296) * 10723151780598845931)
                     % 18446744073709551616
               + (((z // 4294967296) * 10723151780598845931)
                     % 4294967296) * 4294967296 )
                   % 18446744073709551616 AS z FROM s4),
    cand AS (
        SELECT DISTINCT c,
               CAST((xor(z, z >> 31) >> 1)
                    % (SELECT count(*) FROM part) AS BIGINT) AS p
        FROM s5),
    inter AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
    SELECT c AS custkey, p AS neg_partkey FROM cand
    WHERE NOT EXISTS (SELECT 1 FROM inter
                      WHERE inter.c = cand.c AND inter.p = cand.p)
"""

ORACLE_SQL["hashed_features_events"] = """
    SELECT event_id,
           CAST(('0x' || substr(md5('t=' || event_type), 1, 13)) AS BIGINT)
               % 256 AS feat_idx
    FROM events
    UNION ALL
    SELECT event_id,
           CAST(('0x' || substr(md5('d=' || CAST(CAST(floor(
               least(coalesce(value, 0.0), 999.9) * 0.01) AS BIGINT)
               AS VARCHAR)), 1, 13)) AS BIGINT) % 256 AS feat_idx
    FROM events
"""

ORACLE_SQL["segment_dedup_documents"] = """
    WITH w AS (
        SELECT doc_id,
               regexp_split_to_array(
                   regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                   '\\s+') AS words
        FROM documents
        WHERE regexp_replace(text, '^\\s+|\\s+$', '', 'g') <> ''),
    wp AS (
        SELECT doc_id, unnest(words) AS word,
               unnest(range(len(words))) AS pos
        FROM w),
    segs AS (
        SELECT doc_id, CAST(pos // 10 AS BIGINT) AS seg_idx,
               string_agg(word, ' ' ORDER BY pos) AS seg
        FROM wp GROUP BY doc_id, pos // 10),
    marked AS (
        SELECT doc_id, seg_idx, seg,
               count(*) OVER (PARTITION BY seg) AS n,
               min(doc_id * 1048576 + seg_idx) OVER (PARTITION BY seg) AS mk
        FROM segs)
    SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
    FROM marked
    WHERE n = 1 OR doc_id * 1048576 + seg_idx = mk
    GROUP BY doc_id
"""

ORACLE_SQL["context_budget_truncate_transcripts"] = f"""
    WITH t AS (
        SELECT conv_id, turn_idx,
               CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = ''
                    THEN 0
                    ELSE CAST(len(regexp_split_to_array(
                        regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                        '\\s+')) AS BIGINT)
               END AS ntok
        FROM {_CORPUS}),
    c AS (
        SELECT conv_id, ntok,
               sum(ntok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC)
                   AS rcum
        FROM t)
    SELECT conv_id, count(*) AS n_kept,
           CAST(sum(ntok) AS BIGINT) AS tok_kept
    FROM c WHERE rcum <= 512 GROUP BY conv_id
"""

ORACLE_SQL["dialog_pairs_transcripts"] = f"""
    WITH o AS (
        SELECT conv_id, turn_idx, role, len(text) AS nchar,
               lead(role) OVER w AS next_role,
               lead(turn_idx) OVER w AS next_idx,
               lead(len(text)) OVER w AS next_chars
        FROM {_CORPUS}
        WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
    SELECT conv_id,
           CAST(turn_idx AS BIGINT) AS prompt_idx,
           CAST(next_idx AS BIGINT) AS response_idx,
           CAST(nchar AS BIGINT) AS prompt_chars,
           CAST(next_chars AS BIGINT) AS response_chars
    FROM o WHERE role = 'user' AND next_role = 'assistant'
"""

# URL canonicalization: the oracle derives the EXPECTED canonical form
# analytically from the document columns — it never parses the messy
# input the engine normalizes, so every byte is independently checked.
# Variants 0-3 and 5 all canonicalize to the plain form; variant 4 keeps
# its one non-tracking query param.
ORACLE_SQL["url_canonicalize_documents"] = """
    SELECT doc_id,
           'http://www.' || source || '.example/' || lang || '/doc/'
           || CAST(doc_id AS VARCHAR)
           || CASE WHEN doc_id % 6 = 4 THEN '?page=2' ELSE '' END AS url
    FROM documents
"""

# Link prediction: triangle-oracle edge construction plus the basket
# support threshold (pairs co-occurring in >= 2 orders); the integer
# micro-unit divisions replay the engine's exact arithmetic, so values
# compare bit-identically.
ORACLE_SQL["link_prediction_parts"] = """
    WITH so AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem),
    e AS (
        SELECT a.s AS u, b.s AS v
        FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
        GROUP BY 1, 2 HAVING count(*) >= 2),
    sym AS (SELECT u AS w, v AS n FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY w),
    mid AS (SELECT s.w, s.n, d.d FROM sym s JOIN deg d USING (w)),
    wed AS (
        SELECT a.n AS u, b.n AS v, CAST(count(*) AS BIGINT) AS cn,
               CAST(sum(1000000000 // a.d) AS BIGINT) AS ra_q
        FROM mid a JOIN mid b ON a.w = b.w AND a.n < b.n
        GROUP BY 1, 2),
    cand AS (
        SELECT * FROM wed
        WHERE NOT EXISTS (SELECT 1 FROM e
                          WHERE e.u = wed.u AND e.v = wed.v))
    SELECT c.u, c.v, c.cn, c.ra_q,
           CAST(c.cn * 1000000 // (du.d + dv.d - c.cn) AS BIGINT) AS jac_q
    FROM cand c
    JOIN deg du ON du.w = c.u
    JOIN deg dv ON dv.w = c.v
    ORDER BY c.ra_q DESC, c.cn DESC, c.u, c.v
    LIMIT 50
"""

ORACLE_SQL["triangle_counts_parts"] = """
    WITH so AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem),
    e AS (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM so a JOIN so b ON a.o = b.o AND a.s < b.s)
    SELECT e1.u AS part_lo, count(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    GROUP BY e1.u
"""


# Composed cleanup-funnel oracle: the langid CASE and the UNROUNDED
# quality formula replayed over the same documents; stage counts by
# scalar subqueries. (The quality gate compares the RAW score > 0.2, so
# this CTE must not round — the standalone quality oracle rounds for
# hash stability, which is fine there but would shift threshold ties.)
ORACLE_SQL["cleanup_funnel_counts_documents"] = f"""
    WITH l AS ({ORACLE_SQL["langid_documents"]}),
    q AS (
        SELECT doc_id,
               least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
               * (1.0 - least(CAST(len(regexp_extract_all(text, '[^\\w\\s]'))
                                   AS DOUBLE)
                              / greatest(CAST(length(text) AS DOUBLE), 1.0)
                              * 2.0, 1.0))
               * (0.5 + (CAST({_NSTOP} AS DOUBLE)
                         / greatest(CAST(len(regexp_extract_all(
                               lower(coalesce(text, '')), '[a-z]+'))
                               AS DOUBLE), 1.0)) * 0.5) AS quality
        FROM documents),
    en AS (
        SELECT d.doc_id, d.text FROM documents d
        JOIN l ON l.doc_id = d.doc_id WHERE l.lang_pred = 'en'),
    good AS (
        SELECT en.doc_id, en.text FROM en
        JOIN q ON q.doc_id = en.doc_id WHERE q.quality > 0.2)
    SELECT 'input' AS stage,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_rows
    UNION ALL SELECT 'lang_en', CAST((SELECT count(*) FROM en) AS BIGINT)
    UNION ALL SELECT 'quality', CAST((SELECT count(*) FROM good) AS BIGINT)
    UNION ALL SELECT 'exact_dedup',
           CAST((SELECT count(DISTINCT text) FROM good) AS BIGINT)
"""


# ---- rows-only → value-checked companions (round 3, second batch)

# training_prep prefix: unlike the cleanup funnel, even the SAMPLE stage
# value-checks — the mixture is a deterministic md5-hex-digit gate that
# DuckDB replays (strpos over the hex alphabet == int(hexdigest[0], 16)).
ORACLE_SQL["training_prep_prefix_documents"] = f"""
    WITH q AS (
        SELECT doc_id, text, lang,
               least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
               * (1.0 - least(CAST(len(regexp_extract_all(text, '[^\\w\\s]'))
                                   AS DOUBLE)
                              / greatest(CAST(length(text) AS DOUBLE), 1.0)
                              * 2.0, 1.0))
               * (0.5 + (CAST({_NSTOP} AS DOUBLE)
                         / greatest(CAST(len(regexp_extract_all(
                               lower(coalesce(text, '')), '[a-z]+'))
                               AS DOUBLE), 1.0)) * 0.5) AS quality
        FROM documents),
    good AS (SELECT doc_id, text, lang FROM q WHERE quality >= 0.3),
    kept AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY text),
    keptrows AS (
        SELECT g.doc_id, g.text, g.lang FROM good g
        JOIN kept k ON g.doc_id = k.doc_id),
    sampled AS (
        SELECT * FROM keptrows
        WHERE strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
              < CASE WHEN lang = 'en' THEN 8 ELSE 1 END)
    SELECT 'input' AS stage,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_rows
    UNION ALL SELECT 'quality', CAST((SELECT count(*) FROM good) AS BIGINT)
    UNION ALL SELECT 'exact_dedup',
           CAST((SELECT count(*) FROM keptrows) AS BIGINT)
    UNION ALL SELECT 'mixture', CAST((SELECT count(*) FROM sampled) AS BIGINT)
    UNION ALL SELECT 'sampled_tokens',
           CAST((SELECT coalesce(sum(CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+')) END),
                     0) FROM sampled) AS BIGINT)
"""

ORACLE_SQL["random_sample_invariant_events"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           TRUE AS sampled_in_bounds_ok, TRUE AS distinct_ok,
           TRUE AS subset_ok
    FROM events
"""

ORACLE_SQL["shuffle_invariant_documents"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(least(100, count(*)) AS BIGINT) AS n_sampled,
           TRUE AS distinct_ok, TRUE AS subset_ok
    FROM documents
"""

ORACLE_SQL["ngram_exactdup_recall_documents"] = """
    WITH d AS (
        SELECT doc_id, text FROM documents WHERE length(text) >= 3
        UNION ALL
        SELECT doc_id + 10000000, text FROM documents
        WHERE length(text) >= 3 AND doc_id % 13 = 0),
    g AS (
        SELECT count(*) AS n FROM d GROUP BY text HAVING count(*) > 1)
    SELECT CAST(coalesce(sum((n * (n - 1)) // 2), 0) AS BIGINT)
               AS n_exact_pairs,
           TRUE AS all_exact_pairs_emitted
    FROM g
"""

ORACLE_SQL["embedding_exactdup_invariant_embeddings"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_planted,
           TRUE AS planted_pairs_clustered_ok
    FROM embeddings WHERE vec_id % 7 = 0
"""

ORACLE_SQL["semdedup_planted_invariant_embeddings"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_planted,
           TRUE AS pairs_share_cluster_ok, TRUE AS never_both_kept_ok
    FROM embeddings WHERE vec_id % 7 = 0
"""

# footer-stats aggregate: DuckDB actually scans; the engine reads footers
ORACLE_SQL["metadata_stats_orders"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           min(o_totalprice) AS min_totalprice,
           max(o_totalprice) AS max_totalprice,
           min(o_orderdate) AS min_orderdate,
           max(o_orderdate) AS max_orderdate
    FROM orders
"""

# exact (complete) blocked similarity join — the oracle brute-forces the
# small-dim cross join with DuckDB's levenshtein
ORACLE_SQL["editdist_pairs_suppliers"] = """
    SELECT a.s_suppkey AS a, b.s_suppkey AS b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
    FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
"""

ORACLE_SQL["fd_discovery_orders_events"] = """
    SELECT 'orders.o_orderkey->o_custkey' AS fd,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_lhs,
           CAST(count(DISTINCT (o_orderkey, o_custkey)) AS BIGINT)
               AS n_pairs,
           count(DISTINCT o_orderkey)
               = count(DISTINCT (o_orderkey, o_custkey)) AS holds
    FROM orders
    UNION ALL
    SELECT 'orders.o_custkey->o_orderpriority',
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(count(DISTINCT (o_custkey, o_orderpriority)) AS BIGINT),
           count(DISTINCT o_custkey)
               = count(DISTINCT (o_custkey, o_orderpriority))
    FROM orders
    UNION ALL
    SELECT 'events.user_id->event_type',
           CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(count(DISTINCT (user_id, event_type)) AS BIGINT),
           count(DISTINCT user_id)
               = count(DISTINCT (user_id, event_type))
    FROM events
    UNION ALL
    SELECT 'events.event_type->user_id',
           CAST(count(DISTINCT event_type) AS BIGINT),
           CAST(count(DISTINCT (event_type, user_id)) AS BIGINT),
           count(DISTINCT event_type)
               = count(DISTINCT (event_type, user_id))
    FROM events
"""

ORACLE_SQL["merge_into_events"] = """
    WITH e AS (
        SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
    SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM e
    UNION ALL
    SELECT 2, CAST(count(*) + 2 AS BIGINT),
           CAST(sum(CASE WHEN event_id % 97 = 5 THEN cents + 5
                    ELSE cents END) + 111 + 222 AS BIGINT)
    FROM e
"""

ORACLE_SQL["timetravel_events"] = """
    WITH e AS (
        SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
    SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM e WHERE event_id % 2 = 0
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
    FROM e
    UNION ALL
    SELECT 3, CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN event_id % 2 = 0 AND event_id % 10 = 0
                    THEN cents + 1 ELSE cents END) AS BIGINT)
    FROM e
"""

ORACLE_SQL["merkle_reconcile_events"] = """
    WITH base AS (
        SELECT event_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               event_id // 1000 AS rng
        FROM events),
    a AS (
        SELECT rng,
               sum(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                   || ':' || CAST(cents AS VARCHAR)), 1, 13))
                   AS BIGINT)) AS dig,
               CAST(count(*) AS BIGINT) AS n
        FROM base GROUP BY rng),
    bb AS (
        SELECT rng,
               sum(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                   || ':' || CAST(cents2 AS VARCHAR)), 1, 13))
                   AS BIGINT)) AS dig,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT rng, event_id,
                     CASE WHEN event_id % 7919 = 3 THEN cents + 1
                          ELSE cents END AS cents2
              FROM base WHERE event_id % 9973 <> 7)
        GROUP BY rng)
    SELECT coalesce(a.rng, bb.rng) AS rng,
           coalesce(a.n, 0) AS n_a, coalesce(bb.n, 0) AS n_b
    FROM a FULL OUTER JOIN bb ON a.rng = bb.rng
    WHERE coalesce(a.dig, 0) <> coalesce(bb.dig, 0)
"""

ORACLE_SQL["hll_grouping_sets_users"] = """
    SELECT 'type' AS level, event_type,
           CAST(NULL AS TIMESTAMP) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'day', CAST(NULL AS VARCHAR), date_trunc('day', ts),
           CAST(count(DISTINCT user_id) AS BIGINT), TRUE
    FROM events GROUP BY date_trunc('day', ts)
    UNION ALL
    SELECT 'all', NULL, NULL,
           CAST(count(DISTINCT user_id) AS BIGINT), TRUE
    FROM events
"""

ORACLE_SQL["crosscorr_click_purchase_events"] = """
    WITH c AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2),
    b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM c),
    g AS (SELECT unnest(generate_series((SELECT lo FROM b),
                 (SELECT hi FROM b), INTERVAL 1 HOUR)) AS hour),
    x AS (SELECT g.hour, coalesce(c.n, 0) AS n FROM g
          LEFT JOIN c ON c.hour = g.hour AND c.event_type = 'click'),
    y AS (SELECT g.hour, coalesce(c.n, 0) AS n FROM g
          LEFT JOIN c ON c.hour = g.hour AND c.event_type = 'purchase'),
    k AS (SELECT unnest(range(-3, 4)) AS offset_h),
    j AS (SELECT k.offset_h, x.n AS xn, y.n AS yn
          FROM k CROSS JOIN x
          JOIN y ON y.hour = x.hour + k.offset_h * INTERVAL 1 HOUR),
    s AS (SELECT offset_h, CAST(count(*) AS BIGINT) AS c,
                 sum(xn) AS sx, sum(yn) AS sy, sum(xn * xn) AS sxx,
                 sum(yn * yn) AS syy, sum(xn * yn) AS sxy
          FROM j GROUP BY 1)
    SELECT offset_h, c AS n_hours,
           round(CAST(c * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(c * sxx - sx * sx AS DOUBLE)
                        * CAST(c * syy - sy * sy AS DOUBLE)), 6) AS r
    FROM s
"""

# Hour-of-week leave-one-out baseline: the `how` label differs from the
# engine's (pandas Monday=0 vs strftime %w Sunday=0) but any injective
# (weekday, hour) labeling induces the SAME partitions, which is all the
# window needs.
ORACLE_SQL["seasonal_anomaly_hours_events"] = """
    WITH h AS (
        SELECT date_trunc('hour', ts) AS hour,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1),
    w AS (SELECT hour, n, strftime(hour, '%w-%H') AS how FROM h),
    s AS (SELECT n,
                 count(*) OVER (PARTITION BY how) AS c,
                 sum(n) OVER (PARTITION BY how) AS s1,
                 sum(n * n) OVER (PARTITION BY how) AS s2
          FROM w),
    mcte AS (SELECT n, c, s2,
                    CAST(s1 - n AS DOUBLE) / (c - 1) AS m
             FROM s),
    v AS (SELECT n, c, m,
                 (CAST(s2 - n * n AS DOUBLE) - (c - 1) * m * m)
                     / (c - 2) AS var
          FROM mcte)
    SELECT CAST(count(*) AS BIGINT) AS n_hours_scored,
           round(max(abs((n - m) / sqrt(var))), 6) AS max_abs_z,
           CAST(sum(CASE WHEN abs((n - m) / sqrt(var)) > 3
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM v WHERE c > 2 AND var > 0
"""

ORACLE_SQL["conversion_ab_ztest_events"] = """
    WITH u AS (
        SELECT user_id,
               CAST(floor(date_part('epoch', date_trunc('day', ts))
                    / 86400) AS BIGINT) AS day,
               (user_id + CAST(floor(date_part('epoch',
                    date_trunc('day', ts)) / 86400) AS BIGINT)) % 2
                   AS wk,
               max(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1, 2, 3),
    s AS (
        SELECT CAST(sum(CASE WHEN wk = 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS n0,
               CAST(sum(CASE WHEN wk = 0 THEN conv ELSE 0 END)
                    AS DOUBLE) AS x0,
               CAST(sum(CASE WHEN wk = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS n1,
               CAST(sum(CASE WHEN wk = 1 THEN conv ELSE 0 END)
                    AS DOUBLE) AS x1
        FROM u)
    SELECT CAST(n0 AS BIGINT) AS n_arm0,
           CAST(n1 AS BIGINT) AS n_arm1,
           CAST(x0 AS BIGINT) AS conv_arm0,
           CAST(x1 AS BIGINT) AS conv_arm1,
           (x1 / n1 - x0 / n0)
               / sqrt(((x0 + x1) / (n0 + n1))
                      * (1 - (x0 + x1) / (n0 + n1))
                      * (1 / n0 + 1 / n1)) AS z,
           abs((x1 / n1 - x0 / n0)
               / sqrt(((x0 + x1) / (n0 + n1))
                      * (1 - (x0 + x1) / (n0 + n1))
                      * (1 / n0 + 1 / n1))) > 1.959964 AS reject_05
    FROM s
"""

ORACLE_SQL["mannwhitney_weekend_value_events"] = """
    WITH v AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cents,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk
        FROM events),
    a AS (SELECT cents,
                 CAST(sum(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS c0,
                 CAST(sum(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS c1
          FROM v GROUP BY cents),
    w AS (SELECT c0, c1, c0 + c1 AS t,
                 coalesce(sum(c0 + c1) OVER (ORDER BY cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0.0) AS cum_before
          FROM a),
    s AS (SELECT sum(c0) AS n0, sum(c1) AS n1,
                 sum(c1 * (cum_before + (t + 1.0) / 2.0)) AS r1,
                 sum(t * t * t - t) AS tie
          FROM w)
    SELECT CAST(n0 AS BIGINT) AS n_weekday, CAST(n1 AS BIGINT) AS n_weekend,
           r1 - n1 * (n1 + 1.0) / 2.0 AS u1,
           (r1 - n1 * (n1 + 1.0) / 2.0 - n0 * n1 / 2.0)
               / sqrt(n0 * n1 / 12.0 * ((n0 + n1 + 1.0)
                      - tie / ((n0 + n1) * (n0 + n1 - 1.0)))) AS z,
           abs((r1 - n1 * (n1 + 1.0) / 2.0 - n0 * n1 / 2.0)
               / sqrt(n0 * n1 / 12.0 * ((n0 + n1 + 1.0)
                      - tie / ((n0 + n1) * (n0 + n1 - 1.0))))) > 1.959964
               AS reject_05
    FROM s
"""

ORACLE_SQL["sliding_3h_distinct_users"] = """
    WITH e AS (
        SELECT date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR
                   AS window_start,
               user_id
        FROM events, (VALUES (0), (1), (2)) k(k))
    SELECT window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM e GROUP BY window_start
"""

ORACLE_SQL["ks_weekend_value_events"] = """
    WITH v AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cents,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk
        FROM events),
    a AS (SELECT cents,
                 sum(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS c0
          FROM v GROUP BY cents),
    c AS (SELECT CAST(sum(c1) OVER (ORDER BY cents
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS f1,
                 CAST(sum(c0) OVER (ORDER BY cents
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS f0
          FROM a),
    n AS (SELECT CAST(sum(c0) AS DOUBLE) AS n0,
                 CAST(sum(c1) AS DOUBLE) AS n1 FROM a)
    SELECT CAST(n.n0 AS BIGINT) AS n_weekday,
           CAST(n.n1 AS BIGINT) AS n_weekend,
           max(abs(c.f1 / n.n1 - c.f0 / n.n0)) AS ks_d,
           1.358 * sqrt((n.n0 + n.n1) / (n.n0 * n.n1)) AS ks_crit,
           max(abs(c.f1 / n.n1 - c.f0 / n.n0))
               > 1.358 * sqrt((n.n0 + n.n1) / (n.n0 * n.n1)) AS reject_05
    FROM c, n GROUP BY n.n0, n.n1
"""

ORACLE_SQL["exact_quickselect_quantiles_lineitem"] = """
    SELECT CAST(count(*) AS BIGINT) AS n,
           quantile_disc(l_extendedprice, 0.5) AS q50,
           quantile_disc(l_extendedprice, 0.99) AS q99
    FROM lineitem WHERE l_extendedprice IS NOT NULL
"""

ORACLE_SQL["editdist2_pairs_suppliers"] = """
    SELECT a.s_suppkey AS a, b.s_suppkey AS b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
    FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 2
"""

# ---- v6 rule-family oracles (generated-CASE classify + regexp extraction,
# same protocol as the v2-v5 blocks) ----

ORACLE_SQL["dns_latency_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'dns_result=(ok|nxdomain|timeout)', 1) AS dns_result,
           count(*) AS n,
           round(avg(CAST(regexp_extract(text, 'ms=(\\d+)', 1) AS BIGINT)), 6) AS avg_ms,
           max(CAST(regexp_extract(text, 'ms=(\\d+)', 1) AS BIGINT)) AS max_ms
    FROM cls WHERE rule_id = 'R89_dns' GROUP BY 1
"""

ORACLE_SQL["tool_usage_credit_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, '\\[tool:([a-z_]+)\\]', 1) AS tool_name,
           count(*) AS n,
           round(sum(CAST(regexp_extract(text, 'credits=(\\d+\\.\\d+)', 1) AS DOUBLE)), 4) AS sum_credits,
           min(CAST(regexp_extract(text, 'quota_left=(\\d+\\.\\d+)', 1) AS DOUBLE)) AS min_quota_left
    FROM cls WHERE rule_id = 'R88_tool_usage' GROUP BY 1
"""

ORACLE_SQL["rebalance_flows_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'src=([a-z0-9-]+)', 1) AS src,
           regexp_extract(text, 'dst=([a-z0-9-]+)', 1) AS dst,
           count(*) AS n,
           sum(CAST(regexp_extract(text, 'moved=(\\d+)', 1) AS BIGINT)) AS sum_moved
    FROM cls WHERE rule_id = 'R93_rebalance' GROUP BY 1, 2
"""

ORACLE_SQL["cron_job_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'job=([a-z_]+)', 1) AS job,
           count(*) AS n,
           CAST(sum(CASE WHEN regexp_extract(text, 'cron_result=(ok|fail)', 1) = 'fail'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
           min(CAST(regexp_extract(text, 'next_s=(\\d+)', 1) AS BIGINT)) AS min_next_s
    FROM cls WHERE rule_id = 'R94_cron' GROUP BY 1
"""

ORACLE_SQL["snapshot_growth_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT count(*) AS n,
           sum(CAST(regexp_extract(text, 'bytes=(\\d+)', 1) AS BIGINT)) AS sum_bytes,
           max(CAST(regexp_extract(text, 'tables=(\\d+)', 1) AS BIGINT)) AS max_tables
    FROM cls WHERE rule_id = 'R92_snapshot'
"""

ORACLE_SQL["clock_skew_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    p AS (
        SELECT regexp_extract(text, 'peer=([a-z0-9.-]+)', 1) AS peer,
               CAST(regexp_extract(text, 'offset_ms=(-?\\d+)', 1) AS BIGINT) AS offset_ms
        FROM cls WHERE rule_id = 'R97_warn_clock')
    SELECT peer, count(*) AS n,
           min(offset_ms) AS min_offset_ms,
           max(offset_ms) AS max_offset_ms,
           max(abs(offset_ms)) AS max_abs_ms
    FROM p GROUP BY peer
"""

ORACLE_SQL["vote_breakdown_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'poll=([a-z_]+)', 1) AS poll,
           regexp_extract(text, 'option=([a-z]+)', 1) AS option,
           count(*) AS n
    FROM cls WHERE rule_id = 'R100_vote' GROUP BY 1, 2
"""

ORACLE_SQL["export_reliability_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'dest=([a-z_]+)', 1) AS dest,
           count(*) AS n,
           CAST(sum(CASE WHEN regexp_extract(text, 'ok=(true|false)', 1) = 'false'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
           sum(CAST(regexp_extract(text, 'events=(\\d+)', 1) AS BIGINT)) AS sum_events
    FROM cls WHERE rule_id = 'R98_export' GROUP BY 1
"""

# ---- cross-family proximity-correlation oracles (per-conversation
# interval correlation between two parsed families; same generated-CASE
# classify, correlation replayed as window self-joins) ----

ORACLE_SQL["gc_drop_proximity_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, turn_idx, role, text,
                        {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    g AS (SELECT conv_id, turn_idx,
                 CAST(regexp_extract(text, 'pause_ms=(\\d+)', 1) AS BIGINT) AS pause_ms
          FROM cls WHERE rule_id = 'R22_gc'),
    d AS (SELECT conv_id, turn_idx,
                 regexp_extract(text, 'kind=([A-Z_]+)', 1) AS kind
          FROM cls WHERE rule_id = 'R25_dropped'),
    pr AS (SELECT d.kind, d.conv_id, d.turn_idx, max(g.pause_ms) AS best_pause
           FROM d JOIN g ON g.conv_id = d.conv_id
                        AND g.turn_idx >= d.turn_idx - 5
                        AND g.turn_idx < d.turn_idx
           GROUP BY 1, 2, 3)
    SELECT d.kind, count(*) AS n_drops,
           CAST(sum(CASE WHEN p.best_pause IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near_gc,
           coalesce(max(p.best_pause), -1) AS max_near_pause_ms
    FROM d LEFT JOIN pr p ON p.conv_id = d.conv_id
                         AND p.turn_idx = d.turn_idx AND p.kind = d.kind
    GROUP BY 1
"""

ORACLE_SQL["throttle_pairing_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, turn_idx, role, text,
                        {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    t AS (SELECT conv_id, turn_idx,
                 regexp_extract(text, 'component=([a-z_]+)', 1) AS component,
                 regexp_extract(text, 'action=(pause|resume)', 1) AS action
          FROM cls WHERE rule_id = 'R72_throttle'),
    p AS (SELECT * FROM t WHERE action = 'pause'),
    r AS (SELECT * FROM t WHERE action = 'resume'),
    pair AS (SELECT r.conv_id, r.component, r.turn_idx,
                    max(p.turn_idx) AS p_turn
             FROM r JOIN p ON p.conv_id = r.conv_id
                          AND p.component = r.component
                          AND p.turn_idx < r.turn_idx
             GROUP BY 1, 2, 3)
    SELECT (SELECT count(*) FROM p) AS n_pauses,
           (SELECT count(*) FROM r) AS n_resumes,
           count(*) AS n_paired,
           coalesce(CAST(sum(turn_idx - p_turn) AS BIGINT), 0) AS sum_gap_turns,
           coalesce(CAST(max(turn_idx - p_turn) AS BIGINT), 0) AS max_gap_turns
    FROM pair
"""

ORACLE_SQL["incident_warn_context_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, turn_idx, role, text,
                        {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    i AS (SELECT conv_id, turn_idx FROM cls WHERE rule_id = 'R81_incident'),
    w AS (SELECT conv_id, turn_idx, rule_id FROM cls
          WHERE rule_id IN ('R27_warn_slow', 'R44_warn_context',
                            'R45_warn_oversize', 'R67_warn_backpressure',
                            'R70_warn_deprecated', 'R97_warn_clock')),
    nr AS (SELECT i.conv_id, i.turn_idx, max_by(w.rule_id, w.turn_idx) AS wr
           FROM i JOIN w ON w.conv_id = i.conv_id
                        AND w.turn_idx >= i.turn_idx - 8
                        AND w.turn_idx < i.turn_idx
           GROUP BY 1, 2)
    SELECT coalesce(nr.wr, 'none') AS warn_rule, count(*) AS n
    FROM i LEFT JOIN nr ON nr.conv_id = i.conv_id AND nr.turn_idx = i.turn_idx
    GROUP BY 1
"""

# ---- v7 rule-family oracles (same generated-CASE classify + regexp
# extraction protocol as the v2–v6 blocks) ----

ORACLE_SQL["gpu_utilization_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT CAST(regexp_extract(text, 'dev=(\\d+)', 1) AS BIGINT) AS dev,
           count(*) AS n,
           round(avg(CAST(regexp_extract(text, 'util_pct=(\\d+)', 1) AS BIGINT)), 6) AS avg_util_pct,
           max(CAST(regexp_extract(text, 'mem_used_mb=(\\d+)', 1) AS BIGINT)) AS max_mem_used_mb,
           max(CAST(regexp_extract(text, 'temp_c=(\\d+)', 1) AS BIGINT)) AS max_temp_c
    FROM cls WHERE rule_id = 'R115_gpu' GROUP BY 1
"""

ORACLE_SQL["oom_pressure_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    o AS (SELECT regexp_extract(text, 'victim=([a-z_]+)', 1) AS victim,
                 CAST(regexp_extract(text, 'rss_mb=(\\d+)', 1) AS BIGINT) AS rss_mb,
                 CAST(regexp_extract(text, 'limit_mb=(\\d+)', 1) AS BIGINT) AS limit_mb
          FROM cls WHERE rule_id = 'R107_oom')
    SELECT victim, count(*) AS n_ooms, max(rss_mb) AS max_rss_mb,
           round(avg(rss_mb - limit_mb), 6) AS avg_overshoot_mb
    FROM o GROUP BY 1
"""

ORACLE_SQL["flag_rollout_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'flag_name=([a-z_]+)', 1) AS flag_name,
           count(*) AS n,
           round(avg(CASE WHEN regexp_extract(text, 'enabled=(true|false)', 1) = 'true'
                          THEN 1 ELSE 0 END), 6) AS enabled_share,
           max(CAST(regexp_extract(text, 'rollout_pct=(\\d+)', 1) AS BIGINT)) AS max_rollout_pct
    FROM cls WHERE rule_id = 'R111_flag' GROUP BY 1
"""

ORACLE_SQL["tool_kill_signals_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    k AS (SELECT regexp_extract(text, 'sig=(SIG[A-Z]+)', 1) AS sig,
                 regexp_extract(text, '^\\[tool:([a-z_]+)\\]', 1) AS tool_name,
                 CAST(regexp_extract(text, 'rss_mb=(\\d+)', 1) AS BIGINT) AS rss_mb
          FROM cls WHERE rule_id = 'R105_tool_killed')
    SELECT sig, count(*) AS n_kills,
           count(DISTINCT tool_name) AS n_tools,
           max(rss_mb) AS max_rss_mb
    FROM k GROUP BY 1
"""

ORACLE_SQL["sampling_rollup_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT count(*) AS n,
           sum(CAST(regexp_extract(text, 'sampled_out=(\\d+)', 1) AS BIGINT)) AS sum_sampled_out,
           round(avg(CAST(regexp_extract(text, 'rate=(0\\.\\d{{4}})', 1) AS DOUBLE)), 6) AS avg_rate
    FROM cls WHERE rule_id = 'R110_sampling'
"""

# PII redaction: the SAME ordered RE2 pass chain as text.PII_PASSES,
# replayed progressively (each class counted on the output of the previous
# replacement, exactly like the engine) — every redacted byte value-checks.
_PII_EM = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_PH = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"

ORACLE_SQL["pii_redact_transcripts"] = f"""
    WITH u AS (SELECT conv_id, turn_idx, text FROM {_CORPUS}
               WHERE role = 'user'),
    s1 AS (SELECT conv_id, turn_idx,
                  CAST(length(regexp_extract_all(text, '{_PII_EM}')) AS BIGINT) AS n_email,
                  regexp_replace(text, '{_PII_EM}', '<EMAIL>', 'g') AS t1
           FROM u),
    s2 AS (SELECT conv_id, turn_idx, n_email,
                  CAST(length(regexp_extract_all(t1, '{_PII_IP}')) AS BIGINT) AS n_ip,
                  regexp_replace(t1, '{_PII_IP}', '<IP>', 'g') AS t2
           FROM s1)
    SELECT conv_id, turn_idx,
           regexp_replace(t2, '{_PII_PH}', '<PHONE>', 'g') AS redacted,
           n_email, n_ip,
           CAST(length(regexp_extract_all(t2, '{_PII_PH}')) AS BIGINT) AS n_phone
    FROM s2
"""

ORACLE_SQL["citation_hosts_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    c AS (SELECT regexp_extract(text, 'url=(https?://[a-z0-9./_-]+) title=', 1) AS url
          FROM cls WHERE rule_id = 'R13_citation'),
    h AS (SELECT url, regexp_extract(url, '^https?://([a-z0-9._-]+)', 1) AS host,
                 CAST(length(url) - length(replace(url, '/', '')) - 2 AS BIGINT) AS path_depth
          FROM c),
    pairs AS (SELECT host, url, count(*) AS n, max(path_depth) AS max_depth
              FROM h GROUP BY 1, 2)
    SELECT host, sum(n) AS n_citations, count(*) AS n_urls,
           max(max_depth) AS max_path_depth
    FROM pairs GROUP BY 1
"""

# Windowed spike detection: same gap semantics (lag over PRESENT buckets),
# same float op sequence ((r1+r2+r3)/3, 2.0*x) — doubles compare bit-exact.
ORACLE_SQL["tool_error_spikes_transcripts"] = f"""
    WITH cls AS (SELECT ts, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    t AS (SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) AS bucket,
                 CASE WHEN rule_id = 'R03_tool_result_err' THEN 1 ELSE 0 END AS is_err
          FROM cls
          WHERE rule_id IN ('R02_tool_result_ok', 'R03_tool_result_err')),
    b AS (SELECT bucket, count(*) AS n_tool,
                 CAST(sum(is_err) AS BIGINT) AS n_err
          FROM t GROUP BY 1),
    w AS (SELECT bucket, n_tool, n_err,
                 CAST(n_err AS DOUBLE) / n_tool AS err_rate,
                 lag(CAST(n_err AS DOUBLE) / n_tool, 1) OVER (ORDER BY bucket) AS r1,
                 lag(CAST(n_err AS DOUBLE) / n_tool, 2) OVER (ORDER BY bucket) AS r2,
                 lag(CAST(n_err AS DOUBLE) / n_tool, 3) OVER (ORDER BY bucket) AS r3
          FROM b)
    SELECT bucket, n_tool, n_err, err_rate,
           COALESCE(err_rate > 2.0 * ((r1 + r2 + r3) / 3.0), FALSE) AS spike
    FROM w
"""

# Enrich-stage oracle: lookup CASEs GENERATED from the same frozen tables
# the actors broadcast (enrich.ROLE_DICT / build_tool_dict) — one source
# of truth, same pattern as the rule CASE.

def _gen_enrich_cases() -> tuple[str, str, str]:
    from ..stages.enrich import ROLE_DICT, build_tool_dict

    role = ("CASE " + " ".join(
        f"WHEN role = '{r}' THEN '{grp}'" for r, (_, grp) in ROLE_DICT.items())
        + " ELSE 'unknown' END")
    td = build_tool_dict()
    tier = ("CASE " + " ".join(
        f"WHEN tool = '{t}' THEN '{v[0]}'" for t, v in td.items())
        + " ELSE 'unknown' END")
    cost = ("CASE " + " ".join(
        f"WHEN tool = '{t}' THEN {v[2]}" for t, v in td.items())
        + " ELSE NULL END")
    return role, tier, cost


_ROLE_GROUP_CASE, _TOOL_TIER_CASE, _COST_CLASS_CASE = _gen_enrich_cases()

ORACLE_SQL["enrich_breakdown_transcripts"] = f"""
    SELECT {_ROLE_GROUP_CASE} AS role_group,
           {_TOOL_TIER_CASE} AS tool_tier,
           count(*) AS n,
           sum({_COST_CLASS_CASE}) AS sum_cost
    FROM {_CORPUS} GROUP BY 1, 2
"""

# Tar-shard source: truth sidecar written next to the shards at pack time
# (member byte sizes, shard assignment, and the same decode truths).
ORACLE_SQL["tar_shard_decode_media"] = f"""
    SELECT media_id, shard, n_bytes,
           true_width AS width, true_height AS height,
           true_mean_luma AS mean_luma, true_ahash AS ahash
    FROM read_parquet('{_MEDIA}/tar/truth.parquet')
"""

ORACLE_SQL["bmp_features_media"] = f"""
    SELECT media_id, true_width AS width, true_height AS height,
           true_mean_luma AS mean_luma, true_ahash AS ahash
    FROM read_parquet('{_MEDIA}/bmp.parquet')
"""

ORACLE_SQL["png_features_media"] = f"""
    SELECT media_id, true_width AS width, true_height AS height,
           true_mean_luma AS mean_luma, true_ahash AS ahash
    FROM read_parquet('{_MEDIA}/png.parquet')
"""

# WARC source: truth sidecar written next to the shards at pack time
# (per-response host/status/body bytes/CRC32 and shard assignment).
ORACLE_SQL["warc_ingest_responses"] = f"""
    SELECT rec_id, shard, host, status, n_bytes, body_crc32
    FROM read_parquet('{_MEDIA}/warc/truth.parquet')
"""

# Hierarchy rollup: every path contributes to each ancestor prefix.
ORACLE_SQL["url_prefix_rollup_warc"] = f"""
    WITH p AS (SELECT path FROM
               read_parquet('{_MEDIA}/warc/truth.parquet')
               WHERE body_text IS NOT NULL)
    SELECT 1 AS depth, regexp_extract(path, '^(/[^/]*)', 1) AS prefix,
           count(*) AS n
    FROM p GROUP BY 2
    UNION ALL
    SELECT 2, regexp_extract(path, '^(/[^/]*/[^/]*)', 1), count(*)
    FROM p WHERE regexp_matches(path, '^/[^/]*/[^/]*')
    GROUP BY 2
"""

# Text extraction: expected text was BUILT from the fixture's word /
# anchor components at pack time (no parser involved); the distributed
# extractor must recover it from HTML bytes alone.
ORACLE_SQL["warc_text_extract"] = f"""
    SELECT rec_id, body_text AS text
    FROM read_parquet('{_MEDIA}/warc/truth.parquet')
    WHERE body_text IS NOT NULL
"""

# Access-log (CLF) lane: truth sidecar written beside the .log shards;
# the parser must re-derive every field from text alone.
# WARC host graph: the links.parquet sidecar records every ABSOLUTE
# planted href (relative hrefs are planted but unrecorded — the engine's
# host filter must drop them); the oracle never touches container bytes.
ORACLE_SQL["warc_link_hostgraph"] = f"""
    SELECT src_host,
           regexp_extract(target, '^https?://([^/]+)/', 1) AS tgt_host,
           count(*) AS n_links
    FROM read_parquet('{_MEDIA}/warc/links.parquet')
    GROUP BY 1, 2
"""

# Robots verdicts come from the fixture's hand-derived RFC 9309 matrix
# stored at pack time — never from the parser under test.
ORACLE_SQL["robots_filter_warc"] = f"""
    SELECT rec_id, host, path, robots_allowed AS robots_ok
    FROM read_parquet('{_MEDIA}/warc/truth.parquet')
    WHERE path <> '/robots.txt'
"""

# Crawl funnel: every stage count replayed from the sidecar alone —
# robots verdicts from the hand-derived matrix, dedup via a window rank
# over the stored body CRCs.
ORACLE_SQL["crawl_funnel_warc"] = f"""
    WITH t AS (SELECT * FROM read_parquet('{_MEDIA}/warc/truth.parquet')
               WHERE path <> '/robots.txt'),
    p AS (SELECT * FROM t WHERE status = 200 AND robots_allowed),
    d AS (SELECT count(*) AS n FROM (
            SELECT row_number() OVER (PARTITION BY body_crc32
                                      ORDER BY rec_id) AS rn FROM p)
          WHERE rn = 1)
    SELECT 'responses' AS stage, CAST(count(*) AS BIGINT) AS n FROM t
    UNION ALL
    SELECT 'http_200', CAST(count(*) AS BIGINT) FROM t WHERE status = 200
    UNION ALL
    SELECT 'robots_ok', CAST(count(*) AS BIGINT) FROM p
    UNION ALL
    SELECT 'unique_body', CAST(n AS BIGINT) FROM d
"""

ORACLE_SQL["access_log_ingest"] = f"""
    SELECT ts_us, ip, user, method, path, status, n_bytes, agent
    FROM read_parquet('{_MEDIA}/accesslog/truth.parquet')
"""

ORACLE_SQL["logfmt_ingest"] = f"""
    SELECT ts_us, level, svc, conv, turn, msg, dur_ms,
           CAST(ok AS BIGINT) AS ok
    FROM read_parquet('{_MEDIA}/logfmt/truth.parquet')
"""

ORACLE_SQL["logfmt_svc_level_stats"] = f"""
    SELECT svc, level, count(*) AS n,
           CAST(sum(CASE WHEN ok = false THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail,
           CAST(coalesce(sum(dur_ms), 0) AS BIGINT) AS total_ms
    FROM read_parquet('{_MEDIA}/logfmt/truth.parquet')
    GROUP BY 1, 2
"""

ORACLE_SQL["access_log_subnet_rollup"] = f"""
    SELECT regexp_extract(ip, '^(\\d{{1,3}}\\.\\d{{1,3}})\\.', 1)
               AS subnet,
           count(*) AS n_req,
           CAST(coalesce(sum(n_bytes), 0) AS BIGINT) AS total_bytes,
           CAST(sum(CASE WHEN status >= 500 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_5xx
    FROM read_parquet('{_MEDIA}/accesslog/truth.parquet')
    GROUP BY 1
"""

ORACLE_SQL["churn_features_users"] = """
    WITH obs AS (
        SELECT user_id, count(*) AS n_events,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS n_purchase,
               count(DISTINCT date_trunc('day', ts)) AS days_active,
               CAST(floor(date_part('epoch', date_trunc('day', max(ts)))
                    / 86400) AS BIGINT) AS last_day
        FROM events WHERE ts < TIMESTAMP '2024-01-21'
        GROUP BY user_id),
    held AS (
        SELECT user_id, 1 AS label_active FROM events
        WHERE ts >= TIMESTAMP '2024-01-24' GROUP BY user_id)
    SELECT obs.user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_purchase AS BIGINT) AS n_purchase,
           CAST(days_active AS BIGINT) AS days_active,
           CAST(floor(date_part('epoch', TIMESTAMP '2024-01-20')
                / 86400) AS BIGINT) - last_day AS recency_days,
           CAST(coalesce(held.label_active, 0) AS BIGINT)
               AS label_active
    FROM obs LEFT JOIN held ON obs.user_id = held.user_id
"""

ORACLE_SQL["logfmt_conv_traces"] = f"""
    SELECT conv, count(*) AS n,
           CAST(sum(CASE WHEN level = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_err,
           CAST(coalesce(sum(dur_ms), 0) AS BIGINT) AS total_ms,
           CAST(min(turn) AS BIGINT) AS min_turn,
           CAST(max(turn) AS BIGINT) AS max_turn
    FROM read_parquet('{_MEDIA}/logfmt/truth.parquet')
    GROUP BY conv
"""

ORACLE_SQL["syslog_ingest"] = f"""
    SELECT ts_us, facility, severity, host, app, procid, msgid, n_sd,
           conv, turn, msg
    FROM read_parquet('{_MEDIA}/syslog/truth.parquet')
"""

ORACLE_SQL["syslog_severity_rollup"] = f"""
    SELECT app, count(*) AS n,
           CAST(sum(CASE WHEN severity <= 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_err_class
    FROM read_parquet('{_MEDIA}/syslog/truth.parquet')
    GROUP BY app
"""

ORACLE_SQL["access_log_status_rollup"] = f"""
    SELECT method, CAST(status // 100 AS VARCHAR) || 'xx' AS status_class,
           count(*) AS n_req,
           CAST(coalesce(sum(n_bytes), 0) AS BIGINT) AS total_bytes
    FROM read_parquet('{_MEDIA}/accesslog/truth.parquet')
    GROUP BY 1, 2
"""

# Avro source: truth sidecar written next to the container shards at
# pack time (per-record enum/union/array/map/fixed truths); the reader
# must re-derive every column from container bytes alone.
ORACLE_SQL["avro_ingest_turns"] = f"""
    SELECT shard, conv_id, turn_idx, role, tool, n_chars, ts_micros,
           score, n_flags, attr_sum, fp_hex
    FROM read_parquet('{_MEDIA}/avro/truth.parquet')
"""

ORACLE_SQL["webp_features_media"] = f"""
    SELECT media_id, true_width AS width, true_height AS height,
           true_mean_luma AS mean_luma, true_ahash AS ahash
    FROM read_parquet('{_MEDIA}/webpl.parquet')
"""

ORACLE_SQL["webp_resize_media"] = f"""
    SELECT media_id, true_thumb_w AS thumb_w, true_thumb_h AS thumb_h,
           true_thumb_luma AS thumb_luma, true_thumb_ahash AS thumb_ahash
    FROM read_parquet('{_MEDIA}/webpl.parquet')
"""

ORACLE_SQL["flac_features_media"] = f"""
    SELECT media_id, true_duration_ms AS duration_ms,
           true_rms_db AS rms_db, true_zcr AS zcr
    FROM read_parquet('{_MEDIA}/flac.parquet')
"""

ORACLE_SQL["mp3_meta_media"] = f"""
    SELECT media_id, true_n_frames AS n_frames,
           true_duration_ms AS duration_ms, true_kbps_sum AS kbps_sum,
           true_sample_rate AS sample_rate
    FROM read_parquet('{_MEDIA}/mp3.parquet')
"""

ORACLE_SQL["mp4_meta_media"] = f"""
    SELECT media_id, true_duration_ms AS duration_ms,
           true_n_tracks AS n_tracks, true_n_video AS n_video,
           true_n_audio AS n_audio, true_max_width AS max_width,
           true_max_height AS max_height
    FROM read_parquet('{_MEDIA}/mp4.parquet')
"""

ORACLE_SQL["webp_meta_media"] = f"""
    SELECT media_id, true_width AS width, true_height AS height,
           true_variant AS variant, true_has_alpha AS has_alpha
    FROM read_parquet('{_MEDIA}/webp.parquet')
"""

ORACLE_SQL["jpeg_features_media"] = f"""
    SELECT media_id, true_width AS width, true_height AS height,
           true_mean_luma AS mean_luma, true_ahash AS ahash
    FROM read_parquet('{_MEDIA}/jpeg.parquet')
"""

ORACLE_SQL["jpeg_resize_media"] = f"""
    SELECT media_id, true_thumb_w AS thumb_w, true_thumb_h AS thumb_h,
           true_thumb_luma AS thumb_luma, true_thumb_ahash AS thumb_ahash
    FROM read_parquet('{_MEDIA}/jpeg.parquet')
"""

# ---- v8 rule-family oracles (same generated-CASE classify + regexp
# extraction protocol; the duration spans replay as TRY_CAST + coalesce
# unit arithmetic — non-participating optional groups extract as '' and
# TRY_CAST('') is NULL, which coalesces to 0 exactly like the engine) ----

_DUR_H = "coalesce(TRY_CAST(regexp_extract(text, '{tok}=(?:(\\d+)h)?(?:(\\d+)m)?(\\d+)s', 1) AS BIGINT), 0) * 3600"
_DUR_M = "coalesce(TRY_CAST(regexp_extract(text, '{tok}=(?:(\\d+)h)?(?:(\\d+)m)?(\\d+)s', 2) AS BIGINT), 0) * 60"
_DUR_S = "TRY_CAST(regexp_extract(text, '{tok}=(?:(\\d+)h)?(?:(\\d+)m)?(\\d+)s', 3) AS BIGINT)"


def _dur_sql(tok: str) -> str:
    """Total-seconds replay of the engine's 'duration' converter for a
    ``<tok>=<span>`` capture."""
    return ("(" + _DUR_H.format(tok=tok) + " + " + _DUR_M.format(tok=tok)
            + " + " + _DUR_S.format(tok=tok) + ")")


ORACLE_SQL["backup_duration_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    b AS (SELECT regexp_extract(text, 'dest=([a-z_]+)', 1) AS dest,
                 CAST(regexp_extract(text, 'size_mb=(\\d+)', 1) AS BIGINT) AS size_mb,
                 {_dur_sql('took')} AS took_s
          FROM cls WHERE rule_id = 'R123_backup')
    SELECT dest, count(*) AS n, sum(size_mb) AS sum_size_mb,
           round(avg(took_s), 6) AS avg_took_s, max(took_s) AS max_took_s
    FROM b GROUP BY 1
"""

ORACLE_SQL["tool_uptime_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    u AS (SELECT regexp_extract(text, '^\\[tool:([a-z_]+)\\]', 1) AS tool_name,
                 {_dur_sql('up')} AS up_s
          FROM cls WHERE rule_id = 'R122_tool_uptime')
    SELECT tool_name, count(*) AS n, max(up_s) AS max_up_s,
           round(avg(up_s), 6) AS avg_up_s
    FROM u GROUP BY 1
"""

ORACLE_SQL["webhook_health_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    w AS (SELECT regexp_extract(text, 'endpoint=([a-z_]+)', 1) AS endpoint,
                 CAST(regexp_extract(text, 'status=(\\d{{3}})', 1) AS BIGINT) AS status,
                 CAST(regexp_extract(text, 'attempt=(\\d+)', 1) AS BIGINT) AS attempt
          FROM cls WHERE rule_id = 'R127_webhook')
    SELECT endpoint, count(*) AS n,
           round(avg(CASE WHEN status >= 400 THEN 1 ELSE 0 END), 6) AS fail_share,
           max(attempt) AS max_attempt
    FROM w GROUP BY 1
"""

ORACLE_SQL["cpu_load_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT count(*) AS n,
           round(avg(CAST(regexp_extract(text, 'load1=(\\d+\\.\\d{{2}})', 1) AS DOUBLE)), 6) AS avg_load1,
           max(CAST(regexp_extract(text, 'load5=(\\d+\\.\\d{{2}})', 1) AS DOUBLE)) AS max_load5,
           max(CAST(regexp_extract(text, 'procs=(\\d+)', 1) AS BIGINT)) AS max_procs
    FROM cls WHERE rule_id = 'R126_cpu'
"""

ORACLE_SQL["cert_expiry_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT regexp_extract(text, 'cn=([a-z0-9.-]+)', 1) AS cn,
           count(*) AS n_warnings,
           min(CAST(regexp_extract(text, 'days_left=(\\d+)', 1) AS BIGINT)) AS min_days_left
    FROM cls WHERE rule_id = 'R129_warn_cert' GROUP BY 1
"""

ORACLE_SQL["form_funnel_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS})
    SELECT count(*) AS n,
           round(avg(CASE WHEN regexp_extract(text, 'submitted=(true|false)', 1) = 'true'
                          THEN 1 ELSE 0 END), 6) AS submitted_share,
           round(avg(CAST(regexp_extract(text, 'fields=(\\d+)', 1) AS BIGINT)), 6) AS avg_fields
    FROM cls WHERE rule_id = 'R133_form'
"""

ORACLE_SQL["diffstat_churn_transcripts"] = f"""
    WITH cls AS (SELECT conv_id, text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    d AS (SELECT conv_id,
                 CAST(regexp_extract(text, 'insertions=(\\d+)', 1) AS BIGINT)
                 + CAST(regexp_extract(text, 'deletions=(\\d+)', 1) AS BIGINT) AS churn
          FROM cls WHERE rule_id = 'R116_diffstat')
    SELECT conv_id, count(*) AS n_diffs, sum(churn) AS total_churn,
           max(churn) AS max_churn
    FROM d GROUP BY 1
"""

# ---- v9 rule-family oracles ----

ORACLE_SQL["maintenance_windows_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    m AS (SELECT regexp_extract(text, 'mwindow=([a-z_]+)', 1) AS mwindow,
                 {_dur_sql('expected')} AS expected_s
          FROM cls WHERE rule_id = 'R146_maintenance')
    SELECT mwindow, count(*) AS n, round(avg(expected_s), 6) AS avg_expected_s,
           max(expected_s) AS max_expected_s
    FROM m GROUP BY 1
"""

ORACLE_SQL["download_hosts_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    d AS (SELECT regexp_extract(text, 'host=([a-z0-9.-]+)', 1) AS dl_host,
                 CAST(regexp_extract(text, 'bytes=(\\d+)', 1) AS BIGINT) AS bytes,
                 CAST(regexp_extract(text, 'http=(\\d{{3}})', 1) AS BIGINT) AS http
          FROM cls WHERE rule_id = 'R140_tool_download')
    SELECT dl_host, count(*) AS n, sum(bytes) AS sum_bytes,
           round(avg(CASE WHEN http < 400 THEN 1 ELSE 0 END), 6) AS ok_share
    FROM d GROUP BY 1
"""

ORACLE_SQL["fd_pressure_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    fd AS (SELECT CAST(regexp_extract(text, 'open_fds=(\\d+)', 1) AS BIGINT) AS open_fds,
                  CAST(regexp_extract(text, 'max_fds=(\\d+)', 1) AS BIGINT) AS max_fds
           FROM cls WHERE rule_id = 'R148_fdlimit')
    SELECT count(*) AS n, max(open_fds) AS max_open_fds,
           max(CAST(open_fds AS DOUBLE) / CAST(max_fds AS DOUBLE)) AS max_util
    FROM fd
"""

ORACLE_SQL["reminder_horizon_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    r AS (SELECT {_dur_sql('in')} AS remind_s
          FROM cls WHERE rule_id = 'R150_reminder')
    SELECT count(*) AS n, round(avg(remind_s), 6) AS avg_remind_s,
           max(remind_s) AS max_remind_s
    FROM r
"""

# ---- v10 size-converter oracles. The 'size' converter replay: bytes =
# whole*mult + frac3*mult // 1000, where frac3 right-pads the fraction to
# 3 digits (rpad; a non-participating group extracts as '' -> rpad '000'
# -> 0) and // is DuckDB integer division — exactly the engine's integer
# decomposition, so the sums are bit-identical, not float-close. ----

_SIZE_PAT = r"size=(\d{1,6})(?:\.(\d{1,3}))?(B|KiB|MiB|GiB|TiB)"


def _size_sql() -> str:
    unit = f"regexp_extract(text, '{_SIZE_PAT}', 3)"
    mult = (f"CASE {unit} WHEN 'B' THEN 1 WHEN 'KiB' THEN 1024 "
            "WHEN 'MiB' THEN 1048576 WHEN 'GiB' THEN 1073741824 "
            "WHEN 'TiB' THEN 1099511627776 END")
    whole = f"CAST(regexp_extract(text, '{_SIZE_PAT}', 1) AS BIGINT)"
    frac3 = (f"coalesce(TRY_CAST(rpad(regexp_extract(text, '{_SIZE_PAT}', 2),"
             " 3, '0') AS BIGINT), 0)")
    return f"({whole} * ({mult}) + ({frac3} * ({mult})) // 1000)"


ORACLE_SQL["sstable_write_stats_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    s AS (SELECT CAST(regexp_extract(text, 'lvl=(\\d)', 1) AS BIGINT) AS lvl,
                 {_size_sql()} AS size_bytes,
                 {_dur_sql('took')} AS took_s
          FROM cls WHERE rule_id = 'R151_sstable')
    SELECT lvl, count(*) AS n, sum(size_bytes) AS sum_bytes,
           max(size_bytes) AS max_bytes, round(avg(took_s), 6) AS avg_took_s
    FROM s GROUP BY 1
"""

ORACLE_SQL["upload_volume_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    u AS (SELECT regexp_extract(text, 'kind=([a-z]+)', 1) AS kind,
                 CASE WHEN regexp_matches(text, '{_SIZE_PAT}$')
                      THEN {_size_sql()} END AS size_bytes
          FROM cls WHERE rule_id = 'R152_upload')
    SELECT kind, count(*) AS n,
           sum(size_bytes) AS sum_bytes, max(size_bytes) AS max_bytes
    FROM u GROUP BY 1
"""

ORACLE_SQL["tool_fetch_hosts_transcripts"] = f"""
    WITH cls AS (SELECT text, {_RULE_CASE} AS rule_id FROM {_CORPUS}),
    f AS (SELECT regexp_extract(text, 'host=([a-z0-9.-]+)', 1) AS host,
                 {_size_sql()} AS size_bytes
          FROM cls WHERE rule_id = 'R153_tool_fetch')
    SELECT host, count(*) AS n, sum(size_bytes) AS sum_bytes
    FROM f GROUP BY 1
"""

ORACLE_SQL["mulaw_features_media"] = f"""
    SELECT media_id, true_duration_ms AS duration_ms,
           true_rms_db AS rms_db, true_zcr AS zcr
    FROM read_parquet('{_MEDIA}/mulaw.parquet')
"""

ORACLE_SQL["gif_features_media"] = f"""
    SELECT media_id, true_width AS width, true_height AS height,
           true_mean_luma AS mean_luma, true_ahash AS ahash
    FROM read_parquet('{_MEDIA}/gif.parquet')
"""

# Phrase-blocklist gate: both engines are RE2, so the oracle replays the
# SAME alternation (imported from the op — one source of truth) with
# regexp_extract_all; non-overlapping scan semantics agree by engine.
from ..ops.blocklist import blocklist_pattern as _bl_pat  # noqa: E402
from .queries import BLOCK_PHRASES as _BLOCK  # noqa: E402

ORACLE_SQL["blocklist_filter_documents"] = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                '{_bl_pat(list(_BLOCK))}')) AS BIGINT) AS n_hits,
           len(regexp_extract_all(lower(coalesce(text, '')),
                '{_bl_pat(list(_BLOCK))}')) > 0 AS blocked
    FROM documents
"""

# Temperature upsampling: integer repeat factors (floor(sqrt(N//n)) ==
# math.isqrt for int64 < 2^52 — correctly-rounded IEEE sqrt of an
# integer can never cross the next integer) → generate_series replay.
ORACLE_SQL["temperature_upsample_documents"] = """
    WITH c AS (SELECT lang, count(*) AS n,
                      (SELECT count(*) FROM documents) AS tot
               FROM documents GROUP BY lang),
    r AS (SELECT lang,
                 greatest(1, CAST(floor(sqrt(CAST(tot // n AS DOUBLE)))
                                  AS BIGINT)) AS rep
          FROM c)
    SELECT d.doc_id, d.lang, u.epoch
    FROM documents d
    JOIN r USING (lang),
         unnest(generate_series(0, r.rep - 1)) AS u(epoch)
"""

# Quality-percentile gate: reuses the exact quality formula above (same
# _NSTOP RE2 counts) + per-lang quantile_cont(0.25); the threshold is
# compared but never emitted, so interpolation ulps can't flip rows.
ORACLE_SQL["quality_percentile_gate_documents"] = f"""
    WITH b AS (
        SELECT doc_id, lang,
               CAST(length(text) AS DOUBLE) AS chars,
               CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
                   AS npunct,
               CAST({_NSTOP} AS DOUBLE) AS nstop,
               greatest(CAST(len(regexp_extract_all(
                   lower(coalesce(text, '')), '[a-z]+')) AS DOUBLE), 1.0)
                   AS nalpha
        FROM documents),
    q AS (
        SELECT doc_id, lang,
               round(least(chars / 200.0, 1.0)
                     * (1.0 - least(npunct / greatest(chars, 1.0) * 2.0,
                                    1.0))
                     * (0.5 + (nstop / nalpha) * 0.5), 6) AS quality
        FROM b),
    thr AS (SELECT lang, quantile_cont(quality, 0.25) AS t
            FROM q GROUP BY lang)
    SELECT q.doc_id, q.lang, q.quality
    FROM q JOIN thr USING (lang)
    WHERE q.quality >= thr.t
"""


# ---- round 4: the last 22 rows-only registrations become value-checked
# ---- invariant rows (int columns recomputed independently here; bool
# ---- flags verified Ray-side — a false flag hash-mismatches).

ORACLE_SQL["random_sample_events"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           TRUE AS sampled_in_bounds_ok, TRUE AS distinct_ok,
           TRUE AS subset_ok
    FROM events
"""

ORACLE_SQL["shuffled_documents_sample"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(least(100, count(*)) AS BIGINT) AS n_sampled,
           TRUE AS distinct_ok, TRUE AS subset_ok
    FROM documents
"""

ORACLE_SQL["compression_ratio_documents"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS ratio_bounds_ok, TRUE AS templated_compresses_ok
    FROM documents
"""

ORACLE_SQL["rolling_fingerprint_documents"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT regexp_replace(
               trim(coalesce(text, '')), '\\s+', ' ', 'g')) AS BIGINT)
               AS n_distinct_norm_texts,
           TRUE AS fp_injective_ok, TRUE AS fp_count_matches_ok
    FROM documents
"""

ORACLE_SQL["minhash_dedup_documents"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_text,
           TRUE AS coverage_ok, TRUE AS one_keep_per_cluster_ok,
           TRUE AS keep_is_min_id_ok, TRUE AS kept_le_distinct_ok
    FROM documents
"""

ORACLE_SQL["simhash_dedup_documents"] = ORACLE_SQL["minhash_dedup_documents"]

ORACLE_SQL["embedding_neardup_pairs"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           TRUE AS coverage_ok, TRUE AS one_keep_per_cluster_ok,
           TRUE AS keep_is_min_id_ok, TRUE AS kept_le_n_ok
    FROM embeddings
"""

ORACLE_SQL["semdedup_embeddings"] = ORACLE_SQL["embedding_neardup_pairs"]

ORACLE_SQL["ngram_dup_pairs_documents"] = """
    WITH g AS (
        SELECT count(*) AS c FROM documents
        GROUP BY text HAVING count(*) > 1)
    SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
           CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT)
               AS n_exactdup_pairs,
           TRUE AS contains_exactdup_pairs_ok, TRUE AS pairs_ordered_ok,
           TRUE AS jaccard_ge_threshold_ok, TRUE AS ids_known_ok
    FROM g
"""

ORACLE_SQL["fuzzy_decontaminate_documents"] = """
    SELECT CAST(count(*) FILTER (doc_id % 25 <> 0) AS BIGINT) AS n_train,
           CAST(count(*) FILTER (doc_id % 25 = 0) AS BIGINT) AS n_bench,
           TRUE AS train_side_ok, TRUE AS bench_side_ok,
           TRUE AS jaccard_ge_threshold_ok, TRUE AS flagged_lt_train_ok
    FROM documents
"""

ORACLE_SQL["ivf_ann_embeddings"] = """
    SELECT CAST(3 AS BIGINT) AS n_queries,
           CAST(3 * least(10, count(*)) AS BIGINT) AS n_result_rows,
           TRUE AS ranks_contiguous_ok, TRUE AS neighbors_distinct_ok,
           TRUE AS self_is_top1_ok
    FROM embeddings
"""

ORACLE_SQL["kmeans_embeddings"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           TRUE AS k_le_ok, TRUE AS all_assigned_ok,
           TRUE AS labels_in_range_ok, TRUE AS assignment_optimal_ok,
           TRUE AS cohesion_beats_global_ok
    FROM embeddings
"""

ORACLE_SQL["pca_embeddings"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           TRUE AS orthonormal_ok, TRUE AS variance_sorted_ok,
           TRUE AS projections_finite_ok,
           TRUE AS eigenvalue_matches_variance_ok
    FROM embeddings
"""

ORACLE_SQL["bpe_tokens_documents"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\\s+')))
                AS BIGINT) AS total_words,
           TRUE AS bpe_in_bounds_ok
    FROM documents
"""

ORACLE_SQL["dsir_scores_documents"] = """
    SELECT CAST(count(*) FILTER (doc_id % 25 <> 0) AS BIGINT) AS n_raw,
           TRUE AS scored_eq_raw_ok, TRUE AS topk_size_ok,
           TRUE AS topk_raw_side_ok, TRUE AS scores_finite_ok,
           TRUE AS topk_sorted_ok
    FROM documents
"""

_WS_TOKENS = """CASE WHEN trim(text) = '' THEN 0
    ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
    END"""

ORACLE_SQL["pack_documents_tokens"] = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum({_WS_TOKENS}), 0) AS BIGINT) AS total_tokens,
           TRUE AS coverage_ok, TRUE AS budget_ok, TRUE AS min_packs_ok
    FROM documents
"""

ORACLE_SQL["curriculum_pack_documents"] = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum({_WS_TOKENS}), 0) AS BIGINT) AS total_tokens,
           TRUE AS coverage_ok, TRUE AS budget_ok,
           TRUE AS curriculum_order_ok
    FROM documents
"""

# training_prep_documents: deterministic prefix replayed exactly (the
# r3 training_prep_prefix CTEs); block-dependent packing contributes
# the ok flag on its coverage row.
ORACLE_SQL["training_prep_documents"] = f"""
    WITH q AS (
        SELECT doc_id, text, lang,
               least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
               * (1.0 - least(CAST(len(regexp_extract_all(text, '[^\\w\\s]'))
                                   AS DOUBLE)
                              / greatest(CAST(length(text) AS DOUBLE), 1.0)
                              * 2.0, 1.0))
               * (0.5 + (CAST({_NSTOP} AS DOUBLE)
                         / greatest(CAST(len(regexp_extract_all(
                               lower(coalesce(text, '')), '[a-z]+'))
                               AS DOUBLE), 1.0)) * 0.5) AS quality
        FROM documents),
    good AS (SELECT doc_id, text, lang FROM q WHERE quality >= 0.3),
    kept AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY text),
    keptrows AS (
        SELECT g.doc_id, g.text, g.lang FROM good g
        JOIN kept k ON g.doc_id = k.doc_id),
    sampled AS (
        SELECT * FROM keptrows
        WHERE strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
              < CASE WHEN lang = 'en' THEN 8 ELSE 1 END)
    SELECT 'input' AS stage,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_rows,
           TRUE AS ok
    UNION ALL SELECT 'quality',
           CAST((SELECT count(*) FROM good) AS BIGINT), TRUE
    UNION ALL SELECT 'exact_dedup',
           CAST((SELECT count(*) FROM keptrows) AS BIGINT), TRUE
    UNION ALL SELECT 'mixture',
           CAST((SELECT count(*) FROM sampled) AS BIGINT), TRUE
    UNION ALL SELECT 'sampled_tokens',
           CAST((SELECT coalesce(sum({_WS_TOKENS}), 0) FROM sampled)
                AS BIGINT), TRUE
    UNION ALL SELECT 'packed',
           CAST((SELECT count(*) FROM sampled) AS BIGINT), TRUE
"""

ORACLE_SQL["webcrawl_cleanup_documents"] = f"""
    WITH l AS ({ORACLE_SQL["langid_documents"]}),
    q AS (
        SELECT doc_id,
               least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
               * (1.0 - least(CAST(len(regexp_extract_all(text, '[^\\w\\s]'))
                                   AS DOUBLE)
                              / greatest(CAST(length(text) AS DOUBLE), 1.0)
                              * 2.0, 1.0))
               * (0.5 + (CAST({_NSTOP} AS DOUBLE)
                         / greatest(CAST(len(regexp_extract_all(
                               lower(coalesce(text, '')), '[a-z]+'))
                               AS DOUBLE), 1.0)) * 0.5) AS quality
        FROM documents),
    en AS (
        SELECT d.doc_id, d.text FROM documents d
        JOIN l ON l.doc_id = d.doc_id WHERE l.lang_pred = 'en'),
    good AS (
        SELECT en.doc_id, en.text FROM en
        JOIN q ON q.doc_id = en.doc_id WHERE q.quality > 0.2),
    kept AS (SELECT min(doc_id) AS k FROM good GROUP BY text)
    SELECT 'input' AS stage,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_rows,
           TRUE AS ok
    UNION ALL SELECT 'lang_en',
           CAST((SELECT count(*) FROM en) AS BIGINT), TRUE
    UNION ALL SELECT 'quality',
           CAST((SELECT count(*) FROM good) AS BIGINT), TRUE
    UNION ALL SELECT 'exact_dedup',
           CAST((SELECT count(*) FROM kept) AS BIGINT), TRUE
    UNION ALL SELECT 'decontaminated_bound',
           CAST((SELECT count(*) FROM kept WHERE k % 25 <> 0) AS BIGINT),
           TRUE
"""

ORACLE_SQL["training_prep_transcripts"] = f"""
    WITH r AS (
        SELECT conv_id,
               string_agg(role || ': ' || text, chr(10)
                          ORDER BY turn_idx) AS rendered
        FROM {_CORPUS} GROUP BY conv_id),
    d AS (SELECT DISTINCT rendered FROM r)
    SELECT 'conversations' AS stage,
           CAST((SELECT count(*) FROM r) AS BIGINT) AS n_rows,
           TRUE AS ok
    UNION ALL SELECT 'exact_dedup',
           CAST((SELECT count(*) FROM d) AS BIGINT), TRUE
    UNION ALL SELECT 'rendered_tokens',
           CAST((SELECT coalesce(sum(len(regexp_extract_all(
               rendered, '\\S+'))), 0) FROM d) AS BIGINT), TRUE
    UNION ALL SELECT 'packed',
           CAST((SELECT count(*) FROM d) AS BIGINT), TRUE
"""

ORACLE_SQL["multimodal_decode_features"] = """
    SELECT CAST(256 AS BIGINT) AS n_media, TRUE AS coverage_ok,
           TRUE AS dims_positive_ok, TRUE AS decode_deterministic_ok
"""

ORACLE_SQL["multimodal_resize_thumbs"] = """
    SELECT CAST(256 AS BIGINT) AS n_media, TRUE AS coverage_ok,
           TRUE AS clamped_ok, TRUE AS no_upscale_ok,
           TRUE AS payload_nonempty_ok
"""


# Declarative-plan twins (query_dsl.PLANS): same oracle as the
# hand-written query they re-express.
for _n in ("grouped_count_events", "grouped_agg_events",
           "sort_limit_events", "topk_users_by_value",
           "distinct_event_types", "customers_without_big_orders",
           "join_customer_nation_region", "pricing_summary_lineitem",
           "lead_value_events", "ntile_value_quartiles",
           # r5: union / outer+left join / having / as-of steps
           "union_purchases_errors", "union_distinct_users",
           "purchase_error_outer_join", "customer_order_counts",
           "q18_large_volume_customers", "asof_purchase_prior_click",
           "asof_tolerance_purchase_click",
           "asof_view_prior_purchase_dist",
           # r5: remaining window-fn steps
           "lag_gap_events", "moving_avg_user_events",
           "top3_events_per_type", "session_counts_events"):
    ORACLE_SQL[f"dsl_{_n}"] = ORACLE_SQL[_n]


ORACLE_SQL["pq_ann_recall_embeddings"] = """
    SELECT CAST(3 AS BIGINT) AS n_queries,
           TRUE AS raw_min_recall_ok, TRUE AS raw_mean_recall_ok,
           TRUE AS rerank_min_recall_ok
"""


ORACLE_SQL["ivfpq_ann_recall_embeddings"] = """
    SELECT CAST(3 AS BIGINT) AS n_queries,
           TRUE AS min_recall_ok, TRUE AS mean_recall_ok
"""


ORACLE_SQL["opq_gain_embeddings"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           TRUE AS r_orthonormal_ok, TRUE AS sample_err_le_plain_ok,
           TRUE AS corpus_mse_le_plain_ok
    FROM embeddings
"""


ORACLE_SQL["ddsketch_value_quantiles_by_type"] = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           TRUE AS p50_in_bound_ok, TRUE AS p90_in_bound_ok,
           TRUE AS p99_in_bound_ok, TRUE AS no_saturation_ok
    FROM events GROUP BY event_type
"""


ORACLE_SQL["benford_first_digit_events"] = """
    WITH cents AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
        WHERE CAST(round(value * 100) AS BIGINT) > 0),
    cells AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(count(*) AS BIGINT) AS observed
        FROM cents GROUP BY 1),
    t AS (SELECT sum(observed) AS total FROM cells)
    SELECT digit, observed,
           round(CAST(total AS DOUBLE)
                 * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)
               AS expected,
           round((CAST(observed AS DOUBLE)
                  - CAST(total AS DOUBLE)
                    * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                 * (CAST(observed AS DOUBLE)
                    - CAST(total AS DOUBLE)
                      * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
                 / (CAST(total AS DOUBLE)
                    * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6)
               AS chi2_contrib
    FROM cells, t
"""


ORACLE_SQL["lorenz_value_deciles_events"] = """
    WITH totals AS (
        SELECT user_id,
               sum(CAST(round(value * 100) AS BIGINT)) AS total_c
        FROM events GROUP BY user_id),
    tiled AS (
        SELECT total_c,
               ntile(10) OVER (ORDER BY total_c, user_id) AS decile
        FROM totals)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(total_c) AS BIGINT) AS decile_cents
    FROM tiled GROUP BY decile
"""
