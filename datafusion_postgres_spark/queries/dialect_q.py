"""Postgres-dialect queries run through the transpiler (SURVEY.md §2.11).

These enter as Postgres SQL, go through ``PostgresTranspiler`` (ANY/ALL
lowering, array literals, regex operators, ``::`` casts, type renames,
function renames), execute on Spark, and are verified against DuckDB
running the equivalent ANSI form.
"""

from __future__ import annotations

from datafusion_postgres_spark.queries import pg_sql, register


@register("pg_any_array_literal", oracle="""
SELECT n_nationkey, n_name FROM nation
WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_19') ORDER BY n_nationkey
""")
def pg_any(spark, sf_dir):
    return pg_sql(spark, sf_dir, """
        SELECT n_nationkey, n_name FROM nation
        WHERE n_name = ANY('{NATION_1,NATION_5,NATION_19}') ORDER BY n_nationkey
    """, ("nation",))


@register("pg_not_all_array", oracle="""
SELECT r_regionkey, r_name FROM region
WHERE r_name NOT IN ('ASIA', 'EUROPE') ORDER BY r_regionkey
""")
def pg_not_all(spark, sf_dir):
    return pg_sql(spark, sf_dir, """
        SELECT r_regionkey, r_name FROM region
        WHERE r_name <> ALL('{ASIA,EUROPE}') ORDER BY r_regionkey
    """, ("region",))


@register("pg_any_all_array", oracle="""
SELECT n_nationkey, n_name FROM nation
WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_19', 'NATION_7')
  AND n_name NOT IN ('NATION_5', 'NATION_23')
ORDER BY n_nationkey
""")
def pg_any_all(spark, sf_dir):
    # = ANY + <> ALL + '{...}' array literals in one statement — the merged
    # driver-window variant of pg_any_array_literal / pg_not_all_array
    return pg_sql(spark, sf_dir, """
        SELECT n_nationkey, n_name FROM nation
        WHERE n_name = ANY('{NATION_1,NATION_5,NATION_19,NATION_7}')
          AND n_name <> ALL('{NATION_5,NATION_23}')
        ORDER BY n_nationkey
    """, ("nation",))


@register("pg_regex_match", oracle="""
SELECT p_partkey, p_name FROM part
WHERE regexp_matches(p_name, 'widget') AND NOT regexp_matches(p_name, '^blue')
  AND regexp_matches(p_name, '(?i)WIDGET')
  AND NOT regexp_matches(p_name, '(?i)^ZZZZ')
  AND regexp_matches(p_name, 'e')
  AND p_name > 'a'
ORDER BY p_partkey
""")
def pg_regex(spark, sf_dir):
    # all four regex operators (~ !~ ~* !~*) plus the OPERATOR(pg_catalog.~)
    # spelling and a COLLATE "C" clause (stripped by the dialect layer) in
    # one statement (sql/rules.rs regex family parity)
    return pg_sql(spark, sf_dir, """
        SELECT p_partkey, p_name FROM part
        WHERE p_name ~ 'widget' AND p_name !~ '^blue'
          AND p_name ~* 'WIDGET' AND p_name !~* '^ZZZZ'
          AND p_name OPERATOR(pg_catalog.~) 'e'
          AND p_name COLLATE "C" > 'a'
        ORDER BY p_partkey
    """, ("part",))


@register("pg_regex_ci", oracle="""
SELECT p_partkey, p_name FROM part
WHERE regexp_matches(p_name, '(?i)WIDGET') ORDER BY p_partkey
""")
def pg_regex_ci(spark, sf_dir):
    return pg_sql(spark, sf_dir, """
        SELECT p_partkey, p_name FROM part
        WHERE p_name ~* 'WIDGET' ORDER BY p_partkey
    """, ("part",))


@register("pg_operator_form", oracle="""
SELECT n_nationkey, n_name FROM nation
WHERE regexp_matches(n_name, '_1[0-9]$') ORDER BY n_nationkey
""")
def pg_operator_form(spark, sf_dir):
    return pg_sql(spark, sf_dir, """
        SELECT n_nationkey, n_name FROM nation
        WHERE n_name OPERATOR(pg_catalog.~) '_1[0-9]$' ORDER BY n_nationkey
    """, ("nation",))


@register("pg_casts", oracle="""
SELECT o_orderkey,
       CAST(o_totalprice AS BIGINT) AS price_int,
       CAST(o_orderdate AS DATE) AS odate,
       CAST(o_orderkey AS VARCHAR) AS key_str
FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
""")
def pg_casts(spark, sf_dir):
    # ::int8 / ::date / ::text — pg cast syntax + pg type names.
    # note: ANSI-mode Spark rounds double->int8 like PG (banker's? no —
    # both round-half-even per IEEE; DuckDB CAST(double AS BIGINT) rounds
    # half-even too).
    return pg_sql(spark, sf_dir, """
        SELECT o_orderkey,
               o_totalprice::int8 AS price_int,
               o_orderdate::date AS odate,
               o_orderkey::text AS key_str
        FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """, ("orders",))


@register("pg_collate_strip", oracle="""
SELECT n_name FROM nation WHERE n_name > 'K' ORDER BY n_name
""")
def pg_collate(spark, sf_dir):
    return pg_sql(spark, sf_dir, """
        SELECT n_name FROM nation
        WHERE n_name COLLATE "C" > 'K'
        ORDER BY n_name COLLATE "C"
    """, ("nation",))


@register("pg_case_when", oracle="""
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
            ELSE 'partial' END AS status_word,
       CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_word
FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
""")
def pg_case(spark, sf_dir):
    return pg_sql(spark, sf_dir, """
        SELECT o_orderkey,
               CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
                    ELSE 'partial' END AS status_word,
               CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_word
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
    """, ("orders",))


@register("pg_math_functions", oracle="""
SELECT i,
       ROUND(sin(radians(i * 30.0)), 6) + 0.0 AS sind_v,
       ROUND(cos(radians(i * 30.0)), 6) + 0.0 AS cosd_v,
       ROUND(degrees(atan2(i * 1.0, 2.0)), 6) + 0.0 AS atan2d_v,
       CAST(CASE WHEN i * 1.0 >= 12.0 THEN 5
                 ELSE floor((i * 1.0) / 3.0) + 1 END AS BIGINT) AS bucket,
       CAST(ceiling(i * 1.7) AS BIGINT) AS ceil_v,
       CAST(sign(i - 6.0) AS DOUBLE) AS sign_v,
       mod(i, 5) AS mod_v,
       i // 5 AS div_v
FROM (SELECT unnest(generate_series(1, 12)) AS i) x ORDER BY i
""")
def pg_math(spark, sf_dir):
    # reference functions: sind/cosd/atan2d (degree_trig.rs), width_bucket
    # (width_bucket.rs), ceiling/sign (aliases.rs), mod/div (mod_op.rs,div.rs).
    # DuckDB has no width_bucket — the oracle spells out the bucket arithmetic.
    # libm outputs: ROUND at 6 digits (ulp headroom) `+ 0.0` — ROUND(-1e-16)
    # yields -0.0 in DuckDB and 0.0 in Spark; repr-level hashes disagree
    # (the actual round-1 hash_match failure for this query).
    return pg_sql(spark, sf_dir, """
        SELECT i,
               ROUND(sind(i * 30.0), 6) + 0.0 AS sind_v,
               ROUND(cosd(i * 30.0), 6) + 0.0 AS cosd_v,
               ROUND(atan2d(i * 1.0, 2.0), 6) + 0.0 AS atan2d_v,
               width_bucket(i * 1.0, 0.0, 12.0, 4)::int8 AS bucket,
               ceiling(i * 1.7)::int8 AS ceil_v,
               sign(i - 6.0)::float8 AS sign_v,
               mod(i, 5) AS mod_v,
               div(i, 5) AS div_v
        FROM (SELECT generate_series AS i FROM generate_series(1, 12)) x
        ORDER BY i
    """, ())


@register("pg_string_functions", oracle="""
SELECT n_name,
       lower(n_name) AS lower_name,
       substring(n_name, 1, 3) AS prefix3,
       CAST(strpos(n_name, 'A') AS INTEGER) AS a_pos,
       CAST(length(n_name) AS INTEGER) AS name_len,
       concat(n_name, '-', CAST(n_regionkey AS VARCHAR)) AS tagged,
       trim('  x  ') AS trimmed,
       array_to_string(string_to_array(n_name, 'A'), '|') AS a_split
FROM nation ORDER BY n_name
""")
def pg_strings(spark, sf_dir):
    return pg_sql(spark, sf_dir, """
        SELECT n_name,
               lower(n_name) AS lower_name,
               substring(n_name, 1, 3) AS prefix3,
               strpos(n_name, 'A') AS a_pos,
               length(n_name) AS name_len,
               concat(n_name, '-', n_regionkey::text) AS tagged,
               trim('  x  ') AS trimmed,
               array_to_string(string_to_array(n_name, 'A'), '|') AS a_split
        FROM nation ORDER BY n_name
    """, ("nation",))


@register("pg_generate_series_tf", oracle="""
SELECT generate_series AS g, generate_series % 7 AS m
FROM generate_series(10, 50) ORDER BY g
""")
def pg_series_tf(spark, sf_dir):
    return pg_sql(spark, sf_dir, """
        SELECT generate_series AS g, mod(generate_series, 7) AS m
        FROM generate_series(10, 50) ORDER BY g
    """, ())


@register("pg_between_in_null", oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_acctbal BETWEEN 1000 AND 2000
  AND c_nationkey IN (1, 3, 5, 7, 9)
  AND c_name IS NOT NULL
ORDER BY c_custkey
""")
def pg_between(spark, sf_dir):
    return pg_sql(spark, sf_dir, """
        SELECT c_custkey, c_name FROM customer
        WHERE c_acctbal BETWEEN 1000 AND 2000
          AND c_nationkey IN (1, 3, 5, 7, 9)
          AND c_name IS NOT NULL
        ORDER BY c_custkey
    """, ("customer",))


@register("pg_array_functions", oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS arr_len,
       1 AS arr_lower,
       CAST(len(embedding) AS INTEGER) AS arr_upper
FROM embeddings WHERE vec_id < 10 ORDER BY vec_id
""")
def pg_array_fns(spark, sf_dir):
    # array_length/array_upper/array_lower (array_bounds_udf.rs: lower=1,
    # upper=len). SQL UDFs take ARRAY<STRING>; implicit element cast applies.
    return pg_sql(spark, sf_dir, """
        SELECT vec_id,
               array_length(embedding, 1) AS arr_len,
               array_lower(embedding, 1) AS arr_lower,
               array_upper(embedding, 1) AS arr_upper
        FROM embeddings WHERE vec_id < 10 ORDER BY vec_id
    """, ("embeddings",))


@register("pg_json_operators", oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.k') AS k_text
FROM events WHERE event_id < 50 ORDER BY event_id
""")
def pg_json_operators(spark, sf_dir):
    # -> / ->> operators through the dialect layer
    return pg_sql(spark, sf_dir, """
        SELECT event_id,
               (props ->> 'k')::int8 AS k_val,
               props ->> 'k' AS k_text
        FROM events WHERE event_id < 50 ORDER BY event_id
    """, ("events",))


@register("pg_jsonpath", oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_first,
       json_extract_string(props, '$.k') IS NOT NULL AS has_k,
       json_extract_string(props, '$.missing') IS NOT NULL AS has_missing
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL AND event_id < 50
ORDER BY event_id
""")
def pg_jsonpath(spark, sf_dir):
    """jsonpath tier (@? operator + jsonb_path_* functions, simple-path
    subset) through the dialect layer; the oracle replays with DuckDB's
    json_extract_string on the same paths."""
    return pg_sql(spark, sf_dir, """
        SELECT event_id,
               jsonb_path_query_first(props, '$.k') AS k_first,
               jsonb_path_exists(props, '$.k') AS has_k,
               props @? '$.missing' AS has_missing
        FROM events
        WHERE props @? '$.k' AND event_id < 50
        ORDER BY event_id
    """, ("events",))


@register("pg_distinct_on", oracle="""
SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey
FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey
""")
def pg_distinct_on(spark, sf_dir):
    # PG-only DISTINCT ON syntax through the transpiler (window rewrite)
    return pg_sql(spark, sf_dir, """
        SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey
        FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """, ("customer",))


@register("pg_ordered_set_aggs", oracle="""
SELECT l_returnflag,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
       percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_qty,
       mode() WITHIN GROUP (ORDER BY l_linestatus) AS mode_status
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""")
def pg_ordered_set_aggs(spark, sf_dir):
    """Ordered-set aggregates (functions.md aggregate P3 rows) — PG's
    WITHIN GROUP syntax is Spark-4-native, so the SQL goes through the
    dialect layer untouched. Quantities are integer-valued, so the
    percentile interpolation is exact on both engines; mode() tie-break
    (first in sort order) matches PG."""
    return pg_sql(spark, sf_dir, """
        SELECT l_returnflag,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_qty,
               mode() WITHIN GROUP (ORDER BY l_linestatus) AS mode_status
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """, ("lineitem",))


_RECURSIVE_MONTHS = """
WITH RECURSIVE months (m, mx) AS (
    SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
           CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
    FROM orders
  UNION ALL
    SELECT CAST(m + INTERVAL '1 month' AS DATE), mx FROM months WHERE m < mx
)
SELECT m AS month_start,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM months LEFT JOIN orders o
  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m
GROUP BY m ORDER BY m
"""


@register("pg_recursive_cte", oracle=_RECURSIVE_MONTHS)
def pg_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Spark-4-native, SPARK-24497; the reference engine
    supports recursive CTEs via DataFusion's RecursiveQuery node). A
    dense month ladder is derived recursively from the orders date range
    (anchor carries the bound so the recursive member needs no subquery
    — Spark requires that), then LEFT-joined back to count orders per
    month including empty months. The count is order-independent, so the
    result hashes identically across engines; the identical SQL runs on
    DuckDB as the oracle. Recursion depth = #months (~80), far under
    Spark's default 100-row-limit-free iteration cap."""
    return pg_sql(spark, sf_dir, _RECURSIVE_MONTHS, ("orders",))
