"""Second relational battery: argmax-per-group, nation-pair volumes,
HAVING, date/string scalar functions, LATERAL, PIVOT, DISTINCT ON.
Same determinism conventions as relational.py."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_postgres_spark.queries import register, t

DEC = "decimal(18,2)"


@register("q7_nation_pair_volume", oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_nationkey < 3 AND cn.n_nationkey < 3
  AND sn.n_nationkey <> cn.n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
""")
def q7(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    sn = nation.select(F.col("n_nationkey").alias("sk"),
                       F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("ck"),
                       F.col("n_name").alias("cust_nation"))
    vol = (F.col("l_extendedprice").cast("decimal(12,2)") *
           (1 - F.col("l_discount").cast("decimal(4,2)")))
    return (li.join(supp, li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
            .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
            .where((F.col("sk") < 3) & (F.col("ck") < 3) &
                   (F.col("sk") != F.col("ck")))
            .groupBy("supp_nation", "cust_nation")
            .agg(F.sum(vol).cast("double").alias("volume"))
            .orderBy("supp_nation", "cust_nation"))


@register("q10_returned_items", oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""")
def q10(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(12,2)") *
           (1 - F.col("l_discount").cast("decimal(4,2)")))
    return (cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, orders.o_orderkey == li.l_orderkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20))


@register("q18_large_orders", oracle="""
SELECT o_orderkey, o_totalprice AS price,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM orders JOIN (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
) big ON o_orderkey = big.l_orderkey
ORDER BY o_orderkey
""")
def q18(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                .alias("total_qty"))
           .where(F.col("total_qty") > 250))
    return (orders.join(big, orders.o_orderkey == big.l_orderkey)
            .select("o_orderkey", F.col("o_totalprice").alias("price"),
                    F.col("total_qty").cast("double").alias("total_qty"))
            .orderBy("o_orderkey"))


@register("argmax_per_group", oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice AS price
FROM lineitem l1
WHERE l_extendedprice = (SELECT MAX(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_orderkey = l1.l_orderkey)
  AND l_orderkey < 200
ORDER BY l_orderkey, l_linenumber
""")
def argmax_per_group(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT l_orderkey, l_linenumber, l_extendedprice AS price
        FROM {li} l1
        WHERE l_extendedprice = (SELECT MAX(l2.l_extendedprice) FROM {li} l2
                                 WHERE l2.l_orderkey = l1.l_orderkey)
          AND l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber""", li=li)


@register("having_filter", oracle="""
SELECT c_nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
FROM customer GROUP BY c_nationkey
HAVING COUNT(*) > 50
   AND CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) > 0
ORDER BY c_nationkey
""")
def having_filter(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return (c.groupBy("c_nationkey")
            .agg(F.count("*").alias("n"),
                 (F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
                  .cast("double") / F.count("*")).alias("avg_bal"))
            .where((F.col("n") > 50) & (F.col("avg_bal") > 0))
            .orderBy("c_nationkey"))


@register("date_functions", oracle="""
SELECT o_orderkey,
       CAST(extract(year FROM o_orderdate) AS INTEGER) AS y,
       CAST(extract(month FROM o_orderdate) AS INTEGER) AS m,
       CAST(extract(day FROM o_orderdate) AS INTEGER) AS d,
       CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS q,
       CAST(extract(doy FROM o_orderdate) AS INTEGER) AS doy,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
""")
def date_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (o.where(F.col("o_orderkey") < 100)
            .select("o_orderkey",
                    F.year(d).alias("y"), F.month(d).alias("m"),
                    F.dayofmonth(d).alias("d"), F.quarter(d).alias("q"),
                    F.dayofyear(d).alias("doy"),
                    F.date_add(d.cast("date"), 30).alias("plus30"),
                    F.date_trunc("month", d).cast("date").alias("month_start"),
                    F.datediff(F.lit("2000-01-01").cast("date"),
                               d.cast("date")).cast("bigint")
                    .alias("days_to_y2k"))
            .orderBy("o_orderkey"))


@register("string_functions_ext", oracle="""
SELECT p_partkey,
       upper(p_name) AS up, lower(p_brand) AS lo,
       replace(p_name, ' ', '_') AS snake,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
       reverse(p_name) AS rev,
       substr(p_name, 1, 4) AS pre4,
       CAST(length(p_name) AS INTEGER) AS len,
       repeat('ab', 3) AS rep,
       ltrim('  x') AS lt, rtrim('x  ') AS rt,
       split_part(p_name, ' ', 1) AS first_word
FROM part WHERE p_partkey < 50 ORDER BY p_partkey
""")
def string_functions_ext(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (p.where(F.col("p_partkey") < 50)
            .select("p_partkey",
                    F.upper("p_name").alias("up"),
                    F.lower("p_brand").alias("lo"),
                    F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
                    F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded"),
                    F.reverse(F.col("p_name")).alias("rev"),
                    F.substring("p_name", 1, 4).alias("pre4"),
                    F.length("p_name").alias("len"),
                    F.repeat(F.lit("ab"), 3).alias("rep"),
                    F.ltrim(F.lit("  x")).alias("lt"),
                    F.rtrim(F.lit("x  ")).alias("rt"),
                    F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
                    .alias("first_word"))
            .orderBy("p_partkey"))


@register("conditional_functions", oracle="""
SELECT c_custkey,
       coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
       greatest(c_acctbal, 0.0) AS pos_bal,
       least(CAST(c_nationkey AS BIGINT), 10) AS capped_nation,
       CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS standing
FROM customer WHERE c_custkey < 100 ORDER BY c_custkey
""")
def conditional_functions(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return (c.where(F.col("c_custkey") < 100)
            .select("c_custkey",
                    F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")),
                               F.lit("OTHER")).alias("seg"),
                    F.greatest("c_acctbal", F.lit(0.0)).alias("pos_bal"),
                    F.least(F.col("c_nationkey").cast("bigint"),
                            F.lit(10)).alias("capped_nation"),
                    F.when(F.col("c_acctbal") < 0, "debt")
                    .otherwise("credit").alias("standing"))
            .orderBy("c_custkey"))


@register("lateral_subquery", oracle="""
SELECT n_name, x.n_cust, x.total_bal
FROM nation, LATERAL (
  SELECT COUNT(*) AS n_cust,
         CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_bal
  FROM customer WHERE c_nationkey = n_nationkey
) x
ORDER BY n_name
""")
def lateral_subquery(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    return spark.sql("""
        SELECT n_name, x.n_cust, x.total_bal
        FROM {n}, LATERAL (
          SELECT COUNT(*) AS n_cust,
                 CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 0)
                      AS DOUBLE) AS total_bal
          FROM {c} WHERE c_nationkey = n_nationkey
        ) x
        ORDER BY n_name""", n=n, c=c)


@register("pivot_orderstatus", oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_count,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_count,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_count
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def pivot_orderstatus(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    # native PIVOT relational operator; COUNT(*) null-fill normalized to 0
    pv = (o.groupBy("o_orderpriority")
          .pivot("o_orderstatus", ["F", "O", "P"])
          .count())
    return (pv.select(
                "o_orderpriority",
                F.coalesce("F", F.lit(0)).alias("f_count"),
                F.coalesce("O", F.lit(0)).alias("o_count"),
                F.coalesce("P", F.lit(0)).alias("p_count"))
            .orderBy("o_orderpriority"))


@register("distinct_on_first_order", oracle="""
SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS first_date
FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey
""")
def distinct_on_first_order(spark, sf_dir):
    # PG DISTINCT ON == row_number()=1 over the same ordering
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey",
                    F.col("o_orderdate").cast("date").alias("first_date"))
            .orderBy("o_custkey"))


@register("ilike_filter", oracle="""
SELECT p_partkey, p_name FROM part
WHERE p_name ILIKE '%WIDGET%' AND p_brand NOT ILIKE 'brand#1'
ORDER BY p_partkey
""")
def ilike_filter(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return spark.sql("""
        SELECT p_partkey, p_name FROM {p}
        WHERE p_name ILIKE '%WIDGET%' AND p_brand NOT ILIKE 'brand#1'
        ORDER BY p_partkey""", p=p)


_STATS_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                       * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS DECIMAL(30,0))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) AS sxy,
         CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS median_qty
  FROM lineitem GROUP BY l_returnflag {having})
SELECT l_returnflag,
       n,
       sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_qty,
       (sxx - sx * sx / n) / (n - 1) AS var_qty,
       (n * sxy - sx * sy)
       / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
       median_qty
FROM s ORDER BY l_returnflag
"""


@register("agg_stats_numeric", oracle=_STATS_ORACLE.format(having=""))
def agg_stats_numeric(spark, sf_dir):
    return _stats_query(spark, sf_dir)


def _stats_query(spark, sf_dir, having_min_n: int | None = None):
    """stddev/variance/corr from EXACT integer/decimal sums, finished with
    one identical IEEE double expression per engine — streaming moment
    algorithms (Welford merges) are partitioning-order-dependent, so raw
    stddev_samp/corr would not hash-match across engines. Distributes as a
    single map-side-combined aggregation (one shuffle), same as the naive
    form. Prices become exact bigint cents (corr is scale-invariant)."""
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    cents = (F.col("l_extendedprice").cast("decimal(12,2)") * 100) \
        .cast("bigint")
    g = (li.groupBy("l_returnflag")
         .agg(F.count("*").alias("n"),
              F.sum(qty).cast("double").alias("sx"),
              F.sum(qty * qty).cast("double").alias("sxx"),
              F.sum(cents).cast("double").alias("sy"),
              # cents^2 sums exceed int64 at sf>=0.1 -> exact decimal sum
              F.sum((cents * cents).cast("decimal(30,0)")).cast("double")
              .alias("syy"),
              F.sum(qty * cents).cast("double").alias("sxy"),
              F.expr("percentile(l_quantity, 0.5)")  # exact, interpolated
              .cast("double").alias("median_qty")))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    out = g.select(
        "l_returnflag", "n",
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("sd_qty"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        ((n * sxy - sx * sy) /
         (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)))
        .alias("corr_qty_price"),
        "median_qty")
    if having_min_n is not None:
        out = out.where(F.col("n") > having_min_n)
    return out.orderBy("l_returnflag")


@register("q4_priority_check", oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def q4(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM {o} o
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND EXISTS (SELECT 1 FROM {li} l WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""", o=o, li=li)


@register("q12_shipmode_buckets", oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
""")
def q12(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")) &
        (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
                 .alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
                 .alias("low_line_count"))
            .orderBy("l_linestatus"))


@register("q14_promo_revenue", oracle="""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
         THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
         ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
  AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-07-01'
""")
def q14(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")) &
        (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz")))
    p = t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice").cast("decimal(12,2)") *
           (1 - F.col("l_discount").cast("decimal(4,2)")))
    promo = F.when(F.col("p_type") == "PROMO", rev) \
        .otherwise(F.lit(0).cast("decimal(14,4)"))
    # identical IEEE expression on both sides (exact decimal sums -> one
    # double multiply + divide); no ROUND needed
    # part is SF-proportional — no forced broadcast; AQE decides
    return (li.join(p, li.l_partkey == p.p_partkey)
            .agg((F.lit(100.0) * F.sum(promo).cast("double") /
                  F.sum(rev).cast("double")).alias("promo_pct")))


@register("q19_disjunctive_join", oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_type = 'PROMO' AND l_discount > 0.05)
""")
def q19(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) &
         F.col("l_quantity").between(1, 20)) |
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 30) &
         F.col("l_quantity").between(10, 40)) |
        ((F.col("p_type") == "PROMO") & (F.col("l_discount") > 0.05)))
    rev = (F.col("l_extendedprice").cast("decimal(12,2)") *
           (1 - F.col("l_discount").cast("decimal(4,2)")))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .where(cond)
            .agg(F.sum(rev).cast("double").alias("revenue"),
                 F.count("*").alias("n")))


def _profile_oracle_col(c, table="orders"):
    return (f"SELECT '{c}' AS column_name, "
            f"CAST(COUNT({c}) AS BIGINT) AS n, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_null, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_value, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_value FROM {table}")


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"]


@register("table_profile_orders", oracle="""
WITH src AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                    CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
                    o_orderdate, o_orderpriority FROM orders)
""" + "\nUNION ALL\n".join(_profile_oracle_col(c, "src")
                           for c in _PROFILE_COLS) + """
ORDER BY column_name
""")
def table_profile_orders(spark, sf_dir):
    """SUMMARIZE-style single-pass table profile (operators/profile.py):
    per-column count/nulls/distinct/min/max from ONE wide aggregate,
    unpivoted via stack — no per-column scans. o_totalprice goes through
    DECIMAL(12,2) so min/max strings render identically across engines
    (raw double-to-string formatting differs)."""
    from datafusion_postgres_spark.operators.profile import profile_table
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
        "o_orderdate", "o_orderpriority")
    return profile_table(orders).orderBy("column_name")
