"""Scale-layout proofs: bucketed co-located joins (no shuffle), partition
pruning, salted joins preserving semantics."""

import pytest
from pyspark.sql import functions as F

from datafusion_postgres_spark.operators.skew import salted_join, two_phase_agg
from datafusion_postgres_spark.plans import inspect as P
from datafusion_postgres_spark.sources.sinks import (
    bucketed_join_ready, write_bucketed, write_partitioned,
)
from datafusion_postgres_spark.sources.registry import read_table

SF_DIR = "/root/testdata/sf0.001"


class TestBucketing:
    @pytest.fixture(scope="class", autouse=True)
    def bucketed_tables(self, spark):
        for tbl in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        orders = read_table(spark, SF_DIR, "orders") \
            .withColumnRenamed("o_orderkey", "orderkey")
        li = read_table(spark, SF_DIR, "lineitem") \
            .withColumnRenamed("l_orderkey", "orderkey")
        write_bucketed(orders, "b_orders", ["orderkey"], 8)
        write_bucketed(li, "b_lineitem", ["orderkey"], 8)
        yield
        for tbl in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    def test_bucketed_join_has_no_shuffle(self, spark):
        # the whole point of bucketing: both sides pre-hashed on the key,
        # the join runs shuffle-free (cluster: zero network for the join)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (spark.table("b_orders")
                      .join(spark.table("b_lineitem"), "orderkey")
                      .groupBy("orderkey").agg(F.count("*").alias("n")))
            assert P.count_shuffles(joined) == 0
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")

    def test_bucketed_join_ready(self, spark):
        assert bucketed_join_ready(spark, "b_orders", "b_lineitem", "orderkey")


class TestPartitionPruning:
    def test_partition_filter_prunes(self, spark, tmp_path):
        ev = read_table(spark, SF_DIR, "events") \
            .withColumn("day", F.to_date("ts"))
        path = str(tmp_path / "events_part")
        write_partitioned(ev, path, ["day"])
        df = (spark.read.parquet(path)
              .where(F.col("day") == "2024-01-02")
              .select("event_id"))
        plan = P.formatted_plan(df)
        # partition filters appear as PartitionFilters, not data filters
        assert "PartitionFilters" in plan and "day" in plan
        assert df.count() > 0


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        li = read_table(spark, SF_DIR, "lineitem").limit(2000)
        part = read_table(spark, SF_DIR, "part") \
            .select(F.col("p_partkey").alias("l_partkey"), "p_name")
        plain = li.join(part, "l_partkey").count()
        salted = salted_join(li, part, "l_partkey", salt_buckets=8).count()
        assert plain == salted

    def test_two_phase_agg_matches(self, spark):
        li = read_table(spark, SF_DIR, "lineitem")
        plain = {r["l_returnflag"]: (r["s"], r["c"]) for r in
                 li.groupBy("l_returnflag")
                 .agg(F.sum("l_quantity").alias("s"),
                      F.count("*").alias("c")).collect()}
        two = {r["l_returnflag"]: (r["sum_l_quantity"], r["count_value"])
               for r in two_phase_agg(li, "l_returnflag", "l_quantity",
                                      8).collect()}
        assert set(plain) == set(two)
        for k in plain:
            assert abs(plain[k][0] - two[k][0]) < 1e-6
            assert plain[k][1] == two[k][1]
