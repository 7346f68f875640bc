"""Plan-quality pins — the 100 TB insurance policy.

These assert the physical-plan properties that make the operators viable
at cluster scale: predicate pushdown into parquet, column pruning,
broadcast of dim tables, bounded shuffle counts. A change that silently
turns a broadcast join into a shuffle join or drops a pushed filter fails
here, not on a cluster."""

import pytest

from datafusion_postgres_spark.plans import inspect as P
from datafusion_postgres_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_q1_filter_pushed_to_parquet(spark, reg):
    df = reg["q1_pricing_summary"].fn(spark, SF_DIR)
    pushed = " ".join(P.pushed_filters(df))
    assert "l_shipdate" in pushed


def test_q1_column_pruning(spark, reg):
    df = reg["q1_pricing_summary"].fn(spark, SF_DIR)
    cols = P.scan_columns(df)[0]
    # 7 of 11 lineitem columns; never the unused keys
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= cols


def test_q1_single_shuffle(spark, reg):
    # one hash-shuffle for the groupBy; no sort exchange (no orderBy)
    df = reg["q1_pricing_summary"].fn(spark, SF_DIR)
    assert P.count_shuffles(df) <= 2


def test_q5_broadcasts_dims(spark, reg):
    df = reg["q5_local_supplier_volume"].fn(spark, SF_DIR)
    assert P.uses_broadcast(df)


def test_q3_broadcasts_customer(spark, reg):
    df = reg["q3_shipping_priority"].fn(spark, SF_DIR)
    assert P.uses_broadcast(df)


def test_topk_no_global_sort(spark, reg):
    # orderBy+limit must compile to TakeOrderedAndProject, not a full sort
    df = reg["sort_topk"].fn(spark, SF_DIR)
    assert "TakeOrderedAndProject" in P.simple_plan(df)


def test_filter_pushdown_dialect_path(spark, reg):
    # the transpiled Postgres SQL path preserves pushdown too
    df = reg["pg_between_in_null"].fn(spark, SF_DIR)
    pushed = " ".join(P.pushed_filters(df))
    assert "c_acctbal" in pushed


def test_semi_join_stays_semi(spark, reg):
    df = reg["join_semi_exists"].fn(spark, SF_DIR)
    assert "LeftSemi" in P.simple_plan(df)


def test_sim_topk_broadcasts_queries(spark, reg):
    # corpus must never shuffle: the query side broadcasts
    df = reg["sim_cosine_topk"].fn(spark, SF_DIR)
    assert P.uses_broadcast(df)


def test_events_sessionize_reuses_partitioning(spark, reg):
    # both windows partition by user_id; Catalyst must not add a second
    # exchange between them
    df = reg["events_sessionize"].fn(spark, SF_DIR)
    assert P.count_shuffles(df) <= 3
