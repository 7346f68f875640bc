"""Round-10 batch 5: single-spark.sql-parse rebuilds of the
Column-composed TPC-H/relational bench builders.

Each declared query keeps a `_<name>_composed` twin holding the exact
pre-round-10 Column-composed build. These pins assert value equality
(collected rows, order included — every query ends in a deterministic
ORDER BY) on sf0.001, so the single-parse rewrite can never silently
change what the query computes. The plans are byte-identical modulo
expression ids (plans/r10/*_{before,after}.txt); these pins guard the
values independently of that.
"""

import pytest

from datafusion_postgres_spark.queries import pipeline_q, relational, tpch2

SF_DIR = "/root/testdata/sf0.001"

PAIRS = [
    (relational.q3, relational._q3_composed),
    (relational.q5, relational._q5_composed),
    (relational.join_using, relational._join_using_composed),
    (relational.agg_distinct, relational._agg_distinct_composed),
    (relational.window_rank, relational._window_rank_composed),
    (tpch2.q8, tpch2._q8_composed),
    (tpch2.q9, tpch2._q9_composed),
    # round-10 batch 7: brute-force cosine top-k (the one bench row
    # left whose build was dominated by clean py4j chatter)
    (pipeline_q.sim_topk, pipeline_q._sim_cosine_topk_composed),
]


class TestSqlTwinQueries:
    @pytest.mark.parametrize(
        "declared,composed", PAIRS,
        ids=[p[0].__name__ if hasattr(p[0], "__name__") else str(i)
             for i, p in enumerate(PAIRS)])
    def test_single_parse_equals_composed(self, spark, declared, composed):
        a = declared(spark, SF_DIR)
        b = composed(spark, SF_DIR)
        assert a.schema == b.schema
        assert a.collect() == b.collect()
