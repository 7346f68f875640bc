"""Decompose text_simhash_dedup_keep_scale's WARM per-run cost into its
constituent Spark actions (guide §1: measure before touching): the
rep-edge blocking join (count action), the Arrow edge collect, the
driver union-find, the loser upload, and the final left-anti keep
query. Run on an otherwise-quiet machine.

Usage: python tools/probe_keep_decompose.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datafusion_postgres_spark.session import build_spark
    from datafusion_postgres_spark.queries import load_all
    from datafusion_postgres_spark.operators import dedup
    from datafusion_postgres_spark.operators.imagehash import (
        _rep_structures,
    )
    from pyspark.sql import functions as F

    spark = build_spark(app_name="probe_keep_decompose")
    reg = load_all()
    spec = reg["text_simhash_dedup_keep_scale"]

    # cold run 1 + warm run 2, exactly like bench.py
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        print(f"full row ({label}): {time.perf_counter() - t0:.3f}s")

    # now decompose one more warm invocation piece by piece
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.perf_counter()
    sig = dedup._simhash_chunk_sig(docs, "text", "doc_id", 48)
    _, rsig, rp = _rep_structures(sig, list(dedup._SH_COLS), 3,
                                  "simhash_dedup_keep", 200, [], False,
                                  need_members=False, unique_pairs=False)
    print(f"build sig+rp plans: {time.perf_counter() - t0:.3f}s")

    edges = rp.select(F.col("ra").cast("long").alias("a"),
                      F.col("rb").cast("long").alias("b")).persist()
    t0 = time.perf_counter()
    n = edges.count()
    print(f"rep-edge count ({n} edges): {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    pdf = edges.toPandas()
    print(f"edge toPandas: {time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pdf["a"].tolist(), pdf["b"].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    losers = [x for x in parent if find(x) != x]
    print(f"driver union-find ({len(losers)} losers): "
          f"{time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    import pandas as pd
    losers_df = spark.createDataFrame(
        pd.DataFrame({"id": pd.Series(losers, dtype="int64")}),
        schema="id long")
    print(f"loser upload (lazy): {time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    keep = rsig.select("id").join(losers_df, "id", "left_anti")
    kept_losers = sig.select("id").join(keep, "id", "left_anti")
    kept = docs.join(kept_losers.withColumnRenamed("id", "doc_id"),
                     "doc_id", "left_anti")
    out = (kept.select(F.col("doc_id").cast("bigint").alias("doc_id"))
           .repartition(1).sortWithinPartitions("doc_id"))
    out.write.format("noop").mode("overwrite").save()
    print(f"final keep query noop: {time.perf_counter() - t0:.3f}s")
    edges.unpersist()

    # how much of the build is py4j/plan construction?
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    print(f"fn() build only (includes eager loser_ids): "
          f"{time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"noop after prebuilt fn(): {time.perf_counter() - t0:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
