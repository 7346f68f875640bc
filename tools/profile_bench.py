"""Per-query decomposition of the bench rows: Python build time, driver
plan time (analysis+optimization to executedPlan), and executed noop
time (min of N) — so optimization effort goes where the time actually
is (guide §1: measure first; planning is driver-side single-threaded
work, §7.3).

Usage: python tools/profile_bench.py [query ...]   (default: HEADLINE)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datafusion_postgres_spark.session import build_spark
    from datafusion_postgres_spark.functions import register_functions
    from datafusion_postgres_spark.queries import load_all

    spark = build_spark(app_name="profile_bench")
    register_functions(spark)
    reg = load_all()
    names = sys.argv[1:] or [n for n in HEADLINE if n in reg]

    # warmup exactly like bench.py
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for name in names:
            reg[name].fn(spark, warm).write.format("noop").mode(
                "overwrite").save()

    rows = []
    for name in names:
        spec = reg[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        plan = df._jdf.queryExecution().executedPlan().toString()
        t_plan = time.perf_counter() - t0
        n_exch = plan.count("Exchange")

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            # fresh build each run, like bench.py
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            best = min(best, time.perf_counter() - t0)
        rows.append({"name": name, "build_s": round(t_build, 3),
                     "plan_s": round(t_plan, 3),
                     "exec_min_s": round(best, 3),
                     "exchanges": n_exch})
        print(json.dumps(rows[-1]), flush=True)

    rows.sort(key=lambda r: -r["exec_min_s"])
    print("\n== sorted by exec ==")
    for r in rows:
        print(f"{r['exec_min_s']:7.3f}  build {r['build_s']:6.3f}  "
              f"plan {r['plan_s']:6.3f}  xchg {r['exchanges']:2d}  "
              f"{r['name']}")
    total = sum(r["exec_min_s"] for r in rows)
    print(f"total exec (min-of-3 sum): {total:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
