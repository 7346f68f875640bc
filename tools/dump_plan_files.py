"""Dump `.explain("formatted")` for named queries to files — the
before/after plan evidence for optimization rounds.

    python tools/dump_plan_files.py <out_dir> <suffix> <query> [...]

Writes <out_dir>/<query>_<suffix>.txt for each query, built at sf0.1
with the engine session defaults (same as bench.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datafusion_postgres_spark.session import build_spark
    from datafusion_postgres_spark.functions import register_functions
    from datafusion_postgres_spark.queries import load_all

    spark = build_spark(app_name="dump_plan_files")
    register_functions(spark)
    reg = load_all()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = reg.get(name)
        if spec is None:
            print(f"SKIP {name}: not registered", flush=True)
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
