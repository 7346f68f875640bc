"""Dialect-layer microbenchmark — the analog of the reference's only
published benchmark (``datafusion-pg-catalog/benches/parser_benchmark.rs``:
parse_simple_queries / parse_complex_queries / parser_creation).

Measures the PURE Python transpile path (tokenize + ~30 rewrite rules),
no Spark session involved. Prints one JSON line of microseconds per
statement (min over repeats).

    python tools/bench_dialect.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIMPLE = [
    "SELECT * FROM users",
    "SELECT id, name FROM users WHERE age > 18",
    "INSERT INTO users (name, email) VALUES ('John', 'john@example.com')",
    "UPDATE users SET name = 'Jane' WHERE id = 1",
    "DELETE FROM users WHERE id = 1",
]

# same FAMILY of shapes the reference benches (pgcli startup FK walk,
# psql \d policy listing): heavy catalog qualification, unnest,
# generate_subscripts, ::regclass, ANY(), dollar params
COMPLEX = [
    """SELECT s.nspname AS schemaname, c.relname AS tablename,
              unnest((SELECT array_agg(attname ORDER BY i)
                      FROM (SELECT unnest(conkey) AS attnum,
                                   generate_subscripts(conkey, 1) AS i
                            FROM pg_catalog.pg_constraint k
                            WHERE k.oid = fk.oid) x
                      JOIN pg_catalog.pg_attribute a USING (attnum)
                      WHERE a.attrelid = fk.conrelid)) AS childcolumn
       FROM pg_catalog.pg_constraint fk
       JOIN pg_catalog.pg_class c ON c.oid = fk.conrelid
       JOIN pg_catalog.pg_namespace s ON s.oid = c.relnamespace
       WHERE fk.contype = 'f'""",
    """SELECT pol.polname, pol.polpermissive,
              CASE WHEN pol.polroles = '{0}' THEN NULL
                   ELSE pg_catalog.array_to_string(ARRAY(
                        SELECT rolname FROM pg_catalog.pg_roles
                        WHERE oid = ANY (pol.polroles) ORDER BY 1), ',')
              END,
              pg_catalog.pg_get_expr(pol.polqual, pol.polrelid),
              CASE pol.polcmd WHEN 'r' THEN 'SELECT' WHEN 'a' THEN 'INSERT'
                              WHEN 'w' THEN 'UPDATE' WHEN 'd' THEN 'DELETE'
              END AS cmd
       FROM pg_catalog.pg_policy pol
       WHERE pol.polrelid = $1 ORDER BY 1""",
    """SELECT a.attname, format_type(a.atttypid, a.atttypmod), a.attnotnull
       FROM pg_catalog.pg_attribute a
       WHERE a.attrelid = 'nation'::regclass AND a.attnum > 0
         AND NOT a.attisdropped
       ORDER BY a.attnum""",
]


def _bench(fn, n_iter: int, repeats: int = 5) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            fn()
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def main() -> None:
    from datafusion_postgres_spark.dialect.transpiler import (
        PostgresTranspiler)

    tp = PostgresTranspiler()
    for q in SIMPLE + COMPLEX:  # warm any lazy state
        tp.transpile(q)

    us_simple = _bench(
        lambda: [tp.transpile(q) for q in SIMPLE], 200) * 1e6 / len(SIMPLE)
    us_complex = _bench(
        lambda: [tp.transpile(q) for q in COMPLEX], 50) * 1e6 / len(COMPLEX)
    us_create = _bench(lambda: PostgresTranspiler(), 200) * 1e6

    print(json.dumps({
        "metric": "dialect_transpile_us_per_stmt",
        "simple_us": round(us_simple, 1),
        "complex_us": round(us_complex, 1),
        "transpiler_creation_us": round(us_create, 1),
        "unit": "us",
    }))


if __name__ == "__main__":
    main()
