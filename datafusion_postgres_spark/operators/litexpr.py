"""Constant array literals via ONE ``F.expr`` parse.

``F.lit(<python list>)`` round-trips every element through py4j when
building the Column — measured ~0.6-1.4 s of pure DRIVER time for a
1024-double list versus ~2 ms for the parsed form. That overhead is per
call, so it multiplies in iterative operators that rebuild a dim-sized
lookup literal every round (classifier training, k-means assignment,
PQ/SQ8 scoring). Execution is identical either way: both forms reach
Catalyst as a single array Literal.

Exactness: ``repr(float)`` is the shortest round-tripping decimal, and
Spark's ``<digits>D`` lexer rule parses it back to the identical double
(pinned by round-trip in tests). Non-finite doubles have no SQL literal
spelling — those fall back to the slow exact path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F


def darr_sql(values) -> str:
    """SQL text of an array<double> literal (the dlit spelling) — for
    builders that assemble a whole expression as ONE ``F.expr`` parse
    instead of per-element py4j composition. Finite values only (the
    callers inline trained bounds/codebooks, which are finite by
    construction)."""
    vs = [float(v) for v in values]
    if not all(math.isfinite(v) for v in vs):
        raise ValueError("darr_sql requires finite doubles")
    return "array(" + ",".join(f"{v!r}D" for v in vs) + ")"


def dlit(values) -> Column:
    """array<double> literal."""
    vs = [float(v) for v in values]
    if not vs:
        return F.lit([]).cast("array<double>")
    if not all(math.isfinite(v) for v in vs):
        return F.lit(vs).cast("array<double>")
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vs) + ")")


def llit(values) -> Column:
    """array<bigint> literal."""
    vs = [int(v) for v in values]
    if not vs:
        return F.lit([]).cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{v}L" for v in vs) + ")")


def ilit(values) -> Column:
    """array<int> literal."""
    vs = [int(v) for v in values]
    if not vs:
        return F.lit([]).cast("array<int>")
    return F.expr(
        "array(" + ",".join(str(v) for v in vs) + ")").cast("array<int>")
