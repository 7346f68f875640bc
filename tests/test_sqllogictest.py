"""Mini sqllogictest runner over the engine.

Reference parity: ``datafusion-pg-functions/tests/sqllogictest.rs`` (runs
every tests/sqllogictest/*.slt against a registered SessionContext; float
and NULL conventions per the harness, sqllogictest.rs:96-140)."""

import math
import os

import pytest

SLT_DIR = os.path.join(os.path.dirname(__file__), "sqllogictest")


def parse_slt(path):
    cases = []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line == "query":
            sql_lines = []
            i += 1
            while lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            i += 1
            expected = []
            while i < len(lines) and lines[i].strip():
                expected.append(lines[i].split("\t"))
                i += 1
            cases.append(("\n".join(sql_lines), expected))
        else:
            i += 1
    return cases


def values_match(got, want: str) -> bool:
    if want == "NULL":
        return got is None
    if got is None:
        return False
    if isinstance(got, float):
        try:
            return abs(got - float(want)) < 1e-9 or (
                math.isnan(got) and want == "NaN")
        except ValueError:
            return False
    if isinstance(got, list):
        return "[" + ", ".join(str(x) for x in got) + "]" == want
    return str(got) == want


def collect_cases():
    out = []
    for fname in sorted(os.listdir(SLT_DIR)):
        if fname.endswith(".slt"):
            for idx, (sql, expected) in enumerate(
                    parse_slt(os.path.join(SLT_DIR, fname))):
                out.append(pytest.param(sql, expected,
                                        id=f"{fname}:{idx}:{sql.strip()[:40]}"))
    return out


@pytest.mark.parametrize("sql,expected", collect_cases())
def test_slt(engine, sql, expected):
    rows = list(engine.execute(sql)[0].rows())
    assert len(rows) == len(expected), f"rowcount {len(rows)} != {len(expected)}"
    for row, want in zip(rows, expected):
        assert len(row) == len(want), f"width {len(row)} != {len(want)}"
        for g, w in zip(row, want):
            assert values_match(g, w), f"{g!r} != {w!r} in {sql}"
