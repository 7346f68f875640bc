"""URL canonicalization + URL-level dedup (operators/urls.py)."""

import pytest

from pyspark.sql import functions as F

from datafusion_postgres_spark.operators.urls import (
    canonicalize_url, canonicalize_url_py, dedup_by_url, url_dup_groups,
)

# (messy, canonical) — the public canonicalization corner cases
CASES = [
    # scheme/host case + default https port
    ("HTTPS://Example.COM:443/a", "https://example.com/a"),
    # default http port
    ("http://example.com:80/a", "http://example.com/a"),
    # non-default port KEPT
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # www strip + trailing slash
    ("https://www.example.com/a/", "https://example.com/a"),
    # bare host -> root path
    ("https://example.com", "https://example.com/"),
    # root slash preserved as root
    ("https://example.com/", "https://example.com/"),
    # duplicate slashes collapse
    ("https://example.com//a//b", "https://example.com/a/b"),
    # fragment dropped
    ("https://example.com/a#sec", "https://example.com/a"),
    # tracking params stripped, survivors sorted
    ("https://example.com/a?utm_source=x&b=2&a=1&gclid=9",
     "https://example.com/a?a=1&b=2"),
    # all params tracking -> no query at all
    ("https://example.com/a?utm_campaign=c&fbclid=f",
     "https://example.com/a"),
    # empty query
    ("https://example.com/a?", "https://example.com/a"),
    # ref is a tracking param; msclkid/mc_cid too
    ("https://example.com/a?ref=hn&msclkid=1&mc_cid=2&x=1",
     "https://example.com/a?x=1"),
    # params that merely START with a tracking name survive
    ("https://example.com/a?reference=1", "https://example.com/a?reference=1"),
]


class TestCanonicalizeExpr:
    def test_corner_cases_jvm(self, spark):
        df = spark.createDataFrame([(m,) for m, _ in CASES], "url string")
        got = [r["c"] for r in
               df.select(canonicalize_url(F.col("url")).alias("c"))
               .collect()]
        assert got == [c for _, c in CASES]

    def test_python_twin_matches_jvm(self, spark):
        for messy, want in CASES:
            assert canonicalize_url_py(messy) == want

    def test_idna_punycode_python_path(self):
        # IDN host: the Python twin punycodes; public example domain
        assert canonicalize_url_py("https://bücher.example/a") == \
            "https://xn--bcher-kva.example/a"

    def test_malformed_degrades_not_nulls(self, spark):
        df = spark.createDataFrame(
            [("not a url at all",), ("  MIXED Case Junk ",)], "url string")
        got = [r["c"] for r in
               df.select(canonicalize_url(F.col("url")).alias("c"))
               .collect()]
        # degrade to lower(trim()) — never NULL (NULL would merge all
        # junk rows into one dedup group)
        assert got == ["not a url at all", "mixed case junk"]
        assert canonicalize_url_py("not a url at all") == "not a url at all"

    def test_strip_www_optional(self, spark):
        df = spark.createDataFrame([("https://www.example.com/a",)],
                                   "url string")
        keep = df.select(canonicalize_url(F.col("url"),
                                          strip_www=False).alias("c"))
        assert keep.collect()[0]["c"] == "https://www.example.com/a"


class TestUrlDedup:
    def test_groups_and_survivors(self, spark):
        rows = [
            (1, "https://example.com/a"),
            (2, "HTTPS://EXAMPLE.COM:443/a/"),
            (3, "https://www.example.com/a?utm_source=x"),
            (4, "https://example.com/b"),
            (5, "https://other.org/"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        groups = url_dup_groups(df).collect()
        assert len(groups) == 1
        g = groups[0]
        assert (g["canonical_url"], g["representative"], g["n_docs"]) == \
            ("https://example.com/a", 1, 3)
        kept = sorted(r["doc_id"] for r in dedup_by_url(df).collect())
        assert kept == [1, 4, 5]

    def test_dedup_plan_stays_jvm(self, spark):
        """The canonicalization must not leave codegen: no Python eval
        nodes in the plan (BatchEvalPython/ArrowEvalPython)."""
        df = spark.createDataFrame([(1, "https://e.com/a")],
                                   "doc_id long, url string")
        plan = url_dup_groups(df)._jdf.queryExecution().executedPlan() \
            .toString()
        assert "EvalPython" not in plan


def test_jvm_and_python_twin_agree_on_component_grid(spark):
    """Exhaustive component grid (scheme case x www x port x path shape
    x query set x fragment = 432 URLs): the JVM column expression and
    the Python twin canonicalize every combination identically — the
    cheap insurance that the two implementations never drift."""
    urls = []
    for scheme in ("https", "HTTPS", "http"):
        for www in ("", "www."):
            for port in ("", ":443", ":8080"):
                for path in ("/a/b", "/a//b/", ""):
                    for q in ("", "?b=2&a=1&utm_source=x", "?gclid=1"):
                        for frag in ("", "#sec"):
                            urls.append(
                                f"{scheme}://{www}Example.COM{port}"
                                f"{path}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    jvm = [r["c"] for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    py = [canonicalize_url_py(u) for u in urls]
    assert jvm == py
