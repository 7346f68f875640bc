"""Round-10 verdict item #1: does the 48-term simhash projection
evaluate its token-hash array once per row, or once per TERM?

``dedup.simhash_expr`` textually duplicates the
``split -> filter -> transform(word_fingerprint)`` chain into all 48
per-bit terms x2 (cnt_set and n_words) — 96 copies of the subtree in
the dumped plan. Higher-order functions are CodegenFallback
(interpreted), so whether that costs 1x or ~96x the tokenize+hash work
per row depends on Spark's subexpression elimination actually deduping
HOF subtrees inside codegen'd projections.

This probe measures, on the same corpus:

  A. the current shape (one projection, 96 HOF subtrees), default conf
  B. the current shape with spark.sql.subexpressionElimination.enabled
     = false — if A == B, CSE never fired and A's number is the true
     per-term cost; if A << B, CSE is doing the deduping
  C. a TWO-STAGE shape: project the word-hash array `whs` once, then
     compute the 48 per-bit terms over the materialized column in a
     second projection. CollapseProject must NOT inline it back (the
     chain is non-cheap and referenced 96 times — Spark's
     canCollapseExpressions refuses); the plan is checked for exactly
     ONE xxhash64 occurrence to prove it.

Decision rule (the verdict's): keep whichever wins; record both
numbers in STATUS. Run: python tools/probe_simhash_cse.py
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, ".")

from datafusion_postgres_spark.operators.dedup import (  # noqa: E402
    norm_text, simhash_expr, word_fingerprint, words,
)


def _two_stage_sig(df, text_col="text", bits=48):
    """Shape C: materialize the word-hash array in its own projection,
    then fold the 48 per-bit majorities over the column."""
    whs_df = df.select(
        "doc_id",
        F.transform(F.filter(words(norm_text(F.col(text_col))),
                             lambda w: w != ""),
                    word_fingerprint).alias("whs"))
    whs = F.col("whs")
    n_words = F.size(whs)
    sig = None
    for b in range(bits):
        cnt_set = F.size(F.filter(
            whs, lambda h: F.shiftright(h, b).bitwiseAND(1) == 1))
        term = F.when(2 * cnt_set > n_words,
                      F.lit(1 << b).cast("long")).otherwise(
                          F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return whs_df.select("doc_id", sig.alias("simhash"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .appName("probe_simhash_cse").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()

    def timed(tag, df, runs=3):
        best = float("inf")
        out = None
        for _ in range(runs):
            t0 = time.time()
            out = df.agg(F.sum("simhash").alias("s"),
                         F.count("*").alias("n")).collect()[0]
            best = min(best, time.time() - t0)
        print(f"{tag:<55s} best={best:7.3f}s  "
              f"checksum={out['s']} rows={out['n']}")
        return best, out["s"]

    base = docs.where(F.trim("text") != "")
    cur = base.select("doc_id",
                      simhash_expr(F.col("text")).alias("simhash"))
    two = _two_stage_sig(base)

    # plan receipts: how many times does the tokenize chain appear?
    import io
    from contextlib import redirect_stdout

    def plan_counts(df, tag):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        print(f"{tag}: plan occurrences — xxhash64={p.count('xxhash64')}"
              f" split={p.count('split')} transform={p.count('transform')}")

    plan_counts(cur, "A/B current shape")
    plan_counts(two, "C  two-stage shape")

    print(f"\ncorpus: {n} docs at {sf_dir}")
    t_a, sum_a = timed("A current 96-subtree shape (CSE on, default)", cur)
    spark.conf.set("spark.sql.subexpressionElimination.enabled", "false")
    t_b, sum_b = timed("B current shape, subexpressionElimination OFF",
                       base.select("doc_id", simhash_expr(F.col("text"))
                                   .alias("simhash")))
    spark.conf.set("spark.sql.subexpressionElimination.enabled", "true")
    t_c, sum_c = timed("C two-stage (whs materialized per row)", two)
    assert sum_a == sum_b == sum_c, "shapes disagree — not comparable"
    print(f"\nA/B ratio (CSE benefit on current shape): {t_b / t_a:.2f}x")
    print(f"A/C ratio (two-stage benefit):              {t_a / t_c:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
