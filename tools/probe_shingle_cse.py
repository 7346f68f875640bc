"""Round-10 follow-up to probe_simhash_cse.py: does a tokenize chain
referenced INSIDE a per-gram lambda body re-evaluate per gram?

Production ``shingle_array`` is the TWO-STAGE shape since round 10;
this probe keeps the PRE-round-10 single-projection form alive inline
(the way probe_simhash_cse keeps simhash_expr alive) so the receipt
stays reproducible: shape A puts ``whs = transform(ws,
word_fingerprint)`` inside the per-gram ``slice`` lambda, where
interpreted HOFs re-evaluate it per element; shape B is the production
two-stage operator. Measured 2.1-2.2x on sf0.1 docs with identical
checksums.

Run: python tools/probe_shingle_cse.py [sf_dir]
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, ".")

from datafusion_postgres_spark.operators.dedup import (  # noqa: E402
    FP_MOD, ensure_min_parallelism, shingle_array,
)
from datafusion_postgres_spark.operators.text import (  # noqa: E402
    norm_text, word_fingerprint, words,
)


def _single_projection_shape(docs, text_col="text", id_col="doc_id",
                             n=3):
    """The PRE-round-10 shingle_array: one projection, the word-hash
    chain inline inside the per-gram lambda body (kept here as the
    probe's A side — do NOT reuse in production)."""
    ws = words(norm_text(F.col(text_col)))
    whs = F.transform(ws, word_fingerprint)
    gram_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))),
        lambda i: F.aggregate(F.slice(whs, i + 1, n),
                              F.lit(0).cast("long"),
                              lambda acc, x: (acc * 31 + x) % FP_MOD))
    grams = F.sort_array(F.array_distinct(gram_hashes))
    return (ensure_min_parallelism(docs)
            .where(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("id"), grams.alias("grams"))
            .withColumn("set_size", F.size("grams")))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .appName("probe_shingle_cse").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    def timed(tag, df, runs=3):
        best = float("inf")
        out = None
        for _ in range(runs):
            t0 = time.time()
            out = df.agg(
                F.sum(F.aggregate("grams", F.lit(0).cast("long"),
                                  lambda a, x: a + x)).alias("s"),
                F.sum("set_size").alias("z"),
                F.count("*").alias("n")).collect()[0]
            best = min(best, time.time() - t0)
        print(f"{tag:<45s} best={best:7.3f}s  checksum={out['s']} "
              f"set_sizes={out['z']} rows={out['n']}")
        return best, (out["s"], out["z"])

    t_a, c_a = timed("A pre-r10 single-projection shape",
                     _single_projection_shape(docs))
    t_b, c_b = timed("B production two-stage shingle_array",
                     shingle_array(docs))
    assert c_a == c_b, "shapes disagree — not comparable"
    print(f"\nA/B ratio (two-stage benefit): {t_a / t_b:.2f}x "
          f"on {n_docs} docs at {sf_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
