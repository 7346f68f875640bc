"""Round-10 follow-up to probe_simhash_cse.py: does shingle_array's
per-gram lambda re-evaluate the word-hash chain PER GRAM?

``shingle_array`` computes
``transform(sequence(0, size(ws)-n), i -> aggregate(slice(whs, i+1, n),
...))`` where ``whs = transform(ws, word_fingerprint)`` appears INSIDE
the per-gram lambda body. Interpreted HOFs evaluate the lambda body per
element with no subexpression cache across elements, so the suspicion
is O(words^2) tokenize+hash work per row. The two-stage shape
materializes ``whs`` as its own projected column first, then slices
the bound column per gram — O(words * n).

Run: python tools/probe_shingle_cse.py [sf_dir]
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, ".")

from datafusion_postgres_spark.operators.dedup import (  # noqa: E402
    FP_MOD, shingle_array,
)
from datafusion_postgres_spark.operators.text import (  # noqa: E402
    norm_text, word_fingerprint, words,
)


def _two_stage(docs, text_col="text", id_col="doc_id", n=3):
    whs_df = (docs.where(F.trim(F.col(text_col)) != "")
              .select(F.col(id_col).alias("id"),
                      F.transform(words(norm_text(F.col(text_col))),
                                  word_fingerprint).alias("whs")))
    whs = F.col("whs")
    gram_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(whs) - n, F.lit(0))),
        lambda i: F.aggregate(F.slice(whs, i + 1, n),
                              F.lit(0).cast("long"),
                              lambda acc, x: (acc * 31 + x) % FP_MOD))
    grams = F.sort_array(F.array_distinct(gram_hashes))
    return (whs_df.select("id", grams.alias("grams"))
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
        print(f"{tag:<40s} best={best:7.3f}s  checksum={out['s']} "
              f"set_sizes={out['z']} rows={out['n']}")
        return best, (out["s"], out["z"])

    cur = shingle_array(docs)
    two = _two_stage(docs)
    t_a, c_a = timed("A current shingle_array", cur)
    t_b, c_b = timed("B two-stage (whs materialized)", two)
    assert c_a == c_b, "shapes disagree — not comparable"
    print(f"\nA/B ratio (two-stage benefit): {t_a / t_b:.2f}x "
          f"on {n_docs} docs at {sf_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
