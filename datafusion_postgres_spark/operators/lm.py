"""Hashed n-gram language-model scoring — the perplexity quality filter.

CCNet/Gopher-class pipelines score web documents with a small LM trained
on a trusted corpus and drop the high-perplexity tail (public method:
Wenzek et al., "CCNet", 2019). A full KenLM is out of scope for a SQL
engine; what fits Spark-first is a HASHED BIGRAM model — the same
count-table-to-codegen pattern as operators/dsir.py:

* Train: bucket counts for bigram contexts (first word of each bigram)
  and bigram pairs, both hashed into ``dim`` buckets. Two bounded
  aggregations; only ``dim`` rows ever reach the driver.
* Score: per-bigram add-one-smoothed conditional log-prob
  ``ln((c12+1)/(c1+dim))`` looked up from two dim-sized LITERAL arrays —
  scoring the 100 TB side is a zero-shuffle codegen projection.

Cross-engine determinism: both log tables are fixed-point BIGINTs
(``floor(ln(c)*1e6+0.5)``), the per-document reduction is an exact
integer sum, and the only floating steps are the final divisions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from datafusion_postgres_spark.operators.litexpr import llit
from datafusion_postgres_spark.operators.text import (
    FP_MOD, norm_text, word_fingerprint, words,
)

LM_SCALE = 1_000_000


def _word_hashes(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    ws = F.filter(words(norm_text(F.col(text_col))), lambda w: w != "")
    return (df.where(F.size(ws) >= 2)
            .select(F.col(id_col).alias("id"),
                    F.transform(ws, word_fingerprint).alias("whs")))


def _bigram_buckets(dim: int):
    """(context_buckets, pair_buckets) column pair over a ``whs`` array:
    contexts are positions 0..n-2; pairs fold adjoining hashes."""
    fp = F.col("whs")
    n = F.size(fp)
    heads = F.slice(fp, 1, F.greatest(n - 1, F.lit(0)))
    ctx = F.transform(heads, lambda h: h % dim)
    pair = F.zip_with(heads,
                      F.slice(fp, 2, F.greatest(n - 1, F.lit(0))),
                      lambda a, b: (a * 31 + b) % FP_MOD % dim)
    return ctx, pair


def ngram_lm_score(docs: DataFrame, train: DataFrame,
                   text_col: str = "text", id_col: str = "doc_id",
                   dim: int = 4096) -> DataFrame:
    """(doc_id, n_bigrams, nll_sum, xent, ppl): cross-entropy in
    nats/bigram and its exp (perplexity) of every doc under the hashed
    bigram model of ``train``. Lower = more train-like; filter the high
    tail with filter_by_quantile for the CCNet gate."""
    tr = _word_hashes(train, text_col, id_col)
    ctx, pair = _bigram_buckets(dim)
    # ONE training scan: context and pair buckets explode together,
    # disambiguated by an offset (pairs live in [dim, 2*dim)) — halves
    # the train cost vs two aggregations, and the shuffle stays <= 2*dim
    # rows per task after partial agg
    both = F.concat(ctx, F.transform(pair, lambda b: b + dim))
    rows = (tr.select(F.explode(both).alias("b"))
            .groupBy("b").agg(F.count("*").alias("c")).collect())
    c1 = [0] * dim
    c12 = [0] * dim
    for r in rows:
        if r["b"] < dim:
            c1[r["b"]] = r["c"]
        else:
            c12[r["b"] - dim] = r["c"]
    # fixed-point log tables; lp(bigram) = lp12[b12] - lp1[b1] <= ~0
    lp12 = [math.floor(math.log(float(c + 1)) * LM_SCALE + 0.5) for c in c12]
    lp1 = [math.floor(math.log(float(c + dim)) * LM_SCALE + 0.5) for c in c1]
    # single array Literals (see dsir.py) — not dim-child CreateArrays
    lp12_arr = llit(lp12)
    lp1_arr = llit(lp1)

    sc = _word_hashes(docs, text_col, id_col)
    ctx_s, pair_s = _bigram_buckets(dim)
    per_pair = F.zip_with(
        ctx_s, pair_s,
        lambda b1, b12: F.element_at(lp12_arr, (b12 + 1).cast("int"))
        - F.element_at(lp1_arr, (b1 + 1).cast("int")))
    nll = -F.aggregate(per_pair, F.lit(0).cast("long"),
                       lambda acc, x: acc + x)
    n_bi = F.size(ctx_s).cast("bigint")
    xent = nll.cast("double") / LM_SCALE / n_bi
    return sc.select(
        F.col("id").alias(id_col),
        n_bi.alias("n_bigrams"),
        nll.alias("nll_sum"),
        xent.alias("xent"),
        (F.round(F.exp(xent), 6) + 0.0).alias("ppl"))
