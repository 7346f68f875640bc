"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023,
public paper): score every raw-corpus document by how target-like it is
under bag-of-hashed-ngram unigram models of a small TARGET corpus vs the
RAW corpus, then resample raw documents with probability proportional to
the importance weight. The reference engine has no such operator; this
serves the LLM training-data pipeline (pick web documents that "look
like" a high-quality target such as Wikipedia/books).

Scale shape (the part that matters at 100 TB):

* Feature hashing is the classifier's zero-shuffle codegen projection
  (unigram + adjoining-bigram polynomial fingerprints mod ``dim``).
* The two n-gram count tables aggregate to AT MOST ``dim`` rows each
  (map-side partial agg -> dim-row shuffle; dim ~ 10^4), regardless of
  corpus size. Only those bounded tables reach the driver.
* The per-bucket log-ratio table is embedded as a dim-sized array
  LITERAL, so scoring the 100 TB raw side is again a pure scan-speed
  projection — no join, no shuffle, no UDF.
* Gumbel-top-k resampling is an exact weighted sample without
  replacement via one TakeOrderedAndProject (no global sort).

Cross-engine determinism (oracle hash-match discipline, see
queries/__init__.py): per-bucket log-ratios are fixed-point BIGINTs
(``floor(ln(ratio)*1e6 + 0.5)``) so the per-document reduction is an
order-independent INTEGER sum; the ratio itself is one double division
of exact int64 products, bit-identical on both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from datafusion_postgres_spark.operators.litexpr import llit
from datafusion_postgres_spark.operators.text import (
    FP_MOD, norm_text, word_fingerprint, words,
)

LR_SCALE = 1_000_000  # fixed-point scale for per-bucket log-ratios


def _hashed_features(df: DataFrame, text_col: str, id_col: str, dim: int,
                     bigrams: bool, extra=None) -> DataFrame:
    """(id, feats ARRAY<BIGINT>) hashed unigram+bigram bucket ids — the
    same feature map as text.hashed_classifier_score, kept in a separate
    projection so the fingerprint chain is evaluated once. ``extra``
    carries additional (alias, Column-over-input) pairs through the
    projection (e.g. the target-membership flag)."""
    ws = F.filter(words(norm_text(F.col(text_col))), lambda w: w != "")
    fps = (df.where(F.size(ws) > 0)
           .select(F.col(id_col).alias("id"),
                   F.transform(ws, word_fingerprint).alias("__fp"),
                   *[c.alias(a) for a, c in (extra or [])]))
    fp = F.col("__fp")
    uni = F.transform(fp, lambda h: h % dim)
    feats = uni
    if bigrams:
        n = F.size(fp)
        big = F.zip_with(
            F.slice(fp, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(fp, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: (a * 31 + b) % FP_MOD % dim)
        feats = F.concat(uni, big)
    keep = [c for c in fps.columns if c != "__fp"]
    return fps.select(*keep[:1], feats.alias("feats"), *keep[1:])


def _bucket_counts(feat_df: DataFrame, dim: int) -> tuple[list[int], int]:
    """dim-sized occurrence counts (+ total) for one corpus: explode to
    (bucket) and aggregate — partial aggregation bounds the shuffle to
    <= dim rows per task, and only dim rows ever reach the driver."""
    rows = (feat_df.select(F.explode("feats").alias("h"))
            .groupBy("h").agg(F.count("*").alias("c"))
            .collect())
    counts = [0] * dim
    for r in rows:
        counts[r["h"]] = r["c"]
    return counts, sum(counts)


def log_ratio_table(target_counts: list[int], raw_counts: list[int],
                    target_total: int, raw_total: int,
                    dim: int) -> list[int]:
    """Fixed-point add-1-smoothed log-likelihood ratios per bucket:
    ``floor(ln((ct+1)*(Nr+dim) / ((cr+1)*(Nt+dim))) * 1e6 + 0.5)``.

    The numerator/denominator products are EXACT int64s; they convert to
    double independently on each engine (same nearest-even rounding from
    the same integer), one IEEE division, one libm ln, then the shared
    fixed-point rounding — the same discipline the math-function oracles
    use for libm outputs."""
    nr, nt = raw_total + dim, target_total + dim
    out = []
    for h in range(dim):
        num = (target_counts[h] + 1) * nr
        den = (raw_counts[h] + 1) * nt
        # float(num)/float(den), NOT num/den: Python's int/int is
        # single-rounded from the exact rational, while SQL engines round
        # each int64 to double first — mimic the engines
        out.append(math.floor(math.log(float(num) / float(den)) * LR_SCALE
                              + 0.5))
    return out


def dsir_weights(raw: DataFrame, target: DataFrame | None = None,
                 text_col: str = "text", id_col: str = "doc_id",
                 dim: int = 4096, bigrams: bool = True,
                 target_filter=None) -> DataFrame:
    """Importance weights for every raw document: (doc_id, n_features,
    lr_sum — the fixed-point sum of per-feature log-ratios, exact BIGINT
    — and log_ratio = lr_sum / 1e6, the bag LLR ``log p_target(x) -
    log p_raw(x)``). Higher = more target-like.

    Bounded count aggregation(s), then ONE zero-shuffle scoring
    projection over the raw side. When the target is a SUBSET of the raw
    corpus selected by a predicate, pass ``target_filter`` (a boolean
    Column over raw's columns) instead of ``target``: both count tables
    then come from a SINGLE corpus scan (count + conditional count per
    bucket) — at 100 TB that halves the training cost, which dominates.
    """
    if (target is None) == (target_filter is None):
        raise ValueError("pass exactly one of target / target_filter")
    if target_filter is not None:
        feats = _hashed_features(raw, text_col, id_col, dim, bigrams,
                                 extra=[("__t", target_filter)])
        rows = (feats.select(F.explode("feats").alias("h"), "__t")
                .groupBy("h")
                .agg(F.count("*").alias("rc"),
                     F.count_if(F.col("__t")).alias("tc"))
                .collect())
        raw_counts, tgt_counts = [0] * dim, [0] * dim
        for r in rows:
            raw_counts[r["h"]], tgt_counts[r["h"]] = r["rc"], r["tc"]
        raw_total, tgt_total = sum(raw_counts), sum(tgt_counts)
        raw_feats = feats.drop("__t")
    else:
        raw_feats = _hashed_features(raw, text_col, id_col, dim, bigrams)
        tgt_feats = _hashed_features(target, text_col, id_col, dim, bigrams)
        raw_counts, raw_total = _bucket_counts(raw_feats, dim)
        tgt_counts, tgt_total = _bucket_counts(tgt_feats, dim)
    lr = log_ratio_table(tgt_counts, raw_counts, tgt_total, raw_total, dim)
    # ONE parsed array Literal (litexpr.llit), not F.array of dim
    # children and not F.lit(list) (per-element py4j — seconds of driver
    # time per call at dim=4096)
    lr_arr = llit(lr)
    lr_sum = F.aggregate(
        "feats", F.lit(0).cast("long"),
        lambda acc, h: acc + F.element_at(lr_arr, (h + 1).cast("int")))
    return raw_feats.select(
        F.col("id").alias(id_col),
        F.size("feats").cast("bigint").alias("n_features"),
        lr_sum.alias("lr_sum"),
        (lr_sum.cast("double") / LR_SCALE).alias("log_ratio"))


def dsir_resample(raw: DataFrame, target: DataFrame | None, k: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  dim: int = 4096, bigrams: bool = True,
                  seed: int = 7, temperature: float = 1.0,
                  target_filter=None) -> DataFrame:
    """Gumbel-top-k importance resampling: an EXACT weighted sample of
    ``k`` raw docs without replacement, w_i proportional to
    exp(log_ratio/temperature), drawn deterministically from a seeded
    portable hash (reproducible across runs AND engines — no RNG state).

    key_i = log w_i + Gumbel(u_i), u_i from the doc-id LCG hash; the
    top-k keys ARE the sample (Gumbel-max trick). Selection is a
    TakeOrderedAndProject — per-partition heaps, no global sort. The key
    stays fixed-point: gumbel and the temperature division are each one
    libm/IEEE step rounded to 1e-6, added to the integer lr_sum."""
    w = dsir_weights(raw, target, text_col, id_col, dim, bigrams,
                     target_filter=target_filter)
    # u in (0, 1): ((id*a+b) mod M + 1) / (M+1), portable LCG arithmetic
    m = 2_147_483_647
    u = ((F.col(id_col) * 1_103_515_245 + 12_345 + seed) % m + m) % m
    u = (u + 1).cast("double") / (m + 1)
    gumbel = -F.log(-F.log(u))
    key = (F.floor(F.col("lr_sum") / F.lit(temperature) +
                   gumbel * LR_SCALE + F.lit(0.5)).cast("long"))
    return (w.withColumn("sample_key", key)
            .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
            .limit(k))


def domain_mixture_reweight(scored: DataFrame, domain_col: str = "source",
                            nll_col: str = "nll_sum",
                            nb_col: str = "n_bigrams",
                            eta: float = 1.0) -> DataFrame:
    """One-shot domain reweighting from LM loss — the static flavor of
    DoReMi's Group-DRO update (Xie et al. 2023, public): domains whose
    cross-entropy under the reference LM exceeds the corpus mean are
    upweighted exponentially, w_d ∝ share_d · exp(eta·(L_d − L̄)),
    then normalized. Feed the output to sample_mixture as per-domain
    rates for the next training mix.

    Input is the per-doc frame from :func:`operators.lm.ngram_lm_score`
    joined with the domain column — nll_sum is already a FIXED-POINT
    INTEGER there, so every aggregate here is an exact integer sum
    (order-independent): per-domain and corpus cross-entropies are one
    double division each, the unnormalized weight is floored to a
    fixed-point integer u6, and the normalizer is an exact integer SUM
    over u6 — the repo's never-round-a-float-sum convention end to end,
    which is what lets DuckDB replay the whole computation bit-for-bit.

    Only LM-eligible docs (≥ 2 bigrams) participate; n_docs counts
    those. Scale shape: one groupBy(domain) with map-side combine over
    integer sums, two broadcast joins of domain-bounded one-row / k-row
    aggregates — nothing corpus-sized moves."""
    dom = (scored.groupBy(domain_col)
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum(nll_col).cast("long").alias("nll"),
                F.sum(nb_col).cast("long").alias("nb")))
    tot = dom.agg(F.sum("n_docs").cast("long").alias("N"),
                  F.sum("nll").cast("long").alias("nllT"),
                  F.sum("nb").cast("long").alias("nbT"))
    j = dom.crossJoin(F.broadcast(tot))
    xent = F.col("nll").cast("double") / 1_000_000 / F.col("nb")
    xbar = F.col("nllT").cast("double") / 1_000_000 / F.col("nbT")
    u6 = F.floor(
        F.col("n_docs").cast("double") / F.col("N") *
        F.exp(F.lit(float(eta)) * (xent - xbar)) * 1_000_000 +
        F.lit(0.5)).cast("long")
    w = j.select(domain_col, "n_docs",
                 (F.round(xent, 6) + 0.0).alias("xent"),
                 u6.alias("__u6"))
    norm = w.agg(F.sum("__u6").cast("long").alias("__U"))
    return (w.crossJoin(F.broadcast(norm))
            .select(domain_col, "n_docs", "xent",
                    (F.round(F.col("__u6").cast("double") /
                             F.col("__U"), 6) + 0.0).alias("weight")))
