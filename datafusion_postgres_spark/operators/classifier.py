"""Distributed TRAINED text classifier: logistic regression over hashed
unigram+bigram features, with deterministic fixed-point integer
gradients.

This is the trained-weights counterpart to
:func:`operators.text.hashed_classifier_score` (which scores with a
deterministic LCG weight table and documents "swapping in real trained
weights" as the intended upgrade): same normalization, same portable
polynomial word fingerprints, same bucket hashing — so a model trained
here scores through the identical zero-shuffle codegen projection.

Scale shape (the Lloyd's driver-loop pattern shared with
``kmeans_centroids`` / ``bpe_train``): the corpus reduces ONCE to a
persisted (label, n_features, feature-bucket array) frame; each
iteration is one pass over it — per-document margins and gradient
factors are pure codegen against the current weight literal (one
``array<long>`` of ``dim`` entries), and the per-bucket gradient comes
back through a single partial-aggregated ``groupBy(bucket)`` whose
shuffle volume is ``dim`` running sums per partition, independent of
corpus size. The ``dim`` weights live on the driver between iterations.

Determinism / oracle-ability: gradients and weights are FIXED-POINT
INTEGERS (the trick ``dsir.py`` uses for LLR weights) — integer sums
commute, so training is bit-reproducible under any partitioning and
replayable exactly by a DuckDB oracle. The single transcendental step
(the sigmoid) is computed from exact integer inputs and rounded to 9
decimals before re-entering integer space, so a last-ulp ``exp``
difference between libm and java.lang.Math cannot flip a gradient.

Model: per document with feature multiset x, margin m = mean bucket
weight = (1/|x|) * sum(w[h] for h in x); p = sigmoid(m); logistic loss.
dL/dw[b] = sum over documents of (p - y) * count(b in x) / |x|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datafusion_postgres_spark.operators.litexpr import llit
from datafusion_postgres_spark.operators.text import (
    FP_MOD, norm_text, word_fingerprint, words,
)

# weight / gradient fixed-point scale (1e-6 resolution). Shared scale
# makes the update rule pure integers: w_fp -= floor(g_fp/lr_den + 0.5).
SCALE = 1_000_000


def _feature_frame(df: DataFrame, label_col: str | None,
                   text_col: str, id_col: str, dim: int,
                   bigrams: bool) -> DataFrame:
    """(id, [y,] nf, feats array<long>) — the hashed bag-of-ngrams.

    Mirrors hashed_classifier_score's extraction exactly (unigram
    fingerprint % dim; bigram (a*31+b) % FP_MOD % dim) so trained
    weights score through the same buckets. The tokenize/hash chains
    build as single ``F.expr`` parses (text.word_hashes_sql — round-10;
    identical trees, value-pinned)."""
    from datafusion_postgres_spark.operators.text import word_hashes_sql
    whs_sql = word_hashes_sql(f"`{text_col}`")
    cols = [F.col(id_col)]
    if label_col is not None:
        cols.append(F.col(label_col).cast("int").alias("y"))
    fps = (df.where(F.expr(f"size({whs_sql}) > 0"))
           .select(*cols, F.expr(whs_sql).alias("__fp")))
    feats_sql = f"transform(__fp, h -> h % {dim})"
    if bigrams:
        g = "greatest(size(__fp) - 1, 0)"
        feats_sql = (f"concat({feats_sql}, "
                     f"zip_with(slice(__fp, 1, {g}), slice(__fp, 2, {g}), "
                     f"(a, b) -> (a * 31 + b) % {FP_MOD} % {dim}))")
    out = [F.col(id_col)]
    if label_col is not None:
        out.append(F.col("y"))
    return fps.select(*out,
                      F.expr(f"size({feats_sql})").alias("nf"),
                      F.expr(feats_sql).alias("feats"))


def _margin_expr(w_fp: list[int]):
    """Codegen margin from a weight literal: sum(w[h]) / (nf * SCALE).

    The numerator is an exact integer fold; the denominator multiply
    and the single division are the only float ops — identical in any
    engine (nf * SCALE is exact in double far beyond real doc sizes).

    ALL-ZERO weights (every training run's first iteration) fold to a
    constant 0.0 up front: the feature fold would sum dim zeros per
    document through an interpreted HOF, and 0/(nf*SCALE) is +0.0
    exactly — bit-identical to evaluating the fold (round-10 opt)."""
    if not any(w_fp):
        return F.lit(0.0)
    w_lit = llit(w_fp)
    num = F.aggregate(
        "feats", F.lit(0).cast("long"),
        lambda acc, h: acc + F.element_at(w_lit, (h + 1).cast("int")))
    return num.cast("double") / (F.col("nf").cast("double") *
                                 F.lit(float(SCALE)))


def _bucket_gradients(feats_df: DataFrame, w_fp: list[int]) -> DataFrame:
    """One training iteration's per-bucket integer gradient: (h, g).

    Output rows ≤ dim (the buckets actually present); the groupBy is
    partial-aggregated, so shuffle volume is bounded by
    dim x n_partitions regardless of corpus size (scale-pinned in
    tests/test_scale_stress.py)."""
    margin = _margin_expr(w_fp)
    p9 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 9)
    gd = F.floor((p9 - F.col("y").cast("double")) /
                 F.col("nf").cast("double") *
                 F.lit(float(SCALE)) + F.lit(0.5)).cast("long")
    return (feats_df
            .select(gd.alias("gd"), F.explode("feats").alias("h"))
            .groupBy("h").agg(F.sum("gd").alias("g")))


def train_text_classifier(df: DataFrame, label_col: str,
                          text_col: str = "text", id_col: str = "doc_id",
                          dim: int = 4096, bigrams: bool = True,
                          iters: int = 4, lr_den: int = 2) -> list[int]:
    """Train; returns the fixed-point weight table (``dim`` ints,
    true weight = w_fp/SCALE). Effective learning rate = 1/lr_den.

    Per iteration: gd = floor((round(sigmoid(m),9) - y)/nf * SCALE + .5)
    per document (integer), summed per bucket (one corpus pass, dim-row
    shuffle), then w_fp[b] -= floor(g/lr_den + 0.5) on the driver."""
    _check_label_type(df, label_col)
    feats_df = _feature_frame(df, label_col, text_col, id_col,
                              dim, bigrams).persist()
    try:
        return _train_on_feats(feats_df, dim, iters, lr_den)
    finally:
        feats_df.unpersist()


def _check_label_type(df: DataFrame, label_col: str) -> None:
    t = df.schema[label_col].dataType.simpleString()
    if not (t in ("boolean",) or t.startswith(("int", "bigint", "smallint",
                                               "tinyint"))):
        raise ValueError(
            f"label column {label_col!r} has type {t}; expected an "
            "integer/boolean 0-1 label (a string would silently cast to "
            "NULL and poison every gradient)")


def _train_on_feats(feats_df: DataFrame, dim: int, iters: int,
                    lr_den: int) -> list[int]:
    w_fp = [0] * dim
    for _ in range(iters):
        grads = _bucket_gradients(feats_df, w_fp).collect()  # ≤ dim rows
        for r in grads:
            g = int(r["g"])
            # floor(g/lr_den + 0.5) in exact integer arithmetic
            w_fp[int(r["h"])] -= (2 * g + lr_den) // (2 * lr_den)
    return w_fp


def _score_cols(w_fp: list[int], id_col: str) -> list:
    margin = _margin_expr(w_fp)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return [F.col(id_col),
            F.col("nf").cast("bigint").alias("n_features"),
            (F.round(margin, 6) + 0.0).alias("margin"),
            (F.round(score, 6) + 0.0).alias("clf_score")]


def train_and_score(df: DataFrame, label_col: str,
                    text_col: str = "text", id_col: str = "doc_id",
                    dim: int = 4096, bigrams: bool = True,
                    iters: int = 4, lr_den: int = 2,
                    with_label: bool = False) -> DataFrame:
    """Train on ``df`` and score the SAME rows through ONE shared
    feature-extraction pass (round-10 optimization).

    ``train_text_classifier`` + ``trained_classifier_score`` run the
    hashed-ngram projection (tokenize + fingerprint + bigram hashing —
    the expensive stage) twice: once into the persisted training frame
    and once more for scoring. When the scored corpus IS the training
    corpus, one pass suffices: the feature frame is generation-cached
    (operators/cachectl.py) so the returned scoring plan reads the same
    cached rows the gradient iterations did. Values are identical to
    the two-pass composition — same rows, same buckets, same
    arithmetic (pinned in tests).

    ``with_label=True`` appends the training label as column ``y``
    (evaluation flows join it back otherwise)."""
    from datafusion_postgres_spark.operators.cachectl import (
        cache_generation,
    )
    _check_label_type(df, label_col)
    feats_df = cache_generation(
        "classifier_train_and_score",
        _feature_frame(df, label_col, text_col, id_col, dim, bigrams))
    w_fp = _train_on_feats(feats_df, dim, iters, lr_den)
    cols = _score_cols(w_fp, id_col)
    if with_label:
        cols.append(F.col("y"))
    return feats_df.select(*cols)


def save_weights(w_fp: list[int], path: str, bigrams: bool = True) -> None:
    """Persist a trained model as JSON (dim integers + the feature
    config needed to score identically later). Weights are exact ints,
    so save/load round-trips bit-for-bit — train offline once, load at
    ingest/serving time."""
    import json
    with open(path, "w") as f:
        json.dump({"scale": SCALE, "dim": len(w_fp),
                   "bigrams": bool(bigrams),
                   "weights": [int(v) for v in w_fp]}, f)


def load_weights(path: str) -> tuple[list[int], bool]:
    """(weights, bigrams) from :func:`save_weights`; refuses a model
    trained under a different fixed-point scale."""
    import json
    with open(path) as f:
        m = json.load(f)
    if m.get("scale") != SCALE:
        raise ValueError(
            f"model scale {m.get('scale')} != engine scale {SCALE}")
    w = [int(v) for v in m["weights"]]
    if len(w) != m.get("dim"):
        raise ValueError("model dim does not match weight count")
    return w, bool(m.get("bigrams", True))


def trained_classifier_score(df: DataFrame, w_fp: list[int],
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             bigrams: bool = True) -> DataFrame:
    """Score with trained fixed-point weights: (id, n_features, margin,
    clf_score) — one zero-shuffle codegen projection, the same plumbing
    as hashed_classifier_score with element_at on the weight literal
    instead of the LCG expression (its documented swap-in point)."""
    feats_df = _feature_frame(df, None, text_col, id_col,
                              len(w_fp), bigrams)
    return feats_df.select(*_score_cols(w_fp, id_col))


def classifier_term_weights(df: DataFrame, w_fp: list[int], k: int = 20,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            ascending: bool = False) -> DataFrame:
    """Interpretability view of a trained model: the top-k corpus words
    by learned weight — (word, df, bucket, weight). Each word maps to
    its unigram bucket (the same fingerprint % dim as training), so
    colliding words share a weight; document frequency is shown so a
    reader can judge whether a bucket's weight is driven by the word at
    hand. One word-keyed aggregation (map-side combined) + a pure
    lookup against the weight literal; total order (weight, word) makes
    the top-k deterministic and DuckDB-replayable."""
    dim = len(w_fp)
    ws = F.filter(words(norm_text(F.col(text_col))), lambda w: w != "")
    vocab = (df.select(F.explode(F.array_distinct(ws)).alias("word"))
             .groupBy("word")
             .agg(F.count("*").cast("bigint").alias("df")))
    bucket = (word_fingerprint(F.col("word")) % dim).cast("int")
    w_lit = llit(w_fp)
    weight = (F.element_at(w_lit, bucket + 1).cast("double") /
              F.lit(1_000_000.0))
    out = vocab.select("word", "df", bucket.alias("bucket"),
                       (F.round(weight, 6) + 0.0).alias("weight"))
    order = ([F.col("weight").asc(), F.col("word").asc()] if ascending
             else [F.col("weight").desc(), F.col("word").asc()])
    return out.orderBy(*order).limit(k)


def clf_auc(scored: DataFrame, label_col: str = "y",
            score_col: str = "clf_score") -> DataFrame:
    """ROC AUC of a scored corpus, scale-safely and integer-exactly.

    The rank-sum (Mann-Whitney) AUC normally needs a global sort; like
    filter_by_quantile(mode='hist'), the discretized score (ROUND(x,6))
    makes it a BOUNDED-histogram computation instead: one count
    aggregate per distinct score value, a cumulative window over that
    histogram (score-cardinality rows, never corpus rows), and the
    tie-corrected pair count

        AUC = sum_s[ pos(s) * (2 * neg_below(s) + neg(s)) ]
              / (2 * P * N)

    — every term an exact integer; the single final double division is
    the only float op, so the number replays bit-for-bit in SQL.
    Returns one row: (n_pos, n_neg, auc)."""
    # enforce the bounded-histogram invariant HERE, not by caller
    # convention: raw continuous scores would make the histogram
    # corpus-cardinality and the cumulative pass a corpus-sized
    # sort. ROUND(x,6) caps distinct values at ~2e6 for
    # scores in [-1,1] and is idempotent for already-rounded scores
    # (every registered query rounds to 6 before this point).
    s = F.round(F.col(score_col), 6).alias("__s")
    hist = (scored.groupBy(s)
            .agg(F.sum(F.col(label_col).cast("long")).alias("pos"),
                 F.sum(F.lit(1) - F.col(label_col).cast("long"))
                 .alias("neg")))
    return _auc_from_hist(hist)


def _auc_from_hist(hist: DataFrame) -> DataFrame:
    """Tie-corrected AUC from a (__s, pos, neg) histogram.

    Cumulative neg_below is a BANDED TWO-PASS (the window_ntile
    bucket-offset shape, queries/relational.py): a coarse bucket
    floor(__s*1000) is monotone in __s, so per-bucket neg totals give
    cumulative offsets through an unpartitioned window over the TINY
    bucket aggregate (~1000 rows per unit of score range), and the
    histogram itself only ever crosses a PARTITIONED window (partition
    = bucket, <= 1000 round-6 values each). No task holds more than
    max(n_buckets, 1000) rows — the single-task ~2e6-row histogram
    window this replaces was the repo's widest bounded node.

    Pair counts and the 2*P*N denominator accumulate as DECIMAL(38,0):
    at ~1e10+ docs per class pos*neg products exceed int64 and a BIGINT
    sum would silently overflow into a wrong AUC. The one double cast
    happens at the final division (exact below 2^53; beyond that the
    1e-16 relative error is invisible at ROUND(.,6))."""
    from pyspark.sql import Window

    hb = hist.withColumn("__b", F.floor(F.col("__s") * 1000))
    bc = hb.groupBy("__b").agg(F.sum("neg").alias("bn"))
    w_cum = (Window.orderBy("__b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = bc.select(
        "__b", F.coalesce(F.sum("bn").over(w_cum), F.lit(0)).alias("off"))
    w_in = (Window.partitionBy("__b").orderBy("__s")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = (hb.join(F.broadcast(offsets), "__b")
           .withColumn("neg_below",
                       F.col("off") + F.sum("neg").over(w_in)
                       - F.col("neg")))

    def dec(c):
        return F.col(c).cast("decimal(38,0)")

    agg = cum.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(dec("pos") * (F.lit(2).cast("decimal(38,0)")
                            * dec("neg_below") + dec("neg"))).alias("num"))
    # single-class corpus: AUC is mathematically undefined — emit an
    # explicit NULL rather than a div-by-zero artifact
    return agg.select(
        "n_pos", "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
               F.round(F.col("num").cast("double") /
                       (2.0 * F.col("n_pos") * F.col("n_neg")), 6) + 0.0)
        .alias("auc"))


def clf_pr_curve(scored: DataFrame, thresholds: list[float],
                 label_col: str = "y",
                 score_col: str = "clf_score") -> DataFrame:
    """Precision/recall at fixed thresholds — the calibration table a
    quality-gate operator is tuned from (pick the threshold whose kept
    volume and precision match the corpus budget).

    One aggregate pass over the corpus computes per-threshold TP and
    predicted-positive counts as exact integer conditional sums
    (map-side combined — the shuffle is len(thresholds) running sums
    per partition); precision/recall are each ONE double division of
    those integers, so the table replays bit-for-bit in SQL.

    The single wide aggregate row is COLLECTED to the driver (it is
    one row of 2*len(thresholds)+1 integers) and the per-threshold
    output built from literal rows: fanning out len(thresholds)
    projections of the same lazy aggregate relied on Spark's
    exchange-reuse optimization firing — if a plan perturbation or AQE
    broke the reuse, the corpus would silently re-aggregate once per
    threshold. The divisions stay Spark expressions so ROUND semantics
    match the SQL oracle exactly."""
    if not thresholds:
        raise ValueError("clf_pr_curve needs at least one threshold")
    aggs = [F.sum(F.col(label_col).cast("long")).alias("n_pos")]
    for i, t in enumerate(thresholds):
        pred = (F.col(score_col) >= F.lit(t)).cast("long")
        aggs.append(F.sum(pred).alias(f"pp_{i}"))
        aggs.append(F.sum(pred * F.col(label_col).cast("long"))
                    .alias(f"tp_{i}"))
    wide = scored.agg(*aggs).collect()[0]          # ONE corpus pass
    n_pos = int(wide["n_pos"] or 0)
    spark = scored.sparkSession
    cells = spark.createDataFrame(
        [(float(t), int(wide[f"pp_{i}"] or 0), int(wide[f"tp_{i}"] or 0))
         for i, t in enumerate(thresholds)],
        "threshold double, n_pred_pos long, tp long")
    return cells.select(
        "threshold",
        F.col("n_pred_pos").cast("bigint").alias("n_pred_pos"),
        F.col("tp").cast("bigint").alias("tp"),
        (F.round(F.col("tp") /
                 F.greatest(F.col("n_pred_pos"), F.lit(1)), 6) + 0.0)
        .alias("precision"),
        (F.round(F.col("tp") / F.greatest(F.lit(n_pos), F.lit(1)), 6)
         + 0.0).alias("recall"))
