"""Trained hashed-ngram classifier (operators/classifier.py): fixed-point
logistic regression — determinism, learning, reference-impl equality,
and the zero-shuffle scoring plan."""

import math
import random

import pytest
from pyspark.sql import functions as F

from datafusion_postgres_spark.operators.classifier import (
    SCALE, train_text_classifier, trained_classifier_score,
)

GOOD = ["the quick brown fox jumps over lazy dogs daily",
        "a gentle rain falls on the quiet green meadow",
        "bright stars shine over the calm blue ocean tonight"]
BAD = ["buy cheap pills now click here winner prize",
       "free money casino jackpot click buy now spam",
       "winner winner prize claim free casino bonus now"]


@pytest.fixture(scope="module")
def labeled(spark):
    random.seed(7)
    rows = []
    for i in range(60):
        base = random.choice(GOOD if i % 2 == 0 else BAD)
        toks = base.split()
        random.shuffle(toks)
        rows.append((i, " ".join(toks), i % 2 == 0))
    return spark.createDataFrame(rows, ["doc_id", "text", "is_good"])


class TestTrainedClassifier:
    def test_separates_planted_classes(self, labeled):
        w = train_text_classifier(labeled, "is_good", dim=512, iters=6)
        scored = (trained_classifier_score(labeled, w)
                  .join(labeled.select("doc_id", "is_good"), "doc_id"))
        acc = (scored.where((F.col("clf_score") > 0.5) ==
                            F.col("is_good")).count() / 60)
        assert acc == 1.0

    def test_deterministic_under_partitioning(self, labeled):
        w_a = train_text_classifier(labeled.repartition(7), "is_good",
                                    dim=512, iters=3)
        w_b = train_text_classifier(labeled.repartition(2), "is_good",
                                    dim=512, iters=3)
        assert w_a == w_b

    def test_scoring_zero_shuffle(self, labeled):
        from datafusion_postgres_spark.plans.inspect import count_shuffles
        w = [0] * 128
        assert count_shuffles(trained_classifier_score(labeled, w)) == 0

    def test_matches_local_reference_impl(self, spark):
        """Pure-Python replay of the exact training arithmetic on a tiny
        corpus must reproduce the distributed weights bit-for-bit."""
        rows = [(1, "aa bb aa", 1), (2, "cc dd", 0),
                (3, "aa bb", 1), (4, "dd dd cc", 0)]
        df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
        dim, iters, lr_den = 32, 3, 2
        got = train_text_classifier(df, "y", dim=dim, bigrams=True,
                                    iters=iters, lr_den=lr_den)

        fp_mod, base = 1_000_000_007, 31

        def wfp(w):
            h = 0
            for ch in w:
                h = (h * base + ord(ch)) % fp_mod
            return h

        docs = []
        for _, text, y in rows:
            ws = text.split()
            fps = [wfp(w) for w in ws]
            feats = [h % dim for h in fps] + [
                (a * base + b) % fp_mod % dim
                for a, b in zip(fps, fps[1:])]
            docs.append((y, feats))
        w_fp = [0] * dim
        for _ in range(iters):
            grads = [0] * dim
            for y, feats in docs:
                nf = len(feats)
                m = sum(w_fp[h] for h in feats) / (nf * float(SCALE))
                p = round(1.0 / (1.0 + math.exp(-m)), 9)
                gd = math.floor((p - y) / nf * SCALE + 0.5)
                for h in feats:
                    grads[h] += gd
            for h in range(dim):
                w_fp[h] -= (2 * grads[h] + lr_den) // (2 * lr_den)
        assert got == w_fp

    def test_loss_decreases(self, labeled):
        """Logistic loss after training < loss at w=0 (ln 2)."""
        w = train_text_classifier(labeled, "is_good", dim=512, iters=6)
        scored = (trained_classifier_score(labeled, w)
                  .join(labeled.select(
                      "doc_id", F.col("is_good").cast("int").alias("y")),
                      "doc_id"))
        loss = scored.select(F.avg(
            -F.col("y") * F.log(F.col("clf_score")) -
            (1 - F.col("y")) * F.log(1 - F.col("clf_score")))
            .alias("l")).collect()[0]["l"]
        # w=0 gives exactly ln 2; 6 iterations of the mean-margin model
        # reach ~0.40 on this corpus — pin a meaningful drop
        assert loss < math.log(2) * 0.65

    def test_save_load_roundtrip(self, labeled, tmp_path):
        from datafusion_postgres_spark.operators.classifier import (
            load_weights, save_weights)
        w = train_text_classifier(labeled, "is_good", dim=128, iters=2)
        p = str(tmp_path / "model.json")
        save_weights(w, p)
        w2, bigrams = load_weights(p)
        assert w2 == w and bigrams is True
        a = trained_classifier_score(labeled, w).orderBy("doc_id").collect()
        b = trained_classifier_score(labeled, w2,
                                     bigrams=bigrams).orderBy(
                                         "doc_id").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_load_rejects_wrong_scale(self, tmp_path):
        import json
        from datafusion_postgres_spark.operators.classifier import (
            load_weights)
        p = str(tmp_path / "bad.json")
        with open(p, "w") as f:
            json.dump({"scale": 1000, "dim": 2, "bigrams": True,
                       "weights": [1, 2]}, f)
        with pytest.raises(ValueError):
            load_weights(p)

    def test_string_label_rejected(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world", "yes")], ["doc_id", "text", "y"])
        with pytest.raises(ValueError, match="label column"):
            train_text_classifier(df, "y", dim=32, iters=1)

    def test_empty_docs_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world", 1), (2, "   ", 0)],
            ["doc_id", "text", "y"])
        w = train_text_classifier(df, "y", dim=32, iters=1)
        out = trained_classifier_score(df, w)
        assert [r["doc_id"] for r in out.collect()] == [1]

    def test_train_and_score_equals_composition(self, labeled):
        """The round-10 shared-feature-pass path (train_and_score) must
        return exactly what train_text_classifier followed by
        trained_classifier_score returns — same rows, same margins,
        same scores, and with_label=True rides the label on the same
        rows the two-pass shape attached via a join."""
        from datafusion_postgres_spark.operators.classifier import (
            train_and_score)
        lab = labeled.withColumn("y", F.col("is_good").cast("int"))
        w = train_text_classifier(lab, "y", dim=256, iters=3)
        want = sorted(
            tuple(r) for r in trained_classifier_score(lab, w)
            .select("doc_id", "n_features", "margin", "clf_score")
            .collect())
        got_df = train_and_score(lab, "y", dim=256, iters=3,
                                 with_label=True)
        got = sorted(
            tuple(r) for r in got_df
            .select("doc_id", "n_features", "margin", "clf_score")
            .collect())
        assert got == want
        joined = sorted(
            tuple(r) for r in trained_classifier_score(lab, w)
            .join(lab.select("doc_id", "y"), "doc_id")
            .select("doc_id", "y").collect())
        assert sorted(tuple(r) for r in
                      got_df.select("doc_id", "y").collect()) == joined

    def test_zero_weight_margin_constant_folds(self, labeled):
        """All-zero weights (every run's first iteration) score as a
        constant 0.0 margin — identical to evaluating the feature fold
        against a zero table."""
        from datafusion_postgres_spark.operators.classifier import (
            _margin_expr)
        # the constant-fold branch fires
        assert "0.0" in str(_margin_expr([0] * 8))
        zeros = trained_classifier_score(labeled, [0] * 64)
        rows = zeros.select("margin", "clf_score").distinct().collect()
        assert [(r["margin"], r["clf_score"]) for r in rows] == [(0.0, 0.5)]


class TestClfAuc:
    """Bounded-histogram rank-sum AUC (round-7 eval companion)."""

    def test_matches_sklearn_free_reference(self, spark):
        """AUC equals the naive pair-counting definition (ties = 1/2),
        computed locally."""
        import random
        from datafusion_postgres_spark.operators.classifier import clf_auc
        rng = random.Random(13)
        rows = [(i, rng.randint(0, 1),
                 round(rng.choice([0.1, 0.3, 0.3, 0.6, 0.9]), 6))
                for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, y int, s double")
        got = clf_auc(df, "y", "s").collect()[0]
        pos = [s for _, y, s in rows if y == 1]
        neg = [s for _, y, s in rows if y == 0]
        num = sum((1.0 if p > n else 0.5 if p == n else 0.0)
                  for p in pos for n in neg)
        want = round(num / (len(pos) * len(neg)), 6)
        assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))
        assert abs(got["auc"] - want) < 1e-9

    def test_degenerate_and_perfect(self, spark):
        from datafusion_postgres_spark.operators.classifier import clf_auc
        perfect = spark.createDataFrame(
            [(1, 1, 0.9), (2, 1, 0.8), (3, 0, 0.2), (4, 0, 0.1)],
            "doc_id long, y int, s double")
        assert clf_auc(perfect, "y", "s").collect()[0]["auc"] == 1.0
        inverted = spark.createDataFrame(
            [(1, 0, 0.9), (2, 1, 0.1)], "doc_id long, y int, s double")
        assert clf_auc(inverted, "y", "s").collect()[0]["auc"] == 0.0

    def test_shuffle_carries_histogram_not_corpus(self, spark):
        from datafusion_postgres_spark.operators.classifier import clf_auc
        from datafusion_postgres_spark.plans.inspect import (
            shuffle_rows_written,
        )
        df = spark.createDataFrame(
            [(i, i % 2, float(i % 5)) for i in range(20000)],
            "doc_id long, y int, s double")
        out = clf_auc(df, "y", "s")
        out.collect()
        assert shuffle_rows_written(out) < 1000  # 5 distinct scores

    def test_no_histogram_sized_unpartitioned_window(self, spark):
        """Round-8 verdict #7: the cumulative pass is the window_ntile
        bucket-offset two-pass — the histogram only ever crosses a
        window PARTITIONED by the coarse bucket; the unpartitioned
        window sees only the tiny bucket aggregate."""
        import re
        from datafusion_postgres_spark.operators.classifier import clf_auc
        from datafusion_postgres_spark.plans.inspect import executed_nodes
        # 5000 distinct round-6 scores spanning exactly 5 coarse buckets
        rows = [(i, i % 2, round(i * 1e-6, 6)) for i in range(5000)]
        df = spark.createDataFrame(rows, "doc_id long, y int, s double")
        out = clf_auc(df, "y", "s")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the histogram-sized window is PARTITIONED by the bucket:
        # windowspecdefinition(__b, __s ASC ...) — partition col first
        assert re.search(r"windowspecdefinition\(__b#\d+L?, __s", plan)
        # the tiny offsets window orders by __b alone (bucket aggregate)
        assert re.search(r"windowspecdefinition\(__b#\d+L? ASC", plan)
        # the OLD shape — unpartitioned window straight over the score
        # histogram — must be gone
        assert not re.search(r"windowspecdefinition\(__s#\d+ ASC", plan)
        # the offsets path exists as its own tiny exchanges (5 bucket
        # rows) and nothing anywhere carries more than the histogram
        ex = [n["metrics"].get("shuffleRecordsWritten", 0)
              for n in executed_nodes(out)
              if n["cls"] == "ShuffleExchangeExec"]
        assert 5 in ex and max(ex) <= 5000

    def test_overflow_safe_pair_counts(self, spark):
        """ADVICE r8 #1: pos*neg pair products at ~1e10 docs/class
        exceed int64; counts accumulate as DECIMAL(38,0) so the AUC
        stays exact instead of silently overflowing."""
        from datafusion_postgres_spark.operators.classifier import (
            _auc_from_hist,
        )
        hist = spark.createDataFrame(
            [(0.1, 0, 3_000_000_000),
             (0.5, 2_000_000_000, 2_000_000_000),
             (0.9, 3_000_000_000, 0)],
            "__s double, pos long, neg long")
        got = _auc_from_hist(hist).collect()[0]
        p, n = 5_000_000_000, 5_000_000_000
        # exact integer num: sum pos(s)*(2*neg_below(s)+neg(s))
        num = (2_000_000_000 * (2 * 3_000_000_000 + 2_000_000_000)
               + 3_000_000_000 * (2 * 5_000_000_000))
        assert num > 2**63 - 1            # int64 WOULD have overflowed
        assert (got["n_pos"], got["n_neg"]) == (p, n)
        assert abs(got["auc"] - round(num / (2.0 * p * n), 6)) < 1e-9


def test_clf_pr_curve_matches_naive(spark):
    """PR table equals the naive per-threshold counting, including the
    guarded zero-denominator cells."""
    import random
    from datafusion_postgres_spark.operators.classifier import clf_pr_curve
    rng = random.Random(29)
    rows = [(i, rng.randint(0, 1), round(rng.random(), 6))
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, y int, s double")
    thresholds = [0.25, 0.5, 0.99, 1.5]   # 1.5: nothing predicted
    got = {r["threshold"]: r for r in
           clf_pr_curve(df, thresholds, "y", "s").collect()}
    n_pos = sum(y for _, y, _ in rows)
    for t in thresholds:
        pp = sum(1 for _, _, s in rows if s >= t)
        tp = sum(y for _, y, s in rows if s >= t)
        r = got[t]
        assert (r["n_pred_pos"], r["tp"]) == (pp, tp)
        assert abs(r["precision"] - round(tp / max(pp, 1), 6)) < 1e-9
        assert abs(r["recall"] - round(tp / max(n_pos, 1), 6)) < 1e-9


def test_clf_pr_curve_single_corpus_pass(spark):
    """ADVICE r8 #3: the wide aggregate row is collected once and the
    output built from literal rows — the returned plan must not contain
    the corpus (no Exchange, no aggregate re-run per threshold)."""
    from datafusion_postgres_spark.operators.classifier import clf_pr_curve
    df = spark.createDataFrame(
        [(i, i % 2, round(i / 100.0, 6)) for i in range(100)],
        "doc_id long, y int, s double")
    out = clf_pr_curve(df, [0.2, 0.5, 0.8], "y", "s")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Aggregate" not in plan
    assert "LocalTableScan" in plan or "ExistingRDD" in plan


def test_clf_auc_guards(spark):
    from datafusion_postgres_spark.operators.classifier import (
        clf_auc, clf_pr_curve,
    )
    # single-class corpus: explicit NULL, not a div-by-zero artifact
    one_class = spark.createDataFrame(
        [(1, 1, 0.9), (2, 1, 0.4)], "doc_id long, y int, s double")
    r = clf_auc(one_class, "y", "s").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 0, None)
    # unrounded continuous scores are discretized INSIDE the operator:
    # the sorted exchange stays bounded by distinct ROUND(x,6) values
    import pytest as _pt
    with _pt.raises(ValueError):
        clf_pr_curve(one_class, [], "y", "s")
