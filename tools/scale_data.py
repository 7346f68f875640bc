"""Deterministic SKEWED synthetic corpus generator for scale-stress runs.

The sf* testdata is uniform: every source holds the same share of docs
and no window of text repeats across thousands of documents — so plan
pins at sf0.1 prove shape, not survival. This generator produces the
distributions that actually break naive pipelines at 100 TB:

  * Zipf-skewed sources  — src0 alone holds ~25-30% of documents (the
    domain-cap / groupBy-skew stressor);
  * a boilerplate block  — ``boiler_frac`` of all docs share one exact
    25-token prefix, so its window/gram document frequency is tens of
    times over any sane df-cap (the quadratic self-join stressor: with
    50k docs and boiler_frac=0.15, the uncapped pair fan-out from that
    one block alone is 7500^2/2 ≈ 28M pairs);
  * near-dup clusters    — ``dup_frac`` of docs come in clusters of 3
    with single-word edits (the signal dedup must still find once the
    boilerplate is capped away);
  * the rest             — unique word salad from the same small vocab
    the driver's generator uses.

Events get the matching treatment: one hot user owns ``hot_frac`` of all
rows (the skewed as-of/window key).

Everything is seeded numpy — same bytes on every run, no wall-clock or
RNG-state dependence.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "spark", "query", "table", "hash", "join", "scan", "filter", "sort",
    "merge", "group", "agg", "stream", "batch", "column", "line", "value",
    "key", "order", "fast", "slow", "big", "small", "vector", "part",
    "customer", "the", "a", "index", "cache", "disk", "page", "row",
    "plan", "stage", "task", "shuffle", "broadcast", "codegen", "limit",
    "union",
])

BOILERPLATE = ("all rights reserved this page is provided as is without "
               "warranty of any kind either express or implied see the "
               "terms of service for details")  # 25 tokens

LANGS = np.array(["en", "zh", "es", "fr", "de"])


def _salad(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(VOCAB[rng.integers(0, len(VOCAB), n_words)])


def gen_documents(path: str, n_docs: int = 50_000, seed: int = 42,
                  boiler_frac: float = 0.15, dup_frac: float = 0.06,
                  n_sources: int = 20) -> dict:
    """Write the skewed documents table; returns summary stats."""
    rng = np.random.default_rng(seed)
    # Zipf source weights: w_j ∝ 1/(j+1)
    w = 1.0 / np.arange(1, n_sources + 1)
    w /= w.sum()
    sources = rng.choice(n_sources, size=n_docs, p=w)
    kinds = rng.random(n_docs)  # <boiler_frac: boiler, <boiler+dup: cluster
    langs = LANGS[rng.integers(0, len(LANGS), n_docs)]

    texts: list[str] = []
    n_boiler = n_cluster = 0
    cluster_templates: dict[int, str] = {}
    for i in range(n_docs):
        kv = kinds[i]
        if kv < boiler_frac:
            texts.append(BOILERPLATE + " " + _salad(rng, 30))
            n_boiler += 1
        elif kv < boiler_frac + dup_frac:
            cid = i // 3  # up to 3 members land in one cluster
            if cid not in cluster_templates:
                cluster_templates[cid] = _salad(rng, 60)
            words = cluster_templates[cid].split()
            # one-word edit keeps jaccard near 1 (a true near-dup)
            words[int(rng.integers(0, len(words)))] = str(
                VOCAB[rng.integers(0, len(VOCAB))])
            texts.append(" ".join(words))
            n_cluster += 1
        else:
            texts.append(_salad(rng, int(rng.integers(40, 81))))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array([f"src{int(s)}" for s in sources], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)
    return {"n_docs": n_docs, "n_boiler": n_boiler, "n_cluster": n_cluster,
            "top_source_share": float((sources == 0).mean())}


def gen_events(path: str, n_events: int = 1_000_000, seed: int = 42,
               n_users: int = 5_000, hot_frac: float = 0.10) -> dict:
    """Write the skewed events table (one hot user_id)."""
    rng = np.random.default_rng(seed + 1)
    hot = rng.random(n_events) < hot_frac
    users = rng.integers(1, n_users, n_events)
    users[hot] = 0
    base = np.int64(1_700_000_000_000_000)  # microseconds epoch
    ts = base + np.sort(rng.integers(0, 30 * 86_400_000_000, n_events))
    etypes = np.array(["view", "click", "purchase", "quote"])
    et = etypes[rng.integers(0, len(etypes), n_events)]
    tbl = pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(et.tolist(), pa.string()),
        "value": pa.array(rng.random(n_events) * 100.0, pa.float64()),
        "props": pa.array(["{}"] * n_events, pa.string()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)
    return {"n_events": n_events,
            "hot_user_share": float((users == 0).mean())}


def ensure_scale_dir(root: str = "/root/repo/.scale",
                     n_docs: int = 50_000,
                     n_events: int = 1_000_000, seed: int = 42) -> str:
    """Idempotent: generate once, reuse across runs (seeded → identical)."""
    docs_p = os.path.join(root, "documents.parquet")
    ev_p = os.path.join(root, "events.parquet")
    if not (os.path.exists(docs_p) and os.path.exists(ev_p)):
        gen_documents(docs_p, n_docs=n_docs, seed=seed)
        gen_events(ev_p, n_events=n_events, seed=seed)
    return root
