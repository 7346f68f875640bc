"""A/B probe (guide §4.2): the production JVM two-stage simhash
projection (interpreted higher-order functions) vs a vectorized
NumPy pandas_udf computing the identical signature. Checks exact
value equality on the full corpus, then times both min-of-3 with the
noop sink.

The JVM two-stage shape won round 10's first rewrite (18x over the
single-expression form), but each of its 48 majority terms is still an
interpreted array traversal and the char-level polynomial fold is ~3
interpreted lambda evaluations per character. The NumPy twin does the
same arithmetic batch-wide: one utf-32 decode per batch, an 8-step
Horner loop over all words at once, one bit-matrix reduceat for all 48
majorities.

Usage: python tools/probe_simhash_numpy.py [sf_dir]
"""

import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FP_MOD = 1_000_000_007
BITS = 48

# Java \s (non-unicode default): [ \t\n\x0B\f\r] — NOT Python's
# unicode-aware \s.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")

# Java String.trim strips every char <= U+0020 from both ends.
_JAVA_TRIM_CHARS = "".join(chr(c) for c in range(0x21))


def _java_trim(s: str) -> str:
    return s.strip(_JAVA_TRIM_CHARS)


def _simhash_batch(texts):
    import numpy as np
    import pandas as pd

    all_words: list[str] = []
    doc_word_counts: list[int] = []
    for t in texts:
        # norm_text: regexp_replace(trim(lower(text)), '\s+', ' ') with
        # Java trim (strips EVERY char <= U+0020) and Java \s
        s = (t or "").lower()
        s = _JAVA_WS.sub(" ", _java_trim(s))
        # words(): split(trim(norm), '\s+'), then drop empties
        ws = [w for w in _java_trim(s).split(" ") if w]
        all_words.extend(ws)
        doc_word_counts.append(len(ws))

    n_words = len(all_words)
    n_docs = len(doc_word_counts)
    if n_words == 0:
        return pd.Series([0] * n_docs, dtype="int64")

    lens = np.fromiter((len(w) for w in all_words), dtype=np.int64,
                       count=n_words)
    joined = "".join(all_words)
    cp = np.frombuffer(joined.encode("utf-32-le"),
                       dtype=np.uint32).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # Horner fold (acc*31 + code) % FP_MOD, one vector step per char
    # position — identical integer arithmetic to word_fingerprint_sql
    acc = np.zeros(n_words, dtype=np.int64)
    for j in range(int(lens.max())):
        mask = lens > j
        idx = starts[mask] + j
        acc[mask] = (acc[mask] * 31 + cp[idx]) % FP_MOD

    # per-doc majorities over the word-hash array
    counts = np.fromiter(doc_word_counts, dtype=np.int64, count=n_docs)
    doc_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    shifts = np.arange(BITS, dtype=np.int64)
    bitmat = ((acc[:, None] >> shifts) & 1)
    nonzero = counts > 0
    # reduceat needs strictly valid offsets; compute on the nonzero docs
    red = np.add.reduceat(bitmat, doc_starts[nonzero], axis=0) \
        if nonzero.any() else np.zeros((0, BITS), dtype=np.int64)
    # reduceat merges adjacent equal offsets when a doc has 0 words —
    # docs here always have >= 1 word (empty docs filtered upstream),
    # but guard anyway by reconstructing full rows
    cnt = np.zeros((n_docs, BITS), dtype=np.int64)
    cnt[nonzero] = red
    maj = (2 * cnt > counts[:, None]).astype(np.int64)
    sig = (maj << shifts).sum(axis=1)
    return pd.Series(sig, dtype="int64")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datafusion_postgres_spark.session import build_spark
    from datafusion_postgres_spark.operators import dedup
    from datafusion_postgres_spark.operators.text import (
        ensure_min_parallelism,
    )
    from pyspark.sql import functions as F

    spark = build_spark(app_name="probe_simhash_numpy")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def _wrapped(texts: pd.Series) -> pd.Series:
        return _simhash_batch(texts)

    simhash_py = F.pandas_udf(_wrapped, "long")

    def jvm_df():
        return dedup.simhash(docs)

    def py_df():
        return (ensure_min_parallelism(docs)
                .where(F.trim(F.col("text")) != "")
                .select(F.col("doc_id").alias("id"),
                        simhash_py(F.col("text")).alias("simhash")))

    # exact value equality on the whole corpus
    a = {r["id"]: r["simhash"] for r in jvm_df().collect()}
    b = {r["id"]: r["simhash"] for r in py_df().collect()}
    diff = {k for k in a if a[k] != b.get(k)} | (set(b) - set(a))
    print(f"rows: jvm={len(a)} py={len(b)} mismatches={len(diff)}")
    if diff:
        for k in sorted(diff)[:5]:
            print(f"  id={k} jvm={a.get(k)} py={b.get(k)}")
        raise SystemExit("VALUES DIVERGE — do not ship")

    for label, fn in (("jvm", jvm_df), ("py", py_df),
                      ("jvm2", jvm_df), ("py2", py_df)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: min-of-3 noop = {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
