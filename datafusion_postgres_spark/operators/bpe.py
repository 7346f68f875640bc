"""Distributed BPE (byte-pair encoding) training — the tokenizer-side
member of the training-data pipeline (public algorithm: Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

Shape of the computation, Spark-first:

  * TRAINING is the expensive, corpus-sized part and runs as pure
    DataFrame aggregations: each iteration counts adjacent symbol pairs
    across the corpus (one map-side-combined groupBy — shuffle volume is
    the distinct-pair table, never the corpus) and merges the most
    frequent pair everywhere via a codegen'd left-to-right fold over the
    per-word symbol arrays. The driver holds only the running merge list
    (n_merges rows) and the per-iteration argmax — the kmeans/Lloyd's
    shape this repo already uses.
  * ENCODING with a trained merge table is a per-word loop over ranked
    merges — a genuine loop, so it rides an Arrow-batched Pandas UDF
    (the documented escape hatch), one pass over the corpus, zero
    shuffles.

Determinism: ties in pair frequency break lexicographically on the pair
itself, so the merge sequence is a pure function of the corpus — the
DuckDB oracle replays the first iterations exactly and the local
reference implementation in tests replays all of them.

Deviation from the classic formulation: no end-of-word marker symbol —
merges never cross word boundaries here either, so the only difference
is that a word-final symbol pair is not distinguished from the same
pair mid-word. Documented, consistent between train and encode, and
replayed identically by oracle + reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datafusion_postgres_spark.operators.text import norm_text, words


def _sym_df(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, syms ARRAY<ARRAY<STRING>>): per word, its character symbols."""
    ws = F.filter(words(norm_text(F.col(text_col))), lambda w: w != "")
    return (docs
            .where(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("id"),
                    F.transform(ws, lambda w: F.split(w, "")).alias("syms")))


def _merge_word(word_col, a: str, b: str):
    """Left-to-right fold replacing each adjacent (a, b) with a||b —
    the standard greedy single-merge application, as one codegen fold."""
    ab = a + b
    return F.aggregate(
        word_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) &
            (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))))
        .otherwise(F.concat(acc, F.array(x))))


def _pair_counts(sym_df: DataFrame) -> DataFrame:
    """(a, b, cnt) adjacent-pair frequencies across the whole corpus.
    Count is per OCCURRENCE (the classic formulation), map-side combined
    so the shuffle carries one row per distinct pair per partition."""
    pairs = (sym_df
             .select(F.explode("syms").alias("w"))
             .where(F.size("w") >= 2)
             .select(F.explode(F.transform(
                 F.sequence(F.lit(1), F.size("w") - 1),
                 lambda i: F.struct(
                     F.element_at(F.col("w"), i).alias("a"),
                     F.element_at(F.col("w"), i + 1).alias("b"))))
                 .alias("p")))
    return (pairs.groupBy("p.a", "p.b")
            .agg(F.count("*").alias("cnt")))


def bpe_train(docs: DataFrame, n_merges: int = 50,
              text_col: str = "text",
              id_col: str = "doc_id") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    rank order. Stops early when no pair occurs at least twice."""
    sym = _sym_df(docs, text_col, id_col).persist()
    sym.count()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (_pair_counts(sym)
                   .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                   .limit(1).collect())
            if not top or top[0]["cnt"] < 2:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = sym.select(
                "id",
                F.transform("syms",
                            lambda w: _merge_word(w, a, b)).alias("syms")
            ).persist()
            nxt.count()
            sym.unpersist()
            sym = nxt
    finally:
        sym.unpersist()
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tokens ARRAY<STRING>, n_tokens): apply the ranked merge
    table. Per-word ranked-merge application is a real loop, so this is
    an Arrow-batched Pandas UDF — one corpus pass, zero shuffles."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def apply_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) >= 2:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            a, b = merges[best_rank]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def encode_series(texts):
        res = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                toks.extend(apply_word(w))
            res.append(toks)
        return pd.Series(res, dtype="object")

    encode_series.__annotations__ = {"texts": pd.Series,
                                     "return": pd.Series}
    enc = pandas_udf(encode_series, "array<string>")
    return (docs.select(F.col(id_col).alias("doc_id"),
                        enc(norm_text(F.col(text_col))).alias("tokens"))
            .withColumn("n_tokens", F.size("tokens").cast("bigint")))
