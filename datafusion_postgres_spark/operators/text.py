"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure `pyspark.sql.functions` compositions — no Python
UDFs — so they run inside whole-stage codegen and scale linearly with
executors. Deterministic by construction (no rand, no hash-seed
dependence): the document fingerprint uses an explicit polynomial rolling
hash instead of Spark's murmur3 so a DuckDB oracle can reproduce it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small English stopword list used by the language-ID heuristic and the
# quality score. Keep in sync with the oracle SQL in queries/textops.py.
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
                "it", "that", "for", "on", "with", "as")

FP_MOD = 1_000_000_007
FP_BASE = 31


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the scan has fewer partitions than the
    cluster has slots.

    Text operators are compute-bound projections (per-char hash folds, 48
    simhash bit counts) over comparatively tiny inputs; a small parquet
    file is a single row group, which parquet CANNOT split — so without
    this the whole projection serializes on one core (measured 19.2s ->
    1.4s for sf0.1 shingle hashing on local[32]). At 100 TB the scan
    arrives already split into many row groups and this is a no-op; the
    one-time shuffle of raw text is only paid when the input is narrower
    than the cluster."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def norm_text(col: Column) -> Column:
    """Normalization for exact dedup: lowercase, trim, collapse whitespace."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def words(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(words(col)))


def stopword_ratio(col: Column) -> Column:
    ws = words(F.lower(col))
    in_list = F.filter(ws, lambda w: w.isin(*EN_STOPWORDS))
    return F.size(in_list) / F.greatest(F.size(ws), F.lit(1))


def punct_ratio(col: Column) -> Column:
    puncts = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()-]", ""))
    return puncts / F.greatest(F.length(col), F.lit(1))


def avg_word_len(col: Column) -> Column:
    ws = words(col)
    total = F.aggregate(ws, F.lit(0).cast("long"),
                        lambda acc, w: acc + F.length(w))
    return total / F.greatest(F.size(ws), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, some stopwords,
    moderate punctuation, sane word lengths."""
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    wordlen = avg_word_len(col)
    wordlen_term = F.when((wordlen >= 3) & (wordlen <= 10), F.lit(1.0)) \
                    .otherwise(F.lit(0.5))
    return (length_term * 0.3 + stop_term * 0.3 + punct_term * 0.2 +
            wordlen_term * 0.2)


def lang_id(col: Column) -> Column:
    """N-gram/stopword language-ID heuristic.

    Real pipelines plug in fastText/CLD3 via a Pandas UDF; the heuristic
    here is the UDF-free baseline: English stopword density decides 'en',
    otherwise character-class evidence.  Deterministic and cheap (single
    projection, no shuffle)."""
    return (F.when(stopword_ratio(col) > 0.12, F.lit("en"))
             .when(col.rlike(r"[一-鿿]"), F.lit("zh"))
             .when(col.rlike(r"[À-ſ]"), F.lit("other_latin"))
             .otherwise(F.lit("unknown")))


def fingerprint(col: Column) -> Column:
    """Polynomial rolling hash over the normalized text's characters:
    ``h = (h*31 + code) mod 1e9+7``.

    Engine-portable (pure integer arithmetic, no murmur3), so the DuckDB
    oracle can verify it; distributes as a single codegen'd projection."""
    codes = F.transform(F.split(norm_text(col), ""),
                        lambda c: F.ascii(c).cast("long"))
    return F.aggregate(codes, F.lit(0).cast("long"),
                       lambda acc, x: (acc * FP_BASE + x) % FP_MOD)


def word_fingerprint(word: Column) -> Column:
    """Same rolling hash for a single token (used by minhash shingling)."""
    codes = F.transform(F.split(word, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(codes, F.lit(0).cast("long"),
                       lambda acc, x: (acc * FP_BASE + x) % FP_MOD)


def text_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document metrics table (token count, ratios, quality, lang)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        F.length(c).alias("n_chars_actual"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(avg_word_len(c), 6).alias("avg_word_len"),
        F.round(quality_score(c), 6).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


def sample_systematic(df: DataFrame, key_col: str, rate_denom: int,
                      stratify_col: str | None = None,
                      remainder: int = 0) -> DataFrame:
    """Deterministic 1-in-``rate_denom`` sample: keep rows whose portable
    key hash lands on ``remainder`` mod rate_denom.

    Unlike rand()-based sampling this is reproducible across engines,
    runs, and partitionings (the classic training-data holdout trick —
    the same doc always lands in the same split), and it is a pure
    zero-shuffle scan-side filter at any scale. With ``stratify_col``
    the key is salted per stratum so every stratum is sampled at the
    same 1/denom rate independent of its key distribution."""
    key = F.col(key_col).cast("string")
    if stratify_col is not None:
        key = F.concat(F.col(stratify_col).cast("string"), F.lit("|"), key)
    h = fingerprint(key)
    return df.where(h % F.lit(rate_denom) == F.lit(remainder))
