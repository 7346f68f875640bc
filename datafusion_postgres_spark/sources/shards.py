"""Training-shard export: the write side of the data pipeline.

A trained-on corpus leaves the engine as deterministic shards: every
document lands in a seed-reproducible (shard, pos) slot (the epoch
shuffle of operators/text.shuffle_sharded), shards map 1:1 to output
directories, and a manifest records per-shard document/token counts so
the training loader can size its plan without listing files.

Scale shape: ONE shuffle (repartition on the shard id — which the
per-shard rank window needed anyway), in-partition sort by position (no
global sort), one file per shard unless ``max_records_per_file`` splits
further. At 100 TB, n_shards is sized to the cluster and each write task
streams one shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datafusion_postgres_spark.operators.text import (
    shuffle_sharded, token_count, norm_text,
)


def write_training_shards(df: DataFrame, path: str, seed: int = 0,
                          n_shards: int = 8, id_col: str = "doc_id",
                          text_col: str = "text",
                          max_records_per_file: int | None = None,
                          fmt: str = "parquet") -> DataFrame:
    """Write ``df`` as ``path/shard=K/`` in deterministic training order
    and return the manifest DataFrame (shard, n_docs, n_tokens).

    The order inside a shard is the (hash, id) epoch order — the same
    documents in the same sequence on every run and cluster layout, the
    property a resumable training job needs from its data layout."""
    order = shuffle_sharded(df, seed=seed, n_shards=n_shards, id_col=id_col)
    # n_tok is tokenized ONCE here and persisted with the payload: the
    # manifest pass then reads only the (shard, n_tok) columns back
    # (parquet column pruning — no second tokenization, no text I/O), and
    # training loaders get a per-document token count to pack sequences
    # without retokenizing either.
    payload = (df.join(order, id_col)
               .withColumn("n_tok",
                           token_count(norm_text(F.col(text_col)))
                           .cast("bigint"))
               .repartition(n_shards, F.col("shard"))
               .sortWithinPartitions("shard", "pos"))
    writer = payload.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    getattr(writer, fmt)(path)
    spark = df.sparkSession
    written = getattr(spark.read, fmt)(path).select("shard", "n_tok")
    return (written
            .groupBy("shard")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens"))
            .orderBy("shard"))


def read_training_shards(spark, path: str, from_shard: int = 0,
                         from_pos: int = 0,
                         fmt: str = "parquet") -> DataFrame:
    """Resume-capable reader: documents in training order starting at
    (from_shard, from_pos). The shard predicate prunes whole partition
    directories (partition pruning — untouched shards are never listed,
    let alone read), and the position filter pushes into the parquet
    scan of the resume shard. Rows come back (shard, pos)-ordered within
    partitions, which is all a per-shard consumer needs."""
    df = getattr(spark.read, fmt)(path)
    resume = ((F.col("shard") > from_shard) |
              ((F.col("shard") == from_shard) &
               (F.col("pos") >= from_pos)))
    return (df.where(resume)
            .repartition(F.col("shard"))
            .sortWithinPartitions("shard", "pos"))
