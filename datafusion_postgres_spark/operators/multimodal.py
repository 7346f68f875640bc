"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step itself is STUBBED (`decode_image` raises
NotImplementedError unless the deterministic fake is requested — the
image/audio codec libraries are not available in this container), but the
Spark-side plumbing is real and tested:

  * schema convention: `content BINARY` + `media_type STRING` + a
    `meta STRUCT<...>` column;
  * feature extraction runs through `mapInPandas` (Arrow batches, one
    Python worker per partition — the only sane shape for CPU-heavy
    decode at 100 TB: no shuffle, linear scan, vectorized transfer);
  * batch size control via spark.sql.execution.arrow.maxRecordsPerBatch;
  * partitioning: decode cost is per-byte, so repartition by size budget
    (`repartition_for_decode`) before the map to avoid straggler tasks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

META_SCHEMA = StructType([
    StructField("byte_len", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("checksum", LongType()),
])

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("byte_len", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("checksum", LongType()),
])

_MAGIC = {b"\x89PNG": "png", b"\xff\xd8\xff": "jpeg", b"RIFF": "wav",
          b"GIF8": "gif", b"\x00\x00\x00": "mp4"}


def decode_image(content: bytes, fake: bool = False) -> dict:
    """Decode an image's dimensions.

    STUB: real decoding needs PIL/libvips, not present in this container.
    ``fake=True`` produces a deterministic fake (dimensions derived from a
    checksum of the bytes) so the distributed plumbing is testable
    end-to-end with exact expected values."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/libvips; run with fake=True for "
            "the deterministic test double")
    checksum = 0
    for b in content[:4096]:
        checksum = (checksum * 131 + b) % 1_000_000_007
    fmt = next((v for k, v in _MAGIC.items() if content.startswith(k)),
               "unknown")
    return {"byte_len": len(content), "format": fmt,
            "width": 64 + checksum % 1024, "height": 64 + (checksum // 7) % 1024,
            "checksum": checksum}


def attach_binary_content(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test/demo helper: manufacture a binary `content` column from text
    (stand-in for real image bytes) + a media_type."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("content"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
         .when(F.col("doc_id") % 3 == 1, "image/jpeg")
         .otherwise("audio/wav").alias("media_type"))


def extract_metadata(media: DataFrame, fake_decode: bool = True,
                     batch_size: int = 1024) -> DataFrame:
    """Decode/feature-extract over Arrow batches with mapInPandas.

    The per-partition generator shape means constant memory per worker
    regardless of table size; at cluster scale this is the operator you'd
    wrap a GPU decode pool around."""
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image(c, fake=fake_decode) for c in pdf["content"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def repartition_for_decode(media: DataFrame, target_bytes: int = 128 << 20,
                           size_col_bytes: str | None = None) -> DataFrame:
    """Partition so each decode task holds ~target_bytes of payload.

    Decode cost scales with bytes, not rows — row-count partitioning makes
    straggler tasks when sizes are skewed. Sizing prefers the SOURCE FILE
    stats (free: no job) and falls back to one scalar aggregate only for
    non-file-backed frames (round-3 audit: the unconditional collect()
    cost an extra job per call)."""
    try:
        import os
        paths = [p.replace("file://", "", 1) if p.startswith("file:")
                 else p for p in media.inputFiles()]
        total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    except Exception:
        total = 0
    if not total:
        if size_col_bytes:
            total = media.agg(F.sum(size_col_bytes)).collect()[0][0] or 0
        else:
            total = media.agg(
                F.sum(F.length("content"))).collect()[0][0] or 0
    n_parts = max(1, int(total / target_bytes))
    return media.repartition(n_parts)


def frame_sample_plan(video: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: emits (doc_id, frame_ts) rows to drive a
    downstream decode. The sampling grid is pure SQL (explode over a
    sequence), so only selected frames ever reach the Python decode stage."""
    dur = (F.length("content") / 1000).cast("int")  # fake: 1KB ~ 1s
    return (video
            .select("doc_id", "media_type",
                    F.explode(F.sequence(F.lit(0),
                                         F.greatest(dur - 1, F.lit(0)),
                                         F.lit(every_n_seconds)))
                    .alias("frame_ts"))
            .where(F.col("media_type").startswith("audio") == False))  # noqa: E712
