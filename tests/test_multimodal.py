"""Multimodal column plumbing tests: binary content + mapInPandas
metadata extraction (decode itself is a deterministic fake — see
operators/multimodal.py)."""

import pytest
from pyspark.sql import functions as F

from datafusion_postgres_spark.operators import multimodal as mm
from datafusion_postgres_spark.sources.registry import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = read_table(spark, SF_DIR, "documents").limit(100)
    return mm.attach_binary_content(docs)


def test_binary_schema(media):
    dtypes = dict(media.dtypes)
    assert dtypes["content"] == "binary"
    assert dtypes["media_type"] == "string"


def test_extract_metadata_shape(media):
    out = mm.extract_metadata(media, fake_decode=True)
    rows = out.collect()
    assert len(rows) == 100
    assert set(out.columns) == {"doc_id", "media_type", "byte_len", "format",
                                "width", "height", "checksum"}
    for r in rows:
        assert r["byte_len"] > 0
        assert 64 <= r["width"] < 64 + 1024


def test_metadata_deterministic_vs_local(spark, media):
    """The distributed mapInPandas result must equal a local recompute."""
    sample = media.orderBy("doc_id").limit(5).collect()
    dist = {r["doc_id"]: r for r in
            mm.extract_metadata(media, fake_decode=True).collect()}
    for row in sample:
        local = mm.decode_image(bytes(row["content"]), fake=True)
        got = dist[row["doc_id"]]
        assert got["checksum"] == local["checksum"]
        assert got["byte_len"] == local["byte_len"]
        assert got["width"] == local["width"]


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG....")


def test_repartition_for_decode(media):
    out = mm.repartition_for_decode(media, target_bytes=10_000)
    assert out.rdd.getNumPartitions() >= 2


def test_frame_sample_plan(media):
    plan = mm.frame_sample_plan(media, every_n_seconds=2)
    rows = plan.collect()
    assert all(r["frame_ts"] % 2 == 0 for r in rows)
    # audio rows excluded
    assert all(not r["media_type"].startswith("audio") for r in rows)
