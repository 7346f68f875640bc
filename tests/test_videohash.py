"""Video perceptual near-dup tier (round-8 verdict item #2): MP4
encode/box-walk/frame-extraction round trip, planted near-dup pairing
with the frame-position blocking, and the codec-boundary honesty pins."""

import random
import struct

import pytest
from pyspark.sql import functions as F

from datafusion_postgres_spark.operators.videohash import (
    decode_mp4_gray_frames, encode_mp4_gray_frames, synthesize_mp4_corpus,
    video_frame_hashes, video_near_dup_pairs,
)


class TestMp4Codec:
    def test_roundtrip_shapes(self):
        rng = random.Random(3)
        for w, h, n in [(8, 8, 6), (16, 12, 3), (5, 7, 1), (8, 8, 40)]:
            frames = [[rng.randrange(256) for _ in range(w * h)]
                      for _ in range(n)]
            blob = encode_mp4_gray_frames(w, h, frames)
            assert decode_mp4_gray_frames(blob) == (w, h, frames)

    def test_header_probe_accepts_the_containers(self):
        """The synthesized containers are spec-conformant enough for
        the EXISTING header-only probe (multimodal.decode_video) — the
        two box walks agree on dims/track class."""
        from datafusion_postgres_spark.operators.multimodal import (
            decode_video,
        )
        rng = random.Random(5)
        frames = [[rng.randrange(256) for _ in range(96)]
                  for _ in range(4)]
        meta = decode_video(encode_mp4_gray_frames(12, 8, frames, fps=10))
        assert (meta["width"], meta["height"]) == (12, 8)
        assert meta["n_video_tracks"] == 1 and meta["format"] == "mp4"

    def test_multi_chunk_sample_table(self):
        """Real-world files spread samples over several chunks; the
        decoder must expand stsc runs against stco. Built by hand: 3
        frames in 2 chunks (2 + 1) at non-contiguous mdat offsets."""
        from datafusion_postgres_spark.operators.videohash import _box
        rng = random.Random(7)
        w = h = 8
        fsz = w * h
        frames = [[rng.randrange(256) for _ in range(fsz)]
                  for _ in range(3)]
        gap = b"\xEE" * 16
        payload = (bytes(frames[0]) + bytes(frames[1]) + gap
                   + bytes(frames[2]))
        ftyp = _box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
        mdat = _box(b"mdat", payload)
        off0 = len(ftyp) + 8
        off1 = off0 + 2 * fsz + len(gap)
        entry = (struct.pack(">I4s", 86, b"raw ") + bytes(6)
                 + struct.pack(">H", 1) + bytes(16)
                 + struct.pack(">HH", w, h)
                 + struct.pack(">II", 0x00480000, 0x00480000) + bytes(4)
                 + struct.pack(">H", 1) + bytes(32)
                 + struct.pack(">H", 24) + struct.pack(">h", -1))
        stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        stts = _box(b"stts", bytes(4) + struct.pack(">III", 1, 3, 1))
        stsc = _box(b"stsc", bytes(4) + struct.pack(">I", 2)
                    + struct.pack(">III", 1, 2, 1)
                    + struct.pack(">III", 2, 1, 1))
        stsz = _box(b"stsz", bytes(4) + struct.pack(">II", 0, 3)
                    + struct.pack(">III", fsz, fsz, fsz))
        stco = _box(b"stco", bytes(4) + struct.pack(">III", 2, off0, off1))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        hdlr = _box(b"hdlr", bytes(8) + b"vide" + bytes(12))
        mdia = _box(b"mdia", hdlr + minf)
        tkhd = _box(b"tkhd", bytes(4) + bytes(20) + bytes(52)
                    + struct.pack(">II", w << 16, h << 16))
        moov = _box(b"moov", _box(b"trak", tkhd + mdia))
        assert decode_mp4_gray_frames(ftyp + mdat + moov) == \
            (w, h, frames)

    def test_coded_video_is_honest_codec_boundary(self):
        """An avc1 (h264) sample entry must raise NotImplementedError —
        frame pixels need a codec; headers still probe."""
        blob = encode_mp4_gray_frames(8, 8, [[0] * 64])
        hacked = blob.replace(b"raw ", b"avc1", 1)
        with pytest.raises(NotImplementedError, match="avc1"):
            decode_mp4_gray_frames(hacked)

    def test_malformed_containers_raise_value_error(self):
        with pytest.raises(ValueError):
            decode_mp4_gray_frames(b"\x00\x00\x00\x08ftyp")
        # sample table promising bytes beyond the container
        blob = bytearray(encode_mp4_gray_frames(8, 8, [[1] * 64] * 2))
        truncated = bytes(blob[:40]) + bytes(blob[len(blob) - 200:])
        with pytest.raises(ValueError):
            decode_mp4_gray_frames(truncated)


class TestVideoNearDups:
    def _mp4(self, frames, w=8, h=8):
        return encode_mp4_gray_frames(w, h, frames)

    def test_planted_near_dup_all_positions(self, spark):
        rng = random.Random(11)
        base = [[rng.randrange(256) for _ in range(64)] for _ in range(6)]
        near = [list(f) for f in base]
        near[0][5] = (near[0][5] + 2) % 256       # tiny edit, frame 0
        other = [[rng.randrange(256) for _ in range(64)]
                 for _ in range(6)]
        media = spark.createDataFrame(
            [(1, self._mp4(base)), (2, self._mp4(near)),
             (3, self._mp4(other))],
            "doc_id long, content binary")
        rows = video_near_dup_pairs(media, every_n=2,
                                    min_match_frames=3).collect()
        assert [(r["id_a"], r["id_b"], r["n_frames"]) for r in rows] == \
            [(1, 2, 3)]

    def test_partial_position_match_filtered_by_min_frames(self, spark):
        rng = random.Random(13)
        base = [[rng.randrange(256) for _ in range(64)] for _ in range(6)]
        partial = [list(f) for f in base]
        # positions 2 and 4 replaced wholesale -> only position 0 matches
        partial[2] = [rng.randrange(256) for _ in range(64)]
        partial[4] = [rng.randrange(256) for _ in range(64)]
        media = spark.createDataFrame(
            [(1, self._mp4(base)), (2, self._mp4(partial))],
            "doc_id long, content binary")
        loose = {(r["id_a"], r["id_b"]): r["n_frames"] for r in
                 video_near_dup_pairs(media, every_n=2).collect()}
        assert loose.get((1, 2)) == 1
        strict = video_near_dup_pairs(media, every_n=2,
                                      min_match_frames=3).collect()
        assert strict == []

    def test_cross_position_frames_never_pair(self, spark):
        """The frame position is a BLOCKING key: doc 2's frame 2 equals
        doc 1's frame 0, but no sampled position agrees — no pair."""
        rng = random.Random(17)
        f0 = [rng.randrange(256) for _ in range(64)]
        fx = lambda: [rng.randrange(256) for _ in range(64)]  # noqa: E731
        v1 = [f0, fx(), fx(), fx(), fx(), fx()]
        v2 = [fx(), fx(), list(f0), fx(), fx(), fx()]
        media = spark.createDataFrame(
            [(1, self._mp4(v1)), (2, self._mp4(v2))],
            "doc_id long, content binary")
        assert video_near_dup_pairs(media, every_n=2).collect() == []

    def test_keep_equals_pairs_components_composition(self, spark):
        """video_dedup_keep's tuple collapse (round-9 item #2) must
        equal connected_components(video_near_dup_pairs) + keep-min +
        singletons, on a corpus with an identical-video clique, a near
        dup, a partial match, an undecodable row, and singletons."""
        from datafusion_postgres_spark.operators.dedup import (
            connected_components,
        )
        from datafusion_postgres_spark.operators.videohash import (
            video_dedup_keep,
        )
        rng = random.Random(23)
        base = [[rng.randrange(256) for _ in range(64)]
                for _ in range(6)]
        near = [list(f) for f in base]
        near[0][5] = (near[0][5] + 2) % 256
        partial = [list(f) for f in base]
        partial[2] = [rng.randrange(256) for _ in range(64)]
        partial[4] = [rng.randrange(256) for _ in range(64)]
        rows = [(0, self._mp4(base)), (1, self._mp4(base)),
                (2, self._mp4(base)),                  # identical clique
                (3, self._mp4(near)),                  # all-pos near dup
                (4, self._mp4(partial)),               # 1 of 3 positions
                (5, b"not a container")]               # poison: survives
        rows += [(6 + j, self._mp4(
            [[rng.randrange(256) for _ in range(64)] for _ in range(6)]))
            for j in range(6)]
        media = spark.createDataFrame(rows, "doc_id long, content binary")
        for mmf in (3, None):
            kept = sorted(r["doc_id"] for r in video_dedup_keep(
                media, every_n=2, max_hamming=3,
                min_match_frames=mmf, max_df=None).collect())
            pairs = video_near_dup_pairs(media, every_n=2, max_hamming=3,
                                         min_match_frames=mmf,
                                         max_df=None)
            comp = {r["doc_id"]: r["component_id"] for r in
                    connected_components(pairs).collect()}
            want = sorted(i for i, _ in rows if comp.get(i, i) == i)
            assert kept == want, f"min_match_frames={mmf}"
        # strict criterion: clique + near-dup collapse to 0; the
        # partial match and the poison row survive
        kept3 = sorted(r["doc_id"] for r in video_dedup_keep(
            media, every_n=2, min_match_frames=3, max_df=None).collect())
        assert 0 in kept3 and {1, 2, 3}.isdisjoint(set(kept3))
        assert 4 in kept3 and 5 in kept3

    def test_keep_short_videos_below_min_frames_survive(self, spark):
        """A video with fewer sampled positions than min_match_frames
        is edge-free by construction — even two IDENTICAL short videos
        both survive (their in-group 'edge' would only span 1 < 3
        positions), exactly matching the pairs semantics."""
        from datafusion_postgres_spark.operators.videohash import (
            video_dedup_keep,
        )
        rng = random.Random(29)
        short = [[rng.randrange(256) for _ in range(64)]]  # 1 frame
        media = spark.createDataFrame(
            [(1, self._mp4(short)), (2, self._mp4(short))],
            "doc_id long, content binary")
        kept = sorted(r["doc_id"] for r in video_dedup_keep(
            media, every_n=2, min_match_frames=3, max_df=None).collect())
        assert kept == [1, 2]
        loose = sorted(r["doc_id"] for r in video_dedup_keep(
            media, every_n=2, min_match_frames=None,
            max_df=None).collect())
        assert loose == [1]

    def test_poison_rows_null_out(self, spark):
        rng = random.Random(19)
        ok = [[rng.randrange(256) for _ in range(64)] for _ in range(6)]
        media = spark.createDataFrame(
            [(1, self._mp4(ok)),
             (2, b"\x00\x01not a container"),
             (3, self._mp4(ok).replace(b"raw ", b"avc1", 1))],
            "doc_id long, content binary")
        hashes = video_frame_hashes(media, every_n=2)
        got = {(r["doc_id"], r["frame_pos"]) for r in hashes.collect()
               if r["ahash_c0"] is not None}
        assert got == {(1, 0), (1, 2), (1, 4)}   # 2 and 3 skipped

    def test_incremental_state_dedup_two_batches(self, spark):
        """Batch-2 videos dedup against the persisted frame state: a
        full near-dup drops, a PARTIAL match (one position of three)
        survives under the default all-positions criterion."""
        from datafusion_postgres_spark.operators.videohash import (
            merge_new_video_hashes, video_dedup_incremental,
            write_video_hash_table,
        )
        rng = random.Random(23)

        def vid():
            return [[rng.randrange(256) for _ in range(64)]
                    for _ in range(6)]

        base = vid()
        near = [list(f) for f in base]
        near[4][11] = (near[4][11] + 2) % 256
        partial = [list(f) for f in base]
        partial[2] = vid()[0]                  # position 2 replaced
        partial[4] = vid()[1]                  # position 4 replaced
        batch1 = spark.createDataFrame(
            [(1, self._mp4(base)), (2, self._mp4(vid()))],
            "doc_id long, content binary")
        spark.sql("DROP TABLE IF EXISTS vdi_state_t")
        try:
            write_video_hash_table(batch1, "vdi_state_t", n_buckets=8)
            batch2 = spark.createDataFrame(
                [(3, self._mp4(near)),        # drops: all 3 positions
                 (4, self._mp4(partial)),     # survives: only pos 0
                 (5, self._mp4(vid()))],
                "doc_id long, content binary")
            kept = video_dedup_incremental(batch2, "vdi_state_t")
            ids = sorted(r["doc_id"] for r in kept.collect())
            assert ids == [4, 5]
            merge_new_video_hashes(kept, "vdi_state_t", n_buckets=8)
            # 2 batch-1 + 2 survivors, x 3 positions x 4 chunk rows
            assert spark.table("vdi_state_t").count() == 48
        finally:
            spark.sql("DROP TABLE IF EXISTS vdi_state_t")

    def test_synthesis_matches_direct_hashing(self, spark):
        """synthesize_mp4_corpus -> decode -> hash equals hashing the
        text-derived grids directly (the oracle's arithmetic)."""
        from datafusion_postgres_spark.operators.imagehash import (
            ahash_chunks,
        )
        docs = spark.createDataFrame(
            [(1, "hello world this is a test document with some text"),
             (2, "another different document body entirely here")],
            "doc_id long, text string")
        media = synthesize_mp4_corpus(docs, side=8, n_frames=6)
        got = {(r["doc_id"], r["frame_pos"]):
               (r["ahash_c0"], r["ahash_c1"], r["ahash_c2"], r["ahash_c3"])
               for r in video_frame_hashes(media, every_n=2).collect()}
        for did, text in [(1, "hello world this is a test document "
                              "with some text"),
                          (2, "another different document body "
                              "entirely here")]:
            n = len(text)
            for f in (0, 2, 4):
                grid = [ord(text[(f * 64 + i) % n]) % 256
                        for i in range(64)]
                assert got[(did, f)] == tuple(ahash_chunks(grid, 8, 8))
