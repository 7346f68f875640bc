"""Perceptual audio fingerprinting + near-dup dedup
(operators/audiohash.py): real WAV PCM decode, integer-exact energy
envelope, shared pigeonhole blocking."""

import random
import struct

import pytest

from datafusion_postgres_spark.operators.audiohash import (
    audio_envelope_hashes, audio_near_dup_pairs, decode_wav_samples,
    encode_wav_pcm16, envelope_chunks, synthesize_wav_corpus,
)

SF = "/root/testdata/sf0.001"


class TestWavCodec:
    def test_pcm16_roundtrip(self):
        rng = random.Random(7)
        samples = [rng.randrange(-32768, 32768) for _ in range(500)]
        rate, got = decode_wav_samples(encode_wav_pcm16(8000, samples))
        assert rate == 8000 and got == samples

    def test_8bit_and_stereo_mixdown(self):
        # hand-built 8-bit unsigned mono
        data8 = bytes([0, 128, 255, 200])
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data8)) + data8)
        wav8 = b"RIFF" + struct.pack("<I", len(riff)) + riff
        rate, got = decode_wav_samples(wav8)
        assert got == [-128, 0, 127, 72]
        # stereo 16-bit: channels mix by integer mean
        frames = [(100, 200), (-5, -6), (32767, -32768)]
        data16 = struct.pack("<6h", *[v for fr in frames for v in fr])
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data16)) + data16)
        wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
        rate, got = decode_wav_samples(wav)
        assert got == [150, -6, -1]  # integer floor division

    def test_compressed_wav_raises_honestly(self):
        fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # MP3-in-WAV
        riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", 0))
        wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
        with pytest.raises(NotImplementedError):
            decode_wav_samples(wav)
        with pytest.raises(ValueError):
            decode_wav_samples(b"fLaC not a riff")


class TestEnvelope:
    def test_integer_exact_vs_float_reference(self):
        rng = random.Random(3)
        samples = [rng.randrange(-32768, 32768) for _ in range(256)]
        ch = envelope_chunks(samples)
        absv = [abs(s) for s in samples]
        mean = sum(absv) / 256
        bits = [1 if sum(absv[k * 4:(k + 1) * 4]) / 4 >= mean else 0
                for k in range(64)]
        want = [sum(bits[j * 16 + k] << k for k in range(16))
                for j in range(4)]
        assert ch == want

    def test_local_edit_small_hamming(self):
        rng = random.Random(9)
        samples = [rng.randrange(-32768, 32768) for _ in range(1024)]
        tweaked = list(samples)
        for i in range(10, 20):         # short local edit
            tweaked[i] = tweaked[i] // 2
        a, b = envelope_chunks(samples), envelope_chunks(tweaked)
        assert sum(bin(x ^ y).count("1") for x, y in zip(a, b)) <= 3


class TestAudioNearDups:
    def test_planted_near_dup_found(self, spark):
        rng = random.Random(17)
        base = [rng.randrange(-20000, 20000) for _ in range(512)]
        dup = list(base)
        dup[40] += 37                   # inaudible edit
        other = [rng.randrange(-20000, 20000) for _ in range(512)]
        media = spark.createDataFrame(
            [(1, encode_wav_pcm16(8000, base)),
             (2, encode_wav_pcm16(8000, dup)),
             (3, encode_wav_pcm16(8000, other))],
            "doc_id long, content binary")
        got = {(r["id_a"], r["id_b"])
               for r in audio_near_dup_pairs(media).collect()}
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got

    def test_poison_rows_skipped(self, spark):
        media = spark.createDataFrame(
            [(1, encode_wav_pcm16(8000, [1, 2, 3, -4] * 64)),
             (2, b"\xff\xfb mp3 frame garbage"),
             (3, b"")],
            "doc_id long, content binary")
        rows = {r["doc_id"]: r for r in
                audio_envelope_hashes(media).collect()}
        assert rows[1]["env_c0"] is not None
        assert rows[2]["env_c0"] is None and rows[3]["env_c0"] is None
        assert audio_near_dup_pairs(media).count() == 0

    def test_blocking_exact_vs_bruteforce(self, spark):
        from datafusion_postgres_spark.sources.registry import read_table
        docs = read_table(spark, SF, "documents").limit(120)
        media = synthesize_wav_corpus(docs)
        got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
               audio_near_dup_pairs(media, max_hamming=3).collect()}
        sig = audio_envelope_hashes(media).collect()
        want = set()
        for i, a in enumerate(sig):
            for b in sig[i + 1:]:
                ham = sum(bin(a[f"env_c{j}"] ^ b[f"env_c{j}"]).count("1")
                          for j in range(4))
                if ham <= 3:
                    lo, hi = sorted((a["doc_id"], b["doc_id"]))
                    want.add((lo, hi, ham))
        assert got == want and len(want) > 0


def test_audio_dedup_keep_linear_survivors(spark):
    """audio_dedup_keep: one survivor per envelope component (min id,
    singletons included) — equals the pairs+components composition."""
    import random
    from datafusion_postgres_spark.operators.audiohash import (
        audio_dedup_keep, audio_near_dup_pairs, encode_wav_pcm16,
    )
    from datafusion_postgres_spark.operators.dedup import (
        connected_components,
    )
    rng = random.Random(61)
    base = [rng.randrange(-30000, 30000) for _ in range(256)]
    near = list(base)
    near[5] += 12
    blobs = ([encode_wav_pcm16(8000, base)] * 3
             + [encode_wav_pcm16(8000, near)]
             + [encode_wav_pcm16(
                 8000, [rng.randrange(-30000, 30000) for _ in range(256)])
                for _ in range(12)])
    media = spark.createDataFrame(list(enumerate(blobs)),
                                  "doc_id long, content binary")
    kept = sorted(r["doc_id"] for r in audio_dedup_keep(media).collect())
    comp = {r["doc_id"]: r["component_id"] for r in
            connected_components(audio_near_dup_pairs(media)).collect()}
    want = sorted(i for i in range(len(blobs)) if comp.get(i, i) == i)
    assert kept == want
    assert 0 in kept and {1, 2, 3}.isdisjoint(set(kept))
