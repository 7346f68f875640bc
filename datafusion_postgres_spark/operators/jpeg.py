"""Huffman JPEG (ITU-T T.81) decode + a grayscale fixture encoder,
pure Python from the published specification — the round-8 closure of
imagehash's last image-format boundary (the GIF-LZW treatment, one
size bigger).

Decoder scope: SOF0/SOF1 (baseline + extended sequential) AND SOF2
(progressive: spectral selection + successive approximation, DC/AC
first and refinement scans, end-of-band runs), 8-bit precision, any
component count and sampling factors, fully-interleaved scans AND
single-component non-interleaved scans, DRI/RSTn restart intervals,
0xFF fill bytes, 8/16-bit DQT tables, byte-stuffed entropy data.
Output is the LUMA plane (component 1 of the frame header) — exactly
what the perceptual hashes consume; in an interleaved scan chroma
blocks are entropy-decoded (the bit stream cannot skip them) and
discarded, while chroma-only scans (progressive AC, multi-scan
sequential) are skipped at the marker level without decoding.
VALIDATED pixel-for-pixel against Java ImageIO (an independent
implementation) on real libjpeg baseline and progressive files —
mean |diff| < 0.25 gray levels on photos; note ImageIO applies the
linear-gray->sRGB transfer to single-component JPEGs, our output is
the raw luma. Arithmetic-coded (SOF9+), lossless/differential
(SOF3/5..7/11+), luma-later sequential multi-scan, and partially-
interleaved scan groups stay an honest NotImplementedError;
implausible frame headers (dimensions the stream size cannot carry)
raise ValueError before any allocation, keeping the poison-row
contract.

Encoder scope: single-component (grayscale) baseline with a flat
quantization table (default 1 — near-lossless, reconstruction within
rounding of the float DCT), self-declared canonical huffman tables
(every (run,size) symbol gets a code, so any 8-bit input encodes), and
an optional restart interval to exercise the decoder's RSTn path.
Fixture/synthesis twin of imagehash.encode_png_gray; the decoder never
assumes this encoder.

Determinism: both transforms are plain float64 cosine sums evaluated
identically everywhere Python runs; the ENCODED bytes and the DECODED
pixels are deterministic functions of the input. (JPEG is lossy, so
unlike PNG/GIF the pixel round trip is within +/-1-2 of the source —
the perceptual-hash pairing absorbs that by design; oracled queries
keep using the lossless formats.)
"""

from __future__ import annotations

import math
import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct(block: list[float]) -> list[float]:
    """Forward 8x8 DCT, the T.81 A.3.3 definition evaluated directly."""
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                cy = _COS[y][v]
                row = y * 8
                for x in range(8):
                    s += block[row + x] * _COS[x][u] * cy
            out[v * 8 + u] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[float]:
    """Inverse 8x8 DCT (T.81 A.3.3)."""
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cy = _COS[y][v] * _C[v]
                row = v * 8
                for u in range(8):
                    s += _C[u] * coef[row + u] * _COS[x][u] * cy
            out[y * 8 + x] = 0.25 * s
    return out


# ---------------------------------------------------------------------------
# canonical huffman tables (shared build for the encoder's declared
# tables and the decoder's DHT parse)

def _canonical_codes(counts: list[int], values: list[int]
                     ) -> dict[int, tuple[int, int]]:
    """value -> (length, code) per the T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(counts: list[int], values: list[int]
                  ) -> dict[tuple[int, int], int]:
    """(length, code) -> value — the decoder-side view."""
    return {lc: v for v, lc in _canonical_codes(counts, values).items()}


# encoder-declared tables: every symbol it can emit gets a code
# (DC categories 0..11 at 5 bits; AC EOB/ZRL + all (run 0..15, size
# 1..10) at 9 bits — 162 symbols, the exhaustive baseline AC alphabet)
_ENC_DC_COUNTS = [0, 0, 0, 0, 12] + [0] * 11
_ENC_DC_VALUES = list(range(12))
_ENC_AC_COUNTS = [0] * 8 + [162] + [0] * 7
_ENC_AC_VALUES = [0x00, 0xF0] + [(r << 4) | s
                                 for r in range(16) for s in range(1, 11)]


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    """T.81 F.12 EXTEND: undo _magnitude."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # 1-padding per the spec


def encode_jpeg_gray(width: int, height: int, gray: list[int],
                     quant: int = 1, restart_interval: int = 0) -> bytes:
    """Single-component baseline JPEG from an 8-bit grayscale grid.

    ``quant`` fills the (flat) luminance quantization table — 1 keeps
    every DCT coefficient exact up to float rounding, so the decode is
    within +/-1-2 of the source pixels. ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs (decoder-path fixture)."""
    if len(gray) != width * height:
        raise ValueError("gray must hold width*height values")
    if not 1 <= quant <= 255:
        raise ValueError("quant must be 1..255 (8-bit table)")
    dc_codes = _canonical_codes(_ENC_DC_COUNTS, _ENC_DC_VALUES)
    ac_codes = _canonical_codes(_ENC_AC_COUNTS, _ENC_AC_VALUES)

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes(2)
    qtab = [quant] * 64
    out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0]) + bytes(qtab)
    out += b"\xFF\xC0" + struct.pack(">H", 11) + bytes([8]) \
        + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0])
    for cls, counts, values in ((0, _ENC_DC_COUNTS, _ENC_DC_VALUES),
                                (1, _ENC_AC_COUNTS, _ENC_AC_VALUES)):
        payload = bytes([cls << 4]) + bytes(counts) + bytes(values)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">H", 8) + bytes([1, 1, 0x00]) \
        + bytes([0, 63, 0])

    bw = _BitWriter()
    pred = 0
    mcux = (width + 7) // 8
    mcuy = (height + 7) // 8
    rst = 0
    mcu_count = 0
    for by in range(mcuy):
        for bx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = 0
            block = []
            for y in range(8):
                sy = min(by * 8 + y, height - 1)   # edge replication
                for x in range(8):
                    sx = min(bx * 8 + x, width - 1)
                    block.append((gray[sy * width + sx] & 0xFF) - 128)
            coef = _fdct(block)
            q = [int(round(coef[ZIGZAG[i]] / quant)) for i in range(64)]
            s, bits = _magnitude(q[0] - pred)
            pred = q[0]
            length, code = dc_codes[s]
            bw.write(code, length)
            if s:
                bw.write(bits, s)
            run = 0
            for i in range(1, 64):
                if q[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = ac_codes[0xF0]      # ZRL
                    bw.write(code, length)
                    run -= 16
                s, bits = _magnitude(q[i])
                length, code = ac_codes[(run << 4) | s]
                bw.write(code, length)
                bw.write(bits, s)
                run = 0
            if run:
                length, code = ac_codes[0x00]          # EOB
                bw.write(code, length)
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"                                  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment reader with byte unstuffing; RSTn markers are
    consumed by align_restart."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits < 25:
            if self.pos >= len(d):
                raise ValueError("JPEG entropy stream truncated")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    # restart marker ahead: feed 1-padding until the
                    # caller consumes it via align_restart
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    # EOI / next marker: 1-padding per the spec
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG huffman code")

    def align_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.nbits = 0
        self.acc = 0
        d = self.data
        if (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                and d[self.pos + 1] == 0xD0 + (n & 7)):
            self.pos += 2
        else:
            raise ValueError("JPEG restart marker missing")


def decode_jpeg_gray(content: bytes) -> tuple[int, int, list[int]]:
    """(luma_width, luma_height, luma grid) from a huffman JPEG —
    baseline, extended sequential, or progressive. Chroma components
    are entropy-decoded where the bit stream is interleaved and
    skipped at the marker level where it is not; arithmetic/lossless
    frames raise NotImplementedError; malformed streams raise
    ValueError — GUARANTEED: short/truncated segments that would
    surface as IndexError/struct.error from the parsers are converted
    here, so direct API callers can rely on the documented contract
    (round-9 ADVICE fix; the mapInPandas poison-row handlers never
    depended on it)."""
    try:
        return _decode_jpeg_gray(content)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed JPEG stream: {e}") from e


def _decode_jpeg_gray(content: bytes) -> tuple[int, int, list[int]]:
    if content[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart = 0
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.1: any number of 0xFF fill bytes may precede a
        # marker — skip the run so legal padded files still decode
        while pos + 1 < n and content[pos + 1] == 0xFF:
            pos += 1
        marker = content[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        seg0, seg1 = pos + 4, pos + 2 + seglen
        if marker == 0xDB:                         # DQT
            p = seg0
            while p < seg1:
                pq, tq = content[p] >> 4, content[p] & 0x0F
                p += 1
                if pq:
                    vals = list(struct.unpack_from(">64H", content, p))
                    p += 128
                else:
                    vals = list(content[p:p + 64])
                    p += 64
                qt[tq] = vals
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0/SOF1/SOF2(progressive)
            precision = content[seg0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG precision (baseline is 8)")
            h, w = struct.unpack_from(">HH", content, seg0 + 1)
            if w == 0 or h == 0:
                raise ValueError("JPEG frame with zero dimension")
            # poison-row contract guard: the output plane is allocated
            # from these header fields, so a crafted 200-byte blob
            # declaring 65535x65535 must raise here (ValueError -> NULL
            # row), never MemoryError-kill the executor. Real JPEGs
            # compress far less than 4096 pixels per stream byte, and
            # the corpus tier never needs >64 MP frames.
            if w * h > min(1 << 26, len(content) * 4096):
                raise ValueError(
                    f"JPEG declares {w}x{h} pixels from a "
                    f"{len(content)}-byte stream — implausible header")
            ncomp = content[seg0 + 5]
            comps = []
            for i in range(ncomp):
                cid = content[seg0 + 6 + 3 * i]
                hv = content[seg0 + 7 + 3 * i]
                tq = content[seg0 + 8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                prog_blocks = {}                   # (row, col) -> zz[64]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type SOF{marker - 0xC0} (lossless/"
                "differential/arithmetic) is beyond baseline")
        elif marker == 0xC4:                       # DHT
            p = seg0
            while p < seg1:
                if p + 17 > n:
                    raise ValueError("JPEG DHT segment truncated")
                cls, tid = content[p] >> 4, content[p] & 0x0F
                counts = list(content[p + 1:p + 17])
                nv = sum(counts)
                values = list(content[p + 17:p + 17 + nv])
                if len(values) != nv:
                    # counts claim more values than the stream holds —
                    # the documented-contract case (round-9 ADVICE):
                    # ValueError, never an IndexError out of
                    # _canonical_codes
                    raise ValueError(
                        "JPEG DHT counts exceed segment values")
                huff[(cls, tid)] = _decode_table(counts, values)
                p += 17 + nv
        elif marker == 0xDD:                       # DRI
            (restart,) = struct.unpack_from(">H", content, seg0)
        elif marker == 0xDA:                       # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = content[seg0]
            scomps = []
            for i in range(ns):
                cid = content[seg0 + 1 + 2 * i]
                tabs = content[seg0 + 2 + 2 * i]
                comp = next((c for c in frame["comps"]
                             if c["id"] == cid), None)
                if comp is None:
                    raise ValueError("JPEG scan names unknown component")
                scomps.append({**comp, "dc": tabs >> 4, "ac": tabs & 0x0F})
            if not frame.get("progressive"):
                return _decode_scan(content, seg1, frame, scomps, qt,
                                    huff, restart)
            ss = content[seg0 + 1 + 2 * ns]
            se = content[seg0 + 2 + 2 * ns]
            ahal = content[seg0 + 3 + 2 * ns]
            pos = _prog_scan(content, seg1, frame, scomps, huff,
                             restart, prog_blocks,
                             ss, se, ahal >> 4, ahal & 0x0F)
            continue
        pos = seg1
    if frame is not None and frame.get("progressive") and prog_blocks:
        return _prog_reconstruct(frame, qt, prog_blocks)
    raise ValueError("JPEG without a scan")


def _store_block(zz, lq, plane, lw, x0, y0):
    """Dequantize one zigzag coefficient block, IDCT, level-shift,
    clamp, and write into the luma plane — the ONE implementation both
    the sequential and progressive reconstruction paths share (a
    rounding/clamp change must never diverge them: cross-format
    perceptual-hash parity depends on identical pixels)."""
    coef = [0.0] * 64
    for i in range(64):
        coef[ZIGZAG[i]] = zz[i] * lq[i]
    px = _idct(coef)
    for yy in range(8):
        row = (y0 + yy) * lw + x0
        for xx in range(8):
            val = int(round(px[yy * 8 + xx])) + 128
            plane[row + xx] = min(255, max(0, val))


def _luma_geometry(frame):
    """(luma comp, hmax, vmax, out_w, out_h) — the component-raster
    ceil arithmetic, shared by every reconstruction path."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if hmax == 0 or vmax == 0:
        raise ValueError("JPEG zero sampling factor")
    luma = frame["comps"][0]
    out_w = (frame["w"] * luma["h"] + hmax - 1) // hmax
    out_h = (frame["h"] * luma["v"] + vmax - 1) // vmax
    return luma, hmax, vmax, out_w, out_h


def _skip_entropy(content: bytes, pos: int) -> int:
    """Advance past an entropy-coded segment to the next true marker
    (stuffed FF00 bytes and RSTn markers are part of the segment)."""
    n = len(content)
    while pos + 1 < n:
        if content[pos] == 0xFF:
            nxt = content[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            return pos
        pos += 1
    return n


def _ac_first(coef, br, act, ss, se, al, eobrun):
    """AC first scan (Ah=0) for one block's band; returns the new
    end-of-band run counter (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_huff(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16                            # ZRL
                continue
            eb = (1 << r) - 1
            if r:
                eb += br.read_bits(r)
            return eb
        k += r
        if k > se:
            raise ValueError("JPEG AC run overflows the band")
        coef[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(coef, br, act, ss, se, al, eobrun):
    """AC refinement scan (Ah>0) for one block's band (T.81 G.1.2.3):
    correction bits for already-nonzero coefficients, newly-significant
    +/-1<<Al insertions, end-of-band runs still carrying corrections."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(idx):
        if br.read_bit() and (coef[idx] & p1) == 0:
            coef[idx] += p1 if coef[idx] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_huff(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break                          # remaining band below
            else:
                if s != 1:
                    raise ValueError(
                        "JPEG AC refinement size must be 1")
                val = p1 if br.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _prog_scan(content, pos, frame, scomps, huff, restart, blocks,
               ss, se, ah, al):
    """One progressive scan; accumulates LUMA coefficients into
    ``blocks`` ((block_row, block_col) -> zigzag coef list) and returns
    the position of the next marker. Chroma-only scans are skipped
    wholesale (scans are marker-delimited, unlike baseline MCUs)."""
    w, h = frame["w"], frame["h"]
    luma, hmax, vmax, _, _ = _luma_geometry(frame)
    if all(c["id"] != luma["id"] for c in scomps):
        return _skip_entropy(content, pos)         # chroma-only scan

    def blk(r, c):
        b = blocks.get((r, c))
        if b is None:
            b = blocks[(r, c)] = [0] * 64
        return b

    br = _BitReader(content, pos)
    state = {"rst": 0}

    def restart_boundary(mcu, preds, eobrun):
        if restart and mcu and mcu % restart == 0:
            br.align_restart(state["rst"])
            state["rst"] = (state["rst"] + 1) & 7
            for cid in preds:
                preds[cid] = 0
            return 0
        return eobrun

    if ss == 0:                                    # DC scan
        if se != 0:
            raise ValueError("JPEG DC scan with a spectral band")
        preds = {c["id"]: 0 for c in scomps}
        if len(scomps) > 1:                        # interleaved MCUs
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            mcu = 0
            for by in range(mcuy):
                for bx in range(mcux):
                    restart_boundary(mcu, preds, 0)
                    for c in scomps:
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                if ah == 0:
                                    dct = huff.get((0, c["dc"]))
                                    if dct is None:
                                        raise ValueError(
                                            "JPEG DC table missing")
                                    s = br.decode_huff(dct)
                                    preds[c["id"]] += _extend(
                                        br.read_bits(s), s) if s else 0
                                    if c["id"] == luma["id"]:
                                        blk(by * c["v"] + v,
                                            bx * c["h"] + hh)[0] = \
                                            preds[c["id"]] << al
                                else:
                                    bit = br.read_bit()
                                    if c["id"] == luma["id"] and bit:
                                        b = blk(by * c["v"] + v,
                                                bx * c["h"] + hh)
                                        b[0] |= 1 << al
                    mcu += 1
        else:                                      # single-comp raster
            c = scomps[0]
            cw = (w * c["h"] + hmax - 1) // hmax
            ch = (h * c["v"] + vmax - 1) // vmax
            bw_, bh_ = (cw + 7) // 8, (ch + 7) // 8
            for i in range(bw_ * bh_):
                restart_boundary(i, preds, 0)
                if ah == 0:
                    dct = huff.get((0, c["dc"]))
                    if dct is None:
                        raise ValueError("JPEG DC table missing")
                    s = br.decode_huff(dct)
                    preds[c["id"]] += _extend(br.read_bits(s), s) \
                        if s else 0
                    blk(i // bw_, i % bw_)[0] = preds[c["id"]] << al
                else:
                    bit = br.read_bit()
                    if bit:
                        blk(i // bw_, i % bw_)[0] |= 1 << al
    else:                                          # AC scan: one comp
        if len(scomps) != 1:
            raise ValueError("JPEG AC scan must be non-interleaved")
        c = scomps[0]
        act = huff.get((1, c["ac"]))
        if act is None:
            raise ValueError("JPEG AC table missing")
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        bw_, bh_ = (cw + 7) // 8, (ch + 7) // 8
        eobrun = 0
        for i in range(bw_ * bh_):
            eobrun = restart_boundary(i, {}, eobrun)
            coef = blk(i // bw_, i % bw_)
            if ah == 0:
                eobrun = _ac_first(coef, br, act, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(coef, br, act, ss, se, al, eobrun)
    return _skip_entropy(content, br.pos)


def _prog_reconstruct(frame, qt, blocks):
    """Dequantize + IDCT the accumulated luma coefficients — through
    the same _store_block the sequential path uses."""
    luma, hmax, vmax, out_w, out_h = _luma_geometry(frame)
    lq = qt.get(luma["tq"])
    if lq is None:
        raise ValueError("JPEG luma quantization table missing")
    bw_, bh_ = (out_w + 7) // 8, (out_h + 7) // 8
    lw = bw_ * 8
    plane = [0] * (lw * bh_ * 8)
    for (r, c), zz in blocks.items():
        if r >= bh_ or c >= bw_:
            continue                   # interleaved-DC padding blocks
        _store_block(zz, lq, plane, lw, c * 8, r * 8)
    return out_w, out_h, [plane[y * lw + x]
                          for y in range(out_h) for x in range(out_w)]


def _decode_scan(content, pos, frame, scomps, qt, huff, restart):
    w, h = frame["w"], frame["h"]
    luma, hmax, vmax, out_w, out_h = _luma_geometry(frame)
    lq = qt.get(luma["tq"])
    if lq is None:
        raise ValueError("JPEG luma quantization table missing")

    br = _BitReader(content, pos)
    preds = {c["id"]: 0 for c in scomps}
    state = {"rst": 0}

    def decode_block(c):
        dct = huff.get((0, c["dc"]))
        act = huff.get((1, c["ac"]))
        if dct is None or act is None:
            raise ValueError("JPEG huffman table missing")
        zz = [0] * 64
        s = br.decode_huff(dct)
        diff = _extend(br.read_bits(s), s) if s else 0
        preds[c["id"]] += diff
        zz[0] = preds[c["id"]]
        k = 1
        while k < 64:
            rs = br.decode_huff(act)
            r, size = rs >> 4, rs & 0x0F
            if size == 0:
                if r == 15:
                    k += 16                        # ZRL
                    continue
                break                              # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC run overflows the block")
            zz[k] = _extend(br.read_bits(size), size)
            k += 1
        return zz

    def restart_boundary(mcu):
        if restart and mcu and mcu % restart == 0:
            br.align_restart(state["rst"])
            state["rst"] = (state["rst"] + 1) & 7
            for cid in preds:
                preds[cid] = 0

    def store_luma(zz, plane, lw, x0, y0):
        _store_block(zz, lq, plane, lw, x0, y0)

    if len(scomps) == 1:
        # NON-INTERLEAVED scan (T.81 A.2.2): one data unit per MCU,
        # traversing the component's OWN block raster with its own
        # ceil-dims — libjpeg's multi-scan sequential output and every
        # single-component grayscale file take this path
        c = scomps[0]
        if c["id"] != luma["id"]:
            raise NotImplementedError(
                "first JPEG scan carries a chroma component only; "
                "luma-later multi-scan ordering is not decoded")
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        bw_, bh_ = (cw + 7) // 8, (ch + 7) // 8
        lw = bw_ * 8
        plane = [0] * (lw * bh_ * 8)
        for i in range(bw_ * bh_):
            restart_boundary(i)
            store_luma(decode_block(c), plane, lw,
                       (i % bw_) * 8, (i // bw_) * 8)
    else:
        if len(scomps) != len(frame["comps"]):
            raise NotImplementedError(
                "partially-interleaved JPEG scan groups (neither fully "
                "interleaved nor single-component) are not decoded")
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        lw = mcux * luma["h"] * 8
        plane = [0] * (lw * mcuy * luma["v"] * 8)
        mcu = 0
        for by in range(mcuy):
            for bx in range(mcux):
                restart_boundary(mcu)
                for c in scomps:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            zz = decode_block(c)
                            if c["id"] != luma["id"]:
                                continue           # chroma: bits only
                            store_luma(zz, plane, lw,
                                       (bx * luma["h"] + hh) * 8,
                                       (by * luma["v"] + v) * 8)
                mcu += 1
    grid = [plane[y * lw + x] for y in range(out_h) for x in range(out_w)]
    return out_w, out_h, grid
