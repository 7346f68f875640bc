"""Minimal Avro Object Container File reader/writer (pure Python).

Implemented from the PUBLIC Apache Avro 1.11 specification (file format:
magic 'Obj\\x01' + metadata map + sync-marker; binary encoding: zigzag
varints, length-prefixed bytes/strings, unions as index+value). The
reference registers .avro files first-class via DataFusion
(``datafusion-postgres-cli/src/main.rs:176-182``); Spark's native path
needs the spark-avro package, which isn't always on the classpath — this
module is the dependency-free fallback used by ``sources.registry``.

Scale note: this path materializes the file on the driver and is meant
for the register-a-file workflow (catalog-sized data). For 100 TB avro
the spark-avro DataSource (tried first by ``read_file``) is the real
path — it splits blocks across executors.

Supported: null/boolean/int/long/float/double/bytes/string/enum/fixed,
records, arrays, maps, unions; codecs null + deflate; logical types
date, timestamp-millis/micros, decimal(bytes|fixed).
"""

from __future__ import annotations

import datetime
import io
import json
import struct
import zlib
from decimal import Decimal

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives

def _read_long(buf: io.BytesIO) -> int:
    """Zigzag-encoded variable-length integer."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


# ---------------------------------------------------------------------------
# schema-driven decode

def _decode(buf: io.BytesIO, schema):
    if isinstance(schema, str):
        kind = schema
    elif isinstance(schema, list):  # union: long index + value
        idx = _read_long(buf)
        return _decode(buf, schema[idx])
    else:
        kind = schema["type"]
        logical = schema.get("logicalType")
        if logical:
            return _decode_logical(buf, schema, kind, logical)

    if kind == "null":
        return None
    if kind == "boolean":
        return buf.read(1) == b"\x01"
    if kind in ("int", "long"):
        return _read_long(buf)
    if kind == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if kind == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if kind == "bytes":
        return _read_bytes(buf)
    if kind == "string":
        return _read_bytes(buf).decode("utf-8")
    if kind == "record":
        return {f["name"]: _decode(buf, f["type"])
                for f in schema["fields"]}
    if kind == "enum":
        return schema["symbols"][_read_long(buf)]
    if kind == "fixed":
        return buf.read(schema["size"])
    if kind == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # negative count: byte size follows (skippable form)
                _read_long(buf)
                n = -n
            out.extend(_decode(buf, schema["items"]) for _ in range(n))
        return out
    if kind == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(buf, schema["values"])
        return out
    # named-type reference or unsupported primitive spelled as dict
    if isinstance(schema, dict) and kind in ("int", "long", "string",
                                             "bytes", "boolean", "float",
                                             "double", "null"):
        return _decode(buf, kind)
    raise ValueError(f"unsupported avro type: {schema!r}")


def _decode_logical(buf: io.BytesIO, schema, kind: str, logical: str):
    if logical == "date" and kind == "int":
        return (datetime.date(1970, 1, 1) +
                datetime.timedelta(days=_read_long(buf)))
    if logical == "timestamp-millis" and kind == "long":
        return datetime.datetime.utcfromtimestamp(_read_long(buf) / 1000.0)
    if logical == "timestamp-micros" and kind == "long":
        us = _read_long(buf)
        return (datetime.datetime(1970, 1, 1) +
                datetime.timedelta(microseconds=us))
    if logical == "decimal" and kind in ("bytes", "fixed"):
        raw = (_read_bytes(buf) if kind == "bytes"
               else buf.read(schema["size"]))
        unscaled = int.from_bytes(raw, "big", signed=True)
        return Decimal(unscaled).scaleb(-schema.get("scale", 0))
    # unknown logical type: fall back to the raw primitive
    return _decode(buf, kind)


# ---------------------------------------------------------------------------
# container file

def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro container file → (schema_json, rows as dicts)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = _decode(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)

    rows: list[dict] = []
    while buf.tell() < len(data):
        n_objects = _read_long(buf)
        block = _read_bytes(buf)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        bbuf = io.BytesIO(block)
        for _ in range(n_objects):
            rows.append(_decode(bbuf, schema))
        if buf.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, rows


# ---------------------------------------------------------------------------
# minimal writer (null codec) — roundtrip tests + avro sink

def _encode(out: bytearray, value, schema) -> None:
    if isinstance(schema, str):
        kind = schema
    elif isinstance(schema, list):
        # union: pick the first branch that matches the value's type
        for i, branch in enumerate(schema):
            if _matches(value, branch):
                _write_long(out, i)
                _encode(out, value, branch)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    else:
        kind = schema["type"]

    if kind == "null":
        return
    if kind == "boolean":
        out.append(1 if value else 0)
    elif kind in ("int", "long"):
        _write_long(out, int(value))
    elif kind == "float":
        out.extend(struct.pack("<f", value))
    elif kind == "double":
        out.extend(struct.pack("<d", value))
    elif kind == "bytes":
        _write_long(out, len(value))
        out.extend(value)
    elif kind == "string":
        raw = value.encode("utf-8")
        _write_long(out, len(raw))
        out.extend(raw)
    elif kind == "record":
        for f in schema["fields"]:
            _encode(out, value.get(f["name"]), f["type"])
    elif kind == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(out, v, schema["items"])
        _write_long(out, 0)
    elif kind == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                raw = k.encode("utf-8")
                _write_long(out, len(raw))
                out.extend(raw)
                _encode(out, v, schema["values"])
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro write type: {schema!r}")


def _matches(value, schema) -> bool:
    kind = schema if isinstance(schema, str) else schema["type"]
    if value is None:
        return kind == "null"
    if isinstance(value, bool):
        return kind == "boolean"
    if isinstance(value, int):
        return kind in ("int", "long")
    if isinstance(value, float):
        return kind in ("float", "double")
    if isinstance(value, str):
        return kind == "string"
    if isinstance(value, (bytes, bytearray)):
        return kind == "bytes"
    if isinstance(value, list):
        return kind == "array"
    if isinstance(value, dict):
        return kind in ("map", "record")
    return False


def write_avro(path: str, schema: dict, rows: list[dict],
               codec: str = "null") -> None:
    import os
    body = bytearray()
    for row in rows:
        _encode(body, row, schema)
    if codec == "deflate":
        # raw deflate stream (no zlib header/checksum), per the spec
        comp = zlib.compressobj(wbits=-15)
        body = bytearray(comp.compress(bytes(body)) + comp.flush())
    elif codec != "null":
        raise ValueError(f"unsupported avro codec: {codec}")
    meta = bytearray()
    entries = {"avro.schema": json.dumps(schema).encode(),
               "avro.codec": codec.encode()}
    _write_long(meta, len(entries))
    for k, v in entries.items():
        raw = k.encode()
        _write_long(meta, len(raw))
        meta.extend(raw)
        _write_long(meta, len(v))
        meta.extend(v)
    meta.append(0)
    sync = os.urandom(16)
    out = bytearray(MAGIC)
    out.extend(meta)
    out.extend(sync)
    _write_long(out, len(rows))
    _write_long(out, len(body))
    out.extend(body)
    out.extend(sync)
    with open(path, "wb") as f:
        f.write(out)
