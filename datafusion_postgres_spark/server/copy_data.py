"""COPY FROM STDIN payload parsing (text + CSV wire formats).

Beyond-reference capability: datafusion-postgres has no COPY support at
all, but real clients (psql ``\\copy``, psycopg ``copy_expert``) speak it
constantly, so the Spark engine implements both directions.  Format
semantics follow the public PostgreSQL COPY documentation: text format is
tab-delimited with backslash escapes and ``\\N`` nulls; CSV is RFC-4180
with an empty unquoted field as NULL.
"""

from __future__ import annotations

import csv
import io


class CopyDataError(RuntimeError):
    sqlstate = "22P04"  # bad_copy_file_format


_TEXT_UNESCAPES = {
    "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t", "v": "\v",
    "\\": "\\",
}


def _split_text_line(line: str, delim: str) -> list[str]:
    """Split on the delimiter, honoring backslash escapes (an escaped
    delimiter is data, not a separator)."""
    fields, cur, i = [], [], 0
    while i < len(line):
        c = line[i]
        if c == "\\" and i + 1 < len(line):
            cur.append(c)
            cur.append(line[i + 1])
            i += 2
            continue
        if c == delim:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    fields.append("".join(cur))
    return fields


def _unescape_text(raw: str) -> str:
    out, i = [], 0
    while i < len(raw):
        c = raw[i]
        if c == "\\" and i + 1 < len(raw):
            n = raw[i + 1]
            out.append(_TEXT_UNESCAPES.get(n, n))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_copy_payload(data: bytes, ncols: int, fmt: str = "text",
                       delimiter: str | None = None,
                       null_marker: str | None = None,
                       header: bool = False) -> list[tuple]:
    """Concatenated CopyData payload -> list of row tuples (str | None).

    The NULL comparison happens on the RAW field (before unescaping), per
    Postgres: ``\\N`` is NULL but ``\\\\N`` is the two-character string
    ``\\N``.
    """
    text = data.decode("utf-8")
    rows: list[tuple] = []
    if fmt == "csv":
        delim = delimiter or ","
        null = null_marker if null_marker is not None else ""
        first = True
        for rec in csv.reader(io.StringIO(text), delimiter=delim):
            if first and header:
                first = False
                continue
            first = False
            if not rec:
                continue
            if rec == ["\\."]:
                break
            if len(rec) != ncols:
                raise CopyDataError(
                    f"row contains {len(rec)} columns, expected {ncols}")
            rows.append(tuple(None if v == null else v for v in rec))
        return rows

    delim = delimiter or "\t"
    null = null_marker if null_marker is not None else "\\N"
    for line in text.split("\n"):
        if line.endswith("\r"):
            line = line[:-1]
        if line == "":
            continue
        if line == "\\.":
            break
        fields = _split_text_line(line, delim)
        if len(fields) != ncols:
            raise CopyDataError(
                f"row contains {len(fields)} columns, expected {ncols}")
        rows.append(tuple(None if f == null else _unescape_text(f)
                          for f in fields))
    return rows


# ---------------------------------------------------------------------------
# COPY BINARY payload (PGCOPY signature + length-prefixed tuples)

COPY_BINARY_SIGNATURE = b"PGCOPY\n\xff\r\n\x00"


def parse_copy_binary(data: bytes, datatypes) -> list[tuple]:
    """COPY FROM STDIN (FORMAT binary) payload → typed rows.

    ``datatypes`` are the Spark types of the target columns (in COPY
    column order); values decode via the wire decoders so the staged
    frame carries real types, not strings."""
    import struct

    from datafusion_postgres_spark.server.encoder import decode_value_binary

    if not data.startswith(COPY_BINARY_SIGNATURE):
        raise CopyDataError("invalid COPY binary signature")
    pos = len(COPY_BINARY_SIGNATURE)
    if len(data) < pos + 8:
        raise CopyDataError("truncated COPY binary header")
    (_flags, ext_len) = struct.unpack("!ii", data[pos:pos + 8])
    pos += 8 + ext_len
    rows: list[tuple] = []
    ncols = len(datatypes)
    while pos + 2 <= len(data):
        (nfields,) = struct.unpack("!h", data[pos:pos + 2])
        pos += 2
        if nfields == -1:  # trailer
            break
        if nfields != ncols:
            raise CopyDataError(
                f"row field count {nfields} != column count {ncols}")
        vals = []
        for ci in range(ncols):
            # bounds-check before unpacking: a truncated/malformed payload
            # must surface as the module's typed error, not struct.error
            if pos + 4 > len(data):
                raise CopyDataError("truncated COPY binary data")
            (flen,) = struct.unpack("!i", data[pos:pos + 4])
            pos += 4
            if flen == -1:
                vals.append(None)
                continue
            if flen < 0 or pos + flen > len(data):
                raise CopyDataError("truncated COPY binary data")
            try:
                vals.append(decode_value_binary(data[pos:pos + flen],
                                                datatypes[ci]))
            except NotImplementedError as e:
                raise CopyDataError(str(e)) from None
            except struct.error:
                raise CopyDataError("truncated COPY binary data") from None
            pos += flen
        rows.append(tuple(vals))
    return rows
