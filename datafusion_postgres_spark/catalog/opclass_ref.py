"""Operator-class / operator-family catalog content for the modeled
btree + hash access methods.

The reference ships REAL exported pg_amop/pg_opclass/pg_opfamily rows
(``datafusion-pg-catalog/src/pg_catalog.rs:121-194`` static table list,
``export_pg_catalog_arrow.sh``); deep-introspection clients (DBeaver /
pgadmin index and type panels) join these four tables against pg_am,
pg_type and pg_operator and show nothing when they're empty shells.

Modeled on the stock PostgreSQL 16 catalogs for the types this engine
serves (public PostgreSQL structure — the operator and opfamily OIDs
below are the documented fixed OIDs from the PG source catalogs;
opclass OIDs are deterministic 10000+ assignments, mirroring how genbki
assigns the non-fixed ones).

btree strategies: 1 '<', 2 '<=', 3 '=', 4 '>=', 5 '>'; hash: 1 '='.
"""

from __future__ import annotations

BTREE = 403
HASH = 405
PG_CATALOG_NS = 11

# typname -> type oid (the types the engine actually serves)
_T = {"bool": 16, "int2": 21, "int4": 23, "int8": 20, "float4": 700,
      "float8": 701, "text": 25, "varchar": 1043, "bpchar": 1042,
      "date": 1082, "timestamp": 1114, "timestamptz": 1184,
      "numeric": 1700, "oid": 26}

# fixed operator OIDs from pg_operator.dat: type -> (=, <, <=, >, >=)
_CMP_OPS = {
    "bool": (91, 58, 1694, 59, 1695),
    "int2": (94, 95, 522, 520, 524),
    "int4": (96, 97, 523, 521, 525),
    "int8": (410, 412, 414, 413, 415),
    "float4": (620, 622, 624, 623, 625),
    "float8": (670, 672, 673, 674, 675),
    "text": (98, 664, 665, 666, 667),
    "bpchar": (1054, 1058, 1059, 1060, 1061),
    "date": (1093, 1095, 1096, 1097, 1098),
    "timestamp": (2060, 2062, 2063, 2064, 2065),
    "timestamptz": (1320, 1322, 1323, 1324, 1325),
    "numeric": (1752, 1754, 1755, 1756, 1757),
    "oid": (607, 609, 611, 610, 612),
}

# (opfamily oid, am, family name, [member types])
_FAMILIES = [
    (1976, BTREE, "integer_ops", ["int2", "int4", "int8"]),
    (1977, HASH, "integer_ops", ["int2", "int4", "int8"]),
    (1994, BTREE, "text_ops", ["text", "varchar"]),
    (1995, HASH, "text_ops", ["text", "varchar"]),
    (1970, BTREE, "float_ops", ["float4", "float8"]),
    (1971, HASH, "float_ops", ["float4", "float8"]),
    (424, BTREE, "bool_ops", ["bool"]),
    (2222, HASH, "bool_ops", ["bool"]),
    (1988, BTREE, "numeric_ops", ["numeric"]),
    (1998, HASH, "numeric_ops", ["numeric"]),
    (434, BTREE, "datetime_ops", ["date", "timestamp", "timestamptz"]),
    (435, HASH, "date_ops", ["date"]),
    (2040, HASH, "timestamp_ops", ["timestamp", "timestamptz"]),
    (1989, BTREE, "oid_ops", ["oid"]),
    (1990, HASH, "oid_ops", ["oid"]),
    (426, BTREE, "bpchar_ops", ["bpchar"]),
    (427, HASH, "bpchar_ops", ["bpchar"]),
]

# btree cmp / hash support procs per type (amproc support function 1)
_SUPPORT_PROC = {
    (BTREE, "bool"): "btboolcmp", (HASH, "bool"): "hashchar",
    (BTREE, "int2"): "btint2cmp", (HASH, "int2"): "hashint2",
    (BTREE, "int4"): "btint4cmp", (HASH, "int4"): "hashint4",
    (BTREE, "int8"): "btint8cmp", (HASH, "int8"): "hashint8",
    (BTREE, "float4"): "btfloat4cmp", (HASH, "float4"): "hashfloat4",
    (BTREE, "float8"): "btfloat8cmp", (HASH, "float8"): "hashfloat8",
    (BTREE, "text"): "bttextcmp", (HASH, "text"): "hashtext",
    (BTREE, "varchar"): "bttextcmp", (HASH, "varchar"): "hashtext",
    (BTREE, "bpchar"): "bpcharcmp", (HASH, "bpchar"): "hashbpchar",
    (BTREE, "date"): "date_cmp", (HASH, "date"): "hashint4",
    (BTREE, "timestamp"): "timestamp_cmp", (HASH, "timestamp"): "hashint8",
    (BTREE, "timestamptz"): "timestamptz_cmp",
    (HASH, "timestamptz"): "hashint8",
    (BTREE, "numeric"): "numeric_cmp", (HASH, "numeric"): "hash_numeric",
    (BTREE, "oid"): "btoidcmp", (HASH, "oid"): "hashoid",
}


def opfamily_rows() -> list[tuple]:
    """(oid, opfmethod, opfname, opfnamespace, opfowner)"""
    return [(oid, am, name, PG_CATALOG_NS, 10)
            for oid, am, name, _types in _FAMILIES]


def opclass_rows() -> list[tuple]:
    """(oid, opcmethod, opcname, opcnamespace, opcowner, opcfamily,
    opcintype, opcdefault, opckeytype)

    One default opclass per (am, served type), named <type>_ops like
    stock PG. varchar_ops lives in the text_ops family (varchar compares
    through text's operators, as in PG)."""
    out = []
    oid = 10001  # deterministic genbki-style assignment
    for fam_oid, am, _fam_name, types in _FAMILIES:
        for ty in types:
            out.append((oid, am, f"{ty}_ops", PG_CATALOG_NS, 10,
                        fam_oid, _T[ty], True, 0))
            oid += 1
    return out


def amop_rows() -> list[tuple]:
    """(oid, amopfamily, amoplefttype, amoprighttype, amopstrategy,
    amoppurpose, amopopr, amopmethod, amopsortfamily)

    Same-type operator members only (the cross-type integer/datetime
    matrices add bulk without changing what introspection panels show).
    varchar rows are omitted like stock PG: varchar searches bind to the
    (text, text) members through the implicit cast."""
    out = []
    oid = 10501
    for fam_oid, am, _fam_name, types in _FAMILIES:
        for ty in types:
            ops = _CMP_OPS.get(ty)
            if ops is None:
                continue
            eq, lt, le, gt, ge = ops
            t = _T[ty]
            if am == BTREE:
                members = [(1, lt), (2, le), (3, eq), (4, ge), (5, gt)]
            else:
                members = [(1, eq)]
            for strat, opr in members:
                out.append((oid, fam_oid, t, t, strat, "s", opr, am, 0))
                oid += 1
    return out


def amproc_rows() -> list[tuple]:
    """(oid, amprocfamily, amproclefttype, amprocrighttype, amprocnum,
    amproc) — support function 1 (btree cmp / hash) per member type."""
    out = []
    oid = 10801
    for fam_oid, am, _fam_name, types in _FAMILIES:
        for ty in types:
            proc = _SUPPORT_PROC.get((am, ty))
            if proc is None:
                continue
            t = _T[ty]
            out.append((oid, fam_oid, t, t, 1, proc))
            oid += 1
    return out


def operator_rows() -> list[tuple]:
    """(oid, oprname, oprnamespace, oprowner, oprkind, oprcanmerge,
    oprcanhash, oprleft, oprright, oprresult, oprcom, oprnegate,
    oprcode) — the comparison operators pg_amop references, so
    introspection joins (amopopr = pg_operator.oid) resolve."""
    names = ("=", "<", "<=", ">", ">=")
    out = []
    for ty, ops in _CMP_OPS.items():
        t = _T[ty]
        eq, lt, le, gt, ge = ops
        com = {eq: eq, lt: gt, le: ge, gt: lt, ge: le}
        neg = {eq: 0, lt: ge, le: gt, gt: le, ge: lt}
        for name, opr in zip(names, ops):
            out.append((opr, name, PG_CATALOG_NS, 10, "b",
                        name == "=", name == "=", t, t, 16,
                        com[opr], neg[opr], f"{ty}{_OPR_SUFFIX[name]}"))
    return out


_OPR_SUFFIX = {"=": "eq", "<": "lt", "<=": "le", ">": "gt", ">=": "ge"}
