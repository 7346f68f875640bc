"""Property-based tests (hypothesis): tokenizer losslessness, transpiler
robustness/idempotence, encoder round-trips. The reference has no
property testing (SURVEY §5) — this is extra armor for the dialect layer,
which sees arbitrary client SQL."""

import string

from hypothesis import given, settings, strategies as st

from datafusion_postgres_spark.dialect.tokenizer import emit, tokenize
from datafusion_postgres_spark.dialect.transpiler import PostgresTranspiler

_tp = PostgresTranspiler()

sql_fragment = st.text(
    alphabet=string.ascii_letters + string.digits + " _'\"(),.;:*<>=~!{}-+/$",
    max_size=120)

ident = st.text(alphabet=string.ascii_lowercase + "_", min_size=1,
                max_size=12)
str_lit = st.text(alphabet=string.ascii_letters + " {},", max_size=20)


class TestTokenizer:
    @given(sql_fragment)
    @settings(max_examples=300, deadline=None)
    def test_lossless(self, sql):
        # tokenize → emit must reproduce the input byte-for-byte
        assert emit(tokenize(sql)) == sql

    @given(st.lists(str_lit, max_size=4), ident)
    @settings(max_examples=100, deadline=None)
    def test_strings_survive(self, lits, name):
        sql = "SELECT " + ", ".join(
            "'" + s.replace("'", "''") + "'" for s in lits) + f" FROM {name}"
        assert emit(tokenize(sql)) == sql

    @given(sql_fragment)
    @settings(max_examples=200, deadline=None)
    def test_never_raises(self, sql):
        tokenize(sql)


class TestTranspiler:
    @given(sql_fragment)
    @settings(max_examples=300, deadline=None)
    def test_never_raises(self, sql):
        _tp.transpile(sql)

    @given(ident, ident, st.sampled_from(["text", "int4", "int8", "float8",
                                          "bool", "date"]))
    @settings(max_examples=100, deadline=None)
    def test_cast_rewrite_shape(self, col, tbl, ty):
        out = _tp.transpile(f"SELECT {col}::{ty} FROM {tbl}")
        assert "::" in out or "CAST" in out.upper()
        assert tbl in out

    @given(st.lists(st.text(alphabet=string.ascii_letters, min_size=1,
                            max_size=8), min_size=1, max_size=5))
    @settings(max_examples=100, deadline=None)
    def test_any_array_literal(self, elems):
        lit = "{" + ",".join(elems) + "}"
        out = _tp.transpile(f"SELECT 1 WHERE x = ANY('{lit}')")
        assert " IN (" in out
        for e in elems:
            assert e in out

    @given(sql_fragment)
    @settings(max_examples=150, deadline=None)
    def test_idempotent_on_plain_selects(self, frag):
        # transpiling already-transpiled SQL must be stable for SQL with no
        # pg-specific constructs left
        once = _tp.transpile("SELECT a, b FROM t WHERE c > 1 -- " + frag)
        twice = _tp.transpile(once)
        assert once == twice

    @given(st.integers(min_value=0, max_value=10**15))
    @settings(max_examples=50, deadline=None)
    def test_regclass_literal_numeric(self, n):
        out = _tp.transpile(f"SELECT '{n}'::regclass")
        assert str(n) in out and "pg_class" not in out


class TestEncoderProperties:
    @given(st.lists(st.one_of(st.none(),
                              st.text(alphabet=string.printable, max_size=30)),
                    max_size=6))
    @settings(max_examples=200, deadline=None)
    def test_string_array_escaping_parses_back(self, vals):
        """Array text encoding must be parseable back to the same values
        (quoting round-trip — the reference pins this for edge cases)."""
        from pyspark.sql import types as T
        from datafusion_postgres_spark.server.encoder import encode_value

        s = encode_value(vals, T.ArrayType(T.StringType()))
        assert s.startswith("{") and s.endswith("}")
        parsed = _parse_pg_array(s)
        assert parsed == [v if v is not None else None for v in vals]


def _parse_pg_array(s: str):
    body = s[1:-1]
    out, cur, in_q, i = [], [], False, 0
    any_token = False
    quoted_flag = False
    while i < len(body):
        c = body[i]
        if in_q:
            if c == "\\":
                cur.append(body[i + 1])
                i += 2
                continue
            if c == '"':
                in_q = False
            else:
                cur.append(c)
        elif c == '"':
            in_q = True
            any_token = True
            quoted_flag = True
        elif c == ",":
            val = "".join(cur)
            out.append(None if (val == "NULL" and not quoted_flag) else val)
            cur, any_token, quoted_flag = [], False, False
        else:
            cur.append(c)
            any_token = True
        i += 1
    if any_token or cur or out:
        val = "".join(cur)
        out.append(None if (val == "NULL" and not quoted_flag) else val)
    return out


class TestBinaryCodecRoundTrip:
    """encode_value_binary ∘ decode_value_binary = identity on the wire
    scalar surface (the COPY BINARY / binary-Bind contract)."""

    @given(st.decimals(allow_nan=False, allow_infinity=False,
                       min_value=-10**20, max_value=10**20, places=6))
    @settings(max_examples=200, deadline=None)
    def test_numeric(self, d):
        from pyspark.sql import types as T

        from datafusion_postgres_spark.server.encoder import (
            decode_value_binary, encode_value_binary)
        out = decode_value_binary(
            encode_value_binary(d, T.DecimalType(38, 6)),
            T.DecimalType(38, 6))
        assert out == d

    @given(st.integers(min_value=-2**63, max_value=2**63 - 1))
    @settings(max_examples=200, deadline=None)
    def test_int8(self, n):
        from pyspark.sql import types as T

        from datafusion_postgres_spark.server.encoder import (
            decode_value_binary, encode_value_binary)
        assert decode_value_binary(
            encode_value_binary(n, T.LongType()), T.LongType()) == n

    @given(st.timedeltas(
        min_value=__import__("datetime").timedelta(days=-10_000),
        max_value=__import__("datetime").timedelta(days=10_000)))
    @settings(max_examples=200, deadline=None)
    def test_interval(self, td):
        from pyspark.sql import types as T

        from datafusion_postgres_spark.server.encoder import (
            decode_value_binary, encode_value_binary)
        assert decode_value_binary(
            encode_value_binary(td, T.DayTimeIntervalType()),
            T.DayTimeIntervalType()) == td

    @given(st.datetimes(
        min_value=__import__("datetime").datetime(1, 1, 1),
        max_value=__import__("datetime").datetime(9999, 12, 31)))
    @settings(max_examples=200, deadline=None)
    def test_timestamp(self, ts):
        from pyspark.sql import types as T

        from datafusion_postgres_spark.server.encoder import (
            decode_value_binary, encode_value_binary)
        assert decode_value_binary(
            encode_value_binary(ts, T.TimestampNTZType()),
            T.TimestampNTZType()) == ts

    @given(st.lists(
        st.lists(st.one_of(st.none(),
                           st.integers(-2**31, 2**31 - 1)),
                 min_size=3, max_size=3),
        max_size=5))
    @settings(max_examples=100, deadline=None)
    def test_rectangular_nested_array(self, v):
        """array<array<int>> ↔ PG 2-D array round trip (rectangular rows;
        inner size fixed at 3 so hypothesis generates valid multidim
        shapes)."""
        from pyspark.sql import types as T

        from datafusion_postgres_spark.server.encoder import (
            decode_value_binary, encode_value_binary)
        dt = T.ArrayType(T.ArrayType(T.IntegerType()))
        got = decode_value_binary(encode_value_binary(v, dt), dt)
        # the ndim=0 empty header cannot distinguish [] from [[],[]] —
        # both are PG '{}'
        expect = v if any(len(x) for x in v) else []
        assert got == expect

    @given(st.lists(st.one_of(
        st.none(),
        st.tuples(st.integers(-2**31, 2**31 - 1),
                  st.one_of(st.none(), st.text(max_size=12)))),
        max_size=6))
    @settings(max_examples=100, deadline=None)
    def test_list_of_struct(self, v):
        from pyspark.sql import types as T

        from datafusion_postgres_spark.server.encoder import (
            decode_value_binary, encode_value_binary)
        dt = T.ArrayType(T.StructType([
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType())]))
        assert decode_value_binary(encode_value_binary(v, dt), dt) == v


class TestBpeLocalLoop:
    """The driver-local merge loop (incremental pair counts +
    lazy-deletion heap) must be EXACTLY the naive recompute-everything
    algorithm on any weighted vocabulary — the property the distributed
    == local == reference equality tests sample at fixed points."""

    @staticmethod
    def _naive(vocab, n_merges):
        vocab = [(list(s), w) for s, w in vocab]
        merges = []
        for _ in range(n_merges):
            counts = {}
            for syms, w in vocab:
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + w
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < 2:
                break
            a, b = best[0]
            merges.append((a, b))
            nxt = []
            for syms, w in vocab:
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == a \
                            and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nxt.append((out, w))
            vocab = nxt
        return merges

    word = st.text(alphabet="abcd", min_size=1, max_size=8)

    @given(st.lists(st.tuples(word, st.integers(1, 9)),
                    min_size=1, max_size=20),
           st.integers(1, 12))
    @settings(max_examples=150, deadline=None)
    def test_incremental_matches_naive(self, vocab_words, n_merges):
        from datafusion_postgres_spark.operators.bpe import (
            _merge_loop_local,
        )
        # collapse duplicate words into summed weights (what _vocab_df
        # guarantees by construction)
        agg = {}
        for w, c in vocab_words:
            agg[w] = agg.get(w, 0) + c
        vocab = [(list(w), c) for w, c in sorted(agg.items())]
        got = _merge_loop_local([(list(s), w) for s, w in vocab], n_merges)
        want = self._naive(vocab, n_merges)
        assert got == want


class TestLitexprProperties:
    """repr-based parsed literals must be bit-exact for every finite
    double and every long — the assumption all dim-sized constant
    tables now ride on."""

    @given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                              width=64), min_size=1, max_size=50))
    @settings(max_examples=60, deadline=None)
    def test_dlit_roundtrip(self, spark, vals):
        import math
        from datafusion_postgres_spark.operators.litexpr import dlit
        got = spark.range(1).select(dlit(vals).alias("a")) \
            .collect()[0]["a"]
        assert len(got) == len(vals)
        for g, v in zip(got, vals):
            assert g == v and math.copysign(1, g) == math.copysign(1, v)

    @given(st.lists(st.integers(-(2**63), 2**63 - 1),
                    min_size=1, max_size=50))
    @settings(max_examples=60, deadline=None)
    def test_llit_roundtrip(self, spark, vals):
        from datafusion_postgres_spark.operators.litexpr import llit
        got = spark.range(1).select(llit(vals).alias("a")) \
            .collect()[0]["a"]
        assert list(got) == vals
