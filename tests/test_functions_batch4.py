"""functions.md residual closure: the last planned fn rows without a
Spark native or registration (gcd/lcm, numeric scale introspection,
regexp_match, sha-2 family, date_bin, PG array surface, acl helpers),
plus the ARRAY[...] constructor and '...'::interval dialect forms.

Expected values verified against PostgreSQL documented semantics
(functions-math/functions-string/functions-datetime sections)."""

import pytest


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0][0]


class TestNumericBatch:
    def test_gcd_lcm(self, spark):
        assert one(spark, "gcd(12, 18)") == 6
        assert one(spark, "gcd(0, 0)") == 0
        assert one(spark, "gcd(-12, 18)") == 6
        assert one(spark, "lcm(4, 6)") == 12
        assert one(spark, "gcd(CAST(NULL AS BIGINT), 3)") is None

    def test_scale_family(self, spark):
        assert one(spark, "scale(8.41)") == 2
        assert one(spark, "scale(100)") == 0
        assert one(spark, "scale(8.4100)") == 4
        assert one(spark, "min_scale(8.4100)") == 2
        assert one(spark, "min_scale(8.000)") == 0
        assert one(spark, "trim_scale(8.4100)") == "8.41"
        assert one(spark, "trim_scale(8.000)") == "8"

    def test_to_hex(self, spark):
        assert one(spark, "to_hex(255)") == "ff"
        assert one(spark, "to_hex(2147483647)") == "7fffffff"
        # int4-range negative renders 32-bit two's complement like PG
        assert one(spark, "to_hex(-1)") == "ffffffff"

    def test_setseed_void(self, spark):
        assert one(spark, "setseed(0.5)") is None


class TestStringBatch4:
    def test_starts_with(self, spark):
        assert one(spark, "starts_with('alphabet', 'alph')") is True
        assert one(spark, "starts_with('alphabet', 'bet')") is False

    def test_regexp_match(self, spark):
        assert one(spark, "regexp_match('foobarbequebaz', 'bar.*que')") == \
            ["barbeque"]
        assert one(spark, "regexp_match('foobar', '(b)(.)')") == ["b", "a"]
        assert one(spark, "regexp_match('nope', 'xyz')") is None

    def test_sha_family(self, spark):
        assert one(spark, "hex(sha256(CAST('abc' AS BINARY)))").lower() == (
            "ba7816bf8f01cfea414140de5dae2223"
            "b00361a396177a9cb410ff61f20015ad")
        assert len(one(spark, "sha224(CAST('' AS BINARY))")) == 28
        assert len(one(spark, "sha384(CAST('' AS BINARY))")) == 48
        assert len(one(spark, "sha512(CAST('' AS BINARY))")) == 64

    def test_convert(self, spark):
        assert bytes(one(
            spark, "convert(CAST('txt' AS BINARY), 'UTF8', 'UTF8')")) == \
            b"txt"


class TestDateBin:
    def test_date_bin_literal(self, spark):
        v = one(spark, "date_bin(INTERVAL '15' MINUTE, "
                       "TIMESTAMP '2020-02-11 15:44:17', "
                       "TIMESTAMP '2001-01-01')")
        assert (v.hour, v.minute, v.second) == (15, 30, 0)

    def test_date_bin_before_origin(self, spark):
        # timestamps before the origin still bin toward -infinity
        v = one(spark, "date_bin(INTERVAL '30' MINUTE, "
                       "TIMESTAMP '1999-12-31 23:44:17', "
                       "TIMESTAMP '2001-01-01')")
        assert (v.minute, v.second) == (30, 0)


class TestArraySurface:
    def test_array_cat(self, spark):
        assert one(spark, "array_cat(array('a','b'), array('c'))") == \
            ["a", "b", "c"]
        assert one(spark,
                   "array_cat(CAST(NULL AS ARRAY<STRING>), array('x'))") == \
            ["x"]

    def test_array_dims_ndims(self, spark):
        assert one(spark, "array_dims(array(1, 2, 3))") == "[1:3]"
        assert one(spark, "array_dims(array())") is None
        assert one(spark, "array_ndims(array(1))") == 1

    def test_array_positions(self, spark):
        assert one(spark, "array_positions(array('a','b','a'), 'a')") == \
            [1, 3]
        assert one(spark, "array_positions(array('a'), 'z')") == []

    def test_array_replace_reverse(self, spark):
        assert one(spark, "array_replace(array(1, 2, 5, 4), 5, 3)") == \
            ["1", "2", "3", "4"]
        assert one(spark, "array_reverse(array(1, 2, 3))") == ["3", "2", "1"]


class TestAclHelpers:
    def test_acldefault(self, spark):
        assert one(spark, "acldefault('r', 10)") == \
            ["postgres=arwdDxtm/postgres"]

    def test_aclexplode(self, spark):
        rows = spark.sql(
            "SELECT * FROM aclexplode(array('=r/postgres', "
            "'bob=arw/postgres')) ORDER BY grantee, privilege_type"
        ).collect()
        assert [(r.grantee, r.privilege_type) for r in rows] == [
            (0, "SELECT"), (10, "INSERT"), (10, "SELECT"), (10, "UPDATE")]

    def test_catalog_foreign_keys(self, spark):
        rows = spark.sql(
            "SELECT fktable, pktable FROM pg_get_catalog_foreign_keys()"
        ).collect()
        assert ("pg_catalog.pg_attribute", "pg_catalog.pg_class") in \
            [(r.fktable, r.pktable) for r in rows]


class TestDialectForms:
    """PG-syntax forms that need the transpiler (engine fixture)."""

    def test_array_constructor(self, engine):
        r = engine.execute("SELECT ARRAY[1, 2, 3] AS a")[0]
        assert list(r.rows())[0][0] == [1, 2, 3]

    def test_array_constructor_nested(self, engine):
        r = engine.execute("SELECT ARRAY[ARRAY[1], ARRAY[2]] AS a")[0]
        assert list(r.rows())[0][0] == [[1], [2]]

    def test_array_constructor_subscript(self, engine):
        r = engine.execute("SELECT (ARRAY['a','b','c'])[2] AS v")[0]
        assert list(r.rows())[0][0] == "b"

    def test_interval_cast_literal(self, engine):
        r = engine.execute(
            "SELECT TIMESTAMP '2021-01-01' + '36 hours'::interval AS t")[0]
        v = list(r.rows())[0][0]
        assert (v.day, v.hour) == (2, 12)

    def test_date_bin_string_stride(self, engine):
        r = engine.execute(
            "SELECT date_bin('15 minutes', TIMESTAMP '2020-02-11 15:44:17', "
            "TIMESTAMP '2001-01-01') AS b")[0]
        v = list(r.rows())[0][0]
        assert (v.hour, v.minute) == (15, 30)

    def test_localtime_precision(self, engine):
        r = engine.execute("SELECT localtimestamp(3) AS t")[0]
        assert list(r.rows())[0][0] is not None

    def test_generate_subscripts_positions(self, engine):
        r = engine.execute(
            "SELECT generate_subscripts(ARRAY['a','b'], 1) AS i")[0]
        assert [row[0] for row in r.rows()] == [1, 2]
        r = engine.execute(
            "SELECT * FROM generate_subscripts(ARRAY['x','y','z'], 1)")[0]
        assert [row[0] for row in r.rows()] == [1, 2, 3]

    def test_row_constructor_comparison(self, engine):
        r = engine.execute("SELECT (1, 2) < (1, 3) AS a")[0]
        assert list(r.rows())[0][0] is True


class TestFullTextSearch:
    """Basic ts_* family (tsvector as sorted lexeme array)."""

    def test_to_tsvector(self, engine):
        r = engine.execute(
            "SELECT to_tsvector('The quick brown fox, the LAZY dog!') AS v"
        )[0]
        assert list(r.rows())[0][0] == \
            ["brown", "dog", "fox", "lazi", "quick"]  # PG: lazy->lazi

    def test_match_operator(self, engine):
        r = engine.execute(
            "SELECT to_tsvector('a fat cat sat on a mat') @@ "
            "plainto_tsquery('cat mat') AS hit, "
            "to_tsvector('a fat cat') @@ plainto_tsquery('dog') AS miss")[0]
        assert list(r.rows())[0] == (True, False)

    def test_ts_rank(self, engine):
        r = engine.execute(
            "SELECT ts_rank(to_tsvector('x y z'), "
            "plainto_tsquery('x q')) AS r")[0]
        assert list(r.rows())[0][0] == 0.5

    def test_english_stemming_default(self, engine):
        # default config is 'english': porter-lite stems documents AND
        # queries, so inflected forms match each other
        r = engine.execute(
            "SELECT to_tsvector('merging tables quickly') AS v, "
            "to_tsvector('merged table') @@ plainto_tsquery('merges') "
            "AS hit")[0]
        row = list(r.rows())[0]
        # round 4 y->i: 'quickly' -> 'quickli' (Snowball step 1c)
        assert row[0] == ["merg", "quickli", "tabl"]
        assert row[1] is True

    def test_y_to_i_and_undoubling(self, engine):
        # round-4 Snowball rules: carry/carries co-stem ('carri'),
        # hopping/hopped/hop co-stem ('hop'), l/s/z never undouble
        # (falling -> fall), y after a vowel stays (day)
        r = engine.execute(
            "SELECT to_tsvector('carry carries hopping hopped hop "
            "falling day try') AS v, "
            "to_tsvector('she carries books') @@ "
            "plainto_tsquery('carry') AS hit1, "
            "to_tsvector('kept hopping around') @@ "
            "plainto_tsquery('hop') AS hit2")[0]
        row = list(r.rows())[0]
        assert row[0] == ["carri", "day", "fall", "hop", "tri"]
        assert row[1] is True and row[2] is True

    def test_simple_config_unstemmed(self, engine):
        r = engine.execute(
            "SELECT to_tsvector('simple', 'merging tables') AS v")[0]
        assert list(r.rows())[0][0] == ["merging", "tables"]

    def test_ts_family_round4(self, engine):
        # ts_headline wraps stem-matched words; ts_rank_cd degenerates to
        # ts_rank (no positions); vector utilities on the array model
        r = engine.execute(
            "SELECT ts_headline('The cats were merging tables', "
            "plainto_tsquery('cat merge')) AS h, "
            "ts_rank_cd(to_tsvector('x y z'), plainto_tsquery('x q')) "
            "AS rcd, "
            "tsvector_to_array(to_tsvector('simple', 'b c')) AS ta, "
            "array_to_tsvector(ARRAY['b','a','b']) AS atv, "
            "ts_delete(ARRAY['a','b'], 'a') AS td, "
            "setweight(ARRAY['x'], 'A') AS sw, "
            "strip(ARRAY['x','y']) AS st, "
            "pg_stem_word('Carries') AS pw")[0]
        row = list(r.rows())[0]
        assert row[0] == "The <b>cats</b> were <b>merging</b> tables"
        assert row[1] == 0.5
        assert row[2] == ["b", "c"] and row[3] == ["a", "b"]
        assert row[4] == ["b"] and row[5] == ["x"] and row[6] == ["x", "y"]
        assert row[7] == "carri"

    def test_ts_headline_options(self, engine):
        # round 4: options string — StartSel/StopSel/MaxWords honored;
        # fragment anchored at the first matched word
        long_doc = " ".join(f"w{i}" for i in range(30)) + \
            " merging tables " + " ".join(f"z{i}" for i in range(30))
        r = engine.execute(
            f"SELECT ts_headline('{long_doc}', plainto_tsquery('merge'), "
            "'MaxWords=5, MinWords=2') AS frag, "
            "ts_headline('big cats here', plainto_tsquery('cat'), "
            "'StartSel=<<, StopSel=>>, MaxWords=10') AS sel, "
            "ts_headline('no match at all in here', "
            "plainto_tsquery('zebra'), 'MaxWords=3') AS nomatch")[0]
        row = list(r.rows())[0]
        assert row[0] == "<b>merging</b> tables z0 z1 z2"
        assert row[1] == "big <<cats>> here"
        assert row[2] == "no match at"   # no match: doc head, MaxWords

    def test_tsquery_boolean_cnf(self, engine):
        # round 4: real & | ! ( ) and <-> parsing — CNF as an array of
        # '|'-joined OR-groups with '!' negation prefixes
        r = engine.execute(
            "SELECT to_tsquery('fat & (cat | rat) & !dog') AS q1, "
            "to_tsquery('simple', 'Running & (Cats | rats)') AS q2, "
            "to_tsquery('carry <-> merge') AS q3, "
            "to_tsquery('the & cat') AS q4")[0]
        row = list(r.rows())[0]
        assert row[0] == ["fat", "cat|rat", "!dog"]
        assert row[1] == ["running", "cats|rats"]   # simple: unstemmed
        assert row[2] == ["carri", "merg"]          # phrase -> AND
        assert row[3] == ["cat"]                    # stopword atom drops

    def test_tsquery_match_or_not(self, engine):
        r = engine.execute(
            "SELECT to_tsvector('a fat cat') @@ "
            "to_tsquery('fat & (cat | rat) & !dog') AS hit, "
            "to_tsvector('a fat dog') @@ to_tsquery('fat & !dog') AS neg, "
            "to_tsvector('a fat rat') @@ "
            "to_tsquery('fat & (cat | rat)') AS alt, "
            "ts_rank(ARRAY['window','hash'], "
            "to_tsquery('window & (merge | hash) & !stream')) AS rnk")[0]
        row = list(r.rows())[0]
        assert row[0] is True and row[1] is False and row[2] is True
        assert row[3] == 1.0

    def test_websearch_to_tsquery(self, engine):
        r = engine.execute(
            "SELECT websearch_to_tsquery('\"fat cat\" or rat -dog') AS q, "
            "to_tsvector('fat cats everywhere') @@ "
            "websearch_to_tsquery('fat cat -dog') AS hit")[0]
        row = list(r.rows())[0]
        assert row[0] == ["fat", "cat|rat", "!dog"]
        assert row[1] is True

    def test_array_containment_ops(self, engine):
        r = engine.execute(
            "SELECT ARRAY[1,2,3] @> ARRAY[2,1] AS a, "
            "ARRAY[2] <@ ARRAY[1,2,3] AS b, "
            "ARRAY[1,2] && ARRAY[2,9] AS c, "
            "ARRAY[1] && ARRAY[9] AS d")[0]
        assert list(r.rows())[0] == (True, True, True, False)


class TestExtractFields:
    """PG extract()/date_part() fields Spark lacks or counts differently."""

    def test_epoch_timestamp(self, engine):
        r = engine.execute(
            "SELECT extract(epoch FROM timestamp '1970-01-01 00:01:00') "
            "AS e, date_part('epoch', timestamp '1970-01-01 00:00:30') "
            "AS d")[0]
        assert list(r.rows())[0] == (60.0, 30.0)

    def test_epoch_interval(self, engine):
        r = engine.execute(
            "SELECT extract(epoch FROM interval '1 hour 30 seconds') AS e, "
            "extract(epoch FROM '2 hours'::interval) AS c")[0]
        assert list(r.rows())[0] == (3630.0, 7200.0)

    def test_dow_isodow(self, engine):
        # 2021-01-03 Sunday: PG dow=0, isodow=7; 01-04 Monday: 1, 1
        r = engine.execute(
            "SELECT extract(dow FROM date '2021-01-03') AS a, "
            "extract(isodow FROM date '2021-01-03') AS b, "
            "extract(dow FROM date '2021-01-04') AS c, "
            "extract(isodow FROM date '2021-01-04') AS d")[0]
        assert list(r.rows())[0] == (0, 7, 1, 1)

    def test_decade_century_millennium(self, engine):
        r = engine.execute(
            "SELECT extract(decade FROM date '2021-05-01') AS d, "
            "extract(century FROM date '2001-01-01') AS c, "
            "extract(century FROM date '2000-12-31') AS c2, "
            "extract(millennium FROM date '2001-01-01') AS m")[0]
        assert list(r.rows())[0] == (202, 21, 20, 3)

    def test_subsecond_fields(self, engine):
        r = engine.execute(
            "SELECT extract(microseconds FROM "
            "timestamp '2021-01-01 00:00:30.5') AS us")[0]
        assert list(r.rows())[0][0] == 30500000

    def test_age_one_arg(self, engine):
        r = engine.execute(
            "SELECT age(timestamp '2020-01-01') > "
            "interval '300 days' AS a")[0]
        assert list(r.rows())[0][0] is True

    def test_between_symmetric(self, engine):
        r = engine.execute(
            "SELECT 5 BETWEEN SYMMETRIC 10 AND 1 AS a, "
            "15 BETWEEN SYMMETRIC 10 AND 1 AS b")[0]
        assert list(r.rows())[0] == (True, False)

    def test_overlaps(self, engine):
        r = engine.execute(
            "SELECT (DATE '2001-02-16', DATE '2001-12-21') OVERLAPS "
            "(DATE '2001-10-30', DATE '2002-10-30') AS o, "
            "(DATE '2001-02-16', DATE '2001-03-01') OVERLAPS "
            "(DATE '2001-10-30', DATE '2002-10-30') AS n")[0]
        assert list(r.rows())[0] == (True, False)
