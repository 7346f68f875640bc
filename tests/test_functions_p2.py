"""functions.md P1/P2 batch: string/binary/datetime/uuid/array/system
functions planned in the reference roadmap, plus current_setting GUC
threading and pg_typeof."""

import pytest


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0][0]


class TestStringBatch:
    def test_casefold(self, spark):
        assert one(spark, "casefold('HeLLo')") == "hello"

    def test_quote_nullable(self, spark):
        assert one(spark, "quote_nullable('it''s')") == "'it''s'"
        assert one(spark, "quote_nullable(CAST(NULL AS STRING))") == "NULL"

    def test_regexp_substr(self, spark):
        assert one(spark, "regexp_substr('abc123def', '[0-9]+')") == "123"
        assert one(spark, "regexp_substr('abcdef', '[0-9]+')") is None

    def test_regexp_split_to_array(self, spark):
        assert one(spark, "regexp_split_to_array('a1b22c', '[0-9]+')") == \
            ["a", "b", "c"]

    def test_to_bin_to_oct(self, spark):
        assert one(spark, "to_bin(10)") == "1010"
        assert one(spark, "to_oct(64)") == "100"

    def test_convert_roundtrip(self, spark):
        assert one(spark, "convert_from(convert_to('héllo', 'UTF8'), 'UTF8')") \
            == "héllo"


class TestBinaryBatch:
    def test_get_byte(self, spark):
        assert one(spark, "get_byte(X'1A2B3C', 1)") == 0x2B

    def test_set_byte(self, spark):
        assert one(spark, "hex(set_byte(X'1A2B3C', 1, 255))") == "1AFF3C"

    def test_get_bit(self, spark):
        # byte 0 = 0x05 = 0b101: bit 0 (LSB) = 1, bit 1 = 0, bit 2 = 1
        assert one(spark, "get_bit(X'05', 0)") == 1
        assert one(spark, "get_bit(X'05', 1)") == 0
        assert one(spark, "get_bit(X'05', 2)") == 1


class TestDatetimeBatch:
    def test_timezone_conversion(self, spark):
        v = one(spark, "timezone('America/Chicago', "
                       "TIMESTAMP '2024-01-15 12:00:00')")
        assert v.hour == 6  # UTC noon -> 6am CST

    def test_age_interval(self, spark):
        v = one(spark, "age(TIMESTAMP_NTZ '2024-01-02 03:00:00', "
                       "TIMESTAMP_NTZ '2024-01-01 00:00:00')")
        assert v.days == 1

    def test_clock_timestamps_exist(self, spark):
        assert one(spark, "clock_timestamp()") is not None
        assert one(spark, "statement_timestamp()") is not None
        assert one(spark, "transaction_timestamp()") is not None
        assert "20" in one(spark, "timeofday()")

    def test_isfinite(self, spark):
        assert one(spark, "isfinite(TIMESTAMP_NTZ '2024-01-01')") is True
        assert one(spark, "isfinite(CAST(NULL AS TIMESTAMP_NTZ))") is None


class TestUuidBatch:
    def test_gen_random_uuid(self, spark):
        v = one(spark, "gen_random_uuid()")
        assert len(v) == 36 and v.count("-") == 4

    def test_uuidv7_shape_and_extract(self, spark):
        v = one(spark, "uuidv7()")
        assert len(v) == 36 and v[14] == "7"
        assert int(v[19], 16) & 0xC == 8  # variant '10'
        ver = spark.sql(f"SELECT uuid_extract_version('{v}') AS x") \
            .collect()[0][0]
        assert ver == 7
        ts = spark.sql(f"SELECT uuid_extract_timestamp('{v}') AS x") \
            .collect()[0][0]
        assert ts.year >= 2024

    def test_uuid_extract_version_v4(self, spark):
        assert one(spark, "uuid_extract_version(uuid())") == 4


class TestArrayBatch:
    def test_array_fill(self, spark):
        assert one(spark, "array_fill('x', array(3))") == ["x", "x", "x"]

    def test_array_sample_and_shuffle(self, spark):
        assert sorted(one(spark, "array_shuffle(array('a','b','c'))")) == \
            ["a", "b", "c"]
        assert len(one(spark, "array_sample(array('a','b','c','d'), 2)")) == 2

    def test_trim_array(self, spark):
        assert one(spark, "trim_array(array('a','b','c'), 2)") == ["a"]


class TestSystemBatch:
    def test_pg_size_bytes(self, spark):
        assert one(spark, "pg_size_bytes('1 MB')") == 1048576
        assert one(spark, "pg_size_bytes('512')") == 512
        assert one(spark, "pg_size_bytes('2 kB')") == 2048

    def test_pg_input_is_valid(self, spark):
        assert one(spark, "pg_input_is_valid('42', 'integer')") is True
        assert one(spark, "pg_input_is_valid('nope', 'integer')") is False
        assert one(spark, "pg_input_is_valid('2024-01-01', 'date')") is True

    def test_pg_column_size(self, spark):
        assert one(spark, "pg_column_size('abcd')") == 8

    def test_pg_client_encoding(self, spark):
        assert one(spark, "pg_client_encoding()") == "UTF8"

    def test_pg_sleep_returns_null(self, spark):
        assert one(spark, "pg_sleep(0.01)") is None


class TestTableFunctions:
    def test_string_to_table(self, spark):
        rows = spark.sql(
            "SELECT * FROM string_to_table('a,b,c', ',')").collect()
        assert [r[0] for r in rows] == ["a", "b", "c"]

    def test_regexp_split_to_table(self, spark):
        rows = spark.sql(
            "SELECT * FROM regexp_split_to_table('a1b22c', '[0-9]+')") \
            .collect()
        assert [r[0] for r in rows] == ["a", "b", "c"]


class TestPgTypeofDialect:
    def test_pg_typeof_maps_names(self, engine):
        res = engine.execute(
            "SELECT pg_typeof(1) AS a, pg_typeof('x') AS b, "
            "pg_typeof(1.5::float8) AS c, pg_typeof(DATE '2024-01-01') AS d")
        row = res[0].df.collect()[0]
        assert tuple(row) == ("integer", "text", "double precision", "date")


class TestCurrentSettingThreading:
    def test_set_threads_into_current_setting(self, spark):
        from datafusion_postgres_spark.session import SparkPgEngine
        eng = SparkPgEngine(spark.newSession())
        eng.execute("SET application_name = 'myapp'")
        res = eng.execute("SELECT current_setting('application_name') AS v")
        assert res[0].df.collect()[0][0] == "myapp"
        eng.execute("SET statement_timeout = '9s'")
        res = eng.execute("SELECT current_setting('statement_timeout') AS v")
        assert res[0].df.collect()[0][0] == "9s"
        # defaults still resolvable
        res = eng.execute("SELECT current_setting('server_version_num') AS v")
        assert res[0].df.collect()[0][0] == "150000"


class TestBatch3:
    """functions.md P1/P2 batch 3: unicode/bytea/interval/variadic forms."""

    def test_pg_bit_count_bytea(self, spark):
        assert one(spark, "pg_bit_count(X'FF00F1')") == 13
        assert one(spark, "pg_bit_count(X'')") == 0

    def test_set_bit_lsb_first(self, spark):
        assert one(spark, "hex(set_bit(X'00FF', 3, 1))") == "08FF"
        assert one(spark, "hex(set_bit(X'FFFF', 8, 0))") == "FFFE"

    def test_normalize_forms(self, spark):
        # e + combining acute (NFD, 2 cp) -> precomposed (NFC, 1 cp)
        assert one(spark, "length(normalize('e\\u0301'))") == 1
        assert one(spark, "length(pg_normalize('\\u00e9', 'NFD'))") == 2

    def test_to_ascii(self, spark):
        assert one(spark, "to_ascii('café naïve')") == "cafe naive"

    def test_unistr(self, spark):
        assert one(spark, r"unistr('d\\0061t\\+000061')") == "data"

    def test_unicode_assigned(self, spark):
        assert one(spark, "unicode_assigned('abc')") is True

    def test_crc32c(self, spark):
        # RFC 3720 test vector for '123456789'
        assert one(spark, "crc32c(cast('123456789' AS BINARY))") == 0xE3069283

    def test_justify_hours(self, spark):
        import datetime
        assert one(spark, "justify_hours(INTERVAL '25' HOUR)") == \
            datetime.timedelta(days=1, hours=1)

    def test_pg_input_error_info(self, spark):
        assert one(spark, "pg_input_error_info('12', 'integer')") is None
        assert "invalid input" in one(
            spark, "pg_input_error_info('abc', 'integer')")


class TestBatch3Dialect:
    def test_num_nonnulls_nulls(self, engine):
        res = engine.execute(
            "SELECT num_nonnulls(1, NULL, 'a') AS a, "
            "num_nulls(1, NULL, 'a') AS b")
        assert tuple(res[0].df.collect()[0]) == (2, 1)

    def test_to_timestamp_epoch(self, engine):
        res = engine.execute("SELECT to_timestamp(86400)::date AS d")
        assert str(res[0].df.collect()[0][0]) == "1970-01-02"

    def test_format_pct_i_l(self, engine):
        res = engine.execute("SELECT format('%s-%I-%L', 'a', 'b', 'c') AS f")
        assert res[0].df.collect()[0][0] == "a-b-c"

    def test_similar_to(self, engine):
        res = engine.execute(
            "SELECT 'abc' SIMILAR TO 'a%' AS a, "
            "'abc' SIMILAR TO '(a|b)_c' AS b, "
            "'axc' SIMILAR TO 'a.c' AS c, "
            "'abc' NOT SIMILAR TO 'x%' AS d")
        assert tuple(res[0].df.collect()[0]) == (True, True, False, True)

    def test_localtimestamp_keyword(self, engine):
        res = engine.execute("SELECT localtimestamp AS t")
        assert res[0].df.collect()[0][0] is not None

    def test_date_add_interval(self, engine):
        res = engine.execute(
            "SELECT date_add(TIMESTAMP '2024-01-01', INTERVAL '1' DAY) AS a, "
            "date_subtract(TIMESTAMP '2024-01-02', INTERVAL '1' DAY) AS b")
        a, b = res[0].df.collect()[0]
        assert str(a).startswith("2024-01-02")
        assert str(b).startswith("2024-01-01")

    def test_normalize_bare_form(self, engine):
        res = engine.execute("SELECT normalize('x', NFKC) AS n")
        assert res[0].df.collect()[0][0] == "x"

    def test_make_timestamptz_rename(self, engine):
        res = engine.execute(
            "SELECT make_timestamptz(2024, 1, 2, 3, 4, 5.0) AS t")
        assert str(res[0].df.collect()[0][0]).startswith("2024-01-02 03:04:05")


class TestSystemInfoP3:
    def test_to_reg_family(self, spark):
        assert one(spark, "to_regproc('sind')") is not None
        assert one(spark, "to_regtype('int4')") == 23
        assert one(spark, "to_regnamespace('pg_catalog')") == 11
        assert one(spark, "to_regproc('no_such_fn')") is None

    def test_visibility_and_privilege_stubs(self, spark):
        assert one(spark, "pg_function_is_visible(8000)") is True
        assert one(spark, "pg_has_role('a', 'b', 'MEMBER')") is True
        assert one(spark,
                   "has_column_privilege('u', 't', 'c', 'SELECT')") is True

    def test_unicode_version(self, spark):
        assert one(spark, "unicode_version()").count(".") == 2


class TestP2Batch4:
    def test_justify_days(self, spark):
        assert one(spark,
                   "justify_days(INTERVAL '35 04:30:00' DAY TO SECOND)") \
            == "1 mon 5 days 04:30:00"
        assert one(spark, "justify_days(INTERVAL '-35' DAY)") \
            == "-1 mons -5 days"
        assert one(spark, "justify_days(INTERVAL '60' DAY)") == "2 mons"
        assert one(spark, "justify_days(INTERVAL '0' DAY)") == "00:00:00"

    def test_justify_interval_fractional(self, spark):
        assert one(spark,
                   "justify_interval(INTERVAL '0 00:00:00.5' DAY TO SECOND)") \
            == "00:00:00.5"

    def test_regexp_matches_pg_doc_examples(self, spark):
        # the exact examples from the PG docs
        assert one(spark,
                   "regexp_matches('foobarbequebaz', '(b[^b]+)(b[^b]+)')") \
            == ["bar", "beque"]
        assert one(spark,
                   "regexp_matches('foobarbequebaz', 'bar.*que')") \
            == ["barbeque"]
        assert one(spark, "regexp_matches('no', 'xyz')") is None
        assert one(spark,
                   "regexp_matches('foobarbequebazilbarfbonk', "
                   "'(b[^b]+)', 'g')") \
            == ["bar", "beque", "bazil", "barf", "bonk"]
        assert one(spark, "regexp_matches('ABC', 'abc', 'i')") == ["ABC"]

    def test_trim_pg_arg_order(self, engine):
        res = engine.execute(
            "SELECT rtrim('xxhelloxx', 'x') AS a, "
            "ltrim('xxhelloxx', 'x') AS b, btrim('xxhelloxx', 'x') AS c, "
            "rtrim('pad   ') AS d")
        assert tuple(res[0].df.collect()[0]) == \
            ("xxhello", "helloxx", "hello", "pad")
