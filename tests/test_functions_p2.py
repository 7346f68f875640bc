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
