"""litexpr: parsed array literals must round-trip exactly and behave
like F.lit(list)."""

import math
import random

from pyspark.sql import functions as F

from datafusion_postgres_spark.operators.litexpr import dlit, ilit, llit


class TestLitexpr:
    def test_double_roundtrip_exact(self, spark):
        random.seed(3)
        vals = ([random.uniform(-1e6, 1e6) for _ in range(200)] +
                [0.0, -0.0, 1e-300, -1e300, 0.1, 1 / 3, 2 ** -52])
        got = spark.range(1).select(dlit(vals).alias("a")).collect()[0]["a"]
        assert len(got) == len(vals)
        assert all(g == v and math.copysign(1, g) == math.copysign(1, v)
                   for g, v in zip(got, vals))

    def test_long_and_int_roundtrip(self, spark):
        lv = [0, 1, -1, 2**62, -(2**62), 123456789012345]
        iv = [0, 1, -1, 2**31 - 1, -(2**31)]
        row = spark.range(1).select(llit(lv).alias("l"),
                                    ilit(iv).alias("i")).collect()[0]
        assert list(row["l"]) == lv
        assert list(row["i"]) == iv
        schema = spark.range(1).select(llit(lv).alias("l"),
                                       ilit(iv).alias("i")).schema
        assert schema["l"].dataType.simpleString() == "array<bigint>"
        assert schema["i"].dataType.simpleString() == "array<int>"

    def test_nonfinite_falls_back(self, spark):
        vals = [1.0, float("inf"), float("nan")]
        got = spark.range(1).select(dlit(vals).alias("a")).collect()[0]["a"]
        assert got[0] == 1.0 and math.isinf(got[1]) and math.isnan(got[2])

    def test_empty(self, spark):
        row = spark.range(1).select(dlit([]).alias("d"),
                                    llit([]).alias("l")).collect()[0]
        assert list(row["d"]) == [] and list(row["l"]) == []
