"""Geo tier: struct-point SQL functions, EWKB byte packing (PostGIS wire
fixture), and the grid-binned radius join vs brute force."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


class TestGeoFunctions:
    def test_point_accessors(self, spark):
        assert one(spark, "st_x(st_makepoint(1.5, -2.5))") == 1.5
        assert one(spark, "st_y(st_point(1.5, -2.5))") == -2.5

    def test_distance_and_dwithin(self, spark):
        assert one(spark,
                   "st_distance(st_makepoint(0,0), st_makepoint(3,4))") == 5.0
        assert one(spark,
                   "st_dwithin(st_makepoint(0,0), st_makepoint(3,4), 5.0)")
        assert not one(spark,
                       "st_dwithin(st_makepoint(0,0), st_makepoint(3,4), 4.9)")

    def test_distancesphere_london_paris(self, spark):
        # POINT(lon lat): London (-0.1276, 51.5072), Paris (2.3522, 48.8566)
        d = one(spark, "st_distancesphere(st_makepoint(-0.1276, 51.5072), "
                       "st_makepoint(2.3522, 48.8566))")
        assert 333_000 < d < 354_000  # great-circle ~343.5 km

    def test_wkt_round_trip(self, spark):
        assert one(spark, "st_astext(st_makepoint(1.5, 2.0))") == \
            "POINT(1.5 2.0)"
        assert one(spark,
                   "st_x(st_geomfromtext('POINT(-1.5e1 2.25)'))") == -15.0
        assert one(spark,
                   "st_y(st_geomfromtext(' point(3 4) '))") == 4.0
        assert one(spark, "st_geomfromtext('LINESTRING(0 0, 1 1)')") is None

    def test_ewkb_fixture_and_round_trip(self, spark):
        # PostGIS fixture: SELECT st_asewkb(st_setsrid(st_makepoint(1,2),4326))
        hexv = one(spark,
                   "hex(st_asewkb(st_makepoint(1.0, 2.0), 4326))")
        assert hexv == ("0101000020E6100000"
                        "000000000000F03F0000000000000040")
        # srid 0 -> plain WKB header
        assert one(spark, "hex(st_asewkb(st_makepoint(1.0, 2.0), 0))") == \
            "0101000000000000000000F03F0000000000000040"
        back = one(spark, "st_geomfromewkb(st_asewkb("
                          "st_makepoint(-3.5, 7.25), 4326))")
        assert (back["x"], back["y"]) == (-3.5, 7.25)

    def test_ewkb_decode_big_endian_and_garbage(self, spark):
        # big-endian point 1,2 (e.g. from shapely/JTS WKB writers)
        be = "00000000013FF00000000000004000000000000000"
        got = one(spark, f"st_geomfromewkb(unhex('{be}'))")
        assert (got["x"], got["y"]) == (1.0, 2.0)
        # undecodable bytes -> NULL ordinates (a struct-returning pandas
        # UDF cannot emit a top-level NULL struct)
        bad = one(spark, "st_geomfromewkb(unhex('DEAD'))")
        assert bad["x"] is None and bad["y"] is None


class TestRadiusJoin:
    @pytest.fixture(scope="class")
    def pts(self, spark):
        import random
        rng = random.Random(11)
        rows = [(i, rng.uniform(0, 30), rng.uniform(0, 30))
                for i in range(250)]
        return spark.createDataFrame(rows, "id long, x double, y double")

    def test_matches_brute_force(self, spark, pts):
        from datafusion_postgres_spark.operators.geo import radius_join
        out = radius_join(pts, pts, radius=2.0, dedup_pairs=True)
        got = {(r["id"], r["id_r"]) for r in out.collect()}
        rows = pts.collect()
        want = {(a["id"], b["id"])
                for a in rows for b in rows
                if a["id"] < b["id"] and
                math.hypot(a["x"] - b["x"], a["y"] - b["y"]) <= 2.0}
        assert got == want and len(want) > 100

    def test_two_sided(self, spark, pts):
        from datafusion_postgres_spark.operators.geo import radius_join
        left = pts.where(F.col("id") < 50)
        right = pts.where(F.col("id") >= 50)
        out = radius_join(left, right, radius=3.0)
        for r in out.collect():
            assert r["id"] < 50 and r["id_r"] >= 50 and r["dist"] <= 3.0

    def test_bad_radius(self, spark, pts):
        from datafusion_postgres_spark.operators.geo import radius_join
        with pytest.raises(ValueError):
            radius_join(pts, pts, radius=0)
