"""Spatial join operator: radius (distance-threshold) pair join via grid
binning.

The reference's geo tier stops at wire encoding (``arrow-pg/src/
geo_encoder.rs``) and would execute a distance join as an unconstrained
inequality join — quadratic. Here the plane is cut into radius-sized
cells: the right side replicates to its 3×3 cell neighborhood (constant
9× on one side only), the join is a plain equi-join on the cell id, and
the exact distance predicate filters after. Each candidate pair meets in
exactly one (left-cell, offset) combination, so no dedup pass. At 100 TB
this is one co-partitioned shuffle with bounded fan-out; hot cells
(dense cities) are ordinary AQE skew-join territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def radius_join(left: DataFrame, right: DataFrame, radius: float,
                x_col: str = "x", y_col: str = "y",
                left_id: str = "id", right_id: str = "id",
                dedup_pairs: bool = False) -> DataFrame:
    """All (left, right) pairs within euclidean ``radius``.

    Output: ``(left_id, right_id_r, dist)``. With ``dedup_pairs`` (for
    self-joins) only ``left_id < right_id`` pairs survive — each once.
    Cell size = radius, so a left point's true neighbors all lie in its
    3×3 neighborhood; the right side carries the 9 offset copies.
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    cell = float(radius)
    lx, ly = F.col(x_col), F.col(y_col)
    l = left.select(
        F.col(left_id).alias("__lid"), lx.alias("__lx"), ly.alias("__ly"),
        F.floor(lx / cell).alias("__cx"), F.floor(ly / cell).alias("__cy"))
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in _OFFSETS])
    r = (right.select(
            F.col(right_id).alias("__rid"),
            F.col(x_col).alias("__rx"), F.col(y_col).alias("__ry"))
         .withColumn("__o", F.explode(offs))
         .select("__rid", "__rx", "__ry",
                 (F.floor(F.col("__rx") / cell) + F.col("__o.dx"))
                 .alias("__cx"),
                 (F.floor(F.col("__ry") / cell) + F.col("__o.dy"))
                 .alias("__cy")))
    # plain multiplication, not pow(x, 2): bit-identical to the oracle's
    # (a-b)*(a-b) on every engine (pow goes through libm)
    dx = F.col("__lx") - F.col("__rx")
    dy = F.col("__ly") - F.col("__ry")
    dist = F.sqrt(dx * dx + dy * dy)
    out = (l.join(r, ["__cx", "__cy"])
           .where(dist <= F.lit(float(radius)))
           .select(F.col("__lid").alias(left_id),
                   F.col("__rid").alias(f"{right_id}_r"),
                   dist.alias("dist")))
    if dedup_pairs:
        out = out.where(F.col(left_id) < F.col(f"{right_id}_r"))
    return out
