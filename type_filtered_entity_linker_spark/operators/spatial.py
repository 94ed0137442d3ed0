"""Spatial blocking for record linkage — the geo modality the other
blockers (equi keys, sorted neighborhood, canopies, LSH) don't cover:
candidate pairs are records within a radius of each other (address
points, store locations, geotagged pages). Classic grid-cell blocking
(the planar analogue of geohash bucketing, cf. the PBSM / GeoSpark
partition-join family): bucket every point into a square cell the size
of the radius, probe the 3x3 cell neighborhood on ONE side of the
join, then verify exact distance. Any pair within ``radius`` shares or
neighbors a cell, so recall is exact by construction; the probe side
expands 9x (a constant), never quadratic.

Coordinates are INTEGER planar units (meters on a local projection —
the caller owns projecting lon/lat; at web scale you re-project per
UTM zone and union). Integer coords make the verify EXACT: dist^2 and
radius^2 compare in bigint arithmetic — no trig, no floating-point
boundary flips between engines, so the DuckDB oracle is a plain
brute-force replica with zero rounding guards (same trade as
truth_discovery's micro-units).

Scale shape: one explode(9) on the probe side, one equi shuffle on
the cell key, per-cell fanout bounded by point density — a dense city
cell is ONE reduce group, never a global sort. Self-join emits each
unordered pair once (id_a < id_b)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spatial_block_join(
    points: DataFrame,
    radius: int,
    id_col: str = "rec_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Self-join of ``points`` (id, integer x, integer y) to all pairs
    within ``radius`` (inclusive, Euclidean): returns (id_a, id_b,
    dist_sq) with id_a < id_b and dist_sq = (xa-xb)^2 + (ya-yb)^2 as
    bigint. Cell size = radius; probe side explodes its 3x3 cell
    neighborhood; build side keeps its own cell, so every qualifying
    pair meets in the build point's cell exactly once."""
    if radius <= 0:
        raise ValueError("radius must be a positive integer")
    r = F.lit(int(radius))
    cx = F.floor(F.col(x_col) / r)
    cy = F.floor(F.col(y_col) / r)
    base = points.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    probes = base.select(
        F.col("pid").alias("id_l"),
        F.col("px").alias("x_l"),
        F.col("py").alias("y_l"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + F.lit(dx)).alias("cx"),
                        (F.col("cy") + F.lit(dy)).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    ).select("id_l", "x_l", "y_l", "cell.cx", "cell.cy")
    build = base.select(
        F.col("pid").alias("id_r"),
        F.col("px").alias("x_r"),
        F.col("py").alias("y_r"),
        "cx",
        "cy",
    )
    d2 = (F.col("x_l") - F.col("x_r")) * (F.col("x_l") - F.col("x_r")) + (
        F.col("y_l") - F.col("y_r")
    ) * (F.col("y_l") - F.col("y_r"))
    return (
        probes.join(build, ["cx", "cy"])
        .where(F.col("id_l") < F.col("id_r"))
        .select(
            F.col("id_l").alias("id_a"),
            F.col("id_r").alias("id_b"),
            d2.cast("long").alias("dist_sq"),
        )
        .where(F.col("dist_sq") <= F.lit(int(radius) * int(radius)))
    )
