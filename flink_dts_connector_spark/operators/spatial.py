"""Spatial proximity via grid-cell blocking — the spatial twin of LSH
banding: bucket points into radius-sized grid cells, generate candidates
only across the 3x3 cell neighborhood, verify with EXACT integer squared
distance. No cross join anywhere; candidate volume tracks local density,
not n².

Scale: at 100 TB the cell id is the shuffle key. Every point lands in one
cell (one shuffle); one side replicates 9x onto its neighbor cells (a map,
not a shuffle amplification of the other side), and the equi-join on the
cell id co-locates exactly the points that can be within `radius`. Skewed
density (a hot city) is visible as a hot cell — saltable like any hot key.
Everything is int64 arithmetic, so Spark and any oracle agree bit-exactly
(no trig, no floats).

The reference has no spatial operators (EXT family): this is the standard
fixed-grid spatial join (the same shape Sedona/PostGIS use for
distance-bounded self-joins), chosen over a cross join + haversine for
exactness and shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_neighbor_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All unordered pairs (a, b) with a.id < b.id and squared Euclidean
    distance <= radius² — exact. `points` must carry integer coordinates;
    the cell size equals `radius`, so every qualifying pair co-occurs in
    some 3x3 cell neighborhood (|dx| <= r ⇒ cell delta in {-1, 0, 1}).

    Output: (id_a, id_b, dist_sq). Each pair is emitted exactly once: the
    LEFT side explodes onto its 9 neighbor cells and joins the RIGHT
    side's unique home cell."""
    r2 = radius * radius
    cells = points.select(
        F.col(id_col).alias("_pid"),
        F.col(x_col).cast("bigint").alias("_px"),
        F.col(y_col).cast("bigint").alias("_py"),
        # integer div, not float-divide-then-truncate: exact cell ids
        # (coordinates are non-negative by contract)
        F.expr(f"CAST({x_col} AS BIGINT) div {radius}").alias("_cx"),
        F.expr(f"CAST({y_col} AS BIGINT) div {radius}").alias("_cy"),
    )
    probes = cells.select(
        F.col("_pid").alias("_aid"),
        F.col("_px").alias("_ax"),
        F.col("_py").alias("_ay"),
        F.explode(
            F.expr("flatten(transform(sequence(-1, 1), dx -> "
                   "transform(sequence(-1, 1), dy -> "
                   "named_struct('cx', _cx + dx, 'cy', _cy + dy))))")
        ).alias("_cell"),
    ).select("_aid", "_ax", "_ay", F.col("_cell.cx").alias("_cx"), F.col("_cell.cy").alias("_cy"))
    joined = probes.join(cells, ["_cx", "_cy"]).where(F.col("_aid") < F.col("_pid"))
    d2 = (F.col("_ax") - F.col("_px")) * (F.col("_ax") - F.col("_px")) + (
        F.col("_ay") - F.col("_py")
    ) * (F.col("_ay") - F.col("_py"))
    return (
        joined.select(
            F.col("_aid").alias("id_a"),
            F.col("_pid").alias("id_b"),
            d2.cast("bigint").alias("dist_sq"),
        )
        .where(F.col("dist_sq") <= F.lit(r2))
    )
