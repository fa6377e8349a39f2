"""Spatial proximity via grid-cell blocking — the spatial twin of LSH
banding: bucket points into radius-sized grid cells, generate candidates
only across the 3x3 cell neighborhood, verify with EXACT integer squared
distance. No cross join anywhere; candidate volume tracks local density,
not n².

Scale: at 100 TB the cell id is the shuffle key. Every point lands in one
cell (one shuffle); one side replicates 9x onto its neighbor cells (a map,
not a shuffle amplification of the other side), and the equi-join on the
cell id co-locates exactly the points that can be within `radius`. Skewed
density (a hot city) is a hot cell: `grid_neighbor_pairs_salted` splits
each hot cell's probes into `salt` sub-buckets (hash of the probe id) and
replicates ONLY the hot cells' build rows across those buckets, so the
straggler task becomes `salt` independent tasks while cold cells pay
nothing. Everything is int64 arithmetic, so Spark and any oracle agree
bit-exactly (no trig, no floats).

The reference has no spatial operators (EXT family): this is the standard
fixed-grid spatial join (the same shape Sedona/PostGIS use for
distance-bounded self-joins), chosen over a cross join + haversine for
exactness and shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floor_div_sql(col: str, d: int) -> str:
    """Exact floor division of a BIGINT column by a positive literal.

    Spark's integer `div` truncates toward zero and `%` keeps the
    dividend's sign (Java semantics), so for negative coordinates plain
    `div` maps points straddling zero into NON-adjacent cells (e.g. -1 and
    +1 both land in cell 0 at radius 2 under truncation, but belong in
    cells -1 and 0). Adjust by 1 whenever a negative dividend leaves a
    remainder — exact at the full int64 range, unlike FLOOR(x / d) which
    round-trips through a double.
    """
    c = f"CAST({col} AS BIGINT)"
    return f"(({c} div {d}) - (CASE WHEN {c} % {d} < 0 THEN 1 ELSE 0 END))"


def _cells(points: DataFrame, id_col: str, x_col: str, y_col: str, radius: int) -> DataFrame:
    """One row per point with its home cell id (exact floor-div grid)."""
    return points.select(
        F.col(id_col).alias("_pid"),
        F.col(x_col).cast("bigint").alias("_px"),
        F.col(y_col).cast("bigint").alias("_py"),
        F.expr(_floor_div_sql(x_col, radius)).alias("_cx"),
        F.expr(_floor_div_sql(y_col, radius)).alias("_cy"),
    )


def _probes(cells: DataFrame) -> DataFrame:
    """Explode each point onto its 3x3 neighbor cells (the probe side)."""
    return cells.select(
        F.col("_pid").alias("_aid"),
        F.col("_px").alias("_ax"),
        F.col("_py").alias("_ay"),
        F.explode(
            F.expr("flatten(transform(sequence(-1, 1), dx -> "
                   "transform(sequence(-1, 1), dy -> "
                   "named_struct('cx', _cx + dx, 'cy', _cy + dy))))")
        ).alias("_cell"),
    ).select("_aid", "_ax", "_ay", F.col("_cell.cx").alias("_cx"), F.col("_cell.cy").alias("_cy"))


def _verified_pairs(joined: DataFrame, radius: int) -> DataFrame:
    """Exact int64 distance verify + output projection (shared tail)."""
    d2 = (F.col("_ax") - F.col("_px")) * (F.col("_ax") - F.col("_px")) + (
        F.col("_ay") - F.col("_py")
    ) * (F.col("_ay") - F.col("_py"))
    return (
        joined.select(
            F.col("_aid").alias("id_a"),
            F.col("_pid").alias("id_b"),
            d2.cast("bigint").alias("dist_sq"),
        )
        .where(F.col("dist_sq") <= F.lit(radius * radius))
    )


def grid_neighbor_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All unordered pairs (a, b) with a.id < b.id and squared Euclidean
    distance <= radius² — exact. `points` must carry integer coordinates
    (negative allowed — cell ids use exact floor division); the cell size
    equals `radius`, so every qualifying pair co-occurs in some 3x3 cell
    neighborhood (|dx| <= r ⇒ cell delta in {-1, 0, 1}).

    Output: (id_a, id_b, dist_sq). Each pair is emitted exactly once: the
    LEFT side explodes onto its 9 neighbor cells and joins the RIGHT
    side's unique home cell."""
    cells = _cells(points, id_col, x_col, y_col, radius)
    joined = _probes(cells).join(cells, ["_cx", "_cy"]).where(F.col("_aid") < F.col("_pid"))
    return _verified_pairs(joined, radius)


def grid_neighbor_pairs_salted(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    salt: int = 8,
    hot_threshold: int = 64,
) -> DataFrame:
    """`grid_neighbor_pairs` with hot-cell salting: bit-identical output,
    skew-proof shuffle. Cells holding >= `hot_threshold` points are "hot";
    probes targeting a hot cell are split into `salt` sub-buckets by
    xxhash64 of the probe id, and ONLY the hot cells' build rows replicate
    across all `salt` buckets (cold cells join once on bucket 0). Every
    original (probe, build) pair meets in exactly one (cell, bucket), so
    the result multiset is identical to the unsalted join, while the hot
    cell's candidate volume is spread over `salt` independent join tasks.

    Cost model at 100x: the hot-cell list is tiny (cells over threshold)
    and broadcast; the build-side blowup is `salt` x (hot rows only) —
    bounded and chosen, unlike a straggler task that is neither."""
    if salt < 2:
        raise ValueError(f"salt must be >= 2 (got {salt})")
    cells = _cells(points, id_col, x_col, y_col, radius)
    hot = (
        cells.groupBy("_cx", "_cy")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= hot_threshold)
        .select("_cx", "_cy", F.lit(True).alias("_hot"))
    )
    probes = (
        _probes(cells)
        .join(F.broadcast(hot), ["_cx", "_cy"], "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot").isNotNull(), F.pmod(F.xxhash64(F.col("_aid")), F.lit(salt)))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("_hot")
    )
    build = (
        cells.join(F.broadcast(hot), ["_cx", "_cy"], "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot").isNotNull(),
                    F.expr(f"transform(sequence(0, {salt - 1}), s -> CAST(s AS INT))"),
                ).otherwise(F.array(F.lit(0).cast("int")))
            ),
        )
        .drop("_hot")
    )
    joined = probes.join(build, ["_cx", "_cy", "_salt"]).where(F.col("_aid") < F.col("_pid"))
    return _verified_pairs(joined, radius)
