"""As-of and range joins — operators the reference's host engine offers as
temporal/interval joins (SURVEY.md §2.3) and Spark lacks natively.

Both are built scale-first:

  * as-of join — NOT the naive theta-join (which explodes to |L|·|R| per
    key before picking the max). Implemented as union + window: tag both
    sides, sort per key by event time, carry the last right-side row
    forward with last_value(ignoreNulls). One shuffle on the key, linear
    state, no pair blow-up — the classic merge-asof as a window plan.
  * range join — equi-join on coarse time buckets (each left row probes its
    own and the preceding bucket) + exact predicate filter. The bucket key
    bounds the quadratic term to per-bucket pairs; Catalyst executes it as
    a normal shuffled equi-join instead of a broadcast-nested-loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key (pandas.merge_asof
    semantics, distributed).

    ``tie_break``: extra right-side column ordering rows with equal
    ``right_ts`` (latest wins) — makes the result deterministic when the
    right side has duplicate timestamps.
    """
    lt, rt = F.col(left_ts), F.col(right_ts)
    tb = F.col(tie_break) if tie_break else F.lit(0)

    r = right.select(
        F.col(on),
        rt.alias("_t"),
        (tb if tie_break else F.lit(0)).alias("_tb"),
        F.lit(1).alias("_side"),  # right rows sort before left at equal ts
        F.struct(*[F.col(c) for c in right_cols]).alias("_rv"),
    )
    l = left.withColumn("_t", lt).withColumn("_tb", F.lit(None).cast(r.schema["_tb"].dataType)) \
        .withColumn("_side", F.lit(2)).withColumn("_rv", F.lit(None).cast(r.schema["_rv"].dataType))

    # keep left payload: align schemas by adding right's carry columns only
    union = l.select(
        *left.columns, "_t", "_tb", "_side", "_rv"
    ).unionByName(
        r.select(
            F.col(on),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
            "_t",
            "_tb",
            "_side",
            "_rv",
        )
    )
    w = (
        W.partitionBy(on)
        .orderBy(F.asc("_t"), F.asc("_side"), F.asc_nulls_first("_tb"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = union.withColumn("_last_rv", F.last("_rv", ignorenulls=True).over(w)).withColumn(
        "_last_rt", F.last(F.when(F.col("_side") == 1, F.col("_t")), ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 2)
    if tolerance_seconds is not None:
        within = (
            F.unix_micros(F.col("_t")) - F.unix_micros(F.col("_last_rt"))
            <= tolerance_seconds * 1_000_000
        )
        out = out.withColumn(
            "_last_rv", F.when(within, F.col("_last_rv")).otherwise(F.lit(None))
        )
    return out.select(
        *left.columns,
        *[F.col(f"_last_rv.{c}").alias(c) for c in right_cols],
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    condition: Column | None = None,
) -> DataFrame:
    """Pairs (l, r) with same key and ``left_ts - max_gap <= right_ts <=
    left_ts``: bucketized so Catalyst runs a shuffled EQUI-join on
    (key, bucket) — each left row probes 2 buckets — then filters exactly.

    At 100 TB the alternative (pure theta join) is a broadcast-nested-loop
    over every key group; this shape keeps the shuffle key selective.
    """
    gap_us = max_gap_seconds * 1_000_000
    lb = left.withColumn("_lt_us", F.unix_micros(F.col(left_ts)))
    rb = right.withColumnRenamed(on, "_r_key").withColumn(
        "_rt_us", F.unix_micros(F.col(right_ts))
    ).withColumn("_bucket", F.expr(f"_rt_us div {gap_us}"))
    probes = lb.withColumn(
        "_probe",
        F.explode(
            F.array(
                F.expr(f"_lt_us div {gap_us}"),
                F.expr(f"_lt_us div {gap_us}") - 1,
            )
        ),
    )
    joined = probes.join(
        rb, (probes[on] == rb["_r_key"]) & (probes["_probe"] == rb["_bucket"])
    ).where(
        (F.col("_rt_us") <= F.col("_lt_us"))
        & (F.col("_rt_us") >= F.col("_lt_us") - F.lit(gap_us))
    )
    if condition is not None:
        joined = joined.where(condition)
    return joined.drop("_lt_us", "_rt_us", "_bucket", "_probe", "_r_key")
