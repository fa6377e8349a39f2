"""Changelog semantics kit — Spark's answer to Flink retraction streams.

The reference emits a retraction changelog (I/UB/UA/D,
`DTSSubscribeTableSourceFactory.java:50-57`) and relies on the host planner
to propagate retractions through aggregates
(`DtsTableISelectTCaseTest.java:91` consumes a retract stream). Spark has no
RowKind, so downstream correctness is recovered with two explicit patterns
(SURVEY.md §4.4):

  * signed aggregation — additive measures weighted +1 (I/UA) / −1 (UB/D)
    aggregate to the same result the retract stream would give;
  * upsert materialization — reduce the changelog to current state by
    keeping each key's latest image and dropping deletes.

Both are pure DataFrame ops: one shuffle on the grouping/pk key, AQE-safe,
streaming-compatible (the same expressions run under foreachBatch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

#: +1 for rows that add to state, −1 for retractions.
SIGN = {"I": 1, "UA": 1, "UB": -1, "D": -1}


def sign_col(op: Column | str = "op") -> Column:
    op = F.col(op) if isinstance(op, str) else op
    return (
        F.when(op.isin("I", "UA"), F.lit(1)).when(op.isin("UB", "D"), F.lit(-1)).otherwise(F.lit(0))
    )


def signed_sum(measure: Column, op: Column | str = "op") -> Column:
    """SUM(measure) over a changelog — retraction-correct."""
    return F.sum(measure * sign_col(op))


def signed_count(op: Column | str = "op") -> Column:
    """COUNT(*) over a changelog — retraction-correct."""
    return F.sum(sign_col(op))


def materialize_upsert(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = ("ts", "record_id"),
) -> DataFrame:
    """Reduce a changelog to current state: latest image per key, deletes
    removed. UB rows are ignored (they never carry final state).

    Implemented as ``max_by(payload, order)`` — a hash aggregate with
    map-side partial combine (each partition keeps one candidate per key
    before the shuffle), instead of a window sort which shuffles every
    changelog row and then sorts per key. ``order_cols`` must be a total
    order per key (commit ts + monotonic record id, which the wire format
    guarantees — `DtsRecord.java:13`).
    """
    df = changelog.where(F.col("op") != "UB")
    payload_cols = [c for c in df.columns if c not in key_cols]
    order = F.struct(*[F.col(c) for c in order_cols])
    latest = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload_cols]), order).alias("_latest")
    )
    out = latest.select(
        *key_cols, *[F.col(f"_latest.{c}").alias(c) for c in payload_cols]
    )
    return out.where(F.col("op") != "D").drop("op")


def materialize_scd2(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = ("ts", "record_id"),
    ts_col: str = "ts",
) -> DataFrame:
    """Changelog → type-2 slowly-changing-dimension history: one row per
    VERSION of each key with ``valid_from``/``valid_to``/``is_current``.

    Versions are the state-carrying rows (I/UA); each version's validity
    ends when the key's NEXT event (new version or delete) commits — so a
    deleted key's last version is closed, and only live keys have an open
    (``valid_to`` null, ``is_current`` true) row. One window over the pk
    (same single-shuffle envelope as every ranking op); UB rows never
    carry final state and are dropped first."""
    events = changelog.where(F.col("op").isin("I", "UA", "D"))
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    with_end = events.withColumn("_next_ts", F.lead(F.col(ts_col)).over(w))
    versions = with_end.where(F.col("op") != "D")
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.col("_next_ts"))
        .withColumn("is_current", F.col("_next_ts").isNull())
        .drop("_next_ts", "op")
    )
