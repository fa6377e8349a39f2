"""Skew-mitigation helpers (SURVEY.md scale mandate: "skewed keys → salting
or AQE skew-join").

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime for sort-merge joins. Salting is the explicit fallback for the cases
AQE can't fix: skewed AGGREGATION keys (two-phase agg below) and skewed
joins whose build side must be replicated.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join a skew-keyed big side with a small side too large to broadcast:
    big rows get a random-but-deterministic salt (hash of all columns mod
    ``salt``); small rows replicate ``salt`` times; the join key becomes
    (key, salt) — hot keys spread across ``salt`` reducers.

    Result is row-identical to ``big.join(small, on, how)`` (tested in
    tests/test_skew.py); cost is small-side replication ×salt.

    ``how`` is restricted to joins whose output is driven by the big side:
    for right/full outer joins each UNMATCHED small-side row would be
    emitted once per salt replica (matched rows are fine — exactly one
    replica carries each big row), so those modes raise.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side rows "
            f"would duplicate ×salt under right/full outer joins (allowed: inner, "
            f"left, left_semi, left_anti)"
        )
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    salt: int = 16,
) -> DataFrame:
    """Skew-safe aggregation for ALGEBRAIC aggregates: phase 1 aggregates on
    (keys, salt) — hot keys split across ``salt`` reducers — phase 2
    re-aggregates the partials on keys alone.

    ``aggs``: name → (phase-1 aggregate expression, combiner), combiner one
    of 'sum' | 'min' | 'max' (count combines with 'sum'). The salt comes
    from a per-row id, not the keys — salting by key would put a hot key
    back on one reducer.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()]
    )
    combine = {"sum": F.sum, "min": F.min, "max": F.max}
    combiners = []
    for name, (_, how) in aggs.items():
        if how not in combine:
            raise ValueError(f"non-algebraic combiner for two_phase_agg: {how}")
        combiners.append(combine[how](F.col(f"_p_{name}")).alias(name))
    return phase1.groupBy(*keys).agg(*combiners)
