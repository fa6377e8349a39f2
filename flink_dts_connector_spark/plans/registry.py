"""Query registry: the single source of truth for the engine's query battery.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` and the pytest oracle
harness both iterate this registry, so the local tests exercise exactly the
same contract the driver's correctness gate does.

Determinism contract (why the oracle hash-match holds under parallelism):
sums over DOUBLE columns are order-sensitive in the last ulp, and Spark's
partition order is not deterministic. Every aggregate over money/quantity
therefore routes through *exact decimal arithmetic* — cast inputs to bounded
DECIMALs, multiply/sum exactly, cast the final result to DOUBLE — in BOTH the
Spark plan and the oracle SQL. Exact rational arithmetic is order-insensitive,
so both engines produce bit-identical doubles.

Magnitude constraint (measured): DuckDB's DECIMAL(38,6)→DOUBLE conversion is
only correctly rounded while the scaled numerator stays under 2^53, i.e.
absolute values < ~9.0e9 (Spark's BigDecimal path is always correct). Every
aggregate here peaks ≤ ~2.3e9 at the driver's sf0.01 gate (≈4× margin). A
future query summing larger magnitudes must reduce the final scale (e.g.
DECIMAL(38,2)) in BOTH engines before the double cast.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None for rows-only checked ops
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the battery."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tuple(tags), doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import flink_dts_connector_spark.plans.advanced  # noqa: F401
    import flink_dts_connector_spark.plans.cdc_queries  # noqa: F401
    import flink_dts_connector_spark.plans.ext_queries  # noqa: F401
    import flink_dts_connector_spark.plans.functions  # noqa: F401
    import flink_dts_connector_spark.plans.relational  # noqa: F401
    import flink_dts_connector_spark.plans.streaming_queries  # noqa: F401


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    _load_all()
    return _REGISTRY[name]
