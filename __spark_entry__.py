"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the engine's query registry
(`flink_dts_connector_spark/plans/registry.py`): every implemented operator
from SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame callable plus,
when SQL-expressible, the equivalent DuckDB oracle SQL. The local pytest
harness (`tests/test_oracle_parity.py`) runs the same comparison the driver
does, at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_dts_connector_spark.plans.registry import all_queries  # noqa: E402

FLAGSHIP = "q1_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()[FLAGSHIP]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
