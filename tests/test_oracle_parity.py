"""Every registry query with an oracle must hash-match DuckDB at sf0.001 —
the same gate the driver applies at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from flink_dts_connector_spark.plans.registry import all_queries
from tests.oracle_util import compare, duckdb_conn

_QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(name, spark, sf_dir, con):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        # rows-only check (matches the driver's weaker gate for non-SQL ops)
        assert df.count() >= 0 and len(df.schema) > 0
        return
    compare(df, con, q.oracle)
