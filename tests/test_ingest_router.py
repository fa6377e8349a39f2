"""The programmatic ingest-path chooser (formats/router.py): the decision
table's break-evens are COMPUTED from the pinned INGEST_TRADEOFF_r09
numbers, every feasible route returns the identical typed changelog, and
infeasible environments fail fast."""

import pytest

from flink_dts_connector_spark.formats.router import (
    MEASURED_SF1,
    IngestDecision,
    choose_ingest_path,
    read_changelog_routed,
)


def test_chooser_python_low_reuse_picks_fused():
    d = choose_ingest_path(declared_schema=True, python_workers=True, expected_reads=1)
    assert d.path == "python_fused"
    assert d.est_cost_sec == MEASURED_SF1["python_pass_sec"]


def test_chooser_break_even_matches_pinned_numbers():
    """Store wins exactly from the N where build + N*serve < N*pass — with
    the pinned numbers that is N=7 (25.55 + N*0.49 vs N*4.40)."""
    m = MEASURED_SF1
    break_even = next(
        n
        for n in range(1, 100)
        if m["store_build_sec"] + n * m["store_serve_sec"] < n * m["python_pass_sec"]
    )
    assert break_even == 7
    below = choose_ingest_path(
        declared_schema=True, python_workers=True, expected_reads=break_even - 1
    )
    at = choose_ingest_path(
        declared_schema=True, python_workers=True, expected_reads=break_even
    )
    assert below.path == "python_fused"
    assert at.path == "store" and at.build_via == "python_fused"


def test_chooser_no_python_requires_declared_schema():
    one = choose_ingest_path(
        declared_schema=True, python_workers=False, expected_reads=1
    )
    assert one.path == "jvm_typed"  # one pass: cold plan + pass beats build+serve
    many = choose_ingest_path(
        declared_schema=True, python_workers=False, expected_reads=3
    )
    assert many.path == "store" and many.build_via == "jvm_typed"
    with pytest.raises(ValueError, match="no feasible ingest path"):
        choose_ingest_path(declared_schema=False, python_workers=False, expected_reads=5)
    with pytest.raises(ValueError, match="expected_reads"):
        choose_ingest_path(declared_schema=True, python_workers=True, expected_reads=0)


def test_all_routes_return_identical_changelog(spark, sf_dir):
    """Route-independence: python_fused, jvm_typed, store(python build) and
    store(jvm build) all collect the same multiset — the chooser changes
    the cost shape, never the answer."""
    from flink_dts_connector_spark.plans.cdc_queries import ORDERS_CDC_SCHEMA
    from flink_dts_connector_spark.sources.generator import DB, ORDERS_FIELDS, TBL

    table = f"{DB}.{TBL}"
    frames = {}
    for dec in [
        IngestDecision("python_fused", None, 0.0, "test"),
        IngestDecision("jvm_typed", None, 0.0, "test"),
        IngestDecision("store", "python_fused", 0.0, "test"),
        IngestDecision("store", "jvm_typed", 0.0, "test"),
    ]:
        df = read_changelog_routed(
            spark, sf_dir, ORDERS_CDC_SCHEMA, ORDERS_FIELDS, table, dec
        )
        key = f"{dec.path}/{dec.build_via}"
        frames[key] = sorted(
            tuple(row) for row in df.select(*sorted(df.columns)).collect()
        )
    base = frames["python_fused/None"]
    assert len(base) > 0
    for key, rows in frames.items():
        assert rows == base, f"route {key} diverged from python_fused"


def test_routed_reader_rejects_unknown_path(spark, sf_dir):
    from flink_dts_connector_spark.plans.cdc_queries import ORDERS_CDC_SCHEMA
    from flink_dts_connector_spark.sources.generator import DB, ORDERS_FIELDS, TBL

    with pytest.raises(ValueError, match="unknown ingest path"):
        read_changelog_routed(
            spark,
            sf_dir,
            ORDERS_CDC_SCHEMA,
            ORDERS_FIELDS,
            f"{DB}.{TBL}",
            IngestDecision("carrier_pigeon", None, 0.0, "test"),
        )
