"""Programmatic ingest-path chooser — the code form of SCALING.md's
"which ingest path when" decision table (measured at sf1, 32 cores,
fresh-lineage, cross-path checksum-gated: tools/ingest_tradeoff.py →
INGEST_TRADEOFF_r11.json, re-measured from INGEST_TRADEOFF_r09.json
with every tier within 10% of its r9 pin).

Three ways to turn wire bytes into a typed changelog, identical output,
very different cost shapes:

- **python_fused** (`decoder.decode_cdc` + `typed.project_table`): the
  Arrow-batched fused Python decoder. Highest raw throughput per pass
  (435k rec/s at the pinned measurement) but needs Python workers on the
  cluster.
- **jvm_typed** (`jvmvalue.decode_typed_jvm`): declared-schema decode as
  pure Catalyst expressions — zero Python anywhere in the plan. ~6x
  slower per pass (69k rec/s) plus a one-time cold-plan cost; it exists
  for the resource shape (no Python workers allowed), never throughput.
- **store** (`ingest.ingest_once` + `ingest.read_store`): decode ONCE,
  persist the envelope partitioned by (table, month), serve every later
  read as a pure JVM parquet scan (4.6M rec/s). The build costs roughly
  one decode pass; it amortizes against per-pass decode from a handful of
  reads.

The chooser prices each feasible path at the pinned measurement and picks
the cheapest — so the break-even ("store wins from N≈6 Python passes")
is COMPUTED from the artifact numbers, not hand-waved, and a re-measure
updates the thresholds by editing one dict. Reference parity: the
reference decodes once per record inline
(`DTSSubscribeRowDataDeserializationSchema.java:139-184`) and has no
store tier; the chooser is EXT surface for the 100 TB deployment, where
re-decoding a hot table per query is the difference between one decode
pass and hundreds.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

#: pinned from INGEST_TRADEOFF_r11.json — sf1, local[32], 1,917,250 raw
#: records, per-component min over two full runs of min-of-3 fresh-lineage
#: walls, cross-path checksum green (r9 pins were within 10% on every tier).
MEASURED_SF1 = {
    "python_pass_sec": 4.59,
    "jvm_pass_sec": 29.68,
    "jvm_cold_plan_sec": 37.36,
    "store_build_sec": 25.47,  # one Python-fused decode + write + stored≡re-decoded audit
    "store_serve_sec": 0.42,
}


@dataclass(frozen=True)
class IngestDecision:
    """Outcome of `choose_ingest_path`: the path, how a store build would
    decode (same constraint logic as the per-pass paths), the projected
    cost of the whole read plan at the pinned sf1 measurement, and the
    human-readable rationale."""

    path: str  # "python_fused" | "jvm_typed" | "store"
    build_via: str | None  # store only: "python_fused" | "jvm_typed"
    est_cost_sec: float
    reason: str


def _candidates(
    declared_schema: bool, python_workers: bool, expected_reads: int
) -> list[IngestDecision]:
    m = MEASURED_SF1
    n = expected_reads
    out: list[IngestDecision] = []
    if python_workers:
        out.append(
            IngestDecision(
                "python_fused",
                None,
                n * m["python_pass_sec"],
                f"{n} fused-decoder passes at {m['python_pass_sec']}s each",
            )
        )
        out.append(
            IngestDecision(
                "store",
                "python_fused",
                m["store_build_sec"] + n * m["store_serve_sec"],
                f"one {m['store_build_sec']}s python-fused build + "
                f"{n} pruned parquet serves at {m['store_serve_sec']}s",
            )
        )
    if declared_schema:
        out.append(
            IngestDecision(
                "jvm_typed",
                None,
                m["jvm_cold_plan_sec"] + n * m["jvm_pass_sec"],
                f"one {m['jvm_cold_plan_sec']}s cold plan + {n} zero-Python "
                f"passes at {m['jvm_pass_sec']}s",
            )
        )
        if not python_workers:
            # a store can still be built without Python workers: decode the
            # build pass with the JVM typed expressions, then serve scans
            out.append(
                IngestDecision(
                    "store",
                    "jvm_typed",
                    m["jvm_cold_plan_sec"]
                    + m["jvm_pass_sec"]
                    + n * m["store_serve_sec"],
                    "one zero-Python JVM build pass + "
                    f"{n} pruned parquet serves at {m['store_serve_sec']}s",
                )
            )
    return out


def choose_ingest_path(
    *,
    declared_schema: bool,
    python_workers: bool,
    expected_reads: int,
) -> IngestDecision:
    """Pick the cheapest feasible ingest path for a table.

    Inputs are the three axes the decision table keys on: is the table's
    schema declared (the JVM typed tier and any typed projection need it),
    may the cluster run Python workers (security posture / resource
    shape), and how many times will this table's changelog be read
    (store amortization). Raises when no path is feasible — a schema-less
    topic on a Python-free cluster has no decoder (the generic wire walk
    is inherently a fold; see SCALING.md's measured boundary).
    """
    if expected_reads < 1:
        raise ValueError(f"expected_reads must be >= 1 (got {expected_reads})")
    cands = _candidates(declared_schema, python_workers, expected_reads)
    if not cands:
        raise ValueError(
            "no feasible ingest path: schema-less decode requires Python "
            "workers (the generic varint walk is a fold — SCALING.md, "
            "'why the generic JVM value decode stays out')"
        )
    return min(cands, key=lambda d: d.est_cost_sec)


def read_changelog_routed(
    spark: SparkSession,
    sf_dir: str,
    schema,
    fields,
    table: str,
    decision: IngestDecision,
) -> DataFrame:
    """Execute an `IngestDecision` for one declared table: same typed
    changelog whichever path the chooser picked (the routed registry query
    pins this with a path-independent oracle, and
    tests/test_ingest_router.py asserts all three routes collect the
    identical multiset)."""
    from flink_dts_connector_spark.formats.typed import project_table
    from flink_dts_connector_spark.sources.generator import generate_cdc_bytes

    if decision.path == "python_fused":
        from flink_dts_connector_spark.formats.decoder import decode_cdc

        env = decode_cdc(
            generate_cdc_bytes(spark, sf_dir),
            tables=[table],
            ops=["INSERT", "UPDATE", "DELETE"],
            columns=[f.name for f in schema.fields],
        )
        return project_table(env, schema, table=table)
    if decision.path == "jvm_typed":
        from flink_dts_connector_spark.formats.jvmvalue import decode_typed_jvm

        return decode_typed_jvm(
            generate_cdc_bytes(spark, sf_dir), schema, fields, table
        )
    if decision.path == "store":
        if decision.build_via == "jvm_typed":
            # zero-Python build: decode the one build pass with the JVM
            # typed expressions and persist the TYPED rows (a single-table
            # store); serves are pure parquet scans. Cached per session.
            from flink_dts_connector_spark.formats.jvmvalue import decode_typed_jvm
            from flink_dts_connector_spark.streaming.runner import scratch_dir

            key = (spark.sparkContext.applicationId, sf_dir, table, "jvm_store")
            path = _TYPED_STORE_CACHE.get(key)
            if path is None:
                path = scratch_dir("fdcs_typedstore_")
                decode_typed_jvm(
                    generate_cdc_bytes(spark, sf_dir), schema, fields, table
                ).write.mode("overwrite").parquet(path)
                _TYPED_STORE_CACHE[key] = path
            return spark.read.parquet(path)
        from flink_dts_connector_spark.formats.ingest import read_store

        env = read_store(spark, sf_dir, table=table.rsplit(".", 1)[-1])
        return project_table(env, schema, table=table)
    raise ValueError(f"unknown ingest path: {decision.path!r}")


#: (applicationId, sf_dir, table, kind) -> persisted typed-store directory
_TYPED_STORE_CACHE: dict[tuple, str] = {}
