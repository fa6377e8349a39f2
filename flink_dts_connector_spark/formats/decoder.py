"""Spark decode pipeline: DataFrame[value: binary] → envelope DataFrame.

Equivalent of the reference's deserializer chain
(`formats/raw/DtsRecordDeserializationSchema.java:11-16` for the generic
layer, `DTSSubscribeRowDataDeserializationSchema.java:65-93` for the
filtered layer) re-expressed as `mapInPandas`: Arrow-batched, one Python
worker per partition, no per-row Python UDF overhead.

Laziness parity: `decode_cdc(..., tables=, ops=)` runs the cheap header
decode first and only parses the payload for records that survive the
op-type/table filters — same cost model as the reference's two-phase lazy
parse (`impl/LazyParseRecordImpl.java:53-84`,
`DTSSubscribeRowDataDeserializationSchema.java:68-74`).

Scale: decode parallelism = source partitions (Kafka partitions or file
splits). The UDF is stateless per batch, so 1000 executors decode 1000
partitions independently; no shuffle is introduced.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame

from flink_dts_connector_spark.datamodel.envelope import ENVELOPE_SCHEMA, OperationType
from flink_dts_connector_spark.formats.wire import (
    decode_header,
    decode_payload,
    render_value,
)

_ENVELOPE_COLS = [f.name for f in ENVELOPE_SCHEMA.fields]


def _decode_batch(
    raw_values: Sequence[bytes],
    partitions: Sequence,
    offsets: Sequence,
    tables: frozenset[str] | None,
    ops: frozenset[str] | None,
    columns: frozenset[str] | None = None,
    skip_errors: bool = False,
) -> dict[str, list]:
    import datetime as dt
    import json

    out: dict[str, list] = {c: [] for c in _ENVELOPE_COLS}
    fielddef_cache: dict = {}  # per-batch schema cache (decode_payload docstring)
    pk_cache: dict[str, tuple] = {}  # pk_uk_info json text → parsed (pk, uk)
    for raw, part, off in zip(raw_values, partitions, offsets):
        # All parsing happens before any column append, so a 'skip' on a
        # poison pill can never leave the column lists misaligned.
        try:
            h = decode_header(raw)
            op_name = h.operation.name
            # Phase-1 filters: never touch payload bytes for dropped records.
            if ops is not None and op_name not in ops:
                continue
            if tables is not None:
                # logical name overrides via tags (LazyRecordDeserializer.java:319-322)
                db = h.tags.get("l_db_name", h.db)
                tbl = h.tags.get("l_tb_name", h.tbl)
                if f"{db}.{tbl}" not in tables:
                    continue
            fields, before, after = decode_payload(raw, h, fielddef_cache)
            names = [f.name for f in fields]
            # column pruning into the decoder (SURVEY.md §4): fields outside
            # the declared projection skip string rendering entirely
            keep_set = set(names) if columns is None else columns
            before_map = (
                {n: render_value(k, v) for n, (k, v) in zip(names, before) if n in keep_set}
                if before
                else None
            )
            after_map = (
                {n: render_value(k, v) for n, (k, v) in zip(names, after) if n in keep_set}
                if after
                else None
            )
            pk_uk = h.tags.get("pk_uk_info")
            pk_cols, uk_info = None, None
            if pk_uk:
                cached = pk_cache.get(pk_uk)
                if cached is None:
                    info = json.loads(pk_uk)
                    cached = (
                        info.get("PRIMARY", []),
                        {k: v for k, v in info.items() if k != "PRIMARY"},
                    )
                    pk_cache[pk_uk] = cached
                pk_cols, uk_info = cached
        except Exception:
            if skip_errors:
                continue
            raise
        out["id"].append(h.id)
        out["transaction_id"].append(h.transaction_id)
        out["ts"].append(dt.datetime.fromtimestamp(h.ts, dt.timezone.utc).replace(tzinfo=None))
        out["born_ts"].append(
            dt.datetime.fromtimestamp(h.born_ts, dt.timezone.utc).replace(tzinfo=None)
        )
        out["operation"].append(op_name)
        out["source_type"].append(h.source_type.name)
        out["source_version"].append(h.source_version)
        out["db"].append(h.db)
        out["tbl"].append(h.tbl)
        out["before"].append(before_map)
        out["after"].append(after_map)
        out["pk_cols"].append(pk_cols)
        out["uk_info"].append(uk_info)
        out["tags"].append(h.tags or None)
        out["kafka_partition"].append(None if part is None or pd.isna(part) else int(part))
        out["kafka_offset"].append(None if off is None or pd.isna(off) else int(off))
    return out


def decode_cdc(
    raw_df: DataFrame,
    tables: Sequence[str] | None = None,
    ops: Sequence[str | OperationType] | None = None,
    columns: Sequence[str] | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Decode a binary CDC stream/batch into the generic envelope.

    ``raw_df`` needs a ``value: binary`` column; ``partition``/``offset``
    columns are carried through as kafka metadata when present. ``tables``
    filters on ``db.tbl`` qualified names, ``ops`` on operation names —
    both applied header-only, before payload decode. ``columns`` prunes
    image rendering to the named fields (the declared-schema fast path).
    ``on_error``: 'fail' (default — a corrupt record kills the job loudly)
    or 'skip' (poison-pill tolerance: drop undecodable records, the
    production CDC posture when a topic may carry foreign garbage).
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    table_set = frozenset(tables) if tables is not None else None
    op_set = (
        frozenset(o.name if isinstance(o, OperationType) else str(o) for o in ops)
        if ops is not None
        else None
    )
    col_set = frozenset(columns) if columns is not None else None
    has_part = "partition" in raw_df.columns
    has_off = "offset" in raw_df.columns

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts = pdf["partition"] if has_part else [None] * len(pdf)
            offs = pdf["offset"] if has_off else [None] * len(pdf)
            out = _decode_batch(
                pdf["value"], parts, offs, table_set, op_set, col_set,
                skip_errors=(on_error == "skip"),
            )
            if not out["id"]:
                # fully-filtered batch: yield nothing — an empty pandas frame
                # would carry float64 dtypes Arrow can't cast to timestamp
                continue
            yield pd.DataFrame(out, columns=_ENVELOPE_COLS)

    return raw_df.mapInPandas(fn, schema=ENVELOPE_SCHEMA)
