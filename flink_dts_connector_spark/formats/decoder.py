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

from flink_dts_connector_spark.datamodel.envelope import (
    ENVELOPE_SCHEMA,
    KAFKA_TIMESTAMP_TYPES,
    OperationType,
)
from flink_dts_connector_spark.formats.wire import (
    decode_header,
    decode_payload,
    render_object_names,
    render_value,
)

_ENVELOPE_COLS = [f.name for f in ENVELOPE_SCHEMA.fields]

#: Kafka metadata columns carried through from the raw source when present —
#: the Spark Kafka source's own names (table/DtsDynamicSource.java:268-345
#: readable-metadata parity; `headers` needs .option("includeHeaders", true)).
_META_COLS = ("partition", "offset", "topic", "timestamp", "timestampType", "headers")


def _headers_to_map(h) -> dict[str, bytes] | None:
    """Kafka headers array<struct<key,value>> → MAP<STRING, BYTES> (the
    reference's HEADERS metadata shape, DtsDynamicSource.java:294-310)."""
    if h is None:
        return None
    try:
        if len(h) == 0:
            return {}
    except TypeError:
        return None
    out = {}
    for item in h:
        if isinstance(item, dict):
            out[item.get("key")] = item.get("value")
        else:  # pyspark Row
            out[item["key"]] = item["value"]
    return out


def _opt_int(v) -> int | None:
    return None if v is None or pd.isna(v) else int(v)


def _decode_batch(
    raw_values: Sequence[bytes],
    meta: dict[str, Sequence],
    tables: frozenset[str] | None,
    ops: frozenset[str] | None,
    columns: frozenset[str] | None = None,
    skip_errors: bool = False,
    images: bool = True,
) -> dict[str, list]:
    """Fast path: fused decode+render core (formats/fastdecode.py, ~2× the
    reference loop below) + kafka-metadata alignment from the survivor
    indices. Output is pinned bit-equal to `_decode_batch_reference` by
    tests/test_cdc_pipeline.py::test_fastdecode_parity."""
    import datetime as dt

    from flink_dts_connector_spark.formats.fastdecode import decode_batch_core

    out, kept = decode_batch_core(
        raw_values, tables, ops, columns, skip_errors=skip_errors, images=images
    )
    parts = meta.get("partition")
    offs = meta.get("offset")
    topics = meta.get("topic")
    ktss = meta.get("timestamp")
    kts_types = meta.get("timestampType")
    headers = meta.get("headers")
    n = len(kept)
    out["kafka_partition"] = (
        [_opt_int(parts[i]) for i in kept] if parts is not None else [None] * n
    )
    out["kafka_offset"] = [_opt_int(offs[i]) for i in kept] if offs is not None else [None] * n
    out["kafka_topic"] = (
        [
            None
            if topics[i] is None or (isinstance(topics[i], float) and pd.isna(topics[i]))
            else str(topics[i])
            for i in kept
        ]
        if topics is not None
        else [None] * n
    )
    if ktss is not None:
        col = []
        for i in kept:
            kts = ktss[i]
            if kts is None or pd.isna(kts):
                kts = None
            else:
                if isinstance(kts, pd.Timestamp):
                    kts = kts.to_pydatetime()
                if kts.tzinfo is not None:
                    kts = kts.astimezone(dt.timezone.utc).replace(tzinfo=None)
            col.append(kts)
        out["kafka_timestamp"] = col
    else:
        out["kafka_timestamp"] = [None] * n
    if kts_types is not None:
        col = []
        for i in kept:
            ktt = _opt_int(kts_types[i])
            col.append(None if ktt is None else KAFKA_TIMESTAMP_TYPES.get(ktt, str(ktt)))
        out["kafka_timestamp_type"] = col
    else:
        out["kafka_timestamp_type"] = [None] * n
    out["kafka_headers"] = (
        [_headers_to_map(headers[i]) for i in kept] if headers is not None else [None] * n
    )
    return out


def _decode_batch_reference(
    raw_values: Sequence[bytes],
    meta: dict[str, Sequence],
    tables: frozenset[str] | None,
    ops: frozenset[str] | None,
    columns: frozenset[str] | None = None,
    skip_errors: bool = False,
    images: bool = True,
) -> dict[str, list]:
    import datetime as dt
    import json

    out: dict[str, list] = {c: [] for c in _ENVELOPE_COLS}
    fielddef_cache: dict = {}  # per-batch schema cache (decode_payload docstring)
    pk_cache: dict[str, tuple] = {}  # pk_uk_info json text → parsed (pk, uk)
    n = len(raw_values)
    none_col = [None] * n
    parts = meta.get("partition", none_col)
    offs = meta.get("offset", none_col)
    topics = meta.get("topic", none_col)
    ktss = meta.get("timestamp", none_col)
    kts_types = meta.get("timestampType", none_col)
    headers = meta.get("headers", none_col)
    for i, raw in enumerate(raw_values):
        # All parsing happens before any column append, so a 'skip' on a
        # poison pill can never leave the column lists misaligned.
        try:
            h = decode_header(raw)
            op_name = h.operation.name
            # Phase-1 filters: never touch payload bytes for dropped records.
            if ops is not None and op_name not in ops:
                continue
            # object-name rendering: schema defaulting + SQLServer brackets
            # (LazyRecordDeserializer.java:292-306,346-365)
            r_db, r_schema, r_tbl = render_object_names(
                h.source_type, h.db, h.schema, h.tbl
            )
            if tables is not None:
                # logical name overrides via tags (LazyRecordDeserializer.java:319-322)
                db = h.tags.get("l_db_name", r_db)
                tbl = h.tags.get("l_tb_name", r_tbl)
                if f"{db}.{tbl}" not in tables:
                    continue
            if images:
                fields, before, after = decode_payload(raw, h, fielddef_cache)
                names = [f.name for f in fields]
                # column pruning into the decoder (SURVEY.md §4): fields
                # outside the declared projection skip rendering entirely
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
            else:
                # header-only consumer: the payload bytes are never parsed —
                # the lazy contract's fast path (~10× per SCALING.md)
                before_map = after_map = None
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
        out["db"].append(r_db)
        out["schema_name"].append(r_schema)
        out["tbl"].append(r_tbl)
        out["before"].append(before_map)
        out["after"].append(after_map)
        out["pk_cols"].append(pk_cols)
        out["uk_info"].append(uk_info)
        out["tags"].append(h.tags or None)
        out["source_position"].append(h.source_position)
        out["checkpoint"].append(h.checkpoint())
        out["trans_seq"].append(h.trans_seq)
        out["record_size"].append(len(raw))  # DtsRecord.size() (DtsRecord.java:62-65)
        out["kafka_partition"].append(_opt_int(parts[i]))
        out["kafka_offset"].append(_opt_int(offs[i]))
        topic = topics[i]
        out["kafka_topic"].append(None if topic is None or (isinstance(topic, float) and pd.isna(topic)) else str(topic))
        kts = ktss[i]
        if kts is None or pd.isna(kts):
            kts = None
        else:
            if isinstance(kts, pd.Timestamp):
                # plain datetime — the Python DataSource row path can't
                # convert pandas Timestamps for TimestampType columns
                kts = kts.to_pydatetime()
            if kts.tzinfo is not None:
                # naive UTC: pyarrow hands tz-aware datetimes for
                # adjusted-to-UTC parquet, Arrow batches hand naive ones
                kts = kts.astimezone(dt.timezone.utc).replace(tzinfo=None)
        out["kafka_timestamp"].append(kts)
        ktt = _opt_int(kts_types[i])
        out["kafka_timestamp_type"].append(
            None if ktt is None else KAFKA_TIMESTAMP_TYPES.get(ktt, str(ktt))
        )
        out["kafka_headers"].append(_headers_to_map(headers[i]))
    return out


def decode_cdc(
    raw_df: DataFrame,
    tables: Sequence[str] | None = None,
    ops: Sequence[str | OperationType] | None = None,
    columns: Sequence[str] | None = None,
    on_error: str = "fail",
    images: bool = True,
) -> DataFrame:
    """Decode a binary CDC stream/batch into the generic envelope.

    ``raw_df`` needs a ``value: binary`` column; ``partition``/``offset``/
    ``topic``/``timestamp``/``timestampType``/``headers`` columns are carried
    through as kafka metadata when present. ``tables`` filters on qualified
    names (``db.tbl``; for SQLServer sources the rendered
    ``[db].[schema].[tbl]`` form), ``ops`` on operation names — both applied
    header-only, before payload decode. ``columns`` prunes image rendering to
    the named fields (the declared-schema fast path). ``on_error``: 'fail'
    (default — a corrupt record kills the job loudly) or 'skip' (poison-pill
    tolerance: drop undecodable records, the production CDC posture when a
    topic may carry foreign garbage). ``images=False`` is the header-only
    fast path: payload bytes are never parsed, ``before``/``after`` come
    back null — use for provenance/metadata consumers (~10× cheaper).
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
    present = [c for c in _META_COLS if c in raw_df.columns]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # positional lists, not Series: _decode_batch indexes by position
            meta = {c: pdf[c].to_list() for c in present}
            out = _decode_batch(
                pdf["value"], meta, table_set, op_set, col_set,
                skip_errors=(on_error == "skip"), images=images,
            )
            if not out["id"]:
                # fully-filtered batch: yield nothing — an empty pandas frame
                # would carry float64 dtypes Arrow can't cast to timestamp
                continue
            yield pd.DataFrame(out, columns=_ENVELOPE_COLS)

    return raw_df.mapInPandas(fn, schema=ENVELOPE_SCHEMA)


def decode_cdc_prefiltered(
    raw_df: DataFrame,
    tables: Sequence[str] | None = None,
    ops: Sequence[str | OperationType] | None = None,
    **kwargs,
) -> DataFrame:
    """`decode_cdc` with a JVM header pre-filter in front: op/table
    filtering runs as pure column expressions (`formats/jvmheader.py`), so
    records dropped by the filters never cross the Arrow boundary into a
    Python worker at all — the 100 TB multi-tenant-topic ingest path, where
    one table's consumer shouldn't pay Python time for the other 99%.

    The Python layer re-applies the exact filters on the (few) survivors,
    so semantics — including logical `l_db_name`/`l_tb_name` renames the
    JVM pass only approximates — are identical to `decode_cdc`.
    """
    from flink_dts_connector_spark.formats.jvmheader import prefilter

    pre = prefilter(
        raw_df,
        tables=list(tables) if tables is not None else None,
        ops=list(ops) if ops is not None else None,
        drop_invalid=(kwargs.get("on_error") == "skip"),
    )
    return decode_cdc(pre, tables=tables, ops=ops, **kwargs)
