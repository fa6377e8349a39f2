"""CDC pipeline queries — end-to-end oracle coverage for the reference's own
surface: wire decode → typed projection → changelog semantics.

The deterministic generator (`sources/generator.py`) derives a change
history from the driver's `orders` table, so every stage of the CDC pipeline
has a pure-SQL DuckDB oracle over `orders`. This is the strongest check we
can run without the proprietary DTS endpoint the reference's own tests
require (their tests need live credentials — SURVEY.md §5).

Shared arithmetic: prices travel as exact cent integers
(cents = round(price*100)); the price-bump update is cents + cents//10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_dts_connector_spark.formats.decoder import decode_cdc
from flink_dts_connector_spark.formats.typed import project_table
from flink_dts_connector_spark.operators.changelog import (
    materialize_scd2,
    materialize_upsert,
    sign_col,
)
from flink_dts_connector_spark.plans.registry import register
from flink_dts_connector_spark.sources.generator import DB, TBL, generate_cdc_bytes

ORDERS_CDC_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

# DuckDB fragments for the generator's exact-cents arithmetic.
SQL_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
SQL_CENTS1 = f"(CASE WHEN o_orderkey % 10 = 0 THEN {SQL_CENTS} + {SQL_CENTS} // 10 ELSE {SQL_CENTS} END)"
SQL_PRICE0 = f"({SQL_CENTS} / 100.0)"
SQL_PRICE1 = f"({SQL_CENTS1} / 100.0)"
SQL_PRIO1 = "(CASE WHEN o_orderkey % 7 = 0 THEN '9-RUSH' ELSE o_orderpriority END)"


def _typed_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = generate_cdc_bytes(spark, sf_dir)
    # columns= : render only the declared schema's fields (decode pruning)
    env = decode_cdc(
        raw,
        tables=[f"{DB}.{TBL}"],
        ops=["INSERT", "UPDATE", "DELETE"],
        columns=[f.name for f in ORDERS_CDC_SCHEMA.fields],
    )
    return project_table(env, ORDERS_CDC_SCHEMA, table=f"{DB}.{TBL}")


@register(
    "cdc_envelope_op_counts",
    oracle=f"""
WITH expected AS (
  SELECT 'INSERT' AS operation, COUNT(*) AS n, CAST(SUM(o_orderkey * 4) AS BIGINT) AS id_sum FROM orders
  UNION ALL
  SELECT 'UPDATE', COUNT(*) FILTER (WHERE o_orderkey % 10 = 0) + COUNT(*) FILTER (WHERE o_orderkey % 7 = 0),
         CAST(COALESCE(SUM(CASE WHEN o_orderkey % 10 = 0 THEN o_orderkey * 4 + 1 END), 0)
            + COALESCE(SUM(CASE WHEN o_orderkey % 7 = 0 THEN o_orderkey * 4 + 2 END), 0) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'DELETE', COUNT(*) FILTER (WHERE o_orderkey % 97 = 0),
         CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN o_orderkey * 4 + 3 END) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'HEARTBEAT', COUNT(*) FILTER (WHERE o_orderkey % 50 = 0),
         CAST(SUM(CASE WHEN o_orderkey % 50 = 0 THEN 10000000000 + o_orderkey END) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'DDL', COUNT(*) FILTER (WHERE o_orderkey % 200 = 0),
         CAST(SUM(CASE WHEN o_orderkey % 200 = 0 THEN 20000000000 + o_orderkey END) AS BIGINT) FROM orders
)
SELECT * FROM expected WHERE n > 0
""",
    tags=("cdc", "decode"),
)
def cdc_envelope_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full wire round-trip at the generic-envelope layer: encode every
    change event, decode with NO filters, count per operation + checksum the
    record ids (catches any dropped/duplicated/mis-decoded record)."""
    raw = generate_cdc_bytes(spark, sf_dir)
    env = decode_cdc(raw)
    return env.groupBy("operation").agg(
        F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum")
    )


@register(
    "cdc_typed_changelog",
    oracle=f"""
SELECT o_orderdate AS ts, o_orderkey * 4 AS record_id,
       o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0} AS o_totalprice, o_orderdate, o_orderpriority, 'I' AS op
FROM orders
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UA'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, '9-RUSH', 'UA'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 3 HOUR, o_orderkey * 4 + 3, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, {SQL_PRIO1}, 'D'
FROM orders WHERE o_orderkey % 97 = 0
""",
    tags=("cdc", "typed", "changelog"),
)
def cdc_typed_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dts-cdc` format parity: table+op filter (header-only), before/after
    images projected into the declared row type, UPDATE doubled into UB/UA
    — compared row-for-row against the SQL reconstruction."""
    return _typed_changelog(spark, sf_dir)


@register(
    "cdc_routed_ingest",
    oracle=f"""
SELECT o_orderdate AS ts, o_orderkey * 4 AS record_id,
       o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0} AS o_totalprice, o_orderdate, o_orderpriority, 'I' AS op
FROM orders
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UA'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, '9-RUSH', 'UA'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 3 HOUR, o_orderkey * 4 + 3, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, {SQL_PRIO1}, 'D'
FROM orders WHERE o_orderkey % 97 = 0
""",
    tags=("cdc", "typed", "changelog", "router"),
)
def cdc_routed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10: the typed changelog THROUGH the programmatic path chooser
    (`formats/router.py` — the code form of SCALING.md's decision table,
    priced from INGEST_TRADEOFF_r09.json). This session has Python workers
    and an 8-read reuse profile, so the chooser must price the decode-once
    store cheapest (build + 8 serves beats 8 fused passes from N=7 on the
    pinned numbers) — asserted here so a silent re-pricing can't flip the
    route unnoticed. The oracle is PATH-INDEPENDENT (the same SQL
    reconstruction as `cdc_typed_changelog`), proving routing changes the
    cost shape and nothing else; tests/test_ingest_router.py collects all
    routes and asserts identical multisets."""
    from flink_dts_connector_spark.formats.router import (
        choose_ingest_path,
        read_changelog_routed,
    )
    from flink_dts_connector_spark.sources.generator import ORDERS_FIELDS

    decision = choose_ingest_path(
        declared_schema=True, python_workers=True, expected_reads=8
    )
    assert decision.path == "store" and decision.build_via == "python_fused", decision
    return read_changelog_routed(
        spark, sf_dir, ORDERS_CDC_SCHEMA, ORDERS_FIELDS, f"{DB}.{TBL}", decision
    )


@register(
    "cdc_upsert_current_state",
    oracle=f"""
SELECT o_orderkey, {SQL_PRICE1} AS o_totalprice, {SQL_PRIO1} AS o_orderpriority
FROM orders
WHERE o_orderkey % 97 <> 0
""",
    tags=("cdc", "changelog", "upsert"),
)
def cdc_upsert_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → current state (upsert materialization): latest image per
    pk, deletes dropped — batch equivalent of foreachBatch-MERGE."""
    chg = _typed_changelog(spark, sf_dir)
    return materialize_upsert(chg, ["o_orderkey"], order_cols=["ts", "record_id"]).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


@register(
    "cdc_signed_agg_revenue",
    oracle=f"""
SELECT o_orderpriority_final AS o_orderpriority,
       CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_open_price,
       COUNT(*) AS n_orders
FROM (
  SELECT {SQL_PRIO1} AS o_orderpriority_final, {SQL_PRICE1} AS price
  FROM orders WHERE o_orderkey % 97 <> 0
)
GROUP BY o_orderpriority_final
""",
    tags=("cdc", "changelog", "signed-agg", "dec2"),
)
def cdc_signed_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-correct aggregation straight over the changelog (no
    materialization): measures weighted +1/−1 reproduce the current-state
    aggregate — the Spark answer to Flink's retract-stream aggregation."""
    chg = _typed_changelog(spark, sf_dir)
    s = sign_col("op")
    return (
        chg.groupBy("o_orderpriority")
        .agg(
            # dec2: 6.5e10 at sf1 breaches the scale-6 bound
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * s)
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_open_price"),
            F.sum(s).alias("n_orders"),
        )
        .where(F.col("n_orders") > 0)
    )


@register(
    "cdc_kafka_metadata",
    oracle=f"""
WITH ids AS (
  SELECT o_orderkey * 4 AS id FROM orders
  UNION ALL SELECT o_orderkey * 4 + 1 FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL SELECT o_orderkey * 4 + 2 FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL SELECT o_orderkey * 4 + 3 FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL SELECT 10000000000 + o_orderkey FROM orders WHERE o_orderkey % 50 = 0
  UNION ALL SELECT 20000000000 + o_orderkey FROM orders WHERE o_orderkey % 200 = 0
)
SELECT CAST(id % 4 AS INT) AS kafka_partition, 'cdc-orders' AS kafka_topic,
       'CreateTime' AS kafka_timestamp_type,
       COUNT(*) AS n, MAX(id) AS max_offset,
       TRUE AS headers_ok, TRUE AS kafka_ts_is_commit_ts
FROM ids GROUP BY 1
""",
    tags=("cdc", "metadata"),
)
def cdc_kafka_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six Kafka metadata columns surfaced through the decode (topic/
    partition/offset/timestamp/timestamp-type/headers — parity with the
    reference's readable-metadata pushdown, `table/DtsDynamicSource.java:
    268-345`): per-partition counts + high-water offsets, plus invariants
    pinning the passthrough — every record's `record_id` header equals its
    envelope id, and the Kafka timestamp equals the commit ts (the generator
    stamps CreateTime = commit time)."""
    raw = generate_cdc_bytes(spark, sf_dir, kafka_meta=True)
    env = decode_cdc(raw, images=False)  # metadata consumer: header-only
    return env.groupBy("kafka_partition", "kafka_topic", "kafka_timestamp_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("kafka_offset").alias("max_offset"),
        F.bool_and(
            F.element_at("kafka_headers", "record_id").cast("string") == F.col("id").cast("string")
        ).alias("headers_ok"),
        F.bool_and(F.col("kafka_timestamp") == F.col("ts")).alias("kafka_ts_is_commit_ts"),
    )


@register(
    "cdc_record_checkpoints",
    oracle="""
WITH recs AS (
  SELECT o_orderkey * 4 AS id, o_orderdate AS ts, 0 AS seq FROM orders
  UNION ALL SELECT o_orderkey * 4 + 1, o_orderdate + INTERVAL 1 HOUR, 1 FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL SELECT o_orderkey * 4 + 2, o_orderdate + INTERVAL 2 HOUR, 2 FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL SELECT o_orderkey * 4 + 3, o_orderdate + INTERVAL 3 HOUR, 3 FROM orders WHERE o_orderkey % 97 = 0
)
SELECT id,
       'mysql-bin.000001:' || id AS source_position,
       '0@' || id || '@mysql-bin.000001:' || id || '@' || CAST(CAST(epoch(ts) AS BIGINT) * 1000 AS VARCHAR) AS checkpoint,
       CAST(seq AS BIGINT) AS trans_seq,
       TRUE AS size_positive
FROM recs
""",
    tags=("cdc", "metadata", "checkpoint"),
)
def cdc_record_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-level provenance parity (`LazyParseRecordImpl.java:199-209`,
    `DtsRecord.java:62-65,84-90`): every data record's checkpoint string
    `0@idLow31@sourcePosition@tsMillis`, source position, transaction
    sequence, and a positive wire size — reconstructed exactly in SQL."""
    raw = generate_cdc_bytes(spark, sf_dir)
    env = decode_cdc(raw, ops=["INSERT", "UPDATE", "DELETE"], images=False)
    return env.select(
        "id",
        "source_position",
        "checkpoint",
        "trans_seq",
        (F.col("record_size") > 0).alias("size_positive"),
    )


@register(
    "cdc_scd2_history",
    oracle=f"""
WITH versions AS (
  SELECT o_orderkey, {SQL_PRICE0} AS o_totalprice, o_orderpriority, o_orderdate AS valid_from,
         CASE WHEN o_orderkey % 10 = 0 THEN o_orderdate + INTERVAL 1 HOUR
              WHEN o_orderkey % 7 = 0 THEN o_orderdate + INTERVAL 2 HOUR
              WHEN o_orderkey % 97 = 0 THEN o_orderdate + INTERVAL 3 HOUR END AS valid_to
  FROM orders
  UNION ALL
  SELECT o_orderkey, {SQL_PRICE1}, o_orderpriority, o_orderdate + INTERVAL 1 HOUR,
         CASE WHEN o_orderkey % 7 = 0 THEN o_orderdate + INTERVAL 2 HOUR
              WHEN o_orderkey % 97 = 0 THEN o_orderdate + INTERVAL 3 HOUR END
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, {SQL_PRICE1}, '9-RUSH', o_orderdate + INTERVAL 2 HOUR,
         CASE WHEN o_orderkey % 97 = 0 THEN o_orderdate + INTERVAL 3 HOUR END
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT o_orderkey, o_totalprice, o_orderpriority, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM versions
""",
    tags=("cdc", "changelog", "scd2"),
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → type-2 history (SCD2): every version of every order with
    its validity interval; deletes close the last version. The warehouse-
    side consumer of a CDC feed, reconstructed closed-form in SQL from the
    generator's arithmetic."""
    chg = _typed_changelog(spark, sf_dir)
    hist = materialize_scd2(chg, ["o_orderkey"], order_cols=["ts", "record_id"])
    return hist.select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "valid_from", "valid_to", "is_current"
    )


@register(
    "cdc_typed_with_metadata",
    oracle=f"""
WITH recs AS (
  SELECT o_orderkey, 'I' AS op, o_orderkey * 4 AS rid, o_orderdate AS kts FROM orders
  UNION ALL SELECT o_orderkey, 'UB', o_orderkey * 4 + 1, o_orderdate + INTERVAL 1 HOUR FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL SELECT o_orderkey, 'UA', o_orderkey * 4 + 1, o_orderdate + INTERVAL 1 HOUR FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL SELECT o_orderkey, 'UB', o_orderkey * 4 + 2, o_orderdate + INTERVAL 2 HOUR FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL SELECT o_orderkey, 'UA', o_orderkey * 4 + 2, o_orderdate + INTERVAL 2 HOUR FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL SELECT o_orderkey, 'D', o_orderkey * 4 + 3, o_orderdate + INTERVAL 3 HOUR FROM orders WHERE o_orderkey % 97 = 0
)
SELECT o_orderkey, op, 'cdc-orders' AS topic, CAST(rid % 4 AS INT) AS "partition",
       rid AS "offset", kts AS "timestamp", 'CreateTime' AS timestamp_type
FROM recs
""",
    tags=("cdc", "typed", "metadata"),
)
def cdc_typed_with_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `col TYPE METADATA FROM '<key>'` CREATE TABLE surface
    (`DtsTableISelectTCaseTest.java:66-80` declares `ts TIMESTAMP(3)
    METADATA FROM 'timestamp'`): declared metadata keys ride each typed
    changelog row after the physical columns."""
    raw = generate_cdc_bytes(spark, sf_dir, kafka_meta=True)
    env = decode_cdc(
        raw,
        tables=[f"{DB}.{TBL}"],
        ops=["INSERT", "UPDATE", "DELETE"],
        columns=["o_orderkey"],
    )
    schema = T.StructType([T.StructField("o_orderkey", T.LongType())])
    typed = project_table(
        env,
        schema,
        table=f"{DB}.{TBL}",
        include_metadata=False,
        metadata=["topic", "partition", "offset", "timestamp", "timestamp-type"],
    )
    return typed


@register(
    "cdc_ddl_stream",
    oracle="""
SELECT 20000000000 + o_orderkey AS id, 'dts_demo' AS db, 'orders' AS tbl,
       'ALTER TABLE orders ADD COLUMN note_' || o_orderkey || ' VARCHAR(32)' AS statement
FROM orders WHERE o_orderkey % 200 = 0
""",
    tags=("cdc", "ddl"),
)
def cdc_ddl_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL routing: schema-change events (OperationType.DDL,
    `record/OperationType.java:4-27`) interleave with data on the same
    wire; a schema-registry consumer filters op=DDL header-only and reads
    the statement text from the after image."""
    raw = generate_cdc_bytes(spark, sf_dir)
    env = decode_cdc(raw, ops=["DDL"])
    return env.select(
        "id", "db", "tbl", F.element_at("after", "ddl_statement").alias("statement")
    )


from flink_dts_connector_spark.sources.zoo import (
    expected_render_sql as _zoo_render_oracle,
    expected_sqlserver_sql as _sqlserver_oracle,
)


@register(
    "cdc_sqlserver_three_part",
    oracle=_sqlserver_oracle(),
    tags=("cdc", "routing", "sqlserver"),
)
def cdc_sqlserver_three_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLServer 3-part table identity through the envelope: db renders
    `[erp]`, table `[dbo].[accounts]` (`LazyRecordDeserializer.java:292-298`),
    `schema_name` carries the triple's middle, and each record's checkpoint/
    trans_seq survive the distributed decode — against a literal oracle."""
    from flink_dts_connector_spark.sources.zoo import generate_sqlserver_bytes

    env = decode_cdc(generate_sqlserver_bytes(spark))
    return env.groupBy("id", "db", "schema_name", "tbl", "checkpoint", "trans_seq").agg(
        F.count(F.lit(1)).alias("n_copies")
    )


@register(
    "cdc_sqlserver_typed",
    oracle="""
SELECT CAST(i AS BIGINT) AS acct_id, CAST(100 + i AS DOUBLE) AS balance,
       'I' AS op, CAST(16 AS BIGINT) AS n_copies
FROM range(8) AS t(i)
""",
    tags=("cdc", "routing", "sqlserver", "typed"),
)
def cdc_sqlserver_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-part qualified name through `project_table`'s filter: the declared
    table is addressed as `[erp].[dbo].[accounts]` exactly like the
    reference's `'dts-cdc.table.name'` option on a SQLServer source."""
    from flink_dts_connector_spark.sources.zoo import generate_sqlserver_bytes

    schema = T.StructType(
        [T.StructField("acct_id", T.LongType()), T.StructField("balance", T.DoubleType())]
    )
    env = decode_cdc(generate_sqlserver_bytes(spark))
    typed = project_table(env, schema, table="[erp].[dbo].[accounts]", include_metadata=False)
    return typed.groupBy("acct_id", "balance", "op").agg(F.count(F.lit(1)).alias("n_copies"))


from flink_dts_connector_spark.sources.zoo import expected_render_sql as _zoo_oracle


@register(
    "cdc_value_zoo_render",
    oracle=_zoo_oracle(),
    tags=("cdc", "values", "decode"),
)
def cdc_value_zoo_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every branch of the 13-kind value union through the full distributed
    pipeline (FIXTURES.md F4): explode the decoded after-image and compare
    each field's rendered string against the literal expected table. The
    64 copies ride different partitions, so rendering must be location-
    independent."""
    from flink_dts_connector_spark.sources.zoo import generate_zoo_bytes

    env = decode_cdc(generate_zoo_bytes(spark))
    exploded = env.select(F.explode_outer("after").alias("field", "rendered"))
    return (
        exploded.groupBy("field", "rendered")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


@register(
    "cdc_multi_table_routing",
    oracle=f"""
SELECT 'dts_demo' AS db, 'orders' AS tbl,
       (SELECT COUNT(*) + COUNT(*) FILTER (WHERE o_orderkey % 10 = 0)
             + COUNT(*) FILTER (WHERE o_orderkey % 7 = 0)
             + COUNT(*) FILTER (WHERE o_orderkey % 97 = 0) FROM orders) AS n
UNION ALL
SELECT 'zoo_db', 'values_zoo', 64
""",
    tags=("cdc", "routing"),
)
def cdc_multi_table_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table CDC stream: orders-CDC and the value-zoo interleave on
    the same wire; the decoder routes by (db, tbl) — the reference's
    one-table-per-SQL-source model generalized to the whole-subscription
    stream its DataStream API exposes (`DtsExample.java:21-50`)."""
    from flink_dts_connector_spark.sources.zoo import generate_zoo_bytes

    mixed = generate_cdc_bytes(spark, sf_dir).unionByName(
        generate_zoo_bytes(spark), allowMissingColumns=True
    )
    env = decode_cdc(mixed, ops=["INSERT", "UPDATE", "DELETE"])
    return env.groupBy("db", "tbl").agg(F.count(F.lit(1)).alias("n"))


from flink_dts_connector_spark.sources.zoo import expected_txn_sql as _txn_oracle


@register(
    "cdc_txn_boundaries",
    oracle=_txn_oracle(),
    tags=("cdc", "transaction", "changelog"),
)
def cdc_txn_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactionally-consistent changelog grouping: the interleaved
    multi-statement fixture (statements of different transactions alternate
    in stream order, spanning multiple tables) regrouped into atomic
    BEGIN..COMMIT batches by transaction_id, statements ordered by
    trans_seq (`DtsRecord.java:15,84-90`) — per-txn manifest with row
    count, tables touched, op sequence, begin/commit ts, and a
    contiguity proof (seq == 0..n-1, no torn transaction)."""
    from flink_dts_connector_spark.operators.changelog import txn_manifest
    from flink_dts_connector_spark.sources.zoo import generate_txn_bytes

    env = decode_cdc(generate_txn_bytes(spark))
    return txn_manifest(env)


from flink_dts_connector_spark.sources.zoo import expected_txn_apply_sql as _txn_apply_oracle


@register(
    "cdc_txn_atomic_apply",
    oracle=_txn_apply_oracle(),
    tags=("cdc", "transaction", "changelog", "sink"),
)
def cdc_txn_atomic_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-or-none transaction apply: the fixture stream carries one TORN
    transaction (its middle statement never arrived); the atomic-apply
    filter keeps only complete transactions (manifest contiguity proof),
    so the torn txn's OTHER statements are skipped too — no table ever
    sees half a transaction. Per-table row/txn counts + record-id
    checksum prove exactly the complete txns landed."""
    from flink_dts_connector_spark.operators.changelog import apply_complete_txns
    from flink_dts_connector_spark.sources.zoo import generate_txn_bytes

    env = decode_cdc(generate_txn_bytes(spark, include_torn=True))
    applied = apply_complete_txns(env)
    return applied.groupBy("tbl").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("transaction_id").alias("n_txns"),
        F.sum("id").alias("id_sum"),
    )


from flink_dts_connector_spark.sources.zoo import expected_evolve_sql as _evolve_oracle


@register(
    "cdc_schema_evolution",
    oracle=_evolve_oracle(),
    tags=("cdc", "schema-evolution", "typed"),
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream schema widening: the `app.users` stream starts with a
    2-column schema (uid, name) and gains `email` upstream — the wire's
    per-record self-describing schema (the reference re-reads
    `LazyRecordSchema` per record) means a consumer with a declared
    3-column table sees NULL email for pre-ALTER rows and values after,
    with no restart and no decode failure. Exercises the decoder's
    field-def cache with multiple live layouts in one batch."""
    from flink_dts_connector_spark.sources.zoo import generate_evolving_bytes

    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
        ]
    )
    env = decode_cdc(generate_evolving_bytes(spark))
    typed = project_table(env, schema, table="app.users", include_metadata=False)
    return typed.groupBy("uid", "name", "email").agg(F.count(F.lit(1)).alias("n_copies"))


@register(
    "cdc_scd2_asof",
    oracle=f"""
WITH versions AS (
  SELECT o_orderkey, {SQL_PRICE0} AS o_totalprice, o_orderpriority, o_orderdate AS valid_from,
         CASE WHEN o_orderkey % 10 = 0 THEN o_orderdate + INTERVAL 1 HOUR
              WHEN o_orderkey % 7 = 0 THEN o_orderdate + INTERVAL 2 HOUR
              WHEN o_orderkey % 97 = 0 THEN o_orderdate + INTERVAL 3 HOUR END AS valid_to
  FROM orders
  UNION ALL
  SELECT o_orderkey, {SQL_PRICE1}, o_orderpriority, o_orderdate + INTERVAL 1 HOUR,
         CASE WHEN o_orderkey % 7 = 0 THEN o_orderdate + INTERVAL 2 HOUR
              WHEN o_orderkey % 97 = 0 THEN o_orderdate + INTERVAL 3 HOUR END
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, {SQL_PRICE1}, '9-RUSH', o_orderdate + INTERVAL 2 HOUR,
         CASE WHEN o_orderkey % 97 = 0 THEN o_orderdate + INTERVAL 3 HOUR END
  FROM orders WHERE o_orderkey % 7 = 0
), cut AS (
  SELECT MAX(valid_from) - INTERVAL 7 DAY AS t FROM versions
)
SELECT o_orderkey, o_totalprice, o_orderpriority, valid_from
FROM versions, cut
WHERE valid_from <= cut.t AND (valid_to IS NULL OR valid_to > cut.t)
""",
    tags=("cdc", "changelog", "scd2", "timetravel"),
)
def cdc_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) lookup over the SCD2 history: the table's
    exact state at T = max(valid_from) − 7 days, i.e. the version whose
    validity interval covers T — the time-travel read a warehouse runs
    against a CDC-maintained history (reproduce a report, debug a model
    trained on last week's state). One broadcast scalar + an interval
    filter; at scale the history is partitioned by valid_from date so the
    filter prunes partitions."""
    chg = _typed_changelog(spark, sf_dir)
    hist = materialize_scd2(chg, ["o_orderkey"], order_cols=["ts", "record_id"])
    cut = hist.agg(
        (F.max("valid_from") - F.expr("INTERVAL 7 DAYS")).alias("t")
    )
    return (
        hist.crossJoin(F.broadcast(cut))
        .where(
            (F.col("valid_from") <= F.col("t"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("t")))
        )
        .select("o_orderkey", "o_totalprice", "o_orderpriority", "valid_from")
    )


@register(
    "cdc_poison_rate",
    oracle="""
WITH recs AS (
  SELECT o_orderkey * 4 AS rid, 'INSERT' AS op FROM orders
  UNION ALL SELECT o_orderkey * 4 + 1, 'UPDATE' FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL SELECT o_orderkey * 4 + 2, 'UPDATE' FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL SELECT o_orderkey * 4 + 3, 'DELETE' FROM orders WHERE o_orderkey % 97 = 0
)
SELECT op AS operation,
       CAST(COUNT(*) FILTER (WHERE rid % 53 <> 0) AS BIGINT) AS n_decoded,
       CAST(COUNT(*) FILTER (WHERE rid % 53 = 0) AS BIGINT) AS n_poisoned
FROM recs GROUP BY op
""",
    tags=("cdc", "decode", "poison"),
)
def cdc_poison_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poison-pill tolerance as a measured contract: every record whose id
    is divisible by 53 is TRUNCATED on the wire (torn mid-payload);
    `decode_cdc(on_error='skip')` must drop exactly those and decode
    everything else — the per-op decoded/poisoned census against the
    generator's closed form. The production CDC posture (a topic carrying
    foreign garbage must not kill the subscriber) with the loss made
    visible and countable. Survivor counts come from the decoder; the
    poisoned column is total-minus-decoded per op (rid arithmetic)."""
    raw = generate_cdc_bytes(spark, sf_dir)
    # tear records mid-payload: keep the first 6 bytes (enough to look like
    # a record, not enough to decode)
    torn = raw.withColumn(
        "value",
        F.when(
            F.col("offset") % 53 == 0, F.expr("substring(value, 1, 6)")
        ).otherwise(F.col("value")),
    )
    env = decode_cdc(
        torn,
        tables=[f"{DB}.{TBL}"],
        ops=["INSERT", "UPDATE", "DELETE"],
        on_error="skip",
        images=False,
    )
    decoded = env.groupBy("operation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_decoded")
    )
    # expected totals per op from the raw ids (no decode needed for the census)
    ids = raw.where(F.col("offset") < 10000000000).select(
        F.col("offset").alias("rid"),
        F.when(F.col("offset") % 4 == 0, "INSERT")
        .when(F.col("offset") % 4 == 3, "DELETE")
        .otherwise("UPDATE")
        .alias("operation"),
    )
    totals = ids.groupBy("operation").agg(
        F.sum((F.col("rid") % 53 == 0).cast("bigint")).cast("bigint").alias("n_poisoned")
    )
    return decoded.join(totals, "operation").select("operation", "n_decoded", "n_poisoned")


@register(
    "cdc_reconciliation",
    oracle=f"""
WITH src AS (
  SELECT o_orderkey, {SQL_CENTS1} AS cents, {SQL_PRIO1} AS o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(md5_number_lower(o_orderkey::VARCHAR || '|' || cents::VARCHAR || '|' || o_orderpriority)
                % 2147483648) AS BIGINT) AS row_checksum
FROM src GROUP BY o_orderpriority
""",
    tags=("cdc", "audit", "reconciliation"),
)
def cdc_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC drift reconciliation — the audit a changelog pipeline runs to
    prove the materialized replica still equals the source of truth:
    per-partition-key group, row count, an exact integer measure total
    (cents), and an order-insensitive ROW CHECKSUM (sum of a canonical-
    string md5 per row, mod 2^31 — commutative, so it needs no sort and
    partials merge map-side). The engine computes the report from its OWN
    decoded-changelog upsert state; the oracle computes it from the
    source's closed form — hash-matching IS the reconciliation: any
    dropped, duplicated, or corrupted row moves count, total, or checksum.
    Reference anchor: the subscription consumer's checkpoint/ACK loop
    (`DefaultRecordListener.java`) exists to make exactly this audit pass."""
    from flink_dts_connector_spark.operators.dedup import md5_number_lower_mod

    state = materialize_upsert(
        _typed_changelog(spark, sf_dir), ["o_orderkey"], order_cols=["ts", "record_id"]
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        cents.cast("string"),
        F.col("o_orderpriority"),
    )
    return state.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(cents).cast("bigint").alias("sum_cents"),
        F.sum(md5_number_lower_mod(canon, 1 << 31)).cast("bigint").alias("row_checksum"),
    )


@register(
    "cdc_incremental_checksum",
    oracle=f"""
WITH src AS (
  SELECT o_orderkey, {SQL_CENTS1} AS cents, {SQL_PRIO1} AS o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(md5_number_lower(o_orderkey::VARCHAR || '|' || cents::VARCHAR || '|' || o_orderpriority)
                % 2147483648) AS BIGINT) AS row_checksum
FROM src GROUP BY o_orderpriority
""",
    tags=("cdc", "audit", "reconciliation", "signed-agg"),
)
def cdc_incremental_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained reconciliation — `cdc_reconciliation`
    WITHOUT materializing the replica: because count, cents total, and the
    commutative md5 row-checksum are all ALGEBRAIC in the signed-changelog
    sense, one pass of +1/−1-weighted aggregation straight over the
    I/UB/UA/D stream yields the drift report of the final state (UB
    retracts a row's hash from its old group, UA adds it to the new — so
    even group-changing updates reconcile). This is the audit a streaming
    consumer can keep per micro-batch for free, where a naive checksum
    would re-scan the replica; the oracle is the source closed form, same
    as the materialized audit's."""
    from flink_dts_connector_spark.operators.dedup import md5_number_lower_mod

    chg = _typed_changelog(spark, sf_dir)
    s = sign_col("op")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        cents.cast("string"),
        F.col("o_orderpriority"),
    )
    return (
        chg.groupBy("o_orderpriority")
        .agg(
            F.sum(s).cast("bigint").alias("n_rows"),
            F.sum(s * cents).cast("bigint").alias("sum_cents"),
            F.sum(s * md5_number_lower_mod(canon, 1 << 31)).cast("bigint").alias("row_checksum"),
        )
        .where(F.col("n_rows") > 0)
    )


@register(
    "cdc_signed_count_sketch",
    oracle="""
WITH state AS (
  SELECT (CASE WHEN o_orderkey % 7 = 0 THEN '9-RUSH' ELSE o_orderpriority END) AS w
  FROM orders WHERE o_orderkey % 97 <> 0
), exact AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_n FROM state GROUP BY 1
), cells AS (
  SELECT j, CAST(md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || w) % 256 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM state CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
  GROUP BY 1, 2
), probes AS (
  SELECT e.w, e.exact_n, j,
         CAST(md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || e.w) % 256 AS BIGINT) AS b
  FROM exact e CROSS JOIN (SELECT unnest([0,1,2,3]) AS j)
)
SELECT p.w AS o_orderpriority,
       ANY_VALUE(p.exact_n) AS exact_n,
       CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS cms_estimate,
       CAST(MIN(COALESCE(c.c, 0)) - ANY_VALUE(p.exact_n) AS BIGINT) AS overestimate
FROM probes p LEFT JOIN cells c ON c.j = p.j AND c.b = p.b
GROUP BY p.w
""",
    tags=("cdc", "changelog", "sketch", "signed-agg"),
)
def cdc_signed_count_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turnstile count-min under CDC retractions: the sketch's cells are
    maintained directly from the I/UB/UA/D changelog with +1/−1 weights
    (one signed hash agg — the same shape as `cdc_signed_agg_revenue`),
    and linearity makes the maintained cells EQUAL a fresh sketch built
    over the current state — which is exactly what the oracle builds. The
    sketch-layer twin of signed aggregation: heavy-hitter state that stays
    O(depth×width) while absorbing updates AND deletes, no rebuild. Probes
    report every live priority's estimate beside its exact signed count
    (estimate ≥ exact, one-sided as always)."""
    from flink_dts_connector_spark.operators import sketch as SK

    chg = _typed_changelog(spark, sf_dir)
    # the Python wire decode is the expensive subtree and both the cells and
    # the exact counts consume it — materialize it once. r14: EAGERLY, via
    # localCheckpoint, not a lazy persist: the cells/exact/probe consumer
    # stages materialize concurrently under AQE, and concurrent first
    # readers of a lazy cache each re-run the full Python decode (the r14
    # job drill caught three overlapping 1.17 s jobs doing exactly that —
    # block-store locks don't serialize the compute, they only dedupe the
    # stored result). One eager job decodes once; consumers read the
    # checkpointed rows.
    signed = chg.select(
        F.col("o_orderpriority").alias("w"), sign_col("op").alias("s")
    ).localCheckpoint()
    cells = SK.cms_build(signed, item_col="w", depth=4, width=256, weight_col="s")
    exact = (
        signed.groupBy("w")
        .agg(F.sum("s").cast("bigint").alias("exact_n"))
        .where(F.col("exact_n") > 0)
    )
    est = SK.cms_estimate(cells, exact.select("w"), "w", depth=4, width=256)
    return exact.join(est, "w").select(
        F.col("w").alias("o_orderpriority"),
        "exact_n",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_n")).cast("bigint").alias("overestimate"),
    )


@register(
    "cdc_fixed_wire_roundtrip",
    oracle=f"""
SELECT prio AS o_orderpriority,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM (
  SELECT {SQL_CENTS1} AS cents, {SQL_PRIO1} AS prio
  FROM orders WHERE o_orderkey % 97 <> 0
)
GROUP BY 1
""",
    tags=("cdc", "wire", "jvm-decode", "signed-agg"),
)
def cdc_fixed_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-only wire path end-to-end: the orders changelog is derived
    relationally, ENCODED into the fixed 97-char layout and DECODED back —
    encode, header-first op read, field decode, and the signed aggregation
    all pure column expressions inside whole-stage codegen (zero Python —
    plan-guarded). This is the documented scale answer to the Python
    varint-decode ceiling (`SCALING.md`): a producer that can emit fixed
    layouts gets JVM scan-speed decode; the self-describing zoo keeps the
    Python path. The signed aggregate over the round-tripped changelog must
    equal the current-state aggregate the oracle computes from `orders`
    directly — proving the codec byte-exact through every op kind."""
    from flink_dts_connector_spark.formats.fixedwire import (
        decode_fixed,
        encode_orders_changelog,
        fixed_sign,
    )

    wire = encode_orders_changelog(spark, sf_dir)
    dec = decode_fixed(wire)
    s = fixed_sign("op")
    return (
        dec.groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("cents") * s).cast("bigint").alias("sum_cents"),
            F.sum(s).cast("bigint").alias("n_orders"),
        )
        .where(F.col("n_orders") > 0)
    )


@register(
    "cdc_idempotent_replay",
    oracle=f"""
SELECT o_orderkey, {SQL_PRICE1} AS o_totalprice, {SQL_PRIO1} AS o_orderpriority
FROM orders
WHERE o_orderkey % 97 <> 0
""",
    tags=("cdc", "changelog", "exactly-once", "upsert"),
)
def cdc_idempotent_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery made exactly-once by idempotent consumption:
    the entire changelog is delivered TWICE (a full redelivery — the
    worst-case Kafka at-least-once scenario after a failover re-seek by
    timestamp, `FlinkDtsKafkaConsumer.java:372-380`), deduplicated on the
    (monotonic record id, row kind) identity the wire format guarantees (`DtsRecord.java:13`),
    and upsert-materialized — the result must equal the single-delivery
    current state (same oracle as `cdc_upsert_current_state`). The id
    dedup is one hash agg keyed by record_id (map-side combine absorbs
    duplicates before the shuffle); at 100 TB it is the same
    dropDuplicates shape `stream_dedup_exactly_once` runs with watermarked
    state."""
    chg = _typed_changelog(spark, sf_dir)
    redelivered = chg.unionByName(chg)
    # UPDATE doubling gives UB and UA the same record id — the redelivery
    # identity is (record id, row kind)
    deduped = redelivered.dropDuplicates(["record_id", "op"])
    return materialize_upsert(
        deduped, ["o_orderkey"], order_cols=["ts", "record_id"]
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


# ---------------------------------------------------------------------------
# Decode-once columnar CDC store (formats/ingest.py): the wire is decoded
# ONCE per session into partitioned parquet; the queries below are the
# re-pointed twins of the cdc_* battery reading the STORE — their oracles
# are identical to the wire-path originals, so stored == re-decoded is
# proven at the result level too (on top of ingest_once's envelope-checksum
# audit and read_store's partition-pruning plan guard).
# ---------------------------------------------------------------------------


def _typed_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_dts_connector_spark.formats.ingest import read_store
    from flink_dts_connector_spark.sources.generator import TBL as _TBL

    env = read_store(spark, sf_dir, table=_TBL)
    return project_table(env, ORDERS_CDC_SCHEMA, table=f"{DB}.{TBL}")


@register(
    "cdc_ingest_once",
    oracle=f"""
SELECT o_orderdate AS ts, o_orderkey * 4 AS record_id,
       o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0} AS o_totalprice, o_orderdate, o_orderpriority, 'I' AS op
FROM orders
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UA'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, '9-RUSH', 'UA'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 3 HOUR, o_orderkey * 4 + 3, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, {SQL_PRIO1}, 'D'
FROM orders WHERE o_orderkey % 97 = 0
""",
    tags=("cdc", "decode-once", "storage", "typed", "changelog"),
)
def cdc_ingest_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-once columnar CDC store, end-to-end: stream-decode the wire
    ONCE (availableNow) into parquet partitioned by (tbl, ingest_date),
    audit stored == re-decoded with a full-envelope multiset checksum
    (`formats/ingest.py:ingest_once`), then serve the typed changelog from
    the STORE through a partition-pruned scan (plan-guarded) — row-exact
    against the same oracle as the wire-path `cdc_typed_changelog`. This is
    the 100 TB answer to the Python decode ceiling: decode cost amortizes
    to ingest bandwidth, downstream consumers are pure JVM parquet scans
    (the reference's lazy parse exists for the same reason — decode at most
    once, `LazyParseRecordImpl.java:53-84`)."""
    return _typed_from_store(spark, sf_dir)


@register(
    "cdc_store_upsert_state",
    oracle=f"""
SELECT o_orderkey, {SQL_PRICE1} AS o_totalprice, {SQL_PRIO1} AS o_orderpriority
FROM orders
WHERE o_orderkey % 97 <> 0
""",
    tags=("cdc", "decode-once", "storage", "upsert"),
)
def cdc_store_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert materialization re-pointed at the decode-once store: same
    semantics and oracle as `cdc_upsert_current_state`, but the changelog
    comes from the stored envelope (zero wire decode when the store is
    warm — the amortization the store exists for)."""
    chg = _typed_from_store(spark, sf_dir)
    return materialize_upsert(chg, ["o_orderkey"], order_cols=["ts", "record_id"]).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


@register(
    "cdc_store_signed_agg",
    oracle=f"""
SELECT o_orderpriority_final AS o_orderpriority,
       CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_open_price,
       COUNT(*) AS n_orders
FROM (
  SELECT {SQL_PRIO1} AS o_orderpriority_final, {SQL_PRICE1} AS price
  FROM orders WHERE o_orderkey % 97 <> 0
)
GROUP BY o_orderpriority_final
""",
    tags=("cdc", "decode-once", "storage", "signed-agg", "dec2"),
)
def cdc_store_signed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-correct signed aggregation re-pointed at the decode-once
    store — twin of `cdc_signed_agg_revenue` with the wire decode replaced
    by a pruned parquet scan of the stored envelope."""
    chg = _typed_from_store(spark, sf_dir)
    s = sign_col("op")
    return (
        chg.groupBy("o_orderpriority")
        .agg(
            # dec2: 6.5e10 at sf1 breaches the scale-6 bound
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * s)
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_open_price"),
            F.sum(s).alias("n_orders"),
        )
        .where(F.col("n_orders") > 0)
    )


@register(
    "cdc_store_zorder_probe",
    oracle=f"""
WITH chg AS (
  SELECT o_orderkey, o_custkey, {SQL_PRICE0} AS o_totalprice, 'I' AS op FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey, {SQL_PRICE0}, 'UB' FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, {SQL_PRICE1}, 'UA' FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, {SQL_PRICE1}, 'UB' FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, {SQL_PRICE1}, 'UA' FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, {SQL_PRICE1}, 'D' FROM orders WHERE o_orderkey % 97 = 0
),
bounds AS (
  SELECT min(o_custkey) + (max(o_custkey) - min(o_custkey)) * 45 // 100 AS lo,
         min(o_custkey) + (max(o_custkey) - min(o_custkey)) * 55 // 100 AS hi
  FROM orders
)
SELECT op, COUNT(*) AS n_records,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_price,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM chg, bounds
WHERE o_custkey BETWEEN lo AND hi
GROUP BY op
""",
    tags=("cdc", "decode-once", "storage", "layout", "zorder", "dec2"),
)
def cdc_store_zorder_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER SERVING LAYOUT of the decode-once store, probed for real:
    the orders changelog is re-clustered by the Morton interleave of
    (o_custkey, o_orderdate) — `formats/layout.py:serve_store_zorder`, the
    applied form of the `layout_zorder_*` studies — and a key-band probe
    (middle custkey decile, all time) runs against the serving files. The
    band bounds are collected as LITERALS on purpose: only literal
    predicates reach the parquet scan's PushedFilters, and the query
    asserts they do (`assert_pushed`) — at 100 TB that pushdown is what
    turns the Morton layout into row-group skipping (the key-band probe
    touches only the files whose (x, y) rectangle intersects the band; a
    time-sorted layout reads everything — measured fractions in
    `tests/test_layout_store.py` and SCALING.md §zorder-store). Result
    content is layout-invariant and oracle-checked: per-op record counts +
    exact-cents price sums over the band."""
    from flink_dts_connector_spark.formats.layout import (
        assert_pushed,
        custkey_band,
        serve_store_zorder,
    )

    lo, hi = custkey_band(spark, sf_dir)
    serving = serve_store_zorder(spark, sf_dir)
    probe = spark.read.parquet(serving).where(F.col("o_custkey").between(lo, hi))
    assert_pushed(probe, ["o_custkey"])
    return probe.groupBy("op").agg(
        F.count(F.lit(1)).alias("n_records"),
        # dec2: 3.8e10 at sf1 breaches the scale-6 bound
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_price"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


@register(
    "cdc_jvm_doc_changelog",
    oracle="""
WITH base AS (
  SELECT make_timestamp((1700000000 + doc_id) * 1000000) AS ts,
         doc_id AS record_id, doc_id, text, source, n_chars, 'I' AS op
  FROM documents
)
SELECT * FROM base
UNION ALL
SELECT * FROM base WHERE doc_id % 5 = 0
""",
    tags=("cdc", "jvm-decode", "typed", "documents"),
)
def cdc_jvm_doc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND declared schema through the JVM value decode — the documents
    ingestion stream (4 fields, long free-text VARCHARs with multi-byte
    length varints, a NOT NULL bigint) selected out of the MULTI-TENANT
    topic (orders changelog ∪ documents stream): `decode_typed_jvm`
    anchors on the documents field-def bytes, so every orders record is
    cut before any value work and the survivors decode typed with zero
    Python. Proves the r8 typed path is schema-general, not an
    orders-shaped special case; at-least-once duplicates (every 5th doc
    delivered twice) survive verbatim, exactly as the Python path emits
    them."""
    from flink_dts_connector_spark.formats.ingest import stage_mixed_topic
    from flink_dts_connector_spark.formats.jvmvalue import decode_typed_jvm
    from flink_dts_connector_spark.sources.generator import DOC_DB, DOC_FIELDS, DOC_TBL

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    raw = spark.read.parquet(stage_mixed_topic(spark, sf_dir))
    return decode_typed_jvm(
        raw, doc_schema, DOC_FIELDS, f"{DOC_DB}.{DOC_TBL}", ops=("INSERT",)
    )


from flink_dts_connector_spark.sources.zoo import expected_geom_sql as _geom_oracle


@register(
    "cdc_jvm_geom_changelog",
    oracle=_geom_oracle(),
    tags=("cdc", "jvm-decode", "typed", "geometry"),
)
def cdc_jvm_geom_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKB geometry through the JVM typed decode (r9 closure of the last
    typed-path value gap): six geometry cells per record — LE point,
    BE point, EWKB+SRID point, linestring, polygon, and a torn payload —
    decode to WKT / hex-fallback text as pure column expressions
    (`jvmvalue._geom_sql`: bounds-checked transform()/aggregate() folds,
    roundtrip-verified shortest ordinate digits). The oracle's expected
    strings are produced by the pure-Python reference reader
    (`wire.wkb_to_wkt`, reference parity `value/WKBGeometry.java:10-61`
    via JTS `common/GeometryUtil.java:14-22`), so hash-green means the
    distributed JVM render is bit-identical to the local reference
    implementation. DELETE records (every 5th shape) decode their BEFORE
    image — geometry rides the retraction path too."""
    from flink_dts_connector_spark.formats.jvmvalue import decode_typed_jvm
    from flink_dts_connector_spark.sources.zoo import (
        GEOM_DB,
        GEOM_FIELDS,
        GEOM_TBL,
        generate_geom_bytes,
    )

    geom_schema = T.StructType(
        [T.StructField("shape_id", T.LongType())]
        + [
            T.StructField(n, T.StringType())
            for n in ("pt", "pt_be", "pt_srid", "path", "ring", "torn")
        ]
    )
    typed = decode_typed_jvm(
        generate_geom_bytes(spark),
        geom_schema,
        GEOM_FIELDS,
        f"{GEOM_DB}.{GEOM_TBL}",
        include_metadata=False,
    )
    return typed.groupBy(*[f.name for f in geom_schema.fields], "op").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies")
    )


def _fixed_zoo_oracle() -> str:
    from flink_dts_connector_spark.formats.fixedwire import ZOO_FIXED_EXPECTED

    rows = ", ".join(
        "('{}', {}, 64)".format(
            name, "NULL" if exp is None else "'" + exp.replace("'", "''") + "'"
        )
        for name, exp in ZOO_FIXED_EXPECTED
    )
    return (
        "SELECT field, rendered, CAST(n_records AS BIGINT) AS n_records "
        f"FROM (VALUES {rows}) AS t(field, rendered, n_records)"
    )


@register(
    "cdc_fixed_wire_zoo",
    oracle=_fixed_zoo_oracle(),
    tags=("cdc", "wire", "jvm-decode", "values"),
)
def cdc_fixed_wire_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-slot value-zoo codec, JVM end-to-end: the scalar value kinds
    (INTEGER incl. beyond-int64, DECIMAL incl. NaN/±Infinity, FLOAT,
    TIMESTAMP, DATETIME full/partial/zero-date, CHARACTER incl. trailing
    spaces, NULL) encoded into kind-tagged fixed-width slots and decoded
    back with pure column expressions — the decode when-chain over the
    kind char is the reference's 13-branch jump table
    (`impl/LazyRecordDeserializer.java:152-260`) in whole-stage-codegen
    form (plan-guarded: zero Python eval). 64 record copies ride 8
    partitions, so rendering must be location-independent; the timestamp
    render is session-timezone-independent by construction (date
    arithmetic + lpad, never date_format over a TIMESTAMP). Measured cost
    is ~all whole-stage-codegen COMPILE of the 14-slot expression tree
    (13.9s cold / 3.6s warm for 64 rows; 1024x the rows adds only +1.3s)
    — a fixed cost that amortizes over data volume, which is the point of
    a codegen decode."""
    from flink_dts_connector_spark.formats.fixedwire import (
        decode_zoo_fixed,
        encode_zoo_fixed,
    )

    wire = encode_zoo_fixed(spark, n_copies=64)
    dec = decode_zoo_fixed(wire)
    return dec.groupBy("field", "rendered").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records")
    )


@register(
    "cdc_store_incremental_ingest",
    oracle=f"""
SELECT o_orderdate AS ts, o_orderkey * 4 AS record_id,
       o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0} AS o_totalprice, o_orderdate, o_orderpriority, 'I' AS op
FROM orders
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UA'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, '9-RUSH', 'UA'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 3 HOUR, o_orderkey * 4 + 3, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, {SQL_PRIO1}, 'D'
FROM orders WHERE o_orderkey % 97 = 0
""",
    tags=("cdc", "decode-once", "storage", "incremental", "exactly-once"),
)
def cdc_store_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-once store under MAINTENANCE: the wire arrives in two waves
    and the same checkpointed streaming ingest runs twice — the WAL makes
    the second run decode ONLY the delta (asserted: the delta run adds
    exactly the wave-1 record count, 0 < wave0 < total), and the grown
    store's typed changelog must hash-match the full-rebuild oracle (the
    same SQL as `cdc_typed_changelog`). Incremental store upkeep ==
    rebuild, the property that lets a 100 TB deployment never re-decode
    history."""
    from flink_dts_connector_spark.formats.ingest import ingest_incremental
    from flink_dts_connector_spark.sources.generator import TBL as _TBL

    store, n0, n_total, n_wave1 = ingest_incremental(spark, sf_dir)
    if not (0 < n0 < n_total):
        raise AssertionError(f"degenerate waves: {n0} / {n_total}")
    if n_total - n0 != n_wave1:
        raise AssertionError(
            f"delta run decoded {n_total - n0} rows, expected exactly the "
            f"wave-1 record count {n_wave1} (re-decode or loss)"
        )
    env = spark.read.parquet(store).where(F.col("tbl_part") == _TBL)
    return project_table(env, ORDERS_CDC_SCHEMA, table=f"{DB}.{TBL}")


@register(
    "cdc_store_compaction",
    oracle=f"""
SELECT o_orderkey, {SQL_PRICE1} AS o_totalprice, {SQL_PRIO1} AS o_orderpriority
FROM orders
WHERE o_orderkey % 97 <> 0
""",
    tags=("cdc", "decode-once", "storage", "maintenance"),
)
def cdc_store_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store compaction end-to-end: the two-wave incremental ingest leaves
    >1 file per partition directory; `compact_store` rewrites every
    directory to a single file (one shuffle on the partition keys) into a
    NEW serving directory — in-place overwrite is impossible for a
    streaming-file-sink store, whose `_spark_metadata` commit log governs
    readers (documented in `compact_store`). Asserted: file count
    strictly drops with <= one file per directory, the full-envelope
    multiset checksum is UNCHANGED (compaction moves bytes, never data),
    and the upsert state served from the compacted copy still hash-matches
    the current-state oracle. The maintenance job that keeps the
    decode-once store's listing cost tracking span / volume after months
    of appends."""
    import os

    from flink_dts_connector_spark.datamodel.envelope import ENVELOPE_SCHEMA
    from flink_dts_connector_spark.formats.ingest import (
        compact_store,
        envelope_checksum,
        ingest_incremental,
    )
    from flink_dts_connector_spark.sources.generator import TBL as _TBL

    store, n0, n_total, _ = ingest_incremental(spark, sf_dir)
    cols = [f.name for f in ENVELOPE_SCHEMA.fields]
    chk_before = envelope_checksum(spark.read.parquet(store).select(*cols))
    serving, stats = compact_store(spark, store)
    chk_after = envelope_checksum(spark.read.parquet(serving).select(*cols))
    if chk_after != chk_before:
        raise AssertionError(f"compaction changed data: {chk_before} -> {chk_after}")
    if not (stats["files_after"] < stats["files_before"]):
        raise AssertionError(f"compaction did not reduce files: {stats}")
    per_dir = {}
    for dirpath, _, files in os.walk(serving):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n:
            per_dir[dirpath] = n
    if any(n > 1 for n in per_dir.values()):
        raise AssertionError(f"directories still hold >1 file: {per_dir}")

    env = spark.read.parquet(serving).where(F.col("tbl_part") == _TBL)
    chg = project_table(env, ORDERS_CDC_SCHEMA, table=f"{DB}.{TBL}")
    return materialize_upsert(chg, ["o_orderkey"], order_cols=["ts", "record_id"]).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


@register(
    "cdc_store_checkpoint_replay",
    oracle=f"""
WITH ids AS (
  SELECT o_orderkey * 4 AS id FROM orders
  UNION ALL SELECT o_orderkey * 4 + 1 FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL SELECT o_orderkey * 4 + 2 FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL SELECT o_orderkey * 4 + 3 FROM orders WHERE o_orderkey % 97 = 0
), med AS (
  SELECT CAST((MIN(id) + MAX(id)) // 2 AS BIGINT) AS pos FROM ids
)
SELECT CAST((SELECT pos FROM med) AS BIGINT) AS resume_after_id,
       CAST(COUNT(*) AS BIGINT) AS n_replayed,
       CAST(SUM(id) AS BIGINT) AS id_sum,
       CAST(MIN(id) AS BIGINT) AS first_replayed_id
FROM ids WHERE id > (SELECT pos FROM med)
""",
    tags=("cdc", "decode-once", "storage", "checkpoint", "replay"),
)
def cdc_store_checkpoint_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume-from-checkpoint over the decode-once store: a consumer hands
    back its last record-level checkpoint string (the reference's
    `"0@idLow31@sourcePosition@tsMillis"` format,
    `impl/LazyParseRecordImpl.java:199-209`), the position is PARSED BACK
    from the stored checkpoint column (split on '@'), and replay is a
    plain store scan for ids beyond it — seek-by-position without
    touching a broker or re-decoding wire. Resume point = the median
    orders-table record id (deterministic); replayed count + id checksum
    + first replayed id are oracle-pinned. The store-side twin of the
    Kafka timestamp re-seek (`FlinkDtsKafkaConsumer.java:372-380`)."""
    from flink_dts_connector_spark.formats.ingest import read_store
    from flink_dts_connector_spark.sources.generator import TBL as _TBL

    # data changes only: DDL rows ride the same table name with 2e10-range
    # ids (their low-31-bit checkpoint ids would pollute the replay set)
    env = read_store(spark, sf_dir, table=_TBL).where(
        F.col("operation").isin("INSERT", "UPDATE", "DELETE")
    )
    # parse the id back out of the checkpoint string, like a consumer
    # handing its position back (data-change ids are < 2^31, so idLow31 == id)
    ck_id = F.split(F.col("checkpoint"), "@").getItem(1).cast("bigint")
    env = env.withColumn("_ck_id", ck_id)
    # deterministic resume point: the id-range midpoint (median definitions
    # differ between engines; the resume semantics only need a fixed cut)
    lo, hi = env.agg(F.min("_ck_id"), F.max("_ck_id")).collect()[0]
    pos = (int(lo) + int(hi)) // 2
    replay = env.where(F.col("_ck_id") > pos)
    return replay.agg(
        F.lit(pos).cast("bigint").alias("resume_after_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_replayed"),
        F.sum("_ck_id").cast("bigint").alias("id_sum"),
        F.min("_ck_id").cast("bigint").alias("first_replayed_id"),
    )


@register(
    "cdc_store_partition_repair",
    oracle=f"""
SELECT o_orderdate AS ts, o_orderkey * 4 AS record_id,
       o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0} AS o_totalprice, o_orderdate, o_orderpriority, 'I' AS op
FROM orders
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UA'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, '9-RUSH', 'UA'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 3 HOUR, o_orderkey * 4 + 3, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, {SQL_PRIO1}, 'D'
FROM orders WHERE o_orderkey % 97 = 0
""",
    tags=("cdc", "decode-once", "storage", "repair"),
)
def cdc_store_partition_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy repair of the serving store: a per-(tbl_part, month)
    MANIFEST (row count + envelope checksum) is taken at compaction time;
    one month directory is then destroyed; the damage is DETECTED by
    diffing live partition counts against the manifest (never a full-table
    compare), and only the damaged month is re-decoded from the wire and
    appended back. Proven: post-repair full-envelope checksum equals the
    pre-damage one, and the typed changelog served from the repaired copy
    hash-matches the wire-path oracle. Repair happens on the COMPACTED
    serving copy (a plain parquet dir — batch appends into a streaming
    sink's directory would be invisible behind its `_spark_metadata` log,
    the same trap `compact_store` documents). At 100 TB the re-decode is
    bounded by the raw layout's (topic-partition, hour) staging dirs, so
    repair cost tracks the damage, not the corpus."""
    import os
    import shutil

    from flink_dts_connector_spark.formats.ingest import (
        NO_TABLE,
        compact_store,
        envelope_checksum,
        ingest_incremental,
    )
    from flink_dts_connector_spark.datamodel.envelope import ENVELOPE_SCHEMA
    from flink_dts_connector_spark.sources.generator import TBL as _TBL

    store, _, _, _ = ingest_incremental(spark, sf_dir)
    serving, _ = compact_store(spark, store)
    cols = [f.name for f in ENVELOPE_SCHEMA.fields]

    # manifest: per-partition row counts (+ the global multiset checksum)
    manifest = {
        (r["tbl_part"], r["ingest_month"]): r["n"]
        for r in spark.read.parquet(serving)
        .groupBy("tbl_part", "ingest_month")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    chk_healthy = envelope_checksum(spark.read.parquet(serving).select(*cols))

    # destroy one deterministic month of the orders table
    months = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(os.path.join(serving, f"tbl_part={_TBL}"))
        if d.startswith("ingest_month=")
    )
    lost = months[0]
    shutil.rmtree(os.path.join(serving, f"tbl_part={_TBL}", f"ingest_month={lost}"))
    spark.catalog.refreshByPath(serving)

    # detect: live counts vs manifest — exactly one damaged partition
    live = {
        (r["tbl_part"], r["ingest_month"]): r["n"]
        for r in spark.read.parquet(serving)
        .groupBy("tbl_part", "ingest_month")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    damaged = sorted(k for k in manifest if live.get(k, 0) != manifest[k])
    if damaged != [(_TBL, lost)]:
        raise AssertionError(f"detection found {damaged}, expected {[(_TBL, lost)]}")

    # repair: re-decode ONLY the damaged month from the wire and append
    env = decode_cdc(generate_cdc_bytes(spark, sf_dir))
    patch = (
        env.withColumn(
            "tbl_part", F.coalesce(F.nullif("tbl", F.lit("")), F.lit(NO_TABLE))
        )
        .withColumn("ingest_month", F.date_format("ts", "yyyy-MM"))
        .where((F.col("tbl_part") == _TBL) & (F.col("ingest_month") == lost))
    )
    patch.repartition("tbl_part", "ingest_month").write.mode("append").partitionBy(
        "tbl_part", "ingest_month"
    ).parquet(serving)
    spark.catalog.refreshByPath(serving)

    chk_repaired = envelope_checksum(spark.read.parquet(serving).select(*cols))
    if chk_repaired != chk_healthy:
        raise AssertionError(
            f"repair incomplete: {chk_repaired} != healthy {chk_healthy}"
        )

    env2 = spark.read.parquet(serving).where(F.col("tbl_part") == _TBL)
    return project_table(env2, ORDERS_CDC_SCHEMA, table=f"{DB}.{TBL}")


@register(
    "cdc_header_jvm_filter",
    oracle="""
WITH recs AS (
  SELECT 'UPDATE' AS operation, o_orderkey * 4 + 1 AS id,
         CAST(epoch(o_orderdate) AS BIGINT) + 3600 AS ts
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT 'UPDATE', o_orderkey * 4 + 2, CAST(epoch(o_orderdate) AS BIGINT) + 7200
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT 'DELETE', o_orderkey * 4 + 3, CAST(epoch(o_orderdate) AS BIGINT) + 10800
  FROM orders WHERE o_orderkey % 97 = 0
), ck AS (
  SELECT operation, id, ts,
         '0@' || CAST(id % 2147483648 AS VARCHAR) || '@mysql-bin.000001:'
           || CAST(id AS VARCHAR) || '@' || CAST(ts * 1000 AS VARCHAR) AS ckpt
  FROM recs
)
SELECT operation, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(id) AS BIGINT) AS id_sum,
       CAST(MIN(ts) AS BIGINT) AS ts_min, CAST(MAX(ts) AS BIGINT) AS ts_max,
       CAST(SUM(md5_number_lower(ckpt) % 2147483648) AS BIGINT) AS ckpt_checksum
FROM ck GROUP BY operation
""",
    tags=("cdc", "decode", "jvm-header"),
)
def cdc_header_jvm_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's lazy-parse win — op/table filtering that reads ONLY
    the header (`impl/LazyParseRecordImpl.java:53-84`) — executed entirely
    inside the JVM: `formats/jvmheader.py` parses the varint header (id,
    ts, op, table, v2 source_position) with chained `aggregate()` column
    expressions, filters UPDATE/DELETE on the orders table, and aggregates
    count + id checksum + commit-ts bounds + a checkpoint-string checksum,
    all without a single record crossing into a Python worker after the
    generator. The checkpoint checksum pins the JVM render of
    `0@idLow31@sourcePosition@tsMillis` (`LazyParseRecordImpl.java:199-209`)
    byte-for-byte. Plan guard: tests/test_jvmheader.py asserts the
    pre-filter subtree over materialized bytes is Python-free."""
    from flink_dts_connector_spark.formats.jvmheader import (
        prefilter,
        with_jvm_header,
    )
    from flink_dts_connector_spark.operators.dedup import md5_number_lower_mod

    raw = generate_cdc_bytes(spark, sf_dir)
    # cheap single-expression prefilter first (one parse per record, none
    # for contains()-cut records). The exact residual check is folded into
    # CONDITIONAL AGGREGATES (m below) rather than a second `.where()`:
    # CombineFilters would merge a residual filter with the prefilter into
    # one predicate carrying several full header-parse copies evaluated on
    # EVERY record (measured 16s vs ~3s at sf0.1) — with no Filter node
    # above the header projection, the parse runs once per survivor.
    pre = prefilter(raw, tables=[f"{DB}.{TBL}"], ops=["UPDATE", "DELETE"])
    hdr = with_jvm_header(pre)
    sel = hdr.select(
        "hdr_op",
        "hdr_id",
        "hdr_ts",
        "hdr_checkpoint",
        (
            F.col("hdr_op").isin("UPDATE", "DELETE")
            & (F.col("hdr_db") == DB)
            & (F.col("hdr_tbl") == TBL)
        ).alias("m"),
    )
    return (
        sel.groupBy(F.col("hdr_op").alias("operation"))
        .agg(
            F.count(F.when(F.col("m"), 1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("m"), F.col("hdr_id"))).cast("bigint").alias("id_sum"),
            F.min(F.when(F.col("m"), F.col("hdr_ts"))).cast("bigint").alias("ts_min"),
            F.max(F.when(F.col("m"), F.col("hdr_ts"))).cast("bigint").alias("ts_max"),
            F.sum(
                F.when(
                    F.col("m"), md5_number_lower_mod(F.col("hdr_checkpoint"), 1 << 31)
                )
            )
            .cast("bigint")
            .alias("ckpt_checksum"),
        )
        .where(F.col("n") > 0)
    )


@register(
    "cdc_jvm_prefiltered_changelog",
    oracle=f"""
SELECT o_orderdate + INTERVAL 1 HOUR AS ts, o_orderkey * 4 + 1 AS record_id,
       o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0} AS o_totalprice, o_orderdate, o_orderpriority, 'UB' AS op
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UA'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, '9-RUSH', 'UA'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 3 HOUR, o_orderkey * 4 + 3, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, {SQL_PRIO1}, 'D'
FROM orders WHERE o_orderkey % 97 = 0
""",
    tags=("cdc", "typed", "changelog", "jvm-header"),
)
def cdc_jvm_prefiltered_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`decode_cdc_prefiltered` end-to-end: the JVM header pre-filter drops
    INSERT/HEARTBEAT/DDL records (the bulk of the stream) before the Arrow
    hop, then the Python layer decodes payloads for the UPDATE/DELETE
    survivors only — and the typed changelog must equal the unfiltered
    pipeline's result restricted to those ops, row for row. This is the
    filtered-ingest shape a 100 TB multi-tenant topic needs: Python cost
    scales with the selection, not the stream."""
    from flink_dts_connector_spark.formats.decoder import decode_cdc_prefiltered

    raw = generate_cdc_bytes(spark, sf_dir)
    env = decode_cdc_prefiltered(
        raw,
        tables=[f"{DB}.{TBL}"],
        ops=["UPDATE", "DELETE"],
        columns=[f.name for f in ORDERS_CDC_SCHEMA.fields],
    )
    return project_table(env, ORDERS_CDC_SCHEMA, table=f"{DB}.{TBL}")


@register(
    "cdc_store_filtered_ingest",
    oracle="""
SELECT source,
       CAST(SUM(w) AS BIGINT) AS n,
       CAST(SUM(doc_id * w) AS BIGINT) AS id_sum,
       CAST(SUM(n_chars * w) AS BIGINT) AS chars_sum
FROM (
  SELECT doc_id, source, n_chars,
         CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS w
  FROM documents
)
GROUP BY source
""",
    tags=("cdc", "store", "jvm-header", "ingest"),
)
def cdc_store_filtered_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-TABLE decode-once store built from the MULTI-TENANT topic
    (orders change stream ∪ documents ingest stream) with the JVM tiers
    inside the streaming ingest plan — the r7 verdict's gap: `ingest_once`
    paid Python header decode on foreign-table records. `ingest_filtered`
    routes the raw file stream through `jvmheader.prefilter` (contains()
    byte-search + lean header fold) so only `corpus.documents` INSERTs
    cross into the Arrow decoder; the stored≡re-decoded checksum audit
    runs at build time, and the scan below is partition-pruned to the one
    stored table. Totals carry the generator's at-least-once duplicates
    (every 5th document delivered twice) — the store keeps delivery
    fidelity; dedup is a downstream choice."""
    from flink_dts_connector_spark.formats.ingest import ingest_filtered
    from flink_dts_connector_spark.sources.generator import DOC_DB, DOC_TBL

    store = ingest_filtered(
        spark, sf_dir, tables=[f"{DOC_DB}.{DOC_TBL}"], ops=["INSERT"]
    )
    df = spark.read.parquet(store).where(F.col("tbl_part") == DOC_TBL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:", 1)
    if len(pf) < 2 or "tbl_part" not in pf[1].split("]", 1)[0]:
        raise AssertionError("filtered-store scan is not partition-pruned")
    return df.groupBy(F.element_at("after", "source").alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("id").cast("bigint").alias("id_sum"),
        F.sum(F.element_at("after", "n_chars").cast("bigint"))
        .cast("bigint")
        .alias("chars_sum"),
    )


@register(
    "cdc_jvm_typed_changelog",
    oracle=f"""
SELECT o_orderdate AS ts, o_orderkey * 4 AS record_id,
       o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0} AS o_totalprice, o_orderdate, o_orderpriority, 'I' AS op
FROM orders
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE0}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 1 HOUR, o_orderkey * 4 + 1, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UA'
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, o_orderpriority, 'UB'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 2 HOUR, o_orderkey * 4 + 2, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, '9-RUSH', 'UA'
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderdate + INTERVAL 3 HOUR, o_orderkey * 4 + 3, o_orderkey, o_custkey, o_orderstatus,
       {SQL_PRICE1}, o_orderdate, {SQL_PRIO1}, 'D'
FROM orders WHERE o_orderkey % 97 = 0
""",
    tags=("cdc", "typed", "changelog", "jvm-value"),
)
def cdc_jvm_typed_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL typed path with zero Python after the fixture generator —
    round 8's closure of the last Python tier on ingest
    (`formats/jvmvalue.py`): locate() anchors the declared schema's
    constant field-def bytes, one per-field `aggregate()` fold walks
    header + both row images, and the before/after values decode to the
    declared column types as pure expressions — including the exact-cents
    DECIMAL text, the segment-bitmap DATETIME, and the TEXT_OBJECT
    priority. Must equal `cdc_typed_changelog` (the Python decode path)
    row for row against the same SQL reconstruction. Reference parity:
    `DTSSubscribeRowDataDeserializationSchema.java:139-184` decodes
    declared columns JVM-side the same way. Plan guard:
    tests/test_jvmvalue.py asserts the subtree over materialized bytes has
    no Python eval node."""
    from flink_dts_connector_spark.formats.jvmvalue import decode_typed_jvm
    from flink_dts_connector_spark.sources.generator import ORDERS_FIELDS

    raw = generate_cdc_bytes(spark, sf_dir)
    return decode_typed_jvm(raw, ORDERS_CDC_SCHEMA, ORDERS_FIELDS, f"{DB}.{TBL}")


@register(
    "cdc_signed_histogram_quantiles",
    oracle=f"""
WITH vals AS (
  SELECT {SQL_PRIO1} AS g, {SQL_CENTS1} AS v FROM orders WHERE o_orderkey % 97 <> 0
), hist AS (
  SELECT g, v // 65536 AS bucket, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2
), cum AS (
  SELECT g, bucket, SUM(c) OVER (PARTITION BY g ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM hist
), qs AS (SELECT * FROM (VALUES (1, 2), (9, 10), (99, 100)) AS t(q_num, q_den)),
ranked AS (
  SELECT g, bucket, cum, q_num, q_den,
         GREATEST((q_num * n + q_den - 1) // q_den, 1) AS rank
  FROM cum CROSS JOIN qs
), hit AS (
  SELECT g, q_num, q_den, MIN(bucket) AS bucket
  FROM ranked WHERE cum >= rank GROUP BY 1, 2, 3
)
SELECT g, CAST(q_num AS INT) AS q_num, CAST(q_den AS INT) AS q_den,
       CAST(bucket * 65536 AS BIGINT) AS est_lo_maintained,
       CAST(bucket * 65536 AS BIGINT) AS est_lo_fresh
FROM hit
""",
    tags=("cdc", "changelog", "sketch", "quantile"),
)
def cdc_signed_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turnstile quantile sketch over the CDC changelog: histogram cells
    maintained with +1/−1 signed weights (UB/D retract, I/UA insert —
    priority renames move mass between groups through their UB/UA pair)
    answer every quantile identically to a fresh build over the
    materialized current state. Linearity is the whole trick: the
    maintained cells ARE the live table's cells, so a 100 TB pipeline
    keeps per-day quantile cells current by folding the change stream —
    no state-table rescan, shuffle O(cells). The engine emits both paths;
    the oracle computes the closed form once — hash match proves
    maintained ≡ fresh ≡ closed form."""
    from flink_dts_connector_spark.operators import sketch as SK

    qs = [(1, 2), (9, 10), (99, 100)]
    chg = _typed_changelog(spark, sf_dir)
    s = sign_col("op")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    signed = chg.select(
        F.col("o_orderpriority").alias("g"), cents.alias("v"), s.alias("w")
    )
    maintained = SK.value_histogram(signed, "g", "v", 16, weight_col="w").where(
        F.col("c") != 0
    )
    state = materialize_upsert(
        chg, ["o_orderkey"], order_cols=["ts", "record_id"]
    ).select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    fresh = SK.value_histogram(state, "g", "v", 16)
    qm = SK.histogram_quantiles(maintained, qs, 16).select(
        "g", "q_num", "q_den", F.col("est_lo").alias("est_lo_maintained")
    )
    qf = SK.histogram_quantiles(fresh, qs, 16).select(
        "g", "q_num", "q_den", F.col("est_lo").alias("est_lo_fresh")
    )
    return qm.join(qf, ["g", "q_num", "q_den"])
