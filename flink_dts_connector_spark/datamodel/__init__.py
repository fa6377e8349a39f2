from flink_dts_connector_spark.datamodel.envelope import (  # noqa: F401
    ENVELOPE_SCHEMA,
    DATA_OPERATIONS,
    OperationType,
    SourceType,
)
