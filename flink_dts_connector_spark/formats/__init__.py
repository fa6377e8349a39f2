from flink_dts_connector_spark.formats.wire import (  # noqa: F401
    CdcRecord,
    FieldDef,
    decode_header,
    decode_record,
    encode_record,
)
