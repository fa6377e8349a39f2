"""flink_dts_connector_spark — a PySpark-native analytics engine with the
capabilities of silly-fofo/flink-dts-connector (a Flink 1.12 DTS CDC Kafka
connector), rebuilt Spark-first.

Layers (see SURVEY.md):
  datamodel/  — CDC envelope StructType, operation/source/value-type enums
  formats/    — binary wire codec + lazy two-phase decoder + typed projection
  sources/    — Kafka option builder (`dts` connector parity) + file/test sources
  operators/  — changelog semantics kit, dedup, similarity, text, multimodal
  plans/      — the query battery (each query paired with a DuckDB oracle)
  streaming/  — watermarked/windowed streaming helpers + failover glue

Nothing here ports Flink machinery: Spark's Kafka source, checkpoint WAL,
partition discovery and Catalyst replace ~90% of the reference's code
(SURVEY.md §4). Our code is the CDC format, changelog semantics, and the
LLM-data-pipeline extension operators.
"""

__version__ = "0.1.0"

from flink_dts_connector_spark.session import get_spark  # noqa: F401
