from flink_dts_connector_spark.plans.registry import all_queries, get_query, register  # noqa: F401
