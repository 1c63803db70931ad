from debezium_server_bigquery_spark.plans import analytics  # noqa: F401
