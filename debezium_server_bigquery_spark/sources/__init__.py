from debezium_server_bigquery_spark.sources.tables import load_tables, register_views  # noqa: F401
from debezium_server_bigquery_spark.sources.cdc import (  # noqa: F401
    synthesize_cdc_events,
    read_cdc_ndjson,
)
