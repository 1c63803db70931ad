from debezium_server_bigquery_spark.operators.routing import (  # noqa: F401
    filter_heartbeats,
    rewrite_destination,
    drop_tombstones,
    destinations_in,
)
from debezium_server_bigquery_spark.operators.dedup import dedup_last_writer  # noqa: F401
from debezium_server_bigquery_spark.operators.table import ParquetTable  # noqa: F401
from debezium_server_bigquery_spark.operators.merge import merge_upsert  # noqa: F401
