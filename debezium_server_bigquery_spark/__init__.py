"""debezium_server_bigquery_spark — a PySpark-native CDC replication +
analytics engine with the capabilities of memiiso/debezium-server-bigquery.

The reference (Java, /root/reference) embeds the Debezium engine and loads
CDC change events into BigQuery tables in batch (Load Job) or stream
(Storage Write API, append/upsert) mode.  This package re-expresses that
dataflow Spark-first:

- ``schema``     Debezium event-schema JSON -> Spark ``StructType``
                 (mirror of BaseRecordConverter.schemaFields, see SURVEY §1.3)
- ``coerce``     value coercions F1-F11 as pure ``pyspark.sql.functions``
                 column builders (no Python UDFs in the hot path)
- ``operators``  routing (R1-R6), in-batch dedup (A1-A4), upsert MERGE (S5),
                 target-table management (S6)
- ``sources``    Debezium-JSON NDJSON reader (batch + stream) and the
                 deterministic CDC synthesizer over the ``events`` test table
- ``streaming``  the end-to-end Structured Streaming pipeline
                 (readStream -> foreachBatch -> route -> dedup -> append/merge)
                 and batch-size-wait trigger policies (T2-T4)
- ``functions``  scalar function library + LLM-data-pipeline operators
                 (exact/minhash/simhash/jaccard/embedding dedup, ANN search,
                 text analysis, multimodal column plumbing)
- ``plans``      the analytic query library run by bench.py / __spark_entry__

Design stance (100 TB): declarative DataFrame plans only; Catalyst does
pushdown/pruning/join-selection; broadcast small dimensions explicitly;
aggregation-based dedup (map-side partial agg) instead of global window
sorts; month-partitioned targets with dynamic partition overwrite so a
MERGE touches only affected partitions.
"""

__version__ = "0.1.0"

from debezium_server_bigquery_spark.session import get_spark  # noqa: F401
