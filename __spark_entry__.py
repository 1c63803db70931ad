"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB-runnable ANSI-SQL twins for the hash compare.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from debezium_server_bigquery_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from debezium_server_bigquery_spark.plans import (
        analytics,
        analytics_ext,
        analytics_tpch2,
        analytics_windows,
        cdc_queries,
    )

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(analytics.QUERIES)
    out.update(analytics_ext.QUERIES)
    out.update(analytics_tpch2.QUERIES)
    out.update(analytics_windows.QUERIES)
    out.update(cdc_queries.QUERIES)
    try:
        from debezium_server_bigquery_spark.plans import pipeline_queries

        out.update(pipeline_queries.QUERIES)
    except ImportError:
        pass
    try:
        from debezium_server_bigquery_spark.streaming import sessions

        out.update(sessions.QUERIES)
    except ImportError:
        pass
    try:
        from debezium_server_bigquery_spark.operators import asof, rangejoin, skewjoin

        out.update(asof.QUERIES)
        out.update(rangejoin.QUERIES)
        out.update(skewjoin.QUERIES)
    except ImportError:
        pass
    try:
        from debezium_server_bigquery_spark.functions import (
            dedup_fuzzy,
            similarity,
            sketches,
            text,
            multimodal,
            packing,
        )

        out.update(dedup_fuzzy.QUERIES)
        out.update(similarity.QUERIES)
        out.update(sketches.QUERIES)
        out.update(text.QUERIES)
        out.update(multimodal.QUERIES)
        out.update(packing.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from debezium_server_bigquery_spark.plans import (
        analytics,
        analytics_ext,
        analytics_tpch2,
        analytics_windows,
        cdc_queries,
    )

    out: dict[str, str] = {}
    out.update(analytics.ORACLES)
    out.update(analytics_ext.ORACLES)
    out.update(analytics_tpch2.ORACLES)
    out.update(analytics_windows.ORACLES)
    out.update(cdc_queries.ORACLES)
    try:
        from debezium_server_bigquery_spark.plans import pipeline_queries

        out.update(pipeline_queries.ORACLES)
    except ImportError:
        pass
    try:
        from debezium_server_bigquery_spark.streaming import sessions

        out.update(sessions.ORACLES)
    except ImportError:
        pass
    try:
        from debezium_server_bigquery_spark.operators import asof, rangejoin, skewjoin

        out.update(asof.ORACLES)
        out.update(rangejoin.ORACLES)
        out.update(skewjoin.ORACLES)
    except ImportError:
        pass
    try:
        from debezium_server_bigquery_spark.functions import (
            dedup_fuzzy,
            similarity,
            sketches,
            text,
            multimodal,
            packing,
        )

        out.update(dedup_fuzzy.ORACLES)
        out.update(similarity.ORACLES)
        out.update(sketches.ORACLES)
        out.update(text.ORACLES)
        out.update(multimodal.ORACLES)
        out.update(packing.ORACLES)
    except ImportError:
        pass
    return out
