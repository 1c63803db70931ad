"""Stream-stream interval join vs its batch twin (streaming/stream_join.py).

The streaming form must emit exactly the pairs the batch twin computes
(availableNow drains everything, and with the watermark no input is late),
and must survive a checkpoint restart without duplicating pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table
from debezium_server_bigquery_spark.streaming.stream_join import (
    interval_join_stream,
    stream_view_purchase_pairs,
)


def _sources(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    base = load_table(spark, sf_dir, "events")
    views = base.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v_dir, p_dir = str(tmp_path / "views"), str(tmp_path / "purchases")
    views.coalesce(1).write.parquet(v_dir)
    purchases.coalesce(1).write.parquet(p_dir)
    v_stream = spark.readStream.schema(views.schema).parquet(v_dir)
    p_stream = spark.readStream.schema(purchases.schema).parquet(p_dir)
    return ev, v_stream, p_stream


def _run(spark, out, tmp_path, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout — a partially-populated
    # sink must fail HERE, not as a confusing downstream count mismatch.
    assert q.awaitTermination(180), "stream query did not finish in 180s"
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_join_matches_batch_twin(spark, sf_dir, tmp_path):
    _, v_stream, p_stream = _sources(spark, sf_dir, tmp_path)
    got = _run(
        spark,
        interval_join_stream(v_stream, p_stream),
        tmp_path,
        "sj_out",
    )
    expected = {
        (r["purchase_id"], r["view_id"]): r["micros_before"]
        for r in stream_view_purchase_pairs(spark, sf_dir).collect()
    }
    assert len(got) == len(expected) > 0
    for r in got:
        assert expected[(r["purchase_id"], r["view_id"])] == r["micros_before"]


def test_stream_join_restart_no_duplicates(spark, sf_dir, tmp_path):
    """availableNow, then a second start on the same checkpoint: the second
    run must add nothing (offsets committed, state not replayed).  A file
    sink is used because the memory sink cannot recover a checkpoint."""
    _, v_stream, p_stream = _sources(spark, sf_dir, tmp_path)
    out = interval_join_stream(v_stream, p_stream)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt_restart")

    def run_once():
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream query did not finish in 180s"
        return spark.read.parquet(sink).count()

    first = run_once()
    second = run_once()
    assert first > 0
    assert second == first
