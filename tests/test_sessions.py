"""Sessionization: batch/declarative vs stateful-streaming equivalence,
plus watermarked tumbling windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table
from debezium_server_bigquery_spark.streaming.sessions import (
    sessionize,
    sessionize_stream,
    windowed_event_counts,
    windowed_event_counts_stream,
)


def test_batch_sessionize_shapes(spark, sf_dir):
    s = sessionize(spark, sf_dir)
    rows = s.collect()
    assert len(rows) > 0
    # sessions are per-user sequential from 1 and non-overlapping in time
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for _user, sess in by_user.items():
        seqs = [r["session_seq"] for r in sess]
        assert seqs == list(range(1, len(sess) + 1))
        for a, b in zip(sess, sess[1:]):
            assert a["session_end"] < b["session_start"]
        for r in sess:
            assert r["session_start"] <= r["session_end"]
            assert r["n_events"] >= 1


def test_streaming_sessionize_matches_batch_closed_sessions(spark, sf_dir, tmp_path):
    """Run the stateful operator over the same events as a stream; every
    session it closes must exist in the batch result with identical stats."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT user_id, session_seq, session_start, session_end, n_events, total_value "
        "FROM sess_out WHERE closed = 'true'"
    ).collect()
    assert len(got) > 0

    batch = {
        (r["user_id"], r["session_seq"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["total_value"],
        )
        for r in sessionize(spark, sf_dir).collect()
    }
    for r in got:
        key = (r["user_id"], r["session_seq"])
        assert key in batch, f"streaming session {key} missing from batch result"
        bs, be, bn, bv = batch[key]
        assert r["session_start"] == bs
        assert r["session_end"] == be
        assert r["n_events"] == bn
        assert abs(r["total_value"] - bv) < 1e-6


def test_windowed_counts_stream_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = windowed_event_counts_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_counts(spark, sf_dir).collect()
    }
    # append-mode only emits windows finalized by the watermark; every
    # emitted window must match the batch result exactly
    assert len(got) > 0
    for k, v in got.items():
        assert expected.get(k) == v


def test_sessionize_single_exchange(spark, sf_dir):
    """Both window functions and the session agg share one user_id shuffle —
    the plan must contain exactly one hashpartitioning exchange on user_id
    before the final aggregation."""
    plan = sessionize(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2  # one for windows, one (reused/AQE) for agg at most


def test_sliding_counts_stream_matches_batch(spark, sf_dir, tmp_path):
    from debezium_server_bigquery_spark.streaming.sessions import (
        sliding_event_counts,
        sliding_event_counts_stream,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = sliding_event_counts_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("slide_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in 180s"
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM slide_out").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in sliding_event_counts(spark, sf_dir).collect()
    }
    assert len(got) > 0
    for k, v in got.items():
        assert expected.get(k) == v
