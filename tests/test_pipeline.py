"""End-to-end pipeline tests — the engine's analog of the reference's
E2E integration tests (SURVEY §5): feed CDC events, assert on the
destination tables, exercise restart/idempotency via checkpoints."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.cdc import read_cdc_ndjson, synthesize_cdc_events
from debezium_server_bigquery_spark.sources.tables import load_table
from debezium_server_bigquery_spark.streaming.pipeline import CdcPipeline
import pytest


def _cdc_df(spark, sf_dir):
    return synthesize_cdc_events(load_table(spark, sf_dir, "events"))


def test_batch_append_pipeline(spark, sf_dir, tmp_path):
    p = CdcPipeline(spark, str(tmp_path / "tgt"), mode="append")
    cdc = _cdc_df(spark, sf_dir)
    p.run_batch(cdc)
    # heartbeats filtered, three destination tables materialized
    dests = sorted(os.listdir(tmp_path / "tgt"))
    assert dests == [
        "testc_inventory_events_p0",
        "testc_inventory_events_p1",
        "testc_inventory_events_p2",
    ]
    total = sum(p.read_table(d).count() for d in dests)
    n_expected = cdc.filter(~F.col("destination").startswith("__debezium")).count()
    assert total == n_expected
    # month partitioning present on disk (time-partition analog)
    t0 = tmp_path / "tgt" / "testc_inventory_events_p0"
    assert any(d.startswith("__part_month=") for d in os.listdir(t0))


def test_batch_upsert_pipeline(spark, sf_dir, tmp_path):
    p = CdcPipeline(
        spark, str(tmp_path / "tgt"), mode="upsert", key_cols=("user_id",), n_buckets=8
    )
    cdc = _cdc_df(spark, sf_dir)
    p.run_batch(cdc)
    live = cdc.filter(~F.col("destination").startswith("__debezium"))
    for dest in [r[0] for r in live.select("destination").distinct().collect()]:
        table_name = dest.replace(".", "_")
        got = p.read_table(table_name)
        # one row per key, and no key whose last event was a delete
        keys = got.select("user_id").collect()
        assert len(keys) == len(set(k[0] for k in keys))  # unique PK
        assert got.filter(F.col("__op") == "d").count() == 0


def test_streaming_pipeline_with_checkpoint_restart(spark, sf_dir, tmp_path):
    src_dir = str(tmp_path / "src")
    cdc = _cdc_df(spark, sf_dir)
    cdc.coalesce(1).write.parquet(src_dir)

    ckpt = str(tmp_path / "ckpt")
    tgt = str(tmp_path / "tgt")

    def run_once():
        p = CdcPipeline(spark, tgt, mode="append")
        stream = spark.readStream.schema(cdc.schema).parquet(src_dir)
        q = p.run_stream(stream, ckpt, available_now=True)
        q.awaitTermination(120)
        return p

    p = run_once()
    expected = cdc.filter(~F.col("destination").startswith("__debezium")).count()
    count1 = sum(
        p.read_table(d).count() for d in os.listdir(tgt) if not d.startswith(".")
    )
    assert count1 == expected

    # restart with same checkpoint: no new data -> no duplicates (S7 parity:
    # checkpoint subsumes the BigQuery offset store).
    p2 = run_once()
    count2 = sum(
        p2.read_table(d).count() for d in os.listdir(tgt) if not d.startswith(".")
    )
    assert count2 == expected


def test_read_cdc_ndjson_with_embedded_schema(spark, tmp_path):
    events = [
        {
            "schema": {
                "type": "struct",
                "fields": [
                    {"type": "int32", "optional": False, "field": "id"},
                    {"type": "string", "optional": True, "field": "name"},
                    {"type": "string", "optional": True, "field": "__op"},
                ],
            },
            "payload": {"id": i, "name": f"n{i}", "__op": "c"},
        }
        for i in range(3)
    ]
    path = tmp_path / "events.ndjson"
    path.write_text("\n".join(json.dumps(e) for e in events) + "\n")
    df = read_cdc_ndjson(spark, str(path))
    rows = sorted((r.id, r.name) for r in df.collect())
    assert rows == [(0, "n0"), (1, "n1"), (2, "n2")]
    assert df.schema["id"].dataType.simpleString() == "bigint"


def test_per_destination_transform_hook(spark, sf_dir, tmp_path):
    """SURVEY §2.8 — the SMT-chain analog: user DataFrame->DataFrame
    transforms per destination ("*" = all), applied before write."""
    p = CdcPipeline(
        spark,
        str(tmp_path / "tgt"),
        mode="append",
        transforms={
            "*": [lambda df: df.withColumn("flagged", F.lit(True))],
            "testc_inventory_events_p0": [
                lambda df: df.filter(F.col("event_type") != "view")
            ],
        },
    )
    cdc = _cdc_df(spark, sf_dir)
    p.run_batch(cdc)
    t0 = p.read_table("testc_inventory_events_p0")
    t1 = p.read_table("testc_inventory_events_p1")
    # global transform hit every destination
    assert t0.filter(~F.col("flagged")).count() == 0
    assert t1.filter(~F.col("flagged")).count() == 0
    # destination-specific filter applied only to p0
    assert t0.filter(F.col("event_type") == "view").count() == 0
    assert t1.filter(F.col("event_type") == "view").count() > 0


def test_snapshot_backfill_then_stream(spark, tmp_path):
    """T9 parity (SURVEY §2.7): initial snapshot rows arrive with __op='r'
    (batch backfill), then streaming changes resume on top.  A later 'u'
    must beat the snapshot row; an untouched snapshot row survives; and a
    replayed snapshot batch cannot resurrect overwritten state thanks to
    op-priority ('r' < 'u') plus epoch markers."""
    from debezium_server_bigquery_spark.operators.merge import merge_upsert
    from debezium_server_bigquery_spark.operators.table import ParquetTable

    cols = "user_id long, v string, __op string, __source_ts_ns long, __deleted boolean"
    t = ParquetTable(
        spark, str(tmp_path / "t"), key_cols=["user_id"], mode="upsert", n_buckets=4
    )
    snapshot = spark.createDataFrame(
        [(1, "snap1", "r", 100, False), (2, "snap2", "r", 100, False)], cols
    )
    merge_upsert(t, snapshot, epoch_id="snapshot.0")
    stream1 = spark.createDataFrame([(1, "live1", "u", 100, False)], cols)
    merge_upsert(t, stream1, epoch_id=1)  # same ts: op-priority u > r wins
    got = {r["user_id"]: (r["v"], r["__op"]) for r in t.read().collect()}
    assert got == {1: ("live1", "u"), 2: ("snap2", "r")}
    # replaying the snapshot epoch is a no-op (marker), and even a re-merge
    # of the same snapshot rows cannot beat the newer 'u' state
    merge_upsert(t, snapshot, epoch_id="snapshot.0")
    merge_upsert(t, snapshot, epoch_id="snapshot.1")
    got = {r["user_id"]: (r["v"], r["__op"]) for r in t.read().collect()}
    assert got == {1: ("live1", "u"), 2: ("snap2", "r")}


def test_pkless_upsert_modes_fall_back_to_append(spark, sf_dir, tmp_path):
    """A4 parity at the PIPELINE level: upsert/upsert_lazy with no key
    columns must run append (time-partitioned tables), not raise.
    Regression: table_for built a key-bucketed table for these modes even
    without keys, and the append branch then failed in with_partition_col."""
    cdc = _cdc_df(spark, sf_dir)
    expected = cdc.filter(~F.col("destination").startswith("__debezium")).count()
    for i, mode in enumerate(("upsert", "upsert_lazy")):
        p = CdcPipeline(spark, str(tmp_path / f"t{i}"), mode=mode, key_cols=())
        p.run_batch(cdc)
        total = sum(p.read_table(d).count() for d in p.tables)
        assert total == expected, mode


def test_parallel_upload_timeout_fails_batch(spark, sf_dir, tmp_path):
    # concurrent-uploads.timeout-minutes parity (CommonConfig.java:32-34,
    # BaseChangeConsumer.java:243-253): a hung per-table task cancels the
    # batch with a timeout error instead of blocking forever.
    import time

    import pytest

    def slow(df):
        time.sleep(3)
        return df

    p = CdcPipeline(
        spark,
        str(tmp_path / "tgt"),
        mode="append",
        concurrent_uploads=4,
        concurrent_uploads_timeout_minutes=0.005,  # 300 ms
        transforms={"*": [slow]},
    )
    with pytest.raises(RuntimeError, match="timed out"):
        p.run_batch(_cdc_df(spark, sf_dir))


def test_parallel_upload_aggregates_all_failures(spark, sf_dir, tmp_path):
    # invokeAll parity: every failed destination is reported, not just the
    # first (BaseChangeConsumer.java:255-266).
    import pytest

    def boom_for(dest):
        def fn(df):
            raise ValueError(f"boom-{dest}")

        return fn

    p = CdcPipeline(
        spark,
        str(tmp_path / "tgt"),
        mode="append",
        concurrent_uploads=4,
        transforms={
            "testc_inventory_events_p0": [boom_for("p0")],
            "testc_inventory_events_p2": [boom_for("p2")],
        },
    )
    with pytest.raises(RuntimeError) as ei:
        p.run_batch(_cdc_df(spark, sf_dir))
    msg = str(ei.value)
    assert "boom-p0" in msg and "boom-p2" in msg


def test_heartbeat_skip_consuming_false_replicates_heartbeats(
    spark, sf_dir, tmp_path
):
    # debezium.source.topic.heartbeat.skip-consuming=false
    # (DebeziumConfig.java:86-88): heartbeat topics replicate like any
    # destination instead of being dropped.
    p = CdcPipeline(
        spark, str(tmp_path / "tgt"), mode="append", heartbeat_skip=False
    )
    cdc = _cdc_df(spark, sf_dir)
    p.run_batch(cdc)
    dests = sorted(os.listdir(tmp_path / "tgt"))
    assert "__debezium-heartbeat_testc" in dests
    n_hb = cdc.filter(F.col("destination").startswith("__debezium")).count()
    assert p.read_table("__debezium-heartbeat_testc").count() == n_hb


@pytest.mark.heavy
def test_pipeline_stream_e2e_converges_out_of_order(spark, sf_dir):
    """The streaming drain (multiple out-of-order micro-batches via
    maxFilesPerTrigger=1) must reach the same final state as the one-batch
    destructive path plus flagged tombstones."""
    from debezium_server_bigquery_spark.plans.pipeline_queries import (
        pipeline_stream_e2e,
        pipeline_upsert_e2e,
    )

    stream_rows = pipeline_stream_e2e(spark, sf_dir).collect()
    live = [
        (r.table_name, r.user_id, r.event_id) for r in stream_rows if r["__op"] != "d"
    ]
    batch = [
        (r.table_name, r.user_id, r.event_id)
        for r in pipeline_upsert_e2e(spark, sf_dir).collect()
    ]
    assert live == batch  # stream live rows == eager one-batch winners
    assert any(r["__op"] == "d" for r in stream_rows)  # tombstones retained


def test_pipeline_transform_hook_order_and_scope(spark, sf_dir):
    from debezium_server_bigquery_spark.plans.pipeline_queries import (
        pipeline_transform_hook_e2e,
    )

    rows = pipeline_transform_hook_e2e(spark, sf_dir).collect()
    assert all(r.value_eur == round(r.value * 0.9, 4) for r in rows)  # global
    for r in rows:  # destination-scoped redaction hits exactly p0
        if r.table_name == "testc_inventory_events_p0":
            assert r.props == "<redacted>"
        else:
            assert r.props != "<redacted>"


def test_denormalized_export_matches_direct_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from debezium_server_bigquery_spark.plans.pipeline_queries import (
        denormalized_export_e2e,
    )

    out = {r.cust_nation: r for r in denormalized_export_e2e(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    direct = {
        r.n_name: r.n
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {k: v.n_rows for k, v in out.items()} == direct


def test_stream_checkpoint_resume_no_dupes_no_loss(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.pipeline_queries import (
        stream_checkpoint_resume_e2e,
    )

    rows = [(i, f"text {i}", "en" if i % 2 else "fr", "s", 10 + i) for i in range(40)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in stream_checkpoint_resume_e2e(spark, str(tmp_path)).collect()}
    # exact equality against the batch truth: nothing lost, nothing doubled
    assert out["en"].n_docs == 20 and out["fr"].n_docs == 20
    assert out["en"].n_chars == sum(10 + i for i in range(40) if i % 2)
    assert out["fr"].n_chars == sum(10 + i for i in range(40) if not i % 2)
