"""Dead-letter routing for unconvertible events.

The reference has no DLQ: any conversion/append failure raises a
DebeziumException and stops the pipeline (ConsumerUtil.java,
BaseChangeConsumer.java:65-66).  ``on_error="fail"`` keeps that parity —
including for malformed wire JSON, which ``from_json`` would otherwise
silently turn into an all-null (tombstone-shaped) row.  ``on_error="route"``
is the at-scale alternative: flagged rows land in a rejects table with the
raw bytes and a reason, clean rows keep flowing.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.cdc import (
    REJECT_COL,
    REJECT_RAW_COL,
    parse_cdc_kafka,
    read_cdc_ndjson,
)
from debezium_server_bigquery_spark.streaming.pipeline import CdcPipeline

SCHEMA = {
    "type": "struct",
    "fields": [
        {"type": "int64", "field": "id"},
        {"type": "string", "field": "name"},
        {"type": "string", "optional": True, "field": "destination"},
        {"type": "int64", "optional": True, "field": "__ts_ms"},
        {"type": "string", "optional": True, "field": "__op"},
    ],
}

GOOD = {"id": 1, "name": "a", "destination": "t1", "__ts_ms": 1700000000000, "__op": "c"}
GOOD2 = {"id": 2, "name": "b", "destination": "t1", "__ts_ms": 1700000000001, "__op": "c"}
UNKNOWN = {"id": 3, "name": "c", "destination": "t1", "__ts_ms": 1700000000002, "__op": "c", "extra": 1}


def _write(tmp_path, lines):
    path = tmp_path / "events.ndjson"
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def _env(payload):
    return json.dumps({"schema": SCHEMA, "payload": payload})


def test_default_fail_raises_on_malformed_line(spark, tmp_path):
    path = _write(tmp_path, [_env(GOOD), "{this is not json"])
    with pytest.raises(Exception, match="malformed JSON"):
        read_cdc_ndjson(spark, path, schema_hint=SCHEMA).collect()


def test_clean_file_unchanged_by_default_policy(spark, tmp_path):
    path = _write(tmp_path, [_env(GOOD), _env(GOOD2)])
    rows = read_cdc_ndjson(spark, path, schema_hint=SCHEMA).orderBy("id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    assert REJECT_COL not in rows[0].asDict()


def test_route_flags_malformed_and_unknown(spark, tmp_path):
    path = _write(tmp_path, [_env(GOOD), "%%garbage%%", _env(UNKNOWN)])
    rows = (
        read_cdc_ndjson(
            spark,
            path,
            schema_hint=SCHEMA,
            ignore_unknown_fields=False,
            on_error="route",
        )
        .orderBy(F.col("id").asc_nulls_first())
        .collect()
    )
    assert len(rows) == 3
    bad = rows[0]  # null id — the garbage line
    assert bad[REJECT_COL].startswith("malformed JSON")
    assert bad[REJECT_RAW_COL] == "%%garbage%%"
    assert rows[1][REJECT_COL] is None and rows[1][REJECT_RAW_COL] is None
    assert "extra" in rows[2][REJECT_COL]


def test_route_permissive_keeps_unknown_fields_clean(spark, tmp_path):
    path = _write(tmp_path, [_env(UNKNOWN)])
    rows = read_cdc_ndjson(spark, path, schema_hint=SCHEMA, on_error="route").collect()
    assert rows[0][REJECT_COL] is None


def test_invalid_policy_rejected(spark, tmp_path):
    path = _write(tmp_path, [_env(GOOD)])
    with pytest.raises(ValueError, match="on_error"):
        read_cdc_ndjson(spark, path, schema_hint=SCHEMA, on_error="dlq")


def test_kafka_route_mode(spark):
    raw = spark.createDataFrame(
        [
            ("t1", json.dumps({"schema": SCHEMA, "payload": GOOD})),
            ("t1", "not json at all"),
            ("t1", None),  # tombstone: NOT a reject
        ],
        "topic string, value string",
    )
    rows = parse_cdc_kafka(raw, SCHEMA, on_error="route").collect()
    by_raw = {r[REJECT_RAW_COL]: r for r in rows}
    assert by_raw["not json at all"][REJECT_COL].startswith("malformed JSON")
    clean = [r for r in rows if r[REJECT_COL] is None]
    assert len(clean) == 2  # good row + tombstone


def test_kafka_default_fail_on_malformed(spark):
    raw = spark.createDataFrame(
        [("t1", "not json at all")], "topic string, value string"
    )
    with pytest.raises(Exception, match="malformed JSON"):
        parse_cdc_kafka(raw, SCHEMA).collect()


def test_pipeline_diverts_rejects_to_dlq(spark, tmp_path):
    path = _write(tmp_path, [_env(GOOD), "{broken", _env(GOOD2), _env(UNKNOWN)])
    batch = read_cdc_ndjson(
        spark,
        path,
        schema_hint=SCHEMA,
        ignore_unknown_fields=False,
        on_error="route",
    )
    pipe = CdcPipeline(
        spark,
        str(tmp_path / "target"),
        mode="append",
        rejects_destination="_rejects",
    )
    pipe.run_batch(batch)

    good = pipe.read_table("t1").orderBy("id").collect()
    assert [r["id"] for r in good] == [1, 2]

    dlq = pipe.rejects_table().read().collect()
    reasons = sorted(r["reject_reason"].split(":")[0] for r in dlq)
    assert reasons == ["malformed JSON", "unknown payload field(s) not in schema (ignore-unknown-fields=false)"]
    raws = {r["raw"] for r in dlq}
    assert "{broken" in raws


def test_pipeline_without_dlq_config_rejects_routed_batch(spark, tmp_path):
    path = _write(tmp_path, [_env(GOOD), "{broken"])
    batch = read_cdc_ndjson(spark, path, schema_hint=SCHEMA, on_error="route")
    pipe = CdcPipeline(spark, str(tmp_path / "target"), mode="append")
    with pytest.raises(ValueError, match="rejects_destination"):
        pipe.run_batch(batch)


def test_dlq_epoch_marker_makes_replay_idempotent(spark, tmp_path):
    path = _write(tmp_path, [_env(GOOD), "{broken"])
    batch = read_cdc_ndjson(spark, path, schema_hint=SCHEMA, on_error="route")
    pipe = CdcPipeline(
        spark,
        str(tmp_path / "target"),
        mode="append",
        rejects_destination="_rejects",
    )
    pipe.process_batch(batch, epoch_id=7)
    pipe.process_batch(batch, epoch_id=7)  # replayed epoch: both writes skip
    assert pipe.rejects_table().read().count() == 1
    assert pipe.read_table("t1").count() == 1


def test_streaming_dlq_with_checkpoint_restart(spark, tmp_path):
    """Streaming route mode: corrupt lines land in the DLQ through
    foreachBatch, and a checkpoint restart replays nothing (epoch markers
    + offset checkpoint keep both tables exactly-once)."""
    path = tmp_path / "stream_src"
    path.mkdir()
    (path / "a.ndjson").write_text(
        _env(GOOD) + "\n{broken\n" + _env(GOOD2) + "\n"
    )
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")

    def run_once():
        stream = read_cdc_ndjson(
            spark, str(path), streaming=True, schema_hint=SCHEMA, on_error="route"
        )
        pipe = CdcPipeline(
            spark, target, mode="append", rejects_destination="_rejects"
        )
        q = pipe.run_stream(stream, ckpt, available_now=True)
        q.awaitTermination(120)
        return pipe

    p1 = run_once()
    assert p1.read_table("t1").count() == 2
    assert p1.rejects_table().read().count() == 1

    p2 = run_once()  # restart, no new files: nothing replays
    assert p2.read_table("t1").count() == 2
    assert p2.rejects_table().read().count() == 1


def test_strict_mode_passes_tombstones(spark, tmp_path):
    """{"schema":..., "payload": null} is the documented delete marker —
    strict mode must not flag the envelope keys as unknown fields."""
    tomb = json.dumps({"schema": SCHEMA, "payload": None})
    path = _write(tmp_path, [_env(GOOD), tomb])
    rows = read_cdc_ndjson(
        spark, path, schema_hint=SCHEMA, ignore_unknown_fields=False
    ).collect()
    assert len(rows) == 2  # both parse; the null payload is an all-null row
    rows = read_cdc_ndjson(
        spark,
        path,
        schema_hint=SCHEMA,
        ignore_unknown_fields=False,
        on_error="route",
    ).collect()
    assert all(r[REJECT_COL] is None for r in rows)
