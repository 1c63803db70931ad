"""Lazy upsert (max_staleness parity) — staged appends + amortized MERGE.

The contract under test: at every point in time, ``read_current()`` of
the lazy table equals what the eager per-batch MERGE path would have
produced, regardless of where the compaction boundary falls; after
``compact()`` the base table alone holds that state.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from debezium_server_bigquery_spark.operators.merge import merge_upsert
from debezium_server_bigquery_spark.operators.staged_upsert import StagedUpsertTable
from debezium_server_bigquery_spark.operators.table import ParquetTable
from debezium_server_bigquery_spark.streaming.pipeline import CdcPipeline

_COLS = "user_id long, v string, __op string, __source_ts_ns long, __deleted boolean"


def _batches(spark):
    return [
        spark.createDataFrame(
            [(1, "a", "c", 100, False), (2, "b", "c", 110, False)], _COLS
        ),
        spark.createDataFrame(
            [(1, "a2", "u", 200, False), (3, "c", "c", 210, False)], _COLS
        ),
        spark.createDataFrame(
            [(2, None, "d", 300, True), (3, "c2", "u", 310, False)], _COLS
        ),
        spark.createDataFrame(
            [(2, "b2", "c", 400, False), (4, "d", "c", 410, False)], _COLS
        ),
    ]


def _snap(df):
    return sorted(
        (r["user_id"], r["v"], r["__op"]) for r in df.select("user_id", "v", "__op").collect()
    )


def _eager(spark, tmp_path, batches, upto, **kw):
    t = ParquetTable(
        spark, str(tmp_path / f"eager_{upto}"), key_cols=["user_id"], mode="upsert", n_buckets=4
    )
    for i, b in enumerate(batches[:upto]):
        merge_upsert(t, b, epoch_id=i, **kw)
    return t.read()


@pytest.mark.heavy
def test_lazy_matches_eager_at_every_point(spark, tmp_path):
    batches = _batches(spark)
    base = ParquetTable(
        spark, str(tmp_path / "lazy"), key_cols=["user_id"], mode="upsert", n_buckets=4
    )
    lazy = StagedUpsertTable(base, staleness_batches=3)
    for i, b in enumerate(batches):
        lazy.apply(b, epoch_id=i)
        assert _snap(lazy.read_current()) == _snap(
            _eager(spark, tmp_path, batches, i + 1)
        ), f"divergence after batch {i}"
    # batch 3 (index 2) triggered auto-compaction at staleness 3; finish it
    lazy.compact()
    assert _snap(lazy.read_stale()) == _snap(_eager(spark, tmp_path, batches, 4))


@pytest.mark.heavy
def test_lazy_keep_deletes(spark, tmp_path):
    batches = _batches(spark)
    base = ParquetTable(
        spark, str(tmp_path / "lazykd"), key_cols=["user_id"], mode="upsert", n_buckets=4
    )
    lazy = StagedUpsertTable(base, staleness_batches=10, keep_deletes=True)
    for i, b in enumerate(batches[:3]):
        lazy.apply(b, epoch_id=i)
    cur = lazy.read_current()
    # user 2's delete is retained, flagged
    row = cur.filter(F.col("user_id") == 2).collect()
    assert len(row) == 1 and row[0]["__op"] == "d" and row[0]["__deleted"]


def test_lazy_epoch_replay_is_idempotent(spark, tmp_path):
    batches = _batches(spark)
    base = ParquetTable(
        spark, str(tmp_path / "lazyr"), key_cols=["user_id"], mode="upsert", n_buckets=4
    )
    lazy = StagedUpsertTable(base, staleness_batches=10)
    lazy.apply(batches[0], epoch_id=0)
    before = _snap(lazy.read_current())
    lazy.apply(batches[0], epoch_id=0)  # replayed micro-batch
    assert _snap(lazy.read_current()) == before


@pytest.mark.heavy
def test_lazy_stage_counter_recovers_after_restart(spark, tmp_path):
    batches = _batches(spark)
    base = ParquetTable(
        spark, str(tmp_path / "lazyc"), key_cols=["user_id"], mode="upsert", n_buckets=4
    )
    lazy = StagedUpsertTable(base, staleness_batches=10)
    lazy.apply(batches[0], epoch_id=0)
    lazy.apply(batches[1], epoch_id=1)
    # "restart": a fresh wrapper over the same paths continues the sequence
    lazy2 = StagedUpsertTable(base, staleness_batches=10)
    assert lazy2._staged == 2
    lazy2.apply(batches[2], epoch_id=2)
    assert _snap(lazy2.read_current()) == _snap(
        _eager(spark, tmp_path, batches, 3)
    )


@pytest.mark.heavy
def test_pipeline_upsert_lazy_mode(spark, sf_dir, tmp_path):
    from debezium_server_bigquery_spark.sources.cdc import synthesize_cdc_events
    from debezium_server_bigquery_spark.sources.tables import load_table

    cdc = synthesize_cdc_events(load_table(spark, sf_dir, "events"))
    eager = CdcPipeline(
        spark, str(tmp_path / "eager"), mode="upsert", key_cols=("user_id",), n_buckets=8
    )
    eager.run_batch(cdc)
    lazy = CdcPipeline(
        spark,
        str(tmp_path / "lazy"),
        mode="upsert_lazy",
        key_cols=("user_id",),
        n_buckets=8,
        max_staleness_batches=5,
    )
    lazy.run_batch(cdc)
    for dest in sorted(eager.tables):
        e = _snap(eager.read_table(dest).select("user_id", F.col("event_type").alias("v"), "__op"))
        l = _snap(lazy.read_table(dest).select("user_id", F.col("event_type").alias("v"), "__op"))
        assert e == l, dest
    # after compaction the stale read path converges to the same state
    lazy.compact_all()
    for dest in sorted(eager.tables):
        e = _snap(eager.read_table(dest).select("user_id", F.col("event_type").alias("v"), "__op"))
        s = _snap(
            lazy.lazy_for(dest).read_stale().select(
                "user_id", F.col("event_type").alias("v"), "__op"
            )
        )
        assert e == s, dest


@pytest.mark.heavy
def test_streaming_lazy_upsert_with_checkpoint_restart(spark, sf_dir, tmp_path):
    """Lazy mode under Structured Streaming: staged appends are
    epoch-guarded, so a checkpoint restart that replays nothing leaves the
    exact same state; the final compacted table equals the eager path."""
    import os

    from debezium_server_bigquery_spark.sources.cdc import synthesize_cdc_events
    from debezium_server_bigquery_spark.sources.tables import load_table

    cdc = synthesize_cdc_events(load_table(spark, sf_dir, "events"))
    src_dir = str(tmp_path / "src")
    cdc.coalesce(1).write.parquet(src_dir)
    ckpt, tgt = str(tmp_path / "ckpt"), str(tmp_path / "tgt")

    def run_once():
        p = CdcPipeline(
            spark, tgt, mode="upsert_lazy", key_cols=("user_id",), n_buckets=8,
            max_staleness_batches=50,
        )
        stream = spark.readStream.schema(cdc.schema).parquet(src_dir)
        q = p.run_stream(stream, ckpt, available_now=True)
        q.awaitTermination(120)
        return p

    p = run_once()
    # pre-compaction, only underscore-prefixed staging dirs exist on disk —
    # destinations live in the pipeline's table registry
    assert not [d for d in os.listdir(tgt) if not d.startswith((".", "_"))]
    dests = sorted(p.tables)
    assert dests
    state1 = {d: _snap(p.read_table(d).select("user_id", F.col("event_type").alias("v"), "__op")) for d in dests}
    # restart on the same checkpoint: no new data, no duplicate staging
    p2 = run_once()
    state2 = {d: _snap(p2.read_table(d).select("user_id", F.col("event_type").alias("v"), "__op")) for d in dests}
    assert state1 == state2
    # compaction converges to the eager result
    p2.compact_all()
    eager = CdcPipeline(
        spark, str(tmp_path / "eager"), mode="upsert", key_cols=("user_id",), n_buckets=8
    )
    eager.run_batch(cdc)
    for d in dests:
        assert _snap(
            p2.lazy_for(d).read_stale().select("user_id", F.col("event_type").alias("v"), "__op")
        ) == _snap(eager.read_table(d).select("user_id", F.col("event_type").alias("v"), "__op"))

def test_epoch_replay_protection_survives_compaction(spark, tmp_path):
    """A streaming retry of an already-staged epoch arriving AFTER an
    auto-compaction must be skipped: markers live outside the staging data
    dir, so truncating staging does not forget which epochs committed."""
    batches = _batches(spark)
    base = ParquetTable(
        spark, str(tmp_path / "lazyx"), key_cols=["user_id"], mode="upsert", n_buckets=4
    )
    lazy = StagedUpsertTable(base, staleness_batches=2)
    lazy.apply(batches[0], epoch_id=0)
    lazy.apply(batches[1], epoch_id=1)  # hits staleness -> auto-compacts
    after_compact = _snap(lazy.read_current())
    lazy.apply(batches[1], epoch_id=1)  # late retry straddling the boundary
    assert _snap(lazy.read_current()) == after_compact
    # nothing was re-staged: the staging overlay holds no data files
    assert lazy.staging.read_raw() is None


@pytest.mark.heavy
def test_compaction_merge_is_epoch_marked(spark, tmp_path):
    """A crash between the compaction MERGE and the staging truncation
    replays as a no-op: the MERGE carries a deterministic epoch id derived
    from the monotone stage-seq high-water mark."""
    batches = _batches(spark)
    base = ParquetTable(
        spark, str(tmp_path / "lazym"), key_cols=["user_id"], mode="upsert", n_buckets=4
    )
    lazy = StagedUpsertTable(base, staleness_batches=10)
    lazy.apply(batches[0], epoch_id=0)
    lazy.apply(batches[1], epoch_id=1)
    lazy.compact()
    assert base.epoch_committed("__compact_2")
    state = _snap(lazy.read_current())
    # simulate the crash replay: same staged rows, same high-water mark
    lazy._staged = 2
    lazy.compact()  # staging is empty -> early return; marker still guards
    assert _snap(lazy.read_current()) == state
    # a LATER generation gets a different id, so future compactions run
    lazy.apply(batches[2], epoch_id=2)
    lazy.compact()
    assert base.epoch_committed("__compact_3")
    assert _snap(lazy.read_stale()) == _snap(_eager(spark, tmp_path, batches, 3))
