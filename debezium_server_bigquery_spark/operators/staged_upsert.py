"""Lazy upsert — BigQuery ``max_staleness`` parity (throughput mode).

The reference does NOT merge per batch: it appends ``_CHANGE_TYPE``-tagged
rows via the Storage Write API and lets BigQuery's CDC engine apply
upserts/deletes in the background, bounded by the table's
``max_staleness`` option (StreamRecordConverter.java:79-93; test
StreamBigqueryChangeConsumerMysqlUpsertTest.java:68-78).  The eager
per-batch MERGE in operators/merge.py is strictly stronger; this module
adds the reference's actual cost model for high-throughput streams:

- ``apply`` — per-batch work is ONE bucketed append of the deduplicated
  batch into a staging area (no target scan, no rewrite).  At 100 TB/day
  this is the difference between O(batch) and O(batch + touched buckets)
  per micro-batch.
- ``compact`` — every ``staleness_batches`` batches (== max_staleness),
  one MERGE folds all staged rows into the base table and truncates
  staging: merge cost is amortized over N batches, and the per-bucket
  rewrite still prunes to the buckets staged rows touch.
- ``read_current`` — exact up-to-the-instant upsert semantics at any
  time: base ∪ staging, one last-writer-wins hash aggregation.  This is
  *stronger* than BigQuery reads under max_staleness, which may serve
  stale state; readers that can tolerate staleness read the base table
  directly (the true parity read path).

Ordering across staged batches follows the same comparator as the eager
path — ``(order_col, op-priority)`` with a monotone ``__stage_seq`` tie
break so a later micro-batch beats an earlier one on exact ties, exactly
like consecutive eager merges (reference ConcurrentHashMap.merge keeps
the new value on ties, StreamBigqueryChangeConsumer.java:212-218).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.operators.dedup import dedup_last_writer
from debezium_server_bigquery_spark.operators.merge import merge_upsert
from debezium_server_bigquery_spark.operators.table import ParquetTable

_STAGE_SEQ = "__stage_seq"
_SRC_RANK = "__src_rank"


class StagedUpsertTable:
    """A base upsert table plus an append-only staging overlay."""

    def __init__(
        self,
        table: ParquetTable,
        *,
        staleness_batches: int = 4,
        keep_deletes: bool = False,
        order_col: str = "__source_ts_ns",
        tiebreak: tuple[str, ...] = (),
    ):
        if not table.key_cols:
            raise ValueError("lazy upsert requires key_cols (A4: use append)")
        if staleness_batches < 1:
            raise ValueError("staleness_batches must be >= 1")
        self.table = table
        self.staleness_batches = staleness_batches
        self.keep_deletes = keep_deletes
        self.order_col = order_col
        self.tiebreak = tuple(tiebreak)
        # Sibling directory with a "_" prefix: table listings (and the
        # pipeline's destination walk) skip underscore-prefixed entries, so
        # the staging area never masquerades as a destination table.
        base = table.path.rstrip("/")
        self._staging_path = os.path.join(
            os.path.dirname(base), "_staging_" + os.path.basename(base)
        )
        # Durable metadata OUTSIDE the staging data dir: epoch markers and
        # the stage-seq high-water mark must survive compaction (which
        # truncates staging wholesale).  Markers inside staging would lose
        # exactly-once replay protection across a compaction boundary: a
        # streaming retry of an already-staged epoch arriving just after an
        # auto-compact would re-stage and re-merge the batch.
        self._meta_dir = os.path.join(
            os.path.dirname(base), "_stagemeta_" + os.path.basename(base)
        )
        self.staging = self._new_staging()
        self._staged = self._staged_on_disk()

    def _new_staging(self) -> ParquetTable:
        return ParquetTable(
            self.table.spark,
            self._staging_path,
            key_cols=self.table.key_cols,
            mode="upsert",
            n_buckets=self.table.n_buckets,
            clustering_field=self.table.clustering_field,
        )

    # -- durable staging metadata (survives compaction truncation) ---------
    def _stage_marker(self, epoch_id: int | str | None) -> str | None:
        if epoch_id is None:
            return None
        return os.path.join(self._meta_dir, "_epochs", f"{epoch_id}.json")

    def stage_epoch_committed(self, epoch_id: int | str | None) -> bool:
        marker = self._stage_marker(epoch_id)
        return marker is not None and os.path.exists(marker)

    def _commit_stage_epoch(self, epoch_id: int | str | None) -> None:
        marker = self._stage_marker(epoch_id)
        if marker is None:
            return
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        # Atomic publish — stage_epoch_committed checks existence, so a
        # crash mid-write must not leave a truncated marker that reads as
        # committed (same contract as ParquetTable._commit_epoch).
        tmp = f"{marker}.tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"epoch": epoch_id, "seq": self._staged}, fh)
        os.replace(tmp, marker)

    @property
    def _seq_path(self) -> str:
        return os.path.join(self._meta_dir, "next_seq.json")

    def _persist_seq(self) -> None:
        os.makedirs(self._meta_dir, exist_ok=True)
        with open(self._seq_path, "w", encoding="utf-8") as fh:
            json.dump({"next_seq": self._staged}, fh)

    def _staged_on_disk(self) -> int:
        """Recover the stage counter after a restart.

        The counter is GLOBALLY monotone (never reset by compaction) so a
        compaction's MERGE epoch id derived from it is unique per
        generation; recovery takes the max of the persisted high-water mark
        and what the staged rows themselves say.
        """
        persisted = 0
        try:
            with open(self._seq_path, encoding="utf-8") as fh:
                persisted = int(json.load(fh)["next_seq"])
        except (OSError, ValueError, KeyError):
            pass
        raw = self.staging.read_raw() if self.staging.exists() else None
        if raw is None or _STAGE_SEQ not in raw.columns:
            return persisted
        # bounded-collect: one-row max aggregate (O(1) scalar)
        row = raw.agg(F.max(_STAGE_SEQ)).collect()[0][0]
        return persisted if row is None else max(persisted, int(row) + 1)

    # -- write path ---------------------------------------------------------
    def apply(self, batch: DataFrame, epoch_id: int | str | None = None) -> None:
        """Stage one micro-batch; auto-compact at the staleness bound."""
        if self.stage_epoch_committed(epoch_id):
            return
        deduped = dedup_last_writer(
            batch, self.table.key_cols, order_col=self.order_col, tiebreak=self.tiebreak
        ).withColumn(_STAGE_SEQ, F.lit(self._staged))
        # Marker lives in the durable meta dir, not the staging data dir; a
        # crash between append and marker replays the append, which
        # converges (identical rows, identical seq -> same LWW winner).
        self.staging.append(deduped, epoch_id=None)
        self._staged += 1
        self._persist_seq()
        self._commit_stage_epoch(epoch_id)
        if self._pending_batches() >= self.staleness_batches:
            self.compact()

    def _pending_batches(self) -> int:
        """Distinct staged (uncompacted) batch count, from the seq counter
        vs the last compaction's high-water mark."""
        return self._staged - self._compacted_through()

    @property
    def _compacted_path(self) -> str:
        return os.path.join(self._meta_dir, "compacted_through.json")

    def _compacted_through(self) -> int:
        try:
            with open(self._compacted_path, encoding="utf-8") as fh:
                return int(json.load(fh)["through_seq"])
        except (OSError, ValueError, KeyError):
            return 0

    def compact(self) -> None:
        """Fold all staged rows into the base table; truncate staging.

        The MERGE carries a deterministic epoch id derived from the
        (globally monotone) stage-seq high-water mark, so a crash between
        the MERGE and the staging truncation replays as a no-op MERGE on
        restart instead of re-applying the staged rows.
        """
        staged = self.staging.read_raw() if self.staging.exists() else None
        if staged is None or not staged.head(1):
            return
        winner = dedup_last_writer(
            staged,
            self.table.key_cols,
            order_col=self.order_col,
            tiebreak=(_STAGE_SEQ, *self.tiebreak),
        ).drop(_STAGE_SEQ, self.staging.partition_col())
        merge_upsert(
            self.table,
            winner,
            keep_deletes=self.keep_deletes,
            order_col=self.order_col,
            tiebreak=self.tiebreak,
            epoch_id=f"__compact_{self._staged}",
        )
        shutil.rmtree(self.staging.path, ignore_errors=True)
        os.makedirs(self._meta_dir, exist_ok=True)
        with open(self._compacted_path, "w", encoding="utf-8") as fh:
            json.dump({"through_seq": self._staged}, fh)
        self.staging = self._new_staging()

    # -- read paths ---------------------------------------------------------
    def read_stale(self) -> DataFrame:
        """The reference's read under max_staleness: base table only."""
        return self.table.read()

    def read_current(self) -> DataFrame:
        """Exact current state: base overlaid with staged rows."""
        base = self.table.read_raw() if self.table.exists() else None
        staged = self.staging.read_raw() if self.staging.exists() else None
        if staged is None or not staged.head(1):
            return self.read_stale()
        staged = staged.withColumn(_SRC_RANK, F.lit(1))
        if base is not None:
            base = base.withColumn(_SRC_RANK, F.lit(0)).withColumn(
                _STAGE_SEQ, F.lit(-1)
            )
            merged = base.unionByName(staged, allowMissingColumns=True)
        else:
            merged = staged
        winner = dedup_last_writer(
            merged,
            self.table.key_cols,
            order_col=self.order_col,
            tiebreak=(_SRC_RANK, _STAGE_SEQ, *self.tiebreak),
        )
        if not self.keep_deletes:
            winner = winner.filter(F.col("__op") != "d")
        return winner.drop(
            _SRC_RANK, _STAGE_SEQ, self.staging.partition_col()
        )
