"""S6 — destination-table management over parquet (SURVEY §2.1).

The reference creates/evolves BigQuery tables with month partitioning on
``__ts_ms`` and PK+ts clustering (StreamBigqueryChangeConsumer.java:262-345,
BatchBigqueryChangeConsumer.java:69-77,103-110; BaseRecordConverter:181-223).

Spark-native equivalent: a directory-backed parquet table.

- **Append tables** partition by ``__part_month = date_format(__ts_ms,
  'yyyy-MM')`` -> readers get partition pruning on time predicates, the
  analog of BigQuery time partitioning.
- **Upsert tables** partition by a stable key-hash bucket ``__kb =
  pmod(xxhash64(pk...), n_buckets)``.  A primary key always lands in the
  same partition, so a MERGE rewrites only the buckets present in the batch
  and never has to chase a key across time partitions.  (Month partitioning
  is wrong for upsert targets: an update that moves a key's ``__ts_ms`` to a
  new month would strand the old version in the old partition.)
- **Clustering** -> ``sortWithinPartitions(pk..., __source_ts_ms)`` before
  write, so parquet row-group min/max stats give data skipping on PK
  lookups — the BigQuery clustering analog.
- **Schema evolution** -> ``unionByName(allowMissingColumns=True)`` against
  the live schema + ``mergeSchema`` on read (reference: stream mode ALTERs
  the table :314-345; batch mode sets ALLOW_FIELD_ADDITION :72-77).

Exactly-once: appends are guarded by an epoch marker file per
(table, epoch_id) — replaying a failed micro-batch skips already-committed
epochs, the parquet-native version of Delta's ``txnAppId`` guard
(risk noted in SURVEY §7).
"""

from __future__ import annotations

import json
import logging
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.operators.retry import (
    DEFAULT_POLICY,
    RetryPolicy,
    with_retry,
)

log = logging.getLogger(__name__)

PART_MONTH = "__part_month"
KEY_BUCKET = "__kb"

# Time-partition granularities, parity with the reference's partition-type
# HOUR/DAY/MONTH/YEAR (BatchConsumerConfig.java:39-49,
# StreamConsumerConfig.java:38-48 — BigQuery TimePartitioning types).
# Granularity-specific column names keep mixed-granularity writes from
# silently colliding in one partition column.
PART_FORMATS = {
    "YEAR": ("__part_year", "yyyy"),
    "MONTH": (PART_MONTH, "yyyy-MM"),
    "DAY": ("__part_day", "yyyy-MM-dd"),
    "HOUR": ("__part_hour", "yyyy-MM-dd-HH"),
}


class ParquetTable:
    """A destination table: parquet directory + engine-tracked metadata.

    Metadata (primary key, partition mode, clustering columns) lives in
    ``_engine_meta.json`` beside the data — Spark does not enforce
    constraints, but the engine tracks PK like the reference declares
    BigQuery ``tableConstraints`` (BaseRecordConverter.java:181-196).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        key_cols: Sequence[str] = (),
        mode: str = "append",  # "append" (time parts) | "upsert" (key buckets)
        n_buckets: int = 32,
        clustering_field: str = "__source_ts_ms",
        partition_type: str = "MONTH",  # YEAR | MONTH | DAY | HOUR
        partition_field: str = "__ts_ms",
        retry_policy: RetryPolicy = DEFAULT_POLICY,
        allow_field_addition: bool = True,
        create_if_needed: bool = True,
        zorder_cols: Sequence[str] = (),
    ):
        if partition_type not in PART_FORMATS:
            raise ValueError(
                f"partition_type must be one of {sorted(PART_FORMATS)}, "
                f"got {partition_type!r}"
            )
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.mode = mode
        self.n_buckets = n_buckets
        self.clustering_field = clustering_field
        self.partition_type = partition_type
        self.partition_field = partition_field
        # T7 — bounded driver-side retry around write actions; Spark task
        # retries cover executor failures, this covers whole-action faults
        # (operators/retry.py budgets mirror ConsumerUtil.java:134-147).
        self.retry_policy = retry_policy
        # Schema-evolution gate — allow-field-addition (batch default true,
        # BatchConsumerConfig.java:51-53; stream default false,
        # StreamConsumerConfig.java:52-54).  When off, new batch columns are
        # dropped at write, matching a BigQuery append against a table whose
        # schema was never ALTERed (the un-schema'd fields don't land).
        self.allow_field_addition = allow_field_addition
        # create-if-needed (StreamConsumerConfig.java:34-36): when off, a
        # write against a missing table fails instead of creating it.
        self.create_if_needed = create_if_needed
        # Z-order clustering (operators/zorder.py): when set, batches are
        # laid out within their partitions by a bit-interleaved z-value
        # over these columns instead of the lexicographic clustering sort,
        # so row-group stats prune on every listed column.  Ranges come
        # from the batch itself — per-file ordering is all row-group
        # skipping needs.
        self.zorder_cols = list(zorder_cols)
        if self.zorder_cols:
            from debezium_server_bigquery_spark.operators.zorder import (
                validate_zorder,
            )

            # fail at construction, not on the first write
            validate_zorder(self.zorder_cols)
        self._zcache: DataFrame | None = None

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "ParquetTable":
        """Reconstruct a table handle from its stored ``_engine_meta.json``
        — what an out-of-band maintenance command (CLI ``optimize``) uses
        to operate on a table the pipeline created."""
        with open(os.path.join(path, "_engine_meta.json"), encoding="utf-8") as fh:
            meta = json.load(fh)
        return cls(
            spark,
            path,
            key_cols=tuple(meta.get("key_cols", ())),
            mode=meta.get("mode", "append"),
            n_buckets=meta.get("n_buckets", 32),
            # clustering_field is stored explicitly — the derived
            # "clustering" list also embeds PK columns, so it cannot be
            # used to recover the field; without this an `optimize`
            # compaction would re-sort rewritten partitions with the
            # default clustering even on custom-clustered tables.
            clustering_field=meta.get("clustering_field", "__source_ts_ms"),
            partition_type=meta.get("partition_type", "MONTH"),
            partition_field=meta.get("partition_field", "__ts_ms"),
            allow_field_addition=meta.get("allow_field_addition", True),
            create_if_needed=meta.get("create_if_needed", True),
            zorder_cols=tuple(meta.get("zorder", ())),
        )

    # -- metadata ----------------------------------------------------------
    @property
    def meta_path(self) -> str:
        return os.path.join(self.path, "_engine_meta.json")

    def exists(self) -> bool:
        return os.path.exists(self.meta_path)

    def _write_meta(self, schema_json: str) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self.meta_path, "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "key_cols": self.key_cols,
                    "mode": self.mode,
                    "n_buckets": self.n_buckets,
                    "partition_type": self.partition_type,
                    "partition_field": self.partition_field,
                    "clustering": self.clustering_cols(),
                    "clustering_field": self.clustering_field,
                    "allow_field_addition": self.allow_field_addition,
                    "create_if_needed": self.create_if_needed,
                    "zorder": self.zorder_cols,
                    "schema": json.loads(schema_json),
                },
                fh,
            )

    def persist_layout(self) -> None:
        """Rewrite stored metadata from this handle's CURRENT settings
        without touching data files — how an optimize-time z-order
        override becomes durable for future ``open()`` calls.  No-op on a
        table that has not been created yet (first write stores it)."""
        if not self.exists():
            return
        with open(self.meta_path, encoding="utf-8") as fh:
            meta = json.load(fh)
        self._write_meta(json.dumps(meta["schema"]))

    def clustering_cols(self) -> list[str]:
        """<=3 PK columns + clustering field — BigQuery's 4-field limit,
        BaseRecordConverter.java:218-221."""
        cols = self.key_cols[:3]
        if self.clustering_field:
            cols = cols + [self.clustering_field]
        return cols

    # -- partitioning ------------------------------------------------------
    def partition_col(self) -> str:
        if self.mode == "upsert":
            return KEY_BUCKET
        return PART_FORMATS[self.partition_type][0]

    def with_partition_col(self, df: DataFrame) -> DataFrame:
        if self.mode == "upsert":
            if not self.key_cols:
                raise ValueError("upsert table requires key columns")
            bucket = F.pmod(
                F.xxhash64(*[F.col(c) for c in self.key_cols]), F.lit(self.n_buckets)
            ).cast("int")
            return df.withColumn(KEY_BUCKET, bucket)
        part_col, fmt = PART_FORMATS[self.partition_type]
        if self.partition_field not in df.columns:
            return df.withColumn(part_col, F.lit("unknown"))
        ts = F.col(self.partition_field)
        from pyspark.sql import types as T

        if isinstance(
            df.schema[self.partition_field].dataType, (T.LongType, T.IntegerType)
        ):
            # raw (pre-coercion) rows carry epoch-ms; partition value must be
            # identical either way so a table can mix coerced/raw batches.
            ts = F.timestamp_millis(ts)
        part = F.date_format(ts, fmt)
        return df.withColumn(part_col, F.coalesce(part, F.lit("unknown")))

    # -- io ----------------------------------------------------------------
    def read(self) -> DataFrame:
        try:
            df = self.spark.read.option("mergeSchema", "true").parquet(self.path)
        except Exception:
            # Table exists but holds zero data files (e.g. a MERGE deleted
            # every row): serve an empty frame with the last-known schema.
            if not self.exists():
                raise
            from pyspark.sql import types as T

            with open(self.meta_path, "r", encoding="utf-8") as fh:
                meta = json.load(fh)
            return self.spark.createDataFrame(
                [], T.StructType.fromJson(meta["schema"])
            )
        return df.drop(self.partition_col())

    def read_raw(self) -> DataFrame | None:
        """Live rows including the partition column, or None if the table
        holds no data files yet."""
        try:
            return self.spark.read.option("mergeSchema", "true").parquet(self.path)
        except Exception:
            return None

    def _epoch_marker(self, epoch_id: int | str | None) -> str | None:
        if epoch_id is None:
            return None
        return os.path.join(self.path, "_epochs", f"{epoch_id}.json")

    def epoch_committed(self, epoch_id: int | str | None) -> bool:
        marker = self._epoch_marker(epoch_id)
        return marker is not None and os.path.exists(marker)

    def _commit_epoch(self, epoch_id: int | str | None, rows: int) -> None:
        marker = self._epoch_marker(epoch_id)
        if marker is None:
            return
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        # Atomic publish (tmp + rename): epoch_committed checks existence,
        # so a crash mid-write must never leave a truncated marker that
        # reads as committed; metrics() readers also json.load these.
        tmp = f"{marker}.tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"epoch": epoch_id, "rows": rows}, fh)
        os.replace(tmp, marker)

    def epoch_metrics(self) -> list[dict]:
        """Committed epoch markers as records ``{"epoch": str, "rows": int}``
        — the engine's consumer-metrics surface.  The reference polls
        Debezium MBeans for processed-row counts (MaxBatchSizeWait reads
        them, docs list the JMX names); here every committed epoch already
        persisted the row count it observed DURING the write job, so the
        metrics are exact, free, and survive restarts.  Driver-side
        listing of O(#epochs) small files — metadata, not data.
        MERGE epochs record rows = -1 (the post-merge bucket state is not
        a per-epoch row count; operators/merge.py commits the marker for
        idempotency only)."""
        d = os.path.join(self.path, "_epochs")
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(d, name), "r", encoding="utf-8") as fh:
                    rec = json.load(fh)
            except (OSError, ValueError):
                # pre-atomic-write legacy truncation, or a marker deleted
                # between listdir and open: a broken metrics row must not
                # take down the whole surface.
                continue
            out.append({"epoch": str(rec.get("epoch")), "rows": int(rec.get("rows", 0))})
        return out

    def _cluster_sort(self, df: DataFrame) -> DataFrame:
        zcols = [c for c in self.zorder_cols if c in df.columns]
        if self.zorder_cols and len(zcols) < len(self.zorder_cols):
            # layout silently degrading is hard to diagnose — say so
            missing = sorted(set(self.zorder_cols) - set(zcols))
            log.warning(
                "z-order columns %s missing from batch for %s; "
                "falling back to lexicographic clustering",
                missing,
                self.path,
            )
        if len(zcols) >= 2:
            from debezium_server_bigquery_spark.operators.zorder import (
                column_ranges,
                zvalue,
            )

            # The ranges aggregate is an ACTION on the not-yet-written
            # batch plan; persist so the write that follows reuses the
            # computed rows instead of re-running the whole upstream plan
            # (for a MERGE that plan is the full join).  Released by the
            # caller via _release_zcache after the write action.
            df = df.persist()
            self._zcache = df
            ranges = with_retry(
                lambda: column_ranges(df, zcols),
                policy=self.retry_policy,
                describe=f"zorder-ranges {self.path}",
            )
            return (
                df.withColumn("__zv", zvalue(df, zcols, ranges))
                .sortWithinPartitions("__zv")
                .drop("__zv")
            )
        cols = [c for c in self.clustering_cols() if c in df.columns]
        return df.sortWithinPartitions(*cols) if cols else df

    def _release_zcache(self) -> None:
        if self._zcache is not None:
            try:
                self._zcache.unpersist()
            finally:
                self._zcache = None

    def _write_append(self, out: DataFrame) -> None:
        """The raw append write action (separable for fault injection)."""
        out.write.mode("append").partitionBy(self.partition_col()).parquet(self.path)

    def guard_create(self, live_exists: bool) -> None:
        """create-if-needed parity (StreamBigqueryChangeConsumer.java:291).

        A table whose every row was deleted still EXISTS (its meta file
        survives an all-bucket delete — ``read()`` serves it as an empty
        frame), so existence is ``self.exists() or live data present``.
        """
        if not (live_exists or self.exists()) and not self.create_if_needed:
            raise ValueError(
                f"table {self.path} does not exist and create-if-needed is false"
            )

    def known_columns(self, live: DataFrame | None) -> list[str] | None:
        """Column names the table currently knows: live data if present,
        else the meta-recorded schema (an emptied table keeps its schema);
        None when the table has never been created."""
        if live is not None:
            return list(live.columns)
        if self.exists():
            with open(self.meta_path, "r", encoding="utf-8") as fh:
                meta = json.load(fh)
            return [f["name"] for f in meta["schema"]["fields"]]
        return None

    def restrict_to_live(self, df: DataFrame, live: DataFrame | None) -> DataFrame:
        """Drop columns the table does not know when field addition is
        disabled (BatchBigqueryChangeConsumer.java:72,
        StreamBigqueryChangeConsumer.java:300 gate the schema update)."""
        if self.allow_field_addition:
            return df
        cols = self.known_columns(live)
        if cols is None:
            return df
        known = set(cols) | {self.partition_col()}
        extra = [c for c in df.columns if c not in known]
        return df.drop(*extra) if extra else df

    def append(self, df: DataFrame, epoch_id: int | str | None = None) -> None:
        """S3 analog — append a uniform-schema batch, evolving the table
        schema if the batch adds columns.

        The write runs under the T7 bounded-retry budget.  A retried append
        is safe: Spark's output committer only publishes files at job
        commit, so a failed attempt leaves nothing visible, and a replay of
        an already-committed epoch is skipped by the marker check.

        The epoch marker records the exact row count written, measured by
        ``DataFrame.observe`` DURING the write job — the consumer-metrics
        analog (the reference polls Debezium MBeans for processed counts)
        with zero extra pass over the data.
        """
        if self.epoch_committed(epoch_id):
            return
        from pyspark.sql import Observation

        out = self.with_partition_col(df)
        live = self.read_raw() if self.exists() else None
        self.guard_create(live is not None)
        out = self.restrict_to_live(out, live)
        if live is not None:
            missing = [f for f in live.schema.fields if f.name not in out.columns]
            for f in missing:
                out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
        out = self._cluster_sort(out)

        def attempt() -> Observation:
            # fresh Observation per attempt: one Observation serves exactly
            # one action, and a failed job must not leave a stale metric.
            o = Observation()
            self._write_append(out.observe(o, F.count(F.lit(1)).alias("rows")))
            return o

        try:
            obs = with_retry(
                attempt, policy=self.retry_policy, describe=f"append {self.path}"
            )
        finally:
            self._release_zcache()
        # Record what was actually written (restriction may have dropped
        # batch columns; evolution may have added live ones).
        self._write_meta(out.drop(self.partition_col()).schema.json())
        self._commit_epoch(epoch_id, int(obs.get["rows"]))

    def partition_file_counts(self) -> dict[str, int]:
        """Data-file count per partition directory (driver-side listing —
        the metastore-catalog analog; partition count, not row count)."""
        out: dict[str, int] = {}
        prefix = f"{self.partition_col()}="
        if not os.path.isdir(self.path):
            return out
        for d in os.listdir(self.path):
            full = os.path.join(self.path, d)
            if d.startswith(prefix) and os.path.isdir(full):
                out[d] = sum(
                    1 for f in os.listdir(full) if f.endswith(".parquet")
                )
        return out

    def compact(
        self, max_files_per_partition: int = 8, files_per_partition: int = 1
    ) -> int:
        """Rewrite fragmented partitions into few large files.

        Every micro-batch append adds task-count files per touched
        partition; BigQuery compacts its write-optimized storage in the
        background (the reference never sees this cost), a parquet table
        must do it explicitly or scans drown in file-open overhead at
        scale.  One pass: select partitions holding more than
        ``max_files_per_partition`` data files, shuffle them once on the
        partition column (plus a bounded salt when one file per partition
        would be too big), and swap the rewritten directories in via the
        same staged-overwrite path MERGE uses — readers never observe a
        half-compacted partition.  Returns the number of partitions
        compacted.
        """
        fragged = [
            d
            for d, n in self.partition_file_counts().items()
            if n > max_files_per_partition
        ]
        if not fragged:
            return 0
        part_col = self.partition_col()
        values = [d.split("=", 1)[1] for d in fragged]
        raw = self.read_raw()
        if raw is None:
            return 0
        subset = raw.filter(F.col(part_col).cast("string").isin(values))
        if files_per_partition > 1:
            salt = F.pmod(
                F.xxhash64(*[F.col(c) for c in (self.key_cols or subset.columns[:1])]),
                F.lit(files_per_partition),
            )
            subset = subset.repartition(F.col(part_col), salt)
        else:
            subset = subset.repartition(F.col(part_col))
        self.overwrite_partitions(subset, expected_partitions=values)
        return len(values)

    def expire_partitions(self, keep_from: str) -> list[str]:
        """Drop time partitions strictly older than ``keep_from`` — the
        BigQuery time-partition *expiration* analog for append (audit-log)
        tables.  ``keep_from`` is a partition value in this table's
        granularity format (e.g. ``'2024-01'`` for MONTH): lexicographic
        comparison is chronological for every PART_FORMATS pattern.  A
        metadata-only operation (directory drops — at cluster scale, the
        metastore partition-drop); returns the expired partition values.
        Upsert (key-bucketed) tables refuse: their partitions are not time.
        """
        if self.mode == "upsert":
            raise ValueError("expire_partitions applies to time-partitioned tables")
        import shutil

        expired = []
        for d in sorted(self.partition_file_counts()):
            value = d.split("=", 1)[1]
            if value != "unknown" and value < keep_from:
                shutil.rmtree(os.path.join(self.path, d))
                expired.append(value)
        return expired

    def backfill_time_partitions(
        self, df: DataFrame, partitions: Sequence[str]
    ) -> None:
        """Corrective rewrite of the named TIME partitions — the BigQuery
        partition-replacement (load with a partition decorator) analog for
        reprocessing: late corrections land by replacing whole partitions,
        untouched partitions never move.  ``df`` carries the table's
        logical columns; rows falling outside ``partitions`` are ignored
        (a correction feed may span more history than is being refilled).
        Upsert tables refuse — their partitions are key buckets, and the
        corrective path there is MERGE."""
        if self.mode == "upsert":
            raise ValueError(
                "backfill_time_partitions applies to time-partitioned tables"
            )
        part_col = self.partition_col()
        out = self.with_partition_col(df).filter(
            F.col(part_col).isin(list(partitions))
        )
        self.overwrite_partitions(out, expected_partitions=partitions)

    def overwrite_partitions(
        self, df: DataFrame, expected_partitions: Sequence[object] = ()
    ) -> None:
        """Replace whole partitions with the content of ``df`` — parquet-
        native copy-on-write, Hive ``INSERT OVERWRITE ... PARTITION`` style.

        ``df`` may (and in a MERGE, does) read from this very table, so a
        direct in-place dynamic overwrite would delete input files mid-scan.
        Instead the result is fully materialized into a staging directory
        first, then partition directories are swapped in — at cluster scale
        the swap is the metastore's partition-location update, here a local
        rename.  A partition the caller intended to rewrite that came back
        empty (``expected_partitions``) is dropped — "replace with nothing"
        (the MERGE deleted every key in that bucket).
        """
        import shutil
        import uuid

        part_col = self.partition_col()
        staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex[:8]}")
        out = self._cluster_sort(df)
        # mode("overwrite") makes a retried staging write idempotent.
        try:
            with_retry(
                lambda: out.write.mode("overwrite").partitionBy(part_col).parquet(staging),
                policy=self.retry_policy,
                describe=f"stage-overwrite {self.path}",
            )
        finally:
            self._release_zcache()
        try:
            staged = {
                d
                for d in os.listdir(staging)
                if d.startswith(f"{part_col}=") and os.path.isdir(os.path.join(staging, d))
            }

            def swap() -> None:
                # Idempotent per directory: a partition already moved by a
                # previous attempt (source gone) is skipped, so the T7 retry
                # wrapper can safely replay a partially-completed swap —
                # the FS-hiccup window between overwrite and marker commit.
                for d in staged:
                    src = os.path.join(staging, d)
                    target = os.path.join(self.path, d)
                    if not os.path.exists(src):
                        continue
                    if os.path.exists(target):
                        shutil.rmtree(target)
                    os.replace(src, target)
                for value in expected_partitions:
                    d = f"{part_col}={value}"
                    if d not in staged:
                        stale = os.path.join(self.path, d)
                        if os.path.exists(stale):
                            shutil.rmtree(stale)

            with_retry(
                swap, policy=self.retry_policy, describe=f"swap {self.path}"
            )
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        self._write_meta(df.drop(part_col).schema.json())
