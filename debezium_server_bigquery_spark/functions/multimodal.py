"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The real decoders (PIL/ffmpeg/torchaudio) are not in this container, so the
decode step is stubbed (``decode_image_stub`` raises NotImplementedError;
``_fake_features`` is the deterministic stand-in) — but everything
Spark-side is real and tested: the schema contract (binary payload +
metadata struct), the Arrow batch path, partition-size-aware batch
iteration, and the downstream join/aggregate behavior of the extracted
features.

Scale notes: mapInPandas streams Arrow record batches — memory is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size;
binary payloads never pass through Python row-by-row.  Feature extraction
parallelizes per partition with zero shuffle; only the (tiny) feature
output shuffles into joins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_bigquery_spark.sources.tables import load_table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)

FRAME_SIZE = 64  # bytes per synthetic "frame"


def decode_image_stub(payload: bytes) -> object:
    """Placeholder for a real image decode (PIL.Image.open on the payload).

    Raises until an imaging library is available; callers route around it
    via the deterministic fake-feature path so the pipeline stays testable.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use the *_stub feature path"
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata struct — the schema
    contract every multimodal table follows (payload: binary,
    meta: struct<content_type, n_bytes, source>)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.octet_length(payload).alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: per Arrow batch, 'decode' each payload.

    Deterministic fake decode = byte length + hex of the first 16 bytes
    (stands in for width/height/codec probing)."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "head_hex": payloads.map(lambda b: bytes(b)[:16].hex().upper()),
                "kind": "stub",
            }
        )


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body emitting multiple rows per input (frame sampling):
    fixed-size chunks of the payload, every other chunk kept (stride 2)."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_hash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            n_frames = (len(data) + FRAME_SIZE - 1) // FRAME_SIZE
            for idx in range(0, n_frames, 2):
                chunk = data[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_bytes"].append(len(chunk))
                # hash contract: md5 over the UPPER-hex rendering of the
                # chunk (DuckDB has no blob substring, so the oracle works
                # in the hex domain; hex() is uppercase in both engines)
                out["frame_hash"].append(
                    hashlib.md5(chunk.hex().upper().encode()).hexdigest()
                )
        yield pd.DataFrame(out)


# --------------------------------------------------------------------------
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow-batched feature extraction -> manifest.
    Oracle-checkable end-to-end because the stub decode is deterministic."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    binary = with_binary_payload(docs)
    feats = binary.mapInPandas(_extract_features, FEATURE_SCHEMA)
    meta = binary.select("doc_id", F.col("meta.n_bytes").alias("meta_bytes"))
    return (
        feats.join(meta, "doc_id")
        .select("doc_id", "n_bytes", "meta_bytes", "head_hex", "kind")
        .orderBy("doc_id")
    )


MULTIMODAL_MANIFEST_SQL = """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  CAST(octet_length(encode(text)) AS INTEGER) AS meta_bytes,
  substr(hex(encode(text)), 1, 32) AS head_hex,
  'stub' AS kind
FROM documents ORDER BY doc_id
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 1 -> N rows per payload through
    mapInPandas.  Chunking and stride are deterministic, so even the
    exploded output is oracle-checkable via blob substrings."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    binary = with_binary_payload(docs)
    return binary.mapInPandas(_sample_frames, FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


MULTIMODAL_FRAMES_SQL = f"""
WITH payloads AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
frames AS (
  SELECT doc_id, unnest(range(0, (n + {FRAME_SIZE} - 1) // {FRAME_SIZE}, 2)) AS frame_idx, hx
  FROM payloads
)
SELECT doc_id, frame_idx,
  length(substr(hx, CAST(frame_idx * {FRAME_SIZE * 2} + 1 AS BIGINT), {FRAME_SIZE * 2})) // 2 AS frame_bytes,
  md5(substr(hx, CAST(frame_idx * {FRAME_SIZE * 2} + 1 AS BIGINT), {FRAME_SIZE * 2})) AS frame_hash
FROM frames ORDER BY doc_id, frame_idx
"""


QUERIES = {
    "multimodal_manifest": multimodal_manifest,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES = {
    "multimodal_manifest": MULTIMODAL_MANIFEST_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAMES_SQL,
}
