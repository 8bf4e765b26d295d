"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
deterministic fake (bytes -> md5-derived pseudo width/height/channels)
behind the same interface a real decoder would use (`decode_image`
raises NotImplementedError unless a decoder backend is importable).
The Spark-side plumbing — binary column handling, schema, Arrow batch
shape, partition-parallel mapInPandas — is real and tested.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; mapInPandas
streams Arrow batches per partition (no driver collect); metadata-only
queries never touch the payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

FEATURE_SCHEMA = ("doc_id long, n_bytes long, width int, height int, "
                  "channels int, format string")


def decode_image(payload: bytes) -> dict:
    """Real decoder entry point — stubbed: no imaging library ships in
    this environment. Swap in PIL/libvips here on a real cluster."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "image decoding requires an imaging backend (e.g. Pillow); "
            "use fake_decode for deterministic tests") from exc
    raise NotImplementedError("real decode path not wired yet")


def fake_decode(payload: bytes) -> dict:
    """Deterministic fake decode: md5-derived pseudo-metadata. Stands in
    for the real decoder so the Arrow/mapInPandas plumbing is testable."""
    digest = hashlib.md5(payload).digest()
    return {
        "width": 64 + digest[0],
        "height": 64 + digest[1],
        "channels": 1 + (digest[2] % 4),
        "format": ("png", "jpeg", "webp", "tiff")[digest[3] % 4],
    }


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "n_bytes", pdf["payload"].str.len().astype("int64"))
        yield out[["doc_id", "n_bytes", "width", "height", "channels", "format"]]


def with_payload(df: DataFrame) -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 text bytes —
    the testdata ships no real media; the column type and downstream
    handling are what matters)."""
    return df.withColumn("payload", F.encode("text", "UTF-8"))


@query(
    "multimodal_binary_stats",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               octet_length(encode(text)) * 8 AS n_bits,
               md5(text) AS payload_md5
        FROM documents
    """,
    doc="Metadata over an opaque binary payload column — length/hash "
        "only, payload never crosses into Python.",
    tags=("multimodal",),
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.bit_length("payload").cast("long").alias("n_bits"),
        F.md5("payload").alias("payload_md5"),
    )


FRAME_BYTES = 256   # fake "frame" size
FRAME_STRIDE = 2    # sample every 2nd frame


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: explode each payload into sampled fixed-size
    'frames' (1-to-N) — the shape of real video frame-sampling, where
    this byte-slicing becomes a container-aware decoder call."""
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
            for idx in range(0, n_frames, FRAME_STRIDE):
                frame = payload[idx * FRAME_BYTES:(idx + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_len"].append(len(frame))
                out["frame_md5"].append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(out)


@query(
    "multimodal_frame_sample",
    oracle=f"""
        -- documents are ASCII (verified), so VARCHAR substring over
        -- text == byte slicing over the utf-8 payload the python
        -- worker sees; DuckDB has no BLOB slicing.
        WITH f AS (
          SELECT doc_id, text,
                 unnest(generate_series(
                   0,
                   CAST(CEIL(length(text) / {FRAME_BYTES}.0) AS INT) - 1,
                   {FRAME_STRIDE})) AS frame_idx
          FROM documents
        )
        SELECT doc_id, frame_idx,
               length(substring(text, frame_idx * {FRAME_BYTES} + 1,
                                {FRAME_BYTES})) AS frame_len,
               md5(substring(text, frame_idx * {FRAME_BYTES} + 1,
                             {FRAME_BYTES})) AS frame_md5
        FROM f
    """,
    doc="Video-style frame sampling over binary payloads: 1-to-N "
        "mapInPandas explode (every 2nd 256-byte frame). The fake "
        "byte-slicing sampler is deliberately SQL-expressible so the "
        "python/Arrow plumbing itself is oracle-verified; a real "
        "decoder swaps into sample_frames unchanged.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(load(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx int, frame_len int, frame_md5 string")


def resize_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary -> smaller binary (1-to-1) — the shape
    of a real thumbnail/resample step (here: keep the first half)."""
    for pdf in batches:
        resized = [bytes(p[:len(p) // 2]) for p in pdf["payload"]]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].values,
            "orig_bytes": [len(p) for p in pdf["payload"]],
            "resized_bytes": [len(r) for r in resized],
            "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
        })


@query(
    "multimodal_resize",
    oracle="""
        -- ASCII text (verified): VARCHAR ops == byte ops; DuckDB has
        -- no BLOB slicing.
        SELECT doc_id,
               length(text) AS orig_bytes,
               length(text) // 2 AS resized_bytes,
               md5(substring(text, 1, length(text) // 2)) AS resized_md5
        FROM documents
    """,
    doc="Image-resize-shaped binary transform: 1-to-1 mapInPandas over "
        "Arrow batches, deterministic fake (first half of the payload) "
        "so the oracle can verify the python path byte-for-byte.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(load(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(
        resize_payloads,
        schema="doc_id long, orig_bytes int, resized_bytes int, resized_md5 string")


@query(
    "multimodal_features",
    oracle=None,  # Arrow/mapInPandas path is genuinely non-SQL; the
    # deterministic fake decoder is unit-tested in tests/test_multimodal.py.
    doc="Arrow-batched feature extraction over binary payloads via "
        "mapInPandas (decode step stubbed deterministically; plumbing "
        "— schema, batching, partition parallelism — is real).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(load(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(extract_features, schema=FEATURE_SCHEMA)
