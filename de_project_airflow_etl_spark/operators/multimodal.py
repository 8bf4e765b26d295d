"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

``decode_image`` is a REAL, library-free image-header parser (PNG IHDR
/ JPEG SOF marker scan / GIF logical-screen descriptor) — it reads
width/height/channels/format from actual file bytes per the format
specs, no imaging library required. The testdata ships no media, so
``synth_payload`` deterministically renders each document as a real
minimal PNG or JPEG byte stream; the feature query round-trips
synth -> parse, which lets a closed-form SQL oracle verify the parser
(offsets, byte order, marker walking) bit-for-bit.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; mapInPandas
streams Arrow batches per partition (no driver collect); metadata-only
queries never touch the payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.registry import query
from de_project_airflow_etl_spark.tables import load

FEATURE_SCHEMA = ("doc_id long, n_bytes long, width int, height int, "
                  "channels int, format string")

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (spec §11.2.2); palette images carry
# one index sample per pixel.
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# SOF0-SOF3, SOF5-SOF7, SOF9-SOF11, SOF13-SOF15 all share the frame
# header layout (precision u8, height u16be, width u16be, ncomp u8).
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # not DHT/JPG/DAC
_JPEG_STANDALONE = frozenset(range(0xD0, 0xD8)) | {0x01}  # RSTn, TEM


def decode_image(payload: bytes) -> dict:
    """Parse image metadata from real file bytes — pure Python, no
    imaging library.

    Supports PNG (IHDR chunk), JPEG (first SOF frame header, walking
    marker segments), and GIF (logical screen descriptor). Returns
    ``{width, height, channels, format}``; raises ``ValueError`` for
    unsupported or malformed payloads.
    """
    if payload[:8] == PNG_SIGNATURE:
        if payload[12:16] != b"IHDR" or len(payload) < 26:
            raise ValueError("malformed PNG: first chunk is not IHDR")
        width, height = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        if color_type not in _PNG_CHANNELS:
            raise ValueError(f"malformed PNG: color type {color_type}")
        return {"width": width, "height": height,
                "channels": _PNG_CHANNELS[color_type], "format": "png"}
    if payload[:2] == b"\xff\xd8":  # SOI
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                raise ValueError(f"malformed JPEG: no marker at {i}")
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI before any SOF
                break
            if marker in _JPEG_STANDALONE or marker == 0xFF:
                i += 1 if marker == 0xFF else 2  # fill bytes / standalone
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
            if seg_len < 2:
                raise ValueError(f"malformed JPEG: segment length "
                                 f"{seg_len} at {i}")
            if marker in _JPEG_SOF_MARKERS:
                # SOF payload: precision u8 @ i+4, height/width u16be
                # @ i+5..i+8, ncomp u8 @ i+9 — bounds-check so a
                # truncated stream is a ValueError like every other
                # malformed case, not a struct.error
                if i + 10 > len(payload):
                    raise ValueError("truncated JPEG: short SOF header")
                height, width = struct.unpack(">HH", payload[i + 5:i + 9])
                n_comp = payload[i + 9]
                return {"width": width, "height": height,
                        "channels": n_comp, "format": "jpeg"}
            i += 2 + seg_len
        raise ValueError("malformed JPEG: no SOF frame header")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF: short screen descriptor")
        width, height = struct.unpack("<HH", payload[6:10])
        return {"width": width, "height": height,
                "channels": 3, "format": "gif"}
    raise ValueError("unsupported image format")


def encode_png_header(width: int, height: int, color_type: int = 2,
                      bit_depth: int = 8) -> bytes:
    """A real, minimal PNG byte stream: signature + IHDR (with correct
    CRC32) + empty IEND. 45 bytes. Any spec-conforming header reader —
    including :func:`decode_image` — parses it."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, 0)
    return (PNG_SIGNATURE
            + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
            + struct.pack(">I", 0) + b"IEND"
            + struct.pack(">I", zlib.crc32(b"IEND")))


def encode_jpeg_header(width: int, height: int,
                       n_components: int = 3) -> bytes:
    """A real, minimal JPEG byte stream: SOI + APP0/JFIF + SOF0 + EOI.
    35 bytes for 1 component, 41 for 3 (the APP0 segment forces the
    parser to actually walk markers, not just read a fixed offset)."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof = (struct.pack(">BHHB", 8, height, width, n_components)
           + b"".join(struct.pack("BBB", c + 1, 0x11, 0)
                      for c in range(n_components)))
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
            + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
            + b"\xff\xd9")


# Deterministic rendering rules, mirrored by the SQL oracle: dimensions
# derive from document columns, format alternates by doc_id parity.
_DIM_MOD = 509  # prime, keeps dims in [1, 509] — well inside u16/u32


def synth_payload(doc_id: int, text: str) -> bytes:
    """Render a document as a real minimal image file (even doc_id ->
    RGB PNG; odd -> JPEG, grayscale when doc_id % 3 == 0)."""
    width = 1 + len(text) % _DIM_MOD
    height = 1 + doc_id % _DIM_MOD
    if doc_id % 2 == 0:
        return encode_png_header(width, height, color_type=2)
    return encode_jpeg_header(
        width, height, n_components=1 if doc_id % 3 == 0 else 3)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: synthesize the real image bytes, then parse
    them back with the real header parser — one Arrow batch in, one
    feature frame out."""
    for pdf in batches:
        payloads = [synth_payload(i, t)
                    for i, t in zip(pdf["doc_id"], pdf["text"])]
        out = pd.DataFrame([decode_image(p) for p in payloads])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "n_bytes", pd.Series([len(p) for p in payloads],
                                           dtype="int64"))
        yield out[["doc_id", "n_bytes", "width", "height", "channels",
                   "format"]]


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
    oracle=f"""
        -- closed-form expectation of the synth->parse round trip: the
        -- Spark side renders each doc as a REAL minimal PNG/JPEG byte
        -- stream and parses it back with the real header parser; any
        -- offset/endianness/marker-walk bug breaks the hash match.
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 45
                         WHEN doc_id % 3 = 0 THEN 35
                         ELSE 41 END AS BIGINT) AS n_bytes,
               CAST(1 + length(text) % {_DIM_MOD} AS INTEGER) AS width,
               CAST(1 + doc_id % {_DIM_MOD} AS INTEGER) AS height,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 3
                         WHEN doc_id % 3 = 0 THEN 1
                         ELSE 3 END AS INTEGER) AS channels,
               CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END
                 AS format
        FROM documents
    """,
    doc="Arrow-batched image feature extraction via mapInPandas: each "
        "document is deterministically rendered as a real minimal "
        "PNG/JPEG file and decoded back by the library-free header "
        "parser (PNG IHDR / JPEG SOF marker scan). The oracle computes "
        "the expected metadata in closed form, so the whole "
        "synth->parse->Arrow pipeline is value-verified. On a real "
        "corpus the payload column arrives from the lake instead of "
        "synth_payload; decode_image runs unchanged.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(extract_features, schema=FEATURE_SCHEMA)
