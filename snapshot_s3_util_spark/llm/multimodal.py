"""Multimodal-column operators (binary payloads + typed metadata).

Design (SURVEY §1.1 bytes-column class + task brief): image/audio/video
travel as opaque `BinaryType` columns next to typed metadata columns.
Feature extraction / decode / frame sampling run as Arrow-batched
`mapInPandas` over those bytes — the Spark-side plumbing (schema,
batching, partitioning) is real and oracle-checked; the actual codec
call is stubbed behind :func:`decode_image` because no image/audio
libraries exist in this environment.

The synthetic payload is `encode(text, 'utf-8')` — a deterministic
byte string standing in for an image blob, so every derived feature is
reproducible in the DuckDB oracle (ascii/length/md5 arithmetic).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.registry import register

try:  # the real decoder path — absent in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(payload: bytes) -> "Image.Image":
    """Decode an image payload. STUB: raises until a codec library is
    installed; the deterministic fake used by the operators below is
    :func:`_fake_decode_dims`."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not available in this environment; "
            "operators use the deterministic _fake_decode_dims instead"
        )
    import io

    return Image.open(io.BytesIO(payload))


def _fake_decode_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derive (width, height,
    n_frames) from the bytes themselves so the oracle can re-derive
    them in SQL. Empty payloads decode to the 16x16 floor."""
    width = (payload[0] if payload else 0) % 64 + 16
    height = (payload[-1] if payload else 0) % 64 + 16
    n_frames = len(payload) // 1000 + 1
    return width, height, n_frames


@register(
    "multimodal_extract",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           MD5(text) AS checksum,
           CAST(CASE WHEN OCTET_LENGTH(ENCODE(text)) = 0 THEN 0
                     ELSE CAST(('0x' || SUBSTR(HEX(ENCODE(text)), 1, 2)) AS INT)
                END % 64 + 16 AS BIGINT) AS width,
           CAST(CASE WHEN OCTET_LENGTH(ENCODE(text)) = 0 THEN 0
                     ELSE CAST(('0x' || SUBSTR(HEX(ENCODE(text)),
                                               2 * OCTET_LENGTH(ENCODE(text)) - 1,
                                               2)) AS INT)
                END % 64 + 16 AS BIGINT) AS height,
           CAST(OCTET_LENGTH(ENCODE(text)) // 1000 + 1 AS BIGINT) AS n_frames
    FROM documents
    """,
    category="multimodal",
)
def multimodal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract binary payloads via Arrow-batched mapInPandas.

    The payload column is genuine `BinaryType`; each Arrow batch is
    processed in Python exactly as an image feature-extractor would —
    here with the deterministic fake decoder so DuckDB can verify every
    value. Swapping `_fake_decode_dims` for `decode_image` is the only
    change needed when a codec exists.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(_fake_decode_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                    "n_frames": dims.map(lambda d: d[2]).astype("int64"),
                }
            )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return d.mapInPandas(
        extract,
        schema="doc_id long, n_bytes long, checksum string, "
        "width long, height long, n_frames long",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH frames AS (
      SELECT doc_id,
             UNNEST(range(0, OCTET_LENGTH(ENCODE(text)) // 1000 + 1)) AS frame_no
      FROM documents
    )
    SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
           MD5(CONCAT(CAST(doc_id AS VARCHAR), ':', CAST(frame_no AS VARCHAR)))
             AS frame_key
    FROM frames
    """,
    category="multimodal",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one output row per (video, frame index).

    The 1-row-in / n-rows-out UDTF shape of a video pipeline. Frame
    count comes from the fake decoder; real frame bytes would ride
    along as a BinaryType column — the explode/partitioning plumbing is
    identical.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_key": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _w, _h, n_frames = _fake_decode_dims(payload)
                for i in range(n_frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame_key"].append(
                        hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return d.mapInPandas(
        sample, schema="doc_id long, frame_no long, frame_key string"
    )
