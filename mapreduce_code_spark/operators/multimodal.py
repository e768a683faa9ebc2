"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, with decode / feature-extract / resize / frame-sample operators.

The Spark-side contract is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning — while the actual codec step is
STUBBED: this container ships no image/audio libraries, so ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic byte-derived stand-in (documented below) flows through the
same plumbing so the pipeline is end-to-end executable and verifiable.

At 100 TB the pattern is: payloads stay opaque binary in Parquet (never
exploded into rows), metadata columns drive partition pruning, and the
decoder runs as an Arrow-batched ``mapInPandas`` whose output schema is
fixed up front — exactly what a real libvips/ffmpeg-backed UDF would do.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ["image", "audio", "video"]
MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents``: payload =
    UTF-8 bytes of the text, kind/mime by ``doc_id % 3``, fake
    dimensions from exact integer arithmetic. Matches
    ``sources.schemas.MEDIA``."""
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    mime = F.element_at(F.array(*[F.lit(MIMES[k]) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        mime.alias("mime"),
        (F.lit(64) + (F.col("doc_id") % 16) * 8).cast("int").alias("width"),
        (F.lit(64) + (F.col("doc_id") % 9) * 8).cast("int").alias("height"),
        (F.col("n_chars") * 40).alias("duration_ms"),
    )


def media_meta(media: DataFrame) -> DataFrame:
    """Pure column-algebra metadata scan (no decode): byte size, content
    hash, aspect ratio, sampling plan. All exact arithmetic / md5 —
    SQL-oracle-able."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        (F.col("width") * F.col("height")).alias("n_pixels"),
        (F.col("duration_ms") / F.lit(1000.0)).alias("duration_s"),
        F.ceil(F.col("duration_ms") / F.lit(2000.0)).cast("bigint").alias(
            "n_sample_frames"  # one frame every 2s, ceil
        ),
    )


def media_meta_sql() -> str:
    """DuckDB twin of media_from_documents |> media_meta."""
    return """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         encode(text) AS payload,
         text,  -- DuckDB has no md5(BLOB); payload IS utf8(text)
         64 + (doc_id % 16) * 8 AS width,
         64 + (doc_id % 9) * 8 AS height,
         n_chars * 40 AS duration_ms
  FROM documents
)
SELECT media_id, kind,
       octet_length(payload) AS n_bytes,
       md5(text) AS payload_md5,
       width * height AS n_pixels,
       duration_ms / 1000.0 AS duration_s,
       CAST(ceil(duration_ms / 2000.0) AS BIGINT) AS n_sample_frames
FROM media
"""


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads and extract a feature vector per media row.

    Real decode (PIL/libsndfile/ffmpeg) is unavailable in this
    environment → ``fake=False`` raises ``NotImplementedError`` at plan
    time. ``fake=True`` runs the identical plumbing with a deterministic
    stand-in feature: the 16-bin byte-value histogram of the payload,
    L1-normalized — stable across runs/engines and shaped exactly like a
    real embedding would be.

    Returns ``FEATURES_SCHEMA``; one Arrow batch in, one out — no
    per-row Python calls.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not installed in this environment; "
            "pass fake=True for the deterministic byte-histogram stand-in"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(float)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        extract, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 2000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per planned frame
    timestamp (pure ``sequence``+``explode`` — no decode). Returns
    ``(media_id, frame_idx, ts_ms)``."""
    # zero-length media plans zero frames (sequence(0,0) would emit one
    # phantom ts=0 row, disagreeing with ceil(0/every_ms)=0 and the oracle)
    frames = F.when(
        F.col("duration_ms") > 0,
        F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)),
    ).otherwise(F.array().cast("array<long>"))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.posexplode(frames).alias("frame_idx", "ts_ms"))
    )
