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

import importlib.util
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Real-decode escape hatch: if codec libraries exist in the environment,
# ``decode_media(fake=False)`` runs them; otherwise it raises with a clear
# pointer to the fake path. Detected once at import (cheap find_spec — no
# module load until a worker actually decodes).
HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_SOUNDFILE = importlib.util.find_spec("soundfile") is not None

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


def _byte_histogram(payload: bytes) -> list[float]:
    """Deterministic stand-in feature: 16-bin high-nibble histogram of the
    raw bytes, L1-normalized. Exact integer counts / one IEEE division —
    reproducible bit-for-bit across engines (the DuckDB oracle mirrors
    it via hex-string nibbles, ``features_long_sql``)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(float)
    total = hist.sum()
    return (hist / total if total else hist).tolist()


def _import_or_die(modpath: str, lib: str):
    """Executor-side import of a codec the DRIVER detected. A silent
    fallback here would make results depend on task placement on a
    heterogeneous cluster (some rows real-decoded, some byte-histogram,
    identical schema — undetectable). Fail the task loudly instead."""
    try:
        return __import__(modpath, fromlist=["_"])
    except ImportError as e:  # pragma: no cover - heterogeneous cluster
        raise RuntimeError(
            f"{lib} is installed on the driver but missing on this "
            "executor — install codecs cluster-wide or use fake=True"
        ) from e


def _real_decode(payload: bytes, kind: str, caps: tuple[bool, bool]) -> list[float]:
    """Codec-backed feature extraction. ``caps`` is the DRIVER's
    (HAS_PIL, HAS_SOUNDFILE) snapshot, so executors cannot silently
    diverge from the plan-time decision. Falls back to the byte
    histogram only for data-level conditions: an undecodable payload,
    a kind with no codec (video — no ffmpeg binding is assumed)."""
    has_pil, has_sf = caps
    if kind == "image" and has_pil:
        Image = _import_or_die("PIL.Image", "PIL")
        try:
            img = Image.open(io.BytesIO(payload)).convert("L")
            px = np.asarray(img, dtype=np.uint8)
            hist = np.bincount(
                px.reshape(-1) >> 4, minlength=FEATURE_DIM
            ).astype(float)
            total = hist.sum()
            return (hist / total if total else hist).tolist()
        except Exception:
            return _byte_histogram(payload)  # not a decodable image
    if kind == "audio" and has_sf:
        sf = _import_or_die("soundfile", "soundfile")
        try:
            data, _rate = sf.read(io.BytesIO(payload), dtype="float64")
            # soundfile returns (frames,) for mono, (frames, channels)
            # for multichannel — downmix across CHANNELS (axis=1), never
            # across frames
            mono = (
                np.abs(data).mean(axis=1) if data.ndim == 2 else np.abs(data)
            )
            bins = np.minimum(
                (mono * FEATURE_DIM).astype(int), FEATURE_DIM - 1
            )
            hist = np.bincount(bins, minlength=FEATURE_DIM).astype(float)
            total = hist.sum()
            return (hist / total if total else hist).tolist()
        except Exception:
            return _byte_histogram(payload)  # not a decodable audio clip
    return _byte_histogram(payload)


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads and extract a feature vector per media row.

    ``fake=True`` always runs the deterministic byte-histogram stand-in —
    the path the oracled contract query uses, identical in every
    environment. ``fake=False`` requires at least one real codec library
    (PIL / soundfile): rows whose kind has a codec get a real decoded
    feature, others fall back to the stand-in. With no codec libs at all
    it raises ``NotImplementedError`` at plan time (this container ships
    none — the stand-in is the only executable path here).

    Returns ``FEATURES_SCHEMA``; one Arrow batch in, one out — no
    per-row Python calls outside the decode kernel itself.
    """
    if not fake and not (HAS_PIL or HAS_SOUNDFILE):
        raise NotImplementedError(
            "media codecs are not installed in this environment; "
            "pass fake=True for the deterministic byte-histogram stand-in"
        )
    caps = (HAS_PIL, HAS_SOUNDFILE)  # driver-side snapshot, shipped to tasks

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _byte_histogram(p) if fake else _real_decode(p, k, caps)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
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


def features_long(features: DataFrame) -> DataFrame:
    """Explode the feature vector to one ``(media_id, kind, n_bytes, pos,
    value)`` row per bin. This is the contract-facing shape: flat scalar
    columns canonicalize/sort/hash cleanly in any downstream harness
    (an ``array<double>`` column does not — round-1 driver lesson), and
    it is exactly SQL-oracle-able."""
    return features.select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("features").alias("pos", "value"),
    )


def features_long_sql() -> str:
    """DuckDB twin of media_from_documents |> decode_media(fake=True) |>
    features_long. Byte high-nibbles are read from the hex string of the
    payload (byte i's high nibble = hex char 2i-1); the normalized value
    is one IEEE double division of exact integer counts, so it matches
    numpy bit-for-bit."""
    return f"""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         encode(text) AS payload
  FROM documents
), sized AS (
  SELECT media_id, kind, octet_length(payload) AS n_bytes, hex(payload) AS hx
  FROM media
), bins AS (
  SELECT media_id,
         strpos('0123456789ABCDEF', substr(hx, 2 * t.i - 1, 1)) - 1 AS pos,
         count(*) AS cnt
  FROM sized, LATERAL (
    SELECT unnest(generate_series(1, n_bytes)) AS i
  ) t
  GROUP BY 1, 2
)
SELECT s.media_id, s.kind, s.n_bytes,
       CAST(p.pos AS INTEGER) AS pos,
       CASE WHEN s.n_bytes = 0 THEN 0.0
            ELSE COALESCE(b.cnt, 0) / CAST(s.n_bytes AS DOUBLE)
       END AS value
FROM sized s
CROSS JOIN (SELECT unnest(range({FEATURE_DIM})) AS pos) p
LEFT JOIN bins b ON b.media_id = s.media_id AND b.pos = p.pos
"""


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
