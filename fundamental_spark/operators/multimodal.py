"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The crawl's media spans (photo/floorplan refs interleaved with text,
BASELINE.json input_hint) become rows of a `media` table once fetched:

  media(doc_id string, media_ref string, kind string, content binary,
        meta struct<width:int,height:int,duration_ms:int,mime:string>)

The Spark-side plumbing — schema, partitioning, UDF signatures, Arrow
batch shapes — is real and tested; the actual decoders (PIL/ffmpeg)
are NOT in this container, so the decode step is gated: with the lib
missing it either raises NotImplementedError (strict mode) or produces
a deterministic fake feature derived from the bytes (default), keeping
the pipeline runnable end-to-end.

All per-item work runs in ``mapInPandas`` (Arrow batches), never
row-at-a-time Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, kind string, content binary, "
    "meta struct<width:int,height:int,duration_ms:int,mime:string>"
)

FEATURE_SCHEMA = (
    "doc_id string, media_ref string, kind string, "
    "feature array<float>, feat_dim int, decode_ok boolean"
)

THUMB_SCHEMA = (
    "doc_id string, media_ref string, thumb binary, width int, height int"
)

try:  # decoder gating: PIL is not in this container
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Explode media spans into media rows; content is synthesized
    deterministically from the ref (stands in for the fetched bytes —
    a real deployment joins a blob-store fetch here). Partitioned by
    doc hash so one oversized document can't hot-spot a partition."""
    media = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == "media")
        ).alias("span"),
    ).select(
        "doc_id",
        F.col("span")["media_ref"].alias("media_ref"),
        F.when(F.col("span")["media_ref"].endswith(".png"), "floorplan")
        .otherwise(F.lit("photo"))
        .alias("kind"),
        # deterministic fake bytes: sha-based, sized by ref hash
        F.sha2(F.col("span")["media_ref"], 256).cast("binary").alias("content"),
        F.struct(
            (F.pmod(F.xxhash64(F.col("span")["media_ref"]), F.lit(1920)) + 32)
            .cast("int")
            .alias("width"),
            (F.pmod(F.xxhash64(F.col("span")["media_ref"], F.lit(1)), F.lit(1080)) + 32)
            .cast("int")
            .alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.when(F.col("span")["media_ref"].endswith(".png"), "image/png")
            .otherwise(F.lit("image/jpeg"))
            .alias("mime"),
        ).alias("meta"),
    )
    return media.repartition(F.pmod(F.xxhash64("doc_id"), F.lit(64)))


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for an image-embedding model: hash-seeded
    pseudo-features. Clearly fake; replaces a real encoder at deploy."""
    h = hashlib.sha256(content or b"").digest()
    seed = np.frombuffer(h[:8], dtype=np.uint64)[0]
    x = np.arange(dim, dtype=np.float64) + float(seed % 100_000)
    v = np.sin(x * 0.1) * np.cos(x * 0.01 + float(seed % 997))
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_media_features(
    media: DataFrame, dim: int = 32, strict: bool = False
) -> DataFrame:
    """Decode + feature-extract per media item via mapInPandas.

    strict=True raises NotImplementedError when the real decoder is
    unavailable (production semantics); default emits the deterministic
    fake so the Spark plumbing stays testable end-to-end.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict and not HAS_PIL:
                raise NotImplementedError(
                    "real image decode requires PIL/ffmpeg (not in this container)"
                )
            feats = [
                _fake_feature(c, dim).tolist() if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_dim": dim,
                    "decode_ok": [f is not None for f in feats],
                }
            )

    return media.mapInPandas(_featurize, schema=FEATURE_SCHEMA)


def resize_thumbnails(
    media: DataFrame, max_px: int = 256, strict: bool = False
) -> DataFrame:
    """Resize stage (stubbed decode): output thumb bytes + the resized
    dimensions computed from metadata (aspect-preserving), exercising
    the batch shape a real resizer would use."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict and not HAS_PIL:
                raise NotImplementedError("real resize requires PIL")
            # vectorized width/height math over the whole Arrow batch;
            # only the (stubbed) per-item byte slice stays Python-side
            w = pd.to_numeric(
                pdf["meta"].map(lambda m: m["width"]), errors="coerce"
            ).fillna(max_px).to_numpy(dtype=float)
            h = pd.to_numeric(
                pdf["meta"].map(lambda m: m["height"]), errors="coerce"
            ).fillna(max_px).to_numpy(dtype=float)
            w = np.where(w > 0, w, max_px)
            h = np.where(h > 0, h, max_px)
            scale = np.minimum(1.0, max_px / np.maximum(w, h))
            thumbs = [(c or b"")[:64] for c in pdf["content"]]  # fake payload
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "thumb": thumbs,
                    "width": (w * scale).astype(int),
                    "height": (h * scale).astype(int),
                }
            )

    return media.mapInPandas(_resize, schema=THUMB_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: expands each video into
    frame-timestamp rows (decode stubbed — no ffmpeg in container)."""
    vids = media.filter(F.col("meta")["duration_ms"].isNotNull())
    frames = vids.select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("meta")["duration_ms"],
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames
