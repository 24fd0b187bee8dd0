"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual codec step is STUBBED because
the image/audio libraries are not in this container. ``decode_image`` tries
PIL behind an import-guard and otherwise falls back to a deterministic fake
decoder (bytes -> grayscale array of the metadata's dims); a real deployment
swaps `_decode_payload` only.

Media rows are processed with ``mapInPandas`` so one Arrow batch holds many
payloads (bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``) —
the per-row invariant is that features depend only on (payload, metadata).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_spark.functions.hashing import mix2

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "n_frames int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean double, std double, "
    "p05 double, p95 double, frames_sampled int"
)

try:  # real decoder, if available (not in this container)
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def synth_media(spark: SparkSession, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table: payload bytes from the fixed mix."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                w, h = 8 + i % 5, 8 + i % 7
                n_frames = 1 if kind == "image" else 4 + i % 4
                size = w * h * n_frames
                payload = (mix2(np.arange(size, dtype=np.uint64), seed ^ i)
                           % np.uint64(256)).astype(np.uint8).tobytes()
                out.append((i, kind, payload, w, h, n_frames,
                            16000 if kind == "audio" else 0))
            yield pd.DataFrame(out, columns=[
                "media_id", "kind", "payload", "width", "height",
                "n_frames", "sample_rate"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_payload(payload: bytes, width: int, height: int,
                    n_frames: int) -> np.ndarray:
    """STUB decode: interpret raw bytes as (frames, h, w) uint8.

    A real deployment decodes the codec here (PIL/ffmpeg/soundfile — see
    ``_HAVE_PIL``); the surrounding plumbing (batching, schema, determinism)
    is unchanged. The fake keeps tests hermetic in this container."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    want = width * height * n_frames
    if len(arr) < want:
        arr = np.pad(arr, (0, want - len(arr)))
    return arr[:want].reshape(n_frames, height, width)


def _frame_sample(frames: np.ndarray, max_frames: int = 3) -> np.ndarray:
    """Deterministic frame sampling: evenly spaced indices."""
    n = frames.shape[0]
    if n <= max_frames:
        return frames
    idx = np.linspace(0, n - 1, max_frames).astype(int)
    return frames[idx]


def extract_media_features(media: DataFrame, max_frames: int = 3) -> DataFrame:
    """decode -> frame-sample -> per-item stats, one Arrow batch at a time."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frames = _decode_payload(r.payload, r.width, r.height, r.n_frames)
                sampled = _frame_sample(frames, max_frames)
                flat = sampled.astype(np.float64).ravel()
                rows.append((
                    r.media_id, r.kind, len(r.payload),
                    float(flat.mean()), float(flat.std()),
                    float(np.percentile(flat, 5)), float(np.percentile(flat, 95)),
                    int(sampled.shape[0]),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "n_bytes", "mean", "std", "p05", "p95",
                "frames_sampled"])

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Nearest-neighbor resize of image rows (deterministic); returns the
    resized payload with updated dims — the write-back shape of a real
    preprocessing pipeline."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                img = _decode_payload(r.payload, r.width, r.height, 1)[0]
                ys = (np.arange(out_h) * r.height // out_h)
                xs = (np.arange(out_w) * r.width // out_w)
                small = img[np.ix_(ys, xs)]
                rows.append((r.media_id, "image", small.tobytes(), out_w, out_h,
                             1, 0))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "width", "height", "n_frames",
                "sample_rate"])

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)
