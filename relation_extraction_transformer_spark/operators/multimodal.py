"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media alongside text.  The Spark
plumbing here is real and tested — schema contract, Arrow batch shape,
partition-size control; only the codec calls are stubbed because this
container ships no image/audio libraries.  Each decode function first
tries the real library (PIL/soundfile) and otherwise uses a clearly-marked
deterministic fake so the pipeline shape is exercised end to end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha1 string, "
    "features array<float>, decoder string"
)


_KINDS = ("image", "audio", "video")


def render_media(media_id: int, seed: int = 42) -> tuple:
    """Deterministic media row for one id — shared by the distributed
    Spark generator and the artifact freezer (single code path)."""
    rng = np.random.default_rng((seed, int(media_id)))
    kind = _KINDS[int(media_id) % 3]
    payload = rng.integers(
        0, 256, int(rng.integers(64, 4096)), dtype=np.uint8
    ).tobytes()
    return (
        int(media_id), kind, payload, f"application/x-fake-{kind}",
        int(rng.integers(16, 512)), int(rng.integers(16, 512)),
        int(rng.integers(100, 60000)),
    )


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [render_media(int(i), seed) for i in pdf["id"]],
                columns=[
                    "media_id", "kind", "payload", "mime", "width", "height",
                    "duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _try_real_image_decode(payload: bytes):
    try:
        import io

        from PIL import Image  # noqa: F401  (absent in this container)

        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img, dtype=np.float32)
        return arr.mean(axis=(0, 1)).tolist(), "pil"
    except Exception:
        return None, None


def _fake_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in feature extractor: byte-histogram projected
    to `dim` buckets.  STUB — replace with a real decoder when the codec
    libraries are available; the Spark-side contract stays identical."""
    hist = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
    return (
        hist.reshape(dim, 256 // dim).sum(axis=1).astype(np.float32)
        / max(len(payload), 1)
    ).tolist()


def extract_media_features(media: DataFrame, batch_dim: int = 16) -> DataFrame:
    """media table -> per-item feature vectors via ONE mapInPandas (Arrow
    batches; bytes never round-trip through Python row objects)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, decoders, shas, sizes = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                sizes.append(len(b))
                shas.append(hashlib.sha1(b).hexdigest())
                real, name = _try_real_image_decode(b)
                if real is not None:
                    feats.append(real)
                    decoders.append(name)
                else:
                    feats.append(_fake_features(b, batch_dim))
                    decoders.append("stub-histogram")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha1": shas,
                    "features": feats,
                    "decoder": decoders,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "resizer string"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_ts_ms int, frame binary, "
    "sampler string"
)


def resize_images(
    media: DataFrame, max_side: int = 256
) -> DataFrame:
    """Image resize as ONE mapInPandas over binary payloads.

    Tries PIL (absent in this container); the STUB path computes the real
    target geometry (aspect-preserving clamp to ``max_side``) and passes
    the payload through unchanged with a deterministic marker — the Spark
    plumbing (schema, Arrow batching, partition shape) is identical to
    what a real decoder would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            # column-wise zip, not iterrows: the codec call is per-item
            # Python either way, but the bookkeeping shouldn't be
            for media_id, kind, w, h, raw in zip(
                pdf["media_id"].to_numpy(),
                pdf["kind"].to_numpy(),
                pdf["width"].to_numpy(),
                pdf["height"].to_numpy(),
                pdf["payload"],
            ):
                if kind != "image":
                    continue
                w, h = int(w), int(h)
                scale = min(1.0, max_side / max(w, h, 1))
                tw, th = max(1, int(w * scale)), max(1, int(h * scale))
                payload = bytes(raw)
                try:
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(payload)).resize((tw, th))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    payload, resizer = buf.getvalue(), "pil"
                except Exception:
                    resizer = "stub-passthrough"  # STUB: no codec libs here
                out_rows.append(
                    (int(media_id), kind, payload, tw, th, resizer)
                )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "resizer",
                ],
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling as ONE mapInPandas: one output row per sampled
    timestamp.  The real decoder slot (pyav/ffmpeg) is absent here, so the
    STUB emits deterministic byte slices of the payload per timestamp —
    the fan-out shape (rows, timestamps, batch geometry) is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, raw, dur in zip(
                pdf["media_id"].to_numpy(),
                pdf["kind"].to_numpy(),
                pdf["payload"],
                pdf["duration_ms"].to_numpy(),
            ):
                if kind != "video":
                    continue
                payload = bytes(raw)
                n = min(max_frames, max(1, int(dur) // every_ms))
                for i in range(n):
                    ts = i * every_ms
                    # STUB frame: deterministic slice keyed by frame index
                    start = (i * 997) % max(1, len(payload) - 16)
                    frame = payload[start : start + 16]
                    rows.append(
                        (int(media_id), i, ts, frame, "stub-slice")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "frame_ts_ms", "frame",
                    "sampler",
                ],
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_dedup_by_content(features: DataFrame) -> DataFrame:
    """Exact content dedup on the sha1 (composes with the text dedup ops)."""
    return (
        features.groupBy("sha1")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("media_id").alias("canonical_media_id"),
        )
        .filter(F.col("dup_count") > 1)
    )
