"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
fan-out — is real and tested; the actual media DECODE step is stubbed
behind ``decoder=`` (this container ships no image/audio libs).  The
default ``fake_decoder`` is deterministic (blake2b-seeded), so pipelines
and tests are reproducible end-to-end; swap in a real
PIL/ffmpeg/torchaudio decoder on a production cluster without touching the
Spark plumbing.

Design: one ``mapInPandas`` pass per operator, Arrow-batched, binary in /
fixed-schema out — the same shape discipline the reference mandates for its
vectorized ingest (input_hint: "vectorized pandas/Arrow UDFs (no per-row
Python) throughout"; the per-item decode IS the vectorization boundary for
opaque media, exactly like hashlib in the doc_id UDF).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, media binary, media_type string, meta map<string,string>"
)


def fake_decoder(media: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: blake2b-seeded uint8
    'pixels'.  Shape: images (8, 8, 3); audio (1024,); video (4, 8, 8, 3).

    A real deployment replaces this with PIL.Image.open / soundfile /
    av.open — NotImplementedError semantics documented here so the swap
    point is explicit.
    """
    seed = int.from_bytes(hashlib.blake2b(media, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    if media_type == "image":
        return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    if media_type == "audio":
        return rng.integers(0, 256, size=(1024,), dtype=np.uint8)
    if media_type == "video":
        return rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
    raise NotImplementedError(f"no decoder for media_type={media_type!r}")


def extract_features(
    media_df: DataFrame,
    feature_dim: int = 16,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decoder,
) -> DataFrame:
    """(media_id, media_type, feature array<float>) — decode + pooled stats.

    The feature here is a deterministic mean/std pooling over decoded
    sample blocks; a production pipeline swaps the pooling for a model
    forward pass (same mapInPandas shape, bigger batches)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for media, mtype in zip(pdf["media"], pdf["media_type"]):
                arr = decoder(bytes(media), mtype).astype(np.float64).ravel()
                blocks = np.array_split(arr, feature_dim // 2)
                f = np.concatenate(
                    [[b.mean() for b in blocks], [b.std() for b in blocks]]
                )[:feature_dim]
                feats.append(f.astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return media_df.mapInPandas(
        op, "media_id long, media_type string, feature array<float>"
    )


def sample_frames(
    media_df: DataFrame,
    n_frames: int = 2,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decoder,
) -> DataFrame:
    """Video frame sampling: 1 input row -> n_frames output rows
    (mapInPandas fan-out; evenly spaced deterministic frame indices)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for mid, media, mtype in zip(
                pdf["media_id"], pdf["media"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                vid = decoder(bytes(media), mtype)
                total = vid.shape[0]
                idxs = np.linspace(0, total - 1, num=min(n_frames, total)).astype(int)
                for i in idxs:
                    out_id.append(mid)
                    out_idx.append(int(i))
                    out_frame.append(vid[i].tobytes())
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return media_df.mapInPandas(op, "media_id long, frame_idx int, frame binary")
