"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns.

The engine treats media as ``binary`` payload + typed metadata columns and
runs decode / feature-extract / resize / frame-sample as actor-pool
``map_batches`` stages (decoder state loaded once per actor; small
``batch_size`` because rows are wide — SURVEY.md memory notes).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are STUBBED: ``deterministic_fake=True`` produces seeded fake
outputs (stable per content hash) so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested;
``deterministic_fake=False`` raises NotImplementedError at the exact point a
codec would be called.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from pagerank_ray.stages import joins

MEDIA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # "image" | "audio" | "video"
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

IMAGE_FEATURES = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("decoded_w", pa.int32()),
        pa.field("decoded_h", pa.int32()),
    ]
)


def _content_seed(payload: bytes) -> int:
    return int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")


class DecodeImage:
    """Actor-pool stage: payload → fixed-dim feature vector.

    Real deployment: ``__init__`` loads the vision model once per actor;
    ``__call__`` runs batched inference. Here the decode is stubbed.
    """

    def __init__(self, embed_dim: int = 64, target: tuple[int, int] = (224, 224),
                 deterministic_fake: bool = True):
        self.embed_dim = embed_dim
        self.target = target
        self.fake = deterministic_fake
        # real impl: self.model = load_model(); compiled once per actor

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "install PIL/torchvision and implement decode here"
            )
        rng = np.random.default_rng(_content_seed(payload))
        return rng.standard_normal(self.embed_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self._decode(p or b"") for p in payloads]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "embedding": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                "decoded_w": pa.array([self.target[0]] * len(feats), pa.int32()),
                "decoded_h": pa.array([self.target[1]] * len(feats), pa.int32()),
            }
        )


class FrameSampler:
    """Actor-pool stage: video payload → every-nth-frame payload rows
    (flat_map shape: one input row → several output rows)."""

    def __init__(self, every_ms: int = 1000, deterministic_fake: bool = True):
        self.every_ms = every_ms
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads, durs = (
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        )
        out_id, out_ts, out_frame = [], [], []
        for mid, payload, dur in zip(ids, payloads, durs):
            if not self.fake:
                raise NotImplementedError("video codec not available; stub")
            n_frames = max(1, (dur or 0) // self.every_ms)
            seed = _content_seed(payload or b"")
            for f in range(n_frames):
                out_id.append(mid)
                out_ts.append(f * self.every_ms)
                # fake frame bytes: deterministic per (content, frame index)
                out_frame.append(hashlib.sha256(f"{seed}:{f}".encode()).digest())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_ts_ms": pa.array(out_ts, pa.int32()),
                "frame": pa.array(out_frame, pa.binary()),
            }
        )


def image_features(
    media: rd.Dataset, *, embed_dim: int = 64, concurrency: int = 4, batch_size: int = 64
) -> rd.Dataset:
    """media (MEDIA schema) → IMAGE_FEATURES. Small batch_size: wide binary rows."""
    return media.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"embed_dim": embed_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=joins.pool_size(concurrency),
        num_cpus=1,
    )


def sample_frames(
    media: rd.Dataset, *, every_ms: int = 1000, concurrency: int = 4, batch_size: int = 16
) -> rd.Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=joins.pool_size(concurrency),
        num_cpus=1,
    )


def synth_media(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, 128, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["image" if i % 3 else "video" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([640] * n, pa.int32()),
            "height": pa.array([480] * n, pa.int32()),
            "duration_ms": pa.array([int(rng.integers(500, 5000)) for _ in range(n)], pa.int32()),
        }
    )
