"""Multimodal column plumbing: opaque binary media + typed metadata.

The decode step itself is STUBBED — this container has no image/audio
libraries (PIL/cv2/torchaudio all absent); importing them is gated and the
default "decoder" is either a clearly-marked NotImplementedError or a
deterministic fake (hash-derived pixels/features) so the Ray-side plumbing
— schema, actor-pool signature, batch sizing, output layout — is real and
tested end-to-end.

Media table schema:
    media_id: int64, media: binary, media_type: string ("image"|"audio"|
    "video"), width/height/sample_rate/duration metadata columns.

Stages (all actor-pool map_batches — stateful setup in __init__):
    ImageDecodeStage  → pixels: fixed 3x8x8 uint8 features per image
    AudioFeatureStage → mfcc-ish fixed 16-dim float features
    FrameSampleStage  → n sampled "frames" per video (list of features)

Batch-size note: binary payloads dominate memory; callers should use small
``batch_size`` (<= 1024) and bounded ``concurrency`` so batch x pool fits
the worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from q_digest_ray.functions.hashing import hash64, splitmix64

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media", pa.binary()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests (binary payloads
    are seeded random bytes with realistic size spread)."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(["image", "audio", "video"], n, p=[0.6, 0.25, 0.15])
    sizes = np.clip(rng.lognormal(9, 1, n), 128, 1 << 20).astype(np.int64)
    blobs = [rng.integers(0, 256, s, dtype=np.uint8).tobytes() for s in sizes]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n)),
            "media": pa.array(blobs, pa.binary()),
            "media_type": pa.array(kinds),
            "width": pa.array(rng.integers(64, 4096, n).astype(np.int32)),
            "height": pa.array(rng.integers(64, 4096, n).astype(np.int32)),
            "sample_rate": pa.array(np.where(kinds == "audio", 16000, 0).astype(np.int32)),
            "duration_ms": pa.array(np.where(kinds != "image", 30000, 0).astype(np.int32)),
        }
    )


def _fake_features(blobs: pa.Array, dim: int, seed: int) -> np.ndarray:
    """Deterministic stand-in features: per-blob hash expanded to dim floats."""
    h = hash64(blobs, seed=seed)
    cols = [splitmix64(h ^ np.uint64(j + 1)) for j in range(dim)]
    m = np.stack(cols, axis=1)
    return (m >> np.uint64(11)).astype(np.float64) / float(1 << 53)


class ImageDecodeStage:
    """Actor-pool stage: image binary → 192-dim feature row.

    With a real imaging lib this would decode + resize to 8x8 RGB; here the
    decode is a deterministic fake (STUB) unless ``strict=True``, which
    raises NotImplementedError to make the missing dependency explicit.
    """

    FEATURE_DIM = 3 * 8 * 8

    def __init__(self, strict: bool = False):
        # strict always raises: no real decoder exists in this codebase even
        # when an imaging lib happens to be importable
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode is STUBBED (no real decoder implemented; "
                "imaging libs absent in this environment) — use "
                "strict=False for the deterministic fake decoder"
            )
        mask = pa.compute.equal(batch["media_type"], pa.scalar("image"))
        t = batch.filter(mask)
        feats = _fake_features(t["media"].combine_chunks(), self.FEATURE_DIM, seed=101)
        return pa.table(
            {
                "media_id": t["media_id"],
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


class AudioFeatureStage:
    FEATURE_DIM = 16

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("audio decode requires torchaudio/librosa")
        mask = pa.compute.equal(batch["media_type"], pa.scalar("audio"))
        t = batch.filter(mask)
        feats = _fake_features(t["media"].combine_chunks(), self.FEATURE_DIM, seed=202)
        return pa.table(
            {
                "media_id": t["media_id"],
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """video binary → ``num_frames`` sampled frame features (list<list>)."""

    FEATURE_DIM = 12

    def __init__(self, num_frames: int = 4, strict: bool = False):
        self.num_frames = num_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("video decode requires ffmpeg bindings")
        mask = pa.compute.equal(batch["media_type"], pa.scalar("video"))
        t = batch.filter(mask)
        rows = []
        for i in range(t.num_rows):
            blob = t["media"][i]
            frames = _fake_features(
                pa.array([blob.as_py()] * self.num_frames, pa.binary()),
                self.FEATURE_DIM,
                seed=303,
            )
            # make frames distinct deterministically
            frames = frames + np.arange(self.num_frames)[:, None] * 1e-6
            rows.append([list(f) for f in frames])
        return pa.table(
            {
                "media_id": t["media_id"],
                "frames": pa.array(rows, pa.list_(pa.list_(pa.float64()))),
            }
        )


def media_feature_pipeline(ds, batch_size: int = 256, concurrency=(1, 4)):
    """Full plumbing: decode images + audio features in one pass each,
    union the feature rows (the shape a real multimodal pipeline uses)."""
    imgs = ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
    auds = ds.map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
    return imgs.union(auds)
