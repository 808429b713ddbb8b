"""Multimodal column plumbing: opaque binary media + typed metadata.

Image decode is REAL when PIL is importable (``ImageDecodeStage`` decodes,
converts to RGB and resizes — tested by a skipped-unless-PIL test); in this
container (no PIL/cv2/torchaudio) each stage falls back to a clearly-marked
deterministic fake (hash-derived pixels/features), or raises when
``strict=True``, so the Ray-side plumbing — schema, actor-pool signature,
batch sizing, output layout — is real and tested end-to-end either way.

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
    """Actor-pool stage: image binary → 192-dim feature row (3x8x8 RGB).

    REAL decode when PIL is importable (``HAS_PIL``): decode → RGB →
    bilinear resize to 8x8 → channel-major [0, 1] floats.  Without PIL the
    stage falls back to a deterministic fake (hash-derived features) so the
    Ray plumbing stays testable in lib-less containers; ``strict=True``
    raises instead of faking — NotImplementedError when PIL is absent,
    ValueError on an undecodable blob when it is present."""

    FEATURE_DIM = 3 * 8 * 8

    def __init__(self, strict: bool = False, use_real: bool | None = None):
        self.strict = strict
        if use_real and not HAS_PIL:
            # an explicit request for real decoding must not silently
            # degrade to hash-noise features
            raise NotImplementedError(
                "use_real=True requires PIL, which is not importable here"
            )
        self.use_real = HAS_PIL if use_real is None else use_real

    @staticmethod
    def _decode_real(blob: bytes) -> "np.ndarray | None":
        import io

        from PIL import Image

        try:
            with Image.open(io.BytesIO(blob)) as im:
                im = im.convert("RGB").resize((8, 8), Image.BILINEAR)
                arr = np.asarray(im, dtype=np.float64)  # (8, 8, 3)
                return arr.transpose(2, 0, 1).reshape(-1) / 255.0
        except Exception:
            return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pa.compute.equal(batch["media_type"], pa.scalar("image"))
        t = batch.filter(mask)
        blobs = t["media"].combine_chunks()
        if self.use_real and HAS_PIL:
            fallback = None
            feats = []
            for i in range(len(blobs)):
                f = self._decode_real(blobs[i].as_py())
                if f is None:
                    if self.strict:
                        raise ValueError(
                            f"undecodable image blob media_id="
                            f"{t['media_id'][i].as_py()}"
                        )
                    if fallback is None:
                        fallback = _fake_features(blobs, self.FEATURE_DIM, seed=101)
                    f = fallback[i]
                feats.append(f)
            feats = np.stack(feats) if feats else np.zeros((0, self.FEATURE_DIM))
        elif self.strict:
            raise NotImplementedError(
                "image decode requires PIL, which is absent in this "
                "environment — use strict=False for the deterministic "
                "fake decoder"
            )
        else:
            feats = _fake_features(blobs, self.FEATURE_DIM, seed=101)
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


def media_feature_pipeline(ds, batch_size: int = 256, concurrency=None):
    """Full plumbing: decode images + audio features in one pass each,
    union the feature rows (the shape a real multimodal pipeline uses).
    Small batches (binary payloads dominate memory) x a cluster-sized actor
    pool (``pool_limits``) keeps batch x pool inside the worker heap."""
    from q_digest_ray.stages.partitioning import pool_limits

    if concurrency is None:
        concurrency = pool_limits()
    imgs = ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
    auds = ds.map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
    return imgs.union(auds)
