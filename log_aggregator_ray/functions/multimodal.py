"""Multimodal column plumbing (graft extension).

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata.  The decode/feature kernels themselves are STUBBED — the codec
libraries are not available in this container — but the Ray-side plumbing
(schema, actor-pool stage shape, batch sizing, output layout) is real and
tested: swap ``_decode_stub`` for a PIL/libav call and nothing else changes.

Batch-size note (SURVEY §7 "wide columns"): with payloads of hundreds of KB,
``batch_size`` must be small (64–256) so batch × concurrency fits worker
heaps; blocks of binary columns stay Arrow end-to-end (never pandas object
dtype).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("modality", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def make_fake_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake payloads for exercising the plumbing."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(512, 4096, n)]
    mods = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    return pa.table(
        {
            "media_id": pa.array([f"m-{i:05d}" for i in range(n)], pa.string()),
            "modality": pa.array(mods, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n, pa.string()),
            "width": pa.array(rng.integers(16, 512, n), pa.int32()),
            "height": pa.array(rng.integers(16, 512, n), pa.int32()),
            "duration_ms": pa.array(rng.integers(0, 60000, n), pa.int32()),
        }
    )


def _decode_stub(payload: bytes, modality: str) -> np.ndarray:
    """STUB for the real codec call.  Deterministic fake 'decoded features':
    a blake2b digest expanded to a 16-float vector.  Replace with e.g.
    PIL.Image.open / soundfile.read when the libs exist."""
    h = hashlib.blake2b(payload, digest_size=64).digest()
    return np.frombuffer(h, dtype=np.uint8).reshape(-1, 4)[:16].mean(axis=1) / 255.0


class MediaFeaturizer:
    """Actor-pool stage: payload → fixed-size feature vector + basic stats.

    Real deployments load the codec/model once here (__init__); per batch it
    decodes and featurizes.  Output drops the payload (the expensive column
    dies as early as possible)."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mods = batch["modality"].to_pylist()
        feats = np.stack([_decode_stub(p, m) for p, m in zip(payloads, mods)])
        sizes = np.array([len(p) for p in payloads], dtype=np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "modality": batch["modality"],
                "payload_bytes": pa.array(sizes, pa.int64()),
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


def featurize_media(ds, concurrency=2, batch_size: int = 128, num_cpus: float = 1):
    """Small batches + actor pool: the canonical multimodal stage wiring."""
    return ds.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


class ImageResizer:
    """Actor-pool stage: aspect-preserving image resize plumbing.

    The GEOMETRY math (fit within max_side × max_side, never upscale) is
    real; the pixel resample is the stub (payload re-hashed to a size
    proportional to the new pixel count) — swap ``_decode_stub`` +
    re-encode for PIL when available.  Exercises the byte-heavy
    in-AND-out path: unlike featurize, the expensive column survives."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        nw = np.maximum(1, np.round(w * scale)).astype(np.int32)
        nh = np.maximum(1, np.round(h * scale)).astype(np.int32)
        payloads = batch["payload"].to_pylist()
        out_payloads = []
        for p, ow, oh in zip(payloads, nw, nh):
            # stub re-encode: deterministic bytes sized ~ new pixel count
            n = max(16, int(ow) * int(oh) // 8)
            seed = hashlib.blake2b(p, digest_size=32).digest()
            reps = -(-n // len(seed))
            out_payloads.append((seed * reps)[:n])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out_payloads, pa.binary()),
                "width": pa.array(nw, pa.int32()),
                "height": pa.array(nh, pa.int32()),
            }
        )


def resize_images(ds, max_side: int = 256, concurrency=2, batch_size: int = 128):
    """Images only → resized payload + new geometry (small batches: the
    payload column rides both directions)."""
    import pyarrow.compute as pc

    images = ds.map_batches(
        lambda t: t.filter(pc.equal(t["modality"], "image")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return images.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool stage: sample K pseudo-frames per video row (plumbing for
    frame extraction; the frame decode itself is the stub)."""

    def __init__(self, frames_per_video: int = 4):
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, feats = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            for f in range(self.k):
                ids.append(mid)
                frame_idx.append(f)
                # deterministic per-frame slice of the payload as the stub
                lo = (f * max(1, len(payload) // self.k)) % max(1, len(payload))
                feats.append(_decode_stub(payload[lo:] + payload[:lo], "video"))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "features": pa.array([list(map(float, x)) for x in feats],
                                      pa.list_(pa.float64())),
            }
        )


def sample_frames(ds, frames_per_video: int = 4, concurrency=2, batch_size: int = 64):
    import pyarrow.compute as pc

    videos = ds.map_batches(
        lambda t: t.filter(pc.equal(t["modality"], "video")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return videos.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"frames_per_video": frames_per_video},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
