"""Multimodal column plumbing: opaque binary media columns with typed
metadata, decoded / feature-extracted in actor-pool map_batches stages.

The image/audio/video libraries are not available in this container, so the
DECODE step is stubbed: `decoder="real"` raises NotImplementedError with the
exact integration point documented, and `decoder="fake"` is a deterministic
stand-in (hash-derived pixels/features) that keeps the Ray-side plumbing —
schema, batch sizing for large binary rows, actor signature, output layout —
real and tested.  Swapping in Pillow/torchaudio/decord is a one-method
change in MediaDecodeStage.

Memory note: media rows are orders of magnitude wider than text rows; these
stages default to small `batch_size` so (batch x concurrency) stays inside a
worker's heap, per the Ray Data guidance for large binary payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 if unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42, kind: str = "image") -> pa.Table:
    """Deterministic fake media corpus for tests/benches (payload bytes are a
    pure function of (seed, media_id))."""
    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        size = 256 + int(rng.integers(0, 1024))
        h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        payloads.append((h * (size // 32 + 1))[:size])
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(["image/png" if kind == "image" else "audio/wav"] * n),
            "width": pa.array([64] * n, type=pa.int32()),
            "height": pa.array([64] * n, type=pa.int32()),
            "duration_ms": pa.array([-1] * n, type=pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaDecodeStage:
    """Decode + feature-extract actor (one model/codec load per actor).

    Output: media_id, ok, n_bytes, feature (list<float> of `feat_dim`).
    """

    def __init__(self, decoder: str = "fake", feat_dim: int = 16):
        self.decoder = decoder
        self.feat_dim = feat_dim
        if decoder == "real":
            raise NotImplementedError(
                "real media decoding requires Pillow/torchaudio/decord, which "
                "are not installed in this environment; integrate by replacing "
                "MediaDecodeStage._decode (payload bytes -> ndarray) and keep "
                "the surrounding Ray plumbing unchanged"
            )

    def _decode(self, payload: bytes) -> np.ndarray:
        # deterministic fake: 'pixels' derived from payload bytes
        arr = np.frombuffer(payload, dtype=np.uint8)
        return arr.astype(np.float32) / 255.0

    def _features(self, px: np.ndarray) -> np.ndarray:
        # deterministic pooled 'embedding': chunked means padded to feat_dim
        chunks = np.array_split(px, self.feat_dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok, nbytes = [], [], []
        for payload in batch.column("payload").to_pylist():
            if payload is None or len(payload) == 0:
                ok.append(False)
                nbytes.append(0)
                feats.append([0.0] * self.feat_dim)
                continue
            px = self._decode(payload)
            feats.append(self._features(px).tolist())
            ok.append(True)
            nbytes.append(len(payload))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "ok": pa.array(ok, type=pa.bool_()),
                "n_bytes": pa.array(nbytes, type=pa.int64()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )


def decode_features(media_ds, decoder: str = "fake", feat_dim: int = 16, batch_size: int = 64):
    """media table -> per-item features via an actor pool (small batches:
    binary rows are wide)."""
    return media_ds.map_batches(
        MediaDecodeStage,
        fn_constructor_args=(decoder, feat_dim),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 8),
    )


class ResizeStage:
    """Image-resize plumbing (stub decode): consumes payload bytes, emits a
    resized payload of deterministic size plus the new dimensions.  A real
    pipeline swaps `_resize` for a Pillow call; schema, batch sizing and the
    actor signature stay as-is."""

    def __init__(self, width: int = 32, height: int = 32, decoder: str = "fake"):
        self.width, self.height = width, height
        if decoder == "real":
            raise NotImplementedError(
                "real resize requires Pillow; replace ResizeStage._resize "
                "(payload bytes -> resized bytes) and keep the Ray plumbing"
            )

    def _resize(self, payload: bytes) -> bytes:
        # deterministic fake: sample payload bytes to width*height "pixels"
        n = self.width * self.height
        if not payload:
            return b"\x00" * n
        arr = np.frombuffer(payload, dtype=np.uint8)
        idx = (np.arange(n, dtype=np.int64) * len(arr)) // n
        return arr[idx].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize(p or b"") for p in batch.column("payload").to_pylist()]
        n = len(out)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload": pa.array(out, type=pa.large_binary()),
                "width": pa.array([self.width] * n, type=pa.int32()),
                "height": pa.array([self.height] * n, type=pa.int32()),
            }
        )


def resize_media(media_ds, width: int = 32, height: int = 32, batch_size: int = 64):
    return media_ds.map_batches(
        ResizeStage,
        fn_constructor_args=(width, height),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 8),
    )


class FrameSampleStage:
    """Video frame-sampling plumbing (stub decode): emits `n_frames` evenly
    spaced frame descriptors per video row — the flat_map-shaped stage a real
    pipeline uses before per-frame feature extraction."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, offsets = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            n = max(1, len(payload or b""))
            for f in range(self.n_frames):
                ids.append(mid)
                frame_idx.append(f)
                offsets.append((n * f) // self.n_frames)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "byte_offset": pa.array(offsets, type=pa.int64()),
            }
        )


def sample_frames(media_ds, n_frames: int = 4, batch_size: int = 32):
    return media_ds.map_batches(
        FrameSampleStage,
        fn_constructor_args=(n_frames,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 8),
    )
