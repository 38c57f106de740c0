"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction are actor-pool ``map_batches`` stages.
The decode libraries (PIL/ffmpeg/etc.) are NOT in this environment, so the
decoders are gated: by default a deterministic fake decoder exercises the
real Ray-side plumbing (schema, batch sizing, actor signature, output
layout); installing a real library later only swaps `_decode_impl`.

Scale notes: binary payloads are large, so these stages want SMALL
batch_size (payload_bytes * batch_size * concurrency must fit worker
heaps) and actor pools (model load / codec init once per actor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),   # image|audio|video
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(sz), dtype=np.uint8).tobytes() for sz in rng.integers(256, 4096, n)]
    types = [["image", "audio", "video"][i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n)),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(types),
            "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "sample_rate": pa.array(np.where(np.array(types) == "audio", 16000, 0).astype(np.int32)),
        }
    )


try:  # real image decoder, used when present AND the payload decodes
    from PIL import Image as _PILImage  # noqa: N812

    _HAVE_PIL = True
except ImportError:  # sandbox: PIL absent -> deterministic stub below
    _HAVE_PIL = False

_STUB_WARNED = False


def _decode_impl(payload: bytes, media_type: str) -> np.ndarray:
    """Decode one payload to a fixed-size feature-source array.

    Gated: if PIL is importable and the payload is a decodable image, the
    REAL path runs (8x8 grayscale thumbnail).  Otherwise — PIL/ffmpeg are
    absent from this container, and the synthetic corpus is random bytes
    — a deterministic fake derived from the payload hash keeps the
    Ray-side plumbing real and stable across runs/workers.  The stub path
    logs once per worker so its use is visible."""
    global _STUB_WARNED
    if _HAVE_PIL and media_type == "image":
        try:
            import io

            img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((8, 8))
            return np.asarray(img, np.float32).ravel() / 255.0
        except Exception:  # noqa: BLE001 — undecodable payload: use stub
            pass
    if not _STUB_WARNED:
        import logging

        logging.getLogger(__name__).warning(
            "multimodal decode: deterministic STUB in use (PIL/ffmpeg absent "
            "or payload not decodable) — features are fake, plumbing is real"
        )
        _STUB_WARNED = True
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random(64, dtype=np.float32)


class MediaFeatureStage:
    """Actor-pool stage: decode payloads and emit fixed-size feature
    vectors.  __init__ is the once-per-actor model/codec setup point."""

    def __init__(self, feature_dim: int = 64):
        self.feature_dim = feature_dim
        # real implementation would load the decoder/model here, once
        self._ready = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        feats = np.stack([
            _decode_impl(p, t)[: self.feature_dim] for p, t in zip(payloads, types)
        ]) if payloads else np.zeros((0, self.feature_dim), np.float32)
        offsets = np.arange(0, (len(payloads) + 1) * self.feature_dim, self.feature_dim, dtype=np.int32)
        farr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(feats.ravel(), pa.float32()))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "features": farr,
                "payload_bytes": pa.array(np.array([len(p) for p in payloads], np.int64)),
            }
        )


def extract_features(ds, *, batch_size: int = 16, concurrency=(1, 4)):
    """Feature-extraction pipeline over a media dataset.  Small batches:
    payloads are large binaries; see module docstring."""
    return ds.map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageResizeStage:
    """Actor-pool stage: resize image payloads to a target box.

    Real implementation would decode -> resample -> re-encode in
    ``_resize_impl`` (PIL absent here: deterministic stub keeps the
    payload's hash lineage so tests can assert stability).  Non-image rows
    pass through unchanged.  Output schema == input schema with updated
    payload/width/height — the stage composes anywhere in a media
    pipeline.
    """

    def __init__(self, max_w: int = 256, max_h: int = 256):
        self.max_w, self.max_h = max_w, max_h
        # real impl: import PIL here, once per actor

    def _resize_impl(self, payload: bytes, w: int, h: int, nw: int, nh: int) -> bytes:
        h256 = hashlib.sha256(payload + f"{nw}x{nh}".encode()).digest()
        # stub payload scales with the target area like a real bitmap would
        return h256 * max(1, (nw * nh) // len(h256))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def dims(name):
            a = batch.column(name)
            a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
            return a, a.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)

        wa, w = dims("width")
        ha, h = dims("height")
        types = batch.column("media_type").to_pylist()
        # null/zero dims are unresizable: such rows pass through untouched
        # (a NaN from a null would otherwise poison the int32 cast)
        valid = (w > 0) & (h > 0)
        scale = np.minimum(
            1.0, np.minimum(self.max_w / np.maximum(w, 1), self.max_h / np.maximum(h, 1))
        )
        nw = np.maximum((w * scale).astype(np.int32), 1)
        nh = np.maximum((h * scale).astype(np.int32), 1)
        is_img = np.array([t == "image" for t in types]) & valid
        resize = is_img & (scale < 1.0)
        out_p = [
            self._resize_impl(p, int(w[i]), int(h[i]), int(nw[i]), int(nh[i]))
            if resize[i]
            else p
            for i, p in enumerate(batch.column("payload").to_pylist())
        ]
        img_arr = pa.array(is_img)
        # if_else keeps original values AND nulls on pass-through rows
        new_w = pc.if_else(img_arr, pa.array(nw, pa.int32()), wa)
        new_h = pc.if_else(img_arr, pa.array(nh, pa.int32()), ha)
        return (
            batch.set_column(batch.column_names.index("payload"), "payload", pa.array(out_p, pa.binary()))
            .set_column(batch.column_names.index("width"), "width", new_w)
            .set_column(batch.column_names.index("height"), "height", new_h)
        )


class FrameSampleStage:
    """Actor-pool stage: sample k frames per video row (1 row -> k rows).

    Real implementation seeks k evenly spaced frames via the container
    index in ``_frames_impl`` (ffmpeg absent: deterministic stub derives
    frame bytes from the payload hash).  Non-video rows are dropped —
    compose with a filter/union when both streams are needed.
    """

    def __init__(self, k: int = 4):
        self.k = k

    def _frames_impl(self, payload: bytes) -> list[bytes]:
        base = hashlib.sha256(payload).digest()
        return [hashlib.sha256(base + bytes([i])).digest() for i in range(self.k)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vids = batch.filter(pc.equal(batch.column("media_type"), "video"))
        ids, frames, idxs = [], [], []
        for mid, p in zip(vids.column("media_id").to_pylist(), vids.column("payload").to_pylist()):
            for i, fb in enumerate(self._frames_impl(p)):
                ids.append(mid)
                idxs.append(i)
                frames.append(fb)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def resize_images(ds, *, max_w=256, max_h=256, batch_size: int = 16, concurrency=(1, 4)):
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(ds, *, k: int = 4, batch_size: int = 16, concurrency=(1, 4)):
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
