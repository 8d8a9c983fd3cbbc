"""Multimodal column plumbing: opaque binary media with typed metadata.

Media spans in the document table carry ``media_ref`` pointers; at scale the
payloads live in object storage and are fetched/decoded inside actor-pool
``map_batches`` stages with SMALL batch sizes (a batch of decoded images must
fit one worker's heap). The image/audio codec libraries are not available in
this container, so the decode kernels are STUBS — ``decode_real`` raises
``NotImplementedError`` and the pipeline uses a deterministic fake (sha1-seeded
bytes) — but the Ray-side plumbing (schemas, actor signature, batch sizing,
output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("kind", pa.string()),
    pa.field("payload", pa.binary()),
])

FEATURE_DIM = 32


def media_from_documents(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Extract media spans into a (doc_id, media_ref, kind, payload) table.
    payload is a deterministic fake fetch (sha1 stream of the ref) standing in
    for the object-store read."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, refs, kinds, payloads = [], [], [], []
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            for s in spans or []:
                if s["kind"] != "text":
                    doc_ids.append(doc_id)
                    refs.append(s["media_ref"])
                    kinds.append(s["kind"])
                    payloads.append(hashlib.sha1(s["media_ref"].encode()).digest() * 8)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def decode_real(payload: bytes, kind: str):
    """The production decode hook (PIL / torchaudio / pyav)."""
    raise NotImplementedError(
        "image/audio codec libraries are not available in this container; "
        "plug PIL/torchaudio here. The pipeline uses DecodeMedia's "
        "deterministic fake instead."
    )


class DecodeMedia:
    """Actor-pool decode/feature-extract stage. __init__ would load the codec
    and model once per actor; __call__ decodes a batch. Batch size must stay
    small: decoded media is orders of magnitude larger than the payload."""

    def __init__(self, feature_dim: int = FEATURE_DIM, use_real_codec: bool = False) -> None:
        self.feature_dim = feature_dim
        self.use_real_codec = use_real_codec
        if use_real_codec:
            decode_real(b"", "probe")  # raises: codec libs absent here

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha1(payload).digest()[:4], "big")
        rng = np.random.default_rng(seed)
        vec = rng.standard_normal(self.feature_dim)
        return (vec / np.linalg.norm(vec)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._fake_decode(p) for p in batch.column("payload").to_pylist()]
        arr = np.stack(feats) if feats else np.zeros((0, self.feature_dim), np.float32)
        offsets = pa.array(np.arange(0, (len(feats) + 1) * self.feature_dim,
                                     self.feature_dim, dtype=np.int32))
        col = pa.ListArray.from_arrays(offsets, pa.array(arr.ravel(), pa.float32()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "kind": batch.column("kind"),
            "feature": col,
        })


def decode_media(media: "ray.data.Dataset", concurrency: int = 4) -> "ray.data.Dataset":
    return media.map_batches(
        DecodeMedia, batch_format="pyarrow", batch_size=64,
        concurrency=(1, concurrency), num_cpus=1,
    )


class ResizeImages:
    """Actor-pool image-resize stage (the standard pre-embedding transform).
    ``__init__`` would load the codec once per actor; the decode→resample→
    re-encode kernel is gated like :func:`decode_real` (codec libs absent),
    so ``__call__`` produces a deterministic fake: the resized payload is
    the sha1 stream of (payload, WxH) sized exactly width×height bytes —
    REAL output sizing, so batch-size/heap math is exercised honestly.
    Non-image rows pass through unchanged with resized=false."""

    def __init__(self, width: int = 64, height: int = 64,
                 use_real_codec: bool = False) -> None:
        self.width = width
        self.height = height
        if use_real_codec:
            decode_real(b"", "probe")  # raises: codec libs absent here

    def _fake_resample(self, payload: bytes) -> bytes:
        n = self.width * self.height
        seed = hashlib.sha1(payload + f"|{self.width}x{self.height}".encode()).digest()
        return (seed * (n // len(seed) + 1))[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out, flags = [], []
        for k, p in zip(kinds, payloads):
            if k == "image":
                out.append(self._fake_resample(p or b""))
                flags.append(True)
            else:
                out.append(p)
                flags.append(False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "kind": batch.column("kind"),
            "payload": pa.array(out, pa.binary()),
            "width": pa.array([self.width] * len(out), pa.int32()),
            "height": pa.array([self.height] * len(out), pa.int32()),
            "resized": pa.array(flags, pa.bool_()),
        })


def resize_images(media: "ray.data.Dataset", width: int = 64, height: int = 64,
                  concurrency: int = 4) -> "ray.data.Dataset":
    return media.map_batches(
        ResizeImages, fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow", batch_size=64,
        concurrency=(1, concurrency), num_cpus=1,
    )


class SampleFrames:
    """Actor-pool frame-sampling stage for temporal media (video/audio):
    one input row explodes into ``n_frames`` uniformly-spaced frame rows
    (frame_idx, ts_ms, frame payload). The container decoder is gated like
    :func:`decode_real`; the fake frame payload is sha1(media_ref|idx) so
    results are deterministic and layout-independent. Image rows produce a
    single frame at ts 0 (the degenerate case), matching how a real
    pipeline treats stills."""

    def __init__(self, n_frames: int = 4, duration_ms: int = 4000,
                 use_real_codec: bool = False) -> None:
        self.n_frames = n_frames
        self.duration_ms = duration_ms
        if use_real_codec:
            decode_real(b"", "probe")  # raises: codec libs absent here

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, kinds, idxs, tss, frames = [], [], [], [], [], []
        step = self.duration_ms // max(1, self.n_frames)
        for doc_id, ref, kind in zip(batch.column("doc_id").to_pylist(),
                                     batch.column("media_ref").to_pylist(),
                                     batch.column("kind").to_pylist()):
            n = 1 if kind == "image" else self.n_frames
            for i in range(n):
                doc_ids.append(doc_id)
                refs.append(ref)
                kinds.append(kind)
                idxs.append(i)
                tss.append(i * step)
                frames.append(hashlib.sha1(f"{ref}|{i}".encode()).digest())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "ts_ms": pa.array(tss, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
        })


def sample_frames(media: "ray.data.Dataset", n_frames: int = 4,
                  duration_ms: int = 4000,
                  concurrency: int = 4) -> "ray.data.Dataset":
    return media.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"n_frames": n_frames, "duration_ms": duration_ms},
        batch_format="pyarrow", batch_size=64,
        concurrency=(1, concurrency), num_cpus=1,
    )
