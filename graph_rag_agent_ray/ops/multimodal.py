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


def _image_codec():
    """Import-detected image codec (the pypdf pattern from sources/pdf.py:
    prefer the real library when importable, fall back to the vendored /
    fake path otherwise). Returns the PIL.Image module, or the imageio.v3
    module wrapped to the same ``open-bytes → ndarray`` contract, or None."""
    try:
        from PIL import Image  # noqa: PLC0415
        return ("pil", Image)
    except ImportError:
        pass
    try:
        import imageio.v3 as iio  # noqa: PLC0415
        return ("imageio", iio)
    except ImportError:
        return None


def codec_available(kind: str = "image") -> bool:
    """True when a real decoder for ``kind`` is importable here."""
    if kind == "image":
        return _image_codec() is not None
    try:  # audio/video: pyav
        import av  # noqa: F401,PLC0415
        return True
    except ImportError:
        return False


def decode_real(payload: bytes, kind: str) -> np.ndarray:
    """The production decode hook. Selected BY AVAILABILITY: decodes via
    PIL/imageio when importable (image kinds), raises NotImplementedError
    otherwise — plug torchaudio/pyav for temporal media the same way."""
    if kind == "image":
        codec = _image_codec()
        if codec is not None:
            import io
            name, mod = codec
            if name == "pil":
                img = mod.open(io.BytesIO(payload))
                return np.asarray(img.convert("RGB"))
            return np.asarray(mod.imread(io.BytesIO(payload)))
    raise NotImplementedError(
        f"no codec library for kind={kind!r} is importable in this container "
        "(PIL/imageio for images, pyav for audio/video); the pipeline uses "
        "DecodeMedia's deterministic fake instead."
    )


class DecodeMedia:
    """Actor-pool decode/feature-extract stage. __init__ would load the codec
    and model once per actor; __call__ decodes a batch. Batch size must stay
    small: decoded media is orders of magnitude larger than the payload.

    ``use_real_codec``: None (default) selects the decode path by library
    AVAILABILITY — real decode when PIL/imageio is importable, with a
    per-payload fallback to the deterministic fake for bytes the codec
    rejects (the synthetic corpus carries sha1-stream payloads, so the
    driver oracle is unchanged either way); True requires the codec (raises
    at actor construction when absent); False forces the fake."""

    def __init__(self, feature_dim: int = FEATURE_DIM,
                 use_real_codec: bool | None = None) -> None:
        self.feature_dim = feature_dim
        if use_real_codec is None:
            use_real_codec = codec_available("image")
        elif use_real_codec and not codec_available("image"):
            decode_real(b"", "image")  # raises with the seam message
        self.use_real_codec = use_real_codec

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha1(payload).digest()[:4], "big")
        rng = np.random.default_rng(seed)
        vec = rng.standard_normal(self.feature_dim)
        return (vec / np.linalg.norm(vec)).astype(np.float32)

    def _real_features(self, pixels: np.ndarray) -> np.ndarray:
        # deterministic pixel-intensity histogram embedding (stands in for
        # the per-actor model from __init__; no randomness, layout-free)
        hist, _ = np.histogram(pixels.ravel(), bins=self.feature_dim,
                               range=(0, 255))
        vec = hist.astype(np.float32)
        norm = float(np.linalg.norm(vec))
        return vec / norm if norm else vec

    def _decode_one(self, payload: bytes, kind: str) -> np.ndarray:
        if self.use_real_codec and kind == "image":
            try:
                return self._real_features(decode_real(payload or b"", kind))
            except Exception:
                pass  # undecodable bytes (e.g. the synthetic sha1 payloads)
        return self._fake_decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_one(p, k)
                 for p, k in zip(batch.column("payload").to_pylist(),
                                 batch.column("kind").to_pylist())]
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
                 use_real_codec: bool | None = None) -> None:
        self.width = width
        self.height = height
        if use_real_codec is None:
            use_real_codec = codec_available("image")
        elif use_real_codec and not codec_available("image"):
            decode_real(b"", "image")  # raises with the seam message
        self.use_real_codec = use_real_codec

    def _real_resample(self, payload: bytes) -> bytes:
        # decode → resample → re-encode via the import-detected codec; only
        # reached when codec_available("image")
        import io
        name, mod = _image_codec()
        if name == "pil":
            img = mod.open(io.BytesIO(payload)).convert("RGB")
            out = io.BytesIO()
            img.resize((self.width, self.height)).save(out, format="PNG")
            return out.getvalue()
        raise NotImplementedError("imageio resize path: plug iio.imwrite here")

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
                resized = None
                if self.use_real_codec:
                    try:
                        resized = self._real_resample(p or b"")
                    except Exception:
                        resized = None  # undecodable bytes → fake path
                out.append(resized if resized is not None
                           else self._fake_resample(p or b""))
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
        if use_real_codec and not codec_available("video"):
            decode_real(b"", "video")  # raises with the seam message

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
