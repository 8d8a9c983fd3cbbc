"""Text-analysis operators for large-scale training-data pipelines.

All are stateless, vectorized ``map_batches`` transforms over a flat
``(doc_id, text)`` table using pyarrow.compute kernels — no Python loop over
rows in the hot path (md5 is the one per-row call; hashlib dominates there).
Each has an exact DuckDB-SQL oracle (see __ray_entry__.oracle_sql), so the
semantics are pinned: token counting is whitespace splitting, quality signals
are character-class counts, the language feature is a stopword occurrence
count, the fingerprint is md5.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _token_count_arr(texts: pa.ChunkedArray) -> pa.Array:
    trimmed = pc.utf8_trim_whitespace(texts)
    counts = pc.list_value_length(pc.split_pattern_regex(trimmed, pattern=r"\s+"))
    # empty string splits to [''] (length 1) — force 0 like str.split()
    return pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), counts)


def token_count(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_tokens) — whitespace tokenization."""
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": _token_count_arr(batch.column("text")).cast(pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def text_quality(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_chars, n_punct, n_alpha, n_digit, n_tokens) — character-class
    quality signals (the shape of a C4/Gopher-style quality filter front end)."""
    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
            "n_punct": pc.count_substring_regex(text, r"[.,;:!?]").cast(pa.int64()),
            "n_alpha": pc.count_substring_regex(text, r"[A-Za-z]").cast(pa.int64()),
            "n_digit": pc.count_substring_regex(text, r"[0-9]").cast(pa.int64()),
            "n_tokens": _token_count_arr(text).cast(pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def lang_feature(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_the, en_like) — n-gram-heuristic language ID feature: count
    of the ' the ' stopword bigram boundary; en_like when the document has at
    least one occurrence per 200 characters."""
    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_the = pc.count_substring(text, " the ").cast(pa.int64())
        n_chars = pc.utf8_length(text).cast(pa.int64())
        en_like = pc.greater(pc.multiply(n_the, pa.scalar(200, pa.int64())), n_chars)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_the": n_the,
            "en_like": en_like,
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def fingerprint(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, fp) — md5 content fingerprint (SQL-checkable); the rolling
    winnowing variant lives in dedup.py."""
    def fn(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        fps = [md5(t.encode("utf-8")).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fp": pa.array(fps, pa.string()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def winnow_fingerprints(ds: "ray.data.Dataset", k: int = 8, window: int = 16) -> "ray.data.Dataset":
    """(doc_id, fps: list<int64>) — winnowing document fingerprints (rolling
    k-gram hashes, per-window minimum; Schleimer et al. 2003). Not
    SQL-expressible — covered by unit tests instead of the DuckDB oracle."""
    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            b = t.encode("utf-8", "ignore")
            if len(b) < k:
                out.append([])
                continue
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
            h = np.zeros(len(arr) - k + 1, dtype=np.uint64)
            base = np.uint64(1000003)
            for i in range(k):
                h = h * base + arr[i : len(arr) - k + 1 + i]
            if len(h) <= window:
                mins = {int(h.min())}
            else:
                view = np.lib.stride_tricks.sliding_window_view(h, window)
                mins = set(view.min(axis=1).astype(np.int64).tolist())
            out.append(sorted(np.int64(m) for m in mins))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fps": pa.array([[int(x) for x in fps] for fps in out], pa.list_(pa.int64())),
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=2048)
